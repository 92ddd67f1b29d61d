from vectorindex_tpu.utils import config, errors  # noqa: F401
