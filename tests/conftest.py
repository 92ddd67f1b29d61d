"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding paths (ICI top-k merge, shard_map search) are exercised without TPU
hardware (SURVEY.md §4 rebuild translation)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the shell presets axon (TPU); tests run CPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize prepends the axon TPU platform regardless of
# JAX_PLATFORMS; force CPU explicitly so the 8-device mesh is what tests see.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module. With ~40 modules
    of accumulated XLA CPU executables in one process, the compiler
    deterministically segfaults partway through the suite (reproduced twice
    at the same test); per-module cache clearing keeps resident compiler
    state bounded. Cross-module compile reuse is minimal, so the wall-clock
    cost is small."""
    yield
    jax.clear_caches()
