#!/usr/bin/env python
"""Rewrite legacy .benchcache npz artifacts into the mmap-sidecar format.

One-shot maintenance: artifacts written before bench/cache.py grew the
.npy-sidecar path keep every array inside the zip, so each warm load copies
multi-GB corpora through the zip layer. Re-persisting them moves arrays
above the mmap threshold into raw .npy sidecars (O(1) warm opens).
Idempotent; skips artifacts already in the new format or with nothing big.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from vectorindex_tpu.bench import cache  # noqa: E402


def migrate(path: str) -> bool:
    key = os.path.basename(path)[: -len(".npz")]
    with np.load(path, allow_pickle=False) as z:
        if cache._MMAP_INDEX_KEY in z.files:
            return False
        if not any(z[k].nbytes > cache._MMAP_THRESHOLD for k in z.files):
            return False
        arrs = {k: z[k] for k in z.files}
    os.rename(path, path + ".legacy")
    try:
        cache.cached(key, lambda: arrs)
    except BaseException:
        os.rename(path + ".legacy", path)  # restore on any failure
        raise
    os.remove(path + ".legacy")
    return True


def main():
    cdir = cache.cache_dir()
    for fn in sorted(os.listdir(cdir)):
        if not fn.endswith(".npz") or ".tmp" in fn:
            continue
        p = os.path.join(cdir, fn)
        try:
            did = migrate(p)
        except Exception as e:  # noqa: BLE001
            print(f"SKIP {fn}: {type(e).__name__}: {e}")
            continue
        print(f"{'MIGRATED' if did else 'ok'} {fn}")


if __name__ == "__main__":
    main()
