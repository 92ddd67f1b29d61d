"""Binary container — Python surface over the native (C++) persistence tier.

Parity target (reference S1): IndexMmap.open/close, section accessors
(mmapCentroids/Codebooks/Lists, idsBase/codesBase/vecsBase,
VIndexMmap.swift:222-486), mmap_append_begin/commit (:606/:748),
mmap_wal_replay (:830), and the VIndexContainerBuilder
(VIndexContainerBuilder.swift:59) — rebuilt as: C++ mmap/WAL/CRC core
(native/container.cpp) + zero-copy numpy section views, with typed sections
holding exactly the flat arrays the device consumes.

Build the .so on demand (g++ is in the image; no pip deps).
"""

from __future__ import annotations

import ctypes
import enum
import os
import subprocess
from typing import Optional

import numpy as np

from vectorindex_tpu.utils.errors import ErrorBuilder, IndexErrorKind

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libvindex_container.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "container.cpp")


class SectionType(enum.IntEnum):
    """Typed sections (superset of reference VIndexMmap.swift:73-77)."""

    CENTROIDS = 1
    CODEBOOKS = 2
    CENTROID_NORMS = 3
    LISTS_DESC = 4
    IDS = 5
    CODES = 6
    VECS = 7
    NORMS_INV = 8
    NORMS_SQ = 9
    IDMAP = 10
    TOMBSTONES = 11
    TELEMETRY = 12
    FREELIST = 13
    WAL = 14
    META = 15
    GRAPH_NBRS = 16  # per-layer fixed-degree neighbor tables (nth = layer)
    GRAPH_NODES = 17  # per-layer row -> slot tables (nth = layer)
    LEVELS = 18  # per-slot level assignment


# dtype tags stored in the section descriptor
_DTYPES = {
    np.dtype("float32"): 1,
    np.dtype("float16"): 2,
    np.dtype("int32"): 3,
    np.dtype("int64"): 4,
    np.dtype("uint8"): 5,
    np.dtype("uint32"): 6,
    np.dtype("uint64"): 7,
}
try:  # bf16 — the TPU-native storage dtype (ml_dtypes ships with jax)
    import ml_dtypes

    _DTYPES[np.dtype(ml_dtypes.bfloat16)] = 8
except ImportError:  # pragma: no cover
    pass
_DTYPES_INV = {v: k for k, v in _DTYPES.items()}
_ERRKIND = {
    -1: IndexErrorKind.IO_ERROR,
    -2: IndexErrorKind.CORRUPT_DATA,
    -3: IndexErrorKind.VERSION_MISMATCH,
    -4: IndexErrorKind.ENDIANNESS_MISMATCH,
    -5: IndexErrorKind.CHECKSUM_MISMATCH,
}


def _build_native() -> None:
    subprocess.run(
        [
            "g++", "-O2", "-std=c++20", "-fPIC", "-shared",
            "-o", _SO_PATH, _SRC_PATH,
        ],
        check=True,
        capture_output=True,
    )


_lib: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) or os.path.getmtime(_SO_PATH) < os.path.getmtime(
        _SRC_PATH
    ):
        _build_native()
    lib = ctypes.CDLL(_SO_PATH)
    lib.vc_create.restype = ctypes.c_void_p
    lib.vc_create.argtypes = [ctypes.c_char_p, ctypes.c_uint32, ctypes.c_uint64]
    lib.vc_open.restype = ctypes.c_void_p
    lib.vc_open.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
    ]
    lib.vc_close.argtypes = [ctypes.c_void_p]
    lib.vc_sync.argtypes = [ctypes.c_void_p]
    lib.vc_generation.restype = ctypes.c_uint64
    lib.vc_generation.argtypes = [ctypes.c_void_p]
    lib.vc_bump_generation.argtypes = [ctypes.c_void_p]
    lib.vc_section_count.restype = ctypes.c_uint32
    lib.vc_section_count.argtypes = [ctypes.c_void_p]
    lib.vc_add_section.restype = ctypes.c_int
    lib.vc_add_section.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.c_uint64, ctypes.c_uint64,
    ]
    lib.vc_find_section.restype = ctypes.c_int
    lib.vc_find_section.argtypes = [ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32]
    lib.vc_section_info.restype = ctypes.c_int
    lib.vc_section_info.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.vc_verify_section.restype = ctypes.c_int
    lib.vc_verify_section.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.vc_set_nrows.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_uint64]
    lib.vc_append_begin.restype = ctypes.c_uint64
    lib.vc_append_begin.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_uint64]
    lib.vc_append_commit.restype = ctypes.c_int
    lib.vc_append_commit.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_uint64,
        ctypes.c_void_p, ctypes.c_uint64,
    ]
    lib.vc_wal_replay.restype = ctypes.c_int
    lib.vc_wal_replay.argtypes = [ctypes.c_void_p]
    lib.vc_wal_reset.restype = ctypes.c_int
    lib.vc_wal_reset.argtypes = [ctypes.c_void_p]
    lib.vc_crc32.restype = ctypes.c_uint32
    lib.vc_crc32.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    _lib = lib
    return lib


def _raise(code: int, msg: str):
    raise (
        ErrorBuilder(_ERRKIND.get(code, IndexErrorKind.IO_ERROR))
        .message(msg)
        .detail("code", code)
        .build()
    )


class Container:
    """mmap-backed typed-section container (reference IndexMmap)."""

    def __init__(self, handle: int, writable: bool):
        self._h = handle
        self._writable = writable
        self._lib = _load()

    # -- lifecycle --

    @classmethod
    def create(
        cls, path: str, cap_sections: int = 64, wal_capacity: int = 1 << 20
    ) -> "Container":
        lib = _load()
        h = lib.vc_create(path.encode(), cap_sections, wal_capacity)
        if not h:
            _raise(-1, f"failed to create container {path}")
        return cls(h, True)

    @classmethod
    def open(cls, path: str, writable: bool = False, replay: bool = True) -> "Container":
        lib = _load()
        err = ctypes.c_int(0)
        h = lib.vc_open(path.encode(), 1 if writable else 0, ctypes.byref(err))
        if not h:
            _raise(err.value, f"failed to open container {path}")
        c = cls(h, writable)
        if replay:
            applied = lib.vc_wal_replay(h)
            if applied < 0:
                lib.vc_close(h)
                _raise(applied, "WAL replay found corrupt committed data")
        return c

    def close(self) -> None:
        if self._h:
            self._lib.vc_close(self._h)
            self._h = 0

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()

    def sync(self) -> None:
        self._lib.vc_sync(self._h)

    @property
    def generation(self) -> int:
        return self._lib.vc_generation(self._h)

    def bump_generation(self) -> None:
        self._lib.vc_bump_generation(self._h)

    @property
    def section_count(self) -> int:
        return self._lib.vc_section_count(self._h)

    # -- sections --

    def add_array(
        self,
        type: SectionType,
        array: np.ndarray,
        capacity_bytes: int = 0,
    ) -> int:
        """Add a section holding a numpy array (row-major). nrows/stride are
        recorded so readers can rebuild the shape."""
        a = np.ascontiguousarray(array)
        dtype_tag = _DTYPES[a.dtype]
        nrows = a.shape[0] if a.ndim else 1
        stride = a.nbytes // max(nrows, 1)
        idx = self._lib.vc_add_section(
            self._h, int(type), dtype_tag,
            a.ctypes.data_as(ctypes.c_void_p), a.nbytes,
            capacity_bytes, nrows, stride,
        )
        if idx < 0:
            _raise(-1, f"add_section failed for {type.name}")
        return idx

    def add_blob(self, type: SectionType, blob: bytes, capacity_bytes: int = 0) -> int:
        buf = np.frombuffer(blob, dtype=np.uint8)
        return self.add_array(type, buf, capacity_bytes)

    def find(self, type: SectionType, nth: int = 0) -> int:
        return self._lib.vc_find_section(self._h, int(type), nth)

    def _info(self, idx: int):
        ptr = ctypes.c_void_p()
        nbytes = ctypes.c_uint64()
        cap = ctypes.c_uint64()
        dtype = ctypes.c_uint32()
        nrows = ctypes.c_uint64()
        stride = ctypes.c_uint64()
        typ = ctypes.c_uint32()
        r = self._lib.vc_section_info(
            self._h, idx, ctypes.byref(ptr), ctypes.byref(nbytes),
            ctypes.byref(cap), ctypes.byref(dtype), ctypes.byref(nrows),
            ctypes.byref(stride), ctypes.byref(typ),
        )
        if r != 0:
            _raise(-1, f"no section at index {idx}")
        return ptr, nbytes, cap, dtype, nrows, stride, typ

    def read_array(
        self, type: SectionType, nth: int = 0, verify: bool = False
    ) -> np.ndarray:
        """Zero-copy numpy view of a section (reference zero-copy readList /
        section base pointers). The view aliases the mapping — copy before
        closing if it must outlive the container."""
        idx = self.find(type, nth)
        if idx < 0:
            _raise(-1, f"section {type.name} not found")
        if verify:
            v = self._lib.vc_verify_section(self._h, idx)
            if v != 0:
                _raise(v, f"section {type.name} failed CRC")
        ptr, nbytes, _, dtype, nrows, stride, _ = self._info(idx)
        dt = _DTYPES_INV[dtype.value]
        buf = (ctypes.c_char * nbytes.value).from_address(ptr.value)
        flat = np.frombuffer(buf, dtype=dt)
        n = int(nrows.value)
        if n > 0 and stride.value and nbytes.value == n * stride.value:
            cols = int(stride.value // dt.itemsize)
            if cols > 1:
                return flat.reshape(n, cols)
        return flat

    def read_blob(self, type: SectionType, nth: int = 0) -> bytes:
        return self.read_array(type, nth).tobytes()

    def verify_all(self) -> None:
        for i in range(self.section_count):
            v = self._lib.vc_verify_section(self._h, i)
            if v != 0:
                _raise(v, f"section {i} failed CRC")

    # -- durable append (reference mmap_append_begin/commit) --

    def append(self, type_or_idx, data: np.ndarray) -> int:
        """WAL-durable append of rows to a growable section. Returns the
        byte offset of the appended data within the section."""
        idx = (
            self.find(type_or_idx)
            if isinstance(type_or_idx, SectionType)
            else type_or_idx
        )
        a = np.ascontiguousarray(data)
        off = self._lib.vc_append_begin(self._h, idx, a.nbytes)
        if off == ctypes.c_uint64(-1).value:
            _raise(-1, "append_begin failed (WAL full or io error)")
        r = self._lib.vc_append_commit(
            self._h, idx, off, a.ctypes.data_as(ctypes.c_void_p), a.nbytes
        )
        if r != 0:
            _raise(-1, "append_commit failed")
        return off

    def wal_replay(self) -> int:
        return self._lib.vc_wal_replay(self._h)

    def wal_reset(self) -> None:
        self._lib.vc_wal_reset(self._h)

    # -- compaction --

    def compact_to(self, path: str) -> "Container":
        """Rewrite live sections into a fresh container (grow-with-copy
        relocations leave dead space behind; compaction reclaims it — the
        binary-tier analog of index compact()). Preserves section order,
        types, dtypes, shapes, and the generation counter (+1); the WAL
        starts empty. Returns the new (closed-over) container handle —
        callers should close() this one and reopen the new path."""
        w_idx = self.find(SectionType.WAL)
        wal_cap = 1 << 20
        if w_idx >= 0:
            _, _, cap, _, _, _, _ = self._info(w_idx)
            wal_cap = int(cap.value)
        out = Container.create(path, wal_capacity=wal_cap)
        for i in range(self.section_count):
            ptr, nbytes, _, dtype, nrows, stride, typ = self._info(i)
            if typ.value == int(SectionType.WAL):
                continue
            buf = (ctypes.c_char * nbytes.value).from_address(ptr.value)
            arr = np.frombuffer(buf, dtype=np.uint8)
            idx = out._lib.vc_add_section(
                out._h, typ.value, dtype.value,
                arr.ctypes.data_as(ctypes.c_void_p), arr.nbytes,
                0, nrows.value, stride.value,
            )
            if idx < 0:
                out.close()
                _raise(-1, "compact_to: add_section failed")
        for _ in range(self.generation):
            out.bump_generation()
        out.sync()
        return out
