"""Binary container: round-trips, CRC/corruption detection, durable append +
WAL replay, growth, generation (reference VIndexMmapErrorTests,
Kernel30AppendTests, IDMapPersistenceTests — SURVEY.md §4 tier 6)."""

import os
import struct

import numpy as np
import pytest

from vectorindex_tpu.persistence.container import Container, SectionType
from vectorindex_tpu.utils.errors import IndexError, IndexErrorKind


def test_create_write_read_roundtrip(tmp_path):
    p = str(tmp_path / "c.vx")
    cents = np.random.default_rng(0).standard_normal((16, 8)).astype(np.float32)
    ids = np.arange(100, dtype=np.int32)
    with Container.create(p) as c:
        c.add_array(SectionType.CENTROIDS, cents)
        c.add_array(SectionType.IDS, ids)
        c.add_blob(SectionType.IDMAP, b'{"hello": 1}')
        c.sync()
    with Container.open(p) as c:
        got = c.read_array(SectionType.CENTROIDS, verify=True)
        np.testing.assert_array_equal(got, cents)
        np.testing.assert_array_equal(c.read_array(SectionType.IDS), ids)
        assert c.read_blob(SectionType.IDMAP) == b'{"hello": 1}'
        assert c.generation == 1
        c.verify_all()


def test_shape_reconstruction(tmp_path):
    p = str(tmp_path / "c.vx")
    a = np.arange(24, dtype=np.float32).reshape(6, 4)
    with Container.create(p) as c:
        c.add_array(SectionType.VECS, a)
    with Container.open(p) as c:
        got = c.read_array(SectionType.VECS)
        assert got.shape == (6, 4)
        np.testing.assert_array_equal(got, a)


def test_corrupt_magic_rejected(tmp_path):
    p = str(tmp_path / "c.vx")
    with Container.create(p) as c:
        c.add_array(SectionType.IDS, np.arange(4, dtype=np.int32))
    with open(p, "r+b") as f:
        f.seek(0)
        f.write(b"XXXXXXXX")
    with pytest.raises(IndexError) as ei:
        Container.open(p)
    assert ei.value.kind == IndexErrorKind.CORRUPT_DATA


def test_corrupt_header_crc_rejected(tmp_path):
    p = str(tmp_path / "c.vx")
    with Container.create(p) as c:
        c.add_array(SectionType.IDS, np.arange(4, dtype=np.int32))
    with open(p, "r+b") as f:
        f.seek(16)  # generation field — breaks the header CRC
        f.write(struct.pack("<Q", 999999))
    with pytest.raises(IndexError) as ei:
        Container.open(p)
    assert ei.value.kind == IndexErrorKind.CHECKSUM_MISMATCH


def test_corrupt_section_data_detected(tmp_path):
    p = str(tmp_path / "c.vx")
    data = np.ones(64, dtype=np.float32)
    with Container.create(p) as c:
        c.add_array(SectionType.VECS, data)
        c.sync()
    size = os.path.getsize(p)
    with open(p, "r+b") as f:
        f.seek(size - 16)  # stomp on section payload
        f.write(b"\xde\xad\xbe\xef")
    with Container.open(p) as c:
        with pytest.raises(IndexError) as ei:
            c.read_array(SectionType.VECS, verify=True)
        assert ei.value.kind == IndexErrorKind.CHECKSUM_MISMATCH


def test_bad_version_rejected(tmp_path):
    p = str(tmp_path / "c.vx")
    with Container.create(p):
        pass
    with open(p, "r+b") as f:
        f.seek(8)
        f.write(struct.pack("<I", 99))
    with pytest.raises(IndexError) as ei:
        Container.open(p)
    assert ei.value.kind == IndexErrorKind.VERSION_MISMATCH


def test_durable_append_and_growth(tmp_path):
    p = str(tmp_path / "c.vx")
    with Container.create(p) as c:
        idx = c.add_array(
            SectionType.IDS, np.arange(8, dtype=np.int32), capacity_bytes=64
        )
        # appends past capacity force grow-with-copy relocation
        for i in range(5):
            c.append(idx, np.arange(8 * (i + 1), 8 * (i + 2), dtype=np.int32))
        c.sync()
    with Container.open(p) as c:
        got = c.read_array(SectionType.IDS)
        np.testing.assert_array_equal(got, np.arange(48, dtype=np.int32))


def test_wal_replay_recovers_unpublished_append(tmp_path):
    """Simulate a crash: data + WAL commit written but section length not
    published (we fake it by truncating the published length bytes back)."""
    p = str(tmp_path / "c.vx")
    with Container.create(p) as c:
        idx = c.add_array(
            SectionType.IDS, np.arange(4, dtype=np.int32), capacity_bytes=4096
        )
        c.append(idx, np.arange(4, 8, dtype=np.int32))
        c.sync()
    # find the section's nbytes in the TOC (section 1; TOC starts at 256)
    toc_off = 256 + 64  # section 0 = WAL, section 1 at +64
    with open(p, "r+b") as f:
        f.seek(toc_off + 8 + 8)  # type+dtype(8) offset(8) → nbytes
        f.write(struct.pack("<Q", 16))  # roll back to pre-append length
    # reopening with replay must roll the length forward again
    with Container.open(p, writable=True) as c:
        got = c.read_array(SectionType.IDS)
        np.testing.assert_array_equal(got, np.arange(8, dtype=np.int32))


def test_wal_reset(tmp_path):
    p = str(tmp_path / "c.vx")
    with Container.create(p) as c:
        idx = c.add_array(SectionType.IDS, np.arange(4, dtype=np.int32), capacity_bytes=4096)
        c.append(idx, np.arange(4, dtype=np.int32))
        c.wal_reset()
        assert c.wal_replay() == 0


def test_generation_counter(tmp_path):
    p = str(tmp_path / "c.vx")
    with Container.create(p) as c:
        assert c.generation == 1
        c.bump_generation()
        c.sync()
    with Container.open(p) as c:
        assert c.generation == 2


def test_multiple_sections_same_type(tmp_path):
    p = str(tmp_path / "c.vx")
    with Container.create(p) as c:
        c.add_array(SectionType.CODES, np.zeros(4, dtype=np.uint8))
        c.add_array(SectionType.CODES, np.ones(4, dtype=np.uint8))
    with Container.open(p) as c:
        np.testing.assert_array_equal(c.read_array(SectionType.CODES, 0), np.zeros(4, np.uint8))
        np.testing.assert_array_equal(c.read_array(SectionType.CODES, 1), np.ones(4, np.uint8))


def test_missing_section_raises(tmp_path):
    p = str(tmp_path / "c.vx")
    with Container.create(p):
        pass
    with Container.open(p) as c:
        with pytest.raises(IndexError):
            c.read_array(SectionType.CENTROIDS)


def test_compact_reclaims_dead_space(tmp_path):
    p = str(tmp_path / "big.vx")
    q = str(tmp_path / "small.vx")
    with Container.create(p) as c:
        idx = c.add_array(
            SectionType.IDS, np.arange(8, dtype=np.int32), capacity_bytes=64
        )
        for i in range(6):  # repeated growth leaves relocated dead regions
            c.append(idx, np.arange(8 * (i + 1), 8 * (i + 2), dtype=np.int32))
        c.add_blob(SectionType.META, b"meta")
        c.bump_generation()
        c.sync()
    with Container.open(p, writable=True) as c:
        gen = c.generation
        c.compact_to(q).close()
    assert os.path.getsize(q) < os.path.getsize(p)
    with Container.open(q) as c2:
        np.testing.assert_array_equal(
            c2.read_array(SectionType.IDS), np.arange(56, dtype=np.int32)
        )
        assert c2.read_blob(SectionType.META) == b"meta"
        assert c2.generation == gen + 1
        c2.verify_all()


# ---------------------------------------------------------------------------
# crash-recovery matrix (advisor round-1 findings): read-only replay must not
# write through the mapping; replay must not trust the (possibly stale) TOC
# WAL length; relocated sections must stay reachable across a lost TOC sync.
# ---------------------------------------------------------------------------

_SEC_DESC_SIZE = 64
_HDR_SIZE = 256
_OFF_OFFSET = 8    # VCSection.offset
_OFF_NBYTES = 16   # VCSection.nbytes


def _patch_descriptor(path, sec_idx, raw_desc=None, nbytes=None, offset=None):
    """Rewrite a section's TOC descriptor in the file, simulating a crash
    where the TOC page never hit disk (the WAL did)."""
    import struct

    raw = bytearray(open(path, "rb").read())
    base = _HDR_SIZE + sec_idx * _SEC_DESC_SIZE
    if raw_desc is not None:
        raw[base : base + _SEC_DESC_SIZE] = raw_desc
    if nbytes is not None:
        struct.pack_into("<Q", raw, base + _OFF_NBYTES, nbytes)
    if offset is not None:
        struct.pack_into("<Q", raw, base + _OFF_OFFSET, offset)
    open(path, "wb").write(bytes(raw))


def test_readonly_replay_rolls_forward_without_writing(tmp_path):
    """A committed-but-unpublished append must be visible after read-only
    open+replay, and the replay must not modify the file (round-1 advisor:
    replay wrote through a PROT_READ mapping and SIGSEGVed)."""
    p = str(tmp_path / "ro.vx")
    with Container.create(p) as c:
        idx = c.add_array(
            SectionType.VECS, np.zeros((4, 8), np.float32), capacity_bytes=1024
        )
        c.append(idx, np.ones((4, 8), np.float32))
    # rewind the published length to the pre-append value
    _patch_descriptor(p, idx, nbytes=4 * 8 * 4)
    before = open(p, "rb").read()
    with Container.open(p, writable=False, replay=True) as c:
        flat = c.read_array(SectionType.VECS)
        assert flat.size == 64  # rolled forward: 4 zero rows + 4 one rows
        np.testing.assert_array_equal(flat.reshape(-1)[32:], np.ones(32, np.float32))
    assert open(p, "rb").read() == before  # read-only open left no trace


def test_replay_does_not_trust_stale_wal_length(tmp_path):
    """Replay must scan WAL records by CRC: the TOC's WAL length is only as
    durable as the TOC page itself. Zeroing it must not hide committed
    appends."""
    p = str(tmp_path / "wl.vx")
    with Container.create(p) as c:
        idx = c.add_array(
            SectionType.IDS, np.arange(8, dtype=np.int32), capacity_bytes=256
        )
        c.append(idx, np.arange(8, 16, dtype=np.int32))
    # stale TOC: WAL section (index 0) says empty, data section says 8 ints
    _patch_descriptor(p, 0, nbytes=0)
    _patch_descriptor(p, idx, nbytes=8 * 4)
    with Container.open(p, writable=False, replay=True) as c:
        np.testing.assert_array_equal(
            c.read_array(SectionType.IDS), np.arange(16, dtype=np.int32)
        )


def test_replay_follows_relocation_across_lost_toc_sync(tmp_path):
    """Grow-with-copy relocation + crash before the TOC offset syncs: the
    WAL RELOC record must redirect replay to the section's new home."""
    p = str(tmp_path / "rl.vx")
    with Container.create(p) as c:
        idx = c.add_array(
            SectionType.IDS, np.arange(8, dtype=np.int32), capacity_bytes=64
        )
        c.append(idx, np.arange(8, 16, dtype=np.int32))  # fills capacity
        c.sync()
    saved = open(p, "rb").read()[
        _HDR_SIZE + idx * _SEC_DESC_SIZE : _HDR_SIZE + (idx + 1) * _SEC_DESC_SIZE
    ]
    with Container.open(p, writable=True) as c:
        c.append(idx, np.arange(16, 64, dtype=np.int32))  # forces relocation
    # crash simulation: the TOC descriptor reverts to its pre-grow state
    _patch_descriptor(p, idx, raw_desc=saved)
    with Container.open(p, writable=False, replay=True) as c:
        np.testing.assert_array_equal(
            c.read_array(SectionType.IDS), np.arange(64, dtype=np.int32)
        )
    # and a writable open must repair the file itself
    with Container.open(p, writable=True, replay=True) as c:
        pass
    with Container.open(p, writable=False, replay=False) as c:
        np.testing.assert_array_equal(
            c.read_array(SectionType.IDS), np.arange(64, dtype=np.int32)
        )


def test_wal_reset_cannot_resurrect_stale_records(tmp_path):
    """After wal_reset (checkpoint) the scan-based replay must find nothing,
    even though pre-reset record bytes would otherwise still CRC-validate."""
    p = str(tmp_path / "rs.vx")
    with Container.create(p) as c:
        idx = c.add_array(
            SectionType.IDS, np.arange(8, dtype=np.int32), capacity_bytes=256
        )
        c.append(idx, np.arange(8, 16, dtype=np.int32))
        c.wal_reset()
    with Container.open(p, writable=False, replay=True) as c:
        assert c.wal_replay() == 0


def test_readonly_mutations_rejected(tmp_path):
    p = str(tmp_path / "rd.vx")
    with Container.create(p) as c:
        c.add_array(SectionType.IDS, np.arange(8, dtype=np.int32))
    with Container.open(p, writable=False) as c:
        with pytest.raises(Exception):
            c.append(SectionType.IDS, np.arange(4, dtype=np.int32))
        gen = c.generation
        c.bump_generation()  # silently ignored on read-only handles
        assert c.generation == gen


def test_flat_container_roundtrip(tmp_path):
    """ROADMAP #7: Flat index binary-container tier."""
    import numpy as np

    from vectorindex_tpu.models.flat import FlatIndex

    rng = np.random.default_rng(4)
    x = rng.standard_normal((40, 12)).astype(np.float32)
    idx = FlatIndex(12)
    for i in range(40):
        idx.insert(f"v{i}", x[i], {"i": i})
    idx.remove("v7")
    p = str(tmp_path / "flat.vx")
    idx.save_container(p)
    loaded = FlatIndex.load_container(p)
    assert loaded.count == 39
    r = loaded.search(x[3], 1)[0]
    assert r.id == "v3" and r.metadata == {"i": 3}
    assert not loaded.contains("v7")
    # mutations keep working after load (free-list restored)
    loaded.insert("new", x[7])
    assert loaded.search(x[7], 1)[0].id == "new"


def test_flat_container_persists_norm_cache(tmp_path):
    """Norm-cache persistence (reference NormCacheHeader, Norms.swift:244):
    load pre-warms the device mirror from the NORMS_SQ section — values
    must equal a fresh recompute, search must be correct immediately, and
    a post-load mutation must invalidate the pre-warmed mirror."""
    import numpy as np

    from vectorindex_tpu.models.flat import FlatIndex
    from vectorindex_tpu.persistence.container import Container, SectionType

    rng = np.random.default_rng(11)
    x = rng.standard_normal((32, 8)).astype(np.float32)
    idx = FlatIndex(8)
    idx.insert_batch([f"v{i}" for i in range(32)], x)
    p = str(tmp_path / "flat_norms.vx")
    idx.save_container(p)

    with Container.open(p) as c:
        # section views alias the mapping — copy before close
        sqn = np.array(c.read_array(SectionType.NORMS_SQ, verify=True))
    np.testing.assert_allclose(sqn, np.einsum("nd,nd->n", x, x), rtol=1e-6)

    loaded = FlatIndex.load_container(p)
    assert loaded._dev is not None  # pre-warmed, no recompute needed
    dev_sqn = np.asarray(loaded._dev[1])  # [capacity]; pad rows are zero
    np.testing.assert_allclose(dev_sqn[:32], sqn, rtol=1e-6)
    assert (dev_sqn[32:] == 0).all()
    assert loaded.search(x[5], 1)[0].id == "v5"
    loaded.insert("new", x[5] * 2.0)
    assert loaded.search(x[5] * 2.0, 1)[0].id == "new"


def test_hnsw_container_roundtrip_no_rebuild(tmp_path):
    """ROADMAP #7: the graph itself persists — load must NOT reconstruct
    (identical neighbor tables, identical search results)."""
    import numpy as np

    from vectorindex_tpu.models.hnsw import HNSWConfig, HNSWIndex
    from vectorindex_tpu.utils.config import Metric

    rng = np.random.default_rng(5)
    x = rng.standard_normal((300, 16)).astype(np.float32)
    idx = HNSWIndex(16, Metric.L2, HNSWConfig(m=6, ef_construction=32, build_chunk=64))
    idx.insert_batch([f"v{i}" for i in range(300)], x)
    idx.statistics()
    p = str(tmp_path / "hnsw.vx")
    idx.save_container(p)
    loaded = HNSWIndex.load_container(p)
    # graph state identical — no reconstruction happened
    assert loaded._entry == idx._entry
    assert len(loaded._layers) == len(idx._layers)
    for la, lb in zip(idx._layers, loaded._layers):
        assert la.node_ids == lb.node_ids
        assert (la.nbrs[: la.count] == lb.nbrs[: lb.count]).all()
    assert not loaded._pending
    # identical results
    q = x[:16]
    ra = idx.batch_search(q, 5)
    rb = loaded.batch_search(q, 5)
    assert [[r.id for r in row] for row in ra] == [
        [r.id for r in row] for row in rb
    ]


def test_hnsw_container_tombstones_and_growth(tmp_path):
    import numpy as np

    from vectorindex_tpu.models.hnsw import HNSWConfig, HNSWIndex
    from vectorindex_tpu.utils.config import Metric

    rng = np.random.default_rng(6)
    x = rng.standard_normal((120, 16)).astype(np.float32)
    idx = HNSWIndex(16, Metric.L2, HNSWConfig(m=4, ef_construction=24, build_chunk=32))
    idx.insert_batch([f"v{i}" for i in range(120)], x)
    idx.remove("v3")
    idx.statistics()
    p = str(tmp_path / "h2.vx")
    idx.save_container(p)
    loaded = HNSWIndex.load_container(p)
    assert not loaded.contains("v3")
    assert all(r.id != "v3" for r in loaded.search(x[3], 10))
    # inserts continue after load
    loaded.insert("w0", x[3] + 4.0)
    assert loaded.search(x[3] + 4.0, 1)[0].id == "w0"
