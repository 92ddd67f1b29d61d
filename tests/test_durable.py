"""Durable IVF container: checkpoint round-trip, journaled mutations
surviving 'crashes' (no checkpoint), PQ codebook restoration (reference
Kernel30AppendTests + the enableKernel30Storage restore path)."""

import numpy as np
import pytest

from vectorindex_tpu.models.ivf import (
    IVFConfig,
    IVFIndex,
    IVFPQConfig,
    IVFPQIndex,
)
from vectorindex_tpu.utils.config import Metric


def _data(n=300, d=16, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, d)).astype(np.float32)


def test_container_roundtrip_trained(tmp_path):
    x = _data()
    idx = IVFIndex(16, config=IVFConfig(nlist=8, nprobe=8))
    idx.insert_batch([f"v{i}" for i in range(300)], x, [{"i": i} for i in range(300)])
    idx.optimize()
    p = str(tmp_path / "ivf.vx")
    idx.enable_durable(p)
    idx.close_durable()

    idx2 = IVFIndex.load_durable(p)
    assert idx2.count == 300
    assert idx2.trained
    r1 = [r.id for r in idx.search(x[5], k=5)]
    r2 = [r.id for r in idx2.search(x[5], k=5)]
    assert r1 == r2
    assert idx2.search(x[5], k=1)[0].metadata == {"i": 5}


def test_journal_replays_post_checkpoint_mutations(tmp_path):
    x = _data(400)
    idx = IVFIndex(16, config=IVFConfig(nlist=8, nprobe=8))
    idx.insert_batch(list(range(300)), x[:300])
    idx.optimize()
    p = str(tmp_path / "ivf.vx")
    idx.enable_durable(p)
    # post-checkpoint mutations — journaled, NO new checkpoint
    idx.insert_batch(list(range(300, 350)), x[300:350])
    idx.remove(10)
    idx.update(20, vector=x[399])
    idx.close_durable()

    idx2 = IVFIndex.load_durable(p)
    assert idx2.count == 349
    assert idx2.search(x[320], k=1)[0].id == 320  # journaled insert found
    assert not idx2.contains(10)
    assert idx2.search(x[399], k=1)[0].id == 20  # journaled update applied


def test_checkpoint_truncates_journal_and_bumps_generation(tmp_path):
    from vectorindex_tpu.persistence.container import Container, SectionType

    x = _data(200)
    idx = IVFIndex(16, config=IVFConfig(nlist=4, nprobe=4))
    idx.insert_batch(list(range(150)), x[:150])
    idx.optimize()
    p = str(tmp_path / "ivf.vx")
    idx.enable_durable(p)
    idx.insert_batch(list(range(150, 200)), x[150:])
    idx.checkpoint()
    idx.close_durable()
    with Container.open(p) as c:
        journal = c.read_array(SectionType.FREELIST)
        assert journal.size == 0  # truncated into the checkpoint
        assert c.generation >= 2
    idx2 = IVFIndex.load_durable(p)
    assert idx2.count == 200
    assert idx2.search(x[170], k=1)[0].id == 170


def test_untrained_container_roundtrip(tmp_path):
    x = _data(50)
    idx = IVFIndex(16, config=IVFConfig(nlist=4))
    idx.insert_batch(list(range(50)), x)
    p = str(tmp_path / "u.vx")
    idx.enable_durable(p)
    idx.close_durable()
    idx2 = IVFIndex.load_durable(p)
    assert idx2.count == 50
    assert not idx2.trained
    assert idx2.search(x[3], k=1)[0].id == 3


def test_ivfpq_container_restores_codebooks(tmp_path):
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((8, 16)).astype(np.float32) * 2
    x = (centers[rng.integers(0, 8, 400)] + 0.2 * rng.standard_normal((400, 16))).astype(
        np.float32
    )
    idx = IVFPQIndex(16, config=IVFPQConfig(nlist=4, nprobe=4, m=4, ks=16))
    idx.insert_batch(list(range(400)), x)
    idx.optimize()
    p = str(tmp_path / "pq.vx")
    idx.enable_durable(p)
    idx.close_durable()
    idx2 = IVFIndex.load_durable(p)
    assert isinstance(idx2, IVFPQIndex)
    assert idx2.pq_trained
    r1 = [r.id for r in idx.search(x[7], k=5)]
    r2 = [r.id for r in idx2.search(x[7], k=5)]
    assert r1 == r2


def test_journal_replay_prunes_reused_free_slots(tmp_path):
    """A post-checkpoint insert that reuses a checkpointed-free slot must not
    leave that slot in the free list after recovery (round-1 advisor: the
    next insert silently overwrote the vector, mapping two ids to one
    slot)."""
    d = 8
    idx = IVFIndex(d, config=IVFConfig(nlist=2, nprobe=2))
    va, vb, vc_, vd = [np.full(d, float(i), np.float32) for i in range(1, 5)]
    idx.insert("a", va)
    idx.insert("b", vb)
    idx.remove("b")  # slot 1 freed — recorded in the checkpoint TOMBSTONES
    p = str(tmp_path / "fl.vx")
    idx.enable_durable(p)  # checkpoint: free=[1]
    idx.insert("c", vc_)  # reuses slot 1, journaled (no new checkpoint)
    idx.close_durable()

    idx2 = IVFIndex.load_durable(p)
    assert 1 not in idx2._free, "replayed slot still on the free list"
    idx2.insert("d", vd)  # must NOT overwrite c
    got_c = idx2.search(vc_, k=1)[0]
    got_d = idx2.search(vd, k=1)[0]
    assert got_c.id == "c" and got_d.id == "d"
    assert not (set(idx2._free) & set(idx2._vectors))


def test_journal_preserves_post_checkpoint_metadata(tmp_path):
    """Metadata passed to insert()/update() after enable_durable must survive
    crash recovery (round-1 advisor: journal records had no metadata
    field)."""
    d = 8
    x = _data(20, d)
    idx = IVFIndex(d, config=IVFConfig(nlist=2, nprobe=2))
    idx.insert_batch([f"v{i}" for i in range(10)], x[:10])
    p = str(tmp_path / "md.vx")
    idx.enable_durable(p)
    idx.insert("j1", x[10], metadata={"tag": "journaled"})
    idx.insert_batch(["j2", "j3"], x[11:13], metadatas=[{"n": 2}, {"n": 3}])
    idx.update("v0", metadata={"patched": True})  # metadata-only update
    idx.close_durable()

    idx2 = IVFIndex.load_durable(p)
    assert idx2.search(x[10], k=1)[0].metadata == {"tag": "journaled"}
    assert idx2.search(x[12], k=1)[0].metadata == {"n": 3}
    assert idx2.search(x[0], k=1)[0].metadata == {"patched": True}
