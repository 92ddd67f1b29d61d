"""Durable IVF storage: binary container as the canonical checkpoint +
WAL-appended mutation journal.

Parity target: reference IVF durable mode — IVFIndex.enableKernel30Storage
(IVFIndex.swift:103-144: opens the mmap container, restores the IDMap blob)
with crash-consistent appends routed through the WAL (IVFAppendOpts.durable,
SURVEY.md §5.3/5.4). Closes the reference's own gap where rerank mapping
arrays were NOT reconstructable from a preexisting container
(mappingComplete30=false, IVFIndex.swift:134-143) — here the checkpoint
holds everything needed to rebuild search state, and the journal replays
post-checkpoint mutations.

Layout:
  META        json: {type, dimension, metric, config, next_slot}
  CENTROIDS   [kc, d] f32 (present iff trained)
  VECS        packed CSR vectors [N_pad, d] f32
  IDS         packed CSR row ids [N_pad] i32
  LISTS_DESC  [kc, 2] i32 (start, length)
  IDMAP       blob (external↔internal mapping + tombstones)
  TOMBSTONES  [n_free] i32 free slots
  FREELIST    journal: growable record stream (WAL-durable appends)

Journal records (little-endian):
  u32 kind (1=insert, 2=remove, 3=update_vec, 4=set_metadata) | i32 slot |
  i32 list | u32 ext_len | u32 meta_len | ext_id json bytes |
  metadata json bytes | f32 vec[d] (kinds 1,3 only)
"""

from __future__ import annotations

import json
import struct
from typing import TYPE_CHECKING, Optional

import numpy as np

from vectorindex_tpu.persistence.container import Container, SectionType

if TYPE_CHECKING:
    from vectorindex_tpu.models.ivf import IVFIndex

REC_INSERT = 1
REC_REMOVE = 2
REC_UPDATE = 3
REC_META = 4


def _journal_record(
    kind: int,
    slot: int,
    list_id: int,
    ext_id,
    vec: Optional[np.ndarray],
    metadata=None,
) -> np.ndarray:
    ext = json.dumps(ext_id).encode() if ext_id is not None else b""
    meta = json.dumps(metadata).encode() if metadata is not None else b""
    head = struct.pack("<IiiII", kind, slot, list_id, len(ext), len(meta))
    body = vec.astype("<f4").tobytes() if vec is not None else b""
    return np.frombuffer(head + ext + meta + body, dtype=np.uint8)


def save_ivf_container(idx: "IVFIndex", path: str, journal_capacity: int = 1 << 22) -> None:
    """Write a full checkpoint (the canonical binary format — SURVEY.md §5.4
    'the container becomes the canonical format')."""
    meta = {
        "type": idx.TYPE,
        "dimension": idx.dimension,
        "metric": idx.metric.value,
        "config": {
            "nlist": idx.config.nlist,
            "nprobe": idx.config.nprobe,
            "train_iters": idx.config.train_iters,
            "seed": idx.config.seed,
        },
        "next_slot": idx._next_slot,
        "trained": idx.trained,
    }
    # PQ extras when present
    books = getattr(idx, "_books", None)
    if books is not None:
        meta["pq"] = {
            "m": int(books.m),
            "ks": int(books.ks),
            "dsub": int(books.dsub),
        }
        cfg = idx.config
        for k in ("m", "ks", "pq_iters", "rerank", "rerank_c", "host_rerank"):
            if hasattr(cfg, k):
                meta["config"][k] = getattr(cfg, k)

    with Container.create(path, wal_capacity=journal_capacity) as c:
        c.add_blob(SectionType.META, json.dumps(meta).encode())
        if idx.trained:
            c.add_array(SectionType.CENTROIDS, np.asarray(idx._centroids, dtype=np.float32))
            idx._store.sync_device()
            p = idx._store._packed
            # packed host vecs are lane-padded to 128 columns for the Pallas
            # DMA tiling; the container stores logical-d rows (the load path
            # reshapes by `dimension` and repacks, re-padding on the way in)
            c.add_array(
                SectionType.VECS,
                np.ascontiguousarray(
                    p["vecs"][:, : idx.dimension], dtype=np.float32
                ),
            )
            c.add_array(SectionType.IDS, p["row_ids"].astype(np.int32))
            c.add_array(
                SectionType.LISTS_DESC,
                np.stack([p["starts"], p["lengths"]], axis=1).astype(np.int32),
            )
        else:
            slots = sorted(idx._vectors.keys())
            vecs = (
                np.stack([idx._vectors[s] for s in slots])
                if slots
                else np.zeros((0, idx.dimension), np.float32)
            )
            c.add_array(SectionType.VECS, vecs)
            c.add_array(SectionType.IDS, np.asarray(slots, dtype=np.int32))
        if books is not None:
            c.add_array(
                SectionType.CODEBOOKS,
                np.asarray(books.centroids, dtype=np.float32).reshape(books.m, -1),
            )
        c.add_blob(SectionType.IDMAP, idx._idmap.to_blob())
        c.add_array(SectionType.TOMBSTONES, np.asarray(idx._free, dtype=np.int32))
        # metadata (python objects) ride as a JSON blob
        metas = {
            str(slot): m for slot, m in idx._metadata.items() if m is not None
        }
        c.add_blob(SectionType.TELEMETRY, json.dumps(metas).encode())
        # empty growable journal
        c.add_array(
            SectionType.FREELIST,
            np.zeros((0,), dtype=np.uint8),
            capacity_bytes=1 << 16,
        )
        c.sync()


def append_journal(
    c: Container, kind: int, slot: int, list_id: int, vec, ext_id=None, metadata=None
) -> None:
    """Crash-consistent mutation append (reference durable ivf_append via
    IndexMmap WAL)."""
    c.append(
        SectionType.FREELIST,
        _journal_record(
            kind, slot, list_id, ext_id,
            None if vec is None else np.asarray(vec),
            metadata=metadata,
        ),
    )


def load_ivf_container(path: str, cls=None) -> "IVFIndex":
    """Open + WAL-replay + rebuild index state + journal replay."""
    from vectorindex_tpu.models.ivf import IVFConfig, IVFIndex, IVFPQConfig, IVFPQIndex
    from vectorindex_tpu.ops.idmap import IDMap
    from vectorindex_tpu.utils.config import Metric

    with Container.open(path) as c:
        c.verify_all()
        meta = json.loads(c.read_blob(SectionType.META).decode())
        d = meta["dimension"]
        cfg_d = meta["config"]
        if meta["type"] == "ivfpq" or "m" in cfg_d and "ks" in cfg_d and meta.get("pq"):
            cls = IVFPQIndex
            cfg = IVFPQConfig(
                nlist=cfg_d["nlist"], nprobe=cfg_d["nprobe"],
                train_iters=cfg_d["train_iters"], seed=cfg_d["seed"],
                m=cfg_d.get("m", 8), ks=cfg_d.get("ks", 256),
                pq_iters=cfg_d.get("pq_iters", 15),
                rerank=cfg_d.get("rerank", True),
                rerank_c=cfg_d.get("rerank_c", 64),
                host_rerank=cfg_d.get("host_rerank", False),
            )
        else:
            cls = IVFIndex
            cfg = IVFConfig(
                nlist=cfg_d["nlist"], nprobe=cfg_d["nprobe"],
                train_iters=cfg_d["train_iters"], seed=cfg_d["seed"],
            )
        idx = cls(d, Metric(meta["metric"]), cfg)
        idx._idmap = IDMap.from_blob(c.read_blob(SectionType.IDMAP))
        idx._next_slot = meta["next_slot"]
        idx._free = c.read_array(SectionType.TOMBSTONES).astype(int).tolist()
        metas = json.loads(c.read_blob(SectionType.TELEMETRY).decode())
        for k, v in metas.items():
            idx._metadata[int(k)] = v

        vecs = np.array(c.read_array(SectionType.VECS)).reshape(-1, d)
        row_ids = np.array(c.read_array(SectionType.IDS))
        if meta["trained"]:
            idx._centroids = np.array(c.read_array(SectionType.CENTROIDS)).reshape(-1, d)
            desc = np.array(c.read_array(SectionType.LISTS_DESC)).reshape(-1, 2)
            for l in range(desc.shape[0]):
                start, length = int(desc[l, 0]), int(desc[l, 1])
                for r in range(start, start + length):
                    slot = int(row_ids[r])
                    idx._vectors[slot] = vecs[r].copy()
                    idx._store.append(l, slot, vecs[r])
                    idx._slot_list[slot] = l
            books_idx = c.find(SectionType.CODEBOOKS)
            if books_idx >= 0 and meta.get("pq"):
                import jax.numpy as jnp

                from vectorindex_tpu.ops.pq import PQCodebooks

                pq = meta["pq"]
                cents = np.array(c.read_array(SectionType.CODEBOOKS)).reshape(
                    pq["m"], pq["ks"], pq["dsub"]
                )
                cj = jnp.asarray(cents)
                idx._books = PQCodebooks(cj, jnp.sum(jnp.square(cj), axis=-1))
        else:
            for r, slot in enumerate(row_ids):
                idx._vectors[int(slot)] = vecs[r].copy()

        # replay the mutation journal (post-checkpoint inserts/removes)
        journal = c.read_array(SectionType.FREELIST).tobytes()
        off = 0
        rec_head = struct.calcsize("<IiiII")
        vec_bytes = d * 4
        while off + rec_head <= len(journal):
            kind, slot, list_id, ext_len, meta_len = struct.unpack_from(
                "<IiiII", journal, off
            )
            off += rec_head
            ext_id = (
                json.loads(journal[off : off + ext_len].decode()) if ext_len else None
            )
            off += ext_len
            metadata = (
                json.loads(journal[off : off + meta_len].decode()) if meta_len else None
            )
            off += meta_len
            if kind in (REC_INSERT, REC_UPDATE):
                v = np.frombuffer(journal, dtype="<f4", count=d, offset=off).copy()
                off += vec_bytes
                idx._vectors[slot] = v
                if metadata is not None:
                    idx._metadata[slot] = metadata
                if kind == REC_INSERT and ext_id is not None:
                    idx._idmap.append(ext_id, slot)
                    idx._next_slot = max(idx._next_slot, slot + 1)
                if kind == REC_UPDATE and slot in idx._slot_list:
                    idx._store.remove(idx._slot_list.pop(slot), slot)
                if idx.trained and list_id >= 0:
                    idx._store.append(list_id, slot, v)
                    idx._slot_list[slot] = list_id
            elif kind == REC_REMOVE:
                if ext_id is not None and ext_id in idx._idmap:
                    idx._idmap.erase(ext_id)
                idx._vectors.pop(slot, None)
                idx._metadata.pop(slot, None)
                idx._free.append(slot)
                lst = idx._slot_list.pop(slot, None)
                if lst is not None:
                    idx._store.remove(lst, slot)
            elif kind == REC_META:
                idx._metadata[slot] = metadata
            else:
                break

        # Reconcile the free list with the replayed state: a post-checkpoint
        # insert may have reused a slot that the checkpointed TOMBSTONES
        # section still lists as free. Leaving it in _free would let a later
        # insert silently overwrite a live vector (two external ids mapped to
        # one slot). Drop live slots and duplicates, keeping stack order.
        seen: set = set()
        free = []
        for s in idx._free:
            if s in idx._vectors or s in seen:
                continue
            seen.add(s)
            free.append(s)
        idx._free = free
        assert not (set(idx._free) & set(idx._vectors)), "slot both live and free"
        if idx._vectors:
            assert idx._next_slot > max(idx._vectors), "next_slot behind live slots"
        return idx
