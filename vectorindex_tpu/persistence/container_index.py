"""Binary-container persistence for Flat and HNSW indexes (ROADMAP #7).

The reference persists Flat/HNSW as flat JSON records and rebuilds the HNSW
graph by reinsertion on load (HNSWIndex.swift:755-781) — a deliberate gap
its docs acknowledge. Here both families get the CRC'd mmap container
(persistence/native/container.cpp) as a second tier: the flat corpus and
the *graph itself* (per-layer neighbor tables, node tables, levels, entry
point) are sections, so `load_hnsw_container` restores a 1M-node graph by
reading arrays instead of re-running construction.

Sections:
  META          json blob: type/dimension/metric/config/counters
  VECS          raw vectors [next_slot, d] f32
  TOMBSTONES    live mask [next_slot] u8
  IDMAP         external<->slot blob (ops/idmap)
  TELEMETRY     metadata json blob (aligned with slots)
  GRAPH_NBRS    (HNSW, nth=layer) fixed-degree neighbor tables i32
  GRAPH_NODES   (HNSW, nth=layer) row -> slot tables i32
  LEVELS        (HNSW) per-slot level i32
"""

from __future__ import annotations

import json

import numpy as np

from vectorindex_tpu.persistence.container import Container, SectionType
from vectorindex_tpu.utils.config import Metric
from vectorindex_tpu.utils.errors import ErrorBuilder, IndexErrorKind


def _meta_json(obj) -> bytes:
    return json.dumps(obj).encode()


def _metadata_blob(metadata_list, n) -> bytes:
    return json.dumps([metadata_list[i] for i in range(n)]).encode()


def _check_type(meta: dict, expected: str):
    if meta.get("type") != expected:
        raise (
            ErrorBuilder(IndexErrorKind.CORRUPT_DATA)
            .message(
                f"container holds a {meta.get('type')!r} index, expected "
                f"{expected!r}"
            )
            .build()
        )


def _next_pow2(n: int) -> int:
    return 1 << max(10, (max(n, 1) - 1).bit_length())


# ---------------------------------------------------------------------------
# FlatIndex
# ---------------------------------------------------------------------------


def save_flat_container(idx, path: str) -> None:
    n = idx._next_slot
    with Container.create(path) as c:
        c.add_blob(
            SectionType.META,
            _meta_json(
                {
                    "type": "flat",
                    "dimension": idx.dimension,
                    "metric": idx.metric.value,
                    "next_slot": n,
                    "free": sorted(idx._free),
                }
            ),
        )
        c.add_array(SectionType.VECS, idx._vectors[:n].astype(np.float32))
        c.add_array(
            SectionType.TOMBSTONES, idx._valid[:n].astype(np.uint8)
        )
        # persisted norm cache (reference NormCacheHeader, Norms.swift:244):
        # loaders pre-warm the device mirror from it instead of recomputing
        sqn = np.einsum(
            "nd,nd->n", idx._vectors[:n], idx._vectors[:n], dtype=np.float32
        )
        c.add_array(SectionType.NORMS_SQ, sqn)
        c.add_blob(SectionType.IDMAP, idx._idmap.to_blob())
        c.add_blob(SectionType.TELEMETRY, _metadata_blob(idx._metadata, n))


def load_flat_container(path: str):
    from vectorindex_tpu.models.flat import FlatIndex
    from vectorindex_tpu.ops.idmap import IDMap

    with Container.open(path) as c:
        c.verify_all()
        meta = json.loads(c.read_blob(SectionType.META))
        _check_type(meta, "flat")
        n = meta["next_slot"]
        idx = FlatIndex(
            meta["dimension"], Metric(meta["metric"]), capacity=max(n, 1)
        )
        if n:
            vecs = c.read_array(SectionType.VECS).reshape(n, meta["dimension"])
            valid = c.read_array(SectionType.TOMBSTONES)
            idx._vectors[:n] = vecs
            idx._valid[:n] = valid.astype(bool)
        idx._idmap = IDMap.from_blob(c.read_blob(SectionType.IDMAP))
        metadata = json.loads(c.read_blob(SectionType.TELEMETRY))
        for i, m in enumerate(metadata):
            idx._metadata[i] = m
        idx._next_slot = n
        idx._free = list(meta["free"])
        # pre-warm the device mirror from the persisted norm cache
        # (NormCacheHeader parity): load→serve skips the O(n·d) recompute.
        # Any later mutation clears _dev and recomputes — no staleness path.
        if n and c.find(SectionType.NORMS_SQ) >= 0:
            import jax
            import jax.numpy as jnp

            # capacity is pow2-rounded past n; the pad rows are zero
            # vectors, whose norms are exactly 0 (matches a recompute).
            # np.array (not asarray): the section view aliases the mapping,
            # which closes with the container — a real copy is required.
            sqn_h = np.zeros(idx.capacity, np.float32)
            sqn_h[:n] = np.array(c.read_array(SectionType.NORMS_SQ))
            vecs_d = jnp.asarray(idx._vectors, dtype=idx.storage_dtype)
            sqn_d = jnp.asarray(sqn_h)
            inv_d = jnp.where(
                sqn_d > 0, jax.lax.rsqrt(jnp.maximum(sqn_d, 1e-30)), 0.0
            )
            idx._dev = (vecs_d, sqn_d, inv_d, jnp.asarray(idx._valid))
        return idx


# ---------------------------------------------------------------------------
# HNSWIndex
# ---------------------------------------------------------------------------


def save_hnsw_container(idx, path: str) -> None:
    idx._ensure_built()  # persist a fully-constructed graph
    n = idx._next_slot
    with Container.create(path) as c:
        c.add_blob(
            SectionType.META,
            _meta_json(
                {
                    "type": "hnsw",
                    "dimension": idx.dimension,
                    "metric": idx.metric.value,
                    "config": {
                        "m": idx.config.m,
                        "ef_construction": idx.config.ef_construction,
                        "ef_search": idx.config.ef_search,
                        "seed": idx.config.seed,
                        "stream": idx.config.stream,
                        "build_chunk": idx.config.build_chunk,
                        "build_expand": idx.config.build_expand,
                    },
                    "next_slot": n,
                    "entry": idx._entry,
                    "r2": idx._r2,
                    "level_counter": idx._level_counter,
                    "n_layers": len(idx._layers),
                    "layer_degrees": [l.max_degree for l in idx._layers],
                }
            ),
        )
        c.add_array(SectionType.VECS, idx._vectors[:n].astype(np.float32))
        c.add_array(SectionType.TOMBSTONES, idx._valid[:n].astype(np.uint8))
        c.add_array(SectionType.LEVELS, idx._levels[:n].astype(np.int32))
        for layer in idx._layers:
            rows = layer.count
            c.add_array(
                SectionType.GRAPH_NBRS,
                np.ascontiguousarray(layer.nbrs[:rows] if rows else
                                     np.zeros((0, layer.max_degree), np.int32)),
            )
            c.add_array(
                SectionType.GRAPH_NODES,
                np.asarray(layer.node_ids, dtype=np.int32),
            )
        c.add_blob(SectionType.IDMAP, idx._idmap.to_blob())
        c.add_blob(SectionType.TELEMETRY, _metadata_blob(idx._metadata, n))


def load_hnsw_container(path: str):
    from vectorindex_tpu.models.hnsw import HNSWConfig, HNSWIndex, _Level
    from vectorindex_tpu.ops.idmap import IDMap

    with Container.open(path) as c:
        c.verify_all()
        meta = json.loads(c.read_blob(SectionType.META))
        _check_type(meta, "hnsw")
        cfg = HNSWConfig(**meta["config"])
        idx = HNSWIndex(meta["dimension"], Metric(meta["metric"]), cfg)
        n = meta["next_slot"]
        cap = _next_pow2(n)
        d = meta["dimension"]
        idx._vectors = np.zeros((cap, d), dtype=np.float32)
        idx._graph_vecs = np.zeros((cap, d), dtype=np.float32)
        idx._valid = np.zeros((cap,), dtype=bool)
        idx._levels = np.full((cap,), -1, dtype=np.int32)
        idx._lookup0 = np.full((cap,), -1, dtype=np.int32)
        idx._metadata = [None] * cap
        if n:
            idx._vectors[:n] = c.read_array(SectionType.VECS).reshape(n, d)
            idx._valid[:n] = c.read_array(SectionType.TOMBSTONES).astype(bool)
            idx._levels[:n] = c.read_array(SectionType.LEVELS)
            idx._graph_vecs[:n] = idx._to_graph_space(idx._vectors[:n])
        idx._next_slot = n
        idx._entry = meta["entry"]
        idx._r2 = meta["r2"]
        idx._level_counter = meta["level_counter"]
        idx._layers = []
        for li in range(meta["n_layers"]):
            layer = _Level(meta["layer_degrees"][li])
            nodes = c.read_array(SectionType.GRAPH_NODES, nth=li)
            layer.node_ids = [int(s) for s in nodes]
            rows = len(layer.node_ids)
            nbrs = c.read_array(SectionType.GRAPH_NBRS, nth=li)
            # pow2-pad the backing: sized-to-rows backing grows (doubles) on
            # the FIRST post-load insert, changing the device table shape and
            # recompiling every graph program mid-stream
            bcap = _next_pow2(rows) if rows else 0
            layer.nbrs = np.full((bcap, layer.max_degree), -1, np.int32)
            if rows:
                layer.nbrs[:rows] = nbrs.reshape(rows, layer.max_degree)
            if li == 0 and rows:
                idx._lookup0[nodes.astype(np.int64)] = np.arange(
                    rows, dtype=np.int32
                )
            idx._layers.append(layer)
        if not idx._layers:
            idx._layers = [_Level(2 * cfg.m)]
        idx._idmap = IDMap.from_blob(c.read_blob(SectionType.IDMAP))
        for i, m in enumerate(json.loads(c.read_blob(SectionType.TELEMETRY))):
            idx._metadata[i] = m
        return idx
