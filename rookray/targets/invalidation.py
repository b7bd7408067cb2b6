"""Keyed cache-invalidation target — the 2nd-level / query cache
evictor analog (rook-target-hibernate4-cache).

Semantics reproduced from the reference:

* **Registry** (C6/C8): a per-table list of ``EvictionTarget(name,
  key_fields, is_collection, query_spaces)`` — the dataclass analog of
  ``SynchronizationContext`` scanning Hibernate mappings
  (SynchronizationContext.java:39-143) and ``EvictionTarget``
  (EvictionTarget.java:21-46).  Lookup is by lowercase ``db.table``
  qualification (SecondLevelCacheSynchronizer.java:44).
* **Before-image keying** (C2): updates evict under the BEFORE image's
  key (AbstractCacheSynchronizer.java:63-79 — insert→rows, delete→rows,
  update→before).
* **Entity vs collection null-key policy** (C3): a collection target
  with a null key skips the row; an entity target with a null key is an
  error (SecondLevelCacheSynchronizer.java:52-60).
* **Query-space distinct-union per tx** (C4/C5): union the query spaces
  of all mutations in a transaction, one bulk invalidation per tx
  (QueryCacheSynchronizer.java:47-77).

Output is data, not side effects: eviction / invalidation row sets a
cache layer would consume — which keeps the target replayable and
testable.  Everything is vectorized map_batches + one small groupby.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from rookray.schema import OP_UPDATE


@dataclass(frozen=True)
class EvictionTarget:
    """(name, key, collection?) — EvictionTarget.java:21-46 analog.

    ``key_fields`` is ordered: composite keys evict under the tuple in
    this canonical order regardless of payload column order (the
    binlog-position-order lesson of SynchronizationContextTest.java:63-69
    — names, not positions, are authoritative here)."""

    name: str
    key_fields: tuple[str, ...] = ("doc_id",)
    is_collection: bool = False
    query_spaces: tuple[str, ...] = ()


class NullEntityKeyError(ValueError):
    """Entity eviction with a null key — SecondLevelCacheSynchronizer.java:56-59."""


class CacheInvalidationTarget:
    """Turns change events into eviction + query-invalidation row sets."""

    def __init__(self, registry: dict[str, list[EvictionTarget]]):
        # lowercase-qualified lookup, SynchronizationContext.java:131-138
        self.registry = {k.lower(): v for k, v in registry.items()}

    # ---------------------------------------------------------- kernels

    @staticmethod
    def _image_field(batch: pa.Table, name: str) -> pa.Array:
        """Per-field before/after merge: insert→after, delete→before,
        update→BEFORE (C2, AbstractCacheSynchronizer.java:63-79).
        Done per scalar field (pc.if_else has no struct kernel)."""
        before = batch.column("before").combine_chunks()
        after = batch.column("after").combine_chunks()
        use_before = pc.invert(before.is_null())
        b = before.field(name) if name in [f.name for f in before.type] else pa.nulls(len(batch), pa.string())
        a = after.field(name) if name in [f.name for f in after.type] else pa.nulls(len(batch), pa.string())
        # a field under a null parent struct must read as null
        b = pc.if_else(before.is_null(), pa.nulls(len(batch), b.type), b)
        a = pc.if_else(after.is_null(), pa.nulls(len(batch), a.type), a)
        return pc.if_else(use_before, b, a)

    def evictions_batch(self, batch: pa.Table) -> pa.Table:
        """One output row per (affected row × eviction target)."""
        qual = pc.utf8_lower(
            pc.binary_join_element_wise(batch.column("db"), batch.column("table"), ".")
        )
        quals = qual.to_pylist() if len(batch) else []
        out_names, out_keys, out_kinds, out_gtids, out_txs = [], [], [], [], []
        # group rows by qualified table (few distinct per batch)
        qual_arr = np.asarray(quals, dtype=object)
        all_fields = {
            f for ts in self.registry.values() for t in ts for f in t.key_fields
        }
        merged = {f: self._image_field(batch, f) for f in all_fields} if len(batch) else {}
        for q in set(quals):
            targets = self.registry.get(q)
            if not targets:
                continue
            idx = np.flatnonzero(qual_arr == q)
            take = pa.array(idx, type=pa.int64())
            gtids = batch.column("gtid").take(take)
            txs = batch.column("tx_id").take(take)
            for t in targets:
                keys = [merged[f].take(take) for f in t.key_fields]
                if len(keys) == 1:
                    key_str = pc.cast(keys[0], pa.string())
                else:
                    key_str = pc.binary_join_element_wise(
                        *[pc.cast(k, pa.string()) for k in keys], "\x1f",
                        null_handling="emit_null",
                    )
                null_mask = pc.is_null(key_str)
                if t.is_collection:
                    keep = pc.invert(null_mask)  # skip null-key rows (C3)
                    key_str = key_str.filter(keep)
                    g, x = gtids.filter(keep), txs.filter(keep)
                else:
                    if pc.any(null_mask).as_py():
                        raise NullEntityKeyError(
                            f"null key for entity eviction target {t.name!r}"
                        )
                    g, x = gtids, txs
                n = len(key_str)
                out_names.append(pa.array([t.name] * n))
                out_keys.append(key_str)
                out_kinds.append(pa.array(["collection" if t.is_collection else "entity"] * n))
                out_gtids.append(g)
                out_txs.append(x)
        if not out_names:
            return pa.table(
                {"gtid": pa.array([], pa.int64()), "tx_id": pa.array([], pa.int64()),
                 "name": pa.array([], pa.string()), "key": pa.array([], pa.string()),
                 "kind": pa.array([], pa.string())}
            )
        def cat(chunks):
            return pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in chunks])
        return pa.table(
            {
                "gtid": cat(out_gtids),
                "tx_id": cat(out_txs),
                "name": cat(out_names),
                "key": cat(out_keys),
                "kind": cat(out_kinds),
            }
        )

    def query_invalidations_batch(self, batch: pa.Table) -> pa.Table:
        """Per-batch partial of (tx_id, space) pairs — final distinct via
        groupby (C4: one bulk invalidate of the distinct union per tx)."""
        qual = pc.utf8_lower(
            pc.binary_join_element_wise(batch.column("db"), batch.column("table"), ".")
        )
        quals = qual.to_pylist() if len(batch) else []
        txs = batch.column("tx_id").to_numpy(zero_copy_only=False)
        pairs: set[tuple[int, str]] = set()
        qual_arr = np.asarray(quals, dtype=object)
        for q in set(quals):
            targets = self.registry.get(q)
            if not targets:
                continue
            spaces = sorted({s for t in targets for s in t.query_spaces})
            if not spaces:
                continue
            for tx in np.unique(txs[qual_arr == q]):
                for s in spaces:
                    pairs.add((int(tx), s))
        pairs = sorted(pairs)
        return pa.table(
            {
                "tx_id": pa.array([p[0] for p in pairs], pa.int64()),
                "space": pa.array([p[1] for p in pairs], pa.string()),
            }
        )

    # ---------------------------------------------------------- pipelines

    def evictions(self, events: "ray.data.Dataset") -> "ray.data.Dataset":
        return events.map_batches(
            self.evictions_batch, batch_format="pyarrow", zero_copy_batch=True
        )

    def query_invalidations(self, events: "ray.data.Dataset") -> "ray.data.Dataset":
        from ray.data.aggregate import Count

        partial = events.map_batches(
            self.query_invalidations_batch, batch_format="pyarrow", zero_copy_batch=True
        )
        # cross-batch distinct (a tx may span batches) as an AGGREGATE
        # (vectorized partial+final), not per-group map_groups Python
        return (partial.groupby(["tx_id", "space"])
                .aggregate(Count(alias_name="_n"))
                .select_columns(["tx_id", "space"]))
