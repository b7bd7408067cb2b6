"""Stream-table lookup join: enrich a change-event stream against the
committed lake state.

The rook analog is `DefaultRowsMutationIndexer.loadEntity`
(DefaultRowsMutationIndexer.java:125-127): every mutation triggers a
point lookup against the authoritative store before the sink acts on
it.  At lake scale that lookup becomes a *lookup join* of the stream
against one committed snapshot (the Flink temporal-table / lookup-join
shape): each enrichment actor resolves the hash partitions its batch's
keys fall into, loads those partition states lazily from the lake's
immutable epoch-tagged files (partition-pruned, exactly like
``LakeTable.lookup``), caches them under an LRU bound, and joins the
batch vectorized.

Why an actor-pool cache instead of a shuffle: the stream is unbounded,
and a hash co-partitioning exchange is a barrier the streaming executor
cannot run to completion.  Any actor can therefore serve any batch; hot
partitions simply get cached on several actors (duplication bounded by
``max_cached_partitions`` × actor count), cold ones are read on demand.
Snapshot consistency: the partition fragment map is pinned at pipeline
construction — every batch joins against the SAME committed epoch, so
results are reproducible even while new epochs commit concurrently.

At 100 TB: per-actor memory is bounded by the LRU (partitions ×
per-partition state), reads are partition-pruned parquet, and nothing
ever lands on the driver.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import pandas as pd
import pyarrow as pa

from rookray.util import partition_of

__all__ = ["StreamEnricher", "enrich_stream"]


class StreamEnricher:
    """Callable actor class for ``map_batches(..., concurrency=N)``:
    holds an LRU of resolved partition states and left-joins each
    batch's keys against the pinned snapshot."""

    def __init__(self, root: str, frags: dict, num_partitions: int,
                 columns: tuple, types: dict | None = None,
                 key_col: str = "doc_id",
                 suffix: str = "_state", max_cached_partitions: int = 64):
        self.root = root
        # json round-trips / plain dicts: keys may arrive as str
        self.frags = {int(k): v for k, v in frags.items()}
        self.P = int(num_partitions)
        self.columns = tuple(columns)
        self.types = dict(types or {})   # col → pa.DataType of output
        self.key_col = key_col
        self.suffix = suffix
        self.max_cached = int(max_cached_partitions)
        self._cache: OrderedDict[int, pd.DataFrame] = OrderedDict()

    def _load(self, part: int) -> pd.DataFrame:
        if part in self._cache:
            self._cache.move_to_end(part)
            return self._cache[part]
        from rookray.pipeline import _resolve_partition
        base_rel, delta_rels = self.frags.get(part, (None, []))
        state = _resolve_partition(self.root, base_rel, list(delta_rels))
        if state is None or len(state) == 0:
            df = pd.DataFrame(
                {c: pd.Series([], dtype=object) for c in self.columns},
                index=pd.Index([], name="doc_id"))
        else:
            cols = {c: state.column(c).to_numpy(zero_copy_only=False)
                    for c in self.columns}
            df = pd.DataFrame(
                cols, index=pd.Index(
                    state.column("doc_id").to_numpy(zero_copy_only=False),
                    name="doc_id"))
        self._cache[part] = df
        while len(self._cache) > self.max_cached:
            self._cache.popitem(last=False)
        return df

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if len(batch) == 0:
            for c in self.columns:
                batch = batch.append_column(
                    f"{c}{self.suffix}",
                    pa.nulls(0, self.types.get(c, pa.int64())))
            return batch
        parts = partition_of(keys, self.P)
        needed = np.unique(parts)
        lut = pd.concat([self._load(int(p)) for p in needed])
        res = lut.reindex(keys.to_numpy(zero_copy_only=False))
        for c in self.columns:
            col = res[c]
            miss = col.isna().to_numpy()
            t = self.types.get(c, pa.int64())
            if pa.types.is_integer(t):
                vals = np.nan_to_num(
                    col.to_numpy(dtype=np.float64, na_value=np.nan)
                ).astype(np.int64)
                arr = pa.array(vals, type=t, mask=miss)
            elif pa.types.is_floating(t):
                arr = pa.array(col.to_numpy(dtype=np.float64), type=t,
                               mask=miss)
            else:
                vals = np.where(miss, None, col.to_numpy(dtype=object))
                arr = pa.array(vals, type=t)
            batch = batch.append_column(f"{c}{self.suffix}", arr)
        return batch


def enrich_stream(ds, lake, columns: tuple, key_col: str = "doc_id",
                  suffix: str = "_state", as_of: int | None = None,
                  concurrency: int = 2, max_cached_partitions: int = 64,
                  batch_size: int | None = None):
    """Left-join ``ds`` (bounded or unbounded; any Dataset carrying
    ``key_col``) against the lake snapshot's ``columns``, appending
    them as ``<col><suffix>`` (null where the key is absent from the
    state).  The snapshot (head or ``as_of``) is pinned NOW — the
    returned pipeline is consistent even while the lake keeps
    committing."""
    m = lake._snapshot_manifest(as_of)
    if m is None:
        raise ValueError(f"lake at {lake.root} has no committed state")
    payload = lake._manifest_payload(m)
    ptypes = {f.name: f.type for f in payload}
    missing = [c for c in columns if c not in ptypes]
    if missing:
        raise ValueError(f"columns {missing} not in the committed "
                         f"payload schema")
    frags = lake._partition_fragments(m)
    return ds.map_batches(
        StreamEnricher,
        fn_constructor_kwargs=dict(
            root=lake.root, frags=frags,
            num_partitions=int(m["num_partitions"]),
            columns=tuple(columns),
            types={c: ptypes[c] for c in columns},
            key_col=key_col, suffix=suffix,
            max_cached_partitions=max_cached_partitions),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency, batch_size=batch_size)
