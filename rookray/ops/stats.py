"""Distributed order statistics without a global sort.

A global ``Dataset.sort`` is an all-to-all exchange of EVERY row — the
exact shape the 100 TB design avoids.  For quantiles over a bounded
(quantized) value domain the histogram route is exact and exchanges
only distinct values: per-batch ``value_counts`` combiner → one small
``groupby(value).sum`` shuffle → a driver cumsum over the distinct
histogram (bounded by the domain, NOT the row count).

Reference scope note: rook has no aggregation surface at all; this
extends the engine's stats family (cdc_sampled_stats, vocab_topk).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def exact_quantiles(ds, value_col: str, qs_permille: list[int],
                    quant_digits: int = 2,
                    max_distinct: int = 5_000_000) -> pd.DataFrame:
    """Exact quantiles of ``value_col`` quantized to ``quant_digits``
    decimals: for each q (permille), the value at rank
    ``ceil(q/1000 * n)`` of the sorted multiset — the smallest
    quantized value whose cumulative count reaches the rank.

    Returns a small DataFrame (q_permille, value_q).  Exchanges one
    (distinct value, count) row per distinct quantized value; raises
    LOUDLY if the distinct count exceeds ``max_distinct`` (the bounded-
    domain contract — widen quantization or switch to a sketch)."""
    from ray.data.aggregate import Sum

    scale = 10 ** quant_digits

    def partial(batch: pa.Table) -> pa.Table:
        v = (batch.column(value_col).to_numpy(zero_copy_only=False)
             .astype(np.float64))
        vq = np.floor(v * scale + 0.5).astype(np.int64)
        u, c = np.unique(vq, return_counts=True)
        return pa.table({"vq": pa.array(u),
                         "c": pa.array(c.astype(np.int64))})

    hist_ds = (ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
               .groupby("vq").aggregate(Sum("c", alias_name="c"))
               .materialize())  # one execution: count() then to_pandas()
    n_distinct = hist_ds.count()
    if n_distinct > max_distinct:
        raise ValueError(
            f"{n_distinct} distinct quantized values exceed "
            f"max_distinct={max_distinct}; lower quant_digits or use a "
            "sketch")
    hist = hist_ds.to_pandas().sort_values("vq").reset_index(drop=True)
    cum = hist["c"].cumsum().to_numpy()
    n = int(cum[-1]) if len(cum) else 0
    rows = []
    for q in qs_permille:
        if not 0 < q <= 1000:
            raise ValueError(f"q_permille {q} outside (0, 1000]")
        rank = -((-q * n) // 1000)  # integer ceil(q/1000 * n)
        i = int(np.searchsorted(cum, rank, side="left"))
        rows.append((int(q), int(hist["vq"].iloc[i])))
    return pd.DataFrame(rows, columns=["q_permille", "value_q"])


def grouped_quantiles(ds, key_col: str, value_col: str,
                      qs_permille: list[int], quant_digits: int = 2,
                      num_partitions: int = 16):
    """Exact PER-KEY quantiles, still without a global sort: per-batch
    (key, value) histogram combiner → one (key, value) shuffle → keys
    coarse-hash-partitioned (the ``cdc_lww_state`` pattern: one Python
    call per partition, not per key), each partition sorted once and
    every key's rank picked in one vectorized ``searchsorted`` over the
    global count cumsum.

    Returns a Dataset of (key_col, q_permille, value_q) rows."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    for q in qs_permille:
        if not 0 < q <= 1000:
            raise ValueError(f"q_permille {q} outside (0, 1000]")
    qs = sorted(int(q) for q in qs_permille)
    scale = 10 ** quant_digits

    def partial(batch: pa.Table) -> pa.Table:
        v = (batch.column(value_col).to_numpy(zero_copy_only=False)
             .astype(np.float64))
        vq = np.floor(v * scale + 0.5).astype(np.int64)
        t = pa.table({key_col: batch.column(key_col),
                      "vq": pa.array(vq, pa.int64())})
        g = t.group_by([key_col, "vq"], use_threads=False) \
             .aggregate([([], "count_all")])
        return pa.table({key_col: g.column(key_col),
                         "vq": g.column("vq"),
                         "c": g.column("count_all").cast(pa.int64())})

    hist = (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby([key_col, "vq"]).aggregate(Sum("c", alias_name="c")))

    def add_part(batch: pa.Table) -> pa.Table:
        key = batch.column(key_col)
        if pa.types.is_integer(key.type):
            u = key.to_numpy(zero_copy_only=False).astype(np.uint64)
            part = (u * np.uint64(2654435761)) % np.uint64(num_partitions)
        else:
            from rookray.util import hash_strings
            part = hash_strings(key.combine_chunks()) % np.uint64(num_partitions)
        return batch.append_column("part", pa.array(part.astype(np.int64)))

    def quant_part(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["part"]).sort_by(
            [(key_col, "ascending"), ("vq", "ascending")])
        m = len(t)
        if m == 0:
            return pa.table({key_col: group.column(key_col).slice(0, 0),
                             "q_permille": pa.array([], pa.int64()),
                             "value_q": pa.array([], pa.int64())})
        keys = t.column(key_col)
        vq = t.column("vq").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        if m > 1:
            import pyarrow.compute as pc
            neq = (pc.not_equal(keys.slice(1), keys.slice(0, m - 1))
                   .to_numpy(zero_copy_only=False).astype(bool))
            new_key = np.concatenate([[True], neq])
        else:
            new_key = np.array([True])
        seg_idx = np.flatnonzero(new_key)           # segment starts
        C = np.cumsum(c)
        base = np.concatenate([[0], C[:-1]])[seg_idx]  # count before seg
        seg_end = np.concatenate([seg_idx[1:], [m]])
        n_per_key = C[seg_end - 1] - base
        out_k, out_q, out_v = [], [], []
        for q in qs:
            ranks = -((-q * n_per_key) // 1000)     # ceil per key
            idx = np.searchsorted(C, base + ranks, side="left")
            out_k.append(keys.take(pa.array(seg_idx)))
            out_q.append(np.full(len(seg_idx), q, np.int64))
            out_v.append(vq[idx])
        ka = pa.concat_arrays([k.combine_chunks() if isinstance(k, pa.ChunkedArray)
                               else k for k in out_k])
        return pa.table({key_col: ka,
                         "q_permille": pa.array(np.concatenate(out_q)),
                         "value_q": pa.array(np.concatenate(out_v).astype(np.int64))})

    return (hist.map_batches(add_part, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("part").map_groups(quant_part, batch_format="pyarrow"))
