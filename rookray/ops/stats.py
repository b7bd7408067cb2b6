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
               .groupby("vq").aggregate(Sum("c", alias_name="c")))
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
