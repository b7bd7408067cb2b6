"""Row-windowed (rolling) per-key aggregates.

The time-bucketed windows (tumbling/hopping/session — batch in
``queries.py``, streaming in ``streaming.py``) bucket BY TIME; this
module covers the other windowed-aggregate flavor: SQL's
``ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW`` over each key's ordered
history (moving sums/averages, momentum features).

Scale shape — the proven coarse-partition pattern (``cdc_lww_state``):
keys hash into a FIXED number of coarse partitions (one Python call
per partition, not per key — millions of per-key groups is the
groupby-granularity trap), each partition sorts once and computes every
key's rolling window in one vectorized prefix-sum pass with per-key
clamping.  One shuffle total; a partition must fit in a worker heap
(same contract as the LWW final stage).

Reference scope note: rook has no windowed aggregation at all (events
apply one at a time); this extends the S7 tx-window analog family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def rolling_sum_per_key(ds, key_col: str, order_col: str, value_col: str,
                        k: int, out_col: str = "roll_sum",
                        num_partitions: int = 16):
    """Per key ordered by ``order_col``: sum of ``value_col`` over the
    last ``k`` rows (current included, fewer at each key's head) —
    SQL's ``SUM(v) OVER (PARTITION BY key ORDER BY ord
    ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW)``.

    Returns a Dataset of (key_col, order_col, out_col) rows.
    ``order_col`` must be unique per key (deterministic order).
    """
    if k < 1:
        raise ValueError("k must be >= 1")

    def add_part(batch: pa.Table) -> pa.Table:
        key = batch.column(key_col)
        if pa.types.is_integer(key.type):
            u = key.to_numpy(zero_copy_only=False).astype(np.uint64)
            part = (u * np.uint64(2654435761)) % np.uint64(num_partitions)
        else:
            from rookray.util import hash_strings
            part = hash_strings(key.combine_chunks()) % np.uint64(num_partitions)
        return batch.append_column("part",
                                   pa.array(part.astype(np.int64)))

    def roll_part(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["part"]).sort_by(
            [(key_col, "ascending"), (order_col, "ascending")])
        n = len(t)
        if n == 0:
            return pa.table({key_col: group.column(key_col).slice(0, 0),
                             order_col: group.column(order_col).slice(0, 0),
                             out_col: pa.array([], pa.float64())})
        keys = t.column(key_col)
        v = (t.column(value_col).to_numpy(zero_copy_only=False)
             .astype(np.float64))
        # per-key segment starts, then one prefix-sum pass: window
        # low bound = max(i - k + 1, key_start), so
        # roll[i] = c[i+1] - c[max(i-k+1, start)]
        if n > 1:
            neq = pc.not_equal(keys.slice(1), keys.slice(0, n - 1))
            new_key = np.concatenate([[True],
                                      neq.to_numpy(zero_copy_only=False)
                                      .astype(bool)])
        else:
            new_key = np.array([True])
        seg_start = np.maximum.accumulate(
            np.where(new_key, np.arange(n), 0))
        c = np.concatenate([[0.0], np.cumsum(v)])
        lo = np.maximum(np.arange(n) - k + 1, seg_start)
        out = c[np.arange(1, n + 1)] - c[lo]
        return pa.table({key_col: keys,
                         order_col: t.column(order_col),
                         out_col: pa.array(out)})

    return (ds.map_batches(add_part, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("part").map_groups(roll_part, batch_format="pyarrow"))
