"""Transaction-closure watermark math.

Rook delivers whole transactions atomically: mutations buffer between
``BEGIN`` and ``XID`` and flush as one ``TXReplicationEvent``
(MySQLReplicationStream.java:234-249, 276-282).  In a parallel batch
replay nothing buffers — instead the commit watermark only advances to
GTID prefixes whose transactions are fully present (SURVEY.md §7.0
"Tx atomicity"): the largest gtid ``g`` such that no transaction with
an unapplied event ≤ g is missing events.

Two stream invariants (true of a MySQL binlog and of our generator)
make this computable from per-tx aggregates without a driver scan:

* a transaction's row events occupy a **contiguous** gtid range, so its
  first gtid is ``gtid - seq_in_tx`` and its last is
  ``first + tx_events - 1``;
* ``floor`` (the previous epoch's committed closed watermark) splits
  every tx: members at or below the floor were already applied, so only
  the remainder above the floor must be present in this epoch.

The computation is a cheap per-batch combiner (one row per tx per
batch) followed by a small ``groupby(tx_id)`` — the events themselves
never reach the driver; only the (rare) incomplete transactions do.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Max, Min, Sum


def _tx_partials(batch: pa.Table, floor: int) -> pa.Table:
    """Per-batch combiner: one row per tx_id with events above floor."""
    gtid = batch.column("gtid").to_numpy(zero_copy_only=False)
    keep = gtid > floor
    df = pd.DataFrame(
        {
            "tx_id": batch.column("tx_id").to_numpy(zero_copy_only=False)[keep],
            "gtid": gtid[keep],
            "seq_in_tx": batch.column("seq_in_tx").to_numpy(zero_copy_only=False)[keep],
            "tx_events": batch.column("tx_events").to_numpy(zero_copy_only=False)[keep],
        }
    )
    if len(df) == 0:
        return pa.table(
            {
                "tx_id": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
                "min_gtid": pa.array([], pa.int64()),
                "tx_first": pa.array([], pa.int64()),
                "tx_last": pa.array([], pa.int64()),
            }
        )
    df["tx_first"] = df["gtid"] - df["seq_in_tx"]
    df["tx_last"] = df["tx_first"] + df["tx_events"] - 1
    g = df.groupby("tx_id", sort=False).agg(
        cnt=("gtid", "size"),
        min_gtid=("gtid", "min"),
        tx_first=("tx_first", "first"),
        tx_last=("tx_last", "first"),
    )
    g = g.reset_index().astype(
        {"tx_id": "int64", "cnt": "int64", "min_gtid": "int64",
         "tx_first": "int64", "tx_last": "int64"}
    )
    return pa.Table.from_pandas(g, preserve_index=False)


def _watermark_from_agg(df: pd.DataFrame, floor: int, max_gtid: int) -> int:
    """df columns: cnt, min_gtid, tx_first, tx_last (per tx)."""
    expected = df["tx_last"] - np.maximum(floor, df["tx_first"] - 1)
    open_tx = df[df["cnt"] != expected]
    if open_tx.empty:
        return max(floor, max_gtid)
    return max(floor, int(open_tx["min_gtid"].min()) - 1)


def closed_watermark(events: "ray.data.Dataset", floor: int = -1) -> tuple[int, int]:
    """(closed_wm, max_gtid) for an epoch's raw change events.

    Events with gtid ≤ ``floor`` are treated as already applied.
    Returns ``closed_wm`` (apply only events at or below it this epoch;
    hold the rest back) and ``max_gtid`` seen (-1 on an empty epoch).
    """
    partials = events.map_batches(
        lambda b: _tx_partials(b, floor), batch_format="pyarrow"
    )
    agg = partials.groupby("tx_id").aggregate(
        Sum("cnt", alias_name="cnt"),
        Min("min_gtid", alias_name="min_gtid"),
        Min("tx_first", alias_name="tx_first"),
        Max("tx_last", alias_name="tx_last"),
    )
    # incomplete txs are rare (epoch boundaries only) → tiny take
    incomplete = agg.map_batches(
        lambda t: _filter_incomplete(t, floor), batch_format="pyarrow"
    )
    inc_rows = incomplete.take_all()
    stats = events.aggregate(Max("gtid", alias_name="max_gtid"))
    max_gtid = stats["max_gtid"] if stats and stats.get("max_gtid") is not None else None
    if max_gtid is None:
        return floor, -1
    if not inc_rows:
        return max(floor, int(max_gtid)), int(max_gtid)
    lowest_open = min(int(r["min_gtid"]) for r in inc_rows)
    return max(floor, lowest_open - 1), int(max_gtid)


def _filter_incomplete(t: pa.Table, floor: int) -> pa.Table:
    if len(t) == 0:
        return t
    cnt = t.column("cnt").to_numpy(zero_copy_only=False)
    tx_first = t.column("tx_first").to_numpy(zero_copy_only=False)
    tx_last = t.column("tx_last").to_numpy(zero_copy_only=False)
    expected = tx_last - np.maximum(floor, tx_first - 1)
    return t.filter(pa.array(cnt != expected))


def closed_watermark_table(events: pa.Table, floor: int = -1) -> tuple[int, int]:
    """Same math over an in-memory table (tests / small epochs)."""
    partial = _tx_partials(events, floor)
    if len(partial) == 0:
        return floor, -1
    df = partial.to_pandas()
    g = df.groupby("tx_id").agg(
        cnt=("cnt", "sum"), min_gtid=("min_gtid", "min"),
        tx_first=("tx_first", "min"), tx_last=("tx_last", "max"),
    ).reset_index()
    gtid = events.column("gtid").to_numpy(zero_copy_only=False)
    max_gtid = int(gtid[gtid > floor].max())
    return _watermark_from_agg(g, floor, max_gtid), max_gtid
