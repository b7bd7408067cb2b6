"""Incremental materialized aggregate views over the lake table.

Delta maintenance — the derived-view capability every CDC deployment
builds on top of the change stream (rook's targets maintain a cache
and a Lucene index, `SecondLevelCacheSynchronizer.java:41-67` /
`DefaultRowsMutationIndexer.java:64-88`; an aggregate view is the same
idea applied to a GROUP BY instead of a keyed store): a small
``(group, count, sums...)`` table kept consistent with the lake
WITHOUT rescanning the state.  Each ``refresh()`` reads only the
row-level changefeed between the view's epoch and the table head —
O(changed rows), not O(state) — and folds signed deltas:

    insert  →  +1 doc,  +after  into group(after)
    delete  →  −1 doc,  −before into group(before)
    update  →  −before into group(before), +after into group(after)
               (handles group migration: an update that moves a row
               between groups retracts from the old and adds to the
               new — the before/after pairs the generalized changefeed
               carries exist exactly for this)

All aggregates here are self-maintainable under insert AND delete
(SUM / COUNT — the classic incremental-view-maintenance class), so no
rescan path is ever needed; groups whose doc count reaches zero are
dropped.  The delta aggregation is distributed: signed contributions
are computed per changefeed task (partition-local, no shuffle), then
partially aggregated per batch so only ~|groups| rows per partition
reach the final small groupby; the fold into the prior view happens on
the driver over the view table itself, which is tiny by construction
(one row per group).

Exactly-once: the view commits through the same two-phase protocol as
the lake (parquet lands under ``views/<name>/``, then the view
manifest swaps atomically, stamped with the lake epoch it reflects).
A crash between the two leaves the old manifest in force; re-running
``refresh()`` recomputes the same deltas from the same immutable
snapshots and overwrites the orphan.  Refreshing an already-current
view is a no-op.

At 100 TB: the changefeed is one task per partition (no shuffle), the
per-batch partial aggregation bounds what moves to |groups| rows per
partition, and the driver only ever holds the view table (|groups|
rows) — nothing scales with state or event volume except the
partition-local diffs.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from rookray import sink

__all__ = ["MaterializedView"]


class MaterializedView:
    """A SUM/COUNT GROUP-BY view over a :class:`~rookray.pipeline.LakeTable`,
    maintained incrementally from the changefeed.

    ``group_col`` must be a string payload column; ``sum_cols`` integer
    payload columns (their int64 sums are maintained).  The view table
    has columns ``(group, docs, <col>_sum...)`` sorted by group.
    """

    def __init__(self, lake, name: str, group_col: str = "source",
                 sum_cols: tuple[str, ...] = ("n_tok",)):
        self.lake = lake
        self.name = name
        self.group_col = group_col
        self.sum_cols = tuple(sum_cols)
        self.root = os.path.join(lake.root, "views", name)
        os.makedirs(self.root, exist_ok=True)

    # ------------------------------------------------------------ state

    def _schema(self) -> pa.Schema:
        return pa.schema(
            [("group", pa.string()), ("docs", pa.int64())]
            + [(f"{c}_sum", pa.int64()) for c in self.sum_cols])

    def manifest(self) -> dict | None:
        path = os.path.join(self.root, "view.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def read(self) -> pa.Table:
        """Committed view contents (tiny: one row per group)."""
        m = self.manifest()
        if m is None:
            return pa.Table.from_pylist([], schema=self._schema())
        import pyarrow.parquet as pq
        return pq.read_table(os.path.join(self.root, m["file"]))

    # ---------------------------------------------------------- refresh

    def _signed_deltas(self, feed: "ray.data.Dataset") -> pd.DataFrame:
        """Distributed: changefeed rows → signed per-group partials."""
        gc, sc = self.group_col, self.sum_cols

        def partial(batch: pa.Table) -> pa.Table:
            # one signed contribution row per (side of) change: B-side
            # rows add, A-side rows retract.  Aggregate within the
            # batch so at most 2·|groups in batch| rows leave the task.
            n = len(batch)
            if n == 0:
                return pa.Table.from_pylist([], schema=self._schema())
            change = batch.column("change").to_numpy(zero_copy_only=False)
            frames = []
            for suf, sign in (("b", 1), ("a", -1)):
                # b-side exists for insert/update; a-side for
                # delete/update
                mask = (change != ("delete" if suf == "b" else "insert"))
                if not mask.any():
                    continue
                cols = {"group": batch.column(f"{gc}_{suf}")
                                       .to_numpy(zero_copy_only=False)[mask],
                        "docs": np.full(int(mask.sum()), sign,
                                        dtype=np.int64)}
                for c in sc:
                    v = (batch.column(f"{c}_{suf}")
                         .to_numpy(zero_copy_only=False)
                         .astype(np.int64)[mask])
                    cols[f"{c}_sum"] = sign * v
                frames.append(pd.DataFrame(cols))
            if not frames:
                return pa.Table.from_pylist([], schema=self._schema())
            agg = (pd.concat(frames, ignore_index=True)
                   .groupby("group", as_index=False).sum())
            return pa.Table.from_pandas(agg[["group", "docs"]
                                            + [f"{c}_sum" for c in sc]],
                                        schema=self._schema(),
                                        preserve_index=False)

        rows = (feed.map_batches(partial, batch_format="pyarrow",
                                 zero_copy_batch=True)
                .take_all())
        if not rows:
            return pd.DataFrame({f.name: pd.Series(
                [], dtype=object if f.name == "group" else np.int64)
                for f in self._schema()})
        return (pd.DataFrame(rows)
                .groupby("group", as_index=False).sum())

    def refresh(self) -> dict:
        """Bring the view up to the lake's current epoch.  Reads only
        the changefeed between the two epochs.  Idempotent; no-ops
        when already current."""
        head = self.lake.manifest()
        if head is None:
            raise ValueError(f"lake at {self.lake.root} has no committed "
                             f"state to view")
        head_epoch = int(head["epoch"])
        m = self.manifest()
        if m is not None and int(m["lake_epoch"]) == head_epoch:
            return {"epoch": head_epoch, "refreshed": False,
                    "groups": int(m["groups"])}

        cols = (self.group_col,) + self.sum_cols
        if m is None:
            # first build: one distributed aggregate over the state
            merged = self._aggregate_state().sort_values("group")
        else:
            feed = self.lake.changes_between(int(m["lake_epoch"]),
                                             head_epoch, columns=cols)
            prior = self.read().to_pandas()
            deltas = self._signed_deltas(feed)
            if len(prior) == 0:
                merged = deltas
            else:
                merged = (pd.concat([prior, deltas], ignore_index=True)
                          .groupby("group", as_index=False).sum())
            merged = merged[merged["docs"] > 0].sort_values("group")

        out = pa.Table.from_pandas(
            merged.reset_index(drop=True), schema=self._schema(),
            preserve_index=False)
        rel = f"view-epoch-{head_epoch:06d}.parquet"
        sink.atomic_write_parquet(out, os.path.join(self.root, rel))
        sink.atomic_write_json(
            {"lake_epoch": head_epoch, "file": rel, "groups": len(out),
             "group_col": self.group_col, "sum_cols": list(self.sum_cols)},
            os.path.join(self.root, "view.json"))
        return {"epoch": head_epoch, "refreshed": True, "groups": len(out)}

    def _aggregate_state(self, as_of: int | None = None) -> pd.DataFrame:
        """One distributed pass over a snapshot (bootstrap only)."""
        gc, sc = self.group_col, self.sum_cols

        def partial(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return pa.Table.from_pylist([], schema=self._schema())
            cols = {"group": batch.column(gc).to_numpy(zero_copy_only=False),
                    "docs": np.ones(len(batch), dtype=np.int64)}
            for c in sc:
                cols[f"{c}_sum"] = (batch.column(c)
                                    .to_numpy(zero_copy_only=False)
                                    .astype(np.int64))
            agg = pd.DataFrame(cols).groupby("group", as_index=False).sum()
            return pa.Table.from_pandas(
                agg[["group", "docs"] + [f"{c}_sum" for c in sc]],
                schema=self._schema(), preserve_index=False)

        rows = (self.lake.read(as_of=as_of)
                .map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
                .take_all())
        if not rows:
            return pd.DataFrame({f.name: pd.Series(
                [], dtype=object if f.name == "group" else np.int64)
                for f in self._schema()})
        return pd.DataFrame(rows).groupby("group", as_index=False).sum()
