"""Incremental windowed aggregation over an UNBOUNDED stream.

The batch window queries (``cdc_tumbling_window`` etc.) are terminal
groupbys — fine over a finite Dataset, impossible over a live tail (a
groupby is a barrier that waits for end-of-input).  This module closes
that gap: tumbling windows are aggregated incrementally and each
window is EMITTED as soon as the watermark passes its end, while the
stream is still producing — the streaming analog of rook's
transaction-boundary delivery (a tx is emitted when its COMMIT/XID
event arrives, not when the binlog ends;
MySQLReplicationStream.java:234-249).

Scale shape: the heavy reduction happens inside ``map_batches``
(per-batch per-window partials — thousands of raw rows collapse to a
handful of (window, key, partial) rows before anything crosses the
network).  A single small aggregator actor holds ONLY the open
windows' partial state (bounded by windows-in-flight × keys, not by
stream length) and releases each window exactly once.  Rows older
than ``lateness`` behind the watermark are dropped LOUDLY (counted in
the actor, reported at flush) — the standard allowed-lateness
contract.  This is the documented drop-to-raw-actors case: executor
backpressure still governs the map stage; only the tiny final merge
is an actor because a Dataset groupby cannot emit before end-of-input.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


@ray.remote
class _WindowState:
    """Open-window partial store.  update() folds a partial batch in
    and returns every window newly closed by the advanced watermark."""

    def __init__(self, window: int, lateness: int, n_sources: int):
        self.window = int(window)
        self.lateness = int(lateness)
        self.n_sources = int(n_sources)
        self.open: dict[tuple, list] = {}  # (win, key) -> [sum, count]
        self.src_max: dict[str, int] = {}  # per-source high-water mark
        self.late_dropped = 0

    def _watermark(self) -> int:
        # the PER-SOURCE watermark: each parallel read task is
        # gtid-ordered internally but tasks interleave arbitrarily, so
        # the only safe completion point for a window is min over ALL
        # sources of their local max (a global max closes windows while
        # a slower task's rows for them are still in flight — the bug
        # this replaced).  Until every source has reported, nothing
        # closes.
        if len(self.src_max) < self.n_sources:
            return -(1 << 62)
        return min(self.src_max.values())

    def _closed(self, w: int) -> bool:
        # monotone watermark ⇒ once true, true forever: exactly-once
        # emission needs no emitted-window log, and state stays bounded
        # by the OPEN windows alone even on an infinite stream
        return w + self.window <= self._watermark() - self.lateness

    def _close_ready(self) -> list[tuple]:
        ready = sorted(p for p in self.open if self._closed(p[0]))
        return [(w, k, *self.open.pop((w, k))) for (w, k) in ready]

    def update(self, wins, keys, sums, counts, max_t, src) -> list[tuple]:
        for w, k, s, c in zip(wins, keys, sums, counts):
            if self._closed(w):
                self.late_dropped += int(c)
                continue
            slot = self.open.setdefault((int(w), k), [0.0, 0])
            slot[0] += float(s)
            slot[1] += int(c)
        self.src_max[src] = max(self.src_max.get(src, -(1 << 62)),
                                int(max_t))
        return self._close_ready()

    def flush(self) -> tuple[list[tuple], int]:
        out = [(win, key, s, c) for (win, key), (s, c)
               in sorted(self.open.items())]
        self.open.clear()
        return out, self.late_dropped


def _closed_table(rows: list[tuple], key_col: str) -> pa.Table:
    df = pd.DataFrame(rows, columns=["window_start", key_col,
                                     "sum_value", "n_events"])
    return pa.Table.from_pandas(
        df.astype({"window_start": np.int64, "sum_value": np.float64,
                   "n_events": np.int64}), preserve_index=False)


def tumbling_stream(ds: "ray.data.Dataset", window: int, ts_col: str,
                    key_col: str, value_col: str | None = None,
                    lateness: int = 0,
                    n_sources: int = 1) -> Iterator[pa.Table]:
    """Incrementally aggregate ``ds`` (typically
    ``rookray.source.stream_events``) into tumbling windows of
    ``window`` ticks of the monotone-ish ``ts_col``; yield one Arrow
    table of (window_start, key, sum_value, n_events) rows per batch
    of CLOSED windows, as soon as the watermark
    (``max ts seen - lateness``) passes each window's end.  A final
    table flushes the still-open windows at end-of-stream.

    The generator pulls the map stage through ``iter_batches`` — the
    executor's backpressure bounds in-flight data; the aggregator actor
    bounds state to open windows only.

    Emission latency: the fused read→partial task buffers OUTPUT rows
    up to ``DataContext.target_max_block_size`` before yielding, and
    partial rows are ~50 bytes each — orders of magnitude smaller than
    the raw events they summarize.  A low-rate tail therefore flushes
    partials (and hence closes windows) only at that byte boundary;
    lower ``target_max_block_size`` for latency-sensitive streams (the
    same knob ``stream_events`` documents, but sized to the PARTIAL
    rows here).
    """

    def partial(batch: pa.Table) -> pa.Table:
        # the source identity: the fused read→partial task is
        # long-lived (one per stream_events read task), so its task id
        # is a stable per-source key for the watermark.  Pass
        # n_sources = the stream's parallelism.
        src = ray.get_runtime_context().get_task_id() or "driver"
        df = pd.DataFrame({
            "t": batch.column(ts_col).to_numpy(zero_copy_only=False)
                 .astype(np.int64),
            "k": batch.column(key_col).to_pandas(),
            "v": (batch.column(value_col).to_numpy(zero_copy_only=False)
                  .astype(np.float64) if value_col
                  else np.ones(len(batch))),
        })
        df["w"] = (df["t"] // window) * window
        g = (df.groupby(["w", "k"], sort=False)["v"]
             .agg(["sum", "size"]).reset_index())
        g["max_t"] = df["t"].max()
        g["src"] = src
        return pa.Table.from_pandas(
            g.rename(columns={"sum": "s", "size": "c"}).astype(
                {"w": np.int64, "s": np.float64, "c": np.int64,
                 "max_t": np.int64}), preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    state = _WindowState.remote(window, lateness, n_sources)
    try:
        for b in partials.iter_batches(batch_format="pyarrow",
                                       batch_size=None):
            # a flushed output block can concatenate partials of
            # several sources — split per source so each watermark
            # advances with ITS max only
            for src in pa.compute.unique(b.column("src")).to_pylist():
                sb = b.filter(pa.compute.equal(b.column("src"), src))
                closed = ray.get(state.update.remote(
                    sb.column("w").to_pylist(),
                    sb.column("k").to_pylist(),
                    sb.column("s").to_pylist(),
                    sb.column("c").to_pylist(),
                    int(pa.compute.max(sb.column("max_t")).as_py()),
                    src))
                if closed:
                    yield _closed_table(closed, key_col)
        rest, late = ray.get(state.flush.remote())
        if late:
            import logging
            logging.getLogger("ray").warning(
                "tumbling_stream: dropped %d late rows (> %d ticks "
                "behind the watermark)", late, lateness)
        if rest:
            yield _closed_table(rest, key_col)
    finally:
        ray.kill(state, no_restart=True)
