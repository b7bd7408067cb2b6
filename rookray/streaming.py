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
import pyarrow.compute as pc

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


@ray.remote
class _SessionState:
    """Open-session store for gap-based session windows.

    Per key it holds the open sessions as (start, end, sum, count)
    intervals kept ≥ ``gap`` apart; an arriving fragment merges every
    session within ``gap`` of it (interval union under the gap
    metric).  The watermark is the min over sources of the largest
    fragment START consumed (starts, not ends — session windows are
    unaligned, see the partial-stage comment); a session closes
    exactly once, STRICTLY when ``end + gap < watermark - lateness``,
    after which no on-time fragment can reach back into it.  State is
    bounded by the OPEN sessions only; the close scan is O(open
    sessions) per update call (update calls are per partial block,
    not per event — at larger open-key counts an end-time heap would
    replace the scan)."""

    def __init__(self, gap: int, lateness: int, n_sources: int):
        self.gap = int(gap)
        self.lateness = int(lateness)
        self.n_sources = int(n_sources)
        self.open: dict = {}          # key -> [[start, end, sum, cnt], ...]
        self.src_max: dict[str, int] = {}
        self.late_dropped = 0

    def _watermark(self) -> int:
        if len(self.src_max) < self.n_sources:
            return -(1 << 62)
        return min(self.src_max.values())

    def _threshold(self) -> int:
        return self._watermark() - self.lateness

    def _close_ready(self) -> list[tuple]:
        thr = self._threshold()
        out = []
        for k in sorted(self.open):
            lst = self.open[k]
            keep = []
            for s in lst:
                if s[1] + self.gap < thr:
                    out.append((k, s[0], s[1], s[2], s[3]))
                else:
                    keep.append(s)
            if keep:
                self.open[k] = keep
            else:
                del self.open[k]
        return out

    def update(self, keys, starts, ends, sums, counts, max_t, src):
        thr = self._threshold()
        for k, fs, fe, s, c in zip(keys, starts, ends, sums, counts):
            if fe + self.gap < thr:
                # out-of-contract fragment (on-time ones start at or
                # after the watermark): its session already closed
                self.late_dropped += int(c)
                continue
            lst = self.open.setdefault(k, [])
            lo, hi, tot, cnt = int(fs), int(fe), float(s), int(c)
            keep = []
            for sess in lst:
                if sess[1] < lo - self.gap or sess[0] > hi + self.gap:
                    keep.append(sess)
                else:  # within gap → merge
                    lo = min(lo, sess[0])
                    hi = max(hi, sess[1])
                    tot += sess[2]
                    cnt += sess[3]
            keep.append([lo, hi, tot, cnt])
            keep.sort()
            self.open[k] = keep
        self.src_max[src] = max(self.src_max.get(src, -(1 << 62)),
                                int(max_t))
        return self._close_ready()

    def flush(self):
        out = [(k, s[0], s[1], s[2], s[3])
               for k in sorted(self.open) for s in sorted(self.open[k])]
        self.open.clear()
        return out, self.late_dropped


def _session_table(rows: list[tuple], key_col: str) -> pa.Table:
    df = pd.DataFrame(rows, columns=[key_col, "session_start",
                                     "session_end", "sum_value",
                                     "n_events"])
    return pa.Table.from_pandas(
        df.astype({"session_start": np.int64, "session_end": np.int64,
                   "sum_value": np.float64, "n_events": np.int64}),
        preserve_index=False)


def session_stream(ds: "ray.data.Dataset", gap: int, ts_col: str,
                   key_col: str, value_col: str | None = None,
                   lateness: int = 0,
                   n_sources: int = 1) -> Iterator[pa.Table]:
    """Incremental gap-based SESSION windows over an unbounded stream:
    yield one Arrow table of (key, session_start, session_end,
    sum_value, n_events) rows per batch of closed sessions, as soon as
    the watermark passes ``session_end + gap`` — the streaming
    counterpart of the batch ``cdc_session_windows`` query (same gap
    semantics; equality tested end-to-end).

    Scale shape mirrors ``tumbling_stream``: each fused read→partial
    task pre-merges its batch into per-key session FRAGMENTS (sorted
    ts, gap-split — thousands of rows collapse to a handful of
    intervals before crossing the network); a single small aggregator
    actor holds only the open sessions and emits each exactly once.
    Fragments arriving after their session closed are dropped loudly
    (allowed-lateness contract)."""

    def partial(batch: pa.Table) -> pa.Table:
        src = ray.get_runtime_context().get_task_id() or "driver"
        t = batch.column(ts_col).to_numpy(zero_copy_only=False).astype(np.int64)
        k = batch.column(key_col).to_pandas().to_numpy()
        v = (batch.column(value_col).to_numpy(zero_copy_only=False)
             .astype(np.float64) if value_col else np.ones(len(batch)))
        codes = pd.factorize(k)[0]  # lexsort needs a numeric key column
        order = np.lexsort((t, codes))
        t, k, codes, v = t[order], k[order], codes[order], v[order]
        new_frag = np.concatenate(
            [[True], (codes[1:] != codes[:-1]) | (t[1:] - t[:-1] > gap)])
        frag = np.cumsum(new_frag) - 1
        df = pd.DataFrame({"k": k, "frag": frag, "t": t, "v": v})
        g = (df.groupby("frag", sort=True)
             .agg(k=("k", "first"), start=("t", "min"), end=("t", "max"),
                  s=("v", "sum"), c=("v", "size")).reset_index(drop=True))
        # per-ROW watermark stamp = the fragment START, rows sorted by
        # it.  Two traps live here (both measured):
        # 1. Ray splits this output table into sub-blocks consumed
        #    piecewise, so a block-level max stamp advances the
        #    watermark past fragments still pending in later
        #    sub-blocks and drops them as late (9% of events lost);
        # 2. session windows are UNALIGNED, so the stamp must bound
        #    future fragment STARTS: an end-sorted stamp lets a
        #    session close while a later long fragment — whose start
        #    reaches back within ``gap`` of it — is still pending,
        #    splitting sessions the batch semantics would merge
        #    (115 sessions where the oracle has 95).
        # With start-sorted start-stamps, every pending fragment of a
        # source starts at or after everything it has reported, so a
        # closed session (end + gap < watermark) can never have an
        # on-time mergeable fragment outstanding.
        g = g.sort_values("start").reset_index(drop=True)
        g["max_t"] = g["start"]
        g["src"] = src
        return pa.Table.from_pandas(
            g.astype({"start": np.int64, "end": np.int64,
                      "s": np.float64, "c": np.int64,
                      "max_t": np.int64}), preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    state = _SessionState.remote(gap, lateness, n_sources)
    try:
        for b in partials.iter_batches(batch_format="pyarrow",
                                       batch_size=None):
            for src in pa.compute.unique(b.column("src")).to_pylist():
                sb = b.filter(pa.compute.equal(b.column("src"), src))
                closed = ray.get(state.update.remote(
                    sb.column("k").to_pylist(),
                    sb.column("start").to_pylist(),
                    sb.column("end").to_pylist(),
                    sb.column("s").to_pylist(),
                    sb.column("c").to_pylist(),
                    int(pa.compute.max(sb.column("max_t")).as_py()),
                    src))
                if closed:
                    yield _session_table(closed, key_col)
        rest, late = ray.get(state.flush.remote())
        if late:
            import logging
            logging.getLogger("ray").warning(
                "session_stream: dropped %d late rows (session already "
                "closed under lateness=%d)", late, lateness)
        if rest:
            yield _session_table(rest, key_col)
    finally:
        ray.kill(state, no_restart=True)


class WindowSink:
    """Exactly-once parquet sink for closed-window emissions, with
    crash-resume — the tail of the end-to-end streaming story
    (source → windowed aggregate → durable sink).

    Window closes are MONOTONE in ``window_start`` (a window closes the
    moment the watermark passes its end, and late rows for closed
    windows are dropped), so the committed frontier is one integer: the
    max ``window_start`` durably written.  ``write()`` drops rows at or
    below the frontier — a restarted job replays its source from
    scratch, re-emits every window, and the sink keeps exactly one copy
    of each.  Two-phase per batch: the parquet file lands first, the
    manifest (frontier + file list) swaps in after; a crash between the
    two leaves an orphan file that is ignored (not in the manifest) and
    overwritten-equivalent on resume.

    ``frontier_col`` adapts the monotonicity argument to the window
    flavor: ``window_start`` for tumbling/hopping; ``session_end`` for
    session streams (sessions close strictly when
    ``end + gap < watermark - lateness``, so closes are monotone in the
    session END instead).
    """

    def __init__(self, root: str, frontier_col: str = "window_start"):
        import json
        import os

        self.root = root
        self.frontier_col = frontier_col
        os.makedirs(root, exist_ok=True)
        self._manifest_path = os.path.join(root, "manifest.json")
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                m = json.load(f)
            if m.get("frontier_col", "window_start") != frontier_col:
                raise ValueError(
                    f"sink at {root} committed with frontier_col="
                    f"{m.get('frontier_col')!r}")
            self.frontier = int(m["frontier"])
            self.files = list(m["files"])
        else:
            self.frontier = -(1 << 62)
            self.files = []

    def write(self, tbl: pa.Table) -> int:
        """Persist the yet-uncommitted rows of one emission batch;
        returns the number of rows written (0 = replay of committed
        windows, fully skipped)."""
        import json
        import os
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        ws = tbl.column(self.frontier_col)
        keep = pc.greater(ws, pa.scalar(self.frontier, pa.int64()))
        fresh = tbl.filter(keep)
        if len(fresh) == 0:
            return 0
        hi = int(pc.max(fresh.column(self.frontier_col)).as_py())
        name = f"windows-{len(self.files):06d}-{hi}.parquet"
        path = os.path.join(self.root, name)
        tmp = path + ".tmp"
        pq.write_table(fresh, tmp)
        os.replace(tmp, path)           # phase 1: data durable
        self.files.append(name)
        self.frontier = max(self.frontier, hi)
        mtmp = self._manifest_path + ".tmp"
        with open(mtmp, "w") as f:
            json.dump({"frontier": self.frontier, "files": self.files,
                       "frontier_col": self.frontier_col}, f)
        os.replace(mtmp, self._manifest_path)  # phase 2: commit
        return len(fresh)

    def read(self) -> pa.Table:
        """All committed windows (manifest-listed files only)."""
        import os
        import pyarrow.parquet as pq

        if not self.files:
            return pa.table({self.frontier_col: pa.array([], pa.int64())})
        return pa.concat_tables(
            [pq.read_table(os.path.join(self.root, n)) for n in self.files],
            promote_options="default")


def hopping_stream(ds: "ray.data.Dataset", window: int, hop: int,
                   ts_col: str, key_col: str,
                   value_col: str | None = None, lateness: int = 0,
                   n_sources: int = 1) -> Iterator[pa.Table]:
    """Incremental HOPPING (sliding) windows over an unbounded stream:
    length ``window``, start every ``hop`` ticks (``window`` must be a
    multiple of ``hop``); each event lands in ``window//hop``
    overlapping windows — the streaming counterpart of the batch
    ``cdc_hopping_window`` query (same double-emit semantics, no
    clipping of pre-epoch starts).

    Reuses the tumbling aggregator actor unchanged: a hopping window
    [w, w+window) closes exactly when the watermark passes its END, and
    the per-group stamp invariant still holds — every exploded window w
    of an event t satisfies t < w + window, so a window can never close
    while its own source has partials for it pending."""
    if window % hop != 0:
        raise ValueError("window must be a multiple of hop")
    nw = window // hop

    def partial(batch: pa.Table) -> pa.Table:
        src = ray.get_runtime_context().get_task_id() or "driver"
        t = (batch.column(ts_col).to_numpy(zero_copy_only=False)
             .astype(np.int64))
        k = batch.column(key_col).to_pandas().to_numpy()
        v = (batch.column(value_col).to_numpy(zero_copy_only=False)
             .astype(np.float64) if value_col
             else np.ones(len(batch)))
        # explode: latest start <= t, then back nw-1 hops (vectorized)
        hi = (t // hop) * hop
        offs = (np.arange(nw, dtype=np.int64) * hop)[:, None]
        w = (hi[None, :] - offs).ravel()
        df = pd.DataFrame({"w": w, "k": np.tile(k, nw),
                           "v": np.tile(v, nw), "t": np.tile(t, nw)})
        g = (df.groupby(["w", "k"], sort=False)
             .agg(s=("v", "sum"), c=("v", "size"), max_t=("t", "max"))
             .reset_index())
        g = g.sort_values("max_t").reset_index(drop=True)  # see tumbling
        g["src"] = src
        return pa.Table.from_pandas(
            g.astype({"w": np.int64, "s": np.float64, "c": np.int64,
                      "max_t": np.int64}), preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    state = _WindowState.remote(window, lateness, n_sources)
    try:
        for b in partials.iter_batches(batch_format="pyarrow",
                                       batch_size=None):
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
                "hopping_stream: dropped %d late rows (> %d ticks "
                "behind the watermark)", late, lateness)
        if rest:
            yield _closed_table(rest, key_col)
    finally:
        ray.kill(state, no_restart=True)


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
        g = (df.groupby(["w", "k"], sort=False)
             .agg(**{"sum": ("v", "sum"), "size": ("v", "size"),
                     "max_t": ("t", "max")}).reset_index())
        # per-GROUP watermark stamp, rows sorted by it (not the block
        # max): this table splits into sub-blocks consumed piecewise,
        # and a block-level stamp lets the watermark overtake pending
        # partials in later sub-blocks, dropping them as late.  A
        # group's max_t is < its window end, so a window can never
        # close while its own source still has partials for it pending.
        g = g.sort_values("max_t").reset_index(drop=True)
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


@ray.remote
class _JoinState:
    """Open-window row buffer for the stream-stream join.  Unlike the
    aggregate actors (which hold one partial per (window, key)), a
    join must buffer the ROWS of both sides until the window closes —
    state is bounded by windows-in-flight × rows-per-window, the
    irreducible cost of stream-stream join semantics (this is why
    every streaming engine requires a window/interval bound on
    stream-stream joins: an unbounded join would buffer forever)."""

    def __init__(self, window: int, lateness: int, n_sources: int,
                 how: str = "inner"):
        self.window = int(window)
        self.lateness = int(lateness)
        self.n_sources = int(n_sources)
        self.how = how
        # (win, key) -> ([(t, v) left], [(t, v) right])
        self.open: dict[tuple, tuple[list, list]] = {}
        self.src_max: dict[str, int] = {}
        self.late_dropped = 0

    def _watermark(self) -> int:
        if len(self.src_max) < self.n_sources:
            return -(1 << 62)
        return min(self.src_max.values())

    def _closed(self, w: int) -> bool:
        return w + self.window <= self._watermark() - self.lateness

    def _pairs(self, w, k) -> list[tuple]:
        left, right = self.open.pop((w, k))
        left.sort()
        right.sort()
        if not right and self.how == "left":
            # left-outer: unmatched left rows emit with a null right —
            # only decidable at window close (no earlier point proves
            # the right side will stay empty), which is why streaming
            # outer joins are inherently watermark-delayed
            return [(w, k, lt, lv, None, None) for lt, lv in left]
        return [(w, k, lt, lv, rt, rv)
                for lt, lv in left for rt, rv in right]

    def _close_ready(self) -> list[tuple]:
        ready = sorted(p for p in self.open if self._closed(p[0]))
        out = []
        for wk in ready:
            out.extend(self._pairs(*wk))
        return out

    def update(self, wins, keys, ts, vals, sides, max_t, src):
        for w, k, t, v, s in zip(wins, keys, ts, vals, sides):
            if self._closed(w):
                self.late_dropped += 1
                continue
            slot = self.open.setdefault((int(w), k), ([], []))
            slot[int(s)].append((int(t), float(v)))
        self.src_max[src] = max(self.src_max.get(src, -(1 << 62)),
                                int(max_t))
        return self._close_ready()

    def flush(self) -> tuple[list[tuple], int]:
        out = []
        for wk in sorted(self.open):
            out.extend(self._pairs(*wk))
        return out, self.late_dropped


def _join_table(rows: list[tuple], key_col: str) -> pa.Table:
    df = pd.DataFrame(rows, columns=["window_start", key_col, "l_ts",
                                     "l_val", "r_ts", "r_val"])
    # r_ts/r_val stay nullable (Int64/float with NaN) for left-outer
    return pa.Table.from_pandas(
        df.astype({"window_start": np.int64, "l_ts": np.int64,
                   "l_val": np.float64, "r_ts": "Int64",
                   "r_val": np.float64}), preserve_index=False)


def join_streams(ds: "ray.data.Dataset", window: int, ts_col: str,
                 key_col: str, side_col: str,
                 val_col: str | None = None, lateness: int = 0,
                 n_sources: int = 2,
                 how: str = "inner") -> Iterator[pa.Table]:
    """Stream-stream INNER join within tumbling windows over TWO
    unbounded upstreams tailed as ONE Dataset: every side-0 row pairs
    with every side-1 row sharing its key inside the same ``window``
    of ``ts_col``, and a window's pairs are EMITTED as soon as the
    combined watermark (min over all (read task, stream) sources,
    minus ``lateness``) passes its end — while both streams are still
    producing.  rook has no two-stream operation (one binlog, one
    thread); this is the capability a CDC deployment needs the moment
    it tails two upstreams (orders × payments) and wants correlated
    windows without landing both first.

    ``ds`` must carry ``side_col`` ∈ {0, 1} — build it with the
    multi-directory tail, ``stream_events([dir_l, dir_r],
    tag_col="side")``: Ray's ``union`` is order-preserving and drains
    its inputs sequentially, so two separate live Datasets can never
    interleave — the two tails have to share one Datasource.

    Yields ``(window_start, key, l_ts, l_val, r_ts, r_val)`` tables; a
    final flush emits still-open windows at end-of-stream, with late
    rows (behind watermark - lateness) dropped and counted loudly.

    ``n_sources`` MUST equal (read parallelism) × 2 — each (task,
    stream) pair is one watermark source, gtid-ordered within itself;
    give each stream at least ``parallelism`` shards so every source
    reports (a silent source delays closes until flush, it never
    corrupts).  The map stage only tags + sorts rows (no
    pre-aggregation is possible for a join — rows must survive to
    pair); in-flight volume is governed by executor backpressure.
    """

    def partial(batch: pa.Table) -> pa.Table:
        src = ray.get_runtime_context().get_task_id() or "driver"
        side = (batch.column(side_col).to_numpy(zero_copy_only=False)
                .astype(np.int64))
        df = pd.DataFrame({
            "t": batch.column(ts_col).to_numpy(zero_copy_only=False)
                 .astype(np.int64),
            "k": batch.column(key_col).to_pandas(),
            "v": (batch.column(val_col).to_numpy(zero_copy_only=False)
                  .astype(np.float64) if val_col
                  else np.ones(len(batch))),
            "side": side,
        })
        # rows ride individually (no pre-aggregation): sort by (side,
        # t) so piecewise-consumed sub-blocks carry monotone watermark
        # stamps per (task, stream) source
        df = (df.sort_values(["side", "t"], kind="mergesort")
              .reset_index(drop=True))
        df["w"] = (df["t"] // window) * window
        df["src"] = np.where(df["side"] == 0, f"0:{src}", f"1:{src}")
        return pa.Table.from_pandas(
            df.astype({"t": np.int64, "v": np.float64, "w": np.int64}),
            preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    state = _JoinState.remote(window, lateness, n_sources, how)
    try:
        for b in partials.iter_batches(batch_format="pyarrow",
                                       batch_size=None):
            for src in pa.compute.unique(b.column("src")).to_pylist():
                sb = b.filter(pa.compute.equal(b.column("src"), src))
                closed = ray.get(state.update.remote(
                    sb.column("w").to_pylist(),
                    sb.column("k").to_pylist(),
                    sb.column("t").to_pylist(),
                    sb.column("v").to_pylist(),
                    sb.column("side").to_pylist(),
                    int(pa.compute.max(sb.column("t")).as_py()),
                    src))
                if closed:
                    yield _join_table(closed, key_col)
        rest, late = ray.get(state.flush.remote())
        if late:
            import logging
            logging.getLogger("ray").warning(
                "join_streams: dropped %d late rows (> %d ticks behind "
                "the watermark)", late, lateness)
        if rest:
            yield _join_table(rest, key_col)
    finally:
        ray.kill(state, no_restart=True)


@ray.remote
class _DedupState:
    """Watermark-evicted seen-set for exactly-once stream dedup.

    State is bounded by the ids inside the dedup horizon (ids with
    ``ts ≥ watermark − horizon``); older entries evict as the combined
    watermark advances.  An id arriving from BEHIND the horizon cannot
    be checked against evicted state — it is dropped and counted as
    late (the allowed-lateness contract: within the horizon delivery
    is exactly-once; beyond it, at-most-once, loudly)."""

    def __init__(self, horizon: int, n_sources: int):
        self.horizon = int(horizon)
        self.n_sources = int(n_sources)
        self.seen: dict = {}       # id -> ts
        self.src_max: dict[str, int] = {}
        self.late_dropped = 0
        self.dup_dropped = 0

    def _watermark(self) -> int:
        if len(self.src_max) < self.n_sources:
            return -(1 << 62)
        return min(self.src_max.values())

    def filter(self, ids, ts, max_t, src) -> list[bool]:
        floor = self._watermark() - self.horizon
        keep = []
        for i, t in zip(ids, ts):
            t = int(t)
            if t < floor:
                self.late_dropped += 1
                keep.append(False)
            elif i in self.seen:
                self.dup_dropped += 1
                keep.append(False)
            else:
                self.seen[i] = t
                keep.append(True)
        self.src_max[src] = max(self.src_max.get(src, -(1 << 62)),
                                int(max_t))
        floor = self._watermark() - self.horizon
        if self.seen and floor > -(1 << 61):
            self.seen = {i: t for i, t in self.seen.items() if t >= floor}
        return keep

    def stats(self) -> dict:
        return {"open_ids": len(self.seen),
                "dup_dropped": self.dup_dropped,
                "late_dropped": self.late_dropped}


def dedup_stream(ds: "ray.data.Dataset", id_col: str, ts_col: str,
                 horizon: int, n_sources: int = 1
                 ) -> Iterator[pa.Table]:
    """Exactly-once delivery over an at-least-once stream: drop every
    repeat of ``id_col`` whose first occurrence is within ``horizon``
    ticks of ``ts_col`` behind the combined watermark — the dedup
    stage a CDC tail needs the moment its upstream replays (shard
    overlap re-present, reconnect re-reads, at-least-once brokers).
    rook gets this implicitly from single-threaded ordered delivery
    (MySQLReplicationStream.java:161-179); a parallel tail has to
    rebuild it with bounded state.

    Yields the surviving rows batch by batch (original schema).  The
    seen-set holds ONLY ids inside the horizon — state is bounded by
    (horizon × event rate), not stream length.  Ids arriving from
    behind the horizon drop loudly (late: uncheckable against evicted
    state).  Each batch's keep mask is decided by a single actor in
    arrival order, so of N copies exactly the first survives.
    """
    state = _DedupState.remote(horizon, n_sources)

    def stamp(batch: pa.Table) -> pa.Table:
        src = ray.get_runtime_context().get_task_id() or "driver"
        order = pc.sort_indices(batch, sort_keys=[(ts_col, "ascending")])
        batch = batch.take(order)
        return batch.append_column(
            "_src", pa.array(np.full(len(batch), src, dtype=object)))

    stamped = ds.map_batches(stamp, batch_format="pyarrow",
                             zero_copy_batch=True)
    try:
        for b in stamped.iter_batches(batch_format="pyarrow",
                                      batch_size=None):
            for src in pc.unique(b.column("_src")).to_pylist():
                sb = b.filter(pc.equal(b.column("_src"), src))
                keep = ray.get(state.filter.remote(
                    sb.column(id_col).to_pylist(),
                    sb.column(ts_col).to_pylist(),
                    int(pc.max(sb.column(ts_col)).as_py()),
                    src))
                out = sb.filter(pa.array(keep)).drop_columns(["_src"])
                if len(out):
                    yield out
        st = ray.get(state.stats.remote())
        if st["late_dropped"]:
            import logging
            logging.getLogger("ray").warning(
                "dedup_stream: dropped %d late rows (behind the %d-tick "
                "horizon — uncheckable against evicted state)",
                st["late_dropped"], horizon)
    finally:
        ray.kill(state, no_restart=True)


def topk_stream(ds: "ray.data.Dataset", window: int, ts_col: str,
                key_col: str, k: int, value_col: str | None = None,
                lateness: int = 0, n_sources: int = 1
                ) -> Iterator[pa.Table]:
    """Per-window top-k keys over the unbounded stream (trending-keys
    view): as each tumbling window closes, emit its k heaviest keys by
    event count (ties broken by key ascending), exactly once, while
    the stream still produces.

    Pure composition over :func:`tumbling_stream`: a window's (key,
    count) rows all close in the SAME update (window closure is a
    property of the window alone), so the top-k selection is a local
    transformation of each closed batch — no extra distributed state
    beyond the open-window partials already bounded there.  Yields
    ``(window_start, key, n_events, rank)``.
    """
    for tbl in tumbling_stream(ds, window, ts_col, key_col,
                               value_col=value_col, lateness=lateness,
                               n_sources=n_sources):
        df = tbl.to_pandas()
        out = []
        for w, g in df.groupby("window_start"):
            top = (g.sort_values(["n_events", key_col],
                                 ascending=[False, True],
                                 kind="mergesort").head(k).copy())
            top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
            out.append(top)
        res = pd.concat(out, ignore_index=True)
        yield pa.Table.from_pandas(
            res[["window_start", key_col, "n_events", "rank"]].astype(
                {"window_start": np.int64, "n_events": np.int64,
                 "rank": np.int64}), preserve_index=False)


@ray.remote
class _HllWindowState:
    """Open-window HLL register store: per (window, reg_idx) keep the
    MAX rho — registers are idempotent maxes, so replayed partials and
    arbitrary merge order cannot change a window's final registers.
    State is bounded by open windows × 2^p."""

    def __init__(self, window: int, lateness: int, n_sources: int):
        self.window = int(window)
        self.lateness = int(lateness)
        self.n_sources = int(n_sources)
        self.open: dict[int, dict[int, int]] = {}  # w -> {reg_idx: reg}
        self.src_max: dict[str, int] = {}
        self.late_dropped = 0

    def _watermark(self) -> int:
        if len(self.src_max) < self.n_sources:
            return -(1 << 62)
        return min(self.src_max.values())

    def _closed(self, w: int) -> bool:
        return w + self.window <= self._watermark() - self.lateness

    def _close_ready(self) -> list[tuple]:
        ready = sorted(w for w in self.open if self._closed(w))
        out = []
        for w in ready:
            regs = self.open.pop(w)
            out.extend((w, i, r) for i, r in sorted(regs.items()))
        return out

    def update(self, wins, idxs, rhos, max_t, src) -> list[tuple]:
        for w, i, r in zip(wins, idxs, rhos):
            if self._closed(w):
                self.late_dropped += 1
                continue
            slot = self.open.setdefault(int(w), {})
            i = int(i)
            if r > slot.get(i, 0):
                slot[i] = int(r)
        self.src_max[src] = max(self.src_max.get(src, -(1 << 62)),
                                int(max_t))
        return self._close_ready()

    def flush(self) -> tuple[list[tuple], int]:
        out = [(w, i, r) for w in sorted(self.open)
               for i, r in sorted(self.open[w].items())]
        self.open.clear()
        return out, self.late_dropped


def hll_stream(ds: "ray.data.Dataset", window: int, ts_col: str,
               col: str, p: int = 12, lateness: int = 0,
               n_sources: int = 1) -> Iterator[pa.Table]:
    """Per-window DISTINCT-count sketching over the unbounded stream:
    as each tumbling window closes, emit its HyperLogLog REGISTER
    table (window_start, reg_idx, reg) exactly once — approximate
    counts with exactly-verifiable contents, the sketch family's
    contract (`rookray.ops.sketch`) composed with the streaming
    windows' watermark machinery.  Feed a window's rows to
    ``rookray.ops.sketch.hll_estimate`` for the distinct estimate.

    Per-batch partials collapse to ≤ 2^p register rows per open
    window (idempotent maxes — replay-safe); the actor holds only
    open windows' registers.
    """
    from rookray.util import hash_strings

    bits = 64 - p
    mask = np.uint64((1 << bits) - 1)

    def partial(batch: pa.Table) -> pa.Table:
        src = ray.get_runtime_context().get_task_id() or "driver"
        t = batch.column(ts_col).to_numpy(zero_copy_only=False) \
                 .astype(np.int64)
        v = batch.column(col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        if not pa.types.is_string(v.type):
            v = pc.cast(v, pa.string())
        h = hash_strings(v)
        idx = (h >> np.uint64(bits)).astype(np.int64)
        w64 = h & mask
        _, e = np.frexp(w64.astype(np.float64))
        rho = np.where(w64 == 0, bits + 1, bits - (e - 1)).astype(np.int64)
        df = pd.DataFrame({"w": (t // window) * window, "i": idx,
                           "rho": rho, "t": t})
        g = (df.groupby(["w", "i"], sort=False)
             .agg(rho=("rho", "max"), max_t=("t", "max")).reset_index()
             .sort_values("max_t"))
        g["src"] = src
        return pa.Table.from_pandas(g.astype(
            {"w": np.int64, "i": np.int64, "rho": np.int64,
             "max_t": np.int64}), preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    state = _HllWindowState.remote(window, lateness, n_sources)

    def table(rows):
        df = pd.DataFrame(rows, columns=["window_start", "reg_idx", "reg"])
        return pa.Table.from_pandas(df.astype(np.int64),
                                    preserve_index=False)

    try:
        for b in partials.iter_batches(batch_format="pyarrow",
                                       batch_size=None):
            for src in pc.unique(b.column("src")).to_pylist():
                sb = b.filter(pc.equal(b.column("src"), src))
                closed = ray.get(state.update.remote(
                    sb.column("w").to_pylist(),
                    sb.column("i").to_pylist(),
                    sb.column("rho").to_pylist(),
                    int(pc.max(sb.column("max_t")).as_py()), src))
                if closed:
                    yield table(closed)
        rest, late = ray.get(state.flush.remote())
        if late:
            import logging
            logging.getLogger("ray").warning(
                "hll_stream: dropped %d late partials", late)
        if rest:
            yield table(rest)
    finally:
        ray.kill(state, no_restart=True)
