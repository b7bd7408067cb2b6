"""Change-stream sources — the ``MySQLReplicationStream`` lifecycle
analog (connect / poll / deliver / disconnect,
rook-source-mysql/.../MySQLReplicationStream.java:98-159).

There is no MySQL in this environment; the "binlog" is a directory of
GTID-ordered Parquet shards (written by ``rookray.gen`` in tests, or by
any upstream producer in production).  ``ShardTailer`` is the tail-mode
source: it polls the directory, batches newly-arrived shards into
epochs, and applies each epoch to one or more targets exactly-once.
Resume needs no extra state: the targets' own manifests carry the
watermarks, and shards overlapping an epoch boundary are re-presented
automatically (the engine skips already-applied gtids).
"""

from __future__ import annotations

import glob
import os
import time
from typing import Callable

import pyarrow.parquet as pq


class ShardTailer:
    """Tail a shard directory and apply new epochs to targets.

    ``targets``: anything with ``.apply(shard_paths)`` (``LakeTable``,
    ``DerivedIndexTarget``, ``Fanout``).  The tailer re-presents the
    last shard of the previous epoch alongside new shards so that
    transactions straddling an epoch boundary complete (the engine's
    watermark makes the overlap free) — the batched analog of rook
    holding a tx open until its XID arrives
    (MySQLReplicationStream.java:234-249).
    """

    def __init__(self, shard_dir: str, target, pattern: str = "events-*.parquet"):
        self.shard_dir = shard_dir
        self.target = target
        self.pattern = pattern
        self._applied: list[str] = []
        self._connected = False

    # lifecycle: ReplicationStream.connect/connect(timeout)/isConnected/
    # disconnect analog (MySQLReplicationStream.java:98-159)
    def connect(self, timeout_s: float | None = None) -> None:
        """Connect; with ``timeout_s``, block until the shard directory
        is visible (the ``connect(timeout)`` variant — rook waits for
        the binlog client handshake, we wait for the stream substrate)."""
        if timeout_s is not None:
            deadline = time.monotonic() + timeout_s
            while not os.path.isdir(self.shard_dir):
                if time.monotonic() >= deadline:
                    raise TimeoutError(
                        f"shard dir {self.shard_dir} not visible after "
                        f"{timeout_s}s")
                time.sleep(min(0.05, timeout_s / 20))
        self._connected = True

    def is_connected(self) -> bool:
        return self._connected

    def disconnect(self) -> None:
        self._connected = False

    def _discover(self) -> list[str]:
        files = sorted(glob.glob(os.path.join(self.shard_dir, self.pattern)))
        return [f for f in files if f not in self._applied]

    def _overlap(self) -> list[str]:
        """Applied shards that must be re-presented so open transactions
        can complete: every applied shard whose max gtid exceeds the
        target's committed closed watermark (a tx can span ANY number of
        shards — re-presenting only the single last one stalled the
        watermark permanently on 3+-shard transactions).

        For targets WITHOUT a committed closed watermark (custom sinks,
        or a ``Fanout`` whose children don't all expose one) the safe
        fallback is to re-present ALL applied shards: applies are
        idempotent (the engine's watermark skips already-applied gtids,
        so the replay is metadata-only), whereas re-presenting only the
        last shard stalls any tx spanning 3+ shards forever — the exact
        round-1 bug this method exists to fix."""
        if not self._applied:
            return []
        floor = self._closed_watermark()
        if floor is not None:
            return shards_above(self._applied, floor)
        return list(self._applied)

    def _closed_watermark(self) -> int | None:
        """The target's committed closed-tx watermark, if it exposes
        one.  Composite targets (``Fanout``) aggregate as the MIN over
        children — a shard is safe to prune only when EVERY child has
        closed past it; any child without a watermark makes the
        aggregate unknown (None → re-present everything)."""
        get_m = getattr(self.target, "manifest", None)
        if not callable(get_m):
            return None
        m = get_m()
        return (m or {}).get("closed_watermark")

    def poll_once(self) -> dict | None:
        """Apply one epoch of newly-arrived shards; None if nothing new."""
        if not self._connected:
            raise RuntimeError("not connected")
        new = self._discover()
        if not new:
            return None
        # re-present applied shards still above the closed watermark
        # (open-tx overlap); watermark skip makes the replay free
        batch = self._overlap() + new
        result = self.target.apply(batch)
        self._applied.extend(new)
        return result

    def run(self, poll_interval_s: float = 1.0,
            until: Callable[[], bool] | None = None,
            max_polls: int | None = None) -> list[dict]:
        """Poll until ``until()`` or ``max_polls``; returns epoch results."""
        results = []
        polls = 0
        while self._connected:
            r = self.poll_once()
            if r is not None:
                results.append(r)
            polls += 1
            if until is not None and until():
                break
            if max_polls is not None and polls >= max_polls:
                break
            time.sleep(poll_interval_s)
        return results


class LiveTailer(ShardTailer):
    """Continuous live tail on a background thread — the I/O-thread
    analog of ``BinaryLogClient.connect()``: rook's ``connect()``
    spawns the binlog thread and all delivery happens on it
    (MySQLReplicationStream.java:98-120).  Here ``connect()`` starts a
    poller thread; ``disconnect()`` stops and joins it;
    ``is_connected()`` reflects the live thread.

    In-flight work is bounded to ONE epoch: the thread applies an
    epoch to its exactly-once commit before polling again —
    backpressure by construction, the batched analog of rook's
    synchronous listener delivery (:161-179).  Epoch results
    accumulate in ``results``; a failed apply lands in ``errors`` and
    stops the tail (the shards remain unconsumed — reconnect resumes
    from the targets' own watermarks)."""

    def __init__(self, shard_dir: str, target,
                 pattern: str = "events-*.parquet",
                 poll_interval_s: float = 0.2):
        super().__init__(shard_dir, target, pattern)
        self.poll_interval_s = poll_interval_s
        self.results: list[dict] = []
        self.errors: list[BaseException] = []
        self._thread = None
        self._stop = None

    def connect(self, timeout_s: float | None = None) -> None:
        import threading
        super().connect(timeout_s)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="rookray-live-tailer")
        self._thread.start()

    def _loop(self) -> None:
        while not self._stop.is_set():
            try:
                r = self.poll_once()
                if r is not None:
                    self.results.append(r)
            except BaseException as e:  # noqa: BLE001 — surface, don't lose
                self.errors.append(e)
                break
            self._stop.wait(self.poll_interval_s)

    def is_connected(self) -> bool:
        return bool(self._connected and self._thread
                    and self._thread.is_alive())

    def disconnect(self, join_timeout_s: float = 30.0) -> None:
        if self._stop is not None:
            self._stop.set()
        if self._thread is not None:
            self._thread.join(join_timeout_s)
        super().disconnect()


def shard_gtid_range(path: str) -> tuple[int, int]:
    """(min, max) gtid of a shard from parquet column statistics only
    (footer read — no data scan)."""
    md = pq.ParquetFile(path).metadata
    idx = md.schema.to_arrow_schema().get_field_index("gtid")
    lo, hi = None, None
    for rg in range(md.num_row_groups):
        col = md.row_group(rg).column(idx)
        st = col.statistics
        if st is None:
            continue
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    if lo is None:
        raise ValueError(f"no gtid statistics in {path}")
    return int(lo), int(hi)


def shards_above(paths: list[str], floor: int) -> list[str]:
    """Prune shards entirely at or below a committed watermark using
    footer statistics — the resume fast path (skip finished partitions
    without reading data)."""
    return [p for p in paths if shard_gtid_range(p)[1] > floor]
