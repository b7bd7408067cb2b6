"""Per-partition lineage records — checkpointed replay provenance.

Rook keeps no resume state at all (binlog position lives inside
``BinaryLogClient``; a reconnect restarts wherever the client/server
negotiate — SURVEY.md §4.1).  Per the north rule our engine checkpoints,
per partition and per committed epoch:

    (partition_id, gtid_watermark, rows, content_hash, events_applied)

The watermark makes replay idempotent (events at or below it are
skipped on re-application), the content hash detects divergence, and
the records ride inside the committed manifest so resume needs only
one small JSON read.
"""

from __future__ import annotations

from dataclasses import dataclass, asdict

import pyarrow as pa

from rookray.util import stable_table_hash


@dataclass
class PartitionLineage:
    partition: int
    file: str  # committed state parquet path (relative to table root)
    gtid_watermark: int  # max applied (gtid) for this partition
    rows: int
    content_hash: str
    events_applied: int  # events applied in the epoch that wrote this
    kind: str = "base"  # "base" (full state rewrite) | "delta" (merge-on-read)

    def to_dict(self) -> dict:
        return asdict(self)

    @staticmethod
    def from_dict(d: dict) -> "PartitionLineage":
        return PartitionLineage(**d)


def lineage_for(partition: int, file: str, state: pa.Table,
                prev_watermark: int, events_applied: int,
                max_applied_gtid: int = -1, kind: str = "base") -> PartitionLineage:
    # watermark = max PROCESSED gtid, not max surviving-state gtid —
    # a tombstone winner leaves no state row but its gtid is applied
    wm = max(prev_watermark, max_applied_gtid)
    if len(state) and "_gtid" in state.column_names:
        wm = max(wm, int(pa.compute.max(state.column("_gtid")).as_py()))
    return PartitionLineage(
        partition=partition,
        file=file,
        gtid_watermark=wm,
        rows=len(state),
        content_hash=stable_table_hash(state),
        events_applied=events_applied,
        kind=kind,
    )
