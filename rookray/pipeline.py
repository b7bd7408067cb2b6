"""End-to-end CDC pipeline composition (filled in build step 3)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class CDCConfig:
    """Engine configuration — the analog of rook's stream knobs
    (setIgnoredTables / setIgnoredHostsIds / setGroupEventsByTX,
    MySQLReplicationStream.java:82-96)."""

    table: str = "sequences"
    ignored_tables: frozenset[str] = frozenset()
    ignored_server_ids: frozenset[int] = frozenset()
    num_partitions: int = 32
    salt: int = 0  # >0 → hot-key salting with this many sub-buckets
    tx_atomic: bool = True  # hold back incomplete transactions


class LakeTable:  # placeholder — implemented in pipeline step
    pass
