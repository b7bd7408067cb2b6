"""Serial dict-replay oracle — the semantic twin of rook's pipeline.

Rook's correctness model is: one thread consumes the binlog in total
order and applies each mutation synchronously to keyed state
(MySQLReplicationStream.java:161-179 serial delivery;
DefaultRowsMutationIndexer.java:64-88 keyed upsert/purge;
AbstractCacheSynchronizer.java:63-79 before-image keying).  This module
replays a change-event table the same way: a single Python loop over
events in (gtid, split) order mutating a dict.  It is the ground truth
the parallel Ray pipeline must match byte-for-byte.

Only for tests at small scale — intentionally simple, never used in the
engine's hot path.
"""

from __future__ import annotations

from typing import Iterable

import pyarrow as pa

from rookray.schema import OP_INSERT, OP_UPDATE, OP_DELETE, SEQ_SCHEMA


def replay(
    events: pa.Table,
    ignored_tables: Iterable[str] = (),
    ignored_server_ids: Iterable[int] = (),
    table: str | None = None,
) -> pa.Table:
    """Serial replay of a change-event table → final state table.

    Semantics mirror rook exactly:
    * events applied in total (gtid) order, one at a time;
    * ignore-list filtering on table name / server id
      (MySQLReplicationStream.java:90-96, 196-202);
    * key extracted from the BEFORE image for updates/deletes
      (AbstractCacheSynchronizer.java:63-79) and the after image for
      inserts;
    * update with a changed key behaves as delete(before)+insert(after);
    * insert/update → upsert, delete → remove
      (DefaultRowsMutationIndexer.java:125-150: present → index, absent
      → purge);
    * delete of an absent key is a no-op;
    * replaying the same gtid twice is idempotent (second application
      overwrites with identical content).
    """
    ignored_tables = set(ignored_tables)
    ignored_server_ids = set(ignored_server_ids)
    state: dict[str, dict] = {}
    cols = events.column_names
    order = pa.compute.sort_indices(events, sort_keys=[("gtid", "ascending")])
    events = events.take(order)
    for row in events.to_pylist():
        if row["table"] in ignored_tables or row["server_id"] in ignored_server_ids:
            continue
        if table is not None and row["table"] != table:
            continue
        op, before, after = row["op"], row["before"], row["after"]
        if op == OP_INSERT:
            state[after["doc_id"]] = after
        elif op == OP_DELETE:
            state.pop(before["doc_id"], None)
        elif op == OP_UPDATE:
            if before["doc_id"] != after["doc_id"]:
                state.pop(before["doc_id"], None)
            state[after["doc_id"]] = after
        else:
            raise ValueError(f"unknown op {op}")
    if not state:
        return pa.table({f.name: pa.array([], f.type) for f in SEQ_SCHEMA})
    rows = [state[k] for k in sorted(state)]
    names = list(rows[0].keys())
    return pa.table({n: [r.get(n) for r in rows] for n in names})
