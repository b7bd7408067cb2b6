"""Last-writer-wins merge kernels — the parallel restatement of rook's
serial keyed upsert/delete sink.

Rook applies mutations one at a time in binlog total order:
present → index (upsert), absent → purge (delete)
(DefaultRowsMutationIndexer.java:64-88, 125-150), with exact intra-tx
dedup (IndexingLog, DefaultRowsMutationIndexer.java:151-166).

The LWW restatement (SURVEY.md §7.0): per key, the event with the
largest ``(gtid, split)`` wins; argmax is commutative + associative, so
any replay order and any partial pre-aggregation yields the same final
state — provided all events for a key meet in one reducer.  That is
what makes the engine parallel while staying byte-identical to serial
replay.  Deletes are tombstones carrying their gtid: an old tombstone
loses to a newer upsert and vice versa.

All kernels are Arrow/numpy-vectorized; no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rookray.schema import OP_DELETE, OP_INSERT, unify_additive, conform

#: metadata columns a partition-state table carries alongside the payload
STATE_META = [("_gtid", pa.int64()), ("_split", pa.int8())]


def _last_per_key(tbl: pa.Table, key: str = "doc_id") -> pa.Table:
    """Keep the row with max (gtid, split) per key — vectorized argmax.

    Sort-indices over ONLY the narrow sort columns (key, gtid, split),
    find each group's last row via an adjacent-not-equal mask, then
    gather just the winners.  The losers' payload (the wide token
    arrays — the bulk of every batch's bytes) is never materialized in
    sorted order, which is what made the former whole-table ``sort_by``
    2x slower.  Output rows remain sorted by (key, gtid, split), same
    as before.  This is simultaneously the intra-batch combiner (rook's
    IndexingLog dedup analog) and the final merge kernel.
    """
    if len(tbl) <= 1:
        return tbl
    return tbl.take(last_per_key_indices(tbl, key))


def last_per_key_indices(tbl: pa.Table, key: str = "doc_id") -> pa.Array:
    """Winner row indices of ``tbl`` (max (gtid, split) per key), in
    (key, gtid, split) ascending order — the gather-free form of
    ``_last_per_key`` so a caller can compose the winner selection with
    its own downstream reorder into ONE payload gather."""
    narrow = {"k": tbl.column(key), "g": tbl.column("gtid")}
    sort_keys = [("k", "ascending"), ("g", "ascending")]
    if "split" in tbl.column_names:
        narrow["s"] = tbl.column("split")
        sort_keys.append(("s", "ascending"))
    idx = pc.sort_indices(pa.table(narrow), sort_keys=sort_keys)
    k = pc.take(narrow["k"], idx)
    if isinstance(k, pa.ChunkedArray):
        k = k.combine_chunks()
    if len(k) <= 1:
        return idx
    eq_next = pc.equal(k.slice(1), k.slice(0, len(k) - 1))
    eq_np = pc.fill_null(eq_next, False).to_numpy(zero_copy_only=False).astype(bool)
    last = np.concatenate([~eq_np, [True]])
    return idx.filter(pa.array(last))


def keep_last(tbl: pa.Table, key: str = "doc_id") -> pa.Table:
    """Public combiner: collapse a batch of flat events to at most one
    surviving event per key (tombstones retained)."""
    return _last_per_key(tbl, key)


def state_from_events(events: pa.Table, payload_names: list[str]) -> pa.Table:
    """Winning flat events → partition-state rows.

    Drops tombstone winners (op == DELETE) and the op/tx columns,
    keeping payload + ``_gtid``/``_split`` LWW metadata."""
    alive = events.filter(pc.not_equal(events.column("op"), pa.scalar(OP_DELETE, pa.int8())))
    cols = {"doc_id": alive.column("doc_id")}
    for n in payload_names:
        if n != "doc_id":
            cols[n] = alive.column(n)
    cols["_gtid"] = alive.column("gtid")
    cols["_split"] = alive.column("split")
    return pa.table(cols)


def events_from_state(state: pa.Table) -> pa.Table:
    """Partition-state rows → pseudo insert events, so prior state can
    compete in the same LWW argmax as new events."""
    n = len(state)
    cols = {
        "gtid": state.column("_gtid"),
        "split": state.column("_split"),
        "tx_id": pa.nulls(n, pa.int64()),
        "op": pa.array(np.full(n, OP_INSERT, dtype=np.int8)),
        "doc_id": state.column("doc_id"),
    }
    for name in state.column_names:
        if name not in ("doc_id", "_gtid", "_split"):
            cols[name] = state.column(name)
    return pa.table(cols)


def merge_state(prior: pa.Table | None, events: pa.Table) -> pa.Table:
    """LWW-merge new flat events into a prior partition state table.

    Both sides may have additively-different schemas (schema
    evolution); the union schema wins, absent columns fill with null.
    Returns the new state table (payload + _gtid/_split), unsorted.
    """
    if prior is not None and len(prior):
        pseudo = events_from_state(prior)
        target = unify_additive([pseudo.schema, events.schema])
        events = pa.concat_tables(
            [conform(pseudo, target), conform(events, target)],
            promote_options="none",
        )
    winners = _last_per_key(events)
    payload_names = [
        c for c in winners.column_names if c not in ("gtid", "split", "tx_id", "op")
    ]
    return state_from_events(winners, payload_names)
