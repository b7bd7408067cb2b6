"""Stateless change-event normalization — Arrow in, Arrow out.

The columnar restatement of rook's event routing and filtering:

* op routing by vectorized masks instead of a per-event ``switch`` on
  ``EventType`` (MySQLReplicationStream.java:210-253);
* ignore-list filtering on table / server id
  (MySQLReplicationStream.java:90-96, 196-202 — ``filterOutTxEvent``);
* before-image keying for updates/deletes, after-image for inserts
  (AbstractCacheSynchronizer.java:63-79 — ``resolveAffectedRows``);
* PK-changing updates split into delete(before) + insert(after)
  sharing the gtid, ordered by a ``split`` sub-sequence (rook cannot
  express this — its serial sinks key on the before image only; the
  split preserves LWW commutativity when the key itself changes);
* additive schema conformance: shards written before an evolution
  boundary lack the new payload columns — batches are conformed to the
  unified payload schema with nulls (rook: "todo: do something about
  schema changes", MySQLReplicationStream.java:212).

All functions are pure per-batch transforms intended for
``Dataset.map_batches(..., batch_format="pyarrow", zero_copy_batch=True)``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rookray.schema import (
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE,
    SEQ_SCHEMA,
    unify_additive,
)


@dataclass(frozen=True)
class NormalizeConfig:
    table: str = "sequences"
    ignored_tables: frozenset = frozenset()
    ignored_server_ids: frozenset = frozenset()
    payload: pa.Schema = SEQ_SCHEMA  # unified (evolved) payload schema


def payload_schema_of(events_schema: pa.Schema) -> pa.Schema:
    """Payload schema embedded in a change-event schema's ``after`` struct."""
    t = events_schema.field("after").type
    return pa.schema([pa.field(f.name, f.type) for f in t])


def unified_payload(schemas: list[pa.Schema]) -> pa.Schema:
    return unify_additive([payload_schema_of(s) for s in schemas])


def _conform_struct(col: pa.ChunkedArray | pa.StructArray, payload: pa.Schema) -> pa.StructArray:
    """Conform a before/after struct column to the unified payload schema,
    adding null children for absent (pre-evolution) columns."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    present = {f.name for f in col.type}
    n = len(col)
    children, names = [], []
    for f in payload:
        names.append(f.name)
        if f.name in present:
            child = col.field(f.name)
            if child.type != f.type:
                child = child.cast(f.type)
            children.append(child)
        else:
            children.append(pa.nulls(n, f.type))
    return pa.StructArray.from_arrays(children, names=names, mask=col.is_null())


def rename_struct(col: pa.ChunkedArray | pa.StructArray,
                  renames: dict) -> pa.StructArray:
    """Zero-copy rename of struct child fields (buffers untouched)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    names = [renames.get(f.name, f.name) for f in col.type]
    children = [col.field(i) for i in range(col.type.num_fields)]
    return pa.StructArray.from_arrays(children, names=names,
                                      mask=col.is_null())


def rename_event_schema(s: pa.Schema, renames: dict) -> pa.Schema:
    """Change-event schema with before/after payload fields renamed."""
    out = []
    for f in s:
        if f.name in ("before", "after") and pa.types.is_struct(f.type):
            t = pa.struct([pa.field(renames.get(c.name, c.name), c.type)
                           for c in f.type])
            out.append(pa.field(f.name, t))
        else:
            out.append(f)
    return pa.schema(out)


class RenameEvents:
    """map_batches stage: apply a source→canonical column-rename map to
    the before/after payload structs (the Delta column-mapping analog —
    shards written before an upstream rename keep unifying with shards
    written after it).  Zero-copy: only field NAMES change."""

    def __init__(self, renames: dict):
        self.renames = dict(renames)

    def __call__(self, batch: pa.Table) -> pa.Table:
        for col in ("before", "after"):
            if col in batch.column_names:
                batch = batch.set_column(
                    batch.column_names.index(col), col,
                    rename_struct(batch.column(col), self.renames))
        return batch


def event_mask(batch: pa.Table, cfg: NormalizeConfig) -> "pa.BooleanArray":
    """Ignore-list + target-table predicate mask (vectorized S8/S9)."""
    mask = pc.equal(batch.column("table"), pa.scalar(cfg.table))
    if cfg.ignored_tables:
        mask = pc.and_(
            mask,
            pc.invert(pc.is_in(batch.column("table"), value_set=pa.array(sorted(cfg.ignored_tables)))),
        )
    if cfg.ignored_server_ids:
        mask = pc.and_(
            mask,
            pc.invert(pc.is_in(batch.column("server_id"), value_set=pa.array(sorted(cfg.ignored_server_ids), type=pa.int64()))),
        )
    return mask


def filter_events(batch: pa.Table, cfg: NormalizeConfig) -> pa.Table:
    """Ignore-list + target-table predicate (vectorized S8/S9)."""
    return batch.filter(event_mask(batch, cfg))


def flatten(batch: pa.Table, cfg: NormalizeConfig,
            sel: np.ndarray | None = None) -> pa.Table:
    """Change events → flat keyed events.

    Output columns: ``gtid, split, tx_id, op, doc_id, <payload cols>``.
    The key (``doc_id``) comes from the before image for U/D and the
    after image for I; PK-changing updates are split into two rows.
    Payload columns come from the after image (null for deletes).

    ``sel``: optional int64 row indices to emit (the fused form of
    filter-then-flatten — one payload gather instead of a filter copy
    followed by a take).  When every row of ``batch`` is a normal
    event, no payload gather happens at all (zero-copy passthrough of
    the after-struct children).
    """
    after = _conform_struct(batch.column("after"), cfg.payload)
    op = batch.column("op").combine_chunks()
    gtid = batch.column("gtid").combine_chunks()
    # tx_id is bookkeeping the merge path prunes away; carry it through
    # only when present (targets / tests read it)
    tx_id = (batch.column("tx_id").combine_chunks()
             if "tx_id" in batch.column_names else None)

    a_key = after.field("doc_id")
    merged_key = None
    if "key" in batch.column_names:
        # producer materialized the merge key top-level: the `before`
        # struct need not be decoded at all (pruned at the read), and
        # key selection needs no per-row if_else — `key` already IS
        # before-image-for-U/D, after-image-for-I
        b_key = merged_key = batch.column("key").combine_chunks()
    else:
        before = _conform_struct(batch.column("before"), cfg.payload)
        b_key = before.field("doc_id")

    n_all = len(batch)
    op_full = op.to_numpy(zero_copy_only=False)
    if sel is None:
        base_idx = np.arange(n_all, dtype=np.int64)
        op_np = op_full
    else:
        base_idx = np.asarray(sel, dtype=np.int64)
        op_np = op_full[base_idx]
    is_u = op_np == OP_UPDATE
    # PK-changing update: before.doc_id != after.doc_id (both non-null)
    pk_change = np.zeros(len(base_idx), dtype=bool)
    if is_u.any():
        neq = (pc.fill_null(pc.not_equal(b_key, a_key), False)
               .to_numpy(zero_copy_only=False).astype(bool))
        pk_change = is_u & (neq if sel is None else neq[base_idx])

    def _emit(idx: np.ndarray, key_arr, ops: np.ndarray, split: np.ndarray) -> dict:
        # identity gather (every batch row, in order) — skip the copy;
        # idx is strictly increasing by construction, so length alone
        # decides identity
        identity = len(idx) == n_all
        if identity:
            g, keyed, taken_after = gtid, key_arr, after
        else:
            take = pa.array(idx)
            g = gtid.take(take)
            keyed = key_arr.take(take)
            taken_after = after.take(take)
        out = {
            "gtid": g,
            "split": pa.array(split, type=pa.int8()),
            "op": pa.array(ops, type=pa.int8()),
            "doc_id": keyed,
        }
        if tx_id is not None:
            out["tx_id"] = tx_id if identity else tx_id.take(pa.array(idx))
        del_mask = ops == OP_DELETE
        for f in cfg.payload:
            if f.name == "doc_id":
                continue
            child = taken_after.field(f.name)
            if del_mask.any():
                child = pc.if_else(pa.array(~del_mask), child, pa.nulls(len(idx), f.type))
            out[f.name] = child
        return out

    normal = ~pk_change
    parts = []
    # normal events: one row each, split=1
    idx0 = base_idx[normal]
    if merged_key is not None:
        key0 = merged_key
    else:
        use_before = np.isin(op_full, (OP_UPDATE, OP_DELETE))
        key0 = pc.if_else(pa.array(use_before), b_key, a_key)
    parts.append(
        _emit(idx0, key0, op_np[normal], np.ones(len(idx0), dtype=np.int8))
    )
    if pk_change.any():
        idx1 = base_idx[pk_change]
        # delete of the OLD key (split=0) ...
        parts.append(
            _emit(idx1, b_key, np.full(len(idx1), OP_DELETE, dtype=np.int8), np.zeros(len(idx1), dtype=np.int8))
        )
        # ... then insert of the NEW key (split=1)
        parts.append(
            _emit(idx1, a_key, np.full(len(idx1), OP_INSERT, dtype=np.int8), np.ones(len(idx1), dtype=np.int8))
        )
    tables = [pa.table(p) for p in parts if len(next(iter(p.values())))]
    if not tables:
        return pa.table(parts[0])
    out = pa.concat_tables(tables, promote_options="none")
    return out


def normalize_batch(batch: pa.Table, cfg: NormalizeConfig) -> pa.Table:
    # fused filter+flatten: the predicate becomes a row-index selection
    # inside flatten's single gather instead of a standalone filter copy
    # of the whole batch (token payloads are the bulk of the bytes)
    mask = pc.fill_null(event_mask(batch, cfg), False)
    mask_np = mask.to_numpy(zero_copy_only=False).astype(bool)
    if mask_np.all():
        return flatten(batch, cfg)
    return flatten(batch, cfg, sel=np.flatnonzero(mask_np))


class Normalizer:
    """map_batches callable — filter + flatten with a fixed config.

    Stateless, but shipped as a class so the config is serialized once
    per worker rather than per batch closure."""

    def __init__(self, cfg: NormalizeConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        return normalize_batch(batch, self.cfg)
