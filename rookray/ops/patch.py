"""Column-level CDC: patch (partial-update) events, field-wise LWW.

Real CDC feeds often ship PARTIAL updates — only the columns a
statement touched (MySQL ``binlog_row_image=MINIMAL``, Postgres
``REPLICA IDENTITY`` defaults, Debezium's column filters).  rook never
sees these (its connector requests full row images), and the engine's
row-level LWW ("whole row of max gtid wins") is simply WRONG for them:
two patches touching different columns must BOTH survive, whichever
replays first.

The fix is the field-wise restatement of the order-relaxation theorem
(SURVEY.md §7.0): each field's final value is the value carried by the
max-gtid event that PRESENTS that field — an argmax per field, still
commutative/associative, so parallel replay in any order converges,
provided (a) all events of a key meet in one reducer (hash partition
by key — the same exchange the row-level engine uses) and (b) row
existence is decided by the op stream (last op ≠ delete), with inserts
presenting every field (a rebirth resets the row).

``derive_patches`` builds a column-level stream from a full-image
stream (keep exactly the changed fields of each update — what a
MINIMAL row image would have shipped), which makes the semantics
exactly testable: folding the derived patches MUST reproduce the
full-image replay byte-for-byte, so the flagship's DuckDB LWW oracle
verifies the field-wise merge for free.

Scale shape: one stateless derive ``map_batches`` (vectorized
change-masks per field), one hash exchange on the key, and one
vectorized per-partition fold (per field: filter to presenting events,
take last by gtid — no per-key Python).  Presence is a bitmask column,
not nulls: "field absent from the patch" and "field set to NULL" stay
distinguishable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from rookray.schema import OP_DELETE, OP_INSERT, OP_UPDATE

__all__ = ["derive_patches", "fold_patches"]

OP_PATCH = 3  # partial after-image; `patch_mask` says which fields


def _field_equal(a: pa.Array, b: pa.Array) -> np.ndarray:
    """Vectorized per-row equality that treats nulls as equal and
    compares list columns element-wise (segmented numpy compare over
    the flat value buffers — no per-row Python)."""
    if pa.types.is_list(a.type):
        la = pc.fill_null(pc.list_value_length(a), -1) \
               .to_numpy(zero_copy_only=False).astype(np.int64)
        lb = pc.fill_null(pc.list_value_length(b), -1) \
               .to_numpy(zero_copy_only=False).astype(np.int64)
        eq = la == lb  # null-vs-null → -1 == -1 → equal
        n = len(la)
        # element compare only where lengths match and are > 0
        sel = np.flatnonzero(eq & (la > 0))
        if sel.size:
            fa = pc.list_flatten(a).to_numpy(zero_copy_only=False)
            fb = pc.list_flatten(b).to_numpy(zero_copy_only=False)
            sa = np.concatenate([[0], np.cumsum(np.maximum(la, 0))])
            sb = np.concatenate([[0], np.cumsum(np.maximum(lb, 0))])
            lens = la[sel]
            tot = int(lens.sum())
            local = (np.arange(tot, dtype=np.int64)
                     - np.repeat(np.concatenate(
                         [[0], np.cumsum(lens[:-1])]), lens))
            ia = np.repeat(sa[sel], lens) + local
            ib = np.repeat(sb[sel], lens) + local
            neq = (fa[ia] != fb[ib]).astype(np.int64)
            bounds = np.concatenate([[0], np.cumsum(lens[:-1])])
            row_neq = np.add.reduceat(neq, bounds) > 0
            eq[sel[row_neq]] = False
        return eq
    eq = pc.equal(a, b)
    both_null = pc.and_(pc.is_null(a), pc.is_null(b))
    return pc.fill_null(pc.or_(eq, both_null), False) \
             .to_numpy(zero_copy_only=False)


def derive_patches(events: "ray.data.Dataset",
                   payload_fields: list[str],
                   key_col: str = "key") -> "ray.data.Dataset":
    """Full-image change stream → column-level stream: updates keep
    ONLY their changed fields (op becomes ``OP_PATCH`` with a presence
    bitmask; bit i = ``payload_fields[i]`` present); inserts present
    every field; deletes carry no payload.  Updates that changed
    nothing drop entirely (MINIMAL row images ship nothing for them).

    Output schema: (gtid, op, key, patch_mask, <field>... flattened
    payload columns — absent fields are null AND mask-cleared).
    """
    full_mask = (1 << len(payload_fields)) - 1

    def to_patches(batch: pa.Table) -> pa.Table:
        n = len(batch)
        op = batch.column("op").to_numpy(zero_copy_only=False)
        after = batch.column("after").combine_chunks()
        before = batch.column("before").combine_chunks()
        mask = np.where(op == OP_INSERT, full_mask, 0).astype(np.int64)
        upd = op == OP_UPDATE
        cols: dict[str, pa.Array] = {}
        for i, f in enumerate(payload_fields):
            av, bv = after.field(f), before.field(f)
            changed = upd & ~_field_equal(av, bv)
            mask |= np.where(changed, 1 << i, 0).astype(np.int64)
            keep = (op == OP_INSERT) | changed
            cols[f] = pc.if_else(pa.array(keep), av,
                                 pa.nulls(n, av.type))
        out_op = np.where(op == OP_UPDATE, OP_PATCH, op).astype(np.int8)
        t = pa.table({
            "gtid": batch.column("gtid"),
            "op": pa.array(out_op),
            key_col: batch.column(key_col),
            "patch_mask": pa.array(mask),
            **cols,
        })
        # empty patches (update touched nothing) ship nothing
        drop = (out_op == OP_PATCH) & (mask == 0)
        return t.filter(pa.array(~drop))

    return events.map_batches(to_patches, batch_format="pyarrow",
                              zero_copy_batch=True)


def fold_patches(patches: "ray.data.Dataset",
                 payload_fields: list[str], key_col: str = "key",
                 num_partitions: int = 16) -> "ray.data.Dataset":
    """Field-wise LWW fold of a column-level stream into final state.

    One hash exchange on the key, then per partition one vectorized
    pass: row existence = op of the max-gtid op-event ≠ delete with
    birth = that event's gtid; per field, the surviving value is the
    max-gtid event that presents the field AT OR AFTER the birth (a
    patch from a previous life of the key must not leak through a
    delete+reinsert).  No per-key Python anywhere.
    """
    def add_part(batch: pa.Table) -> pa.Table:
        from rookray.util import hash_strings
        part = (hash_strings(batch.column(key_col)) %
                np.uint64(num_partitions)).astype(np.int64)
        return batch.append_column("_part", pa.array(part))

    def fold(group: pa.Table) -> pa.Table:
        # fully vectorized: one gtid sort-gather, dictionary-encoded
        # keys, then last-writer selection by ascending scatter into a
        # per-key slot array (rows are gtid-sorted, so later scatters
        # win) and one Arrow take per field — no pandas conversion, no
        # per-key Python, list payloads never leave Arrow
        out_schema = pa.schema(
            [(key_col, pa.string())]
            + [(f, group.schema.field(f).type) for f in payload_fields]
        ) if group.schema.names else pa.schema([(key_col, pa.string())])
        if len(group) == 0:  # map_groups schema probe
            return pa.Table.from_pylist([], schema=out_schema)
        g = group.take(pc.sort_indices(
            group, sort_keys=[("gtid", "ascending")]))
        gtid = g.column("gtid").to_numpy(zero_copy_only=False)
        op = g.column("op").to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(g.column(key_col).combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nk = len(enc.dictionary)

        # existence + birth: the last insert/delete decides life; a
        # patch never creates a row
        life_rows = np.nonzero((op == OP_INSERT) | (op == OP_DELETE))[0]
        last_life = np.full(nk, -1, dtype=np.int64)
        last_life[codes[life_rows]] = life_rows
        alive = (last_life >= 0) & (op[np.maximum(last_life, 0)]
                                    == OP_INSERT)
        if not alive.any():
            return pa.Table.from_pylist([], schema=out_schema)
        birth = np.full(nk, np.iinfo(np.int64).max, dtype=np.int64)
        birth[alive] = gtid[last_life[alive]]
        # a patch from a previous life of the key must not leak
        # through a delete+reinsert
        post = gtid >= birth[codes]
        mask = g.column("patch_mask").to_numpy(
            zero_copy_only=False).astype(np.int64)

        # output keys: alive, in lexical order
        dict_order = pc.sort_indices(enc.dictionary).to_numpy(
            zero_copy_only=False).astype(np.int64)
        out_codes = dict_order[alive[dict_order]]
        cols: dict[str, pa.Array] = {
            key_col: pc.take(enc.dictionary,
                             pa.array(out_codes, pa.int64()))}
        for i, f in enumerate(payload_fields):
            pres_rows = np.nonzero(post & ((mask & (1 << i)) != 0))[0]
            win = np.full(nk, -1, dtype=np.int64)
            win[codes[pres_rows]] = pres_rows
            sel = win[out_codes]
            idx = pa.array(np.maximum(sel, 0), pa.int64(), mask=sel < 0)
            cols[f] = pc.take(g.column(f).combine_chunks(), idx)
        return pa.table(cols, schema=out_schema)

    fold.__name__ = "FoldPatches"
    return (patches.map_batches(add_part, batch_format="pyarrow",
                                zero_copy_batch=True)
            .groupby("_part").map_groups(fold, batch_format="pyarrow"))
