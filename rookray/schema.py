"""Arrow schemas for the sequence table and the change-event stream.

The payload table shape is mandated by BASELINE.json ``input_hint``:
``(doc_id: string, tokens: list<int32>, n_tok: int32, source: string)``.

The change-event table is the columnar restatement of rook's event model
(rook-api/.../event/RowsMutationReplicationEvent.java:24-52 — serverId,
schema, table, rows; Insert=after-images, Update=before→after pairs,
Delete=before-images; TXReplicationEvent.java:23-33 — tx grouping).
One row here = one single-row mutation; multi-row statements become
multiple rows sharing ``tx_id`` (rook groups them inside one event:
MySQLReplicationStream.java:255-274).

Schema evolution is additive-only: rook punts on schema changes
("todo: do something about schema changes",
MySQLReplicationStream.java:212); per the north rule we accept appended
nullable columns and reject type changes / drops.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------- payload

SEQ_FIELDS: list[tuple[str, pa.DataType]] = [
    ("doc_id", pa.string()),
    ("tokens", pa.list_(pa.int32())),
    ("n_tok", pa.int32()),
    ("source", pa.string()),
]

SEQ_SCHEMA = pa.schema(SEQ_FIELDS)

#: schema-evolution variant: later shards add a nullable ``lang`` column.
SEQ_SCHEMA_V2 = pa.schema(SEQ_FIELDS + [("lang", pa.string())])

# ----------------------------------------------------------- change events

OP_INSERT = 0
OP_UPDATE = 1
OP_DELETE = 2

OP_NAMES = {OP_INSERT: "insert", OP_UPDATE: "update", OP_DELETE: "delete"}


def payload_struct(payload: pa.Schema = SEQ_SCHEMA) -> pa.DataType:
    return pa.struct(list(payload))


def change_event_schema(payload: pa.Schema = SEQ_SCHEMA) -> pa.Schema:
    """Columnar change-event schema.

    ``before``/``after`` are nullable structs of the payload schema:
    insert → after only, delete → before only, update → both
    (rook-api/.../event/{Insert,Update,Delete}RowsReplicationEvent.java).
    ``gtid`` is a global, unique, monotone sequence number; ``tx_id`` /
    ``seq_in_tx`` / ``tx_events`` restate TXReplicationEvent grouping in
    a form that lets any subset of shards decide transaction
    completeness locally (a tx is complete in an epoch iff the epoch
    holds ``tx_events`` rows with that ``tx_id``).
    """
    ps = payload_struct(payload)
    return pa.schema(
        [
            ("gtid", pa.int64()),
            ("tx_id", pa.int64()),
            ("seq_in_tx", pa.int32()),
            ("tx_events", pa.int32()),
            ("server_id", pa.int64()),
            ("db", pa.string()),
            ("table", pa.string()),
            ("op", pa.int8()),
            # the mutation's merge key (= before-image doc_id for U/D,
            # after-image doc_id for I), materialized top-level so the
            # merge path can prune the whole `before` struct at the
            # parquet read — a ~2x decode saving on update-heavy streams
            ("key", pa.string()),
            ("before", ps),
            ("after", ps),
        ]
    )


# Flat (normalized) keyed-event schema produced by events.normalize():
# structs flattened, key extracted, split-ordering column added.
def flat_event_fields(payload: pa.Schema = SEQ_SCHEMA) -> list[tuple[str, pa.DataType]]:
    return [
        ("gtid", pa.int64()),
        ("split", pa.int8()),  # PK-change split sub-order: D=0, I=1 share a gtid
        ("tx_id", pa.int64()),
        ("op", pa.int8()),
        ("doc_id", pa.string()),  # the merge key (before-image key for U/D)
    ] + [(n, t) for n, t in zip(payload.names, payload.types) if n != "doc_id"]


# ----------------------------------------------------- schema evolution

class SchemaEvolutionError(ValueError):
    pass


def is_additive(old: pa.Schema, new: pa.Schema) -> bool:
    """True iff ``new`` extends ``old`` by appended nullable columns only."""
    old_by_name = {f.name: f for f in old}
    for f in new:
        g = old_by_name.pop(f.name, None)
        if g is not None and g.type != f.type:
            return False
    return not old_by_name  # every old column must still exist


def unify_additive(schemas: list[pa.Schema]) -> pa.Schema:
    """Union of schemas under the additive-only policy.

    Column order: first-seen order. Raises ``SchemaEvolutionError`` on a
    type change or a dropped column relative to the running union
    (dropping is detected as: a later schema missing a column is FINE —
    absent columns are filled with nulls — only type conflicts raise).
    """
    seen: dict[str, pa.Field] = {}
    for s in schemas:
        for f in s:
            g = seen.get(f.name)
            if g is None:
                seen[f.name] = f
            elif g.type != f.type:
                raise SchemaEvolutionError(
                    f"non-additive schema change on column {f.name!r}: "
                    f"{g.type} -> {f.type}"
                )
    return pa.schema(list(seen.values()))


def conform(tbl: pa.Table, target: pa.Schema) -> pa.Table:
    """Project ``tbl`` to ``target``, filling missing columns with nulls."""
    n = len(tbl)
    cols = []
    for f in target:
        if f.name in tbl.column_names:
            col = tbl.column(f.name)
            if col.type != f.type:
                col = col.cast(f.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, f.type))
    return pa.Table.from_arrays(cols, schema=target)
