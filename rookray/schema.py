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

Schema evolution is additive + lossless-widening: rook punts on schema
changes ("todo: do something about schema changes",
MySQLReplicationStream.java:212); per the north rule we accept appended
nullable columns and lossless numeric type widening (int8→…→int64,
float32→float64, int→float where the mantissa holds every value,
element-wise through list/struct), and reject everything else
(narrowing, int64→float64, type-class changes, drops).
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


#: ddl kinds whose most common real-world cause is a column RENAME,
#: which IS replayable through the read-boundary mapping
_RENAMEABLE = frozenset({"unknown-column", "payload-narrower"})


class NonAdditiveDDLError(SchemaEvolutionError):
    """A wire feed surfaced a schema change the engine's additive
    contract cannot replay (column drop, type change, or a column the
    payload schema doesn't know).  Structured so callers can route on
    it: ``source`` (wire format), ``db``/``table``, ``kind`` (one of
    ``column-drop``, ``type-change``, ``unknown-column``,
    ``payload-narrower``), ``detail``.

    The message carries the one escape hatch that IS replayable: if
    the change is really a column RENAME, map it at the read boundary
    with ``CDCConfig(column_renames=((\"old\", \"new\"), ...))`` and
    re-run; drops and type changes need a fresh snapshot bootstrap."""

    def __init__(self, source: str, db: str, table: str, kind: str,
                 detail: str):
        self.source, self.db, self.table = source, db, table
        self.kind, self.detail = kind, detail
        # a DDL error raised inside a Ray read task must survive the
        # worker→driver pickle hop; the default BaseException reduce
        # re-calls __init__ with .args (the formatted message) and
        # breaks on custom signatures — subclasses with narrower
        # signatures overwrite this after calling up
        self._ctor_args: tuple = (source, db, table, kind, detail)
        hint = (" — if this is a column rename, replay it with "
                "CDCConfig(column_renames=((old, new), ...)); "
                if kind in _RENAMEABLE else " — ")
        super().__init__(
            f"non-additive DDL on {db}.{table} ({source}, {kind}): "
            f"{detail}{hint}column drops and type changes are not "
            "replayable against committed state (bootstrap a fresh "
            "snapshot instead)")

    def __reduce__(self):
        return (self.__class__, self._ctor_args)


def is_additive(old: pa.Schema, new: pa.Schema) -> bool:
    """True iff ``new`` extends ``old`` by appended nullable columns only."""
    old_by_name = {f.name: f for f in old}
    for f in new:
        g = old_by_name.pop(f.name, None)
        if g is not None and g.type != f.type:
            return False
    return not old_by_name  # every old column must still exist


#: float mantissa bits — an integer type widens into a float iff every
#: representable integer fits the mantissa exactly (lossless).
_FLOAT_MANTISSA = {16: 11, 32: 24, 64: 53}


def widen_type(a: pa.DataType, b: pa.DataType) -> pa.DataType | None:
    """Smallest lossless common supertype of ``a`` and ``b``, or None.

    The lattice (mirrors Delta Lake / Iceberg type-widening rules):
    signed ints widen up (int8→int16→int32→int64), unsigned likewise;
    mixed sign widens to the next signed int that holds both (int64 vs
    uint64 has none); floats widen up (float16→float32→float64); an
    int widens into the smallest float whose mantissa holds every value
    (so int64↔float64 is rejected as lossy).  Recurses through list
    and struct (struct unions fields additively, widening per field).
    """
    if a.equals(b):
        return a
    if pa.types.is_list(a) and pa.types.is_list(b):
        w = widen_type(a.value_type, b.value_type)
        return pa.list_(w) if w is not None else None
    if pa.types.is_struct(a) and pa.types.is_struct(b):
        try:
            u = unify_additive([pa.schema(list(a)), pa.schema(list(b))])
        except SchemaEvolutionError:
            return None
        return pa.struct(list(u))

    def _num(t: pa.DataType) -> tuple[str, int] | None:
        if pa.types.is_signed_integer(t):
            return "i", t.bit_width
        if pa.types.is_unsigned_integer(t):
            return "u", t.bit_width
        if pa.types.is_floating(t):
            return "f", t.bit_width
        return None

    ka, kb = _num(a), _num(b)
    if ka is None or kb is None:
        return None
    # value bits an integer type needs (sign bit excluded)
    def _value_bits(k: tuple[str, int]) -> int:
        return k[1] - 1 if k[0] == "i" else k[1]

    kinds = {ka[0], kb[0]}
    if kinds == {"i"} or kinds == {"u"}:
        cls, bits = ka[0], max(ka[1], kb[1])
    elif kinds == {"i", "u"}:
        # next signed width holding both: > unsigned bits and >= signed bits
        need = max(_value_bits(ka), _value_bits(kb))
        bits = next((w for w in (16, 32, 64) if w - 1 >= need), None)
        if bits is None:
            return None  # uint64 has no lossless signed home
        cls = "i"
    elif kinds == {"f"}:
        cls, bits = "f", max(ka[1], kb[1])
    else:  # one int-ish, one float
        fk = ka if ka[0] == "f" else kb
        ik = kb if ka[0] == "f" else ka
        need = _value_bits(ik)
        bits = next((w for w in (16, 32, 64)
                     if w >= fk[1] and _FLOAT_MANTISSA[w] >= need), None)
        if bits is None:
            return None  # e.g. int64/uint64 into any float is lossy
        cls = "f"
    ctor = {"i": "int", "u": "uint", "f": "float"}[cls]
    return getattr(pa, f"{ctor}{bits}")()


def unify_additive(schemas: list[pa.Schema]) -> pa.Schema:
    """Union of schemas under the additive + lossless-widening policy.

    Column order: first-seen order. A later schema missing a column is
    FINE (absent columns fill with nulls); a type conflict widens via
    :func:`widen_type` when lossless and raises
    ``SchemaEvolutionError`` otherwise.
    """
    seen: dict[str, pa.Field] = {}
    for s in schemas:
        for f in s:
            g = seen.get(f.name)
            if g is None:
                seen[f.name] = f
            elif g.type != f.type:
                w = widen_type(g.type, f.type)
                if w is None:
                    raise SchemaEvolutionError(
                        f"non-additive schema change on column {f.name!r}: "
                        f"{g.type} -> {f.type}"
                    )
                seen[f.name] = pa.field(f.name, w)
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
