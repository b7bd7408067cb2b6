"""DynamoDB Streams adapter — wire format #8, the second non-SQL
family.

rook tails a MySQL binlog in-process (rook-source-mysql/...
/MySQLReplicationStream.java:71-120); the key-value-store analog of
that stream is a DynamoDB **stream record** (the public shape returned
by ``GetRecords`` and delivered to Lambda triggers, one JSON document
per item mutation)::

    {"eventID": "<opaque hex>",
     "eventName": "INSERT"|"MODIFY"|"REMOVE",
     "eventVersion": "1.1", "eventSource": "aws:dynamodb",
     "awsRegion": "us-east-1",
     "eventSourceARN": "arn:aws:dynamodb:<region>:<acct>:table/<table>/stream/<label>",
     "dynamodb": {
        "ApproximateCreationDateTime": <epoch s>,
        "Keys":     {"doc_id": {"S": "..."}},
        "NewImage": {attr: {<type>: <value>}, ...},   # view-type dependent
        "OldImage": {attr: {<type>: <value>}, ...},   # view-type dependent
        "SequenceNumber": "<decimal string, up to 40 digits>",
        "SizeBytes": N,
        "StreamViewType": "KEYS_ONLY"|"NEW_IMAGE"|"OLD_IMAGE"|
                          "NEW_AND_OLD_IMAGES"},
     "userIdentity": {"type": "Service",
                      "principalId": "dynamodb.amazonaws.com"}}  # TTL only

Values are **typed AttributeValue wrappers** — ``{"S": "text"}``,
``{"N": "123"}`` (numbers travel as strings), ``{"BOOL": true}``,
``{"NULL": true}``, ``{"L": [wrapper, ...]}``, ``{"M": {...}}`` — so
the decode is a typed unwrap, not a plain struct projection: each
payload field navigates its wrapper key (string→``S``, numeric→``N``
with an Arrow string→numeric cast, list→``L`` recursively) for ALL
rows per Arrow/numpy pass.

Mapping into the engine's model (and the honest caveats):

- **Ordering**: ``dynamodb.SequenceNumber`` is the stream's per-shard
  total order — a decimal string of up to 40 digits (real values run
  ~21 digits), monotonically increasing.  A recorded dump is one
  shard's capture, so the sequence IS the global order.  Engine
  coordinates are int64: the decoder parses each number into two
  decimal limbs (one numpy digit-grid dot product per limb) and
  subtracts a dump-wide **sequence base** (the first record's number
  rounded down to a multiple of 10^18; :func:`read_dynamo` probes it
  from the first file's head, O(1) driver work).  A dump spanning more
  than 3×10^18 sequence units past its base — or numbers wider than 37
  digits — refuses loudly rather than inventing an order.
- **Transactions**: streams deliver only committed writes and carry no
  transaction grouping (``TransactWriteItems`` surfaces as independent
  records — documented AWS behavior), so every record decodes as a
  singleton transaction (``tx_id = gtid, seq_in_tx = 0, tx_events =
  1``): no counting pass, no side index — the same record-level shape
  as the MongoDB change-stream adapter, justified by the stream's own
  contract.
- **Images**: LWW apply needs the after image.  ``StreamViewType
  NEW_AND_OLD_IMAGES`` (or ``NEW_IMAGE``) provides it; a ``KEYS_ONLY``
  or ``OLD_IMAGE`` dump refuses to decode with that exact guidance —
  fabricating rows from key-only records would corrupt the lake.
  ``OldImage`` is the full before item when the view includes it;
  without it, updates/removes get a key-only before reconstructed from
  ``Keys`` — the engine dereferences before images only for key
  extraction and eviction routing, and the key is always present.
- ``Keys`` holds the merge identity: the payload's FIRST field must be
  the table's key attribute.  The format carries neither a database
  name nor a server id (``db`` and ``server_id`` decode as null —
  stated, not fabricated); the TABLE name is recovered from
  ``eventSourceARN``.
- TTL expirations arrive as ordinary ``REMOVE`` records carrying a
  ``userIdentity`` of ``dynamodb.amazonaws.com`` — decoded as normal
  deletes (the marker is accepted and ignored).
- Set types (``SS``/``NS``/``BS``) are UNORDERED by contract and
  cannot carry this engine's ordered token lists; binary (``B``) needs
  base64 — both refuse with a named error rather than guessing.

Decoding is vectorized end-to-end: ``pyarrow.json`` parses lines in
C++ inside read tasks, the typed unwrap is Arrow struct-field algebra
plus string→numeric casts, and the sequence-number parse is two numpy
digit-grid dot products.  The ENCODER (:func:`dynamo_dump`) is the
recorded-``GetRecords`` stand-in for tests and benches and is allowed
to be per-row Python; it never runs inside a pipeline.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rookray.schema import (OP_DELETE, OP_INSERT, OP_UPDATE, SEQ_SCHEMA,
                            change_event_schema)
from rookray.source import ChangeStreamServer
from rookray.wire import _json_table
from rookray.wiremongo import _plain, _struct_field

__all__ = [
    "dynamo_dump", "decode_dynamo", "read_dynamo",
    "infer_payload_dynamo", "dynamo_sequence_base",
    "dynamo_first_coordinate", "dynamo_files_above",
    "DynamoStreamServer", "stream_dynamo_socket",
]

_OP_TO_DDB = {OP_INSERT: "INSERT", OP_UPDATE: "MODIFY",
              OP_DELETE: "REMOVE"}

_EVENT_NAMES = pa.array(["INSERT", "MODIFY", "REMOVE"])
_EVENT_OP = pa.array([OP_INSERT, OP_UPDATE, OP_DELETE], pa.int8())

#: decimal limb split: coordinates live in the low 18 digits, the
#: high limb (up to 19 digits) anchors the dump-wide base
_LOW_DIGITS = 18
_LOW_MOD = 10 ** _LOW_DIGITS
_SEQ_MAX_DIGITS = 37
_HI_DIGITS = _SEQ_MAX_DIGITS - _LOW_DIGITS
#: max (high - base_high) — wide enough that ANY coordinate below the
#: engine's 2^62 gtid ceiling decodes when the base is anchored at the
#: dump's head (the egress dialect emits tokens up to 2^62 from gtids
#: up to 2^61); the explicit 2^62 check below is the hard ceiling
_MAX_ERA_SPAN = 4

_POW10_HI = (np.uint64(10) ** np.arange(_HI_DIGITS - 1, -1, -1,
                                        dtype=np.uint64))
_POW10_LO = (np.uint64(10) ** np.arange(_LOW_DIGITS - 1, -1, -1,
                                        dtype=np.uint64))

_ARN_TABLE_RE = r":table/(?P<t>[^/]+)/stream"


# ============================================================= encoder

def _attr(v) -> dict:
    """Python value → typed DynamoDB AttributeValue wrapper."""
    v = _plain(v)
    if v is None:
        return {"NULL": True}
    if isinstance(v, bool):
        return {"BOOL": v}
    if isinstance(v, int):
        return {"N": str(v)}
    if isinstance(v, float):
        return {"N": repr(v)}
    if isinstance(v, str):
        return {"S": v}
    if isinstance(v, (list, tuple)):
        return {"L": [_attr(x) for x in v]}
    if isinstance(v, dict):
        return {"M": {k: _attr(x) for k, x in v.items()}}
    raise TypeError(f"unencodable attribute value {type(v).__name__}")


def _image(img: dict | None) -> dict | None:
    if img is None:
        return None
    return {k: _attr(v) for k, v in img.items()}


def dynamo_dump(events: pa.Table, out_dir: str, n_files: int = 4,
                view_type: str = "NEW_AND_OLD_IMAGES",
                sequence_base: int = 10 ** 20) -> dict:
    """Serialize a change-event table into a recorded DynamoDB Streams
    dump: ``dynamo-%05d.jsonl`` files, one stream record per line,
    ``SequenceNumber = str(sequence_base + gtid)`` (the default base
    makes realistic 21-digit numbers, forcing the decoder's limb
    parse + base rebase).  Deterministic: same input table →
    byte-identical dump.

    ``view_type`` is a dump-wide knob exactly like the real stream
    setting: ``NEW_AND_OLD_IMAGES`` ships both images, ``NEW_IMAGE``
    withholds every ``OldImage`` (decode falls back to key-only
    befores), ``KEYS_ONLY`` ships neither (decode refuses).  Every 7th
    delete carries the TTL-expiry ``userIdentity`` marker."""
    if view_type not in ("KEYS_ONLY", "NEW_IMAGE", "OLD_IMAGE",
                         "NEW_AND_OLD_IMAGES"):
        raise ValueError(f"unknown StreamViewType {view_type!r}")
    os.makedirs(out_dir, exist_ok=True)
    new_ok = view_type in ("NEW_IMAGE", "NEW_AND_OLD_IMAGES")
    old_ok = view_type in ("OLD_IMAGE", "NEW_AND_OLD_IMAGES")
    rows = events.to_pylist()
    records = []
    for r in rows:
        g = int(r["gtid"])
        key = (r["after"] or r["before"] or {}).get("doc_id", r.get("key"))
        dyn = {
            "ApproximateCreationDateTime": 1600000000 + g // 1000,
            "Keys": {"doc_id": _attr(key)},
            "SequenceNumber": str(sequence_base + g),
            "SizeBytes": 48 + 4 * int((r["after"] or {}).get("n_tok") or 0),
            "StreamViewType": view_type,
        }
        if r["op"] != OP_DELETE and new_ok:
            dyn["NewImage"] = _image(r["after"])
        if r["op"] != OP_INSERT and old_ok and r["before"] is not None:
            dyn["OldImage"] = _image(r["before"])
        # real GetRecords output orders the envelope keys like this
        rec = {
            "eventID": f"{g:032x}",
            "eventName": _OP_TO_DDB[r["op"]],
            "eventVersion": "1.1",
            "eventSource": "aws:dynamodb",
            "awsRegion": "us-east-1",
            "dynamodb": dyn,
            "eventSourceARN": ("arn:aws:dynamodb:us-east-1:123456789012:"
                               f"table/{r['table']}/stream/"
                               "2026-08-19T00:00:00.000"),
        }
        if r["op"] == OP_DELETE and g % 7 == 0:   # TTL expiry shape
            rec["userIdentity"] = {"type": "Service",
                                   "principalId": "dynamodb.amazonaws.com"}
        records.append(rec)

    per = -(-len(records) // max(1, n_files)) or 1
    paths = []
    for fi in range(0, len(records), per):
        path = os.path.join(out_dir, f"dynamo-{fi // per:05d}.jsonl")
        with open(path, "w") as f:
            for rec in records[fi:fi + per]:
                f.write(json.dumps(rec, separators=(",", ":")) + "\n")
        paths.append(path)
    return {"files": paths, "records": len(records), "events": len(rows)}


# ============================================================= decoder

def _sequence_coords(seq, n: int, base_high: int) -> np.ndarray:
    """Vectorized decimal ``SequenceNumber`` strings → int64 engine
    coordinates: two digit-grid limb dot products, then a rebase
    against the dump-wide ``base_high`` (= sequence base / 10^18)."""
    if seq is None or pa.types.is_null(seq.type):
        raise ValueError("stream records carry no dynamodb."
                         "SequenceNumber — no order exists; refusing "
                         "to invent one")
    if isinstance(seq, pa.ChunkedArray):
        seq = seq.combine_chunks()
    seq = seq.cast(pa.string())
    if seq.null_count:
        raise ValueError(f"{seq.null_count} record(s) with a null "
                         "dynamodb.SequenceNumber")
    lens = pc.binary_length(seq).to_numpy(zero_copy_only=False)
    if (lens == 0).any():
        raise ValueError("empty SequenceNumber")
    if (lens > _SEQ_MAX_DIGITS).any():
        raise ValueError(
            f"SequenceNumber wider than {_SEQ_MAX_DIGITS} digits — "
            "outside this decoder's two-limb range")
    padded = pc.utf8_lpad(seq, _SEQ_MAX_DIGITS, "0")
    if isinstance(padded, pa.ChunkedArray):
        padded = padded.combine_chunks()
    buf = np.frombuffer(padded.buffers()[2], dtype=np.uint8)
    offs = np.frombuffer(padded.buffers()[1], dtype=np.int32,
                         count=n + 1 + padded.offset)[padded.offset:]
    grid = buf[offs[:-1][:, None]
               + np.arange(_SEQ_MAX_DIGITS, dtype=np.int64)[None, :]]
    vals = grid - np.uint8(ord("0"))          # non-digits wrap to >9
    if (vals > 9).any():
        raise ValueError("non-decimal SequenceNumber")
    hi = (vals[:, :_HI_DIGITS].astype(np.uint64)
          * _POW10_HI[None, :]).sum(axis=1, dtype=np.uint64)
    lo = (vals[:, _HI_DIGITS:].astype(np.uint64)
          * _POW10_LO[None, :]).sum(axis=1, dtype=np.uint64)
    bh = np.uint64(base_high)
    if (hi < bh).any():
        raise ValueError(
            "SequenceNumber below the dump's sequence base — dump "
            "files are out of order, or an explicit sequence_base was "
            "anchored past the stream's head")
    dh = hi - bh
    if (dh > np.uint64(_MAX_ERA_SPAN)).any():
        raise ValueError(
            f"dump spans more than {_MAX_ERA_SPAN}×10^{_LOW_DIGITS} "
            "sequence units past its base — the int64 coordinate "
            "space would overflow; split the dump or pass a "
            "sequence_base anchored at its head")
    g = dh * np.uint64(_LOW_MOD) + lo
    if (g > np.uint64(2 ** 62)).any():
        raise ValueError(
            "rebased SequenceNumber exceeds the engine's 2^62 "
            "coordinate ceiling — split the dump or pass a "
            "sequence_base anchored at its head")
    return g.astype(np.int64)


def _child(col, name: str):
    if col is None:
        return None
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not pa.types.is_struct(col.type):
        return None
    idx = col.type.get_field_index(name)
    if idx < 0:
        return None
    return col.field(idx)


def _unwrap_attr(col, typ: pa.DataType, n: int, path: str) -> pa.Array:
    """Typed-AttributeValue wrapper column → a typed Arrow column:
    navigate the wrapper key the target type implies (absent key or
    ``{"NULL": true}`` rows come out null), recursively for lists."""
    if col is None or pa.types.is_null(col.type):
        return pa.nulls(n, typ)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not pa.types.is_struct(col.type):
        raise ValueError(f"attribute {path!r} is not a typed DynamoDB "
                         "AttributeValue wrapper")
    if pa.types.is_list(typ) or pa.types.is_large_list(typ):
        lst = _child(col, "L")
        if lst is None or pa.types.is_null(lst.type):
            for setk in ("SS", "NS", "BS"):
                if _child(col, setk) is not None:
                    raise ValueError(
                        f"attribute {path!r} is a DynamoDB {setk} SET — "
                        "sets are unordered by contract and cannot "
                        "carry an ordered list; re-encode as L")
            return pa.nulls(n, typ)
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        lens = pc.list_value_length(lst).fill_null(0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        offsets_np = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        null_np = lst.is_null().to_numpy(zero_copy_only=False)
        offsets = pa.array(offsets_np,
                           mask=np.concatenate([null_np, [False]]))
        flat = pc.list_flatten(lst)
        inner = _unwrap_attr(flat, typ.value_type, len(flat), path + "[]")
        return pa.ListArray.from_arrays(offsets, inner).cast(typ)
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        key = "S"
    elif (pa.types.is_integer(typ) or pa.types.is_floating(typ)
          or pa.types.is_decimal(typ)):
        key = "N"
    elif pa.types.is_boolean(typ):
        key = "BOOL"
    elif pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
        raise ValueError(f"attribute {path!r}: binary (B) attributes "
                         "are base64-framed — not supported by this "
                         "decoder")
    else:
        raise ValueError(f"attribute {path!r}: no AttributeValue "
                         f"mapping for payload type {typ}")
    c = _child(col, key)
    if c is None or pa.types.is_null(c.type):
        return pa.nulls(n, typ)
    return c.cast(typ)


def _image_struct(col, payload: pa.Schema, n: int) -> pa.StructArray:
    """NewImage/OldImage wrapper struct → typed payload struct with the
    original row validity."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col is None or not pa.types.is_struct(col.type):
        return pa.nulls(n, pa.struct(list(payload)))
    children = [_unwrap_attr(_child(col, f.name), f.type, n, f.name)
                for f in payload]
    mask = col.is_null()
    return pa.StructArray.from_arrays(
        children, names=payload.names,
        mask=mask.combine_chunks() if isinstance(mask, pa.ChunkedArray)
        else mask)


def decode_dynamo(tbl: pa.Table, payload: pa.Schema = SEQ_SCHEMA,
                  base_high: int = 0) -> pa.Table:
    """One batch of JSON-parsed stream records → the change-event
    schema.  Entirely self-contained: a DynamoDB stream delivers only
    committed item writes with no transaction grouping, so every record
    is a singleton transaction — no counting pass, no side index.

    ``base_high`` is the dump-wide sequence base divided by 10^18
    (:func:`read_dynamo` probes and threads it); the default 0 accepts
    sequence numbers below 4×10^18 directly and refuses wider dumps
    with guidance to pass a base."""
    schema = change_event_schema(payload)
    n = tbl.num_rows
    if n == 0:
        return schema.empty_table()
    if ("eventName" not in tbl.schema.names
            or "dynamodb" not in tbl.schema.names):
        raise ValueError("not a DynamoDB Streams dump: no "
                         "eventName/dynamodb column")
    name = tbl.column("eventName").combine_chunks().cast(pa.string())
    code = pc.index_in(name, value_set=_EVENT_NAMES)
    if code.null_count:
        bad = sorted(set(name.filter(code.is_null()).to_pylist()))
        raise ValueError(
            f"unknown eventName value(s) {bad} — a DynamoDB stream "
            "emits only INSERT/MODIFY/REMOVE")
    op = pc.take(_EVENT_OP, code)
    if isinstance(op, pa.ChunkedArray):
        op = op.combine_chunks()
    op_np = op.to_numpy(zero_copy_only=False)

    dyn = tbl.column("dynamodb").combine_chunks()
    if not pa.types.is_struct(dyn.type):
        raise ValueError("dynamodb column is not a struct")
    gtids = _sequence_coords(_child(dyn, "SequenceNumber"), n, base_high)

    # ---- key: Keys.<payload key attribute> is the merge identity
    keys_col = _child(dyn, "Keys")
    key_field = payload.field(0)
    if keys_col is None:
        raise ValueError("stream records without dynamodb.Keys")
    key = _unwrap_attr(_child(keys_col, key_field.name), key_field.type,
                       n, f"Keys.{key_field.name}")
    if key.null_count:
        raise ValueError(
            f"{key.null_count} record(s) carry no "
            f"Keys.{key_field.name} — the payload's first field must "
            "be the table's key attribute")

    # ---- images
    after = _image_struct(_child(dyn, "NewImage"), payload, n)
    missing_after = pc.and_(after.is_null(), pa.array(op_np != OP_DELETE))
    if pc.any(missing_after).as_py():
        raise ValueError(
            "INSERT/MODIFY record(s) without NewImage — run the stream "
            "with StreamViewType NEW_AND_OLD_IMAGES (or NEW_IMAGE); "
            "key-only records cannot feed LWW apply")
    after = pa.StructArray.from_arrays(
        [after.field(i) for i in range(after.type.num_fields)],
        names=payload.names, mask=pa.array(op_np == OP_DELETE))

    pre = _image_struct(_child(dyn, "OldImage"), payload, n)
    # OldImage is view-type dependent: U/D rows without one get a
    # key-only before (the engine needs only the key from it)
    before_children = []
    pre_valid = pre.is_valid()
    for f in payload:
        child = pre.field(payload.names.index(f.name))
        fallback = key if f.name == key_field.name \
            else pa.nulls(n, f.type)
        before_children.append(pc.if_else(pre_valid, child, fallback))
    before = pa.StructArray.from_arrays(
        before_children, names=payload.names,
        mask=pa.array(op_np == OP_INSERT))

    # ---- table name from the stream ARN (no db in the format)
    table = pa.nulls(n, pa.string())
    if "eventSourceARN" in tbl.schema.names:
        arn = tbl.column("eventSourceARN").combine_chunks()
        if pa.types.is_string(arn.type) or pa.types.is_large_string(arn.type):
            m = pc.extract_regex(arn.cast(pa.string()), _ARN_TABLE_RE)
            table = m.field("t") if pa.types.is_struct(m.type) \
                else pa.nulls(n, pa.string())

    return pa.table({
        "gtid": pa.array(gtids, pa.int64()),
        "tx_id": pa.array(gtids, pa.int64()),   # singleton tx per record
        "seq_in_tx": pa.array(np.zeros(n, np.int32), pa.int32()),
        "tx_events": pa.array(np.ones(n, np.int32), pa.int32()),
        "server_id": pa.nulls(n, pa.int64()),   # not in the format
        "db": pa.nulls(n, pa.string()),         # not in the format
        "table": table,
        "op": op,
        "key": key,
        "before": before,
        "after": after,
    }, schema=schema)


def dynamo_sequence_base(paths: list[str]) -> int:
    """Dump-wide sequence base: the FIRST file's first record's
    ``SequenceNumber`` rounded down to a multiple of 10^18 — one
    driver-side line read, O(1)."""
    for path in paths[:1]:
        with open(path) as f:
            for i, line in enumerate(f):
                if i > 64:
                    break
                try:
                    rec = json.loads(line)
                except ValueError:
                    break
                seq = (rec.get("dynamodb") or {}).get("SequenceNumber")
                if isinstance(seq, str) and seq.isdigit():
                    return (int(seq) // _LOW_MOD) * _LOW_MOD
    return 0


def read_dynamo(paths: list[str], payload: pa.Schema = SEQ_SCHEMA,
                sequence_base: int | None = None) -> "ray.data.Dataset":
    """A ``ray.data.Dataset`` of engine change events decoded from a
    recorded DynamoDB Streams dump — fully streaming, no side pass
    (committed-only, per-record atomicity).  ``sequence_base`` defaults
    to a one-line probe of the first file's head."""
    import ray.data

    base = dynamo_sequence_base(paths) if sequence_base is None \
        else sequence_base
    base_high = base // _LOW_MOD

    def decode(t: pa.Table) -> pa.Table:
        return decode_dynamo(t, payload=payload, base_high=base_high)

    return ray.data.read_json(
        paths, override_num_blocks=max(1, len(paths))).map_batches(
        decode, batch_format="pyarrow", zero_copy_batch=True)


# ================================== schema inference + file pruning

def _wire_field_type(t: pa.DataType, path: str) -> pa.DataType | None:
    """JSON-inferred AttributeValue wrapper type → engine type.
    Numbers travel as strings, so ``N`` infers int64 by convention
    (pass an explicit payload schema for float attributes); a wrapper
    whose only key is ``NULL`` carries no type information → None."""
    if not pa.types.is_struct(t):
        return None
    names = {f.name: f.type for f in t
             if not pa.types.is_null(f.type)}
    if "S" in names:
        return pa.string()
    if "N" in names:
        return pa.int64()
    if "BOOL" in names:
        return pa.bool_()
    if "L" in names:
        inner = _wire_field_type(names["L"].value_type, path + "[]")
        return pa.list_(inner) if inner is not None else None
    return None


def infer_payload_dynamo(paths: list[str],
                         sample_files: int = 2) -> pa.Schema:
    """Payload schema from the dump itself: union of ``NewImage``
    wrapper shapes across the head and tail sample files (additive
    evolution means early files may lack late attributes)."""
    from rookray.schema import unify_additive
    picks = list(dict.fromkeys([*paths[:sample_files],
                                *paths[-sample_files:]]))
    schemas = []
    for p in picks:
        with open(p, "rb") as f:
            t = _json_table(f.read())
        if "dynamodb" not in t.schema.names:
            continue
        img = _child(t.column("dynamodb").combine_chunks(), "NewImage")
        if img is None or not pa.types.is_struct(img.type):
            continue
        fields = []
        for fld in img.type:
            typ = _wire_field_type(fld.type, fld.name)
            if typ is not None:
                fields.append(pa.field(fld.name, typ))
        if fields:
            schemas.append(pa.schema(fields))
    if not schemas:
        raise ValueError("no NewImage in the sampled dump files — "
                         "cannot infer a payload schema (KEYS_ONLY/"
                         "OLD_IMAGE dumps cannot feed LWW apply)")
    return unify_additive(schemas)


def dynamo_first_coordinate(path: str,
                            base: int | None = None) -> int | None:
    """First record's engine coordinate from a dump file's head
    (``base`` as from :func:`dynamo_sequence_base`)."""
    with open(path) as f:
        for i, line in enumerate(f):
            if i > 64:
                break
            try:
                rec = json.loads(line)
            except ValueError:
                return None
            seq = (rec.get("dynamodb") or {}).get("SequenceNumber")
            if isinstance(seq, str) and seq.isdigit():
                return int(seq) - (base or 0)
            return None
    return None


def dynamo_files_above(paths: list[str], watermark: int,
                       sequence_base: int | None = None) -> list[str]:
    """Checkpoint resume for recorded Streams dumps — the same
    successor-based pruning as the other seven adapters."""
    from rookray.source import segments_above
    base = dynamo_sequence_base(paths) if sequence_base is None \
        else sequence_base
    return segments_above(paths, watermark,
                          [dynamo_first_coordinate(p, base)
                           for p in paths])


# ========================================================== live feed

class DynamoStreamServer(ChangeStreamServer):
    """Test producer: frames carry raw stream-record JSON-lines."""

    def push_file(self, path: str) -> None:
        with open(path, "rb") as f:
            self._q.put(f.read())


def stream_dynamo_socket(host: str, port: int,
                         payload: pa.Schema = SEQ_SCHEMA,
                         sequence_base: int | None = None,
                         connect_timeout_s: float = 10.0):
    """Unbounded Dataset of engine change events from a live stream
    feed — no side state beyond the sequence base, which the first
    frame anchors (its first record's number rounded down to a 10^18
    multiple) when not passed explicitly.  The feed is one ordered
    read task, so the anchor is deterministic."""
    import ray.data

    from rookray.wirejson import _JsonSocketDatasource

    cell = {"bh": None if sequence_base is None
            else sequence_base // _LOW_MOD}

    def decode(t: pa.Table) -> pa.Table:
        if cell["bh"] is None:
            seq = _child(t.column("dynamodb").combine_chunks(),
                         "SequenceNumber") if "dynamodb" in t.schema.names \
                else None
            if seq is None or len(seq) == 0 or not seq[0].is_valid:
                raise ValueError("first frame carries no SequenceNumber "
                                 "to anchor the sequence base")
            cell["bh"] = int(str(seq[0].as_py())) // _LOW_MOD
        return decode_dynamo(t, payload=payload, base_high=cell["bh"])

    return ray.data.read_datasource(
        _JsonSocketDatasource(host, port, decode, "DynamoSocketStream",
                              connect_timeout_s),
        override_num_blocks=1)
