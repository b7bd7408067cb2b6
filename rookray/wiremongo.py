"""MongoDB change-stream adapter — wire format #7, the first
non-MySQL-family source.

rook tails a MySQL binlog in-process (rook-source-mysql/...
/MySQLReplicationStream.java:71-120); the document-database analog of
that stream is MongoDB's **change stream** (the public `db.watch()` /
`$changeStream` event shape, one JSON document per row mutation)::

    {"_id": {"_data": "<hex resume token>"},
     "operationType": "insert"|"update"|"replace"|"delete"|
                      "drop"|"rename"|"dropDatabase"|"invalidate"|...,
     "clusterTime": {"$timestamp": {"t": <epoch s>, "i": <ordinal>}},
     "ns": {"db": "rook", "coll": "sequences"},
     "documentKey": {"_id": <key>},
     "fullDocument": {...},                  # insert always; replace
                                             # always; update only with
                                             # fullDocument:"updateLookup"
     "fullDocumentBeforeChange": {...},      # 6.0+ pre-images, opt-in
     "updateDescription": {"updatedFields": {...},
                           "removedFields": [...]},   # update only
     "lsid": {...}, "txnNumber": N}          # multi-document txns only

Mapping into the engine's model (and the honest caveats):

- **Ordering**: the resume token ``_id._data`` is the stream's total
  order.  Recorded dumps written by :func:`mongo_dump` carry the
  engine gtid as a 16-hex-char ``_data`` (real tokens are also hex,
  just longer), decoded fully vectorized; a foreign dump whose tokens
  don't fit 64 bits falls back to the ``clusterTime`` composite
  ``t << 20 | i`` for ALL rows (one coordinate space, never mixed).
- **Transactions**: a change stream only ever emits operations of
  COMMITTED transactions (the server buffers until commit — this is
  the documented contract of ``$changeStream``), so the engine's
  open-transaction holdback has nothing to hold back: every event
  decodes as a singleton transaction (``tx_id = gtid, seq_in_tx = 0,
  tx_events = 1``) and the watermark advances through the dump with no
  counting pass and no side index — the same record-level-atomicity
  shape as the Canal adapter, here justified by the stream's own
  semantics rather than by a lossy envelope.  ``lsid``/``txnNumber``
  are accepted and ignored.
- **Post-images**: LWW apply needs the after image.  Inserts and
  replaces always carry ``fullDocument``; updates only do when the
  watcher runs with ``fullDocument: "updateLookup"`` (or 6.0
  ``"required"``).  An update WITHOUT ``fullDocument`` refuses to
  decode with that exact guidance — applying ``updateDescription``
  deltas against unknown prior state would fabricate rows.
- **Pre-images**: ``fullDocumentBeforeChange`` is opt-in
  (``changeStreamPreAndPostImages``); when absent on an update or
  delete, the before image is reconstructed key-only from
  ``documentKey`` — the engine dereferences before images only for key
  extraction and eviction routing, and the key is always present.
- ``documentKey._id`` IS the merge key: the lake's payload key column
  (``payload.names[0]``) must hold the same value inside
  ``fullDocument``.  Mongo carries no ``server_id``; server-id routing
  is unavailable through this format (use the table filter) — stated,
  not fabricated.
- Non-mutation events (``drop``, ``rename``, ``dropDatabase``,
  ``invalidate``, DDL-ish 6.0 events) are dropped; ``invalidate``
  ends a real watch and a resumed watcher re-connects — a recorded
  dump just carries it inline.

Decoding is vectorized end-to-end: ``pyarrow.json`` parses lines in
C++ inside read tasks, the mapping is Arrow struct-field algebra, and
the resume-token hex parse is one numpy table lookup + dot product.
The ENCODER (:func:`mongo_dump`) is the recorded-``watch()`` stand-in
for tests and benches and is allowed to be per-row Python; it never
runs inside a pipeline.
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
from rookray.wire import _json_table, _payload_struct

__all__ = [
    "mongo_dump", "decode_mongo", "read_mongo",
    "infer_payload_mongo", "mongo_first_coordinate", "mongo_files_above",
    "MongoStreamServer", "stream_mongo_socket",
]

_OP_TO_MONGO = {OP_INSERT: "insert", OP_UPDATE: "update",
                OP_DELETE: "delete"}

#: bits for the clusterTime ordinal in the fallback coordinate
_CT_ORD_BITS = 20

_MUTATIONS = pa.array(["insert", "update", "replace", "delete"])
_MUT_OP = pa.array([OP_INSERT, OP_UPDATE, OP_UPDATE, OP_DELETE], pa.int8())


# ============================================================= encoder

def _plain(v):
    if isinstance(v, np.generic):
        return v.item()
    if isinstance(v, np.ndarray):
        return [_plain(x) for x in v]
    if isinstance(v, list):
        return [_plain(x) for x in v]
    return v


def _doc(img) -> dict | None:
    if img is None:
        return None
    return {k: _plain(v) for k, v in img.items()}


def mongo_dump(events: pa.Table, out_dir: str, n_files: int = 4) -> dict:
    """Serialize a change-event table into a recorded MongoDB
    change-stream dump: ``mongo-%05d.jsonl`` files, one change event
    per line, resume token = 16-hex engine gtid.  Deterministic: same
    input table → byte-identical dump.

    Realism knobs, all deterministic functions of the gtid so the LWW
    oracle is unchanged: every third update ships as a ``replace``
    (post-image only, no ``updateDescription``); every fifth update or
    delete omits ``fullDocumentBeforeChange`` (pre-images disabled);
    multi-event transactions carry ``lsid``/``txnNumber``; the last
    file ends with ``drop`` + ``invalidate`` records (a real dropped
    collection ends the stream exactly like this)."""
    os.makedirs(out_dir, exist_ok=True)
    rows = events.to_pylist()
    records = []
    for r in rows:
        g = int(r["gtid"])
        key = (r["after"] or r["before"] or {}).get("doc_id", r.get("key"))
        rec = {
            "_id": {"_data": f"{g:016x}"},
            "operationType": _OP_TO_MONGO[r["op"]],
            "clusterTime": {"$timestamp": {"t": 1600000000 + g // 1000,
                                           "i": g % 1000}},
            "ns": {"db": r["db"], "coll": r["table"]},
            "documentKey": {"_id": key},
        }
        if r.get("tx_events", 1) and int(r["tx_events"]) > 1:
            rec["lsid"] = {"id": {"$binary": {
                "base64": f"{int(r['tx_id']):022d}==", "subType": "04"}}}
            rec["txnNumber"] = int(r["tx_id"])
        pre = _doc(r["before"]) if g % 5 else None  # every 5th: no preimage
        if r["op"] == OP_INSERT:
            rec["fullDocument"] = _doc(r["after"])
        elif r["op"] == OP_UPDATE:
            rec["fullDocument"] = _doc(r["after"])
            if g % 3 == 0:
                rec["operationType"] = "replace"
            else:
                before = r["before"] or {}
                after = r["after"] or {}
                rec["updateDescription"] = {
                    "updatedFields": {k: _plain(v) for k, v in after.items()
                                      if _plain(v) != _plain(before.get(k))},
                    "removedFields": []}
            if pre is not None:
                rec["fullDocumentBeforeChange"] = pre
        else:  # delete: documentKey (+ optional pre-image), no fullDocument
            if pre is not None:
                rec["fullDocumentBeforeChange"] = pre
        records.append(rec)
    # a dropped collection ends a real stream exactly like this
    records.append({"_id": {"_data": f"{(rows[-1]['gtid'] + 1) if rows else 1:016x}"},
                    "operationType": "drop",
                    "ns": {"db": "rook", "coll": "sequences"}})
    records.append({"_id": {"_data": f"{(rows[-1]['gtid'] + 2) if rows else 2:016x}"},
                    "operationType": "invalidate"})

    per = -(-len(records) // max(1, n_files)) or 1
    paths = []
    for fi in range(0, len(records), per):
        path = os.path.join(out_dir, f"mongo-{fi // per:05d}.jsonl")
        with open(path, "w") as f:
            for rec in records[fi:fi + per]:
                f.write(json.dumps(rec, separators=(",", ":")) + "\n")
        paths.append(path)
    return {"files": paths, "records": len(records), "events": len(rows)}


# ============================================================= decoder

_HEX_VAL = np.full(256, 255, dtype=np.uint8)
for _i, _c in enumerate(b"0123456789"):
    _HEX_VAL[_c] = _i
for _i, _c in enumerate(b"abcdef"):
    _HEX_VAL[_c] = 10 + _i
for _i, _c in enumerate(b"ABCDEF"):
    _HEX_VAL[_c] = 10 + _i
_HEX_POW = (np.uint64(16) ** np.arange(15, -1, -1, dtype=np.uint64))


def _resume_token_gtids(data: pa.Array, n: int) -> np.ndarray | None:
    """Vectorized ``_id._data`` hex → int64 gtids, or ``None`` when any
    token cannot be a 64-bit coordinate (too long / non-hex / null) —
    the caller then uses the clusterTime composite for ALL rows."""
    if data is None or data.null_count:
        return None
    lens = pc.binary_length(data).to_numpy(zero_copy_only=False)
    if (lens == 0).any() or (lens > 16).any():
        return None
    padded = pc.utf8_lpad(data, 16, "0")
    if isinstance(padded, pa.ChunkedArray):
        padded = padded.combine_chunks()
    buf = np.frombuffer(padded.buffers()[2], dtype=np.uint8)
    offs = np.frombuffer(padded.buffers()[1], dtype=np.int32,
                         count=n + 1 + padded.offset)[padded.offset:]
    # lpad → every slot is exactly 16 bytes; gather into an (n, 16) grid
    grid = buf[offs[:-1][:, None] + np.arange(16, dtype=np.int64)[None, :]]
    vals = _HEX_VAL[grid]
    if (vals == 255).any():
        return None
    g = (vals.astype(np.uint64) * _HEX_POW[None, :]).sum(
        axis=1, dtype=np.uint64)
    if (g > np.uint64(2**62)).any():
        return None
    return g.astype(np.int64)


def _struct_field(tbl: pa.Table, col: str, field: str):
    if col not in tbl.schema.names:
        return None
    c = tbl.column(col).combine_chunks()
    if not pa.types.is_struct(c.type):
        return None
    idx = c.type.get_field_index(field)
    if idx < 0:
        return None
    return c.field(idx)


def decode_mongo(tbl: pa.Table, payload: pa.Schema = SEQ_SCHEMA) -> pa.Table:
    """One batch of JSON-parsed change-stream events → the change-event
    schema.  Entirely self-contained: a change stream emits only
    committed operations, so every event is a singleton transaction
    (``tx_id = gtid``, ``seq_in_tx = 0``, ``tx_events = 1``) — no
    counting pass, no side index, watermarks advance record by
    record."""
    schema = change_event_schema(payload)
    n = tbl.num_rows
    if n == 0:
        return schema.empty_table()
    if "operationType" not in tbl.schema.names:
        raise ValueError("not a MongoDB change-stream dump: no "
                         "operationType column")
    typ = tbl.column("operationType").combine_chunks()
    code = pc.index_in(typ.cast(pa.string()), value_set=_MUTATIONS)
    keep = code.is_valid()
    tbl = tbl.filter(keep)
    code = code.filter(keep)
    n = tbl.num_rows
    if n == 0:
        return schema.empty_table()
    op = pc.take(_MUT_OP, code)
    if isinstance(op, pa.ChunkedArray):
        op = op.combine_chunks()
    op_np = op.to_numpy(zero_copy_only=False)

    # ---- coordinates: resume token hex, else clusterTime composite
    data = _struct_field(tbl, "_id", "_data")
    gtids = None
    if data is not None:
        data = data.cast(pa.string())
        gtids = _resume_token_gtids(data, n)
    if gtids is None:
        ts = _struct_field(tbl, "clusterTime", "$timestamp")
        t_arr = i_arr = None
        if ts is not None and pa.types.is_struct(ts.type):
            ti, ii = ts.type.get_field_index("t"), ts.type.get_field_index("i")
            if ti >= 0 and ii >= 0:
                t_arr = ts.field(ti).cast(pa.int64()) \
                    .to_numpy(zero_copy_only=False)
                i_arr = ts.field(ii).cast(pa.int64()) \
                    .to_numpy(zero_copy_only=False)
        if t_arr is None:
            raise ValueError(
                "change-stream events carry neither a 64-bit-decodable "
                "resume token nor a clusterTime — no LWW order exists; "
                "refusing to invent one")
        if (i_arr >= (1 << _CT_ORD_BITS)).any():
            raise ValueError(f"clusterTime ordinal >= 2^{_CT_ORD_BITS} — "
                             "the composite coordinate would collide")
        gtids = (t_arr << np.int64(_CT_ORD_BITS)) | i_arr

    # ---- key: documentKey._id is the documented merge identity
    key = _struct_field(tbl, "documentKey", "_id")
    key_field = payload.field(0)
    if key is None:
        raise ValueError("change-stream events without documentKey")
    key = key.cast(key_field.type)
    if key.null_count:
        raise ValueError(f"{key.null_count} event(s) carry a null "
                         "documentKey._id — no merge identity")

    # ---- images
    after = _payload_struct(
        tbl.column("fullDocument") if "fullDocument" in tbl.schema.names
        else None, payload, n)
    missing_after = pc.and_(after.is_null(), pa.array(op_np != OP_DELETE))
    if pc.any(missing_after).as_py():
        raise ValueError(
            "update/insert event(s) without fullDocument — run the "
            "change stream with fullDocument: 'updateLookup' (or "
            "'required'); updateDescription deltas against unknown "
            "prior state would fabricate rows")
    after = pa.StructArray.from_arrays(
        [after.field(i) for i in range(after.type.num_fields)],
        names=payload.names, mask=pa.array(op_np == OP_DELETE))

    pre = _payload_struct(
        tbl.column("fullDocumentBeforeChange")
        if "fullDocumentBeforeChange" in tbl.schema.names else None,
        payload, n)
    # pre-images are opt-in: U/D rows without one get a key-only before
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

    db = _struct_field(tbl, "ns", "db")
    coll = _struct_field(tbl, "ns", "coll")
    return pa.table({
        "gtid": pa.array(gtids, pa.int64()),
        "tx_id": pa.array(gtids, pa.int64()),   # singleton tx per event
        "seq_in_tx": pa.array(np.zeros(n, np.int32), pa.int32()),
        "tx_events": pa.array(np.ones(n, np.int32), pa.int32()),
        "server_id": pa.nulls(n, pa.int64()),   # not in the format
        "db": (db.cast(pa.string()) if db is not None
               else pa.nulls(n, pa.string())),
        "table": (coll.cast(pa.string()) if coll is not None
                  else pa.nulls(n, pa.string())),
        "op": op,
        "key": key,
        "before": before,
        "after": after,
    }, schema=schema)


def read_mongo(paths: list[str],
               payload: pa.Schema = SEQ_SCHEMA) -> "ray.data.Dataset":
    """A ``ray.data.Dataset`` of engine change events decoded from a
    recorded change-stream dump — fully streaming, no side pass (the
    stream's committed-only contract makes every event its own
    atomicity unit)."""
    import ray.data

    def decode(t: pa.Table) -> pa.Table:
        return decode_mongo(t, payload=payload)

    return ray.data.read_json(
        paths, override_num_blocks=max(1, len(paths))).map_batches(
        decode, batch_format="pyarrow", zero_copy_batch=True)


# ================================== schema inference + file pruning

def infer_payload_mongo(paths: list[str], sample_files: int = 2) -> pa.Schema:
    """Payload schema from the dump itself: union of ``fullDocument``
    shapes across the head and tail sample files (additive evolution
    means early files may lack late columns).  Integer-typed JSON
    numbers stay int64; the key column is whatever field matches
    ``documentKey._id`` by value position — by convention the payload's
    FIRST field."""
    from rookray.schema import unify_additive
    picks = list(dict.fromkeys([*paths[:sample_files],
                                *paths[-sample_files:]]))
    schemas = []
    for p in picks:
        with open(p, "rb") as f:
            t = _json_table(f.read())
        if "fullDocument" not in t.schema.names:
            continue
        c = t.column("fullDocument").combine_chunks()
        if pa.types.is_struct(c.type):
            # a field that is all-null within one sampled file infers
            # as the null type — no type information, drop it from that
            # file's vote (another sample or the additive union types it)
            typed = [f for f in c.type if not pa.types.is_null(f.type)]
            if typed:
                schemas.append(pa.schema(typed))
    if not schemas:
        raise ValueError("no fullDocument in the sampled dump files — "
                         "cannot infer a payload schema")
    return unify_additive(schemas)


def mongo_first_coordinate(path: str) -> int | None:
    """First mutation's engine coordinate from a dump file's head."""
    with open(path) as f:
        for i, line in enumerate(f):
            if i > 64:
                break
            try:
                rec = json.loads(line)
            except ValueError:
                return None
            if rec.get("operationType") not in ("insert", "update",
                                                "replace", "delete"):
                continue
            data = (rec.get("_id") or {}).get("_data")
            if isinstance(data, str) and 0 < len(data) <= 16:
                try:
                    return int(data, 16)
                except ValueError:
                    pass
            ct = ((rec.get("clusterTime") or {}).get("$timestamp") or {})
            if ct.get("t") is not None:
                return (int(ct["t"]) << _CT_ORD_BITS) | int(ct.get("i", 0))
            return None
    return None


def mongo_files_above(paths: list[str], watermark: int) -> list[str]:
    """Checkpoint resume for recorded change-stream dumps — the same
    successor-based pruning as the other six adapters."""
    from rookray.source import segments_above
    return segments_above(paths, watermark,
                          [mongo_first_coordinate(p) for p in paths])


# ========================================================== live feed

class MongoStreamServer(ChangeStreamServer):
    """Test producer: frames carry raw change-stream JSON-lines."""

    def push_file(self, path: str) -> None:
        with open(path, "rb") as f:
            self._q.put(f.read())


def stream_mongo_socket(host: str, port: int,
                        payload: pa.Schema = SEQ_SCHEMA,
                        connect_timeout_s: float = 10.0):
    """Unbounded Dataset of engine change events from a live
    change-stream socket feed — no side state at all: the stream's
    committed-only contract means each frame decodes stand-alone."""
    import ray.data

    from rookray.wirejson import _JsonSocketDatasource

    def decode(t: pa.Table) -> pa.Table:
        return decode_mongo(t, payload=payload)

    return ray.data.read_datasource(
        _JsonSocketDatasource(host, port, decode, "MongoSocketStream",
                              connect_timeout_s),
        override_num_blocks=1)
