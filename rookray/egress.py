"""CDC egress: publish a lake changefeed as a standard wire-format
dump (Debezium-JSON) that any downstream CDC consumer — including a
second rookray lake — can ingest.

rook itself is CDC *in* only (MySQLReplicationStream.java:161-179
consumes a binlog; nothing publishes).  The lake already computes CDC
*out* — ``LakeTable.changes_between`` (the Delta-CDF / Hudi
incremental-query analog) — and this module closes the loop by
serializing that diff in the same public envelope ``rookray.wire``
decodes, turning the lake into a CDC *relay*: database → lake →
(egress dump / topic) → downstream caches, indexes, other lakes.

Shape and coordinates:

- One envelope per changed key: ``c`` (insert — after only), ``u``
  (update — full before/after images), ``d`` (delete — before only).
- Every coordinate in a dump lies inside the source span
  ``(watermark_a, watermark_b]`` so CONSECUTIVE dumps compose exactly
  like the source lake's own epochs (dump N+1's coordinates are all
  above dump N's, and above the downstream floor dump N committed):
  inserts/updates carry the winning row's ``gtid_b``; deletes — whose
  deleting event's gtid is definitionally absent from snapshot B —
  carry ``watermark_b`` itself, which sorts after the deleted
  version's ``gtid_a`` (≤ watermark_a by construction).  Coordinates
  may therefore COLLIDE across keys (several deletes share
  ``watermark_b``); the engine's merge is per-key and its watermark
  filters are range-based, so collisions are harmless — but
  transaction identity must stay unique ACROSS DUMPS (a relay
  directory accumulates dumps that downstream ingests in one pass),
  so it rides separately: ``gtid_b`` for inserts/updates,
  ``-(gtid_a + 2)`` for deletes — a disjoint negative id space,
  because dump N+1's delete of a key re-surfaces the very ``gtid_b``
  dump N published for it.
- Every envelope is its own single-event transaction (a snapshot diff
  carries exactly one event per key; there is no transaction
  structure to restate), so ``read_debezium``'s topic-less counting
  pass closes every watermark immediately.
- Files are named by their gtid range and written temp-then-rename:
  a re-executed Ray task rewrites the same bytes to the same name —
  idempotent, resumable output.

The per-envelope JSON serialization is per-row by nature (JSON-lines
IS a row format); it runs data-parallel inside ``map_batches`` tasks,
one output file per block.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

__all__ = ["write_debezium", "write_avro", "write_mongo",
           "write_dynamo", "write_binlog", "write_pgwal",
           "write_maxwell", "write_canal",
           "export_changefeed", "export_snapshot", "replicate", "clone",
           "relay_files", "compact_relay", "RELAY_MANIFEST"]

#: "read" is Debezium's snapshot-read op (`r`): what a compacted
#: relay's live-state generation emits — consumers decode c and r
#: identically (both are INSERTs), but the marker tells them the row
#: is a snapshot restatement, not a fresh change.
_OP = {"insert": "c", "read": "r", "update": "u", "delete": "d"}

#: decode re-packs ``gtid = file_seq << 40 | pos`` (binlog positions
#: are < 2^40); an egress coordinate can be ANY int64 (source lakes
#: fed by binlog/pgwal already pack file bits into their gtids), so
#: the high bits ride in the emitted binlog FILE NAME and the low 40
#: in ``pos`` — the decoded gtid is then exactly the emitted
#: coordinate, monotone across dumps for every source gtid space.
_POS_BITS = 40


def _coords(g: int) -> tuple[str, int]:
    return (f"rookray-egress.{g >> _POS_BITS:06d}",
            g & ((1 << _POS_BITS) - 1))


def _image(row: dict, key: str, names: list[str], suf: str) -> dict:
    # merge key FIRST: downstream payload inference
    # (wire.infer_payload) takes the first-seen field as the key
    out = {key: row[key]}
    out.update({n: row[f"{n}_{suf}"] for n in names})
    return out


def _write_dump(feed: "ray.data.Dataset", out_dir: str,
                key_column: str, value_columns: list[str],
                delete_pos: int | None, serialize, ext: str,
                db: str, table: str, server_id: int,
                server_name: str, make_record=None,
                prefix: str = "data",
                delete_pos_col: str | None = None) -> dict:
    """Shared egress writer: env-dict construction, coordinate/tx
    identity rules, and idempotent file naming live ONCE; ``serialize``
    (env dicts → bytes) picks the wire dialect.  A dialect whose record
    is NOT a Debezium envelope (the change-stream shape) passes
    ``make_record(change, row) -> (position, record)`` and owns its
    own coordinate rules.  ``delete_pos_col`` names a per-row delete
    coordinate column instead of the single ``delete_pos`` constant —
    compaction re-emits tombstones at their ORIGINAL coordinates (one
    constant would lift old deletes above newer inserts)."""
    from rookray.wire import make_envelope

    os.makedirs(out_dir, exist_ok=True)
    names = list(value_columns)

    def encode(batch: pa.Table) -> pa.Table:
        summary = pa.schema([("file", pa.string()),
                             ("events", pa.int64())])
        if batch.num_rows == 0:
            return summary.empty_table()
        rows = batch.to_pylist()
        envs, positions = [], []
        for r in rows:
            change = r["change"]
            if make_record is not None:
                g, rec = make_record(change, r)
                positions.append(g)
                envs.append(rec)
                continue
            if change == "delete":
                # transaction identity must be unique across EVERY dump
                # a relay directory accumulates, not just within one:
                # dump N's insert/update rides tx = gtid_b = G, and if
                # that key is deleted later the delete's gtid_a IS that
                # same G — so deletes map into a disjoint NEGATIVE id
                # space (-(gtid_a+2), never the -1 no-tx sentinel).  A
                # version coordinate is deleted at most once, so the
                # mapping stays unique across dumps too, and the
                # topic-less counting pass always sees singletons.
                g = (int(r[delete_pos_col]) if delete_pos_col
                     else delete_pos)
                tx = -(int(r["gtid_a"]) + 2)
            else:
                g = tx = int(r["gtid_b"])
            positions.append(g)
            binlog_file, pos = _coords(g)
            envs.append(make_envelope(
                _OP[change],
                (None if change in ("insert", "read")
                 else _image(r, key_column, names, "a")),
                (None if change == "delete"
                 else _image(r, key_column, names, "b")),
                db, table, server_id, binlog_file, pos,
                str(tx), 1, connector="rookray",
                server_name=server_name))
        lo, hi = min(positions), max(positions)
        body = serialize(envs)
        import hashlib
        digest = hashlib.md5(body).hexdigest()[:8]
        # range + content digest: unique across blocks even when two
        # partitions' diff ranges coincide, stable across task retries
        name = f"{prefix}-{lo:016x}-{hi:016x}-{digest}.{ext}"
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(body)
        os.replace(tmp, path)  # idempotent under Ray task re-execution
        return pa.table({"file": pa.array([name]),
                         "events": pa.array([len(rows)], pa.int64())},
                        schema=summary)

    parts = feed.map_batches(encode, batch_format="pyarrow").take_all()
    return {
        "data_files": sorted(os.path.join(out_dir, r["file"])
                             for r in parts),
        "events": int(sum(r["events"] for r in parts)),
    }


def write_debezium(feed: "ray.data.Dataset", out_dir: str,
                   key_column: str, value_columns: list[str],
                   delete_pos: int | None,
                   db: str = "rook", table: str = "sequences",
                   server_id: int = 0,
                   server_name: str = "rookray",
                   prefix: str = "data",
                   delete_pos_col: str | None = None) -> dict:
    """Serialize a ``changes_between`` feed (requested with every
    payload value column) into a Debezium-JSON dump under ``out_dir``.
    ``delete_pos`` is the coordinate every delete envelope carries —
    snapshot B's watermark, i.e. ≥ the feed's max ``gtid_b`` and > any
    ``gtid_a`` — see the module header for why collisions are safe and
    how transaction identity stays unique.  Returns
    ``{"data_files", "events"}``."""

    def to_jsonl(envs: list[dict]) -> bytes:
        return ("\n".join(json.dumps(e, separators=(",", ":"))
                          for e in envs) + "\n").encode()

    return _write_dump(feed, out_dir, key_column, value_columns,
                       delete_pos, to_jsonl, "jsonl",
                       db, table, server_id, server_name,
                       prefix=prefix, delete_pos_col=delete_pos_col)


def write_avro(feed: "ray.data.Dataset", out_dir: str,
               key_column: str, value_columns: list[str],
               delete_pos: int | None, payload: pa.Schema,
               db: str = "rook", table: str = "sequences",
               server_id: int = 0,
               server_name: str = "rookray",
               prefix: str = "data",
               delete_pos_col: str | None = None) -> dict:
    """Debezium egress over the Confluent schema-registry Avro wire
    format (``rookray.wireavro``): same envelopes, coordinates and
    transaction-identity rules as :func:`write_debezium`, serialized
    as length-framed magic+id+Avro-binary messages, with the registry
    snapshot (one envelope schema — the lake's committed payload IS
    the catalog) written alongside as ``registry.json``."""
    from rookray.wireavro import _Codec, _frame, envelope_avro_schema

    os.makedirs(out_dir, exist_ok=True)
    schema = envelope_avro_schema(payload)
    reg_path = os.path.join(out_dir, "registry.json")
    # a relay directory ACCUMULATES dumps across exports, and the lake
    # schema can have widened between them — messages framed under an
    # id whose registered schema no longer matches would decode into
    # garbage (or walk off the record), so this export's schema gets
    # its own id: reuse the id that registered the IDENTICAL schema,
    # else register a fresh one — exactly what a connector's registry
    # client does after DDL
    registry: dict[str, dict] = {}
    if os.path.exists(reg_path):
        with open(reg_path) as f:
            registry = json.load(f)
    schema_id = next((int(i) for i, s in registry.items() if s == schema),
                     None)
    if schema_id is None:
        schema_id = max((int(i) for i in registry), default=0) + 1
        registry[str(schema_id)] = schema
        tmp = reg_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(registry, f)
        os.replace(tmp, reg_path)

    codec_cell: list = []  # compiled once per task process, lazily

    def to_avro(envs: list[dict]) -> bytes:
        if not codec_cell:
            codec_cell.append(_Codec(schema))
        codec = codec_cell[0]
        return b"".join(_frame(schema_id, codec.encode(e["payload"]))
                        for e in envs)

    d = _write_dump(feed, out_dir, key_column, value_columns,
                    delete_pos, to_avro, "avrowire",
                    db, table, server_id, server_name,
                    prefix=prefix, delete_pos_col=delete_pos_col)
    d["registry"] = reg_path
    return d


#: a change stream has no snapshot-read op — a snapshot restatement
#: (export_snapshot) simply rides as an insert, which decodes the same
_MONGO_OP = {"insert": "insert", "read": "insert",
             "update": "update", "delete": "delete"}


def _shifted_coord_fn(feed: "ray.data.Dataset", key_column: str,
                      wm_a: int, wm_b: int):
    """Shared token machinery for the record-atomic dialects whose
    envelope has NO transaction-identity channel (change stream,
    DynamoDB stream): every emitted record needs a GLOBALLY UNIQUE,
    order-preserving coordinate, so tokens live in a 1-bit-shifted
    space — insert/update = ``gtid_b << 1`` (even, one winner per
    event), delete = ``((wm_a + 1 + rank) << 1) | 1`` (odd, ``rank``
    the delete's position in the dump's (gtid_a, key)-sorted delete
    set; each delete is caused by a distinct source event in
    ``(wm_a, wm_b]``, so delete tokens stay inside
    ``(wm_a << 1, (wm_b << 1) | 1]`` and consecutive dumps compose).

    Materializes the feed (the rank pass and the dump write share one
    diff computation) and returns ``(feed, coord)`` where
    ``coord(change, row) -> int``."""
    import ray
    import pyarrow.compute as pc

    if wm_b >= 1 << 61:
        raise ValueError("source coordinates >= 2^61 cannot ride the "
                         "shifted record-atomic token space")
    feed = feed.materialize()

    def _delete_keys(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("change"), "delete"))
        return t.select([key_column, "gtid_a"])

    dels = feed.map_batches(_delete_keys,
                            batch_format="pyarrow").take_all()
    dels.sort(key=lambda r: (int(r["gtid_a"]), str(r[key_column])))
    ranks = {r[key_column]: i for i, r in enumerate(dels)}
    if len(ranks) > max(0, wm_b - wm_a):
        raise ValueError(
            f"{len(ranks)} deletes do not fit the source span "
            f"({wm_a}, {wm_b}] — the diff endpoints are inconsistent")
    ranks_ref = ray.put(ranks)
    cell: list = []  # broadcast dict resolved once per task process

    def coord(change: str, r: dict) -> int:
        if change == "delete":
            if not cell:
                cell.append(ray.get(ranks_ref))
            return ((wm_a + 1 + cell[0][r[key_column]]) << 1) | 1
        return int(r["gtid_b"]) << 1

    return feed, coord


def write_mongo(feed: "ray.data.Dataset", out_dir: str,
                key_column: str, value_columns: list[str],
                wm_a: int, wm_b: int,
                db: str = "rook", table: str = "sequences") -> dict:
    """Egress as a recorded MongoDB change stream (``rookray.wiremongo``
    decodes it).  The change-stream envelope has NO transaction-identity
    channel — ``decode_mongo`` derives both the coordinate and the
    (singleton) transaction identity from the resume token — so unlike
    the Debezium dialects, every emitted event needs a GLOBALLY UNIQUE
    token (a real stream has this for free: the token encodes each
    event's oplog position).  Tokens therefore live in a 1-bit-shifted
    coordinate space, the same move as canal's record-atomic
    ``id<<12|row``:

    - insert/update: ``gtid_b << 1`` — even, unique (one winner per
      event), monotone with the source order;
    - delete: ``((wm_a + 1 + rank) << 1) | 1`` — odd (disjoint from
      every real-event token by parity), ``rank`` the delete's position
      in the dump's (gtid_a, key)-sorted delete set.  Each delete is
      caused by a distinct source event in ``(wm_a, wm_b]``, so
      ``n_deletes <= wm_b - wm_a`` always and delete tokens stay inside
      ``(wm_a << 1, (wm_b << 1) | 1]`` — consecutive dumps compose
      exactly as the Debezium dialects' do (dump N+1's every token
      exceeds dump N's every token).

    The downstream floor lives in this shifted space (a fresh relay
    lake bootstraps at watermark 0, so nothing converts).  Computing
    delete ranks takes one driver-side pass over the DELETE subset of
    the diff (keys + gtid_a only — never the images); the feed is
    materialized once so the rank pass and the dump write share one
    diff computation (:func:`_shifted_coord_fn`)."""
    feed, coord = _shifted_coord_fn(feed, key_column, wm_a, wm_b)
    names = list(value_columns)

    def make_record(change: str, r: dict):
        g = coord(change, r)
        rec = {
            "_id": {"_data": f"{g:016x}"},
            "operationType": _MONGO_OP[change],
            "clusterTime": {"$timestamp": {"t": 1600000000 + (g >> 1) // 1000,
                                           "i": (g >> 1) % 1000}},
            "ns": {"db": db, "coll": table},
            "documentKey": {"_id": r[key_column]},
        }
        if change != "delete":
            rec["fullDocument"] = _image(r, key_column, names, "b")
        if change not in ("insert", "read"):
            # pre-images enabled: full before image (reads have none)
            rec["fullDocumentBeforeChange"] = _image(r, key_column,
                                                     names, "a")
        return g, rec

    def to_jsonl(recs: list[dict]) -> bytes:
        return ("\n".join(json.dumps(e, separators=(",", ":"))
                          for e in recs) + "\n").encode()

    return _write_dump(feed, out_dir, key_column, value_columns,
                       0, to_jsonl, "jsonl", db, table, 0, "rookray",
                       make_record=make_record, prefix="mongo")


#: streams have no snapshot-read event either — see _MONGO_OP
_DDB_OP = {"insert": "INSERT", "read": "INSERT",
           "update": "MODIFY", "delete": "REMOVE"}


def write_dynamo(feed: "ray.data.Dataset", out_dir: str,
                 key_column: str, value_columns: list[str],
                 wm_a: int, wm_b: int,
                 table: str = "sequences",
                 sequence_base: int = 10 ** 20) -> dict:
    """Egress as a recorded DynamoDB Streams dump
    (``rookray.wiredynamo`` decodes it).  Stream records carry no
    transaction-identity channel either — ``decode_dynamo`` derives
    the coordinate and the (singleton) transaction identity from the
    ``SequenceNumber`` — so tokens ride the same 1-bit-shifted space
    as the change-stream dialect (:func:`_shifted_coord_fn`), offset
    by ``sequence_base`` into realistic 21-digit decimal numbers (the
    decoder's probe-and-rebase path recovers the shifted coordinate
    exactly).  Images are typed AttributeValue wrappers,
    NEW_AND_OLD_IMAGES view — full before/after, what a downstream
    retract-and-re-add consumer needs."""
    from rookray.wiredynamo import _image as ddb_image

    feed, coord = _shifted_coord_fn(feed, key_column, wm_a, wm_b)
    names = list(value_columns)
    arn = (f"arn:aws:dynamodb:us-east-1:123456789012:table/{table}"
           "/stream/rookray-egress")

    def make_record(change: str, r: dict):
        g = coord(change, r)
        dyn = {
            "ApproximateCreationDateTime": 1600000000 + (g >> 1) // 1000,
            "Keys": {key_column: ddb_image({key_column: r[key_column]})
                     [key_column]},
            "SequenceNumber": str(sequence_base + g),
            "SizeBytes": 48,
            "StreamViewType": "NEW_AND_OLD_IMAGES",
        }
        if change != "delete":
            dyn["NewImage"] = ddb_image(_image(r, key_column, names, "b"))
        if change not in ("insert", "read"):   # reads have no before
            dyn["OldImage"] = ddb_image(_image(r, key_column, names, "a"))
        rec = {"eventID": f"{g:032x}", "eventName": _DDB_OP[change],
               "eventVersion": "1.1", "eventSource": "aws:dynamodb",
               "awsRegion": "us-east-1", "dynamodb": dyn,
               "eventSourceARN": arn}
        return g, rec

    def to_jsonl(recs: list[dict]) -> bytes:
        return ("\n".join(json.dumps(e, separators=(",", ":"))
                          for e in recs) + "\n").encode()

    return _write_dump(feed, out_dir, key_column, value_columns,
                       0, to_jsonl, "jsonl", "rook", table, 0, "rookray",
                       make_record=make_record, prefix="dynamo")


# ---------------------------------------------------------------------------
# Binary egress dialects: the lake relayed AS a MySQL binlog / Postgres
# pgoutput stream, through the same tested encoders the ingest side
# decodes (rookray.binlog.binlog_dump / rookray.pgoutput.pgwal_dump).
# ---------------------------------------------------------------------------

def _changefeed_to_events(t: pa.Table, key_column: str,
                          value_columns: list[str], payload: pa.Schema,
                          delete_pos: int, db: str, table: str,
                          server_id: int) -> pa.Table:
    """One changefeed batch → the engine's change-event schema, shaped
    for the binary encoders.  Vectorized: op codes via index_in, the
    before/after images as masked struct arrays.  Transaction identity
    rides the 2g/2g+1 split (upserts ``2·gtid_b``, deletes
    ``2·gtid_a + 1``) — positive, disjoint, and unique across every
    dump a relay directory accumulates (same argument as the
    ``-(gtid_a+2)`` space on the JSON side; binlog gno is int64 so no
    truncation, and pgoutput's 32-bit xid is REASSIGNED per file at
    encode time).  Delete coordinates ride ``delete_pos`` (snapshot
    B's watermark), upserts their winning ``gtid_b`` — pgoutput frames
    each row's LSN with exactly this value, so that dialect preserves
    the lake's coordinate space on the wire."""
    import numpy as np
    import pyarrow.compute as pc

    from rookray.schema import (OP_DELETE, OP_INSERT, OP_UPDATE,
                                change_event_schema)

    schema = change_event_schema(payload)
    n = t.num_rows
    if n == 0:
        return schema.empty_table()
    change = t.column("change").combine_chunks()
    code = pc.index_in(change, value_set=pa.array(
        ["insert", "read", "update", "delete"]))
    if code.null_count:
        raise ValueError("changefeed batch with an unknown change kind")
    ci = code.to_numpy(zero_copy_only=False).astype(np.int64)
    op = np.where(ci <= 1, OP_INSERT,
                  np.where(ci == 2, OP_UPDATE, OP_DELETE)).astype(np.int8)
    is_del = op == OP_DELETE
    is_ins = op == OP_INSERT
    ga = t.column("gtid_a").to_numpy(zero_copy_only=False).astype(np.int64)
    gb = t.column("gtid_b").to_numpy(zero_copy_only=False).astype(np.int64)
    tx = np.where(is_del, 2 * ga + 1, 2 * gb)
    gtid = np.where(is_del, np.int64(delete_pos), gb)

    keys = t.column(key_column).combine_chunks()

    def image(suffix: str, absent: "np.ndarray") -> pa.StructArray:
        arrs = [keys.cast(payload.field(key_column).type)]
        for c in value_columns:
            arr = t.column(f"{c}_{suffix}").combine_chunks()
            want = payload.field(c).type
            if arr.type != want:
                arr = arr.cast(want)
            arrs.append(arr)
        return pa.StructArray.from_arrays(
            arrs, fields=list(payload), mask=pa.array(absent))

    return pa.table({
        "gtid": pa.array(gtid, pa.int64()),
        "tx_id": pa.array(tx, pa.int64()),
        "seq_in_tx": pa.array(np.zeros(n, np.int32), pa.int32()),
        "tx_events": pa.array(np.ones(n, np.int32), pa.int32()),
        "server_id": pa.array(np.full(n, server_id, np.int64)),
        "db": pa.array([db] * n, pa.string()),
        "table": pa.array([table] * n, pa.string()),
        "op": pa.array(op, pa.int8()),
        "key": keys.cast(pa.string()),
        "before": image("a", is_ins),
        "after": image("b", is_del),
    }, schema=schema)


#: pgoutput xids are 32-bit, so egress reassigns them per encoded file
#: as ``file_number << 12 | chunk`` with ≤ 2^12 rows per transaction —
#: unique across the whole relay directory for < 2^20 files.
_PG_XID_ROW_BITS = 12


def _encode_binary_part(block: pa.Table, out_dir: str, number: int,
                        fmt: str) -> dict | None:
    """Plain Ray task: one shaped event block → one binlog/pgwal file
    in ``out_dir``, numbered ``number``.  Encodes into a hidden
    staging directory and renames in — idempotent under task
    re-execution, and a torn file never carries a final name."""
    import shutil
    import tempfile

    if block.num_rows == 0:
        return None

    def retx(values) -> pa.Table:
        return block.set_column(
            block.schema.get_field_index("tx_id"), "tx_id",
            pa.array(values, pa.int64()))

    stage = tempfile.mkdtemp(prefix=".egress-enc-", dir=out_dir)
    try:
        if fmt == "binlog":
            from rookray.binlog import binlog_dump
            d = binlog_dump(block, stage, n_files=1,
                            start_number=number)
        elif fmt == "pgoutput":
            import numpy as np

            from rookray.pgoutput import pgwal_dump
            # per-file xid reassignment (see _PG_XID_ROW_BITS); rows
            # stay in block order so same-xid rows are consecutive,
            # which is all the encoder's tx grouping needs
            n = block.num_rows
            if n >= (1 << (32 - _PG_XID_ROW_BITS)):
                raise ValueError("block too large for per-file xid space")
            xid = ((number << _PG_XID_ROW_BITS)
                   | (np.arange(n, dtype=np.int64)
                      >> _PG_XID_ROW_BITS)).astype(np.int64)
            block = retx(xid)
            d = pgwal_dump(block, stage, n_files=1,
                           start_number=number)
        elif fmt == "maxwell":
            import numpy as np

            from rookray.wirejson import maxwell_dump
            # singleton per-row xids in a per-file space: unique across
            # dumps AND re-publishes (coordinate preservation makes a
            # re-published span idempotent, but only if its xids never
            # collide with the first publish's)
            n = block.num_rows
            if n >= (1 << 32):
                raise ValueError("block too large for per-file xid space")
            block = retx((np.int64(number) << 32)
                         + np.arange(n, dtype=np.int64))
            d = maxwell_dump(block, stage, n_files=1,
                             start_number=number, split_positions=True)
        else:  # canal
            from rookray.wirejson import canal_dump
            # decoded coordinate = record id << 12 | row; the id space
            # is partitioned per file (number << 32 | local record),
            # so ids stay unique and monotone across the relay — the
            # id must fit 51 bits, bounding the directory at 2^19 files
            if number >= (1 << 19):
                raise ValueError(
                    "canal relay directory exceeded 2^19 files — the "
                    "record-id coordinate space (id << 12) is full; "
                    "start a fresh out dir")
            # +1: record id 0 would decode to coordinate 0, which a
            # watermark-0 bootstrap filters as already-applied
            d = canal_dump(block, stage, n_files=1,
                           start_number=number,
                           id_base=(number << 32) + 1)
        final = []
        for p in d["files"]:
            dst = os.path.join(out_dir, os.path.basename(p))
            os.replace(p, dst)
            final.append(dst)
        return {"files": final, "events": block.num_rows}
    finally:
        shutil.rmtree(stage, ignore_errors=True)


_BINARY_GLOBS = {"binlog": ("rookray-bin.*", 1),
                 "pgoutput": ("pgwal-*.bin", 0),
                 "maxwell": ("maxwell-*.jsonl", 0),
                 "canal": ("canal-*.jsonl", 0)}


def _next_file_number(out_dir: str, fmt: str) -> int:
    import glob as _glob
    import re
    pat, lo = _BINARY_GLOBS[fmt]
    nums = []
    for p in _glob.glob(os.path.join(out_dir, pat)):
        m = re.search(r"(\d+)(?:\.bin|\.jsonl)?$", os.path.basename(p))
        if m:
            nums.append(int(m.group(1)))
    return (max(nums) + 1) if nums else lo


def _write_binary(feed: "ray.data.Dataset", out_dir: str,
                  key_column: str, value_columns: list[str],
                  payload: pa.Schema, delete_pos: int,
                  db: str, table: str, server_id: int,
                  fmt: str) -> dict:
    """Shared binary-dialect egress: shape the changefeed into engine
    events (distributed, vectorized), then encode one wire file per
    block in parallel plain Ray tasks, file numbers assigned by the
    driver so they continue monotonically across every dump the relay
    directory accumulates.

    Ordering contract per dialect:
    - ``pgoutput`` preserves the lake's coordinates exactly (each
      row's LSN = its gtid_b, deletes at the span watermark), so dumps
      compose by COORDINATE like the JSON dialects.
    - ``binlog`` coordinates are positional (file_seq << 44 | pos |
      row), so cross-dump LWW order is carried by the FILE NUMBERING
      alone: a key appears at most once per dump, and every file of
      dump N+1 is numbered above every file of dump N.  Publishing an
      OLDER span into a relay directory that already holds a newer one
      would therefore invert LWW — ``export_changefeed`` refuses it
      via the ``_BINLOG_EGRESS_STATE.json`` span floor."""
    import ray

    os.makedirs(out_dir, exist_ok=True)

    def shape(t: pa.Table) -> pa.Table:
        return _changefeed_to_events(t, key_column, value_columns,
                                     payload, delete_pos, db, table,
                                     server_id)

    shaped = feed.map_batches(shape, batch_format="pyarrow").materialize()
    refs = shaped.to_arrow_refs()
    base = _next_file_number(out_dir, fmt)
    task = ray.remote(num_cpus=1)(_encode_binary_part)
    outs = [o for o in ray.get(
        [task.remote(r, out_dir, base + i, fmt)
         for i, r in enumerate(refs)]) if o]
    return {
        "data_files": sorted(p for o in outs for p in o["files"]),
        "events": int(sum(o["events"] for o in outs)),
    }


def write_binlog(feed: "ray.data.Dataset", out_dir: str,
                 key_column: str, value_columns: list[str],
                 delete_pos: int, payload: pa.Schema,
                 db: str = "rook", table: str = "sequences",
                 server_id: int = 1) -> dict:
    """Egress over genuine MySQL binlog-v4 binary files — the full
    circle of rook's own wire format (MySQLReplicationStream.java
    consumes exactly this): any binlog-speaking consumer, including
    ``rookray.binlog.read_binlog``, can tail the relay directory.
    Each changed key rides its own single-event transaction (gno =
    the 2g/2g+1 identity); coordinates are positional, so cross-dump
    order is the file numbering — see :func:`_write_binary`."""
    return _write_binary(feed, out_dir, key_column, value_columns,
                         payload, delete_pos, db, table, server_id,
                         "binlog")


def write_pgwal(feed: "ray.data.Dataset", out_dir: str,
                key_column: str, value_columns: list[str],
                delete_pos: int, payload: pa.Schema,
                db: str = "rook", table: str = "sequences",
                server_id: int = 1) -> dict:
    """Egress over a recorded PostgreSQL logical-replication stream
    (pgoutput XLogData segments): every row frames its LSN with the
    lake's own coordinate (upserts ``gtid_b``, deletes the span
    watermark), so this dialect preserves the coordinate space on the
    wire and dumps compose exactly like the Debezium one; per-file
    32-bit xids are reassigned at encode time (unique across the
    relay for < 2^20 files)."""
    return _write_binary(feed, out_dir, key_column, value_columns,
                         payload, delete_pos, db, table, server_id,
                         "pgoutput")


def write_maxwell(feed: "ray.data.Dataset", out_dir: str,
                  key_column: str, value_columns: list[str],
                  delete_pos: int, payload: pa.Schema,
                  db: str = "rook", table: str = "sequences",
                  server_id: int = 1) -> dict:
    """Egress over the Maxwell JSON envelope: each row's
    ``position`` carries the lake's own coordinate (gtid bits above
    2^40 ride in the position's binlog file name, the same split the
    Debezium dialect uses), so this dialect is coordinate-preserving
    and re-publish-idempotent; xids are singleton and per-file
    (``number << 32 | row``), never colliding across dumps or
    re-publishes."""
    return _write_binary(feed, out_dir, key_column, value_columns,
                         payload, delete_pos, db, table, server_id,
                         "maxwell")


def write_canal(feed: "ray.data.Dataset", out_dir: str,
                key_column: str, value_columns: list[str],
                delete_pos: int, payload: pa.Schema,
                db: str = "rook", table: str = "sequences",
                server_id: int = 1) -> dict:
    """Egress over Canal's FlatMessage envelope.  The flat format has
    no coordinate channel at all — the decoded coordinate is the
    record id (``id << 12 | row``) — so egress partitions the id
    space per file and cross-dump LWW order is the file numbering
    alone, exactly the binlog dialect's contract: forward-only
    (``export_changefeed`` guards re-publishes), fresh relay targets
    only."""
    return _write_binary(feed, out_dir, key_column, value_columns,
                         payload, delete_pos, db, table, server_id,
                         "canal")


def replicate(src, dst, epoch_a: int, epoch_b: int) -> dict:
    """In-cluster lake→lake mirror: the changefeed between two source
    snapshots shaped into engine change events and applied DIRECTLY to
    the downstream lake — Arrow end to end, no wire dialect, no
    serialization.  The fast path when both lakes live in one cluster
    (the wire dialects exist for crossing a process/network boundary).

    Coordinate-preserving: upserts ride their winning ``gtid_b``,
    deletes the span watermark, so consecutive replications compose
    exactly like the source's own epochs, re-replicating an
    overlapping span is free (the downstream watermark skips it), and
    the downstream may share the source's gtid space.  Transaction
    identity rides the same 2g/2g+1 split as the binary egress
    dialects — unique across every span ever replicated.

    The downstream must already hold a state consistent as of
    ``epoch_a`` (a :func:`clone` bootstrap, or prior replications up
    to that epoch)."""
    payload = src.payload_schema()
    key = payload.names[0]
    value_cols = [n for n in payload.names if n != key]
    mb = src._snapshot_manifest(epoch_b)
    wm_b = mb["closed_watermark"]
    if wm_b is None:
        wm_b = mb["max_gtid_seen"]
    table = dst.config.table

    def shape(t: pa.Table) -> pa.Table:
        return _changefeed_to_events(t, key, value_cols, payload,
                                     int(wm_b), "rook", table, 0)

    feed = src.changes_between(epoch_a, epoch_b, columns=value_cols) \
              .map_batches(shape, batch_format="pyarrow")
    # emptiness probe via limit pushdown — the diff itself stays lazy
    # (changes_between is partition-local parquet reads, cheap to
    # re-execute; materializing it would pin an O(diff) span in the
    # object store for nothing)
    if not feed.limit(1).take(1):
        # a legitimate empty diff (e.g. an epoch that applied no
        # events) — nothing to mirror
        res = {"events_applied": 0, "closed_watermark": None,
               "up_to_date": True}
    else:
        res = dst.apply(feed)
    res["from_epoch"], res["to_epoch"] = int(epoch_a), int(epoch_b)
    return res


def clone(src, dst, epoch: int | None = None) -> dict:
    """Bootstrap ``dst`` from ``src``'s committed state as of
    ``epoch`` (default: head) at the matching watermark — the
    initial-load half of lake→lake replication.  Subsequent
    :func:`replicate` calls (or wire-dialect ingest sharing the gtid
    space) continue from exactly that point."""
    m = src._snapshot_manifest(epoch)
    wm = m["closed_watermark"]
    if wm is None:
        wm = m["max_gtid_seen"]
    snapshot = src.read(as_of=epoch)
    res = dst.bootstrap(snapshot, gtid_watermark=int(wm))
    res["cloned_epoch"] = int(m["epoch"])
    return res


def _check_forward_only(out_dir: str, fmt: str,
                        wm_b: int) -> tuple[str, bool]:
    """Positional-coordinate dialects (binlog, canal) must publish
    strictly forward: an older span re-published into a directory
    already holding a newer dump would be numbered — and therefore
    LWW-ordered — above it.  The span floor lives in the out dir;
    it is RECORDED only after the dump fully lands (a failed export
    must not block its own retry).

    Returns ``(state_path, at_floor)``: ``at_floor`` means the span
    ends EXACTLY at the recorded floor — a zero-progress span (an
    epoch that applied nothing has an identical state, so its diff is
    empty; the relay is up to date) or a same-watermark snapshot
    restatement.  The caller decides: changefeed exports no-op,
    snapshot exports may publish (restating the identical state above
    the floor is LWW-neutral)."""
    state_path = os.path.join(out_dir,
                              f"_{fmt.upper()}_EGRESS_STATE.json")
    prev = None
    if os.path.exists(state_path):
        with open(state_path) as f:
            prev = int(json.load(f)["span_hi"])
    if prev is not None and int(wm_b) < prev:
        raise ValueError(
            f"{fmt} relay at {out_dir} already holds a dump up "
            f"to coordinate {prev}; re-publishing a span ending "
            f"at {wm_b} would sort ABOVE it in the positional "
            "coordinate space and invert LWW — publish forward "
            "only, or use a fresh out dir")
    return state_path, (prev is not None and int(wm_b) == prev)


def _record_span_floor(state_path: str, wm_b: int) -> None:
    with open(state_path + ".tmp", "w") as f:
        json.dump({"span_hi": int(wm_b)}, f)
    os.replace(state_path + ".tmp", state_path)


def export_changefeed(lake, epoch_a: int, epoch_b: int,
                      out_dir: str, server_name: str = "rookray",
                      fmt: str = "debezium") -> dict:
    """Egress the row-level changefeed between two committed snapshots
    as a wire-format dump: every payload column rides as full
    before/after images (what a downstream consumer needs to retract
    and re-add), coordinates as documented in the module header.
    ``fmt``: ``"debezium"`` (JSON-lines), ``"avro"`` (Confluent
    schema-registry framing), ``"mongo"`` (change-stream JSON-lines),
    ``"dynamo"`` (DynamoDB Streams records), ``"binlog"`` (genuine
    MySQL binlog-v4 binary — rook's own wire format, full circle),
    ``"pgoutput"`` (recorded PostgreSQL logical-replication segments,
    coordinate-preserving), ``"maxwell"`` (coordinate-preserving
    positions), or ``"canal"`` (FlatMessage, positional record ids) —
    every wire dialect the ingest side decodes.  mongo/dynamo ride the
    1-bit-shifted token space documented on :func:`_shifted_coord_fn`
    and binlog/canal positional ones, so those downstream lakes must
    be fresh relay targets, not ones sharing the source's gtid space.
    The dump replays
    into anything that speaks the envelope — including a second lake
    bootstrapped from snapshot A (``tests/test_egress.py`` proves dump
    ∘ apply == snapshot B for the dialects)."""
    payload = lake.payload_schema()
    key = payload.names[0]
    value_cols = [n for n in payload.names if n != key]
    feed = lake.changes_between(epoch_a, epoch_b, columns=value_cols)
    mb = lake._snapshot_manifest(epoch_b)
    # tx_atomic=False lakes commit closed_watermark as None — the max
    # gtid seen is always recorded and bounds every gtid_b equally
    wm_b = mb["closed_watermark"]
    if wm_b is None:
        wm_b = mb["max_gtid_seen"]
    if fmt == "avro":
        d = write_avro(feed, out_dir, key, value_cols,
                       delete_pos=int(wm_b), payload=payload,
                       db="rook", table=lake.config.table,
                       server_id=0, server_name=server_name)
    elif fmt in ("mongo", "dynamo"):
        ma = lake._snapshot_manifest(epoch_a)
        wm_a = ma["closed_watermark"]
        if wm_a is None:
            wm_a = ma["max_gtid_seen"]
        if fmt == "mongo":
            d = write_mongo(feed, out_dir, key, value_cols,
                            wm_a=int(wm_a), wm_b=int(wm_b),
                            db="rook", table=lake.config.table)
        else:
            d = write_dynamo(feed, out_dir, key, value_cols,
                             wm_a=int(wm_a), wm_b=int(wm_b),
                             table=lake.config.table)
    elif fmt in ("binlog", "canal"):
        # positional coordinate spaces — forward-only (see
        # _check_forward_only); floor recorded after the dump lands
        state_path, at_floor = _check_forward_only(out_dir, fmt,
                                                   int(wm_b))
        if at_floor:
            # zero-progress span: an epoch that applied nothing has an
            # identical state, so the diff is provably empty — the
            # relay is already up to date, nothing to publish
            d = {"data_files": [], "events": 0, "up_to_date": True}
        else:
            writer = write_binlog if fmt == "binlog" else write_canal
            d = writer(feed, out_dir, key, value_cols,
                       delete_pos=int(wm_b), payload=payload,
                       db="rook", table=lake.config.table)
            _record_span_floor(state_path, int(wm_b))
    elif fmt in ("pgoutput", "maxwell"):
        # coordinate-preserving dialects — re-publish idempotent
        writer = write_pgwal if fmt == "pgoutput" else write_maxwell
        d = writer(feed, out_dir, key, value_cols,
                   delete_pos=int(wm_b), payload=payload,
                   db="rook", table=lake.config.table)
    elif fmt == "debezium":
        d = write_debezium(feed, out_dir, key, value_cols,
                           delete_pos=int(wm_b),
                           db="rook", table=lake.config.table,
                           server_id=0, server_name=server_name)
    else:
        raise ValueError(f"unknown egress format {fmt!r}")
    d["payload"] = payload.names
    d["delete_pos"] = int(wm_b)
    return d


def _state_to_feed_fn(key: str, value_cols: list[str],
                      fschema: pa.Schema):
    """Batch fn: committed lake state (read with ``include_meta=True``
    so ``_gtid`` rides along) → changefeed-shaped snapshot-read rows —
    ``change = "read"`` (Debezium's snapshot op ``r``: decodes as an
    INSERT but marks the row as a state restatement), each key at its
    ORIGINAL winning coordinate, ``gtid_d = -1`` (no delete side).
    The shared kernel of relay compaction's snapshot generation and
    :func:`export_snapshot`."""

    def state_to_feed(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols: dict[str, pa.Array] = {
            "doc_id": t.column(key).combine_chunks(),
            "change": pa.array(["read"] * n, pa.string()),
            "gtid_a": pa.array([-1] * n, pa.int64()),
            "gtid_b": t.column("_gtid").combine_chunks().cast(
                pa.int64()),
        }
        for c in value_cols:
            typ = fschema.field(f"{c}_a").type
            if c in t.schema.names:
                arr = t.column(c).combine_chunks()
                if arr.type != typ:
                    arr = arr.cast(typ)
            else:
                # additive evolution: a historical (as_of) snapshot can
                # predate this column entirely — its value then is
                # genuinely null (the present side's nulls are real
                # nulls; -1 sentinels mark ABSENT sides only)
                arr = pa.nulls(n, typ)
            cols[f"{c}_b"] = arr
            cols[f"{c}_a"] = (pa.array([-1] * n, typ)
                              if pa.types.is_integer(typ)
                              else pa.nulls(n, typ))
        cols["gtid_d"] = pa.array([-1] * n, pa.int64())
        return pa.table({f.name: cols[f.name] for f in fschema},
                        schema=fschema)

    return state_to_feed


def export_snapshot(lake, out_dir: str, fmt: str = "debezium",
                    epoch: int | None = None,
                    server_name: str = "rookray") -> dict:
    """Debezium's *initial snapshot* analog, outbound: publish the
    lake's committed state as of ``epoch`` (default head) as a
    wire-format dump of snapshot-read envelopes (op ``r``) — one per
    live key, each at its ORIGINAL winning coordinate (the committed
    ``_gtid``), produced in ONE partition-local pass over the state
    (no shuffle, no history decode, nothing on the driver).

    The bootstrap half of wire-based replication: a fresh downstream
    ingests the dump with the ordinary reader and reaches exactly the
    source state, and ``export_changefeed`` dumps published afterwards
    from the same source compose on top — their coordinates all lie
    above the snapshot watermark this call records in its result (and,
    for a shared out dir, a single wholesale-glob ingest pass stays
    correct: snapshot rows carry ``tx = gtid_b`` and later deletes
    ``-(gtid_a + 2)``, disjoint as always).  Unlike :func:`clone` this
    crosses a process/network boundary; unlike replaying a relay kept
    since epoch 0 it costs O(state), not O(history).

    All eight dialects are supported.  binlog/canal out dirs stay
    forward-only (the snapshot records the span floor, so an older
    incremental span cannot be published above it); mongo/dynamo
    snapshot tokens ride the same 1-bit-shifted space as their
    incremental dumps (``wm_a = 0`` — a snapshot carries no deletes,
    so the delete-budget guard is vacuous) and compose identically."""
    from rookray.pipeline import _changefeed_schema

    payload = lake.payload_schema()
    key = payload.names[0]
    value_cols = [n for n in payload.names if n != key]
    types = {f.name: f.type for f in payload}
    fschema = _changefeed_schema(value_cols, types).append(
        pa.field("gtid_d", pa.int64()))
    m = lake._snapshot_manifest(epoch)
    wm = m["closed_watermark"]
    if wm is None:
        wm = m["max_gtid_seen"]
    wm = int(wm)
    mpath = os.path.join(out_dir, RELAY_MANIFEST)
    if os.path.exists(mpath):
        with open(mpath) as f:
            mfloor = int(json.load(f).get("floor", 0))
        if wm <= mfloor:
            raise ValueError(
                f"relay at {out_dir} is compacted with floor {mfloor} "
                f">= the snapshot watermark {wm}: the snapshot's files "
                "would sort below the manifest floor and be invisible "
                "to relay_files — the compacted generation already "
                "restates this state; bootstrap downstreams from the "
                "relay itself, or publish into a fresh out dir")
    feed = lake.read(include_meta=True, as_of=epoch).map_batches(
        _state_to_feed_fn(key, value_cols, fschema),
        batch_format="pyarrow")
    table = lake.config.table
    if fmt == "debezium":
        d = write_debezium(feed, out_dir, key, value_cols,
                           delete_pos=wm, db="rook", table=table,
                           server_id=0, server_name=server_name)
    elif fmt == "avro":
        d = write_avro(feed, out_dir, key, value_cols, delete_pos=wm,
                       payload=payload, db="rook", table=table,
                       server_id=0, server_name=server_name)
    elif fmt == "mongo":
        d = write_mongo(feed, out_dir, key, value_cols,
                        wm_a=0, wm_b=wm, db="rook", table=table)
    elif fmt == "dynamo":
        d = write_dynamo(feed, out_dir, key, value_cols,
                         wm_a=0, wm_b=wm, table=table)
    elif fmt in ("binlog", "canal"):
        # a same-watermark snapshot RE-publish is allowed (at_floor):
        # it restates the identical state above the floor, which is
        # LWW-neutral; only an OLDER-epoch snapshot is refused
        state_path, _ = _check_forward_only(out_dir, fmt, wm)
        writer = write_binlog if fmt == "binlog" else write_canal
        d = writer(feed, out_dir, key, value_cols, delete_pos=wm,
                   payload=payload, db="rook", table=table)
        _record_span_floor(state_path, wm)
    elif fmt in ("pgoutput", "maxwell"):
        writer = write_pgwal if fmt == "pgoutput" else write_maxwell
        d = writer(feed, out_dir, key, value_cols, delete_pos=wm,
                   payload=payload, db="rook", table=table)
    else:
        raise ValueError(f"unknown egress format {fmt!r}")
    d["payload"] = payload.names
    d["snapshot_epoch"] = int(m["epoch"])
    d["watermark"] = wm
    return d


# ---------------------------------------------------------------------------
# Relay compaction — the Kafka log-cleaner analog for a relay directory.
# ---------------------------------------------------------------------------

#: Atomic swap point for a compacted relay directory.  Present ⇒ the
#: directory's live file set is ``manifest.files`` (the snapshot
#: generation) plus every ``data-*`` dump whose coordinate range lies
#: ABOVE ``manifest.floor`` (published after the compaction).  Snapshot
#: files are reachable ONLY through the manifest, so a crash anywhere
#: in a compaction leaves readers on a consistent generation: before
#: the manifest lands they still see the old files; after it lands the
#: old files are excluded by the floor even if their deletion hasn't
#: happened yet.
RELAY_MANIFEST = "_RELAY_MANIFEST.json"

#: Formats whose egress coordinates are the lake's own gtids (re-export
#: preserves them exactly).  mongo/dynamo ride the 1-bit-shifted token
#: space (:func:`_shifted_coord_fn`) — re-compacting would shift
#: already-shifted coordinates and break composition with future dumps,
#: so they are refused.
_RELAY_EXT = {"debezium": "jsonl", "avro": "avrowire"}


def _file_span(path: str) -> tuple[int, int]:
    """(lo, hi) coordinate range parsed from a dump file's name
    (``{prefix}-{lo:016x}-{hi:016x}-{digest}.{ext}``)."""
    stem = os.path.basename(path)
    stem = stem[: stem.rfind(".")]
    parts = stem.split("-")
    if len(parts) < 4:
        raise ValueError(f"not a rookray dump file name: {path!r}")
    return int(parts[-3], 16), int(parts[-2], 16)


def relay_files(relay_dir: str, fmt: str = "debezium") -> list[str]:
    """Crash-safe enumeration of a relay directory's LIVE dump files.

    Without a :data:`RELAY_MANIFEST` this is the plain ``data-*`` glob
    (an uncompacted relay).  With one, it is the manifested snapshot
    generation plus every ``data-*`` dump published above the
    compaction floor — never a mix of a snapshot and the history it
    replaced, whatever point a concurrent or crashed compaction is at.
    """
    import glob as _glob
    ext = _RELAY_EXT.get(fmt)
    if ext is None:
        why = ("its egress rides a 1-bit-shifted token space that "
               "does not survive re-export"
               if fmt in ("mongo", "dynamo") else
               "its file names carry no coordinate range, so the "
               "manifest's floor exclusion cannot distinguish old "
               "from new dumps"
               if fmt in ("binlog", "pgoutput", "maxwell", "canal")
               else "it is not an egress dialect")
        raise ValueError(
            f"relay compaction supports formats {sorted(_RELAY_EXT)}, "
            f"not {fmt!r} ({why})")
    data = sorted(_glob.glob(os.path.join(relay_dir, f"data-*.{ext}")))
    mpath = os.path.join(relay_dir, RELAY_MANIFEST)
    if not os.path.exists(mpath):
        return data
    with open(mpath) as f:
        m = json.load(f)
    if m.get("format") != fmt:
        raise ValueError(
            f"relay manifest at {mpath} is for format "
            f"{m.get('format')!r}, not {fmt!r}")
    floor = int(m["floor"])
    snap = [os.path.join(relay_dir, n) for n in m["files"]]
    missing = [p for p in snap if not os.path.exists(p)]
    if missing:
        raise ValueError(
            f"relay manifest references missing snapshot files "
            f"{missing} — the directory was tampered with (a crashed "
            "compaction never commits a manifest before its files)")
    return snap + [p for p in data if _file_span(p)[1] > floor]


class _TombstoneFeed:
    """Actor-pool stage: delete-winner candidates → changefeed-shaped
    tombstone rows, dropping candidates whose key is LIVE in the
    compacted state (deleted-then-reinserted keys).  The liveness probe
    is the lake's partition-pruned point read (``lookup``), issued per
    batch from the worker — O(partitions hit), never a state scan."""

    def __init__(self, lake_root: str, value_cols: list[str],
                 feed_schema: pa.Schema, drop_below: int | None):
        from rookray.pipeline import LakeTable
        self.lake = LakeTable(lake_root)
        self.value_cols = value_cols
        self.schema = feed_schema
        self.drop_below = drop_below

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if self.drop_below is not None and t.num_rows:
            t = t.filter(pc.greater_equal(t.column("gtid"),
                                          pa.scalar(self.drop_below)))
        if t.num_rows == 0:
            return self.schema.empty_table()
        keys = t.column("key").to_pylist()
        live = self.lake.lookup(keys).column(
            self.lake.payload_schema().names[0])
        if len(live):
            t = t.filter(pc.invert(pc.is_in(
                t.column("key"), value_set=live.combine_chunks())))
        n = t.num_rows
        if n == 0:
            return self.schema.empty_table()
        before = t.column("before").combine_chunks()
        tx = t.column("tx_id")
        cols: dict[str, pa.Array] = {
            "doc_id": t.column("key").combine_chunks(),
            "change": pa.array(["delete"] * n, pa.string()),
            # encode re-derives tx = -(gtid_a + 2); handing back the
            # ORIGINAL gtid_a keeps the tombstone's transaction
            # identity byte-stable across compactions
            "gtid_a": pc.subtract(pc.negate(tx), pa.scalar(2, pa.int64())),
            "gtid_b": pa.array([-1] * n, pa.int64()),
        }
        for c in self.value_cols:
            typ = self.schema.field(f"{c}_a").type
            arr = before.field(c)
            if arr.type != typ:
                arr = arr.cast(typ)
            cols[f"{c}_a"] = arr
            cols[f"{c}_b"] = (pa.array([-1] * n, typ)
                              if pa.types.is_integer(typ)
                              else pa.nulls(n, typ))
        cols["gtid_d"] = t.column("gtid").combine_chunks()
        return pa.table({f.name: cols[f.name] for f in self.schema},
                        schema=self.schema)


def _delete_winners(t: pa.Table) -> pa.Table:
    """Per-batch combiner: delete events only, keeping each key's
    max-coordinate delete within the batch.  Cross-batch duplicates are
    HARMLESS (several tombstones for one dead key LWW-resolve to the
    same absent state downstream; each keeps its own unique
    transaction identity), so no global fold is needed — this stage
    only bounds the candidate volume, it does not have to be exact."""
    import numpy as np
    import pyarrow.compute as pc
    from rookray.schema import OP_DELETE
    sub = t.select(["key", "gtid", "tx_id", "before"])
    sub = sub.filter(pc.equal(t.column("op"),
                              pa.scalar(OP_DELETE, pa.int8())))
    if sub.num_rows <= 1:
        return sub
    enc = pc.dictionary_encode(sub.column("key").combine_chunks())
    codes = enc.indices.to_numpy(zero_copy_only=False)
    g = sub.column("gtid").to_numpy(zero_copy_only=False)
    order = np.lexsort((g, codes))
    cs = codes[order]
    last = np.ones(len(order), dtype=bool)
    last[:-1] = cs[1:] != cs[:-1]
    return sub.take(pa.array(order[last], pa.int64()))


def compact_relay(relay_dir: str, fmt: str = "debezium",
                  payload: pa.Schema | None = None,
                  num_partitions: int = 16,
                  keep_tombstones: bool = True,
                  drop_tombstones_below: int | None = None,
                  workdir: str | None = None) -> dict:
    """Compact an accumulated relay directory in place: replace its
    dump history with ONE snapshot generation — every live key as a
    single insert envelope at its original winning coordinate, plus
    (by default) a tombstone per dead key at its original delete
    coordinate — swapped in atomically via
    :data:`RELAY_MANIFEST`.  The Kafka log-cleaner analog: fresh
    downstream bootstrap cost drops from O(history) to O(state), and
    the relay keeps composing — dumps published after the compaction
    sort above the manifest floor and ride alongside the snapshot.

    Correctness contract (``tests/test_egress_compact.py``): a fresh
    downstream ingest of the compacted directory reaches the same
    final state as ingesting the full history, and a downstream
    already at-or-above the floor sees every compacted coordinate
    skipped by its own watermark (re-delivery is free).  Consumers
    whose watermark is BELOW the floor must re-bootstrap — the same
    horizon rule as Kafka's ``delete.retention.ms``;
    ``drop_tombstones_below`` is the retention knob (tombstones are
    carried forward across compactions until explicitly dropped).

    The heavy lifting is the engine's own proven paths: the history
    is decoded by the REAL consumer (``read_debezium`` /
    ``read_avro``), LWW-folded by ``LakeTable.apply`` into a scratch
    lake under ``workdir`` (hash-partitioned, external shuffle — the
    10^10-event path, no driver materialization), and the folded
    state re-emitted partition-local through the same writers that
    produced the history.  Tombstones take a separate skinny pass:
    a vectorized per-batch delete-winner combiner, then an actor-pool
    liveness probe via partition-pruned point reads.

    ``fmt``: ``"debezium"`` or ``"avro"`` (coordinate-preserving
    egress dialects); mongo/dynamo are refused — their shifted
    coordinate space does not survive re-export."""
    import glob as _glob
    import tempfile

    import ray
    import ray.data

    from rookray.pipeline import CDCConfig, LakeTable, _changefeed_schema

    ext = _RELAY_EXT.get(fmt)
    if ext is None:
        # same refusal (and reason) as relay_files
        relay_files(relay_dir, fmt)
    files = relay_files(relay_dir, fmt)
    mpath = os.path.join(relay_dir, RELAY_MANIFEST)
    old = {}
    if os.path.exists(mpath):
        with open(mpath) as f:
            old = json.load(f)
    gen = int(old.get("generation", -1)) + 1
    # GC snapshot files no manifest references — staging left behind by
    # a crashed compaction (never readable: snaps are manifest-only)
    referenced = set(old.get("files", ()))
    for p in _glob.glob(os.path.join(relay_dir, f"snap-*.{ext}")):
        if os.path.basename(p) not in referenced:
            os.remove(p)
    if not files:
        return {"events": 0, "files": 0, "tombstones": 0,
                "generation": gen - 1, "up_to_date": True}
    floor = max(old.get("floor", 0),
                max(_file_span(p)[1] for p in files))

    if fmt == "debezium":
        from rookray.wire import infer_payload, read_debezium
        payload = payload or infer_payload(files)
        ds = read_debezium(files, tx_topic=None, payload=payload)
    else:
        from rookray.wireavro import infer_payload_avro, read_avro
        registry = os.path.join(relay_dir, "registry.json")
        payload = payload or infer_payload_avro(registry)
        ds = read_avro(files, registry, tx_topic=None, payload=payload)
    key = payload.names[0]
    value_cols = [n for n in payload.names if n != key]

    work = workdir or tempfile.mkdtemp(prefix="rookray_compact_")
    # ONE streaming decode pass spills the history as columnar parquet
    # shards under the workdir instead of pinning the whole decoded
    # history in the object store (compressed parquet is a fraction of
    # the in-memory Arrow size, and a 100 TB history must not live in
    # /dev/shm): the LWW fold then rides apply()'s shard fast path
    # (footer-statistics watermark, pruned column reads) and the
    # tombstone pass re-reads only its five columns — no stage holds
    # O(history) in memory.
    import pyarrow.parquet as _pq

    hist_dir = os.path.join(work, "history")
    ds.write_parquet(hist_dir)
    shards = sorted(_glob.glob(os.path.join(hist_dir, "*.parquet")))
    head = None
    for p in shards:
        t = _pq.read_table(p, columns=["db", "table"])
        if t.num_rows:
            head = t
            break
    if head is None:
        return {"events": 0, "files": len(files), "tombstones": 0,
                "generation": gen - 1, "up_to_date": True}
    db, table = str(head["db"][0]), str(head["table"][0])

    # tx_atomic=False: every relay envelope is a singleton transaction
    # by dialect construction (a snapshot diff has no tx structure to
    # restate), so the tx-completeness watermark is vacuous here — and
    # the spilled history's coordinates are SPARSE (only changed keys),
    # which the footer-stats watermark would punt to a scanning pass
    # for nothing
    lake = LakeTable(os.path.join(work, "lake"),
                     CDCConfig(table=table, tx_atomic=False,
                               num_partitions=num_partitions))
    lake.apply(shards)
    live_rows = sum(int(p["rows"])
                    for p in lake.manifest()["partitions"].values())

    types = {f.name: f.type for f in payload}
    fschema = _changefeed_schema(value_cols, types).append(
        pa.field("gtid_d", pa.int64()))

    # one partition-local pass over the folded state — NOT
    # changes_between: the scratch lake has a single committed epoch
    # (its first epoch is 0; there is no earlier snapshot to diff).
    # Each live key re-emits at its ORIGINAL winning coordinate, so
    # the snapshot generation keeps composing with dumps published
    # after the compaction (their coordinates all sort above).
    feed = lake.read(include_meta=True).map_batches(
        _state_to_feed_fn(key, value_cols, fschema),
        batch_format="pyarrow")
    if keep_tombstones:
        hist = ray.data.read_parquet(
            shards, columns=["op", "key", "gtid", "tx_id", "before"])
        tomb = (hist.map_batches(_delete_winners, batch_format="pyarrow")
                    .map_batches(_TombstoneFeed(
                        lake.root, value_cols, fschema,
                        drop_tombstones_below),
                        batch_format="pyarrow", concurrency=2))
        feed = feed.union(tomb)

    prefix = f"snap-{gen:06d}"
    if fmt == "debezium":
        d = write_debezium(feed, relay_dir, key, value_cols,
                           delete_pos=None, delete_pos_col="gtid_d",
                           prefix=prefix, db=db, table=table)
    else:
        d = write_avro(feed, relay_dir, key, value_cols,
                       delete_pos=None, delete_pos_col="gtid_d",
                       prefix=prefix, payload=payload,
                       db=db, table=table)

    manifest = {"format": fmt, "generation": gen, "floor": int(floor),
                "files": sorted(os.path.basename(p)
                                for p in d["data_files"]),
                "events": int(d["events"]),
                "live_rows": int(live_rows),
                "tombstones": int(d["events"]) - int(live_rows),
                "compacted_inputs": len(files)}
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, mpath)  # the atomic generation swap
    for p in files:  # superseded history — unreachable since the swap
        os.remove(p)
    out = dict(manifest)
    out["snapshot_files"] = len(d["data_files"])
    out["workdir"] = work
    return out
