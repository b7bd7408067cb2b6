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
           "write_dynamo", "export_changefeed"]

_OP = {"insert": "c", "update": "u", "delete": "d"}

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
                delete_pos: int, serialize, ext: str,
                db: str, table: str, server_id: int,
                server_name: str, make_record=None,
                prefix: str = "data") -> dict:
    """Shared egress writer: env-dict construction, coordinate/tx
    identity rules, and idempotent file naming live ONCE; ``serialize``
    (env dicts → bytes) picks the wire dialect.  A dialect whose record
    is NOT a Debezium envelope (the change-stream shape) passes
    ``make_record(change, row) -> (position, record)`` and owns its
    own coordinate rules."""
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
                g, tx = delete_pos, -(int(r["gtid_a"]) + 2)
            else:
                g = tx = int(r["gtid_b"])
            positions.append(g)
            binlog_file, pos = _coords(g)
            envs.append(make_envelope(
                _OP[change],
                (None if change == "insert"
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
                   delete_pos: int,
                   db: str = "rook", table: str = "sequences",
                   server_id: int = 0,
                   server_name: str = "rookray") -> dict:
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
                       db, table, server_id, server_name)


def write_avro(feed: "ray.data.Dataset", out_dir: str,
               key_column: str, value_columns: list[str],
               delete_pos: int, payload: pa.Schema,
               db: str = "rook", table: str = "sequences",
               server_id: int = 0,
               server_name: str = "rookray") -> dict:
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
                    db, table, server_id, server_name)
    d["registry"] = reg_path
    return d


_MONGO_OP = {"insert": "insert", "update": "update", "delete": "delete"}


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
        if change != "insert":  # pre-images enabled: full before image
            rec["fullDocumentBeforeChange"] = _image(r, key_column,
                                                     names, "a")
        return g, rec

    def to_jsonl(recs: list[dict]) -> bytes:
        return ("\n".join(json.dumps(e, separators=(",", ":"))
                          for e in recs) + "\n").encode()

    return _write_dump(feed, out_dir, key_column, value_columns,
                       0, to_jsonl, "jsonl", db, table, 0, "rookray",
                       make_record=make_record, prefix="mongo")


_DDB_OP = {"insert": "INSERT", "update": "MODIFY", "delete": "REMOVE"}


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
        if change != "insert":
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


def export_changefeed(lake, epoch_a: int, epoch_b: int,
                      out_dir: str, server_name: str = "rookray",
                      fmt: str = "debezium") -> dict:
    """Egress the row-level changefeed between two committed snapshots
    as a wire-format dump: every payload column rides as full
    before/after images (what a downstream consumer needs to retract
    and re-add), coordinates as documented in the module header.
    ``fmt``: ``"debezium"`` (JSON-lines), ``"avro"`` (Confluent
    schema-registry framing), ``"mongo"`` (change-stream JSON-lines),
    or ``"dynamo"`` (DynamoDB Streams records) — the last two ride the
    1-bit-shifted token space documented on :func:`_shifted_coord_fn`,
    so the downstream lake must be a fresh relay target, not one
    sharing the source's gtid space.  The dump replays
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
