"""Public CDC wire-format adapter: Debezium-JSON envelopes.

rook's entire reason to exist is tailing a live MySQL binlog
(rook-source-mysql/.../MySQLReplicationStream.java:71-120 — host/port/
user/password → BinaryLogClient).  No database exists in this sandbox,
so the public-protocol analog is the de-facto standard CDC wire format:
the Debezium JSON envelope that a MySQL/Postgres connector publishes to
Kafka.  This module decodes Debezium-shaped dumps (JSON-lines files) and
live socket feeds into the engine's change-event schema
(``rookray.schema.change_event_schema``), so a Debezium pipeline can
drive the lake without the producer being rookray-shaped.

Envelope shape (public, per the Debezium documentation):

  data record::

    {"payload": {"before": {...}|null, "after": {...}|null,
                 "source": {"name", "db", "table", "server_id",
                            "file", "pos", "row", "gtid", "ts_ms"},
                 "op": "c"|"u"|"d"|"r", "ts_ms": ...,
                 "transaction": {"id", "total_order",
                                 "data_collection_order"}|null}}

  transaction-topic record (transaction metadata enabled)::

    {"status": "BEGIN"|"END", "id": "...", "event_count": N,
     "data_collections": [{"data_collection": "db.table",
                           "event_count": n}, ...]}

Mapping into the engine's model:

- ``op``: "c"/"r" (create / snapshot read) → INSERT, "u" → UPDATE,
  "d" → DELETE.
- ``gtid``: the engine needs a per-EVENT monotone int64; a binlog
  offers exactly that as (file sequence, position, row-in-statement) —
  the same coordinates rook checkpoints.  Decoded as
  ``file_seq << 40 | pos`` (positions are < 2^40 in any real binlog
  file); MySQL's GTID string ("uuid:txno") is per-TRANSACTION, so it
  is only a fallback (``txno << 16 | total_order-1``).
- ``tx_id`` / ``seq_in_tx``: from the envelope's ``transaction`` block.
- ``tx_events`` (rows per tx — the engine's local tx-completeness
  count): from the transaction topic's END records (``event_count``),
  or, when no transaction topic is supplied, from a counting pass over
  the dump itself (bounded replay only — a live feed needs the topic).

Decoding is vectorized end-to-end: ``pyarrow.json`` parses the lines in
C++, and the envelope→event mapping below is pure Arrow struct-field
algebra — no per-row Python.  The ENCODER (``debezium_dump``) is the
test/bench producer (the stand-in for a real connector) and is allowed
to be per-row Python; it never runs inside a pipeline.
"""

from __future__ import annotations

import io
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rookray.schema import (OP_DELETE, OP_INSERT, OP_UPDATE, SEQ_SCHEMA,
                            change_event_schema)
from rookray.source import ChangeStreamServer, _read_exact

__all__ = [
    "debezium_dump", "decode_envelopes", "read_debezium",
    "DebeziumSocketDatasource", "stream_debezium_socket",
    "DebeziumStreamServer", "parse_tx_topic", "tx_count_index",
]

_OP_TO_DBZ = {OP_INSERT: "c", OP_UPDATE: "u", OP_DELETE: "d"}
_BINLOG_FILE = "rookray-bin.000001"


# ------------------------------------------------------------- encoder

def _row_payload(struct_val) -> dict | None:
    if struct_val is None:
        return None
    return {k: (v.tolist() if hasattr(v, "tolist") else v)
            for k, v in struct_val.items()}


def make_envelope(op_char: str, before: dict | None, after: dict | None,
                  db: str, table: str, server_id, file: str, pos: int,
                  tx_id: str, total_order: int,
                  connector: str = "mysql",
                  server_name: str = "rookray") -> dict:
    """The one Debezium envelope shape — shared by the recorded-dump
    encoder below and the egress publisher (``rookray.egress``) so the
    two can never drift."""
    return {"payload": {
        "before": before,
        "after": after,
        "source": {
            "version": "2.5.0.Final", "connector": connector,
            "name": server_name, "ts_ms": 0,
            "db": db, "table": table,
            "server_id": server_id,
            "file": file, "pos": pos, "row": 0,
            "gtid": f"{server_name}:{tx_id}",
        },
        "op": op_char,
        "ts_ms": 0,
        "transaction": {
            "id": str(tx_id),
            "total_order": total_order,
            "data_collection_order": total_order,
        },
    }}


def debezium_dump(events: pa.Table, out_dir: str, n_files: int = 4,
                  connector: str = "mysql",
                  server_name: str = "rookray") -> dict:
    """Serialize a change-event table into a Debezium-JSON dump:
    ``data-%05d.jsonl`` files (the data topic) plus ``tx-00000.jsonl``
    (the transaction topic, BEGIN/END records with event counts).
    Deterministic: same input table → byte-identical dump.  This is
    the recorded-connector-output producer for tests and benches."""
    os.makedirs(out_dir, exist_ok=True)
    rows = events.to_pylist()
    per = -(-len(rows) // max(1, n_files)) or 1
    paths = []
    for fi in range(0, len(rows), per):
        chunk = rows[fi:fi + per]
        path = os.path.join(out_dir, f"data-{fi // per:05d}.jsonl")
        with open(path, "w") as f:
            for r in chunk:
                env = make_envelope(
                    _OP_TO_DBZ[r["op"]], _row_payload(r["before"]),
                    _row_payload(r["after"]), r["db"], r["table"],
                    r["server_id"], _BINLOG_FILE, r["gtid"],
                    str(r["tx_id"]), r["seq_in_tx"] + 1,
                    connector=connector, server_name=server_name)
                f.write(json.dumps(env, separators=(",", ":")) + "\n")
        paths.append(path)
    # transaction topic: one BEGIN + one END per tx, in tx order
    tx_counts: dict[int, int] = {}
    for r in rows:
        tx_counts[r["tx_id"]] = r["tx_events"]
    tx_path = os.path.join(out_dir, "tx-00000.jsonl")
    with open(tx_path, "w") as f:
        for txid in sorted(tx_counts):
            f.write(json.dumps({"status": "BEGIN", "id": str(txid),
                                "event_count": None},
                               separators=(",", ":")) + "\n")
            f.write(json.dumps(
                {"status": "END", "id": str(txid),
                 "event_count": tx_counts[txid],
                 "data_collections": [{"data_collection": "rook.sequences",
                                       "event_count": tx_counts[txid]}]},
                separators=(",", ":")) + "\n")
    return {"data_files": paths, "tx_file": tx_path, "events": len(rows)}


# ------------------------------------------------------------- decoder

def _json_table(data: bytes) -> pa.Table:
    import pyarrow.json as pj
    return pj.read_json(io.BytesIO(data))


def parse_tx_topic(paths: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(sorted tx ids, event counts) from transaction-topic dumps —
    the END records carry ``event_count``.  Small by construction (two
    records per transaction), parsed once on the driver and broadcast."""
    ids, counts = [], []
    for p in paths:
        with open(p, "rb") as f:
            t = _json_table(f.read())
        end = t.filter(pc.equal(t.column("status"), "END"))
        ids.extend(_num_after_colon(
            pc.cast(end.column("id"), pa.string()).combine_chunks())
            .to_pylist())
        counts.extend(int(x) for x in end.column("event_count").to_pylist())
    ids_a = np.asarray(ids, dtype=np.int64)
    counts_a = np.asarray(counts, dtype=np.int64)
    order = np.argsort(ids_a, kind="stable")
    return ids_a[order], counts_a[order]


def _field_or_null(struct_col: pa.ChunkedArray | pa.Array, name: str,
                   typ: pa.DataType, n: int) -> pa.Array:
    """Struct field extraction robust to JSON inference gaps: a file
    where every value of a field is absent/null infers no field (or a
    null type) — decode must still emit the typed column."""
    if isinstance(struct_col, pa.ChunkedArray):
        struct_col = struct_col.combine_chunks()
    if pa.types.is_struct(struct_col.type):
        idx = struct_col.type.get_field_index(name)
        if idx >= 0:
            out = struct_col.field(idx)
            if pa.types.is_null(out.type):
                return pa.nulls(n, typ)
            return out.cast(typ)
    return pa.nulls(n, typ)


def _payload_struct(col, payload: pa.Schema, n: int) -> pa.Array:
    """JSON-inferred before/after struct → typed payload struct with
    the original row validity (insert rows have null before, etc.)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col is None or not pa.types.is_struct(col.type):  # all-null/absent
        return pa.nulls(n, pa.struct(list(payload)))
    children = [_field_or_null(col, f.name, f.type, n) for f in payload]
    mask = col.is_null()
    return pa.StructArray.from_arrays(
        children, names=payload.names,
        mask=mask.combine_chunks() if isinstance(mask, pa.ChunkedArray)
        else mask)


def text_list_cast(arr: pa.Array, typ: pa.DataType,
                   brackets: str = r"^\[|\]$",
                   null_token: str | None = None,
                   reject_quotes: bool = False) -> pa.Array:
    """Delimited-text list values → a typed Arrow list column,
    vectorized: strip the bracket pair, split on commas, cast the
    flattened elements.  Empty brackets → empty list, SQL NULL stays
    null; ``null_token`` (e.g. Postgres's unquoted ``NULL``) maps an
    element to null.  ``reject_quotes`` raises on quoted elements
    (Postgres text[] quoting is out of scope for the numeric payloads
    this engine carries) instead of silently mis-splitting them.
    Shared by the Canal (``[1,2]``) and pgoutput (``{1,2}``) decoders
    so the subtle offset/validity construction lives once."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    body = pc.replace_substring_regex(arr, brackets, "")
    nonempty = pc.if_else(pc.equal(body, ""),
                          pa.nulls(len(arr), pa.string()), body)
    parts = pc.split_pattern(nonempty, ",")
    lens = pc.list_value_length(parts).fill_null(0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    offsets_np = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    null_np = arr.is_null().to_numpy(zero_copy_only=False)
    offsets = pa.array(offsets_np,
                       mask=np.concatenate([null_np, [False]]))
    flat = pc.list_flatten(parts)
    if reject_quotes and len(flat) and pc.any(
            pc.match_substring(flat, '"')).as_py():
        raise ValueError(
            "quoted array elements in text form are not supported "
            "(string-array payloads need a quote-aware parser)")
    if null_token is not None:
        flat = pc.if_else(pc.equal(flat, null_token),
                          pa.nulls(len(flat), pa.string()), flat)
    return pa.ListArray.from_arrays(offsets, flat.cast(typ.value_type))


def _num_after_colon(arr: pa.Array) -> pa.Array:
    """'uuid:N' (or plain 'N') → int64 N, null-preserving — MySQL GTID
    strings and Debezium transaction ids share this shape."""
    return pc.cast(pc.replace_substring_regex(arr, r"^.*:", ""),
                   pa.int64())


def _tx_identity(p: pa.StructArray, n: int) -> tuple[np.ndarray, np.ndarray,
                                                     np.ndarray]:
    """(tx_id int64, seq_in_tx int64, had_tx_block bool) for a batch of
    envelopes.  transaction.id may be numeric OR the MySQL 'uuid:txno'
    form; with no transaction block (metadata disabled / snapshot
    reads) the GTID string's per-tx number is the transaction identity,
    else -1.  Shared by decode and the topic-less counting pass so the
    two can never disagree."""
    names = [f.name for f in p.type]
    txb = p.field("transaction") if "transaction" in names else None
    tx_id = _field_or_null(txb, "id", pa.string(), n) if txb is not None \
        else pa.nulls(n, pa.string())
    total_order = _field_or_null(txb, "total_order", pa.int64(), n) \
        if txb is not None else pa.nulls(n, pa.int64())
    tx_id_a = _num_after_colon(tx_id)
    tx_valid = tx_id_a.is_valid().to_numpy(zero_copy_only=False)
    tx_id_i = tx_id_a.fill_null(-1).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    src = p.field("source") if "source" in names else None
    src_gtid = _field_or_null(src, "gtid", pa.string(), n) \
        if src is not None else pa.nulls(n, pa.string())
    txno = _num_after_colon(src_gtid).fill_null(-1) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    tx_id_i = np.where(tx_valid, tx_id_i, txno)
    seq0 = pc.subtract(pc.coalesce(total_order, pa.scalar(1, pa.int64())),
                       pa.scalar(1, pa.int64()))
    return (tx_id_i,
            seq0.to_numpy(zero_copy_only=False).astype(np.int64),
            tx_valid)


#: bits reserved for the within-transaction order in the GTID-string
#: fallback coordinate (no binlog position available)
_FALLBACK_SEQ_BITS = 20


def _gtid_of(p: pa.StructArray, n: int,
             seq_np: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(gtid int64, pos_valid bool) per envelope: binlog coordinates
    ``file_seq << 40 | pos`` when ``source.pos`` is present, else the
    GTID-string composite ``txno << 20 | seq``.  Shared by decode and
    the topic-less counting pass so identity can never diverge."""
    names = [f.name for f in p.type]
    src = p.field("source") if "source" in names else None
    pos = _field_or_null(src, "pos", pa.int64(), n) \
        if src is not None else pa.nulls(n, pa.int64())
    file_s = _field_or_null(src, "file", pa.string(), n) \
        if src is not None else pa.nulls(n, pa.string())
    pos_valid = pos.is_valid().to_numpy(zero_copy_only=False)
    pos_np = pos.fill_null(0).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    fseq = pc.extract_regex(pc.coalesce(file_s, pa.scalar("0")),
                            r"(?P<n>\d+)$")
    fseq_np = np.where(
        fseq.is_valid().to_numpy(zero_copy_only=False),
        pc.cast(pc.struct_field(fseq, "n"), pa.int64()).fill_null(0)
        .to_numpy(zero_copy_only=False), 0).astype(np.int64)
    src_gtid = _field_or_null(src, "gtid", pa.string(), n) \
        if src is not None else pa.nulls(n, pa.string())
    txno = _num_after_colon(src_gtid).fill_null(-1) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    no_coords = ~pos_valid & (txno < 0)
    if no_coords.any():
        raise ValueError(
            f"{int(no_coords.sum())} envelope(s) carry neither "
            "source.pos nor source.gtid — no ordering coordinates; "
            "refusing to decode into an arbitrary LWW order")
    if (~pos_valid & (seq_np >= (1 << _FALLBACK_SEQ_BITS))).any():
        raise ValueError(
            "transaction with >= 2^20 events in GTID-string fallback "
            "mode — the composite coordinate would collide with the "
            "next transaction; supply binlog positions (source.pos)")
    gtid = np.where(pos_valid,
                    (fseq_np << np.int64(40)) | pos_np,
                    (txno << np.int64(_FALLBACK_SEQ_BITS)) | seq_np)
    return gtid, pos_valid


def _decode_identity(p: pa.StructArray, n: int) -> tuple[
        np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(tx_id, seq, gtid, had_tx_block, pos_valid) per envelope — the
    one place transaction identity is decided.  With transaction
    metadata DISABLED (Debezium's default: ``payload.transaction`` is
    null) each envelope is a transaction keyed by its per-row
    coordinate; grouping such rows by the GTID string's txno would
    report multi-row transactions whose seqs are all 0, wedging the
    completeness watermark forever.  Rows of one multi-row STATEMENT
    share a binlog position (their coordinate and identity collide),
    differing only in ``source.row`` — so ``row`` becomes their
    seq_in_tx and the statement closes as one coordinate-keyed
    transaction once a counting pass supplies its row count
    (``decode_envelopes`` refuses loudly when it can't)."""
    tx_id_i, seq_np, tx_valid = _tx_identity(p, n)
    gtid, pos_valid = _gtid_of(p, n, seq_np)
    no_blk = ~tx_valid
    if no_blk.any():
        names = [f.name for f in p.type]
        src = p.field("source") if "source" in names else None
        row = (_field_or_null(src, "row", pa.int64(), n)
               if src is not None else pa.nulls(n, pa.int64()))
        row_np = row.fill_null(0).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        tx_id_i = np.where(no_blk, gtid, tx_id_i)
        seq_np = np.where(no_blk, row_np, seq_np)
    return tx_id_i, seq_np, gtid, tx_valid, pos_valid


def decode_envelopes(tbl: pa.Table, payload: pa.Schema = SEQ_SCHEMA,
                     tx_index: tuple[np.ndarray, np.ndarray] | None = None,
                     ) -> pa.Table:
    """One batch of JSON-parsed Debezium envelopes → the change-event
    schema.  Pure Arrow/numpy kernels throughout.

    Non-mutation records are dropped, like every Debezium consumer
    drops them: ops outside {c,r,u,d} ('t' truncate, 'm' message) and
    null-payload tombstones.

    gtid derivation is PER ROW (never per batch — Ray batch boundaries
    are arbitrary): binlog coordinates ``file_seq << 40 | pos`` when
    ``source.pos`` is present, else the GTID-string composite
    ``txno << 20 | (total_order-1)``.  A consistent dump uses one
    coordinate space throughout; rows with NEITHER pos nor a GTID
    string carry no ordering information and raise rather than decode
    into a silently wrong LWW order.  The fallback composite raises on
    transactions with ≥ 2^20 events (the coordinate would collide with
    the next transaction's)."""
    n = tbl.num_rows
    schema = change_event_schema(payload)
    if n == 0:
        return schema.empty_table()
    p = tbl.column("payload").combine_chunks()

    # op: "c"/"r" → insert, "u" → update, "d" → delete; anything else
    # (truncate/message records, tombstones) is not a row mutation
    op_s = p.field("op")
    code = pc.index_in(op_s, value_set=pa.array(["c", "r", "u", "d"]))
    keep = code.is_valid()
    if pc.any(pc.invert(keep)).as_py():
        p = p.filter(keep)
        code = code.filter(keep)
        n = len(p)
        if n == 0:
            return schema.empty_table()
    op = pc.take(pa.array([OP_INSERT, OP_INSERT, OP_UPDATE, OP_DELETE],
                          pa.int8()), code)

    src = p.field("source")
    db = _field_or_null(src, "db", pa.string(), n)
    table = _field_or_null(src, "table", pa.string(), n)
    server_id = _field_or_null(src, "server_id", pa.int64(), n)

    tx_id_i, seq_np, gtid, tx_valid, _ = _decode_identity(p, n)

    # tx_events from the transaction-topic index (searchsorted on the
    # broadcast sorted arrays — no Python per row).  Envelopes WITHOUT
    # a transaction block are coordinate-keyed transactions: usually
    # singletons (tx_events=1), but rows of one multi-row STATEMENT
    # share a position — the counting pass's index (keyed by the same
    # identity rule) resolves their row count; a row>0 envelope whose
    # count can't be resolved must NOT claim to be a singleton (its
    # seq alone would wedge the watermark), so it raises instead.
    if tx_index is not None and len(tx_index[0]):
        ids_a, counts_a = tx_index
        loc = np.searchsorted(ids_a, tx_id_i)
        loc_c = np.clip(loc, 0, len(ids_a) - 1)
        hit = ids_a[loc_c] == tx_id_i
        tx_events = np.where(hit, counts_a[loc_c],
                             np.where(tx_valid, -1, 1)).astype(np.int32)
    else:
        tx_events = np.where(tx_valid, -1, 1).astype(np.int32)
    unresolved = ~tx_valid & (tx_events == 1) & (seq_np > 0)
    if unresolved.any():
        raise ValueError(
            f"{int(unresolved.sum())} envelope(s) with no transaction "
            "block carry source.row > 0 but no index resolves their "
            "statement's row count — decode the dump with the "
            "counting pass (tx_topic=None) or enable transaction "
            "metadata on the producer")

    names = [f.name for f in p.type]
    before = _payload_struct(p.field("before") if "before" in names
                             else None, payload, n)
    after = _payload_struct(p.field("after") if "after" in names
                            else None, payload, n)
    key_field = payload.names[0]  # merge key = first payload column
    bkey = pc.struct_field(before, key_field)
    akey = pc.struct_field(after, key_field)
    # the engine contract (gen.py): before-image key when a before
    # image EXISTS, after-image key otherwise — updates under reduced
    # replica identity (null before) still key by the after image
    key = pc.if_else(before.is_valid(), bkey, akey)

    return pa.table({
        "gtid": pa.array(gtid, pa.int64()),
        "tx_id": pa.array(tx_id_i, pa.int64()),
        "seq_in_tx": pa.array(seq_np.astype(np.int32), pa.int32()),
        "tx_events": pa.array(tx_events, pa.int32()),
        "server_id": server_id,
        "db": db,
        "table": table,
        "op": op,
        "key": key,
        "before": before,
        "after": after,
    }, schema=schema)


def infer_payload(paths: list[str], sample_files: int = 2) -> pa.Schema:
    """Payload schema inferred from a dump's before/after images (for
    callers with no catalog in hand, e.g. the CLI): union of the
    JSON-inferred struct fields across the first ``sample_files``
    files, first typed occurrence wins; fields never seen non-null
    default to string."""
    fields: dict[str, pa.DataType] = {}
    for path in paths[:sample_files]:
        with open(path, "rb") as f:
            t = _json_table(f.read())
        if "payload" not in t.schema.names:
            continue
        p = t.column("payload").combine_chunks()
        names = [f.name for f in p.type]
        for side in ("before", "after"):
            if side not in names:
                continue
            col = p.field(side)
            if not pa.types.is_struct(col.type):
                continue
            for fld in col.type:
                cur = fields.get(fld.name)
                if cur is None or pa.types.is_null(cur):
                    fields[fld.name] = fld.type
    if not fields:
        raise ValueError("no before/after images found to infer a "
                         "payload schema from")
    return pa.schema([(n, (pa.string() if pa.types.is_null(t) else t))
                      for n, t in fields.items()])


def tx_count_index(envelopes: "ray.data.Dataset",
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Per-transaction event counts recovered by a counting pass over a
    bounded Dataset of parsed envelope batches (any batch shape with a
    ``payload`` struct column): tiny partial-count partials → groupby
    sum → broadcast.  Valid for a recorded dump only — a LIVE feed must
    supply the transaction topic, exactly as a real Debezium consumer
    needs it for transaction boundaries.  Shared by the JSON and the
    Confluent-Avro envelope readers so tx identity can never diverge
    between the counting pass and ``decode_envelopes``."""

    def tx_partial(tbl: pa.Table) -> pa.Table:
        p = tbl.column("payload").combine_chunks()
        if len(p):
            # count only row mutations, and by the SAME transaction
            # identity rule decode_envelopes assigns (incl. the
            # uuid:txno form and the no-transaction-block singleton
            # rule — identity = the per-row coordinate there)
            code = pc.index_in(
                p.field("op"), value_set=pa.array(["c", "r", "u", "d"]))
            p = p.filter(code.is_valid())
        if len(p) == 0:
            return pa.table({"tx_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "loose": pa.array([], pa.int64())})
        tx_id_i, _, _, tx_valid, pos_valid = _decode_identity(p, len(p))
        # "loose" marks identities whose rows have NEITHER a tx
        # block NOR a binlog position: their coordinate is the
        # txno<<20 composite with seq 0, so rows of one multi-row
        # tx COLLIDE — detectable here (count > 1), undecodable
        loose = (~tx_valid & ~pos_valid).astype(np.int64)
        order = np.argsort(tx_id_i, kind="stable")
        xs, ls = tx_id_i[order], loose[order]
        starts = np.flatnonzero(
            np.concatenate([[True], xs[1:] != xs[:-1]]))
        ends = np.concatenate([starts[1:], [len(xs)]])
        return pa.table({
            "tx_id": pa.array(xs[starts], pa.int64()),
            "n": pa.array((ends - starts).astype(np.int64)),
            "loose": pa.array(np.maximum.reduceat(ls, starts)
                              .astype(np.int64)),
        })

    from ray.data.aggregate import Max, Sum
    counts = (envelopes
              .map_batches(tx_partial, batch_format="pyarrow")
              .groupby("tx_id").aggregate(
                  Sum("n", alias_name="n"),
                  Max("loose", alias_name="loose"))
              .take_all())
    bad = sum(1 for r in counts if r["loose"] and r["n"] > 1)
    if bad:
        raise ValueError(
            f"{bad} multi-row transaction(s) carry neither "
            "transaction metadata nor binlog positions — rows "
            "within such a transaction are indistinguishable "
            "(identical txno<<20 coordinates); enable the "
            "transaction topic or source.pos on the producer")
    ids_a = np.asarray([r["tx_id"] for r in counts], dtype=np.int64)
    cnt_a = np.asarray([r["n"] for r in counts], dtype=np.int64)
    order = np.argsort(ids_a, kind="stable")
    return ids_a[order], cnt_a[order]


def read_debezium(paths: list[str], tx_topic: list[str] | None = None,
                  payload: pa.Schema = SEQ_SCHEMA) -> "ray.data.Dataset":
    """A ``ray.data.Dataset`` of engine change events decoded from
    Debezium-JSON dump files.  ``pyarrow.json`` does the parsing inside
    the read tasks (C++, block-parallel); the envelope mapping is one
    vectorized ``map_batches``.

    Without ``tx_topic``, per-transaction event counts come from
    ``tx_count_index`` over the dump (bounded replay only — a live
    feed needs the topic)."""
    import ray
    import ray.data

    raw = ray.data.read_json(paths, override_num_blocks=max(1, len(paths)))
    if tx_topic is not None:
        tx_index = parse_tx_topic(tx_topic)
    else:
        tx_index = tx_count_index(ray.data.read_json(
            paths, override_num_blocks=max(1, len(paths))))

    ref = ray.put(tx_index)

    def decode(tbl: pa.Table) -> pa.Table:
        import ray as _ray
        return decode_envelopes(tbl, payload=payload,
                                tx_index=_ray.get(ref))

    return raw.map_batches(decode, batch_format="pyarrow",
                           zero_copy_batch=True)


# ------------------------------------------------------- socket variant

class DebeziumStreamServer(ChangeStreamServer):
    """Test producer for the socket path: frames carry raw Debezium
    JSON-lines bytes instead of Arrow IPC."""

    def push_lines(self, lines: list[str]) -> None:
        self._q.put(("\n".join(lines) + "\n").encode())

    def push_file(self, path: str) -> None:
        with open(path, "rb") as f:
            self._q.put(f.read())


from ray.data.datasource import Datasource  # noqa: E402


class DebeziumSocketDatasource(Datasource):
    """Unbounded Debezium change stream over the frame protocol
    (``rookray.source.SocketStreamDatasource`` with JSON-lines frames):
    one ordered read task — a replication connection is one stream —
    decoding each frame with the same vectorized envelope mapping.
    ``tx_index`` must come from the transaction topic (live feeds have
    no bounded dump to count)."""

    def __init__(self, host: str, port: int,
                 tx_index: tuple[np.ndarray, np.ndarray],
                 payload: pa.Schema = SEQ_SCHEMA,
                 connect_timeout_s: float = 10.0):
        self.host, self.port = host, port
        self.tx_index = tx_index
        self.payload = payload
        self.connect_timeout_s = connect_timeout_s

    def get_name(self) -> str:
        return f"DebeziumSocketStream({self.host}:{self.port})"

    def estimate_inmemory_data_size(self):
        return None

    def get_read_tasks(self, parallelism: int):
        from ray.data.block import BlockMetadata
        from ray.data.datasource import ReadTask

        host, port = self.host, self.port
        timeout, payload, tx_index = (self.connect_timeout_s, self.payload,
                                      self.tx_index)

        def read_fn():
            import struct

            from rookray.source import connect_with_deadline

            sock = connect_with_deadline(host, port, timeout)
            try:
                while True:
                    (ln,) = struct.unpack(">I", _read_exact(sock, 4))
                    if ln == 0:
                        return
                    frame = _read_exact(sock, ln)
                    yield decode_envelopes(_json_table(frame),
                                           payload=payload,
                                           tx_index=tx_index)
            finally:
                sock.close()

        meta = BlockMetadata(num_rows=None, size_bytes=None,
                             exec_stats=None, input_files=None)
        return [ReadTask(read_fn, meta)]


def stream_debezium_socket(host: str, port: int,
                           tx_index: tuple[np.ndarray, np.ndarray],
                           payload: pa.Schema = SEQ_SCHEMA,
                           connect_timeout_s: float = 10.0):
    """Unbounded Dataset of engine change events from a live
    Debezium-JSON socket feed — the network adapter a real consumer
    points at a connector's output."""
    import ray.data

    return ray.data.read_datasource(
        DebeziumSocketDatasource(host, port, tx_index, payload,
                                 connect_timeout_s),
        override_num_blocks=1)
