"""Public CDC wire-format adapter #2: the MySQL binary log itself.

rook tails a live MySQL server through mysql-binlog-connector-java
(rook-source-mysql/.../MySQLReplicationStream.java:71-120 — host/port/
user/password → ``BinaryLogClient``; :255-274 — rows-event grouping
into per-tx mutations).  ``rookray.wire`` covers the Debezium-JSON
restatement of that stream; this module speaks the underlying PUBLIC
binary format (binlog v4, as documented in the MySQL Internals manual,
"Binary log file format" / "Row Based Replication") so a recorded
``mysqlbinlog``-style dump can drive the lake with no JSON middleman.

Scope — the event vocabulary a row-based CDC consumer actually needs
(the same subset BinaryLogClient surfaces to rook):

====================  ====  =========================================
FORMAT_DESCRIPTION    0x0f  file preamble; carries the checksum alg
ROTATE                0x04  end-of-file pointer to the next file
GTID_LOG_EVENT        0x21  transaction id (SID uuid + GNO)
QUERY ("BEGIN")       0x02  statement-transaction open
TABLE_MAP             0x13  table id → (db, table, column types/meta)
WRITE_ROWS v2         0x1e  insert images
UPDATE_ROWS v2        0x1f  before→after image pairs
DELETE_ROWS v2        0x20  delete images
XID                   0x10  transaction commit
====================  ====  =========================================

Every event is the real v4 layout — 19-byte common header
(timestamp, type, server_id, event_size, log_pos, flags), typed
post-header/body, and a trailing CRC32 when the FDE declares
``BINLOG_CHECKSUM_ALG_CRC32`` (verified on decode).  Rows events use
the v2 shape (6-byte table id, 2-byte flags, 2-byte extra-data length,
length-encoded column count, columns-present bitmap, per-image null
bitmap).  Column values use the standard row-image encodings: TINY /
SHORT / LONG / LONGLONG little-endian, FLOAT / DOUBLE IEEE LE, VARCHAR
with a 1/2-byte length prefix chosen by the declared max length, BLOB
with a metadata-sized length prefix.  List columns (the engine's
``tokens``) travel as BLOB cells holding the packed little-endian
element array — the standard trick for vector payloads in a relational
changelog (a real deployment would declare the column VARBINARY).

Faithful constraints this module keeps (because a real consumer must):

- **TABLE_MAP carries NO column names.**  Values map to payload fields
  BY POSITION against the caller-supplied payload schema — exactly the
  reason Debezium needs a schema-history topic.  A file that declares
  FEWER columns than the payload (a pre-DDL segment) decodes the
  missing trailing fields as null (additive evolution); MORE columns
  than the payload is an error.
- **Transactions never span files** — rotation happens at commit
  boundaries, so each file decodes independently (this is what makes
  the decode embarrassingly parallel across files).
- **tx completeness is local**: rows buffer until their XID, so
  ``tx_events`` (the engine's per-tx row count) is exact per file with
  no second pass.

The engine's per-event monotone ``gtid`` int64 packs the binlog
coordinates — (file sequence, event start offset, row-in-event) →
``file_seq << 44 | pos << 12 | row_idx`` — the same coordinates rook
checkpoints (file + position).  MySQL's GTID (SID:GNO) is
per-TRANSACTION and becomes ``tx_id`` (= GNO - 1, matching the
encoder), not the per-row sequence.

Distribution: one decode task per file (``ray.data.read_binary_files``
→ ``map_batches``) — sequential WITHIN a file because the format is a
sequential log (table-map state, tx buffering), parallel ACROSS files,
which is the only parallelism the real artifact offers.  The per-event
parse is tight-loop Python over memoryviews; measured ~45k rows/s ≈
25 MiB/s per core on the flagship payload (the cost is per-event
dispatch: a faithful stream carries GTID/BEGIN/TABLE_MAP/XID around
every statement), so a 16-file fan-out sustains ~400 MiB/s — several
times the binlog write rate of any real server, whose single ordered
stream is the true bound here (rook itself is single-threaded on this
path, MySQLReplicationStream.java:161-179).  The ENCODER
(``binlog_dump``) is the test/bench producer (stand-in for a real
server) and never runs inside a pipeline.
"""

from __future__ import annotations

import os
import re
import struct
import zlib

import numpy as np
import pyarrow as pa

from ray.data.datasource import Datasource

from rookray.schema import (NonAdditiveDDLError, OP_DELETE, OP_INSERT,
                            OP_UPDATE, SEQ_SCHEMA, change_event_schema)

__all__ = ["binlog_dump", "decode_binlog_file", "read_binlog",
           "BinlogParser", "BinlogStreamServer", "BinlogSocketDatasource",
           "stream_binlog_socket", "BinlogFormatError", "BinlogDDLError"]

MAGIC = b"\xfebin"

# event type codes (MySQL Internals: Binlog Event Type)
QUERY_EVENT = 0x02
ROTATE_EVENT = 0x04
FORMAT_DESCRIPTION_EVENT = 0x0F
XID_EVENT = 0x10
TABLE_MAP_EVENT = 0x13
WRITE_ROWS_EVENT_V2 = 0x1E
UPDATE_ROWS_EVENT_V2 = 0x1F
DELETE_ROWS_EVENT_V2 = 0x20
GTID_LOG_EVENT = 0x21

_ROWS_EVENTS = {WRITE_ROWS_EVENT_V2: OP_INSERT,
                UPDATE_ROWS_EVENT_V2: OP_UPDATE,
                DELETE_ROWS_EVENT_V2: OP_DELETE}

# column type codes (MySQL Internals: Protocol::ColumnType)
T_TINY, T_SHORT, T_LONG, T_FLOAT, T_DOUBLE = 1, 2, 3, 4, 5
T_LONGLONG = 8
T_VARCHAR = 15
T_BLOB = 252

HEADER_LEN = 19
CHECKSUM_ALG_OFF = 0
CHECKSUM_ALG_CRC32 = 1

#: engine-gtid packing: bits [44,63) file sequence, [12,44) event start
#: offset (binlog files cap at 4 GiB so offsets fit 32 bits), [0,12)
#: row-within-event.
_POS_BITS, _ROW_BITS = 32, 12
_MAX_FILE_SEQ = 1 << (63 - _POS_BITS - _ROW_BITS)

_SERVER_VERSION = b"8.0.36-rookray"
_SID = bytes(range(16))  # fixed source uuid for deterministic dumps


def _lenenc(n: int) -> bytes:
    """Length-encoded integer (Protocol::LengthEncodedInteger)."""
    if n < 0xFB:
        return bytes([n])
    if n < 1 << 16:
        return b"\xfc" + struct.pack("<H", n)
    if n < 1 << 24:
        return b"\xfd" + struct.pack("<I", n)[:3]
    return b"\xfe" + struct.pack("<Q", n)


def _read_lenenc(b: memoryview, o: int) -> tuple[int, int]:
    c = b[o]
    if c < 0xFB:
        return c, o + 1
    if c == 0xFC:
        return struct.unpack_from("<H", b, o + 1)[0], o + 3
    if c == 0xFD:
        return int.from_bytes(b[o + 1:o + 4], "little"), o + 4
    return struct.unpack_from("<Q", b, o + 1)[0], o + 9


# --------------------------------------------------- type dispatch

class _Col:
    """Per-column wire codec chosen from the Arrow payload field."""

    __slots__ = ("mysql_type", "meta", "enc", "dec")

    def __init__(self, mysql_type, meta, enc, dec):
        self.mysql_type, self.meta = mysql_type, meta
        self.enc, self.dec = enc, dec


def _varchar_codec(max_len: int = 1024) -> _Col:
    two = max_len > 255
    fmt = "<H" if two else "<B"
    w = 2 if two else 1

    def enc(v: str) -> bytes:
        raw = v.encode("utf-8")
        return struct.pack(fmt, len(raw)) + raw

    def dec(b: memoryview, o: int):
        n = struct.unpack_from(fmt, b, o)[0]
        o += w
        return str(b[o:o + n], "utf-8"), o + n

    # VARCHAR metadata = declared max length, 2 bytes LE
    return _Col(T_VARCHAR, struct.pack("<H", max_len), enc, dec)


def _int_codec(code: int, fmt: str, size: int) -> _Col:
    def enc(v) -> bytes:
        return struct.pack(fmt, int(v))

    def dec(b: memoryview, o: int):
        return struct.unpack_from(fmt, b, o)[0], o + size

    return _Col(code, b"", enc, dec)


def _float_codec(code: int, fmt: str, size: int) -> _Col:
    def enc(v) -> bytes:
        return struct.pack(fmt, float(v))

    def dec(b: memoryview, o: int):
        return struct.unpack_from(fmt, b, o)[0], o + size

    # FLOAT/DOUBLE metadata = 1 byte storage size
    return _Col(code, bytes([size]), enc, dec)


def _blob_codec(np_dtype: str | None) -> _Col:
    """BLOB with a 4-byte length prefix; ``np_dtype`` set → the cell is
    a packed little-endian element array (the engine's list columns)."""

    def enc(v) -> bytes:
        raw = (np.asarray(v, dtype=np_dtype).tobytes() if np_dtype
               else bytes(v))
        return struct.pack("<I", len(raw)) + raw

    def dec(b: memoryview, o: int):
        n = struct.unpack_from("<I", b, o)[0]
        o += 4
        raw = bytes(b[o:o + n])
        if np_dtype:
            return np.frombuffer(raw, dtype=np_dtype), o + n
        return raw, o + n

    # BLOB metadata = 1 byte: width of the length prefix
    return _Col(T_BLOB, b"\x04", enc, dec)


_NP_ELEM = {pa.int8(): "<i1", pa.int16(): "<i2", pa.int32(): "<i4",
            pa.int64(): "<i8", pa.float32(): "<f4", pa.float64(): "<f8"}


def _codec_for(t: pa.DataType) -> _Col:
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return _varchar_codec()
    if pa.types.is_int8(t):
        return _int_codec(T_TINY, "<b", 1)
    if pa.types.is_int16(t):
        return _int_codec(T_SHORT, "<h", 2)
    if pa.types.is_int32(t):
        return _int_codec(T_LONG, "<i", 4)
    if pa.types.is_int64(t):
        return _int_codec(T_LONGLONG, "<q", 8)
    if pa.types.is_float32(t):
        return _float_codec(T_FLOAT, "<f", 4)
    if pa.types.is_float64(t):
        return _float_codec(T_DOUBLE, "<d", 8)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        elem = _NP_ELEM.get(t.value_type)
        if elem is None:
            raise TypeError(f"unsupported list element type {t.value_type}")
        return _blob_codec(elem)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return _blob_codec(None)
    raise TypeError(f"no binlog codec for Arrow type {t}")


# --------------------------------------------------------- encoder

class _FileWriter:
    """One binlog file: magic + FDE, then events with running log_pos
    and trailing CRC32 — the layout a real 8.0 server writes."""

    def __init__(self, path: str, server_id: int = 1):
        self.f = open(path, "wb")
        self.f.write(MAGIC)
        self.pos = len(MAGIC)
        self.server_id = server_id
        self._fde()

    def event(self, etype: int, body: bytes, server_id: int | None = None):
        size = HEADER_LEN + len(body) + 4  # + CRC32
        end = self.pos + size
        header = struct.pack("<IBIIIH", 0, etype,
                             server_id if server_id is not None
                             else self.server_id, size, end & 0xFFFFFFFF, 0)
        crc = zlib.crc32(header + body) & 0xFFFFFFFF
        self.f.write(header + body + struct.pack("<I", crc))
        start, self.pos = self.pos, end
        return start

    def _fde(self):
        # post-header length per event type 1..40 (values for the
        # types we emit; 0 elsewhere is tolerated by consumers that,
        # like this module's decoder, bound every event by event_size)
        phl = bytearray(40)
        phl[QUERY_EVENT - 1] = 13
        phl[ROTATE_EVENT - 1] = 8
        phl[FORMAT_DESCRIPTION_EVENT - 1] = 84
        phl[TABLE_MAP_EVENT - 1] = 8
        phl[WRITE_ROWS_EVENT_V2 - 1] = 10
        phl[UPDATE_ROWS_EVENT_V2 - 1] = 10
        phl[DELETE_ROWS_EVENT_V2 - 1] = 10
        phl[GTID_LOG_EVENT - 1] = 42
        body = (struct.pack("<H", 4)
                + _SERVER_VERSION.ljust(50, b"\x00")
                + struct.pack("<I", 0)
                + bytes([HEADER_LEN])
                + bytes(phl)
                + bytes([CHECKSUM_ALG_CRC32]))
        self.event(FORMAT_DESCRIPTION_EVENT, body)

    def close(self, next_file: str | None):
        if next_file is not None:
            self.event(ROTATE_EVENT,
                       struct.pack("<Q", len(MAGIC)) + next_file.encode())
        self.f.close()


def _null_bitmap(vals: list) -> bytes:
    bm = bytearray((len(vals) + 7) // 8)
    for i, v in enumerate(vals):
        if v is None:
            bm[i // 8] |= 1 << (i % 8)
    return bytes(bm)


def _image(vals: list, codecs: list[_Col]) -> bytes:
    out = bytearray(_null_bitmap(vals))
    for v, c in zip(vals, codecs):
        if v is not None:
            out += c.enc(v)
    return bytes(out)


def binlog_dump(events: pa.Table, out_dir: str, n_files: int = 4,
                basename: str = "rookray-bin",
                rows_per_event: int = 64,
                evolve_gtid: int | None = None,
                pre_evolution_columns: int | None = None,
                start_number: int = 1) -> dict:
    """Serialize a change-event table into genuine binlog v4 files
    (``<basename>.000001`` …), rotating at TRANSACTION boundaries only.
    Deterministic: same input → byte-identical files.
    ``start_number`` offsets the file numbering — egress appends new
    dumps to a relay directory whose coordinate space is the file
    sequence, so numbering must continue where the directory left off.

    ``evolve_gtid``/``pre_evolution_columns`` reproduce an additive DDL
    mid-stream: transactions whose first gtid is below the threshold
    declare only the first N columns in their TABLE_MAPs (the column
    must be all-null there — enforced)."""
    os.makedirs(out_dir, exist_ok=True)
    payload = pa.schema([(f.name, f.type)
                         for f in events.schema.field("after").type])
    codecs = [_codec_for(f.type) for f in payload]
    rows = events.to_pylist()

    # transaction runs (events arrive gtid-ordered; tx rows contiguous)
    txs: list[list[dict]] = []
    for r in rows:
        if txs and txs[-1][0]["tx_id"] == r["tx_id"]:
            txs[-1].append(r)
        else:
            txs.append([r])

    per_file = -(-len(txs) // max(1, n_files)) or 1
    paths = []
    table_ids: dict[tuple[str, str], int] = {}
    fi = start_number - 1
    for start in range(0, len(txs), per_file):
        fi += 1
        name = f"{basename}.{fi:06d}"
        path = os.path.join(out_dir, name)
        paths.append(path)
        w = _FileWriter(path)
        for tx in txs[start:start + per_file]:
            # DDL cannot happen inside a transaction, so a tx that
            # touches the evolve point is already post-DDL: gate on the
            # tx's LAST gtid
            ncols = len(payload)
            if (evolve_gtid is not None
                    and tx[-1]["gtid"] < evolve_gtid):
                ncols = pre_evolution_columns or len(payload)
            _write_tx(w, tx, payload, codecs, ncols, table_ids,
                      rows_per_event)
        nxt = (f"{basename}.{fi + 1:06d}"
               if start + per_file < len(txs) else None)
        w.close(nxt)
    return {"files": paths, "n_transactions": len(txs)}


def _write_tx(w: _FileWriter, tx: list[dict], payload: pa.Schema,
              codecs: list[_Col], ncols: int,
              table_ids: dict, rows_per_event: int):
    gno = tx[0]["tx_id"] + 1  # GNO is 1-based
    server_id = tx[0]["server_id"]
    gtid_body = (b"\x01" + _SID + struct.pack("<q", gno)
                 + b"\x02" + struct.pack("<qq", gno - 1, gno))
    w.event(GTID_LOG_EVENT, gtid_body, server_id)
    db = tx[0]["db"].encode()
    # QUERY post-header: thread_id, exec_time, schema_len, error_code,
    # status_vars_len; body: schema NUL query
    w.event(QUERY_EVENT,
            struct.pack("<IIBHH", 0, 0, len(db), 0, 0) + db + b"\x00"
            + b"BEGIN", server_id)

    # group consecutive same-(db, table, op) rows into one ROWS event
    i = 0
    while i < len(tx):
        j = i
        while (j < len(tx) and j - i < rows_per_event
               and tx[j]["db"] == tx[i]["db"]
               and tx[j]["table"] == tx[i]["table"]
               and tx[j]["op"] == tx[i]["op"]
               and tx[j]["server_id"] == tx[i]["server_id"]):
            j += 1
        chunk = tx[i:j]
        i = j
        key = (chunk[0]["db"], chunk[0]["table"])
        tid = table_ids.setdefault(key, len(table_ids) + 100)
        # relay-log semantics: each event header carries its ORIGIN
        # server id (multi-source rows can interleave inside one tx)
        srv = chunk[0]["server_id"]
        _write_table_map(w, tid, key[0], key[1], codecs[:ncols], srv)
        _write_rows(w, tid, chunk, payload, codecs, ncols, srv)
    w.event(XID_EVENT, struct.pack("<Q", gno), server_id)


def _write_table_map(w: _FileWriter, tid: int, db: str, table: str,
                     codecs: list[_Col], server_id: int):
    meta = b"".join(c.meta for c in codecs)
    body = (tid.to_bytes(6, "little") + struct.pack("<H", 1)
            + bytes([len(db.encode())]) + db.encode() + b"\x00"
            + bytes([len(table.encode())]) + table.encode() + b"\x00"
            + _lenenc(len(codecs))
            + bytes(c.mysql_type for c in codecs)
            + _lenenc(len(meta)) + meta
            + b"\xff" * ((len(codecs) + 7) // 8))  # all nullable
    w.event(TABLE_MAP_EVENT, body, server_id)


def _vals(img: dict | None, payload: pa.Schema, ncols: int) -> list:
    vals = [None if img is None else img.get(n)
            for n in payload.names[:ncols]]
    if img is not None:
        for n in payload.names[ncols:]:
            if img.get(n) is not None:
                raise ValueError(
                    f"column {n!r} non-null before its DDL point")
    return vals


def _write_rows(w: _FileWriter, tid: int, chunk: list[dict],
                payload: pa.Schema, codecs: list[_Col], ncols: int,
                server_id: int):
    op = chunk[0]["op"]
    etype = {OP_INSERT: WRITE_ROWS_EVENT_V2,
             OP_UPDATE: UPDATE_ROWS_EVENT_V2,
             OP_DELETE: DELETE_ROWS_EVENT_V2}[op]
    present = b"\xff" * ((ncols + 7) // 8)
    body = bytearray(tid.to_bytes(6, "little"))
    body += struct.pack("<HH", 0, 2)  # flags, extra-data len (self-incl.)
    body += _lenenc(ncols) + present
    if etype == UPDATE_ROWS_EVENT_V2:
        body += present  # after-image columns-present bitmap
    cs = codecs[:ncols]
    for r in chunk:
        if op == OP_INSERT:
            body += _image(_vals(r["after"], payload, ncols), cs)
        elif op == OP_DELETE:
            body += _image(_vals(r["before"], payload, ncols), cs)
        else:
            body += _image(_vals(r["before"], payload, ncols), cs)
            body += _image(_vals(r["after"], payload, ncols), cs)
    w.event(etype, bytes(body), server_id)


# --------------------------------------------------------- decoder

class BinlogFormatError(ValueError):
    pass


class BinlogDDLError(NonAdditiveDDLError, BinlogFormatError):
    """Non-additive DDL detected from TABLE_MAP changes (structured —
    see :class:`rookray.schema.NonAdditiveDDLError` for the fields and
    the rename escape hatch).  TABLE_MAP carries widths and types but
    NO names, so a rename is invisible here; what IS detectable: a
    width decrease against an earlier TABLE_MAP of the same table in
    the stream (column drop), a per-position mysql-type change, and a
    table wider than the payload schema."""

    def __init__(self, db: str, table: str, kind: str, detail: str):
        NonAdditiveDDLError.__init__(self, "binlog", db, table, kind,
                                     detail)
        self._ctor_args = (db, table, kind, detail)


def _file_seq(path: str) -> int:
    m = re.search(r"\.(\d+)$", os.path.basename(path))
    if not m:
        raise BinlogFormatError(
            f"binlog file name must end in a numeric sequence: {path}")
    seq = int(m.group(1))
    if not 0 < seq < _MAX_FILE_SEQ:
        raise BinlogFormatError(f"file sequence {seq} out of range")
    return seq


def _read_image(b: memoryview, o: int, codecs: list[_Col]) -> tuple[list, int]:
    n = len(codecs)
    bm = b[o:o + (n + 7) // 8]
    o += (n + 7) // 8
    vals = []
    for i, c in enumerate(codecs):
        if bm[i // 8] >> (i % 8) & 1:
            vals.append(None)
        else:
            v, o = c.dec(b, o)
            vals.append(v)
    return vals, o


class BinlogParser:
    """INCREMENTAL binlog-v4 parser — the engine's ``BinaryLogClient``
    analog (MySQLReplicationStream.java:71-120 registers exactly this:
    a callback-per-event client on one ordered byte stream).

    ``feed(chunk)`` accepts raw bytes in ARBITRARY chunk sizes (a TCP
    receive loop never aligns to event boundaries) and returns a
    change-event table whenever transactions COMMITTED inside the
    chunk — rows only ever surface whole transactions, so a consumer
    that applies each returned table keeps rook's tx-atomic delivery
    guarantee on a live wire.  ``finish()`` validates a clean EOF
    (or, with ``allow_partial_tail``, drops a torn trailing tx).

    ROTATE events are honored mid-stream: a server streaming several
    files back to back (each with its own magic + FDE) re-anchors the
    file sequence, so the coordinate-packed gtids stay monotone across
    the rotation — the parser never needs to see file boundaries."""

    def __init__(self, file_name: str, payload: pa.Schema = SEQ_SCHEMA,
                 allow_partial_tail: bool = False):
        self.payload = payload
        self.allow_partial_tail = allow_partial_tail
        self._codecs = [_codec_for(f.type) for f in payload]
        self._schema = change_event_schema(payload)
        self._ps = pa.struct(list(payload))

        self._buf = bytearray()
        self._expect_magic = True
        self._fseq = _file_seq(file_name)
        self._name = file_name
        self._pos = 0               # offset of buffer start in file
        self._checksum = CHECKSUM_ALG_OFF
        self._tables: dict[int, tuple[str, str, int]] = {}
        # widest TABLE_MAP seen per (db, table): a later narrower one
        # is a column drop (non-additive DDL) — see BinlogDDLError
        self._widths: dict[tuple[str, str], int] = {}
        # identity-space guard: GTID'd (gno-1) and GTID-less (xid-1)
        # transactions must not mix in one stream — see _flush_tx
        self._saw_gtid_tx = False
        self._saw_xid_tx = False
        self._cur_gno: int | None = None
        self._txbuf: list[tuple] = []
        self._out: list[tuple] = []     # committed rows pending emission
        self._finished = False

    # ------------------------------------------------------ feeding

    def feed(self, chunk: bytes) -> "pa.Table | None":
        """Consume a chunk; return a table of change events for every
        transaction that committed inside it (None when none did)."""
        if self._finished:
            raise BinlogFormatError("feed() after finish()")
        self._buf += chunk
        while True:
            if self._expect_magic:
                if len(self._buf) < 4:
                    break
                if bytes(self._buf[:4]) != MAGIC:
                    raise BinlogFormatError(
                        f"{self._name}: bad magic {bytes(self._buf[:4])!r}")
                del self._buf[:4]
                self._pos = 4
                self._expect_magic = False
                continue
            if len(self._buf) < HEADER_LEN:
                break
            _, etype, srv_id, esize, _, _ = struct.unpack_from(
                "<IBIIIH", self._buf, 0)
            if esize < HEADER_LEN:
                raise BinlogFormatError(
                    f"{self._name}: bad event size {esize} @ {self._pos}")
            if len(self._buf) < esize:
                break
            # copy the event out to IMMUTABLE bytes before consuming the
            # buffer: decoded values (np.frombuffer blob arrays) alias
            # the event memory and must outlive this resizable buffer
            ev = bytes(memoryview(self._buf)[:esize])
            del self._buf[:esize]
            self._event(memoryview(ev), etype, srv_id)
            self._pos += esize
        return self._emit()

    def finish(self) -> "pa.Table | None":
        """End of stream: raise on a torn tail (leftover bytes or an
        open transaction) unless ``allow_partial_tail``; return any
        final committed rows."""
        self._finished = True
        torn = bool(self._buf)
        open_tx = bool(self._txbuf) or self._cur_gno is not None
        if (torn or open_tx) and not self.allow_partial_tail:
            what = ("inside an event" if torn else
                    "inside an open transaction")
            raise BinlogFormatError(f"{self._name}: stream ends {what}")
        self._txbuf.clear()
        self._buf.clear()
        return self._emit()

    # ------------------------------------------------- event handling

    def _event(self, ev: memoryview, etype: int, srv_id: int):
        body_end = len(ev)
        if etype == FORMAT_DESCRIPTION_EVENT:
            self._checksum = ev[body_end - 5]
            if self._checksum not in (CHECKSUM_ALG_OFF,
                                      CHECKSUM_ALG_CRC32):
                raise BinlogFormatError(
                    f"{self._name}: unsupported checksum alg "
                    f"{self._checksum}")
        elif self._checksum == CHECKSUM_ALG_CRC32:
            body_end -= 4
            want = struct.unpack_from("<I", ev, body_end)[0]
            got = zlib.crc32(ev[:body_end]) & 0xFFFFFFFF
            if want != got:
                raise BinlogFormatError(
                    f"{self._name}: CRC mismatch @ {self._pos} "
                    f"(want {want:#x}, got {got:#x})")
        o = HEADER_LEN
        b = ev

        if etype == GTID_LOG_EVENT:
            if self._txbuf:
                raise BinlogFormatError(
                    f"{self._name}: GTID inside an open transaction "
                    f"@ {self._pos}")
            self._cur_gno = struct.unpack_from("<q", b, o + 17)[0]
        elif etype == TABLE_MAP_EVENT:
            self._table_map(b, o)
        elif etype in _ROWS_EVENTS:
            self._rows(b, o, body_end, etype, srv_id)
        elif etype == XID_EVENT:
            xid = struct.unpack_from("<Q", b, o)[0]
            self._flush_tx(xid)
            self._cur_gno = None
        elif etype == ROTATE_EVENT:
            # next-file pointer: re-anchor the coordinate sequence and
            # expect the next file's magic + FDE on the same stream
            nxt = str(bytes(b[o + 8:body_end]), "utf-8")
            self._fseq = _file_seq(nxt)
            self._name = nxt
            self._expect_magic = True
        # QUERY (BEGIN), FDE: no row content

    def _table_map(self, b: memoryview, o: int):
        payload, codecs = self.payload, self._codecs
        tid = int.from_bytes(b[o:o + 6], "little")
        p = o + 8
        dlen = b[p]
        db = str(bytes(b[p + 1:p + 1 + dlen]), "utf-8")
        p += 2 + dlen
        tlen = b[p]
        table = str(bytes(b[p + 1:p + 1 + tlen]), "utf-8")
        p += 2 + tlen
        ncols, p = _read_lenenc(b, p)
        if ncols > len(payload):
            raise BinlogDDLError(
                db, table, "payload-narrower",
                f"{self._name}: table declares {ncols} columns; "
                f"payload schema has {len(payload)} — positional "
                "mapping needs payload ⊇ table")
        seen = self._widths.get((db, table))
        if seen is not None and ncols < seen:
            raise BinlogDDLError(
                db, table, "column-drop",
                f"{self._name}: TABLE_MAP declares {ncols} columns "
                f"after an earlier one declared {seen} — a column was "
                "dropped mid-stream")
        self._widths[(db, table)] = ncols
        types = bytes(b[p:p + ncols])
        for i in range(ncols):
            if types[i] != codecs[i].mysql_type:
                raise BinlogDDLError(
                    db, table, "type-change",
                    f"{self._name}: column {i} is mysql type "
                    f"{types[i]}, payload field {payload.names[i]!r} "
                    f"expects {codecs[i].mysql_type}")
        self._tables[tid] = (db, table, ncols)

    def _rows(self, b: memoryview, o: int, body_end: int, etype: int,
              srv_id: int):
        op = _ROWS_EVENTS[etype]
        tid = int.from_bytes(b[o:o + 6], "little")
        if tid not in self._tables:
            raise BinlogFormatError(
                f"{self._name}: rows event for unmapped table id {tid}")
        db, table, ncols = self._tables[tid]
        p = o + 8
        extra = struct.unpack_from("<H", b, p)[0]
        p += extra  # extra-data length includes its own 2 bytes
        width, p = _read_lenenc(b, p)
        if width != ncols:
            raise BinlogFormatError(
                f"{self._name}: rows-event width {width} != table map "
                f"{ncols}")
        p += (width + 7) // 8  # columns-present bitmap (writers set all)
        if etype == UPDATE_ROWS_EVENT_V2:
            p += (width + 7) // 8
        cs = self._codecs[:ncols]
        pad = [None] * (len(self.payload) - ncols)
        ridx = 0
        epos = self._pos
        while p < body_end:
            if ridx >= (1 << _ROW_BITS):
                raise BinlogFormatError(
                    f"{self._name}: >{1 << _ROW_BITS} rows in one event")
            before = after = None
            if op != OP_INSERT:
                v, p = _read_image(b, p, cs)
                before = v + pad
            if op != OP_DELETE:
                v, p = _read_image(b, p, cs)
                after = v + pad
            self._txbuf.append((epos, ridx, srv_id, db, table, op,
                                before, after))
            ridx += 1

    def _flush_tx(self, xid_gno: int | None):
        # both paths share the GNO-is-1-based convention: a transaction
        # without a GTID_LOG_EVENT (gtid_mode=OFF) falls back to the
        # XID value MINUS ONE, matching the encoder's XID=GNO layout.
        # XID and GNO are INDEPENDENT server counters though, so a
        # stream mixing both kinds (gtid_mode toggled online) could
        # assign two different transactions the same identity and
        # silently wedge the completeness watermark — refuse it.
        if self._cur_gno is not None:
            self._saw_gtid_tx = True
        else:
            self._saw_xid_tx = True
        if self._saw_gtid_tx and self._saw_xid_tx:
            raise BinlogFormatError(
                f"{self._name}: stream mixes GTID'd and GTID-less "
                "transactions (gtid_mode toggled mid-stream?) — the "
                "gno-1 and xid-1 identity spaces are independent "
                "counters and can collide; re-dump from a coordinate "
                "past the toggle")
        tx_id = (self._cur_gno - 1) if self._cur_gno is not None else (
            (xid_gno - 1) if xid_gno is not None else 0)
        n = len(self._txbuf)
        fseq = self._fseq
        for seq, (epos, ridx, srv, db, table, op, before, after) in \
                enumerate(self._txbuf):
            gtid = ((fseq << (_POS_BITS + _ROW_BITS))
                    | (epos << _ROW_BITS) | ridx)
            img = before if before is not None else after
            key = None if img is None else img[0]
            self._out.append((gtid, tx_id, seq, n, srv, db, table, op,
                              key, before, after))
        self._txbuf.clear()

    # -------------------------------------------------------- output

    def _emit(self) -> "pa.Table | None":
        if not self._out:
            return None
        rows, self._out = self._out, []
        cols = list(zip(*rows))
        payload, ps = self.payload, self._ps

        def struct_col(images) -> pa.Array:
            mask = np.fromiter((im is None for im in images), bool,
                               count=len(images))
            arrs = [pa.array([None if im is None else im[i]
                              for im in images], type=f.type)
                    for i, f in enumerate(payload)]
            return pa.StructArray.from_arrays(
                arrs, fields=list(payload), mask=pa.array(mask))

        return pa.table({
            "gtid": pa.array(cols[0], pa.int64()),
            "tx_id": pa.array(cols[1], pa.int64()),
            "seq_in_tx": pa.array(cols[2], pa.int32()),
            "tx_events": pa.array(cols[3], pa.int32()),
            "server_id": pa.array(cols[4], pa.int64()),
            "db": pa.array(cols[5], pa.string()),
            "table": pa.array(cols[6], pa.string()),
            "op": pa.array(cols[7], pa.int8()),
            "key": pa.array(cols[8], pa.string()),
            "before": struct_col(cols[9]),
            "after": struct_col(cols[10]),
        }, schema=self._schema)

    def empty_table(self) -> pa.Table:
        return self._schema.empty_table()


def decode_binlog_file(data: bytes, path: str,
                       payload: pa.Schema = SEQ_SCHEMA,
                       allow_partial_tail: bool = False) -> pa.Table:
    """Decode ONE recorded binlog file into engine change events
    (``change_event_schema(payload)``) — the batch wrapper over
    :class:`BinlogParser`.  Sequential by necessity (the format is a
    log with carried state); parallelism lives across files in
    :func:`read_binlog`.

    ``allow_partial_tail`` drops a trailing transaction whose XID (or
    final event) is cut off — the live-tail-copy case; the default
    raises, the recorded-dump case."""
    p = BinlogParser(path, payload=payload,
                     allow_partial_tail=allow_partial_tail)
    parts = []
    t = p.feed(data)
    if t is not None:
        parts.append(t)
    t = p.finish()
    if t is not None:
        parts.append(t)
    if not parts:
        return p.empty_table()
    return pa.concat_tables(parts)


def binlog_files_above(paths: list[str], watermark: int) -> list[str]:
    """Coordinate-checkpoint resume — the ``BinaryLogClient``
    setBinlogFilename/setBinlogPosition analog (rook checkpoints
    exactly these coordinates between restarts): keep only files that
    can hold events ABOVE the lake's committed watermark.  Every gtid
    in file ``k`` lies in ``[k << 44, (k+1) << 44)``, so a file whose
    whole range sits at or below the watermark is skipped WITHOUT
    opening it; a partially-overlapping file is re-presented in full
    and the lake's watermark filter drops the already-applied prefix
    (overlap is correctness-free, skipped bytes are the win)."""
    if watermark is None or watermark < 0:
        return list(paths)
    shift = _POS_BITS + _ROW_BITS
    return [p for p in paths
            if (((_file_seq(p) + 1) << shift) - 1) > watermark]


def read_binlog(paths: list[str], payload: pa.Schema = SEQ_SCHEMA,
                allow_partial_tail: bool = False) -> "ray.data.Dataset":
    """A ``ray.data.Dataset`` of engine change events decoded from
    binlog v4 files — one decode task per file (the format's natural
    parallel grain; transactions never cross files)."""
    import ray
    import ray.data

    raw = ray.data.read_binary_files(paths, include_paths=True)
    schema = change_event_schema(payload)

    def decode(batch: pa.Table) -> pa.Table:
        parts = [decode_binlog_file(d.as_py() if hasattr(d, "as_py") else d,
                                    p,
                                    payload=payload,
                                    allow_partial_tail=allow_partial_tail)
                 for d, p in zip(batch.column("bytes"),
                                 batch.column("path").to_pylist())]
        parts = [t for t in parts if t.num_rows]
        if not parts:
            return schema.empty_table()
        return pa.concat_tables(parts)

    return raw.map_batches(decode, batch_format="pyarrow")


# ------------------------------------------------------ live tail

class BinlogStreamServer:
    """Test/bench producer for the live path: serves RAW binlog bytes
    over TCP in deliberately unaligned chunks (a real server's send
    boundaries never match event boundaries).  ``push_file`` enqueues a
    recorded file's bytes; files stream back to back, the ROTATE event
    at each file's end re-anchoring the parser.  One consumer (a
    replication connection is one ordered stream)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 chunk_size: int = 997):
        import queue
        import socket
        import threading

        self._q: "queue.Queue" = queue.Queue()
        self._chunk = chunk_size
        self._srv = socket.create_server((host, port))
        self.host, self.port = self._srv.getsockname()[:2]
        self._thread = threading.Thread(target=self._serve, daemon=True,
                                        name="rookray-binlog-server")
        self._thread.start()

    def push_file(self, path: str) -> None:
        self._q.put(open(path, "rb").read())

    def close(self) -> None:
        self._q.put(b"")

    def _serve(self) -> None:
        conn, _ = self._srv.accept()
        try:
            while True:
                data = self._q.get()
                if not data:
                    break
                for i in range(0, len(data), self._chunk):
                    conn.sendall(data[i:i + self._chunk])
        finally:
            conn.close()
            self._srv.close()


class BinlogSocketDatasource(Datasource):
    """Unbounded change-event stream from a live binlog wire: ONE read
    task (rook's single replication connection) connects, feeds raw
    bytes through :class:`BinlogParser`, and yields one block per
    batch of COMMITTED transactions — backpressure is physical (the
    task reads the socket only when the executor pulls, so a fast
    producer blocks in send() on TCP flow control, rook's
    synchronous-delivery bound)."""

    def __init__(self, host: str, port: int, first_file: str,
                 payload: pa.Schema = SEQ_SCHEMA,
                 connect_timeout_s: float = 10.0,
                 recv_bytes: int = 1 << 16):
        self.host, self.port = host, port
        self.first_file = first_file
        self.payload = payload
        self.connect_timeout_s = connect_timeout_s
        self.recv_bytes = recv_bytes

    def get_name(self) -> str:
        return f"BinlogSocket({self.host}:{self.port})"

    def estimate_inmemory_data_size(self):
        return None  # unbounded

    def get_read_tasks(self, parallelism: int):
        from ray.data.block import BlockMetadata
        from ray.data.datasource import ReadTask

        host, port = self.host, self.port
        timeout, nrecv = self.connect_timeout_s, self.recv_bytes
        first_file, payload = self.first_file, self.payload

        def read_fn():
            import socket
            import time as _time

            deadline = _time.monotonic() + timeout
            sock = None
            while sock is None:
                try:
                    sock = socket.create_connection((host, port),
                                                    timeout=2.0)
                except OSError:
                    if _time.monotonic() >= deadline:
                        raise TimeoutError(
                            f"could not connect to {host}:{port} within "
                            f"{timeout}s")
                    _time.sleep(0.05)
            sock.settimeout(None)  # block on recv: the stream is live
            parser = BinlogParser(first_file, payload=payload,
                                  allow_partial_tail=True)
            try:
                while True:
                    chunk = sock.recv(nrecv)
                    if not chunk:
                        break
                    t = parser.feed(chunk)
                    if t is not None:
                        yield t
                t = parser.finish()
                if t is not None:
                    yield t
            finally:
                sock.close()

        meta = BlockMetadata(num_rows=None, size_bytes=None,
                             exec_stats=None, input_files=None)
        return [ReadTask(read_fn, meta)]


def stream_binlog_socket(host: str, port: int, first_file: str,
                         payload: pa.Schema = SEQ_SCHEMA,
                         connect_timeout_s: float = 10.0):
    """An UNBOUNDED ``ray.data.Dataset`` of change events decoded LIVE
    off a raw binlog TCP stream — the closest sandbox analog of rook's
    BinaryLogClient connection (ends when the producer closes the
    socket; a torn trailing transaction is dropped, exactly what a
    reconnecting client would re-read)."""
    import ray.data

    return ray.data.read_datasource(
        BinlogSocketDatasource(host, port, first_file, payload=payload,
                               connect_timeout_s=connect_timeout_s),
        override_num_blocks=1,
    )
