"""PostgreSQL logical-replication wire-format adapter: ``pgoutput``.

The second database family.  rook tails MySQL's binlog
(rook-source-mysql/.../MySQLReplicationStream.java:71-120); the
PostgreSQL analog of that artifact is the logical streaming
replication protocol with the built-in ``pgoutput`` plugin — the same
wire format Debezium's Postgres connector and native logical
subscribers consume.  This module encodes/decodes recorded replication
streams (XLogData-framed pgoutput messages, exactly the bytes that
flow on a replication connection) into the engine's change-event
schema.

Frame layer (PostgreSQL docs, "Streaming Replication Protocol"):

  ``'w' start_lsn(8) end_lsn(8) send_time(8) payload`` — XLogData
  ``'k' end_lsn(8) send_time(8) reply(1)``              — keepalive

Message layer (PostgreSQL docs, "Logical Streaming Replication
Protocol" → protocol-logicalrep-message-formats; all integers
big-endian, strings NUL-terminated):

  ``'B'`` Begin:    final_lsn(8) commit_ts(8) xid(4)
  ``'C'`` Commit:   flags(1) commit_lsn(8) end_lsn(8) commit_ts(8)
  ``'R'`` Relation: relid(4) namespace(cstr) relname(cstr)
                    replident(1) ncols(2); per column:
                    flags(1) name(cstr) typoid(4) typmod(4)
  ``'I'`` Insert:   relid(4) 'N' TupleData
  ``'U'`` Update:   relid(4) ['K'|'O' TupleData] 'N' TupleData
  ``'D'`` Delete:   relid(4) ('K'|'O') TupleData
  ``'O'`` Origin, ``'Y'`` Type, ``'T'`` Truncate, ``'M'`` Message —
          parsed and skipped (not row mutations)
  ``'S'`` StreamStart: xid(4) first_segment(1) — protocol v2: a LARGE
          in-progress transaction ships as interleavable S..E
          segments; rows buffer per xid
  ``'E'`` StreamStop (ends the current segment)
  ``'c'`` StreamCommit: xid(4) flags(1) commit_lsn(8) end_lsn(8)
          ts(8) — flushes the xid's buffered rows as one transaction
  ``'A'`` StreamAbort: xid(4) subxid(4) — whole-transaction aborts
          discard the buffer; SUBtransaction aborts raise (the engine
          does not track subtransaction boundaries)

  TupleData: ncols(2); per column: ``'n'`` (SQL NULL) | ``'u'``
  (unchanged TOAST value, not sent) | ``'t'`` len(4) + text-format
  bytes.

Mapping into the engine's model:

- ``gtid`` = the DML frame's XLogData **start LSN** — Postgres's
  monotone global coordinate (the thing a replication slot
  checkpoints).  Within a transaction LSNs are increasing but not
  dense; like the binlog adapter, transaction completeness rides on
  buffered counts (rows buffer between Begin and Commit), so the
  watermark's complete-tx detection is exact and only a mid-tx
  resume floor is approximate — transactions never span dump files,
  so file replay never hits that corner.
- ``tx_id`` = the Begin message's ``xid``; ``seq_in_tx``/``tx_events``
  from the per-tx buffer, no side pass needed (the protocol brackets
  every transaction).
- **Relation messages carry column NAMES**, so value mapping is
  name-based against the payload schema — the exact contrast to the
  MySQL TABLE_MAP (positional, no names: ``rookray/binlog.py``), and
  the reason pgoutput needs no schema-history side channel.  Additive
  DDL appears as a re-sent Relation with more columns mid-stream;
  payload columns missing from a relation decode as null
  (pre-evolution files), relation columns missing from the payload
  raise (the engine's append-only evolution contract).
- Values arrive in Postgres **text format** and re-type against the
  payload schema with vectorized Arrow casts per emitted batch;
  array columns parse from their text form (``{1,2,3}``).
- ``'u'`` (unchanged TOAST) resolves from the before image when the
  publisher runs REPLICA IDENTITY FULL, else decodes as null — the
  same degradation every logical consumer documents.
- Postgres has **no per-row server id** (replication origin is per-
  transaction and usually filtered publisher-side), so ``server_id``
  decodes null and server-id routing is unavailable through this
  format — the table filter is the routing tool, stated rather than
  papered over.
- Before images follow the publisher's REPLICA IDENTITY: ``'O'``
  (FULL) → complete before image; ``'K'`` (USING INDEX / pkey) → key
  columns only, non-key columns null; absent (NOTHING) → null before,
  updates key by the after image — all three engine-compatible (keys
  are never null).

The per-event parse is tight-loop Python over memoryviews (the format
is a sequential log), parallel ACROSS files — the same distribution
contract as ``rookray/binlog.py``; typing/casting is vectorized per
emitted batch.  The ENCODER (``pgwal_dump``) is the recorded-stream
producer for tests and benches.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rookray.schema import (NonAdditiveDDLError, OP_DELETE, OP_INSERT,
                            OP_UPDATE, SEQ_SCHEMA, change_event_schema)

__all__ = [
    "pgwal_dump", "PgOutputParser", "PgOutputError", "PgOutputDDLError",
    "decode_pgwal_file",
    "read_pgwal", "pgwal_files_above", "first_lsn", "PgStreamServer",
    "PgSocketDatasource", "stream_pgwal_socket",
]


class PgOutputError(ValueError):
    """Malformed pgoutput stream (truncated frame, unknown relation,
    torn trailing transaction in strict mode, ...)."""


class PgOutputDDLError(NonAdditiveDDLError, PgOutputError):
    """Non-additive DDL detected from Relation re-sends (structured —
    see :class:`rookray.schema.NonAdditiveDDLError`).  Relations carry
    column NAMES, so here renames surface as ``unknown-column`` (the
    old name vanishes, the new one isn't in the payload schema), drops
    as a re-sent Relation missing a previously declared name, and type
    changes as a column whose declared type oid differs from the
    stream's own earlier declaration."""

    def __init__(self, db: str, table: str, kind: str, detail: str):
        NonAdditiveDDLError.__init__(self, "pgoutput", db, table, kind,
                                     detail)
        self._ctor_args = (db, table, kind, detail)


# -------------------------------------------------------------- encoder

_TYPOID = {"string": 25, "int32": 23, "int64": 20, "float": 700,
           "double": 701}


def _typoid(t: pa.DataType) -> int:
    if pa.types.is_list(t):
        return 1007  # int4[] — representative array oid
    return _TYPOID.get(str(t), 25)


def _pg_text(v) -> bytes | None:
    """Python value → Postgres text-format bytes (arrays as
    ``{1,2,3}``)."""
    if v is None:
        return None
    if hasattr(v, "tolist"):
        v = v.tolist()
    if isinstance(v, list):
        return ("{" + ",".join(str(x) for x in v) + "}").encode()
    if isinstance(v, bool):
        return b"t" if v else b"f"
    return str(v).encode()


def _tuple_data(vals: list) -> bytes:
    out = [struct.pack(">H", len(vals))]
    for v in vals:
        b = _pg_text(v)
        if b is None:
            out.append(b"n")
        else:
            out.append(b"t" + struct.pack(">I", len(b)) + b)
    return b"".join(out)


class _PgFileWriter:
    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "wb")

    def frame(self, start_lsn: int, payload: bytes) -> None:
        self._f.write(b"w" + struct.pack(">QQQ", start_lsn, start_lsn,
                                         0) + payload)

    def keepalive(self, lsn: int) -> None:
        self._f.write(b"k" + struct.pack(">QQ", lsn, 0) + b"\x00")

    def close(self) -> None:
        self._f.close()


def _relation_msg(relid: int, ns: str, name: str, replident: bytes,
                  cols: list[tuple[str, pa.DataType]]) -> bytes:
    out = [b"R", struct.pack(">I", relid), ns.encode() + b"\0",
           name.encode() + b"\0", replident,
           struct.pack(">H", len(cols))]
    for i, (cname, ctyp) in enumerate(cols):
        out.append(struct.pack(">B", 1 if i == 0 else 0)
                   + cname.encode() + b"\0"
                   + struct.pack(">Ii", _typoid(ctyp), -1))
    return b"".join(out)


def pgwal_dump(events: pa.Table, out_dir: str, n_files: int = 4,
               replident: str = "full",
               evolve_gtid: int | None = None,
               pre_evolution_columns: int | None = None,
               stream_txs_over: int | None = None,
               stream_segment_rows: int = 8,
               start_number: int = 0) -> dict:
    """Serialize a change-event table into a recorded pgoutput
    replication stream: ``pgwal-%05d.bin`` files of XLogData-framed
    messages, transactions bracketed by Begin/Commit and never
    spanning files, Relation metadata re-sent at each file start (a
    file is a session segment) and re-sent widened at ``evolve_gtid``
    (the pgoutput-native additive-DDL story: transactions below the
    threshold declare only ``pre_evolution_columns`` columns).
    ``replident``: ``"full"`` → 'O' complete before images; ``"key"``
    → 'K' key-only before images.  ``stream_txs_over``: transactions
    with more rows ship as protocol-v2 streamed S..E segments of
    ``stream_segment_rows`` each, closed by a StreamCommit — how a
    real publisher ships transactions too large to buffer.
    ``start_number`` offsets the file numbering so egress can append
    dumps to one relay directory without name collisions (readers
    order segments by first LSN, not by name).
    Deterministic: same input table → byte-identical dump."""
    os.makedirs(out_dir, exist_ok=True)
    rows = events.to_pylist()
    payload_fields = [(f.name, f.type)
                      for f in events.schema.field("after").type]
    names = [n for n, _ in payload_fields]

    txs: list[list[dict]] = []
    for r in rows:
        if txs and txs[-1][0]["tx_id"] == r["tx_id"]:
            txs[-1].append(r)
        else:
            txs.append([r])

    per = -(-len(txs) // max(1, n_files)) or 1
    rel_ids: dict[tuple[str, str], int] = {}

    def relid_of(db: str, table: str) -> int:
        return rel_ids.setdefault((db, table), 16384 + len(rel_ids))

    def cols_for(tx_last_gtid: int) -> list[tuple[str, pa.DataType]]:
        # a tx straddling the DDL boundary declares the WIDE relation
        # (its post-boundary events carry the appended column)
        if (evolve_gtid is not None and pre_evolution_columns is not None
                and tx_last_gtid < evolve_gtid):
            return payload_fields[:pre_evolution_columns]
        return payload_fields

    paths, n_events, n_streamed = [], 0, 0
    ident = b"f" if replident == "full" else b"i"
    for fi in range(0, len(txs), per):
        chunk = txs[fi:fi + per]
        path = os.path.join(out_dir,
                            f"pgwal-{fi // per + start_number:05d}.bin")
        w = _PgFileWriter(path)
        sent: dict[int, int] = {}  # relid → ncols last declared
        for tx in chunk:
            cols = cols_for(tx[-1]["gtid"])
            first, last = tx[0], tx[-1]
            xid = first["tx_id"] & 0xFFFFFFFF
            streamed = (stream_txs_over is not None
                        and len(tx) > stream_txs_over)
            if not streamed:
                w.frame(first["gtid"],
                        b"B" + struct.pack(">QQI", first["gtid"], 0,
                                           xid))

            def row_body(r, xp=b""):
                """DML message body; ``xp`` is the protocol-v2 Int32
                xid prefix carried by every message inside a streamed
                transaction (Relations included)."""
                rid = relid_of(r["db"], r["table"])
                if sent.get(rid) != len(cols):
                    m = _relation_msg(rid, r["db"], r["table"], ident,
                                      cols)
                    w.frame(r["gtid"], m[:1] + xp + m[1:])
                    sent[rid] = len(cols)

                def vals(img):
                    return [None if img is None else img.get(n)
                            for n, _ in cols]

                if r["op"] == OP_INSERT:
                    return (b"I" + xp + struct.pack(">I", rid) + b"N"
                            + _tuple_data(vals(r["after"])))
                if replident == "full":
                    old = b"O" + _tuple_data(vals(r["before"]))
                else:
                    key_only = [r["before"].get(names[0])
                                if i == 0 else None
                                for i, (n, _) in enumerate(cols)]
                    old = b"K" + _tuple_data(key_only)
                if r["op"] == OP_UPDATE:
                    return (b"U" + xp + struct.pack(">I", rid) + old
                            + b"N" + _tuple_data(vals(r["after"])))
                return b"D" + xp + struct.pack(">I", rid) + old

            if streamed:
                # protocol v2: the tx ships as S..E segments while
                # still in progress, then one StreamCommit
                n_streamed += 1
                xp = struct.pack(">I", xid)
                for si in range(0, len(tx), stream_segment_rows):
                    seg = tx[si:si + stream_segment_rows]
                    w.frame(seg[0]["gtid"],
                            b"S" + struct.pack(">IB", xid,
                                               1 if si == 0 else 0))
                    for r in seg:
                        w.frame(r["gtid"], row_body(r, xp))
                        n_events += 1
                    w.frame(seg[-1]["gtid"], b"E")
                w.frame(last["gtid"],
                        b"c" + struct.pack(">IBQQQ", xid, 0,
                                           last["gtid"],
                                           last["gtid"] + 1, 0))
            else:
                for r in tx:
                    w.frame(r["gtid"], row_body(r))
                    n_events += 1
                w.frame(last["gtid"],
                        b"C\x00" + struct.pack(">QQQ", last["gtid"],
                                               last["gtid"] + 1, 0))
        w.keepalive(chunk[-1][-1]["gtid"] + 1)
        w.close()
        paths.append(path)
    return {"files": paths, "events": n_events, "txs": len(txs),
            "streamed_txs": n_streamed}


# --------------------------------------------------------------- parser

#: sentinel for 'u' (unchanged TOAST value, not sent)
_UNCHANGED = object()


def _byte(mv: memoryview, o: int) -> bytes:
    b = mv[o:o + 1].tobytes()
    if not b:
        raise IndexError("truncated stream")  # wait for more bytes
    return b


def _read_tuple(mv: memoryview, o: int) -> tuple[list, int]:
    (ncols,) = struct.unpack_from(">H", mv, o)
    o += 2
    vals = []
    for _ in range(ncols):
        kind = _byte(mv, o)
        o += 1
        if kind == b"n":
            vals.append(None)
        elif kind == b"u":
            vals.append(_UNCHANGED)
        elif kind == b"t":
            (ln,) = struct.unpack_from(">I", mv, o)
            o += 4
            if o + ln > len(mv):
                raise IndexError("truncated tuple value")
            vals.append(mv[o:o + ln].tobytes().decode())
            o += ln
        else:
            raise PgOutputError(f"unknown TupleData kind {kind!r}")
    return vals, o


def _cstr(mv: memoryview, o: int) -> tuple[str, int]:
    # index on the backing buffer — no tail copy per call
    end = mv.obj.index(b"\0", o)
    return mv[o:end].tobytes().decode(), end + 1


def _pg_cast(strings: list, typ: pa.DataType) -> pa.Array:
    """Text-format column values → the payload type, vectorized:
    arrays parse from ``{1,2,3}`` (``{}`` → empty, SQL NULL stays
    null, unquoted ``NULL`` elements decode as null elements; quoted
    text-array elements raise rather than mis-split)."""
    arr = pa.array(strings, pa.string())
    if not pa.types.is_list(typ):
        return arr.cast(typ)
    from rookray.wire import text_list_cast
    return text_list_cast(arr, typ, brackets=r"^\{|\}$",
                          null_token="NULL", reject_quotes=True)


class PgOutputParser:
    """Incremental pgoutput stream parser: ``feed()`` arbitrary byte
    chunks (unaligned with frame boundaries — live TCP), get back
    Arrow change-event tables of WHOLE transactions; ``finish()`` at
    end of stream (raises on a torn trailing transaction unless
    ``allow_partial_tail``).  Relation metadata is tracked in-stream
    (re-sent Relations redefine the column map — additive DDL)."""

    def __init__(self, payload: pa.Schema = SEQ_SCHEMA,
                 allow_partial_tail: bool = False,
                 emit_rows: int = 8192):
        self.payload = payload
        self.allow_partial_tail = allow_partial_tail
        self.emit_rows = emit_rows
        self._buf = bytearray()
        self._rels: dict[int, tuple[str, str, list[str]]] = {}
        # last (names, type oids) declared per (ns, rel): a re-sent
        # Relation dropping a name or changing an oid is non-additive
        # DDL — see PgOutputDDLError
        self._rel_decls: dict[tuple[str, str],
                              tuple[list[str], dict[str, int]]] = {}
        self._tx: list[tuple] | None = None
        self._xid = -1
        # protocol v2 streamed in-progress transactions: rows buffer
        # per xid across interleaved S..E blocks until StreamCommit
        self._streams: dict[int, list[tuple]] = {}
        self._cur_stream: int | None = None
        self._out: list[tuple] = []
        self._name_idx = {n: i for i, n in enumerate(payload.names)}

    # ------------------------------------------------------ frame layer

    def feed(self, chunk: bytes) -> pa.Table | None:
        self._buf.extend(chunk)
        mv = memoryview(self._buf)
        o = 0
        n = len(mv)
        try:
            while True:
                if o >= n:
                    break
                kind = mv[o:o + 1].tobytes()
                if kind == b"k":
                    if n - o < 18:
                        break
                    o += 18
                    continue
                if kind != b"w":
                    raise PgOutputError(f"unknown stream frame {kind!r}")
                if n - o < 25:
                    break
                (start_lsn,) = struct.unpack_from(">Q", mv, o + 1)
                consumed = self._try_message(mv, o + 25, n, start_lsn)
                if consumed is None or consumed > n:
                    break  # message truncated — wait for more bytes
                o = consumed
        finally:
            mv.release()  # the bytearray resize below needs no exports
        if o:
            del self._buf[:o]
        return self._emit()

    def _try_message(self, mv: memoryview, o: int, n: int,
                     lsn: int) -> int | None:
        """Parse ONE message starting at ``o``; return the offset past
        it, or None if the buffer ends mid-message (wait for bytes).
        The XLogData frame carries no payload length, so message
        parsing itself detects truncation via struct bounds."""
        try:
            return self._message(mv, o, lsn)
        except PgOutputError:
            raise
        except UnicodeDecodeError as e:
            raise PgOutputError(f"non-UTF-8 text value: {e}") from e
        except (struct.error, IndexError, ValueError):
            return None  # buffer ends mid-message — wait for bytes

    # ---------------------------------------------------- message layer

    def _message(self, mv: memoryview, o: int, lsn: int) -> int:
        tag = _byte(mv, o)
        o += 1
        # protocol v2: every message INSIDE a streamed transaction
        # carries an Int32 xid right after the tag (what lets a real
        # subscriber attribute interleaved content)
        msg_xid: int | None = None
        if (self._cur_stream is not None
                and tag in (b"R", b"Y", b"I", b"U", b"D", b"T", b"M")):
            (msg_xid,) = struct.unpack_from(">I", mv, o)
            o += 4
        if tag == b"B":
            _, _, xid = struct.unpack_from(">QQI", mv, o)
            if self._tx is not None:
                raise PgOutputError("Begin inside an open transaction")
            self._tx, self._xid = [], xid
            return o + 20
        if tag == b"C":
            struct.unpack_from(">BQQQ", mv, o)  # bounds check
            if self._tx is None:
                raise PgOutputError("Commit without Begin")
            self._flush_rows(self._tx, self._xid)
            self._tx = None
            return o + 25
        # ---- protocol v2: streamed in-progress transactions --------
        if tag == b"S":          # StreamStart: xid(4) first_segment(1)
            xid, _first = struct.unpack_from(">IB", mv, o)
            if self._cur_stream is not None:
                raise PgOutputError("StreamStart inside a stream block")
            self._cur_stream = xid
            self._streams.setdefault(xid, [])
            return o + 5
        if tag == b"E":          # StreamStop: no payload
            if self._cur_stream is None:
                raise PgOutputError("StreamStop outside a stream block")
            self._cur_stream = None
            return o
        if tag == b"c":          # StreamCommit: xid flags lsn lsn ts
            xid, = struct.unpack_from(">I", mv, o)
            struct.unpack_from(">BQQQ", mv, o + 4)  # bounds check
            if self._cur_stream is not None:
                raise PgOutputError("StreamCommit inside a stream block")
            if xid not in self._streams:
                raise PgOutputError(f"StreamCommit for unknown "
                                    f"xid={xid}")
            self._flush_rows(self._streams.pop(xid), xid)
            return o + 29
        if tag == b"A":          # StreamAbort: xid(4) subxid(4)
            xid, subxid = struct.unpack_from(">II", mv, o)
            if subxid != xid:
                raise PgOutputError(
                    f"subtransaction stream abort (xid={xid}, "
                    f"subxid={subxid}) is not supported — the engine "
                    "does not track subtransaction boundaries")
            self._streams.pop(xid, None)
            return o + 8
        if tag == b"R":
            (relid,) = struct.unpack_from(">I", mv, o)
            o += 4
            ns, o = _cstr(mv, o)
            rel, o = _cstr(mv, o)
            o += 1  # replident char
            (ncols,) = struct.unpack_from(">H", mv, o)
            o += 2
            names = []
            oids: dict[str, int] = {}
            for _ in range(ncols):
                o += 1  # flags
                cname, o = _cstr(mv, o)
                (toid,) = struct.unpack_from(">I", mv, o)
                o += 8  # typoid + typmod
                if cname not in self._name_idx:
                    raise PgOutputDDLError(
                        ns, rel, "unknown-column",
                        f"relation declares column {cname!r} not in "
                        "the payload schema — the engine accepts "
                        "appended columns only")
                names.append(cname)
                oids[cname] = toid
            # compare against the stream's OWN earlier declaration of
            # this table: a vanished name is a drop, a changed type
            # oid is a type change — both non-additive (the dump's
            # per-file Relation re-send and a live session's post-DDL
            # re-send both route through here)
            prev = self._rel_decls.get((ns, rel))
            if prev is not None:
                prev_names, prev_oids = prev
                gone = [n for n in prev_names if n not in oids]
                if gone:
                    raise PgOutputDDLError(
                        ns, rel, "column-drop",
                        f"re-sent Relation no longer declares "
                        f"{gone} (was {prev_names}, now {names})")
                changed = [n for n in prev_names
                           if oids.get(n, prev_oids[n]) != prev_oids[n]]
                if changed:
                    raise PgOutputDDLError(
                        ns, rel, "type-change",
                        f"column(s) {changed} re-declared with a "
                        "different type oid than the stream's earlier "
                        "Relation message")
            self._rel_decls[(ns, rel)] = (names, oids)
            self._rels[relid] = (ns, rel, names)
            return o
        if tag in (b"I", b"U", b"D"):
            (relid,) = struct.unpack_from(">I", mv, o)
            o += 4
            if relid not in self._rels:
                raise PgOutputError(f"DML for undeclared relation "
                                    f"{relid}") from None
            ns, rel, names = self._rels[relid]
            before = after = None
            if tag == b"I":
                if _byte(mv, o) != b"N":
                    raise PgOutputError("Insert without new tuple")
                vals, o = _read_tuple(mv, o + 1)
                after = self._map(vals, names, None)
                op = OP_INSERT
            elif tag == b"U":
                part = _byte(mv, o)
                old_vals = None
                if part in (b"K", b"O"):
                    old_vals, o = _read_tuple(mv, o + 1)
                    part = _byte(mv, o)
                if part != b"N":
                    raise PgOutputError("Update without new tuple")
                new_vals, o = _read_tuple(mv, o + 1)
                before = (None if old_vals is None
                          else self._map(old_vals, names, None))
                after = self._map(new_vals, names, before)
                op = OP_UPDATE
            else:
                part = _byte(mv, o)
                if part not in (b"K", b"O"):
                    raise PgOutputError("Delete without old tuple")
                vals, o = _read_tuple(mv, o + 1)
                before = self._map(vals, names, None)
                op = OP_DELETE
            row = (lsn, ns, rel, op, before, after)
            if self._cur_stream is not None:
                # attribute by the per-message xid (the authoritative
                # field); it must agree with the enclosing block
                if msg_xid is not None and msg_xid != self._cur_stream:
                    raise PgOutputError(
                        f"streamed message xid={msg_xid} inside "
                        f"StreamStart block xid={self._cur_stream}")
                self._streams[self._cur_stream].append(row)
            elif self._tx is not None:
                self._tx.append(row)
            else:
                raise PgOutputError("row mutation outside a transaction")
            return o
        if tag == b"O":          # Origin: lsn(8) + name(cstr)
            o += 8
            _, o = _cstr(mv, o)
            return o
        if tag == b"Y":          # Type: oid(4) + ns(cstr) + name(cstr)
            o += 4
            _, o = _cstr(mv, o)
            _, o = _cstr(mv, o)
            return o
        if tag == b"T":          # Truncate: nrel(4) flags(1) relids
            (nrel,) = struct.unpack_from(">I", mv, o)
            return o + 5 + 4 * nrel
        if tag == b"M":          # Message: flags(1) lsn(8) prefix content
            o += 9
            _, o = _cstr(mv, o)
            (ln,) = struct.unpack_from(">I", mv, o)
            return o + 4 + ln
        raise PgOutputError(f"unknown pgoutput message {tag!r}")

    def _flush_rows(self, rows: list[tuple], xid: int) -> None:
        nrows = len(rows)
        for seq, (g, db, table, op, before, after) in enumerate(rows):
            key_src = before if before is not None else after
            key = None if key_src is None else key_src[0]
            self._out.append((g, xid, seq, nrows, db, table, op, key,
                              before, after))

    def _map(self, vals: list, names: list[str],
             before: list | None) -> list:
        """Relation-ordered text values → payload-ordered row; columns
        the relation doesn't declare stay None (pre-evolution); 'u'
        (unchanged TOAST) resolves from the before image when the
        publisher sent one, else null."""
        row = [None] * len(self._name_idx)
        for cname, v in zip(names, vals):
            i = self._name_idx[cname]
            if v is _UNCHANGED:
                row[i] = before[i] if before is not None else None
            else:
                row[i] = v
        return row

    # -------------------------------------------------------- emission

    def _emit(self, force: bool = False) -> pa.Table | None:
        if not self._out or (not force and len(self._out) < self.emit_rows):
            return None
        rows, self._out = self._out, []
        cols = list(zip(*rows))
        payload = self.payload

        def images(idx: int) -> pa.StructArray:
            imgs = cols[idx]
            children = []
            for fi, f in enumerate(payload):
                children.append(_pg_cast(
                    [None if im is None else im[fi] for im in imgs],
                    f.type))
            return pa.StructArray.from_arrays(
                children, names=payload.names,
                mask=pa.array([im is None for im in imgs]))

        before = images(8)
        after = images(9)
        return pa.table({
            "gtid": pa.array(cols[0], pa.int64()),
            "tx_id": pa.array(cols[1], pa.int64()),
            "seq_in_tx": pa.array(cols[2], pa.int32()),
            "tx_events": pa.array(cols[3], pa.int32()),
            "server_id": pa.nulls(len(rows), pa.int64()),  # per-tx
            # origin only in PG — no per-row server identity
            "db": pa.array(cols[4], pa.string()),
            "table": pa.array(cols[5], pa.string()),
            "op": pa.array(cols[6], pa.int8()),
            "key": _pg_cast(list(cols[7]), payload.field(0).type),
            "before": before,
            "after": after,
        }, schema=change_event_schema(payload))

    def finish(self) -> pa.Table | None:
        if self._buf and not self.allow_partial_tail:
            raise PgOutputError(
                f"{len(self._buf)} trailing bytes form no complete "
                "frame — torn stream (pass allow_partial_tail for a "
                "live-tail copy)")
        if self._tx is not None and not self.allow_partial_tail:
            raise PgOutputError(
                f"stream ends inside transaction xid={self._xid} "
                f"({len(self._tx)} buffered rows) — torn tail")
        if self._streams and not self.allow_partial_tail:
            xid, rows = next(iter(self._streams.items()))
            raise PgOutputError(
                f"stream ends with {len(self._streams)} uncommitted "
                f"streamed transaction(s) (e.g. xid={xid}, "
                f"{len(rows)} buffered rows) — torn tail")
        self._tx = None
        self._streams.clear()
        return self._emit(force=True)


def decode_pgwal_file(data: bytes, payload: pa.Schema = SEQ_SCHEMA,
                      allow_partial_tail: bool = False) -> pa.Table:
    """One recorded stream segment → change-event table."""
    p = PgOutputParser(payload, allow_partial_tail=allow_partial_tail,
                       emit_rows=1 << 62)
    p.feed(data)
    t = p.finish()
    return t if t is not None else change_event_schema(payload).empty_table()


def first_lsn(path: str) -> int | None:
    """The first XLogData frame's start LSN — 25 bytes of header read,
    skipping leading keepalives; None for a data-free segment."""
    with open(path, "rb") as f:
        while True:
            kind = f.read(1)
            if not kind:
                return None
            if kind == b"k":
                f.seek(17, 1)
                continue
            if kind != b"w":
                raise PgOutputError(f"unknown stream frame {kind!r} "
                                    f"in {path}")
            head = f.read(8)
            if len(head) < 8:
                return None
            return struct.unpack(">Q", head)[0]


def pgwal_files_above(paths: list[str], watermark: int) -> list[str]:
    """LSN-checkpoint resume — the replication-slot
    ``confirmed_flush_lsn`` analog (rook checkpoints the equivalent
    binlog coordinates between restarts): keep only segment files that
    can hold events ABOVE the lake's committed watermark.  Segments
    are time-ordered, so a file whose SUCCESSOR starts at or below the
    watermark is skipped after a 25-byte header read; the first
    overlapping file is re-presented in full and the lake's watermark
    filter drops the already-applied prefix (overlap is
    correctness-free, skipped bytes are the win)."""
    from rookray.source import segments_above
    return segments_above(paths, watermark,
                          [first_lsn(p) for p in paths])


def read_pgwal(paths: list[str], payload: pa.Schema = SEQ_SCHEMA,
               allow_partial_tail: bool = False) -> "ray.data.Dataset":
    """A ``ray.data.Dataset`` of engine change events decoded from
    recorded pgoutput stream segments — sequential WITHIN a file (the
    format is a sequential log with in-stream relation state), parallel
    ACROSS files, the same distribution contract as ``read_binlog``."""
    import ray.data

    raw = ray.data.read_binary_files(paths)
    schema = change_event_schema(payload)

    def decode(batch: pa.Table) -> pa.Table:
        parts = [decode_pgwal_file(
            d.as_py() if hasattr(d, "as_py") else d, payload,
            allow_partial_tail) for d in batch.column("bytes")]
        parts = [t for t in parts if t.num_rows]
        if not parts:
            return schema.empty_table()
        return pa.concat_tables(parts)

    return raw.map_batches(decode, batch_format="pyarrow")


# -------------------------------------------------------- socket variant

class PgStreamServer:
    """Test producer for the live path: accepts one connection and
    streams raw pgoutput bytes in whatever chunk sizes the queue
    carries (frames may split across TCP reads — the parser's
    problem, as on a real replication connection)."""

    def __init__(self):
        import queue
        import socket
        import threading

        self._q: "queue.Queue[bytes | None]" = queue.Queue()
        self._srv = socket.socket()
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(1)
        self.host, self.port = self._srv.getsockname()
        self._t = threading.Thread(target=self._serve, daemon=True)
        self._t.start()

    def _serve(self):
        conn, _ = self._srv.accept()
        try:
            while True:
                item = self._q.get()
                if item is None:
                    break
                conn.sendall(item)
        finally:
            try:
                conn.shutdown(2)
            except OSError:
                pass
            conn.close()
            self._srv.close()

    def push_bytes(self, b: bytes, chunk: int = 0) -> None:
        if chunk <= 0:
            self._q.put(b)
        else:
            for i in range(0, len(b), chunk):
                self._q.put(b[i:i + chunk])

    def push_file(self, path: str, chunk: int = 0) -> None:
        with open(path, "rb") as f:
            self.push_bytes(f.read(), chunk)

    def close(self) -> None:
        self._q.put(None)


from ray.data.datasource import Datasource  # noqa: E402


class PgSocketDatasource(Datasource):
    """Unbounded pgoutput change stream over a raw TCP byte stream
    (the replication-connection analog): one ordered read task feeding
    the incremental parser; whole transactions emit as they commit."""

    def __init__(self, host: str, port: int,
                 payload: pa.Schema = SEQ_SCHEMA,
                 connect_timeout_s: float = 10.0,
                 emit_rows: int = 8192):
        self.host, self.port = host, port
        self.payload = payload
        self.connect_timeout_s = connect_timeout_s
        self.emit_rows = emit_rows

    def get_name(self) -> str:
        return f"PgOutputSocketStream({self.host}:{self.port})"

    def estimate_inmemory_data_size(self):
        return None

    def get_read_tasks(self, parallelism: int):
        from ray.data.block import BlockMetadata
        from ray.data.datasource import ReadTask

        host, port = self.host, self.port
        timeout, payload = self.connect_timeout_s, self.payload
        emit_rows = self.emit_rows

        def read_fn():
            from rookray.source import connect_with_deadline

            sock = connect_with_deadline(host, port, timeout)
            parser = PgOutputParser(payload, allow_partial_tail=True,
                                    emit_rows=emit_rows)
            try:
                while True:
                    chunk = sock.recv(1 << 20)
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


def stream_pgwal_socket(host: str, port: int,
                        payload: pa.Schema = SEQ_SCHEMA,
                        connect_timeout_s: float = 10.0):
    """Unbounded Dataset of engine change events from a live pgoutput
    byte stream — no side index (the protocol brackets transactions),
    whole-transactions-only emission."""
    import ray.data

    return ray.data.read_datasource(
        PgSocketDatasource(host, port, payload, connect_timeout_s),
        override_num_blocks=1)
