"""Confluent schema-registry Avro envelope adapter (Debezium family).

The most common production deployment of the connector family rook
belongs to (rook-source-mysql/.../MySQLReplicationStream.java:71-120 —
tail a binlog, publish change events) ships Debezium through Kafka with
the **Confluent wire format**: every message value is

    1 byte   magic = 0x00
    4 bytes  schema id, big-endian (a schema-registry reference)
    N bytes  the record body in Avro *binary* encoding (no header,
             no sync markers — the schema travels by id, not inline)

This module is the recorded-dump decoder for that format, in front of
the same vectorized envelope mapping the JSON dialect uses
(``rookray.wire.decode_envelopes``), so every downstream semantic —
transaction identity, coordinate-packed gtid ordering, before/after
typing, tx-completeness counts — is shared with the other five wire
formats and checked by the same flagship LWW oracle.

Both halves of the Avro spec we need are public and small:

- **Avro binary encoding** (Apache Avro spec, "Binary Encoding"):
  zig-zag varint ints/longs, little-endian IEEE float/double, long-
  prefixed bytes/strings, records = fields in declaration order,
  unions = long branch index then the branch value, arrays = blocks
  (count, items..., 0 terminator; negative count = block byte size
  follows).  The decoder below compiles a parsed schema into a closure
  tree once per file task; decode itself is per-record Python — the
  same per-event dispatch budget as the binlog-v4 binary decoder.
- **Confluent framing** (Confluent "wire format" documentation): the
  5-byte magic+id prefix above.  Kafka messages don't live in files,
  so a recorded dump needs a container: we use a 4-byte big-endian
  length prefix per message (``data-%05d.avrowire``), and the
  schema-registry stand-in is ``registry.json`` in the dump directory
  mapping schema id → Avro schema JSON (exactly what a consumer
  fetches from ``/schemas/ids/<id>``).

Schema evolution is first-class: a registry carries MULTIPLE envelope
schema ids (Debezium registers a new value schema after DDL), and the
encoder switches ids mid-dump at ``evolve_gtid`` — decoded rows simply
lack the late column, which the typed payload struct surfaces as null.

The ENCODER (``avro_dump``) is the test/bench producer (the stand-in
for a real connector + registry) and is allowed to be per-row Python;
it never runs inside a pipeline.
"""

from __future__ import annotations

import json
import os
import struct as _struct

import numpy as np
import pyarrow as pa

from rookray.schema import SEQ_SCHEMA
from rookray.source import ChangeStreamServer, _read_exact
from rookray.wire import decode_envelopes, make_envelope, tx_count_index

__all__ = [
    "avro_dump", "read_avro", "parse_tx_topic_avro",
    "envelope_avro_schema", "tx_meta_avro_schema",
    "infer_payload_avro", "avro_files_above", "avro_first_coordinate",
    "AvroSocketDatasource", "stream_avro_socket", "AvroStreamServer",
]

_MAGIC = 0


# ----------------------------------------------------- schema authoring

def _avro_of(t: pa.DataType):
    """Arrow payload type → Avro schema (the lossless mapping a
    connector's schema converter performs)."""
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_int64(t) or pa.types.is_uint32(t):
        return "long"
    if (pa.types.is_int32(t) or pa.types.is_int16(t) or pa.types.is_int8(t)
            or pa.types.is_uint16(t) or pa.types.is_uint8(t)):
        return "int"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return {"type": "array", "items": _avro_of(t.value_type)}
    raise ValueError(f"no Avro mapping for payload type {t}")


def envelope_avro_schema(payload: pa.Schema,
                         name: str = "Envelope") -> dict:
    """The Debezium envelope as an Avro record schema over ``payload``
    — before/after are nullable ``Value`` records (named once,
    referenced by name the second time, per the Avro spec's named-type
    rules), plus the source block and optional transaction metadata."""
    value = {"type": "record", "name": "Value", "fields": [
        {"name": f.name, "type": ["null", _avro_of(f.type)],
         "default": None} for f in payload]}
    source = {"type": "record", "name": "Source", "fields": [
        {"name": "version", "type": "string"},
        {"name": "connector", "type": "string"},
        {"name": "name", "type": "string"},
        {"name": "ts_ms", "type": "long"},
        {"name": "db", "type": "string"},
        {"name": "table", "type": "string"},
        {"name": "server_id", "type": "long"},
        {"name": "file", "type": ["null", "string"], "default": None},
        {"name": "pos", "type": ["null", "long"], "default": None},
        {"name": "row", "type": "int"},
        {"name": "gtid", "type": ["null", "string"], "default": None},
    ]}
    txb = {"type": "record", "name": "ConnectTransaction", "fields": [
        {"name": "id", "type": "string"},
        {"name": "total_order", "type": "long"},
        {"name": "data_collection_order", "type": "long"},
    ]}
    return {"type": "record", "name": name, "fields": [
        {"name": "before", "type": ["null", value], "default": None},
        {"name": "after", "type": ["null", "Value"], "default": None},
        {"name": "source", "type": source},
        {"name": "op", "type": "string"},
        {"name": "ts_ms", "type": ["null", "long"], "default": None},
        {"name": "transaction", "type": ["null", txb], "default": None},
    ]}


def tx_meta_avro_schema() -> dict:
    """The transaction-metadata topic's value schema (BEGIN/END
    records with per-collection event counts)."""
    coll = {"type": "record", "name": "ConnectTransactionCollection",
            "fields": [
                {"name": "data_collection", "type": "string"},
                {"name": "event_count", "type": "long"}]}
    return {"type": "record", "name": "TransactionMetadataValue",
            "fields": [
                {"name": "status", "type": "string"},
                {"name": "id", "type": "string"},
                {"name": "event_count", "type": ["null", "long"],
                 "default": None},
                {"name": "data_collections",
                 "type": ["null", {"type": "array", "items": coll}],
                 "default": None}]}


# ------------------------------------------------ Avro binary codecs

def _zz_write(buf: bytearray, n: int) -> None:
    z = (n << 1) ^ (n >> 63)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _zz_read(d: bytes, p: int) -> tuple[int, int]:
    acc, shift = 0, 0
    while True:
        b = d[p]
        p += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), p


# Active file-scoped int-array batcher (single-slot cell: decode never
# nests — Ray decode tasks are separate processes, and within one
# process decode_file sets/clears it around its message loop).
_BATCH_CTX: list = [None]


class _IntArrayBatch:
    """File-scoped vectorized decode of Avro ``array<int|long>`` values.

    Per-array numpy decode loses to fixed kernel overhead at ~100-token
    arrays, so the structural walk only LOCATES each block — every
    varint ends at its first byte < 0x80, so one small window scan per
    block finds the item boundaries — and ``flush`` decodes every token
    in the file in one shift-or pass, patching the placeholder lists
    the records already hold, in place.  The windows stay a few KB
    (L1-resident): a whole-file terminator index decodes faster alone
    but streams ~20 MB/task through shared DRAM, which measurably
    REGRESSES 16-way-parallel decode on one node."""

    def __init__(self, data: bytes):
        self.data = data
        self.w = np.frombuffer(data, dtype=np.uint8)
        self.parts: list = []         # per-block absolute item-end arrays
        self.block_starts: list = []  # absolute offset of each block's items
        self.sinks: list = []         # (placeholder_list, n_items)
        self.n_items = 0

    def add_block(self, p: int, cnt: int) -> int:
        """Record one block of ``cnt`` varints starting at ``p``;
        return the offset just past the block."""
        window = self.w[p:p + 10 * cnt]   # 10 bytes = max varint(long)
        ends = np.flatnonzero(window < 0x80)
        if len(ends) < cnt:
            raise ValueError(
                f"torn Avro int array: {cnt}-item block at offset {p} "
                "runs past the end of the file")
        ends = ends[:cnt] + p
        self.parts.append(ends)
        self.block_starts.append(p)
        self.n_items += cnt
        return int(ends[-1]) + 1

    def flush(self) -> None:
        if not self.n_items:
            return
        cnts = np.asarray([len(e) for e in self.parts])
        head = np.zeros(len(cnts), dtype=np.int64)
        head[1:] = np.cumsum(cnts[:-1])
        ends = np.concatenate(self.parts)
        starts = np.empty_like(ends)
        starts[1:] = ends[:-1] + 1
        starts[head] = self.block_starts
        lengths = ends - starts
        w = self.w
        acc = (w[starts] & 0x7F).astype(np.uint64)
        for j in range(1, int(lengths.max(initial=0)) + 1):
            m = np.flatnonzero(lengths >= j)
            acc[m] |= (w[starts[m] + j] & 0x7F).astype(np.uint64) \
                << np.uint64(7 * j)
        vals = ((acc >> np.uint64(1)).astype(np.int64)
                ^ -((acc & np.uint64(1)).astype(np.int64))).tolist()
        i = 0
        for sink, n in self.sinks:
            sink[:] = vals[i:i + n]
            i += n


class _VecUnsupported(Exception):
    """Raised at compile time when a schema uses a construct the
    column-synchronous decoder doesn't cover (multi-branch non-null
    unions, non-integer arrays, recursive types); the caller falls
    back to the per-record closure walk."""


def _vec_varint(w: np.ndarray, pos: np.ndarray) -> tuple:
    """Vectorized zig-zag varint read at each cursor.

    One shift-or pass per varint BYTE position across all records —
    the same kernel shape as ``_IntArrayBatch.flush``; real envelope
    streams finish in 1-3 passes because most varints are short.
    Returns ``(int64 values, advanced cursors)``."""
    b = w[pos]
    acc = (b & 0x7F).astype(np.uint64)
    more = b >= 0x80
    ln = np.ones(len(pos), dtype=np.int64)
    shift = 7
    while True:
        idx = np.flatnonzero(more)
        if idx.size == 0:
            break
        if shift > 63:
            raise ValueError("Avro varint longer than 10 bytes")
        b = w[pos[idx] + ln[idx]]
        acc[idx] |= (b & 0x7F).astype(np.uint64) << np.uint64(shift)
        ln[idx] += 1
        more[idx] = b >= 0x80
        shift += 7
    vals = ((acc >> np.uint64(1)).astype(np.int64)
            ^ -((acc & np.uint64(1)).astype(np.int64)))
    return vals, pos + ln


def _ragged_gather(w: np.ndarray, starts: np.ndarray,
                   lens: np.ndarray) -> tuple:
    """Gather ``lens[i]`` bytes from ``starts[i]`` for every record
    into one contiguous buffer; returns ``(uint8 data, int32 offsets)``
    ready for an Arrow binary/string array."""
    total = int(lens.sum())
    if total >= 2**31:
        raise ValueError("string/bytes payload exceeds 2**31 bytes per file")
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    if total == 0:
        return np.empty(0, dtype=np.uint8), offsets.astype(np.int32)
    gidx = (np.arange(total, dtype=np.int64)
            - np.repeat(offsets[:-1], lens)
            + np.repeat(starts, lens))
    return w[gidx], offsets.astype(np.int32)


def _natural_arrow(s) -> pa.DataType:
    """Arrow type a bare Avro schema decodes to (used only for fields
    the target struct no longer carries — decoded to advance the
    cursor, then dropped).  Delegates to the module's one
    Avro→Arrow primitive mapping (``_arrow_of``)."""
    if s == "null":
        return pa.null()
    try:
        return _arrow_of(s)
    except (KeyError, TypeError):
        raise _VecUnsupported(f"no natural Arrow type for {s!r}") from None


class _VecDecoder:
    """Column-synchronous vectorized decoder for one envelope schema id.

    Every Confluent-framed message with the same schema id shares one
    field sequence, so each field decodes for ALL records in a file at
    once: a numpy cursor array walks the byte buffer field-by-field
    (varints via ``_vec_varint``, strings via one ragged gather,
    null-unions via subset-decode + null-index ``take`` scatter), and
    the output is built directly as Arrow arrays — both the per-record
    closure walk and the dict→Arrow conversion of the reference path
    disappear.  Covers exactly the schema subset the Debezium family
    emits (records, null-unions, primitives, int/long arrays);
    anything else raises ``_VecUnsupported`` at compile time and the
    registry falls back to ``_Codec``."""

    def __init__(self, schema: dict, target: pa.DataType):
        self._compiling: set[str] = set()
        self._names: dict[str, tuple] = {}
        self._dec = self._compile(schema, target)

    def decode(self, w: np.ndarray, pos: np.ndarray) -> tuple:
        """(Arrow array of ``len(pos)`` records, final cursors)."""
        return self._dec(w, pos.astype(np.int64, copy=True))

    # each compiled node: dec(w, pos) -> (pa.Array, new_pos)
    def _compile(self, s, target: pa.DataType | None):
        if isinstance(s, str):
            if s in self._names:
                schema_dict, fn, tgt = self._names[s]
                if fn is None or tgt != target:
                    if s in self._compiling:
                        raise _VecUnsupported(f"recursive type {s!r}")
                    fn = self._compile(schema_dict, target)
                    self._names[s] = (schema_dict, fn, target)
                return fn
            return self._primitive(s, target)
        if isinstance(s, list):  # union
            null_idx = next((i for i, b in enumerate(s) if b == "null"), -1)
            data = [(i, b) for i, b in enumerate(s) if b != "null"]
            if null_idx < 0 or len(data) != 1:
                raise _VecUnsupported(f"non-null-union {s!r}")
            data_idx, data_schema = data[0]
            child = self._compile(data_schema, target)
            tgt = target if target is not None \
                else _natural_arrow(data_schema)

            def dec(w, pos, _child=child, _n=null_idx, _d=data_idx,
                    _t=tgt):
                bidx, pos = _vec_varint(w, pos)
                present = bidx == _d
                bad = ~present & (bidx != _n)
                if bad.any():
                    raise ValueError(
                        f"union branch {int(bidx[bad][0])} out of range")
                m = int(present.sum())
                if m == 0:
                    return pa.nulls(len(pos), type=_t), pos
                sub_arr, sub_pos = _child(w, pos[present])
                new_pos = pos.copy()
                new_pos[present] = sub_pos
                if m == len(pos):
                    return sub_arr, new_pos
                take_idx = np.zeros(len(pos), dtype=np.int64)
                take_idx[present] = np.arange(m)
                idx_arr = pa.array(take_idx, mask=~present)
                return sub_arr.take(idx_arr), new_pos

            return dec
        t = s["type"]
        if t == "record":
            if target is not None and not pa.types.is_struct(target):
                raise _VecUnsupported(
                    f"record {s.get('name')!r} targeting {target}")
            name = s.get("name")
            if name:
                if name in self._compiling:
                    raise _VecUnsupported(f"recursive type {name!r}")
                self._compiling.add(name)
                self._names.setdefault(name, (s, None, None))
            tgt_fields = {f.name: f for f in target} if target is not None \
                else None
            parts = []  # (avro field name, dec fn, keep)
            for f in s["fields"]:
                tf = tgt_fields.get(f["name"]) if tgt_fields is not None \
                    else None
                keep = tgt_fields is None or tf is not None
                parts.append((f["name"],
                              self._compile(f["type"],
                                            tf.type if tf else None),
                              keep))
            if name:
                self._compiling.discard(name)
            missing = [] if tgt_fields is None else \
                [f for f in target
                 if f.name not in {n for n, _, _ in parts}]

            def dec(w, pos, _parts=parts, _t=target, _miss=missing):
                got = {}
                for fname, fd, keep in _parts:
                    arr, pos = fd(w, pos)
                    if keep:
                        got[fname] = arr
                if _t is None:
                    # discard-only record (field dropped from the
                    # target): decoded purely to advance the cursors
                    return pa.StructArray.from_arrays(
                        list(got.values()), names=list(got)), pos
                n = len(pos)
                for f in _miss:
                    got[f.name] = pa.nulls(n, type=f.type)
                children = [got[f.name] for f in _t]
                return pa.StructArray.from_arrays(
                    children, fields=list(_t)), pos

            if name:
                self._names[name] = (s, dec, target)
            return dec
        if t == "array":
            items = s["items"]
            if items not in ("int", "long"):
                raise _VecUnsupported(f"array of {items!r}")
            val_t = pa.int32() if items == "int" else pa.int64()
            if target is not None:
                if not (pa.types.is_list(target)
                        or pa.types.is_large_list(target)):
                    raise _VecUnsupported(f"array targeting {target}")
                val_t = target.value_type

            is_large = target is not None and pa.types.is_large_list(target)

            def dec(w, pos, _vt=val_t, _lrg=is_large):
                # item-synchronous: decode item j of the current block
                # for ALL records at once with the shared varint kernel
                # (a per-record window scan costs ~10 µs of numpy call
                # overhead × records × fields — measured 0.57 s of a
                # 1.45 s serial file decode before this)
                n = len(pos)
                pos = pos.copy()
                counts = np.zeros(n, dtype=np.int64)
                pieces = []  # (record idx, within-record item idx, vals)
                active = np.arange(n)
                nbytes = len(w)
                while active.size:
                    cnt, adv = _vec_varint(w, pos[active])
                    pos[active] = adv
                    neg = cnt < 0
                    if neg.any():
                        sized = active[neg]
                        _, adv2 = _vec_varint(w, pos[sized])
                        pos[sized] = adv2
                        cnt[neg] = -cnt[neg]
                    live_m = cnt > 0
                    live = active[live_m]
                    c = cnt[live_m]
                    if live.size:
                        if int(c.max()) > nbytes:
                            raise ValueError(
                                "torn Avro int array: block count "
                                f"{int(c.max())} exceeds the file size")
                        cur, cbase, crem = live, counts[live].copy(), c
                        j = 0
                        while cur.size > 32:
                            vals, adv = _vec_varint(w, pos[cur])
                            pos[cur] = adv
                            pieces.append((cur, cbase + j, vals))
                            j += 1
                            keep = crem > j
                            if not keep.all():
                                cur = cur[keep]
                                cbase = cbase[keep]
                                crem = crem[keep]
                        if cur.size:
                            # skew tail: a few long arrays remain — the
                            # per-call numpy overhead now exceeds the
                            # work, so finish each record scalar
                            for k in range(cur.size):
                                ai, p = int(cur[k]), int(pos[cur[k]])
                                m = int(crem[k] - j)
                                out = np.empty(m, dtype=np.int64)
                                for t in range(m):
                                    b = int(w[p])
                                    p += 1
                                    acc = b & 0x7F
                                    shift = 7
                                    while b & 0x80:
                                        b = int(w[p])
                                        p += 1
                                        acc |= (b & 0x7F) << shift
                                        shift += 7
                                    acc &= 0xFFFFFFFFFFFFFFFF  # u64 wrap
                                    out[t] = (acc >> 1) ^ -(acc & 1)
                                pos[ai] = p
                                pieces.append(
                                    (cur[k:k + 1].repeat(m),
                                     np.arange(m) + int(cbase[k]) + j,
                                     out))
                        counts[live] += c
                    active = live
                offsets = np.zeros(n + 1, dtype=np.int64)
                np.cumsum(counts, out=offsets[1:])
                total = int(offsets[-1])
                if total == 0:
                    values = pa.array([], type=_vt)
                else:
                    out = np.empty(total, dtype=np.int64)
                    for recs, within, vals in pieces:
                        out[offsets[recs] + within] = vals
                    values = pa.array(out).cast(_vt)
                if _lrg:
                    return pa.LargeListArray.from_arrays(
                        pa.array(offsets, type=pa.int64()), values), pos
                if total >= 2**31:
                    raise ValueError(
                        "int-array payload exceeds 2**31 items per file")
                return pa.ListArray.from_arrays(
                    pa.array(offsets, type=pa.int32()), values), pos

            return dec
        return self._primitive(t, target)

    @staticmethod
    def _primitive(t: str, target: pa.DataType | None):
        if t == "null":
            tgt = target if target is not None else pa.null()
            return lambda w, pos, _t=tgt: (pa.nulls(len(pos), type=_t), pos)
        if t == "boolean":
            tgt = target if target is not None else pa.bool_()

            def dec_bool(w, pos, _t=tgt):
                return pa.array(w[pos] == 1).cast(_t), pos + 1

            return dec_bool
        if t in ("int", "long"):
            tgt = target if target is not None else (
                pa.int32() if t == "int" else pa.int64())

            def dec_i(w, pos, _t=tgt):
                vals, pos = _vec_varint(w, pos)
                return pa.array(vals).cast(_t), pos

            return dec_i
        if t in ("float", "double"):
            k = 4 if t == "float" else 8
            dt = "<f4" if t == "float" else "<f8"
            tgt = target if target is not None else (
                pa.float32() if t == "float" else pa.float64())

            def dec_f(w, pos, _k=k, _dt=dt, _t=tgt):
                gidx = (pos[:, None]
                        + np.arange(_k, dtype=np.int64)).ravel()
                vals = np.frombuffer(w[gidx].tobytes(), dtype=_dt)
                return pa.array(vals).cast(_t), pos + _k

            return dec_f
        if t in ("string", "bytes"):
            tgt = target if target is not None else (
                pa.utf8() if t == "string" else pa.binary())

            def dec_s(w, pos, _is_str=(t == "string"), _t=tgt):
                lens, pos = _vec_varint(w, pos)
                if (lens < 0).any():
                    raise ValueError("negative Avro string/bytes length")
                data, offsets = _ragged_gather(w, pos, lens)
                arr = pa.Array.from_buffers(
                    pa.binary(), len(pos),
                    [None, pa.py_buffer(offsets.tobytes()),
                     pa.py_buffer(data.tobytes())])
                if _is_str:
                    # validating cast — the per-record walk raises
                    # UnicodeDecodeError on corrupt strings, so the
                    # vectorized path must refuse them too
                    # (pa.ArrowInvalid is a ValueError subclass)
                    arr = arr.cast(pa.utf8())
                if _t != arr.type:
                    arr = arr.cast(_t)
                return arr, pos + lens

            return dec_s
        raise _VecUnsupported(f"unsupported Avro type {t!r}")


class _Codec:
    """Compiles a parsed Avro schema into encode/decode closure trees.
    Supports the subset the Debezium family uses: null, boolean,
    int/long, float/double, bytes/string, record, 2-branch
    null-unions (encode) / general unions (decode), arrays, and
    named-type references."""

    def __init__(self, schema: dict):
        self._names: dict[str, tuple] = {}
        self.encode_fn, self.decode_fn = self._compile(schema)

    def encode(self, value) -> bytes:
        buf = bytearray()
        self.encode_fn(buf, value)
        return bytes(buf)

    def decode(self, data: bytes, pos: int = 0):
        return self.decode_fn(data, pos)

    def _compile(self, s):
        if isinstance(s, str):
            if s in self._names:
                return self._names[s]
            return self._primitive(s)
        if isinstance(s, list):  # union
            branches = [self._compile(b) for b in s]
            null_idx = next((i for i, b in enumerate(s) if b == "null"), -1)
            # encode: None → the null branch; else the single non-null
            # branch (the Debezium family only uses null-unions)
            data_idx = next((i for i, b in enumerate(s) if b != "null"), -1)

            def enc(buf, v, _n=null_idx, _d=data_idx, _b=branches):
                if v is None:
                    if _n < 0:
                        raise ValueError("null for a non-nullable union")
                    _zz_write(buf, _n)
                else:
                    _zz_write(buf, _d)
                    _b[_d][0](buf, v)

            def dec(d, p, _b=branches):
                idx, p = _zz_read(d, p)
                return _b[idx][1](d, p)

            return enc, dec
        t = s["type"]
        if t == "record":
            # register the name FIRST (self-reference safe) with
            # trampolines, then fill in
            cell: list = [None, None]
            self._names[s["name"]] = (
                lambda buf, v: cell[0](buf, v),
                lambda d, p: cell[1](d, p))
            fields = [(f["name"], self._compile(f["type"]))
                      for f in s["fields"]]

            def enc(buf, v, _f=fields):
                for name, (fe, _) in _f:
                    fe(buf, v.get(name) if isinstance(v, dict) else
                       getattr(v, name))

            def dec(d, p, _f=fields):
                out = {}
                for name, (_, fd) in _f:
                    out[name], p = fd(d, p)
                return out, p

            cell[0], cell[1] = enc, dec
            return enc, dec
        if t == "array":
            ie, idd = self._compile(s["items"])

            def enc(buf, v, _ie=ie):
                if len(v):
                    _zz_write(buf, len(v))
                    for item in v:
                        _ie(buf, item)
                buf.append(0)

            if s["items"] in ("int", "long"):
                # the hot path: token arrays are ~100 varints per
                # envelope — a per-item closure call doubles decode
                # time, so the zig-zag loop is inlined here; when a
                # file-scoped _IntArrayBatch is active (decode_file)
                # the walk only LOCATES each block via the shared
                # terminator index and defers value math to one
                # vectorized pass per file
                def dec(d, p):
                    ctx = _BATCH_CTX[0]
                    if ctx is not None and ctx.data is d:
                        out: list = []
                        total = 0
                        while True:
                            cnt, p = _zz_read(d, p)
                            if cnt == 0:
                                if total:
                                    ctx.sinks.append((out, total))
                                return out, p
                            if cnt < 0:  # block with byte-size prefix
                                _, p = _zz_read(d, p)
                                cnt = -cnt
                            p = ctx.add_block(p, cnt)
                            total += cnt
                    out = []
                    push = out.append
                    while True:
                        cnt, p = _zz_read(d, p)
                        if cnt == 0:
                            return out, p
                        if cnt < 0:  # block with byte-size prefix
                            _, p = _zz_read(d, p)
                            cnt = -cnt
                        for _ in range(cnt):
                            b = d[p]
                            p += 1
                            acc = b & 0x7F
                            shift = 7
                            while b & 0x80:
                                b = d[p]
                                p += 1
                                acc |= (b & 0x7F) << shift
                                shift += 7
                            push((acc >> 1) ^ -(acc & 1))

                return enc, dec

            def dec(d, p, _id=idd):
                out = []
                while True:
                    cnt, p = _zz_read(d, p)
                    if cnt == 0:
                        return out, p
                    if cnt < 0:  # block with byte-size prefix
                        _, p = _zz_read(d, p)
                        cnt = -cnt
                    for _ in range(cnt):
                        item, p = _id(d, p)
                        out.append(item)

            return enc, dec
        return self._primitive(t)

    @staticmethod
    def _primitive(t: str):
        if t == "null":
            return (lambda buf, v: None), (lambda d, p: (None, p))
        if t == "boolean":
            return (lambda buf, v: buf.append(1 if v else 0)), \
                   (lambda d, p: (d[p] == 1, p + 1))
        if t in ("int", "long"):
            return (lambda buf, v: _zz_write(buf, int(v))), _zz_read
        if t == "float":
            return (lambda buf, v: buf.extend(_struct.pack("<f", v))), \
                   (lambda d, p: (_struct.unpack_from("<f", d, p)[0], p + 4))
        if t == "double":
            return (lambda buf, v: buf.extend(_struct.pack("<d", v))), \
                   (lambda d, p: (_struct.unpack_from("<d", d, p)[0], p + 8))
        if t == "string":
            def enc_s(buf, v):
                b = v.encode("utf-8")
                _zz_write(buf, len(b))
                buf.extend(b)

            def dec_s(d, p):
                ln, p = _zz_read(d, p)
                return d[p:p + ln].decode("utf-8"), p + ln

            return enc_s, dec_s
        if t == "bytes":
            def enc_b(buf, v):
                _zz_write(buf, len(v))
                buf.extend(v)

            def dec_b(d, p):
                ln, p = _zz_read(d, p)
                return bytes(d[p:p + ln]), p + ln

            return enc_b, dec_b
        raise ValueError(f"unsupported Avro type {t!r}")


# --------------------------------------------------- Confluent framing

def _frame(schema_id: int, body: bytes) -> bytes:
    msg = _struct.pack(">bI", _MAGIC, schema_id) + body
    return _struct.pack(">I", len(msg)) + msg


def _iter_messages(data: bytes):
    """Yield (schema_id, body_offset, body_end) over a recorded file of
    length-prefixed Confluent messages."""
    p, n = 0, len(data)
    while p < n:
        if p + 4 > n:
            raise ValueError("torn message length prefix")
        (ln,) = _struct.unpack_from(">I", data, p)
        p += 4
        if p + ln > n:
            raise ValueError("torn message body")
        if ln < 5:
            raise ValueError(
                f"message of {ln} bytes at offset {p} is shorter than "
                "the Confluent magic+schema-id prefix")
        if data[p] != _MAGIC:
            raise ValueError(
                f"bad Confluent magic byte {data[p]:#x} at offset {p}")
        (sid,) = _struct.unpack_from(">I", data, p + 1)
        yield sid, p + 5, p + ln
        p += ln


class _Registry:
    """Compiled-codec cache over a schema-registry snapshot
    (id → Avro schema JSON) — the stand-in for a registry client's
    ``/schemas/ids/<id>`` fetch, compiled once per read task."""

    def __init__(self, schemas: dict[int, dict]):
        self._schemas = {int(i): s for i, s in schemas.items()}
        self._codecs = {int(i): _Codec(s) for i, s in schemas.items()}
        # keyed by (schema id, target envelope type): the same id can
        # be decoded against different payload schemas on one instance
        self._vec: dict[tuple, "_VecDecoder | None"] = {}

    @classmethod
    def load(cls, path: str) -> "_Registry":
        with open(path) as f:
            return cls({int(k): v for k, v in json.load(f).items()})

    def decode_file(self, data: bytes) -> list[dict]:
        out = []
        codecs = self._codecs
        batch = _IntArrayBatch(data)
        _BATCH_CTX[0] = batch
        try:
            for sid, a, b in _iter_messages(data):
                codec = codecs.get(sid)
                if codec is None:
                    raise ValueError(f"schema id {sid} not in the registry "
                                     f"snapshot ({sorted(codecs)})")
                rec, end = codec.decode(data, a)
                if end != b:
                    raise ValueError(
                        f"Avro body under-read: {end} != {b} "
                        f"(schema id {sid})")
                out.append(rec)
            batch.flush()
        finally:
            _BATCH_CTX[0] = None
        return out

    def decode_file_table(self, data: bytes,
                          payload: pa.Schema) -> pa.Table:
        """One recorded dump file → the typed envelope batch, decoded
        column-synchronously (``_VecDecoder``): messages group by
        schema id, each group decodes every field for all its records
        in a few numpy passes, and the original message order is
        restored with one ``take``.  Falls back to the per-record
        closure walk for schema constructs the vectorized subset
        doesn't cover."""
        typ = _envelope_struct_type(payload)
        msgs = list(_iter_messages(data))
        if not msgs:
            return pa.table({"payload": pa.nulls(0, type=typ)})
        sids = np.asarray([m[0] for m in msgs], dtype=np.int64)
        starts = np.asarray([m[1] for m in msgs], dtype=np.int64)
        ends = np.asarray([m[2] for m in msgs], dtype=np.int64)
        w = np.frombuffer(data, dtype=np.uint8)
        # compile (or fetch) decoders for every schema id in the file
        # FIRST — cached per (id, target type), and if ANY id is
        # outside the vectorized subset the whole file takes the
        # per-record walk before any group is (wastefully) vec-decoded
        uniq = [int(s) for s in np.unique(sids)]
        decs = {}
        for sid in uniq:
            if sid not in self._codecs:
                raise ValueError(f"schema id {sid} not in the registry "
                                 f"snapshot ({sorted(self._codecs)})")
            key = (sid, typ)
            if key not in self._vec:
                try:
                    self._vec[key] = _VecDecoder(self._schemas[sid], typ)
                except _VecUnsupported:
                    self._vec[key] = None
            decs[sid] = self._vec[key]
        if any(v is None for v in decs.values()):
            return envelopes_to_table(self.decode_file(data), payload)
        chunks, perm_parts = [], []
        for sid in uniq:
            vec = decs[sid]
            m = sids == sid
            try:
                arr, fin = vec.decode(w, starts[m])
            except IndexError:
                raise ValueError(
                    f"torn Avro body (schema id {sid})") from None
            bad = np.flatnonzero(fin != ends[m])
            if bad.size:
                i = int(bad[0])
                raise ValueError(
                    f"Avro body under-read: {int(fin[i])} != "
                    f"{int(ends[m][i])} (schema id {sid})")
            chunks.append(arr)
            perm_parts.append(np.flatnonzero(m))
        if len(chunks) == 1:
            combined = chunks[0]
        else:
            perm = np.concatenate(perm_parts)
            inv = np.empty_like(perm)
            inv[perm] = np.arange(len(perm))
            combined = pa.concat_arrays(chunks).take(pa.array(inv))
        return pa.table({"payload": combined})


# -------------------------------------------------------------- encoder

def _payload_dict(struct_val, names: list[str]) -> dict | None:
    """``wire._row_payload`` restricted to the columns the active
    schema id declares (shared helper so value normalization can't
    drift between the JSON and Avro encoders)."""
    from rookray.wire import _row_payload

    full = _row_payload(struct_val)
    if full is None:
        return None
    return {k: v for k, v in full.items() if k in names}


_OP_CHAR = {0: "c", 1: "u", 2: "d"}
_BINLOG_FILE = "rookray-bin.000001"


def avro_dump(events: pa.Table, out_dir: str, n_files: int = 4,
              evolve_gtid: int | None = None,
              pre_evolution_columns: int | None = None,
              server_name: str = "rookray") -> dict:
    """Serialize a change-event table into a Confluent-framed Avro
    dump: ``data-%05d.avrowire`` files (the data topic),
    ``tx-00000.avrowire`` (the transaction topic) and ``registry.json``
    (the schema-registry snapshot).  With ``evolve_gtid`` the dump
    registers TWO envelope schema ids and switches at that coordinate,
    exactly as a connector re-registers its value schema after DDL.
    Deterministic: same input table → byte-identical dump."""
    os.makedirs(out_dir, exist_ok=True)
    payload_schema = pa.schema(
        [(f.name, f.type) for f in events.schema.field("after").type])
    names_v2 = [f.name for f in payload_schema]
    pre_cols = (pre_evolution_columns if pre_evolution_columns is not None
                else len(names_v2) - 1)
    evolving = evolve_gtid is not None and pre_cols < len(names_v2)
    schemas: dict[int, dict] = {
        1: envelope_avro_schema(
            pa.schema(list(payload_schema)[:pre_cols]) if evolving
            else payload_schema),
        2: tx_meta_avro_schema(),
    }
    if evolving:
        schemas[3] = envelope_avro_schema(payload_schema)
    reg_path = os.path.join(out_dir, "registry.json")
    with open(reg_path, "w") as f:
        json.dump({str(k): v for k, v in schemas.items()}, f)
    codecs = {i: _Codec(s) for i, s in schemas.items()}
    names_v1 = names_v2[:pre_cols] if evolving else names_v2

    rows = events.to_pylist()
    per = -(-len(rows) // max(1, n_files)) or 1
    paths = []
    for fi in range(0, len(rows), per):
        chunk = rows[fi:fi + per]
        path = os.path.join(out_dir, f"data-{fi // per:05d}.avrowire")
        with open(path, "wb") as f:
            for r in chunk:
                sid = (3 if evolving and r["gtid"] >= evolve_gtid else 1)
                names = names_v2 if sid == 3 else names_v1
                env = make_envelope(
                    _OP_CHAR[r["op"]], _payload_dict(r["before"], names),
                    _payload_dict(r["after"], names), r["db"], r["table"],
                    r["server_id"], _BINLOG_FILE, r["gtid"],
                    str(r["tx_id"]), r["seq_in_tx"] + 1,
                    server_name=server_name)["payload"]
                f.write(_frame(sid, codecs[sid].encode(env)))
        paths.append(path)

    tx_counts: dict[int, int] = {}
    for r in rows:
        tx_counts[r["tx_id"]] = r["tx_events"]
    tx_path = os.path.join(out_dir, "tx-00000.avrowire")
    tx_codec = codecs[2]
    with open(tx_path, "wb") as f:
        for txid in sorted(tx_counts):
            f.write(_frame(2, tx_codec.encode(
                {"status": "BEGIN", "id": str(txid),
                 "event_count": None, "data_collections": None})))
            f.write(_frame(2, tx_codec.encode(
                {"status": "END", "id": str(txid),
                 "event_count": tx_counts[txid],
                 "data_collections": [
                     {"data_collection": "rook.sequences",
                      "event_count": tx_counts[txid]}]})))
    return {"data_files": paths, "tx_file": tx_path,
            "registry": reg_path, "events": len(rows)}


# -------------------------------------------------------------- decoder

def _envelope_struct_type(payload: pa.Schema) -> pa.DataType:
    """The Arrow struct type decoded Avro envelopes are assembled into
    — shaped exactly like ``pyarrow.json``'s inference of the JSON
    dialect, so ``rookray.wire.decode_envelopes`` serves both."""
    val = pa.struct(list(payload))
    src = pa.struct([("version", pa.string()), ("connector", pa.string()),
                     ("name", pa.string()), ("ts_ms", pa.int64()),
                     ("db", pa.string()), ("table", pa.string()),
                     ("server_id", pa.int64()), ("file", pa.string()),
                     ("pos", pa.int64()), ("row", pa.int32()),
                     ("gtid", pa.string())])
    txb = pa.struct([("id", pa.string()), ("total_order", pa.int64()),
                     ("data_collection_order", pa.int64())])
    return pa.struct([("before", val), ("after", val), ("source", src),
                      ("op", pa.string()), ("ts_ms", pa.int64()),
                      ("transaction", txb)])


def envelopes_to_table(records: list[dict],
                       payload: pa.Schema) -> pa.Table:
    """Decoded Avro envelope dicts → the one-column ``payload`` batch
    shape ``decode_envelopes`` consumes.  Fields a pre-evolution schema
    id never carried are simply absent from the dicts — the typed
    struct surfaces them as nulls, the additive-DDL contract."""
    typ = _envelope_struct_type(payload)
    arr = pa.array(records, type=typ)
    return pa.table({"payload": arr})


def parse_tx_topic_avro(paths: list[str],
                        registry: "_Registry | str",
                        ) -> tuple[np.ndarray, np.ndarray]:
    """(sorted tx ids, event counts) from Confluent-Avro transaction-
    topic dumps — END records carry ``event_count``.  Small by
    construction; parsed once on the driver and broadcast."""
    reg = _Registry.load(registry) if isinstance(registry, str) else registry
    ids, counts = [], []
    for p in paths:
        with open(p, "rb") as f:
            for rec in reg.decode_file(f.read()):
                if rec.get("status") != "END":
                    continue
                rid = rec["id"]
                ids.append(int(rid.rsplit(":", 1)[-1]))
                counts.append(int(rec["event_count"]))
    ids_a = np.asarray(ids, dtype=np.int64)
    counts_a = np.asarray(counts, dtype=np.int64)
    order = np.argsort(ids_a, kind="stable")
    return ids_a[order], counts_a[order]


def _decode_avro_file(path: str, registry_path: str,
                      payload: pa.Schema) -> pa.Table:
    """One dump file → one typed envelope batch (runs as a plain Ray
    task; the registry snapshot compiles in ~1 ms)."""
    reg = _Registry.load(registry_path)
    with open(path, "rb") as f:
        return reg.decode_file_table(f.read(), payload)


def read_avro(paths: list[str], registry: str,
              tx_topic: list[str] | None = None,
              payload: pa.Schema = SEQ_SCHEMA) -> "ray.data.Dataset":
    """A ``ray.data.Dataset`` of engine change events decoded from
    Confluent-framed Avro dump files.  Avro binary is per-record by
    nature (the same budget as the binlog codec), so parallelism is
    everything: each FILE decodes in its own plain Ray task — Ray's
    binary read would coalesce these small files into few blocks and
    serialize the Python-heavy decode behind them — and the decoded
    envelope batches feed the SAME vectorized mapping as the JSON
    dialect.

    Without ``tx_topic``, per-transaction event counts come from the
    shared counting pass over the decoded envelopes
    (``rookray.wire.tx_count_index``) — bounded replay only."""
    import ray
    import ray.data

    dec_file = ray.remote(num_cpus=1)(_decode_avro_file)
    parsed = ray.data.from_arrow_refs(
        [dec_file.remote(p, registry, payload) for p in paths])
    if tx_topic is not None:
        tx_index = parse_tx_topic_avro(tx_topic, registry)
    else:
        tx_index = tx_count_index(parsed)

    ref = ray.put(tx_index)

    def decode(tbl: pa.Table) -> pa.Table:
        import ray as _ray
        return decode_envelopes(tbl, payload=payload,
                                tx_index=_ray.get(ref))

    return parsed.map_batches(decode, batch_format="pyarrow",
                              zero_copy_batch=True)


# ------------------------------------------- checkpoint resume / schema

def _arrow_of(avro) -> pa.DataType:
    """Avro schema → Arrow payload type (inverse of ``_avro_of``)."""
    if isinstance(avro, list):  # nullable union
        inner = next((b for b in avro if b != "null"), "null")
        return _arrow_of(inner)
    if isinstance(avro, dict):
        if avro["type"] == "array":
            return pa.list_(_arrow_of(avro["items"]))
        avro = avro["type"]
    return {"string": pa.string(), "long": pa.int64(), "int": pa.int32(),
            "double": pa.float64(), "float": pa.float32(),
            "boolean": pa.bool_(), "bytes": pa.binary()}[avro]


def infer_payload_avro(registry_path: str) -> pa.Schema:
    """Payload schema from the registry snapshot itself — the Avro
    format's advantage over the JSON dialects: the schema is carried
    by the registry, not inferred from data.  Envelope schemas are
    merged in ascending id order (later registrations win — the
    post-DDL schema adds its columns), reading each ``Value`` record's
    fields."""
    with open(registry_path) as f:
        schemas = {int(k): v for k, v in json.load(f).items()}
    fields: dict[str, pa.DataType] = {}
    for sid in sorted(schemas):
        s = schemas[sid]
        env_fields = {f["name"]: f for f in s.get("fields", [])}
        if "before" not in env_fields or "op" not in env_fields:
            continue  # not an envelope schema (e.g. tx metadata)
        val = env_fields["before"]["type"]
        if isinstance(val, list):
            val = next(b for b in val if b != "null")
        if not isinstance(val, dict) or val.get("type") != "record":
            continue
        for f in val["fields"]:
            fields[f["name"]] = _arrow_of(f["type"])
    if not fields:
        raise ValueError(
            f"no envelope schema with before/after Value records in "
            f"{registry_path}")
    return pa.schema(list(fields.items()))


def avro_first_coordinate(path: str, registry: "_Registry | str",
                          ) -> int | None:
    """gtid coordinate of a dump file's FIRST envelope (head-of-file
    read: one framed message), for successor-based checkpoint pruning.
    Mirrors ``decode_envelopes``'s derivation: ``file_seq << 40 | pos``
    when the source block carries a binlog position."""
    import re

    reg = _Registry.load(registry) if isinstance(registry, str) else registry
    with open(path, "rb") as f:
        head = f.read(4)
        if len(head) < 4:
            return None
        (ln,) = _struct.unpack(">I", head)
        msg = f.read(ln)
    # a torn head (producer died mid-write) must keep the file, not
    # crash the resume path: len(msg) < ln means the body is cut off
    if len(msg) < max(ln, 5) or msg[0] != _MAGIC:
        return None
    (sid,) = _struct.unpack_from(">I", msg, 1)
    codec = reg._codecs.get(sid)
    if codec is None:
        return None
    try:
        rec, _ = codec.decode(msg, 5)
    except (IndexError, ValueError, UnicodeDecodeError):
        return None  # corrupt head: conservative keep
    src = rec.get("source") or {}
    pos = src.get("pos")
    if pos is None:
        return None
    m = re.search(r"(\d+)$", src.get("file") or "0")
    fseq = int(m.group(1)) if m else 0
    return (fseq << 40) | int(pos)


def avro_files_above(paths: list[str], watermark: int,
                     registry: str) -> list[str]:
    """Checkpoint resume for recorded Confluent-Avro dumps — the same
    successor-based pruning as the JSON formats and pgoutput's LSN
    segments."""
    from rookray.source import segments_above

    reg = _Registry.load(registry)
    return segments_above(paths, watermark,
                          [avro_first_coordinate(p, reg) for p in paths])


# ------------------------------------------------------- socket variant

class AvroStreamServer(ChangeStreamServer):
    """Test producer for the socket path: frames carry raw
    Confluent-framed Avro message bytes."""

    def push_file(self, path: str) -> None:
        with open(path, "rb") as f:
            self._q.put(f.read())


from ray.data.datasource import Datasource  # noqa: E402


class AvroSocketDatasource(Datasource):
    """Unbounded Confluent-Avro change stream over the frame protocol:
    one ordered read task (a replication connection is one stream),
    decoding each frame's framed messages with the registry snapshot
    and the shared vectorized envelope mapping.  ``tx_index`` must come
    from the transaction topic — a live feed has no bounded dump to
    count."""

    def __init__(self, host: str, port: int, registry: str,
                 tx_index: tuple[np.ndarray, np.ndarray],
                 payload: pa.Schema = SEQ_SCHEMA,
                 connect_timeout_s: float = 10.0):
        self.host, self.port = host, port
        self.registry = registry
        self.tx_index = tx_index
        self.payload = payload
        self.connect_timeout_s = connect_timeout_s

    def get_name(self) -> str:
        return f"AvroSocketStream({self.host}:{self.port})"

    def estimate_inmemory_data_size(self):
        return None

    def get_read_tasks(self, parallelism: int):
        from ray.data.block import BlockMetadata
        from ray.data.datasource import ReadTask

        host, port = self.host, self.port
        registry, timeout = self.registry, self.connect_timeout_s
        payload, tx_index = self.payload, self.tx_index

        def read_fn():
            from rookray.source import connect_with_deadline

            reg = _Registry.load(registry)
            sock = connect_with_deadline(host, port, timeout)
            try:
                while True:
                    (ln,) = _struct.unpack(">I", _read_exact(sock, 4))
                    if ln == 0:
                        return
                    frame = _read_exact(sock, ln)
                    yield decode_envelopes(
                        reg.decode_file_table(frame, payload),
                        payload=payload, tx_index=tx_index)
            finally:
                sock.close()

        meta = BlockMetadata(num_rows=None, size_bytes=None,
                             exec_stats=None, input_files=None)
        return [ReadTask(read_fn, meta)]


def stream_avro_socket(host: str, port: int, registry: str,
                       tx_index: tuple[np.ndarray, np.ndarray],
                       payload: pa.Schema = SEQ_SCHEMA,
                       connect_timeout_s: float = 10.0):
    """Unbounded Dataset of engine change events from a live
    Confluent-Avro socket feed."""
    import ray.data

    return ray.data.read_datasource(
        AvroSocketDatasource(host, port, registry, tx_index, payload,
                             connect_timeout_s),
        override_num_blocks=1)
