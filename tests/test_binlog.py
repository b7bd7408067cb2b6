"""MySQL binlog-v4 wire-format adapter: encode → decode roundtrip,
CRC verification, torn tails, mid-stream DDL, lake apply."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from rookray import binlog as B
from rookray.gen import GenConfig, generate_events, final_state
from rookray.schema import SEQ_SCHEMA, SEQ_SCHEMA_V2

CFG = GenConfig(n_docs=40, n_events=240, noise_pct=5, evolve_at=121)


def _payload_of(ev: pa.Table) -> pa.Schema:
    return pa.schema(list(ev.schema.field("after").type))


def _decode_all(d: dict, payload: pa.Schema) -> pa.Table:
    return pa.concat_tables(
        [B.decode_binlog_file(open(p, "rb").read(), p, payload=payload)
         for p in d["files"]])


def _norm_images(t: pa.Table, side: str) -> list:
    return [None if v is None else
            {k: (list(x) if isinstance(x, (list, np.ndarray)) else x)
             for k, x in v.items()}
            for v in t.column(side).to_pylist()]


def test_roundtrip_exact(tmp_path):
    """Every engine column except the coordinate-packed gtid decodes
    bit-exact, in order, through genuine binlog bytes — including the
    DDL point (pre-evolution TABLE_MAPs declare 4 columns)."""
    ev = generate_events(CFG)
    d = B.binlog_dump(ev, str(tmp_path / "blg"), n_files=3,
                      evolve_gtid=CFG.evolve_at, pre_evolution_columns=4)
    got = _decode_all(d, _payload_of(ev))
    assert got.num_rows == ev.num_rows
    for c in ["tx_id", "seq_in_tx", "tx_events", "server_id", "db",
              "table", "op", "key"]:
        assert got.column(c).to_pylist() == ev.column(c).to_pylist(), c
    assert _norm_images(got, "before") == _norm_images(ev, "before")
    assert _norm_images(got, "after") == _norm_images(ev, "after")
    g = np.asarray(got.column("gtid"))
    assert (np.diff(g) > 0).all()
    # coordinate packing: file_seq in the top bits, strictly increasing
    # across the three files
    seqs = g >> (B._POS_BITS + B._ROW_BITS)
    assert sorted(set(seqs.tolist())) == [1, 2, 3]


def test_multirow_events_roundtrip(tmp_path):
    """Small rows_per_event forces multi-row ROWS events (shared
    column layout, per-row images) — ordering and images survive."""
    ev = generate_events(GenConfig(n_docs=10, n_events=120))
    d = B.binlog_dump(ev, str(tmp_path / "blg"), n_files=1,
                      rows_per_event=4)
    got = _decode_all(d, _payload_of(ev))
    assert got.column("key").to_pylist() == ev.column("key").to_pylist()
    assert _norm_images(got, "after") == _norm_images(ev, "after")


def test_crc_corruption_detected(tmp_path):
    ev = generate_events(GenConfig(n_docs=10, n_events=60))
    d = B.binlog_dump(ev, str(tmp_path / "blg"), n_files=1)
    raw = bytearray(open(d["files"][0], "rb").read())
    raw[len(raw) // 2] ^= 0xFF
    with pytest.raises(B.BinlogFormatError, match="CRC"):
        B.decode_binlog_file(bytes(raw), d["files"][0],
                             payload=_payload_of(ev))


def test_torn_tail_strict_and_partial(tmp_path):
    """A cut-off file raises by default; allow_partial_tail decodes
    the clean prefix and drops the incomplete trailing transaction."""
    ev = generate_events(GenConfig(n_docs=10, n_events=100))
    d = B.binlog_dump(ev, str(tmp_path / "blg"), n_files=1)
    payload = _payload_of(ev)
    full_bytes = open(d["files"][0], "rb").read()
    cut = full_bytes[: int(len(full_bytes) * 0.6)]
    with pytest.raises(B.BinlogFormatError):
        B.decode_binlog_file(cut, d["files"][0], payload=payload)
    part = B.decode_binlog_file(cut, d["files"][0], payload=payload,
                                allow_partial_tail=True)
    full = B.decode_binlog_file(full_bytes, d["files"][0], payload=payload)
    assert 0 < part.num_rows < full.num_rows
    assert part.to_pylist() == full.slice(0, part.num_rows).to_pylist()
    # partial rows are whole transactions only
    counts = {}
    for r in part.column("tx_id").to_pylist():
        counts[r] = counts.get(r, 0) + 1
    for tx, n, exp in zip(part.column("tx_id").to_pylist(),
                          part.column("tx_events").to_pylist(),
                          [counts[t] for t in part.column("tx_id").to_pylist()]):
        assert n == exp


def test_evolution_nulls_and_schema_guard(tmp_path):
    """Pre-DDL files decode the missing trailing column as null; a
    dump declaring MORE columns than the payload schema is rejected
    (positional mapping requires payload ⊇ table)."""
    ev = generate_events(CFG)
    d = B.binlog_dump(ev, str(tmp_path / "blg"), n_files=2,
                      evolve_gtid=CFG.evolve_at, pre_evolution_columns=4)
    got = _decode_all(d, SEQ_SCHEMA_V2)
    lang = got.column("after").combine_chunks().field("lang")
    # pre-evolution rows: lang null (either never declared or null cell)
    pre = np.asarray(ev.column("gtid")) < CFG.evolve_at
    assert lang.is_valid().to_numpy(zero_copy_only=False)[pre].sum() == 0
    assert lang.is_valid().to_numpy(zero_copy_only=False).any()
    with pytest.raises(B.BinlogFormatError, match="declares"):
        _decode_all(d, SEQ_SCHEMA)  # 5-column TABLE_MAP vs 4-col payload


def test_deterministic_dump(tmp_path):
    ev = generate_events(GenConfig(n_docs=10, n_events=80))
    d1 = B.binlog_dump(ev, str(tmp_path / "a"), n_files=2)
    d2 = B.binlog_dump(ev, str(tmp_path / "b"), n_files=2)
    for p1, p2 in zip(d1["files"], d2["files"]):
        assert open(p1, "rb").read() == open(p2, "rb").read()


def test_xid_fallback_without_gtid_event(tmp_path):
    """Older servers without gtid_mode: transactions are delimited by
    BEGIN…XID alone; tx_id falls back to XID-1 so both paths share the
    GNO-is-1-based convention (raw XID would collide with the NEXT
    GTID'd transaction's gno-1 identity)."""
    path = str(tmp_path / "old.000001")
    w = B._FileWriter(path)
    codecs = [B._codec_for(f.type) for f in SEQ_SCHEMA]
    B._write_table_map(w, 100, "rook", "sequences", codecs, 1)
    body = bytearray((100).to_bytes(6, "little"))
    body += struct.pack("<HH", 0, 2)
    body += B._lenenc(4) + b"\x0f"
    body += B._image(["d1", [1, 2], 2, "s"], codecs)
    w.event(B.WRITE_ROWS_EVENT_V2, bytes(body), 1)
    w.event(B.XID_EVENT, struct.pack("<Q", 77), 1)
    w.close(None)
    t = B.decode_binlog_file(open(path, "rb").read(), path,
                             payload=SEQ_SCHEMA)
    assert t.num_rows == 1
    assert t.column("tx_id").to_pylist() == [76]
    assert t.column("key").to_pylist() == ["d1"]
    assert t.column("after").to_pylist()[0]["tokens"] == [1, 2]


def test_lake_apply_matches_serial_oracle(tmp_path, ray_session):
    """End-to-end through Ray: read_binlog (one decode task per file)
    → lake apply → final state equals the serial replay."""
    from rookray.pipeline import CDCConfig, LakeTable
    cfg = GenConfig(n_docs=30, n_events=300)
    ev = generate_events(cfg)
    d = B.binlog_dump(ev, str(tmp_path / "blg"), n_files=4)
    ds = B.read_binlog(d["files"], payload=_payload_of(ev))
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=4))
    lake.apply(ds.materialize())
    got = lake.state_table().sort_by("doc_id")
    exp = final_state(cfg).sort_by("doc_id")
    assert got.column("doc_id").to_pylist() == exp.column("doc_id").to_pylist()
    assert [list(x) for x in got.column("tokens").to_pylist()] == \
        [list(x) for x in exp.column("tokens").to_pylist()]


def test_incremental_parser_chunked_equals_batch(tmp_path):
    """feed() in adversarial 61-byte chunks across THREE files on one
    stream (ROTATE re-anchors the sequence) == batch per-file decode."""
    ev = generate_events(GenConfig(n_docs=20, n_events=200))
    d = B.binlog_dump(ev, str(tmp_path / "blg"), n_files=3)
    payload = _payload_of(ev)
    batch = _decode_all(d, payload)

    parser = B.BinlogParser(d["files"][0], payload=payload)
    stream = b"".join(open(p, "rb").read() for p in d["files"])
    parts = []
    for i in range(0, len(stream), 61):
        t = parser.feed(stream[i:i + 61])
        if t is not None:
            parts.append(t)
    t = parser.finish()
    if t is not None:
        parts.append(t)
    got = pa.concat_tables(parts)
    assert got.to_pylist() == batch.to_pylist()


def test_live_socket_tail_matches_oracle(tmp_path, ray_session):
    """The BinaryLogClient analog end-to-end: raw binlog bytes over
    TCP in unaligned chunks → BinlogSocketDatasource → lake apply ==
    serial replay; whole transactions only."""
    from rookray.pipeline import CDCConfig, LakeTable
    cfg = GenConfig(n_docs=25, n_events=250)
    ev = generate_events(cfg)
    d = B.binlog_dump(ev, str(tmp_path / "blg"), n_files=3)
    srv = B.BinlogStreamServer(chunk_size=997)
    try:
        for p in d["files"]:
            srv.push_file(p)
        srv.close()
        ds = B.stream_binlog_socket(srv.host, srv.port,
                                    first_file=d["files"][0],
                                    payload=_payload_of(ev))
        lake = LakeTable(str(tmp_path / "lake"),
                         CDCConfig(num_partitions=4))
        lake.apply(ds.materialize())
        got = lake.state_table().sort_by("doc_id")
        exp = final_state(cfg).sort_by("doc_id")
        assert got.column("doc_id").to_pylist() == \
            exp.column("doc_id").to_pylist()
        assert [list(x) for x in got.column("tokens").to_pylist()] == \
            [list(x) for x in exp.column("tokens").to_pylist()]
    finally:
        srv.close()


def test_live_stream_torn_mid_tx_drops_trailing(tmp_path):
    """A producer dying mid-transaction: the parser (lenient mode)
    emits only committed transactions — the prefix a reconnecting
    client would keep."""
    ev = generate_events(GenConfig(n_docs=10, n_events=100))
    d = B.binlog_dump(ev, str(tmp_path / "blg"), n_files=1)
    payload = _payload_of(ev)
    full = B.decode_binlog_file(open(d["files"][0], "rb").read(),
                                d["files"][0], payload=payload)
    raw = open(d["files"][0], "rb").read()
    cut = raw[: int(len(raw) * 0.55)]
    parser = B.BinlogParser(d["files"][0], payload=payload,
                            allow_partial_tail=True)
    parts = []
    for i in range(0, len(cut), 311):
        t = parser.feed(cut[i:i + 311])
        if t is not None:
            parts.append(t)
    t = parser.finish()
    if t is not None:
        parts.append(t)
    got = pa.concat_tables(parts) if parts else parser.empty_table()
    assert 0 < got.num_rows < full.num_rows
    assert got.to_pylist() == full.slice(0, got.num_rows).to_pylist()
    # last emitted tx is complete
    last_tx = got.column("tx_id").to_pylist()[-1]
    n = sum(1 for t_ in got.column("tx_id").to_pylist() if t_ == last_tx)
    assert n == got.column("tx_events").to_pylist()[-1]


def test_checkpoint_resume_skips_whole_files(tmp_path, ray_session, capsys):
    """The setBinlogFilename/Position analog: a second `rookray binlog`
    run over the same dump skips every file below the committed
    watermark without opening it, applies 0 events, and leaves state
    identical (idempotent resume)."""
    import json as _json
    from rookray.binlog import binlog_files_above
    from rookray.cli import main as cli_main
    from rookray.pipeline import LakeTable

    ev = generate_events(GenConfig(n_docs=20, n_events=160))
    dump = str(tmp_path / "blg")
    d = B.binlog_dump(ev, dump, n_files=4)
    t = str(tmp_path / "lake")
    assert cli_main(["binlog", "--dump", dump, "--table", t,
                     "--partitions", "2"]) == 0
    first = _json.loads(capsys.readouterr().out)
    assert first["files"] == 4 and first["files_skipped"] == 0
    state1 = LakeTable(t).state_table().sort_by("doc_id")

    # unit surface: files 1-3 are wholly below the watermark (it sits
    # inside file 4, whose range extends beyond it → re-presented, and
    # the lake's watermark filter drops the overlap)
    wm = first["closed_watermark"]
    kept = binlog_files_above(d["files"], wm)
    assert kept == d["files"][3:]

    assert cli_main(["binlog", "--dump", dump, "--table", t,
                     "--partitions", "2"]) == 0
    second = _json.loads(capsys.readouterr().out)
    assert second["files"] == 1 and second["files_skipped"] == 3
    assert second["events_applied"] == 0
    state2 = LakeTable(t).state_table().sort_by("doc_id")
    assert state1.to_pylist() == state2.to_pylist()

    # a partial overlap: pretend only file 2 committed → files 3,4 kept
    lo_wm = (3 << (B._POS_BITS + B._ROW_BITS)) - 1
    assert binlog_files_above(d["files"], lo_wm) == d["files"][2:]


def test_cli_multi_table_routed_ingest(tmp_path, ray_session, capsys):
    """`binlog --route` maintains one lake per table from one decoded
    binary stream behind a cross-table consistent commit, resumes by
    the MIN over routed watermarks, and rejects malformed specs."""
    import json as _json
    from rookray.cli import main as cli_main
    from rookray.pipeline import LakeTable

    ev = generate_events(GenConfig(n_docs=20, n_events=200,
                                   noise_pct=30))
    dump = str(tmp_path / "blg")
    B.binlog_dump(ev, dump, n_files=4)

    args = ["binlog", "--dump", dump, "--table", str(tmp_path / "fan"),
            "--route", f"sequences={tmp_path / 'seq'}",
            "--route", f"ignored_entity={tmp_path / 'noise'}",
            "--partitions", "2"]
    assert cli_main(args) == 0
    out = _json.loads(capsys.readouterr().out)
    assert all("error" not in v for v in out["targets"].values())
    seq = LakeTable(str(tmp_path / "seq")).state_table()
    noise = LakeTable(str(tmp_path / "noise")).state_table()
    assert seq.num_rows > 0 and noise.num_rows > 0
    assert all(d.startswith("noise-")
               for d in noise.column("doc_id").to_pylist())

    # resume: both targets caught up → files pruned, 0 applied
    assert cli_main(args) == 0
    again = _json.loads(capsys.readouterr().out)
    assert again["files_skipped"] == 3 and again["files"] == 1
    assert all(v.get("events_applied") == 0
               for v in again["targets"].values())

    # malformed spec (empty table name) is rejected, not silently
    # registered as a match-nothing lake
    assert cli_main(["binlog", "--dump", dump,
                     "--table", str(tmp_path / "fan"),
                     "--route", f"={tmp_path / 'oops'}",
                     "--partitions", "2"]) == 1
    err = _json.loads(capsys.readouterr().out)
    assert "TABLE=LAKE_PATH" in err["error"]


def test_column_drop_is_structured_ddl_error(tmp_path):
    """A TABLE_MAP declaring FEWER columns than an earlier one of the
    same table (a column drop mid-stream) raises the STRUCTURED
    non-additive-DDL error, not a generic format error: kind/table
    fields for routing, plus the documented bootstrap guidance."""
    ev = generate_events(CFG)
    rows = ev.to_pylist()
    txs: list[list[dict]] = []
    for r in rows:
        if txs and txs[-1][0]["tx_id"] == r["tx_id"]:
            txs[-1].append(r)
        else:
            txs.append([r])
    # two pre-evolution txs (lang all-null there): declare 5 columns
    # first, then 4 — a drop
    payload = pa.schema(list(ev.schema.field("after").type))
    codecs = [B._codec_for(f.type) for f in payload]
    path = str(tmp_path / "drop.000001")
    w = B._FileWriter(path)
    B._write_tx(w, txs[0], payload, codecs, 5, {}, 8)
    B._write_tx(w, txs[1], payload, codecs, 4, {}, 8)
    w.close(None)
    with pytest.raises(B.BinlogDDLError) as ei:
        B.decode_binlog_file(open(path, "rb").read(), path,
                             payload=payload)
    e = ei.value
    assert e.kind == "column-drop" and e.source == "binlog"
    assert e.table == txs[1][0]["table"]
    assert "bootstrap" in str(e)
    # still catchable as the format's own error family
    assert isinstance(e, B.BinlogFormatError)
    from rookray.schema import NonAdditiveDDLError
    assert isinstance(e, NonAdditiveDDLError)


def test_payload_narrower_carries_rename_hint(tmp_path):
    """payload ⊂ table can be a RENAME seen from the narrow side; the
    structured error surfaces the CDCConfig.column_renames escape
    hatch."""
    ev = generate_events(CFG)
    d = B.binlog_dump(ev, str(tmp_path / "blg"), n_files=1)
    with pytest.raises(B.BinlogDDLError) as ei:
        _decode_all(d, SEQ_SCHEMA)  # 5-col TABLE_MAP vs 4-col payload
    assert ei.value.kind == "payload-narrower"
    assert "column_renames" in str(ei.value)


def test_ddl_errors_survive_the_worker_pickle_hop():
    """A DDL error raised inside a Ray read task is serialized back to
    the driver — custom-signature exceptions need an explicit reduce
    or the unpickle itself raises TypeError and masks the real
    error."""
    import pickle
    from rookray.pgoutput import PgOutputDDLError
    from rookray.schema import NonAdditiveDDLError
    for e in (B.BinlogDDLError("rook", "t", "column-drop", "d"),
              PgOutputDDLError("rook", "t", "type-change", "d"),
              NonAdditiveDDLError("binlog", "rook", "t",
                                  "unknown-column", "x")):
        e2 = pickle.loads(pickle.dumps(e))
        assert type(e2) is type(e)
        assert (e2.source, e2.db, e2.table, e2.kind) == \
            (e.source, e.db, e.table, e.kind)
        assert str(e2) == str(e)


def test_mixed_gtid_modes_refused(tmp_path):
    """GNO and XID are independent server counters: a stream carrying
    BOTH GTID'd and GTID-less transactions (gtid_mode toggled online)
    could assign two transactions one identity — refused loudly
    instead of silently wedging the watermark."""
    ev = generate_events(GenConfig(n_docs=5, n_events=12))
    rows = ev.to_pylist()
    txs: list[list[dict]] = []
    for r in rows:
        if txs and txs[-1][0]["tx_id"] == r["tx_id"]:
            txs[-1].append(r)
        else:
            txs.append([r])
    payload = pa.schema(list(ev.schema.field("after").type))
    codecs = [B._codec_for(f.type) for f in payload]
    # simpler: reuse the xid-fallback writer shape from the other test
    path2 = str(tmp_path / "mix2.000001")
    w2 = B._FileWriter(path2)
    B._write_tx(w2, txs[0], payload, codecs, len(payload), {}, 8)
    codecs4 = [B._codec_for(f.type) for f in SEQ_SCHEMA]
    B._write_table_map(w2, 100, "rook", "sequences", codecs4, 1)
    b2 = bytearray((100).to_bytes(6, "little"))
    b2 += struct.pack("<HH", 0, 2)
    b2 += B._lenenc(4) + b"\x0f"
    b2 += B._image(["d1", [1, 2], 2, "s"], codecs4)
    w2.event(B.WRITE_ROWS_EVENT_V2, bytes(b2), 1)
    w2.event(B.XID_EVENT, struct.pack("<Q", 77), 1)
    w2.close(None)
    with pytest.raises(B.BinlogFormatError, match="mixes"):
        B.decode_binlog_file(open(path2, "rb").read(), path2,
                             payload=SEQ_SCHEMA)


def test_parser_decodes_hand_crafted_spec_file():
    """Independent spec-fidelity pin: a binlog-v4 file constructed BY
    HAND from the public MySQL Internals layout (magic, FDE with
    post-header-length table and checksum-alg byte, GTID, QUERY BEGIN,
    TABLE_MAP with metadata block, WRITE/UPDATE/DELETE_ROWS v2, XID) —
    NOT by binlog_dump, so a mirrored encode/decode misreading cannot
    hide.  Covers both checksum regimes: alg OFF and CRC32 (each
    event's CRC computed by hand over header+body)."""
    import struct
    import zlib

    import numpy as np

    from rookray.binlog import decode_binlog_file
    from rookray.schema import (OP_DELETE, OP_INSERT, OP_UPDATE,
                                SEQ_SCHEMA)

    def varchar(s):
        b = s.encode()
        return struct.pack("<H", len(b)) + b

    def blob_i32(vals):
        raw = np.asarray(vals, dtype="<i4").tobytes()
        return struct.pack("<I", len(raw)) + raw

    def image(doc, toks, src):
        return (bytes([0]) + varchar(doc) + blob_i32(toks)
                + struct.pack("<i", len(toks)) + varchar(src))

    def build(crc_on):
        out = bytearray(b"\xfebin")
        pos = [4]

        def event(etype, body):
            tail = 4 if (crc_on and etype != 15) else 0
            size = 19 + len(body) + tail
            ev = struct.pack("<IBIIIH", 0, etype, 7, size,
                             pos[0] + size, 0) + body
            if tail:
                ev += struct.pack("<I", zlib.crc32(ev) & 0xFFFFFFFF)
            out.extend(ev)
            pos[0] += len(ev)

        alg = 1 if crc_on else 0
        event(15, struct.pack("<H", 4) + b"5.7.30-hand".ljust(50, b"\0")
              + struct.pack("<I", 0) + bytes([19]) + bytes(39)
              + bytes([alg]) + b"\0\0\0\0")
        event(33, bytes([1]) + bytes(range(16)) + struct.pack("<q", 5))
        event(2, struct.pack("<IIBHH", 1, 0, 4, 0, 0) + b"rook\0BEGIN")
        event(19, b"\x4d\0\0\0\0\0" + b"\0\0"
              + bytes([4]) + b"rook\0" + bytes([9]) + b"sequences\0"
              + bytes([4]) + bytes([15, 252, 3, 15])
              + bytes([6]) + struct.pack("<H", 1024) + bytes([4])
              + struct.pack("<H", 1024) + bytes([0x0F]))
        head = (b"\x4d\0\0\0\0\0" + b"\0\0" + struct.pack("<H", 2)
                + bytes([4]) + bytes([0x0F]))
        event(30, head + image("d1", [10, 20, 30], "s0"))
        event(31, head + bytes([0x0F])           # update: 2nd bitmap
              + image("d1", [10, 20, 30], "s0")
              + image("d1", [40], "s0"))
        event(32, head + image("d1", [40], "s0"))
        event(16, struct.pack("<Q", 5))
        return bytes(out)

    for crc_on in (False, True):
        t = decode_binlog_file(build(crc_on), "rookray-bin.000001",
                               payload=SEQ_SCHEMA)
        assert t.num_rows == 3, crc_on
        rows = sorted(t.to_pylist(), key=lambda r: r["seq_in_tx"])
        assert [r["op"] for r in rows] == [OP_INSERT, OP_UPDATE,
                                           OP_DELETE]
        assert all(r["tx_id"] == 4 and r["server_id"] == 7
                   and r["tx_events"] == 3 for r in rows)
        assert rows[0]["after"]["tokens"] == [10, 20, 30]
        assert rows[1]["before"]["tokens"] == [10, 20, 30]
        assert rows[1]["after"]["tokens"] == [40]
        assert rows[2]["before"]["n_tok"] == 1
        assert rows[2]["after"] is None
