"""PostgreSQL pgoutput wire adapter: encode → decode roundtrips,
incremental chunked parsing, replica-identity modes, TOAST markers,
strict-mode guards, live socket feed, lake apply."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from rookray import pgoutput as PG
from rookray.gen import GenConfig, generate_events, final_state
from rookray.schema import (OP_DELETE, OP_INSERT, OP_UPDATE, SEQ_SCHEMA,
                            change_event_schema)

CFG = GenConfig(n_docs=40, n_events=240, evolve_at=121, noise_pct=5)


def _payload_of(ev: pa.Table) -> pa.Schema:
    return pa.schema(list(ev.schema.field("after").type))


def _decode_all(paths, payload):
    return pa.concat_tables(
        [PG.decode_pgwal_file(open(p, "rb").read(), payload)
         for p in paths]).sort_by("gtid")


def test_roundtrip_exact_with_evolution(tmp_path):
    """Full-fidelity roundtrip: gtid = LSN, tx identity from
    Begin/Commit buffering, images/ops/keys byte-equal — including the
    mid-stream re-sent Relation widening 4 → 5 columns (pre-evolution
    rows decode with a null appended column by name-based mapping)."""
    ev = generate_events(CFG)
    d = PG.pgwal_dump(ev, str(tmp_path / "pg"), n_files=3,
                      evolve_gtid=CFG.evolve_at, pre_evolution_columns=4)
    assert d["events"] == ev.num_rows
    got = _decode_all(d["files"], _payload_of(ev))
    orig = ev.sort_by("gtid")
    assert np.array_equal(np.asarray(got.column("gtid")),
                          np.asarray(orig.column("gtid")))
    for c in ["tx_id", "seq_in_tx", "tx_events", "db", "table", "op",
              "key", "before", "after"]:
        assert got.column(c).to_pylist() == orig.column(c).to_pylist(), c
    # no per-row server identity in the format
    assert got.column("server_id").null_count == got.num_rows


def test_chunked_feed_equals_whole_file(tmp_path):
    """Incremental parse over pathological 7-byte TCP chunks emits the
    identical table (frames and messages split arbitrarily)."""
    ev = generate_events(CFG)
    d = PG.pgwal_dump(ev, str(tmp_path / "pg"), n_files=2)
    payload = _payload_of(ev)
    whole = _decode_all(d["files"], payload)
    blob = b"".join(open(p, "rb").read() for p in d["files"])
    pr = PG.PgOutputParser(payload, emit_rows=64)
    outs = []
    for i in range(0, len(blob), 7):
        t = pr.feed(blob[i:i + 7])
        if t is not None:
            outs.append(t)
    t = pr.finish()
    if t is not None:
        outs.append(t)
    assert pa.concat_tables(outs).sort_by("gtid").equals(whole)


def test_key_only_replica_identity(tmp_path):
    """REPLICA IDENTITY USING INDEX: 'K' before images carry the key
    column only; updates/deletes still key correctly."""
    ev = generate_events(GenConfig(n_docs=20, n_events=120))
    d = PG.pgwal_dump(ev, str(tmp_path / "pg"), n_files=2,
                      replident="key")
    got = _decode_all(d["files"], _payload_of(ev))
    orig = ev.sort_by("gtid")
    assert got.column("key").to_pylist() == orig.column("key").to_pylist()
    ops = orig.column("op").to_pylist()
    ob = orig.column("before").to_pylist()
    for op, bv, owant in zip(ops, got.column("before").to_pylist(), ob):
        if op in (OP_UPDATE, OP_DELETE):
            assert bv["doc_id"] == owant["doc_id"]
            assert all(bv[k] is None for k in bv if k != "doc_id")
        else:
            assert bv is None


def test_unchanged_toast_resolves_from_before_image():
    """'u' markers in the new tuple: resolved from the 'O' before
    image when present, null without one — the REPLICA IDENTITY FULL
    degradation every logical consumer documents."""
    payload = SEQ_SCHEMA
    rel = PG._relation_msg(16385, "rook", "sequences", b"f",
                           [(f.name, f.type) for f in payload])

    def tup(vals):
        out = [struct.pack(">H", len(vals))]
        for v in vals:
            if v is None:
                out.append(b"n")
            elif v is PG._UNCHANGED:
                out.append(b"u")
            else:
                b = v.encode()
                out.append(b"t" + struct.pack(">I", len(b)) + b)
        return b"".join(out)

    U = PG._UNCHANGED
    msgs = [
        (10, b"B" + struct.pack(">QQI", 10, 0, 7)),
        (10, rel),
        (11, b"U" + struct.pack(">I", 16385)
         + b"O" + tup(["d1", "{1,2}", "2", "old"])
         + b"N" + tup(["d1", U, "2", "new"])),
        (12, b"U" + struct.pack(">I", 16385)
         + b"N" + tup(["d2", U, "1", "new"])),   # no before image
        (12, b"C\x00" + struct.pack(">QQQ", 12, 13, 0)),
    ]
    blob = b"".join(b"w" + struct.pack(">QQQ", lsn, lsn, 0) + m
                    for lsn, m in msgs)
    t = PG.decode_pgwal_file(blob, payload)
    after = t.column("after").to_pylist()
    assert after[0]["tokens"] == [1, 2]      # resolved from 'O' image
    assert after[1]["tokens"] is None        # no image to resolve from
    assert t.column("tx_events").to_pylist() == [2, 2]


def test_strict_guards(tmp_path):
    ev = generate_events(GenConfig(n_docs=10, n_events=60))
    d = PG.pgwal_dump(ev, str(tmp_path / "pg"), n_files=1)
    blob = open(d["files"][0], "rb").read()
    payload = _payload_of(ev)
    # torn tail raises in strict mode, tolerated in lenient mode
    with pytest.raises(PG.PgOutputError):
        PG.decode_pgwal_file(blob[:-37], payload)
    t = PG.decode_pgwal_file(blob[:-37], payload,
                             allow_partial_tail=True)
    whole = PG.decode_pgwal_file(blob, payload)
    assert 0 < t.num_rows < whole.num_rows
    # whole-transactions-only: every emitted tx is complete
    df = t.to_pandas()
    assert (df.groupby("tx_id")["gtid"].count()
            == df.groupby("tx_id")["tx_events"].first()).all()
    # relation declaring a column outside the payload schema raises
    bad_rel = PG._relation_msg(16400, "rook", "sequences", b"f",
                               [("mystery_col", pa.string())])
    frame = (b"w" + struct.pack(">QQQ", 1, 1, 0)
             + b"B" + struct.pack(">QQI", 1, 0, 1)
             + b"w" + struct.pack(">QQQ", 2, 2, 0) + bad_rel)
    with pytest.raises(PG.PgOutputError, match="appended columns only"):
        PG.decode_pgwal_file(frame, payload, allow_partial_tail=True)


def test_socket_feed_applies_to_lake(tmp_path):
    """Live replication-connection analog: raw pgoutput bytes over TCP
    in unaligned chunks drive the full lake apply to the serial-oracle
    state.  No side index — the protocol brackets transactions."""
    from rookray.pipeline import CDCConfig, LakeTable

    cfg = GenConfig(n_docs=40, n_events=240, evolve_at=121, noise_pct=0)
    ev = generate_events(cfg)
    d = PG.pgwal_dump(ev, str(tmp_path / "pg"), n_files=4)

    srv = PG.PgStreamServer()
    ds = PG.stream_pgwal_socket(srv.host, srv.port,
                                payload=_payload_of(ev))
    for f in d["files"]:
        srv.push_file(f, chunk=333)  # frames split across sends
    srv.close()

    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=4))
    lake.apply(ds.materialize())
    state = lake.state_table().sort_by("doc_id")
    exp = final_state(cfg).sort_by("doc_id")
    assert state.column("doc_id").to_pylist() == exp.column("doc_id").to_pylist()
    assert state.column("tokens").to_pylist() == exp.column("tokens").to_pylist()


def test_ray_read_pgwal_matches_serial(tmp_path):
    ev = generate_events(CFG)
    d = PG.pgwal_dump(ev, str(tmp_path / "pg"), n_files=3,
                      evolve_gtid=CFG.evolve_at, pre_evolution_columns=4)
    payload = _payload_of(ev)
    ds = PG.read_pgwal(d["files"], payload=payload)
    got = pa.Table.from_pylist(
        ds.take_all(), schema=change_event_schema(payload)
    ).sort_by("gtid")
    assert got.equals(_decode_all(d["files"], payload))


def test_lsn_checkpoint_resume_skips_segments(tmp_path, ray_session,
                                              capsys):
    """The confirmed_flush_lsn analog: a second `rookray pgwal` run
    over the same dump skips every segment whose successor starts at
    or below the committed watermark (25-byte header reads only),
    applies 0 events, and leaves state identical (idempotent
    resume)."""
    import json as _json
    from rookray.cli import main as cli_main
    from rookray.pipeline import LakeTable

    ev = generate_events(GenConfig(n_docs=20, n_events=160))
    dump = str(tmp_path / "pg")
    d = PG.pgwal_dump(ev, dump, n_files=4)
    t = str(tmp_path / "lake")
    assert cli_main(["pgwal", "--dump", dump, "--table", t,
                     "--partitions", "2"]) == 0
    first = _json.loads(capsys.readouterr().out)
    assert first["files"] == 4 and first["files_skipped"] == 0
    state1 = LakeTable(t).state_table().sort_by("doc_id")

    # unit surface: watermark == max LSN → only the LAST segment is
    # re-presented (nothing bounds its upper range)
    wm = first["closed_watermark"]
    assert PG.pgwal_files_above(d["files"], wm) == d["files"][3:]

    assert cli_main(["pgwal", "--dump", dump, "--table", t,
                     "--partitions", "2"]) == 0
    second = _json.loads(capsys.readouterr().out)
    assert second["files"] == 1 and second["files_skipped"] == 3
    assert second["events_applied"] == 0
    state2 = LakeTable(t).state_table().sort_by("doc_id")
    assert state1.to_pylist() == state2.to_pylist()

    # partial overlap: watermark inside segment 2 → segments 2-4 kept
    mid_wm = PG.first_lsn(d["files"][2]) - 2
    assert PG.pgwal_files_above(d["files"], mid_wm) == d["files"][1:]
    # watermark below everything → all segments kept
    assert PG.pgwal_files_above(d["files"], -1) == d["files"]


def test_socket_death_mid_tx_then_file_resume(tmp_path):
    """Crash-resume across the live path and the file path: the
    producer dies mid-transaction (lenient tail drops ONLY the torn
    trailing tx), the partial stream applies, and a later file replay
    resumes from the committed watermark to the exact serial-oracle
    state (the overlap is watermark-skipped)."""
    from rookray.pipeline import CDCConfig, LakeTable

    cfg = GenConfig(n_docs=30, n_events=200, noise_pct=0)
    ev = generate_events(cfg)
    d = PG.pgwal_dump(ev, str(tmp_path / "pg"), n_files=2)
    payload = _payload_of(ev)

    blob = b"".join(open(p, "rb").read() for p in d["files"])
    srv = PG.PgStreamServer()
    ds = PG.stream_pgwal_socket(srv.host, srv.port, payload=payload)
    srv.push_bytes(blob[: int(len(blob) * 0.6)], chunk=501)
    srv.close()  # connection drops mid-transaction

    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=4))
    first = lake.apply(ds.materialize())
    max_gtid = ev.column("gtid").to_pylist()[-1]
    assert 0 < first["closed_watermark"] < max_gtid  # a true partial

    # resume over the recorded segments; LSN pruning may skip the
    # first file entirely, the watermark drops the applied overlap
    paths = PG.pgwal_files_above(d["files"], first["closed_watermark"])
    second = lake.apply(PG.read_pgwal(paths, payload=payload)
                        .materialize())
    assert second["closed_watermark"] == max_gtid

    state = lake.state_table().sort_by("doc_id")
    exp = final_state(cfg).sort_by("doc_id")
    assert state.column("doc_id").to_pylist() == exp.column("doc_id").to_pylist()
    assert state.column("tokens").to_pylist() == exp.column("tokens").to_pylist()


def test_live_stream_feeds_windows(tmp_path):
    """Composition: a live pgoutput socket feed drives the STREAMING
    layer (tumbling windows close as the replication stream flows),
    not just the lake — decoded change events are first-class stream
    input.  The window sums must equal the per-window op counts of
    the serial decode."""
    import collections

    from rookray.streaming import tumbling_stream

    cfg = GenConfig(n_docs=30, n_events=300, noise_pct=0)
    ev = generate_events(cfg)
    d = PG.pgwal_dump(ev, str(tmp_path / "pg"), n_files=3)
    payload = _payload_of(ev)

    srv = PG.PgStreamServer()
    ds = PG.stream_pgwal_socket(srv.host, srv.port, payload=payload)
    for f in d["files"]:
        srv.push_file(f, chunk=777)
    srv.close()

    win = 64
    got = collections.Counter()
    for tbl in tumbling_stream(ds, window=win, ts_col="gtid",
                               key_col="op", n_sources=1):
        for r in tbl.to_pylist():
            got[(r["window_start"], r["op"])] += r["n_events"]

    want = collections.Counter()
    for g, op in zip(ev.column("gtid").to_pylist(),
                     ev.column("op").to_pylist()):
        want[((g // win) * win, op)] += 1
    assert got == want


def test_streamed_transactions_roundtrip(tmp_path):
    """Protocol v2: large transactions ship as S..E segments closed by
    StreamCommit — decode must reproduce the exact same events as the
    Begin/Commit encoding of the same stream."""
    ev = generate_events(CFG)
    payload = _payload_of(ev)
    plain = PG.pgwal_dump(ev, str(tmp_path / "plain"), n_files=2)
    streamed = PG.pgwal_dump(ev, str(tmp_path / "streamed"), n_files=2,
                             stream_txs_over=2, stream_segment_rows=3)
    a = _decode_all(plain["files"], payload)
    b = _decode_all(streamed["files"], payload)
    assert a.equals(b)
    # the streamed dump genuinely used the stream protocol
    assert streamed["streamed_txs"] > 0
    blob = b"".join(open(p, "rb").read() for p in streamed["files"])
    # chunked incremental feed over the streamed encoding still exact
    pr = PG.PgOutputParser(payload, emit_rows=1 << 62)
    for i in range(0, len(blob), 11):
        pr.feed(blob[i:i + 11])
    assert pr.finish().sort_by("gtid").equals(a)


def test_interleaved_streams_and_abort():
    """Two transactions interleave their S..E segments (the reason the
    stream protocol exists); an aborted streamed transaction leaves no
    rows; a torn open stream raises in strict mode."""
    payload = SEQ_SCHEMA
    rel = PG._relation_msg(16385, "rook", "sequences", b"f",
                           [(f.name, f.type) for f in payload])

    def tup(vals):
        out = [struct.pack(">H", len(vals))]
        for v in vals:
            b = str(v).encode() if not isinstance(v, (list,)) else \
                ("{" + ",".join(map(str, v)) + "}").encode()
            out.append(b"t" + struct.pack(">I", len(b)) + b)
        return b"".join(out)

    def ins(doc, lsn, xid):
        # protocol v2: in-stream messages carry an Int32 xid after
        # the tag
        return (lsn, b"I" + struct.pack(">II", xid, 16385) + b"N"
                + tup([doc, [1], 1, "s"]))

    def rel_in(xid):
        return rel[:1] + struct.pack(">I", xid) + rel[1:]

    S = lambda xid, first: b"S" + struct.pack(">IB", xid, first)
    msgs = [
        (1, S(100, 1)), (1, rel_in(100)), ins("a0", 2, 100), (2, b"E"),
        (3, S(200, 1)), ins("b0", 4, 200), (4, b"E"),   # interleaved
        (5, S(100, 0)), ins("a1", 5, 100), (5, b"E"),
        (6, S(300, 1)), ins("x0", 6, 300), (6, b"E"),   # will abort
        (7, b"c" + struct.pack(">IBQQQ", 100, 0, 7, 8, 0)),
        (8, b"A" + struct.pack(">II", 300, 300)),
        (9, b"c" + struct.pack(">IBQQQ", 200, 0, 9, 10, 0)),
    ]
    blob = b"".join(b"w" + struct.pack(">QQQ", lsn, lsn, 0) + m
                    for lsn, m in msgs)
    t = PG.decode_pgwal_file(blob, payload).sort_by("gtid")
    assert t.column("key").to_pylist() == ["a0", "b0", "a1"]
    assert t.column("tx_id").to_pylist() == [100, 200, 100]
    assert t.column("tx_events").to_pylist() == [2, 1, 2]
    assert t.column("seq_in_tx").to_pylist() == [0, 0, 1]

    # a wrong per-message xid inside a block is a protocol error
    bad = b"".join(b"w" + struct.pack(">QQQ", lsn, lsn, 0) + m
                   for lsn, m in [(1, S(100, 1)), (1, rel_in(100)),
                                  ins("a0", 2, 999), (2, b"E")])
    with pytest.raises(PG.PgOutputError, match="inside StreamStart"):
        PG.decode_pgwal_file(bad, payload, allow_partial_tail=True)

    # torn open stream (no StreamCommit) raises; lenient drops it
    torn = b"".join(b"w" + struct.pack(">QQQ", lsn, lsn, 0) + m
                    for lsn, m in msgs[:4] + [(9, S(500, 1)),
                                              ins("z", 9, 500),
                                              (9, b"E")])
    with pytest.raises(PG.PgOutputError, match="uncommitted streamed"):
        PG.decode_pgwal_file(torn, payload)
    t2 = PG.decode_pgwal_file(torn, payload, allow_partial_tail=True)
    assert t2.num_rows == 0  # xid 100 never committed either

    # subtransaction abort is explicitly unsupported
    sub = b"".join(b"w" + struct.pack(">QQQ", lsn, lsn, 0) + m
                   for lsn, m in [(1, S(700, 1)), (1, rel_in(700)),
                                  ins("q", 1, 700), (1, b"E"),
                                  (2, b"A" + struct.pack(">II",
                                                         700, 701))])
    with pytest.raises(PG.PgOutputError, match="subtransaction"):
        PG.decode_pgwal_file(sub, payload, allow_partial_tail=True)


def _xlog(lsn: int, msg: bytes) -> bytes:
    return b"w" + struct.pack(">QQQ", lsn, lsn, 0) + msg


def test_relation_column_drop_is_structured_ddl_error(tmp_path):
    """A re-sent Relation missing a previously declared column name is
    a column drop: the STRUCTURED non-additive-DDL error fires, with
    kind/table routing fields."""
    cols4 = [("doc_id", pa.string()), ("tokens", pa.list_(pa.int32())),
             ("n_tok", pa.int32()), ("source", pa.string())]
    payload = pa.schema(cols4)
    r_full = PG._relation_msg(16400, "rook", "sequences", b"f", cols4)
    r_drop = PG._relation_msg(16400, "rook", "sequences", b"f",
                              cols4[:2] + cols4[3:])  # n_tok dropped
    frame = _xlog(1, r_full) + _xlog(2, r_drop)
    with pytest.raises(PG.PgOutputDDLError) as ei:
        PG.decode_pgwal_file(frame, payload, allow_partial_tail=True)
    e = ei.value
    assert e.kind == "column-drop" and e.source == "pgoutput"
    assert e.table == "sequences" and "n_tok" in str(e)
    assert isinstance(e, PG.PgOutputError)


def test_relation_type_change_is_structured_ddl_error():
    """The same column re-declared with a different type oid than the
    stream's own earlier Relation message is a type change."""
    cols = [("doc_id", pa.string()), ("n_tok", pa.int32())]
    payload = pa.schema(cols)
    r1 = PG._relation_msg(16400, "rook", "sequences", b"f", cols)
    r2 = PG._relation_msg(16400, "rook", "sequences", b"f",
                          [("doc_id", pa.string()),
                           ("n_tok", pa.int64())])  # int4 -> int8
    with pytest.raises(PG.PgOutputDDLError) as ei:
        PG.decode_pgwal_file(_xlog(1, r1) + _xlog(2, r2), payload,
                             allow_partial_tail=True)
    assert ei.value.kind == "type-change"
    assert "n_tok" in str(ei.value)


def test_unknown_column_carries_rename_hint():
    """A Relation column name the payload doesn't know is how a RENAME
    surfaces in pgoutput — the error points at the
    CDCConfig.column_renames escape hatch."""
    payload = pa.schema([("doc_id", pa.string())])
    rel = PG._relation_msg(16400, "rook", "sequences", b"f",
                           [("doc_identifier", pa.string())])
    with pytest.raises(PG.PgOutputDDLError) as ei:
        PG.decode_pgwal_file(_xlog(1, rel), payload,
                             allow_partial_tail=True)
    assert ei.value.kind == "unknown-column"
    assert "column_renames" in str(ei.value)


def test_parser_decodes_hand_crafted_spec_stream():
    """Independent spec-fidelity pin: an XLogData-framed pgoutput
    stream constructed BY HAND from the public protocol docs (Begin /
    Relation / Insert / Update with 'O' old tuple / Delete / Commit,
    text-format tuples, int4[] array literals) — NOT by pgwal_dump, so
    a mirrored encode/decode misreading cannot hide."""
    import struct

    from rookray.pgoutput import PgOutputParser
    from rookray.schema import OP_DELETE, OP_INSERT, OP_UPDATE, SEQ_SCHEMA

    def cstr(s):
        return s.encode() + b"\0"

    def frame(start_lsn, payload):
        return b"w" + struct.pack(">QQQ", start_lsn, start_lsn + 1, 0) \
            + payload

    def tup(vals):
        out = struct.pack(">H", len(vals))
        for v in vals:
            if v is None:
                out += b"n"
            else:
                b = v.encode()
                out += b"t" + struct.pack(">I", len(b)) + b
        return out

    rel = (b"R" + struct.pack(">I", 55) + cstr("public")
           + cstr("sequences") + b"f" + struct.pack(">H", 4)
           + bytes([1]) + cstr("doc_id") + struct.pack(">Ii", 25, -1)
           + bytes([0]) + cstr("tokens") + struct.pack(">Ii", 1007, -1)
           + bytes([0]) + cstr("n_tok") + struct.pack(">Ii", 23, -1)
           + bytes([0]) + cstr("source") + struct.pack(">Ii", 25, -1))
    begin = b"B" + struct.pack(">QQI", 900, 0, 42)
    ins = (b"I" + struct.pack(">I", 55) + b"N"
           + tup(["d1", "{1,2}", "2", "s0"]))
    upd = (b"U" + struct.pack(">I", 55)
           + b"O" + tup(["d1", "{1,2}", "2", "s0"])
           + b"N" + tup(["d1", "{3}", "1", "s0"]))
    dele = (b"D" + struct.pack(">I", 55)
            + b"O" + tup(["d1", "{3}", "1", "s0"]))
    commit = b"C" + bytes([0]) + struct.pack(">QQQ", 900, 901, 0)

    stream = (frame(100, begin) + frame(150, rel) + frame(300, ins)
              + frame(400, upd) + frame(500, dele)
              + frame(900, commit))
    parser = PgOutputParser(payload=SEQ_SCHEMA)
    mid = parser.feed(stream)
    tail = parser.finish()
    parts = [x for x in (mid, tail) if x is not None and x.num_rows]
    assert parts, "no rows emitted"
    t = pa.concat_tables(parts)
    assert t.num_rows == 3
    rows = sorted(t.to_pylist(), key=lambda r: r["gtid"])
    assert [r["gtid"] for r in rows] == [300, 400, 500]
    assert [r["op"] for r in rows] == [OP_INSERT, OP_UPDATE, OP_DELETE]
    assert all(r["tx_id"] == 42 and r["tx_events"] == 3 for r in rows)
    assert rows[0]["after"]["tokens"] == [1, 2]
    assert rows[1]["before"]["tokens"] == [1, 2]
    assert rows[1]["after"]["tokens"] == [3]
    assert rows[2]["before"]["n_tok"] == 1 and rows[2]["after"] is None
