"""Maxwell / Canal flat-message wire adapters: encode → decode
roundtrips, real-world record shapes, strict-mode guards, socket feeds,
lake apply."""

import json

import numpy as np
import pyarrow as pa
import pytest

from rookray import wirejson as WJ
from rookray.gen import GenConfig, generate_events, final_state
from rookray.schema import (OP_INSERT, OP_UPDATE, SEQ_SCHEMA,
                            SEQ_SCHEMA_V2, change_event_schema)
from rookray.wire import _json_table

CFG = GenConfig(n_docs=40, n_events=240, evolve_at=121, noise_pct=5)


def _payload_of(ev: pa.Table) -> pa.Schema:
    return pa.schema(list(ev.schema.field("after").type))


# ------------------------------------------------------------- Maxwell

def test_maxwell_roundtrip_exact(tmp_path):
    ev = generate_events(CFG)
    d = WJ.maxwell_dump(ev, str(tmp_path / "mx"), n_files=3,
                        ddl_before_gtid=CFG.evolve_at)
    assert d["events"] == ev.num_rows
    ds = WJ.read_maxwell(d["files"], payload=_payload_of(ev))
    got = pa.Table.from_pylist(
        ds.take_all(), schema=change_event_schema(_payload_of(ev))
    ).sort_by("gtid")
    orig = ev.sort_by("gtid")
    # gtid decodes as binlog coordinates: (file_seq=1) << 40 | pos
    assert np.array_equal(np.asarray(got.column("gtid")),
                          (1 << 40) | np.asarray(orig.column("gtid")))
    for c in ["tx_id", "seq_in_tx", "tx_events", "server_id", "db",
              "table", "op", "key", "before", "after"]:
        assert got.column(c).to_pylist() == orig.column(c).to_pylist(), c


def test_maxwell_partial_old_overlay():
    """The documented Maxwell update contract: ``old`` carries only
    changed columns; the before image is data overlaid with old, and a
    null in old reads as unchanged (JSON inference cannot distinguish
    absent from null)."""
    rows = [
        {"database": "rook", "table": "sequences", "type": "update",
         "ts": 0, "xid": 7, "commit": True, "server_id": 1,
         "position": "master.000002:500",
         "data": {"doc_id": "d1", "tokens": [5, 6], "n_tok": 2,
                  "source": "web"},
         "old": {"tokens": [1], "n_tok": 1}},
    ]
    t = WJ.decode_maxwell(
        _json_table(("\n".join(json.dumps(r) for r in rows)).encode()),
        payload=SEQ_SCHEMA)
    assert t.column("op").to_pylist() == [OP_UPDATE]
    b = t.column("before").to_pylist()[0]
    assert b == {"doc_id": "d1", "tokens": [1], "n_tok": 1,
                 "source": "web"}  # unchanged cols from data
    assert t.column("gtid").to_pylist() == [(2 << 40) | 500]


def test_maxwell_ddl_bootstrap_and_no_xid():
    """DDL records are dropped; bootstrap-insert decodes as INSERT
    (it IS a row image); records without an xid decode as singleton
    transactions keyed by their own coordinate."""
    rows = [
        {"database": "rook", "table": "sequences", "type": "table-alter",
         "ts": 0, "sql": "ALTER TABLE sequences ADD COLUMN lang text"},
        {"database": "rook", "table": "sequences",
         "type": "bootstrap-insert", "ts": 0, "server_id": 1,
         "position": "master.000001:42",
         "data": {"doc_id": "b0", "tokens": [1], "n_tok": 1,
                  "source": "boot"}},
    ]
    t = WJ.decode_maxwell(
        _json_table(("\n".join(json.dumps(r) for r in rows)).encode()),
        payload=SEQ_SCHEMA)
    assert t.num_rows == 1
    assert t.column("op").to_pylist() == [OP_INSERT]
    g = (1 << 40) | 42
    assert t.column("gtid").to_pylist() == [g]
    assert t.column("tx_id").to_pylist() == [g]       # singleton fallback
    assert t.column("tx_events").to_pylist() == [1]
    assert t.column("seq_in_tx").to_pylist() == [0]


def test_maxwell_no_position_raises():
    rows = [{"database": "rook", "table": "sequences", "type": "insert",
             "xid": 1, "data": {"doc_id": "d", "tokens": [1],
                                "n_tok": 1, "source": "x"}}]
    with pytest.raises(ValueError, match="output_binlog_position"):
        WJ.decode_maxwell(_json_table(json.dumps(rows[0]).encode()),
                          payload=SEQ_SCHEMA)


def test_maxwell_socket_feed_applies_to_lake(tmp_path):
    from rookray.pipeline import CDCConfig, LakeTable

    ev = generate_events(CFG)
    d = WJ.maxwell_dump(ev, str(tmp_path / "mx"), n_files=4,
                        sparse_positions=True)
    # no precomputed index: the commit flag closes each transaction
    # in-stream (MaxwellTxBuffer inside the read task)
    srv = WJ.MaxwellStreamServer()
    ds = WJ.stream_maxwell_socket(srv.host, srv.port,
                                  payload=_payload_of(ev))
    for f in d["files"]:
        srv.push_file(f)
    srv.close()

    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(
        num_partitions=4,
        ignored_tables=frozenset({"ignored_entity"}),
        ignored_server_ids=frozenset({999})))
    lake.apply(ds.materialize())
    state = lake.state_table().sort_by("doc_id")
    exp = final_state(CFG).sort_by("doc_id")
    assert state.column("doc_id").to_pylist() == exp.column("doc_id").to_pylist()
    assert state.column("tokens").to_pylist() == exp.column("tokens").to_pylist()


# --------------------------------------------------------------- Canal

def test_canal_roundtrip(tmp_path):
    """Images, ops and stream order roundtrip exactly; transaction
    identity degrades to record-level atomicity (the flat format drops
    transaction markers) with self-consistent coordinates; server_id
    is null (not in the format)."""
    ev = generate_events(CFG)
    d = WJ.canal_dump(ev, str(tmp_path / "cn"), n_files=3,
                      ddl_before_gtid=CFG.evolve_at)
    assert d["events"] == ev.num_rows
    ds = WJ.read_canal(d["files"], payload=_payload_of(ev))
    got = pa.Table.from_pylist(
        ds.take_all(), schema=change_event_schema(_payload_of(ev))
    ).sort_by("gtid")
    orig = ev.sort_by("gtid")
    assert got.num_rows == orig.num_rows
    for c in ["db", "table", "op", "key", "before", "after"]:
        assert got.column(c).to_pylist() == orig.column(c).to_pylist(), c
    gt = np.asarray(got.column("gtid"))
    assert np.all(np.diff(gt) > 0)  # stream order preserved
    seq = np.asarray(got.column("seq_in_tx"))
    tx = np.asarray(got.column("tx_id"))
    assert np.array_equal(gt - seq, tx << 12)  # contiguous per record
    assert got.column("server_id").null_count == got.num_rows


def test_canal_string_casts_and_ddl():
    """Stringified values re-type against the payload schema: list
    columns parse from JSON text ('[]' → empty list, null → null);
    DDL records are dropped; a multi-row record explodes in order."""
    rows = [
        {"id": 3, "database": "rook", "table": "sequences",
         "pkNames": ["doc_id"], "isDdl": True, "type": "ALTER",
         "es": 0, "ts": 0, "sql": "ALTER TABLE sequences ADD lang text",
         "data": None, "old": None},
        {"id": 4, "database": "rook", "table": "sequences",
         "pkNames": ["doc_id"], "isDdl": False, "type": "INSERT",
         "es": 0, "ts": 0, "sql": "",
         "data": [{"doc_id": "a", "tokens": "[1,2,3]", "n_tok": "3",
                   "source": "web", "lang": None},
                  {"doc_id": "b", "tokens": "[]", "n_tok": "0",
                   "source": "web", "lang": "en"}],
         "old": None},
    ]
    t = WJ.decode_canal(
        _json_table(("\n".join(json.dumps(r) for r in rows)).encode()),
        payload=SEQ_SCHEMA_V2)
    assert t.num_rows == 2
    after = t.column("after").to_pylist()
    assert after[0] == {"doc_id": "a", "tokens": [1, 2, 3], "n_tok": 3,
                        "source": "web", "lang": None}
    assert after[1] == {"doc_id": "b", "tokens": [], "n_tok": 0,
                        "source": "web", "lang": "en"}
    assert t.column("gtid").to_pylist() == [4 << 12, (4 << 12) | 1]
    assert t.column("tx_events").to_pylist() == [2, 2]


def test_canal_update_old_alignment():
    """old rows align positionally with data rows across records with
    and without an old array in the same batch."""
    rows = [
        {"id": 1, "database": "r", "table": "sequences", "isDdl": False,
         "type": "INSERT", "es": 0, "ts": 0,
         "data": [{"doc_id": "i0", "tokens": "[9]", "n_tok": "1",
                   "source": "s"}], "old": None},
        {"id": 2, "database": "r", "table": "sequences", "isDdl": False,
         "type": "UPDATE", "es": 0, "ts": 0,
         "data": [{"doc_id": "u0", "tokens": "[2]", "n_tok": "1",
                   "source": "s"},
                  {"doc_id": "u1", "tokens": "[4]", "n_tok": "1",
                   "source": "s"}],
         "old": [{"tokens": "[1]"}, {"tokens": "[3]"}]},
    ]
    t = WJ.decode_canal(
        _json_table(("\n".join(json.dumps(r) for r in rows)).encode()),
        payload=SEQ_SCHEMA)
    before = t.column("before").to_pylist()
    assert before[0] is None  # insert
    assert before[1]["tokens"] == [1] and before[1]["doc_id"] == "u0"
    assert before[2]["tokens"] == [3] and before[2]["doc_id"] == "u1"


def test_canal_guards():
    base = {"database": "r", "table": "t", "isDdl": False, "es": 0,
            "ts": 0}
    big = dict(base, id=1, type="INSERT",
               data=[{"doc_id": str(i), "tokens": "[]", "n_tok": "0",
                      "source": "s"} for i in range(4096)], old=None)
    with pytest.raises(ValueError, match="2\\^12"):
        WJ.decode_canal(_json_table(json.dumps(big).encode()),
                        payload=SEQ_SCHEMA)
    short_old = dict(base, id=2, type="UPDATE",
                     data=[{"doc_id": "a", "tokens": "[]", "n_tok": "0",
                            "source": "s"},
                           {"doc_id": "b", "tokens": "[]", "n_tok": "0",
                            "source": "s"}],
                     old=[{"n_tok": "9"}])
    with pytest.raises(ValueError, match="old array length"):
        WJ.decode_canal(_json_table(json.dumps(short_old).encode()),
                        payload=SEQ_SCHEMA)


def test_canal_socket_feed_applies_to_lake(tmp_path):
    """Live canal feed needs NO side index: record atomicity decodes
    stand-alone.  (noise-free config: canal carries no server_id, so
    server-id routing is out of scope for this format.)"""
    from rookray.pipeline import CDCConfig, LakeTable

    cfg = GenConfig(n_docs=40, n_events=240, evolve_at=121, noise_pct=0)
    ev = generate_events(cfg)
    d = WJ.canal_dump(ev, str(tmp_path / "cn"), n_files=4)

    srv = WJ.CanalStreamServer()
    ds = WJ.stream_canal_socket(srv.host, srv.port,
                                payload=_payload_of(ev))
    for f in d["files"]:
        srv.push_file(f)
    srv.close()

    lake = LakeTable(str(tmp_path / "lake"),
                     CDCConfig(num_partitions=4))
    lake.apply(ds.materialize())
    state = lake.state_table().sort_by("doc_id")
    exp = final_state(cfg).sort_by("doc_id")
    assert state.column("doc_id").to_pylist() == exp.column("doc_id").to_pylist()
    assert state.column("tokens").to_pylist() == exp.column("tokens").to_pylist()


def test_maxwell_index_miss_holds_transaction():
    """An xid MISSING from the tx index (a live feed's tx newer than
    the backlog snapshot) has unknown size: decode must mark it
    tx_events=-1 (held back by the watermark) — never fabricate a
    complete singleton that would let a torn transaction commit."""
    rows = [{"database": "r", "table": "sequences", "type": "insert",
             "xid": 77, "server_id": 1,
             "position": f"master.000001:{100 + i}",
             "data": {"doc_id": f"d{i}", "tokens": [1], "n_tok": 1,
                      "source": "s"}} for i in range(2)]
    idx = WJ.maxwell_tx_index(          # covers xid 5 only
        np.array([5, 5, 5], np.int64),
        np.array([50, 51, 52], np.int64))
    t = WJ.decode_maxwell(
        _json_table(("\n".join(json.dumps(r) for r in rows)).encode()),
        payload=SEQ_SCHEMA, tx_index=idx)
    assert t.column("tx_events").to_pylist() == [-1, -1]
    assert t.column("tx_id").to_pylist() == [77, 77]
    # and the watermark indeed holds the unknown-size tx back
    from rookray.txn import closed_watermark_table
    wm, mx = closed_watermark_table(t)
    assert wm < t.column("gtid").to_pylist()[0] <= mx


def test_checkpoint_resume_prunes_json_dump_files(tmp_path, ray_session,
                                                  capsys):
    """The JSON-dump analog of the binlog/pgwal coordinate resume: a
    second `rookray wire` run skips every dump file whose successor's
    first coordinate is at or below the committed watermark (head-of-
    file reads only), applies 0 events, and leaves state identical —
    for all three JSON formats."""
    import json as _json
    from rookray.cli import main as cli_main
    from rookray.pipeline import LakeTable
    from rookray import wire as W

    ev = generate_events(GenConfig(n_docs=20, n_events=160))
    dumps = {
        "maxwell": WJ.maxwell_dump(ev, str(tmp_path / "mx"), n_files=4),
        "canal": WJ.canal_dump(ev, str(tmp_path / "cn"), n_files=4),
        "debezium": W.debezium_dump(ev, str(tmp_path / "dz"), n_files=4),
    }
    dirs = {"maxwell": "mx", "canal": "cn", "debezium": "dz"}
    for fmt, d in dumps.items():
        t = str(tmp_path / f"lake_{fmt}")
        assert cli_main(["wire", "--format", fmt,
                         "--dump", str(tmp_path / dirs[fmt]),
                         "--table", t, "--partitions", "2"]) == 0
        first = _json.loads(capsys.readouterr().out)
        assert first["files"] == 4 and first["files_skipped"] == 0, fmt
        state1 = LakeTable(t).state_table().sort_by("doc_id")

        files = d.get("files") or d["data_files"]
        wm = first["closed_watermark"]
        kept = WJ.jsonl_files_above(files, wm, fmt)
        assert kept == files[3:], fmt  # only the tail re-presented

        assert cli_main(["wire", "--format", fmt,
                         "--dump", str(tmp_path / dirs[fmt]),
                         "--table", t, "--partitions", "2"]) == 0
        second = _json.loads(capsys.readouterr().out)
        assert second["files_skipped"] == 3, fmt
        assert second["events_applied"] == 0, fmt
        state2 = LakeTable(t).state_table().sort_by("doc_id")
        assert state1.to_pylist() == state2.to_pylist(), fmt

        # watermark below everything → all files kept
        assert WJ.jsonl_files_above(files, -1, fmt) == files, fmt


def test_cli_multi_table_routed_ingest(tmp_path, ray_session, capsys):
    """`wire --route` maintains one lake per table from one decoded
    stream behind a cross-table consistent commit — the connector-dump
    analog of rook's per-table listener routing."""
    import json as _json
    from rookray.cli import main as cli_main
    from rookray.pipeline import LakeTable

    ev = generate_events(GenConfig(n_docs=30, n_events=300,
                                   noise_pct=30))
    WJ.canal_dump(ev, str(tmp_path / "cn"), n_files=3)
    assert cli_main([
        "wire", "--format", "canal", "--dump", str(tmp_path / "cn"),
        "--table", str(tmp_path / "fan"),
        "--route", f"sequences={tmp_path / 'seq'}",
        "--route", f"ignored_entity={tmp_path / 'noise'}",
        "--partitions", "2"]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert set(out["targets"]) == {"sequences", "ignored_entity"}
    assert all("error" not in v for v in out["targets"].values())

    seq = LakeTable(str(tmp_path / "seq")).state_table()
    noise = LakeTable(str(tmp_path / "noise")).state_table()
    assert seq.num_rows > 0 and noise.num_rows > 0
    # routing is strictly by TABLE: the noise lake holds only the
    # ignored_entity rows (all noise-* docs); the sequences lake also
    # holds the server-999 noise rows that sit on table 'sequences' —
    # canal carries no server_id, so table is the routing dimension
    assert all(d.startswith("noise-")
               for d in noise.column("doc_id").to_pylist())
    assert any(not d.startswith("noise-")
               for d in seq.column("doc_id").to_pylist())
    # the consistent commit landed
    import os
    assert os.path.exists(str(tmp_path / "fan" / "_fanout" /
                              "atomic.json"))


def test_route_mode_prunes_by_routed_targets_only(tmp_path, ray_session,
                                                  capsys):
    """Regression (review-confirmed data loss): checkpoint pruning in
    --route mode must consult the ROUTED lakes' watermarks, never the
    fanout-root placeholder at --table.  A fresh routed lake gets the
    whole dump even when --table points at an already-caught-up
    lake."""
    import json as _json
    from rookray.cli import main as cli_main
    from rookray.pipeline import LakeTable

    ev = generate_events(GenConfig(n_docs=20, n_events=160))
    WJ.canal_dump(ev, str(tmp_path / "cn"), n_files=4)
    L = str(tmp_path / "single")
    assert cli_main(["wire", "--format", "canal",
                     "--dump", str(tmp_path / "cn"),
                     "--table", L, "--partitions", "2"]) == 0
    first = _json.loads(capsys.readouterr().out)
    assert first["files_skipped"] == 0

    # reuse the caught-up lake's path as the fanout root (exactly the
    # misuse the --table help text invites)
    assert cli_main(["wire", "--format", "canal",
                     "--dump", str(tmp_path / "cn"),
                     "--table", L,
                     "--route", f"sequences={tmp_path / 'seq'}",
                     "--partitions", "2"]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["files_skipped"] == 0  # fresh target → no pruning
    seq = LakeTable(str(tmp_path / "seq")).state_table()
    want = LakeTable(L).state_table()
    assert seq.sort_by("doc_id").to_pylist() \
        == want.sort_by("doc_id").to_pylist()

    # second routed run: now the routed lake IS caught up → prune
    assert cli_main(["wire", "--format", "canal",
                     "--dump", str(tmp_path / "cn"),
                     "--table", L,
                     "--route", f"sequences={tmp_path / 'seq'}",
                     "--partitions", "2"]) == 0
    again = _json.loads(capsys.readouterr().out)
    assert again["files_skipped"] == 3


# ---------------------------------------- real-world Maxwell positions

def test_maxwell_sparse_positions_roundtrip_and_watermark(tmp_path):
    """Real Maxwell dumps carry binlog BYTE OFFSETS — sparse and gapped
    within a transaction.  seq_in_tx must be the coordinate's RANK in
    its tx (a coordinate delta decodes gapped seqs, the completeness
    test max_seq==tx_events-1 never passes, and the watermark wedges
    below the first multi-row tx forever)."""
    from rookray.txn import closed_watermark_table

    ev = generate_events(CFG)
    d = WJ.maxwell_dump(ev, str(tmp_path / "mx"), n_files=3,
                        sparse_positions=True)
    ds = WJ.read_maxwell(d["files"], payload=_payload_of(ev))
    got = pa.Table.from_pylist(
        ds.take_all(), schema=change_event_schema(_payload_of(ev))
    ).sort_by("gtid")
    orig = ev.sort_by("gtid")
    # coordinates are order-preserving but NOT the original gtids;
    # tx structure and images recover exactly despite the gaps
    assert got.num_rows == orig.num_rows
    for c in ["tx_id", "seq_in_tx", "tx_events", "db", "table", "op",
              "key", "before", "after"]:
        assert got.column(c).to_pylist() == orig.column(c).to_pylist(), c
    seq = np.asarray(got.column("seq_in_tx"))
    assert seq.max() > 0  # the stream really has multi-row txs
    # every transaction closes: the watermark reaches the stream's end
    wm, mx = closed_watermark_table(got)
    assert wm == mx == int(np.asarray(got.column("gtid")).max())


def test_maxwell_tx_buffer_interleaved_frames():
    """MaxwellTxBuffer assembles transactions across frames with no
    precomputed index: xid-interleaved records, commit flags closing
    txs in different frames, an uncommitted tail never emitted."""
    def rec(i, xid, pos, commit, typ="insert"):
        return {"database": "rook", "table": "sequences", "type": typ,
                "ts": 0, "xid": xid, "commit": commit, "server_id": 1,
                "position": f"master.000001:{pos}",
                "data": {"doc_id": f"d{i}", "tokens": [i], "n_tok": 1,
                         "source": "s"}}

    # tx 10: rows at sparse positions 100, 207 (commit)
    # tx 11: rows at 310, 455, 523 (commit) — split across frames
    # tx 12: row at 600, never committed (producer crashed)
    frame1 = [rec(0, 10, 100, False), rec(1, 11, 310, False)]
    frame2 = [rec(2, 10, 207, True), rec(3, 11, 455, False)]
    frame3 = [rec(4, 11, 523, True), rec(5, 12, 600, False)]

    buf = WJ.MaxwellTxBuffer(SEQ_SCHEMA)
    outs = []
    for fr in (frame1, frame2, frame3):
        blob = ("\n".join(json.dumps(r) for r in fr)).encode()
        outs.append(buf.feed(_json_table(blob)))
    assert outs[0].num_rows == 0           # nothing committed yet
    t1 = outs[1]                           # tx 10 closed by frame 2
    assert t1.column("tx_id").to_pylist() == [10, 10]
    assert sorted(t1.column("seq_in_tx").to_pylist()) == [0, 1]
    assert t1.column("tx_events").to_pylist() == [2, 2]
    t2 = outs[2]                           # tx 11 closed by frame 3
    assert t2.column("tx_id").to_pylist() == [11, 11, 11]
    assert sorted(t2.column("seq_in_tx").to_pylist()) == [0, 1, 2]
    assert t2.column("tx_events").to_pylist() == [3, 3, 3]
    # seq is the coordinate RANK: gtid order within the tx
    g = np.asarray(t2.column("gtid"))
    s = np.asarray(t2.column("seq_in_tx"))
    assert np.array_equal(np.argsort(g), np.argsort(s))
    assert buf.pending() == 1              # tx 12 stays open, unemitted


def test_maxwell_mixed_file_schemas_single_task(tmp_path, ray_session):
    """Regression (found by the snapshot fuzz): a dump where one FILE
    carries no `old` column at all (insert-only — a snapshot dump, or
    any real Maxwell capture without updates in that segment) must
    decode alongside files that do.  Ray's JSON reader KeyErrors when
    it coalesces files with differing inferred schemas into one read
    task — the dialect readers now pin one file per read task."""
    import json as _json

    a = tmp_path / "maxwell-00000.jsonl"
    b = tmp_path / "maxwell-00001.jsonl"
    a.write_text(_json.dumps({
        "type": "insert", "database": "rook", "table": "sequences",
        "ts": 1, "xid": 10, "commit": True,
        "position": "rookray-bin.000001:100",
        "data": {"doc_id": "d1", "tokens": [1, 2], "n_tok": 2,
                 "source": "s0"}}) + "\n")
    b.write_text(_json.dumps({
        "type": "update", "database": "rook", "table": "sequences",
        "ts": 2, "xid": 11, "commit": True,
        "position": "rookray-bin.000001:200",
        "data": {"doc_id": "d1", "tokens": [3], "n_tok": 1,
                 "source": "s0"},
        "old": {"n_tok": 2, "tokens": [1, 2]}}) + "\n")
    import ray

    ds = WJ.read_maxwell([str(a), str(b)])
    t = pa.concat_tables([ray.get(r) for r in ds.to_arrow_refs()],
                         promote_options="default")
    rows = sorted(t.to_pylist(), key=lambda r: r["gtid"])
    assert [r["op"] for r in rows] == [OP_INSERT, OP_UPDATE]
    assert rows[1]["after"]["tokens"] == [3]
    assert rows[1]["before"]["tokens"] == [1, 2]
