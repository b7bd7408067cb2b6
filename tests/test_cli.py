"""CLI smoke: the operational surface (`ray job submit` entry) for
the wave-5 additions — metrics (manifest-only, no Ray) and the
vector-index subcommands."""

import json

from rookray.cli import main
from rookray.gen import GenConfig, write_shards
from rookray.pipeline import CDCConfig, LakeTable


def _lake(tmp_path):
    cfg = GenConfig(n_docs=40, n_events=800, vocab=40)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=3)
    lake = LakeTable(str(tmp_path / "lake"),
                     CDCConfig(num_partitions=2, write_mode="delta"))
    lake.apply(meta["files"])
    return lake


def test_cli_metrics(tmp_path, capsys):
    lake = _lake(tmp_path)
    assert main(["metrics", "--table", lake.root]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["committed"] and out["epoch"] == 0
    # delta mode: fragment rows include tombstones until compaction
    assert out["rows"] >= len(lake.state_table())
    assert out["delta_backlog_files"] >= out["num_partitions"] == 2
    assert out["watermark_max"] >= out["watermark_min"] >= 0
    assert out["state_bytes"] > 0
    assert set(out["partitions"]) == {"0", "1"} or \
        set(out["partitions"]) == {0, 1}
    # metrics equals the library call
    assert out == json.loads(json.dumps(lake.metrics()))
    # after compaction the fragment rows ARE the live rows and the
    # delta backlog drains
    lake.compact()
    m2 = lake.metrics()
    assert m2["rows"] == len(lake.state_table())
    assert m2["delta_backlog_files"] == 0


def test_cli_vec_refresh_search_vacuum(tmp_path, capsys):
    lake = _lake(tmp_path)
    t = lake.root
    assert main(["vec", "refresh", "--table", t, "--partitions", "4"]) == 0
    r = json.loads(capsys.readouterr().out)
    assert r["refreshed"] and r["rows"] == len(lake.state_table())

    assert main(["vec", "search", "--table", t, "--partitions", "4",
                 "--tokens", "3,7,11", "--probe", "all", "--k", "5"]) == 0
    ranked = json.loads(capsys.readouterr().out)["ranked"]
    assert 0 < len(ranked) <= 5
    assert [r["rank"] for r in ranked] == list(range(1, len(ranked) + 1))

    assert main(["vec", "vacuum", "--table", t, "--partitions", "4"]) == 0
    assert json.loads(capsys.readouterr().out)["files_removed"] >= 0


def test_cli_ingest_expect_and_metrics_quarantine(tmp_path, capsys):
    """`ingest --expect module:fn` gates rows at the CLI surface and
    the quarantine shows up in `metrics`."""
    cfg = GenConfig(n_docs=40, n_events=800)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=2)
    t = str(tmp_path / "lake")
    assert main(["ingest", "--shards", str(tmp_path / "s"),
                 "--table", t, "--partitions", "2",
                 "--expect", "rookray.queries:_expect_short_docs"]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["epoch"] == 0

    lake = LakeTable(t)
    q = lake.quarantine_table()
    assert len(q) > 0
    n = q.column("n_tok").to_pylist()
    assert all(v > 96 for v in n)
    # no quarantined doc version reached the final state with n_tok>96
    state = lake.state_table().to_pandas()
    assert (state["n_tok"] <= 96).all()

    assert main(["metrics", "--table", t]) == 0
    m = json.loads(capsys.readouterr().out)
    assert m["quarantined_rows"] == len(q)


def test_cli_quarantine_dump_and_clear(tmp_path, capsys):
    cfg = GenConfig(n_docs=30, n_events=600)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=2)
    t = str(tmp_path / "lake")
    assert main(["ingest", "--shards", str(tmp_path / "s"),
                 "--table", t, "--partitions", "2",
                 "--expect", "rookray.queries:_expect_short_docs"]) == 0
    capsys.readouterr()
    assert main(["quarantine", "--table", t]) == 0
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    assert lines and all(r["n_tok"] > 96 for r in lines)
    assert main(["quarantine", "--table", t, "--clear"]) == 0
    assert json.loads(capsys.readouterr().out)["files_removed"] > 0
    assert len(LakeTable(t).quarantine_table()) == 0


def test_cli_tail_socket_ingest(tmp_path, capsys):
    """`tail-socket` drains a live framed-IPC TCP stream into one
    exactly-once epoch (the network-connector CLI surface)."""
    import pyarrow.parquet as pq

    from rookray.gen import GenConfig as GC, generate_events, final_state
    from rookray.source import ChangeStreamServer

    cfg = GC(n_docs=25, n_events=400)
    ev = generate_events(cfg)
    srv = ChangeStreamServer()
    try:
        # pre-queue frames + EOF: the CLI connects and drains
        for i in range(0, len(ev), 100):
            srv.push(ev.slice(i, 100))
        srv.close()
        t = str(tmp_path / "lake")
        assert main(["tail-socket", "--host", srv.host,
                     "--port", str(srv.port), "--table", t,
                     "--partitions", "2"]) == 0
        res = json.loads(capsys.readouterr().out)
        assert res["epoch"] == 0
        state = LakeTable(t).state_table().to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        exp = final_state(cfg).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert state["doc_id"].tolist() == exp["doc_id"].tolist()
        assert all(list(a) == list(b)
                   for a, b in zip(state["tokens"], exp["tokens"]))
    finally:
        srv.close()  # idempotent; the serve thread exits at EOF


def test_cli_wire_ingest(tmp_path, capsys):
    """Public wire-format ingest end-to-end through the CLI: encode a
    generated stream as a Debezium dump, decode+apply it with
    `rookray wire` (payload schema INFERRED from the dump — no catalog
    supplied), and check the lake's final state against the serial
    oracle."""
    from rookray.gen import GenConfig, final_state, generate_events
    from rookray.wire import debezium_dump

    cfg = GenConfig(n_docs=30, n_events=200)
    ev = generate_events(cfg)
    dump = str(tmp_path / "dump")
    debezium_dump(ev, dump, n_files=3)
    t = str(tmp_path / "lake")
    assert main(["wire", "--dump", dump, "--table", t,
                 "--partitions", "2"]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["tx_topic"] is True and res["files"] == 3

    lake = LakeTable(t)
    state = lake.state_table().sort_by("doc_id")
    exp = final_state(cfg).sort_by("doc_id")
    assert state.column("doc_id").to_pylist() == exp.column("doc_id").to_pylist()
    # inferred payload: JSON widens tokens to int64 — compare values
    assert [list(map(int, x)) for x in state.column("tokens").to_pylist()] \
        == [list(map(int, x)) for x in exp.column("tokens").to_pylist()]


def test_cli_binlog_ingest(tmp_path, capsys):
    """Binary wire-format ingest end-to-end through the CLI: encode a
    generated stream as binlog-v4 files, decode+apply with
    `rookray binlog` (payload = engine default on a fresh lake), and
    check the lake's final state against the serial oracle."""
    from rookray.binlog import binlog_dump
    from rookray.gen import GenConfig, final_state, generate_events

    cfg = GenConfig(n_docs=25, n_events=180)
    ev = generate_events(cfg)
    dump = str(tmp_path / "blg")
    binlog_dump(ev, dump, n_files=3)
    t = str(tmp_path / "lake")
    assert main(["binlog", "--dump", dump, "--table", t,
                 "--partitions", "2"]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["files"] == 3 and res["events_applied"] > 0

    lake = LakeTable(t)
    state = lake.state_table().sort_by("doc_id")
    exp = final_state(cfg).sort_by("doc_id")
    assert state.column("doc_id").to_pylist() == exp.column("doc_id").to_pylist()
    assert [list(map(int, x)) for x in state.column("tokens").to_pylist()] \
        == [list(map(int, x)) for x in exp.column("tokens").to_pylist()]
