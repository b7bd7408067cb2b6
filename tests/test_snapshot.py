"""Wire-format initial-snapshot export (egress.export_snapshot) — the
bootstrap half of wire-based replication: a COMPLETELY fresh downstream
(no clone, no bootstrap()) must reach the source state from the dump
alone, and incremental changefeed dumps published afterwards must
compose with it in a single wholesale ingest pass."""

import glob
import json
import os

import pyarrow as pa
import pytest

from rookray import egress
from rookray.gen import GenConfig, write_shards
from rookray.pipeline import CDCConfig, LakeTable
from rookray.wire import read_debezium

CFG = GenConfig(n_docs=40, n_events=400, evolve_at=201, noise_pct=5)


def _two_epoch_lake(tmp_path):
    meta = write_shards(CFG, str(tmp_path / "shards"), n_shards=8)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(
        num_partitions=4,
        ignored_tables=frozenset({"ignored_entity"}),
        ignored_server_ids=frozenset({999})))
    e0 = lake.apply(meta["files"][:5])["epoch"]
    e1 = lake.apply(meta["files"][4:])["epoch"]
    return lake, e0, e1


def _payload_state(lake: LakeTable, epoch: int | None = None) -> pa.Table:
    t = lake.read(as_of=epoch).take_all()
    payload = lake.payload_schema()
    return pa.Table.from_pylist(
        [{c: r.get(c) for c in payload.names} for r in t],
        schema=pa.schema(list(payload))).sort_by("doc_id")


def _assert_state_equal(got: pa.Table, want: pa.Table, names):
    assert got.num_rows == want.num_rows
    for c in names:
        assert got.column(c).to_pylist() == want.column(c).to_pylist(), c


def test_snapshot_bootstraps_fresh_downstream(tmp_path, ray_session):
    """A head snapshot ingested by a fresh empty lake reproduces the
    source state exactly — op=r envelopes, original coordinates, the
    evolved nullable column included."""
    lake, e0, e1 = _two_epoch_lake(tmp_path)
    d = egress.export_snapshot(lake, str(tmp_path / "snap"))
    assert d["events"] == _payload_state(lake).num_rows
    assert d["snapshot_epoch"] == e1

    payload = lake.payload_schema()
    down = LakeTable(str(tmp_path / "down"), CDCConfig(num_partitions=4))
    res = down.apply(read_debezium(d["data_files"], tx_topic=None,
                                   payload=payload).materialize())
    assert res["events_applied"] == d["events"]
    _assert_state_equal(_payload_state(down), _payload_state(lake),
                        payload.names)


def test_snapshot_plus_incremental_single_pass(tmp_path, ray_session):
    """Snapshot at epoch A + changefeed A→B published into ONE
    directory, ingested wholesale in one read pass by a fresh
    downstream == snapshot B.  Exercises cross-dump coordinate and
    transaction-identity disjointness (snapshot tx = gtid_b, later
    deletes -(gtid_a+2))."""
    lake, e0, e1 = _two_epoch_lake(tmp_path)
    out = str(tmp_path / "relay")
    egress.export_snapshot(lake, out, epoch=e0)
    egress.export_changefeed(lake, e0, e1, out)
    payload = lake.payload_schema()
    files = sorted(glob.glob(os.path.join(out, "data-*.jsonl")))
    down = LakeTable(str(tmp_path / "down"), CDCConfig(num_partitions=4))
    down.apply(read_debezium(files, tx_topic=None,
                             payload=payload).materialize())
    _assert_state_equal(_payload_state(down), _payload_state(lake, e1),
                        payload.names)


def test_snapshot_time_travel_epoch(tmp_path, ray_session):
    """export_snapshot(epoch=A) captures the HISTORICAL snapshot, not
    the head."""
    lake, e0, e1 = _two_epoch_lake(tmp_path)
    d = egress.export_snapshot(lake, str(tmp_path / "snap"), epoch=e0)
    assert d["snapshot_epoch"] == e0
    payload = lake.payload_schema()
    down = LakeTable(str(tmp_path / "down"), CDCConfig(num_partitions=4))
    down.apply(read_debezium(d["data_files"], tx_topic=None,
                             payload=payload).materialize())
    _assert_state_equal(_payload_state(down), _payload_state(lake, e0),
                        payload.names)


def test_snapshot_predating_evolution(tmp_path, ray_session):
    """A historical snapshot taken BEFORE additive evolution emits
    genuinely-null values for the late column (the head payload schema
    drives the envelope shape), and the incremental dump restates the
    post-evolution values — the composed ingest equals head state."""
    meta = write_shards(CFG, str(tmp_path / "shards"), n_shards=8)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(
        num_partitions=4,
        ignored_tables=frozenset({"ignored_entity"}),
        ignored_server_ids=frozenset({999})))
    # CFG evolves at event 201; the first four shards cover 1-200
    e0 = lake.apply(meta["files"][:4])["epoch"]
    e1 = lake.apply(meta["files"][3:])["epoch"]
    payload = lake.payload_schema()
    assert not all(c in lake.read(as_of=e0).schema().names
                   for c in payload.names)  # e0 predates the column

    out = str(tmp_path / "relay")
    egress.export_snapshot(lake, out, epoch=e0)
    egress.export_changefeed(lake, e0, e1, out)
    files = sorted(glob.glob(os.path.join(out, "data-*.jsonl")))
    down = LakeTable(str(tmp_path / "down"), CDCConfig(num_partitions=4))
    down.apply(read_debezium(files, tx_topic=None,
                             payload=payload).materialize())
    _assert_state_equal(_payload_state(down), _payload_state(lake, e1),
                        payload.names)


def test_snapshot_mongo_composes_with_incremental(tmp_path, ray_session):
    """The shifted-token dialects: a change-stream snapshot (wm_a=0)
    plus the incremental dump compose in one read_mongo pass."""
    from rookray.wiremongo import read_mongo

    lake, e0, e1 = _two_epoch_lake(tmp_path)
    out = str(tmp_path / "relay")
    egress.export_snapshot(lake, out, fmt="mongo", epoch=e0)
    egress.export_changefeed(lake, e0, e1, out, fmt="mongo")
    payload = lake.payload_schema()
    files = sorted(glob.glob(os.path.join(out, "mongo-*.jsonl")))
    down = LakeTable(str(tmp_path / "down"), CDCConfig(num_partitions=4))
    down.apply(read_mongo(files, payload=payload).materialize())
    _assert_state_equal(_payload_state(down), _payload_state(lake, e1),
                        payload.names)


def test_snapshot_binlog_forward_only(tmp_path, ray_session):
    """Positional dialects stay forward-only: a head snapshot records
    the span floor, so re-snapshotting an OLDER epoch into the same
    directory is refused (it would sort above the newer state)."""
    from rookray.binlog import read_binlog

    lake, e0, e1 = _two_epoch_lake(tmp_path)
    out = str(tmp_path / "relay")
    d = egress.export_snapshot(lake, out, fmt="binlog")
    payload = lake.payload_schema()
    down = LakeTable(str(tmp_path / "down"), CDCConfig(num_partitions=4))
    down.apply(read_binlog(d["data_files"],
                           payload=payload).materialize())
    _assert_state_equal(_payload_state(down), _payload_state(lake),
                        payload.names)
    with pytest.raises(ValueError, match="forward"):
        egress.export_snapshot(lake, out, fmt="binlog", epoch=e0)


def test_snapshot_into_compacted_relay_refused(tmp_path, ray_session):
    """A snapshot published into an already-compacted relay whose floor
    is at or above the snapshot watermark would write files INVISIBLE
    to relay_files (below-floor exclusion) — refused loudly; the
    compacted generation already restates that state."""
    from rookray.egress import compact_relay

    lake, e0, e1 = _two_epoch_lake(tmp_path)
    out = str(tmp_path / "relay")
    egress.export_changefeed(lake, e0, e1, out)
    compact_relay(out)
    with pytest.raises(ValueError, match="floor"):
        egress.export_snapshot(lake, out, epoch=e0)


def test_cli_snapshot_seeds_egress_cursor(tmp_path, ray_session,
                                          capsys):
    """`rookray snapshot` seeds the out dir's egress cursor at the
    snapshot epoch, so a following `rookray egress` run relays
    incrementally from exactly that point — and the combined directory
    bootstraps a fresh downstream to the head state."""
    from rookray.cli import main

    lake, e0, e1 = _two_epoch_lake(tmp_path)
    out = str(tmp_path / "relay")
    rc = main(["snapshot", "--table", str(tmp_path / "lake"),
               "--out", out, "--epoch", str(e0)])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["cursor_seeded"] and res["snapshot_epoch"] == e0
    with open(os.path.join(out, "_EGRESS_STATE.json")) as f:
        assert json.load(f)["last_epoch"] == e0

    rc = main(["egress", "--table", str(tmp_path / "lake"),
               "--out", out])
    assert rc == 0
    inc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert inc["from_epoch"] == e0 and inc["to_epoch"] == e1

    payload = lake.payload_schema()
    files = sorted(glob.glob(os.path.join(out, "data-*.jsonl")))
    down = LakeTable(str(tmp_path / "down"), CDCConfig(num_partitions=4))
    down.apply(read_debezium(files, tx_topic=None,
                             payload=payload).materialize())
    _assert_state_equal(_payload_state(down), _payload_state(lake, e1),
                        payload.names)
