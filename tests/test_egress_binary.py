"""Binary egress dialects: the lake relayed AS a MySQL binlog /
PostgreSQL pgoutput stream (``rookray.egress.write_binlog`` /
``write_pgwal`` through ``export_changefeed``).

The full circle of rook's own wire format: MySQLReplicationStream
consumes exactly the bytes the binlog dialect emits.  Contracts under
test: dump ∘ apply onto snapshot A == snapshot B through the REAL
ingest decoders; dumps compose across epochs in ONE ingest pass
(transaction identity unique, watermark closes); binlog's positional
coordinate space is guarded forward-only; pgoutput preserves the
lake's coordinates on the wire, so even a re-published old span is
idempotent."""

import glob
import json
import os

import pyarrow as pa
import pytest

from rookray import egress
from rookray.binlog import read_binlog
from rookray.gen import GenConfig, write_shards
from rookray.pgoutput import read_pgwal
from rookray.pipeline import CDCConfig, LakeTable
from rookray.wirejson import read_canal, read_maxwell

READERS = {"binlog": read_binlog, "pgoutput": read_pgwal,
           "maxwell": read_maxwell, "canal": read_canal}
GLOBS = {"binlog": "rookray-bin.*", "pgoutput": "pgwal-*.bin",
         "maxwell": "maxwell-*.jsonl", "canal": "canal-*.jsonl"}

CFG = GenConfig(n_docs=60, n_events=400, seed=7)


def _source(tmp_path, cfg=CFG):
    meta = write_shards(cfg, str(tmp_path / "shards"), n_shards=4)
    lake = LakeTable(str(tmp_path / "src"), CDCConfig(num_partitions=8))
    files = meta["files"]
    eps = [lake.apply(grp)["epoch"]
           for grp in (files[:2], files[:3], files[:4])]
    return lake, eps


def _snap(lake, epoch):
    payload = lake.payload_schema()
    rows = lake.read(as_of=epoch).take_all()
    return pa.Table.from_pylist(
        [{c: r.get(c) for c in payload.names} for r in rows],
        schema=pa.schema(list(payload)))


def _glob(relay, fmt):
    return sorted(glob.glob(os.path.join(relay, GLOBS[fmt])))


def _ingest(lake, eps, relay, fmt, down_root):
    payload = lake.payload_schema()
    down = LakeTable(down_root, CDCConfig(num_partitions=4))
    down.bootstrap(_snap(lake, eps[0]), gtid_watermark=0)
    ds = READERS[fmt](_glob(relay, fmt), payload=payload)
    res = down.apply(ds.materialize())
    return down, res


def _state(lake):
    return lake.state_table().sort_by("doc_id")


@pytest.mark.parametrize("fmt", ["binlog", "pgoutput", "maxwell", "canal"])
def test_relay_roundtrip_single_pass(tmp_path, ray_session, fmt):
    """Two composing dumps ingested in ONE pass through the real
    binary decoder reproduce the source head onto a snapshot-A
    bootstrap — and the watermark closes (every transaction identity
    unique across the whole directory)."""
    lake, eps = _source(tmp_path)
    relay = str(tmp_path / "relay")
    d1 = egress.export_changefeed(lake, eps[0], eps[1], relay, fmt=fmt)
    d2 = egress.export_changefeed(lake, eps[1], eps[2], relay, fmt=fmt)
    assert d1["events"] > 0 and d2["events"] > 0
    # file numbering continues across dumps (never collides)
    names = [os.path.basename(p) for p in _glob(relay, fmt)]
    assert len(names) == len(set(names)) \
        == len(d1["data_files"]) + len(d2["data_files"])

    down, res = _ingest(lake, eps, relay, fmt, str(tmp_path / "down"))
    assert res["closed_watermark"] is not None
    assert _state(down).equals(_state(lake))


@pytest.mark.parametrize("fmt", ["pgoutput", "maxwell"])
def test_coordinate_preserving_dialects(tmp_path, ray_session, fmt):
    """pgoutput frames each row's LSN — and maxwell each record's
    position (gtid bits above 2^40 split into the position's file
    name) — with the lake's own coordinate: decoded upsert gtids are
    exactly the winning _gtid of the corresponding state rows, deletes
    ride the span watermark."""
    lake, eps = _source(tmp_path)
    relay = str(tmp_path / "relay")
    egress.export_changefeed(lake, eps[1], eps[2], relay, fmt=fmt)
    payload = lake.payload_schema()
    events = READERS[fmt](_glob(relay, fmt),
                          payload=payload).take_all()
    state = {r["doc_id"]: r["_gtid"]
             for r in lake.read(include_meta=True).take_all()}
    from rookray.schema import OP_DELETE
    wm = lake._snapshot_manifest(eps[2])["closed_watermark"]
    for e in events:
        if e["op"] == OP_DELETE:
            assert e["gtid"] == wm
        else:
            assert e["gtid"] == state[e["key"]]


@pytest.mark.parametrize("fmt", ["binlog", "canal"])
def test_positional_dialects_refuse_backward_republish(
        tmp_path, ray_session, fmt):
    """Binlog and canal coordinates are positional, so re-publishing
    an older span into a directory holding a newer dump would invert
    LWW — export refuses via the span floor recorded in the out dir
    AFTER each successful dump."""
    lake, eps = _source(tmp_path)
    relay = str(tmp_path / "relay")
    egress.export_changefeed(lake, eps[0], eps[1], relay, fmt=fmt)
    egress.export_changefeed(lake, eps[1], eps[2], relay, fmt=fmt)
    with pytest.raises(ValueError, match="forward"):
        egress.export_changefeed(lake, eps[0], eps[1], relay, fmt=fmt)
    state = f"_{fmt.upper()}_EGRESS_STATE.json"
    with open(os.path.join(relay, state)) as f:
        floor = json.load(f)["span_hi"]
    assert floor == lake._snapshot_manifest(eps[2])["closed_watermark"]


@pytest.mark.parametrize("fmt", ["pgoutput", "maxwell"])
def test_republished_span_is_idempotent(tmp_path, ray_session, fmt):
    """Coordinate preservation makes a re-publish harmless: the old
    span's rows re-arrive at their ORIGINAL coordinates, sort below
    the newer dump's, and LWW-resolve identically even when the whole
    directory is gulped in one pass (xids are per-file, so the
    re-publish never collides with the first)."""
    lake, eps = _source(tmp_path)
    relay = str(tmp_path / "relay")
    egress.export_changefeed(lake, eps[0], eps[1], relay, fmt=fmt)
    egress.export_changefeed(lake, eps[1], eps[2], relay, fmt=fmt)
    egress.export_changefeed(lake, eps[0], eps[1], relay, fmt=fmt)

    down, res = _ingest(lake, eps, relay, fmt,
                        str(tmp_path / "down"))
    assert res["closed_watermark"] is not None
    assert _state(down).equals(_state(lake))


def test_binlog_relay_across_schema_evolution(tmp_path, ray_session):
    """A dump exported BEFORE an additive evolution carries the narrow
    payload in its TABLE_MAPs; the post-evolution dump carries the
    wide one.  One ingest pass under the wide payload decodes both
    (the additive positional mapping) and reaches the evolved head."""
    cfg = GenConfig(n_docs=50, n_events=400, evolve_at=300, seed=11)
    meta = write_shards(cfg, str(tmp_path / "shards"), n_shards=4)
    lake = LakeTable(str(tmp_path / "src"), CDCConfig(num_partitions=8))
    files = meta["files"]
    relay = str(tmp_path / "relay")
    e0 = lake.apply(files[:2])["epoch"]
    e1 = lake.apply(files[:3])["epoch"]
    # exported while the lake is still NARROW
    egress.export_changefeed(lake, e0, e1, relay, fmt="binlog")
    e2 = lake.apply(files[:4])["epoch"]     # crosses evolve_at
    egress.export_changefeed(lake, e1, e2, relay, fmt="binlog")

    down, res = _ingest(lake, [e0, e1, e2], relay, "binlog",
                        str(tmp_path / "down"))
    got, want = _state(down), _state(lake)
    assert got.schema.names == want.schema.names
    assert got.equals(want)


def test_large_block_pgoutput_xid_chunking(tmp_path, ray_session):
    """A shaped block larger than 2^12 rows splits into multiple
    per-file xids (pgoutput xids are 32-bit, reassigned at encode
    time) — the decoder sees several complete transactions and every
    row survives."""
    import numpy as np

    from rookray.egress import _changefeed_to_events, _encode_binary_part

    n = 10_000
    payload = pa.schema([("doc_id", pa.string()),
                         ("n_tok", pa.int32())])
    feed = pa.table({
        "doc_id": pa.array([f"d{i:06d}" for i in range(n)]),
        "change": pa.array(["insert"] * n),
        "gtid_a": pa.array([-1] * n, pa.int64()),
        "gtid_b": pa.array(np.arange(1, n + 1), pa.int64()),
        "n_tok_a": pa.array([-1] * n, pa.int64()),
        "n_tok_b": pa.array(np.arange(n), pa.int64()),
    })
    block = _changefeed_to_events(feed, "doc_id", ["n_tok"], payload,
                                  delete_pos=n + 1, db="rook",
                                  table="sequences", server_id=1)
    out = str(tmp_path / "relay")
    os.makedirs(out)
    d = _encode_binary_part(block, out, 7, "pgoutput")
    assert d["events"] == n
    events = read_pgwal(d["files"], payload=payload).take_all()
    assert len(events) == n
    xids = {e["tx_id"] for e in events}
    assert len(xids) == -(-n // (1 << 12))      # ceil(n / 4096)
    assert all(x >> 12 == 7 for x in xids)      # file-scoped space
    assert sorted(e["gtid"] for e in events) == list(range(1, n + 1))


def test_cli_binary_egress_then_decode(tmp_path, ray_session, capsys):
    """Operational loop per dialect: `rookray egress --format
    binlog|pgoutput` then the matching decode subcommand applies the
    relay into a downstream lake."""
    from rookray.cli import main

    lake, eps = _source(tmp_path)
    for fmt, sub in (("binlog", "binlog"), ("pgoutput", "pgwal")):
        relay = str(tmp_path / f"relay_{fmt}")
        assert main(["egress", "--table", lake.root, "--out", relay,
                     "--format", fmt, "--from-epoch", str(eps[0]),
                     "--to-epoch", str(eps[2])]) == 0
        out = json.loads(capsys.readouterr().out)
        assert out["events"] > 0

        down_root = str(tmp_path / f"down_{fmt}")
        down = LakeTable(down_root, CDCConfig(num_partitions=4))
        down.bootstrap(_snap(lake, eps[0]), gtid_watermark=0)
        assert main([sub, "--dump", relay, "--table", down_root]) == 0
        wired = json.loads(capsys.readouterr().out)
        assert wired["events_applied"] == out["events"]
        assert _state(LakeTable(down_root)).equals(_state(lake))


def test_cli_json_egress_then_wire(tmp_path, ray_session, capsys):
    """The JSON dialects close the same operational loop through the
    generic decode subcommand: `rookray egress --format maxwell|canal`
    then `rookray wire --format maxwell|canal`."""
    from rookray.cli import main

    lake, eps = _source(tmp_path)
    for fmt in ("maxwell", "canal"):
        relay = str(tmp_path / f"relay_{fmt}")
        assert main(["egress", "--table", lake.root, "--out", relay,
                     "--format", fmt, "--from-epoch", str(eps[0]),
                     "--to-epoch", str(eps[2])]) == 0
        out = json.loads(capsys.readouterr().out)
        assert out["events"] > 0

        down_root = str(tmp_path / f"down_{fmt}")
        down = LakeTable(down_root, CDCConfig(num_partitions=4))
        down.bootstrap(_snap(lake, eps[0]), gtid_watermark=0)
        assert main(["wire", "--dump", relay, "--table", down_root,
                     "--format", fmt]) == 0
        wired = json.loads(capsys.readouterr().out)
        assert wired["events_applied"] == out["events"]
        assert _state(LakeTable(down_root)).equals(_state(lake))


@pytest.mark.parametrize("fmt", ["binlog", "canal"])
def test_positional_zero_progress_span_is_noop(tmp_path, ray_session,
                                               fmt):
    """Regression (found by the relay fuzz): an epoch that applied
    nothing shares its predecessor's watermark, so the span's diff is
    provably empty — publishing it must be an up-to-date no-op, not a
    forward-only refusal (a cron relay loop with explicit epochs hits
    this on every idle tick)."""
    meta = write_shards(CFG, str(tmp_path / "shards"), n_shards=4)
    lake = LakeTable(str(tmp_path / "src"), CDCConfig(num_partitions=8))
    files = meta["files"]
    e0 = lake.apply(files[:2])["epoch"]
    e1 = lake.apply(files[:3])["epoch"]
    e2 = lake.apply(files)["epoch"]
    e3 = lake.apply(files)["epoch"]       # zero applied, same watermark

    relay = str(tmp_path / "relay")
    d1 = egress.export_changefeed(lake, e0, e1, relay, fmt=fmt)
    assert d1["events"] > 0
    egress.export_changefeed(lake, e1, e2, relay, fmt=fmt)
    d3 = egress.export_changefeed(lake, e2, e3, relay, fmt=fmt)
    assert d3.get("up_to_date") and d3["events"] == 0
    # an actually-older span (ending BELOW the floor) still refuses
    with pytest.raises(ValueError, match="forward"):
        egress.export_changefeed(lake, e0, e1, relay, fmt=fmt)
