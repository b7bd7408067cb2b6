"""CDC egress: changefeed → Debezium-JSON dump → downstream re-ingest.
The relay loop must be lossless: dump ∘ apply onto snapshot A ==
snapshot B, byte-for-byte per key."""

import pyarrow as pa
import pyarrow.compute as pc

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


def _payload_state(lake: LakeTable, epoch: int) -> pa.Table:
    t = lake.read(as_of=epoch).take_all()
    payload = lake.payload_schema()
    return pa.Table.from_pylist(
        [{c: r.get(c) for c in payload.names} for r in t],
        schema=pa.schema(list(payload))).sort_by("doc_id")


def test_roundtrip_into_bootstrapped_lake(tmp_path, ray_session):
    """dump(changes A→B) applied onto a lake bootstrapped from
    snapshot A reproduces snapshot B exactly — inserts, updates,
    deletes, and the evolved nullable column included."""
    lake, e0, e1 = _two_epoch_lake(tmp_path)
    d = egress.export_changefeed(lake, e0, e1, str(tmp_path / "dump"))
    assert d["events"] > 0

    payload = lake.payload_schema()
    snap_a = _payload_state(lake, e0)
    down = LakeTable(str(tmp_path / "down"), CDCConfig(num_partitions=4))
    down.bootstrap(snap_a, gtid_watermark=0)
    ds = read_debezium(d["data_files"], tx_topic=None, payload=payload)
    res = down.apply(ds.materialize())
    assert res["closed_watermark"] is not None  # singleton txs all close

    got = _payload_state(down, res["epoch"])
    want = _payload_state(lake, e1)
    assert got.num_rows == want.num_rows
    for c in payload.names:
        assert got.column(c).to_pylist() == want.column(c).to_pylist(), c


def test_diff_shape_and_idempotent_rewrite(tmp_path, ray_session):
    """The dump carries exactly one envelope per changed key, delete
    positions sort after every insert/update position, and a re-export
    writes byte-identical files under the same names (task-retry /
    resume safety)."""
    import json
    import os

    lake, e0, e1 = _two_epoch_lake(tmp_path)
    out = str(tmp_path / "dump")
    d1 = egress.export_changefeed(lake, e0, e1, out)
    sizes1 = {p: os.path.getsize(p) for p in d1["data_files"]}
    d2 = egress.export_changefeed(lake, e0, e1, out)
    assert d1["data_files"] == d2["data_files"]
    assert sizes1 == {p: os.path.getsize(p) for p in d2["data_files"]}

    keys, ud_pos, del_pos = set(), [], []
    for p in d1["data_files"]:
        for line in open(p):
            env = json.loads(line)["payload"]
            img = env["after"] or env["before"]
            assert img["doc_id"] not in keys  # one envelope per key
            keys.add(img["doc_id"])
            (del_pos if env["op"] == "d" else ud_pos).append(
                env["source"]["pos"])
            if env["op"] == "u":
                assert env["before"] is not None
    assert len(keys) == d1["events"]
    if del_pos and ud_pos:
        assert min(del_pos) > max(ud_pos)
    assert del_pos and ud_pos  # the fixture exercises all three ops


def test_empty_diff(tmp_path, ray_session):
    lake, e0, e1 = _two_epoch_lake(tmp_path)
    d = egress.export_changefeed(lake, e1, e1, str(tmp_path / "dump"))
    assert d["events"] == 0 and d["data_files"] == []
