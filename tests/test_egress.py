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
        assert min(del_pos) >= max(ud_pos)  # deletes at the watermark
    assert del_pos and ud_pos  # the fixture exercises all three ops


def test_empty_diff(tmp_path, ray_session):
    lake, e0, e1 = _two_epoch_lake(tmp_path)
    d = egress.export_changefeed(lake, e1, e1, str(tmp_path / "dump"))
    assert d["events"] == 0 and d["data_files"] == []


def test_packed_source_coordinates_stay_monotone(tmp_path, ray_session):
    """Source lakes fed by binlog/pgwal carry gtids with file bits
    packed above 2^40.  decode re-packs gtid = file_seq<<40 | pos, so
    egress splits each coordinate into (file name bits, pos) — the
    decoded gtid must equal the emitted coordinate EXACTLY, preserving
    cross-dump LWW order for every source gtid space (regression: raw
    pos emission was non-monotonic past 2^40)."""
    import ray.data

    g1, g2, g3 = (2 << 40) | 5000, (3 << 40) | 100, (3 << 40) | 7
    feed = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["k1", "k2", "k3"]),
        "change": pa.array(["update", "insert", "delete"]),
        "gtid_a": pa.array([g1 - 5, -1, g3], pa.int64()),
        "gtid_b": pa.array([g1, g2, -1], pa.int64()),
        "n_tok_a": pa.array([1, -1, 9], pa.int64()),
        "n_tok_b": pa.array([2, 3, -1], pa.int64()),
    }))
    wm = (3 << 40) | 101  # >= max gtid_b
    d = egress.write_debezium(feed, str(tmp_path / "dump"), "doc_id",
                              ["n_tok"], delete_pos=wm)
    t = read_debezium(
        d["data_files"], tx_topic=None,
        payload=pa.schema([("doc_id", pa.string()),
                           ("n_tok", pa.int64())])).take_all()
    got = {r["key"]: r["gtid"] for r in t}
    assert got["k1"] == g1          # exact, despite pos bits > 2^40
    assert got["k2"] == g2
    assert got["k3"] == wm          # delete at the watermark, exact
    assert got["k2"] > got["k1"]    # order preserved across 2^40
    # tx identity rides separately and stays unique ACROSS dumps:
    # -(gtid_a+2) for the delete (disjoint negative space — the
    # deleted version's gtid_a was some earlier dump's gtid_b),
    # gtid_b otherwise
    txs = {r["key"]: r["tx_id"] for r in t}
    assert txs == {"k1": g1, "k2": g2, "k3": -(g3 + 2)}
    # images carry the key FIRST (downstream payload inference takes
    # the first-seen field as the merge key)
    import json
    line = json.loads(open(d["data_files"][0]).readline())
    img = line["payload"]["after"] or line["payload"]["before"]
    assert next(iter(img)) == "doc_id"


def test_incremental_egress_chain(tmp_path, ray_session):
    """The relay run CONTINUOUSLY: dump(A→B) then dump(B→C) applied in
    sequence onto a downstream lake bootstrapped from A must equal
    snapshot C — cross-dump coordinates must stay monotone per key and
    every dump's transactions must close on their own."""
    meta = write_shards(CFG, str(tmp_path / "shards"), n_shards=9)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(
        num_partitions=4,
        ignored_tables=frozenset({"ignored_entity"}),
        ignored_server_ids=frozenset({999})))
    e0 = lake.apply(meta["files"][:4])["epoch"]
    e1 = lake.apply(meta["files"][3:7])["epoch"]
    e2 = lake.apply(meta["files"][6:])["epoch"]

    d01 = egress.export_changefeed(lake, e0, e1, str(tmp_path / "d01"))
    d12 = egress.export_changefeed(lake, e1, e2, str(tmp_path / "d12"))

    payload = lake.payload_schema()
    down = LakeTable(str(tmp_path / "down"), CDCConfig(num_partitions=4))
    down.bootstrap(_payload_state(lake, e0), gtid_watermark=0)
    for d in (d01, d12):
        if d["events"]:
            ds = read_debezium(d["data_files"], tx_topic=None,
                               payload=payload)
            res = down.apply(ds.materialize())
            assert res["closed_watermark"] is not None

    got = _payload_state(down, None)
    want = _payload_state(lake, e2)
    assert got.num_rows == want.num_rows
    for c in payload.names:
        assert got.column(c).to_pylist() == want.column(c).to_pylist(), c


def test_cli_incremental_relay_cursor(tmp_path, ray_session, capsys):
    """`rookray egress` run repeatedly relays incrementally: the out
    directory's cursor advances per run, a fresh epoch publishes only
    its own diff, and an up-to-date relay is a no-op."""
    import json as _json
    from rookray.cli import main as cli_main

    meta = write_shards(CFG, str(tmp_path / "shards"), n_shards=9)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(
        num_partitions=4,
        ignored_tables=frozenset({"ignored_entity"}),
        ignored_server_ids=frozenset({999})))
    lake.apply(meta["files"][:4])
    lake.apply(meta["files"][3:7])
    out = str(tmp_path / "relay")

    assert cli_main(["egress", "--table", str(tmp_path / "lake"),
                     "--out", out]) == 0
    r1 = _json.loads(capsys.readouterr().out)
    assert (r1["from_epoch"], r1["to_epoch"]) == (0, 1)

    # nothing new → no-op, cursor unchanged
    assert cli_main(["egress", "--table", str(tmp_path / "lake"),
                     "--out", out]) == 0
    assert _json.loads(capsys.readouterr().out)["up_to_date"] is True

    # a fresh epoch publishes only its own diff
    lake2 = LakeTable(str(tmp_path / "lake"))
    lake2.apply(meta["files"][6:])
    assert cli_main(["egress", "--table", str(tmp_path / "lake"),
                     "--out", out]) == 0
    r3 = _json.loads(capsys.readouterr().out)
    assert (r3["from_epoch"], r3["to_epoch"]) == (1, 2)
    assert r3["events"] > 0


def test_cli_stale_cursor_reports_instead_of_crashing(tmp_path,
                                                      ray_session,
                                                      capsys):
    """A publish cursor ahead of the lake's head (restored/recreated
    lake, reused out dir) reports a JSON error with a re-anchor hint —
    never an uncaught traceback."""
    import json as _json
    import os
    from rookray.cli import main as cli_main

    meta = write_shards(GenConfig(n_docs=10, n_events=80),
                        str(tmp_path / "shards"), n_shards=2)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=2))
    lake.apply(meta["files"])
    out = str(tmp_path / "relay")
    os.makedirs(out)
    with open(os.path.join(out, "_EGRESS_STATE.json"), "w") as f:
        _json.dump({"last_epoch": 5}, f)
    assert cli_main(["egress", "--table", str(tmp_path / "lake"),
                     "--out", out]) == 1
    err = _json.loads(capsys.readouterr().out)
    assert "ahead of the target epoch" in err["error"]


def test_egress_roundtrip_any_stream(ray_session, tmp_path_factory):
    """Property fuzz of the relay loop: for ANY stream shape and ANY
    epoch split, dump(A→B) applied onto a lake bootstrapped from
    snapshot A equals snapshot B."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from rookray.gen import generate_events
    from rookray.wire import read_debezium

    @settings(max_examples=6, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(seed=st.integers(0, 2**31 - 1),
           n_docs=st.integers(3, 50),
           n_events=st.integers(40, 400),
           noise_pct=st.sampled_from([0, 15]),
           evolve=st.booleans(),
           cut=st.floats(0.15, 0.85))
    def run(seed, n_docs, n_events, noise_pct, evolve, cut):
        tmp = tmp_path_factory.mktemp("egr_fuzz")
        cfg = GenConfig(seed=seed, n_docs=n_docs, n_events=n_events,
                        noise_pct=noise_pct,
                        evolve_at=(n_events // 2 + 1) if evolve
                        else None)
        meta = write_shards(cfg, str(tmp / "s"), n_shards=6)
        lake = LakeTable(str(tmp / "lake"), CDCConfig(
            num_partitions=4,
            ignored_tables=frozenset({"ignored_entity"}),
            ignored_server_ids=frozenset({999})))
        k = max(1, min(5, int(6 * cut)))
        e0 = lake.apply(meta["files"][:k + 1])["epoch"]
        e1 = lake.apply(meta["files"][k:])["epoch"]

        d = egress.export_changefeed(lake, e0, e1, str(tmp / "dump"))
        payload = lake.payload_schema()
        down = LakeTable(str(tmp / "down"), CDCConfig(num_partitions=4))
        down.bootstrap(_payload_state(lake, e0), gtid_watermark=0)
        if d["events"]:
            down.apply(read_debezium(d["data_files"], tx_topic=None,
                                     payload=payload).materialize())
        got = _payload_state(down, None)
        want = _payload_state(lake, e1)
        assert got.num_rows == want.num_rows
        for c in payload.names:
            assert got.column(c).to_pylist() \
                == want.column(c).to_pylist(), c

    run()


def test_multi_dump_relay_directory_single_pass(tmp_path, ray_session):
    """A relay OUT DIR accumulates dumps that downstream gulps in ONE
    read_debezium pass (cmd_wire globs the directory wholesale).  An
    insert in dump N rides tx = gtid_b = G; a later delete of that key
    carries gtid_a = G — with a shared identity the counting pass
    builds a phantom 2-event tx (seqs [0,0]) that never closes and the
    watermark pins below G forever.  Delete identities live in a
    disjoint negative space, so every envelope stays a singleton."""
    import glob

    meta = write_shards(CFG, str(tmp_path / "shards"), n_shards=9)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(
        num_partitions=4,
        ignored_tables=frozenset({"ignored_entity"}),
        ignored_server_ids=frozenset({999})))
    e0 = lake.apply(meta["files"][:4])["epoch"]
    e1 = lake.apply(meta["files"][3:7])["epoch"]
    e2 = lake.apply(meta["files"][6:])["epoch"]

    out = str(tmp_path / "relay")
    d01 = egress.export_changefeed(lake, e0, e1, out)
    d12 = egress.export_changefeed(lake, e1, e2, out)
    assert d01["events"] and d12["events"]
    # the wedge needs a version published in dump 1 whose coordinate
    # re-surfaces as a dump-2 delete's gtid_a — verify the stream
    # shape actually exercises the collision channel
    import json as _json
    tx1 = {int(_json.loads(line)["payload"]["transaction"]["id"])
           for f in d01["data_files"] for line in open(f)
           if _json.loads(line)["payload"]["op"] != "d"}
    del2 = {-(int(_json.loads(line)["payload"]["transaction"]["id"])) - 2
            for f in d12["data_files"] for line in open(f)
            if _json.loads(line)["payload"]["op"] == "d"}
    assert tx1 & del2, "stream lacks the insert-then-delete collision"

    payload = lake.payload_schema()
    down = LakeTable(str(tmp_path / "down"), CDCConfig(num_partitions=4))
    down.bootstrap(_payload_state(lake, e0), gtid_watermark=0)
    files = sorted(glob.glob(out + "/data-*.jsonl"))
    assert set(files) == set(d01["data_files"]) | set(d12["data_files"])
    ds = read_debezium(files, tx_topic=None, payload=payload)
    res = down.apply(ds.materialize())
    # every envelope is a singleton tx → the watermark closes the
    # ENTIRE two-dump range in one pass
    assert res["closed_watermark"] is not None

    got = _payload_state(down, None)
    want = _payload_state(lake, e2)
    assert got.num_rows == want.num_rows
    for c in payload.names:
        assert got.column(c).to_pylist() == want.column(c).to_pylist(), c


def test_avro_roundtrip_into_bootstrapped_lake(tmp_path, ray_session):
    """Egress over the Confluent-Avro wire format: dump(changes A→B,
    fmt=avro) decoded with read_avro and applied onto a lake
    bootstrapped from snapshot A reproduces snapshot B exactly — the
    same relay loop as the JSON dialect, through the binary framing,
    with the registry snapshot as the catalog."""
    from rookray.wireavro import infer_payload_avro, read_avro

    lake, e0, e1 = _two_epoch_lake(tmp_path)
    d = egress.export_changefeed(lake, e0, e1, str(tmp_path / "dump"),
                                 fmt="avro")
    assert d["events"] > 0
    assert d["data_files"] and all(p.endswith(".avrowire")
                                   for p in d["data_files"])

    payload = lake.payload_schema()
    # the registry snapshot carries the full committed payload schema
    assert infer_payload_avro(d["registry"]).equals(payload)
    snap_a = _payload_state(lake, e0)
    down = LakeTable(str(tmp_path / "down"), CDCConfig(num_partitions=4))
    down.bootstrap(snap_a, gtid_watermark=0)
    ds = read_avro(d["data_files"], d["registry"], tx_topic=None,
                   payload=payload)
    res = down.apply(ds.materialize())
    assert res["closed_watermark"] is not None

    got = _payload_state(down, res["epoch"])
    want = _payload_state(lake, e1)
    assert got.num_rows == want.num_rows
    for c in payload.names:
        assert got.column(c).to_pylist() == want.column(c).to_pylist(), c
    # idempotent re-export: same names, same bytes
    import os
    sizes1 = {p: os.path.getsize(p) for p in d["data_files"]}
    d2 = egress.export_changefeed(lake, e0, e1, str(tmp_path / "dump"),
                                  fmt="avro")
    assert d2["data_files"] == d["data_files"]
    assert sizes1 == {p: os.path.getsize(p) for p in d2["data_files"]}


def test_avro_relay_registers_new_schema_id_after_evolution(tmp_path,
                                                            ray_session):
    """An Avro relay directory accumulates dumps across exports while
    the lake schema widens between them: the second export must
    REGISTER a new schema id (framing wider records under the stale id
    would decode into garbage), and one read_avro pass over the whole
    directory must replay both generations onto snapshot A to
    reproduce the final state."""
    import glob
    import json

    from rookray.wireavro import read_avro

    cfg = GenConfig(n_docs=40, n_events=400, evolve_at=301, noise_pct=5)
    meta = write_shards(cfg, str(tmp_path / "shards"), n_shards=9)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(
        num_partitions=4,
        ignored_tables=frozenset({"ignored_entity"}),
        ignored_server_ids=frozenset({999})))
    e0 = lake.apply(meta["files"][:4])["epoch"]
    e1 = lake.apply(meta["files"][3:6])["epoch"]   # still 4 columns
    snap_a = _payload_state(lake, e0)
    out = str(tmp_path / "relay")
    d01 = egress.export_changefeed(lake, e0, e1, out, fmt="avro")
    pre_payload = lake.payload_schema()

    e2 = lake.apply(meta["files"][5:])["epoch"]    # widens to 5
    d12 = egress.export_changefeed(lake, e1, e2, out, fmt="avro")
    payload = lake.payload_schema()
    assert len(payload) == len(pre_payload) + 1, "stream must evolve"

    reg = json.load(open(d12["registry"]))
    assert len(reg) == 2, reg  # a second id was registered
    # re-export of the SAME span re-uses its id, no duplicate entry
    egress.export_changefeed(lake, e1, e2, out, fmt="avro")
    assert len(json.load(open(d12["registry"]))) == 2

    down = LakeTable(str(tmp_path / "down"), CDCConfig(num_partitions=4))
    down.bootstrap(snap_a, gtid_watermark=0)
    files = sorted(glob.glob(out + "/data-*.avrowire"))
    assert set(files) == set(d01["data_files"]) | set(d12["data_files"])
    ds = read_avro(files, d12["registry"], tx_topic=None,
                   payload=payload)
    res = down.apply(ds.materialize())
    assert res["closed_watermark"] is not None
    got = _payload_state(down, res["epoch"])
    want = _payload_state(lake, e2)
    assert got.num_rows == want.num_rows
    for c in payload.names:
        assert got.column(c).to_pylist() == want.column(c).to_pylist(), c


def test_mongo_roundtrip_into_bootstrapped_lake(tmp_path, ray_session):
    """Egress as a recorded MongoDB change stream: dump(changes A→B,
    fmt=mongo) decoded with read_mongo and applied onto a lake
    bootstrapped from snapshot A reproduces snapshot B exactly.  The
    change-stream envelope has no transaction-identity channel, so the
    dump rides the 1-bit-shifted token space (upserts even, synthetic
    delete tokens odd) — the downstream floor lives in that space
    (fresh lake, watermark 0)."""
    import json
    import os

    from rookray.wiremongo import read_mongo

    lake, e0, e1 = _two_epoch_lake(tmp_path)
    out = str(tmp_path / "dump")
    d = egress.export_changefeed(lake, e0, e1, out, fmt="mongo")
    assert d["events"] > 0
    assert all(os.path.basename(p).startswith("mongo-")
               for p in d["data_files"])

    # token-space invariants: globally unique, parity-separated
    toks, ops = [], []
    for p in d["data_files"]:
        for line in open(p):
            rec = json.loads(line)
            toks.append(int(rec["_id"]["_data"], 16))
            ops.append(rec["operationType"])
    assert len(toks) == len(set(toks)) == d["events"]
    for t, op in zip(toks, ops):
        assert (t % 2 == 1) == (op == "delete"), (t, op)

    payload = lake.payload_schema()
    down = LakeTable(str(tmp_path / "down"), CDCConfig(num_partitions=4))
    down.bootstrap(_payload_state(lake, e0), gtid_watermark=0)
    ds = read_mongo(d["data_files"], payload=payload)
    res = down.apply(ds.materialize())
    assert res["closed_watermark"] is not None  # singleton txs all close

    got = _payload_state(down, res["epoch"])
    want = _payload_state(lake, e1)
    assert got.num_rows == want.num_rows
    for c in payload.names:
        assert got.column(c).to_pylist() == want.column(c).to_pylist(), c

    # re-export writes byte-identical files (task-retry / resume safety:
    # delete ranks are a deterministic sort, not an arrival order)
    sizes = {p: os.path.getsize(p) for p in d["data_files"]}
    d2 = egress.export_changefeed(lake, e0, e1, out, fmt="mongo")
    assert d2["data_files"] == d["data_files"]
    assert sizes == {p: os.path.getsize(p) for p in d2["data_files"]}


def test_mongo_multi_dump_relay_directory_single_pass(tmp_path,
                                                      ray_session):
    """The mongo analog of the relay-directory composition proof: two
    consecutive dumps into ONE out dir, ingested in ONE read_mongo
    pass.  Every dump-2 token must exceed every dump-1 token (the
    composition contract), including the synthetic delete tokens —
    the construction anchors them above dump 1's watermark, so a key
    published in dump 1 and deleted in dump 2 can never produce a
    token collision (the identity wedge the Debezium dialect dodges
    with its negative tx space)."""
    import glob
    import json

    from rookray.wiremongo import read_mongo

    meta = write_shards(CFG, str(tmp_path / "shards"), n_shards=9)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(
        num_partitions=4,
        ignored_tables=frozenset({"ignored_entity"}),
        ignored_server_ids=frozenset({999})))
    e0 = lake.apply(meta["files"][:4])["epoch"]
    e1 = lake.apply(meta["files"][3:7])["epoch"]
    e2 = lake.apply(meta["files"][6:])["epoch"]

    out = str(tmp_path / "relay")
    d01 = egress.export_changefeed(lake, e0, e1, out, fmt="mongo")
    d12 = egress.export_changefeed(lake, e1, e2, out, fmt="mongo")
    assert d01["events"] and d12["events"]

    def toks(d):
        return [int(json.loads(line)["_id"]["_data"], 16)
                for f in d["data_files"] for line in open(f)]
    t1, t2 = toks(d01), toks(d12)
    assert min(t2) > max(t1)                      # dumps compose
    assert len(t1 + t2) == len(set(t1 + t2))      # unique across dumps

    payload = lake.payload_schema()
    down = LakeTable(str(tmp_path / "down"), CDCConfig(num_partitions=4))
    down.bootstrap(_payload_state(lake, e0), gtid_watermark=0)
    files = sorted(glob.glob(out + "/mongo-*.jsonl"))
    assert set(files) == set(d01["data_files"]) | set(d12["data_files"])
    res = down.apply(read_mongo(files, payload=payload).materialize())
    assert res["closed_watermark"] is not None

    got = _payload_state(down, None)
    want = _payload_state(lake, e2)
    assert got.num_rows == want.num_rows
    for c in payload.names:
        assert got.column(c).to_pylist() == want.column(c).to_pylist(), c


def test_dynamo_roundtrip_into_bootstrapped_lake(tmp_path, ray_session):
    """Egress as a recorded DynamoDB Streams dump: dump(changes A→B,
    fmt=dynamo) decoded with read_dynamo and applied onto a lake
    bootstrapped from snapshot A reproduces snapshot B exactly.
    Stream records have no transaction-identity channel either, so the
    dump rides the same 1-bit-shifted token space as the change-stream
    dialect, offset into realistic 21-digit SequenceNumbers that the
    decoder's probe-and-rebase recovers exactly."""
    import json
    import os

    from rookray.wiredynamo import read_dynamo

    lake, e0, e1 = _two_epoch_lake(tmp_path)
    out = str(tmp_path / "dump")
    d = egress.export_changefeed(lake, e0, e1, out, fmt="dynamo")
    assert d["events"] > 0
    assert all(os.path.basename(p).startswith("dynamo-")
               for p in d["data_files"])

    # token-space invariants: globally unique, parity-separated,
    # riding the 10^20 base
    toks, ops = [], []
    for p in d["data_files"]:
        for line in open(p):
            rec = json.loads(line)
            seq = int(rec["dynamodb"]["SequenceNumber"])
            assert seq >= 10 ** 20
            toks.append(seq - 10 ** 20)
            ops.append(rec["eventName"])
    assert len(toks) == len(set(toks)) == d["events"]
    for t, op in zip(toks, ops):
        assert (t % 2 == 1) == (op == "REMOVE"), (t, op)

    payload = lake.payload_schema()
    down = LakeTable(str(tmp_path / "down"), CDCConfig(num_partitions=4))
    down.bootstrap(_payload_state(lake, e0), gtid_watermark=0)
    ds = read_dynamo(d["data_files"], payload=payload)
    res = down.apply(ds.materialize())
    assert res["closed_watermark"] is not None  # singleton txs all close

    got = _payload_state(down, res["epoch"])
    want = _payload_state(lake, e1)
    assert got.num_rows == want.num_rows
    for c in payload.names:
        assert got.column(c).to_pylist() == want.column(c).to_pylist(), c

    # re-export writes byte-identical files (deterministic delete ranks)
    sizes = {p: os.path.getsize(p) for p in d["data_files"]}
    d2 = egress.export_changefeed(lake, e0, e1, out, fmt="dynamo")
    assert d2["data_files"] == d["data_files"]
    assert sizes == {p: os.path.getsize(p) for p in d2["data_files"]}


def test_dynamo_multi_dump_relay_directory_single_pass(tmp_path,
                                                       ray_session):
    """The DynamoDB analog of the relay-directory composition proof:
    two consecutive dumps into ONE out dir, ingested in ONE
    read_dynamo pass (the probed sequence base is shared because both
    dumps ride the same 10^20 offset)."""
    import glob
    import json

    from rookray.wiredynamo import read_dynamo

    meta = write_shards(CFG, str(tmp_path / "shards"), n_shards=9)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(
        num_partitions=4,
        ignored_tables=frozenset({"ignored_entity"}),
        ignored_server_ids=frozenset({999})))
    e0 = lake.apply(meta["files"][:4])["epoch"]
    e1 = lake.apply(meta["files"][3:7])["epoch"]
    e2 = lake.apply(meta["files"][6:])["epoch"]

    out = str(tmp_path / "relay")
    d01 = egress.export_changefeed(lake, e0, e1, out, fmt="dynamo")
    d12 = egress.export_changefeed(lake, e1, e2, out, fmt="dynamo")
    assert d01["events"] and d12["events"]

    def toks(d):
        return [int(json.loads(line)["dynamodb"]["SequenceNumber"])
                for f in d["data_files"] for line in open(f)]
    t1, t2 = toks(d01), toks(d12)
    assert min(t2) > max(t1)                      # dumps compose
    assert len(t1 + t2) == len(set(t1 + t2))      # unique across dumps

    payload = lake.payload_schema()
    down = LakeTable(str(tmp_path / "down"), CDCConfig(num_partitions=4))
    down.bootstrap(_payload_state(lake, e0), gtid_watermark=0)
    files = sorted(glob.glob(out + "/dynamo-*.jsonl"))
    assert set(files) == set(d01["data_files"]) | set(d12["data_files"])
    res = down.apply(read_dynamo(files, payload=payload).materialize())
    assert res["closed_watermark"] is not None

    got = _payload_state(down, None)
    want = _payload_state(lake, e2)
    assert got.num_rows == want.num_rows
    for c in payload.names:
        assert got.column(c).to_pylist() == want.column(c).to_pylist(), c
