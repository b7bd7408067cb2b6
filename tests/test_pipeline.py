"""End-to-end pipeline correctness vs the serial replay oracle:
token-array equality of final lake state (the north-rule invariant)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rookray.gen import GenConfig, generate_events, final_state, write_shards
from rookray.oracle import replay
from rookray.pipeline import CDCConfig, LakeTable

from tests.test_gen_oracle import assert_tables_equal


def make_lake(tmp_lake, **kw):
    kw.setdefault("num_partitions", 8)
    return LakeTable(tmp_lake, CDCConfig(**kw))


def test_e2e_single_epoch(tmp_lake, tmp_path):
    cfg = GenConfig(n_docs=60, n_events=900)
    meta = write_shards(cfg, str(tmp_path / "shards"), n_shards=5)
    lake = make_lake(tmp_lake)
    res = lake.apply(meta["files"])
    assert res["epoch"] == 0
    got = lake.state_table()
    assert_tables_equal(got, final_state(cfg))
    m = lake.manifest()
    assert m["closed_watermark"] == meta["gtid_max"]


def test_e2e_with_noise_filters(tmp_lake, tmp_path):
    cfg = GenConfig(n_docs=50, n_events=800, noise_pct=15)
    meta = write_shards(cfg, str(tmp_path / "shards"), n_shards=4)
    lake = make_lake(
        tmp_lake, ignored_tables=frozenset({"ignored_entity"}),
        ignored_server_ids=frozenset({999}),
    )
    lake.apply(meta["files"])
    assert_tables_equal(lake.state_table(), final_state(cfg))


def test_incremental_epochs_match_single_shot(tmp_lake, tmp_path):
    cfg = GenConfig(n_docs=40, n_events=600)
    meta = write_shards(cfg, str(tmp_path / "shards"), n_shards=6)
    lake = make_lake(tmp_lake)
    res1 = lake.apply(meta["files"][:3])
    # an epoch cut mid-transaction holds the open tx back; the next
    # epoch must re-present the shard containing it (watermark skip
    # makes the overlap free)
    lake.apply(meta["files"][2:])
    assert_tables_equal(lake.state_table(), final_state(cfg))
    assert lake.manifest()["epoch"] == 1
    assert res1["closed_watermark"] <= 300


def test_duplicate_replay_idempotent(tmp_lake, tmp_path):
    cfg = GenConfig(n_docs=30, n_events=400)
    meta = write_shards(cfg, str(tmp_path / "shards"), n_shards=4)
    lake = make_lake(tmp_lake)
    lake.apply(meta["files"])
    h1 = {p: v["content_hash"] for p, v in lake.manifest()["partitions"].items()}
    res = lake.apply(meta["files"])  # full duplicate replay
    assert res["events_applied"] == 0
    h2 = {p: v["content_hash"] for p, v in lake.manifest()["partitions"].items()}
    assert h1 == h2
    assert_tables_equal(lake.state_table(), final_state(cfg))


def test_overlapping_shard_replay(tmp_lake, tmp_path):
    cfg = GenConfig(n_docs=30, n_events=500)
    meta = write_shards(cfg, str(tmp_path / "shards"), n_shards=5)
    lake = make_lake(tmp_lake)
    lake.apply(meta["files"][:3])
    lake.apply(meta["files"][1:])  # overlap shards 1-2
    assert_tables_equal(lake.state_table(), final_state(cfg))


def test_tx_holdback_mid_transaction_cut(tmp_lake, tmp_path):
    """An epoch cut mid-transaction must hold the open tx back
    (rook: a TX is delivered only on XID — MySQLReplicationStream.java:243-249)."""
    cfg = GenConfig(n_docs=20, n_events=300)
    tbl = generate_events(cfg)
    # find a cut point strictly inside a transaction
    cut = None
    for i in range(200, 300):
        if tbl.column("seq_in_tx")[i].as_py() > 0:
            cut = i
            break
    assert cut is not None
    d = tmp_path / "shards"
    d.mkdir()
    p1, p2 = str(d / "a.parquet"), str(d / "b.parquet")
    pq.write_table(tbl.slice(0, cut), p1)
    pq.write_table(tbl.slice(cut), p2)
    lake = make_lake(tmp_lake)
    res1 = lake.apply([p1])
    open_tx_first_gtid = tbl.column("gtid")[cut].as_py() - tbl.column("seq_in_tx")[cut].as_py()
    assert res1["closed_watermark"] == open_tx_first_gtid - 1
    # partial tx must not be visible: state == oracle over closed prefix only
    prefix = tbl.filter(
        pa.compute.less_equal(tbl.column("gtid"), pa.scalar(res1["closed_watermark"]))
    )
    assert_tables_equal(lake.state_table(), replay(prefix))
    # second epoch re-presents the open tx's shard plus the rest
    lake.apply([p1, p2])
    assert_tables_equal(lake.state_table(), final_state(cfg))


def test_schema_evolution_across_epochs(tmp_lake, tmp_path):
    cfg = GenConfig(n_docs=30, n_events=400, evolve_at=201)
    meta = write_shards(cfg, str(tmp_path / "shards"), n_shards=4)
    lake = make_lake(tmp_lake)
    lake.apply(meta["files"][:2])   # pre-evolution only
    assert "lang" not in lake.state_table().column_names
    # resume from the closed watermark: re-present the shard holding the
    # tx left open at the epoch-0 boundary, plus the evolved shards
    lake.apply(meta["files"][1:])
    got = lake.state_table()
    assert "lang" in got.column_names
    assert_tables_equal(got, final_state(cfg))


def test_salted_equivalence(tmp_lake, tmp_path):
    cfg = GenConfig(n_docs=500, n_events=3000, zipf_a=1.4)
    meta = write_shards(cfg, str(tmp_path / "shards"), n_shards=4)
    plain = make_lake(str(tmp_path / "lake1"))
    salted = make_lake(str(tmp_path / "lake2"), salt=4)
    plain.apply(meta["files"])
    salted.apply(meta["files"])
    assert_tables_equal(salted.state_table(), plain.state_table())
    assert_tables_equal(salted.state_table(), final_state(cfg))


def test_pk_changing_update_split(tmp_lake, tmp_path):
    """Update that changes the key ⇒ delete(before)+insert(after)
    (forced by rook's before-image keying, AbstractCacheSynchronizer.java:63-79)."""
    from rookray.schema import change_event_schema, OP_INSERT, OP_UPDATE

    def payload(doc, toks):
        return {"doc_id": doc, "tokens": toks, "n_tok": len(toks), "source": "s"}

    rows = [
        dict(gtid=1, tx_id=0, seq_in_tx=0, tx_events=1, server_id=1, db="rook",
             table="sequences", op=OP_INSERT, key="a", before=None,
             after=payload("a", [1, 2])),
        dict(gtid=2, tx_id=1, seq_in_tx=0, tx_events=1, server_id=1, db="rook",
             table="sequences", op=OP_UPDATE, key="a", before=payload("a", [1, 2]),
             after=payload("b", [3, 4])),  # PK change a → b
    ]
    tbl = pa.Table.from_pylist(rows, schema=change_event_schema())
    p = str(tmp_path / "ev.parquet")
    pq.write_table(tbl, p)
    lake = make_lake(tmp_lake)
    lake.apply([p])
    got = lake.state_table()
    assert got.column("doc_id").to_pylist() == ["b"]
    assert got.column("tokens").to_pylist() == [[3, 4]]
    assert_tables_equal(got, replay(tbl))


def test_delete_of_missing_key_is_noop(tmp_lake, tmp_path):
    from rookray.schema import change_event_schema, OP_INSERT, OP_DELETE

    def payload(doc, toks):
        return {"doc_id": doc, "tokens": toks, "n_tok": len(toks), "source": "s"}

    rows = [
        dict(gtid=1, tx_id=0, seq_in_tx=0, tx_events=2, server_id=1, db="rook",
             table="sequences", op=OP_DELETE, key="ghost",
             before=payload("ghost", []), after=None),
        dict(gtid=2, tx_id=0, seq_in_tx=1, tx_events=2, server_id=1, db="rook",
             table="sequences", op=OP_INSERT, key="x", before=None,
             after=payload("x", [7])),
    ]
    tbl = pa.Table.from_pylist(rows, schema=change_event_schema())
    p = str(tmp_path / "ev.parquet")
    pq.write_table(tbl, p)
    lake = make_lake(tmp_lake)
    lake.apply([p])
    got = lake.state_table()
    assert got.column("doc_id").to_pylist() == ["x"]
    assert_tables_equal(got, replay(tbl))


def test_resume_after_partial_failure(tmp_lake, tmp_path):
    """Crash between staging and commit: rerun of the epoch must land
    byte-identical (two-phase idempotence, SURVEY.md §7.5)."""
    cfg = GenConfig(n_docs=30, n_events=400)
    meta = write_shards(cfg, str(tmp_path / "shards"), n_shards=4)
    lake = make_lake(tmp_lake)
    lake.apply(meta["files"][:2])
    manifest_before = lake.manifest()

    # simulate: epoch 1 staged some partition files but crashed pre-commit
    import rookray.sink as sink_mod
    real_commit = sink_mod.commit_manifest
    try:
        sink_mod.commit_manifest = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash"))
        with pytest.raises(RuntimeError):
            lake.apply(meta["files"][1:])
    finally:
        sink_mod.commit_manifest = real_commit
    # manifest unchanged → epoch 1 never committed
    assert lake.manifest() == manifest_before
    # rerun the epoch (resume from the committed closed watermark)
    lake.apply(meta["files"][1:])
    assert_tables_equal(lake.state_table(), final_state(cfg))


def test_per_statement_mode_applies_open_tx(tmp_lake, tmp_path):
    """tx_atomic=False = rook's setGroupEventsByTX(false): per-statement
    delivery, no holdback at a mid-transaction cut
    (MySQLReplicationStream.java:82-84)."""
    cfg = GenConfig(n_docs=20, n_events=300)
    tbl = generate_events(cfg)
    cut = next(i for i in range(200, 300)
               if tbl.column("seq_in_tx")[i].as_py() > 0)
    p1 = str(tmp_path / "a.parquet")
    pq.write_table(tbl.slice(0, cut), p1)
    lake = make_lake(tmp_lake, tx_atomic=False)
    lake.apply([p1])
    # EVERY event up to the cut is applied, including the open tx's head
    assert_tables_equal(lake.state_table(), replay(tbl.slice(0, cut)))


def test_lookup_point_reads(tmp_path, tmp_lake):
    """lookup(): key-filtered partition-pruned point reads equal the
    full state filtered — across delta (merge-on-read) epochs, with
    deleted and unknown keys absent, and pruned to the hash-matching
    partitions only."""
    import os

    import pyarrow.parquet as pq

    from rookray.gen import GenConfig, write_shards
    from rookray.pipeline import CDCConfig, LakeTable
    from rookray.util import partition_of

    cfg = GenConfig(n_docs=40, n_events=600)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=4)
    lake = LakeTable(tmp_lake, CDCConfig(num_partitions=8,
                                         write_mode="delta"))
    lake.apply(meta["files"][:2])
    lake.apply(meta["files"][1:])  # second epoch: deltas stack

    state = lake.state_table().to_pandas().set_index("doc_id")
    live = list(state.index)
    probe = live[:3] + ["doc-does-not-exist"]
    out = lake.lookup(probe).to_pandas().set_index("doc_id")
    assert sorted(out.index) == sorted(live[:3])
    for d in live[:3]:
        assert out.loc[d, "n_tok"] == state.loc[d, "n_tok"]

    # single-key probe touches exactly one partition's files
    import pyarrow as pa
    opened = []
    orig = pq.read_table

    def spy(path, *a, **k):
        opened.append(str(path))
        return orig(path, *a, **k)

    import rookray.pipeline as P
    P.pq.read_table, saved = spy, P.pq.read_table
    try:
        one = lake.lookup([live[0]])
    finally:
        P.pq.read_table = saved
    assert len(one) == 1
    pid = int(partition_of(pa.array([live[0]]), 8)[0])
    assert opened and all(f"-{pid:05d}-" in os.path.basename(p)
                          for p in opened)

    # after compaction the same lookups still resolve
    lake.compact()
    out2 = lake.lookup(probe).to_pandas().set_index("doc_id")
    assert sorted(out2.index) == sorted(live[:3])


def test_bootstrap_snapshot_then_stream(tmp_path, tmp_lake):
    """Snapshot bootstrap (initial-load -> streaming handoff): a table
    bootstrapped from a consistent snapshot at watermark G, then fed
    the live shards overlapping G, lands byte-identical state to a
    full-history replay."""
    from rookray.gen import GenConfig, final_state, write_shards
    from rookray.pipeline import CDCConfig, LakeTable

    cfg = GenConfig(n_docs=30, n_events=400)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=4)

    # reference: full replay
    ref = LakeTable(str(tmp_path / "ref"), CDCConfig(num_partitions=4))
    ref.apply(meta["files"][:2])
    snap = ref.state_table()          # consistent as of ref's watermark
    g = ref.manifest()["closed_watermark"]
    ref.apply(meta["files"][1:])      # finish the reference replay

    boot = LakeTable(tmp_lake, CDCConfig(num_partitions=4))
    r = boot.bootstrap(snap, gtid_watermark=g)
    assert r["closed_watermark"] == g and r["rows"] == len(snap)
    # handoff: stream resumes with the shards overlapping the watermark
    boot.apply(meta["files"][1:])

    a = boot.state_table().to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = ref.state_table().to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = final_state(cfg).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a["doc_id"].tolist() == exp["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["n_tok"].tolist() == exp["n_tok"].tolist()
    assert [list(x) for x in a["tokens"]] == [list(x) for x in exp["tokens"]]

    # bootstrap refuses a non-empty table; meta columns rejected
    with pytest.raises(ValueError, match="empty"):
        boot.bootstrap(snap, gtid_watermark=g)
    fresh = LakeTable(str(tmp_path / "fresh"), CDCConfig(num_partitions=4))
    import pyarrow as pa
    with pytest.raises(ValueError, match="meta columns"):
        fresh.bootstrap(snap.append_column(
            "_gtid", pa.array([0] * len(snap), pa.int64())), gtid_watermark=g)

    # point lookups work straight off the bootstrapped base
    key = a["doc_id"].iloc[0]
    assert boot.lookup([key]).to_pandas()["doc_id"].tolist() == [key]


def test_restore_rolls_back_and_resumes(tmp_path, tmp_lake):
    """restore(epoch): metadata-only rollback to a committed snapshot;
    state equals the historical snapshot, GC keeps the restored files,
    and re-applying the undone shards lands the full-replay state."""
    from rookray.gen import GenConfig, final_state, write_shards
    from rookray.pipeline import CDCConfig, LakeTable
    from rookray.sink import gc_uncommitted

    cfg = GenConfig(n_docs=30, n_events=400)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=4)
    lake = LakeTable(tmp_lake, CDCConfig(num_partitions=4))
    lake.apply(meta["files"][:2])        # epoch 0
    snap0 = lake.state_table().to_pandas().sort_values("doc_id")
    wm0 = lake.manifest()["closed_watermark"]
    lake.apply(meta["files"][1:])        # epoch 1

    r = lake.restore(0)
    assert r["epoch"] == 2 and r["restored_from"] == 0
    assert r["closed_watermark"] == wm0
    got = lake.state_table().to_pandas().sort_values("doc_id")
    assert got["doc_id"].tolist() == snap0["doc_id"].tolist()
    assert got["n_tok"].tolist() == snap0["n_tok"].tolist()

    # GC must keep the restored (old-epoch) files: they are current
    gc_uncommitted(tmp_lake, keep_epochs=0)
    assert len(lake.state_table()) == len(snap0)

    # resume: re-applying the undone shards reaches full replay again
    lake.apply(meta["files"][1:])
    exp = final_state(cfg).to_pandas().sort_values("doc_id")
    now = lake.state_table().to_pandas().sort_values("doc_id")
    assert now["doc_id"].tolist() == exp["doc_id"].tolist()
    assert now["n_tok"].tolist() == exp["n_tok"].tolist()

    with pytest.raises(ValueError, match="no committed epoch"):
        lake.restore(99)


def test_export_hive_partitioned_roundtrip(tmp_path):
    """export(): hive-partitioned parquet by a payload column, byte
    round-trip of the state, no engine meta columns in the files."""
    import glob

    import pyarrow.parquet as pq

    cfg = GenConfig(n_docs=30, n_events=500)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=3)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=2))
    lake.apply(meta["files"])

    out = str(tmp_path / "export")
    r = lake.export(out, partition_col="source")
    state = lake.state_table().to_pandas()
    assert r["rows"] == len(state)
    assert set(r["partitions"]) == set(state["source"].unique())

    files = glob.glob(f"{out}/source=*/*.parquet")
    assert files and all("/source=" in f for f in files)
    back = pd.concat(
        [pq.read_table(f).to_pandas().assign(
            source=f.split("source=")[1].split("/")[0]) for f in files],
        ignore_index=True)
    assert "_gtid" not in back.columns  # clean handoff, no meta
    a = state.sort_values("doc_id").reset_index(drop=True)
    b = back.sort_values("doc_id").reset_index(drop=True)[a.columns]
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["source"].tolist() == b["source"].tolist()
    for x, y in zip(a["tokens"], b["tokens"]):
        assert list(x) == list(y)


def test_snapshot_isolated_reads_during_apply(tmp_path):
    """Readers racing a concurrent apply() must always see a complete
    committed snapshot — either the pre-apply epoch or the post-apply
    epoch, never a torn mix.  The atomic manifest swap + immutable
    state files are the mechanism; this pins it under a real race."""
    import threading

    from rookray.util import stable_table_hash

    cfg = GenConfig(n_docs=80, n_events=4000)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=8)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=4))
    lake.apply(meta["files"][:4])
    h1 = stable_table_hash(lake.state_table())

    done = threading.Event()

    def run_apply():
        try:
            lake.apply(meta["files"][3:])  # overlap: watermark-skip
        finally:
            done.set()

    t = threading.Thread(target=run_apply, daemon=True)
    t.start()
    seen = []
    while True:  # always take at least one read (apply may be fast)
        seen.append(stable_table_hash(lake.state_table()))
        if done.is_set():
            break
    t.join(timeout=120)
    assert done.is_set()
    h2 = stable_table_hash(lake.state_table())
    assert h2 != h1  # the second epoch really changed the state
    assert seen, "no reads raced the apply"
    bad = [h for h in seen if h not in (h1, h2)]
    assert not bad, f"{len(bad)} torn reads of {len(seen)}"
    # the final state is still the oracle state
    assert_tables_equal(lake.state_table(), final_state(cfg))


def test_expectations_quarantine_and_state(tmp_path):
    """CDCConfig.expect_fn: violating rows divert to the quarantine
    audit table (gtid-deduped across overlapping epochs) and never
    reach the merge — the state equals a serial replay of only the
    passing events.  (The expectation must live in an importable
    library module — Ray workers unpickle it by reference.)"""
    from rookray.queries import _expect_short_docs

    cfg = GenConfig(n_docs=50, n_events=1000)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=4)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(
        num_partitions=4, expect_fn=_expect_short_docs))
    lake.apply(meta["files"][:3])
    lake.apply(meta["files"][2:])  # overlap: re-presented bad rows dedupe

    # expected: serial replay over the event stream with the same gate
    ev = generate_events(cfg)
    after = ev.column("after").combine_chunks()
    n = after.field("n_tok").to_pandas().fillna(0).to_numpy("int64")
    op = ev.column("op").to_numpy(zero_copy_only=False)
    passing = (op == 2) | (n <= 96)
    df = pd.DataFrame({
        "gtid": ev.column("gtid").to_numpy(zero_copy_only=False),
        "op": op, "key": ev.column("key").to_pylist(),
        "n_tok": n, "tokens": after.field("tokens").to_pylist(),
    })
    live = {}
    for r in df[passing].sort_values("gtid").itertuples():
        if r.op == 2:
            live.pop(r.key, None)
        else:
            live[r.key] = list(r.tokens)
    got = lake.state_table().to_pandas().sort_values("doc_id")
    assert got["doc_id"].tolist() == sorted(live)
    for d, t in zip(got["doc_id"], got["tokens"]):
        assert list(t) == live[d]

    # quarantine: exactly the distinct violating events, each once
    q = lake.quarantine_table()
    bad = df[~passing]
    assert sorted(q.column("gtid").to_pylist()) == sorted(bad["gtid"])
    qn = dict(zip(q.column("gtid").to_pylist(),
                  q.column("n_tok").to_pylist()))
    assert all(v > 96 for v in qn.values())


def test_single_writer_lease(tmp_path):
    """Mutators refuse to run while a LIVE foreign lease exists, break
    STALE leases (crashed writer), and always release on exit."""
    import json as _json
    import time as _time

    from rookray.pipeline import ConcurrentWriterError

    cfg = GenConfig(n_docs=20, n_events=300)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=2)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=2))
    lease = str(tmp_path / "lake" / "_write_lease.json")

    # live foreign lease → refuse
    with open(lease, "w") as f:
        _json.dump({"pid": 999999, "acquired": _time.time()}, f)
    with pytest.raises(ConcurrentWriterError, match="pid 999999"):
        lake.apply(meta["files"])
    import os as _os
    assert _os.path.exists(lease)  # a refused writer must not break it

    # stale lease (crashed writer) → broken, apply proceeds
    with open(lease, "w") as f:
        _json.dump({"pid": 999999,
                    "acquired": _time.time() - lake.LEASE_TTL_S - 1}, f)
    lake.apply(meta["files"])
    assert not _os.path.exists(lease)  # released on exit
    assert_tables_equal(lake.state_table(), final_state(cfg))

    # reentrancy: compact (itself leased) under a normal sequence
    lake.compact()
    assert not _os.path.exists(lease)


def test_lease_same_process_and_purge_sweeps_quarantine(tmp_path):
    """(1) A second writer in the SAME process (another instance over
    the same root, or a thread) is refused while the lease is held —
    it must never break its sibling's live lease.  (2) GDPR purge
    expunges the victims from the quarantine audit files too, and
    quarantine_clear() reclaims the rest."""
    import threading

    from rookray.pipeline import ConcurrentWriterError
    from rookray.queries import _expect_short_docs

    cfg = GenConfig(n_docs=40, n_events=800)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=2)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(
        num_partitions=2, expect_fn=_expect_short_docs))

    # hold the lease on a thread, probe from a sibling instance
    entered, release = threading.Event(), threading.Event()

    def hold():
        with lake._write_lease():
            entered.set()
            release.wait(30)

    t = threading.Thread(target=hold, daemon=True)
    t.start()
    assert entered.wait(10)
    sibling = LakeTable(str(tmp_path / "lake"),
                        CDCConfig(num_partitions=2))
    with pytest.raises(ConcurrentWriterError, match="this process"):
        sibling.apply(meta["files"])
    release.set()
    t.join(10)

    lake.apply(meta["files"])
    q0 = lake.quarantine_table()
    assert len(q0) > 0
    victims = sorted(set(q0.column("doc_id").to_pylist()))[:2]
    r = lake.purge(victims)
    assert r["quarantine_rows_purged"] > 0
    q1 = lake.quarantine_table()
    assert not set(victims) & set(q1.column("doc_id").to_pylist())
    # and the victims' bytes are gone from the audit files themselves
    import glob as _glob
    for f in _glob.glob(str(tmp_path / "lake" / "quarantine" / "*.parquet")):
        t2 = pq.read_table(f)
        assert not set(victims) & set(t2.column("doc_id").to_pylist())
    assert lake.metrics()["quarantined_rows"] == len(q1)
    assert lake.quarantine_clear() > 0
    assert len(lake.quarantine_table()) == 0

    # bootstrap under an expectation is refused loudly
    empty = LakeTable(str(tmp_path / "lake2"), CDCConfig(
        num_partitions=2, expect_fn=_expect_short_docs))
    with pytest.raises(ValueError, match="expect_fn"):
        empty.bootstrap(lake.state_table(), gtid_watermark=10)


@pytest.mark.parametrize("mode_kw", [
    dict(write_mode="delta"),           # merge-on-read path
    dict(salt=4),                       # hot-key salted shuffle path
])
def test_expectations_compose_with_merge_modes(tmp_path, mode_kw):
    """The expectations gate must compose with BOTH special merge
    paths (delta/merge-on-read and hot-key salting): state equals the
    gated serial replay, and compaction/overlap keep it byte-stable."""
    from rookray.queries import _expect_short_docs

    cfg = GenConfig(n_docs=40, n_events=900, zipf_a=1.3)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=3)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(
        num_partitions=4, expect_fn=_expect_short_docs, **mode_kw))
    lake.apply(meta["files"][:2])
    lake.apply(meta["files"][1:])
    if mode_kw.get("write_mode") == "delta":
        lake.compact()

    ev = generate_events(cfg)
    after = ev.column("after").combine_chunks()
    n = after.field("n_tok").to_pandas().fillna(0).to_numpy("int64")
    op = ev.column("op").to_numpy(zero_copy_only=False)
    passing = (op == 2) | (n <= 96)
    expected = replay(ev.filter(pa.array(passing)))
    assert_tables_equal(lake.state_table(), expected)
    q = lake.quarantine_table()
    assert sorted(q.column("gtid").to_pylist()) == sorted(
        ev.filter(pa.array(~passing)).column("gtid").to_pylist())


def test_purged_quarantine_never_resurrected_by_replay(tmp_path):
    """The review-found hole: if a partition's rows ALL quarantined,
    its watermark never advances, and a duplicate replay would re-gate
    (and re-write) audit bytes a GDPR purge swept.  The purge
    tombstones close it: victims never re-enter the quarantine, other
    bad rows still audit normally."""
    from rookray.queries import _expect_short_docs

    # min_tokens=97 ⇒ EVERY non-delete event violates the n_tok<=96
    # gate — the maximal version of the all-quarantined scenario
    cfg = GenConfig(n_docs=20, n_events=300, min_tokens=97)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=2)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(
        num_partitions=2, expect_fn=_expect_short_docs))
    lake.apply(meta["files"])
    q0 = lake.quarantine_table()
    assert len(q0) > 0
    assert len(lake.state_table()) == 0  # nothing passed the gate

    victims = sorted(set(q0.column("doc_id").to_pylist()))[:3]
    lake.purge(victims)
    assert not set(victims) & set(
        lake.quarantine_table().column("doc_id").to_pylist())

    # duplicate replay: bad rows re-gate, but the tombstoned victims'
    # bytes must NOT come back; everything else re-audits normally
    lake.apply(meta["files"])
    q1 = lake.quarantine_table()
    assert not set(victims) & set(q1.column("doc_id").to_pylist())
    survivors = set(q0.column("doc_id").to_pylist()) - set(victims)
    assert survivors <= set(q1.column("doc_id").to_pylist())
    import glob as _glob
    for f in _glob.glob(str(tmp_path / "lake" / "quarantine" /
                            "*.parquet")):
        t = pq.read_table(f)
        assert not set(victims) & set(t.column("doc_id").to_pylist())
