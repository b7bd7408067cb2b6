"""Target (sink) semantics vs the reference's test scenarios:
cache eviction (SecondLevelCacheSynchronizerTest / QueryCacheSynchronizer)
and derived-index maintenance (DefaultRowsMutationIndexer ITs)."""

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from rookray.gen import GenConfig, generate_events, final_state, write_shards
from rookray.schema import change_event_schema, OP_INSERT, OP_UPDATE, OP_DELETE
from rookray.targets import (
    CacheInvalidationTarget,
    DerivedIndexTarget,
    EvictionTarget,
    Fanout,
)
from rookray.targets.invalidation import NullEntityKeyError
from rookray.pipeline import CDCConfig, LakeTable

from tests.test_gen_oracle import assert_tables_equal


def payload(doc, toks, source="s"):
    return {"doc_id": doc, "tokens": toks, "n_tok": len(toks), "source": source}


def ev(gtid, op, before=None, after=None, tx=0, table="sequences", db="rook"):
    key = (before or after)["doc_id"]
    return dict(gtid=gtid, tx_id=tx, seq_in_tx=0, tx_events=1, server_id=1,
                db=db, table=table, op=op, key=key, before=before, after=after)


REGISTRY = {
    "rook.sequences": [
        EvictionTarget("SeqEntity", ("doc_id",), is_collection=False,
                       query_spaces=("seq_space",)),
        EvictionTarget("SeqCollection", ("source",), is_collection=True),
    ],
    "rook.pairs": [
        EvictionTarget("PairEntity", ("doc_id", "source"), is_collection=False),
    ],
}


def test_update_evicts_under_before_image_key():
    """rook evicts updates under the BEFORE image
    (AbstractCacheSynchronizer.java:63-79)."""
    t = CacheInvalidationTarget(REGISTRY)
    tbl = pa.Table.from_pylist(
        [ev(1, OP_UPDATE, before=payload("old", [1]), after=payload("new", [2]))],
        schema=change_event_schema(),
    )
    out = t.evictions_batch(tbl)
    ent = out.filter(pa.compute.equal(out.column("name"), pa.scalar("SeqEntity")))
    assert ent.column("key").to_pylist() == ["old"]


def test_composite_key_canonical_order():
    """Composite keys assemble in registry field order — the semantic
    analog of binlog-position-order key assembly
    (SynchronizationContextTest.java:63-69)."""
    t = CacheInvalidationTarget(REGISTRY)
    tbl = pa.Table.from_pylist(
        [ev(1, OP_DELETE, before=payload("d1", [1], source="sA"), table="pairs")],
        schema=change_event_schema(),
    )
    out = t.evictions_batch(tbl)
    assert out.column("key").to_pylist() == ["d1\x1fsA"]


def test_collection_null_key_skipped_entity_null_key_raises():
    """SecondLevelCacheSynchronizer.java:52-60: collection+null → skip
    row; entity+null → error."""
    t = CacheInvalidationTarget(
        {"rook.sequences": [EvictionTarget("Coll", ("source",), is_collection=True)]}
    )
    # delete carrying only the key column — nulls elsewhere
    # (SecondLevelCacheSynchronizerTest.java:117-118 analog)
    row = ev(1, OP_DELETE, before={"doc_id": "x", "tokens": [], "n_tok": None,
                                   "source": None})
    tbl = pa.Table.from_pylist([row], schema=change_event_schema())
    out = t.evictions_batch(tbl)
    assert len(out) == 0  # null collection key skipped

    t2 = CacheInvalidationTarget(
        {"rook.sequences": [EvictionTarget("Ent", ("source",), is_collection=False)]}
    )
    with pytest.raises(NullEntityKeyError):
        t2.evictions_batch(tbl)


def test_unregistered_table_ignored():
    """Only wired tables are affected (database-isolation IT,
    IntegrationTest.java:301-353)."""
    t = CacheInvalidationTarget(REGISTRY)
    tbl = pa.Table.from_pylist(
        [ev(1, OP_INSERT, after=payload("a", [1]), table="other"),
         ev(2, OP_INSERT, after=payload("b", [2]), db="otherdb")],
        schema=change_event_schema(),
    )
    assert len(t.evictions_batch(tbl)) == 0


def test_query_space_distinct_union_per_tx():
    """One bulk invalidation of the distinct space union per tx
    (QueryCacheSynchronizer.java:47-64)."""
    t = CacheInvalidationTarget(REGISTRY)
    rows = [
        ev(1, OP_INSERT, after=payload("a", [1]), tx=7),
        ev(2, OP_INSERT, after=payload("b", [2]), tx=7),   # same tx, same space
        ev(3, OP_INSERT, after=payload("c", [3]), tx=8),
    ]
    tbl = pa.Table.from_pylist(rows, schema=change_event_schema())
    ds = ray.data.from_arrow(tbl)
    out = t.query_invalidations(ds).to_pandas().sort_values(["tx_id", "space"])
    assert list(map(tuple, out.values)) == [(7, "seq_space"), (8, "seq_space")]


def test_evictions_pipeline_counts():
    cfg = GenConfig(n_docs=20, n_events=200)
    tbl = generate_events(cfg)
    t = CacheInvalidationTarget(REGISTRY)
    ds = ray.data.from_arrow(tbl)
    out = t.evictions(ds).to_pandas()
    # entity eviction for every event; collection eviction for every
    # event whose merged image has non-null source (all of them here)
    assert (out["name"] == "SeqEntity").sum() == 200
    assert (out["name"] == "SeqCollection").sum() == 200


# --------------------------------------------------------------- derived


def test_derived_index_maintenance(tmp_path):
    cfg = GenConfig(n_docs=40, n_events=600)
    meta = write_shards(cfg, str(tmp_path / "shards"), n_shards=4)
    primary = LakeTable(str(tmp_path / "primary"), CDCConfig(num_partitions=8))
    primary.apply(meta["files"])
    target = DerivedIndexTarget(str(tmp_path / "derived"),
                                config=CDCConfig(num_partitions=8))
    res = target.apply(meta["files"], primary=primary)
    state = target.state_table()
    exp = final_state(cfg)
    # derived rows track exactly the live keys
    assert state.column("doc_id").to_pylist() == exp.column("doc_id").to_pylist()
    assert state.column("n_tok").to_pylist() == exp.column("n_tok").to_pylist()
    assert "tok_hash" in state.column_names
    # cascade rollup equals a groupby over the authoritative final state
    cont = target.containers_table().to_pandas().set_index("source")
    import pandas as pd
    exp_roll = (
        exp.to_pandas().groupby("source").agg(docs=("n_tok", "size"),
                                              total_tokens=("n_tok", "sum"))
    )
    assert cont["docs"].to_dict() == exp_roll["docs"].to_dict()
    assert cont["total_tokens"].to_dict() == {k: int(v) for k, v in exp_roll["total_tokens"].items()}


def test_derived_incremental_and_idempotent(tmp_path):
    cfg = GenConfig(n_docs=30, n_events=400)
    meta = write_shards(cfg, str(tmp_path / "shards"), n_shards=4)
    target = DerivedIndexTarget(str(tmp_path / "derived"),
                                config=CDCConfig(num_partitions=4))
    target.apply(meta["files"][:2])
    target.apply(meta["files"][1:])
    target.apply(meta["files"])  # full duplicate replay
    exp = final_state(cfg)
    state = target.state_table()
    assert state.column("doc_id").to_pylist() == exp.column("doc_id").to_pylist()
    assert state.column("n_tok").to_pylist() == exp.column("n_tok").to_pylist()


# ---------------------------------------------------------------- fanout


class _Boom:
    def apply(self, paths, **kw):
        raise RuntimeError("sink down")


def test_fanout_isolates_failures(tmp_path):
    cfg = GenConfig(n_docs=20, n_events=200)
    meta = write_shards(cfg, str(tmp_path / "shards"), n_shards=2)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=4))
    fan = Fanout({"lake": lake, "boom": _Boom()},
                 dead_letter_dir=str(tmp_path / "dlq"))
    results = fan.apply(meta["files"])
    assert results["lake"]["ok"] and not results["boom"]["ok"]
    # healthy target committed in full
    assert_tables_equal(lake.state_table(), final_state(cfg))
    # dead letter recorded
    recs = [json.loads(l) for l in open(tmp_path / "dlq" / "boom.jsonl")]
    assert recs[0]["target"] == "boom" and "sink down" in recs[0]["error"]


def test_recursive_cascade_multi_hop(tmp_path):
    """Multi-hop container chain doc -> source -> source-group (the
    embedded/many-to-many cascade reindex analog,
    supplement/.../h4fti/IntegrationTest.java:254-368): a child
    mutation re-derives EVERY ancestor level."""
    from rookray.targets import ContainerSpec

    cfg = GenConfig(n_docs=30, n_events=400)
    meta = write_shards(cfg, str(tmp_path / "shards"), n_shards=4)
    primary = LakeTable(str(tmp_path / "primary"), CDCConfig(num_partitions=4))
    primary.apply(meta["files"])

    specs = [
        ContainerSpec(name="by_source", child="primary", key_col="source"),
        # level 2: sources grouped by even/odd suffix
        ContainerSpec(
            name="by_parity", child="by_source", key_col="parity",
            key_of=lambda df: df["source"].str[-1].astype(int) % 2),
    ]
    target = DerivedIndexTarget(str(tmp_path / "derived"),
                                config=CDCConfig(num_partitions=4),
                                containers=specs)
    res = target.apply(meta["files"], primary=primary)
    assert res["containers"]["by_source"]["containers"] > 0
    assert res["containers"]["by_parity"]["containers"] == 2

    exp = final_state(cfg).to_pandas()
    lvl1 = target.containers_table("by_source").to_pandas().set_index("source")
    exp1 = exp.groupby("source").agg(docs=("n_tok", "size"),
                                     total_tokens=("n_tok", "sum"))
    assert lvl1["docs"].to_dict() == exp1["docs"].to_dict()
    lvl2 = target.containers_table("by_parity").to_pandas().set_index("parity")
    exp["parity"] = exp["source"].str[-1].astype(int) % 2
    exp2 = exp.groupby("parity").agg(docs=("n_tok", "size"),
                                     total_tokens=("n_tok", "sum"))
    assert lvl2["docs"].to_dict() == exp2["docs"].to_dict()
    assert lvl2["total_tokens"].to_dict() == {
        k: int(v) for k, v in exp2["total_tokens"].items()}


def test_cascade_cycle_guard(tmp_path):
    """A container chain that never grounds at the primary (a cycle)
    must terminate and be reported, not recurse forever -- the
    IndexingLog cycle-guard analog
    (DefaultRowsMutationIndexer.java:151-166)."""
    from rookray.targets import ContainerSpec

    cfg = GenConfig(n_docs=10, n_events=100)
    meta = write_shards(cfg, str(tmp_path / "shards"), n_shards=2)
    primary = LakeTable(str(tmp_path / "primary"), CDCConfig(num_partitions=2))
    primary.apply(meta["files"])

    specs = [
        ContainerSpec(name="ok", child="primary", key_col="source"),
        ContainerSpec(name="a", child="b", key_col="source"),
        ContainerSpec(name="b", child="a", key_col="source"),
    ]
    target = DerivedIndexTarget(str(tmp_path / "derived"),
                                config=CDCConfig(num_partitions=2),
                                containers=specs)
    target.lake.apply_derived(meta["files"], target.derive_fn)
    res = target.cascade(primary)
    assert res["ok"]["containers"] > 0
    assert "skipped" in res["a"] and "skipped" in res["b"]


def test_atomic_fanout_consistent_cross_target_commit(tmp_path):
    """The coordinator manifest publishes {target: epoch} only after
    EVERY child committed a round: a crash (or failing child) between
    child commits leaves consistent readers on the previous set; the
    rerun completes the swap; consistent reads equal each other's
    round even while children are ahead."""
    import json

    import pandas as pd

    from rookray.gen import GenConfig, write_shards
    from rookray.pipeline import CDCConfig, LakeTable
    from rookray.targets.fanout import AtomicFanout

    cfg = GenConfig(n_docs=30, n_events=600)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=4)
    a = LakeTable(str(tmp_path / "a"), CDCConfig(num_partitions=2))
    b = LakeTable(str(tmp_path / "b"), CDCConfig(num_partitions=4))
    fan = AtomicFanout({"a": a, "b": b}, str(tmp_path / "coord"))

    r = fan.apply(meta["files"][:2])
    assert all(x["ok"] for x in r.values())
    c1 = fan.consistent_epochs()
    assert c1["epochs"] == {"a": 0, "b": 0} and c1["seq"] == 0

    # round 2: child a commits, child b FAILS → coordinator untouched
    real_apply = b.apply
    def boom(shards, **kw):
        raise RuntimeError("b down")
    b.apply = boom
    r = fan.apply(meta["files"][1:3])
    assert r["a"]["ok"] and not r["b"]["ok"]
    assert fan.consistent_epochs() == c1  # no torn set published

    # consistent readers: a is AHEAD (epoch 1 committed) but
    # consistent_read serves its epoch-0 snapshot — the pair matches
    # the first round exactly
    sa = fan.consistent_read("a").to_pandas().sort_values("doc_id")
    sb = fan.consistent_read("b").to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(sa.reset_index(drop=True),
                                  sb.reset_index(drop=True))
    assert (a.manifest()["epoch"], b.manifest()["epoch"]) == (1, 0)

    # heal b, rerun the round: children skip re-presented work by
    # watermark, the swap completes, and the new consistent pair is
    # identical across targets again
    b.apply = real_apply
    r = fan.apply(meta["files"][1:3])
    assert all(x["ok"] for x in r.values())
    c2 = fan.consistent_epochs()
    assert c2["seq"] == 1
    sa = fan.consistent_read("a").to_pandas().sort_values("doc_id")
    sb = fan.consistent_read("b").to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(sa.reset_index(drop=True),
                                  sb.reset_index(drop=True))

    # final round: full replay converges both to the oracle
    fan.apply(meta["files"])
    from rookray.gen import final_state
    from tests.test_gen_oracle import assert_tables_equal
    assert_tables_equal(a.state_table(), final_state(cfg))
    assert_tables_equal(b.state_table(), final_state(cfg))


def test_dead_letter_replay_heals_target(tmp_path):
    """A dead-lettered epoch replays to the healed target: state
    converges to the oracle, the log drains; a still-broken target
    keeps its records."""
    from rookray.gen import GenConfig, final_state, write_shards
    from rookray.pipeline import CDCConfig, LakeTable
    from rookray.targets.fanout import Fanout, replay_dead_letters
    from tests.test_gen_oracle import assert_tables_equal

    cfg = GenConfig(n_docs=20, n_events=300)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=3)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=2))

    healthy_after = {"broken": True}

    class Flaky:
        def apply(self, shards, **kw):
            if healthy_after["broken"]:
                raise RuntimeError("sink down")
            return lake.apply(shards)

    fan = Fanout({"lake": Flaky()}, dead_letter_dir=str(tmp_path / "dl"))
    r = fan.apply(meta["files"][:2])
    assert not r["lake"]["ok"]
    r = fan.apply(meta["files"])
    assert not r["lake"]["ok"]
    dl = tmp_path / "dl" / "lake.jsonl"
    assert dl.exists() and len(dl.read_text().splitlines()) == 2

    # still broken: replay keeps both records
    rep = replay_dead_letters(fan)
    assert rep["lake"] == {"replayed": 0, "still_failing": 2,
                           "unregistered": 0}
    assert len(dl.read_text().splitlines()) == 2

    # heal, replay: both epochs apply (idempotent overlap), log drains
    healthy_after["broken"] = False
    rep = replay_dead_letters(fan)
    assert rep["lake"]["replayed"] == 2 and rep["lake"]["still_failing"] == 0
    assert not dl.exists()
    assert_tables_equal(lake.state_table(), final_state(cfg))


def test_registry_introspected_from_lake_schema(tmp_path):
    """Attach-time introspection (the JDBC-metadata analog,
    SynchronizationContext.java:89-113): eviction targets and container
    specs are built from the COMMITTED manifest schema with zero
    hand-written column maps, and evict identically to an explicit
    registry."""
    from rookray.targets.introspect import container_specs, eviction_registry

    cfg = GenConfig(n_docs=20, n_events=120)
    meta = write_shards(cfg, str(tmp_path / "shards"), n_shards=2)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=2))
    lake.apply(meta["files"])

    reg = eviction_registry(lake)
    assert set(reg) == {"rook.sequences"}
    targets = {t.name: t for t in reg["rook.sequences"]}
    # entity target keyed by the merge key, collection target per list column
    assert targets["sequences"].key_fields == ("doc_id",)
    assert not targets["sequences"].is_collection
    assert targets["sequences"].query_spaces == ("sequences",)
    assert targets["sequences.tokens"].is_collection
    assert targets["sequences.tokens"].key_fields == ("doc_id",)

    # containment edges from the non-key string columns
    specs = {s.name: s for s in container_specs(lake)}
    assert "by_source" in specs and specs["by_source"].key_col == "source"

    # the introspected registry evicts exactly like a hand-written one
    events = generate_events(cfg)
    got = CacheInvalidationTarget(reg).evictions_batch(events)
    exp = CacheInvalidationTarget({
        "rook.sequences": [
            EvictionTarget("sequences", ("doc_id",),
                           query_spaces=("sequences",)),
            EvictionTarget("sequences.tokens", ("doc_id",),
                           is_collection=True,
                           query_spaces=("sequences",)),
        ]}).evictions_batch(events)
    assert got.equals(exp)
