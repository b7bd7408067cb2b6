"""Time-travel reads + changefeed: every committed epoch's snapshot
stays readable from its archived manifest (immutable epoch-tagged
state files), and the partition-local snapshot diff reproduces the
row-level changes between any two epochs.

Rook has no historical reads (the binlog position lives inside
BinaryLogClient and only the head state exists); the epoch history is
a capability the lake-manifest design buys for free."""

import os

import numpy as np
import pandas as pd
import pytest

from rookray.gen import GenConfig, write_shards
from rookray.pipeline import CDCConfig, LakeTable
from rookray.sink import gc_uncommitted

from tests.test_gen_oracle import assert_tables_equal


def _digest(tbl):
    return (tbl.select(["doc_id", "n_tok", "_gtid"])
            .sort_by("doc_id").to_pandas())


def test_as_of_snapshot_equals_prefix_replay(tmp_path):
    cfg = GenConfig(n_docs=80, n_events=1600)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=8)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=4))
    e1 = lake.apply(meta["files"][:3])["epoch"]
    e2 = lake.apply(meta["files"][2:6])["epoch"]
    lake.apply(meta["files"][5:])

    # the snapshot read path must equal a fresh lake stopped at the
    # same prefix (same shards, same overlap re-present)
    for ep, prefix in ((e1, meta["files"][:3]),
                       (e2, [*meta["files"][:3], *meta["files"][2:6]])):
        fresh = LakeTable(str(tmp_path / f"fresh{ep}"),
                          CDCConfig(num_partitions=4))
        # re-play the same epoch sequence up to ep
        if ep == e1:
            fresh.apply(meta["files"][:3])
        else:
            fresh.apply(meta["files"][:3])
            fresh.apply(meta["files"][2:6])
        snap = lake.state_table(include_meta=True, as_of=ep)
        assert_tables_equal(
            snap.select(["doc_id", "tokens", "n_tok", "source"]),
            fresh.state_table().select(["doc_id", "tokens", "n_tok", "source"]))
        # Dataset read path agrees with the in-memory path
        assert lake.read(as_of=ep).count() == len(snap)

    assert lake.epochs() == [0, 1, 2]


def test_as_of_snapshot_delta_mode(tmp_path):
    cfg = GenConfig(n_docs=60, n_events=1200)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=6)
    lake = LakeTable(str(tmp_path / "lake"),
                     CDCConfig(num_partitions=4, write_mode="delta"))
    e1 = lake.apply(meta["files"][:3])["epoch"]
    lake.apply(meta["files"][2:])
    fresh = LakeTable(str(tmp_path / "fresh"),
                      CDCConfig(num_partitions=4, write_mode="delta"))
    fresh.apply(meta["files"][:3])
    assert_tables_equal(lake.state_table(as_of=e1), fresh.state_table())


def test_changefeed_matches_state_diff(tmp_path):
    cfg = GenConfig(n_docs=70, n_events=1500)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=6)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=4))
    e1 = lake.apply(meta["files"][:3])["epoch"]
    e2 = lake.apply(meta["files"][2:])["epoch"]

    feed = pd.DataFrame(lake.changes_between(e1, e2).take_all())
    a = _digest(lake.state_table(include_meta=True, as_of=e1))
    b = _digest(lake.state_table(include_meta=True, as_of=e2))
    mg = a.merge(b, on="doc_id", how="outer", suffixes=("_a", "_b"))
    ga = mg["_gtid_a"].to_numpy(dtype=float)
    gb = mg["_gtid_b"].to_numpy(dtype=float)
    expect_insert = set(mg.loc[np.isnan(ga), "doc_id"])
    expect_delete = set(mg.loc[np.isnan(gb), "doc_id"])
    expect_update = set(
        mg.loc[~np.isnan(ga) & ~np.isnan(gb) & (ga != gb), "doc_id"])
    got = {c: set(feed.loc[feed["change"] == c, "doc_id"])
           for c in ("insert", "delete", "update")}
    assert got["insert"] == expect_insert
    assert got["delete"] == expect_delete
    assert got["update"] == expect_update
    # unchanged keys emit nothing
    assert len(feed) == len(expect_insert | expect_delete | expect_update)
    # sentinel semantics: inserts carry no A-side, deletes no B-side
    assert (feed.loc[feed["change"] == "insert", "gtid_a"] == -1).all()
    assert (feed.loc[feed["change"] == "delete", "gtid_b"] == -1).all()
    assert (feed.loc[feed["change"] == "update", "gtid_b"]
            > feed.loc[feed["change"] == "update", "gtid_a"]).all()


def test_gc_prunes_old_snapshot_loudly(tmp_path):
    cfg = GenConfig(n_docs=40, n_events=800)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=8)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=2))
    e1 = lake.apply(meta["files"][:2])["epoch"]
    for i in range(2, 8, 2):
        lake.apply(meta["files"][i - 1:i + 2])
    removed = gc_uncommitted(str(tmp_path / "lake"), keep_epochs=1)
    assert removed > 0
    with pytest.raises(ValueError, match="garbage-collected"):
        lake.state_table(as_of=e1)
    # head read unaffected
    assert lake.read().count() > 0


def test_changefeed_refuses_repartition_boundary(tmp_path):
    cfg = GenConfig(n_docs=40, n_events=600)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=4)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=2))
    e1 = lake.apply(meta["files"][:2])["epoch"]
    lake.apply(meta["files"][1:])
    e3 = lake.repartition(4)["epoch"]
    with pytest.raises(ValueError, match="repartition"):
        lake.changes_between(e1, e3)


def test_missing_epoch_lists_available(tmp_path):
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=2))
    with pytest.raises(ValueError, match="no committed epoch"):
        lake.manifest_at(7)
