"""Delta (merge-on-read) write mode + compaction: O(epoch) writes with
byte-identical state vs rewrite mode and the serial oracle."""

import os

import pandas as pd
import pytest

from rookray.gen import GenConfig, final_state, write_shards
from rookray.pipeline import CDCConfig, LakeTable

from tests.test_gen_oracle import assert_tables_equal


def test_delta_matches_oracle_across_epochs(tmp_path):
    cfg = GenConfig(n_docs=60, n_events=1200)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=6)
    lake = LakeTable(str(tmp_path / "lake"),
                     CDCConfig(num_partitions=4, write_mode="delta"))
    lake.apply(meta["files"][:2])
    lake.apply(meta["files"][1:4])
    lake.apply(meta["files"][3:])
    m = lake.manifest()
    assert any(p.get("delta_files") for p in m["partitions"].values())
    assert_tables_equal(lake.state_table(), final_state(cfg))
    # merge-on-read through the Dataset API too
    ds = lake.read()
    assert ds.count() == len(final_state(cfg))


def test_delta_write_is_o_epoch_not_o_state(tmp_path):
    """Later small epochs must write files sized by the EPOCH, not by
    the accumulated state (the 100 TB write-amplification property)."""
    cfg = GenConfig(n_docs=2000, n_events=8000)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=8)
    lake = LakeTable(str(tmp_path / "lake"),
                     CDCConfig(num_partitions=2, write_mode="delta"))
    lake.apply(meta["files"][:7])   # big epoch → big deltas
    lake.apply(meta["files"][6:])   # small epoch → small deltas
    m = lake.manifest()
    for p in m["partitions"].values():
        big, small = p["delta_files"][0], p["delta_files"][-1]
        sz = lambda rel: os.path.getsize(os.path.join(str(tmp_path / "lake"), rel))
        assert sz(small) < sz(big) / 2, (sz(small), sz(big))


def test_compact_then_rewrite_mode(tmp_path):
    cfg = GenConfig(n_docs=50, n_events=900)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=6)
    root = str(tmp_path / "lake")
    delta_lake = LakeTable(root, CDCConfig(num_partitions=4, write_mode="delta"))
    delta_lake.apply(meta["files"][:4])

    # rewrite mode refuses while deltas pending
    rw = LakeTable(root, CDCConfig(num_partitions=4, write_mode="rewrite"))
    with pytest.raises(ValueError, match="uncompacted"):
        rw.apply(meta["files"][3:])

    res = delta_lake.compact()
    assert res["compacted"] > 0
    m = delta_lake.manifest()
    assert all(not p.get("delta_files") for p in m["partitions"].values())
    # post-compaction the plain flat read path serves the same state
    mid = delta_lake.state_table()

    # and rewrite mode can continue on the compacted table
    rw.apply(meta["files"][3:])
    assert_tables_equal(rw.state_table(), final_state(cfg))


def test_delta_duplicate_replay_idempotent(tmp_path):
    cfg = GenConfig(n_docs=30, n_events=500)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=4)
    lake = LakeTable(str(tmp_path / "lake"),
                     CDCConfig(num_partitions=4, write_mode="delta"))
    lake.apply(meta["files"])
    res = lake.apply(meta["files"])  # full duplicate
    assert res["events_applied"] == 0
    assert_tables_equal(lake.state_table(), final_state(cfg))


def test_delta_requires_actor_path(tmp_path):
    with pytest.raises(ValueError, match="external-shuffle"):
        LakeTable(str(tmp_path / "lake"),
                  CDCConfig(write_mode="delta", merge_strategy="groupby")
                  ).apply([])


def test_size_tiered_compaction_only_rewrites_hot_partitions(tmp_path):
    """compact(min_deltas=K): only partitions at/above the backlog
    threshold rewrite (no cold-partition rewrites); merge-on-read
    state stays byte-equal throughout; a later full compact folds the
    rest."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rookray.gen import GenConfig, final_state, write_shards
    from rookray.pipeline import CDCConfig, LakeTable
    from rookray.schema import OP_INSERT, change_event_schema
    from tests.test_gen_oracle import assert_tables_equal

    cfg = GenConfig(n_docs=40, n_events=900)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=4)
    lake = LakeTable(str(tmp_path / "lake"),
                     CDCConfig(num_partitions=4, write_mode="delta"))
    lake.apply(meta["files"][:2])
    lake.apply(meta["files"][1:])  # overlap: boundary txs complete

    # one extra tiny epoch touching a single key → exactly one
    # partition grows a deeper delta backlog
    g = meta["gtid_max"] + 1
    ev = pa.Table.from_pylist(
        [dict(gtid=g, tx_id=g, seq_in_tx=0, tx_events=1, server_id=1,
              db="rook", table="sequences", op=OP_INSERT, key="zz-hot",
              before=None,
              after={"doc_id": "zz-hot", "tokens": [7, 7, 7],
                     "n_tok": 3, "source": "s0"})],
        schema=change_event_schema())
    hot_shard = str(tmp_path / "hot.parquet")
    pq.write_table(ev, hot_shard)
    lake.apply([hot_shard])

    m = lake.manifest()
    delta_counts = {p: len(v["delta_files"])
                    for p, v in m["partitions"].items()}
    kmax = max(delta_counts.values())
    hot = [p for p, c in delta_counts.items() if c >= kmax]
    assert len(hot) < len(delta_counts), delta_counts  # uneven backlog

    expect = final_state(cfg).to_pandas()
    expect = (pd.concat([expect, pd.DataFrame(
        [{"doc_id": "zz-hot", "tokens": [7, 7, 7], "n_tok": 3,
          "source": "s0"}])], ignore_index=True)
        .sort_values("doc_id").reset_index(drop=True))
    expect_tbl = pa.Table.from_pandas(
        expect, schema=lake.state_table().schema, preserve_index=False)

    r = lake.compact(min_deltas=kmax)
    assert r["compacted"] == len(hot)
    m2 = lake.manifest()
    for p, c in delta_counts.items():
        left = len(m2["partitions"][p]["delta_files"])
        assert left == (0 if c >= kmax else c), (p, c, left)
    assert_tables_equal(lake.state_table(), expect_tbl)

    # threshold higher than any backlog: clean no-op, no new epoch
    e = lake.manifest()["epoch"]
    assert lake.compact(min_deltas=99)["compacted"] == 0
    assert lake.manifest()["epoch"] == e

    # full compact folds the remainder
    lake.compact()
    assert all(not v["delta_files"]
               for v in lake.manifest()["partitions"].values())
    assert_tables_equal(lake.state_table(), expect_tbl)
