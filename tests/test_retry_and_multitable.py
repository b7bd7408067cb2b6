"""Exactly-once under re-executed tasks (Ray retry semantics) and
multi-table streams through the fan-out registry."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from rookray.events import NormalizeConfig, unified_payload
from rookray.gen import GenConfig, final_state, generate_events, write_shards
from rookray.oracle import replay
from rookray.pipeline import CDCConfig, FinalizeMerge, LakeTable, PartitionStage, ShuffleWriter
from rookray.targets import Fanout

from tests.test_gen_oracle import assert_tables_equal


def test_shuffle_writer_reexecution_is_idempotent(tmp_path):
    """A re-executed map task re-writes the SAME partial files
    (content-deterministic names) — no duplicates reach the reduce."""
    cfg = GenConfig(n_docs=20, n_events=300)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=2)
    tbl = pq.read_table(meta["files"][0])
    ncfg = NormalizeConfig(payload=unified_payload([tbl.schema]))
    stage = PartitionStage(ncfg, 4, np.full(4, -1, dtype=np.int64), 2**62)
    sd = str(tmp_path / "shuffle")
    writer = ShuffleWriter(stage, sd)
    writer(tbl)
    files_once = sorted(glob.glob(os.path.join(sd, "**", "*.arrow"), recursive=True))
    writer(tbl)  # simulated task retry: same input batch again
    files_twice = sorted(glob.glob(os.path.join(sd, "**", "*.arrow"), recursive=True))
    assert files_once == files_twice


def test_finalize_reexecution_is_idempotent(tmp_path):
    """A re-executed reduce task overwrites its own staged state file;
    lineage (rows, hash, watermark) is identical."""
    cfg = GenConfig(n_docs=20, n_events=300)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=2)
    tbl = pq.read_table(meta["files"][0])
    ncfg = NormalizeConfig(payload=unified_payload([tbl.schema]))
    stage = PartitionStage(ncfg, 4, np.full(4, -1, dtype=np.int64), 2**62)
    sd = str(tmp_path / "shuffle")
    ShuffleWriter(stage, sd)(tbl)
    root = str(tmp_path / "lake")
    os.makedirs(root)
    fin = FinalizeMerge(root, 0, sd, {}, {})
    batch = pa.table({"part": pa.array([0, 1, 2, 3], pa.int32())})
    first = fin(batch).to_pylist()
    second = fin(batch).to_pylist()  # simulated task retry
    assert first == second


def test_two_tables_one_stream_via_fanout(tmp_path):
    """rook tails one binlog carrying many tables and each listener
    picks its own (database-isolation IT, IntegrationTest.java:301-353);
    here: one shard set, two LakeTables filtering different tables."""
    cfg_a = GenConfig(n_docs=30, n_events=400, table="alpha", seed=1)
    cfg_b = GenConfig(n_docs=30, n_events=400, table="beta", seed=2,
                      gtid_start=10_001)
    ta, tb = generate_events(cfg_a), generate_events(cfg_b)
    # disjoint tx-id spaces (one stream = one tx sequence)
    tb = tb.set_column(
        tb.column_names.index("tx_id"), "tx_id",
        pa.array(np.asarray(tb.column("tx_id").to_pylist()) + 1_000_000, pa.int64()),
    )
    stream = pa.concat_tables([ta, tb]).sort_by("gtid")
    p = str(tmp_path / "stream.parquet")
    pq.write_table(stream, p)

    lake_a = LakeTable(str(tmp_path / "a"), CDCConfig(table="alpha", num_partitions=4))
    lake_b = LakeTable(str(tmp_path / "b"), CDCConfig(table="beta", num_partitions=4))
    fan = Fanout({"alpha": lake_a, "beta": lake_b})
    res = fan.apply([p])
    assert res["alpha"]["ok"] and res["beta"]["ok"]
    assert_tables_equal(lake_a.state_table(), replay(ta, table="alpha"))
    assert_tables_equal(lake_b.state_table(), replay(tb, table="beta"))
    # isolation: no cross-contamination
    assert_tables_equal(lake_a.state_table(), final_state(cfg_a))
    assert_tables_equal(lake_b.state_table(), final_state(cfg_b))
