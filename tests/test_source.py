"""ShardTailer (binlog-tail analog) + footer-statistics shard pruning."""

import os
import shutil

from rookray.gen import GenConfig, final_state, write_shards
from rookray.pipeline import CDCConfig, LakeTable
from rookray.source import ShardTailer, shard_gtid_range, shards_above

from tests.test_gen_oracle import assert_tables_equal


def test_tail_applies_incrementally(tmp_path):
    cfg = GenConfig(n_docs=30, n_events=400)
    staged = tmp_path / "staged"
    meta = write_shards(cfg, str(staged), n_shards=4)
    live = tmp_path / "live"
    live.mkdir()

    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=4))
    tailer = ShardTailer(str(live), lake)
    tailer.connect()
    assert tailer.is_connected()
    assert tailer.poll_once() is None  # nothing arrived yet

    # shards arrive one at a time; each poll applies an epoch with the
    # previous tail shard re-presented (open-tx overlap)
    for f in meta["files"]:
        shutil.copy(f, live / os.path.basename(f))
        r = tailer.poll_once()
        assert r is not None
    assert_tables_equal(lake.state_table(), final_state(cfg))
    tailer.disconnect()
    assert not tailer.is_connected()


def test_shard_pruning_by_footer_stats(tmp_path):
    cfg = GenConfig(n_docs=20, n_events=300)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=3)
    ranges = [shard_gtid_range(f) for f in meta["files"]]
    assert ranges[0][0] == 1 and ranges[-1][1] == 300
    # floor inside shard 1 → shard 0 pruned, 1 and 2 kept
    floor = ranges[0][1]
    kept = shards_above(meta["files"], floor)
    assert kept == meta["files"][1:]


def test_live_tailer_background_thread(tmp_path):
    """LiveTailer: shards arriving while the background thread runs are
    applied exactly-once; disconnect joins the thread; final state
    byte-equals the closed-form oracle."""
    import time
    from rookray.source import LiveTailer

    cfg = GenConfig(n_docs=20, n_events=300)
    staged = tmp_path / "staged"
    meta = write_shards(cfg, str(staged), n_shards=5)
    live = tmp_path / "live"
    live.mkdir()
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=4))
    tailer = LiveTailer(str(live), lake, poll_interval_s=0.05)
    tailer.connect(timeout_s=2)
    assert tailer.is_connected()
    try:
        for f in meta["files"]:
            shutil.copy(f, live / os.path.basename(f))
            time.sleep(0.1)
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            m = lake.manifest()
            if m and m.get("closed_watermark") == meta["gtid_max"]:
                break
            time.sleep(0.2)
    finally:
        tailer.disconnect()
    assert not tailer.is_connected()
    assert tailer.errors == []
    assert lake.manifest()["closed_watermark"] == meta["gtid_max"]
    assert_tables_equal(lake.state_table(), final_state(cfg))


def test_live_tailer_captures_failures_and_stays_resumable(tmp_path):
    """A failing apply lands in .errors, stops the tail, and the shards
    stay consumable: a reconnect with a healthy target applies
    everything (resume from the target's own watermarks)."""
    import time
    from rookray.source import LiveTailer

    cfg = GenConfig(n_docs=10, n_events=100)
    meta = write_shards(cfg, str(tmp_path / "staged"), n_shards=2)
    live = tmp_path / "live"
    live.mkdir()
    for f in meta["files"]:
        shutil.copy(f, live / os.path.basename(f))

    class Exploding:
        def apply(self, shards, **kw):
            raise RuntimeError("sink down")

    t = LiveTailer(str(live), Exploding(), poll_interval_s=0.05)
    t.connect()
    deadline = time.monotonic() + 30
    while time.monotonic() < deadline and not t.errors:
        time.sleep(0.05)
    t.disconnect()
    assert t.errors and "sink down" in repr(t.errors[0])
    assert t.results == []

    # reconnect against a real lake: everything still applies
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=4))
    t2 = LiveTailer(str(live), lake, poll_interval_s=0.05)
    t2.connect()
    deadline = time.monotonic() + 60
    while time.monotonic() < deadline:
        m = lake.manifest()
        if m and m.get("closed_watermark") == meta["gtid_max"]:
            break
        time.sleep(0.1)
    t2.disconnect()
    assert t2.errors == []
    assert_tables_equal(lake.state_table(), final_state(cfg))
