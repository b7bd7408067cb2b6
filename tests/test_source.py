"""ShardTailer (binlog-tail analog) + footer-statistics shard pruning."""

import os
import shutil

import pytest

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


def test_overlap_represents_all_shards_without_watermark(tmp_path):
    """A target with NO manifest/closed_watermark must get EVERY applied
    shard re-presented (applies are idempotent): re-presenting only the
    last one stalls a tx spanning 3+ shards forever."""
    cfg = GenConfig(n_docs=10, n_events=120)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=4)
    live = tmp_path / "live"
    live.mkdir()

    class Recorder:  # duck-typed sink, no manifest()
        def __init__(self):
            self.epochs = []

        def apply(self, shards, **kw):
            self.epochs.append([os.path.basename(p) for p in shards])
            return {"n": len(shards)}

    rec = Recorder()
    t = ShardTailer(str(live), rec)
    t.connect()
    for f in meta["files"]:
        shutil.copy(f, live / os.path.basename(f))
        t.poll_once()
    # epoch k must contain ALL k-1 previously applied shards + the new one
    names = [os.path.basename(f) for f in meta["files"]]
    for k, ep in enumerate(rec.epochs):
        assert ep == names[: k + 1]


def test_fanout_manifest_aggregates_min_watermark(tmp_path):
    """Fanout.manifest(): min over children with watermarks; unknown
    (no watermark) when any child lacks one — which makes the tailer
    fall back to full re-present."""
    from rookray.targets.fanout import Fanout

    class WM:
        def __init__(self, w):
            self.w = w

        def manifest(self):
            return {"closed_watermark": self.w}

        def apply(self, shards, **kw):
            return {}

    class NoWM:
        def apply(self, shards, **kw):
            return {}

    f = Fanout({"a": WM(10), "b": WM(7)})
    assert f.manifest() == {"closed_watermark": 7}
    f.register("c", NoWM())
    assert f.manifest().get("closed_watermark") is None
    assert Fanout({}).manifest() is None

    # end-to-end: a fanout of two lakes prunes by the SLOWER child
    cfg = GenConfig(n_docs=10, n_events=120)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=3)
    live = tmp_path / "live"
    live.mkdir()
    lake1 = LakeTable(str(tmp_path / "l1"), CDCConfig(num_partitions=2))
    lake2 = LakeTable(str(tmp_path / "l2"), CDCConfig(num_partitions=2))
    fan = Fanout({"l1": lake1, "l2": lake2})
    t = ShardTailer(str(live), fan)
    t.connect()
    for f_ in meta["files"]:
        shutil.copy(f_, live / os.path.basename(f_))
        t.poll_once()
    assert_tables_equal(lake1.state_table(), final_state(cfg))
    assert_tables_equal(lake2.state_table(), final_state(cfg))
    assert fan.manifest()["closed_watermark"] == meta["gtid_max"]


def test_shard_stream_datasource_exactly_once_and_streaming(tmp_path):
    """The unbounded Datasource tail: shards arriving WHILE the Dataset
    is being consumed stream out exactly-once under executor
    backpressure, and consumption overlaps production (the live tail
    runs inside read tasks, not a driver thread)."""
    import threading
    import time

    from rookray.source import stream_events

    cfg = GenConfig(n_docs=30, n_events=500)
    meta = write_shards(cfg, str(tmp_path / "staged"), n_shards=6)
    live = tmp_path / "live"
    live.mkdir()

    writer_done = threading.Event()

    def writer():
        for f in meta["files"]:
            shutil.copy(f, live / os.path.basename(f))
            time.sleep(0.6)
        (live / "_STREAM_EOF").touch()
        writer_done.set()

    import ray.data as rd
    ctx = rd.DataContext.get_current()
    saved = ctx.target_max_block_size
    # the read op buffers each task's yields to target_max_block_size
    # before emitting — shrink it so tiny test shards flush per-arrival
    # and the overlap is observable (the documented latency knob)
    ctx.target_max_block_size = 16 * 1024
    try:
        t = threading.Thread(target=writer, daemon=True)
        t.start()
        ds = stream_events(str(live), parallelism=3)
        gtids = []
        overlapped = False
        # batch_size=None → one batch per streamed block (the default
        # 1024 re-batching would buffer the whole 500-row stream)
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
            if not writer_done.is_set():
                overlapped = True
            gtids.extend(b.column("gtid").to_pylist())
        t.join()
    finally:
        ctx.target_max_block_size = saved
    assert sorted(gtids) == list(range(1, 501))  # exactly once, complete
    assert overlapped, "consumption never overlapped production"


def test_shard_stream_tolerates_torn_writes(tmp_path):
    """A non-atomic producer (shard visible before its parquet footer
    lands) must NOT kill the read task: the tailer treats an
    unreadable shard as not-yet-arrived, stops that sweep to preserve
    within-task gtid order, and picks it up once complete."""
    import threading
    import time

    from rookray.source import stream_events

    cfg = GenConfig(n_docs=20, n_events=300)
    meta = write_shards(cfg, str(tmp_path / "staged"), n_shards=4)
    live = tmp_path / "live"
    live.mkdir()

    def writer():
        for i, f in enumerate(meta["files"]):
            data = open(f, "rb").read()
            dst = live / os.path.basename(f)
            if i in (1, 3):
                # torn copy: first half visible for a while (no
                # footer), then the rest — what shutil.copy under
                # load looks like to a concurrent reader
                with open(dst, "wb") as out:
                    out.write(data[: len(data) // 2])
                    out.flush()
                    time.sleep(0.8)
                    out.write(data[len(data) // 2:])
            else:
                with open(dst, "wb") as out:
                    out.write(data)
            time.sleep(0.2)
        (live / "_STREAM_EOF").touch()

    t = threading.Thread(target=writer, daemon=True)
    t.start()
    gtids = []
    for b in stream_events(str(live), parallelism=2).iter_batches(
            batch_format="pyarrow", batch_size=None):
        gtids.extend(b.column("gtid").to_pylist())
    t.join()
    assert sorted(gtids) == list(range(1, 301))  # exactly once, complete


def test_shard_stream_idle_timeout_and_composition(tmp_path):
    """No sentinel: the stream drains pre-existing shards and ends on
    idle timeout; composed through map_batches + groupby it matches the
    batch read_parquet equivalent."""
    import pyarrow.compute as pc
    import ray
    import ray.data

    from rookray.source import stream_events

    cfg = GenConfig(n_docs=20, n_events=300)
    meta = write_shards(cfg, str(tmp_path / "live"), n_shards=4)

    def ops_per_table(ds):
        from ray.data.aggregate import Count
        return (ds.map_batches(lambda t: t.select(["table", "op"]),
                               batch_format="pyarrow")
                .groupby(["table", "op"]).aggregate(Count(alias_name="n"))
                .to_pandas().sort_values(["table", "op"])
                .reset_index(drop=True))

    streamed = ops_per_table(
        stream_events(str(tmp_path / "live"), parallelism=2,
                      idle_timeout_s=1.5))
    batch = ops_per_table(ray.data.read_parquet(meta["files"]))
    assert streamed.equals(batch)


def test_tumbling_stream_incremental_emission(tmp_path):
    """Streaming windowed aggregate: windows close and EMIT while the
    producer is still writing (watermark-driven, not end-of-input), each
    (window, key) exactly once, and the union equals the batch groupby."""
    import threading
    import time

    import pyarrow as pa
    import ray.data as rd

    from rookray.source import stream_events
    from rookray.streaming import tumbling_stream

    cfg = GenConfig(n_docs=30, n_events=600)
    meta = write_shards(cfg, str(tmp_path / "staged"), n_shards=6)
    live = tmp_path / "live"
    live.mkdir()
    writer_done = threading.Event()
    first_emit = threading.Event()

    def writer():
        for f in meta["files"][:-1]:
            shutil.copy(f, live / os.path.basename(f))
            time.sleep(0.5)
        # hold the FINAL shard until the consumer proves incremental
        # emission (bounded wait: a broken stream still ends the test
        # and fails the `early` assert) — on a loaded box the executor
        # can be starved past the writer's whole lifetime otherwise
        first_emit.wait(60.0)
        shutil.copy(meta["files"][-1], live / os.path.basename(meta["files"][-1]))
        (live / "_STREAM_EOF").touch()
        writer_done.set()

    ctx = rd.DataContext.get_current()
    saved = ctx.target_max_block_size
    # sized to the PARTIAL rows (~50 B each), not the raw shards: the
    # fused read->partial task buffers output to this boundary, so a
    # 16 KB target would hold every partial until EOF (see
    # tumbling_stream docstring)
    ctx.target_max_block_size = 256
    try:
        threading.Thread(target=writer, daemon=True).start()
        ds = stream_events(str(live), parallelism=2)
        emitted = []
        early = False
        for tbl in tumbling_stream(ds, window=100, ts_col="gtid",
                                   key_col="table", n_sources=2):
            first_emit.set()
            if not writer_done.is_set():
                early = True
            emitted.append(tbl)
    finally:
        ctx.target_max_block_size = saved

    got = (pa.concat_tables(emitted).to_pandas()
           .sort_values(["window_start", "table"]).reset_index(drop=True))
    # exactly-once per (window, key)
    assert not got.duplicated(["window_start", "table"]).any()
    assert early, "no window closed before the producer finished"

    import pandas as pd
    batch = pd.concat([pa.concat_tables([__import__("pyarrow.parquet",
        fromlist=["read_table"]).read_table(f)]).to_pandas()
        for f in meta["files"]])
    batch["window_start"] = (batch["gtid"] // 100) * 100
    exp = (batch.groupby(["window_start", "table"]).agg(
        n_events=("gtid", "size")).reset_index()
        .sort_values(["window_start", "table"]).reset_index(drop=True))
    assert got["window_start"].tolist() == exp["window_start"].tolist()
    assert got["table"].tolist() == exp["table"].tolist()
    assert got["n_events"].tolist() == exp["n_events"].tolist()


def test_hopping_stream_incremental_emission(tmp_path):
    """Streaming HOPPING windows (window=100, hop=50: every event in
    two windows): close/emit while the producer still writes, each
    (window, key) exactly once, union equals the batch double-emit."""
    import threading
    import time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from rookray.source import stream_events
    from rookray.streaming import hopping_stream

    cfg = GenConfig(n_docs=30, n_events=600)
    meta = write_shards(cfg, str(tmp_path / "staged"), n_shards=6)
    live = tmp_path / "live"
    live.mkdir()
    writer_done = threading.Event()
    first_emit = threading.Event()

    def writer():
        for f in meta["files"][:-1]:
            shutil.copy(f, live / os.path.basename(f))
            time.sleep(0.5)
        # hold the FINAL shard until the consumer proves incremental
        # emission (bounded wait: a broken stream still ends the test
        # and fails the `early` assert) — on a loaded box the executor
        # can be starved past the writer's whole lifetime otherwise
        first_emit.wait(60.0)
        shutil.copy(meta["files"][-1], live / os.path.basename(meta["files"][-1]))
        (live / "_STREAM_EOF").touch()
        writer_done.set()

    ctx = rd.DataContext.get_current()
    saved = ctx.target_max_block_size
    ctx.target_max_block_size = 256  # partial rows, see tumbling test
    try:
        threading.Thread(target=writer, daemon=True).start()
        ds = stream_events(str(live), parallelism=2)
        emitted = []
        early = False
        for tbl in hopping_stream(ds, window=100, hop=50, ts_col="gtid",
                                  key_col="table", n_sources=2):
            first_emit.set()
            if not writer_done.is_set():
                early = True
            emitted.append(tbl)
    finally:
        ctx.target_max_block_size = saved

    got = (pa.concat_tables(emitted).to_pandas()
           .sort_values(["window_start", "table"]).reset_index(drop=True))
    assert not got.duplicated(["window_start", "table"]).any()
    assert early, "no window closed before the producer finished"

    batch = pd.concat([pq.read_table(f).to_pandas() for f in meta["files"]])
    hi = (batch["gtid"] // 50) * 50
    exp = pd.concat([
        pd.DataFrame({"window_start": hi, "table": batch["table"]}),
        pd.DataFrame({"window_start": hi - 50, "table": batch["table"]}),
    ])
    exp = (exp.groupby(["window_start", "table"]).size()
           .rename("n_events").reset_index()
           .sort_values(["window_start", "table"]).reset_index(drop=True))
    for col in ("window_start", "table", "n_events"):
        assert got[col].tolist() == exp[col].tolist(), col


def test_session_stream_incremental_emission(tmp_path):
    """Streaming SESSION windows: gap-merged sessions close and emit
    while the producer still writes; each session exactly once; the
    union equals a batch gap-split reference."""
    import threading
    import time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from rookray.source import stream_events
    from rookray.streaming import session_stream

    cfg = GenConfig(n_docs=20, n_events=600)
    meta = write_shards(cfg, str(tmp_path / "staged"), n_shards=6)
    live = tmp_path / "live"
    live.mkdir()
    writer_done = threading.Event()
    first_emit = threading.Event()

    def writer():
        for f in meta["files"][:-1]:
            shutil.copy(f, live / os.path.basename(f))
            time.sleep(0.5)
        # hold the FINAL shard until the consumer proves incremental
        # emission (bounded wait: a broken stream still ends the test
        # and fails the `early` assert) — on a loaded box the executor
        # can be starved past the writer's whole lifetime otherwise
        first_emit.wait(60.0)
        shutil.copy(meta["files"][-1], live / os.path.basename(meta["files"][-1]))
        (live / "_STREAM_EOF").touch()
        writer_done.set()

    GAP = 40
    ctx = rd.DataContext.get_current()
    saved = ctx.target_max_block_size
    ctx.target_max_block_size = 256  # partial rows, see tumbling test
    try:
        threading.Thread(target=writer, daemon=True).start()
        ds = stream_events(str(live), parallelism=2)
        emitted = []
        early = False
        for tbl in session_stream(ds, gap=GAP, ts_col="gtid",
                                  key_col="key", n_sources=2):
            first_emit.set()
            if not writer_done.is_set():
                early = True
            emitted.append(tbl)
    finally:
        ctx.target_max_block_size = saved

    got = (pa.concat_tables(emitted).to_pandas()
           .sort_values(["key", "session_start"]).reset_index(drop=True))
    assert not got.duplicated(["key", "session_start"]).any()
    assert early, "no session closed before the producer finished"

    batch = pd.concat([pq.read_table(f).to_pandas() for f in meta["files"]])
    batch = batch.sort_values(["key", "gtid"])
    newf = (batch["key"].ne(batch["key"].shift())
            | batch["gtid"].diff().gt(GAP))
    batch["sess"] = newf.cumsum()
    exp = (batch.groupby("sess").agg(
        key=("key", "first"), session_start=("gtid", "min"),
        session_end=("gtid", "max"), n_events=("gtid", "size"))
        .sort_values(["key", "session_start"]).reset_index(drop=True))
    for col in ("key", "session_start", "session_end", "n_events"):
        assert got[col].tolist() == exp[col].tolist(), col


def test_socket_stream_windows_and_exactly_once(tmp_path):
    """True network connector: a TCP producer streams framed Arrow IPC
    change batches; the in-executor read task consumes them live
    (windows close before producer EOF), and an epoch ingest off the
    socket lands byte-identical lake state vs applying the files."""
    import threading
    import time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from rookray.pipeline import CDCConfig, LakeTable
    from rookray.source import ChangeStreamServer, stream_events_socket
    from rookray.streaming import tumbling_stream

    cfg = GenConfig(n_docs=30, n_events=600)
    meta = write_shards(cfg, str(tmp_path / "staged"), n_shards=6)

    # --- live windowed consumption overlapping production
    srv = ChangeStreamServer()
    done = threading.Event()
    first_emit = threading.Event()

    def producer():
        for f in meta["files"][:-1]:
            srv.push(pq.read_table(f))
            time.sleep(0.5)
        # hold the FINAL batch until the consumer proves incremental
        # emission (bounded: a broken stream still ends the test and
        # fails the `early` assert) — load-proofing, see the tumbling
        # file-tail test
        first_emit.wait(60.0)
        srv.push(pq.read_table(meta["files"][-1]))
        srv.close()
        done.set()

    ctx = rd.DataContext.get_current()
    saved = ctx.target_max_block_size
    ctx.target_max_block_size = 256  # partial rows, see tumbling test
    try:
        threading.Thread(target=producer, daemon=True).start()
        ds = stream_events_socket(srv.host, srv.port)
        emitted, early = [], False
        for tbl in tumbling_stream(ds, window=100, ts_col="gtid",
                                   key_col="table", n_sources=1):
            first_emit.set()
            if not done.is_set():
                early = True
            emitted.append(tbl)
    finally:
        ctx.target_max_block_size = saved

    got = (pa.concat_tables(emitted).to_pandas()
           .sort_values(["window_start", "table"]).reset_index(drop=True))
    assert early, "no window closed while the producer was still sending"
    batch = pd.concat([pq.read_table(f).to_pandas() for f in meta["files"]])
    batch["window_start"] = (batch["gtid"] // 100) * 100
    exp = (batch.groupby(["window_start", "table"]).size()
           .rename("n_events").reset_index()
           .sort_values(["window_start", "table"]).reset_index(drop=True))
    assert got["n_events"].tolist() == exp["n_events"].tolist()

    # --- exactly-once epoch ingest off the wire
    srv2 = ChangeStreamServer()
    t = threading.Thread(target=lambda: (srv2.push_shards(meta["files"]),
                                         srv2.close()), daemon=True)
    t.start()
    wire = stream_events_socket(srv2.host, srv2.port).materialize()
    lake_net = LakeTable(str(tmp_path / "lake_net"),
                         CDCConfig(num_partitions=4))
    lake_net.apply(wire)
    lake_ref = LakeTable(str(tmp_path / "lake_ref"),
                         CDCConfig(num_partitions=4))
    lake_ref.apply(meta["files"])
    a = lake_net.state_table().to_pandas().sort_values("doc_id")
    b = lake_ref.state_table().to_pandas().sort_values("doc_id")
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["n_tok"].tolist() == b["n_tok"].tolist()


def test_socket_stream_connect_timeout():
    from rookray.source import stream_events_socket

    ds = stream_events_socket("127.0.0.1", 1, connect_timeout_s=0.3)
    with pytest.raises(Exception, match="connect|Timeout"):
        ds.materialize()


def test_window_sink_exactly_once_resume(tmp_path):
    """WindowSink: commit half the emissions, 'crash', then replay the
    WHOLE stream through a resumed sink — the committed log holds
    exactly one row per (window, key) and equals the batch groupby."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from rookray.source import stream_events
    from rookray.streaming import WindowSink, tumbling_stream

    cfg = GenConfig(n_docs=30, n_events=600)
    meta = write_shards(cfg, str(tmp_path / "staged"), n_shards=6)
    live = tmp_path / "live"
    live.mkdir()
    for f in meta["files"]:
        shutil.copy(f, live / os.path.basename(f))
    (live / "_STREAM_EOF").touch()

    ctx = rd.DataContext.get_current()
    saved = ctx.target_max_block_size
    ctx.target_max_block_size = 256
    try:
        def emissions():
            ds = stream_events(str(live), parallelism=2)
            return list(tumbling_stream(ds, window=100, ts_col="gtid",
                                        key_col="table", n_sources=2))

        first = emissions()
        assert len(first) >= 2, "need multiple emission batches"
        sink = WindowSink(str(tmp_path / "out"))
        for tbl in first[: len(first) // 2]:
            assert sink.write(tbl) > 0
        # crash: a fresh sink instance resumes from the manifest, the
        # stream replays from scratch
        sink2 = WindowSink(str(tmp_path / "out"))
        assert sink2.frontier == sink.frontier
        for tbl in emissions():
            sink2.write(tbl)     # committed prefixes skip, tail lands
    finally:
        ctx.target_max_block_size = saved

    got = (sink2.read().to_pandas()
           .sort_values(["window_start", "table"]).reset_index(drop=True))
    assert not got.duplicated(["window_start", "table"]).any()
    batch = pd.concat([pq.read_table(f).to_pandas() for f in meta["files"]])
    batch["window_start"] = (batch["gtid"] // 100) * 100
    exp = (batch.groupby(["window_start", "table"]).size()
           .rename("n_events").reset_index()
           .sort_values(["window_start", "table"]).reset_index(drop=True))
    assert got["window_start"].tolist() == exp["window_start"].tolist()
    assert got["n_events"].tolist() == exp["n_events"].tolist()


def test_window_sink_session_frontier(tmp_path):
    """WindowSink with frontier_col='session_end': session emissions
    commit exactly-once across a crash/replay (session closes are
    monotone in session END under the strict threshold)."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from rookray.source import stream_events
    from rookray.streaming import WindowSink, session_stream

    cfg = GenConfig(n_docs=20, n_events=600)
    meta = write_shards(cfg, str(tmp_path / "staged"), n_shards=6)
    live = tmp_path / "live"
    live.mkdir()
    for f in meta["files"]:
        shutil.copy(f, live / os.path.basename(f))
    (live / "_STREAM_EOF").touch()

    GAP = 40
    ctx = rd.DataContext.get_current()
    saved = ctx.target_max_block_size
    ctx.target_max_block_size = 256
    try:
        def emissions():
            ds = stream_events(str(live), parallelism=2)
            return list(session_stream(ds, gap=GAP, ts_col="gtid",
                                       key_col="key", n_sources=2))

        first = emissions()
        sink = WindowSink(str(tmp_path / "out"), frontier_col="session_end")
        for tbl in first[: max(1, len(first) // 2)]:
            sink.write(tbl)
        sink2 = WindowSink(str(tmp_path / "out"), frontier_col="session_end")
        for tbl in emissions():
            sink2.write(tbl)
        with pytest.raises(ValueError, match="frontier_col"):
            WindowSink(str(tmp_path / "out"))  # mismatched frontier col
    finally:
        ctx.target_max_block_size = saved

    got = (sink2.read().to_pandas()
           .sort_values(["key", "session_start"]).reset_index(drop=True))
    assert not got.duplicated(["key", "session_start"]).any()
    batch = pd.concat([pq.read_table(f).to_pandas() for f in meta["files"]])
    batch = batch.sort_values(["key", "gtid"])
    newf = (batch["key"].ne(batch["key"].shift())
            | batch["gtid"].diff().gt(GAP))
    batch["sess"] = newf.cumsum()
    exp = (batch.groupby("sess").agg(
        key=("key", "first"), session_start=("gtid", "min"),
        n_events=("gtid", "size"))
        .sort_values(["key", "session_start"]).reset_index(drop=True))
    assert got["key"].tolist() == exp["key"].tolist()
    assert got["n_events"].tolist() == exp["n_events"].tolist()


def test_join_streams_windowed(tmp_path):
    """Stream-stream windowed INNER join: two live producers, pairs
    emitted while BOTH streams still write (combined min-watermark),
    each pair exactly once, union equals the batch join."""
    import threading
    import time

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from rookray.source import stream_events
    from rookray.streaming import join_streams

    cfg_l = GenConfig(n_docs=25, n_events=500)
    cfg_r = GenConfig(n_docs=25, n_events=500, noise_pct=15)
    meta_l = write_shards(cfg_l, str(tmp_path / "sl"), n_shards=6)
    meta_r = write_shards(cfg_r, str(tmp_path / "sr"), n_shards=6)
    live_l, live_r = tmp_path / "ll", tmp_path / "lr"
    live_l.mkdir(), live_r.mkdir()
    writer_done = threading.Event()

    def writer(files, live, delay):
        for f in files:
            shutil.copy(f, live / os.path.basename(f))
            time.sleep(delay)
        (live / "_STREAM_EOF").touch()

    def writers():
        a = threading.Thread(
            target=writer, args=(meta_l["files"], live_l, 0.7))
        b = threading.Thread(
            target=writer, args=(meta_r["files"], live_r, 0.8))
        a.start(), b.start()
        a.join(), b.join()
        writer_done.set()

    ctx = rd.DataContext.get_current()
    saved = ctx.target_max_block_size
    ctx.target_max_block_size = 8 * 1024  # tagged rows ~100 B: flush often
    try:
        threading.Thread(target=writers, daemon=True).start()
        ds = stream_events([str(live_l), str(live_r)], parallelism=2,
                           tag_col="side")
        emitted = []
        early = False
        for tbl in join_streams(ds, window=100, ts_col="gtid",
                                key_col="key", side_col="side",
                                val_col="gtid", n_sources=4):
            if not writer_done.is_set():
                early = True
            emitted.append(tbl)
    finally:
        ctx.target_max_block_size = saved

    got = (pa.concat_tables(emitted).to_pandas()
           .sort_values(["window_start", "key", "l_ts", "r_ts"])
           .reset_index(drop=True))
    assert early, "no window closed before both producers finished"
    assert not got.duplicated(["window_start", "key", "l_ts",
                               "r_ts"]).any()

    # batch reference: full cross product per (window, key)
    bl = pd.concat([pq.read_table(f).to_pandas() for f in meta_l["files"]])
    br = pd.concat([pq.read_table(f).to_pandas() for f in meta_r["files"]])
    for b in (bl, br):
        b["w"] = (b["gtid"] // 100) * 100
    exp = (bl[["w", "key", "gtid"]].rename(columns={"gtid": "l_ts"})
           .merge(br[["w", "key", "gtid"]].rename(columns={"gtid": "r_ts"}),
                  on=["w", "key"])
           .rename(columns={"w": "window_start"})
           .sort_values(["window_start", "key", "l_ts", "r_ts"])
           .reset_index(drop=True))
    assert len(got) == len(exp)
    for col in ("window_start", "key", "l_ts", "r_ts"):
        assert got[col].tolist() == exp[col].tolist(), col
    # values rode along correctly (val_col = gtid here)
    assert (got["l_val"].astype(np.int64) == got["l_ts"]).all()
    assert (got["r_val"].astype(np.int64) == got["r_ts"]).all()


def test_dedup_stream_exactly_once_bounded_state(tmp_path):
    """At-least-once tail (shards replayed wholesale) → exactly-once
    delivery: every gtid survives exactly once, equals the distinct
    set, and the seen-state stays bounded by the horizon (eviction)."""
    import threading
    import time

    import pyarrow as pa
    import ray
    import ray.data as rd

    from rookray.source import stream_events
    from rookray.streaming import _DedupState, dedup_stream

    cfg = GenConfig(n_docs=20, n_events=400)
    meta = write_shards(cfg, str(tmp_path / "staged"), n_shards=4)
    live = tmp_path / "live"
    live.mkdir()

    def writer():
        prev = None
        for i, f in enumerate(meta["files"]):
            shutil.copy(f, live / os.path.basename(f))
            if prev is not None:
                # replay the ENTIRE previous shard under a new name —
                # the at-least-once overlap a reconnecting tail produces
                shutil.copy(prev, live / f"events-replay-{i:05d}.parquet")
            prev = f
            time.sleep(0.3)
        (live / "_STREAM_EOF").touch()

    ctx = rd.DataContext.get_current()
    saved = ctx.target_max_block_size
    ctx.target_max_block_size = 64 * 1024
    try:
        threading.Thread(target=writer, daemon=True).start()
        ds = stream_events(str(live), parallelism=2,
                           pattern="events-*.parquet")
        gtids = []
        for out in dedup_stream(ds, id_col="gtid", ts_col="gtid",
                                horizon=10_000, n_sources=2):
            gtids.extend(out.column("gtid").to_pylist())
    finally:
        ctx.target_max_block_size = saved

    assert sorted(gtids) == list(range(1, 401))  # exactly once, complete

    # state bound: ids older than the horizon evict as the watermark
    # advances (direct actor check — deterministic)
    st = _DedupState.remote(horizon=100, n_sources=1)
    for lo in range(0, 10_000, 1000):
        ids = list(range(lo, lo + 1000))
        keep = ray.get(st.filter.remote(ids, ids, lo + 999, "s"))
        assert all(keep)
    stats = ray.get(st.stats.remote())
    assert stats["open_ids"] <= 101, stats  # horizon-bounded, not 10k
    # a duplicate inside the horizon drops; one behind it drops as late
    assert ray.get(st.filter.remote([9_950, 5], [9_950, 5],
                                    9_999, "s")) == [False, False]
    stats = ray.get(st.stats.remote())
    assert stats["dup_dropped"] == 1 and stats["late_dropped"] == 1
    ray.kill(st, no_restart=True)


def test_join_streams_left_outer(tmp_path):
    """how='left': unmatched left rows emit with a null right side at
    window close; matched pairs identical to the inner join."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rookray.source import stream_events
    from rookray.streaming import join_streams

    cfg_l = GenConfig(n_docs=25, n_events=400)
    cfg_r = GenConfig(n_docs=25, n_events=400, noise_pct=30)
    meta_l = write_shards(cfg_l, str(tmp_path / "sl"), n_shards=3)
    meta_r = write_shards(cfg_r, str(tmp_path / "sr"), n_shards=3)
    # pre-staged with EOF: same machinery, no live-timing flakiness
    for d, meta in (("ll", meta_l), ("lr", meta_r)):
        os.makedirs(tmp_path / d)
        for f in meta["files"]:
            shutil.copy(f, tmp_path / d / os.path.basename(f))
        (tmp_path / d / "_STREAM_EOF").touch()

    ds = stream_events([str(tmp_path / "ll"), str(tmp_path / "lr")],
                       parallelism=2, tag_col="side")
    got = []
    for tbl in join_streams(ds, window=100, ts_col="gtid",
                            key_col="key", side_col="side",
                            val_col="gtid", n_sources=4, how="left"):
        got.append(tbl.to_pandas())
    got = (pd.concat(got, ignore_index=True)
           .sort_values(["window_start", "key", "l_ts", "r_ts"])
           .reset_index(drop=True))

    bl = pd.concat([pq.read_table(f).to_pandas() for f in meta_l["files"]])
    br = pd.concat([pq.read_table(f).to_pandas() for f in meta_r["files"]])
    for b in (bl, br):
        b["w"] = (b["gtid"] // 100) * 100
    exp = (bl[["w", "key", "gtid"]].rename(columns={"gtid": "l_ts"})
           .merge(br[["w", "key", "gtid"]].rename(columns={"gtid": "r_ts"}),
                  on=["w", "key"], how="left")
           .sort_values(["w", "key", "l_ts", "r_ts"])
           .reset_index(drop=True))
    assert len(got) == len(exp)
    assert got["l_ts"].tolist() == exp["l_ts"].tolist()
    # null pattern matches the pandas left join exactly
    assert (got["r_ts"].isna().to_numpy()
            == exp["r_ts"].isna().to_numpy()).all()
    gm, em = got[~got["r_ts"].isna()], exp[~exp["r_ts"].isna()]
    assert gm["r_ts"].astype(np.int64).tolist() \
        == em["r_ts"].astype(np.int64).tolist()
    assert got["r_ts"].isna().sum() > 0, "no unmatched left rows — weak test"


def test_topk_stream_matches_batch_rank(tmp_path):
    """Streaming per-window top-k equals the batch count+rank
    recompute, each (window, rank) exactly once."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rookray.source import stream_events
    from rookray.streaming import topk_stream

    cfg = GenConfig(n_docs=15, n_events=400)
    meta = write_shards(cfg, str(tmp_path / "live"), n_shards=4)
    (tmp_path / "live" / "_STREAM_EOF").touch()

    got = []
    for tbl in topk_stream(stream_events(str(tmp_path / "live"),
                                         parallelism=2),
                           window=100, ts_col="gtid", key_col="key",
                           k=3, n_sources=2):
        got.append(tbl.to_pandas())
    got = (pd.concat(got, ignore_index=True)
           .sort_values(["window_start", "rank"]).reset_index(drop=True))
    assert not got.duplicated(["window_start", "rank"]).any()

    batch = pd.concat([pq.read_table(f).to_pandas()
                       for f in meta["files"]])
    batch["w"] = (batch["gtid"] // 100) * 100
    c = (batch.groupby(["w", "key"]).size().rename("n_events")
         .reset_index())
    exp = []
    for w, g in c.groupby("w"):
        top = (g.sort_values(["n_events", "key"],
                             ascending=[False, True],
                             kind="mergesort").head(3).copy())
        top["rank"] = range(1, len(top) + 1)
        exp.append(top)
    exp = (pd.concat(exp, ignore_index=True)
           .rename(columns={"w": "window_start"})
           .sort_values(["window_start", "rank"]).reset_index(drop=True))
    for col in ("window_start", "key", "n_events", "rank"):
        assert got[col].tolist() == exp[col].tolist(), col


def test_hll_stream_windows_match_batch_registers(tmp_path):
    """Per-window streaming HLL registers equal the batch sketch of
    each window, and estimates land within the HLL error band."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from rookray.ops.sketch import hll_estimate, hll_registers
    from rookray.source import stream_events
    from rookray.streaming import hll_stream

    cfg = GenConfig(n_docs=200, n_events=2000)
    meta = write_shards(cfg, str(tmp_path / "live"), n_shards=4)
    (tmp_path / "live" / "_STREAM_EOF").touch()

    got = []
    for tbl in hll_stream(stream_events(str(tmp_path / "live"),
                                        parallelism=2),
                          window=1000, ts_col="gtid", col="key",
                          p=12, n_sources=2):
        got.append(tbl.to_pandas())
    got = (pd.concat(got, ignore_index=True)
           .sort_values(["window_start", "reg_idx"])
           .reset_index(drop=True))
    assert not got.duplicated(["window_start", "reg_idx"]).any()

    batch = pd.concat([pq.read_table(f).to_pandas()
                       for f in meta["files"]])
    batch["w"] = (batch["gtid"] // 1000) * 1000
    for w, g in batch.groupby("w"):
        ds = rd.from_arrow(pa.table({"key": g["key"].to_numpy()}))
        want = (hll_registers(ds, "key", p=12).to_pandas()
                .sort_values("reg_idx").reset_index(drop=True))
        mine = (got[got["window_start"] == w][["reg_idx", "reg"]]
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(mine, want)
        true = g["key"].nunique()
        est = hll_estimate(mine, p=12)
        assert abs(est - true) / true < 0.1, (w, est, true)
