"""Cross-dialect property fuzz of the relay loop: for ANY stream
shape, ANY epoch split, and EVERY egress dialect, the accumulated
relay directory ingested in one pass onto a snapshot-A bootstrap
equals the source head.

One fuzz body drives all eight dialects (debezium, avro, mongo,
dynamo, binlog, pgoutput, maxwell, canal) through their own encoders
and their own real decoders — the strongest cheap check that the
per-dialect coordinate/transaction-identity rules (raw, 1-bit-shifted,
positional, coordinate-preserving) all satisfy the same composition
contract."""

import glob
import os

import pyarrow as pa

from rookray import egress
from rookray.gen import GenConfig, write_shards
from rookray.pipeline import CDCConfig, LakeTable

DIALECTS = ["debezium", "avro", "mongo", "dynamo",
            "binlog", "pgoutput", "maxwell", "canal"]


def _reader(fmt, relay, payload):
    if fmt == "debezium":
        from rookray.wire import read_debezium
        files = sorted(glob.glob(os.path.join(relay, "data-*.jsonl")))
        return read_debezium(files, tx_topic=None, payload=payload)
    if fmt == "avro":
        from rookray.wireavro import read_avro
        files = sorted(glob.glob(os.path.join(relay, "data-*.avrowire")))
        return read_avro(files, os.path.join(relay, "registry.json"),
                         tx_topic=None, payload=payload)
    if fmt == "mongo":
        from rookray.wiremongo import read_mongo
        files = sorted(glob.glob(os.path.join(relay, "mongo-*.jsonl")))
        return read_mongo(files, payload=payload)
    if fmt == "dynamo":
        from rookray.wiredynamo import read_dynamo
        files = sorted(glob.glob(os.path.join(relay, "dynamo-*.jsonl")))
        return read_dynamo(files, payload=payload)
    if fmt == "binlog":
        from rookray.binlog import read_binlog
        files = sorted(glob.glob(os.path.join(relay, "rookray-bin.*")))
        return read_binlog(files, payload=payload)
    if fmt == "pgoutput":
        from rookray.pgoutput import read_pgwal
        files = sorted(glob.glob(os.path.join(relay, "pgwal-*.bin")))
        return read_pgwal(files, payload=payload)
    if fmt == "maxwell":
        from rookray.wirejson import read_maxwell
        files = sorted(glob.glob(os.path.join(relay, "maxwell-*.jsonl")))
        return read_maxwell(files, payload=payload)
    from rookray.wirejson import read_canal
    files = sorted(glob.glob(os.path.join(relay, "canal-*.jsonl")))
    return read_canal(files, payload=payload)


def _payload_state(lake, epoch):
    payload = lake.payload_schema()
    rows = lake.read(as_of=epoch).take_all()
    return pa.Table.from_pylist(
        [{c: r.get(c) for c in payload.names} for r in rows],
        schema=pa.schema(list(payload))).sort_by("doc_id")


def test_all_dialects_relay_fuzz(tmp_path_factory, ray_session):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=5, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(seed=st.integers(0, 2**31 - 1),
           n_docs=st.integers(3, 40),
           n_events=st.integers(40, 300),
           fmt=st.sampled_from(DIALECTS),
           cut=st.floats(0.2, 0.8))
    def run(seed, n_docs, n_events, fmt, cut):
        tmp = tmp_path_factory.mktemp("egr_xfuzz")
        cfg = GenConfig(seed=seed, n_docs=n_docs, n_events=n_events)
        meta = write_shards(cfg, str(tmp / "s"), n_shards=6)
        lake = LakeTable(str(tmp / "lake"), CDCConfig(num_partitions=4))
        k = max(1, min(4, int(6 * cut)))
        e0 = lake.apply(meta["files"][:k + 1])["epoch"]
        e1 = lake.apply(meta["files"][k:k + 2] or
                        meta["files"][k:])["epoch"]
        e2 = lake.apply(meta["files"])["epoch"]

        relay = str(tmp / "relay")
        d1 = egress.export_changefeed(lake, e0, e1, relay, fmt=fmt)
        d2 = egress.export_changefeed(lake, e1, e2, relay, fmt=fmt)
        payload = lake.payload_schema()
        down = LakeTable(str(tmp / "down"), CDCConfig(num_partitions=4))
        down.bootstrap(_payload_state(lake, e0), gtid_watermark=0)
        if d1["events"] or d2["events"]:
            res = down.apply(_reader(fmt, relay, payload).materialize())
            assert res["closed_watermark"] is not None
        got = _payload_state(down, None)
        want = _payload_state(lake, e2)
        assert got.num_rows == want.num_rows, fmt
        for c in payload.names:
            assert got.column(c).to_pylist() \
                == want.column(c).to_pylist(), (fmt, c)

    run()


def test_compaction_interleaved_with_publishing_fuzz(tmp_path_factory,
                                                     ray_session):
    """Log-cleaner property: for ANY stream shape, compaction run at
    ANY point between publishes — including twice, or never — leaves a
    directory whose fresh ingest equals the source head."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from rookray.egress import compact_relay, relay_files
    from rookray.wire import read_debezium

    @settings(max_examples=5, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(seed=st.integers(0, 2**31 - 1),
           n_docs=st.integers(3, 40),
           n_events=st.integers(60, 300),
           compact_after=st.sets(st.integers(0, 3)))
    def run(seed, n_docs, n_events, compact_after):
        tmp = tmp_path_factory.mktemp("cmp_fuzz")
        cfg = GenConfig(seed=seed, n_docs=n_docs, n_events=n_events)
        meta = write_shards(cfg, str(tmp / "s"), n_shards=6)
        lake = LakeTable(str(tmp / "lake"), CDCConfig(num_partitions=4))
        files = meta["files"]
        eps = [lake.apply(files[:k])["epoch"] for k in (2, 3, 4, 5, 6)]

        relay = str(tmp / "relay")
        for i, (a, b) in enumerate(zip(eps, eps[1:])):
            egress.export_changefeed(lake, a, b, relay)
            if i in compact_after:
                compact_relay(relay)

        payload = lake.payload_schema()
        down = LakeTable(str(tmp / "down"), CDCConfig(num_partitions=4))
        down.bootstrap(_payload_state(lake, eps[0]), gtid_watermark=0)
        live = relay_files(relay)
        if live:
            down.apply(read_debezium(live, tx_topic=None,
                                     payload=payload).materialize())
        got = _payload_state(down, None)
        want = _payload_state(lake, eps[-1])
        assert got.num_rows == want.num_rows
        for c in payload.names:
            assert got.column(c).to_pylist() \
                == want.column(c).to_pylist(), c

    run()


def test_snapshot_bootstrap_fuzz(tmp_path_factory, ray_session):
    """Initial-snapshot property: for ANY stream shape, ANY snapshot
    epoch, and EVERY dialect, a COMPLETELY FRESH downstream (no
    lake-side clone or bootstrap) ingesting the snapshot dump plus the
    remaining incremental dumps in one pass equals the source head.
    The positional dialects (binlog/canal) publish snapshot-then-
    incremental in file-number order, the coordinate-preserving and
    shifted-token dialects compose by coordinate."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=6, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(seed=st.integers(0, 2**31 - 1),
           n_docs=st.integers(3, 40),
           n_events=st.integers(40, 300),
           fmt=st.sampled_from(DIALECTS),
           snap_at=st.integers(0, 2))
    def run(seed, n_docs, n_events, fmt, snap_at):
        tmp = tmp_path_factory.mktemp("snap_fuzz")
        cfg = GenConfig(seed=seed, n_docs=n_docs, n_events=n_events)
        meta = write_shards(cfg, str(tmp / "s"), n_shards=6)
        lake = LakeTable(str(tmp / "lake"), CDCConfig(num_partitions=4))
        files = meta["files"]
        eps = [lake.apply(files[:k])["epoch"] for k in (2, 4, 6)]

        relay = str(tmp / "relay")
        egress.export_snapshot(lake, relay, fmt=fmt,
                               epoch=eps[snap_at])
        for a, b in zip(eps[snap_at:], eps[snap_at + 1:]):
            egress.export_changefeed(lake, a, b, relay, fmt=fmt)

        payload = lake.payload_schema()
        down = LakeTable(str(tmp / "down"), CDCConfig(num_partitions=4))
        down.apply(_reader(fmt, relay, payload).materialize())
        got = _payload_state(down, None)
        want = _payload_state(lake, eps[-1])
        assert got.num_rows == want.num_rows, fmt
        for c in payload.names:
            assert got.column(c).to_pylist() \
                == want.column(c).to_pylist(), (fmt, c)

    run()


def test_replicate_chain_fuzz(tmp_path_factory, ray_session):
    """Lake→lake replication property: for ANY stream shape, clone at
    ANY epoch, then replicate the remaining spans in ANY chaining
    (one hop per epoch, or one big span), with a random OVERLAP
    re-replication thrown in — the mirror equals the source head.
    Exercises the 2g/2g+1 transaction-identity split, delete
    coordinates at span watermarks, and watermark-skipped overlaps."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from rookray.egress import clone, replicate

    @settings(max_examples=6, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(seed=st.integers(0, 2**31 - 1),
           n_docs=st.integers(3, 40),
           n_events=st.integers(40, 300),
           clone_at=st.integers(0, 2),
           hop=st.booleans(),
           re_span=st.booleans())
    def run(seed, n_docs, n_events, clone_at, hop, re_span):
        tmp = tmp_path_factory.mktemp("repl_fuzz")
        cfg = GenConfig(seed=seed, n_docs=n_docs, n_events=n_events)
        meta = write_shards(cfg, str(tmp / "s"), n_shards=6)
        lake = LakeTable(str(tmp / "lake"), CDCConfig(num_partitions=4))
        files = meta["files"]
        eps = [lake.apply(files[:k])["epoch"] for k in (2, 4, 6)]

        dst = LakeTable(str(tmp / "mirror"), CDCConfig(num_partitions=4))
        clone(lake, dst, epoch=eps[clone_at])
        spans = list(zip(eps[clone_at:], eps[clone_at + 1:]))
        if not hop and spans:
            spans = [(spans[0][0], spans[-1][1])]
        for a, b in spans:
            replicate(lake, dst, a, b)
        if re_span and spans:
            # overlap re-replication: watermark-skipped, state unchanged
            replicate(lake, dst, *spans[-1])

        got = _payload_state(dst, None)
        want = _payload_state(lake, eps[-1])
        payload = lake.payload_schema()
        assert got.num_rows == want.num_rows
        for c in payload.names:
            assert got.column(c).to_pylist() \
                == want.column(c).to_pylist(), c

    run()
