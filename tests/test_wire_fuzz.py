"""Property-based fuzz of the wire-format adapters: for ANY stream
shape (seed, doc universe, skew, noise, mid-stream schema evolution,
file split), encode → decode through each envelope reproduces the
engine change events exactly (up to each format's documented
degradations: Canal record-atomicity/tx identity, pgoutput/Canal null
server_id).  The deterministic suites pin chosen corners; this pins
the space between them — Ray-free (the serial decode paths), so the
whole fuzz is cheap."""

import os
import tempfile

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from rookray import binlog as B
from rookray import pgoutput as PG
from rookray import wirejson as WJ
from rookray.gen import GenConfig, generate_events
from rookray.wire import _json_table

_CFG = dict(
    seed=st.integers(0, 2**31 - 1),
    n_docs=st.integers(3, 60),
    n_events=st.integers(20, 500),
    noise_pct=st.sampled_from([0, 15]),
    zipf=st.sampled_from([0.0, 1.4]),
    evolve=st.booleans(),
    n_files=st.integers(1, 5),
)


def _gen(seed, n_docs, n_events, noise_pct, zipf, evolve):
    cfg = GenConfig(seed=seed, n_docs=n_docs, n_events=n_events,
                    noise_pct=noise_pct, zipf_a=zipf,
                    evolve_at=(n_events // 2 + 1) if evolve else None)
    ev = generate_events(cfg)
    return cfg, ev, pa.schema(list(ev.schema.field("after").type))


def _cmp(got: pa.Table, orig: pa.Table, cols):
    assert got.num_rows == orig.num_rows
    for c in cols:
        a, b = got.column(c).to_pylist(), orig.column(c).to_pylist()
        assert a == b, (c, next((i, x, y) for i, (x, y)
                                in enumerate(zip(a, b)) if x != y))


@settings(max_examples=12, deadline=None)
@given(**_CFG)
def test_maxwell_roundtrip_any_stream(seed, n_docs, n_events, noise_pct,
                                      zipf, evolve, n_files):
    cfg, ev, payload = _gen(seed, n_docs, n_events, noise_pct, zipf,
                            evolve)
    with tempfile.TemporaryDirectory() as tmp:
        d = WJ.maxwell_dump(ev, tmp, n_files=n_files,
                            ddl_before_gtid=cfg.evolve_at)
        blob = b"".join(open(p, "rb").read() for p in d["files"])
    tbl = _json_table(blob)
    # tx index exactly as read_maxwell's counting pass builds it
    _, _, g, x = WJ._maxwell_coords(tbl)
    m = x >= 0
    idx = WJ.maxwell_tx_index(x[m], g[m])
    got = WJ.decode_maxwell(tbl, payload=payload,
                            tx_index=idx).sort_by("gtid")
    orig = ev.sort_by("gtid")
    assert np.array_equal(np.asarray(got.column("gtid")),
                          (1 << 40) | np.asarray(orig.column("gtid")))
    _cmp(got, orig, ["tx_id", "seq_in_tx", "tx_events", "server_id",
                     "db", "table", "op", "key", "before", "after"])


@settings(max_examples=12, deadline=None)
@given(**_CFG)
def test_canal_roundtrip_any_stream(seed, n_docs, n_events, noise_pct,
                                    zipf, evolve, n_files):
    cfg, ev, payload = _gen(seed, n_docs, n_events, noise_pct, zipf,
                            evolve)
    with tempfile.TemporaryDirectory() as tmp:
        d = WJ.canal_dump(ev, tmp, n_files=n_files,
                          ddl_before_gtid=cfg.evolve_at)
        blob = b"".join(open(p, "rb").read() for p in d["files"])
    got = WJ.decode_canal(_json_table(blob),
                          payload=payload).sort_by("gtid")
    orig = ev.sort_by("gtid")
    _cmp(got, orig, ["db", "table", "op", "key", "before", "after"])
    gt = np.asarray(got.column("gtid"))
    assert np.all(np.diff(gt) > 0)  # stream order preserved
    seq = np.asarray(got.column("seq_in_tx"))
    tx = np.asarray(got.column("tx_id"))
    assert np.array_equal(gt - seq, tx << 12)  # record-atomic coords


@settings(max_examples=12, deadline=None)
@given(**_CFG, streamed=st.booleans())
def test_pgoutput_roundtrip_any_stream(seed, n_docs, n_events, noise_pct,
                                       zipf, evolve, n_files, streamed):
    cfg, ev, payload = _gen(seed, n_docs, n_events, noise_pct, zipf,
                            evolve)
    with tempfile.TemporaryDirectory() as tmp:
        d = PG.pgwal_dump(ev, tmp, n_files=n_files,
                          evolve_gtid=cfg.evolve_at,
                          pre_evolution_columns=4 if cfg.evolve_at
                          else None,
                          stream_txs_over=2 if streamed else None,
                          stream_segment_rows=3)
        parts = [PG.decode_pgwal_file(open(p, "rb").read(), payload)
                 for p in d["files"]]
    got = pa.concat_tables(parts).sort_by("gtid")
    orig = ev.sort_by("gtid")
    assert np.array_equal(np.asarray(got.column("gtid")),
                          np.asarray(orig.column("gtid")))
    _cmp(got, orig, ["tx_id", "seq_in_tx", "tx_events", "db", "table",
                     "op", "key", "before", "after"])


@settings(max_examples=10, deadline=None)
@given(**_CFG, chunk=st.integers(3, 4096))
def test_pgoutput_any_chunking_equals_whole(seed, n_docs, n_events,
                                            noise_pct, zipf, evolve,
                                            n_files, chunk):
    """The incremental parser must be byte-position-agnostic: ANY TCP
    chunking of ANY stream emits the identical table."""
    _, ev, payload = _gen(seed, n_docs, n_events, noise_pct, zipf,
                          evolve)
    with tempfile.TemporaryDirectory() as tmp:
        d = PG.pgwal_dump(ev, tmp, n_files=n_files)
        blob = b"".join(open(p, "rb").read() for p in d["files"])
    whole = PG.decode_pgwal_file(blob, payload)
    pr = PG.PgOutputParser(payload, emit_rows=64)
    outs = []
    for i in range(0, len(blob), chunk):
        t = pr.feed(blob[i:i + chunk])
        if t is not None:
            outs.append(t)
    t = pr.finish()
    if t is not None:
        outs.append(t)
    assert pa.concat_tables(outs).equals(whole)


@settings(max_examples=10, deadline=None)
@given(**_CFG, chunk=st.integers(3, 4096))
def test_binlog_any_chunking_equals_whole(seed, n_docs, n_events,
                                          noise_pct, zipf, evolve,
                                          n_files, chunk):
    """Same property for the MySQL binary-log parser across rotated
    files fed as one unaligned byte stream."""
    cfg, ev, payload = _gen(seed, n_docs, n_events, noise_pct, zipf,
                            evolve)
    with tempfile.TemporaryDirectory() as tmp:
        d = B.binlog_dump(ev, tmp, n_files=n_files,
                          evolve_gtid=cfg.evolve_at,
                          pre_evolution_columns=4 if cfg.evolve_at
                          else None)
        blobs = [open(p, "rb").read() for p in d["files"]]
        whole = pa.concat_tables(
            [B.decode_binlog_file(bb, p, payload=payload)
             for bb, p in zip(blobs, d["files"])])
        stream = b"".join(blobs)
        first = os.path.basename(d["files"][0])
    parser = B.BinlogParser(first, payload=payload)
    outs = []
    for i in range(0, len(stream), chunk):
        t = parser.feed(stream[i:i + chunk])
        if t is not None:
            outs.append(t)
    t = parser.finish()
    if t is not None:
        outs.append(t)
    assert pa.concat_tables(outs).equals(whole)
