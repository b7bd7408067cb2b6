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
@given(**_CFG)
def test_mongo_roundtrip_any_stream(seed, n_docs, n_events, noise_pct,
                                    zipf, evolve, n_files):
    """Change-stream envelope: singleton transactions by contract,
    null server_id, replace ≡ update, key-only before images where the
    dump's deterministic pre-image knob (gtid % 5 == 0) withheld them."""
    from rookray import wiremongo as WM
    from rookray.schema import OP_INSERT

    cfg, ev, payload = _gen(seed, n_docs, n_events, noise_pct, zipf,
                            evolve)
    with tempfile.TemporaryDirectory() as tmp:
        d = WM.mongo_dump(ev, tmp, n_files=n_files)
        blob = b"".join(open(p, "rb").read() for p in d["files"])
    got = WM.decode_mongo(_json_table(blob),
                          payload=payload).sort_by("gtid")
    orig = ev.sort_by("gtid")
    _cmp(got, orig, ["gtid", "db", "table", "op", "key", "after"])
    assert got.column("tx_id").to_pylist() == got.column("gtid").to_pylist()
    assert got.column("server_id").null_count == got.num_rows
    kf = payload.names[0]
    for g, op, b_got, b_orig, k in zip(got.column("gtid").to_pylist(),
                                       got.column("op").to_pylist(),
                                       got.column("before").to_pylist(),
                                       orig.column("before").to_pylist(),
                                       got.column("key").to_pylist()):
        if op == OP_INSERT:
            assert b_got is None
        elif g % 5 == 0:
            assert b_got == {n: (k if n == kf else None)
                             for n in payload.names}
        else:
            assert b_got == b_orig


@settings(max_examples=12, deadline=None)
@given(**_CFG, view=st.sampled_from(["NEW_AND_OLD_IMAGES", "NEW_IMAGE"]))
def test_dynamo_roundtrip_any_stream(seed, n_docs, n_events, noise_pct,
                                     zipf, evolve, n_files, view):
    """DynamoDB Streams envelope: singleton transactions by contract,
    null db/server_id, table from the ARN, typed AttributeValue
    unwrap, 21-digit SequenceNumbers rebased against the probed base;
    NEW_IMAGE dumps degrade before images to key-only."""
    from rookray import wiredynamo as WD
    from rookray.schema import OP_INSERT

    cfg, ev, payload = _gen(seed, n_docs, n_events, noise_pct, zipf,
                            evolve)
    with tempfile.TemporaryDirectory() as tmp:
        d = WD.dynamo_dump(ev, tmp, n_files=n_files, view_type=view)
        files = d["files"]
        base = WD.dynamo_sequence_base(files)
        blob = b"".join(open(p, "rb").read() for p in files)
    assert base == 10 ** 20
    got = WD.decode_dynamo(_json_table(blob), payload=payload,
                           base_high=base // 10 ** 18).sort_by("gtid")
    orig = ev.sort_by("gtid")
    _cmp(got, orig, ["gtid", "table", "op", "key", "after"])
    assert got.column("tx_id").to_pylist() == got.column("gtid").to_pylist()
    assert got.column("server_id").null_count == got.num_rows
    assert got.column("db").null_count == got.num_rows
    kf = payload.names[0]
    for op, b_got, b_orig, k in zip(got.column("op").to_pylist(),
                                    got.column("before").to_pylist(),
                                    orig.column("before").to_pylist(),
                                    got.column("key").to_pylist()):
        if op == OP_INSERT:
            assert b_got is None
        elif view == "NEW_IMAGE":
            assert b_got == {n: (k if n == kf else None)
                             for n in payload.names}
        else:
            assert b_got == b_orig


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


# ------------------------------------------------------ Confluent Avro

from rookray import wireavro as WA  # noqa: E402


@settings(max_examples=10, deadline=None)
@given(**_CFG)
def test_avro_vec_equals_record_walk_any_stream(seed, n_docs, n_events,
                                                noise_pct, zipf, evolve,
                                                n_files):
    """For ANY stream shape the column-synchronous decoder
    (decode_file_table) is byte-identical to the per-record closure
    walk on every dump file — including mid-dump schema-id switches."""
    cfg, ev, payload = _gen(seed, n_docs, n_events, noise_pct, zipf,
                            evolve)
    with tempfile.TemporaryDirectory() as tmp:
        d = WA.avro_dump(ev, tmp, n_files=n_files,
                         evolve_gtid=cfg.evolve_at)
        reg = WA._Registry.load(d["registry"])
        for p in d["data_files"]:
            data = open(p, "rb").read()
            vec = reg.decode_file_table(data, payload)
            ref = WA.envelopes_to_table(reg.decode_file(data), payload)
            assert vec.equals(ref), p
        assert all(v is not None for v in reg._vec.values())


def _nat_arrow(s):
    """Natural Arrow type of an Avro schema within the vectorized
    subset — the library's `_arrow_of` plus the record case (which
    only payload-level schemas need, so the library never maps it)."""
    if isinstance(s, list):
        inner = next(b for b in s if b != "null")
        return _nat_arrow(inner)
    if isinstance(s, dict) and s["type"] == "record":
        return pa.struct([(f["name"], _nat_arrow(f["type"]))
                          for f in s["fields"]])
    return WA._arrow_of(s)


_PRIM_VALS = {
    "long": st.integers(-(2**63), 2**63 - 1),
    "int": st.integers(-(2**31), 2**31 - 1),
    "string": st.text(max_size=24),
    "bytes": st.binary(max_size=24),
    "boolean": st.booleans(),
    "double": st.floats(allow_nan=False, width=64),
    "float": st.floats(allow_nan=False, width=32),
}


def _type_and_value(depth: int):
    """Strategy yielding (avro schema node, value strategy) pairs
    within the vectorized subset."""
    prim = st.sampled_from(sorted(_PRIM_VALS))
    base = prim.map(lambda t: (t, _PRIM_VALS[t]))
    arr = st.sampled_from(["int", "long"]).map(
        lambda it: ({"type": "array", "items": it},
                    st.lists(_PRIM_VALS[it], max_size=8)))
    opts = [base, arr]
    if depth > 0:
        opts.append(_record_schema(depth - 1, prefix="N"))
    node = st.one_of(*opts)
    # wrap in a null-union half the time
    return st.tuples(node, st.booleans()).map(
        lambda tv: ((["null", tv[0][0]], st.none() | tv[0][1])
                    if tv[1] else tv[0]))


_REC_IDS = [0]


def _record_schema(depth: int, prefix: str = "R"):
    def build(fields):
        _REC_IDS[0] += 1
        sch = {"type": "record", "name": f"{prefix}{_REC_IDS[0]}",
               "fields": [{"name": f"f{i}", "type": t}
                          for i, (t, _) in enumerate(fields)]}
        vals = st.fixed_dictionaries(
            {f"f{i}": v for i, (_, v) in enumerate(fields)})
        return (sch, vals)

    return st.lists(_type_and_value(depth), min_size=1,
                    max_size=5).map(build)


@settings(max_examples=30, deadline=None)
@given(sv=_record_schema(1), data=st.data())
def test_avro_vec_random_schema_values(sv, data):
    """Random schemas within the vectorized subset (primitives,
    null-unions, int/long arrays, nested records) with random values:
    `_VecDecoder` must reproduce exactly what `_Codec` encoded."""
    sch, val_st = sv
    records = data.draw(st.lists(val_st, min_size=1, max_size=12))
    codec = WA._Codec(sch)
    bodies = [codec.encode(r) for r in records]
    blob = b"".join(bodies)
    w = np.frombuffer(blob, dtype=np.uint8)
    starts, p = [], 0
    for b in bodies:
        starts.append(p)
        p += len(b)
    target = _nat_arrow(sch)
    vec = WA._VecDecoder(sch, target)
    arr, fin = vec.decode(w, np.asarray(starts, dtype=np.int64))
    ends = np.asarray(starts[1:] + [len(blob)], dtype=np.int64)
    assert np.array_equal(fin, ends)
    want = pa.array(records, type=target)
    assert arr.equals(want), (sch, records)


def test_avro_vec_multiblock_and_bytesize_arrays():
    """The vectorized array walk must honor multi-block encodings and
    the negative-count byte-size form a spec-compliant writer may emit
    (the library encoder always writes one positive block)."""
    sch = {"type": "record", "name": "T", "fields": [
        {"name": "arr", "type": {"type": "array", "items": "long"}}]}
    vals = [[1, -2, 300], [], [7, 8, 9, 10], [2**40]]

    def enc_multiblock(items):
        buf = bytearray()
        half = len(items) // 2
        for blk, neg in ((items[:half], False), (items[half:], True)):
            if not blk:
                continue
            inner = bytearray()
            for x in blk:
                WA._zz_write(inner, x)
            if neg:
                WA._zz_write(buf, -len(blk))
                WA._zz_write(buf, len(inner))
            else:
                WA._zz_write(buf, len(blk))
            buf.extend(inner)
        buf.append(0)
        return bytes(buf)

    bodies = [enc_multiblock(v) for v in vals]
    blob = b"".join(bodies)
    starts, p = [], 0
    for b in bodies:
        starts.append(p)
        p += len(b)
    vec = WA._VecDecoder(sch, _nat_arrow(sch))
    arr, fin = vec.decode(np.frombuffer(blob, dtype=np.uint8),
                          np.asarray(starts, dtype=np.int64))
    assert fin.tolist() == (starts[1:] + [len(blob)])
    assert arr.to_pylist() == [{"arr": v} for v in vals]
