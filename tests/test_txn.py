"""Watermark math: the footer-statistics fast path must agree with the
scanning path on every epoch shape (full, mid-tx cut, resumed, gapped)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from rookray.gen import GenConfig, generate_events, write_shards
from rookray import txn


@pytest.fixture(scope="module")
def stream(tmp_path_factory):
    d = tmp_path_factory.mktemp("txs")
    cfg = GenConfig(n_docs=40, n_events=1000)
    meta = write_shards(cfg, str(d), n_shards=8)
    return cfg, meta


def scan_wm(paths, floor):
    ds = ray.data.read_parquet(list(paths),
                               columns=["gtid", "tx_id", "seq_in_tx", "tx_events"])
    return txn.closed_watermark(ds, floor)


@pytest.mark.parametrize("pick,floor", [
    (slice(0, 8), -1),       # full stream, fresh
    (slice(0, 4), -1),       # head half (tail tx likely cut)
    (slice(4, 8), 500),      # resumed tail with correct floor
    (slice(2, 8), 250),      # resumed with overlap
    (slice(0, 8), 400),      # duplicate replay over a floor
])
def test_fast_path_matches_scan(stream, pick, floor):
    _, meta = stream
    paths = meta["files"][pick]
    fast = txn.closed_watermark_from_stats(paths, floor)
    assert fast is not None
    assert fast == scan_wm(paths, floor)


def test_fast_path_fresh_midstream_holds_back(stream):
    """floor=-1 with mid-stream shards whose head tx is cut: both paths
    hold the epoch back (watermark below the first present gtid)."""
    _, meta = stream
    paths = meta["files"][4:]
    fast = txn.closed_watermark_from_stats(paths, -1)
    slow = scan_wm(paths, -1)
    first_gtid = txn.closed_watermark_from_stats(paths[:1], -1)
    # both must not advance past anything (or agree exactly)
    assert fast[1] == slow[1]
    assert fast[0] <= slow[0]  # fast path may be more conservative only


def test_fast_path_gap_detected(stream, tmp_path):
    """A cross-shard coverage gap makes the fast path PUNT (None →
    scanning fallback): footer stats cannot distinguish a coordinate
    that never existed (sparse stream) from a missing shard carrying a
    transaction's tail, and treating the gap as unreached under-closes
    a sparse stream forever."""
    _, meta = stream
    paths = [meta["files"][0], meta["files"][2]]  # shard 1 missing
    assert txn.closed_watermark_from_stats(paths, -1) is None
    # the scanning path decides per-tx: a tx-aligned cut closes past
    # the gap, a mid-tx cut holds back just that tx
    slow = scan_wm(paths, -1)
    assert slow[0] >= -1


def test_fast_path_sparse_singletons_fall_back_and_scan_closes(tmp_path):
    """Regression (found by the relay-compaction fuzz): a SPARSE
    singleton-tx stream spilled across several individually-dense
    shards — e.g. coordinates [34], [36, 37] — must not wedge at the
    phantom gap.  The fast path punts; the scanning path closes at the
    max coordinate."""
    import ray.data

    def shard(path, gtids):
        n = len(gtids)
        pq.write_table(pa.table({
            "gtid": pa.array(gtids, pa.int64()),
            "tx_id": pa.array(gtids, pa.int64()),
            "seq_in_tx": pa.array([0] * n, pa.int32()),
            "tx_events": pa.array([1] * n, pa.int32()),
        }), path)

    p1, p2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    shard(p1, [34])
    shard(p2, [36, 37])
    assert txn.closed_watermark_from_stats([p1, p2], -1) is None
    wm, mx = scan_wm([p1, p2], -1)
    assert (wm, mx) == (37, 37)


def test_fast_path_falls_back_on_non_dense(tmp_path):
    """Shards with gtid holes are rejected (→ caller uses scan path)."""
    cfg = GenConfig(n_docs=10, n_events=100)
    tbl = generate_events(cfg)
    holey = tbl.filter(pa.compute.not_equal(tbl.column("gtid"), pa.scalar(50)))
    p = str(tmp_path / "holey.parquet")
    pq.write_table(holey, p)
    assert txn.closed_watermark_from_stats([p], -1) is None


def test_mid_tx_cut_agreement(tmp_path):
    cfg = GenConfig(n_docs=20, n_events=300)
    tbl = generate_events(cfg)
    cut = next(i for i in range(200, 300)
               if tbl.column("seq_in_tx")[i].as_py() > 0)
    p1, p2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(tbl.slice(0, cut), p1)
    pq.write_table(tbl.slice(cut), p2)
    fast = txn.closed_watermark_from_stats([p1], -1)
    slow = scan_wm([p1], -1)
    assert fast == slow
    open_first = tbl.column("gtid")[cut].as_py() - tbl.column("seq_in_tx")[cut].as_py()
    assert fast[0] == open_first - 1


def test_sparse_coordinates_split_across_blocks():
    """Real binlog/pgoutput gtids are byte offsets — NOT dense within a
    transaction.  Completeness must hold even when Ray re-batching
    splits a transaction across combiner batches (regression: the old
    coordinate arithmetic assumed dense gtids and wedged the watermark
    below any split sparse-coordinate tx forever)."""
    rng = np.random.default_rng(11)
    rows = []
    lsn = 100
    for tx in range(40):
        # tx 0 needs >= 2 rows for the suffix-resume case below
        n = int(rng.integers(2 if tx == 0 else 1, 8))
        for seq in range(n):
            rows.append((lsn, tx, seq, n))
            lsn += int(rng.integers(2, 90))  # sparse, like WAL offsets
    t = pa.table({
        "gtid": pa.array([r[0] for r in rows], pa.int64()),
        "tx_id": pa.array([r[1] for r in rows], pa.int64()),
        "seq_in_tx": pa.array([r[2] for r in rows], pa.int32()),
        "tx_events": pa.array([r[3] for r in rows], pa.int32()),
    })
    mx = rows[-1][0]
    # many tiny blocks → txs split across combiner batches
    ds = ray.data.from_arrow(t).repartition(37)
    assert txn.closed_watermark(ds) == (mx, mx)
    assert txn.closed_watermark_table(t) == (mx, mx)

    # torn tail: drop the last tx's final row → wm backs to just below
    # that tx's first gtid, exactly as with dense coordinates
    torn = t.slice(0, len(t) - 1)
    last_tx = rows[-1][1]
    tx_first = min(g for g, x, _, _ in rows if x == last_tx)
    wm, m = txn.closed_watermark_table(torn)
    assert wm == tx_first - 1 and m == rows[-2][0]

    # resumed suffix above a floor: sparse coordinates make a detached
    # suffix unknowable → held back (conservative), while a floor that
    # provably covers the prefix (min_gtid - 1 <= floor) commits it
    tx0_rows = [r for r in rows if r[1] == 0]
    suffix = t.slice(1)  # drop tx 0's first row
    floor = tx0_rows[1][0] - 1  # immediately below the suffix head
    wm, _ = txn.closed_watermark_table(suffix, floor=floor)
    assert wm == mx  # prefix provably committed → complete
    low_floor = tx0_rows[0][0]  # head row gtid — gap above it unknowable
    wm2, _ = txn.closed_watermark_table(suffix, floor=low_floor)
    assert wm2 == tx0_rows[1][0] - 1  # held at the open tx


def test_footer_spans_regimes_agree(tmp_path):
    """The serial, threaded, and Ray-chunked footer-probe regimes must
    return identical spans in input order (the watermark math consumes
    them positionally)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from rookray import txn

    files = []
    lo = 1
    for i, n in enumerate([5, 3, 7]):
        t = pa.table({
            "gtid": pa.array(range(lo, lo + n), pa.int64()),
            "seq_in_tx": pa.array([0] * n, pa.int64()),
            "tx_events": pa.array([1] * n, pa.int64()),
        })
        p = str(tmp_path / f"s{i}.parquet")
        pq.write_table(t, p)
        files.append(p)
        lo += n
    serial = [txn._shard_span(p) for p in files]
    assert serial == [(1, 5), (6, 8), (9, 15)]
    # <=512 paths -> serial regime
    assert txn._footer_spans(files) == serial
    # 513..4096 -> thread regime (same values, same order)
    many = files * 200  # 600 paths
    assert txn._footer_spans(many) == serial * 200
    # >4096 with Ray up -> chunked-task regime
    huge = files * 1400  # 4200 paths
    assert txn._footer_spans(huge) == serial * 1400
