"""Z-order clustering + min/max data skipping."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data

from rookray.ops.zorder import prune_files, zorder_scan, zorder_write

SF = os.environ.get("GRAFT_SF_DIR_TESTS", "/root/testdata/sf0.001")


def _orders():
    return ray.data.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"])


def test_zorder_scan_exact_and_lossless(tmp_path):
    out = str(tmp_path / "z")
    r = zorder_write(_orders(), ["o_custkey", "o_totalprice"], out,
                     num_files=8)
    raw = pd.read_parquet(f"{SF}/orders.parquet",
                          columns=["o_orderkey", "o_custkey",
                                   "o_totalprice"])
    assert r["rows"] == len(raw)

    # unbounded scan = the whole table (clustering is lossless)
    full = zorder_scan(out, {"o_custkey": (-1e18, 1e18)}).to_pandas()
    assert sorted(full["o_orderkey"]) == sorted(raw["o_orderkey"])

    # 2D range scan equals the pandas reference exactly
    ranges = {"o_custkey": (20, 60), "o_totalprice": (50_000.0, 200_000.0)}
    got = (zorder_scan(out, ranges).to_pandas()
           .sort_values("o_orderkey").reset_index(drop=True))
    m = ((raw["o_custkey"] >= 20) & (raw["o_custkey"] <= 60)
         & (raw["o_totalprice"] >= 50_000) & (raw["o_totalprice"] <= 200_000))
    exp = (raw[m].sort_values("o_orderkey").reset_index(drop=True)
           [got.columns.tolist()])
    pd.testing.assert_frame_equal(got, exp)


def test_zorder_pruning_effective_on_both_dims(tmp_path):
    """The curve must make SELECTIVE ranges on EITHER column prune
    files — that's the whole point over a single-column sort."""
    out = str(tmp_path / "z")
    zorder_write(_orders(), ["o_custkey", "o_totalprice"], out,
                 num_files=8)
    kept_a, total = prune_files(out, {"o_custkey": (0, 15)})
    kept_b, _ = prune_files(out, {"o_totalprice": (0.0, 60_000.0)})
    assert total == 8
    assert len(kept_a) < total, "custkey range pruned nothing"
    assert len(kept_b) < total, "totalprice range pruned nothing"
    # conjunctive range prunes at least as hard as either alone
    kept_ab, _ = prune_files(out, {"o_custkey": (0, 15),
                                   "o_totalprice": (0.0, 60_000.0)})
    assert len(kept_ab) <= min(len(kept_a), len(kept_b))


def test_zorder_write_streams_and_scales_file_count(tmp_path):
    """Scale shape (round-4): the write must never materialize the
    whole dataset, and file count must grow with input bytes (one
    bounded write task per output file) instead of being pinned to
    ``num_files``."""
    import inspect

    import pyarrow as pa

    from rookray.ops import zorder as zmod

    src = inspect.getsource(zmod.zorder_write)
    assert ".materialize(" not in src, \
        "zorder_write must stream, not materialize the input"

    rng = np.random.default_rng(7)
    n = 40_000
    t = pa.table({"a": rng.integers(0, 1_000_000, n),
                  "b": rng.random(n),
                  "pad": [f"row-{i:07d}" * 4 for i in range(n)]})
    out = str(tmp_path / "z")
    r = zorder_write(ray.data.from_arrow(t).repartition(8), ["a", "b"],
                     out, num_files=4, target_file_bytes=64 * 1024)
    assert r["rows"] == n
    assert r["files"] > 16, f"expected byte-scaled file count, got {r}"
    assert len(glob.glob(os.path.join(out, "z-*.parquet"))) == r["files"]
    # scan is still lossless after the range exchange
    got = zorder_scan(out, {"a": (-1, 2_000_000)}).to_pandas()
    assert len(got) == n


def test_zorder_degenerate_constant_column(tmp_path):
    import pyarrow as pa

    t = pa.table({"k": [1, 1, 1, 1], "v": [1.0, 2.0, 3.0, 4.0]})
    out = str(tmp_path / "z")
    zorder_write(ray.data.from_arrow(t), ["k", "v"], out, num_files=2)
    got = zorder_scan(out, {"v": (2.0, 3.0)}).to_pandas()
    assert sorted(got["v"]) == [2.0, 3.0]
