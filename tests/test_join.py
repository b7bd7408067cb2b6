"""Distributed join stages (rookray.ops.join) — the reusable join the
engine lacked in round 1 (every join was hand-rolled per query)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from rookray.ops.join import broadcast_join, bucketed_join


def _left():
    return ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "v": pa.array([10, 20, 30, 40, 50], pa.int64()),
    }))


def _right():
    return ray.data.from_arrow(pa.table({
        "k": pa.array([2, 4, 6], pa.int64()),
        "w": pa.array(["b", "d", "f"], pa.string()),
    }))


def test_bucketed_inner_join():
    out = bucketed_join(_left(), _right(), on="k", buckets=8).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == [2, 4]
    assert out["v"].tolist() == [20, 40]
    assert out["w"].tolist() == ["b", "d"]
    assert out["v"].dtype.kind == "i"


def test_bucketed_left_and_semi_join():
    left = _left()
    lj = (bucketed_join(left, _right(), on="k", how="left", buckets=8)
          .to_pandas().sort_values("k").reset_index(drop=True))
    assert lj["k"].tolist() == [1, 2, 3, 4, 5]
    assert lj["w"].tolist() == [None, "b", None, "d", None]
    sj = (bucketed_join(left, _right(), on="k", how="semi", buckets=8)
          .to_pandas().sort_values("k").reset_index(drop=True))
    assert sj["k"].tolist() == [2, 4]
    assert list(sj.columns) == ["k", "v"]


def test_bucketed_join_list_payload():
    """List-typed payload columns survive (the case Ray's native Acero
    join rejects)."""
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 3], pa.int64()),
        "toks": pa.array([[1, 2], [3, 4, 5]], pa.list_(pa.int64())),
    }))
    out = (bucketed_join(_left(), right, on="k", buckets=8)
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert [list(t) for t in out["toks"]] == [[1, 2], [3, 4, 5]]


def test_bucketed_join_string_key():
    left = ray.data.from_arrow(pa.table({
        "name": pa.array(["a", "b", "c"], pa.string()),
        "v": pa.array([1, 2, 3], pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "name": pa.array(["b", "c", "d"], pa.string()),
        "w": pa.array([20, 30, 40], pa.int64())}))
    out = (bucketed_join(left, right, on="name", buckets=4)
           .to_pandas().sort_values("name").reset_index(drop=True))
    assert out["name"].tolist() == ["b", "c"]
    assert out["w"].tolist() == [20, 30]


def test_bucketed_join_collision_raises():
    with pytest.raises(ValueError, match="collision"):
        bucketed_join(_left(), _left(), on="k")


def test_broadcast_join_modes():
    small = pd.DataFrame({"k": [2, 4], "w": ["b", "d"]})
    inner = (broadcast_join(_left(), small, on="k")
             .to_pandas().sort_values("k").reset_index(drop=True))
    assert inner["w"].tolist() == ["b", "d"]
    semi = (broadcast_join(_left(), small[["k"]], on="k", how="semi")
            .to_pandas().sort_values("k").reset_index(drop=True))
    assert semi["k"].tolist() == [2, 4] and "w" not in semi.columns


def test_asof_join_backward_ties_and_nulls():
    """Backward as-of: max right_on <= on per key, equal-time ties to
    the largest tie_col, unmatched left rows keep typed-null payload."""
    from rookray.ops.join import asof_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 2, 3], pa.int64()),
        "t": pa.array([5, 10, 20, 7, 4], pa.int64()),
        "eid": pa.array([100, 101, 102, 103, 104], pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "rt": pa.array([4, 10, 10, 15, 9], pa.int64()),
        "oid": pa.array([7, 8, 9, 6, 5], pa.int64()),
    }))
    out = (asof_join(left, right, by="k", on="t", right_by="rk",
                     right_on="rt", tie_col="oid", buckets=8)
           .to_pandas().sort_values("eid").reset_index(drop=True))
    # eid=100 (t=5): only rt=4 qualifies -> oid 7
    # eid=101 (t=10): rt in {4,10,10}; max rt=10, tie oid max(8,9)=9
    # eid=102 (t=20): max rt=15 -> oid 6
    # eid=103 (k=2,t=7): right rt=9 > 7 -> no match (null)
    # eid=104 (k=3): no right rows -> null
    assert out["eid"].tolist() == [100, 101, 102, 103, 104]
    got = [None if pd.isna(x) else int(x) for x in out["oid"]]
    assert got == [7, 9, 6, None, None]
    # left row count preserved exactly (left-join semantics)
    assert len(out) == 5


def test_asof_join_many_buckets_matches_single_bucket():
    """Result is bucket-count invariant (pure co-partitioning)."""
    from rookray.ops.join import asof_join

    rng = np.random.default_rng(7)
    lk = rng.integers(0, 20, 200)
    lt = rng.integers(0, 1000, 200)
    rk = rng.integers(0, 20, 300)
    rt = rng.integers(0, 1000, 300)
    left = ray.data.from_arrow(pa.table({
        "k": pa.array(lk, pa.int64()), "t": pa.array(lt, pa.int64()),
        "eid": pa.array(np.arange(200), pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array(rk, pa.int64()), "rt": pa.array(rt, pa.int64()),
        "oid": pa.array(np.arange(300), pa.int64())}))

    def run(buckets):
        return (asof_join(left, right, by="k", on="t", right_by="rk",
                          right_on="rt", tie_col="oid", buckets=buckets)
                .to_pandas().sort_values("eid").reset_index(drop=True))

    a, b = run(1), run(32)
    assert a["oid"].fillna(-1).tolist() == b["oid"].fillna(-1).tolist()


def test_range_join_inner_matches_reference():
    """Every (point, interval) containment pair exactly once, including
    intervals spanning many bins and duplicate interval replicas."""
    from rookray.ops.join import range_join

    rng = np.random.default_rng(11)
    p = rng.integers(0, 500, 120)
    lo = rng.integers(0, 480, 40)
    ln = rng.integers(0, 200, 40)  # some intervals span many 32-bins
    hi = lo + ln
    left = ray.data.from_arrow(pa.table({
        "pid": pa.array(np.arange(120), pa.int64()),
        "p": pa.array(p, pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "iid": pa.array(np.arange(40), pa.int64()),
        "lo": pa.array(lo, pa.int64()), "hi": pa.array(hi, pa.int64())}))
    out = (range_join(left, right, point="p", lo="lo", hi="hi",
                      bin_width=32).to_pandas()
           .sort_values(["pid", "iid"]).reset_index(drop=True))
    exp = sorted((int(i), int(j)) for i in range(120) for j in range(40)
                 if lo[j] <= p[i] <= hi[j])
    assert list(zip(out["pid"], out["iid"])) == exp
    # bin-width invariance
    out2 = (range_join(left, right, point="p", lo="lo", hi="hi",
                       bin_width=7).to_pandas()
            .sort_values(["pid", "iid"]).reset_index(drop=True))
    assert list(zip(out2["pid"], out2["iid"])) == exp


def test_range_join_left_nulls_and_guard():
    from rookray.ops.join import range_join

    left = ray.data.from_arrow(pa.table({
        "pid": pa.array([0, 1, 2], pa.int64()),
        "p": pa.array([5, 50, 500], pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "iid": pa.array([10], pa.int64()),
        "lo": pa.array([40], pa.int64()), "hi": pa.array([60], pa.int64())}))
    out = (range_join(left, right, point="p", lo="lo", hi="hi",
                      bin_width=16, how="left").to_pandas()
           .sort_values("pid").reset_index(drop=True))
    assert out["pid"].tolist() == [0, 1, 2]
    got = [None if pd.isna(x) else int(x) for x in out["iid"]]
    assert got == [None, 10, None]

    with pytest.raises(Exception, match="max_bin_pairs"):
        range_join(left, right, point="p", lo="lo", hi="hi",
                   bin_width=16, max_bin_pairs=0).to_pandas()


def test_bucketed_join_salt_invariance():
    """Salted joins (hot-key spreading) return exactly the unsalted
    result for inner/left/semi — each (l, r) pair meets exactly once."""
    rng = np.random.default_rng(5)
    # Zipf-hot: half the left rows share one key
    lk = np.where(rng.random(400) < 0.5, 7, rng.integers(0, 50, 400))
    rk = rng.integers(0, 50, 120)
    left = ray.data.from_arrow(pa.table({
        "k": pa.array(lk, pa.int64()),
        "lid": pa.array(np.arange(400), pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(rk, pa.int64()),
        "rid": pa.array(np.arange(120), pa.int64())}))

    for how in ("inner", "left", "semi", "anti"):
        base = (bucketed_join(left, right, on="k", how=how, buckets=16)
                .to_pandas())
        salted = (bucketed_join(left, right, on="k", how=how, buckets=16,
                                salt=4).to_pandas())
        cols = [c for c in base.columns]
        a = base.sort_values(cols).reset_index(drop=True)
        b = salted.sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_like=True)


def test_bucketed_anti_join():
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array(list("abcd"))}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([2, 4, 9], pa.int64()),
        "w": pa.array([10, 20, 30], pa.int64())}))
    out = (bucketed_join(left, right, on="k", how="anti", buckets=4)
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["k"].tolist() == [1, 3]
    assert out["v"].tolist() == ["a", "c"]
    assert list(out.columns) == ["k", "v"]  # right payload dropped
