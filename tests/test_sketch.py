"""Sketches: HLL register/estimate properties, Count-Min heavy-hitter
exactness (candidates are a superset; verification makes the output
exact), and the loud candidate-budget guard."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from rookray.ops.sketch import (cm_counters, cm_heavy_hitters,
                                hll_estimate, hll_registers)


def _string_ds(values, parallelism=4):
    return ray.data.from_arrow(
        pa.table({"v": pa.array(values, pa.string())})
    ).repartition(parallelism)


def test_hll_estimate_within_error_bound():
    rng = np.random.default_rng(7)
    n_distinct = 20_000
    vals = [f"key-{i}" for i in rng.integers(0, n_distinct, size=60_000)]
    true = len(set(vals))
    regs = pd.DataFrame(hll_registers(_string_ds(vals), "v", p=12).take_all())
    est = hll_estimate(regs, p=12)
    # standard error for p=12 is 1.04/sqrt(4096) ≈ 1.6%; allow 3σ
    assert abs(est - true) / true < 0.05
    # registers are max-merged: re-running over a different partitioning
    # gives identical registers
    regs2 = pd.DataFrame(
        hll_registers(_string_ds(vals, parallelism=11), "v", p=12).take_all())
    pd.testing.assert_frame_equal(
        regs.sort_values("reg_idx").reset_index(drop=True).astype(np.int64),
        regs2.sort_values("reg_idx").reset_index(drop=True).astype(np.int64))


def test_hll_small_range_linear_counting():
    vals = [f"u{i}" for i in range(100)]
    regs = pd.DataFrame(hll_registers(_string_ds(vals), "v", p=12).take_all())
    est = hll_estimate(regs, p=12)
    assert abs(est - 100) / 100 < 0.05


def test_hll_rejects_small_p():
    with pytest.raises(ValueError, match="outside"):
        hll_registers(_string_ds(["a"]), "v", p=8)


def test_cm_counters_total_mass():
    vals = ["a"] * 10 + ["b"] * 5 + ["c"] * 1
    rows = cm_counters(_string_ds(vals), "v", width=64, depth=2).take_all()
    df = pd.DataFrame(rows)
    # every row of the sketch preserves total mass
    for j in (0, 1):
        assert df.loc[df["j"] == j, "cnt"].sum() == 16


def test_cm_heavy_hitters_exact_vs_bruteforce():
    rng = np.random.default_rng(3)
    # zipf-ish: a few very hot keys over a long uniform tail
    hot = [f"hot{i}" for i in range(5) for _ in range(500 + 100 * i)]
    tail = [f"t{i}" for i in rng.integers(0, 5000, size=20_000)]
    vals = hot + tail
    rng.shuffle(vals)
    ds = _string_ds(vals, parallelism=8)
    got = cm_heavy_hitters(ds, "v", threshold=300, width=256, depth=2)
    expect = (pd.Series(vals).value_counts().rename_axis("value")
              .reset_index(name="cnt"))
    expect = (expect[expect["cnt"] >= 300].sort_values("value")
              .reset_index(drop=True).astype({"cnt": np.int64}))
    pd.testing.assert_frame_equal(got, expect)


def test_cm_heavy_hitters_empty_and_budget():
    vals = [f"x{i}" for i in range(1000)]
    ds = _string_ds(vals)
    # nothing reaches the threshold
    got = cm_heavy_hitters(ds, "v", threshold=10, width=256, depth=2)
    assert len(got) == 0
    # a tiny sketch + tiny threshold floods the candidate set: the
    # guard must trip loudly rather than silently collect the domain
    with pytest.raises(ValueError, match="candidate_budget"):
        cm_heavy_hitters(ds, "v", threshold=1, width=4, depth=2,
                         candidate_budget=50)


def test_bottomk_sample_merge_and_estimates():
    """Bottom-k: contents equal the k hash-smallest distinct values
    (order-of-arrival and partitioning invariant), the sketch merges
    by union-then-truncate, the KMV cardinality estimate lands within
    the 1/sqrt(k) band, and sample quantiles track exact distinct
    quantiles."""
    import ray.data as rd

    from rookray.ops.sketch import bottomk_cardinality, bottomk_sample
    from rookray.util import hash_strings

    n, k = 50_000, 512
    vals = [f"v-{i:07d}" for i in range(n)]
    # duplicates must collapse: ship every value twice
    ds = rd.from_items([{"s": v} for v in vals + vals[: n // 2]],
                       override_num_blocks=32)
    got = bottomk_sample(ds, "s", k=k)
    assert len(got) == k

    # reference: k smallest hashes over the distinct universe
    import pyarrow as pa
    h = hash_strings(pa.array(vals))
    order = np.argsort(h)
    assert got["h"].to_numpy(dtype=np.uint64).tolist() \
        == h[order[:k]].tolist()
    assert got["value"].tolist() == [vals[i] for i in order[:k]]

    # partitioning invariance: a different block count, same sketch
    again = bottomk_sample(rd.from_items(
        [{"s": v} for v in reversed(vals)], override_num_blocks=7), "s", k=k)
    assert again["value"].tolist() == got["value"].tolist()

    # KMV estimate within ~3/sqrt(k) of the true distinct count
    est = bottomk_cardinality(got, k)
    assert abs(est - n) / n < 3 / np.sqrt(k), est

    # distinct-value quantiles from the uniform sample: v-<i> values
    # are uniform over [0, n), so sample quantiles track i-quantiles
    ids = np.array(sorted(int(v[2:]) for v in got["value"]))
    for q in (0.25, 0.5, 0.75):
        assert abs(np.quantile(ids, q) - q * n) < n * 0.08

    # unsaturated sketch is exact (and cardinality degenerates to len)
    small = bottomk_sample(rd.from_items(
        [{"s": f"x{i}" for i in range(3)} | {"s": f"x{i}"}
         for i in range(3)], override_num_blocks=2), "s", k=64)
    assert len(small) == 3
    assert bottomk_cardinality(small, 64) == 3.0
