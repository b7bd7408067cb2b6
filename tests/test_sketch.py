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
