"""Rolling per-key window aggregate vs a pandas reference."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from rookray.ops.window import rolling_sum_per_key


def _run(df: pd.DataFrame, k: int, parts: int) -> pd.DataFrame:
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = rolling_sum_per_key(ds, key_col="k", order_col="o",
                              value_col="v", k=k,
                              num_partitions=parts).to_pandas()
    return out.sort_values(["k", "o"]).reset_index(drop=True)


def _ref(df: pd.DataFrame, k: int) -> pd.DataFrame:
    df = df.sort_values(["k", "o"]).reset_index(drop=True)
    df["roll_sum"] = (df.groupby("k")["v"]
                      .transform(lambda s: s.rolling(k, min_periods=1).sum()))
    return df[["k", "o", "roll_sum"]]


def test_rolling_matches_pandas_and_partition_invariant():
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"k": rng.integers(0, 25, 2000),
                       "o": np.arange(2000),
                       "v": rng.normal(size=2000)})
    exp = _ref(df, 5)
    for parts in (1, 16):
        got = _run(df, 5, parts)
        assert np.allclose(got["roll_sum"], exp["roll_sum"])
        assert got["o"].tolist() == exp["o"].tolist()


def test_rolling_string_keys_and_short_heads():
    df = pd.DataFrame({"k": ["a", "a", "b", "a", "b", "c"],
                       "o": [1, 2, 1, 3, 2, 1],
                       "v": [1.0, 2.0, 10.0, 3.0, 20.0, 7.0]})
    got = _run(df, 2, 4)
    exp = {("a", 1): 1.0, ("a", 2): 3.0, ("a", 3): 5.0,
           ("b", 1): 10.0, ("b", 2): 30.0, ("c", 1): 7.0}
    assert {(r.k, r.o): r.roll_sum for r in got.itertuples()} == exp


def test_rolling_k_validation():
    with pytest.raises(ValueError):
        rolling_sum_per_key(None, "k", "o", "v", k=0)


def test_exact_quantiles_vs_numpy_and_guard():
    from rookray.ops.stats import exact_quantiles

    rng = np.random.default_rng(7)
    v = np.round(rng.exponential(50, 5000), 2)
    ds = ray.data.from_arrow(pa.table({"value": pa.array(v)}))
    got = exact_quantiles(ds, "value", [1, 500, 999])
    vq = np.sort(np.floor(v * 100 + 0.5).astype(np.int64))
    for q, val in zip(got["q_permille"], got["value_q"]):
        rank = -((-q * len(vq)) // 1000)
        assert val == vq[rank - 1], q

    with pytest.raises(ValueError, match="max_distinct"):
        exact_quantiles(ds, "value", [500], max_distinct=3)
    with pytest.raises(ValueError, match="outside"):
        exact_quantiles(ds, "value", [0])


def test_grouped_quantiles_vs_numpy_and_partition_invariance():
    from rookray.ops.stats import grouped_quantiles

    rng = np.random.default_rng(11)
    keys = rng.choice(list("abcdefg"), 4000)
    v = np.round(rng.normal(100, 30, 4000), 2)
    ds = ray.data.from_arrow(pa.table({"k": pa.array(keys),
                                       "value": pa.array(v)}))
    vq_all = np.floor(v * 100 + 0.5).astype(np.int64)

    def ref(q):
        out = {}
        for k in set(keys):
            s = np.sort(vq_all[keys == k])
            rank = -((-q * len(s)) // 1000)
            out[k] = s[rank - 1]
        return out

    for parts in (1, 16):
        got = (grouped_quantiles(ds, "k", "value", [100, 500, 900],
                                 num_partitions=parts).to_pandas()
               .set_index(["k", "q_permille"]))
        for q in (100, 500, 900):
            exp = ref(q)
            for k in exp:
                assert got.loc[(k, q), "value_q"] == exp[k], (k, q, parts)
