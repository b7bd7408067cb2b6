"""Distributed cardinality / frequency sketches.

The 100-TB shapes for COUNT DISTINCT and heavy hitters: a global
``unique``/``groupby`` exchanges every distinct value; a sketch
exchanges a FIXED-size summary per task regardless of input size.

Both sketches here are deterministic functions of the engine's 64-bit
string hash (`rookray.util.hash_strings`), which the DuckDB oracle
reproduces bit-exactly in mod-2^64 SQL — so even though the *estimates*
are approximate, the sketch CONTENTS (HLL registers, CM counters) are
oracle-checkable exactly, and the heavy-hitter output is exact by
construction (candidate generation may only over-approximate; a second
exact counting pass filters it).

Reference scope note: rook has no aggregation surface (SURVEY.md §2.3);
this extends the engine's stats family for corpus-scale profiling
(distinct doc counts, hot-key detection feeding `skew.py` salting).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from rookray.util import hash_strings

__all__ = ["hll_registers", "hll_estimate", "cm_counters",
           "cm_heavy_hitters"]


def _as_string(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not pa.types.is_string(col.type) and not pa.types.is_large_string(col.type):
        col = pc.cast(col, pa.string())
    return col


def hll_registers(ds, col: str, p: int = 12):
    """HyperLogLog register table of ``col``: the per-batch combiner
    folds every value into a dense 2^p register array (max of
    ``rho`` = leading-zero rank of the hash remainder), emits only the
    nonzero registers, and one tiny ``groupby(reg_idx).max`` merges
    them — ≤ 2^p rows leave any task no matter how many rows it saw
    (registers are a max: commutative, associative, idempotent, so
    re-execution and merge order cannot change the result).

    Returns a Dataset of (reg_idx, reg).  ``p ≥ 12`` keeps the
    remainder below 2^52 so both numpy (frexp) and the SQL oracle
    (``length(bin(w))``) compute floor(log2) exactly in integers.
    """
    if not 12 <= p <= 18:
        raise ValueError(f"p={p} outside [12, 18]")
    from ray.data.aggregate import Max

    bits = 64 - p
    mask = np.uint64((1 << bits) - 1)

    def partial(batch: pa.Table) -> pa.Table:
        v = _as_string(batch.column(col))
        h = hash_strings(v)
        idx = (h >> np.uint64(bits)).astype(np.int64)
        w = h & mask
        # exact floor(log2(w)) for w < 2^53: float64 conversion is
        # exact, frexp returns the true exponent
        _, e = np.frexp(w.astype(np.float64))
        rho = np.where(w == 0, bits + 1, bits - (e - 1)).astype(np.int64)
        regs = np.zeros(1 << p, dtype=np.int64)
        np.maximum.at(regs, idx, rho)
        nz = np.flatnonzero(regs)
        return pa.table({"reg_idx": pa.array(nz.astype(np.int64)),
                         "reg": pa.array(regs[nz])})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("reg_idx").aggregate(Max("reg", alias_name="reg")))


def hll_estimate(regs: pd.DataFrame, p: int = 12) -> float:
    """Standard bias-corrected HLL estimate from a (reg_idx, reg)
    register table (absent registers are zero).  Deterministic."""
    m = 1 << p
    dense = np.zeros(m, dtype=np.int64)
    if len(regs):
        dense[regs["reg_idx"].to_numpy()] = regs["reg"].to_numpy()
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / np.sum(np.exp2(-dense.astype(np.float64)))
    zeros = int(np.sum(dense == 0))
    if e <= 2.5 * m and zeros:
        return float(m * np.log(m / zeros))   # linear counting
    return float(e)


def cm_counters(ds, col: str, width: int = 512, depth: int = 2):
    """Count-Min counter table of ``col``: ``depth`` independent hash
    rows × ``width`` counters; each occurrence increments one counter
    per row.  Per-batch combiner: value_counts once, hash only the
    batch's DISTINCT values, dense ``np.add.at`` — at most
    depth × width rows leave any task.  Returns a Dataset of
    (j, idx, cnt); counts are exact sums (merge = addition)."""
    if depth > 2:
        raise ValueError("hash_strings provides 2 independent variants")
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        v = _as_string(batch.column(col))
        vc = v.value_counts()
        vals = vc.field("values")
        counts = vc.field("counts").to_numpy(zero_copy_only=False)
        dense = np.zeros((depth, width), dtype=np.int64)
        for j in range(depth):
            idx = (hash_strings(vals, variant=j)
                   % np.uint64(width)).astype(np.int64)
            np.add.at(dense[j], idx, counts)
        js, idxs = np.nonzero(dense)
        return pa.table({"j": pa.array(js.astype(np.int64)),
                         "idx": pa.array(idxs.astype(np.int64)),
                         "cnt": pa.array(dense[js, idxs])})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["j", "idx"]).aggregate(Sum("cnt", alias_name="cnt")))


def cm_heavy_hitters(ds, col: str, threshold: int, width: int = 512,
                     depth: int = 2, candidate_budget: int = 1_000_000,
                     ) -> pd.DataFrame:
    """EXACT heavy hitters (all values with count ≥ ``threshold``) in
    three bounded passes — never a full-domain groupby:

    1. build the CM counter matrix (fixed depth × width exchange);
    2. candidate sweep: each batch probes its distinct values against
       the broadcast matrix (min over rows ≥ threshold keeps) — CM
       only OVERcounts, so no true hitter can be missed;
    3. exact count of the candidate set only (broadcast membership
       filter + small groupby), dropping CM false positives.

    The candidate set is bounded by ~(total_count/threshold) ·
    (1 + collision slack); a LOUD guard trips at
    ``candidate_budget`` (width too small for the threshold).
    Returns a DataFrame (value, cnt) of exact counts."""
    import ray
    from ray.data.aggregate import Sum

    cm = np.zeros((depth, width), dtype=np.int64)
    for row in cm_counters(ds, col, width, depth).take_all():
        cm[int(row["j"]), int(row["idx"])] = int(row["cnt"])
    cm_ref = ray.put(cm)

    def candidates(batch: pa.Table) -> pa.Table:
        mat = ray.get(cm_ref)
        vals = _as_string(batch.column(col)).unique()
        est = np.full(len(vals), np.iinfo(np.int64).max, dtype=np.int64)
        for j in range(depth):
            idx = (hash_strings(vals, variant=j)
                   % np.uint64(width)).astype(np.int64)
            est = np.minimum(est, mat[j, idx])
        keep = est >= threshold
        return pa.table({"value": vals.filter(pa.array(keep))})

    from ray.data.aggregate import Count
    cand_rows = (ds.map_batches(candidates, batch_format="pyarrow",
                                zero_copy_batch=True)
                 .groupby("value").aggregate(Count(alias_name="_n"))
                 .take_all())
    if len(cand_rows) > candidate_budget:
        raise ValueError(
            f"{len(cand_rows)} heavy-hitter candidates exceed "
            f"candidate_budget={candidate_budget}: CM width {width} is "
            f"too small for threshold {threshold} at this scale — "
            f"raise width or threshold")
    cand = {r["value"] for r in cand_rows}
    if not cand:
        return pd.DataFrame({"value": pd.Series([], dtype=object),
                             "cnt": pd.Series([], dtype=np.int64)})
    cand_ref = ray.put(pa.array(sorted(cand), pa.string()))

    def exact_partial(batch: pa.Table) -> pa.Table:
        members = ray.get(cand_ref)
        v = _as_string(batch.column(col))
        m = pc.is_in(v, value_set=members)
        v = v.filter(m)
        vc = v.value_counts()
        return pa.table({
            "value": vc.field("values"),
            "cnt": pa.array(vc.field("counts")
                            .to_numpy(zero_copy_only=False)
                            .astype(np.int64)),
        })

    rows = (ds.map_batches(exact_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("value").aggregate(Sum("cnt", alias_name="cnt"))
            .take_all())
    out = pd.DataFrame(rows) if rows else pd.DataFrame(
        {"value": pd.Series([], dtype=object),
         "cnt": pd.Series([], dtype=np.int64)})
    out = out[out["cnt"] >= threshold]
    return (out.sort_values("value").reset_index(drop=True)
            .astype({"cnt": np.int64}))


def bottomk_sample(ds, col: str, k: int = 256, variant: int = 0
                   ) -> pd.DataFrame:
    """Deterministic bottom-k (KMV) sketch of ``col``: the k DISTINCT
    values with the smallest 64-bit hash.  The hash order is a fixed
    pseudo-random permutation of the value space, so the result is (a)
    a uniform sample of the distinct values, (b) mergeable (union →
    k smallest — commutative/associative/idempotent like the HLL
    registers), and (c) EXACTLY oracle-checkable: the same hash exists
    bit-for-bit in mod-2^64 SQL (``ORDER BY hash LIMIT k``), unlike a
    randomized KLL/reservoir whose contents depend on RNG state.

    Shape: each task emits ≤ k rows no matter how many it saw
    (per-batch distinct + k-smallest partial); partials dedupe by hash
    and the global k-smallest resolve with one bounded sort over
    ≤ k × blocks rows.  Returns a DataFrame (rk, h, value) sorted by
    hash rank, rk 1-based.

    Estimators on top: :func:`bottomk_cardinality` (k-th minimum
    value), and distinct-value quantiles via ``np.quantile`` over the
    sample's values (the sample is uniform over DISTINCT values —
    duplicates collapse by construction).
    """
    SIGN = np.uint64(1 << 63)

    def partial(batch: pa.Table) -> pa.Table:
        s = _as_string(batch.column(col))
        h = hash_strings(s, variant)
        uh, idx = np.unique(h, return_index=True)  # sorted by hash
        uh, idx = uh[:k], idx[:k]
        # order-preserving signed mapping (xor the sign bit): Ray's
        # groupby/sort round-trips int64 cleanly but pickles uint64
        hs = (uh ^ SIGN).view(np.int64)
        return pa.table({"h": pa.array(hs, type=pa.int64()),
                         "value": s.take(pa.array(idx))})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    from ray.data.aggregate import Min
    merged = (parts.groupby("h").aggregate(Min("value", alias_name="value"))
              .sort("h").limit(k).to_pandas())
    merged["h"] = (merged["h"].to_numpy(dtype=np.int64)
                   .view(np.uint64) ^ SIGN)
    merged["rk"] = np.arange(1, len(merged) + 1, dtype=np.int64)
    return merged[["rk", "h", "value"]]


def bottomk_cardinality(sample: pd.DataFrame, k: int) -> float:
    """KMV distinct-count estimate: with the k-th smallest of n
    uniform hashes at position h_(k), n̂ = (k − 1)·2^64 / h_(k).
    Exact when the sketch is unsaturated (fewer than k distinct)."""
    if len(sample) < k:
        return float(len(sample))
    hk = float(sample["h"].iloc[k - 1])
    return (k - 1) * float(2**64) / hk
