"""Distributed joins for Ray Data pipelines.

The reference has no general joins (SURVEY.md §2.3) — its only lookups
are broadcast-small-side patterns.  The engine needs a real
shuffle-free-driver join for the LLM-data operators (candidate-pair
verification, semi-joins on fact tables), so this module provides:

* ``broadcast_join`` — small side shipped once via ``ray.put``, looked
  up per batch (the rook ``loadEntity`` analog, zero shuffle);
* ``bucketed_join`` — both sides hash-bucketed on the key, one Ray
  ``groupby(bucket)`` shuffle, vectorized ``pandas.merge`` inside each
  bucket group.  Neither side ever materializes on the driver.  The
  coarse bucket count amortizes Ray's per-group overhead while the
  in-bucket merge stays C-speed.

Scale shape: one all-to-all exchange of the two (pre-projected) sides,
then embarrassingly parallel per-bucket merges.  Use
``broadcast_join`` whenever one side fits comfortably in a worker heap
— it is strictly cheaper.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _bucket_of(values: pd.Series, buckets: int) -> np.ndarray:
    """Deterministic bucket assignment for int64 or string keys."""
    if values.dtype.kind in "iu":
        v = values.to_numpy().astype(np.uint64)
        z = (v + np.uint64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
        return (z % np.uint64(buckets)).astype(np.int64)
    from rookray.util import hash_strings
    arr = pa.array(values.astype(str).to_numpy(dtype=object))
    return (hash_strings(arr) % np.uint64(buckets)).astype(np.int64)


def _arrow_schema_of(ds: "ray.data.Dataset") -> pa.Schema:
    """Arrow schema of a Dataset; pandas-block datasets report a
    PandasBlockSchema (numpy dtypes) which we convert field-wise."""
    s = ds.schema()
    base = s.base_schema
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for name, t in zip(s.names, s.types):
        if not isinstance(t, pa.DataType):
            t = pa.from_numpy_dtype(t)
        fields.append(pa.field(name, t))
    return pa.schema(fields)


def bucketed_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
                  on: str, how: str = "inner", buckets: int = 256,
                  salt: int = 0,
                  left_schema: pa.Schema | None = None,
                  right_schema: pa.Schema | None = None) -> "ray.data.Dataset":
    """Hash-bucketed distributed join of two Datasets on one key column.

    Supported ``how``: "inner", "left", "semi" (left rows whose key
    exists in right; right payload dropped), "anti" (left rows whose
    key does NOT — the EXCEPT/incremental-dedup shape).  Non-key column
    names must not collide (rename upstream — keeps the result schema
    explicit).

    ``salt > 1`` spreads HOT keys: every bucket splits into ``salt``
    sub-buckets, left rows scatter across them and the right side
    replicates into all of them — a Zipf-hot left key's rows no longer
    land in one group (the single-worker-heap assumption below), at the
    cost of right-side replication ×salt.  Each (left, right) pair
    still meets exactly once, so the result is salt-invariant.

    Pass ``left_schema``/``right_schema`` when the input is a lazy
    pipeline tail: Ray infers schemas of unexecuted map stages by
    sampling, and the sampled prefix can come back with nulls widened
    to double — an explicit schema sidesteps the inference entirely.
    """
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"unsupported how={how!r}")
    from rookray.schema import conform as _conform, unify_additive

    ls = left_schema or _arrow_schema_of(left)
    rs = right_schema or _arrow_schema_of(right)
    clash = (set(ls.names) & set(rs.names)) - {on}
    if clash:
        raise ValueError(f"column collision {sorted(clash)}; rename upstream")
    # one Arrow schema for both sides (absent columns = typed nulls) so
    # the shuffle concatenates cleanly
    target = unify_additive([ls, rs])
    s = max(1, int(salt))

    def prep(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            bkt = _bucket_of(batch.column(on).to_pandas(), buckets)
            t = _conform(batch, target)
            if s > 1 and side == 0:
                bkt = bkt * s + (np.arange(len(t), dtype=np.int64) % s)
            elif s > 1:
                # replicate the right side into every sub-bucket
                idx = np.repeat(np.arange(len(t), dtype=np.int64), s)
                t = t.take(pa.array(idx))
                bkt = (np.repeat(bkt, s) * s
                       + np.tile(np.arange(s, dtype=np.int64), len(bkt)))
            return (t.append_column("__bkt", pa.array(bkt, pa.int64()))
                     .append_column("__side",
                                    pa.array(np.full(len(t), side, np.int8))))
        fn.__name__ = f"JoinPrep{side}"
        return fn

    both = left.map_batches(prep(0), batch_format="pyarrow",
                            zero_copy_batch=True).union(
        right.map_batches(prep(1), batch_format="pyarrow",
                          zero_copy_batch=True))

    l_payload = sorted(set(ls.names) - {on})
    r_payload = sorted(set(rs.names) - {on})

    def merge_bucket(g: pa.Table) -> pa.Table:
        # sides split in ARROW and rows gathered with Table.take so
        # every payload column keeps its exact Arrow type (a pandas
        # round-trip upcasts typed-null ints to float and turns list
        # columns into Ray tensor-extension types); only the tiny key
        # index frames go through pandas merge
        side = g.column("__side")
        lt = g.filter(pa.compute.equal(side, 0)).select([on, *l_payload])
        rt = g.filter(pa.compute.equal(side, 1)).select([on, *r_payload])
        lk = lt.column(on).to_pandas()
        if how in ("semi", "anti"):
            keep = lk.isin(set(rt.column(on).to_pandas()))
            if how == "anti":
                keep = ~keep
            return lt.filter(pa.array(keep.to_numpy()))
        rk = rt.column(on).to_pandas()
        m = pd.DataFrame({on: lk, "__li": np.arange(len(lk))}).merge(
            pd.DataFrame({on: rk, "__ri": np.arange(len(rk))}),
            on=on, how=how)
        li = pa.array(m["__li"].to_numpy(dtype=np.int64))
        if how == "inner":
            ri = pa.array(m["__ri"].to_numpy(dtype=np.int64))
        else:  # left join: null index -> null row from take
            ri = pa.array([None if pd.isna(x) else int(x) for x in m["__ri"]],
                          pa.int64())
        lout = lt.take(li)
        rout = rt.take(ri)
        cols = {on: lout.column(on)}
        for c in l_payload:
            cols[c] = lout.column(c)
        for c in r_payload:
            cols[c] = rout.column(c)
        return pa.table(cols)

    return both.groupby("__bkt").map_groups(merge_bucket, batch_format="pyarrow")


def broadcast_join(left: "ray.data.Dataset", right_df: pd.DataFrame,
                   on: str, how: str = "inner",
                   concurrency=(1, 8)) -> "ray.data.Dataset":
    """Join a Dataset against a SMALL pandas side broadcast once via
    ``ray.put`` (read per actor in ``__init__``, never re-shipped per
    batch).  ``how``: "inner", "left", "semi".

    Arrow batches end-to-end: "semi" is one ``is_in`` kernel over the
    key column (the big side's payload is never copied); inner/left
    run the pandas merge on tiny (key, row-index) frames only and
    gather both payloads with ``Table.take``, so list columns and
    typed nulls survive untouched (the former whole-batch pandas
    conversion materialized every payload column as objects)."""
    ref = ray.put(right_df)

    class Joiner:
        def __init__(self):
            right = ray.get(ref)
            self.rk = right[on].to_numpy()
            self.keyset = pa.array(pd.unique(right[on])) if how == "semi" else None
            self.rt = (None if how == "semi"
                       else pa.Table.from_pandas(right, preserve_index=False))

        def __call__(self, batch: pa.Table) -> pa.Table:
            if how == "semi":
                return batch.filter(
                    pa.compute.is_in(batch.column(on), value_set=self.keyset))
            lk = batch.column(on).to_pandas()
            m = pd.DataFrame({on: lk, "__li": np.arange(len(lk))}).merge(
                pd.DataFrame({on: self.rk, "__ri": np.arange(len(self.rk))}),
                on=on, how=how)
            li = pa.array(m["__li"].to_numpy(dtype=np.int64))
            if how == "inner":
                ri = pa.array(m["__ri"].to_numpy(dtype=np.int64))
            else:  # left join: null index -> null row from take
                ri = pa.array([None if pd.isna(x) else int(x) for x in m["__ri"]],
                              pa.int64())
            lout = batch.take(li)
            rout = self.rt.take(ri)
            cols = {c: lout.column(c) for c in batch.column_names}
            for c in self.rt.column_names:
                if c != on:
                    cols[c] = rout.column(c)
            return pa.table(cols)

    Joiner.__name__ = f"BroadcastJoin_{on}"
    return left.map_batches(Joiner, batch_format="pyarrow",
                            zero_copy_batch=True, concurrency=concurrency)


def range_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
               point: str, lo: str, hi: str, bin_width: int,
               how: str = "inner", max_bin_pairs: int = 50_000_000,
               left_schema: pa.Schema | None = None,
               right_schema: pa.Schema | None = None) -> "ray.data.Dataset":
    """Distributed range (interval) join: each left row pairs with every
    right row whose closed interval ``[lo, hi]`` contains its ``point``
    — the band/tier-lookup join (value→price band, IP→range, time→
    validity window) the equality-keyed joins above cannot express.

    Scale shape / partitioning assumption: the value domain is
    RANGE-binNED at ``bin_width``; a left point lands in exactly one
    bin while a right interval replicates into every bin it overlaps
    (replication factor ≈ interval_len/bin_width + 1), so ALL matches
    of a point are in its bin and a single exchange suffices.  In-bin
    matching is one vectorized candidate cross (pandas merge on the
    bin) filtered by the containment predicate; pick ``bin_width`` near
    the typical interval length so candidates stay near matches.  Bins
    whose candidate cross exceeds ``max_bin_pairs`` raise LOUDLY
    (shrink ``bin_width`` or salt) instead of silently going quadratic.

    ``how``: "inner" or "left" (unmatched left rows keep typed-null
    right payload — sound because a point's matches never span bins).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    from rookray.schema import conform as _conform, unify_additive

    ls = left_schema or _arrow_schema_of(left)
    rs = right_schema or _arrow_schema_of(right)
    clash = set(ls.names) & set(rs.names)
    if clash:
        raise ValueError(f"column collision {sorted(clash)}; rename upstream")
    target = unify_additive([ls, rs])
    w = int(bin_width)

    def prep_left(batch: pa.Table) -> pa.Table:
        p = batch.column(point).to_numpy(zero_copy_only=False)
        t = _conform(batch, target)
        return (t.append_column(
                    "__bkt", pa.array(np.floor_divide(p, w).astype(np.int64)))
                 .append_column("__side",
                                pa.array(np.full(len(t), 0, np.int8))))

    def prep_right(batch: pa.Table) -> pa.Table:
        lo_v = batch.column(lo).to_numpy(zero_copy_only=False)
        hi_v = batch.column(hi).to_numpy(zero_copy_only=False)
        b0 = np.floor_divide(lo_v, w).astype(np.int64)
        b1 = np.floor_divide(hi_v, w).astype(np.int64)
        reps = (b1 - b0 + 1).clip(min=0)
        idx = np.repeat(np.arange(len(batch), dtype=np.int64), reps)
        # bin offset within each interval's replica run
        off = (np.arange(int(reps.sum()), dtype=np.int64)
               - np.repeat(np.concatenate([[0], np.cumsum(reps[:-1])]), reps))
        t = _conform(batch, target).take(pa.array(idx))
        return (t.append_column("__bkt", pa.array(b0[idx] + off))
                 .append_column("__side",
                                pa.array(np.full(len(t), 1, np.int8))))

    both = left.map_batches(prep_left, batch_format="pyarrow",
                            zero_copy_batch=True).union(
        right.map_batches(prep_right, batch_format="pyarrow",
                          zero_copy_batch=True))

    l_cols = list(ls.names)
    r_cols = list(rs.names)
    r_payload = sorted(set(rs.names))

    def merge_bin(g: pa.Table) -> pa.Table:
        side = g.column("__side")
        lt = g.filter(pa.compute.equal(side, 0)).select(l_cols)
        rt = g.filter(pa.compute.equal(side, 1)).select(r_cols)
        if len(lt) * len(rt) > max_bin_pairs:
            raise ValueError(
                f"range_join bin candidate cross {len(lt)}x{len(rt)} exceeds "
                f"max_bin_pairs={max_bin_pairs}; shrink bin_width")
        # tiny index frames through pandas; payload gathered in Arrow
        lp = lt.column(point).to_numpy(zero_copy_only=False)
        m = pd.DataFrame({"__li": np.arange(len(lt))}).merge(
            pd.DataFrame({"__ri": np.arange(len(rt))}), how="cross")
        pv = lp[m["__li"].to_numpy()]
        lov = rt.column(lo).to_numpy(zero_copy_only=False)[m["__ri"].to_numpy()]
        hiv = rt.column(hi).to_numpy(zero_copy_only=False)[m["__ri"].to_numpy()]
        m = m[(lov <= pv) & (pv <= hiv)]
        if how == "left":
            missing = np.setdiff1d(np.arange(len(lt)),
                                   m["__li"].to_numpy(), assume_unique=False)
            m = pd.concat([m, pd.DataFrame({"__li": missing,
                                            "__ri": -1})], ignore_index=True)
            m = m.sort_values(["__li", "__ri"], kind="mergesort")
        lout = lt.take(pa.array(m["__li"].to_numpy(dtype=np.int64)))
        ri = m["__ri"].to_numpy(dtype=np.int64)
        rout = rt.take(pa.array([None if x < 0 else int(x) for x in ri],
                                pa.int64()))
        cols = {c: lout.column(c) for c in l_cols}
        for c in r_payload:
            cols[c] = rout.column(c)
        return pa.table(cols)

    return both.groupby("__bkt").map_groups(merge_bin,
                                            batch_format="pyarrow")


def asof_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              by: str, on: str, right_by: str, right_on: str,
              tie_col: str | None = None, buckets: int = 64,
              left_schema: pa.Schema | None = None,
              right_schema: pa.Schema | None = None) -> "ray.data.Dataset":
    """Distributed backward as-of join: for each left row, attach the
    right row with the LARGEST ``right_on <= on`` among rows sharing
    the key (``by == right_by``); equal-time ties break to the largest
    ``tie_col``.  Left rows with no match keep typed-null right
    payload (left-join semantics).

    The reference has nothing like this (its lookups are point reads,
    ``SynchronizationContext.loadEntity``); it exists for the
    time-versioned enrichment step every event pipeline needs (event →
    latest dimension state at event time).

    Scale shape / partitioning assumption: both (pre-projected) sides
    are hash-bucketed on the key and exchanged ONCE; each bucket is
    merged with one sorted-index ``pandas.merge_asof`` (C speed) and
    payload rows are gathered in Arrow (``Table.take``) so types never
    round-trip through pandas.  All rows of one key land in one bucket
    — a single hot key's rows must fit in a worker heap (same
    assumption as ``bucketed_join``; salt upstream if violated).
    """
    from rookray.schema import conform as _conform, unify_additive

    ls = left_schema or _arrow_schema_of(left)
    rs = right_schema or _arrow_schema_of(right)
    clash = set(ls.names) & set(rs.names)
    if clash:
        raise ValueError(f"column collision {sorted(clash)}; rename upstream")
    target = unify_additive([ls, rs])

    def prep(side: int, key: str):
        def fn(batch: pa.Table) -> pa.Table:
            bkt = _bucket_of(batch.column(key).to_pandas(), buckets)
            t = _conform(batch, target)
            return (t.append_column("__bkt", pa.array(bkt, pa.int64()))
                     .append_column("__side",
                                    pa.array(np.full(len(t), side, np.int8))))
        fn.__name__ = f"AsofPrep{side}"
        return fn

    both = left.map_batches(prep(0, by), batch_format="pyarrow",
                            zero_copy_batch=True).union(
        right.map_batches(prep(1, right_by), batch_format="pyarrow",
                          zero_copy_batch=True))

    l_cols = list(ls.names)
    r_payload = sorted(set(rs.names) - {right_by, right_on})

    def merge_bucket(g: pa.Table) -> pa.Table:
        side = g.column("__side")
        lt = g.filter(pa.compute.equal(side, 0)).select(l_cols)
        rt = g.filter(pa.compute.equal(side, 1)).select(list(rs.names))
        # tiny index frames only; payload stays in Arrow
        li = pd.DataFrame({"k": lt.column(by).to_pandas(),
                           "t": lt.column(on).to_pandas(),
                           "__li": np.arange(len(lt))}).sort_values(
            "t", kind="mergesort")
        r_sort = ["t", "tie"] if tie_col else ["t"]
        ri = pd.DataFrame({"k": rt.column(right_by).to_pandas(),
                           "t": rt.column(right_on).to_pandas(),
                           **({"tie": rt.column(tie_col).to_pandas()}
                              if tie_col else {}),
                           "__ri": np.arange(len(rt))}).sort_values(
            r_sort, kind="mergesort")
        if len(ri):
            # merge_asof backward: last right row (in frame order) with
            # t <= left t within the key — stable pre-sort on (t, tie)
            # makes "last" = max tie among equal times
            m = pd.merge_asof(li, ri.drop(columns=["tie"], errors="ignore"),
                              on="t", by="k", direction="backward")
        else:
            m = li.assign(__ri=np.nan)
        m = m.sort_values("__li", kind="mergesort")
        take_r = pa.array([None if pd.isna(x) else int(x)
                           for x in m["__ri"]], pa.int64())
        lout = lt.take(pa.array(m["__li"].to_numpy(dtype=np.int64)))
        rout = rt.take(take_r)
        cols = {c: lout.column(c) for c in l_cols}
        for c in r_payload:
            cols[c] = rout.column(c)
        return pa.table(cols)

    return both.groupby("__bkt").map_groups(merge_bucket,
                                            batch_format="pyarrow")
