"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Scale shape (per the Ray Data guide's dedup pattern):

* exact dedup = content-hash in a vectorized map_batches, then
  ``groupby(hash)`` keep-first — one shuffle of (hash, doc_id) pairs
  only (never the text);
* MinHash-LSH = shingle→minhash per batch (numpy-vectorized across the
  whole batch), explode to (band, band_hash, doc_id) rows, one groupby
  over those tiny rows, candidate pairs verified by exact Jaccard over
  ONLY the involved docs (second pruned pass), connected components
  hybrid — driver union-find under an explicit edge budget, distributed
  hash-min label propagation above it;
* SimHash = 64-bit signature per batch, 8-band blocking (Hamming ≤ 7
  ⇒ at least one band equal — recall 1 for max_hamming < bands),
  exact Hamming verify, distributed groupby(a,b) dedup;
* n-gram Jaccard = exact pairwise within cheap blocks (``map_groups``),
  for SQL-checkable ground truth;
* embedding near-dup = blocked pairwise cosine via numpy matmul in
  ``map_groups``.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from rookray.util import hash_strings

_MERSENNE = np.uint64((1 << 61) - 1)


# ------------------------------------------------------------------ exact


def exact_groups(ds: "ray.data.Dataset", col: str = "text") -> "ray.data.Dataset":
    """(doc_id, group_size) — one survivor (min doc_id) per distinct
    content hash, with its duplicate-group size.

    Bucketing key = TWO independent vectorized 64-bit polynomial hashes
    (``hash_strings`` variants 0/1, an effective 128-bit key — a single
    64-bit hash collides at 10¹⁰ docs by the birthday bound; round 2
    used a per-row Python ``hashlib.md5`` map here, which parallelized
    but burned a core per batch).  md5 survives only where SQL needs it
    (``fingerprint_md5`` / DEDUP_EXACT_SQL group equivalence is by
    CONTENT, so any injective key yields identical groups)."""

    def partial(batch: pa.Table) -> pa.Table:
        # per-batch combiner: hash + in-batch min/count per hash, so the
        # shuffle ships one row per (hash, batch) instead of per doc
        text = batch.column(col)
        df = pd.DataFrame(
            {"doc_id": batch.column("doc_id").to_numpy(zero_copy_only=False),
             "h0": hash_strings(text, 0).astype(np.int64),
             "h1": hash_strings(text, 1).astype(np.int64)}
        )
        g = (df.groupby(["h0", "h1"], sort=False)
             .agg(doc_id=("doc_id", "min"), group_size=("doc_id", "size"))
             .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Min, Sum

    hashed = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = hashed.groupby(["h0", "h1"]).aggregate(
        Min("doc_id", alias_name="doc_id"),
        Sum("group_size", alias_name="group_size"),
    )
    return out.select_columns(["doc_id", "group_size"])


# ------------------------------------------------------------- shingling


def _word_shingle_hashes(texts, n: int = 3) -> list[np.ndarray]:
    """Per doc: uint64 hashes of word n-gram shingles (distinct)."""
    out = []
    for s in texts:
        words = s.lower().split()
        if len(words) < n:
            shingles = {" ".join(words)} if words else {""}
        else:
            shingles = {" ".join(words[i:i + n]) for i in range(len(words) - n + 1)}
        arr = hash_strings(pa.array(sorted(shingles)))
        out.append(arr)
    return out


def _minhash_batch(shingle_hashes: list[np.ndarray], k: int, seed: int) -> np.ndarray:
    """(n_docs, k) minhash signatures, vectorized over all shingles."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=k).astype(np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=k).astype(np.uint64)
    lens = np.array([len(h) for h in shingle_hashes], dtype=np.int64)
    flat = np.concatenate(shingle_hashes) if len(shingle_hashes) else np.zeros(0, np.uint64)
    flat = flat % _MERSENNE
    sigs = np.empty((len(shingle_hashes), k), dtype=np.uint64)
    if flat.size == 0:
        sigs.fill(0)
        return sigs
    starts = np.concatenate([[0], np.cumsum(lens[:-1])])
    for j in range(k):  # k is small (64); each op is fully vectorized
        hv = (a[j] * flat + b[j]) % _MERSENNE
        sigs[:, j] = np.minimum.reduceat(hv, starts)
    sigs[lens == 0] = 0
    return sigs


class MinHasher:
    """Actor-pool stage: text → (doc_id, band, band_hash) rows."""

    def __init__(self, k: int = 64, bands: int = 16, shingle_n: int = 3,
                 seed: int = 42, col: str = "text"):
        assert k % bands == 0
        self.k, self.bands, self.rows = k, bands, k // bands
        self.n = shingle_n
        self.seed = seed
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        sh = _word_shingle_hashes(batch.column(self.col).to_pylist(),
                                  self.n)
        sigs = _minhash_batch(sh, self.k, self.seed)
        n = batch.num_rows
        band_hash = np.empty((n, self.bands), dtype=np.uint64)
        for b in range(self.bands):
            seg = sigs[:, b * self.rows:(b + 1) * self.rows]
            h = np.zeros(n, dtype=np.uint64)
            for r in range(self.rows):
                h = h * np.uint64(1099511628211) + seg[:, r]
            band_hash[:, b] = h
        doc = np.repeat(
            batch.column("doc_id").to_numpy(zero_copy_only=False),
            self.bands)
        band = np.tile(np.arange(self.bands, dtype=np.int32), n)
        return pa.table({
            "doc_id": pa.array(doc),
            "band": pa.array(band, pa.int32()),
            "band_hash": pa.array(
                band_hash.reshape(-1).astype(np.int64), pa.int64()),
        })


def _band_runs(doc: np.ndarray, band: np.ndarray,
               val: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact (band, val) grouping of a coarse bucket by ONE numpy
    lexsort: returns (permutation, run starts, run ends) with rows
    ordered (band, val, doc) — shared by the MinHash and SimHash pair
    generators so the run-detection logic can't drift between them."""
    order = np.lexsort((doc, val, band))
    b, v = band[order], val[order]
    new = np.empty(len(order), dtype=bool)
    new[0] = True
    new[1:] = (b[1:] != b[:-1]) | (v[1:] != v[:-1])
    starts = np.flatnonzero(new)
    return order, starts, np.append(starts[1:], len(order))


def _candidate_pair_ds(grouped: "ray.data.Dataset", max_group: int = 64,
                       coarse: int = 512) -> "ray.data.Dataset":
    """Distinct candidate pairs from band-hash buckets, AS A DATASET —
    nothing materializes on the driver (round 1 collected the pair set
    driver-side; a near-dup-heavy 100-TB corpus would OOM it).

    Groups by a COARSE bucket of the band hash (≤``coarse`` Ray groups)
    and does the exact per-(band, band_hash) grouping with one numpy
    lexsort inside each group — thousands of tiny Ray groups would pay
    ~1ms each in per-group overhead, the coarse bucketing amortizes it."""

    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                             ("n_trunc", pa.int64())])

    def add_bucket(batch: pa.Table) -> pa.Table:
        bh = batch.column("band_hash").to_numpy(
            zero_copy_only=False).astype(np.uint64)
        return batch.append_column(
            "bucket", pa.array((bh % np.uint64(coarse)).astype(np.int64)))

    def pairs_of(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:  # map_groups schema probe
            return pair_schema.empty_table()
        band = g.column("band").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bh = g.column("band_hash").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        doc = g.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order, starts, ends = _band_runs(doc, band, bh)
        doc = doc[order]
        a_out: list[np.ndarray] = []
        b_out: list[np.ndarray] = []
        n_truncated = 0
        for s, e in zip(starts.tolist(), ends.tolist()):
            docs = np.unique(doc[s:e])
            if len(docs) < 2:
                continue
            if len(docs) > max_group:
                # no silent caps: oversized buckets (usually exact-dup
                # floods — run exact dedup first) are truncated LOUDLY.
                # Python warnings raised inside a Ray worker never reach
                # the driver; the ray logger's records DO get forwarded
                # to driver stdout (and counted below in a side channel).
                import logging
                logging.getLogger("ray.data").warning(
                    "LSH bucket with %d docs truncated to max_group=%d; "
                    "recall may drop — dedup exact duplicates first or "
                    "raise max_group", len(docs), max_group)
                n_truncated += 1
                docs = docs[:max_group]
            iu = np.triu_indices(len(docs), k=1)
            a_out.append(docs[iu[0]])
            b_out.append(docs[iu[1]])
        if not a_out:
            return pair_schema.empty_table()
        pairs = np.unique(np.stack([np.concatenate(a_out),
                                    np.concatenate(b_out)], axis=1), axis=0)
        # side channel: the group's truncated-bucket count rides on the
        # first pair row (a truncating bucket always yields ≥1 pair, so
        # the count is never orphaned); the caller sums the column and
        # re-raises the warning DRIVER-side where the user can see it
        nt = np.zeros(len(pairs), dtype=np.int64)
        nt[0] = n_truncated
        return pa.table({"a": pa.array(pairs[:, 0]),
                         "b": pa.array(pairs[:, 1]),
                         "n_trunc": pa.array(nt)}, schema=pair_schema)

    pairs_of.__name__ = "CandidatePairs"
    pair_ds = grouped.map_batches(add_bucket, batch_format="pyarrow",
                                  zero_copy_batch=True).groupby(
        "bucket").map_groups(pairs_of, batch_format="pyarrow")
    # NOTE deliberately NOT globally distinct: a (band, band_hash)
    # bucket lives in exactly one coarse group (deduped there via
    # set()), so duplicates arise only across DIFFERENT bands.  They
    # cost duplicate verify rows (cheap, bounded by bands×pairs) while
    # a global distinct costs a full extra groupby shuffle — and the
    # downstream union-find / label propagation is idempotent to
    # repeated edges.
    return pair_ds


def _shingle_sets_batch(batch: pa.Table, shingle_n: int, col: str,
                        out_key: str, out_col: str) -> pa.Table:
    """doc → distinct shingle-hash set, packed as a single BINARY cell
    (the little-endian bytes of the sorted int64 hash array).  64-bit
    hashed shingles stand in for the shingle strings — collision odds
    are negligible and the packed bytes shuffle far cheaper than text.
    Binary packing (vs list<int64>) lets the pair join run through
    Ray's native hash-shuffle join, whose Acero kernel rejects list
    payload columns.  A plain task stage (not an actor pool): it is
    stateless, and actor-pool CPU floors stacked with join aggregators
    can starve a small session into deadlock."""
    sh = _word_shingle_hashes(batch.column(col).to_pylist(), shingle_n)
    packed = [np.sort(h.astype(np.int64)).tobytes() for h in sh]
    return pa.table({out_key: batch.column("doc_id"),
                     out_col: pa.array(packed, pa.binary())})


def _join_partitions() -> int:
    """Partition count for native hash-shuffle joins, sized to the
    session: each join holds num_partitions aggregator actors alive for
    the pipeline's duration, so chained joins on a small CPU budget
    deadlock if oversized (observed: 2×16 aggregators starved a 4-CPU
    test session into a hang)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, min(16, cpus // 2))


#: fractional aggregator CPUs — joins coexist with map/actor stages
_JOIN_ARGS = {"num_cpus": 0.25}


def _verified_pair_ds(ds, pair_ds, threshold: float, shingle_n: int,
                      col: str, concurrency: int,
                      num_partitions: int | None = None) -> "ray.data.Dataset":
    """Exact-Jaccard verification, fully distributed: candidate pairs
    hash-join their two endpoint shingle sets (Ray native shuffle join
    — no driver materialization), then a per-pair exact Jaccard
    filter."""
    # two independent shingle passes (a-side, b-side): they pipeline
    # WITH the join stages — a shared materialized pass measured slower
    # (the barrier serializes shingling against the joins)
    sh_a = ds.map_batches(
        _shingle_sets_batch,
        fn_kwargs=dict(shingle_n=shingle_n, col=col, out_key="a",
                       out_col="_sh_a"),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=2048)
    sh_b = ds.map_batches(
        _shingle_sets_batch,
        fn_kwargs=dict(shingle_n=shingle_n, col=col, out_key="b",
                       out_col="_sh_b"),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=2048)
    P = num_partitions or _join_partitions()
    # barrier: complete the banding/candidate stage before the join
    # pipeline spins up its aggregator actors — running the MinHasher
    # actor pool, two shingle stages and two joins in ONE streaming
    # pipeline can exceed a small session's CPU slots and deadlock
    pair_ds = pair_ds.materialize()
    j = pair_ds.join(sh_a, join_type="inner", on=("a",),
                     num_partitions=P, aggregator_ray_remote_args=_JOIN_ARGS)
    j = j.join(sh_b, join_type="inner", on=("b",),
               num_partitions=P, aggregator_ray_remote_args=_JOIN_ARGS)

    def verify(batch: pa.Table) -> pa.Table:
        # returns TYPED ARROW even when empty (empty blocks otherwise
        # lose their schema in Ray's shuffle and poison downstream
        # joins); the per-pair loop intersects the two sorted hash
        # arrays — variable-length sets, so no batch-level kernel fits
        a_out, b_out, jac_out = [], [], []
        for a, b, sa, sb in zip(
                batch.column("a").to_numpy(zero_copy_only=False).tolist(),
                batch.column("b").to_numpy(zero_copy_only=False).tolist(),
                batch.column("_sh_a").to_pylist(),
                batch.column("_sh_b").to_pylist()):
            sa = np.frombuffer(sa, dtype=np.int64)
            sb = np.frombuffer(sb, dtype=np.int64)
            if sa.size == 0 or sb.size == 0:
                continue
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            jac = inter / (sa.size + sb.size - inter)
            if jac >= threshold:
                a_out.append(a)
                b_out.append(b)
                jac_out.append(jac)
        return pa.table({"a": pa.array(a_out, pa.int64()),
                         "b": pa.array(b_out, pa.int64()),
                         "jaccard": pa.array(jac_out, pa.float64())})

    return j.map_batches(verify, batch_format="pyarrow",
                         zero_copy_batch=True)


def _hashmin_labels(edges: "ray.data.Dataset", max_iters: int = 50,
                    num_partitions: int | None = None) -> "ray.data.Dataset":
    """Connected components over an edge Dataset by iterative hash-min
    label propagation — the distributed replacement for driver-side
    union-find.  Per iteration: every edge proposes min(label_a,
    label_b) to both endpoints (labels attached via Ray's native hash
    join); a vectorized groupby-min folds the proposals.  Labels only
    decrease, so an unchanged label SUM is an exact fixpoint test.
    Converges in O(cluster diameter) rounds (1 round for duplicate
    cliques, the common case)."""
    from ray.data.aggregate import Min

    edges = edges.select_columns(["a", "b"]).materialize()

    def first_msgs(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        m = np.minimum(a, b)
        return pa.table({"node": pa.array(np.concatenate([a, b])),
                         "cand": pa.array(np.concatenate([m, m]))})

    labels = (edges.map_batches(first_msgs, batch_format="pyarrow",
                                zero_copy_batch=True)
              .groupby("node").aggregate(Min("cand", alias_name="label"))
              .materialize())
    prev_sum = labels.sum("label") or 0

    def rename(cols):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns(cols)
        return fn

    def msgs(batch: pa.Table) -> pa.Table:
        la = batch.column("_la").to_numpy(zero_copy_only=False)
        lb = batch.column("_lb").to_numpy(zero_copy_only=False)
        m = np.minimum(la, lb)
        node = np.concatenate([batch.column("a").to_numpy(zero_copy_only=False),
                               batch.column("b").to_numpy(zero_copy_only=False)])
        return pa.table({"node": pa.array(node, pa.int64()),
                         "cand": pa.array(np.concatenate([m, m]), pa.int64())})

    converged = False
    for _ in range(max_iters):
        lab_a = labels.map_batches(rename(["a", "_la"]), batch_format="pyarrow")
        lab_b = labels.map_batches(rename(["b", "_lb"]), batch_format="pyarrow")
        P = num_partitions or _join_partitions()
        e = edges.join(lab_a, join_type="inner", on=("a",),
                       num_partitions=P, aggregator_ray_remote_args=_JOIN_ARGS)
        e = e.join(lab_b, join_type="inner", on=("b",),
                   num_partitions=P, aggregator_ray_remote_args=_JOIN_ARGS)
        labels = (e.map_batches(msgs, batch_format="pyarrow")
                  .groupby("node").aggregate(Min("cand", alias_name="label"))
                  .materialize())
        s = labels.sum("label") or 0
        if s == prev_sum:
            converged = True
            break
        prev_sum = s
    if not converged:
        # labels-only-decrease means a stalled sum is an exact fixpoint
        # test; exhausting the loop without one means some component has
        # diameter > max_iters and the labels are WRONG (split clusters)
        # — fail loudly rather than return silently-partial assignments
        raise RuntimeError(
            f"_hashmin_labels did not converge in max_iters={max_iters} "
            f"rounds (component diameter exceeds the budget — long "
            f"near-dup chains); raise max_iters, or pre-contract chains "
            f"with a coarser LSH threshold before clustering")
    return labels


def minhash_lsh_clusters(ds: "ray.data.Dataset", threshold: float = 0.8,
                         k: int = 64, bands: int = 16, shingle_n: int = 3,
                         col: str = "text", concurrency: int = 4,
                         driver_edge_budget: int = 1_000_000) -> pa.Table:
    """Near-dup clusters: (doc_id, cluster_id) for every doc in a
    verified near-dup cluster; cluster_id = min doc_id of the cluster.

    Every heavy stage is distributed: banding (map_batches), candidate
    pairs (groupby), exact-Jaccard verification (native hash-shuffle
    join + filter).  Round 1 pulled candidate pairs, involved TEXTS,
    and union-find state driver-side — a driver OOM on a
    near-dup-heavy 100-TB corpus.  Clustering is hybrid with an
    EXPLICIT budget: verified edge lists under ``driver_edge_budget``
    rows (16 B/edge — the texts never come back) use driver union-find
    (exact, low latency); above it, distributed hash-min label
    propagation (``_hashmin_labels``) runs entirely in the cluster and
    the driver sees only the final (doc_id, cluster_id) rows."""
    rows = ds.map_batches(
        MinHasher, fn_constructor_kwargs=dict(k=k, bands=bands,
                                              shingle_n=shingle_n, col=col),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=2048,
        concurrency=(1, concurrency),
    )
    pairs = _candidate_pair_ds(rows).materialize()
    n_trunc = pairs.sum("n_trunc") or 0
    if n_trunc:
        import warnings
        warnings.warn(
            f"{n_trunc} LSH bucket(s) exceeded max_group and were "
            f"truncated; recall may drop — dedup exact duplicates "
            f"first or raise max_group", stacklevel=2)
    pairs = pairs.select_columns(["a", "b"])
    verified = _verified_pair_ds(ds, pairs, threshold, shingle_n, col,
                                 concurrency)
    edges = verified.select_columns(["a", "b"]).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "cluster_id": pa.array([], pa.int64())})
    if n_edges <= driver_edge_budget:
        parent: dict = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for blk in edges.iter_batches(batch_format="pyarrow",
                                      batch_size=65536):
            for a, b in zip(
                    blk.column("a").to_numpy(zero_copy_only=False),
                    blk.column("b").to_numpy(zero_copy_only=False)):
                ra, rb = find(int(a)), find(int(b))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        members = sorted(parent)
        return pa.table({
            "doc_id": pa.array(members, pa.int64()),
            "cluster_id": pa.array([find(m) for m in members], pa.int64()),
        })
    labels = _hashmin_labels(edges)
    out = labels.to_pandas().sort_values("node").reset_index(drop=True)
    return pa.table({"doc_id": pa.array(out["node"].to_numpy(), pa.int64()),
                     "cluster_id": pa.array(out["label"].to_numpy(), pa.int64())})


# ----------------------------------------------------------------- simhash

_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount via an 8-bit lookup table (numpy
    1.x has no bitwise_count; the per-element bin().count() loop was a
    hot-path Python loop)."""
    if x.size == 0:
        return np.zeros(0, dtype=np.int64)
    b = np.ascontiguousarray(x, dtype=np.uint64).view(np.uint8)
    return _POPCNT8[b].reshape(x.shape + (8,)).sum(-1).astype(np.int64)


class SimHasher:
    """Actor-pool stage: text → 64-bit SimHash signature."""

    def __init__(self, shingle_n: int = 3, col: str = "text"):
        self.n, self.col = shingle_n, col

    def __call__(self, batch: pa.Table) -> pa.Table:
        sh = _word_shingle_hashes(batch.column(self.col).to_pylist(),
                                  self.n)
        bits = np.arange(64, dtype=np.uint64)
        sigs = np.empty(batch.num_rows, dtype=np.uint64)
        for i, h in enumerate(sh):
            if h.size == 0:
                sigs[i] = 0
                continue
            v = (((h[:, None] >> bits) & np.uint64(1)).astype(np.int64) * 2 - 1).sum(0)
            sigs[i] = np.uint64(((v > 0).astype(np.uint64) << bits).sum())
        return pa.table({"doc_id": batch.column("doc_id"),
                         "simhash": pa.array(sigs.astype(np.int64))})


def simhash_pairs(ds: "ray.data.Dataset", max_hamming: int = 6,
                  shingle_n: int = 3, col: str = "text",
                  concurrency: int = 4, bands: int = 8) -> "ray.data.Dataset":
    """Near-dup pairs by SimHash, AS A DATASET — (a, b, hamming), exact
    for ``max_hamming < bands``: band blocking over ``bands`` equal
    slices of the 64-bit signature guarantees no false negatives at
    Hamming ≤ bands-1 (pigeonhole); candidates verified exactly.

    Fully distributed end-to-end: a pair surfacing in several band
    buckets is deduped by a ``groupby(a, b)`` min-fold (hamming is a
    pure function of the two signatures, so min = the value) — round 2
    collected the pair set into a driver dict with no budget, the one
    dedup tail that would OOM the driver on a near-dup-heavy corpus."""
    sigs = ds.map_batches(
        SimHasher, fn_constructor_kwargs=dict(shingle_n=shingle_n, col=col),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=2048,
        concurrency=(1, concurrency),
    )

    width = 64 // bands
    mask = np.uint64((1 << width) - 1)

    def explode_bands(batch: pa.Table) -> pa.Table:
        s = batch.column("simhash").to_numpy(
            zero_copy_only=False).astype(np.uint64)
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        shifts = (np.uint64(width)
                  * np.arange(bands, dtype=np.uint64))[:, None]
        vals = ((s[None, :] >> shifts) & mask).reshape(-1)
        return pa.table({
            "doc_id": pa.array(np.tile(doc, bands)),
            "simhash": pa.array(np.tile(s.astype(np.int64), bands)),
            "band": pa.array(np.repeat(
                np.arange(bands, dtype=np.int64), len(s))),
            "band_val": pa.array(vals.astype(np.int64)),
        })

    exploded = sigs.map_batches(explode_bands, batch_format="pyarrow",
                                zero_copy_batch=True)

    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                             ("hamming", pa.int64())])

    def pairs_of(g: pa.Table) -> pa.Table:
        # coarse group: exact (band, band_val) grouping by one numpy
        # lexsort; returns TYPED ARROW even when empty (schema-less
        # empty blocks poison the downstream dedup shuffle)
        if g.num_rows == 0:
            return pair_schema.empty_table()
        band = g.column("band").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bv = g.column("band_val").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        doc = g.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sig = g.column("simhash").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        order, starts, ends = _band_runs(doc, band, bv)
        doc, sig = doc[order], sig[order]
        out = []
        for st, en in zip(starts.tolist(), ends.tolist()):
            docs, first = np.unique(doc[st:en], return_index=True)
            if len(docs) < 2:
                continue
            if len(docs) > 64:
                # same loud-truncation contract as the MinHash path:
                # the ray logger's records reach driver stdout, a bare
                # warnings.warn in a worker would vanish
                import logging
                logging.getLogger("ray.data").warning(
                    "SimHash band bucket with %d docs truncated to 64; "
                    "recall may drop — dedup exact duplicates first",
                    len(docs))
            sh = sig[st:en][first][:64]
            docs = docs[:64]
            for i in range(len(docs)):
                x = sh[i] ^ sh[i + 1:]
                ham = _popcount64(x)
                for j in np.flatnonzero(ham <= max_hamming):
                    out.append((docs[i], docs[i + 1 + j], int(ham[j])))
        out = sorted(set(out))
        return pa.table(
            {"a": pa.array([p[0] for p in out], pa.int64()),
             "b": pa.array([p[1] for p in out], pa.int64()),
             "hamming": pa.array([p[2] for p in out], pa.int64())},
            schema=pair_schema)

    pairs_of.__name__ = "SimHashPairs"

    def add_bucket(batch: pa.Table) -> pa.Table:
        bv = batch.column("band_val").to_numpy(
            zero_copy_only=False).astype(np.uint64)
        return batch.append_column(
            "bucket", pa.array((bv % np.uint64(256)).astype(np.int64)))

    pair_ds = exploded.map_batches(add_bucket, batch_format="pyarrow",
                                   zero_copy_batch=True).groupby(
        "bucket").map_groups(pairs_of, batch_format="pyarrow")
    # distributed cross-band dedup: min-fold over (a, b) — one shuffle
    # of 24-byte rows, never a driver-side dict
    from ray.data.aggregate import Min
    return (pair_ds.groupby(["a", "b"])
            .aggregate(Min("hamming", alias_name="hamming")))


# ------------------------------------------------------- n-gram jaccard


def ngram_jaccard_pairs(ds: "ray.data.Dataset", threshold: float = 0.5,
                        block_col: str = "source", col: str = "text",
                        max_block: int = 20_000) -> "ray.data.Dataset":
    """Exact word-set Jaccard pairs within blocks, AS A DATASET — the
    SQL-checkable ground-truth variant (DuckDB oracle: self-join on the
    block column with list_distinct/list_intersect).  Blocks are
    disjoint groups so each pair is emitted exactly once — no dedup
    shuffle needed; collection happens only in the query layer.

    Deliberately O(n²) per block; ``max_block`` is the guard rail — a
    coarse block column (round 1: ``source`` with 8 values over a
    whole corpus) silently becomes corpus²/8 at scale.  Blocks over
    the limit raise with a pointer to ``minhash_lsh_clusters``, the
    sub-quadratic path."""

    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                             ("jaccard", pa.float64())])

    def pairs_of(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:  # map_groups schema probe
            return pair_schema.empty_table()
        if g.num_rows > max_block:
            raise ValueError(
                f"ngram_jaccard_pairs block {g.column(block_col)[0].as_py()!r} "
                f"has {g.num_rows} docs (> max_block={max_block}); exact "
                f"pairwise Jaccard is quadratic per block — use "
                f"minhash_lsh_clusters for large corpora or pass a finer "
                f"block_col/max_block")
        g = g.sort_by("doc_id")
        docs = g.column("doc_id").to_numpy(zero_copy_only=False)
        sets = [set(s.lower().split()) for s in g.column(col).to_pylist()]
        out = []
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                inter = len(sets[i] & sets[j])
                union = len(sets[i] | sets[j])
                jac = inter / union if union else 0.0
                if jac >= threshold:
                    out.append((docs[i], docs[j], jac))
        return pa.table(
            {"a": pa.array([r[0] for r in out], pa.int64()),
             "b": pa.array([r[1] for r in out], pa.int64()),
             "jaccard": pa.array([r[2] for r in out], pa.float64())},
            schema=pair_schema)

    pairs_of.__name__ = "NgramJaccardPairs"
    return ds.groupby(block_col).map_groups(pairs_of,
                                            batch_format="pyarrow")


# -------------------------------------------------- embedding near-dup


def embedding_neardup_pairs(ds: "ray.data.Dataset", threshold: float = 0.95,
                            block_col: str = "label",
                            vec_col: str = "embedding",
                            id_col: str = "vec_id") -> "ray.data.Dataset":
    """Blocked pairwise cosine near-dup over an embedding column, AS A
    DATASET — numpy matmul per block inside map_groups; blocks are
    disjoint so each pair is emitted once (no dedup shuffle)."""

    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                             ("cosine", pa.float64())])

    def pairs_of(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:  # map_groups schema probe
            return pair_schema.empty_table()
        g = g.sort_by(id_col)
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        # float64 throughout so quantized cosines agree with the DuckDB
        # oracle's DOUBLE[] computation (float32 diverges at the 6th
        # dp); list columns arrive as either a plain ListArray or
        # Ray's tensor extension — both yield the (n, dim) matrix
        vnp = g.column(vec_col).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        m = (np.stack(vnp).astype(np.float64) if vnp.dtype == object
             else np.asarray(vnp, dtype=np.float64))
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mn = m / norms
        sim = mn @ mn.T
        iu = np.triu_indices(len(ids), k=1)
        mask = sim[iu] >= threshold
        a, b = ids[iu[0][mask]], ids[iu[1][mask]]
        return pa.table(
            {"a": pa.array(a.astype(np.int64), pa.int64()),
             "b": pa.array(b.astype(np.int64), pa.int64()),
             "cosine": pa.array(sim[iu][mask].astype(np.float64),
                                pa.float64())}, schema=pair_schema)

    pairs_of.__name__ = "EmbeddingNearDupPairs"
    return ds.groupby(block_col).map_groups(pairs_of,
                                            batch_format="pyarrow")


# ------------------------------------------- duplicated n-gram spans


def _flat_ngrams(texts: pd.Series, n: int) -> tuple[np.ndarray, np.ndarray]:
    """All word n-grams of a batch as two flat arrays (row index,
    ngram string) — one explode + n-1 shifted elementwise concats, no
    per-document loop.  Documents shorter than n words emit nothing."""
    words = texts.str.split()
    ex = words.explode().dropna()
    W = ex.to_numpy(dtype=object)
    rows = ex.index.to_numpy()
    m = len(W)
    if m < n:
        return np.zeros(0, np.int64), np.zeros(0, object)
    valid = rows[: m - n + 1] == rows[n - 1:]
    idx = np.nonzero(valid)[0]
    ng = W[idx].copy()
    for k in range(1, n):
        ng = ng + " " + W[idx + k]
    return rows[idx], ng


def dup_ngram_stats(ds: "ray.data.Dataset", n: int = 3, col: str = "text",
                    id_col: str = "doc_id",
                    buckets: int = 64) -> "ray.data.Dataset":
    """Per-document duplicated-ngram statistics — the measurement pass
    of exact-substring training-data dedup (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): for
    each document, how many of its word n-gram positions carry an
    n-gram that also appears in ANOTHER document.

    Returns a Dataset of (id_col, n_ngrams, n_dup_ngrams).

    Scale shape: one vectorized flat-ngram pass per batch combines to
    (h1, h2, doc, n_pos) rows (a 2×64-bit exact-equality key — the
    ngram STRING never shuffles); one coarse-bucket groupby flags
    cross-document keys with an in-bucket C-speed pandas pass (no
    per-ngram Python groups); one final per-doc sum.  Two shuffles of
    small fixed-width rows total.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(col).to_pandas()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        rows, ng = _flat_ngrams(texts, n)
        if len(ng) == 0:
            return pa.table({"h1": pa.array([], pa.int64()),
                             "h2": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "n_pos": pa.array([], pa.int64()),
                             "bkt": pa.array([], pa.int64())})
        nga = pa.array(ng, pa.string())
        h1 = hash_strings(nga, 0).astype(np.int64)
        h2 = hash_strings(nga, 1).astype(np.int64)
        df = pd.DataFrame({"h1": h1, "h2": h2, id_col: ids[rows]})
        g = (df.groupby(["h1", "h2", id_col], sort=False).size()
             .rename("n_pos").reset_index())
        g["bkt"] = (g["h1"].to_numpy().astype(np.uint64)
                    % np.uint64(buckets)).astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    grams = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    def flag_bucket(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        # one row per (ngram, doc) globally (a document is one input
        # row), so the group size IS the ngram's distinct-doc count
        nd = df.groupby(["h1", "h2"], sort=False)["n_pos"].transform("size")
        dup = np.where(nd.to_numpy() > 1, df["n_pos"].to_numpy(), 0)
        out = pd.DataFrame({id_col: df[id_col],
                            "n_ngrams": df["n_pos"].to_numpy(),
                            "n_dup_ngrams": dup})
        p = out.groupby(id_col, sort=False).sum().reset_index()
        return pa.Table.from_pandas(
            p.astype({"n_ngrams": np.int64, "n_dup_ngrams": np.int64}),
            preserve_index=False)

    return (grams.groupby("bkt").map_groups(flag_bucket,
                                            batch_format="pyarrow")
            .groupby(id_col)
            .aggregate(Sum("n_ngrams", alias_name="n_ngrams"),
                       Sum("n_dup_ngrams", alias_name="n_dup_ngrams")))


def incremental_new_docs(arriving: "ray.data.Dataset",
                         seen: "ray.data.Dataset",
                         col: str = "text", key: str = "doc_id",
                         prefix: int | None = None,
                         num_partitions: int | None = None) -> "ray.data.Dataset":
    """Incremental-ingest dedup: the rows of ``arriving`` whose content
    fingerprint never appears in ``seen`` (the already-committed lake
    state) — a native left_anti hash-shuffle join on the vectorized
    64-bit content hash, so neither side ever lands on the driver.

    ``prefix`` fingerprints only the first N chars (boilerplate
    lead-in dedup, the cross-epoch analog of ``clean_corpus``'s prefix
    pass); ``None`` hashes the full text.  A single 64-bit hash is the
    SQL-checkable variant (the oracle computes the identical hash in
    mod-2^64 SQL); pair it with ``variant=1`` for an effective 128-bit
    key at 10^10-doc scale, as ``exact_groups`` does."""
    from rookray.util import hash_strings

    def fp(batch: pa.Table, keep_key: bool) -> pa.Table:
        t = batch.column(col).combine_chunks()
        if prefix is not None:
            t = pc.utf8_slice_codeunits(t, 0, prefix)
        h = hash_strings(t).view(np.int64)
        cols: dict = {"fp": pa.array(h)}
        if keep_key:
            cols[key] = batch.column(key)
        return pa.table(cols)

    seen_fp = seen.map_batches(fp, fn_kwargs=dict(keep_key=False),
                               batch_format="pyarrow", zero_copy_batch=True)
    arr_fp = arriving.map_batches(fp, fn_kwargs=dict(keep_key=True),
                                  batch_format="pyarrow", zero_copy_batch=True)
    P = num_partitions or _join_partitions()
    return arr_fp.join(seen_fp, join_type="left_anti", on=("fp",),
                       num_partitions=P,
                       aggregator_ray_remote_args=_JOIN_ARGS)
