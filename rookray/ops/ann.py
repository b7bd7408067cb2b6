"""Approximate-nearest-neighbor similarity search over an embedding
column (``list<float>``).

* ``bruteforce_topk`` — the exactness baseline: the query matrix is
  broadcast ONCE via ``ray.put``; every batch computes a numpy matmul
  against it and emits only its per-batch top-k per query (a combiner),
  so the final reduce sees ``num_batches × k`` rows per query instead
  of the whole corpus.
* ``lsh_topk`` — the scale path: random-hyperplane LSH buckets
  (deterministic planes from a seed); queries only search their bucket
  (plus optional multi-probe neighbors).  Returns the same shape so
  recall vs brute force is directly measurable.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _list_matrix(col) -> np.ndarray:
    """2-D float64 matrix from an Arrow ``list<float>`` column — one
    flatten of the child values buffer, no per-row Python objects.
    Rows must share one dimension (embedding columns do)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    if n == 0:
        return flat.reshape(0, 0)
    return flat.reshape(n, -1)


_TOPK_SCHEMA = pa.schema([("query_id", pa.int64()),
                          ("neighbor_id", pa.int64()),
                          ("cosine", pa.float64())])


def _topk_table(qids: np.ndarray, ids: np.ndarray, cosine: np.ndarray
                ) -> pa.Table:
    return pa.table({"query_id": pa.array(qids.astype(np.int64)),
                     "neighbor_id": pa.array(ids.astype(np.int64)),
                     "cosine": pa.array(cosine.astype(np.float64))})


class _ScoreBatch:
    """map_batches stage: per-batch cosine top-k against broadcast queries."""

    def __init__(self, query_ref, k: int, vec_col: str, id_col: str):
        q = ray.get(query_ref)
        self.qids = q["ids"]
        self.qm = _normalize(q["matrix"])
        self.k = k
        self.vec_col, self.id_col = vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _TOPK_SCHEMA.empty_table()
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        m = _normalize(_list_matrix(batch.column(self.vec_col)))
        sim = self.qm @ m.T  # (Q, B)
        k = min(self.k, sim.shape[1])
        # deterministic tie-break (cosine DESC, neighbor_id ASC) BEFORE
        # truncating to k — argpartition's arbitrary tie order could drop
        # a lower-id neighbor tied at the k-boundary, diverging from the
        # SQL oracle's ordering
        ids_b = np.broadcast_to(ids, sim.shape)
        order = np.lexsort((ids_b, -sim), axis=1)[:, :k]
        return _topk_table(np.repeat(self.qids, k),
                           ids[order].reshape(-1),
                           np.take_along_axis(sim, order, axis=1).reshape(-1))


def _final_topk(g: pa.Table, k: int, exclude_self: bool) -> pa.Table:
    """Per-query reduce over the per-batch combiner rows (map_groups):
    cosine DESC, neighbor_id ASC, head k, 1-based rank."""
    q = g.column("query_id").to_numpy(zero_copy_only=False)
    nb = g.column("neighbor_id").to_numpy(zero_copy_only=False)
    cs = g.column("cosine").to_numpy(zero_copy_only=False)
    if exclude_self:
        keep = nb != q
        q, nb, cs = q[keep], nb[keep], cs[keep]
    order = np.lexsort((nb, -cs))[:k]
    return pa.table({
        "query_id": pa.array(q[order].astype(np.int64)),
        "neighbor_id": pa.array(nb[order].astype(np.int64)),
        "cosine": pa.array(cs[order].astype(np.float64)),
        "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
    })


def bruteforce_topk(ds: "ray.data.Dataset", query_ids: np.ndarray,
                    query_matrix: np.ndarray, k: int = 10,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    exclude_self: bool = True,
                    concurrency: int = 4) -> "ray.data.Dataset":
    """Exact cosine top-k: returns (query_id, neighbor_id, cosine, rank)."""
    ref = ray.put({"ids": np.asarray(query_ids), "matrix": np.asarray(query_matrix)})
    partial = ds.map_batches(
        _ScoreBatch, fn_constructor_args=(ref, k + (1 if exclude_self else 0),
                                          vec_col, id_col),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=4096, concurrency=(1, concurrency),
    )
    return partial.groupby("query_id").map_groups(
        lambda g: _final_topk(g, k, exclude_self), batch_format="pyarrow"
    )


def make_queries(ds: "ray.data.Dataset", n_queries: int,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
    """Deterministic query set: the n lowest ids.

    Per-batch min-n combiner instead of a global ``ds.sort`` — a full
    shuffle of the corpus to fetch 8 rows is the wrong shape at scale;
    each batch emits at most n candidate rows, the driver keeps the n
    smallest of the tiny union."""

    def smallest(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        idx = np.argsort(ids, kind="stable")[:n_queries]
        return batch.select([id_col, vec_col]).take(pa.array(idx))

    rows = ds.map_batches(smallest, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    rows.sort(key=lambda r: r[id_col])
    rows = rows[:n_queries]
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    return ids, mat


#: fixed-point scale for integer bucket math: float32 embeddings widen
#: to float64 exactly, ×2^20 then floor is bit-identical in numpy and
#: SQL, and 64-dim dot products of ±1 planes stay far inside int64
_LSH_QUANT = 1 << 20


def lsh_planes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic ±1 hyperplanes (sign-quantized Gaussian) — the
    integer-math plane family shared by the engine and the SQL oracle
    (inlined as a VALUES table, the targets/vector.py construction)."""
    rng = np.random.RandomState(seed)
    return np.where(rng.standard_normal((dim, n_planes)) > 0, 1, -1) \
        .astype(np.int64)


class _LshBucket:
    """Deterministic random-hyperplane bucketing (stateful stage).

    ``integer=True`` (default): ±1 planes against the fixed-point
    quantized embedding — every bucket bit is exact integer math, so
    the APPROXIMATE search carries an exact SQL oracle (no bit can
    flip between numpy's and the database's float summation order).
    ``integer=False`` keeps the classic Gaussian planes."""

    def __init__(self, dim: int, n_planes: int, seed: int, vec_col: str,
                 integer: bool = True):
        self.integer = integer
        if integer:
            self.planes = lsh_planes(dim, n_planes, seed)
        else:
            rng = np.random.RandomState(seed)
            self.planes = rng.standard_normal((dim, n_planes))
        self.vec_col = vec_col

    def bucket_of(self, m: np.ndarray) -> np.ndarray:
        if self.integer:
            q = np.floor(m.astype(np.float64) * np.float64(_LSH_QUANT)) \
                .astype(np.int64)
            bits = (q @ self.planes) > 0
        else:
            bits = (m @ self.planes) > 0
        return (bits * (1 << np.arange(bits.shape[1]))).sum(1).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("bucket",
                                       pa.array([], pa.int64()))
        m = _list_matrix(batch.column(self.vec_col))
        return batch.append_column(
            "bucket", pa.array(self.bucket_of(m), pa.int64()))


def lsh_topk(ds: "ray.data.Dataset", query_ids: np.ndarray,
             query_matrix: np.ndarray, k: int = 10, n_planes: int = 4,
             seed: int = 42, vec_col: str = "embedding",
             id_col: str = "vec_id", exclude_self: bool = True,
             concurrency: int = 4,
             bucket_math: str = "int") -> "ray.data.Dataset":
    """LSH-bucketed cosine top-k: each query searches only its bucket.

    ``n_planes`` controls the fan-in (2^planes buckets); recall vs
    ``bruteforce_topk`` is the quality metric (measured in tests).
    ``bucket_math="int"`` (default) uses the ±1-plane fixed-point
    bucketing, making even the approximate setting SQL-oracle-exact;
    ``"float"`` keeps Gaussian planes."""
    rows = ds.take(1)
    dim = len(rows[0][vec_col])
    bucketer = _LshBucket(dim, n_planes, seed, vec_col,
                          integer=(bucket_math == "int"))
    qbuckets = bucketer.bucket_of(np.asarray(query_matrix))
    by_bucket: dict[int, list[int]] = {}
    for i, b in enumerate(qbuckets):
        by_bucket.setdefault(int(b), []).append(i)
    ref = ray.put({"ids": np.asarray(query_ids), "matrix": np.asarray(query_matrix),
                   "by_bucket": by_bucket})

    class ScoreBucketed:
        def __init__(self):
            q = ray.get(ref)
            self.qids, self.by_bucket = q["ids"], q["by_bucket"]
            self.qm = _normalize(q["matrix"])
            self.bucketer = bucketer

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _TOPK_SCHEMA.empty_table()
            m = _list_matrix(batch.column(vec_col))
            buckets = self.bucketer.bucket_of(m)
            all_ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            outs = []
            for b in np.unique(buckets):
                qidx = self.by_bucket.get(int(b))
                if not qidx:
                    continue
                sel = buckets == b
                ids = all_ids[sel]
                mm = _normalize(m[sel])
                sim = self.qm[qidx] @ mm.T
                kk = min(k + 1, sim.shape[1])
                ids_b = np.broadcast_to(ids, sim.shape)
                idx = np.lexsort((ids_b, -sim), axis=1)[:, :kk]
                outs.append(_topk_table(
                    np.repeat(self.qids[qidx], kk),
                    ids[idx].reshape(-1),
                    np.take_along_axis(sim, idx, axis=1).reshape(-1)))
            if not outs:
                return _TOPK_SCHEMA.empty_table()
            return pa.concat_tables(outs)

    ScoreBucketed.__name__ = "ScoreBucketed"
    partial = ds.map_batches(ScoreBucketed, batch_format="pyarrow",
                             zero_copy_batch=True,
                             batch_size=4096, concurrency=(1, concurrency))
    return partial.groupby("query_id").map_groups(
        lambda g: _final_topk(g, k, exclude_self), batch_format="pyarrow"
    )


def build_ivf_centroids(ds: "ray.data.Dataset", n_centroids: int = 16,
                        sample: int = 2048, iters: int = 5, seed: int = 42,
                        vec_col: str = "embedding") -> np.ndarray:
    """Deterministic spherical k-means centroids from a BOUNDED sample
    (the IVF coarse quantizer).  Driver work is O(sample × iters) —
    the corpus itself never materializes; at larger scale the Lloyd
    iterations would move into map_batches (assign) + groupby (update),
    same shape as the bucketed scoring below."""
    rows = ds.limit(sample).take_all()
    m = _normalize(np.stack([np.asarray(r[vec_col], dtype=np.float64)
                             for r in rows]))
    rng = np.random.RandomState(seed)
    cents = m[rng.choice(len(m), size=min(n_centroids, len(m)),
                         replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cents.T, axis=1)
        for c in range(len(cents)):
            sel = m[assign == c]
            if len(sel):
                v = sel.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def build_ivf_centroids_distributed(ds: "ray.data.Dataset",
                                    n_centroids: int = 16, iters: int = 5,
                                    seed: int = 42,
                                    vec_col: str = "embedding") -> np.ndarray:
    """Spherical k-means trained on the FULL corpus with distributed
    Lloyd iterations — the 100-TB path the sampled builder
    (``build_ivf_centroids``) approximates.

    Per iteration: centroids broadcast once via ``ray.put``; each batch
    assigns its vectors to the nearest centroid and emits PARTIAL
    per-cell (sum-vector, count) rows flattened to (cell, dim, v, n) —
    one combiner row per (cell, dim) per batch, so the shuffle carries
    O(batches × cells × dim) tiny rows, never vectors; a distributed
    ``groupby(cell, dim).sum`` folds them and only the (cells × dim)
    result lands on the driver to form the next centroids.  Labels are
    deterministic (seeded init from a bounded sample, argmax
    tie-break-by-index), so two runs produce identical centroids."""
    from ray.data.aggregate import Sum

    # deterministic init: same bounded-sample choice as the sampled
    # builder, so the two builders start identically
    rows = ds.limit(max(n_centroids * 8, 256)).take_all()
    m0 = _normalize(np.stack([np.asarray(r[vec_col], dtype=np.float64)
                              for r in rows]))
    rng = np.random.RandomState(seed)
    cents = m0[rng.choice(len(m0), size=min(n_centroids, len(m0)),
                          replace=False)].copy()
    dim = cents.shape[1]

    for _ in range(iters):
        ref = ray.put(cents)

        def partials(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            if batch.num_rows == 0:
                return pa.table({"cell": pa.array([], pa.int64()),
                                 "dim": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.float64()),
                                 "n": pa.array([], pa.int64())})
            m = _normalize(_list_matrix(batch.column(vec_col)))
            assign = np.argmax(m @ c.T, axis=1)
            cells = np.unique(assign)
            # per-batch combiner: one (cell, dim) row per present cell
            sums = np.zeros((len(cells), dim))
            counts = np.zeros(len(cells), dtype=np.int64)
            for j, cell in enumerate(cells):  # ≤ n_centroids iterations
                sel = assign == cell
                sums[j] = m[sel].sum(axis=0)
                counts[j] = int(sel.sum())
            cell_rep = np.repeat(cells.astype(np.int64), dim)
            dim_idx = np.tile(np.arange(dim, dtype=np.int64), len(cells))
            return pa.table({
                "cell": pa.array(cell_rep, pa.int64()),
                "dim": pa.array(dim_idx, pa.int64()),
                "v": pa.array(sums.reshape(-1), pa.float64()),
                "n": pa.array(np.repeat(counts, dim), pa.int64()),
            })

        agg = (ds.map_batches(partials, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=4096)
               .groupby(["cell", "dim"])
               .aggregate(Sum("v", alias_name="v"), Sum("n", alias_name="n"))
               .to_pandas())  # tiny: cells × dim rows
        new = cents.copy()
        counts = np.zeros(len(cents), dtype=np.int64)
        cell = agg["cell"].to_numpy()
        dim_i = agg["dim"].to_numpy()
        sums = np.zeros((len(cents), dim))
        sums[cell, dim_i] = agg["v"].to_numpy()
        first_dim = dim_i == 0
        counts[cell[first_dim]] = (agg["n"].to_numpy()[first_dim] // 1)
        nonempty = counts > 0
        new[nonempty] = sums[nonempty] / counts[nonempty, None]
        norms = np.linalg.norm(new, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        new = new / norms
        if np.allclose(new, cents, atol=1e-12):
            cents = new
            break
        cents = new
    return cents


def ivf_topk(ds: "ray.data.Dataset", query_ids: np.ndarray,
             query_matrix: np.ndarray, k: int = 10, n_centroids: int = 16,
             nprobe: int = 4, seed: int = 42, vec_col: str = "embedding",
             id_col: str = "vec_id", exclude_self: bool = True,
             concurrency: int = 4,
             train: str = "sample") -> "ray.data.Dataset":
    """IVF cosine top-k — the inverted-file scale path alongside
    ``lsh_topk``: vectors are coarse-quantized to their nearest
    centroid; each query scores only the vectors in its ``nprobe``
    nearest cells (≈ nprobe/n_centroids of the corpus).  Centroids and
    the per-query probe lists are broadcast once via ``ray.put``;
    recall vs ``bruteforce_topk`` is the quality metric (tested);
    ``nprobe == n_centroids`` degenerates to exhaustive search.
    ``train="distributed"`` runs full-corpus Lloyd iterations
    (``build_ivf_centroids_distributed``) instead of the bounded-sample
    builder — the 100-TB training path."""
    if train == "distributed":
        cents = build_ivf_centroids_distributed(ds, n_centroids, seed=seed,
                                                vec_col=vec_col)
    else:
        cents = build_ivf_centroids(ds, n_centroids, seed=seed,
                                    vec_col=vec_col)
    qm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    order = np.argsort(-(qm @ cents.T), axis=1)[:, :nprobe]
    probe_of_cell: dict[int, list[int]] = {}
    for qi in range(len(qm)):
        for c in order[qi]:
            probe_of_cell.setdefault(int(c), []).append(qi)
    ref = ray.put({"cents": cents, "ids": np.asarray(query_ids),
                   "matrix": qm, "probe_of_cell": probe_of_cell})

    class ScoreIvf:
        def __init__(self):
            q = ray.get(ref)
            self.cents = q["cents"]
            self.qids, self.qm = q["ids"], q["matrix"]
            self.probe_of_cell = q["probe_of_cell"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _TOPK_SCHEMA.empty_table()
            m = _normalize(_list_matrix(batch.column(vec_col)))
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            cell = np.argmax(m @ self.cents.T, axis=1)
            outs = []
            for c in np.unique(cell):
                qidx = self.probe_of_cell.get(int(c))
                if not qidx:
                    continue
                sel = cell == c
                mm, mids = m[sel], ids[sel]
                sim = self.qm[qidx] @ mm.T
                kk = min(k + 1, sim.shape[1])
                ids_b = np.broadcast_to(mids, sim.shape)
                idx = np.lexsort((ids_b, -sim), axis=1)[:, :kk]
                outs.append(_topk_table(
                    np.repeat(self.qids[qidx], kk),
                    mids[idx].reshape(-1),
                    np.take_along_axis(sim, idx, axis=1).reshape(-1)))
            if not outs:
                return _TOPK_SCHEMA.empty_table()
            return pa.concat_tables(outs)

    ScoreIvf.__name__ = "ScoreIvf"
    partial = ds.map_batches(ScoreIvf, batch_format="pyarrow",
                             zero_copy_batch=True,
                             batch_size=4096, concurrency=(1, concurrency))
    return partial.groupby("query_id").map_groups(
        lambda g: _final_topk(g, k, exclude_self), batch_format="pyarrow"
    )


def _train_pq_codebooks(vecs: np.ndarray, n_subspaces: int, n_codes: int,
                        iters: int = 8, seed: int = 42) -> np.ndarray:
    """Deterministic per-subspace k-means codebooks over a training
    matrix (each subspace independent — product quantization).
    Returns (n_subspaces, n_codes, sub_dim)."""
    n, dim = vecs.shape
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by {n_subspaces} "
                         f"subspaces")
    sd = dim // n_subspaces
    rng = np.random.RandomState(seed)
    books = np.zeros((n_subspaces, n_codes, sd))
    for s in range(n_subspaces):
        sub = vecs[:, s * sd:(s + 1) * sd]
        kk = min(n_codes, len(sub))
        cents = sub[rng.choice(len(sub), size=kk, replace=False)].copy()
        for _ in range(iters):
            d = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d, axis=1)
            for c in range(kk):
                sel = sub[assign == c]
                if len(sel):
                    cents[c] = sel.mean(axis=0)
        books[s, :kk] = cents
        if kk < n_codes:
            books[s, kk:] = cents[0]   # degenerate fill, never nearest
    return books


def ivfpq_encode(ds: "ray.data.Dataset", cents: np.ndarray,
                 books: np.ndarray, vec_col: str = "embedding",
                 id_col: str = "vec_id") -> "ray.data.Dataset":
    """Distributed PQ encoding — the compressed index build: each
    vector stores only its coarse cell + one one-byte code per subspace
    (M bytes instead of dim × 4).  Residual encoding (vector minus its
    coarse centroid) is quantized, the standard IVF-PQ layout."""
    n_sub, n_codes, sd = books.shape
    ref = ray.put({"cents": cents, "books": books})

    def encode(batch: pa.Table) -> pa.Table:
        q = ray.get(ref)
        c, b = q["cents"], q["books"]
        if batch.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "cell": pa.array([], pa.int64()),
                 **{f"code{s}": pa.array([], pa.uint8())
                    for s in range(n_sub)}})
        m = _normalize(_list_matrix(batch.column(vec_col)))
        cell = np.argmax(m @ c.T, axis=1)
        resid = m - c[cell]
        cols = {id_col: pa.array(batch.column(id_col)
                                 .to_numpy(zero_copy_only=False)
                                 .astype(np.int64)),
                "cell": pa.array(cell.astype(np.int64))}
        for s in range(n_sub):
            sub = resid[:, s * sd:(s + 1) * sd]
            d = ((sub[:, None, :] - b[s][None, :, :]) ** 2).sum(axis=2)
            cols[f"code{s}"] = pa.array(np.argmin(d, axis=1).astype(np.uint8))
        return pa.table(cols)

    return ds.map_batches(encode, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=4096)


def ivfpq_topk(ds: "ray.data.Dataset", query_ids: np.ndarray,
               query_matrix: np.ndarray, k: int = 10,
               n_centroids: int = 16, nprobe: int = 4,
               n_subspaces: int = 8, n_codes: int = 32,
               train_sample: int = 2048, seed: int = 42,
               vec_col: str = "embedding", id_col: str = "vec_id",
               exclude_self: bool = True,
               concurrency: int = 4) -> "ray.data.Dataset":
    """IVF-PQ cosine top-k — the MEMORY-compressed inverted-file path:
    alongside ``ivf_topk``'s pruning (score a fraction of the corpus),
    PQ collapses each stored vector to ``n_subspaces`` one-byte codes,
    so the scan state per worker is ~M bytes/vector instead of the raw
    matrix — the layout that makes billion-vector indexes fit a node
    (Jégou et al., "Product Quantization for Nearest Neighbor
    Search", TPAMI 2011).

    Scoring is ADC (asymmetric distance computation): per (query,
    probed cell) a LUT of ``q_sub · codebook[s]`` inner products is
    built once, and each indexed vector's score is
    ``q · centroid[cell] + Σ_s LUT[s, code_s]`` — a pure table gather,
    no float vectors touched at scan time.  Approximate by
    construction (quantization error): recall vs ``bruteforce_topk``
    is the quality metric; see ``test_ivfpq_recall_and_determinism``.
    """
    cents = build_ivf_centroids(ds, n_centroids, seed=seed,
                                vec_col=vec_col)
    rows = ds.limit(train_sample).take_all()
    train = _normalize(np.stack([np.asarray(r[vec_col], dtype=np.float64)
                                 for r in rows]))
    cell0 = np.argmax(train @ cents.T, axis=1)
    books = _train_pq_codebooks(train - cents[cell0], n_subspaces,
                                n_codes, seed=seed)
    index = ivfpq_encode(ds, cents, books, vec_col, id_col)

    qm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    order = np.argsort(-(qm @ cents.T), axis=1)[:, :nprobe]
    probe_of_cell: dict[int, list[int]] = {}
    for qi in range(len(qm)):
        for c in order[qi]:
            probe_of_cell.setdefault(int(c), []).append(qi)
    n_sub, _, sd = books.shape
    # per-query LUTs: q_sub · codebook — (n_queries, n_sub, n_codes)
    luts = np.stack([qm[:, s * sd:(s + 1) * sd] @ books[s].T
                     for s in range(n_sub)], axis=1)
    qcent = qm @ cents.T                       # (n_queries, n_centroids)
    ref = ray.put({"ids": np.asarray(query_ids), "luts": luts,
                   "qcent": qcent, "probe_of_cell": probe_of_cell})

    class ScoreAdc:
        def __init__(self):
            q = ray.get(ref)
            self.qids, self.luts = q["ids"], q["luts"]
            self.qcent = q["qcent"]
            self.probe_of_cell = q["probe_of_cell"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _TOPK_SCHEMA.empty_table()
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            cell = batch.column("cell").to_numpy(zero_copy_only=False)
            codes = np.stack([
                batch.column(f"code{s}").to_numpy(zero_copy_only=False)
                for s in range(n_sub)], axis=1).astype(np.int64)
            outs = []
            for c in np.unique(cell):
                qidx = self.probe_of_cell.get(int(c))
                if not qidx:
                    continue
                sel = cell == c
                mids, mcodes = ids[sel], codes[sel]
                # ADC gather: (len(qidx), n_vecs) from the LUTs
                sim = self.qcent[qidx, c][:, None] + np.sum(
                    self.luts[np.asarray(qidx)[:, None, None],
                              np.arange(n_sub)[None, :, None],
                              mcodes.T[None, :, :]], axis=1)
                kk = min(k + 1, sim.shape[1])
                ids_b = np.broadcast_to(mids, sim.shape)
                idx = np.lexsort((ids_b, -sim), axis=1)[:, :kk]
                outs.append(_topk_table(
                    np.repeat(self.qids[qidx], kk),
                    mids[idx].reshape(-1),
                    np.take_along_axis(sim, idx, axis=1).reshape(-1)))
            if not outs:
                return _TOPK_SCHEMA.empty_table()
            return pa.concat_tables(outs)

    ScoreAdc.__name__ = "ScoreAdc"
    partial = index.map_batches(ScoreAdc, batch_format="pyarrow",
                                zero_copy_batch=True, batch_size=4096,
                                concurrency=(1, concurrency))
    return partial.groupby("query_id").map_groups(
        lambda g: _final_topk(g, k, exclude_self), batch_format="pyarrow"
    )


def recall_at_k(approx: pa.Table, exact: pa.Table, k: int = 10) -> float:
    """Mean fraction of exact top-k recovered by the approximate search."""
    a = approx.to_pandas().groupby("query_id")["neighbor_id"].apply(set)
    e = exact.to_pandas().groupby("query_id")["neighbor_id"].apply(set)
    scores = [len(a.get(q, set()) & e[q]) / max(1, len(e[q])) for q in e.index]
    return float(np.mean(scores)) if scores else 0.0
