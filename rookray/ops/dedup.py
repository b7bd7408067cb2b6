"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Scale shape (per the Ray Data guide's dedup pattern):

* exact dedup = content-hash in a vectorized map_batches, then
  ``groupby(hash)`` keep-first — one shuffle of (hash, doc_id) pairs
  only (never the text);
* MinHash-LSH = shingle→minhash per batch (numpy-vectorized across the
  whole batch), explode to (band, band_hash, doc_id) rows, one groupby
  over those tiny rows, candidate pairs verified by exact Jaccard over
  ONLY the involved docs (second pruned pass), connected components on
  the driver over the (small) verified-pair set;
* SimHash = 64-bit signature per batch, 4×16-bit band blocking
  (Hamming ≤ 3 ⇒ at least one band equal), verify Hamming on
  candidates;
* n-gram Jaccard = exact pairwise within cheap blocks (``map_groups``),
  for SQL-checkable ground truth;
* embedding near-dup = blocked pairwise cosine via numpy matmul in
  ``map_groups``.
"""

from __future__ import annotations

import hashlib

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
    content hash, with its duplicate-group size."""

    def partial(batch: pa.Table) -> pa.Table:
        # per-batch combiner: hash + in-batch min/count per hash, so the
        # shuffle ships one row per (hash, batch) instead of per doc
        text = batch.column(col).to_pandas()
        md5 = text.map(lambda s: hashlib.md5(s.encode()).hexdigest())
        df = pd.DataFrame(
            {"doc_id": batch.column("doc_id").to_numpy(zero_copy_only=False),
             "h": md5}
        )
        g = (df.groupby("h", sort=False)
             .agg(doc_id=("doc_id", "min"), group_size=("doc_id", "size"))
             .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Min, Sum

    hashed = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = hashed.groupby("h").aggregate(
        Min("doc_id", alias_name="doc_id"),
        Sum("group_size", alias_name="group_size"),
    )
    return out.select_columns(["doc_id", "group_size"])


# ------------------------------------------------------------- shingling


def _word_shingle_hashes(texts: pd.Series, n: int = 3) -> list[np.ndarray]:
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

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sh = _word_shingle_hashes(batch[self.col], self.n)
        sigs = _minhash_batch(sh, self.k, self.seed)
        n = len(batch)
        band_hash = np.empty((n, self.bands), dtype=np.uint64)
        for b in range(self.bands):
            seg = sigs[:, b * self.rows:(b + 1) * self.rows]
            h = np.zeros(n, dtype=np.uint64)
            for r in range(self.rows):
                h = h * np.uint64(1099511628211) + seg[:, r]
            band_hash[:, b] = h
        doc = np.repeat(batch["doc_id"].to_numpy(), self.bands)
        band = np.tile(np.arange(self.bands, dtype=np.int32), n)
        return pd.DataFrame(
            {"doc_id": doc, "band": band,
             "band_hash": band_hash.reshape(-1).astype(np.int64)}
        )


def _candidate_pairs(grouped: "ray.data.Dataset", max_group: int = 64,
                     coarse: int = 512) -> set[tuple]:
    """Collect candidate pairs from band-hash buckets (small output).

    Groups by a COARSE bucket of the band hash (≤``coarse`` Ray groups)
    and does the exact per-(band, band_hash) grouping vectorized in
    pandas inside each group — thousands of tiny Ray groups would pay
    ~1ms each in per-group overhead, the coarse bucketing amortizes it."""

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["bucket"] = (batch["band_hash"].to_numpy().astype(np.uint64)
                           % np.uint64(coarse)).astype(np.int64)
        return batch

    def pairs_of(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, sub in g.groupby(["band", "band_hash"], sort=False):
            if len(sub) < 2:
                continue
            docs = sorted(set(sub["doc_id"]))[:max_group]
            out.extend((a, b) for i, a in enumerate(docs) for b in docs[i + 1:])
        if not out:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        return pd.DataFrame(sorted(set(out)), columns=["a", "b"])

    pair_ds = grouped.map_batches(add_bucket, batch_format="pandas").groupby(
        "bucket").map_groups(pairs_of, batch_format="pandas")
    return {(r["a"], r["b"]) for r in pair_ds.take_all()}


def _verify_jaccard(ds, pairs: set[tuple], threshold: float,
                    shingle_n: int, col: str) -> list[tuple]:
    """Exact Jaccard over ONLY the docs named in candidate pairs."""
    involved = sorted({d for p in pairs for d in p})
    if not involved:
        return []
    inv_ref = ray.put(set(involved))

    def only_involved(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch.column("doc_id"),
                        value_set=pa.array(sorted(ray.get(inv_ref))))
        return batch.filter(keep)

    small = ds.map_batches(only_involved, batch_format="pyarrow").take_all()
    texts = {r["doc_id"]: r[col] for r in small}
    sets = {}
    for d, s in texts.items():
        words = s.lower().split()
        sets[d] = ({" ".join(words[i:i + shingle_n]) for i in range(len(words) - shingle_n + 1)}
                   if len(words) >= shingle_n else {" ".join(words)})
    out = []
    for a, b in sorted(pairs):
        sa, sb = sets.get(a), sets.get(b)
        if not sa or not sb:
            continue
        j = len(sa & sb) / max(1, len(sa | sb))
        if j >= threshold:
            out.append((a, b, j))
    return out


def minhash_lsh_clusters(ds: "ray.data.Dataset", threshold: float = 0.8,
                         k: int = 64, bands: int = 16, shingle_n: int = 3,
                         col: str = "text", concurrency: int = 4) -> pa.Table:
    """Near-dup clusters: (doc_id, cluster_id) for every doc in a
    verified near-dup cluster; cluster_id = min doc_id of the cluster.

    Driver-side work is bounded by the candidate-pair set (tiny vs the
    corpus); everything heavy is map_batches / groupby."""
    rows = ds.map_batches(
        MinHasher, fn_constructor_kwargs=dict(k=k, bands=bands,
                                              shingle_n=shingle_n, col=col),
        batch_format="pandas", batch_size=2048, concurrency=(1, concurrency),
    )
    pairs = _candidate_pairs(rows)
    verified = _verify_jaccard(ds, pairs, threshold, shingle_n, col)
    # union-find over the verified pairs (small by construction)
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in verified:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members = sorted(parent)
    return pa.table(
        {
            "doc_id": pa.array(members, pa.int64()),
            "cluster_id": pa.array([find(m) for m in members], pa.int64()),
        }
    )


# ----------------------------------------------------------------- simhash


class SimHasher:
    """Actor-pool stage: text → 64-bit SimHash signature."""

    def __init__(self, shingle_n: int = 3, col: str = "text"):
        self.n, self.col = shingle_n, col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sh = _word_shingle_hashes(batch[self.col], self.n)
        bits = np.arange(64, dtype=np.uint64)
        sigs = np.empty(len(batch), dtype=np.uint64)
        for i, h in enumerate(sh):
            if h.size == 0:
                sigs[i] = 0
                continue
            v = (((h[:, None] >> bits) & np.uint64(1)).astype(np.int64) * 2 - 1).sum(0)
            sigs[i] = np.uint64(((v > 0).astype(np.uint64) << bits).sum())
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(),
             "simhash": sigs.astype(np.int64)}
        )


def simhash_pairs(ds: "ray.data.Dataset", max_hamming: int = 6,
                  shingle_n: int = 3, col: str = "text",
                  concurrency: int = 4, bands: int = 8) -> pa.Table:
    """Near-dup pairs by SimHash: band blocking over ``bands`` equal
    slices of the 64-bit signature guarantees no false negatives at
    Hamming ≤ bands-1 (pigeonhole); candidates verified exactly."""
    sigs = ds.map_batches(
        SimHasher, fn_constructor_kwargs=dict(shingle_n=shingle_n, col=col),
        batch_format="pandas", batch_size=2048, concurrency=(1, concurrency),
    )

    width = 64 // bands
    mask = np.uint64((1 << width) - 1)

    def explode_bands(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["simhash"].to_numpy().astype(np.uint64)
        rows = []
        for b in range(bands):
            band_val = (s >> np.uint64(width * b)) & mask
            rows.append(pd.DataFrame({
                "doc_id": batch["doc_id"].to_numpy(),
                "simhash": batch["simhash"].to_numpy(),
                "band": b,
                "band_val": band_val.astype(np.int64),
            }))
        return pd.concat(rows, ignore_index=True)

    exploded = sigs.map_batches(explode_bands, batch_format="pandas")

    def pairs_of(g: pd.DataFrame) -> pd.DataFrame:
        # coarse group: exact (band, band_val) grouping done in pandas
        out = []
        for _, sub in g.groupby(["band", "band_val"], sort=False):
            if len(sub) < 2:
                continue
            sub = sub.drop_duplicates("doc_id").sort_values("doc_id")
            docs = sub["doc_id"].to_numpy()[:64]
            sh = sub["simhash"].to_numpy().astype(np.uint64)[:64]
            for i in range(len(docs)):
                x = sh[i] ^ sh[i + 1:]
                ham = np.array([bin(int(v)).count("1") for v in x])
                for j in np.flatnonzero(ham <= max_hamming):
                    out.append((docs[i], docs[i + 1 + j], int(ham[j])))
        if not out:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        return pd.DataFrame(sorted(set(out)), columns=["a", "b", "hamming"])

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["bucket"] = (batch["band_val"].to_numpy().astype(np.uint64)
                           % np.uint64(256)).astype(np.int64)
        return batch

    pair_ds = exploded.map_batches(add_bucket, batch_format="pandas").groupby(
        "bucket").map_groups(pairs_of, batch_format="pandas")
    seen = {}
    for r in pair_ds.take_all():
        seen[(r["a"], r["b"])] = r["hamming"]
    pairs = sorted(seen)
    return pa.table(
        {"a": pa.array([p[0] for p in pairs], pa.int64()),
         "b": pa.array([p[1] for p in pairs], pa.int64()),
         "hamming": pa.array([seen[p] for p in pairs], pa.int64())}
    )


# ------------------------------------------------------- n-gram jaccard


def ngram_jaccard_pairs(ds: "ray.data.Dataset", threshold: float = 0.5,
                        block_col: str = "source", col: str = "text") -> pa.Table:
    """Exact word-set Jaccard pairs within blocks — the SQL-checkable
    ground-truth variant (DuckDB oracle: self-join on the block column
    with list_distinct/list_intersect)."""

    def pairs_of(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        docs = g["doc_id"].to_numpy()
        sets = [set(s.lower().split()) for s in g[col]]
        out = []
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                inter = len(sets[i] & sets[j])
                union = len(sets[i] | sets[j])
                jac = inter / union if union else 0.0
                if jac >= threshold:
                    out.append((docs[i], docs[j], jac))
        if not out:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "jaccard": pd.Series([], dtype="float64")})
        return pd.DataFrame(out, columns=["a", "b", "jaccard"])

    pair_ds = ds.groupby(block_col).map_groups(pairs_of, batch_format="pandas")
    rows = sorted(
        ((r["a"], r["b"], r["jaccard"]) for r in pair_ds.take_all())
    )
    return pa.table(
        {"a": pa.array([r[0] for r in rows], pa.int64()),
         "b": pa.array([r[1] for r in rows], pa.int64()),
         "jaccard": pa.array([r[2] for r in rows], pa.float64())}
    )


# -------------------------------------------------- embedding near-dup


def embedding_neardup_pairs(ds: "ray.data.Dataset", threshold: float = 0.95,
                            block_col: str = "label",
                            vec_col: str = "embedding",
                            id_col: str = "vec_id") -> pa.Table:
    """Blocked pairwise cosine near-dup over an embedding column —
    numpy matmul per block inside map_groups."""

    def pairs_of(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        # float64 throughout so quantized cosines agree with the DuckDB
        # oracle's DOUBLE[] computation (float32 diverges at the 6th dp)
        m = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mn = m / norms
        sim = mn @ mn.T
        iu = np.triu_indices(len(ids), k=1)
        mask = sim[iu] >= threshold
        a, b = ids[iu[0][mask]], ids[iu[1][mask]]
        return pd.DataFrame({"a": a.astype(np.int64), "b": b.astype(np.int64),
                             "cosine": sim[iu][mask].astype(np.float64)})

    pair_ds = ds.groupby(block_col).map_groups(pairs_of, batch_format="pandas")
    rows = sorted(((r["a"], r["b"], r["cosine"]) for r in pair_ds.take_all()))
    return pa.table(
        {"a": pa.array([r[0] for r in rows], pa.int64()),
         "b": pa.array([r[1] for r in rows], pa.int64()),
         "cosine": pa.array([r[2] for r in rows], pa.float64())}
    )
