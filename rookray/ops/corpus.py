"""Composed corpus-cleaning pipeline: quality filter → boilerplate
prefix dedup → tokenize → GPT-style sequence packing.

The end-to-end training-data shape, entirely vectorized and entirely
SQL-checkable (see CORPUS_CLEAN_PACK_SQL in rookray.queries): every
stage is a Dataset transform, intermediates never land on the driver.

* quality filter — the same fixed formula as ``ops.text.quality_batch``
  (stopword/word-length reward minus punctuation penalty), compared on
  the QUANTIZED integer score so the engine and the DuckDB oracle make
  the identical keep/drop decision at the threshold boundary (raw
  float comparison could flip a doc within 1 ulp of the cut);
* prefix dedup — one survivor (min doc_id) per distinct first-N-token
  prefix: the cheap boilerplate-removal pass (identical lead-ins are
  near-certain template dups); same hash-pair + groupby + semi-join
  shape as ``ops.dedup.exact_groups`` (the 128-bit key never ships the
  text, the semi-join ships surviving text exactly once);
* tokenize — whitespace tokens hashed to int32 ids with the vectorized
  polynomial hash (split → empty-filter → flat hash → list rebuild; no
  per-row loop);
* pack — ``ops.pack.pack_sequences`` (distributed prefix-sum offsets,
  coarse assembly).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from rookray.util import hash_strings

#: quantized quality threshold (score × 10⁶, integer compare both sides)
DEFAULT_QUALITY_Q = 600_000
DEFAULT_PREFIX_TOKENS = 3

_STOPWORDS_PAT = (
    r"\b(the|a|an|and|or|of|to|in|is|are|was|were|be|been|it|this|that"
    r"|with|as|for|on|at|by|from)\b"
)


def quality_q_batch(text: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Quantized quality score floor(score·10⁶ + 0.5) as int64 — the
    exact integer the SQL oracle computes (formula from
    ``ops.text.quality_batch``)."""
    n_chars = pc.cast(pc.utf8_length(text), pa.float64())
    n_words = pc.cast(pc.count_substring_regex(text, pattern="[A-Za-z]+"),
                      pa.float64())
    n_punct = pc.cast(pc.count_substring_regex(text, pattern="[.,;:!?]"),
                      pa.float64())
    alpha = pc.cast(pc.count_substring_regex(text, pattern="[A-Za-z]"),
                    pa.float64())
    n_stop = pc.cast(pc.count_substring_regex(text, pattern=_STOPWORDS_PAT),
                     pa.float64())
    safe_words = pc.max_element_wise(n_words, 1.0)
    score = pc.subtract(
        pc.add(pc.min_element_wise(pc.divide(n_stop, safe_words), 0.5),
               pc.min_element_wise(
                   pc.divide(pc.divide(alpha, safe_words), 8.0), 1.0)),
        pc.multiply(pc.divide(n_punct, pc.max_element_wise(n_chars, 1.0)),
                    2.0),
    )
    s = score.to_numpy(zero_copy_only=False)
    return np.floor(s * 1_000_000 + 0.5).astype(np.int64)


def _split_words(text: pa.Array) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Whitespace tokens per doc, empties removed, fully vectorized.

    Returns (flat kept words, kept counts per doc, doc index per kept
    word).  ``utf8_split_whitespace`` emits empty strings at string
    edges; the empty-filter runs on the flat value array (numpy mask +
    arrow filter), never per row."""
    lists = pc.utf8_split_whitespace(text)
    lists = pa.chunked_array([lists]).combine_chunks() \
        if isinstance(lists, pa.ChunkedArray) else lists
    flat = lists.flatten()
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    n = len(lens)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    keep &= ~np.asarray(pc.is_null(flat).to_numpy(zero_copy_only=False),
                        dtype=bool)
    kept = flat.filter(pa.array(keep))
    kept_doc = doc_of[keep]
    counts = np.bincount(kept_doc, minlength=n).astype(np.int64)
    return kept, counts, kept_doc


def _prefix_key(text: pa.Array, n_prefix: int) -> pa.Array:
    """First ``n_prefix`` whitespace tokens joined by a single space —
    the boilerplate key (vectorized list rebuild + ``binary_join``)."""
    kept, counts, kept_doc = _split_words(text)
    starts = np.concatenate([[0], np.cumsum(counts[:-1])]) \
        if len(counts) else np.zeros(0, np.int64)
    rank = np.arange(len(kept_doc), dtype=np.int64) - starts[kept_doc] \
        if len(kept_doc) else np.zeros(0, np.int64)
    sel = rank < n_prefix
    take = kept.filter(pa.array(sel)) if len(kept) else kept
    pref_counts = np.minimum(counts, n_prefix)
    offsets = pa.array(np.concatenate([[0], np.cumsum(pref_counts)]),
                       pa.int32())
    lists3 = pa.ListArray.from_arrays(offsets, take)
    return pc.binary_join(lists3, " ")


def tokenize_batch(batch: pa.Table, col: str = "text",
                   id_col: str = "doc_id") -> pa.Table:
    """(doc_id, tokens: list<int32>, n_tok) — whitespace tokens hashed
    to non-negative int32 ids via the vectorized polynomial hash."""
    text = batch.column(col).combine_chunks()
    kept, counts, _ = _split_words(text)
    ids = (hash_strings(kept) & np.uint64(0x7FFFFFFF)).astype(np.int32) \
        if len(kept) else np.zeros(0, np.int32)
    offsets = pa.array(np.concatenate([[0], np.cumsum(counts)]), pa.int32())
    tokens = pa.ListArray.from_arrays(offsets, pa.array(ids, pa.int32()))
    return pa.table({
        id_col: batch.column(id_col),
        "tokens": tokens,
        "n_tok": pa.array(counts.astype(np.int32), pa.int32()),
    })


def clean_corpus(ds: "ray.data.Dataset", quality_q: int = DEFAULT_QUALITY_Q,
                 prefix_tokens: int = DEFAULT_PREFIX_TOKENS,
                 col: str = "text",
                 id_col: str = "doc_id",
                 coarse: int = 256) -> "ray.data.Dataset":
    """quality-filter + prefix-dedup the documents Dataset; returns the
    surviving (doc_id, text) rows.

    Dedup shape: one coarse-bucket groupby carrying the text, with the
    exact per-(h0, h1) min-doc pick vectorized inside each of ≤
    ``coarse`` groups.  The text crosses the network exactly once —
    the same bytes the earlier semi-join variant shuffled through its
    aggregators, minus the join stage entirely (measured: the
    left_semi join cost ~3 s of pure aggregator-actor fixed overhead
    per run at sf0.1; this is one shuffle, zero extra actors)."""

    def keep_quality(batch: pa.Table) -> pa.Table:
        qq = quality_q_batch(batch.column(col).combine_chunks())
        return batch.filter(pa.array(qq >= quality_q))

    filtered = ds.map_batches(keep_quality, batch_format="pyarrow",
                              zero_copy_batch=True)

    def add_hashes(batch: pa.Table) -> pa.Table:
        # per-batch combiner: keep only each batch's min-doc row per
        # (h0, h1) so duplicate texts collapse before the shuffle
        pfx = _prefix_key(batch.column(col).combine_chunks(), prefix_tokens)
        h0 = hash_strings(pfx, 0).view(np.int64)
        h1 = hash_strings(pfx, 1).view(np.int64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h1, h0))
        h0s, h1s = h0[order], h1[order]
        first = np.concatenate([[True],
                                (h0s[1:] != h0s[:-1]) | (h1s[1:] != h1s[:-1])])
        take = order[first]
        out = batch.take(pa.array(take))
        out = out.append_column("h0", pa.array(h0[take]))
        out = out.append_column("h1", pa.array(h1[take]))
        return out.append_column(
            "_cb", pa.array((h0[take].view(np.uint64)
                             % np.uint64(coarse)).astype(np.int64)))

    def pick_min(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        h0 = group.column("h0").to_numpy(zero_copy_only=False)
        h1 = group.column("h1").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h1, h0))
        h0s, h1s = h0[order], h1[order]
        first = np.concatenate([[True],
                                (h0s[1:] != h0s[:-1]) | (h1s[1:] != h1s[:-1])])
        return group.take(pa.array(order[first])) \
                    .drop_columns(["h0", "h1", "_cb"])

    return (filtered.map_batches(add_hashes, batch_format="pyarrow",
                                 zero_copy_batch=True)
            .groupby("_cb")
            .map_groups(pick_min, batch_format="pyarrow"))


def clean_pack(ds: "ray.data.Dataset", context_len: int = 128,
               quality_q: int = DEFAULT_QUALITY_Q,
               prefix_tokens: int = DEFAULT_PREFIX_TOKENS) -> "ray.data.Dataset":
    """The full composition: clean → tokenize → pack.  Returns packed
    training blocks (pack_id, tokens, n_docs, n_tok)."""
    from rookray.ops.pack import pack_sequences

    cleaned = clean_corpus(ds, quality_q, prefix_tokens)
    tokenized = cleaned.map_batches(tokenize_batch, batch_format="pyarrow",
                                    zero_copy_batch=True)
    return pack_sequences(tokenized, context_len=context_len)


def stratified_sample(ds: "ray.data.Dataset", key_col: str,
                      strata_col: str, rates_permille: dict[str, int],
                      default_permille: int = 500) -> "ray.data.Dataset":
    """Deterministic per-stratum downsampling — the domain-mixture
    rebalancing step of a training-data pipeline (keep src A at 100 %,
    src B at 5 %, everything else at the default rate).

    Keep decision: ``((key % 1000003) * 2654435761) % 1000 <
    rate_permille[stratum]``.  The hash is written in modular
    arithmetic that stays below 2**63 so numpy int64 and a SQL BIGINT
    oracle compute the identical value (a plain ``key * C`` wraps in
    numpy but overflows DuckDB — the cdc_sampled_stats lesson).
    Stateless, embarrassingly parallel, no shuffle; rates ship inside
    the closure (a few entries), not per batch.
    """
    items = tuple(sorted(rates_permille.items()))

    def keep(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        h = ((k % 1000003) * 2654435761) % 1000
        s = batch.column(strata_col).to_pandas()
        rate = np.full(len(batch), default_permille, dtype=np.int64)
        for name, r in items:
            rate[(s == name).to_numpy()] = r
        return batch.filter(pa.array(h < rate))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def mixture_resample(ds: "ray.data.Dataset", key_col: str,
                     strata_col: str, weights_permille: dict[str, int],
                     default_permille: int = 1000) -> "ray.data.Dataset":
    """Domain-mixture resampling WITH upsampling — the "mix domain A
    at 2.5 epochs, domain B at 0.5" step of assembling a training
    corpus (stratified_sample only downsamples).

    Weight ``w`` permille ⇒ each row emits ``w // 1000`` full repeats
    plus one more iff ``hash(key) < w % 1000``, with the same
    overflow-safe modular hash as ``stratified_sample`` (identical in
    numpy int64 and SQL BIGINT).  Expected multiplicity = w/1000
    exactly; the decision is per-key deterministic, so re-runs emit
    the identical mixture.  Output rows carry ``rep`` (0-based repeat
    index) so a downstream ``deterministic_shuffle`` can interleave
    the epochs.  Stateless map — no shuffle; weights ride in the
    closure."""
    items = tuple(sorted(weights_permille.items()))

    def rep(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        h = ((k % 1000003) * 2654435761) % 1000
        s = batch.column(strata_col).to_pandas()
        w = np.full(len(batch), default_permille, dtype=np.int64)
        for name, r in items:
            w[(s == name).to_numpy()] = r
        reps = w // 1000 + (h < (w % 1000))
        idx = np.repeat(np.arange(len(batch), dtype=np.int64), reps)
        starts = np.concatenate([[0], np.cumsum(reps[:-1])]) \
            if len(reps) else np.zeros(0, dtype=np.int64)
        pos = (np.arange(int(reps.sum()), dtype=np.int64)
               - np.repeat(starts, reps))
        out = batch.take(pa.array(idx))
        return out.append_column("rep", pa.array(pos))

    return ds.map_batches(rep, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------- shuffle

#: splitmix64 constants (same finalizer as util.hash_strings)
_SM_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_C2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(z: np.ndarray) -> np.ndarray:
    z = (z ^ (z >> np.uint64(30))) * _SM_C1
    z = (z ^ (z >> np.uint64(27))) * _SM_C2
    return z ^ (z >> np.uint64(31))


def shuffle_key(doc_id: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic 64-bit shuffle key of an int key column:
    splitmix64(doc_id + golden_gamma * (seed+1)) — a seeded total
    order over the corpus, identical across processes/machines."""
    # python-int modular product: np.uint64*np.uint64 would emit an
    # overflow RuntimeWarning for the intentional mod-2^64 wrap
    gamma = np.uint64((0x9E3779B97F4A7C15 * (seed + 1)) % (1 << 64))
    return _splitmix64(doc_id.astype(np.uint64) + gamma)


def deterministic_shuffle(ds: "ray.data.Dataset", key_col: str,
                          seed: int = 42,
                          n_buckets: int = 1024) -> "ray.data.Dataset":
    """Global deterministic training-order shuffle with an explicit
    rank column — the "shuffle the corpus once per epoch, same order
    on every re-run" step of a training-data pipeline.

    No global sort barrier: the key space is range-bucketed by its top
    bits (buckets are already in key order), per-bucket counts fold to
    a tiny driver cumsum (≤ ``n_buckets`` rows — bounded regardless of
    corpus size), the bucket base offsets broadcast once via
    ``ray.put``, and each bucket ranks its own rows with one
    vectorized argsort.  At 10¹⁰ docs each of the 1024 buckets holds
    ~10⁷ rows — one in-memory argsort per group task.

    Returns (key_col, rank) — rank is the global 0-based position in
    the seeded order, ties broken by key value (keys are unique per
    doc, collisions of the 64-bit hash break by doc id).
    """
    import ray

    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two")
    shift = np.uint64(64 - int(n_buckets - 1).bit_length())

    def add_key(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        h = shuffle_key(k, seed)
        return pa.table({
            key_col: batch.column(key_col),
            "skey": pa.array(h.view(np.int64)),
            "bucket": pa.array((h >> shift).astype(np.int64)),
        })

    keyed = ds.map_batches(add_key, batch_format="pyarrow",
                           zero_copy_batch=True)

    # pass 1: per-bucket counts → driver cumsum → broadcast bases
    from ray.data.aggregate import Count
    counts = keyed.groupby("bucket").aggregate(Count(alias_name="n")) \
                  .to_pandas().sort_values("bucket")
    bases = np.zeros(n_buckets, dtype=np.int64)
    b = counts["bucket"].to_numpy()
    n = counts["n"].to_numpy()
    starts = np.concatenate([[0], np.cumsum(n[:-1])])
    bases[b] = starts
    bases_ref = ray.put(bases)

    def rank_bucket(group: pa.Table) -> pa.Table:
        base = ray.get(bases_ref)
        sk = group.column("skey").to_numpy(zero_copy_only=False).view(np.uint64)
        ks = group.column(key_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ks, sk))
        rank = np.empty(len(sk), dtype=np.int64)
        bid = int(group.column("bucket")[0].as_py())
        rank[order] = base[bid] + np.arange(len(sk), dtype=np.int64)
        return pa.table({key_col: group.column(key_col),
                         "rank": pa.array(rank)})

    return keyed.groupby("bucket").map_groups(rank_bucket,
                                              batch_format="pyarrow")


# ---------------------------------------------------------- decontamination

class _AhoCorasick:
    """Byte-level Aho-Corasick automaton: one pass over the text finds
    every pattern occurrence regardless of pattern count — the classic
    multi-pattern scale path (Aho & Corasick 1975).

    Build: byte trie (``goto``: dict per state), BFS failure links,
    and per-state *merged* output sets (each state's outputs include
    its whole fail chain's, resolved at build time so the scan never
    walks fail chains for output collection)."""

    def __init__(self, patterns: list[str]):
        self.goto: list[dict[int, int]] = [{}]
        self.out: list[frozenset[int]] = [frozenset()]
        raw_out: list[set[int]] = [set()]
        for idx, p in enumerate(patterns):
            s = 0
            for ch in p.encode("utf-8"):
                nxt = self.goto[s].get(ch)
                if nxt is None:
                    nxt = len(self.goto)
                    self.goto[s][ch] = nxt
                    self.goto.append({})
                    raw_out.append(set())
                s = nxt
            raw_out[s].add(idx)
        from collections import deque
        self.fail = [0] * len(self.goto)
        q = deque()
        for s in self.goto[0].values():
            q.append(s)
        while q:
            s = q.popleft()
            for ch, t in self.goto[s].items():
                q.append(t)
                f = self.fail[s]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                # depth-1 states are seeded with fail=0 and never
                # reassigned; here t is depth ≥ 2, so goto[f][ch] ≠ t
                self.fail[t] = self.goto[f].get(ch, 0)
                raw_out[t] |= raw_out[self.fail[t]]
        self.out = [frozenset(o) for o in raw_out]

    def distinct_hits(self, text: str) -> int:
        """Number of DISTINCT patterns occurring in ``text``."""
        goto, fail, out = self.goto, self.fail, self.out
        s = 0
        seen: set[int] = set()
        for ch in text.encode("utf-8"):
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            if out[s]:
                seen |= out[s]
        return len(seen)


_SEED_B = np.uint64(1099511628211)  # odd → invertible mod 2^64


def _modinv_pow2_64(b: np.uint64) -> np.uint64:
    """Inverse of an odd b modulo 2^64 (Newton iteration: x ← x(2-bx)
    doubles correct bits; 6 steps from the trivial 3-bit seed)."""
    with np.errstate(over="ignore"):
        x = b  # b ≡ b^-1 mod 8 for odd b
        two = np.uint64(2)
        for _ in range(6):
            x = x * (two - b * x)
    return x


def _string_bytes(col) -> tuple[np.ndarray, np.ndarray]:
    """(concatenated utf-8 bytes, int64 offsets) of a string column —
    zero-copy from the Arrow buffers; nulls read as empty."""
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    a = a.fill_null("")
    odt = np.int64 if pa.types.is_large_string(a.type) else np.int32
    offs = np.frombuffer(a.buffers()[1], dtype=odt)[
        a.offset: a.offset + len(a) + 1].astype(np.int64)
    buf = a.buffers()[2]
    data = (np.frombuffer(buf, dtype=np.uint8)
            if buf is not None else np.zeros(0, np.uint8))
    lo = offs[0]
    return data[lo: offs[-1]], offs - lo


def decontaminate(ds: "ray.data.Dataset", snippets: list[str],
                  text_col: str = "text",
                  max_snippets: int = 64,
                  method: str = "auto") -> "ray.data.Dataset":
    """Benchmark decontamination: flag every corpus doc containing any
    of the benchmark ``snippets`` as an exact substring — the "remove
    eval-set leakage before training" pass.

    The snippet list is the BENCHMARK side (eval sets are thousands of
    prompts, not corpus-sized) — broadcast once via ``ray.put``, never
    re-shipped per batch.  Three scan engines:

    * ``kernels`` — one vectorized Arrow ``match_substring`` kernel
      per snippet (O(rows × snippets) inside C++, zero Python per
      row).  Fastest for small snippet lists.
    * ``seed`` — rolling-hash seed-and-extend, the scale path: one
      vectorized O(bytes) pass hashes every window of length L* (the
      shortest snippet) with a mod-2^64 polynomial (odd base → sliding
      via the base's modular inverse, pure uint64 numpy), membership-
      tests the windows against the snippet-prefix hash set
      (searchsorted), and exact-verifies the rare candidates byte-for-
      byte (so hash collisions can never produce a false hit).  Cost
      is independent of the snippet COUNT; very short L* degrades it
      gracefully toward verification-bound (real eval snippets are
      ≥16 chars).
    * ``aho`` — a byte-level Aho-Corasick automaton compiled once per
      actor.  O(bytes) like ``seed`` but the per-byte loop is Python;
      kept as an independent exactness cross-check of the other two.

    ``method="auto"`` picks kernels at or below ``max_snippets``
    (where the C++ per-snippet sweep still wins) and the seed engine
    above it — no size ceiling anywhere.

    Returns (doc_id, n_hits): docs containing ≥1 distinct snippet and
    how many distinct snippets each contains (identical under all
    engines — tested).
    """
    import ray

    uniq = sorted(set(s for s in snippets if s))
    if method not in ("auto", "kernels", "aho", "seed"):
        raise ValueError(f"unknown method {method!r}")
    if not uniq:
        # empty benchmark set → no doc can hit; identical typed empty
        # result under every engine (the seed engine's L* is undefined)
        def empty(batch: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": batch.column("doc_id").slice(0, 0),
                "n_hits": pa.array([], pa.int64())})

        return ds.map_batches(empty, batch_format="pyarrow",
                              zero_copy_batch=True)
    if method == "auto":
        method = "kernels" if len(uniq) <= max_snippets else "seed"
    snip_ref = ray.put(uniq)

    class Scan:
        def __init__(self):
            self.snips = ray.get(snip_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            text = batch.column(text_col)
            hits = np.zeros(len(batch), dtype=np.int64)
            for s in self.snips:
                m = pc.match_substring(text, s)
                hits += m.to_numpy(zero_copy_only=False).astype(np.int64)
            keep = hits > 0
            return pa.table({
                "doc_id": batch.column("doc_id").filter(pa.array(keep)),
                "n_hits": pa.array(hits[keep]),
            })

    class ACScan:
        def __init__(self):
            self.ac = _AhoCorasick(ray.get(snip_ref))  # once per actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch.column(text_col).to_pylist()
            hits = np.fromiter((self.ac.distinct_hits(t or "")
                                for t in texts), dtype=np.int64,
                               count=len(texts))
            keep = hits > 0
            return pa.table({
                "doc_id": batch.column("doc_id").filter(pa.array(keep)),
                "n_hits": pa.array(hits[keep]),
            })

    class SeedScan:
        def __init__(self):
            snips = ray.get(snip_ref)
            enc = [s.encode("utf-8") for s in snips]
            self.L = min(len(b) for b in enc)
            B, L = _SEED_B, self.L
            self.Binv = _modinv_pow2_64(B)
            # prefix hash of each snippet's first L bytes: Σ b[j]·B^j
            pw = np.empty(L, np.uint64)
            pw[0] = 1
            if L > 1:
                np.cumprod(np.full(L - 1, B, np.uint64), out=pw[1:])
            with np.errstate(over="ignore"):
                hs = np.array(
                    [(np.frombuffer(b[:L], np.uint8).astype(np.uint64)
                      * pw).sum(dtype=np.uint64) for b in enc], np.uint64)
            order = np.argsort(hs, kind="stable")
            self.hs_sorted = hs[order]
            # hash → snippets sharing that L-prefix (verification bucket)
            self.buckets: dict[int, list[tuple[int, bytes]]] = {}
            for sid in order:
                self.buckets.setdefault(int(hs[sid]), []).append(
                    (int(sid), enc[sid]))

        def __call__(self, batch: pa.Table) -> pa.Table:
            data, offs = _string_bytes(batch.column(text_col))
            N, L = len(data), self.L
            hits = np.zeros(batch.num_rows, dtype=np.int64)
            if N >= L and len(self.hs_sorted):
                B, Binv = _SEED_B, self.Binv
                with np.errstate(over="ignore"):
                    pw = np.empty(N, np.uint64)
                    pw[0] = 1
                    if N > 1:
                        np.cumprod(np.full(N - 1, B, np.uint64),
                                   out=pw[1:])
                    ipw = np.empty(N - L + 1, np.uint64)
                    ipw[0] = 1
                    if N - L > 0:
                        np.cumprod(np.full(N - L, Binv, np.uint64),
                                   out=ipw[1:])
                    q = np.zeros(N + 1, np.uint64)
                    np.cumsum(data.astype(np.uint64) * pw,
                              dtype=np.uint64, out=q[1:])
                    w = (q[L:] - q[:-L]) * ipw
                idx = np.searchsorted(self.hs_sorted, w)
                idx_c = np.minimum(idx, len(self.hs_sorted) - 1)
                cand = np.nonzero(self.hs_sorted[idx_c] == w)[0]
                if len(cand):
                    # exact verification of the rare seed hits
                    doc_of = np.searchsorted(offs, cand, side="right") - 1
                    seen: set[tuple[int, int]] = set()
                    for p, d in zip(cand.tolist(), doc_of.tolist()):
                        end = int(offs[d + 1])
                        for sid, sb in self.buckets[int(w[p])]:
                            if (p + len(sb) <= end
                                    and data[p:p + len(sb)].tobytes() == sb):
                                seen.add((d, sid))
                    for d, _sid in seen:
                        hits[d] += 1
            keep = hits > 0
            return pa.table({
                "doc_id": batch.column("doc_id").filter(pa.array(keep)),
                "n_hits": pa.array(hits[keep]),
            })

    impl = {"kernels": Scan, "aho": ACScan, "seed": SeedScan}[method]
    return ds.map_batches(impl, batch_format="pyarrow",
                          concurrency=(1, 8))
