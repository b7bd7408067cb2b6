"""Training-data operators over the driver-generated testdata tables."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    return ray.data.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def embs():
    return ray.data.read_parquet(f"{SF}/embeddings.parquet")


def test_token_counts(docs):
    from rookray.ops import text as T

    out = T.token_counts(docs).to_pandas().set_index("doc_id")
    raw = docs.to_pandas().set_index("doc_id")
    for d in list(raw.index)[:20]:
        assert out.loc[d, "n_tokens"] == len(raw.loc[d, "text"].split())
    assert (out["n_subwords"] > 0).all()


def test_quality(docs):
    from rookray.ops import text as T

    out = T.quality(docs).to_pandas()
    assert len(out) == docs.count()
    assert out["quality_score"].between(-2, 2).all()
    # deterministic
    out2 = T.quality(docs).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        out2.sort_values("doc_id").reset_index(drop=True),
    )


def test_fingerprints(docs):
    from rookray.ops import text as T

    # hot path: md5 (per-row hashlib, SQL-crosscheck only) is OFF
    lean = T.fingerprints(docs).to_pandas()
    assert "fingerprint_md5" not in lean.columns
    assert "fingerprint_64" in lean.columns

    out = T.fingerprints(docs, with_md5=True).to_pandas().set_index("doc_id")
    raw = docs.to_pandas().set_index("doc_id")
    d = raw.index[0]
    assert out.loc[d, "fingerprint_md5"] == hashlib.md5(raw.loc[d, "text"].encode()).hexdigest()
    assert (out["fingerprint_64"].sort_index()
            == lean.set_index("doc_id")["fingerprint_64"].sort_index()).all()


def test_lang_id(docs):
    from rookray.ops.text import LangId, lang_id

    pdf = docs.to_pandas()
    profiles = LangId.build_profiles(pdf)
    out = lang_id(docs, profiles, concurrency=2).to_pandas()
    assert set(out.columns) == {"doc_id", "pred_lang", "lang_score"}
    assert len(out) == len(pdf)
    # synthetic text is shared-vocab, so don't demand accuracy — only
    # determinism and that every prediction is a known lang
    assert out["pred_lang"].isin(pdf["lang"].unique()).all()


def test_exact_dedup(docs):
    from rookray.ops import dedup as D

    out = D.exact_groups(docs).to_pandas()
    pdf = docs.to_pandas()
    exp = (
        pdf.assign(h=pdf["text"].map(lambda s: hashlib.md5(s.encode()).hexdigest()))
        .groupby("h")
        .agg(doc_id=("doc_id", "min"), group_size=("doc_id", "size"))
        .reset_index(drop=True)
    )
    got = out.sort_values("doc_id").reset_index(drop=True)
    exp = exp.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["doc_id", "group_size"]], exp)


def _with_planted_dups(docs):
    """Append near-duplicate copies of a few docs (one word changed)."""
    pdf = docs.to_pandas()
    dups = pdf.head(5).copy()
    dups["doc_id"] = dups["doc_id"] + 100000
    dups["text"] = dups["text"].str.replace(r"^\S+", "zzz", n=1, regex=True)
    return ray.data.from_pandas(pd.concat([pdf, dups], ignore_index=True))


def test_minhash_lsh_finds_planted_neardups(docs):
    from rookray.ops import dedup as D

    ds = _with_planted_dups(docs)
    clusters = D.minhash_lsh_clusters(ds, threshold=0.7, concurrency=2).to_pandas()
    by_cluster = clusters.groupby("cluster_id")["doc_id"].apply(set)
    planted = {frozenset({d, d + 100000}) for d in range(5)}
    found = {frozenset(v) for v in by_cluster if len(v) >= 2}
    assert planted <= {frozenset(s & p) | frozenset(s & p) for s in found for p in planted} | found, \
        f"planted near-dups not clustered: {found}"


def test_simhash_finds_planted_neardups(docs):
    from rookray.ops import dedup as D

    ds = _with_planted_dups(docs)
    pairs = D.simhash_pairs(ds, concurrency=2).to_pandas()
    got = {(a, b) for a, b in zip(pairs["a"], pairs["b"])}
    planted = {(d, d + 100000) for d in range(5)}
    assert planted & got, f"no planted pair found via simhash: {sorted(got)[:10]}"


def test_ngram_jaccard_pairs(docs):
    from rookray.ops import dedup as D

    ds = _with_planted_dups(docs)
    pairs = D.ngram_jaccard_pairs(ds, threshold=0.8, block_col="source").to_pandas()
    got = {(a, b) for a, b in zip(pairs["a"], pairs["b"])}
    planted = {(d, d + 100000) for d in range(5)}
    assert planted <= got


def test_embedding_neardup(embs):
    from rookray.ops import dedup as D

    pdf = embs.to_pandas()
    dup = pdf.head(3).copy()
    dup["vec_id"] = dup["vec_id"] + 100000
    ds = ray.data.from_pandas(pd.concat([pdf, dup], ignore_index=True))
    pairs = D.embedding_neardup_pairs(ds, threshold=0.999).to_pandas()
    got = {(a, b) for a, b in zip(pairs["a"], pairs["b"])}
    assert {(d, d + 100000) for d in pdf.head(3)["vec_id"]} <= got


def test_ann_bruteforce_matches_numpy(embs):
    from rookray.ops import ann as A

    qids, qmat = A.make_queries(embs, 5)
    out = A.bruteforce_topk(embs, qids, qmat, k=5).to_pandas()
    # oracle: full numpy
    pdf = embs.to_pandas()
    ids = pdf["vec_id"].to_numpy()
    m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    sim = qn @ mn.T
    for qi, qid in enumerate(qids):
        s = sim[qi].copy()
        s[ids == qid] = -np.inf
        exp = set(ids[np.argsort(-s)[:5]])
        got = set(out[out["query_id"] == qid]["neighbor_id"])
        assert got == exp, f"query {qid}: {got} != {exp}"


def test_ann_lsh_recall(embs):
    from rookray.ops import ann as A

    qids, qmat = A.make_queries(embs, 5)
    exact = A.bruteforce_topk(embs, qids, qmat, k=5).to_arrow_refs()
    import ray as _ray
    exact_tbl = pa.concat_tables([_ray.get(r) for r in exact])
    approx_tbl = pa.Table.from_pandas(
        A.lsh_topk(embs, qids, qmat, k=5, n_planes=2).to_pandas()
    )
    r = A.recall_at_k(approx_tbl, exact_tbl, k=5)
    assert r > 0.3, f"LSH recall suspiciously low: {r}"


def test_multimodal_plumbing(docs):
    from rookray.ops import multimodal as M

    media = M.media_from_documents(docs)
    feats = M.decode_features(media, concurrency=2).to_pandas()
    assert len(feats) == docs.count()
    assert all(len(f) == M.DecodeFeatures.FEATURE_DIM for f in feats["features"])
    # determinism of the fake decoder
    feats2 = M.decode_features(M.media_from_documents(docs), concurrency=2).to_pandas()
    a = feats.sort_values("media_id")["features"].map(tuple).tolist()
    b = feats2.sort_values("media_id")["features"].map(tuple).tolist()
    assert a == b

    # strict mode is the marked integration point
    dec = M.DecodeFeatures(strict=True)
    with pytest.raises(NotImplementedError):
        dec._decode(b"xx")

    frames = media.map_batches(
        M.FrameSampleStub, fn_constructor_kwargs=dict(every_ms=1000),
        batch_format="pyarrow", batch_size=256, concurrency=2,
    ).to_pandas()
    assert (frames.groupby("media_id").size() >= 1).all()


def test_minhash_cluster_transitivity_and_cliques():
    """Distributed hash-min clustering: a chain A~B~C~D (adjacent pairs
    above threshold, distant pairs below) must land in ONE cluster
    (multi-round propagation), and a 20-doc identical clique converges
    in one round.  Reference clusters computed by in-test union-find
    over exact brute-force jaccard pairs."""
    from rookray.ops.dedup import minhash_lsh_clusters

    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(500)]

    docs = {}
    # chain: sliding 70-word window over 115 distinct words, shift 15 =>
    # adjacent jaccard ~0.64 (>= 0.5), 2-hop ~0.39 (< 0.5)
    chain_words = [f"c{i}" for i in range(115)]
    for i in range(4):
        docs[100 + i] = " ".join(chain_words[15 * i: 15 * i + 70])
    # identical clique
    clique_text = " ".join(vocab[i] for i in rng.randint(0, 500, 60))
    for i in range(20):
        docs[200 + i] = clique_text
    # noise singletons
    for i in range(40):
        docs[300 + i] = " ".join(vocab[j] for j in rng.randint(0, 500, 70))

    ds = ray.data.from_items(
        [{"doc_id": d, "text": t} for d, t in sorted(docs.items())])
    # bands=32 (rows=2): candidate-detection probability ~1 at J>=0.6;
    # the exact-jaccard verification pass kills the false positives.
    # driver_edge_budget=0 FORCES the fully-distributed label-propagation
    # path (the >budget branch a 100-TB near-dup corpus would take)
    out = minhash_lsh_clusters(ds, threshold=0.5, k=64, bands=32,
                               shingle_n=3, driver_edge_budget=0).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))

    # reference: exact jaccard >= threshold pairs + union-find
    def shingles(t):
        w = t.lower().split()
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    sets = {d: shingles(t) for d, t in docs.items()}
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(docs)
    edges = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
            if j >= 0.5:
                edges.append((a, b))
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    expect = {d: find(d) for d in sorted(parent)}
    # the planted chain must actually be a chain (adjacent only)
    chain_edges = [e for e in edges if e[0] >= 100 and e[1] < 200]
    assert ([(a, b) for a, b in chain_edges]
            == [(100, 101), (101, 102), (102, 103)]), chain_edges
    assert got == expect
    # one cluster for the whole chain despite no direct 100~103 edge
    assert got[100] == got[103] == 100
    assert all(got[200 + i] == 200 for i in range(20))


def test_ann_ivf_recall_and_exhaustive(embs):
    from rookray.ops import ann as A
    import ray as _ray

    qids, qmat = A.make_queries(embs, 5)
    exact = pa.concat_tables(
        [_ray.get(r) for r in A.bruteforce_topk(embs, qids, qmat, k=5).to_arrow_refs()])
    approx = pa.Table.from_pandas(
        A.ivf_topk(embs, qids, qmat, k=5, n_centroids=8, nprobe=3).to_pandas())
    r = A.recall_at_k(approx, exact, k=5)
    assert r > 0.5, f"IVF recall suspiciously low: {r}"
    # nprobe == n_centroids degenerates to exhaustive search: recall 1.0
    full = pa.Table.from_pandas(
        A.ivf_topk(embs, qids, qmat, k=5, n_centroids=8, nprobe=8).to_pandas())
    assert A.recall_at_k(full, exact, k=5) == 1.0


def test_ivfpq_recall_and_determinism(embs):
    """IVF-PQ: the ADC scan over one-byte codes must recover most of
    the exact top-k on the clustered test embeddings, be deterministic
    across runs, and the encoded index must actually be compressed
    (cell + uint8 code columns only — no float vectors)."""
    from rookray.ops import ann as A
    import ray as _ray

    qids, qmat = A.make_queries(embs, 5)
    exact = pa.concat_tables(
        [_ray.get(r) for r in A.bruteforce_topk(embs, qids, qmat, k=5).to_arrow_refs()])
    # 32 subspaces (sub_dim=2) x 256 codes: fine enough that ADC over
    # the 64-dim test embeddings recovers most of the exact top-k
    approx = pa.Table.from_pandas(
        A.ivfpq_topk(embs, qids, qmat, k=5, n_centroids=8, nprobe=8,
                     n_subspaces=32, n_codes=256).to_pandas())
    r = A.recall_at_k(approx, exact, k=5)
    assert r > 0.7, f"IVF-PQ recall suspiciously low: {r}"
    # deterministic: identical output on a second run
    again = pa.Table.from_pandas(
        A.ivfpq_topk(embs, qids, qmat, k=5, n_centroids=8, nprobe=8,
                     n_subspaces=32, n_codes=256).to_pandas())
    pd.testing.assert_frame_equal(
        approx.to_pandas().sort_values(["query_id", "neighbor_id"])
        .reset_index(drop=True),
        again.to_pandas().sort_values(["query_id", "neighbor_id"])
        .reset_index(drop=True))
    # the index layout is compressed: one one-byte code per subspace
    cents = A.build_ivf_centroids(embs, 8)
    rows = embs.limit(256).take_all()
    m = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                  for r in rows])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    cell0 = np.argmax(m @ cents.T, axis=1)
    books = A._train_pq_codebooks(m - cents[cell0], 8, 32)
    idx = A.ivfpq_encode(embs, cents, books)
    sch = idx.schema()
    assert set(sch.names) == {"vec_id", "cell"} | {f"code{s}" for s in range(8)}
    import pyarrow as _pa
    for s in range(8):
        assert sch.base_schema.field(f"code{s}").type == _pa.uint8()


def test_simhash_pairs_exact_vs_bruteforce(docs):
    """The distributed simhash path (band explode → coarse-bucket pair
    gen → groupby(a,b) min-fold dedup) must equal the O(n²) in-process
    oracle EXACTLY: max_hamming=6 < bands=8, so banding is recall-1 by
    pigeonhole and the whole op is deterministic."""
    from rookray.ops import dedup as D

    ds = _with_planted_dups(docs)
    pairs = D.simhash_pairs(ds, max_hamming=6, concurrency=2).to_pandas()
    got = {(min(a, b), max(a, b), h)
           for a, b, h in zip(pairs["a"], pairs["b"], pairs["hamming"])}

    sig = D.SimHasher()(pa.Table.from_pandas(ds.to_pandas()))
    s = sig.column("simhash").to_numpy().astype(np.uint64)
    ids = sig.column("doc_id").to_numpy()
    exp = set()
    for i in range(len(ids)):
        ham = D._popcount64(s[i] ^ s[i + 1:])
        for j in np.flatnonzero(ham <= 6):
            a, b = int(ids[i]), int(ids[i + 1 + j])
            exp.add((min(a, b), max(a, b), int(ham[j])))
    assert len(exp) > 0
    assert got == exp


def test_langid_vectorized_matches_reference(docs):
    """The vectorized byte-trigram scorer must reproduce the per-row
    Python reference (set-of-trigrams → profile-vector sum) exactly:
    same scores, same argmax prediction."""
    import time
    from rookray.ops.text import LangId

    pdf = docs.to_pandas()
    profiles = LangId.build_profiles(pdf)
    scorer = LangId(profiles)
    t0 = time.monotonic()
    out = scorer(pa.Table.from_pandas(pdf, preserve_index=False))
    t_vec = time.monotonic() - t0

    langs = sorted(profiles)
    tri_to_langs = {}
    for li, lang in enumerate(langs):
        for t in profiles[lang]:
            tri_to_langs.setdefault(t, np.zeros(len(langs)))[li] += 1.0
    t0 = time.monotonic()
    texts = (" " + pdf["text"].str.lower() + " ").tolist()
    ref_scores = np.zeros((len(texts), len(langs)))
    for ri, s in enumerate(texts):
        for t in {s[i:i + 3] for i in range(len(s) - 2)}:
            v = tri_to_langs.get(t)
            if v is not None:
                ref_scores[ri] += v
    t_ref = time.monotonic() - t0
    ref_pred = np.asarray(langs, dtype=object)[np.argmax(ref_scores, axis=1)]

    assert out.column("pred_lang").to_pylist() == list(ref_pred)
    np.testing.assert_allclose(
        out.column("lang_score").to_numpy(zero_copy_only=False),
        ref_scores[np.arange(len(texts)), np.argmax(ref_scores, axis=1)])
    print(f"\nlangid vectorized {t_vec:.3f}s vs reference loop {t_ref:.3f}s "
          f"({t_ref / max(t_vec, 1e-9):.1f}x)")


def test_wav_codec_real_roundtrip():
    """The stdlib WAV path is a REAL codec: encode → decode round-trips
    samples (16-bit quantization error only), decode works in strict
    mode (nothing stubbed), and the spectrum feature peaks in the band
    containing the tone frequency."""
    from rookray.ops import multimodal as M

    rate = 8000
    t = np.arange(rate, dtype=np.float64) / rate
    sig = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    payload = M.encode_wav(sig, rate)
    assert M.is_wav(payload)
    got_rate, got = M.decode_wav(payload)
    assert got_rate == rate
    np.testing.assert_allclose(got, sig, atol=1.5 / 32767)

    # strict decoder accepts WAV (real path), rejects unknown bytes
    dec = M.DecodeFeatures(strict=True)
    feats = dec._decode(payload)
    assert feats.shape == (M.DecodeFeatures.FEATURE_DIM,)
    # 64 bands over rfft(2048 samples at 8 kHz): band width = 4000/64
    # = 62.5 Hz → 440 Hz lands in band 7
    assert int(np.argmax(feats)) == 7

    # audio rows of the media table carry real WAVs end-to-end
    docs_tbl = pa.table({
        "doc_id": pa.array([1, 4, 7], pa.int64()),  # all % 3 == 1 → audio
        "text": pa.array(["a", "b", "c"], pa.string()),
    })
    media = M.media_from_documents(ray.data.from_arrow(docs_tbl)).to_pandas()
    assert all(M.is_wav(p) for p in media["payload"])
    out = M.decode_features(
        M.media_from_documents(ray.data.from_arrow(docs_tbl)),
        strict=True).to_pandas()
    assert len(out) == 3  # strict mode: real decode, no raise


def test_clean_corpus_prefix_dedup_and_quality():
    """clean_corpus drops low-quality docs and keeps one survivor (min
    doc_id) per first-3-token boilerplate prefix; tokenize_batch counts
    match whitespace token counts."""
    from rookray.ops.corpus import clean_corpus, tokenize_batch

    rows = [
        (1, "The quick brown fox jumps over the lazy dog near the bank " * 3),
        (2, "The quick brown fox naps by the warm fire in the den " * 3),
        (5, "A different lead sentence with many plain words and the usual "
            "calm tone of this corpus " * 2),
        (9, "!!! ??? ... ,,, ;;; :::"),  # punctuation-only → low quality
    ]
    tbl = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string())})
    out = (clean_corpus(ray.data.from_arrow(tbl))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # docs 1 and 2 share the 3-token prefix "The quick brown" → doc 2
    # deduped; doc 9 dies on quality; 1 (min id) and 5 survive
    assert list(out["doc_id"]) == [1, 5]

    # exact same prefix → min doc survives
    rows2 = [(7, "Subscribe to our newsletter for updates " * 4),
             (3, "Subscribe to our newsletter and win prizes " * 4)]
    tbl2 = pa.table({"doc_id": pa.array([r[0] for r in rows2], pa.int64()),
                     "text": pa.array([r[1] for r in rows2], pa.string())})
    out2 = clean_corpus(ray.data.from_arrow(tbl2)).to_pandas()
    assert list(out2["doc_id"]) == [3]

    tok = tokenize_batch(tbl)
    assert tok.column("n_tok").to_pylist() == [
        len(r[1].split()) for r in rows]
    assert all(t >= 0 for t in tok.column("tokens").combine_chunks()
               .flatten().to_pylist())


def test_ivf_distributed_training(embs):
    """Full-corpus distributed Lloyd training: deterministic across
    runs, centroids unit-norm, and the resulting IVF search has recall
    >= the sampled builder at the same settings (it trains on
    everything, not a bounded sample)."""
    from rookray.ops import ann as A

    c1 = A.build_ivf_centroids_distributed(embs, n_centroids=8, iters=4)
    c2 = A.build_ivf_centroids_distributed(embs, n_centroids=8, iters=4)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_allclose(np.linalg.norm(c1, axis=1), 1.0, atol=1e-9)

    qids, qmat = A.make_queries(embs, 5)
    exact = A.bruteforce_topk(embs, qids, qmat, k=5)
    ex_tbl = pa.Table.from_pandas(exact.to_pandas())
    dist = A.ivf_topk(embs, qids, qmat, k=5, n_centroids=8, nprobe=3,
                      train="distributed")
    samp = A.ivf_topk(embs, qids, qmat, k=5, n_centroids=8, nprobe=3,
                      train="sample")
    r_dist = A.recall_at_k(pa.Table.from_pandas(dist.to_pandas()), ex_tbl, 5)
    r_samp = A.recall_at_k(pa.Table.from_pandas(samp.to_pandas()), ex_tbl, 5)
    assert r_dist >= 0.5
    assert r_dist >= r_samp - 0.2  # never materially worse


def test_redact_batch_patterns_and_order():
    from rookray.ops.text import redact_batch

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["mail a1b2@ex-a.com now", "no pii here",
                          "ids 123 and 4567"], pa.string()),
    })
    out = redact_batch(t, col="text")
    got = out.column("text_redacted").to_pylist()
    # email pattern runs BEFORE the digit pattern (a digit-first pass
    # would shred the address into 'a<NUM>b<NUM>@...')
    assert got == ["mail <EMAIL> now", "no pii here",
                   "ids <NUM> and <NUM>"]


def test_repetition_batch_counts():
    from rookray.ops.text import repetition_batch

    t = pa.table({
        "doc_id": pa.array([7, 8, 9], pa.int64()),
        "text": pa.array(["a a a b c", "x y", ""], pa.string()),
    })
    out = repetition_batch(t).to_pandas().sort_values("doc_id")
    # empty doc (9) dropped — no denominator
    assert out["doc_id"].tolist() == [7, 8]
    assert out["n_words"].tolist() == [5, 2]
    assert out["n_distinct"].tolist() == [3, 2]
    assert out["top_word_n"].tolist() == [3, 1]


def test_stratified_sample_rates():
    from rookray.ops.corpus import stratified_sample

    n = 2000
    t = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "source": pa.array(["all", "none", "half", "other"] * (n // 4),
                           pa.string()),
    })
    ds = ray.data.from_arrow(t)
    out = stratified_sample(ds, "doc_id", "source",
                            {"all": 1000, "none": 0, "half": 500},
                            default_permille=250).to_pandas()
    by = out["source"].value_counts()
    assert by.get("all", 0) == n // 4          # rate 1000 keeps everything
    assert by.get("none", 0) == 0              # rate 0 drops everything
    assert 0 < by.get("half", 0) < n // 4      # partial strata in between
    assert 0 < by.get("other", 0) < by["half"]  # default 250 < 500
    # deterministic: same call, same rows
    out2 = stratified_sample(ds, "doc_id", "source",
                             {"all": 1000, "none": 0, "half": 500},
                             default_permille=250).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])


def test_dup_ngram_stats_planted():
    from rookray.ops.dedup import dup_ngram_stats

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "alpha beta gamma delta",      # grams: abg bgd
            "zzz alpha beta gamma qq",     # shares 'alpha beta gamma'
            "rep rep rep rep",             # 'rep rep rep' twice, but only in THIS doc
            "xy",                          # < 3 words -> no grams, no row
        ], pa.string()),
    })
    out = (dup_ngram_stats(ray.data.from_arrow(t), n=3, buckets=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out["n_ngrams"].tolist() == [2, 3, 2]
    # only the cross-document gram counts as duplicated: doc1 pos 1,
    # doc2 pos 2; doc3's internal repetition is NOT cross-doc
    assert out["n_dup_ngrams"].tolist() == [1, 1, 0]


def test_deterministic_shuffle_rank_properties():
    """Rank is a permutation, invariant under repartition, and seed-
    sensitive (different seed -> different order)."""
    from rookray.ops.corpus import deterministic_shuffle

    ids = list(range(0, 500, 3))
    t = pa.table({"doc_id": pa.array(ids, pa.int64())})

    def run(seed, nparts):
        ds = ray.data.from_arrow(t).repartition(nparts)
        df = deterministic_shuffle(ds, "doc_id", seed=seed).to_pandas()
        return df.sort_values("doc_id")["rank"].tolist()

    r1 = run(42, 2)
    r2 = run(42, 7)
    assert r1 == r2  # partition-layout invariant
    assert sorted(r1) == list(range(len(ids)))  # exact permutation
    r3 = run(7, 2)
    assert r1 != r3  # seeded


def test_decontaminate_hits_and_budget():
    from rookray.ops.corpus import decontaminate

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "the quick brown fox",
            "nothing to see here",
            "a quick brown cat and SECRET PROMPT inside",
        ]),
    })
    ds = ray.data.from_arrow(t)
    out = (decontaminate(ds, ["quick brown", "SECRET PROMPT"])
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [1, 3]
    assert out["n_hits"].tolist() == [1, 2]

    # above the auto threshold the seed engine kicks in — no size
    # ceiling anywhere, same answer
    pats = ["quick brown", "SECRET PROMPT"] + [f"zzz-{i}" for i in range(10)]
    big = (decontaminate(ds, pats, max_snippets=5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert big["doc_id"].tolist() == [1, 3]
    assert big["n_hits"].tolist() == [1, 2]


def test_mixture_resample_repeats_and_determinism():
    """Upsampling emits floor(w/1000) repeats plus a hash-decided
    extra; rep indexes are 0..k-1; reruns are identical; weight 1000
    is the identity."""
    from rookray.ops.corpus import mixture_resample

    t = pa.table({
        "doc_id": pa.array(list(range(40)), pa.int64()),
        "source": pa.array((["a"] * 20) + (["b"] * 20)),
    })
    ds = ray.data.from_arrow(t)
    out = (mixture_resample(ds, "doc_id", "source",
                            {"a": 3000, "b": 500})
           .to_pandas().sort_values(["doc_id", "rep"]))
    per = out.groupby("doc_id").size()
    # 'a' rows repeat exactly 3x (no fractional part)
    assert (per.reindex(range(20), fill_value=0) == 3).all()
    # 'b' rows appear 0 or 1 times, about half
    bcnt = per.reindex(range(20, 40), fill_value=0)
    assert set(bcnt.unique()) <= {0, 1} and 3 <= bcnt.sum() <= 17
    # rep indexes are dense per key
    for _, g in out.groupby("doc_id"):
        assert g["rep"].tolist() == list(range(len(g)))
    # deterministic
    out2 = (mixture_resample(ds, "doc_id", "source",
                             {"a": 3000, "b": 500})
            .to_pandas().sort_values(["doc_id", "rep"]))
    assert out.reset_index(drop=True).equals(out2.reset_index(drop=True))
    # identity weight
    ident = mixture_resample(ds, "doc_id", "source", {}).to_pandas()
    assert len(ident) == 40 and (ident["rep"] == 0).all()


def test_decontaminate_aho_matches_kernels():
    """The Aho-Corasick engine must produce byte-identical (doc_id,
    n_hits) to the kernel sweep — including overlapping patterns,
    patterns nested inside each other, and repeated occurrences
    (counted once per distinct pattern)."""
    from rookray.ops.corpus import _AhoCorasick, decontaminate

    pats = ["ab", "abc", "bc", "c", "quick brown", "own f", "zz"]
    texts = [
        "the quick brown fox",          # quick brown, own f
        "abcabc",                        # ab, abc, bc, c
        "no hits at all",                # none... ("c" hits nothing? no 'c')
        "cc",                            # c (once, distinct)
        "",                              # empty
        "ab",                            # ab only
    ]
    t = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts),
    })
    ds = ray.data.from_arrow(t)

    def run(method, **kw):
        df = (decontaminate(ds, pats, method=method, **kw)
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
        return list(zip(df["doc_id"], df["n_hits"]))

    kern = run("kernels")
    aho = run("aho")
    assert kern == aho
    # the rolling-hash seed engine agrees too — including 1-byte
    # minimum snippet length (every matching byte becomes a candidate)
    assert run("seed") == kern
    # auto switches to the seed engine above the threshold, same answer
    assert run("auto", max_snippets=3) == kern

    # direct automaton checks: distinct counting, not occurrences
    ac = _AhoCorasick(pats)
    assert ac.distinct_hits("abcabcabc") == 4      # ab abc bc c
    assert ac.distinct_hits("zzz") == 1            # zz twice -> 1 distinct
    assert ac.distinct_hits("") == 0


def test_png_codec_real_roundtrip_and_filters():
    """Stdlib PNG codec: encode→decode is pixel-identical; the decoder
    reconstructs ALL five filter types (hand-built IDAT per filter);
    resize is a real nearest-neighbor resample re-encoded as PNG."""
    import struct
    import zlib

    from rookray.ops import multimodal as M

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (23, 31), dtype=np.uint8)
    assert np.array_equal(M.decode_png(M.encode_png(img)), img)

    # hand-filter each row type and check reconstruction
    h, w = 5, 7
    ref = rng.randint(0, 256, (h, w)).astype(np.int64)
    raw = bytearray()
    for y, f in enumerate([0, 1, 2, 3, 4]):
        up = ref[y - 1] if y else np.zeros(w, np.int64)
        row = bytearray([f])
        for x in range(w):
            left = ref[y, x - 1] if x else 0
            ul = ref[y - 1, x - 1] if (x and y) else 0
            if f == 0:
                row.append(int(ref[y, x]) % 256)
            elif f == 1:
                row.append(int(ref[y, x] - left) % 256)
            elif f == 2:
                row.append(int(ref[y, x] - up[x]) % 256)
            elif f == 3:
                row.append(int(ref[y, x] - (left + up[x]) // 2) % 256)
            else:
                p = left + up[x] - ul
                pl, pu, pul = abs(p - left), abs(p - up[x]), abs(p - ul)
                pred = (left if pl <= pu and pl <= pul
                        else up[x] if pu <= pul else ul)
                row.append(int(ref[y, x] - pred) % 256)
        raw += row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    payload = (M._PNG_SIG + M._png_chunk(b"IHDR", ihdr)
               + M._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
               + M._png_chunk(b"IEND", b""))
    assert np.array_equal(M.decode_png(payload), ref.astype(np.uint8))

    # real resize: decode(resized) equals numpy nearest-neighbor
    small = M.resize_nearest(img, 8, 6)
    assert small.shape == (6, 8)
    docs_tbl = pa.table({
        "doc_id": pa.array([0, 3, 6], pa.int64()),  # all % 3 == 0 → image
        "text": pa.array(["a", "b", "c"], pa.string()),
    })
    media = M.media_from_documents(ray.data.from_arrow(docs_tbl))
    assert all(M.is_png(p) for p in media.to_pandas()["payload"])
    resized = media.map_batches(
        M.ResizeImages, fn_constructor_kwargs=dict(width=8, height=6),
        batch_format="pyarrow", batch_size=16, concurrency=1).to_pandas()
    for mid, p in zip(resized["media_id"], resized["payload"]):
        got = M.decode_png(p)
        exp = M.resize_nearest(M.png_pixels_for_doc(int(mid)), 8, 6)
        assert np.array_equal(got, exp)


def test_apng_codec_roundtrip_and_frame_sampling():
    """APNG (animated PNG) codec: encode→decode returns every frame
    pixel-identical; a plain PNG decodes as one frame; the frame-sample
    stage decodes real frames with the right stride."""
    from rookray.ops import multimodal as M

    rng = np.random.RandomState(9)
    frames = [rng.randint(0, 256, (11, 17), dtype=np.uint8)
              for _ in range(5)]
    payload = M.encode_apng(frames)
    assert M.is_apng(payload) and M.is_png(payload)
    got = M.decode_apng(payload)
    assert len(got) == 5
    assert all(np.array_equal(a, b) for a, b in zip(got, frames))
    # plain PNG → single frame; DecodeFeatures takes the real pixel
    # path for APNG too (cover frame = frame 0)
    single = M.decode_apng(M.encode_png(frames[0]))
    assert len(single) == 1 and np.array_equal(single[0], frames[0])
    assert np.array_equal(M.decode_png(payload), frames[0])

    docs_tbl = pa.table({
        "doc_id": pa.array([2, 5, 11], pa.int64()),  # all % 3 == 2 → video
        "text": pa.array(["a", "b", "c"], pa.string()),
    })
    media = M.media_from_documents(ray.data.from_arrow(docs_tbl))
    out = (M.apng_frames(media, every=2).to_pandas()
           .sort_values(["media_id", "frame_idx"]))
    for mid in (2, 5, 11):
        nf = mid % 4 + 2
        sub = out[out["media_id"] == mid]
        assert sub["frame_idx"].tolist() == list(range(0, nf, 2))
        for f, s in zip(sub["frame_idx"], sub["sum_intensity"]):
            assert s == int(M.apng_frame_for_doc(mid, int(f))
                            .sum(dtype=np.int64))


def test_decontaminate_empty_snippets():
    """An empty (or all-empty-string) benchmark set returns a typed
    empty result under every engine instead of crashing the seed
    actor's L* computation."""
    from rookray.ops.corpus import decontaminate

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["aa", "bb"])})
    ds = ray.data.from_arrow(t)
    for snips in ([], [""]):
        out = decontaminate(ds, snips, method="seed")
        assert out.count() == 0
        assert out.schema().names == ["doc_id", "n_hits"]
