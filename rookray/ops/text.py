"""Text-analysis operators over a documents table.

All per-batch kernels are vectorized (pyarrow.compute regex/string
kernels or pandas C string ops); the language-ID stage is a stateful
actor-pool class (profiles built once, broadcast via constructor).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

TOKEN_RE = r"\S+"
WORD_RE = r"[A-Za-z]+"
PUNCT_RE = r"[.,;:!?]"

_STOPWORDS = (
    "the a an and or of to in is are was were be been it this that "
    "with as for on at by from"
).split()


def token_count_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Whitespace token count + a BPE-ish subword estimate.

    ``n_tokens``: count of ``\\S+`` runs.  ``n_subwords``: count of
    BPE-style pieces — alpha runs contribute ceil(len/4) pieces (the
    classic ~4-chars-per-token heuristic), every non-alpha non-space
    char is its own piece.  Both are single-pass pyarrow regex kernels.
    """
    text = batch.column(col)
    n_tok = pc.count_substring_regex(text, pattern=TOKEN_RE)
    alpha_chars = pc.count_substring_regex(text, pattern="[A-Za-z]")
    other = pc.count_substring_regex(text, pattern=r"[^A-Za-z\s]")
    n_sub = pc.add(
        pc.cast(pc.ceil(pc.divide(pc.cast(alpha_chars, pa.float64()), 4.0)), pa.int64()),
        pc.cast(other, pa.int64()),
    )
    return batch.select(["doc_id"]).append_column(
        "n_tokens", pc.cast(n_tok, pa.int64())
    ).append_column("n_subwords", n_sub)


def quality_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Quality signals + a deterministic 0-1 score.

    Signals: char length, word count, mean word length, punctuation
    ratio, stopword ratio.  The score formula is fixed so the DuckDB
    oracle can reproduce it exactly (see __ray_entry__.oracle_sql)."""
    text = batch.column(col)
    n_chars = pc.cast(pc.utf8_length(text), pa.float64())
    n_words = pc.cast(pc.count_substring_regex(text, pattern=WORD_RE), pa.float64())
    n_punct = pc.cast(pc.count_substring_regex(text, pattern=PUNCT_RE), pa.float64())
    alpha_chars = pc.cast(pc.count_substring_regex(text, pattern="[A-Za-z]"), pa.float64())
    stop_pat = r"\b(" + "|".join(_STOPWORDS) + r")\b"
    n_stop = pc.cast(pc.count_substring_regex(text, pattern=stop_pat), pa.float64())

    safe_words = pc.max_element_wise(n_words, 1.0)
    mean_word_len = pc.divide(alpha_chars, safe_words)
    punct_ratio = pc.divide(n_punct, pc.max_element_wise(n_chars, 1.0))
    stop_ratio = pc.divide(n_stop, safe_words)
    # fixed formula: reward 3-8 char words, some stopwords, low punct
    score = pc.subtract(
        pc.add(
            pc.multiply(pc.min_element_wise(stop_ratio, 0.5), 1.0),
            pc.min_element_wise(pc.divide(mean_word_len, 8.0), 1.0),
        ),
        pc.multiply(punct_ratio, 2.0),
    )
    out = batch.select(["doc_id"])
    out = out.append_column("n_words", pc.cast(n_words, pa.int64()))
    out = out.append_column("mean_word_len", mean_word_len)
    out = out.append_column("punct_ratio", punct_ratio)
    out = out.append_column("stop_ratio", stop_ratio)
    out = out.append_column("quality_score", score)
    return out


def fingerprint_batch(batch: pa.Table, col: str = "text",
                      with_md5: bool = False) -> pa.Table:
    """Document fingerprints: a vectorized 64-bit rolling hash
    (engine-internal, used for cheap equality bucketing), plus —
    opt-in — md5 of the raw text.  md5 exists ONLY for SQL
    cross-checkability (DuckDB ``md5()``); it is a per-row hashlib
    call, so the hot path defaults it OFF and the oracle-checked
    driver query turns it on explicitly."""
    from rookray.util import hash_strings

    roll = hash_strings(batch.column(col)).astype(np.int64)
    out = (batch.select(["doc_id"])
           .append_column("fingerprint_64", pa.array(roll, pa.int64())))
    if with_md5:
        text_np = batch.column(col).to_pandas()
        md5 = text_np.map(
            lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())
        out = out.append_column("fingerprint_md5",
                                pa.array(md5, pa.string()))
    return out


class LangId:
    """Character-trigram language identifier — actor-pool stage.

    Profiles (lang → top-trigram set) are built ONCE on the driver from
    a labeled sample and shipped via constructor (broadcast once per
    actor, never per batch); ``__call__`` scores Arrow batches with one
    numpy pass over a NUL-joined byte buffer.  Use as::

        profiles = LangId.build_profiles(sample_df)
        ds.map_batches(LangId, fn_constructor_args=(profiles,),
                       concurrency=N, batch_format="pyarrow")
    """

    def __init__(self, profiles: dict[str, set[str]]):
        self.langs = sorted(profiles)
        # profile trigrams as sorted 24-bit byte codes + a (trigram ×
        # lang) membership matrix — the vectorized lookup table (the
        # round-2 per-row Python dict loop was ~10× slower per core).
        # Non-3-byte (multi-byte UTF-8) trigrams are dropped from the
        # table; scoring uses the same byte-trigram space, so the
        # feature space stays consistent.
        by_code: dict[int, np.ndarray] = {}
        for li, lang in enumerate(self.langs):
            for t in profiles[lang]:
                bt = t.encode("utf-8")
                if len(bt) != 3 or 0 in bt:
                    continue
                code = (bt[0] << 16) | (bt[1] << 8) | bt[2]
                by_code.setdefault(code, np.zeros(len(self.langs)))[li] += 1.0
        self.codes = np.array(sorted(by_code), dtype=np.int64)
        self.M = (np.stack([by_code[c] for c in self.codes])
                  if len(by_code) else np.zeros((0, len(self.langs))))

    @staticmethod
    def build_profiles(sample: pd.DataFrame, text_col: str = "text",
                       lang_col: str = "lang", top: int = 300) -> dict[str, set[str]]:
        profiles = {}
        for lang, g in sample.groupby(lang_col):
            counts: dict[str, int] = {}
            for s in g[text_col].head(200):
                s = f" {s.lower()} "
                for i in range(len(s) - 2):
                    t = s[i:i + 3]
                    counts[t] = counts.get(t, 0) + 1
            profiles[lang] = set(sorted(counts, key=counts.get, reverse=True)[:top])
        return profiles

    def __call__(self, batch: pa.Table) -> pa.Table:
        # fully vectorized scoring: all texts concatenated into one
        # byte buffer (NUL-separated), trigram codes by three shifted
        # slices, per-doc DISTINCT via np.unique on (doc, code) keys,
        # profile lookup via searchsorted, scatter-add of lang rows.
        # Python str.lower (not pc.utf8_lower) keeps predictions
        # bit-identical to the profile builder's casing.
        n = batch.num_rows
        scores = np.zeros((n, len(self.langs)))
        enc = [f" {s.lower()} ".encode("utf-8")
               for s in batch.column("text").to_pylist()]
        if n and self.codes.size:
            buf = np.frombuffer(b"\x00\x00".join(enc), dtype=np.uint8)
            lens = np.fromiter((len(b) for b in enc), np.int64, count=n)
            offs = np.zeros(n, dtype=np.int64)
            if n > 1:
                offs[1:] = np.cumsum(lens[:-1] + 2)
            if buf.size >= 3:
                a = buf.astype(np.int64)
                code = (a[:-2] << 16) | (a[1:-1] << 8) | a[2:]
                valid = (a[:-2] != 0) & (a[1:-1] != 0) & (a[2:] != 0)
                pos = np.flatnonzero(valid)
                doc = np.searchsorted(offs, pos, side="right") - 1
                key = (doc << np.int64(24)) | code[pos]
                uk = np.unique(key)  # per-doc DISTINCT trigrams
                ud, uc = uk >> np.int64(24), uk & np.int64(0xFFFFFF)
                idx = np.searchsorted(self.codes, uc)
                idx_c = np.minimum(idx, len(self.codes) - 1)
                hit = self.codes[idx_c] == uc
                np.add.at(scores, ud[hit], self.M[idx_c[hit]])
        best = np.argmax(scores, axis=1)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "pred_lang": pa.array(
                [self.langs[b] for b in best] if self.langs else [None] * n,
                pa.string()),
            "lang_score": pa.array(scores[np.arange(n), best],
                                   pa.float64()),
        })


# default PII-style scrub patterns (RE2 dialect — the same engine
# pyarrow.compute and DuckDB regexp_replace both use, so a SQL oracle
# applies the identical patterns)
REDACT_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\d+", "<NUM>"),
)


def redact_batch(batch: pa.Table, col: str = "text",
                 patterns: tuple[tuple[str, str], ...] = REDACT_PATTERNS,
                 out_col: str | None = None) -> pa.Table:
    """Scrub ``patterns`` (ordered (regex, replacement) pairs) from one
    string column — the PII-redaction pass of a training-data pipeline.
    Pure ``pc.replace_substring_regex`` chain: vectorized, zero-copy in,
    RE2 semantics identical to the DuckDB oracle's regexp_replace."""
    s = batch.column(col)
    for pat, repl in patterns:
        s = pc.replace_substring_regex(s, pattern=pat, replacement=repl)
    name = out_col or f"{col}_redacted"
    return batch.append_column(name, s)


def repetition_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Gopher-style repetition signals per document: total words,
    distinct words, and the modal word's count (top_word_n / n_words is
    the 'fraction in the most common word' filter).  Vectorized via one
    split + explode + two grouped reductions per batch; a document is a
    single row so the whole computation is batch-local.  Documents with
    zero words are dropped (no denominator — mirrors the SQL oracle's
    inner unnest)."""
    s = batch.column(col).to_pandas()
    ids = batch.column("doc_id").to_pandas()
    words = s.str.split()
    ex = words.explode().dropna()
    c = ex.groupby([ex.index, ex.rename("w")]).size()
    per_row = c.groupby(level=0)
    out = pd.DataFrame({
        "n_words": per_row.sum(),
        "n_distinct": per_row.size(),
        "top_word_n": per_row.max(),
    })
    out.insert(0, "doc_id", ids.loc[out.index].to_numpy())
    return pa.Table.from_pandas(out.astype(
        {"n_words": np.int64, "n_distinct": np.int64,
         "top_word_n": np.int64}), preserve_index=False)


# ---------------------------------------------------------------- datasets


def token_counts(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.map_batches(token_count_batch, batch_format="pyarrow", zero_copy_batch=True)


def quality(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.map_batches(quality_batch, batch_format="pyarrow", zero_copy_batch=True)


def fingerprints(ds: "ray.data.Dataset",
                 with_md5: bool = False) -> "ray.data.Dataset":
    def fingerprint(batch: pa.Table) -> pa.Table:
        return fingerprint_batch(batch, with_md5=with_md5)

    return ds.map_batches(fingerprint, batch_format="pyarrow",
                          zero_copy_batch=True)


def redact(ds: "ray.data.Dataset", col: str = "text",
           patterns: tuple[tuple[str, str], ...] = REDACT_PATTERNS,
           out_col: str | None = None) -> "ray.data.Dataset":
    return ds.map_batches(
        lambda b: redact_batch(b, col, patterns, out_col),
        batch_format="pyarrow", zero_copy_batch=True)


def repetition(ds: "ray.data.Dataset", col: str = "text") -> "ray.data.Dataset":
    return ds.map_batches(lambda b: repetition_batch(b, col),
                          batch_format="pyarrow", zero_copy_batch=True)


def lang_id(ds: "ray.data.Dataset", profiles: dict[str, set[str]],
            concurrency: int = 4) -> "ray.data.Dataset":
    return ds.map_batches(
        LangId, fn_constructor_args=(profiles,), batch_format="pyarrow",
        zero_copy_batch=True, batch_size=2048, concurrency=(1, concurrency),
    )


def vocab_topk(ds: "ray.data.Dataset", k: int = 32,
               col: str = "text") -> pd.DataFrame:
    """Corpus vocabulary: the global top-``k`` tokens by frequency
    (count desc, token asc on ties) — the vocab-building sweep of a
    training-data pipeline.

    Scale shape: per-batch ``value_counts`` collapses each batch to
    its distinct tokens BEFORE the shuffle (the combiner pattern — a
    100-TB corpus ships ~vocab-sized partials per block, not one row
    per word occurrence), ``groupby(token)`` sums the partials, and
    the final top-k collects only ``k`` rows per block to the driver
    (bounded regardless of vocabulary size)."""
    from ray.data.aggregate import Sum
    from rookray.ops.corpus import _split_words

    def partial(batch: pa.Table) -> pa.Table:
        kept, _, _ = _split_words(batch.column(col).combine_chunks())
        vc = pc.value_counts(kept)
        return pa.table({"token": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    totals = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("token").aggregate(Sum("n", alias_name="n")))

    def block_topk(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False)
        tok = batch.column("token").to_pandas()
        order = np.lexsort((tok.to_numpy(), -n))[:k]
        return batch.take(pa.array(order))

    rows = (totals.map_batches(block_topk, batch_format="pyarrow")
            .take_all())  # ≤ k rows per block — bounded driver collect
    df = pd.DataFrame(rows, columns=["token", "n"])
    df = df.sort_values(["n", "token"], ascending=[False, True]).head(k)
    return df.reset_index(drop=True).astype({"n": np.int64})
