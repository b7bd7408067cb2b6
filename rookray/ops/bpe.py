"""Distributed BPE (byte-pair-encoding) tokenizer training + encoding.

The standard trainer shape (Sennrich et al. 2016; what HuggingFace
``tokenizers`` implements): pre-tokenize the corpus into words, reduce
to a (word, frequency) table ONCE, then iterate merges over that table
— per-iteration cost is O(|word vocab|), independent of corpus size.
Here both phases are distributed:

* word counting: per-batch regex pre-tokenize + ``value_counts``
  combiner → one small ``groupby(word).sum`` shuffle — the corpus
  itself is read exactly once;
* each merge iteration: per-batch adjacent-pair counting over the
  word-frequency table (weighted by freq) → ``groupby(pair).sum`` →
  the driver folds only the per-iteration TOP pair (one row);
  applying the merge is a stateless ``map_batches`` rewrite of the
  symbol sequences.  The word table stays a materialized Dataset
  between iterations; nothing corpus-sized ever reaches the driver.

Determinism: ties break on (count desc, pair lexicographic asc), so
the learned merge list is a pure function of the corpus.  The serial
reference implementation in ``tests/test_bpe.py`` must match
bit-exactly — that is the correctness oracle (iterative argmax is not
SQL-expressible, so the driver sees this rows-only, like lang-ID).

Encoding: merges are broadcast once per actor (``EncodeBPE.__init__``
builds the rank table); each batch pre-tokenizes, encodes each
DISTINCT word once through a memo cache, and maps counts back —
the hot path is per-unique-word, not per-occurrence.

Reference scope note: rook moves opaque row payloads and never looks
inside them; tokenizer training belongs to the training-data operator
suite this engine adds on top (SURVEY.md §2 "beyond the reference").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

#: GPT-ish pre-tokenizer: word = letter-run, digit-run, or a single
#: non-space symbol (keeps the oracle/reference restatement trivial)
PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_SEP = "\x1f"   # symbol separator inside a word's symbol sequence


def _word_counts(ds, col: str):
    """Distributed (word, freq) table: the corpus is read once."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        text = batch.column(col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        s = text.to_pandas().fillna("")
        found = s.str.findall(PRETOKEN_RE).explode().dropna()
        vc = found.value_counts()
        return pa.table({"word": pa.array(vc.index.to_numpy(dtype=object),
                                          pa.string()),
                         "freq": pa.array(vc.to_numpy().astype(np.int64))})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("word").aggregate(Sum("freq", alias_name="freq")))


def _to_symbols(word: str) -> str:
    return _SEP.join(word)


def _pair_partial(batch: pa.Table) -> pa.Table:
    """Adjacent-symbol-pair counts of a word-table batch, freq-weighted."""
    syms = batch.column("syms").to_pandas()
    freq = batch.column("freq").to_numpy(zero_copy_only=False)
    pairs: dict[tuple[str, str], int] = {}
    for s, f in zip(syms, freq):
        parts = s.split(_SEP)
        for a, b in zip(parts, parts[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + int(f)
    if not pairs:
        return pa.table({"left": pa.array([], pa.string()),
                         "right": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    ks = list(pairs)
    return pa.table({"left": pa.array([k[0] for k in ks], pa.string()),
                     "right": pa.array([k[1] for k in ks], pa.string()),
                     "cnt": pa.array([pairs[k] for k in ks], pa.int64())})


def _merge_word(parts: list[str], left: str, right: str) -> list[str]:
    """Exact left-to-right non-overlapping merge of one symbol list."""
    out, i, n = [], 0, len(parts)
    while i < n:
        if i + 1 < n and parts[i] == left and parts[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(parts[i])
            i += 1
    return out


class _ApplyMerge:
    def __init__(self, left: str, right: str):
        self.left = left
        self.right = right
        self.probe = f"{left}{_SEP}{right}"

    def __call__(self, batch: pa.Table) -> pa.Table:
        # vectorized SUPERSET prefilter (the probe can also hit a pair
        # whose left symbol merely ENDS with `left`, e.g. (xa, b) for
        # probe a␟b — so it only selects candidates); the exact
        # boundary-aware merge runs in Python on those few rows only
        syms = batch.column("syms")
        if isinstance(syms, pa.ChunkedArray):
            syms = syms.combine_chunks()
        hit = pc.match_substring(syms, self.probe).to_numpy(
            zero_copy_only=False).astype(bool)
        if not hit.any():
            return batch
        vals = syms.to_pandas()
        vals[hit] = [
            _SEP.join(_merge_word(s.split(_SEP), self.left, self.right))
            for s in vals[hit]]
        return batch.set_column(
            batch.column_names.index("syms"), "syms",
            pa.array(vals.to_numpy(dtype=object), pa.string()))


def train_bpe(ds, col: str = "text", n_merges: int = 50) -> pd.DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus.  Returns the
    merge table (rank, left, right, count) — ``left+right`` becomes
    one symbol at each rank.  Stops early when no pair repeats."""
    from ray.data.aggregate import Sum

    words = _word_counts(ds, col)

    def add_syms(batch: pa.Table) -> pa.Table:
        w = batch.column("word").to_pandas()
        syms = w.map(_to_symbols)
        return batch.append_column(
            "syms", pa.array(syms.to_numpy(dtype=object), pa.string()))

    table = words.map_batches(add_syms, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    def block_top(batch: pa.Table) -> pa.Table:
        # per-block top-1 (count desc, pair lexicographic asc): the
        # driver folds ≤ 1 row per block, not the pair vocabulary
        if len(batch) == 0:
            return batch
        df = pd.DataFrame({
            "left": batch.column("left").to_pandas(),
            "right": batch.column("right").to_pandas(),
            "cnt": batch.column("cnt").to_numpy(zero_copy_only=False),
        }).sort_values(["cnt", "left", "right"],
                       ascending=[False, True, True])
        return pa.Table.from_pandas(df.iloc[:1], preserve_index=False)

    merges = []
    for rank in range(n_merges):
        rows = (table.map_batches(_pair_partial, batch_format="pyarrow",
                                  zero_copy_batch=True)
                .groupby(["left", "right"])
                .aggregate(Sum("cnt", alias_name="cnt"))
                .map_batches(block_top, batch_format="pyarrow")
                .take_all())
        if not rows:
            break
        df = pd.DataFrame(rows).sort_values(
            ["cnt", "left", "right"], ascending=[False, True, True])
        top = df.iloc[0]
        if int(top["cnt"]) < 2:
            break
        merges.append((rank, str(top["left"]), str(top["right"]),
                       int(top["cnt"])))
        table = table.map_batches(
            _ApplyMerge(str(top["left"]), str(top["right"])),
            batch_format="pyarrow", zero_copy_batch=True).materialize()
    return pd.DataFrame(merges, columns=["rank", "left", "right", "cnt"])


class EncodeBPE:
    """Actor-pool encoder: merge ranks compiled once per actor; each
    batch encodes its DISTINCT words through a memo cache and appends
    ``n_bpe`` (token count per row)."""

    def __init__(self, merges: list[tuple[str, str]], col: str = "text"):
        self.ranks = {(l, r): i for i, (l, r) in enumerate(merges)}
        self.col = col
        self._memo: dict[str, int] = {}

    def _encode_word(self, word: str) -> int:
        n = self._memo.get(word)
        if n is not None:
            return n
        parts = list(word)
        while len(parts) > 1:
            best, best_rank = None, None
            for i, (a, b) in enumerate(zip(parts, parts[1:])):
                r = self.ranks.get((a, b))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            parts[best:best + 2] = [parts[best] + parts[best + 1]]
        self._memo[word] = len(parts)
        return len(parts)

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        s = text.to_pandas().fillna("")
        found = s.str.findall(PRETOKEN_RE)
        counts = found.map(
            lambda ws: sum(self._encode_word(w) for w in ws))
        return batch.append_column(
            "n_bpe", pa.array(counts.to_numpy().astype(np.int64)))


def encode_bpe(ds, merges: pd.DataFrame, col: str = "text",
               concurrency: int = 2):
    """Append per-row BPE token counts using a learned merge table."""
    pairs = [(str(l), str(r))
             for l, r in zip(merges["left"], merges["right"])]
    return ds.map_batches(
        EncodeBPE, fn_constructor_kwargs=dict(merges=pairs, col=col),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency)
