"""Distributed BPE training must match a serial reference trainer
bit-exactly (same pre-tokenizer, same tie-break), and the rank-loop
encoder must reproduce the training segmentation for in-corpus words."""

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from rookray.ops.bpe import (PRETOKEN_RE, _SEP, EncodeBPE, encode_bpe,
                             train_bpe)


def serial_bpe(texts, n_merges):
    """The single-threaded oracle: Sennrich-style trainer."""
    words = Counter()
    for t in texts:
        words.update(re.findall(PRETOKEN_RE, t or ""))
    table = {w: list(w) for w in words}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for w, parts in table.items():
            f = words[w]
            for a, b in zip(parts, parts[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        top = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = top
        if cnt < 2:
            break
        merges.append((rank, left, right, cnt))
        for w, parts in table.items():
            out, i = [], 0
            while i < len(parts):
                if (i + 1 < len(parts) and parts[i] == left
                        and parts[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            table[w] = out
    return (pd.DataFrame(merges, columns=["rank", "left", "right", "cnt"]),
            table, words)


def _corpus():
    rng = np.random.default_rng(11)
    stems = ["low", "lower", "lowest", "new", "newer", "newest",
             "wide", "wider", "widest", "token", "tokens", "tokenize"]
    docs = []
    for _ in range(120):
        n = rng.integers(5, 30)
        docs.append(" ".join(rng.choice(stems, size=n).tolist())
                    + (", end." if rng.random() < 0.5 else ""))
    return docs


def test_train_matches_serial_reference():
    docs = _corpus()
    ds = ray.data.from_items([{"text": t} for t in docs]).repartition(5)
    got = train_bpe(ds, "text", n_merges=25)
    exp, _, _ = serial_bpe(docs, 25)
    pd.testing.assert_frame_equal(
        got.astype({"rank": np.int64, "cnt": np.int64}),
        exp.astype({"rank": np.int64, "cnt": np.int64}))
    # the false-positive probe case: a pair (xa, b) must not be merged
    # by the (a, b) merge — covered implicitly by bit-exact equality,
    # and the corpus guarantees multi-char symbols exist by rank 25
    assert (got["left"].str.len() > 1).any()


def test_encode_reproduces_training_segmentation():
    docs = _corpus()
    ds = ray.data.from_items([{"text": t} for t in docs]).repartition(3)
    merges = train_bpe(ds, "text", n_merges=25)
    _, table, words = serial_bpe(docs, 25)
    # rank-loop encoding of each training word must equal the trainer's
    # final segmentation length
    enc = EncodeBPE([(l, r) for l, r in zip(merges["left"],
                                            merges["right"])])
    for w, parts in table.items():
        assert enc._encode_word(w) == len(parts), w
    # full-pipeline counts equal the serial per-doc sum
    got = pd.DataFrame(
        encode_bpe(ds, merges).select_columns(["text", "n_bpe"]).take_all())
    for t, n in zip(got["text"], got["n_bpe"]):
        exp_n = sum(len(table[w]) for w in re.findall(PRETOKEN_RE, t))
        assert int(n) == exp_n


def test_train_early_stop_no_repeats():
    ds = ray.data.from_items([{"text": "ab cd ef"}])
    got = train_bpe(ds, "text", n_merges=10)
    # every pair occurs once — nothing reaches cnt >= 2
    assert len(got) == 0


def test_separator_never_collides():
    # the separator is a control char the pre-tokenizer can never emit
    assert not re.findall(PRETOKEN_RE, _SEP)
