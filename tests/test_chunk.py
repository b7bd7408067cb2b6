"""Content-defined chunking: bit-exact vs a pure-Python rolling-hash
reference, shift robustness (the property fixed-width shingling lacks),
and greedy min/max size enforcement."""

import random

import numpy as np
import pyarrow as pa
import pytest
import ray

from rookray.ops.chunk import (
    _BASE,
    _M64,
    chunk_boundaries,
    content_chunks,
    gear_table,
)

GEAR = gear_table()


def ref_cuts(text: str, W: int = 16, mask_bits: int = 6) -> list[int]:
    b = text.encode()
    cuts = []
    for i in range(W - 1, len(b) - 1):
        h = 0
        for k in range(W):
            h = (h + GEAR[b[i - k]] * pow(_BASE, k, _M64)) % _M64
        if h % (1 << mask_bits) == 0:
            cuts.append(i)
    return cuts


def test_boundaries_match_reference():
    rng = random.Random(11)
    texts = ["".join(rng.choice("abcdefgh .,") for _ in range(rng.randint(0, 250)))
             for _ in range(30)]
    texts += ["", "tiny", "x" * 15, "y" * 16, "z" * 17]
    cd, cp = chunk_boundaries(pa.array(texts))
    for d, t in enumerate(texts):
        assert list(cp[cd == d]) == ref_cuts(t), f"doc {d}"


def test_shift_robustness():
    """Inserting a prefix must reproduce every boundary that is at
    least a window past the edit (content-defined, not offset-defined)."""
    rng = random.Random(5)
    base = "".join(rng.choice("qwertyuiop ") for _ in range(400))
    shifted = "INSERTED-PREFIX " + base
    c1 = set(ref_cuts(base))
    c2 = {c - len("INSERTED-PREFIX ") for c in ref_cuts(shifted)}
    assert c1, "fixture produced no boundaries; lower mask_bits"
    far = {c for c in c1 if c >= 16}
    assert far <= c2


def test_dataset_op_and_coverage():
    rng = random.Random(3)
    texts = ["".join(rng.choice("abc def") for _ in range(rng.randint(0, 300)))
             for _ in range(50)]
    ds = ray.data.from_arrow(pa.table({"doc_id": list(range(50)),
                                       "text": texts}))
    out = content_chunks(ds).to_pandas().sort_values(
        ["doc_id", "chunk_id"]).reset_index(drop=True)
    # chunks tile each doc exactly: contiguous, complete, in order
    for d, t in enumerate(texts):
        sub = out[out["doc_id"] == d]
        assert list(sub["chunk_id"]) == list(range(len(sub)))
        assert sub["chunk_len"].sum() == len(t)
        assert list(sub["chunk_start"]) == \
            [0] + list(np.cumsum(sub["chunk_len"].to_numpy())[:-1])


def test_min_max_enforcement():
    """Greedy FastCDC semantics: no chunk below min_size (except a
    doc's final tail), none above max_size, forced cuts at max_size."""
    rng = random.Random(9)
    texts = ["".join(rng.choice("abcdefgh ") for _ in range(rng.randint(50, 500)))
             for _ in range(40)]
    ds = ray.data.from_arrow(pa.table({"doc_id": list(range(len(texts))),
                                       "text": texts}))
    out = content_chunks(ds, min_size=32, max_size=96).to_pandas()
    assert (out["chunk_len"] <= 96).all()
    last_chunk = out.groupby("doc_id")["chunk_id"].transform("max")
    non_tail = out[out["chunk_id"] != last_chunk]
    if len(non_tail):
        assert (non_tail["chunk_len"] >= 32).all()
    # greedy reference on one doc
    t = texts[0]
    cuts = ref_cuts(t)
    last, exp = -1, []
    for c in cuts:
        while c - last > 96:
            last += 96
            exp.append(last)
        if c - last >= 32:
            exp.append(c)
            last = c
    end = len(t) - 1
    while end - last > 96:
        last += 96
        exp.append(last)
    got = out[out["doc_id"] == 0].sort_values("chunk_id")
    got_cuts = list(np.cumsum(got["chunk_len"].to_numpy())[:-1] - 1)
    assert got_cuts == exp


def test_chunk_strings_tile_docs():
    rng = random.Random(17)
    texts = ["".join(rng.choice("abcdef gh") for _ in range(rng.randint(0, 200)))
             for _ in range(25)] + ["", "tiny"]
    from rookray.ops.chunk import chunk_strings
    # sliced input exercises the non-contiguous compaction path
    arr = pa.array(["IGNORED"] + texts).slice(1)
    chunks, docrow = chunk_strings(arr)
    for d, t in enumerate(texts):
        mine = [chunks[i].as_py() for i in np.flatnonzero(docrow == d)]
        assert "".join(mine) == t
        cuts = ref_cuts(t)
        exp = [t[s + 1:e + 1] for s, e in
               zip([-1] + cuts, cuts + [len(t) - 1])] if t else [""]
        assert mine == exp


def test_dup_chunk_stats_planted_and_shifted():
    """A duplicated span pasted into two docs at DIFFERENT offsets must
    still be flagged (the property ngram-shingle dedup at fixed offsets
    already has, content-defined chunking keeps under shifts)."""
    rng = random.Random(23)
    span = "".join(rng.choice("abcdefgh ") for _ in range(240))
    uniq = ["".join(rng.choice("qrstuvwx ") for _ in range(200))
            for _ in range(4)]
    texts = [uniq[0] + span, "ZZ-shift " + span + uniq[1], uniq[2], uniq[3]]
    from rookray.ops.chunk import dup_chunk_stats
    ds = ray.data.from_arrow(pa.table({"doc_id": list(range(4)),
                                       "text": texts}))
    out = (dup_chunk_stats(ds).to_pandas()
           .sort_values("doc_id").set_index("doc_id"))
    # interior chunks of the shared span are identical in docs 0 and 1
    assert out.loc[0, "n_dup_chunks"] > 0
    assert out.loc[1, "n_dup_chunks"] > 0
    assert out.loc[2, "n_dup_chunks"] == 0
    assert out.loc[3, "n_dup_chunks"] == 0
    assert (out["n_chunks"] > 0).all()


def test_doc_too_long_raises():
    with pytest.raises(ValueError):
        chunk_boundaries(pa.array(["x" * 9000]))
