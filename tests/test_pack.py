"""Sequence splitting / packing over the sequence table."""

import numpy as np
import pyarrow as pa

import ray.data

from rookray.ops.pack import pack_batch, split_batch, pack_sequences, split_sequences


def _tbl(docs):
    return pa.table({
        "doc_id": pa.array([d for d, _ in docs]),
        "tokens": pa.array([t for _, t in docs], pa.list_(pa.int32())),
    })


def test_split_exact_chunks():
    t = _tbl([("a", list(range(10))), ("b", list(range(25)))])
    out = split_batch(t, context_len=10, min_tail=3)
    rows = out.to_pylist()
    assert [r["doc_id"] for r in rows] == ["a", "b", "b", "b"]
    assert [r["n_tok"] for r in rows] == [10, 10, 10, 5]
    assert rows[1]["tokens"] == list(range(10))
    assert rows[3]["tokens"] == list(range(20, 25))


def test_split_drops_small_tails_and_docs():
    t = _tbl([("a", list(range(12))), ("tiny", [1, 2])])
    out = split_batch(t, context_len=10, min_tail=3)
    rows = out.to_pylist()
    # a's 2-token tail dropped; tiny (2 < min_tail) dropped entirely
    assert [(r["doc_id"], r["n_tok"]) for r in rows] == [("a", 10)]


def test_pack_stream_roundtrip():
    docs = [("a", [1, 2, 3]), ("b", [4, 5]), ("c", [6, 7, 8, 9])]
    out = pack_batch(_tbl(docs), context_len=4, eos=0)
    rows = out.to_pylist()
    stream = [tok for r in rows for tok in r["tokens"]]
    assert stream == [1, 2, 3, 0, 4, 5, 0, 6, 7, 8, 9, 0]
    assert [r["n_tok"] for r in rows] == [4, 4, 4]
    assert sum(r["n_docs"] for r in rows) == 3


def test_pack_full_blocks_except_tail():
    rng = np.random.RandomState(0)
    docs = [(f"d{i}", rng.randint(1, 100, rng.randint(5, 60)).tolist())
            for i in range(50)]
    out = pack_batch(_tbl(docs), context_len=128)
    lens = out.column("n_tok").to_pylist()
    assert all(l == 128 for l in lens[:-1]) and 0 < lens[-1] <= 128
    total = sum(len(t) for _, t in docs) + len(docs)  # + one EOS per doc
    assert sum(lens) == total


def test_dataset_paths():
    docs = [(f"d{i:02d}", list(range(i + 1))) for i in range(40)]
    ds = ray.data.from_arrow(_tbl(docs))
    assert split_sequences(ds, context_len=8, min_tail=1).count() > 40 // 2
    packed = (pack_sequences(ds, context_len=64).to_pandas()
              .sort_values("pack_id").reset_index(drop=True))
    assert (packed["n_tok"].iloc[:-1] == 64).all()
    assert list(packed["pack_id"]) == list(range(len(packed)))


def test_pack_repartition_invariant():
    """Global pack output is a pure function of the table — identical
    under different Ray block layouts (round 1: per-batch ids collided
    and results depended on block boundaries)."""
    rng = np.random.RandomState(7)
    docs = [(f"d{i:03d}", rng.randint(0, 999, rng.randint(1, 90)).tolist())
            for i in range(120)]
    t = _tbl(docs)

    def run(ds):
        df = pack_sequences(ds, context_len=128).to_pandas()
        df["tokens"] = df["tokens"].map(tuple)
        return df.sort_values("pack_id").reset_index(drop=True)

    a = run(ray.data.from_arrow(t))
    b = run(ray.data.from_arrow(t).repartition(13))
    assert a.equals(b)
    # ids globally unique and dense
    assert a["pack_id"].is_unique
    # stream roundtrip: concatenation of blocks == doc_id-ordered stream
    stream = [tok for toks in a["tokens"] for tok in toks]
    expect = []
    for d, toks in sorted(docs):
        expect.extend(toks)
        expect.append(0)
    assert stream == expect


def test_pack_distributed_prefix_sum_int_ids():
    """Integer ids take the DISTRIBUTED offset path (bucket totals →
    driver cumsum over bucket sums → per-bucket local cumsum).  Forced
    multi-bucket (bucket_width=8, sparse non-contiguous ids) + coarse
    assembly (assemble_coarse=4): the stream must equal the in-process
    doc_id-ordered concatenation exactly, and be repartition-invariant."""
    rng = np.random.RandomState(11)
    ids = (np.arange(97) * 13 + 5).tolist()  # sparse, gaps, many buckets
    docs = [(int(i), rng.randint(0, 999, rng.randint(1, 70)).tolist())
            for i in ids]
    t = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "tokens": pa.array([tk for _, tk in docs], pa.list_(pa.int32())),
    })

    def run(ds):
        df = pack_sequences(ds, context_len=96, bucket_width=8,
                            assemble_coarse=4).to_pandas()
        df["tokens"] = df["tokens"].map(tuple)
        return df.sort_values("pack_id").reset_index(drop=True)

    a = run(ray.data.from_arrow(t))
    b = run(ray.data.from_arrow(t).repartition(17))
    assert a.equals(b)
    assert a["pack_id"].is_unique
    assert list(a["pack_id"]) == list(range(len(a)))
    assert (a["n_tok"].iloc[:-1] == 96).all()
    stream = [tok for toks in a["tokens"] for tok in toks]
    expect = []
    for d, toks in sorted(docs):
        expect.extend(toks)
        expect.append(0)
    assert stream == expect
    assert int(a["n_docs"].sum()) == len(docs)
