"""Distributed inverted index (posting lists) — incremental maintenance.

The index must equal a from-scratch rebuild of term postings over the
lake state at every refresh while reading only the changefeed after
its first build — the purge-then-index upsert of the reference's
full-text target (`DefaultRowsMutationIndexer.java:64-88`) restated as
partition-local retract + append.  A small vocabulary makes posting
lists dense (many docs per term, tf > 1) so retraction bugs can't hide.
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

from rookray.gen import GenConfig, write_shards
from rookray.pipeline import CDCConfig, LakeTable
from rookray.targets.fti import InvertedIndex


def _expected(lake) -> pd.DataFrame:
    """From-scratch posting recompute (incl. positions) over the
    committed state."""
    state = lake.state_table().to_pandas()
    rows = []
    for _, r in state.iterrows():
        toks = np.asarray(r["tokens"], dtype=np.int64)
        for t in np.unique(toks):
            p = np.flatnonzero(toks == t)
            rows.append((int(t), r["doc_id"], len(p), p.tolist()))
    return (pd.DataFrame(rows, columns=["term", "doc_id", "tf", "pos"])
            .sort_values(["term", "doc_id"], kind="mergesort")
            .reset_index(drop=True))


def _got(index) -> pd.DataFrame:
    df = index.read().to_pandas()
    df["pos"] = df["pos"].map(lambda v: np.asarray(v).tolist())
    return (df.sort_values(["term", "doc_id"], kind="mergesort")
            .reset_index(drop=True))


def test_fti_incremental_equals_rebuild(tmp_path):
    cfg = GenConfig(n_docs=60, n_events=1200, vocab=60)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=6)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=4))
    index = InvertedIndex(lake, num_partitions=8)

    lake.apply(meta["files"][:2])
    assert index.refresh()["refreshed"]
    pd.testing.assert_frame_equal(_got(index), _expected(lake))

    # subsequent refreshes may ONLY touch the changefeed — a rescan is
    # a correctness bug in the maintenance math
    def boom():
        raise AssertionError("refresh rescanned the state")
    index._build_batches = boom

    lake.apply(meta["files"][1:4])
    assert index.refresh()["refreshed"]
    pd.testing.assert_frame_equal(_got(index), _expected(lake))

    lake.apply(meta["files"][3:])
    assert index.refresh()["refreshed"]
    expect = _expected(lake)
    pd.testing.assert_frame_equal(_got(index), expect)

    # dense vocabulary: real posting lists (many docs per term) and
    # real term frequencies — retraction bugs can't hide in tf=1 noise
    assert expect.groupby("term")["doc_id"].size().max() > 5
    assert expect["tf"].max() > 1

    # a freshly built index over the same head is identical
    fresh = InvertedIndex(lake, name="fti2", num_partitions=8)
    fresh.refresh()
    pd.testing.assert_frame_equal(_got(fresh), expect)

    # manifest postings count is the real row count
    assert index.manifest()["postings"] == len(expect)


def test_fti_crash_resume_and_noop(tmp_path):
    cfg = GenConfig(n_docs=30, n_events=600, vocab=40)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=4)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=2))
    index = InvertedIndex(lake, num_partitions=4)

    lake.apply(meta["files"][:2])
    index.refresh()
    manifest_after_first = json.dumps(index.manifest(), sort_keys=True)

    r = index.refresh()
    assert not r["refreshed"]
    assert json.dumps(index.manifest(),
                      sort_keys=True) == manifest_after_first

    lake.apply(meta["files"][1:])
    index.refresh()
    expect = _expected(lake)
    pd.testing.assert_frame_equal(_got(index), expect)

    # crash between the partition writes and the manifest swap: roll
    # the manifest back (the newer partition parquet is now an
    # uncommitted orphan) — re-refresh must converge byte-identically
    with open(os.path.join(index.root, "fti.json"), "w") as f:
        f.write(manifest_after_first)
    r = index.refresh()
    assert r["refreshed"]
    pd.testing.assert_frame_equal(_got(index), expect)


def test_fti_postings_pruned_and_search(tmp_path, monkeypatch):
    cfg = GenConfig(n_docs=40, n_events=800, vocab=30)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=2)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=2))
    index = InvertedIndex(lake, num_partitions=8)
    lake.apply(meta["files"])
    index.refresh()
    expect = _expected(lake)

    # postings(term) only opens the hash-matching partition file
    import rookray.targets.fti as F
    opened = []
    real = F.pq.read_table

    def spy(path, **kw):
        opened.append(os.path.basename(path))
        return real(path, **kw)
    monkeypatch.setattr(F.pq, "read_table", spy)

    term = int(expect["term"].iloc[0])
    got = index.postings([term]).to_pandas()
    assert len(opened) == 1
    assert opened[0].startswith(f"part-{term % 8:05d}-")
    got["pos"] = got["pos"].map(lambda v: np.asarray(v).tolist())
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        expect[expect["term"] == term].reset_index(drop=True))

    # AND search equals the set-intersection reference
    df = expect.groupby("term")["doc_id"].apply(set)
    common = sorted(df.index, key=lambda t: -len(df[t]))[:2]
    want = sorted(df[common[0]] & df[common[1]])
    assert want, "test vocabulary should make term co-occurrence certain"
    assert index.search_all(common) == want
    # a term absent from the corpus ANDs to nothing
    assert index.search_all([10_000_019]) == []


def test_fti_delete_purges_postings(tmp_path):
    """Deleting a doc removes every posting it contributed."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=2))
    index = InvertedIndex(lake, num_partitions=4)
    snap = pa.table({
        "doc_id": ["a", "b"],
        "tokens": pa.array([[1, 2, 2], [2, 3]], type=pa.list_(pa.int32())),
        "n_tok": pa.array([3, 2], type=pa.int32()),
        "source": ["s0", "s0"],
    })
    lake.bootstrap(snap, gtid_watermark=10)
    index.refresh()
    got = _got(index)
    assert got.values.tolist() == [[1, "a", 1, [0]], [2, "a", 2, [1, 2]],
                                   [2, "b", 1, [0]], [3, "b", 1, [1]]]

    from rookray.schema import OP_DELETE, change_event_schema
    rows = [dict(gtid=11, tx_id=11, seq_in_tx=0, tx_events=1, server_id=1,
                 db="rook", table="sequences", op=OP_DELETE, key="a",
                 before={"doc_id": "a", "tokens": [1, 2, 2], "n_tok": 3,
                         "source": "s0"},
                 after=None)]
    ev = pa.Table.from_pylist(rows, schema=change_event_schema())
    p = str(tmp_path / "ev.parquet")
    pq.write_table(ev, p)
    lake.apply([p])
    index.refresh()
    got = _got(index)
    assert got.values.tolist() == [[2, "b", 1, [0]], [3, "b", 1, [1]]]


def test_fti_bm25_and_corpus_stats(tmp_path):
    """BM25 ranked search must equal a from-scratch recompute over the
    state, and the manifest corpus statistics (N, total length) must
    stay exact through incremental refreshes (inserts, updates AND
    deletes all hit the stats side-channel)."""
    cfg = GenConfig(n_docs=50, n_events=1000, vocab=50)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=4)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=4))
    index = InvertedIndex(lake, num_partitions=8)

    lake.apply(meta["files"][:2])
    index.refresh()
    lake.apply(meta["files"][1:])
    index.refresh()

    state = lake.state_table().to_pandas()
    m = index.manifest()
    lens = state["tokens"].map(len)
    assert m["n_docs"] == len(state)
    assert m["total_len"] == int(lens.sum())

    # reference BM25 with the same formula
    expect = _expected(lake)
    terms = (expect.groupby("term")["doc_id"].size()
             .sort_values(ascending=False).index[:3].tolist())
    k1, b = 1.5, 0.75
    n, avg = len(state), lens.sum() / len(state)
    len_of = dict(zip(state["doc_id"], lens.astype(float)))
    sub = expect[expect["term"].isin(terms)]
    df = sub.groupby("term")["doc_id"].size()
    idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
    contrib = (idf[sub["term"]].to_numpy() * sub["tf"] * (k1 + 1)
               / (sub["tf"] + k1 * (1 - b + b * sub["doc_id"].map(len_of)
                                    / avg)))
    want = (sub.assign(c=contrib).groupby("doc_id")["c"].sum()
            .sort_values(ascending=False))

    got = index.search_bm25(terms, k=10, k1=k1, b=b)
    assert list(got["rank"]) == list(range(1, len(got) + 1))
    # same candidate ranking (ties broken by doc_id both sides)
    wf = (want.reset_index().rename(columns={"c": "score"})
          .sort_values(["score", "doc_id"], ascending=[False, True],
                       kind="mergesort").head(10).reset_index(drop=True))
    assert list(got["doc_id"]) == list(wf["doc_id"])
    np.testing.assert_allclose(got["score"], wf["score"], rtol=1e-12)
    # empty query / absent term
    assert len(index.search_bm25([10_000_019])) == 0


def test_fti_phrase_search(tmp_path):
    """Positional postings: search_phrase finds exactly the docs whose
    token sequence contains the consecutive phrase — pinned against a
    brute-force substring scan of the state."""
    cfg = GenConfig(n_docs=40, n_events=800, vocab=25)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=3)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=2))
    index = InvertedIndex(lake, num_partitions=8)
    lake.apply(meta["files"])
    index.refresh()

    state = lake.state_table().to_pandas()

    def brute(phrase):
        out = []
        for _, r in state.iterrows():
            toks = list(np.asarray(r["tokens"], dtype=np.int64))
            n, m = len(toks), len(phrase)
            if any(toks[i:i + m] == phrase for i in range(n - m + 1)):
                out.append(r["doc_id"])
        return sorted(out)

    # pick a phrase that certainly exists: first two tokens of a doc
    toks0 = list(np.asarray(state.iloc[0]["tokens"], dtype=np.int64))
    p2 = toks0[:2]
    assert index.search_phrase(p2) == brute(p2)
    p3 = toks0[:3]
    assert index.search_phrase(p3) == brute(p3)
    # tiny vocab => 2-grams repeat across docs; make sure the check bites
    assert len(brute(p2)) >= 1
    # an impossible phrase (absent term) matches nothing
    assert index.search_phrase([10_000_019, 3]) == []
    # single-term phrase degenerates to the term's doc set
    assert index.search_phrase([p2[0]]) == sorted(
        set(d for d in state["doc_id"]
            if p2[0] in np.asarray(
                state.set_index("doc_id").loc[d, "tokens"], dtype=np.int64)))
