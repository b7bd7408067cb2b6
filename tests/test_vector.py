"""Distributed vector index — incremental maintenance + search.

The index must equal a from-scratch re-embed of the lake state at
every refresh while reading only the changefeed after its first build
(the purge-then-index upsert of the reference's derived-store targets,
`DefaultRowsMutationIndexer.java:64-88`, restated for embeddings), and
``probe="all"`` search must equal exact brute force over the state.
"""

import json
import os

import numpy as np
import pandas as pd

from rookray.gen import GenConfig, write_shards
from rookray.pipeline import CDCConfig, LakeTable
from rookray.targets.vector import (VectorIndex, cells_of, embed_tokens,
                                    plane_matrix)

import pyarrow as pa


def _expected(lake) -> pd.DataFrame:
    """From-scratch (cell, doc_id, vec) recompute over the state."""
    state = lake.state_table()
    vecs = embed_tokens(state.column("tokens"))
    cells = cells_of(vecs)
    return (pd.DataFrame({"cell": cells,
                          "doc_id": state.column("doc_id").to_pylist(),
                          "vec": [list(v) for v in vecs]})
            .sort_values(["cell", "doc_id"], kind="mergesort")
            .reset_index(drop=True))


def _got(index) -> pd.DataFrame:
    df = index.read().to_pandas()
    df["vec"] = df["vec"].map(lambda v: np.asarray(v).tolist())
    return (df.sort_values(["cell", "doc_id"], kind="mergesort")
            .reset_index(drop=True))


def _brute_force(lake, query_tokens, k=10) -> pd.DataFrame:
    state = lake.state_table()
    vecs = embed_tokens(state.column("tokens"))
    q = embed_tokens(pa.array([list(query_tokens)],
                              type=pa.list_(pa.int32())))[0]
    df = (pd.DataFrame({"doc_id": state.column("doc_id").to_pylist(),
                        "score": vecs @ q})
          .sort_values(["score", "doc_id"], ascending=[False, True],
                       kind="mergesort")
          .head(k).reset_index(drop=True))
    df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
    return df


def test_vector_incremental_equals_rebuild(tmp_path):
    cfg = GenConfig(n_docs=60, n_events=1200, vocab=60)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=6)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=4))
    index = VectorIndex(lake, num_partitions=8)

    lake.apply(meta["files"][:2])
    assert index.refresh()["refreshed"]
    pd.testing.assert_frame_equal(_got(index), _expected(lake))

    # subsequent refreshes may ONLY touch the changefeed
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

    # the cells genuinely spread (LSH isn't degenerate on the fixture)
    assert expect["cell"].nunique() > 4

    # a freshly built index over the same head is identical
    fresh = VectorIndex(lake, name="vec2", num_partitions=8)
    fresh.refresh()
    pd.testing.assert_frame_equal(_got(fresh), expect)
    assert index.manifest()["rows"] == len(expect)


def test_vector_search_exhaustive_and_multiprobe(tmp_path):
    cfg = GenConfig(n_docs=80, n_events=1600, vocab=50)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=4)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=4))
    lake.apply(meta["files"])
    index = VectorIndex(lake, num_partitions=8)
    index.refresh()

    q = [3, 7, 7, 11, 19, 23]
    exact = _brute_force(lake, q, k=10)
    got = index.search(q, k=10, probe="all")
    pd.testing.assert_frame_equal(got, exact)

    # multiprobe: every result must come from a probed cell, scores
    # exact, and results are exactly brute force restricted to the
    # probed candidate set
    cells = set(index.probe_cells(q, probe="hamming1"))
    assert len(cells) == index.n_planes + 1
    state = lake.state_table()
    vecs = embed_tokens(state.column("tokens"))
    doc_cell = dict(zip(state.column("doc_id").to_pylist(),
                        cells_of(vecs)))
    got_h1 = index.search(q, k=10, probe="hamming1")
    assert all(doc_cell[d] in cells for d in got_h1["doc_id"])
    qv = embed_tokens(pa.array([q], type=pa.list_(pa.int32())))[0]
    allscores = dict(zip(state.column("doc_id").to_pylist(), vecs @ qv))
    cand = sorted((d for d, c in doc_cell.items() if c in cells))
    ref = (pd.DataFrame({"doc_id": cand,
                         "score": [allscores[d] for d in cand]})
           .sort_values(["score", "doc_id"], ascending=[False, True],
                        kind="mergesort").head(10).reset_index(drop=True))
    ref["rank"] = np.arange(1, len(ref) + 1, dtype=np.int64)
    pd.testing.assert_frame_equal(got_h1, ref)

    # single-cell probe is a subset of the hamming1 candidates
    got_c = index.search(q, k=10, probe="cell")
    assert set(got_c["doc_id"]) <= set(cand)


def test_vector_crash_resume_noop_and_purge(tmp_path):
    cfg = GenConfig(n_docs=30, n_events=600, vocab=40)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=4)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=2))
    index = VectorIndex(lake, num_partitions=4)

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

    # crash between partition writes and the manifest swap: roll the
    # manifest back — re-refresh converges byte-identically
    with open(os.path.join(index.root, "vec.json"), "w") as f:
        f.write(manifest_after_first)
    assert index.refresh()["refreshed"]
    pd.testing.assert_frame_equal(_got(index), expect)

    # GDPR follow-through: victims leave every index file physically
    victims = expect["doc_id"].head(3).tolist()
    r = index.purge_docs(victims)
    assert r["purged_rows"] == 3
    left = _got(index)
    assert not set(victims) & set(left["doc_id"])
    pd.testing.assert_frame_equal(
        left, expect[~expect["doc_id"].isin(victims)]
        .reset_index(drop=True))
    for name in os.listdir(index.root):
        if name.endswith(".parquet"):
            t = pd.read_parquet(os.path.join(index.root, name))
            assert not set(victims) & set(t["doc_id"])
    # post-purge incremental refresh still works (no resurrect)
    assert not index.refresh()["refreshed"]


def test_embed_and_cells_determinism_and_empty():
    toks = pa.array([[1, 2, 2, 3], [], None, [7]],
                    type=pa.list_(pa.int32()))
    v = embed_tokens(toks)
    assert v.shape == (4, 16)
    assert (v[1] == 0).all() and (v[2] == 0).all()
    # multiplicity counts: token 2 contributes twice
    v1 = embed_tokens(pa.array([[1, 2, 3]], type=pa.list_(pa.int32())))[0]
    assert np.abs(v[0] - v1).sum() == 1
    c = cells_of(v)
    # zero vector: all dots are 0 >= 0 → all bits set
    assert c[1] == (1 << plane_matrix().shape[0]) - 1
    assert (cells_of(embed_tokens(toks)) == c).all()


def test_purge_via_mismatched_instance_keeps_geometry(tmp_path):
    """purge_docs through a differently-constructed instance must
    carry the COMMITTED manifest's geometry (num_partitions / dim /
    n_planes), never the instance's — otherwise the next refresh
    routes retractions to wrong partitions (silent stale rows)."""
    cfg = GenConfig(n_docs=30, n_events=600, vocab=40)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=4)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=2))
    lake.apply(meta["files"][:2])
    VectorIndex(lake, num_partitions=8).refresh()
    lake2 = LakeTable(str(tmp_path / "lake"))

    # a second process constructs with DIFFERENT parameters
    other = VectorIndex(lake2, num_partitions=4)
    victims = VectorIndex(lake2, num_partitions=8).read() \
        .column("doc_id").to_pylist()[:2]
    other.purge_docs(victims)
    m = other.manifest()
    assert int(m["num_partitions"]) == 8  # committed geometry survives
    # and the mismatch guard still fires on the next refresh attempt
    lake.apply(meta["files"][1:])
    import pytest as _pytest
    with _pytest.raises(ValueError, match="different parameters"):
        other.refresh()
    # while a correctly-constructed instance refreshes cleanly and the
    # incremental result over the UNCHANGED geometry equals a rebuild
    # (purge doesn't fence future events — replayed victims re-create,
    # exactly like LakeTable.purge)
    good = VectorIndex(lake, num_partitions=8)
    assert good.refresh()["refreshed"]
    pd.testing.assert_frame_equal(_got(good), _expected(lake))


def test_vacuum_reclaims_prior_generations(tmp_path):
    """After several refreshes, rewritten partitions leave prior
    generations on disk (reads are manifest-driven, so they're
    invisible); vacuum() reclaims exactly those, and the index state
    is byte-identical before/after."""
    import glob

    cfg = GenConfig(n_docs=40, n_events=800, vocab=40)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=4)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=2))
    index = VectorIndex(lake, num_partitions=4)
    lake.apply(meta["files"][:2])
    index.refresh()
    lake.apply(meta["files"][1:])
    index.refresh()

    before = _got(index)
    n_files = len(glob.glob(os.path.join(index.root, "*.parquet")))
    n_ref = len(index.manifest()["files"])
    assert n_files > n_ref  # prior generations really leaked
    swept = index.vacuum()
    assert swept == n_files - n_ref
    assert len(glob.glob(os.path.join(index.root, "*.parquet"))) == n_ref
    pd.testing.assert_frame_equal(_got(index), before)
    assert index.vacuum() == 0  # idempotent
