"""Stream-table lookup join: enrichment against a pinned lake snapshot
must equal a pandas left-join of the same events × state, compose with
the UNBOUNDED stream source, bound its per-actor cache, and stay
consistent while newer epochs commit."""

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from rookray.enrich import StreamEnricher, enrich_stream
from rookray.events import NormalizeConfig, Normalizer, unified_payload
from rookray.gen import GenConfig, write_shards
from rookray.pipeline import CDCConfig, LakeTable


@pytest.fixture()
def lake_and_tail(tmp_path):
    cfg = GenConfig(n_docs=60, n_events=1200)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=6)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=4))
    lake.apply(meta["files"][:3])
    payload = unified_payload([pq.read_schema(f) for f in meta["files"]])
    ncfg = NormalizeConfig(payload=payload)
    tail = (ray.data.read_parquet(meta["files"][3:])
            .map_batches(Normalizer(ncfg), batch_format="pyarrow",
                         zero_copy_batch=True))
    return lake, tail, meta


def _expected(lake, tail_df):
    state = (lake.state_table().to_pandas()
             [["doc_id", "n_tok"]].rename(columns={"n_tok": "n_tok_state"}))
    return tail_df.merge(state, on="doc_id", how="left")


def test_enrich_matches_pandas_join(lake_and_tail):
    lake, tail, _ = lake_and_tail
    got = pd.DataFrame(
        enrich_stream(tail, lake, columns=("n_tok", "source"))
        .select_columns(["gtid", "doc_id", "n_tok_state", "source_state"])
        .take_all()).sort_values("gtid").reset_index(drop=True)
    tail_df = (tail.select_columns(["gtid", "doc_id"]).to_pandas()
               .sort_values("gtid").reset_index(drop=True))
    exp = _expected(lake, tail_df)
    assert got["gtid"].tolist() == exp["gtid"].tolist()
    pd.testing.assert_series_equal(
        got["n_tok_state"].astype("float64"),
        exp["n_tok_state"].astype("float64"), check_names=False)
    # string column: nulls where the key is absent from the snapshot
    miss = exp["n_tok_state"].isna()
    assert got.loc[miss, "source_state"].isna().all()
    assert got.loc[~miss, "source_state"].notna().all()
    # non-vacuous: the tail must reference both known and unknown keys
    assert 0 < int(miss.sum()) < len(exp)


def test_enrich_pins_snapshot_across_commits(lake_and_tail):
    lake, tail, meta = lake_and_tail
    pipeline = enrich_stream(tail, lake, columns=("n_tok",))
    # commit a newer epoch AFTER pipeline construction: results must
    # still reflect the pinned epoch-0 snapshot
    before = lake.state_table().to_pandas()[["doc_id", "n_tok"]]
    lake.apply(meta["files"][2:])
    got = pd.DataFrame(
        pipeline.select_columns(["gtid", "doc_id", "n_tok_state"])
        .take_all()).sort_values("gtid").reset_index(drop=True)
    tail_df = (tail.select_columns(["gtid", "doc_id"]).to_pandas()
               .sort_values("gtid").reset_index(drop=True))
    exp = tail_df.merge(
        before.rename(columns={"n_tok": "n_tok_state"}),
        on="doc_id", how="left")
    pd.testing.assert_series_equal(
        got["n_tok_state"].astype("float64"),
        exp["n_tok_state"].astype("float64"), check_names=False)


def test_enricher_lru_bound_and_local_call(lake_and_tail):
    lake, tail, _ = lake_and_tail
    m = lake.manifest()
    enr = StreamEnricher(
        root=lake.root, frags=lake._partition_fragments(m),
        num_partitions=int(m["num_partitions"]),
        columns=("n_tok",), types={"n_tok": pa.int32()},
        max_cached_partitions=1)
    batches = list(tail.iter_batches(batch_format="pyarrow",
                                     batch_size=64))
    outs = [enr(b) for b in batches]
    assert len(enr._cache) <= 1      # LRU bound holds
    got = pa.concat_tables(
        [o.select(["gtid", "doc_id", "n_tok_state"]) for o in outs],
        promote_options="default").to_pandas()
    exp = _expected(
        lake, got[["gtid", "doc_id"]].copy())
    pd.testing.assert_series_equal(
        got["n_tok_state"].astype("float64"),
        exp["n_tok_state"].astype("float64"), check_names=False)


def test_enrich_composes_with_unbounded_stream(tmp_path):
    from rookray.source import stream_events
    cfg = GenConfig(n_docs=30, n_events=600)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=4)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=2))
    lake.apply(meta["files"][:2])
    # live dir: tail shards appear, then the EOF sentinel
    live = tmp_path / "live"
    live.mkdir()
    for f in meta["files"][2:]:
        shutil.copy(f, live / os.path.basename(f))
    (live / "_STREAM_EOF").touch()
    payload = unified_payload([pq.read_schema(f) for f in meta["files"]])
    ncfg = NormalizeConfig(payload=payload)
    stream = (stream_events(str(live), parallelism=2, idle_timeout_s=10)
              .map_batches(Normalizer(ncfg), batch_format="pyarrow",
                           zero_copy_batch=True))
    got = pd.DataFrame(
        enrich_stream(stream, lake, columns=("n_tok",))
        .select_columns(["gtid", "doc_id", "n_tok_state"]).take_all())
    assert len(got) > 0
    state = lake.state_table().to_pandas().set_index("doc_id")["n_tok"]
    exp = got["doc_id"].map(state)
    pd.testing.assert_series_equal(
        got["n_tok_state"].astype("float64"),
        exp.astype("float64"), check_names=False)


def test_enrich_rejects_unknown_column(lake_and_tail):
    lake, tail, _ = lake_and_tail
    with pytest.raises(ValueError, match="not in the committed"):
        enrich_stream(tail, lake, columns=("nope",))
