"""The actor-shard merge strategy must be byte-equivalent to the
sort-based groupby strategy and to the serial oracle."""

from rookray.gen import GenConfig, final_state, write_shards
from rookray.pipeline import CDCConfig, LakeTable

from tests.test_gen_oracle import assert_tables_equal


def test_strategies_equivalent(tmp_path):
    cfg = GenConfig(n_docs=200, n_events=3000, zipf_a=1.3, noise_pct=10)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=6)
    common = dict(
        num_partitions=8,
        ignored_tables=frozenset({"ignored_entity"}),
        ignored_server_ids=frozenset({999}),
    )
    actors = LakeTable(str(tmp_path / "a"),
                       CDCConfig(merge_strategy="actors", **common))
    grouped = LakeTable(str(tmp_path / "g"),
                        CDCConfig(merge_strategy="groupby", **common))
    actors.apply(meta["files"])
    grouped.apply(meta["files"])
    assert_tables_equal(actors.state_table(), grouped.state_table())
    assert_tables_equal(actors.state_table(), final_state(cfg))
    # lineage parity: same watermarks per partition
    wa = {p: v["gtid_watermark"] for p, v in actors.manifest()["partitions"].items()}
    wg = {p: v["gtid_watermark"] for p, v in grouped.manifest()["partitions"].items()}
    assert wa == wg


def test_actor_strategy_incremental_resume(tmp_path):
    cfg = GenConfig(n_docs=60, n_events=900)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=6)
    lake = LakeTable(str(tmp_path / "lake"),
                     CDCConfig(num_partitions=8, merge_strategy="actors"))
    lake.apply(meta["files"][:3])
    lake.apply(meta["files"][2:])
    lake.apply(meta["files"])  # duplicate full replay → no-op
    assert_tables_equal(lake.state_table(), final_state(cfg))


def test_actor_buffer_premerge(tmp_path):
    """Tiny pre-merge threshold: buffers collapse mid-epoch and the
    result is still exact."""
    cfg = GenConfig(n_docs=20, n_events=2000, zipf_a=1.5)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=4)
    lake = LakeTable(str(tmp_path / "lake"),
                     CDCConfig(num_partitions=4, merge_strategy="actors",
                               actor_buffer_rows=50))
    lake.apply(meta["files"])
    assert_tables_equal(lake.state_table(), final_state(cfg))
