"""Property-based fuzz of the flagship invariant: for ANY stream
shape (seed, doc universe, skew, noise, mid-stream schema evolution)
applied across ANY epoch split (with the mandatory boundary-shard
re-present), the lake state is byte-identical to the serial replay
oracle.  The deterministic suites pin chosen corners; this pins the
space between them."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rookray.gen import GenConfig, final_state, write_shards
from rookray.pipeline import CDCConfig, LakeTable

from tests.test_gen_oracle import assert_tables_equal


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    seed=st.integers(0, 2**31 - 1),
    n_docs=st.integers(3, 60),
    n_events=st.integers(40, 600),
    n_shards=st.integers(1, 6),
    noise_pct=st.sampled_from([0, 15]),
    zipf=st.sampled_from([0.0, 1.4]),
    evolve=st.booleans(),
    partitions=st.sampled_from([1, 3, 8]),
    cut=st.floats(0.0, 1.0),
)
def test_any_stream_any_split_replays_exactly(
        tmp_path_factory, seed, n_docs, n_events, n_shards, noise_pct,
        zipf, evolve, partitions, cut):
    tmp = tmp_path_factory.mktemp("prop")
    cfg = GenConfig(seed=seed, n_docs=n_docs, n_events=n_events,
                    noise_pct=noise_pct, zipf_a=zipf,
                    evolve_at=(n_events // 2 + 1) if evolve else None)
    meta = write_shards(cfg, str(tmp / "s"), n_shards=n_shards)
    files = meta["files"]
    lake = LakeTable(str(tmp / "lake"), CDCConfig(
        num_partitions=partitions,
        ignored_tables=frozenset({"ignored_entity"}),
        ignored_server_ids=frozenset({999})))
    k = max(1, min(len(files) - 1, int(round(cut * len(files))))) \
        if len(files) > 1 else 1
    lake.apply(files[:k])
    if k < len(files):
        # re-present the boundary shard: a tx cut at the epoch edge
        # only closes when both halves are in one epoch
        lake.apply(files[k - 1:])
    assert_tables_equal(lake.state_table(), final_state(cfg))
