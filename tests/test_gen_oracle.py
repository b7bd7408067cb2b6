"""Generator + oracle self-consistency: the closed-form final_state()
must equal serial dict replay (rook-equivalent semantics), including
under noise filtering and schema evolution."""

import pyarrow as pa
import pytest

from rookray.gen import GenConfig, generate_events, final_state, write_shards
from rookray.oracle import replay
from rookray.schema import OP_INSERT, OP_UPDATE, OP_DELETE


def assert_tables_equal(a: pa.Table, b: pa.Table):
    assert a.column_names == b.column_names, (a.column_names, b.column_names)
    assert len(a) == len(b)
    a = a.sort_by("doc_id")
    b = b.sort_by("doc_id")
    for name in a.column_names:
        av, bv = a.column(name).to_pylist(), b.column(name).to_pylist()
        assert av == bv, f"column {name} differs (first diff at " \
            f"{next(i for i,(x,y) in enumerate(zip(av,bv)) if x!=y)})"


def test_events_shape():
    cfg = GenConfig(n_docs=50, n_events=500)
    tbl = generate_events(cfg)
    assert len(tbl) == 500
    assert tbl.column("gtid").to_pylist() == list(range(1, 501))
    ops = set(tbl.column("op").to_pylist())
    assert ops == {OP_INSERT, OP_UPDATE, OP_DELETE}
    # inserts have after, no before; deletes the reverse; updates both
    for row in tbl.to_pylist()[:200]:
        if row["op"] == OP_INSERT:
            assert row["after"] is not None and row["before"] is None
        elif row["op"] == OP_DELETE:
            assert row["before"] is not None and row["after"] is None
        else:
            assert row["before"] is not None and row["after"] is not None
            assert row["before"]["doc_id"] == row["after"]["doc_id"]
        if row["after"]:
            assert row["after"]["n_tok"] == len(row["after"]["tokens"])


def test_first_event_per_doc_is_insert():
    cfg = GenConfig(n_docs=20, n_events=300)
    tbl = generate_events(cfg)
    seen = set()
    alive = set()
    for row in tbl.to_pylist():
        key = (row["after"] or row["before"])["doc_id"]
        if key not in seen:
            assert row["op"] == OP_INSERT
            seen.add(key)
        if row["op"] == OP_DELETE:
            assert key in alive, "delete of dead key"
            alive.discard(key)
        else:
            if row["op"] == OP_UPDATE:
                assert key in alive, "update of dead key"
            alive.add(key)


def test_final_state_matches_serial_replay():
    cfg = GenConfig(n_docs=40, n_events=600)
    expect = replay(generate_events(cfg))
    got = final_state(cfg)
    assert_tables_equal(got, expect)


def test_final_state_with_noise_and_filtering():
    cfg = GenConfig(n_docs=40, n_events=600, noise_pct=20)
    tbl = generate_events(cfg)
    tables = set(tbl.column("table").to_pylist())
    assert tables == {"sequences", "ignored_entity"}
    servers = set(tbl.column("server_id").to_pylist())
    assert servers == {1, 999}
    expect = replay(tbl, ignored_tables={"ignored_entity"}, ignored_server_ids={999})
    got = final_state(cfg)
    assert_tables_equal(got, expect)


def test_schema_evolution_stream():
    cfg = GenConfig(n_docs=30, n_events=400, evolve_at=201)
    tbl = generate_events(cfg)
    assert "lang" in [f.name for f in tbl.column("after").type]
    for row in tbl.to_pylist():
        img = row["after"] or row["before"]
        if row["gtid"] < 201 and row["after"] is not None:
            assert row["after"]["lang"] is None
    expect = replay(tbl)
    got = final_state(cfg)
    assert_tables_equal(got, expect)


def test_write_shards_roundtrip(tmp_path):
    import pyarrow.parquet as pq
    import pyarrow.dataset as pads

    cfg = GenConfig(n_docs=30, n_events=400, evolve_at=201)
    meta = write_shards(cfg, str(tmp_path), n_shards=4)
    assert meta["n_events"] == 400
    # pre-evolution shard lacks lang; post has it
    first = pq.read_table(meta["files"][0])
    last = pq.read_table(meta["files"][-1])
    assert "lang" not in [f.name for f in first.column("after").type]
    assert "lang" in [f.name for f in last.column("after").type]
    # unified read sees all rows
    ds = pads.dataset(meta["files"])
    assert ds.count_rows() == 400


def test_zipf_skew():
    cfg = GenConfig(n_docs=1000, n_events=5000, zipf_a=1.3)
    tbl = generate_events(cfg)
    import collections
    keys = collections.Counter(
        (r["after"] or r["before"])["doc_id"] for r in tbl.to_pylist()
    )
    top = keys.most_common(1)[0][1]
    assert top > 5000 // 20, "expected a hot key under zipf"
    # oracle still consistent
    assert_tables_equal(final_state(cfg), replay(tbl))


def test_determinism():
    cfg = GenConfig(n_docs=25, n_events=300)
    assert generate_events(cfg).equals(generate_events(cfg))
    assert final_state(cfg).equals(final_state(cfg))
