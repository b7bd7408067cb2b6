"""Debezium-JSON wire-format adapter: encode → decode roundtrip,
transaction-topic handling, snapshot ops, socket feed, lake apply."""

import json
import os

import numpy as np
import pyarrow as pa

import ray.data

from rookray import wire
from rookray.gen import GenConfig, generate_events, final_state
from rookray.schema import (OP_INSERT, SEQ_SCHEMA, SEQ_SCHEMA_V2,
                            change_event_schema)

CFG = GenConfig(n_docs=40, n_events=240, evolve_at=121)


def _payload_of(ev: pa.Table) -> pa.Schema:
    return pa.schema(list(ev.schema.field("after").type))


def test_roundtrip_exact(tmp_path):
    ev = generate_events(CFG)
    d = wire.debezium_dump(ev, str(tmp_path / "dump"), n_files=3)
    assert d["events"] == ev.num_rows
    ds = wire.read_debezium(d["data_files"], tx_topic=[d["tx_file"]],
                            payload=_payload_of(ev))
    got = pa.Table.from_pylist(
        ds.take_all(), schema=change_event_schema(_payload_of(ev))
    ).sort_by("gtid")
    orig = ev.sort_by("gtid")
    # gtid decodes as binlog coordinates: (file_seq=1) << 40 | pos
    assert np.array_equal(np.asarray(got.column("gtid")),
                          (1 << 40) | np.asarray(orig.column("gtid")))
    for c in ["tx_id", "seq_in_tx", "tx_events", "server_id", "db",
              "table", "op", "key", "before", "after"]:
        assert got.column(c).to_pylist() == orig.column(c).to_pylist(), c


def test_tx_counts_recovered_without_topic(tmp_path):
    ev = generate_events(CFG)
    d = wire.debezium_dump(ev, str(tmp_path / "dump"), n_files=2)
    ds = wire.read_debezium(d["data_files"], tx_topic=None,
                            payload=_payload_of(ev))
    got = pa.Table.from_pylist(ds.take_all()).sort_by("gtid")
    assert (got.column("tx_events").to_pylist()
            == ev.sort_by("gtid").column("tx_events").to_pylist())


def test_snapshot_read_op_and_missing_fields(tmp_path):
    """'r' (snapshot read) decodes as INSERT; envelopes whose payload
    never mentions an evolved column still decode to the typed schema;
    missing transaction block falls back to the GTID-string composite."""
    lines = [json.dumps({"payload": {
        "before": None,
        "after": {"doc_id": f"d{i}", "tokens": [i, i + 1], "n_tok": 2,
                  "source": "snap"},
        "source": {"name": "s", "db": "rook", "table": "sequences",
                   "server_id": 1, "gtid": f"s:{i}"},
        "op": "r"}}) for i in range(5)]
    p = tmp_path / "snap.jsonl"
    p.write_text("\n".join(lines) + "\n")
    t = wire.decode_envelopes(wire._json_table(p.read_bytes()),
                              payload=SEQ_SCHEMA_V2)
    assert t.schema.equals(change_event_schema(SEQ_SCHEMA_V2))
    assert t.column("op").to_pylist() == [OP_INSERT] * 5
    assert t.column("key").to_pylist() == [f"d{i}" for i in range(5)]
    assert t.column("after").combine_chunks().field("lang").null_count == 5
    # gtid fallback: per-tx number << 16 | (total_order-1 → 0)
    assert t.column("gtid").to_pylist() == [i << 16 for i in range(5)]
    assert t.column("tx_events").to_pylist() == [-1] * 5


def test_decode_empty_batch():
    t = wire.decode_envelopes(
        pa.table({"payload": pa.array([], pa.struct([("op", pa.string())]))}),
        payload=SEQ_SCHEMA)
    assert t.num_rows == 0
    assert t.schema.equals(change_event_schema(SEQ_SCHEMA))


def test_socket_feed_applies_to_lake(tmp_path):
    """Live-feed plumbing: a Debezium socket producer pushing raw
    JSON-lines frames drives the full lake apply to the same final
    state as the serial generator oracle."""
    from rookray.pipeline import CDCConfig, LakeTable

    ev = generate_events(CFG)
    d = wire.debezium_dump(ev, str(tmp_path / "dump"), n_files=4)
    tx_index = wire.parse_tx_topic([d["tx_file"]])

    srv = wire.DebeziumStreamServer()
    ds = wire.stream_debezium_socket(srv.host, srv.port, tx_index,
                                     payload=_payload_of(ev))
    for f in d["data_files"]:
        srv.push_file(f)
    srv.close()

    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(
        num_partitions=4,
        ignored_tables=frozenset({"ignored_entity"}),
        ignored_server_ids=frozenset({999})))
    lake.apply(ds.materialize())
    state = lake.state_table().sort_by("doc_id")
    exp = final_state(CFG).sort_by("doc_id")
    assert state.column("doc_id").to_pylist() == exp.column("doc_id").to_pylist()
    assert state.column("tokens").to_pylist() == exp.column("tokens").to_pylist()
