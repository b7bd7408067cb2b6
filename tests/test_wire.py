"""Debezium-JSON wire-format adapter: encode → decode roundtrip,
transaction-topic handling, snapshot ops, socket feed, lake apply."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest

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
    missing transaction block → each envelope is a SINGLETON
    transaction keyed by its coordinate (the GTID-string composite
    here), so the watermark closes immediately."""
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
    # gtid fallback: per-tx number << 20 | (total_order-1 → 0)
    assert t.column("gtid").to_pylist() == [i << 20 for i in range(5)]
    # no transaction metadata → singleton transactions, coordinate-keyed
    assert t.column("tx_events").to_pylist() == [1] * 5
    assert t.column("tx_id").to_pylist() == [i << 20 for i in range(5)]
    assert t.column("seq_in_tx").to_pylist() == [0] * 5


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


def test_real_world_debezium_shapes(tmp_path):
    """Shapes a real connector emits that our own encoder never
    produces: uuid:txno transaction ids, truncate/message/tombstone
    records, updates with a null before image (reduced replica
    identity), and per-row coordinate choice in a batch mixing
    pos-bearing and pos-less envelopes."""
    def env(i, op="c", before=None, after=None, tx=None, pos=None,
            gtid=None):
        src = {"name": "s", "db": "rook", "table": "sequences",
               "server_id": 1, "file": "mysql-bin.000003"}
        if pos is not None:
            src["pos"] = pos
        if gtid is not None:
            src["gtid"] = gtid
        return {"payload": {"before": before, "after": after,
                            "source": src, "op": op,
                            "transaction": tx}}

    pl = lambda d: {"doc_id": d, "tokens": [1], "n_tok": 1, "source": "x"}
    rows = [
        # uuid-form transaction id
        env(0, "c", after=pl("a"), pos=100,
            tx={"id": "3c1a6f2b-aaaa:17", "total_order": 1,
                "data_collection_order": 1}),
        # truncate + message records must be dropped
        {"payload": {"before": None, "after": None,
                     "source": {"db": "rook", "table": "sequences",
                                "server_id": 1, "pos": 110,
                                "file": "mysql-bin.000003"},
                     "op": "t", "transaction": None}},
        # update with null before (REPLICA IDENTITY NOTHING) keys by
        # the after image
        env(2, "u", before=None, after=pl("b"), pos=120,
            tx={"id": "19", "total_order": 1,
                "data_collection_order": 1}),
        # pos-less row in the same batch: per-row GTID-string fallback
        env(3, "c", after=pl("c"), gtid="srv:21",
            tx={"id": "21", "total_order": 1,
                "data_collection_order": 1}),
    ]
    t = wire.decode_envelopes(
        wire._json_table(("\n".join(json.dumps(r) for r in rows))
                         .encode()), payload=SEQ_SCHEMA)
    assert t.num_rows == 3  # truncate dropped
    assert t.column("tx_id").to_pylist() == [17, 19, 21]
    assert t.column("key").to_pylist() == ["a", "b", "c"]
    g = t.column("gtid").to_pylist()
    assert g[0] == (3 << 40) | 100      # binlog coordinates
    assert g[1] == (3 << 40) | 120
    assert g[2] == 21 << 20             # per-row fallback composite

    # counting pass without a transaction topic handles envelopes with
    # NO transaction block at all (metadata disabled)
    p = tmp_path / "plain.jsonl"
    plain = [env(i, "c", after=pl(f"p{i}"), pos=200 + i,
                 gtid=f"srv:{30 + i // 2}") for i in range(4)]
    for r in plain:
        del r["payload"]["transaction"]
    p.write_text("\n".join(json.dumps(r) for r in plain) + "\n")
    ds = wire.read_debezium([str(p)], tx_topic=None, payload=SEQ_SCHEMA)
    got = pa.Table.from_pylist(ds.take_all()).sort_by("gtid")
    # metadata disabled → singleton transactions keyed by the binlog
    # coordinate (grouping by the GTID-string txno would report
    # 2-event txs whose seqs are all 0 — unclosable)
    assert got.column("tx_id").to_pylist() \
        == [(3 << 40) | (200 + i) for i in range(4)]
    assert got.column("tx_events").to_pylist() == [1, 1, 1, 1]


def test_no_ordering_coordinates_raises():
    rows = [{"payload": {"before": None,
                         "after": {"doc_id": "d", "tokens": [1],
                                   "n_tok": 1, "source": "x"},
                         "source": {"db": "rook", "table": "sequences",
                                    "server_id": 1},
                         "op": "c", "transaction": None}}]
    import pytest
    with pytest.raises(ValueError, match="ordering coordinates"):
        wire.decode_envelopes(
            wire._json_table(json.dumps(rows[0]).encode()),
            payload=SEQ_SCHEMA)


def test_metadata_disabled_multirow_tx_closes(tmp_path, ray_session):
    """Debezium's DEFAULT config ships NO transaction block
    (payload.transaction is null).  Grouping such rows by the GTID
    string's txno would report multi-row transactions whose seqs are
    all 0 — the completeness test never passes and the watermark pins
    below the first multi-row tx forever.  Each envelope must decode
    as a singleton transaction keyed by its binlog coordinate."""
    from rookray.txn import closed_watermark_table

    def env(i, txno, pos):
        return json.dumps({"payload": {
            "before": None,
            "after": {"doc_id": f"d{i}", "tokens": [i], "n_tok": 1,
                      "source": "s"},
            "source": {"name": "s", "db": "rook", "table": "sequences",
                       "server_id": 1, "file": "b.000001", "pos": pos,
                       "gtid": f"s:{txno}"},
            "op": "c", "transaction": None}})

    # txno 7 spans three envelopes (a real multi-row transaction)
    lines = [env(0, 7, 100), env(1, 7, 140), env(2, 7, 210),
             env(3, 8, 300)]
    p = tmp_path / "nometa.jsonl"
    p.write_text("\n".join(lines) + "\n")
    ds = wire.read_debezium([str(p)], tx_topic=None, payload=SEQ_SCHEMA)
    t = pa.Table.from_pylist(ds.take_all()).sort_by("gtid")
    assert t.column("tx_events").to_pylist() == [1] * 4
    assert t.column("seq_in_tx").to_pylist() == [0] * 4
    # identity = the per-row coordinate → all four are distinct txs
    assert len(set(t.column("tx_id").to_pylist())) == 4
    t2 = pa.Table.from_pylist(
        t.to_pylist(), schema=change_event_schema(SEQ_SCHEMA))
    wm, mx = closed_watermark_table(t2)
    assert wm == mx == (1 << 40) | 300


def test_metadata_disabled_without_positions_refuses(tmp_path,
                                                     ray_session):
    """No transaction block AND no binlog positions: rows of one
    multi-row transaction are indistinguishable (identical txno<<20
    coordinates) — the counting pass must refuse loudly instead of
    decoding an arbitrary LWW order."""
    def env(i, txno):
        return json.dumps({"payload": {
            "before": None,
            "after": {"doc_id": f"d{i}", "tokens": [i], "n_tok": 1,
                      "source": "s"},
            "source": {"name": "s", "db": "rook", "table": "sequences",
                       "server_id": 1, "gtid": f"s:{txno}"},
            "op": "c"}})

    lines = [env(0, 7), env(1, 7), env(2, 8)]
    p = tmp_path / "loose.jsonl"
    p.write_text("\n".join(lines) + "\n")
    import pytest as _pytest
    with _pytest.raises(Exception, match="neither[\\s\\S]*transaction"):
        wire.read_debezium([str(p)], tx_topic=None,
                           payload=SEQ_SCHEMA).materialize()


def _stmt_env(i: int, row: int, pos: int) -> str:
    """Metadata-disabled envelope: one row of a multi-row statement
    (shared binlog position, distinct source.row)."""
    return json.dumps({"payload": {
        "before": None,
        "after": {"doc_id": f"d{i}", "tokens": [i], "n_tok": 1,
                  "source": "s"},
        "source": {"name": "s", "db": "rook", "table": "sequences",
                   "server_id": 1, "file": "bin.000001", "pos": pos,
                   "row": row, "gtid": None},
        "op": "c", "transaction": None}})


def test_multirow_statement_without_metadata_closes(tmp_path):
    """Real Debezium output for `UPDATE ... WHERE k IN (1,2)` with
    transaction metadata disabled: both envelopes share source.pos and
    differ only in source.row.  The counting pass must resolve the
    statement's row count (identity = the shared coordinate, seq =
    row) so the watermark closes past it — the collision used to
    decode as two seq-0 'singletons' under one tx_id and pin the
    watermark below the statement forever."""
    from rookray.txn import closed_watermark_table

    lines = [_stmt_env(0, 0, 100), _stmt_env(1, 1, 100),
             _stmt_env(2, 0, 200)]
    p = tmp_path / "stmt.jsonl"
    p.write_text("\n".join(lines) + "\n")
    ds = wire.read_debezium([str(p)], tx_topic=None, payload=SEQ_SCHEMA)
    t = pa.Table.from_pylist(
        ds.take_all(), schema=change_event_schema(SEQ_SCHEMA)
    ).sort_by("gtid")
    assert t.column("tx_events").to_pylist() == [2, 2, 1]
    assert sorted(t.column("seq_in_tx").to_pylist()[:2]) == [0, 1]
    wm, max_gtid = closed_watermark_table(t)
    assert wm == max_gtid == (1 << 40) | 200


def test_multirow_statement_without_count_refuses(tmp_path):
    """The same shape decoded WITHOUT a resolving index (a live feed,
    or a tx-topic index that doesn't know coordinate-keyed statements)
    must refuse loudly: a row>0 envelope claiming to be a singleton
    would silently wedge the watermark."""
    lines = [_stmt_env(0, 0, 100), _stmt_env(1, 1, 100)]
    tbl = wire._json_table(("\n".join(lines) + "\n").encode())
    with pytest.raises(ValueError, match="source.row > 0"):
        wire.decode_envelopes(tbl, payload=SEQ_SCHEMA)
    with pytest.raises(ValueError, match="source.row > 0"):
        wire.decode_envelopes(
            tbl, payload=SEQ_SCHEMA,
            tx_index=(np.asarray([7], np.int64),
                      np.asarray([3], np.int64)))
