"""MongoDB change-stream wire adapter: encode → decode roundtrips,
real-world event shapes, strict-mode guards, coordinate fallbacks,
socket feed, lake apply, CLI checkpoint resume."""

import json

import numpy as np
import pyarrow as pa
import pytest

from rookray import wiremongo as WM
from rookray.gen import GenConfig, generate_events, final_state
from rookray.schema import (OP_DELETE, OP_INSERT, OP_UPDATE, SEQ_SCHEMA,
                            change_event_schema)
from rookray.wire import _json_table

CFG = GenConfig(n_docs=40, n_events=240, evolve_at=121, noise_pct=5)


def _payload_of(ev: pa.Table) -> pa.Schema:
    return pa.schema(list(ev.schema.field("after").type))


def _decode(records, payload=SEQ_SCHEMA) -> pa.Table:
    raw = ("\n".join(json.dumps(r) for r in records)).encode()
    return WM.decode_mongo(_json_table(raw), payload=payload)


def _event(g, op="insert", key="d1", doc=None, **extra):
    rec = {"_id": {"_data": f"{g:016x}"},
           "operationType": op,
           "clusterTime": {"$timestamp": {"t": 1600000000 + g, "i": 0}},
           "ns": {"db": "rook", "coll": "sequences"},
           "documentKey": {"_id": key}}
    if doc is not None:
        rec["fullDocument"] = doc
    rec.update(extra)
    return rec


DOC = {"doc_id": "d1", "tokens": [1, 2], "n_tok": 2, "source": "web"}


# ----------------------------------------------------------- roundtrip

def test_mongo_roundtrip_exact(tmp_path):
    """Dump → decode reproduces every event byte-for-byte under the
    format's documented envelope semantics: singleton transactions
    (committed-only stream), null server_id (not in the format),
    replace ≡ update, and key-only before images where the dump's
    pre-image knob withheld them."""
    ev = generate_events(CFG)
    payload = _payload_of(ev)
    d = WM.mongo_dump(ev, str(tmp_path / "mg"), n_files=3)
    assert d["events"] == ev.num_rows
    assert d["records"] == ev.num_rows + 2   # + drop + invalidate

    raw = b"".join(open(p, "rb").read() for p in d["files"])
    got = WM.decode_mongo(_json_table(raw), payload=payload).sort_by("gtid")
    orig = ev.sort_by("gtid")
    assert got.num_rows == orig.num_rows     # drop/invalidate dropped
    assert got.column("gtid").to_pylist() == orig.column("gtid").to_pylist()
    assert got.column("tx_id").to_pylist() == got.column("gtid").to_pylist()
    assert set(got.column("tx_events").to_pylist()) == {1}
    assert set(got.column("seq_in_tx").to_pylist()) == {0}
    assert got.column("server_id").null_count == got.num_rows
    for c in ["op", "db", "table", "key", "after"]:
        assert got.column(c).to_pylist() == orig.column(c).to_pylist(), c

    kf = payload.names[0]
    key_only = 0
    for g, op, b_got, b_orig, k in zip(got.column("gtid").to_pylist(),
                                       got.column("op").to_pylist(),
                                       got.column("before").to_pylist(),
                                       orig.column("before").to_pylist(),
                                       got.column("key").to_pylist()):
        if op == OP_INSERT:
            assert b_got is None, g
        elif g % 5 == 0:                     # pre-image withheld
            assert b_got == {n: (k if n == kf else None)
                             for n in payload.names}, g
            key_only += 1
        else:
            assert b_got == b_orig, g
    assert key_only > 0


def test_mongo_replace_is_update():
    t = _decode([_event(7, "replace", doc=DOC)])
    assert t.column("op").to_pylist() == [OP_UPDATE]
    assert t.column("after").to_pylist()[0] == DOC


def test_mongo_non_mutations_dropped():
    recs = [_event(1, doc=DOC),
            {"_id": {"_data": f"{2:016x}"}, "operationType": "drop",
             "ns": {"db": "rook", "coll": "sequences"}},
            {"_id": {"_data": f"{3:016x}"}, "operationType": "rename",
             "ns": {"db": "rook", "coll": "sequences"}},
            {"_id": {"_data": f"{4:016x}"}, "operationType": "invalidate"}]
    t = _decode(recs)
    assert t.num_rows == 1
    assert t.column("op").to_pylist() == [OP_INSERT]


def test_mongo_delete_key_only_before():
    t = _decode([_event(9, "delete")])
    assert t.column("op").to_pylist() == [OP_DELETE]
    assert t.column("after").to_pylist() == [None]
    b = t.column("before").to_pylist()[0]
    assert b["doc_id"] == "d1" and b["tokens"] is None


# ------------------------------------------------------------- guards

def test_mongo_update_without_fulldocument_refuses():
    """An update without a post-image cannot feed LWW apply — the
    decoder must name the fix (fullDocument: 'updateLookup'), never
    fabricate rows from updateDescription deltas."""
    rec = _event(5, "update",
                 updateDescription={"updatedFields": {"n_tok": 3},
                                    "removedFields": []})
    with pytest.raises(ValueError, match="updateLookup"):
        _decode([rec])


def test_mongo_null_documentkey_refuses():
    rec = _event(5, doc=DOC)
    rec["documentKey"] = {"_id": None}
    with pytest.raises(ValueError, match="documentKey"):
        _decode([rec])


def test_mongo_not_a_change_stream_refuses():
    with pytest.raises(ValueError, match="operationType"):
        WM.decode_mongo(_json_table(b'{"foo": 1}'), payload=SEQ_SCHEMA)


# ------------------------------------------- coordinate fallback paths

def test_mongo_foreign_resume_token_falls_back_to_clustertime():
    """A real MongoDB resume token is longer than 16 hex chars: the
    decoder must not half-parse it — ALL rows switch to the
    clusterTime composite ``t << 20 | i`` (one coordinate space)."""
    recs = [_event(1, doc=DOC), _event(2, doc=dict(DOC, n_tok=3))]
    for i, r in enumerate(recs):
        r["_id"] = {"_data": "82637E" + "AB" * 20}   # 46 hex chars
        r["clusterTime"] = {"$timestamp": {"t": 1700, "i": i}}
    t = _decode(recs)
    assert t.column("gtid").to_pylist() == [(1700 << 20) | 0,
                                            (1700 << 20) | 1]
    assert t.column("tx_id").to_pylist() == t.column("gtid").to_pylist()


def test_mongo_no_order_refuses():
    rec = _event(1, doc=DOC)
    rec["_id"] = {"_data": "x" * 40}
    del rec["clusterTime"]
    with pytest.raises(ValueError, match="refusing to invent"):
        _decode([rec])


def test_mongo_clustertime_ordinal_overflow_refuses():
    rec = _event(1, doc=DOC)
    rec["_id"] = {"_data": "z" * 40}
    rec["clusterTime"] = {"$timestamp": {"t": 1, "i": 1 << 20}}
    with pytest.raises(ValueError, match="collide"):
        _decode([rec])


def test_mongo_resume_token_vector_parse_matches_python():
    """The numpy hex-grid parse equals int(x, 16) on random widths."""
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 2**62, size=200, dtype=np.int64).tolist() + [0, 1]
    toks = [format(v, "x") if i % 2 else format(v, "016x")
            for i, v in enumerate(vals)]
    out = WM._resume_token_gtids(pa.array(toks, pa.string()), len(toks))
    assert out is not None
    assert out.tolist() == vals
    # > 2^62 and non-hex both reject the whole batch
    assert WM._resume_token_gtids(
        pa.array([format(2**63 - 1, "x")]), 1) is None
    assert WM._resume_token_gtids(pa.array(["12g4"]), 1) is None


# ------------------------------------------------- lake / socket / CLI

def test_mongo_lake_apply(tmp_path):
    """read_mongo → LakeTable.apply reproduces the closed-form final
    state (noise-free config: mongo carries no server_id, so server-id
    routing is out of scope for this format — same contract as
    canal/pgoutput)."""
    from rookray.pipeline import CDCConfig, LakeTable

    cfg = GenConfig(n_docs=40, n_events=240, evolve_at=121, noise_pct=0)
    ev = generate_events(cfg)
    d = WM.mongo_dump(ev, str(tmp_path / "mg"), n_files=4)
    ds = WM.read_mongo(d["files"], payload=_payload_of(ev))
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=4))
    lake.apply(ds.materialize())
    state = lake.state_table().sort_by("doc_id")
    exp = final_state(cfg).sort_by("doc_id")
    assert state.column("doc_id").to_pylist() == exp.column("doc_id").to_pylist()
    assert state.column("tokens").to_pylist() == exp.column("tokens").to_pylist()


def test_mongo_socket_feed_applies_to_lake(tmp_path):
    """Live change-stream feed needs NO side state at all: the
    committed-only contract makes every frame self-contained."""
    from rookray.pipeline import CDCConfig, LakeTable

    cfg = GenConfig(n_docs=40, n_events=240, evolve_at=121, noise_pct=0)
    ev = generate_events(cfg)
    d = WM.mongo_dump(ev, str(tmp_path / "mg"), n_files=4)

    srv = WM.MongoStreamServer()
    ds = WM.stream_mongo_socket(srv.host, srv.port,
                                payload=_payload_of(ev))
    for f in d["files"]:
        srv.push_file(f)
    srv.close()

    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=4))
    lake.apply(ds.materialize())
    state = lake.state_table().sort_by("doc_id")
    exp = final_state(cfg).sort_by("doc_id")
    assert state.column("doc_id").to_pylist() == exp.column("doc_id").to_pylist()
    assert state.column("tokens").to_pylist() == exp.column("tokens").to_pylist()


def test_mongo_checkpoint_resume_prunes_dump_files(tmp_path, capsys):
    """Second `rookray wire --format mongo` run skips every dump file
    whose successor's first coordinate is at or below the committed
    watermark, applies 0 events, and leaves state identical."""
    from rookray.cli import main as cli_main
    from rookray.pipeline import LakeTable

    ev = generate_events(GenConfig(n_docs=20, n_events=160))
    d = WM.mongo_dump(ev, str(tmp_path / "mg"), n_files=4)
    t = str(tmp_path / "lake")
    assert cli_main(["wire", "--format", "mongo",
                     "--dump", str(tmp_path / "mg"),
                     "--table", t, "--partitions", "2"]) == 0
    first = json.loads(capsys.readouterr().out)
    assert first["files"] == 4 and first["files_skipped"] == 0
    state1 = LakeTable(t).state_table().sort_by("doc_id")

    wm = first["closed_watermark"]
    kept = WM.mongo_files_above(d["files"], wm)
    assert kept == d["files"][3:]            # only the tail re-presented

    assert cli_main(["wire", "--format", "mongo",
                     "--dump", str(tmp_path / "mg"),
                     "--table", t, "--partitions", "2"]) == 0
    second = json.loads(capsys.readouterr().out)
    assert second["files_skipped"] == 3
    assert second["events_applied"] == 0
    state2 = LakeTable(t).state_table().sort_by("doc_id")
    assert state1.to_pylist() == state2.to_pylist()


def test_infer_payload_mongo(tmp_path):
    """Schema inferred from the dump's fullDocument images: additive
    union across head and tail samples (early files predate the
    mid-stream DDL and lack the evolved column)."""
    ev = generate_events(CFG)
    d = WM.mongo_dump(ev, str(tmp_path / "mg"), n_files=4)
    inf = WM.infer_payload_mongo(d["files"])
    exp = _payload_of(ev)
    assert inf.names == exp.names

    def widen(t):  # documented: integer-typed JSON numbers stay int64
        if pa.types.is_integer(t):
            return pa.int64()
        if pa.types.is_list(t):
            return pa.list_(widen(t.value_type))
        return t
    assert [f.type for f in inf] == [widen(f.type) for f in exp]
