"""DynamoDB Streams wire adapter: encode → decode roundtrips, typed
AttributeValue unwrap, sequence-number limb parse + rebase, view-type
variants, strict-mode guards, socket feed, lake apply, CLI checkpoint
resume."""

import json

import numpy as np
import pyarrow as pa
import pytest

from rookray import wiredynamo as WD
from rookray.gen import GenConfig, generate_events, final_state
from rookray.schema import OP_DELETE, OP_INSERT, OP_UPDATE, SEQ_SCHEMA
from rookray.wire import _json_table

CFG = GenConfig(n_docs=40, n_events=240, evolve_at=121, noise_pct=5)

BASE = 10 ** 20
BASE_HIGH = BASE // 10 ** 18


def _payload_of(ev: pa.Table) -> pa.Schema:
    return pa.schema(list(ev.schema.field("after").type))


def _decode(records, payload=SEQ_SCHEMA, base_high=0) -> pa.Table:
    raw = ("\n".join(json.dumps(r) for r in records)).encode()
    return WD.decode_dynamo(_json_table(raw), payload=payload,
                            base_high=base_high)


DOC = {"doc_id": "d1", "tokens": [1, 2], "n_tok": 2, "source": "web"}


def _event(g, name="INSERT", key="d1", new=None, old=None, seq=None,
           view="NEW_AND_OLD_IMAGES", **extra):
    dyn = {"ApproximateCreationDateTime": 1600000000 + g,
           "Keys": {"doc_id": {"S": key}},
           "SequenceNumber": str(g) if seq is None else seq,
           "SizeBytes": 50, "StreamViewType": view}
    if new is not None:
        dyn["NewImage"] = WD._image(new)
    if old is not None:
        dyn["OldImage"] = WD._image(old)
    rec = {"eventID": f"{g:032x}", "eventName": name,
           "eventVersion": "1.1", "eventSource": "aws:dynamodb",
           "awsRegion": "us-east-1", "dynamodb": dyn,
           "eventSourceARN": ("arn:aws:dynamodb:us-east-1:123456789012:"
                              "table/sequences/stream/2026-08-19")}
    rec.update(extra)
    return rec


# ----------------------------------------------------------- roundtrip

def test_dynamo_roundtrip_exact(tmp_path):
    """Dump → decode reproduces every event byte-for-byte under the
    format's documented semantics: singleton transactions (streams
    carry no tx grouping), null db/server_id (not in the format),
    table from the stream ARN, typed-wrapper images, 21-digit
    SequenceNumbers rebased against the probed base."""
    ev = generate_events(CFG)
    payload = _payload_of(ev)
    d = WD.dynamo_dump(ev, str(tmp_path / "ddb"), n_files=3)
    assert d["events"] == ev.num_rows == d["records"]  # no end markers

    base = WD.dynamo_sequence_base(d["files"])
    assert base == BASE
    raw = b"".join(open(p, "rb").read() for p in d["files"])
    got = WD.decode_dynamo(_json_table(raw), payload=payload,
                           base_high=base // 10 ** 18).sort_by("gtid")
    orig = ev.sort_by("gtid")
    assert got.num_rows == orig.num_rows
    assert got.column("gtid").to_pylist() == orig.column("gtid").to_pylist()
    assert got.column("tx_id").to_pylist() == got.column("gtid").to_pylist()
    assert set(got.column("tx_events").to_pylist()) == {1}
    assert set(got.column("seq_in_tx").to_pylist()) == {0}
    assert got.column("server_id").null_count == got.num_rows
    assert got.column("db").null_count == got.num_rows
    for c in ["op", "table", "key", "after"]:
        assert got.column(c).to_pylist() == orig.column(c).to_pylist(), c
    # NEW_AND_OLD_IMAGES: full before images everywhere but inserts
    for op, b_got, b_orig in zip(got.column("op").to_pylist(),
                                 got.column("before").to_pylist(),
                                 orig.column("before").to_pylist()):
        if op == OP_INSERT:
            assert b_got is None
        else:
            assert b_got == b_orig


def test_dynamo_new_image_view_key_only_befores(tmp_path):
    """A NEW_IMAGE dump withholds every OldImage: updates/removes
    decode with a key-only before (the engine only dereferences the
    key from before images)."""
    ev = generate_events(CFG)
    d = WD.dynamo_dump(ev, str(tmp_path / "ddb"), n_files=2,
                       view_type="NEW_IMAGE")
    raw = b"".join(open(p, "rb").read() for p in d["files"])
    t = WD.decode_dynamo(_json_table(raw), payload=_payload_of(ev),
                         base_high=BASE_HIGH)
    kf = _payload_of(ev).names[0]
    non_inserts = 0
    for op, b in zip(t.column("op").to_pylist(),
                     t.column("before").to_pylist()):
        if op == OP_INSERT:
            assert b is None
        else:
            assert b[kf] is not None
            assert all(v is None for k, v in b.items() if k != kf)
            non_inserts += 1
    assert non_inserts > 0


def test_dynamo_ttl_delete_decodes_as_remove():
    rec = _event(7, "REMOVE",
                 userIdentity={"type": "Service",
                               "principalId": "dynamodb.amazonaws.com"})
    t = _decode([rec])
    assert t.column("op").to_pylist() == [OP_DELETE]
    assert t.column("after").to_pylist() == [None]


def test_dynamo_null_attribute_roundtrip():
    """{"NULL": true} wrappers come out as typed nulls."""
    t = _decode([_event(5, "INSERT", new=dict(DOC, source=None))])
    a = t.column("after").to_pylist()[0]
    assert a["source"] is None and a["tokens"] == [1, 2]


# ------------------------------------------------------------- guards

def test_dynamo_modify_without_newimage_refuses():
    with pytest.raises(ValueError, match="StreamViewType"):
        _decode([_event(5, "MODIFY", old=DOC)])


def test_dynamo_keys_only_dump_refuses(tmp_path):
    ev = generate_events(GenConfig(n_docs=10, n_events=40))
    d = WD.dynamo_dump(ev, str(tmp_path / "ddb"), n_files=1,
                       view_type="KEYS_ONLY")
    raw = open(d["files"][0], "rb").read()
    with pytest.raises(ValueError, match="NEW_AND_OLD_IMAGES"):
        WD.decode_dynamo(_json_table(raw), payload=_payload_of(ev),
                         base_high=BASE_HIGH)


def test_dynamo_unknown_eventname_refuses():
    with pytest.raises(ValueError, match="UPSERT"):
        _decode([_event(5, "UPSERT", new=DOC)])


def test_dynamo_set_attribute_refuses():
    rec = _event(3, new=DOC)
    rec["dynamodb"]["NewImage"]["tokens"] = {"NS": ["1", "2"]}
    with pytest.raises(ValueError, match="unordered"):
        _decode([rec])


def test_dynamo_null_key_refuses():
    rec = _event(3, new=DOC)
    rec["dynamodb"]["Keys"] = {"doc_id": {"NULL": True}}
    with pytest.raises(ValueError, match="Keys.doc_id"):
        _decode([rec])


def test_dynamo_not_a_dump_refuses():
    with pytest.raises(ValueError, match="eventName"):
        WD.decode_dynamo(_json_table(b'{"foo": 1}'), payload=SEQ_SCHEMA)


# -------------------------------------------------- sequence coordinates

def test_dynamo_sequence_parse_matches_python():
    """The two-limb digit-grid parse equals int(x) - base on random
    widths, including 21-digit realistic numbers."""
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 2 ** 61, size=200, dtype=np.int64).tolist() + [0, 1]
    # riding the 10^20 base like real 21-digit stream numbers
    out = WD._sequence_coords(
        pa.array([str(BASE + v) for v in vals], pa.string()),
        len(vals), BASE_HIGH)
    assert out.tolist() == [(BASE + v) - BASE for v in vals]
    # plain small numbers against base 0
    out0 = WD._sequence_coords(
        pa.array([str(v) for v in vals[:50]], pa.string()), 50, 0)
    assert out0.tolist() == vals[:50]


def test_dynamo_sequence_below_base_refuses():
    with pytest.raises(ValueError, match="below the dump's sequence"):
        _decode([_event(1, new=DOC, seq="5")], base_high=1)


def test_dynamo_sequence_era_overflow_refuses():
    with pytest.raises(ValueError, match="sequence_base"):
        _decode([_event(1, new=DOC, seq=str(10 ** 20))])


def test_dynamo_sequence_too_wide_refuses():
    with pytest.raises(ValueError, match="37 digits"):
        _decode([_event(1, new=DOC, seq="9" * 38)])


def test_dynamo_sequence_non_decimal_refuses():
    with pytest.raises(ValueError, match="non-decimal"):
        _decode([_event(1, new=DOC, seq="12a4")])


def test_dynamo_sequence_base_probe(tmp_path):
    ev = generate_events(GenConfig(n_docs=10, n_events=40))
    d = WD.dynamo_dump(ev, str(tmp_path / "ddb"), n_files=2)
    assert WD.dynamo_sequence_base(d["files"]) == BASE
    first_g = min(ev.column("gtid").to_pylist())
    assert WD.dynamo_first_coordinate(d["files"][0], BASE) == first_g


# ------------------------------------------------- lake / socket / CLI

def test_dynamo_lake_apply(tmp_path):
    """read_dynamo → LakeTable.apply reproduces the closed-form final
    state (noise-free config: the format carries no server_id, so
    server-id routing is out of scope — same contract as
    canal/pgoutput/mongo)."""
    from rookray.pipeline import CDCConfig, LakeTable

    cfg = GenConfig(n_docs=40, n_events=240, evolve_at=121, noise_pct=0)
    ev = generate_events(cfg)
    d = WD.dynamo_dump(ev, str(tmp_path / "ddb"), n_files=4)
    ds = WD.read_dynamo(d["files"], payload=_payload_of(ev))
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=4))
    lake.apply(ds.materialize())
    state = lake.state_table().sort_by("doc_id")
    exp = final_state(cfg).sort_by("doc_id")
    assert state.column("doc_id").to_pylist() == exp.column("doc_id").to_pylist()
    assert state.column("tokens").to_pylist() == exp.column("tokens").to_pylist()


def test_dynamo_socket_feed_applies_to_lake(tmp_path):
    """Live stream feed holds no side state beyond the sequence base,
    which the FIRST frame anchors deterministically."""
    from rookray.pipeline import CDCConfig, LakeTable

    cfg = GenConfig(n_docs=40, n_events=240, evolve_at=121, noise_pct=0)
    ev = generate_events(cfg)
    d = WD.dynamo_dump(ev, str(tmp_path / "ddb"), n_files=4)

    srv = WD.DynamoStreamServer()
    ds = WD.stream_dynamo_socket(srv.host, srv.port,
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


def test_dynamo_checkpoint_resume_prunes_dump_files(tmp_path, capsys):
    """Second `rookray wire --format dynamo` run skips every dump file
    whose successor's first coordinate is at or below the committed
    watermark, applies 0 events, and leaves state identical."""
    from rookray.cli import main as cli_main
    from rookray.pipeline import LakeTable

    ev = generate_events(GenConfig(n_docs=20, n_events=160))
    d = WD.dynamo_dump(ev, str(tmp_path / "ddb"), n_files=4)
    t = str(tmp_path / "lake")
    assert cli_main(["wire", "--format", "dynamo",
                     "--dump", str(tmp_path / "ddb"),
                     "--table", t, "--partitions", "2"]) == 0
    first = json.loads(capsys.readouterr().out)
    assert first["files"] == 4 and first["files_skipped"] == 0
    state1 = LakeTable(t).state_table().sort_by("doc_id")

    wm = first["closed_watermark"]
    kept = WD.dynamo_files_above(d["files"], wm)
    assert kept == d["files"][3:]            # only the tail re-presented

    assert cli_main(["wire", "--format", "dynamo",
                     "--dump", str(tmp_path / "ddb"),
                     "--table", t, "--partitions", "2"]) == 0
    second = json.loads(capsys.readouterr().out)
    assert second["files_skipped"] == 3
    assert second["events_applied"] == 0
    state2 = LakeTable(t).state_table().sort_by("doc_id")
    assert state1.to_pylist() == state2.to_pylist()


def test_infer_payload_dynamo(tmp_path):
    """Schema inferred from the dump's NewImage wrapper shapes:
    additive union across head and tail samples (early files predate
    the mid-stream DDL and lack the evolved attribute); numbers travel
    as strings, so N infers int64 by convention."""
    ev = generate_events(CFG)
    d = WD.dynamo_dump(ev, str(tmp_path / "ddb"), n_files=4)
    inf = WD.infer_payload_dynamo(d["files"])
    exp = _payload_of(ev)
    assert inf.names == exp.names

    def widen(t):
        if pa.types.is_integer(t):
            return pa.int64()
        if pa.types.is_list(t):
            return pa.list_(widen(t.value_type))
        return t
    assert [f.type for f in inf] == [widen(f.type) for f in exp]


def test_dynamo_full_egress_token_range_decodes():
    """Contract alignment with the egress dialect: tokens up to 2^62
    (gtids up to the 2^61 write guard, shifted) must decode when the
    base is anchored at the dump head; above the engine's 2^62 gtid
    ceiling refuses (regression: the era span was 3, refusing
    valid egress tokens >= 4x10^18)."""
    tok = (2 ** 61 - 1) << 1
    t = _decode([_event(1, new=DOC, seq=str(BASE + tok)),
                 _event(2, new=DOC, seq=str(BASE))],
                base_high=BASE_HIGH)
    assert sorted(t.column("gtid").to_pylist()) == [0, tok]
    with pytest.raises(ValueError, match="2\\^62"):
        _decode([_event(1, new=DOC, seq=str(BASE + 2 ** 62 + 1))],
                base_high=BASE_HIGH)
