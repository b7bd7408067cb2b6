"""Confluent schema-registry Avro envelope adapter: binary codec
roundtrips, framed-dump decode, schema evolution by registered id,
transaction topic, socket feed, lake apply."""

import json
import struct

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from rookray import wireavro as WA
from rookray.gen import GenConfig, generate_events, final_state
from rookray.schema import SEQ_SCHEMA_V2, change_event_schema

CFG = GenConfig(n_docs=40, n_events=240, evolve_at=121)


def _payload_of(ev: pa.Table) -> pa.Schema:
    return pa.schema(list(ev.schema.field("after").type))


def test_codec_primitives_roundtrip():
    sch = {"type": "record", "name": "T", "fields": [
        {"name": "l", "type": "long"},
        {"name": "neg", "type": "long"},
        {"name": "i", "type": "int"},
        {"name": "d", "type": "double"},
        {"name": "f", "type": "float"},
        {"name": "b", "type": "boolean"},
        {"name": "s", "type": "string"},
        {"name": "by", "type": "bytes"},
        {"name": "opt", "type": ["null", "long"]},
        {"name": "arr", "type": {"type": "array", "items": "int"}},
        {"name": "empty", "type": {"type": "array", "items": "long"}},
    ]}
    c = WA._Codec(sch)
    v = {"l": 2**62, "neg": -3, "i": -2**31, "d": 1.5, "f": 0.25,
         "b": True, "s": "héllo", "by": b"\x00\xff", "opt": None,
         "arr": [1, -2, 3], "empty": []}
    enc = c.encode(v)
    dec, end = c.decode(enc)
    assert end == len(enc)
    assert dec == v


def test_codec_zigzag_edges():
    sch = {"type": "record", "name": "T",
           "fields": [{"name": "x", "type": "long"}]}
    c = WA._Codec(sch)
    for x in (0, 1, -1, 63, 64, -64, -65, 2**63 - 1, -(2**63)):
        dec, _ = c.decode(c.encode({"x": x}))
        assert dec["x"] == x, x


def test_array_block_bytesize_form_decodes():
    """A spec-compliant writer may emit a negative block count followed
    by the block's byte size; the decoder must honor it."""
    sch = {"type": "record", "name": "T", "fields": [
        {"name": "arr", "type": {"type": "array", "items": "long"}}]}
    c = WA._Codec(sch)
    buf = bytearray()
    WA._zz_write(buf, -2)          # block of 2 items, size-prefixed
    inner = bytearray()
    WA._zz_write(inner, 7)
    WA._zz_write(inner, 8)
    WA._zz_write(buf, len(inner))
    buf.extend(inner)
    buf.append(0)                  # terminator
    dec, end = c.decode(bytes(buf))
    assert dec == {"arr": [7, 8]} and end == len(buf)


def test_roundtrip_exact_with_evolution(tmp_path):
    """encode (two registered schema ids, switch at the DDL point) →
    read_avro → every change-event column equals the original stream;
    gtid decodes as binlog coordinates (file_seq=1) << 40 | pos."""
    ev = generate_events(CFG)
    d = WA.avro_dump(ev, str(tmp_path / "dump"), n_files=3,
                     evolve_gtid=CFG.evolve_at)
    assert d["events"] == ev.num_rows
    reg = json.load(open(d["registry"]))
    assert set(reg) == {"1", "2", "3"}
    v1_fields = [f["name"] for f in reg["1"]["fields"][0]["type"][1]["fields"]]
    assert "lang" not in v1_fields
    ds = WA.read_avro(d["data_files"], d["registry"],
                      tx_topic=[d["tx_file"]], payload=_payload_of(ev))
    got = pa.Table.from_pylist(
        ds.take_all(), schema=change_event_schema(_payload_of(ev))
    ).sort_by("gtid")
    orig = ev.sort_by("gtid")
    assert np.array_equal(np.asarray(got.column("gtid")),
                          (1 << 40) | np.asarray(orig.column("gtid")))
    for c in ["tx_id", "seq_in_tx", "tx_events", "server_id", "db",
              "table", "op", "key", "before", "after"]:
        assert got.column(c).to_pylist() == orig.column(c).to_pylist(), c


def test_tx_counts_recovered_without_topic(tmp_path):
    ev = generate_events(CFG)
    d = WA.avro_dump(ev, str(tmp_path / "dump"), n_files=2)
    ds = WA.read_avro(d["data_files"], d["registry"], tx_topic=None,
                      payload=_payload_of(ev))
    got = pa.Table.from_pylist(ds.take_all()).sort_by("gtid")
    assert (got.column("tx_events").to_pylist()
            == ev.sort_by("gtid").column("tx_events").to_pylist())


def test_unknown_schema_id_raises(tmp_path):
    ev = generate_events(GenConfig(n_docs=5, n_events=10))
    d = WA.avro_dump(ev, str(tmp_path / "dump"), n_files=1)
    reg = WA._Registry({2: WA.tx_meta_avro_schema()})  # missing id 1
    with pytest.raises(ValueError, match="not in the registry"):
        reg.decode_file(open(d["data_files"][0], "rb").read())


def test_bad_magic_and_torn_frames_raise():
    reg = WA._Registry({1: WA.tx_meta_avro_schema()})
    body = struct.pack(">bI", 7, 1) + b"x"  # wrong magic
    framed = struct.pack(">I", len(body)) + body
    with pytest.raises(ValueError, match="magic"):
        reg.decode_file(framed)
    with pytest.raises(ValueError, match="torn"):
        reg.decode_file(struct.pack(">I", 100) + b"short")


def test_under_read_detected(tmp_path):
    """A message whose framed length exceeds its Avro body is a
    corruption signal, not silently ignored trailing bytes."""
    c = WA._Codec(WA.tx_meta_avro_schema())
    body = c.encode({"status": "BEGIN", "id": "1", "event_count": None,
                     "data_collections": None})
    msg = struct.pack(">bI", 0, 1) + body + b"JUNK"
    framed = struct.pack(">I", len(msg)) + msg
    reg = WA._Registry({1: WA.tx_meta_avro_schema()})
    with pytest.raises(ValueError, match="under-read"):
        reg.decode_file(framed)


def test_socket_feed_applies_to_lake(tmp_path):
    """Live Confluent-Avro frames over a socket → stream decode →
    lake apply reproduces the generated final state."""
    from rookray.pipeline import CDCConfig, LakeTable

    ev = generate_events(CFG)
    d = WA.avro_dump(ev, str(tmp_path / "dump"), n_files=4,
                     evolve_gtid=CFG.evolve_at)
    tx_index = WA.parse_tx_topic_avro([d["tx_file"]], d["registry"])

    srv = WA.AvroStreamServer()
    ds = WA.stream_avro_socket(srv.host, srv.port, d["registry"],
                               tx_index, payload=_payload_of(ev))
    for p in d["data_files"]:
        srv.push_file(p)
    srv.close()

    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(
        num_partitions=4,
        ignored_tables=frozenset({"ignored_entity"}),
        ignored_server_ids=frozenset({999})))
    lake.apply(ds.materialize())
    state = lake.state_table().sort_by("doc_id")
    want = final_state(CFG).sort_by("doc_id")
    assert state.column("doc_id").to_pylist() == \
        want.column("doc_id").to_pylist()
    assert state.column("tokens").to_pylist() == \
        want.column("tokens").to_pylist()


def test_dump_is_deterministic(tmp_path):
    ev = generate_events(GenConfig(n_docs=10, n_events=40))
    d1 = WA.avro_dump(ev, str(tmp_path / "a"), n_files=2)
    d2 = WA.avro_dump(ev, str(tmp_path / "b"), n_files=2)
    for p1, p2 in zip(d1["data_files"], d2["data_files"]):
        assert open(p1, "rb").read() == open(p2, "rb").read()
    assert (open(d1["tx_file"], "rb").read()
            == open(d2["tx_file"], "rb").read())


def test_infer_payload_from_registry(tmp_path):
    """The registry snapshot carries the catalog: inference merges
    envelope schemas in id order, so the post-DDL column appears with
    its REAL type (the JSON dialects must guess from data)."""
    ev = generate_events(CFG)
    d = WA.avro_dump(ev, str(tmp_path / "dump"), n_files=2,
                     evolve_gtid=CFG.evolve_at)
    inferred = WA.infer_payload_avro(d["registry"])
    assert inferred.equals(SEQ_SCHEMA_V2), inferred


def test_checkpoint_pruning_files_above(tmp_path):
    ev = generate_events(CFG)
    d = WA.avro_dump(ev, str(tmp_path / "dump"), n_files=4)
    firsts = [WA.avro_first_coordinate(p, d["registry"])
              for p in d["data_files"]]
    assert all(f is not None for f in firsts)
    assert firsts == sorted(firsts)
    # watermark inside the second file's range → only the first file
    # is provably fully applied (successor rule) and prunable
    kept = WA.avro_files_above(d["data_files"], firsts[1],
                               d["registry"])
    assert kept == d["data_files"][1:]
    # watermark at the last coordinate before file 2 → files 0 and 1
    # both prunable
    kept2 = WA.avro_files_above(d["data_files"], firsts[2] - 1,
                                d["registry"])
    assert kept2 == d["data_files"][2:]
    # no watermark → everything kept
    assert WA.avro_files_above(d["data_files"], -1, d["registry"]) \
        == d["data_files"]


def test_cli_wire_avro_ingest_and_resume(tmp_path, capsys):
    """`rookray wire --format avro` end-to-end: payload from the
    registry snapshot, tx topic auto-discovered, final state matches
    the serial oracle; a second run prunes every file below the
    committed watermark and applies nothing."""
    from rookray.cli import main
    from rookray.pipeline import LakeTable

    cfg = GenConfig(n_docs=30, n_events=200, evolve_at=101)
    ev = generate_events(cfg)
    dump = str(tmp_path / "dump")
    WA.avro_dump(ev, dump, n_files=3, evolve_gtid=cfg.evolve_at)
    t = str(tmp_path / "lake")
    assert main(["wire", "--format", "avro", "--dump", dump,
                 "--table", t, "--partitions", "2"]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["tx_topic"] is True and res["files"] == 3
    lake = LakeTable(t)
    state = lake.state_table().sort_by("doc_id")
    exp = final_state(cfg).sort_by("doc_id")
    assert state.column("doc_id").to_pylist() == \
        exp.column("doc_id").to_pylist()
    assert state.column("tokens").to_pylist() == \
        exp.column("tokens").to_pylist()
    # resume: everything at/below the watermark → all but the last
    # file pruned at the head read, zero new events applied
    assert main(["wire", "--format", "avro", "--dump", dump,
                 "--table", t, "--partitions", "2"]) == 0
    res2 = json.loads(capsys.readouterr().out)
    assert res2["events_applied"] == 0
    assert res2["files_skipped"] >= 2


def test_torn_head_keeps_file_in_pruning(tmp_path):
    """A producer dying mid-write leaves a torn first message; the
    resume path must conservatively KEEP the file (first coordinate
    unknown), not crash."""
    ev = generate_events(GenConfig(n_docs=5, n_events=20))
    d = WA.avro_dump(ev, str(tmp_path / "dump"), n_files=2)
    whole = open(d["data_files"][0], "rb").read()
    torn = str(tmp_path / "dump" / "data-99999.avrowire")
    open(torn, "wb").write(whole[:9])  # length prefix + partial body
    paths = d["data_files"] + [torn]
    assert WA.avro_first_coordinate(torn, d["registry"]) is None
    kept = WA.avro_files_above(paths, 10**9, d["registry"])
    assert torn in kept  # unknown first coordinate → keep


def test_zero_length_message_is_a_value_error():
    reg = WA._Registry({1: WA.tx_meta_avro_schema()})
    with pytest.raises(ValueError, match="shorter than"):
        reg.decode_file(b"\x00\x00\x00\x00")


def test_vectorized_decode_matches_record_walk(tmp_path):
    """The column-synchronous decoder (decode_file_table) must be
    byte-identical to the per-record closure walk on an EVOLVED dump —
    two schema ids interleave mid-file, exercising the per-id group
    decode and the order-restoring take."""
    ev = generate_events(CFG)
    d = WA.avro_dump(ev, str(tmp_path / "dump"), n_files=1,
                     evolve_gtid=CFG.evolve_at)
    reg = WA._Registry.load(d["registry"])
    data = open(d["data_files"][0], "rb").read()
    payload = _payload_of(ev)
    vec = reg.decode_file_table(data, payload)
    ref = WA.envelopes_to_table(reg.decode_file(data), payload)
    assert vec.equals(ref)
    # both envelope ids compiled vectorized (no silent fallback)
    assert reg._vec and all(v is not None for v in reg._vec.values())


def test_vectorized_fallback_on_unsupported_schema(tmp_path):
    """A schema outside the vectorized subset (array of strings) must
    fall back to the per-record walk with identical output, not fail."""
    sch = {"type": "record", "name": "Env", "fields": [
        {"name": "before", "type": ["null", {
            "type": "record", "name": "Value", "fields": [
                {"name": "id", "type": ["null", "long"],
                 "default": None}]}], "default": None},
        {"name": "after", "type": ["null", "Value"], "default": None},
        {"name": "op", "type": "string"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
    ]}
    payload = pa.schema([("id", pa.int64())])
    with pytest.raises(WA._VecUnsupported):
        WA._VecDecoder(sch, WA._envelope_struct_type(payload))
    c = WA._Codec(sch)
    buf = b"".join(
        WA._frame(1, c.encode({"before": None, "after": {"id": i},
                               "op": "c", "tags": ["a", "bb"]}))
        for i in range(4))
    reg = WA._Registry({1: sch})
    recs = reg.decode_file(buf)
    assert [r["after"]["id"] for r in recs] == [0, 1, 2, 3]
    # decode_file_table must take the per-record fallback branch and
    # still produce the typed envelope table
    tbl = reg.decode_file_table(buf, payload)
    ref = WA.envelopes_to_table(recs, payload)
    assert tbl.equals(ref)
    typ = WA._envelope_struct_type(payload)
    assert reg._vec[(1, typ)] is None  # cached as not-vectorizable


def _env_schema(value_fields: list[dict]) -> dict:
    return {"type": "record", "name": "Env", "fields": [
        {"name": "before", "type": ["null", {
            "type": "record", "name": "Value",
            "fields": value_fields}], "default": None},
        {"name": "after", "type": ["null", "Value"], "default": None},
        {"name": "op", "type": "string"},
    ]}


def test_vectorized_large_list_target():
    """A large_list payload column must decode vectorized (int64
    offsets, no 2**31 item cap), identical to the per-record walk."""
    sch = _env_schema([
        {"name": "id", "type": ["null", "long"], "default": None},
        {"name": "toks", "type": ["null", {
            "type": "array", "items": "int"}], "default": None}])
    payload = pa.schema([("id", pa.int64()),
                         ("toks", pa.large_list(pa.int32()))])
    c = WA._Codec(sch)
    buf = b"".join(
        WA._frame(1, c.encode({"before": None,
                               "after": {"id": i, "toks": list(range(i))},
                               "op": "c"}))
        for i in range(5))
    reg = WA._Registry({1: sch})
    tbl = reg.decode_file_table(buf, payload)
    typ = WA._envelope_struct_type(payload)
    assert reg._vec[(1, typ)] is not None  # vectorized, not fallback
    assert tbl.equals(WA.envelopes_to_table(reg.decode_file(buf), payload))
    toks = tbl.column("payload").combine_chunks().field("after").field("toks")
    assert pa.types.is_large_list(toks.type)
    assert toks.to_pylist() == [list(range(i)) for i in range(5)]


def test_vectorized_invalid_utf8_raises():
    """Corrupt UTF-8 in a string field must raise on BOTH decode
    paths — the vectorized gather may not hand an invalid utf8 array
    downstream (the per-record walk raises UnicodeDecodeError)."""
    sch = _env_schema([
        {"name": "id", "type": ["null", "long"], "default": None}])
    payload = pa.schema([("id", pa.int64())])
    c = WA._Codec(sch)
    buf = WA._frame(1, c.encode(
        {"before": None, "after": {"id": 7}, "op": "ZZ"}))
    assert buf.count(b"ZZ") == 1
    bad = buf.replace(b"ZZ", b"\xff\xfe")
    with pytest.raises(UnicodeDecodeError):
        WA._Registry({1: sch}).decode_file(bad)
    with pytest.raises(ValueError):  # pa.ArrowInvalid from the cast
        WA._Registry({1: sch}).decode_file_table(bad, payload)


def test_registry_cache_keyed_by_payload():
    """One registry instance serving two different payload schemas for
    the same schema id must not reuse the first payload's compiled
    decoder for the second (the cache is keyed by (id, target type))."""
    sch = _env_schema([
        {"name": "id", "type": ["null", "long"], "default": None},
        {"name": "x", "type": ["null", "long"], "default": None}])
    c = WA._Codec(sch)
    buf = b"".join(
        WA._frame(1, c.encode({"before": None,
                               "after": {"id": i, "x": 10 * i},
                               "op": "c"}))
        for i in range(3))
    reg = WA._Registry({1: sch})
    pay_a = pa.schema([("id", pa.int64())])
    pay_b = pa.schema([("id", pa.int64()), ("x", pa.int64())])
    ta = reg.decode_file_table(buf, pay_a)
    tb = reg.decode_file_table(buf, pay_b)
    after_a = ta.column("payload").combine_chunks().field("after")
    after_b = tb.column("payload").combine_chunks().field("after")
    assert after_a.type == pa.struct([("id", pa.int64())])
    assert after_b.field("x").to_pylist() == [0, 10, 20]
    assert len(reg._vec) == 2  # one compiled decoder per payload


def test_vectorized_under_read_and_torn_detected(tmp_path):
    """Corruption signals survive vectorization: trailing junk inside a
    frame is an under-read; a body cut mid-varint is a torn body."""
    ev = generate_events(GenConfig(n_docs=5, n_events=20))
    d = WA.avro_dump(ev, str(tmp_path / "dump"), n_files=1)
    reg = WA._Registry.load(d["registry"])
    payload = _payload_of(ev)
    data = open(d["data_files"][0], "rb").read()
    # splice junk into the first frame's body, patching its length
    (ln,) = struct.unpack_from(">I", data, 0)
    patched = (struct.pack(">I", ln + 4) + data[4:4 + ln] + b"JUNK"
               + data[4 + ln:])
    with pytest.raises(ValueError, match="under-read"):
        reg.decode_file_table(patched, payload)
    # cut the last frame's body short but keep its declared length
    torn = data[:-6] + data[-2:]  # drop 4 bytes inside the last body
    with pytest.raises(ValueError, match="torn|under-read"):
        WA._Registry.load(d["registry"]).decode_file_table(torn, payload)


def test_ragged_gather_and_varint_edges():
    """Unit edges of the vectorized primitives: empty strings, empty
    cursor arrays, multi-byte and negative zig-zag varints."""
    w = np.frombuffer(b"\x00\x01\x02\xac\x02\x80\x80\x01", dtype=np.uint8)
    vals, pos = WA._vec_varint(w, np.array([0, 1, 2, 3, 5], dtype=np.int64))
    assert vals.tolist() == [0, -1, 1, 150, 8192]
    assert pos.tolist() == [1, 2, 3, 5, 8]
    vals, pos = WA._vec_varint(w, np.array([], dtype=np.int64))
    assert len(vals) == 0 and len(pos) == 0
    data, offs = WA._ragged_gather(
        np.frombuffer(b"abcdef", dtype=np.uint8),
        np.array([0, 3, 3], dtype=np.int64),
        np.array([2, 0, 3], dtype=np.int64))
    assert bytes(data) == b"abdef"
    assert offs.tolist() == [0, 2, 2, 5]


def test_codec_decodes_hand_crafted_spec_binary():
    """Independent spec-fidelity pin: Avro binary constructed BY HAND
    from the public spec (zigzag varint longs, long-prefixed strings,
    array blocks including the negative-count byte-size form and
    multi-block arrays) — NOT by the repo's own encoder, so a mirrored
    encode/decode misreading cannot hide."""
    from rookray.wireavro import _Codec

    schema = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "vals", "type": {"type": "array", "items": "long"}},
    ]}

    def zz(n):
        u = (n << 1) ^ (n >> 63)
        out = bytearray()
        while True:
            b = u & 0x7F
            u >>= 7
            if u:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    items1 = zz(1) + zz(-2)
    body = (zz(-3)                               # id = -3
            + zz(1) + zz(2) + b"ab"              # union branch 1, "ab"
            + zz(-2) + zz(len(items1)) + items1  # block: -2 + byteSize
            + zz(1) + zz(300)                    # block: 1 item
            + zz(0))                             # array end
    val, p = _Codec(schema).decode(body)
    assert p == len(body)
    assert val == {"id": -3, "name": "ab", "vals": [1, -2, 300]}

    body2 = zz(7) + zz(0) + zz(0)                # null branch, [] array
    val2, p2 = _Codec(schema).decode(body2)
    assert p2 == len(body2)
    assert val2 == {"id": 7, "name": None, "vals": []}
