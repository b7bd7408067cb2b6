"""Round-2 hardening: partition-count pinning, lossless manifest
schema persistence, multi-shard-tx tail overlap, stale shuffle-partial
cleanup, fan-out unregister-by-class, connect(timeout)."""

import os
import shutil

import pyarrow as pa
import pytest

from rookray.gen import GenConfig, final_state, write_shards
from rookray.pipeline import CDCConfig, LakeTable, _schema_from_b64, _schema_to_b64
from rookray.source import ShardTailer
from rookray.targets.fanout import Fanout

from tests.test_gen_oracle import assert_tables_equal


def test_repartition_config_mismatch_is_harmless(tmp_path):
    """Re-applying with a different configured num_partitions must NOT
    scatter keys across a different partitioning (round-1 review found
    16 duplicate doc_ids doing exactly this) — the committed manifest
    value wins."""
    cfg = GenConfig(n_docs=40, n_events=600)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=4)
    root = str(tmp_path / "lake")
    LakeTable(root, CDCConfig(num_partitions=8)).apply(meta["files"][:2])
    # second epoch through a DIFFERENTLY-configured handle (the CLI
    # default vs library default trap)
    lake2 = LakeTable(root, CDCConfig(num_partitions=16))
    with pytest.warns(UserWarning, match="committed"):
        # overlap shard 1: re-present events held back at the epoch-1
        # tx boundary (the apply() contract)
        lake2.apply(meta["files"][1:])
    state = lake2.state_table()
    ids = state.column("doc_id").to_pylist()
    assert len(ids) == len(set(ids)), "duplicate doc_ids => partition corruption"
    assert_tables_equal(state, final_state(cfg))
    # watermarks() sized by the committed count, not the configured one
    assert len(lake2.watermarks()) == 8


def test_manifest_schema_roundtrip_exotic_types():
    exotic = pa.schema([
        ("doc_id", pa.string()),
        ("tags", pa.list_(pa.string())),
        ("d", pa.date32()),
        ("ts", pa.timestamp("us", tz="UTC")),
        ("m", pa.map_(pa.string(), pa.int64())),
        ("dec", pa.decimal128(10, 2)),
    ])
    assert _schema_from_b64(_schema_to_b64(exotic)) == exotic


def test_exotic_payload_type_survives_commit_and_reapply(tmp_path):
    """A derived payload with types outside the legacy string map must
    commit AND stay appendable (the old _TYPES round-trip made the
    table permanently un-appendable on the next apply)."""
    cfg = GenConfig(n_docs=20, n_events=300)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=2)

    def derive(flat: pa.Table) -> pa.Table:
        head = {n: flat.column(n) for n in ("gtid", "split", "tx_id", "op", "doc_id")
                if n in flat.column_names}
        out = dict(head)
        out["n_tok"] = flat.column("n_tok")
        # list<string> — not representable in the legacy type map
        src = flat.column("source").to_pylist()
        out["tags"] = pa.array([[s, "x"] if s is not None else None for s in src],
                               pa.list_(pa.string()))
        return pa.table(out)

    root = str(tmp_path / "lake")
    lake = LakeTable(root, CDCConfig(num_partitions=4))
    lake.apply_derived(meta["files"][:1], derive)
    # the round-1 bug: this second apply raised 'unsupported persisted type'
    lake.apply_derived(meta["files"][1:], derive)
    state = lake.state_table()
    assert state.schema.field("tags").type == pa.list_(pa.string())
    assert len(state) > 0


def test_tail_completes_transactions_spanning_many_shards(tmp_path):
    """A tx spanning 3+ shards must complete once all its shards have
    arrived — requires re-presenting EVERY applied shard above the
    closed watermark, not just the last one."""
    cfg = GenConfig(n_docs=10, n_events=60)
    staged = tmp_path / "staged"
    meta = write_shards(cfg, str(staged), n_shards=30)  # ~2 events/shard
    live = tmp_path / "live"
    live.mkdir()
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=4))
    tailer = ShardTailer(str(live), lake)
    tailer.connect()
    for f in meta["files"]:
        shutil.copy(f, live / os.path.basename(f))
        tailer.poll_once()
    m = lake.manifest()
    assert m["closed_watermark"] == meta["gtid_max"], \
        "watermark stalled -- open tx never completed"
    assert_tables_equal(lake.state_table(), final_state(cfg))


def test_stale_shuffle_partials_not_merged(tmp_path, monkeypatch):
    """Partials left by an aborted attempt of the same epoch (different
    shard set) must not leak into the committed state."""
    shuffle_base = str(tmp_path / "shuffle")
    monkeypatch.setenv("ROOKRAY_SHUFFLE_DIR", shuffle_base)
    cfg = GenConfig(n_docs=15, n_events=200)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=2)
    root = str(tmp_path / "lake")

    # plant a stale partial where epoch 0 of this table would shuffle
    import hashlib
    from rookray import sink as S
    tag = hashlib.md5(root.encode()).hexdigest()[:10]
    stale_dir = os.path.join(shuffle_base, "rookray-shuffle", tag,
                             "epoch-000000", "deadbeef00")
    poison = pa.table({
        "gtid": pa.array([10 ** 9], pa.int64()),
        "split": pa.array([1], pa.int8()),
        "tx_id": pa.array([0], pa.int64()),
        "op": pa.array([0], pa.int8()),
        "doc_id": pa.array(["poison-doc"], pa.string()),
        "tokens": pa.array([[1, 2]], pa.list_(pa.int32())),
        "n_tok": pa.array([2], pa.int32()),
        "source": pa.array(["src0"], pa.string()),
    })
    S.atomic_write_ipc_parts([poison], [0],
                             os.path.join(stale_dir, "all-poison.arrow"))

    lake = LakeTable(root, CDCConfig(num_partitions=4))
    lake.apply(meta["files"])
    state = lake.state_table()
    assert "poison-doc" not in set(state.column("doc_id").to_pylist())
    assert_tables_equal(state, final_state(cfg))


def test_fanout_unregister_by_class():
    class A:
        def apply(self, shards, **kw):
            return {"n": len(shards)}

    class B(A):
        pass

    f = Fanout({"a1": A(), "a2": A(), "b": B()})
    # B is a subclass of A: unregistering B removes only b
    assert f.unregister_by_class(B) == 1
    assert set(f.targets) == {"a1", "a2"}
    assert f.unregister_by_class(A) == 2
    assert not f.targets


def test_connect_timeout(tmp_path):
    missing = str(tmp_path / "never")
    t = ShardTailer(missing, target=None)
    with pytest.raises(TimeoutError):
        t.connect(timeout_s=0.2)
    assert not t.is_connected()
    os.makedirs(missing)
    t.connect(timeout_s=0.2)
    assert t.is_connected()


def test_explicit_repartition_roundtrip(tmp_path):
    """LakeTable.repartition: the sanctioned partition-count change —
    state preserved exactly, subsequent epochs apply at the new count,
    final state still byte-equals the oracle."""
    cfg = GenConfig(n_docs=40, n_events=600)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=4)
    root = str(tmp_path / "lake")
    lake = LakeTable(root, CDCConfig(num_partitions=4))
    lake.apply(meta["files"][:2])
    mid_state = lake.state_table()

    res = lake.repartition(16)
    assert res["num_partitions"] == 16
    lake16 = LakeTable(root, CDCConfig(num_partitions=16))
    assert len(lake16.watermarks()) == 16
    assert_tables_equal(lake16.state_table(), mid_state)

    # continue the stream at the new partition count (overlap shard 1
    # re-presents held-back open-tx events)
    lake16.apply(meta["files"][1:])
    assert_tables_equal(lake16.state_table(), final_state(cfg))


def test_repartition_requires_compacted_table(tmp_path):
    cfg = GenConfig(n_docs=10, n_events=120)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=2)
    lake = LakeTable(str(tmp_path / "lake"),
                     CDCConfig(num_partitions=4, write_mode="delta"))
    lake.apply(meta["files"])
    with pytest.raises(ValueError, match="compact"):
        lake.repartition(8)
    lake.compact()
    lake.repartition(8)
    assert_tables_equal(
        LakeTable(str(tmp_path / "lake")).state_table(), final_state(cfg))


def test_hash_strings_matrix_and_flat_paths_agree():
    """The per-length matrix path and the flat prefix-sum fallback must
    produce bit-identical hashes — the value is frozen (persisted in
    dedup keys / partition routing, re-derived in the DuckDB oracles)."""
    import numpy as np
    import pyarrow as pa
    from rookray import util

    rng = np.random.default_rng(7)

    def flat_reference(arr, variant=0):
        arr = pa.compute.fill_null(arr, "")
        n = len(arr)
        buffers = arr.buffers()
        offsets = np.frombuffer(buffers[1], dtype=np.int32,
                                count=n + 1 + arr.offset)[arr.offset:]
        data = (np.frombuffer(buffers[2], dtype=np.uint8)
                if buffers[2] is not None else np.zeros(0, np.uint8))
        starts = offsets[:-1].astype(np.int64)
        lens = offsets[1:].astype(np.int64) - starts
        pows, salt = util._VARIANTS[variant]
        sums = util._poly_sums_flat(data, starts, lens, pows)
        z = sums + lens.astype(np.uint64) * salt
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))

    cases = []
    # few distinct lengths (matrix path)
    cases.append([("x" * int(L)) for L in rng.choice([3, 8, 17], size=500)])
    # >64 distinct lengths on small n (flat fallback path)
    cases.append([("a" * L) for L in range(200)])
    # empty strings, nulls, unicode, single row, boundary lengths
    cases.append(["", None, "é→ ", "a", "b" * 4095, ""])
    # random bytes-ish content with mixed lengths around the threshold
    cases.append(["".join(chr(32 + int(c)) for c in rng.integers(0, 90, size=int(L)))
                  for L in rng.integers(0, 70, size=300)])
    for vals in cases:
        arr = pa.array(vals, type=pa.string())
        for variant in (0, 1):
            got = util.hash_strings(arr, variant=variant)
            want = flat_reference(arr, variant=variant)
            assert (got == want).all()
    # sliced array (non-zero arr.offset) must hash like the copy
    big = pa.array([f"doc-{i:04d}" for i in range(100)])
    sl = big.slice(37, 25)
    assert (util.hash_strings(sl) ==
            util.hash_strings(pa.array(sl.to_pylist()))).all()
    # frozen reference values (cross-process determinism pin)
    frozen = util.hash_strings(pa.array(["a", "bc", "", "doc-123"])).tolist()
    assert frozen == util.hash_strings(pa.array(["a", "bc", "", "doc-123"])).tolist()


def test_fused_normalize_equals_unfused_composition():
    """normalize_batch (fused filter+flatten) must equal
    flatten(filter_events(...)) row-for-row across op mixes, PK-change
    splits, noise rows, and all-pass / all-filtered / empty batches."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile
    from rookray import gen
    from rookray.events import (NormalizeConfig, filter_events, flatten,
                                normalize_batch)

    ncfg = NormalizeConfig(ignored_tables=frozenset({"ignored_entity"}),
                           ignored_server_ids=frozenset({999}))

    def check(batch):
        unfused = flatten(filter_events(batch, ncfg), ncfg)
        fused = normalize_batch(batch, ncfg)
        key = [("gtid", "ascending"), ("split", "ascending")]
        assert unfused.sort_by(key).equals(fused.sort_by(key))

    for seed, noise in [(1, 0), (2, 20), (3, 60)]:
        cfg = gen.GenConfig(n_docs=40, n_events=400, seed=seed,
                            noise_pct=noise, zipf_a=1.2)
        d = tempfile.mkdtemp()
        meta = gen.write_shards(cfg, d)
        batch = pa.concat_tables(
            [pq.read_table(f) for f in meta["files"]]).combine_chunks()
        check(batch)                      # mixed pass/filter
        check(batch.slice(0, 0))          # empty
        # all-filtered: point the config at a table no row matches
        other = NormalizeConfig(table="nope")
        assert len(normalize_batch(batch, other)) == 0
        assert len(flatten(filter_events(batch, other), other)) == 0
