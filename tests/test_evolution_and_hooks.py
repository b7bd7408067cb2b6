"""Schema-evolution policy edges, the F7 interceptor hook (SKIP /
REMOVE), sink GC, and hash determinism."""

import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rookray.schema import (
    SchemaEvolutionError,
    conform,
    is_additive,
    unify_additive,
    widen_type,
)


def test_additive_ok():
    a = pa.schema([("x", pa.int64())])
    b = pa.schema([("x", pa.int64()), ("y", pa.string())])
    assert is_additive(a, b)
    u = unify_additive([a, b])
    assert u.names == ["x", "y"]


def test_type_change_rejected():
    a = pa.schema([("x", pa.int64())])
    b = pa.schema([("x", pa.string())])
    assert not is_additive(a, b)
    with pytest.raises(SchemaEvolutionError):
        unify_additive([a, b])


def test_widening_lattice():
    # same-class widening, order-independent
    assert widen_type(pa.int32(), pa.int64()) == pa.int64()
    assert widen_type(pa.int64(), pa.int8()) == pa.int64()
    assert widen_type(pa.uint8(), pa.uint32()) == pa.uint32()
    assert widen_type(pa.float32(), pa.float64()) == pa.float64()
    # mixed sign → next signed width holding both
    assert widen_type(pa.uint8(), pa.int8()) == pa.int16()
    assert widen_type(pa.uint32(), pa.int32()) == pa.int64()
    assert widen_type(pa.uint64(), pa.int64()) is None  # no lossless home
    # int → smallest float whose mantissa is exact
    assert widen_type(pa.int16(), pa.float32()) == pa.float32()
    assert widen_type(pa.int32(), pa.float32()) == pa.float64()
    assert widen_type(pa.int64(), pa.float64()) is None  # lossy
    # nested
    assert widen_type(pa.list_(pa.int32()), pa.list_(pa.int64())) == pa.list_(pa.int64())
    s1 = pa.struct([("a", pa.int32())])
    s2 = pa.struct([("a", pa.int64()), ("b", pa.string())])
    assert widen_type(s1, s2) == pa.struct([("a", pa.int64()), ("b", pa.string())])
    # non-numeric conflicts stay rejected
    assert widen_type(pa.string(), pa.int64()) is None
    assert widen_type(pa.list_(pa.string()), pa.list_(pa.int64())) is None


def test_unify_widens_and_conform_casts():
    a = pa.schema([("x", pa.int32()), ("t", pa.list_(pa.int32()))])
    b = pa.schema([("x", pa.int64()), ("t", pa.list_(pa.int64())), ("y", pa.string())])
    u = unify_additive([a, b])
    assert u.field("x").type == pa.int64()
    assert u.field("t").type == pa.list_(pa.int64())
    t = conform(pa.table({"x": pa.array([1, 2], pa.int32()),
                          "t": pa.array([[1], [2, 3]], pa.list_(pa.int32()))}), u)
    assert t.schema == u
    assert t.column("x").to_pylist() == [1, 2]
    assert t.column("y").null_count == 2


def test_pipeline_widens_type_mid_stream(tmp_path, tmp_lake):
    """A shard that widens payload types (n_tok int32→int64, tokens
    list<int32>→list<int64>) applies cleanly: the committed state
    carries the widened schema and the exact serial-replay values."""
    from rookray.gen import GenConfig, final_state, write_shards
    from rookray.pipeline import CDCConfig, LakeTable

    cfg = GenConfig(n_docs=20, n_events=300)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=3)
    lake = LakeTable(tmp_lake, CDCConfig(num_partitions=2))
    lake.apply(meta["files"][:2])

    wide = {"n_tok": pa.int64(), "tokens": pa.list_(pa.int64())}
    tbl = pq.read_table(meta["files"][2])
    for col in ("before", "after"):
        st = tbl.column(col).combine_chunks()
        target = pa.struct([
            pa.field(f.name, wide.get(f.name, f.type)) for f in st.type
        ])
        tbl = tbl.set_column(tbl.column_names.index(col), col, st.cast(target))
    p = str(tmp_path / "wide.parquet")
    pq.write_table(tbl, p)
    # re-present the prior shard alongside (the tail's overlap protocol:
    # the tx spanning the shard boundary needs both halves to close)
    lake.apply([meta["files"][1], p])

    st = lake.state_table()
    assert st.schema.field("n_tok").type == pa.int64()
    assert st.schema.field("tokens").type == pa.list_(pa.int64())
    exp = final_state(cfg).to_pandas().sort_values("doc_id").reset_index(drop=True)
    got = st.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == list(exp["doc_id"])
    assert list(got["n_tok"]) == list(exp["n_tok"])
    assert [list(x) for x in got["tokens"]] == [list(x) for x in exp["tokens"]]


def test_dropped_column_tolerated_as_nulls():
    # a later shard missing a column is additive (nulls fill), not a drop
    a = pa.schema([("x", pa.int64()), ("y", pa.string())])
    b = pa.schema([("x", pa.int64())])
    u = unify_additive([a, b])
    t = conform(pa.table({"x": [1, 2]}), u)
    assert t.column("y").null_count == 2


def test_pipeline_rejects_type_change(tmp_path, tmp_lake):
    """A shard that changes a payload column's TYPE must be refused."""
    from rookray.gen import GenConfig, write_shards
    from rookray.pipeline import CDCConfig, LakeTable

    cfg = GenConfig(n_docs=10, n_events=100)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=2)
    lake = LakeTable(tmp_lake, CDCConfig(num_partitions=2))
    lake.apply(meta["files"])

    # craft a shard whose after.n_tok became a string
    tbl = pq.read_table(meta["files"][0])
    after = tbl.column("after").combine_chunks()
    fields = {f.name: after.field(f.name) for f in after.type}
    fields["n_tok"] = after.field("n_tok").cast(pa.string())
    bad_after = pa.StructArray.from_arrays(
        list(fields.values()), names=list(fields.keys()), mask=after.is_null()
    )
    bad = tbl.set_column(tbl.column_names.index("after"), "after", bad_after)
    bad = bad.set_column(
        bad.column_names.index("gtid"), "gtid",
        pa.array(np.arange(101, 101 + len(bad)), pa.int64()),
    )
    p = str(tmp_path / "bad.parquet")
    pq.write_table(bad, p)
    with pytest.raises(SchemaEvolutionError):
        lake.apply([p])


def test_delta_mode_widens_across_epochs(tmp_path, tmp_lake):
    """Delta (merge-on-read) mode: deltas written before and after a
    widening boundary mix int32/int64 widths; resolution and compaction
    must conform to the union instead of failing the concat."""
    from rookray.gen import GenConfig, final_state, write_shards
    from rookray.pipeline import CDCConfig, LakeTable

    cfg = GenConfig(n_docs=20, n_events=300)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=3)
    lake = LakeTable(tmp_lake, CDCConfig(num_partitions=2, write_mode="delta"))
    lake.apply(meta["files"][:1])
    lake.apply(meta["files"][:2])

    wide = {"n_tok": pa.int64(), "tokens": pa.list_(pa.int64())}
    tbl = pq.read_table(meta["files"][2])
    for col in ("before", "after"):
        st = tbl.column(col).combine_chunks()
        target = pa.struct([
            pa.field(f.name, wide.get(f.name, f.type)) for f in st.type
        ])
        tbl = tbl.set_column(tbl.column_names.index(col), col, st.cast(target))
    p = str(tmp_path / "wide.parquet")
    pq.write_table(tbl, p)
    lake.apply([meta["files"][1], p])

    exp = final_state(cfg).to_pandas().sort_values("doc_id").reset_index(drop=True)

    def check(st):
        assert st.schema.field("n_tok").type == pa.int64()
        got = st.to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert list(got["doc_id"]) == list(exp["doc_id"])
        assert list(got["n_tok"]) == list(exp["n_tok"])

    check(lake.state_table())          # merge-on-read across the boundary
    assert lake.compact()["compacted"] > 0
    check(lake.state_table())          # compacted bases carry the wide type


def test_derive_hook_skip_and_remove(tmp_path):
    """F7 interceptor semantics through derive_fn: SKIP drops rows from
    the index, REMOVE turns an upsert into a purge
    (DefaultRowsMutationIndexer.java:130-144)."""
    import pyarrow.compute as pc
    from rookray.gen import GenConfig, final_state, write_shards
    from rookray.pipeline import CDCConfig
    from rookray.schema import OP_DELETE
    from rookray.targets import DerivedIndexTarget
    from rookray.targets.derived import default_derive

    cfg = GenConfig(n_docs=30, n_events=300)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=2)
    exp = final_state(cfg).to_pandas()

    # decisions key on doc_id (stable across versions — a
    # source-keyed SKIP would leave stale prior versions indexed,
    # which is Hibernate's actual SKIP but awkward to assert)
    def bucket(out: pa.Table) -> np.ndarray:
        ids = out.column("doc_id").to_pandas()
        return ids.str.slice(-8).astype(int).to_numpy() % 5

    def hook(flat: pa.Table) -> pa.Table:
        out = default_derive(flat)
        if len(out) == 0:
            return out
        b = bucket(out)
        out = out.filter(pa.array(b != 0))  # SKIP bucket 0: never indexed
        b = b[b != 0]
        op = pc.if_else(pa.array(b == 1),   # REMOVE bucket 1: purge
                        pa.scalar(OP_DELETE, pa.int8()), out.column("op"))
        return out.set_column(out.column_names.index("op"), "op", op)

    t = DerivedIndexTarget(str(tmp_path / "d"), derive_fn=hook,
                           config=CDCConfig(num_partitions=4))
    t.apply(meta["files"])
    st = t.state_table().to_pandas()
    got = set(st["doc_id"])
    want = {d for d in exp["doc_id"] if int(d[-8:]) % 5 not in (0, 1)}
    assert got == want


def test_gc_removes_stale_state_files(tmp_path, tmp_lake):
    import os
    from rookray.gen import GenConfig, write_shards
    from rookray.pipeline import CDCConfig, LakeTable
    from rookray.sink import gc_uncommitted

    cfg = GenConfig(n_docs=20, n_events=200)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=4)
    lake = LakeTable(tmp_lake, CDCConfig(num_partitions=2))
    for i in range(4):
        lake.apply(meta["files"][i:i + 1])
    state_dir = os.path.join(tmp_lake, "state")
    before = len(os.listdir(state_dir))
    removed = gc_uncommitted(tmp_lake, keep_epochs=1)
    assert removed > 0
    assert len(os.listdir(state_dir)) == before - removed
    # table still reads fine
    assert len(lake.state_table()) > 0


def test_hash_determinism_across_processes():
    code = (
        "import pyarrow as pa; from rookray.util import hash_strings; "
        "print(hash_strings(pa.array(['a','bc','','doc-123'])).tolist())"
    )
    outs = {
        subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd="/root/repo",
                       env={"PYTHONHASHSEED": str(seed), "PATH": "/usr/bin:/bin",
                            "HOME": "/root"}).stdout
        for seed in (0, 1)
    }
    assert len(outs) == 1 and next(iter(outs)).strip()


def test_column_rename_mapping_mid_stream(tmp_path, tmp_lake):
    """Upstream column renames (n_tok→tok_count, source→src) map back
    to the canonical names via CDCConfig.column_renames — shards from
    before and after the rename unify and the state matches the serial
    oracle.  Renaming the merge key is rejected."""
    from rookray.gen import GenConfig, final_state, write_shards
    from rookray.pipeline import CDCConfig, LakeTable

    cfg = GenConfig(n_docs=20, n_events=300)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=3)
    ren = (("tok_count", "n_tok"), ("src", "source"))
    lake = LakeTable(tmp_lake, CDCConfig(num_partitions=2,
                                         column_renames=ren))
    lake.apply(meta["files"][:2])  # canonical-named shards: rename no-ops

    # craft a shard whose payload fields carry the NEW upstream names
    tbl = pq.read_table(meta["files"][2])
    back = {"n_tok": "tok_count", "source": "src"}
    for col in ("before", "after"):
        st = tbl.column(col).combine_chunks()
        renamed = pa.StructArray.from_arrays(
            [st.field(i) for i in range(st.type.num_fields)],
            names=[back.get(f.name, f.name) for f in st.type],
            mask=st.is_null())
        tbl = tbl.set_column(tbl.column_names.index(col), col, renamed)
    p = str(tmp_path / "renamed.parquet")
    pq.write_table(tbl, p)
    lake.apply([meta["files"][1], p])

    got = lake.state_table().to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = final_state(cfg).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(got.columns) == list(exp.columns)  # canonical names kept
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["n_tok"].tolist() == exp["n_tok"].tolist()
    assert got["source"].tolist() == exp["source"].tolist()

    bad = LakeTable(str(tmp_path / "bad"),
                    CDCConfig(num_partitions=2,
                              column_renames=(("doc_id", "id"),)))
    with pytest.raises(ValueError, match="doc_id"):
        bad.apply([p])
