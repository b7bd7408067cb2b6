"""Column-level CDC (patch events): field-wise LWW semantics.

The hard cases: interleaved patches to DIFFERENT fields must both
survive regardless of replay order; a delete + reinsert resets every
field (patches from the previous life must not leak through); a patch
to a key that was never born creates nothing; deriving patches from a
full-image stream and folding them reproduces the row-level replay
byte-for-byte.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from rookray.gen import GenConfig, final_state, generate_events
from rookray.ops.patch import OP_PATCH, derive_patches, fold_patches
from rookray.schema import OP_DELETE, OP_INSERT

FIELDS = ["tokens", "n_tok", "source"]


def _ev(gtid, op, key, mask=0, tokens=None, n_tok=None, source=None):
    return {"gtid": gtid, "op": op, "key": key, "patch_mask": mask,
            "tokens": tokens, "n_tok": n_tok, "source": source}


def _fold(rows, num_partitions=4):
    schema = pa.schema([
        ("gtid", pa.int64()), ("op", pa.int8()), ("key", pa.string()),
        ("patch_mask", pa.int64()), ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()), ("source", pa.string())])
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=schema))
    df = fold_patches(ds, FIELDS, num_partitions=num_partitions).to_pandas()
    if len(df) == 0:
        return df
    return df.sort_values("key").reset_index(drop=True)


def test_patch_fields_merge_independently_any_order():
    """Two patches to different fields both survive; replay order
    (shuffled gtid delivery) cannot change the outcome."""
    full = (1 << len(FIELDS)) - 1
    rows = [
        _ev(1, OP_INSERT, "a", full, [1, 2], 2, "s0"),
        _ev(2, OP_PATCH, "a", 0b001, tokens=[9]),        # tokens only
        _ev(3, OP_PATCH, "a", 0b100, source="s9"),       # source only
    ]
    for perm in ([0, 1, 2], [2, 1, 0], [1, 2, 0]):
        got = _fold([rows[i] for i in perm])
        assert got.loc[0, "tokens"].tolist() == [9]
        assert got.loc[0, "n_tok"] == 2        # untouched field survives
        assert got.loc[0, "source"] == "s9"


def test_patch_rebirth_resets_and_dead_patches_ignored():
    full = (1 << len(FIELDS)) - 1
    rows = [
        _ev(1, OP_INSERT, "a", full, [1], 1, "s0"),
        _ev(2, OP_PATCH, "a", 0b100, source="old-life"),
        _ev(3, OP_DELETE, "a"),
        _ev(4, OP_INSERT, "a", full, [5, 5], 2, "s1"),   # rebirth
    ]
    got = _fold(rows)
    # the previous life's patch must NOT leak through the rebirth
    assert got.loc[0, "source"] == "s1"
    assert got.loc[0, "tokens"].tolist() == [5, 5]

    # deleted and never reborn → gone entirely
    got = _fold(rows[:3])
    assert len(got) == 0

    # a patch never creates a row
    got = _fold([_ev(1, OP_PATCH, "ghost", 0b001, tokens=[1])])
    assert len(got) == 0


def test_patch_explicit_null_vs_absent():
    """A mask-presented field set to NULL wins (it was shipped); an
    absent field (mask-cleared) leaves the prior value alone."""
    full = (1 << len(FIELDS)) - 1
    rows = [
        _ev(1, OP_INSERT, "a", full, [1], 1, "s0"),
        _ev(2, OP_PATCH, "a", 0b100, source=None),  # shipped NULL
    ]
    got = _fold(rows)
    assert got.loc[0, "source"] is None or pd.isna(got.loc[0, "source"])
    assert got.loc[0, "n_tok"] == 1  # absent field untouched


def test_derived_patches_reproduce_full_image_replay():
    """derive → fold over a generated stream equals the row-level
    serial-replay oracle, at two partition counts (exchange
    invariance)."""
    # near-uniform token-list lengths trip Ray's automatic
    # TensorArray cast on to_pandas; lists must stay lists here
    ctx = rd.DataContext.get_current()
    saved = ctx.enable_tensor_extension_casting
    ctx.enable_tensor_extension_casting = False
    try:
        _run_derived_patches_check()
    finally:
        ctx.enable_tensor_extension_casting = saved


def _run_derived_patches_check():
    cfg = GenConfig(n_docs=60, n_events=1200)
    tbl = generate_events(cfg)
    import pyarrow.compute as pc
    keep = pc.and_(pc.equal(tbl.column("table"), "sequences"),
                   pc.not_equal(tbl.column("server_id"), 999))
    events = rd.from_arrow(tbl.filter(keep)).repartition(6)
    fields = ["doc_id", "tokens", "n_tok", "source"]
    patches = derive_patches(events, fields)

    # MINIMAL row images really are minimal: patches present fewer
    # fields than full updates would
    pm = patches.to_pandas()
    partial = pm[pm["op"] == OP_PATCH]["patch_mask"]
    assert len(partial) and (partial < (1 << len(fields)) - 1).any()

    want = final_state(cfg).to_pandas().sort_values("doc_id")
    for P in (4, 16):
        got = (fold_patches(derive_patches(events, fields), fields,
                            num_partitions=P)
               .to_pandas().sort_values("key").reset_index(drop=True))
        assert got["key"].tolist() == want["doc_id"].tolist()
        assert got["n_tok"].astype(np.int64).tolist() \
            == want["n_tok"].astype(np.int64).tolist()
        assert got["source"].tolist() == want["source"].tolist()
        for gv, wv in zip(got["tokens"], want["tokens"]):
            assert np.asarray(gv).tolist() == np.asarray(wv).tolist()
