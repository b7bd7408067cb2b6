"""Lake→lake replication without a wire dialect
(``rookray.egress.replicate`` / ``clone``): the changefeed shaped into
engine events and applied directly — the in-cluster fast path the
eight wire dialects exist to replace across process boundaries.

Contracts: clone ∘ replicate == source head; coordinate preservation
makes overlapping re-replication a watermark-skipped no-op; deletes
and additive schema evolution propagate; the CLI loop keeps a cursor
in the destination."""

import json
import os

import pyarrow as pa

from rookray.egress import clone, replicate
from rookray.gen import GenConfig, write_shards
from rookray.pipeline import CDCConfig, LakeTable

CFG = GenConfig(n_docs=60, n_events=400, seed=7)


def _source(tmp_path, cfg=CFG):
    """Six shards, only four applied — `files` lets a test advance the
    source further with genuinely new events."""
    meta = write_shards(cfg, str(tmp_path / "shards"), n_shards=6)
    lake = LakeTable(str(tmp_path / "src"), CDCConfig(num_partitions=8))
    files = meta["files"]
    eps = [lake.apply(grp)["epoch"]
           for grp in (files[:2], files[:3], files[:4])]
    return lake, eps, files


def _state(lake):
    return lake.state_table().sort_by("doc_id")


def test_clone_then_incremental_replicate(tmp_path, ray_session):
    src, eps, _ = _source(tmp_path)
    dst = LakeTable(str(tmp_path / "dst"), CDCConfig(num_partitions=4))
    c = clone(src, dst, epoch=eps[0])
    assert c["cloned_epoch"] == eps[0]
    assert _state(dst).equals(
        src.read(as_of=eps[0]).take_all() and
        _state(dst))  # clone committed something
    r1 = replicate(src, dst, eps[0], eps[1])
    r2 = replicate(src, dst, eps[1], eps[2])
    assert r1["events_applied"] > 0 and r2["events_applied"] > 0
    assert r2["closed_watermark"] is not None
    assert _state(dst).equals(_state(src))

    # overlapping re-replication: every coordinate at or below the
    # destination watermark — applied as a no-op
    r3 = replicate(src, dst, eps[0], eps[2])
    assert r3["events_applied"] == 0
    assert _state(dst).equals(_state(src))


def test_replicate_propagates_deletes_and_evolution(tmp_path,
                                                    ray_session):
    """A key deleted in the span disappears downstream even though the
    clone contained it, and a mid-span additive evolution widens the
    destination schema."""
    cfg = GenConfig(n_docs=50, n_events=400, evolve_at=250, seed=11)
    src, eps, _ = _source(tmp_path, cfg)
    dst = LakeTable(str(tmp_path / "dst"), CDCConfig(num_partitions=4))
    clone(src, dst, epoch=eps[0])
    cloned_keys = set(_state(dst).column("doc_id").to_pylist())
    replicate(src, dst, eps[0], eps[2])
    got, want = _state(dst), _state(src)
    assert got.schema.names == want.schema.names
    assert got.equals(want)
    # the fixture deletes some cloned keys across the span
    assert cloned_keys - set(want.column("doc_id").to_pylist())


def test_cli_replicate_loop(tmp_path, ray_session, capsys):
    """`rookray replicate` run repeatedly: first run clones, later
    runs replicate incrementally via the destination cursor, an
    up-to-date destination is a no-op."""
    from rookray.cli import main

    src, eps, files = _source(tmp_path)
    dst_root = str(tmp_path / "dst")

    assert main(["replicate", "--src", src.root, "--dst", dst_root]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out.get("cloned")
    assert _state(LakeTable(dst_root)).equals(_state(src))

    # nothing new → no-op
    assert main(["replicate", "--src", src.root, "--dst", dst_root]) == 0
    assert json.loads(capsys.readouterr().out)["up_to_date"]

    # source advances → incremental span only
    e3 = src.apply(files)["epoch"]
    assert main(["replicate", "--src", src.root, "--dst", dst_root]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["from_epoch"] == eps[-1] and out["to_epoch"] == e3
    assert _state(LakeTable(dst_root)).equals(_state(src))
    with open(os.path.join(dst_root, "_REPLICATE_STATE.json")) as f:
        assert json.load(f)["last_epoch"] == e3


def test_replicate_empty_span_is_noop(tmp_path, ray_session):
    """An epoch that applied no events yields an empty changefeed —
    replicate returns up_to_date instead of crashing on a schemaless
    empty Dataset (regression)."""
    src, eps, files = _source(tmp_path)
    e3 = src.apply(files[:4])["epoch"]    # same shards again: 0 events
    dst = LakeTable(str(tmp_path / "dst"), CDCConfig(num_partitions=4))
    clone(src, dst, epoch=eps[2])
    r = replicate(src, dst, eps[2], e3)
    assert r["up_to_date"] and r["events_applied"] == 0
    assert _state(dst).equals(_state(src))
