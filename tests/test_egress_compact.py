"""Relay compaction — the Kafka log-cleaner analog for a relay
directory (``rookray.egress.compact_relay``).

Contract under test: replacing the accumulated dump history with one
snapshot generation (live keys at their original coordinates +
tombstones for dead keys at theirs) is INVISIBLE to every legal
consumer position — a fresh bootstrap reaches the same final state as
the full history, an up-to-date consumer skips everything, and dumps
published after the compaction keep composing through the manifest
floor.  Crash-safety: snapshot files are reachable only through
``_RELAY_MANIFEST.json``, whose single ``os.replace`` is the swap.
"""

import glob
import json
import os
import shutil

import pyarrow as pa
import pytest

from rookray import egress
from rookray.egress import RELAY_MANIFEST, compact_relay, relay_files
from rookray.gen import GenConfig, write_shards
from rookray.pipeline import CDCConfig, LakeTable
from rookray.wire import read_debezium

CFG = GenConfig(n_docs=60, n_events=400, seed=7)


def _source_lake(tmp_path, n_epochs=3):
    """Source lake committed over ``n_epochs`` epochs (the fixture
    stream mixes inserts, updates, and deletes — ~1/5 of the keys end
    dead, so tombstone handling is actually exercised)."""
    meta = write_shards(CFG, str(tmp_path / "shards"), n_shards=4)
    lake = LakeTable(str(tmp_path / "src"), CDCConfig(num_partitions=8))
    files = meta["files"]
    cuts = [files[:2], files[:3], files[:4]][:n_epochs]
    eps = [lake.apply(grp)["epoch"] for grp in cuts]
    return lake, eps


def _relay(lake, eps, out):
    for a, b in zip(eps, eps[1:]):
        egress.export_changefeed(lake, a, b, out)
    return out


def _snap_a(lake, epoch):
    payload = lake.payload_schema()
    rows = lake.read(as_of=epoch).take_all()
    return pa.Table.from_pylist(
        [{c: r.get(c) for c in payload.names} for r in rows],
        schema=pa.schema(list(payload)))


def _ingest(lake, eps, relay_dir, down_root, fmt="debezium"):
    """A fresh downstream: bootstrap from snapshot A, gulp the relay
    directory in one pass — the consumer every compaction property is
    stated against."""
    payload = lake.payload_schema()
    down = LakeTable(down_root, CDCConfig(num_partitions=4))
    down.bootstrap(_snap_a(lake, eps[0]), gtid_watermark=0)
    files = relay_files(relay_dir, fmt=fmt)
    if fmt == "avro":
        from rookray.wireavro import read_avro
        ds = read_avro(files, os.path.join(relay_dir, "registry.json"),
                       tx_topic=None, payload=payload)
    else:
        ds = read_debezium(files, tx_topic=None, payload=payload)
    down.apply(ds.materialize())
    return down


def _state(lake):
    return lake.state_table().sort_by("doc_id")


def test_fresh_bootstrap_equality_and_swap(tmp_path, ray_session):
    """Ingesting the compacted directory == ingesting the full history
    == the source head; the swap leaves only the manifested snapshot
    generation behind (history files gone, snap files manifest-only)."""
    lake, eps = _source_lake(tmp_path)
    relay = _relay(lake, eps, str(tmp_path / "relay"))
    full = str(tmp_path / "relay_full")
    shutil.copytree(relay, full)

    res = compact_relay(relay)
    assert res["tombstones"] > 0          # the fixture has dead keys
    assert res["live_rows"] > 0
    assert res["events"] == res["live_rows"] + res["tombstones"]
    assert res["generation"] == 0

    a = _state(_ingest(lake, eps, full, str(tmp_path / "d1")))
    b = _state(_ingest(lake, eps, relay, str(tmp_path / "d2")))
    src = _state(lake)
    assert a.equals(src)
    assert b.equals(src)

    # history replaced: no data-* files left, snapshot == manifest
    assert glob.glob(os.path.join(relay, "data-*.jsonl")) == []
    with open(os.path.join(relay, RELAY_MANIFEST)) as f:
        m = json.load(f)
    on_disk = {os.path.basename(p)
               for p in glob.glob(os.path.join(relay, "snap-*.jsonl"))}
    assert on_disk == set(m["files"])
    # one envelope per key across the whole generation; live rows are
    # Debezium snapshot READS (op=r), dead keys are deletes — nothing
    # else survives a compaction
    keys, ops = [], set()
    for p in relay_files(relay):
        for line in open(p):
            env = json.loads(line)["payload"]
            img = env["after"] or env["before"]
            keys.append(img["doc_id"])
            ops.add(env["op"])
    assert len(keys) == len(set(keys)) == res["events"]
    assert ops == {"r", "d"}


def test_composes_with_dumps_published_after(tmp_path, ray_session):
    """The relay keeps relaying after a compaction: a dump published
    afterwards rides alongside the snapshot generation (its file is
    above the manifest floor) and a fresh ingest of the whole
    directory reaches the new source head."""
    meta = write_shards(CFG, str(tmp_path / "shards"), n_shards=4)
    lake = LakeTable(str(tmp_path / "src"), CDCConfig(num_partitions=8))
    files = meta["files"]
    eps = [lake.apply(grp)["epoch"] for grp in (files[:2], files[:3])]
    relay = _relay(lake, eps, str(tmp_path / "relay"))

    compact_relay(relay)
    # source advances AFTER the compaction
    e3 = lake.apply(files[:4])["epoch"]
    egress.export_changefeed(lake, eps[-1], e3, relay)

    live = relay_files(relay)
    assert any("data-" in os.path.basename(p) for p in live)
    assert any("snap-" in os.path.basename(p) for p in live)
    down = _ingest(lake, eps, relay, str(tmp_path / "down"))
    assert _state(down).equals(_state(lake))


def test_up_to_date_consumer_skips_everything(tmp_path, ray_session):
    """A downstream already at the head watermark re-applies the
    compacted directory as a no-op: every snapshot coordinate is at or
    below its per-partition watermark."""
    lake, eps = _source_lake(tmp_path)
    relay = _relay(lake, eps, str(tmp_path / "relay"))
    down = _ingest(lake, eps, relay, str(tmp_path / "down"))
    before = _state(down)

    compact_relay(relay)
    payload = lake.payload_schema()
    ds = read_debezium(relay_files(relay), tx_topic=None,
                       payload=payload)
    down.apply(ds.materialize())
    assert _state(down).equals(before)


def test_recompaction_generations_and_tombstone_retention(
        tmp_path, ray_session):
    """Compact → publish → compact again: the second generation
    supersedes the first (old snap files GC'd, generation bumps),
    tombstones carry FORWARD across compactions until
    ``drop_tombstones_below`` retires them — Kafka's
    delete.retention analog."""
    meta = write_shards(CFG, str(tmp_path / "shards"), n_shards=4)
    lake = LakeTable(str(tmp_path / "src"), CDCConfig(num_partitions=8))
    files = meta["files"]
    eps = [lake.apply(grp)["epoch"] for grp in (files[:2], files[:3])]
    relay = _relay(lake, eps, str(tmp_path / "relay"))

    r0 = compact_relay(relay)
    e3 = lake.apply(files[:4])["epoch"]
    egress.export_changefeed(lake, eps[-1], e3, relay)

    r1 = compact_relay(relay)
    assert r1["generation"] == 1
    assert r1["floor"] >= r0["floor"]
    # first generation fully GC'd
    stems = {os.path.basename(p)
             for p in glob.glob(os.path.join(relay, "snap-*.jsonl"))}
    assert all(s.startswith("snap-000001-") for s in stems)
    down = _ingest(lake, eps + [e3], relay, str(tmp_path / "down"))
    assert _state(down).equals(_state(lake))

    # carried tombstones retire below the retention horizon: a third
    # compaction with the horizon above every coordinate keeps live
    # rows only.  After retention the directory serves FRESH consumers
    # exactly (nothing to retract); a consumer bootstrapped below the
    # floor would now miss the deletes — the documented re-bootstrap
    # horizon, same as Kafka past delete.retention.ms.
    r2 = compact_relay(relay,
                       drop_tombstones_below=r1["floor"] + 1)
    assert r2["tombstones"] == 0
    assert r2["live_rows"] == r1["live_rows"]
    payload = lake.payload_schema()
    fresh = LakeTable(str(tmp_path / "fresh"), CDCConfig(num_partitions=4))
    ds = read_debezium(relay_files(relay), tx_topic=None,
                       payload=payload)
    fresh.apply(ds.materialize())
    assert _state(fresh).equals(_state(lake))
    # and the below-floor consumer's divergence is EXACTLY the keys
    # whose tombstones were retired
    down2 = _ingest(lake, eps + [e3], relay, str(tmp_path / "down2"))
    extra = (set(_state(down2).column("doc_id").to_pylist())
             - set(_state(lake).column("doc_id").to_pylist()))
    assert len(extra) > 0  # the horizon rule is real, not vacuous


def test_crashed_staging_is_invisible_and_collected(tmp_path,
                                                    ray_session):
    """Snapshot files are reachable ONLY through the manifest: staging
    left behind by a crash (snap files, no manifest) never reaches a
    reader and the next compaction collects it."""
    lake, eps = _source_lake(tmp_path)
    relay = _relay(lake, eps, str(tmp_path / "relay"))
    n_data = len(relay_files(relay))

    orphan = os.path.join(relay, "snap-000000-0000000000000001-"
                                 "0000000000000002-deadbeef.jsonl")
    with open(orphan, "w") as f:
        f.write('{"payload": null}\n')
    # readers still see exactly the history
    assert len(relay_files(relay)) == n_data
    assert orphan not in relay_files(relay)

    res = compact_relay(relay)
    assert not os.path.exists(orphan)       # staging collected
    down = _ingest(lake, eps, relay, str(tmp_path / "down"))
    assert _state(down).equals(_state(lake))
    assert res["tombstones"] > 0


def test_no_tombstones_mode_fresh_bootstrap_only(tmp_path, ray_session):
    """keep_tombstones=False emits live state only — correct for a
    fresh consumer with no prior snapshot, and the documented-wrong
    choice for one bootstrapped below the floor."""
    lake, eps = _source_lake(tmp_path)
    relay = _relay(lake, eps, str(tmp_path / "relay"))
    res = compact_relay(relay, keep_tombstones=False)
    assert res["tombstones"] == 0

    payload = lake.payload_schema()
    down = LakeTable(str(tmp_path / "down"), CDCConfig(num_partitions=4))
    ds = read_debezium(relay_files(relay), tx_topic=None,
                       payload=payload)
    down.apply(ds.materialize())           # no snapshot-A bootstrap
    assert _state(down).equals(_state(lake))


def test_avro_relay_compaction(tmp_path, ray_session):
    """The same swap over the Confluent-Avro dialect: binary framing,
    registry reuse, manifest floor — fresh ingest equals the source."""
    lake, eps = _source_lake(tmp_path)
    relay = str(tmp_path / "relay")
    for a, b in zip(eps, eps[1:]):
        egress.export_changefeed(lake, a, b, relay, fmt="avro")

    res = compact_relay(relay, fmt="avro")
    assert res["tombstones"] > 0
    assert glob.glob(os.path.join(relay, "data-*.avrowire")) == []
    assert os.path.exists(os.path.join(relay, "registry.json"))
    down = _ingest(lake, eps, relay, str(tmp_path / "down"),
                   fmt="avro")
    assert _state(down).equals(_state(lake))


def test_compaction_across_schema_evolution(tmp_path, ray_session):
    """A relay whose dumps straddle an additive schema evolution
    compacts correctly: early-dump envelopes lack the evolved column
    (decodes as null), the snapshot generation restates every live row
    under the WIDE schema, and fresh ingest equals the evolved source
    head."""
    cfg = GenConfig(n_docs=50, n_events=400, evolve_at=150, seed=11)
    meta = write_shards(cfg, str(tmp_path / "shards"), n_shards=4)
    lake = LakeTable(str(tmp_path / "src"), CDCConfig(num_partitions=8))
    files = meta["files"]
    eps = [lake.apply(grp)["epoch"]
           for grp in (files[:2], files[:3], files[:4])]
    relay = _relay(lake, eps, str(tmp_path / "relay"))

    res = compact_relay(relay)
    assert res["events"] > 0
    down = _ingest(lake, eps, relay, str(tmp_path / "down"))
    got, want = _state(down), _state(lake)
    assert got.schema.names == want.schema.names  # evolved col present
    assert got.equals(want)


def test_shifted_dialects_refused(tmp_path, ray_session):
    """mongo/dynamo egress rides the 1-bit-shifted token space —
    re-exporting would shift shifted coordinates, so compaction
    refuses them loudly."""
    with pytest.raises(ValueError, match="shifted"):
        relay_files(str(tmp_path), fmt="mongo")
    with pytest.raises(ValueError, match="shifted"):
        compact_relay(str(tmp_path), fmt="dynamo")


def test_empty_relay_is_a_noop(tmp_path, ray_session):
    out = compact_relay(str(tmp_path / "nothing_here"))
    assert out["up_to_date"] and out["events"] == 0
    assert not os.path.exists(
        os.path.join(str(tmp_path / "nothing_here"), RELAY_MANIFEST))


def test_cli_relay_compact_then_wire(tmp_path, ray_session, capsys):
    """Operational loop: `rookray relay-compact` then `rookray wire`
    over the compacted directory — cmd_wire's manifest-aware
    enumeration picks up the snapshot generation the default glob
    would miss."""
    from rookray.cli import main

    lake, eps = _source_lake(tmp_path)
    relay = _relay(lake, eps, str(tmp_path / "relay"))

    assert main(["relay-compact", "--relay", relay]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["events"] == out["live_rows"] + out["tombstones"]

    down_root = str(tmp_path / "down")
    payload = lake.payload_schema()
    down = LakeTable(down_root, CDCConfig(num_partitions=4))
    down.bootstrap(_snap_a(lake, eps[0]), gtid_watermark=0)
    assert main(["wire", "--dump", relay, "--table", down_root]) == 0
    wired = json.loads(capsys.readouterr().out)
    assert wired["events_applied"] == out["events"]
    assert _state(LakeTable(down_root)).equals(_state(lake))


def test_cli_relay_loop_auto_compacts(tmp_path, ray_session, capsys):
    """The cron-style relay loop self-compacts: `rookray egress
    --compact-over N` folds the directory once N history events
    accumulate since the last compaction (Kafka's dirty-volume
    trigger), resets the dirty counter, and the loop keeps relaying —
    a fresh downstream ingest of the directory at any point equals
    the source head."""
    from rookray.cli import main

    meta = write_shards(CFG, str(tmp_path / "shards"), n_shards=4)
    lake = LakeTable(str(tmp_path / "src"), CDCConfig(num_partitions=8))
    files = meta["files"]
    relay = str(tmp_path / "relay")
    eps = [lake.apply(files[:2])["epoch"]]

    def egress_once():
        assert main(["egress", "--table", lake.root, "--out", relay,
                     "--compact-over", "10"]) == 0
        return json.loads(capsys.readouterr().out)

    # first run: cursorless → publishes head-1 → head (0→0 = no-op)
    r0 = egress_once()
    assert r0.get("up_to_date") or r0["events"] >= 0

    eps.append(lake.apply(files[:3])["epoch"])
    r1 = egress_once()                    # publishes 0→1
    eps.append(lake.apply(files[:4])["epoch"])
    r2 = egress_once()                    # publishes 1→2, trips trigger
    assert "compacted" in (r1 | r2), (r1, r2)
    trip = r2 if "compacted" in r2 else r1
    assert trip["compacted"]["events"] \
        == trip["compacted"]["live_rows"] + trip["compacted"]["tombstones"]
    assert os.path.exists(os.path.join(relay, RELAY_MANIFEST))
    with open(os.path.join(relay, "_EGRESS_STATE.json")) as f:
        st = json.load(f)
    assert st["dirty_events"] == 0        # trigger reset
    assert st["last_epoch"] == eps[-1]    # cursor still advances

    # the loop keeps composing after the compaction
    e3 = lake.apply(files)["epoch"]
    r3 = egress_once()
    assert "compacted" not in r3          # below the dirty threshold?
    # (r3 may re-trip on a busy stream — only the invariant matters)

    down = _ingest(lake, eps, relay, str(tmp_path / "down"))
    assert _state(down).equals(_state(lake))
