"""CLI entry points — the ``ray job submit`` surface.

North-rule operational shape: the engine runs as a Ray job on a fixed
multi-node cluster.  Usage (cluster):

    ray job submit --working-dir . -- \
        python -m rookray.cli ingest --shards /data/binlog --table /lake/sequences

Local sandbox (no cluster): the same command runs against
``ray.init(address="local")``.  This module is the only library-side
owner of a Ray session (guarded — it never re-inits a driver-provided
session, per the driver contract).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _ensure_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True,
                      logging_level="ERROR")
        addr = os.environ.get("RAY_ADDRESS", "local")
        if addr == "local":
            kwargs["address"] = "local"
            if num_cpus:
                kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)


def cmd_ingest(args) -> int:
    from rookray.pipeline import CDCConfig, LakeTable

    expect_fn = None
    if getattr(args, "expect", None):
        # dotted path "package.module:function" — the expectation must
        # live in an importable module (Ray workers unpickle it by
        # reference)
        import importlib
        mod, sep, fn = args.expect.partition(":")
        if not sep or not mod or not fn:
            print(json.dumps({"error": f"--expect must be MODULE:FN, "
                                       f"got {args.expect!r}"}))
            return 2
        try:
            expect_fn = getattr(importlib.import_module(mod), fn)
        except (ImportError, AttributeError) as e:
            print(json.dumps({"error": f"--expect {args.expect!r}: {e}"}))
            return 2

    _ensure_ray(args.num_cpus)
    shards = sorted(glob.glob(os.path.join(args.shards, args.pattern)))
    if not shards:
        print(json.dumps({"error": f"no shards matching {args.pattern} in {args.shards}"}))
        return 1
    if args.prune:
        from rookray.source import shards_above
        lake_probe = LakeTable(args.table)
        m = lake_probe.manifest()
        floor = (m or {}).get("closed_watermark")
        if floor is not None:
            shards = shards_above(shards, floor)
        if not shards:
            print(json.dumps({"noop": True,
                              "reason": "all shards at or below committed watermark"}))
            return 0
    cfg = CDCConfig(
        table=args.source_table,
        num_partitions=args.partitions,
        salt=args.salt,
        ignored_tables=frozenset(args.ignore_table or ()),
        ignored_server_ids=frozenset(args.ignore_server or ()),
        tx_atomic=not args.no_tx_atomic,
        expect_fn=expect_fn,
    )
    lake = LakeTable(args.table, cfg)
    res = lake.apply(shards)
    print(json.dumps(res))
    return 0


def cmd_tail(args) -> int:
    from rookray.pipeline import CDCConfig, LakeTable
    from rookray.source import LiveTailer, ShardTailer

    _ensure_ray(args.num_cpus)
    lake = LakeTable(args.table, CDCConfig(num_partitions=args.partitions))
    if args.live:
        # background I/O-thread mode (BinaryLogClient.connect analog);
        # the driver thread just waits for the duration / interrupt
        import time
        tailer = LiveTailer(args.shards, lake, pattern=args.pattern,
                            poll_interval_s=args.interval)
        tailer.connect(timeout_s=args.connect_timeout)
        try:
            deadline = (time.monotonic() + args.duration
                        if args.duration else None)
            while tailer.is_connected():
                if deadline is not None and time.monotonic() >= deadline:
                    break
                time.sleep(min(args.interval, 1.0))
        except KeyboardInterrupt:
            pass
        finally:
            tailer.disconnect()
        print(json.dumps({"epochs": tailer.results,
                          "errors": [repr(e) for e in tailer.errors]}))
        return 1 if tailer.errors else 0
    tailer = ShardTailer(args.shards, lake, pattern=args.pattern)
    tailer.connect(timeout_s=args.connect_timeout)
    try:
        results = tailer.run(poll_interval_s=args.interval,
                             max_polls=args.max_polls)
    finally:
        tailer.disconnect()
    print(json.dumps({"epochs": results}))
    return 0


def cmd_tail_socket(args) -> int:
    """Network ingest: drain a live TCP change stream (length-framed
    Arrow IPC, the binlog-connection analog) into the lake as ONE
    epoch.  Backpressure is physical: the read task pulls the socket
    only as the executor consumes, so a fast producer blocks in
    send() on TCP flow control.  The stream ends at the producer's
    EOF frame; exactly-once comes from the same watermark-skip apply,
    so reconnect-and-rerun after a crash is safe."""
    from rookray.pipeline import CDCConfig, LakeTable
    from rookray.source import stream_events_socket

    _ensure_ray(args.num_cpus)
    lake = LakeTable(args.table, CDCConfig(num_partitions=args.partitions))
    ds = stream_events_socket(args.host, args.port,
                              connect_timeout_s=args.connect_timeout)
    res = lake.apply(ds.materialize())
    # a directory tail re-presents the boundary shard next epoch; a
    # drained socket CANNOT — if the producer ended mid-transaction,
    # the held-back events exist nowhere to replay from, so say so
    if (res.get("max_gtid_seen") or -1) > (res.get("closed_watermark")
                                           or -1):
        res["warning"] = (
            "stream ended mid-transaction: events above "
            f"gtid {res['closed_watermark']} were held back and the "
            "drained socket cannot re-present them — the producer must "
            "resend the open transaction on reconnect")
    print(json.dumps(res))
    return 1 if "warning" in res else 0


def _route_targets(args) -> "dict | None":
    """Parse repeatable ``--route TABLE=LAKE_PATH`` specs into
    ``{table: LakeTable}`` (None without --route; raises SystemExit-
    style error dict via ValueError for a malformed spec)."""
    from rookray.pipeline import CDCConfig, LakeTable

    if not getattr(args, "route", None):
        return None
    targets = {}
    for spec in args.route:
        tbl, _, path = spec.partition("=")
        if not tbl or not path:
            raise ValueError(f"--route {spec!r} is not TABLE=LAKE_PATH")
        targets[tbl] = LakeTable(path, CDCConfig(
            num_partitions=args.partitions, table=tbl))
    return targets


def _prune_floor(lakes) -> "int | None":
    """Checkpoint-pruning floor across ingest targets — delegates to
    ``Fanout.manifest()``'s composite watermark (MIN over children; a
    dump file is skippable only when EVERY target already committed
    it; any target without a manifest needs everything, so no
    pruning)."""
    from rookray.targets.fanout import Fanout
    m = Fanout({str(i): lk for i, lk in enumerate(lakes)}).manifest()
    wm = (m or {}).get("closed_watermark")
    return None if wm is None else int(wm)


def _committed_union(lakes) -> "pa.Schema | None":
    """The UNION of the routed lakes' committed payload schemas under
    the additive-evolution policy — decode must see every routed
    table's columns; conflicting types raise rather than letting
    whichever lake happens to be first win."""
    from rookray.schema import unify_additive
    schemas = []
    for lk in lakes:
        try:
            s = lk.payload_schema()
        except Exception:
            continue
        if s is not None and len(s):
            schemas.append(s)
    if not schemas:
        return None
    return unify_additive(schemas)


def _apply_single_or_routed(args, ds, lake, route_targets,
                            n_all: int, n_kept: int,
                            extra: dict) -> int:
    """Shared tail of every dump-ingest command: apply the decoded
    Dataset to ONE lake, or fan it out to the routed lakes behind a
    cross-table consistent commit."""
    if route_targets:
        from rookray.targets.fanout import AtomicFanout
        fan = AtomicFanout(route_targets, args.fanout_root
                           or os.path.join(args.table, "_fanout"))
        results = fan.apply(ds.materialize())
        out = dict(extra, files=n_kept, files_skipped=n_all - n_kept,
                   targets={k: (v["result"] if v["ok"]
                                else {"error": v["error"]})
                            for k, v in results.items()})
        print(json.dumps(out))
        return 0 if all(v["ok"] for v in results.values()) else 1
    res = lake.apply(ds.materialize())
    res.update(extra)
    res["files"] = n_kept
    res["files_skipped"] = n_all - n_kept
    print(json.dumps(res))
    return 0


def cmd_wire(args) -> int:
    """Public wire-format ingest: decode a recorded CDC JSON dump —
    Debezium envelopes (data topic + optional transaction topic),
    Maxwell records, Canal flat messages, or MongoDB change-stream
    events — into the lake as one
    exactly-once epoch: the day-one path for a user whose change
    stream is a connector's/daemon's output, not rookray-shaped
    shards."""
    from rookray.pipeline import CDCConfig, LakeTable
    from rookray.wire import infer_payload, read_debezium

    _ensure_ray(args.num_cpus)
    pattern = args.pattern
    if pattern == "data-*.jsonl" and args.format == "avro":
        pattern = "data-*.avrowire"
    elif pattern == "data-*.jsonl" and args.format != "debezium":
        pattern = f"{args.format}-*.jsonl"
    paths = sorted(glob.glob(os.path.join(args.dump, pattern)))
    if args.format in ("debezium", "avro") and os.path.exists(
            os.path.join(args.dump, "_RELAY_MANIFEST.json")):
        # a compacted relay directory: the manifest IS the file set
        # (snapshot generation + dumps above the compaction floor);
        # a raw glob would miss the snap-* files and could mix a
        # mid-swap snapshot with the history it replaced
        from rookray.egress import relay_files
        paths = relay_files(args.dump, fmt=args.format)
    if not paths:
        print(json.dumps({"error": f"no files match {pattern!r} "
                                   f"under {args.dump}"}))
        return 1
    # routed targets resolve FIRST: in route mode the pruning floor
    # and the committed schema come from the ROUTED lakes, never from
    # the fanout-root placeholder at --table
    try:
        route_targets = _route_targets(args)
    except ValueError as e:
        print(json.dumps({"error": str(e)}))
        return 1
    lakes = (list(route_targets.values()) if route_targets
             else [LakeTable(args.table,
                             CDCConfig(num_partitions=args.partitions))])
    committed = _committed_union(lakes)
    # checkpoint resume: skip whole dump files at or below every
    # target's committed watermark after a head-of-file read (the
    # binlog/pgwal coordinate-pruning analog for the JSON formats)
    n_all = len(paths)
    floor = _prune_floor(lakes)
    registry = None
    if args.format == "avro":
        registry = args.registry or os.path.join(args.dump, "registry.json")
    if floor is not None:
        if args.format == "avro":
            from rookray.wireavro import avro_files_above
            paths = avro_files_above(paths, floor, registry)
        elif args.format == "mongo":
            from rookray.wiremongo import mongo_files_above
            paths = mongo_files_above(paths, floor)
        elif args.format == "dynamo":
            from rookray.wiredynamo import dynamo_files_above
            paths = dynamo_files_above(paths, floor)
        else:
            from rookray.wirejson import jsonl_files_above
            paths = jsonl_files_above(paths, floor, args.format)
    if not paths:
        out = {"events_applied": 0, "files": 0, "files_skipped": n_all,
               "format": args.format}
        if route_targets:
            out["targets"] = {t: "up_to_date" for t in route_targets}
        print(json.dumps(out))
        return 0
    lake = lakes[0]
    if args.format == "debezium":
        tx_topic = None
        if args.tx_topic:
            tx_topic = [args.tx_topic]
        else:
            auto = sorted(glob.glob(os.path.join(args.dump, "tx-*.jsonl")))
            tx_topic = auto or None
        # an existing lake's committed schema beats dump inference
        # (inference types never-seen-non-null columns as string)
        ds = read_debezium(paths, tx_topic=tx_topic,
                           payload=committed or infer_payload(paths))
    elif args.format == "avro":
        from rookray.wireavro import infer_payload_avro, read_avro
        tx_topic = [args.tx_topic] if args.tx_topic else (
            sorted(glob.glob(os.path.join(args.dump, "tx-*.avrowire")))
            or None)
        # the registry snapshot IS the catalog — no dump inference
        # needed unless the lake already committed a (wider) schema
        ds = read_avro(paths, registry, tx_topic=tx_topic,
                       payload=committed or infer_payload_avro(registry))
    elif args.format == "mongo":
        from rookray.wiremongo import infer_payload_mongo, read_mongo
        # the change stream emits committed ops only — every event is a
        # singleton transaction, no tx topic / side index exists
        ds = read_mongo(paths,
                        payload=committed or infer_payload_mongo(paths))
        tx_topic = None
    elif args.format == "dynamo":
        from rookray.wiredynamo import infer_payload_dynamo, read_dynamo
        # streams deliver committed item writes with no transaction
        # grouping — every record is a singleton, no tx topic exists
        ds = read_dynamo(paths,
                         payload=committed or infer_payload_dynamo(paths))
        tx_topic = None
    else:
        from rookray.wirejson import (infer_payload_canal,
                                      infer_payload_maxwell, read_canal,
                                      read_maxwell)
        # fresh lake: infer from the dump itself — Maxwell from its
        # typed JSON images, Canal from its own mysqlType/pkNames
        # metadata (values are text; lists stay string unless an
        # existing lake supplies a typed payload)
        payload = committed or (infer_payload_maxwell(paths)
                                if args.format == "maxwell"
                                else infer_payload_canal(paths))
        if args.format == "maxwell":
            ds = read_maxwell(paths, payload=payload,
                              single_parse=not args.two_pass)
        else:
            ds = read_canal(paths, payload=payload)
        tx_topic = None
    extra = {"format": args.format}
    if not route_targets:
        extra["tx_topic"] = bool(tx_topic)
    return _apply_single_or_routed(args, ds, lake, route_targets,
                                   n_all, len(paths), extra)


def cmd_binlog(args) -> int:
    """Binary wire-format ingest: decode recorded MySQL binlog-v4
    files into the lake as one exactly-once epoch.  TABLE_MAP events
    carry no column NAMES, so values map positionally against a
    payload schema: an existing lake supplies its committed schema,
    a fresh lake uses the engine default (append-only evolution means
    payload ⊇ any older file's column list)."""
    from rookray.binlog import binlog_files_above, read_binlog
    from rookray.pipeline import CDCConfig, LakeTable
    from rookray.schema import SEQ_SCHEMA_V2

    _ensure_ray(args.num_cpus)
    paths = sorted(glob.glob(os.path.join(args.dump, args.pattern)))
    if not paths:
        print(json.dumps({"error": f"no files match {args.pattern!r} "
                                   f"under {args.dump}"}))
        return 1
    try:
        route_targets = _route_targets(args)
    except ValueError as e:
        print(json.dumps({"error": str(e)}))
        return 1
    lakes = (list(route_targets.values()) if route_targets
             else [LakeTable(args.table,
                             CDCConfig(num_partitions=args.partitions))])
    payload = _committed_union(lakes) or SEQ_SCHEMA_V2
    # coordinate-checkpoint resume: skip files entirely at or below
    # every target's committed watermark without opening them
    n_all = len(paths)
    floor = _prune_floor(lakes)
    if floor is not None:
        paths = binlog_files_above(paths, floor)
    if not paths:
        out = {"events_applied": 0, "files": 0, "files_skipped": n_all}
        if route_targets:
            out["targets"] = {t: "up_to_date" for t in route_targets}
        print(json.dumps(out))
        return 0
    ds = read_binlog(paths, payload=payload,
                     allow_partial_tail=args.allow_partial_tail)
    return _apply_single_or_routed(args, ds, lakes[0], route_targets,
                                   n_all, len(paths), {})


def cmd_pgwal(args) -> int:
    """PostgreSQL wire-format ingest: decode recorded pgoutput
    logical-replication stream segments into the lake as one
    exactly-once epoch.  Relation messages carry column names, so
    values map by NAME against the lake's committed payload schema
    (fresh lakes use the engine default)."""
    from rookray.pgoutput import pgwal_files_above, read_pgwal
    from rookray.pipeline import CDCConfig, LakeTable
    from rookray.schema import SEQ_SCHEMA_V2

    _ensure_ray(args.num_cpus)
    paths = sorted(glob.glob(os.path.join(args.dump, args.pattern)))
    if not paths:
        print(json.dumps({"error": f"no files match {args.pattern!r} "
                                   f"under {args.dump}"}))
        return 1
    try:
        route_targets = _route_targets(args)
    except ValueError as e:
        print(json.dumps({"error": str(e)}))
        return 1
    lakes = (list(route_targets.values()) if route_targets
             else [LakeTable(args.table,
                             CDCConfig(num_partitions=args.partitions))])
    payload = _committed_union(lakes) or SEQ_SCHEMA_V2
    # LSN-checkpoint resume: skip whole segments at or below every
    # target's committed watermark after a header-only read
    n_all = len(paths)
    floor = _prune_floor(lakes)
    if floor is not None:
        paths = pgwal_files_above(paths, floor)
    if not paths:
        out = {"events_applied": 0, "files": 0, "files_skipped": n_all}
        if route_targets:
            out["targets"] = {t: "up_to_date" for t in route_targets}
        print(json.dumps(out))
        return 0
    ds = read_pgwal(paths, payload=payload,
                    allow_partial_tail=args.allow_partial_tail)
    return _apply_single_or_routed(args, ds, lakes[0], route_targets,
                                   n_all, len(paths), {})


def cmd_snapshot(args) -> int:
    """Debezium's *initial snapshot* analog, outbound: publish the
    lake's committed state (default: head) as a dump of snapshot-read
    envelopes (op ``r``), one per live key at its original winning
    coordinate — the bootstrap half of wire-based replication.  When
    the out directory carries no egress cursor yet, one is seeded at
    the snapshot epoch so a following ``egress`` run relays
    incrementally from exactly this point."""
    from rookray.egress import export_snapshot
    from rookray.pipeline import LakeTable

    _ensure_ray(args.num_cpus)
    lake = LakeTable(args.table)
    if not lake.manifest():
        print(json.dumps({"error": "empty table — nothing to snapshot"}))
        return 1
    res = export_snapshot(lake, args.out, fmt=args.format,
                          epoch=args.epoch)
    res["data_files"] = len(res["data_files"])
    state_path = os.path.join(args.out, "_EGRESS_STATE.json")
    if not os.path.exists(state_path):
        with open(state_path + ".tmp", "w") as f:
            json.dump({"last_epoch": int(res["snapshot_epoch"]),
                       "dirty_events": 0}, f)
        os.replace(state_path + ".tmp", state_path)
        res["cursor_seeded"] = True
    print(json.dumps(res))
    return 0


def cmd_egress(args) -> int:
    """CDC egress (the relay direction): publish the changefeed
    between two committed snapshots as a Debezium-JSON dump any
    downstream consumer — including another rookray lake — can
    ingest.  The out directory carries its own publish cursor
    (``_EGRESS_STATE.json``), so repeated runs relay INCREMENTALLY:
    each run publishes (last-published → head) and advances the
    cursor after the dump lands — the cron-style relay loop.
    Explicit ``--from-epoch``/``--to-epoch`` override the cursor
    (and do not advance it)."""
    from rookray.egress import export_changefeed
    from rookray.pipeline import LakeTable

    _ensure_ray(args.num_cpus)
    lake = LakeTable(args.table)
    m = lake.manifest()
    if not m:
        print(json.dumps({"error": "empty table — nothing to egress"}))
        return 1
    head = int(m["epoch"])
    state_path = os.path.join(args.out, "_EGRESS_STATE.json")
    cursor = None
    if os.path.exists(state_path):
        with open(state_path) as f:
            cursor = int(json.load(f)["last_epoch"])
    explicit = args.from_epoch is not None or args.to_epoch is not None
    to_epoch = head if args.to_epoch is None else args.to_epoch
    if args.from_epoch is not None:
        from_epoch = args.from_epoch
    elif cursor is not None:
        from_epoch = cursor
    else:
        from_epoch = max(0, to_epoch - 1)
    if from_epoch == to_epoch and not explicit:
        print(json.dumps({"events": 0, "data_files": 0,
                          "from_epoch": from_epoch,
                          "to_epoch": to_epoch, "up_to_date": True}))
        return 0
    if from_epoch > to_epoch:
        # the cursor outran the lake (restored/recreated/purged lake,
        # or an out-dir reused across lakes) — report, don't traceback
        print(json.dumps({"error": f"publish cursor at epoch "
                                   f"{from_epoch} is ahead of the "
                                   f"target epoch {to_epoch} — pass "
                                   "--from-epoch to re-anchor the "
                                   "relay"}))
        return 1
    try:
        res = export_changefeed(lake, from_epoch, to_epoch, args.out,
                                fmt=args.format)
    except ValueError as e:
        # e.g. a cursor epoch behind the lake's GC horizon
        print(json.dumps({"error": f"cannot diff epochs {from_epoch}"
                                   f"→{to_epoch}: {e}; pass "
                                   "--from-epoch to re-anchor"}))
        return 1
    res["from_epoch"], res["to_epoch"] = from_epoch, to_epoch
    res["data_files"] = len(res["data_files"])
    dirty = int(res.get("events", 0))
    if os.path.exists(state_path):
        with open(state_path) as f:
            dirty += int(json.load(f).get("dirty_events", 0))
    if not explicit:
        # advance the cursor only after the dump fully landed; the
        # dirty counter (history events published since the last
        # compaction) drives the --compact-over trigger below
        with open(state_path + ".tmp", "w") as f:
            json.dump({"last_epoch": to_epoch,
                       "dirty_events": dirty}, f)
        os.replace(state_path + ".tmp", state_path)
    if (args.compact_over is not None
            and args.format in ("debezium", "avro")
            and dirty >= args.compact_over):
        # the Kafka log-cleaner trigger (min dirty volume): fold the
        # accumulated history into one snapshot generation so a fresh
        # downstream bootstrap stays O(state) however long the relay
        # loop runs
        from rookray.egress import compact_relay
        c = compact_relay(args.out, fmt=args.format,
                          num_partitions=args.partitions)
        c.pop("workdir", None)
        c.pop("files", None)
        res["compacted"] = c
        if not explicit:
            with open(state_path + ".tmp", "w") as f:
                json.dump({"last_epoch": to_epoch,
                           "dirty_events": 0}, f)
            os.replace(state_path + ".tmp", state_path)
    print(json.dumps(res))
    return 0


def cmd_repartition(args) -> int:
    from rookray.pipeline import LakeTable

    _ensure_ray(args.num_cpus)
    print(json.dumps(LakeTable(args.table).repartition(args.partitions)))
    return 0


def cmd_gc(args) -> int:
    from rookray.sink import gc_uncommitted

    removed = gc_uncommitted(args.table, keep_epochs=args.keep_epochs)
    print(json.dumps({"removed": removed}))
    return 0


def cmd_compact(args) -> int:
    from rookray.pipeline import LakeTable

    _ensure_ray(args.num_cpus)
    print(json.dumps(LakeTable(args.table)
                     .compact(min_deltas=args.min_deltas)))
    return 0


def cmd_replicate(args) -> int:
    """Lake→lake mirror, no wire dialect: first run against an empty
    destination CLONES the source head (distributed bootstrap at the
    matching watermark); subsequent runs replicate the changefeed
    incrementally, with the cursor (last replicated source epoch) kept
    in the destination's ``_REPLICATE_STATE.json``.  Re-running an
    overlapping span is free — the destination watermark skips it."""
    from rookray.egress import clone, replicate
    from rookray.pipeline import LakeTable

    _ensure_ray(args.num_cpus)
    src = LakeTable(args.src)
    m = src.manifest()
    if not m:
        print(json.dumps({"error": "empty source — nothing to replicate"}))
        return 1
    head = int(m["epoch"])
    dst = LakeTable(args.dst)
    state_path = os.path.join(args.dst, "_REPLICATE_STATE.json")
    if not dst.manifest():
        res = clone(src, dst)
        res["cloned"] = True
        cursor = head
    else:
        if args.from_epoch is not None:
            cursor = args.from_epoch
        elif os.path.exists(state_path):
            with open(state_path) as f:
                cursor = int(json.load(f)["last_epoch"])
        else:
            print(json.dumps({"error": "destination has no replicate "
                              "cursor — pass --from-epoch to anchor"}))
            return 1
        to_epoch = head if args.to_epoch is None else args.to_epoch
        if cursor >= to_epoch:
            print(json.dumps({"from_epoch": cursor, "to_epoch": to_epoch,
                              "up_to_date": True}))
            return 0
        res = replicate(src, dst, cursor, to_epoch)
        cursor = to_epoch
    with open(state_path + ".tmp", "w") as f:
        json.dump({"last_epoch": cursor}, f)
    os.replace(state_path + ".tmp", state_path)
    print(json.dumps(res))
    return 0


def cmd_relay_compact(args) -> int:
    """Compact a relay out directory in place (the Kafka log-cleaner
    analog): the accumulated dump history is replaced by one snapshot
    generation — every live key as a single envelope at its original
    coordinate, plus tombstones for dead keys — swapped in atomically
    via ``_RELAY_MANIFEST.json``.  Fresh downstream bootstrap cost
    drops from O(history) to O(state); dumps published afterwards
    compose with the snapshot through the manifest floor."""
    from rookray.egress import compact_relay

    _ensure_ray(args.num_cpus)
    try:
        res = compact_relay(
            args.relay, fmt=args.format,
            num_partitions=args.partitions,
            keep_tombstones=not args.no_tombstones,
            drop_tombstones_below=args.drop_tombstones_below)
    except ValueError as e:
        print(json.dumps({"error": str(e)}))
        return 1
    res.pop("workdir", None)
    print(json.dumps(res))
    return 0


def cmd_show(args) -> int:
    from rookray.pipeline import LakeTable

    m = LakeTable(args.table).manifest()
    print(json.dumps(m, indent=1) if m else json.dumps({"error": "no manifest"}))
    return 0


def cmd_bootstrap(args) -> int:
    """Initial-load handoff: register a consistent snapshot as epoch 0
    at the given gtid watermark; subsequent ingest resumes from it."""
    import ray.data

    from rookray.pipeline import CDCConfig, LakeTable

    _ensure_ray(args.num_cpus)
    lake = LakeTable(args.table, CDCConfig(num_partitions=args.partitions))
    ds = ray.data.read_parquet(args.snapshot)
    print(json.dumps(lake.bootstrap(ds, gtid_watermark=args.watermark)))
    return 0


def cmd_purge(args) -> int:
    """Right-to-be-forgotten: physically expunge keys from state AND
    history files (total vacuum of unreferenced state)."""
    from rookray.pipeline import LakeTable

    _ensure_ray(args.num_cpus)
    keys = ([k for k in args.keys.split(",") if k] if args.keys
            else [ln.strip() for ln in open(args.keys_file)
                  if ln.strip()])
    print(json.dumps(LakeTable(args.table).purge(keys)))
    return 0


def cmd_fti(args) -> int:
    """Inverted-index operations: refresh (build or incremental),
    term/phrase search, BM25 ranked search."""
    from rookray.pipeline import LakeTable
    from rookray.targets.fti import InvertedIndex

    lake = LakeTable(args.table)
    index = InvertedIndex(lake, name=args.name,
                          num_partitions=args.partitions)
    if args.action == "refresh":
        _ensure_ray(args.num_cpus)
        print(json.dumps(index.refresh()))
    elif args.action == "search":
        terms = [int(t) for t in args.terms.split(",") if t]
        print(json.dumps({"docs": index.search_all(terms)}))
    elif args.action == "phrase":
        terms = [int(t) for t in args.terms.split(",") if t]
        print(json.dumps({"docs": index.search_phrase(terms)}))
    elif args.action == "bm25":
        terms = [int(t) for t in args.terms.split(",") if t]
        out = index.search_bm25(terms, k=args.k)
        print(json.dumps({"ranked": out[["doc_id", "rank"]]
                          .to_dict("records")}))
    elif args.action == "vacuum":
        print(json.dumps({"files_removed": index.vacuum()}))
    return 0


def cmd_metrics(args) -> int:
    """Operational snapshot from the committed manifest — no Ray
    session, no data files opened."""
    from rookray.pipeline import LakeTable

    print(json.dumps(LakeTable(args.table).metrics(), indent=1))
    return 0


def cmd_vec(args) -> int:
    """Vector-index operations: refresh (build or incremental),
    multiprobe ANN search, space reclaim."""
    from rookray.pipeline import LakeTable
    from rookray.targets.vector import VectorIndex

    lake = LakeTable(args.table)
    index = VectorIndex(lake, name=args.name,
                        num_partitions=args.partitions)
    if args.action == "refresh":
        _ensure_ray(args.num_cpus)
        print(json.dumps(index.refresh()))
    elif args.action == "search":
        tokens = [int(t) for t in args.tokens.split(",") if t]
        out = index.search(tokens, k=args.k, probe=args.probe)
        print(json.dumps({"ranked": out.to_dict("records")}))
    elif args.action == "vacuum":
        print(json.dumps({"files_removed": index.vacuum()}))
    return 0


def cmd_quarantine(args) -> int:
    """Expectations audit surface: dump quarantined rows (gtid-deduped)
    or reclaim the audit files after remediation."""
    from rookray.pipeline import LakeTable

    lake = LakeTable(args.table)
    if args.clear:
        print(json.dumps({"files_removed": lake.quarantine_clear()}))
        return 0
    t = lake.quarantine_table()
    for row in t.to_pylist():
        print(json.dumps(row, default=str))
    return 0


def cmd_restore(args) -> int:
    from rookray.pipeline import LakeTable

    print(json.dumps(LakeTable(args.table).restore(args.epoch)))
    return 0


def cmd_lookup(args) -> int:
    """Point reads: only the hash-matching partitions are touched and a
    key filter pushes into every parquet read (no Ray session needed —
    a probe is served from the committed files directly)."""
    from rookray.pipeline import LakeTable

    t = LakeTable(args.table).lookup(args.key, as_of=args.as_of)
    for row in t.to_pylist():
        print(json.dumps(row, default=str))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="rookray")
    sub = p.add_subparsers(dest="cmd", required=True)

    ing = sub.add_parser("ingest", help="apply one epoch of change shards")
    ing.add_argument("--shards", required=True)
    ing.add_argument("--table", required=True)
    ing.add_argument("--pattern", default="events-*.parquet")
    ing.add_argument("--source-table", default="sequences")
    # default aligned with CDCConfig (a mismatch between the two entry
    # points used to re-partition an existing table silently; the
    # manifest's committed value now wins regardless — see
    # LakeTable._num_partitions)
    from rookray.pipeline import CDCConfig as _C
    ing.add_argument("--partitions", type=int, default=_C.num_partitions)
    ing.add_argument("--salt", type=int, default=0)
    ing.add_argument("--ignore-table", action="append")
    ing.add_argument("--ignore-server", action="append", type=int)
    ing.add_argument("--no-tx-atomic", action="store_true")
    ing.add_argument("--prune", action="store_true",
                     help="skip shards entirely below the committed watermark "
                          "(footer statistics only)")
    ing.add_argument("--expect", default=None, metavar="MODULE:FN",
                     help="row expectation (dotted path to an importable "
                          "valid-mask function); violating rows divert to "
                          "<table>/quarantine/")
    ing.add_argument("--num-cpus", type=int, default=None)
    ing.set_defaults(fn=cmd_ingest)

    tail = sub.add_parser("tail", help="tail a shard directory (binlog-tail mode)")
    tail.add_argument("--shards", required=True)
    tail.add_argument("--table", required=True)
    tail.add_argument("--pattern", default="events-*.parquet")
    tail.add_argument("--partitions", type=int, default=_C.num_partitions)
    tail.add_argument("--interval", type=float, default=1.0)
    tail.add_argument("--max-polls", type=int, default=None)
    tail.add_argument("--live", action="store_true",
                      help="tail on a background thread (LiveTailer)")
    tail.add_argument("--duration", type=float, default=None,
                      help="with --live: stop after this many seconds")
    tail.add_argument("--connect-timeout", type=float, default=None)
    tail.add_argument("--num-cpus", type=int, default=None)
    tail.set_defaults(fn=cmd_tail)

    ts = sub.add_parser("tail-socket", help="ingest a live TCP change "
                                            "stream (framed Arrow IPC)")
    ts.add_argument("--host", required=True)
    ts.add_argument("--port", type=int, required=True)
    ts.add_argument("--table", required=True)
    from rookray.pipeline import CDCConfig as _C3
    ts.add_argument("--partitions", type=int, default=_C3.num_partitions)
    ts.add_argument("--connect-timeout", type=float, default=10.0)
    ts.add_argument("--num-cpus", type=int, default=None)
    ts.set_defaults(fn=cmd_tail_socket)

    wr = sub.add_parser("wire", help="decode a recorded CDC dump "
                        "(Debezium-JSON / Maxwell / Canal / Confluent-"
                        "Avro / MongoDB-change-stream / DynamoDB-"
                        "Streams wire formats) into the lake as one "
                        "exactly-once epoch")
    wr.add_argument("--dump", required=True,
                    help="directory holding the data-topic files")
    wr.add_argument("--format", default="debezium",
                    choices=["debezium", "maxwell", "canal", "avro",
                             "mongo", "dynamo"],
                    help="envelope flavor (default: debezium); 'avro' = "
                         "Confluent schema-registry framing; 'dynamo' "
                         "= DynamoDB Streams records")
    wr.add_argument("--pattern", default="data-*.jsonl",
                    help="defaults to <format>-*.jsonl for maxwell/"
                         "canal/mongo/dynamo, data-*.avrowire for avro")
    wr.add_argument("--tx-topic", default=None,
                    help="transaction-topic file (default: tx-* under "
                         "--dump if present, else a counting pass)")
    wr.add_argument("--registry", default=None,
                    help="avro only: schema-registry snapshot JSON "
                         "(default: <dump>/registry.json)")
    wr.add_argument("--table", required=True,
                    help="lake path (single-table mode), or the fanout "
                         "root's parent with --route")
    wr.add_argument("--route", action="append", default=None,
                    metavar="TABLE=LAKE_PATH",
                    help="multi-table routed ingest: maintain one lake "
                         "per routed table behind a cross-table "
                         "consistent commit (repeatable)")
    wr.add_argument("--fanout-root", default=None,
                    help="coordinator-manifest dir for --route "
                         "(default: <table>/_fanout)")
    wr.add_argument("--two-pass", action="store_true",
                    help="maxwell only: re-parse with a projected "
                         "schema for the tx-index pass instead of "
                         "materializing the parsed dump (for dumps "
                         "too large to hold in the object store)")
    wr.add_argument("--partitions", type=int, default=16)
    wr.add_argument("--num-cpus", type=int, default=None)
    wr.set_defaults(fn=cmd_wire)

    bl = sub.add_parser("binlog", help="decode recorded MySQL binlog-v4 "
                        "files (binary wire format) into the lake as one "
                        "exactly-once epoch")
    bl.add_argument("--dump", required=True,
                    help="directory holding the binlog files")
    bl.add_argument("--pattern", default="*.[0-9]*")
    bl.add_argument("--table", required=True)
    bl.add_argument("--partitions", type=int, default=16)
    bl.add_argument("--allow-partial-tail", action="store_true",
                    help="tolerate a torn trailing transaction (live-"
                         "tail copy); default raises on truncation")
    bl.add_argument("--route", action="append", default=None,
                    metavar="TABLE=LAKE_PATH",
                    help="multi-table routed ingest behind a cross-"
                         "table consistent commit (repeatable); "
                         "--table then only anchors the fanout root")
    bl.add_argument("--fanout-root", default=None,
                    help="coordinator-manifest dir for --route "
                         "(default: <table>/_fanout)")
    bl.add_argument("--num-cpus", type=int, default=None)
    bl.set_defaults(fn=cmd_binlog)

    pg = sub.add_parser("pgwal", help="decode recorded PostgreSQL "
                        "pgoutput logical-replication segments into "
                        "the lake as one exactly-once epoch")
    pg.add_argument("--dump", required=True,
                    help="directory holding the pgwal segment files")
    pg.add_argument("--pattern", default="pgwal-*.bin")
    pg.add_argument("--table", required=True)
    pg.add_argument("--partitions", type=int, default=16)
    pg.add_argument("--allow-partial-tail", action="store_true",
                    help="tolerate a torn trailing transaction (live-"
                         "tail copy); default raises on truncation")
    pg.add_argument("--route", action="append", default=None,
                    metavar="TABLE=LAKE_PATH",
                    help="multi-table routed ingest behind a cross-"
                         "table consistent commit (repeatable); "
                         "--table then only anchors the fanout root")
    pg.add_argument("--fanout-root", default=None,
                    help="coordinator-manifest dir for --route "
                         "(default: <table>/_fanout)")
    pg.add_argument("--num-cpus", type=int, default=None)
    pg.set_defaults(fn=cmd_pgwal)

    sn = sub.add_parser("snapshot", help="publish the lake's committed "
                        "state as a wire-format snapshot dump (op=r "
                        "envelopes — the initial-snapshot bootstrap "
                        "half of wire replication)")
    sn.add_argument("--table", required=True)
    sn.add_argument("--out", required=True,
                    help="output directory for the dump files")
    sn.add_argument("--format", default="debezium",
                    choices=["debezium", "avro", "mongo", "dynamo",
                             "binlog", "pgoutput", "maxwell", "canal"])
    sn.add_argument("--epoch", type=int, default=None,
                    help="snapshot epoch (default: head)")
    sn.add_argument("--num-cpus", type=int, default=None)
    sn.set_defaults(fn=cmd_snapshot)

    eg = sub.add_parser("egress", help="publish the changefeed between "
                        "two committed snapshots as a Debezium dump "
                        "(CDC relay out of the lake)")
    eg.add_argument("--table", required=True)
    eg.add_argument("--out", required=True,
                    help="output directory for the dump files")
    eg.add_argument("--format", default="debezium",
                    choices=["debezium", "avro", "mongo", "dynamo",
                             "binlog", "pgoutput", "maxwell", "canal"],
                    help="envelope serialization (default: debezium "
                         "JSON-lines; avro = Confluent schema-registry "
                         "framing + registry.json; mongo/dynamo = "
                         "change-stream / DynamoDB-Streams records in "
                         "the shifted token space; binlog = genuine "
                         "MySQL binlog-v4 binary, forward-only "
                         "positional coordinates; pgoutput = recorded "
                         "PostgreSQL logical segments, coordinate-"
                         "preserving)")
    eg.add_argument("--from-epoch", type=int, default=None,
                    help="base snapshot (default: head - 1)")
    eg.add_argument("--to-epoch", type=int, default=None,
                    help="target snapshot (default: head)")
    eg.add_argument("--compact-over", type=int, default=None,
                    help="auto-compact the relay directory once this "
                         "many history events accumulate since the "
                         "last compaction (Kafka's log-cleaner dirty "
                         "trigger; debezium/avro only)")
    eg.add_argument("--partitions", type=int, default=16,
                    help="scratch-lake partition count for the "
                         "auto-compaction LWW fold")
    eg.add_argument("--num-cpus", type=int, default=None)
    eg.set_defaults(fn=cmd_egress)

    rc = sub.add_parser("relay-compact", help="compact an accumulated "
                        "relay directory in place: replace the dump "
                        "history with one live-state snapshot "
                        "generation plus tombstones (the Kafka "
                        "log-cleaner analog)")
    rc.add_argument("--relay", required=True,
                    help="the relay out directory to compact")
    rc.add_argument("--format", default="debezium",
                    choices=["debezium", "avro"],
                    help="the directory's egress dialect (mongo/"
                         "dynamo ride a shifted coordinate space "
                         "that does not survive re-export)")
    rc.add_argument("--partitions", type=int, default=16,
                    help="scratch-lake partition count for the LWW fold")
    rc.add_argument("--no-tombstones", action="store_true",
                    help="emit live state only (fresh-bootstrap "
                         "consumers never need tombstones)")
    rc.add_argument("--drop-tombstones-below", type=int, default=None,
                    help="retention horizon: drop carried tombstones "
                         "whose delete coordinate is below this "
                         "(Kafka's delete.retention analog)")
    rc.add_argument("--num-cpus", type=int, default=None)
    rc.set_defaults(fn=cmd_relay_compact)

    rp = sub.add_parser("replicate", help="lake→lake mirror without a "
                        "wire dialect: clone on first run, then "
                        "incremental changefeed replication with a "
                        "cursor in the destination")
    rp.add_argument("--src", required=True, help="source lake root")
    rp.add_argument("--dst", required=True, help="destination lake root")
    rp.add_argument("--from-epoch", type=int, default=None,
                    help="override the cursor (does not advance it "
                         "past --to-epoch)")
    rp.add_argument("--to-epoch", type=int, default=None,
                    help="replicate up to this source epoch "
                         "(default: head)")
    rp.add_argument("--num-cpus", type=int, default=None)
    rp.set_defaults(fn=cmd_replicate)

    rep = sub.add_parser("repartition",
                         help="re-shard committed state to a new partition count")
    rep.add_argument("--table", required=True)
    rep.add_argument("--partitions", type=int, required=True)
    rep.add_argument("--num-cpus", type=int, default=None)
    rep.set_defaults(fn=cmd_repartition)

    gc = sub.add_parser("gc", help="remove unreferenced old state files")
    gc.add_argument("--table", required=True)
    gc.add_argument("--keep-epochs", type=int, default=2)
    gc.set_defaults(fn=cmd_gc)

    bs = sub.add_parser("bootstrap", help="register a consistent snapshot "
                                          "as epoch 0 (initial-load handoff)")
    bs.add_argument("--table", required=True)
    bs.add_argument("--snapshot", required=True,
                    help="parquet file/dir of payload rows")
    bs.add_argument("--watermark", type=int, required=True,
                    help="gtid the snapshot is consistent as of")
    from rookray.pipeline import CDCConfig as _C2
    bs.add_argument("--partitions", type=int, default=_C2.num_partitions)
    bs.add_argument("--num-cpus", type=int, default=None)
    bs.set_defaults(fn=cmd_bootstrap)

    ft = sub.add_parser("fti", help="inverted index: refresh / "
                                    "search / phrase / bm25")
    ft.add_argument("action",
                    choices=["refresh", "search", "phrase", "bm25",
                             "vacuum"])
    ft.add_argument("--table", required=True)
    ft.add_argument("--name", default="fti")
    ft.add_argument("--partitions", type=int, default=16)
    ft.add_argument("--terms", default="",
                    help="comma-separated token ids")
    ft.add_argument("--k", type=int, default=10)
    ft.add_argument("--num-cpus", type=int, default=None)
    ft.set_defaults(fn=cmd_fti)

    vx = sub.add_parser("vec", help="vector index: refresh / search "
                                    "(multiprobe ANN) / vacuum")
    vx.add_argument("action", choices=["refresh", "search", "vacuum"])
    vx.add_argument("--table", required=True)
    vx.add_argument("--name", default="vec")
    vx.add_argument("--partitions", type=int, default=8)
    vx.add_argument("--tokens", default="",
                    help="comma-separated query token ids")
    vx.add_argument("--k", type=int, default=10)
    vx.add_argument("--probe", default="hamming1",
                    choices=["cell", "hamming1", "all"])
    vx.add_argument("--num-cpus", type=int, default=None)
    vx.set_defaults(fn=cmd_vec)

    mt = sub.add_parser("metrics", help="operational snapshot from the "
                                        "committed manifest (no Ray)")
    mt.add_argument("--table", required=True)
    mt.set_defaults(fn=cmd_metrics)

    qr = sub.add_parser("quarantine", help="dump or clear the "
                                           "expectations audit table")
    qr.add_argument("--table", required=True)
    qr.add_argument("--clear", action="store_true",
                    help="reclaim all audit files (after remediation)")
    qr.set_defaults(fn=cmd_quarantine)

    pg = sub.add_parser("purge", help="physically expunge keys from "
                                      "state and history (GDPR)")
    pg.add_argument("--table", required=True)
    pg.add_argument("--keys", default=None,
                    help="comma-separated doc ids")
    pg.add_argument("--keys-file", default=None,
                    help="file with one doc id per line")
    pg.add_argument("--num-cpus", type=int, default=None)
    pg.set_defaults(fn=cmd_purge)

    rs = sub.add_parser("restore", help="roll the table back to a "
                                        "committed epoch (metadata-only)")
    rs.add_argument("--table", required=True)
    rs.add_argument("--epoch", type=int, required=True)
    rs.set_defaults(fn=cmd_restore)

    lu = sub.add_parser("lookup", help="point-read keys from the "
                                       "committed state (partition-pruned)")
    lu.add_argument("--table", required=True)
    lu.add_argument("--key", action="append", required=True,
                    help="doc_id to probe (repeatable)")
    lu.add_argument("--as-of", type=int, default=None,
                    help="historical epoch (time travel)")
    lu.set_defaults(fn=cmd_lookup)

    show = sub.add_parser("show", help="print a lake table's manifest")
    show.add_argument("--table", required=True)
    show.set_defaults(fn=cmd_show)

    comp = sub.add_parser("compact", help="fold delta files into fresh bases")
    comp.add_argument("--table", required=True)
    comp.add_argument("--min-deltas", type=int, default=1,
                      help="size-tiered: only partitions with >= this "
                           "many delta files rewrite")
    comp.add_argument("--num-cpus", type=int, default=None)
    comp.set_defaults(fn=cmd_compact)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
