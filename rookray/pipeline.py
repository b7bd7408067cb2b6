"""End-to-end CDC pipeline: change shards → normalized flat events →
hash partitions → LWW merge → two-phase exactly-once commit.

The Ray-Data restatement of rook's source→listener loop
(SURVEY.md §3.4).  Where rook is one thread applying events serially
(MySQLReplicationStream.java:161-179), this pipeline is::

    read_parquet(shards)                       # parallel shard reads
      → map_batches(PartitionStage)            # normalize + filter +
        (stateless, Arrow, zero-copy)          #   partition + combiner
      → [optional salted pre-merge]            # hot-key handling
      → groupby("part").map_groups(MergeWrite) # per-partition LWW merge
                                               #   against prior state,
                                               #   staged parquet write
      → driver: commit manifest                # the atomicity point

Correctness contract (tested against the serial oracle): final state is
byte-identical to single-threaded replay, because per-key LWW argmax is
order-insensitive once all events of a key meet in one partition
(SURVEY.md §7.0).
"""

from __future__ import annotations

import json
import os
import threading as _threading
from dataclasses import dataclass, field
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from rookray import merge, sink, txn
from rookray.events import NormalizeConfig, normalize_batch, payload_schema_of, unified_payload
from rookray.lineage import PartitionLineage, lineage_for
from rookray.schema import SEQ_SCHEMA, unify_additive
from rookray.util import partition_of


@dataclass(frozen=True)
class CDCConfig:
    """Engine configuration — the analog of rook's stream knobs
    (setIgnoredTables / setIgnoredHostsIds / setGroupEventsByTX,
    MySQLReplicationStream.java:82-96)."""

    table: str = "sequences"
    ignored_tables: frozenset = frozenset()
    ignored_server_ids: frozenset = frozenset()
    num_partitions: int = 32
    salt: int = 0  # >0 → hot-key salting with this many sub-buckets
    tx_atomic: bool = True  # hold back incomplete transactions
    batch_size: int = 8192  # measured sweet spot (bench: 8k > 32k > default)
    #: "actors" = per-partition merge-shard actor pool (streaming route,
    #: no all-to-all sort barrier — measured 2-3x faster and the
    #: north-star architecture); "groupby" = sort-based shuffle (used
    #: automatically when salting is on or input is a Dataset of batches
    #: needing a full shuffle)
    merge_strategy: str = "actors"
    merge_actors: int = 64  # cap on merge-shard actors (parts map n:1)
    actor_buffer_rows: int = 500_000  # pre-merge threshold per partition
    #: 32k-128k is the stable zone: ≥256k batches trigger worker heap
    #: churn (repeat runs degrade 2-5x); smaller batches also shrink
    #: shuffle partials less (combiner collapses less per batch)
    router_batch_size: int = 65536
    #: "rewrite" = each epoch rewrites a touched partition's full state
    #: file (fast reads, write amplification ~ state size per epoch);
    #: "delta" = each epoch writes only its merged delta incl.
    #: tombstones (Hudi-MOR-style: O(epoch) writes at 100 TB state,
    #: merge-on-read + periodic compact()).  Delta requires the
    #: external-shuffle merge path (actors strategy, no salt).
    write_mode: str = "rewrite"
    #: where shuffle partials live.  None → $ROOKRAY_SHUFFLE_DIR, else
    #: /dev/shm when present (single node), else the lake root.  On a
    #: multi-node cluster point this at the shared storage the lake
    #: itself lives on (or node-local disk + reducer affinity).
    shuffle_dir: str | None = None
    #: column-rename mapping (source name → canonical name), the Delta
    #: column-mapping analog for upstream schema renames: payload
    #: struct fields are renamed ZERO-COPY at the read boundary, so
    #: shards written before and after a rename unify (rook breaks on
    #: any schema change, MySQLReplicationStream.java:212).  Renaming
    #: the merge key (doc_id) is rejected.  Tuple of (old, new) pairs
    #: (frozen dataclass — pass dict.items() as a tuple).
    column_renames: tuple = ()
    #: ingest expectation (the Delta-Live-Tables "expectations" analog;
    #: rook has no row validation — a poison row kills the listener,
    #: ReplicationEventExceptionHandler.java:21-23).  A module-level
    #: function mapping the FLAT normalized event batch to a boolean
    #: valid-mask; invalid rows never reach the merge — they divert to
    #: ``<root>/quarantine/`` parquet with content-deterministic names
    #: (task retries overwrite, never duplicate) and are readable via
    #: ``LakeTable.quarantine_table()`` for audit/replay-after-fix.
    expect_fn: object = None


class PartitionStage:
    """Stateless map_batches stage: normalize → filter by watermark →
    assign partition → intra-batch combiner (keep-last per key).

    The combiner is the scale lever: it collapses per-key duplicates
    BEFORE the shuffle, so a hot key contributes at most one row per
    batch to the all-to-all exchange (pre-aggregation per
    SURVEY.md §7.3; rook's IndexingLog dedup analog)."""

    def __init__(self, ncfg: NormalizeConfig, num_partitions: int,
                 part_watermarks: np.ndarray, closed_wm: int,
                 transform=None, expect_fn=None, quarantine_dir=None,
                 purged_keys=None):
        self.ncfg = ncfg
        self.P = num_partitions
        self.wms = part_watermarks  # int64[P], -1 when partition unseen
        self.closed_wm = closed_wm
        self.transform = transform  # derived-target row transform (F7 hook)
        self.expect_fn = expect_fn  # row expectation (valid-mask)
        self.quarantine_dir = quarantine_dir
        # GDPR tombstones: keys a purge swept from the quarantine must
        # never be re-quarantined by a replay (small by nature — the
        # set of right-to-be-forgotten requests)
        self.purged_keys = sorted(purged_keys or ())

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, part = self.flat_part(batch)
        if part is None:
            return self._empty(flat)
        flat = flat.append_column("part", pa.array(part, type=pa.int32()))
        return merge.keep_last(flat)

    def flat_part(self, batch: pa.Table) -> "tuple[pa.Table, np.ndarray | None]":
        """normalize → watermark filter → expectation gate, WITHOUT the
        final combiner/gather: returns the flat events plus their
        partition ids (``None`` when no rows survive), so ShuffleWriter
        can fuse the keep-last winner selection with its own
        partition-order reorder into one payload gather."""
        flat = normalize_batch(batch, self.ncfg)
        if len(flat) == 0:
            return flat, None
        if self.transform is not None:
            # derived path: the transform may REMAP doc_id (container
            # cascade), so the watermark filter below must run on the
            # POST-transform keys or duplicate replay re-applies rows
            # whose derived partition already advanced.  (expect_fn is
            # rejected alongside a transform in apply() — the gate's
            # placement guarantees don't compose with key remapping.)
            flat = self.transform(flat)
            if len(flat) == 0:
                return flat, None
        part = partition_of(flat.column("doc_id"), self.P)
        gtid = flat.column("gtid").to_numpy(zero_copy_only=False)
        keep = (gtid <= self.closed_wm) & (gtid > self.wms[part])
        if not keep.all():
            flat = flat.filter(pa.array(keep))
            part = part[keep]
        if len(flat) == 0:
            return flat, None
        # expectation gate AFTER the watermark filter: only rows this
        # epoch actually applies can quarantine, so re-presenting old
        # shards (boundary re-present, restore remediation, duplicate
        # replay) can not re-write audit bytes a purge swept — and the
        # one residual hole (a partition whose EVERY row quarantined,
        # leaving its watermark unadvanced) is closed by the purged-key
        # tombstones below
        if self.expect_fn is not None:
            mask = np.asarray(self.expect_fn(flat), dtype=bool)
            if not mask.all():
                bad = flat.filter(pa.array(~mask))
                if self.purged_keys:
                    unpurged = pc.invert(pc.is_in(
                        bad.column("doc_id"),
                        value_set=pa.array(self.purged_keys,
                                           type=pa.string())))
                    bad = bad.filter(unpurged)
                if len(bad):
                    # content-deterministic name: a retried task
                    # overwrites its own quarantine file instead of
                    # duplicating it; distinct batchings of the same
                    # rows dedupe by gtid at read (quarantine_table)
                    from rookray.util import stable_table_hash
                    name = (f"q-{stable_table_hash(bad, sort_key='gtid')}"
                            f".parquet")
                    sink.atomic_write_parquet(
                        bad, os.path.join(self.quarantine_dir, name))
                flat = flat.filter(pa.array(mask))
                part = part[mask]
                if len(flat) == 0:
                    return flat, None
        return flat, part

    @staticmethod
    def _empty(flat: pa.Table) -> pa.Table:
        if "part" not in flat.column_names:
            flat = flat.append_column("part", pa.array([], type=pa.int32()))
        return flat


LINEAGE_SCHEMA = pa.schema(
    [
        ("partition", pa.int32()),
        ("file", pa.string()),
        ("gtid_watermark", pa.int64()),
        ("rows", pa.int64()),
        ("content_hash", pa.string()),
        ("events_applied", pa.int64()),
        ("kind", pa.string()),
    ]
)


class MergeWrite:
    """Per-partition merge + staged write (map_groups over ``part``).

    Holds the prior-state file map and epoch — constructed once per
    worker (actor-pool semantics), called once per partition group.
    Returns a one-row lineage table; the actual data goes straight to
    the lake as a staged parquet file, so only tiny lineage records
    flow back to the driver."""

    def __init__(self, root: str, epoch: int, prior_files: dict[int, str],
                 prior_wms: dict[int, int]):
        self.root = root
        self.epoch = epoch
        self.prior_files = prior_files
        self.prior_wms = prior_wms

    def __call__(self, group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.Table.from_pylist([], schema=LINEAGE_SCHEMA)
        part = int(group.column("part")[0].as_py())
        events = group.drop_columns(["part"])
        events = merge.keep_last(events)  # collapse across batches of the group
        prior = None
        pf = self.prior_files.get(part)
        if pf is not None:
            prior = pq.read_table(os.path.join(self.root, pf))
        state = merge.merge_state(prior, events)
        path = sink.state_file(self.root, part, self.epoch)
        sink.atomic_write_parquet(state, path)
        rel = os.path.relpath(path, self.root)
        max_applied = int(pc.max(events.column("gtid")).as_py()) if len(events) else -1
        lin = lineage_for(
            part, rel, state,
            prev_watermark=self.prior_wms.get(part, -1),
            events_applied=len(events),
            max_applied_gtid=max_applied,
        )
        return pa.Table.from_pylist([lin.to_dict()], schema=LINEAGE_SCHEMA)


import ray as _ray


class _ConformStructs:
    """map_batches stage: cast a shard group's before/after structs to
    the unified (widened) payload.  Ray's block batcher aligns struct
    field NAMES across blocks but not child TYPES, so shards on either
    side of a type-widening evolution boundary cannot share one
    read_parquet — each schema group is read separately, conformed
    here, and unioned (see ``_read_shards_conformed``)."""

    def __init__(self, payload: pa.Schema):
        self.payload = payload

    def __call__(self, batch: pa.Table) -> pa.Table:
        from rookray.events import _conform_struct
        for col in ("before", "after"):
            if col in batch.column_names:
                conformed = _conform_struct(batch.column(col), self.payload)
                batch = batch.set_column(
                    batch.column_names.index(col), col, conformed
                )
        return batch


def _read_shards_conformed(files: list, shard_schemas: list,
                           columns: list | None,
                           renames: dict | None = None) -> "ray.data.Dataset":
    """``read_parquet`` over shards whose payload struct types disagree
    (type-widening schema evolution): one read per distinct file
    schema, each renamed (column mapping) then conformed to the
    unified payload before the union.  ``shard_schemas`` are the
    post-rename schemas."""
    from rookray.events import RenameEvents, payload_schema_of, unified_payload

    payload = unified_payload(shard_schemas)
    groups: dict[str, list] = {}
    for f, s in zip(files, shard_schemas):
        groups.setdefault(str(s), []).append(f)
    parts = []
    for key, fs in groups.items():
        ds = ray.data.read_parquet(fs, columns=columns)
        if renames:
            ds = ds.map_batches(RenameEvents(renames),
                                batch_format="pyarrow",
                                zero_copy_batch=True)
        sig = next(s for f, s in zip(files, shard_schemas) if str(s) == key)
        if not payload_schema_of(sig).equals(payload):
            ds = ds.map_batches(_ConformStructs(payload),
                                batch_format="pyarrow")
        parts.append(ds)
    return parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])


class ShuffleWriter:
    """map_batches stage: normalize+partition a batch, then write each
    partition's slice as an Arrow IPC partial under the epoch's shuffle
    directory (the external-shuffle map side).

    File names are deterministic functions of the content (partition,
    gtid range, gtid digest), so a re-executed task overwrites its own
    partials instead of duplicating them — shuffle writes are therefore
    idempotent under Ray task retries.  No actor mailboxes, no blocking
    calls inside tasks (a blocking-router design caused raylet worker
    explosion, ray#3644), no all-to-all sort barrier (whose wall time
    dominated the epoch).  On a cluster the shuffle dir lives on the
    same shared storage as the lake itself.
    """

    def __init__(self, stage: PartitionStage, shuffle_dir: str):
        self.stage = stage
        self.shuffle_dir = shuffle_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        flat, part = self.stage.flat_part(batch)
        parts_out, rows_out = [], []
        if part is not None:
            # fused combiner + partition sort: winner selection
            # (keep-last per key) and the partition-contiguous reorder
            # compose into ONE payload gather — the un-fused form
            # gathered the wide token payload twice per batch
            winners = (merge.last_per_key_indices(flat)
                       .to_numpy(zero_copy_only=False).astype(np.int64))
            pw = part[winners]
            order = np.argsort(pw, kind="stable")
            flat = flat.take(pa.array(winners[order]))
            part_s = pw[order]
            n = len(flat)
            bounds = np.flatnonzero(np.diff(part_s)) + 1
            starts = np.concatenate([[0], bounds])
            ends = np.concatenate([bounds, [n]])
            gtids = flat.column("gtid").to_numpy(zero_copy_only=False)
            slices = []
            for s, e in zip(starts, ends):
                parts_out.append(int(part_s[s]))
                rows_out.append(int(e - s))
                slices.append(flat.slice(s, e - s))
            # ONE file per task, one record batch per partition (footer
            # metadata maps partition → batch index); name is a
            # deterministic function of the content so a re-executed
            # task overwrites its own partial (idempotent under retry)
            digest = hashlib.md5(gtids.tobytes()).hexdigest()[:10]
            name = f"all-{gtids.min()}-{gtids.max()}-{digest}.arrow"
            sink.atomic_write_ipc_parts(
                slices, parts_out, os.path.join(self.shuffle_dir, name))
        return pa.table(
            {"part": pa.array(parts_out, pa.int32()),
             "rows": pa.array(rows_out, pa.int64())}
        )


class FinalizeMerge:
    """Actor-pool stage over partition ids (the reduce side): read a
    partition's shuffle partials, LWW-merge against prior state, write
    the staged state file, emit the lineage row.  This is the stateful
    keyed-merge stage of the north-star design — prior state and merge
    config load once per actor."""

    def __init__(self, root: str, epoch: int, shuffle_dir: str,
                 prior_files: dict, prior_wms: dict,
                 write_mode: str = "rewrite"):
        self.root = root
        self.epoch = epoch
        self.shuffle_dir = shuffle_dir
        self.prior_files = prior_files
        self.prior_wms = prior_wms
        self.write_mode = write_mode

    def _partial_index(self) -> "dict[int, list[tuple[str, int]]]":
        """partition → [(file, record-batch index)] over the epoch's
        shuffle files; footers only, built once per actor."""
        import glob as _glob

        idx: dict[int, list[tuple[str, int]]] = {}
        for f in sorted(_glob.glob(os.path.join(self.shuffle_dir, "all-*.arrow"))):
            for p, bi in sink.ipc_parts_index(f).items():
                idx.setdefault(p, []).append((f, bi))
        return idx

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not hasattr(self, "_pindex"):
            self._pindex = self._partial_index()
        out = []
        for part in batch.column("part").to_pylist():
            entries = self._pindex.get(int(part), ())
            if not entries:
                continue
            chunks = [sink.read_ipc_part(f, bi) for f, bi in entries]
            events = merge.keep_last(
                pa.concat_tables(chunks, promote_options="default")
                if len(chunks) > 1 else chunks[0]
            )
            applied = sum(len(c) for c in chunks)
            max_applied = int(pc.max(events.column("gtid")).as_py()) if len(events) else -1
            if self.write_mode == "delta":
                # merge-on-read: persist only the epoch's winners
                # (tombstones included) — O(epoch), not O(state)
                path = sink.delta_file(self.root, part, self.epoch)
                sink.atomic_write_parquet(events, path)
                rel = os.path.relpath(path, self.root)
                lin = lineage_for(
                    part, rel, events,  # hash/row-count the delta itself
                    prev_watermark=self.prior_wms.get(part, -1),
                    events_applied=applied,
                    max_applied_gtid=max_applied,
                    kind="delta",
                )
            else:
                prior = None
                pf = self.prior_files.get(part)
                if pf is not None:
                    prior = pq.read_table(os.path.join(self.root, pf))
                state = merge.merge_state(prior, events)
                path = sink.state_file(self.root, part, self.epoch)
                sink.atomic_write_parquet(state, path)
                rel = os.path.relpath(path, self.root)
                lin = lineage_for(
                    part, rel, state,
                    prev_watermark=self.prior_wms.get(part, -1),
                    events_applied=applied,
                    max_applied_gtid=max_applied,
                )
            out.append(lin.to_dict())
        return pa.Table.from_pylist(out, schema=LINEAGE_SCHEMA)


class _BootstrapWrite:
    """Per-partition snapshot writer for ``LakeTable.bootstrap``."""

    def __init__(self, root: str):
        self.root = root

    def __call__(self, g: pa.Table) -> pa.Table:
        part = int(g.column("part")[0].as_py())
        t = g.drop_columns(["part"]).sort_by("doc_id")
        path = sink.state_file(self.root, part, 0)
        sink.atomic_write_parquet(t, path)
        lin = lineage_for(part, os.path.relpath(path, self.root), t,
                          prev_watermark=-1, events_applied=len(t))
        return pa.Table.from_pylist([lin.to_dict()], schema=LINEAGE_SCHEMA)


def _resolve_partition(root: str, base_rel: str | None,
                       delta_rels: list[str]) -> pa.Table | None:
    """base + deltas → current state table (merge-on-read kernel)."""
    base = pq.read_table(os.path.join(root, base_rel)) if base_rel else None
    if not delta_rels:
        return base
    deltas = [pq.read_table(os.path.join(root, r)) for r in delta_rels]
    if len(deltas) > 1:
        # deltas written across a type-widening evolution boundary
        # disagree on column width; conform to the union before concat
        from rookray.schema import conform, unify_additive
        u = unify_additive([d.schema for d in deltas])
        events = pa.concat_tables([conform(d, u) for d in deltas],
                                  promote_options="none")
    else:
        events = deltas[0]
    return merge.merge_state(base, merge.keep_last(events))


class _MergeOnRead:
    """Per-partition merge-on-read task (delta mode reads)."""

    def __init__(self, root: str, frags: dict, include_meta: bool):
        self.root = root
        self.frags = frags
        self.include_meta = include_meta

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for part in batch.column("part").to_pylist():
            base_rel, delta_rels = self.frags[int(part)]
            state = _resolve_partition(self.root, base_rel, delta_rels)
            if state is None or len(state) == 0:
                continue
            if not self.include_meta:
                state = state.drop_columns(
                    [c for c in ("_gtid", "_split") if c in state.column_names]
                )
            outs.append(state)
        if not outs:
            return pa.table({})
        return (pa.concat_tables(outs, promote_options="default")
                if len(outs) > 1 else outs[0])


#: default changefeed payload columns (back-compat with the original
#: fixed schema: doc_id, change, gtid_a/b, n_tok_a/b)
_CHANGEFEED_DEFAULT_COLUMNS = ("n_tok",)


def _changefeed_schema(columns=_CHANGEFEED_DEFAULT_COLUMNS,
                       types: dict | None = None) -> pa.Schema:
    """Changefeed output schema for a payload-column selection: integer
    payload columns surface as int64 with ``-1`` absent-side sentinels;
    everything else keeps its payload type with nulls on the absent
    side."""
    types = types or {}
    fields = [("doc_id", pa.string()), ("change", pa.string()),
              ("gtid_a", pa.int64()), ("gtid_b", pa.int64())]
    for c in columns:
        t = types.get(c, pa.int64())
        t = pa.int64() if pa.types.is_integer(t) else t
        fields += [(f"{c}_a", t), (f"{c}_b", t)]
    return pa.schema(fields)


_CHANGEFEED_SCHEMA = _changefeed_schema()


class _ChangeFeed:
    """Per-partition snapshot-diff task — the changefeed kernel.

    Hash placement by ``doc_id`` is stable across epochs, so the diff
    between two snapshots is partition-local: resolve each side's
    state (base + deltas) and outer-join on ``doc_id`` vectorized.  A
    key present only in B is an insert, only in A a delete; present in
    both with a different winning ``_gtid`` an update; same ``_gtid``
    rows are unchanged and emit nothing.  ``columns`` selects which
    payload columns ride along as ``<col>_a`` / ``<col>_b`` pairs
    (before/after images — what a delta-maintained downstream view
    needs to retract the old contribution and add the new one)."""

    def __init__(self, root: str, frags_a: dict, frags_b: dict,
                 columns=_CHANGEFEED_DEFAULT_COLUMNS,
                 types: dict | None = None):
        self.root = root
        self.frags_a = frags_a
        self.frags_b = frags_b
        self.columns = tuple(columns)
        self.schema = _changefeed_schema(self.columns, types)

    def _side(self, state: pa.Table | None, suf: str):
        import pandas as pd
        if state is None or len(state) == 0:
            cols = {"doc_id": pd.Series([], dtype=object),
                    f"gtid_{suf}": pd.Series([], dtype=np.int64)}
            for c in self.columns:
                cols[f"{c}_{suf}"] = pd.Series(
                    [], dtype=np.int64
                    if pa.types.is_integer(self.schema.field(f"{c}_{suf}").type)
                    else object)
            return pd.DataFrame(cols)
        cols = {
            "doc_id": state.column("doc_id").to_numpy(zero_copy_only=False),
            f"gtid_{suf}": state.column("_gtid")
                                .to_numpy(zero_copy_only=False)
                                .astype(np.int64),
        }
        for c in self.columns:
            is_int = pa.types.is_integer(self.schema.field(f"{c}_{suf}").type)
            if c in state.column_names:
                v = state.column(c).to_numpy(zero_copy_only=False)
                cols[f"{c}_{suf}"] = v.astype(np.int64) if is_int else v
            else:
                cols[f"{c}_{suf}"] = (np.full(len(state), -1, dtype=np.int64)
                                      if is_int
                                      else np.full(len(state), None,
                                                   dtype=object))
        return pd.DataFrame(cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for part in batch.column("part").to_pylist():
            p = int(part)
            a = _resolve_partition(self.root, *self.frags_a.get(p, (None, [])))
            b = _resolve_partition(self.root, *self.frags_b.get(p, (None, [])))
            mg = self._side(a, "a").merge(self._side(b, "b"),
                                          on="doc_id", how="outer")
            ga = mg["gtid_a"].to_numpy(dtype=np.float64, na_value=np.nan)
            gb = mg["gtid_b"].to_numpy(dtype=np.float64, na_value=np.nan)
            ins, dele = np.isnan(ga), np.isnan(gb)
            keep = ins | dele | (ga != gb)
            if not keep.any():
                continue
            mg = mg[keep]
            change = np.where(ins[keep], "insert",
                              np.where(dele[keep], "delete", "update"))
            data = {
                "doc_id": pa.array(mg["doc_id"].to_numpy(dtype=object)),
                "change": pa.array(change.astype(object)),
                "gtid_a": pa.array(np.nan_to_num(
                    ga[keep], nan=-1.0).astype(np.int64)),
                "gtid_b": pa.array(np.nan_to_num(
                    gb[keep], nan=-1.0).astype(np.int64)),
            }
            for c in self.columns:
                for suf in ("a", "b"):
                    f = self.schema.field(f"{c}_{suf}")
                    col = mg[f"{c}_{suf}"]
                    if pa.types.is_integer(f.type):
                        data[f"{c}_{suf}"] = pa.array(col.to_numpy(
                            dtype=np.float64, na_value=-1.0).astype(np.int64))
                    else:
                        vals = col.to_numpy(dtype=object)
                        vals = np.where(col.isna().to_numpy(), None, vals)
                        data[f"{c}_{suf}"] = pa.array(vals, type=f.type)
            outs.append(pa.table(data, schema=self.schema))
        if not outs:
            return pa.Table.from_pylist([], schema=self.schema)
        return pa.concat_tables(outs) if len(outs) > 1 else outs[0]


_COMPACT_SCHEMA = pa.schema(
    [("partition", pa.int32()), ("file", pa.string()),
     ("rows", pa.int64()), ("content_hash", pa.string())]
)


class _CompactPartition:
    """Per-partition compaction task: fold deltas into a fresh base."""

    def __init__(self, root: str, epoch: int, frags: dict):
        self.root = root
        self.epoch = epoch
        self.frags = frags

    def __call__(self, batch: pa.Table) -> pa.Table:
        from rookray.util import stable_table_hash

        out = []
        for part in batch.column("part").to_pylist():
            base_rel, delta_rels = self.frags[int(part)]
            state = _resolve_partition(self.root, base_rel, delta_rels)
            if state is None:
                continue
            path = sink.state_file(self.root, int(part), self.epoch)
            sink.atomic_write_parquet(state, path)
            out.append({
                "partition": int(part),
                "file": os.path.relpath(path, self.root),
                "rows": len(state),
                "content_hash": stable_table_hash(state),
            })
        return pa.Table.from_pylist(out, schema=_COMPACT_SCHEMA)


class ConcurrentWriterError(RuntimeError):
    """A second writer attempted a mutating operation while another
    holds the table's write lease."""


#: same-process writer serialization (cross-process = the on-disk lease)
_LEASE_REGISTRY: dict = {}
_LEASE_REGISTRY_LOCK = _threading.Lock()


def _leased(fn):
    """Run a mutating LakeTable method under the single-writer lease."""
    import functools

    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        with self._write_lease():
            return fn(self, *args, **kwargs)
    return wrapper


class LakeTable:
    """A lake-resident upsert table: Parquet partitions + manifest.

    ``apply()`` is the exactly-once ingest step; ``read()`` exposes the
    committed state as a ``ray.data.Dataset``."""

    #: a lease older than this is considered abandoned (writer died
    #: without cleanup) and may be broken by the next writer
    LEASE_TTL_S = 900.0

    def __init__(self, root: str, config: CDCConfig | None = None):
        self.root = root
        self.config = config or CDCConfig()
        self._lease_depth = 0  # reentrant within one LakeTable instance
        os.makedirs(root, exist_ok=True)

    def _write_lease(self):
        """Single-writer guard for every mutating entry point (apply /
        bootstrap / compact / purge / restore / repartition).  The
        commit protocol itself is a single atomic manifest swap, but
        two interleaved WRITERS would race the read-modify-write of
        the manifest (both read epoch N, both commit N+1 — one
        epoch's work silently vanishes).  rook gets this for free by
        being one process; a lake needs an explicit lease.

        Mechanics (each closes a measured hole):

        - acquisition is write-temp-then-``os.link`` so the lease file
          NEVER exists without its payload (an O_EXCL-create-then-dump
          window would let a contender read an empty file, judge it
          unreadable→stale, and break a LIVE lease);
        - a heartbeat thread re-stamps ``renewed`` every
          ``LEASE_TTL_S/3`` while held, so a healthy long mutator
          (hours-long apply at real scale) is never mistaken for a
          crashed one — only a lease whose LAST stamp is older than
          ``LEASE_TTL_S`` is broken;
        - same-process writers are serialized by a module-global
          registry (re-entrant for the HOLDING instance only), not by
          pid inspection — a second thread or second ``LakeTable``
          over the same root gets ``ConcurrentWriterError`` instead of
          silently breaking its sibling's live lease.

        A live foreign lease raises ``ConcurrentWriterError``; a stale
        one is broken (the crashed writer's partial work is invisible
        — nothing swapped the manifest).

        Honesty note: without an atomic compare-and-swap primitive on
        shared storage there remains a narrow TOCTOU window — a holder
        that stalls past the TTL, is broken, and resumes BETWEEN its
        ownership check and its re-stamp/unlink can still disturb the
        successor's lease.  The token check shrinks that window from
        "any time after the TTL" to "microseconds around one syscall";
        full closure needs a CAS-capable lock service (the standard
        answer on real clusters — e.g. a DynamoDB/ZK/etcd lock, which
        is exactly what Delta's S3 commit service does).  The lease is
        operational-error protection, not distributed consensus."""
        import contextlib
        import threading
        import time as _time
        import uuid

        lake = self
        path = os.path.join(self.root, "_write_lease.json")
        key = os.path.realpath(self.root)
        me = (id(self), threading.get_ident())
        token = uuid.uuid4().hex  # ownership proof for re-stamp/release

        def _stamp():
            tmp = path + f".tmp.{os.getpid()}.{threading.get_ident()}"
            with open(tmp, "w") as f:
                json.dump({"pid": os.getpid(), "token": token,
                           "renewed": _time.time()}, f)
            return tmp

        def _owned() -> bool:
            try:
                with open(path) as f:
                    return json.load(f).get("token") == token
            except (OSError, ValueError):
                return False

        @contextlib.contextmanager
        def lease():
            with _LEASE_REGISTRY_LOCK:
                holder = _LEASE_REGISTRY.get(key)
                if holder == me:
                    lake._lease_depth += 1
                    reenter = True
                elif holder is not None:
                    # a DIFFERENT instance OR a different thread of the
                    # same instance — both are concurrent writers
                    raise ConcurrentWriterError(
                        f"another writer in this process holds the lease "
                        f"on {lake.root}")
                else:
                    _LEASE_REGISTRY[key] = me
                    lake._lease_depth = 1
                    reenter = False
            if reenter:
                try:
                    yield
                finally:
                    with _LEASE_REGISTRY_LOCK:
                        lake._lease_depth -= 1
                return
            try:
                while True:
                    tmp = _stamp()
                    try:
                        os.link(tmp, path)  # atomic: payload rides along
                        break
                    except FileExistsError:
                        try:
                            with open(path) as f:
                                held = json.load(f)
                            age = _time.time() - float(
                                held.get("renewed",
                                         held.get("acquired", 0)))
                        except (OSError, ValueError):
                            # unreadable is impossible for OUR format
                            # (link is atomic) — treat a garbled file
                            # as live until its mtime goes stale
                            try:
                                age = _time.time() - os.path.getmtime(path)
                            except OSError:
                                continue  # vanished: retry acquire
                            held = {}
                        if age <= lake.LEASE_TTL_S:
                            raise ConcurrentWriterError(
                                f"another writer (pid {held.get('pid')}) "
                                f"holds the lease on {lake.root} (last "
                                f"renewal {age:.0f}s ago); concurrent "
                                f"writers would race the manifest")
                        # break the stale lease by CLAIMING it: rename
                        # is atomic, so of N contenders exactly one
                        # wins; a blind unlink would let the loser
                        # delete the winner's freshly-linked LIVE lease
                        claim = path + f".claim.{os.getpid()}" \
                                       f".{threading.get_ident()}"
                        try:
                            os.rename(path, claim)
                        except FileNotFoundError:
                            continue  # another contender claimed it
                        with contextlib.suppress(FileNotFoundError):
                            os.unlink(claim)
                    finally:
                        with contextlib.suppress(FileNotFoundError):
                            os.unlink(tmp)
                stop = threading.Event()

                def heartbeat():
                    while not stop.wait(lake.LEASE_TTL_S / 3.0):
                        # re-stamp only while the lease is still OURS: a
                        # holder that stalled past TTL and was broken
                        # must not clobber its successor's live lease
                        with contextlib.suppress(OSError):
                            if _owned():
                                t = _stamp()
                                os.replace(t, path)

                hb = threading.Thread(target=heartbeat, daemon=True)
                hb.start()
                try:
                    yield
                finally:
                    stop.set()
                    hb.join(timeout=5.0)
                    # release only our own lease (same stall scenario)
                    if _owned():
                        with contextlib.suppress(FileNotFoundError):
                            os.unlink(path)
            finally:
                with _LEASE_REGISTRY_LOCK:
                    if _LEASE_REGISTRY.get(key) == me:
                        del _LEASE_REGISTRY[key]
                    lake._lease_depth = 0

        return lease()

    def _num_partitions(self, m: dict | None = None) -> int:
        """Effective partition count: once a manifest exists its
        ``num_partitions`` is authoritative — re-applying with a
        different config value would silently scatter keys across a
        different partitioning (verified corruption in round 1 review),
        so the committed value always wins.  Changing the count
        requires an explicit repartition/compaction, not a config edit."""
        m = m if m is not None else self.manifest()
        if m and "num_partitions" in m:
            mp = int(m["num_partitions"])
            if mp != self.config.num_partitions:
                import warnings
                warnings.warn(
                    f"LakeTable {self.root}: configured num_partitions="
                    f"{self.config.num_partitions} != committed {mp}; "
                    f"using the committed value", stacklevel=2)
            return mp
        return self.config.num_partitions

    # ------------------------------------------------------------ state

    def manifest(self) -> dict | None:
        return sink.read_manifest(self.root)

    def payload_schema(self) -> pa.Schema:
        """The COMMITTED payload schema (from the manifest — the
        engine's catalog), the live-metadata surface downstream target
        registries introspect (the JDBC-metadata analog,
        rook-target-hibernate4-cache/.../SynchronizationContext.java:89-113).
        Raises before the first committed epoch."""
        m = self.manifest()
        if m is None:
            raise ValueError(
                "no committed manifest yet; apply an epoch first")
        return self._manifest_payload(m)

    # --------------------------------------------------- time travel

    def epochs(self) -> list[int]:
        """Committed epochs with an archived snapshot manifest —
        readable via ``read(as_of=...)`` until their state files are
        garbage-collected (``sink.gc_uncommitted`` keeps the trailing
        ``keep_epochs``)."""
        d = os.path.join(self.root, "manifests")
        if not os.path.isdir(d):
            return []
        out = []
        for name in os.listdir(d):
            if name.startswith("epoch-") and name.endswith(".json"):
                try:
                    out.append(int(name[6:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def manifest_at(self, epoch: int) -> dict:
        """The archived manifest of a committed epoch (snapshot
        isolation: every state file it references is immutable —
        epoch-tagged names — so the snapshot stays byte-stable until
        GC'd)."""
        path = os.path.join(self.root, "manifests", f"epoch-{epoch:06d}.json")
        if not os.path.exists(path):
            raise ValueError(
                f"no committed epoch {epoch} at {self.root}; "
                f"available: {self.epochs()}")
        import json as _json
        with open(path) as f:
            return _json.load(f)

    def _snapshot_manifest(self, as_of: int | None) -> dict | None:
        """Current manifest, or a validated historical one."""
        if as_of is None:
            return self.manifest()
        m = self.manifest_at(as_of)
        missing = []
        for p in m["partitions"].values():
            rels = ([p["file"]] if p.get("file") else []) \
                + list(p.get("delta_files", ()))
            missing += [r for r in rels
                        if not os.path.exists(os.path.join(self.root, r))]
        if missing:
            raise ValueError(
                f"snapshot epoch {as_of} is no longer readable: "
                f"{len(missing)} state file(s) were garbage-collected "
                f"(e.g. {missing[0]}); raise gc keep_epochs to retain "
                f"older snapshots")
        return m

    @_leased
    def restore(self, epoch: int) -> dict:
        """Roll the table back to a committed snapshot (the Delta
        RESTORE analog): commits a NEW epoch whose partition map,
        watermarks, and payload schema are the historical epoch's —
        metadata-only, no data moves, and the rolled-back epochs stay
        in history (restore of a restore works).  Subsequent
        ``apply()`` calls resume from the restored watermark, so
        replaying the undone shards is the normal overlap path."""
        m = self._snapshot_manifest(epoch)   # validates files still exist
        cur = self.manifest()
        new_epoch = (cur["epoch"] + 1) if cur else 0
        manifest = dict(m)
        manifest["epoch"] = new_epoch
        manifest["restored_from"] = int(epoch)
        sink.commit_manifest(self.root, manifest)
        return {"epoch": new_epoch, "restored_from": int(epoch),
                "closed_watermark": manifest.get("closed_watermark")}

    def changes_between(self, epoch_a: int, epoch_b: int,
                        columns=_CHANGEFEED_DEFAULT_COLUMNS,
                        ) -> "ray.data.Dataset":
        """Row-level changefeed between two committed snapshots — CDC
        *out* of the lake (the Delta-CDF / Hudi incremental-query
        analog; rook itself is CDC *in* only,
        MySQLReplicationStream.java:161-179).

        Returns a Dataset of ``(doc_id, change, gtid_a, gtid_b)`` plus
        a ``<col>_a`` / ``<col>_b`` before/after pair per requested
        payload column (default ``n_tok``), with ``change`` ∈
        insert/update/delete; absent sides carry ``-1`` for integer
        columns and null otherwise.  The diff is partition-local
        (hash placement is stable across epochs), so no shuffle — one
        task per partition.  Both snapshots must share a partition
        count; diffing across a ``repartition()`` boundary is
        refused."""
        ma = self._snapshot_manifest(epoch_a)
        mb = self._snapshot_manifest(epoch_b)
        if int(ma["num_partitions"]) != int(mb["num_partitions"]):
            raise ValueError(
                f"snapshots straddle a repartition boundary "
                f"({ma['num_partitions']} vs {mb['num_partitions']} "
                f"partitions); changefeed requires a stable key placement")
        # payload types from the newer snapshot's committed schema
        # (additive evolution: B's schema is the union)
        pb = self._manifest_payload(mb)
        types = {f.name: f.type for f in pb}
        unknown = [c for c in columns if c not in types]
        if unknown:
            raise ValueError(
                f"changefeed columns {unknown} not in the committed "
                f"payload schema {pb.names}")
        fa = self._partition_fragments(ma)
        fb = self._partition_fragments(mb)
        parts = sorted(set(fa) | set(fb))
        if not parts:
            return ray.data.from_arrow(
                pa.Table.from_pylist(
                    [], schema=_changefeed_schema(columns, types)))
        feed = _ChangeFeed(self.root, fa, fb, columns, types)
        return (ray.data.from_items([{"part": p} for p in parts])
                .repartition(len(parts))
                .map_batches(feed, batch_format="pyarrow", batch_size=1))

    def _has_deltas(self, m: dict | None = None) -> bool:
        m = m or self.manifest()
        return bool(m) and any(p.get("delta_files") for p in m["partitions"].values())

    def committed_files(self, m: dict | None = None) -> list[str]:
        """Base state files only — valid as-is when no deltas exist."""
        m = m if m is not None else self.manifest()
        if not m:
            return []
        return [os.path.join(self.root, p["file"]) for p in m["partitions"].values()
                if p.get("file") and p["rows"] > 0]

    def _partition_fragments(self, m: dict) -> dict[int, tuple[str | None, list[str]]]:
        out = {}
        for pid, p in m["partitions"].items():
            out[int(pid)] = (p.get("file"), list(p.get("delta_files", ())))
        return out

    def read(self, include_meta: bool = False,
             as_of: int | None = None) -> "ray.data.Dataset":
        """Committed state as a Dataset; ``as_of`` reads a historical
        epoch's snapshot (time travel) instead of the head."""
        m = self._snapshot_manifest(as_of)
        if not self._has_deltas(m):
            files = self.committed_files(m)
            if not files:
                return ray.data.from_arrow(self._empty_state())
            ds = ray.data.read_parquet(files)
            if not include_meta:
                ds = ds.drop_columns(["_gtid", "_split"])
            return ds
        # merge-on-read: one task per partition resolves base + deltas
        frags = self._partition_fragments(m)
        reader = _MergeOnRead(self.root, frags, include_meta)
        parts_ds = ray.data.from_items(
            [{"part": p} for p in sorted(frags)]
        ).repartition(len(frags))
        return parts_ds.map_batches(reader, batch_format="pyarrow", batch_size=1)

    @_leased
    def bootstrap(self, snapshot, gtid_watermark: int) -> dict:
        """Snapshot bootstrap — the initial-load→streaming handoff every
        CDC deployment needs (Debezium's snapshot phase; rook leaves
        initial load to the user entirely): register an existing
        CONSISTENT-AS-OF-``gtid_watermark`` snapshot as the table's
        epoch-0 state without replaying history.  Subsequent
        ``apply()`` calls continue from the watermark: events at or
        below it are skipped by the per-partition watermark, events
        above it LWW-win against the snapshot rows (stamped
        ``_gtid = gtid_watermark``).

        ``snapshot``: a payload table/Dataset (doc_id + payload
        columns, no meta).  Distributed: rows hash-partition and write
        in parallel; nothing lands on the driver."""
        if self.manifest():
            raise ValueError("bootstrap requires an empty table")
        if self.config.expect_fn is not None:
            # the expectation contract is a FLAT EVENT batch (op, gtid,
            # payload); snapshot rows have no op/gtid, so silently
            # skipping the gate here would break the "invalid rows
            # never reach the merge" invariant on the initial-load
            # path.  Force an explicit choice.
            raise ValueError(
                "bootstrap cannot enforce CDCConfig.expect_fn (snapshot "
                "rows are not change events): pre-filter the snapshot "
                "yourself, or bootstrap through a config without the "
                "expectation")
        if isinstance(snapshot, pa.Table):
            snapshot = ray.data.from_arrow(snapshot)
        cfg = self.config
        P = cfg.num_partitions
        payload = snapshot.schema().base_schema
        if not isinstance(payload, pa.Schema):
            payload = pa.schema([pa.field(n, pa.from_numpy_dtype(t))
                                 for n, t in zip(payload.names, payload.types)])
        bad = {"_gtid", "_split", "part"} & set(payload.names)
        if bad:
            raise ValueError(f"snapshot must not carry meta columns {bad}")
        wm = int(gtid_watermark)

        def add_meta(batch: pa.Table) -> pa.Table:
            n = len(batch)
            part = partition_of(batch.column("doc_id"), P)
            return (batch
                    .append_column("_gtid",
                                   pa.array(np.full(n, wm, np.int64)))
                    .append_column("_split",
                                   pa.array(np.zeros(n, np.int8)))
                    .append_column("part",
                                   pa.array(part.astype(np.int64))))

        writer = _BootstrapWrite(self.root)
        writer.__name__ = "BootstrapWrite"  # ray's map_groups wrapper wants one
        lineage_rows = (snapshot
                        .map_batches(add_meta, batch_format="pyarrow",
                                     zero_copy_batch=True)
                        .groupby("part")
                        .map_groups(writer, batch_format="pyarrow")
                        .take_all())
        partitions = {}
        rows = 0
        for row in lineage_rows:
            rows += int(row["rows"])
            partitions[str(int(row["partition"]))] = {
                "file": row["file"],
                "gtid_watermark": wm,
                "rows": int(row["rows"]),
                "content_hash": row["content_hash"],
                "events_applied": int(row["rows"]),
            }
        manifest = {
            "epoch": 0,
            "table": cfg.table,
            "num_partitions": P,
            "closed_watermark": wm,
            "max_gtid_seen": wm,
            "partitions": partitions,
            "payload_schema_ipc": _schema_to_b64(payload),
            "payload_schema": [[f.name, str(f.type)] for f in payload],
        }
        sink.commit_manifest(self.root, manifest)
        return {"epoch": 0, "closed_watermark": wm, "rows": rows,
                "partitions_touched": len(partitions)}

    def lookup(self, doc_ids, as_of: int | None = None) -> pa.Table:
        """Point reads: the current rows for the given keys, touching
        ONLY the partitions those keys hash into and pushing a key
        filter into every parquet read (row groups prune on doc_id
        statistics) — O(partitions hit), not O(state).  The
        ``SynchronizationContext.loadEntity`` analog at lake scale
        (rook loads one entity per event; here a probe batch serves
        straight from the committed state).  Deleted / unknown keys
        are simply absent from the result."""
        m = self._snapshot_manifest(as_of)
        if not m:
            return self._empty_state()
        keys = sorted({str(d) for d in doc_ids})
        if not keys:
            return self._empty_state()
        ids = pa.array(keys, pa.string())
        P = self._num_partitions(m)
        parts = partition_of(ids, P)
        frags = self._partition_fragments(m)
        flt = [("doc_id", "in", keys)]
        tables = []
        for p in sorted(set(parts.tolist())):
            base_rel, delta_rels = frags.get(int(p), (None, []))
            base = (pq.read_table(os.path.join(self.root, base_rel),
                                  filters=flt)
                    if base_rel else None)
            if delta_rels:
                # LWW per key is unaffected by dropping other keys, so
                # the filter pushes below the merge
                deltas = [pq.read_table(os.path.join(self.root, r),
                                        filters=flt) for r in delta_rels]
                if len(deltas) > 1:
                    u = unify_additive([d.schema for d in deltas])
                    from rookray.schema import conform as _c
                    ev = pa.concat_tables([_c(d, u) for d in deltas],
                                          promote_options="none")
                else:
                    ev = deltas[0]
                t = merge.merge_state(base, merge.keep_last(ev))
            else:
                t = base
            if t is not None and len(t):
                tables.append(t.drop_columns(["_gtid", "_split"]))
        if not tables:
            return self._empty_state()
        schema = unify_additive([t.schema for t in tables])
        from rookray.schema import conform
        return pa.concat_tables(
            [conform(t, schema) for t in tables],
            promote_options="none").sort_by("doc_id")

    def state_table(self, include_meta: bool = False,
                    as_of: int | None = None) -> pa.Table:
        """Full committed state as one in-memory table (tests/small only)."""
        m = self._snapshot_manifest(as_of)
        if self._has_deltas(m):
            frags = self._partition_fragments(m)
            reader = _MergeOnRead(self.root, frags, include_meta)
            tables = [
                reader(pa.table({"part": pa.array([p], pa.int32())}))
                for p in sorted(frags)
            ]
            tables = [t for t in tables if len(t)]
        else:
            files = self.committed_files(m)
            if not files:
                return self._empty_state()
            tables = [pq.read_table(f) for f in files]
            if not include_meta:
                tables = [t.drop_columns(["_gtid", "_split"]) for t in tables]
        if not tables:
            return self._empty_state()
        schema = unify_additive([t.schema for t in tables])
        from rookray.schema import conform
        tbl = pa.concat_tables([conform(t, schema) for t in tables], promote_options="none")
        return tbl.sort_by("doc_id")

    # ------------------------------------------------------- compaction

    @_leased
    def compact(self, max_concurrency: int = 64,
                min_deltas: int = 1) -> dict:
        """Collapse partitions' base + deltas into fresh bases (the
        Hudi-MOR compactor analog).  Runs as one parallel task per
        selected partition; commits as a new epoch.  No-op without
        deltas.

        ``min_deltas`` makes compaction SIZE-TIERED: only partitions
        carrying at least that many delta files rewrite — at 100 TB a
        full compact rewrites every cold partition's base for nothing,
        while hot partitions (skewed keys) accumulate deltas fastest
        and are exactly the ones merge-on-read pays for.  Untouched
        partitions keep their fragments readable as before."""
        m = self.manifest()
        if not self._has_deltas(m):
            return {"compacted": 0}
        epoch = m["epoch"] + 1
        frags = self._partition_fragments(m)
        todo = {p: fr for p, fr in frags.items()
                if len(fr[1]) >= max(1, int(min_deltas))}
        if not todo:
            return {"compacted": 0}
        comp = _CompactPartition(self.root, epoch, todo)
        parts_ds = ray.data.from_items(
            [{"part": p} for p in sorted(todo)]
        ).repartition(len(todo))
        rows = parts_ds.map_batches(
            comp, batch_format="pyarrow", batch_size=1,
            concurrency=min(max_concurrency, len(todo)),
        ).take_all()
        partitions = dict(m["partitions"])
        for row in rows:
            pid = str(int(row["partition"]))
            prev = partitions[pid]
            partitions[pid] = {
                "file": row["file"],
                "delta_files": [],
                "gtid_watermark": prev["gtid_watermark"],
                "rows": int(row["rows"]),
                "content_hash": row["content_hash"],
                "events_applied": 0,
            }
        manifest = dict(m)
        manifest["epoch"] = epoch
        manifest["partitions"] = partitions
        manifest["compaction"] = True
        sink.commit_manifest(self.root, manifest)
        return {"compacted": len(rows), "epoch": epoch}

    @_leased
    def purge(self, doc_ids) -> dict:
        """Right-to-be-forgotten: PHYSICALLY expunge keys from the
        table and its history (the GDPR DELETE+VACUUM pair — distinct
        from a tombstone delete, which removes a key from state but
        leaves its bytes in immutable history files).

        Two steps, each crash-safe:

        1. Rewrite — only the hash-matching partitions are touched:
           each affected partition's base + deltas resolve to current
           state (deltas fold, so purged rows don't survive in
           fragments), the keys filter out vectorized, and a fresh
           epoch-tagged base lands; untouched partitions carry
           forward.  Committed as a new epoch.
        2. Vacuum — every state file NOT referenced by the new
           manifest is deleted, whatever partition numbering it used
           (a prior ``repartition()`` means a purged key's bytes may
           sit in ANY historical file, so the vacuum must be total,
           not per-partition).  Historical manifests stay (metadata
           only — no payload); ``read(as_of=...)`` on a pre-purge
           epoch now fails with the standard gc'd-snapshot error.

        Watermarks are untouched, so REPLAYING old shards cannot
        resurrect a purged key (events ≤ watermark skip); a genuinely
        NEW upstream event for the key re-creates it — purge is
        point-in-time, not a tombstone registry.  Derived stores can
        NOT follow through the changefeed (diffing against the
        pre-purge snapshot would need exactly the files the vacuum
        destroyed) — each derived store purges directly
        (``InvertedIndex.purge_docs``), mirroring how a Lucene
        deployment deletes documents from the index itself.
        """
        keys = sorted(set(doc_ids))
        m = self.manifest()
        if not m:
            raise ValueError("nothing committed yet — apply() first")
        if not keys:
            return {"purged_partitions": 0, "files_removed": 0,
                    "epoch": int(m["epoch"])}
        P = self._num_partitions(m)
        parts = sorted(set(
            partition_of(pa.array(keys, type=pa.string()), P).tolist()))
        epoch = m["epoch"] + 1
        frags = self._partition_fragments(m)
        todo = {p: frags[p] for p in parts if p in frags}
        keys_ref = ray.put(keys)
        root = self.root

        class PurgeWrite:
            def __call__(self, batch: pa.Table) -> pa.Table:
                from rookray.util import stable_table_hash
                kset = pa.array(ray.get(keys_ref), type=pa.string())
                out = []
                for part in batch.column("part").to_pylist():
                    state = _resolve_partition(root, *todo[int(part)])
                    if state is None:
                        continue
                    keep = pc.invert(pc.is_in(state.column("doc_id"),
                                              value_set=kset))
                    filtered = state.filter(keep)
                    path = sink.state_file(root, int(part), epoch)
                    sink.atomic_write_parquet(filtered, path)
                    out.append({
                        "partition": int(part),
                        "file": os.path.relpath(path, root),
                        "rows": len(filtered),
                        "content_hash": stable_table_hash(filtered),
                    })
                return pa.Table.from_pylist(out, schema=_COMPACT_SCHEMA)

        pw = PurgeWrite()
        pw.__name__ = "PurgeWrite"
        rows = []
        if todo:
            rows = (ray.data.from_items([{"part": p} for p in sorted(todo)])
                    .repartition(len(todo))
                    .map_batches(pw, batch_format="pyarrow", batch_size=1,
                                 concurrency=min(16, len(todo)))
                    .take_all())
        partitions = dict(m["partitions"])
        purged_rows = 0
        for row in rows:
            pid = str(int(row["partition"]))
            prev = partitions[pid]
            purged_rows += int(prev["rows"]) - int(row["rows"])
            partitions[pid] = {
                "file": row["file"],
                "delta_files": [],
                "gtid_watermark": prev["gtid_watermark"],
                "rows": int(row["rows"]),
                "content_hash": row["content_hash"],
                "events_applied": 0,
            }
        manifest = dict(m)
        manifest["epoch"] = epoch
        manifest["partitions"] = partitions
        manifest["purge"] = {"keys": len(keys),
                             "partitions": sorted(todo)}
        sink.commit_manifest(self.root, manifest)

        # total vacuum: nothing but the new manifest's files survives
        referenced = set()
        for p in partitions.values():
            if p.get("file"):
                referenced.add(os.path.join(self.root, p["file"]))
            for d in p.get("delta_files", ()):
                referenced.add(os.path.join(self.root, d))
        removed = 0
        state_dir = os.path.join(self.root, "state")
        if os.path.isdir(state_dir):
            for name in sorted(os.listdir(state_dir)):
                path = os.path.join(state_dir, name)
                if path not in referenced:
                    os.unlink(path)
                    removed += 1
        # GDPR follow-through for the QUARANTINE audit files: a
        # gated row carries its full payload there, so the purge must
        # sweep those too or the key's bytes survive the vacuum
        q_purged = self._sweep_quarantine(keys)
        return {"epoch": epoch, "purged_rows": int(purged_rows),
                "purged_partitions": len(rows), "files_removed": removed,
                "quarantine_rows_purged": q_purged}

    def _quarantine_purged_keys(self) -> tuple:
        """GDPR tombstones for the quarantine: keys past purges swept
        (replays must never re-write their audit bytes)."""
        path = os.path.join(self.root, "quarantine", "_purged.json")
        if not os.path.exists(path):
            return ()
        with open(path) as f:
            return tuple(json.load(f))

    def _sweep_quarantine(self, keys) -> int:
        """Drop the given doc_ids from every quarantine audit file
        (rewrite or delete-if-empty) and tombstone them so replays
        cannot re-quarantine their bytes.  Returns rows removed."""
        import glob as _glob
        qdir = os.path.join(self.root, "quarantine")
        kset = pa.array(sorted(set(keys)), type=pa.string())
        removed = 0
        for f in sorted(_glob.glob(os.path.join(qdir, "q-*.parquet"))):
            t = pq.read_table(f)
            hit = pc.is_in(t.column("doc_id"), value_set=kset)
            if not pc.any(hit).as_py():
                continue
            kept = t.filter(pc.invert(hit))
            removed += len(t) - len(kept)
            if len(kept):
                sink.atomic_write_parquet(kept, f)
            else:
                os.unlink(f)
        if os.path.isdir(qdir):
            merged = sorted(set(self._quarantine_purged_keys())
                            | set(keys))
            sink.atomic_write_json(merged,
                                   os.path.join(qdir, "_purged.json"))
        return removed

    @_leased
    def quarantine_clear(self) -> int:
        """Drop ALL quarantine audit files (e.g. after the documented
        restore-and-reapply remediation has re-ingested them, or after
        the audit has been archived elsewhere) — the files otherwise
        accumulate across replays (distinct batchings of the same rows
        write distinct content-named files; reads dedupe, disk does
        not).  Returns files removed."""
        import glob as _glob
        qdir = os.path.join(self.root, "quarantine")
        files = sorted(_glob.glob(os.path.join(qdir, "q-*.parquet")))
        for f in files:
            os.unlink(f)
        return len(files)

    def export(self, out_dir: str, partition_col: str = "source",
               as_of: int | None = None) -> dict:
        """Hand the committed state off as a clean hive-partitioned
        parquet dataset (``out_dir/<col>=<value>/*.parquet``) — the
        training-consumption layout (resumable readers skip finished
        partitions; no engine metadata rides along).  One distributed
        pass via ``Dataset.write_parquet(partition_cols=...)``; meta
        columns dropped.  Returns per-partition-value row counts."""
        ds = self.read(as_of=as_of)
        ds.write_parquet(out_dir, partition_cols=[partition_col])
        import glob as _glob
        counts = {}
        for d in sorted(_glob.glob(os.path.join(
                out_dir, f"{partition_col}=*"))):
            val = os.path.basename(d).split("=", 1)[1]
            rows = sum(pq.read_metadata(f).num_rows
                       for f in _glob.glob(os.path.join(d, "*.parquet")))
            counts[val] = rows
        return {"partition_col": partition_col, "rows": sum(counts.values()),
                "partitions": counts}

    def quarantine_table(self) -> pa.Table:
        """Rows diverted by ``CDCConfig.expect_fn``, deduped by gtid
        (distinct batchings of the same retried rows may land in more
        than one audit file) and sorted by gtid — the audit surface of
        the expectations gate.

        Re-ingesting after fixing a gate: quarantined gtids sit BELOW
        the committed watermark (the epoch that skipped them still
        advanced), so merely re-presenting their shards is a no-op.
        The sanctioned path is ``restore(epoch)`` to the snapshot
        before the bad epoch, then re-``apply`` the shards under the
        corrected expectation — restore resets the watermarks, and
        applies are idempotent for everything else.  After the
        remediation call :meth:`quarantine_clear` or the stale audit
        rows keep reporting (re-ingested) rows as quarantined.

        With nothing quarantined the returned table has only a typed
        empty ``gtid`` column (the full event schema is unknowable
        without files) — check ``len()`` before touching payload
        columns."""
        import glob as _glob
        qdir = os.path.join(self.root, "quarantine")
        files = sorted(_glob.glob(os.path.join(qdir, "q-*.parquet")))
        if not files:
            return pa.table({"gtid": pa.array([], type=pa.int64())})
        t = pa.concat_tables([pq.read_table(f) for f in files],
                             promote_options="default")
        t = t.sort_by("gtid")
        g = t.column("gtid").to_numpy(zero_copy_only=False)
        keep = np.concatenate([[True], g[1:] != g[:-1]])
        return t.filter(pa.array(keep))

    def metrics(self) -> dict:
        """Operational snapshot served ENTIRELY from the committed
        manifest (state bytes come from file sizes; the only data
        read is the gtid COLUMN of quarantine audit files — cheap to
        poll): per-partition lineage (rows, gtid watermark, delta
        backlog, last events_applied) plus table-level ingest metrics
        — the "resumable from checkpoint with per-partition lineage +
        metrics" surface of the north rule.  ``watermark_skew`` is
        max−min per-partition watermark (a stalled partition shows up
        here before it shows up as data loss); ``delta_backlog_files``
        is what ``compact(min_deltas=...)`` would drain.  ``rows`` are
        the manifest-recorded FRAGMENT rows: in delta (merge-on-read)
        mode they include tombstones and superseded versions until
        compaction, so rows ≥ live rows — equality after
        ``compact()``."""
        m = self.manifest()
        if m is None:
            return {"committed": False}
        parts = m["partitions"]
        wms = [int(p["gtid_watermark"]) for p in parts.values()]
        state_bytes = 0
        per_part = {}
        for pid, p in sorted(parts.items(), key=lambda kv: int(kv[0])):
            rels = ([p["file"]] if p.get("file") else []) \
                + list(p.get("delta_files", ()))
            sz = sum(os.path.getsize(os.path.join(self.root, r))
                     for r in rels if os.path.exists(os.path.join(self.root, r)))
            state_bytes += sz
            per_part[int(pid)] = {
                "rows": int(p["rows"]),
                "gtid_watermark": int(p["gtid_watermark"]),
                "delta_files": len(p.get("delta_files", ())),
                "events_applied": int(p.get("events_applied", 0)),
                "bytes": sz,
            }
        return {
            "committed": True,
            "epoch": int(m["epoch"]),
            "num_partitions": int(m["num_partitions"]),
            "rows": sum(int(p["rows"]) for p in parts.values()),
            "state_bytes": state_bytes,
            "closed_watermark": int(m["closed_watermark"]),
            "max_gtid_seen": int(m["max_gtid_seen"]),
            "watermark_min": min(wms) if wms else -1,
            "watermark_max": max(wms) if wms else -1,
            "watermark_skew": (max(wms) - min(wms)) if wms else 0,
            "delta_backlog_files": sum(len(p.get("delta_files", ()))
                                       for p in parts.values()),
            "epochs_retained": len(self.epochs()),
            "quarantined_rows": self._quarantined_count(),
            "partitions": per_part,
        }

    def _quarantined_count(self) -> int:
        """Distinct quarantined events, reading ONLY the gtid column
        of the audit files (metrics stays cheap to poll even with a
        large quarantine backlog of full row payloads)."""
        import glob as _glob
        qdir = os.path.join(self.root, "quarantine")
        files = sorted(_glob.glob(os.path.join(qdir, "q-*.parquet")))
        if not files:
            return 0
        gtids = np.concatenate([
            pq.read_table(f, columns=["gtid"]).column("gtid")
            .to_numpy(zero_copy_only=False) for f in files])
        return int(np.unique(gtids).size)

    @_leased
    def repartition(self, new_partitions: int) -> dict:
        """Re-shard the committed state into a different partition
        count — the ONLY sanctioned way to change ``num_partitions``
        (the committed manifest value is otherwise authoritative, see
        ``_num_partitions``).  One distributed pass: read state,
        re-hash by ``doc_id``, write one state file per new partition,
        commit as a new epoch.

        New per-partition watermarks are set to the MIN of the old
        ones — conservatively low is safe: re-presented events merge
        idempotently (LWW against state ``_gtid`` ties/newer wins)."""
        m = self.manifest()
        if not m:
            raise ValueError("nothing committed yet — apply() first")
        if self._has_deltas(m):
            raise ValueError("table has uncompacted deltas; run compact() "
                             "before repartitioning")
        epoch = m["epoch"] + 1
        old_wms = [p["gtid_watermark"] for p in m["partitions"].values()]
        new_wm = min(old_wms) if old_wms else -1

        def add_part(batch: pa.Table) -> pa.Table:
            part = partition_of(batch.column("doc_id"), new_partitions)
            return batch.append_column("part", pa.array(part, pa.int32()))

        class RepartWrite:
            def __init__(self, root: str, ep: int):
                self.root, self.ep = root, ep

            def __call__(self, group: pa.Table) -> pa.Table:
                from rookray.util import stable_table_hash
                if len(group) == 0:
                    return pa.Table.from_pylist([], schema=_COMPACT_SCHEMA)
                part = int(group.column("part")[0].as_py())
                state = group.drop_columns(["part"])
                path = sink.state_file(self.root, part, self.ep)
                sink.atomic_write_parquet(state, path)
                return pa.Table.from_pylist([{
                    "partition": part,
                    "file": os.path.relpath(path, self.root),
                    "rows": len(state),
                    "content_hash": stable_table_hash(state),
                }], schema=_COMPACT_SCHEMA)

        rw = RepartWrite(self.root, epoch)
        rw.__name__ = "RepartWrite"
        rows = (self.read(include_meta=True)
                .map_batches(add_part, batch_format="pyarrow",
                             zero_copy_batch=True)
                .groupby("part").map_groups(rw, batch_format="pyarrow")
                .take_all())
        partitions = {}
        for row in rows:
            partitions[str(int(row["partition"]))] = {
                "file": row["file"],
                "rows": int(row["rows"]),
                "content_hash": row["content_hash"],
                "gtid_watermark": new_wm,
                "events_applied": 0,
            }
        manifest = dict(m)
        manifest["epoch"] = epoch
        manifest["num_partitions"] = new_partitions
        manifest["partitions"] = partitions
        manifest["repartitioned_from"] = int(m["num_partitions"])
        sink.commit_manifest(self.root, manifest)
        return {"epoch": epoch, "num_partitions": new_partitions,
                "partitions_written": len(rows)}

    def _empty_state(self) -> pa.Table:
        fields = list(SEQ_SCHEMA)
        return pa.table({f.name: pa.array([], f.type) for f in fields})

    def watermarks(self) -> np.ndarray:
        m = self.manifest()
        wms = np.full(self._num_partitions(m), -1, dtype=np.int64)
        if m:
            for pid, p in m["partitions"].items():
                wms[int(pid)] = p["gtid_watermark"]
        return wms

    # ------------------------------------------------------------ apply

    def apply_derived(self, events: "Sequence[str] | ray.data.Dataset",
                      transform, epoch: int | None = None) -> dict:
        """Apply with a derived-row transform in front of the merge —
        the derived-index maintenance path (targets/derived.py)."""
        return self.apply(events, epoch=epoch, transform=transform)

    @_leased
    def apply(self, events: "Sequence[str] | ray.data.Dataset",
              epoch: int | None = None, transform=None) -> dict:
        """Apply one epoch of change events exactly-once.

        ``events``: parquet shard paths (preferred — enables pruned
        column reads for the tx-watermark pass) or a Dataset of raw
        change events.  Replaying shards that overlap previously
        committed gtids is safe (watermark skip); events in
        transactions that are incomplete within this epoch are held
        back and must be re-presented in a later epoch.
        """
        import time as _time

        _phase_t = _time.perf_counter()
        _timings: dict[str, float] = {}

        def _lap(name: str) -> None:
            nonlocal _phase_t
            now = _time.perf_counter()
            _timings[name] = round(now - _phase_t, 3)
            _phase_t = now

        cfg = self.config
        m = self.manifest()
        if epoch is None:
            epoch = (m["epoch"] + 1) if m else 0
        if cfg.write_mode == "delta" and (cfg.merge_strategy != "actors" or cfg.salt):
            raise ValueError("delta write mode requires the external-shuffle "
                             "merge path (merge_strategy='actors', salt=0)")
        if cfg.write_mode == "rewrite" and self._has_deltas(m):
            raise ValueError("table has uncompacted deltas; run compact() "
                             "before switching to rewrite mode")

        # the prior closed watermark is the tx-completeness floor:
        # members of a tx at or below it were already applied
        floor = -1
        if m and m.get("closed_watermark") is not None:
            floor = m["closed_watermark"]
        tx_cols = ["gtid", "tx_id", "seq_in_tx", "tx_events"]
        shard_schemas: list[pa.Schema] | None = None
        if isinstance(events, (list, tuple)):
            # footer-only schema reads: additive evolution means shards
            # disagree; the unified payload must see every variant.
            # Threaded past a few hundred shards (page-cached local
            # footers are cheaper serial; on ms-latency shared storage
            # or 10^5-file epochs the thread pool is the difference
            # between sub-second and minutes)
            if len(events) > 512:
                from concurrent.futures import ThreadPoolExecutor
                with ThreadPoolExecutor(32) as _ex:
                    shard_schemas = list(_ex.map(pq.read_schema, events))
            else:
                shard_schemas = [pq.read_schema(p) for p in events]
            renames = dict(cfg.column_renames)
            if renames:
                if "doc_id" in renames or "doc_id" in renames.values():
                    raise ValueError("cannot rename the merge key doc_id")
                from rookray.events import rename_event_schema
                shard_schemas = [rename_event_schema(s, renames)
                                 for s in shard_schemas]
            if all("key" in s.names for s in shard_schemas):
                # prune at the read: the merge path never needs the
                # before struct / db / tx bookkeeping columns (watermark
                # uses footer stats or its own pruned scan)
                read_cols = ["gtid", "tx_id", "server_id", "table", "op",
                             "key", "after"]
            else:
                read_cols = None
            # widened payload types across shards need grouped
            # conform-reads; purely-additive differences do not
            shard_union = unified_payload(shard_schemas)
            widened = any(
                f.type != shard_union.field(f.name).type
                for s in shard_schemas for f in payload_schema_of(s)
            )
            if widened:
                raw = _read_shards_conformed(list(events), shard_schemas,
                                             read_cols, renames)
            else:
                raw = ray.data.read_parquet(list(events), columns=read_cols)
                if renames:
                    from rookray.events import RenameEvents
                    raw = raw.map_batches(RenameEvents(renames),
                                          batch_format="pyarrow",
                                          zero_copy_batch=True)
            if cfg.tx_atomic:
                # footer-statistics fast path: O(#shards) + one row read;
                # falls back to the scanning path on unusable stats
                fast = txn.closed_watermark_from_stats(list(events), floor)
                if fast is not None:
                    closed_wm, max_gtid = fast
                else:
                    tx_ds = ray.data.read_parquet(list(events), columns=tx_cols)
                    closed_wm, max_gtid = txn.closed_watermark(tx_ds, floor)
            else:
                closed_wm, max_gtid = 2**62, -1
        else:
            raw = events
            if cfg.column_renames:
                if any("doc_id" in pair for pair in cfg.column_renames):
                    raise ValueError("cannot rename the merge key doc_id")
                from rookray.events import RenameEvents
                raw = raw.map_batches(RenameEvents(dict(cfg.column_renames)),
                                      batch_format="pyarrow",
                                      zero_copy_batch=True)
            if cfg.tx_atomic:
                closed_wm, max_gtid = txn.closed_watermark(
                    raw.select_columns(tx_cols), floor
                )
            else:
                closed_wm, max_gtid = 2**62, -1

        _lap("watermark_sec")
        payload = self._unified_payload(raw, shard_schemas,
                                        include_prior=transform is None)
        ncfg = NormalizeConfig(
            table=cfg.table,
            ignored_tables=cfg.ignored_tables,
            ignored_server_ids=cfg.ignored_server_ids,
            payload=payload,
        )
        if transform is None:
            manifest_payload = payload
        else:
            # the lake's schema is the DERIVED schema: probe the
            # transform with an empty flat batch, unify with prior
            from rookray.schema import flat_event_fields
            empty = pa.table(
                {n: pa.array([], t) for n, t in flat_event_fields(payload)}
            )
            out_schema = transform(empty).schema
            head = {"gtid", "split", "tx_id", "op", "part"}
            derived = pa.schema([f for f in out_schema if f.name not in head])
            schemas = [derived]
            if m:
                schemas.insert(0, self._manifest_payload(m))
            manifest_payload = unify_additive(schemas)
        P = self._num_partitions(m)
        wms = self.watermarks()
        qdir = None
        purged_keys = ()
        if cfg.expect_fn is not None:
            if transform is not None:
                raise ValueError(
                    "expect_fn does not compose with a derived-row "
                    "transform (the transform may remap doc_id, which "
                    "breaks the gate's quarantine placement guarantees); "
                    "gate the primary table and derive from it instead")
            qdir = os.path.join(self.root, "quarantine")
            os.makedirs(qdir, exist_ok=True)
            purged_keys = self._quarantine_purged_keys()
        stage = PartitionStage(ncfg, P, wms, closed_wm,
                               transform=transform,
                               expect_fn=cfg.expect_fn,
                               quarantine_dir=qdir,
                               purged_keys=purged_keys)
        prior_files, prior_wms = {}, {}
        if m:
            for pid, p in m["partitions"].items():
                prior_files[int(pid)] = p["file"]
                prior_wms[int(pid)] = p["gtid_watermark"]

        use_shuffle_files = cfg.merge_strategy == "actors" and cfg.salt == 0
        if use_shuffle_files:
            # external shuffle: partials to disk, then a parallel
            # per-partition reduce (no all-to-all sort barrier — its
            # wall time dominated the epoch; measured 2-3x faster)
            import hashlib as _hashlib
            import shutil as _shutil

            base = cfg.shuffle_dir or os.environ.get("ROOKRAY_SHUFFLE_DIR")
            if base is None:
                # single-node default: tmpfs.  On a multi-node cluster
                # set shuffle_dir (or $ROOKRAY_SHUFFLE_DIR) to the same
                # shared storage the lake lives on — partials written by
                # map tasks on one node must be readable by reducers on
                # another.  cfg.shuffle_dir="lake" is shorthand for that.
                base = "/dev/shm" if os.path.isdir("/dev/shm") else self.root
            elif base == "lake":
                base = self.root
            tag = _hashlib.md5(self.root.encode()).hexdigest()[:10]
            # key the dir by the input shard set too: an aborted earlier
            # attempt of the SAME epoch with a DIFFERENT shard list must
            # not leave partials that FinalizeMerge would silently merge
            if isinstance(events, (list, tuple)):
                in_digest = _hashlib.md5(
                    "\n".join(sorted(map(str, events))).encode()
                ).hexdigest()[:10]
            else:
                import uuid
                in_digest = uuid.uuid4().hex[:10]
            epoch_root = os.path.join(base, "rookray-shuffle", tag,
                                      f"epoch-{epoch:06d}")
            # clear stale partials of any prior attempt of this epoch
            _shutil.rmtree(epoch_root, ignore_errors=True)
            shuffle_dir = os.path.join(epoch_root, in_digest)
            writer = ShuffleWriter(stage, shuffle_dir)
            routed = raw.map_batches(
                writer, batch_format="pyarrow",
                batch_size=cfg.router_batch_size, zero_copy_batch=True,
            )
            _lap("plan_sec")
            routed.take_all()  # tiny per-partial counts; drives the map side
            _lap("shuffle_map_sec")
            parts_ds = ray.data.from_items(
                [{"part": p} for p in range(P)]
            ).repartition(P)
            fin = FinalizeMerge(self.root, epoch, shuffle_dir,
                                prior_files, prior_wms,
                                write_mode=cfg.write_mode)
            # reducer pool sizing by write mode: REWRITE reducers do
            # large synchronous parquet writes, so oversubscribing CPUs
            # overlaps the I/O waits (measured fine at 64 actors / 16
            # CPUs); DELTA reducers write small files and the per-epoch
            # actor spawn dominates instead — cap at the CPU count
            # (measured: 4-epoch 24M delta ingest 74.7s -> 44.3s)
            if cfg.write_mode == "delta":
                try:
                    cpus = int(ray.cluster_resources().get("CPU", 8))
                except Exception:
                    cpus = 8
                n_actors = min(cfg.merge_actors, P, max(4, cpus))
            else:
                n_actors = min(cfg.merge_actors, P)
            lineage_tbls = parts_ds.map_batches(
                fin, batch_format="pyarrow", batch_size=1,
                concurrency=n_actors,
            )
            lineage_rows = lineage_tbls.take_all()
            _lap("reduce_sec")
            _shutil.rmtree(epoch_root, ignore_errors=True)
        else:
            flat = raw.map_batches(
                stage, batch_format="pyarrow", batch_size=cfg.batch_size,
                zero_copy_batch=True,
            )
            if cfg.salt > 0:
                from rookray.skew import salted_premerge
                flat = salted_premerge(flat, cfg.salt)
            mw = MergeWrite(self.root, epoch, prior_files, prior_wms)
            mw.__name__ = "MergeWrite"  # ray's map_groups wrapper wants one
            lineage_ds = flat.groupby("part").map_groups(mw, batch_format="pyarrow")
            _lap("plan_sec")
            lineage_rows = lineage_ds.take_all()
            _lap("merge_sec")

        partitions = dict(m["partitions"]) if m else {}
        applied = 0
        for row in lineage_rows:
            applied += int(row["events_applied"])
            pid = str(int(row["partition"]))
            entry = {
                "gtid_watermark": int(row["gtid_watermark"]),
                "rows": int(row["rows"]),
                "content_hash": row["content_hash"],
                "events_applied": int(row["events_applied"]),
            }
            if row.get("kind") == "delta":
                # merge-on-read: keep the prior base + accumulate deltas
                prev = partitions.get(pid, {})
                entry["file"] = prev.get("file")
                entry["delta_files"] = list(prev.get("delta_files", ())) + [row["file"]]
            else:
                entry["file"] = row["file"]
            partitions[pid] = entry
        manifest = {
            "epoch": epoch,
            "table": cfg.table,
            "num_partitions": P,
            "closed_watermark": int(closed_wm) if closed_wm < 2**62 else None,
            "max_gtid_seen": int(max_gtid),
            "partitions": partitions,
            # lossless payload schema (Arrow IPC, base64) — the string
            # round-trip through a fixed type map broke on any type
            # outside it (list<string>, date32, tz timestamps), leaving
            # the table permanently un-appendable
            "payload_schema_ipc": _schema_to_b64(manifest_payload),
            # readable duplicate for humans/debugging (never parsed back)
            "payload_schema": [[f.name, str(f.type)] for f in manifest_payload],
        }
        sink.commit_manifest(self.root, manifest)
        _lap("commit_sec")
        return {
            "epoch": epoch,
            "closed_watermark": manifest["closed_watermark"],
            "max_gtid_seen": max_gtid,
            "events_applied": applied,
            "partitions_touched": len(lineage_rows),
            # per-epoch wall-time breakdown (driver-observed): where an
            # epoch spends its time — the ops-metrics counterpart of the
            # per-partition lineage rows
            "timings": _timings,
        }

    def _unified_payload(self, raw: "ray.data.Dataset",
                         shard_schemas: list[pa.Schema] | None = None,
                         include_prior: bool = True) -> pa.Schema:
        if shard_schemas:
            schemas = [unified_payload(shard_schemas)]
        else:
            schemas = [payload_schema_of(raw.schema().base_schema)]
        m = self.manifest()
        if m and include_prior:
            # prior payload schema participates in additive unification
            schemas.insert(0, self._manifest_payload(m))
        return unify_additive(schemas)

    @staticmethod
    def _manifest_payload(m: dict) -> pa.Schema:
        ipc = m.get("payload_schema_ipc")
        if ipc is not None:
            return _schema_from_b64(ipc)
        # manifests committed before the IPC field existed: parse the
        # readable [name, str(type)] list through the legacy type map
        return pa.schema([pa.field(n, _parse_type(t)) for n, t in m["payload_schema"]])


def _schema_to_b64(schema: pa.Schema) -> str:
    """Lossless schema persistence: Arrow IPC bytes, base64-encoded.
    Round-trip validated so a bad encode fails at commit time, not at
    the next apply()."""
    import base64
    b = base64.b64encode(schema.serialize().to_pybytes()).decode("ascii")
    rt = _schema_from_b64(b)
    if rt != schema:
        raise ValueError(f"schema IPC round-trip mismatch: {schema} != {rt}")
    return b


def _schema_from_b64(s: str) -> pa.Schema:
    import base64
    return pa.ipc.read_schema(pa.BufferReader(base64.b64decode(s)))


# legacy (pre-IPC) manifest support only — never written anymore
_TYPES = {
    "string": pa.string(),
    "large_string": pa.large_string(),
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "bool": pa.bool_(),
    "list<element: int32>": pa.list_(pa.int32()),
    "list<item: int32>": pa.list_(pa.int32()),
    "list<element: int64>": pa.list_(pa.int64()),
    "list<element: float>": pa.list_(pa.float32()),
    "list<element: double>": pa.list_(pa.float64()),
    "timestamp[us]": pa.timestamp("us"),
}


def _parse_type(s: str) -> pa.DataType:
    try:
        return _TYPES[s]
    except KeyError:
        raise ValueError(f"unsupported persisted type {s!r}") from None
