"""Deterministic change-event generator (the test/bench binlog).

Plays the role of rook's MySQL master + binlog: it emits a GTID-ordered
stream of insert/update/delete row mutations with correct before/after
images and transaction grouping, as Parquet shards
(MySQLReplicationStream.java:204-282 is the reference event producer;
here the "binlog" is synthesized, seeded and fully deterministic).

Determinism is arithmetic, not stateful: the payload of document ``d``
at its ``r``-th mutation is a pure function ``payload(d, r)``, and the
op sequence per document follows a fixed per-doc cycle
(I, U, ..., U, D, I, U, ...).  That makes both the stream and the
expected final table state computable vectorized, without replay —
``final_state(cfg)`` is the closed-form oracle, while
``rookray.oracle.replay`` is the serial dict-replay oracle mirroring
rook's single-threaded listener semantics.

Scale note: generation is a one-time offline step (bench timings never
include it); everything here is numpy-vectorized so multi-million-event
streams generate in seconds, and ``write_shards`` writes independent
GTID-range shards so reads parallelize.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, asdict, replace

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from rookray.schema import OP_INSERT, OP_UPDATE, OP_DELETE

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — deterministic 64-bit hash, vectorized."""
    z = x.astype(np.uint64) + _GOLDEN
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


@dataclass(frozen=True)
class GenConfig:
    seed: int = 42
    n_docs: int = 1_000
    n_events: int = 10_000
    gtid_start: int = 1
    zipf_a: float = 0.0          # 0 → uniform doc choice; >1 → Zipf hot keys
    noise_pct: int = 0           # % of events on ignored tables/servers
    evolve_at: int | None = None  # gtid from which payload carries `lang`
    min_tokens: int = 16
    max_tokens: int = 128
    vocab: int = 50_257
    db: str = "rook"
    table: str = "sequences"
    n_sources: int = 8
    server_id: int = 1
    noise_server_id: int = 999
    noise_table: str = "ignored_entity"


# ------------------------------------------------------------------ payload

def _tok_len(cfg: GenConfig, doc: np.ndarray, rank: np.ndarray) -> np.ndarray:
    span = cfg.max_tokens - cfg.min_tokens + 1
    h = _mix(doc.astype(np.uint64) * np.uint64(1_000_003) + rank.astype(np.uint64))
    return (cfg.min_tokens + (h % np.uint64(span)).astype(np.int64)).astype(np.int32)


def _payload_arrays(cfg: GenConfig, doc: np.ndarray, rank: np.ndarray,
                    present: np.ndarray | None = None):
    """Vectorized payload(d, r) → (doc_id, tokens, n_tok, source, lang).

    ``present=False`` rows get null scalars and zero-length token lists
    (Parquet requires null struct slots to have zero-length list
    components)."""
    n = len(doc)
    n_tok = _tok_len(cfg, doc, rank)
    lens = n_tok.astype(np.int64)
    null_mask = None
    if present is not None:
        lens = np.where(present, lens, 0)
        null_mask = ~present
    total = int(lens.sum())
    starts = np.concatenate([[0], np.cumsum(lens[:-1])]) if n else np.zeros(0, dtype=np.int64)
    # flat positions 0..L_i-1 within each row
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    base = _mix(doc.astype(np.uint64) * np.uint64(2_654_435_761) + rank.astype(np.uint64) * np.uint64(7_919))
    flat = (np.repeat(base, lens) + pos.astype(np.uint64) * np.uint64(0x9E3779B1)) % np.uint64(cfg.vocab)
    tokens = pa.ListArray.from_arrays(
        pa.array(np.concatenate([[0], np.cumsum(lens)]), type=pa.int32()),
        pa.array(flat.astype(np.int32), type=pa.int32()),
    )
    doc_id = pa.array(np.char.add("doc-", np.char.zfill(doc.astype("U8"), 8)), mask=null_mask)
    source = pa.array(
        np.char.add("src", ((doc * 31 + rank) % cfg.n_sources).astype("U2")), mask=null_mask
    )
    lang = pa.array(np.char.add("l", ((doc + rank) % 5).astype("U1")), mask=null_mask)
    return doc_id, tokens, pa.array(n_tok, type=pa.int32(), mask=null_mask), source, lang


def _cycle_len(doc: np.ndarray) -> np.ndarray:
    return 4 + (_mix(doc.astype(np.uint64)) % np.uint64(4)).astype(np.int64)


def _ops(doc: np.ndarray, rank: np.ndarray) -> np.ndarray:
    """Op at occurrence ``rank`` of ``doc``: fixed I,U..U,D cycle per doc."""
    k = _cycle_len(doc)
    m = rank % k
    op = np.full(len(doc), OP_UPDATE, dtype=np.int8)
    op[m == k - 1] = OP_DELETE
    op[(m == 0)] = OP_INSERT
    op[rank == 0] = OP_INSERT
    return op


# -------------------------------------------------------------- the stream

def _doc_choice(cfg: GenConfig, n_main: int) -> np.ndarray:
    rng = np.random.default_rng(cfg.seed)
    if cfg.zipf_a and cfg.zipf_a > 1.0:
        return (rng.zipf(cfg.zipf_a, size=n_main) - 1) % cfg.n_docs
    return rng.integers(0, cfg.n_docs, size=n_main)


def _main_ranks(doc: np.ndarray) -> np.ndarray:
    """Occurrence rank (0-based cumcount) of each event within its doc."""
    order = np.argsort(doc, kind="stable")
    sorted_doc = doc[order]
    boundaries = np.flatnonzero(np.diff(sorted_doc)) + 1
    starts = np.concatenate([[0], boundaries])
    counts = np.diff(np.concatenate([starts, [len(doc)]]))
    rank_sorted = np.arange(len(doc), dtype=np.int64) - np.repeat(starts, counts)
    rank = np.empty(len(doc), dtype=np.int64)
    rank[order] = rank_sorted
    return rank


def _tx_assignment(cfg: GenConfig, n: int):
    """Deterministic tx grouping: sizes cycle 1..6 by hash of tx index."""
    est = n + 8
    sizes = 1 + (_mix(np.arange(est, dtype=np.uint64) + np.uint64(cfg.seed * 977)) % np.uint64(6)).astype(np.int64)
    ends = np.cumsum(sizes)
    n_tx = int(np.searchsorted(ends, n, side="left")) + 1
    sizes = sizes[:n_tx]
    ends = ends[:n_tx]
    starts = ends - sizes
    sizes[-1] = n - starts[-1]  # clip last tx
    tx_id = np.repeat(np.arange(n_tx, dtype=np.int64), sizes)
    seq_in_tx = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes)
    tx_events = np.repeat(sizes, sizes)
    return tx_id, seq_in_tx.astype(np.int32), tx_events.astype(np.int32)


def _as_array(a):
    """pa.array() on big numpy string inputs returns ChunkedArray —
    StructArray children must be contiguous."""
    return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a


def _struct(arrays: list[pa.Array], with_lang: bool, mask: np.ndarray) -> pa.StructArray:
    names = ["doc_id", "tokens", "n_tok", "source"] + (["lang"] if with_lang else [])
    arrs = [_as_array(a) for a in arrays[: 4 + (1 if with_lang else 0)]]
    return pa.StructArray.from_arrays(arrs, names=names, mask=pa.array(~mask))


def generate_events(cfg: GenConfig) -> pa.Table:
    """Full GTID-ordered change-event table (payload always carries
    ``lang`` when ``evolve_at`` is set — shard writing drops the column
    for pre-evolution shards to exercise true schema evolution)."""
    n = cfg.n_events
    is_noise = (_mix(np.arange(n, dtype=np.uint64) + np.uint64(cfg.seed * 31)) % np.uint64(100)) < np.uint64(cfg.noise_pct)
    main_idx = np.flatnonzero(~is_noise)
    noise_idx = np.flatnonzero(is_noise)
    n_main = len(main_idx)

    doc = np.zeros(n, dtype=np.int64)
    rank = np.zeros(n, dtype=np.int64)
    doc_main = _doc_choice(cfg, n_main)
    rank_main = _main_ranks(doc_main)
    doc[main_idx] = doc_main
    rank[main_idx] = rank_main

    op = np.full(n, OP_INSERT, dtype=np.int8)
    op[main_idx] = _ops(doc_main, rank_main)

    gtid = np.arange(cfg.gtid_start, cfg.gtid_start + n, dtype=np.int64)
    evolved = np.ones(n, dtype=bool) if cfg.evolve_at is None else (gtid >= cfg.evolve_at)

    # after image: present for I and U
    has_after = (op == OP_INSERT) | (op == OP_UPDATE)
    # before image: present for U and D
    has_before = (op == OP_UPDATE) | (op == OP_DELETE)

    after_arrays = list(_payload_arrays(cfg, doc, rank, present=has_after))
    before_arrays = list(_payload_arrays(cfg, doc, np.maximum(rank - 1, 0), present=has_before))

    # noise rows: distinct doc ids on the ignored table / server
    if len(noise_idx):
        noise_docs = pa.array(np.char.add("noise-", noise_idx.astype("U10")))
        for arrays in (after_arrays, before_arrays):
            d = arrays[0].to_numpy(zero_copy_only=False).copy()
            d[noise_idx] = noise_docs.to_numpy(zero_copy_only=False)
            arrays[0] = pa.array(d)

    with_lang = cfg.evolve_at is not None
    after = _struct(after_arrays, with_lang, has_after)
    before = _struct(before_arrays, with_lang, has_before)
    # pre-evolution events carry no lang value even in the full table
    if with_lang:
        def _null_lang(struct_arr, mask):
            fields = {f.name: struct_arr.field(f.name) for f in struct_arr.type}
            lang = fields["lang"].to_numpy(zero_copy_only=False).copy()
            lang[~evolved] = None
            fields["lang"] = pa.array(lang, type=pa.string())
            return pa.StructArray.from_arrays(
                list(fields.values()), names=list(fields.keys()),
                mask=pa.array(~mask))
        after = _null_lang(after, has_after)
        before = _null_lang(before, has_before)

    tx_id, seq_in_tx, tx_events = _tx_assignment(cfg, n)

    server_id = np.full(n, cfg.server_id, dtype=np.int64)
    table = np.full(n, cfg.table, dtype=object)
    if len(noise_idx):
        half = noise_idx[: len(noise_idx) // 2]
        other = noise_idx[len(noise_idx) // 2:]
        table[half] = cfg.noise_table
        server_id[other] = cfg.noise_server_id

    # merge key: before-image doc_id for U/D, after-image doc_id for I
    b_key = before.field("doc_id").to_numpy(zero_copy_only=False)
    a_key = after.field("doc_id").to_numpy(zero_copy_only=False)
    key = pa.array(np.where(has_before, b_key, a_key), type=pa.string())

    return pa.table(
        {
            "gtid": pa.array(gtid),
            "tx_id": pa.array(tx_id),
            "seq_in_tx": pa.array(seq_in_tx),
            "tx_events": pa.array(tx_events),
            "server_id": pa.array(server_id),
            "db": pa.array(np.full(n, cfg.db, dtype=object)),
            "table": pa.array(table.astype("U32")),
            "op": pa.array(op),
            "key": key,
            "before": before,
            "after": after,
        }
    )


def _drop_struct_field(tbl: pa.Table, col: str, field: str) -> pa.Table:
    arr = tbl.column(col).combine_chunks()
    names = [f.name for f in arr.type if f.name != field]
    fields = [arr.field(n) for n in names]
    mask = arr.is_null()
    new = pa.StructArray.from_arrays(fields, names=names, mask=mask)
    return tbl.set_column(tbl.column_names.index(col), col, new)


def write_shards(cfg: GenConfig, out_dir: str, n_shards: int = 8) -> dict:
    """Write the stream as contiguous-GTID Parquet shards + meta.json.

    Pre-evolution shards (every gtid < evolve_at) are written WITHOUT
    the ``lang`` struct field — readers must unify schemas additively.
    """
    os.makedirs(out_dir, exist_ok=True)
    tbl = generate_events(cfg)
    n = len(tbl)
    bounds = np.linspace(0, n, n_shards + 1).astype(int)
    files = []
    for i in range(n_shards):
        shard = tbl.slice(bounds[i], bounds[i + 1] - bounds[i])
        if len(shard) == 0:
            continue
        if cfg.evolve_at is not None:
            last_gtid = shard.column("gtid")[-1].as_py()
            if last_gtid < cfg.evolve_at:
                shard = _drop_struct_field(shard, "before", "lang")
                shard = _drop_struct_field(shard, "after", "lang")
        path = os.path.join(out_dir, f"events-{i:05d}.parquet")
        pq.write_table(shard, path)
        files.append(path)
    meta = {
        "config": asdict(cfg),
        "n_events": n,
        "gtid_min": cfg.gtid_start,
        "gtid_max": cfg.gtid_start + n - 1,
        "files": files,
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


# ------------------------------------------------------------------ oracle

def final_state(cfg: GenConfig) -> pa.Table:
    """Closed-form expected final table state after full replay
    (main-table events only — noise is filtered by config), sorted by
    ``doc_id``.  Column set includes ``lang`` iff ``evolve_at`` is set;
    rows whose winning event predates evolution have null lang."""
    n = cfg.n_events
    is_noise = (_mix(np.arange(n, dtype=np.uint64) + np.uint64(cfg.seed * 31)) % np.uint64(100)) < np.uint64(cfg.noise_pct)
    main_idx = np.flatnonzero(~is_noise)
    doc_main = _doc_choice(cfg, len(main_idx))
    rank_main = _main_ranks(doc_main)
    gtid_main = main_idx + cfg.gtid_start

    # winner per doc = occurrence with max rank
    order = np.lexsort((rank_main, doc_main))
    doc_s, rank_s, gtid_s = doc_main[order], rank_main[order], gtid_main[order]
    last_mask = np.concatenate([doc_s[1:] != doc_s[:-1], [True]])
    doc_w, rank_w, gtid_w = doc_s[last_mask], rank_s[last_mask], gtid_s[last_mask]
    op_w = _ops(doc_w, rank_w)
    alive = op_w != OP_DELETE
    doc_w, rank_w, gtid_w = doc_w[alive], rank_w[alive], gtid_w[alive]

    doc_id, tokens, n_tok, source, lang = _payload_arrays(cfg, doc_w, rank_w)
    cols = {"doc_id": doc_id, "tokens": tokens, "n_tok": n_tok, "source": source}
    if cfg.evolve_at is not None:
        lang_np = lang.to_numpy(zero_copy_only=False).copy()
        lang_np[gtid_w < cfg.evolve_at] = None
        cols["lang"] = pa.array(lang_np, type=pa.string())
    return pa.table(cols).sort_by("doc_id")
