"""Vectorized hashing / canonicalization utilities.

Everything here must be deterministic across processes and machines
(no Python builtin ``hash`` — PYTHONHASHSEED randomizes str hashing),
and vectorized (no per-row Python in hot paths).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_MAX_LEN = 4096


def _pow_table(base: int) -> np.ndarray:
    pows = np.empty(_MAX_LEN, dtype=np.uint64)
    p = 1
    for i in range(_MAX_LEN):  # python-int modular pow avoids overflow warnings
        pows[i] = p
        p = (p * base) % (1 << 64)
    return pows


_BASE = np.uint64(1099511628211)  # FNV prime, used as polynomial base
#: per-variant (pow table, length-mix salt): variant 1 uses an
#: independent base so (h0, h1) is an effective 128-bit key — exact
#: dedup at 10¹⁰ docs collides a single 64-bit hash (birthday bound),
#: the pair doesn't
_VARIANTS = (
    (_pow_table(int(_BASE)), np.uint64(0x9E3779B97F4A7C15)),
    (_pow_table(1000003), np.uint64(0xC2B2AE3D27D4EB4F)),
)
_POWS = _VARIANTS[0][0]


def hash_strings(arr: pa.Array | pa.ChunkedArray, variant: int = 0) -> np.ndarray:
    """Deterministic 64-bit polynomial hash of each UTF-8 string,
    fully vectorized over the flat value buffer (no per-row loop).

    h(s) = sum_i byte[i] * BASE^(len-1-i)  (mod 2^64), finalized with a
    splitmix-style mix so low bits distribute well for ``% P``.
    ``variant=1`` hashes with an independent base/salt — pair the two
    for an effective 128-bit exact-equality key.

    Strategy: rows sharing a byte-length hash as one (rows × L) matrix
    multiply-sum per distinct length — real key columns have few
    distinct lengths, and the matrix form is 2-10x faster than the
    flat-buffer prefix-sum it replaces (which stays as the fallback
    for pathological length diversity).  Both paths produce identical
    values (the hash is persisted in dedup keys / partition routing and
    re-derived in the DuckDB oracles, so the VALUE is frozen).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.type == pa.large_string():
        arr = arr.cast(pa.string())
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    arr = pa.compute.fill_null(arr, "")
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int32, count=n + 1 + arr.offset)[arr.offset:]
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.zeros(0, np.uint8)
    starts, ends = offsets[:-1].astype(np.int64), offsets[1:].astype(np.int64)
    lens = ends - starts
    pows, salt = _VARIANTS[variant]
    if lens.max(initial=0) >= _MAX_LEN:
        raise ValueError("string too long for vectorized hash")
    uniq = np.unique(lens)
    if len(uniq) > max(64, n // 64):
        # pathological length diversity: per-length batching degrades
        # to per-row gathers — the flat prefix-sum path wins there
        sums = _poly_sums_flat(data, starts, lens, pows)
    else:
        sums = np.zeros(n, dtype=np.uint64)
        for L in uniq:
            if L == 0:
                continue
            sel = np.flatnonzero(lens == L)
            gather = starts[sel][:, None] + np.arange(L, dtype=np.int64)[None, :]
            m = data[gather].astype(np.uint64)
            w = pows[:L][::-1].copy()
            sums[sel] = (m * w[None, :]).sum(axis=1, dtype=np.uint64)
    # finalize (splitmix64) + mix in length
    z = sums + lens.astype(np.uint64) * salt
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _poly_sums_flat(data: np.ndarray, starts: np.ndarray, lens: np.ndarray,
                    pows: np.ndarray) -> np.ndarray:
    """Flat-buffer polynomial sums via one prefix-sum over all bytes —
    O(total bytes) regardless of length distribution."""
    n = len(starts)
    total = int(lens.sum())
    if total == 0:
        return np.zeros(n, dtype=np.uint64)
    pos = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(lens[:-1])]), lens
    )
    weights = pows[(np.repeat(lens, lens) - 1 - pos)]
    seg = data[np.repeat(starts, lens) + pos].astype(np.uint64) * weights
    cum = np.concatenate([[np.uint64(0)], np.cumsum(seg, dtype=np.uint64)])
    bounds = np.concatenate([[0], np.cumsum(lens)])
    return cum[bounds[1:]] - cum[bounds[:-1]]


def partition_of(doc_id: pa.Array | pa.ChunkedArray, num_partitions: int) -> np.ndarray:
    """Stable partition assignment hash(doc_id) % P → int32."""
    return (hash_strings(doc_id) % np.uint64(num_partitions)).astype(np.int32)


def stable_table_hash(tbl: pa.Table, sort_key: str = "doc_id") -> str:
    """Deterministic content hash of a table's logical values.

    Canonicalizes (sort by key, combine chunks, rebuild without slice
    offsets via a serialize round-trip) then md5's the IPC stream.
    Used for per-partition lineage records — self-consistency across
    runs/processes is what matters.
    """
    if sort_key in tbl.column_names and len(tbl) > 1:
        tbl = tbl.sort_by(sort_key)
    tbl = tbl.combine_chunks()
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    # round-trip once to normalize buffer offsets/padding
    buf = sink.getvalue()
    rt = pa.ipc.open_stream(buf).read_all().combine_chunks()
    sink2 = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink2, rt.schema) as w:
        w.write_table(rt)
    return hashlib.md5(sink2.getvalue().to_pybytes()).hexdigest()
