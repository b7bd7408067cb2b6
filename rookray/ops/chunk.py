"""Content-defined chunking (rolling-hash Rabin split).

Splits each document at positions where a windowed polynomial rolling
hash of its bytes hits a mask — so chunk boundaries move WITH the
content: inserting a prefix shifts every byte but reproduces the same
boundaries downstream, which makes chunk-level exact dedup robust to
shifted/edited near-duplicates (the failure mode of fixed-width
shingling; cf. LBFS/FastCDC-style chunking).

Per-document and embarrassingly parallel: the kernel is one vectorized
numpy pass over the batch's flat UTF-8 buffer (no per-row Python, no
shuffle), so the stage streams at 100 TB unchanged.

The rolling hash h(i) = sum_{j=i-W+1..i} gear(b_j) * B^(i-j)  (mod 2^64)
is computed for ALL positions of ALL docs in one pass via the modular
prefix trick: with B odd, P(k) = sum_{j<=k} gear(b_j) * B^(-j) and
h(i) = B^i * (P(i) - P(i-W)).  Gear values are 32-bit so the DuckDB
oracle can reproduce every hash exactly in HUGEINT (a 32x64-bit product
fits 128 bits; 64x64 would not) — see queries.CHUNK_CONTENT_DEFINED_SQL.

Reference scope note: shyiko/rook has no corpus-dedup story at all;
this op belongs to the LLM-training-data extension surface alongside
ops/dedup.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_M64 = 1 << 64
_BASE = 1099511628211  # odd (FNV prime) => invertible mod 2^64
_BINV = pow(_BASE, -1, _M64)
_MAXLEN = 8192
_GEAR_SEED = 0x243F6A8885A308D3  # pi, as splitmix64 stream offset


def _splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) % _M64
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) % _M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) % _M64
    return z ^ (z >> 31)


def gear_table() -> list[int]:
    """256-entry per-byte gear table, 32-bit values (python ints —
    the SQL oracle embeds these literally)."""
    return [_splitmix64(_GEAR_SEED + b) & 0xFFFFFFFF for b in range(256)]


_GEAR = np.array(gear_table(), dtype=np.uint64)


def _pow_tab(base: int) -> np.ndarray:
    out = np.empty(_MAXLEN, dtype=np.uint64)
    p = 1
    for i in range(_MAXLEN):
        out[i] = p
        p = (p * base) % _M64
    return out


_POW_B = _pow_tab(_BASE)
_POW_BINV = _pow_tab(_BINV)


def _flat_utf8(arr: pa.Array | pa.ChunkedArray):
    """(data bytes, per-row lengths) of a string column, zero-copy."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.type == pa.large_string():
        arr = arr.cast(pa.string())
    arr = pc.fill_null(arr, "")
    n = len(arr)
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int32,
                            count=n + 1 + arr.offset)[arr.offset:]
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.zeros(0, np.uint8))
    starts = offsets[:-1].astype(np.int64)
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    return data, starts, lens


def chunk_boundaries(texts: pa.Array | pa.ChunkedArray, window: int = 16,
                     mask_bits: int = 6):
    """Per-doc candidate cut positions (cut AFTER 0-based byte i).

    Returns (cut_doc_row, cut_pos): parallel int64 arrays, sorted by
    (doc row, position).  A position i qualifies iff i in
    [window-1, len-2] and h(i) % 2^mask_bits == 0.
    """
    data, starts, lens = _flat_utf8(texts)
    n = len(lens)
    total = int(lens.sum())
    if total == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    if int(lens.max()) >= _MAXLEN:
        raise ValueError(f"document longer than {_MAXLEN} bytes; raise "
                         "_MAXLEN or pre-split")
    # local position of every flat byte within its doc
    pos = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(lens[:-1])]), lens)
    docrow = np.repeat(np.arange(n, dtype=np.int64), lens)
    flat = data[np.repeat(starts, lens) + pos]  # compacts slice gaps

    terms = _GEAR[flat] * _POW_BINV[pos]          # uint64 wraps mod 2^64
    cum = np.concatenate([[np.uint64(0)], np.cumsum(terms, dtype=np.uint64)])
    k = np.arange(total, dtype=np.int64)
    valid = pos >= window - 1                      # full window in-doc
    # h(i) = B^i * (P(i) - P(i-W)); the cum difference only touches
    # in-doc terms when valid (local i-W+1 >= 0)
    h = (cum[k + 1] - cum[k + 1 - np.minimum(window, k + 1)])
    h = np.where(valid, (h * _POW_B[pos]), np.uint64(1))
    mask = (1 << mask_bits) - 1
    last_byte = pos == np.repeat(lens, lens) - 1   # never cut after the end
    cand = valid & ~last_byte & ((h & np.uint64(mask)) == 0)
    return docrow[cand], pos[cand]


def _assemble(ids: pa.Array, lens: np.ndarray, cut_doc: np.ndarray,
              cut_pos: np.ndarray) -> pa.Table:
    """(doc ids, doc lengths, per-doc cut positions) -> chunk rows."""
    n = len(lens)
    n_cuts = np.bincount(cut_doc, minlength=n).astype(np.int64)
    n_chunks = n_cuts + 1
    offs = np.concatenate([[0], np.cumsum(n_chunks)])
    total = int(offs[-1])
    starts_flat = np.zeros(total, dtype=np.int64)
    if len(cut_doc):
        cut_ord = np.arange(len(cut_doc), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(n_cuts[:-1])]), n_cuts)
        starts_flat[offs[cut_doc] + 1 + cut_ord] = cut_pos + 1
    ends_flat = np.empty(total, dtype=np.int64)
    ends_flat[:-1] = starts_flat[1:]
    ends_flat[offs[1:] - 1] = lens                  # last chunk of each doc
    chunk_id = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], n_chunks)
    idx = np.repeat(np.arange(n, dtype=np.int64), n_chunks)
    return pa.table({
        "doc_id": ids.take(pa.array(idx)),
        "chunk_id": pa.array(chunk_id),
        "chunk_start": pa.array(starts_flat),
        "chunk_len": pa.array(ends_flat - starts_flat),
    })


def _enforce_sizes(cut_doc: np.ndarray, cut_pos: np.ndarray,
                   lens: np.ndarray, min_size: int,
                   max_size: int | None) -> tuple[np.ndarray, np.ndarray]:
    """Greedy FastCDC-style min/max enforcement.  Sequential by nature
    (each accepted cut moves the floor), but the loop runs over SPARSE
    candidates (~len/2^mask_bits of the bytes), not bytes."""
    out_doc, out_pos = [], []
    n = len(lens)
    bounds = np.concatenate([[0], np.cumsum(np.bincount(cut_doc, minlength=n))])
    for d in range(n):
        cuts = cut_pos[bounds[d]:bounds[d + 1]]
        last = -1
        for c in cuts:
            while max_size is not None and c - last > max_size:
                last += max_size                    # forced cut
                out_doc.append(d); out_pos.append(last)
            if c - last >= min_size:
                out_doc.append(d); out_pos.append(int(c))
                last = int(c)
        if max_size is not None:
            end = int(lens[d]) - 1
            while end - last > max_size:
                last += max_size
                out_doc.append(d); out_pos.append(last)
    return (np.array(out_doc, dtype=np.int64),
            np.array(out_pos, dtype=np.int64))


def chunk_strings(texts: pa.Array | pa.ChunkedArray, window: int = 16,
                  mask_bits: int = 6):
    """(chunk substrings, chunk doc row) for a batch of texts.

    Chunks tile each document, so the chunk string array REUSES the
    batch's value buffer zero-copy — only a new offsets vector is
    built; no substring bytes are materialized."""
    data, starts, lens = _flat_utf8(texts)
    n = len(lens)
    if n and not np.array_equal(starts[1:], starts[:-1] + lens[:-1]):
        # non-contiguous values (sliced input): compact once
        total = int(lens.sum())
        pos = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(lens[:-1])]), lens)
        data = data[np.repeat(starts, lens) + pos]
        starts = np.concatenate([[0], np.cumsum(lens[:-1])])
    cut_doc, cut_pos = chunk_boundaries(texts, window, mask_bits)
    n_cuts = np.bincount(cut_doc, minlength=n).astype(np.int64)
    n_chunks = n_cuts + 1
    offs = np.concatenate([[0], np.cumsum(n_chunks)])
    total_chunks = int(offs[-1])
    local_start = np.zeros(total_chunks, dtype=np.int64)
    if len(cut_doc):
        cut_ord = np.arange(len(cut_doc), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(n_cuts[:-1])]), n_cuts)
        local_start[offs[cut_doc] + 1 + cut_ord] = cut_pos + 1
    docrow = np.repeat(np.arange(n, dtype=np.int64), n_chunks)
    if n == 0:
        return pa.array([], pa.string()), docrow
    abs_start = starts[docrow] + local_start
    end = int(starts[-1] + lens[-1])
    offsets = np.concatenate([abs_start, [end]])
    base = int(offsets[0])
    off32 = (offsets - base).astype(np.int32)
    chunk_arr = pa.StringArray.from_buffers(
        total_chunks, pa.py_buffer(off32), pa.py_buffer(data[base:end]))
    return chunk_arr, docrow


def dup_chunk_stats(ds, window: int = 16, mask_bits: int = 6,
                    col: str = "text", id_col: str = "doc_id",
                    buckets: int = 64):
    """Per-document duplicated-CHUNK statistics: for each document, its
    content-defined chunk count and how many of those chunks also
    appear in ANOTHER document — the shift-robust analog of
    ``ops.dedup.dup_ngram_stats`` (an inserted prefix no longer makes
    every fixed-width shingle unique).

    Returns (id_col, n_chunks, n_dup_chunks).  Scale shape mirrors
    dup_ngram_stats: chunks hash to a 2x64-bit key per batch (the
    chunk STRING never shuffles), one coarse-bucket groupby flags
    cross-document keys, one per-doc sum.
    """
    import pandas as pd
    from ray.data.aggregate import Sum
    from rookray.util import hash_strings

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        chunks, docrow = chunk_strings(batch.column(col), window, mask_bits)
        if len(chunks) == 0:
            return pa.table({"h1": pa.array([], pa.int64()),
                             "h2": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "n_pos": pa.array([], pa.int64()),
                             "bkt": pa.array([], pa.int64())})
        h1 = hash_strings(chunks, 0).astype(np.int64)
        h2 = hash_strings(chunks, 1).astype(np.int64)
        df = pd.DataFrame({"h1": h1, "h2": h2, id_col: ids[docrow]})
        g = (df.groupby(["h1", "h2", id_col], sort=False).size()
             .rename("n_pos").reset_index())
        g["bkt"] = (g["h1"].to_numpy().astype(np.uint64)
                    % np.uint64(buckets)).astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    hashed = ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)

    def flag_bucket(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        # one row per (chunk, doc) globally (a document is one input
        # row), so group size IS the chunk's distinct-doc count
        nd = df.groupby(["h1", "h2"], sort=False)["n_pos"].transform("size")
        dup = np.where(nd.to_numpy() > 1, df["n_pos"].to_numpy(), 0)
        out = pd.DataFrame({id_col: df[id_col],
                            "n_chunks": df["n_pos"].to_numpy(),
                            "n_dup_chunks": dup})
        p = out.groupby(id_col, sort=False).sum().reset_index()
        return pa.Table.from_pandas(
            p.astype({"n_chunks": np.int64, "n_dup_chunks": np.int64}),
            preserve_index=False)

    return (hashed.groupby("bkt").map_groups(flag_bucket,
                                             batch_format="pyarrow")
            .groupby(id_col)
            .aggregate(Sum("n_chunks", alias_name="n_chunks"),
                       Sum("n_dup_chunks", alias_name="n_dup_chunks")))


class _ChunkBatch:
    def __init__(self, text_col, id_col, window, mask_bits, min_size, max_size):
        self.text_col, self.id_col = text_col, id_col
        self.window, self.mask_bits = window, mask_bits
        self.min_size, self.max_size = min_size, max_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col)
        _, _, lens = _flat_utf8(texts)
        cut_doc, cut_pos = chunk_boundaries(texts, self.window, self.mask_bits)
        if self.min_size or self.max_size is not None:
            cut_doc, cut_pos = _enforce_sizes(
                cut_doc, cut_pos, lens, self.min_size or 0, self.max_size)
        return _assemble(batch.column(self.id_col).combine_chunks(),
                         lens, cut_doc, cut_pos)


def content_chunks(ds, text_col: str = "text", id_col: str = "doc_id",
                   window: int = 16, mask_bits: int = 6,
                   min_size: int = 0, max_size: int | None = None):
    """Content-defined chunk table:
    (doc_id, chunk_id, chunk_start, chunk_len).

    Boundaries are pure functions of local content (window bytes), so
    the op is a stateless ``map_batches`` — no shuffle, no driver state.
    ``min_size``/``max_size`` switch on greedy FastCDC-style size
    enforcement (engine-only; the oracle-checked query uses the raw
    candidate boundaries, which SQL reproduces hash-for-hash).
    """
    return ds.map_batches(
        _ChunkBatch(text_col, id_col, window, mask_bits, min_size, max_size),
        batch_format="pyarrow",
    )
