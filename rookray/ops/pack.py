"""Sequence packing — turning the upserted sequence table into
fixed-length training chunks.

The canonical consumer of the north-rule table: concatenate token
arrays into ``context_len``-sized training rows, preserving document
provenance.  Two vectorized per-batch strategies:

* ``split``: every document is chunked independently to
  ``context_len``; the tail chunk is emitted when ≥ ``min_tail``
  tokens (deterministic, embarrassingly parallel, no cross-row state);
* ``pack``: documents within a batch are greedily concatenated into
  full ``context_len`` blocks with an EOS separator; the final
  under-filled block of each batch is emitted as a short block
  (per-batch determinism — no cross-batch carry, so results are
  independent of Ray's block order modulo batch boundaries).

Both are pyarrow/numpy vectorized (offset arithmetic over the flat
token buffer, never a per-token Python loop).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _flat_tokens(batch: pa.Table, col: str):
    toks = batch.column(col).combine_chunks()
    flat = toks.flatten().to_numpy(zero_copy_only=False)
    lens = pc.list_value_length(toks)
    lens = pc.fill_null(lens, 0).to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, lens


def split_batch(batch: pa.Table, context_len: int = 128, min_tail: int = 16,
                col: str = "tokens", id_col: str = "doc_id") -> pa.Table:
    """Per-document chunking: (doc_id, chunk_idx, tokens[≤context_len])."""
    flat, lens = _flat_tokens(batch, col)
    n_chunks = np.maximum((lens + context_len - 1) // context_len, 0)
    # drop sub-min tails on multi-chunk docs; single short docs kept if ≥ min_tail
    tail = lens - (n_chunks - 1).clip(0) * context_len
    drop_tail = (n_chunks > 1) & (tail < min_tail)
    n_keep = np.where(lens == 0, 0, np.where(drop_tail, n_chunks - 1, n_chunks))
    n_keep = np.where((n_chunks == 1) & (lens < min_tail), 0, n_keep)

    doc_starts = np.concatenate([[0], np.cumsum(lens[:-1])]) if len(lens) else np.zeros(0, np.int64)
    total_chunks = int(n_keep.sum())
    if total_chunks == 0:
        return pa.table({id_col: pa.array([], batch.column(id_col).type),
                         "chunk_idx": pa.array([], pa.int32()),
                         "tokens": pa.array([], pa.list_(pa.int32())),
                         "n_tok": pa.array([], pa.int32())})
    row_of_chunk = np.repeat(np.arange(len(lens)), n_keep)
    chunk_starts_global = np.concatenate([[0], np.cumsum(n_keep[:-1])])
    chunk_idx = np.arange(total_chunks) - np.repeat(chunk_starts_global, n_keep)
    starts = doc_starts[row_of_chunk] + chunk_idx * context_len
    ends = np.minimum(starts + context_len, (doc_starts + lens)[row_of_chunk])
    out_lens = (ends - starts).astype(np.int64)
    # gather values: offsets into flat
    total = int(out_lens.sum())
    pos = np.arange(total) - np.repeat(np.concatenate([[0], np.cumsum(out_lens[:-1])]), out_lens)
    values = flat[np.repeat(starts, out_lens) + pos]
    tokens = pa.ListArray.from_arrays(
        pa.array(np.concatenate([[0], np.cumsum(out_lens)]), pa.int32()),
        pa.array(values, pa.int32()),
    )
    return pa.table({
        id_col: batch.column(id_col).take(pa.array(row_of_chunk)),
        "chunk_idx": pa.array(chunk_idx.astype(np.int32)),
        "tokens": tokens,
        "n_tok": pa.array(out_lens.astype(np.int32)),
    })


def pack_batch(batch: pa.Table, context_len: int = 128, eos: int = 0,
               col: str = "tokens", id_col: str = "doc_id") -> pa.Table:
    """Greedy within-batch packing: (pack_id, tokens[=context_len or
    short tail], n_docs, n_tok).  Each doc contributes its tokens + one
    EOS; blocks are cut every ``context_len`` tokens of the packed
    stream (documents may straddle blocks — standard GPT-style packing).
    """
    flat, lens = _flat_tokens(batch, col)
    n = len(lens)
    if n == 0 or flat.size + n == 0:
        return pa.table({"pack_id": pa.array([], pa.int32()),
                         "tokens": pa.array([], pa.list_(pa.int32())),
                         "n_docs": pa.array([], pa.int32()),
                         "n_tok": pa.array([], pa.int32())})
    # build the packed stream: tokens ⧺ EOS per doc, vectorized
    stream_lens = lens + 1
    stream_total = int(stream_lens.sum())
    stream = np.empty(stream_total, dtype=flat.dtype if flat.size else np.int32)
    ends = np.cumsum(stream_lens)
    starts = ends - stream_lens
    pos = np.arange(stream_total) - np.repeat(starts, stream_lens)
    is_eos = pos == np.repeat(lens, stream_lens)
    src_idx = np.repeat(np.concatenate([[0], np.cumsum(lens[:-1])]), stream_lens) + pos
    stream[~is_eos] = flat[src_idx[~is_eos].clip(0, max(flat.size - 1, 0))] if flat.size else 0
    stream[is_eos] = eos
    # cut into context_len blocks
    n_blocks = (stream_total + context_len - 1) // context_len
    block_lens = np.full(n_blocks, context_len, np.int64)
    block_lens[-1] = stream_total - (n_blocks - 1) * context_len
    tokens = pa.ListArray.from_arrays(
        pa.array(np.concatenate([[0], np.cumsum(block_lens)]), pa.int32()),
        pa.array(stream, pa.int32()),
    )
    # docs per block: count of doc STARTS falling in each block
    block_of_start = starts // context_len
    n_docs = np.bincount(block_of_start, minlength=n_blocks)
    return pa.table({
        "pack_id": pa.array(np.arange(n_blocks, dtype=np.int32)),
        "tokens": tokens,
        "n_docs": pa.array(n_docs.astype(np.int32)),
        "n_tok": pa.array(block_lens.astype(np.int32)),
    })


def split_sequences(ds: "ray.data.Dataset", context_len: int = 128,
                    min_tail: int = 16) -> "ray.data.Dataset":
    return ds.map_batches(
        lambda b: split_batch(b, context_len, min_tail),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def pack_sequences(ds: "ray.data.Dataset", context_len: int = 128,
                   eos: int = 0) -> "ray.data.Dataset":
    return ds.map_batches(
        lambda b: pack_batch(b, context_len, eos),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=4096,
    )
