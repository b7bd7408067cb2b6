"""Sequence packing — turning the upserted sequence table into
fixed-length training chunks.

The canonical consumer of the north-rule table: concatenate token
arrays into ``context_len``-sized training rows, preserving document
provenance.  Two vectorized per-batch strategies:

* ``split``: every document is chunked independently to
  ``context_len``; the tail chunk is emitted when ≥ ``min_tail``
  tokens (deterministic, embarrassingly parallel, no cross-row state);
* ``pack``: documents are concatenated into full ``context_len``
  blocks with an EOS separator.  ``pack_sequences`` is the canonical
  GLOBALLY deterministic variant (docs in doc_id order, global block
  ids, repartition-invariant); ``pack_batch`` is the within-batch
  kernel (ids local to the batch — composable but block-boundary
  dependent).

Both are pyarrow/numpy vectorized (offset arithmetic over the flat
token buffer, never a per-token Python loop).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


# ------------------------------------------------ global deterministic pack


def _fragment_table(flat: np.ndarray, lens: np.ndarray, s: np.ndarray,
                    context_len: int, eos: int) -> pa.Table:
    """Vectorized fragment emission: documents with stream offsets ``s``
    (each occupying [s, s+len+1) of the virtual packed stream —
    tokens ++ EOS) cut every ``context_len`` positions.  One fragment
    row per (doc, overlapped block); output is a pure function of the
    offset assignment, never of Ray block boundaries."""
    n = len(lens)
    if n == 0:
        return pa.table({
            "pack_id": pa.array([], pa.int64()),
            "frag_start": pa.array([], pa.int64()),
            "tokens": pa.array([], pa.list_(pa.int32())),
            "n_start": pa.array([], pa.int64()),
        })
    C = context_len
    L = lens + 1  # tokens + EOS
    e = s + L
    b0 = s // C
    nb = (e - 1) // C - b0 + 1
    total_frags = int(nb.sum())
    rep = np.repeat(np.arange(n), nb)
    frag_idx = np.arange(total_frags) - np.repeat(
        np.concatenate([[0], np.cumsum(nb[:-1])]), nb)
    block = b0[rep] + frag_idx
    fs = np.maximum(s[rep], block * C)
    fe = np.minimum(e[rep], (block + 1) * C)
    fl = fe - fs
    total_out = int(fl.sum())
    pos_in_frag = np.arange(total_out) - np.repeat(
        np.concatenate([[0], np.cumsum(fl[:-1])]), fl)
    rep_flat = np.repeat(rep, fl)
    p = np.repeat(fs - s[rep], fl) + pos_in_frag  # position in doc stream
    doc_starts = np.concatenate([[0], np.cumsum(lens[:-1])])
    is_eos = p == lens[rep_flat]
    src = (doc_starts[rep_flat] + p).clip(0, max(flat.size - 1, 0))
    vals = np.where(is_eos, eos,
                    flat[src] if flat.size else eos).astype(np.int32)
    tokens = pa.ListArray.from_arrays(
        pa.array(np.concatenate([[0], np.cumsum(fl)]), pa.int32()),
        pa.array(vals, pa.int32()),
    )
    return pa.table({
        "pack_id": pa.array(block, pa.int64()),
        "frag_start": pa.array(fs, pa.int64()),
        "tokens": tokens,
        "n_start": pa.array((block == b0[rep]).astype(np.int64)),
    })


def _assemble_packs(group: pa.Table) -> pa.Table:
    """Assemble MANY packs per call (one coarse pack_id bucket): sort
    fragments by (pack_id, frag_start) once, then every pack's token
    list, doc count and length fall out of one reduceat pass — round 2
    ran one Python ``map_groups`` call per 128-token block (millions of
    tiny groups at scale)."""
    if len(group) == 0:
        return pa.table({"pack_id": pa.array([], pa.int64()),
                         "tokens": pa.array([], pa.list_(pa.int32())),
                         "n_docs": pa.array([], pa.int64()),
                         "n_tok": pa.array([], pa.int64())})
    group = group.sort_by([("pack_id", "ascending"),
                           ("frag_start", "ascending")])
    pid = group.column("pack_id").to_numpy(zero_copy_only=False)
    toks = group.column("tokens").combine_chunks()
    vals = toks.flatten()
    fl = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    nstart = group.column("n_start").to_numpy(zero_copy_only=False)
    upid, first = np.unique(pid, return_index=True)  # sorted → reduceat-safe
    n_tok = np.add.reduceat(fl, first).astype(np.int64)
    n_docs = np.add.reduceat(nstart, first).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(n_tok)])
    tokens = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), vals)
    return pa.table({
        "pack_id": pa.array(upid, pa.int64()),
        "tokens": tokens,
        "n_docs": pa.array(n_docs, pa.int64()),
        "n_tok": pa.array(n_tok, pa.int64()),
    })


def pack_sequences(ds: "ray.data.Dataset", context_len: int = 128,
                   eos: int = 0, col: str = "tokens",
                   id_col: str = "doc_id", bucket_width: int = 4096,
                   assemble_coarse: int = 1024) -> "ray.data.Dataset":
    """GPT-style packing with GLOBALLY deterministic pack ids.

    Documents are concatenated in ``doc_id`` order (each followed by one
    EOS) into a virtual stream cut every ``context_len`` tokens;
    ``pack_id`` is the global block index, so the output is a pure
    function of the input table — invariant under ``repartition()`` and
    Ray block boundaries (round 1's per-batch ids collided across
    batches and depended on block sizes), and closed-form in SQL
    (window cumsum — see PACK_TRAINING_CHUNKS_SQL).

    Scale shape — a DISTRIBUTED prefix sum (round 2 materialized every
    (doc_id, offset) row on the driver: a driver OOM at 10¹⁰ docs):

    1. bucket docs by ``doc_id // bucket_width`` (monotone in doc_id,
       so bucket order = doc order) and groupby-sum each bucket's
       stream length — the driver sees ONE ROW PER BUCKET (16 B ×
       docs/4096), cumsums the bucket totals into base offsets, and
       broadcasts the tiny base dict via ``ray.put``;
    2. ``groupby(bucket)`` co-locates each bucket's docs; one sorted
       vectorized pass computes exact in-bucket offsets (base + local
       exclusive cumsum) and emits per-block fragments (token bytes
       move once);
    3. fragments assemble under a COARSE key (``pack_id //
       assemble_coarse``): one reduceat pass builds ~1024 packs per
       Python call instead of one call per 128-token block."""
    import ray as _ray
    from ray.data.aggregate import Sum

    W = int(bucket_width)
    try:
        id_type = ds.schema().base_schema.field(id_col).type
        int_ids = pa.types.is_integer(id_type)
    except Exception:
        int_ids = False

    if int_ids:
        # distributed prefix sum: bucket = doc_id // W is monotone in
        # doc_id, so cumsum over bucket totals gives exact base offsets
        def bucket_totals(batch: pa.Table) -> pa.Table:
            # per-batch combiner: the shuffle ships one row per
            # (bucket, batch), not per doc
            toks = batch.column(col).combine_chunks()
            lens = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
                zero_copy_only=False).astype(np.int64)
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            df = pd.DataFrame({"bucket": ids // W, "t": lens + 1})
            g = df.groupby("bucket", sort=False)["t"].sum().reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        totals = (ds.map_batches(bucket_totals, batch_format="pyarrow",
                                 zero_copy_batch=True)
                  .groupby("bucket").aggregate(Sum("t", alias_name="t"))
                  .to_pandas().sort_values("bucket").reset_index(drop=True))
        t = totals["t"].to_numpy(dtype=np.int64)
        bases = np.zeros(len(t), dtype=np.int64)
        if len(t):
            bases[1:] = np.cumsum(t[:-1])
        bases_ref = _ray.put(dict(zip(totals["bucket"].tolist(),
                                      bases.tolist())))

        def add_bucket(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            return batch.append_column("_bkt", pa.array(ids // W, pa.int64()))

        def emit_frags(group: pa.Table) -> pa.Table:
            if len(group) == 0:
                return _fragment_table(np.zeros(0, np.int32),
                                       np.zeros(0, np.int64),
                                       np.zeros(0, np.int64),
                                       context_len, eos)
            group = group.sort_by([(id_col, "ascending")])
            flat, lens = _flat_tokens(group, col)
            bkt = int(group.column("_bkt")[0].as_py())
            base = _ray.get(bases_ref)[bkt]
            stream_lens = lens + 1
            s = np.full(len(lens), base, dtype=np.int64)
            if len(lens) > 1:
                s[1:] += np.cumsum(stream_lens[:-1])
            return _fragment_table(flat, lens, s, context_len, eos)

        frags = (ds.map_batches(add_bucket, batch_format="pyarrow",
                                zero_copy_batch=True)
                 .groupby("_bkt").map_groups(emit_frags,
                                             batch_format="pyarrow"))
    else:
        # compat path for NON-INTEGER ids (no order-preserving bucket
        # function exists for arbitrary strings): driver-side offset
        # table, 16 B/doc — fine to ~10⁸ docs; integer ids take the
        # distributed branch above at any scale
        def lens_of(batch: pa.Table) -> pa.Table:
            toks = batch.column(col).combine_chunks()
            lens = pc.fill_null(pc.list_value_length(toks), 0)
            return pa.table({id_col: batch.column(id_col),
                             "_len": lens.cast(pa.int64())})

        lens_df = (ds.map_batches(lens_of, batch_format="pyarrow",
                                  zero_copy_batch=True)
                   .to_pandas().sort_values(id_col).reset_index(drop=True))
        stream_lens = lens_df["_len"].to_numpy(dtype=np.int64) + 1
        starts = np.zeros(len(stream_lens), dtype=np.int64)
        if len(stream_lens):
            starts[1:] = np.cumsum(stream_lens[:-1])
        offsets_ref = _ray.put(dict(zip(lens_df[id_col], starts.tolist())))

        def emit_from_table(batch: pa.Table) -> pa.Table:
            flat, lens = _flat_tokens(batch, col)
            if len(lens) == 0:
                return _fragment_table(flat, lens, np.zeros(0, np.int64),
                                       context_len, eos)
            off = _ray.get(offsets_ref)
            s = batch.column(id_col).to_pandas().map(off).to_numpy(
                dtype=np.int64)
            return _fragment_table(flat, lens, s, context_len, eos)

        frags = ds.map_batches(emit_from_table, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=4096)

    K = int(assemble_coarse)

    def add_coarse(batch: pa.Table) -> pa.Table:
        p = batch.column("pack_id").to_numpy(zero_copy_only=False)
        return batch.append_column("_pb", pa.array(p // K, pa.int64()))

    def assemble(group: pa.Table) -> pa.Table:
        return _assemble_packs(group.drop_columns(["_pb"]))

    return (frags.map_batches(add_coarse, batch_format="pyarrow",
                              zero_copy_batch=True)
            .groupby("_pb").map_groups(assemble, batch_format="pyarrow"))
