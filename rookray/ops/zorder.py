"""Z-order (Morton) clustering + min/max data skipping.

The lake's primary layout is hash-by-key (CDC co-location).  Analytical
scans filter on OTHER columns — and a hash layout gives such scans no
pruning at all: every file intersects every predicate.  The standard
lake answer (Delta/Iceberg ``OPTIMIZE ZORDER BY``) is to rewrite a
table clustered along a space-filling curve of the filter columns, so
each output file covers a small hyper-rectangle of the value space and
a per-file min/max index prunes most files for any conjunctive range
predicate.

Correctness and effectiveness are deliberately decoupled:

- pruning is ALWAYS correct: it uses only per-file min/max column
  stats (recorded at write time) + an exact vectorized residual filter
  after the read — a wrong curve can't produce wrong answers;
- the Z-curve makes pruning EFFECTIVE: interleaving the quantized
  bits of the filter columns keeps each file's bounding box small in
  every dimension at once (a plain sort by one column only prunes
  that column).

Scale shape: ONE tiny streaming stats pass (per-batch min/max + row/
byte counts + a capped stride sample of the raw clustering columns →
driver fold over small partials; the input is NEVER materialized),
then one stateless ``map_batches`` pass that recomputes the curve
value per row (pure numpy bit-interleave — recomputing beats holding
the whole dataset in the object store) feeding a range exchange on
the curve value and one write task per output range.  The number of
output ranges is sized by TOTAL BYTES / ``target_file_bytes`` (never
fewer than the requested ``num_files``), so per-task memory is
bounded by the target file size while the file count grows with the
data — a 100 TB input becomes ~400 k bounded write tasks, not 16
6-TB ones.  Scans read ONLY the surviving files, with the residual
predicate pushed into the parquet reads.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from rookray import sink

__all__ = ["zorder_write", "zorder_scan"]


def _quantize(v: np.ndarray, lo: float, hi: float, bits: int) -> np.ndarray:
    """Map values to integer cells [0, 2^bits) over [lo, hi]."""
    span = hi - lo
    if span <= 0:
        return np.zeros(len(v), dtype=np.uint64)
    q = ((v.astype(np.float64) - lo) / span) * ((1 << bits) - 1)
    return np.clip(q, 0, (1 << bits) - 1).astype(np.uint64)


def _morton(cells: list[np.ndarray], bits: int) -> np.ndarray:
    """Vectorized bit interleave: z = ...c1b1 c0b1 c1b0 c0b0."""
    n = len(cells)
    z = np.zeros(len(cells[0]), dtype=np.uint64)
    for b in range(bits):
        for i, c in enumerate(cells):
            z |= ((c >> np.uint64(b)) & np.uint64(1)) << np.uint64(b * n + i)
    return z


def zorder_write(ds: "ray.data.Dataset", cols: list[str], out_dir: str,
                 num_files: int = 16, bits: int = 16,
                 sample_stride: int = 37,
                 target_file_bytes: int = 128 << 20,
                 max_samples_per_block: int = 128) -> dict:
    """Rewrite ``ds`` clustered by the Z-curve of ``cols`` into
    parquet files under ``out_dir`` plus an ``index.json`` of per-file
    min/max stats for every clustering column.  Two-phase: files land
    first, the index swaps last.

    File count = max(``num_files``, total_bytes / ``target_file_bytes``)
    so one write task never holds more than ~a file's worth of rows no
    matter the input size; ``num_files`` is a floor (layout knob), not
    a memory bound.  The input dataset is consumed twice (stats pass,
    then write pass) but never materialized — the curve value is
    recomputed in the write pass, which is a cheap vectorized map.

    The boundary sample is capped at ``max_samples_per_block`` values
    per block so driver-side fold memory stays ~samples × blocks; on a
    very large cluster run, raise the stride / lower the cap (the
    boundaries only need ~file-count quantiles to be useful — skewed
    boundaries cost balance, never correctness)."""
    os.makedirs(out_dir, exist_ok=True)

    # 1. ONE tiny streaming pass: min/max partials + row/byte counts +
    #    a capped stride sample of the raw clustering columns.  The
    #    sample is of RAW values (not the curve) because the curve
    #    needs the global ranges this same pass is computing; the
    #    driver folds ranges first, then curves the tiny sample.
    def stats_partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        stride = max(sample_stride, -(-n // max_samples_per_block) or 1)
        row = {"_rows": [n], "_bytes": [batch.nbytes]}
        for c in cols:
            v = batch.column(c).to_numpy(zero_copy_only=False)
            row[f"{c}_min"] = [float(np.min(v))] if n else [np.inf]
            row[f"{c}_max"] = [float(np.max(v))] if n else [-np.inf]
            row[f"{c}_smp"] = [v[::stride].astype(np.float64)]
        return pa.table(row)

    parts = ds.map_batches(stats_partial, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    ranges = {c: (min(r[f"{c}_min"] for r in parts),
                  max(r[f"{c}_max"] for r in parts)) for c in cols}
    total_bytes = sum(int(r["_bytes"]) for r in parts)
    n_out = max(int(num_files), -(-total_bytes // int(target_file_bytes)))
    ref = ray.put(ranges)

    # 2. boundaries: curve the folded sample on the driver (tiny)
    smp_cells = [_quantize(
        np.concatenate([np.asarray(r[f"{c}_smp"], dtype=np.float64)
                        for r in parts]) if parts
        else np.array([], dtype=np.float64),
        ranges[c][0], ranges[c][1], bits) for c in cols]
    zs = np.sort(_morton(smp_cells, bits).astype(np.int64)) \
        if parts and len(smp_cells[0]) else np.array([], dtype=np.int64)
    if len(zs):
        cut_idx = (np.arange(1, n_out) * len(zs)) // n_out
        bounds = np.unique(zs[cut_idx])
    else:
        bounds = np.array([], dtype=np.int64)
    bounds_ref = ray.put(bounds)

    # 3. write pass: recompute the curve per batch (stateless,
    #    vectorized — cheaper than materializing the dataset), range
    #    exchange on it, one bounded write task per range.
    def add_z_and_range(batch: pa.Table) -> pa.Table:
        rg = ray.get(ref)
        b = ray.get(bounds_ref)
        cells = [_quantize(batch.column(c).to_numpy(zero_copy_only=False),
                           rg[c][0], rg[c][1], bits) for c in cols]
        z = _morton(cells, bits).astype(np.int64)
        return batch.append_column("_z", pa.array(z)).append_column(
            "_file", pa.array(np.searchsorted(b, z, side="right")
                              .astype(np.int64)))

    class WriteFile:
        def __call__(self, group: pa.Table) -> pa.Table:
            fidx = int(group.column("_file")[0].as_py())
            order = pc.sort_indices(group, sort_keys=[("_z", "ascending")])
            body = group.take(order).drop_columns(["_z", "_file"])
            rel = f"z-{fidx:05d}.parquet"
            sink.atomic_write_parquet(body, os.path.join(out_dir, rel))
            stats = {"file": rel, "rows": len(body)}
            for c in cols:
                v = body.column(c).to_numpy(zero_copy_only=False)
                stats[f"{c}_min"] = float(np.min(v))
                stats[f"{c}_max"] = float(np.max(v))
            return pa.Table.from_pylist([stats])

    wf = WriteFile()
    wf.__name__ = "ZOrderWrite"
    rows = (ds.map_batches(add_z_and_range, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("_file").map_groups(wf, batch_format="pyarrow")
            .take_all())
    index = {"cols": list(cols), "bits": bits,
             "files": sorted(rows, key=lambda r: r["file"])}
    sink.atomic_write_json(index, os.path.join(out_dir, "index.json"))
    return {"files": len(rows), "rows": sum(int(r["rows"]) for r in rows)}


def prune_files(out_dir: str, ranges: dict[str, tuple]) -> tuple[list, int]:
    """(surviving file paths, total files) for a conjunctive range
    predicate, using only the per-file min/max boxes."""
    with open(os.path.join(out_dir, "index.json")) as f:
        index = json.load(f)
    kept = [os.path.join(out_dir, e["file"]) for e in index["files"]
            if not any(e[f"{c}_max"] < lo or e[f"{c}_min"] > hi
                       for c, (lo, hi) in ranges.items())]
    return kept, len(index["files"])


def zorder_scan(out_dir: str, ranges: dict[str, tuple],
                columns: list[str] | None = None) -> "ray.data.Dataset":
    """Conjunctive range scan over a z-ordered directory as a DATASET:
    file-level pruning by the min/max boxes happens before the read is
    even planned (only surviving files become read tasks), and the
    exact residual predicate pushes into the parquet scan (row-group
    stats prune further — files are curve-sorted).  Correctness never
    depends on the curve: the box prune is conservative and the pushed
    filter is exact."""
    import pyarrow.dataset as pads

    kept, total = prune_files(out_dir, ranges)
    if not kept:
        with open(os.path.join(out_dir, "index.json")) as f:
            index = json.load(f)
        t = pq.read_table(
            os.path.join(out_dir, index["files"][0]["file"]),
            columns=columns)
        return ray.data.from_arrow(t.slice(0, 0))
    expr = None
    for c, (lo, hi) in ranges.items():
        e = (pads.field(c) >= float(lo)) & (pads.field(c) <= float(hi))
        expr = e if expr is None else expr & e
    return ray.data.read_parquet(kept, columns=columns, filter=expr)
