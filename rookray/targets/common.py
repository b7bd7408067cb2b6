"""Shared per-partition maintenance for derived-store targets
(InvertedIndex, VectorIndex): the GDPR doc sweep and the
unreferenced-file vacuum.  One implementation — deletion logic is the
last place two drifting copies should exist."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

_BASE_SCHEMA = [("part", pa.int64()), ("file", pa.string()),
                ("rows", pa.int64())]


def sweep_doc_partitions(root: str, files: dict[int, str], keys,
                         epoch: int, extra_schema: list,
                         extra_of) -> list[dict]:
    """Distributed per-partition doc removal: every partition file is
    filtered by ``doc_id NOT IN keys``; touched partitions rewrite
    under an epoch-keyed name, untouched ones keep their file.
    ``extra_of(gone: pa.Table) -> dict`` computes target-specific
    stats of the removed rows (must be a module-level function —
    it ships to Ray workers).  Returns one manifest row per
    partition: ``{part, file, rows, **extra}``."""
    keys_ref = ray.put(sorted(set(keys)))
    out_schema = pa.schema(_BASE_SCHEMA + list(extra_schema))

    def sweep(batch: pa.Table) -> pa.Table:
        kset = pa.array(ray.get(keys_ref), type=pa.string())
        out = []
        for p, rel in zip(batch.column("part").to_pylist(),
                          batch.column("rel").to_pylist()):
            t = pq.read_table(os.path.join(root, rel))
            hit = pc.is_in(t.column("doc_id"), value_set=kset)
            if not pc.any(hit).as_py():
                out.append({"part": int(p), "file": rel, "rows": len(t),
                            **extra_of(t.slice(0, 0))})
                continue
            gone = t.filter(hit)
            kept = t.filter(pc.invert(hit))
            new_rel = f"part-{int(p):05d}-epoch-{int(epoch):06d}.parquet"
            from rookray import sink
            sink.atomic_write_parquet(kept, os.path.join(root, new_rel))
            out.append({"part": int(p), "file": new_rel,
                        "rows": len(kept), **extra_of(gone)})
        return pa.Table.from_pylist(out, schema=out_schema)

    return (ray.data.from_items(
                [{"part": p, "rel": rel} for p, rel in sorted(files.items())])
            .map_batches(sweep, batch_format="pyarrow", batch_size=4)
            .take_all())


def vacuum_unreferenced(root: str, referenced_rels) -> int:
    """Remove every ``*.parquet`` under ``root`` not named by the
    committed manifest.  Derived indexes keep NO epoch history (one
    manifest), so an unreferenced file is always garbage — either a
    pre-rewrite generation or a crash orphan."""
    referenced = {os.path.join(root, rel) for rel in referenced_rels}
    swept = 0
    for name in sorted(os.listdir(root)):
        path = os.path.join(root, name)
        if name.endswith(".parquet") and path not in referenced:
            os.unlink(path)
            swept += 1
    return swept
