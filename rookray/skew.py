"""Hot-key salting — skew handling for the partition shuffle.

A Zipf-hot ``doc_id`` funnels every one of its events into a single
partition group; the per-batch combiner in ``PartitionStage`` already
collapses duplicates within a batch, but across many batches one
partition can still receive far more rows than its peers.  Salting
splits each partition's stream into ``S`` sub-buckets by gtid hash,
pre-merges each sub-bucket independently (keep-last per key — at most
one surviving row per (key, sub-bucket)), then lets the normal
``groupby("part")`` re-merge the at-most-S partials per key.

Correctness: the partials carry their winning ``(gtid, split)``, so the
second pass is the same LWW argmax — argmax over partial argmaxes
equals the global argmax (SURVEY.md §7.5 "Hot-key correctness").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from rookray import merge


def _add_salt(batch: pa.Table, salt: int) -> pa.Table:
    g = batch.column("gtid").to_numpy(zero_copy_only=False).astype(np.uint64)
    z = (g ^ (g >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    s = (z % np.uint64(salt)).astype(np.int32)
    return batch.append_column("salt", pa.array(s))


def _pre_merge(group: pa.Table) -> pa.Table:
    return merge.keep_last(group.drop_columns(["salt"]))


def salted_premerge(flat: "ray.data.Dataset", salt: int) -> "ray.data.Dataset":
    """Insert a salted pre-merge pass before the per-partition merge."""
    salted = flat.map_batches(
        lambda b: _add_salt(b, salt), batch_format="pyarrow", zero_copy_batch=True
    )
    return salted.groupby(["part", "salt"]).map_groups(
        _pre_merge, batch_format="pyarrow"
    )
