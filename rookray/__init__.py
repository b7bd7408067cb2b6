"""rookray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of shyiko/rook (a MySQL
binlog CDC toolkit, see /root/reference) as an idiomatic Ray Data engine:

* GTID-ordered change-event stream (insert/update/delete with
  before/after images, transaction grouping) over Parquet shards —
  the batched analog of rook's ``MySQLReplicationStream``
  (rook-source-mysql/.../MySQLReplicationStream.java:71-282).
* Stateless Arrow ``map_batches`` normalization: op routing, ignore-list
  filtering, PK-change splitting (MySQLReplicationStream.java:181-202,
  255-274).
* Hash partitioning by ``doc_id`` + last-writer-wins merge — the
  parallel, commutative restatement of rook's serial keyed
  upsert/delete sinks (DefaultRowsMutationIndexer.java:64-88).
* Idempotent two-phase exactly-once Parquet sink with per-partition
  GTID watermarks and checkpointed lineage (rook is at-most-once on
  listener failure: MySQLReplicationStream.java:167-176 — we upgrade).
* Additive + lossless-widening schema evolution (appended nullable
  columns; int8→…→int64 / float32→float64 / int→float numeric widening
  through list and struct — rook leaves this as a TODO:
  MySQLReplicationStream.java:212).
* Target (sink) analogs: keyed cache invalidation
  (SecondLevelCacheSynchronizer/QueryCacheSynchronizer) and derived
  index-table maintenance with cascade (DefaultRowsMutationIndexer).

Plus the large-scale training-data operators a 100 TB pipeline needs:
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
similarity search, text analysis, multimodal stubs (``rookray.ops``).
"""

from rookray.schema import (
    SEQ_SCHEMA,
    OP_INSERT,
    OP_UPDATE,
    OP_DELETE,
    change_event_schema,
)
from rookray.pipeline import LakeTable, CDCConfig

__all__ = [
    "SEQ_SCHEMA",
    "OP_INSERT",
    "OP_UPDATE",
    "OP_DELETE",
    "change_event_schema",
    "LakeTable",
    "CDCConfig",
]

__version__ = "0.1.0"
