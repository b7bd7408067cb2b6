"""CDC egress: publish a lake changefeed as a standard wire-format
dump (Debezium-JSON) that any downstream CDC consumer — including a
second rookray lake — can ingest.

rook itself is CDC *in* only (MySQLReplicationStream.java:161-179
consumes a binlog; nothing publishes).  The lake already computes CDC
*out* — ``LakeTable.changes_between`` (the Delta-CDF / Hudi
incremental-query analog) — and this module closes the loop by
serializing that diff in the same public envelope ``rookray.wire``
decodes, turning the lake into a CDC *relay*: database → lake →
(egress dump / topic) → downstream caches, indexes, other lakes.

Shape and coordinates:

- One envelope per changed key: ``c`` (insert — after only), ``u``
  (update — full before/after images), ``d`` (delete — before only).
- The dump is a FRESH coordinate space (a diff has no single source
  coordinate per row): inserts/updates carry the winning row's
  ``gtid_b`` as their binlog position; deletes — whose deleting
  event's gtid is definitionally absent from snapshot B — carry
  ``watermark_b + gtid_a``, which is unique and sorts after every
  insert/update position AND after the deleted row's old version, so
  a downstream LWW replay orders every key correctly.
- Every envelope is its own single-event transaction (a snapshot diff
  carries exactly one event per key; there is no transaction
  structure to restate), so ``read_debezium``'s topic-less counting
  pass closes every watermark immediately.
- Files are named by their gtid range and written temp-then-rename:
  a re-executed Ray task rewrites the same bytes to the same name —
  idempotent, resumable output.

The per-envelope JSON serialization is per-row by nature (JSON-lines
IS a row format); it runs data-parallel inside ``map_batches`` tasks,
one output file per block.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

__all__ = ["write_debezium", "export_changefeed"]

_BINLOG_FILE = "rookray-egress.000001"

_OP = {"insert": "c", "update": "u", "delete": "d"}


def _image(row: dict, names: list[str], suf: str) -> dict:
    return {n: row[f"{n}_{suf}"] for n in names}


def write_debezium(feed: "ray.data.Dataset", out_dir: str,
                   value_columns: list[str],
                   delete_base: int,
                   db: str = "rook", table: str = "sequences",
                   server_id: int = 0,
                   server_name: str = "rookray") -> dict:
    """Serialize a ``changes_between`` feed (requested with every
    payload value column) into a Debezium-JSON dump under ``out_dir``.
    ``delete_base`` must be ≥ the feed's max ``gtid_b`` (snapshot B's
    closed watermark is the natural choice) — delete positions are
    ``delete_base + gtid_a``.  Returns ``{"data_files", "events"}``."""
    os.makedirs(out_dir, exist_ok=True)
    names = list(value_columns)

    def encode(batch: pa.Table) -> pa.Table:
        summary = pa.schema([("file", pa.string()),
                             ("events", pa.int64())])
        if batch.num_rows == 0:
            return summary.empty_table()
        rows = batch.to_pylist()
        lines, positions = [], []
        for r in rows:
            change = r["change"]
            if change == "delete":
                pos = delete_base + int(r["gtid_a"])
            else:
                pos = int(r["gtid_b"])
            positions.append(pos)
            env = {"payload": {
                "before": (None if change == "insert"
                           else _image(r, names, "a")
                           | {"doc_id": r["doc_id"]}),
                "after": (None if change == "delete"
                          else _image(r, names, "b")
                          | {"doc_id": r["doc_id"]}),
                "source": {"version": "2.5.0.Final", "connector": "rookray",
                           "name": server_name, "ts_ms": 0,
                           "db": db, "table": table,
                           "server_id": server_id,
                           "file": _BINLOG_FILE, "pos": pos, "row": 0,
                           "gtid": f"{server_name}:{pos}"},
                "op": _OP[change], "ts_ms": 0,
                "transaction": {"id": str(pos), "total_order": 1,
                                "data_collection_order": 1},
            }}
            lines.append(json.dumps(env, separators=(",", ":")))
        lo, hi = min(positions), max(positions)
        body = ("\n".join(lines) + "\n").encode()
        import hashlib
        digest = hashlib.md5(body).hexdigest()[:8]
        # range + content digest: unique across blocks even when two
        # partitions' diff ranges coincide, stable across task retries
        name = f"data-{lo:016x}-{hi:016x}-{digest}.jsonl"
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(body)
        os.replace(tmp, path)  # idempotent under Ray task re-execution
        return pa.table({"file": pa.array([name]),
                         "events": pa.array([len(rows)], pa.int64())},
                        schema=summary)

    parts = feed.map_batches(encode, batch_format="pyarrow").take_all()
    return {
        "data_files": sorted(os.path.join(out_dir, r["file"])
                             for r in parts),
        "events": int(sum(r["events"] for r in parts)),
    }


def export_changefeed(lake, epoch_a: int, epoch_b: int,
                      out_dir: str, server_name: str = "rookray") -> dict:
    """Egress the row-level changefeed between two committed snapshots
    as a Debezium-JSON dump: every payload column rides as full
    before/after images (what a downstream consumer needs to retract
    and re-add), coordinates as documented in the module header.  The
    dump replays into anything that speaks the envelope — including a
    second lake bootstrapped from snapshot A
    (``tests/test_egress.py`` proves dump ∘ apply == snapshot B)."""
    payload = lake.payload_schema()
    value_cols = [n for n in payload.names if n != payload.names[0]]
    feed = lake.changes_between(epoch_a, epoch_b, columns=value_cols)
    wm_b = int(lake._snapshot_manifest(epoch_b)["closed_watermark"])
    d = write_debezium(feed, out_dir, value_cols, delete_base=wm_b,
                       db="rook", table=lake.config.table,
                       server_id=0, server_name=server_name)
    d["payload"] = payload.names
    d["delete_base"] = wm_b
    return d
