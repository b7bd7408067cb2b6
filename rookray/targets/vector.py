"""Distributed vector (embedding) index, maintained incrementally.

The similarity-search analog of :mod:`rookray.targets.fti`: where the
reference's full-text target keeps a Lucene index in sync with the
database per replication tx (purge → re-index upsert,
`rook-target-hibernate4-fulltextindex/.../DefaultRowsMutationIndexer.java:64-88`),
this module keeps an **approximate-nearest-neighbor index** in sync
with the :class:`~rookray.pipeline.LakeTable` from the changefeed —
O(changed docs) per refresh, never a corpus rescan.  At 100 TB the
corpus embedding index is exactly the derived store you cannot afford
to rebuild per ingest batch.

Everything is deterministic INTEGER math so the whole structure —
cell assignment, index contents, and even the approximate search
results — is bit-exactly reproducible in ANSI SQL (the driver oracle):

- **Embedding**: feature-hashed bag of tokens into ``dim`` signed
  integer counts.  For each token occurrence ``t``,
  ``h = splitmix64(t * FNV + SALT)``; dimension ``h % dim`` gains
  ``+1`` if bit 8 of ``h`` is set else ``-1``.  (The classic hashing
  trick — Weinberger et al., ICML 2009 — with multiplicity, no
  floats.)
- **LSH cells**: ``n_planes`` Rademacher hyperplanes whose ±1 entries
  are themselves hash-derived (seeded, data-independent); a doc's
  cell is the sign-bit code of its plane dot products (SimHash,
  Charikar STOC 2002).  Zero dot counts as non-negative.
- **Scoring**: exact integer inner product between the query vector
  and each candidate's stored vector; ties break by doc_id ascending.

Physical layout mirrors the FTI target: rows ``(cell, doc_id,
vec)`` hash-partitioned by ``cell % P`` and sorted by ``(cell,
doc_id)`` inside each partition (parquet row-group stats prune cell
ranges), one manifest row per partition, two-phase manifest swap
keyed by the lake epoch (crash between partition writes and the swap
leaves the old manifest in force; re-refresh overwrites orphans).

Incremental maintenance: ``refresh()`` reads only
``lake.changes_between(index_epoch, head, columns=(tokens,))``.  A
changed doc's before-image tokens name the OLD cell (so the
retraction lands in the right partition without any index lookup);
the after-image yields the new ``(cell, vec)`` row.  Partition-local
merge = drop every delta-named ``doc_id``, append the asserted rows —
the same purge-then-index upsert, restated for vectors.  A same-epoch
re-refresh overwrites crash orphans; orphans toward an epoch the lake
has moved past (and prior generations of rewritten partitions) are
invisible to manifest-driven reads and reclaimed by ``vacuum()``.

Search cost: ``probe="cell"`` reads one cell, ``probe="hamming1"``
reads the query cell plus its ``n_planes`` bit-flip neighbors (the
standard multiprobe recall/latency knob), ``probe="all"`` degenerates
to exact brute force — the oracle-checkable setting at any scale.
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

__all__ = ["VectorIndex", "embed_tokens", "cells_of", "plane_matrix",
           "hash_token_ints", "DIM", "N_PLANES"]

DIM = 16          # embedding dimensions (fixed so SQL can unroll)
N_PLANES = 6      # 2^6 = 64 LSH cells
_FNV = 1099511628211
_SALT = 0x9E3779B97F4A7C15
_C1 = 0xBF58476D1CE4E5B9
_C2 = 0x94D049BB133111EB
_PLANE_SALT = 0xA5A5A5A5DEADBEEF

VEC_SCHEMA = pa.schema(
    [("cell", pa.int64()), ("doc_id", pa.string()),
     ("vec", pa.list_(pa.int64()))])

_DELTA_SCHEMA = pa.schema(
    [("part", pa.int64()), ("cell", pa.int64()), ("doc_id", pa.string()),
     ("vec", pa.list_(pa.int64())), ("kind", pa.int64())])
# kind: 0=retract (cell names the OLD partition), 1=assert

_MANIFEST_ROW_SCHEMA = pa.schema(
    [("part", pa.int64()), ("file", pa.string()), ("rows", pa.int64())])


def hash_token_ints(t: np.ndarray) -> np.ndarray:
    """splitmix64-style mix of int token ids (uint64 out).  The SQL
    restatement lives in ``queries.hash_ints_sql`` — same constants,
    same finalizer, verified bit-exact in tests."""
    z = (t.astype(np.uint64) * np.uint64(_FNV) + np.uint64(_SALT))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(_C1)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(_C2)
    return z ^ (z >> np.uint64(31))


def plane_matrix(n_planes: int = N_PLANES, dim: int = DIM) -> np.ndarray:
    """The (n_planes × dim) ±1 Rademacher hyperplane matrix, derived
    from the seeded integer hash — data-independent, identical in
    every process, and inlineable as SQL literals."""
    idx = np.arange(n_planes * dim, dtype=np.uint64) + np.uint64(_PLANE_SALT)
    bits = hash_token_ints(idx) & np.uint64(1)
    return np.where(bits.reshape(n_planes, dim) == 1, 1, -1).astype(np.int64)


def embed_tokens(tokens: pa.ChunkedArray | pa.Array,
                 dim: int = DIM) -> np.ndarray:
    """Vectorized hashed-bag-of-tokens embedding: (n_rows × dim)
    int64.  One pass over the flat token buffer — no per-row Python.
    Null/empty token lists embed to the zero vector."""
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    n = len(tokens)
    out = np.zeros((n, dim), dtype=np.int64)
    if n == 0:
        return out
    lens = pc.fill_null(pc.list_value_length(tokens), 0) \
             .to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(tokens).to_numpy(zero_copy_only=False) \
             .astype(np.int64)
    if flat.size == 0:
        return out
    h = hash_token_ints(flat)
    d = (h % np.uint64(dim)).astype(np.int64)
    sign = np.where((h >> np.uint64(8)) & np.uint64(1) == 1, 1, -1)
    row = np.repeat(np.arange(n, dtype=np.int64), lens)
    np.add.at(out, (row, d), sign)
    return out


def cells_of(vecs: np.ndarray, planes: np.ndarray | None = None) -> np.ndarray:
    """SimHash cell id per row: bit p set iff ``vecs @ planes[p] >= 0``
    (zero counts as non-negative — the SQL side states the same)."""
    if planes is None:
        planes = plane_matrix()
    dots = vecs @ planes.T                       # (n × n_planes)
    bits = (dots >= 0).astype(np.int64)
    return bits @ (1 << np.arange(planes.shape[0], dtype=np.int64))


def _gone_count(gone: pa.Table) -> dict:
    """Per-file removed-row stats for the shared GDPR sweep."""
    return {"gone": len(gone)}


class _MergeVecs:
    """Per-partition merge task: drop every delta-named doc_id from
    the prior partition file, append the asserted rows, write sorted
    by (cell, doc_id).  One manifest row out."""

    def __init__(self, root: str, epoch: int, prior_files: dict[int, str]):
        self.root = root
        self.epoch = epoch
        self.prior_files = prior_files

    def __call__(self, group: pa.Table) -> pa.Table:
        if len(group) == 0:  # map_groups empty-probe guard
            return pa.Table.from_pylist([], schema=_MANIFEST_ROW_SCHEMA)
        part = int(group.column("part")[0].as_py())
        delta = pd.DataFrame({
            "cell": group.column("cell").to_numpy(zero_copy_only=False),
            "doc_id": group.column("doc_id").to_numpy(zero_copy_only=False),
            "vec": group.column("vec").to_pylist(),
            "kind": group.column("kind").to_numpy(zero_copy_only=False),
        })
        prior_rel = self.prior_files.get(part)
        if prior_rel is not None:
            prior = pq.read_table(
                os.path.join(self.root, prior_rel)).to_pandas()
        else:
            prior = pd.DataFrame({"cell": pd.Series([], dtype=np.int64),
                                  "doc_id": pd.Series([], dtype=object),
                                  "vec": pd.Series([], dtype=object)})
        tomb = set(delta["doc_id"])
        if len(prior) and tomb:
            prior = prior[~prior["doc_id"].isin(tomb)]
        new = delta[delta["kind"] == 1][["cell", "doc_id", "vec"]]
        out = (pd.concat([prior, new], ignore_index=True)
               .sort_values(["cell", "doc_id"], kind="mergesort")
               .reset_index(drop=True))
        rel = f"part-{part:05d}-epoch-{self.epoch:06d}.parquet"
        sink.atomic_write_parquet(
            pa.Table.from_pandas(out, schema=VEC_SCHEMA,
                                 preserve_index=False),
            os.path.join(self.root, rel))
        return pa.table({"part": pa.array([part], type=pa.int64()),
                         "file": pa.array([rel]),
                         "rows": pa.array([len(out)], type=pa.int64())},
                        schema=_MANIFEST_ROW_SCHEMA)


class VectorIndex:
    """LSH-celled embedding index ``(cell, doc_id, vec)`` over a lake
    table's token column, hash-partitioned by cell, refreshed
    incrementally from the changefeed.

    ``refresh()`` builds from one full scan the first time and from
    the epoch-to-epoch changefeed afterwards; ``search(query_tokens)``
    reads only the probed cells' partitions; ``probe="all"`` is exact
    brute force (the driver-oracle setting).
    """

    def __init__(self, lake, name: str = "vec", num_partitions: int = 8,
                 tokens_col: str = "tokens", dim: int = DIM,
                 n_planes: int = N_PLANES):
        self.lake = lake
        self.name = name
        self.num_partitions = int(num_partitions)
        self.tokens_col = tokens_col
        self.dim = int(dim)
        self.n_planes = int(n_planes)
        self.root = os.path.join(lake.root, "indexes", name)
        os.makedirs(self.root, exist_ok=True)

    # ------------------------------------------------------------ state

    def manifest(self) -> dict | None:
        path = os.path.join(self.root, "vec.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def read(self) -> pa.Table:
        """Full committed index (tests / small scales only — real
        reads go through :meth:`search`)."""
        m = self.manifest()
        if m is None or not m["files"]:
            return pa.Table.from_pylist([], schema=VEC_SCHEMA)
        tabs = [pq.read_table(os.path.join(self.root, rel))
                for _, rel in sorted(m["files"].items(),
                                     key=lambda kv: int(kv[0]))]
        return pa.concat_tables(tabs)

    # ---------------------------------------------------------- refresh

    def _rows_for(self, tokens, doc_ids: np.ndarray, kind: int,
                  planes: np.ndarray) -> pa.Table:
        vecs = embed_tokens(tokens, self.dim)
        cells = cells_of(vecs, planes)
        vec_col = (pa.array(vecs.tolist(), type=pa.list_(pa.int64()))
                   if kind == 1 else
                   pa.array([[]] * len(cells), type=pa.list_(pa.int64())))
        return pa.table(
            {"part": pa.array(cells % self.num_partitions),
             "cell": pa.array(cells),
             "doc_id": pa.array(doc_ids, type=pa.string()),
             "vec": vec_col,
             "kind": pa.array(np.full(len(cells), kind, dtype=np.int64))},
            schema=_DELTA_SCHEMA)

    def _delta_batches(self, feed: "ray.data.Dataset") -> "ray.data.Dataset":
        tc, planes = self.tokens_col, plane_matrix(self.n_planes, self.dim)
        rows_for = self._rows_for

        def deltas(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return pa.Table.from_pylist([], schema=_DELTA_SCHEMA)
            change = batch.column("change").to_numpy(zero_copy_only=False)
            docs = batch.column("doc_id").to_numpy(zero_copy_only=False)
            tabs = []
            for suf, kind in (("a", 0), ("b", 1)):
                mask = change != ("insert" if suf == "a" else "delete")
                if not mask.any():
                    continue
                idx = np.flatnonzero(mask)
                toks = batch.column(f"{tc}_{suf}").take(pa.array(idx))
                tabs.append(rows_for(toks, docs[idx], kind, planes))
            if not tabs:
                return pa.Table.from_pylist([], schema=_DELTA_SCHEMA)
            return pa.concat_tables(tabs)

        return feed.map_batches(deltas, batch_format="pyarrow",
                                zero_copy_batch=True)

    def _build_batches(self) -> "ray.data.Dataset":
        tc, planes = self.tokens_col, plane_matrix(self.n_planes, self.dim)
        rows_for = self._rows_for

        def explode(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return pa.Table.from_pylist([], schema=_DELTA_SCHEMA)
            docs = batch.column("doc_id").to_numpy(zero_copy_only=False)
            return rows_for(batch.column(tc), docs, 1, planes)

        return self.lake.read().map_batches(explode, batch_format="pyarrow",
                                            zero_copy_batch=True)

    def refresh(self) -> dict:
        """Bring the index up to the lake's current epoch.  First call
        scans the state once; afterwards only the changefeed moves.
        Idempotent; no-ops when already current."""
        head = self.lake.manifest()
        if head is None:
            raise ValueError(f"lake at {self.lake.root} has no committed "
                             f"state to index")
        head_epoch = int(head["epoch"])
        m = self.manifest()
        if m is not None and int(m["lake_epoch"]) == head_epoch:
            return {"epoch": head_epoch, "refreshed": False,
                    "rows": int(m["rows"])}
        prior_files = ({} if m is None
                       else {int(p): rel for p, rel in m["files"].items()})
        if m is None:
            delta = self._build_batches()
        else:
            if (int(m["num_partitions"]) != self.num_partitions
                    or int(m["dim"]) != self.dim
                    or int(m["n_planes"]) != self.n_planes):
                raise ValueError(
                    f"index at {self.root} was built with different "
                    f"parameters: {m}")
            feed = self.lake.changes_between(int(m["lake_epoch"]),
                                             head_epoch,
                                             columns=(self.tokens_col,))
            delta = self._delta_batches(feed)

        merge = _MergeVecs(self.root, head_epoch, prior_files)
        merge.__name__ = "MergeVecs"
        rows = (delta.groupby("part")
                .map_groups(merge, batch_format="pyarrow")
                .take_all())
        files = dict(prior_files)
        for r in rows:
            files[int(r["part"])] = r["file"]
        total = sum(int(r["rows"]) for r in rows) + sum(
            pq.read_metadata(os.path.join(self.root, rel)).num_rows
            for p, rel in prior_files.items()
            if files[p] == rel)
        sink.atomic_write_json(
            {"lake_epoch": head_epoch,
             "num_partitions": self.num_partitions,
             "tokens_col": self.tokens_col,
             "dim": self.dim, "n_planes": self.n_planes,
             "files": {str(p): rel for p, rel in sorted(files.items())},
             "rows": int(total)},
            os.path.join(self.root, "vec.json"))
        return {"epoch": head_epoch, "refreshed": True, "rows": int(total)}

    def vacuum(self) -> int:
        """Reclaim unreferenced index files: prior generations of
        rewritten partitions and crash orphans (a refresh that died
        between partition writes and the manifest swap toward a lake
        epoch the lake has since moved past leaves files no future
        refresh overwrites).  Reads are manifest-driven so orphans are
        invisible; this is the explicit space-reclaim call — the
        index-side analog of the lake's ``gc``.  Not automatic: an
        operator may roll the manifest back by hand, and prior
        generations are what makes that recovery possible."""
        from rookray.targets.common import vacuum_unreferenced
        m = self.manifest()
        if m is None:
            return 0
        return vacuum_unreferenced(self.root, m["files"].values())

    def purge_docs(self, doc_ids, lake_epoch: int | None = None) -> dict:
        """GDPR follow-through: physically remove the given docs'
        vectors from every partition, then vacuum unreferenced index
        files (same rationale as ``InvertedIndex.purge_docs`` — the
        changefeed cannot drive this because ``LakeTable.purge``
        destroys the pre-purge snapshot a diff would need).  All
        manifest parameters carry through from the COMMITTED manifest
        (never from this instance — a differently-constructed instance
        must not rewrite the index's geometry)."""
        from rookray.targets.common import (sweep_doc_partitions,
                                            vacuum_unreferenced)
        m = self.manifest()
        if m is None:
            raise ValueError(f"index at {self.root} has no committed state")
        if lake_epoch is None:
            lake_epoch = int(self.lake.manifest()["epoch"])
        files = {int(p): rel for p, rel in m["files"].items()}
        rows = sweep_doc_partitions(
            self.root, files, doc_ids, int(lake_epoch),
            [("gone", pa.int64())], _gone_count)
        new_files = {int(r["part"]): r["file"] for r in rows}
        gone = sum(int(r["gone"]) for r in rows)
        total = sum(int(r["rows"]) for r in rows)
        sink.atomic_write_json(
            {**m, "lake_epoch": int(lake_epoch),
             "files": {str(p): rel for p, rel in sorted(new_files.items())},
             "rows": int(total)},
            os.path.join(self.root, "vec.json"))
        swept = vacuum_unreferenced(self.root, new_files.values())
        return {"lake_epoch": int(lake_epoch), "purged_rows": gone,
                "files_removed": swept}

    # ------------------------------------------------------------- read

    def probe_cells(self, query_tokens, probe: str = "hamming1") -> list[int]:
        """The cells a search would read: the query's own cell, plus
        its n_planes single-bit-flip neighbors for ``"hamming1"``, or
        every cell for ``"all"``."""
        if probe == "all":
            return list(range(1 << self.n_planes))
        planes = plane_matrix(self.n_planes, self.dim)
        toks = pa.array([list(query_tokens)], type=pa.list_(pa.int32()))
        c = int(cells_of(embed_tokens(toks, self.dim), planes)[0])
        if probe == "cell":
            return [c]
        if probe == "hamming1":
            return sorted({c} | {c ^ (1 << p) for p in range(self.n_planes)})
        raise ValueError(f"unknown probe mode {probe!r}")

    def search(self, query_tokens, k: int = 10,
               probe: str = "hamming1") -> pd.DataFrame:
        """Top-k docs by exact integer inner product between the query
        embedding and the candidates in the probed cells.  Reads ONLY
        the hash-matching partitions with the cell filter pushed into
        the parquet scan (cell-sorted rows → row-group pruning).
        Returns ``(doc_id, score, rank)``; ties break doc_id-ascending."""
        m = self.manifest()
        if m is None:
            raise ValueError(f"index at {self.root} has no committed state")
        if (int(m["dim"]) != self.dim
                or int(m["n_planes"]) != self.n_planes):
            raise ValueError(
                f"index at {self.root} was built with dim={m['dim']}, "
                f"n_planes={m['n_planes']}; this instance has "
                f"dim={self.dim}, n_planes={self.n_planes}")
        cells = np.asarray(self.probe_cells(query_tokens, probe),
                           dtype=np.int64)
        files = {int(p): rel for p, rel in m["files"].items()}
        tabs = []
        for p in np.unique(cells % int(m["num_partitions"])):
            rel = files.get(int(p))
            if rel is None:
                continue
            t = pq.read_table(
                os.path.join(self.root, rel),
                filters=[("cell", "in", cells.tolist())])
            if len(t):
                tabs.append(t)
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype=object),
                              "score": pd.Series([], dtype=np.int64),
                              "rank": pd.Series([], dtype=np.int64)})
        if not tabs:
            return empty
        cand = pa.concat_tables(tabs)
        toks = pa.array([list(query_tokens)], type=pa.list_(pa.int32()))
        q = embed_tokens(toks, self.dim)[0]
        flat = pc.list_flatten(cand.column("vec").combine_chunks()) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        vecs = flat.reshape(len(cand), self.dim)  # fixed-width lists
        scores = vecs @ q
        df = (pd.DataFrame({"doc_id": cand.column("doc_id")
                            .to_numpy(zero_copy_only=False),
                            "score": scores})
              .sort_values(["score", "doc_id"], ascending=[False, True],
                           kind="mergesort")
              .head(k).reset_index(drop=True))
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df
