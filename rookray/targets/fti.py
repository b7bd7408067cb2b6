"""Distributed inverted full-text index, maintained incrementally.

THE Lucene analog at lake scale — the reference's full-text-index
target keeps a Lucene index in sync with the database by re-indexing
each changed entity inside one index transaction per replication tx
(`rook-target-hibernate4-fulltextindex/.../DefaultRowsMutationIndexer.java:64-88`:
present → ``session.index`` upsert, absent → ``session.purge``).  This
module is that capability restated for a token-sequence lake: a
posting-list table ``(term, doc_id, tf)`` hash-partitioned by *term*,
kept consistent with the :class:`~rookray.pipeline.LakeTable` without
ever rescanning the corpus.

Incremental maintenance = the changefeed with before-images.  Each
``refresh()`` reads only ``lake.changes_between(index_epoch, head,
columns=(tokens,))`` — O(changed docs), not O(state).  A changed doc's
``tokens_a`` (its tokens in the snapshot the index currently reflects)
names exactly the postings to retract, and ``tokens_b`` the postings
to assert; partition-locally each posting partition drops the
retracted ``(term, doc_id)`` keys and appends the new ones.  This is
the purge-then-index upsert of the reference, vectorized and sharded:
Lucene's "re-index the document" is, physically, "remove the doc's old
term postings, add its new ones".

Physical layout and scale shape:

- postings are hash-partitioned by ``term`` (``term % P``) so a term
  lookup touches exactly one partition — the inverted-file property;
  within a partition rows are sorted by ``(term, doc_id)`` so parquet
  row-group statistics prune term ranges at read time.
- the changefeed is one task per lake partition (no shuffle); the
  delta explode emits O(changed-doc tokens) rows which shuffle ONCE
  (groupby(part)) to their posting partitions; each posting partition
  merges vectorized (anti-join on the retraction keys + append).
  Nothing moves per refresh except the deltas.
- the driver only ever sees one manifest row per posting partition.

Exactly-once: same two-phase protocol as the lake — partition parquet
lands under a name keyed by (partition, lake epoch), then the index
manifest swaps atomically, stamped with the lake epoch it reflects.  A
crash between the two leaves the old manifest in force; re-running
``refresh()`` recomputes the same deltas from the same immutable
snapshots and overwrites the orphans.  Refreshing an already-current
index is a no-op.
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

__all__ = ["InvertedIndex"]

POSTING_SCHEMA = pa.schema(
    [("term", pa.int64()), ("doc_id", pa.string()), ("tf", pa.int64()),
     ("pos", pa.list_(pa.int32()))])  # 0-based positions → phrase queries

_DELTA_SCHEMA = pa.schema(
    [("part", pa.int64()), ("term", pa.int64()), ("doc_id", pa.string()),
     ("tf", pa.int64()), ("pos", pa.list_(pa.int32())),
     ("kind", pa.int64())])
# kind: 0=retract 1=assert 2=corpus-stats side-channel (part=-1; `term`
# carries the doc-count delta and `tf` the token-length delta, so the
# BM25 corpus statistics ride the SAME single delta pass — no second
# feed/state scan)

_MANIFEST_ROW_SCHEMA = pa.schema(
    [("part", pa.int64()), ("file", pa.string()), ("rows", pa.int64()),
     ("docs_delta", pa.int64()), ("len_delta", pa.int64())])


def _explode_terms(tokens: pa.ChunkedArray | pa.Array, doc_ids: np.ndarray):
    """Vectorized (doc, term) → (tf, positions) explode over a batch
    of token lists.

    One numpy pass: flatten all lists, repeat a per-row index by list
    length, then group (row, term) pairs via one stable argsort over a
    packed 64-bit key (terms are int32 vocabulary ids < 2^31, row
    indices < 2^31 per batch) — stability keeps each group's in-doc
    positions ascending, so the positional postings come out sorted
    for free.  Null lists count as empty.  Returns
    (term:int64, doc_id:object, tf:int64, pos:ListArray<int32>).
    """
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    lens = pc.fill_null(pc.list_value_length(tokens), 0) \
             .to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(tokens).to_numpy(zero_copy_only=False) \
             .astype(np.int64)
    empty_pos = pa.array([], type=pa.list_(pa.int32()))
    if flat.size == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=object),
                np.empty(0, dtype=np.int64), empty_pos)
    row = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    pos_in_doc = (np.arange(flat.size, dtype=np.int64)
                  - np.repeat(starts, lens)).astype(np.int32)
    key = (row << np.int64(32)) | flat
    order = np.argsort(key, kind="stable")
    sk = key[order]
    uk, first, tf = np.unique(sk, return_index=True, return_counts=True)
    offsets = np.concatenate([[0], np.cumsum(tf)]).astype(np.int32)
    pos = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                   pa.array(pos_in_doc[order],
                                            type=pa.int32()))
    term = uk & np.int64(0xFFFFFFFF)
    return (term, doc_ids[(uk >> np.int64(32))], tf.astype(np.int64), pos)


def _posting_gone_stats(gone: pa.Table) -> dict:
    """Per-file removed-posting stats for the shared GDPR sweep."""
    return {"removed_len": int(pc.sum(gone.column("tf")).as_py() or 0),
            "gone": sorted(set(gone.column("doc_id").to_pylist()))}


class _MergePostings:
    """Per-posting-partition merge task (one group per partition):
    read the prior partition file, drop every (term, doc_id) named by
    the delta (retractions AND re-assertions — the purge half of the
    upsert), append the asserted postings, write the new partition
    sorted by (term, doc_id).  Returns one manifest row."""

    def __init__(self, root: str, epoch: int, prior_files: dict[int, str]):
        self.root = root
        self.epoch = epoch
        self.prior_files = prior_files

    def __call__(self, group: pa.Table) -> pa.Table:
        part = int(group.column("part")[0].as_py())
        if part == -1:
            # corpus-stats side channel: fold the per-batch deltas
            docs = int(pc.sum(group.column("term")).as_py() or 0)
            length = int(pc.sum(group.column("tf")).as_py() or 0)
            return pa.table({"part": pa.array([-1], type=pa.int64()),
                             "file": pa.array([""]),
                             "rows": pa.array([0], type=pa.int64()),
                             "docs_delta": pa.array([docs], type=pa.int64()),
                             "len_delta": pa.array([length],
                                                   type=pa.int64())},
                            schema=_MANIFEST_ROW_SCHEMA)
        delta = pd.DataFrame({
            "term": group.column("term").to_numpy(zero_copy_only=False),
            "doc_id": group.column("doc_id").to_numpy(zero_copy_only=False),
            "tf": group.column("tf").to_numpy(zero_copy_only=False),
            "pos": group.column("pos").to_pylist(),
            "kind": group.column("kind").to_numpy(zero_copy_only=False),
        })
        prior_rel = self.prior_files.get(part)
        if prior_rel is not None:
            prior = pq.read_table(
                os.path.join(self.root, prior_rel)).to_pandas()
        else:
            prior = pd.DataFrame({"term": pd.Series([], dtype=np.int64),
                                  "doc_id": pd.Series([], dtype=object),
                                  "tf": pd.Series([], dtype=np.int64),
                                  "pos": pd.Series([], dtype=object)})
        # purge: every delta key (either kind) replaces the prior row
        tomb = delta[["term", "doc_id"]].drop_duplicates()
        if len(prior) and len(tomb):
            marked = prior.merge(tomb, on=["term", "doc_id"], how="left",
                                 indicator=True)
            prior = marked[marked["_merge"] == "left_only"] \
                .drop(columns="_merge")
        new = delta[delta["kind"] == 1][["term", "doc_id", "tf", "pos"]]
        out = (pd.concat([prior, new], ignore_index=True)
               .sort_values(["term", "doc_id"], kind="mergesort")
               .reset_index(drop=True))
        rel = f"part-{part:05d}-epoch-{self.epoch:06d}.parquet"
        sink.atomic_write_parquet(
            pa.Table.from_pandas(out, schema=POSTING_SCHEMA,
                                 preserve_index=False),
            os.path.join(self.root, rel))
        return pa.table({"part": pa.array([part], type=pa.int64()),
                         "file": pa.array([rel]),
                         "rows": pa.array([len(out)], type=pa.int64()),
                         "docs_delta": pa.array([0], type=pa.int64()),
                         "len_delta": pa.array([0], type=pa.int64())},
                        schema=_MANIFEST_ROW_SCHEMA)


class InvertedIndex:
    """Posting-list index ``(term, doc_id, tf)`` over a lake table's
    token column, hash-partitioned by term, refreshed incrementally
    from the changefeed.

    ``refresh()`` builds from a full scan the first time and from the
    epoch-to-epoch changefeed afterwards; ``postings(terms)`` reads
    only the hash-matching partitions; ``search_all(terms)`` returns
    the doc ids containing every queried term (the AND query).
    """

    def __init__(self, lake, name: str = "fti", num_partitions: int = 16,
                 tokens_col: str = "tokens"):
        self.lake = lake
        self.name = name
        self.num_partitions = int(num_partitions)
        self.tokens_col = tokens_col
        self.root = os.path.join(lake.root, "indexes", name)
        os.makedirs(self.root, exist_ok=True)

    # ------------------------------------------------------------ state

    def manifest(self) -> dict | None:
        path = os.path.join(self.root, "fti.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def read(self) -> pa.Table:
        """Full committed index (tests / small scales only — real
        reads go through :meth:`postings`)."""
        m = self.manifest()
        if m is None or not m["files"]:
            return pa.Table.from_pylist([], schema=POSTING_SCHEMA)
        tabs = [pq.read_table(os.path.join(self.root, rel))
                for _, rel in sorted(m["files"].items(),
                                     key=lambda kv: int(kv[0]))]
        return pa.concat_tables(tabs)

    # ---------------------------------------------------------- refresh

    def _delta_batches(self, feed: "ray.data.Dataset") -> "ray.data.Dataset":
        tc, P = self.tokens_col, self.num_partitions

        def deltas(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return pa.Table.from_pylist([], schema=_DELTA_SCHEMA)
            change = batch.column("change").to_numpy(zero_copy_only=False)
            docs = batch.column("doc_id").to_numpy(zero_copy_only=False)
            tabs = []
            side_len = {}
            for suf, kind in (("a", 0), ("b", 1)):
                # a-side exists for delete/update, b-side for
                # insert/update
                mask = change != ("insert" if suf == "a" else "delete")
                side_len[suf] = 0
                if not mask.any():
                    continue
                idx = np.flatnonzero(mask)
                toks = batch.column(f"{tc}_{suf}").take(pa.array(idx))
                term, doc, tf, pos = _explode_terms(toks, docs[idx])
                side_len[suf] = int(tf.sum())
                tabs.append(pa.table(
                    {"part": pa.array(term % P), "term": pa.array(term),
                     "doc_id": pa.array(doc, type=pa.string()),
                     "tf": pa.array(tf), "pos": pos,
                     "kind": pa.array(np.full(len(term), kind,
                                              dtype=np.int64))},
                    schema=_DELTA_SCHEMA))
            # corpus-stats side channel (each changed doc hits exactly
            # one feed batch, so per-batch deltas sum globally)
            docs_delta = int((change == "insert").sum()
                             - (change == "delete").sum())
            tabs.append(pa.Table.from_pylist(
                [{"part": -1, "term": docs_delta, "doc_id": "",
                  "tf": side_len["b"] - side_len["a"], "pos": [],
                  "kind": 2}], schema=_DELTA_SCHEMA))
            return pa.concat_tables(tabs)

        return feed.map_batches(deltas, batch_format="pyarrow",
                                zero_copy_batch=True)

    def _build_batches(self) -> "ray.data.Dataset":
        tc, P = self.tokens_col, self.num_partitions

        def explode(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return pa.Table.from_pylist([], schema=_DELTA_SCHEMA)
            docs = batch.column("doc_id").to_numpy(zero_copy_only=False)
            term, doc, tf, pos = _explode_terms(batch.column(tc), docs)
            post = pa.table(
                {"part": pa.array(term % P), "term": pa.array(term),
                 "doc_id": pa.array(doc, type=pa.string()),
                 "tf": pa.array(tf), "pos": pos,
                 "kind": pa.array(np.ones(len(term), dtype=np.int64))},
                schema=_DELTA_SCHEMA)
            stats = pa.Table.from_pylist(
                [{"part": -1, "term": len(batch), "doc_id": "",
                  "tf": int(tf.sum()), "pos": [], "kind": 2}],
                schema=_DELTA_SCHEMA)
            return pa.concat_tables([post, stats])

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
                    "postings": int(m["postings"])}

        prior_files = ({} if m is None
                       else {int(p): rel for p, rel in m["files"].items()})
        if m is None:
            delta = self._build_batches()
        else:
            if int(m["num_partitions"]) != self.num_partitions:
                raise ValueError(
                    f"index at {self.root} was built with "
                    f"{m['num_partitions']} partitions, not "
                    f"{self.num_partitions}")
            feed = self.lake.changes_between(int(m["lake_epoch"]),
                                             head_epoch,
                                             columns=(self.tokens_col,))
            delta = self._delta_batches(feed)

        merge = _MergePostings(self.root, head_epoch, prior_files)
        merge.__name__ = "MergePostings"  # ray's map_groups wrapper wants one
        rows = (delta.groupby("part")
                .map_groups(merge, batch_format="pyarrow")
                .take_all())
        files = dict(prior_files)  # untouched partitions carry forward
        docs_delta = len_delta = 0
        for r in rows:
            if int(r["part"]) == -1:
                docs_delta = int(r["docs_delta"])
                len_delta = int(r["len_delta"])
            else:
                files[int(r["part"])] = r["file"]
        n_docs = (0 if m is None else int(m["n_docs"])) + docs_delta
        total_len = (0 if m is None else int(m["total_len"])) + len_delta
        postings = sum(int(r["rows"]) for r in rows
                       if int(r["part"]) != -1) + sum(
            pq.read_metadata(os.path.join(self.root, rel)).num_rows
            for p, rel in prior_files.items()
            if files[p] == rel)
        sink.atomic_write_json(
            {"lake_epoch": head_epoch,
             "num_partitions": self.num_partitions,
             "tokens_col": self.tokens_col,
             "files": {str(p): rel for p, rel in sorted(files.items())},
             "postings": int(postings),
             "n_docs": int(n_docs), "total_len": int(total_len)},
            os.path.join(self.root, "fti.json"))
        return {"epoch": head_epoch, "refreshed": True,
                "postings": int(postings)}

    def purge_docs(self, doc_ids, lake_epoch: int | None = None) -> dict:
        """GDPR follow-through for the index: physically remove every
        posting of the given docs from every partition, then vacuum
        unreferenced index files.  The changefeed cannot drive this
        (``LakeTable.purge`` destroys the pre-purge snapshot the diff
        would need), and a doc's terms are unknown without its before
        image — so, like a Lucene delete-by-id, every posting
        partition is swept with a vectorized doc filter.  Corpus stats
        subtract exactly what was removed.  ``lake_epoch`` (default:
        the lake's current epoch, i.e. the purge epoch) becomes the
        index's new base so subsequent refreshes diff from a snapshot
        that still exists."""
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
            [("removed_len", pa.int64()), ("gone", pa.list_(pa.string()))],
            _posting_gone_stats)
        removed_docs: set = set()
        removed_len = 0
        new_files = {}
        for r in rows:
            new_files[int(r["part"])] = r["file"]
            removed_len += int(r["removed_len"])
            removed_docs.update(r["gone"])
        postings = sum(int(r["rows"]) for r in rows)
        # every manifest parameter carries through from the COMMITTED
        # manifest — a differently-constructed instance must not
        # rewrite the index's geometry
        sink.atomic_write_json(
            {**m, "lake_epoch": int(lake_epoch),
             "files": {str(p): rel for p, rel in sorted(new_files.items())},
             "postings": int(postings),
             "n_docs": int(m["n_docs"]) - len(removed_docs),
             "total_len": int(m["total_len"]) - removed_len},
            os.path.join(self.root, "fti.json"))
        swept = vacuum_unreferenced(self.root, new_files.values())
        return {"lake_epoch": int(lake_epoch),
                "purged_docs": len(removed_docs),
                "purged_postings": int(removed_len),
                "files_removed": swept}

    def vacuum(self) -> int:
        """Reclaim unreferenced index files (prior generations of
        rewritten partitions, crash orphans toward epochs the lake has
        moved past).  Explicit, never automatic — see
        ``VectorIndex.vacuum`` for the rationale."""
        from rookray.targets.common import vacuum_unreferenced
        m = self.manifest()
        if m is None:
            return 0
        return vacuum_unreferenced(self.root, m["files"].values())

    # ------------------------------------------------------------- read

    def postings(self, terms) -> pa.Table:
        """Posting rows for the given terms — reads ONLY the
        hash-matching partitions, with the term filter pushed into the
        parquet read (rows are term-sorted, so row-group statistics
        prune)."""
        m = self.manifest()
        if m is None:
            raise ValueError(f"index at {self.root} has no committed state")
        terms = np.asarray(list(terms), dtype=np.int64)
        files = {int(p): rel for p, rel in m["files"].items()}
        out = []
        for p in np.unique(terms % int(m["num_partitions"])):
            rel = files.get(int(p))
            if rel is None:
                continue
            t = pq.read_table(
                os.path.join(self.root, rel),
                filters=[("term", "in", terms.tolist())])
            if len(t):
                out.append(t)
        if not out:
            return pa.Table.from_pylist([], schema=POSTING_SCHEMA)
        res = pa.concat_tables(out)
        return res.sort_by([("term", "ascending"), ("doc_id", "ascending")])

    def search_bm25(self, terms, k: int = 10, k1: float = 1.5,
                    b: float = 0.75) -> pd.DataFrame:
        """Okapi BM25 top-k over the queried terms — ranked retrieval,
        the query side of the Lucene analog.  Cost is bounded by the
        queried terms' posting lists plus point lookups for the
        candidate docs' lengths (``LakeTable.lookup`` — partition-
        pruned), never a corpus scan; the corpus statistics (N, average
        doc length) come from the index manifest, maintained
        incrementally by the same delta pass that maintains the
        postings.

        ``idf = ln((N - df + 0.5)/(df + 0.5) + 1)`` (the
        Lucene/standard non-negative variant); doc length = token
        count.  Ties break by doc_id ascending.  Returns
        ``(doc_id, score, rank)`` sorted by rank.
        """
        m = self.manifest()
        if m is None:
            raise ValueError(f"index at {self.root} has no committed state")
        n_docs, total_len = int(m["n_docs"]), int(m["total_len"])
        terms = sorted(set(int(t) for t in terms))
        post = self.postings(terms).to_pandas()
        if len(post) == 0 or n_docs == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=object),
                                 "score": pd.Series([], dtype=np.float64),
                                 "rank": pd.Series([], dtype=np.int64)})
        avg_len = total_len / n_docs
        df = post.groupby("term")["doc_id"].size()
        idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        cand = np.unique(post["doc_id"].to_numpy())
        looked = self.lake.lookup(cand.tolist())
        lens = pc.list_value_length(
            looked.column(self.tokens_col)).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        len_of = dict(zip(looked.column("doc_id").to_pylist(), lens))
        dlen = post["doc_id"].map(len_of).to_numpy(dtype=np.float64)
        tf = post["tf"].to_numpy(dtype=np.float64)
        norm = k1 * (1.0 - b + b * dlen / avg_len)
        post = post.assign(
            contrib=idf[post["term"]].to_numpy() * tf * (k1 + 1.0)
            / (tf + norm))
        scores = (post.groupby("doc_id", as_index=False)["contrib"].sum()
                  .rename(columns={"contrib": "score"})
                  .sort_values(["score", "doc_id"],
                               ascending=[False, True],
                               kind="mergesort")
                  .head(k).reset_index(drop=True))
        scores["rank"] = np.arange(1, len(scores) + 1, dtype=np.int64)
        return scores

    def search_phrase(self, phrase) -> list[str]:
        """Doc ids containing the EXACT consecutive token sequence —
        the positional-postings query (Lucene PhraseQuery analog).
        Reads only the phrase terms' posting partitions; per candidate
        doc the match is a vectorized position-set walk: positions p
        of ``phrase[0]`` with ``p+i`` present in ``phrase[i]``'s
        positions for every i.  Cost is bounded by the rarest term's
        posting list, never the corpus.  Sorted doc ids."""
        phrase = [int(t) for t in phrase]
        if not phrase:
            return []
        post = self.postings(sorted(set(phrase))).to_pandas()
        if len(post) == 0:
            return []
        by_doc_term = {(d, t): np.asarray(p, dtype=np.int64)
                       for t, d, p in zip(post["term"], post["doc_id"],
                                          post["pos"])}
        docs_of = post.groupby("term")["doc_id"].apply(set)
        cand = set.intersection(*(docs_of.get(t, set()) for t in set(phrase)))
        out = []
        for d in sorted(cand):
            hits = by_doc_term[(d, phrase[0])]
            for i, t in enumerate(phrase[1:], 1):
                if hits.size == 0:
                    break
                hits = hits[np.isin(hits + i, by_doc_term[(d, t)])]
            if hits.size:
                out.append(d)
        return out

    def search_all(self, terms) -> list[str]:
        """Doc ids containing EVERY queried term (AND), sorted.  Cost
        is bounded by the queried terms' posting lists, never the
        corpus."""
        terms = sorted(set(int(t) for t in terms))
        if not terms:
            return []
        post = self.postings(terms)
        if len(post) == 0:
            return []
        df = post.to_pandas()
        hits = df.groupby("doc_id")["term"].nunique()
        return sorted(hits[hits == len(terms)].index.tolist())
