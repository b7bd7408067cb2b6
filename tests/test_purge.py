"""Physical purge (right-to-be-forgotten) — DELETE + total VACUUM.

A tombstone delete removes a key from state but its bytes live on in
immutable history files; ``purge()`` must leave NO parquet file under
the lake root containing the key, must not let replays resurrect it,
and derived stores must be able to follow with their own physical
purge (``InvertedIndex.purge_docs``) since the changefeed cannot diff
against a vacuumed snapshot.
"""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from rookray.gen import GenConfig, final_state, write_shards
from rookray.pipeline import CDCConfig, LakeTable


def _doc_ids_in_files(root: str) -> set:
    """Every doc_id present in ANY parquet file under the lake root."""
    out = set()
    for f in glob.glob(os.path.join(root, "**", "*.parquet"),
                       recursive=True):
        t = pq.read_table(f)
        if "doc_id" in t.column_names:
            out.update(t.column("doc_id").to_pylist())
    return out


@pytest.mark.parametrize("write_mode", ["rewrite", "delta"])
def test_purge_expunges_state_and_history(tmp_path, write_mode):
    cfg = GenConfig(n_docs=40, n_events=800)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=4)
    lake = LakeTable(str(tmp_path / "lake"),
                     CDCConfig(num_partitions=4, write_mode=write_mode))
    lake.apply(meta["files"][:2])
    lake.apply(meta["files"][2:])  # several epochs → real history files

    state = lake.state_table().to_pandas()
    victims = sorted(state["doc_id"])[:3]
    pre_epoch = lake.manifest()["epoch"]
    assert set(victims) <= _doc_ids_in_files(str(tmp_path / "lake"))

    r = lake.purge(victims)
    assert r["purged_rows"] == 3
    assert r["files_removed"] > 0

    # state: exactly the victims gone, everything else byte-identical
    after = lake.state_table().to_pandas()
    expect = (state[~state["doc_id"].isin(victims)]
              .sort_values("doc_id").reset_index(drop=True))
    got = after.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expect)

    # filesystem: NO parquet under the lake root carries the keys
    assert not (set(victims) & _doc_ids_in_files(str(tmp_path / "lake")))

    # pre-purge snapshots are no longer readable (vacuumed), loudly
    with pytest.raises(ValueError, match="garbage-collected"):
        lake.read(as_of=pre_epoch)

    # replaying every old shard cannot resurrect purged keys
    # (watermark skip) and leaves the rest untouched
    lake.apply(meta["files"])
    again = (lake.state_table().to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(again, expect)

    # a genuinely NEW event (gtid past the watermark) re-creates the
    # key — purge is point-in-time, not a tombstone registry
    import pyarrow as pa
    from rookray.schema import OP_INSERT, change_event_schema
    g = meta["gtid_max"] + 1
    rows = [dict(gtid=g, tx_id=g, seq_in_tx=0, tx_events=1, server_id=1,
                 db="rook", table="sequences", op=OP_INSERT,
                 key=victims[0],
                 before=None,
                 after={"doc_id": victims[0], "tokens": [9, 9],
                        "n_tok": 2, "source": "s0"})]
    p = str(tmp_path / "new.parquet")
    pq.write_table(pa.Table.from_pylist(rows,
                                        schema=change_event_schema()), p)
    lake.apply([p])
    assert victims[0] in set(lake.state_table().column("doc_id").to_pylist())


def test_purge_follows_through_derived_index(tmp_path):
    """Lake purge + index purge_docs: every posting of the victims is
    physically gone from every index file, corpus stats subtract
    exactly, the old (victim-bearing) index files are vacuumed, and
    subsequent INCREMENTAL refreshes still work (the index's base
    epoch advanced to the purge epoch, whose snapshot exists)."""
    from rookray.targets.fti import InvertedIndex

    cfg = GenConfig(n_docs=30, n_events=600, vocab=40)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=3)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=4))
    lake.apply(meta["files"][:2])
    index = InvertedIndex(lake, num_partitions=4)
    index.refresh()

    state = lake.state_table().to_pandas()
    victims = sorted(state["doc_id"])[:2]
    lake.purge(victims)
    r = index.purge_docs(victims)
    assert r["purged_docs"] == 2 and r["files_removed"] > 0

    post = index.read().to_pandas()
    assert not (set(victims) & set(post["doc_id"]))
    # no index parquet on disk carries the victims
    assert not (set(victims) & _doc_ids_in_files(index.root))
    # stats followed: N dropped by 2, total length by the victims' sum
    m = index.manifest()
    keep = state[~state["doc_id"].isin(victims)]
    assert m["n_docs"] == len(keep)
    assert m["total_len"] == int(keep["tokens"].map(len).sum())

    # incremental refresh from the purge epoch still works and
    # converges to the from-scratch truth over the new head
    lake.apply(meta["files"][1:])
    assert index.refresh()["refreshed"]
    fresh = InvertedIndex(lake, name="fresh", num_partitions=4)
    fresh.refresh()
    pd.testing.assert_frame_equal(
        index.read().to_pandas().sort_values(["term", "doc_id"])
        .reset_index(drop=True),
        fresh.read().to_pandas().sort_values(["term", "doc_id"])
        .reset_index(drop=True))


def test_purge_unknown_key_is_safe_noop_rewrite(tmp_path):
    cfg = GenConfig(n_docs=10, n_events=150)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=2)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=2))
    lake.apply(meta["files"])
    before = lake.state_table().to_pandas().sort_values("doc_id")
    r = lake.purge(["no-such-doc"])
    assert r["purged_rows"] == 0
    after = lake.state_table().to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(after.reset_index(drop=True),
                                  before.reset_index(drop=True))
    # empty key list: true no-op, no new epoch
    e = lake.manifest()["epoch"]
    assert lake.purge([])["epoch"] == e
