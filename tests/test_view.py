"""Incremental materialized aggregate views (delta maintenance).

The view must equal a full GROUP-BY recomputation of the lake state at
every refresh while reading only the changefeed (O(changed rows), not
O(state)) after its first build — including group *migration* (an
update that moves a row between groups retracts from the old group and
adds to the new: the generator's ``source`` column depends on the
update rank, so migrations occur naturally in every stream).
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

from rookray.gen import GenConfig, write_shards
from rookray.pipeline import CDCConfig, LakeTable
from rookray.view import MaterializedView


def _expected(lake) -> pd.DataFrame:
    state = lake.state_table().to_pandas()
    agg = (state.groupby("source", as_index=False)
           .agg(docs=("doc_id", "size"), n_tok_sum=("n_tok", "sum")))
    agg["n_tok_sum"] = agg["n_tok_sum"].astype(np.int64)
    return (agg.rename(columns={"source": "group"})
            .sort_values("group").reset_index(drop=True))


def _got(view) -> pd.DataFrame:
    return view.read().to_pandas().reset_index(drop=True)


def test_view_incremental_equals_recomputed(tmp_path):
    cfg = GenConfig(n_docs=80, n_events=1600)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=8)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=4))
    view = MaterializedView(lake, "by_source")

    lake.apply(meta["files"][:3])
    r = view.refresh()
    assert r["refreshed"]
    pd.testing.assert_frame_equal(_got(view), _expected(lake))

    # subsequent refreshes may ONLY touch the changefeed — a full
    # rescan is a correctness bug in the maintenance math
    def boom(as_of=None):
        raise AssertionError("refresh rescanned the state")
    view._aggregate_state = boom

    lake.apply(meta["files"][2:6])
    assert view.refresh()["refreshed"]
    pd.testing.assert_frame_equal(_got(view), _expected(lake))

    lake.apply(meta["files"][5:])
    assert view.refresh()["refreshed"]
    expect = _expected(lake)
    pd.testing.assert_frame_equal(_got(view), expect)

    # the stream's updates re-rank payloads, so group migration really
    # happened across these epochs; the view tracked it
    assert len(expect) > 1


def test_view_refresh_idempotent_and_crash_resume(tmp_path):
    cfg = GenConfig(n_docs=40, n_events=800)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=4)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=2))
    view = MaterializedView(lake, "by_source")

    lake.apply(meta["files"][:2])
    view.refresh()
    manifest_after_first = json.dumps(view.manifest(), sort_keys=True)

    # refreshing an already-current view is a no-op
    r = view.refresh()
    assert not r["refreshed"]
    assert json.dumps(view.manifest(), sort_keys=True) == manifest_after_first

    lake.apply(meta["files"][1:])
    view.refresh()
    expect = _expected(lake)
    pd.testing.assert_frame_equal(_got(view), expect)

    # crash between parquet write and manifest swap: roll the manifest
    # back to the first epoch's (the parquet of the newer refresh is
    # now an uncommitted orphan) — a re-refresh must converge to the
    # same committed contents
    with open(os.path.join(view.root, "view.json"), "w") as f:
        f.write(manifest_after_first)
    r = view.refresh()
    assert r["refreshed"]
    pd.testing.assert_frame_equal(_got(view), expect)


def test_view_delete_drops_group(tmp_path):
    """A group whose last doc is deleted disappears from the view."""
    import pyarrow as pa

    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=2))
    view = MaterializedView(lake, "by_source")

    # bootstrap a two-group state, then delete one group's only doc
    # through the normal change-event path
    snap = pa.table({
        "doc_id": ["a", "b", "c"],
        "tokens": pa.array([[1, 2], [3], [4, 5, 6]],
                           type=pa.list_(pa.int32())),
        "n_tok": pa.array([2, 1, 3], type=pa.int32()),
        "source": ["s0", "s0", "s1"],
    })
    lake.bootstrap(snap, gtid_watermark=10)
    view.refresh()
    got = _got(view)
    assert list(got["group"]) == ["s0", "s1"]
    assert list(got["docs"]) == [2, 1]
    assert list(got["n_tok_sum"]) == [3, 3]

    import pyarrow.parquet as pq
    from rookray.schema import OP_DELETE, change_event_schema
    rows = [dict(gtid=11, tx_id=11, seq_in_tx=0, tx_events=1, server_id=1,
                 db="rook", table="sequences", op=OP_DELETE, key="c",
                 before={"doc_id": "c", "tokens": [4, 5, 6], "n_tok": 3,
                         "source": "s1"},
                 after=None)]
    ev = pa.Table.from_pylist(rows, schema=change_event_schema())
    p = str(tmp_path / "ev.parquet")
    pq.write_table(ev, p)
    lake.apply([p])
    view.refresh()
    got = _got(view)
    assert list(got["group"]) == ["s0"]
    assert list(got["docs"]) == [2]


def test_view_rejects_unknown_column(tmp_path):
    cfg = GenConfig(n_docs=10, n_events=100)
    meta = write_shards(cfg, str(tmp_path / "s"), n_shards=2)
    lake = LakeTable(str(tmp_path / "lake"), CDCConfig(num_partitions=2))
    e1 = lake.apply(meta["files"][:1])["epoch"]
    e2 = lake.apply(meta["files"])["epoch"]
    with pytest.raises(ValueError, match="not in the committed payload"):
        lake.changes_between(e1, e2, columns=("nope",))
