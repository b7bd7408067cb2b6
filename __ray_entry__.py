"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` happens here or anywhere in the
``rookray`` library (only bench.py, CLI entry points and the pytest
fixture own a Ray session).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: full exactly-once
    CDC replay of a generated GTID-ordered change stream into a lake
    table (rookray.pipeline.LakeTable) — returns the final state digest
    as a pandas DataFrame (≥0 rows, stable schema)."""
    from rookray.queries import cdc_replay_sequences

    return cdc_replay_sequences("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2
    plus the training-data operator suite (rookray/queries.py)."""
    from rookray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query, including
    the full-engine flagship replay (the oracle SQL reads the same
    change log from a flat parquet dump).  LSH/SimHash approximations,
    language-ID and multimodal stubs are rows-only by design
    (documented in rookray/queries.py)."""
    from rookray.queries import ORACLES, flagship_stream

    # the flagship oracle SQL references the change-log dump by path —
    # make sure it exists even if the oracle runs before the query
    # (pure numpy/pyarrow generation; no Ray needed)
    flagship_stream()
    return dict(ORACLES)
