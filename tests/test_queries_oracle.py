"""Driver-contract rehearsal: every SQL-backed query must match its
DuckDB oracle (row count + sorted-column value equality) at sf0.01 —
the same comparison the external driver performs."""

import math
import os

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def compare(ray_df: pd.DataFrame, sql_df: pd.DataFrame, name: str):
    assert sorted(ray_df.columns) == sorted(sql_df.columns), \
        f"{name}: columns {sorted(ray_df.columns)} != {sorted(sql_df.columns)}"
    assert len(ray_df) == len(sql_df), \
        f"{name}: rows {len(ray_df)} != {len(sql_df)}"
    a, b = canon(ray_df), canon(sql_df)
    # dtype parity: the external driver's value hash is dtype-sensitive
    # (round 1: identical values, int64 vs float64 → red cell)
    for col in a.columns:
        ka, kb = a[col].dtype.kind, b[col].dtype.kind
        ka = "i" if ka == "u" else ka
        kb = "i" if kb == "u" else kb
        assert ka == kb, f"{name}.{col}: dtype kind {a[col].dtype} != {b[col].dtype}"
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) and isinstance(y, float):
                ok = (math.isnan(x) and math.isnan(y)) or x == y
            else:
                ok = x == y or str(x) == str(y)
            assert ok, f"{name}.{col}[{i}]: {x!r} != {y!r}"


def sql_backed():
    from rookray.queries import ORACLES
    return sorted(ORACLES)


@pytest.mark.parametrize("name", sql_backed())
def test_query_matches_oracle(name, con):
    from rookray.queries import ORACLES, QUERIES

    ray_df = QUERIES[name](SF)
    if not isinstance(ray_df, pd.DataFrame):
        ray_df = ray_df.to_pandas()
    sql_df = con.execute(ORACLES[name]).df()
    compare(ray_df, sql_df, name)


def test_rows_only_queries_run():
    """Non-SQL-expressible queries must still run and return stable rows."""
    from rookray.queries import ORACLES, QUERIES

    for name in sorted(set(QUERIES) - set(ORACLES)):
        out = QUERIES[name](SF)
        if not isinstance(out, pd.DataFrame):
            out = out.to_pandas()
        assert len(out) >= 0 and len(out.columns) > 0, name


def test_entry_smoke():
    import __ray_entry__

    out = __ray_entry__.entry()
    assert len(out) > 0
    assert list(out.columns) == ["doc_id", "n_tok", "source", "token_sum"]


def test_sql_hash_matches_engine_hash():
    """hash_strings_ctes must reproduce util.hash_strings bit-exactly —
    the lineage oracle's partition placement rides on it."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    from rookray.queries import hash_strings_ctes
    from rookray.util import hash_strings, partition_of

    rng = np.random.default_rng(7)
    ids = (["", "a", "doc-00000000", "doc-99999999", "doc-" + "0" * 8]
           + ["".join(chr(c) for c in rng.integers(33, 127, size=n))
              for n in (1, 2, 7, 12, 31, 63) for _ in range(20)])
    c = duckdb.connect()
    c.register("ids_t", pa.table({"doc_id": pa.array(ids)}))
    sql = (f"WITH src AS (SELECT doc_id FROM ids_t),\n"
           f"{hash_strings_ctes('src', 'doc_id', 'doc_id')}\n"
           f"SELECT doc_id, CAST(hh AS HUGEINT) AS h,"
           f" CAST(hh % 16 AS BIGINT) AS part FROM hashed")
    got = {r[0]: (r[1], r[2]) for r in c.execute(sql).fetchall()}
    want_h = hash_strings(pa.array(ids))
    want_p = partition_of(pa.array(ids), 16)
    for s, h, p in zip(ids, want_h, want_p):
        assert got[s] == (int(h), int(p)), s
