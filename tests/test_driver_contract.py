"""Simulates the driver's correctness gate: run each ``queries()``
entry at sf0.01 and compare row-count + columns + values against the
matching ``oracle_sql()`` via DuckDB (order-insensitive)."""

import math

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if df[col].dtype == object:
            df[col] = df[col].astype(str)
        elif pd.api.types.is_float_dtype(df[col]):
            df[col] = df[col].round(6)
        elif pd.api.types.is_integer_dtype(df[col]):
            df[col] = df[col].astype("int64")
        elif pd.api.types.is_bool_dtype(df[col]):
            df[col] = df[col].astype(bool)
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _compare(name, ray_result, sql, duck):
    ray_df = ray_result.to_pandas() if hasattr(ray_result, "to_pandas") else ray_result
    oracle_df = duck.execute(sql).df()
    assert sorted(ray_df.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch {sorted(ray_df.columns)} vs {sorted(oracle_df.columns)}"
    )
    a, b = _canon(ray_df), _canon(oracle_df)
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, atol=1e-6)


def _entries():
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    qs = e.queries()
    oracles = {}
    for name, sql in _oracle_sql_for_sf(SF_DIR).items():
        oracles[name] = sql
    return qs, oracles


def _oracle_sql_for_sf(sf_dir):
    from crawl4ai_custom_ray.oracles import oracle_sql_for

    return oracle_sql_for(sf_dir)


# Derived from the contract itself so a new queries()/oracle_sql()
# entry is covered without touching this file: every query with an
# oracle gets the full three-way compare, the rest get the rows-only
# check (mirroring the driver exactly).
def _query_partition():
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    qs = set(e.queries())
    oracled = qs & set(_oracle_sql_for_sf(SF_DIR))
    return sorted(oracled), sorted(qs - oracled)


QUERY_NAMES, ROWS_ONLY_QUERIES = _query_partition()


def test_rows_only_is_the_known_one():
    """Every query has a SQL oracle (the last holdout,
    adaptive_crawl_embedding, gained a chained-CTE replay once the
    stand-in embedder moved to md5) — a query landing here is a
    missing-oracle bug."""
    assert ROWS_ONLY_QUERIES == []


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(name, ray_session):
    """Queries without SQL oracles must still run and return a stable
    schema (driver records a weaker rows-only check)."""
    qs, _ = _entries()
    result = qs[name](SF_DIR)
    df = result.to_pandas() if hasattr(result, "to_pandas") else result
    assert df is not None and len(df.columns) > 0


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_vs_oracle(name, ray_session, duck):
    qs, oracles = _entries()
    assert name in qs, f"missing query {name}"
    assert name in oracles, f"missing oracle for {name}"
    _compare(name, qs[name](SF_DIR), oracles[name], duck)


def test_entry_smoke(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    ds = e.entry()
    assert ds.count() > 0
    assert "text" in ds.schema().names
