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


QUERY_NAMES = [
    "extract_text",
    "extract_links",
    "link_stats",
    "page_metadata",
    "link_head_preview",
    "page_tables",
    "regex_emails",
    "frontier_bfs",
    "top_k_per_host",
    "robots_filter",
    "dedup_exact",
    "jaccard_pairs",
    "token_count",
    "quality_score",
    "knn_topk",
    "dedup_embedding",
    "media_features",
    "events_window",
    "sessionize",
    "chunk_fixed",
    "structured_extract",
    "seed_urls",
]

ROWS_ONLY_QUERIES = [
    "dedup_minhash",
    "dedup_simhash",
    "lang_id",
    "fingerprint",
    "knn_ivf",
    "semantic_cluster",
    "adaptive_crawl",
]


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
