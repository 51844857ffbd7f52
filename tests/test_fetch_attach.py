"""The digest-keyed fetch-attach fast path (CrawlConfig.fetch_attach_max)
replaces the per-round hash join with one broadcast + one map pass.
It must be invisible to crawl semantics: attach and join produce the
identical visited table on both the driver-sized (sel_table) and
forced-distributed (sel_ds) metadata-build paths, a zero-match round
ends cleanly, and the second siphash family genuinely differs from the
first (the 128-bit key is two independent 64-bit families).
"""

import pandas as pd

from crawl4ai_custom_ray.sources.pages import pages_parquet_path

SF = "/root/testdata/sf0.001"


def _run(pages_path, seeds, tmp_path, **cfg_kw):
    from crawl4ai_custom_ray.frontier.crawl import CrawlConfig, crawl_bfs

    visited, driver = crawl_bfs(
        pages_path, seeds, CrawlConfig(**cfg_kw), str(tmp_path)
    )
    try:
        return (
            visited.to_pandas()
            .sort_values(["round", "seq"])
            .reset_index(drop=True)
        )
    finally:
        driver.shutdown()


def _seeds(pages_path):
    import pyarrow.parquet as pq

    t = pq.read_table(pages_path, columns=["url"])
    return sorted(t["url"].to_pylist())[:3]


def test_attach_equals_join_driver_build(ray_session, tmp_path):
    """fetch_strategy='join' with a driver-sized round: attach metadata
    built from sel_table.  Same visited rows/order as the hash join."""
    pages_path = pages_parquet_path(SF)
    seeds = _seeds(pages_path)
    base = dict(max_depth=2, fetch_strategy="join", n_seen_shards=2)
    attach = _run(pages_path, seeds, tmp_path / "attach", **base)
    join = _run(
        pages_path, seeds, tmp_path / "join", fetch_attach_max=0, **base
    )
    pd.testing.assert_frame_equal(attach, join)
    assert len(attach) > 3  # the crawl actually expanded past the seeds


def test_attach_equals_join_distributed_build(ray_session, tmp_path):
    """broadcast_fetch_threshold=0 forces sel_table=None: attach
    metadata is collected by the distributed per-block digest pass.
    Identical visited table vs the hash join on the same config."""
    pages_path = pages_parquet_path(SF)
    seeds = _seeds(pages_path)
    base = dict(
        max_depth=2,
        driver_round_threshold=0,
        driver_links_threshold=0,
        broadcast_fetch_threshold=0,
        fetch_strategy="join",
        n_seen_shards=2,
    )
    attach = _run(pages_path, seeds, tmp_path / "attach", **base)
    join = _run(
        pages_path, seeds, tmp_path / "join", fetch_attach_max=0, **base
    )
    pd.testing.assert_frame_equal(attach, join)
    assert len(attach) > 3


def test_attach_equals_join_best_first(ray_session, tmp_path):
    """best_first on the forced-distributed path pops through the
    attach fetch; order and budget semantics must match the join."""
    pages_path = pages_parquet_path(SF)
    seeds = _seeds(pages_path)
    base = dict(
        strategy="best_first",
        best_first_batch_size=4,
        max_depth=2,
        max_pages=10,
        driver_round_threshold=0,
        driver_links_threshold=0,
        broadcast_fetch_threshold=0,
        fetch_strategy="join",
        n_seen_shards=2,
    )
    attach = _run(pages_path, seeds, tmp_path / "attach", **base)
    join = _run(
        pages_path, seeds, tmp_path / "join", fetch_attach_max=0, **base
    )
    pd.testing.assert_frame_equal(attach, join)


def test_attach_zero_match_round(ray_session, tmp_path):
    """A round whose urls match NO pages row: every attach block
    returns the typed empty table and the crawl ends with just the
    unfetched seed recorded."""
    pages_path = pages_parquet_path(SF)
    out = _run(
        pages_path,
        ["https://nonexistent.example/none"],
        tmp_path,
        max_depth=2,
        fetch_strategy="join",
        n_seen_shards=2,
    )
    assert list(out["url"]) == ["https://nonexistent.example/none"]


def test_second_hash_family_is_independent():
    """The attach key's second siphash family must differ from the
    first on the same inputs (otherwise the '128-bit' key is 64 bits)."""
    from crawl4ai_custom_ray.frontier.crawl import (
        _ATTACH_HASH_KEY2,
        _url_digests64,
    )

    urls = [f"https://t.local/p{i}" for i in range(64)]
    h1 = list(_url_digests64(urls))
    h2 = list(_url_digests64(urls, _ATTACH_HASH_KEY2))
    assert h1 != h2
    assert all(a != b for a, b in zip(h1, h2))
