"""Determinism + property tests: crawl ordering reproducibility and
hypothesis-driven robustness of the pure kernels."""

import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawl4ai_custom_ray.html.dom import parse
from crawl4ai_custom_ray.kernel import extract_page
from crawl4ai_custom_ray.sources.pages import pages_parquet_path
from crawl4ai_custom_ray.urls import normalize_url, url_digest

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------ crawl ordering


def _run_crawl(tmp_path, name, **cfg_kwargs):
    from crawl4ai_custom_ray.frontier.crawl import BFSCrawl, CrawlConfig

    pages_path = pages_parquet_path(SF)
    seeds = sorted(
        u
        for u in pq.read_table(pages_path, columns=["url"])["url"].to_pylist()
        if "/private/" not in u
    )[:3]
    driver = BFSCrawl(pages_path, CrawlConfig(n_seen_shards=2, **cfg_kwargs), str(tmp_path / name))
    try:
        df = driver.run(seeds).to_pandas()
    finally:
        driver.shutdown()
    return sorted(zip(df["url"], df["round"], df["depth"]))


def test_bfs_visit_order_reproducible(ray_session, tmp_path):
    """Two identical runs assign identical (url → round, depth) — the
    'crawl ordering matches under the same seed list' criterion; round
    barriers + deterministic sorts make ordering reproducible despite
    unordered shuffles."""
    a = _run_crawl(tmp_path, "a", max_depth=2)
    b = _run_crawl(tmp_path, "b", max_depth=2)
    assert a == b


def test_budgeted_order_reproducible(ray_session, tmp_path):
    a = _run_crawl(tmp_path, "c", max_depth=3, per_host_cap=2, max_pages=25, max_rounds=8)
    b = _run_crawl(tmp_path, "d", max_depth=3, per_host_cap=2, max_pages=25, max_rounds=8)
    assert a == b


def test_unbudgeted_rounds_equal_depths(ray_session, tmp_path):
    """Without budgets, BSP rounds coincide with BFS levels (the
    reference's level-synchronous semantics)."""
    visits = _run_crawl(tmp_path, "e", max_depth=2)
    assert all(r == d for _, r, d in visits)


# ------------------------------------------------------ property tests


@settings(max_examples=200, deadline=None)
@given(st.text(min_size=1, max_size=80))
def test_normalize_idempotent(href):
    # internal whitespace before a fragment (e.g. "0 #") survives the
    # first pass as a trailing path space and is stripped on the
    # second — same non-idempotence as the reference normalizer, which
    # strips only at entry; real hrefs don't contain raw spaces
    if any(c.isspace() for c in href.strip()):
        return
    base = "https://example.com/dir/page.html"
    once = normalize_url(href, base)
    if once is None or ":" not in once:
        return
    twice = normalize_url(once, base)
    assert twice == once


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_parser_never_crashes(text):
    root = parse(text)
    root.serialize_contents()
    root.get_text()


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=300))
def test_kernel_never_crashes(text):
    rec = extract_page("https://x.com/p", text)
    assert rec["url"] == "https://x.com/p"


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=1, max_size=100))
def test_digest_stable_and_64bit(url):
    d = url_digest(url)
    assert d == url_digest(url)
    assert 0 <= d < 2**64


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=150))
def test_length_accessors_exact(text):
    root = parse(text)
    assert root.text_length() == len(root.get_text())
    assert root.text_length(strip=True) == len(root.get_text(strip=True))
    assert root.serialized_contents_length() == len(root.serialize_contents())
