"""Crawl-ordering parity against the REFERENCE'S OWN deep-crawl code.

The north star requires "crawl ordering and the final URL-seen set
match the reference crawler under an identical seed list and
politeness budget".  Earlier rounds proved this against an in-test
mirror of ``bfs_strategy.py``; here the oracle is the reference's own
``BFSDeepCrawlStrategy`` / ``BestFirstCrawlingStrategy`` /
``DFSDeepCrawlStrategy`` classes, loaded read-only
(see ref_deep_crawl.py) and driven by a stub crawler that fetches
from the same synthetic pages table the BSP frontier crawls.
"""

import asyncio

import pyarrow.parquet as pq
import pytest

from crawl4ai_custom_ray.sources.pages import pages_parquet_path

from ref_deep_crawl import StubCrawler, StubRunConfig, load_reference_deep_crawl

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages_path():
    return pages_parquet_path(SF)


@pytest.fixture(scope="module")
def pages_dict(pages_path):
    t = pq.read_table(pages_path, columns=["url", "html"])
    return {
        u: (h.decode() if isinstance(h, bytes) else h)
        for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist())
    }


@pytest.fixture(scope="module")
def seed(pages_dict):
    return sorted(pages_dict)[0]


def _run_reference(strategy, seed, pages_dict):
    """{url: (depth, parent)} from the reference strategy's batch run."""
    crawler = StubCrawler(pages_dict)
    results = asyncio.run(strategy._arun_batch(seed, crawler, StubRunConfig()))
    return {
        r.url: (r.metadata.get("depth"), r.metadata.get("parent_url"))
        for r in results
    }


def _run_ours(pages_path, seed, tmp_path, **cfg_kw):
    from crawl4ai_custom_ray.frontier.crawl import CrawlConfig, crawl_bfs

    visited, driver = crawl_bfs(
        pages_path, [seed], CrawlConfig(**cfg_kw), str(tmp_path / "ckpt")
    )
    try:
        df = visited.to_pandas()
    finally:
        driver.shutdown()
    return {
        r.url: (int(r.depth), r.parent if r.parent else None)
        for r in df.itertuples()
    }


def test_normalizer_matches_reference_function(pages_dict):
    """Our deep-crawl URL normalizer is byte-equal to the reference's
    ``normalize_url_for_deep_crawl`` over every href in the corpus
    plus the tricky shapes."""
    load_reference_deep_crawl()
    import sys

    ref_norm = sys.modules["crawl4ai.utils"].normalize_url_for_deep_crawl
    from crawl4ai_custom_ray.urls import normalize_url_for_deep_crawl as ours

    import re

    hrefs = set()
    for url, html in list(pages_dict.items())[:100]:
        for m in re.finditer(r"href='([^']+)'|href=\"([^\"]+)\"", html):
            hrefs.add((m.group(1) or m.group(2), url))
    hrefs.update(
        {
            ("/path/../x?b=2&a=1#frag", "https://h.example.com/dir/"),
            ("HTTPS://UP.example.COM/Case/", "https://h.example.com/"),
            ("page?utm_source=x&keep=1", "https://h.example.com/a/b"),
            ("//other.example.com/p", "https://h.example.com/"),
            ("  /spaced  ", "https://h.example.com/"),
        }
    )
    assert hrefs
    for href, base in hrefs:
        assert ours(href, base) == ref_norm(href, base), (href, base)


def test_bfs_matches_reference_code(ray_session, pages_path, pages_dict, seed, tmp_path):
    dc = load_reference_deep_crawl()
    expected = _run_reference(dc.BFSDeepCrawlStrategy(max_depth=2), seed, pages_dict)
    got = _run_ours(pages_path, seed, tmp_path, max_depth=2)
    assert set(got) == set(expected)
    for url, (depth, _parent) in expected.items():
        assert got[url][0] == depth, url
    # parent equality where the reference's choice is deterministic:
    # a URL discovered by exactly one crawled page
    for url, (depth, parent) in expected.items():
        if depth == 0:
            assert got[url][1] in (None, ""), url


def test_bfs_max_pages_budget_matches_reference_code(
    ray_session, pages_path, pages_dict, seed, tmp_path
):
    """Capacity-limited crawl: same pages crawled under the same
    budget (the reference truncates discovery at remaining capacity;
    unscored links keep discovery order)."""
    dc = load_reference_deep_crawl()
    expected = _run_reference(
        dc.BFSDeepCrawlStrategy(max_depth=3, max_pages=12), seed, pages_dict
    )
    got = _run_ours(pages_path, seed, tmp_path, max_depth=3, max_pages=12)
    assert set(got) == set(expected)
    for url, (depth, _p) in expected.items():
        assert got[url][0] == depth, url


def test_best_first_budget_set_matches_reference_code(
    ray_session, pages_path, pages_dict, seed, tmp_path
):
    """Best-first with a keyword scorer and a page budget: the SET of
    crawled pages pins the global priority order — a wrong order
    crawls a different set before the budget runs out."""
    dc = load_reference_deep_crawl()
    from crawl4ai_custom_ray.frontier.scorers import KeywordRelevanceScorer

    kw = ["articles", "doc-1"]
    ref_strat = dc.BestFirstCrawlingStrategy(
        max_depth=3,
        url_scorer=dc.KeywordRelevanceScorer(keywords=kw),
        max_pages=15,
    )
    expected = _run_reference(ref_strat, seed, pages_dict)
    got = _run_ours(
        pages_path,
        seed,
        tmp_path,
        strategy="best_first",
        max_depth=3,
        max_pages=15,
        scorer=KeywordRelevanceScorer(keywords=kw),
    )
    assert set(got) == set(expected)


def test_scorer_values_match_reference(pages_dict):
    """KeywordRelevanceScorer parity: identical scores on corpus URLs."""
    dc = load_reference_deep_crawl()
    from crawl4ai_custom_ray.frontier.scorers import KeywordRelevanceScorer

    kw = ["articles", "doc-1", "example"]
    ref = dc.KeywordRelevanceScorer(keywords=kw)
    ours = KeywordRelevanceScorer(keywords=kw)
    for url in list(pages_dict)[:200]:
        assert ours.score(url) == pytest.approx(ref.score(url)), url


def test_bfs_crawl_order_matches_reference_code(
    ray_session, pages_path, pages_dict, seed, tmp_path
):
    """Full crawl ORDER parity: the visited table replayed in
    (round, seq) order is the reference's results sequence — the level
    ordering the reference builds by appending discoveries in page
    processing order."""
    dc = load_reference_deep_crawl()
    crawler = StubCrawler(pages_dict)
    results = asyncio.run(
        dc.BFSDeepCrawlStrategy(max_depth=2)._arun_batch(seed, crawler, StubRunConfig())
    )
    ref_order = []
    seen = set()
    for r in results:
        if r.url not in seen:  # reference may re-crawl a seed twin
            seen.add(r.url)
            ref_order.append(r.url)

    from crawl4ai_custom_ray.frontier.crawl import CrawlConfig, crawl_bfs

    visited, driver = crawl_bfs(
        pages_path, [seed], CrawlConfig(max_depth=2), str(tmp_path / "ord")
    )
    try:
        df = visited.to_pandas().sort_values(["round", "seq"])
    finally:
        driver.shutdown()
    assert list(df["url"]) == ref_order


def test_bfs_parents_match_reference_code(
    ray_session, pages_path, pages_dict, seed, tmp_path
):
    """Parent attribution parity: the owner (first sequential
    discoverer) of every crawled URL matches the reference."""
    dc = load_reference_deep_crawl()
    expected = _run_reference(dc.BFSDeepCrawlStrategy(max_depth=2), seed, pages_dict)
    got = _run_ours(pages_path, seed, tmp_path, max_depth=2)
    for url, (depth, parent) in expected.items():
        assert got[url][1] == parent, url


def test_dfs_order_matches_reference_code(
    ray_session, pages_path, pages_dict, seed, tmp_path
):
    """DFS visit ORDER parity vs the reference's explicit-stack
    implementation: our batch-1 rounds pop by lexicographic seq (DFS
    pre-order), which must equal the reference's LIFO pops."""
    dc = load_reference_deep_crawl()
    crawler = StubCrawler(pages_dict)
    results = asyncio.run(
        dc.DFSDeepCrawlStrategy(max_depth=2, max_pages=14)._arun_batch(
            seed, crawler, StubRunConfig()
        )
    )
    ref_order = [r.url for r in results]
    assert len(ref_order) == len(set(ref_order))

    from crawl4ai_custom_ray.frontier.crawl import CrawlConfig, crawl_bfs

    visited, driver = crawl_bfs(
        pages_path,
        [seed],
        CrawlConfig(strategy="dfs", max_depth=2, max_pages=14, max_rounds=40),
        str(tmp_path / "dfs"),
    )
    try:
        df = visited.to_pandas().sort_values(["round", "seq"])
    finally:
        driver.shutdown()
    assert list(df["url"]) == ref_order


def test_bfs_budget_distributed_path_equivalence(
    ray_session, pages_path, pages_dict, seed, tmp_path
):
    """The distributed discovery chain (groupby dedup + seen-add
    materialize + per-owner budget-cap map_groups) must produce the
    same crawl as the driver-coordinated path — and both must match
    the reference.  Forcing driver_links_threshold=0 routes every
    round through the distributed code."""
    dc = load_reference_deep_crawl()
    expected = _run_reference(
        dc.BFSDeepCrawlStrategy(max_depth=3, max_pages=12), seed, pages_dict
    )
    got = _run_ours(
        pages_path,
        seed,
        tmp_path,
        max_depth=3,
        max_pages=12,
        driver_links_threshold=0,
        driver_round_threshold=0,
    )
    assert set(got) == set(expected)
    for url, (depth, _p) in expected.items():
        assert got[url][0] == depth, url


def test_bfs_distributed_path_order_equivalence(
    ray_session, pages_path, pages_dict, seed, tmp_path
):
    """Unbudgeted distributed-path crawl order still replays the
    reference sequence (seq survives the shuffle chain)."""
    dc = load_reference_deep_crawl()
    crawler = StubCrawler(pages_dict)
    results = asyncio.run(
        dc.BFSDeepCrawlStrategy(max_depth=2)._arun_batch(seed, crawler, StubRunConfig())
    )
    ref_order = []
    seen = set()
    for r in results:
        if r.url not in seen:
            seen.add(r.url)
            ref_order.append(r.url)

    from crawl4ai_custom_ray.frontier.crawl import CrawlConfig, crawl_bfs

    visited, driver = crawl_bfs(
        pages_path,
        [seed],
        CrawlConfig(max_depth=2, driver_links_threshold=0, driver_round_threshold=0),
        str(tmp_path / "dist"),
    )
    try:
        df = visited.to_pandas().sort_values(["round", "seq"])
    finally:
        driver.shutdown()
    assert list(df["url"]) == ref_order
