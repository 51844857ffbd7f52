"""URL-seen shard actors (exact/bloom/cuckoo) and the BSP BFS crawl:
parity against an in-test reference BFS (mirroring
``bfs_strategy.py`` level semantics), plus checkpoint/resume."""

import os

import pyarrow.parquet as pq
import pytest

from crawl4ai_custom_ray.sources.pages import pages_parquet_path
from crawl4ai_custom_ray.urls import url_digest

SF = "/root/testdata/sf0.001"


# ----------------------------------------------------------------- seen


@pytest.mark.parametrize("mode", ["exact", "bloom", "cuckoo"])
def test_seen_shards(mode, ray_session):
    from crawl4ai_custom_ray.frontier.seen import UrlSeen

    seen = UrlSeen(n_shards=4, mode=mode, capacity_per_shard=10_000)
    try:
        digests = [url_digest(f"https://x.com/{i}") for i in range(1000)]
        first = seen.check_and_add(digests)
        assert all(first)  # all new (no false positives at this size)
        second = seen.check_and_add(digests)
        assert not any(second)  # all already seen
        assert seen.contains(digests) == [True] * len(digests)
        if mode == "exact":
            assert seen.total() == 1000
        # dump/load round-trip
        blobs = seen.dump_all()
        seen2 = UrlSeen(n_shards=4, mode=mode, capacity_per_shard=10_000)
        try:
            seen2.load_all(blobs)
            assert not any(seen2.check_and_add(digests[:100]))
        finally:
            seen2.shutdown()
    finally:
        seen.shutdown()


def test_cuckoo_filter_pure():
    from crawl4ai_custom_ray.frontier.seen import CuckooFilter

    cf = CuckooFilter(capacity=5000)
    digests = [url_digest(f"u{i}") for i in range(4000)]
    for d in digests:
        cf.add(d)
    assert all(d in cf for d in digests)  # no false negatives
    fresh = [url_digest(f"v{i}") for i in range(4000)]
    fp = sum(1 for d in fresh if d in cf)
    assert fp / len(fresh) < 0.02  # 16-bit fingerprints → tiny FP rate


def test_bloom_filter_pure():
    from crawl4ai_custom_ray.frontier.seen import BloomFilter

    bf = BloomFilter(expected_items=5000, fp_rate=0.01)
    digests = [url_digest(f"u{i}") for i in range(4000)]
    for d in digests:
        bf.add(d)
    assert all(d in bf for d in digests)
    fresh = [url_digest(f"v{i}") for i in range(4000)]
    fp = sum(1 for d in fresh if d in bf)
    assert fp / len(fresh) < 0.03


# ----------------------------------------------------------------- BFS


def _reference_bfs(pages_path: str, seeds, max_depth, disallow_private=False):
    """In-test reference: level-synchronous BFS with a driver-local
    visited set — the semantics of ``bfs_strategy._arun_batch``."""
    from crawl4ai_custom_ray.frontier.crawl import _extract_links_batch
    import pyarrow as pa

    table = pq.read_table(pages_path, columns=["url", "html"])
    links_t = _extract_links_batch(table)
    edges: dict[str, list[str]] = {}
    for src, href, ext in zip(
        links_t["src_url"].to_pylist(),
        links_t["href"].to_pylist(),
        links_t["external"].to_pylist(),
    ):
        if href is None:  # fetch sentinel, not a link
            continue
        if ext:
            continue
        if disallow_private and "/private/" in href:
            continue
        edges.setdefault(src, []).append(href)

    visited = {}
    level = [s for s in seeds if not (disallow_private and "/private/" in s)]
    for s in level:
        visited[s] = 0
    depth = 0
    while level and depth < max_depth:
        nxt = []
        for url in level:
            for href in edges.get(url, []):
                if href not in visited:
                    visited[href] = depth + 1
                    nxt.append(href)
        level = nxt
        depth += 1
    return visited


@pytest.fixture(scope="module")
def pages_path():
    return pages_parquet_path(SF)


@pytest.fixture(scope="module")
def seeds(pages_path):
    urls = sorted(pq.read_table(pages_path, columns=["url"])["url"].to_pylist())
    return urls[:3]


def test_bfs_matches_reference(ray_session, pages_path, seeds, tmp_path):
    from crawl4ai_custom_ray.frontier.crawl import BFSCrawl, CrawlConfig

    cfg = CrawlConfig(max_depth=3, check_robots=False, n_seen_shards=2)
    driver = BFSCrawl(pages_path, cfg, str(tmp_path / "ckpt"))
    try:
        visited = driver.run(seeds).to_pandas()
    finally:
        driver.shutdown()

    expected = _reference_bfs(pages_path, seeds, max_depth=3)
    got = dict(zip(visited["url"], visited["depth"]))
    assert len(got) == len(visited), "duplicate urls in visited set"
    assert got == expected, (
        f"visited mismatch: {len(got)} vs {len(expected)}; "
        f"extra={set(got) - set(expected)} missing={set(expected) - set(got)}"
    )


def test_bfs_with_robots(ray_session, pages_path, seeds, tmp_path):
    from crawl4ai_custom_ray.frontier.crawl import BFSCrawl, CrawlConfig

    cfg = CrawlConfig(max_depth=2, check_robots=True, n_seen_shards=2)
    driver = BFSCrawl(pages_path, cfg, str(tmp_path / "ckpt_robots"))
    try:
        visited = driver.run(seeds).to_pandas()
    finally:
        driver.shutdown()
    assert not visited["url"].str.contains("/private/").any()
    expected = _reference_bfs(pages_path, seeds, max_depth=2, disallow_private=True)
    got = dict(zip(visited["url"], visited["depth"]))
    assert got == expected


def test_bfs_politeness_cap(ray_session, pages_path, seeds, tmp_path):
    from crawl4ai_custom_ray.frontier.crawl import BFSCrawl, CrawlConfig

    cap = 2
    cfg = CrawlConfig(max_depth=2, per_host_cap=cap, n_seen_shards=2, max_rounds=10)
    driver = BFSCrawl(pages_path, cfg, str(tmp_path / "ckpt_cap"))
    try:
        visited = driver.run(seeds).to_pandas()
    finally:
        driver.shutdown()
    # politeness invariant: no host exceeds the cap in any round
    per = visited.groupby(["round", "host"]).size()
    assert (per <= cap).all(), per[per > cap]


def test_bfs_max_pages_budget(ray_session, pages_path, seeds, tmp_path):
    from crawl4ai_custom_ray.frontier.crawl import BFSCrawl, CrawlConfig

    cfg = CrawlConfig(max_depth=3, max_pages=10, n_seen_shards=2)
    driver = BFSCrawl(pages_path, cfg, str(tmp_path / "ckpt_budget"))
    try:
        visited = driver.run(seeds).to_pandas()
    finally:
        driver.shutdown()
    # reference budget semantics (bfs_strategy.py:162-180): whole
    # levels are crawled (a level may overshoot), only SUCCESSFUL
    # fetches count, and no new level starts at/after the budget
    page_urls = set(pq.read_table(pages_path, columns=["url"])["url"].to_pylist())
    visited = visited.sort_values(["round"])
    succ = visited["url"].isin(page_urls)
    # cumulative successes BEFORE each round's start stay under budget
    for rnd in sorted(visited["round"].unique()):
        assert succ[visited["round"] < rnd].sum() < 10, rnd
    assert succ.sum() >= 10  # budget was actually reached


def test_bfs_resume_from_checkpoint(ray_session, pages_path, seeds, tmp_path):
    from crawl4ai_custom_ray.frontier.crawl import BFSCrawl, CrawlConfig
    from crawl4ai_custom_ray.state import checkpoint as ckpt

    ckpt_dir = str(tmp_path / "ckpt_resume")

    # full run for the expected result
    cfg = CrawlConfig(max_depth=3, n_seen_shards=2)
    d_full = BFSCrawl(pages_path, cfg, str(tmp_path / "ckpt_full"))
    try:
        expected = d_full.run(seeds).to_pandas()
    finally:
        d_full.shutdown()

    # partial run: stop after 2 rounds (max_rounds), then resume
    cfg_partial = CrawlConfig(max_depth=3, n_seen_shards=2, max_rounds=2)
    d1 = BFSCrawl(pages_path, cfg_partial, ckpt_dir)
    try:
        d1.run(seeds)
    finally:
        d1.shutdown()
    assert ckpt.latest_committed_round(ckpt_dir) == 1

    cfg_rest = CrawlConfig(max_depth=3, n_seen_shards=2)
    d2 = BFSCrawl(pages_path, cfg_rest, ckpt_dir)
    try:
        resumed = d2.run(seeds, resume=True).to_pandas()
    finally:
        d2.shutdown()

    got = dict(zip(resumed["url"], resumed["depth"]))
    want = dict(zip(expected["url"], expected["depth"]))
    assert got == want


@pytest.mark.parametrize("mode", ["bloom", "cuckoo"])
def test_bfs_approximate_seen_matches_exact(ray_session, pages_path, seeds, tmp_path, mode):
    """bloom/cuckoo URL-seen modes produce the same crawl as the exact
    set at this scale (FPs are ~absent below a few thousand urls);
    metrics expose the mode and the exact lower bound for FP
    accounting."""
    from crawl4ai_custom_ray.frontier.crawl import BFSCrawl, CrawlConfig
    from crawl4ai_custom_ray.state.checkpoint import all_metrics

    exact = BFSCrawl(
        pages_path, CrawlConfig(max_depth=2, n_seen_shards=2), str(tmp_path / "x")
    )
    try:
        want = exact.run(seeds).to_pandas()
    finally:
        exact.shutdown()

    approx = BFSCrawl(
        pages_path,
        CrawlConfig(max_depth=2, n_seen_shards=2, seen_mode=mode, seen_capacity_per_shard=10_000),
        str(tmp_path / mode),
    )
    try:
        got = approx.run(seeds).to_pandas()
    finally:
        approx.shutdown()

    assert dict(zip(got["url"], got["depth"])) == dict(zip(want["url"], want["depth"]))
    metrics = all_metrics(str(tmp_path / mode))
    assert metrics[-1]["seen_mode"] == mode
    assert metrics[-1]["seen_exact_lower_bound"] <= metrics[-1]["seen_total"] + 1


def test_driver_and_dataset_round_paths_agree(ray_session, tmp_path):
    """The driver-coordinated small-round path and the distributed
    dataset path must visit exactly the same rows (bfs + best_first)."""
    import pyarrow.parquet as pq

    from crawl4ai_custom_ray.frontier.crawl import BFSCrawl, CrawlConfig
    from crawl4ai_custom_ray.sources.pages import pages_parquet_path

    base_pages = pages_parquet_path("/root/testdata/sf0.001")
    seeds = sorted(
        u
        for u in pq.read_table(base_pages, columns=["url"])["url"].to_pylist()
        if "/private/" not in u
    )[:15]

    def run(strategy, thr):
        driver = BFSCrawl(
            base_pages,
            CrawlConfig(
                strategy=strategy,
                best_first_batch_size=8,
                max_depth=2,
                per_host_cap=20,
                check_robots=True,
                n_seen_shards=2,
                max_pages=40 if strategy == "best_first" else None,
                driver_round_threshold=thr,
                driver_links_threshold=thr * 10,
            ),
            str(tmp_path / f"{strategy}_{thr}"),
        )
        try:
            df = driver.run(seeds).to_pandas()
        finally:
            driver.shutdown()
        return df.sort_values("url").reset_index(drop=True)

    for strategy in ("bfs", "best_first"):
        a = run(strategy, 100_000)  # driver path
        b = run(strategy, 0)  # dataset path
        assert list(a["url"]) == list(b["url"]), strategy
        assert (a[["depth", "round"]].values == b[["depth", "round"]].values).all()
