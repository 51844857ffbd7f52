"""Regressions for the round-3 advisory findings on the frontier crawl.

Each test pins one fixed behavior:

1. A best_first pop consisting entirely of already-visited duplicate
   queue entries must NOT end the crawl (the reference does
   ``if not batch: continue`` — bff_strategy.py:175-176).
2. The mid-batch max_pages replay must run on the DISTRIBUTED
   discovery path too, not just the driver path.
3. A round whose fetch join returns zero rows must record
   ``n_success = 0`` (resume rebuilds pages_visited from these).
4. Resuming a checkpoint written before the ``seq`` column existed
   backfills fixed-width per-depth keys, preserving the equal-length
   positional-comparison invariant.
5. A scored max_pages trim keeps the kept links in score-descending
   order for the next level (the reference's sort persists into the
   next_level append — bfs_strategy.py:131-137).
"""

import asyncio
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawl4ai_custom_ray.sources.pages import pages_parquet_path

from ref_deep_crawl import StubCrawler, StubRunConfig, load_reference_deep_crawl

SF = "/root/testdata/sf0.001"

HOST = "https://t.local"


def _page(links: list[str]) -> str:
    anchors = "".join(f'<a href="{h}">link {i}</a>' for i, h in enumerate(links))
    return f"<html><body><h1>page</h1><p>text here</p>{anchors}</body></html>"


@pytest.fixture(scope="module")
def stale_hub_corpus(tmp_path_factory):
    """Corpus engineered so duplicate queue entries of a LOW-score hub
    page accumulate faster than a batch-2 best_first pop drains them:
    six high-score pages each rediscover the hub before it is popped,
    so after the hub's visit the queue still holds 5 stale hub entries
    — two consecutive pops (4 entries) are entirely stale while the
    hub's own children are still pending behind them."""
    pages = {f"{HOST}/seed": _page([f"/good{i}" for i in range(6)] + ["/aaa-hub"])}
    for i in range(6):
        pages[f"{HOST}/good{i}"] = _page(["/aaa-hub"])
    pages[f"{HOST}/aaa-hub"] = _page(["/x-after", "/y-after"])
    pages[f"{HOST}/x-after"] = _page([])
    pages[f"{HOST}/y-after"] = _page([])
    path = str(tmp_path_factory.mktemp("stale_hub") / "pages.parquet")
    pq.write_table(
        pa.table(
            {
                "url": pa.array(list(pages), pa.string()),
                "html": pa.array(
                    [h.encode() for h in pages.values()], pa.binary()
                ),
            }
        ),
        path,
    )
    return path, pages


def _ref_order(strategy, seed: str, pages: dict) -> list[str]:
    crawler = StubCrawler(pages)
    results = asyncio.run(strategy._arun_batch(seed, crawler, StubRunConfig()))
    return [r.url for r in results]


def _our_run(pages_path: str, seeds: list[str], tmp_path, **cfg_kw):
    from crawl4ai_custom_ray.frontier.crawl import CrawlConfig, crawl_bfs

    visited, driver = crawl_bfs(
        pages_path, seeds, CrawlConfig(**cfg_kw), str(tmp_path)
    )
    try:
        return visited.to_pandas()
    finally:
        driver.shutdown()


def test_best_first_all_stale_pop_continues(
    ray_session, stale_hub_corpus, tmp_path, monkeypatch
):
    """Advisory #1: the all-stale pop must continue, not break — the
    hub's children (discovered the round the hub is finally visited)
    sort BEHIND the stale duplicate entries, so a break would silently
    discard them.  Order parity against the reference's own
    BestFirstCrawlingStrategy run at the same batch size."""
    pages_path, pages = stale_hub_corpus
    seed = f"{HOST}/seed"
    dc = load_reference_deep_crawl()
    bff_mod = sys.modules["crawl4ai.deep_crawling.bff_strategy"]
    monkeypatch.setattr(bff_mod, "BATCH_SIZE", 2)
    from crawl4ai_custom_ray.frontier.scorers import KeywordRelevanceScorer

    expected = _ref_order(
        dc.BestFirstCrawlingStrategy(
            max_depth=3, url_scorer=dc.KeywordRelevanceScorer(keywords=["good"])
        ),
        seed,
        pages,
    )
    # the scenario only bites if the reference itself crawls PAST the
    # hub — its children must be in the expected sequence
    assert f"{HOST}/x-after" in expected and f"{HOST}/y-after" in expected
    assert expected.index(f"{HOST}/aaa-hub") < expected.index(f"{HOST}/x-after")

    df = _our_run(
        pages_path,
        [seed],
        tmp_path / "ours",
        strategy="best_first",
        best_first_batch_size=2,
        max_depth=3,
        max_rounds=30,
        scorer=KeywordRelevanceScorer(keywords=["good"]),
        n_seen_shards=2,
    ).sort_values(["round", "seq"])
    assert list(df["url"]) == expected

    # pin that the scenario really exercised the continue path: at
    # least one committed round popped only stale entries (zero
    # visits) while the frontier still had work left
    from crawl4ai_custom_ray.state import checkpoint as ckpt

    metrics = ckpt.all_metrics(str(tmp_path / "ours"))
    stale_rounds = [
        m for m in metrics if m["n_visited"] == 0 and m["n_frontier_out"] > 0
    ]
    assert stale_rounds, [
        (m["n_visited"], m["n_frontier_out"]) for m in metrics
    ]


def test_best_first_budget_replay_on_distributed_path(
    ray_session, tmp_path
):
    """Advisory #2: with every round forced through the distributed
    discovery chain (thresholds 0), a budgeted best_first crawl must
    still replay the reference's mid-batch max_pages truncation —
    same crawled set as the reference code."""
    pages_path = pages_parquet_path(SF)
    t = pq.read_table(pages_path, columns=["url", "html"])
    pages = {
        u: (h.decode() if isinstance(h, bytes) else h)
        for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist())
    }
    seed = sorted(pages)[0]
    dc = load_reference_deep_crawl()
    from crawl4ai_custom_ray.frontier.scorers import KeywordRelevanceScorer

    kw = ["articles", "doc-1"]
    expected = set(
        _ref_order(
            dc.BestFirstCrawlingStrategy(
                max_depth=3,
                url_scorer=dc.KeywordRelevanceScorer(keywords=kw),
                max_pages=15,
            ),
            seed,
            pages,
        )
    )
    df = _our_run(
        pages_path,
        [seed],
        tmp_path / "dist",
        strategy="best_first",
        max_depth=3,
        max_pages=15,
        scorer=KeywordRelevanceScorer(keywords=kw),
        driver_round_threshold=0,
        driver_links_threshold=0,
        broadcast_fetch_threshold=0,
        fetch_strategy="join",
        n_seen_shards=2,
    )
    assert set(df["url"]) == expected


def test_zero_row_fetch_round_records_zero_success(
    ray_session, tmp_path, tmp_path_factory
):
    """Advisory #3: a round whose every selected URL is absent from
    the pages table (fetch join returns zero rows) must commit
    n_success = 0 — summed n_success is what a resume rebuilds
    pages_visited from."""
    from crawl4ai_custom_ray.state import checkpoint as ckpt

    pages = {
        f"{HOST}/seed": _page(["/ghost1", "/ghost2"]),
    }
    path = str(tmp_path_factory.mktemp("ghosts") / "pages.parquet")
    pq.write_table(
        pa.table(
            {
                "url": pa.array(list(pages), pa.string()),
                "html": pa.array([h.encode() for h in pages.values()], pa.binary()),
            }
        ),
        path,
    )
    ckpt_dir = tmp_path / "ghost_ckpt"
    df = _our_run(
        path, [f"{HOST}/seed"], ckpt_dir, max_depth=2, n_seen_shards=2
    )
    # both ghosts are selected (they enter the frontier) but fail
    metrics = ckpt.all_metrics(str(ckpt_dir))
    assert len(metrics) >= 2
    assert metrics[1]["n_visited"] == 2  # ghosts were attempted
    assert metrics[1]["n_success"] == 0  # ...but none fetched
    assert sum(m["n_success"] for m in metrics) == 1  # just the seed


def test_legacy_checkpoint_without_seq_resumes_fixed_width(
    ray_session, stale_hub_corpus, tmp_path
):
    """Advisory #4: a pre-seq frontier checkpoint backfills a
    fixed-width per-depth placeholder, so every key at a given depth
    keeps the equal-length comparison invariant after resume."""
    from crawl4ai_custom_ray.frontier.crawl import CrawlConfig, crawl_bfs

    pages_path, pages = stale_hub_corpus
    seed = f"{HOST}/seed"
    ckpt_dir = str(tmp_path / "legacy")

    # run exactly one round, leaving a committed frontier checkpoint
    cfg = dict(max_depth=3, n_seen_shards=2)
    visited, driver = crawl_bfs(
        pages_path, [seed], CrawlConfig(max_rounds=1, **cfg), ckpt_dir
    )
    try:
        first = visited.to_pandas()
    finally:
        driver.shutdown()
    assert len(first) == 1  # only the seed so far

    # strip the seq column from the round-0 frontier = legacy layout
    from crawl4ai_custom_ray.state import checkpoint as ckpt

    fdir = os.path.join(ckpt.round_dir(ckpt_dir, 0), "frontier")
    parts = [os.path.join(fdir, n) for n in os.listdir(fdir) if n.endswith(".parquet")]
    assert parts
    for p in parts:
        t = pq.read_table(p)
        pq.write_table(t.drop_columns(["seq"]), p)

    # resume to completion: every visited row's key must be exactly
    # (depth+1) hops of 8 hex chars — legacy rows and their children
    # included — and the crawl must reach the full reachable set
    visited2, driver2 = crawl_bfs(
        pages_path, [seed], CrawlConfig(max_rounds=30, **cfg), ckpt_dir
    )
    try:
        df = visited2.to_pandas()
    finally:
        driver2.shutdown()
    assert set(df["url"]) == set(pages)
    widths_ok = [
        len(s) == 8 * (int(d) + 1) for s, d in zip(df["seq"], df["depth"])
    ]
    assert all(widths_ok), df[[not w for w in widths_ok]]


def test_scored_budget_cap_keeps_score_order():
    """Advisory #5: when a scored max_pages trim fires, the kept rows'
    replay keys must encode score-descending order within each parent
    (the reference's sort persists into the next level)."""
    import pandas as pd

    from crawl4ai_custom_ray.frontier.crawl import _budget_cap_pandas

    df = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(5)],
            "parent": ["p"] * 5,
            "score": [0.1, 0.9, 0.5, 0.9, 0.3],
            "seq": [f"{i:08x}" for i in range(5)],
            "depth": [1] * 5,
            "host": ["h"] * 5,
        }
    )
    kept = _budget_cap_pandas(df.copy(), cap=3, use_score=True)
    # top-3 by score (stable on ties: u1 before u3)
    assert list(kept["url"]) == sorted(
        kept["url"], key=lambda u: list(kept.sort_values("seq")["url"]).index(u)
    )
    by_seq = kept.sort_values("seq")
    assert list(by_seq["url"]) == ["u1", "u3", "u2"]
    assert list(by_seq["score"]) == [0.9, 0.9, 0.5]
    # keys stay fixed-width (one 8-hex hop at this depth)
    assert all(len(s) == 8 for s in by_seq["seq"])
    # unscored trim keeps discovery order untouched
    kept2 = _budget_cap_pandas(df.copy(), cap=3, use_score=False)
    assert list(kept2.sort_values("seq")["url"]) == ["u0", "u1", "u2"]
