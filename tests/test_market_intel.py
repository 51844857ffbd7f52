"""End-to-end test of the bundled market_intel hub crawler
(reference ``market_intel/collect.py`` + ``state.py`` analogue):
seed queries → discovery → structured extraction → resumable JSONL."""

import json
import os

import pytest

from crawl4ai_custom_ray.crawlers.market_intel.crawler import (
    CollectionState,
    MarketIntelCrawler,
)
from crawl4ai_custom_ray.pipelines.hub import CrawlerHub

SF = "/root/testdata/sf0.001"
SEEDS = ["batch stream processing", "spark query engine"]


def test_hub_registration():
    assert "market_intel" in CrawlerHub.available()
    cls = CrawlerHub.get("market_intel")
    assert cls is MarketIntelCrawler
    assert cls.meta.get("version") == "1.0.0"


def test_collect_extract_resume(ray_session, tmp_path):
    out = str(tmp_path / "mi")
    crawler = MarketIntelCrawler()

    res = crawler.run(SF, seeds=SEEDS, out_dir=out, k_per_seed=3).to_pandas()
    assert len(res) > 0
    assert set(res.columns) >= {
        "url", "seed_query", "title", "summary", "n_links", "extracted_content",
    }
    # structured payload parses and titles came from the page <h1>
    payload = json.loads(res.iloc[0]["extracted_content"])
    assert isinstance(payload, list) and payload
    assert (res["title"] != "").any()

    st = CollectionState.load(os.path.join(out, "state.json"))
    assert sorted(st.processed_seeds) == sorted(SEEDS)
    assert st.total_extracted == len(res)
    assert not st.halted
    n_shards = len(os.listdir(os.path.join(out, "products")))
    assert n_shards == 1

    # resume: same seeds → nothing new extracted, no new shard, same rows
    res2 = crawler.run(SF, seeds=SEEDS, out_dir=out, k_per_seed=3).to_pandas()
    assert len(res2) == len(res)
    assert len(os.listdir(os.path.join(out, "products"))) == n_shards
    st2 = CollectionState.load(os.path.join(out, "state.json"))
    assert st2.total_extracted == st.total_extracted

    # a NEW seed on the same out_dir extends the dataset incrementally
    res3 = crawler.run(
        SF, seeds=SEEDS + ["merge window analytics"], out_dir=out, k_per_seed=3
    ).to_pandas()
    assert len(res3) >= len(res)
    st3 = CollectionState.load(os.path.join(out, "state.json"))
    assert "merge window analytics" in st3.processed_seeds


def test_determinism(ray_session, tmp_path):
    a = MarketIntelCrawler().run(
        SF, seeds=SEEDS, out_dir=str(tmp_path / "a"), k_per_seed=3
    ).to_pandas().sort_values("url").reset_index(drop=True)
    b = MarketIntelCrawler().run(
        SF, seeds=SEEDS, out_dir=str(tmp_path / "b"), k_per_seed=3
    ).to_pandas().sort_values("url").reset_index(drop=True)
    assert a.equals(b)


def test_halt_on_consecutive_failures(tmp_path):
    """The reference halts after N consecutive extraction failures
    (state.py:236-243); the state machine replays that exactly."""
    st = CollectionState()
    for i, u in enumerate(["u1", "u2", "u3"]):
        st.products[u] = {
            "url": u, "seed_query": "q", "extracted": False,
            "extraction_error": None, "extraction_attempts": 0,
        }
    st.mark_failure("u1", "boom", max_consecutive=3)
    assert not st.halted
    st.mark_success("u2")
    assert st.consecutive_failures == 0  # success resets the streak
    st.mark_failure("u1", "boom", max_consecutive=3)
    st.mark_failure("u3", "boom", max_consecutive=3)
    assert not st.halted
    st.mark_failure("u1", "boom", max_consecutive=3)
    assert st.halted and "consecutive" in st.halt_reason

    # a halted state refuses new work but still serves collected data
    p = tmp_path / "halted"
    os.makedirs(p / "products", exist_ok=True)
    st.save(str(p / "state.json"))
    out = MarketIntelCrawler().run(
        SF, seeds=["anything"], out_dir=str(p), k_per_seed=2
    )
    assert out.count() == 0
    st2 = CollectionState.load(str(p / "state.json"))
    assert st2.halted and "anything" not in st2.processed_seeds
