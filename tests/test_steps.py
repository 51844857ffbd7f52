"""Pipeline-step API: registry, composition, custom steps."""

import pytest

from crawl4ai_custom_ray.pipelines.flagship import read_pages
from crawl4ai_custom_ray.pipelines.steps import (
    available_steps,
    build_pipeline,
    compose,
    make_step,
    register_step,
)

SF = "/root/testdata/sf0.001"


def test_registry_lists_builtins():
    steps = available_steps()
    for name in ("extract", "filter_success", "chunk", "dedup_exact", "select", "limit"):
        assert name in steps


def test_unknown_step_raises():
    with pytest.raises(KeyError):
        make_step("nope")


def test_extract_pipeline(ray_session):
    pipe = build_pipeline(
        [
            ("extract", {"columns": ["text", "success"]}),
            "filter_success",
            ("select", {"columns": ["url", "text"]}),
            ("limit", {"n": 10}),
        ]
    )
    out = pipe(read_pages(SF)).to_pandas()
    assert len(out) == 10
    assert list(out.columns) == ["url", "text"]


def test_chunk_pipeline(ray_session):
    import ray.data as rd

    pipe = build_pipeline([("chunk", {"kind": "fixed", "chunk_size": 5})])
    ds = rd.from_items([{"doc_id": 1, "text": " ".join(f"w{i}" for i in range(12))}])
    out = pipe(ds).to_pandas()
    assert len(out) == 3  # 12 words / 5


def test_custom_step_registration(ray_session):
    import pyarrow as pa

    @register_step("upper_url_test")
    def _upper(**_):
        def fn(batch: pa.Table) -> pa.Table:
            urls = [u.upper() for u in batch["url"].to_pylist()]
            return batch.set_column(
                batch.schema.get_field_index("url"), "url", pa.array(urls)
            )

        return lambda ds: ds.map_batches(fn, batch_format="pyarrow")

    pipe = compose(make_step("upper_url_test"), make_step("limit", n=3))
    out = pipe(read_pages(SF).select_columns(["url"])).to_pandas()
    assert out["url"].str.startswith("HTTPS://").all()


# ------------------------------------------------------- crawler hub


def test_hub_discovers_bundled_crawler():
    from crawl4ai_custom_ray.pipelines.hub import BaseCrawler, CrawlerHub

    assert "site_search" in CrawlerHub.available()
    cls = CrawlerHub.get("site_search")
    assert issubclass(cls, BaseCrawler)
    assert cls.meta.get("version") == "1.0.0"
    assert CrawlerHub.get("no_such_crawler") is None


def test_hub_explicit_registration_and_contract():
    import pytest

    from crawl4ai_custom_ray.pipelines.hub import BaseCrawler, CrawlerHub

    @CrawlerHub.register("toy")
    class ToyCrawler(BaseCrawler):
        def run(self, source: str = "", **kwargs):
            return {"source": source, **kwargs}

    assert CrawlerHub.get("toy") is ToyCrawler
    assert ToyCrawler().run("x", a=1) == {"source": "x", "a": 1}

    # interface enforcement mirrors the reference: run must take
    # (self, source); async defs are rejected in the batch engine
    with pytest.raises(TypeError):

        class BadSignature(BaseCrawler):
            def run(self):  # missing source
                return None

    with pytest.raises(TypeError):

        class BadAsync(BaseCrawler):
            async def run(self, source: str = "", **kwargs):
                return None


def test_site_search_crawler_end_to_end(ray_session):
    from crawl4ai_custom_ray.pipelines.hub import CrawlerHub

    crawler = CrawlerHub.get("site_search")()
    out = crawler.run("/root/testdata/sf0.001", query="stream join", k=5).to_pandas()
    assert 1 <= len(out) <= 5
    assert list(out.columns) == ["url", "title", "score", "snippet"]
    # deterministic total order: scores non-increasing, url tiebreak
    s = out["score"].tolist()
    assert s == sorted(s, reverse=True)
    assert (out["score"] > 0).all()
    out2 = crawler.run("/root/testdata/sf0.001", query="stream join", k=5).to_pandas()
    assert out.equals(out2)
