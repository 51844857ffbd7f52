"""URL seeder: sitemap parsing, synthetic sitemap generation, the
seed pipeline, and the gated LLM/PDF stubs."""

import pytest

from crawl4ai_custom_ray.sources.seeder import (
    build_sitemaps_table,
    parse_sitemap,
    seed_urls,
    sitemaps_parquet_path,
)

SF = "/root/testdata/sf0.001"

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://x.com/a</loc><lastmod>2025-01-01</lastmod></url>
  <url><loc>https://x.com/b</loc></url>
</urlset>"""

INDEX = """<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://x.com/sitemap-0.xml</loc></sitemap>
</sitemapindex>"""

NO_NS = "<urlset><url><loc>https://x.com/c</loc></url></urlset>"


class TestParse:
    def test_urlset(self):
        urls, nested = parse_sitemap(URLSET)
        assert urls == ["https://x.com/a", "https://x.com/b"]
        assert nested == []

    def test_index(self):
        urls, nested = parse_sitemap(INDEX)
        assert urls == []
        assert nested == ["https://x.com/sitemap-0.xml"]

    def test_no_namespace(self):
        urls, _ = parse_sitemap(NO_NS)
        assert urls == ["https://x.com/c"]

    def test_malformed(self):
        assert parse_sitemap("<<<not xml") == ([], [])


def test_synthetic_sitemaps_cover_all_pages():
    import pyarrow.parquet as pq

    from crawl4ai_custom_ray.sources.pages import pages_parquet_path

    table = build_sitemaps_table(SF)
    all_urls = set()
    for xml, is_index in zip(table["xml"].to_pylist(), table["is_index"].to_pylist()):
        if not is_index:
            urls, _ = parse_sitemap(xml)
            all_urls.update(urls)
    expected = set(pq.read_table(pages_parquet_path(SF), columns=["url"])["url"].to_pylist())
    assert all_urls == expected


def test_seed_pipeline(ray_session):
    import ray.data as rd

    smaps = rd.read_parquet(sitemaps_parquet_path(SF))
    out = seed_urls(smaps, pattern="*/articles/*", query="articles doc", max_urls=20).to_pandas()
    assert len(out) == 20
    assert out["url"].str.contains("/articles/").all()
    assert (out["score"] > 0).all()


def test_llm_stubs_gated():
    from crawl4ai_custom_ray.functions.llm_stubs import (
        LLMContentFilter,
        LLMExtractionStrategy,
        LLMTableExtraction,
        PDFProcessorStrategy,
    )

    for cls in (LLMContentFilter, LLMExtractionStrategy, LLMTableExtraction, PDFProcessorStrategy):
        with pytest.raises(NotImplementedError):
            cls()
