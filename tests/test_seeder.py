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


# ------------------------------------------------------------ WARC source


def test_warc_parser_framing_and_record_types():
    """Content-Length framing: html containing CRLFCRLF or fake WARC
    headers must NOT split records; non-response records are skipped."""
    import datetime as dt

    from crawl4ai_custom_ray.sources.warc import (
        _render_record,
        parse_warc_bytes,
    )

    ts = dt.datetime(2025, 1, 2, 3, 4, 5)
    tricky_html = b"<p>a</p>\r\n\r\nWARC/1.0\r\n<p>Content-Length: 9</p>"
    buf = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nmeta\r\n\r\n"
        + _render_record("https://x.test/1", ts, tricky_html)
        + _render_record("https://x.test/2", ts, b"<p>b</p>")
    )
    rows = parse_warc_bytes(buf)
    assert [r["url"] for r in rows] == ["https://x.test/1", "https://x.test/2"]
    assert rows[0]["html"] == tricky_html
    assert rows[0]["warc_ts"] == ts
    assert rows[1]["html"] == b"<p>b</p>"


def test_warc_round_trip_dataset(ray_session, tmp_path):
    """Render → read_warc → identical (url, warc_ts, html) rows."""
    import datetime as dt

    from crawl4ai_custom_ray.sources.warc import _render_record, read_warc

    ts = dt.datetime(2025, 5, 6, 7, 8, 9)
    recs = [(f"https://t.test/{i}", ts, f"<p>doc {i}</p>".encode()) for i in range(7)]
    for shard in range(2):
        with open(tmp_path / f"part_{shard}.warc", "wb") as f:
            for u, t, h in recs[shard::2]:
                f.write(_render_record(u, t, h))
    out = read_warc(str(tmp_path)).to_pandas().sort_values("url").reset_index(drop=True)
    assert len(out) == 7
    assert list(out["url"]) == sorted(u for u, _, _ in recs)
    assert out["html"][0] == b"<p>doc 0</p>"
    assert out["warc_ts"][0] == ts


def test_warc_charset_aware_decode(ray_session, tmp_path):
    """The HTTP block's charset governs the decode (reference
    response-charset precedence): a latin-1 payload round-trips."""
    import datetime as dt

    from crawl4ai_custom_ray.sources.warc import (
        _render_record,
        read_warc_decoded,
    )

    ts = dt.datetime(2025, 3, 4, 5, 6, 7)
    recs = [
        ("https://enc.test/l1", "café résumé".encode("latin-1"),
         "text/html; charset=iso-8859-1"),
        ("https://enc.test/u8", "café".encode("utf-8"),
         "text/html; charset=utf-8"),
        ("https://enc.test/cp", b"\x93smart\x94",
         "text/html"),  # no charset -> probe -> cp1252
    ]
    with open(tmp_path / "part_0.warc", "wb") as f:
        for u, h, ct in recs:
            f.write(_render_record(u, ts, h, content_type=ct))
    out = (
        read_warc_decoded(str(tmp_path))
        .to_pandas()
        .set_index("url")
    )
    assert out.loc["https://enc.test/l1", "html_text"] == "café résumé"
    assert out.loc["https://enc.test/l1", "encoding"] == "iso-8859-1"
    assert out.loc["https://enc.test/u8", "html_text"] == "café"
    assert out.loc["https://enc.test/cp", "html_text"] == "“smart”"
    assert out.loc["https://enc.test/cp", "encoding"] == "cp1252"


def test_sitemaps_from_robots_line_semantics(ray_session):
    """Reference parse: case-insensitive 'sitemap:' prefix, split on
    the FIRST colon (scheme colon survives), strip; other lines and
    hosts without the line contribute nothing."""
    import pyarrow as pa
    import ray.data as rd

    from crawl4ai_custom_ray.sources.seeder import sitemaps_from_robots

    robots = rd.from_arrow(
        pa.table(
            {
                "host": ["a.test", "b.test", "c.test"],
                "robots_txt": [
                    "User-agent: *\nSITEMAP: https://a.test/sm.xml\n",
                    "User-agent: *\nDisallow: /x\n",
                    "sitemap:https://c.test/1.xml\nSitemap: https://c.test/2.xml\n",
                ],
            }
        )
    )
    out = sitemaps_from_robots(robots).to_pandas()
    got = sorted(zip(out["host"], out["sitemap_url"]))
    assert got == [
        ("a.test", "https://a.test/sm.xml"),
        ("c.test", "https://c.test/1.xml"),
        ("c.test", "https://c.test/2.xml"),
    ]
