"""Tests for the pure HTML kernel: DOM, scrape, markdown, pruning,
BM25, tables, schema preprocessing. Fixture style mirrors the
reference's inline-HTML filter tests
(``tests/async/test_content_filter_prune.py``)."""

import pytest

from crawl4ai_custom_ray.html.bm25 import BM25ContentFilter, BM25Okapi
from crawl4ai_custom_ray.html.dom import parse, body_of
from crawl4ai_custom_ray.html.markdown import (
    convert_links_to_citations,
    generate_markdown,
    html_to_markdown,
)
from crawl4ai_custom_ray.html.metadata import extract_metadata
from crawl4ai_custom_ray.html.pruning import PruningContentFilter
from crawl4ai_custom_ray.html.schema_html import preprocess_html_for_schema
from crawl4ai_custom_ray.html.scrape import scrape
from crawl4ai_custom_ray.html.tables import extract_tables, is_data_table
from crawl4ai_custom_ray.kernel import extract_page

BASIC_HTML = """
<html><head>
  <title>Test Page</title>
  <meta name="description" content="A test description">
  <meta name="keywords" content="alpha, beta">
  <meta name="author" content="Jane Doe">
  <meta property="og:title" content="OG Title">
  <meta name="twitter:card" content="summary">
</head><body>
  <nav class="nav"><a href="/home">Home</a> <a href="/about">About</a></nav>
  <article>
    <h1>Main Heading</h1>
    <p>This is the main article content with plenty of meaningful words to keep
    the pruning filter happy and retain this paragraph in the output.</p>
    <p>Another paragraph with a <a href="/inner/link">useful link</a> and more
    explanatory prose that carries the actual information of the page.</p>
  </article>
  <footer><a href="/privacy">Privacy</a></footer>
  <script>var x = 1;</script>
</body></html>
"""


class TestDom:
    def test_parse_and_text(self):
        root = parse("<p>Hello <b>world</b>!</p>")
        assert root.get_text() == "Hello world!"

    def test_find_all(self):
        root = parse("<div><p>a</p><p>b</p><span>c</span></div>")
        assert len(root.find_all("p")) == 2

    def test_serialize_roundtrip(self):
        html = '<div id="x"><p>a &amp; b</p><br><img src="i.png"></div>'
        root = parse(html)
        assert root.serialize_contents() == html

    def test_decompose(self):
        root = parse("<div><p>a</p><p>b</p></div>")
        root.find("p").decompose()
        assert len(root.find_all("p")) == 1

    def test_implied_p_close(self):
        root = parse("<p>one<p>two")
        ps = root.find_all("p")
        assert [p.get_text() for p in ps] == ["one", "two"]

    def test_raw_script_content(self):
        root = parse("<script>if (a < b) { x(); }</script><p>t</p>")
        assert root.find("p").get_text() == "t"
        assert "a < b" in root.find("script").children[0].text

    def test_body_of_fragment(self):
        root = parse("<p>no body</p>")
        assert body_of(root) is root


class TestMetadata:
    def test_fields(self):
        meta = extract_metadata(parse(BASIC_HTML))
        assert meta["title"] == "Test Page"
        assert meta["description"] == "A test description"
        assert meta["keywords"] == "alpha, beta"
        assert meta["author"] == "Jane Doe"
        assert meta["og:title"] == "OG Title"
        assert meta["twitter:card"] == "summary"

    def test_og_title_fallback(self):
        html = '<html><head><meta property="og:title" content="Only OG"></head><body></body></html>'
        assert extract_metadata(parse(html))["title"] == "Only OG"


class TestScrape:
    def test_basic(self):
        result = scrape("https://example.com/page", BASIC_HTML)
        assert result["success"]
        assert "script" not in result["cleaned_html"]
        assert "Main Heading" in result["cleaned_html"]
        assert result["metadata"]["title"] == "Test Page"

    def test_links_internal_external_first_wins(self):
        html = """<html><body>
        <a href="/a">first</a><a href="/a">dup</a>
        <a href="https://other.org/x" title="t">ext</a>
        </body></html>"""
        result = scrape("https://example.com/", html)
        internal = result["links"]["internal"]
        external = result["links"]["external"]
        assert len(internal) == 1
        assert internal[0]["href"] == "https://example.com/a"
        assert internal[0]["text"] == "first"
        assert len(external) == 1
        assert external[0]["base_domain"] == "other.org"

    def test_exclude_external_links_removes_from_dom(self):
        html = '<html><body><p>keep this paragraph of words here</p><a href="https://other.org/x">ext</a></body></html>'
        result = scrape("https://example.com/", html, exclude_external_links=True)
        assert result["links"]["external"] == []
        assert "other.org" not in result["cleaned_html"]

    def test_attrs_stripped_to_important(self):
        html = '<html><body><p class="x" data-y="1" title="keep">some words of content here</p></body></html>'
        result = scrape("https://example.com/", html)
        assert 'class="x"' not in result["cleaned_html"]
        assert 'title="keep"' in result["cleaned_html"]

    def test_empty_elements_removed(self):
        html = "<html><body><div></div><p>kept words</p></body></html>"
        result = scrape("https://example.com/", html)
        assert "<div></div>" not in result["cleaned_html"]

    def test_excluded_tags(self):
        result = scrape("https://example.com/", BASIC_HTML, excluded_tags=["nav", "footer"])
        assert "/privacy" not in result["cleaned_html"]
        assert all(
            link["href"] != "https://example.com/privacy"
            for link in result["links"]["internal"]
        )


class TestMarkdown:
    def test_heading_and_paragraph(self):
        # single_line_break=True: blocks separated by one newline
        # (reference generator defaults)
        md = html_to_markdown("<h1>Title</h1><p>Body text.</p>")
        assert md == "# Title\nBody text.\n"

    def test_link(self):
        md = html_to_markdown('<p>See <a href="https://x.com/a">this</a>.</p>')
        assert "[this](https://x.com/a)" in md

    def test_list(self):
        md = html_to_markdown("<ul><li>one</li><li>two</li></ul>")
        assert "* one" in md and "* two" in md

    def test_ordered_list(self):
        md = html_to_markdown("<ol><li>one</li><li>two</li></ol>")
        assert "1. one" in md and "2. two" in md

    def test_pre_fenced(self):
        md = html_to_markdown("<pre>code here\nline2</pre>")
        assert "```\ncode here\nline2\n```" in md

    def test_bold_italic_inline_code(self):
        md = html_to_markdown("<p><b>bold</b> <i>it</i> <code>c()</code></p>")
        assert "**bold**" in md and "_it_" in md and "`c()`" in md

    def test_citations(self):
        md = "See [one](https://x.com/1) and [two](https://x.com/2) and [one again](https://x.com/1)."
        converted, refs = convert_links_to_citations(md)
        assert "one⟨1⟩" in converted
        assert "two⟨2⟩" in converted
        assert "one again⟨1⟩" in converted
        assert "## References" in refs
        assert "⟨1⟩ https://x.com/1" in refs

    def test_citations_relative_joined(self):
        converted, refs = convert_links_to_citations(
            "[a](/rel)", base_url="https://example.com"
        )
        assert "⟨1⟩ https://example.com/rel" in refs

    def test_determinism(self):
        md1 = html_to_markdown(BASIC_HTML)
        md2 = html_to_markdown(BASIC_HTML)
        assert md1 == md2


class TestPruning:
    def test_link_heavy_nav_pruned_content_kept(self):
        blocks = PruningContentFilter().filter_content(BASIC_HTML)
        joined = " ".join(blocks)
        assert "main article content" in joined
        # nav/footer are excluded tags — never in output
        assert "/privacy" not in joined
        assert "Home" not in joined

    def test_empty_input(self):
        assert PruningContentFilter().filter_content("") == []
        assert PruningContentFilter().filter_content(None) == []

    def test_min_word_threshold(self):
        html = "<html><body><article><p>tiny</p></article></body></html>"
        blocks = PruningContentFilter(min_word_threshold=50).filter_content(html)
        assert blocks == []


class TestBM25:
    def test_okapi_scores_relevant_higher(self):
        corpus = [["spark", "query", "engine"], ["cooking", "recipes"], ["spark", "cluster"]]
        bm = BM25Okapi(corpus)
        scores = bm.get_scores(["spark"])
        assert scores[0] > scores[1]
        assert scores[2] > scores[1]

    def test_filter_selects_relevant(self):
        html = """<html><head><title>Spark engines</title></head><body>
        <h1>Spark engines</h1>
        <p>Spark engines process queries with distributed execution across spark clusters.</p>
        <p>Totally unrelated gardening paragraph about flowers and soil and watering.</p>
        </body></html>"""
        blocks = BM25ContentFilter().filter_content(html)
        joined = " ".join(blocks)
        # relevant content survives, the off-topic paragraph does not
        assert blocks
        assert "gardening" not in joined
        assert "Spark" in joined


class TestTables:
    DATA_TABLE = """
    <table>
      <caption>Stats</caption>
      <thead><tr><th>Name</th><th>Value</th></tr></thead>
      <tbody>
        <tr><td>alpha</td><td>1</td></tr>
        <tr><td>beta</td><td>2</td></tr>
      </tbody>
    </table>"""

    def test_data_table_detected(self):
        table = parse(self.DATA_TABLE).find("table")
        assert is_data_table(table)

    def test_layout_table_rejected(self):
        table = parse('<table role="presentation"><tr><td>x</td></tr></table>').find("table")
        assert not is_data_table(table)

    def test_extract(self):
        tables = extract_tables(parse(self.DATA_TABLE))
        assert len(tables) == 1
        t = tables[0]
        assert t["headers"] == ["Name", "Value"]
        assert t["rows"] == [["alpha", "1"], ["beta", "2"]]
        assert t["caption"] == "Stats"
        assert t["metadata"]["row_count"] == 2

    def test_colspan_duplication(self):
        html = """<table><thead><tr><th colspan="2">Wide</th><th>C</th></tr></thead>
        <tr><td>1</td><td>2</td><td>3</td></tr>
        <tr><td>4</td><td>5</td><td>6</td></tr></table>"""
        tables = extract_tables(parse(html), threshold=5)
        assert tables and tables[0]["headers"] == ["Wide", "Wide", "C"]


class TestSchemaHtml:
    def test_head_and_scripts_removed(self):
        out = preprocess_html_for_schema(BASIC_HTML)
        assert "<title>" not in out
        assert "<script>" not in out

    def test_attr_filtering_and_truncation(self):
        html = '<html><body><div class="keep" style="drop" data-x="1">text</div></body></html>'
        out = preprocess_html_for_schema(html)
        assert 'class="keep"' in out and "style" not in out and 'data-x="1"' in out

    def test_long_text_truncated(self):
        html = f"<html><body><p>{'x' * 300}</p></body></html>"
        out = preprocess_html_for_schema(html, text_threshold=100)
        assert "x" * 100 + "..." in out and "x" * 101 not in out

    def test_duplicate_siblings_dropped(self):
        html = (
            '<html><body>'
            '<div class="card">same</div><div class="card">same</div>'
            '<div class="card">different</div></body></html>'
        )
        out = preprocess_html_for_schema(html)
        assert out.count("same") == 1
        assert "different" in out


class TestKernel:
    def test_extract_page_full(self):
        rec = extract_page("https://example.com/page", BASIC_HTML)
        assert rec["success"]
        assert "This is the main article content" in rec["text"]
        assert "# Main Heading" in rec["raw_markdown"]
        assert "⟨" in rec["markdown_with_citations"]
        assert '"title": "Test Page"' in rec["metadata"]
        assert any(
            link["href"] == "https://example.com/inner/link" for link in rec["links_internal"]
        )

    def test_extract_page_deterministic(self):
        a = extract_page("https://example.com/page", BASIC_HTML)
        b = extract_page("https://example.com/page", BASIC_HTML)
        assert a == b

    def test_extract_page_bad_html_no_crash(self):
        rec = extract_page("https://example.com/x", "<<<>>>&&&")
        assert rec["url"] == "https://example.com/x"


class TestTextUtils:
    def test_sanitize(self):
        from crawl4ai_custom_ray.html.textutils import sanitize_input_encode

        assert sanitize_input_encode("") == ""
        assert sanitize_input_encode("héllo") == "héllo"
        assert sanitize_input_encode("ok\ud800bad") == "okbad"  # lone surrogate dropped

    def test_fast_format(self):
        from crawl4ai_custom_ray.html.textutils import fast_format_html

        out = fast_format_html("<div><p>hi</p></div>")
        assert out == "<div>\n  <p>\n    hi\n  </p>\n</div>"

    def test_only_text_mode(self):
        result = scrape(
            "https://x.com/", "<html><body><p>Keep <b>bold</b> and <code>c()</code> words</p></body></html>",
            only_text=True,
        )
        assert "<b>" not in result["cleaned_html"]
        assert "<code>" not in result["cleaned_html"]
        assert "bold" in result["cleaned_html"] and "c()" in result["cleaned_html"]
