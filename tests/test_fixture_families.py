"""Kernel behavior on the FIXTURES.md HTML families (modeled on the
reference's own test fixtures — media-rich, markdown-stress,
malformed, metadata-full, boilerplate-wrapped, large page)."""

from crawl4ai_custom_ray.html.markdown import html_to_markdown
from crawl4ai_custom_ray.html.scrape import scrape
from crawl4ai_custom_ray.kernel import extract_page

MEDIA_RICH = """
<html><body>
  <article><p>A long enough paragraph describing beautiful photographs of
  mountains and rivers for the scoring heuristics to work with.</p></article>
  <img src="/hero.jpg" width="800" height="600" alt="Mountain vista at dawn"
       srcset="/hero-400.jpg 400w, /hero-800.jpg 800w">
  <picture>
    <source srcset="/pic-500.webp 500w">
    <img src="/pic.webp" alt="River bend through the valley">
  </picture>
  <img src="/tiny-icon.png" width="16" height="16">
  <img src="/spacer.gif" style="display:none">
  <img src="data:image/png;base64,AAAA" alt="inline data">
  <button><img src="/button-img.png" alt="in a button"></button>
</body></html>
"""

MARKDOWN_STRESS = """
<html><body>
  <h2>Code &amp; Quotes</h2>
  <p>Inline <code>f(x) &lt; 3</code> and a <a href="/doc">link with <code>code</code></a>.</p>
  <pre>def f(x):
    return x &lt; 3</pre>
  <blockquote>First quoted line.<br>Second quoted line.</blockquote>
  <ol><li>alpha</li><li>beta</li></ol>
  <ul><li>one</li><li>two</li></ul>
  <hr>
  <p><strong>Bold</strong> and <em>emphatic</em> text &amp; entities.</p>
</body></html>
"""


class TestMediaRich:
    def test_scoring_and_variants(self):
        result = scrape("https://example.com/", MEDIA_RICH)
        images = result["media"]["images"]
        srcs = {i["src"] for i in images}
        # hero: width/height>150 + alt + format + srcset → well above threshold
        assert "/hero.jpg" in srcs
        assert "/hero-400.jpg" in srcs and "/hero-800.jpg" in srcs
        # picture source variants included
        assert "/pic-500.webp" in srcs
        # icons, display:none, data: URIs and button imgs excluded
        assert "/tiny-icon.png" not in srcs
        assert "/spacer.gif" not in srcs
        assert "/button-img.png" not in srcs
        assert not any(s.startswith("data:") for s in srcs)
        # width carried for srcset variants
        widths = {i["src"]: i.get("width") for i in images}
        assert widths["/hero-400.jpg"] == "400"

    def test_base64_src_stripped_from_cleaned_html(self):
        result = scrape("https://example.com/", MEDIA_RICH)
        assert "base64,AAAA" not in result["cleaned_html"]


class TestMarkdownStress:
    def test_all_constructs(self):
        md = html_to_markdown(MARKDOWN_STRESS)
        assert "## Code & Quotes" in md
        assert "`f(x) < 3`" in md
        assert "```\ndef f(x):\n    return x < 3\n```" in md
        assert "> First quoted line." in md
        assert "> Second quoted line." in md
        assert "1. alpha" in md and "2. beta" in md
        assert "* one" in md and "* two" in md
        assert "* * *" in md
        assert "**Bold**" in md and "_emphatic_" in md
        # entity decoded exactly once
        assert "text & entities" in md

    def test_code_inside_link(self):
        md = html_to_markdown(MARKDOWN_STRESS)
        assert "[link with `code`](/doc)" in md


class TestMalformed:
    def test_unclosed_tags(self):
        rec = extract_page("https://x.com/a", "<html><body><p>first<p>second<div>third")
        assert rec["success"]

    def test_missing_body(self):
        rec = extract_page("https://x.com/a", "<p>bare fragment of text here</p>")
        assert rec["success"]

    def test_empty(self):
        rec = extract_page("https://x.com/a", "")
        assert not rec["success"]
        assert "empty" in rec["error_message"]

    def test_only_junk_bytes(self):
        rec = extract_page("https://x.com/a", "\x00\x01&&&<<<>>>")
        assert rec["url"] == "https://x.com/a"


class TestLargePage:
    def test_100kb_page_deterministic(self):
        paras = "".join(
            f"<p>Paragraph {i} with several meaningful words about topic {i % 7} "
            f"and additional commentary text to fatten the page.</p>"
            for i in range(600)
        )
        html = f"<html><head><title>Big</title></head><body><article>{paras}</article></body></html>"
        assert len(html) > 60_000
        a = extract_page("https://x.com/big", html)
        b = extract_page("https://x.com/big", html)
        assert a == b
        assert a["success"] and len(a["text"]) > 10_000
