"""XPath-subset engine tests — hand-computed goldens over the stdlib
DOM, plus equivalence checks against the CSS engine on selectors both
grammars express, and the XPath extraction strategy end-to-end."""

import pytest

from crawl4ai_custom_ray.html.dom import parse
from crawl4ai_custom_ray.html.css import select
from crawl4ai_custom_ray.html.xpath import XPathError, xpath_select, xpath_strings

DOC = """
<html><body>
  <div id="main" class="content box">
    <h1>Title</h1>
    <ul class="nav">
      <li><a href="/a">Alpha</a></li>
      <li class="sel"><a href="/b" title="bee">Beta</a></li>
      <li><a href="https://x.com/c">Gamma</a></li>
    </ul>
    <p data-k="v1">first para</p>
    <p>second para</p>
    <div class="inner">
      <p>nested para</p>
      <span>tail</span>
    </div>
  </div>
  <div id="footer"><p>foot</p></div>
</body></html>
"""


@pytest.fixture(scope="module")
def root():
    return parse(DOC)


def tags(nodes):
    return [n.tag for n in nodes]


def texts(nodes):
    return [n.get_text().strip() for n in nodes]


def test_descendant_tag(root):
    assert texts(xpath_select(root, "//h1")) == ["Title"]
    assert len(xpath_select(root, "//p")) == 4
    assert len(xpath_select(root, "//li")) == 3


def test_absolute_child_path(root):
    assert tags(xpath_select(root, "/html/body/div")) == ["div", "div"]
    assert xpath_select(root, "/html/div") == []


def test_mixed_path(root):
    assert texts(xpath_select(root, "//div[@id='main']//p")) == [
        "first para",
        "second para",
        "nested para",
    ]
    assert texts(xpath_select(root, "//ul/li/a")) == ["Alpha", "Beta", "Gamma"]


def test_wildcard(root):
    assert tags(xpath_select(root, "//ul/*")) == ["li", "li", "li"]


def test_attribute_predicates(root):
    assert texts(xpath_select(root, "//li[@class]")) == ["Beta"]
    assert texts(xpath_select(root, "//li[@class='sel']/a")) == ["Beta"]
    assert texts(xpath_select(root, "//a[@title='bee']")) == ["Beta"]
    assert texts(xpath_select(root, "//p[@data-k!='v1']")) == []
    assert texts(xpath_select(root, "//a[not(@title)]")) == ["Alpha", "Gamma"]


def test_positional(root):
    assert texts(xpath_select(root, "//li[1]/a")) == ["Alpha"]
    assert texts(xpath_select(root, "//li[2]/a")) == ["Beta"]
    assert texts(xpath_select(root, "//li[last()]/a")) == ["Gamma"]
    assert texts(xpath_select(root, "//li[last()-1]/a")) == ["Beta"]
    assert texts(xpath_select(root, "//li[position()<=2]/a")) == ["Alpha", "Beta"]
    # positional binds per parent: each div's first p
    assert texts(xpath_select(root, "//div/p[1]")) == [
        "first para",
        "nested para",
        "foot",
    ]


def test_text_and_contains(root):
    assert texts(xpath_select(root, "//p[text()='second para']")) == ["second para"]
    assert texts(xpath_select(root, "//a[contains(@href,'x.com')]")) == ["Gamma"]
    assert texts(xpath_select(root, "//a[starts-with(@href,'/')]")) == ["Alpha", "Beta"]
    assert texts(xpath_select(root, "//p[contains(text(),'para')]")) == [
        "first para",
        "second para",
        "nested para",
    ]


def test_boolean_combinations(root):
    assert texts(
        xpath_select(root, "//a[@title='bee' or contains(@href,'x.com')]")
    ) == ["Beta", "Gamma"]
    assert texts(xpath_select(root, "//a[@href and @title]")) == ["Beta"]


def test_union(root):
    got = xpath_select(root, "//h1 | //span")
    assert texts(got) == ["Title", "tail"]


def test_value_steps(root):
    assert xpath_select(root, "//a/@href") == ["/a", "/b", "https://x.com/c"]
    assert xpath_select(root, "//h1/text()") == ["Title"]
    assert xpath_strings(root, "//li[@class='sel']") == ["Beta"]


def test_existence_path_predicate(root):
    # divs that contain a ul
    got = xpath_select(root, "//div[ul]")
    assert [n.get("id") for n in got] == ["main"]
    # every div in DOC has a direct p child except none — not(p) empty
    assert xpath_select(root, "//div[not(p)]") == []


def test_count_function(root):
    got = xpath_select(root, "//ul[count(li)=3]")
    assert len(got) == 1


def test_parent_and_self(root):
    inner = xpath_select(root, "//div[@class='inner']")[0]
    from crawl4ai_custom_ray.html.xpath import _Evaluator, _Parser

    paths = _Parser("..").parse_union()
    got = _Evaluator(root).select(paths, inner)
    assert [n.get("id") for n in got] == ["main"]


def test_css_equivalence(root):
    """Selectors expressible in both grammars agree (order + set)."""
    pairs = [
        ("//li", "li"),
        ("//div[@id='main']", "div#main"),
        ("//li[@class='sel']", "li.sel"),
        ("//ul/li", "ul > li"),
        ("//div[@id='main']//p", "div#main p"),
    ]
    for xp, cs in pairs:
        a = xpath_select(root, xp)
        b = select(root, cs)
        assert [id(x) for x in a] == [id(x) for x in b], (xp, cs)


def test_errors():
    r = parse("<p>x</p>")
    with pytest.raises(XPathError):
        xpath_select(r, "//p[foo(]")
    with pytest.raises(XPathError):
        xpath_select(r, "//p]]")


def test_extraction_strategy_xpath():
    from crawl4ai_custom_ray.functions.structured import JsonXPathExtractionStrategy

    schema = {
        "name": "links",
        "baseSelector": "//ul[@class='nav']/li",
        "fields": [
            {"name": "label", "selector": ".//a", "type": "text"},
            {"name": "href", "selector": ".//a", "type": "attribute", "attribute": "href"},
        ],
    }
    items = JsonXPathExtractionStrategy(schema).extract("http://t/", DOC)
    assert items == [
        {"label": "Alpha", "href": "/a"},
        {"label": "Beta", "href": "/b"},
        {"label": "Gamma", "href": "https://x.com/c"},
    ]


def test_extraction_strategy_css_translit():
    """Bare CSS selectors go through the reference's basic css→xpath
    transliteration (extraction_strategy.py:1836-1846)."""
    from crawl4ai_custom_ray.functions.structured import JsonXPathExtractionStrategy

    schema = {
        "name": "paras",
        "baseSelector": "div#main",  # has a '/'-free CSS form? no — use tag
        "fields": [],
    }
    # '#' isn't in the translit subset; use descendant combinator form
    schema = {
        "name": "paras",
        "baseSelector": "//div[@id='main']",
        "fields": [{"name": "first", "selector": "h1", "type": "text"}],
    }
    items = JsonXPathExtractionStrategy(schema).extract("http://t/", DOC)
    assert items == [{"first": "Title"}]


def test_fuzz_xpath_css_equivalence():
    """Random small trees: //tag must equal the CSS engine's tag
    select, and structural paths must agree."""
    import random

    from hypothesis import given, settings
    from hypothesis import strategies as st

    TAGS = ["div", "p", "span", "a", "li"]

    def build(depth, rng):
        tag = rng.choice(TAGS)
        attrs = ""
        if rng.random() < 0.4:
            attrs = f" class='c{rng.randrange(3)}'"
        if depth == 0 or rng.random() < 0.4:
            return f"<{tag}{attrs}>t{rng.randrange(10)}</{tag}>"
        kids = "".join(build(depth - 1, rng) for _ in range(rng.randrange(1, 4)))
        return f"<{tag}{attrs}>{kids}</{tag}>"

    @given(st.integers(min_value=0, max_value=2**31 - 1))
    @settings(max_examples=80, deadline=None)
    def check(seed):
        rng = random.Random(seed)
        html = f"<html><body>{build(3, rng)}</body></html>"
        root = parse(html)
        for tag in TAGS:
            a = xpath_select(root, f"//{tag}")
            b = select(root, tag)
            assert [id(x) for x in a] == [id(x) for x in b]
        for cls in ("c0", "c1", "c2"):
            a = xpath_select(root, f"//div[@class='{cls}']")
            b = select(root, f"div.{cls}")
            assert [id(x) for x in a] == [id(x) for x in b]

    check()


def test_fuzz_bad_selectors_raise_cleanly():
    """Arbitrary garbage either parses or raises XPathError — never a
    different exception type."""
    import random

    rng = random.Random(7)
    root = parse("<div><p>x</p></div>")
    chars = "/[]()@*|.='abc0 "
    for _ in range(500):
        s = "".join(rng.choice(chars) for _ in range(rng.randrange(1, 14)))
        try:
            xpath_select(root, s)
        except XPathError:
            pass


def test_empty_attribute_is_present():
    """XPath 1.0 node-set semantics: an attribute existing with value
    "" is a non-empty node-set (review finding)."""
    r = parse("<form><input disabled=''><input type='text'></form>")
    got = xpath_select(r, "//input[@disabled]")
    assert len(got) == 1 and got[0].get("disabled") == ""
    got = xpath_select(r, "//input[not(@disabled)]")
    assert len(got) == 1 and got[0].get("type") == "text"
    # comparing an empty-valued attribute still works
    assert len(xpath_select(r, "//input[@disabled='']")) == 1


def test_text_predicate_node_set_semantics():
    """[text()='v'] is true if ANY child text node equals v, even in
    mixed content (review finding)."""
    r = parse("<div><p>v<b>x</b></p><p>v</p><p>w</p></div>")
    got = xpath_select(r, "//p[text()='v']")
    assert len(got) == 2
