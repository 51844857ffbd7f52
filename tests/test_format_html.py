"""Differential test: our fast_format_html vs the reference's,
compiled from source (the reference function is pure stdlib but lives
in a module with heavy imports, so we lift just the function body via
ast — read-only use of the reference as an oracle)."""

import ast
import textwrap

import pytest

from crawl4ai_custom_ray.html.format import fast_format_html

REF_UTILS = "/root/reference/crawl4ai/utils.py"


@pytest.fixture(scope="module")
def ref_fast_format_html():
    src = open(REF_UTILS, encoding="utf-8").read()
    tree = ast.parse(src)
    fn = next(
        n
        for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "fast_format_html"
    )
    mod = ast.Module(body=[fn], type_ignores=[])
    ns: dict = {}
    exec(compile(mod, REF_UTILS, "exec"), ns)
    return ns["fast_format_html"]


CASES = [
    "",
    "<p>hello</p>",
    "<div><p>one</p><p>two</p></div>",
    "<html><head><title>T</title></head><body><h1>H</h1></body></html>",
    "<ul><li>a</li><li>b</li></ul>",
    "<br/><img src='x.png'/><hr/>",
    "<div>text <b>bold</b> tail</div>",
    "<!-- comment --><p>after</p>",
    "<!DOCTYPE html><html><body>x</body></html>",
    "<a title=\"x>y\">weird attr</a>",
    "<div  class='a'   id='b'>  spaced  </div>",
    "<pre>  leading\n  lines  </pre>",
    "<table><tr><td>1</td><td>2</td></tr></table>",
    "no tags at all",
    "<p>unclosed",
    "</p>stray close",
    "<div><div><div>deep</div></div></div>",
]


@pytest.mark.parametrize("html", CASES)
def test_matches_reference(ref_fast_format_html, html):
    assert fast_format_html(html) == ref_fast_format_html(html)


def test_shape():
    out = fast_format_html("<div><p>x</p></div>")
    assert out == "<div>\n  <p>\n    x\n  </p>\n</div>"
