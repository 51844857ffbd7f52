"""Differential tests: the regex tokenizer must produce EXACTLY the
stdlib html.parser tree (or fall back per-document)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from crawl4ai_custom_ray.html.dom import parse as parse_std
from crawl4ai_custom_ray.html.fastparse import parse_fast
from crawl4ai_custom_ray.sources.pages import generate_pages_table

ADVERSARIAL = [
    "<p class=foo bar>unquoted & bare</p>",
    "<a href=\"/x?a=1&amp;b=2\" title='it&apos;s'>t</a>",
    '<div data-x="a>b">gt in attr</div>',
    "<br/><img src=x.png />",
    "<p>stray < lt</p>",
    "<p>5 < 6 and 7 > 2</p>",
    "<SCRIPT>if(a<b){}</SCRIPT><p>after</p>",
    "<style>a>b{color:red}</style>",
    "<!DOCTYPE html><html><body><p>x</p></body></html>",
    "<p>&nbsp;&amp;&#65;&unknown;</p>",
    "<p><!-- comment with <tags> inside --></p>",
    "<input type=checkbox checked>",
    "<p>unclosed <b>bold",
    "<a href=http://x.com/a>bare url</a>",
    "<a/  >text",  # slash not directly before > is NOT self-closing
    "<bb a==b>double equals</bb>",
    "<!bogus>comment form",
    "<!--unterminated",
    "<?php echo ?><p>x</p>",
    "",
    "<p>&amp;<b>x</b>&lt;</p>",
    "<p>a&ampb</p>",
    "<p>&#65;&#x41;&#xds;</p>",
    "<p>&notit;</p>",
    "<p>&times&lt</p>",
    '<a title="&quot;q&quot;">&curren;</a>',
    "<p>&#0;&#1114112;</p>",
    "text&gt",
    "&",
    "&a",
    "<p>&;</p>",
    # raw-text (CDATA) end-tag laxness — this stdlib terminates
    # script/style on '</\s*tag\s*>' and DROPS unterminated raw text
    "<script>x</ script><p>after</p>",
    "<script>x</script foo><p>after</p>",
    "<script>x",
    "<script>x</scripty><p>a</p></script><p>b</p>",
    "<script>a</ SCRIPT ><p>z</p>",
    "<script>x</script",
    "<script>x</ script",
    "<style>a</style ><b>t</b>",
    "<script/>not raw<p>t</p>",
]


def _same(html: str) -> bool:
    return parse_std(html).serialize_contents() == parse_fast(html).serialize_contents()


def test_adversarial_cases():
    for case in ADVERSARIAL:
        assert _same(case), case


def test_whole_corpus_identical():
    for sf in ("/root/testdata/sf0.001",):
        t = generate_pages_table(sf)
        for i in range(t.num_rows):
            assert _same(t["html"][i].as_py().decode())


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="<>ab c=\"'&;/!-x=", max_size=80))
def test_fuzz_tag_soup(s):
    assert _same(s)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=120))
def test_fuzz_unicode(s):
    assert _same(s)
