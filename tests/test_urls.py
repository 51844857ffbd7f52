"""Golden tests for URL normalization — cases mirror the reference's
``tests/test_normalize_url.py`` expectations plus the extended
normalizer semantics (utils.py:2223-2321)."""

from crawl4ai_custom_ray.urls import (
    get_base_domain,
    is_external_url,
    normalize_url,
    normalize_url_for_deep_crawl,
    url_digest,
    url_host,
)

BASE = "https://www.example.com/dir/page.html"


def test_relative_resolution():
    assert normalize_url("sub/page2.html", BASE) == "https://www.example.com/dir/sub/page2.html"
    assert normalize_url("/rooted", BASE) == "https://www.example.com/rooted"
    assert normalize_url("../up", BASE) == "https://www.example.com/up"


def test_absolute_passthrough_lowercases_netloc():
    assert normalize_url("HTTPS://EXAMPLE.COM/Path", BASE) == "https://example.com/Path"


def test_trailing_slash_stripped_except_root():
    assert normalize_url("https://example.com/a/", BASE) == "https://example.com/a"
    assert normalize_url("https://example.com/", BASE) == "https://example.com/"


def test_tracking_params_dropped_and_sorted():
    url = "https://example.com/p?utm_source=x&b=2&a=1&gclid=99&fbclid=z"
    assert normalize_url(url, BASE) == "https://example.com/p?a=1&b=2"


def test_query_keys_lowercased_sorted():
    assert normalize_url("https://example.com/p?B=2&A=1", BASE) == "https://example.com/p?a=1&b=2"


def test_fragment_dropped():
    assert normalize_url("https://example.com/p#section", BASE) == "https://example.com/p"
    assert (
        normalize_url("https://example.com/p#section", BASE, keep_fragment=True)
        == "https://example.com/p#section"
    )


def test_empty_href():
    assert normalize_url("", BASE) is None
    assert normalize_url(None, BASE) is None


def test_deep_crawl_variant_keeps_param_case():
    # the reference's own function keeps first-appearance key order
    # (parse_qs + urlencode(doseq)) — it does NOT sort; verified
    # byte-equal against the extracted reference function in
    # tests/test_ref_crawl_parity.py::test_normalizer_matches_reference_function
    url = "https://example.com/p?ref=abc&z=1&a=2#frag"
    assert normalize_url_for_deep_crawl(url, BASE) == "https://example.com/p?z=1&a=2"


def test_base_domain():
    assert get_base_domain("https://www.example.com/x") == "example.com"
    assert get_base_domain("https://sub.example.co.uk/x") == "example.co.uk"
    assert get_base_domain("https://example.com:8080/x") == "example.com"
    assert get_base_domain("") == ""


def test_is_external():
    assert not is_external_url("https://sub.example.com/a", "example.com")
    assert is_external_url("https://other.org/a", "example.com")
    assert is_external_url("mailto:x@example.com", "example.com")
    assert not is_external_url("/relative", "example.com")


def test_host_and_digest_stable():
    assert url_host("https://Sub.Example.com:8080/a") == "sub.example.com:8080"
    d1 = url_digest("https://example.com/a")
    d2 = url_digest("https://example.com/a")
    assert d1 == d2
    assert 0 <= d1 < 2**64
    assert url_digest("https://example.com/b") != d1


class TestReferenceGoldens:
    """Resolution cases ported from the reference's
    ``tests/test_normalize_url.py`` (adjusted where the *extended*
    normalizer — the one live at runtime, utils.py:2223-2321 — differs
    from the shadowed simple version those tests target: fragments
    dropped, empty href → None)."""

    def test_basic_relative_path(self):
        assert (
            normalize_url("path/to/page.html", "http://example.com/base/")
            == "http://example.com/base/path/to/page.html"
        )

    def test_base_without_trailing_slash_treats_last_as_file(self):
        assert normalize_url("page.html", "http://example.com/base") == "http://example.com/page.html"

    def test_leading_trailing_spaces(self):
        assert normalize_url("  page.html  ", "http://example.com/") == "http://example.com/page.html"

    def test_query_kept(self):
        assert (
            normalize_url("page.html?query=test", "http://example.com/")
            == "http://example.com/page.html?query=test"
        )

    def test_scheme_change(self):
        assert (
            normalize_url("https://secure.example.com/page.html", "http://example.com/")
            == "https://secure.example.com/page.html"
        )

    def test_parent_directory(self):
        assert (
            normalize_url("../otherpage.html", "http://example.com/base/current/")
            == "http://example.com/base/otherpage.html"
        )

    def test_root_relative(self):
        assert (
            normalize_url("/otherpage.html", "http://example.com/base/current/")
            == "http://example.com/otherpage.html"
        )

    def test_domain_only_base(self):
        assert normalize_url("page.html", "http://example.com") == "http://example.com/page.html"

    def test_only_query_href(self):
        assert (
            normalize_url("?query=true", "http://example.com/page.html")
            == "http://example.com/page.html?query=true"
        )

    def test_only_fragment_href_dropped(self):
        # extended normalizer drops fragments
        assert (
            normalize_url("#fragment", "http://example.com/page.html")
            == "http://example.com/page.html"
        )

    def test_dot_slash_relative_from_file_base(self):
        base = "http://example.com/zwgk/fdzdgk/zdxx/spaq/t19360680.shtml"
        assert (
            normalize_url("./P020241203375994691134.xlsx", base)
            == "http://example.com/zwgk/fdzdgk/zdxx/spaq/P020241203375994691134.xlsx"
        )
        assert (
            normalize_url("another.doc", base)
            == "http://example.com/zwgk/fdzdgk/zdxx/spaq/another.doc"
        )


class TestFastPathEquivalence:
    """The `_fast_join` / `_fast_netloc` fast paths must agree with the
    stdlib byte-for-byte whenever they claim a result (None = fallback,
    always safe).  Goldens cover every guard class the fuzzer found."""

    GOLDEN_BASES = [
        "http://example.com",
        "http://example.com/",
        "https://Example.COM/a/b/c.html",
        "http://example.com/a/b/?q=1",
        "https://user:pw@ex.com:8080/p/q",
        "http://example.com/a;param/b",
        "http://example.com/./a/b",
        "ftp://x/y",
        "//nos/scheme",
        "relative/base",
        "https://example.com/a/b#frag",
        "HTTP://example.com/x",
        "http://example.com/a%20b/c",
    ]
    GOLDEN_HREFS = [
        "", "x", "x/y", "dir/", "/abs", "/abs/x?q=2", "//other.com/z",
        "//h", "//", "///x", "//?q", "?q=3", "#frag", "./rel", "../up",
        "a/./b", "a/../b", ".", "..", "x.", "a./b", "x#f", "x?a=1&b=2",
        "mailto:a@b", "http://abs.com/p", "a:b", "a/b:c", "x y",
        " lead", "trail ", "/", "p?", "p#", "p?#f", "te/.?r", "%7Ex",
        "\tx", "x\ny", "..//x", "x;param", "x?q=#f", "/.?i", "/.#j",
        "a//b", ".#m", ".?n", "p##", "p#?",
    ]

    def test_fast_join_golden_equivalence(self):
        from urllib.parse import urljoin
        from crawl4ai_custom_ray.urls import _fast_join

        for base in self.GOLDEN_BASES:
            for href in self.GOLDEN_HREFS:
                got = _fast_join(base, href)
                if got is not None:
                    assert got == urljoin(base, href), (base, href)

    def test_fast_join_fuzz_equivalence(self):
        import random
        import string
        from urllib.parse import urljoin
        from crawl4ai_custom_ray.urls import _fast_join

        rng = random.Random(20260817)
        alpha = string.ascii_lowercase + "/.?#:&=%~_- "
        for _ in range(8000):
            base = rng.choice(self.GOLDEN_BASES)
            href = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 24)))
            got = _fast_join(base, href)
            if got is not None:
                assert got == urljoin(base, href), (base, href)

    def test_fast_join_hits_common_shapes(self):
        # the shapes that dominate real pages MUST take the fast path
        from crawl4ai_custom_ray.urls import _fast_join

        base = "http://example.com/a/b/index.html"
        for href in ("page2.html", "img/x.png", "/about", "//cdn.ex.com/x.js",
                     "page?x=1", "page#sec"):
            assert _fast_join(base, href) is not None, href

    def test_fast_netloc_equivalence(self):
        from urllib.parse import urlparse
        from crawl4ai_custom_ray.urls import _fast_netloc

        urls = [
            f"{s}{h}{p}{q}{f}"
            for s in ("http://", "https://", "ftp://", "", "HTTP://")
            for h in ("a.com", "WWW.B.co.uk:8080", "user@h.io", "")
            for p in ("", "/", "/x/y", "/x?y", ";p")
            for q in ("", "?a=1", "?a=1#f")
            for f in ("", "#z")
        ] + ["http://", "https://#", "http://\thost/x", "http://h\nost"]
        for u in urls:
            got = _fast_netloc(u)
            if got is not None:
                assert got == urlparse(u).netloc, u
