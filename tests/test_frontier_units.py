"""Unit tests for frontier filters and scorers — golden cases mirror
the reference's ``tests/general/test_deep_crawl_filters.py`` /
``test_deep_crawl_scorers.py`` style."""

from crawl4ai_custom_ray.frontier.filters import (
    ContentTypeFilter,
    DomainFilter,
    FilterChain,
    URLPatternFilter,
)
from crawl4ai_custom_ray.frontier.scorers import (
    CompositeScorer,
    ContentTypeScorer,
    DomainAuthorityScorer,
    FreshnessScorer,
    KeywordRelevanceScorer,
    PathDepthScorer,
)


class TestURLPatternFilter:
    def test_suffix(self):
        f = URLPatternFilter("*.html")
        assert f.apply("https://x.com/page.html")
        assert not f.apply("https://x.com/page.pdf")

    def test_prefix_path_boundary(self):
        f = URLPatternFilter("/api/*")
        assert f.apply("/api/v1")
        assert f.apply("/api")
        assert not f.apply("/apiv2/x")

    def test_domain(self):
        f = URLPatternFilter("https://*.example.com/*")
        assert f.apply("https://sub.example.com/page")

    def test_glob_star(self):
        f = URLPatternFilter("*blog*")
        assert f.apply("https://x.com/blog/post")
        assert not f.apply("https://x.com/shop")


    def test_regex_passthrough(self):
        f = URLPatternFilter(r"^https://x\.com/\d+$")
        assert f.apply("https://x.com/123")
        assert not f.apply("https://x.com/abc")

    def test_reverse(self):
        f = URLPatternFilter("*.html", reverse=True)
        assert not f.apply("https://x.com/a.html")
        assert f.apply("https://x.com/a.pdf")


class TestContentTypeFilter:
    def test_html_allowed(self):
        f = ContentTypeFilter(["text/html"])
        assert f.apply("https://x.com/page.html")
        assert f.apply("https://x.com/dir/")  # extensionless passes
        assert not f.apply("https://x.com/x.png")

    def test_query_ignored(self):
        f = ContentTypeFilter(["text/html"])
        assert f.apply("https://x.com/p.html?q=1")


class TestDomainFilter:
    def test_allow_with_subdomains(self):
        f = DomainFilter(allowed_domains=["example.com"])
        assert f.apply("https://example.com/a")
        assert f.apply("https://sub.example.com/a")
        assert not f.apply("https://other.org/a")

    def test_block(self):
        f = DomainFilter(blocked_domains=["bad.com"])
        assert not f.apply("https://bad.com/a")
        assert not f.apply("https://x.bad.com/a")
        assert f.apply("https://good.com/a")


class TestFilterChain:
    def test_and_semantics(self):
        chain = FilterChain(
            [URLPatternFilter("*.html"), DomainFilter(allowed_domains=["example.com"])]
        )
        urls = [
            "https://example.com/a.html",
            "https://example.com/a.pdf",
            "https://other.org/a.html",
        ]
        assert chain.apply_many(urls) == [True, False, False]

    def test_empty_chain(self):
        assert FilterChain().apply_many(["https://x.com"]) == [True]


class TestScorers:
    def test_keyword(self):
        s = KeywordRelevanceScorer(["python", "data"])
        assert s.score("https://x.com/python-data") == 1.0
        assert s.score("https://x.com/python") == 0.5
        assert s.score("https://x.com/other") == 0.0

    def test_path_depth(self):
        s = PathDepthScorer(optimal_depth=2)
        assert s.score("https://x.com/a/b") == 1.0
        assert s.score("https://x.com/a") == 0.5
        assert s.score("https://x.com") == 1.0 / 3.0

    def test_content_type(self):
        s = ContentTypeScorer({".html$": 1.0, ".pdf$": 0.2})
        assert s.score("https://x.com/a.html") == 1.0
        assert s.score("https://x.com/a.pdf?x=1") == 0.2
        assert s.score("https://x.com/a") == 0.0

    def test_freshness(self):
        s = FreshnessScorer(current_year=2024)
        assert s.score("https://x.com/2024/01/post") == 1.0
        assert s.score("https://x.com/2022-05-01/post") == 0.8
        assert s.score("https://x.com/plain") == 0.5

    def test_domain_authority(self):
        s = DomainAuthorityScorer({"good.com": 1.0}, default_weight=0.4)
        assert s.score("https://good.com/x") == 1.0
        assert s.score("https://meh.com/x") == 0.4

    def test_composite_normalized(self):
        s = CompositeScorer(
            [KeywordRelevanceScorer(["a"], weight=1.0), DomainAuthorityScorer({}, 0.5)]
        )
        score = s.score("https://x.com/a")
        assert abs(score - (1.0 + 0.5) / 2) < 1e-9

    def test_score_many_matches_score(self):
        s = CompositeScorer([PathDepthScorer(2), FreshnessScorer(current_year=2024)])
        urls = ["https://x.com/a/b", "https://x.com/2020/x", "https://x.com"]
        assert s.score_many(urls) == [s.score(u) for u in urls]


def test_cuckoo_overflow_degrades_not_crashes():
    from crawl4ai_custom_ray.frontier.seen import CuckooFilter
    import random

    cf = CuckooFilter(capacity=64)
    rng = random.Random(3)
    for _ in range(1000):
        cf.add(rng.getrandbits(64))  # must never raise
    assert cf.overflow_count > 0
    # accepted fingerprints remain queryable
    cf2 = CuckooFilter(capacity=64)
    d = rng.getrandbits(64)
    assert cf2.add(d) is True
    assert d in cf2


def test_seen_checkpoint_manifest_mismatch(ray_session, tmp_path):
    import pytest

    from crawl4ai_custom_ray.state import checkpoint as ckpt

    cdir = str(tmp_path / "ck")
    ckpt.begin_round(cdir, 0)
    ckpt.save_seen_shards(
        cdir, 0, [b"x", b"y"],
        manifest={"n_shards": 2, "mode": "exact", "capacity_per_shard": 10, "fp_rate": 0.01},
    )
    # matching manifest loads fine
    blobs = ckpt.load_seen_shards(
        cdir, 0,
        expect_manifest={"n_shards": 2, "mode": "exact", "capacity_per_shard": 10, "fp_rate": 0.01},
    )
    assert blobs == [b"x", b"y"]
    # mismatching shard count raises a descriptive error
    with pytest.raises(ValueError, match="n_shards"):
        ckpt.load_seen_shards(
            cdir, 0,
            expect_manifest={"n_shards": 4, "mode": "exact", "capacity_per_shard": 10, "fp_rate": 0.01},
        )


def test_politeness_large_path_equals_small_path(ray_session):
    """The shuffle+join cutoff path must select exactly what the
    driver-cutoff path selects."""
    import pyarrow as pa
    import ray.data as rd

    from crawl4ai_custom_ray.frontier.politeness import enforce_politeness

    rows = []
    for h in range(6):
        for i in range(10 + h * 3):  # uneven host sizes
            rows.append(
                {
                    "url": f"https://h{h}.x/p{i:03d}",
                    "host": f"h{h}.x",
                    "score": float((i * 7) % 5),
                }
            )
    ds = rd.from_items(rows)
    small_sel, small_def = enforce_politeness(ds, per_host_cap=4)
    large_sel, large_def = enforce_politeness(ds, per_host_cap=4, small_threshold=0)
    s1 = sorted(r["url"] for r in small_sel.take_all())
    s2 = sorted(r["url"] for r in large_sel.take_all())
    d1 = sorted(r["url"] for r in small_def.take_all())
    d2 = sorted(r["url"] for r in large_def.take_all())
    assert s1 == s2 and d1 == d2
    assert len(s1) == 6 * 4 and len(s1) + len(d1) == len(rows)


def test_select_table_equals_enforce_politeness(ray_session):
    """Driver-side politeness must split exactly like the dataset path."""
    import pyarrow as pa
    import ray.data as rd

    from crawl4ai_custom_ray.frontier.politeness import enforce_politeness, select_table

    rows = []
    for h in range(5):
        for i in range(8 + h * 5):
            rows.append(
                {
                    "url": f"https://s{h}.x/p{i:03d}",
                    "host": f"s{h}.x",
                    "depth": 1,
                    "parent": "",
                    "score": float((i * 13) % 7),
                }
            )
    tbl = pa.Table.from_pylist(rows)
    fails = {"s1.x": 2}
    sel_t, def_t = select_table(tbl, per_host_cap=6, fail_counts=fails)
    ds_sel, ds_def = enforce_politeness(
        rd.from_arrow(tbl), per_host_cap=6, fail_counts=fails
    )
    assert sorted(sel_t["url"].to_pylist()) == sorted(
        r["url"] for r in ds_sel.take_all()
    )
    assert sorted(def_t["url"].to_pylist()) == sorted(
        r["url"] for r in ds_def.take_all()
    )


def test_proxy_config_from_string():
    from crawl4ai_custom_ray.frontier.proxies import ProxyConfig

    p = ProxyConfig.from_string("http://user:pw@10.0.0.1:8080")
    assert (p.server, p.username, p.password, p.ip) == (
        "http://10.0.0.1:8080", "user", "pw", "10.0.0.1",
    )
    p = ProxyConfig.from_string("socks5://10.0.0.2:1080")
    assert (p.server, p.username, p.ip) == ("socks5://10.0.0.2:1080", None, "10.0.0.2")
    p = ProxyConfig.from_string("10.0.0.3:3128:u:s")
    assert (p.server, p.username, p.password) == ("http://10.0.0.3:3128", "u", "s")
    p = ProxyConfig.from_string("10.0.0.4:80")
    assert p.server == "http://10.0.0.4:80"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ProxyConfig.from_string("nonsense")


def test_round_robin_strategy():
    from crawl4ai_custom_ray.frontier.proxies import ProxyConfig, RoundRobinProxyStrategy

    s = RoundRobinProxyStrategy([ProxyConfig("http://a:1"), ProxyConfig("http://b:2")])
    assert [s.get_next_proxy().server for _ in range(4)] == [
        "http://a:1", "http://b:2", "http://a:1", "http://b:2",
    ]
    assert RoundRobinProxyStrategy().get_next_proxy() is None


def test_assign_proxies_hash_deterministic(ray_session):
    import ray.data as rd

    from crawl4ai_custom_ray.frontier.proxies import assign_proxies

    rows = [{"url": f"https://h{i % 4}.x/p{i}"} for i in range(200)]
    proxies = ["10.0.0.1:80", "10.0.0.2:80", "10.0.0.3:80"]
    a = assign_proxies(rd.from_items(rows), proxies).to_pandas()
    b = assign_proxies(rd.from_items(list(reversed(rows))), proxies).to_pandas()
    ma = dict(zip(a["url"], a["proxy"]))
    mb = dict(zip(b["url"], b["proxy"]))
    assert ma == mb  # stable under input order
    counts = a["proxy"].value_counts()
    assert len(counts) == 3 and counts.min() > 20  # roughly uniform


def test_render_monitor(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from crawl4ai_custom_ray.frontier.crawl import BFSCrawl, CrawlConfig
    from crawl4ai_custom_ray.sources.pages import pages_parquet_path
    from crawl4ai_custom_ray.state.checkpoint import render_monitor

    base_pages = pages_parquet_path("/root/testdata/sf0.001")
    seeds = sorted(
        u for u in pq.read_table(base_pages, columns=["url"])["url"].to_pylist()
    )[:5]
    d = str(tmp_path / "ck")
    driver = BFSCrawl(base_pages, CrawlConfig(max_depth=1, n_seen_shards=2), d)
    try:
        driver.run(seeds).count()
    finally:
        driver.shutdown()
    out = render_monitor(d)
    assert "visited" in out and "rounds=" in out and "pages/s" in out
    assert len(out.splitlines()) >= 4


def test_politeness_paths_property(ray_session):
    """Random frontiers/caps/backoffs: driver select_table must equal
    enforce_politeness exactly (hypothesis over the split invariant)."""
    import pyarrow as pa
    import ray.data as rd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crawl4ai_custom_ray.frontier.politeness import (
        effective_caps,
        enforce_politeness,
        select_table,
    )

    @given(
        st.integers(min_value=0, max_value=2**31 - 1),
        st.integers(min_value=1, max_value=7),
    )
    @settings(max_examples=12, deadline=None)
    def check(seed, cap):
        import random

        rng = random.Random(seed)
        rows = []
        for h in range(rng.randrange(1, 5)):
            for i in range(rng.randrange(0, 12)):
                rows.append(
                    {
                        "url": f"https://h{h}.t/{i:02d}",
                        "host": f"h{h}.t",
                        "score": float(rng.randrange(0, 4)),
                    }
                )
        if not rows:
            return
        fails = {f"h{h}.t": rng.randrange(0, 3) for h in range(2)}
        tbl = pa.Table.from_pylist(rows)
        sel_t, def_t = select_table(tbl, per_host_cap=cap, fail_counts=fails)
        ds_sel, ds_def = enforce_politeness(
            rd.from_items(rows), per_host_cap=cap, fail_counts=fails
        )
        assert sorted(sel_t["url"].to_pylist()) == sorted(
            r["url"] for r in ds_sel.take_all()
        )
        d_urls = sorted(r["url"] for r in ds_def.take_all()) if ds_def else []
        assert sorted(def_t["url"].to_pylist() if def_t else []) == d_urls
        # caps respected
        caps = effective_caps(cap, fails)
        import collections

        per_host = collections.Counter(sel_t["host"].to_pylist())
        for h, n in per_host.items():
            assert n <= caps.get(h, cap)

    check()


class TestRobotsWildcards:
    """Wildcard rule-path semantics, behavior-parity with the
    reference's robotparser patch (utils.py:53-73): '*' globs inside
    Disallow/Allow paths, '%2A' as encoded '*', trailing '$' anchors
    end-of-string; plain prefixes keep stdlib behavior."""

    def _gate(self, rules):
        from crawl4ai_custom_ray.frontier.robots import RobotsGate

        return RobotsGate({"h": rules})

    def test_star_glob_blocks_query_pattern(self):
        g = self._gate("User-agent: *\nDisallow: /*?sessionid=\n")
        assert not g.can_fetch("http://h/page?sessionid=1", "h")
        assert not g.can_fetch("http://h/a/b?sessionid=", "h")
        assert g.can_fetch("http://h/page?id=1", "h")

    def test_star_mid_path(self):
        g = self._gate("User-agent: *\nDisallow: /private*/data/\n")
        assert not g.can_fetch("http://h/private-2024/data/x", "h")
        assert not g.can_fetch("http://h/private/data/x", "h")
        assert g.can_fetch("http://h/private-2024/other/x", "h")

    def test_dollar_anchor_reference_quirk(self):
        # stdlib RuleLine percent-quotes rule paths ('$' -> '%24'), so
        # the reference's patch never sees a literal trailing '$' from
        # parsed rules and '/*.pdf$' matches only literal '%24' —
        # i.e. BOTH engines allow '/doc.pdf' here.  Behavior parity
        # means mirroring that quirk, not Google's $-anchor semantics.
        g = self._gate("User-agent: *\nDisallow: /*.pdf$\n")
        assert g.can_fetch("http://h/doc.pdf", "h")
        assert g.can_fetch("http://h/doc.pdf.html", "h")
        # the glob itself still works without the anchor
        g2 = self._gate("User-agent: *\nDisallow: /*.pdf\n")
        assert not g2.can_fetch("http://h/doc.pdf", "h")
        assert not g2.can_fetch("http://h/doc.pdf.html", "h")

    def test_encoded_star(self):
        g = self._gate("User-agent: *\nDisallow: /tmp%2A\n")
        assert not g.can_fetch("http://h/tmp-cache/x", "h")
        assert g.can_fetch("http://h/tm/x", "h")

    def test_allow_overrides_with_wildcard(self):
        g = self._gate(
            "User-agent: *\nAllow: /private/ok*\nDisallow: /private/\n"
        )
        assert g.can_fetch("http://h/private/ok-page", "h")
        assert not g.can_fetch("http://h/private/no", "h")

    def test_plain_prefix_unchanged_vs_stdlib(self):
        from urllib.robotparser import RobotFileParser

        rules = "User-agent: *\nDisallow: /private/\nAllow: /private/pub\n"
        g = self._gate(rules)
        p = RobotFileParser()
        p.parse(rules.splitlines())
        for path in ("/private/x", "/private/pub1", "/", "/other", "/private"):
            url = f"http://h{path}"
            assert g.can_fetch(url, "h") == p.can_fetch("*", url), path

    def test_agent_specific_entry_selected(self):
        g = self._gate(
            "User-agent: badbot\nDisallow: /\n\nUser-agent: *\nDisallow: /private/\n"
        )
        assert g.can_fetch("http://h/x", "h")
        from crawl4ai_custom_ray.frontier.robots import RobotsGate

        bad = RobotsGate({"h": "User-agent: badbot\nDisallow: /\n\nUser-agent: *\nDisallow: /private/\n"}, user_agent="badbot")
        assert not bad.can_fetch("http://h/x", "h")


def test_robots_crawl_delay_and_budget():
    """Stdlib semantics: integer Crawl-delay inside the matching
    entry; Request-rate r/s maps to s//r when no delay; budget =
    min(cap, round // delay), cap when undeclared."""
    from crawl4ai_custom_ray.frontier.robots import RobotsGate

    rules = {
        "slow.test": "User-agent: *\nDisallow: /x\nCrawl-delay: 5\n",
        "rated.test": "User-agent: *\nRequest-rate: 2/10\n",
        "free.test": "User-agent: *\nDisallow: /y\n",
        "frac.test": "User-agent: *\nCrawl-delay: 1.5\n",  # non-integer: stdlib ignores
    }
    gate = RobotsGate(rules, user_agent="*")
    assert gate.crawl_delay("slow.test") == 5
    assert gate.crawl_delay("rated.test") == 5  # 10 // 2
    assert gate.crawl_delay("free.test") is None
    assert gate.crawl_delay("frac.test") is None
    assert gate.crawl_delay("unknown.test") is None
    assert gate.host_budget("slow.test", round_seconds=600, default_cap=1000) == 120
    assert gate.host_budget("free.test", round_seconds=600, default_cap=1000) == 1000
    assert gate.host_budget("slow.test", round_seconds=600, default_cap=50) == 50
