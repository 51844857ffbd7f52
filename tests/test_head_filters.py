"""Head-peek BM25 relevance + SEO filters."""

from crawl4ai_custom_ray.frontier.head_filters import (
    ContentRelevanceFilter,
    SEOFilter,
    extract_meta_tags,
    get_title,
    peek_head,
)

HEAD_HTML = (
    b"<html><head><title>Spark Query Engine Guide for Distributed Data</title>"
    b'<meta name="description" content="'
    + b"A comprehensive guide to distributed query engines and how spark executes queries at scale today"
    + b'">'
    b'<meta name="keywords" content="spark, queries, distributed">'
    b'<script type="application/ld+json">{}</script>'
    b"</head><body>" + b"x" * 100000 + b"</body></html>"
)


def test_peek_head_stops_at_head_end():
    head = peek_head(HEAD_HTML)
    assert "</head>" in head
    assert "xxx" not in head
    assert len(head) < 1000


def test_title_and_meta_extraction():
    head = peek_head(HEAD_HTML)
    assert get_title(head).startswith("Spark Query Engine")
    meta = extract_meta_tags(head)
    assert meta["keywords"] == "spark, queries, distributed"
    assert "comprehensive guide" in meta["description"]


def test_content_relevance_filter():
    head = peek_head(HEAD_HTML)
    relevant = ContentRelevanceFilter("spark distributed queries", threshold=0.5)
    irrelevant = ContentRelevanceFilter("gardening flowers soil", threshold=0.5)
    assert relevant.apply_head(head)
    assert not irrelevant.apply_head(head)
    assert relevant.score(head) > irrelevant.score(head)


def test_seo_filter_scores():
    head = peek_head(HEAD_HTML)
    f = SEOFilter(threshold=0.5, keywords=["spark", "query"])
    score = f.score("https://example.com/guide", head)
    assert 0.0 <= score <= 1.0
    # good head (title 50-60 chars, ld+json, no noindex) scores high
    assert score >= 0.6
    bad = f.score(
        "https://example.com/" + "a" * 100 + "_x?y=1&z=2024",
        "<head><title>Hi</title></head>",
    )
    assert bad < score


def test_filter_pages_by_head_stage(ray_session):
    import ray.data as rd

    from crawl4ai_custom_ray.frontier.head_filters import filter_pages_by_head

    items = [
        {"url": "https://x.com/spark", "html": HEAD_HTML},
        {
            "url": "https://x.com/other",
            "html": b"<html><head><title>Cooking</title></head><body>food</body></html>",
        },
    ]
    ds = rd.from_items(items)
    out = filter_pages_by_head(
        ds, ContentRelevanceFilter("spark distributed queries", threshold=0.5)
    ).to_pandas()
    assert out["url"].tolist() == ["https://x.com/spark"]
