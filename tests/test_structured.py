"""CSS selector engine + JSON-CSS structured extraction + semantic
clustering stage."""

import pytest

from crawl4ai_custom_ray.functions.cosine import HashingEmbedder, greedy_cluster
from crawl4ai_custom_ray.functions.structured import (
    JsonCssExtractionStrategy,
    JsonXPathLikeExtractionStrategy,
)
from crawl4ai_custom_ray.html.css import select, select_one
from crawl4ai_custom_ray.html.dom import parse

HTML = """
<html><body>
  <div id="main" class="wrap">
    <article class="card featured" data-kind="a">
      <h2>First</h2>
      <span class="price">$10.00</span>
      <a href="/p/1">link1</a>
      <ul><li>x1</li><li>y1</li></ul>
    </article>
    <article class="card" data-kind="b">
      <h2>Second</h2>
      <span class="price">$20.50</span>
      <a href="/p/2">link2</a>
      <ul><li>x2</li></ul>
    </article>
  </div>
  <div class="other"><span class="price">$99</span></div>
</body></html>
"""


class TestCss:
    def setup_method(self):
        self.root = parse(HTML)

    def test_tag(self):
        assert len(select(self.root, "article")) == 2

    def test_class(self):
        assert len(select(self.root, ".card")) == 2
        assert len(select(self.root, ".card.featured")) == 1

    def test_id(self):
        assert select_one(self.root, "#main").tag == "div"

    def test_descendant(self):
        assert len(select(self.root, "#main .price")) == 2
        assert len(select(self.root, ".price")) == 3

    def test_child_combinator(self):
        assert len(select(self.root, "article > h2")) == 2
        assert len(select(self.root, "div > h2")) == 0

    def test_attribute(self):
        assert len(select(self.root, "article[data-kind=a]")) == 1
        assert len(select(self.root, '[data-kind="b"]')) == 1
        assert len(select(self.root, "a[href^=/p/]")) == 2

    def test_nth_of_type(self):
        lis = select(self.root, "article:nth-of-type(2) h2")
        assert [l.get_text() for l in lis] == ["Second"]

    def test_group(self):
        assert len(select(self.root, "h2, .price")) == 5

    def test_universal(self):
        assert select(self.root, "*")


SCHEMA = {
    "name": "cards",
    "baseSelector": "article.card",
    "baseFields": [{"name": "kind", "type": "attribute", "attribute": "data-kind"}],
    "fields": [
        {"name": "title", "type": "text", "selector": "h2"},
        {"name": "price", "type": "regex", "selector": ".price", "pattern": r"\$([\d.]+)"},
        {"name": "link", "type": "attribute", "selector": "a", "attribute": "href"},
        {
            "name": "items",
            "type": "list",
            "selector": "li",
            "fields": [{"name": "label", "type": "text"}],
        },
        {"name": "title_lower", "type": "text", "selector": "h2", "transform": "lowercase"},
        {"name": "missing", "type": "text", "selector": ".nope", "default": "none"},
    ],
}


class TestJsonCss:
    def test_extract(self):
        items = JsonCssExtractionStrategy(SCHEMA).extract("https://x.com", HTML)
        assert len(items) == 2
        first = items[0]
        assert first["kind"] == "a"
        assert first["title"] == "First"
        assert first["price"] == "10.00"
        assert first["link"] == "/p/1"
        assert first["items"] == [{"label": "x1"}, {"label": "y1"}]
        assert first["title_lower"] == "first"
        assert first["missing"] == "none"

    def test_nested(self):
        schema = {
            "name": "n",
            "baseSelector": "#main",
            "fields": [
                {
                    "name": "featured",
                    "type": "nested",
                    "selector": ".featured",
                    "fields": [{"name": "t", "type": "text", "selector": "h2"}],
                },
                {
                    "name": "all",
                    "type": "nested_list",
                    "selector": "article",
                    "fields": [{"name": "t", "type": "text", "selector": "h2"}],
                },
            ],
        }
        items = JsonCssExtractionStrategy(schema).extract("u", HTML)
        assert items[0]["featured"] == {"t": "First"}
        assert items[0]["all"] == [{"t": "First"}, {"t": "Second"}]

    def test_computed(self):
        schema = {
            "name": "c",
            "baseSelector": "article",
            "fields": [
                {"name": "title", "type": "text", "selector": "h2"},
                {"name": "shout", "type": "computed", "expression": "title + '!'"},
            ],
        }
        items = JsonCssExtractionStrategy(schema).extract("u", HTML)
        assert items[0]["shout"] == "First!"

    def test_xpath_translit(self):
        schema = {
            "name": "x",
            "baseSelector": "//article[@data-kind='a']",
            "fields": [{"name": "t", "type": "text", "selector": "//h2"}],
        }
        items = JsonXPathLikeExtractionStrategy(schema).extract("u", HTML)
        assert items == [{"t": "First"}]


class TestSemanticCluster:
    def test_embedder_deterministic(self):
        e = HashingEmbedder()
        import numpy as np

        assert np.allclose(e.embed("hello world"), e.embed("hello world"))
        assert abs(np.linalg.norm(e.embed("hello world")) - 1.0) < 1e-9

    def test_similar_texts_cluster_together(self):
        e = HashingEmbedder()
        texts = [
            "spark query engine distributed execution",
            "spark query engine distributed compute",
            "gardening flowers soil watering plants",
        ]
        vecs = e.embed_many(texts)
        labels = greedy_cluster(vecs, threshold=0.3)
        assert labels[0] == labels[1]
        assert labels[2] != labels[0]

    def test_stage(self, ray_session):
        import ray.data as rd

        from crawl4ai_custom_ray.functions.cosine import semantic_cluster

        items = [
            {"url": "u1", "text": "alpha beta gamma delta epsilon\n\nalpha beta gamma delta zeta"},
            {"url": "u2", "text": "one two three four five six"},
        ]
        out = semantic_cluster(rd.from_items(items)).to_pandas()
        assert set(out["url"]) == {"u1", "u2"}
        assert (out["cluster_id"] >= 0).all()


def test_embedder_seam_through_actor_pool(ray_session):
    """Injecting a non-hashing embedder flows end-to-end through the
    semantic_cluster actor pool: per-actor construction happens via
    the factory, results are deterministic, and the filter-similarity
    values provably come from the injected model (they differ from the
    hashing default's)."""
    import ray.data as rd

    from crawl4ai_custom_ray.functions.cosine import (
        LinearMapEmbedder,
        semantic_cluster,
    )

    items = [
        {"url": f"u{i}", "text": f"alpha beta gamma delta epsilon doc {i}"}
        for i in range(8)
    ]

    def run(**kw):
        return (
            semantic_cluster(
                rd.from_items(items), semantic_filter="alpha beta", sim_threshold=-1.0, **kw
            )
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )

    injected = run(embedder_factory=LinearMapEmbedder)
    injected2 = run(embedder_factory=LinearMapEmbedder)
    default = run()
    assert injected.equals(injected2)  # deterministic per-actor builds
    assert len(injected) == 8
    # similarity values come from the injected model, not the default
    assert not injected["filter_sim"].equals(default["filter_sim"])
    # and they match a driver-side (no actor pool) replay of the model
    emb = LinearMapEmbedder(128)
    fv = emb.embed("alpha beta")
    import numpy as np

    for _, row in injected.iterrows():
        expect = round(float(emb.embed(row["chunk"]) @ fv), 6)
        assert row["filter_sim"] == expect, (row["url"], row["filter_sim"], expect)
