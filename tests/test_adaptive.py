"""Adaptive (crawl-until-confident) crawler."""

import pyarrow.parquet as pq
import pytest

from crawl4ai_custom_ray.frontier.adaptive import (
    AdaptiveConfig,
    AdaptiveState,
    StatisticalStrategy,
    adaptive_digest,
    tokenize,
)
from crawl4ai_custom_ray.sources.pages import pages_parquet_path

SF = "/root/testdata/sf0.001"


class TestStrategy:
    def _state(self, **kw):
        s = AdaptiveState(query="spark query engine")
        s.__dict__.update(kw)
        return s

    def test_confidence_empty(self):
        assert StatisticalStrategy().calculate_confidence(self._state()) == 0.0

    def test_coverage_grows_with_matching_docs(self):
        strat = StatisticalStrategy()
        low = self._state(
            total_documents=2,
            term_frequencies={"other": 5},
            document_frequencies={"other": 2},
        )
        high = self._state(
            total_documents=2,
            term_frequencies={"spark": 4, "query": 4, "engine": 2},
            document_frequencies={"spark": 2, "query": 2, "engine": 2},
        )
        assert strat._coverage(high) > strat._coverage(low)

    def test_consistency(self):
        strat = StatisticalStrategy()
        same = self._state(doc_term_sets=[["a", "b", "c"], ["a", "b", "c"]])
        diff = self._state(doc_term_sets=[["a", "b"], ["x", "y"]])
        assert strat._consistency(same) == 1.0
        assert strat._consistency(diff) == 0.0

    def test_saturation(self):
        strat = StatisticalStrategy()
        assert strat._saturation(self._state(new_terms_history=[100, 10])) == 0.9
        assert strat._saturation(self._state(new_terms_history=[100])) == 0.0

    def test_rank_links_prefers_relevant_novel(self):
        strat = StatisticalStrategy()
        state = self._state(
            term_frequencies={"known": 3},
            pending_links=[
                {"href": "https://x.com/spark-query", "text": "spark query engine"},
                {"href": "https://x.com/known", "text": "known known known"},
            ],
        )
        ranked = strat.rank_links(state)
        assert ranked[0][0]["href"] == "https://x.com/spark-query"
        assert ranked[0][1] > ranked[1][1]


def test_adaptive_digest_runs_and_checkpoints(ray_session, tmp_path):
    pages_path = pages_parquet_path(SF)
    start = sorted(
        u
        for u in pq.read_table(pages_path, columns=["url"])["url"].to_pylist()
        if "/private/" not in u
    )[0]
    state_file = str(tmp_path / "state.json")
    cfg = AdaptiveConfig(confidence_threshold=0.95, max_pages=8, top_k_per_iteration=3, max_iterations=4)
    state = adaptive_digest(pages_path, start, "batch stream spark merge", cfg, state_file)
    assert 0 < len(state.crawled_urls) <= 8
    assert state.total_documents > 0
    assert "confidence" in state.metrics and "coverage" in state.metrics
    # checkpoint round-trips
    loaded = AdaptiveState.load(state_file)
    assert loaded.crawled_urls == state.crawled_urls

    # resume continues without redoing work
    cfg2 = AdaptiveConfig(confidence_threshold=0.99, max_pages=12, top_k_per_iteration=3, max_iterations=2)
    state2 = adaptive_digest(pages_path, start, "batch stream spark merge", cfg2, state_file, resume=True)
    assert set(state.crawled_urls) <= set(state2.crawled_urls)


def test_tokenize():
    assert tokenize("Hello, World! 123") == ["hello", "world", "123"]


def test_embedding_strategy_digest(ray_session):
    from crawl4ai_custom_ray.frontier.adaptive import (
        AdaptiveConfig,
        EmbeddingStrategy,
        adaptive_digest_embedding,
    )
    pages_path = pages_parquet_path(SF)
    start = sorted(
        u for u in pq.read_table(pages_path, columns=["url"])["url"].to_pylist()
        if "/private/" not in u
    )[0]
    cfg = AdaptiveConfig(confidence_threshold=0.9, max_pages=8, top_k_per_iteration=4)
    st = adaptive_digest_embedding(pages_path, start, "batch stream spark merge query", cfg)
    assert 1 <= len(st.crawled_urls) <= 8
    assert 0.0 < st.metrics["confidence"] <= 1.0
    assert "validation_confidence" in st.metrics
    # deterministic: same inputs -> same crawl set
    st2 = adaptive_digest_embedding(pages_path, start, "batch stream spark merge query", cfg)
    assert st2.crawled_urls == st.crawled_urls


def test_embedding_strategy_irrelevance_stop(ray_session):
    from crawl4ai_custom_ray.frontier.adaptive import (
        AdaptiveConfig,
        adaptive_digest_embedding,
    )
    pages_path = pages_parquet_path(SF)
    start = sorted(
        u for u in pq.read_table(pages_path, columns=["url"])["url"].to_pylist()
        if "/private/" not in u
    )[0]
    cfg = AdaptiveConfig(confidence_threshold=0.9, max_pages=10, top_k_per_iteration=5)
    st = adaptive_digest_embedding(pages_path, start, "zzqq vvrr kkjj", cfg)
    assert st.metrics.get("is_irrelevant") is True
    assert st.metrics.get("stopped_reason") == "below_minimum_relevance_threshold"
    assert len(st.crawled_urls) <= 5


def test_embedding_strategy_gap_scoring():
    import numpy as np

    from crawl4ai_custom_ray.frontier.adaptive import EmbeddingStrategy

    s = EmbeddingStrategy(dim=32)
    q = s.map_query_space("alpha beta gamma")
    assert len(s.val_queries) >= 2
    # empty KB: every query point is a max-distance gap
    gaps = s.coverage_gaps(q, np.zeros((0, 32)))
    assert all(d == 1.0 for _, d in gaps)
    # a link matching the query scores higher than an unrelated one
    links = [
        {"href": "/a", "text": "alpha beta gamma"},
        {"href": "/b", "text": "unrelated words entirely"},
    ]
    scored = dict((l["href"], sc) for l, sc in s.select_links(links, gaps, None))
    assert scored["/a"] > scored["/b"]


def test_embedding_strategy_model_seam(ray_session):
    """Injecting a non-hashing embedder via embedder_factory drives
    both the strategy's query-space math AND the distributed per-doc
    embedding stage (the factory ships to workers), end to end."""
    from crawl4ai_custom_ray.frontier.adaptive import (
        AdaptiveConfig,
        EmbeddingStrategy,
        adaptive_digest_embedding,
    )
    from crawl4ai_custom_ray.functions.cosine import LinearMapEmbedder

    pages_path = pages_parquet_path(SF)
    start = sorted(
        u for u in pq.read_table(pages_path, columns=["url"])["url"].to_pylist()
        if "/private/" not in u
    )[0]
    cfg = AdaptiveConfig(confidence_threshold=0.9, max_pages=8, top_k_per_iteration=4)
    q = "batch stream spark merge query"

    def run():
        return adaptive_digest_embedding(
            pages_path, start, q, cfg,
            strategy=EmbeddingStrategy(embedder_factory=LinearMapEmbedder),
        )

    st = run()
    assert 1 <= len(st.crawled_urls) <= 8
    assert 0.0 <= st.metrics["confidence"] <= 1.0
    assert st.crawled_urls == run().crawled_urls  # deterministic
    # the injected model changes the embedding space: confidence
    # differs from the hashing default on the same crawl config
    base = adaptive_digest_embedding(pages_path, start, q, cfg)
    assert st.metrics["confidence"] != base.metrics["confidence"]


class TestSentenceTransformerGate:
    def test_gate_fires_without_package(self):
        """No sentence_transformers in this environment: the factory
        raises a loud ImportError at construction (not at use)."""
        from crawl4ai_custom_ray.functions.cosine import (
            sentence_transformer_factory,
        )

        with pytest.raises(ImportError, match="sentence_transformers"):
            sentence_transformer_factory()(128)

    def test_fake_package_drives_the_seam(self, monkeypatch):
        """With the package importable, the factory is a drop-in
        embedder_factory: the model loads once in __init__, dictates
        its own dim, and normalizes encodings."""
        import sys
        import types

        import numpy as np

        class _FakeModel:
            def __init__(self, name):
                self.name = name

            def get_sentence_embedding_dimension(self):
                return 16

            def encode(self, texts, normalize_embeddings=False):
                out = []
                for t in texts:
                    v = np.array(
                        [float((len(t) * (i + 3)) % 7 - 3) for i in range(16)]
                    )
                    n = np.linalg.norm(v)
                    out.append(v / n if normalize_embeddings and n > 0 else v)
                return np.asarray(out)

        fake = types.ModuleType("sentence_transformers")
        fake.SentenceTransformer = _FakeModel
        monkeypatch.setitem(sys.modules, "sentence_transformers", fake)

        from crawl4ai_custom_ray.frontier.adaptive import EmbeddingStrategy
        from crawl4ai_custom_ray.functions.cosine import (
            sentence_transformer_factory,
        )

        factory = sentence_transformer_factory("some/model")
        emb = factory(128)  # requested dim overridden by the model's
        assert emb.dim == 16
        assert emb._model.name == "some/model"
        v = emb.embed("hello world")
        assert v.shape == (16,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9
        # plugs into the strategy seam exactly like the stand-ins
        s = EmbeddingStrategy(dim=16, embedder_factory=factory)
        q = s.map_query_space("batch stream spark")
        assert q.shape[1] == 16
