"""Adaptive crawling: crawl-until-confident digest loop.

Mirrors the reference ``AdaptiveCrawler`` with ``StatisticalStrategy``
(``crawl4ai/adaptive_crawler.py``): confidence = 0.4·coverage +
0.3·consistency + 0.3·saturation (:311-330), where

- coverage (:330-369): per-query-term document coverage with a log
  term-frequency boost, √-curved;
- consistency (:371-396): mean pairwise Jaccard overlap of document
  term sets;
- saturation (:398-414): 1 − recent/initial new-term discovery rate;
- link ranking (:416-470): relevance (query-term overlap of anchor
  text) + novelty (1 − overlap with already-seen terms), weighted.

Ray-native shape: each digest iteration fetches+extracts the ranked
top-k links as one batch pipeline (broadcast semi-join fetch +
extract kernel in ``map_batches``); per-document term statistics are
computed inside the batch tasks and only the aggregated counters
return to the driver.  State is a JSON checkpoint per iteration
(reference ``CrawlState.save/load``, :53-111) — resumable.
"""

from __future__ import annotations

import json
import math
import os
import re
from dataclasses import dataclass, field

import pyarrow as pa
import ray
import ray.data as rd

from ..kernel import extract_page

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokenize(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


@dataclass
class AdaptiveState:
    query: str = ""
    crawled_urls: list = field(default_factory=list)
    pending_links: list = field(default_factory=list)  # dicts {href, text}
    term_frequencies: dict = field(default_factory=dict)
    document_frequencies: dict = field(default_factory=dict)
    doc_term_sets: list = field(default_factory=list)  # list[list[str]]
    new_terms_history: list = field(default_factory=list)
    total_documents: int = 0
    metrics: dict = field(default_factory=dict)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.__dict__, f)

    @classmethod
    def load(cls, path: str) -> "AdaptiveState":
        with open(path) as f:
            data = json.load(f)
        state = cls()
        state.__dict__.update(data)
        return state


class StatisticalStrategy:
    """Pure statistical confidence/ranking (no models)."""

    def calculate_confidence(self, state: AdaptiveState) -> float:
        if state.total_documents == 0:
            return 0.0
        coverage = self._coverage(state)
        consistency = self._consistency(state)
        saturation = self._saturation(state)
        state.metrics.update(
            coverage=coverage, consistency=consistency, saturation=saturation
        )
        return 0.4 * coverage + 0.3 * consistency + 0.3 * saturation

    def _coverage(self, state: AdaptiveState) -> float:
        query_terms = tokenize(state.query)
        if not query_terms or state.total_documents == 0:
            return 0.0
        max_tf = max(state.term_frequencies.values()) if state.term_frequencies else 1
        scores = []
        for term in query_terms:
            tf = state.term_frequencies.get(term, 0)
            df = state.document_frequencies.get(term, 0)
            if df > 0:
                doc_coverage = df / state.total_documents
                freq_signal = math.log(1 + tf) / math.log(1 + max_tf) if max_tf > 0 else 0
                scores.append(doc_coverage * (1 + 0.5 * freq_signal))
            else:
                scores.append(0.0)
        return min(1.0, math.sqrt(sum(scores) / len(scores)))

    def _consistency(self, state: AdaptiveState) -> float:
        kb = state.doc_term_sets
        if len(kb) < 2:
            return 1.0
        overlaps = []
        sets = [set(terms) for terms in kb]
        for i in range(len(sets)):
            for j in range(i + 1, len(sets)):
                if sets[i] and sets[j]:
                    overlaps.append(len(sets[i] & sets[j]) / len(sets[i] | sets[j]))
        return sum(overlaps) / len(overlaps) if overlaps else 0.0

    def _saturation(self, state: AdaptiveState) -> float:
        hist = state.new_terms_history
        if len(hist) < 2:
            return 0.0
        recent = hist[-1] if hist[-1] > 0 else 1
        initial = hist[0] if hist[0] > 0 else 1
        return max(0.0, min(1.0, 1 - (recent / initial)))

    def rank_links(
        self,
        state: AdaptiveState,
        *,
        relevance_weight: float = 0.5,
        novelty_weight: float = 0.3,
        authority_weight: float = 0.2,
    ) -> list[tuple[dict, float]]:
        crawled = set(state.crawled_urls)
        known_terms = set(state.term_frequencies)
        query_terms = set(tokenize(state.query))
        scored = []
        for link in state.pending_links:
            if link["href"] in crawled:
                continue
            link_terms = set(tokenize(link.get("text", "") + " " + link["href"]))
            relevance = (
                len(link_terms & query_terms) / len(query_terms) if query_terms else 0.0
            )
            novelty = (
                1 - len(link_terms & known_terms) / len(link_terms) if link_terms else 0.0
            )
            score = (
                relevance_weight * relevance
                + novelty_weight * novelty
                + authority_weight * 1.0
            )
            scored.append((link, score))
        scored.sort(key=lambda x: (-x[1], x[0]["href"]))
        return scored


class EmbeddingStrategy:
    """Embedding-space coverage strategy (reference
    ``EmbeddingStrategy``, ``adaptive_crawler.py:617-1269``): the query
    maps to a train/validation cloud of variations; confidence is the
    mean best-cosine of query points against the knowledge base;
    links are scored by how much they shrink coverage gaps (distance
    beyond ``coverage_radius``), penalized for overlap with the KB;
    stopping adds an irrelevance floor and a convergence check
    validated on the held-out queries.

    The reference embeds with a sentence-transformer (or an LLM
    endpoint) and synthesizes query variations with an LLM — neither
    exists in this environment, so both degrade deterministically: the
    :class:`~..functions.cosine.HashingEmbedder` provides embeddings
    and variations are seeded token resamplings of the query (the
    reference itself ships mock variations when the LLM call is
    disabled, :736-748)."""

    def __init__(
        self,
        *,
        dim: int = 64,
        n_synthetic: int = 10,
        coverage_radius: float = 0.2,
        overlap_threshold: float = 0.85,
        min_confidence: float = 0.1,
        min_relative_improvement: float = 0.1,
        validation_min_score: float = 0.4,
        seed: int = 42,
        embedder_factory=None,
    ):
        from ..functions.cosine import HashingEmbedder

        # the model seam: any object with .embed(text) -> vector of
        # length `dim` (a sentence-transformer wrapper in a real
        # deployment; the hashing stand-in by default)
        self.embedder_factory = embedder_factory
        self.embedder = (
            embedder_factory(dim) if embedder_factory else HashingEmbedder(dim=dim)
        )
        self.n_synthetic = n_synthetic
        self.coverage_radius = coverage_radius
        self.overlap_threshold = overlap_threshold
        self.min_confidence = min_confidence
        self.min_relative_improvement = min_relative_improvement
        self.validation_min_score = validation_min_score
        self.seed = seed
        self.val_queries: list[str] = []
        self._val_emb = None

    # -- embedding helpers ---------------------------------------------
    def _embed(self, texts: list[str]):
        import numpy as np

        m = np.asarray([self.embedder.embed(t) for t in texts], dtype=np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return m / norms

    def _variations(self, query: str) -> list[str]:
        """Deterministic stand-ins for the reference's LLM-generated
        query variations: seeded token resamplings."""
        import random

        terms = query.split()
        rng = random.Random(self.seed)
        out = []
        n_total = int(self.n_synthetic * 1.3)
        for i in range(n_total):
            k = max(1, len(terms) - (i % 2))
            picked = rng.sample(terms, k=min(k, len(terms)))
            rng.shuffle(picked)
            out.append(" ".join(picked) + f" aspect{i}")
        return out

    def map_query_space(self, query: str):
        """→ normalized train-query embedding matrix; stores the
        held-out validation queries (80/20 split, original query always
        in train — reference :764-778)."""
        import random

        variations = self._variations(query)
        rng = random.Random(self.seed + 1)
        rng.shuffle(variations)
        n_val = max(2, int(len(variations) * 0.2))
        self.val_queries = variations[-n_val:]
        train = [query] + variations[:-n_val]
        return self._embed(train)

    # -- scoring --------------------------------------------------------
    def confidence(self, query_emb, kb_emb) -> float:
        if kb_emb is None or len(kb_emb) == 0:
            return 0.0
        best = (query_emb @ kb_emb.T).max(axis=1)
        return float(best.mean())

    def coverage_gaps(self, query_emb, kb_emb):
        """[(query_point, min_cosine_distance)] — 1.0 when no KB."""
        if kb_emb is None or len(kb_emb) == 0:
            return [(q, 1.0) for q in query_emb]
        dist = 1.0 - query_emb @ kb_emb.T
        mins = dist.min(axis=1)
        return [(q, float(d)) for q, d in zip(query_emb, mins)]

    def select_links(self, links: list[dict], gaps, kb_emb):
        """[(link, score)] sorted desc — reference
        ``select_links_for_expansion`` scoring (:849-960)."""
        import numpy as np

        texts = [(link.get("text") or "") + " " + link["href"] for link in links]
        if not texts:
            return []
        emb = self._embed(texts)
        needing = [d for _, d in gaps if d > self.coverage_radius]
        scored = []
        for link, e in zip(links, emb):
            if not gaps:
                scored.append((link, 0.0))
                continue
            total_improvement = 0.0
            for gap_point, gap_dist in gaps:
                if gap_dist > self.coverage_radius:
                    new_dist = 1.0 - float(e @ gap_point)
                    if new_dist < gap_dist:
                        total_improvement += (gap_dist - new_dist) * 2
            gap_score = total_improvement / len(needing) if needing else 0.0
            overlap_penalty = 0.0
            if kb_emb is not None and len(kb_emb) > 0:
                max_sim = float((kb_emb @ e).max())
                if max_sim > self.overlap_threshold:
                    overlap_penalty = (max_sim - self.overlap_threshold) * 2
            scored.append((link, gap_score * (1 - overlap_penalty)))
        scored.sort(key=lambda x: (-x[1], x[0]["href"]))
        return scored

    def validate(self, kb_emb) -> float:
        """Held-out validation: mean (1 − min distance) of val queries
        (reference ``validate_coverage``, :1098-1133)."""
        if not self.val_queries or kb_emb is None or len(kb_emb) == 0:
            return 0.0
        if self._val_emb is None:
            self._val_emb = self._embed(self.val_queries)
        dist = 1.0 - self._val_emb @ kb_emb.T
        return float((1.0 - dist.min(axis=1)).mean())

    def should_stop(self, state, kb_emb, confidence_history: list[float]) -> tuple[bool, str]:
        """Irrelevance floor → convergence + validation (reference
        ``should_stop``, :1135-1181)."""
        confidence = state.metrics.get("confidence", 0.0)
        if confidence < self.min_confidence and state.crawled_urls:
            state.metrics["is_irrelevant"] = True
            return True, "below_minimum_relevance_threshold"
        if len(confidence_history) < 2:
            return False, ""
        diffs = list(zip(confidence_history[:-1], confidence_history[1:]))
        avg_improvement = sum(abs(b - a) for a, b in diffs) / len(diffs)
        state.metrics["avg_improvement"] = avg_improvement
        if avg_improvement < self.min_relative_improvement * confidence:
            val_score = self.validate(kb_emb)
            state.metrics["validation_confidence"] = val_score
            if val_score > self.validation_min_score:
                return True, "converged_validated"
            return False, "low_validation"
        return False, ""


def _doc_embed_batch_factory(dim: int, embedder_factory=None):
    """Batch fn: (url, html) → (url, emb: list<double>, links_json),
    embedding each doc's extracted text in the task (the reference
    embeds pages as they join the knowledge base).  The factory is
    shipped to workers and called once per batch fn — swap in a real
    model loader without touching the pipeline."""

    def fn(batch: pa.Table) -> pa.Table:
        from ..functions.cosine import HashingEmbedder

        import numpy as np

        embedder = (
            embedder_factory(dim) if embedder_factory else HashingEmbedder(dim=dim)
        )
        urls_out, embs_out, links_out = [], [], []
        for i in range(batch.num_rows):
            url = batch["url"][i].as_py()
            html = batch["html"][i].as_py()
            if isinstance(html, bytes):
                html = html.decode("utf-8", errors="replace")
            rec = extract_page(url, html, fields={"text", "links"})
            v = np.asarray(embedder.embed(rec["text"]), dtype=np.float64)
            n = np.linalg.norm(v)
            if n > 0:
                v = v / n
            links = [
                {"href": l["href"], "text": l["text"]} for l in rec["links_internal"]
            ]
            urls_out.append(url)
            embs_out.append(v.tolist())
            links_out.append(json.dumps(links))
        return pa.table(
            {
                "url": pa.array(urls_out, pa.string()),
                "emb": pa.array(embs_out, pa.list_(pa.float64())),
                "links_json": pa.array(links_out, pa.large_string()),
            }
        )

    return fn


def adaptive_digest_embedding(
    pages_path: str,
    start_url: str,
    query: str,
    cfg: "AdaptiveConfig | None" = None,
    strategy: EmbeddingStrategy | None = None,
    state_path: str | None = None,
) -> AdaptiveState:
    """Crawl-until-confident with the embedding strategy.  Per
    iteration: rank pending links by gap-filling score, fetch+embed the
    top-k as one batch pipeline, update the KB matrix (bounded by
    max_pages — driver state is crawl-budget-sized, never corpus-
    sized), re-check stopping."""
    import numpy as np

    cfg = cfg or AdaptiveConfig()
    strategy = strategy or EmbeddingStrategy()
    state = AdaptiveState(query=query, pending_links=[{"href": start_url, "text": ""}])
    query_emb = strategy.map_query_space(query)
    kb_emb = np.zeros((0, query_emb.shape[1]))
    confidence_history: list[float] = []

    pages = rd.read_parquet(pages_path, columns=["url", "html"])
    doc_fn = _doc_embed_batch_factory(
        query_emb.shape[1], embedder_factory=strategy.embedder_factory
    )

    for _iteration in range(cfg.max_iterations):
        if len(state.crawled_urls) >= cfg.max_pages:
            state.metrics["stopped_reason"] = "max_pages"
            break
        confidence = strategy.confidence(query_emb, kb_emb)
        state.metrics["confidence"] = confidence
        confidence_history.append(confidence)
        if confidence >= cfg.confidence_threshold:
            state.metrics["stopped_reason"] = "confident"
            break
        stop, reason = strategy.should_stop(state, kb_emb, confidence_history)
        if stop:
            state.metrics["stopped_reason"] = reason
            break

        crawled = set(state.crawled_urls)
        candidates = [l for l in state.pending_links if l["href"] not in crawled]
        if not candidates:
            state.metrics["stopped_reason"] = "frontier_exhausted"
            break
        gaps = strategy.coverage_gaps(query_emb, kb_emb)
        ranked = strategy.select_links(candidates, gaps, kb_emb)
        budget = min(cfg.top_k_per_iteration, cfg.max_pages - len(state.crawled_urls))
        batch_links = [link for link, _ in ranked[:budget]]
        batch_urls = {l["href"] for l in batch_links}

        url_ref = ray.put(pa.array(sorted(batch_urls), pa.string()))

        def fetch(batch: pa.Table, ref=url_ref) -> pa.Table:
            import pyarrow.compute as _pc

            mask = _pc.is_in(batch["url"], value_set=ray.get(ref))
            return batch.filter(mask)

        stats = (
            pages.map_batches(fetch, batch_format="pyarrow")
            .map_batches(doc_fn, batch_format="pyarrow")
            .to_pandas()
        )
        if "url" in stats.columns and len(stats):
            # fix block arrival order (kb row order feeds gap scoring;
            # pending first-wins dedup is order-sensitive too)
            stats = stats.sort_values("url").reset_index(drop=True)
            new_embs = np.asarray([np.asarray(v) for v in stats["emb"]])
            kb_emb = np.vstack([kb_emb, new_embs]) if len(kb_emb) else new_embs
            for links_json in stats["links_json"]:
                state.pending_links.extend(json.loads(links_json))
        state.total_documents = len(kb_emb)
        state.crawled_urls.extend(sorted(batch_urls))
        state.crawled_urls = sorted(set(state.crawled_urls))
        seen_pending: set[str] = set()
        deduped = []
        for l in state.pending_links:
            if l["href"] not in seen_pending:
                seen_pending.add(l["href"])
                deduped.append(l)
        state.pending_links = deduped
        if state_path:
            state.save(state_path)

    state.metrics["confidence"] = strategy.confidence(query_emb, kb_emb)
    state.metrics["validation_confidence"] = strategy.validate(kb_emb)
    if state_path:
        state.save(state_path)
    return state


def _doc_stats_batch(batch: pa.Table) -> pa.Table:
    """Per-document term stats + discovered links, computed in the
    task (only aggregates return to the driver)."""
    urls_out, terms_out, links_out = [], [], []
    for i in range(batch.num_rows):
        url = batch["url"][i].as_py()
        html = batch["html"][i].as_py()
        if isinstance(html, bytes):
            html = html.decode("utf-8", errors="replace")
        rec = extract_page(url, html, fields={"text", "links"})
        terms = tokenize(rec["text"])
        links = [
            {"href": l["href"], "text": l["text"]} for l in rec["links_internal"]
        ]
        urls_out.append(url)
        terms_out.append(terms[:2000])
        links_out.append(json.dumps(links))
    return pa.table(
        {
            "url": pa.array(urls_out, pa.string()),
            "terms": pa.array(terms_out, pa.list_(pa.string())),
            "links_json": pa.array(links_out, pa.large_string()),
        }
    )


@dataclass
class AdaptiveConfig:
    confidence_threshold: float = 0.7
    max_pages: int = 20
    top_k_per_iteration: int = 5
    max_iterations: int = 10


def adaptive_digest(
    pages_path: str,
    start_url: str,
    query: str,
    cfg: AdaptiveConfig | None = None,
    state_path: str | None = None,
    resume: bool = False,
) -> AdaptiveState:
    """Crawl-until-confident over the pages table.  Returns the final
    state (metrics, crawled urls, term stats)."""
    cfg = cfg or AdaptiveConfig()
    strategy = StatisticalStrategy()

    if resume and state_path and os.path.exists(state_path):
        state = AdaptiveState.load(state_path)
    else:
        state = AdaptiveState(query=query, pending_links=[{"href": start_url, "text": ""}])

    pages = rd.read_parquet(pages_path, columns=["url", "html"])

    for _iteration in range(cfg.max_iterations):
        if len(state.crawled_urls) >= cfg.max_pages:
            break
        confidence = strategy.calculate_confidence(state)
        state.metrics["confidence"] = confidence
        if confidence >= cfg.confidence_threshold:
            break

        ranked = strategy.rank_links(state)
        budget = min(cfg.top_k_per_iteration, cfg.max_pages - len(state.crawled_urls))
        batch_links = [link for link, _ in ranked[:budget]]
        if not batch_links:
            break
        batch_urls = {l["href"] for l in batch_links}

        url_ref = ray.put(pa.array(sorted(batch_urls), pa.string()))

        def fetch(batch: pa.Table, ref=url_ref) -> pa.Table:
            import pyarrow.compute as _pc

            mask = _pc.is_in(batch["url"], value_set=ray.get(ref))
            return batch.filter(mask)

        stats = (
            pages.map_batches(fetch, batch_format="pyarrow")
            .map_batches(_doc_stats_batch, batch_format="pyarrow")
            .to_pandas()
        )

        # driver-side state update from aggregates only
        # (an all-404 batch yields an empty, schema-less frame)
        if "url" not in stats.columns:
            import pandas as _pd

            stats = _pd.DataFrame(columns=["url", "terms", "links_json"])
        # block arrival order is nondeterministic; pending_links'
        # first-wins href dedup depends on row order, so fix it
        stats = stats.sort_values("url").reset_index(drop=True)
        new_terms = 0
        fetched_urls = set(stats["url"])
        for _, row in stats.iterrows():
            terms = row["terms"]
            seen_doc: set[str] = set()
            for t in terms:
                if t not in state.term_frequencies:
                    new_terms += 1
                state.term_frequencies[t] = state.term_frequencies.get(t, 0) + 1
                seen_doc.add(t)
            for t in seen_doc:
                state.document_frequencies[t] = state.document_frequencies.get(t, 0) + 1
            state.doc_term_sets.append(sorted(seen_doc)[:500])
            state.pending_links.extend(json.loads(row["links_json"]))
            state.total_documents += 1
        state.new_terms_history.append(new_terms)
        # 404s (links not in the pages table) still count as crawled
        state.crawled_urls.extend(sorted(batch_urls))
        state.crawled_urls = sorted(set(state.crawled_urls))
        # dedup pending
        seen_pending = set()
        deduped = []
        for l in state.pending_links:
            if l["href"] not in seen_pending:
                seen_pending.add(l["href"])
                deduped.append(l)
        state.pending_links = deduped

        if not fetched_urls and new_terms == 0 and len(state.pending_links) == 0:
            break
        if state_path:
            state.save(state_path)

    state.metrics["confidence"] = strategy.calculate_confidence(state)
    if state_path:
        state.save(state_path)
    return state
