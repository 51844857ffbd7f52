"""Head-content filters: BM25 relevance and SEO quality.

Mirror of the reference's network-touching filters
(``deep_crawling/filters.py``): ``ContentRelevanceFilter`` (:509-581)
streams a page's bytes until ``</head>`` (``HeadPeekr``,
``utils.py:2944-2975``) and scores title+meta against a query with a
simplified BM25; ``SEOFilter`` (:584-694) computes a weighted SEO
score (title length/keywords, meta description, canonical, noindex,
ld+json presence, URL-quality penalties).

In the batch engine the "head peek" is a cheap prefix scan of the html
column (read until ``</head>``), applied inside ``map_batches`` over
the pages table — no network state, so these are plain batch
functions, not actor pools.
"""

from __future__ import annotations

import math
import re
from collections import defaultdict
from urllib.parse import urlparse

import pyarrow as pa

_HEAD_END_RE = re.compile(rb"</head\s*>", re.I)
_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>", re.I | re.S)
_META_RE = re.compile(
    r'<meta\s+[^>]*?(?:name|property)=["\']([^"\']+)["\'][^>]*?content=["\']([^"\']*)["\']',
    re.I,
)
_LDJSON_RE = re.compile(r'<script[^>]+type=["\']application/ld\+json', re.I)


def peek_head(html: bytes | str, max_bytes: int = 65536) -> str:
    """First bytes of the page up to ``</head>`` (HeadPeekr semantics:
    never reads the whole body)."""
    if isinstance(html, str):
        html = html.encode("utf-8", errors="replace")
    prefix = html[:max_bytes]
    m = _HEAD_END_RE.search(prefix)
    end = m.end() if m else len(prefix)
    return prefix[:end].decode("utf-8", errors="replace")


def get_title(head: str) -> str | None:
    m = _TITLE_RE.search(head)
    return m.group(1).strip() if m else None


def extract_meta_tags(head: str) -> dict[str, str]:
    return {name.strip().lower(): content for name, content in _META_RE.findall(head)}


class ContentRelevanceFilter:
    """Simplified-BM25 relevance of head content vs a query."""

    def __init__(self, query: str, threshold: float, k1: float = 1.2, b: float = 0.75, avgdl: int = 1000):
        self.query_terms = query.lower().split()
        self.threshold = threshold
        self.k1 = k1
        self.b = b
        self.avgdl = avgdl

    def score(self, head: str) -> float:
        title = get_title(head) or ""
        meta = extract_meta_tags(head)
        doc = " ".join(
            [
                title * 3,
                meta.get("description", "") * 2,
                meta.get("keywords", ""),
                " ".join(meta.values()),
            ]
        )
        doc_terms = doc.lower().split()
        doc_len = len(doc_terms)
        tf: dict[str, int] = defaultdict(int)
        for t in doc_terms:
            tf[t] += 1
        score = 0.0
        for term in set(self.query_terms):
            f = tf[term]
            idf = math.log((1 + 1) / (f + 0.5) + 1)
            score += idf * (f * (self.k1 + 1)) / (
                f + self.k1 * (1 - self.b + self.b * (doc_len / self.avgdl))
            )
        return score

    def apply_head(self, head: str) -> bool:
        return self.score(head) >= self.threshold


class SEOFilter:
    DEFAULT_WEIGHTS = {
        "title_length": 0.15,
        "title_kw": 0.18,
        "meta_description": 0.12,
        "canonical": 0.10,
        "robot_ok": 0.20,
        "schema_org": 0.10,
        "url_quality": 0.15,
    }

    def __init__(self, threshold: float = 0.65, keywords=None, weights=None):
        self.threshold = threshold
        self.weights = weights or self.DEFAULT_WEIGHTS
        self.kw_pattern = (
            re.compile(r"\b({})\b".format("|".join(map(re.escape, keywords))), re.I)
            if keywords
            else None
        )

    def score(self, url: str, head: str) -> float:
        meta = extract_meta_tags(head)
        title = get_title(head) or ""
        parsed = urlparse(url)
        scores = {
            "title_length": self._score_title_length(title),
            "title_kw": self._score_kw(title),
            "meta_description": self._score_meta_description(meta.get("description", "")),
            "canonical": self._score_canonical(meta.get("canonical"), url),
            "robot_ok": 1.0 if "noindex" not in meta.get("robots", "") else 0.0,
            "schema_org": 1.0 if _LDJSON_RE.search(head) else 0.0,
            "url_quality": self._score_url_quality(parsed),
        }
        return sum(w * scores[f] for f, w in self.weights.items())

    def apply_head(self, url: str, head: str) -> bool:
        return self.score(url, head) >= self.threshold

    @staticmethod
    def _score_title_length(title: str) -> float:
        n = len(title)
        if 50 <= n <= 60:
            return 1.0
        if 40 <= n < 50 or 60 < n <= 70:
            return 0.7
        return 0.3

    def _score_kw(self, text: str) -> float:
        if not self.kw_pattern:
            return 0.0
        return min(len(self.kw_pattern.findall(text)) * 0.3, 1.0)

    @staticmethod
    def _score_meta_description(desc: str) -> float:
        n = len(desc)
        if 140 <= n <= 160:
            return 1.0
        return 0.5 if 120 <= n <= 200 else 0.2

    @staticmethod
    def _score_canonical(canonical, original: str) -> float:
        if not canonical:
            return 0.5
        return 1.0 if canonical == original else 0.2

    @staticmethod
    def _score_url_quality(parsed) -> float:
        score = 1.0
        path = parsed.path.lower()
        if len(path) > 80:
            score *= 0.7
        if re.search(r"\d{4}", path):
            score *= 0.8
        if parsed.query:
            score *= 0.6
        if "_" in path:
            score *= 0.9
        return score


def filter_pages_by_head(ds, head_filter, *, seo: bool = False):
    """pages Dataset → rows whose head passes the filter."""

    def fn(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        mask = []
        for u, h in zip(urls, htmls):
            head = peek_head(h or b"")
            mask.append(
                head_filter.apply_head(u, head) if seo else head_filter.apply_head(head)
            )
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(fn, batch_format="pyarrow")
