"""Bundled hub crawler: site search over the synthetic corpus.

The reference bundles browser-driven crawlers
(``crawlers/google_search/crawler.py:11``: fetch a results page,
extract structured hits).  The batch-engine analogue searches the
corpus itself: extract text + metadata from every page, score against
the query with integer term-frequency relevance (deterministic — no
float ranking), and return the top-k hits as a structured Dataset.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ...pipelines.hub import BaseCrawler

__meta__ = {
    "version": "1.0.0",
    "tested_on": ["synthetic corpus sf0.001+"],
    "rate_limit": "n/a (batch)",
    "description": "Searches extracted page text; returns top-k structured hits",
}

_TOKEN_RE = re.compile(r"[a-z0-9]+")


class SiteSearchCrawler(BaseCrawler):
    def run(self, source: str = "", query: str = "", k: int = 10, **kwargs):
        """Top-``k`` pages for ``query``: (url, title, score, snippet),
        score = total query-term occurrences, ties by url."""
        from ...pipelines.flagship import read_pages
        from ...stages.extract import extract_pages

        terms = set(_TOKEN_RE.findall(query.lower()))
        pages = read_pages(source)
        extracted = extract_pages(pages, columns=["text", "metadata"])

        def score(batch: pa.Table) -> pa.Table:
            urls, titles, scores, snippets = [], [], [], []
            for i in range(batch.num_rows):
                text = batch["text"][i].as_py() or ""
                toks = _TOKEN_RE.findall(text.lower())
                s = sum(1 for t in toks if t in terms)
                if s == 0:
                    continue
                import json

                meta_raw = batch["metadata"][i].as_py()
                meta = json.loads(meta_raw) if meta_raw else {}
                urls.append(batch["url"][i].as_py())
                titles.append(meta.get("title") or "")
                scores.append(s)
                snippets.append(text[:160])
            return pa.table(
                {
                    "url": pa.array(urls, pa.string()),
                    "title": pa.array(titles, pa.string()),
                    "score": pa.array(scores, pa.int64()),
                    "snippet": pa.array(snippets, pa.string()),
                }
            )

        hits = extracted.map_batches(score, batch_format="pyarrow")
        # total order (score desc, url asc) → deterministic top-k
        return hits.sort(["score", "url"], descending=[True, False]).limit(k)
