"""Bundled hub crawler: resumable market-intel style collection.

The reference bundles a market-intelligence application
(``market_intel/collect.py:47-49``, ``state.py:43-249``): seed queries
→ rate-limited API discovery → homepage discovery → LLM structured
extraction → JSONL dataset, with a persistent ``CollectionState``
(processed seeds, per-product extraction status, consecutive-failure
halt) that makes interrupted runs resumable.

This is the batch-engine analogue over the synthetic corpus, wired
through the same building blocks the reference app composes:

1. **Discovery** (the SaaSHub-query stage): each seed query runs a
   deterministic term-frequency search over the extracted corpus text
   (a Dataset ``map_batches`` scan — the batch stand-in for an API).
2. **Collection**: the hit pages' HTML comes from the pages parquet
   (the simulated network fetch).
3. **Structured extraction**: a ``JsonCssExtractionStrategy`` schema
   (the LLM-extraction stand-in — same strategy seam, no model
   dependency) run as a stateful batch stage.
4. **Resumable JSONL sink**: newly extracted products append to a
   per-run JSONL shard under ``out_dir``; ``state.json`` tracks
   processed seeds, per-product status and a consecutive-failure halt
   exactly like the reference's ``CollectionState``.

Rerunning with the same ``out_dir`` skips processed seeds and
already-extracted product URLs (anti-join against the state), so a
killed run continues where it stopped.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import asdict, dataclass, field

import pyarrow as pa

from ...pipelines.hub import BaseCrawler

__meta__ = {
    "version": "1.0.0",
    "tested_on": ["synthetic corpus sf0.001+"],
    "rate_limit": "n/a (batch); halt logic mirrors the reference",
    "description": "Seed queries -> discover -> structured-extract -> resumable JSONL",
}

_TOKEN_RE = re.compile(r"[a-z0-9]+")

# JsonCSS schema for the synthetic article pages (the reference
# extracts SaaSProductInfo via LLM; the batch stand-in extracts the
# same *shape* of record with the CSS strategy).
PRODUCT_SCHEMA = {
    "name": "product",
    "baseSelector": "body",
    "fields": [
        {"name": "title", "type": "text", "selector": "h1"},
        {"name": "summary", "type": "text", "selector": "p"},
        {
            "name": "links",
            "type": "list",
            "selector": "a",
            "fields": [{"name": "href", "type": "attribute", "attribute": "href"}],
        },
    ],
}


@dataclass
class ProductRecord:
    """Per-product pipeline state (reference ``ProductState``)."""

    url: str
    seed_query: str
    extracted: bool = False
    extraction_error: str | None = None
    extraction_attempts: int = 0


@dataclass
class CollectionState:
    """Resumable run state (reference ``CollectionState``,
    ``state.py:43-249``): processed seeds, product map, failure
    counters and the consecutive-failure halt."""

    processed_seeds: list = field(default_factory=list)
    products: dict = field(default_factory=dict)  # url -> ProductRecord dict
    consecutive_failures: int = 0
    total_failures: int = 0
    total_extracted: int = 0
    halted: bool = False
    halt_reason: str | None = None

    @classmethod
    def load(cls, path: str) -> "CollectionState":
        if not os.path.exists(path):
            return cls()
        with open(path) as f:
            data = json.load(f)
        st = cls()
        st.__dict__.update(data)
        return st

    def save(self, path: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(self), f, indent=1)
        os.replace(tmp, path)

    def mark_success(self, url: str) -> None:
        p = self.products[url]
        p["extracted"] = True
        p["extraction_attempts"] += 1
        self.total_extracted += 1
        self.consecutive_failures = 0

    def mark_failure(self, url: str, error: str, max_consecutive: int) -> None:
        p = self.products[url]
        p["extraction_error"] = error
        p["extraction_attempts"] += 1
        self.total_failures += 1
        self.consecutive_failures += 1
        if self.consecutive_failures >= max_consecutive:
            self.halted = True
            self.halt_reason = (
                f"{self.consecutive_failures} consecutive failures; last: {error}"
            )


class _ExtractProducts:
    """Actor-pool stage: (url, html, seed_query) → structured product
    rows.  Strategy compiled once per actor (``__init__``), applied
    per batch."""

    def __init__(self):
        from ...functions.structured import JsonCssExtractionStrategy

        self.strategy = JsonCssExtractionStrategy(PRODUCT_SCHEMA)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls, seeds, titles, summaries, n_links, payloads, errors = (
            [], [], [], [], [], [], [],
        )
        for i in range(batch.num_rows):
            url = batch["url"][i].as_py()
            html = batch["html"][i].as_py()
            if isinstance(html, bytes):
                html = html.decode("utf-8", errors="replace")
            urls.append(url)
            seeds.append(batch["seed_query"][i].as_py())
            try:
                items = self.strategy.extract(url, html or "")
                first = items[0] if items else {}
                titles.append(first.get("title") or "")
                summaries.append((first.get("summary") or "")[:200])
                n_links.append(len(first.get("links") or []))
                payloads.append(json.dumps(items, sort_keys=True))
                errors.append(None)
            except Exception as exc:
                titles.append("")
                summaries.append("")
                n_links.append(0)
                payloads.append("[]")
                errors.append(f"{type(exc).__name__}: {exc}"[:200])
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "seed_query": pa.array(seeds, pa.string()),
                "title": pa.array(titles, pa.string()),
                "summary": pa.array(summaries, pa.string()),
                "n_links": pa.array(n_links, pa.int64()),
                "extracted_content": pa.array(payloads, pa.large_string()),
                "error": pa.array(errors, pa.string()),
            }
        )


class MarketIntelCrawler(BaseCrawler):
    def run(
        self,
        source: str = "",
        seeds: list[str] | None = None,
        out_dir: str = "",
        k_per_seed: int = 5,
        max_consecutive_failures: int = 3,
        **kwargs,
    ):
        """Collect structured product records for ``seeds`` over the
        corpus at ``source``; resumable via ``out_dir/state.json``.
        Returns the Dataset of ALL extracted products (previous runs
        included) in ``out_dir/products``."""
        import ray.data as rd

        from ...pipelines.flagship import read_pages
        from ...stages.extract import extract_pages

        if not out_dir:
            raise ValueError("market_intel needs out_dir= for resumable state")
        seeds = list(seeds or [])
        os.makedirs(os.path.join(out_dir, "products"), exist_ok=True)
        state_path = os.path.join(out_dir, "state.json")
        state = CollectionState.load(state_path)

        pending_seeds = [s for s in seeds if s not in state.processed_seeds]
        if state.halted:
            self.logger.warning("collection halted: %s", state.halt_reason)
            pending_seeds = []

        if pending_seeds:
            # ---- discovery: one corpus scan scores every pending seed
            # (term-frequency relevance, deterministic ties by url) ----
            termsets = {s: frozenset(_TOKEN_RE.findall(s.lower())) for s in pending_seeds}
            pages = read_pages(source)
            text_ds = extract_pages(pages, columns=["text"])

            def score(batch: pa.Table, ts=termsets) -> pa.Table:
                s_url, s_seed, s_score = [], [], []
                for i in range(batch.num_rows):
                    toks = _TOKEN_RE.findall((batch["text"][i].as_py() or "").lower())
                    for seed, terms in ts.items():
                        sc = sum(1 for t in toks if t in terms)
                        if sc > 0:
                            s_url.append(batch["url"][i].as_py())
                            s_seed.append(seed)
                            s_score.append(sc)
                return pa.table(
                    {
                        "url": pa.array(s_url, pa.string()),
                        "seed_query": pa.array(s_seed, pa.string()),
                        "score": pa.array(s_score, pa.int64()),
                    }
                )

            hits = (
                text_ds.map_batches(score, batch_format="pyarrow")
                .sort(["seed_query", "score", "url"], descending=[False, True, False])
                .to_pandas()
            )
            discovered: list[tuple[str, str]] = []
            for seed in pending_seeds:
                top = hits[hits["seed_query"] == seed].head(k_per_seed)
                discovered.extend((u, seed) for u in top["url"])

            # register newly discovered products (first seed wins,
            # like the reference's product-key dedup)
            for url, seed in discovered:
                if url not in state.products:
                    state.products[url] = asdict(ProductRecord(url=url, seed_query=seed))

            # ---- collect + extract only what's not already done ----
            todo = [
                u for u, p in state.products.items() if not p["extracted"]
            ]
            if todo:
                seed_of = {u: state.products[u]["seed_query"] for u in todo}

                import ray

                todo_ref = ray.put(set(todo))
                seed_ref = ray.put(seed_of)

                def fetch(batch: pa.Table, tr=todo_ref, sr=seed_ref) -> pa.Table:
                    import ray as _ray

                    wanted = _ray.get(tr)
                    smap = _ray.get(sr)
                    mask = [u in wanted for u in batch["url"].to_pylist()]
                    sub = batch.filter(pa.array(mask, pa.bool_()))
                    return sub.append_column(
                        "seed_query",
                        pa.array(
                            [smap[u] for u in sub["url"].to_pylist()], pa.string()
                        ),
                    )

                extracted = (
                    pages.map_batches(fetch, batch_format="pyarrow")
                    .map_batches(_ExtractProducts, concurrency=2, batch_format="pyarrow")
                    .to_pandas()
                    .sort_values("url")
                )

                new_rows = []
                for _, row in extracted.iterrows():
                    if state.halted:
                        break
                    if row["error"]:
                        state.mark_failure(
                            row["url"], row["error"], max_consecutive_failures
                        )
                    else:
                        state.mark_success(row["url"])
                        new_rows.append(row.drop(labels=["error"]).to_dict())
                if new_rows:
                    shard = os.path.join(
                        out_dir, "products", f"part-{len(os.listdir(os.path.join(out_dir, 'products'))):05d}.jsonl"
                    )
                    with open(shard, "w") as f:
                        for r in new_rows:
                            f.write(json.dumps(r, sort_keys=True) + "\n")

            if not state.halted:
                state.processed_seeds.extend(pending_seeds)
            state.save(state_path)

        # return everything collected so far as a Dataset
        parts = sorted(
            os.path.join(out_dir, "products", n)
            for n in os.listdir(os.path.join(out_dir, "products"))
            if n.endswith(".jsonl")
        )
        if not parts:
            return rd.from_arrow(
                pa.table(
                    {
                        "url": pa.array([], pa.string()),
                        "seed_query": pa.array([], pa.string()),
                        "title": pa.array([], pa.string()),
                        "summary": pa.array([], pa.string()),
                        "n_links": pa.array([], pa.int64()),
                        "extracted_content": pa.array([], pa.large_string()),
                    }
                )
            )
        return rd.read_json(parts)
