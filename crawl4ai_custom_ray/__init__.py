"""crawl4ai_custom_ray — a Ray-Data-native crawl-and-extract engine.

A from-scratch rebuild of the capabilities of the reference crawler
(jakejcarroll/crawl4ai-custom): URL frontier + politeness + robots +
HTML→clean-text extraction, expressed as Ray Data pipelines over Arrow
batches (see SURVEY.md for the operator inventory and mapping).

Layout
------
- ``urls``      : URL normalization / digests / host helpers (pure).
- ``html``      : pure-Python HTML kernel (DOM, scrape, markdown,
                  pruning/BM25 filters, tables, metadata) — no Ray.
- ``stages``    : Ray Data ``map_batches`` stages wrapping the kernel.
- ``sources``   : readers + the deterministic synthetic pages generator.
- ``frontier``  : BFS/best-first frontier rounds, URL-seen shards,
                  politeness, robots — the scheduler core.
- ``functions`` : training-data ops (dedup, similarity, text stats).
- ``pipelines`` : end-to-end composed pipelines.
- ``state``     : checkpoint manifests + lineage.

None of this package calls ``ray.init()``; sessions are owned by the
caller (bench.py, CLI, test fixtures).
"""

__version__ = "0.1.0"
