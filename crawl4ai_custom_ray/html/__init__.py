"""Pure-Python HTML kernel (no Ray, no third-party parsers).

The reference's extraction path is built on lxml + BeautifulSoup +
a vendored html2text (``content_scraping_strategy.py``,
``markdown_generation_strategy.py``, ``content_filter_strategy.py``).
None of those libraries exist in this environment, so the kernel here
is a from-scratch stdlib implementation of the same *semantics*:

- :mod:`.dom`      — a lightweight DOM on ``html.parser``.
- :mod:`.scrape`   — the scrape kernel: cleaned_html + links + media +
                     metadata + tables (mirrors ``LXMLWebScrapingStrategy``).
- :mod:`.markdown` — HTML→markdown + citations (mirrors
                     ``DefaultMarkdownGenerator``/``CustomHTML2Text``).
- :mod:`.pruning`  — content-pruning filter → fit_markdown (mirrors
                     ``PruningContentFilter``).
- :mod:`.bm25`     — BM25 content filter (mirrors ``BM25ContentFilter``).
- :mod:`.tables`   — data-table detection + extraction
                     (mirrors ``DefaultTableExtraction``).

Every function here is deterministic and pure: the same (url, html)
bytes always produce the same output bytes — the per-row invariant the
Ray stages rely on.
"""
