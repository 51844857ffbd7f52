"""The per-page extraction kernel: (url, html) → full extraction record.

This is the pure function the Ray ``map_batches`` extract stage applies
per row (SURVEY.md §7.0: "parity before parallelism").  It composes
the kernel modules in the same order as the reference pipeline
``AsyncWebCrawler.aprocess_html`` (``async_webcrawler.py:435-663``):

1. scrape (cleaned_html + links + media + metadata + tables) —
   ``LXMLWebScrapingStrategy.scrap``;
2. ``fit_html = preprocess_html_for_schema(html, text_threshold=500,
   max_size=300_000)`` (``async_webcrawler.py:515``);
3. markdown generation from cleaned_html with citations and the
   content-pruning filter → fit_markdown
   (``DefaultMarkdownGenerator``);
4. plain-text extraction: whitespace-normalized text of the pruned
   content blocks — the byte-identical per-url invariant column.

Deterministic and pure: same (url, html) bytes → same output bytes.
"""

from __future__ import annotations

import json

from .html.dom import parse
from .html.markdown import generate_markdown, html_to_markdown
from .html.pruning import PruningContentFilter
from .html.schema_html import preprocess_html_for_schema
from .html.scrape import scrape

_WS_BLOCK_SEP = "\n\n"


def extract_text_from_blocks(blocks: list[str]) -> str:
    """Pruned HTML blocks → plain text: per-block whitespace
    normalization, blocks joined by blank lines."""
    parts = []
    for block in blocks:
        root = parse(block)
        text = " ".join(root.get_text().split())
        if text:
            parts.append(text)
    return _WS_BLOCK_SEP.join(parts)


def extract_page(
    url: str,
    html: str,
    *,
    citations: bool = True,
    pruning_threshold: float = 0.48,
    compute_fit_html: bool = False,
    excluded_tags: list[str] | None = None,
) -> dict:
    """Full extraction record for one page.

    Returns a flat dict matching the *extracted* table schema
    (SURVEY.md §1.2): url, success, cleaned_html, raw_markdown,
    markdown_with_citations, references_markdown, fit_markdown,
    fit_html, text, metadata (JSON string), links_internal /
    links_external (lists of dicts), images / tables (lists of dicts),
    error_message.
    """
    try:
        scraped = scrape(url, html, excluded_tags=excluded_tags)
        if scraped is None:
            raise ValueError("empty html")

        cleaned_html = scraped["cleaned_html"]
        content_filter = PruningContentFilter(threshold=pruning_threshold)
        pruned_blocks = content_filter.filter_content(html)
        fit_html_blocks = "\n".join("<div>{}</div>".format(s) for s in pruned_blocks)

        md = generate_markdown(cleaned_html, base_url=url, citations=citations)
        fit_markdown = html_to_markdown(fit_html_blocks)
        text = extract_text_from_blocks(pruned_blocks)

        schema_html = (
            preprocess_html_for_schema(html, text_threshold=500, max_size=300_000)
            if compute_fit_html
            else ""
        )

        return {
            "url": url,
            "success": True,
            "status_code": 200,
            "cleaned_html": cleaned_html,
            "raw_markdown": md["raw_markdown"],
            "markdown_with_citations": md["markdown_with_citations"],
            "references_markdown": md["references_markdown"],
            "fit_markdown": fit_markdown,
            "fit_html": schema_html,
            "text": text,
            "metadata": json.dumps(scraped["metadata"], ensure_ascii=False, sort_keys=True),
            "links_internal": scraped["links"]["internal"],
            "links_external": scraped["links"]["external"],
            "images": scraped["media"]["images"],
            "tables": scraped["media"]["tables"],
            "error_message": "",
        }
    except Exception as exc:  # defensive: a bad page must not kill a batch
        return {
            "url": url,
            "success": False,
            "status_code": 0,
            "cleaned_html": "",
            "raw_markdown": "",
            "markdown_with_citations": "",
            "references_markdown": "",
            "fit_markdown": "",
            "fit_html": "",
            "text": "",
            "metadata": "{}",
            "links_internal": [],
            "links_external": [],
            "images": [],
            "tables": [],
            "error_message": f"{type(exc).__name__}: {exc}",
        }
