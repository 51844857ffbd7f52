"""The per-page extraction kernel: (url, html) → full extraction record.

This is the pure function the Ray ``map_batches`` extract stage applies
per row (SURVEY.md §7.0: "parity before parallelism").  It composes
the kernel modules in the same order as the reference pipeline
``AsyncWebCrawler.aprocess_html`` (``async_webcrawler.py:435-663``):

1. scrape (cleaned_html + links + media + metadata + tables) —
   ``LXMLWebScrapingStrategy.scrap``;
2. ``fit_html = preprocess_html_for_schema(html, text_threshold=500,
   max_size=300_000)`` (``async_webcrawler.py:515``);
3. markdown generation from the cleaned tree with citations and the
   content-pruning filter → fit_markdown
   (``DefaultMarkdownGenerator``);
4. plain-text extraction: whitespace-normalized text of the pruned
   content blocks — the byte-identical per-url invariant column.

Performance: ONE ``html.parser`` pass per page.  The raw tree is
copied (cheap node-copy, no tokenizing) for the pruning filter before
the scrape kernel mutates it; markdown walks the mutated (cleaned)
tree directly; pruned-block text is read off the pruned elements.
``fields`` lets callers skip whole stages (e.g. text-only extraction
never builds markdown or cleaned_html strings).

Deterministic and pure: same (url, html) bytes → same output bytes.
"""

from __future__ import annotations

import json

from .html.dom import dissolve
from .html.fastparse import parse_fast as parse
from .html.markdown import convert_links_to_citations, markdown_from_tree
from .html.pruning import PruningContentFilter
from .html.schema_html import preprocess_tree_for_schema
from .html.scrape import scrape_tree

_WS_BLOCK_SEP = "\n\n"

ALL_FIELDS = frozenset(
    {
        "cleaned_html",
        "raw_markdown",
        "markdown_with_citations",
        "references_markdown",
        "fit_markdown",
        "fit_html",
        "text",
        "metadata",
        "links",
        "media",
        "tables",
    }
)

_EMPTY = {
    "url": "",
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
    "error_message": "",
}


def extract_text_from_blocks(blocks: list[str]) -> str:
    """Pruned HTML block strings → plain text (compat API)."""
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
    fields: frozenset | set | None = None,
    markdown_options: dict | None = None,
    markdown_source: str = "cleaned_html",
) -> dict:
    """Full extraction record for one page; ``fields`` restricts which
    outputs are computed (None = everything).

    ``markdown_source`` is the reference's
    ``DefaultMarkdownGenerator(content_source=...)`` dispatch
    (``async_webcrawler.py:524-557``): markdown (and the pruning
    filter feeding fit_markdown/text) runs on ``"cleaned_html"`` (the
    scraped tree — the fast default), ``"raw_html"`` (the original
    page bytes), or ``"fit_html"`` (the schema-preprocessed page);
    unknown values fall back to cleaned_html like the reference."""
    need = ALL_FIELDS if fields is None else set(fields)
    need_markdown = bool(
        need & {"raw_markdown", "markdown_with_citations", "references_markdown"}
    )
    need_prune = bool(need & {"fit_markdown", "text"})
    md_source = (
        markdown_source
        if markdown_source in ("raw_html", "fit_html")
        else "cleaned_html"
    )

    root = None
    schema_root = None
    try:
        root = parse(html)
        if not html:
            raise ValueError("empty html")

        # snapshot the pristine tree for fit_html BEFORE scrape mutates it:
        # a node copy (~0.1 ms/page) replaces a second full tokenize (~0.3)
        schema_root = (
            root.copy_tree()
            if (compute_fit_html and "fit_html" in need) or md_source == "fit_html"
            else None
        )

        scraped = scrape_tree(
            url,
            root,
            excluded_tags=excluded_tags,
            extract_tables_flag="tables" in need,
            serialize_cleaned="cleaned_html" in need,
        )

        schema_html = (
            preprocess_tree_for_schema(
                schema_root, html, text_threshold=500, max_size=300_000
            )
            if schema_root is not None
            else ""
        )

        md_opts = markdown_options or {}
        raw_markdown = ""
        markdown_with_citations = ""
        references_markdown = ""
        fit_markdown = ""
        text = ""
        if md_source != "cleaned_html" and (need_markdown or need_prune):
            # non-default source: run the generator on the selected
            # STRING, exactly like the reference feeds
            # markdown_input_html to generate_markdown
            from .html.markdown import html_to_markdown

            src_html = html if md_source == "raw_html" else schema_html
            if need_markdown:
                raw_markdown = html_to_markdown(src_html, url, **md_opts)
                if citations:
                    markdown_with_citations, references_markdown = (
                        convert_links_to_citations(raw_markdown, url)
                    )
                else:
                    markdown_with_citations = raw_markdown
            if need_prune:
                content_filter = PruningContentFilter(threshold=pruning_threshold)
                blocks = content_filter.filter_content(src_html)
                if "fit_markdown" in need:
                    # reference generate_markdown wraps each surviving
                    # block in a <div> before converting (:236-239)
                    wrapped = "\n".join("<div>{}</div>".format(s) for s in blocks)
                    fit_markdown = html_to_markdown(wrapped, url, **md_opts)
                if "text" in need:
                    text = extract_text_from_blocks(blocks)
            need_markdown = False
            need_prune = False

        if need_markdown:
            raw_markdown = markdown_from_tree(root, url, **md_opts)
            if citations:
                markdown_with_citations, references_markdown = (
                    convert_links_to_citations(raw_markdown, url)
                )
            else:
                markdown_with_citations = raw_markdown

        if need_prune:
            # prune the scraped tree IN PLACE (markdown already walked
            # it) — matches the reference, which filters cleaned_html
            # (generate_markdown's default content_source), and avoids
            # a full tree copy per page
            content_filter = PruningContentFilter(threshold=pruning_threshold)
            pruned_blocks = content_filter.filter_tree(root)
            if "fit_markdown" in need:
                md_parts = [markdown_from_tree(b, url, **md_opts) for b in pruned_blocks]
                fit_markdown = "\n".join(p.rstrip("\n") for p in md_parts if p)
                if fit_markdown:
                    fit_markdown += "\n"
            if "text" in need:
                parts = []
                for b in pruned_blocks:
                    t = " ".join(b.get_text().split())
                    if t:
                        parts.append(t)
                text = _WS_BLOCK_SEP.join(parts)

        return {
            "url": url,
            "success": True,
            "status_code": 200,
            "cleaned_html": scraped["cleaned_html"],
            "raw_markdown": raw_markdown,
            "markdown_with_citations": markdown_with_citations,
            "references_markdown": references_markdown,
            "fit_markdown": fit_markdown,
            "fit_html": schema_html,
            "text": text,
            "metadata": json.dumps(scraped["metadata"], ensure_ascii=False, sort_keys=True)
            if "metadata" in need
            else "{}",
            "links_internal": scraped["links"]["internal"],
            "links_external": scraped["links"]["external"],
            "images": scraped["media"]["images"],
            "tables": scraped["media"]["tables"],
            "error_message": "",
        }
    except Exception as exc:  # defensive: a bad page must not kill a batch
        rec = dict(_EMPTY)
        rec["url"] = url
        rec["error_message"] = f"{type(exc).__name__}: {exc}"
        return rec
    finally:
        # break parent↔child cycles so the page's trees free by
        # refcount right here — the batch fn runs with cyclic GC
        # disabled, and without this every dead tree survives until a
        # full gc.collect (measured ~0.24 ms/page of collect time)
        if schema_root is not None:
            dissolve(schema_root)
        if root is not None:
            dissolve(root)
