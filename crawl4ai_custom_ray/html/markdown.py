"""HTML → markdown generation with citations and fit-markdown.

Semantics mirror the reference ``DefaultMarkdownGenerator``
(``crawl4ai/markdown_generation_strategy.py:148-260``) and its vendored
html2text fork (``crawl4ai/html2text/``), with the reference defaults
``{body_width: 0, single_line_break: True, mark_code: True}`` plus the
fence-dedent post-replace at ``markdown_generation_strategy.py:214``.

The conversion itself lives in :mod:`.html2md` — an event-driven
machine whose output is byte-identical to the reference fork under the
generator configuration (differential-tested against the importable
fork in ``tests/test_md_parity.py``).  ``markdown_from_tree`` drives it
straight from an already-parsed DOM (the kernel's single-parse fast
path); ``html_to_markdown`` tokenizes a raw HTML string.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from .dom import Element
from .html2md import convert_html, convert_tree

# Same pattern as the reference LINK_PATTERN (markdown_generation_strategy.py:11)
LINK_PATTERN = re.compile(r'!?\[([^\]]+)\]\(([^)]+?)(?:\s+"([^"]*)")?\)')


def fast_urljoin(base: str, url: str) -> str:
    """Reference ``fast_urljoin`` (markdown_generation_strategy.py:14-23)."""
    if url.startswith(("http://", "https://", "mailto:", "//")):
        return url
    if url.startswith("/"):
        if base.endswith("/"):
            return base[:-1] + url
        return base + url
    return urljoin(base, url)


def markdown_from_tree(root: Element, base_url: str = "", **options) -> str:
    """Markdown straight from an already-parsed DOM (no re-parse —
    the kernel's single-parse fast path).  Byte-equal to running
    ``html_to_markdown`` on the tree's serialized HTML.  ``options``
    are the html2text knobs a user passes the reference generator via
    ``DefaultMarkdownGenerator(options={...})`` — ignore_links,
    ignore_images, escape_snob, body_width, mark_code."""
    return convert_tree(root, base_url, **options).replace("    ```", "```")


def html_to_markdown(html: str, base_url: str = "", **options) -> str:
    """Raw HTML → raw_markdown, byte-identical to the reference
    generator: ``CustomHTML2Text(...).handle(html)`` under the
    generator defaults (overridable per ``options``, mirroring
    ``DefaultMarkdownGenerator(options={...})``) + the fence-dedent
    post-replace.  Exceptions degrade to the reference's error string
    (:211-213)."""
    try:
        raw = convert_html(html or "", base_url, **options)
    except Exception as e:
        raw = f"Error converting HTML to markdown: {str(e)}"
    return raw.replace("    ```", "```")


def convert_links_to_citations(markdown: str, base_url: str = "") -> tuple[str, str]:
    """``[text](url "title")`` → ``text⟨n⟩`` + References section.

    Numbering is first-seen order; reference description format is
    ``: title - text`` (title first, text appended when different).
    """
    link_map: dict[str, tuple[int, str]] = {}
    url_cache: dict[str, str] = {}
    parts: list[str] = []
    last_end = 0
    counter = 1

    for match in LINK_PATTERN.finditer(markdown):
        parts.append(markdown[last_end : match.start()])
        text, url, title = match.groups()

        if base_url and not url.startswith(("http://", "https://", "mailto:")):
            if url not in url_cache:
                url_cache[url] = fast_urljoin(base_url, url)
            url = url_cache[url]

        if url not in link_map:
            desc = []
            if title:
                desc.append(title)
            if text and text != title:
                desc.append(text)
            link_map[url] = (counter, ": " + " - ".join(desc) if desc else "")
            counter += 1

        num = link_map[url][0]
        parts.append(
            f"{text}⟨{num}⟩" if not match.group(0).startswith("!") else f"![{text}⟨{num}⟩]"
        )
        last_end = match.end()

    parts.append(markdown[last_end:])
    converted = "".join(parts)

    references = ["\n\n## References\n\n"]
    references.extend(
        f"⟨{num}⟩ {url}{desc}\n"
        for url, (num, desc) in sorted(link_map.items(), key=lambda x: x[1][0])
    )
    return converted, "".join(references)


def generate_markdown(
    input_html: str,
    base_url: str = "",
    *,
    citations: bool = True,
    content_filter=None,
    options: dict | None = None,
) -> dict:
    """Full markdown generation result:
    ``{raw_markdown, markdown_with_citations, references_markdown,
    fit_markdown, fit_html}`` (mirrors ``MarkdownGenerationResult``,
    reference ``models.py:119-127``).  ``options`` mirrors
    ``DefaultMarkdownGenerator(options={...})`` — the html2text knobs
    threaded through to the conversion machine."""
    options = options or {}
    raw_markdown = html_to_markdown(input_html or "", **options)

    markdown_with_citations = raw_markdown
    references_markdown = ""
    if citations:
        markdown_with_citations, references_markdown = convert_links_to_citations(
            raw_markdown, base_url
        )

    fit_markdown = ""
    fit_html = ""
    if content_filter is not None:
        blocks = content_filter.filter_content(input_html or "")
        # reference wraps each surviving block in a <div> (:236-239)
        fit_html = "\n".join("<div>{}</div>".format(s) for s in blocks)
        fit_markdown = html_to_markdown(fit_html, **options)

    return {
        "raw_markdown": raw_markdown,
        "markdown_with_citations": markdown_with_citations,
        "references_markdown": references_markdown,
        "fit_markdown": fit_markdown,
        "fit_html": fit_html,
    }
