"""HTML → markdown generation with citations and fit-markdown.

Semantics mirror the reference ``DefaultMarkdownGenerator``
(``crawl4ai/markdown_generation_strategy.py:148-260``) and its vendored
html2text fork (``crawl4ai/html2text/``), with the reference defaults
``{body_width: 0, single_line_break: True, mark_code: True}``:

- no line wrapping;
- blocks separated by single blank lines;
- ``<pre>`` → ``` fenced code blocks (the fork's behavior, including
  the post-fix ``raw.replace("    ```", "```")`` at
  ``markdown_generation_strategy.py:214``);
- links → ``[text](href)`` / ``[text](href "title")``;
- citations: ``[text](url)`` → ``text⟨n⟩`` + a ``## References``
  section (``convert_links_to_citations``,
  ``markdown_generation_strategy.py:82-146`` — numbering in first-seen
  order, description ``title - text``).

The converter itself is a from-scratch DOM walker (the html2text
library is not available in this environment); its output is
deterministic: same HTML in → same markdown bytes out.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import urljoin

from .dom import Element, TextNode, parse

# Same pattern as the reference LINK_PATTERN (markdown_generation_strategy.py:11)
LINK_PATTERN = re.compile(r'!?\[([^\]]+)\]\(([^)]+?)(?:\s+"([^"]*)")?\)')

_WS_RE = re.compile(r"[ \t\r\n\f]+")

_SKIP_TAGS = frozenset({"script", "style", "head", "title", "meta", "link", "noscript", "template"})
_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
_BLOCK_TAGS = frozenset(
    {
        "p",
        "div",
        "section",
        "article",
        "main",
        "aside",
        "header",
        "footer",
        "nav",
        "figure",
        "figcaption",
        "address",
        "fieldset",
        "details",
        "summary",
        "form",
    }
)


def fast_urljoin(base: str, url: str) -> str:
    """Reference ``fast_urljoin`` (markdown_generation_strategy.py:14-23)."""
    if url.startswith(("http://", "https://", "mailto:", "//")):
        return url
    if url.startswith("/"):
        if base.endswith("/"):
            return base[:-1] + url
        return base + url
    return urljoin(base, url)


@dataclass
class _Ctx:
    blocks: list = field(default_factory=list)  # finished block strings
    inline: list = field(default_factory=list)  # current inline run
    list_stack: list = field(default_factory=list)  # ("ul", None) | ("ol", counter)
    pre_depth: int = 0

    def flush(self) -> None:
        text = "".join(self.inline)
        if self.pre_depth == 0:
            text = text.strip()
        if text:
            self.blocks.append(text)
        self.inline = []

    def emit(self, s: str) -> None:
        self.inline.append(s)


def _inline_text(s: str, in_pre: bool) -> str:
    if in_pre:
        return s
    return _WS_RE.sub(" ", s)


def _walk(node, ctx: _Ctx) -> None:
    for child in node.children:
        if isinstance(child, TextNode):
            txt = _inline_text(child.text, ctx.pre_depth > 0)
            if txt:
                ctx.emit(txt)
            continue
        if not isinstance(child, Element):
            continue
        tag = child.tag
        if tag in _SKIP_TAGS:
            continue

        if tag in _HEADINGS:
            ctx.flush()
            inner = _collect_inline(child, ctx)
            if inner.strip():
                ctx.blocks.append("#" * _HEADINGS[tag] + " " + inner.strip())
        elif tag == "p":
            ctx.flush()
            _walk(child, ctx)
            ctx.flush()
        elif tag in _BLOCK_TAGS:
            ctx.flush()
            _walk(child, ctx)
            ctx.flush()
        elif tag == "br":
            ctx.emit("\n")
        elif tag == "hr":
            ctx.flush()
            ctx.blocks.append("* * *")
        elif tag == "pre":
            ctx.flush()
            ctx.pre_depth += 1
            inner = _collect_inline(child, ctx)
            ctx.pre_depth -= 1
            code = inner.strip("\n")
            ctx.blocks.append(f"```\n{code}\n```")
        elif tag == "code":
            if ctx.pre_depth > 0:
                _walk(child, ctx)
            else:
                inner = _collect_inline(child, ctx)
                ctx.emit(f"`{inner}`")
        elif tag in ("strong", "b"):
            inner = _collect_inline(child, ctx)
            if inner.strip():
                ctx.emit(f"**{inner.strip()}**")
        elif tag in ("em", "i"):
            inner = _collect_inline(child, ctx)
            if inner.strip():
                ctx.emit(f"_{inner.strip()}_")
        elif tag == "a":
            href = (child.get("href") or "").strip()
            title = (child.get("title") or "").strip()
            inner = _collect_inline(child, ctx).strip()
            if href and inner:
                if title:
                    ctx.emit(f'[{inner}]({href} "{title}")')
                else:
                    ctx.emit(f"[{inner}]({href})")
            elif inner:
                ctx.emit(inner)
        elif tag == "img":
            src = (child.get("src") or "").strip()
            alt = (child.get("alt") or "").strip()
            if src:
                ctx.emit(f"![{alt}]({src})")
        elif tag in ("ul", "ol"):
            ctx.flush()
            ctx.list_stack.append([tag, 0])
            _walk(child, ctx)
            ctx.list_stack.pop()
            ctx.flush()
        elif tag == "li":
            ctx.flush()
            depth = max(0, len(ctx.list_stack) - 1)
            indent = "  " * depth
            if ctx.list_stack and ctx.list_stack[-1][0] == "ol":
                ctx.list_stack[-1][1] += 1
                marker = f"{ctx.list_stack[-1][1]}. "
            else:
                marker = "* "
            inner = _collect_block_inline(child, ctx)
            if inner.strip():
                ctx.blocks.append(indent + marker + inner.strip())
        elif tag == "blockquote":
            ctx.flush()
            sub = _Ctx(pre_depth=ctx.pre_depth)
            _walk(child, sub)
            sub.flush()
            quoted = "\n".join("> " + line for block in sub.blocks for line in block.split("\n"))
            if quoted:
                ctx.blocks.append(quoted)
        elif tag == "table":
            ctx.flush()
            md = _table_to_markdown(child)
            if md:
                ctx.blocks.append(md)
        else:
            _walk(child, ctx)


def _collect_inline(el: Element, ctx: _Ctx) -> str:
    sub = _Ctx(pre_depth=ctx.pre_depth, list_stack=ctx.list_stack)
    _walk(el, sub)
    parts = list(sub.blocks)
    tail = "".join(sub.inline)
    if tail:
        parts.append(tail if ctx.pre_depth else tail)
    return " ".join(p for p in parts) if ctx.pre_depth == 0 else "".join(parts)


def _collect_block_inline(el: Element, ctx: _Ctx) -> str:
    sub = _Ctx(pre_depth=ctx.pre_depth, list_stack=ctx.list_stack)
    _walk(el, sub)
    sub.flush()
    return " ".join(b for b in sub.blocks if b)


def _table_to_markdown(table: Element) -> str:
    rows = table.find_all("tr")
    if not rows:
        return ""
    lines = []
    for i, row in enumerate(rows):
        cells = [
            _WS_RE.sub(" ", c.get_text()).strip() for c in row.find_all(("th", "td"))
        ]
        if not cells:
            continue
        lines.append("| " + " | ".join(cells) + " |")
        if i == 0:
            lines.append("|" + "|".join(["---"] * len(cells)) + "|")
    return "\n".join(lines)


def markdown_from_tree(root: Element) -> str:
    """Markdown straight from an already-parsed DOM (no re-parse —
    the kernel's single-parse fast path)."""
    ctx = _Ctx()
    _walk(root, ctx)
    ctx.flush()
    out = "\n\n".join(b for b in ctx.blocks if b)
    # mirror the reference's fence-dedent post-fix (:214)
    out = out.replace("    ```", "```")
    return out + "\n" if out else ""


def html_to_markdown(html: str) -> str:
    """Convert HTML to markdown (raw_markdown). Blocks separated by
    single blank lines; trailing newline appended (html2text emits a
    final newline)."""
    if not html:
        return ""
    return markdown_from_tree(parse(html))


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
) -> dict:
    """Full markdown generation result:
    ``{raw_markdown, markdown_with_citations, references_markdown,
    fit_markdown, fit_html}`` (mirrors ``MarkdownGenerationResult``,
    reference ``models.py:119-127``)."""
    raw_markdown = html_to_markdown(input_html or "")

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
        fit_markdown = html_to_markdown(fit_html)

    return {
        "raw_markdown": raw_markdown,
        "markdown_with_citations": markdown_with_citations,
        "references_markdown": references_markdown,
        "fit_markdown": fit_markdown,
        "fit_html": fit_html,
    }
