"""Small text/HTML utilities from the reference's utils surface."""

from __future__ import annotations

from .dom import Element, TextNode

# Reference config.py:51-72
ONLY_TEXT_ELIGIBLE_TAGS = frozenset(
    {
        "b", "i", "u", "span", "del", "ins", "sub", "sup", "strong", "em",
        "code", "kbd", "var", "s", "q", "abbr", "cite", "dfn", "time", "small", "mark",
    }
)


def sanitize_input_encode(text: str) -> str:
    """UTF-8 scrub (reference ``utils.py:777-793``)."""
    if not text:
        return ""
    try:
        return text.encode("utf-8", errors="ignore").decode("utf-8")
    except UnicodeEncodeError:
        return text.encode("ascii", errors="ignore").decode("ascii")


def fast_format_html(html_string: str) -> str:
    """Indentation-only pretty printer via string splitting (reference
    ``fast_format_html``, ``utils.py:2157-2201``)."""
    indent = 0
    indent_str = "  "
    formatted: list[str] = []
    parts = html_string.replace(">", ">\n").replace("<", "\n<").split("\n")
    for part in parts:
        if not part.strip():
            continue
        if part.startswith("</"):
            indent -= 1
            formatted.append(indent_str * indent + part)
        elif part.startswith("<") and part.endswith("/>"):
            formatted.append(indent_str * indent + part)
        elif part.startswith("<"):
            formatted.append(indent_str * indent + part)
            indent += 1
        else:
            content = part.strip()
            if content:
                formatted.append(indent_str * indent + content)
    return "\n".join(formatted)


def flatten_inline_tags(root: Element, tags=ONLY_TEXT_ELIGIBLE_TAGS) -> None:
    """``only_text`` mode: replace eligible inline elements by their
    text content (reference ``content_scraping_strategy.py:747-755``).
    In place."""
    for el in root.find_all(tuple(tags)):
        parent = el.parent
        if parent is None:
            continue
        try:
            idx = parent.children.index(el)
        except ValueError:
            continue
        parent.children[idx] = TextNode(el.get_text(), parent)
