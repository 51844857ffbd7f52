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


# canonical home: html/format.py (differential-tested against the
# reference formatter); re-exported here for the utils-surface name
from .format import fast_format_html  # noqa: F401


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
