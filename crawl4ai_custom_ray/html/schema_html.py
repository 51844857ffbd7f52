"""``fit_html`` preprocessing for schema generation.

Mirrors the reference ``preprocess_html_for_schema``
(``crawl4ai/utils.py:3001-3145``), called by the pipeline with
``text_threshold=500, max_size=300_000``
(``async_webcrawler.py:515``):

1. drop ``<head>``;
2. remove ``script style noscript iframe canvas svg video audio
   source track map area`` entirely;
3. keep only attributes ``{id, class, name, type, value}`` + ``data-*``
   and truncate long values to ``attr_value_threshold`` + ``...``;
4. truncate long text nodes to ``text_threshold`` + ``...``;
5. drop repeated siblings: same ``(tag, class, text-hash)`` signature
   keeps only the first occurrence;
6. hard size cap → ``result[:max_size] + "..."``.
"""

from __future__ import annotations

import hashlib

from .dom import CommentNode, Element, TextNode
from .fastparse import parse_fast

_REMOVE_TAGS = (
    "script", "style", "noscript", "iframe", "canvas", "svg",
    "video", "audio", "source", "track", "map", "area",
)
# one fused walk removes head + all stripped tags (frozenset: O(1)
# membership per element instead of 13 separate traversals)
_REMOVE_WITH_HEAD = frozenset(_REMOVE_TAGS) | {"head"}
_ATTRS_TO_KEEP = frozenset({"id", "class", "name", "type", "value"})


def preprocess_html_for_schema(
    html_content: str,
    text_threshold: int = 100,
    attr_value_threshold: int = 200,
    max_size: int = 100_000,
) -> str:
    try:
        root = parse_fast(html_content)
    except Exception:
        return html_content[:max_size] if len(html_content) > max_size else html_content
    return preprocess_tree_for_schema(
        root,
        html_content,
        text_threshold=text_threshold,
        attr_value_threshold=attr_value_threshold,
        max_size=max_size,
    )


def preprocess_tree_for_schema(
    root: Element,
    html_content: str,
    *,
    text_threshold: int = 100,
    attr_value_threshold: int = 200,
    max_size: int = 100_000,
) -> str:
    """Tree-level ``preprocess_html_for_schema``: MUTATES ``root`` (pass a
    ``copy_tree()`` if the original is still needed) so the extract kernel
    can reuse its pristine parse instead of re-tokenizing the raw html.
    ``html_content`` is only the fallback payload on internal error."""
    try:
        for el in root.find_all(_REMOVE_WITH_HEAD):
            el.decompose()

        # strip comments, clean attributes, truncate text
        stack: list[Element] = [root]
        while stack:
            el = stack.pop()
            el.children = [c for c in el.children if not isinstance(c, CommentNode)]
            if el is not root:
                new_attrs = {}
                for k, v in el.attrs.items():
                    if k in _ATTRS_TO_KEEP or k.startswith("data-"):
                        if len(v) > attr_value_threshold:
                            v = v[:attr_value_threshold] + "..."
                        new_attrs[k] = v
                el.attrs = new_attrs
            for c in el.children:
                if isinstance(c, TextNode):
                    stripped = c.text.strip()
                    if len(stripped) > text_threshold:
                        c.text = stripped[:text_threshold] + "..."
                elif isinstance(c, Element):
                    stack.append(c)

        # dedup repeated (tag, class, text-hash) elements, first-wins,
        # in document order
        seen: set[tuple] = set()
        for el in list(root.iter()):
            if el is root or el.parent is None:
                continue
            cls = el.get("class")
            if not cls:
                continue
            digest = hashlib.blake2b(el.get_text().encode("utf-8"), digest_size=8).digest()
            sig = (el.tag, cls, digest)
            if sig in seen:
                el.decompose()
            else:
                seen.add(sig)

        result = root.serialize_contents()
        if len(result) > max_size:
            return result[:max_size] + "..."
        return result
    except Exception:
        return html_content[:max_size] if len(html_content) > max_size else html_content
