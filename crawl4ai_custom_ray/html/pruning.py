"""Content-pruning filter (fit_markdown path).

Mirrors the reference ``PruningContentFilter``
(``crawl4ai/content_filter_strategy.py:533-777``):

- remove comments + excluded tags
  ``{nav, footer, header, aside, script, style, form, iframe,
  noscript}`` (:101-111);
- recursively prune from ``<body>`` down: per-node composite score =
  0.4·text_density + 0.2·(1 − link_density) + 0.2·tag_weight +
  0.1·class_id_weight + 0.1·log(text_len+1), normalized by total
  weight (:735-767); node removed when score < threshold
  (fixed, default 0.48) or, in dynamic mode, an importance-adjusted
  threshold (:705-720);
- surviving top-level blocks (direct children of body with text)
  returned as HTML strings.

Notes kept faithful to the reference: ``class_id_weight`` contributes
``max(0, score)`` where score is always ≤ 0 (:771-776) — i.e. the
class/id metric only dilutes the weighted average, never subtracts;
``min_word_threshold`` short-circuits to guaranteed removal (:734-740);
``link_text_len`` counts only *direct-child* ``<a>`` whose sole child
is a text node (BeautifulSoup ``a.string`` semantics, :694-698).
"""

from __future__ import annotations

import math
import re

from .dom import CommentNode, Element, TextNode, parse, body_of

EXCLUDED_TAGS = frozenset(
    {"nav", "footer", "header", "aside", "script", "style", "form", "iframe", "noscript"}
)

NEGATIVE_PATTERNS = re.compile(
    r"nav|footer|header|sidebar|ads|comment|promo|advert|social|share", re.I
)

TAG_IMPORTANCE = {
    "article": 1.5,
    "main": 1.4,
    "section": 1.3,
    "p": 1.2,
    "h1": 1.4,
    "h2": 1.3,
    "h3": 1.2,
    "div": 0.7,
    "span": 0.6,
}

TAG_WEIGHTS = {
    "div": 0.5,
    "p": 1.0,
    "article": 1.5,
    "section": 1.0,
    "span": 0.3,
    "li": 0.5,
    "ul": 0.5,
    "ol": 0.5,
    "h1": 1.2,
    "h2": 1.1,
    "h3": 1.0,
    "h4": 0.9,
    "h5": 0.8,
    "h6": 0.7,
}

METRIC_WEIGHTS = {
    "text_density": 0.4,
    "link_density": 0.2,
    "tag_weight": 0.2,
    "class_id_weight": 0.1,
    "text_length": 0.1,
}


class PruningContentFilter:
    def __init__(
        self,
        user_query: str | None = None,
        min_word_threshold: int | None = None,
        threshold_type: str = "fixed",
        threshold: float = 0.48,
    ):
        self.user_query = user_query
        self.min_word_threshold = min_word_threshold
        self.threshold_type = threshold_type
        self.threshold = threshold

    # -- public API ---------------------------------------------------
    def filter_content(self, html: str, min_word_threshold: int | None = None) -> list[str]:
        if not html or not isinstance(html, str):
            return []
        return [el.serialize() for el in self.filter_tree(parse(html))]

    def filter_tree(self, root: Element) -> list[Element]:
        """Prune an already-parsed tree IN PLACE and return the
        surviving top-level block elements (the kernel's single-parse
        fast path — pass a ``copy_tree()`` if the tree is shared)."""
        body = body_of(root)
        self._remove_comments(body)
        self._remove_unwanted_tags(body)
        self._prune_tree(body)

        blocks: list[Element] = []
        for child in body.children:
            if not isinstance(child, Element):
                continue
            if child.text_length(strip=True) > 0:
                blocks.append(child)
        return blocks

    # -- internals ----------------------------------------------------
    @staticmethod
    def _remove_comments(root: Element) -> None:
        stack = [root]
        while stack:
            el = stack.pop()
            el.children = [c for c in el.children if not isinstance(c, CommentNode)]
            stack.extend(el.child_elements())

    @staticmethod
    def _remove_unwanted_tags(root: Element) -> None:
        # single tree walk for all excluded tags (9 per-tag walks
        # dominated large-page profiles)
        for el in root.find_all(EXCLUDED_TAGS):
            el.decompose()

    def _prune_tree(self, node: Element) -> None:
        if node is None:
            return
        # length-only accessors: materializing the text/serialization
        # at every tree level is O(n·depth) string churn
        text_len = node.text_length(strip=True)
        tag_len = node.serialized_contents_length()
        link_text_len = 0
        for child in node.children:
            if isinstance(child, Element) and child.tag == "a":
                # BeautifulSoup a.string: only when the <a> has exactly
                # one child and it is a text node
                if len(child.children) == 1 and isinstance(child.children[0], TextNode):
                    link_text_len += len(child.children[0].text.strip())

        score = self._composite_score(node, text_len, tag_len, link_text_len)

        if self.threshold_type == "fixed":
            should_remove = score < self.threshold
        else:
            tag_importance = TAG_IMPORTANCE.get(node.tag, 0.7)
            text_ratio = text_len / tag_len if tag_len > 0 else 0
            link_ratio = link_text_len / text_len if text_len > 0 else 1
            threshold = self.threshold
            if tag_importance > 1:
                threshold *= 0.8
            if text_ratio > 0.4:
                threshold *= 0.9
            if link_ratio > 0.6:
                threshold *= 1.2
            should_remove = score < threshold

        if should_remove:
            node.decompose()
        else:
            for child in list(node.child_elements()):
                self._prune_tree(child)

    def _composite_score(
        self, node: Element, text_len: int, tag_len: int, link_text_len: int
    ) -> float:
        if self.min_word_threshold:
            word_count = node.get_text(strip=True).count(" ") + 1
            if word_count < self.min_word_threshold:
                return -1.0

        score = 0.0
        total_weight = 0.0

        density = text_len / tag_len if tag_len > 0 else 0
        score += METRIC_WEIGHTS["text_density"] * density
        total_weight += METRIC_WEIGHTS["text_density"]

        link_density = 1 - (link_text_len / text_len if text_len > 0 else 0)
        score += METRIC_WEIGHTS["link_density"] * link_density
        total_weight += METRIC_WEIGHTS["link_density"]

        score += METRIC_WEIGHTS["tag_weight"] * TAG_WEIGHTS.get(node.tag, 0.5)
        total_weight += METRIC_WEIGHTS["tag_weight"]

        class_score = 0.0
        classes = node.get("class")
        if classes and NEGATIVE_PATTERNS.match(classes):
            class_score -= 0.5
        element_id = node.get("id")
        if element_id and NEGATIVE_PATTERNS.match(element_id):
            class_score -= 0.5
        score += METRIC_WEIGHTS["class_id_weight"] * max(0, class_score)
        total_weight += METRIC_WEIGHTS["class_id_weight"]

        score += METRIC_WEIGHTS["text_length"] * math.log(text_len + 1)
        total_weight += METRIC_WEIGHTS["text_length"]

        return score / total_weight if total_weight > 0 else 0
