"""Minimal CSS selector engine over the stdlib DOM.

Supports the selector subset the reference's JSON-CSS extraction
schemas use in practice (``JsonCssExtractionStrategy``,
``extraction_strategy.py:1382-1427`` — backed there by BeautifulSoup's
``select``):

- type selectors (``div``), universal (``*``)
- ``.class`` (multi-class aware), ``#id``
- attribute selectors ``[attr]``, ``[attr=value]``, ``[attr="value"]``,
  ``[attr^=v] [attr$=v] [attr*=v]``
- compound selectors (``div.card#main[role=row]``)
- descendant (whitespace) and child (``>``) combinators
- selector groups (``a, b``)
- ``:nth-of-type(n)`` (numeric only)

Matching is document-order, returns Element lists.
"""

from __future__ import annotations

import re

from .dom import Element

_TOKEN_RE = re.compile(
    r"""
    (?P<tag>[a-zA-Z][\w-]*|\*)
  | \.(?P<cls>[\w-]+)
  | \#(?P<id>[\w-]+)
  | \[(?P<attr>[\w-]+)(?:(?P<op>[\^\$\*]?=)(?P<val>"[^"]*"|'[^']*'|[^\]]*))?\]
  | :nth-of-type\((?P<nth>\d+)\)
    """,
    re.VERBOSE,
)


class _Simple:
    __slots__ = ("tag", "classes", "ids", "attrs", "nth")

    def __init__(self):
        self.tag: str | None = None
        self.classes: list[str] = []
        self.ids: list[str] = []
        self.attrs: list[tuple[str, str, str | None]] = []  # (name, op, value)
        self.nth: int | None = None

    def matches(self, el: Element) -> bool:
        if self.tag and self.tag != "*" and el.tag != self.tag:
            return False
        if self.classes:
            el_classes = (el.get("class") or "").split()
            if not all(c in el_classes for c in self.classes):
                return False
        if self.ids and not all(el.get("id") == i for i in self.ids):
            return False
        for name, op, value in self.attrs:
            actual = el.get(name)
            if actual is None:
                return False
            if value is None:
                continue
            if op == "=" and actual != value:
                return False
            if op == "^=" and not actual.startswith(value):
                return False
            if op == "$=" and not actual.endswith(value):
                return False
            if op == "*=" and value not in actual:
                return False
        if self.nth is not None:
            parent = el.parent
            if parent is None:
                return False
            same = [c for c in parent.child_elements() if c.tag == el.tag]
            if same.index(el) + 1 != self.nth:
                return False
        return True


def _parse_compound(token: str) -> _Simple:
    simple = _Simple()
    pos = 0
    while pos < len(token):
        m = _TOKEN_RE.match(token, pos)
        if m is None:
            raise ValueError(f"unsupported CSS selector fragment: {token[pos:]!r}")
        if m.group("tag"):
            simple.tag = m.group("tag")
        elif m.group("cls"):
            simple.classes.append(m.group("cls"))
        elif m.group("id"):
            simple.ids.append(m.group("id"))
        elif m.group("attr"):
            value = m.group("val")
            op = m.group("op")
            if value is not None and len(value) >= 2 and value[0] in "\"'" and value[-1] == value[0]:
                value = value[1:-1]
            simple.attrs.append((m.group("attr"), op or "=", value))
        elif m.group("nth"):
            simple.nth = int(m.group("nth"))
        pos = m.end()
    return simple


def _parse_sequence(selector: str) -> list[tuple[str, _Simple]]:
    """→ [(combinator, simple)]; combinator ∈ {' ', '>'} (first is ' ')."""
    parts = re.split(r"\s*(>)\s*|\s+", selector.strip())
    seq: list[tuple[str, _Simple]] = []
    combinator = " "
    for part in parts:
        if part is None or part == "":
            continue
        if part == ">":
            combinator = ">"
            continue
        seq.append((combinator, _parse_compound(part)))
        combinator = " "
    return seq


def select(root: Element, selector: str) -> list[Element]:
    """All elements under ``root`` matching the selector (document
    order, root itself excluded)."""
    results: list[Element] = []
    seen: set[int] = set()
    for group in selector.split(","):
        group = group.strip()
        if not group:
            continue
        seq = _parse_sequence(group)
        if not seq:
            continue
        for el in _iter_elements(root):
            if _matches_sequence(el, seq):
                if id(el) not in seen:
                    seen.add(id(el))
                    results.append(el)
    if len(selector.split(",")) > 1:
        order = {id(el): i for i, el in enumerate(_iter_elements(root))}
        results.sort(key=lambda e: order[id(e)])
    return results


def select_one(root: Element, selector: str) -> Element | None:
    found = select(root, selector)
    return found[0] if found else None


def _iter_elements(root: Element):
    for child in root.children:
        if isinstance(child, Element):
            yield child
            yield from _iter_elements(child)


def _matches_sequence(el: Element, seq: list[tuple[str, _Simple]]) -> bool:
    combinator, simple = seq[-1]
    if not simple.matches(el):
        return False
    if len(seq) == 1:
        return True
    rest = seq[:-1]
    parent = el.parent
    if combinator == ">":
        return (
            parent is not None
            and isinstance(parent, Element)
            and parent.tag != "[document]"
            and _matches_sequence(parent, rest)
        )
    while parent is not None and isinstance(parent, Element) and parent.tag != "[document]":
        if _matches_sequence(parent, rest):
            return True
        parent = parent.parent
    return False
