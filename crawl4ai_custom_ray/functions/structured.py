"""Schema-driven structured extraction (JSON-CSS).

Mirrors the reference ``JsonCssExtractionStrategy`` /
``JsonElementExtractionStrategy`` (``extraction_strategy.py:989-1427``):
a user-supplied JSON schema ``{name, baseSelector, baseFields?,
fields: [...]}`` where each field is ``{name, selector?, type:
text|attribute|html|regex|nested|list|nested_list|computed,
attribute?, pattern?, fields?, transform?, default?}``.

Semantics preserved from the reference:
- field without ``selector`` reads from the base element itself;
- ``regex`` matches ``group(1)`` against the element text;
- ``nested`` takes the FIRST match; ``list`` applies *single* fields
  per match; ``nested_list`` recurses fully;
- transforms ``lowercase/uppercase/strip``;
- ``computed`` evaluates an expression over the partial item — the
  reference uses bare ``eval`` (:1221); here restricted to a
  no-builtins namespace.

The CSS backend is :mod:`..html.css` (the environment has no
BeautifulSoup/lxml).  ``extract_structured`` wraps the strategy as a
Ray ``map_batches`` stage emitting one JSON string per page
(matching the reference pipeline's ``json.dumps`` handoff,
``async_webcrawler.py:631-633``).
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

from ..html.css import select
from ..html.dom import Element, parse


class JsonCssExtractionStrategy:
    def __init__(self, schema: dict, verbose: bool = False):
        self.schema = schema
        self.verbose = verbose

    # -- backends ----------------------------------------------------
    def _parse_html(self, html: str) -> Element:
        return parse(html)

    def _get_base_elements(self, parsed: Element, selector: str) -> list[Element]:
        return select(parsed, selector)

    def _get_elements(self, element: Element, selector: str) -> list[Element]:
        return select(element, selector)

    @staticmethod
    def _get_element_text(el: Element) -> str:
        return el.get_text().strip()

    @staticmethod
    def _get_element_html(el: Element) -> str:
        return el.serialize()

    @staticmethod
    def _get_element_attribute(el: Element, attribute: str):
        return el.get(attribute)

    # -- core (reference structure) ----------------------------------
    def extract(self, url: str, html_content: str) -> list[dict]:
        parsed = self._parse_html(html_content)
        results = []
        for element in self._get_base_elements(parsed, self.schema["baseSelector"]):
            item: dict = {}
            for field in self.schema.get("baseFields", []):
                value = self._extract_single_field(element, field)
                if value is not None:
                    item[field["name"]] = value
            item.update(self._extract_item(element, self.schema["fields"]))
            if item:
                results.append(item)
        return results

    def _extract_field(self, element: Element, field: dict):
        try:
            ftype = field["type"]
            if ftype == "nested":
                nested = self._get_elements(element, field["selector"])
                return self._extract_item(nested[0], field["fields"]) if nested else {}
            if ftype == "list":
                els = self._get_elements(element, field["selector"])
                return [self._extract_list_item(el, field["fields"]) for el in els]
            if ftype == "nested_list":
                els = self._get_elements(element, field["selector"])
                return [self._extract_item(el, field["fields"]) for el in els]
            return self._extract_single_field(element, field)
        except Exception:
            return field.get("default")

    def _extract_single_field(self, element: Element, field: dict):
        if "selector" in field:
            selected = self._get_elements(element, field["selector"])
            if not selected:
                return field.get("default")
            selected = selected[0]
        else:
            selected = element

        value = None
        ftype = field["type"]
        if ftype == "text":
            value = self._get_element_text(selected)
        elif ftype == "attribute":
            value = self._get_element_attribute(selected, field["attribute"])
        elif ftype == "html":
            value = self._get_element_html(selected)
        elif ftype == "regex":
            match = re.search(field["pattern"], self._get_element_text(selected))
            value = match.group(1) if match else None

        if "transform" in field and value is not None:
            value = self._apply_transform(value, field["transform"])
        return value if value is not None else field.get("default")

    def _extract_list_item(self, element: Element, fields: list[dict]) -> dict:
        item = {}
        for field in fields:
            value = self._extract_single_field(element, field)
            if value is not None:
                item[field["name"]] = value
        return item

    def _extract_item(self, element: Element, fields: list[dict]) -> dict:
        item: dict = {}
        for field in fields:
            if field["type"] == "computed":
                value = self._compute_field(item, field)
            else:
                value = self._extract_field(element, field)
            if value is not None:
                item[field["name"]] = value
        return item

    @staticmethod
    def _apply_transform(value, transform: str):
        if transform == "lowercase":
            return value.lower()
        if transform == "uppercase":
            return value.upper()
        if transform == "strip":
            return value.strip()
        return value

    def _compute_field(self, item: dict, field: dict):
        try:
            if "expression" in field:
                return eval(field["expression"], {"__builtins__": {}}, dict(item))
            if "function" in field:
                return field["function"](item)
        except Exception:
            return field.get("default")


class JsonXPathExtractionStrategy(JsonCssExtractionStrategy):
    """XPath backend matching the reference's
    ``JsonXPathExtractionStrategy`` (extraction_strategy.py:1797-1889).
    The reference delegates to lxml's XPath and converts bare CSS
    selectors via ``_basic_css_to_xpath`` (:1836-1846); here selectors
    containing ``/`` evaluate on the in-repo XPath-subset engine
    (:mod:`..html.xpath` — paths, predicates, functions, union,
    positional semantics), and bare CSS goes through the same
    css→xpath transliteration the reference applies."""

    def _css_to_xpath(self, selector: str) -> str:
        if "/" in selector:
            return selector
        # reference _basic_css_to_xpath: descendant/child combinators
        if " > " in selector:
            return "//" + "/".join(selector.split(" > "))
        if " " in selector:
            return "//" + "//".join(selector.split(" "))
        return "//" + selector

    def _evaluator(self, root: Element):
        # one doc-order index per document — _Evaluator.__init__ walks
        # the whole tree, so rebuilding it per (element, field) pair
        # would make extraction quadratic in page size
        from ..html.xpath import _Evaluator

        cached = getattr(self, "_eval_cache", None)
        if cached is not None and cached[0] is root:
            return cached[1]
        ev = _Evaluator(root)
        self._eval_cache = (root, ev)
        return ev

    def _get_base_elements(self, parsed: Element, selector: str) -> list[Element]:
        from ..html.xpath import _Parser

        paths = _Parser(self._css_to_xpath(selector)).parse_union()
        res = self._evaluator(parsed).select(paths, parsed)
        return [r for r in res if isinstance(r, Element)]

    def _get_elements(self, element: Element, selector: str) -> list[Element]:
        from ..html.xpath import _Parser

        xpath = self._css_to_xpath(selector)
        # reference prefixes "." so the path is relative to `element`
        root = element
        while isinstance(root.parent, Element):
            root = root.parent
        paths = _Parser(xpath).parse_union()
        if xpath.startswith("//"):
            # .//x — descendants of the context element
            for p in paths:
                p.absolute = False
                if p.steps:
                    p.steps[0].axis = "descendant"
        res = self._evaluator(root).select(paths, element)
        return [r for r in res if isinstance(r, Element)]


# Backwards-compatible alias (round-1 name)
JsonXPathLikeExtractionStrategy = JsonXPathExtractionStrategy

# Reference surface parity: JsonLxmlExtractionStrategy
# (extraction_strategy.py:1429-1698) is the same schema semantics on
# an lxml selector backend chosen purely for speed.  lxml is not
# installed in this environment, so the name maps to the CSS engine —
# selector semantics are engine-equivalence-tested against the XPath
# engine in tests/test_xpath.py, which is the property the lxml
# backend also guarantees.
JsonLxmlExtractionStrategy = JsonCssExtractionStrategy


def extract_structured(
    ds,
    schema: dict,
    *,
    html_column: str = "html",
    url_column: str = "url",
    engine: str = "css",
):
    """Ray stage: one row per page → (url, extracted_content JSON
    string, n_items).  ``engine`` picks the selector backend:
    ``"css"`` (JsonCssExtractionStrategy) or ``"xpath"``
    (JsonXPathExtractionStrategy) — the reference's
    ``json-css``/``json-xpath`` CLI extraction types."""
    if engine not in ("css", "xpath"):
        raise ValueError(f"engine must be 'css' or 'xpath', got {engine!r}")

    class Extractor:
        def __init__(self):
            cls = JsonCssExtractionStrategy if engine == "css" else JsonXPathExtractionStrategy
            self.strategy = cls(schema)

        def __call__(self, batch: pa.Table) -> pa.Table:
            urls = batch[url_column].to_pylist()
            htmls = batch[html_column].to_pylist()
            contents, counts = [], []
            for url, html in zip(urls, htmls):
                if isinstance(html, bytes):
                    html = html.decode("utf-8", errors="replace")
                items = self.strategy.extract(url, html)
                contents.append(json.dumps(items, ensure_ascii=False))
                counts.append(len(items))
            return pa.table(
                {
                    "url": pa.array(urls, pa.string()),
                    "extracted_content": pa.array(contents, pa.large_string()),
                    "n_items": pa.array(counts, pa.int32()),
                }
            )

    return ds.map_batches(Extractor, batch_format="pyarrow", concurrency=2, num_cpus=0.5)
