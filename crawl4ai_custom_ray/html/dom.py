"""A minimal DOM built on stdlib ``html.parser``.

Just enough tree to support the scrape kernel, the pruning filter and
the markdown generator: elements with attrs/children/parent, text
nodes, comments, find/walk/remove, text extraction and a deterministic
HTML serializer.

Determinism notes:
- attribute order is preserved as parsed;
- serialization escapes ``& < >`` in text and ``& < > "`` in attribute
  values, always quotes attributes with ``"``;
- void elements serialize as ``<br>`` (no self-closing slash).
"""

from __future__ import annotations

from html import escape
from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    {
        "area",
        "base",
        "br",
        "col",
        "embed",
        "hr",
        "img",
        "input",
        "link",
        "meta",
        "param",
        "source",
        "track",
        "wbr",
    }
)

# Elements whose raw content is not HTML-parsed (html.parser CDATA mode).
RAW_TEXT_ELEMENTS = frozenset({"script", "style"})

# Tags that implicitly close an open <p> (subset of the HTML5 rules —
# enough for real-world pages; html.parser does no implied-end handling
# of its own).
_P_CLOSERS = frozenset(
    {
        "address",
        "article",
        "aside",
        "blockquote",
        "div",
        "dl",
        "fieldset",
        "figure",
        "footer",
        "form",
        "h1",
        "h2",
        "h3",
        "h4",
        "h5",
        "h6",
        "header",
        "hr",
        "main",
        "nav",
        "ol",
        "p",
        "pre",
        "section",
        "table",
        "ul",
    }
)

_LI_CLOSERS = frozenset({"li"})
_TR_CLOSERS = frozenset({"tr"})
_TDTH_CLOSERS = frozenset({"td", "th", "tr"})


class TextNode:
    __slots__ = ("text", "parent")

    def __init__(self, text: str, parent: "Element | None" = None):
        self.text = text
        self.parent = parent

    def __repr__(self) -> str:  # pragma: no cover
        return f"TextNode({self.text!r})"


class CommentNode:
    __slots__ = ("text", "parent")

    def __init__(self, text: str, parent: "Element | None" = None):
        self.text = text
        self.parent = parent


class Element:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict | None = None, parent: "Element | None" = None):
        self.tag = tag
        self.attrs: dict[str, str] = attrs or {}
        self.children: list = []
        self.parent = parent

    # -- construction -------------------------------------------------
    def append(self, node) -> None:
        node.parent = self
        self.children.append(node)

    # -- querying -----------------------------------------------------
    def get(self, name: str, default=None):
        return self.attrs.get(name, default)

    def iter(self, tags=None):
        """Depth-first pre-order walk over elements (self included).
        Iterative — generator recursion costs ~2× on deep trees."""
        stack = [self]
        while stack:
            el = stack.pop()
            if tags is None or el.tag in tags:
                yield el
            # push children reversed to keep document order
            children = el.children
            for i in range(len(children) - 1, -1, -1):
                c = children[i]
                if type(c) is Element:
                    stack.append(c)

    def find_all(self, tag, recursive: bool = True) -> list:
        tags = (tag,) if isinstance(tag, str) else tag
        if recursive:
            out = []
            stack = [c for c in self.children if type(c) is Element]
            stack.reverse()
            while stack:
                c = stack.pop()
                if c.tag in tags:
                    out.append(c)
                grand = c.children
                for i in range(len(grand) - 1, -1, -1):
                    g = grand[i]
                    if type(g) is Element:
                        stack.append(g)
            return out
        return [c for c in self.children if isinstance(c, Element) and c.tag in tags]

    def find(self, tag):
        # early-exit walk: `find` is hot (head/base/title probes per
        # page) and must not pay for a full-tree find_all
        tags = (tag,) if isinstance(tag, str) else tag
        stack = [c for c in self.children if type(c) is Element]
        stack.reverse()
        while stack:
            c = stack.pop()
            if c.tag in tags:
                return c
            grand = c.children
            for i in range(len(grand) - 1, -1, -1):
                g = grand[i]
                if type(g) is Element:
                    stack.append(g)
        return None

    def child_elements(self) -> list:
        return [c for c in self.children if isinstance(c, Element)]

    # -- text ---------------------------------------------------------
    def get_text(self, strip: bool = False, separator: str = "") -> str:
        parts: list[str] = []
        self._collect_text(parts, strip)
        text = separator.join(p for p in parts if p)
        return text

    def _collect_text(self, parts: list, strip: bool) -> None:
        for child in self.children:
            if isinstance(child, TextNode):
                parts.append(child.text.strip() if strip else child.text)
            elif isinstance(child, Element):
                if child.tag in RAW_TEXT_ELEMENTS:
                    continue
                child._collect_text(parts, strip)

    # -- length-only accessors (no string materialization) ------------
    def text_length(self, strip: bool = False) -> int:
        """len(self.get_text(strip=strip)) without building the string
        (get_text joins with '' so lengths are additive)."""
        total = 0
        stack = [self]
        while stack:
            el = stack.pop()
            for c in el.children:
                if type(c) is TextNode:
                    total += len(c.text.strip()) if strip else len(c.text)
                elif type(c) is Element and c.tag not in RAW_TEXT_ELEMENTS:
                    stack.append(c)
        return total

    def serialized_contents_length(self) -> int:
        """len(self.serialize_contents()) without building the string."""
        total = 0
        for c in self.children:
            total += _node_serialized_length(c)
        return total

    # -- mutation -----------------------------------------------------
    def decompose(self) -> None:
        """Remove this element from its parent and destroy its
        contents (BeautifulSoup ``decompose`` semantics — a decomposed
        node must not yield children afterwards).  The detached
        subtree is ``dissolve``d so it frees by refcount alone: the
        extract hot path runs with the cyclic GC disabled, and
        un-dissolved dead subtrees would pile up until a full
        ``gc.collect``."""
        if self.parent is not None:
            try:
                self.parent.children.remove(self)
            except ValueError:
                pass
        dissolve(self)
        self.children = []

    def clear_children(self) -> None:
        self.children = []

    def copy_tree(self) -> "Element":
        """Deep copy of this subtree (much cheaper than re-parsing the
        serialized HTML — used to give the pruning filter its own
        mutable tree after the scrape kernel ran)."""
        clone = Element(self.tag, dict(self.attrs))
        for child in self.children:
            if isinstance(child, Element):
                sub = child.copy_tree()
                sub.parent = clone
                clone.children.append(sub)
            elif isinstance(child, TextNode):
                clone.children.append(TextNode(child.text, clone))
            else:
                clone.children.append(CommentNode(child.text, clone))
        return clone

    # -- serialization ------------------------------------------------
    def serialize(self) -> str:
        out: list[str] = []
        self._serialize_into(out)
        return "".join(out)

    def serialize_contents(self) -> str:
        out: list[str] = []
        for child in self.children:
            _serialize_node(child, out)
        return "".join(out)

    def _serialize_into(self, out: list) -> None:
        attrs = "".join(
            f' {k}="{escape(v, quote=True)}"' if v is not None else f" {k}"
            for k, v in self.attrs.items()
        )
        if self.tag in VOID_ELEMENTS:
            out.append(f"<{self.tag}{attrs}>")
            return
        out.append(f"<{self.tag}{attrs}>")
        for child in self.children:
            _serialize_node(child, out)
        out.append(f"</{self.tag}>")

    def __repr__(self) -> str:  # pragma: no cover
        return f"Element(<{self.tag}>, {len(self.children)} children)"


def dissolve(node) -> None:
    """Break every parent↔child reference cycle in this subtree so it
    is freed by reference counting alone.  The extract hot path runs
    with the cyclic GC disabled (DOM trees are cycle-rich and the
    collector re-traces them constantly); dissolving dead trees as
    they are dropped keeps worker heaps flat without full collections.
    The subtree stays readable top-down — only ``parent`` pointers are
    cleared — but must be treated as discarded."""
    if type(node) is not Element:
        node.parent = None
        return
    stack = [node]
    while stack:
        el = stack.pop()
        el.parent = None
        for c in el.children:
            if type(c) is Element:
                stack.append(c)
            else:
                c.parent = None


def _escaped_text_length(s: str) -> int:
    # escape(quote=False): & → &amp; (+4), < > → &lt;/&gt; (+3)
    return len(s) + 4 * s.count("&") + 3 * s.count("<") + 3 * s.count(">")


def _escaped_attr_length(s: str) -> int:
    # escape(quote=True): also " → &quot; (+5)
    return _escaped_text_length(s) + 5 * s.count('"')


def _node_serialized_length(node) -> int:
    if type(node) is TextNode:
        parent = node.parent
        if parent is not None and parent.tag in RAW_TEXT_ELEMENTS:
            return len(node.text)
        return _escaped_text_length(node.text)
    if type(node) is CommentNode:
        return len(node.text) + 7  # <!--…-->
    # element
    n = 2 + len(node.tag)  # <tag>
    for k, v in node.attrs.items():
        n += 1 + len(k) + (3 + _escaped_attr_length(v) if v is not None else 0)
    if node.tag in VOID_ELEMENTS:
        return n
    n += 3 + len(node.tag)  # </tag>
    for c in node.children:
        n += _node_serialized_length(c)
    return n


def _serialize_node(node, out: list) -> None:
    if isinstance(node, TextNode):
        parent = node.parent
        if parent is not None and parent.tag in RAW_TEXT_ELEMENTS:
            out.append(node.text)
        else:
            out.append(escape(node.text, quote=False))
    elif isinstance(node, CommentNode):
        out.append(f"<!--{node.text}-->")
    elif isinstance(node, Element):
        node._serialize_into(out)


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Element("[document]")
        self.stack: list[Element] = [self.root]

    # implied end tags, so sloppy real-world HTML nests sanely
    def _implied_close(self, tag: str) -> None:
        if tag in _P_CLOSERS:
            if any(e.tag == "p" for e in reversed(self.stack)):
                self._close_until("p")
        elif tag in _LI_CLOSERS and self.stack[-1].tag == "li":
            self.stack.pop()
        elif tag in _TDTH_CLOSERS and self.stack[-1].tag in ("td", "th"):
            self.stack.pop()
            if tag == "tr" and self.stack[-1].tag == "tr":
                self.stack.pop()
        elif tag in _TR_CLOSERS and self.stack[-1].tag == "tr":
            self.stack.pop()

    def _close_until(self, tag: str) -> None:
        while len(self.stack) > 1:
            top = self.stack.pop()
            if top.tag == tag:
                break

    def handle_starttag(self, tag: str, attrs) -> None:
        self._implied_close(tag)
        attr_dict: dict[str, str] = {}
        for k, v in attrs:
            if k not in attr_dict:
                attr_dict[k] = v if v is not None else ""
        el = Element(tag, attr_dict)
        self.stack[-1].append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag: str, attrs) -> None:
        attr_dict: dict[str, str] = {}
        for k, v in attrs:
            if k not in attr_dict:
                attr_dict[k] = v if v is not None else ""
        self.stack[-1].append(Element(tag, attr_dict))

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_ELEMENTS:
            return
        if any(e.tag == tag for e in self.stack[1:]):
            self._close_until(tag)

    def handle_data(self, data: str) -> None:
        if data:
            self.stack[-1].append(TextNode(data))

    def handle_comment(self, data: str) -> None:
        self.stack[-1].append(CommentNode(data))


def parse(html: str) -> Element:
    """Parse an HTML document/fragment into an Element tree.

    Returns the ``[document]`` pseudo-root; use :func:`body_of` to get
    the effective body element.
    """
    builder = _TreeBuilder()
    try:
        builder.feed(html or "")
        builder.close()
    except AssertionError:
        # stdlib html.parser wart: malformed marked sections
        # ("<![garbage") raise AssertionError from _markupbase.
        # Degrade by escaping the construct and reparsing.
        builder = _TreeBuilder()
        builder.feed((html or "").replace("<![", "&lt;!["))
        builder.close()
    return builder.root


def body_of(root: Element) -> Element:
    """Return the ``<body>`` element, or the document root when the
    fragment has no explicit body (mirrors the reference's
    ``soup.body or wrap-in-body`` fallback,
    ``content_filter_strategy.py:645-647``)."""
    body = root.find("body")
    return body if body is not None else root


def head_of(root: Element) -> Element | None:
    return root.find("head")
