"""XPath-subset engine over the stdlib DOM.

The reference's ``JsonXPathExtractionStrategy``
(``extraction_strategy.py:1797-1889``) delegates to lxml's full XPath;
this sandbox has no lxml, so this module implements the subset of
XPath 1.0 that the reference's schemas, docs and tests actually use,
as a recursive-descent parser + evaluator over
:class:`crawl4ai_custom_ray.html.dom.Element`:

- absolute / relative location paths: ``/a/b``, ``//a``, ``a//b``,
  ``.``, ``..``, wildcard ``*``
- trailing value steps: ``text()`` (concatenated descendant text,
  XPath string-value), ``@attr``
- predicates, combinable and nestable:
  ``[@a]`` ``[@a='v']`` ``[@a!='v']`` ``[text()='v']``
  ``[contains(@a,'v')]`` ``[contains(text(),'v')]``
  ``[starts-with(@a,'v')]`` ``[not(...)]`` ``[expr and expr]``
  ``[expr or expr]`` positional ``[3]`` ``[last()]`` ``[last()-1]``
  ``[position()<=3]`` and nested relative paths ``[b/c]``
- union: ``//a | //b`` (document order, deduplicated)

Positional semantics follow XPath: ``//a[2]`` selects every ``a`` that
is the second ``a`` *among its siblings* (the predicate binds to the
child axis of each context node), not the second match overall.
"""

from __future__ import annotations

import re

from .dom import Element

__all__ = ["xpath_select", "xpath_strings", "XPathError"]


class XPathError(ValueError):
    pass


_TOKEN = re.compile(
    r"""
    \s*(
        //|/|\.\.|\.|\*|\||::|@|\[|\]|\(|\)|,|-|
        !=|<=|>=|=|<|>|
        \d+\.\d+|\d+|
        '[^']*'|"[^"]*"|
        [A-Za-z_][\w.-]*
    )
    """,
    re.VERBOSE,
)


def _tokenize(expr: str) -> list[str]:
    out, pos = [], 0
    while pos < len(expr):
        m = _TOKEN.match(expr, pos)
        if m is None:
            if expr[pos:].strip() == "":
                break
            raise XPathError(f"bad xpath at {expr[pos:]!r}")
        out.append(m.group(1))
        pos = m.end()
    return out


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


class _Step:
    __slots__ = ("axis", "test", "preds")

    def __init__(self, axis: str, test: str, preds: list):
        self.axis = axis  # "child" | "descendant" | "self" | "parent"
        self.test = test  # tag name | "*" | "text()" | "@name"
        self.preds = preds


class _Path:
    __slots__ = ("absolute", "steps")

    def __init__(self, absolute: bool, steps: list[_Step]):
        self.absolute = absolute
        self.steps = steps


class _Parser:
    def __init__(self, expr: str):
        self.toks = _tokenize(expr)
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        tok = self.peek()
        if tok is None:
            raise XPathError("unexpected end of xpath")
        self.i += 1
        return tok

    def expect(self, tok: str) -> None:
        got = self.next()
        if got != tok:
            raise XPathError(f"expected {tok!r}, got {got!r}")

    # union := path ('|' path)*
    def parse_union(self) -> list[_Path]:
        paths = [self.parse_path()]
        while self.peek() == "|":
            self.next()
            paths.append(self.parse_path())
        if self.peek() is not None:
            raise XPathError(f"trailing tokens at {self.toks[self.i:]!r}")
        return paths

    def parse_path(self, in_predicate: bool = False) -> _Path:
        absolute = False
        steps: list[_Step] = []
        axis = "child"
        tok = self.peek()
        if tok == "/":
            absolute = True
            self.next()
        elif tok == "//":
            absolute = True
            axis = "descendant"
            self.next()
        while True:
            steps.append(self.parse_step(axis))
            tok = self.peek()
            if tok == "/":
                axis = "child"
                self.next()
            elif tok == "//":
                axis = "descendant"
                self.next()
            else:
                break
        return _Path(absolute, steps)

    def parse_step(self, axis: str) -> _Step:
        tok = self.next()
        if tok == ".":
            return _Step("self", "*", [])
        if tok == "..":
            return _Step("parent", "*", [])
        if tok == "@":
            return _Step(axis, "@" + self.next(), [])
        if tok == "*":
            test = "*"
        elif re.fullmatch(r"[A-Za-z_][\w.-]*", tok):
            if self.peek() == "(":  # text() / node()
                self.next()
                self.expect(")")
                if tok == "text":
                    test = "text()"
                elif tok == "node":
                    test = "*"
                else:
                    raise XPathError(f"unsupported node test {tok}()")
            elif self.peek() == "::":
                self.next()
                axis_name = tok
                if axis_name not in ("child", "descendant", "self", "parent"):
                    raise XPathError(f"unsupported axis {axis_name}")
                return self.parse_step(
                    "descendant" if axis_name == "descendant" else axis_name
                )
            else:
                test = tok
        else:
            raise XPathError(f"unexpected token {tok!r}")
        preds = []
        while self.peek() == "[":
            self.next()
            preds.append(self.parse_expr())
            self.expect("]")
        return _Step(axis, test, preds)

    # expr := and_expr ('or' and_expr)*
    def parse_expr(self):
        node = self.parse_and()
        while self.peek() == "or":
            self.next()
            node = ("or", node, self.parse_and())
        return node

    def parse_and(self):
        node = self.parse_cmp()
        while self.peek() == "and":
            self.next()
            node = ("and", node, self.parse_cmp())
        return node

    def parse_cmp(self):
        left = self.parse_primary()
        tok = self.peek()
        if tok in ("=", "!=", "<", "<=", ">", ">="):
            self.next()
            return (tok, left, self.parse_primary())
        return left

    def parse_primary(self):
        tok = self.peek()
        if tok is None:
            raise XPathError("unexpected end in predicate")
        if tok[0] in "'\"":
            self.next()
            return ("lit", tok[1:-1])
        if re.fullmatch(r"\d+(\.\d+)?", tok):
            self.next()
            return ("num", float(tok))
        if tok == "@":
            self.next()
            return ("attr", self.next())
        if tok == "(":
            self.next()
            inner = self.parse_expr()
            self.expect(")")
            return inner
        # function or relative-path existence test
        if re.fullmatch(r"[A-Za-z_][\w.-]*", tok):
            save = self.i
            name = self.next()
            if self.peek() == "(":
                self.next()
                if name in ("last", "position", "text"):
                    self.expect(")")
                    if name == "text":
                        return ("text",)
                    node = (name,)
                    # last()-1 arithmetic
                    if self.peek() == "-":
                        self.next()
                        n = self.next()
                        node = ("sub", node, ("num", float(n)))
                    return node
                if name in ("contains", "starts-with"):
                    a = self.parse_primary()
                    self.expect(",")
                    b = self.parse_primary()
                    self.expect(")")
                    return (name, a, b)
                if name == "not":
                    inner = self.parse_expr()
                    self.expect(")")
                    return ("not", inner)
                if name == "normalize-space":
                    inner = self.parse_primary() if self.peek() != ")" else ("text",)
                    self.expect(")")
                    return ("normalize-space", inner)
                if name == "count":
                    path = self.parse_path(in_predicate=True)
                    self.expect(")")
                    return ("count", path)
                raise XPathError(f"unsupported function {name}()")
            # not a function: back up, parse as relative path existence
            self.i = save
        path = self.parse_path(in_predicate=True)
        return ("path", path)


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------


def _string_value(node: Element) -> str:
    return node.get_text()


def _children_elements(node: Element) -> list[Element]:
    return [c for c in node.children if type(c) is Element]


def _descendants_or_self(node: Element) -> list[Element]:
    out = []
    stack = [node]
    while stack:
        el = stack.pop()
        out.append(el)
        ch = _children_elements(el)
        for i in range(len(ch) - 1, -1, -1):
            stack.append(ch[i])
    return out


class _Evaluator:
    def __init__(self, root: Element):
        self.root = root
        self._order: dict[int, int] = {}
        for i, el in enumerate(_descendants_or_self(root)):
            self._order[id(el)] = i

    def doc_sort(self, nodes: list[Element]) -> list[Element]:
        seen: set[int] = set()
        uniq = []
        for n in nodes:
            if id(n) not in seen:
                seen.add(id(n))
                uniq.append(n)
        uniq.sort(key=lambda n: self._order.get(id(n), 1 << 60))
        return uniq

    def select(self, paths: list[_Path], context: Element):
        """Evaluate a union of paths → list of Elements or, when a
        path ends in ``text()``/``@attr``, list of strings."""
        elem_results: list[Element] = []
        str_results: list[str] = []
        for path in paths:
            res = self.eval_path(path, context)
            for r in res:
                if isinstance(r, str):
                    str_results.append(r)
                else:
                    elem_results.append(r)
        if str_results and not elem_results:
            return str_results
        if elem_results and str_results:
            raise XPathError("mixed element/string union unsupported")
        return self.doc_sort(elem_results)

    def eval_path(self, path: _Path, context: Element):
        nodes: list = [self.root if path.absolute else context]
        for step in path.steps:
            nodes = self.eval_step(step, nodes)
            if not nodes:
                return []
        return nodes

    def eval_step(self, step: _Step, contexts: list):
        test = step.test
        if test.startswith("@"):
            name = test[1:]
            out = []
            for ctx in contexts:
                if isinstance(ctx, Element):
                    if step.axis == "descendant":
                        for el in _descendants_or_self(ctx):
                            v = el.get(name)
                            if v is not None:
                                out.append(v)
                    else:
                        v = ctx.get(name)
                        if v is not None:
                            out.append(v)
            return out
        if test == "text()":
            out = []
            for ctx in contexts:
                if not isinstance(ctx, Element):
                    continue
                if step.axis == "descendant":
                    s = ctx.get_text()
                    if s:
                        out.append(s)
                else:
                    from .dom import TextNode

                    for c in ctx.children:
                        if isinstance(c, TextNode) and c.text:
                            out.append(c.text)
            return out

        out: list[Element] = []
        for ctx in contexts:
            if not isinstance(ctx, Element):
                continue
            if step.axis == "self":
                groups = [[ctx]]
            elif step.axis == "parent":
                groups = [[ctx.parent]] if isinstance(ctx.parent, Element) else []
            elif step.axis == "child":
                groups = [
                    [
                        c
                        for c in _children_elements(ctx)
                        if test == "*" or c.tag == test
                    ]
                ]
            else:  # descendant(-or-self)//child::test — group per parent
                groups = []
                for anc in _descendants_or_self(ctx):
                    g = [
                        c
                        for c in _children_elements(anc)
                        if test == "*" or c.tag == test
                    ]
                    if g:
                        groups.append(g)
            for group in groups:
                sel = group
                for pred in step.preds:
                    sel = self._apply_pred(pred, sel)
                    if not sel:
                        break
                out.extend(sel)
        return self.doc_sort(out)

    def _apply_pred(self, pred, group: list[Element]) -> list[Element]:
        n = len(group)
        kept = []
        for pos, node in enumerate(group, start=1):
            v = self._eval_expr(pred, node, pos, n)
            if isinstance(v, float):
                if pos == int(v):
                    kept.append(node)
            elif v:
                kept.append(node)
        return kept

    def _eval_expr(self, expr, node: Element, pos: int, size: int):
        op = expr[0]
        if op == "lit":
            return expr[1]
        if op == "num":
            return expr[1]
        if op == "attr":
            # node-set semantics: [] when absent, [value] when present
            # — an attribute existing with value "" is still a
            # non-empty node-set (truthy), unlike Python "" truthiness
            v = node.get(expr[1])
            return [] if v is None else [v]
        if op == "text":
            # child::text() node-set (all child text nodes verbatim);
            # string(node-set) = first node's value, comparisons are
            # any-node semantics — both handled downstream
            from .dom import TextNode

            return [c.text for c in node.children if isinstance(c, TextNode)]
        if op == "last":
            return float(size)
        if op == "position":
            return float(pos)
        if op == "sub":
            a = self._eval_expr(expr[1], node, pos, size)
            b = self._eval_expr(expr[2], node, pos, size)
            return float(a) - float(b)
        if op == "and":
            return bool(self._truth(self._eval_expr(expr[1], node, pos, size), pos)) and bool(
                self._truth(self._eval_expr(expr[2], node, pos, size), pos)
            )
        if op == "or":
            return bool(self._truth(self._eval_expr(expr[1], node, pos, size), pos)) or bool(
                self._truth(self._eval_expr(expr[2], node, pos, size), pos)
            )
        if op == "not":
            return not self._truth(self._eval_expr(expr[1], node, pos, size), pos)
        if op in ("contains", "starts-with"):
            a = self._as_str(self._eval_expr(expr[1], node, pos, size))
            b = self._as_str(self._eval_expr(expr[2], node, pos, size))
            if a is None or b is None:
                return False
            return a.startswith(b) if op == "starts-with" else (b in a)
        if op == "normalize-space":
            s = self._as_str(self._eval_expr(expr[1], node, pos, size))
            return " ".join(s.split()) if s is not None else ""
        if op == "count":
            return float(len(self.eval_path(expr[1], node)))
        if op == "path":
            return self.eval_path(expr[1], node)
        if op in ("=", "!=", "<", "<=", ">", ">="):
            a = self._eval_expr(expr[1], node, pos, size)
            b = self._eval_expr(expr[2], node, pos, size)
            return self._compare(op, a, b)
        raise XPathError(f"unsupported expression {expr!r}")

    @staticmethod
    def _as_str(v):
        if v is None:
            return None
        if isinstance(v, list):
            if not v:
                return None
            first = v[0]
            return first if isinstance(first, str) else _string_value(first)
        if isinstance(v, float):
            return str(int(v)) if v == int(v) else str(v)
        return v

    @staticmethod
    def _truth(v, pos: int):
        if isinstance(v, float):
            return pos == int(v)
        if isinstance(v, list):
            return bool(v)
        return bool(v)

    def _compare(self, op, a, b):
        # node-set comparisons: true if ANY node satisfies (XPath 1.0)
        if isinstance(a, list):
            return any(self._compare(op, self._node_str(x), b) for x in a)
        if isinstance(b, list):
            return any(self._compare(op, a, self._node_str(x)) for x in b)
        if a is None or b is None:
            # an absent attribute is an empty node-set: every
            # comparison against it is false in XPath 1.0 (incl. !=)
            return False
        if isinstance(a, float) or isinstance(b, float):
            try:
                a_f, b_f = float(a), float(b)
            except (TypeError, ValueError):
                return op == "!="
            a, b = a_f, b_f
        if op == "=":
            return a == b
        if op == "!=":
            return a != b
        if op == "<":
            return a < b
        if op == "<=":
            return a <= b
        if op == ">":
            return a > b
        return a >= b

    @staticmethod
    def _node_str(x):
        return x if isinstance(x, str) else _string_value(x)


def xpath_select(root: Element, expr: str, context: Element | None = None):
    """Evaluate ``expr`` from ``context`` (default: root).  Returns a
    doc-ordered list of Elements, or a list of strings when the path
    ends in ``text()`` / ``@attr``."""
    paths = _Parser(expr).parse_union()
    return _Evaluator(root).select(paths, context if context is not None else root)


def xpath_strings(root: Element, expr: str) -> list[str]:
    res = xpath_select(root, expr)
    return [r if isinstance(r, str) else r.get_text() for r in res]
