"""Regex-based HTML tokenizer — a faster front end for the DOM builder.

Produces the same Element tree as the ``html.parser`` path in
:mod:`.dom` for well-formed-ish web HTML: start/end tags with quoted
or bare attributes, entity conversion in text and attribute values,
comments, doctype/PI skipping, raw-text ``<script>``/``<style>``
content, and the same implied-close handling (delegated to the shared
``_TreeBuilder`` logic).

Used by :func:`parse_fast`; equivalence against the stdlib tokenizer
is enforced by differential tests (whole synthetic corpus + fixtures +
hypothesis random inputs).  Inputs the tokenizer cannot handle fall
back to the stdlib parser per-document.
"""

from __future__ import annotations

import re
from html import unescape

from .dom import Element, RAW_TEXT_ELEMENTS, VOID_ELEMENTS, TextNode, CommentNode, _TreeBuilder

# tag/attr-name interning: one shared str object per distinct name —
# identity-fast dict/set ops in the hot tree-builder path
from sys import intern

_RAW_CLOSE_RE = {
    t: re.compile(rf"</\s*{t}\s*>", re.I) for t in RAW_TEXT_ELEMENTS
}

# One token per match: comment | declaration/PI | end tag | start tag
_TOKEN_RE = re.compile(
    r"<!--(?P<comment>.*?)-->"
    r"|<!(?P<decl>[^>]*)>"
    r"|<\?(?P<pi>[^>]*)>"
    r"|</(?P<end>[a-zA-Z][a-zA-Z0-9:._-]*)[ \t\n\r\f]*>"
    r"|<(?P<start>[a-zA-Z][a-zA-Z0-9:._-]*)(?P<attrs>(?:[ \t\n\r\f]+[a-zA-Z_:@][\w:.@-]*(?:[ \t\n\r\f]*=++[ \t\n\r\f]*(?:\"[^\"]*\"|'[^']*'|(?![\"'])[^ \t\n\r\f>]*))?)*)[ \t\n\r\f]*(?P<selfclose>/?)>",
    re.S,
)

# stdlib attrfind_tolerant accepts runs of '=' between name and value
_ATTR_RE = re.compile(
    r"([a-zA-Z_:@][\w:.@-]*)"
    r"(?:[ \t\n\r\f]*=++[ \t\n\r\f]*(\"[^\"]*\"|'[^']*'|(?![\"'])[^ \t\n\r\f>]*))?"
)

_AMP_RE = re.compile(r"&")


def _unescape(s: str) -> str:
    # fast path: no entities at all
    if "&" not in s:
        return s
    return unescape(s)


def _parse_attrs(raw: str) -> list[tuple[str, str | None]]:
    if not raw or raw.isspace():
        return []
    out = []
    covered_end = 0
    for m in _ATTR_RE.finditer(raw):
        if raw[covered_end : m.start()].strip():
            # junk between attributes the regex skipped — silent
            # divergence risk; force the stdlib fallback
            raise _Unsupported(f"unparsed attr fragment: {raw[covered_end:m.start()]!r}")
        covered_end = m.end()
        name = intern(m.group(1).lower())
        value = m.group(2)
        if value is None:
            out.append((name, None))
            continue
        if value and value[0] in "\"'" and len(value) >= 2 and value[-1] == value[0]:
            value = value[1:-1]
        out.append((name, _unescape(value)))
    if raw[covered_end:].strip():
        raise _Unsupported(f"unparsed attr tail: {raw[covered_end:]!r}")
    return out


class _Unsupported(Exception):
    pass


def tokenize_into(builder: _TreeBuilder, html: str) -> None:
    """Drive the shared tree builder with regex tokens.  Raises
    :class:`_Unsupported` for constructs the fast path doesn't cover
    (caller falls back to html.parser)."""
    pos = 0
    n = len(html)
    while pos < n:
        lt = html.find("<", pos)
        if lt == -1:
            text = html[pos:]
            if text:
                builder.handle_data(_unescape(text))
            break
        if lt > pos:
            builder.handle_data(_unescape(html[pos:lt]))
        m = _TOKEN_RE.match(html, lt)
        if m is None:
            # stray '<' — html.parser treats an unmatchable '<' as text
            # only in specific cases; bail to the reference tokenizer
            raise _Unsupported(f"unparseable tag at {lt}")
        if m.group("comment") is not None:
            builder.handle_comment(m.group("comment"))
        elif m.group("decl") is not None:
            if html.startswith("<!--", lt):
                # unterminated comment: stdlib degrades it to text at
                # EOF — out of fast-path scope
                raise _Unsupported(f"unterminated comment at {lt}")
            decl = m.group("decl")
            low = decl.lstrip().lower()
            if low.startswith("doctype") or low.startswith("[cdata["):
                pass  # handle_decl / unknown_decl: skipped (as builder)
            elif low.startswith(("[if", "[else", "[endif")):
                pass  # marked sections: unknown_decl, skipped
            elif low.startswith("["):
                # stdlib raises on malformed marked sections; dom.parse
                # degrades them to literal text — mirror that
                builder.handle_data("<!" + decl + ">")
            else:
                # stdlib "bogus comment": <!x> → comment('x')
                builder.handle_comment(decl)
        elif m.group("pi") is not None:
            pass  # processing instruction: skipped (as builder)
        elif m.group("end") is not None:
            builder.handle_endtag(intern(m.group("end").lower()))
        else:
            tag = intern(m.group("start").lower())
            attrs = _parse_attrs(m.group("attrs"))
            if m.group("selfclose"):
                builder.handle_startendtag(tag, attrs)
            else:
                builder.handle_starttag(tag, attrs)
                if tag in RAW_TEXT_ELEMENTS:
                    # raw-text mode, mirroring this stdlib's CDATA
                    # handling exactly (html/parser.py
                    # set_cdata_mode): content runs to the first
                    # '</\s*tag\s*>' (lax whitespace, case-insensitive)
                    # which always closes the element; an unterminated
                    # raw-text element DROPS all remaining input — no
                    # data, no end tag (goahead breaks in cdata mode
                    # and the end-of-feed flush skips cdata).
                    close = _RAW_CLOSE_RE[tag]
                    cm = close.search(html, m.end())
                    if cm is None:
                        pos = n
                        continue
                    raw = html[m.end() : cm.start()]
                    if raw:
                        builder.handle_data(raw)
                    builder.handle_endtag(tag)
                    pos = cm.end()
                    continue
        pos = m.end()


def parse_fast(html: str) -> Element:
    """Parse with the regex tokenizer; fall back to the stdlib path on
    anything the fast path can't tokenize."""
    builder = _TreeBuilder()
    try:
        tokenize_into(builder, html or "")
        return builder.root
    except _Unsupported:
        from .dom import parse as _slow_parse

        return _slow_parse(html)
