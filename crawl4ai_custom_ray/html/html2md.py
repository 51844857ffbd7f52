"""Event-driven HTML → markdown machine, byte-compatible with the
reference's vendored html2text fork as configured by
``DefaultMarkdownGenerator``.

The reference converts cleaned HTML with ``CustomHTML2Text``
(``crawl4ai/html2text/__init__.py:1035-1150`` subclassing the fork's
``HTML2Text`` at ``:37-1024``) under the generator defaults of
``markdown_generation_strategy.py:181-204``: ``body_width=0``,
``single_line_break=True``, ``mark_code=True``, inline links, no
snob escaping — plus ``CustomHTML2Text.__init__``'s own
``ignore_mailto_links=True`` / ``skip_internal_links=False`` and the
generator's fence-dedent post-replace at ``:214``.

This module is a from-scratch implementation of that *observable
behavior* for that fixed configuration (it is NOT a copy of the fork:
the fork threads ~30 config flags and Google-Docs style tracking
through one 500-line ``handle_tag``; here the fixed config is baked in
and tags dispatch to small handlers).  Behavioral notes that matter
for byte parity, all verified against the importable fork in
``tests/test_md_parity.py``:

- whitespace collapses *per data event* (``o(puredata=True)``), with a
  leading space deferred to a flag so it is dropped after newlines;
- entities are translated through the fork's ASCII ``UNIFIABLE`` table
  (``config.py:115-154``) — ``&rsquo;`` → ``'``, ``&mdash;`` → ``--``,
  ``&nbsp;`` → placeholder, replaced by a plain space at the end —
  while numeric charrefs use ``unifiable_n`` (``utils.py:6-10``);
- only backslashes are markdown-escaped in running text
  (``escape_md_section`` with the generator's flags — dot/plus/dash
  and snob escaping are all off), while link/image URLs, titles and
  alt text get ``escape_md`` (backslash, brackets, parens);
- ``<pre>`` emits ``` fences and raw content, ``<code>`` emits
  backtick spans (newlines → spaces) — the Custom subclass intercepts
  both, so the base class's ``[code]`` markers never fire;
- ``<em>``/``<strong>``/``<del>`` trim inner whitespace and re-insert
  a separating space ("stressed" tracking) so ``a<em>b</em>`` renders
  as ``a _b_``;
- an ``<a href>`` whose entire content equals its absolute href
  renders as ``<href>`` (automatic link);
- block breaks are *pending* newline counts flushed lazily before the
  next output, so trailing breaks never print and a blockquote prefix
  attaches to each pending newline.
"""

from __future__ import annotations

import html.entities
import html.parser
import re
from urllib.parse import urljoin

__all__ = ["MarkdownMachine", "convert_html", "convert_tree"]

# ASCII replacements for named entities — required output semantics,
# reference config.py:115-154.
UNIFIABLE = {
    "rsquo": "'",
    "lsquo": "'",
    "rdquo": '"',
    "ldquo": '"',
    "copy": "(C)",
    "mdash": "--",
    "nbsp": " ",
    "rarr": "->",
    "larr": "<-",
    "middot": "*",
    "ndash": "-",
    "oelig": "oe",
    "aelig": "ae",
    "agrave": "a",
    "aacute": "a",
    "acirc": "a",
    "atilde": "a",
    "auml": "a",
    "aring": "a",
    "egrave": "e",
    "eacute": "e",
    "ecirc": "e",
    "euml": "e",
    "igrave": "i",
    "iacute": "i",
    "icirc": "i",
    "iuml": "i",
    "ograve": "o",
    "oacute": "o",
    "ocirc": "o",
    "otilde": "o",
    "ouml": "o",
    "ugrave": "u",
    "uacute": "u",
    "ucirc": "u",
    "uuml": "u",
    "lrm": "",
    "rlm": "",
}

# Same placeholder string as the fork (init mutates UNIFIABLE["nbsp"]);
# using the identical token keeps even pathological inputs byte-equal.
_NBSP_TOKEN = "&nbsp_place_holder;"

# codepoint → ascii for numeric charrefs (reference utils.py:6-10)
_UNIFIABLE_CP = {
    html.entities.name2codepoint[name]: repl
    for name, repl in UNIFIABLE.items()
    if name != "nbsp"
}

_WS_RUN = re.compile(r"\s+")
# escape_md_section with only backslash escaping on (utils.py:219-220,
# config.py:105-113): a backslash followed by an md-special char
_BSLASH = re.compile(r"(\\)(?=[\\`*_{}\[\]()#+\-.!])")
# the snob escape class (reference config.py RE_MD_CHARS_MATCHER_ALL)
_SNOB_CHARS = re.compile(r"([`\*_{}\[\]\(\)#!])")
# escape_md_section's optional line-start escapes (config.py:77-104)
_DOT_MATCHER = re.compile(r"^(\s*\d+)(\.)(?=\s)", re.MULTILINE)
_PLUS_MATCHER = re.compile(r"^(\s*)(\+)(?=\s)", re.MULTILINE)
_DASH_MATCHER = re.compile(r"^(\s*)(-)(?=\s|\-)", re.MULTILINE)
# optwrap helpers (reference config.py:64-75; RE_SPACE's r"\s\+" quirk
# is intentional — see MarkdownMachine._optwrap)
_RE_SPACE = re.compile(r"\s\+")
_RE_LINK = re.compile(r"(\[.*?\] ?\(.*?\))|(\[.*?\]:.*?)")
_RE_TABLE = re.compile(r" \| ")
_RE_OL_ITEM = re.compile(r"\d+\.\s")
_RE_UL_ITEM = re.compile(r"[-\*\+]\s")


# pad_tables plumbing (fork config.py:7, utils.py:237-305): tables are
# bracketed with a marker tag in the stream, then a padding pass
# column-aligns the cells and strips the markers
_TABLE_MARKER = "special_marker_for_table_padding"


def _reformat_table(lines: list[str], right_margin: int) -> list[str]:
    max_width = [len(x.rstrip()) + right_margin for x in lines[0].split("|")]
    max_cols = len(max_width)
    for line in lines:
        cols = [x.rstrip() for x in line.split("|")]
        num_cols = len(cols)
        if num_cols < max_cols:
            cols += [""] * (max_cols - num_cols)
        elif max_cols < num_cols:
            max_width += [
                len(x) + right_margin for x in cols[-(num_cols - max_cols):]
            ]
            max_cols = num_cols
        max_width = [
            max(len(x) + right_margin, old) for x, old in zip(cols, max_width)
        ]
    out = []
    for line in lines:
        cols = [x.rstrip() for x in line.split("|")]
        if set(line.strip()) == set("-|"):
            cells = [x + "-" * (m - len(x)) for x, m in zip(cols, max_width)]
            out.append("|-" + "|".join(cells) + "|")
        else:
            cells = [x + " " * (m - len(x)) for x, m in zip(cols, max_width)]
            out.append("| " + "|".join(cells) + "|")
    return out


def _pad_tables_in_text(text: str, right_margin: int = 1) -> str:
    lines = text.split("\n")
    buf: list[str] = []
    started = False
    out = []
    for line in lines:
        if _TABLE_MARKER in line:
            started = not started
            if not started:
                out.extend(_reformat_table(buf, right_margin))
                buf = []
                out.append("")
            continue
        (buf if started else out).append(line)
    return "\n".join(out)


def _skipwrap(
    para: str,
    wrap_links: bool = True,
    wrap_list_items: bool = False,
    wrap_tables: bool = False,
) -> bool:
    """The fork's utils.skipwrap (utils.py:162-196); defaults are the
    generator's (wrap_links=True, wrap_list_items=False,
    wrap_tables=False)."""
    if not wrap_links and _RE_LINK.search(para):
        return True
    if para[0:4] == "    " or para[0:1] == "\t":
        return True  # code block
    stripped = para.lstrip()
    if stripped[0:2] == "--" and len(stripped) > 2 and stripped[2] != "-":
        return False  # emdash
    if stripped[0:1] in ("-", "*") and not stripped[0:2] == "**":
        return not wrap_list_items
    if not wrap_tables and _RE_TABLE.search(para):
        return True
    return bool(_RE_OL_ITEM.match(stripped) or _RE_UL_ITEM.match(stripped))
# escape_md (utils.py:199-204): backslash, brackets, parens
_MD_CHARS = re.compile(r"([\\\[\]\(\)])")
_ABS_URL = re.compile(r"^[a-zA-Z+]+://")
# first char that keeps text attached after a stressed span
_STRESS_JOIN = re.compile(r"[^][(){}\s.!?]")

_HEADER_LEVEL = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}

# punctuation/whitespace sets for the em-space heuristics
import string as _string

_WS_CHARS = _string.whitespace
_PUNCT_CHARS = _string.punctuation


def _escape_md(text: str) -> str:
    # fast path: most urls/titles contain none of \ [ ] ( )
    if (
        "\\" not in text
        and "[" not in text
        and "]" not in text
        and "(" not in text
        and ")" not in text
    ):
        return text
    return _MD_CHARS.sub(r"\\\1", text)


_JOIN_CACHE: dict = {}


def _urljoin(base: str, url: str) -> str:
    """urljoin with a bounded cache — pages repeat hrefs and every
    page in a site shares the base, so stdlib's parse cost dominates
    the anchor path without this."""
    key = (base, url)
    hit = _JOIN_CACHE.get(key)
    if hit is None:
        if len(_JOIN_CACHE) > 65536:
            _JOIN_CACHE.clear()
        hit = _JOIN_CACHE[key] = urljoin(base, url)
    return hit


class MarkdownMachine:
    """Feed ``start_tag`` / ``end_tag`` / ``text`` / ``entity`` /
    ``charref`` events, then call ``result()``.  One document per
    instance."""

    def __init__(
        self,
        baseurl: str = "",
        *,
        ignore_links: bool = False,
        ignore_images: bool = False,
        escape_snob: bool = False,
        body_width: int = 0,
        mark_code: bool = True,
        ignore_emphasis: bool = False,
        emphasis_mark: str = "_",
        strong_mark: str = "**",
        ul_item_mark: str = "*",
        skip_internal_links: bool = False,
        ignore_mailto_links: bool = True,
        protect_links: bool = False,
        images_to_alt: bool = False,
        images_with_size: bool = False,
        images_as_html: bool = False,
        default_image_alt: str = "",
        open_quote: str = '"',
        close_quote: str = '"',
        include_sup_sub: bool = False,
        ignore_tables: bool = False,
        bypass_tables: bool = False,
        unicode_snob: bool = False,
        use_automatic_links: bool = True,
        single_line_break: bool = True,
        escape_dot: bool = False,
        escape_plus: bool = False,
        escape_dash: bool = False,
        escape_backslash: bool = False,
        preserve_tags=(),
        handle_code_in_pre: bool = False,
        pad_tables: bool = False,
        wrap_links: bool = True,
        wrap_list_items: bool = False,
        wrap_tables: bool = False,
        inline_links: bool = True,
        links_each_paragraph: bool = False,
    ):
        self.baseurl = baseurl
        # The html2text knobs a DefaultMarkdownGenerator user sets via
        # options={...} (reference
        # markdown_generation_strategy.py:181-204 merging into the
        # fork's flags at html2text/__init__.py:37-150).  Defaults are
        # the CustomHTML2Text + generator-default values
        # (html2text/__init__.py:1047-1059).  Each flag is
        # differential-tested against the importable fork in
        # tests/test_md_parity.py::test_option_configs_byte_equal.
        self.ignore_links = ignore_links  # fork :511 skips the whole a-branch
        self.ignore_images = ignore_images  # fork :556, and :325 un-exempts img
        self.escape_snob = escape_snob  # utils.escape_md_section snob pass
        self.body_width = body_width  # fork optwrap (:964-1024)
        # mark_code is accepted for interface parity but has no effect:
        # CustomHTML2Text intercepts <pre> before the base handler, so
        # the base class's [code]/[/code] markers are unreachable under
        # the reference's own subclass too (verified byte-equal in the
        # parity suite with mark_code flipped).
        self.mark_code = mark_code
        self.ignore_emphasis = ignore_emphasis  # fork :422, :443
        self.emphasis_mark = emphasis_mark  # fork :434-437
        self.strong_mark = strong_mark  # fork :451-460
        self.ul_item_mark = ul_item_mark  # fork :674, optwrap :988
        self.skip_internal_links = skip_internal_links  # fork :517
        self.ignore_mailto_links = ignore_mailto_links  # fork :519 (Custom default True, :1053)
        self.protect_links = protect_links  # fork :525-526 wraps href in <>
        self.images_to_alt = images_to_alt  # fork :558, :581, :595
        self.images_with_size = images_with_size  # fork :565
        self.images_as_html = images_as_html  # fork :564
        self.default_image_alt = default_image_alt  # fork :560
        self.open_quote = open_quote  # fork :501
        self.close_quote = close_quote  # fork :503
        self.include_sup_sub = include_sup_sub  # fork :745
        self.ignore_tables = ignore_tables  # fork :681-688
        self.bypass_tables = bypass_tables  # fork :690-702
        self.unicode_snob = unicode_snob  # fork :933, :942, :176
        self.use_automatic_links = use_automatic_links  # fork :906
        self.single_line_break = single_line_break  # fork p() :760
        self.escape_dot = escape_dot  # escape_md_section dot pass
        self.escape_plus = escape_plus
        self.escape_dash = escape_dash
        # escape_backslash is accepted for interface parity but has no
        # effect: the fork's handle_data (:916-923) never forwards the
        # instance flag to escape_md_section, whose default True makes
        # the backslash pass unconditionally live — replicated as-is.
        self.escape_backslash = escape_backslash
        # CustomHTML2Text's preserved-tag passthrough + pre/code knob
        # (:1071-1134): preserved subtrees re-serialize as raw HTML
        self.preserve_tags = set(preserve_tags)
        self.handle_code_in_pre = handle_code_in_pre
        self.pad_tables = pad_tables  # fork :708-716, padding pass :158
        self.wrap_links = wrap_links  # optwrap skipwrap flags
        self.wrap_list_items = wrap_list_items  # (utils.py:162-196)
        self.wrap_tables = wrap_tables
        # reference-style links (fork :547-553, :605-611, flush at
        # :843-868): [text][n] markers with "   [n]: url (title)"
        # definition lines flushed at document end (or per paragraph
        # with links_each_paragraph under single_line_break=False)
        self.inline_links = inline_links
        self.links_each_paragraph = links_each_paragraph
        self.ref_links: list[dict] = []  # {attrs, count, outcount}
        self.acount = 0
        self.emit_count = 0  # the fork's outcount
        self.preserve_depth = 0
        self.preserved_content: list[str] = []
        self.current_preserved_tag: str | None = None
        self._out: list[str] = []
        self._ends_nl = False  # last pushed fragment ended with \n
        self.at_start = True  # suppress leading breaks/space
        self.breaks = 0  # pending newline count (the fork's p_p)
        self.sp = False  # pending single space
        self.quiet = 0  # head/script/style suppression depth
        self.bq = 0  # blockquote depth
        self.lists: list[list] = []  # [kind, counter] stack
        self.after_list = False  # previous tag event was ol/ul
        self.br_suffix = ""  # "  " once a soft break is pending
        self.cur_tag = ""
        # links
        self.link_stack: list[dict | None] = []
        self.auto_href: str | None = None  # candidate automatic link
        self.link_empty = False
        self.in_link = False
        # code / pre
        self.fence = False  # inside <pre> (Custom fences)
        self.span_code = False  # inside <code> span (Custom)
        self.tick_open = False  # base-class backtick toggle (kbd/tt,
        # and code-inside-link)
        # emphasis spacing
        self.stressed = False
        self.post_stressed = False
        self.last_data = ""
        # misc
        self.in_header = False
        self.style_depth = 0
        self.quote_open = False
        self.abbr_text: str | None = None
        self.abbr_title: str | None = None
        self.abbr_defs: dict[str, str] = {}
        # tables
        self.cell_sep = False  # "| " before the next td/th
        self.cell_count = 0
        self.header_row = False  # first tr of a table pending underline

    # ------------------------------------------------------------------
    # output core — the fork's o() (:766-876) specialized to the fixed
    # config (never in base-class pre mode, google_doc off, inline
    # links so the reference-link queue is always empty)
    # ------------------------------------------------------------------
    def _push(self, s: str) -> None:
        self._out.append(s)
        if s:
            self._ends_nl = s.endswith("\n")

    def emit(self, data: str, collapse: bool = False, force=False) -> None:
        if self.abbr_text is not None:
            self.abbr_text += data
        if self.quiet:
            return
        pending_breaks = self.breaks  # the fork reads p_p at the
        # ref-link flush point before resetting it
        if collapse:
            # C-speed fast path: an ASCII chunk with no \t\n\r\f\v and
            # no double space has no whitespace run to collapse (the
            # regex would be the identity).  Non-ASCII text may hold
            # exotic Unicode whitespace that \s matches — regex path.
            if (
                not data.isascii()
                or "\n" in data
                or "\t" in data
                or "  " in data
                or "\r" in data
                or "\x0b" in data
                or "\x0c" in data
            ):
                data = _WS_RUN.sub(" ", data)
            if data and data[0] == " ":
                self.sp = True
                data = data[1:]
        if not data and not force:
            return
        prefix = ">" * self.bq
        if not (force and data and data[0] == ">") and self.bq:
            prefix += " "
        if self.at_start:
            self.sp = False
            self.breaks = 0
            self.at_start = False
        if force == "end":
            self.breaks = 0
            self._push("\n")
            self.sp = False
        if self.breaks:
            self._push((self.br_suffix + "\n" + prefix) * self.breaks)
            self.sp = False
            self.br_suffix = ""
        if self.sp:
            if not self._ends_nl:
                self._push(" ")
            self.sp = False
        if self.ref_links and (
            (pending_breaks == 2 and self.links_each_paragraph) or force == "end"
        ):
            # fork o() :843-868 — definition lines bypass blockquote
            # prefixing (raw self.out) and URLs/titles are NOT
            # md-escaped, unlike the inline renderer
            if force == "end":
                self._push("\n")
            newa = []
            for link in self.ref_links:
                if self.emit_count > link["outcount"]:
                    self._push(
                        "   ["
                        + str(link["count"])
                        + "]: "
                        + _urljoin(self.baseurl, link["attrs"].get("href") or "")
                    )
                    if link["attrs"].get("title") is not None:
                        self._push(" (" + link["attrs"]["title"] + ")")
                    self._push("\n")
                else:
                    newa.append(link)
            if self.ref_links != newa:
                self._push("\n")
            self.ref_links = newa
        if self.abbr_defs and force == "end":
            for term, definition in self.abbr_defs.items():
                self._push("  *[" + term + "]: " + definition + "\n")
        self.breaks = 0
        self._push(data)
        self.emit_count += 1

    def _want_break(self) -> None:
        # pbr(): at most one pending newline
        if self.breaks == 0:
            self.breaks = 1

    def _block_break(self) -> None:
        # the fork's p() (:760): 1 newline under the generator default
        # single_line_break=True, 2 under the upstream default
        self.breaks = 1 if self.single_line_break else 2

    def _soft_break(self) -> None:
        self._want_break()
        self.br_suffix = "  "

    # ------------------------------------------------------------------
    # data events — the fork's handle_data (:878-925) behind the
    # Custom pre/code interceptors (:1134-1150)
    # ------------------------------------------------------------------
    def text(self, data: str, entity_char: bool = False) -> None:
        if self.preserve_depth > 0:  # Custom handle_data (:1136-1139)
            self.preserved_content.append(data)
            return
        if self.fence:
            self.emit(data)  # raw, newlines preserved
            return
        if self.span_code:
            self.emit(data.replace("\n", " "))
            return
        if not data:
            return
        if self.stressed:
            data = data.strip()
            self.stressed = False
            self.post_stressed = True
        elif self.post_stressed:
            if (
                _STRESS_JOIN.match(data[:1])
                and _HEADER_LEVEL.get(self.cur_tag) is None
                and self.cur_tag not in ("a", "code", "pre")
            ):
                data = " " + data
            self.post_stressed = False
        if self.auto_href is not None:
            href = self.auto_href
            if href == data and _ABS_URL.match(href) and self.use_automatic_links:
                self.emit("<" + data + ">")
                self.link_empty = False
                return
            self.emit("[")
            self.auto_href = None
            self.link_empty = False
        if not self.tick_open and not entity_char:
            if "\\" in data:
                data = _BSLASH.sub(r"\\\1", data)
            if self.escape_snob:
                # escape_md_section's snob pass (utils.py: RE_MD_CHARS
                # _MATCHER_ALL), applied after the backslash sub — the
                # snob class has no backslash, so no double escaping
                data = _SNOB_CHARS.sub(r"\\\1", data)
            if self.escape_dot:
                data = _DOT_MATCHER.sub(r"\1\\\2", data)
            if self.escape_plus:
                data = _PLUS_MATCHER.sub(r"\1\\\2", data)
            if self.escape_dash:
                data = _DASH_MATCHER.sub(r"\1\\\2", data)
        self.last_data = data
        self.emit(data, collapse=True)

    def entity(self, name: str) -> None:
        # reference entityref (:941-948); nbsp resolves to the
        # placeholder installed at init (:143) — even under
        # unicode_snob (the fork's :948 nbsp special case)
        if name in UNIFIABLE and (name == "nbsp" or not self.unicode_snob):
            repl = _NBSP_TOKEN if name == "nbsp" else UNIFIABLE[name]
        else:
            try:
                repl = html.entities.html5[name + ";"]
            except KeyError:
                repl = "&" + name + ";"
        if repl:
            self.text(repl, entity_char=True)

    def charref(self, ref: str) -> None:
        # reference charref (:927-939)
        if ref[:1] in ("x", "X"):
            cp = int(ref[1:], 16)
        else:
            cp = int(ref)
        if cp in _UNIFIABLE_CP and not self.unicode_snob:
            self.text(_UNIFIABLE_CP[cp], entity_char=True)
            return
        try:
            self.text(chr(cp), entity_char=True)
        except ValueError:
            pass  # out-of-range codepoint contributes nothing

    # ------------------------------------------------------------------
    # tag events
    # ------------------------------------------------------------------
    def start_tag(self, tag: str, attrs: dict) -> None:
        self._tag(tag, attrs, True)

    def end_tag(self, tag: str) -> None:
        self._tag(tag, {}, False)

    def _tag(self, tag: str, attrs: dict, start: bool) -> None:
        # Custom preserved-tag passthrough runs first (:1072-1105);
        # bug-for-bug: a same-named preserved tag nested inside an
        # already-preserved subtree increments depth WITHOUT
        # re-serializing its own opening tag (:1074-1083)
        if tag in self.preserve_tags:
            if start:
                if self.preserve_depth == 0:
                    self.current_preserved_tag = tag
                    attr_str = "".join(
                        f' {k}="{v}"' for k, v in attrs.items() if v is not None
                    )
                    self.preserved_content = [f"<{tag}{attr_str}>"]
                self.preserve_depth += 1
            else:
                self.preserve_depth -= 1
                if self.preserve_depth == 0:
                    self.preserved_content.append(f"</{tag}>")
                    self.emit("\n" + "".join(self.preserved_content) + "\n")
                    self.current_preserved_tag = None
            return
        if self.preserve_depth > 0:  # collect nested markup raw
            attr_str = "".join(
                f' {k}="{v}"' for k, v in attrs.items() if v is not None
            )
            self.preserved_content.append(
                f"<{tag}{attr_str}>" if start else f"</{tag}>"
            )
            return
        # Custom interceptors run before any base bookkeeping
        # (:1107-1132): pre always, code except when inside a link
        if tag == "pre":
            if start:
                self.emit("```\n")
                self.fence = True
            else:
                self.emit("\n```\n")
                self.fence = False
            return
        if tag == "code":
            if self.fence and not self.handle_code_in_pre:
                return
            if not self.in_link:
                self.emit("`")
            self.span_code = start
            if not self.in_link:
                return
            # inside a link the base handler ALSO runs (:1130),
            # emitting its own backtick and the deferred "["
        self.cur_tag = tag
        # deferred "[" when an automatic-link candidate meets a
        # non-exempt tag (:319-329)
        if (
            start
            and self.auto_href is not None
            and tag not in ("p", "div", "style", "dl", "dt")
            and (tag != "img" or self.ignore_images)
        ):
            self.emit("[")
            self.auto_href = None
            self.link_empty = False

        level = _HEADER_LEVEL.get(tag)
        if level:
            self._header(level, start)
            if not start:
                return  # the fork returns from both h-end branches
                # (:360-371), leaving after_list untouched
        elif tag in ("p", "div"):
            if not self.link_stack and not self.cell_sep:
                self._block_break()
        elif tag == "br":
            if start:
                self.emit("  \n> " if self.bq > 0 else "  \n")
        elif tag == "hr":
            if start:
                self._block_break()
                self.emit("* * *")
                self._block_break()
        elif tag in ("head", "script"):
            self.quiet += 1 if start else -1
        elif tag == "style":
            self.quiet += 1 if start else -1
            self.style_depth += 1 if start else -1
        elif tag == "body":
            self.quiet = 0
        elif tag == "blockquote":
            if start:
                self._block_break()
                self.emit("> ", force=True)
                self.at_start = True
                self.bq += 1
            else:
                self.bq -= 1
                self._block_break()
        elif tag in ("em", "i", "u"):
            if not self.ignore_emphasis:  # fork :422
                self._emphasis(
                    start,
                    self.emphasis_mark,
                    sep_when=lambda c: c not in _WS_CHARS and c not in _PUNCT_CHARS,
                )
        elif tag in ("strong", "b"):
            if not self.ignore_emphasis:  # fork :443
                mark = self.strong_mark
                self._emphasis(
                    start, mark, sep_when=lambda c: len(mark) > 0 and c == mark[0]
                )
        elif tag in ("del", "strike", "s"):
            self._emphasis(start, "~~", sep_when=lambda c: c == "~")
        elif tag in ("sup", "sub"):
            if self.include_sup_sub:  # fork :745
                self.emit("<{}>".format(tag) if start else "</{}>".format(tag))
        elif tag in ("kbd", "code", "tt"):
            self.emit("`")
            self.tick_open = not self.tick_open
        elif tag == "abbr":
            if start:
                self.abbr_title = attrs.get("title")
                self.abbr_text = ""
            else:
                if self.abbr_title is not None:
                    self.abbr_defs[self.abbr_text] = self.abbr_title
                    self.abbr_title = None
                self.abbr_text = None
        elif tag == "q":
            # fork :499-504 toggles regardless of start/end
            self.emit(self.open_quote if not self.quote_open else self.close_quote)
            self.quote_open = not self.quote_open
        elif tag == "a":
            if not self.ignore_links:  # fork :511 — with the flag set,
                # in_link tracking is skipped too, so <code> inside a
                # suppressed link emits backticks like any other span
                self._anchor(attrs, start)
        elif tag == "img":
            if start and not self.ignore_images:  # fork :556
                self._image(attrs)
        elif tag == "dl":
            if start:
                self._block_break()
                self.breaks = 0
        elif tag == "dt":
            if start:
                if self.breaks == 0:
                    self.emit("\n\n")
                self.breaks = 0
            else:
                self.emit("\n")
        elif tag == "dd":
            if start:
                self.emit("    ")
            else:
                self.breaks = 0
        elif tag in ("ol", "ul"):
            if not self.lists and not self.after_list:
                self._block_break()
            if start:
                try:
                    num = int(attrs.get("start") or 1) - 1
                except ValueError:
                    num = 0
                self.lists.append([tag, num])
            else:
                if self.lists:
                    self.lists.pop()
                    if not self.lists:
                        self.emit("\n")
            self.after_list = True
            return
        elif tag == "li":
            self._list_item(start)
        elif tag in ("table", "tr", "td", "th"):
            self._table(tag, start)
        self.after_list = False

    # -- per-family handlers -------------------------------------------
    def _header(self, level: int, start: bool) -> None:
        if self.link_stack:
            # header inside a link (:350-363)
            if start:
                self.in_header = True
                if self._out and self._out[-1] == "[":
                    self._out.pop()
                    self.sp = False
                    self.emit("#" * level + " ")
                    self.emit("[")
            else:
                self.breaks = 0
                self.in_header = False
        else:
            self._block_break()
            if start:
                self.in_header = True
                self.emit("#" * level + " ")
            else:
                self.in_header = False

    def _emphasis(self, start: bool, mark: str, sep_when) -> None:
        # the fork inserts a space when the mark would fuse with the
        # preceding character (:422-475)
        if start and self.last_data and sep_when(self.last_data[-1]):
            self.last_data += " "
            self.emit(" " + mark)
        else:
            self.emit(mark)
        if start:
            self.stressed = True

    def _anchor(self, attrs: dict, start: bool) -> None:
        if start:
            self.in_link = True
            href = attrs.get("href")
            if (
                href is not None
                and not (self.skip_internal_links and href.startswith("#"))
                and not (self.ignore_mailto_links and href.startswith("mailto:"))
            ):
                attrs = dict(attrs)  # the fork mutates its own copy;
                # convert_tree hands us the live DOM attrs dict
                self.link_stack.append(attrs)
                self.auto_href = href
                self.link_empty = True
                if self.protect_links:
                    # fork :525-526 wraps the href BEFORE urljoin so
                    # the emitted target is the <>-protected string
                    attrs["href"] = "<" + href + ">"
            else:
                self.link_stack.append(None)
        else:
            self.in_link = False
            if self.link_stack:
                a = self.link_stack.pop()
                if self.auto_href and not self.link_empty:
                    self.auto_href = None
                elif a:
                    if self.link_empty:
                        self.emit("[")
                        self.link_empty = False
                        self.auto_href = None
                    if self.inline_links:
                        self.breaks = 0  # fork :547 resets p_p only inline
                        title = _escape_md(a.get("title") or "")
                        url = _escape_md(_urljoin(self.baseurl, a["href"]))
                        suffix = ' "{}"'.format(title) if title.strip() else ""
                        self.emit("]({}{})".format(url, suffix))
                    else:
                        self.emit("][" + str(self._ref_link_count(a)) + "]")

    def _image(self, attrs: dict) -> None:
        # fork :556-610
        src = attrs.get("src")
        if src is None:
            return
        alt = attrs.get("alt") or self.default_image_alt
        if self.images_as_html or (
            self.images_with_size and ("width" in attrs or "height" in attrs)
        ):
            # raw html passthrough, byte-for-byte the fork's (:567-578)
            self.emit("<img src='" + src + "' ")
            if attrs.get("width") is not None:
                self.emit("width='" + attrs["width"] + "' ")
            if attrs.get("height") is not None:
                self.emit("height='" + attrs["height"] + "' ")
            if alt:
                self.emit("alt='" + alt + "' ")
            self.emit("/>")
            return
        if self.auto_href is not None:
            href = self.auto_href
            if (
                self.images_to_alt
                and _escape_md(alt) == href
                and _ABS_URL.match(href)
            ):
                self.emit("<" + _escape_md(alt) + ">")
                self.link_empty = False
                return
            self.emit("[")
            self.auto_href = None
            self.link_empty = False
        if self.images_to_alt:
            self.emit(_escape_md(alt))
            return
        self.emit("![" + _escape_md(alt) + "]")
        if self.inline_links:
            self.emit("(" + _escape_md(_urljoin(self.baseurl, src)) + ")")
        else:  # fork :605-611: images share the reference-link list
            attrs = dict(attrs)
            attrs["href"] = src
            self.emit("[" + str(self._ref_link_count(attrs)) + "]")

    def _ref_link_count(self, attrs: dict) -> int:
        """previousIndex + AnchorElement bookkeeping (fork :209-235,
        :547-553): reuse the number of an existing entry with the same
        href (and same title when either side carries one)."""
        for link in self.ref_links:
            la = link["attrs"]
            if la.get("href") == attrs.get("href"):
                if "title" in la or "title" in attrs:
                    if (
                        "title" in la
                        and "title" in attrs
                        and la["title"] == attrs["title"]
                    ):
                        return link["count"]
                else:
                    return link["count"]
        self.acount += 1
        self.ref_links.append(
            {"attrs": attrs, "count": self.acount, "outcount": self.emit_count}
        )
        return self.acount

    def _list_item(self, start: bool) -> None:
        self._want_break()
        if not start:
            return
        item = self.lists[-1] if self.lists else ["ul", 0]
        outer = None
        for lst in self.lists:
            # three spaces lines a ul under an ol (:662-671)
            self.emit("   " if outer == "ol" and lst[0] == "ul" else "  ")
            outer = lst[0]
        if item[0] == "ol":
            item[1] += 1
            self.emit(str(item[1]) + ". ")
        else:
            self.emit(self.ul_item_mark + " ")
        self.at_start = True

    def _table(self, tag: str, start: bool) -> None:
        if self.ignore_tables:
            # fork :681-688: cells contribute bare text; row ends soft-break
            if tag == "tr" and not start:
                self._soft_break()
            return
        if self.bypass_tables:
            # fork :690-702: the table serializes as raw tags
            if start:
                self._soft_break()
            if tag in ("td", "th"):
                self.emit("<{}>\n\n".format(tag) if start else "\n</{}>".format(tag))
            else:
                self.emit("<{}>".format(tag) if start else "</{}>".format(tag))
            return
        if tag == "table":
            if start:
                self.header_row = True
                if self.pad_tables:
                    self.emit("<" + _TABLE_MARKER + ">")
                    self.emit("  \n")
            elif self.pad_tables:
                self._soft_break()
                self.emit("</" + _TABLE_MARKER + ">")
                self.emit("  \n")
        elif tag == "tr":
            if start:
                self.cell_count = 0
            else:
                self.cell_sep = False
                self._soft_break()
                if self.header_row:
                    self.emit("|".join(["---"] * self.cell_count))
                    self._soft_break()
                    self.header_row = False
        elif start:  # td / th
            if self.cell_sep:
                self.emit("| ")
            self.cell_sep = True
            self.cell_count += 1

    # ------------------------------------------------------------------
    def result(self) -> str:
        self._want_break()
        self.emit("", force="end")
        # fork close() (:173-180): nbsp placeholder resolves to U+00A0
        # under unicode_snob, plain space otherwise
        nbsp = html.entities.html5["nbsp;"] if self.unicode_snob else " "
        text = "".join(self._out).replace(_NBSP_TOKEN, nbsp)
        if self.body_width:
            text = self._optwrap(text)
        if self.pad_tables:  # after optwrap, like the fork's handle()
            text = _pad_tables_in_text(text)
        return text

    # -- body_width wrapping: the fork's optwrap (:964-1024) under the
    # Custom defaults (wrap_links=True → inline links stay inline and
    # the RE_LINK skip is off; wrap_list_items=False; wrap_tables=False)
    def _optwrap(self, text: str) -> str:
        from textwrap import wrap

        result = ""
        newlines = 0
        for para in text.split("\n"):
            if len(para) > 0:
                if not _skipwrap(
                    para, self.wrap_links, self.wrap_list_items, self.wrap_tables
                ):
                    indent = ""
                    if para.startswith("  " + self.ul_item_mark):
                        # list item continuation (fork :988)
                        indent = "    "
                    elif para.startswith("> "):
                        indent = "> "
                    wrapped = wrap(
                        para,
                        self.body_width,
                        break_long_words=False,
                        subsequent_indent=indent,
                    )
                    result += "\n".join(wrapped)
                    if para.endswith("  "):
                        result += "  \n"
                        newlines = 1
                    elif indent:
                        result += "\n"
                        newlines = 1
                    else:
                        result += "\n\n"
                        newlines = 2
                else:
                    # the fork's RE_SPACE is literally r"\s\+" —
                    # replicated verbatim, quirk and all (:1017)
                    if not _RE_SPACE.match(para):
                        result += para + "\n"
                        newlines = 1
            else:
                if newlines < 2:
                    result += "\n"
                    newlines += 1
        return result


class _ParserDriver(html.parser.HTMLParser):
    """Feeds stdlib tokenizer events into a MarkdownMachine — the same
    event stream the fork sees (it subclasses HTMLParser with
    ``convert_charrefs=False``, :50)."""

    def __init__(self, machine: MarkdownMachine):
        super().__init__(convert_charrefs=False)
        self.m = machine

    def handle_starttag(self, tag, attrs):
        self.m.start_tag(tag, dict(attrs))

    def handle_endtag(self, tag):
        self.m.end_tag(tag)

    def handle_startendtag(self, tag, attrs):
        self.m.start_tag(tag, dict(attrs))
        self.m.end_tag(tag)

    def handle_data(self, data):
        self.m.text(data)

    def handle_entityref(self, name):
        self.m.entity(name)

    def handle_charref(self, ref):
        self.m.charref(ref)


def convert_html(html_text: str, baseurl: str = "", **options) -> str:
    """Raw HTML string → markdown, byte-identical to
    ``CustomHTML2Text(baseurl).handle(html_text)`` under the generator
    defaults (without the generator's fence-dedent post-replace).
    ``options`` are the MarkdownMachine knobs (ignore_links,
    ignore_images, escape_snob, body_width, mark_code)."""
    machine = MarkdownMachine(baseurl, **options)
    driver = _ParserDriver(machine)
    # the fork's feed() quirk (:149-151)
    driver.feed(html_text.replace("</' + 'script>", "</ignore>"))
    driver.feed("")
    driver.close()
    return machine.result()


_TEXT_SPECIAL = {"&": "amp", "<": "lt", ">": "gt"}
_TEXT_SPLIT = re.compile(r"[&<>]")


def _feed_text(machine: MarkdownMachine, s: str) -> None:
    """Emit a text node as the exact event sequence its serialized
    form would produce: the serializer escapes ``& < >`` to entities,
    and the tokenizer (convert_charrefs=False) re-splits the data at
    each one — chunk boundaries matter because the machine's stressed
    strip / whitespace collapse are per-event."""
    if "&" not in s and "<" not in s and ">" not in s:
        machine.text(s)
        return
    pos = 0
    for m in _TEXT_SPLIT.finditer(s):
        if m.start() > pos:
            machine.text(s[pos : m.start()])
        machine.entity(_TEXT_SPECIAL[m.group()])
        pos = m.end()
    if pos < len(s):
        machine.text(s[pos:])


def convert_tree(root, baseurl: str = "", **options) -> str:
    """Element tree → markdown without re-tokenizing: walks the DOM
    emitting the event stream its minimal serialization would produce,
    which ``tests/test_md_parity.py`` checks against the
    serialize+reparse path over the whole corpus and fuzzed trees."""
    from .dom import Element, TextNode, RAW_TEXT_ELEMENTS, VOID_ELEMENTS

    machine = MarkdownMachine(baseurl, **options)
    stack: list = [("node", c) for c in reversed(root.children)]
    pending_text: list[str] = []  # adjacent TextNodes serialize as one
    # run, so they must arrive as one chunk
    while stack:
        kind, item = stack.pop()
        if kind == "node" and type(item) is TextNode:
            pending_text.append(item.text)
            continue
        if pending_text:
            _feed_text(machine, "".join(pending_text))
            pending_text.clear()
        if kind == "end":
            machine.end_tag(item)
            continue
        node = item
        if type(node) is Element:
            machine.start_tag(node.tag, node.attrs)
            if node.tag in VOID_ELEMENTS:
                # serialization writes "<img ...>" with no close, so the
                # tokenizer emits ONLY handle_starttag — no end event.
                # (An explicit "<img/>" in source yields startendtag =
                # start+end, but serialize_contents never writes that.)
                continue
            if node.tag in RAW_TEXT_ELEMENTS:
                # raw content arrives as one unsplit data event
                # (tokenizer CDATA mode), then the close
                raw = "".join(c.text for c in node.children if type(c) is TextNode)
                if raw:
                    machine.text(raw)
                machine.end_tag(node.tag)
                continue
            stack.append(("end", node.tag))
            for c in reversed(node.children):
                stack.append(("node", c))
        # comments contribute nothing (HTMLParser emits them as
        # handle_comment, which the fork does not override) — but they
        # do break a text run into separate data events, which the
        # pending_text flush above preserves
    if pending_text:
        _feed_text(machine, "".join(pending_text))
    return machine.result()
