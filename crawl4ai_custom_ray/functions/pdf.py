"""Naive PDF processing — pure stdlib.

The reference ``NaivePDFProcessorStrategy``
(``processors/pdf/processor.py:57-487``) wraps PyPDF2: per-page text
via a visitor, /Annots URI links, /Info metadata with ``D:`` dates,
image XObject extraction, and markdown/html cleanup
(``processors/pdf/utils.py``).  PyPDF2 is absent in this environment,
so this module implements the needed subset of ISO 32000 directly:

- object scanner (``N G obj … endobj``; no xref needed — the same
  robustness posture PyPDF2 falls back to on broken files)
- minimal COS parser: dicts, arrays, names, numbers, strings
  (literal with escapes + hex), indirect references
- streams with ``/Filter /FlateDecode`` (zlib) or no filter
- page tree walk (``/Catalog → /Pages → /Kids``, inheritance of
  ``/Contents``), content-stream text operators (``BT/ET``, ``Tj``,
  ``TJ``, ``'``, ``"``, ``Td/TD/T*`` line breaks), PDFDocEncoding≈
  latin-1 and UTF-16BE (BOM) strings
- ``/Annots → /A → /URI`` links; ``/Info`` metadata incl. the
  reference's ``D:YYYYMMDDHHMMSS`` date regex semantics
- image XObjects surfaced as (width, height, filter) records; pixel
  decoding is out of scope without codec libraries (the reference
  needs Pillow for that path too)

The markdown/html cleanup here is a simplified, documented variant of
the reference's paper-layout heuristics (title promotion, numbered
headers, hyphenation joining, paragraph reflow) — the reference's
author/affiliation-specific rules are arXiv-paper heuristics and are
not reproduced.

``build_pdf`` writes small spec-correct PDFs (xref table, Flate or
raw streams) deterministically — the test corpus generator.
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field
from datetime import datetime
from pathlib import Path

__all__ = [
    "PDFMetadata",
    "PDFPage",
    "PDFProcessResult",
    "NaivePDFProcessorStrategy",
    "build_pdf",
    "process_pdfs",
]


# ---------------------------------------------------------------------------
# result model (reference processor.py:24-50)
# ---------------------------------------------------------------------------


@dataclass
class PDFMetadata:
    title: str | None = None
    author: str | None = None
    producer: str | None = None
    created: datetime | None = None
    modified: datetime | None = None
    pages: int = 0
    encrypted: bool = False
    file_size: int | None = None


@dataclass
class PDFPage:
    page_number: int
    raw_text: str = ""
    markdown: str = ""
    html: str = ""
    images: list[dict] = field(default_factory=list)
    links: list[str] = field(default_factory=list)
    layout: list[dict] = field(default_factory=list)


@dataclass
class PDFProcessResult:
    metadata: PDFMetadata
    pages: list[PDFPage]
    processing_time: float = 0.0
    version: str = "1.1"


# ---------------------------------------------------------------------------
# COS object parser
# ---------------------------------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num

    def __repr__(self):  # pragma: no cover
        return f"_Ref({self.num})"


class _CosParser:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self):
        d = self.data
        while self.pos < len(d):
            c = d[self.pos : self.pos + 1]
            if c in (b"%",):  # comment to EOL
                nl = d.find(b"\n", self.pos)
                self.pos = len(d) if nl < 0 else nl + 1
            elif c in _WS:
                self.pos += 1
            else:
                break

    def parse(self):
        self._skip_ws()
        d, p = self.data, self.pos
        if d.startswith(b"<<", p):
            return self._dict()
        if d.startswith(b"[", p):
            return self._array()
        if d.startswith(b"/", p):
            return self._name()
        if d.startswith(b"(", p):
            return self._literal_string()
        if d.startswith(b"<", p):
            return self._hex_string()
        if d.startswith(b"true", p):
            self.pos += 4
            return True
        if d.startswith(b"false", p):
            self.pos += 5
            return False
        if d.startswith(b"null", p):
            self.pos += 4
            return None
        return self._number_or_ref()

    def _dict(self):
        self.pos += 2
        out = {}
        while True:
            self._skip_ws()
            if self.data.startswith(b">>", self.pos):
                self.pos += 2
                return out
            key = self._name()
            out[key] = self.parse()

    def _array(self):
        self.pos += 1
        out = []
        while True:
            self._skip_ws()
            if self.data.startswith(b"]", self.pos):
                self.pos += 1
                return out
            out.append(self.parse())

    def _name(self) -> str:
        assert self.data[self.pos : self.pos + 1] == b"/"
        self.pos += 1
        start = self.pos
        d = self.data
        while self.pos < len(d) and d[self.pos : self.pos + 1] not in _WS + _DELIM:
            self.pos += 1
        raw = d[start : self.pos]
        # #xx escapes in names
        return re.sub(
            rb"#([0-9A-Fa-f]{2})", lambda m: bytes([int(m.group(1), 16)]), raw
        ).decode("latin-1")

    def _literal_string(self) -> str:
        d = self.data
        self.pos += 1
        out = bytearray()
        depth = 1
        while self.pos < len(d):
            c = d[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                e = d[self.pos : self.pos + 1]
                mapping = {
                    b"n": 10, b"r": 13, b"t": 9, b"b": 8, b"f": 12,
                    b"(": 40, b")": 41, b"\\": 92,
                }
                if e in mapping:
                    out.append(mapping[e])
                    self.pos += 1
                elif e.isdigit():
                    oct_digits = e
                    self.pos += 1
                    while len(oct_digits) < 3 and d[self.pos : self.pos + 1].isdigit():
                        oct_digits += d[self.pos : self.pos + 1]
                        self.pos += 1
                    out.append(int(oct_digits, 8) & 0xFF)
                elif e in (b"\n", b"\r"):  # line continuation
                    self.pos += 1
                    if e == b"\r" and d[self.pos : self.pos + 1] == b"\n":
                        self.pos += 1
                else:
                    out += e
                    self.pos += 1
                continue
            if c == 0x28:  # (
                depth += 1
            elif c == 0x29:  # )
                depth -= 1
                if depth == 0:
                    self.pos += 1
                    return _decode_pdf_string(bytes(out))
            out.append(c)
            self.pos += 1
        return _decode_pdf_string(bytes(out))

    def _hex_string(self) -> str:
        end = self.data.find(b">", self.pos)
        raw = self.data[self.pos + 1 : end]
        self.pos = end + 1
        hexstr = re.sub(rb"[^0-9A-Fa-f]", b"", raw)
        if len(hexstr) % 2:
            hexstr += b"0"
        return _decode_pdf_string(bytes.fromhex(hexstr.decode("ascii")))

    def _number_or_ref(self):
        d = self.data
        m = re.match(rb"[+-]?\d*\.?\d+", d[self.pos :])
        if m is None:
            raise ValueError(f"bad token at {d[self.pos:self.pos+20]!r}")
        tok = m.group(0)
        self.pos += len(tok)
        # "N G R" indirect reference lookahead
        if b"." not in tok:
            m2 = re.match(rb"\s+(\d+)\s+R(?![\w])", d[self.pos :])
            if m2:
                self.pos += m2.end()
                return _Ref(int(tok))
        return float(tok) if b"." in tok else int(tok)


def _decode_pdf_string(raw: bytes) -> str:
    if raw.startswith(b"\xfe\xff"):
        return raw[2:].decode("utf-16-be", errors="replace")
    return raw.decode("latin-1", errors="replace")


# ---------------------------------------------------------------------------
# document
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b", re.S)


class PdfDocument:
    def __init__(self, data: bytes):
        self.data = data
        self.objects: dict[int, object] = {}
        self.streams: dict[int, bytes] = {}
        self._scan()

    @classmethod
    def from_bytes(cls, data: bytes) -> "PdfDocument":
        if not data.lstrip()[:5].startswith(b"%PDF-"):
            raise ValueError("not a PDF (missing %PDF header)")
        return cls(data)

    # -- scanning -----------------------------------------------------
    def _scan(self):
        data = self.data
        pending: list[tuple[int, dict, int]] = []
        for m in _OBJ_RE.finditer(data):
            num = int(m.group(1))
            body_start = m.end()
            parser = _CosParser(data, body_start)
            try:
                obj = parser.parse()
            except Exception:
                continue
            self.objects[num] = obj
            rest = data[parser.pos :]
            sm = re.match(rb"\s*stream(\r\n|\n|\r)", rest)
            if sm is not None and isinstance(obj, dict):
                pending.append((num, obj, parser.pos + sm.end()))
        # second pass: /Length may be an indirect ref — all objects are
        # known now.  Prefer /Length (exact; a compressed stream can
        # legitimately END in CR/LF bytes that a delimiter-strip would
        # eat), fall back to the endstream delimiter.
        for num, obj, s_start in pending:
            length = self.resolve(obj.get("Length"))
            raw = None
            if isinstance(length, int) and 0 <= length <= len(data) - s_start:
                # validate with a BOUNDED window (EOL + "endstream"
                # marker); never slice the whole file tail per stream
                window = data[s_start + length : s_start + length + 16]
                if re.match(rb"\s*endstream", window):
                    raw = data[s_start : s_start + length]
            if raw is None:
                s_end = data.find(b"endstream", s_start)
                if s_end < 0:
                    continue
                raw = data[s_start:s_end]
                if raw.endswith(b"\r\n"):
                    raw = raw[:-2]
                elif raw.endswith(b"\n") or raw.endswith(b"\r"):
                    raw = raw[:-1]
            self.streams[num] = self._decode_stream(obj, raw)

    def _decode_stream(self, sdict: dict, raw: bytes) -> bytes:
        filt = sdict.get("Filter")
        filters = filt if isinstance(filt, list) else ([filt] if filt else [])
        out = raw
        for f in filters:
            if f == "FlateDecode":
                try:
                    out = zlib.decompress(out)
                except zlib.error:
                    return b""
            else:
                return b""  # unsupported filter → no text
        return out

    # -- resolution ---------------------------------------------------
    def resolve(self, obj):
        seen = 0
        while isinstance(obj, _Ref):
            obj = self.objects.get(obj.num)
            seen += 1
            if seen > 32:
                return None
        return obj

    # -- structure ----------------------------------------------------
    def catalog(self) -> dict | None:
        for obj in self.objects.values():
            if isinstance(obj, dict) and obj.get("Type") == "Catalog":
                return obj
        return None

    def info(self) -> dict:
        # trailer /Info ref
        for m in re.finditer(rb"trailer", self.data):
            try:
                tdict = _CosParser(self.data, m.end()).parse()
            except Exception:
                continue
            if isinstance(tdict, dict) and "Info" in tdict:
                info = self.resolve(tdict["Info"])
                if isinstance(info, dict):
                    return info
        # fallback: any object that looks like an info dict
        for obj in self.objects.values():
            if isinstance(obj, dict) and "Type" not in obj and (
                "Title" in obj or "Author" in obj or "Producer" in obj
            ):
                return obj
        return {}

    def pages(self) -> list[tuple[int, dict]]:
        """(object number, page dict) in page-tree order; falls back
        to object-number order when the tree is broken."""
        cat = self.catalog()
        ordered: list[tuple[int, dict]] = []
        if cat is not None:
            root = cat.get("Pages")
            self._walk_kids(root, ordered, set())
        if not ordered:
            for num in sorted(self.objects):
                obj = self.objects[num]
                if isinstance(obj, dict) and obj.get("Type") == "Page":
                    ordered.append((num, obj))
        return ordered

    def _walk_kids(self, node, out, visiting: set):
        num = node.num if isinstance(node, _Ref) else None
        if num is not None:
            if num in visiting:
                return
            visiting.add(num)
        obj = self.resolve(node)
        if not isinstance(obj, dict):
            return
        t = obj.get("Type")
        if t == "Page":
            out.append((num, obj))
        elif t == "Pages" or "Kids" in obj:
            for kid in self.resolve(obj.get("Kids")) or []:
                self._walk_kids(kid, out, visiting)

    # -- content ------------------------------------------------------
    def page_content(self, page: dict) -> bytes:
        contents = self.resolve(page.get("Contents"))
        parts: list[bytes] = []
        refs = contents if isinstance(contents, list) else [page.get("Contents")]
        for ref in refs:
            r = ref
            if isinstance(r, _Ref) and r.num in self.streams:
                parts.append(self.streams[r.num])
        return b"\n".join(parts)

    def page_links(self, page: dict) -> list[str]:
        links = []
        for aref in self.resolve(page.get("Annots")) or []:
            annot = self.resolve(aref)
            if not isinstance(annot, dict):
                continue
            action = self.resolve(annot.get("A"))
            if isinstance(action, dict) and "URI" in action:
                links.append(str(self.resolve(action["URI"])))
        return links

    def page_images(self, page: dict) -> list[dict]:
        res = self.resolve(page.get("Resources")) or {}
        xobjs = self.resolve(res.get("XObject")) or {}
        out = []
        for name, ref in xobjs.items() if isinstance(xobjs, dict) else []:
            x = self.resolve(ref)
            if isinstance(x, dict) and x.get("Subtype") == "Image":
                out.append(
                    {
                        "name": name,
                        "width": self.resolve(x.get("Width")),
                        "height": self.resolve(x.get("Height")),
                        "filter": self.resolve(x.get("Filter")),
                        # pixel decode needs codec libs (as in the
                        # reference, which requires Pillow here)
                        "decoded": False,
                    }
                )
        return out


# ---------------------------------------------------------------------------
# content-stream text extraction
# ---------------------------------------------------------------------------

_CS_TOKEN = re.compile(
    rb"""
    \((?:[^()\\]|\\.)*\)      # literal string (no nested parens)
    |<[0-9A-Fa-f\s]*>         # hex string
    |<<|>>|\[|\]|\{|\}
    |/[^\s()<>\[\]{}/%]*
    |[+-]?\d*\.?\d+
    |[A-Za-z'"][\w*'"]*
    """,
    re.VERBOSE,
)


def extract_text_ops(content: bytes) -> list[tuple[str, float, float]]:
    """(text, tx, ty) runs from one content stream — the naive subset
    of PyPDF2's extract_text visitor: shows inside BT/ET, newline
    tracking via Td/TD/T*/'/" vertical moves."""
    out: list[tuple[str, float, float]] = []
    stack: list = []
    in_text = False
    shown = False  # suppress line breaks before the first show op
    tx = ty = 0.0
    for m in _CS_TOKEN.finditer(content):
        tok = m.group(0)
        c = tok[:1]
        if c == b"(" or c == b"<" and not tok.startswith(b"<<"):
            stack.append(tok)
        elif c in b"+-0123456789." and (c.isdigit() or len(tok) > 1):
            stack.append(tok)
        elif tok == b"BT":
            in_text = True
            tx = ty = 0.0
            stack.clear()
        elif tok == b"ET":
            in_text = False
            stack.clear()
        elif in_text and tok in (b"Td", b"TD"):
            if len(stack) >= 2:
                try:
                    dx, dy = float(stack[-2]), float(stack[-1])
                except ValueError:
                    dx = dy = 0.0
                tx += dx
                ty += dy
                if dy != 0 and shown:
                    out.append(("\n", tx, ty))
            stack.clear()
        elif in_text and tok == b"T*":
            ty -= 1
            if shown:
                out.append(("\n", tx, ty))
            stack.clear()
        elif in_text and tok == b"Tj":
            if stack and stack[-1][:1] in (b"(", b"<"):
                out.append((_cs_string(stack[-1]), tx, ty))
                shown = True
            stack.clear()
        elif in_text and tok in (b"'", b'"'):
            ty -= 1
            if shown:
                out.append(("\n", tx, ty))
            if stack and stack[-1][:1] in (b"(", b"<"):
                out.append((_cs_string(stack[-1]), tx, ty))
                shown = True
            stack.clear()
        elif in_text and tok == b"TJ":
            # last [...] on the stack: strings shown, numbers = kern
            buf = []
            for item in stack:
                if item[:1] in (b"(", b"<"):
                    buf.append(_cs_string(item))
                elif item not in (b"[", b"]"):
                    try:
                        if float(item) < -150:  # large negative kern = gap
                            buf.append(" ")
                    except ValueError:
                        pass
            if buf:
                out.append(("".join(buf), tx, ty))
                shown = True
            stack.clear()
        elif tok in (b"[", b"]"):
            stack.append(tok)
        else:
            # any other operator consumes its operands
            stack.clear()
    return out


def _cs_string(tok: bytes) -> str:
    p = _CosParser(tok, 0)
    return p._literal_string() if tok[:1] == b"(" else p._hex_string()


# ---------------------------------------------------------------------------
# markdown / html cleanup (simplified variant of processors/pdf/utils.py)
# ---------------------------------------------------------------------------

_NUM_HEADER = re.compile(r"^(\d+(?:\.\d+)*)\s+(.+)$")


def clean_pdf_text(page_number: int, text: str) -> str:
    """Markdown-ish reflow: page-1 short first line promotes to an
    ``##`` title, blank-line-preceded ``2.1 Background`` lines become
    headers at depth+1, hyphenated line breaks join, other lines merge
    into reflowed paragraphs (reference clean_pdf_text's general
    behavior minus its arXiv author/affiliation heuristics)."""
    lines = text.split("\n")
    out: list[str] = []
    para: list[str] = []

    def flush():
        if para:
            joined = re.sub(r"\s+", " ", " ".join(para)).strip()
            if joined:
                out.append(joined)
            para.clear()

    for i, line in enumerate(lines):
        line = line.strip()
        if not line:
            flush()
            continue
        if page_number == 1 and i == 0 and 3 <= len(line.split()) <= 8 and len(lines) > 1:
            flush()
            out.append(f"## {line}")
            continue
        m = _NUM_HEADER.match(line)
        prev_blank = i == 0 or not lines[i - 1].strip()
        if m and prev_blank:
            flush()
            level = min(m.group(1).count(".") + 2, 6)
            out.append(f"{'#' * level} {m.group(2)}")
            continue
        if para and para[-1].endswith("-"):
            para[-1] = para[-1][:-1] + line
        else:
            para.append(line)
    flush()
    return "\n\n".join(out)


def clean_pdf_text_to_html(page_number: int, text: str) -> str:
    import html as _html

    md = clean_pdf_text(page_number, text)
    blocks = []
    for block in md.split("\n\n"):
        if block.startswith("#"):
            level = len(block) - len(block.lstrip("#"))
            blocks.append(f"<h{level}>{_html.escape(block.lstrip('# '))}</h{level}>")
        elif block:
            blocks.append(f'<div class="paragraph"><p>{_html.escape(block)}</p></div>')
    return "".join(blocks)


# ---------------------------------------------------------------------------
# strategy (reference surface)
# ---------------------------------------------------------------------------

_PDF_DATE = re.compile(r"D:(\d{4})(\d{2})(\d{2})(\d{2})(\d{2})(\d{2})")


class NaivePDFProcessorStrategy:
    """Reference-surface PDF strategy (processor.py:57) on the stdlib
    parser above."""

    def __init__(self, extract_images: bool = True, **_kwargs):
        self.extract_images = extract_images

    def process(self, pdf_path: Path) -> PDFProcessResult:
        data = Path(pdf_path).read_bytes()
        result = self.process_bytes(data)
        result.metadata.file_size = len(data)
        return result

    def process_bytes(self, data: bytes) -> PDFProcessResult:
        import time as _time

        t0 = _time.time()
        doc = PdfDocument.from_bytes(data)
        meta = self._metadata(doc, len(data))
        pages: list[PDFPage] = []
        for idx, (_num, pdict) in enumerate(doc.pages(), start=1):
            content = doc.page_content(pdict)
            runs = extract_text_ops(content)
            raw = "".join(t for t, _, _ in runs)
            page = PDFPage(
                page_number=idx,
                raw_text=raw,
                markdown=clean_pdf_text(idx, raw),
                html=clean_pdf_text_to_html(idx, raw),
                links=doc.page_links(pdict),
                images=doc.page_images(pdict) if self.extract_images else [],
                layout=[
                    {"type": "text", "text": t, "x": x, "y": y}
                    for t, x, y in runs
                    if t != "\n"
                ],
            )
            pages.append(page)
        meta.pages = len(pages)
        result = PDFProcessResult(metadata=meta, pages=pages)
        result.processing_time = _time.time() - t0
        return result

    def _metadata(self, doc: PdfDocument, size: int) -> PDFMetadata:
        info = doc.info()
        return PDFMetadata(
            title=info.get("Title"),
            author=info.get("Author"),
            producer=info.get("Producer"),
            created=self._parse_date(info.get("CreationDate") or ""),
            modified=self._parse_date(info.get("ModDate") or ""),
            encrypted=b"/Encrypt" in doc.data,
            file_size=size,
        )

    @staticmethod
    def _parse_date(s: str) -> datetime | None:
        m = _PDF_DATE.match(s or "")
        if not m:
            return None
        try:
            return datetime(*(int(g) for g in m.groups()))
        except ValueError:
            return None


# ---------------------------------------------------------------------------
# deterministic mini writer (test/synthetic corpus)
# ---------------------------------------------------------------------------


def _esc(s: str) -> bytes:
    return (
        s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)").encode("latin-1", "replace")
    )


def build_pdf(
    pages: list[str],
    *,
    title: str | None = None,
    author: str | None = None,
    producer: str = "graft-mini-writer",
    created: str = "D:20240101120000",
    compress: bool = True,
    links: list[list[str]] | None = None,
    images: list[list[tuple[int, int]]] | None = None,
) -> bytes:
    """Write a small, spec-correct PDF (header, objects, xref table,
    trailer).  Each page string becomes one Helvetica text column;
    ``\\n`` line breaks become ``T*`` moves.  ``images`` gives per-page
    (width, height) Image XObjects — 8-bit DeviceGray FlateDecode
    streams of deterministic bytes, painted with ``Do`` (mirrors the
    reference processor's image source: ``processors/pdf/processor.py``
    page images).  Deterministic bytes for identical inputs."""
    objs: list[bytes] = []  # 1-indexed bodies

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    page_ids: list[int] = []
    content_ids: list[int] = []
    annot_ids: list[list[int]] = []
    image_ids: list[list[int]] = []
    for i, text in enumerate(pages):
        page_imgs: list[int] = []
        page_dims = (images[i] if images and i < len(images) else [])
        for w, h in page_dims:
            # deterministic gray ramp so the stream round-trips exactly
            pix = bytes((x * 7 + 13) % 256 for x in range(w * h))
            comp = zlib.compress(pix, 9)
            page_imgs.append(
                add(
                    b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
                    b"/ColorSpace /DeviceGray /BitsPerComponent 8 "
                    b"/Filter /FlateDecode /Length %d >>\nstream\n%s\nendstream"
                    % (w, h, len(comp), comp)
                )
            )
        image_ids.append(page_imgs)
        ops = [b"BT /F1 11 Tf 12 TL 72 720 Td"]
        for j, line in enumerate(text.split("\n")):
            if j > 0:
                ops.append(b"T*")
            ops.append(b"(" + _esc(line) + b") Tj")
        ops.append(b"ET")
        for k, (w, h) in enumerate(page_dims):
            ops.append(b"q %d 0 0 %d 72 %d cm /Im%d Do Q" % (w, h, 500 - 40 * k, k))
        stream = b" ".join(ops)
        if compress:
            comp = zlib.compress(stream, 9)
            cid = add(
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
                % (len(comp), comp)
            )
        else:
            cid = add(b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream))
        content_ids.append(cid)
        page_annots: list[int] = []
        for uri in (links[i] if links and i < len(links) else []):
            page_annots.append(
                add(
                    b"<< /Type /Annot /Subtype /Link /Rect [72 700 300 712] "
                    b"/A << /Type /Action /S /URI /URI (" + _esc(uri) + b") >> >>"
                )
            )
        annot_ids.append(page_annots)

    pages_id = len(objs) + len(pages) + 1  # after page objects
    for i in range(len(pages)):
        annots = (
            b" /Annots [" + b" ".join(b"%d 0 R" % a for a in annot_ids[i]) + b"]"
            if annot_ids[i]
            else b""
        )
        xobj = (
            b" /XObject << "
            + b" ".join(
                b"/Im%d %d 0 R" % (k, oid) for k, oid in enumerate(image_ids[i])
            )
            + b" >>"
            if image_ids[i]
            else b""
        )
        add(
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 %d 0 R >>%s >> /Contents %d 0 R%s >>"
            % (pages_id, font, xobj, content_ids[i], annots)
        )
        page_ids.append(len(objs))
    kids = b" ".join(b"%d 0 R" % p for p in page_ids)
    assert add(
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(page_ids))
    ) == pages_id
    catalog = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_id)
    info_parts = [b"<< /Producer (", _esc(producer), b") /CreationDate (", created.encode(), b")"]
    if title is not None:
        info_parts += [b" /Title (", _esc(title), b")"]
    if author is not None:
        info_parts += [b" /Author (", _esc(author), b")"]
    info_parts.append(b" >>")
    info = add(b"".join(info_parts))

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for n, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % n + body + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R /Info %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, catalog, info, xref_pos)
    )
    return bytes(out)


# ---------------------------------------------------------------------------
# Ray stage
# ---------------------------------------------------------------------------


def process_pdfs(
    ds,
    *,
    id_column: str = "doc_id",
    pdf_column: str = "pdf",
    concurrency: int = 2,
    batch_size: int = 64,
):
    """Actor-pool stage: (id, pdf bytes) → one row per document with
    page-concatenated text/markdown, page count, metadata and links.
    Failures yield success=False rows, never poison the batch."""
    import pyarrow as pa

    class PdfWorker:
        def __init__(self):
            self.strategy = NaivePDFProcessorStrategy()

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_column].to_pylist()
            blobs = batch[pdf_column].to_pylist()
            cols = {
                id_column: ids,
                "success": [],
                "n_pages": [],
                "text": [],
                "markdown": [],
                "title": [],
                "author": [],
                "links": [],
                "n_images": [],
                "image_px": [],
                "error": [],
            }
            for blob in blobs:
                try:
                    r = self.strategy.process_bytes(blob)
                    imgs = [im for p in r.pages for im in p.images]
                    cols["success"].append(True)
                    cols["n_pages"].append(r.metadata.pages)
                    cols["text"].append("\n".join(p.raw_text for p in r.pages))
                    cols["markdown"].append("\n\n".join(p.markdown for p in r.pages))
                    cols["title"].append(r.metadata.title)
                    cols["author"].append(r.metadata.author)
                    cols["links"].append([l for p in r.pages for l in p.links])
                    cols["n_images"].append(len(imgs))
                    cols["image_px"].append(
                        sum((im["width"] or 0) * (im["height"] or 0) for im in imgs)
                    )
                    cols["error"].append(None)
                except Exception as exc:
                    cols["success"].append(False)
                    cols["n_pages"].append(0)
                    cols["text"].append("")
                    cols["markdown"].append("")
                    cols["title"].append(None)
                    cols["author"].append(None)
                    cols["links"].append([])
                    cols["n_images"].append(0)
                    cols["image_px"].append(0)
                    cols["error"].append(str(exc)[:200])
            return pa.table(
                {
                    id_column: pa.array(cols[id_column]),
                    "success": pa.array(cols["success"], pa.bool_()),
                    "n_pages": pa.array(cols["n_pages"], pa.int32()),
                    "text": pa.array(cols["text"], pa.large_string()),
                    "markdown": pa.array(cols["markdown"], pa.large_string()),
                    "title": pa.array(cols["title"], pa.string()),
                    "author": pa.array(cols["author"], pa.string()),
                    "links": pa.array(cols["links"], pa.list_(pa.string())),
                    "n_images": pa.array(cols["n_images"], pa.int32()),
                    "image_px": pa.array(cols["image_px"], pa.int64()),
                    "error": pa.array(cols["error"], pa.string()),
                }
            )

    return ds.map_batches(
        PdfWorker,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        num_cpus=0.5,
    )
