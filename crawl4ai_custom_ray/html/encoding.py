"""Charset detection + decoding for fetched payloads.

Reference behavior (``async_crawler_strategy.py:2331-2336``): the HTTP
strategy decodes with ``response.charset``, falling back to chardet
detection, falling back to utf-8, always with ``errors='replace'``;
``utils.py:777-792`` (``sanitize_input_encode``) additionally
round-trips text through utf-8 with ``errors='ignore'``.

chardet is not available here, so :func:`sniff_encoding` is a
DETERMINISTIC detector covering the cases a crawler actually meets,
in standard precedence order (WHATWG encoding sniffing, abridged):

1. BOM (utf-8-sig / utf-16 le/be / utf-32 le/be) — authoritative;
2. ``charset=`` in the transport Content-Type, when given;
3. a ``<meta charset=…>`` / ``<meta http-equiv Content-Type …>``
   declaration within the first 2048 bytes (ASCII-compatible scan);
4. strict-utf-8 validity probe;
5. ``cp1252`` (the HTML5 mapping for latin-1-ish bytes — a superset
   of iso-8859-1 that also covers the 0x80-0x9F smart-quote range).

Decoding never raises: unknown/broken declared charsets fall through
the chain, and the final decode uses ``errors='replace'`` exactly like
the reference.
"""

from __future__ import annotations

import codecs
import re

_BOMS: tuple[tuple[bytes, str], ...] = (
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)

_META_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.I
)
_CT_RE = re.compile(r"charset\s*=\s*[\"']?\s*([a-zA-Z0-9_\-]+)", re.I)


def _valid_codec(name: str | None) -> str | None:
    if not name:
        return None
    try:
        codecs.lookup(name)
        return name
    except LookupError:
        return None


def sniff_encoding(data: bytes, content_type: str | None = None) -> str:
    """Return the encoding name to decode ``data`` with (see module
    docstring for the precedence chain).  Pure function of its inputs
    — shard-stable and oracle-friendly."""
    for bom, enc in _BOMS:
        if data.startswith(bom):
            return enc
    if content_type:
        m = _CT_RE.search(content_type)
        if m and _valid_codec(m.group(1)):
            return m.group(1).lower()
    m = _META_RE.search(data[:2048])
    if m:
        declared = _valid_codec(m.group(1).decode("ascii", errors="replace"))
        if declared:
            return declared.lower()
    try:
        data.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "cp1252"


def decode_html(
    data: bytes | str | None, content_type: str | None = None
) -> tuple[str, str]:
    """bytes → (text, encoding-used); str passes through unchanged."""
    if data is None:
        return "", "utf-8"
    if isinstance(data, str):
        return data, "utf-8"
    enc = sniff_encoding(data, content_type)
    # utf-8-sig strips its own BOM; the utf-16/32 -le/-be codecs do
    # NOT (only the endian-generic codecs do), so drop it explicitly
    for bom, bom_enc in _BOMS:
        if enc == bom_enc and bom_enc != "utf-8-sig" and data.startswith(bom):
            data = data[len(bom):]
            break
    return data.decode(enc, errors="replace"), enc


def sanitize_input_encode(text: str) -> str:
    """Behavior-parity with the reference ``utils.py:777-792``: text
    round-trips through utf-8 with ``errors='ignore'`` (dropping
    unpaired surrogates and other unencodable code points); empty or
    falsy input returns ''."""
    if not text:
        return ""
    return text.encode("utf-8", errors="ignore").decode("utf-8")


def decode_batch(batch, *, html_column: str = "html"):
    """Arrow batch stage: binary ``html_column`` → decoded
    ``html_text`` + ``encoding`` columns (stateless, vectorizable,
    embarrassingly parallel — the stage to put in front of extract for
    archives whose payloads are not known-utf-8)."""
    import pyarrow as pa

    texts, encs = [], []
    for b in batch[html_column].to_pylist():
        t, e = decode_html(b)
        texts.append(t)
        encs.append(e)
    batch = batch.append_column("html_text", pa.array(texts, pa.large_string()))
    return batch.append_column("encoding", pa.array(encs, pa.string()))
