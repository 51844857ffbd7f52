"""Regex extraction strategy — vectorized over Ray Data batches.

Mirrors the reference ``RegexExtractionStrategy``
(``crawl4ai/extraction_strategy.py:1891-2135``): a catalog of
precompiled built-in patterns (:1969-1997) selected by label, emitting
one ``{url, label, value, span_start}`` row per match.  Patterns are
compiled once per process (module import), matched per document inside
``map_batches`` — the Ray-native replacement for the reference's
per-page loop.
"""

from __future__ import annotations

import re

import pyarrow as pa

# Built-in catalog: same labels + patterns as the reference
# DEFAULT_PATTERNS (extraction_strategy.py:1969-1997).
DEFAULT_PATTERNS: dict[str, str] = {
    "email": r"[\w.+-]+@[\w-]+\.[\w.-]+",
    "phone_intl": r"\+?\d[\d .()-]{7,}\d",
    "phone_us": r"\(?\d{3}\)?[ -. ]?\d{3}[ -. ]?\d{4}",
    "url": r"https?://[^\s\"'<>]+",
    "ipv4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "ipv6": r"[A-F0-9]{1,4}(?::[A-F0-9]{1,4}){7}",
    "uuid": r"[0-9a-f]{8}-[0-9a-f]{4}-[1-5][0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}",
    "currency": r"(?:USD|EUR|RM|\$|€|£)\s?\d+(?:[.,]\d{2})?",
    "percentage": r"\d+(?:\.\d+)?%",
    "number": r"\b\d{1,3}(?:[,.\s]\d{3})*(?:\.\d+)?\b",
    "date_iso": r"\d{4}-\d{2}-\d{2}",
    "date_us": r"\d{1,2}/\d{1,2}/\d{2,4}",
    "time_24h": r"\b(?:[01]?\d|2[0-3]):[0-5]\d(?:[:.][0-5]\d)?\b",
    "postal_us": r"\b\d{5}(?:-\d{4})?\b",
    "postal_uk": r"\b[A-Z]{1,2}\d[A-Z\d]? ?\d[A-Z]{2}\b",
    "html_color_hex": r"#[0-9A-Fa-f]{6}\b",
    "twitter_handle": r"@[\w]{1,15}",
    "hashtag": r"#[\w-]+",
    "mac_addr": r"(?:[0-9A-Fa-f]{2}:){5}[0-9A-Fa-f]{2}",
    "iban": r"[A-Z]{2}\d{2}[A-Z0-9]{11,30}",
    "credit_card": r"\b(?:4\d{12}(?:\d{3})?|5[1-5]\d{14}|3[47]\d{13}|6(?:011|5\d{2})\d{12})\b",
}

MATCH_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("label", pa.string()),
        ("value", pa.string()),
        ("span_start", pa.int64()),
    ]
)


def make_regex_extract_fn(
    labels: list[str],
    *,
    text_column: str = "html",
    url_column: str = "url",
    custom_patterns: dict[str, str] | None = None,
    ignore_case: bool = False,
):
    """Batch fn: one output row per regex match per document.

    Note: the reference compiles with IGNORECASE|MULTILINE; here
    case-insensitivity is opt-in so the oracle SQL (DuckDB RE2,
    case-sensitive by default) matches exactly.
    """
    catalog = dict(DEFAULT_PATTERNS)
    if custom_patterns:
        catalog.update(custom_patterns)
    flags = re.MULTILINE | (re.IGNORECASE if ignore_case else 0)
    compiled = [(label, re.compile(catalog[label], flags)) for label in labels]

    def fn(batch: pa.Table) -> pa.Table:
        urls_out: list[str] = []
        labels_out: list[str] = []
        values_out: list[str] = []
        spans_out: list[int] = []
        urls = batch[url_column].to_pylist()
        texts = batch[text_column].to_pylist()
        for url, text in zip(urls, texts):
            if isinstance(text, bytes):
                text = text.decode("utf-8", errors="replace")
            for label, pattern in compiled:
                for m in pattern.finditer(text):
                    urls_out.append(url)
                    labels_out.append(label)
                    values_out.append(m.group(0))
                    spans_out.append(m.start())
        return pa.table(
            {
                "url": pa.array(urls_out, pa.string()),
                "label": pa.array(labels_out, pa.string()),
                "value": pa.array(values_out, pa.string()),
                "span_start": pa.array(spans_out, pa.int64()),
            },
            schema=MATCH_SCHEMA,
        )

    return fn


def regex_extract(ds, labels: list[str], **opts):
    """Dataset of documents → exploded matches table."""
    fn = make_regex_extract_fn(labels, **opts)
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
