"""Deterministic synthetic Common-Crawl-style pages table.

BASELINE.json ``input_hint`` requires the input table
``(url: string, warc_ts: timestamp, html: binary, text: string,
lang: string)``.  This module synthesises that table deterministically
from the driver-provided ``documents`` table of a scale-factor
directory — no external data, no RNG: every field is an arithmetic
function of ``doc_id`` and the document text, so the same sf_dir
always produces byte-identical parquet content.

Page anatomy (designed so every kernel operator has work to do AND the
per-url extracted-text invariant is checkable in SQL):

- boilerplate: nav / header / aside / footer (all excluded or pruned
  by the content-pruning filter), a link-heavy "related" div (pruned
  by score), a tracking-parameter link (exercises normalize_url);
- the article body: ``<article><p>…</p></article>`` whose
  whitespace-normalized text equals the page row's ``text`` column —
  the invariant ``extract_text(html) == text`` that the DuckDB oracle
  checks per url;
- a deterministic link graph: page *i* links to pages
  ``(3i+1) % N``, ``(7i+11) % N`` and ``(i+1) % N`` as absolute
  ``href``s (so link extraction and BFS reachability have simple SQL
  oracles), plus one external link;
- hosts: ``site{i % n_hosts}.example.com`` (host-skew: host 0 also
  absorbs every ``i % 11 == 0`` page, so per-host politeness budgeting
  is observable);
- a ``/private/`` path segment for ``i % 13 == 5`` pages —
  robots.txt-disallowed by the synthetic robots table;
- an embedded data table on ``i % 5 == 0`` pages, an email address on
  ``i % 4 == 1`` pages (regex-extraction oracle).

The generated parquet is cached under ``/tmp/graft_pages/<sf>/`` and
reused; generation is idempotent (atomic rename).
"""

from __future__ import annotations

import os
import tempfile
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq

PAGES_CACHE_ROOT = "/tmp/graft_pages"

# bump when build_page_html output changes — the /tmp cache key must
# track generator content or stale corpora leak across versions
_GEN_VERSION = 3

_EPOCH = datetime(2025, 1, 1)


def n_hosts_for(n_docs: int) -> int:
    return max(4, n_docs // 50)


def page_url(i: int, n_docs: int, variant: int = 0) -> str:
    host = f"site{_host_index(i, n_docs)}.example.com"
    if i % 13 == 5:
        path = f"/private/doc-{i}" if variant == 0 else f"/private/doc-{i}-v{variant}"
    else:
        path = f"/articles/doc-{i}" if variant == 0 else f"/articles/doc-{i}-v{variant}"
    return f"https://{host}{path}"


def _host_index(i: int, n_docs: int) -> int:
    # skew: every 11th page lands on host 0 regardless of modulus
    if i % 11 == 0:
        return 0
    return i % n_hosts_for(n_docs)


def _mk_table_html(i: int) -> str:
    rows = "".join(
        f"<tr><td>item-{i}-{r}</td><td>{(i * 7 + r * 3) % 100}</td></tr>" for r in range(3)
    )
    return (
        "<table><caption>Metrics</caption>"
        "<thead><tr><th>Key</th><th>Value</th></tr></thead>"
        f"<tbody>{rows}</tbody></table>"
    )


def _article_body(i: int, text: str) -> str:
    """The article body for document *i*: one of seven HTML families,
    all constructed so the whitespace-normalized extracted text equals
    ``text`` EXACTLY — the expected value comes from the construction,
    never from running the extraction kernel.  The families make the
    invariant non-trivial: entity/charref decoding, nbsp whitespace,
    nested lists, pre/code with raw newlines, implied/stray closes,
    exotic whitespace and inline markup all have to be handled
    correctly for the DuckDB ``extract_text`` oracle to pass.

    Construction rules that keep the invariant airtight:
    - words only move INTO child elements with explicit spaces kept in
      the surrounding text nodes (text extraction concatenates text
      nodes without separators);
    - everything stays inside <article> (one pruned block, so the
      block join never splits the text);
    - structural families keep most words in a plain paragraph so the
      pruning score of the article stays far above threshold.
    """
    words = text.split()
    fam = i % 8
    if fam == 1 and len(words) >= 4:
        # entities: every 5th word leads with a decimal charref, every
        # 9th gap is &nbsp; (U+00A0 — whitespace for str.split)
        parts = []
        for w_idx, w in enumerate(words):
            w_html = f"&#{ord(w[0])};{w[1:]}" if w_idx % 5 == 0 else w
            sep = "&nbsp;" if w_idx % 9 == 8 else " "
            parts.append(w_html + sep)
        return f"<article><p>{''.join(parts).rstrip()}</p></article>"
    if fam == 2 and len(words) >= 8:
        # nested lists: first six words as list items (explicit spaces
        # inside each li), remainder as a paragraph
        lead = (
            "<ul>"
            f"<li> {words[0]} {words[1]} "
            f"<ul><li> {words[2]} </li><li> {words[3]} </li></ul>"
            "</li>"
            f"<li> {words[4]} {words[5]} </li>"
            "</ul>"
        )
        rest = " ".join(words[6:])
        return f"<article>{lead}<p>{rest}</p></article>"
    if fam == 3 and len(words) >= 8:
        # pre/code: first five words as a raw-newline code block
        # trailing newline: text nodes concatenate with no separator,
        # so the code block must end in whitespace before the <p>
        code = f"{words[0]} {words[1]}\n  {words[2]}\n\t{words[3]} {words[4]}\n"
        rest = " ".join(words[5:])
        return f"<article><pre><code>{code}</code></pre><p>{rest}</p></article>"
    if fam == 4 and len(words) >= 6:
        # implied closes (p closes p) and a stray </b>
        half = len(words) // 2
        first = " ".join(words[:half])
        second = " ".join(words[half:])
        return f"<article><p>{first} <p>{second}</b></article>"
    if fam == 5 and len(words) >= 2:
        # exotic whitespace between words
        seps = ["\n", "\t", "  ", " \n ", " "]
        out = [words[0]]
        for w_idx, w in enumerate(words[1:]):
            out.append(seps[w_idx % len(seps)])
            out.append(w)
        return f"<article><p>{''.join(out)}</p></article>"
    if fam == 7 and len(words) >= 6:
        # comment mid-paragraph + a body <script>: neither may leak a
        # character into the extracted text (comment stripped, script
        # subtree removed before extraction)
        half = len(words) // 2
        first = " ".join(words[:half])
        second = " ".join(words[half:])
        return (
            f"<article><p>{first} <!-- hidden editorial note {i} --> "
            f"{second}</p>"
            f'<script>var trap{i} = "{words[0]} leaked?";</script></article>'
        )
    if fam == 6 and len(words) >= 6:
        # inline markup with kept separators + a charref
        w = words
        rest = " ".join(w[5:])
        return (
            f"<article><p>{w[0]} <b>{w[1]} {w[2]}</b> <i>{w[3]}</i> "
            f"&#{ord(w[4][0])};{w[4][1:]} {rest}</p></article>"
        )
    return f"<article><p>{text}</p></article>"


def build_page_html(i: int, n_docs: int, text: str, variant: int = 0) -> str:
    """Deterministic page HTML for document *i*.  The article body's
    whitespace-normalized text equals ``text`` exactly."""
    url = page_url(i, n_docs, variant)
    n = n_docs
    l1 = page_url((3 * i + 1) % n, n)
    l2 = page_url((7 * i + 11) % n, n)
    l3 = page_url((i + 1) % n, n)
    host_idx = _host_index(i, n_docs)
    home = f"https://site{host_idx}.example.com/"
    tracking = f"{l3}?utm_source=feed&utm_campaign=c{i % 3}&b=2&a=1"
    email = f"<p>Contact: editor{i}@example.com for details.</p>" if i % 4 == 1 else ""
    table = _mk_table_html(i) if i % 5 == 0 else ""
    return (
        "<html><head>"
        f"<title>Doc {i} — Synthetic Corpus</title>"
        f'<meta name="description" content="Synthetic crawl page {i}">'
        f'<meta property="og:title" content="Doc {i}">'
        "</head><body>"
        f'<nav class="nav"><a href="{home}">Home</a> <a href="{home}about">About</a> '
        f'<a href="{home}contact">Contact</a></nav>'
        f'<header class="header"><h1>Doc {i}</h1></header>'
        f"{_article_body(i, text)}"
        f'<aside class="extras">{email}{table}</aside>'
        f'<div class="related"><a href="{l1}">Related A</a> <a href="{l2}">Related B</a> '
        f'<a href="{tracking}">Related C</a></div>'
        f'<aside class="sidebar"><a href="{home}tags">Tags</a> <a href="{home}archive">Archive</a></aside>'
        f'<footer class="footer"><a href="https://external-site.org/partner/{i % 20}">Partner</a> '
        f'<a href="{home}privacy">Privacy</a></footer>'
        "</body></html>"
    )


def normalize_text(text: str) -> str:
    return " ".join(text.split())


def generate_pages_table(
    sf_dir: str, *, variants: int = 1, paragraphs: int = 1
) -> pa.Table:
    """Build the pages Arrow table from ``{sf_dir}/documents.parquet``.

    ``variants`` > 1 amplifies the corpus for benchmarks (each variant
    is a distinct url with the same article text). ``paragraphs`` > 1
    repeats the article paragraph to fatten pages toward realistic
    crawl sizes.
    """
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    doc_ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    langs = docs["lang"].to_pylist()
    n = len(doc_ids)

    urls: list[str] = []
    tss: list[datetime] = []
    htmls: list[bytes] = []
    out_texts: list[str] = []
    out_langs: list[str] = []

    for idx in range(n):
        i = doc_ids[idx]
        base_text = normalize_text(texts[idx])
        if paragraphs > 1:
            body_text = " ".join([base_text] * paragraphs)
        else:
            body_text = base_text
        for v in range(variants):
            urls.append(page_url(i, n, v))
            tss.append(_EPOCH + timedelta(seconds=(i * 977 + v * 131) % 31_536_000))
            htmls.append(build_page_html(i, n, body_text, v).encode("utf-8"))
            out_texts.append(body_text)
            out_langs.append(langs[idx])

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(out_texts, pa.string()),
            "lang": pa.array(out_langs, pa.string()),
        }
    )


def pages_parquet_path(sf_dir: str, *, variants: int = 1, paragraphs: int = 1) -> str:
    """Directory of pages parquet part-files for ``sf_dir``; generated
    on first use (atomic directory rename, safe under concurrent
    callers).

    Layout matters for scaling: MANY part files with SMALL row groups.
    Ray Data parallelizes parquet scans at file/row-group granularity —
    one big single-row-group file = one serial read task that starves
    every downstream stage (measured: 3.6× parallelism on 32 cores
    before this change)."""
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    suffix = "" if (variants == 1 and paragraphs == 1) else f"_v{variants}_p{paragraphs}"
    out_dir = os.path.join(PAGES_CACHE_ROOT, f"{sf_name}{suffix}_g{_GEN_VERSION}")
    if os.path.isdir(out_dir) and any(n.endswith(".parquet") for n in os.listdir(out_dir)):
        return out_dir
    os.makedirs(PAGES_CACHE_ROOT, exist_ok=True)
    table = generate_pages_table(sf_dir, variants=variants, paragraphs=paragraphs)
    # sort by url: row-group min/max stats then let point-lookup reads
    # (frontier fetch) prune row groups instead of rescanning the corpus
    table = table.sort_by("url")
    tmp_dir = tempfile.mkdtemp(dir=PAGES_CACHE_ROOT)
    try:
        n = table.num_rows
        rows_per_file = max(256, min(2048, n // 32 or n))
        part = 0
        for start in range(0, n, rows_per_file):
            chunk = table.slice(start, rows_per_file)
            pq.write_table(
                chunk,
                os.path.join(tmp_dir, f"pages_{part:05d}.parquet"),
                row_group_size=256,
            )
            part += 1
        os.rename(tmp_dir, out_dir)
    except OSError:
        # lost the rename race — another process generated it
        import shutil

        shutil.rmtree(tmp_dir, ignore_errors=True)
        if not os.path.isdir(out_dir):
            raise
    return out_dir
