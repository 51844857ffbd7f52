"""URL seeder: sitemap discovery → filter → score → limit.

Mirrors the reference ``AsyncUrlSeeder``
(``crawl4ai/async_url_seeder.py``): recursive sitemap.xml /
sitemap-index walk (``_from_sitemaps`` / ``_iter_sitemap``,
:765-1004), glob ``pattern`` filter, BM25 relevance scoring of URLs
against a query, ``max_urls`` cap (``urls`` orchestration, :267-449).

Batch-engine shape: sitemaps are rows of a table ``(host,
sitemap_url, xml, is_index)``; index expansion is a bounded loop of
``map_batches`` rounds (sitemap nesting is shallow); filtering and
scoring are vectorized batch fns.  The synthetic corpus generator
derives one sitemap index + per-section urlsets per host from the
pages table, deterministically.
"""

from __future__ import annotations

import fnmatch
import os
import re
import tempfile
import xml.etree.ElementTree as ET

import pyarrow as pa
import pyarrow.parquet as pq

from .pages import PAGES_CACHE_ROOT, pages_parquet_path

_SITEMAP_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"


# ------------------------------------------------------------- parsing


def parse_sitemap(xml_text: str) -> tuple[list[str], list[str]]:
    """→ (page_urls, nested_sitemap_urls).  Handles ``urlset`` and
    ``sitemapindex``, namespaced or not (reference namespace handling:
    ``tests/unit/test_sitemap_namespace_parsing.py``)."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return [], []
    tag = root.tag.split("}")[-1]
    urls: list[str] = []
    nested: list[str] = []
    for child in root:
        ctag = child.tag.split("}")[-1]
        loc = None
        for sub in child:
            if sub.tag.split("}")[-1] == "loc":
                loc = (sub.text or "").strip()
                break
        if not loc:
            continue
        if tag == "sitemapindex" and ctag == "sitemap":
            nested.append(loc)
        elif ctag == "url":
            urls.append(loc)
    return urls, nested


# ------------------------------------------------ synthetic generation


def build_sitemaps_table(sf_dir: str) -> pa.Table:
    """Deterministic per-host sitemap index + section urlsets from the
    synthetic pages table."""
    pages_dir = pages_parquet_path(sf_dir)
    urls = pq.read_table(pages_dir, columns=["url"])["url"].to_pylist()
    by_host: dict[str, list[str]] = {}
    for u in sorted(urls):
        host = u.split("/")[2]
        by_host.setdefault(host, []).append(u)

    hosts, smap_urls, xmls, is_index = [], [], [], []
    for host, host_urls in sorted(by_host.items()):
        # split into sections of ≤50 urls
        sections = [host_urls[i : i + 50] for i in range(0, len(host_urls), 50)]
        index_entries = []
        for si, section in enumerate(sections):
            smap_url = f"https://{host}/sitemap-{si}.xml"
            index_entries.append(smap_url)
            body = "".join(f"<url><loc>{u}</loc></url>" for u in section)
            xmls.append(
                '<?xml version="1.0" encoding="UTF-8"?>'
                '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                f"{body}</urlset>"
            )
            hosts.append(host)
            smap_urls.append(smap_url)
            is_index.append(False)
        body = "".join(f"<sitemap><loc>{u}</loc></sitemap>" for u in index_entries)
        xmls.append(
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            f"{body}</sitemapindex>"
        )
        hosts.append(host)
        smap_urls.append(f"https://{host}/sitemap.xml")
        is_index.append(True)

    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "sitemap_url": pa.array(smap_urls, pa.string()),
            "xml": pa.array(xmls, pa.large_string()),
            "is_index": pa.array(is_index, pa.bool_()),
        }
    )


def sitemaps_parquet_path(sf_dir: str) -> str:
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(PAGES_CACHE_ROOT, f"{sf_name}_sitemaps")
    if os.path.isdir(out_dir) and any(n.endswith(".parquet") for n in os.listdir(out_dir)):
        return out_dir
    os.makedirs(PAGES_CACHE_ROOT, exist_ok=True)
    table = build_sitemaps_table(sf_dir)
    tmp_dir = tempfile.mkdtemp(dir=PAGES_CACHE_ROOT)
    try:
        pq.write_table(table, os.path.join(tmp_dir, "sitemaps_00000.parquet"), row_group_size=256)
        os.rename(tmp_dir, out_dir)
    except OSError:
        import shutil

        shutil.rmtree(tmp_dir, ignore_errors=True)
        if not os.path.isdir(out_dir):
            raise
    return out_dir


# --------------------------------------- robots.txt sitemap discovery

# Reference ``_from_sitemaps`` step 2 (``async_url_seeder.py:807-827``):
# when default sitemap probing fails, robots.txt's ``Sitemap:`` lines
# are the discovery source.  Line parse mirrors the reference exactly:
# ``line.lower().startswith("sitemap:")`` → ``split(":", 1)[1].strip()``.


def build_robots_seed_table(sf_dir: str) -> pa.Table:
    """Deterministic per-host robots.txt corpus: every host carries the
    synthetic rules; hosts NOT ending in ``0`` additionally advertise
    their sitemap index via a ``Sitemap:`` line (the omission hosts
    exercise the reference's none-found early return), and hosts with
    ``i % 4 != 0`` declare ``Crawl-delay: i%4`` INSIDE the ``*`` entry
    (stdlib robotparser only honors integer delays within an entry)."""
    from ..frontier.robots import DEFAULT_SYNTHETIC_RULES

    smaps = build_sitemaps_table(sf_dir)
    hosts = sorted(set(smaps["host"].to_pylist()))
    texts = []
    for i, h in enumerate(hosts):
        txt = DEFAULT_SYNTHETIC_RULES
        if i % 4:
            txt += f"Crawl-delay: {i % 4}\n"
        if not h.split(".")[0].endswith("0"):
            txt += f"Sitemap: https://{h}/sitemap.xml\n"
        texts.append(txt)
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "robots_txt": pa.array(texts, pa.string()),
        }
    )


def robots_seed_parquet_path(sf_dir: str) -> str:
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(PAGES_CACHE_ROOT, f"{sf_name}_robots_seed_g2")
    if os.path.isdir(out_dir) and any(
        n.endswith(".parquet") for n in os.listdir(out_dir)
    ):
        return out_dir
    os.makedirs(PAGES_CACHE_ROOT, exist_ok=True)
    table = build_robots_seed_table(sf_dir)
    tmp_dir = tempfile.mkdtemp(dir=PAGES_CACHE_ROOT)
    try:
        pq.write_table(
            table,
            os.path.join(tmp_dir, "robots_00000.parquet"),
            row_group_size=256,
        )
        os.rename(tmp_dir, out_dir)
    except OSError:
        import shutil

        shutil.rmtree(tmp_dir, ignore_errors=True)
        if not os.path.isdir(out_dir):
            raise
    return out_dir


def sitemaps_from_robots(robots_ds):
    """(host, robots_txt) → (host, sitemap_url) rows, reference line
    semantics (case-insensitive prefix, first-colon split, strip)."""

    def extract(batch: pa.Table) -> pa.Table:
        hosts, sms = [], []
        for h, txt in zip(
            batch["host"].to_pylist(), batch["robots_txt"].to_pylist()
        ):
            for line in (txt or "").splitlines():
                if line.lower().startswith("sitemap:"):
                    hosts.append(h)
                    sms.append(line.split(":", 1)[1].strip())
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "sitemap_url": pa.array(sms, pa.string()),
            }
        )

    return robots_ds.map_batches(extract, batch_format="pyarrow")


def seed_from_robots(sf_dir: str, *, pattern: str | None = None):
    """Full robots-fallback discovery chain: robots ``Sitemap:`` lines
    → index expansion (parse ``<sitemapindex>`` leaves) → urlset walk
    → pattern-filtered seed URLs.  Unlike :func:`seed_urls`' shortcut
    (every leaf already a table row), this path RESOLVES nesting by
    joining discovered/locs back onto the sitemap table — the
    reference's recursive ``_iter_sitemap`` as data movement."""
    import ray.data as rd

    from ..functions.dedup import _join_partitions, hash_join_safe

    robots = rd.read_parquet(robots_seed_parquet_path(sf_dir))
    smaps = rd.read_parquet(sitemaps_parquet_path(sf_dir))
    discovered = sitemaps_from_robots(robots).select_columns(["sitemap_url"])

    roots = hash_join_safe(
        smaps,
        discovered,
        on=("sitemap_url",),
        num_partitions=2,
    )

    def expand(batch: pa.Table) -> pa.Table:
        # index rows yield their nested locs; leaf rows pass through
        locs = []
        for xml_text, is_index, own in zip(
            batch["xml"].to_pylist(),
            batch["is_index"].to_pylist(),
            batch["sitemap_url"].to_pylist(),
        ):
            if is_index:
                _urls, nested = parse_sitemap(xml_text)
                locs.extend(nested)
            else:
                locs.append(own)
        return pa.table({"loc": pa.array(locs, pa.string())})

    leaves = hash_join_safe(
        smaps,
        roots.map_batches(expand, batch_format="pyarrow"),
        on=("sitemap_url",),
        right_on=("loc",),
        num_partitions=2,
    )

    def urls(batch: pa.Table) -> pa.Table:
        out = []
        for xml_text, is_index in zip(
            batch["xml"].to_pylist(), batch["is_index"].to_pylist()
        ):
            if is_index:
                continue
            page_urls, _nested = parse_sitemap(xml_text)
            for u in page_urls:
                if pattern and not fnmatch.fnmatch(u, pattern):
                    continue
                out.append(u)
        return pa.table({"url": pa.array(out, pa.string())})

    return leaves.map_batches(urls, batch_format="pyarrow")


# ----------------------------------------------- Common-Crawl-style index


def build_cc_index_table(sf_dir: str) -> pa.Table:
    """Deterministic Common-Crawl-style index records from the pages
    table: one record per capture, shaped like the CC index API's JSON
    lines (url, timestamp, mime, status, digest) — the realistic seed
    source for this engine (reference ``_from_cc``,
    ``async_url_seeder.py:709-764``).  Adds deterministic non-200 /
    non-html noise records so filters have something to reject."""
    import hashlib

    pages_dir = pages_parquet_path(sf_dir)
    urls = sorted(pq.read_table(pages_dir, columns=["url"])["url"].to_pylist())
    rec_urls, tss, mimes, statuses, digests = [], [], [], [], []
    for i, u in enumerate(urls):
        rec_urls.append(u)
        tss.append(f"202401{(i % 28) + 1:02d}{(i * 7) % 24:02d}0000")
        mimes.append("text/html")
        statuses.append(200)
        digests.append(hashlib.md5(u.encode()).hexdigest())
        if i % 7 == 0:  # a dead capture of the same url
            rec_urls.append(u)
            tss.append(f"202312{(i % 28) + 1:02d}000000")
            mimes.append("text/html")
            statuses.append(404)
            digests.append(hashlib.md5((u + "#dead").encode()).hexdigest())
        if i % 11 == 0:  # a non-html asset next to it
            rec_urls.append(u.rsplit("/", 1)[0] + f"/asset-{i}.css")
            tss.append(f"202401{(i % 28) + 1:02d}120000")
            mimes.append("text/css")
            statuses.append(200)
            digests.append(hashlib.md5((u + "#css").encode()).hexdigest())
    return pa.table(
        {
            "url": pa.array(rec_urls, pa.string()),
            "warc_ts": pa.array(tss, pa.string()),
            "mime": pa.array(mimes, pa.string()),
            "status": pa.array(statuses, pa.int32()),
            "digest": pa.array(digests, pa.string()),
        }
    )


def cc_index_parquet_path(sf_dir: str) -> str:
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(PAGES_CACHE_ROOT, f"{sf_name}_ccindex")
    if os.path.isdir(out_dir) and any(n.endswith(".parquet") for n in os.listdir(out_dir)):
        return out_dir
    os.makedirs(PAGES_CACHE_ROOT, exist_ok=True)
    table = build_cc_index_table(sf_dir)
    tmp_dir = tempfile.mkdtemp(dir=PAGES_CACHE_ROOT)
    try:
        pq.write_table(table, os.path.join(tmp_dir, "ccindex_00000.parquet"), row_group_size=256)
        os.rename(tmp_dir, out_dir)
    except OSError:
        import shutil

        shutil.rmtree(tmp_dir, ignore_errors=True)
        if not os.path.isdir(out_dir):
            raise
    return out_dir


def _cc_normalize_domain(domain: str) -> str:
    """Reference's CC domain normalization (:714-716): strip scheme,
    fragment, query, leading dots."""
    raw = re.sub(r"^https?://", "", domain).split("#", 1)[0].split("?", 1)[0]
    return raw.lstrip(".")


def match_url_pattern(url: str, pattern: str) -> bool:
    """Reference ``_match`` (async_url_seeder.py:81-86): glob against
    the full url, the scheme-stripped form, and the www-stripped
    form."""
    if fnmatch.fnmatch(url, pattern):
        return True
    canon = url.split("://", 1)[-1]
    return fnmatch.fnmatch(canon, pattern) or (
        canon.startswith("www.") and fnmatch.fnmatch(canon[4:], pattern)
    )


def seed_from_cc_index(
    cc_ds,
    *,
    domain: str,
    pattern: str = "*",
    only_ok_html: bool = True,
    max_urls: int = -1,
):
    """CC-index table → seed URL Dataset (url), distinct and
    deterministic.

    Mirrors ``_from_cc`` semantics over a local index table: the
    domain becomes the CC glob (``*.domain/*`` for bare domains,
    ``*.domain*`` when a path is present, matched against the
    scheme-stripped url — the server-side filter), then the user
    ``pattern`` gates each record like the reference ``_match``.
    ``only_ok_html`` keeps 200/text-html captures (a live CC reader
    filters the same way); ``max_urls`` caps deterministically by url
    order."""
    raw = _cc_normalize_domain(domain)
    cc_glob = f"*.{raw}*" if "/" in raw else f"*.{raw}/*"
    # the CC index matches hosts with or without subdomain — accept
    # both "site.dom/*" and "*.site.dom/*" forms like the index does
    alt_glob = f"{raw}*" if "/" in raw else f"{raw}/*"

    def keep(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        mimes = batch["mime"].to_pylist()
        statuses = batch["status"].to_pylist()
        mask = []
        for u, m, st in zip(urls, mimes, statuses):
            canon = u.split("://", 1)[-1]
            ok = fnmatch.fnmatch(canon, cc_glob) or fnmatch.fnmatch(canon, alt_glob)
            if ok and only_ok_html:
                ok = st == 200 and m.startswith("text/html")
            if ok:
                ok = match_url_pattern(u, pattern)
            mask.append(ok)
        return batch.filter(pa.array(mask, pa.bool_())).select(["url"])

    # distinct (multiple captures of one url) as a groupby, streaming
    out = (
        cc_ds.map_batches(keep, batch_format="pyarrow")
        .groupby("url")
        .count()
        .select_columns(["url"])
    )
    if max_urls and max_urls > 0:
        out = out.sort("url").limit(max_urls)
    return out


# ------------------------------------------------------------ pipeline


def _url_score_fn(query: str | None):
    if not query:
        return None
    query_terms = set(query.lower().split())

    def score(url: str) -> float:
        tokens = set(re.split(r"[^a-z0-9]+", url.lower())) - {""}
        if not tokens:
            return 0.0
        return len(tokens & query_terms) / len(query_terms)

    return score


def seed_urls(
    sitemaps_ds,
    *,
    pattern: str | None = None,
    query: str | None = None,
    max_urls: int = -1,
):
    """Sitemap table → seed URL Dataset (url, score).

    Index sitemaps expand to their leaves (the leaves are already rows
    of the table, so expansion here is just filtering to non-index
    rows — a live seeder would fetch nested sitemaps per round);
    urlsets are parsed, pattern-filtered, scored, capped.
    """

    def extract(batch: pa.Table) -> pa.Table:
        urls_out, scores_out = [], []
        score_fn = _url_score_fn(query)
        for xml_text, is_index in zip(
            batch["xml"].to_pylist(), batch["is_index"].to_pylist()
        ):
            if is_index:
                continue
            urls, _nested = parse_sitemap(xml_text)
            for u in urls:
                if pattern and not fnmatch.fnmatch(u, pattern):
                    continue
                urls_out.append(u)
                scores_out.append(score_fn(u) if score_fn else 0.0)
        return pa.table(
            {
                "url": pa.array(urls_out, pa.string()),
                "score": pa.array(scores_out, pa.float64()),
            }
        )

    out = sitemaps_ds.map_batches(extract, batch_format="pyarrow")
    if max_urls and max_urls > 0:
        out = out.sort(["score", "url"], descending=[True, False]).limit(max_urls)
    return out
