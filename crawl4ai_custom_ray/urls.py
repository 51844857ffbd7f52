"""URL normalization, canonical digests and host helpers.

Pure functions (no Ray).  Semantics mirror the reference's extended
normalizer (``crawl4ai/utils.py:2223-2321``), its deep-crawl variant
(``utils.py:2324-2380``), ``get_base_domain`` (``utils.py:2458-2506``)
and ``is_external_url`` (``utils.py:2509-2540``) — re-implemented from
observed behavior, not copied.

``url_digest`` defines the canonical 64-bit partitioning/dedup key used
across the frontier tables (SURVEY.md §7.3): hash-partitioning by this
digest (never by host) controls host skew explicitly.
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import parse_qs, parse_qsl, urlencode, urljoin, urlparse, urlunparse

# Query keys dropped by the extended normalizer (reference utils.py:2293-2296).
TRACKING_PARAMS = frozenset(
    {
        "utm_source",
        "utm_medium",
        "utm_campaign",
        "utm_term",
        "utm_content",
        "gclid",
        "fbclid",
        "ref",
        "ref_src",
    }
)

# Tracking keys of the lighter deep-crawl normalizer (utils.py:2360-2363).
DEEP_CRAWL_TRACKING_PARAMS = ("utm_source", "utm_medium", "utm_campaign", "ref", "fbclid")

_SPECIAL_SCHEMES = ("mailto:", "tel:", "ftp:", "file:", "data:", "javascript:")

# Second-level registrable suffixes recognised by the reference's
# eTLD-ish heuristic (utils.py:2484-2500).
_SECOND_LEVEL = frozenset(
    {"co", "com", "org", "gov", "edu", "net", "mil", "int", "ac", "ad", "ae", "af", "ag"}
)

_WWW_RE = re.compile(r"^www\.")

# ----------------------------------------------------------- fast paths
# urlparse/urljoin dominate the scrape kernel's link loop (~15% of
# extract_page).  The helpers below handle only the overwhelmingly
# common shapes — absolute http(s) URLs and simple relative hrefs with
# no dot segments — and return None for anything else so callers fall
# back to the stdlib (differential-tested equivalence in
# tests/test_urls.py).

_CTRL = ("\t", "\r", "\n")  # urlsplit strips these anywhere; we bail


def _fast_netloc(url: str) -> str | None:
    """netloc of a plain absolute http(s) URL, else None."""
    if url.startswith("http://"):
        start = 7
    elif url.startswith("https://"):
        start = 8
    else:
        return None
    for ch in _CTRL:
        if ch in url:
            return None
    end = len(url)
    for ch in "/?#":
        i = url.find(ch, start)
        if i != -1 and i < end:
            end = i
    return url[start:end]


# base_url → (scheme, netloc, dirpath) or None (unsupported base);
# pages share one base so this stays tiny — cleared past 1024 entries.
_BASE_SPLIT_CACHE: dict[str, tuple[str, str, str] | None] = {}


def _fast_join(base: str, href: str) -> str | None:
    """urljoin for the common cases; None = caller must use urljoin."""
    if not href:
        return None
    # urlsplit strips edge whitespace/controls and elides a bare
    # trailing '?'/'#'; those shapes go to the stdlib
    if href[0] <= " " or href[-1] <= " " or href[-1] in "?#":
        return None
    for ch in _CTRL:
        if ch in href:
            return None
    cached = _BASE_SPLIT_CACHE.get(base, "")
    if cached == "":
        if len(_BASE_SPLIT_CACHE) > 1024:
            _BASE_SPLIT_CACHE.clear()
        parsed = urlparse(base)
        if (
            parsed.scheme in ("http", "https")
            and parsed.netloc
            and not parsed.params
            and "./" not in parsed.path
        ):
            path = parsed.path or "/"
            d = path.rfind("/")
            dirpath = path[: d + 1] if d >= 0 else "/"
            cached = (parsed.scheme, parsed.netloc, dirpath)
        else:
            cached = None
        _BASE_SPLIT_CACHE[base] = cached
    if cached is None:
        return None
    scheme, netloc, dirpath = cached
    if href.startswith("//"):
        # need a real netloc char ('//', '///x' resolve oddly)
        if len(href) < 3 or href[2] in "/?#":
            return None
        return scheme + ":" + href
    # shared guards for both path branches: '//' (stdlib collapses
    # empty segments), '?#' (a bare '?' before '#' is elided), '/.'
    # (covers /./  /..  and dot segments cut by '?' '#' or end)
    if "//" in href or "?#" in href or "/." in href:
        return None
    if href.startswith("/"):
        return scheme + "://" + netloc + href
    if ":" in href or href[0] in "?#.":
        return None
    return scheme + "://" + netloc + dirpath + href


def normalize_url(
    href: str | None,
    base_url: str,
    *,
    drop_query_tracking: bool = True,
    sort_query: bool = True,
    keep_fragment: bool = False,
    extra_drop_params=None,
) -> str | None:
    """Extended canonical URL normalizer.

    Resolve relative ``href`` against ``base_url``, lowercase the
    netloc, strip the trailing slash (except root), drop tracking query
    params, lowercase+sort query keys, drop the fragment.
    """
    if not href:
        return None
    href = href.strip()
    # fast path: already-absolute http(s) urls without dot segments
    # (urljoin would only resolve ./.. there)
    if href.startswith(("http://", "https://")) and "/." not in href:
        full_url = href
    else:
        full_url = _fast_join(base_url, href)
        if full_url is None:
            full_url = urljoin(base_url, href)
    parsed = urlparse(full_url)

    netloc = parsed.netloc.lower()

    path = parsed.path
    if path.endswith("/") and path != "/":
        path = path.rstrip("/")

    query = parsed.query
    if query:
        params = [(k.lower(), v) for k, v in parse_qsl(query, keep_blank_values=True)]
        if drop_query_tracking:
            drop = set(TRACKING_PARAMS)
            if extra_drop_params:
                drop |= {p.lower() for p in extra_drop_params}
            params = [(k, v) for k, v in params if k not in drop]
        if sort_query:
            params.sort(key=lambda kv: kv[0])
        query = urlencode(params, doseq=True) if params else ""

    fragment = parsed.fragment if keep_fragment else ""
    return urlunparse((parsed.scheme, netloc, path, parsed.params, query, fragment))


def normalize_url_for_deep_crawl(href: str | None, base_url: str) -> str | None:
    """Lighter normalizer used on the frontier link-discovery path
    (reference ``utils.py:2324-2380``, called at ``bfs_strategy.py:111``):
    resolve, lowercase netloc, rstrip path ``/``, drop fragment, drop
    the short tracking-param list.  Function-differential-tested
    byte-equal to the reference's own code in
    tests/test_ref_crawl_parity.py — the reference groups query params
    with ``parse_qs`` + ``urlencode(doseq=True)`` (insertion order of
    first appearance, duplicates grouped, blank values dropped) and
    does NOT sort keys; replicated exactly."""
    if not href:
        return None
    full_url = urljoin(base_url, href.strip())
    parsed = urlparse(full_url)
    query = parsed.query
    if query:
        params = parse_qs(query)
        for key in DEEP_CRAWL_TRACKING_PARAMS:
            if key in params:
                del params[key]
        query = urlencode(params, doseq=True) if params else ""
    return urlunparse(
        (parsed.scheme, parsed.netloc.lower(), parsed.path.rstrip("/"), parsed.params, query, "")
    )


def get_base_domain(url: str) -> str:
    """Registrable base domain (handles ``co.uk``-style suffixes with a
    small hardcoded second-level set, like the reference)."""
    try:
        netloc = _fast_netloc(url)
        if netloc is None:
            netloc = urlparse(url).netloc
        domain = netloc.lower()
        if not domain:
            return ""
        domain = domain.split(":")[0]
        domain = _WWW_RE.sub("", domain)
        parts = domain.split(".")
        if len(parts) > 2 and parts[-2] in _SECOND_LEVEL:
            return ".".join(parts[-3:])
        return ".".join(parts[-2:])
    except Exception:
        return ""


def is_external_url(url: str, base_domain: str) -> bool:
    """True when ``url`` leaves ``base_domain`` (or is a non-web scheme)."""
    low = url.lower()
    if any(low.startswith(p) for p in _SPECIAL_SCHEMES):
        return True
    try:
        netloc = _fast_netloc(url)
        if netloc is None:
            netloc = urlparse(url).netloc
        if not netloc:
            return False
        url_domain = netloc.lower().replace("www.", "")
        base = base_domain.lower().replace("www.", "")
        return not url_domain.endswith(base)
    except Exception:
        return False


def url_host(url: str) -> str:
    """netloc (lowercased, port kept) — the politeness-sharding key,
    matching the reference rate limiter's ``urlparse(url).netloc``
    (``async_dispatcher.py:42-43``)."""
    try:
        netloc = _fast_netloc(url)
        if netloc is None:
            netloc = urlparse(url).netloc
        return netloc.lower()
    except Exception:
        return ""


def url_digest(url: str) -> int:
    """Stable unsigned-64-bit canonical digest of an (already
    normalized) URL.  blake2b(8 bytes) — deterministic across
    processes/nodes (unlike ``hash()``), cheap, and uniform enough to
    hash-partition a 10^10-URL frontier."""
    return int.from_bytes(hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest(), "big")


def url_digest_bytes(url: str) -> bytes:
    return hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest()
