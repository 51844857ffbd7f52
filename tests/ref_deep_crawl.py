"""Test-only loader for the reference's deep-crawl strategies.

Loads ``/root/reference/crawl4ai/deep_crawling/`` READ-ONLY as the
crawl-ordering oracle: the real ``BFSDeepCrawlStrategy`` /
``BestFirstCrawlingStrategy`` / ``DFSDeepCrawlStrategy`` code runs
against a stub crawler that "fetches" from the synthetic pages table,
and the visited set / depth / parent metadata is compared against this
repo's BSP frontier — the north star's "crawl ordering and URL-seen
set must match the reference crawler" proven against the reference's
own implementation, not a hand mirror.

The reference package can't import wholesale here (its ``utils``
needs lxml/bs4/aiohttp, absent in this env), so the loader stubs
exactly what the deep_crawling modules import:

* ``crawl4ai.types`` / ``crawl4ai.models`` — loaded from the real
  files (lazy string types; pydantic models).
* ``crawl4ai.ssl_certificate`` — this repo's stdlib SSLCertificate
  (same dict-subclass surface), avoiding the pyOpenSSL import.
* ``crawl4ai.utils`` — only the three names deep_crawling imports
  (``normalize_url_for_deep_crawl``,
  ``efficient_normalize_url_for_deep_crawl``, ``HeadPeekr``),
  AST-extracted from the real ``utils.py`` so the oracle normalizer
  is the reference's own code, byte-for-byte.
"""

from __future__ import annotations

import ast
import importlib.util
import sys
import types
from functools import lru_cache
from urllib.parse import urlparse, urlunparse

_REF = "/root/reference/crawl4ai"


def _load_file(fullname: str, path: str, search: list[str] | None = None):
    spec = importlib.util.spec_from_file_location(
        fullname, path, submodule_search_locations=search
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    return mod


def _extract_utils() -> types.ModuleType:
    wanted = {
        "normalize_url_for_deep_crawl",
        "efficient_normalize_url_for_deep_crawl",
        "HeadPeekr",
    }
    tree = ast.parse(open(_REF + "/utils.py").read())
    nodes = [
        n
        for n in tree.body
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef))
        and n.name in wanted
    ]
    mod = types.ModuleType("crawl4ai.utils")
    # globals the extracted defs reference at runtime
    mod.__dict__.update(
        lru_cache=lru_cache, urlparse=urlparse, urlunparse=urlunparse
    )
    code = compile(ast.Module(body=nodes, type_ignores=[]), "utils-extract", "exec")
    exec(code, mod.__dict__)
    missing = wanted - set(mod.__dict__)
    assert not missing, f"utils extraction missed {missing}"
    sys.modules["crawl4ai.utils"] = mod
    return mod


def load_reference_deep_crawl():
    """Returns the reference ``crawl4ai.deep_crawling`` package (plus
    ``crawl4ai.models`` registered for CrawlResult construction)."""
    if "crawl4ai.deep_crawling" in sys.modules:
        return sys.modules["crawl4ai.deep_crawling"]
    if "crawl4ai" not in sys.modules:
        pkg = types.ModuleType("crawl4ai")
        pkg.__path__ = [_REF]
        sys.modules["crawl4ai"] = pkg
    # ssl_certificate: swap in this repo's stdlib implementation (the
    # reference file imports pyOpenSSL at module level)
    if "crawl4ai.ssl_certificate" not in sys.modules:
        from crawl4ai_custom_ray.functions import ssl_certs

        shim = types.ModuleType("crawl4ai.ssl_certificate")
        shim.SSLCertificate = ssl_certs.SSLCertificate
        sys.modules["crawl4ai.ssl_certificate"] = shim
    if "crawl4ai.types" not in sys.modules:
        _load_file("crawl4ai.types", _REF + "/types.py")
    if "crawl4ai.utils" not in sys.modules:
        _extract_utils()
    if "crawl4ai.models" not in sys.modules:
        _load_file("crawl4ai.models", _REF + "/models.py")
    return _load_file(
        "crawl4ai.deep_crawling",
        _REF + "/deep_crawling/__init__.py",
        search=[_REF + "/deep_crawling"],
    )


class StubRunConfig:
    """Duck-typed CrawlerRunConfig: the strategies only call
    ``clone(...)`` and read ``stream``/``deep_crawl_strategy``."""

    def __init__(self, **kw):
        self.deep_crawl_strategy = kw.get("deep_crawl_strategy")
        self.stream = kw.get("stream", False)

    def clone(self, **kw):
        out = StubRunConfig()
        out.__dict__.update(self.__dict__)
        out.__dict__.update(kw)
        return out


class StubCrawler:
    """arun_many over the synthetic pages table: 'fetch' = table
    lookup, link extraction = this repo's scrape kernel emitting the
    reference's links-dict shape."""

    def __init__(self, pages: dict[str, str]):
        self.pages = pages
        from crawl4ai.models import CrawlResult  # loaded by the loader

        self._CrawlResult = CrawlResult

    def _links_for(self, url: str, html: str) -> dict:
        from crawl4ai_custom_ray.html.fastparse import parse_fast
        from crawl4ai_custom_ray.html.scrape import scrape_tree

        scraped = scrape_tree(url, parse_fast(html))
        return {
            "internal": [dict(l) for l in scraped["links"]["internal"]],
            "external": [dict(l) for l in scraped["links"]["external"]],
        }

    async def arun_many(self, urls, config=None):
        results = self._results_for(urls)
        if config is not None and getattr(config, "stream", False):
            async def gen():
                for r in results:
                    yield r

            return gen()
        return results

    def _results_for(self, urls):
        out = []
        for url in urls:
            html = self.pages.get(url)
            if html is None:
                out.append(
                    self._CrawlResult(
                        url=url, html="", success=False, status_code=404
                    )
                )
                continue
            result = self._CrawlResult(
                url=url, html=html, success=True, status_code=200
            )
            result.links = self._links_for(url, html)
            out.append(result)
        return out
