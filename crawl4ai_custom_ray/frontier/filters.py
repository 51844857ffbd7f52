"""URL filters — vectorized predicates for frontier rounds.

Mirrors the reference ``deep_crawling/filters.py``:

- :class:`URLPatternFilter` (:119-263): glob/regex matcher with
  categorized fast paths (``*.html`` suffix, ``/foo/*`` prefix with
  path-boundary check, ``*.example.com`` domain, complex glob→regex),
  ``reverse`` flag;
- :class:`ContentTypeFilter` (:266-429): extension→MIME allowlist,
  extensionless URLs allowed;
- :class:`DomainFilter` (:432-506): allow/block lists with subdomain
  semantics (``example.com`` matches ``sub.example.com``);
- :class:`FilterChain` (:69-116): short-circuit AND.

Each filter implements ``apply(url) -> bool`` (reference parity) and
``apply_many(urls) -> list[bool]`` (the Ray batch path — one
vectorized pass per Arrow batch, no lru_cache needed because the
kernel is applied batch-wise).
"""

from __future__ import annotations

import fnmatch
import re
from urllib.parse import urlparse


class BaseFilter:
    def apply(self, url: str) -> bool:  # pragma: no cover - interface
        raise NotImplementedError

    def apply_many(self, urls: list[str]) -> list[bool]:
        return [self.apply(u) for u in urls]


class URLPatternFilter(BaseFilter):
    def __init__(self, patterns, use_glob: bool = True, reverse: bool = False):
        if isinstance(patterns, (str, re.Pattern)):
            patterns = [patterns]
        self.reverse = reverse
        self._suffixes: set[str] = set()
        self._prefixes: set[str] = set()
        self._domain_patterns: list[re.Pattern] = []
        self._path_patterns: list[re.Pattern] = []

        for pattern in patterns:
            if isinstance(pattern, re.Pattern):
                self._path_patterns.append(pattern)
                continue
            if pattern.startswith("^") or pattern.endswith("$") or "\\d" in pattern:
                self._path_patterns.append(re.compile(pattern))
            elif "://" in pattern and pattern.startswith("*."):
                self._domain_patterns.append(re.compile(pattern.replace("*.", r"[^/]+\.")))
            elif pattern.count("*") == 1 and pattern.startswith("*."):
                self._suffixes.add(pattern[2:])
            elif pattern.count("*") == 1 and pattern.endswith("/*"):
                self._prefixes.add(pattern[:-2])
            else:
                if "**" in pattern:
                    pattern = pattern.replace("**", ".*")
                if "{" in pattern:
                    pattern = re.sub(
                        r"\{([^}]+)\}",
                        lambda m: f'({"|".join(m.group(1).split(","))})',
                        pattern,
                    )
                self._path_patterns.append(re.compile(fnmatch.translate(pattern)))

    def _matches(self, url: str) -> bool:
        if self._suffixes:
            path = url.split("?")[0]
            if path.split("/")[-1].split(".")[-1] in self._suffixes:
                return True
        for pattern in self._domain_patterns:
            if pattern.match(url):
                return True
        if self._prefixes:
            path = url.split("?")[0]
            for prefix in self._prefixes:
                if path.startswith(prefix) and (
                    len(path) == len(prefix) or path[len(prefix)] in ("/", "?", "#")
                ):
                    return True
        return any(p.search(url) for p in self._path_patterns)

    def apply(self, url: str) -> bool:
        result = self._matches(url)
        return (not result) if self.reverse else result


# Extension → MIME map (subset of the reference's 100+ entry map,
# filters.py:272-368 — covering the web-crawl-relevant types).
_EXT_MIME = {
    "html": "text/html", "htm": "text/html", "xhtml": "application/xhtml+xml",
    "php": "text/html", "asp": "text/html", "aspx": "text/html", "jsp": "text/html",
    "txt": "text/plain", "md": "text/markdown", "css": "text/css",
    "js": "application/javascript", "json": "application/json",
    "xml": "application/xml", "rss": "application/rss+xml",
    "pdf": "application/pdf", "doc": "application/msword",
    "docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "xls": "application/vnd.ms-excel", "csv": "text/csv",
    "jpg": "image/jpeg", "jpeg": "image/jpeg", "png": "image/png",
    "gif": "image/gif", "webp": "image/webp", "svg": "image/svg+xml",
    "ico": "image/x-icon", "mp3": "audio/mpeg", "wav": "audio/wav",
    "mp4": "video/mp4", "webm": "video/webm", "avi": "video/x-msvideo",
    "zip": "application/zip", "gz": "application/gzip", "tar": "application/x-tar",
}


class ContentTypeFilter(BaseFilter):
    def __init__(self, allowed_types, check_extension: bool = True):
        if isinstance(allowed_types, str):
            allowed_types = [allowed_types]
        self.allowed_types = {t.lower() for t in allowed_types}
        self.check_extension = check_extension

    @staticmethod
    def _extension(url: str) -> str:
        path = url.split("?")[0].split("#")[0]
        last = path.rsplit("/", 1)[-1]
        if "." not in last:
            return ""
        return last.rsplit(".", 1)[-1].lower()

    def apply(self, url: str) -> bool:
        if not self.check_extension:
            return True
        ext = self._extension(url)
        if not ext:
            return True  # extensionless (e.g. directory URLs) pass
        mime = _EXT_MIME.get(ext)
        if mime is None:
            return False
        return mime in self.allowed_types


class DomainFilter(BaseFilter):
    def __init__(self, allowed_domains=None, blocked_domains=None):
        self.allowed = {d.lower() for d in (allowed_domains or [])}
        self.blocked = {d.lower() for d in (blocked_domains or [])}

    @staticmethod
    def _domain(url: str) -> str:
        try:
            return urlparse(url).netloc.lower().split(":")[0]
        except Exception:
            return ""

    @staticmethod
    def _matches_set(domain: str, domains: set[str]) -> bool:
        if domain in domains:
            return True
        # subdomain semantics: example.com matches sub.example.com
        return any(domain.endswith("." + d) for d in domains)

    def apply(self, url: str) -> bool:
        domain = self._domain(url)
        if self.blocked and self._matches_set(domain, self.blocked):
            return False
        if self.allowed:
            return self._matches_set(domain, self.allowed)
        return True


class FilterChain:
    """Short-circuit AND over filters (reference filters.py:69-116)."""

    def __init__(self, filters: list[BaseFilter] | None = None):
        self.filters = filters or []

    def apply(self, url: str) -> bool:
        return all(f.apply(url) for f in self.filters)

    def apply_many(self, urls: list[str]) -> list[bool]:
        if not self.filters:
            return [True] * len(urls)
        mask = self.filters[0].apply_many(urls)
        for f in self.filters[1:]:
            # short-circuit: only evaluate survivors
            sub_urls = [u for u, m in zip(urls, mask) if m]
            if not sub_urls:
                break
            sub_mask = iter(f.apply_many(sub_urls))
            mask = [m and next(sub_mask) for m in mask]
        return mask
