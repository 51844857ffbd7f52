"""Cache-mode semantics for resumable runs.

Mirrors the reference's ``cache_context.py:4-16`` (``CacheMode``:
ENABLED / DISABLED / READ_ONLY / WRITE_ONLY / BYPASS) and
``CacheContext.should_read/should_write`` decision matrix, re-expressed
for the batch engine where the "cache" is the committed per-shard
Parquet output tree of :mod:`..pipelines.resumable`:

- *read* = skip shards already committed (``_SUCCESS``) and apply the
  done-URL anti-join;
- *write* = commit extracted shards (parquet + metrics + ``_SUCCESS``).

``CacheContext`` keeps the reference's per-URL cacheability rules
(http/https/file are cacheable; ``raw:`` never is) so URL-level
filters can consult the same object the shard loop does.
"""

from __future__ import annotations

from enum import Enum


class CacheMode(Enum):
    ENABLED = "enabled"          # read and write
    DISABLED = "disabled"        # no caching at all
    READ_ONLY = "read_only"      # only read, never write
    WRITE_ONLY = "write_only"    # only write, never read
    BYPASS = "bypass"            # skip the cache for this run


class CacheContext:
    """Cache decision for one URL (or one shard, with ``url`` the
    shard path — file paths are treated as cacheable)."""

    def __init__(self, url: str, cache_mode: CacheMode, always_bypass: bool = False):
        self.url = url
        self.cache_mode = cache_mode
        self.always_bypass = always_bypass
        self.is_web_url = url.startswith(("http://", "https://"))
        self.is_local_file = url.startswith("file://")
        self.is_raw_html = url.startswith("raw:")
        # batch twist: plain filesystem shard paths are cacheable too
        self.is_cacheable = not self.is_raw_html
        self._url_display = url if not self.is_raw_html else "Raw HTML"

    def should_read(self) -> bool:
        if self.always_bypass or not self.is_cacheable:
            return False
        return self.cache_mode in (CacheMode.ENABLED, CacheMode.READ_ONLY)

    def should_write(self) -> bool:
        if self.always_bypass or not self.is_cacheable:
            return False
        return self.cache_mode in (CacheMode.ENABLED, CacheMode.WRITE_ONLY)

    @property
    def display_url(self) -> str:
        return self._url_display


def legacy_to_cache_mode(
    disable_cache: bool = False,
    bypass_cache: bool = False,
    no_cache_read: bool = False,
    no_cache_write: bool = False,
) -> CacheMode:
    """The reference's legacy boolean-flag translation, same precedence."""
    if disable_cache:
        return CacheMode.DISABLED
    if bypass_cache:
        return CacheMode.BYPASS
    if no_cache_read and no_cache_write:
        return CacheMode.DISABLED
    if no_cache_read:
        return CacheMode.WRITE_ONLY
    if no_cache_write:
        return CacheMode.READ_ONLY
    return CacheMode.ENABLED
