"""Flagship pipeline: pages parquet → extract kernel → extracted table.

This is the reference's ``arun_many`` fetch+scrape+markdown path
(``async_webcrawler.py:665-773``) re-expressed as a streaming Ray Data
pipeline: ``read_parquet → map_batches(extract) [→ write_parquet]``.
No driver-side materialization; the extract stage prunes the raw html
column so only extraction outputs flow downstream.
"""

from __future__ import annotations

import ray.data as rd

from ..sources.pages import pages_parquet_path
from ..stages.extract import extract_pages


def read_pages(sf_dir: str, *, variants: int = 1, paragraphs: int = 1):
    """Dataset over the (synthetic, cached) pages table for sf_dir.

    Read parallelism is pinned to ~2 blocks per CPU: Ray's default
    block planning on a small local corpus otherwise produces too many
    tiny blocks (per-block overhead) or too few (stragglers)."""
    path = pages_parquet_path(sf_dir, variants=variants, paragraphs=paragraphs)
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    return rd.read_parquet(path, override_num_blocks=cpus * 2)


def flagship_extract(sf_dir: str, *, columns: list[str] | None = None, **kwargs):
    """pages → full extraction records."""
    ds = read_pages(sf_dir, **{k: kwargs.pop(k) for k in ("variants", "paragraphs") if k in kwargs})
    return extract_pages(ds, columns=columns, **kwargs)
