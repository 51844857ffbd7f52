"""Resumable, partitioned extraction runs.

Replaces the reference's SQLite cache read-through
(``async_webcrawler.py:267-268, 394-396``; ``async_database.py``) with
batch-engine idioms:

- **Shard-partitioned output**: one output directory per input shard
  (part file), committed atomically with a ``_SUCCESS`` marker + a
  metrics manifest.  A restarted run skips committed shards — only
  the crashed shard re-runs (idempotently, whole-shard rewrite).
- **Anti-join incremental mode**: given a set of already-extracted
  URLs (e.g. from previous runs' outputs), new pages are filtered by
  a broadcast membership check on the canonical url digest — the
  "cache hit" becomes a vectorized semi-join, no per-url lookups.
  For 10^10-URL sets, pass a bloom/cuckoo filter instead of the exact
  set (same ``__contains__`` API).
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import ray
import ray.data as rd

from ..stages.extract import extract_pages
from ..urls import url_digest


def list_shards(pages_dir: str) -> list[str]:
    if os.path.isfile(pages_dir):  # single-file input = one shard
        return [pages_dir]
    return sorted(
        os.path.join(pages_dir, n)
        for n in os.listdir(pages_dir)
        if n.endswith(".parquet")
    )


def shard_output_dir(out_root: str, shard_path: str) -> str:
    return os.path.join(out_root, os.path.splitext(os.path.basename(shard_path))[0])


def is_shard_done(out_root: str, shard_path: str) -> bool:
    return os.path.exists(os.path.join(shard_output_dir(out_root, shard_path), "_SUCCESS"))


def resumable_extract(
    pages_dir: str,
    out_root: str,
    *,
    columns: list[str] | None = None,
    done_urls=None,
    done_seen=None,
    cache_mode=None,
    **extract_kwargs,
) -> dict:
    """Extract all pages under ``pages_dir`` into per-shard output
    directories; skip shards already committed.  Returns a run
    manifest {n_shards, n_skipped, n_rows, wall_s, shards: [...]}.

    ``cache_mode``: a :class:`~..state.cache_mode.CacheMode` governing
    the committed-shard cache exactly as the reference's
    ``CacheContext`` governs its SQLite cache — ENABLED (default)
    reads (skip committed shards, apply done anti-joins) and writes
    (commit outputs); READ_ONLY skips committed shards but commits
    nothing new; WRITE_ONLY re-extracts everything (ignoring previous
    commits and done-sets) and overwrites; DISABLED / BYPASS neither
    read nor write — a pure recompute that leaves the cache tree
    untouched.

    ``done_urls``: optional container supporting ``in`` over 64-bit
    url digests (set / BloomFilter / CuckooFilter) — rows whose
    canonical digest is present are filtered out before extraction.
    Broadcast once via ``ray.put``; bounded inputs only.

    ``done_seen``: optional sharded
    :class:`~crawl4ai_custom_ray.frontier.seen.UrlSeen` (see
    :func:`load_done_into_seen`) — the anti-join becomes batched
    membership RPCs against the shard actors, the 10^10-URL path.
    """
    from ..state.cache_mode import CacheContext, CacheMode

    cache_mode = cache_mode or CacheMode.ENABLED
    os.makedirs(out_root, exist_ok=True)
    t0 = time.time()
    shard_reports = []
    n_rows_total = 0
    n_skipped = 0

    # no cache read → the done-sets must not filter either (they ARE
    # the cache's url-level view)
    ctx_probe = CacheContext(pages_dir, cache_mode)
    if not ctx_probe.should_read():
        done_urls = None
        done_seen = None

    done_ref = ray.put(done_urls) if done_urls is not None else None

    for shard_path in list_shards(pages_dir):
        ctx = CacheContext(shard_path, cache_mode)
        out_dir = shard_output_dir(out_root, shard_path)
        if ctx.should_read() and is_shard_done(out_root, shard_path):
            n_skipped += 1
            continue
        # idempotent re-run: wipe any partial output of a crashed
        # shard — but only when this run is allowed to write at all
        if ctx.should_write() and os.path.isdir(out_dir):
            import shutil

            shutil.rmtree(out_dir)
        shard_t0 = time.time()
        ds = rd.read_parquet(shard_path)
        if done_ref is not None:

            def not_done(batch: pa.Table, ref=done_ref) -> pa.Table:
                done = ray.get(ref)
                mask = [url_digest(u) not in done for u in batch["url"].to_pylist()]
                return batch.filter(pa.array(mask, pa.bool_()))

            ds = ds.map_batches(not_done, batch_format="pyarrow")
        elif done_seen is not None:

            def not_seen(batch: pa.Table, seen=done_seen) -> pa.Table:
                digests = [url_digest(u) for u in batch["url"].to_pylist()]
                hit = seen.contains(digests)
                return batch.filter(pa.array([not h for h in hit], pa.bool_()))

            ds = ds.map_batches(not_seen, batch_format="pyarrow")
        extracted = extract_pages(ds, columns=columns, **extract_kwargs).materialize()
        n_rows = extracted.count()
        report = {
            "shard": os.path.basename(shard_path),
            "n_rows": n_rows,
            "wall_s": round(time.time() - shard_t0, 3),
        }
        if ctx.should_write():
            os.makedirs(out_dir, exist_ok=True)
            if n_rows > 0:
                extracted.write_parquet(out_dir)
            with open(os.path.join(out_dir, "metrics.json"), "w") as f:
                json.dump(report, f)
            with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
                f.write("")
        shard_reports.append(report)
        n_rows_total += n_rows

    return {
        "n_shards": len(list_shards(pages_dir)),
        "n_skipped": n_skipped,
        "n_rows": n_rows_total,
        "wall_s": round(time.time() - t0, 3),
        "shards": shard_reports,
    }


def read_extracted(out_root: str):
    """Dataset over all committed shard outputs."""
    files = []
    for name in sorted(os.listdir(out_root)):
        sub = os.path.join(out_root, name)
        if os.path.isdir(sub) and os.path.exists(os.path.join(sub, "_SUCCESS")):
            files.extend(
                os.path.join(sub, f) for f in sorted(os.listdir(sub)) if f.endswith(".parquet")
            )
    if not files:
        raise FileNotFoundError(f"no committed shards under {out_root}")
    return rd.read_parquet(files)


def extracted_url_digests(out_root: str) -> set[int]:
    """Digest set of everything already extracted — feed back as
    ``done_urls`` for the next incremental run.

    SMALL-RUN PATH: the set lives on the driver (streamed in batches,
    never a whole-table pandas copy).  At the 10^10-URL design point
    use :func:`load_done_into_seen` + ``done_seen=`` instead — the
    done-set then lives in the sharded seen actors and the driver
    holds only handles."""
    out: set[int] = set()
    ds = read_extracted(out_root).select_columns(["url"])
    for batch in ds.iter_batches(batch_format="pyarrow"):
        out.update(url_digest(u) for u in batch["url"].to_pylist())
    return out


def load_done_into_seen(out_root: str, seen) -> int:
    """Scale path for incremental resume: insert every
    already-extracted URL digest into a sharded
    :class:`~crawl4ai_custom_ray.frontier.seen.UrlSeen` via a
    distributed pass — worker tasks compute digests and RPC the shard
    actors directly; nothing corpus-sized touches the driver.
    Returns the number of digests inserted."""

    def insert(batch: pa.Table) -> pa.Table:
        digests = [url_digest(u) for u in batch["url"].to_pylist()]
        is_new = seen.check_and_add(digests)
        return pa.table({"n": pa.array([sum(is_new)], pa.int64())})

    counts = (
        read_extracted(out_root)
        .select_columns(["url"])
        .map_batches(insert, batch_format="pyarrow")
    )
    import pyarrow.compute as pc

    total = 0
    for batch in counts.iter_batches(batch_format="pyarrow"):
        total += int(pc.sum(batch["n"]).as_py() or 0)
    return total
