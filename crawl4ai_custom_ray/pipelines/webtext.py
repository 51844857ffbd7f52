"""End-to-end web-text curation: crawl → extract → dedup → quality →
chunk → partitioned parquet.

The composed "reference user journey": what `arun_many` plus a
dedup/filter post-process does in the reference, expressed as one
streaming Ray Data flow over the BSP crawl's visited set.  Every
stage is an existing tested operator; this module wires them and owns
the output layout:

    out_root/
      visited/        crawl checkpoint (BSP rounds, resumable)
      chunks/         final curated chunk table
      manifest.json   counts per stage

Scale posture: corpus-sized state only ever lives in Datasets — the
re-fetch of the visited set goes through the crawl's own digest
semi-join gate (``frontier.crawl.fetch_pages_for_urls``: 8 B/url
digest broadcast under ``fetch_filter_max``, exact url hash join
either way — at a post-crawl visited set that IS corpus-scale, no
driver-side url list ever exists), the winner-per-content-hash set
rejoins the corpus through a hash join (never a driver set), and the
quality gate is a stateless vectorized filter.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

from ..frontier.crawl import BFSCrawl, CrawlConfig, fetch_pages_for_urls
from ..functions.chunkers import FixedLengthWordChunking, chunk_dataset
from ..stages.extract import extract_pages


def crawl_and_curate(
    pages_path: str,
    seeds: list[str],
    out_root: str,
    *,
    crawl_cfg: CrawlConfig | None = None,
    min_words: int = 5,
    max_punct_ratio: float = 0.3,
    chunk_words: int = 200,
    resume: bool = False,
) -> dict:
    """Run the full curation flow; returns the stage-count manifest.

    ``resume=True`` restarts a killed run from the crawl's last
    committed round checkpoint (the post-crawl stages re-run — they
    are pure functions of the visited set)."""
    os.makedirs(out_root, exist_ok=True)
    cfg = crawl_cfg or CrawlConfig(max_depth=2, per_host_cap=200, check_robots=True)

    # 1. BSP crawl — visited set with per-round checkpoints (the
    # returned Dataset reads the checkpoint parquet, so it outlives
    # the seen-shard actors)
    driver = BFSCrawl(pages_path, cfg, os.path.join(out_root, "visited"))
    try:
        visited = driver.run(seeds, resume=resume)
    finally:
        driver.shutdown()
    n_visited = visited.count()

    # 2. fetch+extract the visited pages through the crawl's digest
    # semi-join gate — never a driver-side url list (frontier/crawl.py
    # fetch_filter_max mechanism; collisions only admit extra rows
    # into the exact url join)
    pages = fetch_pages_for_urls(
        pages_path, visited, columns=["url", "html"], assume_unique=True
    )

    def only_success(batch: pa.Table) -> pa.Table:
        return batch.filter(batch["success"]).drop_columns(["success"])

    extracted = extract_pages(pages, columns=["url", "text", "success"]).map_batches(
        only_success, batch_format="pyarrow"
    )

    # 3. exact dedup: min-url winner per content hash (the dedup
    # module's canonical hashing), rejoined onto the corpus as a
    # bounded hash join — no driver-side membership set
    from ..functions.dedup import _coalesce_for_join, _join_partitions, exact_dedup

    chunk_dir = os.path.join(out_root, "chunks")
    os.makedirs(chunk_dir, exist_ok=True)

    src, n_rows = _coalesce_for_join(extracted)
    if n_rows == 0:
        manifest = {
            "n_visited": n_visited,
            "n_curated_docs": 0,
            "n_chunks": 0,
            "chunk_dir": chunk_dir,
        }
        with open(os.path.join(out_root, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        return manifest
    winners, _ = _coalesce_for_join(
        exact_dedup(src, id_column="url", text_column="text").select_columns(["url"])
    )
    deduped = src.join(
        winners,
        join_type="inner",
        num_partitions=_join_partitions(8),
        on=("url",),
    )

    # 4. quality gate — stateless, fully vectorized arrow kernels
    # (word count / punct count / length per row, no Python row loop)
    def quality_gate(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # RE2's \s and \w are ASCII-only (and RE2 \s lacks \x0b);
        # spell out Python-re's unicode classes (\s ≈ ASCII ws + \x0b
        # + \x1c-\x1f + \x85 + \p{Z}, \w ≈ [\p{L}\p{N}_]) so
        # U+00A0 etc. — which the synthetic corpus deliberately
        # inserts — stay WHITESPACE, not punct
        ws = r"\s\x0b\x1c-\x1f\x85\p{Z}"
        text = pc.coalesce(batch["text"], "")
        n_words = pc.count_substring_regex(text, f"[^{ws}]+")
        n_punct = pc.count_substring_regex(text, f"[^\\p{{L}}\\p{{N}}_{ws}]")
        n_chars = pc.utf8_length(text)
        ok_len = pc.greater_equal(n_words, min_words)
        # empty text ⇒ ratio 1.0 (the old per-row semantics), so it
        # fails the punct gate whenever max_punct_ratio < 1
        ratio = pc.if_else(
            pc.equal(n_chars, 0),
            1.0,
            pc.divide(
                pc.cast(n_punct, pa.float64()),
                pc.cast(pc.max_element_wise(n_chars, 1), pa.float64()),
            ),
        )
        keep = pc.and_(ok_len, pc.less_equal(ratio, max_punct_ratio))
        return batch.filter(keep)

    curated = deduped.map_batches(quality_gate, batch_format="pyarrow").materialize()
    n_curated = curated.count()

    # 5. chunk + write
    chunks = chunk_dataset(
        curated,
        FixedLengthWordChunking(chunk_size=chunk_words),
        id_column="url",
        text_column="text",
    ).materialize()
    n_chunks = chunks.count()
    if n_chunks:
        chunks.write_parquet(chunk_dir)

    manifest = {
        "n_visited": n_visited,
        "n_curated_docs": n_curated,
        "n_chunks": n_chunks,
        "chunk_dir": chunk_dir,
    }
    with open(os.path.join(out_root, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest
