"""The fetch-join digest semi-filter (CrawlConfig.fetch_filter_max)
must be invisible to crawl semantics: filtered and unfiltered joins
produce the identical visited table, on both the driver-sized
(sel_table) and forced-distributed (sel_ds) build paths.  The digest
function must also be stable across processes — the round's digests
are computed wherever the block lands, and a driver/worker mismatch
would silently drop fetches.
"""

import subprocess
import sys

import pandas as pd

from crawl4ai_custom_ray.sources.pages import pages_parquet_path

SF = "/root/testdata/sf0.001"


def _run(pages_path, seeds, tmp_path, **cfg_kw):
    from crawl4ai_custom_ray.frontier.crawl import CrawlConfig, crawl_bfs

    visited, driver = crawl_bfs(
        pages_path, seeds, CrawlConfig(**cfg_kw), str(tmp_path)
    )
    try:
        return (
            visited.to_pandas()
            .sort_values(["round", "seq"])
            .reset_index(drop=True)
        )
    finally:
        driver.shutdown()


def _seeds(pages_path):
    import pyarrow.parquet as pq

    t = pq.read_table(pages_path, columns=["url"])
    return sorted(t["url"].to_pylist())[:3]


def test_semi_filter_equivalence_driver_build(ray_session, tmp_path):
    """fetch_strategy='join' with a driver-sized round: digests built
    from sel_table.  Same visited rows/order as fetch_filter_max=0."""
    pages_path = pages_parquet_path(SF)
    seeds = _seeds(pages_path)
    # fetch_attach_max=0 pins the hash-join route — otherwise the
    # attach fast path would bypass the semi-filter entirely
    base = dict(
        max_depth=2, fetch_strategy="join", n_seen_shards=2, fetch_attach_max=0
    )
    on = _run(pages_path, seeds, tmp_path / "on", **base)
    off = _run(pages_path, seeds, tmp_path / "off", fetch_filter_max=0, **base)
    pd.testing.assert_frame_equal(on, off)
    assert len(on) > 3  # the crawl actually expanded past the seeds


def test_semi_filter_equivalence_distributed_build(ray_session, tmp_path):
    """broadcast_fetch_threshold=0 forces sel_table=None: digests are
    built by the distributed per-block pass.  Identical visited table
    with the filter on and off."""
    pages_path = pages_parquet_path(SF)
    seeds = _seeds(pages_path)
    base = dict(
        max_depth=2,
        driver_round_threshold=0,
        driver_links_threshold=0,
        broadcast_fetch_threshold=0,
        fetch_strategy="join",
        n_seen_shards=2,
        fetch_attach_max=0,  # pin the hash-join route
    )
    on = _run(pages_path, seeds, tmp_path / "on", **base)
    off = _run(pages_path, seeds, tmp_path / "off", fetch_filter_max=0, **base)
    pd.testing.assert_frame_equal(on, off)
    assert len(on) > 3


def test_semi_filter_zero_match_round(ray_session, tmp_path):
    """A round whose urls match NO pages row empties every filtered
    block.  The anchor-row rule (one digest-mismatched row kept per
    emptied block) must keep the hash join alive — previously pyarrow
    raised "No match for FieldRef url" because the all-empty right
    side lost its schema — and the crawl must end with just the
    unfetched seed recorded."""
    pages_path = pages_parquet_path(SF)
    out = _run(
        pages_path,
        ["https://nonexistent.example/none"],
        tmp_path,
        max_depth=2,
        fetch_strategy="join",
        n_seen_shards=2,
        fetch_attach_max=0,  # pin the hash-join route
    )
    assert list(out["url"]) == ["https://nonexistent.example/none"]


def test_url_digest_stable_across_processes():
    """pd.util.hash_array's fixed-key siphash must give the same
    uint64 in a fresh interpreter (no PYTHONHASHSEED dependence)."""
    from crawl4ai_custom_ray.frontier.crawl import _url_digests64

    urls = ["https://t.local/a", "https://t.local/b?q=1"]
    here = [int(x) for x in _url_digests64(urls)]
    code = (
        "from crawl4ai_custom_ray.frontier.crawl import _url_digests64;"
        "print([int(x) for x in _url_digests64("
        "['https://t.local/a', 'https://t.local/b?q=1'])])"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env={"PYTHONHASHSEED": "12345", "PATH": "/usr/bin:/bin", "PYTHONPATH": "/root/repo"},
    )
    assert out.returncode == 0, out.stderr
    assert eval(out.stdout.strip()) == here
