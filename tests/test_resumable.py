"""Resumable partitioned extraction + anti-join incremental mode."""

import os
import shutil

from crawl4ai_custom_ray.pipelines.resumable import (
    extracted_url_digests,
    is_shard_done,
    list_shards,
    read_extracted,
    resumable_extract,
    shard_output_dir,
)
from crawl4ai_custom_ray.sources.pages import pages_parquet_path

SF = "/root/testdata/sf0.001"


def test_resumable_extract_and_skip(ray_session, tmp_path):
    pages_dir = pages_parquet_path(SF)
    out_root = str(tmp_path / "out")

    report = resumable_extract(pages_dir, out_root, columns=["text"])
    assert report["n_skipped"] == 0
    assert report["n_rows"] == 500
    assert all(is_shard_done(out_root, s) for s in list_shards(pages_dir))

    # rerun: everything skipped, nothing recomputed
    report2 = resumable_extract(pages_dir, out_root, columns=["text"])
    assert report2["n_skipped"] == report["n_shards"]
    assert report2["n_rows"] == 0

    assert read_extracted(out_root).count() == 500


def test_crashed_shard_reruns(ray_session, tmp_path):
    pages_dir = pages_parquet_path(SF)
    out_root = str(tmp_path / "out2")
    resumable_extract(pages_dir, out_root, columns=["text"])

    # simulate a crashed shard: remove its _SUCCESS
    victim = list_shards(pages_dir)[0]
    os.remove(os.path.join(shard_output_dir(out_root, victim), "_SUCCESS"))
    report = resumable_extract(pages_dir, out_root, columns=["text"])
    assert report["n_skipped"] == report["n_shards"] - 1
    assert report["n_rows"] > 0
    assert read_extracted(out_root).count() == 500


def test_incremental_anti_join(ray_session, tmp_path):
    pages_dir = pages_parquet_path(SF)
    first = str(tmp_path / "first")
    resumable_extract(pages_dir, first, columns=["text"])
    done = extracted_url_digests(first)
    assert len(done) == 500

    # second run over the same pages with the done-set: nothing new
    second = str(tmp_path / "second")
    report = resumable_extract(pages_dir, second, columns=["text"], done_urls=done)
    assert report["n_rows"] == 0

    # partial done-set: only the remainder is extracted
    third = str(tmp_path / "third")
    partial = set(list(done)[:300])
    report3 = resumable_extract(pages_dir, third, columns=["text"], done_urls=partial)
    assert report3["n_rows"] == 200


def test_incremental_with_bloom(ray_session, tmp_path):
    from crawl4ai_custom_ray.frontier.seen import BloomFilter

    pages_dir = pages_parquet_path(SF)
    first = str(tmp_path / "b1")
    resumable_extract(pages_dir, first, columns=["text"])
    bloom = BloomFilter(expected_items=1000, fp_rate=0.01)
    for d in extracted_url_digests(first):
        bloom.add(d)

    out = str(tmp_path / "b2")
    report = resumable_extract(pages_dir, out, columns=["text"], done_urls=bloom)
    assert report["n_rows"] == 0  # no false negatives by construction


def test_incremental_via_seen_shards(ray_session, tmp_path):
    """Scale-path resume: done-set in sharded seen actors, distributed
    insert, batched membership anti-join (no driver-side URL set)."""
    from crawl4ai_custom_ray.frontier.seen import UrlSeen
    from crawl4ai_custom_ray.pipelines.resumable import (
        load_done_into_seen,
        read_extracted,
        resumable_extract,
    )
    from crawl4ai_custom_ray.sources.pages import generate_pages_table

    import pyarrow.parquet as pq

    pages_dir = tmp_path / "pages"
    pages_dir.mkdir()
    tbl = generate_pages_table("/root/testdata/sf0.001")
    half = tbl.num_rows // 2
    pq.write_table(tbl.slice(0, half), pages_dir / "part_000.parquet")

    out1 = tmp_path / "out1"
    r1 = resumable_extract(str(pages_dir), str(out1), columns=["url", "text"])
    assert r1["n_rows"] == half

    seen = UrlSeen(n_shards=2, mode="exact")
    try:
        inserted = load_done_into_seen(str(out1), seen)
        assert inserted == half

        # second run over the FULL table, anti-joined via the actors
        pq.write_table(tbl, pages_dir / "part_001.parquet")
        out2 = tmp_path / "out2"
        r2 = resumable_extract(
            str(pages_dir), str(out2), columns=["url", "text"], done_seen=seen
        )
        # part_000 re-extracts nothing new (all done); part_001 only
        # the second half
        got = read_extracted(str(out2)).to_pandas()
        assert len(got) == tbl.num_rows - half
        first_half_urls = set(tbl["url"].to_pylist()[:half])
        assert not (set(got["url"]) & first_half_urls)
    finally:
        seen.shutdown()


# ------------------------------------------------------- cache modes


def _mtimes(out_root, pages_dir):
    return {
        s: os.path.getmtime(os.path.join(shard_output_dir(out_root, s), "_SUCCESS"))
        for s in list_shards(pages_dir)
        if is_shard_done(out_root, s)
    }


def test_cache_mode_matrix(ray_session, tmp_path):
    """READ_ONLY / WRITE_ONLY / BYPASS / DISABLED read-write matrices
    (reference cache_context.py:4-16 semantics over the shard cache)."""
    from crawl4ai_custom_ray.state.cache_mode import CacheMode

    pages_dir = pages_parquet_path(SF)
    out_root = str(tmp_path / "cm")

    # seed the cache with one committed run
    seed = resumable_extract(pages_dir, out_root, columns=["text"])
    n_shards = seed["n_shards"]
    before = _mtimes(out_root, pages_dir)
    assert len(before) == n_shards

    # READ_ONLY: skips everything committed, writes nothing new
    victim = list_shards(pages_dir)[0]
    shutil.rmtree(shard_output_dir(out_root, victim))
    r = resumable_extract(
        pages_dir, out_root, columns=["text"], cache_mode=CacheMode.READ_ONLY
    )
    assert r["n_skipped"] == n_shards - 1
    assert r["n_rows"] > 0  # the victim re-extracted...
    assert not is_shard_done(out_root, victim)  # ...but was NOT committed

    # BYPASS: recomputes everything, cache tree untouched
    mid = _mtimes(out_root, pages_dir)
    r = resumable_extract(
        pages_dir, out_root, columns=["text"], cache_mode=CacheMode.BYPASS
    )
    assert r["n_skipped"] == 0 and r["n_rows"] == 500
    assert _mtimes(out_root, pages_dir) == mid

    # DISABLED: same matrix as BYPASS
    r = resumable_extract(
        pages_dir, out_root, columns=["text"], cache_mode=CacheMode.DISABLED
    )
    assert r["n_skipped"] == 0 and r["n_rows"] == 500
    assert _mtimes(out_root, pages_dir) == mid

    # WRITE_ONLY: ignores commits (no skips, done-set ignored) and
    # overwrites every shard, restoring the victim
    done = extracted_url_digests(out_root)
    r = resumable_extract(
        pages_dir,
        out_root,
        columns=["text"],
        done_urls=done,
        cache_mode=CacheMode.WRITE_ONLY,
    )
    assert r["n_skipped"] == 0 and r["n_rows"] == 500
    after = _mtimes(out_root, pages_dir)
    assert len(after) == n_shards
    assert all(after[s] > before.get(s, 0) for s in after)

    # ENABLED again: everything committed → full skip
    r = resumable_extract(pages_dir, out_root, columns=["text"])
    assert r["n_skipped"] == n_shards and r["n_rows"] == 0


def test_cache_context_url_rules():
    """Per-URL cacheability mirrors the reference: raw: HTML is never
    cached; always_bypass wins over the mode; legacy flags translate
    with the reference's precedence."""
    from crawl4ai_custom_ray.state.cache_mode import (
        CacheContext,
        CacheMode,
        legacy_to_cache_mode,
    )

    web = CacheContext("https://a.example/x", CacheMode.ENABLED)
    assert web.should_read() and web.should_write()
    raw = CacheContext("raw:<html></html>", CacheMode.ENABLED)
    assert not raw.should_read() and not raw.should_write()
    assert raw.display_url == "Raw HTML"
    forced = CacheContext("https://a.example/x", CacheMode.ENABLED, always_bypass=True)
    assert not forced.should_read() and not forced.should_write()

    matrix = {
        CacheMode.ENABLED: (True, True),
        CacheMode.DISABLED: (False, False),
        CacheMode.READ_ONLY: (True, False),
        CacheMode.WRITE_ONLY: (False, True),
        CacheMode.BYPASS: (False, False),
    }
    for mode, (rd_, wr_) in matrix.items():
        ctx = CacheContext("https://a.example/x", mode)
        assert (ctx.should_read(), ctx.should_write()) == (rd_, wr_), mode

    assert legacy_to_cache_mode(disable_cache=True, bypass_cache=True) is CacheMode.DISABLED
    assert legacy_to_cache_mode(bypass_cache=True) is CacheMode.BYPASS
    assert legacy_to_cache_mode(no_cache_read=True, no_cache_write=True) is CacheMode.DISABLED
    assert legacy_to_cache_mode(no_cache_read=True) is CacheMode.WRITE_ONLY
    assert legacy_to_cache_mode(no_cache_write=True) is CacheMode.READ_ONLY
    assert legacy_to_cache_mode() is CacheMode.ENABLED
