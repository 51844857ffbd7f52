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
