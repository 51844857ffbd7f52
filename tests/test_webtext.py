"""End-to-end curation pipeline: crawl → extract → dedup → quality →
chunk over the synthetic corpus."""


def test_crawl_and_curate(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    from crawl4ai_custom_ray.frontier.crawl import CrawlConfig
    from crawl4ai_custom_ray.pipelines.webtext import crawl_and_curate
    from crawl4ai_custom_ray.sources.pages import pages_parquet_path

    base = pages_parquet_path("/root/testdata/sf0.001")
    seeds = sorted(
        u
        for u in pq.read_table(base, columns=["url"])["url"].to_pylist()
        if "/private/" not in u
    )[:8]
    out = str(tmp_path / "curated")
    m = crawl_and_curate(
        base,
        seeds,
        out,
        crawl_cfg=CrawlConfig(
            max_depth=1, per_host_cap=50, check_robots=True, n_seen_shards=2
        ),
        chunk_words=40,
    )
    assert m["n_visited"] > 0
    assert 0 < m["n_curated_docs"] <= m["n_visited"]
    assert m["n_chunks"] >= m["n_curated_docs"]

    chunks = rd.read_parquet(m["chunk_dir"]).to_pandas()
    assert len(chunks) == m["n_chunks"]
    assert set(chunks.columns) == {"url", "chunk_index", "chunk"}
    # dedup: chunk urls are unique winners (no text appears twice)
    joined = chunks.groupby("url")["chunk"].apply(" ".join)
    assert joined.duplicated().sum() == 0
    # crawl checkpoint is resumable state on disk
    assert (tmp_path / "curated" / "visited").is_dir()
    assert (tmp_path / "curated" / "manifest.json").exists()


def test_crawl_and_curate_resume(ray_session, tmp_path):
    """resume=True replays from the crawl's committed checkpoint: a
    second run over the same out_root reproduces the first manifest
    without recrawling from scratch (visited set identical)."""
    import pyarrow.parquet as pq

    from crawl4ai_custom_ray.frontier.crawl import CrawlConfig
    from crawl4ai_custom_ray.pipelines.webtext import crawl_and_curate
    from crawl4ai_custom_ray.sources.pages import pages_parquet_path

    base = pages_parquet_path("/root/testdata/sf0.001")
    seeds = sorted(
        u
        for u in pq.read_table(base, columns=["url"])["url"].to_pylist()
        if "/private/" not in u
    )[:4]
    out = str(tmp_path / "curated")
    cfg = CrawlConfig(max_depth=1, per_host_cap=50, check_robots=True, n_seen_shards=2)
    m1 = crawl_and_curate(base, seeds, out, crawl_cfg=cfg, chunk_words=40)
    m2 = crawl_and_curate(
        base, seeds, out, crawl_cfg=cfg, chunk_words=40, resume=True
    )
    assert m2["n_visited"] == m1["n_visited"]
    assert m2["n_curated_docs"] == m1["n_curated_docs"]
    assert m2["n_chunks"] == m1["n_chunks"]
