"""Round-5 regressions: the webtext digest semi-join fetch helper,
the _hash_group_blocks Ray-drift guard, the budget-cap grouping
rework, and the fetch-attach byte gate."""

import warnings

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _pages_table(n=50):
    return pa.table(
        {
            "url": [f"https://h{i % 7}.test/p/{i}" for i in range(n)],
            "html": [f"<html><body>page {i}</body></html>".encode() for i in range(n)],
        }
    )


def test_fetch_pages_for_urls_semi_join(ray_session, tmp_path):
    """Digest semi-filter + exact join returns exactly the selected
    pages (no driver url list), identical to the naive filter."""
    import ray.data as rd

    from crawl4ai_custom_ray.frontier.crawl import fetch_pages_for_urls

    t = _pages_table()
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    want = sorted(t["url"].to_pylist())[::3]
    url_ds = rd.from_arrow(pa.table({"url": want, "junk": [1] * len(want)}))

    got = fetch_pages_for_urls(p, url_ds).to_pandas().sort_values("url")
    assert list(got["url"]) == sorted(want)
    assert set(got.columns) == {"url", "html"}
    by_url = dict(zip(t["url"].to_pylist(), t["html"].to_pylist()))
    assert all(by_url[u] == h for u, h in zip(got["url"], got["html"]))


def test_fetch_pages_for_urls_join_route_and_empty(ray_session, tmp_path):
    """fetch_filter_max=0 disables the digest broadcast (pure hash
    join route) — value-identical; an empty selection returns an
    empty typed dataset."""
    import ray.data as rd

    from crawl4ai_custom_ray.frontier.crawl import fetch_pages_for_urls

    t = _pages_table()
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    want = sorted(t["url"].to_pylist())[:5]
    url_ds = rd.from_arrow(pa.table({"url": want}))

    got = fetch_pages_for_urls(p, url_ds, fetch_filter_max=0).to_pandas()
    assert sorted(got["url"]) == want

    empty = fetch_pages_for_urls(
        p, rd.from_arrow(pa.table({"url": pa.array([], pa.string())}))
    )
    assert empty.count() == 0


def _group_min_input(n_keys=64, per_key=5):
    keys, vals = [], []
    for k in range(n_keys):
        for j in range(per_key):
            keys.append(f"k{k:04d}")
            vals.append((k * 37 + j * 11) % 100)
    return pa.table({"key": keys, "val": vals})


def test_hash_group_blocks_whole_groups_invariant(ray_session, monkeypatch):
    """Force the hash-exchange route on a small input: every key group
    must land WHOLE in exactly one block (the pinned Ray 2.49.2
    one-block-per-reduce-partition behavior _min_by_keys et al rely
    on), and per-block minima must therefore be final."""
    import ray.data as rd

    from crawl4ai_custom_ray.functions import dedup

    monkeypatch.setattr(dedup, "_HASH_GROUP_SMALL_ROWS", 0)
    ds = rd.from_arrow(_group_min_input()).repartition(8)
    out = dedup._hash_group_blocks(ds, ["key"], 4)
    seen_in_block = {}
    for i, ref in enumerate(out.to_arrow_refs()):
        import ray as _ray

        blk = _ray.get(ref)
        for k in set(blk["key"].to_pylist()):
            assert seen_in_block.setdefault(k, i) == i, f"{k} straddles blocks"

    mins = dedup._min_by_keys(ds, ["key"], "val", "m").to_pandas()
    expected = (
        _group_min_input().to_pandas().groupby("key")["val"].min().sort_index()
    )
    got = mins.set_index("key")["m"].sort_index()
    assert (got == expected).all()


def test_hash_group_blocks_fallback_when_internals_move(ray_session, monkeypatch):
    """Simulate the Ray-internal shuffle-strategy knob disappearing:
    the primitive must warn loudly and re-route through the public
    groupby().map_groups contract with identical results."""
    import ray.data as rd

    from crawl4ai_custom_ray.functions import dedup

    monkeypatch.setattr(dedup, "_HASH_GROUP_SMALL_ROWS", 0)
    monkeypatch.setattr(dedup, "_resolve_hash_shuffle_strategy", lambda: None)
    ds = rd.from_arrow(_group_min_input()).repartition(8)
    with pytest.warns(RuntimeWarning, match="key-hash repartition unavailable"):
        mins = dedup._min_by_keys(ds, ["key"], "val", "m").to_pandas()
    expected = (
        _group_min_input().to_pandas().groupby("key")["val"].min().sort_index()
    )
    assert (mins.set_index("key")["m"].sort_index() == expected).all()


def test_budget_cap_ds_matches_table_route(ray_session, monkeypatch):
    """_budget_cap_ds (key-hash grouped blocks + per-block pandas cap)
    must equal the driver-table route row-for-row, scored and
    unscored, with the exchange forced on."""
    import ray.data as rd

    from crawl4ai_custom_ray.frontier.crawl import _budget_cap_ds, _budget_cap_tbl
    from crawl4ai_custom_ray.functions import dedup

    monkeypatch.setattr(dedup, "_HASH_GROUP_SMALL_ROWS", 0)
    rows = []
    for p in range(17):
        for j in range(6):
            rows.append(
                {
                    "url": f"https://x.test/{p}/{j}",
                    "parent": f"https://x.test/{p}",
                    "host": "x.test",
                    "depth": 1,
                    "seq": f"{p:08x}{j:08x}",
                    "score": float((p * 13 + j * 7) % 10) / 10.0,
                }
            )
    tbl = pa.Table.from_pylist(rows)
    for use_score in (False, True):
        want = (
            _budget_cap_tbl(tbl, cap=3, use_score=use_score)
            .to_pandas()
            .sort_values("seq")
            .reset_index(drop=True)
        )
        got = (
            _budget_cap_ds(rd.from_arrow(tbl).repartition(5), cap=3, use_score=use_score)
            .to_pandas()
            .sort_values("seq")
            .reset_index(drop=True)
        )
        assert list(got["url"]) == list(want["url"])
        assert list(got["seq"]) == list(want["seq"])


def test_fetch_attach_byte_gate_routes_to_join(ray_session, tmp_path):
    """fetch_attach_bytes_max=0 disables the attach fast path (every
    round exceeds the byte budget) — the crawl must take the digest
    semi-filter + hash join route and visit the identical page set."""
    from crawl4ai_custom_ray.frontier.crawl import BFSCrawl, CrawlConfig
    from crawl4ai_custom_ray.sources.pages import pages_parquet_path

    pages_path = pages_parquet_path("/root/testdata/sf0.001")
    seeds = sorted(pq.read_table(pages_path, columns=["url"])["url"].to_pylist())[:4]

    def run(**kw):
        cfg = CrawlConfig(
            max_depth=1,
            per_host_cap=50,
            check_robots=False,
            n_seen_shards=2,
            fetch_strategy="join",
            **kw,
        )
        d = BFSCrawl(pages_path, cfg, str(tmp_path / f"ck{len(kw)}"))
        try:
            return sorted(r["url"] for r in d.run(seeds).select_columns(["url"]).iter_rows())
        finally:
            d.shutdown()

    assert run(fetch_attach_bytes_max=0) == run()


def test_hash_group_blocks_partition_floor_by_bytes(ray_session, monkeypatch):
    """With the byte target shrunk, the exchange must raise its
    partition count above the caller's CPU-shaped number (bounding
    per-block memory at any corpus size) while keeping every group
    whole and results exact."""
    import ray as _ray
    import ray.data as rd

    from crawl4ai_custom_ray.functions import dedup

    monkeypatch.setattr(dedup, "_HASH_GROUP_SMALL_ROWS", 0)
    monkeypatch.setattr(dedup, "_HASH_GROUP_TARGET_BLOCK", 2048)
    ds = rd.from_arrow(_group_min_input(n_keys=256, per_key=8)).repartition(8)
    out = dedup._hash_group_blocks(ds, ["key"], 4)
    # the floor must have lifted the partition count well above 4
    assert out.num_blocks() > 4
    seen_in_block = {}
    for i, ref in enumerate(out.to_arrow_refs()):
        blk = _ray.get(ref)
        for k in set(blk["key"].to_pylist()):
            assert seen_in_block.setdefault(k, i) == i, f"{k} straddles blocks"

    mins = dedup._min_by_keys(ds, ["key"], "val", "m").to_pandas()
    expected = (
        _group_min_input(n_keys=256, per_key=8)
        .to_pandas()
        .groupby("key")["val"]
        .min()
        .sort_index()
    )
    assert (mins.set_index("key")["m"].sort_index() == expected).all()


def test_hash_group_blocks_fat_cells_take_hash_route(ray_session, monkeypatch):
    """A row-small input with fat cells must NOT coalesce into one
    giant block: above the byte gate it takes the hash exchange, whose
    partition floor bounds per-block memory."""
    import ray as _ray
    import ray.data as rd

    from crawl4ai_custom_ray.functions import dedup

    monkeypatch.setattr(dedup, "_HASH_GROUP_SMALL_BYTES", 10_000)
    monkeypatch.setattr(dedup, "_HASH_GROUP_TARGET_BLOCK", 10_000)
    t = pa.table(
        {
            "key": [f"k{i % 32:03d}" for i in range(200)],
            "cell": ["x" * 1000 for _ in range(200)],  # ~200 KB total
        }
    )
    out = dedup._hash_group_blocks(rd.from_arrow(t).repartition(4), ["key"], 2)
    assert out.num_blocks() > 1  # did not coalesce
    seen_in_block = {}
    for i, ref in enumerate(out.to_arrow_refs()):
        blk = _ray.get(ref)
        for k in set(blk["key"].to_pylist()):
            assert seen_in_block.setdefault(k, i) == i, f"{k} straddles blocks"
    assert sum(len(_ray.get(r)) for r in out.to_arrow_refs()) == 200


def test_fetch_pages_for_urls_property(ray_session, tmp_path):
    """Property check across url-subset shapes (empty/all/disjoint/
    overlapping, with duplicates on the request side): the semi-join
    fetch equals the naive set filter for every case and never
    duplicates a page row."""
    import ray.data as rd

    t = _pages_table(80)
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    all_urls = t["url"].to_pylist()
    cases = [
        [],
        all_urls,
        all_urls[:1],
        all_urls[::7],
        ["https://nowhere.test/x"],
        all_urls[:5] + ["https://nowhere.test/x"] * 3,
        all_urls[:4] + all_urls[:4],  # duplicated request rows
    ]
    by_url = dict(zip(all_urls, t["html"].to_pylist()))
    from crawl4ai_custom_ray.frontier.crawl import fetch_pages_for_urls

    for want in cases:
        url_ds = rd.from_arrow(pa.table({"url": pa.array(want, pa.string())}))
        got_ds = fetch_pages_for_urls(p, url_ds)
        # the DATASET schema is typed even for empty results (Ray's
        # to_pandas drops columns on any 0-row dataset)
        assert got_ds.schema().names == ["url", "html"], want
        expect = sorted(set(want) & set(all_urls))
        if not expect:
            assert got_ds.count() == 0, want
            continue
        got = got_ds.to_pandas()
        assert sorted(got["url"]) == expect, want
        assert got["url"].is_unique
        assert all(by_url[u] == h for u, h in zip(got["url"], got["html"]))


def test_fetch_pages_for_urls_assume_unique_equivalent(ray_session, tmp_path):
    """assume_unique=True (the crawl-visited fast path) must equal the
    deduplicating default on an already-unique selection."""
    import ray.data as rd

    from crawl4ai_custom_ray.frontier.crawl import fetch_pages_for_urls

    t = _pages_table(40)
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    want = sorted(t["url"].to_pylist())[::4]
    url_ds = rd.from_arrow(pa.table({"url": pa.array(want, pa.string())}))

    a = fetch_pages_for_urls(p, url_ds).to_pandas().sort_values("url")
    b = (
        fetch_pages_for_urls(p, url_ds, assume_unique=True)
        .to_pandas()
        .sort_values("url")
    )
    assert list(a["url"]) == list(b["url"]) == sorted(want)
    assert list(a["html"]) == list(b["html"])
