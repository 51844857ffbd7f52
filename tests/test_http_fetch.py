"""Gated live-HTTP fetch actor: plumbing is real (actor pool, scheme
dispatch, error rows, charset decode); the network path is an honest
gate exercised only for its refusal behavior."""

import pyarrow as pa
import pytest


def test_gate_without_transport():
    from crawl4ai_custom_ray.sources.http_fetch import HttpFetchWorker

    with pytest.raises((RuntimeError, ImportError)):
        HttpFetchWorker()


def test_scheme_dispatch_and_errors(tmp_path):
    from crawl4ai_custom_ray.sources.http_fetch import HttpFetchWorker

    f = tmp_path / "page.html"
    f.write_text("<html><body>local file</body></html>")
    w = HttpFetchWorker(transport=lambda url: (404, {}, b"", url))
    out = w(pa.table({"url": pa.array([
        f"file://{f}", "raw:<p>inline</p>", "https://x.example/missing",
        "ftp://bad.scheme/x",
    ])}))
    rows = {r["url"]: r for r in out.to_pylist()}
    assert rows[f"file://{f}"]["success"] and "local file" in rows[f"file://{f}"]["html"]
    assert rows["raw:<p>inline</p>"]["html"] == "<p>inline</p>"
    assert not rows["https://x.example/missing"]["success"]
    assert rows["https://x.example/missing"]["status_code"] == 404
    assert not rows["ftp://bad.scheme/x"]["success"]
    assert "ValueError" in rows["ftp://bad.scheme/x"]["error"]


def test_charset_decode_from_headers():
    from crawl4ai_custom_ray.sources.http_fetch import HttpFetchWorker

    body = "café crème".encode("latin-1")
    w = HttpFetchWorker(
        transport=lambda url: (200, {"Content-Type": "text/html; charset=latin-1"}, body, url)
    )
    out = w(pa.table({"url": pa.array(["https://x.example/a"])})).to_pylist()[0]
    assert out["html"] == "café crème"


def test_parquet_transport_actor_pool(ray_session):
    """Full Dataset drive: per-actor transport construction (the
    session seam), fetch, 404s for unknown urls."""
    import ray.data as rd

    from crawl4ai_custom_ray.sources.http_fetch import fetch_urls
    from crawl4ai_custom_ray.sources.pages import pages_parquet_path

    pages_path = pages_parquet_path("/root/testdata/sf0.001")
    import pyarrow.parquet as pq
    import glob, os

    part = sorted(glob.glob(os.path.join(pages_path, "*.parquet")))[0]
    known = pq.read_table(part, columns=["url"])["url"].to_pylist()[:8]
    urls = known + ["https://site0.example.com/definitely-missing"]
    out = fetch_urls(
        rd.from_items([{"url": u} for u in urls]),
        concurrency=2,
        pages_path=pages_path,
    ).to_pandas()
    assert len(out) == len(urls)
    got = out.set_index("url")
    for u in known:
        assert got.loc[u, "success"] and len(got.loc[u, "html"]) > 0
    miss = got.loc["https://site0.example.com/definitely-missing"]
    assert not miss["success"] and miss["status_code"] == 404
