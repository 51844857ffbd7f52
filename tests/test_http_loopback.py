"""Live-socket integration test for the HTTP fetch stage.

The reference exercises its fetch path against a local HTTP server
(`tests/memory/run_benchmark.py` spins one up); this is the Ray-side
equivalent: a stdlib ``ThreadingHTTPServer`` on 127.0.0.1 serves a few
corpus-shaped pages and the ``HttpFetchWorker`` live branch
(``allow_network=True``) fetches them over a REAL socket — charset
decode, redirect following, non-2xx error rows, scheme dispatch.  With
aiohttp absent (this environment) the worker's documented stdlib
fallback carries the live path; with aiohttp present the session path
runs instead — either way no transport double is involved.
"""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pytest

from crawl4ai_custom_ray.sources.http_fetch import HttpFetchWorker, fetch_urls

PAGE_HTML = "<html><body><h1>Corpus page</h1><p>batch stream</p></body></html>"
LATIN_HTML = "<html><body>café résumé</body></html>"


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        if self.path == "/page1":
            body = PAGE_HTML.encode("utf-8")
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/latin":
            body = LATIN_HTML.encode("iso-8859-1")
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=iso-8859-1")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/redirect":
            self.send_response(302)
            self.send_header("Location", "/page1")
            self.send_header("Content-Length", "0")
            self.end_headers()
        else:
            body = b"not here"
            self.send_response(404)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)


@pytest.fixture(scope="module")
def loopback_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base
    srv.shutdown()
    t.join(timeout=5)


def test_live_fetch_over_real_socket(loopback_server):
    w = HttpFetchWorker(allow_network=True, timeout_s=10)
    batch = pa.table(
        {
            "url": pa.array(
                [
                    f"{loopback_server}/page1",
                    f"{loopback_server}/latin",
                    f"{loopback_server}/missing",
                    f"{loopback_server}/redirect",
                ]
            )
        }
    )
    out = w(batch).to_pylist()
    by_url = {r["url"].rsplit("/", 1)[1]: r for r in out}

    p = by_url["page1"]
    assert p["success"] and p["status_code"] == 200
    assert p["html"] == PAGE_HTML
    assert p["error"] is None

    lat = by_url["latin"]
    assert lat["success"] and lat["html"] == LATIN_HTML  # charset decode

    miss = by_url["missing"]
    assert not miss["success"] and miss["status_code"] == 404
    assert "404" in miss["error"]
    assert miss["html"] == ""

    red = by_url["redirect"]
    assert red["success"] and red["status_code"] == 200
    assert red["final_url"].endswith("/page1")
    assert red["html"] == PAGE_HTML


def test_live_fetch_no_follow_redirect(loopback_server):
    w = HttpFetchWorker(allow_network=True, follow_redirects=False, timeout_s=10)
    out = w(pa.table({"url": pa.array([f"{loopback_server}/redirect"])})).to_pylist()
    assert out[0]["status_code"] == 302
    assert not out[0]["success"]


def test_live_fetch_scheme_dispatch(loopback_server, tmp_path):
    f = tmp_path / "local.html"
    f.write_text("<p>file scheme</p>", encoding="utf-8")
    w = HttpFetchWorker(allow_network=True, timeout_s=10)
    out = w(
        pa.table({"url": pa.array([f"file://{f}", "raw:<p>inline</p>"])})
    ).to_pylist()
    assert out[0]["success"] and out[0]["html"] == "<p>file scheme</p>"
    assert out[1]["success"] and out[1]["html"] == "<p>inline</p>"


def test_live_fetch_as_dataset_stage(loopback_server, ray_session):
    """The full actor-pool Dataset path against the real socket —
    actors in separate worker processes reach the loopback server."""
    import ray.data as rd

    ds = rd.from_items(
        [
            {"url": f"{loopback_server}/page1"},
            {"url": f"{loopback_server}/latin"},
            {"url": f"{loopback_server}/missing"},
        ]
    )
    rows = fetch_urls(
        ds, concurrency=1, allow_network=True, timeout_s=10
    ).to_pandas()
    rows = rows.set_index(rows["url"].str.rsplit("/", n=1).str[1])
    assert bool(rows.loc["page1", "success"])
    assert rows.loc["page1", "html"] == PAGE_HTML
    assert rows.loc["latin", "html"] == LATIN_HTML
    assert not bool(rows.loc["missing", "success"])
    assert int(rows.loc["missing", "status_code"]) == 404
