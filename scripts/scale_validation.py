"""Volume validation: run the distributed code paths at ≥1M pages.

The sf test dirs top out at 5k docs / 20k pages, where the engine's
size-adaptive fast paths keep everything driver-side; this run
amplifies sf0.1 by 200× (1,000,000 docs / 1,000,000 pages, ~2.5 GB of
HTML) and drives the HEAVY pipelines end-to-end with the distributed
branches forced on, recording wall, rows/sec, and the driver's peak
RSS (the no-driver-blowup evidence):

    python scripts/scale_validation.py [--replicas 200] [--cpus 32]
                                       [--seeds 10000]

- extract_1m      full extraction kernel → parquet sink (streaming)
- frontier_dist   BFS depth-2 from 10k seeds with
                  driver_round_threshold=0, driver_links_threshold=0,
                  broadcast_fetch_threshold=0, fetch_strategy="join" —
                  every round runs the Dataset branch (asserted from
                  the stage-timing labels)
- dedup_minhash_1m / dedup_cluster_1m over the 1M-doc table
- curate_1m       normalize → exact-dedup → Gopher gate → packing

Results go to SCALE_VALIDATION.json (and one JSON line on stdout).
Corpus generation runs in a SEPARATE subprocess so its memory
footprint cannot pollute the measured driver RSS.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import resource
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _rss_gib() -> float:
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)


def generate(replicas: int) -> None:
    """Subprocess entry: build the scaled documents + pages caches."""
    import ray

    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from crawl4ai_custom_ray.sources.scale import (
        scaled_documents_dir,
        scaled_pages_dir,
    )

    t0 = time.time()
    sdir = scaled_documents_dir(BASE_SF, replicas)
    t1 = time.time()
    pdir = scaled_pages_dir(sdir)
    print(
        json.dumps(
            {
                "scale_dir": sdir,
                "pages_dir": pdir,
                "gen_docs_sec": round(t1 - t0, 1),
                "gen_pages_sec": round(time.time() - t1, 1),
            }
        )
    )
    ray.shutdown()


def validate(replicas: int, cpus: int, n_seeds: int, only: set[str] | None = None) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    import ray.data as rd

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from crawl4ai_custom_ray.sources.scale import scale_dir_for
    from crawl4ai_custom_ray.stages.extract import extract_pages

    sdir = scale_dir_for(BASE_SF, replicas)
    pages_dir = os.path.join(sdir, "pages.parquet")
    docs_dir = os.path.join(sdir, "documents.parquet")
    assert os.path.isdir(pages_dir), "run generation first"

    n_pages = rd.read_parquet(pages_dir, columns=["url"]).count()
    n_docs = rd.read_parquet(docs_dir, columns=["doc_id"]).count()
    report: dict = {
        "base_sf": BASE_SF,
        "replicas": replicas,
        "num_cpus": cpus,
        "n_pages": n_pages,
        "n_docs": n_docs,
        "stages": {},
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
    }

    def want(name: str) -> bool:
        return only is None or name in only

    def stage(name: str, fn, rows_basis: int):
        if not want(name):
            return
        t0 = time.time()
        out_rows = fn()
        dt = time.time() - t0
        report["stages"][name] = {
            "wall_sec": round(dt, 1),
            "rows_in": rows_basis,
            "rows_per_sec": round(rows_basis / dt, 1),
            "rows_out": out_rows,
            "driver_peak_rss_gib": _rss_gib(),
        }
        print(f"{name:18s} {dt:7.1f}s  {rows_basis / dt:10.0f} rows/s  "
              f"out={out_rows}  rss={_rss_gib()}GiB", flush=True)

    # ---- 1. full extraction kernel over 1M pages → parquet sink ----
    out_dir = "/tmp/scale_out/extracted"

    def run_extract():
        shutil.rmtree(out_dir, ignore_errors=True)
        ds = rd.read_parquet(pages_dir, override_num_blocks=cpus * 3)
        extract_pages(ds, compute_fit_html=True).write_parquet(out_dir)
        return rd.read_parquet(out_dir, columns=["url"]).count()

    stage("extract_1m", run_extract, n_pages)

    # ---- 2. distributed frontier crawl (Dataset branch forced) ----
    from crawl4ai_custom_ray.frontier.crawl import BFSCrawl, CrawlConfig
    from crawl4ai_custom_ray.sources.pages import page_url

    # deterministic host-spread seed list (a lexicographic min-n would
    # put every seed on the lexicographically first host and turn the
    # crawl into a politeness queue); /private/ ids (i%13==5) skipped
    stride = max(1, n_docs // n_seeds)
    seeds = [
        page_url(i, n_docs)
        for i in range(0, n_docs, stride)
        if i % 13 != 5
    ][:n_seeds]

    def run_frontier():
        import tempfile

        cfg = CrawlConfig(
            max_depth=2,
            check_robots=True,
            per_host_cap=200,  # skewed host0 defers → politeness path live
            n_seen_shards=8,
            fetch_strategy="join",
            driver_round_threshold=0,
            driver_links_threshold=0,
            broadcast_fetch_threshold=0,
        )
        driver = BFSCrawl(
            pages_dir, cfg, tempfile.mkdtemp(prefix="scale_bfs_")
        )
        os.environ["GRAFT_CRAWL_TIMING"] = "1"
        buf = io.StringIO()
        try:
            with contextlib.redirect_stdout(buf):
                n = driver.run(seeds).count()
        finally:
            os.environ.pop("GRAFT_CRAWL_TIMING", None)
            driver.shutdown()
        labels = buf.getvalue()
        # distributed-mode proof: no driver-coordinated stage ran
        assert "(driver)" not in labels, labels
        assert "write_visited:" in labels or "write_visited" in labels
        report["stages"]["frontier_dist"] = {"visited": n}
        return n

    if want("frontier_dist"):
        t0 = time.time()
        visited = run_frontier()
        dt = time.time() - t0
        report["stages"]["frontier_dist"].update(
            {
                "wall_sec": round(dt, 1),
                "seeds": len(seeds),
                "pages_per_sec": round(visited / dt, 1),
                "driver_peak_rss_gib": _rss_gib(),
                "distributed_branch_confirmed": True,
            }
        )
        print(f"frontier_dist      {dt:7.1f}s  visited={visited} "
              f"({visited / dt:.0f} pages/s)  rss={_rss_gib()}GiB", flush=True)

    # ---- 2b. same crawl under the PRODUCTION config (size-adaptive
    # thresholds at defaults): small politeness-bounded rounds run
    # driver-side, the broadcast fetch pushes the round's url set into
    # the pages scan — the contrast that shows what the adaptive
    # design buys over always-distributed coordination ----
    if want("frontier_prod"):

        def run_frontier_prod():
            import tempfile

            cfg = CrawlConfig(
                max_depth=2,
                check_robots=True,
                per_host_cap=200,
                n_seen_shards=8,
            )
            driver = BFSCrawl(
                pages_dir, cfg, tempfile.mkdtemp(prefix="scale_bfs_prod_")
            )
            try:
                return driver.run(seeds).count()
            finally:
                driver.shutdown()

        t0 = time.time()
        visited_p = run_frontier_prod()
        dt = time.time() - t0
        report["stages"]["frontier_prod"] = {
            "wall_sec": round(dt, 1),
            "seeds": len(seeds),
            "visited": visited_p,
            "pages_per_sec": round(visited_p / dt, 1),
            "driver_peak_rss_gib": _rss_gib(),
        }
        print(f"frontier_prod      {dt:7.1f}s  visited={visited_p} "
              f"({visited_p / dt:.0f} pages/s)  rss={_rss_gib()}GiB", flush=True)

    # ---- 3/4. near-dedup at 1M docs ----
    from crawl4ai_custom_ray.functions.dedup import (
        minhash_lsh_pairs,
        near_dedup_clusters,
    )

    def run_minhash():
        docs = rd.read_parquet(docs_dir, columns=["doc_id", "text"])
        return minhash_lsh_pairs(
            docs, threshold=0.5, num_perm=64, bands=16, shingle_n=3
        ).count()

    stage("dedup_minhash_1m", run_minhash, n_docs)

    def run_cluster():
        docs = rd.read_parquet(docs_dir, columns=["doc_id", "text"])
        return near_dedup_clusters(
            docs, threshold=0.5, num_perm=64, bands=16, shingle_n=3
        ).count()

    stage("dedup_cluster_1m", run_cluster, n_docs)

    # ---- 5. end-to-end curation (normalize→dedup→gate→pack) ----
    from crawl4ai_custom_ray.queries import q_curate_pipeline

    def run_curate():
        return q_curate_pipeline(sdir).count()

    stage("curate_1m", run_curate, n_docs)

    # ---- 6. sequence packing over ALL 1M docs (the two-pass
    # distributed prefix sum — the round-2 scale finding — carrying a
    # full-volume ungated load) ----
    from crawl4ai_custom_ray.functions.textstats import pack_sequences

    def run_pack():
        docs = rd.read_parquet(
            docs_dir, columns=["doc_id", "source", "text"]
        )
        return pack_sequences(docs, budget=1024).count()

    stage("pack_1m", run_pack, n_docs)

    # ---- 7. per-doc TF-IDF top-k at 1M docs: the perturbed replicas
    # multiply the vocabulary ~200×, pushing the df table toward the
    # size-adaptive broadcast/join decision boundary ----
    from crawl4ai_custom_ray.functions.textstats import tfidf_topk

    def run_tfidf():
        docs = rd.read_parquet(docs_dir, columns=["doc_id", "text"])
        return tfidf_topk(docs, k=5).count()

    stage("tfidf_1m", run_tfidf, n_docs)

    # ---- 8/9. ANN at 1M vectors: exact brute-force top-k and
    # SemDeDup over a signed-permutation-amplified embeddings table
    # (within-replica cosine structure preserved exactly; see
    # sources/scale.py:scaled_embeddings_dir) ----
    if want("knn_1m") or want("semdedup_1m"):
        import numpy as np
        import pyarrow.compute as pc

        from crawl4ai_custom_ray.functions.similarity import (
            knn_brute_force,
            semantic_dedup,
        )
        from crawl4ai_custom_ray.sources.scale import scaled_embeddings_dir

        n_base_emb = 2000  # sf0.1 embeddings table
        emb_replicas = max(1, 1_000_000 // n_base_emb)
        emb_dir = scaled_embeddings_dir(BASE_SF, emb_replicas)
        n_vecs = rd.read_parquet(emb_dir, columns=["vec_id"]).count()

        def run_knn():
            # query prep: predicate-pushdown row fetch, never a full
            # column on the driver (the _query_vectors recipe)
            qt = (
                rd.read_parquet(emb_dir, filter=pc.field("vec_id") < 32)
                .take_all()
            )
            qt.sort(key=lambda r: r["vec_id"])
            qids = [int(r["vec_id"]) for r in qt]
            qvecs = np.asarray([list(r["embedding"]) for r in qt])
            emb = rd.read_parquet(emb_dir)
            return knn_brute_force(emb, qvecs, qids, k=10).num_rows

        stage("knn_1m", run_knn, n_vecs)

        def run_semdedup():
            emb = rd.read_parquet(emb_dir)
            return semantic_dedup(
                emb, threshold=0.9, n_clusters=1024, max_cluster=8192
            ).count()

        stage("semdedup_1m", run_semdedup, n_vecs)

    # ---- 10. PageRank over the 1M-page link graph: link extraction
    # (light parser pass) → first-wins dedup → 5 integer BSP rounds,
    # every iteration a rank⋈edge join + per-dst sum at 1M nodes ----
    if want("pagerank_1m"):
        import pyarrow as _pa
        import pyarrow.compute as _pc

        from crawl4ai_custom_ray.frontier.crawl import _extract_links_batch
        from crawl4ai_custom_ray.functions.graph import pagerank

        def run_pagerank():
            pages_ds = rd.read_parquet(pages_dir, columns=["url", "html"])
            nodes = rd.read_parquet(pages_dir, columns=["url"])

            def to_edges(batch: _pa.Table) -> _pa.Table:
                t = _extract_links_batch(batch)
                t = t.filter(
                    _pc.and_(t["href"].is_valid(), _pc.invert(t["external"]))
                )
                t = t.filter(_pc.not_equal(t["src_url"], t["href"]))
                return _pa.table(
                    {"src": t["src_url"], "dst": t["href"]}
                )

            edges = pages_ds.map_batches(to_edges, batch_format="pyarrow")
            ranks = pagerank(
                edges, nodes, src_column="src", dst_column="dst",
                node_column="url", iters=5,
            )
            return ranks.count() if hasattr(ranks, "count") else len(ranks)

        stage("pagerank_1m", run_pagerank, n_pages)

    # ---- 11. distributed connected components over the 9M-edge link
    # graph (int64 node ids = url digests): small_threshold=0 forces
    # the min-label-propagation route — the path a >200k-edge dup
    # graph takes at web scale (the 1M-doc near-dedup run above stays
    # under the union-find gate by construction) ----
    if want("cc_link_1m"):
        import pyarrow as _pa
        import pyarrow.compute as _pc

        from crawl4ai_custom_ray.frontier.crawl import (
            _extract_links_batch,
            _url_digests64,
        )
        from crawl4ai_custom_ray.functions.dedup import connected_components

        def run_cc():
            import numpy as np

            pages_ds = rd.read_parquet(pages_dir, columns=["url", "html"])

            def to_id_edges(batch: _pa.Table) -> _pa.Table:
                t = _extract_links_batch(batch)
                t = t.filter(
                    _pc.and_(t["href"].is_valid(), _pc.invert(t["external"]))
                )
                t = t.filter(_pc.not_equal(t["src_url"], t["href"]))
                a = _url_digests64(t["src_url"]).astype("i8")
                b = _url_digests64(t["href"]).astype("i8")
                return _pa.table(
                    {"a": _pa.array(a, _pa.int64()), "b": _pa.array(b, _pa.int64())}
                )

            edges = pages_ds.map_batches(to_id_edges, batch_format="pyarrow")
            labels = connected_components(edges, small_threshold=0)
            return labels.count()

        stage("cc_link_1m", run_cc, n_pages)

    # ---- 12. CCNet line-level dedup over 1M docs: line explode →
    # per-line-hash min-key winners (key-hash repartition + per-block
    # C++ min — line-count groups) → winners join → doc rebuild ----
    if want("line_dedup_1m"):
        from crawl4ai_custom_ray.functions.dedup import line_dedup

        def run_line_dedup():
            docs = rd.read_parquet(docs_dir, columns=["doc_id", "text"])
            return line_dedup(docs).count()

        stage("line_dedup_1m", run_line_dedup, n_docs)

    # ---- 13. exact PPJoin at 1M docs: the token-suffix replicas keep
    # the base corpus's ADVERSARIAL prefix-collision structure (~50
    # perturbed template words per replica), so raw candidate counts
    # scale ~linearly past _CAND_ID_FILTER_MAX and the fully
    # distributed verify route (dedup.py:875+) carries the load ----
    if want("jaccard_1m"):
        from crawl4ai_custom_ray.functions.dedup import jaccard_prefix_pairs

        def run_jaccard():
            docs = rd.read_parquet(docs_dir, columns=["doc_id", "text"])
            return jaccard_prefix_pairs(
                docs, threshold_num=4, threshold_den=5, shingle_n=3
            ).count()

        stage("jaccard_1m", run_jaccard, n_docs)

    # ---- 14. exact repeated-substring removal (Lee et al. fixed
    # window) at 1M docs: window-hash groups are corpus-count — the
    # key-hash grouping primitive's regime ----
    if want("substring_1m"):
        from crawl4ai_custom_ray.functions.dedup import substring_dedup

        def run_substring():
            docs = rd.read_parquet(docs_dir, columns=["doc_id", "text"])
            return substring_dedup(docs, window=10).count()

        stage("substring_1m", run_substring, n_docs)

    # ---- 15/16. HITS and triangle counting over the 1M-page link
    # graph (20k hosts at this volume): link extraction → distinct
    # host edges → alternating integer sweeps / degree-oriented wedge
    # join ----
    if want("hits_1m") or want("triangles_1m") or want("hits_page_1m"):
        import pyarrow as _pa
        import pyarrow.compute as _pc

        import re as _re

        from crawl4ai_custom_ray.frontier.crawl import _extract_links_batch
        from crawl4ai_custom_ray.functions.graph import hits, host_triangles

        _host_re = _re.compile(r"https://([^/]+)")

        def _host_of(u):
            m = _host_re.match(u or "")
            return m.group(1) if m else ""

        def _links_ds():
            pages_ds = rd.read_parquet(pages_dir, columns=["url", "html"])
            return pages_ds.map_batches(
                _extract_links_batch, batch_format="pyarrow"
            )

        def _host_edges_nodes_1m():
            """Distinct host→host edges + node set from the 1M-page
            link table (the q_host_hits recipe with a per-block
            distinct combiner before the groupby)."""
            from ray.data.aggregate import Count

            def to_host_edges(batch: _pa.Table) -> _pa.Table:
                t = batch.filter(batch["href"].is_valid())
                # per-block distinct combiner: host pairs, not links
                seen = {
                    (_host_of(su), _host_of(h))
                    for su, h in zip(
                        t["src_url"].to_pylist(), t["href"].to_pylist()
                    )
                }
                return _pa.table(
                    {
                        "src": _pa.array([s for s, _ in seen], _pa.string()),
                        "dst": _pa.array([d for _, d in seen], _pa.string()),
                    }
                )

            e0 = (
                _links_ds()
                .map_batches(to_host_edges, batch_format="pyarrow")
                .groupby(["src", "dst"])
                .aggregate(Count(alias_name="dup"))
                .select_columns(["src", "dst"])
                .materialize()
            )

            def both_hosts(batch: _pa.Table) -> _pa.Table:
                hosts = batch["src"].to_pylist() + batch["dst"].to_pylist()
                return _pa.table({"host": _pa.array(hosts, _pa.string())})

            nodes = (
                e0.map_batches(both_hosts, batch_format="pyarrow")
                .groupby("host")
                .aggregate(Count(alias_name="dup"))
                .select_columns(["host"])
            )
            return e0.filter(expr="src != dst"), nodes

        def run_hits():
            import pandas as _pd

            edges, nodes = _host_edges_nodes_1m()
            r = hits(edges, nodes, node_column="host", iters=3, num_partitions=16)
            return len(r) if isinstance(r, _pd.DataFrame) else r.count()

        stage("hits_1m", run_hits, n_pages)

        def run_triangles():
            return host_triangles(_links_ds(), num_partitions=16).count()

        stage("triangles_1m", run_triangles, n_pages)

        # page-level HITS: 1M nodes / 9M edges — the distributed
        # alternating-sweep route (host-level stays under the local
        # gate at 20k hosts; this is the pagerank_1m-shaped load)
        def run_hits_page():
            def to_edges(batch: _pa.Table) -> _pa.Table:
                t = batch.filter(
                    _pc.and_(
                        batch["href"].is_valid(), _pc.invert(batch["external"])
                    )
                )
                t = t.filter(_pc.not_equal(t["src_url"], t["href"]))
                return _pa.table({"src": t["src_url"], "dst": t["href"]})

            edges = _links_ds().map_batches(to_edges, batch_format="pyarrow")
            nodes = rd.read_parquet(pages_dir, columns=["url"])
            return hits(
                edges, nodes, node_column="url", iters=3, num_partitions=16
            ).count()

        stage("hits_page_1m", run_hits_page, n_pages)

    # ---- 17/18. windowed analytics at 1M events (10× disjoint user
    # populations of the sf0.1 events table — group-COUNT scaling,
    # the regime the epoch-sharded buckets exist for) ----
    if want("asof_1m") or want("rolling_1m"):
        import pyarrow as _pa
        import pyarrow.compute as _pc

        from crawl4ai_custom_ray.functions.asof import asof_join, rolling_window
        from crawl4ai_custom_ray.sources.scale import scaled_events_dir

        ev_dir = scaled_events_dir(BASE_SF, 10)
        n_events = rd.read_parquet(ev_dir, columns=["event_id"]).count()

        def run_asof():
            ev = rd.read_parquet(
                ev_dir,
                columns=["event_id", "ts", "user_id", "event_type", "value"],
            )

            def _only(kind):
                def fn(batch: _pa.Table) -> _pa.Table:
                    return batch.filter(
                        _pc.equal(batch["event_type"], kind)
                    ).drop_columns(["event_type"])

                return fn

            clicks = ev.map_batches(
                _only("click"), batch_format="pyarrow"
            ).drop_columns(["value"])
            purchases = ev.map_batches(_only("purchase"), batch_format="pyarrow")
            return asof_join(
                clicks,
                purchases,
                by="user_id",
                on="ts",
                id_column="event_id",
                right_payload={"event_id": "match_event_id", "value": "match_value"},
            ).count()

        stage("asof_1m", run_asof, n_events)

        def run_rolling():
            ev = rd.read_parquet(
                ev_dir, columns=["event_id", "ts", "user_id", "value"]
            )
            return rolling_window(
                ev,
                by="user_id",
                on="ts",
                id_column="event_id",
                value_column="value",
                window_us=1_800_000_000,
            ).count()

        stage("rolling_1m", run_rolling, n_events)

    # ---- 19. the composed webtext journey (crawl → digest semi-join
    # re-fetch → extract → exact dedup → quality gate → chunk →
    # parquet) against the 1M-page corpus — proves the r5 rework: no
    # driver-side visited-url list anywhere in the flow ----
    if want("webtext_1m"):
        from crawl4ai_custom_ray.frontier.crawl import CrawlConfig as _CC
        from crawl4ai_custom_ray.pipelines.webtext import crawl_and_curate

        def run_webtext():
            out_root = "/tmp/scale_out/webtext"
            shutil.rmtree(out_root, ignore_errors=True)
            m = crawl_and_curate(
                pages_dir,
                seeds,
                out_root,
                crawl_cfg=_CC(
                    max_depth=2,
                    per_host_cap=200,
                    check_robots=True,
                    n_seen_shards=8,
                ),
            )
            report["stages"]["webtext_1m_manifest"] = m
            return m["n_chunks"]

        stage("webtext_1m", run_webtext, n_pages)

    # ---- 20. budgeted distributed crawl: max_pages forces the
    # per-parent budget cap on the Dataset path — now routed through
    # the key-hash grouping primitive (frontier/crawl.py
    # _budget_cap_ds, round-5 rework) ----
    if want("frontier_budget"):
        import tempfile as _tf

        from crawl4ai_custom_ray.frontier.crawl import BFSCrawl as _BFS
        from crawl4ai_custom_ray.frontier.crawl import CrawlConfig as _CC2

        def run_frontier_budget():
            cfg = _CC2(
                max_depth=2,
                max_pages=50_000,
                check_robots=True,
                per_host_cap=200,
                n_seen_shards=8,
                fetch_strategy="join",
                driver_round_threshold=0,
                driver_links_threshold=0,
                broadcast_fetch_threshold=0,
            )
            driver = _BFS(pages_dir, cfg, _tf.mkdtemp(prefix="scale_bfs_budget_"))
            try:
                return driver.run(seeds).count()
            finally:
                driver.shutdown()

        stage("frontier_budget", run_frontier_budget, n_pages)

    report["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    ray.shutdown()
    return report


def extract_once(replicas: int, cpus: int) -> None:
    """Subprocess entry for --scaling: one timed extract over the
    scaled corpus at ``cpus`` CPUs, one JSON line on stdout."""
    import ray

    ray.init(
        address="local",
        num_cpus=cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    import ray.data as rd

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from crawl4ai_custom_ray.sources.scale import scale_dir_for
    from crawl4ai_custom_ray.stages.extract import extract_pages

    pages_dir = os.path.join(scale_dir_for(BASE_SF, replicas), "pages.parquet")
    # warm workers + page cache outside the timed window
    extract_pages(
        rd.read_parquet(pages_dir).limit(512), columns=["text"]
    ).materialize()
    out = "/tmp/scale_out/extract_scaling"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    ds = rd.read_parquet(pages_dir, override_num_blocks=max(cpus * 3, 96))
    extract_pages(ds, compute_fit_html=True).write_parquet(out)
    dt = time.time() - t0
    print(json.dumps({"cpus": cpus, "sec": round(dt, 1)}))
    ray.shutdown()


def run_scaling(replicas: int, lo: int, hi: int, out_path: str) -> None:
    """The N-vs-4N criterion at VOLUME: the same 1M-page extract in
    fresh processes at ``lo`` and ``hi`` CPUs (lo below the host's
    bandwidth knee, see BASELINE.md), raw efficiency reported."""
    results = {}
    for cpus in (lo, hi):
        env = dict(os.environ, _SCALE_EXTRACT_CHILD=str(cpus))
        r = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--replicas",
                str(replicas),
            ],
            env=env,
            capture_output=True,
            text=True,
        )
        sys.stderr.write(r.stderr[-1500:])
        line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)["sec"]
        print(f"extract_1m @ {cpus:2d} cpus: {results[cpus]}s", flush=True)
    eff = (results[lo] / results[hi]) / (hi / lo)
    summary = {
        "stage": "extract_1m",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": results[lo],
        "sec_hi": results[hi],
        "scaling_efficiency": round(eff, 3),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    print(json.dumps(summary))
    if os.path.exists(out_path):
        with open(out_path) as f:
            rep = json.load(f)
    else:
        rep = {}
    rep["scaling_1m"] = summary
    with open(out_path, "w") as f:
        json.dump(rep, f, indent=1)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=200)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--seeds", type=int, default=10_000)
    ap.add_argument("--generate-only", action="store_true")
    ap.add_argument(
        "--scaling",
        action="store_true",
        help="run the 1M-page extract at two CPU counts (default "
        "$GRAFT_SCALE_LO=2 vs 4x) and report raw scaling efficiency",
    )
    ap.add_argument(
        "--stages",
        default=None,
        help="comma list to run a subset (extract_1m,frontier_dist,"
        "frontier_prod,frontier_budget,knn_1m,semdedup_1m,"
        "dedup_minhash_1m,dedup_cluster_1m,curate_1m,pack_1m,tfidf_1m,"
        "pagerank_1m,cc_link_1m,line_dedup_1m,jaccard_1m,substring_1m,"
        "hits_1m,triangles_1m,asof_1m,rolling_1m,webtext_1m); results "
        "merge into --out so long runs can be split across invocations",
    )
    ap.add_argument("--out", default="/root/repo/SCALE_VALIDATION.json")
    args = ap.parse_args()

    if os.environ.get("_SCALE_EXTRACT_CHILD"):
        extract_once(args.replicas, int(os.environ["_SCALE_EXTRACT_CHILD"]))
        return 0
    if os.environ.get("_SCALE_GEN_CHILD"):
        generate(args.replicas)
        return 0
    if args.scaling:
        lo = int(os.environ.get("GRAFT_SCALE_LO", "2"))
        run_scaling(args.replicas, lo, lo * 4, args.out)
        return 0

    # generation in a child process: keeps its RSS out of the
    # validation driver's high-water mark
    env = dict(os.environ, _SCALE_GEN_CHILD="1")
    gen = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--replicas", str(args.replicas)],
        env=env,
        capture_output=True,
        text=True,
    )
    sys.stderr.write(gen.stderr[-2000:])
    gen_line = [l for l in gen.stdout.splitlines() if l.startswith("{")]
    gen_info = json.loads(gen_line[-1]) if gen_line else {}
    print("generation:", json.dumps(gen_info), flush=True)
    if args.generate_only:
        return 0

    only = set(args.stages.split(",")) if args.stages else None
    report = validate(args.replicas, args.cpus, args.seeds, only)
    report["generation"] = gen_info
    if only and os.path.exists(args.out):
        # merge stage subsets into the existing report
        with open(args.out) as f:
            prev = json.load(f)
        prev.setdefault("stages", {}).update(report["stages"])
        prev["loadavg_end"] = report["loadavg_end"]
        report = prev
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
