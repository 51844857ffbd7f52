#!/usr/bin/env python
"""Benchmark harness.

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) with ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line:

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "pages": N,
     "pages_per_sec": N}

Headline = frontier-to-extracted-text throughput: the full extraction
kernel (scrape → markdown+citations → pruning → text) over an
amplified synthetic Common-Crawl-style pages table (variants×paragraph
fattening of the sf documents), consumed by write_parquet.

``--scaling``: runs the plain bench twice in fresh subprocesses at N
and 4N CPUs (N = $GRAFT_SCALE_LO, default 2 — below the single-host
bandwidth knee, see BASELINE.md) on the same input and
reports both plus scaling
efficiency (the in-sandbox evidence for the N vs 4N cluster-size
criterion).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
VARIANTS = int(os.environ.get("GRAFT_BENCH_VARIANTS", "4"))
PARAGRAPHS = int(os.environ.get("GRAFT_BENCH_PARAGRAPHS", "8"))


# this sandbox is multi-tenant: a co-tenant burst can inflate any
# single wall-time 3-20× (observed).  Every stage is timed best-of-N
# (min is the standard noise-robust estimator for a deterministic
# workload) and the JSON carries the host load averages so a noisy
# recording is auditable.
REPEATS = int(os.environ.get("GRAFT_BENCH_REPEATS", "2"))
HEADLINE_REPEATS = int(os.environ.get("GRAFT_BENCH_HEADLINE_REPEATS", "3"))


def _timed(fn, repeats: int = REPEATS):
    best = None
    for _ in range(max(1, repeats)):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data as rd

    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from crawl4ai_custom_ray.sources.pages import pages_parquet_path
    from crawl4ai_custom_ray.stages.extract import extract_pages

    # generate + warm the page cache AND the worker pool (untimed):
    # first-touch disk reads and Ray worker process startup otherwise
    # land inside the first timed stage
    pages_path = pages_parquet_path(SF_DIR, variants=VARIANTS, paragraphs=PARAGRAPHS)
    n_pages = rd.read_parquet(pages_path).count()
    extract_pages(
        rd.read_parquet(pages_path).limit(512), columns=["text"]
    ).materialize()

    queries: dict[str, float] = {}

    # headline: full extract kernel → parquet sink
    out_dir = "/tmp/bench_out/extracted"
    shutil.rmtree(out_dir, ignore_errors=True)

    def headline():
        shutil.rmtree(out_dir, ignore_errors=True)
        ds = rd.read_parquet(pages_path, override_num_blocks=NUM_CPUS * 2)
        # the COMPLETE extraction record: cleaned_html, raw/cited
        # markdown, fit_markdown, fit_html, text, metadata, links,
        # table counts — what a production crawl persists
        extracted = extract_pages(ds, compute_fit_html=True)
        extracted.write_parquet(out_dir)

    queries["extract"] = _timed(headline, HEADLINE_REPEATS)

    if os.environ.get("GRAFT_BENCH_HEADLINE_ONLY"):
        # scaling mode: the N-vs-4N criterion is about the headline
        # pipeline; the secondary rows (some tens of seconds each at
        # 4 CPUs) would quadruple the trial wall without informing it
        ray.shutdown()
        headline_sec = queries["extract"]
        return {
            "metric": "frontier-to-extracted-text throughput (pages/sec), full extraction kernel over synthetic CC-style pages",
            "value": headline_sec,
            "unit": "sec",
            "queries": queries,
            "sf": os.path.basename(os.path.normpath(SF_DIR)),
            "num_cpus": NUM_CPUS,
            "pages": n_pages,
            "pages_per_sec": round(n_pages / headline_sec, 1) if headline_sec else None,
            "best_of": {"headline": HEADLINE_REPEATS, "others": REPEATS},
            "loadavg": [round(x, 2) for x in os.getloadavg()],
        }

    # frontier: one BFS crawl (depth 2, politeness cap) on the base pages
    from crawl4ai_custom_ray.frontier.crawl import BFSCrawl, CrawlConfig
    import pyarrow.parquet as pq
    import tempfile

    base_pages = pages_parquet_path(SF_DIR)
    # seed pick is a distributed column-pruned min-n (never the whole
    # url column on the driver — same recipe as queries._query_vectors)
    from crawl4ai_custom_ray.queries import _min_n_public_urls

    seeds = _min_n_public_urls(base_pages, 50)

    def frontier():
        driver = BFSCrawl(
            base_pages,
            CrawlConfig(max_depth=2, check_robots=True, per_host_cap=200, n_seen_shards=4),
            tempfile.mkdtemp(prefix="bench_bfs_"),
        )
        try:
            driver.run(seeds).count()
        finally:
            driver.shutdown()

    queries["frontier_bfs"] = _timed(frontier)

    # dedup: minhash-LSH over documents
    from crawl4ai_custom_ray.functions.dedup import minhash_lsh_pairs

    def dedup():
        docs = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        minhash_lsh_pairs(docs, threshold=0.5, num_perm=64, bands=16, shingle_n=3).count()

    queries["dedup_minhash"] = _timed(dedup)

    # dedup finished to a decision: pairs → connected components →
    # per-doc keep flag (union-find fast path at this scale)
    from crawl4ai_custom_ray.functions.dedup import near_dedup_clusters

    def dedup_finish():
        docs = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        near_dedup_clusters(docs, threshold=0.5, num_perm=64, bands=16, shingle_n=3).count()

    queries["dedup_cluster"] = _timed(dedup_finish)

    # exact Jaccard pairs via prefix filtering (lossless AllPairs
    # candidate generation — the skew-safe exact similarity join)
    from crawl4ai_custom_ray.functions.dedup import jaccard_prefix_pairs

    # t=4/5: the prefix is n-ceil(0.8n)+1 ≈ 0.2n tokens, the realistic
    # near-dup operating point (at t=1/2 half of each doc's shingles
    # are prefix tokens: 409k candidates for 256 true pairs at sf0.1).
    # This corpus is ADVERSARIAL for prefix filtering — a ~50-word
    # template vocabulary gives avg shingle df ≈ 10, so even rarest
    # prefixes collide (118k candidates at t=4/5); real web shingles
    # are Zipfian with df=1 tails where the same code prunes ~all
    def dedup_prefix():
        docs = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        jaccard_prefix_pairs(
            docs, threshold_num=4, threshold_den=5, shingle_n=3
        ).count()

    queries["jaccard_prefix"] = _timed(dedup_prefix)

    # SemDeDup: cluster-bucketed embedding near-dup decision
    from crawl4ai_custom_ray.functions.similarity import semantic_dedup

    def sem_dedup():
        emb_ds = rd.read_parquet(
            f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        semantic_dedup(emb_ds, threshold=0.4, n_clusters=8).count()

    queries["semantic_dedup"] = _timed(sem_dedup)

    # exact repeated-substring removal (fixed-window Lee et al. pass)
    from crawl4ai_custom_ray.functions.dedup import substring_dedup

    def dedup_sub():
        docs = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        substring_dedup(docs, window=10).count()

    queries["dedup_substring"] = _timed(dedup_sub)

    # similarity: brute-force cosine top-10 for 20 queries
    from crawl4ai_custom_ray.functions.similarity import knn_brute_force
    import numpy as np

    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas().sort_values("vec_id")
    qids = emb["vec_id"].head(20).tolist()
    qvecs = np.asarray([np.asarray(v, dtype=np.float64) for v in emb["embedding"].head(20)])

    def knn():
        ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
        knn_brute_force(ds, qvecs, qids, k=10)

    queries["knn_topk"] = _timed(knn)

    # link stats: extraction-light link explosion + host aggregate
    from crawl4ai_custom_ray.frontier.crawl import _extract_links_batch
    from ray.data.aggregate import Count

    def links():
        ds = rd.read_parquet(base_pages, columns=["url", "html"])
        links_ds = ds.map_batches(_extract_links_batch, batch_format="pyarrow")
        links_ds.groupby("src_url").aggregate(Count(alias_name="n")).count()

    queries["link_stats"] = _timed(links)

    # curation: repetition gate + benchmark decontamination over documents
    from crawl4ai_custom_ray.functions.curation import decontaminate, repetition_quality

    def curation():
        docs = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        repetition_quality(docs).count()
        import pyarrow as pa

        def split(want_bench):
            def fn(batch: pa.Table) -> pa.Table:
                m = batch["doc_id"].to_numpy(zero_copy_only=False) % 17 == 0
                return batch.filter(pa.array(m if want_bench else ~m))

            return fn

        bench_side = docs.map_batches(split(True), batch_format="pyarrow")
        corpus = docs.map_batches(split(False), batch_format="pyarrow")
        decontaminate(corpus, bench_side, shingle_n=4, threshold=10).count()

    queries["curation"] = _timed(curation)

    # per-doc TF-IDF top-k (df aggregate + hash join + capped top-k)
    from crawl4ai_custom_ray.functions.textstats import tfidf_topk

    def tfidf():
        docs = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        tfidf_topk(docs, k=5).count()

    queries["tfidf_topk"] = _timed(tfidf)

    # end-to-end curation composition (normalize → dedup → gate → pack)
    from crawl4ai_custom_ray.queries import q_curate_pipeline

    def curate():
        q_curate_pipeline(SF_DIR).count()

    queries["curate_pipeline"] = _timed(curate)

    # the composed webtext user journey: crawl → digest semi-join
    # re-fetch → extract → exact dedup → quality gate → chunk → parquet
    # (pipelines/webtext.py — the end-to-end flow a reference user runs)
    from crawl4ai_custom_ray.pipelines.webtext import crawl_and_curate

    def webtext():
        out_root = tempfile.mkdtemp(prefix="bench_webtext_")
        try:
            crawl_and_curate(
                base_pages,
                seeds,
                out_root,
                crawl_cfg=CrawlConfig(
                    max_depth=2, per_host_cap=200, check_robots=True, n_seen_shards=4
                ),
            )
        finally:
            shutil.rmtree(out_root, ignore_errors=True)

    queries["webtext_pipeline"] = _timed(webtext)

    # PMI collocations (combiner-first pair counting + unigram joins)
    from crawl4ai_custom_ray.functions.textstats import pmi_pairs

    def pmi():
        docs = rd.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
        )
        pmi_pairs(docs, window=3, min_count=10, top_k=100).count()

    queries["pmi_pairs"] = _timed(pmi)

    # CCNet-style bigram-LM scoring (salted left joins, fixed point)
    from crawl4ai_custom_ray.functions.curation import lm_score
    import pyarrow as pa

    def lm():
        docs = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])

        def ref_side(batch):
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(ids % 10 == 0))

        ref = docs.map_batches(ref_side, batch_format="pyarrow")
        lm_score(docs, ref, salt=4).count()

    queries["lm_score"] = _timed(lm)

    ray.shutdown()

    headline_sec = queries["extract"]
    return {
        "metric": "frontier-to-extracted-text throughput (pages/sec), full extraction kernel over synthetic CC-style pages",
        "value": headline_sec,
        "unit": "sec",
        "queries": queries,
        "sf": os.path.basename(os.path.normpath(SF_DIR)),
        "num_cpus": NUM_CPUS,
        "pages": n_pages,
        "pages_per_sec": round(n_pages / headline_sec, 1) if headline_sec else None,
        "best_of": {"headline": HEADLINE_REPEATS, "others": REPEATS},
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }


def run_scaling() -> dict:
    """Same input, fresh processes at N and 4N CPUs → scaling
    efficiency.  Two trials per level, best taken (single-node sandbox
    timing is noisy; a real N→4N comparison is across nodes with
    independent memory buses — see BASELINE.md)."""

    def run_once(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        # scaling runs use a larger corpus so fixed per-pipeline costs
        # don't dominate the high-parallelism level, and time only the
        # headline pipeline (the criterion's subject)
        env.setdefault("GRAFT_BENCH_VARIANTS", "20")
        env.setdefault("GRAFT_BENCH_HEADLINE_ONLY", "1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def run(ncpu: int) -> dict:
        trials = [run_once(ncpu) for _ in range(2)]
        return min(trials, key=lambda r: r["value"])

    # default 2→8: below this single host's memory-bandwidth
    # saturation knee (scripts/scaling_probe.py: 2→8 bandwidth ceiling
    # 0.893 vs 4→16's 0.821), so the ratio measures ENGINE scaling
    # rather than shared-bus contention — on the real design point
    # (N vs 4N nodes) each node keeps its own bus.  Override with
    # GRAFT_SCALE_LO=4 for the 4→16 configuration.
    lo_cpus = int(os.environ.get("GRAFT_SCALE_LO", "2"))
    hi_cpus = lo_cpus * 4
    lo = run(lo_cpus)
    hi = run(hi_cpus)
    t_lo, t_hi = lo["value"], hi["value"]
    eff = (t_lo / t_hi) / (hi_cpus / lo_cpus)
    return {
        "metric": "scaling efficiency (extract headline), fresh sessions",
        "num_cpus_lo": lo_cpus,
        "num_cpus_hi": hi_cpus,
        "sec_lo": t_lo,
        "sec_hi": t_hi,
        "pages_per_sec_lo": lo["pages_per_sec"],
        "pages_per_sec_hi": hi["pages_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "queries_lo": lo["queries"],
        "queries_hi": hi["queries"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
