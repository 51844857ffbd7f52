"""Named query implementations for the driver contract
(``__ray_entry__.queries``) — one per operator/pipeline from
SURVEY.md §2, each a ``sf_dir -> Dataset`` callable with a matching
DuckDB oracle in :mod:`oracles`.

Column names here MUST match the oracle SQL exactly (the driver's
compare hashes values under sorted column names).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .functions.regex_extract import regex_extract
from .pipelines.flagship import flagship_extract, read_pages
from .urls import url_host


# ---------------------------------------------------------------- pages


def q_extract_text(sf_dir: str):
    """Per-url extracted article text — THE parity invariant
    (extracted text == pages.text by construction of the synthetic
    corpus; oracle reads the column directly)."""
    return flagship_extract(sf_dir, columns=["text"]).select_columns(["url", "text"])


def _explode_links_batch(batch: pa.Table) -> pa.Table:
    src, href, internal = [], [], []
    for i in range(batch.num_rows):
        u = batch["url"][i].as_py()
        for l in batch["links_internal"][i].as_py() or []:
            src.append(u)
            href.append(l["href"])
            internal.append(True)
        for l in batch["links_external"][i].as_py() or []:
            src.append(u)
            href.append(l["href"])
            internal.append(False)
    return pa.table(
        {
            "src_url": pa.array(src, pa.string()),
            "href": pa.array(href, pa.string()),
            "internal": pa.array(internal, pa.bool_()),
        }
    )


def q_extract_links(sf_dir: str):
    """Exploded link table (src_url, href, internal): normalized,
    first-wins-deduped per page — the frontier's raw material
    (reference ``_process_element``,
    ``content_scraping_strategy.py:231-378``)."""
    ds = flagship_extract(sf_dir, columns=["links_internal", "links_external"])
    return ds.map_batches(_explode_links_batch, batch_format="pyarrow")


def q_warc_extract(sf_dir: str):
    """WARC ingestion round-trip: the pages corpus rendered as
    standard WARC/1.0 response records (Content-Length framing, HTTP
    response blocks), streamed back via read_binary_files + the
    record parser, through the full extract kernel — byte-identical
    text vs the parquet path proves the archive reader."""
    from .sources.warc import read_warc, warc_dir
    from .stages.extract import extract_pages

    pages = read_warc(warc_dir(sf_dir))
    return extract_pages(pages, columns=["text"]).select_columns(["url", "text"])


def q_host_graph(sf_dir: str):
    """Host→host link-graph aggregation with reciprocity flags: the
    crawl-scheduling / link-farm-detection view of the extracted link
    table (combiner-first counts; bounded self-join for reciprocity)."""
    from .functions.graph import host_graph

    links = q_extract_links(sf_dir)
    return host_graph(links)


def _amplified_captures(sf_dir: str):
    """Derived multi-capture table: every page once, plus a
    one-day-later recrawl with amended text for every third doc."""
    import ray.data as rd

    from .sources.pages import pages_parquet_path

    pages = rd.read_parquet(
        pages_parquet_path(sf_dir), columns=["url", "warc_ts", "text"]
    )

    def amplify(batch: pa.Table) -> pa.Table:
        import re

        urls = batch["url"].to_pylist()
        ts = batch["warc_ts"].to_pylist()
        texts = batch["text"].to_pylist()
        out_u, out_t, out_x = list(urls), list(ts), list(texts)
        import datetime as dt

        for u, t, x in zip(urls, ts, texts):
            m = re.search(r"doc-(\d+)$", u)
            if m and int(m.group(1)) % 3 == 0:
                out_u.append(u)
                out_t.append(t + dt.timedelta(days=1))
                out_x.append(x + " recrawl")
        return pa.table(
            {
                "url": pa.array(out_u, pa.string()),
                "warc_ts": pa.array(out_t, pa.timestamp("us")),
                "text": pa.array(out_x, batch["text"].type),
            }
        )

    return pages.map_batches(amplify, batch_format="pyarrow")


def _host_edges_nodes(sf_dir: str):
    """Distinct host→host edges (self-loops dropped) and the node set
    (every host on either side of any raw edge) from the extracted
    link table — shared by the host-level PageRank and HITS queries."""
    import re as _re

    from ray.data.aggregate import Count

    host_re = _re.compile(r"https://([^/]+)")
    links = q_extract_links(sf_dir)

    def to_host_edges(batch: pa.Table) -> pa.Table:
        seen = set()
        for su, href in zip(
            batch["src_url"].to_pylist(), batch["href"].to_pylist()
        ):
            a = host_re.match(su or "")
            b = host_re.match(href or "")
            seen.add((a.group(1) if a else "", b.group(1) if b else ""))
        return pa.table(
            {
                "src": pa.array([s for s, _ in seen], pa.string()),
                "dst": pa.array([d for _, d in seen], pa.string()),
            }
        )

    e0 = (
        links.map_batches(to_host_edges, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Count(alias_name="dup"))
        .select_columns(["src", "dst"])
        .materialize()
    )

    def both_hosts(batch: pa.Table) -> pa.Table:
        hosts = batch["src"].to_pylist() + batch["dst"].to_pylist()
        return pa.table({"host": pa.array(hosts, pa.string())})

    nodes = (
        e0.map_batches(both_hosts, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Count(alias_name="dup"))
        .select_columns(["host"])
    )
    edges = e0.filter(expr="src != dst")
    return edges, nodes


def q_host_rank(sf_dir: str):
    """Host-level PageRank: the crawl-prioritization authority signal
    — distinct host→host edges (self-loops dropped) through the same
    integer fixed-point BSP pagerank as the page-level query."""
    from .functions.graph import pagerank

    edges, nodes = _host_edges_nodes(sf_dir)
    # host-count key space is tiny (~tens at test scale): cap the join
    # partitioning so no Acero partition sees zero rows (the
    # hash_join_safe caveat); at web scale hosts ~10^7-10^8 and the
    # default would be correct, so the cap is a floor-guard only
    return pagerank(edges, nodes, node_column="host", num_partitions=2)


def q_host_hits(sf_dir: str):
    """Host-level HITS hubs & authorities over the same distinct
    host→host edge set as host_rank — integer fixed-point alternating
    sweeps, so scores are bit-identical at any parallelism."""
    from .functions.graph import hits

    edges, nodes = _host_edges_nodes(sf_dir)
    return hits(edges, nodes, node_column="host", num_partitions=2)


def q_trap_detect(sf_dir: str):
    """Crawl-trap signal: per host, how tightly its discovered URLs
    collapse into digit templates — flags frontier-explosion hosts
    (the synthetic corpus' external partner-id pages collapse 20:1)."""
    from .functions.graph import trap_detect

    return trap_detect(q_extract_links(sf_dir))


def q_latest_capture(sf_dir: str):
    """Cross-snapshot capture dedup (CC latest-crawl-wins): the
    derived multi-capture table reduced to one row per url by
    (warc_ts, text-md5) max."""
    from .functions.dedup import latest_capture

    return latest_capture(_amplified_captures(sf_dir))


def q_recrawl_schedule(sf_dir: str):
    """Adaptive revisit scheduling (Cho & Garcia-Molina 2003) over the
    multi-capture table: changed URLs get a 12 h next-fetch interval,
    stable ones 48 h — one groupby chain, no payload in any shuffle."""
    from .functions.dedup import recrawl_schedule

    return recrawl_schedule(_amplified_captures(sf_dir))


def q_pagerank(sf_dir: str):
    """Integer fixed-point PageRank (5 BSP iterations) over the
    extracted internal-link graph: nodes = all pages, edges =
    first-wins-deduped internal links resolving to an existing page,
    self-loops dropped.  Bit-identical at any parallelism (integer
    sums are order-independent)."""
    import ray.data as rd

    from .functions.dedup import _join_partitions
    from .functions.graph import pagerank
    from .sources.pages import pages_parquet_path

    nodes = rd.read_parquet(pages_parquet_path(sf_dir), columns=["url"])

    links = q_extract_links(sf_dir)

    def to_edges(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch["internal"])
        t = t.filter(pc.not_equal(t["src_url"], t["href"]))
        # the synthetic link graph is degree-regular (uniform rank is
        # its fixed point); drop edges into every third doc so the
        # comparison exercises real rank dynamics
        import re

        keep = []
        for d in t["href"].to_pylist():
            m = re.search(r"doc-(\d+)$", d)
            keep.append(m is None or int(m.group(1)) % 3 != 0)
        t = t.filter(pa.array(keep, pa.bool_()))
        return pa.table({"src": t["src_url"], "dst": t["href"]})

    edges = links.map_batches(to_edges, batch_format="pyarrow")
    # keep only edges whose target is a real page (semi-join on dst)
    edges = edges.join(
        nodes.materialize(),
        join_type="inner",
        num_partitions=_join_partitions(8),
        on=("dst",),
        right_on=("url",),
    )
    return pagerank(edges, nodes, iters=5)


def q_anchor_stats(sf_dir: str):
    """Corpus-wide anchor-text aggregation — the classic search-index
    signal: for every internal link target, how many pages refer to
    it with which anchor text.  Pre-aggregated per batch before one
    small groupby over distinct (target, text) pairs (the kernel's
    per-page first-wins dedup already bounds refs at one per page)."""
    ds = flagship_extract(sf_dir, columns=["links_internal"])

    def explode_partial(batch: pa.Table) -> pa.Table:
        import collections

        counts = collections.Counter()
        for i in range(batch.num_rows):
            for l in batch["links_internal"][i].as_py() or []:
                counts[(l["href"], l["text"])] += 1
        return pa.table(
            {
                "href": pa.array([k[0] for k in counts], pa.string()),
                "anchor": pa.array([k[1] for k in counts], pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(explode_partial, batch_format="pyarrow")
        .groupby(["href", "anchor"])
        .aggregate(Sum("n", alias_name="n_refs"))
    )


def q_link_stats(sf_dir: str):
    """Per-host page and link counts — the groupby(host) shuffle that
    backs politeness budgeting (partial-aggregated per batch before the
    small groupby)."""
    links = q_extract_links(sf_dir)

    def add_host(batch: pa.Table) -> pa.Table:
        hosts = [url_host(u) for u in batch["src_url"].to_pylist()]
        return batch.append_column("host", pa.array(hosts, pa.string()))

    with_host = links.map_batches(add_host, batch_format="pyarrow")

    # partial aggregate inside each batch, then a tiny global groupby
    def partial(batch: pa.Table) -> pa.Table:
        import collections

        pages = collections.defaultdict(set)
        n_links: dict[str, int] = collections.defaultdict(int)
        for h, u in zip(batch["host"].to_pylist(), batch["src_url"].to_pylist()):
            pages[h].add(u)
            n_links[h] += 1
        hosts = sorted(n_links)
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "n_pages_part": pa.array([len(pages[h]) for h in hosts], pa.int64()),
                "n_links_part": pa.array([n_links[h] for h in hosts], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    # n_pages via distinct src_url per host can't be partially summed if a
    # page's links span batches; extraction emits one row-group of links
    # per page inside one batch, so per-batch distinct-count is exact.
    parts = with_host.map_batches(partial, batch_format="pyarrow")
    return parts.groupby("host").aggregate(
        Sum("n_pages_part", alias_name="n_pages"), Sum("n_links_part", alias_name="n_links")
    )


def q_page_metadata(sf_dir: str):
    """(url, title, description) from the metadata extractor."""
    import json

    ds = flagship_extract(sf_dir, columns=["metadata"])

    def project(batch: pa.Table) -> pa.Table:
        titles, descs = [], []
        for m in batch["metadata"].to_pylist():
            meta = json.loads(m)
            titles.append(meta.get("title"))
            descs.append(meta.get("description"))
        return pa.table(
            {
                "url": batch["url"],
                "title": pa.array(titles, pa.string()),
                "description": pa.array(descs, pa.string()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def q_page_tables(sf_dir: str):
    """(url, n_tables, n_table_rows) for pages containing data tables
    (``DefaultTableExtraction`` parity)."""
    ds = flagship_extract(sf_dir, columns=["n_tables", "n_table_rows"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.greater(t["n_tables"], 0)), batch_format="pyarrow"
    )
    return ds.select_columns(["url", "n_tables", "n_table_rows"])


def q_regex_emails(sf_dir: str):
    """(url, value) email matches over raw page HTML
    (``RegexExtractionStrategy`` parity)."""
    pages = read_pages(sf_dir)
    matches = regex_extract(pages, ["email"], text_column="html")
    return matches.select_columns(["url", "value"])


# ---------------------------------------------------------------- frontier


def _min_n_public_urls(pages_path: str, n: int) -> list[str]:
    """The n lexicographically-smallest public urls WITHOUT
    materializing the url column on the driver: a column-pruned
    distributed min-n — each block filters ``/private/`` in-batch and
    reduces to its n smallest urls (a combiner, no shuffle), so the
    driver merge sees ≤ n rows per block regardless of corpus size
    (the ``_query_vectors`` recipe applied to seed selection)."""
    import pyarrow.compute as pc
    import ray.data as rd

    def min_n(batch: pa.Table) -> pa.Table:
        sub = batch.filter(
            pc.invert(pc.match_substring(batch["url"], "/private/"))
        )
        return sub.take(pc.sort_indices(sub["url"])[:n])

    parts = rd.read_parquet(pages_path, columns=["url"]).map_batches(
        min_n, batch_format="pyarrow"
    )
    return sorted(r["url"] for r in parts.take_all())[:n]


def _sorted_seed_urls(sf_dir: str, n: int = 3) -> list[str]:
    from .sources.pages import pages_parquet_path

    return _min_n_public_urls(pages_parquet_path(sf_dir), n)


def q_fetch_pages(sf_dir: str):
    """The round-5 digest semi-join fetch helper as a first-party
    query: re-fetch the 100 lexicographically-first public pages
    through ``frontier.crawl.fetch_pages_for_urls`` (worker-side
    8 B/url digest broadcast semi-filter + exact url hash join — no
    driver-side url list in the fetch itself; the 100-row probe
    selection here is budget-bounded) and report each page's html
    byte length.  Oracle: a plain IN-subquery over the pages
    parquet."""
    import pyarrow.compute as _pc
    import ray.data as rd

    from .frontier.crawl import fetch_pages_for_urls
    from .sources.pages import pages_parquet_path

    pages_path = pages_parquet_path(sf_dir)
    urls = _min_n_public_urls(pages_path, 100)
    url_ds = rd.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))

    def sizes(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": batch["url"],
                "n_bytes": _pc.cast(
                    _pc.binary_length(batch["html"]), pa.int64()
                ),
            }
        )

    return fetch_pages_for_urls(pages_path, url_ds).map_batches(
        sizes, batch_format="pyarrow"
    )


def q_frontier_bfs(sf_dir: str):
    """Full BSP BFS crawl (seeds = first 3 urls, depth ≤ 2, robots
    gate on) → final visited set (url, depth).  Oracle: recursive CTE
    min-depth reachability over the regexp-extracted link graph."""
    import tempfile

    from .frontier.crawl import BFSCrawl, CrawlConfig
    from .sources.pages import pages_parquet_path

    cfg = CrawlConfig(max_depth=2, check_robots=True, n_seen_shards=2)
    driver = BFSCrawl(
        pages_parquet_path(sf_dir), cfg, tempfile.mkdtemp(prefix="bfs_query_")
    )
    try:
        visited = driver.run(_sorted_seed_urls(sf_dir))
        return visited.select_columns(["url", "depth"]).materialize()
    finally:
        driver.shutdown()


def q_top_k_per_host(sf_dir: str):
    """Politeness round formation: per-host top-3 candidates by
    (keyword score desc, url asc) — the skew-safe cutoff-aggregate +
    join formulation (reference ``RateLimiter`` semantics as data
    movement)."""
    from .frontier.politeness import enforce_politeness
    from .frontier.scorers import KeywordRelevanceScorer

    scorer = KeywordRelevanceScorer(["articles", "doc-1"])
    pages = read_pages(sf_dir).select_columns(["url"])

    def to_frontier(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "host": pa.array([url_host(u) for u in urls], pa.string()),
                "score": pa.array(scorer.score_many(urls), pa.float64()),
            }
        )

    frontier = pages.map_batches(to_frontier, batch_format="pyarrow")
    selected, _deferred = enforce_politeness(frontier, per_host_cap=3)
    return selected.select_columns(["host", "url", "score"])


def q_robots_filter(sf_dir: str):
    """URLs admitted by the robots gate (synthetic rules:
    ``Disallow: /private/``)."""
    import ray

    from .frontier.robots import RobotsGate
    from .frontier.crawl import _AllHostsRules
    from .frontier.robots import DEFAULT_SYNTHETIC_RULES

    gate = RobotsGate({}, user_agent="*")
    gate._rules_by_host = _AllHostsRules(DEFAULT_SYNTHETIC_RULES)
    gate_ref = ray.put(gate)

    def allowed(batch: pa.Table) -> pa.Table:
        g = ray.get(gate_ref)
        urls = batch["url"].to_pylist()
        hosts = [url_host(u) for u in urls]
        mask = g.allowed_many(urls, hosts)
        return batch.filter(pa.array(mask, pa.bool_()))

    return read_pages(sf_dir).select_columns(["url"]).map_batches(
        allowed, batch_format="pyarrow"
    )


# ----------------------------------------------------- training-data ops


def _documents(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def q_dedup_exact(sf_dir: str):
    """Exact dedup: min doc_id per distinct text (hash-partitioned)."""
    from .functions.dedup import exact_dedup

    ds = _documents(sf_dir, ["doc_id", "text"])
    return exact_dedup(ds).select_columns(["doc_id"])


def q_jaccard_pairs(sf_dir: str):
    """n-gram-Jaccard near-dup pairs (3-word shingles, ≥ 0.5) via
    inverted-index join, with the max_df skew guard ON (tokens hotter
    than 100 docs are excluded from both sides — the oracle SQL drops
    the same tokens, so the comparison stays exact)."""
    from .functions.dedup import jaccard_pairs

    ds = _documents(sf_dir, ["doc_id", "text"])
    return jaccard_pairs(ds, threshold=0.5, shingle_n=3, max_df=100)


def q_dedup_minhash(sf_dir: str):
    """MinHash-LSH near-dup pairs (shingle→minhash→band→bucket
    groupby), verified by exact Jaccard via candidate⋈docs hash joins.
    32 bands × 2 rows: P(miss | j=0.5) < 1e-4, so the output equals
    the exact-Jaccard SQL oracle on this corpus (verified at sf0.01
    and sf0.1)."""
    from .functions.dedup import minhash_lsh_pairs

    ds = _documents(sf_dir, ["doc_id", "text"])
    return minhash_lsh_pairs(ds, threshold=0.5, num_perm=64, bands=32, shingle_n=3)


def q_dedup_simhash(sf_dir: str):
    """SimHash near-dup pairs (Hamming ≤ 3) via pigeonhole segment
    banding (lossless candidate superset); md5-based token hashes make
    the whole pipeline reproducible in the DuckDB oracle."""
    from .functions.dedup import simhash_pairs

    ds = _documents(sf_dir, ["doc_id", "text"])
    return simhash_pairs(ds, max_hamming=3)


def q_token_count(sf_dir: str):
    from .functions.textstats import token_count_batch

    return _documents(sf_dir, ["doc_id", "text"]).map_batches(
        token_count_batch, batch_format="pyarrow"
    )


def q_quality_score(sf_dir: str):
    from .functions.textstats import quality_batch

    return _documents(sf_dir, ["doc_id", "text"]).map_batches(
        quality_batch, batch_format="pyarrow"
    )


def q_lang_id(sf_dir: str):
    """Heuristic language ID (actor-pool stage); scoring arithmetic is
    SQL-replicable, so the driver gets a full oracle."""
    from .functions.textstats import language_id

    return language_id(_documents(sf_dir, ["doc_id", "text"])).select_columns(
        ["doc_id", "pred_lang", "lang_score"]
    )


def q_fingerprint(sf_dir: str):
    """Winnowing document fingerprints, exploded to (doc_id, rank,
    fp_hash) scalar rows; md5 window hashes give an exact SQL oracle."""
    from .functions.textstats import fingerprint_batch

    return _documents(sf_dir, ["doc_id", "text"]).map_batches(
        fingerprint_batch, batch_format="pyarrow"
    )


def _query_vectors(sf_dir: str, n: int = 5):
    """The n lowest-id query vectors, WITHOUT materializing the
    embeddings table on the driver: a column-pruned distributed
    min-n (each block reduces to its n smallest vec_ids — a combiner,
    no shuffle; take_all sees ≤ n rows per block), then a
    predicate-pushdown read of exactly those n rows (row-group
    pruning on vec_id)."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import ray.data as rd

    path = f"{sf_dir}/embeddings.parquet"

    def min_n(batch):
        idx = pc.sort_indices(batch["vec_id"])[:n]
        return batch.take(idx)

    parts = rd.read_parquet(path, columns=["vec_id"]).map_batches(
        min_n, batch_format="pyarrow"
    )
    ids = sorted(r["vec_id"] for r in parts.take_all())[:n]

    rows = (
        pads.dataset(path)
        .to_table(
            columns=["vec_id", "embedding"],
            filter=pc.field("vec_id").isin(ids),
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    vecs = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in rows["embedding"]]
    )
    return list(rows["vec_id"]), vecs


def q_knn_topk(sf_dir: str):
    """Exact cosine top-10 neighbors for the first 5 vectors
    (brute force: broadcast query matrix, per-batch matmul)."""
    import ray.data as rd

    from .functions.similarity import knn_brute_force

    ids, vecs = _query_vectors(sf_dir)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return knn_brute_force(ds, vecs, ids, k=10)


def q_knn_ivf(sf_dir: str):
    """IVF-bucketed cosine top-10 with n_probe = n_clusters, which
    makes it exactly the brute-force result (same SQL oracle as
    knn_topk); partial-probe recall is asserted in pytest."""
    import ray.data as rd

    from .functions.similarity import knn_ivf

    ids, vecs = _query_vectors(sf_dir)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return knn_ivf(ds, vecs, ids, k=10, n_clusters=8, n_probe=8)


def q_knn_lsh(sf_dir: str):
    """LSH-bucketed cosine top-10 with probe_hamming = n_bits (every
    bucket probed), which makes it exactly the brute-force result
    (same SQL oracle as knn_topk); restricted-probe recall is
    asserted in pytest."""
    import ray.data as rd

    from .functions.similarity import knn_lsh

    ids, vecs = _query_vectors(sf_dir)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return knn_lsh(ds, vecs, ids, k=10, n_bits=4, probe_hamming=4)


def q_dedup_embedding(sf_dir: str):
    """Embedding-cosine near-dup pairs over the embeddings table —
    exact all-pairs via block-pair task decomposition (no corpus
    broadcast).  Threshold 0.4: the synthetic embeddings are
    near-orthogonal (max pairwise cosine ≈ 0.51), so a
    production-style 0.9+ threshold would be vacuously empty."""
    import ray.data as rd

    from .functions.similarity import cosine_neardup_pairs

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return cosine_neardup_pairs(ds, threshold=0.4)


def q_media_features(sf_dir: str):
    """Multimodal plumbing: pages html bytes as opaque media payloads
    → actor-pool stub decode → (url, width, height, n_bytes)."""
    from .functions.multimodal import extract_media_features

    pages = read_pages(sf_dir).select_columns(["url", "html"])
    feats = extract_media_features(pages, binary_column="html")
    return feats.select_columns(["url", "width", "height", "n_bytes"])


def q_pdf_extract(sf_dir: str):
    """PDF round-trip over the documents table: each document's text
    (printable-ASCII + newline filtered, identically in the SQL
    oracle) is written into a synthetic PDF inside the pipeline by the
    deterministic mini-writer — with ``doc_id % 3`` embedded Image
    XObjects of known dims — parsed back by the stdlib PDF engine, and
    the extracted text + image enumeration (count, total pixels from
    the COS /Width × /Height metadata) emitted; any writer/parser
    defect breaks the oracle match."""
    import ray.data as rd

    from .functions.pdf import build_pdf, process_pdfs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_pdf(batch: pa.Table) -> pa.Table:
        import re as _re

        ids = batch["doc_id"].to_pylist()
        blobs = [
            build_pdf(
                [_re.sub(r"[^\x20-\x7e\n]", "", t or "")],
                images=[[(16 * (k + 1), 8 * (k + 1)) for k in range(i % 3)]],
            )
            for i, t in zip(ids, batch["text"].to_pylist())
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "pdf": pa.array(blobs, pa.binary()),
            }
        )

    pdfs = docs.map_batches(to_pdf, batch_format="pyarrow")
    return process_pdfs(pdfs).select_columns(
        ["doc_id", "n_pages", "text", "n_images", "image_px"]
    )


def q_asof_join(sf_dir: str):
    """For each ``click`` event, the user's most recent ``purchase``
    at or before the click (inner as-of semantics) — the bucketed
    ``merge_asof`` operator from ``functions/asof.py``; one hash
    shuffle for both streams, fat buckets, DuckDB ``ASOF JOIN``
    oracle."""
    import pyarrow.compute as _pc
    import ray.data as rd

    from .functions.asof import asof_join

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    def _only(kind: str):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.filter(_pc.equal(batch["event_type"], kind)).drop_columns(
                ["event_type"]
            )

        return fn

    clicks = ev.map_batches(_only("click"), batch_format="pyarrow").drop_columns(
        ["value"]
    )
    purchases = ev.map_batches(_only("purchase"), batch_format="pyarrow")
    return asof_join(
        clicks,
        purchases,
        by="user_id",
        on="ts",
        id_column="event_id",
        right_payload={"event_id": "match_event_id", "value": "match_value"},
    )


def q_range_join(sf_dir: str):
    """Every (click, purchase) pair of the same user with the purchase
    0–1 h after the click — the epoch-sharded bounded range join from
    ``functions/asof.py`` (each left row replicated into ≤2 epoch
    groups; plain inequality-join oracle)."""
    import pyarrow.compute as _pc
    import ray.data as rd

    from .functions.asof import range_join

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    def _only(kind: str):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.filter(_pc.equal(batch["event_type"], kind)).drop_columns(
                ["event_type"]
            )

        return fn

    clicks = ev.map_batches(_only("click"), batch_format="pyarrow").drop_columns(
        ["value"]
    )
    purchases = ev.map_batches(_only("purchase"), batch_format="pyarrow")
    return range_join(
        clicks,
        purchases,
        by="user_id",
        on="ts",
        lower_us=0,
        upper_us=3_600_000_000,
        right_payload={"event_id": "match_event_id", "value": "match_value"},
    )


def q_events_window(sf_dir: str):
    """Tumbling 1-hour windowed aggregate per event_type: partial
    aggregation inside map_batches, then a small groupby — the
    pre-aggregate-before-shuffle pattern."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        window = _pc.floor_temporal(batch["ts"], unit="hour")
        # sum in integer cents: order-independent exact aggregation,
        # pure-Arrow (round half-even matches Python round() on the
        # synthetic 2-decimal values)
        cents = _pc.cast(
            _pc.round(_pc.multiply(batch["value"], pa.scalar(100.0)), ndigits=0),
            pa.int64(),
        )
        keyed = pa.table(
            {
                "event_type": batch["event_type"],
                "window_start": window,
                "cents": cents,
            }
        )
        agg = pa.TableGroupBy(keyed, ["event_type", "window_start"]).aggregate(
            [("cents", "count"), ("cents", "sum")]
        )
        return agg.rename_columns(
            ["event_type", "window_start", "n_part", "cents_part"]
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return parts.groupby(["event_type", "window_start"]).aggregate(
        Sum("n_part", alias_name="n_events"),
        Sum("cents_part", alias_name="sum_value_cents"),
    )


def q_sessionize(sf_dir: str):
    """Session windows over the events stream: per-user, a gap > 30
    minutes starts a new session (the reference has no event-time
    windows — this is the streaming-shaped custom operator).

    Skew-lean formulation: ONE groupby(user) hash shuffle whose
    aggregate packs each user's (ts, event_id, cents) rows as bytes and
    sessionizes in numpy at finalize — no per-user pandas DataFrames
    (BASELINE.md measured tiny-group ``map_groups`` at ~0.2 ms/group;
    the aggregate path is a function call + packed array per group)."""
    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import AggregateFn

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts", "value"]
    )

    GAP_US = 30 * 60 * 1_000_000  # ts is timestamp[us]

    def _pack_block(acc, block):
        ts = block["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = block["event_id"].to_numpy(zero_copy_only=False)
        val = block["value"].to_numpy(zero_copy_only=False)
        rec = np.empty(len(ts), dtype=[("ts", "<i8"), ("eid", "<i8"), ("cents", "<i8")])
        rec["ts"] = ts
        rec["eid"] = eid
        # int(round(v*100)) semantics (banker's; matches the oracle's
        # round() on this corpus — values never land on exact .5)
        rec["cents"] = np.rint(val * 100).astype(np.int64)
        acc.append(rec.tobytes())
        return acc

    def _finalize(acc):
        rec = np.frombuffer(
            b"".join(acc), dtype=[("ts", "<i8"), ("eid", "<i8"), ("cents", "<i8")]
        )
        order = np.lexsort((rec["eid"], rec["ts"]))
        rec = rec[order]
        new_sess = np.empty(len(rec), dtype=bool)
        new_sess[0] = True
        new_sess[1:] = (rec["ts"][1:] - rec["ts"][:-1]) > GAP_US
        starts = np.nonzero(new_sess)[0]
        out = np.empty(len(starts), dtype=[("sid", "<i8"), ("start", "<i8"), ("n", "<i8"), ("cents", "<i8")])
        out["sid"] = np.arange(1, len(starts) + 1)
        out["start"] = rec["ts"][starts]
        out["n"] = np.diff(np.append(starts, len(rec)))
        out["cents"] = np.add.reduceat(rec["cents"], starts)
        return out.tobytes()

    sess_agg = AggregateFn(
        init=lambda k: [],
        accumulate_block=_pack_block,
        merge=lambda a, b: a + b,
        finalize=_finalize,
        name="sessions",
    )

    def explode(batch: pa.Table) -> pa.Table:
        import numpy as np

        users, sids, starts, ns, cents = [], [], [], [], []
        for uid, blob in zip(batch["user_id"].to_pylist(), batch["sessions"].to_pylist()):
            rec = np.frombuffer(
                blob, dtype=[("sid", "<i8"), ("start", "<i8"), ("n", "<i8"), ("cents", "<i8")]
            )
            users.extend([uid] * len(rec))
            sids.extend(rec["sid"].tolist())
            starts.extend(rec["start"].tolist())
            ns.extend(rec["n"].tolist())
            cents.extend(rec["cents"].tolist())
        return pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "session_id": pa.array(sids, pa.int64()),
                "session_start": pa.array(starts, pa.timestamp("us")),
                "n_events": pa.array(ns, pa.int64()),
                "sum_cents": pa.array(cents, pa.int64()),
            }
        )

    return (
        ds.groupby("user_id")
        .aggregate(sess_agg)
        .map_batches(explode, batch_format="pyarrow")
    )


def q_chunk_fixed(sf_dir: str):
    """Fixed-length word chunking exploded to
    (doc_id, chunk_index, n_chunk_words)."""
    from .functions.chunkers import FixedLengthWordChunking, chunk_dataset

    chunked = chunk_dataset(
        _documents(sf_dir, ["doc_id", "text"]), FixedLengthWordChunking(50)
    )

    def sizes(batch: pa.Table) -> pa.Table:
        n = [len(c.split(" ")) for c in batch["chunk"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "chunk_index": batch["chunk_index"],
                "n_chunk_words": pa.array(n, pa.int64()),
            }
        )

    return chunked.map_batches(sizes, batch_format="pyarrow")


def q_structured_extract(sf_dir: str):
    """JSON-CSS schema extraction over the synthetic pages' embedded
    data tables → exploded (url, item_key, item_value) rows."""
    import json

    from .functions.structured import extract_structured

    schema = {
        "name": "metrics",
        "baseSelector": "tbody tr",
        "fields": [
            {"name": "key", "type": "text", "selector": "td:nth-of-type(1)"},
            {"name": "value", "type": "text", "selector": "td:nth-of-type(2)"},
        ],
    }
    pages = read_pages(sf_dir).select_columns(["url", "html"])
    extracted = extract_structured(pages, schema)

    def explode(batch: pa.Table) -> pa.Table:
        urls, keys, vals = [], [], []
        for url, content in zip(
            batch["url"].to_pylist(), batch["extracted_content"].to_pylist()
        ):
            for item in json.loads(content):
                urls.append(url)
                keys.append(item.get("key"))
                vals.append(item.get("value"))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "item_key": pa.array(keys, pa.string()),
                "item_value": pa.array(vals, pa.string()),
            }
        )

    return extracted.map_batches(explode, batch_format="pyarrow")


def q_link_head_preview(sf_dir: str):
    """Link head preview: merge each internal link's target-page head
    title onto the link record (reference ``link_preview.py``
    ``_merge_head_data`` — there an async HEAD fetch per link; here a
    hash join of the links table against the pages' peeked heads)."""
    import ray.data as rd

    from .frontier.head_filters import get_title, peek_head
    from .sources.pages import pages_parquet_path

    links = q_extract_links(sf_dir).map_batches(
        lambda t: t.filter(t["internal"]), batch_format="pyarrow"
    )

    def heads(batch: pa.Table) -> pa.Table:
        titles = [
            get_title(peek_head(h or b"")) or "" for h in batch["html"].to_pylist()
        ]
        return pa.table(
            {
                "href": batch["url"],
                "head_title": pa.array(titles, pa.string()),
            }
        )

    pages_heads = rd.read_parquet(
        pages_parquet_path(sf_dir), columns=["url", "html"]
    ).map_batches(heads, batch_format="pyarrow")

    joined = links.select_columns(["src_url", "href"]).join(
        pages_heads, join_type="inner", num_partitions=4, on=("href",)
    )
    return joined.select_columns(["src_url", "href", "head_title"])


def q_seed_urls(sf_dir: str):
    """URL seeder: synthetic per-host sitemaps → parse urlsets →
    glob-pattern filter (``AsyncUrlSeeder.urls`` semantics)."""
    import ray.data as rd

    from .sources.seeder import seed_urls, sitemaps_parquet_path

    smaps = rd.read_parquet(sitemaps_parquet_path(sf_dir))
    return seed_urls(smaps, pattern="*/articles/*").select_columns(["url"])


def q_seed_robots(sf_dir: str):
    """Robots.txt sitemap-discovery fallback (reference
    ``_from_sitemaps`` step 2): Sitemap: lines → index expansion →
    urlset walk → pattern-filtered seed URLs; hosts whose robots omit
    the line contribute nothing."""
    from .sources.seeder import seed_from_robots

    return seed_from_robots(sf_dir, pattern="*/articles/*")


def q_crawl_delay_budget(sf_dir: str):
    """Per-host polite-crawl budget from robots ``Crawl-delay``:
    ``min(1000, 600s_round // delay)`` (cap when undeclared) — the
    reference RateLimiter's pacing as a per-round row budget."""
    import ray.data as rd

    from .frontier.robots import RobotsGate
    from .sources.seeder import robots_seed_parquet_path

    robots = rd.read_parquet(robots_seed_parquet_path(sf_dir))

    def budget(batch: pa.Table) -> pa.Table:
        hosts = batch["host"].to_pylist()
        texts = batch["robots_txt"].to_pylist()
        gate = RobotsGate(dict(zip(hosts, texts)), user_agent="*")
        # 0 = "no delay declared" sentinel: keeps the column NULL-free
        # (NaN-safe for value hashing) and budget-equivalent (<=0 -> cap)
        delays = [gate.crawl_delay(h) or 0 for h in hosts]
        budgets = [
            gate.host_budget(h, round_seconds=600, default_cap=1000)
            for h in hosts
        ]
        return pa.table(
            {
                "host": batch["host"],
                "crawl_delay": pa.array(delays, pa.int64()),
                "budget": pa.array(budgets, pa.int64()),
            }
        )

    return robots.map_batches(budget, batch_format="pyarrow")


def q_seed_cc(sf_dir: str):
    """Common-Crawl-style index seeding: domain glob + status/mime
    gate + url pattern + distinct (reference ``_from_cc``,
    ``async_url_seeder.py:709-764``)."""
    import ray.data as rd

    from .sources.seeder import cc_index_parquet_path, seed_from_cc_index

    cc = rd.read_parquet(cc_index_parquet_path(sf_dir))
    return seed_from_cc_index(
        cc, domain="example.com", pattern="*/articles/*", max_urls=200
    )


def _adaptive_start_url(sf_dir: str) -> tuple[str, str]:
    from .sources.pages import pages_parquet_path

    pages_path = pages_parquet_path(sf_dir)
    return pages_path, _min_n_public_urls(pages_path, 1)[0]


def _adaptive_rows(name: str, st) -> pa.Table:
    urls = sorted(st.crawled_urls)
    conf = round(st.metrics.get("confidence", 0.0), 4)
    return pa.table(
        {
            "strategy": pa.array([name] * len(urls), pa.string()),
            "url": pa.array(urls, pa.string()),
            "confidence": pa.array([conf] * len(urls), pa.float64()),
        }
    )


def q_adaptive_crawl(sf_dir: str):
    """Adaptive crawl-until-confident digest, reference
    StatisticalStrategy: crawled url set + final confidence.  Exact
    oracle: a per-iteration chained-CTE replay
    (oracles._adaptive_stat_sql)."""
    from .frontier.adaptive import AdaptiveConfig, adaptive_digest

    pages_path, start = _adaptive_start_url(sf_dir)
    cfg = AdaptiveConfig(confidence_threshold=0.9, max_pages=10, top_k_per_iteration=5)
    st = adaptive_digest(pages_path, start, "batch stream spark merge query", cfg)
    return _adaptive_rows("statistical", st)


def q_adaptive_crawl_embedding(sf_dir: str):
    """Adaptive digest with the EmbeddingStrategy (md5 feature-hashing
    embedder stand-in).  Exact oracle: a per-iteration chained-CTE
    replay with the embedder recomputed in SQL
    (oracles._adaptive_emb_sql); stop conditions also pytest-covered
    in tests/test_adaptive.py."""
    from .frontier.adaptive import AdaptiveConfig, adaptive_digest_embedding

    pages_path, start = _adaptive_start_url(sf_dir)
    cfg = AdaptiveConfig(confidence_threshold=0.9, max_pages=10, top_k_per_iteration=5)
    st = adaptive_digest_embedding(pages_path, start, "batch stream spark merge query", cfg)
    return _adaptive_rows("embedding", st)


def q_semantic_cluster(sf_dir: str):
    """CosineStrategy-shaped semantic clustering (hashing embedder,
    actor pool). Rows-only; determinism/cluster behavior in pytest."""
    from .functions.cosine import semantic_cluster

    docs = _documents(sf_dir, ["doc_id", "text"])

    def with_url(batch: pa.Table) -> pa.Table:
        urls = [f"doc://{i}" for i in batch["doc_id"].to_pylist()]
        return pa.table(
            {"url": pa.array(urls, pa.string()), "text": batch["text"]}
        )

    return semantic_cluster(docs.map_batches(with_url, batch_format="pyarrow"))


# ----------------------------------------------------------- curation ops


def q_pii_scrub(sf_dir: str):
    """PII redaction over raw page HTML (email/phone/ip → tokens),
    with per-rule match counts measured on the original text."""
    from .functions.curation import pii_scrub

    pages = read_pages(sf_dir)
    return pii_scrub(pages, text_column="html", id_column="url")


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: flag corpus docs sharing ≥10
    distinct 4-word shingles with the benchmark split (doc_id %
    17 == 0).  Benchmark shingle set broadcast once; corpus streams."""
    from .functions.curation import decontaminate

    def split(want_bench: bool):
        def fn(batch: pa.Table) -> pa.Table:
            is_bench = batch["doc_id"].to_numpy(zero_copy_only=False) % 17 == 0
            return batch.filter(pa.array(is_bench if want_bench else ~is_bench))

        return fn

    docs = _documents(sf_dir, ["doc_id", "text"])
    bench = docs.map_batches(split(True), batch_format="pyarrow")
    corpus = docs.map_batches(split(False), batch_format="pyarrow")
    return decontaminate(corpus, bench, shingle_n=4, threshold=10)


def q_gopher_quality(sf_dir: str):
    """Gopher-style repetition gate (word-level: dup-word fraction,
    top-2/3-gram fractions).  ``dup_word_max=0.6`` instead of the
    paper's line-level defaults so the gate discriminates on this
    line-less corpus (median dup_word_frac ≈ 0.54)."""
    from .functions.curation import repetition_quality

    docs = _documents(sf_dir, ["doc_id", "text"])
    return repetition_quality(docs, dup_word_max=0.6)


def q_gopher_filters(sf_dir: str):
    """Gopher document-quality rule set (Rae et al. 2021 §A.1.1:
    word-count bounds, mean-word-length bounds, alpha-word fraction,
    stop-word presence) + C4's lorem-ipsum/brace substring rules —
    integer cross-multiplied comparisons, no float division."""
    from .functions.curation import gopher_doc_filter

    return gopher_doc_filter(_documents(sf_dir, ["doc_id", "text"]))


def q_ccnet_normalize(sf_dir: str):
    """CCNet dedup-side text normalization (lower → strip accents →
    NFC → digits→0 → whitespace collapse), char-exact vs DuckDB's
    unicode kernels."""
    from .functions.curation import ccnet_normalize

    return ccnet_normalize(_documents(sf_dir, ["doc_id", "text"]))


def q_dedup_normalized(sf_dir: str):
    """Exact dedup over the CCNet-normalized form — the canonical
    CCNet first pass (normalization exists precisely so trivially
    different bytes hash together): min doc_id per distinct
    normalized text."""
    from .functions.curation import ccnet_normalize
    from .functions.dedup import exact_dedup

    norm = ccnet_normalize(_documents(sf_dir, ["doc_id", "text"]))
    return exact_dedup(norm, text_column="norm_text").select_columns(
        ["doc_id"]
    )


def q_weighted_sample(sf_dir: str):
    """Deterministic quality-proportional subsampling (soft filter):
    keep ⇔ md5(doc_id) % 8 < min(n_stopwords, 8)."""
    from .functions.curation import weighted_sample

    return weighted_sample(_documents(sf_dir, ["doc_id", "text"]))


def q_split_assign(sf_dir: str):
    """Deterministic md5-bucket train/val/test assignment (80/10/10)."""
    from .functions.curation import split_assign

    return split_assign(_documents(sf_dir, ["doc_id"]))


def q_length_quantiles(sf_dir: str):
    """Exact corpus token-length quantiles via histogram aggregation
    (distinct lengths shuffle, never the corpus; quantile_disc rule)."""
    from .functions.textstats import length_quantiles

    return length_quantiles(_documents(sf_dir, ["text"]))


def q_sample_per_group(sf_dir: str):
    """Deterministic stratified sample: 5 docs per source ranked by
    (md5(str(doc_id)), doc_id) — combiner-first top-k so the shuffle
    carries at most k rows per (group, block)."""
    from .functions.curation import sample_per_group

    return sample_per_group(
        _documents(sf_dir, ["doc_id", "source"]), group_column="source", k=5
    )


def q_dsir_select(sf_dir: str):
    """DSIR-style importance selection: global hashed-2-gram counts
    (target = the doc_id % 17 == 0 split vs the raw rest), broadcast
    once, raw pool scored by integer cross-multiplied relative
    frequency — exact vs the SQL oracle."""
    from .functions.curation import dsir_select

    docs = _documents(sf_dir, ["doc_id", "text"])
    return dsir_select(docs, is_target_fn=lambda i: i % 17 == 0)


def q_dedup_cluster(sf_dir: str):
    """Near-dedup finished: MinHash-LSH pairs → connected components
    (size-adaptive union-find / distributed min-label propagation) →
    one row per document with its duplicate-cluster id and the
    keep-the-min-id representative decision.  Oracle: recursive-CTE
    reachability over the exact-Jaccard pair set."""
    from .functions.dedup import near_dedup_clusters

    ds = _documents(sf_dir, ["doc_id", "text"])
    return near_dedup_clusters(
        ds, threshold=0.5, num_perm=64, bands=32, shingle_n=3
    )


def q_dedup_keep_best(sf_dir: str):
    """Near-dedup with quality-based representative selection: per
    duplicate cluster keep the doc with the most distinct words
    (tie → lowest id), decided by a packed-integer Max aggregate —
    the FineWeb-style 'keep the best copy' policy."""
    from .functions.dedup import near_dedup_keep_best

    ds = _documents(sf_dir, ["doc_id", "text"])
    return near_dedup_keep_best(
        ds, threshold=0.5, num_perm=64, bands=32, shingle_n=3
    )


def q_line_dedup(sf_dir: str):
    """Corpus-level duplicated-line removal (CCNet/RefinedWeb pass)
    over a derived multi-line corpus: each document becomes a page
    whose lines are its 16-word chunks, so the corpus' planted
    near-dups (one word changed) share most lines verbatim.  Every
    line that occurred earlier anywhere in the corpus is dropped
    (first occurrence by (page, position) wins), pages reassembled."""
    from .functions.dedup import line_dedup

    docs = _documents(sf_dir, ["doc_id", "text"])

    def to_pages(batch):
        import pyarrow as _pa

        texts = []
        for t in batch["text"].to_pylist():
            words = t.split(" ")
            texts.append(
                "\n".join(
                    " ".join(words[s : s + 16]) for s in range(0, len(words), 16)
                )
            )
        return _pa.table(
            {
                "page_id": batch["doc_id"],
                "text": _pa.array(texts, _pa.large_string()),
            }
        )

    pages = docs.map_batches(to_pages, batch_format="pyarrow")
    return line_dedup(pages, id_column="page_id")


def q_dedup_substring(sf_dir: str):
    """Exact repeated-substring removal (Lee et al. 2021 suffix-array
    dedup as a fixed-window streaming pass): every 10-token span whose
    exact text occurred earlier anywhere in the corpus is removed
    (first occurrence by (doc, start) wins), tokens covered by any
    duplicate window dropped, documents reassembled."""
    from .functions.dedup import substring_dedup

    ds = _documents(sf_dir, ["doc_id", "text"])
    return substring_dedup(ds, window=10)


def q_domain_filter(sf_dir: str):
    """Domain-level quality gate: per-source integer aggregates
    (combiner-first), one exact division for the corpus-level
    stopword ratio, keep decision joined back onto every document
    (broadcast under the domain threshold, hash join above)."""
    from .functions.curation import domain_filter

    ds = _documents(sf_dir, ["doc_id", "source", "text"])
    return domain_filter(ds, min_docs=10, min_stopword_ratio=0.06)


def q_build_postings(sf_dir: str):
    """Inverted index over the documents table: per token, exact df +
    the 16 lowest doc ids as a posting string (bounded smallest-k
    accumulator — hot stop-word tokens stay capped)."""
    from .functions.index import build_postings

    return build_postings(_documents(sf_dir, ["doc_id", "text"]), k=16)


def q_vocab_topk(sf_dir: str):
    """Global top-100 vocabulary by document frequency (combiner-first
    df counting; ties broken token-asc so the result is total-ordered
    and oracle-exact)."""
    from .functions.textstats import vocab_topk

    return vocab_topk(_documents(sf_dir, ["doc_id", "text"]), k=100)


def q_pack_sequences(sf_dir: str):
    """Training sequence packing: per-source doc_id-ordered exclusive
    token cumsum // 1024 — the deterministic cut-at-boundary packing
    assignment every shard can compute independently."""
    from .functions.textstats import pack_sequences

    return pack_sequences(
        _documents(sf_dir, ["doc_id", "source", "text"]), budget=1024
    )


def q_tfidf_topk(sf_dir: str):
    """Per-document top-5 TF-IDF terms, integer fixed-point scores
    (floor(tf·ln(N/df)·1e6)) so ordering and values are oracle-exact;
    df via combiner-first aggregate, tok⋈df hash join, per-doc top-k
    as a capped accumulator (no per-doc pandas groups)."""
    from .functions.textstats import tfidf_topk

    return tfidf_topk(_documents(sf_dir, ["doc_id", "text"]), k=5)


def q_dedup_incremental(sf_dir: str):
    """Incremental crawl dedup: the documents table split into a PRIOR
    corpus (doc_id % 4 == 0) and a NEW increment (the rest); keep the
    min-id new document per distinct text absent from the prior
    corpus.  One hash-partitioned groupby decides every group —
    nothing broadcast, nothing driver-side."""
    import pyarrow.compute as pc

    from .functions.dedup import incremental_dedup

    def side(want_prior: bool):
        def fn(batch):
            is_prior = pc.equal(pc.bit_wise_and(batch["doc_id"], 3), 0)
            return batch.filter(is_prior if want_prior else pc.invert(is_prior))

        return fn

    docs = _documents(sf_dir, ["doc_id", "text"])
    prior = docs.map_batches(side(True), batch_format="pyarrow")
    new = docs.map_batches(side(False), batch_format="pyarrow")
    return incremental_dedup(new, prior)


def q_ccnet_buckets(sf_dir: str):
    """CCNet head/middle/tail split: per-language LM-score tertiles
    over integer score bins (histogram cutoffs, pure-integer ceil
    rule) — the bucket decision every CCNet-style curation run makes."""
    import pyarrow as pa

    from .functions.curation import ccnet_buckets

    docs = _documents(sf_dir, ["doc_id", "text", "lang"])

    def ref_side(batch):
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % 10 == 0)).select(["doc_id", "text"])

    ref = docs.map_batches(ref_side, batch_format="pyarrow")
    return ccnet_buckets(docs, ref, salt=4)


def q_lm_score(sf_dir: str):
    """CCNet-style bigram-LM quality score: documents scored by total
    bigram log-likelihood (integer fixed point) under an add-one
    bigram model trained on the doc_id % 10 == 0 reference slice;
    count tables stream through salted hash joins (no broadcast)."""
    import pyarrow as pa

    from .functions.curation import lm_score

    docs = _documents(sf_dir, ["doc_id", "text"])

    def ref_side(batch):
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % 10 == 0))

    ref = docs.map_batches(ref_side, batch_format="pyarrow")
    return lm_score(docs, ref, salt=4)


def q_hll_distinct(sf_dir: str):
    """HyperLogLog distinct-href count over the exploded link table —
    the "how big is the discovered frontier" diagnostic a 10^10-URL
    crawl answers per round without an exact global distinct.  Raw
    integer-exact estimator (see functions/sketches.py); the oracle
    recomputes the identical registers + floor-divisions in SQL."""
    from .functions.sketches import hll_distinct

    links = q_extract_links(sf_dir)
    return hll_distinct(links, column="href")


def q_cms_counts(sf_dir: str):
    """Count-min sketch frequency estimates over the events stream:
    build a 4×512 sketch of user activity (per-block cell combiner →
    one constant-size groupby merge), probe it for every user with
    user_id % 97 == 0, and report estimate next to the exact count —
    the overestimate bound ``est ≥ true`` is visible in the output."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .functions.sketches import cms_estimate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def probe_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        ninety_seven = pa.scalar(97, pa.int64())
        # user_id % 97 == 0 (ids are non-negative, so trunc-div mod is fine)
        rem = _pc.subtract(
            batch["user_id"],
            _pc.multiply(_pc.divide(batch["user_id"], ninety_seven), ninety_seven),
        )
        keep = batch.filter(_pc.equal(rem, pa.scalar(0, pa.int64())))
        agg = pa.TableGroupBy(keep, ["user_id"]).aggregate([("user_id", "count")])
        return agg.rename_columns(["user_id", "n_part"])

    probes = (
        ds.map_batches(probe_partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("n_part", alias_name="true_count"))
    )
    return cms_estimate(ds, probes, column="user_id")


def q_jaccard_prefix(sf_dir: str):
    """EXACT Jaccard near-dup pairs (3-word shingles, ≥ 1/2) with
    prefix-filtering candidate generation (AllPairs/PPJoin): only each
    document's rarest ``n - ceil(n/2) + 1`` shingles are indexed, yet
    the output equals the full all-pairs join — the skew-safe exact
    path next to ``jaccard_pairs``' max_df recall-trading one.  The
    oracle is the unfiltered all-pairs SQL, so candidate-generation
    losslessness is itself driver-checked."""
    from .functions.dedup import jaccard_prefix_pairs

    ds = _documents(sf_dir, ["doc_id", "text"])
    return jaccard_prefix_pairs(
        ds, threshold_num=1, threshold_den=2, shingle_n=3
    )


def q_window_topk(sf_dir: str):
    """Per-hour top-3 event types by count ("trending now", the
    windowed top-k every stream pipeline runs): per-block
    (window, type) count combiner → exact counts in one groupby →
    per-window bounded top-k accumulator (state ≤ 4k tuples per
    window, no per-window pandas groups).  Ties break event_type-asc
    so ranks are total-ordered and oracle-exact."""
    import ray.data as rd
    from ray.data.aggregate import AggregateFn, Sum

    K = 3
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        keyed = pa.table(
            {
                "window_start": _pc.floor_temporal(batch["ts"], unit="hour"),
                "event_type": batch["event_type"],
            }
        )
        agg = pa.TableGroupBy(keyed, ["window_start", "event_type"]).aggregate(
            [("event_type", "count")]
        )
        return agg.rename_columns(["window_start", "event_type", "n_part"])

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .aggregate(Sum("n_part", alias_name="n_events"))
    )

    # accumulator entries are SORTABLE STRINGS (a list of strings
    # stays Arrow-native between accumulate and merge — tuples would
    # fall back to pickled blocks): "{BIG - n:013d}\x1ehex(type)"
    # sorts lexicographically as (count desc, type asc) — utf-8 hex
    # preserves byte order AND escapes the delimiters, so an
    # event_type containing \x1e/\x1f cannot corrupt the packing
    BIG = 10**12

    def _prune(acc):
        if len(acc) > 4 * K:
            acc.sort()
            del acc[K:]
        return acc

    def _acc(acc, block):
        types = (
            block["event_type"].to_pylist()
            if hasattr(block, "column_names")
            else list(block["event_type"])
        )
        ns = (
            block["n_events"].to_pylist()
            if hasattr(block, "column_names")
            else list(block["n_events"])
        )
        acc.extend(
            f"{BIG - n:013d}\x1e{t.encode().hex()}" for n, t in zip(ns, types)
        )
        return _prune(acc)

    topk_agg = AggregateFn(
        init=lambda k: [],
        accumulate_block=_acc,
        merge=lambda a, b: _prune(a + b),
        finalize=lambda acc: "\x1f".join(sorted(acc)[:K]),
        name="topk",
    )

    per_window = counts.groupby("window_start").aggregate(topk_agg)

    def explode(batch: pa.Table) -> pa.Table:
        ws, types, ns, ranks = [], [], [], []
        for w, packed in zip(
            batch["window_start"].to_pylist(), batch["topk"].to_pylist()
        ):
            for r, item in enumerate(packed.split("\x1f"), start=1):
                key, _, hexed = item.partition("\x1e")
                ws.append(w)
                types.append(bytes.fromhex(hexed).decode())
                ns.append(BIG - int(key))
                ranks.append(r)
        return pa.table(
            {
                "window_start": pa.array(ws, pa.timestamp("us")),
                "event_type": pa.array(types, pa.string()),
                "n_events": pa.array(ns, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
            }
        )

    return per_window.map_batches(explode, batch_format="pyarrow")


def q_semantic_dedup(sf_dir: str):
    """SemDeDup over the embeddings table: cluster (8 deterministic
    centroids = vec_id < 8, argmax-cosine assignment), then drop any
    vector with a smaller-id near-duplicate (cosine ≥ 0.4) in its own
    cluster — the embedding-space dedup that scales by bucketing
    before the quadratic verify (Abbas et al. 2023)."""
    import ray.data as rd

    from .functions.similarity import semantic_dedup

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return semantic_dedup(ds, threshold=0.4, n_clusters=8)


def q_mixture_sample(sf_dir: str):
    """Training-mixture sampling: each source srcN gets per-mille
    weight 10·(N % 5 + 1) against a 400-doc budget — quotas of 4/8/12/
    16/20 docs per source, selected by the seedless md5-rank.  The
    oracle derives the same weights from the source name, so the
    mixture math is driver-checked end to end."""
    import re

    from .functions.curation import mixture_sample

    docs = _documents(sf_dir, ["doc_id", "source"])
    sources = {r["source"] for r in docs.groupby("source").count().take_all()}
    weights = {
        s: 10 * (int(re.search(r"(\d+)$", s).group(1)) % 5 + 1)
        for s in sources
        if re.search(r"(\d+)$", s)
    }
    return mixture_sample(docs, weights_permille=weights, total=400)


def q_events_hopping(sf_dir: str):
    """HOPPING-window aggregate (1-hour windows, 30-minute hop): every
    event lands in exactly two overlapping windows — the sliding-dash-
    board shape tumbling windows can't express.  Replication happens
    inside the per-block combiner (each event contributes two
    (window, type) partial rows), so the shuffle still moves only
    aggregated partials."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])
    HOP_US = 30 * 60 * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        ts_us = _pc.cast(batch["ts"], pa.int64())
        floor30 = _pc.multiply(
            _pc.divide(ts_us, pa.scalar(HOP_US, pa.int64())),
            pa.scalar(HOP_US, pa.int64()),
        )
        cents = _pc.cast(
            _pc.round(_pc.multiply(batch["value"], pa.scalar(100.0)), ndigits=0),
            pa.int64(),
        )
        parts = []
        for off in (0, HOP_US):
            start = _pc.cast(
                _pc.subtract(floor30, pa.scalar(off, pa.int64())),
                pa.timestamp("us"),
            )
            parts.append(
                pa.table(
                    {
                        "event_type": batch["event_type"],
                        "window_start": start,
                        "cents": cents,
                    }
                )
            )
        keyed = pa.concat_tables(parts)
        agg = pa.TableGroupBy(keyed, ["event_type", "window_start"]).aggregate(
            [("cents", "count"), ("cents", "sum")]
        )
        return agg.rename_columns(
            ["event_type", "window_start", "n_part", "cents_part"]
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return parts.groupby(["event_type", "window_start"]).aggregate(
        Sum("n_part", alias_name="n_events"),
        Sum("cents_part", alias_name="sum_value_cents"),
    )


def q_rolling_window(sf_dir: str):
    """Per-event trailing 30-minute window per user (count + cents
    sum): the SQL RANGE-frame / streaming rate-limiter shape — one
    output row per event, each with its own bounded lookback.  Epoch-
    sharded so the single shuffle moves each event ≤3 times and every
    (probe, context) pair meets exactly once."""
    import ray.data as rd

    from .functions.asof import rolling_window

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    )
    return rolling_window(
        ev,
        by="user_id",
        on="ts",
        id_column="event_id",
        value_column="value",
        window_us=1_800_000_000,
    )


def q_host_triangles(sf_dir: str):
    """Per-host triangle counts over the undirected host link graph
    (degree-oriented wedge generation + one candidate⋈edge hash join
    — the MapReduce-standard √m-bounded algorithm); the local-closure
    signal for link-farm detection."""
    from .functions.graph import host_triangles

    links = q_extract_links(sf_dir)
    # host key space is tiny at test scale — cap join partitioning
    # (same floor-guard note as q_host_rank)
    return host_triangles(links, num_partitions=4)


def q_kmeans_assign(sf_dir: str):
    """Distributed Lloyd k-means over the embeddings table (k=8, 2 BSP
    update rounds, integer fixed-point): broadcast centroids, one
    integer matmul per block, k×d combiner rows per block through the
    shuffle — bit-identical at any parallelism, replayed exactly by a
    chained-CTE oracle."""
    import ray.data as rd

    from .functions.clustering import kmeans_lloyd

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return kmeans_lloyd(ds, k=8, iters=2)


def q_funnel(sf_dir: str):
    """Conversion-funnel analysis per user: greedy ordered-sequence
    match view → click → purchase (each stage's timestamp is the
    earliest STRICTLY after the previous stage's) — the
    sequential-pattern shape none of the windowed aggregates express.

    Scale shape: rows of other event types are dropped BEFORE the
    shuffle; one groupby(user) whose aggregate packs (ts, kind) pairs
    as bytes and replays the greedy scan vectorized at finalize —
    same skew-lean packed-aggregate pattern as ``sessionize``.
    Timestamps are emitted as int64 epoch-µs with -1 for unreached
    stages (NULL-free so value hashes are stable)."""
    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import AggregateFn

    KINDS = {"view": 0, "click": 1, "purchase": 2}

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )

    def prefilter(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(
            batch["event_type"], value_set=pa.array(list(KINDS), pa.string())
        )
        t = batch.filter(mask)
        kind = pa.array(
            [KINDS[k] for k in t["event_type"].to_pylist()], pa.int64()
        )
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts_us": t["ts"].cast(pa.int64()),
                "kind": kind,
            }
        )

    slim = ds.map_batches(prefilter, batch_format="pyarrow")

    def _pack(acc, block):
        rec = np.empty(
            block.num_rows, dtype=[("ts", "<i8"), ("kind", "<i8")]
        )
        rec["ts"] = block["ts_us"].to_numpy(zero_copy_only=False)
        rec["kind"] = block["kind"].to_numpy(zero_copy_only=False)
        acc.append(rec.tobytes())
        return acc

    def _finalize(acc):
        rec = np.frombuffer(
            b"".join(acc), dtype=[("ts", "<i8"), ("kind", "<i8")]
        )
        out = np.full(4, -1, dtype=np.int64)  # stage, t1, t2, t3
        stage = 0
        prev = np.int64(-(1 << 62))
        for s in range(3):
            m = (rec["kind"] == s) & (rec["ts"] > prev)
            if not m.any():
                break
            prev = rec["ts"][m].min()
            out[1 + s] = prev
            stage = s + 1
        out[0] = stage
        return out.tobytes()

    agg = AggregateFn(
        init=lambda k: [],
        accumulate_block=_pack,
        merge=lambda a, b: a + b,
        finalize=_finalize,
        name="funnel",
    )

    def explode(batch: pa.Table) -> pa.Table:
        import numpy as np

        users = batch["user_id"].to_pylist()
        mats = np.stack(
            [
                np.frombuffer(blob, dtype=np.int64)
                for blob in batch["funnel"].to_pylist()
            ]
        ) if users else np.empty((0, 4), dtype=np.int64)
        return pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "funnel_stage": pa.array(mats[:, 0], pa.int64()),
                "t_view_us": pa.array(mats[:, 1], pa.int64()),
                "t_click_us": pa.array(mats[:, 2], pa.int64()),
                "t_purchase_us": pa.array(mats[:, 3], pa.int64()),
            }
        )

    return (
        slim.groupby("user_id")
        .aggregate(agg)
        .map_batches(explode, batch_format="pyarrow")
    )


def q_pmi_pairs(sf_dir: str):
    """Top-100 co-occurring token pairs by integer PMI lift (window 3,
    min count 10) over the documents table — combiner-first pair
    counting, two hash joins for unigram attach, total-ordered cutoff."""
    from .functions.textstats import pmi_pairs

    return pmi_pairs(
        _documents(sf_dir, ["doc_id", "text"]),
        window=3,
        min_count=10,
        top_k=100,
    )


def q_curate_pipeline(sf_dir: str):
    """End-to-end corpus curation as ONE lazy streaming graph — the
    CCNet/FineWeb shape (Wenzek 2020, Penedo 2024) every web-scale
    training-data run executes: normalize → exact dedup on the
    normalized form → Gopher document-quality gate → pack survivors
    into fixed-budget training sequences.

    Composition of four already-oracled stages, wired so nothing
    corpus-sized ever leaves the streaming plan: the dedup winner set
    is (hash, id) rows only; survivor text is re-attached by ONE hash
    semi-join on doc_id; the quality gate is a stateless vectorized
    pass that filters in place (no second join); packing shuffles only
    (source, id, n_tokens).  Output: (source, doc_id, n_tokens,
    seq_index) for every kept document."""
    import functools

    from .functions.curation import ccnet_normalize, gopher_doc_filter_batch
    from .functions.dedup import _join_partitions, exact_dedup, hash_join_safe
    from .functions.textstats import pack_sequences

    docs = _documents(sf_dir, ["doc_id", "source", "text"])
    winners = exact_dedup(
        ccnet_normalize(docs), text_column="norm_text"
    ).select_columns(["doc_id"])
    survivors = hash_join_safe(
        docs,
        winners,
        on=("doc_id",),
        right_on=("doc_id",),
        join_type="inner",
        num_partitions=_join_partitions(8),
    )

    gate = functools.partial(
        gopher_doc_filter_batch,
        min_words=30,
        max_words=90,
        mean_len_lo_x10=40,
        mean_len_hi_x10=50,
        min_stop=3,
    )

    def keep_passing(batch: pa.Table) -> pa.Table:
        return batch.filter(gate(batch)["passed"])

    kept = survivors.map_batches(keep_passing, batch_format="pyarrow")
    return pack_sequences(kept, budget=1024)


def q_rate_anomaly(sf_dir: str):
    """Per-type hourly event-rate spike detection — the stream-health
    monitor every crawl/ingest pipeline runs: an (event_type, hour)
    bucket spikes when its count exceeds 1.5× the type's mean count
    over its active hours, compared integer-exactly by
    cross-multiplication (2·n·H > 3·C — no float mean).

    Scale shape: per-block partial counts collapse each block to its
    distinct (type, hour) keys before the shuffle; everything after
    the first groupby is bounded by types × hours, so the per-type
    totals and the attach join are small."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from .functions.dedup import _coalesce_for_join, _join_partitions, hash_join_safe

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        keyed = pa.table(
            {
                "event_type": batch["event_type"],
                "window_start": _pc.floor_temporal(batch["ts"], unit="hour"),
            }
        )
        agg = pa.TableGroupBy(keyed, ["event_type", "window_start"]).aggregate(
            [([], "count_all")]
        )
        return agg.rename_columns(["event_type", "window_start", "n_part"])

    hourly = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("n_part", alias_name="n_events"))
    )
    hourly, _ = _coalesce_for_join(hourly)

    totals = hourly.groupby("event_type").aggregate(
        Sum("n_events", alias_name="type_total"),
        Count(alias_name="type_hours"),
    )
    totals, _ = _coalesce_for_join(totals)

    joined = hash_join_safe(
        hourly,
        totals,
        on=("event_type",),
        right_on=("event_type",),
        join_type="inner",
        num_partitions=_join_partitions(2),
    )

    def flag(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        lhs = _pc.multiply(
            _pc.multiply(batch["n_events"], pa.scalar(2, pa.int64())),
            batch["type_hours"],
        )
        rhs = _pc.multiply(batch["type_total"], pa.scalar(3, pa.int64()))
        return batch.append_column("spike", _pc.greater(lhs, rhs))

    return joined.map_batches(flag, batch_format="pyarrow")


def q_novelty_score(sf_dir: str):
    """Per-document 3-gram novelty vs the corpus: distinct-shingle
    count, shared-shingle count (df ≥ 2), and the integer
    more-than-half-unique flag."""
    from .functions.curation import novelty_score

    return novelty_score(_documents(sf_dir, ["doc_id", "text"]))


def q_host_distance(sf_dir: str):
    """Crawl-radius report: BFS hop distance of every host from the
    'site0.*' seed hosts over the distinct host→host link graph,
    capped at 3 hops — BSP min-label rounds, bit-identical at any
    parallelism."""
    from .functions.graph import hop_distance

    edges, nodes = _host_edges_nodes(sf_dir)

    def is_seed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return batch.filter(_pc.starts_with(batch["host"], "site0."))

    seeds = nodes.map_batches(is_seed, batch_format="pyarrow")
    return hop_distance(edges, seeds, node_column="host", max_hops=3, num_partitions=2)


def q_kmeans_medoids(sf_dir: str):
    """Per-cluster medoid (closest vector to the final centroid, ties
    → smallest vec_id) after the same integer Lloyd fit as
    kmeans_assign — the exemplar-selection decision."""
    import ray.data as rd

    from .functions.clustering import kmeans_medoids

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return kmeans_medoids(emb, k=8, iters=2)


def q_rank_blend(sf_dir: str):
    """Rank-based two-signal quality blend over documents: per-doc
    word-count and stop-word-count ranks (count-of-smaller, exact via
    bounded histograms — no corpus sort) and their sum."""
    from .functions.curation import rank_blend

    return rank_blend(_documents(sf_dir, ["doc_id", "text"]))


def q_props_stats(sf_dir: str):
    """Semi-structured column handling: parse the events table's JSON
    ``props`` payload (schema-on-read — the shape every event/crawl
    log pipeline hits) and aggregate the extracted integer field per
    event type: count, sum, and exact distinct-value count.

    Scale shape: the parse is a stateless per-block pass; count/sum
    ride a per-block distinct-key combiner, and the distinct count
    shuffles only DISTINCT (type, k) pairs (bounded by the value
    domain), then reduces per type — raw events never shuffle."""
    import json as _json

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from .functions.dedup import _coalesce_for_join, _join_partitions, hash_join_safe

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    def parse(batch: pa.Table) -> pa.Table:
        ks = [
            int(_json.loads(p)["k"]) for p in batch["props"].to_pylist()
        ]
        return pa.table(
            {
                "event_type": batch["event_type"],
                "k": pa.array(ks, pa.int64()),
            }
        )

    parsed = ds.map_batches(parse, batch_format="pyarrow")

    def stat_partial(batch: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(batch, ["event_type"]).aggregate(
            [([], "count_all"), ("k", "sum")]
        )
        return agg.rename_columns(["event_type", "n_part", "s_part"])

    stats = (
        parsed.map_batches(stat_partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_part", alias_name="n_events"),
            Sum("s_part", alias_name="sum_k"),
        )
    )
    stats, _ = _coalesce_for_join(stats)

    def distinct_partial(batch: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(batch, ["event_type", "k"]).aggregate([([], "count_all")])
        return agg.select(["event_type", "k"])

    distinct = (
        parsed.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby(["event_type", "k"])
        .aggregate(Count(alias_name="dup"))
        .groupby("event_type")
        .aggregate(Count(alias_name="n_distinct_k"))
    )
    distinct, _ = _coalesce_for_join(distinct)

    return hash_join_safe(
        stats,
        distinct,
        on=("event_type",),
        right_on=("event_type",),
        join_type="inner",
        num_partitions=_join_partitions(2),
    )


def q_hll_by_type(sf_dir: str):
    """Distinct users per event type via the grouped HyperLogLog
    aggregate — register merges and the integer raw estimator, no
    per-key group materialization."""
    import ray.data as rd

    from .functions.sketches import hll_distinct_by

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    return hll_distinct_by(ds, key_column="event_type", column="user_id")


def q_group_clip(sf_dir: str):
    """Per-group winsorization: clip each event's integer-cents value
    at its event type's exact p99 — outlier taming before value
    aggregation, with the cutoff computed the scale-safe way.

    The per-type p99 is EXACT without sorting the stream: cents are a
    bounded integer domain, so each block reduces to a (type, cents)
    histogram, the groupby moves only distinct pairs, and the
    cumulative walk runs on that tiny table driver-side (bounded by
    types × distinct cents, never event count).  Cutoffs broadcast via
    ``ray.put`` into one stateless clip pass.  Quantile rule =
    DuckDB ``quantile_disc``: sorted element at max(0, ceil(q·n)-1)."""
    import math

    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    def cents_of(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return pa.table(
            {
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "cents": _pc.cast(
                    _pc.round(_pc.multiply(batch["value"], pa.scalar(100.0)), ndigits=0),
                    pa.int64(),
                ),
            }
        )

    cents = ds.map_batches(cents_of, batch_format="pyarrow").materialize()

    def hist_partial(batch: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(
            batch.select(["event_type", "cents"]), ["event_type", "cents"]
        ).aggregate([([], "count_all")])
        return agg.rename_columns(["event_type", "cents", "n_part"])

    hist = (
        cents.map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["event_type", "cents"])
        .aggregate(Sum("n_part", alias_name="n"))
        .take_all()  # bounded by types × distinct cents values
    )
    by_type: dict = {}
    for r in hist:
        by_type.setdefault(r["event_type"], []).append((r["cents"], r["n"]))
    cuts = {}
    for et, rows in by_type.items():
        rows.sort()
        n = sum(c for _, c in rows)
        idx = max(0, math.ceil(0.99 * n) - 1)
        acc = 0
        for v, c in rows:
            acc += c
            if acc > idx:
                cuts[et] = v
                break
    ref = ray.put(cuts)

    def clip(batch: pa.Table) -> pa.Table:
        cut_map = ray.get(ref)
        vals = batch["cents"].to_pylist()
        clipped = [
            min(v, cut_map[t])
            for v, t in zip(vals, batch["event_type"].to_pylist())
        ]
        return pa.table(
            {
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "cents": batch["cents"],
                "cents_clipped": pa.array(clipped, pa.int64()),
            }
        )

    return cents.map_batches(clip, batch_format="pyarrow")


def q_knn_rrf(sf_dir: str):
    """Hybrid retrieval: reciprocal-rank fusion of the exact cosine
    and inner-product top-20 lists for the 5 lowest-id query vectors,
    integer RRF scores, top-10 fused per query."""
    import ray.data as rd

    from .functions.similarity import knn_rrf

    qids, qvecs = _query_vectors(sf_dir, n=5)
    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return knn_rrf(ds, qvecs, qids, k=10, k_each=20)


def q_dangling_links(sf_dir: str):
    """Link-rot audit: per source host, how many extracted links point
    at URLs that do NOT exist in the crawled corpus (the 404/frontier
    -gap signal that drives recrawl and seed decisions), with an
    integer per-mille rate.

    Scale shape: link rows collapse to distinct (host, href) pairs
    with counts inside each block before any shuffle; the existence
    check is ONE href-keyed hash left-join against the (distinct) page
    URL set — no URL set is ever collected or broadcast — and the
    per-host rollup is a bounded groupby."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .functions.dedup import _coalesce_for_join, _join_partitions, hash_join_safe
    from .functions.graph import _host_of
    from .sources.pages import pages_parquet_path

    links = q_extract_links(sf_dir)

    def pair_partial(batch: pa.Table) -> pa.Table:
        hosts = [_host_of(u) for u in batch["src_url"].to_pylist()]
        keyed = pa.table(
            {"host": pa.array(hosts, pa.string()), "href": batch["href"]}
        )
        agg = pa.TableGroupBy(keyed, ["host", "href"]).aggregate([([], "count_all")])
        return agg.rename_columns(["host", "href", "n_part"])

    pairs = (
        links.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["host", "href"])
        .aggregate(Sum("n_part", alias_name="n"))
    )
    pairs, _ = _coalesce_for_join(pairs)

    page_urls = rd.read_parquet(pages_parquet_path(sf_dir), columns=["url"])

    def mark(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": batch["url"],
                "present": pa.array([1] * batch.num_rows, pa.int64()),
            }
        )

    marked = page_urls.map_batches(mark, batch_format="pyarrow")
    marked, _ = _coalesce_for_join(marked)

    joined = hash_join_safe(
        pairs,
        marked,
        on=("href",),
        right_on=("url",),
        join_type="left_outer",
        num_partitions=_join_partitions(8),
    )

    def roll_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        dang = _pc.multiply(
            batch["n"],
            _pc.cast(_pc.is_null(batch["present"]), pa.int64()),
        )
        keyed = pa.table(
            {"host": batch["host"], "nl": batch["n"], "nd": dang}
        )
        agg = pa.TableGroupBy(keyed, ["host"]).aggregate(
            [("nl", "sum"), ("nd", "sum")]
        )
        return agg.rename_columns(["host", "nl_part", "nd_part"])

    rolled = (
        joined.map_batches(roll_partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Sum("nl_part", alias_name="n_links"),
            Sum("nd_part", alias_name="n_dangling"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        permille = _pc.divide(
            _pc.multiply(batch["n_dangling"], pa.scalar(1000, pa.int64())),
            batch["n_links"],
        )
        return batch.append_column(
            "dangling_permille", _pc.cast(permille, pa.int64())
        )

    return rolled.map_batches(finish, batch_format="pyarrow")


def q_boilerplate_strip(sf_dir: str):
    """Per-source boilerplate removal: 8-word chunks appearing in ≥ 2
    distinct documents of the same source are template text — all
    occurrences dropped, documents reassembled."""
    from .functions.curation import boilerplate_strip

    return boilerplate_strip(_documents(sf_dir, ["doc_id", "source", "text"]))


def q_term_search(sf_dir: str):
    """Boolean-AND term search served FROM the corpus the inverted
    index indexes: documents containing both 'spark' and 'vector',
    scored by summed term frequency, top-20 by (score desc, doc_id).

    Scale shape: the term filter runs inside the scan batch (a doc
    emits at most one tiny (doc, term, tf) row per query term — the
    predicate-pushdown shape), so the shuffle carries only matching
    docs; the AND is a per-doc count==n_terms check after one
    groupby."""
    from ray.data.aggregate import Count, Sum

    TERMS = ("spark", "vector")
    docs = _documents(sf_dir, ["doc_id", "text"])

    def tf_rows(batch: pa.Table) -> pa.Table:
        ids, terms, tfs = [], [], []
        for i, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            words = (t or "").split(" ")
            for term in TERMS:
                n = sum(1 for w in words if w == term)
                if n:
                    ids.append(i)
                    terms.append(term)
                    tfs.append(n)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "term": pa.array(terms, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
            }
        )

    per_doc = (
        docs.map_batches(tf_rows, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Count(alias_name="n_terms"),
            Sum("tf", alias_name="score"),
        )
    )
    hits = per_doc.filter(expr=f"n_terms == {len(TERMS)}").select_columns(
        ["doc_id", "score"]
    )
    return hits.sort(["score", "doc_id"], descending=[True, False]).limit(20)


def q_cohort_retention(sf_dir: str):
    """Weekly cohort retention over the events stream: users grouped
    by first-activity week, counted again in each later week they
    remain active — the engagement matrix behind every retention
    curve.  Output: (cohort_week, active_week, n_users).

    Scale shape: distinct (user, week) pairs are the per-block
    combiner output (raw events never shuffle); first-week is one
    groupby-min over those pairs; the cohort attach is a user-keyed
    hash join of two already-distinct tables; the final count is a
    bounded weeks×weeks groupby."""
    import ray.data as rd
    from ray.data.aggregate import Count, Min

    from .functions.dedup import _coalesce_for_join, _join_partitions, hash_join_safe

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def pairs_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        keyed = pa.table(
            {
                "user_id": batch["user_id"],
                "week": _pc.floor_temporal(batch["ts"], unit="week"),
            }
        )
        agg = pa.TableGroupBy(keyed, ["user_id", "week"]).aggregate([([], "count_all")])
        return agg.select(["user_id", "week"])

    pairs = (
        ds.map_batches(pairs_partial, batch_format="pyarrow")
        .groupby(["user_id", "week"])
        .aggregate(Count(alias_name="dup"))
        .select_columns(["user_id", "week"])
        .materialize()
    )

    first = pairs.groupby("user_id").aggregate(Min("week", alias_name="cohort_week"))
    first, _ = _coalesce_for_join(first)
    pairs_c, _ = _coalesce_for_join(pairs)

    joined = hash_join_safe(
        pairs_c,
        first,
        on=("user_id",),
        right_on=("user_id",),
        join_type="inner",
        num_partitions=_join_partitions(4),
    )
    return (
        joined.groupby(["cohort_week", "week"])
        .aggregate(Count(alias_name="n_users"))
        .rename_columns({"week": "active_week"})
    )


def q_suffstats(sf_dir: str):
    """Distributed sufficient statistics per source over two integer
    document signals (word count x, stop-word count y): n, Σx, Σy,
    Σxy, Σx², Σy² — the order-free building blocks every downstream
    mean/variance/covariance/regression needs, so the cluster ships
    six int64s per (block, source) instead of raw rows.  Integer sums
    are associative-commutative exact at any parallelism."""
    from ray.data.aggregate import Sum

    from .functions.curation import STOPWORDS

    docs = _documents(sf_dir, ["doc_id", "source", "text"])
    stop = set(STOPWORDS)

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        srcs = batch["source"].to_pylist()
        xs, ys = [], []
        for t in batch["text"].to_pylist():
            words = (t or "").split(" ")
            xs.append(len(words))
            ys.append(sum(1 for w in words if w in stop))
        x = np.asarray(xs, dtype=np.int64)
        y = np.asarray(ys, dtype=np.int64)
        keyed = pa.table(
            {
                "source": pa.array(srcs, pa.string()),
                "n": pa.array([1] * len(xs), pa.int64()),
                "sx": pa.array(x, pa.int64()),
                "sy": pa.array(y, pa.int64()),
                "sxy": pa.array(x * y, pa.int64()),
                "sxx": pa.array(x * x, pa.int64()),
                "syy": pa.array(y * y, pa.int64()),
            }
        )
        agg = pa.TableGroupBy(keyed, ["source"]).aggregate(
            [(c, "sum") for c in ("n", "sx", "sy", "sxy", "sxx", "syy")]
        )
        return agg.rename_columns(
            ["source", "n_p", "sx_p", "sy_p", "sxy_p", "sxx_p", "syy_p"]
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_p", alias_name="n"),
            Sum("sx_p", alias_name="sum_x"),
            Sum("sy_p", alias_name="sum_y"),
            Sum("sxy_p", alias_name="sum_xy"),
            Sum("sxx_p", alias_name="sum_xx"),
            Sum("syy_p", alias_name="sum_yy"),
        )
    )


def q_event_transitions(sf_dir: str):
    """First-order Markov transition counts over each user's
    time-ordered event sequence (prev_type → next_type) — the
    sequence-statistics shape behind behavior modeling and
    next-event prediction.

    Scale shape: same packed-bytes per-user aggregate as ``funnel`` /
    ``sessionize`` (one groupby; aggregate state = one user's (ts,
    event_id, code) triples, order restored at finalize with the
    deterministic (ts, event_id) tie-break), then per-user counts
    explode into (prev, next, n) partials and a bounded types² 
    groupby sums them."""
    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import AggregateFn, Sum

    TYPES = ("click", "error", "purchase", "signup", "view")
    CODE = {t: i for i, t in enumerate(TYPES)}

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type"],
    )

    def slim(batch: pa.Table) -> pa.Table:
        codes = []
        for t in batch["event_type"].to_pylist():
            if t not in CODE:
                raise ValueError(f"unknown event type {t!r}")
            codes.append(CODE[t])
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts_us": batch["ts"].cast(pa.int64()),
                "event_id": batch["event_id"],
                "code": pa.array(codes, pa.int64()),
            }
        )

    slimmed = ds.map_batches(slim, batch_format="pyarrow")

    DT = [("ts", "<i8"), ("eid", "<i8"), ("code", "<i8")]

    def _pack(acc, block):
        rec = np.empty(block.num_rows, dtype=DT)
        rec["ts"] = block["ts_us"].to_numpy(zero_copy_only=False)
        rec["eid"] = block["event_id"].to_numpy(zero_copy_only=False)
        rec["code"] = block["code"].to_numpy(zero_copy_only=False)
        acc.append(rec.tobytes())
        return acc

    k = len(TYPES)

    def _finalize(acc):
        rec = np.frombuffer(b"".join(acc), dtype=DT)
        order = np.argsort(rec, order=("ts", "eid"))
        codes = rec["code"][order]
        counts = np.zeros((k, k), dtype=np.int64)
        if len(codes) > 1:
            np.add.at(counts, (codes[:-1], codes[1:]), 1)
        return counts.tobytes()

    agg = AggregateFn(
        init=lambda key: [],
        accumulate_block=_pack,
        merge=lambda a, b: a + b,
        finalize=_finalize,
        name="cm",
    )
    per_user = slimmed.groupby("user_id").aggregate(agg)

    def explode(batch: pa.Table) -> pa.Table:
        prevs, nexts, ns = [], [], []
        for blob in batch["cm"].to_pylist():
            m = np.frombuffer(
                blob if isinstance(blob, bytes) else bytes(blob), dtype=np.int64
            ).reshape(k, k)
            nz = np.nonzero(m)
            for i, j in zip(*nz):
                prevs.append(TYPES[i])
                nexts.append(TYPES[j])
                ns.append(int(m[i, j]))
        return pa.table(
            {
                "prev_type": pa.array(prevs, pa.string()),
                "next_type": pa.array(nexts, pa.string()),
                "n_part": pa.array(ns, pa.int64()),
            }
        )

    return (
        per_user.map_batches(explode, batch_format="pyarrow")
        .groupby(["prev_type", "next_type"])
        .aggregate(Sum("n_part", alias_name="n"))
    )


def q_host_rank_weighted(sf_dir: str):
    """Weighted host PageRank: edge weight = number of distinct pages
    of the source host linking to the target host, so a host's rank
    splits proportionally to real link mass instead of one vote per
    distinct host pair.  Same integer BSP kernel (weighted floor
    split), bit-identical at any parallelism.

    Scale shape: each page's links collapse to distinct
    (page, src_host, dst_host) triples inside its block (a page is
    one input row, so block-local distinct is global), then one
    groupby sums page counts per host edge — host-pair bounded."""
    from ray.data.aggregate import Count, Sum

    from .functions.graph import _host_of, pagerank

    links = q_extract_links(sf_dir)

    def triples(batch: pa.Table) -> pa.Table:
        seen = set()
        for su, href in zip(
            batch["src_url"].to_pylist(), batch["href"].to_pylist()
        ):
            seen.add((su, _host_of(su), _host_of(href)))
        from collections import Counter

        c = Counter((s, d) for _, s, d in seen)
        return pa.table(
            {
                "src": pa.array([s for s, _ in c], pa.string()),
                "dst": pa.array([d for _, d in c], pa.string()),
                "w_part": pa.array(list(c.values()), pa.int64()),
            }
        )

    ew_all = (
        links.map_batches(triples, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Sum("w_part", alias_name="weight"))
        .materialize()
    )

    def both_hosts(batch: pa.Table) -> pa.Table:
        hosts = batch["src"].to_pylist() + batch["dst"].to_pylist()
        return pa.table({"host": pa.array(hosts, pa.string())})

    nodes = (
        ew_all.map_batches(both_hosts, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Count(alias_name="dup"))
        .select_columns(["host"])
    )
    edges = ew_all.filter(expr="src != dst")
    return pagerank(
        edges,
        nodes,
        node_column="host",
        weight_column="weight",
        num_partitions=2,
    )


def q_kmv_distinct(sf_dir: str):
    """KMV distinct-count of extracted link targets — the
    order-statistics sketch next to the HLL register sketch, same
    seedless hash, integer-exact estimator."""
    from .functions.sketches import kmv_distinct

    return kmv_distinct(
        q_extract_links(sf_dir).select_columns(["href"]), column="href", k=256
    )


def q_degree_hist(sf_dir: str):
    """In-degree distribution of the host link graph (how many hosts
    have k distinct in-linking hosts — the power-law diagnostic):
    zero-in-degree hosts included via a left join from the node set.
    Both groupbys are bounded by host count and degree domain."""
    import pyarrow.compute as _pc
    from ray.data.aggregate import Count

    from .functions.dedup import _coalesce_for_join, _join_partitions, hash_join_safe

    edges, nodes = _host_edges_nodes(sf_dir)
    indeg = edges.groupby("dst").aggregate(Count(alias_name="indegree"))
    indeg, _ = _coalesce_for_join(indeg)
    nodes, _ = _coalesce_for_join(nodes)

    joined = hash_join_safe(
        nodes,
        indeg,
        on=("host",),
        right_on=("dst",),
        join_type="left_outer",
        num_partitions=_join_partitions(2),
    )

    def fill(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "indegree": _pc.coalesce(
                    batch["indegree"], pa.scalar(0, pa.int64())
                )
            }
        )

    return (
        joined.map_batches(fill, batch_format="pyarrow")
        .groupby("indegree")
        .aggregate(Count(alias_name="n_hosts"))
    )


def q_corpus_report(sf_dir: str):
    """Corpus report card: per (lang, quality-gate outcome) — document
    count, token sum, and total characters.  The rollup every curation
    run publishes next to its output so mixture decisions are made on
    numbers, not vibes.  One pass: the Gopher gate evaluates inside
    the scan batch, partials collapse per (lang, passed) before the
    only (tiny) shuffle."""
    import functools

    from ray.data.aggregate import Sum

    from .functions.curation import gopher_doc_filter_batch

    docs = _documents(sf_dir, ["doc_id", "lang", "text", "n_chars"])
    gate = functools.partial(
        gopher_doc_filter_batch,
        min_words=30,
        max_words=90,
        mean_len_lo_x10=40,
        mean_len_hi_x10=50,
        min_stop=3,
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = gate(batch)
        keyed = pa.table(
            {
                "lang": batch["lang"],
                "passed": g["passed"],
                "one": pa.array([1] * batch.num_rows, pa.int64()),
                "toks": g["n_words"],
                "chars": batch["n_chars"],
            }
        )
        agg = pa.TableGroupBy(keyed, ["lang", "passed"]).aggregate(
            [("one", "sum"), ("toks", "sum"), ("chars", "sum")]
        )
        return agg.rename_columns(
            ["lang", "passed", "n_p", "t_p", "c_p"]
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "passed"])
        .aggregate(
            Sum("n_p", alias_name="n_docs"),
            Sum("t_p", alias_name="n_tokens"),
            Sum("c_p", alias_name="n_chars"),
        )
    )


def q_bm25_search(sf_dir: str):
    """Corpus-level BM25 retrieval (Robertson-Spärck Jones) for the
    same two-term query as term_search, OR semantics, top-20 by
    (score desc, doc_id).  With k1=6/5 and b=3/4 the per-term weight
    is EXACTLY rational —

        tf·(k1+1)/(tf + k1(1-b+b·dl/avgdl))
            = 44·tf·avgdl / (20·avgdl·tf + 6·avgdl + 18·dl)

    — so the score is idf_fp · that fraction in pure int64 floor
    division, bit-identical to the SQL oracle.  idf is the LUCENE
    variant ln(1 + (N-df+½)/(df+½)) = ln((2N+2)/(2df+1)) — always
    positive, which matters: Python ``//`` floors while DuckDB ``//``
    truncates, so a negative contribution would drift by one ulp
    (verified); fixed-point via the tfidf_topk floor(ln·10⁶)
    convention.

    Scale shape: one pass for the two corpus scalars (N, Σtokens →
    avgdl, floor), one in-scan term-filtered pass emitting
    (doc, term, tf, dl) rows for matching docs only; df and idf are a
    2-row driver table broadcast into the scoring pass; the final
    groupby-sum and sort touch only matching docs."""
    import math

    import ray
    from ray.data.aggregate import Count, Sum

    TERMS = ("spark", "vector")
    docs = _documents(sf_dir, ["doc_id", "text"])

    def stats_partial(batch: pa.Table) -> pa.Table:
        tot = sum(len((t or "").split(" ")) for t in batch["text"].to_pylist())
        return pa.table(
            {
                "n_p": pa.array([batch.num_rows], pa.int64()),
                "t_p": pa.array([tot], pa.int64()),
            }
        )

    stats = docs.map_batches(stats_partial, batch_format="pyarrow").aggregate(
        Sum("n_p"), Sum("t_p")
    )
    n_docs, total_toks = stats["sum(n_p)"], stats["sum(t_p)"]
    avgdl = total_toks // n_docs

    def tf_rows(batch: pa.Table) -> pa.Table:
        ids, terms, tfs, dls = [], [], [], []
        for i, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            words = (t or "").split(" ")
            for term in TERMS:
                n = sum(1 for w in words if w == term)
                if n:
                    ids.append(i)
                    terms.append(term)
                    tfs.append(n)
                    dls.append(len(words))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "term": pa.array(terms, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
                "dl": pa.array(dls, pa.int64()),
            }
        )

    rows = docs.map_batches(tf_rows, batch_format="pyarrow").materialize()

    dfs = {
        r["term"]: r["df"]
        for r in rows.groupby("term").aggregate(Count(alias_name="df")).take_all()
    }
    idf_fp = {
        t: math.floor(
            math.log((2 * n_docs + 2) / (2 * df + 1)) * 1_000_000
        )
        for t, df in dfs.items()
    }
    consts = ray.put((idf_fp, avgdl))

    def score(batch: pa.Table) -> pa.Table:
        idf, a = ray.get(consts)
        out = [
            (idf[t] * (44 * tf * a)) // (20 * a * tf + 6 * a + 18 * dl)
            for t, tf, dl in zip(
                batch["term"].to_pylist(),
                batch["tf"].to_pylist(),
                batch["dl"].to_pylist(),
            )
        ]
        return pa.table(
            {"doc_id": batch["doc_id"], "s": pa.array(out, pa.int64())}
        )

    scored = (
        rows.map_batches(score, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("s", alias_name="score_fp"))
    )
    return scored.sort(["score_fp", "doc_id"], descending=[True, False]).limit(20)


def q_kl_divergence(sf_dir: str):
    """Unigram-distribution KL divergence D(src0 ‖ src1) — the
    domain-shift diagnostic behind mixture reweighting (DoReMi-style):
    how surprising source src0's text is under source src1's unigram
    model (add-1 smoothed over the union vocabulary).

    Contract (mirrored by the oracle, integer-exact): with counts
    c_a(t), c_b(t), totals T_a, T_b and union-vocab size V,

        kl_ppm = (Σ_t c_a(t) · floor(ln(c_a(t)·(T_b+V)
                                       / (T_a·(c_b(t)+1))) · 10⁶)) // T_a

    — the per-token log-ratio is fixed-pointed BEFORE the weighted
    sum, so the result is order-free and bit-identical (same ln
    convention as tfidf_topk; every factor integer).

    Scale shape: per-source token counts are combiner-first groupbys
    (vocab-bounded); totals and V are single-row aggregates; the
    count join is token-keyed.  Nothing corpus-sized moves."""
    import math

    from ray.data.aggregate import Count, Sum

    from .functions.dedup import _coalesce_for_join, _join_partitions, hash_join_safe

    SRC_A, SRC_B = "src0", "src1"
    docs = _documents(sf_dir, ["doc_id", "source", "text"])

    def counts_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        per_src: dict = {SRC_A: Counter(), SRC_B: Counter()}
        for s, t in zip(batch["source"].to_pylist(), batch["text"].to_pylist()):
            if s in per_src and t:
                per_src[s].update(t.split(" "))
        srcs, toks, ns = [], [], []
        for s, c in per_src.items():
            for tok, n in c.items():
                srcs.append(s)
                toks.append(tok)
                ns.append(n)
        return pa.table(
            {
                "source": pa.array(srcs, pa.string()),
                "token": pa.array(toks, pa.string()),
                "n_part": pa.array(ns, pa.int64()),
            }
        )

    counts = (
        docs.map_batches(counts_partial, batch_format="pyarrow")
        .groupby(["source", "token"])
        .aggregate(Sum("n_part", alias_name="n"))
        .materialize()
    )

    totals = {
        r["source"]: r["t"]
        for r in counts.groupby("source").aggregate(Sum("n", alias_name="t")).take_all()
    }
    t_a, t_b = totals[SRC_A], totals[SRC_B]
    v = (
        counts.select_columns(["token"])
        .groupby("token")
        .aggregate(Count(alias_name="dup"))
        .count()
    )

    a_side = counts.filter(expr=f"source == '{SRC_A}'").select_columns(["token", "n"])
    b_side = counts.filter(expr=f"source == '{SRC_B}'").select_columns(["token", "n"])
    a_side, _ = _coalesce_for_join(a_side)
    b_side, _ = _coalesce_for_join(b_side)

    joined = hash_join_safe(
        a_side.rename_columns({"n": "ca"}),
        b_side.rename_columns({"n": "cb"}),
        on=("token",),
        right_on=("token",),
        join_type="left_outer",
        num_partitions=_join_partitions(4),
    )

    def contrib(batch: pa.Table) -> pa.Table:
        out = []
        for ca, cb in zip(batch["ca"].to_pylist(), batch["cb"].to_pylist()):
            cb = cb or 0
            out.append(
                ca
                * math.floor(
                    math.log(ca * (t_b + v) / (t_a * (cb + 1))) * 1_000_000
                )
            )
        return pa.table({"s": pa.array(out, pa.int64())})

    total = joined.map_batches(contrib, batch_format="pyarrow").aggregate(Sum("s"))[
        "sum(s)"
    ]
    return pa.table(
        {
            "src_a": pa.array([SRC_A], pa.string()),
            "src_b": pa.array([SRC_B], pa.string()),
            "t_a": pa.array([t_a], pa.int64()),
            "t_b": pa.array([t_b], pa.int64()),
            "vocab": pa.array([v], pa.int64()),
            "kl_ppm": pa.array([total // t_a], pa.int64()),
        }
    )


def q_vocab_growth(sf_dir: str):
    """Vocabulary growth curve (the Heaps-law diagnostic): distinct
    token count after ingesting each decile of the corpus in doc_id
    order.  A seemingly sequential statistic computed in ONE groupby:
    a token enters the vocabulary at its MINIMUM doc_id, so bucketing
    those first occurrences by decile and cumulative-summing the
    (10-row) histogram replays the whole curve.

    Output: (decile 1..10, cutoff_doc_id, vocab_size)."""
    from ray.data.aggregate import Min, Sum

    docs = _documents(sf_dir, ["doc_id", "text"])

    # decile cutoffs from the doc-id range: cutoff_d = the largest
    # doc_id with (rank ≤ d·N//10) — doc_ids are dense 0..N-1 in the
    # synthetic corpus, so cutoff = d·N//10 - 1 (documented; the
    # oracle uses the same rule)
    n_docs = docs.count()

    def first_seen(batch: pa.Table) -> pa.Table:
        firsts: dict = {}
        for i, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for w in set((t or "").split(" ")):
                if w not in firsts or i < firsts[w]:
                    firsts[w] = i
        return pa.table(
            {
                "token": pa.array(list(firsts.keys()), pa.string()),
                "first_part": pa.array(list(firsts.values()), pa.int64()),
            }
        )

    firsts = (
        docs.map_batches(first_seen, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Min("first_part", alias_name="first_doc"))
    )

    def decile_of(batch: pa.Table) -> pa.Table:
        import numpy as np

        fd = batch["first_doc"].to_numpy(zero_copy_only=False)
        # smallest d (1..10) with first_doc <= d*N//10 - 1
        dec = np.searchsorted(
            np.array([d * n_docs // 10 - 1 for d in range(1, 11)]), fd
        ) + 1
        return pa.table(
            {
                "decile": pa.array(dec, pa.int64()),
                "one": pa.array([1] * len(fd), pa.int64()),
            }
        )

    hist = {
        r["decile"]: r["n"]
        for r in firsts.map_batches(decile_of, batch_format="pyarrow")
        .groupby("decile")
        .aggregate(Sum("one", alias_name="n"))
        .take_all()  # ≤ 10 rows
    }
    acc, rows = 0, []
    for d in range(1, 11):
        acc += hist.get(d, 0)
        rows.append((d, d * n_docs // 10 - 1, acc))
    return pa.table(
        {
            "decile": pa.array([r[0] for r in rows], pa.int64()),
            "cutoff_doc_id": pa.array([r[1] for r in rows], pa.int64()),
            "vocab_size": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def q_sitemap_coverage(sf_dir: str):
    """Sitemap coverage audit: per host, how many crawled pages the
    host's sitemaps actually list — the crawl-completeness /
    discoverability gap that decides whether a host needs link
    discovery or its sitemap suffices.  Integer per-mille coverage.

    Scale shape: both sides reduce to distinct (host, url) rows
    before ONE url-keyed left join (sitemap side marked, no set is
    collected or broadcast); the rollup is host-bounded."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .functions.dedup import _coalesce_for_join, _join_partitions, hash_join_safe
    from .functions.graph import _host_of
    from .sources.pages import pages_parquet_path
    from .sources.seeder import seed_urls, sitemaps_parquet_path

    pages = rd.read_parquet(pages_parquet_path(sf_dir), columns=["url"])

    def with_host(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": pa.array(
                    [_host_of(u) for u in batch["url"].to_pylist()], pa.string()
                ),
                "url": batch["url"],
            }
        )

    crawled = pages.map_batches(with_host, batch_format="pyarrow")
    crawled, _ = _coalesce_for_join(crawled)

    from ray.data.aggregate import Count

    smaps = rd.read_parquet(sitemaps_parquet_path(sf_dir))
    listed = (
        seed_urls(smaps, pattern=None)
        .select_columns(["url"])
        .groupby("url")
        .aggregate(Count(alias_name="dup"))  # distinct — a loc repeated
        # across sitemaps must not multiply the join
        .select_columns(["url"])
    )

    def mark(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "surl": batch["url"],
                "listed": pa.array([1] * batch.num_rows, pa.int64()),
            }
        )

    listed = listed.map_batches(mark, batch_format="pyarrow")
    listed, _ = _coalesce_for_join(listed)

    joined = hash_join_safe(
        crawled,
        listed,
        on=("url",),
        right_on=("surl",),
        join_type="left_outer",
        num_partitions=_join_partitions(8),
    )

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        keyed = pa.table(
            {
                "host": batch["host"],
                "one": pa.array([1] * batch.num_rows, pa.int64()),
                "inmap": _pc.coalesce(batch["listed"], pa.scalar(0, pa.int64())),
            }
        )
        agg = pa.TableGroupBy(keyed, ["host"]).aggregate(
            [("one", "sum"), ("inmap", "sum")]
        )
        return agg.rename_columns(["host", "n_p", "l_p"])

    rolled = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Sum("n_p", alias_name="n_pages"),
            Sum("l_p", alias_name="n_listed"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        pm = _pc.divide(
            _pc.multiply(batch["n_listed"], pa.scalar(1000, pa.int64())),
            batch["n_pages"],
        )
        return batch.append_column(
            "coverage_permille", _pc.cast(pm, pa.int64())
        )

    return rolled.map_batches(finish, batch_format="pyarrow")


def q_lang_confusion(sf_dir: str):
    """Language-ID validation: confusion matrix of the table's
    declared ``lang`` against the heuristic detector — the QA rollup
    that tells you when to trust the metadata vs the model.  The
    actor-pool detector feeds straight into a bounded langs² groupby
    (one shuffle of (declared, predicted) partial counts)."""
    from ray.data.aggregate import Sum

    from .functions.textstats import language_id

    docs = _documents(sf_dir, ["doc_id", "lang", "text"])
    pred = language_id(docs)  # passes the declared `lang` column through

    def partial(batch: pa.Table) -> pa.Table:
        keyed = pa.table(
            {
                "declared_lang": batch["lang"],
                "pred_lang": batch["pred_lang"],
                "one": pa.array([1] * batch.num_rows, pa.int64()),
            }
        )
        agg = pa.TableGroupBy(keyed, ["declared_lang", "pred_lang"]).aggregate(
            [("one", "sum")]
        )
        return agg.rename_columns(["declared_lang", "pred_lang", "n_p"])

    return (
        pred.map_batches(partial, batch_format="pyarrow")
        .groupby(["declared_lang", "pred_lang"])
        .aggregate(Sum("n_p", alias_name="n_docs"))
    )


def q_frame_sample(sf_dir: str):
    """Multimodal frame-sampling plumbing: pages' html bytes as opaque
    video payloads → actor-pool sampler → one row per sampled frame
    (url, frame_idx, byte_offset, frame_digest)."""
    from .functions.multimodal import sample_frames

    pages = read_pages(sf_dir).select_columns(["url", "html"])
    return sample_frames(pages, binary_column="html")


def q_quantize_embeddings(sf_dir: str):
    """Scalar int8 quantization of the embedding column — the ANN
    storage-compression pass (4× over fp32, 8× over fp64): per-vector
    symmetric scale = max|v|, q_i = floor(v_i·127 / scale) over
    fixed-point integer components.  Emitted as per-vector integrity
    scalars (scale, position-weighted checksum, L1 mass) so the whole
    quantized tensor is oracle-checkable without a list column.

    Determinism note: q uses FLOOR division on signed values — numpy
    ``//`` floors, and the oracle reproduces it as
    floor(x::DOUBLE / s) which is exact here because |x| < 2^53 and
    the nearest-miss gap 1/s dwarfs the double ulp.  Stateless
    per-block pass; no shuffle at all."""
    import numpy as np
    import ray.data as rd

    from .functions.clustering import _int_vectors

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def quantize(batch: pa.Table) -> pa.Table:
        mat = _int_vectors(batch, "embedding", 1_000_000)
        ids = batch["vec_id"].to_pylist()
        sc = np.abs(mat).max(axis=1)
        out_s, out_c, out_l = [], [], []
        d = mat.shape[1]
        w = np.arange(1, d + 1, dtype=np.int64)
        for r in range(mat.shape[0]):
            if sc[r] == 0:
                out_s.append(0)
                out_c.append(0)
                out_l.append(0)
                continue
            q = (mat[r] * 127) // sc[r]
            out_s.append(int(sc[r]))
            out_c.append(int((q * w).sum()))
            out_l.append(int(np.abs(q).sum()))
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "scale_int": pa.array(out_s, pa.int64()),
                "q_checksum": pa.array(out_c, pa.int64()),
                "q_l1": pa.array(out_l, pa.int64()),
            }
        )

    return emb.map_batches(quantize, batch_format="pyarrow")


def q_text_entropy(sf_dir: str):
    """Per-document character-distribution Shannon entropy — the
    gibberish/encoding-noise detector (natural language sits in a
    narrow entropy band; base64 blobs and mojibake fall outside).

    Integer contract (oracle-mirrored): with character counts c_i and
    length N, entropy_upm = (Σ c_i · floor(ln(N/c_i)·10⁶)) // N —
    the per-character log fixed-pointed BEFORE the weighted sum (the
    KL/tfidf convention), so the result is order-free.  ``flagged``
    ⇔ entropy outside the [1.5, 4.5] nat band.  Stateless per-block
    pass, no shuffle."""
    import math

    docs = _documents(sf_dir, ["doc_id", "text"])

    def entropy(batch: pa.Table) -> pa.Table:
        from collections import Counter

        ids = batch["doc_id"]
        ents = []
        for t in batch["text"].to_pylist():
            t = t or ""
            n = len(t)
            if n == 0:
                ents.append(0)
                continue
            c = Counter(t)
            total = sum(
                v * math.floor(math.log(n / v) * 1_000_000)
                for v in c.values()
            )
            ents.append(total // n)
        earr = pa.array(ents, pa.int64())
        import pyarrow.compute as _pc

        flagged = _pc.or_(
            _pc.less(earr, pa.scalar(1_500_000, pa.int64())),
            _pc.greater(earr, pa.scalar(4_500_000, pa.int64())),
        )
        return pa.table(
            {"doc_id": ids, "entropy_upm": earr, "flagged": flagged}
        )

    return docs.map_batches(entropy, batch_format="pyarrow")


def q_url_depth_hist(sf_dir: str):
    """URL path-depth distribution of the crawled corpus (how deep
    the crawl went — the frontier-budget sanity check): non-empty
    path segments per URL, histogram over the bounded depth domain.
    Per-block distinct-depth combiner; the shuffle is ≤ max-depth
    rows per block."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .sources.pages import pages_parquet_path

    pages = rd.read_parquet(pages_parquet_path(sf_dir), columns=["url"])

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c = Counter()
        for u in batch["url"].to_pylist():
            path = u.split("://", 1)[-1].split("/", 1)
            segs = path[1].split("/") if len(path) > 1 else []
            c[sum(1 for s in segs if s)] += 1
        return pa.table(
            {
                "depth": pa.array(list(c.keys()), pa.int64()),
                "n_part": pa.array(list(c.values()), pa.int64()),
            }
        )

    return (
        pages.map_batches(partial, batch_format="pyarrow")
        .groupby("depth")
        .aggregate(Sum("n_part", alias_name="n_urls"))
    )


def q_session_stats(sf_dir: str):
    """Session-length distribution: the sessionize operator's output
    rolled up into a histogram of events-per-session — the engagement
    shape report.  Composition over the packed-aggregate sessionizer;
    the rollup groupby is bounded by the max session length."""
    from ray.data.aggregate import Count

    return (
        q_sessionize(sf_dir)
        .groupby("n_events")
        .aggregate(Count(alias_name="n_sessions"))
    )


def q_minhash_calibration(sf_dir: str):
    """MinHash estimator calibration: for every true near-duplicate
    pair (exact Jaccard ≥ 0.5), the md5-permutation MinHash estimate
    next to the exact value — the report that justifies a chosen
    band/permutation budget before a 100 TB dedup run.

    Estimator (oracle-mirrored): 16 seedless permutations, perm p's
    signature = min over the doc's distinct 3-gram shingles s of
    md5_u64(f"{p}|{s}"); est_ppm = matching-minima·10⁶ // 16.

    Scale shape: signatures are per-block partial minima → one
    (id, perm)-keyed groupby-min (16 rows per doc); the pair set is
    the exact-join output (bounded by true duplicates), and the
    signature attach is two id-keyed hash joins."""
    from ray.data.aggregate import Min, Sum

    from .functions.curation import _md5_u64
    from .functions.dedup import (
        _coalesce_for_join,
        _join_partitions,
        _token_rows_fn,
        hash_join_safe,
        jaccard_pairs,
    )

    N_PERM = 16
    docs = _documents(sf_dir, ["doc_id", "text"])

    truth = jaccard_pairs(docs, threshold=0.5, shingle_n=3)
    truth, _ = _coalesce_for_join(truth)

    rows = docs.map_batches(
        _token_rows_fn("doc_id", "text", 3), batch_format="pyarrow"
    )

    def sig_partial(batch: pa.Table) -> pa.Table:
        mins: dict = {}
        for i, s in zip(batch["id"].to_pylist(), batch["token"].to_pylist()):
            for p in range(N_PERM):
                h = _md5_u64(f"{p}|{s}")
                k = (i, p)
                if k not in mins or h < mins[k]:
                    mins[k] = h
        ks = list(mins.keys())
        return pa.table(
            {
                "id": pa.array([k[0] for k in ks], pa.int64()),
                "perm": pa.array([k[1] for k in ks], pa.int64()),
                # signed shift so int64 min == unsigned min
                "m": pa.array(
                    [mins[k] - (1 << 63) for k in ks], pa.int64()
                ),
            }
        )

    sigs = (
        rows.map_batches(sig_partial, batch_format="pyarrow")
        .groupby(["id", "perm"])
        .aggregate(Min("m", alias_name="m"))
    )
    sigs, _ = _coalesce_for_join(sigs)

    ja = hash_join_safe(
        truth, sigs, on=("a",), right_on=("id",), join_type="inner",
        num_partitions=_join_partitions(4),
    ).rename_columns({"m": "ma", "perm": "perm"})
    jb = hash_join_safe(
        ja, sigs, on=("b", "perm"), right_on=("id", "perm"),
        join_type="inner", num_partitions=_join_partitions(4),
    ).rename_columns({"m": "mb"})

    def match_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        eq = _pc.cast(_pc.equal(batch["ma"], batch["mb"]), pa.int64())
        keyed = pa.table(
            {
                "a": batch["a"],
                "b": batch["b"],
                "jaccard": batch["jaccard"],
                "eq": eq,
            }
        )
        agg = pa.TableGroupBy(keyed, ["a", "b", "jaccard"]).aggregate(
            [("eq", "sum")]
        )
        return agg.rename_columns(["a", "b", "jaccard", "eq_p"])

    per_pair = (
        jb.map_batches(match_partial, batch_format="pyarrow")
        .groupby(["a", "b", "jaccard"])
        .aggregate(Sum("eq_p", alias_name="n_match"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        est = _pc.divide(
            _pc.multiply(batch["n_match"], pa.scalar(1_000_000, pa.int64())),
            pa.scalar(N_PERM, pa.int64()),
        )
        return pa.table(
            {
                "a": batch["a"],
                "b": batch["b"],
                "jaccard": batch["jaccard"],
                "est_ppm": _pc.cast(est, pa.int64()),
            }
        )

    return per_pair.map_batches(finish, batch_format="pyarrow")


def q_ua_assign(sf_dir: str):
    """Deterministic per-URL user-agent rotation + Sec-CH-UA client
    hints (reference UA machinery as shard-stable data assignment)."""
    import ray.data as rd

    from .frontier.user_agents import ua_assign
    from .sources.pages import pages_parquet_path

    pages = rd.read_parquet(pages_parquet_path(sf_dir), columns=["url"])
    return ua_assign(pages)


def q_dedup_summary(sf_dir: str):
    """End-of-run dedup impact report: corpus size, distinct exact
    texts, distinct CCNet-normalized texts, and the per-mille
    reduction each level buys — the one-row summary a 100 TB dedup
    run publishes before anyone commits to the expensive near-dup
    pass.  Distinct counts are hash-groupby row counts (shuffles
    carry 16-byte hashes only); everything reduces to driver scalars.
    """
    import hashlib

    from ray.data.aggregate import Count

    docs = _documents(sf_dir, ["doc_id", "text"])

    from .functions.curation import ccnet_normalize_text

    def hashes(batch: pa.Table) -> pa.Table:
        hs, nhs = [], []
        for t in batch["text"].to_pylist():
            t = t or ""
            hs.append(hashlib.md5(t.encode()).hexdigest())
            nhs.append(
                hashlib.md5(ccnet_normalize_text(t).encode()).hexdigest()
            )
        return pa.table(
            {
                "h": pa.array(hs, pa.string()),
                "nh": pa.array(nhs, pa.string()),
            }
        )

    hashed = docs.map_batches(hashes, batch_format="pyarrow").materialize()
    n_docs = hashed.count()
    n_exact = hashed.groupby("h").aggregate(Count(alias_name="c")).count()
    n_norm = hashed.groupby("nh").aggregate(Count(alias_name="c")).count()

    return pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_distinct_exact": pa.array([n_exact], pa.int64()),
            "n_distinct_norm": pa.array([n_norm], pa.int64()),
            "exact_dup_permille": pa.array(
                [1000 * (n_docs - n_exact) // n_docs], pa.int64()
            ),
            "norm_extra_permille": pa.array(
                [1000 * (n_exact - n_norm) // n_docs], pa.int64()
            ),
        }
    )


def q_cert_audit(sf_dir: str):
    """Per-document TLS-certificate audit over a synthesized DER
    column.  Each doc_id derives a deterministic certificate (CN,
    md5-derived serial, validity window, SAN list, CA flag) which is
    built as real X.509 v3 DER by the stdlib writer inside the
    pipeline, parsed back by the DER reader
    (:mod:`functions.ssl_certs`), and the decoded fields emitted — the
    reference's peer-cert decode (``ssl_certificate.py:62-134``,
    pyOpenSSL) re-expressed as a stateless batch decode over a binary
    column.  The oracle recomputes every field from the same md5
    derivation in SQL, so any writer/parser defect mismatches."""
    import ray.data as rd

    from .functions.ssl_certs import build_cert_der, cert_features

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def synthesize(batch: pa.Table) -> pa.Table:
        import hashlib
        from datetime import date, timedelta

        ids = batch["doc_id"].to_pylist()
        urls, ders = [], []
        for i in ids:
            cn = f"doc-{i}.example.com"
            serial = int(hashlib.md5(cn.encode()).hexdigest()[:12], 16)
            nb = date(2015, 1, 1) + timedelta(days=serial % 3653)
            na = nb + timedelta(days=90 + serial % 640)
            sans = [cn, "www." + cn, "alt." + cn][: 1 + (i % 3)]
            urls.append(f"doc://{i}")
            ders.append(
                build_cert_der(
                    subject={"CN": cn, "O": "Graft Corp"},
                    issuer={"CN": "Synthetic Root CA", "O": "Graft Trust"},
                    serial=serial,
                    not_before=nb.strftime("%y%m%d") + "000000Z",
                    not_after=na.strftime("%y%m%d") + "000000Z",
                    san_dns=sans,
                    is_ca=(i % 17 == 0),
                )
            )
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "cert_der": pa.array(ders, pa.large_binary()),
            }
        )

    feats = cert_features(docs.map_batches(synthesize, batch_format="pyarrow"))
    return feats.drop_columns(["success", "fingerprint"])
