"""Round-synchronous (BSP) BFS crawl over Parquet frontier tables.

Re-expresses the reference's level-synchronous BFS
(``deep_crawling/bfs_strategy.py:148-198`` — per level: fetch all,
discover links, normalize → visited-set dedup → filter chain → score →
capacity sort/truncate → next level) as one Ray Data pipeline pass per
round (SURVEY.md §2.7):

round k:
  frontier_k (Parquet)
    → per-host politeness budget (groupby(host) rank + split;
      deferred URLs carry over — the priority queue realized as
      groupby/sort shuffles)
    → global capacity: sort(score desc, url).limit(remaining budget)
      (reference bfs_strategy.py:131-136)
    → "fetch" = inner hash join frontier⋈pages on url (the sandbox
      replacement for AsyncHTTPCrawlerStrategy; a live-fetch variant
      would be an actor-pool map_batches holding HTTP sessions)
    → link discovery map_batches (normalize, first-wins per page)
    → candidate filter: FilterChain + robots gate (broadcast) + score
    → within-round dedup: groupby(url) min(parent) — deterministic
      first-wins under unordered shuffles
    → cross-round dedup: sharded URL-seen actors (check_and_add)
    → frontier_{k+1} = new ∪ deferred, checkpointed with metrics.

Driver memory holds only per-round counters; frontier/visited/seen
state lives in the checkpoint directory (Parquet + shard blobs), so a
killed run resumes from the last committed round.
"""

from __future__ import annotations

import os
import tempfile
import time
from dataclasses import dataclass, field

import pyarrow as pa
import ray
import ray.data as rd

from ..html.fastparse import parse_fast as parse
from ..urls import (
    get_base_domain,
    is_external_url,
    normalize_url,
    normalize_url_for_deep_crawl,
    url_digest,
    url_host,
)
from ..state import checkpoint as ckpt
from .filters import FilterChain
from ray.data.aggregate import Min

from .politeness import enforce_politeness
from .robots import DEFAULT_SYNTHETIC_RULES, RobotsGate
from .seen import UrlSeen

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("parent", pa.string()),
        ("score", pa.float64()),
        # discovery-sequence key: 8 hex chars per hop, appended per
        # round (seed index, then each hop's link index within its
        # parent page).  Lexicographic order over equal-depth rows IS
        # the reference crawler's level ordering (current_level append
        # order, bfs_strategy.py:148-198) — what makes crawl ORDERING,
        # first-wins dedup ownership, and budget-cap selection match
        # the reference's own code (tests/test_ref_crawl_parity.py).
        ("seq", pa.string()),
    ]
)


@dataclass
class CrawlConfig:
    # "bfs": level-synchronous (reference BFSDeepCrawlStrategy).
    # "best_first": per round, fetch the global top-`batch_size` of the
    #   frontier by (score desc, depth asc, url) — the reference's
    #   asyncio.PriorityQueue (bff_strategy.py:142-173) realized as a
    #   sort+limit shuffle over the frontier table; the rest carries
    #   over with its priority intact.
    # "dfs": batch-1 true-LIFO mode (seq = DFS pre-order) mirroring
    #   DFSDeepCrawlStrategy — sequential by nature, not the scale path.
    strategy: str = "bfs"
    best_first_batch_size: int = 10
    max_depth: int = 2
    max_pages: int | None = None
    per_host_cap: int | None = None
    check_robots: bool = False
    robots_rules: str = DEFAULT_SYNTHETIC_RULES
    filter_chain: FilterChain | None = None
    scorer: object | None = None  # URLScorer
    score_threshold: float | None = None
    include_external: bool = False
    seen_mode: str = "exact"
    n_seen_shards: int = 4
    seen_capacity_per_shard: int = 1_000_000
    join_partitions: int = 8
    # "broadcast": ray.put the round's url→depth map, filter the pages
    # scan in map_batches (no shuffle — a politeness-bounded round is
    # always the small side). "join": Dataset.join hash shuffle, for
    # rounds too large to broadcast.
    fetch_strategy: str = "broadcast"
    # fetch-join semi-filter: a hash join shuffles BOTH sides, and the
    # pages side carries the html payloads — almost all of the bytes.
    # Rounds up to this many urls broadcast their digest set (8 B per
    # url, driver memory bounded by this knob, never by corpus size)
    # and the pages scan is filtered BEFORE the join shuffle, so
    # non-candidate html never moves.  Digest collisions only admit
    # extra rows into the exact url join; none are lost.  Bigger
    # rounds fall back to the unfiltered hash join.  0 disables.
    fetch_filter_max: int = 20_000_000
    # fetch-attach fast path: a round at or under this many SELECTED
    # rows skips the hash join entirely.  The selection's metadata —
    # (128-bit url digest, depth, seq); 20 B + seq per row, bounded by
    # this knob, never html, never the corpus — is collected and
    # broadcast once via ray.put, and ONE map pass over the pages scan
    # filters + attaches depth/seq by digest.  The key is two
    # independent siphash64 families (128 bits total) — strictly
    # stronger identity than the 64-bit blake2b the exact seen set
    # already trusts for frontier dedup.  Rounds above the knob run
    # the digest semi-filter + exact url hash join (the unbounded
    # route, value-identical).  0 disables (always hash join).
    fetch_attach_max: int = 2_000_000
    # the attach blob is NOT a flat 20 B/row: each row carries its seq
    # string, which grows 8 hex chars per hop — at the 2M-row default
    # a depth-30 crawl's blob would reach the high hundreds of MB on
    # the driver.  Gate the fast path on the ESTIMATED byte footprint
    # rows × (20 + 8 × (max_depth + 1)) too; rounds over the budget
    # take the digest semi-filter + hash join route (value-identical).
    fetch_attach_bytes_max: int = 256 * 1024 * 1024
    max_rounds: int = 64
    # size-adaptive round coordination: a round whose frontier (resp.
    # discovered-link set) fits these row thresholds is coordinated
    # driver-side on in-memory Arrow tables — the ONLY Ray execution is
    # the fetch+parse — while bigger rounds run the distributed
    # politeness/groupby/seen pipeline.  Driver memory is bounded by
    # threshold × row width, never by corpus size.
    driver_round_threshold: int = 100_000
    driver_links_threshold: int = 1_000_000
    # a selected round larger than this is never read back to the
    # driver: the fetch switches from broadcast pushdown to a hash
    # join and host-state aggregates run distributed
    broadcast_fetch_threshold: int = 100_000
    extra: dict = field(default_factory=dict)


def _url_digests64(urls, hash_key: str | None = None):
    """uint64 digest per url (pandas' siphash — fixed key, independent
    of PYTHONHASHSEED, identical across driver and worker processes;
    vectorized in C).  Feeds the fetch semi-join filter: a collision
    can only let an extra pages-side row through to the exact url
    join, never drop a match.  ``hash_key`` selects an independent
    siphash family (16 chars) — two families together form the 128-bit
    key of the fetch-attach fast path."""
    import numpy as np
    import pandas as pd

    if hasattr(urls, "to_numpy"):
        arr = urls.to_numpy(zero_copy_only=False)
    else:
        arr = np.asarray(urls, dtype=object)
    arr = arr.astype(object, copy=False)
    if hash_key is None:
        return pd.util.hash_array(arr)
    return pd.util.hash_array(arr, hash_key=hash_key)


# second independent siphash family for the 128-bit fetch-attach key
# (any 16-char key distinct from pandas' default "0123456789123456").
#
# Threat model: the attach fast path (and the PageRank rank broadcast
# in functions/graph.py) substitutes 128-bit siphash IDENTITY for
# exact string equality.  Under random inputs a collision needs ~2^64
# urls — statistically negligible at the 10^10-url design point.  The
# keys are fixed and public, so an ADVERSARIAL corpus author who can
# precompute siphash could in principle craft a cross-family colliding
# url pair and get a wrong page fetched with another row's depth/seq.
# This is consistent with (and strictly stronger than) the 64-bit
# blake2b identity the exact seen set already trusts for frontier
# dedup; a deployment crawling hostile input should derive both sip
# keys from a per-run secret seed (pass ``hash_key`` overrides), which
# makes collisions unpredictable at the cost of cross-run digest
# stability.
_ATTACH_HASH_KEY2 = "f7c1a94e2d8b6035"


def _attach_meta_rows(batch: pa.Table) -> pa.Table:
    """(d1, d2, depth, seq) metadata rows for the fetch-attach
    broadcast — digests computed worker-side, so on the distributed
    branch the round's url strings never travel to the driver."""
    return pa.table(
        {
            "d1": pa.array(_url_digests64(batch["url"]), pa.uint64()),
            "d2": pa.array(
                _url_digests64(batch["url"], _ATTACH_HASH_KEY2), pa.uint64()
            ),
            "depth": batch["depth"],
            "seq": batch["seq"],
        }
    )


def _fetch_attach_fn(blob_ref):
    """Map-pass fetch: filter a pages batch to the round's selection
    and attach (depth, seq) by 128-bit digest, replacing the hash-join
    shuffle.  The broadcast blob is (d1 sorted, d2, depth, seq) numpy
    arrays in lexsort order of (d1, d2).  Selection rows are unique by
    url (first-wins frontier dedup / best_first pop dedup), so first
    key match per page row reproduces the inner join exactly."""

    def fn(batch: pa.Table) -> pa.Table:
        import numpy as np

        def _empty() -> pa.Table:
            return (
                batch.slice(0, 0)
                .append_column("depth", pa.array([], pa.int32()))
                .append_column("seq", pa.array([], pa.string()))
            )

        if batch.num_rows == 0:
            return _empty()
        d1s, d2s, deps, seqs = ray.get(blob_ref)
        if len(d1s) == 0:
            return _empty()
        h1 = np.asarray(_url_digests64(batch["url"]), dtype=np.uint64)
        lo = np.searchsorted(d1s, h1, side="left")
        hi = np.searchsorted(d1s, h1, side="right")
        cand = np.nonzero(hi > lo)[0]
        if len(cand) == 0:
            return _empty()
        # second family only for candidate rows (first-family hits)
        h2 = np.asarray(
            _url_digests64(
                batch["url"].take(pa.array(cand, pa.int64())),
                _ATTACH_HASH_KEY2,
            ),
            dtype=np.uint64,
        )
        rows, out_dep, out_seq = [], [], []
        for k, i in enumerate(cand):
            for j in range(lo[i], hi[i]):
                if d2s[j] == h2[k]:
                    rows.append(int(i))
                    out_dep.append(int(deps[j]))
                    out_seq.append(seqs[j])
                    break
        if not rows:
            return _empty()
        sub = batch.take(pa.array(rows, pa.int64()))
        return sub.append_column(
            "depth", pa.array(out_dep, pa.int32())
        ).append_column("seq", pa.array(out_seq, pa.string()))

    return fn


def _repack_blocks(ds, n_rows: int, rows_per_block: int = 32768):
    """Round-boundary block hygiene for the cross-round frontier.

    The dataset round path builds frontier_{k+1} from sorts, splits
    and unions, each of which keeps every shuffle partition — empty
    ones included — and the next round re-reads the written files one
    block apiece.  Left alone the frontier's block count compounds
    with ROUND COUNT while its row count stays flat (observed: 293
    parquet files holding 197 rows by round 8, with per-round wall
    doubling even as data shrank).  Re-pack to ~``rows_per_block``
    rows per block (split/coalesce repartition — no all-to-all
    shuffle) whenever the count drifts far above that invariant, so
    block count tracks data volume, never round count.  The link set
    uses a smaller block target than the frontier: its downstream
    gate (normalize + robots + scoring) is the round's CPU-heavy
    pass and needs the parallelism."""
    m = ds.materialize()
    target = max(1, -(-n_rows // rows_per_block))
    if n_rows > 0 and m.num_blocks() > 4 * target + 8:
        m = m.repartition(target).materialize()
    return m


def _digest_rows(batch: pa.Table) -> pa.Table:
    """One output row per input block: the block's sorted unique url
    digests as raw little-endian uint64 bytes (8 B per url — the
    driver-side concatenation is bounded by ``fetch_filter_max``)."""
    import numpy as np

    d = np.unique(_url_digests64(batch["url"]))
    return pa.table({"digs": pa.array([d.astype("<u8").tobytes()], pa.binary())})


def _page_semi_filter_fn(digs_ref):
    """Digest semi-filter over a pages batch: drop rows whose url
    digest is not in the broadcast sorted digest set.  Collisions only
    ADMIT extra rows into the exact url join downstream, never drop a
    match.  Emits one digest-mismatched anchor row when a block
    filters to zero rows — Ray's hash-shuffle join loses the right
    side's schema when EVERY block is empty (pyarrow "No match for
    FieldRef url"); the anchor's url provably differs from every
    selected url, so the exact inner join drops it."""

    def fn(batch: pa.Table) -> pa.Table:
        import numpy as np

        if batch.num_rows == 0:
            return batch
        dg = ray.get(digs_ref)
        if len(dg) == 0:
            # empty digest set ⇒ empty selection ⇒ nothing can match;
            # keep the anchor row so the join never sees an all-empty
            # right side.
            return batch.slice(0, 1)
        h = _url_digests64(batch["url"])
        pos = np.clip(np.searchsorted(dg, h), 0, len(dg) - 1)
        mask = dg[pos] == h
        if not mask.any():
            return batch.slice(0, 1)
        return batch.filter(pa.array(mask))

    return fn


def _collect_url_digests(url_ds):
    """Sorted unique uint64 url digests of a Dataset's ``url`` column,
    computed worker-side and pulled as 8 B/url blobs (driver memory =
    8 B × distinct urls — the caller gates on row count first)."""
    import numpy as np

    blobs = (
        url_ds.select_columns(["url"])
        .map_batches(_digest_rows, batch_format="pyarrow")
        .take_all()
    )
    if not blobs:
        return np.empty(0, dtype="<u8")
    return np.unique(
        np.concatenate([np.frombuffer(b["digs"], dtype="<u8") for b in blobs])
    )


def fetch_pages_for_urls(
    pages_path: str,
    url_ds,
    *,
    columns: list[str] | None = None,
    fetch_filter_max: int = 20_000_000,
    join_partitions: int = 8,
    assume_unique: bool = False,
):
    """Semi-join fetch: the pages rows whose url appears in ``url_ds``
    — the crawl's digest-gated fetch mechanism exposed for composed
    pipelines (webtext re-fetch of the visited set, resume scans).

    NEVER collects urls on the driver.  Selections at or under
    ``fetch_filter_max`` rows broadcast their url DIGESTS (8 B/url,
    computed worker-side) and the pages scan is filtered BEFORE the
    join shuffle, so non-candidate html never moves; either way the
    exact url hash join runs last, so digest collisions cost only
    extra candidate rows, never wrong output.  The url side is
    DEDUPLICATED first (skinny one-column exchange through the
    key-hash primitive; single-block lexsort below its small gate), so
    duplicate request rows cannot duplicate output pages —
    ``assume_unique=True`` skips that exchange for callers whose
    selection is unique by construction (the crawl's visited set).  Returns a
    Dataset with ``columns`` (default ``[url, html]``); the schema is
    typed even when the result is empty."""
    from ..functions.dedup import (
        _coalesce_for_join,
        _count_by_keys,
        _join_partitions,
    )

    cols = list(columns) if columns is not None else ["url", "html"]
    url_side = url_ds.select_columns(["url"])
    if not assume_unique:
        url_side = _count_by_keys(url_side, ["url"], "_dup").select_columns(
            ["url"]
        )
    url_side, n_urls = _coalesce_for_join(url_side)
    pages = rd.read_parquet(pages_path, columns=cols)
    # typed empty matching the join's output layout (key first, then
    # the remaining columns): an empty selection — or a join in which
    # EVERY url misses — would otherwise yield a schema-less dataset
    s = pages.schema()
    tmap = dict(zip(s.names, s.types))
    typed_empty = rd.from_arrow(
        pa.schema(
            [("url", tmap["url"])] + [(c, tmap[c]) for c in cols if c != "url"]
        ).empty_table()
    )
    if n_urls == 0:
        return typed_empty
    if 0 < n_urls <= fetch_filter_max:
        digs_ref = ray.put(_collect_url_digests(url_side))
        pages = pages.map_batches(
            _page_semi_filter_fn(digs_ref), batch_format="pyarrow"
        )
    joined = url_side.join(
        pages,
        join_type="inner",
        num_partitions=_join_partitions(join_partitions),
        on=("url",),
    )
    # union with the typed empty pins the schema even when the join
    # matches nothing (costs no rows, no exchange)
    return typed_empty.union(joined)


def _extract_links_batch(batch: pa.Table) -> pa.Table:
    """Link discovery: ``//a[@href]`` walk with the extended
    normalizer and first-wins per-page dedup (reference
    ``_process_element``, ``content_scraping_strategy.py:255-307``).
    A dedicated light parser pass — no image scoring / table
    extraction — because the frontier only needs hrefs.

    Every fetched page ALSO emits one sentinel row (href = null): the
    fetch-success signal for host backoff must cover pages with zero
    surviving links (leaf pages, depth-boundary pages), which would
    otherwise read as fetch failures.  Sentinels are filtered out
    before the candidate gate."""
    src_urls, hrefs, externals, link_idxs = [], [], [], []
    for i in range(batch.num_rows):
        url = batch["url"][i].as_py()
        html = batch["html"][i].as_py()
        if isinstance(html, bytes):
            html = html.decode("utf-8", errors="replace")
        base_domain = get_base_domain(url)
        root = parse(html)
        # fetch sentinel — this page WAS fetched
        src_urls.append(url)
        hrefs.append(None)
        externals.append(False)
        link_idxs.append(-1)
        seen_page: set[str] = set()
        for a in root.find_all("a"):
            href = (a.get("href") or "").strip()
            if not href:
                continue
            # the reference pipeline normalizes TWICE: the scrape
            # kernel applies the extended normalize_url
            # (content_scraping_strategy.py:261), then the frontier
            # re-normalizes that href with the deep-crawl variant
            # (bfs_strategy.py:111) — composition differential-tested
            # against the reference's own BFS code in
            # tests/test_ref_crawl_parity.py
            normalized = normalize_url_for_deep_crawl(normalize_url(href, url), url)
            if not normalized or normalized in seen_page:
                continue
            seen_page.add(normalized)
            src_urls.append(url)
            hrefs.append(normalized)
            externals.append(is_external_url(normalized, base_domain))
            link_idxs.append(len(seen_page) - 1)  # per-page discovery order
    return pa.table(
        {
            "src_url": pa.array(src_urls, pa.string()),
            "href": pa.array(hrefs, pa.string()),
            "external": pa.array(externals, pa.bool_()),
            "link_idx": pa.array(link_idxs, pa.int32()),
        }
    )


def _frontier_table(urls, hosts, depths, parents, scores, seqs=None) -> pa.Table:
    if seqs is None:
        seqs = [""] * len(urls)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "host": pa.array(hosts, pa.string()),
            "depth": pa.array(depths, pa.int32()),
            "parent": pa.array(parents, pa.string()),
            "score": pa.array(scores, pa.float64()),
            "seq": pa.array(seqs, pa.string()),
        },
        schema=FRONTIER_SCHEMA,
    )


def _score_many(scorer, urls: list[str]) -> list[float]:
    if scorer is None:
        return [0.0] * len(urls)
    return scorer.score_many(urls)


def pq_write_table(table: pa.Table, path: str) -> None:
    import pyarrow.parquet as _pq

    _pq.write_table(table, path)


def _dataset_to_table(ds, schema: pa.Schema | None = FRONTIER_SCHEMA) -> pa.Table:
    """Fetch an already-small Dataset's blocks to the driver as one
    Arrow table (used only under the driver-round thresholds)."""
    tbls = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return (
            _frontier_table([], [], [], [], [])
            if schema is FRONTIER_SCHEMA
            else pa.table({})
        )
    if schema is not None:
        tbls = [t.select(schema.names).cast(schema) for t in tbls]
    return pa.concat_tables(tbls, promote_options="default")


def _table_from_pandas(df) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False).select(
        FRONTIER_SCHEMA.names
    ).cast(FRONTIER_SCHEMA)


class BFSCrawl:
    """Driver object for the BSP crawl.  ``run()`` returns the visited
    Dataset ``(url, host, depth, parent, score, round)``."""

    def __init__(self, pages_path: str, cfg: CrawlConfig, checkpoint_dir: str | None = None):
        self.pages_path = pages_path
        self.cfg = cfg
        self.checkpoint_dir = checkpoint_dir or tempfile.mkdtemp(prefix="crawl_ckpt_")
        self.seen = UrlSeen(
            n_shards=cfg.n_seen_shards,
            mode=cfg.seen_mode,
            capacity_per_shard=cfg.seen_capacity_per_shard,
        )
        self.pages_visited = 0
        # host politeness state: consecutive-failure counts per host
        # (reference DomainState.fail_count, models.py:16-19); shrinks
        # the host's per-round budget exponentially (RateLimiter
        # backoff semantics as data)
        self.host_fail_counts: dict[str, int] = {}

    # -- helpers ------------------------------------------------------

    def _candidate_gate(self, robots_ref):
        """Build the batch fn applying filter chain + robots + scoring
        to candidate (href, depth, parent) rows."""
        cfg = self.cfg

        def gate(batch: pa.Table) -> pa.Table:
            urls = batch["href"].to_pylist()
            parents = batch["src_url"].to_pylist()
            depths = batch["depth"].to_pylist()
            externals = batch["external"].to_pylist()
            # child sequence key: parent's key + this link's per-page
            # discovery index (the reference's next_level append order)
            seqs = [
                ps + f"{li:08x}"
                for ps, li in zip(
                    batch["parent_seq"].to_pylist(), batch["link_idx"].to_pylist()
                )
            ]

            keep = [True] * len(urls)
            if not cfg.include_external:
                keep = [k and not e for k, e in zip(keep, externals)]
            if cfg.filter_chain is not None:
                mask = cfg.filter_chain.apply_many(urls)
                keep = [k and m for k, m in zip(keep, mask)]
            hosts = [url_host(u) for u in urls]
            if robots_ref is not None:
                gate_obj = ray.get(robots_ref)
                allowed = gate_obj.allowed_many(urls, hosts)
                keep = [k and a for k, a in zip(keep, allowed)]

            urls2 = [u for u, k in zip(urls, keep) if k]
            hosts2 = [h for h, k in zip(hosts, keep) if k]
            parents2 = [p for p, k in zip(parents, keep) if k]
            depths2 = [d for d, k in zip(depths, keep) if k]
            seqs2 = [s for s, k in zip(seqs, keep) if k]
            scores2 = _score_many(cfg.scorer, urls2)
            if cfg.score_threshold is not None:
                sel = [s >= cfg.score_threshold for s in scores2]
                urls2 = [u for u, k in zip(urls2, sel) if k]
                hosts2 = [h for h, k in zip(hosts2, sel) if k]
                parents2 = [p for p, k in zip(parents2, sel) if k]
                depths2 = [d for d, k in zip(depths2, sel) if k]
                seqs2 = [s for s, k in zip(seqs2, sel) if k]
                scores2 = [s for s, k in zip(scores2, sel) if k]
            return _frontier_table(urls2, hosts2, depths2, parents2, scores2, seqs2)

        return gate

    def _seen_filter(self):
        """Cross-round dedup: batched check_and_add against the shard
        actors.  Exactly-once admission — a URL enters the frontier in
        the round it is first discovered."""
        seen = self.seen

        def fn(batch: pa.Table) -> pa.Table:
            urls = batch["url"].to_pylist()
            digests = [url_digest(u) for u in urls]
            is_new = seen.check_and_add(digests)
            return batch.filter(pa.array(is_new, pa.bool_()))

        return fn

    def _seen_contains_filter(self):
        """READ-ONLY variant for retryable Ray tasks: keeps rows whose
        digest is not yet seen, without marking — marking happens in an
        idempotent pass after the round's frontier materializes (a
        retried task that had already marked would otherwise drop its
        whole batch)."""
        seen = self.seen

        def fn(batch: pa.Table) -> pa.Table:
            digests = [url_digest(u) for u in batch["url"].to_pylist()]
            hit = seen.contains(digests)
            return batch.filter(pa.array([not h for h in hit], pa.bool_()))

        return fn

    def _seen_add(self):
        """Idempotent marking pass (identity transform on the rows)."""
        seen = self.seen

        def fn(batch: pa.Table) -> pa.Table:
            seen.check_and_add([url_digest(u) for u in batch["url"].to_pylist()])
            return batch

        return fn

    def _seed_frontier(self, seeds: list[str], robots_ref) -> pa.Table:
        cfg = self.cfg
        # seeds go through the SAME normalizer as discovered links, so
        # a seed and its normalized twin share one seen-set identity
        normed = []
        for s in seeds:
            n = normalize_url(s, s)
            if n:
                normed.append(n)
        hosts = [url_host(u) for u in normed]
        keep = [True] * len(normed)
        if robots_ref is not None:
            gate_obj = ray.get(robots_ref)
            keep = gate_obj.allowed_many(normed, hosts)
        seeds2 = [s for s, k in zip(normed, keep) if k]
        hosts2 = [h for h, k in zip(hosts, keep) if k]
        # duplicate seeds (or seeds normalizing to the same url) are
        # admitted once — check_and_add's verdict is authoritative.
        # best_first marks visited at SELECTION (the reference pops
        # mark, bff_strategy.py:164-173), so seeds only dedup locally
        if cfg.strategy == "best_first":
            uniq = list(dict.fromkeys(seeds2))
            hosts2 = [url_host(u) for u in uniq]
            seeds2 = uniq
        else:
            is_new = self.seen.check_and_add([url_digest(u) for u in seeds2])
            seeds2 = [s for s, n in zip(seeds2, is_new) if n]
            hosts2 = [h for h, n in zip(hosts2, is_new) if n]
        scores = _score_many(cfg.scorer, seeds2)
        seqs = [f"{i:08x}" for i in range(len(seeds2))]
        return _frontier_table(
            seeds2, hosts2, [0] * len(seeds2), [""] * len(seeds2), scores, seqs
        )

    # -- main loop ----------------------------------------------------

    def run(self, seeds: list[str], resume: bool = False):
        cfg = self.cfg
        pages = rd.read_parquet(self.pages_path, columns=["url", "html"])

        robots_ref = None
        if cfg.check_robots:
            # synthetic corpus: one rule set for every host — in a live
            # crawl this table is fetched per host once and cached
            gate = RobotsGate({}, user_agent="*")
            gate._rules_by_host = _AllHostsRules(cfg.robots_rules)
            robots_ref = ray.put(gate)

        start_round = 0
        if resume:
            latest = ckpt.latest_committed_round(self.checkpoint_dir)
            if latest is not None:
                self.seen.load_all(
                    ckpt.load_seen_shards(
                        self.checkpoint_dir,
                        latest,
                        expect_manifest=self.seen.config_manifest(),
                    )
                )
                self.pages_visited = sum(
                    m.get("n_success", m.get("n_visited", 0))
                    for m in ckpt.all_metrics(self.checkpoint_dir)
                )
                start_round = latest + 1
                hs_path = os.path.join(
                    ckpt.round_dir(self.checkpoint_dir, latest), "host_state.json"
                )
                if os.path.exists(hs_path):
                    import json as _json

                    with open(hs_path) as f:
                        self.host_fail_counts = _json.load(f)
                frontier_path = os.path.join(
                    ckpt.round_dir(self.checkpoint_dir, latest), "frontier"
                )
                frontier = rd.read_parquet(frontier_path) if _has_parquet(frontier_path) else None
                if frontier is not None and "seq" not in frontier.schema().names:
                    # checkpoint written before the seq column existed:
                    # backfill a FIXED-WIDTH placeholder per depth
                    # ((depth+1) hops of "ffffffff") so legacy rows keep
                    # the equal-length positional-comparison invariant
                    # against new-format keys at the same depth (they
                    # sort deterministically after all real keys)
                    frontier = frontier.map_batches(
                        lambda t: t.append_column(
                            "seq",
                            pa.array(
                                [
                                    "ffffffff" * (int(d) + 1)
                                    for d in t["depth"].to_pylist()
                                ],
                                pa.string(),
                            ),
                        ),
                        batch_format="pyarrow",
                    )
            else:
                resume = False
        if not resume:
            seed_table = self._seed_frontier(seeds, robots_ref)
            frontier = seed_table if seed_table.num_rows else None

        gate_fn = self._candidate_gate(robots_ref)
        seen_fn = self._seen_filter()  # driver path: atomic, no retries
        seen_contains_fn = self._seen_contains_filter()  # dataset path
        seen_add_fn = self._seen_add()

        for round_idx in range(start_round, cfg.max_rounds):
            if frontier is None:
                break
            # reference budget gate: stop BEFORE a level once the count
            # of successful fetches reaches max_pages — whole levels
            # are crawled (the reference does not trim mid-level, so a
            # level may overshoot; bfs_strategy.py:162-169, counting
            # only successes at :178-180)
            if cfg.max_pages is not None and self.pages_visited >= cfg.max_pages:
                break
            # `frontier` is a pa.Table for driver-coordinated small
            # rounds, a Dataset for distributed large rounds; a large
            # frontier that shrinks converts back down next round, and
            # a Table frontier that OUTGROWS the threshold (deferred
            # accumulation, link bursts) promotes back to a Dataset so
            # driver memory/sort work stays bounded by the threshold
            if isinstance(frontier, pa.Table):
                if frontier.num_rows > cfg.driver_round_threshold:
                    frontier = rd.from_arrow(frontier)
            if isinstance(frontier, pa.Table):
                f_table = frontier
                n_frontier = f_table.num_rows
            else:
                n_frontier = frontier.count()
                f_table = (
                    _dataset_to_table(frontier)
                    if n_frontier <= cfg.driver_round_threshold
                    else None
                )
            if n_frontier == 0:
                break
            t0 = time.time()
            # opt-in stage timing: GRAFT_CRAWL_TIMING=1 prints seconds
            # per round stage (diagnosing fixed Ray execution latency)
            _timing = os.environ.get("GRAFT_CRAWL_TIMING")
            _tmark = [time.perf_counter()]

            def _stage(label):
                if _timing:
                    now = time.perf_counter()
                    print(f"  [round {round_idx}] {label}: {now - _tmark[0]:.2f}s", flush=True)
                    _tmark[0] = now

            rdir = ckpt.begin_round(self.checkpoint_dir, round_idx)

            # politeness budget: per-host top-k, remainder deferred.
            # Skip the selection work when the WHOLE frontier fits the
            # smallest effective cap — no host can exceed it.
            min_cap = cfg.per_host_cap
            if cfg.per_host_cap is not None:
                from .politeness import effective_caps, select_table

                caps = effective_caps(cfg.per_host_cap, self.host_fail_counts)
                min_cap = min(caps.values()) if caps else cfg.per_host_cap

            if f_table is not None:
                # ---- driver-coordinated selection (small round):
                # plain Arrow/pandas, zero Ray executions ----
                if cfg.per_host_cap is not None and n_frontier > min_cap:
                    sel_tbl, def_tbl = select_table(
                        f_table,
                        per_host_cap=cfg.per_host_cap,
                        fail_counts=self.host_fail_counts,
                    )
                else:
                    sel_tbl, def_tbl = f_table, None

                if cfg.strategy in ("best_first", "dfs"):
                    df = sel_tbl.to_pandas()
                    if cfg.strategy == "best_first":
                        # the reference's PriorityQueue tuple order is
                        # (-score, depth, url, parent); popping BATCH_SIZE
                        # ENTRIES — duplicate/visited entries consume
                        # pop slots and are discarded, and visited is
                        # marked AT POP (bff_strategy.py:164-173)
                        df = df.sort_values(
                            ["score", "depth", "url", "parent"],
                            ascending=[False, True, True, True],
                            kind="mergesort",
                        )
                        take = cfg.best_first_batch_size
                        popped = df.iloc[:take]
                        rest = _table_from_pandas(df.iloc[take:])
                        batch = popped.drop_duplicates("url", keep="first")
                        is_new = self.seen.check_and_add(
                            [url_digest(u) for u in batch["url"]]
                        )
                        sel_tbl = _table_from_pandas(batch.iloc[[i for i, n in enumerate(is_new) if n]])
                    else:
                        # true LIFO: the reference pops the top of an
                        # explicit stack (dfs_strategy.py:27-83), which
                        # over discovery-path keys is exactly
                        # lexicographic min of seq (DFS pre-order) —
                        # first-discovered child of the most recently
                        # expanded page
                        df = df.sort_values("seq", kind="mergesort")
                        take = 1
                        sel_tbl = _table_from_pandas(df.iloc[:take])
                        rest = _table_from_pandas(df.iloc[take:])
                    def_tbl = rest if def_tbl is None else pa.concat_tables([def_tbl, rest])

                # visited checkpoint: direct parquet write, no execution
                os.makedirs(os.path.join(rdir, "visited"), exist_ok=True)
                pq_write_table(
                    sel_tbl.append_column(
                        "round", pa.array([round_idx] * sel_tbl.num_rows, pa.int32())
                    ),
                    os.path.join(rdir, "visited", "part-0.parquet"),
                )
                sel_table = sel_tbl.select(["url", "host", "depth", "seq"])
                deferred = None  # dataset-path variable, unused here
                _stage("politeness+select+write_visited(driver)")
            else:
                def_tbl = None
                if cfg.per_host_cap is not None and n_frontier > min_cap:
                    selected, deferred = enforce_politeness(
                        frontier,
                        per_host_cap=cfg.per_host_cap,
                        fail_counts=self.host_fail_counts,
                    )
                else:
                    selected, deferred = frontier, None

                # strategy selection: priority queue as sort+limit shuffles
                if cfg.strategy in ("best_first", "dfs"):
                    if cfg.strategy == "best_first":
                        ordered = selected.sort(
                            ["score", "depth", "url", "parent"],
                            descending=[True, False, False, False],
                        )
                        take = cfg.best_first_batch_size
                    else:  # dfs: true LIFO = seq (DFS pre-order), batch of 1
                        ordered = selected.sort("seq")
                        take = 1
                    split = ordered.split_at_indices([take])
                    selected = split[0]
                    deferred = split[1] if deferred is None else deferred.union(split[1])
                    if cfg.strategy == "best_first":
                        # pop-entry semantics (≤ batch_size rows — always
                        # driver-sized): duplicate/visited entries consume
                        # slots and are discarded; visited marks at pop
                        pop_tbl = _dataset_to_table(selected)
                        pdf = pop_tbl.to_pandas().drop_duplicates("url", keep="first")
                        is_new = self.seen.check_and_add(
                            [url_digest(u) for u in pdf["url"]]
                        )
                        kept = pdf.iloc[[i for i, n in enumerate(is_new) if n]]
                        selected = rd.from_arrow(_table_from_pandas(kept))

                # visit + checkpoint this round's fetch set: ONE execution
                # (write directly, read the small result back via pyarrow —
                # no second materialize pass)
                selected.map_batches(
                    lambda t, r=round_idx: t.append_column(
                        "round", pa.array([r] * t.num_rows, pa.int32())
                    ),
                    batch_format="pyarrow",
                ).write_parquet(os.path.join(rdir, "visited"))
                _stage("politeness+select+write_visited")
                sel_ds = rd.read_parquet(os.path.join(rdir, "visited"))
                n_sel_probe = sel_ds.count()
                if n_sel_probe <= cfg.broadcast_fetch_threshold:
                    sel_table = _read_dir_parquet(
                        os.path.join(rdir, "visited"), ["url", "host", "depth", "seq"]
                    )
                else:
                    # round too large to read back to the driver — the
                    # fetch joins and host state aggregates stay
                    # distributed (sel_table None marks that mode)
                    sel_table = None
            if sel_table is not None:
                n_selected = sel_table.num_rows
            else:
                n_selected = n_sel_probe
            if n_selected == 0:
                if cfg.strategy == "best_first":
                    # best_first marks visited at POP, so the frontier
                    # legitimately accumulates duplicate entries of
                    # already-popped URLs.  A pop that filters to
                    # nothing consumes those entries but does NOT end
                    # the crawl — the reference does `if not batch:
                    # continue` and keeps popping
                    # (bff_strategy.py:175-176).  Commit a zero-visit
                    # round carrying the remainder so a resume replays
                    # the same queue state.
                    remainder = def_tbl if def_tbl is not None else deferred
                    n_rest = 0
                    if remainder is not None:
                        n_rest = (
                            remainder.num_rows
                            if isinstance(remainder, pa.Table)
                            else remainder.count()
                        )
                    if n_rest > 0:
                        if isinstance(remainder, pa.Table):
                            os.makedirs(os.path.join(rdir, "frontier"), exist_ok=True)
                            pq_write_table(
                                remainder,
                                os.path.join(rdir, "frontier", "part-0.parquet"),
                            )
                        else:
                            remainder = _repack_blocks(remainder, n_rest)
                            remainder.write_parquet(os.path.join(rdir, "frontier"))
                        ckpt.save_seen_shards(
                            self.checkpoint_dir,
                            round_idx,
                            self.seen.dump_all(),
                            manifest=self.seen.config_manifest(),
                        )
                        ckpt.commit_round(
                            self.checkpoint_dir,
                            round_idx,
                            {
                                "n_frontier_in": n_frontier,
                                "n_visited": 0,
                                "n_success": 0,
                                "n_links": 0,
                                "n_deferred": n_rest,
                                "n_frontier_out": n_rest,
                                "seen_mode": cfg.seen_mode,
                                "seen_total": self.seen.total(),
                                "seen_overflow": self.seen.overflow_total(),
                                "seen_exact_lower_bound": self.pages_visited + n_rest,
                                "wall_ms": int((time.time() - t0) * 1000),
                            },
                        )
                        frontier = remainder
                        continue
                break

            # "fetch": frontier ⋈ pages on url (the simulated network).
            # Broadcast pushdown requires the round's url set on the
            # driver — only sound when the round was small enough to
            # read back; otherwise (or on request) a bounded hash join,
            # with the digest-keyed attach fast path below it replacing
            # the join shuffle for rounds whose METADATA fits the
            # broadcast budget (see CrawlConfig.fetch_attach_max).
            attach_est_bytes = n_selected * (20 + 8 * (cfg.max_depth + 1))
            if (
                (cfg.fetch_strategy == "join" or sel_table is None)
                and 0 < n_selected <= cfg.fetch_attach_max
                and attach_est_bytes <= cfg.fetch_attach_bytes_max
            ):
                import numpy as np

                if sel_table is not None:
                    meta = _attach_meta_rows(
                        sel_table.select(["url", "depth", "seq"])
                    )
                else:
                    # bounded collect of (d1, d2, depth, seq) — 20 B +
                    # seq per selected row, never urls, never html
                    meta = _dataset_to_table(
                        sel_ds.select_columns(["url", "depth", "seq"]).map_batches(
                            _attach_meta_rows, batch_format="pyarrow"
                        ),
                        schema=None,
                    )
                d1 = meta["d1"].to_numpy(zero_copy_only=False)
                d2 = meta["d2"].to_numpy(zero_copy_only=False)
                deps = meta["depth"].to_numpy(zero_copy_only=False)
                seqs = meta["seq"].to_numpy(zero_copy_only=False)
                order = np.lexsort((d2, d1))
                blob_ref = ray.put(
                    (d1[order], d2[order], deps[order], seqs[order])
                )
                _stage("fetch_attach_meta")
                fetched = pages.map_batches(
                    _fetch_attach_fn(blob_ref), batch_format="pyarrow"
                )
            elif cfg.fetch_strategy == "join" or sel_table is None:
                from ..functions.dedup import _join_partitions

                join_side = (
                    rd.from_arrow(sel_table.select(["url", "depth", "seq"]))
                    if sel_table is not None
                    else sel_ds.select_columns(["url", "depth", "seq"])
                )
                # semi-join pre-filter (see CrawlConfig.fetch_filter_max):
                # broadcast the round's url digests and drop
                # non-candidate pages rows BEFORE the shuffle — the
                # html payloads of unmatched pages never move.
                pages_side = pages
                if 0 < n_selected <= cfg.fetch_filter_max:
                    import numpy as np

                    if sel_table is not None:
                        digs = np.unique(_url_digests64(sel_table["url"]))
                    else:
                        digs = _collect_url_digests(sel_ds)
                    digs_ref = ray.put(digs)
                    pages_side = pages.map_batches(
                        _page_semi_filter_fn(digs_ref), batch_format="pyarrow"
                    )
                    _stage("fetch_semi_digest")
                fetched = join_side.join(
                    pages_side,
                    join_type="inner",
                    num_partitions=_join_partitions(cfg.join_partitions),
                    on=("url",),
                )
            else:
                # broadcast semi-join with predicate pushdown: the
                # round's url set becomes an `isin` filter on the
                # parquet read — with the pages layout sorted by url,
                # row-group min/max stats prune everything outside the
                # round (no full-corpus rescan per round)
                depth_map = {
                    u: (d, s)
                    for u, d, s in zip(
                        sel_table["url"].to_pylist(),
                        sel_table["depth"].to_pylist(),
                        sel_table["seq"].to_pylist(),
                    )
                }
                map_ref = ray.put(depth_map)

                import pyarrow.compute as _pc

                round_read = rd.read_parquet(
                    self.pages_path,
                    columns=["url", "html"],
                    filter=_pc.field("url").isin(list(depth_map)),
                )

                def attach_depth(batch: pa.Table, ref=map_ref) -> pa.Table:
                    dm = ray.get(ref)
                    urls = batch["url"].to_pylist()
                    mask = [u in dm for u in urls]
                    sub = batch.filter(pa.array(mask, pa.bool_()))
                    hit = [dm[u] for u, m in zip(urls, mask) if m]
                    return sub.append_column(
                        "depth", pa.array([d for d, _ in hit], pa.int32())
                    ).append_column("seq", pa.array([s for _, s in hit], pa.string()))

                fetched = round_read.map_batches(attach_depth, batch_format="pyarrow")
            _stage("fetch_build")

            # discover → gate → dedup → seen, ONE execution of the
            # pages scan (materialize once, then cheap derived counts).
            # links_all includes one null-href sentinel per fetched
            # page — the fetch-success signal for host backoff.
            new_frontier = None  # dataset (large-links path)
            new_tbl = None  # table (driver path)
            links_tbl = None  # sentinel-bearing table (driver path)
            links_all = None
            n_links = 0
            # with a link phase, success is counted from fetch-sentinel
            # evidence (a round whose fetch join returns zero rows must
            # record 0, or resume rebuilds an inflated pages_visited);
            # with max_depth == 0 and no budget gate there is no fetch
            # evidence pass, so selected counts as visited
            n_success = 0 if cfg.max_depth > 0 else n_selected
            if cfg.max_depth > 0:
                links_all = fetched.map_batches(
                    _with_depth(_extract_links_batch), batch_format="pyarrow"
                ).materialize()
                _stage("links_materialize")
                n_rows_all = links_all.count()
                # block hygiene: the attach-path fetch maps over the
                # full pages scan, so links_all inherits one block per
                # pages file — almost all empty.  Left alone, every
                # downstream pass (sentinel count, gate→groupby
                # dedup, host-state distinct) pays per-block fixed
                # cost on hundreds of empty blocks; repack to
                # row-proportional blocks once instead.
                links_all = _repack_blocks(links_all, n_rows_all, rows_per_block=4096)

                def _candidate_filter(t: pa.Table) -> pa.Table:
                    keep = pa.compute.and_(
                        t["href"].is_valid(),
                        pa.compute.less_equal(t["depth"], cfg.max_depth),
                    )
                    return t.filter(keep)

                # successful fetches = null-href sentinels (one per
                # fetched page); the reference counts ONLY successes
                # toward max_pages (bfs_strategy.py:178-180)
                def _sentinel_count(t: pa.Table) -> pa.Table:
                    return pa.table(
                        {"n": pa.array([t["href"].null_count], pa.int64())}
                    )

                if (
                    cfg.strategy == "best_first"
                    and cfg.max_pages is not None
                    and n_rows_all > 0
                ):
                    # the reference's mid-batch budget break
                    # (bff_strategy.py:195-201): the success that
                    # reaches max_pages is counted and marked but NOT
                    # emitted nor link-discovered, and the rest of the
                    # popped batch is discarded.  Replay the batch in
                    # queue order against the fetch-success sentinels.
                    # The popped batch is always driver-sized (≤
                    # best_first_batch_size), so the replay runs on the
                    # driver even when the LINK set is too large to
                    # read back — only the sentinel rows (≤ one per
                    # popped url) come down in that case.
                    small_links = n_rows_all <= cfg.driver_links_threshold
                    if small_links:
                        links_tbl = _dataset_to_table(links_all, schema=None)
                        success_urls = {
                            s
                            for s, h in zip(
                                links_tbl["src_url"].to_pylist(),
                                links_tbl["href"].to_pylist(),
                            )
                            if h is None
                        }
                    else:
                        sent = _dataset_to_table(
                            links_all.map_batches(
                                lambda t: t.filter(t["href"].is_null()).select(
                                    ["src_url"]
                                ),
                                batch_format="pyarrow",
                            ),
                            schema=None,
                        )
                        success_urls = (
                            set(sent["src_url"].to_pylist()) if sent.num_rows else set()
                        )
                    sel_replay = (
                        sel_table
                        if sel_table is not None
                        else _read_dir_parquet(
                            os.path.join(rdir, "visited"),
                            ["url", "host", "depth", "seq"],
                        )
                    )
                    before = cfg.max_pages - self.pages_visited
                    rows = sel_replay.to_pylist()
                    cutoff = None
                    n_succ = 0
                    for i, row in enumerate(rows):
                        if row["url"] in success_urls:
                            n_succ += 1
                            if n_succ >= before:
                                cutoff = i
                                break
                    if cutoff is not None:
                        kept_urls = {r["url"] for r in rows[:cutoff]}
                        # rewrite this round's visited checkpoint with
                        # the truncated batch (full original schema)
                        vdir = os.path.join(rdir, "visited")
                        import pyarrow.parquet as _pq

                        full_visited = pa.concat_tables(
                            [
                                _pq.read_table(os.path.join(vdir, name))
                                for name in sorted(os.listdir(vdir))
                                if name.endswith(".parquet")
                            ]
                        )
                        visited_tbl = full_visited.filter(
                            pa.array(
                                [
                                    u in kept_urls
                                    for u in full_visited["url"].to_pylist()
                                ],
                                pa.bool_(),
                            )
                        )
                        for name in os.listdir(vdir):
                            os.unlink(os.path.join(vdir, name))
                        pq_write_table(
                            visited_tbl, os.path.join(vdir, "part-0.parquet")
                        )
                        if small_links:
                            lmask = pa.array(
                                [
                                    s in kept_urls
                                    for s in links_tbl["src_url"].to_pylist()
                                ],
                                pa.bool_(),
                            )
                            links_tbl = links_tbl.filter(lmask)
                        else:
                            kept_ref = ray.put(kept_urls)

                            def _keep_kept(t: pa.Table, ref=kept_ref) -> pa.Table:
                                ks = ray.get(ref)
                                return t.filter(
                                    pa.array(
                                        [s in ks for s in t["src_url"].to_pylist()],
                                        pa.bool_(),
                                    )
                                )

                            links_all = links_all.map_batches(
                                _keep_kept, batch_format="pyarrow"
                            ).materialize()
                    self.pages_visited += n_succ
                    remaining = cfg.max_pages - self.pages_visited
                    n_success = n_succ
                    if small_links:
                        cand_rows = _candidate_filter(links_tbl)
                        n_links = cand_rows.num_rows
                        if remaining <= 0 and cutoff is not None:
                            new_tbl = None
                        else:
                            cand = gate_fn(cand_rows)
                            if cand.num_rows:
                                new_tbl = seen_contains_fn(cand)
                        _stage("discover(driver:bff-budget)")
                    else:
                        links = links_all.map_batches(
                            _candidate_filter, batch_format="pyarrow"
                        )
                        n_links = links.count()
                        if remaining <= 0 and cutoff is not None:
                            new_frontier = None
                        else:
                            new_frontier = links.map_batches(
                                gate_fn, batch_format="pyarrow"
                            ).map_batches(seen_contains_fn, batch_format="pyarrow")
                        _stage("discover(dataset:bff-budget)")
                elif 0 < n_rows_all <= cfg.driver_links_threshold:
                    # ---- driver-coordinated discovery: the link set is
                    # bounded, so gate → first-wins dedup → seen run on
                    # one in-memory table (block fetch, no executions).
                    # Semantics identical to the distributed chain:
                    # pandas stable sort by (depth, parent) + first-per-
                    # url ≡ groupby(url).Min(packed (depth,parent) key)
                    links_tbl = _dataset_to_table(links_all, schema=None)
                    n_success = links_tbl["href"].null_count
                    self.pages_visited += n_success
                    remaining = (
                        None
                        if cfg.max_pages is None
                        else cfg.max_pages - self.pages_visited
                    )
                    cand_rows = _candidate_filter(links_tbl)
                    n_links = cand_rows.num_rows
                    if remaining is not None and remaining <= 0:
                        # reference link_discovery returns before any
                        # visited update once capacity is exhausted
                        # (bfs_strategy.py:94-98) — nothing discovered,
                        # nothing marked
                        new_tbl = None
                    else:
                        cand = gate_fn(cand_rows)
                        if cand.num_rows and cfg.strategy == "best_first":
                            # queue semantics: every discovery instance
                            # is an entry; only already-POPPED urls are
                            # filtered (bff_strategy link_discovery
                            # checks the popped set, no dedup/marking)
                            new_tbl = seen_contains_fn(cand)
                        elif cand.num_rows:
                            cdf = (
                                cand.to_pandas()
                                .sort_values(["depth", "seq"], kind="mergesort")
                                .drop_duplicates("url", keep="first")
                            )
                            dedup_tbl = _table_from_pandas(cdf)
                            # seen_fn MARKS every deduped candidate —
                            # the reference adds ALL valid links to
                            # visited BEFORE the capacity trim, so
                            # over-cap links are seen-but-never-crawled
                            # (bfs_strategy.py:125-137)
                            new_tbl = seen_fn(dedup_tbl)
                            if (
                                remaining is not None
                                and cfg.strategy in ("bfs", "dfs")
                                and new_tbl.num_rows
                            ):
                                new_tbl = _budget_cap_tbl(
                                    new_tbl, remaining, cfg.scorer is not None
                                )
                    _stage("discover(driver)")
                elif n_rows_all > 0:
                    # gate → within-round dedup (deterministic
                    # first-wins) → cross-round READ-ONLY seen filter:
                    # one chain.  Dedup is pure aggregates — min over a
                    # sortable (depth, seq) key per url; host and
                    # score are functions of the url so Min returns
                    # them intact.  The seen filter here only READS
                    # (contains) — marking happens after the frontier
                    # materializes, in an idempotent add pass, so a Ray
                    # task retry can never drop discovered urls
                    # (check_and_add inside a retryable task is lossy).
                    sc = (
                        links_all.map_batches(
                            _sentinel_count, batch_format="pyarrow"
                        )
                        .to_pandas()
                    )
                    n_success = int(sc["n"].sum()) if "n" in sc.columns else 0
                    self.pages_visited += n_success
                    remaining = (
                        None
                        if cfg.max_pages is None
                        else cfg.max_pages - self.pages_visited
                    )
                    links = links_all.map_batches(
                        _candidate_filter, batch_format="pyarrow"
                    )
                    n_links = links.count()
                    if remaining is not None and remaining <= 0:
                        new_frontier = None  # capacity exhausted: no
                        # discovery, no seen marking (reference
                        # link_discovery early-out)
                    elif cfg.strategy == "best_first":
                        # queue semantics: keep every discovery
                        # instance; filter only POPPED urls
                        new_frontier = links.map_batches(
                            gate_fn, batch_format="pyarrow"
                        ).map_batches(seen_contains_fn, batch_format="pyarrow")
                    else:
                        new_frontier = (
                            links.map_batches(gate_fn, batch_format="pyarrow")
                            .map_batches(_pack_dedup_key, batch_format="pyarrow")
                            .groupby("url")
                            .aggregate(
                                Min("__dk", alias_name="__dk"),
                                Min("host", alias_name="host"),
                                Min("score", alias_name="score"),
                            )
                            .map_batches(_unpack_dedup_key, batch_format="pyarrow")
                            .map_batches(seen_contains_fn, batch_format="pyarrow")
                        )
                        if remaining is not None and cfg.strategy in ("bfs", "dfs"):
                            # mark ALL deduped candidates seen first
                            # (idempotent add pass on a materialized
                            # set), then cap per owner page — over-cap
                            # links stay seen-but-never-crawled, the
                            # reference's exact budget behavior
                            new_frontier = (
                                new_frontier.map_batches(
                                    seen_add_fn, batch_format="pyarrow"
                                )
                                .materialize()
                            )
                            new_frontier = _budget_cap_ds(
                                new_frontier, remaining, cfg.scorer is not None
                            )

            if links_all is None and cfg.max_pages is not None:
                # no link phase (max_depth == 0): count successes from
                # the fetch join directly for the budget gate
                n_success = fetched.count()
                self.pages_visited += n_success

            # frontier_{k+1} = new ∪ deferred — checkpointed
            # (deferred size derived, not counted: avoids re-executing
            # the politeness filter chain)
            if def_tbl is not None:
                n_deferred = def_tbl.num_rows
            else:
                n_deferred = (n_frontier - n_selected) if deferred is not None else 0
            if new_frontier is None and deferred is None:
                # everything in hand as tables → next frontier stays
                # driver-side: direct parquet write, zero executions
                tparts = [t for t in (new_tbl, def_tbl) if t is not None and t.num_rows]
                if tparts:
                    nxt_tbl = pa.concat_tables(tparts)
                    os.makedirs(os.path.join(rdir, "frontier"), exist_ok=True)
                    pq_write_table(
                        nxt_tbl, os.path.join(rdir, "frontier", "part-0.parquet")
                    )
                    frontier = nxt_tbl
                else:
                    frontier = None
                _stage("next_frontier_write(driver)")
            else:
                parts = []
                if new_frontier is not None:
                    parts.append(new_frontier)
                elif new_tbl is not None and new_tbl.num_rows:
                    parts.append(rd.from_arrow(new_tbl))
                if def_tbl is not None and def_tbl.num_rows:
                    parts.append(rd.from_arrow(def_tbl))
                elif deferred is not None and n_deferred > 0:
                    parts.append(deferred)
                if parts:
                    nxt = parts[0]
                    for p in parts[1:]:
                        nxt = nxt.union(p)
                    nxt = nxt.materialize()
                    n_next = nxt.count()
                    nxt = _repack_blocks(nxt, n_next)
                    _stage("next_frontier_materialize")
                    # idempotent seen marking rides the write pass: the
                    # contains-filter above only read the shards, so a
                    # retried write task merely re-adds the same
                    # digests (all three shard modes' add are no-ops on
                    # present digests)
                    marked = (
                        nxt
                        if cfg.strategy == "best_first"  # marks at pop
                        else nxt.map_batches(seen_add_fn, batch_format="pyarrow")
                    )
                    marked.write_parquet(os.path.join(rdir, "frontier"))
                    _stage("next_frontier_write")
                    frontier = nxt if n_next > 0 else None
                else:
                    frontier = None

            # host-state update: a host whose selected urls produced no
            # fetches this round backs off (fail_count++ → halved
            # budget next round); success decays the count (reference
            # RateLimiter: backoff ×2 on failure, ×0.75 decay).
            # Success signal: the null-href sentinels in links_all —
            # every fetched page appears as a src_url even with zero
            # surviving links.  Host-granular sets keep the driver
            # state bounded by the host count, not the round size.
            if cfg.per_host_cap is not None and links_all is not None:
                if links_tbl is not None:
                    fetched_hosts = {
                        url_host(s) for s in set(links_tbl["src_url"].to_pylist())
                    }
                else:
                    # per-block distinct hosts + driver union: map-only
                    # over materialized links_all, no Aggregate shuffle
                    host_blocks = links_all.select_columns(["src_url"]).map_batches(
                        lambda t: pa.table(
                            {
                                "host": pa.array(
                                    sorted(
                                        {
                                            url_host(s)
                                            for s in pa.compute.unique(
                                                t["src_url"]
                                            ).to_pylist()
                                        }
                                    ),
                                    pa.string(),
                                )
                            }
                        ),
                        batch_format="pyarrow",
                    ).to_pandas()
                    # an all-failed round leaves a schema-less empty frame
                    fetched_hosts = (
                        set(host_blocks["host"]) if "host" in host_blocks.columns else set()
                    )
                    _stage("host_state_src")
                if sel_table is not None:
                    sel_host_set = set(sel_table["host"].to_pylist())
                else:
                    sh_blocks = sel_ds.select_columns(["host"]).map_batches(
                        lambda t: pa.table(
                            {"host": pa.compute.unique(t["host"])}
                        ),
                        batch_format="pyarrow",
                    ).to_pandas()
                    sel_host_set = (
                        set(sh_blocks["host"]) if "host" in sh_blocks.columns else set()
                    )
                for host in sorted(sel_host_set):
                    if host in fetched_hosts:
                        self.host_fail_counts[host] = max(
                            0, self.host_fail_counts.get(host, 0) - 1
                        )
                    else:
                        self.host_fail_counts[host] = self.host_fail_counts.get(host, 0) + 1
                self.host_fail_counts = {
                    h: c for h, c in self.host_fail_counts.items() if c > 0
                }
                import json as _json

                with open(os.path.join(rdir, "host_state.json"), "w") as f:
                    _json.dump(self.host_fail_counts, f)

            ckpt.save_seen_shards(
                self.checkpoint_dir,
                round_idx,
                self.seen.dump_all(),
                manifest=self.seen.config_manifest(),
            )
            n_frontier_out = (
                0
                if frontier is None
                else (
                    frontier.num_rows
                    if isinstance(frontier, pa.Table)
                    else frontier.count()
                )
            )
            ckpt.commit_round(
                self.checkpoint_dir,
                round_idx,
                {
                    "n_frontier_in": n_frontier,
                    "n_visited": n_selected,
                    "n_success": n_success,
                    "n_links": n_links,
                    "n_deferred": n_deferred,
                    "n_frontier_out": n_frontier_out,
                    # approximate-membership accounting (SURVEY §7.4.4):
                    # in bloom/cuckoo mode seen_total is approximate; the
                    # exact lower bound is visited+frontier, so the gap
                    # bounds the false-positive loss
                    "seen_mode": cfg.seen_mode,
                    "seen_total": self.seen.total(),
                    "seen_overflow": self.seen.overflow_total(),
                    "seen_exact_lower_bound": self.pages_visited + n_frontier_out,
                    "wall_ms": int((time.time() - t0) * 1000),
                },
            )

        return self.visited_dataset()

    def visited_dataset(self):
        latest = ckpt.latest_committed_round(self.checkpoint_dir)
        if latest is None:
            return rd.from_arrow(_frontier_table([], [], [], [], []))
        files = []
        for i in range(latest + 1):
            vdir = os.path.join(ckpt.round_dir(self.checkpoint_dir, i), "visited")
            if os.path.isdir(vdir):
                files.extend(
                    os.path.join(vdir, n) for n in sorted(os.listdir(vdir))
                    if n.endswith(".parquet")
                )
        if not files:
            return rd.from_arrow(_frontier_table([], [], [], [], []))
        return rd.read_parquet(files)

    def shutdown(self):
        self.seen.shutdown()


class _AllHostsRules(dict):
    """Synthetic-corpus robots source: every host shares one rule set."""

    def __init__(self, rules: str):
        super().__init__()
        self._rules = rules

    def get(self, host, default=None):
        return self._rules


def _with_depth(link_fn):
    """Wrap the link extractor to carry depth+1 and the parent's
    discovery-sequence key from the fetched row."""

    def fn(batch: pa.Table) -> pa.Table:
        depth_by_url = dict(
            zip(batch["url"].to_pylist(), batch["depth"].to_pylist())
        )
        seq_by_url = (
            dict(zip(batch["url"].to_pylist(), batch["seq"].to_pylist()))
            if "seq" in batch.column_names
            else {}
        )
        links = link_fn(batch)
        srcs = links["src_url"].to_pylist()
        depths = [depth_by_url[u] + 1 for u in srcs]
        pseqs = [seq_by_url.get(u, "") for u in srcs]
        return links.append_column(
            "depth", pa.array(depths, pa.int32())
        ).append_column("parent_seq", pa.array(pseqs, pa.string()))

    return fn


def _pack_dedup_key(batch: pa.Table) -> pa.Table:
    """Sortable (depth, seq) key: min over it = deterministic
    first-wins in the REFERENCE'S discovery order (shallowest depth,
    then the sequential position its first discoverer processed it at
    — ``visited`` insertion order in ``bfs_strategy.link_discovery``).
    Equal-depth rows have equal-length seq strings, so the hex
    comparison is positional.  The parent rides the key (seq is unique
    per discovery instance, so the min's parent is the owner's)."""
    packed = [
        f"{d:010d}\x1f{s}\x1f{p}"
        for d, s, p in zip(
            batch["depth"].to_pylist(),
            batch["seq"].to_pylist(),
            batch["parent"].to_pylist(),
        )
    ]
    return pa.table(
        {
            "url": batch["url"],
            "host": batch["host"],
            "score": batch["score"],
            "__dk": pa.array(packed, pa.string()),
        }
    )


def _unpack_dedup_key(batch: pa.Table) -> pa.Table:
    keys = batch["__dk"].to_pylist()
    depths, seqs, parents = [], [], []
    for k in keys:
        d, s, p = k.split("\x1f", 2)
        depths.append(int(d))
        seqs.append(s)
        parents.append(p)
    return pa.table(
        {
            "url": batch["url"],
            "host": batch["host"],
            "depth": pa.array(depths, pa.int32()),
            "parent": pa.array(parents, pa.string()),
            "score": batch["score"],
            "seq": pa.array(seqs, pa.string()),
        }
    )


def _budget_cap_pandas(df, cap: int, use_score: bool):
    """Per-owner-page budget truncation, the reference's
    ``link_discovery`` capacity trim (bfs_strategy.py:129-137): each
    source page keeps its first ``cap`` surviving links in discovery
    order — stable-sorted by score desc first iff a scorer is set
    (the reference sorts only then)."""
    df = df.sort_values("seq", kind="mergesort")
    if use_score:
        df = df.sort_values("score", ascending=False, kind="mergesort")
    kept = df.groupby("parent", sort=False).head(cap)
    if use_score:
        # the reference's score sort PERSISTS into the next_level
        # append (bfs_strategy.py:131-137), so the next level crawls
        # the kept links in score-desc order, not discovery order.
        # Downstream ordering is seq-lexicographic — rewrite the final
        # seq hop to the score rank within the parent so the replayed
        # order matches (parent prefix unchanged: children's keys stay
        # consistent).
        kept = kept.copy()
        ranks = kept.groupby("parent", sort=False).cumcount()
        kept["seq"] = [
            s[:-8] + f"{r:08x}" for s, r in zip(kept["seq"], ranks)
        ]
    return kept.sort_values("seq", kind="mergesort")


def _budget_cap_tbl(tbl: pa.Table, cap: int, use_score: bool) -> pa.Table:
    if tbl.num_rows == 0:
        return tbl
    return _table_from_pandas(_budget_cap_pandas(tbl.to_pandas(), cap, use_score))


def _budget_cap_ds(ds, cap: int, use_score: bool):
    """Distributed per-owner cap.  Parent groups are links-per-page
    SMALL but corpus-count NUMEROUS — exactly the regime where Ray's
    per-group aggregate/map_groups machinery pays per-group Python
    cost (measured elsewhere in this repo: 15M tiny groups took
    57–85 s through ``groupby().aggregate()`` vs 8 s through one
    key-hash exchange).  Route through the key-hash grouping
    primitive (``functions.dedup._hash_group_blocks``) so every
    parent lands WHOLE in one block, then run the pandas cap once per
    BLOCK — ``_budget_cap_pandas`` groups by parent internally, so
    per-block output equals the per-group output exactly."""
    from ..functions.dedup import _default_cpus, _hash_group_blocks

    cpus = _default_cpus()

    def cap_block(df):
        if not len(df):
            return df
        return _budget_cap_pandas(df, cap, use_score)

    return _hash_group_blocks(ds, ["parent"], max(16, cpus)).map_batches(
        cap_block, batch_format="pandas", batch_size=None
    )


def _has_parquet(path: str) -> bool:
    return os.path.isdir(path) and any(n.endswith(".parquet") for n in os.listdir(path))


def _read_dir_parquet(path: str, columns: list[str]):
    """Driver-side read of a small just-written parquet dir (no Ray
    execution)."""
    import pyarrow.parquet as _pq

    files = (
        [os.path.join(path, n) for n in sorted(os.listdir(path)) if n.endswith(".parquet")]
        if os.path.isdir(path)
        else []
    )
    if not files:
        return pa.table({c: pa.array([], pa.string()) for c in columns})
    tables = [_pq.read_table(f, columns=columns) for f in files]
    return pa.concat_tables(tables)


def crawl_bfs(
    pages_path: str,
    seeds: list[str],
    cfg: CrawlConfig | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
):
    """Convenience wrapper: run a BFS crawl, return (visited Dataset,
    BFSCrawl driver). Caller should ``driver.shutdown()`` when done."""
    driver = BFSCrawl(pages_path, cfg or CrawlConfig(), checkpoint_dir)
    visited = driver.run(seeds, resume=resume)
    return visited, driver


def _main() -> None:
    """CLI (reference: the ``crwl`` console script, ``crawl4ai/cli.py``):

        python -m crawl4ai_custom_ray.frontier.crawl \\
            --pages /tmp/graft_pages/sf0.001 --seeds URL [URL...] \\
            --max-depth 2 --strategy bfs --checkpoint-dir /tmp/ckpt
    """
    import argparse
    import json as _json

    import ray as _ray

    parser = argparse.ArgumentParser(description="BSP crawl over a pages parquet table")
    parser.add_argument("--pages", required=True, help="pages parquet file/dir")
    parser.add_argument("--seeds", nargs="+", required=True)
    parser.add_argument("--strategy", choices=["bfs", "best_first", "dfs"], default="bfs")
    parser.add_argument("--max-depth", type=int, default=2)
    parser.add_argument("--max-pages", type=int, default=None)
    parser.add_argument("--per-host-cap", type=int, default=None)
    parser.add_argument("--check-robots", action="store_true")
    parser.add_argument("--seen-mode", choices=["exact", "bloom", "cuckoo"], default="exact")
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--num-cpus", type=int, default=8)
    parser.add_argument("--out", default=None, help="write visited table to this dir")
    args = parser.parse_args()

    if not _ray.is_initialized():
        _ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        cfg = CrawlConfig(
            strategy=args.strategy,
            max_depth=args.max_depth,
            max_pages=args.max_pages,
            per_host_cap=args.per_host_cap,
            check_robots=args.check_robots,
            seen_mode=args.seen_mode,
        )
        visited, driver = crawl_bfs(
            args.pages, args.seeds, cfg, args.checkpoint_dir, resume=args.resume
        )
        try:
            n = visited.count()
            if args.out:
                visited.write_parquet(args.out)
            print(
                _json.dumps(
                    {
                        "visited": n,
                        "checkpoint_dir": driver.checkpoint_dir,
                        "rounds": ckpt.latest_committed_round(driver.checkpoint_dir),
                    }
                )
            )
        finally:
            driver.shutdown()
    finally:
        _ray.shutdown()


if __name__ == "__main__":
    _main()
