"""Web-graph operators over the extracted link table.

PageRank is THE canonical whole-web computation downstream of a crawl
(Page et al. 1999); here it is the classic BSP formulation on Ray
Data: each iteration is one hash join (ranks onto edges), one
groupby-sum (incoming contributions), and one left join back onto the
node table — all fixed-width integer rows, no corpus-sized state
anywhere.

Arithmetic is FIXED-POINT INTEGER, deliberately: floating-point
PageRank sums incoming contributions in shuffle order, so two runs
(or the Ray side and a SQL oracle) disagree in the last ulps.
Integer sums are associative-commutative exactly, making the result
bit-identical at any parallelism — the same determinism convention as
the rest of this repo (md5 ranks, integer quality ratios).

Semantics (documented contract, mirrored by the DuckDB oracle):

    rank_0(v)   = scale                       (scale = 10^6)
    contrib(u)  = rank(u) // outdeg(u)        (floor division)
    rank_t+1(v) = (15*scale)//100 + (85 * Σ contrib(in-neighbors)) // 100

Dangling-node mass (nodes with no out-links) is dropped, not
redistributed — the standard simplification when ranks are only used
for ordering; noted here because true PageRank redistributes it.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Size-adaptive switch for the iterative (multi-round) kernels below:
# a BSP round costs 2 hash joins + 1 groupby of driver-coordinated
# overhead, which dominates wall time when the graph is small.  The
# graphs here are HOST-level (domain-bounded, not corpus-sized), so
# below this edge/node count the identical integer arithmetic runs
# locally — bit-identical by construction (same floor divisions, same
# associative-commutative integer sums) and asserted so by
# tests/test_analytics_ops.py::test_graph_local_vs_distributed.  Above
# it, the BSP path is the only one that fits in memory.
_LOCAL_GRAPH_MAX_EDGES = 200_000

# PageRank rank-broadcast gate: node counts at or under this pull the
# rank table to the driver each iteration as (128-bit url digest,
# rank) numpy arrays — 24 B per node (120 MB at the gate), never url
# strings — replacing the per-edge rank join; larger graphs keep the
# join route, value-identical.
_PAGERANK_BCAST_MAX = 5_000_000


def _pagerank_local(
    e, n, *, src_column, dst_column, node_column, weight_column, iters, scale
):
    """Driver-local replica of the distributed integer PageRank —
    EXACTLY the same arithmetic (outdeg over all edges; contributions
    only from edges whose src is a known node, folded only into known
    dst; floor divisions throughout)."""
    import numpy as np
    import ray.data as rd

    base = (15 * scale) // 100
    idx = {v: i for i, v in enumerate(n[node_column])}
    N = len(idx)
    src = np.asarray([idx.get(v, -1) for v in e[src_column]], np.int64)
    dst = np.asarray([idx.get(v, -1) for v in e[dst_column]], np.int64)
    w = (
        e[weight_column].to_numpy().astype(np.int64)
        if weight_column
        else np.ones(len(e), np.int64)
    )
    # outdeg is keyed by the raw src value (known or not), but only
    # known-src edges ever contribute, so known srcs suffice.
    outdeg = np.zeros(N, np.int64)
    m = src >= 0
    np.add.at(outdeg, src[m], w[m])
    live = m & (dst >= 0)
    es, ed, ew = src[live], dst[live], w[live]
    rank = np.full(N, scale, np.int64)
    for _ in range(iters):
        con = (rank[es] * ew) // outdeg[es]
        s = np.zeros(N, np.int64)
        np.add.at(s, ed, con)
        rank = base + (85 * s) // 100
    return rd.from_arrow(
        pa.table(
            {
                node_column: pa.array(list(idx.keys())),
                "rank": pa.array(rank, pa.int64()),
            }
        )
    )


def _hits_local(
    e, n, *, src_column, dst_column, node_column, iters, scale
):
    """Driver-local replica of the distributed integer HITS sweep.
    The per-round normalizer totals include contributions addressed to
    edge endpoints that are NOT in the node table (the distributed
    sweep computes its total BEFORE the left join onto nodes), so the
    accumulators run over the union of nodes and edge endpoints."""
    import numpy as np
    import ray.data as rd

    uni = {}
    for v in n[node_column]:
        uni.setdefault(v, len(uni))
    known_n = len(uni)
    for col in (src_column, dst_column):
        for v in e[col]:
            uni.setdefault(v, len(uni))
    U = len(uni)
    src = np.asarray([uni[v] for v in e[src_column]], np.int64)
    dst = np.asarray([uni[v] for v in e[dst_column]], np.int64)
    known = np.zeros(U, bool)
    known[:known_n] = True

    hub = np.zeros(U, np.int64)
    hub[:known_n] = scale
    auth = np.zeros(U, np.int64)
    for _ in range(iters):
        araw = np.zeros(U, np.int64)
        m = known[src]  # scores join is inner on src
        np.add.at(araw, dst[m], hub[src[m]])
        norm = max(int(araw.sum()) // scale, 1)
        auth = np.where(known, araw // norm, 0)
        hraw = np.zeros(U, np.int64)
        m = known[dst]  # scores join is inner on dst
        np.add.at(hraw, src[m], auth[dst[m]])
        norm = max(int(hraw.sum()) // scale, 1)
        hub = np.where(known, hraw // norm, 0)
    names = list(uni.keys())[:known_n]
    return rd.from_arrow(
        pa.table(
            {
                node_column: pa.array(names),
                "hub": pa.array(hub[:known_n], pa.int64()),
                "auth": pa.array(auth[:known_n], pa.int64()),
            }
        )
    )


def _hop_distance_local(
    e, s, *, src_column, dst_column, node_column, max_hops
):
    """Driver-local replica of the BSP min-label propagation: each
    round relaxes every edge from the full settled set (not a frontier
    delta), exactly like the distributed rounds."""
    import numpy as np
    import ray.data as rd

    uni = {}
    for v in s[node_column]:
        uni.setdefault(v, len(uni))
    for col in (src_column, dst_column):
        for v in e[col]:
            uni.setdefault(v, len(uni))
    U = len(uni)
    src = np.asarray([uni[v] for v in e[src_column]], np.int64)
    dst = np.asarray([uni[v] for v in e[dst_column]], np.int64)
    INF = np.iinfo(np.int64).max
    dist = np.full(U, INF, np.int64)
    for v in s[node_column]:
        dist[uni[v]] = 0
    for _ in range(max_hops):
        m = dist[src] < INF
        np.minimum.at(dist, dst[m], dist[src[m]] + 1)
    names = np.asarray(list(uni.keys()), object)
    reach = dist < INF
    return rd.from_arrow(
        pa.table(
            {
                node_column: pa.array(list(names[reach])),
                "dist": pa.array(dist[reach], pa.int64()),
            }
        )
    )


def pagerank(
    edges,
    nodes,
    *,
    src_column: str = "src",
    dst_column: str = "dst",
    node_column: str = "url",
    weight_column: str | None = None,
    iters: int = 5,
    scale: int = 1_000_000,
    num_partitions: int = 16,
):
    """Integer fixed-point PageRank.  ``edges``: Dataset of directed
    (src, dst) rows (self-loops and duplicates should be removed by
    the caller — semantics count each row once).  ``nodes``: Dataset
    with every vertex exactly once.  Returns (node_column, rank).

    With ``weight_column`` set, each edge carries an int64 weight and
    a source's rank splits proportionally:
    ``contrib = (rank · w) // Σ_out w`` (floor division — still
    order-free and bit-identical; rank·w stays ≪ 2^63 for weights up
    to ~10^6 at scale 10^6).  Unweighted is the weight≡1 special case
    with the division done per edge.

    Scale shape: the edge table is joined ONCE with out-degrees and
    materialized; each of the ``iters`` rounds then shuffles only
    (src/dst digest-sized key, int64) rows.  The rank table is
    O(nodes) and never collected to the driver.
    """
    from ray.data.aggregate import Count, Sum

    from .dedup import _coalesce_for_join, _join_partitions

    base = (15 * scale) // 100

    edge_cols = [src_column, dst_column] + (
        [weight_column] if weight_column else []
    )
    # Materialized once: reused by the outdeg aggregate AND the rank
    # join below (avoids recomputing the upstream lineage twice), and
    # makes the size-adaptive count() metadata-only.
    edges = edges.select_columns(edge_cols).materialize()
    nodes = nodes.select_columns([node_column]).materialize()
    if (
        edges.count() <= _LOCAL_GRAPH_MAX_EDGES
        and nodes.count() <= _LOCAL_GRAPH_MAX_EDGES
    ):
        return _pagerank_local(
            edges.to_pandas(),
            nodes.to_pandas(),
            src_column=src_column,
            dst_column=dst_column,
            node_column=node_column,
            weight_column=weight_column,
            iters=iters,
            scale=scale,
        )
    # Out-degree via key-hash repartition + per-block C++ group count
    # (node-count groups through Ray's aggregate machinery measured 2×
    # slower; see dedup._hash_group_blocks), then ONE per-edge attach
    # join — reused by every iteration.
    import numpy as np
    import ray

    from .dedup import _hash_group_blocks

    cpus = (
        int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    )
    nparts = _join_partitions(num_partitions)
    kparts = max(num_partitions, cpus)

    def block_outdeg(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    src_column: pa.array([], pa.string()),
                    "outdeg": pa.array([], pa.int64()),
                }
            )
        if weight_column:
            g = batch.group_by(src_column).aggregate([(weight_column, "sum")])
            return pa.table(
                {
                    src_column: g[src_column],
                    "outdeg": g[f"{weight_column}_sum"].cast(pa.int64()),
                }
            )
        g = batch.group_by(src_column).aggregate([(dst_column, "count")])
        return pa.table(
            {src_column: g[src_column], "outdeg": g[f"{dst_column}_count"]}
        )

    outdeg = _hash_group_blocks(edges, [src_column], kparts).map_batches(
        block_outdeg, batch_format="pyarrow", batch_size=None
    )
    outdeg, _ = _coalesce_for_join(outdeg)

    edges_w = edges.join(
        outdeg,
        join_type="inner",
        num_partitions=nparts,
        on=(src_column,),
        right_on=(src_column,),
    ).materialize()

    def init_rank(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                node_column: batch[node_column],
                "rank": pa.array([scale] * batch.num_rows, pa.int64()),
            }
        )

    ranks = nodes.map_batches(init_rank, batch_format="pyarrow")
    ranks, _ = _coalesce_for_join(ranks)

    def per_edge(batch: pa.Table) -> pa.Table:
        if weight_column:
            num = pc.multiply(
                batch["rank"], pc.cast(batch[weight_column], pa.int64())
            )
        else:
            num = batch["rank"]
        con = pc.divide(num, pc.cast(batch["outdeg"], pa.int64()))
        return pa.table(
            {"dst_": batch[dst_column], "con": pc.cast(con, pa.int64())}
        )

    def block_sum(batch: pa.Table) -> pa.Table:
        """Per-block C++ group-sum — final per-dst sums, because the
        key-hash repartition co-located each dst's rows."""
        if batch.num_rows == 0:
            return pa.table(
                {"dst_": pa.array([], pa.string()), "s": pa.array([], pa.int64())}
            )
        g = batch.group_by("dst_").aggregate([("con", "sum")])
        return pa.table({"dst_": g["dst_"], "s": g["con_sum"]})

    # rank delivery per iteration, size-adaptive: node counts at or
    # under the gate broadcast the rank table as (128-bit url digest,
    # rank) numpy arrays — a bounded pull (24 B per node, never url
    # strings) that replaces the per-edge hash join; above the gate
    # the join route runs unchanged (value-identical: the digest
    # lookup drops rank-less sources exactly like the inner join).
    from ..frontier.crawl import _ATTACH_HASH_KEY2, _url_digests64

    bcast = nodes.count() <= _PAGERANK_BCAST_MAX

    def _rank_blob_rows(batch: pa.Table) -> pa.Table:
        d1 = np.asarray(_url_digests64(batch[node_column]), dtype="<u8")
        d2 = np.asarray(
            _url_digests64(batch[node_column], _ATTACH_HASH_KEY2), dtype="<u8"
        )
        r = batch["rank"].to_numpy(zero_copy_only=False).astype("<i8")
        return pa.table(
            {
                "d1": pa.array([d1.tobytes()], pa.binary()),
                "d2": pa.array([d2.tobytes()], pa.binary()),
                "r": pa.array([r.tobytes()], pa.binary()),
            }
        )

    def _edge_contrib_bcast(ref):
        def fn(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table(
                    {"dst_": pa.array([], pa.string()), "con": pa.array([], pa.int64())}
                )
            d1s, d2s, rs = ray.get(ref)
            if len(d1s) == 0:
                # empty broadcast rank table (no nodes) with a
                # non-empty edge batch: nothing can match — the typed
                # empty result the join route would produce (np.clip
                # to -1 would otherwise fault the d1s[pos] index).
                return pa.table(
                    {"dst_": pa.array([], pa.string()), "con": pa.array([], pa.int64())}
                )
            h1 = np.asarray(_url_digests64(batch[src_column]), dtype="<u8")
            h2 = np.asarray(
                _url_digests64(batch[src_column], _ATTACH_HASH_KEY2), dtype="<u8"
            )
            pos = np.clip(np.searchsorted(d1s, h1), 0, max(len(d1s) - 1, 0))
            ok = (d1s[pos] == h1) & (d2s[pos] == h2)
            # rare duplicate-d1 runs: scan forward for the d2 match
            for i in np.nonzero((d1s[pos] == h1) & (d2s[pos] != h2))[0]:
                j = pos[i]
                while j < len(d1s) and d1s[j] == h1[i]:
                    if d2s[j] == h2[i]:
                        pos[i] = j
                        ok[i] = True
                        break
                    j += 1
            sub = batch.filter(pa.array(ok))
            rank = pa.array(rs[pos[ok]], pa.int64())
            if weight_column:
                num = pc.multiply(
                    rank, pc.cast(sub[weight_column], pa.int64())
                )
            else:
                num = rank
            con = pc.cast(
                pc.divide(num, pc.cast(sub["outdeg"], pa.int64())), pa.int64()
            )
            return pa.table({"dst_": sub[dst_column], "con": con})

        return fn

    for _ in range(iters):
        if bcast:
            blobs = ranks.map_batches(
                _rank_blob_rows, batch_format="pyarrow"
            ).take_all()
            d1 = (
                np.concatenate([np.frombuffer(b["d1"], dtype="<u8") for b in blobs])
                if blobs
                else np.empty(0, dtype="<u8")
            )
            d2 = (
                np.concatenate([np.frombuffer(b["d2"], dtype="<u8") for b in blobs])
                if blobs
                else np.empty(0, dtype="<u8")
            )
            r = (
                np.concatenate([np.frombuffer(b["r"], dtype="<i8") for b in blobs])
                if blobs
                else np.empty(0, dtype="<i8")
            )
            order = np.lexsort((d2, d1))
            ref = ray.put((d1[order], d2[order], r[order]))
            contrib_rows = edges_w.map_batches(
                _edge_contrib_bcast(ref), batch_format="pyarrow"
            )
        else:
            contribs = edges_w.join(
                ranks,
                join_type="inner",
                num_partitions=nparts,
                on=(src_column,),
                right_on=(node_column,),
            )
            contrib_rows = contribs.map_batches(per_edge, batch_format="pyarrow")

        incoming = _hash_group_blocks(
            contrib_rows, ["dst_"], kparts
        ).map_batches(block_sum, batch_format="pyarrow", batch_size=None)
        incoming, _ = _coalesce_for_join(incoming)

        joined = nodes.join(
            incoming,
            join_type="left_outer",
            num_partitions=nparts,
            on=(node_column,),
            right_on=("dst_",),
        )

        def update(batch: pa.Table) -> pa.Table:
            s = pc.coalesce(batch["s"], pa.scalar(0, pa.int64()))
            r = pc.add(
                pa.scalar(base, pa.int64()),
                pc.divide(pc.multiply(pa.scalar(85, pa.int64()), s), 100),
            )
            return pa.table(
                {node_column: batch[node_column], "rank": pc.cast(r, pa.int64())}
            )

        ranks = joined.map_batches(update, batch_format="pyarrow")
        ranks, _ = _coalesce_for_join(ranks)

    return ranks


def hits(
    edges,
    nodes,
    *,
    src_column: str = "src",
    dst_column: str = "dst",
    node_column: str = "host",
    iters: int = 3,
    scale: int = 1_000_000,
    num_partitions: int = 16,
):
    """Integer fixed-point HITS hubs & authorities (Kleinberg 1999) —
    the link-topology complement to PageRank: authorities are pages
    pointed to by good hubs, hubs point to good authorities.

    Semantics (documented contract, mirrored by the DuckDB oracle);
    every round updates authorities from the PREVIOUS hubs, then hubs
    from the NEW authorities — the classic alternating sweep:

        hub_0(v)    = scale                         (scale = 10^6)
        araw_t(v)   = Σ_{(u,v)∈E} hub_{t-1}(u)
        auth_t(v)   = araw_t(v) // max(Σ araw_t // scale, 1)
        hraw_t(u)   = Σ_{(u,v)∈E} auth_t(v)
        hub_t(u)    = hraw_t(u) // max(Σ hraw_t // scale, 1)

    The normalizer replaces the usual L2 norm with an integer
    sum-to-~scale rescale: it is associative-commutative exact, keeps
    every value ≈ scale so raw sums stay within int64 at any graph
    size (araw ≤ max_deg·scale ≈ 10^14 even at 10^8 hosts), and gives
    the same ranking as normalized HITS because normalization is a
    positive per-round scalar.  Floor division makes the result
    bit-identical at any parallelism.

    Scale shape: per half-round one hash join (scores onto edges), one
    groupby-sum, one left join back onto nodes; the only driver-side
    values are the two per-round normalizer scalars (single-row
    aggregates).  Score tables are O(nodes), edges shuffle as
    (key, int64) rows, nothing corpus-sized is collected.
    """
    from ray.data.aggregate import Sum

    from .dedup import _coalesce_for_join, _join_partitions

    if iters < 1:
        raise ValueError("hits requires iters >= 1 (no authorities otherwise)")
    nparts = _join_partitions(num_partitions)
    edges = edges.select_columns([src_column, dst_column]).materialize()
    nodes = nodes.select_columns([node_column]).materialize()
    if (
        edges.count() <= _LOCAL_GRAPH_MAX_EDGES
        and nodes.count() <= _LOCAL_GRAPH_MAX_EDGES
    ):
        return _hits_local(
            edges.to_pandas(),
            nodes.to_pandas(),
            src_column=src_column,
            dst_column=dst_column,
            node_column=node_column,
            iters=iters,
            scale=scale,
        )

    def _init(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                node_column: batch[node_column],
                "score": pa.array([scale] * batch.num_rows, pa.int64()),
            }
        )

    def _sweep(scores, join_on, emit):
        """One half-round: propagate ``scores`` across edges joined on
        ``join_on`` (src → collects into dst for authorities, dst →
        collects into src for hubs), normalize, return O(nodes) table."""
        prop = edges.join(
            scores,
            join_type="inner",
            num_partitions=nparts,
            on=(join_on,),
            right_on=(node_column,),
        )

        def per_edge(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"node_": batch[emit], "con": batch["score"]}
            )

        raw = (
            prop.map_batches(per_edge, batch_format="pyarrow")
            .groupby("node_")
            .aggregate(Sum("con", alias_name="s"))
            .materialize()
        )
        total = raw.aggregate(Sum("s"))["sum(s)"] or 0
        norm = max(total // scale, 1)
        raw, _ = _coalesce_for_join(raw)

        joined = nodes.join(
            raw,
            join_type="left_outer",
            num_partitions=nparts,
            on=(node_column,),
            right_on=("node_",),
        )

        def update(batch: pa.Table) -> pa.Table:
            s = pc.coalesce(batch["s"], pa.scalar(0, pa.int64()))
            return pa.table(
                {
                    node_column: batch[node_column],
                    "score": pc.cast(
                        pc.divide(s, pa.scalar(norm, pa.int64())), pa.int64()
                    ),
                }
            )

        out = joined.map_batches(update, batch_format="pyarrow")
        out, _ = _coalesce_for_join(out)
        return out

    hubs = nodes.map_batches(_init, batch_format="pyarrow")
    hubs, _ = _coalesce_for_join(hubs)
    auths = None
    for _ in range(iters):
        auths = _sweep(hubs, src_column, dst_column)
        hubs = _sweep(auths, dst_column, src_column)

    merged = hubs.rename_columns({"score": "hub"}).join(
        auths.rename_columns({"score": "auth"}),
        join_type="inner",
        num_partitions=nparts,
        on=(node_column,),
        right_on=(node_column,),
    )
    return merged.select_columns([node_column, "hub", "auth"])


def hop_distance(
    edges,
    seeds,
    *,
    src_column: str = "src",
    dst_column: str = "dst",
    node_column: str = "host",
    max_hops: int = 3,
    num_partitions: int = 16,
):
    """Multi-source BFS hop distance over the link graph — the crawl
    radius question ("how many hops from the seed set is each host?")
    that sizes a deep-crawl budget before running it.

    BSP min-label propagation, ``max_hops`` fixed rounds: each round
    joins the current distance table onto edges by source, emits
    (dst, d+1), and folds it into the distance table with a
    union + groupby-min — the min over a union is
    associative-commutative exact, so the result is bit-identical at
    any parallelism and mirrors a chained-CTE oracle round for round.
    Returns (node, dist) for every host reached within ``max_hops``;
    unreached hosts are absent (no sentinel rows).

    Scale shape: shuffles carry only (host-key, int64) rows; each
    round is one hash join + one groupby.  Rounds re-propagate the
    whole settled set rather than a frontier delta — at ``max_hops``
    this costs ≤ max_hops× the frontier-only traffic and keeps every
    round identical (no driver-side frontier bookkeeping); a
    frontier-delta variant is the optimization when max_hops is deep.
    """
    from ray.data.aggregate import Min

    from .dedup import _coalesce_for_join, _join_partitions

    nparts = _join_partitions(num_partitions)
    edges = edges.select_columns([src_column, dst_column]).materialize()
    seeds = seeds.select_columns([node_column]).materialize()
    if (
        edges.count() <= _LOCAL_GRAPH_MAX_EDGES
        and seeds.count() <= _LOCAL_GRAPH_MAX_EDGES
    ):
        return _hop_distance_local(
            edges.to_pandas(),
            seeds.to_pandas(),
            src_column=src_column,
            dst_column=dst_column,
            node_column=node_column,
            max_hops=max_hops,
        )

    def init0(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                node_column: batch[node_column],
                "dist": pa.array([0] * batch.num_rows, pa.int64()),
            }
        )

    dist = seeds.select_columns([node_column]).map_batches(
        init0, batch_format="pyarrow"
    )
    dist, _ = _coalesce_for_join(dist)

    for _ in range(max_hops):
        prop = edges.join(
            dist,
            join_type="inner",
            num_partitions=nparts,
            on=(src_column,),
            right_on=(node_column,),
        )

        def step(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    node_column: batch[dst_column],
                    "dist": pc.add(batch["dist"], pa.scalar(1, pa.int64())),
                }
            )

        cand = prop.map_batches(step, batch_format="pyarrow")
        dist = (
            dist.union(cand)
            .groupby(node_column)
            .aggregate(Min("dist", alias_name="dist"))
        )
        dist, _ = _coalesce_for_join(dist)

    return dist


# -------------------------------------------------- host-level link graph

_HOST_RE = None  # compiled lazily so the module imports without re cost


def _host_of(url: str) -> str:
    global _HOST_RE
    if _HOST_RE is None:
        import re

        _HOST_RE = re.compile(r"https://([^/]+)")
    m = _HOST_RE.match(url or "")
    return m.group(1) if m else ""


def host_graph(links, *, num_partitions: int = 16):
    """Collapse the page-level link table (src_url, href) to the
    host→host graph: one row per directed host edge with

    - ``n_links``: link occurrences (after extract's first-wins
      per-page dedup),
    - ``n_src_pages``: distinct linking pages,
    - ``reciprocal``: the reverse edge exists (the hallmark signal for
      link-exchange/spam-farm detection and crawl scheduling).

    Scale shape: per-batch Counter pre-aggregation emits
    (src_host, dst_host, src_url, partial-count) rows — the shuffle
    carries at most one row per (edge, page, block), never one per
    link.  The host-edge table (≤ hosts²) then joins onto its own
    key-swapped self for reciprocity — a bounded hash join, no driver
    materialization."""
    from collections import Counter

    from ray.data.aggregate import Count, Sum

    from .dedup import _coalesce_for_join, _join_partitions, hash_join_safe

    def explode(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for su, href in zip(
            batch["src_url"].to_pylist(), batch["href"].to_pylist()
        ):
            c[(_host_of(su), _host_of(href), su)] += 1
        sh, dh, su, cnt = [], [], [], []
        for (a, b, u), n in c.items():
            sh.append(a)
            dh.append(b)
            su.append(u)
            cnt.append(n)
        return pa.table(
            {
                "src_host": pa.array(sh, pa.string()),
                "dst_host": pa.array(dh, pa.string()),
                "src_url": pa.array(su, pa.string()),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    per_page = (
        links.map_batches(explode, batch_format="pyarrow")
        .groupby(["src_host", "dst_host", "src_url"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    edges = (
        per_page.groupby(["src_host", "dst_host"])
        .aggregate(
            Sum("cnt", alias_name="n_links"),
            Count(alias_name="n_src_pages"),
        )
    )
    edges, _ = _coalesce_for_join(edges)

    rev = edges.select_columns(["src_host", "dst_host"]).map_batches(
        lambda b: pa.table(
            {"r_src": b["dst_host"], "r_dst": b["src_host"], "has_rev": pa.array([True] * b.num_rows, pa.bool_())}
        ),
        batch_format="pyarrow",
    )
    joined = hash_join_safe(
        edges,
        rev,
        on=("src_host", "dst_host"),
        right_on=("r_src", "r_dst"),
        join_type="left_outer",
        num_partitions=_join_partitions(num_partitions),
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "src_host": batch["src_host"],
                "dst_host": batch["dst_host"],
                "n_links": batch["n_links"],
                "n_src_pages": batch["n_src_pages"],
                "reciprocal": pc.coalesce(batch["has_rev"], False),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


# ----------------------------------------------------- crawl-trap signal


def trap_detect(
    links,
    *,
    min_urls: int = 20,
    ratio: int = 19,
    num_partitions: int = 16,
):
    """Crawl-trap detection: hosts whose discovered URLs collapse into
    few digit-templates (calendar pages, session ids, infinite
    pagination — the classic frontier-explosion traps a production
    crawler must throttle).  ``template = href with every digit run
    replaced by 'N'``; a host is ``trap_suspect`` when it has at least
    ``min_urls`` distinct URLs and ``n_urls >= ratio * n_templates``
    (integer cross-multiplication — no float division).

    Output one row per host:
    ``(host, n_urls, n_templates, max_per_template, trap_suspect)``.

    Scale shape: per-batch set pre-aggregation emits distinct
    (host, template, href) rows; then two groupbys —
    (host, template) count → host sum/count/max.  No joins, no driver
    state, shuffles carry only template-level rows."""
    import re as _re

    from ray.data.aggregate import Count, Max, Sum

    digit_re = _re.compile(r"[0-9]+")
    host_re = _re.compile(r"https://([^/]+)")

    def explode(batch: pa.Table) -> pa.Table:
        seen = set()
        for h in batch["href"].to_pylist():
            m = host_re.match(h or "")
            host = m.group(1) if m else ""
            seen.add((host, digit_re.sub("N", h or ""), h))
        hosts, tmpls, hrefs = [], [], []
        for host, t, h in seen:
            hosts.append(host)
            tmpls.append(t)
            hrefs.append(h)
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "template": pa.array(tmpls, pa.string()),
                "href": pa.array(hrefs, pa.string()),
            }
        )

    per_template = (
        links.map_batches(explode, batch_format="pyarrow")
        .groupby(["host", "template", "href"])
        .aggregate(Count(alias_name="dup"))  # collapses cross-block dups
        .groupby(["host", "template"])
        .aggregate(Count(alias_name="n_urls_t"))
    )
    per_host = per_template.groupby("host").aggregate(
        Sum("n_urls_t", alias_name="n_urls"),
        Count(alias_name="n_templates"),
        Max("n_urls_t", alias_name="max_per_template"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        suspect = pc.and_(
            pc.greater_equal(batch["n_urls"], min_urls),
            pc.greater_equal(
                batch["n_urls"], pc.multiply(batch["n_templates"], ratio)
            ),
        )
        return pa.table(
            {
                "host": batch["host"],
                "n_urls": batch["n_urls"],
                "n_templates": batch["n_templates"],
                "max_per_template": batch["max_per_template"],
                "trap_suspect": suspect,
            }
        )

    return per_host.map_batches(finish, batch_format="pyarrow")


# ------------------------------------------------------ triangle counting


def host_triangles(links, *, n_buckets: int = 32, num_partitions: int = 16):
    """Per-host triangle counts over the undirected host graph — the
    local-clustering signal behind link-farm and community detection
    (a spam farm is a dense near-clique; an organic hub has low
    closure).  Output one row per host appearing in at least one
    triangle: ``(host, n_triangles)``.

    Algorithm (Cohen 2009 / Suri-Vassilvitskii 2011, the MapReduce
    standard): orient every undirected edge from its lower-degree
    endpoint to its higher-degree one ((degree, host) total order, so
    orientation is deterministic), generate wedges only at each edge's
    SOURCE — per node that is O(out-degree²) where out-degree is
    bounded by ~√(2m) under degree orientation, the classic guarantee
    that caps the hub-skew quadratic — then one hash join of wedge
    candidates against the oriented edge set.  Each triangle is found
    exactly once (at its lowest-degree vertex).

    Scale shape: distinct-edge and degree tables come from combiner
    groupbys; orientation is two bounded hash joins (degrees onto edge
    endpoints); wedge generation groups by a MIXED HASH BUCKET of the
    source (``n_buckets`` fat groups, not per-host groups — no
    tiny-group pandas tax, hub hosts spread by the mixing hash only
    across, never within, buckets but their wedge count is already
    √m-capped); the final count is a per-batch Counter combiner into a
    host groupby.  Nothing corpus-sized touches the driver."""
    import hashlib

    from ray.data.aggregate import Count, Sum

    from .dedup import _coalesce_for_join, _join_partitions, hash_join_safe

    nparts = _join_partitions(num_partitions)

    def to_undirected(batch: pa.Table) -> pa.Table:
        seen = set()
        for su, href in zip(
            batch["src_url"].to_pylist(), batch["href"].to_pylist()
        ):
            a, b = _host_of(su), _host_of(href)
            if a and b and a != b:
                seen.add((min(a, b), max(a, b)))
        return pa.table(
            {
                "a": pa.array([x for x, _ in seen], pa.string()),
                "b": pa.array([y for _, y in seen], pa.string()),
            }
        )

    edges = (
        links.map_batches(to_undirected, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="dup"))
        .select_columns(["a", "b"])
        .materialize()
    )

    def endpoints(batch: pa.Table) -> pa.Table:
        hosts = batch["a"].to_pylist() + batch["b"].to_pylist()
        return pa.table({"host": pa.array(hosts, pa.string())})

    degrees = (
        edges.map_batches(endpoints, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Count(alias_name="deg"))
    )
    degrees, _ = _coalesce_for_join(degrees)

    with_da = hash_join_safe(
        edges, degrees, on=("a",), right_on=("host",), join_type="inner",
        num_partitions=nparts,
    ).rename_columns({"deg": "deg_a"})
    with_deg = hash_join_safe(
        with_da, degrees, on=("b",), right_on=("host",), join_type="inner",
        num_partitions=nparts,
    ).rename_columns({"deg": "deg_b"})

    def orient(batch: pa.Table) -> pa.Table:
        src, dst, ddeg = [], [], []
        for a, b, da, db in zip(
            batch["a"].to_pylist(),
            batch["b"].to_pylist(),
            batch["deg_a"].to_pylist(),
            batch["deg_b"].to_pylist(),
        ):
            if (da, a) < (db, b):
                src.append(a), dst.append(b), ddeg.append(db)
            else:
                src.append(b), dst.append(a), ddeg.append(da)
        h = [
            int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % n_buckets
            for s in src
        ]
        return pa.table(
            {
                "src": pa.array(src, pa.string()),
                "dst": pa.array(dst, pa.string()),
                "deg_dst": pa.array(ddeg, pa.int64()),
                "_bucket": pa.array(h, pa.int32()),
            }
        )

    oriented = with_deg.map_batches(orient, batch_format="pyarrow").materialize()

    def wedges(df):
        import numpy as np
        import pandas as pd

        out_v, out_w, out_u = [], [], []
        # out-neighbors sorted by the SAME (degree, host) total order
        # as the orientation, so a closing edge v—w is oriented v→w
        df = df.sort_values(["src", "deg_dst", "dst"], kind="stable")
        for u, g in df.groupby("src", sort=False):
            vs = g["dst"].to_numpy()
            if len(vs) < 2:
                continue
            i, j = np.triu_indices(len(vs), k=1)
            out_u.append(np.full(len(i), u, dtype=object))
            out_v.append(vs[i])
            out_w.append(vs[j])
        if not out_u:
            return pd.DataFrame({"u": pd.Series(dtype=object), "v": pd.Series(dtype=object), "w": pd.Series(dtype=object)})
        return pd.DataFrame(
            {
                "u": np.concatenate(out_u),
                "v": np.concatenate(out_v),
                "w": np.concatenate(out_w),
            }
        )

    cands = oriented.groupby("_bucket").map_groups(
        wedges, batch_format="pandas"
    ).materialize()
    if cands.count() == 0:
        # a triangle-free graph yields zero wedge survivors; the empty
        # dataset carries no schema and would crash the Acero join
        from .dedup import _empty_dataset

        return _empty_dataset({"host": pa.string(), "n_triangles": pa.int64()})

    closed = hash_join_safe(
        cands,
        oriented.select_columns(["src", "dst"]),
        on=("v", "w"),
        right_on=("src", "dst"),
        join_type="inner",
        num_partitions=nparts,
    )

    def per_host_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for col in ("u", "v", "w"):
            for h in batch[col].to_pylist():
                c[h] += 1
        return pa.table(
            {
                "host": pa.array(list(c.keys()), pa.string()),
                "n_part": pa.array(list(c.values()), pa.int64()),
            }
        )

    return (
        closed.map_batches(per_host_partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Sum("n_part", alias_name="n_triangles"))
    )
