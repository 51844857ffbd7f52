"""Similarity search over embedding columns.

- :func:`knn_brute_force` — exact cosine top-k: the query matrix is
  ``ray.put`` once; each batch does one numpy matmul against it.
  Scales linearly in corpus size with zero shuffle (the scan streams).
- :func:`knn_ivf` — IVF-style scale path: k-means-lite centroids
  (deterministic seeded init, few Lloyd iterations on a sample),
  assign each vector to its nearest centroid (one pass), then search
  only the ``n_probe`` closest centroid buckets per query.  Trades
  recall for a ~n_clusters/n_probe scan reduction; the bucket
  assignment reuses one hash-partition shuffle.

Embeddings arrive as Arrow ``list<float>`` columns; batches convert
zero-copy to a 2-D float64 numpy matrix for the kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def _matrix(batch: pa.Table, column: str) -> np.ndarray:
    arr = batch[column]
    if arr.num_chunks == 1:
        chunk = arr.chunk(0)
    else:
        chunk = arr.combine_chunks()
    if chunk.null_count:
        # flatten() silently drops null entries, which would misalign
        # ids with vectors (or reshape to a wrong width when the count
        # happens to divide) — refuse loudly instead
        raise ValueError(
            f"{column!r} contains {chunk.null_count} null embedding(s); "
            "filter or impute them before similarity ops"
        )
    flat = chunk.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(chunk)
    return flat.reshape(n, -1)


_PLANES_MEMO: dict = {}


def _planes_memo(seed: int, dim: int, n_planes: int) -> np.ndarray:
    """Per-process random-hyperplane cache — deterministic in
    (seed, dim, n_planes), so every worker builds identical planes."""
    key = (seed, dim, n_planes)
    p = _PLANES_MEMO.get(key)
    if p is None:
        rng = np.random.RandomState(seed)
        p = _PLANES_MEMO[key] = rng.standard_normal((dim, n_planes))
    return p


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def knn_brute_force(
    ds,
    query_vectors: np.ndarray,
    query_ids: list[int],
    *,
    k: int = 10,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    exclude_self: bool = True,
    metric: str = "cosine",
):
    """Exact top-k neighbors for each query vector under ``metric``
    ("cosine" or "dot" — dot skips the normalization, ranking by raw
    inner product).

    Per-batch: matmul (queries × batch) → per-batch top-k partials →
    final tiny top-k merge on the driver (k × n_queries rows).
    Returns a pyarrow Table (query_id, neighbor_id, sim)."""
    if metric not in ("cosine", "dot"):
        raise ValueError(f"unknown metric {metric!r}")
    qm = np.asarray(query_vectors, dtype=np.float64)
    if metric == "cosine":
        qm = _normalize(qm)
    q_ref = ray.put(qm)

    def partial_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        m = _matrix(batch, vector_column)
        if metric == "cosine":
            m = _normalize(m)
        ids = np.asarray(batch[id_column].to_pylist(), dtype=np.int64)
        sims = q @ m.T  # (n_queries, n_batch)
        out_q, out_n, out_s = [], [], []
        kk = min(k + (1 if exclude_self else 0), sims.shape[1])
        for qi in range(sims.shape[0]):
            row = sims[qi]
            idx = np.argpartition(-row, kk - 1)[:kk] if kk < len(row) else np.arange(len(row))
            for j in idx:
                out_q.append(qi)
                out_n.append(int(ids[j]))
                out_s.append(float(row[j]))
        return pa.table(
            {
                "qi": pa.array(out_q, pa.int32()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()

    rows_q, rows_n, rows_s = [], [], []
    for qi, qid in enumerate(query_ids):
        sub = partials[partials["qi"] == qi]
        if exclude_self:
            sub = sub[sub["neighbor_id"] != qid]
        top = sub.nlargest(k, "sim", keep="all").sort_values(
            ["sim", "neighbor_id"], ascending=[False, True]
        ).head(k)
        rows_q.extend([qid] * len(top))
        rows_n.extend(top["neighbor_id"].tolist())
        rows_s.extend(top["sim"].tolist())
    return pa.table(
        {
            "query_id": pa.array(rows_q, pa.int64()),
            "neighbor_id": pa.array(rows_n, pa.int64()),
            "sim": pa.array([round(s, 4) for s in rows_s], pa.float64()),
        }
    )


def _block_pair_table(t1: pa.Table, t2: pa.Table, threshold: float,
                      id_column: str, vector_column: str, same: bool) -> pa.Table:
    ids1 = np.asarray(t1[id_column].to_pylist(), dtype=np.int64)
    ids2 = np.asarray(t2[id_column].to_pylist(), dtype=np.int64)
    a_out, b_out, s_out = [], [], []
    if len(ids1) and len(ids2):
        m1 = _normalize(_matrix(t1, vector_column))
        m2 = _normalize(_matrix(t2, vector_column))
        sims = m1 @ m2.T
        hits = np.nonzero(sims >= threshold)
        for i, j in zip(*hits):
            x, y = int(ids1[i]), int(ids2[j])
            if x == y:
                continue
            if same and x > y:
                continue  # within-block mirror pair
            a, b = (x, y) if x < y else (y, x)
            a_out.append(a)
            b_out.append(b)
            s_out.append(round(float(sims[i, j]), 4))
    return pa.table(
        {
            "a": pa.array(a_out, pa.int64()),
            "b": pa.array(b_out, pa.int64()),
            "sim": pa.array(s_out, pa.float64()),
        }
    )


def cosine_neardup_pairs(
    ds,
    *,
    threshold: float,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    num_blocks: int | None = None,
):
    """All pairs (a < b) with cosine similarity ≥ threshold — the
    embedding-space near-duplicate detector, EXACT.

    Block decomposition: the corpus is repartitioned into B blocks held
    in the object store; each of the B(B+1)/2 block pairs is one task
    that matmuls two blocks (zero-copy reads).  Exact all-pairs is
    inherently O(N²) compute, but memory per task is two blocks and no
    corpus-sized object is ever built on the driver or broadcast.
    Raw ``ray.remote`` tasks because the Dataset API has no
    cross-product of blocks; results return as a Dataset via
    ``from_arrow_refs``.  For the sub-quadratic 100 TB path use
    :func:`cosine_neardup_pairs_lsh`."""
    import ray.data as rd

    prepped = ds.select_columns([id_column, vector_column]).materialize()
    if num_blocks is None:
        # ~16k vectors per block keeps a block pair ≲ a few hundred MB
        # of sims at fp64 while giving ample task parallelism
        num_blocks = max(1, min(32, -(-prepped.count() // 16384)))
    refs = prepped.repartition(num_blocks).materialize().to_arrow_refs()

    @ray.remote
    def block_pair(t1: pa.Table, t2: pa.Table, same: bool) -> pa.Table:
        return _block_pair_table(t1, t2, threshold, id_column, vector_column, same)

    tasks = [
        block_pair.remote(refs[i], refs[j], i == j)
        for i in range(len(refs))
        for j in range(i, len(refs))
    ]
    return rd.from_arrow_refs(tasks)


def _members_agg(id_col: str, vec_col: str, max_members: int | None):
    """AggregateFn packing a group's (id, vector-bytes) members into
    one blob of self-describing records ``[n_vec_bytes:8][id:8][vec]``
    — the bucket-local verify layout shared by the LSH and SemDeDup
    paths.  Accumulator state is a list of PRE-ENCODED bytes
    (Arrow-native between accumulate and merge; (id, bytes) tuples
    would fall back to pickled blocks).  An over-cap group finalizes
    to ``b""`` — the hot-bucket quadratic-blow-up guard (see
    ``dedup._collect_ids_agg``)."""
    from ray.data.aggregate import AggregateFn

    cap = max_members + 1 if max_members is not None else None

    def acc_block(acc, block):
        if cap is not None and len(acc) >= cap:
            return acc
        ids = (
            block[id_col].to_pylist()
            if hasattr(block, "column_names")
            else list(block[id_col])
        )
        vecs = (
            block[vec_col].to_pylist()
            if hasattr(block, "column_names")
            else list(block[vec_col])
        )
        acc.extend(
            len(v).to_bytes(8, "little")
            + int(i).to_bytes(8, "little", signed=True)
            + v
            for i, v in zip(ids, vecs)
        )
        return acc[:cap] if cap is not None else acc

    def finalize(acc):
        if max_members is not None and len(acc) > max_members:
            return b""
        return b"".join(acc)

    return AggregateFn(
        init=lambda k: [],
        accumulate_block=acc_block,
        merge=lambda a, b: (a + b)[:cap] if cap is not None else a + b,
        finalize=finalize,
        name="members",
    )


def _decode_members(blob: bytes) -> tuple[list[int], list[np.ndarray]]:
    """Decode a ``_members_agg`` blob back into (ids, vectors)."""
    ids_l, vecs = [], []
    off = 0
    while off < len(blob):
        nv = int.from_bytes(blob[off : off + 8], "little")
        ids_l.append(int.from_bytes(blob[off + 8 : off + 16], "little", signed=True))
        vecs.append(np.frombuffer(blob, dtype="<f8", count=nv // 8, offset=off + 16))
        off += 16 + nv
    return ids_l, vecs


def cosine_neardup_pairs_lsh(
    ds,
    *,
    threshold: float,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    max_bucket: int | None = None,
):
    """Sub-quadratic near-dup pairs via random-hyperplane LSH: sign
    signatures over ``n_planes`` seeded hyperplanes, banded into
    buckets; bucket groups carry (id, vector) so exact cosine verify is
    bucket-local.  Approximate recall (raise bands/lower rows-per-band
    to trade work for recall); the 100 TB path — work is linear in
    corpus + bucket collisions, like MinHash-LSH for text."""
    from .dedup import _collect_ids_agg  # noqa: F401  (doc cross-ref)

    rows_per_band = n_planes // bands

    def sign_fn(batch: pa.Table) -> pa.Table:
        m = _normalize(_matrix(batch, vector_column))
        # planes built once per worker process (deterministic in
        # (seed, dim, n_planes)) — setup-once without actor spin-up
        planes = _planes_memo(seed, m.shape[1], n_planes)
        bits = (m @ planes) >= 0  # (n, n_planes) sign pattern
        ids = batch[id_column].to_pylist()
        vec_bytes = [m[i].astype("<f8").tobytes() for i in range(len(ids))]
        ids_out, band_out, bucket_out, vec_out = [], [], [], []
        for i, did in enumerate(ids):
            for b in range(bands):
                seg = bits[i, b * rows_per_band : (b + 1) * rows_per_band]
                bucket = int(sum(1 << k for k, v in enumerate(seg) if v))
                ids_out.append(did)
                band_out.append(b)
                bucket_out.append(bucket)
                vec_out.append(vec_bytes[i])
        return pa.table(
            {
                "id": pa.array(ids_out, pa.int64()),
                "band": pa.array(band_out, pa.int32()),
                "bucket": pa.array(bucket_out, pa.int64()),
                "vec": pa.array(vec_out, pa.binary()),
            }
        )

    from ray.data.aggregate import Max

    members_agg = _members_agg("id", "vec", max_bucket)

    def verify_bucket(batch: pa.Table) -> pa.Table:
        a_out, b_out, s_out = [], [], []
        for blob in batch["members"].to_pylist():
            if blob is None or not blob:
                continue
            ids_l, vecs = _decode_members(blob)
            if len(ids_l) < 2:
                continue
            ids = np.asarray(ids_l, dtype=np.int64)
            mat = np.vstack(vecs)
            order = np.argsort(ids)
            ids, mat = ids[order], mat[order]
            keep = np.concatenate(([True], ids[1:] != ids[:-1]))
            ids, mat = ids[keep], mat[keep]
            sims = mat @ mat.T
            hits = np.nonzero(sims >= threshold)
            for i, j in zip(*hits):
                if ids[i] < ids[j]:
                    a_out.append(int(ids[i]))
                    b_out.append(int(ids[j]))
                    s_out.append(round(float(sims[i, j]), 4))
        return pa.table(
            {
                "a": pa.array(a_out, pa.int64()),
                "b": pa.array(b_out, pa.int64()),
                "sim": pa.array(s_out, pa.float64()),
            }
        )

    pairs = (
        ds.select_columns([id_column, vector_column])
        .map_batches(sign_fn, batch_format="pyarrow")
        .groupby(["band", "bucket"])
        .aggregate(members_agg)
        .map_batches(verify_bucket, batch_format="pyarrow")
    )
    # a pair can share several bands — dedup; sim identical so Max is a
    # no-op reducer
    return pairs.groupby(["a", "b"]).aggregate(Max("sim", alias_name="sim"))


def kmeans_lite(
    vectors: np.ndarray, n_clusters: int, *, iters: int = 5, seed: int = 42
) -> np.ndarray:
    """Deterministic small k-means for IVF centroids (seeded init,
    few Lloyd iterations — centroid quality only affects recall)."""
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(vectors), size=min(n_clusters, len(vectors)), replace=False)
    centroids = vectors[np.sort(idx)].copy()
    for _ in range(iters):
        d = vectors @ centroids.T
        assign = np.argmax(d, axis=1)
        for c in range(len(centroids)):
            members = vectors[assign == c]
            if len(members):
                v = members.mean(axis=0)
                norm = np.linalg.norm(v)
                if norm > 0:
                    centroids[c] = v / norm
    return centroids


def knn_ivf(
    ds,
    query_vectors: np.ndarray,
    query_ids: list[int],
    *,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    sample_size: int = 2048,
    seed: int = 42,
):
    """IVF approximate top-k: centroids from a driver-side sample,
    vectors bucketed by nearest centroid (one map pass), queries probe
    the ``n_probe`` nearest buckets."""
    sample = ds.limit(sample_size).to_pandas()
    sm = _normalize(
        np.asarray([np.asarray(v, dtype=np.float64) for v in sample[vector_column]])
    )
    centroids = kmeans_lite(sm, n_clusters, seed=seed)
    c_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        m = _normalize(_matrix(batch, vector_column))
        cluster = np.argmax(m @ c.T, axis=1).astype(np.int32)
        return batch.append_column("cluster", pa.array(cluster, pa.int32()))

    clustered = ds.map_batches(assign, batch_format="pyarrow")

    qm = _normalize(np.asarray(query_vectors, dtype=np.float64))
    probe = np.argsort(-(qm @ centroids.T), axis=1)[:, :n_probe]
    probe_clusters = set(int(c) for row in probe for c in row)

    filtered = clustered.map_batches(
        lambda t, pc_set=frozenset(probe_clusters): t.filter(
            pa.compute.is_in(t["cluster"], value_set=pa.array(list(pc_set), pa.int32()))
        ),
        batch_format="pyarrow",
    )
    return knn_brute_force(
        filtered,
        query_vectors,
        query_ids,
        k=k,
        id_column=id_column,
        vector_column=vector_column,
    )


def knn_lsh(
    ds,
    query_vectors: np.ndarray,
    query_ids: list[int],
    *,
    k: int = 10,
    n_bits: int = 8,
    probe_hamming: int = 1,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    seed: int = 42,
):
    """LSH-bucketed approximate top-k (random-hyperplane signatures,
    Charikar 2002): every vector lands in ONE bucket keyed by the
    ``n_bits`` sign-bit signature of its projections onto seeded
    random hyperplanes; each query probes every bucket within Hamming
    distance ``probe_hamming`` of its own signature, and the probed
    subset goes through the exact brute-force kernel.

    The scale path alongside :func:`knn_ivf`: no training pass at all
    (the hyperplanes are seeded constants, broadcast once), one
    assignment map over the corpus, and the probe filter prunes blocks
    before any matmul.  ``probe_hamming >= n_bits`` probes every
    bucket and so equals exact search — the driver-oracle
    configuration, same convention as ``knn_ivf(n_probe=n_clusters)``.
    Recall at restrictive settings is pytest-verified against
    :func:`knn_brute_force`.
    """
    qm = _normalize(np.asarray(query_vectors, dtype=np.float64))
    dim = qm.shape[1]
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_bits, dim))
    weights = (1 << np.arange(n_bits)).astype(np.int64)
    p_ref = ray.put(planes)

    def assign(batch: pa.Table) -> pa.Table:
        p = ray.get(p_ref)
        m = _normalize(_matrix(batch, vector_column))
        sig = ((m @ p.T) > 0).astype(np.int64) @ weights
        return batch.append_column("bucket", pa.array(sig, pa.int64()))

    bucketed = ds.map_batches(assign, batch_format="pyarrow")

    q_sig = ((qm @ planes.T) > 0).astype(np.int64) @ weights
    all_buckets = np.arange(1 << n_bits, dtype=np.int64)
    probe: set[int] = set()
    for s in q_sig:
        dist = np.array([bin(int(s) ^ int(b)).count("1") for b in all_buckets])
        probe.update(int(b) for b in all_buckets[dist <= probe_hamming])

    filtered = bucketed.map_batches(
        lambda t, pb=frozenset(probe): t.filter(
            pa.compute.is_in(t["bucket"], value_set=pa.array(list(pb), pa.int64()))
        ),
        batch_format="pyarrow",
    )
    return knn_brute_force(
        filtered,
        query_vectors,
        query_ids,
        k=k,
        id_column=id_column,
        vector_column=vector_column,
    )


def semantic_dedup(
    ds,
    *,
    threshold: float,
    n_clusters: int = 8,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    max_cluster: int | None = None,
    num_partitions: int = 8,
):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space, then drop every vector that has a smaller-id
    near-duplicate (cosine ≥ ``threshold``) inside its own cluster →
    ``(vec_id, cluster, keep)``.

    Deterministic-by-construction choices so a SQL oracle can replay
    every bit: centroids are the vectors with ``id < n_clusters``
    (k-means refinement via :func:`kmeans_lite` would move cluster
    QUALITY, not the operator shape), assignment is argmax cosine with
    ties to the smallest centroid id, and the keep rule is
    "min-id-wins" (the same representative rule the exact/minhash
    dedups use) rather than SemDeDup's arbitrary-member choice.

    Scale shape: the centroid matrix (k×d) is the only broadcast
    (``ray.put`` once, read per batch); assignment is one vectorized
    matmul pass; the within-cluster verify reuses the LSH bucket-verify
    layout (pack (id, vec) per cluster group, pairwise matmul per
    blob).  Within-cluster work is quadratic in cluster size — at
    scale pick ``n_clusters ∝ N / target_cluster_size`` (SemDeDup's own
    regime) and/or set ``max_cluster``, the hot-bucket guard the LSH
    paths use (an over-cap cluster then drops nothing).

    Oracle-precision caveat (shared with ``dedup_embedding``): the
    engine computes cosines in float64 while DuckDB's
    ``list_cosine_similarity`` on a ``list<float>`` column returns
    float32, so a pair within float32 rounding of ``threshold`` (or
    two centroid sims within rounding of each other) could flip a
    boolean output between the two sides.  Data-dependent; the
    synthetic corpora keep wide margins (measured min argmax gap
    4e-4 at sf0.01).
    """
    import ray

    from .dedup import _coalesce_for_join, hash_join_safe

    cent_rows = sorted(
        ds.filter(expr=f"{id_column} < {n_clusters}").take_all(),
        key=lambda r: r[id_column],
    )
    if not cent_rows:
        raise ValueError(
            f"semantic_dedup: no centroid rows (need rows with "
            f"{id_column} < {n_clusters})"
        )
    # cluster label = CENTROID ID, not list position: stable under
    # non-contiguous/missing ids and exactly the oracle's cid
    cids = np.asarray([r[id_column] for r in cent_rows], dtype=np.int64)
    cmat = _normalize(
        np.asarray([r[vector_column] for r in cent_rows], dtype=np.float64)
    )
    cref = ray.put((cids, cmat))

    def assign(batch: pa.Table) -> pa.Table:
        cid_arr, c = ray.get(cref)
        m = _normalize(_matrix(batch, vector_column))
        # argmax returns the FIRST maximum and cid_arr is ascending →
        # ties break to min cid, matching ORDER BY sim DESC, cid
        cl = cid_arr[np.argmax(m @ c.T, axis=1)]
        ids = batch[id_column].to_pylist()
        return pa.table(
            {
                id_column: pa.array(ids, pa.int64()),
                "cluster": pa.array(cl, pa.int64()),
                "vec": pa.array(
                    [m[i].astype("<f8").tobytes() for i in range(len(ids))],
                    pa.binary(),
                ),
            }
        )

    asg = ds.select_columns([id_column, vector_column]).map_batches(
        assign, batch_format="pyarrow"
    ).materialize()

    members_agg = _members_agg(id_column, "vec", max_cluster)

    def dropped_in_cluster(batch: pa.Table) -> pa.Table:
        out = []
        for blob in batch["members"].to_pylist():
            if not blob:
                continue
            ids_l, vecs = _decode_members(blob)
            if len(ids_l) < 2:
                continue
            ids = np.asarray(ids_l, dtype=np.int64)
            mat = np.vstack(vecs)
            order = np.argsort(ids)
            ids, mat = ids[order], mat[order]
            sims = mat @ mat.T
            hit_i, hit_j = np.nonzero(sims >= threshold)
            # b dropped when some a < b is near: strict upper triangle
            out.extend(ids[hit_j[hit_i < hit_j]].tolist())
        uniq = sorted(set(out))
        return pa.table(
            {
                "b": pa.array(uniq, pa.int64()),
                # non-key marker: join key columns coalesce in the
                # left_outer output, so null-ness is read off this one
                "is_dup": pa.array([True] * len(uniq), pa.bool_()),
            }
        )

    dropped = (
        asg.groupby("cluster")
        .aggregate(members_agg)
        .map_batches(dropped_in_cluster, batch_format="pyarrow")
    )
    dropped, n_dropped = _coalesce_for_join(dropped)
    keep_all = asg.select_columns([id_column, "cluster"])
    if n_dropped == 0:
        return keep_all.map_batches(
            lambda t: t.append_column(
                "keep", pa.array([True] * t.num_rows, pa.bool_())
            ),
            batch_format="pyarrow",
        )

    def mark(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        flagged = pc.is_valid(batch["is_dup"])
        return pa.table(
            {
                id_column: batch[id_column],
                "cluster": batch["cluster"],
                "keep": pc.invert(flagged),
            }
        )

    joined = hash_join_safe(
        keep_all,
        dropped,
        on=(id_column,),
        right_on=("b",),
        join_type="left_outer",
        num_partitions=num_partitions,
    )
    return joined.map_batches(mark, batch_format="pyarrow")

def knn_rrf(
    ds,
    query_vectors: np.ndarray,
    query_ids: list[int],
    *,
    k: int = 10,
    k_each: int = 20,
    rrf_k: int = 60,
    scale: int = 1_000_000,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
):
    """Reciprocal-rank fusion (Cormack et al. 2009) of two exact
    retrieval rankings — inner product and (negative) squared L2 —
    the standard hybrid-search merge when rankings disagree on scale
    but agree on relevance (the two genuinely diverge whenever vector
    norms vary).  Per query each neighbor scores
    Σ 10⁹ // (rrf_k + rank) over the lists it appears in (top
    ``k_each`` each; absent ⇒ no contribution).

    Both metrics are computed over FIXED-POINT ``floor(v·10⁶)``
    integer vectors (the k-means convention): integer dot products
    and distances are bit-identical across engines, so ranks — and
    therefore the fused scores and the (score desc, id) cutoff — are
    exactly reproducible by the SQL oracle (float cosine ranking is
    ulp-fragile across engines precisely at the near-ties RRF exists
    to arbitrate).

    Scale shape: ONE streaming pass; each block emits the union of
    its per-query top-``k_each`` candidates under either metric (a
    global top-k row is a block top-k row for that metric, so the
    union is lossless); the driver merge and fusion touch only
    O(queries · k_each · blocks) fixed-width rows."""
    import pandas as pd

    qm = np.floor(np.asarray(query_vectors, dtype=np.float64) * scale).astype(
        np.int64
    )
    q_ref = ray.put(qm)
    qid_arr = np.asarray(query_ids, dtype=np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        m = np.floor(_matrix(batch, vector_column) * scale).astype(np.int64)
        ids = np.asarray(batch[id_column].to_pylist(), dtype=np.int64)
        dot = q @ m.T  # (n_queries, n_batch); |v|≤1.2e6 → d·v² ≪ 2^63
        x2 = np.einsum("ij,ij->i", m, m)[None, :]
        q2 = np.einsum("ij,ij->i", q, q)[:, None]
        l2 = x2 - 2 * dot + q2
        out_q, out_n, out_d, out_l = [], [], [], []
        kk = min(k_each + 1, dot.shape[1])  # +1 absorbs a self row
        for qi in range(dot.shape[0]):
            cand = set()
            for row, asc in ((dot[qi], False), (l2[qi], True)):
                key = row if asc else -row
                idx = (
                    np.argpartition(key, kk - 1)[:kk]
                    if kk < len(key)
                    else np.arange(len(key))
                )
                cand.update(int(j) for j in idx)
            for j in sorted(cand):
                out_q.append(qi)
                out_n.append(int(ids[j]))
                out_d.append(int(dot[qi, j]))
                out_l.append(int(l2[qi, j]))
        return pa.table(
            {
                "qi": pa.array(out_q, pa.int32()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "dot": pa.array(out_d, pa.int64()),
                "l2": pa.array(out_l, pa.int64()),
            }
        )

    partials = ds.select_columns([id_column, vector_column]).map_batches(
        partial, batch_format="pyarrow"
    ).to_pandas()

    rows = []
    for qi, qid in enumerate(qid_arr):
        sub = partials[
            (partials["qi"] == qi) & (partials["neighbor_id"] != qid)
        ]
        top_d = sub.sort_values(
            ["dot", "neighbor_id"], ascending=[False, True]
        ).head(k_each)
        top_l = sub.sort_values(
            ["l2", "neighbor_id"], ascending=[True, True]
        ).head(k_each)
        score: dict[int, int] = {}
        for lst in (top_d, top_l):
            for r, nid in enumerate(lst["neighbor_id"].tolist(), start=1):
                score[nid] = score.get(nid, 0) + 10**9 // (rrf_k + r)
        fused = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        rows.extend((int(qid), nid, s) for nid, s in fused)
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "neighbor_id": pa.array([r[1] for r in rows], pa.int64()),
            "rrf_score": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
