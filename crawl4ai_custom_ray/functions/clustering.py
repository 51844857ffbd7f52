"""Distributed Lloyd k-means over an embedding column — the iterative
broadcast-and-combine ML shape (centroid fit for IVF indexes, SemDeDup
buckets, data-mixture clustering) as BSP rounds on Ray Data.

Per iteration: the k×d centroid matrix is ``ray.put`` ONCE and read by
every assignment task (broadcast, never re-shipped per batch); each
block computes distances with one integer matmul and emits k×d partial
``(cluster, dim, sum, count)`` rows — the combiner — so the shuffle
per round moves O(k·d·blocks) rows, never the corpus.  The reduced
k×d table is tiny and bounded, so collecting it to the driver between
rounds is scale-safe (same pattern as the knn top-k merge).

Arithmetic is FIXED-POINT INTEGER (floor(value·10^6)) end-to-end:
integer sums are order-free, argmin ties break to the smallest
centroid id, and centroid updates use floor division — so the
assignment is bit-identical at any parallelism and an exact DuckDB
chained-CTE oracle can replay it (same convention as the pagerank
kernel, ``functions/graph.py``).

Empty-cluster rule (documented contract, mirrored by the oracle): a
centroid that attracts no points simply disappears from the next
round's centroid set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _int_vectors(batch: pa.Table, vector_column: str, scale: int) -> np.ndarray:
    arr = batch[vector_column]
    if arr.num_chunks == 1:
        chunk = arr.chunk(0)
    else:
        chunk = arr.combine_chunks()
    flat = chunk.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    mat = np.floor(flat * scale).astype(np.int64)
    return mat.reshape(len(chunk), -1)


def _assign(mat: np.ndarray, cents_m: np.ndarray) -> np.ndarray:
    # ||x-c||² = ||x||² - 2x·c + ||c||²; int64 throughout (d·max²
    # ≈ 64·(1.2e6)² ≈ 9e13 ≪ 2^63).  np.argmin takes the FIRST
    # minimum → ties break to the smallest cid (cids ascending).
    x2 = np.einsum("ij,ij->i", mat, mat)[:, None]
    c2 = np.einsum("ij,ij->i", cents_m, cents_m)[None, :]
    d2 = x2 - 2 * (mat @ cents_m.T) + c2
    return np.argmin(d2, axis=1)


def kmeans_lloyd(
    embeddings,
    *,
    k: int = 8,
    iters: int = 2,
    scale: int = 1_000_000,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
):
    """Fixed-iteration Lloyd k-means.  Init: the rows with the ``k``
    smallest ids (their ids become the cluster labels).  Returns a
    Dataset ``(id_column, cluster)`` with the assignment after
    ``iters`` centroid updates."""
    import ray

    ds, cids, cents = _kmeans_fit(
        embeddings,
        k=k,
        iters=iters,
        scale=scale,
        id_column=id_column,
        vector_column=vector_column,
    )
    final_ref = ray.put((cids, cents))

    def finalize(batch: pa.Table) -> pa.Table:
        c_ids, c_m = ray.get(final_ref)
        mat = _int_vectors(batch, vector_column, scale)
        lab = _assign(mat, c_m)
        return pa.table(
            {
                id_column: batch[id_column],
                "cluster": pa.array(c_ids[lab], pa.int64()),
            }
        )

    return ds.map_batches(finalize, batch_format="pyarrow")


def _kmeans_fit(
    embeddings,
    *,
    k: int,
    iters: int,
    scale: int,
    id_column: str,
    vector_column: str,
):
    """The Lloyd fit loop: returns (materialized input, centroid ids,
    k×d centroid matrix after ``iters`` updates) — shared by the
    assignment and medoid-selection operators."""
    import ray
    import ray.data  # noqa: F401  (Dataset ops on the input)
    from ray.data.aggregate import Sum

    ds = embeddings.select_columns([id_column, vector_column]).materialize()

    seed_rows = sorted(
        ds.filter(expr=f"{id_column} < {k}").take_all(),
        key=lambda r: r[id_column],
    )
    if not seed_rows:
        raise ValueError(f"no rows with {id_column} < {k} to seed centroids")
    cids = np.array([r[id_column] for r in seed_rows], dtype=np.int64)
    cents = np.stack(
        [
            np.floor(np.asarray(r[vector_column], dtype=np.float64) * scale)
            .astype(np.int64)
            for r in seed_rows
        ]
    )

    for _ in range(iters):
        ref = ray.put((cids, cents))

        def partial(batch: pa.Table) -> pa.Table:
            c_ids, c_m = ray.get(ref)
            mat = _int_vectors(batch, vector_column, scale)
            lab = _assign(mat, c_m)
            out_c, out_d, out_s, out_n = [], [], [], []
            for j, cid in enumerate(c_ids):
                m = lab == j
                n = int(m.sum())
                if n == 0:
                    continue
                s = mat[m].sum(axis=0)
                d = mat.shape[1]
                out_c.extend([int(cid)] * d)
                out_d.extend(range(d))
                out_s.extend(int(v) for v in s)
                out_n.extend([n] * d)
            return pa.table(
                {
                    "cid": pa.array(out_c, pa.int64()),
                    "dim": pa.array(out_d, pa.int32()),
                    "psum": pa.array(out_s, pa.int64()),
                    "pn": pa.array(out_n, pa.int64()),
                }
            )

        reduced = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["cid", "dim"])
            .aggregate(Sum("psum", alias_name="s"), Sum("pn", alias_name="n"))
            .take_all()  # k×d rows — bounded by the model, not the data
        )
        by_cid: dict[int, dict[int, tuple[int, int]]] = {}
        for r in reduced:
            by_cid.setdefault(r["cid"], {})[r["dim"]] = (r["s"], r["n"])
        new_cids, new_rows = [], []
        for cid in sorted(by_cid):
            dims = by_cid[cid]
            row = np.array(
                [dims[d][0] for d in sorted(dims)], dtype=np.int64
            ) // np.array([dims[d][1] for d in sorted(dims)], dtype=np.int64)
            new_cids.append(cid)
            new_rows.append(row)
        cids = np.array(new_cids, dtype=np.int64)
        cents = np.stack(new_rows)

    return ds, cids, cents


def kmeans_medoids(
    embeddings,
    *,
    k: int = 8,
    iters: int = 2,
    scale: int = 1_000_000,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    num_partitions: int = 2,
):
    """Per-cluster medoid selection after the Lloyd fit: for each
    final cluster, the vector with the smallest squared distance to
    its centroid (ties → smallest id) — the prototype/exemplar pick
    used for cluster labeling, SemDeDup representative choice, and
    coreset-style data selection.  Returns (cluster, medoid_id, d2).

    Exact distributed argmin without per-cluster groups: each block's
    combiner emits one candidate row per cluster it contains (min
    (d2, id) lexicographically — a masked row can never be the global
    min), then groupby-min over d2, a join back on (cluster, d2), and
    a groupby-min over id break ties.  Shuffles carry O(k·blocks)
    fixed-width rows."""
    import ray
    from ray.data.aggregate import Min

    from .dedup import _coalesce_for_join, _join_partitions, hash_join_safe

    ds, cids, cents = _kmeans_fit(
        embeddings,
        k=k,
        iters=iters,
        scale=scale,
        id_column=id_column,
        vector_column=vector_column,
    )
    ref = ray.put((cids, cents))

    def block_candidates(batch: pa.Table) -> pa.Table:
        c_ids, c_m = ray.get(ref)
        mat = _int_vectors(batch, vector_column, scale)
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        x2 = np.einsum("ij,ij->i", mat, mat)[:, None]
        c2 = np.einsum("ij,ij->i", c_m, c_m)[None, :]
        dall = x2 - 2 * (mat @ c_m.T) + c2
        lab = np.argmin(dall, axis=1)
        dmin = dall[np.arange(len(lab)), lab]
        out_c, out_i, out_d = [], [], []
        for j in np.unique(lab):
            m = lab == j
            best = dmin[m].min()
            tie = m & (dmin == best)
            out_c.append(int(c_ids[j]))
            out_i.append(int(ids[tie].min()))
            out_d.append(int(best))
        return pa.table(
            {
                "cluster": pa.array(out_c, pa.int64()),
                id_column: pa.array(out_i, pa.int64()),
                "d2": pa.array(out_d, pa.int64()),
            }
        )

    cand = ds.map_batches(block_candidates, batch_format="pyarrow")
    cand, _ = _coalesce_for_join(cand)

    best_d = cand.groupby("cluster").aggregate(Min("d2", alias_name="d2"))
    best_d, _ = _coalesce_for_join(best_d)

    at_min = hash_join_safe(
        cand,
        best_d,
        on=("cluster", "d2"),
        right_on=("cluster", "d2"),
        join_type="inner",
        num_partitions=_join_partitions(num_partitions),
    )
    return (
        at_min.groupby(["cluster", "d2"])
        .aggregate(Min(id_column, alias_name="medoid_id"))
        .select_columns(["cluster", "medoid_id", "d2"])
    )
