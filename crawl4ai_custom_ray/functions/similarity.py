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
    flat = chunk.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(chunk)
    return flat.reshape(n, -1)


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
):
    """Exact cosine top-k neighbors for each query vector.

    Per-batch: matmul (queries × batch) → per-batch top-k partials →
    final tiny top-k merge on the driver (k × n_queries rows).
    Returns a pyarrow Table (query_id, neighbor_id, sim)."""
    qm = _normalize(np.asarray(query_vectors, dtype=np.float64))
    q_ref = ray.put(qm)

    def partial_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        m = _normalize(_matrix(batch, vector_column))
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


def cosine_neardup_pairs(
    ds,
    *,
    threshold: float,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
):
    """All pairs (a < b) with cosine similarity ≥ threshold — the
    embedding-space near-duplicate detector.

    Exact all-pairs via broadcast: the normalized corpus matrix is
    ``ray.put`` once, each batch matmuls against it (O(N²/batches)
    work, no shuffle).  At 100 TB scale the broadcast side is replaced
    by IVF buckets (see :func:`knn_ivf`) so only same-bucket pairs are
    scored."""
    import pandas as pd

    full = ds.select_columns([id_column, vector_column]).to_pandas()
    full = full.sort_values(id_column)
    ids = np.asarray(full[id_column], dtype=np.int64)
    mat = _normalize(
        np.asarray([np.asarray(v, dtype=np.float64) for v in full[vector_column]])
    )
    ref = ray.put((ids, mat))

    def pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        b_ids = np.asarray(batch[id_column].to_pylist(), dtype=np.int64)
        b_mat = _normalize(_matrix(batch, vector_column))
        sims = b_mat @ all_mat.T
        a_out, b_out, s_out = [], [], []
        for i in range(len(b_ids)):
            row = sims[i]
            hits = np.nonzero(row >= threshold)[0]
            for j in hits:
                if b_ids[i] < all_ids[j]:
                    a_out.append(int(b_ids[i]))
                    b_out.append(int(all_ids[j]))
                    s_out.append(round(float(row[j]), 4))
        return pa.table(
            {
                "a": pa.array(a_out, pa.int64()),
                "b": pa.array(b_out, pa.int64()),
                "sim": pa.array(s_out, pa.float64()),
            }
        )

    return ds.map_batches(pairs, batch_format="pyarrow")


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
