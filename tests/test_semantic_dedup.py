"""SemDeDup unit tests: planted near-duplicates are dropped (min-id
representative kept), orthogonal vectors survive, and the max_cluster
hot-bucket guard disarms over-cap clusters."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from crawl4ai_custom_ray.functions.similarity import semantic_dedup


def _ds(vecs):
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs],
                    pa.list_(pa.float32()),
                ),
            }
        )
    ).repartition(2)


def test_planted_dups_dropped_min_id_kept(ray_session):
    rng = np.random.RandomState(7)
    base = rng.standard_normal((10, 16))
    # ids 8/9 near-duplicate ids 2/3 (tiny perturbation)
    vecs = list(base)
    vecs[8] = base[2] + 1e-3
    vecs[9] = base[3] + 1e-3
    out = {r["vec_id"]: r for r in semantic_dedup(
        _ds(vecs), threshold=0.95, n_clusters=4
    ).take_all()}
    assert len(out) == 10
    assert out[2]["keep"] and out[3]["keep"]  # min-id representatives
    assert not out[8]["keep"] and not out[9]["keep"]
    # dup pairs land in the same cluster (same direction → same argmax)
    assert out[8]["cluster"] == out[2]["cluster"]


def test_orthogonal_vectors_all_kept(ray_session):
    vecs = list(np.eye(6))
    out = semantic_dedup(_ds(vecs), threshold=0.5, n_clusters=3).take_all()
    assert len(out) == 6
    assert all(r["keep"] for r in out)


def test_max_cluster_guard_drops_nothing_when_over_cap(ray_session):
    # every vector identical → one mega-cluster; capped verify skips it
    vecs = [np.ones(8)] * 12
    out = semantic_dedup(
        _ds(vecs), threshold=0.9, n_clusters=2, max_cluster=5
    ).take_all()
    assert len(out) == 12
    assert all(r["keep"] for r in out)
    # and without the cap, only vec 0 survives
    out2 = {r["vec_id"]: r["keep"] for r in semantic_dedup(
        _ds(vecs), threshold=0.9, n_clusters=2
    ).take_all()}
    assert out2[0] and not any(out2[i] for i in range(1, 12))
