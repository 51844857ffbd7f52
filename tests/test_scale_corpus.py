"""The scaled-corpus generator behind scripts/scale_validation.py:
deterministic amplification with replica-bijective token perturbation
(within-replica similarity preserved, cross-replica similarity ~0) and
streaming Ray page generation matching the base generator's output."""

import os

import pyarrow.parquet as pq
import pytest

from crawl4ai_custom_ray.sources.scale import (
    scale_dir_for,
    scaled_documents_dir,
    scaled_pages_dir,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def scaled(tmp_path_factory, ray_session, monkeypatch_module):
    # redirect the cache root so tests never collide with real runs
    import crawl4ai_custom_ray.sources.scale as scale_mod

    root = str(tmp_path_factory.mktemp("scale_cache"))
    monkeypatch_module.setattr(scale_mod, "SCALE_CACHE_ROOT", root)
    sdir = scaled_documents_dir(SF, replicas=3)
    pdir = scaled_pages_dir(sdir)
    return sdir, pdir


@pytest.fixture(scope="module")
def monkeypatch_module():
    from _pytest.monkeypatch import MonkeyPatch

    mp = MonkeyPatch()
    yield mp
    mp.undo()


def test_documents_amplified(scaled):
    sdir, _ = scaled
    base = pq.read_table(os.path.join(SF, "documents.parquet"))
    t = pq.read_table(os.path.join(sdir, "documents.parquet"))
    n_base = base.num_rows
    assert t.num_rows == 3 * n_base
    assert sorted(t.column_names) == sorted(base.column_names)
    ids = set(t["doc_id"].to_pylist())
    assert ids == set(range(3 * n_base))

    by_id = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    base_by_id = dict(zip(base["doc_id"].to_pylist(), base["text"].to_pylist()))
    d0 = min(base_by_id)
    # replica 0 is pristine
    assert by_id[d0] == base_by_id[d0]
    # replica r>0 is a token bijection: same token count, every token
    # suffixed, zero vocabulary overlap with the base
    t2 = by_id[2 * n_base + d0]
    toks0, toks2 = base_by_id[d0].split(), t2.split()
    assert len(toks0) == len(toks2)
    assert all(b == f"{a}r2" for a, b in zip(toks0, toks2))
    assert not set(toks0) & set(toks2)
    # within-replica Jaccard preserved exactly under the bijection
    d1 = sorted(base_by_id)[1]
    s_a0, s_b0 = set(base_by_id[d0].split()), set(base_by_id[d1].split())
    s_a2 = set(by_id[2 * n_base + d0].split())
    s_b2 = set(by_id[2 * n_base + d1].split())
    j0 = len(s_a0 & s_b0) / len(s_a0 | s_b0)
    j2 = len(s_a2 & s_b2) / len(s_a2 | s_b2)
    assert j0 == j2


def test_pages_match_base_generator(scaled):
    """The streamed Ray page generation must reproduce the base
    generator byte-for-byte on the pristine replica's rows."""
    import glob

    from crawl4ai_custom_ray.sources.pages import build_page_html, page_url

    sdir, pdir = scaled
    parts = sorted(glob.glob(os.path.join(pdir, "*.parquet")))
    assert parts
    t = pq.read_table(parts[0] if len(parts) == 1 else pdir)
    n = t.num_rows
    docs = pq.read_table(os.path.join(sdir, "documents.parquet"))
    assert n == docs.num_rows
    assert sorted(t.column_names) == sorted(
        ["url", "warc_ts", "html", "text", "lang"]
    )
    by_url = dict(zip(t["url"].to_pylist(), t["html"].to_pylist()))
    texts = dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))
    for i in [0, 1, n - 1]:
        u = page_url(i, n)
        body = " ".join(texts[i].split())
        assert by_url[u] == build_page_html(i, n, body).encode("utf-8"), u


def test_generation_is_idempotent(scaled):
    sdir, pdir = scaled
    assert scaled_documents_dir(SF, replicas=3) == sdir
    assert scaled_pages_dir(sdir) == pdir


def test_embeddings_amplified_signed_permutation(monkeypatch_module, tmp_path_factory):
    """scaled_embeddings_dir: replica count and ids check out; a
    signed permutation is orthogonal, so WITHIN a replica every cosine
    similarity must match the base table exactly (float64), while
    cross-replica vectors decorrelate."""
    import numpy as np

    import crawl4ai_custom_ray.sources.scale as scale_mod
    from crawl4ai_custom_ray.sources.scale import scaled_embeddings_dir

    root = str(tmp_path_factory.mktemp("emb_cache"))
    monkeypatch_module.setattr(scale_mod, "SCALE_CACHE_ROOT", root)
    out = scaled_embeddings_dir(SF, replicas=3)
    t = pq.read_table(out)
    base = pq.read_table(os.path.join(SF, "embeddings.parquet"))
    n_base = base.num_rows
    assert t.num_rows == 3 * n_base
    assert set(t["vec_id"].to_pylist()) == set(range(3 * n_base))

    def mat(tbl, lo, hi):
        ids = np.asarray(tbl["vec_id"].to_pylist())
        m = np.asarray(
            [list(v) for v in tbl["embedding"].to_pylist()], dtype=np.float64
        )
        sel = (ids >= lo) & (ids < hi)
        order = np.argsort(ids[sel])
        return m[sel][order]

    def cos(m):
        n = m / np.linalg.norm(m, axis=1, keepdims=True)
        return n @ n.T

    b = mat(base, 0, n_base)[:50]
    base_cos = cos(b)
    for r in (1, 2):
        m_r = mat(t, r * n_base, r * n_base + 50)
        # within-replica structure preserved exactly
        assert np.allclose(cos(m_r), base_cos, atol=1e-6)
    # cross-replica: replica-1 vector 0 is NOT a near-dup of base 0
    m1 = mat(t, n_base, n_base + 1)[0]
    sim = float(
        (b[0] / np.linalg.norm(b[0])) @ (m1 / np.linalg.norm(m1))
    )
    assert sim < 0.99

    # idempotent cache
    assert scaled_embeddings_dir(SF, replicas=3) == out


def test_events_amplified_disjoint_users(monkeypatch_module, tmp_path_factory):
    """scaled_events_dir: replica r shifts event ids by r·n_base and
    user ids by r·(max_user+1) — disjoint user populations, each with
    the base table's exact per-user time series."""
    import pyarrow.compute as pc

    import crawl4ai_custom_ray.sources.scale as scale_mod
    from crawl4ai_custom_ray.sources.scale import scaled_events_dir

    root = str(tmp_path_factory.mktemp("scale_cache_ev"))
    monkeypatch_module.setattr(scale_mod, "SCALE_CACHE_ROOT", root)

    out = scaled_events_dir(SF, replicas=3)
    t = pq.read_table(out)
    base = pq.read_table(os.path.join(SF, "events.parquet"))
    n_base = base.num_rows
    assert t.num_rows == 3 * n_base

    user_span = int(pc.max(base["user_id"]).as_py()) + 1
    base_pd = base.to_pandas().sort_values("event_id").reset_index(drop=True)
    full = t.to_pandas().sort_values("event_id").reset_index(drop=True)
    for r in range(3):
        rep = full.iloc[r * n_base : (r + 1) * n_base].reset_index(drop=True)
        assert (rep["event_id"] == base_pd["event_id"] + r * n_base).all()
        assert (rep["user_id"] == base_pd["user_id"] + r * user_span).all()
        # time series byte-identical per replica
        assert (rep["ts"] == base_pd["ts"]).all()
        assert (rep["event_type"] == base_pd["event_type"]).all()
        assert (rep["value"] == base_pd["value"]).all()
    # user populations disjoint across replicas
    for r in range(1, 3):
        lo = full.iloc[(r - 1) * n_base : r * n_base]["user_id"]
        hi = full.iloc[r * n_base : (r + 1) * n_base]["user_id"]
        assert set(lo).isdisjoint(set(hi))
    # idempotent cache
    assert scaled_events_dir(SF, replicas=3) == out
