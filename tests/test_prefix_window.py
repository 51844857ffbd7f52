"""Unit tests for prefix-filtered exact Jaccard pairs and the
windowed top-k query."""

import itertools

import pyarrow as pa
import pytest
import ray.data as rd

from crawl4ai_custom_ray.functions.dedup import (
    jaccard_prefix_pairs,
    tokenize_words,
    word_shingles,
)


def _brute_pairs(docs, threshold, shingle_n):
    sets = {
        i: (set(tokenize_words(t)) if shingle_n == 1 else word_shingles(t, shingle_n))
        for i, t in docs
    }
    out = set()
    for (a, sa), (b, sb) in itertools.combinations(sorted(sets.items()), 2):
        if not sa or not sb:
            continue
        c = len(sa & sb)
        if c / (len(sa) + len(sb) - c) >= threshold:
            out.add((a, b))
    return out


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),
    (2, "a completely different document about ray data pipelines"),
    (3, "a completely different document about ray data engines"),
    (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (5, "one two three"),
    (6, "unrelated singleton text body here"),
]


@pytest.mark.parametrize("t_num,t_den", [(1, 3), (1, 2), (2, 3)])
@pytest.mark.parametrize("shingle_n", [1, 3])
def test_prefix_pairs_equal_brute_force(ray_session, t_num, t_den, shingle_n):
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in DOCS], pa.int64()),
                "text": pa.array([t for _, t in DOCS], pa.string()),
            }
        )
    ).repartition(3)
    got = {
        (r["a"], r["b"])
        for r in jaccard_prefix_pairs(
            ds, threshold_num=t_num, threshold_den=t_den, shingle_n=shingle_n
        ).take_all()
    }
    assert got == _brute_pairs(DOCS, t_num / t_den, shingle_n)


@pytest.mark.parametrize("t_num,t_den", [(1, 2), (2, 3)])
def test_prefix_pairs_join_route_identical(ray_session, t_num, t_den):
    """Force the distributed route (vocab hash join + per-candidate
    attach joins) by zeroing both broadcast caps: the result set and
    jaccard values must match the default broadcast fast path and the
    brute force exactly."""
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in DOCS], pa.int64()),
                "text": pa.array([t for _, t in DOCS], pa.string()),
            }
        )
    ).repartition(3)
    kw = dict(threshold_num=t_num, threshold_den=t_den, shingle_n=3)
    joined = {
        (r["a"], r["b"], round(r["jaccard"], 12))
        for r in jaccard_prefix_pairs(
            ds, broadcast_vocab_max=0, broadcast_docs_max=0, **kw
        ).take_all()
    }
    fast = {
        (r["a"], r["b"], round(r["jaccard"], 12))
        for r in jaccard_prefix_pairs(ds, **kw).take_all()
    }
    assert joined == fast
    assert {(a, b) for a, b, _ in joined} == _brute_pairs(
        DOCS, t_num / t_den, 3
    )
    # third route: in-bucket verify (attach byte budget zeroed) —
    # the web-scale path that replaces the two per-pair attach joins
    bucketed = {
        (r["a"], r["b"], round(r["jaccard"], 12))
        for r in jaccard_prefix_pairs(
            ds,
            broadcast_vocab_max=0,
            broadcast_docs_max=0,
            verify_attach_bytes_max=0,
            **kw,
        ).take_all()
    }
    assert bucketed == fast


def test_prefix_pairs_empty_result(ray_session):
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["aaa bbb ccc", "xxx yyy zzz"], pa.string()),
            }
        )
    )
    out = jaccard_prefix_pairs(ds, threshold_num=1, threshold_den=2).take_all()
    assert out == []


def test_window_topk_tiebreak(ray_session):
    import datetime as dt

    from crawl4ai_custom_ray.queries import q_window_topk  # noqa: F401 (shape ref)

    # craft events: one hour, counts b=3, a=3, c=2, d=1 → top-3 is
    # a(1), b(2) by type-asc tie-break, then c(3); the delimiter-laden
    # type ("z\x1f\x1ez", count 1) must survive the packing unharmed
    base = dt.datetime(2024, 1, 1, 10, 5)
    rows = ["b"] * 3 + ["a"] * 3 + ["c"] * 2 + ["d", "z\x1f\x1ez"]
    tbl = pa.table(
        {
            "ts": pa.array([base] * len(rows), pa.timestamp("us")),
            "event_type": pa.array(rows, pa.string()),
        }
    )
    import tempfile, os
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "events.parquet"))
        out = sorted(
            (r["rank"], r["event_type"], r["n_events"])
            for r in q_window_topk(d).take_all()
        )
    assert out == [(1, "a", 3), (2, "b", 3), (3, "c", 2)]


def test_mixture_sample_quotas(ray_session):
    from crawl4ai_custom_ray.functions.curation import mixture_sample

    tbl = pa.table(
        {
            "doc_id": pa.array(range(30), pa.int64()),
            "source": pa.array(
                ["a"] * 10 + ["b"] * 10 + ["c"] * 10, pa.string()
            ),
        }
    )
    ds = rd.from_arrow(tbl).repartition(3)
    # a: 500‰ of 20 → 10 (all); b: 100‰ → 2; c absent → quota 0
    out = mixture_sample(
        ds, weights_permille={"a": 500, "b": 100}, total=20
    ).take_all()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["sample_rank"])
    assert sorted(by_src["a"]) == list(range(1, 11))
    assert sorted(by_src["b"]) == [1, 2]
    assert "c" not in by_src


def test_prefix_pairs_capped_routes_identical(ray_session):
    """With max_bucket set, all three verify routes must drop the SAME
    pairs (canonical-cap rule everywhere): broadcast, attach-join, and
    in-bucket outputs are identical on the adversarial corpus."""
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in DOCS], pa.int64()),
                "text": pa.array([t for _, t in DOCS], pa.string()),
            }
        )
    ).repartition(3)
    kw = dict(threshold_num=1, threshold_den=2, shingle_n=3, max_bucket=3)

    def run(**extra):
        return {
            (r["a"], r["b"], round(r["jaccard"], 12))
            for r in jaccard_prefix_pairs(ds, **kw, **extra).take_all()
        }

    fast = run()
    joined = run(broadcast_vocab_max=0, broadcast_docs_max=0)
    bucketed = run(
        broadcast_vocab_max=0, broadcast_docs_max=0, verify_attach_bytes_max=0
    )
    assert joined == fast
    assert bucketed == fast


def test_prefix_pairs_no_self_pairs_on_sanitize_collision(ray_session):
    """Two raw tokens that sanitize-collide (\\x1e/\\x1f → U+FFFD) can
    put the same doc twice into one prefix bucket; no route may emit a
    (a, a) self-pair or duplicate (a, b) rows."""
    docs = [
        (1, "alpha\x1eq alpha\x1fq beta gamma delta"),
        (2, "alpha\x1eq alpha\x1fq beta gamma epsilon"),
        (3, "zeta eta theta iota kappa"),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        )
    )
    kw = dict(threshold_num=1, threshold_den=2, shingle_n=1)
    for extra in (
        {},
        {"broadcast_vocab_max": 0, "broadcast_docs_max": 0},
        {
            "broadcast_vocab_max": 0,
            "broadcast_docs_max": 0,
            "verify_attach_bytes_max": 0,
        },
    ):
        rows = jaccard_prefix_pairs(ds, **kw, **extra).take_all()
        seen = set()
        for r in rows:
            assert r["a"] < r["b"], (extra, r)
            assert (r["a"], r["b"]) not in seen, (extra, r)
            seen.add((r["a"], r["b"]))
