"""Hand-computed unit tests for the analytics/fusion operators added
after the first round-2 sweep: grouped HLL, RRF fusion, per-group
clipping, hop distance, novelty, PMI-adjacent rank blending."""

import numpy as np
import pyarrow as pa
import pytest


def test_hll_by_type_matches_global_on_single_key(ray_session):
    """With one key, the grouped sketch must equal the global sketch
    (identical registers → identical integer estimate)."""
    import ray.data as rd

    from crawl4ai_custom_ray.functions.sketches import hll_distinct, hll_distinct_by

    vals = [f"user-{i % 37}" for i in range(500)]
    t = pa.table(
        {
            "k": pa.array(["only"] * len(vals), pa.string()),
            "v": pa.array(vals, pa.string()),
        }
    )
    g = hll_distinct(rd.from_arrow(t).repartition(3), column="v").to_pandas()
    b = hll_distinct_by(
        rd.from_arrow(t).repartition(3), key_column="k", column="v"
    ).to_pandas()
    assert len(b) == 1
    assert int(b.loc[0, "estimate"]) == int(g.loc[0, "estimate"])
    assert int(b.loc[0, "n_zero"]) == int(g.loc[0, "n_zero"])


def test_hll_by_type_parallelism_invariant(ray_session):
    import ray.data as rd

    from crawl4ai_custom_ray.functions.sketches import hll_distinct_by

    t = pa.table(
        {
            "k": pa.array([f"k{i % 3}" for i in range(300)], pa.string()),
            "v": pa.array([f"u{i % 50}" for i in range(300)], pa.string()),
        }
    )
    outs = []
    for parts in (1, 7):
        df = (
            hll_distinct_by(
                rd.from_arrow(t).repartition(parts), key_column="k", column="v"
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        outs.append(df)
    assert outs[0].equals(outs[1])


def test_knn_rrf_hand_computed(ray_session):
    """Dot and L2 rankings diverge when norms vary; the fused integer
    scores follow Σ 10⁹//(60+r) with absent-list zero contribution."""
    import ray.data as rd

    from crawl4ai_custom_ray.functions.similarity import knn_rrf

    # query q = [1, 0].  Candidates: a=[3,0] (dot 3, far), b=[1.1,0]
    # (dot 1.1, near), c=[0.5,0] (dot .5, nearest to q among a/c...).
    # fixed-point ints ×1e6: q=[1e6,0]; a=[3e6,0]; b=[1.1e6,0]; c=[5e5,0]
    # dot: a=3e12, b=1.1e12, c=5e11 → dot rank a,b,c = 1,2,3
    # l2:  a=4e12, b=1e10,  c=2.5e11 → l2 rank b,c,a = 1,2,3
    # RRF(k=60): a: 1e9//61 + 1e9//63 = 16393442+15873015 = 32266457
    #            b: 1e9//62 + 1e9//61 = 16129032+16393442 = 32522474
    #            c: 1e9//63 + 1e9//62 = 15873015+16129032 = 32002047
    vecs = pa.table(
        {
            "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
            "embedding": pa.array(
                [[1.0, 0.0], [3.0, 0.0], [1.1, 0.0], [0.5, 0.0]],
                pa.list_(pa.float64()),
            ),
        }
    )
    out = knn_rrf(
        rd.from_arrow(vecs).repartition(2),
        np.array([[1.0, 0.0]]),
        [0],
        k=3,
        k_each=3,
    ).to_pandas()
    got = list(zip(out["neighbor_id"], out["rrf_score"]))
    assert got == [(2, 32522474), (1, 32266457), (3, 32002047)], got


def test_group_clip_hand_computed(ray_session, tmp_path):
    """p99 via the quantile_disc index rule: for n=100 values 1..100
    the cutoff is the 99th sorted element."""
    import pandas as pd

    import ray.data as rd

    from crawl4ai_custom_ray import queries as q

    # build a tiny events parquet in the sf layout
    import datetime as dt

    n = 100
    df = pd.DataFrame(
        {
            "event_id": range(n),
            "ts": [dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i) for i in range(n)],
            "user_id": [1] * n,
            "event_type": ["view"] * n,
            "value": [(i + 1) / 100.0 for i in range(n)],  # cents 1..100
            "props": ['{"k": 1}'] * n,
        }
    )
    df.to_parquet(tmp_path / "events.parquet")
    out = q.q_group_clip(str(tmp_path)).to_pandas()
    # ceil(0.99*100)-1 = 98 → sorted element index 98 = cents 99
    assert int(out["cents_clipped"].max()) == 99
    assert int(out["cents"].max()) == 100
    assert (out["cents_clipped"] == out["cents"].clip(upper=99)).all()


def test_hop_distance_unreached_absent(ray_session):
    import ray.data as rd

    from crawl4ai_custom_ray.functions.graph import hop_distance

    edges = pa.table(
        {
            "src": pa.array(["a", "b", "x"], pa.string()),
            "dst": pa.array(["b", "c", "y"], pa.string()),
        }
    )
    seeds = pa.table({"host": pa.array(["a"], pa.string())})
    out = hop_distance(
        rd.from_arrow(edges),
        rd.from_arrow(seeds),
        node_column="host",
        max_hops=2,
        num_partitions=2,
    ).to_pandas()
    got = dict(zip(out["host"], out["dist"]))
    assert got == {"a": 0, "b": 1, "c": 2}  # x, y unreached → absent


def test_novelty_score_hand_computed(ray_session):
    """Two docs sharing one 3-gram: the shared shingle has df 2, all
    others df 1; the integer more-than-half-unique flag follows."""
    import ray.data as rd

    from crawl4ai_custom_ray.functions.curation import novelty_score

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            # doc1 shingles: "a b c", "b c d"  |  doc2: "a b c", "b c x"
            "text": pa.array(["a b c d", "a b c x"], pa.string()),
        }
    )
    out = (
        novelty_score(rd.from_arrow(docs).repartition(2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_shingles"].tolist() == [2, 2]
    assert out["n_common"].tolist() == [1, 1]
    assert out["novel"].tolist() == [True, True]  # 2*1 <= 2


def test_boilerplate_strip_hand_computed(ray_session):
    """A 4-word chunk repeated across two docs of the same source is
    stripped everywhere; the same chunk in a DIFFERENT source stays."""
    import ray.data as rd

    from crawl4ai_custom_ray.functions.curation import boilerplate_strip

    banner = "cookie notice accept all"
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "source": pa.array(["a", "a", "b"], pa.string()),
            "text": pa.array(
                [
                    banner + " unique one two three",
                    banner + " other words go here",
                    banner + " third doc different site",
                ],
                pa.string(),
            ),
        }
    )
    out = (
        boilerplate_strip(
            rd.from_arrow(docs).repartition(3), chunk_words=4, min_docs=2
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["text"].tolist() == [
        "unique one two three",
        "other words go here",
        banner + " third doc different site",
    ]
    assert out["n_removed"].tolist() == [1, 1, 0]


def test_event_transitions_hand_computed(ray_session, tmp_path):
    """Per-user ordered transitions with the (ts, event_id) tie-break:
    user 1 view→click→view, user 2 click→click."""
    import datetime as dt

    import pandas as pd

    from crawl4ai_custom_ray import queries as q

    t0 = dt.datetime(2024, 1, 1)
    df = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3, 4],
            "ts": [t0, t0 + dt.timedelta(seconds=1), t0 + dt.timedelta(seconds=2),
                   t0, t0],  # user 2's two events tie on ts → event_id order
            "user_id": [1, 1, 1, 2, 2],
            "event_type": ["view", "click", "view", "click", "click"],
            "value": [0.0] * 5,
            "props": ['{"k": 0}'] * 5,
        }
    )
    df.to_parquet(tmp_path / "events.parquet")
    out = q.q_event_transitions(str(tmp_path)).to_pandas()
    got = {
        (r.prev_type, r.next_type): r.n for r in out.itertuples()
    }
    assert got == {
        ("view", "click"): 1,
        ("click", "view"): 1,
        ("click", "click"): 1,
    }, got


def test_weighted_pagerank_proportional_split(ray_session):
    """One round by hand: src s links to a with weight 3 and b with
    weight 1 → a gets 3/4 of s's rank, b gets 1/4 (floor division)."""
    import ray.data as rd

    from crawl4ai_custom_ray.functions.graph import pagerank

    edges = pa.table(
        {
            "src": pa.array(["s", "s"], pa.string()),
            "dst": pa.array(["a", "b"], pa.string()),
            "w": pa.array([3, 1], pa.int64()),
        }
    )
    nodes = pa.table({"host": pa.array(["s", "a", "b"], pa.string())})
    out = (
        pagerank(
            rd.from_arrow(edges),
            rd.from_arrow(nodes),
            node_column="host",
            weight_column="w",
            iters=1,
            num_partitions=2,
        )
        .to_pandas()
        .set_index("host")["rank"]
        .to_dict()
    )
    # contrib a = 1e6*3//4 = 750000; b = 250000; rank = 150000 + 85*c//100
    assert out == {
        "s": 150000,
        "a": 150000 + (85 * 750000) // 100,
        "b": 150000 + (85 * 250000) // 100,
    }, out


def test_suffstats_hand_computed(ray_session, tmp_path):
    import pandas as pd

    from crawl4ai_custom_ray import queries as q

    df = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "source": ["s", "s"],
            "text": ["the cat", "a big dog ran"],  # x=2,4; y=1,1
            "lang": ["en", "en"],
        }
    )
    df.to_parquet(tmp_path / "documents.parquet")
    out = q.q_suffstats(str(tmp_path)).to_pandas().iloc[0]
    assert (
        out["n"], out["sum_x"], out["sum_y"], out["sum_xy"],
        out["sum_xx"], out["sum_yy"],
    ) == (2, 6, 2, 6, 20, 2)


def test_kmv_exact_below_k(ray_session):
    """With fewer than k distinct values the KMV sketch reports the
    exact distinct count."""
    import ray.data as rd

    from crawl4ai_custom_ray.functions.sketches import kmv_distinct

    t = pa.table({"v": pa.array([f"u{i % 40}" for i in range(500)], pa.string())})
    out = kmv_distinct(rd.from_arrow(t).repartition(5), column="v", k=256).to_pandas()
    assert out.loc[0, "n_kept"] == 40
    assert out.loc[0, "estimate"] == 40


def test_kmv_parallelism_invariant(ray_session):
    import ray.data as rd

    from crawl4ai_custom_ray.functions.sketches import kmv_distinct

    t = pa.table({"v": pa.array([f"u{i}" for i in range(2000)], pa.string())})
    outs = [
        kmv_distinct(rd.from_arrow(t).repartition(p), column="v", k=64)
        .to_pandas()
        for p in (1, 8)
    ]
    assert outs[0].equals(outs[1])
    # 2000 distinct, k=64 → estimate within ~25% of truth
    assert 1500 < outs[0].loc[0, "estimate"] < 2700


def test_frame_sampler_multiframe_and_cap(ray_session):
    """Payload spanning 3 frame spans yields 3 frames at the right
    offsets; a huge payload caps at max_frames; digests match the
    md5-u64 window convention."""
    import ray.data as rd

    from crawl4ai_custom_ray.functions.curation import _md5_u64
    from crawl4ai_custom_ray.functions.multimodal import sample_frames

    three = "x" * (4096 * 2 + 10)
    huge = "y" * (4096 * 50)
    t = pa.table(
        {
            "url": pa.array(["a", "b"], pa.string()),
            "payload": pa.array([three, huge], pa.string()),
        }
    )
    out = (
        sample_frames(rd.from_arrow(t), max_frames=5)
        .to_pandas()
        .sort_values(["url", "frame_idx"])
        .reset_index(drop=True)
    )
    a = out[out.url == "a"]
    assert a["frame_idx"].tolist() == [0, 1, 2]
    assert a["byte_offset"].tolist() == [0, 4096, 8192]
    assert len(out[out.url == "b"]) == 5  # capped
    exp = _md5_u64(three[4096 : 4096 + 64]) % (1 << 62)
    assert int(a[a.frame_idx == 1]["frame_digest"].iloc[0]) == exp


def test_bm25_hand_computed(ray_session, tmp_path):
    """BM25 with k1=6/5, b=3/4 on a 2-doc corpus: the rational weight
    44·tf·avgdl/(20·avgdl·tf + 6·avgdl + 18·dl) and the Lucene idf
    floor(ln((2N+2)/(2df+1))·1e6), OR semantics."""
    import math

    import pandas as pd

    from crawl4ai_custom_ray import queries as q

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "spark vector spark x",   # tf(spark)=2, tf(vector)=1, dl=4
                "vector y z",             # tf(vector)=1, dl=3
                "a b c d e",              # no terms
            ],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [0] * 3,
        }
    )
    df.to_parquet(tmp_path / "documents.parquet")
    out = q.q_bm25_search(str(tmp_path)).to_pandas()

    n, avgdl = 3, (4 + 3 + 5) // 3  # = 4
    idf = {
        "spark": math.floor(math.log((2 * n + 2) / (2 * 1 + 1)) * 1e6),
        "vector": math.floor(math.log((2 * n + 2) / (2 * 2 + 1)) * 1e6),
    }

    def w(tf, dl):
        return (44 * tf * avgdl, 20 * avgdl * tf + 6 * avgdl + 18 * dl)

    def contrib(term, tf, dl):
        num, den = w(tf, dl)
        return (idf[term] * num) // den

    exp0 = contrib("spark", 2, 4) + contrib("vector", 1, 4)
    exp1 = contrib("vector", 1, 3)
    got = dict(zip(out["doc_id"], out["score_fp"]))
    assert got == {0: exp0, 1: exp1}, (got, exp0, exp1)


def test_kl_divergence_hand_computed(ray_session, tmp_path):
    """KL contract on a 2-source corpus: per-token floor'd log-ratio,
    count-weighted, floor-divided by T_a."""
    import math

    import pandas as pd

    from crawl4ai_custom_ray import queries as q

    df = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["a a b", "a c"],
            "lang": ["en"] * 2,
            "source": ["src0", "src1"],
            "n_chars": [0] * 2,
        }
    )
    df.to_parquet(tmp_path / "documents.parquet")
    r = q.q_kl_divergence(str(tmp_path))
    out = (r.to_pandas() if hasattr(r, "to_pandas") else r).to_pandas() if not hasattr(r, "columns") else r
    import pyarrow as pa_

    row = (r.to_pandas() if hasattr(r, "to_pandas") else r)
    row = row.to_pydict() if isinstance(row, pa_.Table) else row.iloc[0].to_dict()
    if isinstance(row, dict) and isinstance(next(iter(row.values())), list):
        row = {k: v[0] for k, v in row.items()}
    # counts: a-side {a:2, b:1}, T_a=3; b-side {a:1, c:1}, T_b=2; V=3
    t_a, t_b, v = 3, 2, 3
    total = 2 * math.floor(math.log(2 * (t_b + v) / (t_a * (1 + 1))) * 1e6)
    total += 1 * math.floor(math.log(1 * (t_b + v) / (t_a * (0 + 1))) * 1e6)
    assert row["t_a"] == t_a and row["t_b"] == t_b and row["vocab"] == v
    assert row["kl_ppm"] == total // t_a, (row, total // t_a)


def test_graph_local_vs_distributed(ray_session, monkeypatch):
    """The size-adaptive local fast path must be bit-identical to the
    distributed BSP path for pagerank (both weightings), hits, and
    hop_distance — including edges whose endpoints are not in the node
    table (they shape HITS normalizer totals)."""
    import ray.data as rd

    import crawl4ai_custom_ray.functions.graph as g

    rng = np.random.default_rng(7)
    hosts = [f"h{i}" for i in range(40)]
    src = rng.choice(hosts + ["ghost1"], 300).tolist()
    dst = rng.choice(hosts + ["ghost2"], 300).tolist()
    w = rng.integers(1, 9, 300).tolist()
    edges = pa.table({"src": src, "dst": dst, "w": pa.array(w, pa.int64())})
    nodes = pa.table({"host": pa.array(hosts)})
    seeds = pa.table({"host": pa.array(hosts[:3])})

    def run():
        e, n, s = rd.from_arrow(edges), rd.from_arrow(nodes), rd.from_arrow(seeds)
        return {
            "pr": g.pagerank(e, n, node_column="host", iters=3, num_partitions=2)
            .to_pandas().sort_values("host").reset_index(drop=True),
            "prw": g.pagerank(
                e, n, node_column="host", weight_column="w", iters=3,
                num_partitions=2,
            ).to_pandas().sort_values("host").reset_index(drop=True),
            "hits": g.hits(e, n, node_column="host", iters=2, num_partitions=2)
            .to_pandas().sort_values("host").reset_index(drop=True),
            "hop": g.hop_distance(
                e, s, node_column="host", max_hops=3, num_partitions=2
            ).to_pandas().sort_values("host").reset_index(drop=True),
        }

    local = run()  # default threshold → local kernels
    monkeypatch.setattr(g, "_LOCAL_GRAPH_MAX_EDGES", -1)
    dist = run()  # forced distributed BSP (rank-broadcast route)
    for k in local:
        assert local[k].equals(dist[k]), f"{k} differs:\n{local[k]}\n{dist[k]}"
    # above-gate route: per-edge rank join instead of the broadcast
    monkeypatch.setattr(g, "_PAGERANK_BCAST_MAX", -1)
    joinroute = run()
    for k in ("pr", "prw"):
        assert local[k].equals(joinroute[k]), f"{k} join-route differs"
