"""Property tests: the new distributed kernels vs pure-Python
brute-force references on randomized tiny inputs (few examples —
each example executes Ray pipelines)."""

import math

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st


def _tokens():
    return st.lists(
        st.sampled_from(["a", "b", "c", "d", "e"]), min_size=1, max_size=12
    )


@settings(max_examples=5, deadline=None)
@given(st.lists(_tokens(), min_size=1, max_size=6), st.integers(1, 3))
def test_pmi_pairs_matches_bruteforce(ray_session, docs_tokens, window):
    import ray.data as rd

    from crawl4ai_custom_ray.functions.textstats import pmi_pairs

    texts = [" ".join(t) for t in docs_tokens]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = pmi_pairs(
        rd.from_arrow(t).repartition(2), window=window, min_count=1, top_k=1000
    ).to_pandas()

    # brute force
    from collections import Counter

    pairs, unis = Counter(), Counter()
    for toks in docs_tokens:
        unis.update(toks)
        for i in range(len(toks)):
            for j in range(i + 1, min(i + window + 1, len(toks))):
                a, b = sorted((toks[i], toks[j]))
                pairs[(a, b)] += 1
    T, P = sum(unis.values()), sum(pairs.values())
    exp = sorted(
        (
            (np_ * T * T * 1_000_000) // (P * unis[a] * unis[b]),
            np_,
            a,
            b,
        )
        for (a, b), np_ in pairs.items()
    )
    exp = [
        (a, b, np_, lift)
        for lift, np_, a, b in sorted(
            exp, key=lambda r: (-r[0], -r[1], r[2], r[3])
        )
    ]
    if not exp:
        assert len(got) == 0
        return
    assert (
        list(zip(got["tok_a"], got["tok_b"], got["n_pair"], got["lift_ppm"]))
        == exp
    )


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from("abcde"), st.sampled_from("abcde")),
        min_size=1,
        max_size=12,
    )
)
def test_hop_distance_matches_bfs(ray_session, edge_list):
    import ray.data as rd

    from crawl4ai_custom_ray.functions.graph import hop_distance

    edges = [(s, d) for s, d in edge_list if s != d]
    if not edges:
        return
    nodes = sorted({x for e in edges for x in e})
    seeds = [nodes[0]]
    et = pa.table(
        {
            "src": pa.array([s for s, _ in edges], pa.string()),
            "dst": pa.array([d for _, d in edges], pa.string()),
        }
    )
    stt = pa.table({"host": pa.array(seeds, pa.string())})
    out = hop_distance(
        rd.from_arrow(et),
        rd.from_arrow(stt),
        node_column="host",
        max_hops=4,
        num_partitions=2,
    ).to_pandas()
    got = dict(zip(out["host"], out["dist"]))

    # reference BFS capped at 4 hops
    adj: dict = {}
    for s, d in set(edges):
        adj.setdefault(s, set()).add(d)
    dist = {seeds[0]: 0}
    frontier = set(seeds)
    for hop in range(1, 5):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = hop
                    nxt.add(v)
        frontier = nxt
    assert got == dist


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from("abcd"), st.sampled_from("abcd")),
        min_size=1,
        max_size=10,
    ),
    st.integers(1, 3),
)
def test_hits_matches_reference(ray_session, edge_list, iters):
    import ray.data as rd

    from crawl4ai_custom_ray.functions.graph import hits

    edges = sorted({(s, d) for s, d in edge_list if s != d})
    if not edges:
        return
    nodes = sorted({x for e in edges for x in e})
    et = pa.table(
        {
            "src": pa.array([s for s, _ in edges], pa.string()),
            "dst": pa.array([d for _, d in edges], pa.string()),
        }
    )
    nt = pa.table({"host": pa.array(nodes, pa.string())})
    out = hits(
        rd.from_arrow(et).repartition(2),
        rd.from_arrow(nt),
        node_column="host",
        iters=iters,
        num_partitions=2,
    ).to_pandas()
    got = {r.host: (r.hub, r.auth) for r in out.itertuples()}

    # integer reference
    scale = 1_000_000
    hub = {n: scale for n in nodes}
    for _ in range(iters):
        araw = {n: 0 for n in nodes}
        for s, d in edges:
            araw[d] += hub[s]
        norm = max(sum(araw.values()) // scale, 1)
        auth = {n: v // norm for n, v in araw.items()}
        hraw = {n: 0 for n in nodes}
        for s, d in edges:
            hraw[s] += auth[d]
        norm = max(sum(hraw.values()) // scale, 1)
        hub = {n: v // norm for n, v in hraw.items()}
    assert got == {n: (hub[n], auth[n]) for n in nodes}


@settings(max_examples=5, deadline=None)
@given(st.lists(_tokens(), min_size=1, max_size=8))
def test_rank_blend_matches_pandas_rank(ray_session, docs_tokens):
    import pandas as pd
    import ray.data as rd

    from crawl4ai_custom_ray.functions.curation import STOPWORDS, rank_blend

    texts = [" ".join(t) for t in docs_tokens]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = (
        rank_blend(rd.from_arrow(t).repartition(2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    stop = set(STOPWORDS)
    ref = pd.DataFrame(
        {
            "n_words": [len(x.split(" ")) for x in texts],
            "n_stop": [sum(1 for w in x.split(" ") if w in stop) for x in texts],
        }
    )
    exp_len = (ref["n_words"].rank(method="min") - 1).astype(int)
    exp_stop = (ref["n_stop"].rank(method="min") - 1).astype(int)
    assert out["rank_len"].tolist() == exp_len.tolist()
    assert out["rank_stop"].tolist() == exp_stop.tolist()
    assert out["blend"].tolist() == (exp_len + exp_stop).tolist()


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abc"), min_size=3, max_size=8),
        min_size=1,
        max_size=5,
    )
)
def test_novelty_matches_bruteforce(ray_session, docs_tokens):
    import ray.data as rd

    from crawl4ai_custom_ray.functions.curation import novelty_score

    texts = [" ".join(t) for t in docs_tokens]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = (
        novelty_score(rd.from_arrow(t).repartition(2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    shingles = [
        {" ".join(tk[i : i + 3]) for i in range(len(tk) - 2)}
        for tk in docs_tokens
    ]
    from collections import Counter

    df = Counter(s for sh in shingles for s in sh)
    for i, sh in enumerate(shingles):
        row = out[out.doc_id == i].iloc[0]
        n_common = sum(1 for s in sh if df[s] >= 2)
        assert row["n_shingles"] == len(sh)
        assert row["n_common"] == n_common
        assert row["novel"] == (2 * n_common <= len(sh))


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2"]),
            st.lists(st.sampled_from("abcd"), min_size=1, max_size=10),
        ),
        min_size=1,
        max_size=6,
    ),
    st.integers(2, 4),
)
def test_boilerplate_strip_matches_bruteforce(ray_session, docs, chunk_words):
    import ray.data as rd

    from crawl4ai_custom_ray.functions.curation import boilerplate_strip

    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "source": pa.array([s for s, _ in docs], pa.string()),
            "text": pa.array([" ".join(w) for _, w in docs], pa.string()),
        }
    )
    out = (
        boilerplate_strip(
            rd.from_arrow(t).repartition(2),
            chunk_words=chunk_words,
            min_docs=2,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    # brute force
    from collections import defaultdict

    chunks_of = []
    for _, w in docs:
        chunks_of.append(
            [
                " ".join(w[s : s + chunk_words])
                for s in range(0, len(w), chunk_words)
            ]
        )
    pf: dict = defaultdict(set)
    for i, (src, _) in enumerate(docs):
        for c in chunks_of[i]:
            pf[(src, c)].add(i)
    for i, (src, _) in enumerate(docs):
        kept = [c for c in chunks_of[i] if len(pf[(src, c)]) < 2]
        assert out.loc[i, "text"] == " ".join(kept)
        assert out.loc[i, "n_removed"] == len(chunks_of[i]) - len(kept)
