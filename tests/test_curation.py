"""Unit tests for the curation operators (PII scrub, benchmark
decontamination, repetition quality) — planted-signal corpora, exact
expectations."""

import pyarrow as pa
import ray.data as rd

from crawl4ai_custom_ray.functions.curation import (
    decontaminate,
    gopher_doc_filter,
    gopher_doc_filter_batch,
    pii_scrub,
    pii_scrub_batch,
    repetition_quality,
    repetition_quality_batch,
)


def test_pii_scrub_kernel_redacts_and_counts():
    batch = pa.table(
        {
            "url": ["u1", "u2", "u3"],
            "text": [
                "mail bob.smith+x@example.co.uk now",
                "call (415) 555-2671 or 10.0.0.1",
                "clean text with no pii at all",
            ],
        }
    )
    out = pii_scrub_batch(batch)
    rows = out.to_pylist()
    assert rows[0]["scrubbed"] == "mail [EMAIL] now"
    assert rows[0]["n_email"] == 1 and rows[0]["n_phone"] == 0
    assert "[PHONE]" in rows[1]["scrubbed"] and "[IP]" in rows[1]["scrubbed"]
    assert rows[1]["n_phone"] == 1 and rows[1]["n_ip"] == 1
    assert rows[2]["scrubbed"] == "clean text with no pii at all"
    assert rows[2]["n_email"] == rows[2]["n_phone"] == rows[2]["n_ip"] == 0


def test_pii_scrub_counts_on_original_not_sequential():
    """Counts are measured per-rule on the ORIGINAL text, so an
    earlier rule's replacement can't hide a later rule's match from
    the tally."""
    # the ip is also the tail of no other pattern; email consumed first
    batch = pa.table({"url": ["u"], "text": ["a@b.cd 1.2.3.4"]})
    row = pii_scrub_batch(batch).to_pylist()[0]
    assert row["n_email"] == 1 and row["n_ip"] == 1
    assert row["scrubbed"] == "[EMAIL] [IP]"


def test_pii_scrub_bytes_input():
    batch = pa.table({"url": ["u"], "text": [b"x a@b.cd y"]})
    assert pii_scrub_batch(batch).to_pylist()[0]["scrubbed"] == "x [EMAIL] y"


def test_decontaminate_flags_planted_copy(ray_session):
    bench_text = " ".join(f"b{i}" for i in range(40))
    rows = [
        # contaminated: embeds a 20-word benchmark run (17 shared 4-grams)
        {"doc_id": 1, "text": "pre " + " ".join(f"b{i}" for i in range(20)) + " post"},
        # clean: disjoint vocabulary
        {"doc_id": 2, "text": " ".join(f"c{i}" for i in range(40))},
        # borderline-clean: only 4 words shared → 1 shingle < threshold
        {"doc_id": 3, "text": "b0 b1 b2 b3 " + " ".join(f"d{i}" for i in range(30))},
    ]
    corpus = rd.from_items(rows)
    bench = rd.from_items([{"doc_id": 100, "text": bench_text}])
    out = (
        decontaminate(corpus, bench, shingle_n=4, threshold=5)
        .to_pandas()
        .set_index("doc_id")
    )
    assert bool(out.loc[1, "contaminated"]) is True
    assert int(out.loc[1, "n_overlap"]) == 17
    assert bool(out.loc[2, "contaminated"]) is False
    assert int(out.loc[2, "n_overlap"]) == 0
    assert bool(out.loc[3, "contaminated"]) is False
    assert int(out.loc[3, "n_overlap"]) == 1


def test_repetition_quality_kernel():
    # the clean doc must be long enough that unique grams give small
    # fractions (a 6-word doc has top_3gram_frac 1/4 > 0.18 even with
    # zero repetition — the thresholds assume real-document lengths)
    clean_text = " ".join(f"w{i}" for i in range(20))
    batch = pa.table(
        {
            "doc_id": [1, 2],
            "text": [
                "spam spam spam spam spam spam",  # maximally repetitive
                clean_text,  # 20 distinct words
            ],
        }
    )
    out = repetition_quality_batch(
        batch, top_2gram_max=0.2, top_3gram_max=0.18, dup_word_max=0.8
    ).to_pylist()
    rep, clean = out
    assert rep["n_words"] == 6
    assert rep["dup_word_frac"] == 1 - 1 / 6
    assert rep["top_2gram_frac"] == 1.0 and rep["top_3gram_frac"] == 1.0
    assert rep["keep"] is False
    assert clean["dup_word_frac"] == 0.0
    assert clean["top_2gram_frac"] == 1 / 19  # every 2-gram unique
    assert clean["keep"] is True


def test_repetition_quality_short_docs():
    """Docs shorter than the gram width get frac 0.0, not a crash."""
    batch = pa.table({"doc_id": [1, 2], "text": ["solo", "two words"]})
    out = repetition_quality_batch(
        batch, top_2gram_max=0.2, top_3gram_max=0.18, dup_word_max=0.8
    ).to_pylist()
    assert out[0]["top_2gram_frac"] == 0.0 and out[0]["top_3gram_frac"] == 0.0
    assert out[1]["top_2gram_frac"] == 1.0  # one 2-gram, occurring once
    assert out[1]["top_3gram_frac"] == 0.0


def test_repetition_quality_dataset(ray_session):
    ds = rd.from_items(
        [{"doc_id": i, "text": "a b c d e f g h"} for i in range(5)]
    )
    out = repetition_quality(ds).to_pandas()
    assert len(out) == 5
    assert out["keep"].all()


def test_split_assign_deterministic_and_complete():
    import hashlib

    batch = pa.table({"doc_id": list(range(1000))})
    from crawl4ai_custom_ray.functions.curation import split_assign_batch

    out = split_assign_batch(batch).to_pylist()
    # deterministic: re-run identical
    again = split_assign_batch(batch).to_pylist()
    assert out == again
    # bucket = md5(str(id)) prefix, stable under any sharding
    row = out[123]
    exp = int(hashlib.md5(b"123").hexdigest()[:16], 16) % 100
    assert row["bucket"] == exp
    counts = {"train": 0, "val": 0, "test": 0}
    for r in out:
        counts[r["split"]] += 1
        assert (r["bucket"] < 80) == (r["split"] == "train")
    # ~80/10/10 within loose bounds
    assert 700 < counts["train"] < 900


def test_dsir_select_prefers_target_like_docs(ray_session):
    """Docs sharing the target split's vocabulary get selected; docs
    from a disjoint vocabulary don't."""
    from crawl4ai_custom_ray.functions.curation import dsir_select

    target_text = " ".join(f"t{i % 20}" for i in range(60))
    rows = [{"doc_id": i * 10, "text": target_text} for i in range(1, 4)]  # targets
    rows.append({"doc_id": 1, "text": " ".join(f"t{i % 20}" for i in range(40))})
    rows.append({"doc_id": 2, "text": " ".join(f"z{i}" for i in range(40))})
    ds = rd.from_items(rows)
    out = (
        dsir_select(ds, is_target_fn=lambda i: i % 10 == 0)
        .to_pandas()
        .set_index("doc_id")
    )
    assert set(out.index) == {1, 2}  # targets excluded from scoring
    assert bool(out.loc[1, "selected"]) is True
    assert bool(out.loc[2, "selected"]) is False
    assert int(out.loc[1, "n_target_like"]) == int(out.loc[1, "n_grams"])
    assert int(out.loc[2, "n_target_like"]) == 0


# ------------------------------------------------------- domain filter


def test_domain_filter_paths_equal(ray_session):
    """Broadcast fast path == hash-join scale path, and both match a
    hand-computed keep decision."""
    import pyarrow as pa
    import ray.data as rd

    from crawl4ai_custom_ray.functions.curation import domain_filter

    rows = []
    # good domain: stopword-rich; bad domain: no stopwords; tiny domain: too few docs
    for i in range(12):
        rows.append((i, "good", "the cat is in the house and it is fine"))
    for i in range(12, 24):
        rows.append((i, "bad", "lorem ipsum dolor sit amet consectetur"))
    rows.append((24, "tiny", "the the the the"))
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "source": pa.array([r[1] for r in rows], pa.string()),
                "text": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )
    kw = dict(min_docs=10, min_stopword_ratio=0.1)
    small = (
        domain_filter(ds, **kw).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    large = (
        domain_filter(ds, small_threshold=0, **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert small.equals(large[small.columns].astype(small.dtypes.to_dict()))
    by_src = small.groupby("source")["keep"].all()
    assert bool(by_src["good"]) is True
    assert bool(by_src["bad"]) is False      # ratio 0
    assert bool(by_src["tiny"]) is False     # min_docs
    assert len(small) == 25


def test_sample_per_group_deterministic(ray_session):
    """Sample = the k lowest (md5(str(id)), id) per group, stable
    across parallelism (combiner path == single-block path)."""
    import hashlib

    import pyarrow as pa
    import ray.data as rd

    from crawl4ai_custom_ray.functions.curation import sample_per_group

    ids = list(range(40))
    groups = ["a" if i % 2 == 0 else "b" for i in ids]
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "source": pa.array(groups, pa.string()),
        }
    )
    out = (
        sample_per_group(rd.from_arrow(t), group_column="source", k=3)
        .to_pandas()
        .sort_values(["source", "sample_rank"])
        .reset_index(drop=True)
    )
    # expected: per group, 3 lowest by (md5 hex of decimal id, id)
    for g in ("a", "b"):
        members = [i for i, grp in zip(ids, groups) if grp == g]
        ranked = sorted(members, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        got = out[out["source"] == g]["doc_id"].tolist()
        assert got == ranked[:3], (g, got, ranked[:3])
    # same result at different parallelism
    out2 = (
        sample_per_group(
            rd.from_arrow(t).repartition(8), group_column="source", k=3
        )
        .to_pandas()
        .sort_values(["source", "sample_rank"])
        .reset_index(drop=True)
    )
    assert out.equals(out2)


def test_length_quantiles_exact(ray_session):
    """Histogram quantiles follow the quantile_disc rule
    (sorted[max(0, ceil(q*n)-1)]) exactly."""
    import math

    import pyarrow as pa
    import ray.data as rd

    from crawl4ai_custom_ray.functions.textstats import length_quantiles

    texts = [" ".join(["w"] * n) for n in [1, 2, 2, 3, 5, 8, 8, 8, 13, 21]]
    ds = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    qs = (0.0, 0.25, 0.5, 0.75, 1.0)
    out = length_quantiles(ds, quantiles=qs).to_pydict()
    lens = sorted(len(t.split(" ")) for t in texts)
    for q, v in zip(out["q"], out["value"]):
        assert v == lens[max(0, math.ceil(q * len(lens)) - 1)], (q, v)


def test_lm_score_hand_computed(ray_session):
    """Bigram-LM scores match a by-hand add-one model on a tiny
    corpus: seen bigram, unseen bigram with seen left word, unseen
    left word, and a <2-token doc that must surface with zeros —
    invariant across parallelism and salt."""
    import math

    import pyarrow as pa
    import ray.data as rd

    from crawl4ai_custom_ray.functions.curation import lm_score

    ref_texts = ["a b a b c", "a c"]
    # unigrams: a×3 b×2 c×2  -> V = 3
    # bigrams:  (a,b)×2 (b,a)×1 (b,c)×1 (a,c)×1
    doc_texts = ["a b c", "a z", "x"]
    ref = pa.table(
        {
            "doc_id": pa.array([10, 11], pa.int64()),
            "text": pa.array(ref_texts, pa.string()),
        }
    )
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(doc_texts, pa.string()),
        }
    )
    V = 3
    c1 = {"a": 3, "b": 2, "c": 2}
    c12 = {("a", "b"): 2, ("b", "a"): 1, ("b", "c"): 1, ("a", "c"): 1}

    def term(w1, w2):
        return math.floor(
            math.log((c12.get((w1, w2), 0) + 1) / (c1.get(w1, 0) + V)) * 1e9
        )

    expected = {
        1: (2, term("a", "b") + term("b", "c")),
        2: (1, term("a", "z")),
        3: (0, 0),
    }
    for parts, salt in ((1, 1), (3, 4)):
        out = lm_score(
            rd.from_arrow(docs).repartition(parts),
            rd.from_arrow(ref).repartition(parts),
            salt=salt,
        ).to_pandas()
        got = {
            r.doc_id: (r.n_bigrams, r.logprob_fp) for r in out.itertuples()
        }
        assert got == expected, (parts, salt, got, expected)


def test_gopher_doc_filter_kernel_rules():
    # crafted docs isolating each rule (bounds: 30-90 words, mean word
    # length 4.0-5.0 via integer cross-mult, >=80% alpha words,
    # >=3 stopwords, no 'lorem ipsum', no '{')
    good = " ".join(["the", "of", "and"] + ["words"] * 37)  # 40 w, mean (8+185)/40 = 4.825
    too_short = "the of and word"
    no_stop = " ".join(["alpha"] * 40)
    numbers = " ".join(["the", "of", "and"] + ["1234"] * 37)  # alpha frac 3/40
    lorem = good + " lorem ipsum"
    brace = good.replace("words", "wor{s", 1)
    batch = pa.table(
        {
            "doc_id": list(range(6)),
            "text": [good, too_short, no_stop, numbers, lorem, brace],
        }
    )
    out = gopher_doc_filter_batch(
        batch,
        min_words=30,
        max_words=90,
        mean_len_lo_x10=40,
        mean_len_hi_x10=50,
        min_stop=3,
    ).to_pylist()
    assert [r["passed"] for r in out] == [True, False, False, False, False, False]
    g = out[0]
    assert g["n_words"] == 40
    assert g["sum_word_len"] == 3 + 2 + 3 + 37 * 5
    assert g["n_alpha_words"] == 40
    assert g["n_stop"] == 3


def test_gopher_doc_filter_dataset(ray_session):
    ds = rd.from_items(
        [
            {"doc_id": 1, "text": " ".join(["the", "it", "is"] + ["words"] * 37)},
            {"doc_id": 2, "text": "tiny"},
        ]
    )
    rows = {r["doc_id"]: r for r in gopher_doc_filter(ds).take_all()}
    assert rows[1]["passed"] is True and rows[2]["passed"] is False


def test_ccnet_buckets_orders_by_reference_likeness(ray_session):
    """Docs made of reference bigrams land in 'head'; disjoint-vocab
    docs land in 'tail'; tertiles are per-language."""
    from crawl4ai_custom_ray.functions.curation import ccnet_buckets

    ref_text = " ".join(["alpha beta gamma delta"] * 5)
    rows = []
    # 9 docs per lang: 3 pure reference-bigram docs, 3 half, 3 disjoint
    for lang in ("aa", "bb"):
        for i in range(3):
            rows.append({"doc_id": len(rows), "lang": lang,
                         "text": "alpha beta gamma delta alpha beta"})
        for i in range(3):
            rows.append({"doc_id": len(rows), "lang": lang,
                         "text": "alpha beta xx yy zz qq"})
        for i in range(3):
            rows.append({"doc_id": len(rows), "lang": lang,
                         "text": "mm nn oo pp rr ss"})
    ds = rd.from_items(rows)
    ref = rd.from_items([{"doc_id": 1000, "text": ref_text}])
    out = ccnet_buckets(ds, ref).to_pandas().sort_values("doc_id")
    for lang in ("aa", "bb"):
        sub = out[out["lang"] == lang].reset_index(drop=True)
        assert list(sub["bucket"][:3]) == ["head"] * 3
        assert list(sub["bucket"][3:6]) == ["middle"] * 3
        assert list(sub["bucket"][6:9]) == ["tail"] * 3
        # bins are monotone with reference-likeness
        assert sub["bin"][0] > sub["bin"][3] > sub["bin"][6]


def test_weighted_sample_probability_is_exact():
    """weight w ⇒ kept iff md5(id) % 8 < w: weight-0 never kept,
    weight-8 always kept, and the rule is reproducible per id."""
    import hashlib

    from crawl4ai_custom_ray.functions.curation import weighted_sample_batch

    stop_rich = " ".join(["the", "a", "of", "to", "and", "in", "is", "that"] * 2)
    batch = pa.table(
        {
            "doc_id": list(range(32)),
            "text": ["zz yy xx"] * 16 + [stop_rich] * 16,
        }
    )
    out = weighted_sample_batch(batch, max_weight=8).to_pylist()
    for r in out[:16]:
        assert r["weight"] == 0 and r["keep"] is False
    for r in out[16:]:
        assert r["weight"] == 8 and r["keep"] is True
    # per-id rule matches the md5 contract for a mid-weight doc
    one = weighted_sample_batch(
        pa.table({"doc_id": [123], "text": ["the a of zz yy"]}), max_weight=8
    ).to_pylist()[0]
    h = int(hashlib.md5(b"123").hexdigest()[:16], 16) % 8
    assert one["weight"] == 3 and one["keep"] == (h < 3)


def test_ccnet_normalize_goldens_match_duckdb():
    """The python kernel is char-exact vs DuckDB's unicode kernels on
    accent / fullwidth / CJK / ß / digit / whitespace goldens."""
    import duckdb

    from crawl4ai_custom_ray.functions.curation import ccnet_normalize_text

    goldens = [
        "Héllo   WORLD",
        "café № 42",
        "ÀÉÎÕÜ ç ñ",
        "ＦＵＬＬｗｉｄｔｈ 123",
        "ss ß",
        "中文 Ｗeb",
        "tabs\tand\nnewlines  collapse",
        "  edge trim  ",
        "",
    ]
    for g in goldens:
        d = duckdb.sql(
            r"""SELECT trim(regexp_replace(regexp_replace(
                nfc_normalize(strip_accents(lower(?))),
                '[0-9]', '0', 'g'), '[ \t\n\r\f]+', ' ', 'g'))""",
            params=[g],
        ).fetchone()[0]
        assert ccnet_normalize_text(g) == d, repr(g)
    assert ccnet_normalize_text("café 42") == "cafe 00"


def test_dedup_normalized_collapses_variants(ray_session):
    """Case/accent/digit variants hash together post-normalization."""
    from crawl4ai_custom_ray.functions.curation import ccnet_normalize
    from crawl4ai_custom_ray.functions.dedup import exact_dedup

    ds = rd.from_items(
        [
            {"doc_id": 3, "text": "Café opened in 1995"},
            {"doc_id": 1, "text": "cafe  opened in 2024"},  # same normalized
            {"doc_id": 2, "text": "something else entirely"},
        ]
    )
    kept = sorted(
        exact_dedup(ccnet_normalize(ds), text_column="norm_text")
        .to_pandas()["doc_id"]
    )
    assert kept == [1, 2]  # min-id variant survives, distinct doc kept
