"""Training-data curation operators beyond the reference's surface:
PII redaction, benchmark decontamination, and repetition-based
quality gating (Gopher-style; Rae et al. 2021, "Scaling Language
Models" §A.1.1 repetition filters).

All three are the shapes a 100 TB curation run needs:

- :func:`pii_scrub` is a stateless vectorized ``map_batches`` kernel
  (compiled regexes, no per-stage state) — embarrassingly parallel.
- :func:`decontaminate` broadcasts the SMALL side (the benchmark
  n-gram set, ~10^6-10^8 shingles) once via ``ray.put`` and streams
  the corpus through an actor pool that deserializes the set once per
  actor in ``__init__`` — never a corpus×corpus shuffle, never a
  driver-side materialization of the big side.
- :func:`repetition_quality` is per-document arithmetic over the
  token stream — stateless ``map_batches``.

Every kernel is deliberately SQL-replicable (same tokenization as the
dedup family: split on a single space) so the driver's DuckDB oracle
can confirm values exactly.
"""

from __future__ import annotations

import re
from collections import Counter

import pyarrow as pa

# ------------------------------------------------------------- pii scrub

# (label, pattern, replacement) — patterns are the reference regex
# catalog's (extraction_strategy.py:1969-1997, same strings as
# regex_extract.DEFAULT_PATTERNS), compiled with re.ASCII so \w/\d
# match the RE2 (DuckDB) ASCII classes and the oracle stays exact.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[\w.+-]+@[\w-]+\.[\w.-]+", "[EMAIL]"),
    ("phone", r"\(?\d{3}\)?[ -. ]?\d{3}[ -. ]?\d{4}", "[PHONE]"),
    ("ip", r"(?:\d{1,3}\.){3}\d{1,3}", "[IP]"),
]


def pii_scrub_batch(
    batch: pa.Table,
    *,
    text_column: str = "text",
    id_column: str = "url",
) -> pa.Table:
    """Redact PII spans in ``text_column``: counts are measured on the
    ORIGINAL text per rule (independent, so rule order can't hide a
    match from the tally), then replacements are applied sequentially
    in ``PII_RULES`` order."""
    compiled = [(lbl, re.compile(pat, re.ASCII), rep) for lbl, pat, rep in PII_RULES]
    texts = batch[text_column].to_pylist()
    counts: dict[str, list[int]] = {lbl: [] for lbl, _, _ in PII_RULES}
    scrubbed: list[str] = []
    for t in texts:
        if isinstance(t, bytes):  # e.g. the pages table's html:binary
            t = t.decode("utf-8", errors="replace")
        t = t or ""
        out = t
        for lbl, rx, rep in compiled:
            counts[lbl].append(len(rx.findall(t)))
            out = rx.sub(rep, out)
        scrubbed.append(out)
    return pa.table(
        {
            id_column: batch[id_column],
            "scrubbed": pa.array(scrubbed, pa.large_string()),
            **{
                f"n_{lbl}": pa.array(counts[lbl], pa.int64())
                for lbl, _, _ in PII_RULES
            },
        }
    )


def pii_scrub(ds, *, text_column: str = "text", id_column: str = "url"):
    import functools

    return ds.map_batches(
        functools.partial(
            pii_scrub_batch, text_column=text_column, id_column=id_column
        ),
        batch_format="pyarrow",
    )


# -------------------------------------------------------- decontamination


def _shingles(text: str, n: int) -> set[str]:
    words = text.split(" ")
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


class ContaminationChecker:
    """Actor-pool stage: the benchmark shingle set is fetched from the
    object store ONCE per actor (``__init__``), then every corpus
    batch is checked against it in ``__call__`` — the broadcast-join
    shape for a small benchmark side vs a 100 TB corpus.  At real
    scale the set would be a Bloom filter over ~10^8 benchmark
    n-grams (a few hundred MB, still broadcastable); the exact set
    keeps the sandbox oracle exact."""

    def __init__(self, bench_ref, shingle_n: int, threshold: int):
        import ray

        self.bench: set[str] = ray.get(bench_ref)
        self.shingle_n = shingle_n
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        overlaps = []
        for t in batch["text"].to_pylist():
            sh = _shingles(t or "", self.shingle_n)
            overlaps.append(len(sh & self.bench))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_overlap": pa.array(overlaps, pa.int64()),
                "contaminated": pa.array(
                    [o >= self.threshold for o in overlaps], pa.bool_()
                ),
            }
        )


def decontaminate(
    ds,
    benchmark_ds,
    *,
    shingle_n: int = 4,
    threshold: int = 10,
    concurrency: int = 2,
):
    """Flag corpus docs sharing ≥ ``threshold`` distinct ``shingle_n``-word
    shingles with ANY benchmark doc (the eval-set leakage check every
    training-data pipeline runs; cf. GPT-3 appendix C / Gopher §A.2).

    ``benchmark_ds`` is assumed SMALL (an eval set): its union shingle
    set is built on the driver and broadcast once.  The corpus side
    streams — no shuffle, no corpus materialization."""
    import ray

    bench: set[str] = set()
    for b in benchmark_ds.iter_batches(batch_format="pyarrow"):
        for t in b["text"].to_pylist():
            bench |= _shingles(t or "", shingle_n)
    bench_ref = ray.put(bench)
    return ds.map_batches(
        ContaminationChecker,
        fn_constructor_args=(bench_ref, shingle_n, threshold),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=0.5,
    )


# -------------------------------------------- repetition quality (Gopher)


def repetition_quality_batch(
    batch: pa.Table,
    *,
    top_2gram_max: float,
    top_3gram_max: float,
    dup_word_max: float,
) -> pa.Table:
    """Per-doc repetition signals (word-level; the corpus has no line
    structure so Gopher's line-level rules degenerate):

    - ``dup_word_frac``: 1 − n_distinct_words / n_words
    - ``top_2gram_frac``: occurrences of the most common 2-gram / n_2grams
    - ``top_3gram_frac``: likewise for 3-grams
    - ``keep``: all three under their thresholds

    Single-space tokenization, integer-ratio arithmetic only — every
    column is replicated exactly by the DuckDB oracle."""
    n_words, dup_frac, top2, top3, keep = [], [], [], [], []
    for t in batch["text"].to_pylist():
        words = (t or "").split(" ")
        nw = len(words)
        n_words.append(nw)
        df = 1.0 - len(set(words)) / nw if nw else 0.0
        dup_frac.append(df)
        fracs = []
        for n in (2, 3):
            grams = Counter(
                " ".join(words[i : i + n]) for i in range(nw - n + 1)
            )
            total = nw - n + 1
            fracs.append(max(grams.values()) / total if total > 0 else 0.0)
        top2.append(fracs[0])
        top3.append(fracs[1])
        keep.append(
            fracs[0] <= top_2gram_max
            and fracs[1] <= top_3gram_max
            and df <= dup_word_max
        )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": pa.array(n_words, pa.int64()),
            "dup_word_frac": pa.array(dup_frac, pa.float64()),
            "top_2gram_frac": pa.array(top2, pa.float64()),
            "top_3gram_frac": pa.array(top3, pa.float64()),
            "keep": pa.array(keep, pa.bool_()),
        }
    )


def repetition_quality(
    ds,
    *,
    top_2gram_max: float = 0.20,
    top_3gram_max: float = 0.18,
    dup_word_max: float = 0.80,
):
    import functools

    return ds.map_batches(
        functools.partial(
            repetition_quality_batch,
            top_2gram_max=top_2gram_max,
            top_3gram_max=top_3gram_max,
            dup_word_max=dup_word_max,
        ),
        batch_format="pyarrow",
    )


# ------------------------------------------ doc-quality rules (Gopher/C4)

# Gopher §A.1.1 document-quality rules (word count, mean word length,
# alpha-word fraction, stop-word presence) + the two C4 (Raffel et al.
# 2020 §2.2) substring rules ("lorem ipsum", curly brace).  The paper
# bounds (50–100k words, mean length 3–10) are tuned to real web text;
# this corpus is short synthetic word-stream text, so the query uses
# bounds that discriminate on it (30–90 words, mean length 4.0–5.0) —
# the RULE SHAPES are the paper's, the constants are per-corpus
# configuration, exactly as a production pipeline retunes them per
# source.  All comparisons are integer cross-multiplications so the
# DuckDB oracle reproduces `passed` bit-exactly with no float division.
STOPWORDS: tuple[str, ...] = (
    "the", "a", "of", "to", "and", "in", "is", "that", "it", "with",
)

_ALPHA_RE = re.compile(r"[A-Za-z]")


def gopher_doc_filter_batch(
    batch: pa.Table,
    *,
    min_words: int,
    max_words: int,
    mean_len_lo_x10: int,
    mean_len_hi_x10: int,
    min_stop: int,
) -> pa.Table:
    """Per-doc integer quality signals:

    - ``n_words``: single-space token count
    - ``sum_word_len``: total codepoints across words (mean word
      length = sum/n, compared via ``10*sum`` vs ``lo*n`` / ``hi*n``)
    - ``n_alpha_words``: words containing an ASCII letter (Gopher's
      80 % rule: ``5*n_alpha >= 4*n_words``)
    - ``n_stop``: words in the 10-word stop list
    - ``passed``: every rule holds and neither C4 substring occurs
    """
    stop = set(STOPWORDS)
    n_words, sum_len, n_alpha, n_stop, passed = [], [], [], [], []
    for t in batch["text"].to_pylist():
        t = t or ""
        words = t.split(" ")
        nw = len(words)
        sl = sum(len(w) for w in words)
        na = sum(1 for w in words if _ALPHA_RE.search(w))
        ns = sum(1 for w in words if w in stop)
        ok = (
            min_words <= nw <= max_words
            and mean_len_lo_x10 * nw <= 10 * sl <= mean_len_hi_x10 * nw
            and 5 * na >= 4 * nw
            and ns >= min_stop
            and "lorem ipsum" not in t
            and "{" not in t
        )
        n_words.append(nw)
        sum_len.append(sl)
        n_alpha.append(na)
        n_stop.append(ns)
        passed.append(ok)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": pa.array(n_words, pa.int64()),
            "sum_word_len": pa.array(sum_len, pa.int64()),
            "n_alpha_words": pa.array(n_alpha, pa.int64()),
            "n_stop": pa.array(n_stop, pa.int64()),
            "passed": pa.array(passed, pa.bool_()),
        }
    )


def gopher_doc_filter(
    ds,
    *,
    min_words: int = 30,
    max_words: int = 90,
    mean_len_lo_x10: int = 40,
    mean_len_hi_x10: int = 50,
    min_stop: int = 3,
):
    """Gopher document-quality gate (stateless vectorized pass; at
    100 TB this is embarrassingly parallel — no shuffle, no state)."""
    import functools

    return ds.map_batches(
        functools.partial(
            gopher_doc_filter_batch,
            min_words=min_words,
            max_words=max_words,
            mean_len_lo_x10=mean_len_lo_x10,
            mean_len_hi_x10=mean_len_hi_x10,
            min_stop=min_stop,
        ),
        batch_format="pyarrow",
    )


# --------------------------------------------------- split assignment


def _md5_u64(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:16], 16)


def split_assign_batch(
    batch: pa.Table,
    *,
    id_column: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> pa.Table:
    """Deterministic train/val/test assignment: bucket =
    md5(str(id))[:16 hex] % 100 — stable under repartitioning,
    resharding and re-runs (never ``random()``: a retried task must
    land every row in the same split).  Matches DuckDB's
    ``('0x' || substr(md5(id), 1, 16))::UBIGINT % 100`` exactly."""
    ids = batch[id_column].to_pylist()
    buckets = [_md5_u64(str(i)) % 100 for i in ids]
    splits = [
        "train" if b < train_pct else ("val" if b < train_pct + val_pct else "test")
        for b in buckets
    ]
    return pa.table(
        {
            id_column: batch[id_column],
            "bucket": pa.array(buckets, pa.int64()),
            "split": pa.array(splits, pa.string()),
        }
    )


def split_assign(ds, *, id_column: str = "doc_id", train_pct: int = 80, val_pct: int = 10):
    import functools

    return ds.map_batches(
        functools.partial(
            split_assign_batch,
            id_column=id_column,
            train_pct=train_pct,
            val_pct=val_pct,
        ),
        batch_format="pyarrow",
    )


# ------------------------------------------- DSIR-style importance select

N_FEATURE_BUCKETS = 65536


def _gram_buckets(text: str) -> list[int]:
    """Hashed word-2-gram feature stream (every occurrence, not
    distinct).  md5 is kept (not a cheap polynomial hash) so the
    DuckDB oracle replicates the buckets bit-for-bit; at 100 TB the
    hash is a per-gram CPU cost worth swapping for a vectorized
    rolling hash."""
    words = text.split(" ")
    return [
        _md5_u64(words[i] + " " + words[i + 1]) % N_FEATURE_BUCKETS
        for i in range(len(words) - 1)
    ]


def feature_counts(ds, *, is_target_fn, text_column: str = "text"):
    """Global hashed-2-gram bucket counts, split target vs raw:
    per-batch partial ``bincount`` vectors first (the combiner), then
    ONE small shuffle of ≤ 2 × 65536 rows — never a per-gram
    all-to-all."""
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        ct = np.zeros(N_FEATURE_BUCKETS, np.int64)
        cr = np.zeros(N_FEATURE_BUCKETS, np.int64)
        for i, t in zip(
            batch["doc_id"].to_pylist(), batch[text_column].to_pylist()
        ):
            b = _gram_buckets(t or "")
            acc = ct if is_target_fn(i) else cr
            if b:
                np.add.at(acc, b, 1)
        nz = np.flatnonzero(ct + cr)
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "ct": pa.array(ct[nz], pa.int64()),
                "cr": pa.array(cr[nz], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("ct", alias_name="ct"), Sum("cr", alias_name="cr"))
    )


class DsirScorer:
    """Actor-pool stage scoring raw docs against broadcast global
    bucket counts (two int64[65536] arrays ≈ 1 MB — the classic
    small-side broadcast).  A gram occurrence is 'target-like' when
    the target's relative bucket frequency exceeds the raw pool's,
    compared by integer cross-multiplication (ct[b]·Nr > cr[b]·Nt) so
    the score is exact integer arithmetic the SQL oracle reproduces
    bit-for-bit — the DSIR selection shape (Xie et al. 2023) without
    float log-ratios."""

    def __init__(self, counts_ref):
        import ray

        self.ct, self.cr, self.nt, self.nr = ray.get(counts_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_grams, n_like, selected = [], [], []
        for t in batch["text"].to_pylist():
            b = _gram_buckets(t or "")
            ng = len(b)
            nl = sum(
                1 for x in b if int(self.ct[x]) * self.nr > int(self.cr[x]) * self.nt
            )
            n_grams.append(ng)
            n_like.append(nl)
            selected.append(2 * nl >= ng)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_grams": pa.array(n_grams, pa.int64()),
                "n_target_like": pa.array(n_like, pa.int64()),
                "selected": pa.array(selected, pa.bool_()),
            }
        )


def dsir_select(
    ds,
    *,
    is_target_fn,
    text_column: str = "text",
    concurrency: int = 2,
):
    """Importance-based data selection: build global target/raw
    hashed-n-gram counts (one combiner-first aggregate), broadcast
    them once, and stream the raw pool through a scoring actor pool.
    Returns (doc_id, n_grams, n_target_like, selected) for raw docs."""
    import numpy as np
    import ray

    counts = feature_counts(ds, is_target_fn=is_target_fn, text_column=text_column)
    ct = np.zeros(N_FEATURE_BUCKETS, np.int64)
    cr = np.zeros(N_FEATURE_BUCKETS, np.int64)
    for b in counts.iter_batches(batch_format="pyarrow"):
        idx = b["bucket"].to_numpy(zero_copy_only=False)
        ct[idx] += b["ct"].to_numpy(zero_copy_only=False)
        cr[idx] += b["cr"].to_numpy(zero_copy_only=False)
    counts_ref = ray.put((ct, cr, int(ct.sum()), int(cr.sum())))

    def raw_only(batch: pa.Table) -> pa.Table:
        import numpy as _np

        keep = _np.array(
            [not is_target_fn(i) for i in batch["doc_id"].to_pylist()], bool
        )
        return batch.filter(pa.array(keep))

    return ds.map_batches(raw_only, batch_format="pyarrow").map_batches(
        DsirScorer,
        fn_constructor_args=(counts_ref,),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=0.5,
    )


# ------------------------------------------------------- domain filter

# Domain-stat tables at or under this row count broadcast via ray.put;
# larger ones attach by hash join (the web has ~10^8 registrable
# domains — far smaller than the corpus, but not driver-sized).
SMALL_DOMAIN_THRESHOLD = 200_000


def domain_stats(
    ds,
    *,
    group_column: str = "source",
    text_column: str = "text",
):
    """Per-domain integer aggregates — (domain, n_docs, n_words,
    n_stopwords) — with in-batch pre-aggregation (combiner) before the
    groupby shuffle, so the all-to-all moves one row per (batch,
    domain), not one per document.  Integer sums only: the single
    final division happens at the consumer, keeping the arithmetic
    bit-exact against a SQL oracle regardless of summation order."""
    from ray.data.aggregate import Sum

    from .textstats import STOPWORDS

    stop = set(STOPWORDS)

    def partial(batch: pa.Table) -> pa.Table:
        agg: dict[str, list[int]] = {}
        for g, t in zip(
            batch[group_column].to_pylist(), batch[text_column].to_pylist()
        ):
            words = (t or "").split(" ")
            row = agg.setdefault(g, [0, 0, 0])
            row[0] += 1
            row[1] += len(words)
            row[2] += sum(1 for w in words if w in stop)
        keys = sorted(agg)
        return pa.table(
            {
                group_column: pa.array(keys, pa.string()),
                "n_docs": pa.array([agg[k][0] for k in keys], pa.int64()),
                "n_words": pa.array([agg[k][1] for k in keys], pa.int64()),
                "n_stopwords": pa.array([agg[k][2] for k in keys], pa.int64()),
            }
        )

    return (
        ds.select_columns([group_column, text_column])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(group_column)
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_words", alias_name="n_words"),
            Sum("n_stopwords", alias_name="n_stopwords"),
        )
    )


def domain_filter(
    ds,
    *,
    group_column: str = "source",
    id_column: str = "doc_id",
    text_column: str = "text",
    min_docs: int = 1,
    min_stopword_ratio: float = 0.0,
    num_partitions: int = 16,
    small_threshold: int | None = None,
):
    """Domain-level quality gate (the RefinedWeb/C4 'judge the site,
    not just the page' pass): aggregate per-domain stats, then mark
    every document of a failing domain.  Returns one row per document:
    (id, domain, domain_n_docs, domain_stopword_ratio, keep).

    keep = domain has ≥ ``min_docs`` documents AND its corpus-level
    stopword ratio (Σ stopwords / Σ words, one exact division) ≥
    ``min_stopword_ratio``.

    Size-adaptive attach: a small domain table broadcasts once via
    ``ray.put`` (read in every task, never re-shipped per batch);
    above the threshold it attaches by hash join on the domain key."""
    import ray

    if small_threshold is None:
        small_threshold = SMALL_DOMAIN_THRESHOLD

    stats = domain_stats(
        ds, group_column=group_column, text_column=text_column
    ).materialize()
    n_domains = stats.count()

    docs = ds.select_columns([id_column, group_column])

    def decide(n_docs_arr, n_words_arr, n_stop_arr):
        import pyarrow.compute as pc

        ratio = pc.divide(
            pc.cast(n_stop_arr, pa.float64()), pc.cast(n_words_arr, pa.float64())
        )
        keep = pc.and_(
            pc.greater_equal(n_docs_arr, min_docs),
            pc.greater_equal(ratio, min_stopword_ratio),
        )
        return ratio, keep

    if n_domains <= small_threshold:
        tbl = stats.to_pandas()
        lookup = {
            g: (int(d), int(w), int(s))
            for g, d, w, s in zip(
                tbl[group_column], tbl["n_docs"], tbl["n_words"], tbl["n_stopwords"]
            )
        }
        lookup_ref = ray.put(lookup)

        def attach_small(batch: pa.Table) -> pa.Table:
            lk = ray.get(lookup_ref)
            rows = [lk[g] for g in batch[group_column].to_pylist()]
            nd = pa.array([r[0] for r in rows], pa.int64())
            nw = pa.array([r[1] for r in rows], pa.int64())
            ns = pa.array([r[2] for r in rows], pa.int64())
            ratio, keep = decide(nd, nw, ns)
            return pa.table(
                {
                    id_column: batch[id_column],
                    group_column: batch[group_column],
                    "domain_n_docs": nd,
                    "domain_stopword_ratio": ratio,
                    "keep": keep,
                }
            )

        return docs.map_batches(attach_small, batch_format="pyarrow")

    from .dedup import _coalesce_for_join, hash_join_safe

    stats, _ = _coalesce_for_join(stats)
    joined = hash_join_safe(
        docs,
        stats,
        join_type="inner",
        num_partitions=num_partitions,
        on=(group_column,),
        right_on=(group_column,),
    )

    def attach_join(batch: pa.Table) -> pa.Table:
        ratio, keep = decide(
            batch["n_docs"], batch["n_words"], batch["n_stopwords"]
        )
        return pa.table(
            {
                id_column: batch[id_column],
                group_column: batch[group_column],
                "domain_n_docs": batch["n_docs"],
                "domain_stopword_ratio": ratio,
                "keep": keep,
            }
        )

    return joined.map_batches(attach_join, batch_format="pyarrow")


# ------------------------------------------ deterministic group sampling


def sample_per_group(
    ds,
    *,
    group_column: str = "source",
    id_column: str = "doc_id",
    k: int = 5,
):
    """Deterministic stratified sampling: keep the ``k`` documents per
    group ranked lowest by ``(md5(str(id)), id)`` — a seedless,
    repartition-stable rank (a retried task or a re-run at different
    parallelism selects the identical sample, same convention as
    :func:`split_assign`).  Returns (group, id, sample_rank) with
    sample_rank in 1..k.

    Scale shape: a per-batch combiner keeps at most ``k`` rows per
    group per block BEFORE the shuffle, so the groupby moves
    O(k × groups × blocks) rows, never the corpus; the merge state is
    one group's capped candidate list.  This is the distributed
    equivalent of ``QUALIFY row_number() OVER (PARTITION BY g ORDER BY
    md5(id)) <= k`` without a full sort.
    """
    from ray.data.aggregate import AggregateFn

    def partial(batch: pa.Table) -> pa.Table:
        best: dict = {}
        for g, i in zip(
            batch[group_column].to_pylist(), batch[id_column].to_pylist()
        ):
            import hashlib as _hl

            h = _hl.md5(str(i).encode()).hexdigest()
            lst = best.setdefault(g, [])
            lst.append((h, i))
        gs, hs, ids = [], [], []
        for g, lst in best.items():
            lst.sort()
            for h, i in lst[:k]:
                gs.append(g)
                hs.append(h)
                ids.append(i)
        return pa.table(
            {
                "g": pa.array(gs, pa.string()),
                "h": pa.array(hs, pa.string()),
                "id": pa.array(ids, pa.int64()),
            }
        )

    def acc_block(acc, block):
        pairs = (
            list(zip(block["h"].to_pylist(), block["id"].to_pylist()))
            if hasattr(block, "column_names")
            else list(zip(list(block["h"]), list(block["id"])))
        )
        merged = sorted(acc + pairs)[:k]
        return merged

    agg = AggregateFn(
        init=lambda key: [],
        accumulate_block=acc_block,
        merge=lambda a, b: sorted(a + b)[:k],
        finalize=lambda acc: ",".join(f"{h}:{i}" for h, i in acc),
        name="sampled",
    )

    picked = (
        ds.select_columns([group_column, id_column])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .aggregate(agg)
    )

    def explode(batch: pa.Table) -> pa.Table:
        gs, ids, ranks = [], [], []
        for g, packed in zip(batch["g"].to_pylist(), batch["sampled"].to_pylist()):
            for rank, part in enumerate(packed.split(","), start=1):
                if not part:
                    continue
                _, i = part.split(":")
                gs.append(g)
                ids.append(int(i))
                ranks.append(rank)
        return pa.table(
            {
                group_column: pa.array(gs, pa.string()),
                id_column: pa.array(ids, pa.int64()),
                "sample_rank": pa.array(ranks, pa.int64()),
            }
        )

    return picked.map_batches(explode, batch_format="pyarrow")


# ------------------------------------------------------------ bigram LM


def lm_score(
    ds,
    ref_ds,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    num_partitions: int = 16,
    salt: int = 8,
    broadcast_threshold: int = 2_000_000,
):
    """CCNet-style LM quality score (Wenzek et al. 2020): each
    document's total bigram log-likelihood under an add-one-smoothed
    bigram model trained on a REFERENCE slice (the "wiki-side" LM of
    the CCNet pipeline, here any dataset with the same text column).

    Per-bigram term, integer fixed point so per-doc sums are
    order-independent and the DuckDB oracle reproduces them exactly::

        term_fp(w1, w2) = floor( ln( (c12+1) / (c1+V) ) * 1e9 )

    with ``c12``/``c1`` the reference bigram/unigram counts and ``V``
    the reference unigram vocabulary size.  Unseen bigrams and unseen
    left words get the smoothed floor term (c12=0, c1=0).  Returns one
    row per document: ``(doc_id, n_bigrams, logprob_fp)`` —
    ``logprob_fp / (n_bigrams * 1e9)`` is the mean log-likelihood (the
    monotone equivalent of perplexity) for downstream thresholding.

    Scale shape:

    - reference counts are combiner-first aggregates (one row per
      (bigram, block) into the shuffle, never one per occurrence);
      the count tables are vocabulary-sized and STREAM through joins —
      never a driver object, never broadcast (bigram vocabularies at
      100 TB are far beyond any single heap);
    - document bigrams reduce to (doc, w1, w2, multiplicity) rows
      before joining, so repeated bigrams inside a document cost one
      row;
    - **hot-key salting**: natural-language bigram frequency is
      Zipfian ("of the" alone is ~1% of English bigrams), so the
      doc-bigrams⋈counts join salts the probe side with
      ``doc_id % salt`` and replicates the (small per-key) count rows
      ``salt`` ways — a hot bigram spreads over ``salt`` partitions
      instead of melting one;
    - the final per-doc reduction is an integer ``groupby(doc).Sum``.
    """
    import math

    import pyarrow.compute as pc
    import ray

    from ray.data.aggregate import Sum

    from .dedup import _coalesce_for_join, _join_partitions, hash_join_safe

    nparts = _join_partitions(num_partitions)

    # --- reference counts (combiner-first) -------------------------
    # unigram and bigram counts share ONE aggregation pass: the key is
    # the token for unigrams (kind=1) and "w1\x1fw2" for bigrams
    # (kind=2) — \x1f cannot appear inside a split(" ") token of any
    # sane corpus, and the kind column disambiguates regardless.
    def ref_partial(batch: pa.Table) -> pa.Table:
        uni: Counter = Counter()
        bi: Counter = Counter()
        for t in batch[text_column].to_pylist():
            ws = (t or "").split(" ")
            uni.update(ws)
            bi.update(zip(ws, ws[1:]))
        ks, kinds, cnts = [], [], []
        for (a, b), c in bi.items():
            ks.append(a + "\x1f" + b)
            kinds.append(2)
            cnts.append(c)
        for a, c in uni.items():
            ks.append(a)
            kinds.append(1)
            cnts.append(c)
        return pa.table(
            {
                "k": pa.array(ks, pa.string()),
                "kind": pa.array(kinds, pa.int64()),
                "cnt": pa.array(cnts, pa.int64()),
            }
        )

    counts = (
        ref_ds.select_columns([text_column])
        .map_batches(ref_partial, batch_format="pyarrow")
        .groupby(["kind", "k"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .materialize()  # counted + consumed below: one execution
    )

    # ---- size-adaptive fast path: when the reference count tables
    # fit comfortably (vocabulary-bounded — the synthetic corpus and
    # most single-language slices do), broadcast them once via
    # ray.put and score each document in ONE stateless pass — no
    # shuffle joins, no salting.  The join path below is the 100 TB
    # route (web-scale bigram vocabularies exceed any single heap).
    n_count_rows = counts.count()
    if n_count_rows <= broadcast_threshold:
        tbls = [t for t in ray.get(counts.to_arrow_refs()) if t.num_rows]
        bi_map: dict = {}
        uni_map: dict = {}
        for t in tbls:
            for k, kind, c in zip(
                t["k"].to_pylist(), t["kind"].to_pylist(), t["cnt"].to_pylist()
            ):
                (bi_map if kind == 2 else uni_map)[k] = c
        maps_ref = ray.put((bi_map, uni_map))
        vocab_v = len(uni_map)

        def score_docs(batch: pa.Table, _v=vocab_v, _ref=maps_ref) -> pa.Table:
            bi, uni = ray.get(_ref)
            term_cache: dict = {}
            ids, nbs, lps = [], [], []
            for i, t in zip(
                batch[id_column].to_pylist(), batch[text_column].to_pylist()
            ):
                ws = (t or "").split(" ")
                c = Counter(zip(ws, ws[1:]))
                nb = 0
                lp = 0
                for (a, b), m in c.items():
                    key = a + "\x1f" + b
                    term = term_cache.get(key)
                    if term is None:
                        c12 = bi.get(key, 0)
                        c1 = uni.get(a, 0)
                        term = math.floor(math.log((c12 + 1) / (c1 + _v)) * 1e9)
                        term_cache[key] = term
                    nb += m
                    lp += m * term
                ids.append(i)
                nbs.append(nb)
                lps.append(lp)
            return pa.table(
                {
                    id_column: pa.array(ids, pa.int64()),
                    "n_bigrams": pa.array(nbs, pa.int64()),
                    "logprob_fp": pa.array(lps, pa.int64()),
                }
            )

        return ds.select_columns([id_column, text_column]).map_batches(
            score_docs, batch_format="pyarrow"
        )

    # ---- join path (100 TB route) ---------------------------------
    # groupby outputs carry schema-less empty blocks at high
    # parallelism — coalesce before deriving the two join inputs
    counts, _ = _coalesce_for_join(counts)

    def _kind(want: int):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            return batch.filter(_pc.equal(batch["kind"], want)).drop_columns(
                ["kind"]
            )

        return fn

    bi_counts = counts.map_batches(_kind(2), batch_format="pyarrow")
    uni_counts = counts.map_batches(_kind(1), batch_format="pyarrow").rename_columns(
        {"k": "w1"}
    )

    # V: reference unigram vocabulary size (one driver-side scalar)
    vocab_v = uni_counts.count()

    # replicate count rows `salt` ways so hot bigrams spread across
    # join partitions (probe side salts by doc_id % salt)
    def replicate(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out = pa.concat_tables([batch] * salt)
        salts = pa.array(
            [s for s in range(salt) for _ in range(n)], pa.int64()
        )
        return out.append_column("salt", salts)

    bi_salted = bi_counts.map_batches(replicate, batch_format="pyarrow")
    uni_salted = uni_counts.rename_columns({"cnt": "c1"}).map_batches(
        replicate, batch_format="pyarrow"
    )

    # --- document bigrams (multiplicity-reduced) --------------------
    def doc_bigrams(batch: pa.Table) -> pa.Table:
        ids, ks, w1s, mult, slt = [], [], [], [], []
        for i, t in zip(
            batch[id_column].to_pylist(), batch[text_column].to_pylist()
        ):
            ws = (t or "").split(" ")
            c = Counter(zip(ws, ws[1:]))
            s = i % salt
            # zero "seed" row: keeps docs with < 2 tokens present
            # through the joins and the final groupby (it matches no
            # count row; mult 0 contributes nothing to either sum)
            ids.append(i)
            ks.append("\x1f")
            w1s.append("\x1f")
            mult.append(0)
            slt.append(s)
            for (a, b), m in c.items():
                ids.append(i)
                ks.append(a + "\x1f" + b)
                w1s.append(a)
                mult.append(m)
                slt.append(s)
        return pa.table(
            {
                id_column: pa.array(ids, pa.int64()),
                "k": pa.array(ks, pa.string()),
                "w1": pa.array(w1s, pa.string()),
                "mult": pa.array(mult, pa.int64()),
                "salt": pa.array(slt, pa.int64()),
            }
        )

    dbi = ds.select_columns([id_column, text_column]).map_batches(
        doc_bigrams, batch_format="pyarrow"
    )

    joined = hash_join_safe(
        dbi,
        bi_salted.rename_columns({"cnt": "c12"}),
        join_type="left_outer",
        num_partitions=nparts,
        on=("k", "salt"),
    )
    joined = hash_join_safe(
        joined,
        uni_salted,
        join_type="left_outer",
        num_partitions=nparts,
        on=("w1", "salt"),
    )

    def term(batch: pa.Table) -> pa.Table:
        c12 = batch["c12"].fill_null(0).to_pylist()
        c1 = batch["c1"].fill_null(0).to_pylist()
        mult = batch["mult"].to_pylist()
        terms = [
            m * math.floor(math.log((a + 1) / (b + vocab_v)) * 1e9)
            for a, b, m in zip(c12, c1, mult)
        ]
        return pa.table(
            {
                id_column: batch[id_column],
                "mult": batch["mult"],
                "term_total": pa.array(terms, pa.int64()),
            }
        )

    return (
        joined.map_batches(term, batch_format="pyarrow")
        .groupby(id_column)
        .aggregate(
            Sum("mult", alias_name="n_bigrams"),
            Sum("term_total", alias_name="logprob_fp"),
        )
    )


# --------------------------------------- CCNet head/middle/tail buckets


def ccnet_buckets(
    ds,
    ref_ds,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    lang_column: str = "lang",
    salt: int = 4,
    offset_fp: int = 50_000_000_000,
    bin_fp: int = 10_000_000,
    num_partitions: int = 16,
):
    """CCNet's per-language head/middle/tail split (Wenzek et al. 2020
    §3.3): each document bucketed by which tertile of its LANGUAGE's
    LM-score distribution it falls in (head = most reference-like
    third).

    Exactness + scale, both at once, via integer binning:

    - per-doc score = :func:`lm_score`'s fixed-point bigram
      log-likelihood, reduced to an integer bin
      ``((logprob_fp + offset_fp·n) // n) // bin_fp`` (offset makes
      the numerator non-negative so ``//`` is floor on both sides;
      bin_fp=10^7 ≈ centi-nat granularity → ≤ ~5000 distinct bins);
    - the per-lang distribution is a (lang, bin) COUNT histogram —
      bounded by langs × bins, NEVER corpus-sized, so collecting it to
      the driver is safe at any corpus scale (this is the same
      histogram-not-sort trick as ``length_quantiles``);
    - tertile cutoffs use the pure-integer rule
      ``c_q = smallest bin with cumulative count ≥ ceil(q·n)``
      (``(n+2)//3`` and ``(2n+2)//3``) — no floats anywhere, so the
      DuckDB oracle reproduces every bucket decision bit-exactly.

    Returns one row per doc: ``(doc_id, lang, bin, bucket)``.
    """
    import numpy as np
    from ray.data.aggregate import Count

    from .dedup import _join_partitions, hash_join_safe

    scores = lm_score(
        ds.select_columns([id_column, text_column]),
        ref_ds,
        id_column=id_column,
        text_column=text_column,
        num_partitions=num_partitions,
        salt=salt,
    )

    def to_bin(batch: pa.Table) -> pa.Table:
        nb = batch["n_bigrams"].to_numpy(zero_copy_only=False)
        lp = batch["logprob_fp"].to_numpy(zero_copy_only=False)
        mean_fp = (lp + offset_fp * nb) // np.maximum(nb, 1)
        b = np.where(nb > 0, mean_fp // bin_fp, 0)
        return pa.table(
            {
                id_column: batch[id_column],
                "bin": pa.array(b, pa.int64()),
            }
        )

    binned = scores.map_batches(to_bin, batch_format="pyarrow")
    j = hash_join_safe(
        binned,
        ds.select_columns([id_column, lang_column]),
        on=(id_column,),
        num_partitions=_join_partitions(num_partitions),
    ).materialize()

    hist = (
        j.groupby([lang_column, "bin"])
        .aggregate(Count(alias_name="cnt"))
        .take_all()
    )  # ≤ langs × bins rows — driver-safe at any corpus size
    per_lang: dict[str, list[tuple[int, int]]] = {}
    for r in hist:
        per_lang.setdefault(r[lang_column], []).append((r["bin"], r["cnt"]))
    cuts: dict[str, tuple[int, int]] = {}
    for lang, rows in per_lang.items():
        rows.sort()
        n = sum(c for _, c in rows)
        t1, t2 = (n + 2) // 3, (2 * n + 2) // 3
        c1 = c2 = rows[-1][0]
        acc = 0
        for b, c in rows:
            acc += c
            if acc >= t1:
                c1 = b
                break
        acc = 0
        for b, c in rows:
            acc += c
            if acc >= t2:
                c2 = b
                break
        cuts[lang] = (c1, c2)

    def assign(batch: pa.Table) -> pa.Table:
        langs = batch[lang_column].to_pylist()
        bins = batch["bin"].to_pylist()
        buckets = []
        for lang, b in zip(langs, bins):
            c1, c2 = cuts[lang]
            buckets.append("tail" if b <= c1 else "middle" if b <= c2 else "head")
        return pa.table(
            {
                id_column: batch[id_column],
                lang_column: batch[lang_column],
                "bin": batch["bin"],
                "bucket": pa.array(buckets, pa.string()),
            }
        )

    return j.map_batches(assign, batch_format="pyarrow")


# ----------------------------------------- quality-weighted sampling


def weighted_sample_batch(
    batch: pa.Table, *, max_weight: int
) -> pa.Table:
    """Deterministic quality-proportional subsampling (the FineWeb
    'soft filter': instead of a hard quality cut, keep documents with
    probability proportional to a quality signal).  Seedless and
    shard-stable: ``keep ⇔ md5(doc_id) % max_weight < weight`` where
    ``weight = min(n_stopwords, max_weight)`` — a doc with weight w
    survives with exactly w/max_weight probability, independent of
    partitioning, rerun, or corpus size.  Integer arithmetic only."""
    stop = set(STOPWORDS)
    ids = batch["doc_id"].to_pylist()
    weights, keeps = [], []
    for i, t in zip(ids, batch["text"].to_pylist()):
        w = min(
            sum(1 for x in (t or "").split(" ") if x in stop), max_weight
        )
        weights.append(w)
        keeps.append(_md5_u64(str(i)) % max_weight < w)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "weight": pa.array(weights, pa.int64()),
            "keep": pa.array(keeps, pa.bool_()),
        }
    )


def weighted_sample(ds, *, max_weight: int = 8):
    """Stateless vectorized pass — embarrassingly parallel at 100 TB
    (no shuffle, no state, no driver decision)."""
    import functools

    return ds.map_batches(
        functools.partial(weighted_sample_batch, max_weight=max_weight),
        batch_format="pyarrow",
    )


# --------------------------------------------- CCNet text normalization

_DIGIT_RE = re.compile(r"[0-9]")
# explicit ASCII whitespace class: python re's \s is unicode-aware
# while DuckDB's RE2 \s is ASCII — the shared class keeps both sides
# identical (non-ASCII spaces are out of normalization scope, stated)
_WS_RE = re.compile(r"[ \t\n\r\f]+")


def ccnet_normalize_text(t: str) -> str:
    """CCNet's dedup-side text normalization (Wenzek et al. 2020 §3.1:
    lowercase, accent removal, digit unification) — the canonical form
    hashed for cross-document dedup:

    lower → strip accents (NFD, drop combining marks) → NFC →
    digits→'0' → ASCII-whitespace collapse + trim.

    Verified char-for-char against DuckDB's
    ``nfc_normalize(strip_accents(lower(…)))`` kernels on accented /
    fullwidth / CJK / ß goldens, so the oracle is exact."""
    import unicodedata

    t = (t or "").lower()
    t = "".join(
        c
        for c in unicodedata.normalize("NFD", t)
        if unicodedata.category(c) != "Mn"
    )
    t = unicodedata.normalize("NFC", t)
    t = _DIGIT_RE.sub("0", t)
    return _WS_RE.sub(" ", t).strip()


def ccnet_normalize_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "norm_text": pa.array(
                [ccnet_normalize_text(t) for t in texts], pa.large_string()
            ),
            "n_digits": pa.array(
                [len(_DIGIT_RE.findall(t or "")) for t in texts], pa.int64()
            ),
        }
    )


def ccnet_normalize(ds):
    """Stateless vectorized pass — no shuffle, no state."""
    return ds.map_batches(ccnet_normalize_batch, batch_format="pyarrow")


def mixture_sample(
    ds,
    *,
    weights_permille: dict,
    total: int,
    group_column: str = "source",
    id_column: str = "doc_id",
):
    """Training-mixture sampling: per source ``s`` select
    ``min(count_s, weights_permille[s] * total // 1000)`` documents,
    chosen by the repo-wide seedless md5-rank — the "mix sources to
    target proportions" step every pretraining data build runs (The
    Pile / DoReMi-style mixture weights).  Integer per-mille weights
    keep the quota arithmetic exact on both sides of the oracle.

    Scale shape: quotas need per-source counts (one groupby whose
    result is #sources rows — a constant, collected to the driver like
    the IVF centroids); selection reuses the
    :func:`sample_per_group` combiner at ``k = max(quota)`` (per-block
    cap before the shuffle), then a stateless filter trims each source
    to its own quota.  Unknown sources get quota 0.
    """
    counts = {
        r[group_column]: r["count()"]
        for r in ds.groupby(group_column).count().take_all()
    }
    quotas = {
        g: min(c, weights_permille.get(g, 0) * total // 1000)
        for g, c in counts.items()
    }
    kmax = max(quotas.values(), default=0)
    if kmax == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    group_column: pa.array([], pa.string()),
                    id_column: pa.array([], pa.int64()),
                    "sample_rank": pa.array([], pa.int64()),
                }
            )
        )
    ranked = sample_per_group(
        ds, group_column=group_column, id_column=id_column, k=kmax
    )

    def trim(batch: pa.Table) -> pa.Table:
        keep = [
            rank <= quotas.get(g, 0)
            for g, rank in zip(
                batch[group_column].to_pylist(), batch["sample_rank"].to_pylist()
            )
        ]
        return batch.filter(pa.array(keep, pa.bool_()))

    return ranked.map_batches(trim, batch_format="pyarrow")


def novelty_score(
    docs,
    *,
    shingle_n: int = 3,
    common_df: int = 2,
    id_column: str = "doc_id",
    text_column: str = "text",
    num_partitions: int = 16,
):
    """Per-document n-gram novelty: how much of a document's content
    is boilerplate shared with the rest of the corpus — the
    originality signal RefinedWeb-style curation uses alongside dedup
    (a doc can evade near-dup thresholds yet be mostly template).

    For each document: ``n_shingles`` = distinct word ``shingle_n``-grams,
    ``n_common`` = those whose corpus document frequency is
    ≥ ``common_df``, and ``novel`` ⇔ 2·n_common ≤ n_shingles (more
    than half the shingles are corpus-unique) — integer
    cross-multiplied, no float ratio.

    Scale shape: one (id, shingle)-distinct explode (same tokenization
    as the Jaccard family via ``_token_rows_fn``), a combiner-backed
    df groupby, ONE hash join of the df table back onto the explode
    (shingle-keyed, skew spread by the hash partitioner), then a
    per-doc count groupby — shuffles carry only (id, token) and
    (token, df) rows, never document text."""
    from ray.data.aggregate import Count, Sum

    from .dedup import _coalesce_for_join, _join_partitions, _token_rows_fn, hash_join_safe

    pairs = docs.select_columns([id_column, text_column]).map_batches(
        _token_rows_fn(id_column, text_column, shingle_n),
        batch_format="pyarrow",
    )

    df = pairs.groupby("token").aggregate(Count(alias_name="df"))
    df, _ = _coalesce_for_join(df)
    pairs, _ = _coalesce_for_join(pairs)

    joined = hash_join_safe(
        pairs,
        df,
        on=("token",),
        right_on=("token",),
        join_type="inner",
        num_partitions=_join_partitions(num_partitions),
    )

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        common = _pc.cast(
            _pc.greater_equal(batch["df"], pa.scalar(common_df, pa.int64())),
            pa.int64(),
        )
        keyed = pa.table({"id": batch["id"], "one": common})
        agg = pa.TableGroupBy(keyed, ["id"]).aggregate(
            [("one", "count"), ("one", "sum")]
        )
        return agg.rename_columns(["id", "n_part", "c_part"])

    per_doc = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("id")
        .aggregate(
            Sum("n_part", alias_name="n_shingles"),
            Sum("c_part", alias_name="n_common"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return pa.table(
            {
                id_column: batch["id"],
                "n_shingles": batch["n_shingles"],
                "n_common": batch["n_common"],
                "novel": _pc.less_equal(
                    _pc.multiply(batch["n_common"], pa.scalar(2, pa.int64())),
                    batch["n_shingles"],
                ),
            }
        )

    return per_doc.map_batches(finish, batch_format="pyarrow")


def rank_blend(
    docs,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
):
    """Rank-based multi-signal quality ensemble (the FineWeb-Edu-style
    blend: combine heterogeneous quality signals on a common scale by
    replacing each value with its corpus rank).  Signals here are the
    two cheap integer gates — word count and stop-word count — each
    mapped to ``rank = #docs with a strictly smaller value`` (ties
    share a rank, SQL ``RANK() - 1``), then summed into ``blend``.

    Scale shape: ranking never sorts the corpus.  Each signal is an
    INTEGER with a bounded value domain (word counts, rule counts —
    the repo's integer-signal convention), so its distribution is an
    exact histogram: per-block distinct-value combiner → groupby-sum
    → a value-domain-sized table collected and cumsum'd on the driver
    (bounded by the domain, never the corpus) → broadcast via
    ``ray.put`` into one stateless rank-attach pass.  Total shuffle =
    two bounded histograms."""
    import ray
    from ray.data.aggregate import Sum

    stop = set(STOPWORDS)

    def signals(batch: pa.Table) -> pa.Table:
        nw, ns = [], []
        for t in batch[text_column].to_pylist():
            words = (t or "").split(" ")
            nw.append(len(words))
            ns.append(sum(1 for w in words if w in stop))
        return pa.table(
            {
                id_column: batch[id_column],
                "n_words": pa.array(nw, pa.int64()),
                "n_stop": pa.array(ns, pa.int64()),
            }
        )

    sig = docs.select_columns([id_column, text_column]).map_batches(
        signals, batch_format="pyarrow"
    ).materialize()

    def _cum_smaller(col: str) -> dict:
        def partial(batch: pa.Table) -> pa.Table:
            agg = pa.TableGroupBy(batch.select([col]), [col]).aggregate(
                [([], "count_all")]
            )
            return agg.rename_columns([col, "n_part"])

        hist = (
            sig.map_batches(partial, batch_format="pyarrow")
            .groupby(col)
            .aggregate(Sum("n_part", alias_name="n"))
            .take_all()  # bounded by the signal's value domain
        )
        hist.sort(key=lambda r: r[col])
        cum, acc = {}, 0
        for r in hist:
            cum[r[col]] = acc
            acc += r["n"]
        return cum

    ref = ray.put((_cum_smaller("n_words"), _cum_smaller("n_stop")))

    def attach(batch: pa.Table) -> pa.Table:
        cw, cs = ray.get(ref)
        rw = [cw[v] for v in batch["n_words"].to_pylist()]
        rs = [cs[v] for v in batch["n_stop"].to_pylist()]
        return pa.table(
            {
                id_column: batch[id_column],
                "n_words": batch["n_words"],
                "n_stop": batch["n_stop"],
                "rank_len": pa.array(rw, pa.int64()),
                "rank_stop": pa.array(rs, pa.int64()),
                "blend": pa.array([a + b for a, b in zip(rw, rs)], pa.int64()),
            }
        )

    return sig.map_batches(attach, batch_format="pyarrow")


def boilerplate_strip(
    ds,
    *,
    group_column: str = "source",
    id_column: str = "doc_id",
    text_column: str = "text",
    chunk_words: int = 8,
    min_docs: int = 2,
    num_partitions: int = 16,
):
    """Per-site template/boilerplate removal — the corpus-level
    counterpart of in-page boilerplate detection (nav bars, footers,
    cookie banners repeat VERBATIM across a site's pages): a line
    (here a ``chunk_words``-word chunk, the repo's derived-line
    convention) that occurs in ≥ ``min_docs`` DISTINCT documents of
    the same ``group_column`` is template text, and every occurrence
    of it in that group is dropped.  Documents are reassembled from
    the surviving chunks (single-space join — the inverse of the
    chunking).  Returns (id, text, n_removed).

    Scale shape: explode → per-group-line document frequency over
    (md5(group+line), id) pairs only → the boilerplate line set joins
    back onto the exploded lines (hash join, no broadcast) → per-doc
    reassembly aggregate whose state is one document.  Each input row
    is one document, so a block's (hash, id) pairs are already
    globally distinct — the df groupby counts them directly."""
    import hashlib

    from ray.data.aggregate import Count, Max

    from .dedup import (
        _assemble_lines_agg,
        _coalesce_for_join,
        hash_join_safe,
    )

    docs = ds.select_columns([id_column, group_column, text_column])

    def explode(batch: pa.Table) -> pa.Table:
        ids, poss, lines, hs, nl = [], [], [], [], []
        for i, g, t in zip(
            batch[id_column].to_pylist(),
            batch[group_column].to_pylist(),
            batch[text_column].to_pylist(),
        ):
            words = (t or "").split(" ")
            chunks = [
                " ".join(words[s : s + chunk_words])
                for s in range(0, len(words), chunk_words)
            ]
            for p, line in enumerate(chunks):
                ids.append(i)
                poss.append(p)
                lines.append(line)
                hs.append(
                    hashlib.md5((g + "\x00" + line).encode("utf-8")).hexdigest()
                )
                nl.append(len(chunks))
        return pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "pos": pa.array(poss, pa.int32()),
                "line": pa.array(lines, pa.large_string()),
                "h": pa.array(hs, pa.string()),
                "n_lines": pa.array(nl, pa.int32()),
            }
        )

    exploded = docs.map_batches(explode, batch_format="pyarrow").materialize()

    pf = (
        exploded.select_columns(["h", "id"])
        .groupby(["h", "id"])
        .aggregate(Count(alias_name="dup"))
        .groupby("h")
        .aggregate(Count(alias_name="pf"))
    )
    boiler = pf.filter(expr=f"pf >= {min_docs}").select_columns(["h"])

    def mark(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "boiler", pa.array([1] * batch.num_rows, pa.int64())
        )

    # the boilerplate set is bounded by the template vocabulary —
    # materialize it so the no-boilerplate case can skip the join (an
    # all-empty aggregate output has no schema for the join to key on)
    boiler = boiler.map_batches(mark, batch_format="pyarrow").materialize()

    if boiler.count() == 0:
        kept = exploded.select_columns(["id", "pos", "line", "n_lines"])
    else:
        boiler, _ = _coalesce_for_join(boiler)
        joined = hash_join_safe(
            exploded,
            boiler,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("h",),
            right_on=("h",),
        )

        def keep_non_boiler(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            return batch.filter(_pc.is_null(batch["boiler"])).select(
                ["id", "pos", "line", "n_lines"]
            )

        kept = joined.map_batches(keep_non_boiler, batch_format="pyarrow")

    assembled = kept.groupby("id").aggregate(
        _assemble_lines_agg(text_column, sep=" "),
        Count(alias_name="n_kept"),
        Max("n_lines", alias_name="n_lines"),
    ).materialize()

    ids_only = (
        exploded.select_columns(["id", "n_lines"])
        .groupby("id")
        .aggregate(Max("n_lines", alias_name="n_total"))
    )
    ids_only, _ = _coalesce_for_join(ids_only)

    if assembled.count() == 0:
        # EVERY line everywhere was boilerplate (all docs of each
        # source identical): the empty aggregate has no schema to
        # join on — emit empty text / n_removed = n_total directly
        def all_removed(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    id_column: batch["id"],
                    text_column: pa.array(
                        [""] * batch.num_rows, pa.large_string()
                    ),
                    "n_removed": pa.compute.cast(
                        batch["n_total"], pa.int64()
                    ),
                }
            )

        return ids_only.map_batches(all_removed, batch_format="pyarrow")

    assembled, _ = _coalesce_for_join(assembled)
    full = hash_join_safe(
        ids_only,
        assembled,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("id",),
        right_on=("id",),
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        text = _pc.coalesce(
            _pc.cast(batch[text_column], pa.large_string()),
            pa.scalar("", pa.large_string()),
        )
        n_kept = _pc.coalesce(batch["n_kept"], pa.scalar(0, pa.int64()))
        removed = _pc.subtract(
            _pc.cast(batch["n_total"], pa.int64()), _pc.cast(n_kept, pa.int64())
        )
        return pa.table(
            {
                id_column: batch["id"],
                text_column: text,
                "n_removed": removed,
            }
        )

    return full.map_batches(finish, batch_format="pyarrow")
