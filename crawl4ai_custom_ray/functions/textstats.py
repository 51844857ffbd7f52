"""Text analysis stages: token counting, quality scoring, language ID,
document fingerprinting.

All are stateless ``map_batches`` transforms; the language identifier
is a callable class (per-actor profile setup).  Formulas that have
DuckDB oracles (token count, quality metrics) are defined with exact
SQL-replicable arithmetic.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import pyarrow.compute as pc

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
_PUNCT_RE = re.compile(r"[.!?,;:]")


def token_count_batch(batch: pa.Table, *, text_column: str = "text") -> pa.Table:
    """n_tokens = whitespace-split count; n_chars = len(text)."""
    texts = batch[text_column].to_pylist()
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array([len(t.split(" ")) for t in texts], pa.int64()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def quality_batch(batch: pa.Table, *, text_column: str = "text") -> pa.Table:
    """Quality signals (SQL-replicable):
    - n_words: whitespace token count
    - mean_word_len: n_non_space_chars / n_words
    - stopword_ratio: tokens ∈ STOPWORDS / n_words
    - punct_ratio: punctuation chars / n_chars
    """
    texts = batch[text_column].to_pylist()
    n_words, mean_len, stop_ratio, punct_ratio = [], [], [], []
    for t in texts:
        words = t.split(" ")
        nw = len(words)
        n_words.append(nw)
        non_space = sum(len(w) for w in words)
        mean_len.append(non_space / nw if nw else 0.0)
        stop_ratio.append(sum(1 for w in words if w in STOPWORDS) / nw if nw else 0.0)
        punct_ratio.append(len(_PUNCT_RE.findall(t)) / len(t) if t else 0.0)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": pa.array(n_words, pa.int64()),
            "mean_word_len": pa.array(mean_len, pa.float64()),
            "stopword_ratio": pa.array(stop_ratio, pa.float64()),
            "punct_ratio": pa.array(punct_ratio, pa.float64()),
        }
    )


# ------------------------------------------------------------- language id

# Tiny per-language profiles: characteristic words + character patterns.
# A pragmatic n-gram/function-word heuristic (no model downloads).
_LANG_PROFILES: dict[str, tuple[set[str], str]] = {
    "en": ({"the", "and", "of", "to", "is", "in", "that", "it", "with", "for"}, ""),
    "de": ({"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"}, "äöüß"),
    "fr": ({"le", "la", "les", "et", "est", "une", "des", "que", "dans", "pour"}, "éèêàçô"),
    "es": ({"el", "la", "los", "las", "y", "es", "una", "que", "en", "por"}, "ñ¿¡áíó"),
    "it": ({"il", "la", "di", "che", "e", "un", "per", "con", "del", "sono"}, "àèì"),
}


class LanguageId:
    """Actor-pool language identifier: profiles compiled once per
    actor (``__init__``), scored per batch (``__call__``) — the
    canonical stateful ``map_batches`` stage shape."""

    def __init__(self):
        self.profiles = {
            lang: (words, set(chars)) for lang, (words, chars) in _LANG_PROFILES.items()
        }
        self.word_re = re.compile(r"[^\W\d_]+", re.UNICODE)

    def predict(self, text: str) -> tuple[str, float]:
        words = [w.lower() for w in self.word_re.findall(text)]
        if not words:
            return "und", 0.0
        best_lang, best_score = "und", 0.0
        charset = set(text)
        for lang, (stop, chars) in self.profiles.items():
            hits = sum(1 for w in words if w in stop)
            score = hits / len(words)
            if chars & charset:
                score += 0.2
            if score > best_score:
                best_lang, best_score = lang, score
        # raw double (no rounding): keeps the score bit-identical to
        # the DuckDB oracle (Python round() is banker's, SQL is
        # half-away — they disagree on e.g. 1/32)
        return (best_lang if best_score > 0.02 else "und", best_score)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        preds = [self.predict(t) for t in texts]
        out = batch.select(
            [c for c in ("doc_id", "url", "lang") if c in batch.column_names]
        )
        out = out.append_column("pred_lang", pa.array([p[0] for p in preds], pa.string()))
        return out.append_column(
            "lang_score", pa.array([p[1] for p in preds], pa.float64())
        )


def language_id(ds, *, concurrency: int = 2, batch_size: int = 1024):
    # num_cpus=0.5: never let the pool reserve every core (deadlock guard)
    return ds.map_batches(
        LanguageId,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        num_cpus=0.5,
    )


# ----------------------------------------------------------- fingerprint


def rolling_fingerprint(text: str, *, window: int = 8, keep: int = 4) -> list[int]:
    """Winnowing-style document fingerprint: 64-bit hashes of
    ``window``-token windows, keep the ``keep`` smallest (published
    scheme: Schleimer et al., SIGMOD'03 winnowing).  Window hashes are
    md5-prefix (first 8 bytes, big-endian) so the whole fingerprint is
    reproducible in the DuckDB oracle."""
    tokens = text.split()
    if not tokens:
        return []
    if len(tokens) <= window:
        windows = [" ".join(tokens)]
    else:
        windows = [" ".join(tokens[i : i + window]) for i in range(len(tokens) - window + 1)]
    hashes = sorted(
        int.from_bytes(hashlib.md5(w.encode("utf-8")).digest()[:8], "big")
        for w in windows
    )
    return hashes[:keep]


def fingerprint_batch(batch: pa.Table, *, text_column: str = "text") -> pa.Table:
    """Exploded (doc_id, rank, fp_hash) rows — scalar columns so the
    driver's order-insensitive value hash is well-defined (a
    list<uint64> column hashes implementation-dependently)."""
    ids_out, ranks, hashes = [], [], []
    for i, t in zip(batch["doc_id"].to_pylist(), batch[text_column].to_pylist()):
        for r, h in enumerate(rolling_fingerprint(t), start=1):
            ids_out.append(i)
            ranks.append(r)
            hashes.append(h)
    return pa.table(
        {
            "doc_id": pa.array(ids_out, pa.int64()),
            "rank": pa.array(ranks, pa.int64()),
            "fp_hash": pa.array(hashes, pa.uint64()),
        }
    )


# ----------------------------------------------------------- vocabulary


def vocab_topk(
    ds,
    *,
    k: int = 100,
    text_column: str = "text",
):
    """Global vocabulary by document frequency: top-``k`` tokens by
    (df desc, token asc).  The per-batch combiner counts each token
    once per document BEFORE the shuffle, so the groupby moves one
    (token, partial-df) row per batch instead of one per occurrence;
    the final sort runs over the vocabulary-sized aggregate, never the
    corpus."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[text_column].to_pylist():
            c.update(set((t or "").split(" ")))
        toks = sorted(c)
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "df_part": pa.array([c[t] for t in toks], pa.int64()),
            }
        )

    df = (
        ds.select_columns([text_column])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("df_part", alias_name="df"))
    )
    # top-k with deterministic ties: df desc, token asc.  sort+limit
    # gets limit pushdown into the sort's merge, and the input here is
    # vocabulary-sized (post-aggregate), not corpus-sized.
    return df.sort(["df", "token"], descending=[True, False]).limit(k)


# ------------------------------------------------------ sequence packing


def pack_sequences(
    ds,
    *,
    budget: int,
    group_column: str = "source",
    id_column: str = "doc_id",
    text_column: str = "text",
    bucket_width: int = 1 << 13,
):
    """GPT-style sequence packing assignment: within each
    ``group_column`` partition, documents (in ``id_column`` order) are
    concatenated into training sequences of ``budget`` tokens;
    ``seq_index`` = which sequence a document starts in (exclusive
    running token count // budget) — the deterministic cut-at-boundary
    policy that lets every shard pack independently.  Returns
    (group, id, n_tokens, seq_index).  NULL text counts 0 tokens
    (matching the oracle's NULL semantics).

    Distributed prefix sum in two passes — no per-group state ever
    exceeds ``bucket_width`` rows, so there is NO unbounded group on
    the (low-cardinality, potentially skewed) group key:

    1. bucket = id // bucket_width; per-block partial sums combine
       into a tiny (group, bucket, sum) table (corpus_rows /
       bucket_width rows total — e.g. ~1.2M rows for 10^10 docs at
       the default width, safely driver-sized) from which exclusive
       per-bucket offsets are computed and broadcast via ``ray.put``.
    2. one groupby on the HIGH-cardinality (group, bucket) key;
       each bounded group sorts by id, takes a vectorized exclusive
       cumsum, and adds its broadcast bucket offset.
    """
    import numpy as np
    import ray

    from ray.data.aggregate import Sum

    bucket_col = "__pack_bucket"

    def count_tokens(batch: pa.Table) -> pa.Table:
        texts = batch[text_column].to_pylist()
        ids = batch[id_column]
        return pa.table(
            {
                group_column: batch[group_column],
                id_column: ids,
                "n_tokens": pa.array(
                    [0 if t is None else len(t.split(" ")) for t in texts],
                    pa.int64(),
                ),
                # ids are nonnegative, so trunc division == floor
                bucket_col: pc.divide(ids, bucket_width),
            }
        )

    counted = ds.select_columns(
        [group_column, id_column, text_column]
    ).map_batches(count_tokens, batch_format="pyarrow")

    # Pass 1: per-block combiner → (group, bucket) sums.  The result
    # is corpus_rows/bucket_width rows — bounded and tiny relative to
    # the corpus, so the driver-side offset walk below is safe.
    def partial_sums(batch: pa.Table) -> pa.Table:
        t = batch.group_by([group_column, bucket_col]).aggregate(
            [("n_tokens", "sum")]
        )
        return t.rename_columns([group_column, bucket_col, "part"])

    sums = (
        counted.map_batches(partial_sums, batch_format="pyarrow")
        .groupby([group_column, bucket_col])
        .aggregate(Sum("part", alias_name="bucket_sum"))
        .to_pandas()  # bounded: one row per (group, bucket)
    )
    sums = sums.sort_values([group_column, bucket_col]).reset_index(drop=True)
    csum = sums.groupby(group_column)["bucket_sum"].cumsum() - sums["bucket_sum"]
    offsets = {
        (g, int(b)): int(o)
        for g, b, o in zip(sums[group_column], sums[bucket_col], csum)
    }
    offsets_ref = ray.put(offsets)

    def pack_bucket(grp):
        grp = grp.sort_values(id_column).reset_index(drop=True)
        off = ray.get(offsets_ref)[
            (grp[group_column].iloc[0], int(grp[bucket_col].iloc[0]))
        ]
        toks = grp["n_tokens"].to_numpy()
        prev = off + np.concatenate(([0], np.cumsum(toks)[:-1]))
        grp["seq_index"] = prev // budget
        return grp.drop(columns=[bucket_col])

    return counted.groupby([group_column, bucket_col]).map_groups(
        pack_bucket, batch_format="pandas"
    )


# -------------------------------------------------- exact length quantiles


def length_quantiles(
    ds,
    *,
    text_column: str = "text",
    quantiles: tuple = (0.25, 0.5, 0.75, 0.9, 0.99),
):
    """EXACT corpus-length quantiles via a histogram aggregation —
    the scale-safe replacement for a global sort: token counts are
    small integers, so each block reduces to a (length, count)
    histogram before the shuffle and the groupby moves only distinct
    lengths (thousands of rows at any corpus size, vs a corpus-wide
    sort).  The final cumulative walk runs over that tiny table.

    Quantile rule is DuckDB's ``quantile_disc``: the sorted element at
    index ``max(0, ceil(q*n) - 1)`` — exact, not an approximate
    sketch, so the oracle matches bit-for-bit.  Tokenization matches
    :func:`token_count_batch` (split on a single space).

    Returns a pyarrow Table (q: double, value: int64) — the result is
    ``len(quantiles)`` rows, never corpus-sized.
    """
    import math

    def hist(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c = Counter(len(t.split(" ")) for t in batch[text_column].to_pylist())
        return pa.table(
            {
                "nw": pa.array(list(c.keys()), pa.int64()),
                "cnt": pa.array(list(c.values()), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    h = (
        ds.select_columns([text_column])
        .map_batches(hist, batch_format="pyarrow")
        .groupby("nw")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .sort("nw")
        .take_all()
    )  # distinct lengths only — tiny at any scale
    lengths = [r["nw"] for r in h]
    counts = [r["cnt"] for r in h]
    n = sum(counts)
    out_q, out_v = [], []
    for q in quantiles:
        target = max(0, math.ceil(q * n) - 1)
        acc = 0
        val = lengths[-1] if lengths else 0
        for L, c in zip(lengths, counts):
            if acc + c > target:
                val = L
                break
            acc += c
        out_q.append(float(q))
        out_v.append(int(val))
    return pa.table(
        {"q": pa.array(out_q, pa.float64()), "value": pa.array(out_v, pa.int64())}
    )


# ------------------------------------------------------------- tf-idf


def tfidf_topk(
    ds,
    *,
    k: int = 5,
    id_column: str = "doc_id",
    text_column: str = "text",
    num_partitions: int = 16,
    broadcast_threshold: int = 2_000_000,
):
    """Per-document top-``k`` tokens by TF-IDF, integer-exact ordering.

    ``score_fp = floor(tf * ln(N / df) * 1e6)`` — fixed-point so the
    rank order (score desc, token asc) is total and bit-identical at
    any parallelism, and so the DuckDB oracle (same expression over
    doubles, same libm) reproduces it exactly.  Tokenization matches
    :func:`token_count_batch` (split on a single space).

    Scale shape (nothing corpus-sized ever sits in one place):

    - stage 1: one ``(doc, token, tf)`` row per DISTINCT token per
      document — ``tf`` is already complete because a document's text
      lives in a single input row;
    - ``df``: per-batch partial counts, then a vocabulary-sized
      ``groupby(token).Sum`` — the shuffle moves one row per (token,
      block), never one per occurrence;
    - ``tok ⋈ df`` hash join on ``token`` (the df side is
      vocabulary-sized but streams through the join — never a driver
      object or broadcast);
    - per-doc top-k: ``groupby(doc_id)`` with a capped accumulator
      (the :func:`~crawl4ai_custom_ray.functions.curation.sample_per_group`
      trick) — merge state is at most ``k`` candidates per group, so
      the reduce is O(k) memory regardless of document length.

    Returns exploded scalar rows ``(doc_id, rank, token, tf, df,
    score_fp)`` with rank in 1..k.
    """
    import math
    from collections import Counter

    from ray.data.aggregate import AggregateFn, Sum

    n_docs = ds.count()

    def tf_rows(batch: pa.Table) -> pa.Table:
        ids, toks, tfs = [], [], []
        for i, t in zip(
            batch[id_column].to_pylist(), batch[text_column].to_pylist()
        ):
            c = Counter((t or "").split(" "))
            for tok in sorted(c):
                ids.append(i)
                toks.append(tok)
                tfs.append(c[tok])
        return pa.table(
            {
                id_column: pa.array(ids, pa.int64()),
                "token": pa.array(toks, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
            }
        )

    tok = ds.select_columns([id_column, text_column]).map_batches(
        tf_rows, batch_format="pyarrow"
    )
    # materialize: tok feeds BOTH the df aggregate and the join below —
    # without it the tokenize pass runs twice (and two plans race for
    # the same session resources)
    tok = tok.materialize()

    def df_partial(batch: pa.Table) -> pa.Table:
        c = Counter(batch["token"].to_pylist())
        toks = sorted(c)
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "df_part": pa.array([c[t] for t in toks], pa.int64()),
            }
        )

    df = (
        tok.select_columns(["token"])
        .map_batches(df_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("df_part", alias_name="df"))
    )

    # ---- size-adaptive fast path: a vocabulary-bounded df table
    # broadcasts once and every document computes its own top-k
    # locally (a doc's tokens all live in its row) — no join, no
    # top-k shuffle.  The join route below is the 100 TB path for
    # vocabularies beyond a single heap.
    df = df.materialize()
    if df.count() <= broadcast_threshold:
        import ray as _ray

        df_map: dict = {}
        for t in _ray.get(df.to_arrow_refs()):
            if t.num_rows:
                df_map.update(zip(t["token"].to_pylist(), t["df"].to_pylist()))
        df_ref = _ray.put(df_map)
        cmpl = 10**19

        def topk_local(batch: pa.Table, _n=n_docs, _ref=df_ref) -> pa.Table:
            dfm = _ray.get(_ref)
            ids, ranks, toks, tfs, dfs, fps = [], [], [], [], [], []
            for i, t in zip(
                batch[id_column].to_pylist(), batch[text_column].to_pylist()
            ):
                c = Counter((t or "").split(" "))
                packed = []
                for tok_, tf_ in c.items():
                    dfv = dfm[tok_]
                    s = int(math.floor(tf_ * math.log(_n / dfv) * 1e6))
                    # identical pack-string ordering to the distributed
                    # accumulator: (score desc, token asc)
                    packed.append((f"{cmpl - s:020d}\x1f{tok_}", tok_, tf_, dfv, s))
                packed.sort()
                for rank, (_key, tok_, tf_, dfv, s) in enumerate(
                    packed[:k], start=1
                ):
                    ids.append(i)
                    ranks.append(rank)
                    toks.append(tok_)
                    tfs.append(tf_)
                    dfs.append(dfv)
                    fps.append(s)
            return pa.table(
                {
                    id_column: pa.array(ids, pa.int64()),
                    "rank": pa.array(ranks, pa.int64()),
                    "token": pa.array(toks, pa.string()),
                    "tf": pa.array(tfs, pa.int64()),
                    "df": pa.array(dfs, pa.int64()),
                    "score_fp": pa.array(fps, pa.int64()),
                }
            )

        return ds.select_columns([id_column, text_column]).map_batches(
            topk_local, batch_format="pyarrow"
        )

    from .dedup import _coalesce_for_join, hash_join_safe

    # groupby outputs carry schema-less empty blocks at high
    # parallelism — coalesce before using as a join input
    df, _ = _coalesce_for_join(df)
    joined = hash_join_safe(
        tok, df, on=("token",), num_partitions=num_partitions
    )

    def score(batch: pa.Table) -> pa.Table:
        tfs = batch["tf"].to_pylist()
        dfs = batch["df"].to_pylist()
        fp = [
            int(math.floor(tf * math.log(n_docs / dfv) * 1e6))
            for tf, dfv in zip(tfs, dfs)
        ]
        return batch.append_column("score_fp", pa.array(fp, pa.int64()))

    scored = joined.map_batches(score, batch_format="pyarrow")

    # capped top-k accumulator keyed by doc.  Each candidate is ONE
    # packed string whose lexicographic order IS (score desc, token
    # asc): a fixed-width zero-padded complement of score_fp, then the
    # token, then the payload fields.  Strings (vs tuples) keep the
    # intermediate accumulator state natively Arrow-convertible, so
    # shuffle blocks never fall back to pickled object columns.
    _CMPL = 10**19  # > any score_fp (tf ≤ doc len, ln(N/df) ≤ ln N)

    def _pack(block):
        cols = ("score_fp", "token", "tf", "df")
        if hasattr(block, "column_names"):
            vals = [block[c].to_pylist() for c in cols]
        else:
            vals = [list(block[c]) for c in cols]
        return [
            f"{_CMPL - s:020d}\x1f{t}\x1f{tf}\x1f{dfv}\x1f{s}"
            for s, t, tf, dfv in zip(*vals)
        ]

    agg = AggregateFn(
        init=lambda key: [],
        accumulate_block=lambda acc, block: sorted(acc + _pack(block))[:k],
        merge=lambda a, b: sorted(a + b)[:k],
        finalize=lambda acc: "\x1e".join(
            rec.split("\x1f", 1)[1] for rec in acc
        ),
        name="topk",
    )

    picked = scored.groupby(id_column).aggregate(agg)

    def explode(batch: pa.Table) -> pa.Table:
        ids, ranks, toks, tfs, dfs, fps = [], [], [], [], [], []
        for i, packed in zip(
            batch[id_column].to_pylist(), batch["topk"].to_pylist()
        ):
            if not packed:
                continue
            for rank, rec in enumerate(packed.split("\x1e"), start=1):
                t, tf, dfv, s = rec.split("\x1f")
                ids.append(i)
                ranks.append(rank)
                toks.append(t)
                tfs.append(int(tf))
                dfs.append(int(dfv))
                fps.append(int(s))
        return pa.table(
            {
                id_column: pa.array(ids, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
                "token": pa.array(toks, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
                "df": pa.array(dfs, pa.int64()),
                "score_fp": pa.array(fps, pa.int64()),
            }
        )

    return picked.map_batches(explode, batch_format="pyarrow")


def pmi_pairs(
    docs,
    *,
    text_column: str = "text",
    window: int = 3,
    min_count: int = 10,
    top_k: int = 100,
    num_partitions: int = 8,
):
    """Top-k co-occurring token pairs by PMI lift — the collocation /
    phrase-mining signal (Church & Hanks 1990).  A pair is two tokens
    of the same document at positions ``0 < j - i <= window``,
    canonicalized to lexicographic order; its lift is

        lift_ppm = floor(n_pair · T² · 10⁶ / (P · n_a · n_b))

    (T = total tokens, P = total pairs) — the integer-exact monotone
    transform of PMI (log of lift/10⁶), so ranking matches PMI and the
    score is bit-identical at any parallelism.  Output: the ``top_k``
    pairs with ``n_pair >= min_count`` ordered by
    (lift desc, n_pair desc, tok_a, tok_b) — a total order, so the
    cutoff is deterministic.

    Scale shape: pair counting is fully combiner-first — each block
    emits one row per DISTINCT pair it contains (vectorized numpy
    shifts + np.unique, no Python loop over token pairs), so the
    shuffle carries vocabulary²-bounded rows, never corpus positions.
    Unigram attach is two hash joins of the pair table onto the
    unigram table (skew spread by the hash partitioner); T and P are
    single-row aggregates (bounded driver scalars).  Tokenization is
    ``text.split(' ')`` — the same convention as vocab/tfidf and their
    SQL oracles."""
    import numpy as np
    from ray.data.aggregate import Sum

    from .dedup import _coalesce_for_join, _join_partitions, hash_join_safe

    def pair_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "tok_a": pa.array([], pa.string()),
                "tok_b": pa.array([], pa.string()),
                "n_part": pa.array([], pa.int64()),
            }
        )
        texts = batch[text_column].to_pylist()
        toks_list = [t.split(" ") for t in texts if t]
        if not toks_list:
            return empty
        all_toks = np.concatenate([np.asarray(t, dtype=object) for t in toks_list])
        doc_idx = np.repeat(
            np.arange(len(toks_list)), [len(t) for t in toks_list]
        )
        # factorize tokens ONCE per block (O(n) hash), then rank codes
        # by lexicographic vocab order so code-min/max == string-min/max
        # — pair instances become int64 keys instead of wide fixed-width
        # unicode rows, so the distinct-count sort runs over 8-byte ints
        import pandas as pd

        raw_codes, vocab = pd.factorize(all_toks, sort=False)
        vocab = np.asarray(vocab, dtype=object)
        order = np.argsort(vocab.astype(str), kind="stable")
        rank = np.empty(len(order), dtype=np.int64)
        rank[order] = np.arange(len(order), dtype=np.int64)
        codes = rank[raw_codes]
        vocab_sorted = vocab[order]
        V = np.int64(len(vocab_sorted))

        keys = []
        for off in range(1, window + 1):
            if off >= len(codes):
                break
            same = doc_idx[:-off] == doc_idx[off:]
            ca = codes[:-off][same]
            cb = codes[off:][same]
            keys.append(np.minimum(ca, cb) * V + np.maximum(ca, cb))
        if not keys:
            return empty
        uniq, cnt = np.unique(np.concatenate(keys), return_counts=True)
        lo = (uniq // V).astype(np.intp)
        hi = (uniq % V).astype(np.intp)
        return pa.table(
            {
                "tok_a": pa.array(vocab_sorted[lo].tolist(), pa.string()),
                "tok_b": pa.array(vocab_sorted[hi].tolist(), pa.string()),
                "n_part": pa.array(cnt, pa.int64()),
            }
        )

    pairs = (
        docs.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["tok_a", "tok_b"])
        .aggregate(Sum("n_part", alias_name="n_pair"))
    ).materialize()

    def uni_partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_column].to_pylist()
        toks = [w for t in texts if t for w in t.split(" ")]
        if not toks:
            return pa.table(
                {"token": pa.array([], pa.string()), "n_part": pa.array([], pa.int64())}
            )
        import pandas as pd

        codes, vocab = pd.factorize(np.asarray(toks, dtype=object), sort=False)
        return pa.table(
            {
                "token": pa.array(vocab.tolist(), pa.string()),
                "n_part": pa.array(np.bincount(codes).astype(np.int64), pa.int64()),
            }
        )

    uni = (
        docs.map_batches(uni_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n_part", alias_name="n"))
    )
    uni, _ = _coalesce_for_join(uni)

    # bounded single-row aggregates → driver scalars
    T = uni.aggregate(Sum("n"))["sum(n)"]
    P = pairs.aggregate(Sum("n_pair"))["sum(n_pair)"]
    if not P:
        # no co-occurring pair anywhere (e.g. every doc is a single
        # token): an all-empty aggregate output has no schema for the
        # joins to key on — short-circuit to the typed empty result
        import ray.data as _rd

        return _rd.from_arrow(
            pa.table(
                {
                    "tok_a": pa.array([], pa.string()),
                    "tok_b": pa.array([], pa.string()),
                    "n_pair": pa.array([], pa.int64()),
                    "lift_ppm": pa.array([], pa.int64()),
                }
            )
        )

    # min_count push-down: pairs below the cutoff can never reach the
    # output, so the joins only carry surviving collocations.  P — the
    # PMI denominator — was summed ABOVE this filter, so scores are
    # unchanged; the surviving-pair table is what drops both joins
    # under hash_join_safe's local-path threshold at bench scale.
    def keep_frequent(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch["n_pair"], min_count))

    pairs, _ = _coalesce_for_join(
        pairs.map_batches(keep_frequent, batch_format="pyarrow")
    )

    nparts = _join_partitions(num_partitions)
    j1 = hash_join_safe(
        pairs, uni, on=("tok_a",), right_on=("token",), join_type="inner",
        num_partitions=nparts,
    ).rename_columns({"n": "n_a"})
    j2 = hash_join_safe(
        j1, uni, on=("tok_b",), right_on=("token",), join_type="inner",
        num_partitions=nparts,
    ).rename_columns({"n": "n_b"})

    def score(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        t = batch.filter(_pc.greater_equal(batch["n_pair"], min_count))
        # Python bigints: n_pair·T²·10⁶ exceeds int64; the table here
        # is the already-aggregated pair vocabulary, not the corpus
        lifts = [
            (np_ * T * T * 1_000_000) // (P * na * nb)
            for np_, na, nb in zip(
                t["n_pair"].to_pylist(),
                t["n_a"].to_pylist(),
                t["n_b"].to_pylist(),
            )
        ]
        return pa.table(
            {
                "tok_a": t["tok_a"],
                "tok_b": t["tok_b"],
                "n_pair": t["n_pair"],
                "lift_ppm": pa.array(lifts, pa.int64()),
            }
        )

    scored = j2.map_batches(score, batch_format="pyarrow")
    return scored.sort(
        ["lift_ppm", "n_pair", "tok_a", "tok_b"],
        descending=[True, True, False, False],
    ).limit(top_k)
