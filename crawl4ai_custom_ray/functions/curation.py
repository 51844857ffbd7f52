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
