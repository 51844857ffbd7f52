"""Inverted-index construction over the document corpus.

The search-engine-adjacent half of a crawl pipeline: once pages are
extracted and curated, the corpus is indexed — per token, a document
frequency and a (capped) posting list.  This is also the building
block the repo's BM25/TF-IDF operators conceptually sit on.

Scale shape:

- per-batch set pre-aggregation emits DISTINCT (token, doc) rows per
  block (a token repeated inside a document costs one row);
- cross-block dups collapse with a (token, doc) groupby before the
  token-level reduction, so df is exact;
- posting lists are CAPPED at ``k`` ids via a bounded smallest-k
  accumulator (state never exceeds ~4k ids per group, even for
  stop-word tokens whose true df is corpus-scale) — the standard
  impact-ordered-index truncation, with the exact df kept alongside;
- output is one row per token — vocabulary-sized, never corpus-sized.
"""

from __future__ import annotations

import pyarrow as pa


def _smallest_k_agg(col: str, k: int, *, name: str = "postings"):
    """AggregateFn keeping the ``k`` smallest values of ``col``,
    finalized as a comma-joined ascending string (Arrow/SQL-friendly,
    hash-comparable).  Accumulated state is pruned whenever it
    exceeds ``4k`` ids, so hot groups stay bounded."""
    from ray.data.aggregate import AggregateFn

    def _prune(acc: list) -> list:
        if len(acc) > 4 * k:
            acc = sorted(acc)[:k]
        return acc

    def acc_block(acc, block):
        vals = (
            block[col].to_pylist()
            if hasattr(block, "column_names")
            else list(block[col])
        )
        return _prune(acc + vals)

    return AggregateFn(
        init=lambda key: [],
        accumulate_block=acc_block,
        merge=lambda a, b: _prune(a + b),
        finalize=lambda acc: ",".join(str(x) for x in sorted(acc)[:k]),
        name=name,
    )


def build_postings(
    ds,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    k: int = 16,
):
    """Corpus → inverted index: one row per token with the exact
    document frequency and the ``k`` lowest doc ids as a comma-joined
    posting string.  Single-space tokenization (the repo-wide
    SQL-replicable convention)."""
    from ray.data.aggregate import Count

    def explode(batch: pa.Table) -> pa.Table:
        seen = set()
        for d, t in zip(
            batch[id_column].to_pylist(), batch[text_column].to_pylist()
        ):
            for w in set((t or "").split(" ")):
                seen.add((w, d))
        toks, ids = [], []
        for w, d in seen:
            toks.append(w)
            ids.append(d)
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "doc": pa.array(ids, pa.int64()),
            }
        )

    distinct = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["token", "doc"])
        .aggregate(Count(alias_name="dup"))
    )
    return (
        distinct.select_columns(["token", "doc"])
        .groupby("token")
        .aggregate(
            Count(alias_name="df"),
            _smallest_k_agg("doc", k),
        )
    )
