"""Mergeable sketches for corpus-scale diagnostics: HyperLogLog
distinct counting and count-min frequency estimation.

At the 100 TB design point "how many distinct URLs has the frontier
seen" and "how hot is this host/user" are questions you cannot afford
to answer with an exact global distinct/groupby every round.  Both
sketches here are classic mergeable summaries (Flajolet et al. 2007
HyperLogLog; Cormode & Muthukrishnan 2005 count-min) expressed
Ray-Data-first:

- every block combines locally inside ``map_batches`` (per-block
  register maxima / cell counts — bounded output per block regardless
  of block size),
- one tiny ``groupby`` merges registers (≤ ``m`` rows for HLL,
  ``d·w`` rows for CMS — constants, not corpus-sized),
- estimators use INTEGER-ONLY arithmetic (the HLL harmonic sum is an
  exact sum of ``2^(64-rank)`` in Python bigints / DuckDB HUGEINT) so
  the DuckDB oracle reproduces every output bit-for-bit.

Hash convention: the repo-wide seedless hash
``int(md5(str(x)).hexdigest()[:16], 16)`` ≡ SQL
``('0x' || substr(md5(x), 1, 16))::UBIGINT`` (see
``functions/curation.py:_md5_u64``), so both sides bucket identically.

The reference has no sketches beyond its bloom-filter URL-seen set
(``deep_crawling/crazy.py:102-165``); these extend that spirit to
cardinality/frequency estimation over crawl tables.
"""

from __future__ import annotations

import pyarrow as pa

from .curation import _md5_u64

# -------------------------------------------------------------- HLL

HLL_M = 256  # 2^8 buckets; ~6.5% relative error — a diagnostics sketch


def _hll_rank(h: int) -> int:
    """Rank of the 56-bit remainder after the 8 bucket bits: position
    of the first 1-bit (1-based), 57 when the remainder is zero.
    SQL-equivalent: ``57 - length(bin(h >> 8))`` (DuckDB ``bin`` has no
    leading zeros), 57 for ``h >> 8 = 0``."""
    w = h >> 8
    return 57 - w.bit_length() if w else 57


def hll_distinct(ds, *, column: str, m: int = HLL_M):
    """HyperLogLog distinct-count over ``column`` → single-row table
    ``(m, n_zero, estimate)``.

    Per-block combiner: in-block value dedup → per-bucket max rank
    (≤ ``m`` rows out per block).  Merge: ``groupby(bucket).max`` —
    the only shuffle, at most ``m`` distinct keys.  Finalize: the raw
    HLL estimator ``α_m · m² / Σ 2^-M_j`` evaluated exactly in
    integers as ``7213·m³·2^64 // (10·(1000m+1079)·S)`` where
    ``S = Σ 2^(64-M_j)`` (empty registers contribute ``2^64``) — both
    sides of the driver compare floor-divide the same integers.  No
    small/large-range corrections: this is the raw estimator, with
    ``n_zero`` reported so consumers can apply linear counting."""
    from ray.data.aggregate import Max

    if m & (m - 1):
        raise ValueError("m must be a power of two")

    def partial(batch: pa.Table) -> pa.Table:
        regs: dict[int, int] = {}
        for v in set(batch[column].to_pylist()):
            if v is None:
                continue
            h = _md5_u64(str(v))
            b = h % m
            r = _hll_rank(h)
            if r > regs.get(b, 0):
                regs[b] = r
        return pa.table(
            {
                "bucket": pa.array(list(regs.keys()), pa.int64()),
                "rank": pa.array(list(regs.values()), pa.int64()),
            }
        )

    regs = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Max("rank", alias_name="rank"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        ranks = batch["rank"].to_pylist()
        n_zero = m - len(ranks)
        s = sum(1 << (64 - r) for r in ranks) + n_zero * (1 << 64)
        est = (7213 * m**3 * (1 << 64)) // (10 * (1000 * m + 1079) * s)
        return pa.table(
            {
                "m": pa.array([m], pa.int64()),
                "n_zero": pa.array([n_zero], pa.int64()),
                "estimate": pa.array([est], pa.int64()),
            }
        )

    # ≤ m register rows — repartition(1) so finalize sees them all
    return regs.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )


# -------------------------------------------------------------- CMS

CMS_DEPTH = 4
CMS_WIDTH = 512


def _cms_col(i: int, key: str, w: int) -> int:
    """Column of ``key`` in hash row ``i``: md5 of ``"{i}|{key}"``
    mod ``w`` — SQL ``md5(CAST(i AS VARCHAR) || '|' || key)``."""
    return _md5_u64(f"{i}|{key}") % w


def cms_estimate(
    ds,
    probes,
    *,
    column: str,
    d: int = CMS_DEPTH,
    w: int = CMS_WIDTH,
):
    """Count-min frequency estimates: build a ``d × w`` sketch over
    ``ds[column]`` and answer the ``probes`` dataset's keys →
    ``(key, est_count)`` with ``est = min_i sketch[i][h_i(key)]``
    (always ≥ the true count).

    Per-block combiner counts cells locally (≤ ``d·w`` rows per block
    no matter the block size); one ``groupby(cell).sum`` merges — the
    sketch is the ONLY thing that moves, never the keys.  The merged
    sketch (``d·w`` rows — a constant) is broadcast via ``ray.put``
    into the probe-side lookup, the legitimate small-side broadcast
    join."""
    import ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[int, int] = {}
        for v in batch[column].to_pylist():
            if v is None:
                continue
            k = str(v)
            for i in range(d):
                cell = i * w + _cms_col(i, k, w)
                counts[cell] = counts.get(cell, 0) + 1
        return pa.table(
            {
                "cell": pa.array(list(counts.keys()), pa.int64()),
                "cnt": pa.array(list(counts.values()), pa.int64()),
            }
        )

    sketch = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    cells: dict[int, int] = {}
    for row in sketch.take_all():  # ≤ d·w rows — a constant, not the corpus
        cells[row["cell"]] = row["cnt"]
    sketch_ref = ray.put(cells)

    def lookup(batch: pa.Table) -> pa.Table:
        table = ray.get(sketch_ref)
        keys = batch[column].to_pylist()
        ests = [
            min(table.get(i * w + _cms_col(i, str(k), w), 0) for i in range(d))
            for k in keys
        ]
        return batch.append_column("est_count", pa.array(ests, pa.int64()))

    return probes.map_batches(lookup, batch_format="pyarrow")


def hll_distinct_by(ds, *, key_column: str, column: str, m: int = HLL_M):
    """Per-key HyperLogLog distinct count — the GROUPED form of
    ``hll_distinct`` ("distinct users per event type", "distinct URLs
    per host") as a pure distributed aggregate: works unchanged at
    millions of keys because no per-key group is ever materialized.

    Per-block combiner dedups (key, value) and emits per-(key, bucket)
    max ranks; one groupby-max merges registers.  The per-key harmonic
    sum Σ 2^(64-rank) exceeds int64, so each term is split into 32-bit
    halves summed separately as int64 (hi ≤ m·2^31, lo ≤ m·2^32 — both
    safe) and recombined exactly in Python bigints in the final
    stateless pass.  Same integer raw estimator and hash convention as
    ``hll_distinct``; returns (key, m, n_zero, estimate)."""
    from ray.data.aggregate import Count, Max, Sum

    if m & (m - 1):
        raise ValueError("m must be a power of two")

    def partial(batch: pa.Table) -> pa.Table:
        regs: dict[tuple, int] = {}
        for k, v in zip(
            batch[key_column].to_pylist(), batch[column].to_pylist()
        ):
            if v is None:
                continue
            h = _md5_u64(str(v))
            kk = (k, h % m)
            r = _hll_rank(h)
            if r > regs.get(kk, 0):
                regs[kk] = r
        keys = list(regs.keys())
        return pa.table(
            {
                key_column: pa.array(
                    [k for k, _ in keys], batch[key_column].type
                ),
                "bucket": pa.array([b for _, b in keys], pa.int64()),
                "rank": pa.array(list(regs.values()), pa.int64()),
            }
        )

    regs = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_column, "bucket"])
        .aggregate(Max("rank", alias_name="rank"))
    )

    def halves(batch: pa.Table) -> pa.Table:
        his, los = [], []
        for r in batch["rank"].to_pylist():
            t = 1 << (64 - r)
            his.append(t >> 32)
            los.append(t & 0xFFFFFFFF)
        return pa.table(
            {
                key_column: batch[key_column],
                "t_hi": pa.array(his, pa.int64()),
                "t_lo": pa.array(los, pa.int64()),
            }
        )

    sums = (
        regs.map_batches(halves, batch_format="pyarrow")
        .groupby(key_column)
        .aggregate(
            Sum("t_hi", alias_name="s_hi"),
            Sum("t_lo", alias_name="s_lo"),
            Count(alias_name="n_nonzero"),
        )
    )

    def finalize(batch: pa.Table) -> pa.Table:
        ests, zeros = [], []
        for hi, lo, nnz in zip(
            batch["s_hi"].to_pylist(),
            batch["s_lo"].to_pylist(),
            batch["n_nonzero"].to_pylist(),
        ):
            n_zero = m - nnz
            s = (hi << 32) + lo + (n_zero << 64)
            ests.append((7213 * m**3 * (1 << 64)) // (10 * (1000 * m + 1079) * s))
            zeros.append(n_zero)
        return pa.table(
            {
                key_column: batch[key_column],
                "m": pa.array([m] * batch.num_rows, pa.int64()),
                "n_zero": pa.array(zeros, pa.int64()),
                "estimate": pa.array(ests, pa.int64()),
            }
        )

    return sums.map_batches(finalize, batch_format="pyarrow")

def kmv_distinct(ds, *, column: str, k: int = 256):
    """K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002)
    — the order-statistics alternative to HLL: keep the ``k`` smallest
    64-bit hashes of the values; estimate = (k-1)·2⁶⁴ // kth-smallest.
    Integer-exact end-to-end (same seedless md5 convention), so the
    DuckDB oracle replays it bit-for-bit.

    Scale shape: per-block combiner dedups values and keeps its k
    smallest hashes (bounded output per block); the merge is a
    groupby-dedup + sort + limit over ≤ k·blocks rows — never the
    corpus.  Returns one row (k, n_kept, estimate); with fewer than
    ``k`` distinct values the sketch is exact (estimate = n_kept)."""
    from ray.data.aggregate import Count

    def partial(batch: pa.Table) -> pa.Table:
        hs = sorted(
            {_md5_u64(str(v)) for v in batch[column].to_pylist() if v is not None}
        )[:k]
        # shift into signed int64 so Arrow's sort matches unsigned order
        return pa.table(
            {"h": pa.array([h - (1 << 63) for h in hs], pa.int64())}
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Count(alias_name="dup"))
        .select_columns(["h"])
        .sort("h")
        .limit(k)
        .repartition(1)
    )

    def finalize(batch: pa.Table) -> pa.Table:
        hs = [h + (1 << 63) for h in batch["h"].to_pylist()]
        if len(hs) < k:
            est = len(hs)
        else:
            est = ((k - 1) * (1 << 64)) // hs[-1]
        return pa.table(
            {
                "k": pa.array([k], pa.int64()),
                "n_kept": pa.array([len(hs)], pa.int64()),
                "estimate": pa.array([est], pa.int64()),
            }
        )

    return merged.map_batches(finalize, batch_format="pyarrow", batch_size=None)
