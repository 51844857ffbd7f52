"""Per-host politeness budgeting as data movement.

The reference throttles per-domain with wall-clock delays
(``RateLimiter``, ``async_dispatcher.py:28-85``: random base delay,
exponential backoff, decay).  In a BSP batch engine the equivalent
invariant is *at most k fetches per host per round* — the politeness
budget becomes round formation: select each host's top-k candidates by
(score desc, url asc); the remainder carries over to later rounds
(SURVEY.md §7.4.5).

Skew-safe selection (no per-host pandas groups, no whole-host-in-one-
task): every row gets a fixed-width sortable key encoding
(-score, url); a ``groupby(host)`` aggregate keeps only each host's k
smallest keys (bounded heap per host — a mega-host costs O(cap)
aggregator memory, not O(host)); the k-th key is the host's *cutoff*,
joined back onto the frontier; selection is then a stateless
vectorized filter ``key <= cutoff``.  Host state (fail counts →
per-round budget) stays a small driver dict, as in the reference's
``DomainState``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_KEY_COL = "__pk"


def _sortable_score_desc(scores: np.ndarray) -> list[str]:
    """Fixed-width hex strings whose ascending lexicographic order is
    score DESCENDING (IEEE-754 total-order trick on the negated
    values)."""
    neg = (-np.asarray(scores, dtype=np.float64)).view(np.uint64)
    flip = np.where(
        neg >> np.uint64(63) == 1,
        np.uint64(0xFFFFFFFFFFFFFFFF),
        np.uint64(0x8000000000000000),
    )
    bits = neg ^ flip
    return [format(int(b), "016x") for b in bits]


def _add_key(batch: pa.Table) -> pa.Table:
    keys = _sortable_score_desc(batch["score"].to_numpy(zero_copy_only=False))
    urls = batch["url"].to_pylist()
    packed = [k + u for k, u in zip(keys, urls)]
    return batch.append_column(_KEY_COL, pa.array(packed, pa.string()))


def _cutoff_agg(caps: dict, default_cap: int):
    """Per-host bounded top-k: keeps the k smallest keys; finalizes to
    the k-th key (the selection cutoff) or None when the host is under
    budget.  The accumulator is (k, sorted_keys[:k]) — init sees the
    group key, so per-host effective caps resolve here."""
    from ray.data.aggregate import AggregateFn

    def init(host):
        return (caps.get(host, default_cap), [])

    def acc_block(acc, block):
        k, best = acc
        keys = (
            block[_KEY_COL].to_pylist()
            if hasattr(block, "column_names")
            else list(block[_KEY_COL])
        )
        merged = sorted(best + keys)
        return (k, merged[:k])

    def merge(a, b):
        k = a[0] if a[0] else b[0]
        merged = sorted(a[1] + b[1])
        return (k, merged[:k])

    def finalize(acc):
        k, best = acc
        return best[k - 1] if len(best) >= k else None

    return AggregateFn(
        init=init,
        accumulate_block=acc_block,
        merge=merge,
        finalize=finalize,
        name="cutoff",
    )


def effective_caps(per_host_cap: int, fail_counts: dict) -> dict:
    """Exponential backoff: cap >> fail_count, floored at 1
    (reference RateLimiter ×2-backoff semantics as data)."""
    return {
        host: max(1, per_host_cap >> min(fails, 8))
        for host, fails in fail_counts.items()
        if fails > 0
    }


def _driver_cutoffs(kv, caps: dict, default_cap: int) -> dict:
    """host → cutoff key from a collected (host, key) frame —
    vectorized rank-within-host; hosts under budget are absent."""
    kv = kv.sort_values(["host", _KEY_COL], kind="mergesort")
    rank = kv.groupby("host").cumcount()
    k = kv["host"].map(lambda h: caps.get(h, default_cap))
    at_cut = kv[rank == (k - 1)]
    return dict(zip(at_cut["host"], at_cut[_KEY_COL]))


def select_table(
    frontier_tbl: pa.Table,
    *,
    per_host_cap: int,
    fail_counts: dict | None = None,
):
    """Driver-side politeness selection over an in-memory frontier
    table (the small-round path of the BSP crawl: when a round's
    frontier fits the driver threshold, coordination is plain Arrow —
    zero Ray executions).  Produces exactly the same (selected,
    deferred) split as :func:`enforce_politeness` on the same rows;
    differential-tested in tests/test_frontier_units.py."""
    import pandas as pd

    caps = effective_caps(per_host_cap, fail_counts or {})
    if frontier_tbl.num_rows == 0:
        return frontier_tbl, None
    hosts = frontier_tbl["host"].to_pylist()
    keys = _sortable_score_desc(frontier_tbl["score"].to_numpy(zero_copy_only=False))
    packed = [k + u for k, u in zip(keys, frontier_tbl["url"].to_pylist())]
    kv = pd.DataFrame({"host": hosts, _KEY_COL: packed})
    cut = _driver_cutoffs(kv, caps, per_host_cap)
    mask = pa.array(
        [cut.get(h) is None or k <= cut[h] for h, k in zip(hosts, packed)],
        pa.bool_(),
    )
    return frontier_tbl.filter(mask), frontier_tbl.filter(pc.invert(mask))


def enforce_politeness(
    frontier_ds,
    *,
    per_host_cap: int,
    fail_counts: dict | None = None,
    num_partitions: int = 16,
    small_threshold: int = 200_000,
):
    """(selected, deferred) datasets under per-host effective caps.
    Deterministic under any input order: the key is a total order over
    (score desc, url asc).

    Size-adaptive, like an engine choosing broadcast vs shuffle join
    from stats: a round at or under ``small_threshold`` rows collects
    only its (host, key) PAIRS to the driver (bounded by the threshold
    — never the corpus), computes per-host cutoffs vectorized, and
    broadcasts the tiny cutoff dict into stateless filters — zero
    shuffles.  Larger rounds run the skew-safe path: groupby(host)
    bounded-top-k aggregate (one tiny cutoff row per host) + one hash
    join + the same filters."""
    import ray

    from ..functions.dedup import _coalesce_for_join, _join_partitions

    caps = effective_caps(per_host_cap, fail_counts or {})
    keyed = frontier_ds.map_batches(_add_key, batch_format="pyarrow")

    # ONE bounded probe execution (limit pushdown stops the scan at
    # threshold+1 rows) decides the path AND, on the small path, IS
    # the cutoff input — no separate materialize+count round-trips
    probe = keyed.select_columns(["host", _KEY_COL]).take(small_threshold + 1)
    if not probe:
        return keyed.drop_columns([_KEY_COL]), None

    if len(probe) <= small_threshold:
        import pandas as pd

        kv = pd.DataFrame(probe)
        cut = _driver_cutoffs(kv, caps, per_host_cap)
        cut_ref = ray.put(cut)

        def pick_small(batch: pa.Table) -> pa.Table:
            cmap = ray.get(cut_ref)
            hosts = batch["host"].to_pylist()
            keys = batch[_KEY_COL].to_pylist()
            mask = [cmap.get(h) is None or k <= cmap[h] for h, k in zip(hosts, keys)]
            return batch.filter(pa.array(mask, pa.bool_())).drop_columns([_KEY_COL])

        def rest_small(batch: pa.Table) -> pa.Table:
            cmap = ray.get(cut_ref)
            hosts = batch["host"].to_pylist()
            keys = batch[_KEY_COL].to_pylist()
            mask = [cmap.get(h) is not None and k > cmap[h] for h, k in zip(hosts, keys)]
            return batch.filter(pa.array(mask, pa.bool_())).drop_columns([_KEY_COL])

        return (
            keyed.map_batches(pick_small, batch_format="pyarrow"),
            keyed.map_batches(rest_small, batch_format="pyarrow"),
        )

    # large-round path: shuffle aggregate + join (join inputs must not
    # contain the schema-less empty blocks upstream stages leave)
    keyed, _ = _coalesce_for_join(keyed)

    def _type_cutoff(batch: pa.Table) -> pa.Table:
        # an all-under-budget round yields only null cutoffs, typed
        # `null` by Arrow — Acero rejects null-typed join payloads
        return batch.set_column(
            batch.schema.get_field_index("cutoff"),
            "cutoff",
            batch["cutoff"].cast(pa.string()),
        )

    cutoffs, n_hosts = _coalesce_for_join(
        keyed.select_columns(["host", _KEY_COL])
        .groupby("host")
        .aggregate(_cutoff_agg(caps, per_host_cap))
        .map_batches(_type_cutoff, batch_format="pyarrow")
    )
    if n_hosts == 0:
        return keyed.drop_columns([_KEY_COL]), None

    joined = keyed.join(
        cutoffs.rename_columns({"host": "__h"}),
        join_type="inner",
        num_partitions=_join_partitions(num_partitions),
        on=("host",),
        right_on=("__h",),
    ).materialize()

    def pick(batch: pa.Table) -> pa.Table:
        cut = batch["cutoff"]
        keep = pc.or_kleene(cut.is_null(), pc.less_equal(batch[_KEY_COL], cut))
        return batch.filter(pc.fill_null(keep, True)).drop_columns(
            [_KEY_COL, "cutoff"]
        )

    def rest(batch: pa.Table) -> pa.Table:
        cut = batch["cutoff"]
        keep = pc.and_kleene(cut.is_valid(), pc.greater(batch[_KEY_COL], cut))
        return batch.filter(pc.fill_null(keep, False)).drop_columns(
            [_KEY_COL, "cutoff"]
        )

    selected = joined.map_batches(pick, batch_format="pyarrow")
    deferred = joined.map_batches(rest, batch_format="pyarrow")
    return selected, deferred
