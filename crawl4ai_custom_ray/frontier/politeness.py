"""Per-host politeness budgeting as data movement.

The reference throttles per-domain with wall-clock delays
(``RateLimiter``, ``async_dispatcher.py:28-85``: random base delay,
exponential backoff, decay).  In a BSP batch engine the equivalent
invariant is *at most k fetches per host per round* — the politeness
budget becomes round formation: ``groupby(host)`` → rank candidates by
(score desc, url asc) → the top-k fetch this round, the remainder
carries over to later rounds (SURVEY.md §7.4.5).  Host state
(``DomainState``: fail counts, current delay → here ``crawl_delay``
and per-round budget) lives in a small per-round table, not in driver
memory.
"""

from __future__ import annotations

import pandas as pd
import pyarrow.compute as pc


def rank_within_host(frontier_ds, *, per_host_cap: int, host_caps: dict | None = None):
    """Add ``host_rank`` (position within host by score desc, url asc —
    deterministic under shuffle) and ``host_cap`` (the host's effective
    budget this round: the base cap shrunk exponentially by the host's
    fail count — the reference RateLimiter's ×2-backoff-capped
    semantics, ``async_dispatcher.py:65-85``, expressed as data)."""
    caps = host_caps or {}

    def rank(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(
            ["score", "url"], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        group["host_rank"] = range(len(group))
        host = group["host"].iloc[0]
        group["host_cap"] = caps.get(host, per_host_cap)
        return group

    return frontier_ds.groupby("host").map_groups(rank, batch_format="pandas")


def split_by_budget(ranked_ds, *, per_host_cap: int):
    """(selected, deferred) datasets by the per-host effective cap."""
    selected = ranked_ds.map_batches(
        lambda t: t.filter(pc.less(t["host_rank"], t["host_cap"])),
        batch_format="pyarrow",
    )
    deferred = ranked_ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t["host_rank"], t["host_cap"])),
        batch_format="pyarrow",
    )
    return selected, deferred


def effective_caps(per_host_cap: int, fail_counts: dict) -> dict:
    """Exponential backoff: cap >> fail_count, floored at 1."""
    return {
        host: max(1, per_host_cap >> min(fails, 8))
        for host, fails in fail_counts.items()
        if fails > 0
    }


def enforce_politeness(frontier_ds, *, per_host_cap: int, fail_counts: dict | None = None):
    """One-call helper: rank then split.  NOTE: callers that need both
    halves should ``materialize()`` the ranked dataset first so the
    groupby shuffle runs once — the ranked set is one round's frontier
    (bounded), not the full corpus."""
    caps = effective_caps(per_host_cap, fail_counts or {})
    ranked = rank_within_host(
        frontier_ds, per_host_cap=per_host_cap, host_caps=caps
    ).materialize()
    return split_by_budget(ranked, per_host_cap=per_host_cap)
