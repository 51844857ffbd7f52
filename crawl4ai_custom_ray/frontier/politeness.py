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


def rank_within_host(frontier_ds, *, per_host_cap: int):
    """Add a ``host_rank`` column: position within the host by
    (score desc, url asc) — deterministic under shuffle."""

    def rank(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(
            ["score", "url"], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        group["host_rank"] = range(len(group))
        return group

    return frontier_ds.groupby("host").map_groups(rank, batch_format="pandas")


def split_by_budget(ranked_ds, *, per_host_cap: int):
    """(selected, deferred) datasets by the per-host cap."""
    selected = ranked_ds.map_batches(
        lambda t: t.filter(pc.less(t["host_rank"], per_host_cap)),
        batch_format="pyarrow",
    )
    deferred = ranked_ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t["host_rank"], per_host_cap)),
        batch_format="pyarrow",
    )
    return selected, deferred


def enforce_politeness(frontier_ds, *, per_host_cap: int):
    """One-call helper: rank then split.  NOTE: callers that need both
    halves should ``materialize()`` the ranked dataset first so the
    groupby shuffle runs once — the ranked set is one round's frontier
    (bounded), not the full corpus."""
    ranked = rank_within_host(frontier_ds, per_host_cap=per_host_cap).materialize()
    return split_by_budget(ranked, per_host_cap=per_host_cap)
