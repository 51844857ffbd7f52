"""As-of (temporal) join over two event streams.

Ray Data has no as-of join and neither does the reference engine —
this is one of the custom temporal-alignment operators a large-scale
training-data pipeline needs (attach the most recent state row —
snapshot, purchase, config change — at or before each observation).

Shape (scale-first): both sides are bucketed by a *mixed* hash of the
``by`` key into ``n_buckets`` fat buckets (NOT per-key groups),
unioned with a side tag, and hash-shuffled ONCE by bucket; each
bucket group then runs one vectorized ``pandas.merge_asof(by=...)``
over thousands of keys.  One all-to-all moves both sides; the group
count is ``n_buckets`` — independent of key cardinality — so the
per-group pandas overhead measured in BASELINE.md (tiny-group
``map_groups`` poison) never appears, and key skew is spread by the
mixing hash.  Partitioning assumption: no single bucket (both sides
summed) exceeds a worker's heap; raise ``n_buckets`` with cluster
size.

Tie semantics (deterministic, mirrored in the SQL oracle): right
rows are first deduped to one per ``(by, on)`` keeping the largest
``id_column`` value; a left row matches the latest right row with
``on_right <= on_left`` (backward search, exact matches allowed) —
the semantics of DuckDB ``ASOF JOIN ... ON l.k = r.k AND l.t >= r.t``.
Unmatched left rows are dropped (inner as-of).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# golden-ratio multiplicative mixing (Knuth); spreads sequential ids
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _bucket_of(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    mixed = keys.astype(np.uint64, copy=False) * _MIX
    return ((mixed >> np.uint64(33)) % np.uint64(n_buckets)).astype(np.int32)


def _arrow_schema(ds) -> pa.Schema:
    """Arrow schema of a Dataset whose blocks may be pandas-backed
    (``from_pandas``) — numpy dtypes are mapped through pyarrow."""
    base = ds.schema().base_schema
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for name, dt in zip(base.names, base.types):
        if isinstance(dt, pa.DataType):
            typ = dt
        else:
            typ = pa.from_numpy_dtype(np.dtype(dt))
        fields.append(pa.field(name, typ))
    return pa.schema(fields)


def asof_join(
    left,
    right,
    *,
    by: str = "user_id",
    on: str = "ts",
    id_column: str = "event_id",
    right_payload: dict[str, str] | None = None,
    n_buckets: int = 64,
):
    """Inner as-of join of two ``ray.data.Dataset`` event streams.

    ``right_payload`` maps right-side column → output column name
    (default: ``{id_column: "match_<id_column>"}``).  The result keeps
    every left column plus the renamed right payload columns.
    """
    if right_payload is None:
        right_payload = {id_column: f"match_{id_column}"}

    left_cols = [c for c in left.schema().names]
    l_payload = [c for c in left_cols if c not in (by, on)]
    # right payload columns are RENAMED before the union so they can
    # never collide with left column names (e.g. both sides carrying
    # `event_id`)
    renamed = [right_payload[c] for c in right_payload]
    renamed_id = right_payload.get(id_column)

    l_schema = _arrow_schema(left)
    r_schema = _arrow_schema(right)

    def _tag_left(batch: pa.Table) -> pa.Table:
        keys = batch[by].to_numpy(zero_copy_only=False)
        cols = {name: batch[name] for name in left_cols}
        for src, dst in right_payload.items():
            cols[dst] = pa.nulls(len(batch), r_schema.field(src).type)
        cols["_bucket"] = pa.array(_bucket_of(keys, n_buckets), pa.int32())
        cols["_side"] = pa.array(np.full(len(batch), 0, dtype=np.int8))
        return pa.table(cols)

    def _tag_right(batch: pa.Table) -> pa.Table:
        keys = batch[by].to_numpy(zero_copy_only=False)
        # same column ORDER as _tag_left so union blocks share one schema
        cols = {}
        for name in left_cols:
            if name in (by, on):
                cols[name] = batch[name]
            else:
                cols[name] = pa.nulls(len(batch), l_schema.field(name).type)
        for src, dst in right_payload.items():
            cols[dst] = batch[src]
        cols["_bucket"] = pa.array(_bucket_of(keys, n_buckets), pa.int32())
        cols["_side"] = pa.array(np.full(len(batch), 1, dtype=np.int8))
        return pa.table(cols)

    tagged_l = left.map_batches(_tag_left, batch_format="pyarrow")
    tagged_r = right.map_batches(_tag_right, batch_format="pyarrow")
    both = tagged_l.union(tagged_r)

    out_order = left_cols + renamed
    # the union carries each side's payload as nulls on the other
    # side, so int columns float-upcast in the pandas group block —
    # restore every output column to its declared dtype at the end
    want_dtype = {c: l_schema.field(c).type.to_pandas_dtype() for c in left_cols}
    for src, dst in right_payload.items():
        want_dtype[dst] = r_schema.field(src).type.to_pandas_dtype()

    def _join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        ldf = df.loc[df["_side"] == 0, left_cols]
        rdf = df.loc[df["_side"] == 1, [by, on] + renamed]
        if len(ldf) == 0 or len(rdf) == 0:
            return pd.DataFrame(
                {c: pd.Series(dtype=want_dtype[c]) for c in out_order}
            )
        ldf = ldf.sort_values([on, by], kind="stable")
        rdf = rdf.sort_values(
            [on] + ([renamed_id] if renamed_id else []), kind="stable"
        )
        # dedup ties: one right row per (by, on), max id wins
        rdf = rdf.drop_duplicates([by, on], keep="last")
        merged = pd.merge_asof(
            ldf,
            rdf,
            on=on,
            by=by,
            direction="backward",
            allow_exact_matches=True,
        )
        merged = merged.dropna(subset=renamed[:1])
        for c in out_order:
            if merged[c].dtype != want_dtype[c]:
                merged[c] = merged[c].astype(want_dtype[c])
        return merged[out_order]

    return both.groupby("_bucket").map_groups(_join_bucket, batch_format="pandas")


def range_join(
    left,
    right,
    *,
    by: str = "user_id",
    on: str = "ts",
    lower_us: int = 0,
    upper_us: int = 3_600_000_000,
    right_payload: dict[str, str] | None = None,
    n_buckets: int = 64,
    epochs_per_shard: int = 64,
):
    """Bounded temporal range join: every (left, right) pair with the
    same ``by`` key and ``lower_us <= ts_right - ts_left <= upper_us``
    (timestamps in microseconds).  Inner semantics; one output row per
    matching pair.

    Scale shape (interval-join sharding, as in streaming systems):
    time is cut into epochs of width ``upper_us - lower_us``, grouped
    ``epochs_per_shard`` at a time (worker-sized slabs of consecutive
    time — per-epoch groups degenerate into swarms of near-empty
    pandas calls at low event rates); each RIGHT row lands in exactly
    one ``(key-bucket, shard)`` group, and each LEFT row is replicated
    into the (at most two, deduped) shards its window
    ``[ts+lower, ts+upper]`` overlaps, so every matching pair meets in
    exactly one group.  Join work per group is bounded by key×shard
    locality — the classic per-hot-key quadratic hazard of a range
    join is capped by the shard width.  Partitioning assumption: one
    (bucket, shard) fits a worker's heap; raise ``n_buckets`` or lower
    ``epochs_per_shard`` with event rate.
    """
    if right_payload is None:
        right_payload = {"event_id": "match_event_id"}
    if upper_us <= lower_us:
        raise ValueError("upper_us must exceed lower_us")
    if epochs_per_shard < 1:
        raise ValueError("epochs_per_shard must be >= 1")
    width = upper_us - lower_us

    left_cols = [c for c in left.schema().names]
    l_payload = [c for c in left_cols if c not in (by, on)]
    renamed = [right_payload[c] for c in right_payload]

    l_schema = _arrow_schema(left)
    r_schema = _arrow_schema(right)

    def _epoch(ts_us: np.ndarray) -> np.ndarray:
        return np.floor_divide(np.floor_divide(ts_us, width), epochs_per_shard)

    def _gkey(keys: np.ndarray, epochs: np.ndarray) -> np.ndarray:
        bucket = _bucket_of(keys, n_buckets).astype(np.int64)
        return bucket * np.int64(1 << 40) + epochs.astype(np.int64)

    def _tag_left(batch: pa.Table) -> pa.Table:
        keys = batch[by].to_numpy(zero_copy_only=False)
        ts_us = batch[on].cast(pa.int64()).to_numpy(zero_copy_only=False)
        e0 = _epoch(ts_us + lower_us)
        e1 = _epoch(ts_us + upper_us)
        # replicate each left row into every epoch its window overlaps
        # (≤2 because window length == epoch width)
        idx = np.concatenate([np.arange(len(batch)), np.nonzero(e1 != e0)[0]])
        epochs = np.concatenate([e0, e1[e1 != e0]])
        rep = batch.take(pa.array(idx))
        cols = {name: rep[name] for name in left_cols}
        for src, dst in right_payload.items():
            cols[dst] = pa.nulls(len(rep), r_schema.field(src).type)
        cols["_gkey"] = pa.array(
            _gkey(keys[idx], epochs), pa.int64()
        )
        cols["_side"] = pa.array(np.full(len(rep), 0, dtype=np.int8))
        return pa.table(cols)

    def _tag_right(batch: pa.Table) -> pa.Table:
        keys = batch[by].to_numpy(zero_copy_only=False)
        ts_us = batch[on].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cols = {}
        for name in left_cols:
            if name in (by, on):
                cols[name] = batch[name]
            else:
                cols[name] = pa.nulls(len(batch), l_schema.field(name).type)
        for src, dst in right_payload.items():
            cols[dst] = batch[src]
        cols["_gkey"] = pa.array(_gkey(keys, _epoch(ts_us)), pa.int64())
        cols["_side"] = pa.array(np.full(len(batch), 1, dtype=np.int8))
        return pa.table(cols)

    both = left.map_batches(_tag_left, batch_format="pyarrow").union(
        right.map_batches(_tag_right, batch_format="pyarrow")
    )

    out_order = left_cols + renamed
    want_dtype = {c: l_schema.field(c).type.to_pandas_dtype() for c in left_cols}
    for src, dst in right_payload.items():
        want_dtype[dst] = r_schema.field(src).type.to_pandas_dtype()

    def _join_group(df: pd.DataFrame) -> pd.DataFrame:
        ldf = df.loc[df["_side"] == 0, left_cols]
        rdf = df.loc[df["_side"] == 1, [by, on] + renamed]
        if len(ldf) == 0 or len(rdf) == 0:
            return pd.DataFrame(
                {c: pd.Series(dtype=want_dtype[c]) for c in out_order}
            )
        merged = ldf.merge(rdf, on=by, suffixes=("", "_r"))
        on_r = on + "_r"
        delta = (merged[on_r] - merged[on]).dt.total_seconds() * 1_000_000
        merged = merged[(delta >= lower_us) & (delta <= upper_us)]
        merged = merged.drop(columns=[on_r])
        for c in out_order:
            if merged[c].dtype != want_dtype[c]:
                merged[c] = merged[c].astype(want_dtype[c])
        return merged[out_order]

    return both.groupby("_gkey").map_groups(_join_group, batch_format="pandas")


def rolling_window(
    events,
    *,
    by: str = "user_id",
    on: str = "ts",
    id_column: str = "event_id",
    value_column: str = "value",
    window_us: int = 1_800_000_000,
    n_buckets: int = 64,
    epochs_per_shard: int = 64,
):
    """Trailing RANGE-frame window per key: for every event, the count
    and integer-cents sum of all events of the same ``by`` key with
    ``ts in [ts - window_us, ts]`` (inclusive both ends — the
    semantics of SQL ``RANGE BETWEEN <w> PRECEDING AND CURRENT ROW``,
    peers of the current row included).  The streaming-dashboard /
    rate-limiter shape a tumbling window can't express: one result row
    per input row, each looking back over its own bounded horizon.

    Scale shape (same epoch-sharding family as :func:`range_join`):
    time is cut into epochs of width ``window_us``, grouped
    ``epochs_per_shard`` at a time into shards so one shuffle group
    holds a WORKER-sized slab of consecutive time, not a sliver (a
    per-epoch grouping at low event rates degenerates into tens of
    thousands of near-empty pandas groups whose call overhead dwarfs
    the compute).  Each event rides the ONE shuffle as a probe in its
    own shard plus a context copy there; only events in a shard's LAST
    epoch ship a second context copy into the next shard (a probe
    window ``[ts-w, ts]`` reaches back at most one epoch), so
    replication is 2+1/``epochs_per_shard``× and every (probe,
    context) pair meets in exactly one ``(key-bucket, shard)`` group —
    counts exact, never doubled.  Within a group the lookback is fully
    vectorized: context sorted once by (key, ts), per-key slices
    addressed through a combined ``rank*span + offset`` integer key,
    counts/sums by two ``searchsorted`` calls against a prefix-sum —
    no per-key pandas groups, no Python loop over rows.

    Partitioning assumption: one (bucket, shard) group — ~2× the
    shard's event rows — fits a worker's heap; raise ``n_buckets`` or
    lower ``epochs_per_shard`` with event rate.  All outputs are
    integers (count, cents), so results are bit-identical at any
    parallelism.
    """
    if window_us <= 0:
        raise ValueError("window_us must be positive")
    if epochs_per_shard < 1:
        raise ValueError("epochs_per_shard must be >= 1")

    def _tag(batch: pa.Table) -> pa.Table:
        keys = batch[by].to_numpy(zero_copy_only=False)
        ts_us = batch[on].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.rint(
            batch[value_column].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        e = np.floor_divide(ts_us, window_us)
        shard = np.floor_divide(e, epochs_per_shard)
        shard_next = np.floor_divide(e + 1, epochs_per_shard)
        cross = shard_next != shard  # last epoch of a shard only
        bucket = _bucket_of(keys, n_buckets).astype(np.int64)
        n = len(batch)
        # probe copy (side 0, own shard) + context copy in the same
        # shard (side 1) + boundary context copy into the next shard
        # (side 1, deduped: only when the shards differ)
        idx = np.concatenate([np.arange(n), np.arange(n), np.nonzero(cross)[0]])
        shards = np.concatenate([shard, shard, shard_next[cross]])
        sides = np.concatenate(
            [
                np.zeros(n, dtype=np.int8),
                np.ones(n, dtype=np.int8),
                np.ones(int(cross.sum()), dtype=np.int8),
            ]
        )
        rep = batch.take(pa.array(idx))
        return pa.table(
            {
                id_column: rep[id_column],
                by: rep[by],
                on: rep[on],
                "_ts_us": pa.array(ts_us[idx], pa.int64()),
                "_cents": pa.array(cents[idx], pa.int64()),
                "_gkey": pa.array(
                    bucket[idx] * np.int64(1 << 40) + shards, pa.int64()
                ),
                "_side": pa.array(sides),
            }
        )

    tagged = events.map_batches(_tag, batch_format="pyarrow")

    out_cols = [id_column, by, on, "n_window", "sum_cents_window"]

    def _win_group(df: pd.DataFrame) -> pd.DataFrame:
        probe = df.loc[df["_side"] == 0]
        if len(probe) == 0:
            empty = probe[[id_column, by, on]].copy()
            empty["n_window"] = pd.Series(dtype="int64")
            empty["sum_cents_window"] = pd.Series(dtype="int64")
            return empty[out_cols]
        ctx = df.loc[df["_side"] == 1].sort_values([by, "_ts_us"], kind="stable")
        u = ctx[by].to_numpy()
        t = ctx["_ts_us"].to_numpy()
        c = ctx["_cents"].to_numpy()
        uu = np.unique(u)
        rank = np.searchsorted(uu, u)
        tmin = int(t.min())
        span = int(t.max()) - tmin + 2
        keys = rank * np.int64(span) + (t - tmin)
        csum = np.concatenate([[0], np.cumsum(c)])

        p_rank = np.searchsorted(uu, probe[by].to_numpy())
        p_ts = probe["_ts_us"].to_numpy()
        # lower bound clipped to -1: below every offset of this key's
        # slice but above the previous key's largest combined key
        lo_key = p_rank * np.int64(span) + np.maximum(p_ts - window_us - tmin, -1)
        hi_key = p_rank * np.int64(span) + (p_ts - tmin)
        lo = np.searchsorted(keys, lo_key, side="left")
        hi = np.searchsorted(keys, hi_key, side="right")

        out = probe[[id_column, by, on]].copy()
        out["n_window"] = (hi - lo).astype(np.int64)
        out["sum_cents_window"] = (csum[hi] - csum[lo]).astype(np.int64)
        return out[out_cols]

    return tagged.groupby("_gkey").map_groups(_win_group, batch_format="pandas")
