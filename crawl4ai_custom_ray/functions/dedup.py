"""Deduplication operators for training-data pipelines.

Beyond the reference's URL-seen dedup (SURVEY.md §2.9), these are the
document-level dedup family a 100 TB text pipeline needs.  All are
Ray-Data-native and hold NO corpus-sized state anywhere (driver or
broadcast): per-doc side data travels through shuffles (groupby
aggregates that carry what the verify step needs) or hash joins of the
candidate-pair table back onto per-doc datasets.

- :func:`exact_dedup` — content-hash groupby, keep min id.  One
  shuffle on the 16-byte hash (never on the text itself).
- :func:`jaccard_pairs` — exact word/shingle-set Jaccard via an
  inverted-index join: explode (id, token) → groupby(token) emits
  within-token pairs → groupby(pair) counts intersections → set sizes
  joined on (streamed, not broadcast).  Exact but O(Σ df²).
  ``max_df`` drops tokens hotter than the cutoff BEFORE the quadratic
  explode — a skew guard that trades recall for bounded work: a pair
  sharing a dropped token has its intersection undercounted while set
  sizes also shrink, so scores shift and borderline pairs can be
  missed.  Callers that need exactness leave it None; callers at web
  scale set it and accept approximate Jaccard over non-hot tokens.
- :class:`MinHasher` / :func:`minhash_lsh_pairs` — shingle → minhash
  (k permutations via universal hashing) → band buckets → candidate
  pairs → exact-Jaccard verification by joining candidates back onto
  a per-doc shingle-hash dataset (two hash joins; candidates are the
  small side by construction).  The 100 TB path: cost is linear in
  corpus size + bucket collisions.
- :func:`substring_dedup` — exact repeated-substring removal (Lee et
  al. 2021's suffix-array dedup recast as a fixed-window streaming
  pass): window-hash groupby carrying (16 B, 8 B) rows, winners
  hash-joined back, duplicate starts per doc as packed binary, one
  vectorized interval-difference rebuild per doc.
- :func:`simhash_pairs` — 64-bit simhash over md5 token hashes;
  near-dup candidates via 4-segment block partitioning (Hamming ≤ 3
  guarantee).  The segment buckets carry (id, fp) so verification is
  local to each bucket group — no lookup table anywhere.  md5 (not
  blake2b) so the whole pipeline is reproducible in ANSI SQL for the
  driver's DuckDB oracle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ------------------------------------------------------------------ util


def _collect_ids_agg(id_col: str = "id", max_members: int | None = None):
    """AggregateFn collecting the group's ids into a list — the
    vectorized replacement for ``map_groups`` when groups are tiny and
    numerous (per-group pandas overhead dominates otherwise).

    ``max_members``: hot-bucket guard for the LSH paths.  A bucket
    that exceeds the cap finalizes to an EMPTY list (sentinel: list of
    length cap+1 while accumulating, trimmed at finalize) instead of
    accumulating a corpus-scale member list whose pair explosion is
    quadratic.  Recall note: a hot bucket means near-identical
    content at scale — run :func:`exact_dedup` first so identical
    docs never reach the LSH stage, then a capped bucket only drops
    pairs that every OTHER band can still recover."""
    from ray.data.aggregate import AggregateFn

    cap = max_members + 1 if max_members is not None else None

    def acc_block(acc, block):
        if cap is not None and len(acc) >= cap:
            return acc
        ids = (
            block[id_col].to_pylist()
            if hasattr(block, "column_names")
            else list(block[id_col])
        )
        out = acc + ids
        return out[:cap] if cap is not None else out

    def merge(a, b):
        out = a + b
        return out[:cap] if cap is not None else out

    def finalize(acc):
        if max_members is not None and len(acc) > max_members:
            return []
        return acc

    return AggregateFn(
        init=lambda k: [],
        accumulate_block=acc_block,
        merge=merge,
        finalize=finalize,
        name="ids",
    )


def _collect_id_fp_agg(name: str = "members", max_members: int | None = None):
    """AggregateFn collecting the group's (id:int64, fp:uint64) rows,
    finalized as packed little-endian bytes (16 B per member) — an
    Arrow-native binary column, so the verify step can run inside the
    bucket group without consulting any global map.

    ``max_members``: hot-bucket guard (see :func:`_collect_ids_agg`) —
    an over-cap bucket finalizes to empty bytes instead of a
    corpus-scale blob."""
    from ray.data.aggregate import AggregateFn

    cap_bytes = (max_members + 1) * 16 if max_members is not None else None

    def acc_block(acc, block):
        if cap_bytes is not None and sum(len(b) for b in acc) >= cap_bytes:
            return acc
        if hasattr(block, "column_names"):
            ids = block["id"].to_numpy(zero_copy_only=False)
            fps = block["fp"].to_numpy(zero_copy_only=False)
        else:
            ids = np.asarray(block["id"])
            fps = np.asarray(block["fp"])
        packed = np.empty(len(ids), dtype=[("id", "<i8"), ("fp", "<u8")])
        packed["id"] = ids
        packed["fp"] = fps
        acc.append(packed.tobytes())
        return acc

    def finalize(acc):
        blob = b"".join(acc)
        if max_members is not None and len(blob) > max_members * 16:
            return b""
        return blob

    return AggregateFn(
        init=lambda k: [],
        accumulate_block=acc_block,
        merge=lambda a, b: a + b,
        finalize=finalize,
        name=name,
    )


def _explode_pairs_batch(batch: pa.Table) -> pa.Table:
    """(…, ids: list) rows → all within-group (a < b) pairs."""
    a_out, b_out = [], []
    for ids in batch["ids"].to_pylist():
        if ids is None or len(ids) < 2:
            continue
        ids = sorted(set(ids))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
    return pa.table(
        {"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64())}
    )


def _hash_group_blocks(ds, keys: list[str], num_partitions: int):
    """Hash-partition rows so every ``keys`` group lands WHOLE inside
    one block — the bucket-grouping primitive behind the LSH/banding
    paths.

    Ray's aggregate machinery pays per-group Python-object cost, which
    dominates when groups are tiny and web-scale NUMEROUS (measured on
    the 1M-doc volume corpus: 16M banding rows → 15.3M buckets took
    57–85 s through ``groupby().aggregate()`` under either shuffle
    strategy, with the built-in Count no faster than a custom
    collect).  A key-hash repartition is ONE arrow-native exchange
    (8 s on the same input); group-runs are then found with one numpy
    lexsort per block and consumed vectorized.  Key-based repartition
    requires the HASH_SHUFFLE strategy; a Dataset captures its
    DataContext at creation, so set/restore it on the dataset's OWN
    bound context around the materialize — the session default (sort
    shuffle, which measured faster for ordinary aggregates) is
    untouched.

    Size-adaptive: the hash exchange has ~1 s of fixed aggregator
    cost, so inputs at or under ``_HASH_GROUP_SMALL_ROWS`` coalesce to
    ONE block instead (every group trivially whole; the per-block
    consumer handles the full input in one numpy/arrow pass) — the
    bench-scale regime where the exchange overhead would dominate.

    Ray-internal dependency (PINNED BEHAVIOR, Ray 2.49.2): the
    HASH_SHUFFLE aggregator finalizes each reduce partition as exactly
    ONE block (ray.data hash_shuffle carries a "TODO break down blocks
    to target size").  Every consumer of this primitive treats
    per-block group results as FINAL, so if a future Ray splits reduce
    outputs, a key group could straddle blocks and results would
    silently become partial.  Two guards below: (a) feature-detect the
    strategy knob and fall back to ``groupby(keys).map_groups``
    (slower but whole-groups-per-block by contract) when the internal
    API moved; (b) assert the one-block-per-partition invariant on the
    materialized output and fall back the same way if it ever breaks.
    ``tests/test_round5.py`` pins both routes."""
    m = ds.materialize()
    n = m.count()
    if (
        n <= _HASH_GROUP_SMALL_ROWS
        and (m.size_bytes() or 0) <= _HASH_GROUP_SMALL_BYTES
    ):
        # row count alone is not enough: fat cells (packed token
        # payloads) can make a row-small input gigabytes — those take
        # the hash route below, whose partition floor bounds blocks
        return m.repartition(1).materialize() if m.num_blocks() > 1 else m
    # partition-count floor from DATA SIZE: callers pass a
    # parallelism-shaped count (≈ CPUs), which at web scale would make
    # each reduce block corpus/CPUs bytes; floor the block size at
    # ~``_HASH_GROUP_TARGET_BLOCK`` arrow bytes instead, so per-task
    # memory downstream stays bounded by the target no matter how big
    # the input grows (consumers inflate a block ~10× into Python
    # state — see the jaccard in-bucket verify sizing note).
    size = m.size_bytes() or 0
    num_partitions = max(num_partitions, -(-size // _HASH_GROUP_TARGET_BLOCK))
    strategy = _resolve_hash_shuffle_strategy()
    ctx = getattr(m, "context", None)
    if strategy is None or ctx is None or not hasattr(ctx, "shuffle_strategy"):
        return _hash_group_fallback(m, keys, "shuffle-strategy knob not found")
    prev = ctx.shuffle_strategy
    ctx.shuffle_strategy = strategy
    try:
        out = m.repartition(num_partitions, keys=keys).materialize()
    finally:
        ctx.shuffle_strategy = prev
    if out.num_blocks() != num_partitions:
        # Ray 2.49.2 emits EXACTLY one block per reduce partition
        # (empties included).  More blocks ⇒ splitting (a key group
        # may straddle blocks → silently partial per-block results);
        # fewer ⇒ empties dropped, which could mask splitting on a
        # skewed input (e.g. 3 fat partitions split into 12 blocks
        # still under a 64-partition count).  Either deviation means
        # the pinned behavior moved — re-route (correct, slower).
        return _hash_group_fallback(
            m,
            keys,
            f"{out.num_blocks()} blocks from {num_partitions} hash partitions",
        )
    return out


def _resolve_hash_shuffle_strategy():
    """Feature-detect Ray's hash-shuffle strategy enum; ``None`` when
    the internal API moved (drives the loud fallback)."""
    try:
        from ray.data.context import ShuffleStrategy
    except ImportError:
        return None
    return getattr(ShuffleStrategy, "HASH_SHUFFLE", None)


def _hash_group_fallback(m, keys: list[str], reason: str):
    """Whole-groups-per-block via the PUBLIC ``groupby().map_groups``
    contract — correct at any Ray version, pays the per-group Python
    cost the hash route avoids.  Loud: web-scale runs should notice
    the 7×+ slowdown and re-pin the fast path."""
    import warnings

    warnings.warn(
        "_hash_group_blocks: key-hash repartition unavailable "
        f"({reason}); falling back to groupby().map_groups — correct "
        "but far slower on numerous tiny groups. Re-pin the Ray "
        "hash-shuffle internals for this Ray version.",
        RuntimeWarning,
        stacklevel=3,
    )
    return (
        m.groupby(keys)
        .map_groups(lambda b: b, batch_format="pyarrow")
        .materialize()
    )


def _default_cpus() -> int:
    """Session CPU count for parallelism-shaped partition choices
    (8 when Ray is not initialised — the test/import path)."""
    import ray

    return int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8


def _min_by_keys(ds, keys: list[str], value_col: str, alias: str):
    """Per-``keys`` minimum of ``value_col`` via key-hash repartition
    + per-block C++ group-min — the numerous-tiny-group regime
    (line/window/content-hash groups are corpus-count at web scale)
    where Ray's aggregate machinery pays per-group Python cost (see
    :func:`_hash_group_blocks`).  Final minima, because each key is
    co-located by the repartition."""
    cpus = _default_cpus()

    def block_min(batch: pa.Table) -> pa.Table:
        g = batch.group_by(keys).aggregate([(value_col, "min")])
        return g.rename_columns(
            [alias if c == f"{value_col}_min" else c for c in g.column_names]
        )

    return _hash_group_blocks(
        ds.select_columns(keys + [value_col]), keys, max(16, cpus)
    ).map_batches(block_min, batch_format="pyarrow", batch_size=None)


def _sum_by_keys(ds, keys: list[str], value_col: str, alias: str):
    """Per-``keys`` sum of ``value_col`` via key-hash repartition +
    per-block C++ group-sum — same numerous-tiny-group rationale as
    :func:`_min_by_keys` (vocabulary/df keys are corpus-count at web
    scale).  Final sums, because each key is co-located by the
    repartition."""
    cpus = _default_cpus()

    def block_sum(batch: pa.Table) -> pa.Table:
        g = batch.group_by(keys).aggregate([(value_col, "sum")])
        return g.rename_columns(
            [alias if c == f"{value_col}_sum" else c for c in g.column_names]
        )

    return _hash_group_blocks(
        ds.select_columns(keys + [value_col]), keys, max(16, cpus)
    ).map_batches(block_sum, batch_format="pyarrow", batch_size=None)


def _count_by_keys(ds, keys: list[str], alias: str):
    """Per-``keys`` row count via key-hash repartition + per-block C++
    group-count — same numerous-tiny-group rationale as
    :func:`_min_by_keys`.  Final counts, because each key is
    co-located by the repartition."""
    cpus = _default_cpus()

    def block_count(batch: pa.Table) -> pa.Table:
        g = batch.group_by(keys).aggregate([([], "count_all")])
        return g.rename_columns(
            [alias if c == "count_all" else c for c in g.column_names]
        )

    return _hash_group_blocks(
        ds.select_columns(keys), keys, max(16, cpus)
    ).map_batches(block_count, batch_format="pyarrow", batch_size=None)


def _collect_lists_by_key(ds, key: str, value_col: str, alias: str):
    """Per-``key`` value lists via key-hash repartition + per-block
    runs → arrow ListArray rows — the vectorized replacement for a
    collect-list AggregateFn when groups are numerous (vocabulary /
    bucket keys).  Whole groups per block by construction."""
    cpus = _default_cpus()

    def block_lists(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            vt = batch.schema.field(value_col).type
            return pa.table(
                {
                    key: pa.array([], batch.schema.field(key).type),
                    alias: pa.array([], pa.list_(vt)),
                }
            )
        starts, ends, order = _group_runs(batch, [key])
        take = pa.array(order)
        keys_sorted = batch[key].take(take).combine_chunks()
        vals_sorted = batch[value_col].take(take).combine_chunks()
        offsets = pa.array(np.append(starts, batch.num_rows).astype(np.int32))
        return pa.table(
            {
                key: keys_sorted.take(pa.array(starts)),
                alias: pa.ListArray.from_arrays(offsets, vals_sorted),
            }
        )

    return _hash_group_blocks(
        ds.select_columns([key, value_col]), [key], max(16, cpus)
    ).map_batches(block_lists, batch_format="pyarrow", batch_size=None)


def _group_runs(batch: pa.Table, keys: list[str]):
    """Yield (start, end, sort_order) runs of equal ``keys`` within a
    hash-partitioned block (see :func:`_hash_group_blocks`): one
    lexsort, then boundary detection — no per-group allocation."""
    n = batch.num_rows
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    cols = [batch[k].to_numpy(zero_copy_only=False) for k in keys]
    order = np.lexsort(tuple(reversed(cols)))
    new = np.empty(n, dtype=bool)
    new[0] = True
    acc = np.zeros(n - 1, dtype=bool) if n > 1 else np.empty(0, dtype=bool)
    for c in cols:
        cs = c[order]
        if n > 1:
            acc |= cs[1:] != cs[:-1]
    if n > 1:
        new[1:] = acc
    starts = np.nonzero(new)[0]
    ends = np.append(starts[1:], n)
    return starts, ends, order


# Pair tables at or under this row count take the broadcast fast path
# (driver state bounded by the threshold, never the corpus); larger
# ones run hash joins.
SMALL_PAIR_THRESHOLD = 200_000

# jaccard_prefix_pairs pass-1 merge gate: total per-block df-partial
# rows the driver may pull and collapse with a Counter instead of a
# vocabulary groupby shuffle (each row is a (token, count) pair, so
# the pull is bounded ≈ blocks × per-block vocabulary).
_DF_PARTIAL_DRIVER_MAX = 2_000_000

# _hash_group_blocks block-size ceiling: the hash exchange emits one
# block per partition, so the partition count is floored at
# input_bytes / this — per-block (and so per-downstream-task) memory
# stays bounded at web scale even when callers size partitions by CPU
# count.
_HASH_GROUP_TARGET_BLOCK = 64 * 1024 * 1024

# _hash_group_blocks coalesce gate, byte dimension: a row-small input
# whose cells are fat (packed payloads) must not collapse into one
# multi-GB block — above this it takes the hash route regardless of
# row count.
_HASH_GROUP_SMALL_BYTES = 4 * _HASH_GROUP_TARGET_BLOCK

# _hash_group_blocks coalesce gate: inputs at or under this many rows
# skip the key-hash exchange and run group detection in one block —
# a single-block lexsort of 2M skinny rows is ~0.2 s of one core,
# cheaper than the exchange's fixed aggregator cost; above it the
# hash route's parallelism wins and driver/worker memory per block
# stays bounded.
_HASH_GROUP_SMALL_ROWS = 2_000_000

# jaccard canonical-cap harmonization gate: with max_bucket set, the
# attach verify route pulls the capped (hot) token set to the driver
# and broadcasts it so its recall matches the canonical-bucket routes;
# a corpus with more capped tokens than this keeps the attach route's
# any-surviving-bucket recall instead (documented divergence).
_CAPPED_TOKENS_MAX = 1_000_000

# minhash verify candidate-id pull gate: raw pair counts at or under
# this broadcast their distinct candidate ids (≤ 2 int64 per pair —
# ≤ ~320 MB at the gate) so only candidate docs are shingled; larger
# pair sets shingle the whole corpus (linear, distributed) instead.
_CAND_ID_FILTER_MAX = 20_000_000


def _pair_id_blob_rows(batch: pa.Table) -> pa.Table:
    """One row per block: the block's sorted unique pair-member ids as
    raw little-endian int64 bytes (the driver-side concatenation is
    bounded by ``_CAND_ID_FILTER_MAX`` pairs)."""
    a = batch["a"].to_numpy(zero_copy_only=False)
    b = batch["b"].to_numpy(zero_copy_only=False)
    u = np.unique(np.concatenate([a, b])) if len(a) else np.empty(0, dtype="<i8")
    return pa.table({"ids": pa.array([u.astype("<i8").tobytes()], pa.binary())})


def _coalesce_for_join(ds, *, target_rows_per_block: int = 4096, max_blocks: int = 64):
    """Materialize + repartition a shuffle-produced dataset into a few
    uniformly-filled blocks before using it as a join input.

    Hash-shuffle (groupby) outputs at high parallelism contain empty
    schema-less blocks; a downstream Acero join partition fed only
    those dies with "No match or multiple matches for key field
    reference".  Coalescing removes them.  Returns (dataset, count)."""
    ds = ds.materialize()
    n = ds.count()
    blocks = max(1, min(max_blocks, -(-n // target_rows_per_block)))
    return ds.repartition(blocks).materialize(), n


def _empty_dataset(schema: dict):
    import ray.data as rd

    return rd.from_arrow(pa.table({k: pa.array([], t) for k, t in schema.items()}))


def _dataset_from_table(tbl: pa.Table, *, rows_per_block: int = 4096, max_blocks: int = 64):
    """Driver table → multi-block Dataset (zero-copy slices) so a
    downstream ``map_batches`` parallelizes instead of running the
    whole table as one task."""
    import ray.data as rd

    n = tbl.num_rows
    blocks = max(1, min(max_blocks, -(-n // rows_per_block)))
    step = -(-n // blocks)
    return rd.from_arrow([tbl.slice(i, step) for i in range(0, max(n, 1), step)])


def _join_partitions(requested: int) -> int:
    """Bound join parallelism by the session size: each hash-join
    shuffle holds aggregator actors, and two joins in one plan can
    starve a small session's map tasks (observed deadlock at 4 CPUs
    with 2×16 partitions)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(2, min(requested, cpus // 2 or 1))


def hash_join_safe(
    left,
    right,
    *,
    on: tuple,
    right_on: tuple | None = None,
    join_type: str = "inner",
    num_partitions: int = 16,
    rename: dict | None = None,
):
    """Hash join, materialized, with an empty-partition workaround.

    Ray 2.49's hash-shuffle join crashes (``ArrowInvalid: No match or
    multiple matches for key field reference``) when one side of a
    partition receives ZERO rows: the empty packet carries no schema,
    so the per-partition pyarrow join cannot resolve the key column.
    Key spaces large relative to the partition count never hit this
    (the 100 TB design point); a vocabulary-sized key space at test
    scale can (observed: 31 distinct tokens over 16 partitions).
    Halving the partition count and retrying converges — at
    ``num_partitions=1`` a non-empty side cannot produce an empty
    partition — and the join result is partitioning-invariant, so the
    retry changes nothing but task granularity.

    SIZE-ADAPTIVE: both inputs are materialized first (the join is a
    hash-shuffle barrier anyway, and the retry loop would re-execute
    unmaterialized lineage); when BOTH sides fit under
    ``SMALL_PAIR_THRESHOLD`` rows the join runs as one local Acero
    ``pa.Table.join`` — same engine and output schema as Ray's
    per-partition join, minus the aggregator-actor spin-up that
    dominates wall time at small scale.  Above the threshold, the
    distributed hash join is the only shape that fits in memory."""
    left = left.materialize()
    right = right.materialize()
    if max(left.count(), right.count()) <= SMALL_PAIR_THRESHOLD:
        import ray
        import ray.data as rd

        def _tbl(ds):
            blocks = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
            if blocks:
                return pa.concat_tables(blocks, promote_options="default")
            return pa.table(
                {f.name: pa.array([], f.type) for f in ds.schema().base_schema}
            )

        j = _tbl(left).join(
            _tbl(right),
            keys=list(on),
            right_keys=list(right_on or on),
            join_type=join_type.replace("_", " "),
        )
        if rename:
            j = j.rename_columns([rename.get(c, c) for c in j.column_names])
        return rd.from_arrow(j)
    nparts = _join_partitions(num_partitions)
    while True:
        try:
            j = left.join(
                right,
                join_type=join_type,
                num_partitions=nparts,
                on=on,
                right_on=right_on,
            )
            if rename:
                j = j.rename_columns(rename)
            return j.materialize()
        except Exception as ex:  # noqa: BLE001 — match the Ray bug only
            if "key field reference" not in str(ex) or nparts <= 1:
                raise
            nparts //= 2


def _attach_by_id(pairs, per_doc, key: str, out_cols: dict, *, num_partitions: int):
    """Hash-join ``pairs`` (left) with a per-doc dataset (id, …) on
    ``key``; renames attached columns per ``out_cols``.  The pair table
    is the small side by construction — this replaces any id→value
    broadcast so no corpus-sized object ever exists in one place.
    Materialized so chained attaches never put two join shuffles in
    one running plan."""
    return hash_join_safe(
        pairs,
        per_doc,
        on=(key,),
        right_on=("id",),
        num_partitions=num_partitions,
        rename=out_cols or None,
    )


# ------------------------------------------------------------------ exact


def add_content_hash(ds, text_column: str = "text", hash_column: str = "content_hash"):
    def fn(batch: pa.Table) -> pa.Table:
        hashes = [
            hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch[text_column].to_pylist()
        ]
        return batch.append_column(hash_column, pa.array(hashes, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def exact_dedup(ds, *, text_column: str = "text", id_column: str = "doc_id"):
    """Keep the min-id row per distinct text.  Shuffles only
    (hash, id) pairs, not the documents.  Grouping runs as a key-hash
    repartition + per-block C++ min — distinct-text groups are
    corpus-count at web scale, the regime where Ray's aggregate
    machinery pays per-group Python cost (see _hash_group_blocks)."""
    hashed = add_content_hash(
        ds.select_columns([id_column, text_column]), text_column
    ).select_columns([id_column, "content_hash"])
    return _min_by_keys(hashed, ["content_hash"], id_column, id_column)


# ------------------------------------------------------------ jaccard exact


def tokenize_words(text: str) -> list[str]:
    return text.split()


def word_shingles(text: str, n: int = 3) -> set[str]:
    words = text.split()
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def _token_rows_fn(id_column: str, text_column: str, shingle_n: int):
    """Batch fn emitting one ``(id, token)`` row per DISTINCT
    token/shingle per document — shared by the Jaccard paths so the
    tokenization convention cannot drift between them."""

    def explode(batch: pa.Table) -> pa.Table:
        ids_out, toks = [], []
        for i, t in zip(batch[id_column].to_pylist(), batch[text_column].to_pylist()):
            tokens = (
                set(tokenize_words(t)) if shingle_n == 1 else word_shingles(t, shingle_n)
            )
            for tok in tokens:
                ids_out.append(i)
                toks.append(tok)
        return pa.table(
            {"id": pa.array(ids_out, pa.int64()), "token": pa.array(toks, pa.string())}
        )

    return explode


def jaccard_pairs(
    ds,
    *,
    threshold: float,
    id_column: str = "doc_id",
    text_column: str = "text",
    shingle_n: int = 1,
    max_df: int | None = None,
    num_partitions: int = 16,
):
    """All pairs (a < b) with token/shingle-set Jaccard ≥ threshold.
    Exact when ``max_df`` is None; see module docstring for the
    ``max_df`` skew/recall tradeoff.

    Set-size attachment is size-adaptive: when the co-occurrence pair
    table is small, the sizes of just the PAIRED docs are collected
    and broadcast (bounded by the pair count, never the corpus — the
    sanctioned small-input fast path); above the threshold two hash
    joins stream the sizes on."""
    explode = _token_rows_fn(id_column, text_column, shingle_n)

    # token → id lists via the key-hash repartition primitive
    # (vocabulary-count groups), with the max_df skew guard applied
    # BEFORE anything quadratic; materialized because both the sizes
    # and the pairs paths read it
    grouped = _collect_lists_by_key(
        ds.map_batches(explode, batch_format="pyarrow"), "token", "id", "ids"
    )
    if max_df is not None:

        def df_filter(batch: pa.Table) -> pa.Table:
            keep = pc.less_equal(pc.list_value_length(batch["ids"]), max_df)
            return batch.filter(keep)

        grouped = grouped.map_batches(df_filter, batch_format="pyarrow")
    grouped = grouped.materialize()

    # per-doc set size over the KEPT tokens (so max_df shrinks both
    # numerator and denominator consistently)
    def explode_members(batch: pa.Table) -> pa.Table:
        out = []
        for ids in batch["ids"].to_pylist():
            if ids:
                out.extend(ids)
        return pa.table({"id": pa.array(out, pa.int64())})

    # materialized: a join shuffle consuming a still-running groupby
    # shuffle has proven racy; sizes is one small row per doc and both
    # joins read it
    sizes = _count_by_keys(
        grouped.map_batches(explode_members, batch_format="pyarrow"), ["id"], "n"
    ).materialize()

    pair_counts = _count_by_keys(
        grouped.map_batches(_explode_pairs_batch, batch_format="pyarrow"),
        ["a", "b"],
        "n_common",
    ).materialize()
    n_pairs = pair_counts.count()
    if n_pairs == 0:
        return _empty_dataset({"a": pa.int64(), "b": pa.int64(), "jaccard": pa.float64()})

    if n_pairs <= SMALL_PAIR_THRESHOLD:
        import ray

        pair_tbl = pair_counts.to_pandas()
        wanted = pa.array(
            sorted(set(pair_tbl["a"]).union(pair_tbl["b"])), pa.int64()
        )
        wref = ray.put(wanted)
        sub = (
            sizes.map_batches(
                lambda t: t.filter(pc.is_in(t["id"], value_set=ray.get(wref))),
                batch_format="pyarrow",
            )
            .to_pandas()
        )
        size_map = dict(zip(sub["id"], sub["n"]))
        mref = ray.put(size_map)

        def score_small(batch: pa.Table) -> pa.Table:
            sm = ray.get(mref)
            a = batch["a"].to_pylist()
            b = batch["b"].to_pylist()
            c = batch["n_common"].to_numpy().astype(np.float64)
            na = np.asarray([sm[x] for x in a], dtype=np.float64)
            nb = np.asarray([sm[x] for x in b], dtype=np.float64)
            jac = c / (na + nb - c)
            out = batch.append_column("jaccard", pa.array(jac, pa.float64()))
            return out.filter(pc.greater_equal(out["jaccard"], threshold)).select(
                ["a", "b", "jaccard"]
            )

        return pair_counts.map_batches(score_small, batch_format="pyarrow")

    pair_counts, _ = _coalesce_for_join(pair_counts)
    with_a = _attach_by_id(
        pair_counts, sizes, "a", {"n": "n_a"}, num_partitions=num_partitions
    )
    with_ab = _attach_by_id(
        with_a, sizes, "b", {"n": "n_b"}, num_partitions=num_partitions
    )

    def score(batch: pa.Table) -> pa.Table:
        c = batch["n_common"].to_numpy().astype(np.float64)
        na = batch["n_a"].to_numpy().astype(np.float64)
        nb = batch["n_b"].to_numpy().astype(np.float64)
        jac = c / (na + nb - c)
        out = batch.append_column("jaccard", pa.array(jac, pa.float64()))
        return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return with_ab.map_batches(score, batch_format="pyarrow").select_columns(
        ["a", "b", "jaccard"]
    )


# --------------------------------------------------------------- minhash


def _hash64(s: str) -> int:
    """64-bit token/shingle hash: first 8 bytes of md5 (big-endian) —
    reproducible in SQL as ('0x' || substr(md5(s),1,16))::UBIGINT."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


class MinHasher:
    """k-permutation minhash: ``h_i(x) = a_i*x + b_i (mod 2^64)`` with
    odd multipliers over 64-bit shingle hashes -- the multiply-shift
    universal family, fully vectorized in numpy (uint64 wraparound is
    the modulus).  Deterministic: coefficients derive from a fixed
    seed."""

    def __init__(self, num_perm: int = 64, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        a = rng.randint(0, 2**63, size=num_perm).astype(np.uint64)
        self.a = (a << np.uint64(1)) | np.uint64(1)  # odd multipliers
        self.b = rng.randint(0, 2**63, size=num_perm).astype(np.uint64)

    @staticmethod
    def _shingle_hashes(shingles: set[str]) -> np.ndarray:
        return np.fromiter(
            (_hash64(s) for s in shingles), dtype=np.uint64, count=len(shingles)
        )

    def signature(self, shingles: set[str]) -> np.ndarray:
        if not shingles:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = self._shingle_hashes(shingles)
        # (num_perm, n_shingles) permuted hashes -> row-min, vectorized
        with np.errstate(over="ignore"):
            perms = self.a[:, None] * x[None, :] + self.b[:, None]
        return perms.min(axis=1)


_HASHER_MEMO: dict = {}


def _hasher_memo(num_perm: int, seed: int) -> "MinHasher":
    """Per-process MinHasher cache (deterministic: coefficients are a
    pure function of (num_perm, seed))."""
    key = (num_perm, seed)
    h = _HASHER_MEMO.get(key)
    if h is None:
        h = _HASHER_MEMO[key] = MinHasher(num_perm=num_perm, seed=seed)
    return h


def minhash_signatures(
    ds,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    num_perm: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
):
    """Dataset → (id, sig: list<uint64>).  Hasher built once per
    WORKER PROCESS via a module-level memo — the setup-once semantics
    of an actor pool without the per-execution actor spin-up cost
    (the state is ~1 KB of rng coefficients, so a task pool that
    reuses Ray's warm workers is strictly cheaper at every scale;
    actor pools stay reserved for heavy state like model weights)."""

    def sig_fn(batch: pa.Table) -> pa.Table:
        hasher = _hasher_memo(num_perm, seed)
        ids = batch[id_column].to_pylist()
        sigs = [
            hasher.signature(word_shingles(t, shingle_n))
            for t in batch[text_column].to_pylist()
        ]
        return pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "sig": pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
            }
        )

    return ds.map_batches(sig_fn, batch_format="pyarrow")


def shingle_hash_sets(
    ds,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    shingle_n: int = 3,
):
    """Dataset → (id, sh: binary) where ``sh`` packs the doc's sorted
    distinct shingle hashes as little-endian uint64 bytes.  8 bytes per
    shingle — the per-doc payload the verify join ships instead of
    text.  (Binary, not list<uint64>: Acero hash joins reject nested
    non-key fields.)"""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].to_pylist()
        sets = []
        for t in batch[text_column].to_pylist():
            hs = np.fromiter(
                (_hash64(s) for s in word_shingles(t, shingle_n)),
                dtype=np.uint64,
            )
            hs = np.unique(hs)  # sorted; dedups the (astronomically
            # unlikely) intra-doc hash collision
            sets.append(hs.astype("<u8").tobytes())
        return pa.table(
            {"id": pa.array(ids, pa.int64()), "sh": pa.array(sets, pa.binary())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def minhash_lsh_pairs(
    ds,
    *,
    threshold: float = 0.5,
    max_bucket: int | None = None,
    id_column: str = "doc_id",
    text_column: str = "text",
    num_perm: int = 64,
    bands: int = 32,
    shingle_n: int = 3,
    seed: int = 42,
    num_partitions: int = 16,
):
    """Candidate pairs via LSH banding, verified with exact Jaccard
    over per-doc shingle-hash sets.  Returns (a, b, jaccard ≥
    threshold).

    Pipeline: signatures → explode (band_id, band_hash, id) →
    groupby(band) → within-bucket pairs → distinct pairs → verify.
    The cross-band distinct is size-adaptive: raw pair lists at or
    under ``SMALL_PAIR_THRESHOLD`` dedup on the driver inside the
    candidate pull the broadcast verify already pays for (no second
    exchange), larger ones distinct via ``groupby(a, b)`` and attach
    shingle-hash sets by hash join (on a, then on b) → vectorized set
    intersection per pair.  No corpus-sized broadcast; the joins ship
    only candidate docs' hash sets."""
    rows_per_band = num_perm // bands
    docs = ds.select_columns([id_column, text_column])
    sigs = minhash_signatures(
        docs,
        id_column=id_column,
        text_column=text_column,
        num_perm=num_perm,
        shingle_n=shingle_n,
        seed=seed,
    )

    def explode_bands(batch: pa.Table) -> pa.Table:
        ids_out, band_ids, band_hashes = [], [], []
        for i, sig in zip(batch["id"].to_pylist(), batch["sig"].to_pylist()):
            for b in range(bands):
                chunk = tuple(sig[b * rows_per_band : (b + 1) * rows_per_band])
                h = hash((b,) + chunk) & 0x7FFFFFFFFFFFFFFF
                ids_out.append(i)
                band_ids.append(b)
                band_hashes.append(h)
        return pa.table(
            {
                "id": pa.array(ids_out, pa.int64()),
                "band": pa.array(band_ids, pa.int32()),
                "bucket": pa.array(band_hashes, pa.int64()),
            }
        )

    # bucket grouping via key-hash repartition + per-block runs (see
    # _hash_group_blocks: 7× over groupby().aggregate() at 15M buckets)
    cpus = _default_cpus()
    parts = _hash_group_blocks(
        sigs.map_batches(explode_bands, batch_format="pyarrow"),
        ["band", "bucket"],
        max(num_partitions, cpus),
    )

    def bucket_pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
        starts, ends, order = _group_runs(batch, ["band", "bucket"])
        if len(starts) == 0:
            return empty
        ids = batch["id"].to_numpy(zero_copy_only=False)[order]
        outa, outb = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            g = np.unique(ids[s:e])
            n = len(g)
            # hot-bucket guard: over-cap buckets contribute nothing
            # (recall note in _collect_ids_agg applies unchanged)
            if n < 2 or (max_bucket is not None and n > max_bucket):
                continue
            iu, ju = np.triu_indices(n, k=1)
            outa.append(g[iu])
            outb.append(g[ju])
        if not outa:
            return empty
        return pa.table(
            {
                "a": pa.array(np.concatenate(outa), pa.int64()),
                "b": pa.array(np.concatenate(outb), pa.int64()),
            }
        )

    # batch_size=None: whole-block batches — a bucket's rows are
    # co-located per block by the repartition, and a smaller batch
    # size would split runs mid-bucket
    raw_pairs = parts.map_batches(
        bucket_pairs, batch_format="pyarrow", batch_size=None
    ).materialize()
    n_raw = raw_pairs.count()
    if n_raw == 0:
        return _empty_dataset({"a": pa.int64(), "b": pa.int64(), "jaccard": pa.float64()})

    # Semi-join reduction before verification: only candidate docs
    # need shingle sets.  Under the threshold (gated on the RAW pair
    # count, so the driver pull is provably bounded) the cross-band
    # distinct runs on the driver — folding the former groupby(a, b)
    # exchange into the candidate-id pull this path already paid for.
    # Above it NOTHING candidate-sized touches the driver: the
    # distinct is a groupby(a, b) shuffle and every doc's shingle set
    # is hashed (linear, distributed) and attached by hash join.
    import ray

    small = n_raw <= SMALL_PAIR_THRESHOLD
    if small:
        cand_tbl = raw_pairs.to_pandas().drop_duplicates(ignore_index=True)
        cand_ids = pa.array(
            sorted(set(cand_tbl["a"]).union(cand_tbl["b"])), pa.int64()
        )
        ids_ref = ray.put(cand_ids)

        def keep_candidates(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.is_in(batch[id_column], value_set=ray.get(ids_ref))
            )

        sh_source = docs.map_batches(keep_candidates, batch_format="pyarrow")
    elif n_raw <= _CAND_ID_FILTER_MAX:
        # large path, still gated: pull only the distinct CANDIDATE
        # IDS (≤ 2 per raw pair — bounded by the gate, never the
        # corpus) as per-block sorted blobs, broadcast one int64
        # array, and md5-shingle only candidate docs.  Above the gate
        # every doc is shingled (linear, distributed) as before.
        blobs = raw_pairs.map_batches(
            _pair_id_blob_rows, batch_format="pyarrow"
        ).take_all()
        cand_arr = (
            np.unique(
                np.concatenate(
                    [np.frombuffer(r["ids"], dtype="<i8") for r in blobs]
                )
            )
            if blobs
            else np.empty(0, dtype="<i8")
        )
        arr_ref = ray.put(cand_arr)

        def keep_candidates_sorted(batch: pa.Table) -> pa.Table:
            ca = ray.get(arr_ref)
            if len(ca) == 0 or batch.num_rows == 0:
                return batch.slice(0, 0)
            ids = batch[id_column].to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(ca, ids), 0, len(ca) - 1)
            return batch.filter(pa.array(ca[pos] == ids))

        sh_source = docs.map_batches(
            keep_candidates_sorted, batch_format="pyarrow"
        )
    else:
        sh_source = docs
    sh_reduced = shingle_hash_sets(
        sh_source,
        id_column=id_column,
        text_column=text_column,
        shingle_n=shingle_n,
    )

    def _verify_from_arrays(a, b, sets_a, sets_b):
        jac = []
        for sa_b, sb_b in zip(sets_a, sets_b):
            sa = np.frombuffer(sa_b, dtype="<u8")
            sb = np.frombuffer(sb_b, dtype="<u8")
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            jac.append(inter / union if union else 0.0)
        out = pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )
        return out.filter(pc.greater_equal(out["jaccard"], threshold))

    if small:
        # broadcast fast path: the candidate-doc shingle map is bounded
        # by the candidate count (ADVICE-sanctioned small-input path)
        sub = sh_reduced.to_pandas()
        sh_map = dict(zip(sub["id"], sub["sh"]))
        mref = ray.put(sh_map)

        def verify_small(batch: pa.Table) -> pa.Table:
            sm = ray.get(mref)
            a = batch["a"].to_pylist()
            b = batch["b"].to_pylist()
            return _verify_from_arrays(
                a, b, (sm[x] for x in a), (sm[y] for y in b)
            )

        return _dataset_from_table(
            pa.Table.from_pandas(cand_tbl, preserve_index=False)
        ).map_batches(verify_small, batch_format="pyarrow")

    candidates = (
        raw_pairs.groupby(["a", "b"]).count().select_columns(["a", "b"])
    )
    candidates, _ = _coalesce_for_join(candidates)
    sh = sh_reduced.materialize()
    with_a = _attach_by_id(
        candidates, sh, "a", {"sh": "sh_a"}, num_partitions=num_partitions
    )
    with_ab = _attach_by_id(
        with_a, sh, "b", {"sh": "sh_b"}, num_partitions=num_partitions
    )

    def verify(batch: pa.Table) -> pa.Table:
        return _verify_from_arrays(
            batch["a"].to_pylist(),
            batch["b"].to_pylist(),
            batch["sh_a"].to_pylist(),
            batch["sh_b"].to_pylist(),
        )

    return with_ab.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------- simhash

_BIT_POS = np.arange(64, dtype=np.uint64)


def simhash64(tokens: list[str]) -> int:
    """Classic 64-bit simhash (Charikar): per-token md5-based 64-bit
    hash, bit-vote, sign → fingerprint.  md5 keeps it reproducible in
    the DuckDB oracle."""
    if not tokens:
        return 0
    hs = np.fromiter((_hash64(t) for t in tokens), dtype=np.uint64, count=len(tokens))
    bits = ((hs[:, None] >> _BIT_POS[None, :]) & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    return int(((votes > 0).astype(np.uint64) << _BIT_POS).sum())


def hamming64(a: int, b: int) -> int:
    return (a ^ b).bit_count()


def simhash_pairs(
    ds,
    *,
    max_hamming: int = 3,
    max_bucket: int | None = None,
    id_column: str = "doc_id",
    text_column: str = "text",
):
    """Near-dup pairs with simhash Hamming distance ≤ max_hamming.

    Pigeonhole banding: split the 64-bit fingerprint into
    ``max_hamming+1`` segments — any pair within distance ≤ max_hamming
    agrees exactly on ≥1 segment → groupby (segment_id, segment_value)
    yields a candidate superset (lossless).  Each bucket group carries
    its members' (id, fp) through the aggregate, so the exact-Hamming
    verify is bucket-local — no id→fp map exists anywhere — and (with
    no ``max_bucket`` cap) each pair is emitted only by its FIRST
    agreeing segment, so no cross-segment distinct exchange runs at
    all; the capped route keeps the groupby(a, b) distinct."""
    n_seg = max_hamming + 1
    seg_bits = 64 // n_seg

    def fingerprints(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].to_pylist()
        fps = [simhash64(t.split()) for t in batch[text_column].to_pylist()]
        return pa.table(
            {"id": pa.array(ids, pa.int64()), "fp": pa.array(fps, pa.uint64())}
        )

    def explode_segments(batch: pa.Table) -> pa.Table:
        ids_out, segs, vals, fp_out = [], [], [], []
        for i, fp in zip(batch["id"].to_pylist(), batch["fp"].to_pylist()):
            for s in range(n_seg):
                lo = s * seg_bits
                width = seg_bits if s < n_seg - 1 else 64 - lo
                ids_out.append(i)
                segs.append(s)
                vals.append((fp >> lo) & ((1 << width) - 1))
                fp_out.append(fp)
        return pa.table(
            {
                "id": pa.array(ids_out, pa.int64()),
                "seg": pa.array(segs, pa.int32()),
                "val": pa.array(vals, pa.uint64()),
                "fp": pa.array(fp_out, pa.uint64()),
            }
        )

    # Exactly-once emission: both fingerprints already travel with the
    # bucket, so the bucket for segment ``s`` can check whether any
    # EARLIER segment also agrees — if so, that earlier (canonical)
    # bucket owns the pair and this one skips it.  That removes the
    # cross-segment distinct (a whole groupby(a, b) exchange) at every
    # scale for free.  The canonical check only holds when no bucket
    # was dropped, so a ``max_bucket`` cap keeps the distinct-exchange
    # route (same caveat as the prefix join: a capped canonical bucket
    # would silently drop pairs a surviving later bucket still saw).
    canonical = max_bucket is None

    def verify_runs(batch: pa.Table) -> pa.Table:
        """Per-block bucket verify over (seg, val) runs (the buckets
        are block-local after the key-hash repartition)."""
        a_out, b_out, d_out = [], [], []
        starts, ends, order = _group_runs(batch, ["seg", "val"])
        if len(starts):
            segs = batch["seg"].to_numpy(zero_copy_only=False)[order]
            ids = batch["id"].to_numpy(zero_copy_only=False)[order]
            fps = batch["fp"].to_numpy(zero_copy_only=False)[order]
        for st, en in zip(starts, ends):
            if en - st < 2:
                continue
            s = int(segs[st])
            uniq = sorted({(int(i), int(fp)) for i, fp in zip(ids[st:en], fps[st:en])})
            if max_bucket is not None and len(uniq) > max_bucket:
                continue  # hot-bucket guard, as in the aggregate route
            for x in range(len(uniq)):
                ix, fx = uniq[x]
                for y in range(x + 1, len(uniq)):
                    iy, fy = uniq[y]
                    xor = fx ^ fy
                    d = xor.bit_count()
                    if d > max_hamming:
                        continue
                    if canonical and any(
                        (xor >> (sp * seg_bits))
                        & ((1 << (seg_bits if sp < n_seg - 1 else 64 - sp * seg_bits)) - 1)
                        == 0
                        for sp in range(s)
                    ):
                        continue  # an earlier segment owns this pair
                    a_out.append(ix)
                    b_out.append(iy)
                    d_out.append(d)
        return pa.table(
            {
                "a": pa.array(a_out, pa.int64()),
                "b": pa.array(b_out, pa.int64()),
                "hamming": pa.array(d_out, pa.int64()),
            }
        )

    import ray
    from ray.data.aggregate import Min

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    parts = _hash_group_blocks(
        ds.select_columns([id_column, text_column])
        .map_batches(fingerprints, batch_format="pyarrow")
        .map_batches(explode_segments, batch_format="pyarrow"),
        ["seg", "val"],
        max(16, cpus),
    )
    # batch_size=None: whole-block batches so runs never split mid-bucket
    pairs = parts.map_batches(
        verify_runs, batch_format="pyarrow", batch_size=None
    )
    if canonical:
        return pairs
    # capped route: a pair can survive in several segments — distinct
    return pairs.groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming"))


# ------------------------------------------------ connected components


def _union_find_labels(a_ids, b_ids) -> dict:
    """Driver-side union-find over an edge list → {node: min id in its
    component}.  Exact; used as the bounded small-input fast path of
    :func:`connected_components` and as the differential oracle for
    the distributed label-propagation path in tests."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(a_ids, b_ids):
        a, b = int(a), int(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min so the root IS the component's min id
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
        parent.setdefault(a, find(a))
        parent.setdefault(b, find(b))
    return {n: find(n) for n in parent}


def connected_components(
    pairs,
    *,
    max_iters: int = 50,
    num_partitions: int = 16,
    small_threshold: int | None = None,
):
    """Edge table (a:int64, b:int64) → (node, cluster_id) where
    ``cluster_id`` is the MIN node id reachable from ``node`` — the
    canonical way to finish near-dedup at scale: LSH emits pairs, this
    groups them into duplicate clusters so one representative per
    cluster survives.

    Size-adaptive like the other dedup verifiers: at or under
    ``small_threshold`` edges (default :data:`SMALL_PAIR_THRESHOLD`)
    the edge list is pulled to the driver and solved with union-find
    (driver state bounded by the threshold).  Above it, distributed
    min-label propagation: labels start as each node's own id and one
    round does  labels ∪ (edges ⋈ labels) → groupby(node).min  —
    per-round cost is one hash join + one groupby over (node, label)
    pairs only, never document payloads.  Converges in O(cluster
    diameter) rounds; near-dup clusters are near-cliques (every member
    pairs with most others), so diameter is small by construction.
    Convergence is detected by the label-sum fixpoint (labels are
    monotonically non-increasing, so an unchanged sum means no label
    moved); raises after ``max_iters`` without convergence.
    """
    import ray.data as rd

    if small_threshold is None:
        small_threshold = SMALL_PAIR_THRESHOLD

    pairs = pairs.select_columns(["a", "b"]).materialize()
    n_edges = pairs.count()
    if n_edges == 0:
        return _empty_dataset({"node": pa.int64(), "cluster_id": pa.int64()})

    if n_edges <= small_threshold:
        df = pairs.to_pandas()
        labels = _union_find_labels(df["a"].to_numpy(), df["b"].to_numpy())
        nodes = sorted(labels)
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(nodes, pa.int64()),
                    "cluster_id": pa.array([labels[n] for n in nodes], pa.int64()),
                }
            )
        )

    def both_directions(batch: pa.Table) -> pa.Table:
        a = batch["a"]
        b = batch["b"]
        return pa.table(
            {
                "src": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
                "dst": pa.concat_arrays([b.combine_chunks(), a.combine_chunks()]),
            }
        )

    edges = pairs.map_batches(both_directions, batch_format="pyarrow").materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"node": batch["src"], "label": batch["src"]}
        )

    import ray as _ray

    cpus = (
        int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    )
    kparts = max(num_partitions, cpus)

    def block_min(batch: pa.Table) -> pa.Table:
        """Per-block C++ min — final per-node labels, because the
        key-hash repartition co-located each node's rows (node-count
        groups through Ray's aggregate machinery measured 2×+ slower;
        see _hash_group_blocks)."""
        if batch.num_rows == 0:
            return pa.table(
                {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
            )
        g = batch.group_by("node").aggregate([("label", "min")])
        return pa.table({"node": g["node"], "label": g["label_min"]})

    def _min_by_node(ds_in):
        return (
            _hash_group_blocks(ds_in, ["node"], kparts)
            .map_batches(block_min, batch_format="pyarrow", batch_size=None)
            .materialize()  # read twice: the fixpoint sum AND the next join
        )

    labels = _min_by_node(
        edges.map_batches(init_labels, batch_format="pyarrow")
    )

    # Delta propagation: a label that did not decrease last round has
    # already delivered its value across every incident edge, so only
    # CHANGED rows join against the edge table (min-label propagation
    # is monotone — the standard semi-naive/delta evaluation).  Later
    # rounds join a shrinking frontier instead of all nodes, and the
    # per-node change flag doubles as an EXACT convergence test
    # (replacing the label-checksum scans).  One exchange per round:
    # old labels and arriving candidates are tagged, key-hash grouped
    # by node, and a per-block numpy segment-min emits the new label
    # plus its changed flag in the same pass.
    def _tag(o_val: int):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "o", pa.array(np.full(batch.num_rows, o_val, np.int8))
            )

        return fn

    _I64MAX = np.iinfo(np.int64).max

    def block_merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "label": pa.array([], pa.int64()),
                    "chg": pa.array([], pa.bool_()),
                }
            )
        starts, _ends, order = _group_runs(batch, ["node"])
        node = batch["node"].to_numpy(zero_copy_only=False)[order]
        lab = batch["label"].to_numpy(zero_copy_only=False)[order]
        is_old = batch["o"].to_numpy(zero_copy_only=False)[order] == 1
        newmin = np.minimum.reduceat(lab, starts)
        oldv = np.minimum.reduceat(np.where(is_old, lab, _I64MAX), starts)
        return pa.table(
            {
                "node": pa.array(node[starts], pa.int64()),
                "label": pa.array(newmin, pa.int64()),
                "chg": pa.array(newmin < oldv),
            }
        )

    changed = labels  # round 0: every label is fresh
    n_parts = _join_partitions(num_partitions)
    for _ in range(max_iters):
        prop = edges.join(
            changed,
            join_type="inner",
            num_partitions=n_parts,
            on=("src",),
            right_on=("node",),
        ).select_columns(["dst", "label"]).rename_columns({"dst": "node"})
        merged = (
            _hash_group_blocks(
                labels.map_batches(_tag(1), batch_format="pyarrow").union(
                    prop.map_batches(_tag(0), batch_format="pyarrow")
                ),
                ["node"],
                kparts,
            )
            .map_batches(block_merge, batch_format="pyarrow", batch_size=None)
            .materialize()
        )
        labels = merged.drop_columns(["chg"])
        changed, n_changed = _coalesce_for_join(
            merged.map_batches(
                lambda b: b.filter(b["chg"]).drop_columns(["chg"]),
                batch_format="pyarrow",
            )
        )
        if n_changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds"
        )
    return labels.rename_columns({"label": "cluster_id"})


def near_dedup_clusters(
    ds,
    pairs=None,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 32,
    shingle_n: int = 3,
    num_partitions: int = 16,
    small_threshold: int | None = None,
):
    """Full near-dedup decision over ALL documents: near-dup pairs
    (MinHash-LSH by default, or a caller-supplied (a, b) edge table) →
    connected components → (doc_id, cluster_id, keep).  Docs in no
    pair are singletons (cluster_id = own id); ``keep`` marks the
    min-id representative of each cluster — filtering on it IS the
    dedup."""
    ids = ds.select_columns([id_column])
    if pairs is None:
        pairs = minhash_lsh_pairs(
            ds,
            threshold=threshold,
            id_column=id_column,
            text_column=text_column,
            num_perm=num_perm,
            bands=bands,
            shingle_n=shingle_n,
            num_partitions=num_partitions,
        )
    comp = connected_components(
        pairs, num_partitions=num_partitions, small_threshold=small_threshold
    ).materialize()

    # Size-adaptive attach: the components table is bounded by the
    # edge count, so whenever the union-find fast path ran (edges ≤
    # threshold) it is provably driver-small — broadcast the node→
    # cluster map once instead of paying a join shuffle's fixed cost.
    thresh = SMALL_PAIR_THRESHOLD if small_threshold is None else small_threshold
    if comp.count() <= thresh:
        import ray

        cdf = comp.to_pandas()
        cmap_ref = ray.put(dict(zip(cdf["node"], cdf["cluster_id"])))

        def attach_small(batch: pa.Table) -> pa.Table:
            cmap = ray.get(cmap_ref)
            own = batch[id_column].to_pylist()
            cluster = pa.array([cmap.get(i, i) for i in own], pa.int64())
            return pa.table(
                {
                    id_column: batch[id_column],
                    "cluster_id": cluster,
                    "keep": pc.equal(cluster, batch[id_column]),
                }
            )

        return ids.map_batches(attach_small, batch_format="pyarrow")

    joined = hash_join_safe(
        ids,
        comp,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=(id_column,),
        right_on=("node",),
    )

    def finish(batch: pa.Table) -> pa.Table:
        cluster = pc.coalesce(batch["cluster_id"], batch[id_column])
        return pa.table(
            {
                id_column: batch[id_column],
                "cluster_id": cluster,
                "keep": pc.equal(cluster, batch[id_column]),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


# ------------------------------------------------------ line-level dedup


def _assemble_lines_agg(name: str = "text", sep: str = "\n"):
    """AggregateFn collecting the group's (pos, line) rows, finalized
    as the ``sep``-joined text in position order.  Accumulated state
    is one document's lines — doc-sized, never corpus-sized."""
    from ray.data.aggregate import AggregateFn

    # state is a list of "{pos:08d}|{line}" strings (Arrow-friendly);
    # the fixed-width prefix makes lexicographic sort == position sort
    # and slicing recovers the line even if it contains the separator
    def acc_block(acc, block):
        if hasattr(block, "column_names"):
            pairs = zip(block["pos"].to_pylist(), block["line"].to_pylist())
        else:
            pairs = zip(list(block["pos"]), list(block["line"]))
        acc.extend(f"{p:08d}|{l}" for p, l in pairs)
        return acc

    return AggregateFn(
        init=lambda k: [],
        accumulate_block=acc_block,
        merge=lambda a, b: a + b,
        finalize=lambda acc: sep.join(s[9:] for s in sorted(acc)),
        name=name,
    )


_LINE_POS_BITS = 20  # max 2^20 lines per document (packed first-occurrence key)


def line_dedup(
    ds,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    min_line_len: int = 1,
    num_partitions: int = 16,
):
    """Corpus-level duplicated-line removal (the CCNet / RefinedWeb
    line-dedup pass): split every document into lines, remove every
    line that occurred earlier ANYWHERE in the corpus (first occurrence
    wins, ordered by (id, line position)), reassemble the survivors.
    Returns (id, text, n_removed).

    Lines shorter than ``min_line_len`` are exempt (always kept) — the
    CCNet convention that boilerplate detection shouldn't eat empty /
    trivial lines' structure.

    Scale shape: explode → groupby(line md5) over (hash, packed
    first-occurrence key) only → winners joined back onto the exploded
    lines (hash join, no broadcast) → per-document reassembly
    aggregate whose state is one document's lines.  The only
    corpus-sized shuffles carry (16 B hash, 8 B key) pairs.  Ids must
    be int64 with < 2^20 lines per document (packed key); a corpus
    with longer documents raises rather than silently misordering.
    """
    from ray.data.aggregate import AggregateFn, Count, Max

    docs = ds.select_columns([id_column, text_column])

    def explode(batch: pa.Table) -> pa.Table:
        ids, poss, lines, keys, eligs, hashes, nlines = [], [], [], [], [], [], []
        for i, t in zip(
            batch[id_column].to_pylist(), batch[text_column].to_pylist()
        ):
            parts = (t or "").split("\n")
            if len(parts) >= (1 << _LINE_POS_BITS):
                raise ValueError(
                    f"document {i}: {len(parts)} lines exceeds the "
                    f"2^{_LINE_POS_BITS} packed-position limit"
                )
            n = len(parts)
            for p, line in enumerate(parts):
                ids.append(i)
                poss.append(p)
                lines.append(line)
                keys.append((i << _LINE_POS_BITS) | p)
                eligs.append(len(line) >= min_line_len)
                hashes.append(hashlib.md5(line.encode("utf-8")).hexdigest())
                nlines.append(n)
        return pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "pos": pa.array(poss, pa.int32()),
                "line": pa.array(lines, pa.large_string()),
                "key": pa.array(keys, pa.int64()),
                "elig": pa.array(eligs, pa.bool_()),
                "h": pa.array(hashes, pa.string()),
                "n_lines": pa.array(nlines, pa.int32()),
            }
        )

    exploded = docs.map_batches(explode, batch_format="pyarrow").materialize()

    winners = _min_by_keys(
        exploded.filter(expr="elig"), ["h"], "key", "keep_key"
    )
    winners, _ = _coalesce_for_join(winners)

    # ineligible (shorter than min_line_len) lines bypass the winners
    # join entirely — they are always kept
    keep_cols = ["id", "pos", "line", "n_lines"]
    inelig = exploded.filter(expr="elig == False").select_columns(keep_cols)

    joined = hash_join_safe(
        exploded.filter(expr="elig"),
        winners,
        join_type="inner",
        num_partitions=num_partitions,
        on=("h",),
        right_on=("h",),
    )

    def keep_filter(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["key"], batch["keep_key"])).select(
            keep_cols
        )

    kept = joined.map_batches(keep_filter, batch_format="pyarrow").union(inelig)

    assembled = kept.groupby("id").aggregate(
        _assemble_lines_agg(text_column),
        Count(alias_name="n_kept"),
        Max("n_lines", alias_name="n_lines"),
    )
    assembled, _ = _coalesce_for_join(assembled)

    # documents whose every line was removed are absent from `kept`;
    # re-attach them with empty text via a left join from the id table
    ids_only = exploded.select_columns(["id", "n_lines"]).groupby("id").aggregate(
        Max("n_lines", alias_name="n_total")
    )
    ids_only, _ = _coalesce_for_join(ids_only)
    full = hash_join_safe(
        ids_only,
        assembled,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("id",),
        right_on=("id",),
    )

    def finish(batch: pa.Table) -> pa.Table:
        text = pc.coalesce(
            pc.cast(batch[text_column], pa.large_string()),
            pa.scalar("", pa.large_string()),
        )
        n_kept = pc.coalesce(batch["n_kept"], pa.scalar(0, pa.int64()))
        removed = pc.subtract(
            pc.cast(batch["n_total"], pa.int64()), pc.cast(n_kept, pa.int64())
        )
        return pa.table(
            {
                id_column: batch["id"],
                text_column: text,
                "n_removed": removed,
            }
        )

    return full.map_batches(finish, batch_format="pyarrow")


# ------------------------------------------------------- substring dedup

_WIN_POS_BITS = 20  # max 2^20 tokens per document (packed first-occurrence key)


def substring_dedup(
    ds,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    window: int = 10,
    num_partitions: int = 16,
    small_threshold: int = 2_000_000,
):
    """Exact repeated-substring removal (the suffix-array dedup of
    Lee et al. 2021, "Deduplicating Training Data Makes Language
    Models Better", recast as a fixed-window streaming pass): any
    ``window``-token span whose exact text occurred earlier ANYWHERE
    in the corpus (first occurrence wins, ordered by (id, start)) is
    removed; every token covered by at least one duplicate window is
    dropped and the survivors are re-joined with single spaces.
    Returns (id, text, n_removed) where ``n_removed`` counts removed
    tokens.  Documents shorter than ``window`` tokens pass through
    untouched (normalized to single-space joining).

    Tokenization is whitespace-run splitting (Python ``str.split``),
    so output text is whitespace-normalized by construction — like the
    suffix-array method this operates on a canonical token stream,
    not raw bytes.

    Scale shape (mirrors :func:`line_dedup`): explode windows →
    groupby(window hash) carrying only (16 B hash, 8 B packed key) →
    winners hash-joined back onto the window table (no broadcast) →
    duplicate starts collected per doc by an aggregate whose state is
    one document's duplicate-start list → one hash join back onto the
    docs table → vectorized interval-difference rebuild per doc.  No
    corpus-sized object ever exists in one place; the only
    corpus-sized shuffles carry fixed-width rows.

    Window equality is by TWO independent 64-bit polynomial rolling
    hashes over md5 token values (Rabin–Karp with odd multipliers mod
    2^64, O(tokens) per doc via the modular-inverse prefix trick —
    not O(tokens × window) string hashing).  Token values are
    md5-random, so non-adversarial collision odds are ~2^-128 per
    pair, the same exactness convention as :func:`exact_dedup`; the
    known adversarial weakness of mod-2^64 polynomial hashing does
    not apply to natural-text dedup.
    """
    from ray.data.aggregate import AggregateFn, Min

    docs = ds.select_columns([id_column, text_column])

    _B1 = np.uint64(0x9E3779B97F4A7C15)  # odd → invertible mod 2^64
    _B2 = np.uint64(0xC2B2AE3D27D4EB4F)
    _M = 1 << 64
    _B1INV = np.uint64(pow(int(_B1), -1, _M))
    _B2INV = np.uint64(pow(int(_B2), -1, _M))

    def _pows(base: np.uint64, n: int) -> np.ndarray:
        p = np.full(n, base, dtype=np.uint64)
        p[0] = 1
        return np.cumprod(p)  # uint64 wraparound == mod 2^64

    def _window_hashes(tv: np.ndarray, base, base_inv) -> np.ndarray:
        # h_s = Σ_{i=s}^{s+W-1} t_i B^{W-1-(i-s)}
        #     = (S0[s+W] - S0[s]) * B^{s+W-1}  with  S0 = Σ t_i B^-i
        n = len(tv)
        binv = _pows(base_inv, n)
        s0 = np.zeros(n + 1, dtype=np.uint64)
        np.cumsum(tv * binv, out=s0[1:])
        bpow = _pows(base, n)
        return (s0[window:] - s0[: n - window + 1]) * bpow[window - 1 :]

    def explode(batch: pa.Table) -> pa.Table:
        h1s, h2s, keys, ids, starts = [], [], [], [], []
        cache: dict = {}

        def tok_val(tok: str) -> tuple:
            v = cache.get(tok)
            if v is None:
                d = hashlib.md5(tok.encode("utf-8")).digest()
                v = (
                    np.uint64(int.from_bytes(d[:8], "little")),
                    np.uint64(int.from_bytes(d[8:], "little")),
                )
                cache[tok] = v
            return v

        for i, t in zip(
            batch[id_column].to_pylist(), batch[text_column].to_pylist()
        ):
            toks = (t or "").split()
            n = len(toks)
            if n >= (1 << _WIN_POS_BITS):
                raise ValueError(
                    f"document {i}: {n} tokens exceeds the "
                    f"2^{_WIN_POS_BITS} packed-position limit"
                )
            if n < window:
                continue
            vals = [tok_val(t_) for t_ in toks]
            ta = np.fromiter((v[0] for v in vals), dtype=np.uint64, count=n)
            tb = np.fromiter((v[1] for v in vals), dtype=np.uint64, count=n)
            h1s.append(_window_hashes(ta, _B1, _B1INV).view(np.int64))
            h2s.append(_window_hashes(tb, _B2, _B2INV).view(np.int64))
            nw = n - window + 1
            keys.append((np.int64(i) << _WIN_POS_BITS) + np.arange(nw, dtype=np.int64))
            ids.append(np.full(nw, i, dtype=np.int64))
            starts.append(np.arange(nw, dtype=np.int32))

        if not h1s:
            return pa.table(
                {
                    "h1": pa.array([], pa.int64()),
                    "h2": pa.array([], pa.int64()),
                    "key": pa.array([], pa.int64()),
                    "id": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int32()),
                }
            )
        return pa.table(
            {
                "h1": pa.array(np.concatenate(h1s)),
                "h2": pa.array(np.concatenate(h2s)),
                "key": pa.array(np.concatenate(keys)),
                "id": pa.array(np.concatenate(ids)),
                "s": pa.array(np.concatenate(starts)),
            }
        )

    exploded = docs.map_batches(explode, batch_format="pyarrow").materialize()

    # size-adaptive (repo convention, cf. minhash/politeness): under
    # the threshold the winners/dups computation runs driver-side on
    # one bounded pandas frame (28 B/window ⇒ ≤56 MB at the 2M
    # default) and only the rebuild map executes on the cluster — the
    # multi-shuffle scale path below pays ~8 fixed execution
    # latencies, pure overhead at small n.  Differential-tested equal
    # to the scale path (small_threshold=0).
    n_windows = exploded.count()
    if n_windows <= small_threshold:
        import ray

        pdf = exploded.to_pandas()
        if len(pdf):
            keymin = pdf.groupby(["h1", "h2"])["key"].transform("min")
            dup = pdf[pdf["key"] != keymin]
            starts_map = {
                int(i): np.asarray(g, dtype=np.int64)
                for i, g in dup.groupby("id")["s"]
            }
        else:
            starts_map = {}
        map_ref = ray.put(starts_map)

        def rebuild_small(batch: pa.Table) -> pa.Table:
            smap = ray.get(map_ref)
            texts, removed = [], []
            for i, t in zip(
                batch[id_column].to_pylist(), batch[text_column].to_pylist()
            ):
                toks = (t or "").split()
                a = smap.get(int(i))
                if a is None:
                    texts.append(" ".join(toks))
                    removed.append(0)
                    continue
                delta = np.zeros(len(toks) + 1, dtype=np.int32)
                np.add.at(delta, a, 1)
                np.add.at(delta, np.minimum(a + window, len(toks)), -1)
                covered = np.cumsum(delta[:-1]) > 0
                texts.append(" ".join(tok for tok, c in zip(toks, covered) if not c))
                removed.append(int(covered.sum()))
            return pa.table(
                {
                    id_column: pc.cast(batch[id_column], pa.int64()),
                    text_column: pa.array(texts, pa.large_string()),
                    "n_removed": pa.array(removed, pa.int64()),
                }
            )

        return docs.map_batches(rebuild_small, batch_format="pyarrow")

    winners = _min_by_keys(exploded, ["h1", "h2"], "key", "keep_key")
    winners, _ = _coalesce_for_join(winners)

    joined = hash_join_safe(
        exploded,
        winners,
        join_type="inner",
        num_partitions=num_partitions,
        on=("h1", "h2"),
        right_on=("h1", "h2"),
    )

    def dup_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.not_equal(batch["key"], batch["keep_key"])).select(
            ["id", "s"]
        )

    # duplicate starts per doc, finalized as packed little-endian
    # int32 bytes — Acero joins reject list<> payload columns, and a
    # binary column also keeps the join row fixed-overhead
    from ray.data.aggregate import AggregateFn

    def _acc_starts(acc, block):
        vals = (
            block["s"].to_pylist()
            if hasattr(block, "column_names")
            else list(block["s"])
        )
        return acc + vals

    starts_agg = AggregateFn(
        init=lambda k: [],
        accumulate_block=_acc_starts,
        merge=lambda a, b: a + b,
        finalize=lambda acc: np.asarray(acc, dtype="<i4").tobytes(),
        name="dup_starts",
    )

    dup_starts = (
        joined.map_batches(dup_only, batch_format="pyarrow")
        .groupby("id")
        .aggregate(starts_agg)
    )
    dup_starts, n_dup_docs = _coalesce_for_join(dup_starts)

    if n_dup_docs:
        full = hash_join_safe(
            docs,
            dup_starts,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=(id_column,),
            right_on=("id",),
        )
    else:  # nothing duplicated anywhere — normalize-only pass
        full = docs.map_batches(
            lambda b: b.append_column(
                "dup_starts", pa.array([None] * b.num_rows, pa.binary())
            ),
            batch_format="pyarrow",
        )

    def rebuild(batch: pa.Table) -> pa.Table:
        texts, removed = [], []
        starts_col = batch["dup_starts"].to_pylist()
        for t, packed in zip(batch[text_column].to_pylist(), starts_col):
            toks = (t or "").split()
            if not packed:
                texts.append(" ".join(toks))
                removed.append(0)
                continue
            delta = np.zeros(len(toks) + 1, dtype=np.int32)
            a = np.frombuffer(packed, dtype="<i4").astype(np.int64)
            np.add.at(delta, a, 1)
            np.add.at(delta, np.minimum(a + window, len(toks)), -1)
            covered = np.cumsum(delta[:-1]) > 0
            kept = [tok for tok, c in zip(toks, covered) if not c]
            texts.append(" ".join(kept))
            removed.append(int(covered.sum()))
        return pa.table(
            {
                id_column: batch[id_column].cast(pa.int64()),
                text_column: pa.array(texts, pa.large_string()),
                "n_removed": pa.array(removed, pa.int64()),
            }
        )

    return full.map_batches(rebuild, batch_format="pyarrow")


# ------------------------------------------------------ snapshot dedup


def latest_capture(
    ds,
    *,
    key_column: str = "url",
    ts_column: str = "warc_ts",
    payload_column: str = "text",
    num_partitions: int = 16,
):
    """Cross-snapshot capture dedup (the Common-Crawl "latest crawl
    wins" pass): a pages table holding multiple captures of the same
    URL reduces to one row per URL — the capture with the highest
    ``ts_column``, exact ties broken by the highest md5 of
    ``payload_column`` (a total order, so the winner is unique and
    deterministic at any parallelism).

    Scale shape — the temporal sibling of :func:`exact_dedup`, with
    payload-shuffle damping: a per-block partial first reduces each
    block to one candidate row per URL (vectorized idxmax, no
    shuffle), so the winners groupby and the row-fetch join move only
    block-winner rows (~one row per URL per block it appears in), not
    every capture.  The winners shuffle itself carries just (url,
    26-byte packed key).
    """
    from ray.data.aggregate import Max

    def pack_batch(batch: pa.Table) -> pa.Table:
        # pack (ts, payload-md5) into one lexicographically ordered
        # string key; per-block winner per url via pandas idxmax
        import pandas as pd

        ts = pc.cast(batch[ts_column], pa.int64()).to_pylist()
        payloads = batch[payload_column].to_pylist()
        keys = [
            f"{t + (1 << 62):016x}" + hashlib.md5((p or "").encode("utf-8")).hexdigest()
            for t, p in zip(ts, payloads)
        ]
        batch = batch.append_column("cap_key", pa.array(keys, pa.string()))
        pdf = batch.to_pandas()
        idx = pdf.groupby(key_column)["cap_key"].idxmax()
        return pa.Table.from_pandas(pdf.loc[idx], preserve_index=False).cast(
            batch.schema
        )

    reduced = ds.map_batches(pack_batch, batch_format="pyarrow").materialize()

    winners = (
        reduced.select_columns([key_column, "cap_key"])
        .groupby(key_column)
        .aggregate(Max("cap_key", alias_name="max_key"))
    )
    winners, _ = _coalesce_for_join(winners)

    joined = hash_join_safe(
        reduced,
        winners,
        join_type="inner",
        num_partitions=num_partitions,
        on=(key_column,),
        right_on=(key_column,),
    )

    def keep(batch: pa.Table) -> pa.Table:
        out = batch.filter(pc.equal(batch["cap_key"], batch["max_key"]))
        return out.drop_columns(["cap_key", "max_key"])

    return joined.map_batches(keep, batch_format="pyarrow")


# ------------------------------------------------------- incremental


def incremental_dedup(
    new_ds,
    prior_ds,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
):
    """Dedup a NEW crawl increment against a PRIOR corpus and against
    itself: keep the min-id new document per distinct text whose text
    does not already appear in the prior corpus.  This is the standing
    operation of a continuous crawl — each snapshot is deduped against
    everything already kept (reference cache read-through semantics,
    ``async_webcrawler.py`` cache_mode ENABLED, lifted to corpus
    scale).

    Scale shape: both sides reduce to ``(content_hash, prior_flag,
    candidate_id)`` rows before the shuffle; one ``groupby(content_hash)``
    with two Min aggregates decides every group.  Shuffled payload is
    ~48 B/doc regardless of document size, and no side is ever
    broadcast or driver-materialized — at 10^10 URLs this is one
    hash-partitioned exchange, the same shape as :func:`exact_dedup`.

    Returns one row per kept new document: ``(doc_id, content_hash)``.
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import Max, Min

    # prior rows carry the sentinel as their candidate id, so
    # Min(cand_id) over a group yields the min NEW id when any new row
    # is present, and the sentinel for prior-only groups; prior
    # presence itself is Max(prior_flag).
    _SENTINEL = (1 << 63) - 1  # no-new-candidate marker (int64 max)

    def tag(prior_flag: int):
        def fn(batch: pa.Table) -> pa.Table:
            hashes = [
                hashlib.md5(t.encode("utf-8")).hexdigest()
                for t in batch[text_column].to_pylist()
            ]
            n = len(hashes)
            cand = (
                pa.array([_SENTINEL] * n, pa.int64())
                if prior_flag
                else batch[id_column].cast(pa.int64())
            )
            return pa.table(
                {
                    "content_hash": pa.array(hashes, pa.string()),
                    "prior_flag": pa.array([prior_flag] * n, pa.int64()),
                    "cand_id": cand,
                }
            )

        return fn

    new_tagged = new_ds.select_columns([id_column, text_column]).map_batches(
        tag(0), batch_format="pyarrow"
    )
    prior_tagged = prior_ds.select_columns([id_column, text_column]).map_batches(
        tag(1), batch_format="pyarrow"
    )

    decided = (
        new_tagged.union(prior_tagged)
        .groupby("content_hash")
        .aggregate(
            Max("prior_flag", alias_name="has_prior"),
            Min("cand_id", alias_name=id_column),
        )
    )

    def keep_new(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.equal(batch["has_prior"], 0),
            pc.not_equal(batch[id_column], _SENTINEL),
        )
        return batch.filter(m).select(["content_hash", id_column])

    return decided.map_batches(keep_new, batch_format="pyarrow")


# ----------------------------------- quality-based representative pick

# Packed argmax base: qkey = n_distinct * 2^40 + (2^40 - 1 - doc_id),
# so MAX(qkey) == argmax by (n_distinct, then LOWEST doc_id).  Holds
# for doc_id < 2^40 (a 10^10-URL corpus is ~2^33) and n_distinct
# < 2^23 words (any real document).
_QKEY_BASE = 1 << 40


def near_dedup_keep_best(
    ds,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 32,
    shingle_n: int = 3,
    num_partitions: int = 16,
):
    """Near-dedup with QUALITY-based representative selection (the
    FineWeb/RefinedWeb decision: keep the best doc of each duplicate
    cluster, not the lowest-id one): MinHash-LSH pairs → connected
    components → per-cluster argmax of (n_distinct_words, min id) via
    a packed-integer ``Max`` aggregate.

    Scale shape: reuses :func:`near_dedup_clusters` (banded candidate
    generation, join-based verification); the quality signal is a
    stateless per-doc pass; the argmax is ONE ``groupby(cluster_id)``
    of int64 rows plus one hash join back — never a per-cluster pandas
    group, never a driver materialization."""
    from ray.data.aggregate import Max

    clusters = near_dedup_clusters(
        ds,
        id_column=id_column,
        text_column=text_column,
        threshold=threshold,
        num_perm=num_perm,
        bands=bands,
        shingle_n=shingle_n,
        num_partitions=num_partitions,
    ).select_columns([id_column, "cluster_id"])

    def nd_batch(batch: pa.Table) -> pa.Table:
        nd = [
            len(set((t or "").split(" ")))
            for t in batch[text_column].to_pylist()
        ]
        return pa.table(
            {
                id_column: batch[id_column],
                "n_distinct": pa.array(nd, pa.int64()),
            }
        )

    qual = ds.map_batches(nd_batch, batch_format="pyarrow")
    joined = hash_join_safe(
        clusters,
        qual,
        on=(id_column,),
        num_partitions=_join_partitions(num_partitions),
    )

    def pack(batch: pa.Table) -> pa.Table:
        qkey = pc.add(
            pc.multiply(batch["n_distinct"], _QKEY_BASE),
            pc.subtract(_QKEY_BASE - 1, batch[id_column]),
        )
        return batch.append_column("qkey", qkey)

    packed = joined.map_batches(pack, batch_format="pyarrow").materialize()

    best = packed.select_columns(["cluster_id", "qkey"]).groupby(
        "cluster_id"
    ).aggregate(Max("qkey", alias_name="best_key"))
    best, _ = _coalesce_for_join(best)

    final = hash_join_safe(
        packed,
        best,
        on=("cluster_id",),
        num_partitions=_join_partitions(num_partitions),
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_column: batch[id_column],
                "cluster_id": batch["cluster_id"],
                "n_distinct": batch["n_distinct"],
                "keep_best": pc.equal(batch["qkey"], batch["best_key"]),
            }
        )

    return final.map_batches(finish, batch_format="pyarrow")


def recrawl_schedule(
    ds,
    *,
    key_column: str = "url",
    ts_column: str = "warc_ts",
    payload_column: str = "text",
    changed_interval_s: int = 43_200,
    unchanged_interval_s: int = 172_800,
):
    """Adaptive revisit scheduling over a multi-capture table (Cho &
    Garcia-Molina 2003, "Effective Page Refresh Policies"): per URL,
    count captures and DISTINCT content versions; URLs whose payload
    changed between captures get the short next-fetch interval,
    stable URLs the long one.  Output one row per URL:
    ``(url, n_captures, n_versions, changed, next_fetch_us)`` with
    ``next_fetch_us = last_capture_us + interval``.

    Scale shape: a per-batch Counter pre-aggregates to one row per
    (url, payload-md5) per block, then ONE groupby chain —
    ``groupby(url, h)`` sum/max, ``groupby(url)`` count/sum/max — all
    fixed-width rows, no payload in any shuffle, no join, no driver
    state."""
    from collections import defaultdict

    from ray.data.aggregate import Count, Max, Sum

    def explode(batch: pa.Table) -> pa.Table:
        acc: dict = defaultdict(lambda: [0, -(1 << 62)])
        ts = pc.cast(batch[ts_column], pa.int64()).to_pylist()
        for u, t, p in zip(
            batch[key_column].to_pylist(),
            ts,
            batch[payload_column].to_pylist(),
        ):
            h = hashlib.md5((p or "").encode("utf-8")).hexdigest()
            slot = acc[(u, h)]
            slot[0] += 1
            if t > slot[1]:
                slot[1] = t
        us, hs, cs, tm = [], [], [], []
        for (u, h), (c, t) in acc.items():
            us.append(u)
            hs.append(h)
            cs.append(c)
            tm.append(t)
        return pa.table(
            {
                key_column: pa.array(us, pa.string()),
                "h": pa.array(hs, pa.string()),
                "cnt": pa.array(cs, pa.int64()),
                "ts_us": pa.array(tm, pa.int64()),
            }
        )

    versions = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby([key_column, "h"])
        .aggregate(Sum("cnt", alias_name="cnt"), Max("ts_us", alias_name="ts_us"))
    )
    per_url = versions.groupby(key_column).aggregate(
        Count(alias_name="n_versions"),
        Sum("cnt", alias_name="n_captures"),
        Max("ts_us", alias_name="last_ts_us"),
    )

    ci = changed_interval_s * 1_000_000
    ui = unchanged_interval_s * 1_000_000

    def finish(batch: pa.Table) -> pa.Table:
        changed = pc.greater(batch["n_versions"], 1)
        nxt = pc.add(
            batch["last_ts_us"],
            pc.if_else(changed, pa.scalar(ci, pa.int64()), pa.scalar(ui, pa.int64())),
        )
        return pa.table(
            {
                key_column: batch[key_column],
                "n_captures": batch["n_captures"],
                "n_versions": batch["n_versions"],
                "changed": changed,
                "next_fetch_us": nxt,
            }
        )

    return per_url.map_batches(finish, batch_format="pyarrow")


# --------------------------------------------------- prefix filtering


def jaccard_prefix_pairs(
    ds,
    *,
    threshold_num: int,
    threshold_den: int,
    id_column: str = "doc_id",
    text_column: str = "text",
    shingle_n: int = 1,
    num_partitions: int = 16,
    max_bucket: int | None = None,
    broadcast_vocab_max: int = 1_000_000,
    broadcast_docs_max: int = 100_000,
    verify_attach_bytes_max: int = 4_000_000_000,
):
    """EXACT all pairs (a < b) with token/shingle-set Jaccard ≥
    ``threshold_num/threshold_den`` via prefix filtering — the
    AllPairs/PPJoin candidate generation (Chaudhuri et al. ICDE'06
    prefix-filtering principle; Bayardo et al. WWW'07).

    Tokens get a global rarity total order ``(df asc, token asc)``; a
    document's PREFIX is its first ``n - ceil(t·n) + 1`` tokens in
    that order.  Any two sets with J ≥ t share a prefix token (if
    A∩B avoided A's prefix it would fit in A's last ``ceil(t·n)-1``
    tokens, contradicting ``|A∩B| ≥ t·n``), so only prefix tokens are
    indexed: the quadratic bucket fan-out runs over each document's
    RAREST tokens instead of all of them, while the result stays
    exactly equal to the all-pairs join — unlike ``max_df``, this
    prunes without changing the answer.

    The threshold is a rational so prefix lengths use exact integer
    ceil; the emitted ``jaccard`` column is the same float division
    the exact path (and the oracle) computes.

    Scale shape — size-adaptive at every exchange, both routes
    value-identical (the packing goes through one shared helper and a
    forced-route regression test pins equality):

    * df pass: per-block combiner over the documents; partials merge
      on the driver under ``_DF_PARTIAL_DRIVER_MAX`` rows, else via a
      vocabulary groupby.
    * candidate prep, route A (vocabulary ≤ ``broadcast_vocab_max``):
      the df map broadcasts via ``ray.put`` and per-doc prefix packing
      is ONE stateless ``map_batches`` over documents — no token
      explosion, no join, no stateful groupby.  Route B (web-scale
      vocabulary): token rows ⋈ df hash join, then per-doc packing in
      ONE ``groupby(id)`` aggregate whose state is that doc's tokens.
    * prefix pruning is exact and df-aware: df-1 tokens are dropped
      from the indexed prefix (their buckets are singletons), which
      removes the dominant unique-shingle fraction from the bucket
      shuffle at web scale.
    * verification is size-adaptive — the corpus-bounded per-doc table
    broadcasts once (``ray.put``) under ``broadcast_docs_max`` rows and
    pairs verify in a single stateless pass, while larger corpora
    attach each candidate's packed token list by hash join on a then b
    (never a corpus broadcast); both routes are value-identical and
    regression-tested against each other.  ``max_bucket`` optionally
    caps pathological prefix buckets (identical-corpus skew) at the
    cost of recall — leave ``None`` for the exact guarantee.  Note the
    canonical-bucket rule is applied CONSISTENTLY under a cap: the
    broadcast and in-bucket routes score a pair only in its canonical
    bucket (a capped canonical bucket drops its pairs even when a
    rarer shared token's bucket survived), and the attach route
    replays the same rule by broadcasting the capped-token set and
    dropping canonical-capped pairs at scoring time (gated by
    ``_CAPPED_TOKENS_MAX``; beyond it the attach route keeps its
    any-surviving-bucket recall — the one documented divergence).
    With the cap unset (the exact configuration, and the default) all
    three routes are identical unconditionally.
    """
    from collections import Counter

    t_num, t_den = threshold_num, threshold_den
    threshold = t_num / t_den

    def _shingle_set(t: str) -> set:
        return set(tokenize_words(t)) if shingle_n == 1 else word_shingles(t, shingle_n)

    def _sanitize(tok: str) -> str:
        # delimiter guard: a token carrying \x1e/\x1f (str.split()
        # does not split on control chars) would corrupt the packing;
        # map them to U+FFFD — deterministic corpus-wide, so set
        # semantics stay consistent (tokens differing only in these
        # two control chars coalesce, an accepted edge case)
        return tok.replace("\x1e", "�").replace("\x1f", "�")

    def _pack(entries) -> str:
        """(df, sanitized_token) entries → one packed cell.  Order is
        global rarity (df asc, token asc).  The indexed prefix keeps
        only its df ≥ 2 members: a df-1 token occurs in exactly one
        document, so its bucket is a singleton and can never emit a
        pair — dropping it changes nothing in the result but removes
        the (at web scale, dominant) unique-shingle fraction from the
        bucket shuffle.  Layout: "kept\\x1e" + kept-prefix tokens
        first, then the rest — so a [:kept] slice is the index prefix
        while the full body remains the doc's token set for
        verification.  Both candidate routes pack through this one
        helper, so their cells are bit-identical by construction."""
        ent = sorted(entries)
        n = len(ent)
        plen = n - (-(-(t_num * n) // t_den)) + 1  # n - ceil(t·n) + 1
        kept = [tok for d, tok in ent[:plen] if d >= 2]
        rest = [tok for d, tok in ent[:plen] if d < 2]
        rest += [tok for _, tok in ent[plen:]]
        return str(len(kept)) + "\x1e" + "\x1f".join(kept + rest)

    # Pass 1 — document frequency, combiner-first straight over the
    # documents (each block contributes one vocabulary-bounded partial
    # table).  Merge is size-adaptive: under _DF_PARTIAL_DRIVER_MAX
    # total partial rows they collapse on the driver (the same bounded
    # pull as a df-table to_pandas); above it a vocabulary groupby
    # merges, and the result is broadcast only when the vocabulary
    # itself fits under ``broadcast_vocab_max`` — web-scale shingle
    # vocabularies take the fully distributed route B below.
    def df_partial_docs(batch: pa.Table) -> pa.Table:
        c = Counter()
        for t in batch[text_column].to_pylist():
            c.update(_shingle_set(t))
        toks = sorted(c)
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "df_part": pa.array([c[t] for t in toks], pa.int64()),
            }
        )

    import ray as _ray

    partials = ds.map_batches(df_partial_docs, batch_format="pyarrow").materialize()
    df_map = None
    df = None
    if partials.count() <= _DF_PARTIAL_DRIVER_MAX:
        agg = Counter()
        for blk in _ray.get(partials.to_arrow_refs()):
            if blk.num_rows:
                for tok_, n_ in zip(
                    blk["token"].to_pylist(), blk["df_part"].to_pylist()
                ):
                    agg[tok_] += n_
        if len(agg) <= broadcast_vocab_max:
            df_map = dict(agg)
    if df_map is None:
        # vocabulary-count tiny groups: merge the per-block partials
        # through the key-hash grouping primitive, not Ray's per-group
        # aggregate machinery (see _hash_group_blocks)
        df = _sum_by_keys(partials, ["token"], "df_part", "df")
        df, n_vocab = _coalesce_for_join(df)
        if n_vocab <= broadcast_vocab_max:
            dfp = df.to_pandas()
            df_map = dict(zip(dfp["token"], dfp["df"]))
    # the partial table is corpus-scale on route B — drop the
    # materialized copy so its object-store blocks free before the
    # token explosion lands
    partials = None

    if df_map is not None:
        # Route A — broadcast df map (ray.put once): per-doc prefix
        # packing is ONE stateless pass over the documents; no token
        # explosion ever hits the object store and no groupby carries
        # Python aggregate state.
        dref = _ray.put(df_map)

        def pack_docs(batch: pa.Table) -> pa.Table:
            dmap = _ray.get(dref)
            ids_out, packs = [], []
            for i, t in zip(
                batch[id_column].to_pylist(), batch[text_column].to_pylist()
            ):
                toks = _shingle_set(t)
                if not toks:
                    continue  # token-less docs never enter route B's groupby either
                ids_out.append(i)
                packs.append(
                    _pack((dmap[tok], _sanitize(tok)) for tok in toks)
                )
            return pa.table(
                {
                    "id": pa.array(ids_out, pa.int64()),
                    "packed": pa.array(packs, pa.string()),
                }
            )

        per_doc = ds.map_batches(pack_docs, batch_format="pyarrow").materialize()
    else:
        # Route B — fully distributed: token explosion ⋈ df hash join,
        # then per-doc packing through the key-hash grouping primitive
        # — doc groups are tiny (a doc's shingles) and corpus-count
        # NUMEROUS, the regime where a Python AggregateFn pays
        # per-group machinery cost AND pickles list-of-strings state
        # through every merge (measured at 1M docs: the aggregate
        # route spilled the object store to disk-full; the hash
        # exchange is one arrow-native shuffle and per-block packing
        # holds one block's strings at a time).
        tok = ds.map_batches(
            _token_rows_fn(id_column, text_column, shingle_n),
            batch_format="pyarrow",
        ).materialize()
        joined = hash_join_safe(
            tok, df, on=("token",), num_partitions=num_partitions
        )
        cpus = _default_cpus()
        parts = _hash_group_blocks(
            joined.select_columns(["id", "token", "df"]), ["id"], max(16, cpus)
        )
        # token rows and the join are corpus × shingles — release the
        # materialized copies before the packed table lands
        tok = None
        joined = None

        def block_pack(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table(
                    {
                        "id": pa.array([], pa.int64()),
                        "packed": pa.array([], pa.string()),
                    }
                )
            starts, ends, order = _group_runs(batch, ["id"])
            take = pa.array(order)
            ids_sorted = batch["id"].take(take).to_pylist()
            toks_sorted = batch["token"].take(take).to_pylist()
            dfs_sorted = batch["df"].take(take).to_pylist()
            out_ids, out_packed = [], []
            for s, e in zip(starts, ends):
                out_ids.append(ids_sorted[s])
                out_packed.append(
                    _pack(
                        (dfs_sorted[k], _sanitize(toks_sorted[k]))
                        for k in range(s, e)
                    )
                )
            return pa.table(
                {
                    "id": pa.array(out_ids, pa.int64()),
                    "packed": pa.array(out_packed, pa.string()),
                }
            )

        per_doc = parts.map_batches(
            block_pack, batch_format="pyarrow", batch_size=None
        ).materialize()
        parts = None
        df = None  # vocabulary table folded into the packed cells

    def prefix_rows(batch: pa.Table) -> pa.Table:
        ids_out, toks = [], []
        for i, packed in zip(batch["id"].to_pylist(), batch["packed"].to_pylist()):
            plen_s, _, body = packed.partition("\x1e")
            for tok in body.split("\x1f")[: int(plen_s)]:
                ids_out.append(i)
                toks.append(tok)
        return pa.table(
            {"id": pa.array(ids_out, pa.int64()), "token": pa.array(toks, pa.string())}
        )

    prefix_ds = per_doc.map_batches(prefix_rows, batch_format="pyarrow")

    def collect_buckets():
        """Prefix-token buckets (token, [ids]) — vocabulary-count tiny
        groups collected through the key-hash primitive (one
        arrow-native exchange), not a Python AggregateFn.  The
        hot-bucket cap applies post-collect (same finalize semantics:
        over-cap ⇒ empty list).  Deferred behind a helper because the
        in-bucket verify route below never needs the id lists — it
        exchanges payload rows instead."""
        b = _collect_lists_by_key(prefix_ds, "token", "id", "ids")
        if max_bucket is None:
            return b

        def cap_buckets(batch: pa.Table) -> pa.Table:
            lens = pc.list_value_length(batch["ids"])
            over = pc.greater(lens, max_bucket)
            if not pc.any(over).as_py():
                return batch
            ids_out = [
                [] if o else v
                for o, v in zip(over.to_pylist(), batch["ids"].to_pylist())
            ]
            return batch.set_column(
                batch.schema.get_field_index("ids"),
                "ids",
                pa.array(ids_out, batch.schema.field("ids").type),
            )

        return b.map_batches(cap_buckets, batch_format="pyarrow")

    # Size-adaptive verification, mirroring minhash_lsh_pairs: the
    # per-doc packed table is corpus-bounded (one row per doc), so
    # under ``broadcast_docs_max`` rows it broadcasts once via ray.put
    # and the bucket explosion FUSES candidate dedup + verification
    # into one stateless pass — no (a, b) groupby shuffle and no
    # attach joins.  Duplicate emissions (a pair sharing several
    # prefix tokens appears in several buckets) are collapsed exactly
    # by the CANONICAL-BUCKET rule: the pair is scored only in the
    # bucket of its globally rarest shared prefix token (both kept
    # lists are stored in global rarity order, so the canonical token
    # is the first of either list found in the other's kept set —
    # symmetric and unique; the current bucket's token is always in
    # the intersection, so the scan cannot miss).  Web-scale corpora
    # exceed the cap and take the explicit pair-dedup groupby + hash
    # joins below, which never hold anything corpus-sized in one
    # place.
    if per_doc.count() <= broadcast_docs_max:
        buckets = collect_buckets()
        pdp = per_doc.to_pandas()
        full_sets, kept_lists, kept_sets = {}, {}, {}
        for i, p in zip(pdp["id"], pdp["packed"]):
            plen_s, _, body = p.partition("\x1e")
            toks = body.split("\x1f")
            k = int(plen_s)
            full_sets[i] = frozenset(toks)
            kept_lists[i] = toks[:k]
            kept_sets[i] = frozenset(toks[:k])
        sref = _ray.put((full_sets, kept_lists, kept_sets))

        def explode_verify(batch: pa.Table) -> pa.Table:
            full, kept_l, kept_s = _ray.get(sref)
            a_out, b_out, j_out = [], [], []
            for token, ids in zip(
                batch["token"].to_pylist(), batch["ids"].to_pylist()
            ):
                if ids is None or len(ids) < 2:
                    continue
                ids = sorted(set(ids))
                for x in range(len(ids)):
                    a = ids[x]
                    la = kept_l[a]
                    sa = full[a]
                    for y in range(x + 1, len(ids)):
                        b = ids[y]
                        lb = kept_l[b]
                        it, other = (
                            (la, kept_s[b]) if len(la) <= len(lb) else (lb, kept_s[a])
                        )
                        canon = next(tk for tk in it if tk in other)
                        if canon != token:
                            continue
                        sb = full[b]
                        c = len(sa & sb)
                        j = c / (len(sa) + len(sb) - c)
                        if j >= threshold:
                            a_out.append(a)
                            b_out.append(b)
                            j_out.append(j)
            return pa.table(
                {
                    "a": pa.array(a_out, pa.int64()),
                    "b": pa.array(b_out, pa.int64()),
                    "jaccard": pa.array(j_out, pa.float64()),
                }
            )

        out = buckets.map_batches(
            explode_verify, batch_format="pyarrow"
        ).materialize()
        if out.count() == 0:
            return _empty_dataset(
                {"a": pa.int64(), "b": pa.int64(), "jaccard": pa.float64()}
            )
        return out

    # Verify-route choice by ESTIMATED shuffle bytes, decided BEFORE
    # any pair explosion.  The attach route ships every candidate pair
    # through TWO hash joins carrying a full packed token cell each
    # way — ~2 × pairs × cell bytes of shuffle+spill (measured at 1M
    # adversarial docs: 23.8M pairs × 1.2 KB cells ≈ 56 GB, an
    # object-store spill blow-up).  Raw candidate volume Σ d·(d−1)/2
    # comes from per-token PREFIX COUNTS — a skinny one-column
    # exchange — so the in-bucket route never pays the bucket-list
    # collect or the pair-dedup exchange it would not use.  The raw
    # count over-counts multi-bucket pairs, so the switch fires a
    # little earlier than a distinct-pair criterion would —
    # conservative in the safe direction.
    sizes = _count_by_keys(prefix_ds.select_columns(["token"]), ["token"], "d")

    def pair_partials(batch: pa.Table) -> pa.Table:
        d = batch["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        if max_bucket is not None:
            d = d[d <= max_bucket]  # capped buckets emit no pairs
        return pa.table(
            {"n": pa.array([int((d * (d - 1) // 2).sum())], pa.int64())}
        )

    raw_pairs = sum(
        b["n"]
        for b in sizes.map_batches(
            pair_partials, batch_format="pyarrow"
        ).take_all()
    )
    if raw_pairs == 0:
        # no bucket holds two members ⇒ no candidate ⇒ (prefix
        # principle) no pair can reach the threshold
        return _empty_dataset(
            {"a": pa.int64(), "b": pa.int64(), "jaccard": pa.float64()}
        )
    samp = per_doc.limit(1024).to_pandas()
    avg_packed = max(1.0, float(samp["packed"].str.len().mean()))
    if raw_pairs * 2 * avg_packed > verify_attach_bytes_max:

        def payload_rows(batch: pa.Table) -> pa.Table:
            toks_out, ids_out, packs_out = [], [], []
            for i, packed in zip(
                batch["id"].to_pylist(), batch["packed"].to_pylist()
            ):
                plen_s, _, body = packed.partition("\x1e")
                for tokn in body.split("\x1f")[: int(plen_s)]:
                    toks_out.append(tokn)
                    ids_out.append(i)
                    packs_out.append(packed)
            return pa.table(
                {
                    "token": pa.array(toks_out, pa.string()),
                    "id": pa.array(ids_out, pa.int64()),
                    "packed": pa.array(packs_out, pa.string()),
                }
            )

        cpus_v = _default_cpus()
        # many small partitions: bucket_verify inflates its block into
        # Python lists + a parsed-cell cache (~10× the arrow bytes), so
        # per-block payload must stay tens-of-MB or concurrent tasks
        # OOM the host (measured: 32 × ~300 MB blocks killed workers)
        payload_parts = _hash_group_blocks(
            per_doc.map_batches(payload_rows, batch_format="pyarrow"),
            ["token"],
            max(64, cpus_v * 8),
        )

        def bucket_verify(batch: pa.Table) -> pa.Table:
            a_out, b_out, j_out = [], [], []
            if batch.num_rows:
                starts, ends, order = _group_runs(batch, ["token"])
                take = pa.array(order)
                toks_s = batch["token"].take(take).to_pylist()
                ids_s = batch["id"].take(take).to_pylist()
                packs_s = batch["packed"].take(take).to_pylist()
                info: dict = {}  # id → (kept_list, kept_set, full_set)

                def _info(i, packed):
                    got = info.get(i)
                    if got is None:
                        plen_s, _, body = packed.partition("\x1e")
                        toks = body.split("\x1f")
                        k = int(plen_s)
                        got = (toks[:k], frozenset(toks[:k]), frozenset(toks))
                        info[i] = got
                    return got

                for s, e in zip(starts, ends):
                    if max_bucket is not None and e - s > max_bucket:
                        continue  # hot-bucket cap: raw row count, the
                        # same basis the collect routes cap on
                    if e - s < 2:
                        continue
                    token = toks_s[s]
                    # dedup members by id (dict, then sort) — a doc
                    # whose kept prefix repeats a token after \x1e/\x1f
                    # sanitization lands twice in this bucket; the
                    # other routes dedup via set(ids)/group-by, and
                    # without this a (a, a) self-pair would leak
                    members = sorted(
                        dict(
                            (ids_s[k], packs_s[k]) for k in range(s, e)
                        ).items()
                    )
                    if len(members) < 2:
                        continue
                    for x in range(len(members)):
                        a, pk_a = members[x]
                        la, ka, fa = _info(a, pk_a)
                        for y in range(x + 1, len(members)):
                            b, pk_b = members[y]
                            lb, kb, fb = _info(b, pk_b)
                            it, other = (
                                (la, kb) if len(la) <= len(lb) else (lb, ka)
                            )
                            canon = next(tk for tk in it if tk in other)
                            if canon != token:
                                continue
                            c = len(fa & fb)
                            j = c / (len(fa) + len(fb) - c)
                            if j >= threshold:
                                a_out.append(a)
                                b_out.append(b)
                                j_out.append(j)
            return pa.table(
                {
                    "a": pa.array(a_out, pa.int64()),
                    "b": pa.array(b_out, pa.int64()),
                    "jaccard": pa.array(j_out, pa.float64()),
                }
            )

        out = payload_parts.map_batches(
            bucket_verify, batch_format="pyarrow", batch_size=None
        ).materialize()
        if out.count() == 0:
            return _empty_dataset(
                {"a": pa.int64(), "b": pa.int64(), "jaccard": pa.float64()}
            )
        return out

    # attach route: bucket-list collect → pair explosion → pair dedup
    # (candidate-count tiny groups through the key-hash primitive)
    buckets = collect_buckets()
    pairs = _count_by_keys(
        buckets.map_batches(_explode_pairs_batch, batch_format="pyarrow"),
        ["a", "b"],
        "n_buckets",
    ).materialize()
    if pairs.count() == 0:
        # possible under the raw estimate: every candidate bucket
        # collapsed to duplicates of nothing (e.g. all members equal)
        return _empty_dataset(
            {"a": pa.int64(), "b": pa.int64(), "jaccard": pa.float64()}
        )
    pairs, _ = _coalesce_for_join(pairs)
    with_a = _attach_by_id(
        pairs.select_columns(["a", "b"]),
        per_doc,
        "a",
        {"packed": "packed_a"},
        num_partitions=num_partitions,
    )
    with_ab = _attach_by_id(
        with_a, per_doc, "b", {"packed": "packed_b"}, num_partitions=num_partitions
    )

    # With max_bucket set, the canonical routes drop any pair whose
    # CANONICAL bucket was capped, even when a rarer shared token's
    # bucket survived.  The attach route would otherwise keep such a
    # pair (it was discovered in the surviving bucket) — so broadcast
    # the capped-token set (hot tokens only, tiny by construction) and
    # apply the same canonical-cap rule at scoring time, keeping all
    # three verify routes value-identical under a cap.
    capped_ref = None
    if max_bucket is not None:
        hot = (
            sizes.map_batches(
                lambda b: b.filter(pc.greater(b["d"], max_bucket)).select(
                    ["token"]
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        if hot.count() <= _CAPPED_TOKENS_MAX:
            capped_ref = _ray.put(
                frozenset(r["token"] for r in hot.take_all())
            )
        # else: astronomically many capped tokens — keep the attach
        # route's any-surviving-bucket recall (documented divergence)

    def score(batch: pa.Table) -> pa.Table:
        capped = None
        if capped_ref is not None:
            import ray as _ray_w

            capped = _ray_w.get(capped_ref)
        a_out, b_out, j_out = [], [], []
        for a, b, pa_, pb_ in zip(
            batch["a"].to_pylist(),
            batch["b"].to_pylist(),
            batch["packed_a"].to_pylist(),
            batch["packed_b"].to_pylist(),
        ):
            ka_s, _, body_a = pa_.partition("\x1e")
            kb_s, _, body_b = pb_.partition("\x1e")
            toks_a = body_a.split("\x1f")
            toks_b = body_b.split("\x1f")
            if capped is not None:
                la = toks_a[: int(ka_s)]
                lb = toks_b[: int(kb_s)]
                it, other = (
                    (la, frozenset(lb)) if len(la) <= len(lb) else (lb, frozenset(la))
                )
                canon = next(tk for tk in it if tk in other)
                if canon in capped:
                    continue
            sa = set(toks_a)
            sb = set(toks_b)
            c = len(sa & sb)
            j = c / (len(sa) + len(sb) - c)
            if j >= threshold:
                a_out.append(a)
                b_out.append(b)
                j_out.append(j)
        return pa.table(
            {
                "a": pa.array(a_out, pa.int64()),
                "b": pa.array(b_out, pa.int64()),
                "jaccard": pa.array(j_out, pa.float64()),
            }
        )

    return with_ab.map_batches(score, batch_format="pyarrow")
