"""Deduplication operators for training-data pipelines.

Beyond the reference's URL-seen dedup (SURVEY.md §2.9), these are the
document-level dedup family a 100 TB text pipeline needs.  All are
Ray-Data-native:

- :func:`exact_dedup` — content-hash groupby, keep min id.  One
  shuffle on the 16-byte hash (never on the text itself).
- :func:`jaccard_pairs` — exact word-set Jaccard via an inverted-index
  join: explode (id, token) → groupby(token) emits within-token pairs
  → groupby(pair) counts intersections → Jaccard with broadcast set
  sizes.  Exact but O(Σ df²) — the verification baseline for LSH.
  Hot tokens are dropped above ``max_df`` (they cannot change the
  result for thresholds > ~0.5 — a pair sharing only ultra-common
  tokens scores below threshold; documented skew guard).
- :class:`MinHasher` / :func:`minhash_lsh_pairs` — shingle → minhash
  (k permutations via universal hashing) → band buckets → candidate
  pairs → exact-Jaccard verification.  The 100 TB path: cost is
  linear in corpus size + bucket collisions.
- :func:`simhash_pairs` — 64-bit simhash over token features; near-dup
  candidates via 4-segment block partitioning (Hamming ≤ 3 guarantee),
  verified by exact Hamming distance.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ------------------------------------------------------------------ util


def _collect_ids_agg(id_col: str = "id"):
    """AggregateFn collecting the group's ids into a list — the
    vectorized replacement for ``map_groups`` when groups are tiny and
    numerous (per-group pandas overhead dominates otherwise)."""
    from ray.data.aggregate import AggregateFn

    return AggregateFn(
        init=lambda k: [],
        accumulate_block=lambda acc, block: acc
        + (
            block[id_col].to_pylist()
            if hasattr(block, "column_names")
            else list(block[id_col])
        ),
        merge=lambda a, b: a + b,
        name="ids",
    )


def _explode_pairs_batch(batch: pa.Table, extra_cols: dict | None = None) -> pa.Table:
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
    (hash, id) pairs, not the documents."""
    hashed = add_content_hash(
        ds.select_columns([id_column, text_column]), text_column
    ).select_columns([id_column, "content_hash"])
    from ray.data.aggregate import Min

    return hashed.groupby("content_hash").aggregate(Min(id_column, alias_name=id_column))


# ------------------------------------------------------------ jaccard exact


def tokenize_words(text: str) -> list[str]:
    return text.split()


def word_shingles(text: str, n: int = 3) -> set[str]:
    words = text.split()
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def jaccard_pairs(
    ds,
    *,
    threshold: float,
    id_column: str = "doc_id",
    text_column: str = "text",
    shingle_n: int = 1,
    max_df: int | None = None,
):
    """All pairs (a < b) with word-set Jaccard ≥ threshold.  Exact;
    inverted-index join (documented in module docstring)."""
    import ray

    # token explode (distinct per doc)
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

    tokens = ds.map_batches(explode, batch_format="pyarrow").materialize()

    # broadcast per-doc set sizes (small: one int per doc)
    from ray.data.aggregate import Count

    sizes_df = tokens.groupby("id").aggregate(Count(alias_name="n")).to_pandas()
    sizes_ref = ray.put(dict(zip(sizes_df["id"], sizes_df["n"])))

    # groupby token → id-list aggregate → explode within-token pairs
    # (skew guard: drop tokens with df > max_df)
    def explode(batch: pa.Table) -> pa.Table:
        a_out, b_out = [], []
        for ids in batch["ids"].to_pylist():
            if ids is None or len(ids) < 2 or (max_df is not None and len(ids) > max_df):
                continue
            ids = sorted(ids)
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a_out.append(ids[i])
                    b_out.append(ids[j])
        return pa.table(
            {"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64())}
        )

    pair_counts = (
        tokens.groupby("token")
        .aggregate(_collect_ids_agg("id"))
        .map_batches(explode, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="n_common"))
    )

    def score(batch: pa.Table) -> pa.Table:
        sizes = ray.get(sizes_ref)
        a = batch["a"].to_pylist()
        b = batch["b"].to_pylist()
        common = batch["n_common"].to_pylist()
        jac = [c / (sizes[x] + sizes[y] - c) for x, y, c in zip(a, b, common)]
        out = batch.append_column("jaccard", pa.array(jac, pa.float64()))
        return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return pair_counts.map_batches(score, batch_format="pyarrow").select_columns(
        ["a", "b", "jaccard"]
    )


# --------------------------------------------------------------- minhash


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
            (
                struct.unpack(
                    "<Q", hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest()
                )[0]
                for s in shingles
            ),
            dtype=np.uint64,
            count=len(shingles),
        )

    def signature(self, shingles: set[str]) -> np.ndarray:
        if not shingles:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = self._shingle_hashes(shingles)
        # (num_perm, n_shingles) permuted hashes -> row-min, vectorized
        with np.errstate(over="ignore"):
            perms = self.a[:, None] * x[None, :] + self.b[:, None]
        return perms.min(axis=1)


def minhash_signatures(
    ds,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    num_perm: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
):
    """Dataset → (id, sig: list<uint64>).  Hasher built once per actor
    (stateful stage)."""

    class SigFn:
        def __init__(self):
            self.hasher = MinHasher(num_perm=num_perm, seed=seed)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_column].to_pylist()
            sigs = [
                self.hasher.signature(word_shingles(t, shingle_n))
                for t in batch[text_column].to_pylist()
            ]
            return pa.table(
                {
                    "id": pa.array(ids, pa.int64()),
                    "sig": pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
                }
            )

    return ds.map_batches(SigFn, batch_format="pyarrow", concurrency=2, num_cpus=0.5)


def minhash_lsh_pairs(
    ds,
    *,
    threshold: float = 0.5,
    id_column: str = "doc_id",
    text_column: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
):
    """Candidate pairs via LSH banding, verified with exact Jaccard
    over the shingle sets.  Returns (a, b, jaccard ≥ threshold).

    Pipeline: signatures → explode (band_id, band_hash, id) →
    groupby(band) → within-bucket pairs → distinct pairs → verify.
    Verification re-reads only candidate docs' texts via broadcast
    (candidates are rare by construction)."""
    import pandas as pd
    import ray

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

    buckets = sigs.map_batches(explode_bands, batch_format="pyarrow")

    candidates = (
        buckets.groupby(["band", "bucket"])
        .aggregate(_collect_ids_agg("id"))
        .map_batches(_explode_pairs_batch, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
        .select_columns(["a", "b"])
    )

    # exact verification with broadcast shingle sets of candidate docs.
    # (At 100 TB scale this becomes a join of candidates back onto the
    # docs table; broadcast is right while candidates ≪ corpus.)
    texts_df = docs.to_pandas()
    shingle_map = {
        i: word_shingles(t, shingle_n)
        for i, t in zip(texts_df[id_column], texts_df[text_column])
    }
    sh_ref = ray.put(shingle_map)

    def verify(batch: pa.Table) -> pa.Table:
        sh = ray.get(sh_ref)
        a = batch["a"].to_pylist()
        b = batch["b"].to_pylist()
        jac = []
        for x, y in zip(a, b):
            sa, sb = sh.get(x, set()), sh.get(y, set())
            union = len(sa | sb)
            jac.append(len(sa & sb) / union if union else 0.0)
        out = batch.append_column("jaccard", pa.array(jac, pa.float64()))
        return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return candidates.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------- simhash


def simhash64(tokens: list[str]) -> int:
    """Classic 64-bit simhash (Charikar): per-token 64-bit hash,
    bit-vote, sign → fingerprint."""
    if not tokens:
        return 0
    votes = np.zeros(64, dtype=np.int64)
    for tok in tokens:
        h = struct.unpack(
            "<Q", hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest()
        )[0]
        bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        votes += np.where(bits == 1, 1, -1)
    fp = 0
    for i in range(64):
        if votes[i] > 0:
            fp |= 1 << i
    return fp


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_pairs(
    ds,
    *,
    max_hamming: int = 3,
    id_column: str = "doc_id",
    text_column: str = "text",
):
    """Near-dup pairs with simhash Hamming distance ≤ max_hamming.

    Pigeonhole banding: split the 64-bit fingerprint into
    ``max_hamming+1`` segments — any pair within distance ≤ max_hamming
    agrees exactly on ≥1 segment → groupby (segment_id, segment_value)
    yields a candidate superset, verified by exact Hamming distance."""
    import pandas as pd

    n_seg = max_hamming + 1
    seg_bits = 64 // n_seg

    def fingerprints(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].to_pylist()
        fps = [simhash64(t.split()) for t in batch[text_column].to_pylist()]
        return pa.table(
            {"id": pa.array(ids, pa.int64()), "fp": pa.array(fps, pa.uint64())}
        )

    fps = ds.select_columns([id_column, text_column]).map_batches(
        fingerprints, batch_format="pyarrow"
    ).materialize()

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

    # broadcast id→fp (8 bytes per doc; at 100 TB scale this becomes a
    # join of the pair table back onto fps)
    import ray

    fp_df = fps.to_pandas()
    fp_ref = ray.put(dict(zip(fp_df["id"], fp_df["fp"])))

    def explode_and_verify(batch: pa.Table) -> pa.Table:
        fpm = ray.get(fp_ref)
        a_out, b_out, d_out = [], [], []
        for ids in batch["ids"].to_pylist():
            if ids is None or len(ids) < 2:
                continue
            ids = sorted(set(ids))
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    d = hamming64(int(fpm[ids[i]]), int(fpm[ids[j]]))
                    if d <= max_hamming:
                        a_out.append(ids[i])
                        b_out.append(ids[j])
                        d_out.append(d)
        return pa.table(
            {
                "a": pa.array(a_out, pa.int64()),
                "b": pa.array(b_out, pa.int64()),
                "hamming": pa.array(d_out, pa.int64()),
            }
        )

    pairs = (
        fps.map_batches(explode_segments, batch_format="pyarrow")
        .groupby(["seg", "val"])
        .aggregate(_collect_ids_agg("id"))
        .map_batches(explode_and_verify, batch_format="pyarrow")
    )
    # distinct (a pair can collide in several segments)
    from ray.data.aggregate import Min

    return pairs.groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming"))
