"""The URL-seen set: sharded membership state behind a Ray actor pool.

The reference holds ``visited`` as a driver-local Python set
(``deep_crawling/bfs_strategy.py:127,158``) and ships an experimental
mmh3 bloom filter (``deep_crawling/crazy.py:102-165``).  At the
10^10-URL design point neither fits one process, so membership is
sharded: ``shard = digest >> (64 - shard_bits)`` → one actor per
shard, each holding an exact set, a bloom filter, or a cuckoo filter
behind the same ``check_and_add`` API (north rule: "sharded
cuckoo-filter URL-seen set behind an actor pool").

- exact mode   — parity/testing; memory ~ O(n · 8B).
- bloom mode   — classic optimal-m/k bloom (as crazy.py), no deletes,
  FP-rate accounted; ~1.2 GB per 10^9 urls at 1% FP.
- cuckoo mode  — 4-way buckets, 16-bit fingerprints, supports delete,
  ~2 bytes/url at high load factor.

Map tasks call ``check_and_add_batch`` with the digests of one batch,
already grouped per shard (one RPC per shard per batch — batched,
never per-url).  Shards serialize their state to bytes for
checkpointing (``dump``/``load``).
"""

from __future__ import annotations

import hashlib
import pickle

import ray


# ----------------------------------------------------------------- filters


class BloomFilter:
    """Optimal-size bloom filter over 64-bit digests (semantics of the
    reference ``crazy.py:102-165``; hashes derived from the digest by
    splitting + affine recombination instead of mmh3)."""

    def __init__(self, expected_items: int, fp_rate: float = 0.01):
        import math

        self.expected_items = expected_items
        self.fp_rate = fp_rate
        m = int(-expected_items * math.log(fp_rate) / (math.log(2) ** 2))
        self.size = max(64, m)
        self.num_hashes = max(1, int(self.size / expected_items * math.log(2)))
        self.bits = bytearray((self.size + 7) // 8)
        self.approx_count = 0

    def _positions(self, digest: int):
        h1 = digest & 0xFFFFFFFF
        h2 = (digest >> 32) | 1
        for i in range(self.num_hashes):
            yield (h1 + i * h2) % self.size

    def add(self, digest: int) -> bool:
        """Returns True if the digest was (probably) new."""
        new = False
        for pos in self._positions(digest):
            byte, bit = divmod(pos, 8)
            if not (self.bits[byte] >> bit) & 1:
                new = True
                self.bits[byte] |= 1 << bit
        if new:
            self.approx_count += 1
        return new

    def __contains__(self, digest: int) -> bool:
        return all((self.bits[pos // 8] >> (pos % 8)) & 1 for pos in self._positions(digest))


class CuckooFilter:
    """Cuckoo filter: 4-slot buckets, 16-bit fingerprints, bounded
    kicks.  Deterministic eviction (rotates slots by kick count) so
    runs are reproducible.  Published design: Fan et al., "Cuckoo
    Filter: Practically Better Than Bloom" (CoNEXT'14)."""

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int):
        # ~95% load factor headroom, power-of-two buckets
        n_buckets = 1
        while n_buckets * self.SLOTS < capacity * 1.05:
            n_buckets *= 2
        self.n_buckets = n_buckets
        self.buckets: list[list[int]] = [[] for _ in range(n_buckets)]
        self.count = 0
        self.overflow_count = 0  # dropped inserts (reported as seen)

    def _fingerprint(self, digest: int) -> int:
        fp = (digest >> 48) & 0xFFFF
        return fp or 1  # 0 is reserved

    def _index1(self, digest: int) -> int:
        return digest & (self.n_buckets - 1)

    def _index2(self, i1: int, fp: int) -> int:
        # standard partial-key cuckoo: i2 = i1 xor hash(fp)
        h = int.from_bytes(
            hashlib.blake2b(fp.to_bytes(2, "big"), digest_size=8).digest(), "big"
        )
        return (i1 ^ h) & (self.n_buckets - 1)

    def __contains__(self, digest: int) -> bool:
        fp = self._fingerprint(digest)
        i1 = self._index1(digest)
        if fp in self.buckets[i1]:
            return True
        return fp in self.buckets[self._index2(i1, fp)]

    def add(self, digest: int) -> bool:
        """Insert unless present; True if it was new.  On kick
        exhaustion the insert is DROPPED and reported as already-seen
        (False) with ``overflow_count`` incremented — a long crawl must
        never crash mid-round on a full filter, and "treat as seen" is
        the conservative failure (the url is skipped, like a bloom
        false positive; the error budget is visible in round metrics).
        Lossless growth is not possible for a cuckoo filter without
        the original keys: the i1/i2 pairing changes with table size.
        Size capacity generously; the counter tells you when you
        didn't."""
        fp = self._fingerprint(digest)
        i1 = self._index1(digest)
        i2 = self._index2(i1, fp)
        if fp in self.buckets[i1] or fp in self.buckets[i2]:
            return False
        for idx in (i1, i2):
            if len(self.buckets[idx]) < self.SLOTS:
                self.buckets[idx].append(fp)
                self.count += 1
                return True
        # evict: deterministic slot rotation
        idx = i1
        for kick in range(self.MAX_KICKS):
            slot = kick % self.SLOTS
            evicted = self.buckets[idx][slot]
            self.buckets[idx][slot] = fp
            fp = evicted
            idx = self._index2(idx, fp)
            if len(self.buckets[idx]) < self.SLOTS:
                self.buckets[idx].append(fp)
                self.count += 1
                return True
        self.overflow_count += 1
        return False


# ----------------------------------------------------------------- shards


@ray.remote(num_cpus=0.25)
class SeenShard:
    """One membership shard. ``mode``: exact | bloom | cuckoo."""

    def __init__(self, mode: str = "exact", capacity: int = 1_000_000, fp_rate: float = 0.01):
        self.mode = mode
        if mode == "exact":
            self._set: set[int] = set()
        elif mode == "bloom":
            self._bloom = BloomFilter(capacity, fp_rate)
        elif mode == "cuckoo":
            self._cuckoo = CuckooFilter(capacity)
        else:
            raise ValueError(f"unknown seen mode {mode}")

    def check_and_add(self, digests: list[int]) -> list[bool]:
        """For each digest: True when NEW (atomically marks seen)."""
        if self.mode == "exact":
            s = self._set
            out = []
            for d in digests:
                if d in s:
                    out.append(False)
                else:
                    s.add(d)
                    out.append(True)
            return out
        if self.mode == "bloom":
            return [self._bloom.add(d) for d in digests]
        return [self._cuckoo.add(d) for d in digests]

    def contains(self, digests: list[int]) -> list[bool]:
        if self.mode == "exact":
            return [d in self._set for d in digests]
        if self.mode == "bloom":
            return [d in self._bloom for d in digests]
        return [d in self._cuckoo for d in digests]

    def size(self) -> int:
        if self.mode == "exact":
            return len(self._set)
        if self.mode == "bloom":
            return self._bloom.approx_count
        return self._cuckoo.count

    def overflow(self) -> int:
        return self._cuckoo.overflow_count if self.mode == "cuckoo" else 0

    def dump(self) -> bytes:
        if self.mode == "exact":
            return pickle.dumps(self._set, protocol=5)
        if self.mode == "bloom":
            return pickle.dumps(self._bloom, protocol=5)
        return pickle.dumps(self._cuckoo, protocol=5)

    def load(self, blob: bytes) -> None:
        obj = pickle.loads(blob)
        if self.mode == "exact":
            self._set = obj
        elif self.mode == "bloom":
            self._bloom = obj
        else:
            self._cuckoo = obj


class UrlSeen:
    """Client facade over the shard pool.  Routing:
    ``shard = digest >> (64 - shard_bits)`` — the top bits of the
    canonical url digest, so shard load mirrors the hash-partitioning
    of the frontier itself (host skew does not map to shard skew)."""

    def __init__(
        self,
        n_shards: int = 8,
        mode: str = "exact",
        capacity_per_shard: int = 1_000_000,
        fp_rate: float = 0.01,
    ):
        assert n_shards & (n_shards - 1) == 0, "n_shards must be a power of two"
        self.n_shards = n_shards
        self.shard_bits = n_shards.bit_length() - 1
        self.mode = mode
        self.capacity_per_shard = capacity_per_shard
        self.fp_rate = fp_rate
        self.shards = [
            SeenShard.remote(mode=mode, capacity=capacity_per_shard, fp_rate=fp_rate)
            for _ in range(n_shards)
        ]

    def _route(self, digests: list[int]) -> list[int]:
        shift = 64 - self.shard_bits if self.shard_bits else 64
        return [d >> shift if self.shard_bits else 0 for d in digests]

    def check_and_add(self, digests: list[int]) -> list[bool]:
        """Batched, one RPC per touched shard; preserves input order."""
        if not digests:
            return []
        routes = self._route(digests)
        by_shard: dict[int, list[int]] = {}
        positions: dict[int, list[int]] = {}
        for pos, (d, s) in enumerate(zip(digests, routes)):
            by_shard.setdefault(s, []).append(d)
            positions.setdefault(s, []).append(pos)
        refs = {s: self.shards[s].check_and_add.remote(ds) for s, ds in by_shard.items()}
        out = [False] * len(digests)
        for s, ref in refs.items():
            for pos, is_new in zip(positions[s], ray.get(ref)):
                out[pos] = is_new
        return out

    def contains(self, digests: list[int]) -> list[bool]:
        if not digests:
            return []
        routes = self._route(digests)
        by_shard: dict[int, list[int]] = {}
        positions: dict[int, list[int]] = {}
        for pos, (d, s) in enumerate(zip(digests, routes)):
            by_shard.setdefault(s, []).append(d)
            positions.setdefault(s, []).append(pos)
        refs = {s: self.shards[s].contains.remote(ds) for s, ds in by_shard.items()}
        out = [False] * len(digests)
        for s, ref in refs.items():
            for pos, seen in zip(positions[s], ray.get(ref)):
                out[pos] = seen
        return out

    def total(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def overflow_total(self) -> int:
        """Dropped (treated-as-seen) inserts across shards — nonzero
        only in cuckoo mode when capacity was undersized."""
        return sum(ray.get([s.overflow.remote() for s in self.shards]))

    def config_manifest(self) -> dict:
        return {
            "n_shards": self.n_shards,
            "mode": self.mode,
            "capacity_per_shard": self.capacity_per_shard,
            "fp_rate": self.fp_rate,
        }

    def dump_all(self) -> list[bytes]:
        return ray.get([s.dump.remote() for s in self.shards])

    def load_all(self, blobs: list[bytes]) -> None:
        assert len(blobs) == self.n_shards
        ray.get([s.load.remote(b) for s, b in zip(self.shards, blobs)])

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
