"""Per-round crawl checkpoints with lineage + metrics.

The reference's only resumable state is the adaptive crawler's JSON
blob (``adaptive_crawler.py:53-111``); everything else (visited sets,
frontier lists, domain state) dies with the process.  Here every
round barrier persists (north rule: "resumable from per-partition
checkpoints carrying lineage and fetch/extract metrics"):

```
<dir>/round_0000/
    frontier/   *.parquet   # the frontier AFTER this round's selection
    visited/    *.parquet   # urls fetched this round (url, host, depth, parent, score, round)
    seen/       shard_*.bin # serialized URL-seen shards
    metrics.json            # counts + wall_ms + parent-round lineage
    _SUCCESS                # commit marker (atomic: written last)
```

Resume = find the latest round with ``_SUCCESS``, load seen shards,
read its frontier.  Rounds without the marker are ignored (a crashed
round re-runs idempotently — visited/ dirs are rewritten wholesale).
"""

from __future__ import annotations

import json
import os
import shutil
import time


def round_dir(checkpoint_dir: str, round_idx: int) -> str:
    return os.path.join(checkpoint_dir, f"round_{round_idx:04d}")


def is_committed(checkpoint_dir: str, round_idx: int) -> bool:
    return os.path.exists(os.path.join(round_dir(checkpoint_dir, round_idx), "_SUCCESS"))


def latest_committed_round(checkpoint_dir: str) -> int | None:
    if not os.path.isdir(checkpoint_dir):
        return None
    latest = None
    for name in os.listdir(checkpoint_dir):
        if name.startswith("round_"):
            try:
                idx = int(name.split("_")[1])
            except (IndexError, ValueError):
                continue
            if is_committed(checkpoint_dir, idx) and (latest is None or idx > latest):
                latest = idx
    return latest


def begin_round(checkpoint_dir: str, round_idx: int) -> str:
    """Create (or reset) the round directory — idempotent re-run of an
    uncommitted round."""
    rdir = round_dir(checkpoint_dir, round_idx)
    if os.path.isdir(rdir) and not is_committed(checkpoint_dir, round_idx):
        shutil.rmtree(rdir)
    os.makedirs(os.path.join(rdir, "frontier"), exist_ok=True)
    os.makedirs(os.path.join(rdir, "visited"), exist_ok=True)
    os.makedirs(os.path.join(rdir, "seen"), exist_ok=True)
    return rdir


def commit_round(checkpoint_dir: str, round_idx: int, metrics: dict) -> None:
    rdir = round_dir(checkpoint_dir, round_idx)
    metrics = dict(metrics)
    metrics["round"] = round_idx
    metrics["parent_round"] = round_idx - 1 if round_idx > 0 else None
    metrics["committed_at"] = time.time()
    with open(os.path.join(rdir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    # _SUCCESS last: the commit point
    with open(os.path.join(rdir, "_SUCCESS"), "w") as f:
        f.write("")


def save_seen_shards(
    checkpoint_dir: str,
    round_idx: int,
    blobs: list[bytes],
    manifest: dict | None = None,
) -> None:
    seen_dir = os.path.join(round_dir(checkpoint_dir, round_idx), "seen")
    for i, blob in enumerate(blobs):
        with open(os.path.join(seen_dir, f"shard_{i:04d}.bin"), "wb") as f:
            f.write(blob)
    if manifest is not None:
        with open(os.path.join(seen_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f)


def load_seen_shards(
    checkpoint_dir: str, round_idx: int, expect_manifest: dict | None = None
) -> list[bytes]:
    """Read shard blobs; when ``expect_manifest`` is given, validate the
    stored seen-set configuration against it so a resume with a
    different shard count / mode fails with a descriptive error instead
    of an opaque assertion (or silent misrouting)."""
    seen_dir = os.path.join(round_dir(checkpoint_dir, round_idx), "seen")
    mpath = os.path.join(seen_dir, "manifest.json")
    if expect_manifest is not None and os.path.exists(mpath):
        with open(mpath) as f:
            stored = json.load(f)
        mismatches = {
            k: (stored.get(k), expect_manifest[k])
            for k in expect_manifest
            if stored.get(k) != expect_manifest[k]
        }
        if mismatches:
            raise ValueError(
                "seen-set checkpoint was written with a different "
                f"configuration: {mismatches} (stored vs current). "
                "Resume with the original n_seen_shards/seen_mode/"
                "capacity, or start a fresh checkpoint dir."
            )
    blobs = []
    for name in sorted(os.listdir(seen_dir)):
        if name.startswith("shard_") :
            with open(os.path.join(seen_dir, name), "rb") as f:
                blobs.append(f.read())
    return blobs


def read_metrics(checkpoint_dir: str, round_idx: int) -> dict:
    with open(os.path.join(round_dir(checkpoint_dir, round_idx), "metrics.json")) as f:
        return json.load(f)


def all_metrics(checkpoint_dir: str) -> list[dict]:
    latest = latest_committed_round(checkpoint_dir)
    if latest is None:
        return []
    return [read_metrics(checkpoint_dir, i) for i in range(latest + 1)]


def render_monitor(checkpoint_dir: str, max_width: int = 120) -> str:
    """Terminal dashboard over the committed rounds — the BSP
    equivalent of the reference ``CrawlerMonitor``'s live task table
    (``components/crawler_monitor.py:350``): in a batch engine the
    unit of progress is the round, so the dashboard renders the
    per-round checkpoint metrics plus run totals.  Pure string; call
    it between rounds (or from another process — checkpoints are the
    shared state) and print."""
    metrics = all_metrics(checkpoint_dir)
    if not metrics:
        return f"(no committed rounds under {checkpoint_dir})"
    cols = [
        ("round", "round"),
        ("in", "n_frontier_in"),
        ("visited", "n_visited"),
        ("links", "n_links"),
        ("deferred", "n_deferred"),
        ("out", "n_frontier_out"),
        ("seen", "seen_total"),
        ("ovfl", "seen_overflow"),
        ("ms", "wall_ms"),
    ]
    header = " ".join(f"{h:>8}" for h, _ in cols)
    lines = [header, "-" * min(len(header), max_width)]
    for m in metrics:
        lines.append(" ".join(f"{m.get(k, ''):>8}" for _, k in cols))
    total_visited = sum(m.get("n_visited", 0) for m in metrics)
    total_ms = sum(m.get("wall_ms", 0) for m in metrics)
    rate = total_visited / (total_ms / 1000) if total_ms else 0.0
    lines.append(
        f"rounds={len(metrics)} visited={total_visited} "
        f"wall={total_ms / 1000:.2f}s rate={rate:.1f} pages/s "
        f"seen_mode={metrics[-1].get('seen_mode', '?')}"
    )
    return "\n".join(lines)
