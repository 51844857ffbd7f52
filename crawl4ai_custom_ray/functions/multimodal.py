"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata;
decode / feature-extraction stages are actor-pool ``map_batches``
transforms (model loaded once per actor).  The actual codecs are NOT
available in this environment, so the decode step is STUBBED:

- ``decoder="stub"`` (default): a deterministic fake decode — derives
  (width, height, n_channels, features) arithmetically from the bytes,
  so the full Ray plumbing (schema, batch sizing, actor lifecycle,
  output layout) is real and testable, and has a SQL oracle
  (``octet_length`` arithmetic).
- ``decoder="pil"`` etc.: raises ``NotImplementedError`` with a clear
  message — the integration point for a real image library.

Batch sizing note (100 TB): media rows are large; keep ``batch_size``
small (default 16) and let blocks stay near ``target_max_block_size``
so one batch × pool concurrency fits worker heaps.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

FEATURE_DIM = 8

MEDIA_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("media_type", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_bytes", pa.int64()),
        ("features", pa.list_(pa.float32(), FEATURE_DIM)),
    ]
)


class ImageFeatureExtractor:
    """Actor-pool stage: decode (stubbed) + feature-extract media
    binary columns.

    ``__init__`` = the once-per-actor model/codec setup; ``__call__`` =
    per-batch work.  With a real decoder this class would load the
    image library + a feature model here."""

    def __init__(self, decoder: str = "stub", binary_column: str = "payload"):
        if decoder != "stub":
            raise NotImplementedError(
                f"decoder={decoder!r}: image/audio codecs are not available in "
                "this environment; only the deterministic 'stub' decoder is "
                "implemented. Plug a real decode here (PIL/ffmpeg) when "
                "running with media libraries installed."
            )
        self.decoder = decoder
        self.binary_column = binary_column

    @staticmethod
    def _stub_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
        """Deterministic fake decode: dims + an 8-dim feature vector
        derived from the payload bytes (SQL-replicable: width/height
        from octet_length; features from a stable byte hash)."""
        n = len(payload)
        width = 64 + (n % 577)
        height = 64 + ((n * 7) % 419)
        digest = hashlib.blake2b(payload, digest_size=FEATURE_DIM).digest()
        features = (np.frombuffer(digest, dtype=np.uint8).astype(np.float32)) / 255.0
        return width, height, features

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        payloads = batch[self.binary_column].to_pylist()
        widths, heights, n_bytes, feats = [], [], [], []
        for p in payloads:
            p = p or b""
            w, h, f = self._stub_decode(p)
            widths.append(w)
            heights.append(h)
            n_bytes.append(len(p))
            feats.append(f.tolist())
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "media_type": pa.array(["image"] * len(urls), pa.string()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "features": pa.array(feats, pa.list_(pa.float32(), FEATURE_DIM)),
            },
            schema=MEDIA_SCHEMA,
        )


def extract_media_features(
    ds,
    *,
    binary_column: str = "payload",
    concurrency: int = 2,
    batch_size: int = 16,
):
    """Media dataset → features table (actor pool; small batches for
    large binary rows).  ``num_cpus=0.5`` so the pool never reserves
    every core and starves the read stage (pipeline-deadlock guard on
    small sessions)."""
    return ds.map_batches(
        ImageFeatureExtractor,
        fn_constructor_kwargs={"binary_column": binary_column},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )


class FrameSampler:
    """Actor-pool frame-sampling stage for opaque video payloads —
    the Ray-side plumbing (schema, per-row explosion, batched actor
    work) is real; the decode is the repo's deterministic stub
    convention (no codecs in this environment; a real build swaps
    ``_frame_digest`` for an ffmpeg/PyAV frame grab loaded once in
    ``__init__``).

    Sampling contract (mirrored by the SQL oracle): one frame per
    4096-byte span, capped at ``max_frames``; frame f's payload is
    the 64-byte window at offset f·4096 and its digest is the
    repo-wide seedless md5 u64 of that window's text."""

    FRAME_SPAN = 4096
    WINDOW = 64

    def __init__(self, *, binary_column: str = "payload", max_frames: int = 5):
        from .curation import _md5_u64

        self.binary_column = binary_column
        self.max_frames = max_frames
        self._digest = _md5_u64

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls, idxs, offs, digs = [], [], [], []
        for u, payload in zip(
            batch["url"].to_pylist(), batch[self.binary_column].to_pylist()
        ):
            data = payload if isinstance(payload, str) else payload.decode(
                "utf-8", errors="replace"
            )
            n = len(data)
            n_frames = min(max(1, -(-n // self.FRAME_SPAN)), self.max_frames)
            for f in range(n_frames):
                off = f * self.FRAME_SPAN
                window = data[off : off + self.WINDOW]
                urls.append(u)
                idxs.append(f)
                offs.append(off)
                digs.append(self._digest(window) % (1 << 62))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "frame_idx": pa.array(idxs, pa.int64()),
                "byte_offset": pa.array(offs, pa.int64()),
                "frame_digest": pa.array(digs, pa.int64()),
            }
        )


def sample_frames(ds, *, binary_column: str = "payload", max_frames: int = 5,
                  concurrency: int = 2, batch_size: int = 256):
    """Video-style frame sampling as an actor-pool flat explosion:
    each payload row yields ≤ ``max_frames`` frame rows.  Small
    batches by design — binary payloads are large, so batch_size
    bounds worker heap (the multimodal sizing rule)."""
    import functools

    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={
            "binary_column": binary_column,
            "max_frames": max_frames,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        num_cpus=0.5,
    )
