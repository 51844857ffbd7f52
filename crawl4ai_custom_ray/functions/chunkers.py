"""Chunking strategies.

Mirrors the reference ``chunking_strategy.py`` (all pure, <50 LoC
each): ``IdentityChunking`` (:28), ``RegexChunking`` (default split on
``\\n\\n``, :38), ``FixedLengthWordChunking`` (:147),
``SlidingWindowChunking`` (:175), ``OverlappingWindowChunking``
(:215).  ``NlpSentenceChunking`` (:65) needs NLTK (absent here) — a
regex sentence splitter stands in, flagged by name.

Each exposes ``chunk(text) -> list[str]`` and a ``chunk_dataset``
helper exploding (doc_id, chunk_index, chunk) rows via map_batches.
"""

from __future__ import annotations

import re

import pyarrow as pa


class IdentityChunking:
    def chunk(self, text: str) -> list[str]:
        return [text] if text else []


class RegexChunking:
    def __init__(self, patterns: list[str] | None = None):
        self.patterns = patterns or [r"\n\n"]

    def chunk(self, text: str) -> list[str]:
        paragraphs = [text]
        for pattern in self.patterns:
            out: list[str] = []
            for p in paragraphs:
                out.extend(re.split(pattern, p))
            paragraphs = out
        return [p for p in paragraphs if p.strip()]


class RegexSentenceChunking:
    """Stand-in for the reference's NLTK ``NlpSentenceChunking``
    (chunking_strategy.py:65) — sentence boundaries by punctuation
    regex instead of punkt."""

    _SENT_RE = re.compile(r"(?<=[.!?])\s+")

    def chunk(self, text: str) -> list[str]:
        return [s.strip() for s in self._SENT_RE.split(text) if s.strip()]


class FixedLengthWordChunking:
    def __init__(self, chunk_size: int = 100):
        self.chunk_size = chunk_size

    def chunk(self, text: str) -> list[str]:
        words = text.split()
        return [
            " ".join(words[i : i + self.chunk_size])
            for i in range(0, len(words), self.chunk_size)
        ]


class SlidingWindowChunking:
    def __init__(self, window_size: int = 100, step: int = 50):
        self.window_size = window_size
        self.step = step

    def chunk(self, text: str) -> list[str]:
        words = text.split()
        if len(words) <= self.window_size:
            return [text] if text else []
        chunks = []
        for i in range(0, len(words) - self.window_size + 1, self.step):
            chunks.append(" ".join(words[i : i + self.window_size]))
        return chunks


class OverlappingWindowChunking:
    def __init__(self, window_size: int = 1000, overlap: int = 100):
        self.window_size = window_size
        self.overlap = overlap

    def chunk(self, text: str) -> list[str]:
        words = text.split()
        if len(words) <= self.window_size:
            return [text] if text else []
        chunks = []
        start = 0
        while start < len(words):
            end = min(start + self.window_size, len(words))
            chunks.append(" ".join(words[start:end]))
            if end == len(words):
                break
            start = end - self.overlap
        return chunks


def chunk_dataset(ds, chunker, *, id_column: str = "doc_id", text_column: str = "text"):
    """Explode documents into (doc_id, chunk_index, chunk) rows."""

    def fn(batch: pa.Table) -> pa.Table:
        ids, idxs, chunks = [], [], []
        for i, t in zip(batch[id_column].to_pylist(), batch[text_column].to_pylist()):
            for j, c in enumerate(chunker.chunk(t)):
                ids.append(i)
                idxs.append(j)
                chunks.append(c)
        return pa.table(
            {
                id_column: pa.array(ids, pa.int64()),
                "chunk_index": pa.array(idxs, pa.int32()),
                "chunk": pa.array(chunks, pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def merge_chunks(
    docs,
    target_size: int,
    overlap: int = 0,
    word_token_ratio: float = 1.0,
    splitter=None,
) -> list[str]:
    """Merge documents into ~target_size-token chunks with optional
    overlap — the reference's deterministic LLM-stage packer
    (``utils.py:162-226``), byte-equal semantics:

    - per-doc token counts scale by ``word_token_ratio`` only to SIZE
      the chunk count (ceil(total/target)); distribution counts real
      tokens;
    - tokens stream across doc boundaries into the current chunk,
      rolling to the next chunk once ``target_size`` tokens are placed
      (except into the last chunk, which absorbs the remainder);
    - on rollover the previous chunk's last ``overlap`` tokens seed the
      next chunk;
    - empty docs are skipped; empty result for empty input.
    """
    splitter = splitter or str.split
    per_doc_tokens: list[list[str]] = []
    total_scaled = 0
    for doc in docs:
        tokens = splitter(doc)
        scaled = int(len(tokens) * word_token_ratio)
        if scaled:
            per_doc_tokens.append(tokens)
            total_scaled += scaled
    if not total_scaled:
        return []

    num_chunks = max(1, (total_scaled + target_size - 1) // target_size)
    chunks: list[list[str]] = [[] for _ in range(num_chunks)]
    cur = 0
    cur_size = 0
    for tokens in per_doc_tokens:
        for tok in tokens:
            if cur_size >= target_size and cur < num_chunks - 1:
                if overlap > 0:
                    carry = chunks[cur][-overlap:]
                    cur += 1
                    chunks[cur].extend(carry)
                    cur_size = len(carry)
                else:
                    cur += 1
                    cur_size = 0
            chunks[cur].append(tok)
            cur_size += 1
    return [" ".join(c) for c in chunks if c]
