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
    (chunking_strategy.py:65) — punkt is unavailable, so boundaries
    come from a deterministic rule set: ``[.!?]`` + space + an
    upper/digit/quote sentence opener, EXCEPT after common
    abbreviations, single-letter initials, and decimal numbers.
    """

    _ABBREV = frozenset(
        "mr mrs ms dr prof rev fr st jr sr vs etc inc ltd co corp dept div est"
        " fig no al e.g i.e u.s u.k a.m p.m".split()
    )
    _BOUNDARY = re.compile(r"([.!?][\)\]\"']*)\s+(?=[A-Z0-9\"'(\[])")

    def _is_boundary(self, left: str) -> bool:
        # left = text up to and including the terminator run
        m = re.search(r"([\w.]+)[.!?]+[\)\]\"']*$", left)
        if m is None:
            return True
        word = m.group(1).lower().rstrip(".")
        if word in self._ABBREV:
            return False
        if len(word) == 1 and word.isalpha():  # initial: "J. Smith"
            return False
        # NOTE: no decimal-number guard is needed here — a decimal's
        # dot is never followed by whitespace, so it can't be a
        # boundary candidate; guarding `\d\.` would wrongly glue
        # year/count-final sentences ("It was 1999. Then…")
        return True

    def chunk(self, text: str) -> list[str]:
        if not text:
            return []
        out: list[str] = []
        start = 0
        for m in self._BOUNDARY.finditer(text):
            end = m.end(1)
            if self._is_boundary(text[start:end]):
                seg = text[start:end].strip()
                if seg:
                    out.append(seg)
                start = m.end()
        tail = text[start:].strip()
        if tail:
            out.append(tail)
        return out


class NlpSentenceChunking(RegexSentenceChunking):
    """Reference surface (chunking_strategy.py:65-83): sentences
    stripped and deduplicated.  The reference returns
    ``list(set(...))`` (hash order); a deterministic engine keeps
    first-occurrence order instead — documented divergence."""

    def chunk(self, text: str) -> list[str]:
        seen: set[str] = set()
        out = []
        for s in super().chunk(text):
            if s not in seen:
                seen.add(s)
                out.append(s)
        return out


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


# compact english stopword list for TextTiling block comparison and
# keyword extraction (the reference pulls NLTK's corpus; a fixed list
# keeps the implementation deterministic and dependency-free)
_TT_STOPWORDS = frozenset(
    """a about above after again all also am an and any are as at be because
    been before being below between both but by can did do does doing down
    during each few for from further had has have having he her here hers him
    his how i if in into is it its just me more most my no nor not now of off
    on once only or other our out over own same she should so some such than
    that the their them then there these they this those through to too under
    until up very was we were what when where which while who whom why will
    with you your""".split()
)

_TT_WORD = re.compile(r"[a-z0-9']+")


class TopicSegmentationChunking:
    """TextTiling topic segmentation (Hearst, CL 1997).

    The reference's ``TopicSegmentationChunking``
    (``chunking_strategy.py:92-152``) delegates to NLTK's
    ``TextTilingTokenizer``; NLTK is absent in this environment, so
    this is a from-scratch implementation of the published algorithm:

    1. lowercase word tokens, stopwords dropped, grouped into
       pseudo-sentences of ``w`` tokens;
    2. lexical cohesion at each pseudo-sentence gap = cosine between
       the term vectors of the ``k`` pseudo-sentences on each side;
    3. depth score per gap = (left peak − sim) + (right peak − sim);
    4. boundaries where depth > mean + stddev·cutoff (LC cutoff
       policy, cutoff=-0.5 ⇒ mean − stddev/2), suppressing boundaries
       within ``min_gap`` pseudo-sentences of a deeper one;
    5. boundaries snap to the nearest paragraph break when the text
       has ``\\n\\n`` paragraphs, else to the pseudo-sentence's token
       offset.

    Deterministic; degrades to one segment for short texts.
    """

    def __init__(self, num_keywords: int = 3, w: int = 20, k: int = 10, min_gap: int = 2):
        self.num_keywords = num_keywords
        self.w = w
        self.k = k
        self.min_gap = min_gap

    # -- core ---------------------------------------------------------
    def _token_spans(self, text: str) -> list[tuple[str, int]]:
        low = text.lower()
        return [(m.group(0), m.start()) for m in _TT_WORD.finditer(low)]

    def chunk(self, text: str) -> list[str]:
        if not text or not text.strip():
            return []
        spans = self._token_spans(text)
        tokens = [t for t, _ in spans]
        n_ps = len(tokens) // self.w
        if n_ps < 4:
            return [text]

        # pseudo-sentence term vectors (stopwords excluded)
        ps_counts: list[dict[str, int]] = []
        for i in range(n_ps):
            counts: dict[str, int] = {}
            for tok in tokens[i * self.w : (i + 1) * self.w]:
                if tok not in _TT_STOPWORDS:
                    counts[tok] = counts.get(tok, 0) + 1
            ps_counts.append(counts)

        # gap similarities (block of k each side)
        sims: list[float] = []
        for gap in range(1, n_ps):
            left = self._merge(ps_counts[max(0, gap - self.k) : gap])
            right = self._merge(ps_counts[gap : gap + self.k])
            sims.append(self._cosine(left, right))
        if not sims:
            return [text]

        # depth scores
        depths: list[float] = []
        for i, s in enumerate(sims):
            l = s
            j = i - 1
            while j >= 0 and sims[j] >= l:
                l = sims[j]
                j -= 1
            r = s
            j = i + 1
            while j < len(sims) and sims[j] >= r:
                r = sims[j]
                j += 1
            depths.append((l - s) + (r - s))

        mean = sum(depths) / len(depths)
        var = sum((d - mean) ** 2 for d in depths) / len(depths)
        threshold = mean - (var**0.5) / 2.0

        cand = [i for i, d in enumerate(depths) if d > threshold and d > 0]
        # suppress shallow boundaries too close to deeper ones
        cand.sort(key=lambda i: -depths[i])
        chosen: list[int] = []
        for i in cand:
            if all(abs(i - c) > self.min_gap for c in chosen):
                chosen.append(i)
        chosen.sort()
        if not chosen:
            return [text]

        # gap i = boundary between pseudo-sentence i and i+1 → char
        # offset of pseudo-sentence i+1's first token
        offsets = [spans[(g + 1) * self.w][1] for g in chosen]
        para_breaks = [m.end() for m in re.finditer(r"\n[ \t]*\n", text)]
        cuts: list[int] = []
        for off in offsets:
            if para_breaks:
                snap = min(para_breaks, key=lambda p: abs(p - off))
            else:
                snap = off
            if snap not in cuts and 0 < snap < len(text):
                cuts.append(snap)
        cuts.sort()
        segments = []
        prev = 0
        for c in cuts:
            seg = text[prev:c]
            if seg.strip():
                segments.append(seg)
            prev = c
        tail = text[prev:]
        if tail.strip():
            segments.append(tail)
        return segments or [text]

    @staticmethod
    def _merge(counts_list: list[dict[str, int]]) -> dict[str, int]:
        out: dict[str, int] = {}
        for c in counts_list:
            for t, n in c.items():
                out[t] = out.get(t, 0) + n
        return out

    @staticmethod
    def _cosine(a: dict[str, int], b: dict[str, int]) -> float:
        if not a or not b:
            return 0.0
        dot = sum(n * b.get(t, 0) for t, n in a.items())
        na = sum(n * n for n in a.values()) ** 0.5
        nb = sum(n * n for n in b.values()) ** 0.5
        return dot / (na * nb) if na and nb else 0.0

    # -- reference surface (chunking_strategy.py:118-152) -------------
    def extract_keywords(self, text: str) -> list[str]:
        from collections import Counter

        freq = Counter(
            t
            for t, _ in self._token_spans(text)
            if t not in _TT_STOPWORDS
        )
        return [w for w, _ in freq.most_common(self.num_keywords)]

    def chunk_with_topics(self, text: str) -> list[tuple[str, list[str]]]:
        return [(seg, self.extract_keywords(seg)) for seg in self.chunk(text)]


def chunk_dataset(ds, chunker, *, id_column: str = "doc_id", text_column: str = "text"):
    """Explode documents into (doc_id, chunk_index, chunk) rows."""

    def fn(batch: pa.Table) -> pa.Table:
        ids, idxs, chunks = [], [], []
        for i, t in zip(batch[id_column].to_pylist(), batch[text_column].to_pylist()):
            for j, c in enumerate(chunker.chunk(t)):
                ids.append(i)
                idxs.append(j)
                chunks.append(c)
        # id column keeps the input's type (int doc ids, string urls…)
        return pa.table(
            {
                id_column: pa.array(ids, batch.schema.field(id_column).type),
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
