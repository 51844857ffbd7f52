"""BM25 content filter.

Mirrors the reference ``BM25ContentFilter``
(``crawl4ai/content_filter_strategy.py:381-530``):

1. page query from user query, else title + first h1 + meta
   keywords/description, else first paragraph > 150 chars
   (``extract_page_query`` :125-159);
2. ordered text chunks via an explicit-stack DOM walk that
   accumulates text across inline tags and flushes at block
   boundaries (``extract_text_chunks`` :161-271);
3. tokens lowercased, split on whitespace, stopword/noise cleaned
   (``clean_tokens``, ``utils.py:2543-…``; stemming skipped — the
   snowball stemmer is not available in this environment, matching
   ``use_stemming=False`` mode);
4. BM25Okapi scores (the published Okapi formula with the rank_bm25
   defaults k1=1.5, b=0.75, epsilon=0.25) × per-tag priority weights
   (:425-437);
5. threshold (default 1.0), then re-sorted to document order, each
   surviving element re-rendered with unwanted tags/attrs stripped
   (``clean_element`` :329-378).
"""

from __future__ import annotations

import math

from .dom import Element, TextNode, parse, body_of

INLINE_TAGS = frozenset(
    {
        "a", "abbr", "acronym", "b", "bdo", "big", "br", "button", "cite", "code",
        "dfn", "em", "i", "img", "input", "kbd", "label", "map", "object", "q",
        "samp", "script", "select", "small", "span", "strong", "sub", "sup",
        "textarea", "time", "tt", "var",
    }
)
HEADER_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6", "header"})

PRIORITY_TAGS = {
    "h1": 5.0,
    "h2": 4.0,
    "h3": 3.0,
    "title": 4.0,
    "strong": 2.0,
    "b": 1.5,
    "em": 1.5,
    "blockquote": 2.0,
    "code": 2.0,
    "pre": 1.5,
    "th": 1.5,
}

# Stopword/noise set of the reference's clean_tokens (utils.py:2543-…)
STOP_WORDS = frozenset(
    """a an and are as at be by for from has he in is it its of on that the to
    was were will with i you she we they me him her us them my your his our
    their mine yours hers ours theirs myself yourself himself herself itself
    ourselves themselves am been being have had having do does did doing about
    above across after against along among around up ccp""".split()
)
_NOISE_PREFIXES = ("↑", "▲", "⬆")


def clean_tokens(tokens: list[str]) -> list[str]:
    return [
        t
        for t in tokens
        if len(t) > 2 and t not in STOP_WORDS and not t.startswith(_NOISE_PREFIXES)
    ]


class BM25Okapi:
    """Okapi BM25 (public formula; parameters match rank_bm25 defaults)."""

    def __init__(self, corpus: list[list[str]], k1: float = 1.5, b: float = 0.75, epsilon: float = 0.25):
        self.k1 = k1
        self.b = b
        self.epsilon = epsilon
        self.corpus_size = len(corpus)
        self.doc_len = [len(d) for d in corpus]
        self.avgdl = sum(self.doc_len) / self.corpus_size if self.corpus_size else 0.0
        self.doc_freqs: list[dict[str, int]] = []
        df: dict[str, int] = {}
        for doc in corpus:
            freqs: dict[str, int] = {}
            for tok in doc:
                freqs[tok] = freqs.get(tok, 0) + 1
            self.doc_freqs.append(freqs)
            for tok in freqs:
                df[tok] = df.get(tok, 0) + 1
        self.idf: dict[str, float] = {}
        idf_sum = 0.0
        negative_idfs = []
        for tok, freq in df.items():
            idf = math.log(self.corpus_size - freq + 0.5) - math.log(freq + 0.5)
            self.idf[tok] = idf
            idf_sum += idf
            if idf < 0:
                negative_idfs.append(tok)
        avg_idf = idf_sum / len(self.idf) if self.idf else 0.0
        eps = self.epsilon * avg_idf
        for tok in negative_idfs:
            self.idf[tok] = eps

    def get_scores(self, query: list[str]) -> list[float]:
        scores = [0.0] * self.corpus_size
        for q in query:
            idf = self.idf.get(q)
            if idf is None:
                continue
            for i, freqs in enumerate(self.doc_freqs):
                f = freqs.get(q, 0)
                if f == 0:
                    continue
                denom = f + self.k1 * (1 - self.b + self.b * self.doc_len[i] / self.avgdl)
                scores[i] += idf * (f * (self.k1 + 1)) / denom
        return scores


def extract_page_query(root: Element, body: Element, user_query: str | None) -> str:
    if user_query:
        return user_query
    query_parts: list[str] = []
    title_el = root.find("title")
    if title_el is not None:
        title = title_el.get_text()
        if title:
            query_parts.append(title)
    h1 = root.find("h1")
    if h1 is not None:
        query_parts.append(h1.get_text())
    temp = ""
    for meta_name in ("keywords", "description"):
        for meta in root.find_all("meta"):
            if meta.get("name") == meta_name and meta.get("content"):
                query_parts.append(meta.get("content"))
                temp += meta.get("content")
                break
    if not temp:
        for p in body.find_all("p"):
            text = p.get_text()
            if len(text) > 150:
                query_parts.append(text[:150])
                break
    return " ".join(filter(None, query_parts))


def extract_text_chunks(
    body: Element, min_word_threshold: int | None = None
) -> list[tuple[int, str, str, Element]]:
    chunks: list[tuple[int, str, str, Element]] = []
    current_text: list[str] = []
    chunk_index = 0

    def should_break_chunk(el: Element) -> bool:
        return el.tag not in INLINE_TAGS and not (el.tag == "p" and len(current_text) == 0)

    stack: list[tuple[object, bool]] = [(body, False)]
    while stack:
        element, visited = stack.pop()
        if visited:
            if current_text and should_break_chunk(element):
                text = " ".join("".join(current_text).split())
                if text:
                    tag_type = "header" if element.tag in HEADER_TAGS else "content"
                    chunks.append((chunk_index, text, tag_type, element))
                    chunk_index += 1
                current_text = []
            continue
        if isinstance(element, TextNode):
            if element.text.strip():
                current_text.append(element.text.strip())
            continue
        if not isinstance(element, Element):
            continue
        children = list(element.children)
        if not children:
            continue
        stack.append((element, True))
        for child in reversed(children):
            if isinstance(child, (Element, TextNode)):
                stack.append((child, False))

    if current_text:
        text = " ".join("".join(current_text).split())
        if text:
            chunks.append((chunk_index, text, "content", body))

    if min_word_threshold:
        chunks = [c for c in chunks if len(c[1].split()) >= min_word_threshold]
    return chunks


_UNWANTED_TAGS = frozenset({"script", "style", "aside", "form", "iframe", "noscript"})
_UNWANTED_ATTRS = frozenset({"style", "onclick", "onmouseover", "align", "bgcolor", "class", "id"})


def clean_element(el: Element) -> str:
    builder: list[str] = []

    def render(node) -> None:
        if isinstance(node, TextNode):
            builder.append(node.text.strip())
            return
        if not isinstance(node, Element):
            return
        if node.tag in _UNWANTED_TAGS:
            return
        builder.append(f"<{node.tag}")
        for k, v in node.attrs.items():
            if k not in _UNWANTED_ATTRS:
                builder.append(f' {k}="{v}"')
        builder.append(">")
        for child in node.children:
            render(child)
        builder.append(f"</{node.tag}>")

    render(el)
    return "".join(builder)


class BM25ContentFilter:
    def __init__(
        self,
        user_query: str | None = None,
        bm25_threshold: float = 1.0,
    ):
        self.user_query = user_query
        self.bm25_threshold = bm25_threshold

    def filter_content(self, html: str, min_word_threshold: int | None = None) -> list[str]:
        if not html or not isinstance(html, str):
            return []
        root = parse(html)
        body = body_of(root)

        query = extract_page_query(root, body, self.user_query)
        if not query:
            return []

        candidates = extract_text_chunks(body, min_word_threshold)
        if not candidates:
            return []

        tokenized_corpus = [clean_tokens(c[1].lower().split()) for c in candidates]
        tokenized_query = clean_tokens(query.lower().split())

        bm25 = BM25Okapi(tokenized_corpus)
        scores = bm25.get_scores(tokenized_query)

        selected = []
        for score, (index, chunk, _tag_type, tag) in zip(scores, candidates):
            adjusted = score * PRIORITY_TAGS.get(tag.tag, 1.0)
            if adjusted >= self.bm25_threshold:
                selected.append((index, chunk, tag))

        if not selected:
            return []
        selected.sort(key=lambda x: x[0])
        return [clean_element(tag) for _, _, tag in selected]
