"""Semantic clustering extraction — the ``CosineStrategy`` shape.

The reference's ``CosineStrategy``
(``extraction_strategy.py:135-491``) loads a sentence-transformer +
classifier ONCE at ``__init__`` (via ``model_loader``), embeds text
chunks, filters by cosine similarity to a ``semantic_filter`` query,
hierarchically clusters (ward), and returns top-k clusters.

No model weights exist in this environment, so the embedder here is a
deterministic feature-hashing embedder (bag-of-words hashed into a
fixed-dim vector, L2-normalized — the classic hashing trick).  The
*shape* is what matters for the engine: a stateful actor-pool
``map_batches`` stage whose ``__init__`` does the expensive setup once
per worker; swap ``HashingEmbedder`` for a real model to get the
reference behavior.

Clustering is greedy single-pass agglomerative over chunk vectors
(deterministic, order = document order) with a cosine threshold —
matching the reference's intent (group adjacent semantically-similar
chunks) without scipy.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class HashingEmbedder:
    """Deterministic bag-of-words hashing embedder (publicly known
    feature-hashing trick); stands in for the sentence-transformer."""

    def __init__(self, dim: int = 128):
        self.dim = dim

    def _token_index(self, token: str) -> tuple[int, int]:
        # md5 rather than blake2b so the mapping is reproducible in
        # ANSI SQL (DuckDB ships md5 but no blake2) — the adaptive
        # EmbeddingStrategy replay oracle recomputes idx/sign as
        # ('0x'||substr(md5(tok),1,8))::UINT32 % dim and hex-digit-9
        # parity; any cryptographic hash serves the feature-hashing
        # trick equally
        h = hashlib.md5(token.encode("utf-8")).hexdigest()
        idx = int(h[:8], 16) % self.dim
        sign = 1 if int(h[8], 16) & 1 else -1
        return idx, sign

    def embed(self, text: str) -> np.ndarray:
        v = np.zeros(self.dim, dtype=np.float64)
        for token in text.lower().split():
            idx, sign = self._token_index(token)
            v[idx] += sign
        norm = np.linalg.norm(v)
        return v / norm if norm > 0 else v

    def embed_many(self, texts: list[str]) -> np.ndarray:
        return np.vstack([self.embed(t) for t in texts]) if texts else np.zeros((0, self.dim))


class LinearMapEmbedder:
    """Second built-in embedder: a fixed character-level linear map
    (deterministic, no hashing, no model weights).  Exists to prove
    the ``embedder_factory`` model seam end-to-end — any object with
    ``embed``/``embed_many`` (e.g. a sentence-transformer wrapper)
    plugs into :class:`SemanticClusterExtractor` and the adaptive
    EmbeddingStrategy the same way."""

    def __init__(self, dim: int = 128):
        self.dim = dim

    def embed(self, text: str) -> np.ndarray:
        v = np.zeros(self.dim, dtype=np.float64)
        for pos, ch in enumerate(text.lower()):
            v[(ord(ch) * 31 + pos) % self.dim] += (ord(ch) % 13) - 6
        norm = np.linalg.norm(v)
        return v / norm if norm > 0 else v

    def embed_many(self, texts: list[str]) -> np.ndarray:
        return (
            np.vstack([self.embed(t) for t in texts])
            if texts
            else np.zeros((0, self.dim))
        )


class SentenceTransformerEmbedder:
    """Real-model embedder for the ``embedder_factory`` seam (the
    reference loads its model once per process via ``model_loader.py``
    ``load_HF_embedding_model``/``get_device``).  Import-gated like the
    aiohttp fetch path: this environment ships no model weights or
    ``sentence_transformers`` package, so construction raises a loud
    ImportError here — in a deployment with the package installed the
    swap is pure config:

        semantic_cluster(ds, embedder_factory=sentence_transformer_factory())
    """

    def __init__(self, dim: int = 128, model_name: str = "sentence-transformers/all-MiniLM-L6-v2"):
        try:
            from sentence_transformers import SentenceTransformer
        except ImportError as e:
            raise ImportError(
                "SentenceTransformerEmbedder needs the sentence_transformers "
                "package (absent in this environment); use the default "
                "HashingEmbedder or inject another embedder_factory"
            ) from e
        # once-per-actor model load — the expensive state this seam
        # exists to amortize
        self._model = SentenceTransformer(model_name)
        self.dim = self._model.get_sentence_embedding_dimension()

    def embed(self, text: str) -> np.ndarray:
        return self.embed_many([text])[0]

    def embed_many(self, texts: list[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.dim))
        vecs = np.asarray(
            self._model.encode(texts, normalize_embeddings=True), dtype=np.float64
        )
        return vecs


def sentence_transformer_factory(model_name: str = "sentence-transformers/all-MiniLM-L6-v2"):
    """``embedder_factory`` adapter: ``factory(dim)`` ignores the
    requested hashing dim (the model dictates its own) and returns the
    gated real-model embedder."""

    def factory(dim: int) -> SentenceTransformerEmbedder:
        return SentenceTransformerEmbedder(dim=dim, model_name=model_name)

    return factory


def greedy_cluster(vectors: np.ndarray, threshold: float) -> list[int]:
    """Assign each vector to the first cluster whose centroid cosine ≥
    threshold, else start a new cluster.  Deterministic."""
    labels: list[int] = []
    centroids: list[np.ndarray] = []
    counts: list[int] = []
    for v in vectors:
        best, best_sim = -1, threshold
        for ci, c in enumerate(centroids):
            denom = np.linalg.norm(c) * np.linalg.norm(v)
            sim = float(c @ v / denom) if denom > 0 else 0.0
            if sim >= best_sim:
                best, best_sim = ci, sim
        if best == -1:
            centroids.append(v.copy())
            counts.append(1)
            labels.append(len(centroids) - 1)
        else:
            centroids[best] = (centroids[best] * counts[best] + v) / (counts[best] + 1)
            counts[best] += 1
            labels.append(best)
    return labels


class SemanticClusterExtractor:
    """Actor-pool stage: chunk text → embed → optional semantic filter
    → cluster → emit (url, cluster_id, chunk) rows."""

    def __init__(
        self,
        semantic_filter: str | None = None,
        sim_threshold: float = 0.4,
        cluster_threshold: float = 0.3,
        word_count_threshold: int = 5,
        dim: int = 128,
        embedder_factory=None,
    ):
        # once-per-actor setup (the reference loads its HF model here).
        # `embedder_factory(dim)` is the model seam: any object with
        # .embed(text)/.embed_many(texts) — e.g. a sentence-transformer
        # wrapper — replaces the hashing stand-in per actor.
        self.embedder = (
            embedder_factory(dim) if embedder_factory else HashingEmbedder(dim=dim)
        )
        self.semantic_filter = semantic_filter
        self.filter_vec = (
            self.embedder.embed(semantic_filter) if semantic_filter else None
        )
        self.sim_threshold = sim_threshold
        self.cluster_threshold = cluster_threshold
        self.word_count_threshold = word_count_threshold

    def _chunks(self, text: str) -> list[str]:
        return [
            p.strip()
            for p in text.split("\n\n")
            if len(p.split()) >= self.word_count_threshold
        ] or ([text.strip()] if len(text.split()) >= self.word_count_threshold else [])

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls_out, clusters_out, chunks_out, sims_out = [], [], [], []
        for url, text in zip(batch["url"].to_pylist(), batch["text"].to_pylist()):
            chunks = self._chunks(text or "")
            if not chunks:
                continue
            vectors = self.embedder.embed_many(chunks)
            sims = (
                vectors @ self.filter_vec
                if self.filter_vec is not None
                else np.ones(len(chunks))
            )
            keep = [i for i, s in enumerate(sims) if s >= (self.sim_threshold if self.filter_vec is not None else 0)]
            if not keep:
                continue
            kept_vecs = vectors[keep]
            labels = greedy_cluster(kept_vecs, self.cluster_threshold)
            for i, lab in zip(keep, labels):
                urls_out.append(url)
                clusters_out.append(lab)
                chunks_out.append(chunks[i])
                sims_out.append(round(float(sims[i]), 6))
        return pa.table(
            {
                "url": pa.array(urls_out, pa.string()),
                "cluster_id": pa.array(clusters_out, pa.int32()),
                "chunk": pa.array(chunks_out, pa.large_string()),
                "filter_sim": pa.array(sims_out, pa.float64()),
            }
        )


def semantic_cluster(ds, *, concurrency: int = 2, batch_size: int = 256, **kwargs):
    return ds.map_batches(
        SemanticClusterExtractor,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )
