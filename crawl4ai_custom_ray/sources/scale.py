"""Deterministic scaled corpus for volume-validation runs (≥1M pages).

The sf directories cap out at 5,000 documents (sf0.1); validating that
the distributed code paths *carry real load* (not just pass toy-size
equivalence tests) needs a corpus two-plus orders of magnitude bigger.
This module amplifies a base sf directory ``replicas``× into
``/tmp/graft_scale/<base>_x<replicas>/``:

- ``documents.parquet/`` — a DIRECTORY of part files (one per replica
  batch, written chunk-by-chunk so generation memory is bounded by the
  batch, never the corpus; a partial directory is discarded via the
  atomic-rename commit).  Replica ``r`` of doc ``d`` gets
  ``doc_id = r * n_base + d``.  Replica 0 is the pristine base corpus;
  replicas ``r > 0`` suffix every token with ``r<r>`` — a bijection on
  the token alphabet, so WITHIN a replica every base near-duplicate
  pair keeps its exact Jaccard similarity while ACROSS replicas
  similarity collapses to ~0.  Duplicate density therefore stays at
  the base corpus's realistic ~5% instead of exploding into
  200-member clique clusters that no real web corpus exhibits.
- pages: the standard synthetic page generator
  (``sources/pages.py:build_page_html``) applied to the scaled
  documents — but run AS A RAY DATASET PIPELINE (``map_batches`` over
  the documents scan, streamed ``write_parquet``), because building a
  million-row table in driver lists is exactly the anti-pattern the
  validation exists to rule out.  The link graph
  ``(3i+1)%N, (7i+11)%N, (i+1)%N`` then spans the full scaled id
  space, so a deep crawl genuinely traverses the big corpus.

Everything is a pure function of (base sf_dir, replicas) — no RNG, no
wall clock — so reruns are byte-identical and cache-safe.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

SCALE_CACHE_ROOT = "/tmp/graft_scale"

# bump when the amplification scheme changes (cache key)
_SCALE_VERSION = 1


def _perturb_tokens(text: str, r: int) -> str:
    if r == 0:
        return text
    suf = f"r{r}"
    return " ".join(w + suf for w in text.split())


def scale_dir_for(base_sf_dir: str, replicas: int) -> str:
    base = os.path.basename(os.path.normpath(base_sf_dir))
    return os.path.join(
        SCALE_CACHE_ROOT, f"{base}_x{replicas}_g{_SCALE_VERSION}"
    )


def scaled_documents_dir(base_sf_dir: str, replicas: int) -> str:
    """Amplified sf directory with ``documents.parquet`` as a part-file
    directory; returns the sf-style directory path (generated on first
    use, atomic-rename committed)."""
    out = scale_dir_for(base_sf_dir, replicas)
    docs_dir = os.path.join(out, "documents.parquet")
    if os.path.isdir(docs_dir) and any(
        n.endswith(".parquet") for n in os.listdir(docs_dir)
    ):
        return out
    base = pq.read_table(
        os.path.join(base_sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"],
    )
    n_base = base.num_rows
    doc_ids = base["doc_id"].to_pylist()
    texts = base["text"].to_pylist()
    langs = base["lang"].to_pylist()
    sources = base["source"].to_pylist()

    os.makedirs(SCALE_CACHE_ROOT, exist_ok=True)
    tmp_root = tempfile.mkdtemp(dir=SCALE_CACHE_ROOT)
    tmp_docs = os.path.join(tmp_root, "documents.parquet")
    os.makedirs(tmp_docs, exist_ok=True)
    try:
        # one part per replica: bounded memory (n_base rows), and the
        # many-part layout is what lets the parquet scan parallelize
        for r in range(replicas):
            ptexts = [_perturb_tokens(t, r) for t in texts]
            part = pa.table(
                {
                    "doc_id": pa.array(
                        [r * n_base + d for d in doc_ids], pa.int64()
                    ),
                    "text": pa.array(ptexts, pa.string()),
                    "lang": pa.array(langs, pa.string()),
                    "source": pa.array(sources, pa.string()),
                    "n_chars": pa.array(
                        [len(t) for t in ptexts], pa.int64()
                    ),
                }
            )
            pq.write_table(
                part,
                os.path.join(tmp_docs, f"docs_{r:05d}.parquet"),
                row_group_size=1024,
            )
        os.rename(tmp_root, out)
    except Exception:
        # any failure mid-generation (pyarrow/numpy included, not just
        # OSError) must remove the multi-GB tmp dir; if a concurrent
        # generator won the atomic rename race, the committed output
        # is complete — return it.
        shutil.rmtree(tmp_root, ignore_errors=True)
        if not os.path.isdir(out):
            raise
    return out


def scaled_embeddings_dir(base_sf_dir: str, replicas: int) -> str:
    """Amplified embeddings table for ANN volume runs:
    ``embeddings.parquet`` as a part-file directory under the scale
    cache, ``vec_id = r * n_base + v``.

    Replica ``r > 0`` applies a SIGNED PERMUTATION of the dimensions
    (roll by ``r`` positions, deterministic ±1 signs from integer
    arithmetic — no RNG).  A signed permutation is orthogonal, so
    WITHIN a replica every cosine similarity is preserved exactly
    (near-duplicate structure replicates bit-for-bit in float64),
    while ACROSS replicas vectors decorrelate — the same
    duplicate-density philosophy as the token-suffix document
    amplification above.

    Note: the sign mask applies at ``r = 0`` too, so replica 0 is NOT
    the base table byte-for-byte (``vec_id < n_base`` rows won't match
    ``embeddings.parquet``) — harmless for cosine structure, which a
    signed permutation preserves exactly within every replica."""
    import numpy as np

    base_name = os.path.basename(os.path.normpath(base_sf_dir))
    out = os.path.join(
        SCALE_CACHE_ROOT,
        f"emb_{base_name}_x{replicas}_g{_SCALE_VERSION}.parquet",
    )
    if os.path.isdir(out) and any(
        n.endswith(".parquet") for n in os.listdir(out)
    ):
        return out
    base = pq.read_table(
        os.path.join(base_sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding", "label"],
    )
    n_base = base.num_rows
    vec_ids = np.asarray(base["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.asarray(
        [list(v) for v in base["embedding"].to_pylist()], dtype=np.float32
    )
    labels = base["label"].to_pylist()
    dim = mat.shape[1]

    os.makedirs(SCALE_CACHE_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=SCALE_CACHE_ROOT)
    try:
        per_part = 25  # replicas per part file: bounded memory, many parts
        for p0 in range(0, replicas, per_part):
            parts = []
            for r in range(p0, min(p0 + per_part, replicas)):
                perm = np.roll(np.arange(dim), r % dim)
                signs = np.where(
                    ((np.arange(dim) * 40503 + r * 2654435761) >> 7) & 1,
                    -1.0,
                    1.0,
                ).astype(np.float32)
                m_r = mat[:, perm] * signs[None, :]
                parts.append(
                    pa.table(
                        {
                            "vec_id": pa.array(
                                r * n_base + vec_ids, pa.int64()
                            ),
                            "embedding": pa.array(
                                list(m_r), pa.list_(pa.float32())
                            ),
                            "label": pa.array(labels, pa.int32()),
                        }
                    )
                )
            pq.write_table(
                pa.concat_tables(parts),
                os.path.join(tmp, f"emb_{p0:05d}.parquet"),
                row_group_size=4096,
            )
        os.rename(tmp, out)
    except Exception:
        # see scaled_documents_dir: cleanup on ANY failure, tolerate a
        # lost atomic-rename race.
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.isdir(out):
            raise
    return out


def scaled_pages_dir(scale_dir: str) -> str:
    """Pages parquet directory for a scaled sf dir, generated as a
    streaming Ray Data pipeline: documents scan → per-batch
    ``build_page_html`` → ``write_parquet``.  Driver memory stays at
    batch size; the corpus never exists in one place."""
    out_dir = os.path.join(scale_dir, "pages.parquet")
    if os.path.isdir(out_dir) and any(
        n.endswith(".parquet") for n in os.listdir(out_dir)
    ):
        return out_dir

    import ray.data as rd

    from .pages import _EPOCH, build_page_html, normalize_text, page_url

    docs_dir = os.path.join(scale_dir, "documents.parquet")
    n_docs = rd.read_parquet(docs_dir, columns=["doc_id"]).count()

    from datetime import timedelta

    def to_pages(batch: pa.Table, n: int = n_docs) -> pa.Table:
        urls, tss, htmls, out_texts, out_langs = [], [], [], [], []
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist()
        for i, text, lang in zip(ids, texts, langs):
            body = normalize_text(text)
            urls.append(page_url(i, n))
            tss.append(_EPOCH + timedelta(seconds=(i * 977) % 31_536_000))
            htmls.append(build_page_html(i, n, body).encode("utf-8"))
            out_texts.append(body)
            out_langs.append(lang)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array(out_texts, pa.string()),
                "lang": pa.array(out_langs, pa.string()),
            }
        )

    tmp_dir = tempfile.mkdtemp(dir=scale_dir)
    try:
        (
            rd.read_parquet(
                docs_dir, columns=["doc_id", "text", "lang"]
            )
            .map_batches(to_pages, batch_format="pyarrow", batch_size=2048)
            .write_parquet(tmp_dir)
        )
        os.rename(tmp_dir, out_dir)
    except Exception:
        # see scaled_documents_dir: cleanup on ANY failure, tolerate a
        # lost atomic-rename race.
        shutil.rmtree(tmp_dir, ignore_errors=True)
        if not os.path.isdir(out_dir):
            raise
    return out_dir


def scaled_events_dir(base_sf_dir: str, replicas: int) -> str:
    """Amplified events table for windowed-analytics volume runs:
    ``events.parquet`` as a part-file directory under the scale cache,
    ``event_id = r * n_base + e`` and ``user_id = r * (max_user + 1) +
    u``.  Each replica is a DISJOINT user population with the base
    table's exact per-user time series, so every per-user operator
    (asof join, rolling window, sessionize) sees ``replicas``× more
    groups of realistic size — group-count scaling, the regime the
    epoch-sharded bucketing exists for — while per-replica results
    replicate the base answer exactly.  Deterministic; no RNG."""
    base_name = os.path.basename(os.path.normpath(base_sf_dir))
    out = os.path.join(
        SCALE_CACHE_ROOT,
        f"events_{base_name}_x{replicas}_g{_SCALE_VERSION}.parquet",
    )
    if os.path.isdir(out) and any(
        n.endswith(".parquet") for n in os.listdir(out)
    ):
        return out
    base = pq.read_table(os.path.join(base_sf_dir, "events.parquet"))
    n_base = base.num_rows
    import pyarrow.compute as _pc

    user_span = int(_pc.max(base["user_id"]).as_py()) + 1
    # stride by max(id)+1, not row count: a sparse base id space would
    # otherwise overlap replicas and break event_id uniqueness (the
    # asof/rolling id_column contract)
    id_span = max(n_base, int(_pc.max(base["event_id"]).as_py()) + 1)

    os.makedirs(SCALE_CACHE_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=SCALE_CACHE_ROOT)
    try:
        for r in range(replicas):
            part = base.set_column(
                base.schema.get_field_index("event_id"),
                "event_id",
                _pc.add(base["event_id"], r * id_span),
            ).set_column(
                base.schema.get_field_index("user_id"),
                "user_id",
                _pc.add(base["user_id"], r * user_span),
            )
            pq.write_table(
                part,
                os.path.join(tmp, f"events_{r:05d}.parquet"),
                row_group_size=8192,
            )
        os.rename(tmp, out)
    except Exception:
        # see scaled_documents_dir: cleanup on ANY failure, tolerate a
        # lost atomic-rename race.
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.isdir(out):
            raise
    return out
