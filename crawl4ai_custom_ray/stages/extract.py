"""The extract stage: pages → extracted records, as a Ray Data
``map_batches`` transform over Arrow batches.

Replaces the reference's fetch→scrape→markdown per-page asyncio path
(``async_webcrawler.py:435-663``) with a stateless batch transform:
HTML parsing is inherently per-document work, so the batch function
loops documents *inside* one Arrow batch (amortizing task overhead),
while Ray Data parallelizes across batches/cores.  Batches stay
``pyarrow`` end-to-end (zero-copy from the object store); big string
columns use ``large_string``.

Scale notes (100 TB design point):
- ``batch_size`` is small (default 32) because rows are multi-KB..MB
  HTML documents — a batch must fit comfortably in a worker heap;
- output prunes the raw ``html`` column (the biggest payload) instead
  of carrying it forward;
- ``LIGHT_COLUMNS`` mode emits only (url, text, links) for pipelines
  that don't need markdown variants, cutting shuffle volume.
"""

from __future__ import annotations

import pyarrow as pa

from ..kernel import extract_page

LINK_TYPE = pa.struct(
    [
        ("href", pa.string()),
        ("text", pa.string()),
        ("title", pa.string()),
        ("base_domain", pa.string()),
        ("intrinsic_score", pa.float64()),
    ]
)

EXTRACTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("success", pa.bool_()),
        ("status_code", pa.int32()),
        ("cleaned_html", pa.large_string()),
        ("raw_markdown", pa.large_string()),
        ("markdown_with_citations", pa.large_string()),
        ("references_markdown", pa.large_string()),
        ("fit_markdown", pa.large_string()),
        ("fit_html", pa.large_string()),
        ("text", pa.large_string()),
        ("metadata", pa.large_string()),
        ("links_internal", pa.list_(LINK_TYPE)),
        ("links_external", pa.list_(LINK_TYPE)),
        ("n_images", pa.int32()),
        ("n_tables", pa.int32()),
        ("n_table_rows", pa.int32()),
        ("error_message", pa.string()),
    ]
)

_LINK_FIELDS = ("href", "text", "title", "base_domain", "intrinsic_score")


def _links_for_arrow(links: list[dict]) -> list[dict]:
    return [
        {
            "href": l["href"],
            "text": l["text"],
            "title": l["title"],
            "base_domain": l["base_domain"],
            "intrinsic_score": float(l.get("intrinsic_score") or 0.0),
        }
        for l in links
    ]


def make_extract_batch_fn(
    *,
    columns: list[str] | None = None,
    citations: bool = True,
    compute_fit_html: bool = False,
    excluded_tags: list[str] | None = None,
    markdown_options: dict | None = None,
    markdown_source: str = "cleaned_html",
):
    """Build the batch fn. ``columns`` restricts the output schema
    (always includes url) — column pruning at the operator level."""
    out_fields = [
        f for f in EXTRACTED_SCHEMA if columns is None or f.name in set(columns) | {"url"}
    ]
    out_schema = pa.schema(out_fields)
    wanted = {f.name for f in out_fields}

    # map output columns → kernel compute fields so unneeded stages
    # (markdown, pruning, serialization) are skipped entirely
    kernel_fields = set()
    for name in wanted:
        if name in ("links_internal", "links_external"):
            kernel_fields.add("links")
        elif name in ("n_images",):
            kernel_fields.add("media")
        elif name in ("n_tables", "n_table_rows"):
            kernel_fields.add("tables")
        elif name in ("url", "success", "status_code", "error_message"):
            pass
        else:
            kernel_fields.add(name)

    def extract_batch(batch: pa.Table) -> pa.Table:
        # The DOM is cycle-rich (parent↔children): under default GC the
        # cyclic collector re-traces every live tree many times per
        # batch. Disable it in the worker and collect once per batch.
        import gc

        if gc.isenabled():
            gc.disable()
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        cols: dict[str, list] = {name: [] for name in wanted}
        for url, html in zip(urls, htmls):
            if isinstance(html, bytes):
                html = html.decode("utf-8", errors="replace")
            rec = extract_page(
                url,
                html,
                citations=citations,
                compute_fit_html=compute_fit_html,
                excluded_tags=excluded_tags,
                fields=kernel_fields,
                markdown_options=markdown_options,
                markdown_source=markdown_source,
            )
            for name in wanted:
                if name in ("links_internal", "links_external"):
                    cols[name].append(_links_for_arrow(rec[name]))
                elif name == "n_images":
                    cols[name].append(len(rec["images"]))
                elif name == "n_tables":
                    cols[name].append(len(rec["tables"]))
                elif name == "n_table_rows":
                    cols[name].append(sum(len(t["rows"]) for t in rec["tables"]))
                else:
                    cols[name].append(rec[name])
        result = pa.table(
            {f.name: pa.array(cols[f.name], f.type) for f in out_fields}, schema=out_schema
        )
        # dead DOM trees are dissolved (refcount-freed) inside the
        # kernel, so a full collect has nothing big left to find; a
        # gen-0 sweep only scans this batch's surviving allocations
        # and reaps the frame↔traceback cycles of caught fallback
        # exceptions (hostile-page paths raise per page)
        gc.collect(0)
        return result

    return extract_batch


def extract_pages(
    ds,
    *,
    columns: list[str] | None = None,
    citations: bool = True,
    compute_fit_html: bool = False,
    excluded_tags: list[str] | None = None,
    markdown_options: dict | None = None,
    markdown_source: str = "cleaned_html",
    batch_size: int | None = None,
    **map_kwargs,
):
    """pages Dataset → extracted Dataset (stateless tasks).

    ``batch_size=None`` processes whole blocks (lowest per-batch
    overhead); block size is governed by the read layout.
    ``markdown_options`` are the html2text knobs
    (DefaultMarkdownGenerator ``options={...}``) applied to the
    markdown columns."""
    fn = make_extract_batch_fn(
        columns=columns,
        citations=citations,
        compute_fit_html=compute_fit_html,
        excluded_tags=excluded_tags,
        markdown_options=markdown_options,
        markdown_source=markdown_source,
    )
    return ds.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True, **map_kwargs
    )
