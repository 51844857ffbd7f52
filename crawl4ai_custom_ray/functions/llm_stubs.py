"""Gated stubs for the reference's LLM-backed strategies.

The reference ships ``LLMContentFilter``
(``content_filter_strategy.py:780-1060``), ``LLMExtractionStrategy``
(``extraction_strategy.py:493-987``) and ``LLMTableExtraction``
(``table_extraction.py:320-1395``) — all thin orchestration around a
litellm completion client (chunk → prompt → parse), plus
``NaivePDFProcessorStrategy`` (``processors/pdf/processor.py``).

No LLM client or PDF library exists in this environment.  These
classes define the engine-side integration points — the actor-pool
``map_batches`` stage shape with once-per-actor client setup and
rate-budget state — and raise ``NotImplementedError`` with clear
guidance instead of silently faking model output.  (The deterministic
parts of those strategies — chunking, schema handling, table merge —
live in :mod:`.chunkers`, :mod:`.structured`, :mod:`..html.tables`.)
"""

from __future__ import annotations

_MSG = (
    "{name} needs {dep}, which is not available in this environment. "
    "The deterministic pipeline pieces (chunking, schema extraction, table "
    "merge) are implemented in crawl4ai_custom_ray.functions; plug a client "
    "into __init__ (once per actor) and implement __call__ per batch to "
    "enable this stage."
)


class _GatedStage:
    NAME = "LLM stage"
    DEP = "an LLM client (litellm)"

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(_MSG.format(name=self.NAME, dep=self.DEP))


class LLMContentFilter(_GatedStage):
    """Reference: content_filter_strategy.py:780-1060 — chunk html,
    LLM-filter per chunk with md5 disk cache, 4-way thread pool."""

    NAME = "LLMContentFilter"


class LLMExtractionStrategy(_GatedStage):
    """Reference: extraction_strategy.py:493-987 — merge_chunks →
    prompt → completion → parsed JSON blocks with token accounting."""

    NAME = "LLMExtractionStrategy"


class LLMTableExtraction(_GatedStage):
    """Reference: table_extraction.py:320-1395 — LLM table parsing
    with header-preserving chunk merge."""

    NAME = "LLMTableExtraction"


class PDFProcessorStrategy(_GatedStage):
    """Reference: processors/pdf/processor.py — PDF → per-page
    text/images/markdown. Needs a PDF library."""

    NAME = "PDFProcessorStrategy"
    DEP = "a PDF library (pypdf/pdfium)"
