"""LLM-stage orchestration with injectable completion clients.

The reference's LLM strategies — ``LLMExtractionStrategy``
(``extraction_strategy.py:493-987``), ``LLMContentFilter``
(``content_filter_strategy.py:780-1060``) and ``LLMTableExtraction``
(``table_extraction.py:320-1395``) — are deterministic orchestration
(chunk → prompt → parse → merge) around one litellm completion call.
No client exists in this environment, so the CLIENT is the injection
point here: any ``Callable[[str], str]`` (prompt in, completion text
out).  Everything around it is real and differential-tested with
deterministic fake clients:

- ``merge_chunks`` sectioning (the reference's ``utils.py:162-226``
  packer, implemented in :mod:`.chunkers`) with
  ``chunk_token_threshold`` / ``overlap_rate``;
- prompt variable substitution (``{URL} {HTML} {REQUEST} {SCHEMA}``)
  across the block / instruction / schema / inferred-schema modes;
- response parsing: ``force_json_response`` JSON with the reference's
  dict/list normalization (a single-key dict wrapping a list unwraps
  to that list; a bare dict becomes a one-element list), else a
  ``<blocks>`` tag containing a JSON array, else a
  balanced-JSON-object scan whose unparsable remainder becomes an
  ``{"error": true}`` block — and client exceptions become error
  blocks rather than failing the stage;
- md5 response caching for the content filter;
- usage accounting (whitespace token counts, since an injected plain
  callable reports none);
- the actor-pool ``map_batches`` stage (client built ONCE per actor).

Constructing any strategy WITHOUT a client raises
``NotImplementedError`` — the honest gate, unchanged.

Sections are processed sequentially inside one actor: the reference
fans out a 4-worker thread pool per page because it runs one event
loop per process; under Ray Data the parallelism IS the actor pool,
so per-actor threading would only fight the scheduler.
"""

from __future__ import annotations

import hashlib
import json
import re
from dataclasses import dataclass

from .chunkers import merge_chunks

_GATE_MSG = (
    "{name} needs a completion client, and no LLM client exists in this "
    "environment. Inject one: any Callable[[str], str] mapping a prompt to "
    "the completion text (built once per actor in the map_batches stage)."
)

# Own wording; same variable contract as the reference templates
# (prompts.py PROMPT_EXTRACT_*): {URL} {HTML} {REQUEST} {SCHEMA}, and
# the answer arrives inside a <blocks> tag holding a JSON array.
PROMPT_BLOCKS = (
    "Read the page content below and split it into meaningful semantic "
    "blocks. Return a JSON array of objects, each with \"index\", "
    "\"tags\" and \"content\" fields, wrapped in a <blocks> tag.\n"
    "URL: {URL}\nCONTENT:\n{HTML}\n"
    "Answer with <blocks>[ ... ]</blocks> only."
)
PROMPT_BLOCKS_WITH_INSTRUCTION = (
    "Read the page content below and extract the parts matching this "
    "request: {REQUEST}\nReturn a JSON array of objects wrapped in a "
    "<blocks> tag.\nURL: {URL}\nCONTENT:\n{HTML}\n"
    "Answer with <blocks>[ ... ]</blocks> only."
)
PROMPT_SCHEMA = (
    "Extract objects matching this JSON schema from the page content.\n"
    "SCHEMA:\n{SCHEMA}\nREQUEST: {REQUEST}\nURL: {URL}\n"
    "CONTENT:\n{HTML}\n"
    "Answer with <blocks>[ ... ]</blocks> holding the extracted objects."
)
PROMPT_INFERRED_SCHEMA = (
    "Infer a sensible JSON schema for the structured data on this page, "
    "then extract all matching objects.\nURL: {URL}\nCONTENT:\n{HTML}\n"
    "Answer with <blocks>[ ... ]</blocks> holding the extracted objects."
)
PROMPT_FILTER = (
    "Keep only the meaningful article content from the fragment below, "
    "dropping navigation, ads and boilerplate, per this instruction: "
    "{REQUEST}\nFRAGMENT:\n{HTML}\n"
    "Answer with the retained content as markdown, nothing else."
)
PROMPT_TABLE = (
    "Convert the HTML table chunk below into data rows. The header is "
    "included in every chunk. Return a JSON array of row objects keyed "
    "by the header names, wrapped in a <blocks> tag.\nTABLE:\n{HTML}\n"
    "Answer with <blocks>[ ... ]</blocks> only."
)

_BLOCKS_RE = re.compile(r"<blocks>(.*?)</blocks>", re.S)


@dataclass
class TokenUsage:
    """Whitespace-token accounting (a plain injected callable reports
    no provider usage; mirrors the reference's TokenUsage shape)."""

    prompt_tokens: int = 0
    completion_tokens: int = 0

    @property
    def total_tokens(self) -> int:
        return self.prompt_tokens + self.completion_tokens


def _substitute(template: str, variables: dict) -> str:
    for k, v in variables.items():
        template = template.replace("{" + k + "}", v)
    return template


def _split_json_objects(text: str) -> tuple[list, str]:
    """Scan for balanced top-level JSON objects; returns (parsed,
    unparsed-remainder) — the reference's salvage path for a response
    that ignored the <blocks> contract."""
    parsed, unparsed_parts = [], []
    i, n = 0, len(text)
    while i < n:
        if text[i] == "{":
            depth, j, in_str, esc = 0, i, False, False
            while j < n:
                c = text[j]
                if in_str:
                    if esc:
                        esc = False
                    elif c == "\\":
                        esc = True
                    elif c == '"':
                        in_str = False
                elif c == '"':
                    in_str = True
                elif c == "{":
                    depth += 1
                elif c == "}":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            if j < n and depth == 0:
                try:
                    parsed.append(json.loads(text[i : j + 1]))
                    i = j + 1
                    continue
                except (ValueError, TypeError):
                    pass
        unparsed_parts.append(text[i])
        i += 1
    unparsed = "".join(unparsed_parts).strip()
    return parsed, unparsed


def parse_blocks(content: str, *, force_json: bool = False) -> list[dict]:
    """Response → list of block dicts, reference-normalization rules."""
    try:
        if force_json:
            blocks = json.loads(content)
            if isinstance(blocks, dict):
                if len(blocks) == 1 and isinstance(next(iter(blocks.values())), list):
                    blocks = next(iter(blocks.values()))
                else:
                    blocks = [blocks]
        else:
            m = _BLOCKS_RE.search(content)
            if m is None:
                raise ValueError("no <blocks> tag")
            blocks = json.loads(m.group(1))
            if isinstance(blocks, dict):
                blocks = [blocks]
        for b in blocks:
            b["error"] = False
        return blocks
    except (ValueError, TypeError, AttributeError):
        parsed, unparsed = _split_json_objects(content)
        blocks = [dict(b, error=False) for b in parsed if isinstance(b, dict)]
        if unparsed:
            blocks.append(
                {"index": 0, "error": True, "tags": ["error"], "content": unparsed}
            )
        return blocks


class LLMExtractionStrategy:
    """Chunked LLM extraction (reference
    ``extraction_strategy.py:493-987``): sections → ``merge_chunks``
    (threshold + overlap) → one prompt per merged section → parsed
    blocks concatenated, usage accumulated, per-section failures
    degraded to error blocks."""

    def __init__(
        self,
        *,
        client=None,
        schema: dict | None = None,
        instruction: str | None = None,
        extract_type: str = "block",
        chunk_token_threshold: int = 1200,
        overlap_rate: float = 0.1,
        word_token_rate: float = 1.0,
        force_json_response: bool = False,
    ):
        if client is None:
            raise NotImplementedError(_GATE_MSG.format(name="LLMExtractionStrategy"))
        self.client = client
        self.schema = schema
        self.instruction = instruction
        self.extract_type = extract_type
        self.chunk_token_threshold = chunk_token_threshold
        self.overlap_rate = overlap_rate
        self.word_token_rate = word_token_rate
        self.force_json_response = force_json_response
        self.usages: list[TokenUsage] = []
        self.total_usage = TokenUsage()

    def _prompt(self, url: str, content: str) -> str:
        variables = {"URL": url, "HTML": content}
        template = PROMPT_BLOCKS
        if self.instruction:
            variables["REQUEST"] = self.instruction
            template = PROMPT_BLOCKS_WITH_INSTRUCTION
        if self.extract_type == "schema":
            if self.schema:
                variables["SCHEMA"] = json.dumps(self.schema, indent=2)
                variables.setdefault("REQUEST", self.instruction or "")
                template = PROMPT_SCHEMA
            else:
                template = PROMPT_INFERRED_SCHEMA
        return _substitute(template, variables)

    def extract(self, url: str, ix: int, content: str) -> list[dict]:
        prompt = self._prompt(url, content)
        try:
            response = self.client(prompt)
        except Exception as e:  # noqa: BLE001 — client faults become data
            return [{"index": ix, "error": True, "tags": ["error"], "content": str(e)}]
        usage = TokenUsage(len(prompt.split()), len(response.split()))
        self.usages.append(usage)
        self.total_usage.prompt_tokens += usage.prompt_tokens
        self.total_usage.completion_tokens += usage.completion_tokens
        return parse_blocks(response, force_json=self.force_json_response)

    def run(self, url: str, sections: list[str]) -> list[dict]:
        merged = merge_chunks(
            sections,
            target_size=self.chunk_token_threshold,
            overlap=int(self.chunk_token_threshold * self.overlap_rate),
            word_token_ratio=self.word_token_rate,
        )
        out: list[dict] = []
        for ix, section in enumerate(merged):
            out.extend(self.extract(url, ix, section))
        return out


class LLMContentFilter:
    """Chunked LLM content filter (reference
    ``content_filter_strategy.py:780-1060``): html → ``merge_chunks``
    → one filter prompt per chunk → retained-markdown chunks, with an
    md5(html+instruction) response cache (dict-like; pass any mapping
    for cross-call persistence)."""

    def __init__(
        self,
        *,
        client=None,
        instruction: str | None = None,
        chunk_token_threshold: int = 4096,
        cache: dict | None = None,
    ):
        if client is None:
            raise NotImplementedError(_GATE_MSG.format(name="LLMContentFilter"))
        self.client = client
        self.instruction = instruction or ""
        self.chunk_token_threshold = chunk_token_threshold
        self.cache = cache if cache is not None else {}
        self.total_usage = TokenUsage()

    def _cache_key(self, html: str) -> str:
        return hashlib.md5((html + self.instruction).encode()).hexdigest()

    def filter_content(self, html: str) -> list[str]:
        key = self._cache_key(html)
        if key in self.cache:
            return list(self.cache[key])
        chunks = merge_chunks([html], target_size=self.chunk_token_threshold)
        out = []
        for chunk in chunks:
            prompt = _substitute(
                PROMPT_FILTER, {"REQUEST": self.instruction, "HTML": chunk}
            )
            response = self.client(prompt)
            self.total_usage.prompt_tokens += len(prompt.split())
            self.total_usage.completion_tokens += len(response.split())
            if response.strip():
                out.append(response.strip())
        self.cache[key] = list(out)
        return out


_TR_RE = re.compile(r"<tr[\s>].*?</tr>|<tr>.*?</tr>", re.S | re.I)
_TH_RE = re.compile(r"<th[\s>]|<th>", re.I)


class LLMTableExtraction:
    """Header-preserving chunked LLM table extraction (reference
    ``table_extraction.py:320-1395``): a table too big for one prompt
    is split into row chunks, EVERY chunk re-carries the header rows,
    per-chunk row objects are parsed from <blocks> and merged in
    document order."""

    def __init__(self, *, client=None, max_rows_per_chunk: int = 50):
        if client is None:
            raise NotImplementedError(_GATE_MSG.format(name="LLMTableExtraction"))
        self.client = client
        self.max_rows_per_chunk = max_rows_per_chunk
        self.total_usage = TokenUsage()

    def extract_table(self, table_html: str) -> dict:
        rows = _TR_RE.findall(table_html)
        header_rows = [r for r in rows if _TH_RE.search(r)]
        body_rows = [r for r in rows if not _TH_RE.search(r)]
        header_html = "".join(header_rows)
        merged_rows: list = []
        step = max(1, self.max_rows_per_chunk)
        n_chunks = 0
        for start in range(0, len(body_rows), step):
            chunk_html = (
                "<table>" + header_html + "".join(body_rows[start : start + step]) + "</table>"
            )
            prompt = _substitute(PROMPT_TABLE, {"HTML": chunk_html})
            response = self.client(prompt)
            self.total_usage.prompt_tokens += len(prompt.split())
            self.total_usage.completion_tokens += len(response.split())
            merged_rows.extend(
                b for b in parse_blocks(response) if not b.get("error")
            )
            n_chunks += 1
        return {"rows": merged_rows, "n_chunks": n_chunks}


def llm_extract_stage(
    ds,
    strategy_factory,
    *,
    html_column: str = "html",
    url_column: str = "url",
    concurrency: int = 2,
    batch_size: int = 16,
):
    """Actor-pool LLM extraction over a pages dataset: the strategy
    (and its client/connection state) is built ONCE per actor in
    ``__init__``; ``__call__`` runs per batch.  Output adds an
    ``extracted_content`` JSON-string column serialized exactly like
    the reference (``json.dumps(..., indent=4, ensure_ascii=False)``,
    ``async_webcrawler.py:631-633``)."""
    import pyarrow as pa

    class Extractor:
        def __init__(self):
            self.strategy = strategy_factory()

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = []
            for url, html in zip(
                batch[url_column].to_pylist(), batch[html_column].to_pylist()
            ):
                blocks = self.strategy.run(url or "", [html or ""])
                out.append(json.dumps(blocks, indent=4, ensure_ascii=False))
            return batch.append_column(
                "extracted_content", pa.array(out, pa.large_string())
            )

    return ds.map_batches(
        Extractor,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
