"""LLM-stage orchestration tests (functions/llm.py) with
deterministic fake clients: block parsing + normalization rules,
chunked runs with usage accounting, the md5 filter cache,
header-preserving table chunk merge, client-fault degradation, the
no-client gate, and the actor-pool stage."""

import json

import pyarrow as pa
import pytest
import ray.data as rd

from crawl4ai_custom_ray.functions.llm import (
    LLMContentFilter,
    LLMExtractionStrategy,
    LLMTableExtraction,
    llm_extract_stage,
    parse_blocks,
)


# --------------------------------------------------------- parsing


def test_parse_blocks_tag():
    out = parse_blocks('noise <blocks>[{"index": 1, "content": "x"}]</blocks> tail')
    assert out == [{"index": 1, "content": "x", "error": False}]


def test_parse_blocks_force_json_normalization():
    # single-key dict wrapping a list unwraps; bare dict becomes [dict]
    assert parse_blocks('{"news": [{"a": 1}]}', force_json=True) == [
        {"a": 1, "error": False}
    ]
    assert parse_blocks('{"a": 1, "b": 2}', force_json=True) == [
        {"a": 1, "b": 2, "error": False}
    ]


def test_parse_blocks_salvage_and_error_remainder():
    out = parse_blocks('pre {"a": 1} mid {"b": {"c": 2}} junk }{')
    assert {"a": 1, "error": False} in out
    assert {"b": {"c": 2}, "error": False} in out
    assert out[-1]["error"] is True and "junk" in out[-1]["content"]


# ------------------------------------------------------ extraction


def _blocks_client(prompt: str) -> str:
    # deterministic "model": one block echoing the content word count
    content = prompt.split("CONTENT:\n", 1)[1].rsplit("\nAnswer", 1)[0]
    return (
        '<blocks>[{"index": 0, "tags": ["t"], "n_words": %d}]</blocks>'
        % len(content.split())
    )


def test_extraction_chunks_and_usage():
    s = LLMExtractionStrategy(client=_blocks_client, chunk_token_threshold=50)
    text = " ".join(f"w{i}" for i in range(120))
    blocks = s.run("https://x/1", [text])
    assert len(blocks) == 3  # 120 tokens / 50 → 3 merged sections
    assert all(not b["error"] for b in blocks)
    assert sum(b["n_words"] for b in blocks) >= 120  # overlap re-counts
    assert s.total_usage.prompt_tokens > 120
    assert len(s.usages) == 3


def test_extraction_schema_prompt_and_instruction():
    seen = []

    def spy(prompt):
        seen.append(prompt)
        return "<blocks>[]</blocks>"

    s = LLMExtractionStrategy(
        client=spy,
        schema={"fields": [{"name": "price"}]},
        instruction="get prices",
        extract_type="schema",
    )
    s.run("https://x/2", ["some page text"])
    assert "get prices" in seen[0] and '"price"' in seen[0]


def test_extraction_client_fault_degrades_to_error_block():
    def boom(prompt):
        raise RuntimeError("rate limited")

    s = LLMExtractionStrategy(client=boom)
    blocks = s.run("https://x/3", ["hello world"])
    assert blocks == [
        {"index": 0, "error": True, "tags": ["error"], "content": "rate limited"}
    ]


def test_no_client_gate():
    for cls in (LLMExtractionStrategy, LLMContentFilter, LLMTableExtraction):
        with pytest.raises(NotImplementedError):
            cls()


# ---------------------------------------------------------- filter


def test_content_filter_cache_hits():
    calls = []

    def client(prompt):
        calls.append(prompt)
        return "kept markdown"

    f = LLMContentFilter(client=client, instruction="keep articles")
    first = f.filter_content("<p>some html body</p>")
    again = f.filter_content("<p>some html body</p>")
    assert first == again == ["kept markdown"]
    assert len(calls) == 1  # second call served from the md5 cache
    assert f.filter_content("<p>other</p>") == ["kept markdown"]
    assert len(calls) == 2


# ----------------------------------------------------------- table


def test_table_chunking_preserves_header_and_order():
    prompts = []

    def client(prompt):
        prompts.append(prompt)
        # echo back one object per body <td> row in the chunk
        chunk = prompt.split("TABLE:\n", 1)[1]
        rows = [r for r in chunk.split("<tr>") if "<td>" in r]
        objs = [{"cell": r.split("<td>")[1].split("</td>")[0]} for r in rows]
        return "<blocks>" + json.dumps(objs) + "</blocks>"

    t = LLMTableExtraction(client=client, max_rows_per_chunk=4)
    html = (
        "<table><tr><th>h</th></tr>"
        + "".join(f"<tr><td>r{i}</td></tr>" for i in range(10))
        + "</table>"
    )
    out = t.extract_table(html)
    assert out["n_chunks"] == 3  # 10 rows / 4
    assert [r["cell"] for r in out["rows"]] == [f"r{i}" for i in range(10)]
    assert all("<th>h</th>" in p for p in prompts)  # header in EVERY chunk


# ------------------------------------------------------ actor pool


def test_llm_extract_stage_actor_pool(ray_session):
    # the client must be defined INSIDE the test: cloudpickle
    # serializes module-level functions by reference, and pytest test
    # modules are not importable from Ray workers (the actor would
    # crash-restart forever); a local closure ships by value
    def blocks_client(prompt: str) -> str:
        content = prompt.split("CONTENT:\n", 1)[1].rsplit("\nAnswer", 1)[0]
        return (
            '<blocks>[{"index": 0, "tags": ["t"], "n_words": %d}]</blocks>'
            % len(content.split())
        )

    ds = rd.from_arrow(
        pa.table(
            {
                "url": pa.array([f"https://x/{i}" for i in range(6)], pa.string()),
                "html": pa.array([f"body {'x ' * i}end" for i in range(6)], pa.string()),
            }
        )
    ).repartition(2)
    out = llm_extract_stage(
        ds,
        lambda: LLMExtractionStrategy(client=blocks_client),
        concurrency=2,
        batch_size=4,
    ).take_all()
    assert len(out) == 6
    for row in out:
        blocks = json.loads(row["extracted_content"])
        assert blocks and blocks[0]["error"] is False


# ------------------------------------------------------------- fuzz


def test_parse_blocks_never_raises_on_arbitrary_text():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=400), st.booleans())
    def check(text, force_json):
        out = parse_blocks(text, force_json=force_json)
        assert isinstance(out, list)
        for b in out:
            assert isinstance(b, dict) and "error" in b

    check()
