"""CLI surfaces parse and document themselves (full runs are covered
by the verify drives; these stay Ray-free)."""

import subprocess
import sys


def _help(module: str) -> str:
    out = subprocess.run(
        [sys.executable, "-m", module, "--help"], capture_output=True, text=True
    )
    assert out.returncode == 0, out.stderr
    return out.stdout


def test_crawl_cli_help():
    text = _help("crawl4ai_custom_ray.frontier.crawl")
    for flag in ("--pages", "--seeds", "--strategy", "--per-host-cap", "--seen-mode", "--resume"):
        assert flag in text


def test_extract_cli_help():
    text = _help("crawl4ai_custom_ray.pipelines.flagship")
    for flag in ("--pages", "--sf-dir", "--out", "--columns", "--resumable"):
        assert flag in text


def test_crawl_cli_requires_args():
    out = subprocess.run(
        [sys.executable, "-m", "crawl4ai_custom_ray.frontier.crawl"],
        capture_output=True,
        text=True,
    )
    assert out.returncode != 0
    assert "--pages" in out.stderr


# ---------------------------------------------------------------- c4r

import json

import pytest

click = pytest.importorskip("click")
from click.testing import CliRunner

from crawl4ai_custom_ray import cli as c4r

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def runner(tmp_path, monkeypatch):
    monkeypatch.setenv("C4R_CONFIG_DIR", str(tmp_path / "cfg"))
    return CliRunner()


def test_parse_key_values_reference_semantics():
    # reference cli.py:108-131 coercion rules
    out = c4r.parse_key_values(None, None, "a=true,b=false,c=3,d=2.5,e=[x;y],f=hello")
    assert out == {"a": True, "b": False, "c": 3, "d": 2.5, "e": ["x", "y"], "f": "hello"}
    out = c4r.parse_key_values(None, None, 'g={"k": 1}')
    assert out == {"g": {"k": 1}}
    with pytest.raises(click.BadParameter):
        c4r.parse_key_values(None, None, "novalue")


def test_load_config_file_yaml_and_json(tmp_path):
    y = tmp_path / "c.yml"
    y.write_text("threshold: 0.5\ntype: pruning\n")
    assert c4r.load_config_file(str(y)) == {"threshold": 0.5, "type": "pruning"}
    j = tmp_path / "c.json"
    j.write_text('{"type": "bm25"}')
    assert c4r.load_config_file(str(j)) == {"type": "bm25"}
    assert c4r.load_config_file(None) == {}


def test_config_set_get_list(runner):
    r = runner.invoke(c4r.cli, ["config", "set", "verbose", "true"])
    assert r.exit_code == 0, r.output
    r = runner.invoke(c4r.cli, ["config", "get", "VERBOSE"])
    assert "VERBOSE = True" in r.output
    r = runner.invoke(c4r.cli, ["config", "list"])
    assert "NUM_CPUS" in r.output
    r = runner.invoke(c4r.cli, ["config", "get", "bogus"])
    assert r.exit_code != 0


def test_examples_and_help(runner):
    assert runner.invoke(c4r.cli, ["examples"]).exit_code == 0
    assert "extract" in runner.invoke(c4r.cli, ["--help"]).output


def test_extract_markdown_stdout(runner, ray_session):
    r = runner.invoke(c4r.cli, ["extract", SF_DIR, "-o", "md", "-n", "1"])
    assert r.exit_code == 0, r.output
    assert r.output.strip()  # one page's markdown


def test_extract_parquet_with_columns(runner, ray_session, tmp_path):
    out = tmp_path / "out"
    r = runner.invoke(
        c4r.cli,
        ["extract", SF_DIR, "-o", "parquet", "-O", str(out), "-n", "8",
         "-c", "columns=[url;text],citations=false"],
    )
    assert r.exit_code == 0, r.output
    import pyarrow.parquet as pq

    t = pq.read_table(str(out))
    assert t.num_rows == 8
    assert set(t.column_names) == {"url", "text"}


def test_extract_fit_markdown_bm25_filter(runner, ray_session, tmp_path):
    fcfg = tmp_path / "filter.yml"
    fcfg.write_text("type: bm25\nquery: example\nthreshold: 0.1\n")
    r = runner.invoke(
        c4r.cli, ["extract", SF_DIR, "-f", str(fcfg), "-o", "md-fit", "-n", "1"]
    )
    assert r.exit_code == 0, r.output


def test_extract_fit_markdown_default_pruning(runner, ray_session):
    r = runner.invoke(c4r.cli, ["extract", SF_DIR, "-o", "md-fit", "-n", "1"])
    assert r.exit_code == 0, r.output


def test_extract_structured_json(runner, ray_session, tmp_path):
    ecfg = tmp_path / "extract.json"
    ecfg.write_text('{"type": "json-css"}')
    schema = tmp_path / "schema.json"
    schema.write_text(json.dumps({
        "baseSelector": "p",
        "fields": [{"name": "txt", "selector": "", "type": "text"}],
    }))
    r = runner.invoke(
        c4r.cli,
        ["extract", SF_DIR, "-e", str(ecfg), "-s", str(schema), "-n", "2"],
    )
    assert r.exit_code == 0, r.output
    rows = json.loads(r.output)
    assert len(rows) == 2 and "extracted_content" in rows[0]


def test_extract_structured_requires_schema(runner, ray_session, tmp_path):
    ecfg = tmp_path / "extract.json"
    ecfg.write_text('{"type": "json-xpath"}')
    r = runner.invoke(c4r.cli, ["extract", SF_DIR, "-e", str(ecfg), "-n", "1"])
    assert r.exit_code != 0


def test_extract_llm_gate(runner, tmp_path):
    ecfg = tmp_path / "extract.json"
    ecfg.write_text('{"type": "llm"}')
    r = runner.invoke(c4r.cli, ["extract", SF_DIR, "-e", str(ecfg)])
    assert r.exit_code != 0
    assert "provider" in r.output.lower()
    ecfg.write_text('{"type": "llm", "provider": "x", "api_token": "y"}')
    r = runner.invoke(c4r.cli, ["extract", SF_DIR, "-e", str(ecfg)])
    assert r.exit_code != 0
    assert "client" in r.output.lower()


def test_pipeline_spec(runner, ray_session, tmp_path):
    spec = tmp_path / "spec.yml"
    spec.write_text(
        "- extract:\n    columns: [url, text, success]\n- filter_success\n- limit:\n    n: 5\n"
    )
    out = tmp_path / "out"
    r = runner.invoke(c4r.cli, ["pipeline", str(spec), SF_DIR, "-O", str(out)])
    assert r.exit_code == 0, r.output
    import pyarrow.parquet as pq

    assert pq.read_table(str(out)).num_rows == 5


def test_query_list_and_run(runner, ray_session):
    r = runner.invoke(c4r.cli, ["query"])
    assert r.exit_code == 0 and "extract_text" in r.output
    r = runner.invoke(c4r.cli, ["query", "link_stats", SF_DIR])
    assert r.exit_code == 0, r.output
    r = runner.invoke(c4r.cli, ["query", "not_a_query"])
    assert r.exit_code != 0


def test_crawl_command(runner, ray_session, tmp_path):
    # synthetic pages corpus via the flagship generator, then a 1-depth crawl
    from crawl4ai_custom_ray.pipelines.flagship import read_pages

    pages_dir = tmp_path / "pages"
    read_pages(SF_DIR).write_parquet(str(pages_dir))
    import pyarrow.parquet as pq

    seed = pq.read_table(str(pages_dir), columns=["url"])["url"][0].as_py()
    out = tmp_path / "visited"
    r = runner.invoke(
        c4r.cli,
        ["crawl", str(pages_dir), "-u", seed, "--max-depth", "1",
         "--max-pages", "5", "-O", str(out)],
    )
    assert r.exit_code == 0, r.output
    assert pq.read_table(str(out)).num_rows >= 1


def test_build_filter_chain_and_scorer():
    fc = c4r._build_filter_chain([
        {"type": "pattern", "patterns": ["*/articles/*"]},
        {"type": "domain", "blocked_domains": ["bad.example.com"]},
        {"type": "content-type", "allowed_types": ["text/html"]},
    ])
    assert fc.apply("https://a.example.com/articles/x")
    assert not fc.apply("https://bad.example.com/articles/x")
    sc = c4r._build_scorer({
        "type": "composite",
        "scorers": [
            {"type": "keyword", "keywords": ["articles"]},
            {"type": "path-depth", "optimal_depth": 2},
            {"type": "freshness"},
            {"type": "domain-authority", "domain_weights": {"a.example.com": 1.0}},
        ],
    })
    assert sc.score("https://a.example.com/articles/x") > 0
    with pytest.raises(click.ClickException):
        c4r._build_scorer({"type": "nope"})
    with pytest.raises(click.ClickException):
        c4r._build_filter_chain([{"type": "nope"}])


def test_crawl_command_with_config_strategies(runner, ray_session, tmp_path):
    from crawl4ai_custom_ray.pipelines.flagship import read_pages

    pages_dir = tmp_path / "pages"
    read_pages(SF_DIR).write_parquet(str(pages_dir))
    import pyarrow.parquet as pq

    seed = sorted(pq.read_table(str(pages_dir), columns=["url"])["url"].to_pylist())[0]
    cfg = tmp_path / "crawl.yml"
    cfg.write_text(
        "filter_chain:\n"
        "  - type: pattern\n"
        "    patterns: ['*/private/*']\n"
        "    reverse: true\n"
        "scorer:\n"
        "  type: keyword\n"
        "  keywords: [articles]\n"
    )
    out = tmp_path / "visited"
    r = runner.invoke(
        c4r.cli,
        ["crawl", str(pages_dir), "-u", seed, "--max-depth", "1",
         "-C", str(cfg), "-O", str(out)],
    )
    assert r.exit_code == 0, r.output
    df = pq.read_table(str(out)).to_pandas()
    assert len(df) > 0
    assert not df["url"].str.contains("/private/").any()
