"""``c4r`` — the engine's unified command-line surface.

Batch-engine equivalent of the reference's ``crwl`` console script
(reference ``cli.py:622-1395``): config-file + ``key=value`` composed
run configs, output-format selection, content-filter / extraction
strategy wiring, deep-crawl strategy choice, and a persisted global
config.  The browser/profile/CDP command groups are out of scope for a
batch engine (SURVEY.md §2.1); the crawl/extract/config/examples
surface is mirrored, with Parquet in place of live HTTP.

Commands::

    c4r extract SOURCE [-C cfg.yml] [-c k=v,...] [-f filter.yml]
                [-e extract.yml] [-s schema.json] [-o FORMAT] [-O out]
    c4r crawl PAGES --seeds URL... [--deep-crawl bfs|dfs|best-first]
    c4r pipeline SPEC.yml SOURCE -O outdir
    c4r query NAME [SF_DIR]          # any of the named driver queries
    c4r config list|get|set
    c4r examples

``SOURCE`` is a pages Parquet file/directory or an sf testdata dir
(containing ``documents.parquet`` — the synthetic pages corpus is
generated on the fly, as in ``pipelines/flagship.py``).

Value-parsing semantics of ``-c/-b key=value`` lists mirror the
reference's ``parse_key_values`` (``cli.py:108-131``): ``true``/
``false`` → bool, digits → int, x.y digits → float, ``[a,b]`` →
list of strings, ``{...}`` → JSON object; everything else stays a
string.  Config files may be YAML or JSON (``cli.py:133-143``).
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import click

try:  # pyyaml is optional at runtime; JSON configs always work
    import yaml
except ImportError:  # pragma: no cover
    yaml = None


# ------------------------------------------------------------------ config


def config_dir() -> Path:
    """Global-config directory (reference ``cli.py:43-52`` uses
    ``~/.crawl4ai``); override with ``C4R_CONFIG_DIR`` (tests, CI)."""
    return Path(os.environ.get("C4R_CONFIG_DIR", str(Path.home() / ".crawl4ai_ray")))


def get_global_config() -> dict:
    f = config_dir() / "global.yml"
    if not f.exists():
        return {}
    text = f.read_text()
    if yaml is not None:
        return yaml.safe_load(text) or {}
    return json.loads(text or "{}")


def save_global_config(cfg: dict) -> None:
    d = config_dir()
    d.mkdir(parents=True, exist_ok=True)
    f = d / "global.yml"
    if yaml is not None:
        f.write_text(yaml.dump(cfg))
    else:  # pragma: no cover
        f.write_text(json.dumps(cfg))


#: user-visible settings (reference ``config.py`` USER_SETTINGS shape)
USER_SETTINGS = {
    "VERBOSE": {"default": False, "type": "bool"},
    "NUM_CPUS": {"default": 8, "type": "int"},
    "DEFAULT_LLM_PROVIDER": {"default": None, "type": "str"},
    "DEFAULT_LLM_PROVIDER_TOKEN": {"default": None, "type": "str"},
}


# ------------------------------------------------------- value parsing


def parse_key_values(ctx, param, value):
    """Reference-parity ``k1=v1,k2=v2`` parser (``cli.py:108-131``).

    Same coercion rules and the same documented quirks (a ``,`` inside
    a JSON object value must not contain ``=``-free segments; negative
    numbers stay strings — the reference's ``isdigit`` path).
    """
    if not value:
        return {}
    result = {}
    for pair in value.split(","):
        try:
            k, v = pair.split("=", 1)
        except ValueError:
            raise click.BadParameter(f"Invalid key=value pair: {pair}")
        if v.lower() == "true":
            v = True
        elif v.lower() == "false":
            v = False
        elif v.isdigit():
            v = int(v)
        elif v.replace(".", "", 1).isdigit():
            v = float(v)
        elif v.startswith("[") and v.endswith("]"):
            v = [x.strip() for x in v[1:-1].split(";") if x.strip()]
        elif v.startswith("{") and v.endswith("}"):
            try:
                v = json.loads(v)
            except json.JSONDecodeError:
                raise click.BadParameter(f"Invalid JSON object: {v}")
        result[k.strip()] = v
    return result


def load_config_file(path: str | None) -> dict:
    """YAML-or-JSON config loader (reference ``cli.py:133-143``)."""
    if not path:
        return {}
    try:
        text = Path(path).read_text()
        if path.endswith((".yaml", ".yml")):
            if yaml is None:  # pragma: no cover
                raise RuntimeError("pyyaml not available; use JSON config")
            return yaml.safe_load(text) or {}
        return json.loads(text)
    except Exception as e:
        raise click.BadParameter(f"Error loading config file {path}: {e}")


def load_schema_file(path: str | None):
    if not path:
        return None
    return load_config_file(path)


# ------------------------------------------------------------- helpers


def _ensure_ray(num_cpus: int | None = None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus or int(get_global_config().get("NUM_CPUS", 8)),
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    return ray


def _read_source(source: str):
    """pages Dataset from a Parquet path or an sf testdata dir."""
    import ray

    if os.path.isdir(source) and os.path.exists(
        os.path.join(source, "documents.parquet")
    ):
        from .pipelines.flagship import read_pages

        return read_pages(source)
    return ray.data.read_parquet(source)


def _build_content_filter(filter_conf: dict):
    """Filter-config → content filter, mirroring the reference's
    mapping in ``crawl_cmd`` (``cli.py:1066-1089``)."""
    kind = filter_conf.get("type")
    if kind == "bm25":
        from .html.bm25 import BM25ContentFilter

        return BM25ContentFilter(
            user_query=filter_conf.get("query") or None,
            bm25_threshold=float(filter_conf.get("threshold", 1.0)),
        )
    if kind == "pruning":
        from .html.pruning import PruningContentFilter

        return PruningContentFilter(
            threshold=float(filter_conf.get("threshold", 0.48)),
            threshold_type=filter_conf.get("threshold_type", "fixed"),
        )
    raise click.ClickException(f"Invalid filter type: {kind!r} (pruning|bm25)")


def _extraction_engine(extract_conf: dict) -> str:
    """Extraction-config → selector engine name (reference
    ``cli.py:1129-1160`` maps json-css/json-xpath/llm)."""
    kind = extract_conf.get("type")
    if not kind:
        raise click.ClickException("Extraction type not specified")
    if kind not in ("llm", "json-css", "json-xpath"):
        raise click.ClickException(f"Invalid extraction type: {kind}")
    if kind == "llm":
        # honest gate: the chunk→prompt→parse→merge orchestration is
        # real (functions/llm.py) but needs an injected client; the
        # reference requires provider+api_token here (cli.py:1137-1139)
        # and builds a litellm client — no LLM SDK or network exists in
        # this environment.
        if not extract_conf.get("provider") or not extract_conf.get("api_token"):
            raise click.ClickException(
                "LLM provider and API token are required for LLM extraction"
            )
        raise click.ClickException(
            "LLM extraction needs an injected client in this environment: "
            "use functions.llm.llm_extract_stage(client=...) programmatically"
        )
    return "css" if kind == "json-css" else "xpath"


def _build_filter_chain(specs: list):
    """Filter-config list → FilterChain, the reference CLI's
    strategy-from-config pattern applied to the deep-crawl filters
    (reference filters are constructor-injected via config;
    SURVEY.md §2.7)."""
    from .frontier.filters import (
        ContentTypeFilter,
        DomainFilter,
        FilterChain,
        URLPatternFilter,
    )

    builders = {
        "pattern": lambda c: URLPatternFilter(
            c["patterns"], reverse=bool(c.get("reverse", False))
        ),
        "content-type": lambda c: ContentTypeFilter(c["allowed_types"]),
        "domain": lambda c: DomainFilter(
            allowed_domains=c.get("allowed_domains"),
            blocked_domains=c.get("blocked_domains"),
        ),
    }
    filters = []
    for spec in specs:
        kind = spec.get("type")
        if kind not in builders:
            raise click.ClickException(
                f"unknown filter type {kind!r} (pattern|content-type|domain)"
            )
        filters.append(builders[kind](spec))
    return FilterChain(filters)


def _build_scorer(spec: dict):
    """Scorer-config → URLScorer (keyword|path-depth|content-type|
    freshness|domain-authority|composite)."""
    from .frontier import scorers as sc

    builders = {
        "keyword": lambda c: sc.KeywordRelevanceScorer(
            keywords=c["keywords"], weight=c.get("weight", 1.0)
        ),
        "path-depth": lambda c: sc.PathDepthScorer(
            optimal_depth=c.get("optimal_depth", 3), weight=c.get("weight", 1.0)
        ),
        "content-type": lambda c: sc.ContentTypeScorer(
            type_weights=c["type_weights"], weight=c.get("weight", 1.0)
        ),
        "freshness": lambda c: sc.FreshnessScorer(
            weight=c.get("weight", 1.0), current_year=c.get("current_year", 2024)
        ),
        "domain-authority": lambda c: sc.DomainAuthorityScorer(
            domain_weights=c["domain_weights"], weight=c.get("weight", 1.0)
        ),
    }

    def build(c: dict):
        kind = c.get("type")
        if kind == "composite":
            return sc.CompositeScorer(
                [build(s) for s in c["scorers"]],
                normalize=bool(c.get("normalize", True)),
            )
        if kind not in builders:
            raise click.ClickException(
                f"unknown scorer type {kind!r} "
                "(keyword|path-depth|content-type|freshness|domain-authority|composite)"
            )
        return builders[kind](c)

    return build(spec)


def _emit(text: str, output_file: str | None) -> None:
    if output_file:
        Path(output_file).write_text(text)
    else:
        click.echo(text)


# ----------------------------------------------------------------- cli


@click.group(context_settings={"help_option_names": ["-h", "--help"]})
def cli():
    """c4r — Ray-Data crawl & extract engine."""


@cli.command("extract")
@click.argument("source", required=True)
@click.option("--crawler-config", "-C", type=click.Path(exists=True), help="Run config file (YAML/JSON)")
@click.option("--filter-config", "-f", type=click.Path(exists=True), help="Content filter config file")
@click.option("--extraction-config", "-e", type=click.Path(exists=True), help="Extraction strategy config file")
@click.option("--schema", "-s", type=click.Path(exists=True), help="JSON schema for extraction")
@click.option("--crawler", "-c", type=str, callback=parse_key_values, help="Run parameters as key1=value1,key2=value2")
@click.option("--output", "-o", type=click.Choice(["all", "json", "markdown", "md", "markdown-fit", "md-fit", "parquet"]), default="all")
@click.option("--output-file", "-O", type=click.Path(), help="Output file/dir (default: stdout)")
@click.option("--limit", "-n", type=int, default=None, help="Only the first N pages")
@click.option("--num-cpus", type=int, default=None)
@click.option("--verbose", "-v", is_flag=True)
def extract_cmd(source, crawler_config, filter_config, extraction_config, schema,
                crawler, output, output_file, limit, num_cpus, verbose):
    """Extract content from a pages table (the batch `crwl crawl`).

    Examples:  c4r extract pages/ -o md -n 1
               c4r extract sf0.001 -c "columns=[url;text],citations=false" -o parquet -O /tmp/out
    """
    cfg = dict(load_config_file(crawler_config))
    cfg.update(crawler)
    if get_global_config().get("VERBOSE"):
        verbose = True
    if verbose:
        click.echo(f"Run config: {cfg}", err=True)

    _ensure_ray(num_cpus)
    ds = _read_source(source)
    if limit:
        ds = ds.limit(limit)

    md_options = cfg.pop("markdown_options", None) or {}

    # structured extraction takes over the output, as in the reference
    # (extracted_content drives the "json" format, cli.py:1218-1222)
    if extraction_config:
        engine = _extraction_engine(load_config_file(extraction_config))
        schema_data = load_schema_file(schema)
        if not schema_data:
            raise click.ClickException("-s schema.json is required for structured extraction")
        from .functions.structured import extract_structured

        out_ds = extract_structured(ds, schema_data, engine=engine)
        if output == "parquet":
            if not output_file:
                raise click.ClickException("-O OUTDIR is required with -o parquet")
            out_ds.write_parquet(output_file)
            return
        _render_json_output(out_ds, output_file)
        return

    # fit-markdown via a configured content filter: the reference's
    # DefaultMarkdownGenerator(content_filter=...) path, run as one
    # stateless map_batches over (url, html)
    if filter_config or output in ("markdown-fit", "md-fit"):
        filter_conf = (
            load_config_file(filter_config)
            if filter_config
            else {"type": "pruning", "query": "", "threshold": 0.48}
        )

        def md_batch(batch, _conf=filter_conf, _opts=md_options):
            import pyarrow as pa

            from .html.markdown import generate_markdown

            cf = _build_content_filter(_conf)
            urls = batch["url"].to_pylist()
            htmls = batch["html"].to_pylist()
            rows = {"url": urls, "raw_markdown": [], "fit_markdown": []}
            for u, h in zip(urls, htmls):
                if isinstance(h, bytes):
                    h = h.decode("utf-8", errors="replace")
                r = generate_markdown(h, u, content_filter=cf, options=_opts)
                rows["raw_markdown"].append(r["raw_markdown"])
                rows["fit_markdown"].append(r["fit_markdown"])
            return pa.table(rows)

        out_ds = ds.map_batches(md_batch, batch_format="pyarrow")
        col = "fit_markdown" if output in ("markdown-fit", "md-fit") else "raw_markdown"
        if output == "parquet":
            out_ds.write_parquet(output_file or "c4r_out")
            return
        first = out_ds.take(1)
        _emit(first[0][col] if first else "", output_file)
        return

    # the flagship kernel path
    from .stages.extract import extract_pages

    extract_kwargs = {
        k: cfg[k]
        for k in ("columns", "citations", "compute_fit_html", "excluded_tags", "batch_size", "concurrency")
        if k in cfg
    }
    if md_options:
        extract_kwargs["markdown_options"] = md_options
    if output in ("markdown", "md"):
        extract_kwargs.setdefault("columns", ["raw_markdown"])
    out_ds = extract_pages(ds, **extract_kwargs)

    if output == "parquet":
        if not output_file:
            raise click.ClickException("-O OUTDIR is required with -o parquet")
        out_ds.write_parquet(output_file)
        return
    if output in ("markdown", "md"):
        first = out_ds.take(1)
        _emit(first[0]["raw_markdown"] if first else "", output_file)
        return
    # "all" → JSON records (reference dumps the model json, cli.py:1225)
    _render_json_output(out_ds, output_file)


def _render_json_output(out_ds, output_file: str | None) -> None:
    rows = out_ds.take_all()  # CLI print path: bounded by --limit
    text = json.dumps(rows, indent=2, ensure_ascii=False, default=str)
    _emit(text, output_file)


@cli.command("crawl")
@click.argument("pages", required=True)
@click.option("--seeds", "-u", multiple=True, required=True, help="Seed URLs")
@click.option("--deep-crawl", type=click.Choice(["bfs", "dfs", "best-first"]), default="bfs")
@click.option("--max-depth", type=int, default=2)
@click.option("--max-pages", type=int, default=None, help="Crawl budget")
@click.option("--crawler-config", "-C", type=click.Path(exists=True), help="CrawlConfig file (YAML/JSON)")
@click.option("--crawler", "-c", type=str, callback=parse_key_values, help="CrawlConfig fields as key1=value1,...")
@click.option("--checkpoint-dir", type=click.Path(), default=None)
@click.option("--resume", is_flag=True)
@click.option("--output-file", "-O", type=click.Path(), help="Write visited table (parquet dir)")
@click.option("--num-cpus", type=int, default=None)
def crawl_cmd(pages, seeds, deep_crawl, max_depth, max_pages, crawler_config,
              crawler, checkpoint_dir, resume, output_file, num_cpus):
    """Deep-crawl a pages table from seed URLs (BSP rounds).

    Example:  c4r crawl pages/ -u https://site0.example/ --deep-crawl best-first --max-pages 50
    """
    from .frontier.crawl import BFSCrawl, CrawlConfig

    fields = dict(load_config_file(crawler_config))
    fields.update(crawler)
    fields.setdefault("strategy", {"best-first": "best_first"}.get(deep_crawl, deep_crawl))
    fields.setdefault("max_depth", max_depth)
    if max_pages is not None:
        fields.setdefault("max_pages", max_pages)
    # declarative filter/scorer specs → strategy objects (the crwl
    # config-to-strategy pattern, reference cli.py:1066-1160)
    if isinstance(fields.get("filter_chain"), list):
        fields["filter_chain"] = _build_filter_chain(fields["filter_chain"])
    if isinstance(fields.get("scorer"), dict):
        fields["scorer"] = _build_scorer(fields["scorer"])
    known = {f for f in CrawlConfig.__dataclass_fields__}
    bad = set(fields) - known
    if bad:
        raise click.ClickException(f"Unknown CrawlConfig fields: {sorted(bad)}")
    cfg = CrawlConfig(**fields)

    _ensure_ray(num_cpus)
    driver = BFSCrawl(pages, cfg, checkpoint_dir)
    try:
        visited = driver.run(list(seeds), resume=resume)
        if output_file:
            visited.write_parquet(output_file)
            click.echo(f"visited table → {output_file}", err=True)
        else:
            for row in visited.take(50):
                click.echo(json.dumps(row, default=str))
    finally:
        driver.shutdown()


@cli.command("pipeline")
@click.argument("spec", type=click.Path(exists=True), required=True)
@click.argument("source", required=True)
@click.option("--output-file", "-O", type=click.Path(), required=True, help="Output parquet dir")
@click.option("--num-cpus", type=int, default=None)
def pipeline_cmd(spec, source, output_file, num_cpus):
    """Run a declared step pipeline (YAML list of steps) over SOURCE.

    Spec file format (the steps registry, pipelines/steps.py):

    \b
        - extract:
            columns: [url, text]
        - filter_success
        - limit:
            n: 100
    """
    from .pipelines.steps import build_pipeline

    raw = load_config_file(spec)
    if not isinstance(raw, list):
        raise click.ClickException("pipeline spec must be a YAML/JSON list of steps")
    items = []
    for entry in raw:
        if isinstance(entry, str):
            items.append(entry)
        elif isinstance(entry, dict) and len(entry) == 1:
            name, options = next(iter(entry.items()))
            items.append((name, options or {}))
        else:
            raise click.ClickException(f"bad step entry: {entry!r}")
    pipe = build_pipeline(items)

    _ensure_ray(num_cpus)
    ds = pipe(_read_source(source))
    ds.write_parquet(output_file)
    click.echo(f"pipeline output → {output_file}", err=True)


@cli.command("query")
@click.argument("name", required=False)
@click.argument("sf_dir", required=False, default="/root/testdata/sf0.001")
@click.option("--output-file", "-O", type=click.Path(), default=None)
@click.option("--num-cpus", type=int, default=None)
def query_cmd(name, sf_dir, output_file, num_cpus):
    """Run a named driver query; with no NAME, list all queries."""
    queries = _query_registry()
    if not name:
        for q in sorted(queries):
            click.echo(q)
        return
    if name not in queries:
        raise click.ClickException(f"unknown query {name!r} (run `c4r query` to list)")
    _ensure_ray(num_cpus)
    result = queries[name](sf_dir)
    df = _as_pandas(result)
    if output_file:
        df.to_parquet(output_file)
    else:
        click.echo(df.head(50).to_string())


def _query_registry() -> dict:
    """The named driver queries.  Uses the driver contract module when
    importable (repo root on sys.path) and falls back to introspecting
    the ``q_*`` functions of :mod:`crawl4ai_custom_ray.queries`."""
    try:
        import __ray_entry__

        return __ray_entry__.queries()
    except ImportError:
        from . import queries as q

        return {
            name[2:]: fn
            for name, fn in vars(q).items()
            if name.startswith("q_") and callable(fn)
        }


def _as_pandas(result):
    import pandas as pd

    if isinstance(result, pd.DataFrame):
        return result
    # pa.Table and ray Dataset both expose to_pandas()
    return result.to_pandas()


@cli.group("config")
def config_cmd():
    """Manage global configuration (reference ``cli.py:1262-1352``)."""


@config_cmd.command("list")
def config_list_cmd():
    cfg = get_global_config()
    for key, meta in USER_SETTINGS.items():
        val = cfg.get(key, meta["default"])
        click.echo(f"{key} = {val}")


@config_cmd.command("get")
@click.argument("key", required=True)
def config_get_cmd(key):
    key = key.upper()
    if key not in USER_SETTINGS:
        raise click.ClickException(f"unknown setting {key!r}")
    cfg = get_global_config()
    click.echo(f"{key} = {cfg.get(key, USER_SETTINGS[key]['default'])}")


@config_cmd.command("set")
@click.argument("key", required=True)
@click.argument("value", required=True)
def config_set_cmd(key, value):
    key = key.upper()
    if key not in USER_SETTINGS:
        raise click.ClickException(f"unknown setting {key!r}")
    kind = USER_SETTINGS[key]["type"]
    if kind == "bool":
        value = value.lower() in ("true", "1", "yes")
    elif kind == "int":
        value = int(value)
    cfg = get_global_config()
    cfg[key] = value
    save_global_config(cfg)
    click.echo(f"{key} = {value}")


@cli.command("examples")
def examples_cmd():
    """Show usage examples."""
    click.echo(EXAMPLES)


EXAMPLES = """\
c4r — examples

# Extract every page of a Parquet pages table to markdown records
c4r extract /data/pages -o parquet -O /data/extracted -c "columns=[url;raw_markdown;text]"

# One page's markdown to stdout
c4r extract /data/pages -o md -n 1

# Fit markdown through a BM25 content filter
c4r extract /data/pages -f filter.yml -o md-fit -n 1
#   filter.yml:  {type: bm25, query: "ray data", threshold: 1.0}

# Structured extraction with a JSON-CSS schema
c4r extract /data/pages -e extract.yml -s schema.json -o json
#   extract.yml: {type: json-css}

# Deep crawl (best-first, 50-page budget) with checkpoints
c4r crawl /data/pages -u https://site0.example/ --deep-crawl best-first \\
    --max-pages 50 --checkpoint-dir /tmp/ckpt -O /tmp/visited

# Declared pipeline over an sf dir
c4r pipeline spec.yml /root/testdata/sf0.001 -O /tmp/out

# Global settings
c4r config set verbose true && c4r config list
"""


def main():  # console entry point
    cli()


if __name__ == "__main__":
    main()
