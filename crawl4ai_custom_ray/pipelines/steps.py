"""Pipeline-step API: the engine's user-extension surface.

The reference's plug points are strategy ABCs injected via config
(SURVEY.md §2.11: ``ContentScrapingStrategy``,
``MarkdownGenerationStrategy``, ``RelevantContentFilter``,
``ChunkingStrategy``, ``ExtractionStrategy``, hooks, ``CrawlerHub``).
In a Dataset engine the equivalent plug point is a **step**: a named
``Dataset → Dataset`` callable.  Steps compose left-to-right into
pipelines; a registry maps names to factories so pipelines are
declarable as data (the CLI / config analogue of the reference's
``crwl`` YAML configs).

    from crawl4ai_custom_ray.pipelines.steps import build_pipeline
    pipe = build_pipeline([
        ("extract", {"columns": ["text"]}),
        ("filter_success", {}),
    ])
    out = pipe(read_pages(sf_dir))

Custom steps register with :func:`register_step`; hooks (the
reference's ``set_hook`` lifecycle points) are just steps placed
before/after the stage they wrap.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc

StepFactory = Callable[..., Callable]

_REGISTRY: dict[str, StepFactory] = {}


def register_step(name: str, factory: StepFactory | None = None):
    """Register a step factory (usable as a decorator)."""
    if factory is not None:
        _REGISTRY[name] = factory
        return factory

    def deco(fn: StepFactory) -> StepFactory:
        _REGISTRY[name] = fn
        return fn

    return deco


def available_steps() -> list[str]:
    return sorted(_REGISTRY)


def make_step(name: str, **options) -> Callable:
    if name not in _REGISTRY:
        raise KeyError(f"unknown step {name!r}; available: {available_steps()}")
    return _REGISTRY[name](**options)


def compose(*steps: Callable) -> Callable:
    def pipeline(ds):
        for step in steps:
            ds = step(ds)
        return ds

    return pipeline


def build_pipeline(spec: list) -> Callable:
    """``[(name, options), ...]`` (or bare names) → composed pipeline."""
    steps = []
    for item in spec:
        if isinstance(item, str):
            steps.append(make_step(item))
        else:
            name, options = item
            steps.append(make_step(name, **(options or {})))
    return compose(*steps)


# ----------------------------------------------------- built-in steps


@register_step("extract")
def _extract_step(**options):
    from ..stages.extract import extract_pages

    return lambda ds: extract_pages(ds, **options)


@register_step("filter_success")
def _filter_success(**_):
    return lambda ds: ds.map_batches(
        lambda t: t.filter(t["success"]), batch_format="pyarrow"
    )


@register_step("language_id")
def _language_id(**options):
    from ..functions.textstats import language_id

    return lambda ds: language_id(ds, **options)


@register_step("filter_lang")
def _filter_lang(lang: str = "en", column: str = "pred_lang", **_):
    return lambda ds: ds.map_batches(
        lambda t: t.filter(pc.equal(t[column], lang)), batch_format="pyarrow"
    )


@register_step("regex_extract")
def _regex_extract(labels=("email",), **options):
    from ..functions.regex_extract import regex_extract

    return lambda ds: regex_extract(ds, list(labels), **options)


@register_step("structured_extract")
def _structured(schema: dict | None = None, **options):
    from ..functions.structured import extract_structured

    if schema is None:
        raise ValueError("structured_extract step needs schema=")
    return lambda ds: extract_structured(ds, schema, **options)


@register_step("chunk")
def _chunk(kind: str = "fixed", **options):
    from ..functions import chunkers

    cls = {
        "identity": chunkers.IdentityChunking,
        "regex": chunkers.RegexChunking,
        "sentence": chunkers.RegexSentenceChunking,
        "fixed": chunkers.FixedLengthWordChunking,
        "sliding": chunkers.SlidingWindowChunking,
        "overlapping": chunkers.OverlappingWindowChunking,
    }[kind]
    chunker_opts = {k: v for k, v in options.items() if k not in ("id_column", "text_column")}
    ds_opts = {k: v for k, v in options.items() if k in ("id_column", "text_column")}
    return lambda ds: chunkers.chunk_dataset(ds, cls(**chunker_opts), **ds_opts)


@register_step("dedup_exact")
def _dedup_exact(id_column: str = "url", text_column: str = "text", **options):
    """Composable exact dedup: keeps each content hash's winner ROW
    with all its columns (a semi-join of the input against the
    winner ids), so downstream steps keep working."""

    def step(ds):
        from ..functions.dedup import (
            _coalesce_for_join,
            _join_partitions,
            exact_dedup,
        )

        winners, n = _coalesce_for_join(
            exact_dedup(
                ds, id_column=id_column, text_column=text_column, **options
            ).select_columns([id_column])
        )
        if n == 0:
            return winners
        src, _ = _coalesce_for_join(ds)
        return src.join(
            winners,
            join_type="inner",
            num_partitions=_join_partitions(8),
            on=(id_column,),
        )

    return step


@register_step("media_features")
def _media_features(**options):
    from ..functions.multimodal import extract_media_features

    return lambda ds: extract_media_features(ds, **options)


@register_step("select")
def _select(columns=None, **_):
    if not columns:
        raise ValueError("select step requires columns=[...]")
    return lambda ds: ds.select_columns(list(columns))


@register_step("limit")
def _limit(n: int = 100, **_):
    return lambda ds: ds.limit(n)
