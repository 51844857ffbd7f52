"""Named-crawler registry — the reference ``CrawlerHub`` shape.

The reference (``hub.py:12-68``) auto-discovers ``BaseCrawler``
subclasses from ``crawl4ai/crawlers/<name>/crawler.py``, attaches the
module's ``__meta__`` dict, and serves them by name.  This is the
batch-engine equivalent: a crawler is a named, versioned pipeline
entry point whose ``run`` takes a corpus directory (plus kwargs) and
returns a ``ray.data.Dataset`` — the browser drive of the reference's
bundled crawlers is replaced by Dataset stages over fetched pages.

    from crawl4ai_custom_ray.pipelines.hub import CrawlerHub
    crawler = CrawlerHub.get("site_search")()
    results = crawler.run(sf_dir, query="stream join")

Third-party crawlers register either by dropping a package under
``crawl4ai_custom_ray/crawlers/<name>/crawler.py`` or explicitly via
``CrawlerHub.register("name")``.
"""

from __future__ import annotations

import importlib
import inspect
import logging
from abc import ABC, abstractmethod
from pathlib import Path

logger = logging.getLogger(__name__)


class BaseCrawler(ABC):
    """Interface contract for hub crawlers (reference ``hub.py:12-35``,
    minus the async requirement — batch pipelines are synchronous
    drivers of lazy Datasets)."""

    meta: dict = {}

    def __init__(self):
        self.logger = logging.getLogger(self.__class__.__name__)

    @abstractmethod
    def run(self, source: str = "", **kwargs):
        """Return a ``ray.data.Dataset`` of results for ``source``
        (a corpus directory / parquet path) and crawler kwargs."""

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        # validate the subclass's run() shape at class-creation time:
        # it must accept a positional source argument after self, and
        # must be a plain function (batch pipelines drive lazy
        # Datasets synchronously; there is no event loop here)
        try:
            params = list(inspect.signature(cls.run).parameters.values())
        except (TypeError, ValueError):
            params = []
        positional = [
            p
            for p in params
            if p.kind
            in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD, p.VAR_POSITIONAL)
        ]
        if len(positional) < 2:  # fewer than (self, source)
            raise TypeError(
                f"{cls.__name__} must implement 'run(self, source: str, **kwargs)'"
            )
        if inspect.iscoroutinefunction(cls.run):
            raise TypeError(
                f"{cls.__name__}.run must be synchronous (batch engine)"
            )


class CrawlerHub:
    _crawlers: dict[str, type[BaseCrawler]] = {}

    @classmethod
    def _discover_crawlers(cls):
        base_path = Path(__file__).parent.parent / "crawlers"
        if not base_path.is_dir():
            return
        for crawler_dir in sorted(base_path.iterdir()):
            if crawler_dir.is_dir() and (crawler_dir / "crawler.py").exists():
                try:
                    module = importlib.import_module(
                        f"crawl4ai_custom_ray.crawlers.{crawler_dir.name}.crawler"
                    )
                    for attr in dir(module):
                        cls._maybe_register_crawler(
                            getattr(module, attr), crawler_dir.name
                        )
                except Exception as e:  # mirror the reference: warn, skip
                    logger.warning("Failed %s: %s", crawler_dir.name, e)

    @classmethod
    def _maybe_register_crawler(cls, obj, name: str):
        if (
            isinstance(obj, type)
            and issubclass(obj, BaseCrawler)
            and obj is not BaseCrawler
        ):
            module = importlib.import_module(obj.__module__)
            obj.meta = getattr(module, "__meta__", {})
            cls._crawlers[name] = obj

    @classmethod
    def get(cls, name: str) -> type[BaseCrawler] | None:
        if not cls._crawlers:
            cls._discover_crawlers()
        return cls._crawlers.get(name)

    @classmethod
    def available(cls) -> list[str]:
        if not cls._crawlers:
            cls._discover_crawlers()
        return sorted(cls._crawlers)

    @classmethod
    def register(cls, name: str):
        """Decorator for explicit (non-directory) registration."""

        def deco(obj: type[BaseCrawler]) -> type[BaseCrawler]:
            cls._maybe_register_crawler(obj, name)
            if name not in cls._crawlers:
                raise TypeError(f"{obj!r} is not a BaseCrawler subclass")
            return obj

        return deco
