"""URL scorers — produce the frontier ``score`` column.

Mirrors the reference ``deep_crawling/scorers.py`` (~520 LoC):

- :class:`KeywordRelevanceScorer` (:160-188): matched-keyword fraction
  (substring, case-insensitive by default);
- :class:`PathDepthScorer` (:190-245): ``1/(1+|depth-optimal|)`` with
  the reference's lookup table for distances 0..3;
- :class:`ContentTypeScorer` (:247-330): extension→score map with
  regex fallback;
- :class:`FreshnessScorer` (:332-412): latest year in the URL →
  decay table ``[1.0, .9, .8, .7, .6, .5]``, then ``1−0.1·diff``
  floored at 0.1; no year → 0.5;
- :class:`DomainAuthorityScorer` (:414-519): domain→weight dict with
  default;
- :class:`CompositeScorer` (:91-158): weighted sum, optionally
  normalized by scorer count.

All scorers expose ``score(url)`` (reference parity: raw score ×
weight) and ``score_many(urls)`` for the Ray batch path.  The
reference's per-instance ``lru_cache`` is unnecessary here — batch
application amortizes the call overhead.
"""

from __future__ import annotations

import re

_SCORE_LOOKUP = (1.0, 0.5, 1.0 / 3.0, 0.25)
_FRESHNESS_SCORES = (1.0, 0.9, 0.8, 0.7, 0.6, 0.5)


class URLScorer:
    def __init__(self, weight: float = 1.0):
        self.weight = weight

    def _calculate_score(self, url: str) -> float:  # pragma: no cover
        raise NotImplementedError

    def score(self, url: str) -> float:
        return self.weight * self._calculate_score(url)

    def score_many(self, urls: list[str]) -> list[float]:
        w = self.weight
        calc = self._calculate_score
        return [w * calc(u) for u in urls]


class KeywordRelevanceScorer(URLScorer):
    def __init__(self, keywords: list[str], weight: float = 1.0, case_sensitive: bool = False):
        super().__init__(weight)
        self.case_sensitive = case_sensitive
        self.keywords = [k if case_sensitive else k.lower() for k in keywords]

    def _calculate_score(self, url: str) -> float:
        if not self.case_sensitive:
            url = url.lower()
        if not self.keywords:
            return 0.0
        matches = sum(1 for k in self.keywords if k in url)
        return matches / len(self.keywords)


class PathDepthScorer(URLScorer):
    def __init__(self, optimal_depth: int = 3, weight: float = 1.0):
        super().__init__(weight)
        self.optimal_depth = optimal_depth

    @staticmethod
    def _depth(url: str) -> int:
        pos = url.find("/", url.find("://") + 3)
        if pos == -1:
            return 0
        path = url[pos:]
        if not path or path == "/":
            return 0
        return len([seg for seg in path.split("/") if seg])

    def _calculate_score(self, url: str) -> float:
        distance = abs(self._depth(url) - self.optimal_depth)
        if distance < 4:
            return _SCORE_LOOKUP[distance]
        return 1.0 / (1.0 + distance)


class ContentTypeScorer(URLScorer):
    def __init__(self, type_weights: dict[str, float], weight: float = 1.0):
        super().__init__(weight)
        self._exact: dict[str, float] = {}
        self._regex: list[tuple[re.Pattern, float]] = []
        for pattern, score in type_weights.items():
            if pattern.startswith(".") and pattern.endswith("$"):
                self._exact[pattern[1:-1]] = score
            else:
                self._regex.append((re.compile(pattern), score))
        self._regex.sort(key=lambda x: -x[1])

    @staticmethod
    def _extension(url: str) -> str:
        pos = url.rfind(".")
        if pos == -1:
            return ""
        end = len(url)
        for i in range(pos + 1, len(url)):
            if url[i] in "?#;" or not url[i].isalnum():
                end = i
                break
        return url[pos + 1 : end].lower()

    def _calculate_score(self, url: str) -> float:
        ext = self._extension(url)
        if ext:
            score = self._exact.get(ext)
            if score is not None:
                return score
        for pattern, score in self._regex:
            if pattern.search(url):
                return score
        return 0.0


class FreshnessScorer(URLScorer):
    _DATE_RE = re.compile(
        r"(?:/|[-_])((?:19|20)\d{2})(?:(?:/|[-_])(?:\d{2})(?:(?:/|[-_])(?:\d{2}))?)?"
    )

    def __init__(self, weight: float = 1.0, current_year: int = 2024):
        super().__init__(weight)
        self.current_year = current_year

    def _extract_year(self, url: str) -> int | None:
        latest = None
        for m in self._DATE_RE.finditer(url):
            year = int(m.group(1))
            if year <= self.current_year and (latest is None or year > latest):
                latest = year
        return latest

    def _calculate_score(self, url: str) -> float:
        year = self._extract_year(url)
        if year is None:
            return 0.5
        diff = self.current_year - year
        if diff < len(_FRESHNESS_SCORES):
            return _FRESHNESS_SCORES[diff]
        return max(0.1, 1.0 - diff * 0.1)


class DomainAuthorityScorer(URLScorer):
    def __init__(
        self,
        domain_weights: dict[str, float],
        default_weight: float = 0.5,
        weight: float = 1.0,
    ):
        super().__init__(weight)
        self.domain_weights = {d.lower(): s for d, s in domain_weights.items()}
        self.default_weight = default_weight

    @staticmethod
    def _domain(url: str) -> str:
        start = url.find("://")
        start = 0 if start == -1 else start + 3
        end = len(url)
        for i in range(start, len(url)):
            if url[i] in "/?#":
                end = i
                break
        domain = url[start:end]
        port = domain.rfind(":")
        if port != -1:
            domain = domain[:port]
        return domain.lower()

    def _calculate_score(self, url: str) -> float:
        return self.domain_weights.get(self._domain(url), self.default_weight)


class CompositeScorer(URLScorer):
    def __init__(self, scorers: list[URLScorer], normalize: bool = True):
        super().__init__(1.0)
        self.scorers = scorers
        self.normalize = normalize

    def _calculate_score(self, url: str) -> float:
        total = sum(s.score(url) for s in self.scorers)
        if self.normalize and self.scorers:
            return total / len(self.scorers)
        return total

    def score_many(self, urls: list[str]) -> list[float]:
        if not self.scorers:
            return [0.0] * len(urls)
        totals = [0.0] * len(urls)
        for s in self.scorers:
            for i, v in enumerate(s.score_many(urls)):
                totals[i] += v
        if self.normalize:
            n = len(self.scorers)
            totals = [t / n for t in totals]
        return totals
