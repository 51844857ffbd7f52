"""robots.txt evaluation as a broadcast filter.

The reference fetches robots.txt per domain with a SQLite cache
(``RobotsParser``, ``crawl4ai/utils.py:252-377``: 7-day TTL,
allow-on-error) and gates each ``arun`` on ``can_fetch``.  In the
batch engine robots rules are a small per-host table, fetched once per
round for new hosts, broadcast via ``ray.put`` and evaluated inside
``map_batches`` with stdlib ``urllib.robotparser`` — no shuffle.

The synthetic corpus ships one rule set per host:
``Disallow: /private/`` (matching the generator's ``/private/``
pages), so the gate's effect has an exact SQL oracle
(``url NOT LIKE '%/private/%'``).
"""

from __future__ import annotations

import re
from urllib.parse import quote, unquote, urlparse, urlunparse
from urllib.robotparser import RobotFileParser

import pyarrow as pa
import ray

DEFAULT_SYNTHETIC_RULES = "User-agent: *\nDisallow: /private/\n"


def _rule_applies(rule_path: str, filename: str) -> bool:
    """Wildcard-aware rule-path match, behavior-parity with the
    reference's robotparser patch (``utils.py:53-73``): a path
    containing ``*`` (or its percent-encoding ``%2A``) matches as a
    glob anchored at the start, with a trailing ``$`` meaning
    end-of-string; plain paths keep stdlib prefix semantics."""
    if "*" in rule_path or "%2A" in rule_path or rule_path in ("*", "%2A"):
        pattern = re.escape(rule_path.replace("%2A", "*")).replace("\\*", ".*")
        pattern = "^" + pattern
        if pattern.endswith("\\$"):
            pattern = pattern[:-2] + "$"
        try:
            return bool(re.match(pattern, filename))
        except re.error:
            pass
    # stdlib RuleLine.applies_to: "*" matches everything, else prefix
    return rule_path == "*" or filename.startswith(rule_path)


def _wildcard_can_fetch(parser: RobotFileParser, useragent: str, url: str) -> bool:
    """``RobotFileParser.can_fetch`` with :func:`_rule_applies` in
    place of the stdlib prefix match.  Mirrors the stdlib's url
    normalization and entry selection exactly (first matching
    user-agent entry, else the ``*`` default entry; first applicable
    rule line wins; empty-path rules allow)."""
    if parser.disallow_all:
        return False
    if parser.allow_all:
        return True
    if not parser.mtime():
        return False
    parsed_url = urlparse(unquote(url))
    path = urlunparse(
        ("", "", parsed_url.path, parsed_url.params, parsed_url.query, parsed_url.fragment)
    )
    path = quote(path) or "/"
    for entry in parser.entries:
        if entry.applies_to(useragent):
            return _entry_allowance(entry, path)
    if parser.default_entry:
        return _entry_allowance(parser.default_entry, path)
    return True


def _entry_allowance(entry, filename: str) -> bool:
    for line in entry.rulelines:
        # (an empty Disallow parses to path "" + allowance True — the
        # prefix branch matches it against everything, as stdlib does)
        if _rule_applies(line.path, filename):
            return line.allowance
    return True


def build_robots_table(hosts: list[str], rules: str = DEFAULT_SYNTHETIC_RULES) -> pa.Table:
    """(host, rules) table — the robots cache in Parquet-able form
    (reference SQLite schema utils.py:267-275)."""
    return pa.table(
        {
            "host": pa.array(sorted(set(hosts)), pa.string()),
            "rules": pa.array([rules] * len(set(hosts)), pa.string()),
        }
    )


class RobotsGate:
    """Broadcast robots evaluator.

    Build once on the driver from the rules table; workers fetch the
    rules dict from the object store once per task (``ray.put`` /
    ``ray.get``) and evaluate locally.  Hosts without rules are
    allowed (the reference's allow-on-error behavior).
    """

    def __init__(self, rules_by_host: dict[str, str], user_agent: str = "*"):
        self.user_agent = user_agent
        self._rules_by_host = rules_by_host
        self._parsers: dict[str, RobotFileParser | None] = {}

    @classmethod
    def from_table(cls, table: pa.Table, user_agent: str = "*") -> "RobotsGate":
        return cls(
            dict(zip(table["host"].to_pylist(), table["rules"].to_pylist())), user_agent
        )

    def _parser_for(self, host: str) -> RobotFileParser | None:
        if host not in self._parsers:
            rules = self._rules_by_host.get(host)
            if rules is None:
                self._parsers[host] = None
            else:
                p = RobotFileParser()
                p.parse(rules.splitlines())
                self._parsers[host] = p
        return self._parsers[host]

    def can_fetch(self, url: str, host: str) -> bool:
        parser = self._parser_for(host)
        if parser is None:
            return True
        return _wildcard_can_fetch(parser, self.user_agent, url)

    def allowed_many(self, urls: list[str], hosts: list[str]) -> list[bool]:
        return [self.can_fetch(u, h) for u, h in zip(urls, hosts)]

    def crawl_delay(self, host: str) -> int | None:
        """Integer ``Crawl-delay`` for this gate's user-agent, or None.
        Stdlib semantics (``RobotFileParser.crawl_delay``): only
        integer values inside a matching entry are honored; a
        ``Request-rate: r/s`` without a crawl-delay maps to ``s // r``
        seconds between requests (the standard interpretation)."""
        parser = self._parser_for(host)
        if parser is None:
            return None
        d = parser.crawl_delay(self.user_agent)
        if d is not None:
            return int(d)
        rate = parser.request_rate(self.user_agent)
        if rate is not None and rate.requests > 0:
            return rate.seconds // rate.requests
        return None

    def host_budget(
        self, host: str, *, round_seconds: int, default_cap: int
    ) -> int:
        """Per-round fetch budget a polite crawler gets for ``host``:
        ``min(default_cap, round_seconds // delay)``, or the cap when
        no delay is declared — the data-movement form of the
        reference's per-domain ``RateLimiter`` pacing
        (``async_dispatcher.py``): instead of sleeping between
        requests, the round simply selects at most that many URLs."""
        d = self.crawl_delay(host)
        if d is None or d <= 0:
            return default_cap
        return min(default_cap, round_seconds // d)

    def broadcast(self):
        """ray.put the gate once; pass the ref into batch fns."""
        return ray.put(self)
