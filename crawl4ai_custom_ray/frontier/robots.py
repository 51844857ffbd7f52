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

from urllib.robotparser import RobotFileParser

import pyarrow as pa
import ray

DEFAULT_SYNTHETIC_RULES = "User-agent: *\nDisallow: /private/\n"


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
        return parser.can_fetch(self.user_agent, url)

    def allowed_many(self, urls: list[str], hosts: list[str]) -> list[bool]:
        return [self.can_fetch(u, h) for u, h in zip(urls, hosts)]

    def broadcast(self):
        """ray.put the gate once; pass the ref into batch fns."""
        return ray.put(self)
