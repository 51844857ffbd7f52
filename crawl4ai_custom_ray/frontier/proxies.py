"""Proxy rotation as data assignment.

The reference rotates proxies per fetch through
``config.proxy_rotation_strategy.get_next_proxy()``
(``async_webcrawler.py:297-307``) with ``RoundRobinProxyStrategy``
(``proxy_strategy.py:134-158``) cycling ``ProxyConfig`` objects
(``async_configs.py:224-295``).  In a batch engine the per-fetch
mutation becomes a column: :func:`assign_proxies` stamps each frontier
row with the proxy a live fetcher would use.

Rotation semantics under data parallelism: a literal round-robin over
an unordered distributed dataset is nondeterministic, so the batch
equivalent assigns ``hash(url) mod n_proxies`` — the same uniform
load-balancing intent, deterministic and reproducible across retries
and resumes (documented divergence from the reference's
iteration-order cycle).  A ``mode="round_robin"`` is still available
for single-batch/driver use where order is defined.
"""

from __future__ import annotations

from dataclasses import dataclass
from itertools import cycle

import pyarrow as pa

from ..urls import url_digest

__all__ = ["ProxyConfig", "RoundRobinProxyStrategy", "assign_proxies"]


@dataclass
class ProxyConfig:
    """Reference surface (async_configs.py:224-295)."""

    server: str
    username: str | None = None
    password: str | None = None
    ip: str | None = None

    def __post_init__(self):
        if self.ip is None:
            self.ip = self._extract_ip()

    def _extract_ip(self) -> str | None:
        try:
            host = self.server.split("://", 1)[1] if "://" in self.server else self.server
            return host.split(":")[0]
        except Exception:
            return None

    @staticmethod
    def from_string(proxy_str: str) -> "ProxyConfig":
        """Accepts the reference's formats: scheme URLs with or
        without ``user:pass@``, and colon forms ``ip:port`` /
        ``ip:port:user:pass``."""
        s = (proxy_str or "").strip()
        if "://" in s:
            if "@" in s:
                scheme, rest = s.split("://", 1)
                creds, server = rest.split("@", 1)
                user, _, pwd = creds.partition(":")
                return ProxyConfig(
                    server=f"{scheme}://{server}", username=user, password=pwd or None
                )
            return ProxyConfig(server=s)
        parts = s.split(":")
        if len(parts) == 4:
            ip, port, user, pwd = parts
            return ProxyConfig(server=f"http://{ip}:{port}", username=user, password=pwd)
        if len(parts) == 2:
            return ProxyConfig(server=f"http://{parts[0]}:{parts[1]}")
        raise ValueError(f"Invalid proxy string format: {proxy_str!r}")


class RoundRobinProxyStrategy:
    """Reference surface (proxy_strategy.py:134-158), synchronous."""

    def __init__(self, proxies: list[ProxyConfig] | None = None):
        self._proxies: list[ProxyConfig] = []
        self._cycle = None
        if proxies:
            self.add_proxies(proxies)

    def add_proxies(self, proxies: list[ProxyConfig]) -> None:
        self._proxies.extend(proxies)
        self._cycle = cycle(self._proxies)

    def get_next_proxy(self) -> ProxyConfig | None:
        if not self._cycle:
            return None
        return next(self._cycle)


def assign_proxies(
    ds,
    proxies: list[ProxyConfig | str],
    *,
    url_column: str = "url",
    mode: str = "hash",
):
    """Add a ``proxy`` column (the server string) to each row.

    ``mode="hash"`` (default, scale path): proxy = digest(url) mod n —
    deterministic, uniform, stable under retries/resume/partitioning.
    ``mode="round_robin"``: the reference's literal cycle, applied in
    row order WITHIN each batch (only meaningful when the caller
    controls batch order — single-block datasets)."""
    cfgs = [p if isinstance(p, ProxyConfig) else ProxyConfig.from_string(p) for p in proxies]
    if not cfgs:
        raise ValueError("assign_proxies needs at least one proxy")
    servers = [c.server for c in cfgs]
    n = len(servers)

    if mode == "hash":

        def fn(batch: pa.Table) -> pa.Table:
            urls = batch[url_column].to_pylist()
            assigned = [servers[url_digest(u) % n] for u in urls]
            return batch.append_column("proxy", pa.array(assigned, pa.string()))

    elif mode == "round_robin":

        def fn(batch: pa.Table) -> pa.Table:
            strat = RoundRobinProxyStrategy(cfgs)
            assigned = [strat.get_next_proxy().server for _ in range(batch.num_rows)]
            return batch.append_column("proxy", pa.array(assigned, pa.string()))

    else:
        raise ValueError(f"unknown mode {mode!r}")

    return ds.map_batches(fn, batch_format="pyarrow")
