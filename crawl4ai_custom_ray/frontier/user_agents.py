"""Deterministic user-agent rotation + client-hints derivation — the
batch-side counterpart of the reference's UA machinery
(``user_agent_generator.py``): random rotation becomes a seedless
md5 pick so every shard assigns identically, and the Sec-CH-UA
header is derived with behavior parity to the reference's
``UAGen.generate_client_hints`` (``user_agent_generator.py:24-66``):
Chromium+brand hints for Chrome (Microsoft Edge sub-brand when Edg/
is present), ``'""'`` for Firefox (which doesn't send Sec-CH-UA),
Safari's own format, empty string when no browser token matches.

The catalog entries are standard public UA string shapes (not the
reference's scraped lists)."""

from __future__ import annotations

import re

import pyarrow as pa

DEFAULT_UA_CATALOG: tuple[str, ...] = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.0.0",
    "Mozilla/5.0 (X11; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
    "(KHTML, like Gecko) Version/17.1 Safari/605.1.15",
)

_BROWSER_PATTERNS = {
    "chrome": re.compile(r"Chrome/(\d+)"),
    "edge": re.compile(r"Edg/(\d+)"),
    "safari": re.compile(r"Version/(\d+)"),
    "firefox": re.compile(r"Firefox/(\d+)"),
}


def generate_client_hints(user_agent: str) -> str:
    """Sec-CH-UA header for ``user_agent`` — behavior parity with the
    reference's rule set (same branch order and brand strings)."""
    found = {
        name: m.group(1)
        for name, rx in _BROWSER_PATTERNS.items()
        if (m := rx.search(user_agent))
    }
    hints: list[str] = []
    if "chrome" in found:
        hints.append(f'"Chromium";v="{found["chrome"]}"')
        hints.append('"Not_A Brand";v="8"')
        if "edge" in found:
            hints.append(f'"Microsoft Edge";v="{found["edge"]}"')
        else:
            hints.append(f'"Google Chrome";v="{found["chrome"]}"')
    elif "firefox" in found:
        return '""'
    elif "safari" in found:
        hints.append(f'"Safari";v="{found["safari"]}"')
        hints.append('"Not_A Brand";v="8"')
    return ", ".join(hints)


def ua_assign(ds, *, url_column: str = "url", catalog=DEFAULT_UA_CATALOG):
    """Per-URL deterministic UA assignment: md5(url) % len(catalog)
    picks the agent (shard-stable — no coordination, any worker
    computes the same answer), plus the derived Sec-CH-UA.  Stateless
    vectorized pass."""
    from ..functions.curation import _md5_u64

    cat = list(catalog)
    hints = [generate_client_hints(u) for u in cat]

    def assign(batch: pa.Table) -> pa.Table:
        idxs = [
            _md5_u64(u) % len(cat) for u in batch[url_column].to_pylist()
        ]
        return pa.table(
            {
                url_column: batch[url_column],
                "ua_idx": pa.array(idxs, pa.int64()),
                "user_agent": pa.array([cat[i] for i in idxs], pa.string()),
                "sec_ch_ua": pa.array([hints[i] for i in idxs], pa.string()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")
