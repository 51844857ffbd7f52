"""Test-only loader for the reference's vendored html2text fork.

The fork (`/root/reference/crawl4ai/html2text/`) is pure stdlib and
imports standalone when given a stub parent package — we load it
READ-ONLY as the byte-parity oracle for the markdown engine.  It is
never imported by library code and never copied into the repo.
"""

from __future__ import annotations

import importlib.util
import sys
import types

_REF = "/root/reference/crawl4ai/html2text"


def load_fork():
    if "crawl4ai.html2text" in sys.modules:
        return sys.modules["crawl4ai.html2text"]
    if "crawl4ai" not in sys.modules:
        stub = types.ModuleType("crawl4ai")
        stub.__path__ = ["/root/reference/crawl4ai"]
        sys.modules["crawl4ai"] = stub
    spec = importlib.util.spec_from_file_location(
        "crawl4ai.html2text",
        _REF + "/__init__.py",
        submodule_search_locations=[_REF],
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["crawl4ai.html2text"] = mod
    spec.loader.exec_module(mod)
    return mod


def reference_markdown(html: str, baseurl: str = "") -> str:
    """raw markdown exactly as DefaultMarkdownGenerator produces it
    (markdown_generation_strategy.py:180-214): CustomHTML2Text with the
    generator defaults, then the fence-dedent post-replace."""
    mod = load_fork()
    h = mod.CustomHTML2Text(baseurl=baseurl)
    h.update_params(
        body_width=0,
        ignore_emphasis=False,
        ignore_links=False,
        ignore_images=False,
        protect_links=False,
        single_line_break=True,
        mark_code=True,
        escape_snob=False,
    )
    try:
        raw = h.handle(html)
    except Exception as e:  # the generator catches everything (:211)
        raw = f"Error converting HTML to markdown: {str(e)}"
    return raw.replace("    ```", "```")


def reference_markdown_with(html: str, baseurl: str = "", **overrides) -> str:
    """Like :func:`reference_markdown` but with generator-default
    params overridden — models DefaultMarkdownGenerator(options={...})
    merging user options over its defaults
    (markdown_generation_strategy.py:181-204)."""
    mod = load_fork()
    h = mod.CustomHTML2Text(baseurl=baseurl)
    params = dict(
        body_width=0,
        ignore_emphasis=False,
        ignore_links=False,
        ignore_images=False,
        protect_links=False,
        single_line_break=True,
        mark_code=True,
        escape_snob=False,
    )
    params.update(overrides)
    h.update_params(**params)
    try:
        raw = h.handle(html)
    except Exception as e:
        raw = f"Error converting HTML to markdown: {str(e)}"
    return raw.replace("    ```", "```")
