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
