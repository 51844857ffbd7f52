"""Page-metadata extraction (title/description/keywords/author +
og:/twitter:/article: metas).

Mirrors the reference's ``extract_metadata_using_lxml``
(``crawl4ai/utils.py:1497-1580``): title from ``<title>`` with
og:title / twitter:title fallback; description/keywords/author from
named metas inside ``<head>``; every ``og:*`` / ``twitter:*`` /
``article:*`` meta copied through verbatim when both name and content
are non-empty.
"""

from __future__ import annotations

from .dom import Element


def extract_metadata(root: Element) -> dict:
    metadata: dict[str, str | None] = {}
    head = root.find("head")
    if head is None:
        return metadata

    head_metas = head.find_all("meta")

    title_el = head.find("title")
    title = title_el.get_text() if title_el is not None else None
    if not title:
        title_el = root.find("title")
        title = title_el.get_text() if title_el is not None else None
    if not title:
        for sel_attr, sel_val in (("property", "og:title"), ("name", "twitter:title")):
            for meta in root.find_all("meta"):
                if meta.get(sel_attr) == sel_val and meta.get("content"):
                    title = meta.get("content")
                    break
            if title:
                break
    metadata["title"] = title.strip() if title else None

    def head_meta(name: str) -> str | None:
        for meta in head_metas:
            if meta.get("name") == name and meta.get("content") is not None:
                return meta.get("content").strip()
        return None

    metadata["description"] = head_meta("description")
    metadata["keywords"] = head_meta("keywords")
    metadata["author"] = head_meta("author")

    for meta in head_metas:
        prop = (meta.get("property") or "").strip()
        name = (meta.get("name") or "").strip()
        content = (meta.get("content") or "").strip()
        if not content:
            continue
        if prop.startswith("og:") or prop.startswith("article:"):
            metadata[prop] = content
        elif name.startswith("twitter:"):
            metadata[name] = content

    return metadata
