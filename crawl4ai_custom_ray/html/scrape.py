"""The scrape kernel: (url, html) → cleaned_html + links + media +
metadata + tables.

Mirrors the reference ``LXMLWebScrapingStrategy._scrap``
(``crawl4ai/content_scraping_strategy.py:594-896``) step order exactly:

1. parse document;
2. optional exclude-all-images / comment removal / excluded_tags /
   remove_forms;
3. metadata extraction (BEFORE script/style removal);
4. remove ``script style link meta noscript``;
5. link + media walk (``_process_element``,
   ``content_scraping_strategy.py:231-378``): honor ``<base href>``,
   normalize each ``a[@href]`` against the page URL, first-wins dedup
   per page, internal/external split by registrable domain, optional
   external/social exclusion with DOM removal; image scoring
   (``process_image`` :410-515, threshold ``IMAGE_SCORE_THRESHOLD=2``);
6. table extraction (``DefaultTableExtraction``);
7. base64 ``src`` strip;
8. ``remove_empty_elements_fast(body, 1)`` (:517-554) — bottom-up
   removal of childless elements under the word threshold, with a
   bypass tag set;
9. ``remove_unwanted_attributes_fast`` (:556-591) — keep only
   ``IMPORTANT_ATTRS = [src, href, alt, title, width, height]``
   (``config.py:50``), optionally ``data-*``;
10. serialize → ``cleaned_html``.

Difference vs reference: serialization is this kernel's own compact
deterministic writer (dom.py) rather than lxml's
``pretty_print=True`` — lxml is not available here, and byte-level
determinism of *our* kernel (same input → same bytes, stable across
processes/nodes) is the invariant the pipeline tests enforce.
"""

from __future__ import annotations

import re

from ..urls import get_base_domain, is_external_url, normalize_url
from .dom import CommentNode, Element, TextNode, parse
from .metadata import extract_metadata
from .tables import extract_tables

IMPORTANT_ATTRS = frozenset({"src", "href", "alt", "title", "width", "height"})
IMAGE_SCORE_THRESHOLD = 2

_BASE64_RE = re.compile(r"data:image/[^;]+;base64,")
_IMAGE_FORMATS = ("jpg", "jpeg", "png", "webp", "avif", "gif")

# Bypass set of remove_empty_elements_fast (content_scraping_strategy.py:522-536)
_EMPTY_BYPASS_TAGS = frozenset(
    {"a", "img", "br", "hr", "input", "meta", "link", "source", "track", "wbr", "tr", "td", "th"}
)

SOCIAL_MEDIA_DOMAINS = [
    "facebook.com",
    "twitter.com",
    "x.com",
    "linkedin.com",
    "instagram.com",
    "pinterest.com",
    "tiktok.com",
    "snapchat.com",
    "reddit.com",
]


def parse_srcset(srcset: str) -> list[dict]:
    """``srcset`` → [{url, width}] (reference
    ``content_scraping_strategy.py:42-59``)."""
    out = []
    for part in srcset.split(","):
        part = part.strip()
        if not part:
            continue
        pieces = part.split()
        url = pieces[0]
        width = None
        if len(pieces) > 1 and pieces[1].endswith("w"):
            width = pieces[1][:-1]
        out.append({"url": url, "width": width})
    return out


def _remove_all(root: Element, tags) -> None:
    for el in root.find_all(tags):
        el.decompose()


def _remove_comments(root: Element) -> None:
    stack = [root]
    while stack:
        el = stack.pop()
        el.children = [c for c in el.children if not isinstance(c, CommentNode)]
        stack.extend(el.child_elements())


def _score_image(img: Element, index: int, total_images: int, threshold: int) -> list[dict] | None:
    style = img.get("style", "") or ""
    alt = img.get("alt", "") or ""
    src = img.get("src", "") or ""
    data_src = img.get("data-src", "") or ""
    srcset = img.get("srcset", "") or ""
    data_srcset = img.get("data-srcset", "") or ""

    if "display:none" in style:
        return None
    parent = img.parent
    if parent is not None and parent.tag in ("button", "input"):
        return None
    parent_classes = (parent.get("class", "") or "").split() if parent is not None else []
    if any(("button" in c or "icon" in c or "logo" in c) for c in parent_classes):
        return None
    if (src and any(c in src for c in ("button", "icon", "logo"))) or (
        alt and any(c in alt for c in ("button", "icon", "logo"))
    ):
        return None

    score = 0
    width = img.get("width")
    if width and width.isdigit() and int(width) > 150:
        score += 1
    height = img.get("height")
    if height and height.isdigit() and int(height) > 150:
        score += 1
    if alt:
        score += 1
    score += int(index / total_images < 0.5)

    detected_format = None
    for candidate in (src, data_src, srcset, data_srcset):
        if candidate:
            matches = [f for f in _IMAGE_FORMATS if f in candidate.lower()]
            if matches:
                detected_format = matches[0]
                score += 1
                break

    if srcset or data_srcset:
        score += 1

    picture_el = None
    anc = img.parent
    while anc is not None:
        if isinstance(anc, Element) and anc.tag == "picture":
            picture_el = anc
            break
        anc = anc.parent
    if picture_el is not None:
        score += 1

    if score <= threshold:
        return None

    unique_urls: set[str] = set()
    variants: list[dict] = []
    base_info = {
        "alt": alt,
        "desc": "",
        "score": score,
        "type": "image",
        "group_id": index,
        "format": detected_format,
    }

    def add_variant(u: str, w: str | None = None) -> None:
        if u and not u.startswith("data:") and u not in unique_urls:
            unique_urls.add(u)
            variant = dict(base_info, src=u)
            if w:
                variant["width"] = w
            variants.append(variant)

    add_variant(src)
    add_variant(data_src)
    for srcset_attr in (srcset, data_srcset):
        if srcset_attr:
            for source in parse_srcset(srcset_attr):
                add_variant(source["url"], source["width"])
    # picture-element source variants (reference :500-505)
    if picture_el is not None:
        for source_el in picture_el.find_all("source"):
            source_srcset = source_el.get("srcset")
            if source_srcset:
                for source in parse_srcset(source_srcset):
                    add_variant(source["url"], source["width"])
    for attr, value in img.attrs.items():
        if attr.startswith("data-") and ("src" in attr or "srcset" in attr) and "http" in (value or ""):
            add_variant(value)

    return variants or None


def _collect_and_clean(body: Element, remove_tags, wanted) -> dict[str, list]:
    """ONE pre-order walk of the tree: elements whose tag is in
    ``remove_tags`` are decomposed (their subtrees are never descended
    into — identical to removing them in a prior pass), every other
    element with a tag in ``wanted`` is bucketed.  Replaces the 3-4
    separate full-tree ``find_all`` walks that dominated kernel
    profiles."""
    buckets: dict[str, list] = {t: [] for t in wanted}
    to_remove: list[Element] = []
    stack = list(body.children)
    stack.reverse()
    while stack:
        c = stack.pop()
        if type(c) is Element:
            t = c.tag
            if t in remove_tags:
                to_remove.append(c)
                continue
            b = buckets.get(t)
            if b is not None:
                b.append(c)
            grand = c.children
            for i in range(len(grand) - 1, -1, -1):
                stack.append(grand[i])
    for el in to_remove:
        el.decompose()
    return buckets


def _is_attached(el: Element, root: Element) -> bool:
    anc = el
    while anc.parent is not None:
        anc = anc.parent
    return anc is root


def _process_links_and_media(
    url: str,
    body: Element,
    media: dict,
    internal_links: dict,
    external_links: dict,
    *,
    base_domain: str,
    exclude_external_links: bool = False,
    exclude_domains: set | None = None,
    image_score_threshold: int = IMAGE_SCORE_THRESHOLD,
    page_context: dict | None = None,
    buckets: dict[str, list] | None = None,
) -> None:
    exclude_domains = exclude_domains or set()

    # honor <base href> for relative resolution (reference :246-252)
    base_el = None
    head = body.find("head") if body.tag == "[document]" else None
    for candidate in (head or body).find_all("base"):
        if candidate.get("href"):
            base_el = candidate
            break
    if base_el is not None:
        base_href = (base_el.get("href") or "").strip()
        if base_href:
            url = base_href

    if buckets is None:
        buckets = {"a": [], "img": [], "video": [], "audio": []}
        for el in body.find_all(("a", "img", "video", "audio")):
            buckets[el.tag].append(el)
    anchors = buckets["a"]
    images = buckets["img"]
    videos = buckets["video"]
    audios = buckets["audio"]

    # repeated hrefs (nav bars, pagination) dominate pages; memoize the
    # urlparse-heavy helpers per page
    norm_cache: dict[str, str | None] = {}
    dom_cache: dict[str, str] = {}
    ext_cache: dict[str, bool] = {}

    for link in anchors:
        href = (link.get("href") or "").strip()
        if not href:
            continue
        if href in norm_cache:
            normalized = norm_cache[href]
        else:
            normalized = norm_cache[href] = normalize_url(href, url)
        if normalized is None:
            continue
        link_data = {
            "href": normalized,
            "text": link.get_text().strip(),
            "title": (link.get("title") or "").strip(),
            "base_domain": base_domain,
            "intrinsic_score": 0,
        }
        if page_context is not None:
            from .link_scoring import calculate_link_intrinsic_score

            link_data["intrinsic_score"] = calculate_link_intrinsic_score(
                link_text=link_data["text"],
                url=normalized,
                title_attr=link_data["title"],
                class_attr=link.get("class", "") or "",
                rel_attr=link.get("rel", "") or "",
                page_context=page_context,
            )
        if normalized in ext_cache:
            is_ext = ext_cache[normalized]
        else:
            is_ext = ext_cache[normalized] = is_external_url(normalized, base_domain)
        if is_ext:
            if normalized in dom_cache:
                link_base_domain = dom_cache[normalized]
            else:
                link_base_domain = dom_cache[normalized] = get_base_domain(normalized)
            link_data["base_domain"] = link_base_domain
            if exclude_external_links or link_base_domain in exclude_domains:
                link.decompose()
                continue
            if normalized not in external_links:
                external_links[normalized] = link_data
        else:
            if normalized not in internal_links:
                internal_links[normalized] = link_data

    total = len(images)
    for i, img in enumerate(images):
        variants = _score_image(img, i, total, image_score_threshold)
        if variants:
            media["images"].extend(variants)

    for els, tag, key in ((videos, "video", "videos"), (audios, "audio", "audios")):
        for el in els:
            src = el.get("src") or ""
            if not src:
                source = el.find("source")
                src = source.get("src") if source is not None else ""
            if src:
                media[key].append(
                    {"src": src, "alt": el.get("alt", "") or "", "type": tag, "desc": ""}
                )
    return images


def remove_empty_elements(root: Element, word_count_threshold: int = 1) -> None:
    """Bottom-up single-pass removal of childless elements whose text
    falls under the word threshold (reference :517-554)."""
    descendants: list[Element] = []
    stack = list(root.child_elements())
    while stack:
        el = stack.pop()
        descendants.append(el)
        stack.extend(el.child_elements())
    # reference iterates reversed(iterdescendants()) — children before
    # parents, so an element emptied by a child's removal is itself
    # removed in the same pass (cascade)
    for el in reversed(descendants):
        if el.tag in _EMPTY_BYPASS_TAGS:
            continue
        if el.child_elements():
            continue
        if word_count_threshold == 1:
            # fast path: <1 word ⇔ no non-whitespace text at all
            if el.text_length(strip=True) == 0:
                el.decompose()
        elif len(el.get_text().strip().split()) < word_count_threshold:
            el.decompose()


def remove_unwanted_attributes(root: Element, keep_data_attributes: bool = False) -> None:
    stack = [root]
    while stack:
        el = stack.pop()
        el.attrs = {
            k: v
            for k, v in el.attrs.items()
            if k in IMPORTANT_ATTRS or (keep_data_attributes and k.startswith("data-"))
        }
        stack.extend(el.child_elements())


def scrape(
    url: str,
    html: str,
    **kwargs,
) -> dict | None:
    """Parse + run the scrape kernel (see :func:`scrape_tree`)."""
    if not html:
        return None
    return scrape_tree(url, parse(html), **kwargs)


def scrape_tree(
    url: str,
    root,
    *,
    excluded_tags: list[str] | None = None,
    remove_comments: bool = False,
    remove_forms: bool = False,
    exclude_all_images: bool = False,
    exclude_external_links: bool = False,
    exclude_social_media_links: bool = False,
    exclude_domains: list[str] | None = None,
    keep_data_attributes: bool = False,
    extract_tables_flag: bool = True,
    table_score_threshold: float = 7,
    image_score_threshold: int = IMAGE_SCORE_THRESHOLD,
    serialize_cleaned: bool = True,
    score_links: bool = False,
    only_text: bool = False,
) -> dict | None:
    """Run the full scrape kernel over an already-parsed tree
    (MUTATES it). Returns ``{cleaned_html, success, media, links,
    metadata, tree}``; ``serialize_cleaned=False`` skips building the
    cleaned_html string when the caller only needs the tree."""
    body = root  # reference uses the whole document, not just <body> (:608)
    base_domain = get_base_domain(url)

    # page context for link scoring — BEFORE any removals (:615-640)
    page_context = None
    if score_links:
        from .link_scoring import extract_page_context

        title_el = root.find("title")
        page_title = title_el.get_text() if title_el is not None else ""
        headlines = " ".join(
            el.get_text().strip()
            for el in root.find_all(("h1", "h2", "h3"))
            if el.get_text().strip()
        )
        meta_desc = ""
        for meta in root.find_all("meta"):
            if meta.get("name") == "description" and meta.get("content"):
                meta_desc = meta.get("content")
                break
        page_context = extract_page_context(page_title, headlines, meta_desc, url)

    if exclude_all_images:
        _remove_all(body, "img")
    if remove_comments:
        _remove_comments(body)

    excluded = set(excluded_tags or [])
    if excluded:
        _remove_all(body, excluded)

    # metadata BEFORE meta/script removal (:676-683)
    metadata = extract_metadata(root)

    domains = set(exclude_domains or [])
    if exclude_social_media_links:
        domains.update(SOCIAL_MEDIA_DOMAINS)

    # ONE walk: drop the boilerplate subtrees AND bucket every
    # link/media/table element (replaces 3 full-tree find_all passes)
    remove_tags = {"script", "style", "link", "meta", "noscript"}
    if remove_forms:
        remove_tags.add("form")
    buckets = _collect_and_clean(
        body, remove_tags, ("a", "img", "video", "audio", "table")
    )

    media: dict = {"images": [], "videos": [], "audios": [], "tables": []}
    internal_links: dict = {}
    external_links: dict = {}
    page_images = _process_links_and_media(
        url,
        body,
        media,
        internal_links,
        external_links,
        base_domain=base_domain,
        exclude_external_links=exclude_external_links,
        exclude_domains=domains,
        image_score_threshold=image_score_threshold,
        page_context=page_context,
        buckets=buckets,
    )

    if extract_tables_flag and "table" not in excluded:
        tables = buckets["table"]
        if (exclude_external_links or domains) and tables:
            # excluded-external anchors were decomposed above; a table
            # nested inside one must not be extracted
            tables = [t for t in tables if _is_attached(t, body)]
        media["tables"] = extract_tables(
            body, threshold=table_score_threshold, tables=tables
        )

    # only_text: flatten eligible inline tags to their text
    # (reference :747-755, after the link/media walk)
    if only_text:
        from .textutils import flatten_inline_tags

        flatten_inline_tags(body)

    # reuse the media walk's img list (detached nodes harmless)
    for img in page_images:
        src = img.get("src", "") or ""
        if _BASE64_RE.match(src):
            img.attrs["src"] = _BASE64_RE.sub("", src)

    remove_empty_elements(body, 1)
    remove_unwanted_attributes(body, keep_data_attributes)

    if serialize_cleaned:
        cleaned_html = (
            body.serialize_contents().strip()
            if body.tag == "[document]"
            else body.serialize().strip()
        )
    else:
        cleaned_html = ""

    return {
        "tree": root,
        "cleaned_html": cleaned_html,
        "success": True,
        "media": media,
        "links": {
            "internal": list(internal_links.values()),
            "external": list(external_links.values()),
        },
        "metadata": metadata,
    }
