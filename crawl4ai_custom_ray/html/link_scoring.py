"""Intrinsic link-quality scoring.

Mirrors the reference ``extract_page_context``
(``crawl4ai/utils.py:3216-3260``) and
``calculate_link_intrinsic_score`` (``utils.py:3261-3375``): a fast,
string-only quality score (0..10) from link attributes, URL structure,
anchor-text quality and term overlap with the page's title/headlines/
meta-description.  Wired into the scrape kernel's link walk behind
``score_links`` (reference ``content_scraping_strategy.py:274-290``).
"""

from __future__ import annotations

from urllib.parse import urlparse

_PUNCT = '.,!?;:"()[]{}'

_NAV_CLASSES = ("nav", "menu", "primary", "main", "important")
_BAD_CLASSES = ("ad", "sponsor", "track", "promo", "banner")
_GOOD_RELS = ("canonical", "next", "prev", "chapter")
_BAD_RELS = ("nofollow", "sponsored", "ugc")
_GOOD_PATHS = ("/docs/", "/api/", "/guide/", "/tutorial/", "/reference/", "/manual/")
_MEDIUM_PATHS = ("/blog/", "/article/", "/post/", "/news/")
_BAD_PATHS = ("/admin/", "/login/", "/cart/", "/checkout/", "/track/", "/click/")
_GENERIC_TEXTS = ("click here", "read more", "more info", "link", "here")
_DOCS_INDICATORS = ("docs.", "api.", "developer.", "reference.")
_DOC_KEYWORDS = ("api", "reference", "guide", "tutorial", "example")


def _terms(text: str) -> set[str]:
    return {
        w.strip(_PUNCT)
        for w in text.lower().split()
        if len(w.strip(_PUNCT)) > 2
    }


def extract_page_context(
    page_title: str, headlines_text: str, meta_description: str, base_url: str
) -> dict:
    context = {
        "terms": set(),
        "headlines": headlines_text or "",
        "meta_description": meta_description or "",
        "domain": "",
        "is_docs_site": False,
    }
    try:
        parsed = urlparse(base_url)
        context["domain"] = parsed.netloc.lower()
        context["is_docs_site"] = any(i in context["domain"] for i in _DOCS_INDICATORS)
        all_text = (
            (page_title or "") + " " + context["headlines"] + " " + context["meta_description"]
        )
        context["terms"] = _terms(all_text)
    except Exception:
        pass
    return context


def calculate_link_intrinsic_score(
    link_text: str,
    url: str,
    title_attr: str,
    class_attr: str,
    rel_attr: str,
    page_context: dict,
) -> float:
    score = 0.0
    try:
        if title_attr and len(title_attr.strip()) > 3:
            score += 1.0

        class_str = (class_attr or "").lower()
        if any(c in class_str for c in _NAV_CLASSES):
            score += 1.5
        if any(c in class_str for c in _BAD_CLASSES):
            score -= 1.0

        rel_str = (rel_attr or "").lower()
        if any(r in rel_str for r in _GOOD_RELS):
            score += 1.0
        if any(r in rel_str for r in _BAD_RELS):
            score -= 0.5

        url_lower = url.lower()
        if any(p in url_lower for p in _GOOD_PATHS):
            score += 2.0
        elif any(p in url_lower for p in _MEDIUM_PATHS):
            score += 1.0
        if any(p in url_lower for p in _BAD_PATHS):
            score -= 1.5

        url_depth = url.count("/") - 2
        if url_depth <= 2:
            score += 1.0
        elif url_depth > 5:
            score -= 0.5

        if url.startswith("https://"):
            score += 0.5

        if link_text:
            text_clean = link_text.strip()
            if len(text_clean) > 3:
                score += 1.0
            word_count = len(text_clean.split())
            if word_count >= 2:
                score += 0.5
            if word_count >= 4:
                score += 0.5
            if text_clean.lower() in _GENERIC_TEXTS:
                score -= 1.0

        if page_context.get("terms") and link_text:
            link_words = _terms(link_text)
            if link_words:
                overlap = len(link_words & page_context["terms"])
                if overlap > 0:
                    score += (overlap / min(len(link_words), 10)) * 2.0

        if page_context.get("is_docs_site") and link_text:
            if any(k in link_text.lower() for k in _DOC_KEYWORDS):
                score += 1.0
    except Exception:
        score = 0.5

    return max(0.0, min(score, 10.0))
