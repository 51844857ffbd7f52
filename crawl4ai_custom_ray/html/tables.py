"""Data-table detection + extraction.

Mirrors the reference ``DefaultTableExtraction``
(``crawl4ai/table_extraction.py:66-296``): a layout-vs-data scoring
pass (thead +2, tbody +1, th +2(+1), nested table −3,
role=presentation/none −3, column-count variance<1 +2, caption +2,
summary +1, text/tag ratio +2/+3, data-* attrs +0.5 each, ≥2 avg cols
with ≥2 rows +2; threshold 7) followed by header/row extraction with
colspan duplication, row padding to header width and ``Column i``
default names.
"""

from __future__ import annotations

from .dom import Element


def _text(el: Element) -> str:
    return el.get_text().strip()


def _survey_table(table: Element):
    """One pre-order walk of the subtree → (tag-presence/counts,
    rows, n_elements).  Same element sets the per-tag ``find_all``
    calls would produce (pre-order, nested tables included)."""
    has = {"thead": 0, "tbody": 0, "th": 0, "caption": 0, "table": 0}
    rows: list[Element] = []
    n_elements = 0
    stack = list(table.children)
    stack.reverse()
    while stack:
        c = stack.pop()
        if type(c) is Element:
            n_elements += 1
            t = c.tag
            if t in has:
                has[t] += 1
            elif t == "tr":
                rows.append(c)
            grand = c.children
            for i in range(len(grand) - 1, -1, -1):
                stack.append(grand[i])
    return has, rows, n_elements


def is_data_table(table: Element, threshold: float = 7) -> bool:
    score = 0.0

    has, rows, n_elements = _survey_table(table)
    if has["thead"]:
        score += 2
    if has["tbody"]:
        score += 1

    th_count = has["th"]
    if th_count > 0:
        score += 2
        first_row_th = bool(rows and rows[0].find_all("th"))
        if has["thead"] or first_row_th:
            score += 1

    if has["table"]:
        score -= 3

    if (table.get("role") or "").lower() in {"presentation", "none"}:
        score -= 3

    if not rows:
        return False

    row_cells = [r.find_all(("td", "th")) for r in rows]
    col_counts = [len(cells) for cells in row_cells]
    if col_counts:
        avg = sum(col_counts) / len(col_counts)
        variance = sum((c - avg) ** 2 for c in col_counts) / len(col_counts)
        if variance < 1:
            score += 2

    if has["caption"]:
        score += 2
    if table.get("summary"):
        score += 1

    total_text = sum(len(_text(cell)) for cells in row_cells for cell in cells)
    total_tags = n_elements
    text_ratio = total_text / (total_tags + 1e-5)
    if text_ratio > 20:
        score += 3
    elif text_ratio > 10:
        score += 2

    score += 0.5 * sum(1 for a in table.attrs if a.startswith("data-"))

    if col_counts and len(rows) >= 2:
        if sum(col_counts) / len(col_counts) >= 2:
            score += 2

    return score >= threshold


def _colspan(cell: Element) -> int:
    try:
        return max(1, int(cell.get("colspan", "1")))
    except (TypeError, ValueError):
        return 1


def extract_table_data(table: Element) -> dict:
    caption_el = table.find("caption")
    caption = _text(caption_el) if caption_el is not None else ""
    summary = (table.get("summary") or "").strip()

    headers: list[str] = []
    thead = table.find("thead")
    thead_rows = thead.find_all("tr") if thead is not None else []
    all_rows = table.find_all("tr")
    if thead_rows:
        for cell in thead_rows[0].find_all("th"):
            headers.extend([_text(cell)] * _colspan(cell))
    elif all_rows:
        for cell in all_rows[0].find_all(("th", "td")):
            headers.extend([_text(cell)] * _colspan(cell))

    rows: list[list[str]] = []
    for row in all_rows:
        anc = row.parent
        in_thead = False
        while anc is not None:
            if isinstance(anc, Element) and anc.tag == "thead":
                in_thead = True
                break
            anc = anc.parent
        if in_thead:
            continue
        row_data: list[str] = []
        for cell in row.find_all("td"):
            row_data.extend([_text(cell)] * _colspan(cell))
        if row_data:
            rows.append(row_data)

    max_columns = len(headers) if headers else (max((len(r) for r in rows), default=0))
    aligned = [r[:max_columns] + [""] * (max_columns - len(r)) for r in rows]
    if not headers and max_columns > 0:
        headers = [f"Column {i + 1}" for i in range(max_columns)]

    first_row_th = bool(all_rows and all_rows[0].find_all("th"))
    metadata: dict = {
        "row_count": len(aligned),
        "column_count": max_columns,
        "has_headers": bool(thead_rows) or first_row_th,
        "has_caption": bool(caption),
        "has_summary": bool(summary),
    }
    if table.get("id"):
        metadata["id"] = table.get("id")
    if table.get("class"):
        metadata["class"] = table.get("class")

    return {
        "headers": headers,
        "rows": aligned,
        "caption": caption,
        "summary": summary,
        "metadata": metadata,
    }


def extract_tables(
    element: Element,
    threshold: float = 7,
    min_rows: int = 0,
    min_cols: int = 0,
    tables: list[Element] | None = None,
) -> list[dict]:
    """``tables``: pre-collected candidate elements (document order) —
    skips the discovery walk when the caller already walked the tree."""
    out = []
    for table in element.find_all("table") if tables is None else tables:
        if not is_data_table(table, threshold):
            continue
        data = extract_table_data(table)
        if min_rows > 0 and len(data["rows"]) < min_rows:
            continue
        if min_cols > 0:
            ncols = len(data["headers"]) or (max((len(r) for r in data["rows"]), default=0))
            if ncols < min_cols:
                continue
        out.append(data)
    return out
