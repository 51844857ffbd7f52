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


def is_data_table(table: Element, threshold: float = 7) -> bool:
    score = 0.0

    has_thead = bool(table.find_all("thead"))
    has_tbody = bool(table.find_all("tbody"))
    if has_thead:
        score += 2
    if has_tbody:
        score += 1

    th_count = len(table.find_all("th"))
    rows = table.find_all("tr")
    if th_count > 0:
        score += 2
        first_row_th = bool(rows and rows[0].find_all("th"))
        if has_thead or first_row_th:
            score += 1

    if table.find_all("table"):
        score -= 3

    if (table.get("role") or "").lower() in {"presentation", "none"}:
        score -= 3

    if not rows:
        return False

    col_counts = [len(r.find_all(("td", "th"))) for r in rows]
    if col_counts:
        avg = sum(col_counts) / len(col_counts)
        variance = sum((c - avg) ** 2 for c in col_counts) / len(col_counts)
        if variance < 1:
            score += 2

    if table.find_all("caption"):
        score += 2
    if table.get("summary"):
        score += 1

    total_text = sum(len(_text(cell)) for r in rows for cell in r.find_all(("td", "th")))
    total_tags = sum(1 for _ in table.iter()) - 1
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
) -> list[dict]:
    out = []
    for table in element.find_all("table"):
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
