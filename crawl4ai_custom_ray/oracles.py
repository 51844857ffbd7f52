"""DuckDB oracle SQL for each named query in :mod:`queries`.

The driver runs the Ray pipeline and this SQL side-by-side on the same
inputs and compares row counts + schema + order-insensitive value
hashes.  The synthetic pages parquet is not a pre-registered view, so
these oracles read it via ``read_parquet('<path>')`` — the path is
resolved (and the file generated) when :func:`oracle_sql_for` is
called.

The only URL normalization the synthetic corpus exercises is the
tracking-parameter link (``?utm_source=feed&utm_campaign=cN&b=2&a=1``
→ ``?a=1&b=2``), replicated here with ``regexp_replace`` so the link
oracles stay exact.
"""

from __future__ import annotations

from .sources.pages import pages_parquet_path

_LINKS_CTE = """
WITH hrefs AS (
    SELECT url AS src_url,
           unnest(regexp_extract_all(decode(html), 'href="([^"]+)"', 1)) AS raw
    FROM read_parquet('{path}')
),
links AS (
    SELECT DISTINCT src_url,
           regexp_replace(raw, '\\?utm_source=feed&utm_campaign=c[0-9]+&b=2&a=1$', '?a=1&b=2') AS href,
           raw NOT LIKE '%external-site.org%' AS internal
    FROM hrefs
)
"""


def oracle_sql_for(sf_dir: str) -> dict[str, str]:
    path = pages_parquet_path(sf_dir)

    return {
        "extract_text": f"SELECT url, text FROM read_parquet('{path}')",
        "extract_links": _LINKS_CTE.format(path=path)
        + "SELECT src_url, href, internal FROM links",
        "link_stats": _LINKS_CTE.format(path=path)
        + """
            SELECT regexp_extract(src_url, 'https://([^/]+)/', 1) AS host,
                   COUNT(DISTINCT src_url) AS n_pages,
                   COUNT(*) AS n_links
            FROM links GROUP BY host
        """,
        "page_metadata": f"""
            SELECT url,
                   regexp_extract(decode(html), '<title>([^<]*)</title>', 1) AS title,
                   regexp_extract(decode(html), 'name="description" content="([^"]*)"', 1) AS description
            FROM read_parquet('{path}')
        """,
        "page_tables": f"""
            SELECT url,
                   CAST(len(regexp_extract_all(decode(html), '<table')) AS INTEGER) AS n_tables,
                   CAST(len(regexp_extract_all(decode(html), '<tr>'))
                        - len(regexp_extract_all(decode(html), '<thead>')) AS INTEGER) AS n_table_rows
            FROM read_parquet('{path}')
            WHERE len(regexp_extract_all(decode(html), '<table')) > 0
        """,
        "regex_emails": f"""
            SELECT url,
                   unnest(regexp_extract_all(decode(html), '[\\w.+-]+@[\\w-]+\\.[\\w.-]+')) AS value
            FROM read_parquet('{path}')
        """,
        "frontier_bfs": f"""
            WITH RECURSIVE
            hrefs AS (
                SELECT url AS src,
                       unnest(regexp_extract_all(decode(html), 'href="([^"]+)"', 1)) AS raw
                FROM read_parquet('{path}')
                WHERE url NOT LIKE '%/private/%'
            ),
            edges AS (
                SELECT DISTINCT src,
                       regexp_replace(raw, '\\?utm_source=feed&utm_campaign=c[0-9]+&b=2&a=1$', '?a=1&b=2') AS dst
                FROM hrefs
                WHERE raw NOT LIKE '%external-site.org%'
                  AND raw NOT LIKE '%/private/%'
            ),
            seeds AS (
                SELECT url FROM read_parquet('{path}')
                WHERE url NOT LIKE '%/private/%' ORDER BY url LIMIT 3
            ),
            walk(url, depth) AS (
                SELECT url, 0 FROM seeds
                UNION
                SELECT e.dst, w.depth + 1
                FROM walk w JOIN edges e ON e.src = w.url
                WHERE w.depth < 2
            )
            SELECT url, CAST(MIN(depth) AS INTEGER) AS depth FROM walk GROUP BY url
        """,
        "top_k_per_host": f"""
            WITH scored AS (
                SELECT url,
                       regexp_extract(url, 'https://([^/]+)/', 1) AS host,
                       ((CASE WHEN url LIKE '%articles%' THEN 1 ELSE 0 END)
                        + (CASE WHEN url LIKE '%doc-1%' THEN 1 ELSE 0 END)) / 2.0 AS score
                FROM read_parquet('{path}')
            ),
            ranked AS (
                SELECT host, url, score,
                       ROW_NUMBER() OVER (PARTITION BY host ORDER BY score DESC, url ASC) AS rn
                FROM scored
            )
            SELECT host, url, score FROM ranked WHERE rn <= 3
        """,
        "robots_filter": f"""
            SELECT url FROM read_parquet('{path}')
            WHERE url NOT LIKE '%/private/%'
        """,
    }
