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


def _sitemaps_glob(sf_dir: str) -> str:
    from .sources.seeder import sitemaps_parquet_path

    return sitemaps_parquet_path(sf_dir) + "/*.parquet"


def _cc_index_glob(sf_dir: str) -> str:
    from .sources.seeder import cc_index_parquet_path

    return cc_index_parquet_path(sf_dir) + "/*.parquet"


def _robots_seed_glob(sf_dir: str) -> str:
    from .sources.seeder import robots_seed_parquet_path

    return robots_seed_parquet_path(sf_dir) + "/*.parquet"

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


def _adaptive_stat_sql(path: str) -> str:
    """Exact chained-CTE replay of the statistical adaptive crawl
    (``frontier/adaptive.py:adaptive_digest`` with the
    ``q_adaptive_crawl`` config: query 'batch stream spark merge
    query', threshold 0.9, max_pages 10, top_k 5, max_iterations 10).

    Each iteration is one generated round of CTEs: state entering
    round r is the fetched-doc set ``ft{r-1}``; the round's guards
    (page budget, confidence threshold) gate its selection ``c{r}``.
    Link scores are the engine's exact float expression
    ``0.5*(i/5) + 0.3*(1 - k/n) + 0.2*1.0`` — identical IEEE binary64
    operations in identical order on both engines, so ranking is
    bit-reproducible (no transcendentals in the sort key; ln/sqrt
    appear only in the confidence scalar, where a ulp cannot move the
    0.9 guard or the 4-decimal rounding off a boundary)."""
    utm = "'\\?utm_source=feed&utm_campaign=c[0-9]+&b=2&a=1$', '?a=1&b=2'"
    qterms = "['batch','stream','spark','merge','query']"
    rounds = 10  # cfg.max_iterations
    parts = [
        f"""WITH
pt AS MATERIALIZED (
    SELECT url,
           unnest(list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'), 1, 2000)) AS tok
    FROM read_parquet('{path}')
),
ptd AS MATERIALIZED (SELECT DISTINCT url, tok FROM pt),
lraw AS MATERIALIZED (
    SELECT url AS src,
           regexp_extract_all(decode(html), '<a href="([^"]+)">([^<]*)</a>', 1) AS hs,
           regexp_extract_all(decode(html), '<a href="([^"]+)">([^<]*)</a>', 2) AS ts
    FROM read_parquet('{path}')
),
lun AS MATERIALIZED (
    SELECT src, unnest(hs) AS rawhref, unnest(ts) AS txt,
           unnest(range(1, len(hs) + 1)) AS pos
    FROM lraw
),
links0 AS MATERIALIZED (
    SELECT src, pos, regexp_replace(rawhref, {utm}) AS href, txt
    FROM lun WHERE rawhref NOT LIKE '%external-site.org%'
),
links AS MATERIALIZED (
    SELECT src, pos, href, txt FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY src, href ORDER BY pos) AS rn
        FROM links0
    ) WHERE rn = 1
),
lterm AS MATERIALIZED (
    SELECT src, href, pos,
           unnest(list_distinct(regexp_extract_all(lower(txt || ' ' || href), '[a-z0-9]+'))) AS tok
    FROM links
),
lstat AS MATERIALIZED (
    SELECT src, href, pos, COUNT(*) AS n,
           SUM(CASE WHEN list_contains({qterms}, tok) THEN 1 ELSE 0 END) AS qi
    FROM lterm GROUP BY 1, 2, 3
),
qt AS MATERIALIZED (SELECT unnest({qterms}) AS tok),
c0 AS MATERIALIZED (SELECT min(url) AS url FROM read_parquet('{path}') WHERE url NOT LIKE '%/private/%'),
a0 AS MATERIALIZED (SELECT url FROM c0),
f0 AS MATERIALIZED (SELECT p.url FROM (SELECT DISTINCT url FROM read_parquet('{path}')) p JOIN c0 USING (url)),
ft0 AS MATERIALIZED (SELECT 0 AS rnd, url FROM f0),
h0 AS MATERIALIZED (SELECT 0 AS rnd,
              (SELECT COUNT(DISTINCT tok) FROM ptd JOIN f0 USING (url)) AS h,
              (SELECT COUNT(*) FROM c0) > 0 AS ex),
hist1 AS MATERIALIZED (SELECT rnd, h FROM h0 WHERE ex)"""
    ]
    # rounds 1..9 get guards + selection; r == rounds is the final
    # confidence-only state.
    for r in range(1, rounds + 1):
        p = r - 1  # state entering round r = after rounds 0..p
        parts.append(f""",
m{r} AS MATERIALIZED (
    SELECT (SELECT COUNT(*) FROM ft{p}) AS total,
           COALESCE((SELECT MAX(cnt) FROM (
               SELECT tok, COUNT(*) AS cnt FROM pt JOIN ft{p} USING (url) GROUP BY tok
           )), 1) AS maxtf
),
qv{r} AS MATERIALIZED (
    SELECT q.tok, COALESCE(t.tf, 0) AS tf, COALESCE(d.df, 0) AS df
    FROM qt q
    LEFT JOIN (SELECT tok, COUNT(*) AS tf FROM pt JOIN ft{p} USING (url) GROUP BY tok) t
           ON t.tok = q.tok
    LEFT JOIN (SELECT tok, COUNT(*) AS df FROM ptd JOIN ft{p} USING (url) GROUP BY tok) d
           ON d.tok = q.tok
),
cov{r} AS MATERIALIZED (
    SELECT LEAST(1.0, sqrt(SUM(
        CASE WHEN df > 0
             THEN (CAST(df AS DOUBLE) / NULLIF(m.total, 0))
                  * (1 + 0.5 * (ln(1 + tf) / ln(1 + m.maxtf)))
             ELSE 0.0 END) / 5)) AS v
    FROM qv{r}, m{r} m
),
dst{r} AS MATERIALIZED (
    SELECT url, tok FROM (
        SELECT d.url, d.tok,
               ROW_NUMBER() OVER (PARTITION BY d.url ORDER BY d.tok) AS rn
        FROM ptd d JOIN ft{p} USING (url)
    ) WHERE rn <= 500
),
dall{r} AS MATERIALIZED (
    SELECT f.url, COALESCE(s.sz, 0) AS sz
    FROM ft{p} f
    LEFT JOIN (SELECT url, COUNT(*) AS sz FROM dst{r} GROUP BY url) s USING (url)
),
pr{r} AS MATERIALIZED (
    SELECT a.url AS u1, b.url AS u2, a.sz AS s1, b.sz AS s2
    FROM dall{r} a JOIN dall{r} b ON a.url < b.url
    WHERE a.sz > 0 AND b.sz > 0
),
ji{r} AS MATERIALIZED (
    SELECT p.u1, p.u2, COALESCE(i.cnt, 0) AS inter,
           p.s1 + p.s2 - COALESCE(i.cnt, 0) AS uni
    FROM pr{r} p
    LEFT JOIN (
        SELECT x.url AS u1, y.url AS u2, COUNT(*) AS cnt
        FROM dst{r} x JOIN dst{r} y ON x.tok = y.tok AND x.url < y.url
        GROUP BY 1, 2
    ) i ON i.u1 = p.u1 AND i.u2 = p.u2
),
cons{r} AS MATERIALIZED (
    SELECT CASE WHEN (SELECT COUNT(*) FROM ft{p}) < 2 THEN 1.0
                WHEN (SELECT COUNT(*) FROM pr{r}) = 0 THEN 0.0
                ELSE (SELECT AVG(CAST(inter AS DOUBLE) / uni) FROM ji{r}) END AS v
),
sat{r} AS MATERIALIZED (
    SELECT CASE WHEN (SELECT COUNT(*) FROM hist{r}) < 2 THEN 0.0
           ELSE GREATEST(0.0, LEAST(1.0,
               1 - CAST((SELECT CASE WHEN h > 0 THEN h ELSE 1 END
                         FROM hist{r} ORDER BY rnd DESC LIMIT 1) AS DOUBLE)
                   / (SELECT CASE WHEN h > 0 THEN h ELSE 1 END
                      FROM hist{r} ORDER BY rnd ASC LIMIT 1))) END AS v
),
conf{r} AS MATERIALIZED (
    SELECT CASE WHEN (SELECT COUNT(*) FROM ft{p}) = 0 THEN 0.0
           ELSE 0.4 * (SELECT v FROM cov{r})
                + 0.3 * (SELECT v FROM cons{r})
                + 0.3 * (SELECT v FROM sat{r}) END AS v
)""")
        if r == rounds:
            break
        parts.append(f""",
known{r} AS MATERIALIZED (SELECT DISTINCT tok FROM ptd JOIN ft{p} USING (url)),
pend{r} AS MATERIALIZED (
    SELECT href, src FROM (
        SELECT l.href, l.src,
               ROW_NUMBER() OVER (PARTITION BY l.href ORDER BY f.rnd, l.src, l.pos) AS rn
        FROM links l JOIN ft{p} f ON f.url = l.src
    ) WHERE rn = 1
),
cand{r} AS MATERIALIZED (
    SELECT p.href,
           0.5 * (CAST(s.qi AS DOUBLE) / 5)
           + 0.3 * (1 - CAST(COALESCE(k.k, 0) AS DOUBLE) / s.n)
           + 0.2 * 1.0 AS score
    FROM pend{r} p
    JOIN lstat s ON s.src = p.src AND s.href = p.href
    LEFT JOIN (
        SELECT lt.src, lt.href, COUNT(*) AS k
        FROM lterm lt JOIN known{r} kn ON kn.tok = lt.tok
        GROUP BY 1, 2
    ) k ON k.src = p.src AND k.href = p.href
    WHERE p.href NOT IN (SELECT url FROM a{p})
),
c{r} AS MATERIALIZED (
    SELECT href AS url FROM (
        SELECT href, ROW_NUMBER() OVER (ORDER BY score DESC, href) AS rn
        FROM cand{r}
    )
    WHERE (SELECT v FROM conf{r}) < 0.9
      AND (SELECT COUNT(*) FROM a{p}) < 10
      AND rn <= LEAST(5, 10 - (SELECT COUNT(*) FROM a{p}))
),
a{r} AS MATERIALIZED (SELECT url FROM a{p} UNION SELECT url FROM c{r}),
f{r} AS MATERIALIZED (SELECT p.url FROM (SELECT DISTINCT url FROM read_parquet('{path}')) p JOIN c{r} USING (url)),
ft{r} AS MATERIALIZED (SELECT rnd, url FROM ft{p} UNION ALL SELECT {r} AS rnd, url FROM f{r}),
h{r} AS MATERIALIZED (
    SELECT {r} AS rnd,
           (SELECT COUNT(*) FROM (
               SELECT DISTINCT tok FROM ptd JOIN f{r} USING (url)
               WHERE tok NOT IN (SELECT d.tok FROM ptd d JOIN ft{p} USING (url))
           )) AS h,
           (SELECT COUNT(*) FROM c{r}) > 0 AS ex
),
hist{r + 1} AS MATERIALIZED (SELECT rnd, h FROM hist{r} UNION ALL SELECT rnd, h FROM h{r} WHERE ex)""")
    parts.append(f"""
SELECT 'statistical' AS strategy, a.url,
       ROUND((SELECT v FROM conf{rounds}), 4) AS confidence
FROM a{rounds - 1} a
""")
    return "".join(parts)


def _emb_variations(query: str, seed: int = 42, n_synthetic: int = 10) -> list[str]:
    """Replay of the EmbeddingStrategy's deterministic query-variation
    stand-in (``frontier/adaptive.py:_variations`` — seeded token
    resamplings standing in for the reference's LLM variations,
    ``adaptive_crawler.py:736-748``).  Data-independent: a pure
    function of the constant query string, so the resulting strings
    are inlined into the SQL as literals (same footing as the qterms
    literal in ``_adaptive_stat_sql``)."""
    import random

    terms = query.split()
    rng = random.Random(seed)
    out = []
    for i in range(int(n_synthetic * 1.3)):
        k = max(1, len(terms) - (i % 2))
        picked = rng.sample(terms, k=min(k, len(terms)))
        rng.shuffle(picked)
        out.append(" ".join(picked) + f" aspect{i}")
    return out


def _emb_train_val(query: str, seed: int = 42) -> tuple[list[str], list[str]]:
    """80/20 train/validation split of the variations (original query
    always in train) — ``EmbeddingStrategy.map_query_space``."""
    import random

    variations = _emb_variations(query, seed)
    rng = random.Random(seed + 1)
    rng.shuffle(variations)
    n_val = max(2, int(len(variations) * 0.2))
    return [query] + variations[:-n_val], variations[-n_val:]


def _adaptive_emb_sql(path: str) -> str:
    """Exact chained-CTE replay of the EMBEDDING adaptive crawl
    (``frontier/adaptive.py:adaptive_digest_embedding`` with the
    ``q_adaptive_crawl_embedding`` config: query 'batch stream spark
    merge query', threshold 0.9, max_pages 10, top_k 5,
    max_iterations 10, dim 64, coverage_radius 0.2, overlap 0.85,
    min_confidence 0.1, min_relative_improvement 0.1, validation 0.4).

    The stand-in embedder is the md5 feature-hashing trick
    (``functions/cosine.py:HashingEmbedder``): idx = first 8 md5 hex
    chars mod 64, sign = parity of the 9th — both directly computable
    in DuckDB, which is why the embedder hashes with md5.  Component
    values ``sign_sum / sqrt(sum(sign_sum^2))`` are exact-integer
    sums divided by a correctly-rounded sqrt, so every vector
    component is the identical binary64 on both engines; dot products
    may differ by summation-order ulps, which cannot move a guard
    (0.9 / 0.1 / 0.4 thresholds, 4-decimal rounding) or a ranking off
    a boundary — exact ties occur only between identical token bags,
    where both engines compute exactly equal scores and fall through
    to the href tiebreak.

    Round mapping mirrors ``_adaptive_stat_sql``: c0 replays engine
    iteration 1 (the trivially-guarded seed pop), SQL rounds 1..9
    replay iterations 2..10, conf10 is the final confidence over the
    final knowledge base.  Guards are encoded into each round's
    selection ``c{r}``; once any guard fires the state freezes, and
    every guard is monotone under a frozen state (confidence is
    unchanged, avg-improvement only shrinks, the candidate set is
    unchanged), so frozen rounds replay the engine's loop break
    exactly."""
    utm = "'\\?utm_source=feed&utm_campaign=c[0-9]+&b=2&a=1$', '?a=1&b=2'"
    train, val = _emb_train_val("batch stream spark merge query")
    tq_lit = ", ".join(f"({i}, '{t}')" for i, t in enumerate(train))
    vq_lit = ", ".join(f"({i}, '{t}')" for i, t in enumerate(val))
    rounds = 10  # cfg.max_iterations

    def comp_cte(prefix: str, src: str, keys: str, text_expr: str) -> str:
        """tokens → md5 idx/sign → summed components → normalized
        sparse vector (``HashingEmbedder.embed``)."""
        return f"""
{prefix}t AS MATERIALIZED (
    SELECT {keys}, unnest(list_filter(string_split_regex(lower({text_expr}), '\\s+'), x -> x <> '')) AS tok
    FROM {src}
),
{prefix}c0 AS MATERIALIZED (
    SELECT {keys}, CAST(('0x' || substr(md5(tok), 1, 8))::UINT32 % 64 AS INT) AS idx,
           SUM(CASE WHEN ('0x' || substr(md5(tok), 9, 1))::INT % 2 = 1 THEN 1 ELSE -1 END) AS s
    FROM {prefix}t GROUP BY ALL
),
{prefix}n AS MATERIALIZED (
    SELECT {keys}, sqrt(CAST(SUM(s * s) AS DOUBLE)) AS nrm FROM {prefix}c0 GROUP BY ALL
),
{prefix}comp AS MATERIALIZED (
    SELECT {keys}, idx, CAST(s AS DOUBLE) / nrm AS val
    FROM {prefix}c0 JOIN {prefix}n USING ({keys}) WHERE s <> 0
)"""

    parts = [
        f"""WITH
tq(qid, qtext) AS (VALUES {tq_lit}),
vq(qid, qtext) AS (VALUES {vq_lit}),{comp_cte("tq", "tq", "qid", "qtext")},{comp_cte("vq", "vq", "qid", "qtext")},
pgs AS MATERIALIZED (SELECT DISTINCT url, text FROM read_parquet('{path}')),{comp_cte("d", "pgs", "url", "text")},
purl AS MATERIALIZED (SELECT url FROM pgs),
lraw AS MATERIALIZED (
    SELECT url AS src,
           regexp_extract_all(decode(html), '<a href="([^"]+)">([^<]*)</a>', 1) AS hs,
           regexp_extract_all(decode(html), '<a href="([^"]+)">([^<]*)</a>', 2) AS ts
    FROM read_parquet('{path}')
),
lun AS MATERIALIZED (
    SELECT src, unnest(hs) AS rawhref, unnest(ts) AS txt,
           unnest(range(1, len(hs) + 1)) AS pos
    FROM lraw
),
links0 AS MATERIALIZED (
    SELECT src, pos, regexp_replace(rawhref, {utm}) AS href, txt
    FROM lun WHERE rawhref NOT LIKE '%external-site.org%'
),
links AS MATERIALIZED (
    SELECT src, pos, href, txt FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY src, href ORDER BY pos) AS rn
        FROM links0
    ) WHERE rn = 1
),
lpair AS MATERIALIZED (SELECT src, href, txt FROM links),{comp_cte("l", "lpair", "src, href", "txt || ' ' || href")},
c0 AS MATERIALIZED (SELECT min(url) AS url FROM read_parquet('{path}') WHERE url NOT LIKE '%/private/%'),
a0 AS MATERIALIZED (SELECT url FROM c0),
f0 AS MATERIALIZED (SELECT p.url FROM purl p JOIN c0 USING (url)),
ft0 AS MATERIALIZED (SELECT 0 AS rnd, url FROM f0)"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        # history entering engine iteration r+1 = [0.0, conf1..conf{r}]
        # → r consecutive diffs, summed left-to-right like the engine
        diffs = ["ABS((SELECT v FROM conf1) - 0.0)"] + [
            f"ABS((SELECT v FROM conf{i}) - (SELECT v FROM conf{i - 1}))"
            for i in range(2, r + 1)
        ]
        avg_expr = f"(({' + '.join(diffs)}) / {r})"
        parts.append(f""",
qd{r} AS MATERIALIZED (
    SELECT q.qid, f.url, SUM(q.val * d.val) AS dot
    FROM ft{p} f JOIN dcomp d ON d.url = f.url JOIN tqcomp q ON q.idx = d.idx
    GROUP BY 1, 2
),
qb{r} AS MATERIALIZED (
    SELECT t.qid, MAX(COALESCE(x.dot, 0.0)) AS best,
           COALESCE(MIN(1.0 - COALESCE(x.dot, 0.0)), 1.0) AS gapd
    FROM (SELECT qid FROM tq) t
    LEFT JOIN ft{p} f ON TRUE
    LEFT JOIN qd{r} x ON x.qid = t.qid AND x.url = f.url
    GROUP BY 1
),
conf{r} AS MATERIALIZED (SELECT AVG(best) AS v FROM qb{r})""")
        if r == rounds:
            break
        parts.append(f""",
need{r} AS MATERIALIZED (SELECT COUNT(*) AS n FROM qb{r} WHERE gapd > 0.2),
vd{r} AS MATERIALIZED (
    SELECT q.qid, f.url, SUM(q.val * d.val) AS dot
    FROM ft{p} f JOIN dcomp d ON d.url = f.url JOIN vqcomp q ON q.idx = d.idx
    GROUP BY 1, 2
),
vb{r} AS MATERIALIZED (
    SELECT t.qid, MIN(1.0 - COALESCE(x.dot, 0.0)) AS mind
    FROM (SELECT qid FROM vq) t
    LEFT JOIN ft{p} f ON TRUE
    LEFT JOIN vd{r} x ON x.qid = t.qid AND x.url = f.url
    GROUP BY 1
),
valv{r} AS MATERIALIZED (
    SELECT CASE WHEN (SELECT COUNT(*) FROM ft{p}) = 0 THEN 0.0
           ELSE (SELECT AVG(1.0 - mind) FROM vb{r}) END AS v
),
stop{r} AS MATERIALIZED (
    SELECT (((SELECT v FROM conf{r}) < 0.1 AND (SELECT COUNT(*) FROM a{p}) > 0)
            OR ({avg_expr} < 0.1 * (SELECT v FROM conf{r})
                AND (SELECT v FROM valv{r}) > 0.4)) AS s
),
pend{r} AS MATERIALIZED (
    SELECT href, src FROM (
        SELECT l.href, l.src,
               ROW_NUMBER() OVER (PARTITION BY l.href ORDER BY f.rnd, l.src, l.pos) AS rn
        FROM links l JOIN ft{p} f ON f.url = l.src
    ) WHERE rn = 1
),
cand{r} AS MATERIALIZED (
    SELECT src, href FROM pend{r} WHERE href NOT IN (SELECT url FROM a{p})
),
cqd{r} AS MATERIALIZED (
    SELECT c.href, q.qid, SUM(l.val * q.val) AS dot
    FROM cand{r} c JOIN lcomp l ON l.src = c.src AND l.href = c.href
    JOIN tqcomp q ON q.idx = l.idx
    GROUP BY 1, 2
),
cimp{r} AS MATERIALIZED (
    SELECT c.href,
           SUM(CASE WHEN g.gapd > 0.2 AND (1.0 - COALESCE(x.dot, 0.0)) < g.gapd
                    THEN (g.gapd - (1.0 - COALESCE(x.dot, 0.0))) * 2
                    ELSE 0.0 END) AS ti
    FROM cand{r} c CROSS JOIN qb{r} g
    LEFT JOIN cqd{r} x ON x.href = c.href AND x.qid = g.qid
    GROUP BY 1
),
cdd{r} AS MATERIALIZED (
    SELECT c.href, f.url, SUM(l.val * d.val) AS dot
    FROM cand{r} c JOIN lcomp l ON l.src = c.src AND l.href = c.href
    JOIN dcomp d ON d.idx = l.idx JOIN ft{p} f ON f.url = d.url
    GROUP BY 1, 2
),
cmx{r} AS MATERIALIZED (
    SELECT c.href, MAX(COALESCE(x.dot, 0.0)) AS msim
    FROM cand{r} c
    LEFT JOIN ft{p} f ON TRUE
    LEFT JOIN cdd{r} x ON x.href = c.href AND x.url = f.url
    GROUP BY 1
),
cs{r} AS MATERIALIZED (
    SELECT i.href,
           (CASE WHEN (SELECT n FROM need{r}) > 0
                 THEN i.ti / (SELECT n FROM need{r}) ELSE 0.0 END)
           * (1.0 - CASE WHEN m.msim > 0.85 THEN (m.msim - 0.85) * 2 ELSE 0.0 END) AS score
    FROM cimp{r} i JOIN cmx{r} m USING (href)
),
c{r} AS MATERIALIZED (
    SELECT href AS url FROM (
        SELECT href, ROW_NUMBER() OVER (ORDER BY score DESC, href) AS rn FROM cs{r}
    )
    WHERE (SELECT v FROM conf{r}) < 0.9
      AND (SELECT COUNT(*) FROM a{p}) < 10
      AND NOT (SELECT s FROM stop{r})
      AND rn <= LEAST(5, 10 - (SELECT COUNT(*) FROM a{p}))
),
a{r} AS MATERIALIZED (SELECT url FROM a{p} UNION SELECT url FROM c{r}),
f{r} AS MATERIALIZED (SELECT p.url FROM purl p JOIN c{r} USING (url)),
ft{r} AS MATERIALIZED (SELECT rnd, url FROM ft{p} UNION ALL SELECT {r} AS rnd, url FROM f{r})""")
    parts.append(f"""
SELECT 'embedding' AS strategy, a.url,
       ROUND((SELECT v FROM conf{rounds}), 4) AS confidence
FROM a{rounds - 1} a
""")
    return "".join(parts)


def oracle_sql_for(sf_dir: str) -> dict[str, str]:
    # the pages cache is a directory of part files → DuckDB glob
    path = pages_parquet_path(sf_dir) + "/*.parquet"

    sql = {
        "extract_text": f"SELECT url, text FROM read_parquet('{path}')",
        # warc_extract reads the SAME corpus through the WARC archive
        # path — the oracle is the parquet truth it must round-trip to
        "warc_extract": f"SELECT url, text FROM read_parquet('{path}')",
        "extract_links": _LINKS_CTE.format(path=path)
        + "SELECT src_url, href, internal FROM links",
        "link_stats": _LINKS_CTE.format(path=path)
        + """
            SELECT regexp_extract(src_url, 'https://([^/]+)/', 1) AS host,
                   COUNT(DISTINCT src_url) AS n_pages,
                   COUNT(*) AS n_links
            FROM links GROUP BY host
        """,
        "trap_detect": _LINKS_CTE.format(path=path)
        + """
            , u AS (
                SELECT DISTINCT
                       regexp_extract(href, 'https://([^/]+)', 1) AS host,
                       regexp_replace(href, '[0-9]+', 'N', 'g') AS template,
                       href
                FROM links
            ),
            pt AS (
                SELECT host, template, COUNT(*) AS n_urls_t
                FROM u GROUP BY 1, 2
            ),
            ph AS (
                SELECT host,
                       SUM(n_urls_t) AS n_urls,
                       COUNT(*) AS n_templates,
                       MAX(n_urls_t) AS max_per_template
                FROM pt GROUP BY host
            )
            SELECT host,
                   CAST(n_urls AS BIGINT) AS n_urls,
                   n_templates,
                   max_per_template,
                   (n_urls >= 20 AND n_urls >= 19 * n_templates) AS trap_suspect
            FROM ph
        """,
        "host_graph": _LINKS_CTE.format(path=path)
        + """
            , e AS (
                SELECT regexp_extract(src_url, 'https://([^/]+)', 1) AS src_host,
                       regexp_extract(href, 'https://([^/]+)', 1) AS dst_host,
                       src_url
                FROM links
            ),
            agg AS (
                SELECT src_host, dst_host,
                       COUNT(*) AS n_links,
                       COUNT(DISTINCT src_url) AS n_src_pages
                FROM e GROUP BY 1, 2
            )
            SELECT a.src_host, a.dst_host, a.n_links, a.n_src_pages,
                   (b.src_host IS NOT NULL) AS reciprocal
            FROM agg a
            LEFT JOIN agg b
              ON b.src_host = a.dst_host AND b.dst_host = a.src_host
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
        "fetch_pages": f"""
            SELECT url, octet_length(html) AS n_bytes
            FROM read_parquet('{path}')
            WHERE url IN (
                SELECT url FROM read_parquet('{path}')
                WHERE url NOT LIKE '%/private/%'
                ORDER BY url LIMIT 100
            )
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
                -- the frontier normalization composition (extended
                -- normalize_url, then normalize_url_for_deep_crawl)
                -- on this corpus's href shapes: utm_* keys dropped +
                -- remaining keys sorted by the extended pass
                -- ('?a=1&b=2'), trailing slash stripped by the
                -- deep-crawl pass (roots become no-slash URLs)
                SELECT DISTINCT src,
                       regexp_replace(
                           regexp_replace(raw, '\\?utm_source=feed&utm_campaign=c[0-9]+&b=2&a=1$', '?a=1&b=2'),
                           '/$', '') AS dst
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
        # ------------------------------------------- training-data ops
        # (documents / embeddings / events are pre-registered views)
        "dedup_exact": """
            SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
        """,
        "jaccard_pairs": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
            d2 AS (SELECT doc_id, list_zip(ws, range(1, len(ws) + 1)) AS z FROM d),
            zz AS (SELECT doc_id, unnest(z) AS p FROM d2),
            w AS (
                SELECT doc_id, p[1]::VARCHAR AS w, p[2]::INTEGER AS i FROM zz
            ),
            sh0 AS (
                SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
                FROM w a
                JOIN w b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                JOIN w c ON c.doc_id = a.doc_id AND c.i = a.i + 2
            ),
            hot AS (SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) > 100),
            sh AS (SELECT * FROM sh0 WHERE s NOT IN (SELECT s FROM hot)),
            counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS i
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT inter.a, inter.b,
                   CAST(inter.i AS DOUBLE) / (ca.n + cb.n - inter.i) AS jaccard
            FROM inter
            JOIN counts ca ON ca.doc_id = inter.a
            JOIN counts cb ON cb.doc_id = inter.b
            WHERE CAST(inter.i AS DOUBLE) / (ca.n + cb.n - inter.i) >= 0.5
        """,
        "dedup_minhash": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
            d2 AS (SELECT doc_id, list_zip(ws, range(1, len(ws) + 1)) AS z FROM d),
            zz AS (SELECT doc_id, unnest(z) AS p FROM d2),
            w AS (
                SELECT doc_id, p[1]::VARCHAR AS w, p[2]::INTEGER AS i FROM zz
            ),
            sh0 AS (
                SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
                FROM w a
                JOIN w b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                JOIN w c ON c.doc_id = a.doc_id AND c.i = a.i + 2
            ),
            sh AS (SELECT * FROM sh0),
            counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS i
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT inter.a, inter.b,
                   CAST(inter.i AS DOUBLE) / (ca.n + cb.n - inter.i) AS jaccard
            FROM inter
            JOIN counts ca ON ca.doc_id = inter.a
            JOIN counts cb ON cb.doc_id = inter.b
            WHERE CAST(inter.i AS DOUBLE) / (ca.n + cb.n - inter.i) >= 0.5
        """,
        "dedup_simhash": """
            WITH toks AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
            ),
            h AS (
                SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS th FROM toks
            ),
            bits AS (
                SELECT doc_id, i,
                       SUM(CASE WHEN (th >> i) & 1 = 1 THEN 1 ELSE -1 END) AS vote
                FROM h, UNNEST(range(64)) AS t(i)
                GROUP BY doc_id, i
            ),
            fp AS (
                SELECT doc_id,
                       SUM(CASE WHEN vote > 0 THEN (1::UBIGINT << i)::HUGEINT ELSE 0 END)::UBIGINT AS f
                FROM bits GROUP BY doc_id
            )
            SELECT x.doc_id AS a, y.doc_id AS b,
                   CAST(bit_count(xor(x.f, y.f)) AS BIGINT) AS hamming
            FROM fp x JOIN fp y ON x.doc_id < y.doc_id
            WHERE bit_count(xor(x.f, y.f)) <= 3
        """,
        # reachability closure over the exact-Jaccard >= 0.5 pair set
        # (identical to the dedup_minhash oracle's pair semantics);
        # cluster_id = min doc_id reachable, keep = is-representative.
        "dedup_cluster": """
            WITH RECURSIVE
            d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
            d2 AS (SELECT doc_id, list_zip(ws, range(1, len(ws) + 1)) AS z FROM d),
            zz AS (SELECT doc_id, unnest(z) AS p FROM d2),
            w AS (
                SELECT doc_id, p[1]::VARCHAR AS w, p[2]::INTEGER AS i FROM zz
            ),
            sh AS (
                SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
                FROM w a
                JOIN w b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                JOIN w c ON c.doc_id = a.doc_id AND c.i = a.i + 2
            ),
            counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS i
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            pairs AS (
                SELECT inter.a, inter.b FROM inter
                JOIN counts ca ON ca.doc_id = inter.a
                JOIN counts cb ON cb.doc_id = inter.b
                WHERE CAST(inter.i AS DOUBLE) / (ca.n + cb.n - inter.i) >= 0.5
            ),
            edges AS (
                SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
            ),
            walk(node, lbl) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT e.a, k.lbl FROM edges e JOIN walk k ON k.node = e.b
            )
            SELECT node AS doc_id, MIN(lbl) AS cluster_id,
                   MIN(lbl) = node AS keep
            FROM walk GROUP BY node
        """,
        # same pair set + reachability as dedup_cluster, then the
        # quality argmax: 1099511627776 = 2^40 (dedup._QKEY_BASE)
        "dedup_keep_best": """
            WITH RECURSIVE
            d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
            d2 AS (SELECT doc_id, list_zip(ws, range(1, len(ws) + 1)) AS z FROM d),
            zz AS (SELECT doc_id, unnest(z) AS p FROM d2),
            w AS (
                SELECT doc_id, p[1]::VARCHAR AS w, p[2]::INTEGER AS i FROM zz
            ),
            sh AS (
                SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
                FROM w a
                JOIN w b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                JOIN w c ON c.doc_id = a.doc_id AND c.i = a.i + 2
            ),
            counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS i
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            pairs AS (
                SELECT inter.a, inter.b FROM inter
                JOIN counts ca ON ca.doc_id = inter.a
                JOIN counts cb ON cb.doc_id = inter.b
                WHERE CAST(inter.i AS DOUBLE) / (ca.n + cb.n - inter.i) >= 0.5
            ),
            edges AS (
                SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
            ),
            walk(node, lbl) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT e.a, k.lbl FROM edges e JOIN walk k ON k.node = e.b
            ),
            comp AS (
                SELECT node AS doc_id, MIN(lbl) AS cluster_id
                FROM walk GROUP BY node
            ),
            q AS (SELECT doc_id, COUNT(DISTINCT w) AS nd FROM w GROUP BY doc_id),
            j AS (
                SELECT c.doc_id, c.cluster_id, q.nd,
                       q.nd * 1099511627776 + (1099511627775 - c.doc_id) AS qkey
                FROM comp c JOIN q ON q.doc_id = c.doc_id
            ),
            mx AS (SELECT cluster_id, MAX(qkey) AS mk FROM j GROUP BY cluster_id)
            SELECT j.doc_id, j.cluster_id, j.nd AS n_distinct,
                   j.qkey = mx.mk AS keep_best
            FROM j JOIN mx ON mx.cluster_id = j.cluster_id
        """,
        # pages = one doc each, lines = its 16-word chunks; first
        # occurrence of each line by (page_id, pos) survives, pages
        # reassembled.  1048576 = 2^20 packed-position base
        # (dedup._LINE_POS_BITS); DuckDB list slice is 1-based
        # end-inclusive so ws[s+1 : s+16] == python words[s : s+16].
        "line_dedup": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
            idx AS (
                SELECT doc_id, ws, unnest(range(0, len(ws), 16)) AS s FROM d
            ),
            lines AS (
                SELECT doc_id AS page_id,
                       (s // 16)::INTEGER AS pos,
                       array_to_string(ws[s + 1 : s + 16], ' ') AS line
                FROM idx
            ),
            keyed AS (
                SELECT page_id, pos, line,
                       page_id * 1048576 + pos AS k,
                       length(line) >= 1 AS elig
                FROM lines
            ),
            mins AS (SELECT line, MIN(k) AS mk FROM keyed WHERE elig GROUP BY line),
            kept AS (
                SELECT x.page_id, x.pos, x.line
                FROM keyed x JOIN mins m ON x.line = m.line
                WHERE x.k = m.mk
                UNION ALL
                SELECT page_id, pos, line FROM keyed WHERE NOT elig
            ),
            tot AS (SELECT page_id, COUNT(*) AS n_total FROM keyed GROUP BY 1)
            SELECT t.page_id,
                   COALESCE(string_agg(kp.line, chr(10) ORDER BY kp.pos), '') AS text,
                   t.n_total - COUNT(kp.line) AS n_removed
            FROM tot t LEFT JOIN kept kp USING (page_id)
            GROUP BY t.page_id, t.n_total
        """,
        # fixed-window exact-substring dedup (window=10): first
        # occurrence of each 10-token span by packed (doc_id, start)
        # key survives; tokens under any duplicate window drop.
        # 1048576 = 2^20 (dedup._WIN_POS_BITS); DuckDB list slice is
        # 1-based end-inclusive so toks[s+1 : s+10] == python
        # toks[s : s+10]; tokenization = whitespace-run split.
        "dedup_substring": r"""
            WITH d AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
              FROM documents
            ),
            wins AS (
              SELECT doc_id, s, array_to_string(toks[s + 1 : s + 10], ' ') AS w,
                     doc_id * 1048576 + s AS k
              FROM d, LATERAL (SELECT unnest(range(0, greatest(len(toks) - 9, 0))) AS s) g
            ),
            mins AS (SELECT w, MIN(k) AS mk FROM wins GROUP BY w),
            dups AS (
              SELECT x.doc_id, x.s FROM wins x JOIN mins m ON x.w = m.w WHERE x.k <> m.mk
            ),
            cov AS (
              SELECT DISTINCT doc_id, s + off AS pos
              FROM dups, LATERAL (SELECT unnest(range(0, 10)) AS off) o
            ),
            toks AS (
              SELECT doc_id, p AS pos, toks[p + 1] AS tok
              FROM d, LATERAL (SELECT unnest(range(0, len(toks))) AS p) g
            ),
            kept AS (
              SELECT t.doc_id, t.pos, t.tok
              FROM toks t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.pos = t.pos
              WHERE c.doc_id IS NULL
            )
            SELECT d.doc_id,
                   COALESCE(k.text, '') AS text,
                   len(d.toks) - COALESCE(k.n, 0) AS n_removed
            FROM d LEFT JOIN (
              SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text, COUNT(*) AS n
              FROM kept GROUP BY doc_id
            ) k USING (doc_id)
        """,
        # per-source integer sums; ONE final double division keeps the
        # ratio bit-exact vs the Ray side regardless of summation order
        "domain_filter": """
            WITH s AS (
                SELECT doc_id, source,
                       len(string_split(text, ' ')) AS nw,
                       len(list_filter(string_split(text, ' '),
                           w -> list_contains(['the','a','of','and','to','in','is'], w))) AS ns
                FROM documents
            ),
            d AS (
                SELECT source, COUNT(*) AS n_docs,
                       SUM(nw) AS tw, SUM(ns) AS ts
                FROM s GROUP BY source
            )
            SELECT s.doc_id, s.source,
                   d.n_docs AS domain_n_docs,
                   CAST(d.ts AS DOUBLE) / CAST(d.tw AS DOUBLE) AS domain_stopword_ratio,
                   (d.n_docs >= 10 AND
                    CAST(d.ts AS DOUBLE) / CAST(d.tw AS DOUBLE) >= 0.06) AS keep
            FROM s JOIN d USING (source)
        """,
        "lang_id": """
            WITH w AS (
                SELECT doc_id, text,
                       list_transform(regexp_extract_all(text, '\\p{L}+'), x -> lower(x)) AS ws
                FROM documents
            ),
            scores AS (
                SELECT doc_id,
                    CASE WHEN len(ws)=0 THEN 0.0 ELSE
                        len(list_filter(ws, x -> list_contains(['the','and','of','to','is','in','that','it','with','for'], x)))::DOUBLE / len(ws)
                    END AS s_en,
                    CASE WHEN len(ws)=0 THEN 0.0 ELSE
                        len(list_filter(ws, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','von','zu'], x)))::DOUBLE / len(ws)
                        + CASE WHEN regexp_matches(text, '[äöüß]') THEN 0.2 ELSE 0.0 END
                    END AS s_de,
                    CASE WHEN len(ws)=0 THEN 0.0 ELSE
                        len(list_filter(ws, x -> list_contains(['le','la','les','et','est','une','des','que','dans','pour'], x)))::DOUBLE / len(ws)
                        + CASE WHEN regexp_matches(text, '[éèêàçô]') THEN 0.2 ELSE 0.0 END
                    END AS s_fr,
                    CASE WHEN len(ws)=0 THEN 0.0 ELSE
                        len(list_filter(ws, x -> list_contains(['el','la','los','las','y','es','una','que','en','por'], x)))::DOUBLE / len(ws)
                        + CASE WHEN regexp_matches(text, '[ñ¿¡áíó]') THEN 0.2 ELSE 0.0 END
                    END AS s_es,
                    CASE WHEN len(ws)=0 THEN 0.0 ELSE
                        len(list_filter(ws, x -> list_contains(['il','la','di','che','e','un','per','con','del','sono'], x)))::DOUBLE / len(ws)
                        + CASE WHEN regexp_matches(text, '[àèì]') THEN 0.2 ELSE 0.0 END
                    END AS s_it
                FROM w
            ),
            ranked AS (
                SELECT doc_id, lang, score FROM (
                    SELECT doc_id, unnest(['en','de','fr','es','it']) AS lang,
                           unnest([s_en, s_de, s_fr, s_es, s_it]) AS score,
                           unnest([1, 2, 3, 4, 5]) AS prio
                    FROM scores
                ) QUALIFY ROW_NUMBER() OVER (
                    PARTITION BY doc_id ORDER BY score DESC, prio ASC) = 1
            )
            SELECT doc_id,
                   CASE WHEN score > 0.02 THEN lang ELSE 'und' END AS pred_lang,
                   score AS lang_score
            FROM ranked
        """,
        "fingerprint": """
            WITH d AS (
                SELECT doc_id, string_split(text, ' ') AS ws FROM documents
                WHERE length(text) > 0
            ),
            small AS (SELECT doc_id, array_to_string(ws, ' ') AS w FROM d WHERE len(ws) <= 8),
            big AS (
                SELECT doc_id, array_to_string(list_slice(ws, i, i + 7), ' ') AS w
                FROM d, UNNEST(range(1, len(ws) - 6)) AS t(i)
                WHERE len(ws) > 8
            ),
            allw AS (SELECT * FROM small UNION ALL SELECT * FROM big),
            h AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 16))::UBIGINT AS fp_hash FROM allw),
            ranked AS (
                SELECT doc_id, fp_hash,
                       ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY fp_hash) AS rank
                FROM h
            )
            SELECT doc_id, CAST(rank AS BIGINT) AS rank, fp_hash
            FROM ranked WHERE rank <= 4
        """,
        "token_count": """
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM documents
        """,
        # postings string = 16 smallest doc ids ascending, df exact;
        # list slice is 1-based end-inclusive → [1:16] == python [:16]
        "build_postings": """
            WITH w AS (
                SELECT DISTINCT doc_id AS doc, unnest(string_split(text, ' ')) AS token
                FROM documents
            ),
            g AS (
                SELECT token,
                       COUNT(*) AS df,
                       list_sort(list(doc)) AS docs
                FROM w GROUP BY token
            )
            SELECT token, df,
                   array_to_string(docs[1:16], ',') AS postings
            FROM g
        """,
        "vocab_topk": """
            WITH tok AS (
                SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
                FROM documents
            ),
            df AS (SELECT token, COUNT(*) AS df FROM tok GROUP BY token)
            SELECT token, df FROM df ORDER BY df DESC, token ASC LIMIT 100
        """,
        "tfidf_topk": """
            WITH tok AS (
                SELECT doc_id, token, COUNT(*) AS tf
                FROM (
                    SELECT doc_id, unnest(string_split(text, ' ')) AS token
                    FROM documents
                )
                GROUP BY doc_id, token
            ),
            df AS (SELECT token, COUNT(*) AS df FROM tok GROUP BY token),
            n AS (SELECT COUNT(*) AS n FROM documents),
            scored AS (
                SELECT t.doc_id, t.token, t.tf, d.df,
                       CAST(FLOOR(t.tf * LN(CAST(n.n AS DOUBLE) / d.df) * 1e6)
                            AS BIGINT) AS score_fp
                FROM tok t JOIN df d USING (token) CROSS JOIN n
            )
            SELECT doc_id, CAST(rank AS BIGINT) AS rank, token, tf, df, score_fp
            FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY doc_id ORDER BY score_fp DESC, token ASC
                ) AS rank
                FROM scored
            )
            WHERE rank <= 5
        """,
        "dedup_incremental": """
            WITH prior AS (
                SELECT md5(text) AS content_hash FROM documents
                WHERE doc_id % 4 = 0
            ),
            nw AS (
                SELECT doc_id, md5(text) AS content_hash FROM documents
                WHERE doc_id % 4 <> 0
            )
            SELECT content_hash, MIN(doc_id) AS doc_id
            FROM nw
            WHERE content_hash NOT IN (SELECT content_hash FROM prior)
            GROUP BY content_hash
        """,
        # lm_score's fixed-point scores → integer bins (offset 50e9
        # makes the numerator non-negative so // floors identically in
        # numpy and DuckDB; bin unit 10^7 = curation.ccnet_buckets'
        # bin_fp) → per-lang tertile cutoffs by the pure-integer rule
        # "smallest bin with cumulative count >= ceil(q*n)".
        "ccnet_buckets": """
            WITH ref AS (
                SELECT string_split(text, ' ') AS ws FROM documents
                WHERE doc_id % 10 = 0
            ),
            r_uni AS (SELECT unnest(ws) AS w1 FROM ref),
            c1 AS (SELECT w1, COUNT(*) AS c1 FROM r_uni GROUP BY w1),
            v AS (SELECT COUNT(DISTINCT w1) AS v FROM r_uni),
            r_bi AS (
                SELECT ws[i] AS w1, ws[i+1] AS w2
                FROM ref, UNNEST(range(1, len(ws))) AS t(i)
            ),
            c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM r_bi GROUP BY w1, w2),
            d AS (
                SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            ),
            d_bi AS (
                SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
                FROM d, UNNEST(range(1, len(ws))) AS t(i)
            ),
            terms AS (
                SELECT b.doc_id,
                       CAST(FLOOR(LN(
                           (COALESCE(c12.c12, 0) + 1)::DOUBLE
                           / (COALESCE(c1.c1, 0) + v.v)
                       ) * 1e9) AS BIGINT) AS term_fp
                FROM d_bi b
                LEFT JOIN c12 USING (w1, w2)
                LEFT JOIN c1 USING (w1)
                CROSS JOIN v
            ),
            agg AS (
                SELECT doc_id, COUNT(*) AS n_bigrams, SUM(term_fp) AS logprob_fp
                FROM terms GROUP BY doc_id
            ),
            binned AS (
                SELECT d0.doc_id, d0.lang,
                       CASE WHEN COALESCE(a.n_bigrams, 0) > 0 THEN
                           ((CAST(a.logprob_fp AS BIGINT)
                             + 50000000000 * CAST(a.n_bigrams AS BIGINT))
                            // CAST(a.n_bigrams AS BIGINT)) // 10000000
                       ELSE 0 END AS bin
                FROM documents d0 LEFT JOIN agg a USING (doc_id)
            ),
            tot AS (SELECT lang, COUNT(*) AS n FROM binned GROUP BY lang),
            hist AS (
                SELECT lang, bin, COUNT(*) AS cnt FROM binned GROUP BY lang, bin
            ),
            cum AS (
                SELECT lang, bin,
                       SUM(cnt) OVER (PARTITION BY lang ORDER BY bin) AS cum
                FROM hist
            ),
            cuts AS (
                SELECT c.lang,
                       MIN(CASE WHEN c.cum >= (t.n + 2) // 3 THEN c.bin END) AS c1t,
                       MIN(CASE WHEN c.cum >= (2 * t.n + 2) // 3 THEN c.bin END) AS c2t
                FROM cum c JOIN tot t USING (lang) GROUP BY c.lang
            )
            SELECT b.doc_id, b.lang, b.bin,
                   CASE WHEN b.bin <= cuts.c1t THEN 'tail'
                        WHEN b.bin <= cuts.c2t THEN 'middle'
                        ELSE 'head' END AS bucket
            FROM binned b JOIN cuts USING (lang)
        """,
        "lm_score": """
            WITH ref AS (
                SELECT string_split(text, ' ') AS ws FROM documents
                WHERE doc_id % 10 = 0
            ),
            r_uni AS (SELECT unnest(ws) AS w1 FROM ref),
            c1 AS (SELECT w1, COUNT(*) AS c1 FROM r_uni GROUP BY w1),
            v AS (SELECT COUNT(DISTINCT w1) AS v FROM r_uni),
            r_bi AS (
                SELECT ws[i] AS w1, ws[i+1] AS w2
                FROM ref, UNNEST(range(1, len(ws))) AS t(i)
            ),
            c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM r_bi GROUP BY w1, w2),
            d AS (
                SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            ),
            d_bi AS (
                SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
                FROM d, UNNEST(range(1, len(ws))) AS t(i)
            ),
            terms AS (
                SELECT b.doc_id,
                       CAST(FLOOR(LN(
                           (COALESCE(c12.c12, 0) + 1)::DOUBLE
                           / (COALESCE(c1.c1, 0) + v.v)
                       ) * 1e9) AS BIGINT) AS term_fp
                FROM d_bi b
                LEFT JOIN c12 USING (w1, w2)
                LEFT JOIN c1 USING (w1)
                CROSS JOIN v
            ),
            agg AS (
                SELECT doc_id, COUNT(*) AS n_bigrams, SUM(term_fp) AS logprob_fp
                FROM terms GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
                   CAST(COALESCE(a.logprob_fp, 0) AS BIGINT) AS logprob_fp
            FROM d LEFT JOIN agg a USING (doc_id)
        """,
        "pack_sequences": """
            WITH t AS (
                SELECT source, doc_id,
                       CAST(CASE WHEN text IS NULL THEN 0
                            ELSE len(string_split(text, ' ')) END AS BIGINT)
                           AS n_tokens
                FROM documents
            )
            SELECT source, doc_id, n_tokens,
                   CAST(COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) // 1024 AS BIGINT) AS seq_index
            FROM t
        """,
        "quality_score": """
            WITH t AS (
                SELECT doc_id, text, len(string_split(text, ' ')) AS nw FROM documents
            )
            SELECT doc_id,
                   CAST(nw AS BIGINT) AS n_words,
                   CAST(length(text) - (nw - 1) AS DOUBLE) / nw AS mean_word_len,
                   CAST(len(list_filter(string_split(text, ' '),
                        w -> list_contains(['the','a','of','and','to','in','is'], w))) AS DOUBLE) / nw
                       AS stopword_ratio,
                   CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS DOUBLE) / length(text)
                       AS punct_ratio
            FROM t
        """,
        "dedup_embedding": """
            SELECT a.vec_id AS a, b.vec_id AS b,
                   ROUND(list_cosine_similarity(a.embedding, b.embedding), 4) AS sim
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
        """,
        "knn_topk": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qv FROM embeddings
                ORDER BY vec_id LIMIT 5
            ),
            sims AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(q.qv, e.embedding) AS sim
                FROM q CROSS JOIN embeddings e
                WHERE e.vec_id != q.query_id
            ),
            ranked AS (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
                ) AS rn
                FROM sims
            )
            SELECT query_id, neighbor_id, ROUND(sim, 4) AS sim
            FROM ranked WHERE rn <= 10
        """,
        "media_features": f"""
            SELECT url,
                   CAST(64 + octet_length(html) % 577 AS INTEGER) AS width,
                   CAST(64 + (octet_length(html) * 7) % 419 AS INTEGER) AS height,
                   CAST(octet_length(html) AS BIGINT) AS n_bytes
            FROM read_parquet('{path}')
        """,
        # image oracle: the query embeds doc_id % 3 images with dims
        # (16(k+1), 8(k+1)) → total px = Σ 128(k+1)² = 0 / 128 / 640
        "pdf_extract": """
            SELECT doc_id,
                   CAST(1 AS INTEGER) AS n_pages,
                   regexp_replace(text, '[^\x20-\x7e\n]', '', 'g') AS text,
                   CAST(doc_id % 3 AS INTEGER) AS n_images,
                   CAST(CASE doc_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 128
                        ELSE 640 END AS BIGINT) AS image_px
            FROM documents
        """,
        "asof_join": """
            WITH l AS (
                SELECT event_id, ts, user_id FROM events WHERE event_type = 'click'
            ),
            r0 AS (
                SELECT event_id, ts, user_id, value,
                       row_number() OVER (
                           PARTITION BY user_id, ts ORDER BY event_id DESC
                       ) AS rn
                FROM events WHERE event_type = 'purchase'
            ),
            r AS (SELECT * FROM r0 WHERE rn = 1)
            SELECT l.event_id AS event_id,
                   l.ts AS ts,
                   l.user_id AS user_id,
                   r.event_id AS match_event_id,
                   r.value AS match_value
            FROM l ASOF JOIN r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "range_join": """
            SELECT l.event_id AS event_id,
                   l.ts AS ts,
                   l.user_id AS user_id,
                   r.event_id AS match_event_id,
                   r.value AS match_value
            FROM (SELECT * FROM events WHERE event_type = 'click') l
            JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
              ON l.user_id = r.user_id
             AND r.ts >= l.ts
             AND r.ts <= l.ts + INTERVAL 1 HOUR
        """,
        "events_window": """
            SELECT event_type,
                   date_trunc('hour', ts) AS window_start,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
            FROM events
            GROUP BY 1, 2
        """,
        # hopping windows: 1 h windows every 30 min — each event in
        # exactly the two windows starting at floor30(ts) and
        # floor30(ts) − 30 min
        "events_hopping": """
            SELECT event_type,
                   time_bucket(INTERVAL 30 MINUTE, ts)
                     - CASE o.i WHEN 1 THEN INTERVAL 30 MINUTE
                       ELSE INTERVAL 0 MINUTE END AS window_start,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
            FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i) o
            GROUP BY 1, 2
        """,
        "link_head_preview": _LINKS_CTE.format(path=path)
        + f"""
            , heads AS (
                SELECT url,
                       COALESCE(regexp_extract(decode(html), '<title>([^<]*)</title>', 1), '') AS head_title
                FROM read_parquet('{path}')
            )
            SELECT l.src_url, l.href, h.head_title
            FROM links l JOIN heads h ON h.url = l.href
            WHERE l.internal
        """,
        "seed_cc": f"""
            WITH recs AS (
                SELECT url,
                       regexp_replace(url, '^https?://', '') AS canon,
                       mime, status
                FROM read_parquet('{_cc_index_glob(sf_dir)}')
            )
            SELECT DISTINCT url FROM recs
            WHERE (canon GLOB '*.example.com/*' OR canon GLOB 'example.com/*')
              AND status = 200 AND mime GLOB 'text/html*'
              AND (url GLOB '*/articles/*' OR canon GLOB '*/articles/*')
            ORDER BY url LIMIT 200
        """,
        "seed_urls": f"""
            WITH locs AS (
                SELECT unnest(regexp_extract_all(xml, '<loc>([^<]+)</loc>', 1)) AS url
                FROM read_parquet('{_sitemaps_glob(sf_dir)}')
                WHERE NOT is_index
            )
            SELECT url FROM locs WHERE url LIKE '%/articles/%'
        """,
        "crawl_delay_budget": f"""
            WITH lines AS (
                SELECT host, unnest(string_split(robots_txt, chr(10))) AS line
                FROM read_parquet('{_robots_seed_glob(sf_dir)}')
            ),
            d AS (
                SELECT host,
                       MIN(TRY_CAST(trim(regexp_extract(
                           line, '(?i)^crawl-delay:(.*)$', 1)) AS BIGINT)) AS delay
                FROM lines
                WHERE regexp_matches(line, '(?i)^crawl-delay:')
                GROUP BY host
            )
            SELECT h.host,
                   COALESCE(d.delay, 0) AS crawl_delay,
                   CASE WHEN d.delay IS NULL OR d.delay <= 0 THEN 1000
                        ELSE LEAST(1000, 600 // d.delay) END AS budget
            FROM (SELECT DISTINCT host
                  FROM read_parquet('{_robots_seed_glob(sf_dir)}')) h
            LEFT JOIN d USING (host)
        """,
        "seed_robots": f"""
            WITH lines AS (
                SELECT host, unnest(string_split(robots_txt, chr(10))) AS line
                FROM read_parquet('{_robots_seed_glob(sf_dir)}')
            ),
            disc AS (
                SELECT trim(regexp_extract(line, '(?i)^sitemap:(.*)$', 1)) AS sm
                FROM lines WHERE regexp_matches(line, '(?i)^sitemap:')
            ),
            roots AS (
                SELECT s.xml, s.is_index, s.sitemap_url
                FROM read_parquet('{_sitemaps_glob(sf_dir)}') s
                JOIN disc ON s.sitemap_url = disc.sm
            ),
            locs AS (
                SELECT unnest(regexp_extract_all(xml, '<loc>([^<]+)</loc>', 1)) AS loc
                FROM roots WHERE is_index
                UNION ALL
                SELECT sitemap_url AS loc FROM roots WHERE NOT is_index
            ),
            leaves AS (
                SELECT s.xml FROM read_parquet('{_sitemaps_glob(sf_dir)}') s
                JOIN locs ON s.sitemap_url = locs.loc
                WHERE NOT s.is_index
            ),
            urls AS (
                SELECT unnest(regexp_extract_all(xml, '<loc>([^<]+)</loc>', 1)) AS url
                FROM leaves
            )
            SELECT url FROM urls WHERE url LIKE '%/articles/%'
        """,
        "structured_extract": f"""
            WITH rows AS (
                SELECT url,
                       unnest(regexp_extract_all(decode(html),
                           '<tr><td>([^<]*)</td><td>[^<]*</td></tr>', 1)) AS item_key,
                       unnest(regexp_extract_all(decode(html),
                           '<tr><td>[^<]*</td><td>([^<]*)</td></tr>', 1)) AS item_value
                FROM read_parquet('{path}')
            )
            SELECT url, item_key, item_value FROM rows
        """,
        "sessionize": """
            WITH ordered AS (
                SELECT user_id, ts, value,
                       CASE WHEN LAG(ts) OVER w IS NULL
                                 OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            sess AS (
                SELECT user_id, ts, value,
                       SUM(new_session) OVER (
                           PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING
                       ) AS session_id
                FROM ordered
            )
            SELECT user_id,
                   CAST(session_id AS BIGINT) AS session_id,
                   MIN(ts) AS session_start,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
            FROM sess GROUP BY 1, 2
        """,
        "chunk_fixed": """
            WITH t AS (
                SELECT doc_id, len(string_split(text, ' ')) AS nw FROM documents
            ),
            e AS (
                SELECT doc_id, nw,
                       unnest(generate_series(0, CAST(ceil(nw / 50.0) AS INTEGER) - 1)) AS i
                FROM t
            )
            SELECT doc_id, CAST(i AS INTEGER) AS chunk_index,
                   CAST(LEAST(50, nw - 50 * i) AS BIGINT) AS n_chunk_words
            FROM e
        """,
    }
    # latest-capture snapshot dedup over the derived multi-capture
    # table (recrawl = +1 day, text || ' recrawl' for every third doc);
    # winner per url by (warc_ts, md5(text)) total order
    sql["latest_capture"] = f"""
        WITH captures AS (
            SELECT url, warc_ts, text FROM read_parquet('{path}')
            UNION ALL
            SELECT url, warc_ts + INTERVAL 1 DAY, text || ' recrawl'
            FROM read_parquet('{path}')
            WHERE TRY_CAST(regexp_extract(url, 'doc-([0-9]+)$', 1) AS INTEGER) % 3 = 0
        )
        SELECT url, warc_ts, text
        FROM captures
        QUALIFY row_number() OVER (
            PARTITION BY url ORDER BY warc_ts DESC, md5(text) DESC) = 1
    """

    # same derived multi-capture table as latest_capture; intervals
    # are queries.q_recrawl_schedule's (12 h changed / 48 h stable)
    sql["recrawl_schedule"] = f"""
        WITH captures AS (
            SELECT url, warc_ts, text FROM read_parquet('{path}')
            UNION ALL
            SELECT url, warc_ts + INTERVAL 1 DAY, text || ' recrawl'
            FROM read_parquet('{path}')
            WHERE TRY_CAST(regexp_extract(url, 'doc-([0-9]+)$', 1) AS INTEGER) % 3 = 0
        ),
        agg AS (
            SELECT url,
                   COUNT(*) AS n_captures,
                   COUNT(DISTINCT md5(text)) AS n_versions,
                   MAX(epoch_us(warc_ts)) AS last_ts_us
            FROM captures GROUP BY url
        )
        SELECT url, n_captures, n_versions,
               n_versions > 1 AS changed,
               last_ts_us + CASE WHEN n_versions > 1
                                 THEN 43200000000 ELSE 172800000000 END
                   AS next_fetch_us
        FROM agg
    """

    # anchor-text aggregation: per-page first-wins by NORMALIZED href
    # (document order), then count refs per (target, anchor text)
    sql["anchor_stats"] = f"""
        WITH pages AS (
            SELECT url, regexp_extract_all(decode(html),
                   '<a[^>]*href="[^"]+"[^>]*>[^<]*</a>') AS atags
            FROM read_parquet('{path}')
        ),
        z AS (
            SELECT url, unnest(list_zip(atags, range(1, len(atags) + 1))) AS p
            FROM pages
        ),
        raw AS (
            SELECT url AS src_url,
                   p[1]::VARCHAR AS atag,
                   p[2]::INTEGER AS i
            FROM z
        ),
        parsed AS (
            SELECT src_url, i,
                   regexp_replace(
                       regexp_extract(atag, 'href="([^"]+)"', 1),
                       '\\?utm_source=feed&utm_campaign=c[0-9]+&b=2&a=1$',
                       '?a=1&b=2') AS href,
                   regexp_extract(atag, '>([^<]*)</a>', 1) AS anchor,
                   regexp_extract(atag, 'href="([^"]+)"', 1)
                       NOT LIKE '%external-site.org%' AS internal
            FROM raw
        ),
        firsts AS (
            SELECT src_url, href, anchor
            FROM parsed
            WHERE internal
            QUALIFY row_number() OVER (
                PARTITION BY src_url, href ORDER BY i) = 1
        )
        SELECT href, anchor, COUNT(*) AS n_refs
        FROM firsts GROUP BY href, anchor
    """

    # integer fixed-point PageRank, 5 chained iterations (generated
    # CTEs mirror functions/graph.py's contract exactly: // is floor
    # division, both sides positive, dangling mass dropped)
    pr = _LINKS_CTE.format(path=path).rstrip() + f""",
nodes AS (SELECT url FROM read_parquet('{path}')),
edges AS (
    -- every-third-doc targets dropped: the synthetic graph is
    -- degree-regular, whose uniform rank is a fixed point of the
    -- update; the filter makes the iterations do real work
    SELECT DISTINCT l.src_url AS src, l.href AS dst
    FROM links l JOIN nodes n ON l.href = n.url
    WHERE l.internal AND l.src_url <> l.href
      AND COALESCE(TRY_CAST(regexp_extract(l.href, 'doc-([0-9]+)$', 1) AS INTEGER) % 3 <> 0, TRUE)
),
outdeg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
r0 AS (SELECT url, CAST(1000000 AS BIGINT) AS r FROM nodes)"""
    for t in range(1, 6):
        pr += f""",
r{t} AS (
    SELECT n.url,
           CAST(150000 + (85 * COALESCE(SUM(c.con), 0)) // 100 AS BIGINT) AS r
    FROM nodes n LEFT JOIN (
        SELECT e.dst, r{t - 1}.r // o.d AS con
        FROM edges e JOIN outdeg o ON e.src = o.src
        JOIN r{t - 1} ON r{t - 1}.url = e.src
    ) c ON c.dst = n.url
    GROUP BY n.url
)"""
    sql["pagerank"] = pr + '\nSELECT url, r AS "rank" FROM r5'

    # host-level pagerank: same integer fixed-point iteration over
    # distinct host->host edges (self-loops dropped), nodes = every
    # host on either side of any edge
    hr = _LINKS_CTE.format(path=path).rstrip() + """,
e0 AS (
    SELECT DISTINCT regexp_extract(src_url, 'https://([^/]+)', 1) AS src,
           regexp_extract(href, 'https://([^/]+)', 1) AS dst
    FROM links
),
edges AS (SELECT src, dst FROM e0 WHERE src <> dst),
nodes AS (SELECT DISTINCT h AS host FROM (
    SELECT src AS h FROM e0 UNION SELECT dst AS h FROM e0)),
outdeg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
r0 AS (SELECT host, CAST(1000000 AS BIGINT) AS r FROM nodes)"""
    for t in range(1, 6):
        hr += f""",
r{t} AS (
    SELECT n.host,
           CAST(150000 + (85 * COALESCE(SUM(c.con), 0)) // 100 AS BIGINT) AS r
    FROM nodes n LEFT JOIN (
        SELECT e.dst, r{t - 1}.r // o.d AS con
        FROM edges e JOIN outdeg o ON e.src = o.src
        JOIN r{t - 1} ON r{t - 1}.host = e.src
    ) c ON c.dst = n.host
    GROUP BY n.host
)"""
    sql["host_rank"] = hr + '\nSELECT host, r AS "rank" FROM r5'

    # weighted host pagerank: edge weight = distinct source pages per
    # host pair; contrib = r·w // Σ_out w (same floor-split kernel)
    hw = _LINKS_CTE.format(path=path).rstrip() + """,
t0 AS (
    SELECT DISTINCT src_url,
           regexp_extract(src_url, 'https://([^/]+)', 1) AS src,
           regexp_extract(href, 'https://([^/]+)', 1) AS dst
    FROM links
),
ew AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM t0
       WHERE src <> dst GROUP BY 1, 2),
nodes AS (SELECT DISTINCT h AS host FROM (
    SELECT src AS h FROM t0 UNION SELECT dst AS h FROM t0)),
outdeg AS (SELECT src, SUM(w) AS d FROM ew GROUP BY src),
r0 AS (SELECT host, CAST(1000000 AS BIGINT) AS r FROM nodes)"""
    for t in range(1, 6):
        hw += f""",
r{t} AS (
    SELECT n.host,
           CAST(150000 + (85 * COALESCE(SUM(c.con), 0)) // 100 AS BIGINT) AS r
    FROM nodes n LEFT JOIN (
        SELECT e.dst, (r{t - 1}.r * e.w) // o.d AS con
        FROM ew e JOIN outdeg o ON e.src = o.src
        JOIN r{t - 1} ON r{t - 1}.host = e.src
    ) c ON c.dst = n.host
    GROUP BY n.host
)"""
    sql["host_rank_weighted"] = hw + '\nSELECT host, r AS "rank" FROM r5'

    # host-level HITS (functions/graph.py:hits): alternating integer
    # sweeps over the same edges/nodes CTEs — auth from previous hubs,
    # hub from the NEW auths; normalizer = GREATEST(total // 10^6, 1)
    # (sum-to-~scale integer rescale; a positive per-round scalar, so
    # the ranking matches L2-normalized HITS)
    ht = _LINKS_CTE.format(path=path).rstrip() + """,
e0 AS (
    SELECT DISTINCT regexp_extract(src_url, 'https://([^/]+)', 1) AS src,
           regexp_extract(href, 'https://([^/]+)', 1) AS dst
    FROM links
),
edges AS (SELECT src, dst FROM e0 WHERE src <> dst),
nodes AS (SELECT DISTINCT h AS host FROM (
    SELECT src AS h FROM e0 UNION SELECT dst AS h FROM e0)),
h0 AS (SELECT host, CAST(1000000 AS BIGINT) AS s FROM nodes)"""
    for t in range(1, 4):
        ht += f""",
ar{t} AS (
    SELECT n.host, COALESCE(SUM(h{t - 1}.s), 0) AS s
    FROM nodes n
    LEFT JOIN edges e ON e.dst = n.host
    LEFT JOIN h{t - 1} ON h{t - 1}.host = e.src
    GROUP BY n.host
),
a{t} AS (
    SELECT host,
           CAST(s // GREATEST((SELECT SUM(s) FROM ar{t}) // 1000000, 1)
                AS BIGINT) AS s
    FROM ar{t}
),
hr{t} AS (
    SELECT n.host, COALESCE(SUM(a{t}.s), 0) AS s
    FROM nodes n
    LEFT JOIN edges e ON e.src = n.host
    LEFT JOIN a{t} ON a{t}.host = e.dst
    GROUP BY n.host
),
h{t} AS (
    SELECT host,
           CAST(s // GREATEST((SELECT SUM(s) FROM hr{t}) // 1000000, 1)
                AS BIGINT) AS s
    FROM hr{t}
)"""
    sql["host_hits"] = ht + """
SELECT h3.host, h3.s AS hub, a3.s AS auth
FROM h3 JOIN a3 ON a3.host = h3.host"""

    # knn_ivf probes every cluster in the driver query, and knn_lsh
    # probes the full Hamming ball, so both results are exactly the
    # brute-force top-k
    sql["knn_ivf"] = sql["knn_topk"]
    sql["knn_lsh"] = sql["knn_topk"]

    # ----------------------------------------------------- sketches
    # HyperLogLog over distinct hrefs: identical md5 bucketing and the
    # raw estimator's exact integer floor-divisions (HUGEINT keeps
    # 7213·m³·2^64 exact); rank = 57 - bit_length(h >> 8), DuckDB
    # bin() carries no leading zeros so length(bin(x)) = bit_length(x)
    sql["hll_distinct"] = _LINKS_CTE.format(path=path) + """
        , h AS (SELECT DISTINCT ('0x' || substr(md5(href), 1, 16))::UBIGINT AS h FROM links),
        r AS (
            SELECT CAST(h % 256 AS BIGINT) AS bucket,
                   CAST(CASE WHEN h >> 8 = 0 THEN 57
                        ELSE 57 - length(bin(h >> 8)) END AS BIGINT) AS rnk
            FROM h
        ),
        regs AS (SELECT bucket, MAX(rnk) AS rnk FROM r GROUP BY bucket),
        s AS (
            SELECT COUNT(*) AS n_nonzero,
                   SUM(CAST(1 AS HUGEINT) << (64 - rnk)) AS s_nz
            FROM regs
        )
        SELECT CAST(256 AS BIGINT) AS m,
               CAST(256 - n_nonzero AS BIGINT) AS n_zero,
               CAST((CAST(7213 AS HUGEINT) * 256 * 256 * 256 * (CAST(1 AS HUGEINT) << 64))
                    // (10 * (1000 * 256 + 1079)
                        * (s_nz + (256 - n_nonzero) * (CAST(1 AS HUGEINT) << 64)))
                    AS BIGINT) AS estimate
        FROM s
    """
    # exact all-pairs Jaccard with NO hot-token filter: the oracle for
    # the prefix-filtered path — equality proves the candidate
    # generation lossless, not just the verification
    sql["jaccard_prefix"] = """
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        d2 AS (SELECT doc_id, list_zip(ws, range(1, len(ws) + 1)) AS z FROM d),
        zz AS (SELECT doc_id, unnest(z) AS p FROM d2),
        w AS (
            SELECT doc_id, p[1]::VARCHAR AS w, p[2]::INTEGER AS i FROM zz
        ),
        sh AS (
            SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
            FROM w a
            JOIN w b ON b.doc_id = a.doc_id AND b.i = a.i + 1
            JOIN w c ON c.doc_id = a.doc_id AND c.i = a.i + 2
        ),
        counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS i
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT inter.a, inter.b,
               CAST(inter.i AS DOUBLE) / (ca.n + cb.n - inter.i) AS jaccard
        FROM inter
        JOIN counts ca ON ca.doc_id = inter.a
        JOIN counts cb ON cb.doc_id = inter.b
        WHERE CAST(inter.i AS DOUBLE) / (ca.n + cb.n - inter.i) >= 0.5
    """
    # per-hour top-3 event types, ties type-asc — the windowed top-k
    sql["window_topk"] = """
        WITH c AS (
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   COUNT(*) AS n_events
            FROM events GROUP BY 1, 2
        )
        SELECT window_start, event_type, n_events,
               CAST(row_number() OVER (
                   PARTITION BY window_start
                   ORDER BY n_events DESC, event_type) AS BIGINT) AS "rank"
        FROM c
        QUALIFY "rank" <= 3
    """
    # mixture sampling: per-source quota floor(w·total/1000) with
    # per-mille weight 10·(N%5+1) derived from the source name; same
    # seedless md5-rank as sample_per_group
    sql["mixture_sample"] = r"""
        WITH q AS (
            SELECT source,
                   LEAST(COUNT(*),
                         (CAST(regexp_extract(source, '(\d+)$', 1) AS INT) % 5 + 1)
                         * 10 * 400 // 1000) AS quota
            FROM documents GROUP BY source
        ),
        r AS (
            SELECT source, doc_id,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS sample_rank
            FROM documents
        )
        SELECT r.source, r.doc_id, CAST(r.sample_rank AS BIGINT) AS sample_rank
        FROM r JOIN q USING (source)
        WHERE r.sample_rank <= q.quota
    """
    # trailing RANGE-frame window per user: SQL window with RANGE
    # PRECEDING is the exact semantics (peers of the current row
    # included at both frame ends)
    sql["rolling_window"] = """
        SELECT event_id, user_id, ts,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_window,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
                   AS sum_cents_window
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING AND CURRENT ROW)
    """
    # per-host triangle counts: lexicographic enumeration (a<b<c via
    # two ascending joins) finds each triangle once, as does the Ray
    # side's degree-oriented enumeration — per-host contributions match
    sql["host_triangles"] = _LINKS_CTE.format(path=path) + """
        , hp AS (
            SELECT DISTINCT
                least(regexp_extract(src_url, 'https://([^/]+)', 1),
                      regexp_extract(href, 'https://([^/]+)', 1)) AS a,
                greatest(regexp_extract(src_url, 'https://([^/]+)', 1),
                         regexp_extract(href, 'https://([^/]+)', 1)) AS b
            FROM links
            WHERE regexp_extract(src_url, 'https://([^/]+)', 1)
                  <> regexp_extract(href, 'https://([^/]+)', 1)
              AND regexp_extract(src_url, 'https://([^/]+)', 1) <> ''
              AND regexp_extract(href, 'https://([^/]+)', 1) <> ''
        ),
        tri AS (
            SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM hp e1
            JOIN hp e2 ON e2.a = e1.a AND e2.b > e1.b
            JOIN hp e3 ON e3.a = e1.b AND e3.b = e2.b
        )
        SELECT host, CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM (SELECT x AS host FROM tri
              UNION ALL SELECT y FROM tri
              UNION ALL SELECT z FROM tri)
        GROUP BY 1
    """
    # conversion funnel: greedy ordered view→click→purchase per user
    # (each stage strictly after the previous); -1 sentinels keep the
    # output NULL-free for stable value hashes
    sql["funnel"] = """
        WITH f AS (
            SELECT user_id, ts, event_type FROM events
            WHERE event_type IN ('view', 'click', 'purchase')
        ),
        v AS (SELECT user_id, MIN(ts) AS t1 FROM f
              WHERE event_type = 'view' GROUP BY 1),
        c AS (SELECT f.user_id, MIN(f.ts) AS t2 FROM f
              JOIN v USING (user_id)
              WHERE f.event_type = 'click' AND f.ts > v.t1 GROUP BY 1),
        p AS (SELECT f.user_id, MIN(f.ts) AS t3 FROM f
              JOIN c USING (user_id)
              WHERE f.event_type = 'purchase' AND f.ts > c.t2 GROUP BY 1),
        u AS (SELECT DISTINCT user_id FROM f)
        SELECT u.user_id,
               CAST(CASE WHEN t3 IS NOT NULL THEN 3
                         WHEN t2 IS NOT NULL THEN 2
                         WHEN t1 IS NOT NULL THEN 1
                         ELSE 0 END AS BIGINT) AS funnel_stage,
               COALESCE(CAST(epoch_us(t1) AS BIGINT), -1) AS t_view_us,
               COALESCE(CAST(epoch_us(t2) AS BIGINT), -1) AS t_click_us,
               COALESCE(CAST(epoch_us(t3) AS BIGINT), -1) AS t_purchase_us
        FROM u LEFT JOIN v USING (user_id)
               LEFT JOIN c USING (user_id)
               LEFT JOIN p USING (user_id)
    """
    # distributed Lloyd k-means (functions/clustering.py): fixed-point
    # integers (floor(v·10^6)), seed centroids = vec_id < 8, 2 update
    # rounds then a final assignment; argmin ties → smallest cid;
    # centroid update = floor(sum/count) (SQL floor(s::DOUBLE/n) is
    # exact while |s| < 2^53 — sums here are ≤ N·6e5).  Chained CTEs
    # replay the BSP rounds exactly, like the pagerank oracle.
    km = """
        WITH x AS (
            SELECT vec_id, t.i AS d,
                   CAST(floor(CAST(embedding[CAST(t.i AS INT) + 1] AS DOUBLE)
                              * 1000000) AS BIGINT) AS v
            FROM embeddings, range(0, 64) t(i)
        ),
        c0 AS (SELECT vec_id AS cid, d, v FROM x WHERE vec_id < 8)"""
    for t in range(2):
        km += f""",
        a{t} AS (
            SELECT vec_id, cid FROM (
                SELECT x.vec_id, c.cid,
                       SUM((x.v - c.v) * (x.v - c.v)) AS dist
                FROM x JOIN c{t} c ON c.d = x.d
                GROUP BY x.vec_id, c.cid
            ) QUALIFY row_number() OVER (
                PARTITION BY vec_id ORDER BY dist, cid) = 1
        ),
        c{t + 1} AS (
            SELECT a{t}.cid, x.d,
                   CAST(floor(SUM(x.v)::DOUBLE / COUNT(*)) AS BIGINT) AS v
            FROM x JOIN a{t} ON a{t}.vec_id = x.vec_id
            GROUP BY a{t}.cid, x.d
        )"""
    km += """,
        af AS (
            SELECT vec_id, cid FROM (
                SELECT x.vec_id, c.cid,
                       SUM((x.v - c.v) * (x.v - c.v)) AS dist
                FROM x JOIN c2 c ON c.d = x.d
                GROUP BY x.vec_id, c.cid
            ) QUALIFY row_number() OVER (
                PARTITION BY vec_id ORDER BY dist, cid) = 1
        )
        SELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM af"""
    sql["kmeans_assign"] = km

    # per-cluster medoid after the same fit: keep the assignment
    # round's distance, then argmin (dist, vec_id) per cluster
    kmed = """
        WITH x AS (
            SELECT vec_id, t.i AS d,
                   CAST(floor(CAST(embedding[CAST(t.i AS INT) + 1] AS DOUBLE)
                              * 1000000) AS BIGINT) AS v
            FROM embeddings, range(0, 64) t(i)
        ),
        c0 AS (SELECT vec_id AS cid, d, v FROM x WHERE vec_id < 8)"""
    for t in range(2):
        kmed += f""",
        a{t} AS (
            SELECT vec_id, cid FROM (
                SELECT x.vec_id, c.cid,
                       SUM((x.v - c.v) * (x.v - c.v)) AS dist
                FROM x JOIN c{t} c ON c.d = x.d
                GROUP BY x.vec_id, c.cid
            ) QUALIFY row_number() OVER (
                PARTITION BY vec_id ORDER BY dist, cid) = 1
        ),
        c{t + 1} AS (
            SELECT a{t}.cid, x.d,
                   CAST(floor(SUM(x.v)::DOUBLE / COUNT(*)) AS BIGINT) AS v
            FROM x JOIN a{t} ON a{t}.vec_id = x.vec_id
            GROUP BY a{t}.cid, x.d
        )"""
    kmed += """,
        afd AS (
            SELECT vec_id, cid, dist FROM (
                SELECT x.vec_id, c.cid,
                       SUM((x.v - c.v) * (x.v - c.v)) AS dist
                FROM x JOIN c2 c ON c.d = x.d
                GROUP BY x.vec_id, c.cid
            ) QUALIFY row_number() OVER (
                PARTITION BY vec_id ORDER BY dist, cid) = 1
        )
        SELECT CAST(cid AS BIGINT) AS cluster,
               vec_id AS medoid_id,
               CAST(dist AS BIGINT) AS d2
        FROM afd QUALIFY row_number() OVER (
            PARTITION BY cid ORDER BY dist, vec_id) = 1"""
    sql["kmeans_medoids"] = kmed
    # SemDeDup: deterministic centroids (vec_id < 8), argmax-cosine
    # assignment (ties → min cid = numpy argmax first-max), drop any
    # vector with a smaller-id near-dup (cosine ≥ 0.4) in its cluster
    sql["semantic_dedup"] = """
        WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
        sims AS (
            SELECT e.vec_id, c.cid, list_cosine_similarity(e.embedding, c.cv) AS sim
            FROM embeddings e CROSS JOIN c
        ),
        asg AS (
            SELECT vec_id, cid AS cluster FROM sims
            QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) = 1
        ),
        dropped AS (
            SELECT DISTINCT y.vec_id AS b
            FROM asg x
            JOIN asg y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
            JOIN embeddings ex ON ex.vec_id = x.vec_id
            JOIN embeddings ey ON ey.vec_id = y.vec_id
            WHERE list_cosine_similarity(ex.embedding, ey.embedding) >= 0.4
        )
        SELECT a.vec_id, a.cluster, d.b IS NULL AS keep
        FROM asg a LEFT JOIN dropped d ON d.b = a.vec_id
    """
    # count-min sketch over events.user_id: same d=4 × w=512 cell
    # hashes (md5 of 'i|key'), estimate = min over rows; every probe
    # occupies its own cells so the join always matches
    sql["cms_counts"] = """
        WITH rows_i AS (SELECT unnest(generate_series(0, 3)) AS i),
        cells AS (
            SELECT i,
                   ('0x' || substr(md5(CAST(i AS VARCHAR) || '|' || CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT % 512 AS j,
                   COUNT(*) AS cnt
            FROM events CROSS JOIN rows_i
            GROUP BY 1, 2
        ),
        probes AS (
            SELECT user_id, COUNT(*) AS true_count
            FROM events WHERE user_id % 97 = 0 GROUP BY 1
        )
        SELECT p.user_id, p.true_count, CAST(MIN(c.cnt) AS BIGINT) AS est_count
        FROM probes p
        CROSS JOIN rows_i t
        JOIN cells c
          ON c.i = t.i
         AND c.j = ('0x' || substr(md5(CAST(t.i AS VARCHAR) || '|' || CAST(p.user_id AS VARCHAR)), 1, 16))::UBIGINT % 512
        GROUP BY 1, 2
    """

    # --------------------------------------------------- curation ops
    # (plain-string concatenation: the regexes carry {m,n} quantifiers
    # that an f-string would eat)
    _email = r"[\w.+-]+@[\w-]+\.[\w.-]+"
    _phone = r"\(?\d{3}\)?[ -. ]?\d{3}[ -. ]?\d{4}"
    _ip = r"(?:\d{1,3}\.){3}\d{1,3}"
    sql["pii_scrub"] = (
        "WITH p AS (SELECT url, decode(html) AS t FROM read_parquet('"
        + path
        + "'))\n"
        "SELECT url,\n"
        "  regexp_replace(regexp_replace(regexp_replace(t,\n"
        "     '" + _email + "', '[EMAIL]', 'g'),\n"
        "     '" + _phone + "', '[PHONE]', 'g'),\n"
        "     '" + _ip + "', '[IP]', 'g') AS scrubbed,\n"
        "  len(regexp_extract_all(t, '" + _email + "')) AS n_email,\n"
        "  len(regexp_extract_all(t, '" + _phone + "')) AS n_phone,\n"
        "  len(regexp_extract_all(t, '" + _ip + "')) AS n_ip\n"
        "FROM p"
    )
    # 4-word-shingle CTE shared by decontaminate (same tokenization as
    # the jaccard family: split on a single space)
    sql["decontaminate"] = """
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        d2 AS (SELECT doc_id, list_zip(ws, range(1, len(ws) + 1)) AS z FROM d),
        zz AS (SELECT doc_id, unnest(z) AS p FROM d2),
        w AS (SELECT doc_id, p[1]::VARCHAR AS w, p[2]::INTEGER AS i FROM zz),
        sh AS (
            SELECT DISTINCT a.doc_id,
                   a.w || ' ' || b.w || ' ' || c.w || ' ' || e.w AS s
            FROM w a
            JOIN w b ON b.doc_id = a.doc_id AND b.i = a.i + 1
            JOIN w c ON c.doc_id = a.doc_id AND c.i = a.i + 2
            JOIN w e ON e.doc_id = a.doc_id AND e.i = a.i + 3
        ),
        bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 17 = 0),
        ov AS (
            SELECT sh.doc_id, COUNT(*) AS n
            FROM sh JOIN bench USING (s)
            WHERE sh.doc_id % 17 <> 0
            GROUP BY sh.doc_id
        )
        SELECT c.doc_id,
               COALESCE(ov.n, 0) AS n_overlap,
               COALESCE(ov.n, 0) >= 10 AS contaminated
        FROM (SELECT doc_id FROM documents WHERE doc_id % 17 <> 0) c
        LEFT JOIN ov ON ov.doc_id = c.doc_id
    """
    sql["gopher_quality"] = """
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        d2 AS (SELECT doc_id, list_zip(ws, range(1, len(ws) + 1)) AS z FROM d),
        zz AS (SELECT doc_id, unnest(z) AS p FROM d2),
        w AS (SELECT doc_id, p[1]::VARCHAR AS w, p[2]::INTEGER AS i FROM zz),
        stats AS (
            SELECT doc_id, COUNT(*) AS nw, COUNT(DISTINCT w) AS nd
            FROM w GROUP BY doc_id
        ),
        g2 AS (
            SELECT a.doc_id, a.w || ' ' || b.w AS g, COUNT(*) AS cnt
            FROM w a JOIN w b ON b.doc_id = a.doc_id AND b.i = a.i + 1
            GROUP BY 1, 2
        ),
        g2c AS (SELECT doc_id, MAX(cnt) AS mx, SUM(cnt) AS tot FROM g2 GROUP BY doc_id),
        g3 AS (
            SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS g, COUNT(*) AS cnt
            FROM w a
            JOIN w b ON b.doc_id = a.doc_id AND b.i = a.i + 1
            JOIN w c ON c.doc_id = a.doc_id AND c.i = a.i + 2
            GROUP BY 1, 2
        ),
        g3c AS (SELECT doc_id, MAX(cnt) AS mx, SUM(cnt) AS tot FROM g3 GROUP BY doc_id)
        SELECT s.doc_id,
               s.nw AS n_words,
               1 - CAST(s.nd AS DOUBLE) / s.nw AS dup_word_frac,
               COALESCE(CAST(g2c.mx AS DOUBLE) / g2c.tot, 0.0) AS top_2gram_frac,
               COALESCE(CAST(g3c.mx AS DOUBLE) / g3c.tot, 0.0) AS top_3gram_frac,
               (COALESCE(CAST(g2c.mx AS DOUBLE) / g2c.tot, 0.0) <= 0.20
                AND COALESCE(CAST(g3c.mx AS DOUBLE) / g3c.tot, 0.0) <= 0.18
                AND 1 - CAST(s.nd AS DOUBLE) / s.nw <= 0.6) AS keep
        FROM stats s
        LEFT JOIN g2c ON g2c.doc_id = s.doc_id
        LEFT JOIN g3c ON g3c.doc_id = s.doc_id
    """
    sql["gopher_filters"] = """
        WITH w AS (
            SELECT doc_id, text, string_split(text, ' ') AS ws
            FROM documents
        ),
        s AS (
            SELECT doc_id, text,
                   len(ws) AS n_words,
                   CAST(list_sum(list_transform(ws, x -> length(x))) AS BIGINT) AS sum_word_len,
                   len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha_words,
                   len(list_filter(ws, x -> list_contains(
                       ['the','a','of','to','and','in','is','that','it','with'], x))) AS n_stop
            FROM w
        )
        SELECT doc_id,
               n_words,
               sum_word_len,
               n_alpha_words,
               n_stop,
               (n_words BETWEEN 30 AND 90
                AND 10 * sum_word_len BETWEEN 40 * n_words AND 50 * n_words
                AND 5 * n_alpha_words >= 4 * n_words
                AND n_stop >= 3
                AND NOT contains(text, 'lorem ipsum')
                AND NOT contains(text, '{')) AS passed
        FROM s
    """
    sql["ccnet_normalize"] = r"""
        SELECT doc_id,
               trim(regexp_replace(
                   regexp_replace(
                       nfc_normalize(strip_accents(lower(text))),
                       '[0-9]', '0', 'g'),
                   '[ \t\n\r\f]+', ' ', 'g')) AS norm_text,
               CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits
        FROM documents
    """
    sql["dedup_normalized"] = r"""
        WITH n AS (
            SELECT doc_id,
                   trim(regexp_replace(
                       regexp_replace(
                           nfc_normalize(strip_accents(lower(text))),
                           '[0-9]', '0', 'g'),
                       '[ \t\n\r\f]+', ' ', 'g')) AS norm_text
            FROM documents
        )
        SELECT MIN(doc_id) AS doc_id FROM n GROUP BY md5(norm_text)
    """
    sql["weighted_sample"] = """
        WITH s AS (
            SELECT doc_id,
                   LEAST(len(list_filter(string_split(text, ' '),
                       x -> list_contains(
                           ['the','a','of','to','and','in','is','that','it','with'], x))),
                       8) AS weight,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
                        % 8 AS BIGINT) AS h
            FROM documents
        )
        SELECT doc_id, weight, h < weight AS keep FROM s
    """
    sql["split_assign"] = """
        SELECT doc_id, bucket,
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
            SELECT doc_id,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
                        % 100 AS BIGINT) AS bucket
            FROM documents
        )
    """
    # seedless stratified sample: rank within group by the md5 hex
    # string of the decimal id (lexicographic = Ray side's sort on the
    # same hexdigest), tie-broken by id
    sql["sample_per_group"] = """
        SELECT source, doc_id, sample_rank
        FROM (
            SELECT source, doc_id,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS sample_rank
            FROM documents
        )
        WHERE sample_rank <= 5
    """
    sql["length_quantiles"] = """
        WITH d AS (SELECT len(string_split(text, ' ')) AS nw FROM documents),
        v AS (
            SELECT quantile_disc(nw, [0.25, 0.5, 0.75, 0.9, 0.99]) AS vs FROM d
        )
        SELECT ([0.25, 0.5, 0.75, 0.9, 0.99])[i] AS q,
               CAST(vs[i] AS BIGINT) AS value
        FROM v, (SELECT unnest(range(1, 6)) AS i) idx
    """
    sql["dsir_select"] = """
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        d2 AS (SELECT doc_id, list_zip(ws, range(1, len(ws) + 1)) AS z FROM d),
        zz AS (SELECT doc_id, unnest(z) AS p FROM d2),
        w AS (SELECT doc_id, p[1]::VARCHAR AS w, p[2]::INTEGER AS i FROM zz),
        g AS (
            SELECT a.doc_id,
                   ('0x' || substr(md5(a.w || ' ' || b.w), 1, 16))::UBIGINT
                       % 65536 AS bucket
            FROM w a JOIN w b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        ),
        bc AS (
            SELECT bucket,
                   SUM(CASE WHEN doc_id % 17 = 0 THEN 1 ELSE 0 END) AS ct,
                   SUM(CASE WHEN doc_id % 17 <> 0 THEN 1 ELSE 0 END) AS cr
            FROM g GROUP BY bucket
        ),
        tot AS (SELECT SUM(ct) AS nt, SUM(cr) AS nr FROM bc),
        scored AS (
            SELECT g.doc_id, COUNT(*) AS n_grams,
                   SUM(CASE WHEN bc.ct * tot.nr > bc.cr * tot.nt
                       THEN 1 ELSE 0 END) AS n_target_like
            FROM g JOIN bc USING (bucket) CROSS JOIN tot
            WHERE g.doc_id % 17 <> 0
            GROUP BY g.doc_id
        )
        SELECT r.doc_id,
               CAST(COALESCE(s.n_grams, 0) AS BIGINT) AS n_grams,
               CAST(COALESCE(s.n_target_like, 0) AS BIGINT) AS n_target_like,
               2 * COALESCE(s.n_target_like, 0) >= COALESCE(s.n_grams, 0) AS selected
        FROM (SELECT doc_id FROM documents WHERE doc_id % 17 <> 0) r
        LEFT JOIN scored s ON s.doc_id = r.doc_id
    """
    # dedup impact report (queries.py:q_dedup_summary)
    sql["dedup_summary"] = r"""
        WITH h AS (
            SELECT md5(text) AS h,
                   md5(trim(regexp_replace(
                       regexp_replace(
                           nfc_normalize(strip_accents(lower(text))),
                           '[0-9]', '0', 'g'),
                       '[ \t\n\r\f]+', ' ', 'g'))) AS nh
            FROM documents
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(COUNT(DISTINCT h) AS BIGINT) AS n_distinct_exact,
                   CAST(COUNT(DISTINCT nh) AS BIGINT) AS n_distinct_norm
            FROM h
        )
        SELECT n_docs, n_distinct_exact, n_distinct_norm,
               CAST(1000 * (n_docs - n_distinct_exact) // n_docs AS BIGINT)
                   AS exact_dup_permille,
               CAST(1000 * (n_distinct_exact - n_distinct_norm) // n_docs
                    AS BIGINT) AS norm_extra_permille
        FROM s
    """
    # deterministic UA rotation + Sec-CH-UA derivation
    # (frontier/user_agents.py); catalog interpolated from the module
    # so the oracle can't drift; hints derived INDEPENDENTLY via
    # regexp CASE mirroring the reference rule set
    from .frontier.user_agents import DEFAULT_UA_CATALOG as _UAS

    _cat_values = ", ".join(
        f"({i}, '{ua}')" for i, ua in enumerate(_UAS)
    )
    sql["ua_assign"] = f"""
        WITH cat(idx, ua) AS (VALUES {_cat_values}),
        p AS (
            SELECT url,
                   CAST(('0x' || substr(md5(url), 1, 16))::UBIGINT
                        % {len(_UAS)} AS BIGINT) AS ua_idx
            FROM read_parquet('{path}')
        ),
        j AS (SELECT p.url, p.ua_idx, c.ua FROM p JOIN cat c ON c.idx = p.ua_idx)
        SELECT url, ua_idx, ua AS user_agent,
               CASE
                 WHEN regexp_matches(ua, 'Chrome/') AND regexp_matches(ua, 'Edg/')
                   THEN '"Chromium";v="' || regexp_extract(ua, 'Chrome/(\\d+)', 1)
                        || '", "Not_A Brand";v="8", "Microsoft Edge";v="'
                        || regexp_extract(ua, 'Edg/(\\d+)', 1) || '"'
                 WHEN regexp_matches(ua, 'Chrome/')
                   THEN '"Chromium";v="' || regexp_extract(ua, 'Chrome/(\\d+)', 1)
                        || '", "Not_A Brand";v="8", "Google Chrome";v="'
                        || regexp_extract(ua, 'Chrome/(\\d+)', 1) || '"'
                 WHEN regexp_matches(ua, 'Firefox/') THEN '""'
                 WHEN regexp_matches(ua, 'Version/')
                   THEN '"Safari";v="' || regexp_extract(ua, 'Version/(\\d+)', 1)
                        || '", "Not_A Brand";v="8"'
                 ELSE '' END AS sec_ch_ua
        FROM j
    """
    # minhash estimator calibration (queries.py:q_minhash_calibration):
    # exact-Jaccard truth pairs × 16-perm md5-minima signatures
    sql["minhash_calibration"] = """
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        d2 AS (SELECT doc_id, list_zip(ws, range(1, len(ws) + 1)) AS z FROM d),
        zz AS (SELECT doc_id, unnest(z) AS p FROM d2),
        w AS (SELECT doc_id, p[1]::VARCHAR AS w, p[2]::INTEGER AS i FROM zz),
        sh AS (
            SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
            FROM w a
            JOIN w b ON b.doc_id = a.doc_id AND b.i = a.i + 1
            JOIN w c ON c.doc_id = a.doc_id AND c.i = a.i + 2
        ),
        counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS i
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        truth AS (
            SELECT inter.a, inter.b,
                   CAST(inter.i AS DOUBLE) / (ca.n + cb.n - inter.i) AS jaccard
            FROM inter
            JOIN counts ca ON ca.doc_id = inter.a
            JOIN counts cb ON cb.doc_id = inter.b
            WHERE CAST(inter.i AS DOUBLE) / (ca.n + cb.n - inter.i) >= 0.5
        ),
        sig AS (
            SELECT sh.doc_id, t.p,
                   MIN(('0x' || substr(md5(CAST(t.p AS VARCHAR) || '|' || sh.s),
                        1, 16))::UBIGINT) AS m
            FROM sh, range(0, 16) t(p)
            GROUP BY 1, 2
        )
        SELECT truth.a, truth.b, truth.jaccard,
               CAST(SUM(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END)
                    * 1000000 // 16 AS BIGINT) AS est_ppm
        FROM truth
        JOIN sig sa ON sa.doc_id = truth.a
        JOIN sig sb ON sb.doc_id = truth.b AND sb.p = sa.p
        GROUP BY 1, 2, 3
    """
    # session-length histogram (queries.py:q_session_stats): the
    # sessionize oracle rolled up by events-per-session
    sql["session_stats"] = """
        WITH ordered AS (
            SELECT user_id, ts,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING
                   ) AS session_id
            FROM ordered
        ),
        sizes AS (
            SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events
            FROM sess GROUP BY 1, 2
        )
        SELECT n_events, CAST(COUNT(*) AS BIGINT) AS n_sessions
        FROM sizes GROUP BY n_events
    """
    # URL path-depth histogram (queries.py:q_url_depth_hist)
    sql["url_depth_hist"] = f"""
        WITH d AS (
            SELECT CAST(len(list_filter(
                       string_split(
                           regexp_replace(url, '^[a-z]+://[^/]*', ''), '/'),
                       x -> x <> '')) AS BIGINT) AS depth
            FROM read_parquet('{path}')
        )
        SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_urls
        FROM d GROUP BY depth
    """
    # per-doc character entropy (queries.py:q_text_entropy); logs
    # fixed-pointed before the weighted sum; all terms non-negative
    sql["text_entropy"] = """
        WITH ch AS (
            SELECT doc_id, unnest(string_split(text, '')) AS c
            FROM documents
        ),
        cc AS (SELECT doc_id, c, CAST(COUNT(*) AS BIGINT) AS v
               FROM ch GROUP BY 1, 2),
        nn AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n
               FROM documents),
        e AS (
            SELECT cc.doc_id,
                   CAST(SUM(cc.v * CAST(floor(ln(nn.n::DOUBLE / cc.v)
                                        * 1000000) AS BIGINT))
                        // MAX(nn.n) AS BIGINT) AS entropy_upm
            FROM cc JOIN nn USING (doc_id) GROUP BY cc.doc_id
        )
        SELECT nn.doc_id,
               COALESCE(e.entropy_upm, 0) AS entropy_upm,
               (COALESCE(e.entropy_upm, 0) < 1500000
                OR COALESCE(e.entropy_upm, 0) > 4500000) AS flagged
        FROM nn LEFT JOIN e USING (doc_id)
    """
    # int8 embedding quantization integrity scalars
    # (queries.py:q_quantize_embeddings); floor(x::DOUBLE/s) == the
    # numpy signed floor-div here (|x| < 2^53, gap 1/s >> ulp)
    sql["quantize_embeddings"] = """
        WITH x AS (
            SELECT vec_id, t.i AS d,
                   CAST(floor(CAST(embedding[CAST(t.i AS INT) + 1] AS DOUBLE)
                              * 1000000) AS BIGINT) AS v
            FROM embeddings, range(0, 64) t(i)
        ),
        s AS (SELECT vec_id, MAX(ABS(v)) AS sc FROM x GROUP BY 1),
        q AS (
            SELECT x.vec_id, x.d, s.sc,
                   CAST(floor((x.v * 127)::DOUBLE / s.sc) AS BIGINT) AS q
            FROM x JOIN s USING (vec_id) WHERE s.sc > 0
        ),
        agg AS (
            SELECT vec_id, MAX(sc) AS scale_int,
                   SUM(q * (d + 1)) AS q_checksum,
                   SUM(ABS(q)) AS q_l1
            FROM q GROUP BY vec_id
        )
        SELECT s.vec_id,
               CAST(COALESCE(a.scale_int, 0) AS BIGINT) AS scale_int,
               CAST(COALESCE(a.q_checksum, 0) AS BIGINT) AS q_checksum,
               CAST(COALESCE(a.q_l1, 0) AS BIGINT) AS q_l1
        FROM s LEFT JOIN agg a USING (vec_id)
    """
    # deterministic frame sampling over opaque payloads
    # (multimodal.py:FrameSampler): one frame per 4096-char span
    # capped at 5; digest = md5-u64 of the 64-char window mod 2^62
    sql["frame_sample"] = f"""
        WITH p AS (SELECT url, decode(html) AS t FROM read_parquet('{path}')),
        n AS (
            SELECT url, t,
                   LEAST(GREATEST(1, (length(t) + 4095) // 4096), 5) AS nf
            FROM p
        ),
        f AS (SELECT url, t, unnest(range(0, nf)) AS frame_idx FROM n)
        SELECT url,
               CAST(frame_idx AS BIGINT) AS frame_idx,
               CAST(frame_idx * 4096 AS BIGINT) AS byte_offset,
               CAST(('0x' || substr(md5(substr(t, CAST(frame_idx AS INT) * 4096 + 1, 64)),
                     1, 16))::UBIGINT % 4611686018427387904 AS BIGINT)
                   AS frame_digest
        FROM f
    """
    # language-ID confusion matrix (queries.py:q_lang_confusion):
    # the lang_id detector replay joined onto the declared lang
    sql["lang_confusion"] = (
        sql["lang_id"].rstrip()
        .replace(
            "SELECT doc_id,\n"
            "                   CASE WHEN score > 0.02 THEN lang ELSE 'und' END AS pred_lang,\n"
            "                   score AS lang_score\n"
            "            FROM ranked",
            "SELECT d.lang AS declared_lang,\n"
            "                   CASE WHEN r.score > 0.02 THEN r.lang ELSE 'und' END AS pred_lang,\n"
            "                   CAST(COUNT(*) AS BIGINT) AS n_docs\n"
            "            FROM ranked r JOIN documents d USING (doc_id)\n"
            "            GROUP BY 1, 2",
        )
    )
    assert "declared_lang" in sql["lang_confusion"], "lang_id oracle drifted"
    # per-host sitemap coverage audit (queries.py:q_sitemap_coverage)
    sql["sitemap_coverage"] = f"""
        WITH crawled AS (
            SELECT DISTINCT regexp_extract(url, 'https://([^/]+)', 1) AS host,
                   url
            FROM read_parquet('{path}')
        ),
        locs AS (
            SELECT DISTINCT
                   unnest(regexp_extract_all(xml, '<loc>([^<]+)</loc>', 1)) AS surl
            FROM read_parquet('{_sitemaps_glob(sf_dir)}')
            WHERE NOT is_index
        )
        SELECT c.host,
               CAST(COUNT(*) AS BIGINT) AS n_pages,
               CAST(SUM(CASE WHEN l.surl IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_listed,
               CAST(1000 * SUM(CASE WHEN l.surl IS NOT NULL THEN 1 ELSE 0 END)
                    // COUNT(*) AS BIGINT) AS coverage_permille
        FROM crawled c LEFT JOIN locs l ON l.surl = c.url
        GROUP BY c.host
    """
    # vocabulary growth curve (queries.py:q_vocab_growth): first
    # occurrence per token bucketed by doc-id decile, cumsum'd
    sql["vocab_growth"] = """
        WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
        f AS (
            SELECT w, MIN(doc_id) AS first_doc FROM (
                SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
                FROM documents
            ) GROUP BY w
        ),
        d AS (SELECT unnest(range(1, 11)) AS decile),
        counts AS (
            SELECT d.decile,
                   d.decile * n.n_docs // 10 - 1 AS cutoff_doc_id,
                   (SELECT COUNT(*) FROM f
                    WHERE f.first_doc <= d.decile * n.n_docs // 10 - 1)
                       AS vocab_size
            FROM d, n
        )
        SELECT CAST(decile AS BIGINT) AS decile,
               CAST(cutoff_doc_id AS BIGINT) AS cutoff_doc_id,
               CAST(vocab_size AS BIGINT) AS vocab_size
        FROM counts
    """
    # unigram KL divergence src0 ‖ src1 (queries.py:q_kl_divergence):
    # per-token log-ratio fixed-pointed BEFORE the weighted sum
    sql["kl_divergence"] = """
        WITH w AS (
            SELECT source, unnest(string_split(text, ' ')) AS token
            FROM documents WHERE source IN ('src0', 'src1')
        ),
        c AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS n
              FROM w GROUP BY 1, 2),
        t AS (SELECT
                  (SELECT SUM(n) FROM c WHERE source = 'src0') AS ta,
                  (SELECT SUM(n) FROM c WHERE source = 'src1') AS tb,
                  (SELECT COUNT(DISTINCT token) FROM c) AS v),
        a AS (SELECT token, n AS ca FROM c WHERE source = 'src0'),
        b AS (SELECT token, n AS cb FROM c WHERE source = 'src1'),
        contrib AS (
            SELECT a.ca
                   * CAST(floor(ln((a.ca * (t.tb + t.v))::DOUBLE
                                / (t.ta * (COALESCE(b.cb, 0) + 1)))
                                * 1000000) AS BIGINT) AS s
            FROM a LEFT JOIN b USING (token) CROSS JOIN t
        )
        SELECT 'src0' AS src_a, 'src1' AS src_b,
               CAST(t.ta AS BIGINT) AS t_a, CAST(t.tb AS BIGINT) AS t_b,
               CAST(t.v AS BIGINT) AS vocab,
               CAST((SELECT SUM(s) FROM contrib) // t.ta AS BIGINT) AS kl_ppm
        FROM t
    """
    # BM25 retrieval (queries.py:q_bm25_search): k1=6/5, b=3/4 make
    # the per-term weight exactly rational; Lucene idf (always
    # positive — Python // floors, DuckDB // truncates, so sign
    # matters), tfidf floor(ln·1e6) convention
    sql["bm25_search"] = """
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        stats AS (SELECT COUNT(*) AS n, SUM(len(ws)) AS toks FROM d),
        c AS (SELECT n, toks // n AS avgdl FROM stats),
        w AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS w FROM d),
        tfr AS (
            SELECT doc_id, dl, w, CAST(COUNT(*) AS BIGINT) AS tf
            FROM w WHERE w IN ('spark', 'vector') GROUP BY 1, 2, 3
        ),
        dfs AS (SELECT w, COUNT(*) AS df FROM tfr GROUP BY 1),
        idf AS (
            SELECT dfs.w,
                   CAST(floor(ln((2 * c.n + 2)::DOUBLE
                              / (2 * dfs.df + 1)) * 1000000) AS BIGINT)
                       AS idf_fp
            FROM dfs, c
        ),
        contrib AS (
            SELECT t.doc_id,
                   (i.idf_fp * (44 * t.tf * c.avgdl))
                       // (20 * c.avgdl * t.tf + 6 * c.avgdl + 18 * t.dl) AS s
            FROM tfr t JOIN idf i ON i.w = t.w CROSS JOIN c
        )
        SELECT doc_id, CAST(SUM(s) AS BIGINT) AS score_fp
        FROM contrib GROUP BY 1
        ORDER BY score_fp DESC, doc_id LIMIT 20
    """
    # corpus report card (queries.py:q_corpus_report): Gopher gate ×
    # lang rollup — same rule set as gopher_filters
    sql["corpus_report"] = """
        WITH w AS (
            SELECT doc_id, lang, text, n_chars,
                   string_split(text, ' ') AS ws
            FROM documents
        ),
        s AS (
            SELECT lang, n_chars,
                   len(ws) AS n_words,
                   CAST(list_sum(list_transform(ws, x -> length(x)))
                        AS BIGINT) AS sum_word_len,
                   len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
                       AS n_alpha_words,
                   len(list_filter(ws, x -> list_contains(
                       ['the','a','of','to','and','in','is','that','it','with'],
                       x))) AS n_stop,
                   (len(ws) BETWEEN 30 AND 90
                    AND 10 * list_sum(list_transform(ws, x -> length(x)))
                        BETWEEN 40 * len(ws) AND 50 * len(ws)
                    AND 5 * len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
                        >= 4 * len(ws)
                    AND len(list_filter(ws, x -> list_contains(
                        ['the','a','of','to','and','in','is','that','it','with'],
                        x))) >= 3
                    AND NOT contains(text, 'lorem ipsum')
                    AND NOT contains(text, '{')) AS passed
            FROM w
        )
        SELECT lang, passed,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_words) AS BIGINT) AS n_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM s GROUP BY lang, passed
    """
    # host in-degree histogram (queries.py:q_degree_hist)
    sql["degree_hist"] = _LINKS_CTE.format(path=path).rstrip() + """,
e0 AS (
    SELECT DISTINCT regexp_extract(src_url, 'https://([^/]+)', 1) AS src,
           regexp_extract(href, 'https://([^/]+)', 1) AS dst
    FROM links
),
edges AS (SELECT src, dst FROM e0 WHERE src <> dst),
nodes AS (SELECT DISTINCT h AS host FROM (
    SELECT src AS h FROM e0 UNION SELECT dst AS h FROM e0)),
deg AS (
    SELECT n.host, CAST(COUNT(e.src) AS BIGINT) AS indegree
    FROM nodes n LEFT JOIN edges e ON e.dst = n.host
    GROUP BY n.host
)
SELECT indegree, CAST(COUNT(*) AS BIGINT) AS n_hosts
FROM deg GROUP BY indegree"""
    # KMV distinct sketch over link targets (sketches.py:kmv_distinct)
    sql["kmv_distinct"] = _LINKS_CTE.format(path=path).rstrip() + """,
h0 AS (SELECT DISTINCT ('0x' || substr(md5(href), 1, 16))::UBIGINT AS h
       FROM links),
kk AS (SELECT h FROM h0 ORDER BY h LIMIT 256),
s AS (SELECT COUNT(*) AS n_kept, MAX(h) AS kth FROM kk)
SELECT CAST(256 AS BIGINT) AS k,
       CAST(n_kept AS BIGINT) AS n_kept,
       CAST(CASE WHEN n_kept < 256 THEN n_kept
            ELSE (255 * (CAST(1 AS HUGEINT) << 64)) // kth END AS BIGINT)
           AS estimate
FROM s"""
    # per-user Markov transition counts (queries.py:q_event_transitions)
    sql["event_transitions"] = """
        WITH o AS (
            SELECT user_id, event_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS nxt
            FROM events
        )
        SELECT event_type AS prev_type, nxt AS next_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2
    """
    # per-source sufficient statistics (queries.py:q_suffstats)
    sql["suffstats"] = """
        WITH s AS (
            SELECT source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
                   CAST(len(list_filter(string_split(text, ' '),
                       w -> list_contains(
                           ['the','a','of','to','and','in','is','that','it','with'],
                           w))) AS BIGINT) AS y
            FROM documents
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sum_x,
               CAST(SUM(y) AS BIGINT) AS sum_y,
               CAST(SUM(x * y) AS BIGINT) AS sum_xy,
               CAST(SUM(x * x) AS BIGINT) AS sum_xx,
               CAST(SUM(y * y) AS BIGINT) AS sum_yy
        FROM s GROUP BY source
    """
    # weekly cohort retention (queries.py:q_cohort_retention)
    sql["cohort_retention"] = """
        WITH p AS (
            SELECT DISTINCT user_id, date_trunc('week', ts) AS week
            FROM events
        ),
        f AS (SELECT user_id, MIN(week) AS cohort_week FROM p GROUP BY 1)
        SELECT f.cohort_week, p.week AS active_week,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM p JOIN f USING (user_id) GROUP BY 1, 2
    """
    # boolean-AND term search (queries.py:q_term_search)
    sql["term_search"] = """
        WITH w AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents
        ),
        tf AS (
            SELECT doc_id, w, COUNT(*) AS tf FROM w
            WHERE w IN ('spark', 'vector') GROUP BY 1, 2
        ),
        d AS (
            SELECT doc_id, COUNT(*) AS n_terms, SUM(tf) AS score
            FROM tf GROUP BY 1
        )
        SELECT doc_id, CAST(score AS BIGINT) AS score
        FROM d WHERE n_terms = 2
        ORDER BY score DESC, doc_id LIMIT 20
    """
    # per-source boilerplate strip (curation.py:boilerplate_strip):
    # 8-word chunk lines; pf = COUNT(DISTINCT doc) per (source, line);
    # pf >= 2 ⇒ drop all occurrences; space-join reassembly
    sql["boilerplate_strip"] = """
        WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS ws
                   FROM documents),
        idx AS (SELECT doc_id, source, ws,
                       unnest(range(0, len(ws), 8)) AS s FROM d),
        lines AS (
            SELECT doc_id, source, (s // 8)::INTEGER AS pos,
                   array_to_string(ws[s + 1 : s + 8], ' ') AS line
            FROM idx
        ),
        pf AS (
            SELECT source, line, COUNT(DISTINCT doc_id) AS pf
            FROM lines GROUP BY 1, 2
        ),
        kept AS (
            SELECT l.doc_id, l.pos, l.line
            FROM lines l JOIN pf ON pf.source = l.source AND pf.line = l.line
            WHERE pf.pf < 2
        ),
        tot AS (SELECT doc_id, COUNT(*) AS n_total FROM lines GROUP BY 1)
        SELECT t.doc_id,
               COALESCE(string_agg(k.line, ' ' ORDER BY k.pos), '') AS text,
               t.n_total - COUNT(k.line) AS n_removed
        FROM tot t LEFT JOIN kept k USING (doc_id)
        GROUP BY t.doc_id, t.n_total
    """
    # link-rot audit (queries.py:q_dangling_links): links whose href
    # is absent from the crawled page set, rolled up per source host
    sql["dangling_links"] = _LINKS_CTE.format(path=path).rstrip() + f""",
l AS (
    SELECT regexp_extract(src_url, 'https://([^/]+)', 1) AS host, href
    FROM links
),
p AS (SELECT DISTINCT url FROM read_parquet('{path}')),
j AS (
    SELECT l.host, p.url IS NOT NULL AS ok
    FROM l LEFT JOIN p ON p.url = l.href
)
SELECT host,
       CAST(COUNT(*) AS BIGINT) AS n_links,
       CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) AS n_dangling,
       CAST(1000 * SUM(CASE WHEN ok THEN 0 ELSE 1 END) // COUNT(*) AS BIGINT)
           AS dangling_permille
FROM j GROUP BY host"""
    # reciprocal-rank fusion of integer dot-product + squared-L2
    # rankings over fixed-point floor(v·10^6) vectors
    # (functions/similarity.py:knn_rrf); integer 10^9//(60+rank)
    # contributions over the two top-20 lists, fused top-10 — all
    # integer, so ranks and the cutoff replay exactly
    sql["knn_rrf"] = """
        WITH x AS (
            SELECT vec_id, t.i AS d,
                   CAST(floor(CAST(embedding[CAST(t.i AS INT) + 1] AS DOUBLE)
                              * 1000000) AS BIGINT) AS v
            FROM embeddings, range(0, 64) t(i)
        ),
        qids AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 5),
        sims AS (
            SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                   SUM(q.v * e.v) AS dot,
                   SUM((q.v - e.v) * (q.v - e.v)) AS l2
            FROM x q JOIN x e ON e.d = q.d
            WHERE q.vec_id IN (SELECT vec_id FROM qids)
              AND e.vec_id != q.vec_id
            GROUP BY 1, 2
        ),
        rc AS (
            SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY dot DESC, neighbor_id
            ) AS r FROM sims QUALIFY r <= 20
        ),
        rd_ AS (
            SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY l2 ASC, neighbor_id
            ) AS r FROM sims QUALIFY r <= 20
        ),
        fused AS (
            SELECT COALESCE(rc.query_id, rd_.query_id) AS query_id,
                   COALESCE(rc.neighbor_id, rd_.neighbor_id) AS neighbor_id,
                   COALESCE(1000000000 // (60 + rc.r), 0)
                       + COALESCE(1000000000 // (60 + rd_.r), 0) AS rrf_score
            FROM rc FULL OUTER JOIN rd_
                USING (query_id, neighbor_id)
        )
        SELECT query_id, neighbor_id, CAST(rrf_score AS BIGINT) AS rrf_score
        FROM fused
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY rrf_score DESC, neighbor_id
        ) <= 10
    """
    # per-type p99 winsorization (queries.py:q_group_clip);
    # quantile_disc matches the histogram cumulative-walk index rule
    sql["group_clip"] = """
        WITH e AS (
            SELECT event_id, event_type,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
        ),
        c AS (
            SELECT event_type, quantile_disc(cents, 0.99) AS cut
            FROM e GROUP BY 1
        )
        SELECT e.event_id, e.event_type, e.cents,
               LEAST(e.cents, c.cut) AS cents_clipped
        FROM e JOIN c USING (event_type)
    """
    # grouped HLL distinct users per event type (hll_distinct_by):
    # same hash/rank/estimator as hll_distinct, GROUP BY added
    sql["hll_by_type"] = """
        WITH p AS (SELECT DISTINCT event_type, user_id FROM events),
        h AS (
            SELECT event_type,
                   ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT AS h
            FROM p
        ),
        r AS (
            SELECT event_type, CAST(h % 256 AS BIGINT) AS bucket,
                   CAST(CASE WHEN h >> 8 = 0 THEN 57
                        ELSE 57 - length(bin(h >> 8)) END AS BIGINT) AS rnk
            FROM h
        ),
        regs AS (
            SELECT event_type, bucket, MAX(rnk) AS rnk FROM r GROUP BY 1, 2
        ),
        s AS (
            SELECT event_type, COUNT(*) AS n_nonzero,
                   SUM(CAST(1 AS HUGEINT) << (64 - rnk)) AS s_nz
            FROM regs GROUP BY 1
        )
        SELECT event_type,
               CAST(256 AS BIGINT) AS m,
               CAST(256 - n_nonzero AS BIGINT) AS n_zero,
               CAST((CAST(7213 AS HUGEINT) * 256 * 256 * 256 * (CAST(1 AS HUGEINT) << 64))
                    // (10 * (1000 * 256 + 1079)
                        * (s_nz + (256 - n_nonzero) * (CAST(1 AS HUGEINT) << 64)))
                    AS BIGINT) AS estimate
        FROM s
    """
    # JSON props schema-on-read aggregate (queries.py:q_props_stats)
    sql["props_stats"] = """
        WITH p AS (
            SELECT event_type,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(k) AS BIGINT) AS sum_k,
               CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k
        FROM p GROUP BY event_type
    """
    # rank-based quality blend (functions/curation.py:rank_blend):
    # rank = #docs with strictly smaller value = RANK() - 1
    sql["rank_blend"] = """
        WITH s AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
                   CAST(len(list_filter(string_split(text, ' '),
                       x -> list_contains(
                           ['the','a','of','to','and','in','is','that','it','with'],
                           x))) AS BIGINT) AS n_stop
            FROM documents
        )
        SELECT doc_id, n_words, n_stop,
               CAST(RANK() OVER (ORDER BY n_words) - 1 AS BIGINT) AS rank_len,
               CAST(RANK() OVER (ORDER BY n_stop) - 1 AS BIGINT) AS rank_stop,
               CAST((RANK() OVER (ORDER BY n_words) - 1)
                    + (RANK() OVER (ORDER BY n_stop) - 1) AS BIGINT) AS blend
        FROM s
    """
    # BFS hop distance from seed hosts (functions/graph.py:hop_distance):
    # fixed rounds of (join, +1, union, min) over the same edges/nodes
    # CTEs as host_rank; unreached hosts absent
    hd = _LINKS_CTE.format(path=path).rstrip() + """,
e0 AS (
    SELECT DISTINCT regexp_extract(src_url, 'https://([^/]+)', 1) AS src,
           regexp_extract(href, 'https://([^/]+)', 1) AS dst
    FROM links
),
edges AS (SELECT src, dst FROM e0 WHERE src <> dst),
nodes AS (SELECT DISTINCT h AS host FROM (
    SELECT src AS h FROM e0 UNION SELECT dst AS h FROM e0)),
d0 AS (SELECT host, CAST(0 AS BIGINT) AS dist FROM nodes
       WHERE host LIKE 'site0.%')"""
    for t in range(1, 4):
        hd += f""",
c{t} AS (
    SELECT e.dst AS host, MIN(d{t - 1}.dist) + 1 AS dist
    FROM edges e JOIN d{t - 1} ON d{t - 1}.host = e.src
    GROUP BY e.dst
),
d{t} AS (
    SELECT host, CAST(MIN(dist) AS BIGINT) AS dist FROM (
        SELECT host, dist FROM d{t - 1}
        UNION ALL SELECT host, dist FROM c{t}
    ) GROUP BY host
)"""
    sql["host_distance"] = hd + "\nSELECT host, dist FROM d3"

    # per-doc n-gram novelty (functions/curation.py:novelty_score):
    # same 3-gram shingle convention as the Jaccard family; common ⇔
    # corpus df ≥ 2; novel ⇔ 2·n_common ≤ n_shingles
    sql["novelty_score"] = """
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        d2 AS (SELECT doc_id, list_zip(ws, range(1, len(ws) + 1)) AS z FROM d),
        zz AS (SELECT doc_id, unnest(z) AS p FROM d2),
        w AS (SELECT doc_id, p[1]::VARCHAR AS w, p[2]::INTEGER AS i FROM zz),
        sh AS (
            SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
            FROM w a
            JOIN w b ON b.doc_id = a.doc_id AND b.i = a.i + 1
            JOIN w c ON c.doc_id = a.doc_id AND c.i = a.i + 2
        ),
        df AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY s)
        SELECT sh.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_common,
               2 * SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) <= COUNT(*)
                   AS novel
        FROM sh JOIN df ON df.s = sh.s
        GROUP BY sh.doc_id
    """
    # hourly event-rate spike detection (queries.py:q_rate_anomaly):
    # spike ⇔ 2·n·H > 3·C (count > 1.5× the type's mean over its
    # active hours), integer cross-multiplied — no float mean
    sql["rate_anomaly"] = """
        WITH h AS (
            SELECT event_type, date_trunc('hour', ts) AS window_start,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1, 2
        ),
        t AS (
            SELECT event_type, CAST(SUM(n_events) AS BIGINT) AS type_total,
                   CAST(COUNT(*) AS BIGINT) AS type_hours
            FROM h GROUP BY 1
        )
        SELECT h.event_type, h.window_start, h.n_events,
               t.type_total, t.type_hours,
               2 * h.n_events * t.type_hours > 3 * t.type_total AS spike
        FROM h JOIN t USING (event_type)
    """
    # end-to-end curation composition (queries.py:q_curate_pipeline):
    # the four component oracles chained — CCNet normalization,
    # md5-grouped min-id dedup, the Gopher/C4 rule set, then the
    # pack_sequences exclusive-cumsum assignment over survivors only
    sql["curate_pipeline"] = r"""
        WITH n AS (
            SELECT doc_id,
                   trim(regexp_replace(
                       regexp_replace(
                           nfc_normalize(strip_accents(lower(text))),
                           '[0-9]', '0', 'g'),
                       '[ \t\n\r\f]+', ' ', 'g')) AS norm_text
            FROM documents
        ),
        win AS (SELECT MIN(doc_id) AS doc_id FROM n GROUP BY md5(norm_text)),
        sv AS (
            SELECT d.doc_id, d.source, d.text,
                   string_split(d.text, ' ') AS ws
            FROM documents d JOIN win USING (doc_id)
        ),
        s AS (
            SELECT doc_id, source, text,
                   len(ws) AS n_words,
                   CAST(list_sum(list_transform(ws, x -> length(x)))
                        AS BIGINT) AS sum_word_len,
                   len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
                       AS n_alpha_words,
                   len(list_filter(ws, x -> list_contains(
                       ['the','a','of','to','and','in','is','that','it','with'],
                       x))) AS n_stop
            FROM sv
        ),
        kept AS (
            SELECT source, doc_id,
                   CAST(n_words AS BIGINT) AS n_tokens
            FROM s
            WHERE n_words BETWEEN 30 AND 90
              AND 10 * sum_word_len BETWEEN 40 * n_words AND 50 * n_words
              AND 5 * n_alpha_words >= 4 * n_words
              AND n_stop >= 3
              AND NOT contains(text, 'lorem ipsum')
              AND NOT contains(text, '{')
        )
        SELECT source, doc_id, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) // 1024 AS BIGINT) AS seq_index
        FROM kept
    """
    # PMI collocations (functions/textstats.py:pmi_pairs): pairs are
    # same-doc tokens at distance 1..3, canonicalized lexicographically
    # (UTF-8 byte order == codepoint order, matching numpy/Arrow);
    # lift_ppm = floor(n_pair·T²·10⁶ / (P·n_a·n_b)) in HUGEINT so the
    # intermediate (~1e19 at sf0.01) cannot overflow BIGINT.  The
    # (lift, n_pair, tok_a, tok_b) order is total → deterministic top-100.
    sql["pmi_pairs"] = """
        WITH d AS (SELECT string_split(text, ' ') AS ws
                   FROM documents WHERE text IS NOT NULL AND text <> ''),
        d2 AS (SELECT row_number() OVER () AS doc,
                      list_zip(ws, range(1, len(ws) + 1)) AS z FROM d),
        zz AS (SELECT doc, unnest(z) AS p FROM d2),
        w AS (SELECT doc, p[1]::VARCHAR AS w, p[2]::BIGINT AS i FROM zz),
        pr AS (
            SELECT LEAST(a.w, b.w) AS tok_a, GREATEST(a.w, b.w) AS tok_b,
                   COUNT(*) AS n_pair
            FROM w a JOIN w b
              ON b.doc = a.doc AND b.i > a.i AND b.i <= a.i + 3
            GROUP BY 1, 2
        ),
        uni AS (SELECT w AS token, COUNT(*) AS n FROM w GROUP BY 1),
        tot AS (SELECT (SELECT CAST(SUM(n) AS HUGEINT) FROM uni) AS t_toks,
                       (SELECT CAST(SUM(n_pair) AS HUGEINT) FROM pr) AS p_pairs)
        SELECT pr.tok_a, pr.tok_b, CAST(pr.n_pair AS BIGINT) AS n_pair,
               CAST((CAST(pr.n_pair AS HUGEINT) * t_toks * t_toks * 1000000)
                    // (p_pairs * ua.n * ub.n) AS BIGINT) AS lift_ppm
        FROM pr
        JOIN uni ua ON ua.token = pr.tok_a
        JOIN uni ub ON ub.token = pr.tok_b
        CROSS JOIN tot
        WHERE pr.n_pair >= 10
        ORDER BY lift_ppm DESC, n_pair DESC, tok_a, tok_b
        LIMIT 100
    """
    # Adaptive crawls: exact iteration-by-iteration replays (see
    # _adaptive_stat_sql / _adaptive_emb_sql — the embedding variant
    # became SQL-expressible when the stand-in embedder switched its
    # token hash to md5, which DuckDB ships).
    sql["adaptive_crawl"] = _adaptive_stat_sql(path)
    sql["adaptive_crawl_embedding"] = _adaptive_emb_sql(path)
    # CosineStrategy clustering (functions/cosine.py): with the
    # q_semantic_cluster defaults (no semantic_filter), every kept
    # chunk has filter_sim 1.0, and on this corpus each document is a
    # single chunk (no '\n\n' separators), so each doc's greedy
    # clustering is the trivial single-vector case: cluster_id 0.  If
    # the corpus ever grows multi-chunk docs this oracle mismatches
    # loudly (engine emits one row per chunk).  The multi-chunk
    # clustering path is covered by tests/test_structured.py; this
    # oracle pins the chunk-gate semantics (>= 5 whitespace words,
    # stripped chunk) exactly.
    sql["semantic_cluster"] = """
        SELECT 'doc://' || doc_id AS url,
               CAST(0 AS INTEGER) AS cluster_id,
               trim(text) AS chunk,
               1.0 AS filter_sim
        FROM documents
        WHERE text IS NOT NULL
          AND len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) >= 5
    """
    sql["cert_audit"] = _cert_audit_sql()
    return sql


def _cert_audit_sql() -> str:
    """cert_audit: recompute the deterministic cert-field derivation
    (queries.q_cert_audit) directly in SQL — the Ray side must arrive
    at the same values THROUGH the DER writer+parser round trip."""
    return """
        WITH c AS (
            SELECT doc_id,
                   'doc-' || doc_id || '.example.com' AS cn,
                   CAST(('0x' || substr(md5('doc-' || doc_id || '.example.com'), 1, 12))::UBIGINT AS BIGINT) AS serial
            FROM documents
        ), d AS (
            SELECT doc_id, cn, serial,
                   DATE '2015-01-01' + CAST(serial % 3653 AS INT) AS nb
            FROM c
        )
        SELECT 'doc://' || doc_id AS url,
               cn AS subject_cn,
               'Synthetic Root CA' AS issuer_cn,
               serial,
               strftime(nb, '%Y%m%d') || '000000Z' AS not_before,
               strftime(nb + CAST(90 + serial % 640 AS INT), '%Y%m%d') || '000000Z' AS not_after,
               CAST(1 + doc_id % 3 AS INTEGER) AS n_sans,
               (doc_id % 17 = 0) AS is_ca,
               'sha256WithRSAEncryption' AS sig_alg,
               CAST(3 AS INTEGER) AS version
        FROM d
        ORDER BY url
    """
