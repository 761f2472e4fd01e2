"""docweb — deterministic synthetic web derived from the `documents` table.

Purpose: the driver's correctness gate runs each Spark query against an
ANSI-SQL DuckDB oracle over the same parquet tables.  A live crawl is not
SQL-expressible — unless the web graph itself is an arithmetic function of
a table both engines read.  docweb IS that function: page URLs, statuses,
and every link in every HTML body are pure formulas of `doc_id` (mod-N
arithmetic), so

  * the Spark side builds real HTML bodies (JVM-side concat — no UDF) and
    runs the REAL engine end-to-end: politeness window, fetch join, Arrow
    HTML parse, canonicalization, anti-join dedup, rank;
  * the DuckDB side derives the same edge set arithmetically and computes
    the reachable set with a recursive CTE.

If the two agree at sf=0.01, every stage of the real pipeline agreed with
an independent implementation.

Page template (i = doc_id, N = row count, B = http://site-{i%3}.test):

  head: [i%4==0] <link rel=canonical href=B/page/i>         (self — match)
        [i%4==1] <link rel=canonical href=B/canon/i>        (mismatch)
        [i%5∈{2,3}] <meta name=description content='d'*((i*7)%250)>
        [i%9==6] <style>… url('http://cdn.test/bg/{i%20}.png') …</style>
  body: <a B/page/{(i+1)%N}>  <a url((i*31+7)%N)>  <a "/page/{(i*13+1)%N}">
        [i%7==2]  <a B/missing/i>          (dead link)
        [i%11==4] <a mailto:user{i}@example.test>
        [i%5==3]  <script src="/js/app-{i%7}.js">
        [i%4==1]  <img src="http://cdn.test/img/{(i*3)%60}.bin">

  status(i): i<3→200 (seeds); i%17==3→404; ==5→301; ==7→500; ==11→0(err);
             ==13→302; else 200.  Only status-200 pages have bodies.

Seeds: pages 0,1,2 (one per host) → every host is in-site.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkkchecker_net_spark import schemas

N_HOSTS = 3


def _i():
    return F.col("doc_id").cast("long")


def host_expr(i):
    return F.concat(F.lit("site-"), (i % N_HOSTS).cast("string"), F.lit(".test"))


def url_expr(i):
    return F.concat(F.lit("http://"), host_expr(i), F.lit("/page/"), i.cast("string"))


def status_expr(i):
    m = i % 17
    return (
        F.when(i < 3, F.lit(200))
        .when(m == 3, F.lit(404))
        .when(m == 5, F.lit(301))
        .when(m == 7, F.lit(500))
        .when(m == 11, F.lit(0))
        .when(m == 13, F.lit(302))
        .otherwise(F.lit(200))
    )


def _opt(cond, col):
    return F.when(cond, col).otherwise(F.lit(""))


def _url_of(j):
    """URL of page index expression j (same formula as url_expr)."""
    return F.concat(
        F.lit("http://site-"),
        (j % N_HOSTS).cast("string"),
        F.lit(".test/page/"),
        j.cast("string"),
    )


def redirect_to_expr(i, n: int):
    """Location header for the 3xx pages (reference: the C# engine follows
    HttpWebResponse redirects transparently; here the Location edge is
    first-class so redirect CHAINS are analyzable).

    * 301 pages (i%17==5) hop to pseudo-random page (i*7+3)%n — the target
      may itself be a 3xx page, producing multi-hop chains that sometimes
      terminate and sometimes fall into a cycle;
    * 302 pages (i%17==13) pair up into deliberate 2-cycles: consecutive
      302 indices point at each other (i <-> i+17, parity of (i-13)/17
      tested integer-only via (i-13)%34), so the redirect graph ALWAYS
      contains loops for resolve_redirects to classify.  The last 302
      page keeps no Location when its partner index >= n.

    Mirrored byte-exactly by REDIR_CTE.
    """
    m = i % 17
    j301 = (i * 7 + 3) % n
    pair_even = (i - 13) % 34 == 0
    j302 = F.when(pair_even, i + 17).otherwise(i - 17)
    tgt = (
        F.when((m == 5) & (i >= 3), j301)
        .when((m == 13) & (i >= 3) & (j302 < n), j302)
    )
    return F.when(tgt.isNotNull(), _url_of(tgt))


def body_expr(i, n: int, extra_links: int = 0, filler: int = 0):
    """Page HTML.  extra_links/filler are BENCH-ONLY knobs (realistic page
    weight: tens of links, multi-KB text) — the sf-dir oracle contract uses
    the default light body."""
    base = F.concat(F.lit("http://"), host_expr(i))
    j1 = (i + 1) % n
    j2 = (i * 31 + 7) % n
    j3 = (i * 13 + 1) % n
    extras = []
    for k in range(extra_links):
        jk = (i * (53 + 2 * k) + 11 * k + 3) % n
        extras.append(
            F.concat(F.lit(f'<p>filler {k} lorem ipsum</p><a href="'), url_expr(jk), F.lit(f'">e{k}</a>'))
        )
    if filler:
        extras.append(F.repeat(F.lit("lorem ipsum dolor sit amet, consectetur "), filler // 40))
    s = F.concat(
        F.lit("<html><head>"),
        _opt(
            i % 4 == 0,
            F.concat(F.lit('<link rel="canonical" href="'), url_expr(i), F.lit('"/>')),
        ),
        _opt(
            i % 4 == 1,
            F.concat(
                F.lit('<link rel="canonical" href="'),
                base,
                F.lit("/canon/"),
                i.cast("string"),
                F.lit('"/>'),
            ),
        ),
        _opt(
            (i % 5 == 2) | (i % 5 == 3),
            F.concat(
                F.lit('<meta name="description" content="'),
                F.repeat(F.lit("d"), ((i * 7) % 250).cast("int")),
                F.lit('"/>'),
            ),
        ),
        _opt(
            i % 9 == 6,
            F.concat(
                F.lit("<style>.h{background-image:url('http://cdn.test/bg/"),
                (i % 20).cast("string"),
                F.lit(".png');}</style>"),
            ),
        ),
        F.lit("</head><body>"),
        F.concat(F.lit('<a href="'), url_expr(j1), F.lit('">n</a>')),
        F.concat(F.lit('<a href="'), url_expr(j2), F.lit('">x</a>')),
        F.concat(F.lit('<a href="/page/'), j3.cast("string"), F.lit('">y</a>')),
        _opt(
            i % 7 == 2,
            F.concat(F.lit('<a href="'), base, F.lit("/missing/"), i.cast("string"), F.lit('">d</a>')),
        ),
        _opt(
            i % 11 == 4,
            F.concat(F.lit('<a href="mailto:user'), i.cast("string"), F.lit('@example.test">m</a>')),
        ),
        _opt(
            i % 5 == 3,
            F.concat(F.lit('<script src="/js/app-'), (i % 7).cast("string"), F.lit('.js"></script>')),
        ),
        _opt(
            i % 4 == 1,
            F.concat(F.lit('<img src="http://cdn.test/img/'), ((i * 3) % 60).cast("string"), F.lit('.bin"/>')),
        ),
        *extras,
        F.lit("</body></html>"),
    )
    return s


def doc_count(spark: SparkSession, sf_dir: str) -> int:
    return spark.read.parquet(f"{sf_dir}/documents.parquet").count()


def build_web(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The docweb `web` table: one row per document-page, HTML bodies built
    entirely JVM-side (status-200 pages only)."""
    n = doc_count(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return build_web_from_ids(docs, n)


def build_web_for_bench(
    spark: SparkSession,
    n_pages: int,
    partitions: int = 64,
    extra_links: int = 40,
    filler: int = 4000,
) -> DataFrame:
    """Bench-scale docweb from spark.range — same formulas, realistic page
    weight (≈45 links + ~4 KB text/page; real pages are heavier still)."""
    ids = spark.range(0, n_pages, 1, partitions).select(F.col("id").alias("doc_id"))
    return build_web_from_ids(ids, n_pages, extra_links=extra_links, filler=filler)


def build_web_from_ids(
    docs: DataFrame, n: int, extra_links: int = 0, filler: int = 0
) -> DataFrame:
    i = _i()
    status = status_expr(i)
    body = body_expr(i, n, extra_links=extra_links, filler=filler)
    return docs.select(
        url_expr(i).alias("url"),
        F.xxhash64(url_expr(i)).alias("url_hash"),
        host_expr(i).alias("host"),
        status.alias("status"),
        redirect_to_expr(i, n).cast("string").alias("redirect_to"),
        F.when(status == 200, F.lit("text/html")).alias("content_type"),
        F.when(status == 200, F.encode(body, "UTF-8")).alias("body"),
        F.lit(None).cast("string").alias("image_id"),
        F.lit(None).cast("string").alias("caption"),
    )


def seeds(n: int = N_HOSTS) -> list[dict]:
    """Seed list: pages 0..n-1 (n=3 → one per host, the oracle contract;
    bench uses a wider seed set to shorten BFS warm-up)."""
    return [
        {"seed_url": f"http://site-{h % N_HOSTS}.test/page/{h}", "priority": 0}
        for h in range(n)
    ]


def saturated_seed_df(spark: SparkSession, n: int, partitions: int = 32) -> DataFrame:
    """Every URL the n-page docweb can ever reach, as a seed DataFrame for
    `CrawlDriver.init_seeds_df` — pages plus every formulaic link-target
    family except unsupported schemes (those stay parse-discovered).

    Purpose: the steady-state throughput/scaling benchmark.  With the full
    reachable set seeded, the whole crawl is ONE saturated epoch — the
    10^10-frontier steady state — instead of a BFS ramp whose trailing
    dead-link epoch is mostly fixed cost.  Columns: idx, seed_url, priority.
    """
    ids = spark.range(0, n, 1, partitions).select(F.col("id").alias("doc_id"))
    i = _i()
    base = F.concat(F.lit("http://"), host_expr(i))
    fams = [
        (0, None, url_expr(i)),
        (1, i % 7 == 2, F.concat(base, F.lit("/missing/"), i.cast("string"))),
        (2, i % 4 == 1, F.concat(base, F.lit("/canon/"), i.cast("string"))),
        (3, i % 5 == 3, F.concat(base, F.lit("/js/app-"), (i % 7).cast("string"), F.lit(".js"))),
        (4, i % 4 == 1, F.concat(F.lit("http://cdn.test/img/"), ((i * 3) % 60).cast("string"), F.lit(".bin"))),
        (5, i % 9 == 6, F.concat(F.lit("http://cdn.test/bg/"), (i % 20).cast("string"), F.lit(".png"))),
        # link #2 is host-RELATIVE ('/page/j'), so it resolves on the
        # parent's host — 2/3 of these land on the wrong site and are dead
        (6, None, F.concat(base, F.lit("/page/"), ((i * 13 + 1) % n).cast("string"))),
    ]
    parts = []
    for k, cond, url in fams:
        d = ids if cond is None else ids.filter(cond)
        parts.append(
            d.select(
                (i + F.lit(k * n)).alias("idx"),
                url.alias("seed_url"),
                F.lit(0).alias("priority"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def empty_robots(spark: SparkSession) -> DataFrame:
    # spark.range(0), not createDataFrame([], schema): an empty
    # createDataFrame still parallelizes defaultParallelism python
    # partitions, so the driver's robots-emptiness probe pays a python
    # worker round trip per core (~1.4s at 4 cores); range(0) is a pure
    # JVM empty relation
    df = spark.range(0)
    return df.select(
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in schemas.ROBOTS.fields]
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL fragments (shared by several oracle queries)
# ---------------------------------------------------------------------------

# page table: index, url, status — mirrors url_expr/status_expr exactly
PAGE_CTE = """
page AS (
  SELECT doc_id::BIGINT AS i,
         'http://site-' || (doc_id % 3) || '.test/page/' || doc_id AS url,
         CASE WHEN doc_id < 3 THEN 200
              WHEN doc_id % 17 = 3 THEN 404
              WHEN doc_id % 17 = 5 THEN 301
              WHEN doc_id % 17 = 7 THEN 500
              WHEN doc_id % 17 = 11 THEN 0
              WHEN doc_id % 17 = 13 THEN 302
              ELSE 200 END AS status
  FROM documents
),
nn AS (SELECT COUNT(*)::BIGINT AS c FROM documents)
"""

# every link target of a status-200 page, mirroring body_expr exactly
EDGES_CTE = """
edges AS (
  -- a #0: chain
  SELECT p.i, 'http://site-' || (((p.i+1) % c) % 3) || '.test/page/' || ((p.i+1) % c) AS dst
    FROM page p, nn WHERE p.status = 200
  UNION ALL
  -- a #1: multiplicative hop
  SELECT p.i, 'http://site-' || (((p.i*31+7) % c) % 3) || '.test/page/' || ((p.i*31+7) % c)
    FROM page p, nn WHERE p.status = 200
  UNION ALL
  -- a #2: host-relative '/page/j' resolves on the PARENT's host
  SELECT p.i, 'http://site-' || (p.i % 3) || '.test/page/' || ((p.i*13+1) % c)
    FROM page p, nn WHERE p.status = 200
  UNION ALL
  -- a #3: dead link
  SELECT p.i, 'http://site-' || (p.i % 3) || '.test/missing/' || p.i
    FROM page p WHERE p.status = 200 AND p.i % 7 = 2
  UNION ALL
  -- a #4: mailto (unsupported scheme)
  SELECT p.i, 'mailto:user' || p.i || '@example.test'
    FROM page p WHERE p.status = 200 AND p.i % 11 = 4
  UNION ALL
  -- script src (host-relative)
  SELECT p.i, 'http://site-' || (p.i % 3) || '.test/js/app-' || (p.i % 7) || '.js'
    FROM page p WHERE p.status = 200 AND p.i % 5 = 3
  UNION ALL
  -- link rel=canonical (a <link> tag IS a crawl candidate)
  SELECT p.i, p.url FROM page p WHERE p.status = 200 AND p.i % 4 = 0
  UNION ALL
  SELECT p.i, 'http://site-' || (p.i % 3) || '.test/canon/' || p.i
    FROM page p WHERE p.status = 200 AND p.i % 4 = 1
  UNION ALL
  -- img src
  SELECT p.i, 'http://cdn.test/img/' || ((p.i*3) % 60) || '.bin'
    FROM page p WHERE p.status = 200 AND p.i % 4 = 1
  UNION ALL
  -- embedded <style> background-image url
  SELECT p.i, 'http://cdn.test/bg/' || (p.i % 20) || '.png'
    FROM page p WHERE p.status = 200 AND p.i % 9 = 6
)
"""

# redirect (Location) edges — mirrors redirect_to_expr exactly
REDIR_CTE = """
redir AS (
  SELECT 'http://site-' || (q.i % 3) || '.test/page/' || q.i AS src,
         'http://site-' || (q.j % 3) || '.test/page/' || q.j AS dst
  FROM (
    SELECT p.i,
           CASE WHEN p.status = 301 THEN (p.i*7+3) % c
                WHEN p.status = 302 AND (p.i-13) % 34 = 0 AND p.i+17 < c THEN p.i+17
                WHEN p.status = 302 AND (p.i-13) % 34 <> 0 THEN p.i-17
           END AS j
    FROM page p, nn) q
  WHERE q.j IS NOT NULL
)
"""

# reachable URL set from seeds {0,1,2}; only status-200 pages expand
REACH_CTE = """
reach(url) AS (
  SELECT url FROM page WHERE i < 3
  UNION
  SELECT e.dst
    FROM reach r JOIN page p ON p.url = r.url AND p.status = 200
    JOIN edges e ON e.i = p.i
)
"""

CRAWL_RESULTS_SQL = (
    "WITH RECURSIVE "
    + PAGE_CTE.strip().rstrip()
    + ", "
    + EDGES_CTE.strip()
    + ", "
    + REACH_CTE.strip()
    + """
SELECT r.url AS url,
       CASE WHEN p.i IS NOT NULL THEN (CASE WHEN p.status = 0 THEN NULL ELSE p.status END)
            WHEN r.url LIKE 'mailto:%' THEN NULL
            ELSE 404 END AS status,
       CASE WHEN r.url LIKE 'mailto:%' THEN 'unsupported'
            WHEN p.i IS NULL THEN 'broken'
            WHEN p.status BETWEEN 200 AND 299 THEN 'ok'
            WHEN p.status IN (301,302,303,307) THEN 'redirect'
            WHEN p.status = 0 THEN 'error'
            ELSE 'broken' END AS classification
FROM reach r LEFT JOIN page p ON p.url = r.url
"""
)

CRAWL_BROKEN_SQL = (
    "WITH RECURSIVE "
    + PAGE_CTE.strip()
    + ", "
    + EDGES_CTE.strip()
    + ", "
    + REACH_CTE.strip()
    + """
SELECT r.url AS url
FROM reach r LEFT JOIN page p ON p.url = r.url
WHERE CASE WHEN r.url LIKE 'mailto:%' THEN 'unsupported'
           WHEN p.i IS NULL THEN 'broken'
           WHEN p.status BETWEEN 200 AND 299 THEN 'ok'
           WHEN p.status IN (301,302,303,307) THEN 'redirect'
           WHEN p.status = 0 THEN 'error'
           ELSE 'broken' END = 'broken'
"""
)
