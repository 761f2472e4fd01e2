"""One crawl epoch as a Spark DataFrame DAG (SURVEY.md §3.1).

The reference's recursive task-tree crawl
(/root/reference/SpiderEngine/Engine.cs:149-210,322-349) flattened into a
per-BFS-level dataflow:

  frontier ─W1 politeness rank/budget─→ batch | carry
  batch ─J6 fetch join (web)─→ P11 classify ─→ results append
  ok html+css rows ─P8/P9/P10 parse (Arrow UDFs)─→ explode candidates
  candidates ─P1 canonicalize─→ F1 scheme / F10 robots gates
             ─W3 intra-epoch dedup─→ J1 anti-join seen ∪ carry
             ─W2 deterministic rank─→ new frontier entries
  frontier' = carry ∪ new

Shuffle census per epoch (scale notes, SURVEY.md §4):
  1. politeness window   — exchange on host   (hot-host skew: budget bounds
                           the damage; salted two-phase top-K is the M5 path)
  2. fetch join          — exchange on (url_hash, url) both sides (Iceberg
                           bucketing on url_hash removes this on a cluster)
  3. W3 dedup window     — exchange on url
  4. anti-join seen      — exchange on (url_hash, url); a broadcast bloom
                           pre-filter short-circuits the never-seen majority
                           (engine/filters.py) when the seen set is large
  5. W2 global rank      — single-partition window over this epoch's NEW
                           candidates only; bounded by Σ politeness budgets,
                           NOT by frontier size, so it stays small even at
                           10^10-URL frontiers

Everything else is narrow or JVM-side (classification, routing, filters are
whole-stage-codegen'd CASE/contains expressions).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from linkkchecker_net_spark import schemas
from linkkchecker_net_spark.kernels.canonicalize import canonicalize_udf
from linkkchecker_net_spark.kernels.classify import classification_expr
from linkkchecker_net_spark.kernels.cssparse import extract_css_urls_udf
from linkkchecker_net_spark.kernels.htmlparse import parse_page_udf

CSS_TAG_RANK = 4

_ORDER_COLS = ["parent_rank", "tag_rank", "doc_pos"]


@dataclass
class EpochResult:
    batch: DataFrame
    carry: DataFrame
    results: DataFrame
    page_meta: DataFrame
    seen_delta: DataFrame
    new_frontier_entries: DataFrame
    counts: dict = field(default_factory=dict)


def _host_expr(url_col):
    return F.lower(F.parse_url(url_col, F.lit("HOST")))


def _path_expr(url_col):
    p = F.parse_url(url_col, F.lit("PATH"))
    return F.when(p.isNull() | (p == ""), F.lit("/")).otherwise(p)


def split_politeness(
    frontier: DataFrame, robots: DataFrame, default_budget: int
) -> tuple[DataFrame, DataFrame]:
    """W1/A4/O3 — per-host priority rank, top-`budget` rows form the batch.

    robots is a small dimension table → broadcast join (no shuffle for it);
    the window exchange on host is shuffle #1.
    """
    w = Window.partitionBy("host").orderBy("priority", "crawl_depth", "discovery_rank")
    ranked = (
        frontier.join(
            F.broadcast(robots.select("host", "budget")), on="host", how="left"
        )
        .withColumn("budget", F.coalesce("budget", F.lit(default_budget)))
        .withColumn("_pr", F.row_number().over(w))
    )
    batch = ranked.filter(F.col("_pr") <= F.col("budget")).drop("_pr", "budget")
    carry = ranked.filter(F.col("_pr") > F.col("budget")).drop("_pr", "budget")
    return batch, carry


def fetch_and_classify(batch: DataFrame, web: DataFrame, epoch: int) -> DataFrame:
    """S2/S3 + J6 + P11 — fetch join against the synthetic web + classify.

    In production the join body is replaced by an async HTTP batch inside
    the same per-host grouping; the plan shape is identical.  A URL absent
    from `web` is a dead link → 404 (Engine.cs:168-201 semantics); web
    status 0 encodes a network error (exception branch, Engine.cs:204-208).
    content_type/image_id are recorded only for 2xx (Engine.cs:172-174).
    """
    w = web.select(
        F.col("url").alias("w_url"),
        F.col("url_hash").alias("w_url_hash"),
        F.col("status").alias("w_status"),
        F.col("content_type").alias("w_ct"),
        F.col("body").alias("w_body"),
        F.col("image_id").alias("w_image_id"),
    )
    joined = batch.join(
        w,
        (batch.url_hash == w.w_url_hash) & (batch.url == w.w_url),
        "left",
    )
    is_err = F.col("w_status") == 0
    status = (
        F.when(F.col("w_url").isNull(), F.lit(404))
        .when(is_err, F.lit(None).cast(T.IntegerType()))
        .otherwise(F.col("w_status"))
    )
    error = F.when(is_err, F.lit("connection error"))
    ok = (status >= 200) & (status < 300)
    return (
        joined.withColumn("status", status)
        .withColumn("error", error)
        .withColumn("content_type", F.when(ok, F.col("w_ct")))
        .withColumn("image_id", F.when(ok, F.col("w_image_id")))
        .withColumn("body", F.when(ok, F.col("w_body")))
        .withColumn(
            "classification",
            classification_expr(F.col("status"), F.col("error"), F.lit(False)),
        )
        .withColumn("epoch", F.lit(epoch))
        .drop("w_url", "w_url_hash", "w_status", "w_ct", "w_body", "w_image_id")
    )


def generate_candidates(
    fetched: DataFrame, seed_hosts: list[str], epoch: int
) -> tuple[DataFrame, DataFrame]:
    """P8/P9/P10 + explode → (candidates, page_meta).

    Column pruning before the Arrow UDFs: only ok-html-GET rows carry body
    into the parse (the HEAD optimization = never materializing body for
    HEAD-class rows, Engine.cs:242-252).
    """
    in_site = F.col("host").isin(seed_hosts)
    parent_cols = [
        F.col("url").alias("parent_url"),
        F.col("discovery_rank").alias("parent_rank"),
        F.col("crawl_depth").alias("parent_depth"),
        F.col("priority"),
        F.col("seed_url"),
    ]

    html = (
        fetched.filter(
            (F.col("classification") == "ok")
            & (F.col("content_type") == "text/html")
            & F.col("may_contain_links")
        )
        .withColumn("in_site", in_site)
        .withColumn("parsed", parse_page_udf("body"))
    )
    # page-level extractions for in-site pages (CanonicalChecker /
    # DescriptionLengthChecker are F2-gated: CanonicalChecker.cs:34-36)
    page_meta = html.filter("in_site").select(
        "url",
        "url_hash",
        F.col("parsed.canonical_href").alias("canonical_href"),
        F.col("parsed.meta_description").alias("meta_description"),
        F.col("parsed.embedded_css").alias("embedded_css"),
        "crawl_depth",
        F.lit(epoch).alias("epoch"),
    )

    link_cands = (
        html.filter(F.col("in_site") & F.col("expand_links"))
        .select(*parent_cols, F.explode("parsed.links").alias("ln"))
        .select(
            "parent_url",
            "parent_rank",
            "parent_depth",
            "priority",
            "seed_url",
            F.col("ln.href").alias("href"),
            F.col("ln.may_contain_links").alias("may_contain_links"),
            F.lit(True).alias("expand_links"),
            F.col("ln.tag_rank").alias("tag_rank"),
            F.col("ln.doc_pos").alias("doc_pos"),
        )
    )

    # embedded <style> css — scanned even off-site (Engine.cs:176-183)
    embedded = (
        html.filter(F.size("parsed.embedded_css") > 0)
        .select(
            *parent_cols,
            F.posexplode(
                extract_css_urls_udf(F.concat_ws("\n", "parsed.embedded_css"))
            ).alias("doc_pos", "href"),
        )
        .select(
            "parent_url",
            "parent_rank",
            "parent_depth",
            "priority",
            "seed_url",
            "href",
            F.lit(False).alias("may_contain_links"),
            F.lit(False).alias("expand_links"),
            F.lit(CSS_TAG_RANK).alias("tag_rank"),
            "doc_pos",
        )
    )

    # external stylesheets (content_type text/css, CssChecker.cs:17-87)
    css = (
        fetched.filter(
            (F.col("classification") == "ok") & (F.col("content_type") == "text/css")
        )
        .select(*parent_cols, F.posexplode(extract_css_urls_udf("body")).alias("doc_pos", "href"))
        .select(
            "parent_url",
            "parent_rank",
            "parent_depth",
            "priority",
            "seed_url",
            "href",
            F.lit(False).alias("may_contain_links"),
            F.lit(False).alias("expand_links"),
            F.lit(CSS_TAG_RANK).alias("tag_rank"),
            "doc_pos",
        )
    )

    return link_cands.unionByName(embedded).unionByName(css), page_meta


def dedup_gate_rank(
    candidates: DataFrame,
    seen: DataFrame,
    carry: DataFrame,
    robots: DataFrame,
    next_rank: int,
    epoch: int,
) -> tuple[DataFrame, DataFrame]:
    """P1 canonicalize → F1/F10 gates → W3 dedup → J1 anti-join → W2 rank.

    Returns (new_results_rows, new_frontier_entries): unsupported-scheme and
    robots-blocked candidates become terminal result rows (they consume a
    discovery_rank and enter the seen set exactly like the oracle's
    sequential walk); the rest become frontier entries at depth+1.
    """
    cand = (
        candidates.withColumn("url", canonicalize_udf("parent_url", "href"))
        .filter(F.col("url").isNotNull())
        .withColumn("url_hash", F.xxhash64("url"))
        .withColumn("scheme", F.lower(F.substring_index("url", ":", 1)))
        .withColumn("supported", F.col("scheme").isin("http", "https"))
        .withColumn(
            "host",
            F.when(F.col("supported"), F.coalesce(_host_expr(F.col("url")), F.lit(""))),
        )
    )

    # W3 — keep-first per URL in deterministic candidate order
    w_url = Window.partitionBy("url").orderBy(*_ORDER_COLS)
    cand = cand.withColumn("_rn", F.row_number().over(w_url)).filter("_rn = 1").drop("_rn")

    # J1 — anti-join the seen set (claimed through THIS epoch's batch) and
    # the politeness carry (discovered-but-unfetched URLs)
    cand = cand.join(
        seen.select("url_hash", "url"), on=["url_hash", "url"], how="left_anti"
    ).join(carry.select("url"), on="url", how="left_anti")

    # F10 — robots gate (broadcast dim join, path-prefix containment)
    rob = robots.select("host", "disallow")
    cand = cand.join(F.broadcast(rob), on="host", how="left").withColumn(
        "robots_blocked",
        F.col("supported")
        & F.when(
            F.col("disallow").isNotNull(),
            F.exists(
                F.col("disallow"),
                lambda p: F.startswith(_path_expr(F.col("url")), p),
            ),
        ).otherwise(F.lit(False)),
    )

    # W2 — deterministic discovery rank over this epoch's survivors only.
    # Single-partition window, but its input is bounded by the politeness
    # budget (links per fetched page), not the frontier size.
    w_rank = Window.orderBy(*_ORDER_COLS)
    cand = cand.withColumn(
        "discovery_rank", F.row_number().over(w_rank) + F.lit(next_rank - 1).cast("long")
    ).withColumn("crawl_depth", F.col("parent_depth") + 1)

    new_results = cand.filter(~F.col("supported") | F.col("robots_blocked")).select(
        "url",
        "url_hash",
        F.when(F.col("supported"), F.col("host")).alias("host"),
        F.lit(None).cast(T.IntegerType()).alias("status"),
        F.lit(None).cast(T.StringType()).alias("error"),
        (~F.col("supported")).alias("unsupported_scheme"),
        F.lit(None).cast(T.StringType()).alias("content_type"),
        F.when(~F.col("supported"), F.lit("unsupported"))
        .otherwise(F.lit("robots_blocked"))
        .alias("classification"),
        "parent_url",
        "seed_url",
        "crawl_depth",
        "discovery_rank",
        F.lit(epoch).alias("epoch"),
        F.lit(None).cast(T.StringType()).alias("image_id"),
    )

    new_frontier = cand.filter(F.col("supported") & ~F.col("robots_blocked")).select(
        "url",
        "url_hash",
        "host",
        F.xxhash64("host").alias("host_hash"),
        "priority",
        "crawl_depth",
        "parent_url",
        "seed_url",
        "may_contain_links",
        "expand_links",
        "discovery_rank",
    )
    return new_results, new_frontier


def results_projection(fetched: DataFrame) -> DataFrame:
    return fetched.select(
        "url",
        "url_hash",
        "host",
        "status",
        "error",
        F.lit(False).alias("unsupported_scheme"),
        "content_type",
        "classification",
        "parent_url",
        "seed_url",
        "crawl_depth",
        "discovery_rank",
        "epoch",
        "image_id",
    )


def run_epoch(
    spark: SparkSession,
    frontier: DataFrame,
    seen: DataFrame,
    web: DataFrame,
    robots: DataFrame,
    seed_hosts: list[str],
    epoch: int,
    next_rank: int,
    default_budget: int,
) -> EpochResult:
    """Wire the full epoch DAG; nothing is materialized here — the driver
    decides what to write/count (writes ARE the checkpoint)."""
    batch, carry = split_politeness(frontier, robots, default_budget)
    fetched = fetch_and_classify(batch, web, epoch)

    seen_delta = batch.select(
        "url_hash",
        "url",
        F.col("crawl_depth").alias("first_depth"),
        F.lit(epoch).alias("epoch"),
    )
    seen_through_now = seen.select("url_hash", "url").unionByName(
        seen_delta.select("url_hash", "url")
    )

    candidates, page_meta = generate_candidates(fetched, seed_hosts, epoch)
    gated_results, new_frontier = dedup_gate_rank(
        candidates, seen_through_now, carry, robots, next_rank, epoch
    )
    results = results_projection(fetched).unionByName(gated_results)
    # terminal gated rows (unsupported / robots_blocked) are claimed too —
    # they enter the seen set at their discovery depth, like the oracle's
    # sequential walk (and ScanResults.AddOrReplace at Engine.cs:263-273)
    seen_delta = seen_delta.unionByName(
        gated_results.select(
            "url_hash",
            "url",
            F.col("crawl_depth").alias("first_depth"),
            F.col("epoch"),
        )
    )
    return EpochResult(
        batch=batch,
        carry=carry,
        results=results,
        page_meta=page_meta,
        seen_delta=seen_delta,
        new_frontier_entries=new_frontier,
    )
