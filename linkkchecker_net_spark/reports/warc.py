"""WARC-style export manifest for crawl results.

The reference keeps results in memory and prints reports
(`SpiderEngine/Spider.cs` result dictionary → console); a web-scale
crawler's fetched bodies leave the cluster as WARC segments (the
Common-Crawl interchange format), and every record needs its byte offset
BEFORE anything is written so readers can range-request individual
pages.  This operator plans that layout purely relationally:

  * shard assignment is content-addressed (first 8 md5 hex digits of the
    record URL, mod n_shards — the same engine-portable unsigned-32 hash
    `pipeline/curation.shard_assign` uses), so a record's shard never
    depends on other rows and re-exports are stable under corpus growth;
  * offsets are a per-shard cumulative sum over the URL-ordered records
    (deterministic: URL is unique within a crawl epoch) — one window per
    shard partition, n_shards independent streams, never a global scan;
  * record length models the WARC envelope: header bytes (fixed fields +
    the URL) + body bytes + the closing CRLF pair.

Output is the manifest a writer job consumes with
``write.partitionBy("shard_id")``; actual byte concatenation is the
writer's trivial foreachPartition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# modeled WARC/1.1 envelope overhead: version line, WARC-Type,
# WARC-Target-URI prefix, Content-Length, WARC-Date, record separator
WARC_HEADER_FIXED = 120
WARC_RECORD_SEP = 4  # CRLF CRLF


def warc_manifest(
    results: DataFrame,
    n_shards: int = 16,
    url_col: str = "url",
    len_col: str = "body_len",
) -> DataFrame:
    """(shard_id, url, record_len, offset, shard_bytes, shard_records).

    ``results`` needs one row per fetched page with its body byte count.
    Scale: one map-side hash, one hash-partitioned window keyed by
    shard_id (n_shards independent cumsum streams), zero joins.
    """
    hex8 = F.substring(F.md5(F.col(url_col)), 1, 8)
    shard = F.pmod(F.conv(hex8, 16, 10).cast("long"), F.lit(n_shards))
    rec_len = (
        F.lit(WARC_HEADER_FIXED)
        + F.length(F.col(url_col))
        + F.col(len_col)
        + F.lit(WARC_RECORD_SEP)
    ).cast("long")
    w = Window.partitionBy("shard_id").orderBy(url_col)
    wall = Window.partitionBy("shard_id")
    return (
        results.select(
            shard.alias("shard_id"),
            F.col(url_col).alias("url"),
            rec_len.alias("record_len"),
        )
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("record_len").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0).cast("long"),
            ),
        )
        .withColumn("shard_bytes", F.sum("record_len").over(wall))
        .withColumn("shard_records", F.count("*").over(wall))
    )


# ---------------------------------------------------------------------------
# CDX capture index over SURT keys — the lookup-side companion of the
# WARC manifest above.  Readers (wayback-style replay, dedup-by-digest,
# recrawl diffing) binary-search a CDX index sorted by
# (SURT key, timestamp); SURT (Sort-friendly URI Reordering Transform)
# puts the registrable domain first so one host's captures are one
# contiguous key range:
#
#   https://www.Example.com:8080/a/B?b=2&a=1
#     → com,example:8080)/a/B?a=1&b=2
#
# Canonicalization applied (the common CDX writer rules): scheme
# dropped, host lowercased, leading www. stripped, default port dropped
# (80 for http, 443 for https — others kept), query params sorted;
# path case is preserved (it is significant on most origins).
#
# Everything is map-only codegen (split / reverse / array_join /
# regexp) except the capture window: row_number + count per SURT key,
# partitioned on the key — exactly the partitioning a
# repartitionByRange(surt_key) writer needs anyway, so at export time
# the sort is free.  No Python, no joins.
# ---------------------------------------------------------------------------


def cdx_index(results: DataFrame, url_col: str = "url", ts_col: str = "ts") -> DataFrame:
    """(surt_key, ts, url, status, digest8, seq, n_captures) — one row
    per capture, sequenced oldest-first within its SURT key.

    ``results`` needs (url, ts, status); ``digest8`` content-addresses
    the capture (md5 of url:ts — the writer substitutes the true body
    digest), so index shards are stable under re-export.
    """
    url = F.col(url_col)
    scheme = F.regexp_extract(url, r"^(https?)://", 1)
    auth = F.lower(F.regexp_extract(url, r"^https?://([^/?#]+)", 1))
    port = F.nullif(F.regexp_extract(auth, r":(\d+)$", 1), F.lit(""))
    host = F.regexp_replace(
        F.regexp_replace(auth, r":\d+$", ""), r"^www\.", ""
    )
    keep_port = port.isNotNull() & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    rest = F.regexp_replace(url, r"^https?://[^/?#]+", "")
    path = F.substring_index(rest, "?", 1)
    qsorted = F.when(
        rest.contains("?"),
        F.array_join(
            F.array_sort(F.split(F.substring_index(rest, "?", -1), "&")),
            "&",
        ),
    )
    surt = F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.lit(")"),
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(qsorted.isNotNull(), F.concat(F.lit("?"), qsorted)).otherwise(
            F.lit("")
        ),
    )
    wk = Window.partitionBy("surt_key")
    wseq = wk.orderBy(ts_col, url_col)
    return (
        results.select(
            surt.alias("surt_key"),
            F.col(ts_col).cast("long").alias("ts"),
            url.alias("url"),
            F.col("status").cast("int").alias("status"),
            F.substring(
                F.md5(F.concat(url, F.lit(":"), F.col(ts_col).cast("string"))),
                1,
                8,
            ).alias("digest8"),
        )
        .withColumn("seq", F.row_number().over(wseq).cast("int"))
        .withColumn("n_captures", F.count("*").over(wk).cast("long"))
    )


def warc_revisit(captures: DataFrame) -> DataFrame:
    """WARC 1.1 §6.7.2 identical-payload-digest revisit planning: within
    each (url, digest) group ordered by capture time, the FIRST capture
    is stored as a full ``response`` record and every later identical
    capture becomes a ``revisit`` record pointing at it — the archival
    dedup that keeps a recrawl-heavy collection from storing the same
    body every visit.

    captures: (url, ts, digest8, body_len) → (url, ts, digest8,
    record_type, refers_to_ts, saved_bytes) where refers_to_ts = the
    referenced response's ts (NULL for responses) and saved_bytes =
    body_len for revisits (the bytes NOT written), 0 for responses.

    Scale: ONE window partitioned by (url, digest8) — the same key a
    capture index already clusters by, so under a surt/url-bucketed
    layout the sort is partition-local; no other shuffle.  A hot URL
    recrawled 10^6 times is one group per distinct body, and the
    min/row_number pair both compute in a single pass.
    """
    w = Window.partitionBy("url", "digest8").orderBy("ts")
    rn = F.row_number().over(w)
    first_ts = F.min("ts").over(Window.partitionBy("url", "digest8"))
    return captures.select(
        "url",
        F.col("ts").cast("long").alias("ts"),
        "digest8",
        F.when(rn == 1, "response").otherwise("revisit").alias("record_type"),
        F.when(rn > 1, first_ts).cast("long").alias("refers_to_ts"),
        F.when(rn > 1, F.col("body_len")).otherwise(F.lit(0))
        .cast("long")
        .alias("saved_bytes"),
    )
