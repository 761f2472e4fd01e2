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
