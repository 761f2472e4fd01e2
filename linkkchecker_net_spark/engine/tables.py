"""Fixture-dict → Spark DataFrame loaders (explicit schemas, never inferred)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkkchecker_net_spark import schemas


def web_df(spark: SparkSession, web_rows: list[dict]) -> DataFrame:
    rows = [
        (
            r["url"],
            0,  # url_hash filled below (JVM xxhash64 — single source of truth)
            r["host"],
            r["status"],
            r.get("redirect_to"),
            r.get("content_type"),
            bytes(r["body"]) if r.get("body") is not None else None,
            r.get("image_id"),
            r.get("caption"),
        )
        for r in web_rows
    ]
    df = spark.createDataFrame(rows, schema=schemas.WEB)
    return df.withColumn("url_hash", F.xxhash64("url"))


def corpus_df(spark: SparkSession, corpus_rows: list[dict]) -> DataFrame:
    rows = [
        (
            r["image_id"],
            bytes(r["bytes"]),
            r["w"],
            r["h"],
            r["fmt"],
            r["caption"],
            r["phash"],
        )
        for r in corpus_rows
    ]
    return spark.createDataFrame(rows, schema=schemas.CORPUS)


def robots_df(spark: SparkSession, robots_rows: list[dict]) -> DataFrame:
    rows = [
        (r["host"], r.get("disallow"), r.get("crawl_delay"), r.get("budget"))
        for r in robots_rows
    ]
    return spark.createDataFrame(rows, schema=schemas.ROBOTS)


def sitemaps_df(spark: SparkSession, sitemap_rows: list[dict]) -> DataFrame:
    rows = [(r["host"], r.get("loc")) for r in sitemap_rows]
    return spark.createDataFrame(rows, schema=schemas.SITEMAPS)
