#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line.

  SPARK_GRAFT_SF_DIR          input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS            cores for local[N] (default all)
  SPARK_GRAFT_BENCH_PAGES     synthetic crawl size (default 40000)
  SPARK_GRAFT_BENCH_IMAGES    scaling-corpus size (default 120000)
  SPARK_GRAFT_BENCH_SCALING   "0" to skip the two-parallelism scaling runs

Headline metric (BASELINE.json): frontier URLs fetched/sec on the seeded
BFS crawl, plus images validated/sec (the north-star fetch+validate pair).

Scaling evidence (north rule, sandbox form): the same jobs at two
parallelism levels.  The pair is chosen so neither level oversubscribes
the host (each Spark task drives a JVM thread AND a Python worker, so
local[32] on a 32-core box runs 64 hot threads — local[4] vs local[16]
is the honest 4x comparison).  Efficiency = (thr_high/thr_low)/4.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", 40000))
IMAGES = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", 120000))
DO_SCALING = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0"


def build(cores: int):
    from linkkchecker_net_spark.session import build_session

    return build_session(app_name=f"bench[{cores}]", cores=cores)


def ensure_web(spark, n_pages: int, path: str) -> None:
    from linkkchecker_net_spark.fixtures import docweb

    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        docweb.build_web_for_bench(
            spark, n_pages, partitions=64, extra_links=150, filler=30000
        ).write.mode("overwrite").parquet(path)


def ensure_corpus(spark, n_images: int, path: str) -> None:
    """128x128 lossy-encoded image corpus (deterministic, seeded)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from linkkchecker_net_spark import imaging

    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return

    def gen(batches):
        for pdf in batches:
            out = {"image_id": [], "bytes": [], "fmt": []}
            for i in pdf["id"].astype(int):
                rng = np.random.default_rng(int(i))
                arr = imaging.make_image(rng, 128, 128)
                out["image_id"].append(f"img_{int(i)}")
                out["bytes"].append(imaging.encode_lossy(arr))
                out["fmt"].append("jpeg")
            yield pd.DataFrame(out)

    spark.range(0, n_images, 1, 256).select(F.col("id")).mapInPandas(
        gen, "image_id string, bytes binary, fmt string"
    ).write.mode("overwrite").parquet(path)


def run_crawl(spark, web_path: str, seeds_n: int) -> dict:
    from pyspark.sql import functions as F

    from linkkchecker_net_spark.engine.driver import CrawlConfig, CrawlDriver
    from linkkchecker_net_spark.fixtures import docweb

    ck = tempfile.mkdtemp(prefix="bench_ckpt_")
    try:
        web = spark.read.parquet(web_path)
        driver = CrawlDriver(
            spark, web, docweb.empty_robots(spark), CrawlConfig(ckpt_dir=ck)
        )
        t0 = time.monotonic()
        driver.run(docweb.seeds(n=seeds_n))
        elapsed = time.monotonic() - t0
        fetched = (
            driver.results()
            .filter(~F.col("classification").isin("unsupported", "robots_blocked"))
            .count()
        )
        return {
            "elapsed_sec": round(elapsed, 2),
            "fetched": fetched,
            "urls_per_sec": round(fetched / elapsed, 2),
            "epochs": driver.metrics().count(),
        }
    finally:
        shutil.rmtree(ck, ignore_errors=True)


def run_validation(spark, corpus_path: str) -> dict:
    """North-star validate stage: decode + phash + quality features per
    image (mapInPandas Arrow pass over binary bodies)."""
    from linkkchecker_net_spark.pipeline.multimodal import image_metadata

    corpus = spark.read.parquet(corpus_path)
    t0 = time.monotonic()
    n_ok = image_metadata(corpus).filter("decode_ok").count()
    elapsed = time.monotonic() - t0
    return {
        "elapsed_sec": round(elapsed, 2),
        "validated": n_ok,
        "images_per_sec": round(n_ok / elapsed, 2),
    }


def run_queries(spark) -> dict:
    import __spark_entry__ as entrymod

    names = [
        "jaccard_pairs", "minhash_lsh_pairs", "simhash_pairs", "embed_neardup",
        "ann_topk", "ann_lsh", "lang_id", "token_count", "quality_score",
        "fingerprint", "dedup_exact", "event_stats", "image_meta",
    ]
    out = {}
    qs = entrymod.queries()
    for name in names:
        t0 = time.monotonic()
        qs[name](spark, SF_DIR).count()
        out[name] = round(time.monotonic() - t0, 3)
    return out


def main() -> None:
    web_path = os.path.join(tempfile.gettempdir(), f"bench_web_{PAGES}")
    corpus_path = os.path.join(tempfile.gettempdir(), f"bench_corpus_{IMAGES}")

    spark = build(CPUS)
    ensure_web(spark, PAGES, web_path)
    ensure_corpus(spark, IMAGES, corpus_path)
    crawl = run_crawl(spark, web_path, seeds_n=512)
    val = run_validation(spark, corpus_path)
    queries = run_queries(spark)
    spark.stop()

    scaling = None
    if DO_SCALING:
        # un-oversubscribed 4x pair (see module docstring)
        high = min(CPUS, (os.cpu_count() or CPUS) // 2)
        low = max(high // 4, 1)
        levels = {}
        for cores in (high, low):
            s = build(cores)
            c = run_crawl(s, web_path, seeds_n=PAGES)  # saturated frontier
            v = run_validation(s, corpus_path)
            s.stop()
            levels[cores] = {"crawl": c, "validate": v}
        ch, cl = levels[high], levels[low]
        fetch_val_high = (ch["crawl"]["fetched"] + ch["validate"]["validated"]) / (
            ch["crawl"]["elapsed_sec"] + ch["validate"]["elapsed_sec"]
        )
        fetch_val_low = (cl["crawl"]["fetched"] + cl["validate"]["validated"]) / (
            cl["crawl"]["elapsed_sec"] + cl["validate"]["elapsed_sec"]
        )
        ratio = high / low
        scaling = {
            "cores_low": low,
            "cores_high": high,
            "validate_eff": round(
                (ch["validate"]["images_per_sec"] / cl["validate"]["images_per_sec"])
                / ratio,
                3,
            ),
            "crawl_eff": round(
                (ch["crawl"]["urls_per_sec"] / cl["crawl"]["urls_per_sec"]) / ratio, 3
            ),
            "fetch_validate_eff": round((fetch_val_high / fetch_val_low) / ratio, 3),
            "levels": levels,
        }

    print(
        json.dumps(
            {
                "metric": "crawl_urls_fetched_per_sec",
                "value": crawl["urls_per_sec"],
                "unit": "urls/sec",
                "queries": {
                    f"crawl_bfs_{PAGES}": crawl["elapsed_sec"],
                    f"validate_{IMAGES}_images": val["elapsed_sec"],
                    **queries,
                },
                "sf": SF_DIR.rstrip("/").split("sf")[-1],
                "pages": PAGES,
                "epochs": crawl["epochs"],
                "fetched": crawl["fetched"],
                "images_validated_per_sec": val["images_per_sec"],
                "cores": CPUS,
                "scaling": scaling,
            }
        )
    )


if __name__ == "__main__":
    main()
