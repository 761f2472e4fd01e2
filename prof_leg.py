#!/usr/bin/env python
"""Profiling harness (dev only): one saturated-crawl scaling leg with
SPARK_GRAFT_PROFILE marks, single trial, pinned cores."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ["SPARK_GRAFT_PROFILE"] = "1"

import bench

cores = int(sys.argv[1])
pages = int(sys.argv[2]) if len(sys.argv) > 2 else 60000
try:
    os.sched_setaffinity(0, set(range(cores)))
except (AttributeError, OSError):
    pass
import bench as _b
_orig_build_session = None


def _build(cores):
    from linkkchecker_net_spark.session import build_session

    extra = {
        "spark.sql.files.maxPartitionBytes": "16m",
        "spark.sql.files.openCostInBytes": "512k",
        "spark.sql.files.minPartitionNum": str(bench.FIXED_PARTS),
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": "/tmp/spark-events",
        "spark.eventLog.compress": "false",
    }
    os.makedirs("/tmp/spark-events", exist_ok=True)
    shm = "/dev/shm"
    if os.path.isdir(shm):
        d = os.path.join(shm, "spark-local")
        os.makedirs(d, exist_ok=True)
        extra["spark.local.dir"] = d
    spark = build_session(app_name=f"prof[{cores}]", cores=cores, shuffle_partitions=bench.FIXED_PARTS, extra_conf=extra)
    bench.prewarm(spark, cores)
    return spark


spark = _build(cores)
web_path = os.path.join("/tmp", f"bench_web_{pages}")
bench.ensure_web(spark, pages, web_path)
t0 = time.monotonic()
c = bench.run_crawl(spark, web_path, seeds_n=pages, saturated=True, trials=1, tmpl_cache="/tmp/bench_ckpt_tmpl_%d_v3" % pages)
print("LEG", json.dumps(c), "total", round(time.monotonic() - t0, 2), flush=True)
spark.stop()
