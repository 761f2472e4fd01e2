#!/usr/bin/env python
"""Profiling harness (dev only): saturated-crawl leg on local-cluster[N,2]
— N separate executor JVMs of fixed 2-core size, the north rule's literal
N-vs-4N-executors shape.  Pins to 2N executor cores + 2 driver cores."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ["SPARK_GRAFT_PROFILE"] = "1"

n_exec = int(sys.argv[1])
pages = int(sys.argv[2]) if len(sys.argv) > 2 else 100000
try:
    os.sched_setaffinity(0, set(range(2 * n_exec + 2)))
except (AttributeError, OSError):
    pass

import bench
from linkkchecker_net_spark.session import build_session

extra = {
    "spark.sql.files.maxPartitionBytes": "16m",
    "spark.sql.files.openCostInBytes": "512k",
    "spark.sql.files.minPartitionNum": "32",
    "spark.executor.memory": "3g",
}
shm = "/dev/shm"
if os.path.isdir(shm):
    d = os.path.join(shm, "spark-local")
    os.makedirs(d, exist_ok=True)
    extra["spark.local.dir"] = d
spark = build_session(
    app_name=f"lc[{n_exec}]",
    cores=None,
    shuffle_partitions=32,
    extra_conf=extra,
    master=f"local-cluster[{n_exec},2,3072]",
)
bench.prewarm(spark, 2 * n_exec)
web_path = os.path.join("/tmp", f"bench_web_{pages}")
t0 = time.monotonic()
c = bench.run_crawl(
    spark, web_path, seeds_n=pages, saturated=True, trials=1,
    tmpl_cache=f"/tmp/bench_ckpt_tmpl_{pages}_v3",
)
print("LEG", json.dumps(c), "total", round(time.monotonic() - t0, 2), flush=True)
spark.stop()
