"""SparkSession factory tuned for the crawl workload.

Local-mode testing stands in for a multi-executor cluster; every knob here
is chosen to also be the right knob at cluster scale (AQE, skew-join,
Arrow batches). See SURVEY.md §4.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "linkkchecker_net_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build a local SparkSession.

    cores=None → local[*].  shuffle_partitions defaults to 2× cores so the
    fetch/anti-join exchanges keep every slot busy without tiny-task
    overhead (at cluster scale this would be ~2-3× total executor cores).
    master overrides the local[N] default — e.g. ``local-cluster[N,2,3072]``
    runs N separate fixed-size executor JVMs on this box (the multi-executor
    shape the north rule's scaling criterion names).
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        cores = int(env) if env else (os.cpu_count() or 4)
    if shuffle_partitions is None:
        shuffle_partitions = max(8, 2 * cores)

    builder = (
        SparkSession.builder.master(master or f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # persist()/cache() compiles the cached plan with AQE partition
        # coalescing DISABLED by default (Spark keeps a cached relation's
        # output partitioning stable so downstream plans can rely on it) —
        # which pins every persisted loop table (pagerank/HITS rank tables,
        # CC label tables, the crawl's epoch caches) at the static
        # spark.sql.shuffle.partitions width, and every shuffle DOWNSTREAM
        # of the cache inherits that width too.  Measured here: a
        # KB-sized persisted repartition ran 64-task stages end-to-end;
        # with this flag AQE sizes those exchanges by bytes (1 task local,
        # bandwidth-sized partitions on a cluster) — the scale-adaptive
        # partitioning the optimization guide (§2.2) prescribes instead of
        # a constant tuned for either local mode or the cluster.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        # DataFrame-debugging call-site capture (Spark 4 default ON) wraps
        # EVERY python DataFrame/Column call with a getActiveSession +
        # conf.get + PySparkCurrentOrigin.set/clear py4j round-trip AND an
        # inspect.stack() walk — cProfile over the 26-epoch sf0.1 crawl
        # showed ~78k py4j messages with ~20 s of driver-side DAG
        # construction, a large share from this wrapper.  Production
        # crawls build thousands of epoch DAGs; the enriched error
        # call-site context is a debug aid, not a correctness feature.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # small-ish Arrow batches: rows here often carry multi-KB bodies —
        # 10k-row batches would be 100s of MB per transfer
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Dio.netty.tryReflectionSetAccessible=true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Ship this package to executor Python workers (the in-process analog
    of production `spark-submit --py-files crawlspark.zip` — the north-rule
    deployment mode).  Without this, UDFs that close over package functions
    fail to unpickle on workers when the driver script runs from another
    cwd."""
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"linkkchecker_net_spark_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        zf.write(full, rel)
    spark.sparkContext.addPyFile(zpath)
