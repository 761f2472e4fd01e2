"""BFS epoch driver loop with checkpoint/resume (SURVEY.md §7 M3).

The reference's recursion-as-task-tree (Engine.cs:322-349) becomes
iteration over depth: one Spark job per epoch materializes
frontier/seen/results/page_meta/metrics to the checkpoint catalog, and the
manifest commit (atomic rename) makes every epoch a resume point — kill the
process anywhere and `CrawlDriver.resume()` continues from the last
complete epoch, producing final tables content-identical to an
uninterrupted run (north-rule resume gate; the reference's analog is
cancellation handling at Program.cs:31-40).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkkchecker_net_spark import schemas
from linkkchecker_net_spark.engine import catalog, epoch as epoch_mod
from linkkchecker_net_spark.engine.filters import build_partitioned_filters
from linkkchecker_net_spark.kernels.canonicalize import canonicalize, host_of


@dataclass
class CrawlConfig:
    ckpt_dir: str
    default_budget: int = 10**9
    max_epochs: int = 1000
    snapshot_filters: bool = False  # cuckoo seen-filter snapshots per epoch
    filter_partitions: int = 8


class CrawlDriver:
    def __init__(
        self,
        spark: SparkSession,
        web: DataFrame,
        robots: DataFrame,
        config: CrawlConfig,
    ) -> None:
        self.spark = spark
        self.web = web
        self.robots = robots
        self.cfg = config

    # ------------------------------------------------------------------ init
    def init_seeds(self, seeds: list[dict]) -> dict:
        """Epoch-0 frontier from the seed list — driver-side Python (tiny),
        mirroring EngineConfig.cs:58-70 scheme defaulting + claim-at-init."""
        rows, seen_urls, seed_hosts = [], set(), []
        rank = 0
        for s in seeds:
            raw = (s.get("seed_url") or "").strip()
            if raw and not raw.lower().startswith("http"):
                raw = "http://" + raw
            url = canonicalize(None, raw)
            if url is None or url in seen_urls:
                continue
            seen_urls.add(url)
            host = host_of(url) or ""
            if host not in seed_hosts:
                seed_hosts.append(host)
            rows.append(
                (url, 0, host, 0, int(s.get("priority", 0)), 0, None, url, True, True, rank)
            )
            rank += 1

        frontier = (
            self.spark.createDataFrame(rows, schema=schemas.FRONTIER)
            .withColumn("url_hash", F.xxhash64("url"))
            .withColumn("host_hash", F.xxhash64("host"))
        )
        d = catalog.init_dir(self.cfg.ckpt_dir)
        os.makedirs(d, exist_ok=True)
        catalog.write_table(frontier, os.path.join(d, "frontier"))
        catalog.write_table(
            frontier.select(
                "url_hash", "url", F.col("crawl_depth").alias("first_depth"),
                F.lit(-1).alias("epoch"),
            ),
            os.path.join(d, "seen_delta"),
        )
        manifest = {
            "next_rank": rank,
            "frontier_count": len(rows),
            "seed_hosts": seed_hosts,
            "next_epoch": 0,
        }
        catalog.write_manifest(d, manifest)
        return manifest

    # ------------------------------------------------------------- one epoch
    def _read_state(self) -> dict:
        """Locate the last complete epoch (or init) and rebuild loop state."""
        ck = self.cfg.ckpt_dir
        epochs = catalog.list_complete_epochs(ck)
        if epochs:
            last = epochs[-1]
            man = catalog.read_manifest(catalog.epoch_dir(ck, last))
            frontier_path = os.path.join(catalog.epoch_dir(ck, last), "frontier")
        else:
            man = catalog.read_manifest(catalog.init_dir(ck))
            if man is None:
                raise RuntimeError("checkpoint not initialized — call init_seeds()")
            last = -1
            frontier_path = os.path.join(catalog.init_dir(ck), "frontier")
        return {
            "next_epoch": man["next_epoch"],
            "next_rank": man["next_rank"],
            "frontier_count": man["frontier_count"],
            "seed_hosts": man["seed_hosts"],
            "last_epoch": last,
            "frontier_path": frontier_path,
        }

    def run_one_epoch(self, state: dict) -> dict:
        ck, cfg, spark = self.cfg.ckpt_dir, self.cfg, self.spark
        e = state["next_epoch"]
        t0 = time.monotonic()
        frontier = catalog.read_table(spark, state["frontier_path"])
        seen = spark.read.parquet(*catalog.seen_delta_paths(ck, e - 1))

        res = epoch_mod.run_epoch(
            spark,
            frontier=frontier,
            seen=seen,
            web=self.web,
            robots=self.robots,
            seed_hosts=state["seed_hosts"],
            epoch=e,
            next_rank=state["next_rank"],
            default_budget=cfg.default_budget,
        )

        ed = catalog.epoch_dir(ck, e)
        os.makedirs(ed, exist_ok=True)
        # materialize the expensive shared stages once
        res.batch.persist()
        catalog.write_table(res.seen_delta, os.path.join(ed, "seen_delta"))
        catalog.write_table(res.results, os.path.join(ed, "results"))
        catalog.write_table(res.page_meta, os.path.join(ed, "page_meta"))
        new_frontier = res.carry.unionByName(res.new_frontier_entries)
        catalog.write_table(new_frontier, os.path.join(ed, "frontier"))
        res.batch.unpersist()

        # counts from the materialized parquet (no recompute of the DAG);
        # one aggregation job per table
        results_w = catalog.read_table(spark, os.path.join(ed, "results"))
        frontier_w = catalog.read_table(spark, os.path.join(ed, "frontier"))
        cls_rows = (
            results_w.groupBy("classification")
            .agg(F.count("*").alias("n"), F.max("discovery_rank").alias("mx"))
            .collect()
        )
        by_class = {r["classification"]: r["n"] for r in cls_rows}
        max_rank_res = max((r["mx"] for r in cls_rows), default=None)
        fro = frontier_w.agg(
            F.count("*").alias("n"), F.max("discovery_rank").alias("mx")
        ).collect()[0]
        frontier_count, max_rank_fro = fro["n"], fro["mx"]
        # ranks are consumed by BOTH terminal result rows and new frontier
        # entries — advance past the max of either
        next_rank = max(
            state["next_rank"],
            (max_rank_res if max_rank_res is not None else -1) + 1,
            (max_rank_fro if max_rank_fro is not None else -1) + 1,
        )
        fetched_n = sum(
            v for k, v in by_class.items() if k not in ("unsupported", "robots_blocked")
        )
        elapsed = time.monotonic() - t0

        metrics = self.spark.createDataFrame(
            [
                (
                    e,
                    fetched_n,
                    by_class.get("ok", 0),
                    by_class.get("redirect", 0),
                    by_class.get("broken", 0),
                    by_class.get("error", 0),
                    by_class.get("unsupported", 0),
                    sum(by_class.values()),
                    frontier_count,
                    elapsed,
                )
            ],
            schema=schemas.METRICS,
        )
        catalog.write_table(metrics, os.path.join(ed, "metrics"))

        if cfg.snapshot_filters:
            build_partitioned_filters(
                spark.read.parquet(*catalog.seen_delta_paths(ck, e)),
                os.path.join(ed, "filters"),
                partitions=cfg.filter_partitions,
            )

        manifest = {
            "next_rank": next_rank,
            "frontier_count": frontier_count,
            "seed_hosts": state["seed_hosts"],
            "next_epoch": e + 1,
            "by_class": by_class,
            "elapsed_sec": elapsed,
        }
        catalog.write_manifest(ed, manifest)
        return {
            **state,
            "next_epoch": e + 1,
            "next_rank": next_rank,
            "frontier_count": frontier_count,
            "last_epoch": e,
            "frontier_path": os.path.join(ed, "frontier"),
        }

    # ------------------------------------------------------------------ loop
    def run(self, seeds: list[dict] | None = None) -> dict:
        """Run to frontier exhaustion.  With seeds=None, resume from the
        last complete checkpoint (wiping partially-written epochs)."""
        if seeds is not None:
            self.init_seeds(seeds)
        catalog.wipe_incomplete(self.cfg.ckpt_dir)
        state = self._read_state()
        while state["frontier_count"] > 0 and state["next_epoch"] < self.cfg.max_epochs:
            state = self.run_one_epoch(state)
        return state

    resume = run  # resume() == run(seeds=None)

    # ----------------------------------------------------------- final reads
    def results(self, upto_epoch: int | None = None) -> DataFrame:
        ck = self.cfg.ckpt_dir
        last = upto_epoch if upto_epoch is not None else (catalog.list_complete_epochs(ck) or [-1])[-1]
        paths = catalog.results_paths(ck, last)
        return self.spark.read.parquet(*paths)

    def page_meta(self) -> DataFrame:
        ck = self.cfg.ckpt_dir
        last = (catalog.list_complete_epochs(ck) or [-1])[-1]
        return self.spark.read.parquet(*catalog.page_meta_paths(ck, last))

    def seen(self) -> DataFrame:
        ck = self.cfg.ckpt_dir
        last = (catalog.list_complete_epochs(ck) or [-1])[-1]
        return self.spark.read.parquet(*catalog.seen_delta_paths(ck, last))

    def metrics(self) -> DataFrame:
        ck = self.cfg.ckpt_dir
        paths = [
            os.path.join(catalog.epoch_dir(ck, e), "metrics")
            for e in catalog.list_complete_epochs(ck)
        ]
        return self.spark.read.parquet(*paths)
