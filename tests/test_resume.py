"""Checkpoint/resume + partition-invariance tests (north-rule resume gate +
SURVEY.md §5.5 metamorphic properties)."""

from __future__ import annotations

import shutil

from linkkchecker_net_spark.engine import catalog, tables
from linkkchecker_net_spark.engine.driver import CrawlConfig, CrawlDriver

SORT = ["discovery_rank"]


def _collect_sorted(df, cols=None):
    cols = cols or df.columns
    return [tuple(r[c] for c in cols) for r in df.select(*cols).orderBy(*SORT).collect()]


def _mk_driver(spark, fx, ckpt, **kw):
    web = tables.web_df(spark, fx["web"])
    robots = tables.robots_df(spark, fx["robots"])
    return CrawlDriver(spark, web, robots, CrawlConfig(ckpt_dir=str(ckpt), **kw))


def test_kill_and_resume_identical(spark, golden_fixtures, tmp_path):
    """Run to completion; separately run 3 epochs, 'kill', resume; final
    results/seen/frontier content-identical (the bit-identical resume
    contract, BASELINE.json:6)."""
    fx = golden_fixtures

    full = _mk_driver(spark, fx, tmp_path / "full")
    full.run(fx["seeds"])

    part = _mk_driver(spark, fx, tmp_path / "part", max_epochs=3)
    part.run(fx["seeds"])
    assert catalog.list_complete_epochs(str(tmp_path / "part")) == [0, 1, 2]

    resumed = _mk_driver(spark, fx, tmp_path / "part")  # default max_epochs
    resumed.resume()

    assert _collect_sorted(resumed.results()) == _collect_sorted(full.results())
    assert sorted(
        (r["url"], r["first_depth"]) for r in resumed.seen().collect()
    ) == sorted((r["url"], r["first_depth"]) for r in full.seen().collect())


def test_resume_wipes_partial_epoch(spark, golden_fixtures, tmp_path):
    """A killed job may leave an epoch dir without a manifest — resume must
    ignore/wipe it and recompute that epoch identically."""
    fx = golden_fixtures
    ck = tmp_path / "wipe"
    part = _mk_driver(spark, fx, ck, max_epochs=2)
    part.run(fx["seeds"])

    # simulate a mid-epoch kill: epoch 2 dir exists, tables half-written,
    # no manifest
    ed = catalog.epoch_dir(str(ck), 2)
    import os

    os.makedirs(ed, exist_ok=True)
    shutil.copytree(
        catalog.epoch_dir(str(ck), 1) + "/results", ed + "/results", dirs_exist_ok=True
    )
    assert catalog.read_manifest(ed) is None

    resumed = _mk_driver(spark, fx, ck)
    resumed.resume()

    full = _mk_driver(spark, fx, tmp_path / "full2")
    full.run(fx["seeds"])
    assert _collect_sorted(resumed.results()) == _collect_sorted(full.results())


def test_partition_count_invariance(spark, golden_fixtures, tmp_path):
    """Seen set + ordering invariant under shuffle-partition count
    (SURVEY.md §5.5): rerun with a different spark.sql.shuffle.partitions."""
    fx = golden_fixtures
    a = _mk_driver(spark, fx, tmp_path / "p8")
    a.run(fx["seeds"])

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = _mk_driver(spark, fx, tmp_path / "p3")
        b.run(fx["seeds"])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)

    cols = ["url", "crawl_depth", "discovery_rank", "classification"]
    assert _collect_sorted(a.results(), cols) == _collect_sorted(b.results(), cols)


def test_frontier_seen_disjoint_every_epoch(spark, golden_fixtures, tmp_path):
    """Monotonicity invariant: frontier ∩ seen = ∅ at every epoch."""
    fx = golden_fixtures
    d = _mk_driver(spark, fx, tmp_path / "mono", default_budget=20)
    d.run(fx["seeds"])
    ck = str(tmp_path / "mono")
    for e in catalog.list_complete_epochs(ck):
        frontier = spark.read.parquet(catalog.epoch_dir(ck, e) + "/frontier")
        seen = spark.read.parquet(*catalog.seen_delta_paths(ck, e))
        overlap = frontier.join(seen, on="url", how="inner").count()
        assert overlap == 0, f"epoch {e}: frontier∩seen = {overlap}"
