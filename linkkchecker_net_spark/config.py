"""S4 — the plugin/config source (EngineConfig.cs:23-56 + per-extension
JSON, UsedImagesChecker.cs:41-59).

The reference loads `extensions.txt` (lines of `TypeName,AssemblyPath`),
reflection-instantiates each `ISpiderExtension`, and each extension reads
its own `<TypeName>.json` config in `Init()`.  The Python analog keeps the
exact file formats and error strings:

* `extensions.txt` lines are `name,target` — `target` is either a
  built-in registry key (the four reference checkers) or a
  `module:callable` import path (the reflection analog for user plugins);
* `<name>.json` is parsed into the extension's config dataclass with the
  reference's property names (`ImagesBaseDirectory`, `SitePrefixToRemove`,
  `SitesToScan`);
* load errors collect into `errors` with the reference's message shapes
  (`"Error {msg} reading extension config file line is {line}"`,
  `"No config file for extension {name}"`) instead of raising — a broken
  plugin line must not kill the crawl (EngineConfig.cs:45-48).

An extension here is a report callable `(driver, config) -> DataFrame`
run after the crawl (the reference's `Done()` pass) — reports are
declarative queries, so "plugin" reduces to "named query + its config".
"""

from __future__ import annotations

import importlib
import json
import os
from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass
class UsedImagesCheckerConfig:
    """UsedImagesChecker.UsedImagesCheckerConfig (UsedImagesChecker.cs:18-32)."""

    images_base_directory: str | None = None
    site_prefix_to_remove: str = ""
    sites_to_scan: list[str] = field(default_factory=list)

    @classmethod
    def from_json(cls, payload: dict) -> "UsedImagesCheckerConfig":
        return cls(
            images_base_directory=payload.get("ImagesBaseDirectory"),
            site_prefix_to_remove=payload.get("SitePrefixToRemove", "") or "",
            sites_to_scan=list(payload.get("SitesToScan") or []),
        )


def _run_canonical(driver, config):
    from linkkchecker_net_spark.reports.reports import canonical_report

    return canonical_report(driver.page_meta())


def _run_description(driver, config):
    from linkkchecker_net_spark.reports.reports import description_report

    return description_report(driver.page_meta())


def _run_used_images(driver, config):
    from linkkchecker_net_spark.reports.reports import used_images_path_report

    cfg = UsedImagesCheckerConfig.from_json(config or {})
    disk = driver.spark.read.parquet(cfg.images_base_directory)
    return used_images_path_report(
        disk,
        driver.results(),
        sites_to_scan=cfg.sites_to_scan,
        site_prefix_to_remove=cfg.site_prefix_to_remove,
    )


def _run_sitemap(driver, config):
    from pyspark.sql import functions as F

    from linkkchecker_net_spark.reports.reports import (
        sitemap_report,
        sitemap_xml_locs,
    )

    bodies = driver.spark.read.parquet((config or {})["SitemapBodies"])
    sitemaps = (
        sitemap_xml_locs(bodies).groupBy("host").agg(F.collect_list("loc").alias("loc"))
    )
    seed_hosts = [
        r[0]
        for r in driver.results()
        .select(F.lower(F.parse_url("seed_url", F.lit("HOST"))))
        .distinct()
        .collect()
        if r[0]
    ]
    return sitemap_report(sitemaps, driver.results(), driver.web, seed_hosts)


# The reference's four shipped checkers, keyed by their .NET type names
# (the `TypeName` column of extensions.txt).
BUILTIN_EXTENSIONS: dict[str, Callable] = {
    "SpiderEngine.CanonicalChecker": _run_canonical,
    "SpiderEngine.DescriptionLengthChecker": _run_description,
    "SpiderEngine.UsedImagesChecker": _run_used_images,
    "SpiderEngine.SiteMapChecker": _run_sitemap,
}


@dataclass
class LoadedExtension:
    name: str
    runner: Callable  # (driver, config_dict|None) -> DataFrame
    config: dict | None  # parsed <name>.json, or None

    def done(self, driver):
        """The reference's post-crawl `Done()` pass."""
        return self.runner(driver, self.config)


@dataclass
class ExtensionsConfig:
    extensions: list[LoadedExtension] = field(default_factory=list)
    errors: list[str] = field(default_factory=list)


def _resolve(target: str) -> Callable | None:
    """Registry key, else `module:callable` import (the reflection analog:
    Assembly.LoadFile + CreateInstance, EngineConfig.cs:40-43)."""
    if target in BUILTIN_EXTENSIONS:
        return BUILTIN_EXTENSIONS[target]
    if ":" in target:
        mod, attr = target.split(":", 1)
        return getattr(importlib.import_module(mod), attr)
    return None


def load_extensions(config_dir: str) -> ExtensionsConfig:
    """`extensions.txt` + per-extension JSON from `config_dir`.

    Missing extensions.txt ⇒ no extensions, no error (EngineConfig.cs:25:
    the file is optional).  A bad line collects an error and is skipped.
    A missing `<name>.json` collects the reference's complaint
    (UsedImagesChecker.cs:60-62) but still loads the extension — the
    runner decides whether it can work unconfigured.
    """
    out = ExtensionsConfig()
    path = os.path.join(config_dir, "extensions.txt")
    if not os.path.exists(path):
        return out
    try:
        lines = open(path).read().splitlines()
    except OSError as ex:
        out.errors.append(f"Error {ex} reading file {path}")
        return out
    for line in lines:
        if not line.strip():
            continue
        try:
            tokens = line.split(",")
            name = tokens[0].strip()
            target = tokens[1].strip() if len(tokens) > 1 else name
            runner = _resolve(target)
            if runner is None:
                raise ValueError(f"unknown extension target {target!r}")
        except Exception as ex:
            out.errors.append(
                f"Error {ex} reading extension config file line is {line}"
            )
            continue
        cfg_path = os.path.join(config_dir, f"{name}.json")
        config = None
        if os.path.exists(cfg_path):
            try:
                config = json.loads(open(cfg_path).read())
            except (OSError, ValueError) as ex:
                out.errors.append(
                    f"Error reading config file for extension {name} : {ex}"
                )
        else:
            out.errors.append(f"No config file for extension {name}")
        out.extensions.append(LoadedExtension(name=name, runner=runner, config=config))
    return out
