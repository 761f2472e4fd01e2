"""S4 — plugin/config source (EngineConfig.cs:23-56; per-extension JSON,
UsedImagesChecker.cs:41-62): file formats, error-string shapes, registry +
import-path resolution, and config dataclass mapping."""

import json

from linkkchecker_net_spark.config import (
    BUILTIN_EXTENSIONS,
    UsedImagesCheckerConfig,
    load_extensions,
)


def _write(dirpath, name, content):
    p = dirpath / name
    p.write_text(content)
    return p


def test_missing_extensions_txt_is_fine(tmp_path):
    cfg = load_extensions(str(tmp_path))
    assert cfg.extensions == [] and cfg.errors == []


def test_builtin_registry_and_json_config(tmp_path):
    _write(
        tmp_path,
        "extensions.txt",
        "SpiderEngine.UsedImagesChecker,SpiderEngine.UsedImagesChecker\n"
        "SpiderEngine.CanonicalChecker\n",
    )
    _write(
        tmp_path,
        "SpiderEngine.UsedImagesChecker.json",
        json.dumps(
            {
                "ImagesBaseDirectory": "/imgs",
                "SitePrefixToRemove": "blog",
                "SitesToScan": ["a.test"],
            }
        ),
    )
    cfg = load_extensions(str(tmp_path))
    assert [e.name for e in cfg.extensions] == [
        "SpiderEngine.UsedImagesChecker",
        "SpiderEngine.CanonicalChecker",
    ]
    ui = UsedImagesCheckerConfig.from_json(cfg.extensions[0].config)
    assert ui.images_base_directory == "/imgs"
    assert ui.site_prefix_to_remove == "blog"
    assert ui.sites_to_scan == ["a.test"]
    # reference complains about the missing canonical-checker json but
    # still loads the extension (UsedImagesChecker.cs:60-62 semantics)
    assert any(
        "No config file for extension SpiderEngine.CanonicalChecker" in e
        for e in cfg.errors
    )


def test_bad_line_collects_error_and_continues(tmp_path):
    _write(
        tmp_path,
        "extensions.txt",
        "Nope.NotAThing,also.not:a.thing\nSpiderEngine.DescriptionLengthChecker\n",
    )
    cfg = load_extensions(str(tmp_path))
    assert [e.name for e in cfg.extensions] == ["SpiderEngine.DescriptionLengthChecker"]
    assert any("reading extension config file line is Nope.NotAThing" in e for e in cfg.errors)


def test_import_path_plugin(tmp_path):
    # the reflection analog: module:callable resolves to a user function
    _write(tmp_path, "extensions.txt", "myplugin,json:loads\n")
    cfg = load_extensions(str(tmp_path))
    assert cfg.extensions[0].runner is json.loads


def test_all_four_reference_checkers_registered():
    assert set(BUILTIN_EXTENSIONS) == {
        "SpiderEngine.CanonicalChecker",
        "SpiderEngine.DescriptionLengthChecker",
        "SpiderEngine.UsedImagesChecker",
        "SpiderEngine.SiteMapChecker",
    }
