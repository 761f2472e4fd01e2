"""Guard against silently-shadowed top-level definitions (r4 verdict item 3).

Python keeps the LAST ``def``/``class`` of a given name in a module, so a
duplicate top-level name makes the first definition unreachable dead code and
masks future import errors.  Round 4 shipped exactly this bug
(``pipeline/multimodal.py`` had two ``def resize_images``); this test walks
every module's AST in the package (plus ``__spark_entry__``/``bench``) and
fails on any repeated top-level def/class name so the class of bug can't
recur.
"""

import ast
import pathlib

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
SOURCES = sorted((ROOT / "linkkchecker_net_spark").rglob("*.py")) + [
    ROOT / "__spark_entry__.py",
    ROOT / "bench.py",
]


@pytest.mark.parametrize("path", SOURCES, ids=lambda p: str(p.relative_to(ROOT)))
def test_no_duplicate_top_level_defs(path):
    tree = ast.parse(path.read_text(), filename=str(path))
    seen: dict[str, int] = {}
    dupes = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            if node.name in seen:
                dupes.append((node.name, seen[node.name], node.lineno))
            seen[node.name] = node.lineno
    assert not dupes, f"shadowed top-level defs in {path}: {dupes}"
