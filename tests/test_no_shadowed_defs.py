"""Lint: no module may define the same top-level name twice.

Guards against the round-6 `_docs_src` incident (queries/llmdata.py
defined it twice with different schemas; lambdas resolving the name at
call time silently bound to the LATER definition — VERDICT r6 item 3).
"""

from __future__ import annotations

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parents[1] / (
    "etl_moodle_and_mass_email_sending_spark"
)


def test_no_duplicate_top_level_defs():
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        tree = ast.parse(path.read_text())
        seen: dict[str, int] = {}
        for node in tree.body:
            if isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                if node.name in seen:
                    offenders.append(
                        f"{path.name}:{node.lineno} redefines "
                        f"{node.name} (first at :{seen[node.name]})"
                    )
                seen[node.name] = node.lineno
    assert not offenders, "\n".join(offenders)
