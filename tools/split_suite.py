"""One-off refactor helper: move a set of suite queries (function body +
QUERIES entry + every ORACLE_SQL entry, literal-dict or appended) from one
suite module into a new module, preserving text verbatim.

AST gives exact line spans; comment lines immediately above a moved span
travel with it. Run from repo root:
    python tools/split_suite.py <src_module> <dst_module> '<docstring>' name1 name2 ...
"""
from __future__ import annotations

import ast
import sys
from pathlib import Path

HEADER_IMPORTS = '''from __future__ import annotations

import math  # noqa: F401
import tempfile  # noqa: F401

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from .operators.asof import asof_join  # noqa: F401
from .operators.pit import (  # noqa: F401
    entity_filter,
    latest_per_entity,
    temporal_filter,
    top_k_per_group,
)
from .suite_common import *  # noqa: F401,F403
'''


def leading_comments(lines: list[str], start_idx: int) -> int:
    """Index of the first line of the comment block directly above
    start_idx (0-based), or start_idx if none."""
    i = start_idx
    while i > 0 and lines[i - 1].lstrip().startswith("#"):
        i -= 1
    return i


def main() -> None:
    src_name, dst_name, doc, *names = sys.argv[1:]
    moved = set(names)
    pkg = Path("ml_feature_store_spark")
    src_path = pkg / f"{src_name}.py"
    src = src_path.read_text()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)

    cut: list[tuple[int, int]] = []  # 0-based [start, end) line ranges
    fn_chunks: list[str] = []
    oracle_chunks: list[str] = []
    moved_fn_names: dict[str, str] = {}

    for node in tree.body:
        # function blocks
        if isinstance(node, ast.FunctionDef) and node.name.startswith("q_"):
            qname = node.name[2:]
            if qname in moved:
                s = leading_comments(lines, node.lineno - 1)
                e = node.end_lineno
                fn_chunks.append("".join(lines[s:e]))
                cut.append((s, e))
                moved_fn_names[qname] = node.name
        # appended ORACLE_SQL["x"] = ... assignments
        if (
            isinstance(node, ast.Assign)
            and isinstance(node.targets[0], ast.Subscript)
            and isinstance(node.targets[0].value, ast.Name)
            and node.targets[0].value.id == "ORACLE_SQL"
            and isinstance(node.targets[0].slice, ast.Constant)
            and node.targets[0].slice.value in moved
        ):
            s = leading_comments(lines, node.lineno - 1)
            e = node.end_lineno
            oracle_chunks.append("".join(lines[s:e]))
            cut.append((s, e))
        # the QUERIES literal dict: drop moved entries
        if (
            isinstance(node, ast.Assign)
            and isinstance(node.targets[0], ast.Name)
            and node.targets[0].id == "QUERIES"
            and isinstance(node.value, ast.Dict)
        ):
            for k, v in zip(node.value.keys, node.value.values):
                if isinstance(k, ast.Constant) and k.value in moved:
                    cut.append((k.lineno - 1, v.end_lineno))
        # the ORACLE_SQL literal dict: extract moved entries as appends
        if (
            isinstance(node, ast.AnnAssign)
            and isinstance(node.target, ast.Name)
            and node.target.id == "ORACLE_SQL"
            and isinstance(node.value, ast.Dict)
        ):
            for k, v in zip(node.value.keys, node.value.values):
                if isinstance(k, ast.Constant) and k.value in moved:
                    s = leading_comments(lines, k.lineno - 1)
                    e = v.end_lineno
                    body = "".join(lines[s:e])
                    # strip the dict-entry syntax: `"name": <expr>,` ->
                    # assignment form
                    body = body.replace(f'"{k.value}": ', "", 1)
                    body = body.rstrip()
                    if body.endswith(","):
                        body = body[:-1]
                    oracle_chunks.append(
                        f'ORACLE_SQL["{k.value}"] = ' + body + "\n"
                    )
                    cut.append((s, e))

    missing = moved - set(moved_fn_names)
    if missing:
        raise SystemExit(f"functions not found for: {sorted(missing)}")

    # rewrite source with cut ranges removed
    drop = set()
    for s, e in cut:
        drop.update(range(s, e))
    out_lines = [ln for i, ln in enumerate(lines) if i not in drop]
    src_path.write_text("".join(out_lines))

    # assemble the new module
    queries_entries = "\n".join(
        f"    '{q}': {fn}," for q, fn in moved_fn_names.items()
    )
    new = (
        f'"""{doc}"""\n'
        + HEADER_IMPORTS
        + "\n\n"
        + "\n\n".join(c.rstrip("\n") for c in fn_chunks)
        + "\n\n\nQUERIES = {\n"
        + queries_entries
        + "\n}\n\nORACLE_SQL: dict[str, str] = {}\n\n"
        + "\n".join(c.rstrip("\n") + "\n" for c in oracle_chunks)
    )
    (pkg / f"{dst_name}.py").write_text(new)
    print(f"moved {len(moved_fn_names)} queries, {len(oracle_chunks)} oracles")
    print(f"{src_name}: {len(out_lines)} lines; {dst_name}: {len(new.splitlines())} lines")


if __name__ == "__main__":
    main()
