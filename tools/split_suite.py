"""One-shot refactoring script: split suite.py by query family.

Produces suite_common.py (shared helpers/constants/oracle fragments) and
four family modules (suite_store / suite_rel / suite_text / suite_sim),
each with its q_ defs plus QUERIES / ORACLE_SQL fragments, and rewrites
suite.py as the assembly module (merge + canonical order + relational +
rotation). Pure text movement — every moved statement keeps its original
source text, so behavior (including f-string oracle construction) is
unchanged. Gate: tools/check.py + pytest after running.
"""

from __future__ import annotations

import ast
import re
from pathlib import Path

PKG = Path("ml_feature_store_spark")
SRC = PKG / "suite.py"

src = SRC.read_text()
lines = src.splitlines(keepends=True)
tree = ast.parse(src)


def text(a: int, b: int) -> str:  # 1-based inclusive line span
    return "".join(lines[a - 1 : b])


OVERRIDES = {
    "s3_bm25_search": "sim",  # rag1's oracle embeds s3's oracle SQL
    "x7_sessionize": "store",  # sd3's oracle aliases x7's
    "x7b_session_stats": "store",
    "x4_text_stats": "text",
    "x15_dedup_components": "text",
    "x5_json_extract": "rel",
    "io10_zorder_layout": "rel",
}


def family(name: str) -> str:
    if name in OVERRIDES:
        return OVERRIDES[name]
    p = name.split("_")[0]
    if re.fullmatch(r"f\d+[a-z]*|h\d+|sd\d+|online\d*|io8", p):
        return "store"
    if re.fullmatch(
        r"q\d+|j\d+|r\d+|s\d+|u\d+|a\d+[a-z]*|io\d+|d\d+|g1|p\d+|w\d+|dq\d+"
        r"|card\d+|arr\d+|map\d+|b\d+",
        p,
    ):
        return "rel"
    if re.fullmatch(
        r"t\d+[a-z]*|c\d+|x3|x6b?|x9|x12|x13|x18|x2[0-7]|fe\d+|er\d+|mix\d+"
        r"|pack\d+|shuf\d+|decon\d+|pipe\d+",
        p,
    ):
        return "text"
    return "sim"


# ---- pass 1: find registrations (query name <-> function), in order ----
fn2name: dict[str, str] = {}
reg_order: list[str] = []
big_queries_node = big_oracle_node = None
for node in tree.body:
    tgt = None
    if isinstance(node, ast.AnnAssign):
        tgt, val = node.target, node.value
    elif isinstance(node, ast.Assign) and len(node.targets) == 1:
        tgt, val = node.targets[0], node.value
    else:
        continue
    if isinstance(tgt, ast.Name) and tgt.id == "QUERIES" and isinstance(val, ast.Dict):
        big_queries_node = node
        for k, v in zip(val.keys, val.values):
            fn2name[v.id] = k.value
            reg_order.append(k.value)
    elif isinstance(tgt, ast.Name) and tgt.id == "ORACLE_SQL" and isinstance(val, ast.Dict):
        big_oracle_node = node
    elif (
        isinstance(tgt, ast.Subscript)
        and isinstance(tgt.value, ast.Name)
        and tgt.value.id == "QUERIES"
        and isinstance(val, ast.Name)
    ):
        fn2name[val.id] = ast.literal_eval(tgt.slice)
        reg_order.append(ast.literal_eval(tgt.slice))

assert big_queries_node is not None and big_oracle_node is not None
assert len(reg_order) == len(set(reg_order)), "duplicate registrations"

# ---- pass 2: route every top-level statement ----
MODS = ("store", "rel", "text", "sim")
defs: dict[str, list[str]] = {m: [] for m in MODS}  # q_ def blocks
oracle_entries: dict[str, list[str]] = {m: [] for m in MODS}  # dict-literal slices
oracle_stmts: dict[str, list[str]] = {m: [] for m in MODS}  # subscript assigns
common_blocks: list[str] = []

header_end = 31  # last top-level import line of the original file
relational_line = next(
    n.lineno
    for n in tree.body
    if isinstance(n, ast.ImportFrom) and n.module == "relational"
)

prev_end = header_end
for node in tree.body:
    if node.end_lineno <= header_end:
        continue
    if node.lineno >= relational_line:
        break  # tail (relational merge + rotation) handled verbatim below
    block = text(prev_end + 1, node.end_lineno)
    prev_end = node.end_lineno

    if isinstance(node, ast.FunctionDef) and node.name.startswith("q_"):
        qname = fn2name[node.name]
        defs[family(qname)].append(block)
    elif node is big_queries_node:
        pass  # regenerated per module
    elif node is big_oracle_node:
        val = node.value
        e_prev = node.lineno  # line of "ORACLE_SQL: ... = {"
        for k, v in zip(val.keys, val.values):
            entry = text(e_prev + 1, v.end_lineno)
            oracle_entries[family(k.value)].append(entry)
            e_prev = v.end_lineno
    elif isinstance(node, ast.Assign) and isinstance(node.targets[0], ast.Subscript):
        t = node.targets[0]
        key = ast.literal_eval(t.slice)
        if t.value.id == "ORACLE_SQL":
            oracle_stmts[family(key)].append(block)
        else:  # QUERIES["k"] = fn — regenerated
            # keep any attached comments with the family module
            comment_only = "".join(
                ln for ln in block.splitlines(keepends=True)
                if ln.lstrip().startswith("#") or not ln.strip()
            )
            if comment_only.strip():
                oracle_stmts[family(key)].append(comment_only)
    else:
        common_blocks.append(block)

HEADER = '''\
from __future__ import annotations

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
'''

DOCS = {
    "store": "Feature-store semantics: PIT/as-of (f-ops), versioned store "
    "mutations, rollups (h-ops), streaming-state witnesses (sd-ops), "
    "sessionization and store-backed IO maintenance.",
    "rel": "Relational / IO / aggregate / window / sort / set / scalar "
    "queries and the data-quality (dq) family.",
    "text": "Text analysis, exact & near-dup dedup, tokenizer, sampling / "
    "mixing / packing and corpus-curation pipelines.",
    "sim": "Similarity search & embeddings, multimodal kernels, graph "
    "algorithms, time-series and RAG evaluation harnesses.",
}

# ---- write suite_common.py ----
common_names = []
for node in tree.body:
    if header_end < node.lineno < relational_line:
        if isinstance(node, ast.FunctionDef) and not node.name.startswith("q_"):
            common_names.append(node.name)
        elif isinstance(node, (ast.Assign, ast.AnnAssign)):
            tgt = node.target if isinstance(node, ast.AnnAssign) else node.targets[0]
            if isinstance(tgt, ast.Name) and tgt.id not in ("QUERIES", "ORACLE_SQL"):
                common_names.append(tgt.id)

common_src = (
    '"""Shared helpers, constants and oracle-SQL fragments for the query\n'
    "suite family modules (split from the original single-module suite.py;\n"
    'see suite.py for assembly and SURVEY.md §2 for the inventory)."""\n\n'
    + HEADER
    + "\n"
    + "".join(common_blocks)
    + "\n\n__all__ = [\n"
    + "".join(f"    {n!r},\n" for n in common_names)
    + "]\n"
)
(PKG / "suite_common.py").write_text(common_src)

# ---- write family modules ----
for m in MODS:
    q_entries = "".join(
        f"    {name!r}: q_{'' if True else ''}{fn},\n"
        for name, fn in (
            (n, next(f for f, qn in fn2name.items() if qn == n))
            for n in reg_order
            if family(n) == m
        )
    )
    # fn already includes the q_ prefix
    q_entries = q_entries.replace(": q_q_", ": q_")
    mod_src = (
        f'"""{DOCS[m]}\n\nSplit from suite.py (round 4); assembled by suite.py."""\n\n'
        + HEADER
        + "from .suite_common import *  # noqa: F401,F403\n\n"
        + "".join(defs[m])
        + "\n\nQUERIES = {\n"
        + q_entries
        + "}\n\nORACLE_SQL: dict[str, str] = {\n"
        + "".join(oracle_entries[m])
        + "\n}\n\n"
        + "".join(oracle_stmts[m])
    )
    (PKG / f"suite_{m}.py").write_text(mod_src)

# fix the q_ prefix bug in generated entries (name -> function object name)
for m in MODS:
    p = PKG / f"suite_{m}.py"
    s = p.read_text()
    # entries were generated as 'name': q_<fnname-with-q_prefix>; fnname
    # already starts with q_, so strip the doubled prefix if present
    s = s.replace(": q_q_", ": q_")
    p.write_text(s)

# ---- write new suite.py ----
doc_end = tree.body[0].end_lineno if isinstance(tree.body[0], ast.Expr) else 0
orig_doc = text(1, doc_end) if doc_end else ""
tail = "".join(lines[relational_line - 1 :])
canonical = "".join(f"    {n!r},\n" for n in reg_order)
suite_src = (
    orig_doc
    + """
from __future__ import annotations

from collections.abc import Callable  # noqa: F401

from pyspark.sql import DataFrame, SparkSession  # noqa: F401

from . import suite_rel, suite_sim, suite_store, suite_text
from .suite_common import *  # noqa: F401,F403 — re-export table/events_features/...

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}
for _mod in (suite_store, suite_rel, suite_text, suite_sim):
    QUERIES.update(_mod.QUERIES)
    ORACLE_SQL.update(_mod.ORACLE_SQL)

# Pre-split canonical registration order (rotation below puts the round's
# correctness window first; the remainder keeps this order).
_CANONICAL = [
"""
    + canonical
    + """]
assert set(_CANONICAL) == set(QUERIES), (
    sorted(set(_CANONICAL) ^ set(QUERIES))
)
QUERIES = {n: QUERIES[n] for n in _CANONICAL}

"""
    + tail
)
SRC.write_text(suite_src)
print("split done")
print({m: len(defs[m]) for m in MODS})
print("oracle entries:", {m: len(oracle_entries[m]) for m in MODS})
print("common blocks:", len(common_blocks), "common names:", len(common_names))
