"""Property-based tests (hypothesis) for the round-3 operators, each
checked against a ~10-line pure-Python executable spec of the documented
semantics — greedy left-to-right BPE merging, triangle counting over
canonicalized edges, leave-one-out target encoding with truncating
integer division."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ml_feature_store_spark.operators.encoding import target_encode_loo
from ml_feature_store_spark.operators.graph import triangle_count
from ml_feature_store_spark.operators.text import _apply_merge

SETTINGS = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def spec_merge(toks: list[str], x: str, y: str, joined: str) -> list[str]:
    out: list[str] = []
    for t in toks:
        if out and out[-1] == x and t == y:
            out[-1] = joined
        else:
            out.append(t)
    return out


tokens = st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12)


class TestBpeMergeProperty:
    @SETTINGS
    @given(toks=tokens, x=st.sampled_from(["a", "b"]), y=st.sampled_from(["b", "c"]))
    def test_fold_matches_python_spec(self, spark, toks, x, y):
        if x == y:
            return  # operator contract: distinct halves only
        df = spark.createDataFrame([(toks,)], "tk array<string>")
        (row,) = df.select(
            _apply_merge(F.col("tk"), x, y, x + "+" + y).alias("m")
        ).collect()
        assert row.m == spec_merge(toks, x, y, x + "+" + y)


def spec_triangles(edges: list[tuple[int, int]]) -> tuple[int, int]:
    e = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = sorted({v for p in e for v in p})
    tri = sum(
        1
        for i, a in enumerate(nodes)
        for b in nodes[i + 1 :]
        for c in nodes
        if b < c and (a, b) in e and (b, c) in e and (a, c) in e
    )
    return len(e), tri


edge_lists = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 5)), min_size=0, max_size=15
)


class TestTriangleProperty:
    @SETTINGS
    @given(edges=edge_lists)
    def test_matches_brute_force(self, spark, edges):
        df = spark.createDataFrame(edges, "src long, dst long") if edges else (
            spark.createDataFrame([], "src long, dst long")
        )
        (row,) = triangle_count(df).collect()
        assert (row.n_edges, row.n_triangles) == spec_triangles(edges)


def spec_loo(rows: list[tuple[str, int]]) -> dict[int, int | None]:
    # rows are (cat, cents); returns per-index encoded value
    out: dict[int, int | None] = {}
    for i, (cat, cents) in enumerate(rows):
        group = [c for (k, c) in rows if k == cat]
        if len(group) == 1:
            out[i] = None
        else:
            # numerator is non-negative here, so floor == truncate and
            # Python // matches Spark DIV exactly
            out[i] = (sum(group) - cents) * 10_000 // (len(group) - 1)
    return out


loo_rows = st.lists(
    st.tuples(st.sampled_from(["p", "q"]), st.integers(0, 10_000)),
    min_size=1,
    max_size=12,
)


class TestTargetEncodeProperty:
    @SETTINGS
    @given(rows=loo_rows)
    def test_matches_python_spec(self, spark, rows):
        # give every row a unique id so duplicate (cat, cents) rows stay
        # distinguishable in the output
        data = [(i, cat, cents / 100.0) for i, (cat, cents) in enumerate(rows)]
        df = spark.createDataFrame(data, "id long, cat string, y double")
        got = {
            r.id: r.te_loo_e4 for r in target_encode_loo(df, "cat", "y").collect()
        }
        want = spec_loo(rows)
        assert got == want
