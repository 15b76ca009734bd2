"""Round-5 operator additions: mapInArrow table function (token_runs),
Unicode NFC normalization, and two-pass global row numbering.

Each gets a semantics check against an in-test brute-force reference,
plus the physical property that motivates the operator (fe6: no
single-partition global-window exchange; udtf1: lossless expansion)."""

from __future__ import annotations

import unicodedata

import pytest
from pyspark.sql import functions as F

from ml_feature_store_spark.operators.text import normalize_nfc, token_runs
from ml_feature_store_spark.operators.util import global_row_number
from ml_feature_store_spark.suite import table

SF = "/root/testdata/sf0.001"


def brute_runs(text):
    """Reference run-length expansion: (run_idx, token, run_start, run_len)."""
    toks = text.split(" ")
    out, i, ri = [], 0, 0
    while i < len(toks):
        j = i + 1
        while j < len(toks) and toks[j] == toks[i]:
            j += 1
        out.append((ri, toks[i], i, j - i))
        ri += 1
        i = j
    return out


class TestTokenRuns:
    def test_matches_brute_force(self, spark):
        rows = [
            (1, "a a a b b c"),
            (2, "x y x y"),
            (3, "solo"),
            (4, ""),  # ''.split(' ') == [''] -> one run of the empty token
            (5, None),  # NULL expands to zero rows, like unnest(NULL)
            (6, "t t t t t t t t"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["doc_id"], r["run_idx"]): (r["token"], r["run_start"], r["run_len"])
            for r in token_runs(df).collect()
        }
        want = {}
        for did, text in rows:
            if text is None:
                continue
            for ri, tok, st, ln in brute_runs(text):
                want[(did, ri)] = (tok, st, ln)
        assert got == want

    def test_lossless_expansion(self, spark):
        """sum(run_len) per doc must rebuild the doc's token count —
        the generator drops and invents nothing."""
        docs = table(spark, SF, "documents").limit(50)
        runs = token_runs(docs)
        rebuilt = {
            r["doc_id"]: r["n"]
            for r in runs.groupBy("doc_id")
            .agg(F.sum("run_len").alias("n"))
            .collect()
        }
        truth = {
            r["doc_id"]: r["n"]
            for r in docs.select(
                "doc_id",
                F.size(F.split("text", " ", -1)).cast("long").alias("n"),
            ).collect()
        }
        assert rebuilt == truth

    def test_run_starts_partition_positions(self, spark):
        """Within a doc, runs tile [0, n_tokens): each run starts where
        the previous ended and run_idx follows run_start order."""
        docs = table(spark, SF, "documents").limit(20)
        rows = token_runs(docs).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for did, rs in by_doc.items():
            rs.sort(key=lambda r: r["run_idx"])
            pos = 0
            for r in rs:
                assert r["run_start"] == pos
                assert r["run_len"] >= 1
                pos += r["run_len"]


class TestNormalizeNfc:
    def test_composes_decomposed(self, spark):
        decomposed = "café Å"
        df = spark.createDataFrame(
            [(1, decomposed), (2, "plain ascii"), (3, None)],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["text_nfc"] for r in normalize_nfc(df).collect()
        }
        assert got[1] == unicodedata.normalize("NFC", decomposed)
        assert got[1] == "café Å"
        assert got[2] == "plain ascii"
        assert got[3] is None

    def test_idempotent_and_dedup_unifying(self, spark):
        """The operator's purpose: precomposed and decomposed spellings
        hash identically after NFC, so exact dedup catches the pair."""
        df = spark.createDataFrame(
            [(1, "café"), (2, "café")], "doc_id long, text string"
        )
        out = normalize_nfc(df)
        hashes = (
            out.select(F.sha2(F.encode("text_nfc", "UTF-8"), 256).alias("h"))
            .distinct()
            .count()
        )
        assert hashes == 1
        # idempotent: a second pass is a no-op
        twice = normalize_nfc(out.drop("text").withColumnRenamed("text_nfc", "text"))
        assert twice.filter(F.col("text") != F.col("text_nfc")).count() == 0


class TestGlobalRowNumber:
    def test_equals_window_form(self, spark):
        o = table(spark, SF, "orders").select("o_orderkey")
        got = {
            r["o_orderkey"]: r["row_no"]
            for r in global_row_number(o, "o_orderkey").collect()
        }
        keys = sorted(got)
        assert got == {k: i + 1 for i, k in enumerate(keys)}

    def test_contiguous_from_one(self, spark):
        df = spark.createDataFrame(
            [(v,) for v in (7, 3, 99, 12, 5)], "k long"
        )
        rows = global_row_number(df, "k", num_partitions=8).collect()
        assert sorted(r["row_no"] for r in rows) == [1, 2, 3, 4, 5]
        assert {r["k"]: r["row_no"] for r in rows} == {3: 1, 5: 2, 7: 3, 12: 4, 99: 5}

    def test_more_partitions_than_rows(self, spark):
        df = spark.createDataFrame([(1,), (2,)], "k long")
        rows = global_row_number(df, "k", num_partitions=16).collect()
        assert {r["k"]: r["row_no"] for r in rows} == {1: 1, 2: 2}

    def test_no_single_partition_window(self, spark):
        """The physical point: the plan must not contain a Window node
        (the ORDER-BY-everything frame that collapses to one task)."""
        o = table(spark, SF, "orders").select("o_orderkey")
        plan = global_row_number(o, "o_orderkey")._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
