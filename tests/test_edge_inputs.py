"""Edge-input hardening: operators must behave sanely on empty or
degenerate inputs (the 3am-backfill cases)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def d(day: int) -> dt.datetime:
    return dt.datetime(2024, 1, day)


class TestEmptyInputs:
    def test_asof_join_empty_features(self, spark):
        from ml_feature_store_spark.operators.asof import asof_join

        feats = spark.createDataFrame(
            [], "entity_id string, timestamp timestamp, x double, __row_id__ long"
        )
        spine = spark.createDataFrame([("a", d(5))], ["entity_id", "timestamp"])
        for strategy in ("union", "join", "union_bucketed"):
            assert asof_join(spine, feats, strategy=strategy).count() == 0
            left = asof_join(spine, feats, strategy=strategy, how="left").collect()
            assert len(left) == 1 and left[0]["x"] is None

    def test_asof_join_empty_spine(self, spark):
        from ml_feature_store_spark.operators.asof import asof_join

        feats = spark.createDataFrame(
            [("a", d(1), 1.0, 1)], ["entity_id", "timestamp", "x", "__row_id__"]
        )
        spine = spark.createDataFrame([], "entity_id string, timestamp timestamp")
        assert asof_join(spine, feats).count() == 0

    def test_minhash_lsh_empty_corpus(self, spark):
        from ml_feature_store_spark.operators.dedup import dedup_minhash_lsh

        docs = spark.createDataFrame([], "doc_id long, text string")
        assert dedup_minhash_lsh(docs).count() == 0

    def test_connected_components_empty_edges(self, spark):
        from ml_feature_store_spark.operators.dedup import connected_components

        edges = spark.createDataFrame([], "id_a long, id_b long")
        assert connected_components(edges).count() == 0

    def test_pagerank_empty_edges(self, spark):
        from ml_feature_store_spark.operators.graph import pagerank

        edges = spark.createDataFrame([], "src string, dst string")
        assert pagerank(edges, iterations=2).count() == 0

    def test_contamination_empty_benchmark(self, spark):
        from ml_feature_store_spark.operators.dedup import detect_contamination

        corpus = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
        bench = spark.createDataFrame([], "doc_id long, text string")
        assert detect_contamination(corpus, bench).count() == 0

    def test_kmeans_k_larger_than_input(self, spark):
        from ml_feature_store_spark.operators.clustering import kmeans_quantized

        df = spark.createDataFrame(
            [(0, [1.0, 2.0]), (1, [3.0, 4.0])], ["vec_id", "embedding"]
        )
        assigned, cent = kmeans_quantized(df, k=2, max_iter=1)
        assert assigned.count() == 2 and len(cent) == 2

    def test_sessionize_single_event_per_user(self, spark):
        from ml_feature_store_spark.operators.sessionize import sessionize

        ev = spark.createDataFrame([(1, d(1), 0.5)], ["user_id", "ts", "value"])
        out = sessionize(ev, entity_col="user_id", ts_col="ts").collect()
        assert len(out) == 1


class TestRound3EdgeInputs:
    def test_triangle_count_empty_edges(self, spark):
        from ml_feature_store_spark.operators.graph import triangle_count

        e = spark.createDataFrame([], "src long, dst long")
        (row,) = triangle_count(e).collect()
        assert (row.n_edges, row.n_triangles) == (0, 0)

    def test_target_encode_empty_input(self, spark):
        from ml_feature_store_spark.operators.encoding import target_encode_loo

        df = spark.createDataFrame([], "cat string, y double")
        assert target_encode_loo(df, "cat", "y").collect() == []

    def test_ngram_counts_empty_corpus(self, spark):
        from ml_feature_store_spark.operators.text import ngram_counts

        df = spark.createDataFrame([], "text string")
        assert ngram_counts(df, "text", n=2).collect() == []

    def test_ngram_counts_null_text(self, spark):
        from ml_feature_store_spark.operators.text import ngram_counts

        df = spark.createDataFrame([(None,), ("a b",)], "text string")
        out = {r.gram: r.cnt for r in ngram_counts(df, "text", n=2).collect()}
        assert out == {"a b": 1}  # null doc contributes nothing, no crash

    def test_bpe_train_no_qualifying_pairs(self, spark):
        from ml_feature_store_spark.operators.text import bpe_train_merges

        # every adjacency is an equal pair (x == y excluded) -> no rules
        df = spark.createDataFrame([("a a a",), ("b b",)], ["text"])
        assert bpe_train_merges(df, "text", rounds=3) == []

    def test_feature_hash_empty_cols_rejected_or_zero(self, spark):
        from ml_feature_store_spark.operators.encoding import feature_hash
        import pytest as _pytest

        df = spark.createDataFrame([("x",)], ["a"])
        with _pytest.raises(Exception):
            feature_hash(df, [], n_buckets=4).collect()
