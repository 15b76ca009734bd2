"""Deterministic split/sample operators: the properties a training
pipeline depends on — reproducibility, partition-invariance, entity
consistency, per-stratum rates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ml_feature_store_spark.operators.sampling import (
    hash_uniform,
    stratified_sample,
    threshold,
    with_kfold,
    with_split,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    from ml_feature_store_spark.suite import table

    return table(spark, SF, "documents").cache()


class TestHashSplit:
    def test_partition_invariance(self, spark, docs):
        """The whole point vs rand(): assignments survive a repartition."""
        a = with_split(docs, "doc_id").select("doc_id", "split")
        b = with_split(docs.repartition(13), "doc_id").select("doc_id", "split")
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()

    def test_split_exhaustive_and_disjoint(self, spark, docs):
        tagged = with_split(docs, "doc_id", 0.8)
        n = docs.count()
        by = dict(tagged.groupBy("split").count().collect() and
                  [(r["split"], r["count"]) for r in tagged.groupBy("split").count().collect()])
        assert set(by) <= {"train", "test"}
        assert sum(by.values()) == n

    def test_ratio_near_target(self, spark, docs):
        tagged = with_split(docs, "doc_id", 0.8)
        n = docs.count()
        n_train = tagged.filter(F.col("split") == "train").count()
        assert abs(n_train / n - 0.8) < 0.1  # 500 docs -> ~4.5 sigma slack

    def test_entity_grouping_prevents_leakage(self, spark):
        """Hashing the GROUP key puts every row of an entity on one side."""
        from ml_feature_store_spark.suite import table

        ev = table(spark, SF, "events")
        tagged = with_split(ev, "user_id", 0.7)
        sides_per_user = tagged.groupBy("user_id").agg(
            F.countDistinct("split").alias("k")
        )
        assert sides_per_user.filter(F.col("k") > 1).isEmpty()


class TestKFold:
    def test_folds_partition_the_data(self, spark, docs):
        t = with_kfold(docs, "doc_id", 5)
        assert t.filter((F.col("fold") < 0) | (F.col("fold") >= 5)).isEmpty()
        assert t.select("fold").distinct().count() == 5
        assert t.count() == docs.count()

    def test_fold_vs_split_independent_keys_consistent(self, spark, docs):
        """fold is a pure function of the key: joining two independently
        computed taggings agrees row-for-row."""
        t1 = with_kfold(docs, "doc_id", 7).select("doc_id", "fold")
        t2 = with_kfold(docs.orderBy(F.rand(1)), "doc_id", 7).select(
            "doc_id", F.col("fold").alias("fold2")
        )
        j = t1.join(t2, "doc_id")
        assert j.filter(F.col("fold") != F.col("fold2")).isEmpty()

    def test_k_validation(self, spark, docs):
        with pytest.raises(ValueError):
            with_kfold(docs, "doc_id", 1)


class TestStratified:
    def test_rates_per_stratum(self, spark, docs):
        out = stratified_sample(docs, "lang", "doc_id", {"en": 0.3}, default_frac=1.0)
        n_en = docs.filter(F.col("lang") == "en").count()
        k_en = out.filter(F.col("lang") == "en").count()
        assert abs(k_en / n_en - 0.3) < 0.15
        # non-en strata fully retained
        others = docs.filter(F.col("lang") != "en").count()
        assert out.filter(F.col("lang") != "en").count() == others

    def test_sample_is_subset_and_deterministic(self, spark, docs):
        a = stratified_sample(docs, "lang", "doc_id", {"en": 0.5}, 0.2)
        b = stratified_sample(docs, "lang", "doc_id", {"en": 0.5}, 0.2)
        assert a.exceptAll(docs).isEmpty()
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()

    def test_fraction_validation(self):
        with pytest.raises(ValueError):
            threshold(1.5)


class TestPlanShape:
    def test_map_only_no_shuffle(self, spark, docs):
        """Split + fold tagging must add zero exchanges — it's a projection."""
        from ml_feature_store_spark.plans import shuffle_count

        t = with_kfold(with_split(docs, "doc_id"), "doc_id", 5)
        assert shuffle_count(t) == 0

    def test_hash_stays_in_codegen(self, spark, docs):
        from ml_feature_store_spark.plans import codegen_span_count, executed_plan

        t = docs.select(hash_uniform("doc_id").alias("u"))
        plan = executed_plan(t)
        assert codegen_span_count(t) >= 1
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestWalkForwardFolds:
    """cv1: purged walk-forward CV (operators/sampling.py)."""

    @staticmethod
    def _df(spark):
        import datetime as dt

        rows = [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=6 * i))
            for i in range(80)
        ]
        return spark.createDataFrame(rows, ["id", "ts"])

    def test_purge_gap_excludes_boundary_rows(self, spark):
        import datetime as dt

        from ml_feature_store_spark.operators.sampling import (
            walk_forward_folds,
        )

        out = walk_forward_folds(
            self._df(spark), "ts", ["2024-01-05"], 86400.0, 2 * 86400.0
        ).collect()
        cut = dt.datetime(2024, 1, 5)
        for r in out:
            if r.split == "train":
                assert r.ts <= cut
            else:
                # the purge day (cut, cut+1d] holds NO test rows
                assert r.ts > cut + dt.timedelta(days=1)
                assert r.ts <= cut + dt.timedelta(days=3)

    def test_folds_are_independent_and_disjoint_per_fold(self, spark):
        from ml_feature_store_spark.operators.sampling import (
            walk_forward_folds,
        )

        out = walk_forward_folds(
            self._df(spark),
            "ts",
            ["2024-01-05", "2024-01-10"],
            86400.0,
            2 * 86400.0,
        )
        per = (
            out.groupBy("fold", "id")
            .count()
            .filter("count > 1")
            .count()
        )
        assert per == 0  # a row is train OR test within one fold, never both
        assert out.select("fold").distinct().count() == 2

    def test_later_fold_trains_on_more_rows(self, spark):
        from ml_feature_store_spark.operators.sampling import (
            walk_forward_folds,
        )

        out = walk_forward_folds(
            self._df(spark),
            "ts",
            ["2024-01-05", "2024-01-10"],
            86400.0,
            2 * 86400.0,
        )
        n = {
            (r.fold, r.split): r["count"]
            for r in out.groupBy("fold", "split").count().collect()
        }
        assert n[(1, "train")] > n[(0, "train")]  # walk-forward grows train

    def test_refuses_negative_gap_and_nonpositive_test_window(self, spark):
        from ml_feature_store_spark.operators.sampling import (
            walk_forward_folds,
        )

        df = self._df(spark)
        # a negative gap would silently reintroduce the train/test
        # overlap the purge exists to prevent (round-9 ADVICE)
        with pytest.raises(ValueError, match="gap_seconds"):
            walk_forward_folds(df, "ts", ["2024-01-05"], -1.0, 86400.0)
        with pytest.raises(ValueError, match="test_seconds"):
            walk_forward_folds(df, "ts", ["2024-01-05"], 0.0, 0.0)

    def test_scientific_notation_floats_build_valid_intervals(self, spark):
        from ml_feature_store_spark.operators.sampling import (
            walk_forward_folds,
        )

        # Python formats 1e-05 in scientific notation, which an f-string
        # INTERVAL literal can't parse; make_dt_interval arithmetic can
        # (round-9 ADVICE). Sub-second gap ~= no purge on daily data.
        out = walk_forward_folds(
            self._df(spark), "ts", ["2024-01-05"], 1e-05, 2 * 86400.0
        )
        assert out.filter("split = 'test'").count() > 0
