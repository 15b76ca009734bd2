"""Round-9 additions: drift monitoring (operators/drift.py) and the
training-set label embargo (asof_join/get_training_set embargo_seconds).

Drift invariants:
  * a window compared against ITSELF reports zero drift (PSI == 0,
    TVD == 0) — the no-false-alarm floor;
  * psi_term and l1_term are non-negative by construction;
  * fractions per side sum to 1;
  * a hard category swap is detected (TVD == 1 for disjoint supports).

Embargo invariants (the leakage-guard contract):
  * embargo_seconds=0 is byte-identical to the plain as-of join;
  * embargo E equals shifting every spine timestamp back by E and
    joining with no embargo (the defining algebraic identity), EXCEPT
    for the reported as_of_timestamp, which must stay the ORIGINAL
    spine time;
  * a feature row inside the embargo window is never matched even
    though it temporally precedes the spine row.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ml_feature_store_spark.operators.asof import asof_join
from ml_feature_store_spark.operators.drift import (
    categorical_drift,
    psi_numeric,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


class TestDrift:
    def test_self_comparison_reports_zero_psi(self, spark):
        df = spark.range(0, 500).select(
            (F.col("id") % 37).cast("double").alias("v")
        )
        rep = psi_numeric(df, df, "v", n_bins=10).collect()
        assert rep, "self-comparison must still emit bins"
        for r in rep:
            assert r.ref_frac == r.cur_frac
            assert abs(r.psi_term) < 1e-12

    def test_psi_terms_nonnegative_and_fracs_sum_to_one(self, spark):
        ref = spark.range(0, 400).select(
            (F.col("id") % 19).cast("double").alias("v")
        )
        cur = spark.range(0, 300).select(
            ((F.col("id") * F.col("id")) % 23).cast("double").alias("v")
        )
        rep = psi_numeric(ref, cur, "v", n_bins=8).collect()
        assert all(r.psi_term >= 0 for r in rep)
        assert abs(sum(r.ref_frac for r in rep) - 1.0) < 1e-9
        assert abs(sum(r.cur_frac for r in rep) - 1.0) < 1e-9

    def test_current_outliers_clamp_into_edge_bins(self, spark):
        ref = spark.range(0, 100).select(F.col("id").cast("double").alias("v"))
        cur = spark.createDataFrame(
            [(-50.0,), (500.0,)], ["v"]
        )  # far outside the reference [0, 99] anchor
        rep = {r.bucket: r for r in psi_numeric(ref, cur, "v").collect()}
        assert rep[0].cur_frac == 0.5  # clamped low outlier
        assert rep[9].cur_frac == 0.5  # clamped high outlier

    def test_constant_reference_column_does_not_divide_by_zero(self, spark):
        ref = spark.createDataFrame([(5.0,)] * 4, ["v"])
        cur = spark.createDataFrame([(5.0,), (7.0,)], ["v"])
        rep = {r.bucket: r for r in psi_numeric(ref, cur, "v").collect()}
        assert list(rep) == [0]  # everything lands in bin 0
        assert rep[0].ref_frac == 1.0 and rep[0].cur_frac == 1.0

    def test_categorical_tvd_zero_on_self_one_on_disjoint(self, spark):
        a = spark.createDataFrame([("x",)] * 3 + [("y",)] * 7, ["c"])
        b = spark.createDataFrame([("z",)] * 4, ["c"])
        same = categorical_drift(a, a, "c").collect()
        assert sum(r.l1_term for r in same) / 2 == 0.0
        disjoint = categorical_drift(a, b, "c").collect()
        assert abs(sum(r.l1_term for r in disjoint) / 2 - 1.0) < 1e-12

    def test_null_categories_are_a_bucket(self, spark):
        a = spark.createDataFrame([("x",), (None,)], ["c"])
        b = spark.createDataFrame([("x",), ("x",)], ["c"])
        rep = {r.category: r for r in categorical_drift(a, b, "c").collect()}
        assert None in rep
        assert rep[None].ref_frac == 0.5 and rep[None].cur_frac == 0.0


@pytest.fixture
def asof_frames(spark):
    feats = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), 10.0, 1),
            (1, _ts("2024-01-02 18:00:00"), 20.0, 2),  # inside 24 h embargo
            (2, _ts("2024-01-03 00:00:00"), 30.0, 3),  # exactly at cutoff
        ],
        ["entity_id", "timestamp", "value", "__row_id__"],
    )
    spine = spark.createDataFrame(
        [(1, _ts("2024-01-03 00:00:00")), (2, _ts("2024-01-04 00:00:00"))],
        ["entity_id", "timestamp"],
    )
    return spine, feats


class TestEmbargo:
    def test_zero_embargo_is_plain_asof(self, asof_frames):
        spine, feats = asof_frames
        plain = asof_join(spine, feats).collect()
        zero = asof_join(spine, feats, embargo_seconds=0.0).collect()
        assert sorted(map(tuple, plain)) == sorted(map(tuple, zero))

    def test_embargo_excludes_recent_but_keeps_cutoff_inclusive(
        self, asof_frames
    ):
        spine, feats = asof_frames
        out = {
            r.entity_id: r
            for r in asof_join(spine, feats, embargo_seconds=24 * 3600).collect()
        }
        # entity 1: the 2024-01-02 18:00 row is within 24 h of the
        # 2024-01-03 spine -> embargoed; falls back to 2024-01-01
        assert out[1].value == 10.0
        # entity 2: feature at exactly spine - 24 h qualifies (inclusive)
        assert out[2].value == 30.0

    def test_embargo_equals_shifted_spine(self, spark, asof_frames):
        spine, feats = asof_frames
        emb = asof_join(
            spine, feats, embargo_seconds=3600.0, keep_spine_ts=True
        )
        shifted = asof_join(
            spine.withColumn(
                "timestamp",
                F.col("timestamp") - F.expr("INTERVAL 3600 SECONDS"),
            ),
            feats,
            keep_spine_ts=True,
        )
        got = sorted(
            (r.entity_id, r.timestamp, r.value) for r in emb.collect()
        )
        want = sorted(
            (r.entity_id, r.timestamp, r.value) for r in shifted.collect()
        )
        assert got == want
        # ...but as_of_timestamp reports the ORIGINAL spine time
        spine_ts = {r.entity_id: r.timestamp for r in spine.collect()}
        for r in emb.collect():
            assert r.as_of_timestamp == spine_ts[r.entity_id]

    def test_embargo_composes_with_tolerance(self, spark):
        feats = spark.createDataFrame(
            [
                (1, _ts("2024-01-01 00:00:00"), 1.0, 1),
                (1, _ts("2024-01-05 00:00:00"), 2.0, 2),
            ],
            ["entity_id", "timestamp", "value", "__row_id__"],
        )
        spine = spark.createDataFrame(
            [(1, _ts("2024-01-06 00:00:00"))], ["entity_id", "timestamp"]
        )
        # embargo 2 d: cutoff 2024-01-04 -> match is 01-01; tolerance 1 d
        # from the embargoed cutoff excludes it -> inner join drops the row
        out = asof_join(
            spine,
            feats,
            embargo_seconds=2 * 24 * 3600,
            tolerance_seconds=24 * 3600,
        ).collect()
        assert out == []

    def test_store_api_validation(self, spark, store, feature_df):
        from ml_feature_store_spark import FeatureValidationError

        store.register("t", feature_df)
        spine = spark.createDataFrame(
            [("user_1", _ts("2024-02-10"))], ["entity_id", "timestamp"]
        )
        with pytest.raises(FeatureValidationError):
            store.get_training_set("t", spine, embargo_seconds=-1.0)
        with pytest.raises(FeatureValidationError):
            store.get_training_set(
                "t", spine, direction="nearest", embargo_seconds=10.0
            )
        out = store.get_training_set(
            "t", spine, embargo_seconds=20 * 24 * 3600
        ).collect()
        # 2024-02-10 minus 20 d = 2024-01-21 -> latest qualifying row for
        # user_1 is 2024-01-15 (the 2024-02-01 row is embargoed)
        assert len(out) == 1 and out[0].feature_a == 2.0


class TestWoeIv:
    """fe9's operator: WOE/IV over a categorical feature vs a binary label."""

    def test_label_independent_feature_has_zero_woe(self, spark):
        from ml_feature_store_spark.operators.drift import woe_iv

        # every category carries the same pos/neg ratio -> pos_frac ==
        # neg_frac per category -> woe == ln(1) == 0 and iv == 0
        df = spark.range(0, 400).select(
            ((F.col("id") / 2).cast("long") % 4).cast("string").alias("cat"),
            (F.col("id") % 2 == 0).alias("y"),
        )
        rep = woe_iv(df, "cat", "y").collect()
        assert len(rep) == 4
        for r in rep:
            assert r.n_pos == 50 and r.n_neg == 50
            assert abs(r.pos_frac - 0.25) < 1e-12
            assert abs(r.woe) < 1e-9 and abs(r.iv_term) < 1e-9

    def test_perfectly_separating_feature(self, spark):
        from ml_feature_store_spark.operators.drift import woe_iv

        # cat 'a' is all-positive, 'b' all-negative: woe('a') large
        # positive, woe('b') large negative, both iv terms positive
        df = spark.createDataFrame(
            [("a", True)] * 10 + [("b", False)] * 10, "cat string, y boolean"
        )
        rows = {r.category: r for r in woe_iv(df, "cat", "y").collect()}
        assert rows["a"].woe > 5 and rows["b"].woe < -5
        assert rows["a"].iv_term > 0 and rows["b"].iv_term > 0
        assert rows["a"].n_pos == 10 and rows["a"].n_neg == 0

    def test_degenerate_label_distribution_refuses(self, spark):
        from ml_feature_store_spark.operators.drift import woe_iv

        # all-one-class labels make every fraction 0/0 — the report must
        # FAIL with a clear message, not silently emit NaN (round-9
        # ADVICE). The guard is lazy (assert_true in the plan), so the
        # error surfaces at the action.
        all_pos = spark.createDataFrame(
            [("a", True), ("b", True)], "cat string, y boolean"
        )
        with pytest.raises(Exception, match="degenerate label"):
            woe_iv(all_pos, "cat", "y").collect()
        all_neg = spark.createDataFrame(
            [("a", False), ("b", False)], "cat string, y boolean"
        )
        with pytest.raises(Exception, match="degenerate label"):
            woe_iv(all_neg, "cat", "y").collect()

    def test_null_category_is_explicit_bucket(self, spark):
        from ml_feature_store_spark.operators.drift import woe_iv

        df = spark.createDataFrame(
            [(None, True), (None, False), ("a", True), ("a", False)],
            "cat string, y boolean",
        )
        rep = woe_iv(df, "cat", "y").collect()
        cats = {r.category for r in rep}
        assert None in cats and len(rep) == 2

    def test_fractions_sum_to_one_per_class(self, spark):
        from ml_feature_store_spark.operators.drift import woe_iv

        df = spark.range(0, 300).select(
            (F.col("id") % 7).cast("string").alias("cat"),
            (F.col("id") % 3 == 0).alias("y"),
        )
        rep = woe_iv(df, "cat", "y").collect()
        assert abs(sum(r.pos_frac for r in rep) - 1.0) < 1e-9
        assert abs(sum(r.neg_frac for r in rep) - 1.0) < 1e-9
