"""Round-10 operator semantics: k-anonymity (privacy.py) and CUSUM
changepoint localization (drift.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ml_feature_store_spark.operators.drift import cusum_changepoint
from ml_feature_store_spark.operators.privacy import (
    k_anonymity_report,
    k_anonymity_summary,
)


class TestKAnonymity:
    def _df(self, spark):
        # QI (age_band, zip): one group of 4 (risky at k=5), one of 6
        rows = [("30s", "100", i) for i in range(4)] + [
            ("40s", "200", i) for i in range(6)
        ]
        return spark.createDataFrame(rows, "age_band string, zip string, id long")

    def test_group_sizes_and_risk_flags(self, spark):
        rep = {
            (r.age_band, r.zip): (r.n, r.at_risk)
            for r in k_anonymity_report(
                self._df(spark), ["age_band", "zip"], k=5
            ).collect()
        }
        assert rep == {("30s", "100"): (4, True), ("40s", "200"): (6, False)}

    def test_summary_counts_and_ppm_are_integer_exact(self, spark):
        out = k_anonymity_summary(
            self._df(spark), ["age_band", "zip"], k=5
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.n_groups, r.n_risky_groups, r.n_rows, r.n_risky_rows) == (
            2, 1, 10, 4,
        )
        assert r.suppression_ppm == 400_000  # floor(4 * 1e6 / 10)

    def test_null_qi_is_its_own_bucket(self, spark):
        df = spark.createDataFrame(
            [(None, 1), (None, 2), ("a", 3)], "qi string, id long"
        )
        rep = {r.qi: r.n for r in k_anonymity_report(df, ["qi"], k=2).collect()}
        assert rep == {None: 2, "a": 1}

    def test_refusals(self, spark):
        df = self._df(spark)
        with pytest.raises(ValueError, match="qi_cols"):
            k_anonymity_report(df, [], k=5)
        with pytest.raises(ValueError, match="k must be"):
            k_anonymity_report(df, ["zip"], k=1)
        with pytest.raises(ValueError, match="must be one of qi_cols"):
            k_anonymity_summary(df, ["zip"], k=5, by="id")


class TestCusumChangepoint:
    def test_step_shift_is_localized_at_the_step(self, spark):
        # 10 steps at value 100, then 10 at 200: |n*S| peaks at step 9
        # (the last pre-shift point), sign negative (series BELOW the
        # global mean before the upward shift)
        rows = [("a", t, 100 if t < 10 else 200) for t in range(20)]
        df = spark.createDataFrame(rows, "g string, t long, v long")
        r = cusum_changepoint(df, "g", "t", "v").collect()[0]
        assert r.changepoint_step == 9
        assert r.shift_sign == -1
        assert r.n_steps == 20
        # exact integer peak: n*S_9 = 20*1000 - 10*3000 = -10000
        assert r.peak_ns_abs == 10_000

    def test_downward_shift_flips_the_sign(self, spark):
        rows = [("a", t, 200 if t < 10 else 100) for t in range(20)]
        df = spark.createDataFrame(rows, "g string, t long, v long")
        r = cusum_changepoint(df, "g", "t", "v").collect()[0]
        assert r.changepoint_step == 9 and r.shift_sign == 1

    def test_flat_series_peak_zero_and_earliest_tiebreak(self, spark):
        rows = [("a", t, 5) for t in range(8)]
        df = spark.createDataFrame(rows, "g string, t long, v long")
        r = cusum_changepoint(df, "g", "t", "v").collect()[0]
        # every n*S_t is 0 -> ties broken to the EARLIEST step
        assert r.peak_ns_abs == 0 and r.changepoint_step == 0
        assert r.shift_sign == 0

    def test_float_values_refused(self, spark):
        # float input makes the argmax ulp-dependent — the exactness
        # contract demands an integer series (quantize upstream)
        df = spark.createDataFrame(
            [("a", 0, 1.5), ("a", 1, 2.5)], "g string, t long, v double"
        )
        with pytest.raises(ValueError, match="integer type"):
            cusum_changepoint(df, "g", "t", "v")

    def test_groups_are_independent(self, spark):
        rows = [("a", t, 100 if t < 5 else 300) for t in range(10)] + [
            ("b", t, 300 if t < 2 else 100) for t in range(10)
        ]
        df = spark.createDataFrame(rows, "g string, t long, v long")
        out = {r.g: r for r in cusum_changepoint(df, "g", "t", "v").collect()}
        assert out["a"].changepoint_step == 4 and out["a"].shift_sign == -1
        assert out["b"].changepoint_step == 1 and out["b"].shift_sign == 1
