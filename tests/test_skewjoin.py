"""salted_join: exact equivalence to the plain join (the whole point),
null-lane behavior for left joins, and guardrails."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ml_feature_store_spark.operators.skew import salted_join


def _skewed(spark):
    # hot key: 80 of 100 fact rows on one user
    rows = [(i, "hot" if i < 80 else f"u{i}", float(i)) for i in range(100)]
    fact = spark.createDataFrame(rows, ["event_id", "user_id", "v"])
    dim = spark.createDataFrame(
        [("hot", 1), ("u85", 2), ("ghost", 3)], ["user_id", "grp"]
    )
    return fact, dim


class TestSaltedJoin:
    def test_inner_equals_plain_join(self, spark):
        fact, dim = _skewed(spark)
        got = salted_join(fact, dim, "user_id", salt_by="event_id").collect()
        want = fact.join(dim, "user_id").collect()
        key = lambda r: (r.user_id, r.event_id)
        assert sorted(got, key=key) == sorted(want, key=key)

    def test_left_keeps_unmatched_fact_rows_once(self, spark):
        fact, dim = _skewed(spark)
        out = salted_join(fact, dim, "user_id", salt_by="event_id", how="left")
        assert out.count() == 100
        assert out.filter(F.col("grp").isNull()).count() == 19  # u80..u99 minus u85

    def test_salt_spreads_the_hot_key(self, spark):
        fact, dim = _skewed(spark)
        from ml_feature_store_spark.operators.sampling import hash_uniform

        salts = (
            fact.filter(F.col("user_id") == "hot")
            .select((hash_uniform("event_id") % 16).alias("s"))
            .distinct()
            .count()
        )
        assert salts >= 8  # 80 md5 draws land in most of 16 buckets

    def test_null_salt_by_rows_still_join(self, spark):
        # A NULL salt_by value must not drop the row: it hashes to NULL,
        # which as a join-key component would never match any dim salt.
        fact = spark.createDataFrame(
            [(1, "hot", 1.0), (None, "hot", 2.0), (None, "u85", 3.0),
             (None, "nokey", 4.0)],
            "event_id long, user_id string, v double",
        )
        dim = spark.createDataFrame(
            [("hot", 1), ("u85", 2)], ["user_id", "grp"]
        )
        for how in ("inner", "left"):
            got = salted_join(fact, dim, "user_id", salt_by="event_id", how=how)
            want = fact.join(dim, "user_id", how)
            key = lambda r: (r.user_id, r.v)
            assert sorted(got.collect(), key=key) == sorted(
                want.collect(), key=key
            )

    def test_rejects_right_full_and_tiny_salts(self, spark):
        fact, dim = _skewed(spark)
        with pytest.raises(ValueError):
            salted_join(fact, dim, "user_id", salt_by="event_id", how="full")
        with pytest.raises(ValueError):
            salted_join(fact, dim, "user_id", salt_by="event_id", n_salts=1)
