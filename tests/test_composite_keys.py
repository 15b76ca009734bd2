"""Composite entity keys (round-7 verdict item 5): views keyed on an
entity TUPLE (user x merchant, user x category — the Feast multi-entity
contract) flowing through register / get / as-of / online / merge.

Design under test (store.py "composite entity keys" section): the key is
stored as ONE struct-typed entity_id whose field names are the registered
entity_cols, so every scalar-key operator works untouched on struct
equality and the key is self-describing from the stored schema; outputs
expand the struct back to natural columns.

The reference hard-codes a single entity_id (reference
src/ml_feature_store/store.py:22-24); this section generalizes its
semantics — inclusive cutoff, first-input-row tie-break, matched-feature
timestamp in training sets — to the tuple key.
"""
from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ml_feature_store_spark import (
    FeatureStore,
    FeatureTableNotFoundError,
    FeatureValidationError,
)


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture
def cdf(spark):
    """user x merchant spend history, with a duplicate-timestamp pair to
    pin the tie-break and interleaved rows across both key columns."""
    rows = [
        ("u1", "m1", ts("2024-01-01"), 10.0),
        ("u1", "m1", ts("2024-01-05"), 11.0),
        ("u1", "m2", ts("2024-01-03"), 20.0),
        ("u2", "m1", ts("2024-01-02"), 30.0),
        ("u2", "m1", ts("2024-01-02"), 31.0),  # same key+ts: first wins
        ("u2", "m2", ts("2024-01-08"), 40.0),
    ]
    return spark.createDataFrame(
        rows, ["user_id", "merchant_id", "timestamp", "spend"]
    )


@pytest.fixture
def cstore(spark, cdf):
    fs = FeatureStore(spark)
    fs.register("spend", cdf, entity_cols=["user_id", "merchant_id"])
    return fs


class TestRegisterAndCatalog:
    def test_info_reports_key_and_features(self, cstore):
        info = cstore.get_table_info("spend")
        assert info.entity_columns == ("user_id", "merchant_id")
        assert info.columns == ("spend",)
        assert info.version == 1 and info.row_count == 6

    def test_scalar_table_info_unchanged(self, spark):
        fs = FeatureStore(spark)
        df = spark.createDataFrame(
            [("e1", ts("2024-01-01"), 1.0)], ["entity_id", "timestamp", "v"]
        )
        fs.register("t", df)
        assert fs.get_table_info("t").entity_columns == ("entity_id",)

    def test_key_survives_store_reload(self, spark, cdf, tmp_path):
        """Self-describing key: a NEW store instance over the same storage
        rediscovers entity_cols from the parquet schema."""
        p = str(tmp_path / "store")
        fs = FeatureStore(spark, storage_path=p)
        fs.register("spend", cdf, entity_cols=["user_id", "merchant_id"])
        fs2 = FeatureStore(spark, storage_path=p)
        assert fs2.get_table_info("spend").entity_columns == (
            "user_id",
            "merchant_id",
        )
        got = fs2.get("spend", [("u1", "m2")], ts("2024-01-31")).collect()
        assert len(got) == 1 and got[0]["spend"] == 20.0

    def test_bad_specs_raise(self, spark, cdf):
        fs = FeatureStore(spark)
        with pytest.raises(FeatureValidationError, match="non-empty"):
            fs.register("t", cdf, entity_cols=[])
        with pytest.raises(FeatureValidationError, match="duplicate"):
            fs.register("t", cdf, entity_cols=["user_id", "user_id"])
        with pytest.raises(FeatureValidationError, match="reserved"):
            fs.register("t", cdf, entity_cols=["user_id", "timestamp"])
        with pytest.raises(FeatureValidationError, match="missing from"):
            fs.register("t", cdf, entity_cols=["user_id", "nope"])
        with_eid = cdf.withColumn("entity_id", F.lit("x"))
        with pytest.raises(FeatureValidationError, match="already has"):
            fs.register("t", with_eid, entity_cols=["user_id", "merchant_id"])


class TestPitGet:
    def test_get_tuple_ids_inclusive_cutoff(self, cstore):
        got = {
            (r["user_id"], r["merchant_id"]): r
            for r in cstore.get(
                "spend",
                [("u1", "m1"), ("u1", "m2"), ("u2", "m2")],
                ts("2024-01-05"),
            ).collect()
        }
        # inclusive <=: u1/m1 gets the 01-05 row; u2/m2 has nothing yet
        assert got[("u1", "m1")]["spend"] == 11.0
        assert got[("u1", "m2")]["spend"] == 20.0
        assert ("u2", "m2") not in got

    def test_output_columns_are_natural(self, cstore):
        out = cstore.get("spend", [("u1", "m1")], ts("2024-01-31"))
        assert out.columns == ["user_id", "merchant_id", "timestamp", "spend"]

    def test_dict_ids(self, cstore):
        got = cstore.get(
            "spend",
            [{"merchant_id": "m1", "user_id": "u2"}],
            ts("2024-01-31"),
        ).collect()
        assert len(got) == 1 and got[0]["user_id"] == "u2"

    def test_tiebreak_first_input_row_wins(self, cstore):
        got = cstore.get("spend", [("u2", "m1")], ts("2024-01-02")).collect()
        assert len(got) == 1 and got[0]["spend"] == 30.0

    def test_partial_key_never_matches(self, cstore):
        """A tuple key is the WHOLE key: (u1, m-unknown) matches nothing
        even though u1 exists under other merchants."""
        assert (
            cstore.get("spend", [("u1", "m9")], ts("2024-01-31")).count() == 0
        )

    def test_dataframe_ids(self, spark, cstore):
        """Large id sets pass as a DataFrame of natural key columns — no
        driver round-trip; extra columns are ignored."""
        ids = spark.createDataFrame(
            [("u1", "m1", 1), ("u2", "m2", 2)],
            ["user_id", "merchant_id", "junk"],
        )
        got = {
            (r["user_id"], r["merchant_id"]): r["spend"]
            for r in cstore.get("spend", ids, ts("2024-01-31")).collect()
        }
        assert got == {("u1", "m1"): 11.0, ("u2", "m2"): 40.0}
        with pytest.raises(FeatureValidationError, match="missing key"):
            cstore.get(
                "spend",
                spark.createDataFrame([("u1",)], ["user_id"]),
                ts("2024-01-31"),
            )

    def test_empty_ids_empty_result(self, cstore):
        """Scalar parity: an empty id list filters to an empty result
        (isin([]) semantics), it does not crash schema inference."""
        out = cstore.get("spend", [], ts("2024-01-31"))
        assert out.count() == 0
        assert out.columns == ["user_id", "merchant_id", "timestamp", "spend"]

    def test_nearest_direction_tuple_key(self, spark, cstore):
        """direction='nearest' partitions its windows on the struct key:
        (u1, m2)'s only row is 01-03 — nearest to an 01-04 spine point
        within tolerance; (u1, m1) at 01-04 prefers 01-05 (1 day) over
        01-01 (3 days)."""
        spine = spark.createDataFrame(
            [
                ("u1", "m1", ts("2024-01-04")),
                ("u1", "m2", ts("2024-01-04")),
            ],
            ["user_id", "merchant_id", "timestamp"],
        )
        got = {
            (r["user_id"], r["merchant_id"]): r["spend"]
            for r in cstore.get_training_set(
                "spend", spine, direction="nearest",
                tolerance_seconds=5 * 86400,
            ).collect()
        }
        assert got == {("u1", "m1"): 11.0, ("u1", "m2"): 20.0}

    def test_bad_ids_raise(self, cstore):
        with pytest.raises(FeatureValidationError, match="tuples/dicts"):
            cstore.get("spend", ["u1"], ts("2024-01-31"))
        with pytest.raises(FeatureValidationError, match="needs 2"):
            cstore.get("spend", [("u1",)], ts("2024-01-31"))
        with pytest.raises(FeatureValidationError, match="missing key"):
            cstore.get("spend", [{"user_id": "u1"}], ts("2024-01-31"))

    def test_projection(self, cstore):
        out = cstore.get(
            "spend", [("u1", "m1")], ts("2024-01-31"), columns=["spend"]
        )
        assert out.columns == ["user_id", "merchant_id", "timestamp", "spend"]
        with pytest.raises(FeatureValidationError, match="Unknown feature"):
            cstore.get(
                "spend", [("u1", "m1")], ts("2024-01-31"), columns=["user_id"]
            )


class TestTrainingSet:
    def test_asof_join_natural_spine(self, spark, cstore):
        spine = spark.createDataFrame(
            [
                ("u1", "m1", ts("2024-01-04")),
                ("u1", "m2", ts("2024-01-04")),
                ("u2", "m1", ts("2024-01-01")),  # before history: no match
            ],
            ["user_id", "merchant_id", "timestamp"],
        )
        out = cstore.get_training_set("spend", spine)
        assert out.columns == ["user_id", "merchant_id", "timestamp", "spend"]
        got = {
            (r["user_id"], r["merchant_id"]): r for r in out.collect()
        }
        # matched FEATURE row's timestamp is carried (reference contract)
        assert got[("u1", "m1")]["spend"] == 10.0
        assert got[("u1", "m1")]["timestamp"] == ts("2024-01-01")
        assert got[("u1", "m2")]["spend"] == 20.0
        assert ("u2", "m1") not in got

    def test_left_keeps_unmatched(self, spark, cstore):
        spine = spark.createDataFrame(
            [("u2", "m1", ts("2024-01-01"))],
            ["user_id", "merchant_id", "timestamp"],
        )
        out = cstore.get_training_set("spend", spine, how="left").collect()
        assert len(out) == 1 and out[0]["spend"] is None

    def test_skew_strategy_union_bucketed(self, spark, cstore):
        """The hot-key path: strategy='union_bucketed' keys its windows
        on (entity, time-bucket) — with a struct entity the bucketing
        and carry-in must produce the SAME rows as plain union (the
        SKEW.md scalar equivalence, pinned for tuple keys)."""
        spine = spark.createDataFrame(
            [
                ("u1", "m1", ts("2024-01-04")),
                ("u1", "m1", ts("2024-01-06")),
                ("u2", "m2", ts("2024-01-09")),
            ],
            ["user_id", "merchant_id", "timestamp"],
        )
        plain = sorted(
            cstore.get_training_set("spend", spine, strategy="union").collect()
        )
        bucketed = sorted(
            cstore.get_training_set(
                "spend", spine, strategy="union_bucketed", bucket_seconds=86400
            ).collect()
        )
        assert plain == bucketed and len(plain) == 3

    def test_multi_view_composite(self, spark, cstore, cdf):
        clicks = cdf.selectExpr(
            "user_id", "merchant_id", "timestamp", "spend * 0 + 1 AS clicks"
        )
        cstore.register(
            "clicks", clicks, entity_cols=["user_id", "merchant_id"]
        )
        spine = spark.createDataFrame(
            [("u1", "m1", ts("2024-01-06"))],
            ["user_id", "merchant_id", "timestamp"],
        )
        out = cstore.get_multi_view_training_set(["spend", "clicks"], spine)
        row = out.collect()[0]
        assert row["user_id"] == "u1" and row["merchant_id"] == "m1"
        assert row["spend__spend"] == 11.0 and row["clicks__clicks"] == 1.0

    def test_multi_view_mixed_keys_raise(self, spark, cstore):
        scalar = spark.createDataFrame(
            [("e", ts("2024-01-01"), 1.0)], ["entity_id", "timestamp", "v"]
        )
        cstore.register("scalar_view", scalar)
        spine = spark.createDataFrame(
            [("u1", "m1", ts("2024-01-06"))],
            ["user_id", "merchant_id", "timestamp"],
        )
        with pytest.raises(FeatureValidationError, match="same entity key"):
            cstore.get_multi_view_training_set(
                ["spend", "scalar_view"], spine
            )


class TestMutationsAndServing:
    def test_append_natural_columns(self, spark, cstore):
        extra = spark.createDataFrame(
            [("u3", "m1", ts("2024-01-09"), 50.0)],
            ["user_id", "merchant_id", "timestamp", "spend"],
        )
        info = cstore.append("spend", extra)
        assert info.version == 2 and info.row_count == 7
        got = cstore.get("spend", [("u3", "m1")], ts("2024-01-31")).collect()
        assert got[0]["spend"] == 50.0

    def test_upsert_replaces_exact_key(self, spark, cstore):
        patch = spark.createDataFrame(
            [("u1", "m2", ts("2024-01-03"), 21.5)],
            ["user_id", "merchant_id", "timestamp", "spend"],
        )
        cstore.upsert("spend", patch)
        got = cstore.get("spend", [("u1", "m2")], ts("2024-01-31")).collect()
        assert got[0]["spend"] == 21.5
        # pre-patch version still time-travelable, in natural columns
        v1 = cstore.get_version("spend", 1)
        assert v1.columns == ["user_id", "merchant_id", "timestamp", "spend"]
        assert (
            v1.filter("user_id='u1' AND merchant_id='m2'").collect()[0]["spend"]
            == 20.0
        )

    def test_online_view_tuple_reads(self, cstore):
        n = cstore.materialize_online("spend")
        assert n == 4  # distinct (user, merchant) pairs
        got = cstore.get_online("spend", [("u2", "m1")]).collect()
        assert len(got) == 1 and got[0]["spend"] == 30.0
        cols = cstore.get_online("spend").columns
        assert cols == ["user_id", "merchant_id", "timestamp", "spend"]

    def test_erase_tuple_ids(self, cstore):
        removed = cstore.erase_entities("spend", [("u2", "m1")])
        assert removed == {("spend", 1): 2}
        assert (
            cstore.get("spend", [("u2", "m1")], ts("2024-01-31")).count() == 0
        )

    def test_merge_entities_struct_mapping(self, spark, cstore):
        """Identity resolution on a tuple key: alias PAIR -> canonical
        PAIR via struct-valued mapping columns."""
        mapping = spark.createDataFrame(
            [("u2", "m1", "u1", "m1")],
            ["a_u", "a_m", "c_u", "c_m"],
        ).select(
            F.struct(
                F.col("a_u").alias("user_id"), F.col("a_m").alias("merchant_id")
            ).alias("alias_id"),
            F.struct(
                F.col("c_u").alias("user_id"), F.col("c_m").alias("merchant_id")
            ).alias("canonical_id"),
        )
        cstore.merge_entities("spend", mapping)
        # u2/m1's rows now belong to u1/m1; latest across merged history
        got = cstore.get("spend", [("u1", "m1")], ts("2024-01-31")).collect()
        assert len(got) == 1 and got[0]["spend"] == 11.0
        assert (
            cstore.get("spend", [("u2", "m1")], ts("2024-01-31")).count() == 0
        )

    def test_diff_versions_natural_output(self, spark, cstore):
        patch = spark.createDataFrame(
            [("u1", "m2", ts("2024-01-03"), 99.0)],
            ["user_id", "merchant_id", "timestamp", "spend"],
        )
        cstore.upsert("spend", patch)
        d = cstore.diff_versions("spend", 1, 2)
        assert d.columns[:2] == ["user_id", "merchant_id"]
        rows = d.collect()
        assert len(rows) == 1 and rows[0]["change_type"] == "changed"

    def test_snapshot_pin_resolves_composite(self, spark, cstore):
        m = cstore.snapshot(["spend"])
        patch = spark.createDataFrame(
            [("u1", "m2", ts("2024-01-03"), 77.0)],
            ["user_id", "merchant_id", "timestamp", "spend"],
        )
        cstore.upsert("spend", patch)
        pinned = cstore.get(
            "spend", [("u1", "m2")], ts("2024-01-31"), manifest=m
        ).collect()
        assert pinned[0]["spend"] == 20.0


class TestCompositePitProperty:
    """Hypothesis: the composite-key PIT get matches the §2.3 spec with
    the entity generalized to a TUPLE — small domains force key and
    timestamp collisions so the tie-break and partial-key semantics get
    exercised, mirroring test_pit_properties.py's scalar spec."""

    def test_pit_matches_spec_tuple_key(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        BASE = dt.datetime(2024, 1, 1)
        users = st.sampled_from(["a", "b"])
        merchants = st.sampled_from(["x", "y"])
        days = st.integers(min_value=0, max_value=5)
        vals = st.integers(min_value=0, max_value=99)
        rows_st = st.lists(
            st.tuples(users, merchants, days, vals), min_size=1, max_size=18
        )

        def spec(rows, cutoff_days):
            best = {}
            for row_id, (u, m, d, v) in enumerate(rows):
                if d > cutoff_days:
                    continue
                cur = best.get((u, m))
                if cur is None or d > cur[0]:
                    best[(u, m)] = (d, row_id, v)
            return {k: (d, v) for k, (d, row_id, v) in best.items()}

        @settings(
            max_examples=6,
            deadline=None,
            suppress_health_check=list(HealthCheck),
        )
        @given(rows=rows_st, cutoff=days)
        def run(rows, cutoff):
            df = spark.createDataFrame(
                [
                    (u, m, BASE + dt.timedelta(days=d), v, i)
                    for i, (u, m, d, v) in enumerate(rows)
                ],
                ["user_id", "merchant_id", "timestamp", "val", "__row_id__"],
            ).coalesce(1)
            fs = FeatureStore(spark)
            fs.register("t", df, entity_cols=["user_id", "merchant_id"])
            keys = sorted({(u, m) for u, m, _, _ in rows})
            got = {
                (r["user_id"], r["merchant_id"]): (
                    (r["timestamp"] - BASE).days,
                    r["val"],
                )
                for r in fs.get(
                    "t", keys, BASE + dt.timedelta(days=cutoff)
                ).collect()
            }
            assert got == spec(rows, cutoff)

        run()


class TestCompositeStreaming:
    def test_streaming_snapshot_preserves_tuple_key(self, spark, tmp_path):
        """streaming_register(snapshot) into a composite-key table: the
        micro-batch composes the struct key before the argmax and the
        re-registered snapshot keeps the key (self-describing schema) —
        latest-per-(user, type) across seed + streamed batch."""
        from ml_feature_store_spark.streaming.ingest import streaming_register

        fs = FeatureStore(spark, storage_path=str(tmp_path / "store"))
        seed = spark.createDataFrame(
            [
                ("u1", "click", ts("2024-01-01"), 1.0),
                ("u1", "view", ts("2024-01-02"), 2.0),
                ("u2", "click", ts("2024-01-03"), 3.0),
            ],
            ["user_id", "event_type", "timestamp", "value"],
        )
        fs.register("live", seed, entity_cols=["user_id", "event_type"])
        feed = spark.createDataFrame(
            [
                # overwrites u1/click; u1/view silent; new key u2/view
                ("u1", "click", ts("2024-01-10"), 10.0),
                ("u2", "view", ts("2024-01-11"), 11.0),
            ],
            ["user_id", "event_type", "timestamp", "value"],
        )
        d = str(tmp_path / "feed")
        feed.coalesce(1).write.parquet(d)
        stream = spark.readStream.schema(feed.schema).parquet(d)
        q = streaming_register(
            stream,
            fs,
            "live",
            str(tmp_path / "ck"),
            feature_select=lambda b: b.select(
                "user_id", "event_type", "timestamp", "value"
            ),
        )
        q.awaitTermination(120)
        q.stop()
        info = fs.get_table_info("live")
        assert info.entity_columns == ("user_id", "event_type")
        assert info.version == 2
        got = {
            (r["user_id"], r["event_type"]): r["value"]
            for r in fs.get_version("live", 2).collect()
        }
        assert got == {
            ("u1", "click"): 10.0,
            ("u1", "view"): 2.0,
            ("u2", "click"): 3.0,
            ("u2", "view"): 11.0,
        }


class TestAsofParityWithPandas:
    def test_merge_asof_parity_composite(self, spark, cstore):
        """Backward as-of on the tuple key matches pandas merge_asof with
        by=[user, merchant] — the reference-semantics generalization."""
        pd = pytest.importorskip("pandas")
        # reference tie-break is FIRST input row among duplicate
        # (key, ts); merge_asof keeps the LAST — so feed pandas the
        # already-deduped history (fixture input order)
        feats = pd.DataFrame(
            [
                ("u1", "m1", ts("2024-01-01"), 10.0),
                ("u1", "m1", ts("2024-01-05"), 11.0),
                ("u1", "m2", ts("2024-01-03"), 20.0),
                ("u2", "m1", ts("2024-01-02"), 30.0),
                ("u2", "m2", ts("2024-01-08"), 40.0),
            ],
            columns=["user_id", "merchant_id", "timestamp", "spend"],
        )
        spine_rows = [
            ("u1", "m1", ts("2024-01-04")),
            ("u1", "m1", ts("2024-01-06")),
            ("u1", "m2", ts("2024-01-02")),
            ("u2", "m1", ts("2024-01-02")),
            ("u2", "m2", ts("2024-01-09")),
        ]
        spine = spark.createDataFrame(
            spine_rows, ["user_id", "merchant_id", "timestamp"]
        )
        got = cstore.get_training_set("spend", spine, how="left").toPandas()
        exp = pd.merge_asof(
            pd.DataFrame(
                spine_rows, columns=["user_id", "merchant_id", "timestamp"]
            ).sort_values("timestamp"),
            feats.sort_values("timestamp").rename(
                columns={"timestamp": "__ft__"}
            ),
            left_on="timestamp",
            right_on="__ft__",
            by=["user_id", "merchant_id"],
        )
        # output ts is the MATCHED FEATURE row's ts, so align the two
        # sides as (key, matched spend) multisets
        as_set = lambda df: sorted(  # noqa: E731
            (r.user_id, r.merchant_id, -1 if pd.isna(r.spend) else r.spend)
            for r in df.itertuples()
        )
        assert as_set(got) == as_set(exp)
