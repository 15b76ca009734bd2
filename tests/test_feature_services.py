"""Feature services (round-7): named (view -> columns) retrieval
contracts — Feast's FeatureService — with eager validation at
registration and early projection in the training build (deselected
columns never enter the as-of shuffle)."""
from __future__ import annotations

import datetime as dt

import pytest

from ml_feature_store_spark import (
    FeatureStore,
    FeatureStoreError,
    FeatureTableNotFoundError,
    FeatureValidationError,
)


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture
def store(spark):
    fs = FeatureStore(spark)
    clicks = spark.createDataFrame(
        [
            ("u1", ts("2024-01-01"), 4, 40),
            ("u2", ts("2024-01-05"), 2, 20),
        ],
        ["entity_id", "timestamp", "n_clicks", "n_views"],
    )
    spend = spark.createDataFrame(
        [
            ("u1", ts("2024-01-02"), 100, "card"),
            ("u2", ts("2024-01-03"), 300, "cash"),
        ],
        ["entity_id", "timestamp", "cents", "channel"],
    )
    fs.register("clicks", clicks)
    fs.register("spend", spend)
    return fs


def _spine(spark):
    return spark.createDataFrame(
        [("u1", ts("2024-01-06")), ("u2", ts("2024-01-06"))],
        ["entity_id", "timestamp"],
    )


class TestFeatureServices:
    def test_service_selects_columns(self, spark, store):
        store.create_feature_service(
            "model_v1", {"spend": ["cents"], "clicks": None}
        )
        out = store.get_service_training_set("model_v1", _spine(spark))
        assert sorted(out.columns) == sorted(
            [
                "entity_id",
                "timestamp",
                "spend__cents",
                "spend__timestamp",
                "clicks__n_clicks",
                "clicks__n_views",
                "clicks__timestamp",
            ]
        )
        rows = {r["entity_id"]: r for r in out.collect()}
        assert rows["u1"]["spend__cents"] == 100
        assert rows["u2"]["clicks__n_views"] == 20
        # the deselected column is gone
        assert "spend__channel" not in out.columns

    def test_selection_validated_at_registration(self, store):
        with pytest.raises(FeatureValidationError, match="Unknown feature"):
            store.create_feature_service("s", {"spend": ["nope"]})
        with pytest.raises(FeatureTableNotFoundError):
            store.create_feature_service("s", {"ghost": None})
        with pytest.raises(FeatureValidationError, match="at least one"):
            store.create_feature_service("s", {})
        with pytest.raises(FeatureStoreError, match="Unknown feature service"):
            store.get_service_training_set("ghost", None)

    def test_service_with_manifest_reproducible(self, spark, store):
        store.create_feature_service("m", {"spend": ["cents"]})
        man = store.snapshot(["spend"])
        before = sorted(
            store.get_service_training_set("m", _spine(spark), manifest=man)
            .collect()
        )
        newer = spark.createDataFrame(
            [("u1", ts("2024-01-04"), 999, "card"),
             ("u2", ts("2024-01-04"), 999, "card")],
            ["entity_id", "timestamp", "cents", "channel"],
        )
        store.register("spend", newer)
        assert sorted(
            store.get_service_training_set("m", _spine(spark), manifest=man)
            .collect()
        ) == before
        assert sorted(
            store.get_service_training_set("m", _spine(spark)).collect()
        ) != before

    def test_lifecycle(self, store):
        store.create_feature_service("a", {"spend": None})
        assert store.list_feature_services() == ["a"]
        assert store.drop_feature_service("a") is True
        assert store.drop_feature_service("a") is False

    def test_early_projection_in_plan(self, spark, store):
        """The deselected column must appear ONLY at the in-memory leaf
        (a LogicalRDD always lists its full schema) — never in any
        operator above it, proving the projection ran before the as-of
        join's shuffle rather than after the stitch."""
        store.create_feature_service("m", {"spend": ["cents"]})
        out = store.get_service_training_set("m", _spine(spark))
        plan = out._jdf.queryExecution().executedPlan().toString()
        lines = [l for l in plan.splitlines() if "channel" in l]
        assert all("ExistingRDD" in l for l in lines), lines
