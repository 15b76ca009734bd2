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


class TestOnlineService:
    def test_online_service_matches_training_columns(self, spark, store):
        """The SAME service name serves online: prefixed columns match the
        training lane's, values come from each view's latest snapshot."""
        store.materialize_online("spend")
        store.materialize_online("clicks")
        store.create_feature_service(
            "model_v1", {"spend": ["cents"], "clicks": None}
        )
        out = store.get_online_service("model_v1")
        assert sorted(out.columns) == sorted(
            [
                "entity_id",
                "spend__timestamp",
                "spend__cents",
                "clicks__timestamp",
                "clicks__n_clicks",
                "clicks__n_views",
            ]
        )
        rows = {r["entity_id"]: r for r in out.collect()}
        assert rows["u1"]["spend__cents"] == 100
        assert rows["u1"]["clicks__n_clicks"] == 4
        assert rows["u2"]["spend__cents"] == 300

    def test_online_service_entity_filter_and_freshness(self, spark, store):
        store.materialize_online("spend")
        store.materialize_online("clicks")
        store.create_feature_service("m2", {"spend": None, "clicks": None})
        out = store.get_online_service("m2", entity_ids=["u1"])
        assert [r["entity_id"] for r in out.collect()] == ["u1"]
        # freshness SLA: u1's spend row (01-02) is stale at 01-06 with a
        # 2-day max age; u2's (01-03) too -> inner join drops both
        fresh = store.get_online_service(
            "m2", max_age_seconds=2 * 24 * 3600, as_of=ts("2024-01-06")
        )
        assert fresh.count() == 0

    def test_online_service_requires_materialization(self, spark, store):
        store.create_feature_service("m3", {"spend": None})
        with pytest.raises(FeatureTableNotFoundError, match="online view"):
            store.get_online_service("m3").collect()

    def test_online_service_unknown_name(self, store):
        with pytest.raises(FeatureStoreError, match="Unknown feature service"):
            store.get_online_service("ghost")

    def test_online_service_survives_reopen(self, spark, tmp_path):
        """Registry + online snapshots both persist: the serving read
        works from a fresh store over the same storage path."""
        a = FeatureStore(spark, storage_path=str(tmp_path))
        a.register(
            "v",
            spark.createDataFrame(
                [("u1", ts("2024-01-01"), 7)],
                ["entity_id", "timestamp", "x"],
            ),
        )
        a.materialize_online("v")
        a.create_feature_service("svc", {"v": None})
        b = FeatureStore(spark, storage_path=str(tmp_path))
        rows = b.get_online_service("svc").collect()
        assert len(rows) == 1 and rows[0]["v__x"] == 7


class TestServiceWithDerivedViews:
    """Feast services bundle ODFVs next to base views (round-8): a
    derived-view name in selections computes its expressions inside the
    same build, prefixed <view>__<col> like everything else."""

    @pytest.fixture
    def dstore(self, spark, store):
        store.create_derived_view(
            "spend_rate",
            sources=["spend", "clicks"],
            exprs={
                "cents_per_click": "spend__cents DIV clicks__n_clicks",
                "total": "spend__cents + clicks__n_clicks",
            },
        )
        return store

    def test_training_set_with_derived_member(self, spark, dstore):
        dstore.create_feature_service(
            "svc_dv",
            {"spend": ["cents"], "spend_rate": ["cents_per_click"]},
        )
        out = dstore.get_service_training_set("svc_dv", _spine(spark))
        assert sorted(out.columns) == sorted(
            [
                "entity_id",
                "timestamp",
                "spend__cents",
                "spend__timestamp",
                "spend_rate__cents_per_click",
            ]
        )
        rows = {r["entity_id"]: r for r in out.collect()}
        assert rows["u1"]["spend_rate__cents_per_click"] == 100 // 4
        assert rows["u2"]["spend_rate__cents_per_click"] == 300 // 2
        assert rows["u1"]["spend__cents"] == 100

    def test_derived_member_all_columns(self, spark, dstore):
        dstore.create_feature_service("svc_all", {"spend_rate": None})
        out = dstore.get_service_training_set("svc_all", _spine(spark))
        assert sorted(out.columns) == sorted(
            [
                "entity_id",
                "timestamp",
                "spend_rate__cents_per_click",
                "spend_rate__total",
            ]
        )

    def test_direct_selection_on_derived_source_keeps_exprs_working(
        self, spark, dstore
    ):
        """spend is BOTH directly selected (cents only) and a derived
        source — the projection must not break the expressions."""
        dstore.create_feature_service(
            "svc_both", {"spend": ["cents"], "spend_rate": None}
        )
        out = dstore.get_service_training_set("svc_both", _spine(spark))
        rows = {r["entity_id"]: r for r in out.collect()}
        assert rows["u1"]["spend_rate__total"] == 104

    def test_online_service_with_derived_member(self, spark, dstore):
        dstore.materialize_online("spend")
        dstore.materialize_online("clicks")
        dstore.create_feature_service(
            "svc_on", {"clicks": ["n_views"], "spend_rate": ["cents_per_click"]}
        )
        out = dstore.get_online_service("svc_on")
        rows = {r["entity_id"]: r for r in out.collect()}
        assert rows["u1"]["spend_rate__cents_per_click"] == 25
        assert rows["u1"]["clicks__n_views"] == 40

    def test_validation_unknown_derived_column(self, dstore):
        with pytest.raises(FeatureValidationError, match="derives"):
            dstore.create_feature_service(
                "bad", {"spend_rate": ["nope"]}
            )

    def test_drop_derived_view_refused_while_selected(self, dstore):
        dstore.create_feature_service("svc_ref", {"spend_rate": None})
        with pytest.raises(FeatureValidationError, match="selected by"):
            dstore.drop_derived_view("spend_rate")
        dstore.drop_feature_service("svc_ref")
        assert dstore.drop_derived_view("spend_rate") is True

    def test_delete_source_flags_transitive_service(self, spark, tmp_path):
        fs = FeatureStore(spark, storage_path=str(tmp_path))
        df = spark.createDataFrame(
            [("u1", ts("2024-01-01"), 5)], ["entity_id", "timestamp", "x"]
        )
        fs.register("base", df)
        fs.create_derived_view("dv", sources=["base"], exprs={"y": "base__x * 2"})
        fs.create_feature_service("svc", {"dv": None})
        # svc never names 'base', but dangles transitively through dv
        with pytest.raises(FeatureValidationError, match="svc"):
            fs.delete("base")
        assert fs.delete("base", cascade=True) is True
        assert fs.list_feature_services() == []
        assert fs.list_derived_views() == []

    def test_request_data_through_service(self, spark, store):
        store.create_derived_view(
            "afford_svc",
            sources=["spend"],
            exprs={"affordable": "budget_cents >= spend__cents"},
        )
        store.create_feature_service("svc_req", {"afford_svc": None})
        spine = spark.createDataFrame(
            [("u1", ts("2024-01-06"), 150), ("u2", ts("2024-01-06"), 150)],
            ["entity_id", "timestamp", "budget_cents"],
        )
        out = store.get_service_training_set("svc_req", spine)
        rows = {r["entity_id"]: r["afford_svc__affordable"] for r in out.collect()}
        assert rows == {"u1": True, "u2": False}

    def test_service_with_derived_survives_reopen(self, spark, tmp_path):
        a = FeatureStore(spark, storage_path=str(tmp_path))
        df = spark.createDataFrame(
            [("u1", ts("2024-01-01"), 5)], ["entity_id", "timestamp", "x"]
        )
        a.register("base", df)
        a.create_derived_view("dv", sources=["base"], exprs={"y": "base__x * 2"})
        a.create_feature_service("svc", {"dv": ["y"]})
        b = FeatureStore(spark, storage_path=str(tmp_path))
        spine = spark.createDataFrame(
            [("u1", ts("2024-01-02"))], ["entity_id", "timestamp"]
        )
        rows = b.get_service_training_set("svc", spine).collect()
        assert rows[0]["dv__y"] == 10


class TestRound8ReviewFixes:
    def test_derived_view_cannot_shadow_table(self, spark, store):
        """A derived view taking an existing TABLE's name would hijack
        service selections of that name (derived wins in the read
        paths) — rejected at creation (round-8 review fix)."""
        with pytest.raises(FeatureValidationError, match="shadow"):
            store.create_derived_view(
                "spend", sources=["clicks"], exprs={"x": "1"}
            )

    def test_table_cannot_shadow_derived_view(self, spark, store):
        store.create_derived_view(
            "dv_shadow", sources=["spend"], exprs={"x": "spend__cents"}
        )
        df = spark.createDataFrame(
            [("u1", ts("2024-01-01"), 1)], ["entity_id", "timestamp", "x"]
        )
        with pytest.raises(FeatureValidationError, match="shadow"):
            store.register("dv_shadow", df)

    def test_service_output_handles_dunder_view_names(self, spark):
        """A view whose NAME contains '__' must keep its columns in the
        derived-member output lane (longest-prefix matching, not a
        first-'__' split — round-8 review fix)."""
        fs = FeatureStore(spark)
        df = spark.createDataFrame(
            [("u1", ts("2024-01-01"), 7)], ["entity_id", "timestamp", "x"]
        )
        fs.register("user__stats", df)
        fs.create_derived_view(
            "dv", sources=["user__stats"], exprs={"y": "user__stats__x * 2"}
        )
        fs.create_feature_service(
            "svc", {"user__stats": None, "dv": None}
        )
        spine = spark.createDataFrame(
            [("u1", ts("2024-01-02"))], ["entity_id", "timestamp"]
        )
        out = fs.get_service_training_set("svc", spine)
        row = out.collect()[0]
        assert row["user__stats__x"] == 7
        assert row["dv__y"] == 14


class TestServiceOdfvPlanShape:
    def test_derived_member_adds_no_window_or_exchange(self, spark, store):
        """Zero-extra-cost gate: a service bundling an ODFV over the
        same two sources compiles to EXACTLY the plain two-view
        service's plan shape — same as-of Window count, same exchange
        count; the derived layer is a map-side projection (round-8,
        measured 2 Windows / 6 exchanges both ways)."""
        import re

        store.create_derived_view(
            "rate_pg",
            sources=["spend", "clicks"],
            exprs={"cpc": "spend__cents DIV clicks__n_clicks"},
        )
        store.create_feature_service(
            "svc_pg", {"spend": ["cents"], "rate_pg": None}
        )
        store.create_feature_service(
            "svc_pg_plain", {"spend": ["cents"], "clicks": None}
        )
        spine = _spine(spark)

        def shape(name):
            plan = (
                store.get_service_training_set(name, spine)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            return plan.count("Window "), len(re.findall(r"Exchange ", plan))

        assert shape("svc_pg") == shape("svc_pg_plain")


class TestOutputMapping:
    """f41: service output_mapping (Feast field_mapping at retrieval)."""

    def test_training_columns_renamed(self, spark, store):
        store.create_feature_service(
            "m",
            {"spend": ["cents"], "clicks": ["n_clicks"]},
            output_mapping={"spend__cents": "spend_cents",
                            "clicks__n_clicks": "click_count"},
        )
        out = store.get_service_training_set("m", _spine(spark))
        assert "spend_cents" in out.columns
        assert "click_count" in out.columns
        assert "spend__cents" not in out.columns
        row = {r.entity_id: r for r in out.collect()}
        assert row["u2"].spend_cents == 300 and row["u2"].click_count == 2

    def test_online_lane_uses_same_names(self, spark, store):
        store.create_feature_service(
            "m2",
            {"spend": ["cents"]},
            output_mapping={"spend__cents": "spend_cents"},
        )
        store.materialize_online("spend")
        out = store.get_online_service("m2")
        assert "spend_cents" in out.columns
        assert "spend__cents" not in out.columns

    def test_unknown_source_column_refused(self, store):
        with pytest.raises(FeatureValidationError, match="does not produce"):
            store.create_feature_service(
                "bad",
                {"spend": ["cents"]},
                output_mapping={"spend__nope": "x"},
            )

    def test_duplicate_target_refused(self, store):
        with pytest.raises(FeatureValidationError, match="multiple columns"):
            store.create_feature_service(
                "bad",
                {"spend": ["cents", "channel"]},
                output_mapping={"spend__cents": "x", "spend__channel": "x"},
            )

    def test_target_colliding_with_unmapped_output_refused(self, store):
        with pytest.raises(FeatureValidationError, match="collide"):
            store.create_feature_service(
                "bad",
                {"spend": ["cents", "channel"]},
                output_mapping={"spend__cents": "spend__channel"},
            )

    def test_mapping_persists_across_reopen(self, spark, tmp_path):
        d = str(tmp_path / "store")
        a = FeatureStore(spark, storage_path=d)
        spend = spark.createDataFrame(
            [("u1", ts("2024-01-02"), 100)],
            ["entity_id", "timestamp", "cents"],
        )
        a.register("spend", spend)
        a.create_feature_service(
            "m", {"spend": ["cents"]},
            output_mapping={"spend__cents": "spend_cents"},
        )
        b = FeatureStore(spark, storage_path=d)
        out = b.get_service_training_set("m", _spine(spark))
        assert "spend_cents" in out.columns


class TestServingLog:
    """f44: log_service_read (feature logging)."""

    def _served_store(self, spark, tmp_path=None):
        fs = (
            FeatureStore(spark, storage_path=str(tmp_path / "s"))
            if tmp_path is not None
            else FeatureStore(spark)
        )
        spend = spark.createDataFrame(
            [
                ("u1", ts("2024-01-02"), 100),
                ("u1", ts("2024-01-04"), 150),
                ("u2", ts("2024-01-03"), 300),
            ],
            ["entity_id", "timestamp", "cents"],
        )
        fs.register("spend", spend)
        fs.materialize_online("spend")
        fs.create_feature_service("m", {"spend": ["cents"]})
        return fs

    def test_log_accumulates_and_matches_serve(self, spark):
        fs = self._served_store(spark)
        served = fs.log_service_read(
            "m", ["u1"], logical_time=ts("2024-02-01 03:00:00")
        )
        assert {r.entity_id: r.spend__cents for r in served.collect()} == {
            "u1": 150
        }
        fs.log_service_read("m", logical_time=ts("2024-02-01 09:00:00"))
        log = fs.get_training_set(
            "m__serving_log",
            spark.createDataFrame(
                [("u1", ts("2024-03-01"))], ["entity_id", "timestamp"]
            ),
        )
        # PIT over the log: latest logged row for u1 is the 09:00 serve
        row = log.collect()[0]
        assert row.spend__cents == 150
        # both serves are retained as history (two versions)
        assert fs.get_table_info("m__serving_log").version == 2

    def test_pit_what_did_the_model_see(self, spark):
        fs = self._served_store(spark)
        fs.log_service_read(
            "m", logical_time=ts("2024-02-01 03:00:00")
        )
        # features change AFTER the first serve
        fs.append(
            "spend",
            spark.createDataFrame(
                [("u1", ts("2024-02-10"), 999)],
                ["entity_id", "timestamp", "cents"],
            ),
        )
        fs.materialize_online("spend")
        fs.log_service_read(
            "m", logical_time=ts("2024-02-15 03:00:00")
        )
        seen_early = fs.get("m__serving_log", ["u1"], ts("2024-02-02"))
        seen_late = fs.get("m__serving_log", ["u1"], ts("2024-02-16"))
        assert seen_early.collect()[0].spend__cents == 150
        assert seen_late.collect()[0].spend__cents == 999

    def test_output_mapping_composes(self, spark):
        fs = self._served_store(spark)
        fs.create_feature_service(
            "mm", {"spend": ["cents"]},
            output_mapping={"spend__cents": "spend_cents"},
        )
        fs.log_service_read("mm", logical_time=ts("2024-02-01"))
        info = fs.get_table_info("mm__serving_log")
        assert "spend_cents" in info.columns


class TestCompareServices:
    """f46: champion/challenger shadow audit."""

    def test_value_and_coverage_skew_counted(self, spark):
        fs = FeatureStore(spark)
        champ_src = spark.createDataFrame(
            [("u1", ts("2024-01-02"), 100), ("u2", ts("2024-01-03"), 300),
             ("u3", ts("2024-01-04"), 500)],
            ["entity_id", "timestamp", "cents"],
        )
        # challenger: u2 differs, u3 missing, u1 agrees
        chall_src = spark.createDataFrame(
            [("u1", ts("2024-01-02"), 100), ("u2", ts("2024-01-03"), 999)],
            ["entity_id", "timestamp", "cents"],
        )
        fs.register("cva", champ_src)
        fs.register("cvb", chall_src)
        fs.materialize_online("cva")
        fs.materialize_online("cvb")
        fs.create_feature_service(
            "champ", {"cva": ["cents"]},
            output_mapping={"cva__cents": "spend"},
        )
        fs.create_feature_service(
            "chall", {"cvb": ["cents"]},
            output_mapping={"cvb__cents": "spend"},
        )
        rows = {r.column: r for r in fs.compare_services("champ", "chall").collect()}
        r = rows["spend"]
        assert (r.n_match, r.n_diff) == (1, 1)
        assert (r.n_only_champion, r.n_only_challenger) == (1, 0)

    def test_null_safe_equality(self, spark):
        fs = FeatureStore(spark)
        a = spark.createDataFrame(
            [("u1", ts("2024-01-02"), None), ("u2", ts("2024-01-02"), 5)],
            "entity_id string, timestamp timestamp, cents long",
        )
        b = spark.createDataFrame(
            [("u1", ts("2024-01-02"), None), ("u2", ts("2024-01-02"), None)],
            "entity_id string, timestamp timestamp, cents long",
        )
        fs.register("nsa", a)
        fs.register("nsb", b)
        fs.materialize_online("nsa")
        fs.materialize_online("nsb")
        fs.create_feature_service(
            "sa", {"nsa": ["cents"]}, output_mapping={"nsa__cents": "c"}
        )
        fs.create_feature_service(
            "sb", {"nsb": ["cents"]}, output_mapping={"nsb__cents": "c"}
        )
        r = {x.column: x for x in fs.compare_services("sa", "sb").collect()}["c"]
        # NULL == NULL matches (u1); 5 vs NULL differs (u2)
        assert (r.n_match, r.n_diff) == (1, 1)
