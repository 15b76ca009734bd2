"""Cross-table snapshot manifests: pin (table -> version) pairs at build
time, re-resolve training sets through them later — the multi-table
generalization of the reference's single-table time travel
(reference: src/ml_feature_store/store.py:377-401)."""
from __future__ import annotations

import datetime as dt

import pytest

from ml_feature_store_spark import (
    FeatureStore,
    FeatureTableNotFoundError,
    FeatureValidationError,
    SnapshotManifest,
)


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture
def two_view_store(spark):
    fs = FeatureStore(spark, max_versions=5)
    clicks = spark.createDataFrame(
        [
            ("u1", ts("2024-01-01"), 1.0),
            ("u1", ts("2024-01-10"), 2.0),
            ("u2", ts("2024-01-05"), 5.0),
        ],
        ["entity_id", "timestamp", "clicks"],
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
        [("u1", ts("2024-01-31")), ("u2", ts("2024-01-31"))],
        ["entity_id", "timestamp"],
    )


class TestSnapshotManifest:
    def test_snapshot_pins_catalog_versions(self, two_view_store):
        m = two_view_store.snapshot()
        assert isinstance(m, SnapshotManifest)
        assert m.tables == (("clicks", 1), ("spend", 1))
        assert m.version_of("clicks") == 1
        assert two_view_store.get_snapshot(m.snapshot_id) == m
        assert two_view_store.list_snapshots() == [m]

    def test_snapshot_of_subset_and_unknown_table(self, two_view_store):
        m = two_view_store.snapshot(["clicks"])
        assert m.tables == (("clicks", 1),)
        with pytest.raises(FeatureTableNotFoundError):
            m.version_of("spend")
        with pytest.raises(FeatureTableNotFoundError):
            two_view_store.snapshot(["nope"])

    def test_snapshot_empty_catalog_rejected(self, spark):
        fs = FeatureStore(spark)
        with pytest.raises(FeatureValidationError):
            fs.snapshot()

    def test_training_set_reproducible_after_register(self, spark, two_view_store):
        """THE contract: the manifest replays the training set bit-identically
        after an intervening register changed the current version."""
        fs = two_view_store
        spine = _spine(spark)
        m = fs.snapshot()
        before = sorted(
            fs.get_multi_view_training_set(["clicks", "spend"], spine, manifest=m)
            .collect()
        )
        # intervening register: u1's clicks double, u2 disappears
        fs.register(
            "clicks",
            spark.createDataFrame(
                [("u1", ts("2024-01-20"), 99.0)],
                ["entity_id", "timestamp", "clicks"],
            ),
        )
        current = sorted(
            fs.get_multi_view_training_set(["clicks", "spend"], spine).collect()
        )
        pinned = sorted(
            fs.get_multi_view_training_set(["clicks", "spend"], spine, manifest=m)
            .collect()
        )
        assert pinned == before
        assert current != before
        # manifest id (string) resolves identically to the object
        by_id = sorted(
            fs.get_multi_view_training_set(
                ["clicks", "spend"], spine, manifest=m.snapshot_id
            ).collect()
        )
        assert by_id == before

    def test_single_table_training_set_manifest(self, spark, two_view_store):
        fs = two_view_store
        spine = _spine(spark)
        m = fs.snapshot(["clicks"])
        before = sorted(fs.get_training_set("clicks", spine).collect())
        fs.register(
            "clicks",
            spark.createDataFrame(
                [("u1", ts("2024-01-25"), -1.0)],
                ["entity_id", "timestamp", "clicks"],
            ),
        )
        assert sorted(fs.get_training_set("clicks", spine, manifest=m).collect()) == before
        assert sorted(fs.get_training_set("clicks", spine).collect()) != before

    def test_pinned_version_survives_retention(self, spark):
        """A manifest-pinned version is exempt from max_versions pruning;
        dropping the manifest releases the pin."""
        fs = FeatureStore(spark, max_versions=2)
        df = spark.createDataFrame(
            [("u1", ts("2024-01-01"), 1.0)], ["entity_id", "timestamp", "v"]
        )
        fs.register("t", df)  # v1
        m = fs.snapshot(["t"])  # pins v1
        fs.register("t", df)  # v2
        fs.register("t", df)  # v3 -> would prune v1 without the pin
        fs.register("t", df)  # v4 -> prunes v2, keeps pinned v1
        assert fs.get_version("t", 1).count() == 1
        assert 2 not in fs._backend.versions("t")
        assert fs.drop_snapshot(m.snapshot_id) is True
        assert fs.drop_snapshot(m.snapshot_id) is False  # idempotent, no raise
        fs.register("t", df)  # v5 -> pin released, v1 now prunable
        assert 1 not in fs._backend.versions("t")

    def test_dangling_manifest_raises(self, spark, two_view_store):
        fs = two_view_store
        m = fs.snapshot()
        fs.delete("clicks")
        with pytest.raises(FeatureTableNotFoundError):
            fs.get_multi_view_training_set(
                ["clicks", "spend"], _spine(spark), manifest=m
            )
        # re-register resets versioning at v1; the pinned version happens to
        # exist again, but a REcreated v1 is a different table generation —
        # acceptable per the docstring (delete is outside the pin contract)

    def test_unknown_snapshot_id_raises(self, two_view_store):
        with pytest.raises(FeatureTableNotFoundError):
            two_view_store.get_snapshot("snap-999")

    def test_manifests_persist_across_store_instances(self, spark, tmp_path):
        """Parquet-backed stores reload manifests from disk: the pin (and
        its retention exemption) survives the process."""
        p = str(tmp_path / "store")
        fs = FeatureStore(spark, storage_path=p, max_versions=2)
        df = spark.createDataFrame(
            [("u1", ts("2024-01-01"), 1.0)], ["entity_id", "timestamp", "v"]
        )
        fs.register("t", df)
        m = fs.snapshot(["t"], description="release-2024-01")
        fs2 = FeatureStore(spark, storage_path=p, max_versions=2)
        loaded = fs2.get_snapshot(m.snapshot_id)
        assert loaded.tables == (("t", 1),)
        assert loaded.description == "release-2024-01"
        fs2.register("t", df)  # v2
        fs2.register("t", df)  # v3: v1 pinned -> survives
        assert fs2.get_version("t", 1).count() == 1
        # ids continue from the persisted max, no collision
        m2 = fs2.snapshot(["t"])
        assert m2.snapshot_id != m.snapshot_id

    def test_snapshot_ids_never_reused_after_drop(self, spark, tmp_path):
        """Ids come from a persisted monotonic counter: dropping the NEWEST
        manifest must not recycle its id for the next snapshot — an
        external consumer holding the old 'snap-N' string would silently
        resolve to a different pin (ADVICE r6)."""
        p = str(tmp_path / "store")
        fs = FeatureStore(spark, storage_path=p)
        df = spark.createDataFrame(
            [("u1", ts("2024-01-01"), 1.0)], ["entity_id", "timestamp", "v"]
        )
        fs.register("t", df)
        m1 = fs.snapshot(["t"])
        m2 = fs.snapshot(["t"])
        assert fs.drop_snapshot(m2.snapshot_id)
        m3 = fs.snapshot(["t"])
        assert m3.snapshot_id not in (m1.snapshot_id, m2.snapshot_id)
        # ... and the counter survives a store reload
        assert fs.drop_snapshot(m3.snapshot_id)
        fs2 = FeatureStore(spark, storage_path=p)
        m4 = fs2.snapshot(["t"])
        assert m4.snapshot_id not in (
            m1.snapshot_id, m2.snapshot_id, m3.snapshot_id
        )

    def test_pins_exempt_from_retention_count(self, spark):
        """max_versions bounds the number of retained UNPINNED versions:
        pinning old versions must never cause a NEWER unpinned version to
        be pruned early (ADVICE r6 — the recent-history window
        get_version users expect stays intact)."""
        fs = FeatureStore(spark, max_versions=3)
        df = spark.createDataFrame(
            [("u1", ts("2024-01-01"), 1.0)], ["entity_id", "timestamp", "v"]
        )
        fs.register("t", df)  # v1
        fs.snapshot(["t"])  # pins v1
        fs.register("t", df)  # v2
        fs.snapshot(["t"])  # pins v2
        for _ in range(3):
            fs.register("t", df)  # v3, v4, v5
        # unpinned = [3,4,5] == budget 3: nothing pruned; pins retained too
        assert fs._backend.versions("t") == [1, 2, 3, 4, 5]
        fs.register("t", df)  # v6 -> unpinned [3,4,5,6]: prune v3 only
        assert fs._backend.versions("t") == [1, 2, 4, 5, 6]


class TestMultiViewLeft:
    def test_left_keeps_unmatched_spine_rows(self, spark, two_view_store):
        """how='left': spine rows with no qualifying row in SOME view
        survive null-padded; inner drops them (Feast contract)."""
        fs = two_view_store
        # u3 has no rows in either view: dropped by inner, null-padded by left
        spine = spark.createDataFrame(
            [("u1", ts("2024-01-31")), ("u3", ts("2024-01-31"))],
            ["entity_id", "timestamp"],
        )
        inner = fs.get_multi_view_training_set(["clicks", "spend"], spine)
        left = fs.get_multi_view_training_set(
            ["clicks", "spend"], spine, how="left"
        )
        assert inner.count() == 1  # only u1 matches both views
        rows = {r["entity_id"]: r for r in left.collect()}
        assert set(rows) == {"u1", "u3"}
        assert rows["u3"]["clicks__clicks"] is None
        assert rows["u3"]["spend__cents"] is None
        assert rows["u1"]["clicks__clicks"] == 2.0
        assert rows["u1"]["spend__cents"] == 100

    def test_left_rejects_bad_how(self, spark, two_view_store):
        with pytest.raises(FeatureValidationError):
            two_view_store.get_multi_view_training_set(
                ["clicks"], _spine(spark), how="full"
            )


class TestGetWithManifest:
    def test_pit_get_through_pin(self, spark, two_view_store):
        fs = two_view_store
        m = fs.snapshot(["clicks"])
        before = sorted(fs.get("clicks", ["u1", "u2"], ts("2024-01-31")).collect())
        fs.register(
            "clicks",
            spark.createDataFrame(
                [("u1", ts("2024-01-30"), 777.0)],
                ["entity_id", "timestamp", "clicks"],
            ),
        )
        assert sorted(
            fs.get("clicks", ["u1", "u2"], ts("2024-01-31"), manifest=m).collect()
        ) == before
        assert sorted(
            fs.get("clicks", ["u1", "u2"], ts("2024-01-31")).collect()
        ) != before
