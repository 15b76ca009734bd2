"""operators/classifier.py — integer fixed-point linear probe.

The trainer extends the iterative-fit family (kmeans) to the supervised
case; the properties pinned here are the ones the oracle replay relies
on: an exact, partition-order-independent weight fixpoint, a map-only
scorer whose arithmetic is checkable by hand, and loud refusals on
malformed inputs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ml_feature_store_spark.operators.classifier import (
    SCALE,
    probe_score,
    probe_train,
)

FEATS = ["x0", "x1"]


def _frame(spark, n=200, parts=1):
    # y = (i >= n/2); centered feature x1 = i - n/2 separates perfectly
    rows = [(i, 1, i - n // 2, 1 if i >= n // 2 else 0) for i in range(n)]
    df = spark.createDataFrame(rows, ["id", "x0", "x1", "y"])
    return df.repartition(parts) if parts > 1 else df


class TestProbeTrain:
    def test_learns_separable(self, spark):
        df = _frame(spark)
        w = probe_train(df, FEATS, "y", iterations=3, lr_den=100)
        scored = probe_score(df, w, FEATS)
        acc = scored.filter("(pred = 1) = (y = 1)").count() / 200
        assert acc >= 0.95
        assert w[1] > 0  # positive margin on the separating feature

    def test_fixpoint_partition_order_independent(self, spark):
        w1 = probe_train(_frame(spark, parts=1), FEATS, "y", iterations=3)
        w7 = probe_train(_frame(spark, parts=7), FEATS, "y", iterations=3)
        assert w1 == w7

    def test_hand_checked_first_step(self, spark):
        # w=0 -> p = SCALE/2 for every row -> err = SCALE/2 - y*SCALE
        # G_j = sum(err * x_j); w_j = -floor(G_j / (lr_den * n))
        df = _frame(spark, n=4)  # x1 in {-2,-1,0,1}, y in {0,0,1,1}
        errs = [SCALE // 2, SCALE // 2, -SCALE // 2, -SCALE // 2]
        xs = [-2, -1, 0, 1]
        g0 = sum(errs)
        g1 = sum(e * x for e, x in zip(errs, xs))
        import math

        exp = [-math.floor(g0 / (100 * 4)), -math.floor(g1 / (100 * 4))]
        assert probe_train(df, FEATS, "y", iterations=1, lr_den=100) == exp

    def test_refusals(self, spark):
        df = _frame(spark, n=4)
        with pytest.raises(ValueError, match="iterations"):
            probe_train(df, FEATS, "y", iterations=0)
        with pytest.raises(ValueError, match="lr_den"):
            probe_train(df, FEATS, "y", lr_den=0)
        with pytest.raises(ValueError, match="non-empty"):
            probe_train(df, [], "y")
        with pytest.raises(ValueError, match="empty training frame"):
            probe_train(df.filter("id < 0"), FEATS, "y")


class TestProbeScore:
    def test_hard_sigmoid_clamps(self, spark):
        df = spark.createDataFrame(
            [(1, 0), (1, 10), (1, -10)], ["x0", "x1"]
        )
        # w = [0, SCALE]: z = x1*SCALE; p = clamp(z/4 + S/2, 0, S)
        out = {
            r["x1"]: (r["p"], r["pred"])
            for r in probe_score(df, [0, SCALE], FEATS).collect()
        }
        assert out[0] == (SCALE // 2, 1)  # threshold is >= S/2
        assert out[10] == (SCALE, 1)
        assert out[-10] == (0, 0)

    def test_weight_length_guard(self, spark):
        df = _frame(spark, n=4)
        with pytest.raises(ValueError, match="mismatch"):
            probe_score(df, [1, 2, 3], FEATS)


class TestStreamProbeScore:
    def test_stream_equals_batch_and_min_p_gates(self, spark, tmp_path):
        from ml_feature_store_spark.streaming.ingest import (
            stream_probe_score,
        )

        rows = [(i, 1, i - 10) for i in range(20)]
        df = spark.createDataFrame(rows, ["id", "x0", "x1"])
        feed = str(tmp_path / "feed")
        df.write.parquet(feed)
        w = [0, SCALE // 10]

        stream = spark.readStream.schema("id long, x0 long, x1 long").parquet(
            feed
        )
        sink, ck = str(tmp_path / "sink"), str(tmp_path / "ck")
        q = stream_probe_score(stream, w, FEATS, sink, ck)
        q.awaitTermination(120)
        q.stop()
        got = {
            (r["id"], r["p"], r["pred"])
            for r in spark.read.parquet(sink).collect()
        }
        want = {
            (r["id"], r["p"], r["pred"])
            for r in probe_score(df, w, FEATS).collect()
        }
        assert got == want

        # the admit gate drops below-threshold rows in-stream
        sink2, ck2 = str(tmp_path / "sink2"), str(tmp_path / "ck2")
        q = stream_probe_score(
            stream, w, FEATS, sink2, ck2, min_p=SCALE // 2
        )
        q.awaitTermination(120)
        q.stop()
        admitted = {r["id"] for r in spark.read.parquet(sink2).collect()}
        assert admitted == {i for i, p, pred in want if p >= SCALE // 2}


class TestProbeRegistry:
    """Round-12: the trained probe as a registry-managed artifact —
    create/score/stale/info/list/drop + persistence + delete guard."""

    EXPRS = {"x0": "1", "x1": "feature_b - 10"}
    LABEL = "CASE WHEN feature_a >= 2.5 THEN 1 ELSE 0 END"

    def _feats(self, spark):
        import datetime as dt

        rows = [
            (f"u{i}", dt.datetime(2024, 1, 1), float(i % 5), i % 20)
            for i in range(100)
        ]
        return spark.createDataFrame(
            rows, ["entity_id", "timestamp", "feature_a", "feature_b"]
        )

    def test_train_persist_score_roundtrip(self, spark, tmp_path):
        from ml_feature_store_spark.store import FeatureStore

        fs = FeatureStore(spark, storage_path=str(tmp_path))
        fs.register("t", self._feats(spark))
        spec = fs.create_probe("q", "t", self.EXPRS, self.LABEL)
        assert spec["weights"] != [0, 0]
        assert 0 <= spec["train_accuracy_ppm"] <= 1_000_000
        assert not fs.probe_stale("q")

        scored = fs.score_with_probe("q", self._feats(spark))
        assert {"p", "pred"} <= set(scored.columns)

        # a new process serves the identical scores from the registry
        fs2 = FeatureStore(spark, storage_path=str(tmp_path))
        assert fs2.list_probes() == ["q"]
        a = scored.select("entity_id", "p").collect()
        b = fs2.score_with_probe("q", self._feats(spark)).select(
            "entity_id", "p"
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_stale_is_a_retrain_hint_not_a_refusal(self, spark):
        from ml_feature_store_spark.store import FeatureStore

        fs = FeatureStore(spark)
        fs.register("t", self._feats(spark))
        fs.create_probe("q", "t", self.EXPRS, self.LABEL)
        fs.append("t", self._feats(spark).limit(3))
        assert fs.probe_stale("q")
        # serving still works — a probe claims no corpus coverage
        assert fs.score_with_probe("q", self._feats(spark)).count() == 100

    def test_delete_guard_and_drop(self, spark):
        from ml_feature_store_spark.errors import FeatureValidationError
        from ml_feature_store_spark.store import FeatureStore

        fs = FeatureStore(spark)
        fs.register("t", self._feats(spark))
        fs.create_probe("q", "t", self.EXPRS, self.LABEL)
        with pytest.raises(FeatureValidationError, match="probe"):
            fs.delete("t")
        assert fs.delete("t", cascade=True)
        assert fs.list_probes() == []
        assert fs.drop_probe("q") is False

    def test_empty_exprs_refuse(self, spark):
        from ml_feature_store_spark.errors import FeatureValidationError
        from ml_feature_store_spark.store import FeatureStore

        fs = FeatureStore(spark)
        fs.register("t", self._feats(spark))
        with pytest.raises(FeatureValidationError, match="non-empty"):
            fs.create_probe("q", "t", {}, self.LABEL)

    def test_feature_name_collision_refuses(self, spark):
        from ml_feature_store_spark.errors import FeatureValidationError
        from ml_feature_store_spark.store import FeatureStore

        fs = FeatureStore(spark)
        fs.register("t", self._feats(spark))
        fs.create_probe("q", "t", self.EXPRS, self.LABEL)
        clashing = self._feats(spark).withColumn("x1", F.lit(0))
        with pytest.raises(FeatureValidationError, match="collide"):
            fs.score_with_probe("q", clashing)


class TestExportTrainingShards:
    """store.export_training_shards: deterministic assignment, manifest
    == data, refusals."""

    def _store(self, spark, tmp_path):
        import datetime as dt

        from ml_feature_store_spark.store import FeatureStore

        rows = [
            (f"u{i}", dt.datetime(2024, 1, 1), i * 10) for i in range(200)
        ]
        df = spark.createDataFrame(
            rows, ["entity_id", "timestamp", "feature_b"]
        )
        fs = FeatureStore(spark)
        fs.register("t", df)
        return fs

    def test_manifest_matches_data_and_is_deterministic(
        self, spark, tmp_path
    ):
        import json

        fs = self._store(spark, tmp_path)
        p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
        m1 = fs.export_training_shards("t", p1, n_shards=4)
        m2 = fs.export_training_shards("t", p2, n_shards=4)
        assert m1["shards"] == m2["shards"]  # pure function of (key, seed)
        assert m1["total_rows"] == 200
        disk = json.loads((tmp_path / "e1" / "_manifest.json").read_text())
        assert disk["shards"] == m1["shards"]
        back = spark.read.parquet(p1)
        got = {
            int(r["shard"]): r["n"]
            for r in back.groupBy("shard").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }
        assert got == {
            int(k): v["n_rows"] for k, v in m1["shards"].items()
        }
        # a different seed produces a different permutation
        m3 = fs.export_training_shards(
            "t", str(tmp_path / "e3"), n_shards=4, seed=7
        )
        assert m3["shards"] != m1["shards"]

    def test_rows_sorted_by_hash_within_shard(self, spark, tmp_path):
        fs = self._store(spark, tmp_path)
        p = str(tmp_path / "e")
        fs.export_training_shards("t", p, n_shards=2)
        import pyarrow.parquet as pq
        from pathlib import Path

        f = next(Path(p, "shard=0").glob("*.parquet"))
        ids = pq.read_table(f, columns=["entity_id"])["entity_id"].to_pylist()
        import hashlib

        def h(e):
            return int(hashlib.md5(f"{e}-42".encode()).hexdigest()[:8], 16)

        assert ids == sorted(ids, key=h)

    def test_refusals(self, spark, tmp_path):
        from ml_feature_store_spark.errors import FeatureValidationError

        fs = self._store(spark, tmp_path)
        with pytest.raises(FeatureValidationError, match="n_shards"):
            fs.export_training_shards("t", str(tmp_path / "x"), n_shards=0)
        with pytest.raises(FeatureValidationError, match="shard_key"):
            fs.export_training_shards(
                "t", str(tmp_path / "x"), n_shards=2, shard_key="nope"
            )


class TestProbeReport:
    def test_sweep_is_monotone_and_consistent(self, spark):
        from ml_feature_store_spark.store import FeatureStore

        fs = FeatureStore(spark)
        import datetime as dt

        rows = [
            (f"u{i}", dt.datetime(2024, 1, 1), float(i % 5), i % 20)
            for i in range(100)
        ]
        df = spark.createDataFrame(
            rows, ["entity_id", "timestamp", "feature_a", "feature_b"]
        )
        fs.register("t", df)
        fs.create_probe(
            "q", "t", {"x0": "1", "x1": "feature_b - 10"},
            "CASE WHEN feature_a >= 2.5 THEN 1 ELSE 0 END",
        )
        rep = {r["threshold"]: r for r in fs.probe_report("q").collect()}
        assert len(rep) == 11
        n = 100
        for t, r in rep.items():
            assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == n
        # raising the threshold can only shrink the predicted-positive set
        ths = sorted(rep)
        for a, b in zip(ths, ths[1:]):
            assert rep[b]["tp"] + rep[b]["fp"] <= rep[a]["tp"] + rep[a]["fp"]
        # threshold 0 admits everything: recall 1e6
        assert rep[0]["recall_ppm"] == 1_000_000

    def test_refusals(self, spark):
        from ml_feature_store_spark.errors import (
            FeatureStoreError,
            FeatureValidationError,
        )
        from ml_feature_store_spark.store import FeatureStore

        fs = FeatureStore(spark)
        with pytest.raises(FeatureStoreError, match="Unknown probe"):
            fs.probe_report("nope")


class TestVerifyTrainingShards:
    def test_verify_roundtrip_and_corruption(self, spark, tmp_path):
        import datetime as dt
        import shutil
        from pathlib import Path

        from ml_feature_store_spark.errors import FeatureValidationError
        from ml_feature_store_spark.store import FeatureStore

        rows = [
            (f"u{i}", dt.datetime(2024, 1, 1), i) for i in range(100)
        ]
        df = spark.createDataFrame(rows, ["entity_id", "timestamp", "v"])
        fs = FeatureStore(spark)
        fs.register("t", df)
        p = str(tmp_path / "e")
        m = fs.export_training_shards("t", p, n_shards=4)
        assert fs.verify_training_shards(p)["shards"] == m["shards"]
        # drop a whole shard directory -> verification must refuse
        shutil.rmtree(next(Path(p).glob("shard=*")))
        with pytest.raises(FeatureValidationError, match="do not match"):
            fs.verify_training_shards(p)
        # no manifest -> the export never committed
        with pytest.raises(FeatureValidationError, match="manifest"):
            fs.verify_training_shards(str(tmp_path / "missing"))

    def test_shard_column_collision_refuses(self, spark, tmp_path):
        import datetime as dt

        from ml_feature_store_spark.errors import FeatureValidationError
        from ml_feature_store_spark.store import FeatureStore

        rows = [(f"u{i}", dt.datetime(2024, 1, 1), i) for i in range(10)]
        df = spark.createDataFrame(rows, ["entity_id", "timestamp", "shard"])
        fs = FeatureStore(spark)
        fs.register("t2", df)
        with pytest.raises(FeatureValidationError, match="'shard' column"):
            fs.export_training_shards("t2", str(tmp_path / "x"), n_shards=2)
