"""sd16's operator: streaming data-contract gate with dead-letter queue
(streaming/ingest.py ``stream_contract_gate``).

Contracts pinned here:
  * row routing: pass -> good sink, fail -> quarantine with the full
    list of failed checks (a row failing two checks is tagged twice,
    stored once);
  * NULL check results are violations (three-valued logic — f33's
    register-time rule, applied in flight);
  * no row is lost or duplicated across the two sinks;
  * full replay against the same sinks is idempotent.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ml_feature_store_spark.streaming.ingest import stream_contract_gate

CHECKS = {"pos": "v > 0", "small": "v < 100"}
SCHEMA = "id long, v double"


@pytest.fixture()
def feed(spark, tmp_path):
    d = str(tmp_path / "feed")
    rows1 = [(1, 5.0), (2, -3.0), (3, None)]  # -3 fails pos; NULL fails both
    rows2 = [(4, 50.0), (5, 500.0), (6, -200.0)]  # 500 fails small; -200 fails pos
    spark.createDataFrame(rows1, SCHEMA).coalesce(1).write.mode("append").parquet(d)
    spark.createDataFrame(rows2, SCHEMA).coalesce(1).write.mode("append").parquet(d)
    return d


def _run(spark, feed, tmp_path, tag):
    good = str(tmp_path / f"good{tag}")
    quar = str(tmp_path / f"quar{tag}")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = stream_contract_gate(
        stream, CHECKS, good, quar, str(tmp_path / f"ck{tag}")
    )
    q.awaitTermination(120)
    q.stop()
    return (
        spark.read.parquet(good).drop("batch_id"),
        spark.read.parquet(quar).drop("batch_id"),
    )


class TestStreamContractGate:
    def test_routing_and_tags(self, spark, feed, tmp_path):
        good, quar = _run(spark, feed, tmp_path, "a")
        assert sorted(r.id for r in good.collect()) == [1, 4]
        tags = {r.id: sorted(r.failed_checks) for r in quar.collect()}
        assert tags == {
            2: ["pos"],
            3: ["pos", "small"],  # NULL fails BOTH checks
            5: ["small"],
            6: ["pos"],
        }

    def test_no_row_lost_or_duplicated(self, spark, feed, tmp_path):
        good, quar = _run(spark, feed, tmp_path, "b")
        ids = [r.id for r in good.collect()] + [r.id for r in quar.collect()]
        assert sorted(ids) == [1, 2, 3, 4, 5, 6]

    def test_full_replay_idempotent(self, spark, feed, tmp_path):
        g1, q1 = _run(spark, feed, tmp_path, "c")
        n_good, n_quar = g1.count(), q1.count()
        # rerun with a fresh checkpoint against the SAME sinks
        good = str(tmp_path / "goodc")
        quar = str(tmp_path / "quarc")
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q = stream_contract_gate(
            stream, CHECKS, good, quar, str(tmp_path / "ck_replay")
        )
        q.awaitTermination(120)
        q.stop()
        assert spark.read.parquet(good).count() == n_good
        assert spark.read.parquet(quar).count() == n_quar
