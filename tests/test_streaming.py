"""Structured Streaming tests: stream(availableNow) == batch equivalence,
watermark config, and the foreachBatch register-upsert bridge."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from ml_feature_store_spark import FeatureStore
from ml_feature_store_spark.streaming import (
    stream_events,
    streaming_feature_agg,
    streaming_register,
    streaming_sessionize,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark):
    """Copy the events parquet into a dir (file-source streams read dirs).

    MODULE-SCOPED: any test that drops extra files in here (to force a
    second micro-batch) MUST remove them in a ``finally`` — a leaked file
    doubles every later test's stream input. Teardown asserts the dir is
    back to exactly the one seeded file so the NEXT leak fails loudly at
    its source instead of corrupting downstream stream-vs-batch compares.
    """
    import os

    d = tempfile.mkdtemp(prefix="mlfs_stream_")
    shutil.copy(f"{SF}/events.parquet", d)
    yield d
    leaked = sorted(f for f in os.listdir(d) if f != "events.parquet")
    shutil.rmtree(d, ignore_errors=True)
    assert not leaked, (
        f"test leaked extra files into the module-scoped events_dir: {leaked} "
        "— remove them in a finally (they double later tests' stream input)"
    )


def _run_stream(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


class TestStreamBatchEquivalence:
    def test_tumbling_agg_matches_batch(self, spark, events_dir):
        stream = stream_events(spark, events_dir)
        q = _run_stream(streaming_feature_agg(stream), "tumbling_t")
        got = {
            (r.window_start, r.event_type): (r.n_events, r.sum_value)
            for r in spark.sql("select * from tumbling_t").collect()
        }
        from ml_feature_store_spark.suite import table

        ev = table(spark, SF, "events")
        want = {
            (r.ws, r.event_type): (r.n, r.s)
            for r in ev.groupBy(
                F.window("ts", "1 day").alias("w"), "event_type"
            )
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s"))
            .select(F.col("w.start").alias("ws"), "event_type", "n", "s")
            .collect()
        }
        assert got == want
        q.stop()

    def test_stream_stream_join_matches_batch(self, spark, events_dir):
        """Watermarked stream-stream interval join == the batch interval
        join (suite.py r2_interval_join) on the same input. Inner
        stream-stream joins emit in append mode; with availableNow over
        one file every on-time pair is emitted by termination."""
        from ml_feature_store_spark.streaming import stream_stream_join
        from ml_feature_store_spark.suite import QUERIES

        stream = stream_events(spark, events_dir)
        joined = stream_stream_join(stream, stream_events(spark, events_dir))
        q = (
            joined.writeStream.format("memory")
            .queryName("ssjoin_t")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        got = {
            (r.user_id, r.view_id, r.buy_id, r.view_us, r.buy_us)
            for r in spark.sql("select * from ssjoin_t").collect()
        }
        want = {
            (r.user_id, r.view_id, r.buy_id, r.view_us, r.buy_us)
            for r in QUERIES["r2_interval_join"](spark, SF).collect()
        }
        assert got == want

    def test_stream_stream_left_outer_emits_null_lane(self, spark):
        """left_outer stream-stream join: matched pairs == the inner/batch
        pairs exactly; null-padded views appear only for bands the
        watermark has PROVEN empty, and every one must exist in the batch
        left join's null lane (r3_interval_left_join). A flush file one
        batch later advances the watermark so eviction actually fires
        (maxFilesPerTrigger=1 in stream_events)."""
        import datetime as dt
        import glob as _glob
        import shutil as _sh
        import tempfile as _tf

        from ml_feature_store_spark.streaming import stream_stream_join
        from ml_feature_store_spark.suite import QUERIES, table

        d = _tf.mkdtemp(prefix="mlfs_ssleft_")
        try:
            _sh.copy(f"{SF}/events.parquet", f"{d}/0_events.parquet")
            max_ts = table(spark, SF, "events").agg(F.max("ts")).collect()[0][0]
            flush = spark.createDataFrame(
                [
                    (-1, max_ts + dt.timedelta(hours=10), -1, "view", 0.0, "{}"),
                    (-2, max_ts + dt.timedelta(hours=10), -1, "purchase", 0.0, "{}"),
                ],
                "event_id long, ts timestamp, user_id long, event_type string, "
                "value double, props string",
            )
            tmp_out = _tf.mkdtemp(prefix="mlfs_flushw_")
            flush.coalesce(1).write.mode("overwrite").parquet(tmp_out)
            (part,) = _glob.glob(f"{tmp_out}/part-*.parquet")
            _sh.copy(part, f"{d}/1_flush.parquet")
            _sh.rmtree(tmp_out, ignore_errors=True)

            joined = stream_stream_join(
                stream_events(spark, d), stream_events(spark, d), how="left_outer"
            )
            q = (
                joined.writeStream.format("memory")
                .queryName("ssleft_t")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            q.stop()
            rows = [
                r
                for r in spark.sql("select * from ssleft_t").collect()
                if r.user_id >= 0
            ]
            got_pairs = {
                (r.user_id, r.view_id, r.buy_id)
                for r in rows
                if r.buy_id is not None
            }
            got_nulls = {(r.user_id, r.view_id) for r in rows if r.buy_id is None}
            batch = QUERIES["r3_interval_left_join"](spark, SF).collect()
            want_pairs = {
                (r.user_id, r.view_id, r.buy_id)
                for r in batch
                if r.buy_id is not None
            }
            want_nulls = {(r.user_id, r.view_id) for r in batch if r.buy_id is None}
            assert got_pairs == want_pairs
            assert got_nulls  # watermark advanced -> eviction emitted some
            assert got_nulls <= want_nulls  # never a spurious null row
        finally:
            _sh.rmtree(d, ignore_errors=True)

    def test_stream_stream_join_rejects_other_how(self, spark, events_dir):
        from ml_feature_store_spark.streaming import stream_stream_join

        with pytest.raises(ValueError):
            stream_stream_join(
                stream_events(spark, events_dir),
                stream_events(spark, events_dir),
                how="full_outer",
            )

    def test_sessionize_stream_runs(self, spark, events_dir):
        stream = stream_events(spark, events_dir)
        q = _run_stream(streaming_sessionize(stream), "sessions_t")
        rows = spark.sql("select * from sessions_t").collect()
        assert len(rows) > 0
        for r in rows:
            assert r.session_start <= r.session_end
        q.stop()


class TestStreamingDedup:
    def test_duplicate_delivery_deduped_to_batch_distinct(self, spark, events_dir):
        """At-least-once simulation: the same parquet file delivered twice
        (two triggers via maxFilesPerTrigger=1); dropDuplicatesWithinWatermark
        on event_id must reduce the stream to exactly the batch row set."""
        import shutil as _sh

        from ml_feature_store_spark.streaming import stream_events, streaming_dedup

        import os as _os

        redelivered = f"{events_dir}/events_redelivered.parquet"
        _sh.copy(f"{events_dir}/events.parquet", redelivered)
        try:
            stream = stream_events(spark, events_dir)
            out = streaming_dedup(stream, keys=["event_id"]).select("event_id")
            q = (
                out.writeStream.format("memory")
                .queryName("dedup_t")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            batch_n = spark.read.parquet(f"{events_dir}/events.parquet").count()
            rows = spark.sql(
                "select count(*) n, count(distinct event_id) d from dedup_t"
            ).collect()[0]
            assert rows.n == rows.d == batch_n
            q.stop()
        finally:
            # the fixture dir is module-scoped: leaving the duplicate file
            # would double every later test's stream input
            _os.remove(redelivered)


class TestStreamingDedupExpiry:
    def test_state_evicted_after_watermark_and_late_dup_dropped(self, spark):
        """The failure-mode contract dropDuplicatesWithinWatermark actually
        makes (sd4's docstring claim, pinned end-to-end over one shared
        checkpoint across three availableNow runs):

        1. a duplicate key arriving WITHIN the watermark delay is dropped;
        2. once the watermark passes a key's expiry, its dedup state is
           EVICTED — the same key re-arriving later is emitted AGAIN
           (this is what bounds state to O(rate x window) at 100 TB:
           dedup-forever would grow state without bound);
        3. a row arriving entirely BELOW the watermark is dropped outright
           (late-data exclusion, not just dedup)."""
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tempfile.mkdtemp(prefix="mlfs_dedupx_")
        ckpt = tempfile.mkdtemp(prefix="mlfs_dedupx_ckpt_")
        us = lambda h, m=0: (h * 3600 + m * 60) * 1_000_000  # noqa: E731

        def write(name, rows):
            t = pa.table(
                {
                    "k": pa.array([r[0] for r in rows], pa.string()),
                    "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                }
            )
            pq.write_table(t, os.path.join(d, name))

        got = []

        def run_once():
            stream = spark.readStream.schema("k string, ts timestamp").parquet(d)
            out = stream.withWatermark("ts", "30 minutes").dropDuplicatesWithinWatermark(
                ["k"]
            )
            q = (
                out.writeStream.foreachBatch(
                    lambda df, bid: got.extend(df.collect())
                )
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        # run 1: A and B arrive -> both emitted; watermark = 10:05 - 30m = 9:35
        write("b1.parquet", [("A", us(10, 0)), ("B", us(10, 5))])
        run_once()
        # run 2: duplicate A within the delay -> DROPPED (state live);
        # D at 13:00 advances the watermark to 12:30, past A's expiry
        write("b2.parquet", [("A", us(10, 10)), ("D", us(13, 0))])
        run_once()
        # run 3: A re-arrives AFTER its state was evicted -> emitted AGAIN;
        # C sits below the 12:30 watermark -> dropped outright
        write("b3.parquet", [("A", us(13, 10)), ("C", us(9, 0))])
        run_once()

        emissions = sorted((r["k"], r["ts"].hour, r["ts"].minute) for r in got)
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        assert emissions == [
            ("A", 10, 0),   # first arrival
            ("A", 13, 10),  # re-emitted: state evicted, NOT deduped forever
            ("B", 10, 5),
            ("D", 13, 0),
        ]
        # and the within-window duplicate (10:10) plus the late row (9:00)
        # appear nowhere
        assert ("A", 10, 10) not in emissions and ("C", 9, 0) not in emissions


class TestStreamingRegister:
    def test_foreachbatch_upsert_registers_versions(self, spark, events_dir):
        store = FeatureStore(spark, storage_path=tempfile.mkdtemp(prefix="mlfs_st_"))
        stream = stream_events(spark, events_dir)
        ck = tempfile.mkdtemp(prefix="mlfs_ck_")
        q = streaming_register(stream, store, "live_features", ck)
        q.awaitTermination(120)
        q.stop()

        info = store.get_table_info("live_features")
        assert info.version >= 1
        # snapshot semantics: exactly one row per entity (latest)
        snap = store._current("live_features")
        assert snap.count() == snap.select("entity_id").distinct().count()
        # and PIT get works over the streamed table
        import datetime as dt

        out = store.get("live_features", [0, 1], dt.datetime(2024, 2, 1))
        assert out.count() == 2


class TestStreamingRollupRefresh:
    def test_rollup_follows_streamed_appends(self, spark, events_dir):
        """Stream -> append versions -> incremental rollup refresh per
        micro-batch: the final rollup equals a from-scratch aggregate of
        everything streamed (mergeable state never rescans history)."""
        import shutil as _sh
        import tempfile as _tf

        from pyspark.sql import functions as F

        from ml_feature_store_spark import FeatureStore
        from ml_feature_store_spark.streaming import stream_events

        # second file => second micro-batch (maxFilesPerTrigger=1), so the
        # append + refresh path actually runs
        second = f"{events_dir}/events_b.parquet"
        _sh.copy(f"{events_dir}/events.parquet", second)
        try:
            self._run_and_check(spark, events_dir, _tf, F, FeatureStore, stream_events)
        finally:
            # the fixture dir is module-scoped: leaving the duplicate file
            # would double every later test's stream input
            import os as _os

            _os.remove(second)

    @staticmethod
    def _run_and_check(spark, events_dir, _tf, F, FeatureStore, stream_events):
        everything = spark.read.parquet(events_dir)
        fs = FeatureStore(spark)
        stream = stream_events(spark, events_dir)

        state = {"created": False}

        def upsert(batch_df, batch_id):
            if batch_df.isEmpty():
                return
            feats = batch_df.select(
                F.col("user_id").alias("entity_id"),
                F.col("ts").alias("timestamp"),
                "event_type",
                "value",
            )
            if not state["created"]:
                fs.register("st", feats)
                fs.create_rollup("st", "st_r", ["event_type"], ["value"])
                state["created"] = True
            else:
                fs.append("st", feats)
                fs.refresh_rollup("st_r")

        ckpt = _tf.mkdtemp(prefix="mlfs_ckpt_")
        q = (
            stream.writeStream.foreachBatch(upsert)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)

        got = {
            r.event_type: (r.n_rows, round(r.sum_value, 2), r.min_value, r.max_value)
            for r in fs.get_rollup("st_r").collect()
        }
        want = {
            r.event_type: (r.n, round(r.s, 2), r.lo, r.hi)
            for r in everything.groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                F.sum("value").alias("s"),
                F.min("value").alias("lo"),
                F.max("value").alias("hi"),
            )
            .collect()
        }
        assert got == want


class TestStatefulRunningFeatures:
    def test_running_features_match_batch(self, spark):
        """applyInPandasWithState over two micro-batches: the final per-user
        snapshot must equal the batch aggregate over all events."""
        import duckdb

        from ml_feature_store_spark.streaming import streaming_running_features
        from ml_feature_store_spark.suite import table

        # split events into two files -> two micro-batches with state carry-over
        d = tempfile.mkdtemp(prefix="mlfs_state_")
        con = duckdb.connect()
        # preserve the production layout: ts as an epoch-nanos BIGINT
        cols = "event_id, epoch_ns(ts) AS ts, user_id, event_type, value, props"
        con.execute(
            f"COPY (SELECT {cols} FROM '{SF}/events.parquet' WHERE event_id % 2 = 0) "
            f"TO '{d}/part0.parquet' (FORMAT PARQUET)"
        )
        con.execute(
            f"COPY (SELECT {cols} FROM '{SF}/events.parquet' WHERE event_id % 2 = 1) "
            f"TO '{d}/part1.parquet' (FORMAT PARQUET)"
        )

        stream = stream_events(spark, d)
        q = (
            streaming_running_features(stream)
            .writeStream.format("memory")
            .queryName("running_t")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

        # update mode appends a row per (user, batch); the final snapshot is
        # the one with the highest running count
        got = {
            r.user_id: (r.n_events, round(r.sum_value, 6), r.last_ts_us, r.last_value)
            for r in spark.sql(
                """
                SELECT user_id,
                       max_by(n_events, n_events) AS n_events,
                       max_by(sum_value, n_events) AS sum_value,
                       max_by(last_ts_us, n_events) AS last_ts_us,
                       max_by(last_value, n_events) AS last_value
                FROM running_t GROUP BY user_id
                """
            ).collect()
        }
        ev = table(spark, SF, "events").withColumn("ts_us", F.unix_micros("ts"))
        want = {
            r.user_id: (r.n, round(r.s, 6), r.lt, r.lv)
            for r in ev.groupBy("user_id")
            .agg(
                F.count("*").alias("n"),
                F.sum("value").alias("s"),
                F.max("ts_us").alias("lt"),
                F.max_by("value", "ts_us").alias("lv"),
            )
            .collect()
        }
        assert set(got) == set(want)
        for u in want:
            gn, gs, gt, gv = got[u]
            wn, ws, wt, wv = want[u]
            assert gn == wn and gt == wt
            assert abs(gs - ws) < 1e-6
            assert gv == wv
        shutil.rmtree(d, ignore_errors=True)


class TestWatermarkLateData:
    def test_late_rows_dropped_open_windows_held(self, spark):
        """Append-mode watermark contract, pinned end-to-end: a row arriving
        after the watermark passed its window is DROPPED (the reference's
        'recompute next batch' answer to late data, README.md:142, becomes
        a state-store guarantee here); windows still inside the watermark
        are held back, not emitted half-full. Two availableNow runs over a
        shared checkpoint force the late file into its own micro-batch
        with the advanced watermark."""
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tempfile.mkdtemp(prefix="mlfs_late_")
        ckpt = tempfile.mkdtemp(prefix="mlfs_late_ckpt_")
        us = lambda h, m=0: (h * 3600 + m * 60) * 1_000_000  # noqa: E731

        def write(name, rows):
            t = pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([1] * len(rows), pa.int64()),
                }
            )
            pq.write_table(t, os.path.join(d, name))

        got = []

        def run_once():
            schema = "event_id long, ts timestamp, user_id long"
            stream = spark.readStream.schema(schema).parquet(d)
            agg = (
                stream.withWatermark("ts", "30 minutes")
                .groupBy(F.window("ts", "1 hour").alias("w"))
                .agg(F.count("*").alias("n"), F.collect_set("event_id").alias("ids"))
            )
            q = (
                agg.writeStream.foreachBatch(
                    lambda df, bid: got.extend(df.collect())
                )
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        # run 1: on-time rows 10:00-12:00 -> final watermark 11:30;
        # window 10 (end 11:00 < 11:30) emits, window 11 stays open
        write("a.parquet", [(1, us(10, 15)), (2, us(10, 45)), (3, us(11, 15)), (4, us(12, 0))])
        run_once()
        # run 2 (same checkpoint -> watermark 11:30 carried over): one LATE
        # row (09:10, window end 10:00 < watermark -> dropped) and one
        # on-time row (12:30) -> watermark advances to 12:00, window 11
        # emits, window 12 stays open
        write("b.parquet", [(5, us(9, 10)), (6, us(12, 30))])
        run_once()

        out = {r["w"]["start"].hour: (r["n"], sorted(r["ids"])) for r in got}
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        # the late 09:00 window must not exist: its only row was dropped
        assert 9 not in out
        # closed windows emitted exactly once with on-time rows only
        assert out[10] == (2, [1, 2])
        assert out[11] == (1, [3])
        # 12:00 window (rows 4, 6) is still open at final watermark 12:00
        # (append emits strictly after watermark PASSES window end)
        assert 12 not in out


class TestStreamingAppendMode:
    def test_append_mode_keeps_history_across_batches(self, spark):
        """mode='append': each micro-batch append-registers verbatim, so
        the streamed table answers PIT queries at ANY cutoff — values from
        batch 1 remain visible below batch 2's timestamps. Two availableNow
        runs over one checkpoint force two separate micro-batches."""
        import datetime as dt
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        from ml_feature_store_spark.streaming import stream_events, streaming_register

        d = tempfile.mkdtemp(prefix="mlfs_sappend_")
        ckpt = tempfile.mkdtemp(prefix="mlfs_sappend_ckpt_")
        ns = lambda day: int(  # noqa: E731
            dt.datetime(2024, 1, day).timestamp() * 1_000_000_000
        )

        def write(name, rows):
            t = pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array([ns(r[1]) for r in rows], pa.int64()),
                    "user_id": pa.array([r[2] for r in rows], pa.int64()),
                    "event_type": pa.array(["e"] * len(rows)),
                    "value": pa.array([r[3] for r in rows], pa.float64()),
                    "props": pa.array(["{}"] * len(rows)),
                }
            )
            pq.write_table(t, os.path.join(d, name))

        fs = FeatureStore(spark)

        def run_once():
            q = streaming_register(
                stream_events(spark, d), fs, "streamed", ckpt, mode="append"
            )
            q.awaitTermination(120)

        write("a.parquet", [(1, 5, 7, 1.0), (2, 10, 7, 2.0)])
        run_once()
        write("b.parquet", [(3, 20, 7, 3.0)])
        run_once()

        assert fs.get_table_info("streamed").version == 2
        assert fs.get_table_info("streamed").row_count == 3
        # PIT at day 12: batch-1 value still wins below batch-2 timestamps
        got = fs.get("streamed", [7], dt.datetime(2024, 1, 12)).collect()[0]
        assert got["value"] == 2.0
        got = fs.get("streamed", [7], dt.datetime(2024, 1, 25)).collect()[0]
        assert got["value"] == 3.0

        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


class TestStreamStaticEnrich:
    def test_matches_batch_join(self, spark, events_dir):
        from ml_feature_store_spark.streaming import stream_events, stream_static_enrich
        from ml_feature_store_spark.suite import table

        dim = (
            table(spark, SF, "events")
            .groupBy("user_id")
            .agg(F.count("*").alias("user_total"))
        )
        stream = stream_events(spark, events_dir)
        q = _run_stream(
            stream_static_enrich(stream, dim).groupBy("user_total").agg(
                F.count("*").alias("n")
            ),
            "enrich_t",
        )
        got = {
            (r.user_total, r.n)
            for r in spark.sql("select * from enrich_t").collect()
        }
        # batch twin over the SAME directory (other tests may have added
        # redelivery files — stream==batch must hold regardless)
        ev = spark.read.parquet(events_dir)
        want = {
            (r.user_total, r.n)
            for r in ev.join(dim, "user_id")
            .groupBy("user_total")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert got == want


class TestExactlyOnceSink:
    def _run(self, stream, store, name, idempotent):
        ck = tempfile.mkdtemp(prefix="mlfs_ck_")
        q = streaming_register(
            stream, store, name, ck, mode="append", idempotent=idempotent
        )
        q.awaitTermination(120)
        q.stop()

    def test_replayed_batch_skipped(self, spark, events_dir):
        """A fresh checkpoint re-delivers the same files as micro-batch 0 —
        exactly the foreachBatch replay case. The version-metadata batch
        marker must make the second delivery a no-op."""
        store = FeatureStore(spark, storage_path=tempfile.mkdtemp(prefix="mlfs_eo_"))
        stream = stream_events(spark, events_dir)
        self._run(stream, store, "eo", idempotent=True)
        v1 = store.get_table_info("eo").version
        n1 = store._current("eo").count()
        self._run(stream_events(spark, events_dir), store, "eo", idempotent=True)
        assert store.get_table_info("eo").version == v1  # no new version
        assert store._current("eo").count() == n1  # no duplicated history

    def test_non_idempotent_sink_duplicates_on_replay(self, spark, events_dir):
        """Control: with the marker check off, the replay double-appends —
        the failure mode idempotent=True exists to prevent."""
        store = FeatureStore(spark, storage_path=tempfile.mkdtemp(prefix="mlfs_eo2_"))
        self._run(stream_events(spark, events_dir), store, "eo2", idempotent=False)
        n1 = store._current("eo2").count()
        self._run(stream_events(spark, events_dir), store, "eo2", idempotent=False)
        assert store._current("eo2").count() == 2 * n1

    def test_marker_recorded_in_version_metadata(self, spark, events_dir):
        store = FeatureStore(spark, storage_path=tempfile.mkdtemp(prefix="mlfs_eo3_"))
        self._run(stream_events(spark, events_dir), store, "eo3", idempotent=True)
        descs = [
            rec.description
            for rec in store._backend.meta("eo3").versions.values()
        ]
        assert any(d.startswith("stream batch ") for d in descs)


class TestStatefulSessionize:
    def test_streaming_sessions_match_batch_sessionize(self, spark):
        """The applyInPandasWithState gap-fold over two time-split
        micro-batches must equal the batch sessionize window plan —
        including sessions that SPAN the batch boundary (state
        carry-over) and sessions split by it (gap check against the
        carried last_ts)."""
        from ml_feature_store_spark.operators.sessionize import sessionize
        from ml_feature_store_spark.streaming import stream_events
        from ml_feature_store_spark.streaming.stateful import streaming_session_counts
        from ml_feature_store_spark.suite import _write_ordered_feed, table

        d = tempfile.mkdtemp(prefix="mlfs_sess_")
        ev = table(spark, SF, "events").select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        )
        mid = F.lit("2024-01-16").cast("timestamp")
        _write_ordered_feed(
            d, ev.filter(F.col("ts") < mid), ev.filter(F.col("ts") >= mid)
        )

        q = (
            streaming_session_counts(stream_events(spark, d))
            .writeStream.format("memory")
            .queryName("sess_t")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        got = {
            r.user_id: (r.n_sessions, r.n_events)
            for r in spark.sql(
                """
                SELECT user_id, max_by(n_sessions, n_events) AS n_sessions,
                       max(n_events) AS n_events
                FROM sess_t GROUP BY user_id
                """
            ).collect()
        }
        batch = sessionize(table(spark, SF, "events"))
        want = {
            r.user_id: (r.n_sessions, r.n_events)
            for r in batch.groupBy("user_id")
            .agg(
                F.max("session_id").alias("n_sessions"),
                F.count("*").alias("n_events"),
            )
            .collect()
        }
        assert got == want


class TestTransformWithState:
    def test_record_tracker_matches_ordered_batch_replay(self, spark):
        """TWS (Spark 4 typed-state API) witness: per-user record counter
        whose output depends on fold order — proves micro-batches flow
        through the typed ValueState in sequence. ENV-GATED: the TWS
        state protocol needs protobuf, absent in this container (same
        documented class as delta-spark/Avro); the test activates
        wherever the dependency exists."""
        pytest.importorskip(
            "google.protobuf",
            reason="transformWithState's state protocol requires protobuf "
            "(env-blocked here; see streaming/stateful.py docstring)",
        )
        import tempfile as _tf

        from ml_feature_store_spark.streaming.stateful import (
            streaming_record_tracker,
        )
        from ml_feature_store_spark.suite_common import _write_ordered_feed

        prior = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        from ml_feature_store_spark.sources.testdata import load_table
        from ml_feature_store_spark.streaming.ingest import stream_events as _se

        ev = load_table(spark, "events", SF).select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        )
        d = _tf.mkdtemp(prefix="mlfs_tws_")
        try:
            _write_ordered_feed(
                d,
                ev.filter(F.col("event_id") % 2 == 0),
                ev.filter(F.col("event_id") % 2 == 1),
            )
            stream = _se(spark, d)
            q = (
                streaming_record_tracker(stream)
                .writeStream.format("memory")
                .queryName("tws_records")
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
            q.stop()
            got = {
                r["user_id"]: (r["n_events"], r["n_records"], r["max_cents"])
                for r in spark.table("tws_records")
                .groupBy("user_id")
                .agg(
                    F.max("n_events").alias("n_events"),
                    F.max_by("n_records", "n_events").alias("n_records"),
                    F.max_by("max_cents", "n_events").alias("max_cents"),
                )
                .collect()
            }
            # batch replay in fold order (batch parity, ts_us, event_id)
            rows = ev.select(
                "user_id",
                (F.col("event_id") % 2).alias("b"),
                F.unix_micros("ts").alias("ts_us"),
                "event_id",
                F.floor(F.col("value") * 100 + F.lit(0.5))
                .cast("long")
                .alias("cents"),
            ).collect()
            want = {}
            for r in sorted(rows, key=lambda r: (r["b"], r["ts_us"], r["event_id"])):
                n, rec, mx = want.get(r["user_id"], (0, 0, None))
                n += 1
                if mx is None or r["cents"] > mx:
                    mx, rec = r["cents"], rec + 1
                want[r["user_id"]] = (n, rec, mx)
            assert got == want
        finally:
            shutil.rmtree(d, ignore_errors=True)
            if prior is not None:
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", prior
                )


class TestIncrementalBackfill:
    def test_second_run_processes_only_new_files(self, spark, tmp_path):
        """The sd10 contract at unit scale: availableNow + a shared
        checkpoint makes run 2 ingest ONLY files landed after run 1 —
        the sink never double-counts run-1 input (exactly-once across
        restarts), and the increment is priced at the new file."""
        import pyspark.sql.functions as F

        from ml_feature_store_spark.streaming import stream_events

        feed = str(tmp_path / "feed")
        ck = str(tmp_path / "ck")
        sink = str(tmp_path / "sink")
        from ml_feature_store_spark.suite import table

        base = table(spark, SF, "events").select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        ).limit(100)
        base.filter(F.col("event_id") % 2 == 0).write.mode("append").parquet(feed)

        def run_once():
            q = (
                stream_events(spark, feed)
                .select("event_id", "ts", "user_id", "event_type", "value")
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ck)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            q.stop()

        run_once()
        n1 = spark.read.parquet(sink).count()
        base.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(feed)
        run_once()
        out = spark.read.parquet(sink)
        assert out.count() == base.count()  # no double-ingest of run-1 files
        assert out.select("event_id").distinct().count() == base.count()
        assert n1 == base.filter(F.col("event_id") % 2 == 0).count()


class TestRocksDBStateStore:
    """The PRODUCTION state backend at 100 TB: Spark's bundled RocksDB
    state store (+ changelog checkpointing) keeps streaming state
    off-heap and incremental-checkpoint-sized — HDFSBackedStateStore
    holds every key in executor memory, which caps state at heap size.
    Round-8: witness that the suite's stateful plans run unchanged and
    bit-equal under the RocksDB provider (the conf is the only delta —
    exactly what a cluster deployment flips)."""

    ROCKS = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )

    @pytest.fixture
    def rocksdb_conf(self, spark):
        prov = "spark.sql.streaming.stateStore.providerClass"
        clog = (
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled"
        )
        old = spark.conf.get(prov, None)
        spark.conf.set(prov, self.ROCKS)
        spark.conf.set(clog, "true")
        yield
        spark.conf.unset(clog)
        if old is None:
            spark.conf.unset(prov)
        else:
            spark.conf.set(prov, old)

    def test_windowed_agg_matches_batch_under_rocksdb(
        self, spark, events_dir, rocksdb_conf
    ):
        stream = stream_events(spark, events_dir)
        q = _run_stream(streaming_feature_agg(stream), "rocks_tumbling")
        got = {
            (r.window_start, r.event_type): (r.n_events, r.sum_value)
            for r in spark.sql("select * from rocks_tumbling").collect()
        }
        from ml_feature_store_spark.suite import table

        ev = table(spark, SF, "events")
        want = {
            (r.ws, r.event_type): (r.n, r.s)
            for r in ev.groupBy(
                F.window("ts", "1 day").alias("w"), "event_type"
            )
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s"))
            .select(F.col("w.start").alias("ws"), "event_type", "n", "s")
            .collect()
        }
        assert got == want
        q.stop()

    def test_rocksdb_changelog_artifacts_written(
        self, spark, events_dir, rocksdb_conf
    ):
        """Proof the RocksDB provider actually ran: changelog
        checkpointing leaves N.changelog files in the state dir (the
        HDFS-backed provider writes .delta/.snapshot instead)."""
        import glob
        import os

        ckpt = tempfile.mkdtemp(prefix="mlfs_rocks_ckpt_")
        try:
            stream = stream_events(spark, events_dir)
            q = (
                streaming_feature_agg(stream)
                .writeStream.format("memory")
                .queryName("rocks_ckpt_t")
                .outputMode("complete")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            q.stop()
            state_files = [
                os.path.basename(p)
                for p in glob.glob(f"{ckpt}/state/**/*", recursive=True)
                if os.path.isfile(p)
            ]
            assert any(f.endswith(".changelog") for f in state_files), (
                state_files
            )
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)


class TestPythonStreamSource:
    def test_offset_replay_contract(self):
        """readBetweenOffsets(start, end) must reproduce exactly the
        rows the read() chain emitted between those offsets — the
        recovery property that makes the journaled offsets
        exactly-once."""
        from ml_feature_store_spark.sources.pyds import (
            SyntheticStreamReader,
        )

        r = SyntheticStreamReader({"rowsperbatch": "7", "maxrows": "20"})
        off = r.initialOffset()
        chain, offsets = [], [off]
        while True:
            rows, nxt = r.read(offsets[-1])
            rows = list(rows)
            if not rows:
                break
            chain.extend(rows)
            offsets.append(nxt)
        assert len(chain) == 20 and offsets[-1] == {"i": 20}
        # replay any adjacent slice
        for a, b in zip(offsets, offsets[1:]):
            assert list(r.readBetweenOffsets(a, b)) == chain[
                int(a["i"]):int(b["i"])
            ]
        # caught-up read returns no rows and does not advance
        rows, same = r.read({"i": 20})
        assert list(rows) == [] and same == {"i": 20}

    def test_stream_source_end_to_end(self, spark):
        from pyspark.sql import functions as F  # noqa: F811

        from ml_feature_store_spark.sources.pyds import (
            SyntheticStreamDataSource,
        )

        try:
            spark.dataSource.register(SyntheticStreamDataSource)
        except Exception:
            pass
        stream = (
            spark.readStream.format("synthetic_stream")
            .option("rowsperbatch", 500)
            .option("maxrows", 1000)
            .load()
        )
        q = (
            stream.groupBy().agg(
                F.count("*").alias("n"), F.sum("i").alias("s")
            )
            .writeStream.format("memory")
            .queryName("pys_unit")
            .outputMode("complete")
            .start()
        )
        import time as _t

        deadline = _t.time() + 180
        while _t.time() < deadline:
            try:
                row = spark.sql("select * from pys_unit").collect()
            except Exception:
                row = []
            if row and row[0]["n"] == 1000:
                break
            _t.sleep(0.5)
        q.stop()
        row = spark.sql("select * from pys_unit").collect()[0]
        assert row["n"] == 1000 and row["s"] == 999 * 1000 // 2
