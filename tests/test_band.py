"""band_join_bucketed == the naive band join, including bucket-boundary
and band-edge cases the bucketing could plausibly break."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ml_feature_store_spark.operators.band import band_join_bucketed

HOUR_US = 3_600_000_000
BAND_US = 2 * HOUR_US


def _frames(spark):
    # Events engineered around the 2h bucket grid (epoch-aligned): exact
    # bucket boundaries, exact band edges, same-instant event-vs-spine,
    # multi-entity, and an entity with no events in any band.
    base = int(dt.datetime(2024, 1, 1).timestamp() * 1_000_000)
    # align to the bucket grid so offsets below are boundary-exact
    base -= base % BAND_US
    ev_rows = [
        (u, dt.datetime.fromtimestamp((base + o) / 1e6, dt.UTC).replace(tzinfo=None), o)
        for u, offs in {
            1: [0, 1, HOUR_US, BAND_US - 1, BAND_US, BAND_US + 1, 3 * HOUR_US],
            2: [HOUR_US, 5 * HOUR_US],
        }.items()
        for o in offs
    ]
    spine_rows = [
        (1, ev_rows[4][1], 100),   # exactly on a bucket boundary
        (1, ev_rows[5][1], 101),   # one us past it
        (2, ev_rows[-1][1], 200),
        (3, ev_rows[0][1], 300),   # entity with no events at all
    ]
    ev = spark.createDataFrame(
        [(u, t, float(o % 97)) for (u, t, o) in ev_rows],
        ["user_id", "ets", "val"],
    )
    spine = spark.createDataFrame(spine_rows, ["user_id", "sts", "spine_id"])
    return spine, ev


def _naive(spine, ev, direction):
    s, e = spine.alias("s"), ev.alias("e")
    st, et = F.unix_micros(F.col("s.sts")), F.unix_micros(F.col("e.ets"))
    band = (
        (et <= st) & (et > st - F.lit(BAND_US))
        if direction == "backward"
        else (et > st) & (et <= st + F.lit(BAND_US))
    )
    j = s.join(e, (F.col("s.user_id") == F.col("e.user_id")) & band, "left")
    return j.groupBy("s.user_id", "s.spine_id").agg(
        F.count("e.val").alias("n"),
        F.coalesce(F.round(F.sum("e.val"), 6), F.lit(0.0)).alias("sv"),
    )


def _bucketed(spine, ev, direction):
    j = band_join_bucketed(
        spine, ev, keys="user_id", spine_ts="sts", event_ts="ets",
        band_us=BAND_US, direction=direction,
    )
    return j.groupBy("user_id", "spine_id").agg(
        F.count("val").alias("n"),
        F.coalesce(F.round(F.sum("val"), 6), F.lit(0.0)).alias("sv"),
    )


def test_backward_equals_naive(spark):
    spine, ev = _frames(spark)
    got = {tuple(r) for r in _bucketed(spine, ev, "backward").collect()}
    want = {tuple(r) for r in _naive(spine, ev, "backward").collect()}
    assert got == want
    # the no-event entity must still surface as a zero row (left semantics)
    assert (3, 300, 0, 0.0) in got


def test_forward_equals_naive(spark):
    spine, ev = _frames(spark)
    got = {tuple(r) for r in _bucketed(spine, ev, "forward").collect()}
    want = {tuple(r) for r in _naive(spine, ev, "forward").collect()}
    assert got == want


def test_column_overlap_rejected(spark):
    spine, ev = _frames(spark)
    bad = ev.withColumnRenamed("ets", "sts")  # collides with spine ts
    try:
        band_join_bucketed(spine, bad, keys="user_id", spine_ts="sts",
                           event_ts="sts", band_us=BAND_US)
        raise AssertionError("expected ValueError on column overlap")
    except ValueError as exc:
        assert "overlap" in str(exc)
