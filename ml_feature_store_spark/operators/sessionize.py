"""Sessionization: gap-based session assignment over event streams.

Batch: classic lag/cumsum — one shuffle on the entity key, then two
window passes over the same partitioning (Spark reuses the sort).
Streaming: ``session_window`` in streaming/ingest.py shares the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign a per-entity session id; a new session starts when the gap
    from the previous event exceeds ``gap_minutes``.

    Both window functions share partitioning AND ordering, so Catalyst
    plans a single exchange + single sort for the whole operator.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    ts_us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(entity_col).orderBy(ts_us)
    new_sess = F.when(ts_us - F.lag(ts_us).over(w) > gap_us, 1).otherwise(
        F.when(F.lag(ts_us).over(w).isNull(), 1).otherwise(0)
    )
    run = Window.partitionBy(entity_col).orderBy(ts_us).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn("__new__", new_sess).withColumn(
        session_col, F.sum("__new__").over(run)
    ).drop("__new__")


def session_stats(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-entity session summary: session count, events/session, mean
    session duration (seconds)."""
    s = sessionize(df, entity_col, ts_col, gap_minutes)
    per_session = s.groupBy(entity_col, "session_id").agg(
        F.count("*").alias("n_events"),
        (
            (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))) / 1_000_000.0
        ).alias("duration_s"),
    )
    return per_session.groupBy(entity_col).agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.round(F.avg("n_events"), 4).alias("avg_events_per_session"),
        F.round(F.avg("duration_s"), 4).alias("avg_duration_s"),
    )
