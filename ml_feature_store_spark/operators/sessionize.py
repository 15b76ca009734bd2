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


def sessionize_bucketed(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    session_col: str = "session_id",
    bucket_seconds: int = 24 * 3600,
) -> DataFrame:
    """Skew-safe sessionize: identical output to :func:`sessionize`, but no
    task ever sorts more than one (entity, time-bucket) of data.

    ``sessionize`` windows by entity alone, so a hot entity (billions of
    events) serializes into one task. Here:

    1. events sessionize *within* (entity, bucket) — bounded local sort;
    2. a per-bucket summary (local session count, first/last event time —
       one row per entity-bucket, partial-aggregated) decides for each
       boundary whether the bucket's first session continues the previous
       non-empty bucket's last session (gap <= threshold, empty buckets
       skipped naturally by ordering over buckets *with* data);
    3. global id = local id + (sessions in earlier buckets) - (bridged
       boundaries so far) — each bridge merges exactly one boundary pair,
       and chains of bridged buckets telescope correctly.

    Extra cost vs ``sessionize``: one partial-agg shuffle and one
    co-partitioned join, both over per-bucket cardinality, not events.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    bucket_us = int(bucket_seconds) * 1_000_000
    ts_us = F.unix_micros(F.col(ts_col))

    ev = df.withColumn("__ts_us__", ts_us).withColumn(
        "__bkt__", F.floor(F.col("__ts_us__") / F.lit(bucket_us))
    )
    wa = Window.partitionBy(entity_col, "__bkt__").orderBy("__ts_us__")
    new_local = F.when(
        F.col("__ts_us__") - F.lag("__ts_us__").over(wa) > gap_us, 1
    ).otherwise(F.when(F.lag("__ts_us__").over(wa).isNull(), 1).otherwise(0))
    run = wa.rowsBetween(Window.unboundedPreceding, 0)
    local = ev.withColumn("__new__", new_local).withColumn(
        "__local_id__", F.sum("__new__").over(run)
    )

    bstats = local.groupBy(entity_col, "__bkt__").agg(
        F.max("__local_id__").alias("__n_sess__"),
        F.min("__ts_us__").alias("__first__"),
        F.max("__ts_us__").alias("__last__"),
    )
    wb = Window.partitionBy(entity_col).orderBy("__bkt__")
    prev_last = F.lag("__last__").over(wb)
    bridged = bstats.withColumn(
        "__bridge__",
        F.when(F.col("__first__") - prev_last <= gap_us, 1).otherwise(0),
    )
    offsets = bridged.select(
        entity_col,
        "__bkt__",
        F.coalesce(
            F.sum("__n_sess__").over(wb.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__before__"),
        F.sum("__bridge__")
        .over(wb.rowsBetween(Window.unboundedPreceding, 0))
        .alias("__bridges__"),
    )

    out = local.join(offsets, [entity_col, "__bkt__"]).withColumn(
        session_col,
        (F.col("__local_id__") + F.col("__before__") - F.col("__bridges__")).cast("long"),
    )
    return out.drop(
        "__ts_us__", "__bkt__", "__new__", "__local_id__", "__before__", "__bridges__"
    )


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


def register_session_gaps_udtf(spark) -> str:
    """Register the ``session_gaps`` Python UDTF (Spark 4 ``@udtf`` with a
    TABLE argument) and return its SQL name.

    The REAL user-defined-table-function surface — distinct from the
    mapInArrow generator in operators/text.py token_runs: a class-based
    UDTF invoked from SQL as ``session_gaps(TABLE(v) PARTITION BY user
    ORDER BY ts)``, where Catalyst plans the partitioning (one shuffle on
    the key, Arrow-batched rows into a per-partition Python instance) and
    the class folds state row-by-row, emitting on ``terminate()``. This is
    the escape hatch for per-entity sequential logic that window functions
    cannot express; for anything a window CAN express (like this demo's
    gap stats — see ``sessionize``) the declarative form is the production
    path, which is exactly what the oracle twin proves.

    Contract: input rows (user_id BIGINT, us BIGINT ascending within the
    partition); output one row per partition: n_events, n_sessions
    (30-minute gap rule, >= 1), max_gap_us (0 for single-event users).
    All-BIGINT output keeps the cross-engine schema gate type-stable.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id: bigint, n_events: bigint, n_sessions: bigint, max_gap_us: bigint")
    class SessionGaps:
        GAP_US = 30 * 60 * 1_000_000

        def __init__(self) -> None:
            self.uid = None
            self.prev = None
            self.n = 0
            self.breaks = 0
            self.max_gap = 0

        def eval(self, row) -> None:
            self.uid = row["user_id"]
            self.n += 1
            t = row["us"]
            if self.prev is not None:
                gap = t - self.prev
                if gap > self.GAP_US:
                    self.breaks += 1
                if gap > self.max_gap:
                    self.max_gap = gap
            self.prev = t

        def terminate(self):
            if self.n:
                yield (self.uid, self.n, 1 + self.breaks, self.max_gap)

    spark.udtf.register("session_gaps", SessionGaps)
    return "session_gaps"
