"""Ordered multi-step funnel analysis over an event stream.

The reference engine's surface stops at point-in-time feature retrieval
(reference store.py:218-259); a production event store is also asked the
sequential question — "of the users who did A, how many then did B, and
then C, in that order, within a conversion window?" This module answers
it with the canonical Spark shape:

    ONE shuffle (hash-partition by entity), then a chain of window
    minimums — step k's reach time is the earliest step-k event at or
    after the step-(k-1) reach time (and, when a horizon is given,
    within ``horizon`` of funnel entry). Each window min is a constant
    per entity, so the per-entity summary ``groupBy`` that follows
    reuses the same hash partitioning: Catalyst plans NO second
    exchange.

Why not collect each user's events into an array and fold?  The window
chain never materialises a per-entity buffer, so one pathological entity
with 10^9 events costs a sort, not an OOM — same skew posture as the
as-of join's union strategy (asof.py). Timestamps are compared as
``unix_micros`` longs, so reach times and dwell sums are exact integers
(engine-portable: the DuckDB oracle reproduces them bit-for-bit).

At 100 TB: events are filtered to the funnel's step types *before* the
shuffle (a pushable ``IN`` predicate — non-step events never leave the
scan), and the shuffled payload is three columns (entity, step index,
µs). The result is one row per entity regardless of event volume.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_US_PER_SEC = 1_000_000


def funnel_reach(
    events: DataFrame,
    steps: Sequence[str],
    entity_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
    horizon_seconds: int | None = None,
) -> DataFrame:
    """One row per entity that entered the funnel (did ``steps[0]``),
    with ``reach_us_<k>`` = µs timestamp the entity first completed step
    k *in order* (NULL once a step is never reached) and ``stage`` = the
    number of consecutive steps completed (1..len(steps)).

    ``horizon_seconds`` bounds the whole conversion: every later step
    must occur within the horizon of funnel entry (the step-0 time).
    """
    if len(steps) < 2:
        raise ValueError(f"a funnel needs >= 2 steps, got {list(steps)}")
    ts_us = F.unix_micros(F.col(ts_col))
    # Pushable pre-filter: only funnel steps survive the scan.
    ev = events.filter(F.col(step_col).isin(*steps)).select(
        F.col(entity_col).alias("__e__"),
        F.col(step_col).alias("__s__"),
        ts_us.alias("__t__"),
    )
    w = Window.partitionBy("__e__")
    out = ev.withColumn(
        "reach_us_0", F.min(F.when(F.col("__s__") == steps[0], F.col("__t__"))).over(w)
    )
    for k in range(1, len(steps)):
        cond = (F.col("__s__") == steps[k]) & (
            F.col("__t__") >= F.col(f"reach_us_{k - 1}")
        )
        if horizon_seconds is not None:
            cond = cond & (
                F.col("__t__") <= F.col("reach_us_0") + horizon_seconds * _US_PER_SEC
            )
        out = out.withColumn(
            f"reach_us_{k}", F.min(F.when(cond, F.col("__t__"))).over(w)
        )
    reach_cols = [f"reach_us_{k}" for k in range(len(steps))]
    # Window values are constant per entity: first() under the same
    # partitioning collapses to one row per entity with no new exchange.
    per_entity = (
        out.filter(F.col("reach_us_0").isNotNull())
        .groupBy(F.col("__e__").alias(entity_col))
        .agg(*[F.first(c).alias(c) for c in reach_cols])
    )
    stage = F.lit(1)
    for k in range(1, len(steps)):
        # consecutive-prefix count: stage k requires every earlier stage
        stage = stage + F.when(
            F.coalesce(*[F.col(f"reach_us_{j}").isNull() for j in range(1, k + 1)][::-1])
            if False
            else sum(
                F.when(F.col(f"reach_us_{j}").isNull(), 1).otherwise(0)
                for j in range(1, k + 1)
            )
            == 0,
            1,
        ).otherwise(0)
    # simpler and equivalent: stage = count of non-null prefix
    stage = F.lit(0)
    prefix_alive = F.lit(True)
    for k in range(len(steps)):
        prefix_alive = prefix_alive & F.col(f"reach_us_{k}").isNotNull()
        stage = stage + F.when(prefix_alive, 1).otherwise(0)
    return per_entity.withColumn("stage", stage.cast("int"))


def funnel_summary(
    events: DataFrame,
    steps: Sequence[str],
    entity_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
    horizon_seconds: int | None = None,
) -> DataFrame:
    """Per-step conversion table: ``step_idx``, ``step``, ``n_entities``
    that reached the step in order, and ``sum_us_to_reach`` (total µs
    from funnel entry — exact integer, so engine-portable).

    Shape: ``funnel_reach`` (one shuffle) then a stack + tiny global
    agg over len(steps) rows per entity.
    """
    reach = funnel_reach(
        events, steps, entity_col, ts_col, step_col, horizon_seconds
    )
    stacked = reach.select(
        F.col(entity_col),
        F.col("reach_us_0"),
        F.stack(
            len(steps),
            *[
                x
                for k, s in enumerate(steps)
                for x in (F.lit(k), F.lit(s), F.col(f"reach_us_{k}"))
            ],
        ).alias("step_idx", "step", "reach_us"),
    )
    return (
        stacked.filter(F.col("reach_us").isNotNull())
        .groupBy("step_idx", "step")
        .agg(
            F.count("*").alias("n_entities"),
            F.sum(F.col("reach_us") - F.col("reach_us_0")).alias("sum_us_to_reach"),
        )
    )
