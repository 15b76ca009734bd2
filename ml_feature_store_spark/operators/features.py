"""Point-in-time windowed feature aggregation.

``get_training_set`` (operators/asof.py) answers "the latest feature row
as of each spine timestamp"; this module answers the other canonical
training question: "aggregates of the trailing window as of each spine
timestamp" — e.g. purchase count / spend sum over the 7 days before each
label event. The leakage rule is identical to the as-of join: only rows
with ``feature.ts <= spine.ts`` may contribute.

Spark-first shape (union + range frame, NO join):
    tag feature and spine rows, union, and compute each trailing window
    as a ``rangeBetween`` frame over event-time per entity — feature
    payloads are NULL on spine rows, and sum/count/avg ignore NULLs, so
    spine rows see exactly the feature rows in their window. ONE shuffle
    + ONE sort for ANY number of windows and aggregates (all frames
    share the partition/order spec); no row explosion at any fan-out
    (a join formulation multiplies spine x window rows before
    re-aggregating). Hot entities: same caveat as the union as-of join —
    a per-entity sort serializes per entity; see asof.py's
    ``union_bucketed`` for the bucketing recipe when one entity owns
    billions of rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .pit import ENTITY_COL, TIMESTAMP_COL

_US_PER_SEC = 1_000_000


def pit_window_agg(
    spine: DataFrame,
    features: DataFrame,
    value_col: str,
    window_seconds: Sequence[int] = (7 * 86400,),
    entity_col: str = ENTITY_COL,
    ts_col: str = TIMESTAMP_COL,
    include_equal: bool = True,
) -> DataFrame:
    """For each spine (entity, ts) row: count / sum / min / max of
    ``value_col`` over each trailing window ``(ts - w, ts]``.

    Output = spine columns + per-window ``n_<w>s``, ``sum_<w>s``,
    ``min_<w>s``, ``max_<w>s`` (NULL min/max and 0 n/sum when the window
    is empty — the training-pipeline convention for "no history").
    ``include_equal=False`` switches the upper bound to ``< ts``
    (exclusive: the spine event itself never contributes even when it is
    also a feature row at the same timestamp — note this excludes ALL
    equal-timestamp feature rows).
    """
    # spine passthrough columns (labels, ids) ride along in a struct that
    # is NULL on feature rows and re-expanded after the windows
    extra = [c for c in spine.columns if c not in (entity_col, ts_col)]
    s_payload = (
        F.struct(*[F.col(c) for c in extra]) if extra else F.struct(F.lit(0).alias("_"))
    )
    s_tagged = spine.select(
        F.col(entity_col),
        F.unix_micros(F.col(ts_col)).alias("__t__"),
        F.lit(1).alias("__is_spine__"),
        F.lit(None).cast("double").alias("__v__"),
        s_payload.alias("__sp__"),
    )
    f_tagged = features.select(
        F.col(entity_col),
        F.unix_micros(F.col(ts_col)).alias("__t__"),
        F.lit(0).alias("__is_spine__"),
        F.col(value_col).cast("double").alias("__v__"),
        F.lit(None).cast(s_tagged.schema["__sp__"].dataType).alias("__sp__"),
    )
    unioned = f_tagged.unionByName(s_tagged)

    upper = 0 if include_equal else -1
    out = unioned
    cols = []
    for w in window_seconds:
        frame = (
            Window.partitionBy(entity_col)
            .orderBy("__t__")
            .rangeBetween(-(w * _US_PER_SEC) + 1 + upper, upper)
        )
        tag = f"{w}s"
        out = (
            out.withColumn(f"n_{tag}", F.count("__v__").over(frame).cast("long"))
            .withColumn(f"sum_{tag}", F.coalesce(F.sum("__v__").over(frame), F.lit(0.0)))
            .withColumn(f"min_{tag}", F.min("__v__").over(frame))
            .withColumn(f"max_{tag}", F.max("__v__").over(frame))
        )
        cols += [f"n_{tag}", f"sum_{tag}", f"min_{tag}", f"max_{tag}"]
    return out.filter(F.col("__is_spine__") == 1).select(
        F.col(entity_col),
        F.timestamp_micros(F.col("__t__")).alias(ts_col),
        *[F.col(f"__sp__.{c}").alias(c) for c in extra],
        *cols,
    )
