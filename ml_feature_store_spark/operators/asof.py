"""Distributed as-of (backward) join.

The reference's ``get_training_set`` is a Python loop over spine rows with a
full-table boolean mask per row — O(|spine| x |table|)
(reference: src/ml_feature_store/store.py:261-334, loop at 288, mask at
326-328). Spark has no native as-of join; this module ships two distributed
rewrites with identical semantics:

* ``strategy="join"`` — range-join + per-spine-row argmax. Conceptually
  simple; the non-equi conjunct means Spark executes an equi join on the
  entity key with the range predicate as a post-filter, then a max_by
  aggregation picks the latest qualifying feature row per spine row.
  Row explosion is bounded by (spine rows x feature rows per entity).

* ``strategy="union"`` — union + single sort: tag feature and spine rows,
  sort within each entity by (ts, is_spine, tiebreak), and carry the most
  recent feature payload forward onto each spine row with
  ``last(payload, ignorenulls=True)`` over an unbounded-preceding window.
  ONE shuffle, NO row explosion — this is the 100 TB strategy (cost is
  O((|spine|+|table|) log) per entity partition, independent of fan-out).

* ``strategy="union_bucketed"`` — the hot-entity (skew) variant of
  ``union``. A window partitioned by entity alone serializes each entity
  into ONE task; an entity with billions of rows stalls the stage. Here
  rows are additionally hashed into fixed time buckets, the carry-forward
  window runs per (entity, bucket) — bounded work per task — and a second,
  tiny pass over per-bucket maxima (one row per (entity, bucket), computed
  with a skew-immune partial-aggregating max_by) supplies each bucket's
  carry-in: the latest feature from any earlier bucket. Identical
  semantics (property-tested against ``union``), two extra narrow shuffles
  over per-bucket cardinality data.

Semantics (must-match, SURVEY §2.3#4):
  * inclusive: feature.ts <= spine.ts qualifies;
  * output ``timestamp`` = the matched FEATURE row's timestamp (not the
    spine's);
  * spine rows with no qualifying feature row are dropped (inner);
  * duplicate spine rows produce duplicate outputs;
  * among tied max feature timestamps the smallest ``__row_id__`` wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .pit import ENTITY_COL, ROW_ID_COL, TIMESTAMP_COL

_SPINE_TS = "__spine_ts__"
_SPINE_ID = "__spine_row__"


def asof_join(
    spine: DataFrame,
    features: DataFrame,
    entity_col: str = ENTITY_COL,
    ts_col: str = TIMESTAMP_COL,
    strategy: str = "union",
    keep_spine_ts: bool = False,
    tolerance_seconds: float | None = None,
    bucket_seconds: int = 30 * 24 * 3600,
    how: str = "inner",
    embargo_seconds: float = 0.0,
) -> DataFrame:
    """For each spine (entity, ts) row return the latest feature row with
    ``feature.ts <= spine.ts``. See module docstring for semantics.

    ``keep_spine_ts=True`` additionally emits the spine timestamp as
    ``as_of_timestamp`` (useful for training pipelines; the reference's
    output contract omits it).

    ``tolerance_seconds`` bounds the lookback (pandas ``merge_asof``-style):
    matches older than ``spine.ts - tolerance`` are dropped (``inner``) or
    null-padded (``left``). Applied post-hoc on the matched feature
    timestamp, so all strategies share the exact same semantics.

    ``how="left"`` keeps spine rows with NO qualifying feature row,
    null-padding the feature columns (Feast's get_historical_features
    contract); ``"inner"`` (default) drops them like the reference.

    ``embargo_seconds`` shifts the qualification cutoff into the past:
    a feature row qualifies only if ``feature.ts <= spine.ts - embargo``.
    This is the label-leakage guard for delayed/settled data — e.g. a
    chargeback label only becomes RELIABLE 24 h after the event, so a
    training set built "as of" the label time must refuse features from
    the final 24 h even though they temporally precede the label.
    Implemented as a map-side shift of the spine timestamp before the
    join (zero extra shuffles; every strategy inherits it identically);
    ``as_of_timestamp`` still reports the ORIGINAL spine timestamp.
    ``tolerance_seconds`` composes: the lookback window becomes
    ``[spine.ts - embargo - tolerance, spine.ts - embargo]``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if embargo_seconds < 0:
        raise ValueError(
            f"embargo_seconds must be >= 0, got {embargo_seconds!r}"
        )
    if embargo_seconds:
        spine = spine.withColumn(
            ts_col,
            F.col(ts_col)
            - F.expr(f"INTERVAL {float(embargo_seconds)} SECONDS"),
        )
    inner = how == "inner"
    if strategy == "join":
        out = _asof_via_join(spine, features, entity_col, ts_col, True, inner)
    elif strategy == "union_bucketed":
        out = _asof_via_union_bucketed(
            spine, features, entity_col, ts_col, bucket_seconds=bucket_seconds,
            inner=inner,
        )
    else:
        out = _asof_via_union(spine, features, entity_col, ts_col, True, inner)
    if tolerance_seconds is not None:
        bound = F.col("as_of_timestamp") - F.expr(
            f"INTERVAL {float(tolerance_seconds)} SECONDS"
        )
        if inner:
            out = out.filter(F.col(ts_col) >= bound)
        else:
            # left: out-of-tolerance matches keep the spine row, features null
            ok = F.col(ts_col) >= bound
            out = out.select(
                entity_col,
                *[
                    F.when(ok, F.col(c)).otherwise(F.lit(None)).alias(c)
                    if c not in (entity_col, "as_of_timestamp")
                    else F.col(c)
                    for c in out.columns
                    if c != entity_col
                ],
            )
    if embargo_seconds and keep_spine_ts:
        # report the caller's ORIGINAL spine timestamp, not the shifted
        # cutoff the join ran against
        out = out.withColumn(
            "as_of_timestamp",
            F.col("as_of_timestamp")
            + F.expr(f"INTERVAL {float(embargo_seconds)} SECONDS"),
        )
    if not keep_spine_ts:
        out = out.drop("as_of_timestamp")
    return out


def _feature_payload_cols(features: DataFrame, entity_col: str) -> list[str]:
    return [c for c in features.columns if c != entity_col]


def _asof_via_join(
    spine: DataFrame,
    features: DataFrame,
    entity_col: str,
    ts_col: str,
    keep_spine_ts: bool,
    inner: bool = True,
) -> DataFrame:
    payload = _feature_payload_cols(features, entity_col)
    s = (
        spine.select(
            F.col(entity_col).alias("__s_entity__"),
            F.col(ts_col).alias(_SPINE_TS),
        )
        .withColumn(_SPINE_ID, F.monotonically_increasing_id())
    )
    # Rename feature columns up front: fresh attribute ids make the join
    # unambiguous even when the spine was derived from `features` itself.
    f = features.select([F.col(c).alias(f"__f_{c}") for c in features.columns])
    cond = (s["__s_entity__"] == f[f"__f_{entity_col}"]) & (
        f[f"__f_{ts_col}"] <= s[_SPINE_TS]
    )
    joined = s.join(f, cond, "inner" if inner else "left").select(
        F.col(_SPINE_ID),
        F.col(_SPINE_TS),
        F.col("__s_entity__").alias(entity_col),
        *[F.col(f"__f_{c}").alias(c) for c in payload],
    )
    # argmax per spine row: max feature ts, tie-broken by min __row_id__.
    ord_fields = [F.col(ts_col).alias("_t")]
    if ROW_ID_COL in payload:
        ord_fields.append((-F.col(ROW_ID_COL)).alias("_n"))
    best = F.max_by(
        F.struct(*[F.col(c) for c in payload]), F.struct(*ord_fields)
    ).alias("_best")
    agg = joined.groupBy(_SPINE_ID, _SPINE_TS, entity_col).agg(best)
    out_cols = [F.col(entity_col)] + [
        F.col(f"_best.{c}").alias(c) for c in payload if c != ROW_ID_COL
    ]
    if keep_spine_ts:
        out_cols.append(F.col(_SPINE_TS).alias("as_of_timestamp"))
    return agg.select(*out_cols)


def _asof_via_union_bucketed(
    spine: DataFrame,
    features: DataFrame,
    entity_col: str,
    ts_col: str,
    bucket_seconds: int,
    inner: bool = True,
) -> DataFrame:
    """Skew-safe union as-of: carry-forward windows per (entity, time
    bucket), plus a carry-in join from per-bucket maxima. See module
    docstring. Always emits ``as_of_timestamp`` (caller drops it)."""
    payload = _feature_payload_cols(features, entity_col)
    tb = ROW_ID_COL if ROW_ID_COL in payload else None
    bucket_us = int(bucket_seconds) * 1_000_000

    f_tagged = features.select(
        F.col(entity_col),
        F.col(ts_col).alias("__evt_ts__"),
        F.lit(0).alias("__is_spine__"),
        F.struct(*[F.col(c) for c in payload]).alias("__payload__"),
    ).withColumn("__bkt__", F.floor(F.unix_micros("__evt_ts__") / F.lit(bucket_us)))
    s_tagged = spine.select(
        F.col(entity_col),
        F.col(ts_col).alias("__evt_ts__"),
        F.lit(1).alias("__is_spine__"),
        F.lit(None).cast(f_tagged.schema["__payload__"].dataType).alias("__payload__"),
    ).withColumn("__bkt__", F.floor(F.unix_micros("__evt_ts__") / F.lit(bucket_us)))
    unioned = f_tagged.unionByName(s_tagged)

    # Pass A: within-bucket carry-forward (same order contract as `union`,
    # but each task's work is bounded by one entity-bucket, not one entity).
    order = [F.col("__evt_ts__").asc(), F.col("__is_spine__").asc()]
    if tb:
        order.append(F.col(f"__payload__.{tb}").desc_nulls_first())
    wa = (
        Window.partitionBy(entity_col, "__bkt__")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__last_feat__", F.last("__payload__", ignorenulls=True).over(wa)
    )

    # Pass B: per-(entity, bucket) feature maximum — partial-aggregating
    # max_by, immune to hot entities — left-joined onto the scaffold of ALL
    # buckets either side touches, then a per-entity window over this tiny
    # (one row per entity-bucket) frame yields each bucket's carry-in.
    ord_fields = [F.col("__evt_ts__").alias("_t")]
    if tb:
        ord_fields.append((-F.col(f"__payload__.{tb}")).alias("_n"))
    bucket_last = f_tagged.groupBy(entity_col, "__bkt__").agg(
        F.max_by(F.col("__payload__"), F.struct(*ord_fields)).alias("__blast__")
    )
    scaffold = unioned.select(entity_col, "__bkt__").distinct()
    wb = (
        Window.partitionBy(entity_col)
        .orderBy("__bkt__")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        scaffold.join(bucket_last, [entity_col, "__bkt__"], "left")
        .withColumn("__carry_in__", F.last("__blast__", ignorenulls=True).over(wb))
        .select(entity_col, "__bkt__", "__carry_in__")
    )

    matched = (
        carried.filter(F.col("__is_spine__") == 1)
        .join(carry, [entity_col, "__bkt__"], "left")
        .withColumn("__feat__", F.coalesce("__last_feat__", "__carry_in__"))
    )
    if inner:
        matched = matched.filter(F.col("__feat__").isNotNull())
    out_cols = [F.col(entity_col)] + [
        F.col(f"__feat__.{c}").alias(c) for c in payload if c != ROW_ID_COL
    ]
    out_cols.append(F.col("__evt_ts__").alias("as_of_timestamp"))
    return matched.select(*out_cols)


def _asof_via_union(
    spine: DataFrame,
    features: DataFrame,
    entity_col: str,
    ts_col: str,
    keep_spine_ts: bool,
    inner: bool = True,
) -> DataFrame:
    payload = _feature_payload_cols(features, entity_col)  # includes ts_col
    tb = ROW_ID_COL if ROW_ID_COL in payload else None

    f_tagged = features.select(
        F.col(entity_col),
        F.col(ts_col).alias("__evt_ts__"),
        F.lit(0).alias("__is_spine__"),
        F.struct(*[F.col(c) for c in payload]).alias("__payload__"),
    )
    s_tagged = spine.select(
        F.col(entity_col),
        F.col(ts_col).alias("__evt_ts__"),
        F.lit(1).alias("__is_spine__"),
        F.lit(None).cast(f_tagged.schema["__payload__"].dataType).alias("__payload__"),
    )
    unioned = f_tagged.unionByName(s_tagged)

    # Sort order within entity: time asc; at equal time features precede the
    # spine row (inclusive <=); among tied-ts features, descending tiebreak so
    # the LAST one seen by the running window is the minimum __row_id__
    # (pandas first-max-occurrence parity, SURVEY §2.3#2).
    order = [F.col("__evt_ts__").asc(), F.col("__is_spine__").asc()]
    if tb:
        order.append(F.col(f"__payload__.{tb}").desc_nulls_first())
    w = (
        Window.partitionBy(entity_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__last_feat__", F.last("__payload__", ignorenulls=True).over(w))
    matched = carried.filter(F.col("__is_spine__") == 1)
    if inner:
        matched = matched.filter(F.col("__last_feat__").isNotNull())

    out_cols = [F.col(entity_col)] + [
        F.col(f"__last_feat__.{c}").alias(c) for c in payload if c != ROW_ID_COL
    ]
    if keep_spine_ts:
        out_cols.append(F.col("__evt_ts__").alias("as_of_timestamp"))
    return matched.select(*out_cols)


def asof_join_nearest(
    spine: DataFrame,
    features: DataFrame,
    entity_col: str = ENTITY_COL,
    ts_col: str = TIMESTAMP_COL,
    tolerance_seconds: float | None = None,
    keep_spine_ts: bool = False,
    how: str = "inner",
) -> DataFrame:
    """As-of join, NEAREST direction (pandas ``merge_asof``
    ``direction='nearest'`` parity): each spine row takes the feature row
    minimizing ``|feature.ts - spine.ts|``. Distance ties prefer the
    BACKWARD (past) candidate — never silently prefer future data; ties
    among equal feature timestamps on one side take the minimum
    ``__row_id__`` (the backward contract of ``asof_join``).

    Plan: the union strategy run in BOTH directions — one shuffle on the
    entity key, two in-partition sorts (backward carry via
    ``last(ignorenulls)`` over preceding, forward carry via
    ``first(ignorenulls)`` over following), then a per-row CASE picks the
    closer candidate. NO join, NO row explosion, cost independent of
    per-entity fan-out — the same reason union is the 100 TB backward
    strategy. ``tolerance_seconds`` bounds the distance post-hoc (drop
    on ``inner``, null-pad on ``left``) with identical semantics in both
    directions."""
    return _asof_directional(
        spine, features, entity_col, ts_col, tolerance_seconds,
        keep_spine_ts, how, "nearest",
    )


def asof_join_forward(
    spine: DataFrame,
    features: DataFrame,
    entity_col: str = ENTITY_COL,
    ts_col: str = TIMESTAMP_COL,
    tolerance_seconds: float | None = None,
    keep_spine_ts: bool = False,
    how: str = "inner",
) -> DataFrame:
    """As-of join, FORWARD direction (pandas ``merge_asof``
    ``direction='forward'`` parity): each spine row takes the EARLIEST
    feature row with ``feature.ts >= spine.ts`` (exact matches included,
    pandas' allow_exact_matches default; min ``__row_id__`` among equal
    timestamps). The time-to-next-event lookup — label-side joins look
    forward the way f16's label windows do, but for a single match.
    Same join-free single-shuffle plan as ``asof_join_nearest``; only
    the forward carry is computed."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    return _asof_directional(
        spine, features, entity_col, ts_col, tolerance_seconds,
        keep_spine_ts, how, "forward",
    )


def _asof_directional(
    spine: DataFrame,
    features: DataFrame,
    entity_col: str,
    ts_col: str,
    tolerance_seconds: float | None,
    keep_spine_ts: bool,
    how: str,
    direction: str,
) -> DataFrame:
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    payload = _feature_payload_cols(features, entity_col)
    tb = ROW_ID_COL if ROW_ID_COL in payload else None

    f_tagged = features.select(
        F.col(entity_col),
        F.col(ts_col).alias("__evt_ts__"),
        F.lit(0).alias("__is_spine__"),
        F.struct(*[F.col(c) for c in payload]).alias("__payload__"),
    )
    s_tagged = spine.select(
        F.col(entity_col),
        F.col(ts_col).alias("__evt_ts__"),
        F.lit(1).alias("__is_spine__"),
        F.lit(None).cast(f_tagged.schema["__payload__"].dataType).alias("__payload__"),
    )
    unioned = f_tagged.unionByName(s_tagged)

    # Spine position at equal ts decides whether exact matches reach the
    # forward window: nearest keeps features BEFORE the spine (backward
    # covers distance-0), pure forward puts them AFTER (pandas
    # allow_exact_matches). The forward sort is conceptually
    # (__evt_ts__ ASC, spine_pos, tb ASC) — but it is EVALUATED reversed:
    # the natural spelling, first(ignorenulls) over [CURRENT ROW,
    # UNBOUNDED FOLLOWING), makes Spark re-aggregate the suffix for
    # EVERY row (UnboundedFollowingWindowFunctionFrame is O(n^2) per
    # partition; a 3M-row hot entity never finishes — caught by
    # tools/skew_smoke.py). The identical value is the RUNNING
    # last(ignorenulls) over the REVERSED sort, which Spark evaluates
    # incrementally in O(n): walking the reversed order up to the
    # current row visits exactly the rows at-or-after it in forward
    # order, and last() picks the one nearest the current row.
    back_order = [F.col("__evt_ts__").asc(), F.col("__is_spine__").asc()]
    if tb:
        # backward: desc so last() lands on the MIN row id (asof_join
        # parity); forward(reversed): desc_nulls_first so last() lands
        # on the MIN row id
        back_order.append(F.col(f"__payload__.{tb}").desc_nulls_first())
    rev_spine_pos = (
        F.col("__is_spine__").desc()
        if direction == "nearest"
        else F.col("__is_spine__").asc()
    )
    rev_fwd_order = [F.col("__evt_ts__").desc(), rev_spine_pos]
    if tb:
        rev_fwd_order.append(F.col(f"__payload__.{tb}").desc_nulls_first())
    w_fwd = (
        Window.partitionBy(entity_col)
        .orderBy(*rev_fwd_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__fwd__", F.last("__payload__", ignorenulls=True).over(w_fwd)
    )
    if direction == "nearest":
        w_back = (
            Window.partitionBy(entity_col)
            .orderBy(*back_order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = carried.withColumn(
            "__back__", F.last("__payload__", ignorenulls=True).over(w_back)
        )
    spine_rows = carried.filter(F.col("__is_spine__") == 1)

    if direction == "nearest":
        d_back = F.abs(
            F.unix_micros(F.col("__evt_ts__"))
            - F.unix_micros(F.col(f"__back__.{ts_col}"))
        )
        d_fwd = F.abs(
            F.unix_micros(F.col(f"__fwd__.{ts_col}"))
            - F.unix_micros(F.col("__evt_ts__"))
        )
        chosen = (
            F.when(F.col("__back__").isNull(), F.col("__fwd__"))
            .when(F.col("__fwd__").isNull(), F.col("__back__"))
            .when(d_back <= d_fwd, F.col("__back__"))
            .otherwise(F.col("__fwd__"))
        )
    else:
        chosen = F.col("__fwd__")
    picked = spine_rows.withColumn("__near__", chosen)
    if tolerance_seconds is not None:
        dist = F.abs(
            F.unix_micros(F.col(f"__near__.{ts_col}"))
            - F.unix_micros(F.col("__evt_ts__"))
        )
        in_tol = dist <= F.lit(int(tolerance_seconds * 1_000_000))
        picked = picked.withColumn(
            "__near__", F.when(in_tol, F.col("__near__"))
        )
    if how == "inner":
        picked = picked.filter(F.col("__near__").isNotNull())

    out_cols = [F.col(entity_col)] + [
        F.col(f"__near__.{c}").alias(c) for c in payload if c != ROW_ID_COL
    ]
    if keep_spine_ts:
        out_cols.append(F.col("__evt_ts__").alias("as_of_timestamp"))
    return picked.select(*out_cols)


def asof_join_nearest_banded(
    spine: DataFrame,
    features: DataFrame,
    tolerance_seconds: float,
    entity_col: str = ENTITY_COL,
    ts_col: str = TIMESTAMP_COL,
    keep_spine_ts: bool = False,
    how: str = "inner",
) -> DataFrame:
    """``asof_join_nearest`` through the banded plan — the HOT-ENTITY
    variant. The union strategy's per-entity window serializes one
    entity into one task; here everything shuffles on
    ``(entity, floor(ts / tolerance))``, so a hot entity's task is
    bounded by one tolerance-width of history.

    Plan: the same double-window carry as the union strategy, but
    partitioned per (entity, bucket); candidates that live in the
    ADJACENT bucket are supplied by a per-bucket boundary table (each
    bucket's first/last feature row under the union plan's exact tie
    orders — a partial-agg min_by/max_by, skew-immune) joined back onto
    the spine rows. Any in-tolerance candidate is in the spine row's own
    or adjacent bucket (bucket width == tolerance), so
    coalesce(in-bucket carry, neighbor boundary row) is the true
    per-side nearest; per-side tolerance filtering equals the union
    plan's post-hoc filter because each side's candidate is its minimum.
    Per-task work is O((features + spine rows in bucket) log) — no
    spine-x-feature pair formation. (The round-3 first formulation
    materialized the in-band pairs and min_by-reduced them; fine for
    sparse spines, but a dense spine on a hot entity made it quadratic
    per bucket — tools/skew_smoke.py measured 245 s vs the union plan's
    12.7 s on the 64x hot key, so it was replaced with this carry
    design.) Property-tested equal to ``asof_join_nearest`` with the
    same tolerance. Requires an explicit tolerance: an unbounded
    nearest has no band to bucket on (use ``asof_join_nearest``)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if tolerance_seconds is None or tolerance_seconds <= 0:
        raise ValueError("asof_join_nearest_banded requires tolerance_seconds > 0")
    payload = _feature_payload_cols(features, entity_col)
    tb = ROW_ID_COL if ROW_ID_COL in payload else None
    band_us = int(tolerance_seconds * 1_000_000)

    f_tagged = features.select(
        F.col(entity_col),
        F.col(ts_col).alias("__evt_ts__"),
        F.lit(0).alias("__is_spine__"),
        F.struct(*[F.col(c) for c in payload]).alias("__payload__"),
    )
    s_tagged = spine.select(
        F.col(entity_col),
        F.col(ts_col).alias("__evt_ts__"),
        F.lit(1).alias("__is_spine__"),
        F.lit(None).cast(f_tagged.schema["__payload__"].dataType).alias("__payload__"),
    )
    u = (
        f_tagged.unionByName(s_tagged)
        .withColumn("__ts_us__", F.unix_micros(F.col("__evt_ts__")))
        .withColumn("__bkt__", F.floor(F.col("__ts_us__") / F.lit(band_us)))
    )

    # In-bucket carries: EXACTLY the union plan's orders, partitioned by
    # (entity, bucket). Backward: running last over (ts ASC, spine LAST,
    # tb DESC-nulls-first). Forward: evaluated as the reversed running
    # frame (see _asof_directional — the O(n) formulation).
    back_order = [F.col("__evt_ts__").asc(), F.col("__is_spine__").asc()]
    rev_fwd_order = [F.col("__evt_ts__").desc(), F.col("__is_spine__").desc()]
    if tb:
        back_order.append(F.col(f"__payload__.{tb}").desc_nulls_first())
        rev_fwd_order.append(F.col(f"__payload__.{tb}").desc_nulls_first())
    part = [entity_col, "__bkt__"]
    w_back = (
        Window.partitionBy(*part)
        .orderBy(*back_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*part)
        .orderBy(*rev_fwd_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn(
        "__back__", F.last("__payload__", ignorenulls=True).over(w_back)
    ).withColumn("__fwd__", F.last("__payload__", ignorenulls=True).over(w_fwd))
    sp = carried.filter(F.col("__is_spine__") == 1)

    # Per-bucket boundary rows under the SAME tie orders: "first" is the
    # row the forward carry would hand a spine row just before the
    # bucket (min ts, then min tb); "last" is the backward pick at the
    # bucket end (max ts, then min tb).
    ts_us = F.unix_micros(F.col("__evt_ts__"))
    if tb:
        k_first = F.struct(ts_us, F.col(f"__payload__.{tb}"))
        k_last = F.struct(ts_us, (-F.col(f"__payload__.{tb}")).alias("_ntb"))
    else:
        k_first = F.struct(ts_us)
        k_last = F.struct(ts_us)
    bounds = (
        u.filter(F.col("__is_spine__") == 0)
        .groupBy(entity_col, "__bkt__")
        .agg(
            F.min_by("__payload__", k_first).alias("__first__"),
            F.max_by("__payload__", k_last).alias("__last__"),
        )
    )
    prev_m = bounds.select(
        F.col(entity_col),
        (F.col("__bkt__") + 1).alias("__bkt__"),
        F.col("__last__").alias("__prev_last__"),
    )
    next_m = bounds.select(
        F.col(entity_col),
        (F.col("__bkt__") - 1).alias("__bkt__"),
        F.col("__first__").alias("__next_first__"),
    )
    sp = sp.join(prev_m, part, "left").join(next_m, part, "left")

    def _dist(c):
        return F.abs(F.unix_micros(c[ts_col]) - F.col("__ts_us__"))

    back = F.coalesce(F.col("__back__"), F.col("__prev_last__"))
    fwd = F.coalesce(F.col("__fwd__"), F.col("__next_first__"))
    backc = F.when(back.isNotNull() & (_dist(back) <= F.lit(band_us)), back)
    fwdc = F.when(fwd.isNotNull() & (_dist(fwd) <= F.lit(band_us)), fwd)
    sp = sp.withColumn("__bc__", backc).withColumn("__fc__", fwdc)
    chosen = (
        F.when(F.col("__bc__").isNull(), F.col("__fc__"))
        .when(F.col("__fc__").isNull(), F.col("__bc__"))
        .when(_dist(F.col("__bc__")) <= _dist(F.col("__fc__")), F.col("__bc__"))
        .otherwise(F.col("__fc__"))
    )
    picked = sp.withColumn("__near__", chosen)
    if how == "inner":
        picked = picked.filter(F.col("__near__").isNotNull())
    out_cols = [F.col(entity_col)] + [
        F.col(f"__near__.{c}").alias(c) for c in payload if c != ROW_ID_COL
    ]
    if keep_spine_ts:
        out_cols.append(F.col("__evt_ts__").alias("as_of_timestamp"))
    return picked.select(*out_cols)
