"""Skew-safe and sketch-based aggregation operators.

The reference's aggregation surface is pandas ``groupby`` over one node
(reference: src/ml_feature_store/store.py get/get_training_set feature
frames); these operators cover the shapes that break at 100 TB even
though a plain ``groupBy`` is semantically enough:

* ``count_distinct_salted`` — exact COUNT(DISTINCT v) per key as an
  EXPLICIT two-stage plan. Catalyst already rewrites a single distinct
  aggregate into a (key, value) dedup shuffle + count (verified against
  ``.explain``: vanilla countDistinct does NOT funnel a hot key into one
  reducer on Spark), so on Spark this operator is the portable, pinned
  formulation of that same rewrite — useful because the salting recipe
  generalizes to aggregations Catalyst does NOT rewrite (bounded
  ``collect_set``-style state, distinct-under-window) and because the
  salt count caps per-task distinct-state size deterministically.
  Per-salt counts are disjoint (the salt is a pure function of the
  value) and SUM exactly: zero approximation.

* ``histogram_quantile_rollup`` — percentiles from a mergeable
  equi-width histogram: bounded shuffle (``n_bins`` rows per key),
  bin counts merge by summation for coarser rollups / incremental
  updates (same scale pattern as the HLL rollup: fine state built once
  map-side, every rollup level reuses it).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def count_distinct_salted(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n_salts: int = 32,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact distinct count per key via explicit value-space salting.

    Stage 1 groups by (keys, pmod(xxhash64(value), n_salts)) — a hot
    key's values spread across ``n_salts`` independent tasks; because
    the salt is a pure function of the value, equal values always land in
    the same salt and distinct counts across salts are disjoint. Stage 2
    sums the per-salt counts (n_salts rows per key — trivially small).

    Result-equivalent to ``groupBy(*keys).agg(countDistinct(value_col))``
    — and on Spark plan-equivalent too (Catalyst's distinct rewrite also
    shuffles on (key, value); see module docstring for when the explicit
    form is the one you want). Worst-case per-task distinct state is
    bounded by the largest (key, salt) slice.
    """
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts)).alias("__salt__")
    per_salt = df.groupBy(*[F.col(k) for k in keys], salt).agg(
        F.countDistinct(value_col).alias("__d__")
    )
    return per_salt.groupBy(*keys).agg(F.sum("__d__").cast("long").alias(out_col))


def iqr_outlier_stats(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    k: float = 1.5,
) -> DataFrame:
    """Per-key Tukey-fence outlier profile: exact Q1/Q3, the k*IQR fences,
    and how many rows fall outside them.

    Two passes over the fact, both scale-safe: (1) grouped exact
    percentiles (one shuffle on the keys; swap in percentile_approx or
    ``histogram_quantile_rollup`` at 100 TB), (2) the per-key fences —
    one tiny row per key — BROADCAST back onto the fact, so the outlier
    count is a map-side filter + partial count, never a re-shuffle of
    the fact."""
    q = df.groupBy(*keys).agg(
        F.expr(f"percentile({value_col}, 0.25)").alias("__q1__"),
        F.expr(f"percentile({value_col}, 0.75)").alias("__q3__"),
    )
    iqr = F.col("__q3__") - F.col("__q1__")
    fenced = q.select(
        *keys,
        (F.col("__q1__") - F.lit(float(k)) * iqr).alias("__lo__"),
        (F.col("__q3__") + F.lit(float(k)) * iqr).alias("__hi__"),
    )
    joined = df.join(F.broadcast(fenced), list(keys))
    return joined.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(
            F.when(
                (F.col(value_col) < F.col("__lo__"))
                | (F.col(value_col) > F.col("__hi__")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_outliers"),
        F.round(F.min("__lo__"), 4).alias("lo_fence"),
        F.round(F.min("__hi__"), 4).alias("hi_fence"),
    )


def histogram_quantile_rollup(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 1024,
    percentiles: Sequence[float] = (0.5, 0.95),
) -> DataFrame:
    """Percentiles per key from a MERGEABLE equi-width histogram.

    The scale pattern for quantiles over 100 TB: a fixed-width histogram
    is built with one map-side-combined groupBy((keys, bin)) — at most
    ``n_bins`` rows per key survive the shuffle regardless of row count —
    and histograms MERGE by summing bin counts, so coarser rollups and
    incremental updates never re-touch the raw data (percentile_approx's
    internal sketch is not exposed as a mergeable value; this is).

    The estimate returned for percentile p is the LOWER EDGE of the first
    bin whose cumulative count reaches ceil(p * total): deterministic
    integer+IEEE arithmetic, identical across engines (the oracle can
    hash-match it exactly), with error bounded by one bin width
    ((hi-lo)/n_bins). Values outside [lo, hi) clamp into the edge bins.
    """
    width = (float(hi) - float(lo)) / int(n_bins)
    bin_col = F.least(
        F.greatest(
            F.floor((F.col(value_col) - F.lit(float(lo))) / F.lit(width)), F.lit(0)
        ),
        F.lit(int(n_bins) - 1),
    ).cast("long")
    hist = df.groupBy(*[F.col(k) for k in keys], bin_col.alias("__bin__")).agg(
        F.count("*").alias("__cnt__")
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy("__bin__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("__cum__", F.sum("__cnt__").over(w)).withColumn(
        "__total__", F.sum("__cnt__").over(Window.partitionBy(*keys))
    )

    def q(p: float) -> Column:
        target = F.ceil(F.col("__total__").cast("double") * F.lit(float(p)))
        hit_bin = F.min(
            F.when(F.col("__cum__") >= target, F.col("__bin__"))
        )
        return F.lit(float(lo)) + hit_bin.cast("double") * F.lit(width)

    agg_cols = [q(p).alias(f"p{int(round(p * 100)):02d}") for p in percentiles]
    agg_cols.append(F.max("__total__").cast("long").alias("n_values"))
    return cum.groupBy(*keys).agg(*agg_cols)
