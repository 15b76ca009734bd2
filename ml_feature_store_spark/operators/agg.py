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


def kmv_segment_overlap(
    df,
    segment_col: str,
    element_col: str,
    k: int = 256,
):
    """Pairwise segment OVERLAP estimation via KMV (k-minimum-values)
    sketches — the set-intersection capability HLL does not have (HLL
    unions losslessly but cannot intersect; a10's rollup stops at
    distinct-of-union). Beyer et al.'s estimator, distributed:

    1. per segment, the sketch = the k smallest ``hash_uniform`` draws
       over DISTINCT elements — built with the salted two-phase
       bottom-k (operators/sampling.py), so a segment holding most of
       the table still bounds every task; sketches are MERGEABLE
       (bottom-k of a union = bottom-k of bottom-ks), which is what
       makes them a storable rollup state at 100 TB: kilobytes per
       segment, re-combined without re-touching facts;
    2. sketch arrays (k-bounded) pair up via a broadcast self-join over
       segments — work is O(|segments|^2 * k), independent of corpus;
    3. per pair: theta = k-th smallest of the DISTINCT union of draws;
       union_est = (k-1) * 2^60 / theta (exact when the union sketch
       is not full); rho = |shared draws <= theta| / k; inter_est =
       rho * union_est.

    Returns one row per (seg_a < seg_b) pair with estimates plus the
    sketch-exact flag. Error: rsd ~ 1/sqrt(k) on the union, plus
    binomial noise on rho for the intersection — callers size k to the
    overlap precision they need; the suite witness checks the analytic
    bound against exact counts on both engines."""
    from .sampling import bottomk_sample

    el = df.select(segment_col, element_col).distinct()
    sk = bottomk_sample(el, segment_col, element_col, k=k, salt_buckets=8)
    sketches = sk.groupBy(segment_col).agg(
        F.array_sort(F.collect_list("__draw__")).alias("sk"),
        F.count("*").cast("long").alias("sk_n"),
    )
    # Both sides of the pairwise self-join read the sketch table; without
    # materialization the distinct + two-phase bottom-k subtree runs twice
    # in one job. The sketch table is |segments| rows of k longs —
    # checkpointing it is exactly the "sketches are storable rollup
    # state" contract.
    sketches = sketches.localCheckpoint(eager=False)
    a = sketches.select(
        F.col(segment_col).alias("seg_a"),
        F.col("sk").alias("sk_a"),
        F.col("sk_n").alias("n_a"),
    )
    b = sketches.select(
        F.col(segment_col).alias("seg_b"),
        F.col("sk").alias("sk_b"),
        F.col("sk_n").alias("n_b"),
    )
    pairs = a.join(F.broadcast(b), F.col("seg_a") < F.col("seg_b"))
    scale = float(1 << 60)
    merged = F.slice(
        F.array_sort(F.array_distinct(F.concat("sk_a", "sk_b"))), 1, k
    )
    p = pairs.withColumn("__m__", merged).withColumn(
        "__full__", F.size("__m__") >= k
    )
    theta = F.element_at("__m__", F.least(F.lit(k), F.size("__m__"))).cast(
        "double"
    )
    union_est = F.when(
        F.col("__full__"), (F.lit(float(k - 1)) * F.lit(scale)) / theta
    ).otherwise(F.size("__m__").cast("double"))
    shared = F.size(
        F.filter(
            F.array_intersect("sk_a", "sk_b"),
            lambda h: h.cast("double") <= theta,
        )
    )
    denom = F.least(F.lit(k), F.size("__m__")).cast("double")
    # multiply BEFORE dividing: in exact (not-full) mode union_est ==
    # denom, so shared * union_est / denom is the integer `shared`
    # exactly, while (shared / denom) * union_est picks up a division
    # ulp (7/47*47 = 7.000000000000001 — hypothesis-found round 10)
    return p.select(
        "seg_a",
        "seg_b",
        union_est.alias("union_est"),
        (shared.cast("double") * union_est / denom).alias("inter_est"),
        (~F.col("__full__")).alias("sketch_exact"),
    )
