"""Aggregation operators: stats/rolling/distinct/approx/sketch/percentiles/OLS/listagg/bitmap/KMV/funnels/cohorts (split from suite_rel.py in round 7; see suite.py for assembly and SURVEY.md §2 for the inventory)."""
from __future__ import annotations

import math  # noqa: F401
import tempfile  # noqa: F401

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from .operators.asof import asof_join  # noqa: F401
from .operators.pit import (  # noqa: F401
    entity_filter,
    latest_per_entity,
    temporal_filter,
    top_k_per_group,
)
from .suite_common import *  # noqa: F401,F403


def q_a16_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-funnel analysis: per user, the first `view` and whether
    a `purchase` followed within 2 hours (plus the exact microsecond
    time-to-convert). The product-analytics sequence query — stage
    anchors via per-entity min-aggregates (map-side combined), then a
    band-bounded left join exactly like f13/f16; no window over raw
    events, no row explosion beyond purchases-per-2h."""
    ev = table(spark, sf_dir, "events")
    first_view = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fv"))
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts")
    )
    j = first_view.join(
        buys,
        (F.col("user_id") == F.col("b_user"))
        & (F.col("b_ts") > F.col("fv"))
        & (F.col("b_ts") <= F.col("fv") + F.expr("INTERVAL 2 HOURS")),
        "left",
    )
    agg = j.groupBy("user_id", "fv").agg(F.min("b_ts").alias("fb"))
    return agg.select(
        "user_id",
        _US("fv").alias("first_view_us"),
        F.col("fb").isNotNull().alias("converted"),
        (_US("fb") - _US("fv")).alias("convert_us"),
    )

def q_a1_agg_entity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
    )

def q_a2_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing 7-day count/sum per user — the README's motivating
    'txn count 7d' feature (reference README.md:75-76) as a range window."""
    ev = table(spark, sf_dir, "events").withColumn("ts_us", _US("ts"))
    w = Window.partitionBy("user_id").orderBy("ts_us").rangeBetween(-_7D_US, 0)
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        F.count("*").over(w).alias("cnt_7d"),
        F.round(F.sum("value").over(w), 2).alias("sum_7d"),
    )

def q_a3_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )

def q_a4_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct with an oracle-checkable contract: the HLL
    estimate itself is engine-specific (DuckDB's sketch differs), so the
    output carries the EXACT distinct count plus a ``within_tolerance``
    boolean (|approx-exact|/exact <= 5*rsd); the DuckDB twin computes the
    exact count and literal TRUE — a deterministic hash match that still
    fails if Spark's estimator drifts outside its accuracy bound."""
    ev = table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            / F.col("exact_users")
            <= F.lit(0.10)
        ).alias("within_tolerance"),
    )

def q_a5_cube_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )

def q_a6_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-over-event deltas (lag/lead window functions).
    event_id tie-breaks the ordering: two same-user events on the same
    microsecond would otherwise make delta_prev/delta_next depend on
    partitioning."""
    ev = table(spark, sf_dir, "events").withColumn("ts_us", _US("ts"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta_prev"),
        F.round(F.lead("value").over(w) - F.col("value"), 2).alias("delta_next"),
    )

def q_a7_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of account balance per market segment
    (Spark ``percentile`` == DuckDB ``quantile_cont``, both linear
    interpolation). The exact twin of a4's approx_count_distinct scale
    story: exact here, ``percentile_approx`` at 100 TB."""
    cust = table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.round(F.expr("percentile(c_acctbal, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(c_acctbal, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(c_acctbal, 0.75)"), 4).alias("p75"),
        F.round(F.avg("c_acctbal"), 4).alias("mean_bal"),
    )

def q_a2b_multi_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The README-motivating features ('avg txn 30d', 'count 7d') computed
    in ONE pass: two range frames share the same partitionBy/orderBy, so
    Spark sorts once and evaluates both frames over the same shuffle."""
    ev = (
        table(spark, sf_dir, "events")
        .withColumn("ts_us", _US("ts"))
        # sum exact integer cents: sliding-window sums of doubles differ in
        # the last ulp between engines (incremental vs recomputed), which
        # flips 4dp rounding; integer sums are order-independent
        .withColumn("cents", F.round(F.col("value") * 100).cast("long"))
    )
    day_us = 24 * 3600 * 1_000_000
    w7 = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-7 * day_us, 0)
    )
    w30 = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-30 * day_us, 0)
    )
    # fixed-point average: (cents*100) div count — pure integer arithmetic,
    # immune to the Spark-vs-DuckDB ROUND(double) half-value disagreement
    # (Spark HALF_UPs the decimal repr, DuckDB rounds the binary double)
    s30 = F.sum("cents").over(w30) * 100
    c30 = F.count("*").over(w30)
    avg_e4 = ((s30 - (s30 % c30)) / c30).cast("long")
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        F.count("*").over(w7).alias("cnt_7d"),
        F.round(F.sum("cents").over(w7) / 100.0, 2).alias("sum_7d"),
        c30.alias("cnt_30d"),
        avg_e4.alias("avg_30d_e4"),
    )

def q_a8_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-function family coverage: rank / dense_rank / percent_rank /
    cume_dist / ntile over one window spec (per-customer order history,
    (date, orderkey) total order so every rank is deterministic). One
    shuffle + one sort serves all five functions."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.filter(F.col("o_custkey") < 500).select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
    )

def q_a9_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family per group: corr, covar_samp,
    stddev_samp, var_samp, skewness, kurtosis — all single-pass
    moment-based aggregates with map-side partial merge (Welford-style
    combiners), so one shuffle of k moment tuples regardless of scale.
    Higher moments rounded 4dp: both engines use one-pass moment
    formulas whose last ulp differs with summation order."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
        F.round(F.var_samp("l_discount"), 6).alias("var_discount"),
        F.round(F.skewness("l_extendedprice"), 4).alias("skew_price"),
        F.round(F.kurtosis("l_extendedprice"), 4).alias("kurt_price"),
    )

def q_a10_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches — THE scale pattern for distinct counts:
    build a sketch per fine-grained group (returnflag x linestatus),
    then MERGE sketches up to coarse groups (returnflag) without
    touching the raw data again. At 100 TB the fine sketches are built
    once (map-side partial agg, bytes per group) and every rollup level
    reuses them; an exact countDistinct would re-shuffle the fact per
    level. Rows-only check: the estimate is engine-specific (DuckDB's
    HLL differs), but Spark's is deterministic for fixed input."""
    li = table(spark, sf_dir, "lineitem")
    fine = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.hll_sketch_agg("l_partkey").alias("sk"),
        F.count("*").alias("n"),
    )
    merged = fine.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_parts"),
        F.sum("n").alias("n_items"),
    )
    # Oracle contract (mirrors a4): the estimate is engine-specific, so emit
    # the exact distinct count + a within_tolerance boolean instead of the
    # raw estimate. Default lgConfigK=12 gives rsd ~1.6%; 10% is a safe,
    # deterministic bound. The exact count is a second agg over the fact —
    # at scale you'd skip it (the sketches ARE the product); here it is the
    # cross-engine proof.
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts")
    )
    return (
        merged.join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            "n_items",
            "exact_parts",
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                / F.col("exact_parts")
                <= F.lit(0.10)
            ).alias("within_tolerance"),
        )
    )

def q_a11_distinct_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type through the explicit SALTED
    two-stage plan (operators/agg.py count_distinct_salted): stage 1
    groups by (key, hash(value) % 32), stage 2 sums the disjoint
    per-salt counts. Same result as countDistinct — and the same skew-
    safe shuffle shape Catalyst's own distinct rewrite produces, here
    pinned explicitly (see agg.py for when the explicit form matters)."""
    from .operators.agg import count_distinct_salted

    ev = table(spark, sf_dir, "events")
    return count_distinct_salted(ev, ["event_type"], "user_id", n_salts=32)

def q_a12_quantile_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentiles from a mergeable equi-width histogram
    (operators/agg.py histogram_quantile_rollup): n_bins rows per key
    survive the shuffle regardless of fact size, and bin counts merge by
    summation for coarser rollups. Estimate = lower edge of the bin
    reaching the target rank — deterministic across engines (the oracle
    computes the identical histogram), error <= one bin width. lo/hi
    chosen so width = 64/1024 = 0.0625 is a power of two: every double
    product below is exact."""
    from .operators.agg import histogram_quantile_rollup

    li = table(spark, sf_dir, "lineitem")
    return histogram_quantile_rollup(
        li, ["l_returnflag"], "l_quantity", lo=0.0, hi=64.0, n_bins=1024,
        percentiles=(0.5, 0.95),
    )

def q_a14_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (GK sketch — mergeable, bounded memory, the 100 TB
    path a7's exact percentile can't walk) under the same cross-engine
    contract as a4/a10: the hash-checked columns are the EXACT percentiles
    plus a within_tolerance boolean asserting the sketch value lands
    inside the exact [q-eps, q+eps] rank window (eps=0.01 >> 1/accuracy);
    the oracle computes the exact values and literal TRUE."""
    ev = table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.expr("approx_percentile(value, array(0.5, 0.9), 10000)").alias("ap"),
        F.expr("percentile(value, array(0.4900, 0.5, 0.5100, 0.8900, 0.9, 0.9100))").alias(
            "ex"
        ),
    )
    within = (
        (F.col("ap")[0] >= F.col("ex")[0])
        & (F.col("ap")[0] <= F.col("ex")[2])
        & (F.col("ap")[1] >= F.col("ex")[3])
        & (F.col("ap")[1] <= F.col("ex")[5])
    )
    return agg.select(
        "event_type",
        F.round(F.col("ex")[1], 4).alias("exact_p50"),
        F.round(F.col("ex")[4], 4).alias("exact_p90"),
        within.alias("within_tolerance"),
    )

def q_a17_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariance structure of the first 8 embedding dimensions — the
    single pass that feeds a driver-side PCA/whitening solve (the d x d
    Gram matrix is tiny; the data scan is the cost). Values quantized to
    integer milliunits FIRST, so every sum is an order-independent
    BIGINT and the emitted scaled covariance numerator
    n*sum(qi*qj) - sum(qi)*sum(qj) is exact. One scan, 45 codegen
    aggregates, no shuffle of rows (partial agg to one row), stack() to
    tidy (i, j) form. Overflow bound: n^2 * maxq^2 < 2^63 -> n ~< 3e6 at
    |q|<=1000; beyond that, shard the pass (sum pairs are mergeable) or
    drop quantization scale."""
    emb = table(spark, sf_dir, "embeddings").select(
        *[
            F.floor(F.col("embedding").getItem(i).cast("double") * 1000)
            .cast("long")
            .alias(f"q{i}")
            for i in range(8)
        ]
    )
    aggs = [F.count("*").alias("n")]
    aggs += [F.sum(f"q{i}").alias(f"s{i}") for i in range(8)]
    aggs += [
        F.sum(F.col(f"q{i}") * F.col(f"q{j}")).alias(f"p{i}_{j}")
        for i in range(8)
        for j in range(i, 8)
    ]
    row = emb.agg(*aggs)
    stack_args = ", ".join(
        f"CAST({i} AS BIGINT), CAST({j} AS BIGINT), p{i}_{j} * n - s{i} * s{j}"
        for i in range(8)
        for j in range(i, 8)
    )
    return row.select(
        F.expr(f"stack(36, {stack_args}) AS (i, j, cov_num)"), "n"
    )

def q_a18_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch point queries, exact-verified — the mergeable
    heavy-hitter sketch for streams/shards too big to count exactly.
    Build: each event row hashes into d=3 sketch rows x w=64 buckets
    (portable md5 family, seeds inlined) and the sketch is ONE partial-agg
    groupBy over (r, b) — 192 cells total, so the shuffle carries a
    bounded sketch no matter how many input rows (count-min's guarantee:
    est >= exact, est <= exact + eps*N w.h.p.). Probe: a fixed 20-user
    candidate list reads min-over-rows of its cells; exact counts join in
    as ground truth (the x19-style trust-but-verify step — at 100 TB
    you'd spot-check a sample this way, not count every key). Asserts the
    one-sided error bound as a column so the oracle checks the INVARIANT,
    not just the numbers."""
    ev = table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("k")
    )
    probes = spark.range(20).select(F.col("id").cast("string").alias("k"))

    def bucket(d: int, col: F.Column) -> F.Column:
        h = F.md5(F.concat(F.lit(f"{d},"), col))
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 64

    cells = ev.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("r"), bucket(d, F.col("k")).alias("b")
                    )
                    for d in range(3)
                ]
            )
        ).alias("c")
    ).select("c.r", "c.b")
    sketch = cells.groupBy("r", "b").agg(F.count("*").alias("cnt"))
    probe_cells = probes.select(
        "k",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("r"), bucket(d, F.col("k")).alias("b")
                    )
                    for d in range(3)
                ]
            )
        ).alias("c"),
    ).select("k", "c.r", "c.b")
    est = (
        probe_cells.join(F.broadcast(sketch), ["r", "b"])
        .groupBy("k")
        .agg(F.min("cnt").alias("cms_est"))
    )
    exact = ev.join(F.broadcast(probes), "k").groupBy("k").agg(
        F.count("*").alias("exact_cnt")
    )
    return (
        est.join(exact, "k")
        .select(
            F.col("k").cast("long").alias("user_id"),
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") >= F.col("exact_cnt")).alias("bound_holds"),
        )
    )

def q_a19_bottomk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key bounded uniform sample (operators/sampling.py
    bottomk_sample): the 5 events with the smallest md5 draw per
    event_type — the deterministic distributed replacement for a per-key
    reservoir. Runs the SALTED two-phase plan (salt_buckets=8): rank
    within (key, salt) first so a key holding most of the table still
    bounds every task, then merge the per-bucket bottom-ks — correct
    because bottom-k is mergeable (bottom-k of a union == bottom-k of
    bottom-ks). The oracle replays the single-phase ranking, so the
    check also proves the two-phase == one-phase equivalence on real
    data (the x9 independent-algorithm recipe)."""
    from .operators.sampling import bottomk_sample

    ev = table(spark, sf_dir, "events").select("event_type", "event_id")
    out = bottomk_sample(ev, "event_type", "event_id", k=5, salt_buckets=8)
    return out.select("event_type", "sample_rank", "event_id")

def q_a20_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle — the product-analytics staple: users
    cohorted by first-seen ISO week; each later week reports how many of
    the cohort were active (and the integer retention rate). Sessions
    (x7) say how long visits last, funnels (a16) say how one visit
    converts; retention says whether users COME BACK. Plan: per-user
    first-week argmin (one partial-agg shuffle), distinct (user, week)
    activity pairs, one key join + count — no window over history, all
    exact integers. The triangle is |cohorts| x |weeks| rows no matter
    the input size."""
    ev = table(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    first = ev.groupBy("user_id").agg(F.min(wk).alias("cohort"))
    act = ev.select("user_id", wk.alias("week")).distinct()
    sizes = first.groupBy("cohort").agg(F.count("*").alias("cohort_size"))
    tri = (
        act.join(first, "user_id")
        .groupBy("cohort", "week")
        .agg(F.count("*").alias("n_active"))
        .join(F.broadcast(sizes), "cohort")
    )
    return tri.select(
        _US("cohort").alias("cohort_us"),
        F.floor(
            (F.unix_micros("week") - F.unix_micros("cohort"))
            / F.lit(7 * 86400 * 1_000_000)
        ).alias("weeks_since"),
        "n_active",
        "cohort_size",
        F.expr("n_active * 10000L div cohort_size").alias("retention_e4"),
    )

def q_a21_regr_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregate family (regr_slope / regr_intercept /
    regr_r2 / regr_count / regr_avgx / regr_avgy) — the one-pass OLS
    fit per group, the statistical-agg surface a9's corr/covar family
    left unwitnessed. Price regressed on quantity per return flag: all
    six moments come out of ONE partial-aggregable pass (each is
    algebraic in sum/sum2/sumxy), so the plan is the same map-side
    combine + tiny shuffle as any count — the way a 100 TB fit must
    run: no second pass, no driver-side math. DuckDB implements the
    identical SQL-standard family, making the oracle a direct twin."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("regr_count(l_extendedprice, l_quantity)")
        .cast("long")
        .alias("n_fit"),
        F.round(F.expr("regr_slope(l_extendedprice, l_quantity)"), 4).alias(
            "slope"
        ),
        F.round(F.expr("regr_intercept(l_extendedprice, l_quantity)"), 2).alias(
            "intercept"
        ),
        F.round(F.expr("regr_r2(l_extendedprice, l_quantity)"), 6).alias("r2"),
        F.round(F.expr("regr_avgx(l_extendedprice, l_quantity)"), 4).alias(
            "avg_qty"
        ),
        F.round(F.expr("regr_avgy(l_extendedprice, l_quantity)"), 2).alias(
            "avg_price"
        ),
    )

def q_a25_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-overlap estimation via KMV sketches (operators/agg.py
    kmv_segment_overlap) — the set-INTERSECTION capability the sketch
    family lacked: a10's HLL can union but not intersect; KMV bottom-k
    sketches support both (Beyer et al.), stay mergeable (bottom-k of
    bottom-ks — the storable-rollup property), and build with the
    salted two-phase bottom-k so a dominant segment bounds every task.
    Segments = event types, elements = (user, day) activity cells;
    the witness computes BOTH the sketch estimates and the exact
    overlaps, and checks the estimates land inside the analytic error
    (k=512: rsd ~4.4% union, ~1/sqrt(rho*k) intersection; bounds set
    at >=2.3x the one-sigma figures). Exact counts anchor the cross-engine
    hash; the tolerance booleans certify the estimator. At 100 TB the
    exact arm disappears and the kilobyte sketches ARE the product."""
    from .operators.agg import kmv_segment_overlap

    ev = table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") * 100 + F.dayofmonth("ts")).alias("cell"),
    )
    est = kmv_segment_overlap(ev, "event_type", "cell", k=512)
    # The exact arm (witness-only — absent at 100 TB) reads the distinct
    # cell set three times (pair join both sides + per-seg counts);
    # materialize it once.
    el = ev.distinct().localCheckpoint(eager=False)
    n = el.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    ja = el.select(F.col("event_type").alias("seg_a"), "cell")
    jb = el.select(F.col("event_type").alias("seg_b"), "cell")
    inter = (
        ja.join(jb, "cell")
        .filter(F.col("seg_a") < F.col("seg_b"))
        .groupBy("seg_a", "seg_b")
        .agg(F.count("*").cast("long").alias("exact_inter"))
    )
    na = n.select(F.col("event_type").alias("seg_a"), F.col("n").alias("n_a"))
    nb = n.select(F.col("event_type").alias("seg_b"), F.col("n").alias("n_b"))
    exact = (
        inter.join(F.broadcast(na), "seg_a")
        .join(F.broadcast(nb), "seg_b")
        .withColumn(
            "exact_union", (F.col("n_a") + F.col("n_b") - F.col("exact_inter"))
        )
    )
    out = est.join(exact, ["seg_a", "seg_b"])
    return out.select(
        "seg_a",
        "seg_b",
        F.col("exact_union").cast("long").alias("exact_union"),
        "exact_inter",
        (
            F.abs(F.col("union_est") - F.col("exact_union"))
            / F.col("exact_union")
            <= 0.15
        ).alias("union_ok"),
        (
            F.abs(F.col("inter_est") - F.col("exact_inter"))
            / F.greatest(F.col("exact_inter"), F.lit(1))
            <= 0.30
        ).alias("inter_ok"),
    )

def q_a24_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counts via bitmap aggregates
    (``bitmap_construct_agg`` / ``bitmap_or_agg`` / ``bitmap_count``,
    Spark 3.5+) — the Doris/ClickHouse-style complement of a10's
    APPROXIMATE HLL rollup: integer ids land in fixed 32768-bit bucket
    bitmaps, fine-grained bitmaps OR-merge to coarser groups byte-wise,
    and the count stays exact at every level. The witness runs the real
    two-level discipline — bucket number stays IN the grouping key all
    the way up (OR-ing bitmaps across different buckets would conflate
    positions; a toy corpus fits one bucket and hides that bug, so the
    shape matters more than the row count) — and proves
    per-(flag,status,bucket) bitmaps OR-merged up to flag equal a
    direct COUNT DISTINCT. At 100 TB the bitmaps are the stored rollup
    state: kilobytes per (group,bucket), re-aggregated without
    re-touching facts — exact where sketches are fuzzy, at the price of
    dense-id domains (hence bitmap_bucket_number sharding)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        (F.col("l_partkey") + 1).alias("k"),  # bitmap positions are 1-based
    )
    fine = li.groupBy(
        "l_returnflag",
        "l_linestatus",
        F.expr("bitmap_bucket_number(k)").alias("bkt"),
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(k))").alias("bm"))
    merged = (
        fine.groupBy("l_returnflag", "bkt")
        .agg(F.expr("bitmap_count(bitmap_or_agg(bm))").alias("cnt"))
        .groupBy("l_returnflag")
        .agg(F.sum("cnt").cast("long").alias("n_parts_bitmap"))
    )
    direct = li.groupBy("l_returnflag").agg(
        F.countDistinct("k").cast("long").alias("n_parts_direct")
    )
    return merged.join(direct, "l_returnflag").select(
        "l_returnflag",
        "n_parts_bitmap",
        "n_parts_direct",
        (F.col("n_parts_bitmap") == F.col("n_parts_direct")).alias("merge_exact"),
    )

def q_a22_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2016 ``LISTAGG ... WITHIN GROUP (ORDER BY ...)`` (new in
    Spark 4) — deterministic ordered string aggregation, the
    report/export lane where row sets become delimited strings; until
    4.x Spark needed collect_list + array_sort + array_join. Both the
    plain and DISTINCT forms are witnessed: per nation, the ordered
    roster of distinct market segments present and an ordered digest of
    the 3 highest-balance customer keys (top-k pre-limited per group —
    bounding listagg input is how the string agg stays scale-safe; an
    unbounded listagg over a hot group builds a gigabyte string and is
    the documented anti-pattern). DuckDB's ordered string_agg is the
    direct twin."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    segs = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.expr(
                "listagg(DISTINCT c_mktsegment, ',') "
                "WITHIN GROUP (ORDER BY c_mktsegment)"
            ).alias("segments"),
            F.count("*").cast("long").alias("n_cust"),
        )
    )
    top3 = top_k_per_group(
        c.select("c_nationkey", "c_custkey", "c_acctbal"),
        ["c_nationkey"],
        [F.col("c_acctbal").desc(), F.col("c_custkey").asc()],
        k=3,
    )
    digest = (
        top3.join(F.broadcast(n), top3.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name"))
        .agg(
            F.expr(
                "listagg(CAST(c_custkey AS STRING), ',') "
                "WITHIN GROUP (ORDER BY c_acctbal DESC, c_custkey)"
            ).alias("top3_keys")
        )
    )
    return segs.join(digest, "n_name")


QUERIES = {
    'a16_funnel': q_a16_funnel,
    'a1_agg_entity_stats': q_a1_agg_entity_stats,
    'a2_rolling_window': q_a2_rolling_window,
    'a3_agg_distinct': q_a3_agg_distinct,
    'a4_approx_distinct': q_a4_approx_distinct,
    'a5_cube_rollup': q_a5_cube_rollup,
    'a6_lag_lead': q_a6_lag_lead,
    'a7_percentiles': q_a7_percentiles,
    'a2b_multi_window': q_a2b_multi_window,
    'a8_rank_family': q_a8_rank_family,
    'a9_stats_agg': q_a9_stats_agg,
    'a10_hll_sketch': q_a10_hll_sketch,
    'a11_distinct_salted': q_a11_distinct_salted,
    'a12_quantile_hist': q_a12_quantile_hist,
    'a14_approx_percentile': q_a14_approx_percentile,
    'a17_covariance_matrix': q_a17_covariance_matrix,
    'a18_cms_heavy_hitters': q_a18_cms_heavy_hitters,
    'a19_bottomk_sample': q_a19_bottomk_sample,
    'a20_retention_cohorts': q_a20_retention_cohorts,
    'a21_regr_family': q_a21_regr_family,
    'a25_kmv_intersection': q_a25_kmv_intersection,
    'a24_bitmap_distinct': q_a24_bitmap_distinct,
    'a22_listagg': q_a22_listagg,
}

ORACLE_SQL: dict[str, str] = {}

ORACLE_SQL["a1_agg_entity_stats"] = """
        SELECT user_id, COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS sum_value,
               ROUND(AVG(value), 4) AS avg_value,
               ROUND(MIN(value), 2) AS min_value,
               ROUND(MAX(value), 2) AS max_value
        FROM events GROUP BY user_id
    """

ORACLE_SQL["a2_rolling_window"] = f"""
        SELECT event_id, user_id, ts_us,
               COUNT(*) OVER w AS cnt_7d,
               ROUND(SUM(value) OVER w, 2) AS sum_7d
        FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM ({_EV}))
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                     RANGE BETWEEN {_7D_US} PRECEDING AND CURRENT ROW)
    """

ORACLE_SQL["a3_agg_distinct"] = """
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
        FROM events GROUP BY event_type
    """

ORACLE_SQL["a5_cube_rollup"] = """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
               ROUND(CAST(SUM(l_quantity) AS DOUBLE), 2) AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """

ORACLE_SQL["a6_lag_lead"] = f"""
        SELECT event_id, user_id, ts_us,
               ROUND(value - lag(value) OVER w, 2) AS delta_prev,
               ROUND(lead(value) OVER w - value, 2) AS delta_next
        FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM ({_EV}))
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    """

ORACLE_SQL["a7_percentiles"] = """
        SELECT c_mktsegment,
               ROUND(quantile_cont(c_acctbal, 0.25), 4) AS p25,
               ROUND(quantile_cont(c_acctbal, 0.50), 4) AS p50,
               ROUND(quantile_cont(c_acctbal, 0.75), 4) AS p75,
               ROUND(AVG(c_acctbal), 4) AS mean_bal
        FROM customer GROUP BY c_mktsegment
    """

ORACLE_SQL["a2b_multi_window"] = f"""
        SELECT event_id, user_id, ts_us,
               COUNT(*) OVER w7 AS cnt_7d,
               ROUND(SUM(cents) OVER w7 / 100.0, 2) AS sum_7d,
               COUNT(*) OVER w30 AS cnt_30d,
               CAST((SUM(cents) OVER w30 * 100) // (COUNT(*) OVER w30)
                    AS BIGINT) AS avg_30d_e4
        FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                     CAST(ROUND(value * 100) AS BIGINT) AS cents FROM ({_EV}))
        WINDOW
          w7 AS (PARTITION BY user_id ORDER BY ts_us
                 RANGE BETWEEN {7 * 24 * 3600 * 1_000_000} PRECEDING AND CURRENT ROW),
          w30 AS (PARTITION BY user_id ORDER BY ts_us
                  RANGE BETWEEN {30 * 24 * 3600 * 1_000_000} PRECEDING AND CURRENT ROW)
    """

ORACLE_SQL["a8_rank_family"] = """
        SELECT o_custkey, o_orderkey,
               CAST(rank() OVER w AS BIGINT) AS rnk,
               CAST(dense_rank() OVER w AS BIGINT) AS drnk,
               ROUND(percent_rank() OVER w, 6) AS prnk,
               ROUND(cume_dist() OVER w, 6) AS cdist,
               CAST(ntile(4) OVER w AS BIGINT) AS quartile
        FROM orders WHERE o_custkey < 500
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """

ORACLE_SQL["a9_stats_agg"] = """
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
               ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
               ROUND(stddev_samp(l_extendedprice), 4) AS std_price,
               ROUND(var_samp(l_discount), 6) AS var_discount,
               ROUND(skewness(l_extendedprice), 4) AS skew_price,
               ROUND(kurtosis(l_extendedprice), 4) AS kurt_price
        FROM lineitem GROUP BY l_returnflag
    """

# a4/a10: the HLL estimate is engine-specific, so the contract checked
# cross-engine is (exact distinct count, within_tolerance=TRUE); Spark
# computes the boolean from its own estimate, the oracle asserts it.
ORACLE_SQL["a4_approx_distinct"] = f"""
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
               TRUE AS within_tolerance
        FROM ({_EV}) GROUP BY event_type
    """

ORACLE_SQL["a10_hll_sketch"] = """
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
               TRUE AS within_tolerance
        FROM lineitem GROUP BY l_returnflag
    """

# salted two-stage distinct == plain COUNT(DISTINCT): the salt is a
# pure function of the value, so per-salt counts are disjoint
ORACLE_SQL["a11_distinct_salted"] = f"""
        SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
        FROM ({_EV}) GROUP BY event_type
    """

# identical equi-width histogram (width 0.0625 = 2^-4: exact doubles)
ORACLE_SQL["a12_quantile_hist"] = """
        WITH h AS (
            SELECT l_returnflag,
                   CAST(LEAST(GREATEST(floor((l_quantity - 0.0) / 0.0625), 0), 1023)
                        AS BIGINT) AS bin,
                   COUNT(*) AS cnt
            FROM lineitem GROUP BY 1, 2
        ),
        c AS (
            SELECT l_returnflag, bin, cnt,
                   SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin) AS cum,
                   SUM(cnt) OVER (PARTITION BY l_returnflag) AS total
            FROM h
        )
        SELECT l_returnflag,
               0.0 + MIN(CASE WHEN cum >= ceil(total * 0.5) THEN bin END) * 0.0625 AS p50,
               0.0 + MIN(CASE WHEN cum >= ceil(total * 0.95) THEN bin END) * 0.0625 AS p95,
               CAST(MAX(total) AS BIGINT) AS n_values
        FROM c GROUP BY l_returnflag
    """

ORACLE_SQL["a16_funnel"] = f"""
        WITH ev AS ({_EV}),
        fv AS (SELECT user_id, MIN(ts) AS fv FROM ev
               WHERE event_type = 'view' GROUP BY user_id),
        j AS (
            SELECT fv.user_id, fv.fv, MIN(b.ts) AS fb
            FROM fv LEFT JOIN ev b
              ON b.user_id = fv.user_id
             AND b.event_type = 'purchase'
             AND b.ts > fv.fv
             AND b.ts <= fv.fv + INTERVAL 2 HOUR
            GROUP BY fv.user_id, fv.fv
        )
        SELECT user_id, epoch_us(fv) AS first_view_us,
               fb IS NOT NULL AS converted,
               epoch_us(fb) - epoch_us(fv) AS convert_us
        FROM j
    """

ORACLE_SQL["a14_approx_percentile"] = f"""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 4) AS exact_p50,
           ROUND(quantile_cont(value, 0.9), 4) AS exact_p90,
           TRUE AS within_tolerance
    FROM ({_EV}) GROUP BY event_type
"""

# a20: identical ISO-week truncation both engines; join + count replay.
ORACLE_SQL["a20_retention_cohorts"] = f"""
    WITH ev AS ({_EV}),
    first AS (SELECT user_id, MIN(date_trunc('week', ts)) AS cohort
              FROM ev GROUP BY user_id),
    act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM ev),
    sizes AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_size
              FROM first GROUP BY cohort),
    tri AS (
        SELECT f.cohort, a.week, CAST(COUNT(*) AS BIGINT) AS n_active
        FROM act a JOIN first f USING (user_id)
        GROUP BY f.cohort, a.week
    )
    SELECT epoch_us(t.cohort) AS cohort_us,
           CAST((epoch_us(t.week) - epoch_us(t.cohort))
                // 604800000000 AS BIGINT) AS weeks_since,
           t.n_active, s.cohort_size,
           CAST(t.n_active * 10000 // s.cohort_size AS BIGINT) AS retention_e4
    FROM tri t JOIN sizes s USING (cohort)
"""

# a19: single-phase ranking replay of the salted two-phase sample.
ORACLE_SQL["a19_bottomk_sample"] = f"""
    WITH d AS (
        SELECT event_type, event_id,
               ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
                   AS draw
        FROM ({_EV})
    ),
    r AS (SELECT event_type, event_id,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY draw, event_id) AS sample_rank
          FROM d)
    SELECT event_type, CAST(sample_rank AS INTEGER) AS sample_rank, event_id
    FROM r WHERE sample_rank <= 5
"""

# a18: sketch build + probe replayed cell-for-cell (same md5 bucket family).
ORACLE_SQL["a18_cms_heavy_hitters"] = """
    WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
    rows_ AS (SELECT unnest([0, 1, 2]) AS r),
    cells AS (
        SELECT r, ('0x' || substr(md5(CAST(r AS VARCHAR) || ',' || k), 1, 8))
                      ::BIGINT % 64 AS b
        FROM ev CROSS JOIN rows_
    ),
    sketch AS (SELECT r, b, CAST(COUNT(*) AS BIGINT) AS cnt
               FROM cells GROUP BY r, b),
    probes AS (SELECT CAST(range AS VARCHAR) AS k FROM range(20)),
    pc AS (
        SELECT k, r, ('0x' || substr(md5(CAST(r AS VARCHAR) || ',' || k), 1, 8))
                         ::BIGINT % 64 AS b
        FROM probes CROSS JOIN rows_
    ),
    est AS (SELECT k, CAST(MIN(cnt) AS BIGINT) AS cms_est
            FROM pc JOIN sketch USING (r, b) GROUP BY k),
    exact AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS exact_cnt
              FROM ev JOIN probes USING (k) GROUP BY k)
    SELECT CAST(k AS BIGINT) AS user_id, exact_cnt, cms_est,
           cms_est >= exact_cnt AS bound_holds
    FROM est JOIN exact USING (k)
"""

ORACLE_SQL["a17_covariance_matrix"] = (
    f"WITH t AS (SELECT {_A17_QCOLS} FROM embeddings), "
    f"a AS (SELECT {_A17_AGGS} FROM t) {_A17_ARMS}"
)

ORACLE_SQL["a21_regr_family"] = """
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_fit,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           ROUND(regr_avgx(l_extendedprice, l_quantity), 4) AS avg_qty,
           ROUND(regr_avgy(l_extendedprice, l_quantity), 2) AS avg_price
    FROM lineitem GROUP BY l_returnflag
"""

ORACLE_SQL["a22_listagg"] = """
    WITH segs AS (
        SELECT n.n_name,
               string_agg(DISTINCT c.c_mktsegment, ','
                          ORDER BY c.c_mktsegment) AS segments,
               CAST(COUNT(*) AS BIGINT) AS n_cust
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    ),
    ranked AS (
        SELECT c_nationkey, c_custkey, c_acctbal,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer
    ),
    digest AS (
        SELECT n.n_name,
               string_agg(CAST(t.c_custkey AS VARCHAR), ','
                          ORDER BY t.c_acctbal DESC, t.c_custkey) AS top3_keys
        FROM ranked t JOIN nation n ON t.c_nationkey = n.n_nationkey
        WHERE t.rn <= 3
        GROUP BY n.n_name
    )
    SELECT s.n_name, s.segments, s.n_cust, d.top3_keys
    FROM segs s JOIN digest d ON s.n_name = d.n_name
"""

ORACLE_SQL["a24_bitmap_distinct"] = """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey + 1) AS BIGINT) AS n_parts_bitmap,
           CAST(COUNT(DISTINCT l_partkey + 1) AS BIGINT) AS n_parts_direct,
           TRUE AS merge_exact
    FROM lineitem GROUP BY l_returnflag
"""

ORACLE_SQL["a25_kmv_intersection"] = """
    WITH el AS (
        SELECT DISTINCT event_type,
               user_id * 100 + day(CAST(ts AS TIMESTAMP)) AS cell
        FROM events
    ),
    n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM el
          GROUP BY event_type),
    inter AS (
        SELECT a.event_type AS seg_a, b.event_type AS seg_b,
               CAST(COUNT(*) AS BIGINT) AS exact_inter
        FROM el a JOIN el b ON a.cell = b.cell
        WHERE a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT i.seg_a, i.seg_b,
           CAST(na.n + nb.n - i.exact_inter AS BIGINT) AS exact_union,
           i.exact_inter,
           TRUE AS union_ok,
           TRUE AS inter_ok
    FROM inter i
    JOIN n na ON na.event_type = i.seg_a
    JOIN n nb ON nb.event_type = i.seg_b
"""
