"""Relational / IO / aggregate / window / sort / set / scalar queries and the data-quality (dq) family.

Split from suite.py (round 4); assembled by suite.py."""

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



def q_dq4_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit across the star schema: orphan-row counts for
    every foreign key (orders->customer, lineitem->orders/part/supplier)
    as broadcast anti-join probes — the warehouse-wide integrity check a
    lake runs after every load. Each constraint is one scan of the fact
    with the (smaller) key side broadcast; counts are exact. Emitted as
    one row per constraint so new constraints append without schema
    change."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    checks = [
        ("orders.o_custkey->customer", o, "o_custkey",
         table(spark, sf_dir, "customer"), "c_custkey"),
        ("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey"),
        ("lineitem.l_partkey->part", li, "l_partkey",
         table(spark, sf_dir, "part"), "p_partkey"),
        ("lineitem.l_suppkey->supplier", li, "l_suppkey",
         table(spark, sf_dir, "supplier"), "s_suppkey"),
    ]
    out = None
    for name, fact, fk, dim, pk in checks:
        orphans = fact.select(F.col(fk).alias("__k__")).join(
            F.broadcast(dim.select(F.col(pk).alias("__k__"))), "__k__", "left_anti"
        )
        row = orphans.agg(
            F.lit(name).alias("constraint"),
            F.count("*").alias("n_orphans"),
        ).crossJoin(fact.agg(F.count("*").alias("n_fact_rows")))
        out = row if out is None else out.unionByName(row)
    return out.select("constraint", "n_orphans", "n_fact_rows")




def q_j1_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim-to-fact star join; region/nation are tiny -> explicit broadcast."""
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    out = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
    )
    return out


def q_j2_join_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact equi join (orders x lineitem) + aggregation."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_revenue"
            ),
        )
    )


def q_j3_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti join surface: customers with >=1 open order vs none."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    with_open = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey"
    ).withColumn("has_open", F.lit(1))
    without = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey"
    ).withColumn("has_open", F.lit(0))
    return with_open.unionByName(without)


# --------------------------------------------------------------------------- #
# Aggregations / windows
# --------------------------------------------------------------------------- #












def q_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "sum_disc_price"
        ),
        F.round(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            ),
            2,
        ).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


# --------------------------------------------------------------------------- #
# Sorts / top-k / set ops
# --------------------------------------------------------------------------- #


def q_s1_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def q_s2_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    out = top_k_per_group(
        orders,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
    )
    return out.select("o_custkey", "o_orderkey", "o_totalprice")


def q_u1_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_mktsegment")
    b = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey", "c_mktsegment")
    return a.unionByName(b).distinct()


# --------------------------------------------------------------------------- #
# X-ops: JSON, text, dedup, similarity, sessionize, streaming-equivalent
# --------------------------------------------------------------------------- #


def q_x5_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("long")
    )
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("k").alias("sum_k"),
        F.round(F.avg("k"), 4).alias("avg_k"),
    )


def q_w1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day window agg — the batch equivalent of the streaming
    ingest path (streaming/ runs the same plan via readStream)."""
    ev = table(spark, sf_dir, "events")
    out = ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    return out.select(
        _US(F.col("w.start")).alias("window_start_us"), "event_type", "n_events", "sum_value"
    )




def q_p1_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event counts per user into one column per event type."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _EVENT_TYPES)
    )


def q_w2_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 7-day window (1-day slide) counts per event_type — each event
    contributes to 7 windows; Spark aligns window starts to epoch days."""
    ev = table(spark, sf_dir, "events")
    out = ev.groupBy(F.window("ts", "7 days", "1 day").alias("w"), "event_type").agg(
        F.count("*").alias("n_events")
    )
    return out.select(
        _US(F.col("w.start")).alias("window_start_us"), "event_type", "n_events"
    )


# --------------------------------------------------------------------------- #
# Analytics: TPC-H-style multi-join/agg benchmarks, range join, percentiles
# --------------------------------------------------------------------------- #


def q_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: revenue of not-yet-shipped orders for one market
    segment, top-10 by revenue. Plan: the filtered customer key set is
    broadcast; lineitem<->orders shuffle on orderkey; the limit runs as
    TakeOrderedAndProject (per-partition top-k + merge, no global sort)."""
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-06-01")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-06-01")
    j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    )
    out = j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )
    return (
        out.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            _US(F.col("o_orderdate").cast("timestamp")).alias("o_orderdate_us"),
            "o_orderpriority",
        )
    )


def q_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where the lineitem's supplier and
    the ordering customer share a nation inside one region. Five-way join:
    region/nation broadcast, the fact joins shuffle on their keys, AQE free
    to re-plan at runtime."""
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    j = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return j.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count("*").alias("n_lineitems"),
    )


def q_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate. Every predicate reaches
    the parquet reader (PushedFilters); partial agg per partition then a
    single-row merge — zero shuffle of data rows at any scale."""
    li = table(spark, sf_dir, "lineitem")
    out = li.filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return out.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        F.count("*").alias("n_items"),
    )


def q_r1_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi range join: orders against a tiny quarter-calendar dim
    (q_start <= o_orderdate < q_end). The dim is broadcast so Spark runs a
    BroadcastNestedLoopJoin — the right plan at any fact scale (the fact
    side streams; only the 8-row dim is replicated). Dim timestamps are cast
    to TIMESTAMP_NTZ so the big side needs no per-row cast."""
    rows = []
    for y in (1996, 1997):
        for qi, m in enumerate((1, 4, 7, 10), start=1):
            end_y, end_m = (y, m + 3) if m < 10 else (y + 1, 1)
            rows.append((f"{y}Q{qi}", f"{y}-{m:02d}-01", f"{end_y}-{end_m:02d}-01"))
    quarters = spark.createDataFrame(rows, ["quarter", "q_start", "q_end"]).select(
        "quarter",
        F.col("q_start").cast("timestamp_ntz").alias("q_start"),
        F.col("q_end").cast("timestamp_ntz").alias("q_end"),
    )
    orders = table(spark, sf_dir, "orders")
    j = orders.join(
        F.broadcast(quarters),
        (F.col("o_orderdate") >= F.col("q_start")) & (F.col("o_orderdate") < F.col("q_end")),
    )
    return j.groupBy("quarter").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


def q_d1_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar date-kernel coverage: trunc, year/quarter, day-of-week,
    datediff — all whole-stage-codegen expressions over one scan."""
    orders = table(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("timestamp")
    return orders.select(
        "o_orderkey",
        _US(F.date_trunc("month", od)).alias("month_us"),
        F.year(od).alias("yr"),
        F.quarter(od).alias("qtr"),
        F.dayofweek(od).alias("dow"),
        F.datediff(F.lit("1999-01-01").cast("date"), od.cast("date")).alias("days_to_1999"),
    )




def q_g1_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((rf), (ls), ()) with grouping() null-markers —
    complements a5's cube/rollup (one expand + one shuffle)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []], "l_returnflag", "l_linestatus"
    ).agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.grouping("l_returnflag").cast("int").alias("g_rf"),
        F.grouping("l_linestatus").cast("int").alias("g_ls"),
    )


def q_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers whose single order exceeds a quantity
    threshold (HAVING over a grouped sum, semi-joined back to the facts).
    The HAVING subquery output (few keys) broadcasts into the main join."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
        .select("l_orderkey")
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    j = (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
    )
    return j.groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice").agg(
        F.round(F.sum("l_quantity"), 2).alias("total_qty")
    )




def q_u2_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-op surface: customers with orders in BOTH 1996 and 1997
    (INTERSECT) minus any customer with an urgent 1997 order (EXCEPT)."""
    orders = table(spark, sf_dir, "orders")
    y96 = orders.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_custkey")
    y97 = orders.filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_custkey")
    urgent97 = orders.filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
        & (F.col("o_orderpriority") == "1-URGENT")
    ).select("o_custkey")
    return y96.intersect(y97).exceptAll(urgent97.distinct())




def q_arr1_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar-kernel coverage over the embedding column: max/min,
    distinct-count, sort + element_at, position, slice, size — all JVM
    codegen expressions, one scan, no shuffle (the array never explodes)."""
    emb = table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    return emb.select(
        "vec_id",
        F.round(F.array_max(e).cast("double"), 6).alias("v_max"),
        F.round(F.array_min(e).cast("double"), 6).alias("v_min"),
        F.size(F.array_distinct(e)).alias("n_distinct"),
        F.round(F.element_at(F.sort_array(e), 2).cast("double"), 6).alias("second_min"),
        F.array_position(e, F.array_max(e)).cast("int").alias("argmax_pos"),
        F.size(e).alias("dim"),
    )




def q_p2_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """melt / UNPIVOT: wide per-returnflag aggregates to long
    (flag, metric, value) triples — the inverse of p1_pivot. Spark's
    unpivot is a zero-shuffle Expand node over the 3-row agg output;
    rounding happens BEFORE the melt so both engines emit identical
    doubles per metric."""
    li = table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
        F.round(F.sum("l_discount"), 2).alias("sum_disc"),
    )
    return agg.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_base", "sum_disc"], "metric", "value"
    )


def q_map1_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType scalar kernel: build a map from event fields
    (map_from_arrays), then map_filter / transform_values (higher-order
    lambdas on the JVM), element_at and map_keys — one scan, zero
    shuffle, all codegen; the oracle reproduces each lane with plain
    CASE arithmetic. Insertion order of map_from_arrays is preserved,
    so the key-join string is deterministic."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    k = F.get_json_object("props", "$.k").cast("double")
    m = F.map_from_arrays(
        F.array(F.lit("v"), F.lit("v2"), F.lit("k")),
        F.array(F.col("value"), F.col("value") * 2, k),
    )
    big = F.map_filter(m, lambda _, v: v > F.lit(10.0))
    scaled = F.transform_values(m, lambda _, v: F.round(v / 10.0, 4))
    return ev.select(
        "event_id",
        F.size(big).alias("n_big"),
        F.element_at(scaled, F.lit("v")).alias("v_scaled"),
        F.element_at(scaled, F.lit("k")).alias("k_scaled"),
        F.array_join(F.map_keys(big), ",").alias("big_keys"),
    )


def q_r2_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (the batch twin of a watermarked stream-stream
    join): every purchase within 2 hours AFTER a view by the same user.
    Equi key (user_id) + time-range residual → one shuffle on user_id,
    SMJ/hash with the band predicate evaluated as a residual; this is
    exactly the state-bounding condition Structured Streaming derives
    its stream-stream join watermark retention from
    (streaming/ingest.py stream_stream_join)."""
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
        F.col("event_id").alias("buy_id"),
    )
    j = views.join(
        buys,
        (F.col("v_user") == F.col("b_user"))
        & (F.col("b_ts") > F.col("v_ts"))
        & (F.col("b_ts") <= F.col("v_ts") + F.expr("INTERVAL 2 HOURS")),
    )
    return j.select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "buy_id",
        _US("v_ts").alias("view_us"),
        _US("b_ts").alias("buy_us"),
    )


def q_arr2_vector_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid — elementwise mean over an
    array<float> column, computed the SCALE way: one avg aggregate per
    dimension over element_at (64 JVM-side aggregates, map-side partial
    merge, ONE shuffle of 64 doubles per label). The naive rewrite —
    posexplode to (row x dim) then groupBy — shuffles |rows| x 64
    exploded rows; this plan shuffles nothing but the partial-agg
    state. Output stays long-form (label, dim, coord) for a stable
    oracle shape."""
    emb = table(spark, sf_dir, "embeddings")
    dim = 64
    cents = emb.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        *[
            F.round(F.avg(F.element_at("embedding", i + 1)), 6).alias(f"c{i}")
            for i in range(dim)
        ],
    )
    stack = (
        f"stack({dim}, "
        + ", ".join(f"{i + 1}, c{i}" for i in range(dim))
        + ") as (dim, coord)"
    )
    return cents.selectExpr("label", "n_vecs", stack).select(
        "label", "n_vecs", F.col("dim").cast("int").alias("dim"), "coord"
    )


def q_dq1_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality column profiler — the first pass every training-data
    pipeline runs on a new source: per column, row/null/distinct counts
    and min/max/mean, computed in ONE scan. The 4 exact countDistincts
    fold into one Expand-based aggregate (one pass over the data); the
    wide one-row result is melted to one row per column with stack() —
    a Generate over a 1-row plan, free. (A union-of-selects melt would
    let column pruning split this into 4 independent scans of the fact
    — measured and rejected.) At 100 TB the scan is the cost;
    everything else is O(1)."""
    li = table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.round(F.min(c), 4).alias(f"{c}__min"),
            F.round(F.max(c), 4).alias(f"{c}__max"),
            F.round(F.avg(c), 4).alias(f"{c}__avg"),
        ]
    row = li.agg(*aggs)
    stack = (
        f"stack({len(cols)}, "
        + ", ".join(
            f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max, {c}__avg"
            for c in cols
        )
        + ") as (col_name, n_nulls, n_distinct, min_val, max_val, avg_val)"
    )
    return row.selectExpr("n_rows", stack).select(
        "col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val", "avg_val"
    )




# --------------------------------------------------------------------------- #
# round-2 additions: skew-safe aggs, chunking, PII, repetition, quantization
# --------------------------------------------------------------------------- #






def q_dq2_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier profile per event type (operators/agg.py
    iqr_outlier_stats): exact Q1/Q3 fences broadcast back onto the fact,
    outlier count as a map-side filter — the fact is shuffled once (for
    the percentiles), never re-shuffled for the count."""
    from .operators.agg import iqr_outlier_stats

    ev = table(spark, sf_dir, "events")
    return iqr_outlier_stats(ev, ["event_type"], "value")


def q_dq3_feature_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature drift between two populations (PSI profile): compare the
    distribution of `value` in the first vs second half of the events
    stream per event_type, over 10 fixed-width bins. Output is per-bin —
    integer counts plus a 6dp-rounded PSI term — so no cross-row float
    aggregation exists anywhere (per-bin terms are deterministic scalar
    math on exact counts; the headline PSI is the sum of a 10-row
    column the consumer can take). Laplace +1 smoothing keeps empty bins
    finite. One scan, one shuffle on (event_type, bin)."""
    ev = table(spark, sf_dir, "events")
    mid = ev.select(F.expr("percentile(unix_micros(ts), 0.5)").alias("m")).collect()[
        0
    ]["m"]
    half = F.when(F.unix_micros("ts") <= F.lit(int(mid)), 0).otherwise(1)
    bin_ = F.least(F.floor(F.col("value") / 50.0).cast("int"), F.lit(9))
    counts = (
        ev.select(half.alias("half"), bin_.alias("bin"), "event_type")
        .groupBy("event_type", "bin")
        .agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("n_early"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("n_late"),
        )
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("n_early").alias("t_early"), F.sum("n_late").alias("t_late")
    )
    j = counts.join(F.broadcast(tot), "event_type")
    p = (F.col("n_early") + 1) / (F.col("t_early") + 10)
    q = (F.col("n_late") + 1) / (F.col("t_late") + 10)
    return j.select(
        "event_type",
        "bin",
        "n_early",
        "n_late",
        F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
    )




def q_b1_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located (bucketed) join — the 100 TB fact-to-fact join story.

    Both orders and lineitem are written once as bucketed+sorted managed
    tables on the join key (``bucketBy(8, orderkey).sortBy(orderkey)``),
    so the join itself needs NO exchange and NO sort on either side: each
    task zips bucket i of orders with bucket i of lineitem. At scale the
    shuffle is paid once at ingest; every subsequent join on the bucket
    key is map-side. Plan-gated in tests/test_plans.py: exactly one
    Exchange (the final groupBy), none below the SortMergeJoin.

    Reference parity: the reference joins feature tables to spines by
    sorted-merge over its pandas index (store.py:261-308 get_training_set);
    bucketing is the distributed equivalent of keeping tables pre-sorted
    on the entity key.
    """
    joined = build_bucketed_join(spark, sf_dir)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.countDistinct("o_orderkey").alias("n_orders"),
    )


def q_dq5_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic between the click
    and view populations of `value` — the distribution-level check dq3's
    per-bin PSI can't give (KS is binning-free up to the cent
    quantization and catches shape drift PSI smooths over). Exact
    integer math end to end: D's numerator is max |c1*n2 - c2*n1| over
    the pooled support (cross-multiplied empirical CDFs — no float
    division until the final scalar, emitted as BIGINT ks_e6).

    Plan: one scan -> groupBy(cent-quantized value) partial-agg -> one
    ordered cumulative window over the DISTINCT support (bounded by
    quantization: |support| <= value_range * 100, independent of row
    count — that bound is what makes the global cumulative window safe
    at 100 TB; the raw-row sort a naive rank-based KS needs is not).
    Overflow: c*n products < n1*n2 <= (rows/2)^2 -> exact below ~3e9
    rows per side."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    b = ev.select(
        F.floor(F.col("value") * 100).cast("long").alias("v"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is1"),
    )
    g = b.groupBy("v").agg(
        F.sum("is1").alias("c1"), F.sum(1 - F.col("is1")).alias("c2")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = g.select(
        F.sum("c1").over(w).alias("cc1"), F.sum("c2").over(w).alias("cc2")
    )
    totals = g.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    return (
        cum.crossJoin(F.broadcast(totals))
        .agg(
            F.first("n1").alias("n1"),
            F.first("n2").alias("n2"),
            F.max(F.abs(F.col("cc1") * F.col("n2") - F.col("cc2") * F.col("n1"))).alias(
                "d_num"
            ),
        )
        .withColumn("ks_e6", F.expr("(d_num * 1000000) DIV (n1 * n2)"))
    )






def q_dq6_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data LEAKAGE audit — the data-quality check that makes
    PIT joins (f7) worth their cost. For every training-spine row
    (purchase events), compare what a PIT-correct pipeline reads (latest
    feature <= spine ts; f4's argmax) against what the sloppy-but-common
    pipeline reads (the CURRENT feature table — latest event overall):
    a spine row is CONTAMINATED when the user's latest event is newer
    than the spine timestamp, i.e. a plain join would silently train on
    the future. Output is the per-user audit report (rows, contaminated
    rows, integer leak rate). Plan: one partial-agg max(ts) per user
    joined back on the user key — no window over history, scales as the
    key count; the spine is scanned once. The reference's PIT cutoff
    (store.py:218-259 timestamp filter) is the behavior whose absence
    this op quantifies."""
    ev = table(spark, sf_dir, "events")
    spine = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("spine_ts")
    )
    latest = ev.groupBy("user_id").agg(F.max("ts").alias("latest_ts"))
    flagged = spine.join(latest, "user_id").select(
        "user_id", (F.col("latest_ts") > F.col("spine_ts")).cast("long").alias("leak")
    )
    return flagged.groupBy("user_id").agg(
        F.count("*").alias("n_rows"),
        F.sum("leak").alias("n_contaminated"),
        F.expr("sum(leak) * 1000000L div count(*)").alias("leak_rate_e6"),
    )


def q_r3_interval_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r2's interval join as a LEFT OUTER — views with NO purchase in
    their 2-hour band survive null-padded (the abandonment/no-conversion
    lane a funnel analysis needs; a16 counts conversions, this keeps the
    non-converters as rows). Batch twin of
    stream_stream_join(how='left_outer') — the streaming side emits the
    identical null rows, just delayed by band+watermark (state eviction);
    pytest pins the subset relationship. Same plan shape as r2: one
    shuffle on user_id, band residual on the SMJ — the null padding is
    free."""
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
        F.col("event_id").alias("buy_id"),
    )
    j = views.join(
        buys,
        (F.col("v_user") == F.col("b_user"))
        & (F.col("b_ts") > F.col("v_ts"))
        & (F.col("b_ts") <= F.col("v_ts") + F.expr("INTERVAL 2 HOURS")),
        "left",
    )
    return j.select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "buy_id",
        _US("v_ts").alias("view_us"),
        _US("b_ts").alias("buy_us"),
    )




def q_dq7_lateness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness profile — the statistic that DESIGNS a watermark.
    Treating event_id as arrival order, each event's lateness is how far
    its event time lags the per-user running maximum seen before it;
    the bucketed histogram (on-time / <1m / <10m / <1h / <6h / >=6h)
    tells you what `withWatermark` delay actually covers what fraction
    of the feed — choose it blind and you either drop data or hold state
    forever (streaming/ingest.py's watermark knobs cite this). The
    testdata ships no arrival column (events are perfectly time-ordered),
    so ARRIVAL IS SIMULATED: arrival = event time + a deterministic md5
    delay in [0, 48h) — the documented harness part; the measurement
    itself (running event-time max over arrival order) is exactly what
    you'd run on a real feed's ingest timestamp. Plan: one window per
    user over arrival order (single shuffle), integer microsecond
    lateness, <=5-row output."""
    ev = table(spark, sf_dir, "events")
    delay = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 172_800_000_000
    )
    arr = ev.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        (F.unix_micros("ts") + delay).alias("arrival_us"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("arrival_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    late = F.greatest(
        F.lit(0).cast("long"),
        F.coalesce(
            F.max("ts_us").over(w) - F.col("ts_us"), F.lit(0).cast("long")
        ),
    )
    bucketed = arr.select(
        F.when(late == 0, "on_time")
        .when(late < 3_600_000_000, "lt_1h")
        .when(late < 21_600_000_000, "lt_6h")
        .when(late < 86_400_000_000, "lt_24h")
        .otherwise("ge_24h")
        .alias("bucket"),
        late.alias("late_us"),
    )
    return bucketed.groupBy("bucket").agg(
        F.count("*").alias("n_events"), F.max("late_us").alias("max_late_us")
    )




def q_j4_bloom_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit Bloom-filter join pruning — the runtime-filter pattern for
    when the dim key set is too large to ship as an IN-list but a bit
    set is cheap: BUILDING-segment customers hash to 2 md5 positions in
    an m=8192 space; orders pass the probe iff BOTH positions are set.
    The no-false-negative guarantee and the measured false-positive rate
    are both emitted as checked integers (candidates >= true matches by
    construction; fp rate over true negatives in ppm). Plan: the
    position table (<= m rows, deduped) broadcasts; the probe is two
    broadcast semi joins — the fact is never shuffled, which is the
    whole point at 100 TB. The exact-verify arm is the ground-truth semi
    join the filter would precede in production. m scales with dim
    cardinality (bits-per-key tunes fp; 2 hashes here keep the oracle
    compact)."""
    M = 8192
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    dim = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )

    def h(key_col, i: int):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(key_col.cast("string"), F.lit(f":{i}"))), 1, 15
                ),
                16,
                10,
            ).cast("long")
            % M
        )

    bits = (
        dim.select(F.explode(F.array(h(F.col("k"), 1), h(F.col("k"), 2))).alias("pos"))
        .distinct()
    )
    probed = orders.select(
        "o_orderkey",
        "o_custkey",
        h(F.col("o_custkey"), 1).alias("p1"),
        h(F.col("o_custkey"), 2).alias("p2"),
    )
    cand = probed.join(
        F.broadcast(bits.withColumnRenamed("pos", "p1")), "p1", "left_semi"
    ).join(F.broadcast(bits.withColumnRenamed("pos", "p2")), "p2", "left_semi")
    true_m = orders.join(
        F.broadcast(dim.withColumnRenamed("k", "o_custkey")), "o_custkey", "left_semi"
    )
    return (
        orders.agg(F.count("*").alias("n_orders"))
        .crossJoin(cand.agg(F.count("*").alias("n_candidates")))
        .crossJoin(true_m.agg(F.count("*").alias("n_true")))
        .select(
            "n_orders",
            "n_candidates",
            "n_true",
            (F.col("n_candidates") - F.col("n_true")).alias("n_false_pos"),
            F.when(
                F.col("n_orders") > F.col("n_true"),
                F.expr("(n_candidates - n_true) * 1000000L div (n_orders - n_true)"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("fp_ppm"),
        )
    )


def q_card1_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus data card — the one-page per-language summary every released
    training set ships with (docs, token volume, mean length, exact-dup
    and short-doc rates), computed in ONE pass over the corpus: per-doc
    facts are map-side projections; the rollup is a single partial-agg
    groupBy on language with countDistinct on the 16-byte normalized
    hash (dup count = docs - distinct texts). All rates are integer e4.
    The output is |languages| rows at any corpus size."""
    docs = table(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        F.col("n_chars").cast("long").alias("nc"),
        F.size(F.split("text", " ")).cast("long").alias("nt"),
        F.md5(F.lower(F.trim("text"))).alias("hh"),
        F.when(F.col("n_chars") < 100, 1).otherwise(0).cast("long").alias("short"),
    )
    return d.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("nt").alias("total_tokens"),
        F.expr("sum(nc) div count(*)").alias("mean_chars"),
        (F.count("*") - F.countDistinct("hh")).cast("long").alias("n_exact_dups"),
        F.expr("(count(*) - count(distinct hh)) * 10000L div count(*)").alias("dup_e4"),
        F.sum("short").alias("n_short"),
        F.expr("sum(short) * 10000L div count(*)").alias("short_e4"),
    )

def q_j5_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic salted shuffle join (operators/skew.py salted_join):
    events join their per-user first-seen dim on (user_id, salt) with
    the salt md5-derived from event_id — the structural answer when AQE's
    skew split isn't enough because one hot entity still funnels into a
    single reducer. The dim is replicated 16x (map-only explode); result
    is EXACTLY the unsalted join, which is what the plain-join oracle
    checks. The merge hint pins the shuffle-join shape the salt exists
    for (at test scale the optimizer would otherwise broadcast the dim
    and hide the salted exchange this query demonstrates); SKEW.md
    measures the hot-key behavior."""
    from .operators.skew import salted_join

    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    dim = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
        .hint("merge")
    )
    j = salted_join(ev, dim, "user_id", salt_by="event_id", n_salts=16)
    age_days = F.expr(
        "(unix_micros(ts) - unix_micros(first_ts)) div 86400000000L"
    )
    return j.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(age_days).cast("long").alias("sum_age_days"),
    )


def q_dq9_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectation suite — the Great-Expectations shape: a
    config of row-level rules evaluated warehouse-wide in one pass per
    table, one output row per rule with pass/fail accounting (rates as
    integer e4). Rules cover the standard families: range, value-set,
    regex, cross-column ordering, and key uniqueness. Plan: each rule is
    a map-side CASE folded into its table's single aggregate — adding a
    rule adds one expression, never a scan; uniqueness rides the same
    aggregate as count - countDistinct. At 100 TB this is the nightly
    contract check before data ships to training."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    cust = table(spark, sf_dir, "customer")

    def rule(name: str, agg_df: DataFrame) -> DataFrame:
        return agg_df.select(
            F.lit(name).alias("rule"),
            F.col("n").cast("long").alias("n_rows"),
            F.col("p").cast("long").alias("n_pass"),
            (F.col("n") - F.col("p")).cast("long").alias("n_fail"),
            F.expr("p * 10000L div n").cast("long").alias("pass_e4"),
        )

    o_agg = orders.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("o_totalprice") > 0, 1).otherwise(0)).alias("p"),
        F.sum(F.when(F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)).alias(
            "p2"
        ),
        F.countDistinct("o_orderkey").alias("p3"),
    )
    r1 = rule("orders_totalprice_positive", o_agg.select("n", "p"))
    r2 = rule(
        "orders_status_in_set", o_agg.select("n", F.col("p2").alias("p"))
    )
    r3 = rule(
        "orders_orderkey_unique", o_agg.select("n", F.col("p3").alias("p"))
    )
    c_agg = cust.agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("c_name").rlike("^Customer#[0-9]{9}$"), 1).otherwise(0)
        ).alias("p"),
    )
    r4 = rule("customer_name_format", c_agg)
    l_agg = li.agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(
                (F.col("l_discount") >= 0)
                & (F.col("l_discount") <= 1)
                & (F.col("l_tax") >= 0),
                1,
            ).otherwise(0)
        ).alias("p"),
    )
    r5 = rule("lineitem_rates_in_unit_range", l_agg)
    return r1.unionByName(r2).unionByName(r3).unionByName(r4).unionByName(r5)


def q_s4_tablesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in Bernoulli ``df.sample`` (TABLESAMPLE) witnessed with a
    tolerance oracle, a4-style: the draw itself is engine-specific (x13
    is the deterministic md5 variant both engines can replay; THIS query
    covers Spark's native sampler — map-only, no shuffle, the sampler
    every pipeline reaches for first). Output carries the exact
    population count plus two self-computed acceptance booleans: the
    sampled fraction within 5 sigma of the target rate (binomial bound,
    computed from the actual n — holds at every SF) and the sampled
    mean of l_quantity within 5 standard errors of the population mean.
    The DuckDB twin emits the exact count and literal TRUEs — a
    deterministic hash match that still fails if Spark's sampler drifts
    outside its statistical contract."""
    li = table(spark, sf_dir, "lineitem").select("l_quantity")
    frac = 0.2
    s = li.sample(fraction=frac, seed=42)
    pop = li.agg(
        F.count("*").alias("n_total"),
        F.avg("l_quantity").alias("mu"),
        F.stddev_pop("l_quantity").alias("sd"),
    )
    samp = s.agg(
        F.count("*").alias("n_samp"), F.avg("l_quantity").alias("mu_s")
    )
    j = pop.crossJoin(samp)  # two 1-row aggregates
    return j.select(
        F.col("n_total").cast("long").alias("n_total"),
        (
            F.abs(F.col("n_samp") / F.col("n_total") - F.lit(frac))
            <= F.lit(5.0)
            * F.sqrt(F.lit(frac * (1 - frac)) / F.col("n_total"))
        ).alias("frac_ok"),
        (
            F.abs(F.col("mu_s") - F.col("mu"))
            <= F.lit(5.0) * F.col("sd") / F.sqrt(F.col("n_samp"))
        ).alias("mean_ok"),
    )


def q_x30_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT lane (Spark 4): ``try_parse_json`` turns
    the JSON string column into the binary VARIANT encoding ONCE, and
    ``variant_get`` extracts typed fields WITHOUT re-parsing — the
    storage answer for JSON at 100 TB (parse at ingest, shredded
    binary reads thereafter), vs x28's per-query from_json parse. The
    same tenth-of-the-feed corrupt lane rides through: try_parse_json
    yields NULL variant, variant_get propagates NULL, and the
    accounting separates quarantine from values — proving the
    try_/NULL contract of the variant path. All expressions are JVM
    codegen on the scan; one partial-agg shuffle."""
    ev = table(spark, sf_dir, "events")
    js = F.when(
        F.col("event_id") % 10 == 0, F.substring("props", 1, 5)
    ).otherwise(F.col("props"))
    v = F.try_parse_json(js)
    return (
        ev.select(
            "event_type",
            F.variant_get(v, "$.k", "long").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.when(F.col("k").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_bad"),
            F.sum("k").cast("long").alias("sum_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
    )


def q_dq11_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass piggybacked QA metrics via the ``Dataset.observe`` /
    ``Observation`` API — the production pattern dq9's second-scan
    expectation suite cannot match at 100 TB: the metrics ride THE SAME
    physical pass as the main job (here a noop sink standing in for the
    training-shard write), so data ships and is audited in one scan,
    with zero extra jobs (DISTINCT aggregates are disallowed by the API
    — use approx_count_distinct there). The observed aggregates are
    accumulator-style partial aggs merged on the driver — exactly-once per row regardless
    of task retries (Spark's observe contract). The witness re-emits
    the collected metrics as a 1-row frame; the oracle computes the
    same aggregates directly — equality proves the piggybacked path
    loses nothing vs a dedicated scan."""
    from pyspark.sql import Observation

    ev = table(spark, sf_dir, "events")
    obs = Observation("dq11")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
            "sum_cents"
        ),
        F.min("event_id").alias("min_event"),
        F.max("event_id").alias("max_event"),
    )
    # the "real" job whose pass the metrics ride (noop training-shard write)
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                int(m["sum_cents"]),
                int(m["min_event"]),
                int(m["max_event"]),
            )
        ],
        "n_rows long, sum_cents long, min_event long, max_event long",
    )


def q_j6_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``eqNullSafe`` / SQL ``<=>`` — the last
    unwitnessed join predicate form): NULL join keys MATCH each other
    instead of vanishing, the semantics dimension-lookup pipelines need
    when 'unknown' is itself a dimension member (SCD dims keep an
    explicit NULL/'unknown' row exactly for this). One customer segment
    is mapped to NULL via nullif, the 5-row code dim (declared inline,
    LocalRelation) carries a NULL member, and the null-safe broadcast
    join routes the NULL-key customers to it — a plain equi-join would
    silently drop all of them, which the n-per-code accounting would
    expose. Physically identical to j1: broadcast hash join with the
    null-safe comparator, fact side never shuffles."""
    cust = table(spark, sf_dir, "customer").select(
        F.expr("nullif(c_mktsegment, 'BUILDING')").alias("seg_key"),
        "c_acctbal",
    )
    dim = spark.sql(
        """
        SELECT * FROM VALUES
            ('MACHINERY', 1), ('AUTOMOBILE', 2), ('HOUSEHOLD', 3),
            ('FURNITURE', 4), (CAST(NULL AS STRING), 0)
            AS t(seg_key, seg_code)
        """
    )
    j = cust.join(
        F.broadcast(dim), cust["seg_key"].eqNullSafe(dim["seg_key"]), "inner"
    )
    return j.groupBy("seg_code").agg(
        F.count("*").cast("long").alias("n_cust"),
        F.sum(F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)))
        .cast("long")
        .alias("bal_cents"),
    )




def q_x28_from_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-enforced JSON parsing of a string COLUMN via ``from_json``
    (x5 covers untyped path extraction; this is the typed production
    lane: declared schema, struct output, malformed input -> NULL row
    instead of a crash). A tenth of the feed is deliberately truncated
    to invalid JSON ('{\"k\":' — unparseable in any engine), and the
    per-type accounting separates parse failures from parsed values —
    the quarantine-vs-accept split an ingestion pipeline reports. The
    parse is a JVM codegen expression on the scan (no UDF, no
    shuffle before the partial agg); DuckDB's json_valid +
    json_extract_string replay both lanes exactly."""
    ev = table(spark, sf_dir, "events")
    js = F.when(
        F.col("event_id") % 10 == 0, F.substring("props", 1, 5)
    ).otherwise(F.col("props"))
    p = F.from_json(js, "k long")
    return ev.select("event_type", p.getField("k").alias("k")).groupBy(
        "event_type"
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.when(F.col("k").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_bad"),
        F.sum("k").cast("long").alias("sum_k"),
        F.round(F.avg("k"), 4).alias("avg_k"),
    )




_BENFORD_PPM = {
    d: int(__import__("math").log10(1 + 1 / d) * 1_000_000) for d in range(1, 10)
}


def q_dq17_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-ANONYMITY release gate (operators/privacy.py; Sweeney 2002) —
    the re-identification audit a training set must pass before leaving
    the platform: after direct identifiers are redacted (t7), the
    QUASI-identifier combinations left behind — here (event_type, day,
    value band) — can still pin a row to < k people. Per event_type:
    group count, risky-group count (size < 5), risky ROW count (what
    suppression would drop) and the suppression rate in integer ppm.
    One partial-agg groupBy on the QI key + an O(groups) fold —
    integer-exact, the drift-report cost shape. At 100 TB the QI
    cardinality, not the row count, bounds everything after the
    map-side combine."""
    from .operators.privacy import k_anonymity_summary

    ev = table(spark, sf_dir, "events")
    qi = ev.select(
        "event_type",
        F.dayofmonth("ts").alias("day"),
        F.floor(F.col("value") / 20).cast("long").alias("val_band"),
    )
    out = k_anonymity_summary(
        qi, ["event_type", "day", "val_band"], k=5, by="event_type"
    )
    return out.select(
        "event_type", "n_groups", "n_risky_groups", "n_rows",
        "n_risky_rows", "suppression_ppm",
    )


def q_dq13_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit — the classic fabricated-
    numbers detector (forensic accounting's screen, equally useful for
    catching synthetic/defaulted values polluting a money column): the
    leading digit of naturally-occurring multiplicative amounts follows
    log10(1+1/d), and a column whose digit histogram deviates hard is
    worth a human look. Integer-exact everywhere: digits come from the
    BIGINT floor's decimal string, observed shares are ppm via BIGINT
    DIV, and the expected table is a 9-row broadcast dim of
    pre-computed ppm literals (inlined IDENTICALLY into the oracle —
    no cross-engine log10 rounding surface). One scan + one 9-row
    partial agg; the deviation column is plain integer arithmetic."""
    o = table(spark, sf_dir, "orders")
    total = o.count()
    digit = F.substring(
        F.floor("o_totalprice").cast("long").cast("string"), 1, 1
    ).cast("long")
    exp = spark.createDataFrame(
        [(d, p) for d, p in _BENFORD_PPM.items()], "digit long, exp_ppm long"
    )
    obs = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count("*").cast("long").alias("n_obs")
    )
    return (
        exp.join(F.broadcast(obs), "digit", "left")
        .select(
            "digit",
            F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
            F.expr(f"coalesce(n_obs, 0) * 1000000 DIV {total}")
            .cast("long")
            .alias("obs_ppm"),
            "exp_ppm",
        )
        .withColumn(
            "dev_ppm", F.abs(F.col("obs_ppm") - F.col("exp_ppm")).cast("long")
        )
    )


def q_x32_try_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``try_``-prefixed arithmetic quarantine lanes (try_divide /
    try_element_at / try_to_number) — the NULL-on-error contract that
    keeps a 100 TB job ALIVE through the bad rows ANSI mode would kill
    it on, while still accounting for every quarantined value (the
    x28/x30 JSON philosophy applied to arithmetic). Three deliberate
    failure populations: a fifth of denominators forced to zero
    (try_divide -> NULL, not SIGFPE-style abort), element_at(3) probed
    against 1–4-element arrays (short arrays -> NULL, not
    out-of-bounds), and a mixed-format numeric string where only one
    shape matches the '999.99' grammar. All codegen expressions; the
    oracle replays each lane as explicit CASE guards — proving try_ is
    exactly sugar for the guard, never value-altering."""
    ev = table(spark, sf_dir, "events")
    denom = (F.col("event_id") % 5).cast("double")
    arr = F.sequence(F.lit(1), (F.col("event_id") % 4 + 1).cast("int"))
    t = ev.select(
        "event_type",
        F.try_divide(F.col("value"), denom).alias("rate"),
        F.try_element_at(arr, F.lit(3)).alias("third"),
        F.expr(
            "try_to_number(CASE WHEN event_id % 3 = 0 THEN "
            "concat(CAST(event_id % 100 AS STRING), '.5') "
            "ELSE 'n/a' END, '999.99')"
        ).alias("parsed"),
    )
    return t.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("rate").isNull().cast("long")).cast("long").alias("n_div0"),
        F.round(F.sum("rate"), 2).alias("sum_rate"),
        F.sum(F.col("third").isNull().cast("long"))
        .cast("long")
        .alias("n_short"),
        F.sum("third").cast("long").alias("sum_third"),
        F.sum(F.col("parsed").isNull().cast("long"))
        .cast("long")
        .alias("n_unparsed"),
        F.sum("parsed").cast("decimal(38,2)").cast("string").alias("sum_parsed"),
    )




def q_w3_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in ``session_window`` gap-merge aggregation in BATCH mode —
    the declarative sibling of the hand-built lag/cumsum sessionizer
    (x7) and the streaming form (sd3): Catalyst's SessionWindow node
    merges adjacent rows within the 30-minute gap during ONE
    sort-aggregate per key partition, no self-join, no window-function
    pass — the built-in every gap-sessionization should reach for
    first. Per (user, session): event count, cents total, and the
    session bounds (end = last event + gap by definition). The oracle
    replays with textbook gaps-and-islands, proving the built-in's
    merge semantics equal the manual form. Plan: one shuffle on
    user_id, sort, streaming session-merge aggregate — skew bounded by
    per-user event counts (the x7b bucketed variant is the hot-entity
    escape)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .select(
            "user_id",
            F.unix_micros("sw.start").alias("start_us"),
            F.unix_micros("sw.end").alias("end_us"),
            "n_events",
            "sum_cents",
        )
    )




def q_q25_sql_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (Spark 4 ``DECLARE`` / ``SET VARIABLE``) —
    the parameterized-query surface: a data-dependent scalar is computed
    ONCE into a typed session variable (here the round-to-cents median
    order price), then referenced by name in the consuming query, where
    Catalyst folds it as a literal — so the filter is a constant
    predicate pushed to the scan, NOT a rerun subquery per reference.
    The oracle inlines the identical scalar via a cross-joined 1-row
    CTE (DuckDB has no session variables — the semantic twin, not the
    syntax). Output: per order-status counts/cents above the median
    cutoff."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("q25_orders")
    spark.sql("DECLARE OR REPLACE VARIABLE q25_cutoff BIGINT")
    spark.sql(
        """SET VARIABLE q25_cutoff =
             (SELECT CAST(percentile_disc(0.5) WITHIN GROUP (
                        ORDER BY CAST(FLOOR(o_totalprice * 100 + 0.5)
                                      AS BIGINT)) AS BIGINT)
              FROM q25_orders)"""
    )
    return spark.sql(
        """
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_cents,
               q25_cutoff AS cutoff_cents
        FROM q25_orders
        WHERE CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) > q25_cutoff
        GROUP BY o_orderstatus
        """
    )


def q_num1_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL money arithmetic — the financial-correctness lane
    every double-based aggregate in this suite sidesteps by rounding:
    prices cast to DECIMAL(12,2) at the scan, the Q1-style revenue
    expression computed under exact decimal multiplication (scale grows
    2->4->6 per SQL rules), and the group sums emitted as STRINGS so
    the value-hash gate pins every last digit — no float jitter, no
    tolerance, bit-identical across engines and across partition
    orders (decimal addition is associative; double addition is not).
    Plan-wise decimals ride whole-stage codegen (Decimal128 ops) with
    ordinary partial aggregation: exactness costs a constant factor,
    not a shape change — the reason a 100 TB ledger aggregates in
    decimal, not double."""
    li = table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    one = F.lit("1.00").cast("decimal(3,2)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(price).cast("decimal(38,2)").alias("s1"),
            F.sum((price * (one - disc)).cast("decimal(38,4)"))
            .cast("decimal(38,4)")
            .alias("s2"),
            F.sum(
                ((price * (one - disc)).cast("decimal(38,4)") * (one + tax)).cast(
                    "decimal(38,6)"
                )
            )
            .cast("decimal(38,6)")
            .alias("s3"),
            F.count("*").cast("long").alias("n"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("s1").cast("string").alias("sum_base"),
            F.col("s2").cast("string").alias("sum_disc"),
            F.col("s3").cast("string").alias("sum_charge"),
            "n",
        )
    )


QUERIES = {
    'dq1_column_profile': q_dq1_column_profile,
    'w3_session_window_batch': q_w3_session_window_batch,
    'dq13_benford_audit': q_dq13_benford_audit,
    'dq17_k_anonymity': q_dq17_k_anonymity,
    'x32_try_family': q_x32_try_family,
    'q25_sql_variables': q_q25_sql_variables,
    'num1_decimal_exact': q_num1_decimal_exact,
    'arr2_vector_centroids': q_arr2_vector_centroids,
    'p2_unpivot': q_p2_unpivot,
    'map1_map_functions': q_map1_map_functions,
    'r2_interval_join': q_r2_interval_join,
    'j1_join_broadcast': q_j1_join_broadcast,
    'j2_join_shuffle': q_j2_join_shuffle,
    'j3_semi_anti': q_j3_semi_anti,
    'q1_pricing_summary': q_q1_pricing_summary,
    'q3_shipping_priority': q_q3_shipping_priority,
    'q5_local_supplier': q_q5_local_supplier,
    'q6_forecast_revenue': q_q6_forecast_revenue,
    'r1_range_join': q_r1_range_join,
    'd1_date_functions': q_d1_date_functions,
    'g1_grouping_sets': q_g1_grouping_sets,
    'q18_large_orders': q_q18_large_orders,
    'u2_intersect_except': q_u2_intersect_except,
    's1_topk_orders': q_s1_topk_orders,
    's2_topk_per_group': q_s2_topk_per_group,
    'u1_union_by_name': q_u1_union_by_name,
    'x5_json_extract': q_x5_json_extract,
    'w1_tumbling_window': q_w1_tumbling_window,
    'p1_pivot': q_p1_pivot,
    'w2_sliding_window': q_w2_sliding_window,
    'arr1_array_functions': q_arr1_array_functions,
    'dq2_outliers': q_dq2_outliers,
    'b1_bucketed_join': q_b1_bucketed_join,
    'dq3_feature_drift': q_dq3_feature_drift,
    'dq5_ks_statistic': q_dq5_ks_statistic,
    'dq6_leakage_audit': q_dq6_leakage_audit,
    'r3_interval_left_join': q_r3_interval_left_join,
    'dq7_lateness_profile': q_dq7_lateness_profile,
    'dq4_referential_integrity': q_dq4_referential_integrity,
    'j4_bloom_probe': q_j4_bloom_probe,
    'card1_data_card': q_card1_data_card,
    'j5_salted_join': q_j5_salted_join,
    's4_tablesample': q_s4_tablesample,
    'j6_nullsafe_join': q_j6_nullsafe_join,
    'dq11_observed_metrics': q_dq11_observed_metrics,
    'x30_variant_extract': q_x30_variant_extract,
    'x28_from_json_typed': q_x28_from_json_typed,
    'dq9_expectations': q_dq9_expectations,
}

ORACLE_SQL: dict[str, str] = {
    "arr2_vector_centroids": """
        WITH cnt AS (
            SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs
            FROM embeddings GROUP BY 1
        ),
        ex AS (
            SELECT label,
                   unnest(embedding) AS v,
                   generate_subscripts(embedding, 1) AS dim
            FROM embeddings
        )
        SELECT ex.label, cnt.n_vecs, CAST(ex.dim AS INTEGER) AS dim,
               ROUND(AVG(ex.v), 6) AS coord
        FROM ex JOIN cnt USING (label)
        GROUP BY ex.label, cnt.n_vecs, ex.dim
    """,
    "dq1_column_profile": """
        SELECT 'l_quantity' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
               ROUND(MIN(l_quantity), 4) AS min_val, ROUND(MAX(l_quantity), 4) AS max_val,
               ROUND(AVG(l_quantity), 4) AS avg_val
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT),
               ROUND(MIN(l_extendedprice), 4), ROUND(MAX(l_extendedprice), 4),
               ROUND(AVG(l_extendedprice), 4)
        FROM lineitem
        UNION ALL
        SELECT 'l_discount', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(DISTINCT l_discount) AS BIGINT),
               ROUND(MIN(l_discount), 4), ROUND(MAX(l_discount), 4),
               ROUND(AVG(l_discount), 4)
        FROM lineitem
        UNION ALL
        SELECT 'l_tax', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(DISTINCT l_tax) AS BIGINT),
               ROUND(MIN(l_tax), 4), ROUND(MAX(l_tax), 4),
               ROUND(AVG(l_tax), 4)
        FROM lineitem
    """,
    "p2_unpivot": """
        WITH agg AS (
            SELECT l_returnflag,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base,
                   ROUND(SUM(l_discount), 2) AS sum_disc
            FROM lineitem GROUP BY 1
        )
        SELECT l_returnflag, metric, value
        FROM agg UNPIVOT (value FOR metric IN (sum_qty, sum_base, sum_disc))
    """,
    "map1_map_functions": f"""
        SELECT event_id,
               CAST(CASE WHEN value > 10 THEN 1 ELSE 0 END
                    + CASE WHEN value * 2 > 10 THEN 1 ELSE 0 END
                    + CASE WHEN k > 10 THEN 1 ELSE 0 END AS INTEGER) AS n_big,
               ROUND(value / 10.0, 4) AS v_scaled,
               ROUND(k / 10.0, 4) AS k_scaled,
               COALESCE(array_to_string(list_filter(
                   [CASE WHEN value > 10 THEN 'v' END,
                    CASE WHEN value * 2 > 10 THEN 'v2' END,
                    CASE WHEN k > 10 THEN 'k' END],
                   x -> x IS NOT NULL), ','), '') AS big_keys
        FROM (SELECT event_id, value,
                     CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
              FROM ({_EV}) WHERE event_id < 2000)
    """,
    "r2_interval_join": f"""
        SELECT v.user_id,
               v.event_id AS view_id,
               b.event_id AS buy_id,
               epoch_us(v.ts) AS view_us,
               epoch_us(b.ts) AS buy_us
        FROM ({_EV}) v
        JOIN ({_EV}) b
          ON v.user_id = b.user_id
         AND b.ts > v.ts
         AND b.ts <= v.ts + INTERVAL 2 HOUR
        WHERE v.event_type = 'view' AND b.event_type = 'purchase'
    """,
    "j1_join_broadcast": """
        SELECT r_name, n_name, COUNT(*) AS n_customers,
               ROUND(SUM(c_acctbal), 2) AS sum_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    "j2_join_shuffle": """
        SELECT o_orderpriority, COUNT(*) AS n_lineitems,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_revenue
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority
    """,
    "j3_semi_anti": """
        SELECT c_custkey, 1 AS has_open FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        UNION ALL
        SELECT c_custkey, 0 AS has_open FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(CAST(SUM(l_quantity) AS DOUBLE), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               ROUND(AVG(l_discount), 4) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE CAST(l_shipdate AS TIMESTAMP) <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "s1_topk_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    "s2_topk_per_group": """
        SELECT o_custkey, o_orderkey, o_totalprice FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
            FROM orders WHERE o_custkey < 50
        ) WHERE rn <= 3
    """,
    "u1_union_by_name": """
        SELECT DISTINCT c_custkey, c_mktsegment FROM customer
        WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    """,
    "x5_json_extract": """
        SELECT event_type, COUNT(*) AS n_events,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
        FROM events GROUP BY event_type
    """,
    "w1_tumbling_window": f"""
        SELECT epoch_us(date_trunc('day', ts)) AS window_start_us, event_type,
               COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
        FROM ({_EV}) GROUP BY 1, 2
    """,
    "p1_pivot": """
        SELECT user_id,
               COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
               COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
               COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
               COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
        FROM events GROUP BY user_id
    """,
    "w2_sliding_window": f"""
        SELECT epoch_us(date_trunc('day', ts) - (k || ' days')::INTERVAL)
                   AS window_start_us,
               event_type, COUNT(*) AS n_events
        FROM ({_EV}) CROSS JOIN (SELECT unnest(range(7)) AS k)
        GROUP BY 1, 2
    """,
    "q3_shipping_priority": """
        SELECT l_orderkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS o_orderdate_us,
               o_orderpriority
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-01'
          AND l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
    """,
    "q5_local_supplier": """
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*) AS n_lineitems
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name
    """,
    "q6_forecast_revenue": """
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount >= 0.03 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "r1_range_join": """
        WITH quarters(quarter, q_start, q_end) AS (VALUES
            ('1996Q1', TIMESTAMP '1996-01-01', TIMESTAMP '1996-04-01'),
            ('1996Q2', TIMESTAMP '1996-04-01', TIMESTAMP '1996-07-01'),
            ('1996Q3', TIMESTAMP '1996-07-01', TIMESTAMP '1996-10-01'),
            ('1996Q4', TIMESTAMP '1996-10-01', TIMESTAMP '1997-01-01'),
            ('1997Q1', TIMESTAMP '1997-01-01', TIMESTAMP '1997-04-01'),
            ('1997Q2', TIMESTAMP '1997-04-01', TIMESTAMP '1997-07-01'),
            ('1997Q3', TIMESTAMP '1997-07-01', TIMESTAMP '1997-10-01'),
            ('1997Q4', TIMESTAMP '1997-10-01', TIMESTAMP '1998-01-01'))
        SELECT quarter, COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_price
        FROM orders JOIN quarters
          ON o_orderdate >= q_start AND o_orderdate < q_end
        GROUP BY quarter
    """,
    "d1_date_functions": """
        SELECT o_orderkey,
               epoch_us(date_trunc('month', CAST(o_orderdate AS TIMESTAMP))) AS month_us,
               CAST(year(o_orderdate) AS INTEGER) AS yr,
               CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
               CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
               CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01')
                    AS INTEGER) AS days_to_1999
        FROM orders
    """,
    "g1_grouping_sets": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
               CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    "q18_large_orders": """
        SELECT c_custkey, c_name, o_orderkey, o_totalprice,
               ROUND(SUM(l_quantity), 2) AS total_qty
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)
        GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    """,
    "u2_intersect_except": """
        (SELECT o_custkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
         INTERSECT
         SELECT o_custkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01')
        EXCEPT ALL
        (SELECT DISTINCT o_custkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
           AND o_orderpriority = '1-URGENT')
    """,
    "arr1_array_functions": """
        SELECT vec_id,
               ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS v_max,
               ROUND(CAST(list_min(embedding) AS DOUBLE), 6) AS v_min,
               CAST(len(list_distinct(embedding)) AS INTEGER) AS n_distinct,
               ROUND(CAST(list_sort(embedding)[2] AS DOUBLE), 6) AS second_min,
               CAST(list_position(embedding, list_max(embedding)) AS INTEGER)
                   AS argmax_pos,
               CAST(len(embedding) AS INTEGER) AS dim
        FROM embeddings
    """,
    # identical fence arithmetic on identical exact quantiles (a7 proved
    # percentile == quantile_cont); counts are integer-exact
    "dq2_outliers": f"""
        WITH q AS (
            SELECT event_type,
                   quantile_cont(value, 0.25) AS q1,
                   quantile_cont(value, 0.75) AS q3
            FROM ({_EV}) GROUP BY event_type
        ),
        f AS (
            SELECT event_type,
                   q1 - 1.5 * (q3 - q1) AS lo,
                   q3 + 1.5 * (q3 - q1) AS hi
            FROM q
        )
        SELECT e.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN e.value < f.lo OR e.value > f.hi
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               ROUND(MIN(f.lo), 4) AS lo_fence,
               ROUND(MIN(f.hi), 4) AS hi_fence
        FROM ({_EV}) e JOIN f ON e.event_type = f.event_type
        GROUP BY e.event_type
    """,

}


# b1/io5: the bucketed/partitioned layouts are physical-plan properties;
# the oracle checks the join/scan SEMANTICS on the raw tables.
ORACLE_SQL["b1_bucketed_join"] = """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
"""

ORACLE_SQL["dq4_referential_integrity"] = """
    SELECT 'orders.o_custkey->customer' AS constraint,
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT) AS n_orphans,
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_fact_rows
    UNION ALL
    SELECT 'lineitem.l_orderkey->orders',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p
                                   WHERE p.p_partkey = l.l_partkey))
                AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                   WHERE s.s_suppkey = l.l_suppkey))
                AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
"""



# dq3: per-bin PSI terms from exact integer counts; the only float math is
# a deterministic scalar expression per output row (no cross-row float agg)
ORACLE_SQL["dq3_feature_drift"] = f"""
    WITH ev AS ({_EV}),
    m AS (SELECT CAST(floor(quantile_cont(epoch_us(ts), 0.5)) AS BIGINT)
              AS mid FROM ev),
    b AS (SELECT event_type,
                 CASE WHEN epoch_us(ts) <= m.mid THEN 0 ELSE 1 END AS half,
                 LEAST(CAST(floor(value / 50.0) AS INT), 9) AS bin
          FROM ev, m),
    c AS (SELECT event_type, bin,
                 CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_early,
                 CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_late
          FROM b GROUP BY event_type, bin),
    t AS (SELECT event_type,
                 CAST(SUM(n_early) AS BIGINT) AS t_early,
                 CAST(SUM(n_late) AS BIGINT) AS t_late
          FROM c GROUP BY event_type)
    SELECT c.event_type, c.bin, c.n_early, c.n_late,
           ROUND(((c.n_early + 1) / (t.t_early + 10.0)
                  - (c.n_late + 1) / (t.t_late + 10.0))
                 * ln(((c.n_early + 1) / (t.t_early + 10.0))
                      / ((c.n_late + 1) / (t.t_late + 10.0))), 6) AS psi_term
    FROM c JOIN t USING (event_type)
"""



# TPC-H-shaped relational coverage (EXISTS/NOT EXISTS, outer joins,
# correlated subqueries, disjunctive predicates) lives in relational.py.
# dq5: cross-multiplied CDF comparison — the supremum runs over the pooled
# (quantized) support; both engines quantize identically so the supports match.
ORACLE_SQL["dq5_ks_statistic"] = """
    WITH b AS (SELECT CAST(floor(value * 100) AS BIGINT) AS v,
                 CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is1
          FROM events WHERE event_type IN ('click', 'view')),
    g AS (SELECT v, CAST(SUM(is1) AS BIGINT) AS c1,
                 CAST(SUM(1 - is1) AS BIGINT) AS c2
          FROM b GROUP BY v),
    cum AS (SELECT CAST(SUM(c1) OVER (ORDER BY v) AS BIGINT) AS cc1,
                   CAST(SUM(c2) OVER (ORDER BY v) AS BIGINT) AS cc2
            FROM g),
    t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                 CAST(SUM(c2) AS BIGINT) AS n2 FROM g)
    SELECT t.n1, t.n2,
           CAST(MAX(abs(cc1 * t.n2 - cc2 * t.n1)) AS BIGINT) AS d_num,
           CAST((MAX(abs(cc1 * t.n2 - cc2 * t.n1)) * 1000000)
                // (t.n1 * t.n2) AS BIGINT) AS ks_e6
    FROM cum CROSS JOIN t
    GROUP BY t.n1, t.n2
"""


# dq7: running-max lateness replayed with the same exclusive frame.
ORACLE_SQL["dq7_lateness_profile"] = f"""
    WITH a AS (
        SELECT user_id, epoch_us(ts) AS ts_us,
               epoch_us(ts) + ('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                               1, 15))::BIGINT % 172800000000 AS arrival_us,
               event_id
        FROM ({_EV})
    ),
    l AS (
        SELECT GREATEST(0, COALESCE(
                   MAX(ts_us) OVER (PARTITION BY user_id
                       ORDER BY arrival_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   - ts_us, 0)) AS late_us
        FROM a
    ),
    b AS (
        SELECT CASE WHEN late_us = 0 THEN 'on_time'
                    WHEN late_us < 3600000000 THEN 'lt_1h'
                    WHEN late_us < 21600000000 THEN 'lt_6h'
                    WHEN late_us < 86400000000 THEN 'lt_24h'
                    ELSE 'ge_24h' END AS bucket,
               late_us
        FROM l
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(late_us) AS BIGINT) AS max_late_us
    FROM b GROUP BY bucket
"""


ORACLE_SQL["r3_interval_left_join"] = f"""
    SELECT v.user_id,
           v.event_id AS view_id,
           b.event_id AS buy_id,
           epoch_us(v.ts) AS view_us,
           epoch_us(b.ts) AS buy_us
    FROM (SELECT * FROM ({_EV}) WHERE event_type = 'view') v
    LEFT JOIN (SELECT * FROM ({_EV}) WHERE event_type = 'purchase') b
      ON v.user_id = b.user_id
     AND b.ts > v.ts
     AND b.ts <= v.ts + INTERVAL 2 HOUR
"""

# dq6: contamination = latest-overall newer than the spine row's cutoff.
ORACLE_SQL["dq6_leakage_audit"] = f"""
    WITH ev AS ({_EV}),
    spine AS (SELECT user_id, ts AS spine_ts FROM ev
              WHERE event_type = 'purchase'),
    latest AS (SELECT user_id, MAX(ts) AS latest_ts FROM ev GROUP BY user_id),
    flagged AS (SELECT s.user_id,
                       CASE WHEN l.latest_ts > s.spine_ts THEN 1 ELSE 0 END
                           AS leak
                FROM spine s JOIN latest l USING (user_id))
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(leak) AS BIGINT) AS n_contaminated,
           CAST(SUM(leak) * 1000000 // COUNT(*) AS BIGINT) AS leak_rate_e6
    FROM flagged GROUP BY user_id
"""


ORACLE_SQL["j4_bloom_probe"] = """
    WITH dim AS (SELECT c_custkey AS k FROM customer
                 WHERE c_mktsegment = 'BUILDING'),
    bits AS (
        SELECT DISTINCT ('0x' || substr(md5(CAST(k AS VARCHAR) || ':' ||
                         CAST(i AS VARCHAR)), 1, 15))::BIGINT % 8192 AS pos
        FROM dim CROSS JOIN (SELECT 1 AS i UNION ALL SELECT 2) g
    ),
    probed AS (
        SELECT o_orderkey, o_custkey,
               ('0x' || substr(md5(CAST(o_custkey AS VARCHAR) || ':1'), 1, 15))::BIGINT
                   % 8192 AS p1,
               ('0x' || substr(md5(CAST(o_custkey AS VARCHAR) || ':2'), 1, 15))::BIGINT
                   % 8192 AS p2
        FROM orders
    ),
    cand AS (SELECT * FROM probed
             WHERE p1 IN (SELECT pos FROM bits)
               AND p2 IN (SELECT pos FROM bits)),
    tru AS (SELECT o_orderkey FROM orders
            WHERE o_custkey IN (SELECT k FROM dim)),
    a AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_orders,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM tru) AS n_true)
    SELECT n_orders, n_candidates, n_true,
           n_candidates - n_true AS n_false_pos,
           CAST(CASE WHEN n_orders > n_true
                     THEN (n_candidates - n_true) * 1000000 // (n_orders - n_true)
                     ELSE 0 END AS BIGINT) AS fp_ppm
    FROM a
"""

ORACLE_SQL["card1_data_card"] = """
    WITH d AS (
        SELECT lang, CAST(n_chars AS BIGINT) AS nc,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
               md5(lower(trim(text))) AS hh,
               CASE WHEN n_chars < 100 THEN 1 ELSE 0 END AS short
        FROM documents
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS total_tokens,
           CAST(SUM(nc) // COUNT(*) AS BIGINT) AS mean_chars,
           CAST(COUNT(*) - COUNT(DISTINCT hh) AS BIGINT) AS n_exact_dups,
           CAST((COUNT(*) - COUNT(DISTINCT hh)) * 10000 // COUNT(*) AS BIGINT)
               AS dup_e4,
           CAST(SUM(short) AS BIGINT) AS n_short,
           CAST(SUM(short) * 10000 // COUNT(*) AS BIGINT) AS short_e4
    FROM d GROUP BY lang
"""

ORACLE_SQL["dq9_expectations"] = """
    WITH o AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS p1,
               CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P')
                             THEN 1 ELSE 0 END) AS BIGINT) AS p2,
               CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS p3
        FROM orders
    ),
    c AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN regexp_matches(c_name, '^Customer#[0-9]{9}$')
                             THEN 1 ELSE 0 END) AS BIGINT) AS p
        FROM customer
    ),
    l AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN l_discount >= 0 AND l_discount <= 1
                              AND l_tax >= 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS p
        FROM lineitem
    )
    SELECT 'orders_totalprice_positive' AS rule, n AS n_rows, p1 AS n_pass,
           n - p1 AS n_fail, CAST(p1 * 10000 // n AS BIGINT) AS pass_e4 FROM o
    UNION ALL
    SELECT 'orders_status_in_set', n, p2, n - p2,
           CAST(p2 * 10000 // n AS BIGINT) FROM o
    UNION ALL
    SELECT 'orders_orderkey_unique', n, p3, n - p3,
           CAST(p3 * 10000 // n AS BIGINT) FROM o
    UNION ALL
    SELECT 'customer_name_format', n, p, n - p,
           CAST(p * 10000 // n AS BIGINT) FROM c
    UNION ALL
    SELECT 'lineitem_rates_in_unit_range', n, p, n - p,
           CAST(p * 10000 // n AS BIGINT) FROM l
"""

ORACLE_SQL["j5_salted_join"] = f"""
    WITH ev AS ({_EV}),
    dim AS (SELECT user_id, MIN(ts) AS first_ts FROM ev GROUP BY user_id)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM((epoch_us(ev.ts) - epoch_us(dim.first_ts))
                    // 86400000000) AS BIGINT) AS sum_age_days
    FROM ev JOIN dim USING (user_id)
    GROUP BY event_type
"""









ORACLE_SQL["x30_variant_extract"] = """
    WITH j AS (
        SELECT event_type,
               CASE WHEN event_id % 10 = 0 THEN substr(props, 1, 5)
                    ELSE props END AS js
        FROM events
    ),
    p AS (
        SELECT event_type,
               CASE WHEN json_valid(js)
                    THEN CAST(json_extract_string(js, \'$.k\') AS BIGINT)
               END AS k
        FROM j
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           ROUND(AVG(k), 4) AS avg_k
    FROM p GROUP BY event_type
"""

ORACLE_SQL["dq11_observed_metrics"] = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_cents,
           CAST(MIN(event_id) AS BIGINT) AS min_event,
           CAST(MAX(event_id) AS BIGINT) AS max_event
    FROM events
"""

ORACLE_SQL["j6_nullsafe_join"] = """
    WITH c AS (
        SELECT nullif(c_mktsegment, 'BUILDING') AS seg_key, c_acctbal
        FROM customer
    )
    SELECT d.seg_code,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(SUM(CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS bal_cents
    FROM c
    JOIN (VALUES ('MACHINERY', 1), ('AUTOMOBILE', 2), ('HOUSEHOLD', 3),
                 ('FURNITURE', 4), (NULL, 0)) AS d(seg_key, seg_code)
      ON c.seg_key IS NOT DISTINCT FROM d.seg_key
    GROUP BY d.seg_code
"""


ORACLE_SQL["x28_from_json_typed"] = """
    WITH j AS (
        SELECT event_type,
               CASE WHEN event_id % 10 = 0 THEN substr(props, 1, 5)
                    ELSE props END AS js
        FROM events
    ),
    p AS (
        SELECT event_type,
               CASE WHEN json_valid(js)
                    THEN CAST(json_extract_string(js, '$.k') AS BIGINT)
               END AS k
        FROM j
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           ROUND(AVG(k), 4) AS avg_k
    FROM p GROUP BY event_type
"""



ORACLE_SQL["s4_tablesample"] = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
           TRUE AS frac_ok,
           TRUE AS mean_ok
    FROM lineitem
"""


ORACLE_SQL["w3_session_window_batch"] = """
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS us,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    g AS (
        SELECT user_id, us, cents,
               CASE WHEN lag(us) OVER w IS NULL
                         OR us - lag(us) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS brk
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
    ),
    s AS (
        SELECT user_id, us, cents,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM g
    )
    SELECT user_id,
           CAST(MIN(us) AS BIGINT) AS start_us,
           CAST(MAX(us) + 1800000000 AS BIGINT) AS end_us,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM s GROUP BY user_id, sid
"""


ORACLE_SQL["q25_sql_variables"] = """
    WITH cents AS (
        SELECT o_orderstatus,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        FROM orders
    ),
    cut AS (
        SELECT CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY c)
                    AS BIGINT) AS cutoff
        FROM cents
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(c) AS BIGINT) AS sum_cents,
           cut.cutoff AS cutoff_cents
    FROM cents, cut
    WHERE c > cut.cutoff
    GROUP BY o_orderstatus, cut.cutoff
"""

ORACLE_SQL["num1_decimal_exact"] = """
    WITH d AS (
        SELECT l_returnflag, l_linestatus,
               CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
               CAST(l_discount AS DECIMAL(4,2)) AS disc,
               CAST(l_tax AS DECIMAL(4,2)) AS tax
        FROM lineitem
    )
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(price) AS DECIMAL(38,2)) AS VARCHAR) AS sum_base,
           CAST(CAST(SUM(CAST(price * (CAST(1.00 AS DECIMAL(3,2)) - disc)
                              AS DECIMAL(38,4))) AS DECIMAL(38,4))
                AS VARCHAR) AS sum_disc,
           CAST(CAST(SUM(CAST(CAST(price * (CAST(1.00 AS DECIMAL(3,2)) - disc)
                                   AS DECIMAL(38,4))
                              * (CAST(1.00 AS DECIMAL(3,2)) + tax)
                              AS DECIMAL(38,6))) AS DECIMAL(38,6))
                AS VARCHAR) AS sum_charge,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM d GROUP BY l_returnflag, l_linestatus
"""






ORACLE_SQL["x32_try_family"] = """
    WITH t AS (
        SELECT event_type,
               CASE WHEN event_id % 5 = 0 THEN NULL
                    ELSE value / CAST(event_id % 5 AS DOUBLE) END AS rate,
               CASE WHEN event_id % 4 + 1 >= 3 THEN 3 ELSE NULL END AS third,
               CASE WHEN event_id % 3 = 0
                    THEN TRY_CAST(CAST(event_id % 100 AS VARCHAR) || '.5'
                                  AS DECIMAL(5,2))
                    ELSE NULL END AS parsed
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN rate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_div0,
           ROUND(SUM(rate), 2) AS sum_rate,
           CAST(SUM(CASE WHEN third IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_short,
           CAST(SUM(third) AS BIGINT) AS sum_third,
           CAST(SUM(CASE WHEN parsed IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unparsed,
           CAST(CAST(SUM(parsed) AS DECIMAL(38,2)) AS VARCHAR) AS sum_parsed
    FROM t GROUP BY event_type
"""








ORACLE_SQL["dq13_benford_audit"] = """
    WITH exp(digit, exp_ppm) AS (VALUES (1, 301029), (2, 176091), (3, 124938), (4, 96910), (5, 79181), (6, 66946), (7, 57991), (8, 51152), (9, 45757)),
    obs AS (
        SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                                 AS VARCHAR), 1, 1) AS BIGINT) AS digit,
               CAST(COUNT(*) AS BIGINT) AS n_obs
        FROM orders GROUP BY 1
    ),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM orders)
    SELECT e.digit,
           CAST(COALESCE(o.n_obs, 0) AS BIGINT) AS n_obs,
           CAST(COALESCE(o.n_obs, 0) * 1000000 // t.total AS BIGINT) AS obs_ppm,
           CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
           CAST(abs(COALESCE(o.n_obs, 0) * 1000000 // t.total - e.exp_ppm)
                AS BIGINT) AS dev_ppm
    FROM exp e LEFT JOIN obs o ON e.digit = o.digit, t
"""


# dq17: QI group sizes + risky-row fold, integer ppm via floor division.
ORACLE_SQL["dq17_k_anonymity"] = f"""
    WITH qi AS (
        SELECT event_type, day(CAST(ts AS TIMESTAMP)) AS day,
               CAST(floor(value / 20) AS BIGINT) AS val_band
        FROM ({_EV})
    ),
    g AS (
        SELECT event_type, day, val_band, CAST(COUNT(*) AS BIGINT) AS n
        FROM qi GROUP BY 1, 2, 3
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_risky_groups,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
               AS n_risky_rows,
           CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) * 1000000
                // SUM(n) AS BIGINT) AS suppression_ppm
    FROM g GROUP BY event_type
"""
