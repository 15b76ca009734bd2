"""TPC-H-shaped relational coverage: correlated subqueries, EXISTS /
NOT-EXISTS, outer joins, disjunctive predicates, conditional aggregation.

The reference engine has no join surface beyond the as-of join
(reference store.py:288-334); these queries prove the full relational
operator set a Spark-first replacement brings along. Shapes follow the
classic TPC-H patterns (Q4/Q7/Q8/Q10/Q13/Q14/Q15/Q16/Q17/Q19/Q21/Q22)
adapted to the driver's schema (no partsupp, no commit/receipt dates —
see TESTDATA.md).

Scale notes (100 TB):
  * Correlated EXISTS / NOT EXISTS compile to left-semi / left-anti
    joins — Spark shuffles both sides on the correlation key or
    broadcasts the filtered inner side; never a per-row subquery.
  * Scalar subqueries (q15 max, q22 global avg) become one-row
    broadcast joins; the aggregate itself is a partial (map-side) agg.
  * Per-group correlated aggregates (q17's 0.2*avg(l_quantity) per
    part) are computed once as a grouped agg and broadcast back —
    O(|parts|) memory, not O(|lineitem|) recomputation.

Parity conventions follow suite.py: price sums rounded 2dp, ratios
4dp, counts CAST AS BIGINT in DuckDB, dates emitted as epoch-us longs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

def _rev():
    # built lazily: classic-mode Column construction needs a live SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from .suite_common import table

    return table(spark, sf_dir, name)


# --------------------------------------------------------------------------- #
# Q4: EXISTS — correlated semi join with a non-equi condition
# --------------------------------------------------------------------------- #


def q_q4_exists_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders in a quarter having >=1 lineitem shipped after the order date
    (EXISTS with correlated non-equi predicate), counted per priority.
    Plan: left-semi join — the inner side carries only (l_orderkey,
    l_shipdate); the non-equi part rides the equi-join as a residual
    condition, so this stays a shuffled hash/SMJ semi join at any scale."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    sj = orders.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return sj.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


# --------------------------------------------------------------------------- #
# Q7: volume shipping between two nations (bidirectional pair filter)
# --------------------------------------------------------------------------- #


def q_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue flowing between NATION_3 and NATION_7 (either direction),
    by supplier-nation / customer-nation / ship-year. Six-way join:
    nation (25 rows) and supplier (100) broadcast; lineitem-orders and
    orders-customer shuffle on their keys. The disjunctive pair filter
    runs after both nation names are attached — Catalyst pushes each
    name IN-list into its own broadcast side first."""
    pair = ("NATION_3", "NATION_7")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n1.filter(F.col("supp_nation").isin(*pair))),
        F.col("s_nationkey") == F.col("n1_key"),
    )
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(n2.filter(F.col("cust_nation").isin(*pair))),
        F.col("c_nationkey") == F.col("n2_key"),
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = _t(spark, sf_dir, "orders")
    j = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
    )
    return j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")).agg(
        F.round(F.sum(_rev()), 2).alias("revenue"),
        F.count("*").alias("n_items"),
    )


# --------------------------------------------------------------------------- #
# Q8: market share — conditional aggregation ratio per year
# --------------------------------------------------------------------------- #


def q_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_5 suppliers' share of revenue delivered to customers in
    region 1, per order-year: sum(CASE)/sum ratio — one shuffle for the
    fact joins, one for the year group-by; the share is a post-agg
    scalar expression (no second pass over the data)."""
    nr = _t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 1).select("n_nationkey")
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(nr), F.col("c_nationkey") == F.col("n_nationkey")
    )
    ns = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key")
    )
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    j = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
    )
    rev = _rev()
    return j.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(F.lit(0.0)))
            / F.sum(rev),
            4,
        ).alias("mkt_share"),
        F.count("*").alias("n_items"),
    )


# --------------------------------------------------------------------------- #
# Q10: returned-item revenue, top 20 customers
# --------------------------------------------------------------------------- #


def q_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue lost to returns (l_returnflag = 'R') per customer over one
    quarter; top 20. Revenue is rounded BEFORE the order/limit on both
    engines and ties break on c_custkey, so the top-20 cut is
    deterministic. TakeOrderedAndProject handles the limit without a
    global sort."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    j = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    agg = j.groupBy("c_custkey", "c_name", "n_name", "c_acctbal").agg(
        F.round(F.sum(_rev()), 2).alias("revenue")
    )
    return (
        agg.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.round("c_acctbal", 2).alias("acctbal"),
            "revenue",
        )
    )


# --------------------------------------------------------------------------- #
# Q13: customer order-count distribution — LEFT OUTER join + double agg
# --------------------------------------------------------------------------- #


def q_q13_cust_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many customers placed 0, 1, 2, ... non-F orders: customer LEFT
    OUTER JOIN filtered orders, count per customer (count of the join
    key, so null-extended rows count 0), then a histogram over those
    counts. Two shuffles total; the second group-by input is one row
    per customer."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") != "F")
        .select("o_custkey", "o_orderkey")
    )
    j = cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
    per_cust = j.groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --------------------------------------------------------------------------- #
# Q14: promo revenue percentage — conditional agg over a dim join
# --------------------------------------------------------------------------- #


def q_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of one month's revenue from PROMO parts: broadcast the part
    dim into the fact scan, one partial-agg fold to a single row."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    rev = _rev()
    return j.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
            / F.sum(rev),
            4,
        ).alias("promo_pct"),
        F.count("*").alias("n_items"),
    )


# --------------------------------------------------------------------------- #
# Q15: top supplier — scalar MAX subquery over an aggregate
# --------------------------------------------------------------------------- #


def q_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) whose quarterly revenue equals the maximum: aggregate
    per supplier, reduce the scalar MAX to one row, then broadcast it
    back onto the per-supplier aggregate (same pattern as q11/q22). An
    unpartitioned window would funnel every post-agg row into ONE
    partition; the broadcast keeps the comparison map-side and the
    aggregate's partitioning intact. Revenue rounded 2dp before the
    equality so both engines cut identically."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(F.round(F.sum(_rev()), 2).alias("total_rev"))
    max_rev = rev.agg(F.max("total_rev").alias("max_rev"))
    top = rev.crossJoin(F.broadcast(max_rev)).filter(
        F.col("total_rev") == F.col("max_rev")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return top.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")).select(
        "s_suppkey", "s_name", "total_rev"
    )


# --------------------------------------------------------------------------- #
# Q16: supplier count per part group — NOT IN anti join + count distinct
# --------------------------------------------------------------------------- #


def q_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per (brand, type, size) bucket, excluding
    negative-balance suppliers (NOT IN == left-anti join on a broadcast
    100-row exclusion list) and one brand. lineitem stands in for
    partsupp (the driver schema has none). countDistinct shuffles
    (group keys + suppkey) once, then collapses."""
    excl = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    j = li.join(
        F.broadcast(excl), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
    ).join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    return j.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


# --------------------------------------------------------------------------- #
# Q17: small-quantity orders — correlated per-group AVG subquery
# --------------------------------------------------------------------------- #


def q_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from lineitems whose quantity is below 20% of their part's
    average quantity. The correlated AVG decorralates into one grouped
    agg over lineitem, broadcast back into the fact scan — the classic
    rewrite Catalyst itself applies to correlated scalar subqueries.
    l_quantity is integral so the AVG is an exact dyadic rational on
    both engines; the 0.2* threshold compare is deterministic."""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#5") & (F.col("p_size") < 15)
    )
    li = _t(spark, sf_dir, "lineitem")
    li_part = li.join(F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
    avg_q = li_part.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    j = li_part.join(F.broadcast(avg_q), F.col("l_partkey") == F.col("a_partkey")).filter(
        F.col("l_quantity") < 0.2 * F.col("avg_qty")
    )
    return j.agg(
        F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
        F.count("*").alias("n_items"),
    )


# --------------------------------------------------------------------------- #
# Q19: disjunctive predicate join (OR of ANDs)
# --------------------------------------------------------------------------- #


def q_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three alternative (brand, size, quantity) windows OR-ed together
    across a lineitem-part join. The equi-key join broadcasts part; the
    disjunction is a residual filter evaluated inside codegen. A weaker
    engine turns OR-of-ANDs into a union of three scans — here it is
    one scan, and the common bounds (l_quantity <= 30) still push to
    parquet."""
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") <= 30)
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")).filter(
        (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(5, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.agg(
        F.round(F.sum(_rev()), 2).alias("revenue"),
        F.count("*").alias("n_items"),
    )


# --------------------------------------------------------------------------- #
# Q21: sole late supplier — EXISTS + NOT EXISTS self-joins
# --------------------------------------------------------------------------- #


def q_q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the ONLY late shipper on a multi-supplier
    finished order (late = shipped >60 days after order date; the
    driver schema has no commit/receipt dates). EXISTS (another
    supplier on the order) -> left-semi; NOT EXISTS (another LATE
    supplier) -> left-anti; both on l_orderkey with a suppkey
    inequality residual. Top 10 by wait count, name tie-break."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    late = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    # no distinct: a left-semi probe side needs no dedup, and skipping it
    # saves a full shuffle of lineitem-sized pairs
    all_pairs = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    late_pairs = late.select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    )
    l1 = late.join(
        all_pairs,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    ).join(
        late_pairs,
        (F.col("l_orderkey") == F.col("l3_orderkey"))
        & (F.col("l_suppkey") != F.col("l3_suppkey")),
        "left_anti",
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    agg = l1.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")).groupBy(
        "s_suppkey", "s_name"
    ).agg(F.count("*").alias("numwait"))
    return agg.orderBy(F.col("numwait").desc(), F.col("s_name").asc()).limit(10)


# --------------------------------------------------------------------------- #
# Q22: dormant rich customers — NOT EXISTS + global scalar subquery
# --------------------------------------------------------------------------- #


def q_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with above-average (positive-balance average) account
    balance and no RECENT order (none since 2000-01-01), grouped by
    nation. The global average is a one-row broadcast cross join; NOT
    EXISTS is a left-anti against the distinct recent-order custkeys.
    c_acctbal values are fp-identical on both engines, so the > avg cut
    is deterministic."""
    cust = _t(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    buyers = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
        .distinct()
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    dormant = rich.join(buyers, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    return dormant.groupBy("c_nationkey").agg(
        F.count("*").alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


# --------------------------------------------------------------------------- #
# Q2: min-cost supplier — correlated MIN subquery per part
# --------------------------------------------------------------------------- #


def q_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each size-5 part, the supplier(s) with the lowest observed unit
    price (min over that part's lineitems of extendedprice/quantity; the
    driver schema has no partsupp, so lineitem history stands in for the
    supply catalog). The correlated MIN decorrelates into one grouped
    min per (part, supplier) then a per-part min joined back on exact
    double equality — both engines derive the candidates from identical
    IEEE divisions, so the equality cut is deterministic. At scale: two
    grouped aggs over the fact and one broadcast join of the per-part
    min (|parts| rows), never a per-row subquery."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") == 5).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    pair_cost = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    part_min = pair_cost.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    best = pair_cost.join(
        F.broadcast(part_min),
        (F.col("l_partkey") == F.col("m_partkey"))
        & (F.col("unit_cost") == F.col("min_cost")),
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    return best.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")).select(
        F.col("l_partkey").alias("p_partkey"),
        "s_suppkey",
        "s_name",
        F.round("s_acctbal", 2).alias("acctbal"),
        F.round("min_cost", 4).alias("min_unit_cost"),
    )


# --------------------------------------------------------------------------- #
# Q9: product-type profit — multi-dim profit rollup per nation/year
# --------------------------------------------------------------------------- #


def q_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on parts whose name contains 'part_1' per supplier nation
    and ship-year; profit = revenue minus a retail-price-based cost
    proxy (no ps_supplycost in the driver schema). part and the
    25-row nation dim broadcast into the fact scan; one shuffle for
    the (nation, year) rollup. The LIKE filter prunes part before the
    broadcast, so the hash table stays small at any SF."""
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "n_name")
    li = _t(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")).join(
        F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
    )
    profit = _rev() - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1)
    return j.groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year")).agg(
        F.round(F.sum(profit), 2).alias("sum_profit"),
        F.count("*").alias("n_items"),
    )


# --------------------------------------------------------------------------- #
# Q11: important parts — HAVING against a global scalar aggregate
# --------------------------------------------------------------------------- #


def q_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose total traded value exceeds 0.1% of ALL traded value:
    grouped sum per part, then HAVING sum > 1.5x the MEAN per-part value
    (a scale-free cut — a fixed fraction of the global total selects
    nothing once part count grows). The global mean is a one-row
    broadcast cross join; both
    sides reuse the same per-part partial aggregates at scale (Spark
    computes the global from a second partial-agg pass, still one scan
    each — never a self-join of the fact). The threshold compare runs
    on raw double sums; a part landing within fp-noise of the cut is
    measure-zero, same convention as q22's avg cut."""
    li = _t(spark, sf_dir, "lineitem")
    value = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = li.groupBy("l_partkey").agg(F.sum(value).alias("part_value"))
    total = per_part.agg(F.avg("part_value").alias("mean_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.lit(1.5) * F.col("mean_value"))
        .select("l_partkey", F.round("part_value", 2).alias("value"))
    )


# --------------------------------------------------------------------------- #
# Q12: late-shipment priority split — two-CASE conditional counts
# --------------------------------------------------------------------------- #


def q_q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per return-flag (stand-in for l_shipmode, absent from the driver
    schema), how many LATE-shipped items (>30 days after order date)
    belonged to urgent/high-priority orders vs the rest — Q12's
    two-conditional-count shape. The join is an equi join on orderkey
    with the lateness inequality as a residual; both CASE counts fold
    in the same partial agg, one shuffle on the single group key."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy("l_returnflag").agg(
        F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
    )


# --------------------------------------------------------------------------- #
# Q20: excess suppliers — nested IN subqueries as chained semi joins
# --------------------------------------------------------------------------- #


def q_q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers in region-0 nations who shipped MORE than 2x the average
    per-supplier quantity of some 'part_2*'-named part — Q20's nested-IN
    shape: the inner correlated threshold (avg per part) decorrelates to
    one grouped agg broadcast back into the pair agg; qualifying
    (part, supplier) pairs reduce to a distinct suppkey set; the outer
    filter is a left-semi join against it. Supplier is the probe side,
    so the whole pipeline is two fact aggs + two broadcast joins."""
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    pair_qty = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("pair_qty"))
    )
    part_avg = pair_qty.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.avg("pair_qty").alias("avg_qty")
    )
    heavy = (
        pair_qty.join(F.broadcast(part_avg), F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("pair_qty") > 2.0 * F.col("avg_qty"))
        .select("l_suppkey")
    )
    nr = _t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0).select("n_nationkey")
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return supp.join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi").select(
        "s_suppkey", "s_name"
    )


def q_q23_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT — the
    SQL-standard top-N-per-group idiom (s2 witnesses the window form;
    this is the LATERAL surface itself, the last unwitnessed correlated-
    subquery shape after EXISTS/IN/scalar). Per nation, the top-2
    customers by balance. Catalyst decorrelates the limited lateral
    into a ranked window over the join — no per-row re-execution, one
    shuffle on the correlation key — so the declarative form costs the
    same as the hand-written window at any scale. DuckDB runs the
    IDENTICAL text."""
    _t(spark, sf_dir, "nation").createOrReplaceTempView("q23_nation")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("q23_customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM q23_nation n,
        LATERAL (SELECT c_custkey, c_acctbal FROM q23_customer c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        """
    )


_Q24_SQL = """
        WITH RECURSIVE tree AS (
            SELECT c_custkey, 0 AS depth,
                   CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS path_cents
            FROM {customer} WHERE c_custkey = 1
            UNION ALL
            SELECT c.c_custkey, t.depth + 1,
                   t.path_cents + CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT)
            FROM {customer} c JOIN tree t
              ON CAST(FLOOR(c.c_custkey / 2.0) AS BIGINT) = t.c_custkey
            WHERE c.c_custkey > 1
        )
        SELECT CAST(depth AS BIGINT) AS depth,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(path_cents) AS BIGINT) AS sum_path_cents,
               CAST(MIN(c_custkey) AS BIGINT) AS min_key,
               CAST(MAX(c_custkey) AS BIGINT) AS max_key
        FROM tree GROUP BY depth
"""


def q_q24_recursive_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``WITH RECURSIVE`` (Spark 4 recursive CTE, SPARK-24497) —
    the iterative-traversal surface the engine previously reached only
    through driver-side loops (graph.py) while the ORACLES already leaned
    on DuckDB recursion; this witnesses Spark's own declarative
    fixpoint, IDENTICAL SQL text on both engines. The hierarchy is the
    implicit binary tree over c_custkey (parent = floor(k/2) — a
    deterministic org-chart stand-in requiring no new data), walked from
    the root carrying the root-to-node balance path-sum (recursion-order-
    dependent, so the hash gate pins the traversal itself, not just
    reachability), then rolled up per depth. Execution shape: each
    recursive step is ONE equi-join of the (shrinking) frontier against
    the base relation — the frontier is broadcastable at every real
    hierarchy's scale, and the anchor/step/union plan is exactly the
    frontier-driven BFS graph.py hand-builds; depth is log2(N) (~11 at
    sf0.01), far under Spark's 100-level recursion guard."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("q24_customer")
    return spark.sql(_Q24_SQL.format(customer="q24_customer"))


def q_q26_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 ``|>`` operators, the GoogleSQL-paper
    linear form): FROM ... |> WHERE ... |> EXTEND ... |> AGGREGATE —
    each stage reads top-to-bottom in execution order instead of the
    inside-out nesting of classic SELECT. Catalyst lowers pipes to the
    SAME logical plan as the classic form (filter pushdown, partial
    agg — nothing changes physically), which is precisely what the
    oracle proves: DuckDB has no pipe syntax, so the twin is the
    classic-SQL spelling of the identical semantics, and the hash gate
    pins that the sugar is only sugar. Revenue rollup per return flag
    over a shipdate window."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("q26_lineitem")
    return spark.sql(
        """
        FROM q26_lineitem
        |> WHERE l_shipdate >= DATE '1996-01-01'
                 AND l_shipdate < DATE '1998-01-01'
        |> EXTEND l_extendedprice * (1 - l_discount) AS revenue
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_items,
                     ROUND(SUM(revenue), 2) AS sum_revenue,
                     CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
           GROUP BY l_returnflag
        """
    )


def q_q27_param_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named parameter markers (``spark.sql(sql, args={...})``) — the
    injection-safe client-side binding surface, distinct from q25's
    server-side session variables: the literal is spliced by the PARSER
    as a typed constant (never string-concatenated), so the plan is a
    constant predicate with full pushdown, and the same text is
    reusable across bindings. The oracle inlines the identical
    constants — proving binding changes nothing semantically."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("q27_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_cents
        FROM q27_orders
        WHERE o_orderstatus = :status AND o_totalprice > :floor_price
        GROUP BY o_orderpriority
        """,
        args={"status": "O", "floor_price": 1000.0},
    )


def q_q28_lateral_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column aliases — referencing a SELECT-list alias from a
    later item in the SAME select (classic SQL forces a subquery or
    repetition; both engines resolve the chain left-to-right, including
    over AGGREGATE results). The chained money math (cents -> net ->
    margin) is written ONCE and reused by name; IDENTICAL text runs on
    both engines, so the witness pins that alias resolution (not
    expression duplication with drift) produces the values."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("q28_lineitem")
    return spark.sql(_Q28_SQL.format(lineitem="q28_lineitem"))


_Q28_SQL = """
        SELECT l_returnflag,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents,
               cents - CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 100
                                           + 0.5) AS BIGINT)) AS BIGINT)
                   AS net_cents,
               net_cents - cents / 2 AS margin_cents,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM {lineitem}
        GROUP BY l_returnflag
"""


_Q29_SQL = """
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM {lineitem}
        WHERE l_shipdate < DATE '1998-09-01'
        GROUP BY ALL
        ORDER BY ALL
"""


def q_q29_group_order_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL (Spark 4 adopted DuckDB's shorthand):
    the grouping key set is inferred as every non-aggregate select item,
    the ordering as the full select list left-to-right. IDENTICAL text
    runs on both engines (the q28 identical-text pin), so the witness is
    that both resolve the SAME inferred key set — a resolver divergence
    (e.g. treating a lateral-aliased expression as a key) would change
    the group count and break the hash. Plan-wise the sugar compiles to
    the ordinary partial-agg + exchange + sort; nothing new at scale."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("q29_lineitem")
    return spark.sql(_Q29_SQL.format(lineitem="q29_lineitem"))


_U3_SQL = """
        WITH a AS (SELECT o_orderpriority AS p FROM {orders}
                   WHERE o_orderdate < DATE '1997-01-01'),
             b AS (SELECT o_orderpriority AS p FROM {orders}
                   WHERE o_orderstatus = 'O'),
             i AS (SELECT 'intersect_all' AS op, p
                   FROM (SELECT p FROM a INTERSECT ALL SELECT p FROM b)),
             e AS (SELECT 'except_all' AS op, p
                   FROM (SELECT p FROM a EXCEPT ALL SELECT p FROM b)),
             u AS (SELECT 'union_all' AS op, p
                   FROM (SELECT p FROM a UNION ALL SELECT p FROM b))
        SELECT op, p, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT * FROM i UNION ALL SELECT * FROM e
              UNION ALL SELECT * FROM u)
        GROUP BY op, p
"""


def q_u3_bag_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BAG-semantics set operations (INTERSECT ALL / EXCEPT ALL /
    UNION ALL) — the multiplicity-preserving forms u1/u2's DISTINCT
    variants skip: per value, INTERSECT ALL keeps min(m_a, m_b) copies
    and EXCEPT ALL max(0, m_a - m_b) — semantics that matter whenever
    rows are observations, not members (event streams, label sets).
    Both engines implement the SQL-standard forms and run the
    IDENTICAL text; the multiplicity counts per (op, value) pin the
    bag arithmetic exactly. Catalyst plans ALL-variants as
    hash-partitioned count-and-replicate — one shuffle per operand,
    no distinct collapse."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("u3_orders")
    return spark.sql(_U3_SQL.format(orders="u3_orders"))


def q_q30_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTIFIER() clause — templated table/column names bound through
    parameter markers (the SQL-injection-safe way to write one query
    over N tables/columns; string-concatenating names is how warehouses
    get owned). The table name AND the grouped column arrive as
    parameters; the parser resolves them to real identifiers before
    analysis, so the plan is byte-identical to the hardcoded query
    (constant predicate, full pushdown). The oracle inlines the same
    identifiers — binding must change nothing semantically."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("q30_orders")
    return spark.sql(
        """
        SELECT IDENTIFIER(:grp) AS o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_cents
        FROM IDENTIFIER(:tab)
        WHERE o_orderstatus = 'F'
        GROUP BY IDENTIFIER(:grp)
        """,
        args={"tab": "q30_orders", "grp": "o_orderpriority"},
    )


def q_q31_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4 ``BEGIN ... END`` procedural blocks,
    spark.sql.scripting.enabled): DECLARE'd session-local variables and
    a REPEAT/UNTIL loop drive an iterative parameter search — lower a
    price cutoff in 100k steps until at least 100 fulfilled orders
    qualify — then ONE set-based report runs at the found threshold.
    The procedural layer touches only scalars (each probe is a plain
    COUNT aggregate, fully pushed down; the loop runs O(ladder) tiny
    jobs on the driver); the data never flows through the script. The
    oracle exploits monotonicity: count(>thr) grows as thr falls, so
    REPEAT's first qualifying step == MAX(ladder thr with n >= 100),
    else the ladder floor — same threshold, same final report."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("q31_orders")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql(
        """
        BEGIN
          DECLARE thr DOUBLE DEFAULT 600000.0;
          DECLARE n BIGINT DEFAULT 0;
          REPEAT
            SET thr = thr - 100000.0;
            SET n = (SELECT COUNT(*) FROM q31_orders
                     WHERE o_orderstatus = 'F' AND o_totalprice > thr);
          UNTIL n >= 100 OR thr <= 100000.0
          END REPEAT;
          SELECT o_orderpriority,
                 CAST(thr AS BIGINT) AS threshold,
                 CAST(COUNT(*) AS BIGINT) AS n_orders,
                 CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                      AS BIGINT) AS sum_cents
          FROM q31_orders
          WHERE o_orderstatus = 'F' AND o_totalprice > thr
          GROUP BY o_orderpriority;
        END
        """
    )


def q_q32_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined functions (Spark 4 ``CREATE FUNCTION ... RETURN``):
    a scalar UDF (net revenue), a CASE-mapping scalar UDF, and a SQL
    TABLE function parameterizing a filtered scan — the reusable-logic
    surface that does NOT leave the JVM: SQL UDFs are inlined by the
    analyzer into the caller's plan (no serialization boundary, full
    codegen + pushdown — the anti-pattern-free alternative to Python
    row UDFs for expressible logic). The oracle inlines the same
    expressions by hand; if inlining changed semantics the hash breaks."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("q32_lineitem")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION q32_revenue(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION q32_flag_desc(f STRING) "
        "RETURNS STRING RETURN CASE f WHEN 'R' THEN 'returned' "
        "WHEN 'A' THEN 'acknowledged' ELSE 'in_flight' END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION q32_big_items(minqty DOUBLE) "
        "RETURNS TABLE (l_returnflag STRING, l_quantity DOUBLE, "
        "l_extendedprice DOUBLE, l_discount DOUBLE) RETURN "
        "SELECT l_returnflag, l_quantity, l_extendedprice, l_discount "
        "FROM q32_lineitem WHERE l_quantity >= minqty"
    )
    return spark.sql(
        """
        SELECT q32_flag_desc(l_returnflag) AS flag,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               ROUND(SUM(q32_revenue(l_extendedprice, l_discount)), 2)
                   AS net_revenue
        FROM q32_big_items(30.0)
        GROUP BY q32_flag_desc(l_returnflag)
        """
    )


def q_q33_sql_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIVOT / UNPIVOT clauses (the relational rotation surface —
    p1/p2 witness the DataFrame API; this is the SQL-standard clause
    pair): revenue cents pivot wide per linestatus with aliased pivot
    columns, then UNPIVOT straight back to long form — the roundtrip
    exercises both rotations and NULL-dropping unpivot semantics in one
    plan. Catalyst compiles the pivot to ONE conditional aggregate pass
    (no per-pivot-value scans); the oracle is that conditional
    aggregate written by hand."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("q33_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, status, CAST(cents AS BIGINT) AS cents
        FROM (
            SELECT * FROM (
                SELECT l_returnflag, l_linestatus,
                       CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100
                                  + 0.5) AS BIGINT) AS c
                FROM q33_lineitem
            )
            PIVOT (SUM(c) FOR l_linestatus IN ('F' AS sf, 'O' AS so))
        )
        UNPIVOT (cents FOR status IN (sf, so))
        """
    )


RELATIONAL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q33_sql_pivot": q_q33_sql_pivot,
    "q32_sql_udf": q_q32_sql_udf,
    "q31_sql_scripting": q_q31_sql_scripting,
    "q30_identifier_clause": q_q30_identifier_clause,
    "q26_pipe_syntax": q_q26_pipe_syntax,
    "u3_bag_setops": q_u3_bag_setops,
    "q27_param_markers": q_q27_param_markers,
    "q28_lateral_alias": q_q28_lateral_alias,
    "q29_group_order_all": q_q29_group_order_all,
    "q23_lateral_topn": q_q23_lateral_topn,
    "q24_recursive_tree": q_q24_recursive_tree,
    "q2_min_cost_supplier": q_q2_min_cost_supplier,
    "q9_product_profit": q_q9_product_profit,
    "q11_important_parts": q_q11_important_parts,
    "q12_late_priority": q_q12_late_priority,
    "q20_excess_suppliers": q_q20_excess_suppliers,
    "q4_exists_priority": q_q4_exists_priority,
    "q7_volume_shipping": q_q7_volume_shipping,
    "q8_market_share": q_q8_market_share,
    "q10_returned_items": q_q10_returned_items,
    "q13_cust_distribution": q_q13_cust_distribution,
    "q14_promo_revenue": q_q14_promo_revenue,
    "q15_top_supplier": q_q15_top_supplier,
    "q16_supplier_count": q_q16_supplier_count,
    "q17_small_quantity": q_q17_small_quantity,
    "q19_disjunctive": q_q19_disjunctive,
    "q21_sole_late_supplier": q_q21_sole_late_supplier,
    "q22_dormant_customers": q_q22_dormant_customers,
}


RELATIONAL_ORACLE: dict[str, str] = {
    "q33_sql_pivot": """
        WITH base AS (
            SELECT l_returnflag, l_linestatus,
                   CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100
                              + 0.5) AS BIGINT) AS c
            FROM lineitem
        ),
        wide AS (
            SELECT l_returnflag,
                   SUM(CASE WHEN l_linestatus = 'F' THEN c END) AS sf,
                   SUM(CASE WHEN l_linestatus = 'O' THEN c END) AS so
            FROM base GROUP BY l_returnflag
        )
        SELECT l_returnflag, 'sf' AS status, CAST(sf AS BIGINT) AS cents
        FROM wide WHERE sf IS NOT NULL
        UNION ALL
        SELECT l_returnflag, 'so', CAST(so AS BIGINT) FROM wide
        WHERE so IS NOT NULL
    """,
    "q32_sql_udf": """
        SELECT CASE l_returnflag WHEN 'R' THEN 'returned'
                    WHEN 'A' THEN 'acknowledged'
                    ELSE 'in_flight' END AS flag,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                   AS net_revenue
        FROM lineitem
        WHERE l_quantity >= 30.0
        GROUP BY 1
    """,
    "q31_sql_scripting": """
        WITH lad AS (
            SELECT UNNEST([500000.0, 400000.0, 300000.0, 200000.0,
                           100000.0]) AS thr
        ),
        c AS (
            SELECT thr,
                   (SELECT COUNT(*) FROM orders
                    WHERE o_orderstatus = 'F' AND o_totalprice > lad.thr) AS n
            FROM lad
        ),
        pick AS (
            SELECT COALESCE(MAX(thr) FILTER (WHERE n >= 100), 100000.0)
                       AS thr
            FROM c
        )
        SELECT o_orderpriority,
               CAST(pick.thr AS BIGINT) AS threshold,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_cents
        FROM orders, pick
        WHERE o_orderstatus = 'F' AND o_totalprice > pick.thr
        GROUP BY o_orderpriority, pick.thr
    """,
    "q30_identifier_clause": """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_cents
        FROM orders
        WHERE o_orderstatus = 'F'
        GROUP BY o_orderpriority
    """,
    "q24_recursive_tree": _Q24_SQL.format(customer="customer"),
    "u3_bag_setops": _U3_SQL.format(orders="orders"),
    "q26_pipe_syntax": """
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_revenue,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01'
          AND l_shipdate < DATE '1998-01-01'
        GROUP BY l_returnflag
    """,
    "q27_param_markers": """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_cents
        FROM orders
        WHERE o_orderstatus = 'O' AND o_totalprice > 1000.0
        GROUP BY o_orderpriority
    """,
    "q28_lateral_alias": _Q28_SQL.format(lineitem="lineitem"),
    "q29_group_order_all": _Q29_SQL.format(lineitem="lineitem"),
    "q23_lateral_topn": """
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM nation n,
        LATERAL (SELECT c_custkey, c_acctbal FROM customer c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
    """,
    "q2_min_cost_supplier": """
        WITH pair_cost AS (
            SELECT l.l_partkey, l.l_suppkey,
                   MIN(l.l_extendedprice / l.l_quantity) AS unit_cost
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_size = 5 AND l.l_quantity > 0
            GROUP BY 1, 2
        )
        SELECT pc.l_partkey AS p_partkey, s.s_suppkey, s.s_name,
               ROUND(s.s_acctbal, 2) AS acctbal,
               ROUND(pc.unit_cost, 4) AS min_unit_cost
        FROM pair_cost pc
        JOIN supplier s ON pc.l_suppkey = s.s_suppkey
        WHERE pc.unit_cost = (SELECT MIN(unit_cost) FROM pair_cost pc2
                              WHERE pc2.l_partkey = pc.l_partkey)
    """,
    "q9_product_profit": """
        SELECT n.n_name AS nation,
               CAST(year(l.l_shipdate) AS BIGINT) AS o_year,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                         - p.p_retailprice * l.l_quantity * 0.1), 2) AS sum_profit,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%widget%'
        GROUP BY 1, 2
    """,
    "q11_important_parts": """
        WITH per_part AS (
            SELECT l_partkey,
                   SUM(l_extendedprice * (1 - l_discount)) AS part_value
            FROM lineitem
            GROUP BY l_partkey
        )
        SELECT l_partkey, ROUND(part_value, 2) AS value
        FROM per_part
        WHERE part_value > 1.5 * (SELECT AVG(part_value) FROM per_part)
    """,
    "q12_late_priority": """
        SELECT l.l_returnflag,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-01-01'
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
        GROUP BY 1
    """,
    "q20_excess_suppliers": """
        WITH pair_qty AS (
            SELECT l.l_partkey, l.l_suppkey, SUM(l.l_quantity) AS pair_qty
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_name LIKE 'red%'
            GROUP BY 1, 2
        )
        SELECT s.s_suppkey, s.s_name
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_regionkey = 0
          AND s.s_suppkey IN (
              SELECT pq.l_suppkey FROM pair_qty pq
              WHERE pq.pair_qty > 2.0 * (SELECT AVG(pair_qty) FROM pair_qty pq2
                                         WHERE pq2.l_partkey = pq.l_partkey))
    """,
    "q4_exists_priority": """
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-04-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
    """,
    "q7_volume_shipping": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
          AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        GROUP BY 1, 2, 3
    """,
    "q8_market_share": """
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               ROUND(SUM(CASE WHEN ns.n_name = 'NATION_5'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0.0 END)
                     / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS mkt_share,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation ns ON s.s_nationkey = ns.n_nationkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation nc ON c.c_nationkey = nc.n_nationkey
        WHERE nc.n_regionkey = 1
        GROUP BY 1
    """,
    "q10_returned_items": """
        SELECT c_custkey, c_name, n_name,
               ROUND(c_acctbal, 2) AS acctbal, revenue
        FROM (
            SELECT c.c_custkey, c.c_name, n.n_name, c.c_acctbal,
                   ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE l.l_returnflag = 'R'
              AND o.o_orderdate >= TIMESTAMP '1996-07-01'
              AND o.o_orderdate < TIMESTAMP '1996-10-01'
            GROUP BY 1, 2, 3, 4
        )
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "q13_cust_distribution": """
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM (
            SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
            FROM customer c
            LEFT OUTER JOIN orders o
              ON c.c_custkey = o.o_custkey AND o.o_orderstatus <> 'F'
            GROUP BY c.c_custkey
        )
        GROUP BY c_count
    """,
    "q14_promo_revenue": """
        SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                                      THEN l.l_extendedprice * (1 - l.l_discount)
                                      ELSE 0.0 END)
                     / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
          AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
    "q15_top_supplier": """
        WITH rev AS (
            SELECT l_suppkey,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_rev
        FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
        WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
    "q16_supplier_count": """
        SELECT p.p_brand, p.p_type, p.p_size,
               CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#1'
          AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
          AND l.l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
    """,
    "q17_small_quantity": """
        SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand = 'Brand#5' AND p.p_size < 15
          AND l.l_quantity < (
              SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
              WHERE l2.l_partkey = l.l_partkey
                AND l2.l_partkey IN
                    (SELECT p_partkey FROM part
                     WHERE p_brand = 'Brand#5' AND p_size < 15))
    """,
    "q19_disjunctive": """
        SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 5
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 10
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 5 AND 15
               AND l.l_quantity BETWEEN 20 AND 30)
    """,
    "q21_sole_late_supplier": """
        WITH late AS (
            SELECT DISTINCT l.l_orderkey, l.l_suppkey
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderstatus = 'F'
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        )
        SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM late l1
        JOIN supplier s ON l1.l_suppkey = s.s_suppkey
        WHERE EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey)
        GROUP BY 1, 2
        ORDER BY numwait DESC, s_name ASC
        LIMIT 10
    """,
    "q22_dormant_customers": """
        SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
               ROUND(SUM(c_acctbal), 2) AS totacctbal
        FROM customer c
        WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                             WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c_nationkey
    """,
}
