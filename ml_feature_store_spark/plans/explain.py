"""Physical-plan inspection helpers.

Used by tests (and by you, iterating) to assert the plan properties that
matter at 100 TB: predicates pushed into the scan, bounded shuffle count,
wide whole-stage-codegen spans. `.explain()` prints; these return values.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    # scan metadata (PushedFilters/DataFilters/ReadSchema) is truncated to
    # spark.sql.maxMetadataStringLength chars by default (100) — widen it so
    # pushdown assertions can see every predicate
    spark = df.sparkSession
    key = "spark.sql.maxMetadataStringLength"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "10000")
    try:
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        if old is not None:
            spark.conf.set(key, old)


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if any scan's PushedFilters list mentions ``fragment``."""
    plan = executed_plan(df)
    for m in re.findall(r"PushedFilters: \[[^\]]*\]", plan):
        if fragment in m:
            return True
    return False


def shuffle_count(df: DataFrame) -> int:
    """Number of exchanges in the physical plan (AQE may later elide some;
    this counts the planned upper bound)."""
    return executed_plan(df).count("Exchange")


def final_executed_plan(df: DataFrame) -> str:
    """Execute the frame, then return the FINAL adaptive plan. Under AQE the
    pre-execution plan string hides codegen spans and chosen join
    strategies; collecting first materializes the real plan. Test-sized
    inputs only."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def codegen_span_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans. Plan strings mark codegen'd
    operators with ``*(n)`` (one id per fused span); explain("formatted")
    uses explicit WholeStageCodegen nodes — count both spellings."""
    plan = final_executed_plan(df)
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    ids |= set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    return len(ids)
