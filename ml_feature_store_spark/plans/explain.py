"""Physical-plan inspection helpers.

Used by tests (and by you, iterating) to assert the plan properties that
matter at 100 TB: predicates pushed into the scan, bounded shuffle count,
wide whole-stage-codegen spans. `.explain()` prints; these return values.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


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


def codegen_span_count(df: DataFrame) -> int:
    return len(re.findall(r"WholeStageCodegen", executed_plan(df)))
