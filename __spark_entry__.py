"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (as-of training-set join) at sf0.001.
``queries()`` / ``oracle_sql()`` — operator inventory from SURVEY §2,
implemented in ml_feature_store_spark.suite with DuckDB oracle SQL pairs.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ml_feature_store_spark.suite import ORACLE_SQL, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PIT-correct as-of training-set join over events at sf0.001."""
    return QUERIES["f7_asof_join"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
