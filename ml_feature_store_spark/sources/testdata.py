"""Loaders for the driver-generated synthetic tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under /root/testdata/sf*/.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one synthetic table. Plain parquet scan — Catalyst handles
    predicate pushdown / column pruning from whatever plan is built on top.

    ``events.ts`` is physically TIMESTAMP(NANOS), which Spark 4 only reads
    via ``spark.sql.legacy.parquet.nanosAsLong`` (set in session.py) as an
    epoch-nanos long; convert to a microsecond timestamp with integer
    division — the same floor truncation DuckDB applies casting ns->us, so
    the oracle sees identical values.
    """
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # __ts_ns__ keeps the raw nanos for pushable scan predicates
        # (operators/pit.py temporal_filter); ts is the canonical us value.
        df = df.withColumn("__ts_ns__", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load_table(spark, t, sf_dir) for t in TABLES}
