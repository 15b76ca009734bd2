"""Operator-level utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition when the scan produced fewer partitions than cores.

    Small files (one row-group) scan as a single partition; any CPU-heavy
    per-row operator downstream (hashing, cosine, Pandas kernels) would run
    on one core. A round-robin repartition costs one narrow shuffle of the
    (small) input and unlocks full parallelism. On big inputs
    (partitions >= cores) this is a no-op, so it is safe at 100 TB: the
    scan already yields thousands of partitions there.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
