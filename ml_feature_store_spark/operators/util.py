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


def global_row_number(
    df: DataFrame,
    order_col: str,
    out_col: str = "row_no",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed global row numbering: ``row_number() OVER (ORDER BY
    order_col)`` without the single-partition window Spark would
    otherwise plan (a global ORDER BY frame collapses ALL rows onto one
    task — the canonical 100 TB scale-killer; Spark even logs a WARN for
    it). The classic two-pass substitute:

      1. ``repartitionByRange(order_col)`` + ``sortWithinPartitions`` —
         one range shuffle; partition i holds the i-th key range, so
         partition order IS global order (requires a unique key: ties
         split across a boundary would otherwise order arbitrarily).
      2. ``monotonically_increasing_id`` pins each row's WITHIN-partition
         position in pure JVM (its documented layout is
         (partition id << 33) + in-partition counter — we do not decode
         the bit layout, only use that it is ascending per partition).
      3. One tiny agg collects per-partition (count, min id) — bounded
         by the partition count, the same scalar-fetch class as the
         store's max-row-id watermark — cumulative offsets are computed
         on the driver and broadcast back as a join on partition id.

    Total cost: one range shuffle + one #partitions-row agg, at any
    scale. ``row_no`` is 1-based and equals the oracle's window
    row_number because ``order_col`` is unique.
    """
    from pyspark.sql import functions as F

    spark = df.sparkSession
    n = num_partitions or max(spark.sparkContext.defaultParallelism, 1)
    ranged = (
        df.repartitionByRange(n, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("__mid__", F.monotonically_increasing_id())
        .withColumn("__pid__", F.spark_partition_id())
    )
    ranged = ranged.localCheckpoint(eager=True)  # pin ids: computed once, never replayed
    stats = (
        ranged.groupBy("__pid__")
        .agg(F.count("*").alias("__cnt__"), F.min("__mid__").alias("__mid0__"))
        .collect()  # bounded: one row per partition
    )
    offset = 0
    rows = []
    for r in sorted(stats, key=lambda r: r["__pid__"]):
        rows.append((r["__pid__"], offset, r["__mid0__"]))
        offset += r["__cnt__"]
    offs = spark.createDataFrame(rows, "__pid__ int, __off__ long, __mid0__ long")
    out = ranged.join(F.broadcast(offs), "__pid__")
    return out.withColumn(
        out_col, F.col("__off__") + (F.col("__mid__") - F.col("__mid0__")) + 1
    ).drop("__pid__", "__mid__", "__off__", "__mid0__")
