"""Micro-batch shuffle/state partition sizing (r12 optimization).

A Structured Streaming query pins its STATE partitioning to
``spark.sql.shuffle.partitions`` at first start, and every micro-batch
runs one task (plus one state-store instance, plus — for
applyInPandasWithState — one Python worker dispatch) per partition. The
right number tracks the PER-MICRO-BATCH volume, not the cluster width:
a 32-wide state layout over a few-MB batch is almost pure
open/commit/dispatch overhead (measured at sf0.1: sd3 4.3 s -> 3.6 s,
sd4 3.2 s -> 2.1 s at 8 partitions; 4 partitions over-serializes the
stateful Python work and regresses — see OPTIMIZATION_r12.md).

``SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS`` (default 8) parameterizes it:
production ingest sizes this to sustained micro-batch volume / ~100 MB
per partition (SCALE-100TB.md), exactly how shuffle partitions are sized
for batch. The context manager scopes the setting to the stream's
start/await window and restores the session value after, so batch plans
before/after the stream keep the session's partitioning.
"""

from __future__ import annotations

import contextlib
import os

STREAM_SHUFFLE_PARTITIONS = int(
    os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", "8")
)


@contextlib.contextmanager
def stream_shuffle_partitions(spark, n: int | None = None):
    """Scope ``spark.sql.shuffle.partitions`` to a streaming query's
    execution window. Results are partitioning-invariant; only task and
    state-store fan-out changes."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(n if n is not None else STREAM_SHUFFLE_PARTITIONS),
    )
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
