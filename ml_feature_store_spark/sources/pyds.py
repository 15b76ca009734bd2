"""Custom source connector via the Python Data Source API (Spark 4).

The reference engine's only ingress is ``register(name, DataFrame)``
(reference src/ml_feature_store/store.py:129-157 — data must already be
a frame); every external format rides a built-in reader. This module
witnesses the OTHER half of a complete source story: when the feed is a
system Spark has no connector for (an internal REST API, a bespoke
binary log, a quota-metered vendor endpoint), Spark 4's
``pyspark.sql.datasource`` lets the connector be written in Python and
still behave like a first-class source — schema, partition planning,
per-partition readers running ON EXECUTORS, and planner-driven filter
pushdown.

The shipped source generates a deterministic synthetic feed (pure
integer formulas of the global row index), which is what makes it
oracle-checkable: DuckDB replays the generator as ``range()`` algebra,
so the driver's value-hash gate proves the connector path loses
nothing.

Scale design, mirrored from how a real connector should be built:

* ``partitions()`` returns one :class:`InputPartition` per shard — the
  planner schedules one task per partition, so connector parallelism is
  the partition count, not one driver-side loop. At 100 TB this is the
  difference between a source and a bottleneck.
* ``pushFilters`` accepts ``EqualTo`` on the partition column and
  PRUNES partitions before read — the Python-source analogue of
  parquet partition pruning (planner calls it once; dropped partitions
  are never scheduled). Unsupported filters are returned for Spark to
  evaluate post-scan, per the API contract.
* ``read`` yields plain tuples; Spark Arrow-batches them. A real
  connector would yield pyarrow RecordBatches for zero-copy.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
)

_KEY_MOD = 97
_CENTS_MOD = 10_007


def synthetic_row(i: int) -> tuple[int, int, int]:
    """The generator contract shared with the DuckDB oracle:
    (i, key, amount_cents) as pure functions of the global index."""
    return (i, i % _KEY_MOD, (i * i) % _CENTS_MOD)


class SyntheticFeedReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_partitions = int(options.get("partitions", 8))
        self.rows_per_partition = int(options.get("rowsperpartition", 1000))
        self.pushed_parts: set[int] | None = None

    def pushFilters(self, filters: Sequence) -> Iterator:
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("part",):
                # planner-driven partition pruning: remember the accepted
                # part and DON'T re-yield the filter (fully handled here)
                keep = {int(f.value)}
                self.pushed_parts = (
                    keep
                    if self.pushed_parts is None
                    else self.pushed_parts & keep
                )
            else:
                yield f

    def partitions(self) -> list[InputPartition]:
        parts = range(self.n_partitions)
        if self.pushed_parts is not None:
            parts = [p for p in parts if p in self.pushed_parts]
        return [InputPartition(p) for p in parts]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        p = partition.value
        base = p * self.rows_per_partition
        for j in range(self.rows_per_partition):
            i, key, cents = synthetic_row(base + j)
            yield (p, i, key, cents)


class SyntheticFeedDataSource(DataSource):
    """``spark.read.format("synthetic_feed")`` after
    ``spark.dataSource.register(SyntheticFeedDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_feed"

    def schema(self) -> str:
        return "part int, i long, key long, amount_cents long"

    def reader(self, schema) -> SyntheticFeedReader:
        return SyntheticFeedReader(self.options)
