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
    DataSourceWriter,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
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


class SyntheticStreamReader(SimpleDataSourceStreamReader):
    """STREAMING half of the Python Data Source story (Spark 4's
    ``simpleStreamReader``): the same deterministic generator exposed as
    a micro-batch SOURCE — offsets are the global row index, each
    ``read`` advances by ``rowsperbatch`` until ``maxrows``, and
    ``readBetweenOffsets`` replays any (start, end) slice exactly (the
    recovery contract: offsets alone must reproduce a batch, which a
    pure function of the index does for free). A real connector would
    wrap a cursor/checkpoint-token API the same way. Offsets are plain
    dicts; Spark journals them in the checkpoint log, so restart
    resumes at the committed index — exactly-once with a deterministic
    replay."""

    def __init__(self, options) -> None:
        self.rows_per_batch = int(options.get("rowsperbatch", 1000))
        self.max_rows = int(options.get("maxrows", 5000))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        # rows are returned as a MATERIALIZED list's iterator: the
        # simple-reader wrapper prefetches each batch on the driver,
        # caches the iterator, and PICKLES it to executors at partition
        # planning — a generator cannot pickle, a bare list fails the
        # wrapper's next() calls; a list_iterator satisfies both. The
        # driver prefetch is also why this API is for modest-rate feeds;
        # a high-throughput connector implements the partition-planning
        # DataSourceStreamReader instead.
        i0 = int(start["i"])
        if i0 >= self.max_rows:
            return iter([]), start  # caught up: no new offset
        end = min(i0 + self.rows_per_batch, self.max_rows)
        return iter([synthetic_row(i) for i in range(i0, end)]), {"i": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [
                synthetic_row(i)
                for i in range(int(start["i"]), int(end["i"]))
            ]
        )


class SyntheticStreamDataSource(DataSource):
    """``spark.readStream.format("synthetic_stream")`` after
    ``spark.dataSource.register(SyntheticStreamDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_stream"

    def schema(self) -> str:
        return "i long, key long, amount_cents long"

    def simpleStreamReader(self, schema) -> SyntheticStreamReader:
        return SyntheticStreamReader(self.options)


class _FileCommit(WriterCommitMessage):
    """Picklable per-task commit message: the staged file this task
    produced and its row count. Only files named in a commit message
    are promoted — stray files from failed/speculative attempts stay
    in staging and are discarded."""

    def __init__(self, staged: str, rows: int) -> None:
        self.staged = staged
        self.rows = rows


class JsonLinesSinkWriter(DataSourceWriter):
    """Executor-side writer with the real two-phase commit discipline:

    * ``write(iterator)`` (per task, ON EXECUTORS) stages the
      partition's rows as JSON lines under ``<path>/_staging/`` with a
      task-attempt-unique name and returns a :class:`_FileCommit`.
      A retried or speculative attempt stages its OWN file; nothing is
      visible to readers yet.
    * ``commit(messages)`` (driver, exactly once, only after every task
      succeeded) promotes exactly the staged files named in the commit
      messages into ``<path>`` and writes a ``_SUCCESS`` manifest with
      the total row count — the atomic-visibility step every real sink
      (parquet committer, Delta txn log) performs.
    * ``abort`` removes the staging dir — a failed job leaves no
      partial output.

    This is the OTHER half of the Python Data Source story beside
    ``SyntheticFeedDataSource``'s read path: bespoke EGRESS (a vendor
    API, an internal index) made exactly-once by staging + manifest.

    DEPLOYMENT ASSUMPTION: ``path`` must be a filesystem shared between
    driver and executors (local mode, NFS, a FUSE-mounted object store)
    — tasks stage on executors and ``commit`` promotes from the driver.
    On a cluster without a shared mount this sink cannot commit; the
    production analogue stages to the object store itself. The staging
    directory is scoped PER WRITER INSTANCE (``_staging-<job-uuid>``) so
    concurrent append jobs into the same path can never promote or
    delete each other's staged files.
    """

    def __init__(self, options) -> None:
        import uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlines_sink requires a path option")
        # one staging namespace per logical write job; the instance (and
        # this id) is pickled to executors, so every task of this job
        # stages under the same dir and no other job's
        self.job_id = uuid.uuid4().hex[:12]

    def write(self, iterator):
        import json as _json
        import os
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        attempt = ctx.taskAttemptId() if ctx else uuid.uuid4().hex
        staging = os.path.join(self.path, f"_staging-{self.job_id}")
        os.makedirs(staging, exist_ok=True)
        staged = os.path.join(staging, f"task-{attempt}.jsonl")
        n = 0
        with open(staged, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        return _FileCommit(staged, n)

    def commit(self, messages) -> None:
        import json as _json
        import os
        import shutil
        import uuid

        # commit-scoped prefix: a second (append-mode) commit can never
        # silently replace an earlier commit's part files.
        tag = uuid.uuid4().hex[:8]
        total = 0
        for i, m in enumerate(messages):
            final = os.path.join(self.path, f"part-{tag}-{i:05d}.jsonl")
            shutil.move(m.staged, final)
            total += m.rows
        shutil.rmtree(
            os.path.join(self.path, f"_staging-{self.job_id}"),
            ignore_errors=True,
        )
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write(_json.dumps({"rows": total}))

    def abort(self, messages) -> None:
        import os
        import shutil

        shutil.rmtree(
            os.path.join(self.path, f"_staging-{self.job_id}"),
            ignore_errors=True,
        )


class JsonLinesSinkDataSource(DataSource):
    """``format("jsonlines_sink")`` — custom Python egress connector."""

    @classmethod
    def name(cls) -> str:
        return "jsonlines_sink"

    def writer(self, schema, overwrite: bool):
        import os
        import shutil

        path = self.options.get("path")
        if overwrite and path and os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        return JsonLinesSinkWriter(self.options)
