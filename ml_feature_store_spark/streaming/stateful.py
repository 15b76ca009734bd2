"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no streaming at all (reference README.md:108); Spark's
built-in windowed aggregations (see ingest.py) cover time-bucketed features,
but *running* per-entity features — "count and sum of everything seen so
far, as of each micro-batch" — need explicit keyed state. That is exactly
``applyInPandasWithState``: state lives in the state store (RocksDB/HDFS
at scale, checkpointed), each key's pandas batches arrive Arrow-vectorized,
and the watermark/timeout bounds state growth.

Scale shape: state is partitioned by the grouping key across executors;
each micro-batch shuffles only that batch's rows on the key. State size is
O(distinct keys), not O(events).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts_us", LongType()),
        StructField("last_value", DoubleType()),
        StructField("last_event_id", LongType()),
    ]
)

RUNNING_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts_us", LongType()),
        StructField("last_value", DoubleType()),
        StructField("last_event_id", LongType()),
    ]
)


def _update_running(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into the running state and
    emit the updated snapshot row. The "last" row is the lexicographic max
    of (ts_us, event_id) — event_id tie-breaks same-microsecond events, so
    the fold is deterministic under any file/batch arrival order (the
    batch-twin oracle replays it as a row_number window)."""
    if state.exists:
        n, s, last_ts, last_v, last_eid = state.get
    else:
        n, s, last_ts, last_v, last_eid = 0, 0.0, -1, float("nan"), -1
    for pdf in pdfs:
        if pdf.empty:
            continue
        n += len(pdf)
        s += float(pdf["value"].sum())
        # last = lexicographic max (ts_us, event_id) within this batch
        idx = pdf.sort_values(["ts_us", "event_id"]).index[-1]
        cand = (int(pdf["ts_us"].loc[idx]), int(pdf["event_id"].loc[idx]))
        if cand >= (last_ts, last_eid):
            last_ts, last_eid = cand
            last_v = float(pdf["value"].loc[idx])
    state.update((n, s, last_ts, last_v, last_eid))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [s],
            "last_ts_us": [last_ts],
            "last_value": [last_v],
            "last_event_id": [last_eid],
        }
    )


def streaming_running_features(events: DataFrame) -> DataFrame:
    """Running per-user feature snapshot, updated every micro-batch.

    Input: a streaming events DataFrame with (user_id, ts, value). Output
    (update mode): one row per user per micro-batch with the cumulative
    count/sum and the latest (event-time) value — the online-serving twin
    of the batch ``a1_agg_entity_stats`` + ``f4_latest_per_entity`` pair.
    """
    from pyspark.sql import functions as F

    prepped = events.select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "value", "event_id"
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _update_running,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_STATE_SCHEMA = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
    ]
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
        StructField("last_ts_us", LongType()),
    ]
)

_GAP_US = 30 * 60 * 1_000_000


def _update_sessions(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Gap-based session counting with cross-batch state carry: a row
    opens a new session iff it is the key's first ever or follows the
    previous event by more than 30 minutes. Rows are sorted by
    (ts_us, event_id) within the accumulated batch; correctness across
    batches requires the feed to be per-key time-ordered between
    micro-batches (the standard structured-streaming assumption — late
    rows would be watermark-dropped in production; the suite's feed is
    split at a time boundary so the property holds exactly)."""
    if state.exists:
        last_ts, n_sessions, n_events = state.get
    else:
        last_ts, n_sessions, n_events = -1, 0, 0
    frames = [pdf for pdf in pdfs if not pdf.empty]
    if frames:
        rows = pd.concat(frames).sort_values(["ts_us", "event_id"])
        ts = rows["ts_us"].to_numpy()
        prev = ts[:-1]
        first_gap = bool(last_ts < 0 or ts[0] - last_ts > _GAP_US)
        n_sessions += int(first_gap) + int((ts[1:] - prev > _GAP_US).sum())
        n_events += len(ts)
        last_ts = int(ts[-1])
    state.update((last_ts, n_sessions, n_events))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_sessions": [n_sessions],
            "n_events": [n_events],
            "last_ts_us": [last_ts],
        }
    )


def streaming_session_counts(events: DataFrame) -> DataFrame:
    """Per-user running session count over a stream — the stateful twin of
    the batch sessionize operator (operators/sessionize.py): state is one
    (last_ts, counters) triple per user, NOT the event history, so the
    state store is O(users) at any stream length. Emits the updated
    snapshot per user per micro-batch (outputMode update); the latest
    snapshot equals the batch answer, which is how the suite's sd3 query
    oracles this surface with the SAME SQL as x7_sessionize."""
    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update_sessions,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


RECORD_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("n_records", LongType()),
        StructField("max_cents", LongType()),
    ]
)


def streaming_record_tracker(events: DataFrame) -> DataFrame:
    """Per-entity record tracker on the NEW ``transformWithState`` API
    (Spark 4's typed-state successor to ``applyInPandasWithState``,
    which `streaming_running_features` covers): counts how many times
    each user set a strictly-new personal-best value — the
    "record-breaking event" feature (fraud ceilings, engagement highs).

    Why this operator is the TWS witness: the output DEPENDS on fold
    order (a record is relative to everything seen before), so a green
    oracle row proves micro-batches really flowed through the typed
    ``ValueState`` in sequence — a stronger state-carry-over proof than
    an order-free sum. Within a batch the kernel sorts its Arrow chunk
    by (ts_us, event_id) — shuffle delivery order is undefined — so the
    total fold order is (batch index, ts_us, event_id), which a batch
    engine can replay exactly (the sd5 oracle's window does).

    Scale shape: state is ONE typed row per user in the state store
    (RocksDB at scale), each micro-batch shuffles only its own rows on
    the key, and the per-batch fold is a vectorized numpy cummax —
    O(batch) work, O(keys) state, same as the sd2 lane. TTL is
    available on the state handle (``ttlDurationMs``) when entity
    churn should bound the key set.

    ENV CONSTRAINT (same class as delta-spark/Avro, documented in
    SURVEY §7): TWS requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``) AND the
    ``protobuf`` package — its Python<->JVM state protocol is
    protobuf-framed. This container ships no protobuf, so the operator
    raises the driver-worker init failure here; the pytest witness
    import-gates on protobuf and activates wherever the dependency
    exists. ``streaming_running_features`` (applyInPandasWithState)
    is the dependency-free stateful lane the suite drives end-to-end."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RecordTracker(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState(
                "runrec", "n_events long, n_records long, max_cents long"
            )

        def handleInputRows(self, key, rows, timerValues):
            import numpy as np

            if self._st.exists():
                n, rec, mx = self._st.get()
            else:
                n, rec, mx = 0, 0, None
            batch = pd.concat(list(rows), ignore_index=True)
            batch = batch.sort_values(["ts_us", "event_id"])
            c = batch["cents"].to_numpy(dtype="int64")
            if c.size:
                floor = np.int64(-(2**63)) if mx is None else np.int64(mx)
                run = np.maximum.accumulate(
                    np.concatenate((np.array([floor]), c))
                )
                rec += int((c > run[:-1]).sum())
                n += int(c.size)
                mx = int(run[-1])
            self._st.update((n, rec, mx))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "n_records": [rec],
                    "max_cents": [mx],
                }
            )

        def close(self) -> None:
            pass

    prepared = events.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RecordTracker(),
        outputStructType=RECORD_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
