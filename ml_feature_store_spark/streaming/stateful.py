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
