"""Property-based tests for the round-9 surfaces: export round-trips the
online view exactly, saved datasets freeze the training set as of the
save, and the metadata row-id watermark stays exact through random
register/append/upsert chains."""

from __future__ import annotations

import datetime as dt
import json
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ml_feature_store_spark import FeatureStore

BASE = dt.datetime(2024, 1, 1)

entities = st.sampled_from(["a", "b", "c", "d"])
day_offsets = st.integers(min_value=0, max_value=6)
values = st.integers(min_value=-50, max_value=50)
feature_rows = st.lists(
    st.tuples(entities, day_offsets, values), min_size=1, max_size=20
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(e, BASE + dt.timedelta(days=d), float(v)) for e, d, v in rows],
        ["entity_id", "timestamp", "f"],
    )


def spec_latest(rows):
    """Latest row per entity; ties -> first input row (SURVEY §2.3)."""
    best = {}
    for row_id, (e, d, v) in enumerate(rows):
        cur = best.get(e)
        if cur is None or d > cur[0] or (d == cur[0] and row_id < cur[1]):
            best[e] = (d, row_id, v)
    return {e: (d, float(v)) for e, (d, row_id, v) in best.items()}


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=feature_rows)
def test_export_roundtrips_online_view_exactly(spark, rows):
    """Export -> parse back == the latest-per-entity spec, including the
    ISO timestamp round-trip and the manifest row count."""
    fs = FeatureStore(spark)
    fs.register("t", _df(spark, rows))
    fs.materialize_online("t")
    d = tempfile.mkdtemp(prefix="mlfs_prop_exp_") + "/kv"
    n = fs.export_online("t", d)
    want = spec_latest(rows)
    assert n == len(want)
    back = {}
    import glob

    for p in glob.glob(d + "/part-*.jsonl"):
        with open(p) as f:
            for line in f:
                r = json.loads(line)
                ts = dt.datetime.fromisoformat(r["timestamp"])
                assert r["entity_id"] not in back, "duplicate entity exported"
                back[r["entity_id"]] = ((ts - BASE).days, r["f"])
    assert back == want
    manifest = json.load(open(d + "/_SUCCESS"))
    assert manifest["rows"] == len(want)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=feature_rows, extra=feature_rows)
def test_saved_dataset_frozen_under_append(spark, rows, extra):
    """The saved dataset equals the latest-per-entity spec AS OF THE
    SAVE, regardless of what is appended afterwards."""
    fs = FeatureStore(spark)
    fs.register("t", _df(spark, rows))
    spine = (
        _df(spark, rows)
        .select("entity_id")
        .distinct()
        .withColumn(
            "timestamp", F.lit(BASE + dt.timedelta(days=30)).cast("timestamp")
        )
    )
    fs.create_saved_dataset("d", "t", spine)
    fs.append("t", _df(spark, extra))  # must not leak in
    got = {
        r.entity_id: ((r.timestamp - BASE).days, r.f)
        for r in fs.get_saved_dataset("d").collect()
    }
    assert got == spec_latest(rows)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    batches=st.lists(feature_rows, min_size=1, max_size=4),
    patch=feature_rows,
)
def test_row_id_watermark_exact_through_mutation_chain(spark, batches, patch):
    """After any register/append*/upsert chain, the metadata max_row_id
    equals the actual max and ids stay unique (the invariant every
    watermark consumer relies on)."""
    fs = FeatureStore(spark)
    fs.register("t", _df(spark, batches[0]))
    for b in batches[1:]:
        fs.append("t", _df(spark, b))
    # upsert needs unique (entity, ts) keys in the patch
    seen, uniq = set(), []
    for e, d, v in patch:
        if (e, d) not in seen:
            seen.add((e, d))
            uniq.append((e, d, v))
    fs.upsert("t", _df(spark, uniq))
    st_meta = fs._backend.meta("t")
    rec = st_meta.versions[st_meta.version]
    cur = fs._current("t")
    actual = cur.agg(F.max("__row_id__")).collect()[0][0]
    assert rec.max_row_id == actual
    assert cur.select("__row_id__").distinct().count() == cur.count()
