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


spine_rows = st.lists(
    st.tuples(entities, day_offsets), min_size=1, max_size=8
)


class TestWindowViewProperties:
    """f42: RANGE-frame trailing aggregates == brute-force reference."""

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(rows=feature_rows, spine=spine_rows)
    def test_matches_python_reference(self, spark, rows, spine):
        fs = FeatureStore(spark)
        fs.register("wvp_prop", _df(spark, rows))
        fs.create_window_view(
            "wv_prop",
            "wvp_prop",
            [
                {"column": "f", "function": "sum",
                 "window_seconds": 3 * 86400, "alias": "s3d"},
                {"column": "f", "function": "count",
                 "window_seconds": 3 * 86400, "alias": "n3d"},
            ],
        )
        sp = spark.createDataFrame(
            [(e, BASE + dt.timedelta(days=d)) for e, d in spine],
            ["entity_id", "timestamp"],
        )
        got = {
            (r.entity_id, r.timestamp): (r.s3d, r.n3d)
            for r in fs.get_window_training_set("wv_prop", sp).collect()
        }
        for e, d in set(spine):
            ts_ = BASE + dt.timedelta(days=d)
            in_win = [
                float(v)
                for (e2, d2, v) in rows
                if e2 == e and 0 <= (d - d2) <= 3
            ]
            want = (sum(in_win) if in_win else None, len(in_win))
            assert got[(e, ts_)] == want


class TestWoeIvProperties:
    """fe9: IV terms are non-negative; fractions normalize."""

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(rows=st.lists(
        st.tuples(st.sampled_from(["p", "q", "r"]), st.booleans()),
        min_size=4, max_size=40,
    ))
    def test_iv_nonnegative_fractions_normalize(self, spark, rows):
        from ml_feature_store_spark.operators.drift import woe_iv

        # ensure both classes exist (degenerate one-class inputs divide
        # by a zero total and are a caller error, not a property case)
        rows = rows + [("p", True), ("q", False)]
        df = spark.createDataFrame(rows, ["cat", "y"])
        rep = woe_iv(df, "cat", "y").collect()
        assert abs(sum(r.pos_frac for r in rep) - 1.0) < 1e-9
        assert abs(sum(r.neg_frac for r in rep) - 1.0) < 1e-9
        for r in rep:
            # (pf - nf) and ln((pf+e)/(nf+e)) always share a sign
            assert r.iv_term >= -1e-9


class TestWalkForwardProperties:
    """cv1: no test row inside the purge gap; train grows with the cut."""

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(rows=st.lists(day_offsets, min_size=3, max_size=40))
    def test_purge_and_monotone_train(self, spark, rows):
        from ml_feature_store_spark.operators.sampling import (
            walk_forward_folds,
        )

        df = spark.createDataFrame(
            [(i, BASE + dt.timedelta(days=d, hours=3)) for i, d in enumerate(rows)],
            ["id", "ts"],
        )
        cuts = ["2024-01-02", "2024-01-04"]
        out = walk_forward_folds(df, "ts", cuts, 86400.0, 2 * 86400.0).collect()
        cut_ts = {0: dt.datetime(2024, 1, 2), 1: dt.datetime(2024, 1, 4)}
        train_n = {0: 0, 1: 0}
        for r in out:
            c = cut_ts[r.fold]
            if r.split == "train":
                assert r.ts <= c
                train_n[r.fold] += 1
            else:
                assert r.ts > c + dt.timedelta(days=1)
                assert r.ts <= c + dt.timedelta(days=3)
        assert train_n[1] >= train_n[0]
