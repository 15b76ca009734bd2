"""Round-2 operator tests: salted distinct, histogram quantiles, chunking,
PII redaction, repetition stats, int8 quantization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ml_feature_store_spark.operators.agg import (
    count_distinct_salted,
    histogram_quantile_rollup,
)
from ml_feature_store_spark.operators.chunking import chunk_documents
from ml_feature_store_spark.operators.text import redact_pii, repetition_stats


class TestCountDistinctSalted:
    def test_matches_plain_count_distinct_with_hot_key(self, spark):
        # one key owns 90% of rows with many distinct values
        rows = [("hot", i % 700) for i in range(9000)]
        rows += [(f"k{i % 5}", i % 37) for i in range(1000)]
        df = spark.createDataFrame(rows, ["k", "v"])
        got = {
            r.k: r.n_distinct
            for r in count_distinct_salted(df, ["k"], "v", n_salts=8).collect()
        }
        want = {
            r.k: r.d
            for r in df.groupBy("k").agg(F.countDistinct("v").alias("d")).collect()
        }
        assert got == want

    def test_single_salt_degenerates_gracefully(self, spark):
        df = spark.createDataFrame([("a", 1), ("a", 1), ("a", 2)], ["k", "v"])
        out = count_distinct_salted(df, ["k"], "v", n_salts=1).collect()
        assert out[0].n_distinct == 2


class TestHistogramQuantile:
    def test_exact_when_values_align_with_bins(self, spark):
        # integer values, width 1: estimate == exact lower nearest-rank
        rows = [("g", float(v)) for v in range(1, 101)]
        df = spark.createDataFrame(rows, ["g", "v"])
        out = histogram_quantile_rollup(
            df, ["g"], "v", lo=0.0, hi=128.0, n_bins=128, percentiles=(0.5, 0.95)
        ).collect()[0]
        assert out.p50 == 50.0
        assert out.p95 == 95.0
        assert out.n_values == 100

    def test_error_bounded_by_bin_width(self, spark):
        import random

        rng = random.Random(7)
        vals = [rng.uniform(0, 50) for _ in range(2000)]
        df = spark.createDataFrame([("g", v) for v in vals], ["g", "v"])
        width = 64.0 / 1024
        out = histogram_quantile_rollup(
            df, ["g"], "v", lo=0.0, hi=64.0, n_bins=1024, percentiles=(0.5,)
        ).collect()[0]
        exact = sorted(vals)[int(0.5 * 2000) - 1]  # lower nearest-rank
        assert abs(out.p50 - exact) <= width

    def test_histograms_merge_across_fine_groups(self, spark):
        # union of two halves == histogram of the whole (mergeability)
        rows = [("g", float(v % 64)) for v in range(4000)]
        df = spark.createDataFrame(rows, ["g", "v"])
        whole = histogram_quantile_rollup(
            df, ["g"], "v", lo=0.0, hi=64.0, n_bins=64
        ).collect()[0]
        halves = df.withColumn("half", (F.monotonically_increasing_id() % 2).cast("int"))
        # rollup ignores the fine split entirely when grouping by g only
        again = histogram_quantile_rollup(
            halves, ["g"], "v", lo=0.0, hi=64.0, n_bins=64
        ).collect()[0]
        assert (whole.p50, whole.p95, whole.n_values) == (
            again.p50,
            again.p95,
            again.n_values,
        )


class TestChunking:
    def _doc(self, spark, n_tokens):
        text = " ".join(f"w{i}" for i in range(n_tokens))
        return spark.createDataFrame([(1, text)], ["doc_id", "text"])

    def test_windows_cover_and_overlap(self, spark):
        out = chunk_documents(
            self._doc(spark, 30), chunk_tokens=16, overlap_tokens=4
        ).collect()
        chunks = {r.chunk_idx: r.chunk_text.split(" ") for r in out}
        assert sorted(chunks) == [0, 1, 2]
        assert chunks[0] == [f"w{i}" for i in range(16)]
        assert chunks[1] == [f"w{i}" for i in range(12, 28)]
        assert chunks[2] == [f"w{i}" for i in range(24, 30)]  # short tail
        # stride 12 => neighbors share 4 tokens
        assert chunks[0][-4:] == chunks[1][:4]

    def test_short_doc_single_chunk(self, spark):
        out = chunk_documents(
            self._doc(spark, 5), chunk_tokens=16, overlap_tokens=4
        ).collect()
        assert len(out) == 1
        assert out[0].chunk_idx == 0 and out[0].chunk_n_tokens == 5

    def test_exact_multiple_no_empty_tail(self, spark):
        # n = chunk + stride -> exactly 2 windows, none empty
        out = chunk_documents(
            self._doc(spark, 28), chunk_tokens=16, overlap_tokens=4
        ).collect()
        assert [r.chunk_n_tokens for r in sorted(out, key=lambda r: r.chunk_idx)] == [16, 16]

    def test_bad_overlap_raises(self, spark):
        with pytest.raises(ValueError, match="overlap"):
            chunk_documents(self._doc(spark, 10), chunk_tokens=8, overlap_tokens=8)


class TestChunkingProperties:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        n=st.integers(min_value=1, max_value=200),
        chunk=st.integers(min_value=2, max_value=32),
        data=st.data(),
    )
    def test_dropping_overlaps_reconstructs_document(self, spark, n, chunk, data):
        """Invariant: chunk 0's tokens + every later chunk minus its first
        `overlap` tokens concatenate back to the original document —
        complete coverage, no gaps, no duplicated middles."""
        overlap = data.draw(self.st.integers(min_value=0, max_value=chunk - 1))
        toks = [f"w{i}" for i in range(n)]
        df = spark.createDataFrame([(1, " ".join(toks))], ["doc_id", "text"])
        out = sorted(
            (r.chunk_idx, r.chunk_text.split(" "))
            for r in chunk_documents(
                df, chunk_tokens=chunk, overlap_tokens=overlap
            ).collect()
        )
        rebuilt = list(out[0][1])
        for _, ctoks in out[1:]:
            rebuilt.extend(ctoks[overlap:])
        assert rebuilt == toks


class TestRollupProperty:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    rows_strategy = st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 100)),
        min_size=1,
        max_size=8,
    )

    @settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
    @given(batches=st.lists(rows_strategy, min_size=1, max_size=4))
    def test_refresh_equals_direct_aggregate(self, spark, batches):
        import datetime as dt

        from ml_feature_store_spark import FeatureStore

        def df(rows, off):
            return spark.createDataFrame(
                [
                    (g, dt.datetime(2024, 1, 1) + dt.timedelta(hours=off + i), g, v)
                    for i, (g, v) in enumerate(rows)
                ],
                ["entity_id", "timestamp", "grp", "v"],
            )

        fs = FeatureStore(spark)
        fs.register("fact", df(batches[0], 0))
        fs.create_rollup("fact", "r", ["grp"], ["v"])
        all_rows = list(batches[0])
        for i, batch in enumerate(batches[1:], start=1):
            fs.append("fact", df(batch, i * 1000))
            all_rows.extend(batch)
        fs.refresh_rollup("r")
        got = {
            r.grp: (r.n_rows, r.sum_v, r.min_v, r.max_v)
            for r in fs.get_rollup("r").collect()
        }
        want = {}
        for g, v in all_rows:
            n, s, lo, hi = want.get(g, (0, 0, None, None))
            want[g] = (
                n + 1,
                s + v,
                v if lo is None else min(lo, v),
                v if hi is None else max(hi, v),
            )
        assert got == want


class TestRedactPII:
    def test_all_kinds_redacted_and_counted(self, spark):
        text = (
            "reach me at jane.doe+spam@corp.example.org or 555-867-5309; "
            "ssn 123-45-6789 host 192.168.0.1 done"
        )
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        out = redact_pii(df).collect()[0]
        assert out.pii_email_count == 1
        assert out.pii_phone_count == 1
        assert out.pii_ssn_count == 1
        assert out.pii_ipv4_count == 1
        red = out.redacted
        assert "[EMAIL]" in red and "[PHONE]" in red
        assert "[SSN]" in red and "[IPV4]" in red
        assert "jane" not in red and "5309" not in red and "6789" not in red

    def test_clean_text_untouched(self, spark):
        df = spark.createDataFrame([(1, "nothing sensitive here")], ["doc_id", "text"])
        out = redact_pii(df).collect()[0]
        assert out.redacted == "nothing sensitive here"
        assert out.pii_email_count == 0


class TestRepetitionStats:
    def test_duplicate_lines_flagged(self, spark):
        text = "\n".join(["same line here"] * 8 + ["one odd line out"])
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        out = repetition_stats(df).collect()[0]
        assert out.n_lines == 9 and out.dup_lines == 7
        assert out.repetitious

    def test_repeated_ngram_flagged(self, spark):
        text = " ".join(["ha"] * 40 + ["ok", "fine"])
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        out = repetition_stats(df, ngram=2).collect()[0]
        assert out.top_gram_count == 39  # "ha ha" x39
        assert out.repetitious

    def test_diverse_text_clean(self, spark):
        text = " ".join(f"tok{i}" for i in range(60))
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        out = repetition_stats(df).collect()[0]
        assert not out.repetitious
        assert out.dup_lines == 0 and out.top_gram_count == 1


class TestPitWindowAgg:
    def _setup(self, spark):
        import datetime as dt

        from ml_feature_store_spark.operators.features import pit_window_agg

        base = dt.datetime(2024, 1, 1)
        h = dt.timedelta(hours=1)
        feats = spark.createDataFrame(
            [
                ("a", base + 0 * h, 10.0),
                ("a", base + 1 * h, 20.0),
                ("a", base + 25 * h, 40.0),
                ("a", base + 30 * h, 80.0),  # after the spine row: leakage test
                ("b", base + 2 * h, 7.0),
            ],
            ["entity_id", "timestamp", "v"],
        )
        spine = spark.createDataFrame(
            [
                ("a", base + 26 * h, "lbl1"),
                ("c", base + 26 * h, "lbl2"),  # no history at all
            ],
            ["entity_id", "timestamp", "label"],
        )
        return pit_window_agg(
            spine, feats, "v", window_seconds=(86400, 7 * 86400)
        ), base

    def test_windows_and_leakage(self, spark):
        out, _ = self._setup(spark)
        rows = {r.entity_id: r for r in out.collect()}
        a = rows["a"]
        # 1d window (2h, 26h]: only the 25h row; 30h row must NOT leak in
        assert a.n_86400s == 1 and a.sum_86400s == 40.0
        assert a.min_86400s == 40.0 and a.max_86400s == 40.0
        # 7d window: 0h, 1h, 25h
        assert a.n_604800s == 3 and a.sum_604800s == 70.0

    def test_empty_history_and_passthrough(self, spark):
        out, _ = self._setup(spark)
        rows = {r.entity_id: r for r in out.collect()}
        c = rows["c"]
        assert c.n_604800s == 0 and c.sum_604800s == 0.0
        assert c.min_604800s is None and c.max_604800s is None
        assert rows["a"].label == "lbl1" and c.label == "lbl2"

    def test_exclusive_upper_bound(self, spark):
        import datetime as dt

        from ml_feature_store_spark.operators.features import pit_window_agg

        base = dt.datetime(2024, 1, 1)
        feats = spark.createDataFrame(
            [("a", base, 5.0), ("a", base - dt.timedelta(hours=1), 3.0)],
            ["entity_id", "timestamp", "v"],
        )
        spine = spark.createDataFrame([("a", base)], ["entity_id", "timestamp"])
        incl = pit_window_agg(spine, feats, "v", window_seconds=(86400,)).collect()[0]
        excl = pit_window_agg(
            spine, feats, "v", window_seconds=(86400,), include_equal=False
        ).collect()[0]
        assert incl.n_86400s == 2  # equal-ts feature counted
        assert excl.n_86400s == 1  # only the strictly-earlier one


class TestQuantizeInt8:
    def test_extremes_and_bounds(self, spark):
        from ml_feature_store_spark.functions.vector import dequant_scale, quantize_int8

        df = spark.createDataFrame(
            [(1, [0.5, -1.0, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
            ["id", "v"],
        )
        out = (
            df.select(
                "id",
                quantize_int8(F.col("v")).alias("q"),
                dequant_scale(F.col("v")).alias("s"),
            )
            .collect()
        )
        by_id = {r.id: r for r in out}
        assert by_id[1].q == [64, -127, 32, 0]  # floor(x*127/max + .5)
        assert by_id[2].q == [0, 0, 0, 0]  # zero vector guarded
        assert abs(by_id[1].s - 1.0 / 127.0) < 1e-12

    def test_dequant_error_bounded(self, spark):
        import random

        from ml_feature_store_spark.functions.vector import dequant_scale, quantize_int8

        rng = random.Random(3)
        vec = [rng.uniform(-1, 1) for _ in range(64)]
        df = spark.createDataFrame([(1, vec)], ["id", "v"])
        r = df.select(
            quantize_int8(F.col("v")).alias("q"), dequant_scale(F.col("v")).alias("s")
        ).collect()[0]
        for orig, q in zip(vec, r.q):
            assert abs(orig - q * r.s) <= r.s / 2 + 1e-12
