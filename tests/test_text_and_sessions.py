"""Text analysis, sessionization, and multimodal plumbing tests."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ml_feature_store_spark.multimodal import (
    attach_binary_payload,
    decode_image_stub,
    extract_image_features,
    frame_sample_stub,
)
from ml_feature_store_spark.operators.sessionize import session_stats, sessionize
from ml_feature_store_spark.operators.text import (
    fingerprint,
    lang_id,
    quality_score,
    rolling_hash_fingerprint,
)


@pytest.fixture
def docs(spark):
    rows = [
        (1, "the cat sat on the mat and the dog is in the house"),
        (2, "der hund ist in der stadt und das haus ist von den leuten"),
        (3, "xyzzy plugh foobar qux"),
        (4, "le chat est dans la maison et les chiens pour une fois"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestLangId:
    def test_predicts_languages(self, docs):
        out = {r.doc_id: r.pred_lang for r in lang_id(docs).collect()}
        assert out[1] == "en"
        assert out[2] == "de"
        assert out[3] == "unk"
        assert out[4] == "fr"


class TestQuality:
    def test_scores_bounded(self, docs):
        out = quality_score(docs).collect()
        for r in out:
            assert 0.0 <= r.quality <= 1.0
            assert r.n_tokens > 0
            assert 0.0 < r.uniq_ratio <= 1.0
        by_id = {r.doc_id: r for r in out}
        # repetitive doc 1 has lower uniq_ratio than all-distinct doc 3
        assert by_id[1].uniq_ratio < by_id[3].uniq_ratio


class TestFingerprint:
    def test_stable_and_order_insensitive(self, spark):
        a = spark.createDataFrame([(1, "alpha beta gamma")], ["doc_id", "text"])
        b = spark.createDataFrame([(2, "gamma alpha beta")], ["doc_id", "text"])
        fa = fingerprint(a).collect()[0]["fingerprint"]
        fb = fingerprint(b).collect()[0]["fingerprint"]
        assert fa == fb  # sorted-distinct-token signature ignores order

    def test_rolling_sketch(self, docs):
        out = rolling_hash_fingerprint(docs, window=3, keep=4).collect()
        for r in out:
            assert len(r.sketch) <= 4
            assert list(r.sketch) == sorted(r.sketch)


class TestSessionize:
    def _events(self, spark):
        t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
        rows = [
            (1, t0),
            (1, t0 + dt.timedelta(minutes=10)),   # same session
            (1, t0 + dt.timedelta(minutes=50)),   # 40min gap -> new session
            (2, t0),
        ]
        return spark.createDataFrame(rows, ["user_id", "ts"])

    def test_gap_splits_sessions(self, spark):
        out = sessionize(self._events(spark), gap_minutes=30).collect()
        sess = {(r.user_id, r.ts.minute): r.session_id for r in out}
        assert sess[(1, 0)] == 1 and sess[(1, 10)] == 1 and sess[(1, 50)] == 2
        assert sess[(2, 0)] == 1

    def test_session_stats(self, spark):
        out = {r.user_id: r for r in session_stats(self._events(spark)).collect()}
        assert out[1].n_sessions == 2 and out[1].n_events == 3
        assert out[2].n_sessions == 1

    def test_single_shuffle_plan(self, spark):
        from ml_feature_store_spark.plans import shuffle_count

        df = sessionize(self._events(spark))
        assert shuffle_count(df) == 1  # both windows share one exchange


class TestMultimodal:
    def test_binary_plumbing_end_to_end(self, docs):
        with_payload = attach_binary_payload(docs, "text")
        row = with_payload.collect()[0]
        assert isinstance(row.payload, (bytes, bytearray))
        assert row.media_meta.byte_len == len(row.payload)

        decoded = decode_image_stub(with_payload, deterministic_fake=True)
        rows = decoded.collect()
        assert all(64 <= r.width < 256 and 1 <= r.n_channels <= 3 for r in rows)
        # deterministic: same content -> same fake dims
        again = decode_image_stub(with_payload, deterministic_fake=True).collect()
        assert sorted((r.doc_id, r.width, r.height) for r in rows) == sorted(
            (r.doc_id, r.width, r.height) for r in again
        )

    def test_decode_without_codec_raises(self, docs):
        with_payload = attach_binary_payload(docs, "text")
        import pyspark.errors

        with pytest.raises(Exception, match="NotImplementedError|codec"):
            decode_image_stub(with_payload, deterministic_fake=False).collect()

    def test_audio_decode_stub(self, docs):
        from ml_feature_store_spark.multimodal import decode_audio_stub

        with_payload = attach_binary_payload(docs, "text", media_type="audio")
        rows = decode_audio_stub(with_payload, deterministic_fake=True).collect()
        for r in rows:
            assert r.sample_rate in (8000, 16000, 24000, 32000, 40000)
            assert r.n_samples == r.media_meta.byte_len * 32
            assert r.duration_s == pytest.approx(r.n_samples / r.sample_rate, abs=1e-4)
            # ceil-division window count over 1-second windows
            assert r.n_windows == -(-r.n_samples // r.sample_rate)
        with pytest.raises(Exception, match="NotImplementedError|codec"):
            decode_audio_stub(with_payload, deterministic_fake=False).collect()

    def test_feature_extraction_unit_norm(self, docs):
        feats = extract_image_features(attach_binary_payload(docs, "text"), dim=8)
        for r in feats.collect():
            assert len(r.features) == 8
            norm = sum(x * x for x in r.features) ** 0.5
            assert norm == pytest.approx(1.0, abs=1e-5)

    def test_frame_sampling(self, docs):
        out = frame_sample_stub(attach_binary_payload(docs, "text"), every_n=10)
        for r in out.collect():
            assert list(r.sampled_frames) == list(range(0, max(r.sampled_frames) + 1, 10))


class TestBucketedSessionize:
    @pytest.mark.parametrize("bucket_seconds", [3600, 7200, 86400])
    def test_bucketed_matches_plain(self, spark, bucket_seconds):
        """sessionize_bucketed must produce the exact session assignment of
        plain sessionize; small buckets force many boundary bridges (and
        bridges across empty buckets)."""
        from ml_feature_store_spark.operators.sessionize import (
            sessionize,
            sessionize_bucketed,
        )
        from ml_feature_store_spark.suite import table

        ev = table(spark, "/root/testdata/sf0.001", "events")
        plain = {
            (r.user_id, r.event_id): r.session_id
            for r in sessionize(ev).select("user_id", "event_id", "session_id").collect()
        }
        bucketed = {
            (r.user_id, r.event_id): r.session_id
            for r in sessionize_bucketed(ev, bucket_seconds=bucket_seconds)
            .select("user_id", "event_id", "session_id")
            .collect()
        }
        assert bucketed == plain


class TestNgramLangId:
    def test_predicts_real_language_samples(self, spark):
        """Char-trigram voting on genuinely multilingual sentences (the
        synthetic corpus is language-agnostic word salad, so real strings
        are the honest test)."""
        from ml_feature_store_spark.operators.text import lang_id_ngram

        samples = [
            (1, "the quick brown fox jumps over the lazy dog and the cat", "en"),
            (2, "der schnelle braune fuchs springt und die katze schlaeft ein", "de"),
            (3, "les enfants jouent dans le jardin et la mere est contente", "fr"),
            (4, "los ninos juegan en el jardin y la madre esta contenta de ellos", "es"),
        ]
        df = spark.createDataFrame([(i, t) for i, t, _ in samples], ["doc_id", "text"])
        got = {r.doc_id: r.pred_lang for r in lang_id_ngram(df).collect()}
        want = {i: lang for i, _, lang in samples}
        assert got == want

    def test_no_signal_gives_unk(self, spark):
        from ml_feature_store_spark.operators.text import lang_id_ngram

        df = spark.createDataFrame([(1, "zzz qqq xxx")], ["doc_id", "text"])
        assert lang_id_ngram(df).collect()[0].pred_lang == "unk"
