"""Append-mode index state + compaction (round-12).

refresh_vector_index / refresh_dedup_index write DELTA-ONLY fragments
(the SCALE-100TB.md append-mode promise made executable: refresh I/O is
O(delta), the stored base is never re-read or re-written by a fold);
compact_vector_index / compact_dedup_index fold the chain back to one
clustered version. The contract pinned here:

  * fragments accumulate one per non-empty refresh; n_fragments reports
    the chain length;
  * serving is IDENTICAL across the chain lifecycle — fragmented ==
    compacted == built-from-scratch results;
  * compaction is publish-then-prune: a stale writer refuses before
    touching state;
  * the chain round-trips the persisted registry;
  * legacy scalar-pin specs (pre-fragment registries) still read.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ml_feature_store_spark.errors import FeatureStoreError
from ml_feature_store_spark.store import FeatureStore

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    from ml_feature_store_spark.suite import table

    return table(spark, SF, "embeddings").select(
        F.col("vec_id").alias("entity_id"),
        F.lit("2024-01-01").cast("timestamp").alias("timestamp"),
        "embedding",
    ).cache()


@pytest.fixture(scope="module")
def docs(spark):
    from ml_feature_store_spark.suite import table

    return table(spark, SF, "documents").select(
        F.col("doc_id").alias("entity_id"),
        F.lit("2024-01-01").cast("timestamp").alias("timestamp"),
        "text",
    ).cache()


def _knn_rows(fs, q, index="vx"):
    return [
        (r["vec_id"], round(r["sim"], 9))
        for r in fs.knn(index, q, k=5).collect()
    ]


class TestVectorFragments:
    def test_chain_grows_and_serving_is_invariant(self, spark, emb):
        fs = FeatureStore(spark)
        fs.register("vecs", emb.filter("entity_id % 3 = 0"))
        fs.create_vector_index(
            "vx", "vecs", method="ivf", params={"n_cells": 4, "iterations": 1}
        )
        assert fs.get_vector_index_info("vx")["n_fragments"] == 1
        q = [float(x) for x in emb.limit(1).collect()[0]["embedding"]]

        fs.append("vecs", emb.filter("entity_id % 3 = 1"))
        fs.refresh_vector_index("vx")
        assert fs.get_vector_index_info("vx")["n_fragments"] == 2
        fs.append("vecs", emb.filter("entity_id % 3 = 2"))
        fs.refresh_vector_index("vx")
        assert fs.get_vector_index_info("vx")["n_fragments"] == 3

        fragmented = _knn_rows(fs, q)
        assert fs.compact_vector_index("vx") == 3
        assert fs.get_vector_index_info("vx")["n_fragments"] == 1
        assert _knn_rows(fs, q) == fragmented

        # one-fragment compaction is a no-op fold but still re-pins
        assert fs.compact_vector_index("vx") == 1

    def test_empty_refresh_adds_no_fragment(self, spark, emb):
        fs = FeatureStore(spark)
        fs.register("vecs_e", emb.filter("entity_id % 3 = 0"))
        fs.create_vector_index(
            "vxe", "vecs_e", method="ivf", params={"n_cells": 4, "iterations": 1}
        )
        fs.refresh_vector_index("vxe")
        assert fs.get_vector_index_info("vxe")["n_fragments"] == 1

    def test_chain_survives_reopen(self, spark, emb, tmp_path):
        fs = FeatureStore(spark, storage_path=str(tmp_path))
        fs.register("vecs", emb.filter("entity_id % 3 = 0"))
        fs.create_vector_index(
            "vx", "vecs", method="ivf", params={"n_cells": 4, "iterations": 1}
        )
        fs.append("vecs", emb.filter("entity_id % 3 = 1"))
        fs.refresh_vector_index("vx")
        q = [float(x) for x in emb.limit(1).collect()[0]["embedding"]]
        before = _knn_rows(fs, q)

        fs2 = FeatureStore(spark, storage_path=str(tmp_path))
        assert fs2.get_vector_index_info("vx")["n_fragments"] == 2
        assert _knn_rows(fs2, q) == before
        assert fs2.compact_vector_index("vx") == 2
        assert _knn_rows(fs2, q) == before

    def test_stale_writer_refuses_compaction(self, spark, emb, tmp_path):
        fs1 = FeatureStore(spark, storage_path=str(tmp_path))
        fs1.register("vecs", emb.filter("entity_id % 3 = 0"))
        fs1.create_vector_index(
            "vx", "vecs", method="ivf", params={"n_cells": 4, "iterations": 1}
        )
        fs2 = FeatureStore(spark, storage_path=str(tmp_path))
        fs1.append("vecs", emb.filter("entity_id % 3 = 1"))
        fs1.refresh_vector_index("vx")  # bumps the registry generation
        with pytest.raises(FeatureStoreError, match="generation"):
            fs2.compact_vector_index("vx")

    def test_legacy_scalar_pin_still_reads(self, spark, emb):
        fs = FeatureStore(spark)
        fs.register("vecs_l", emb.filter("entity_id % 3 = 0"))
        fs.create_vector_index(
            "vxl", "vecs_l", method="ivf", params={"n_cells": 4, "iterations": 1}
        )
        spec = fs._vector_indexes["vxl"]
        spec["data_versions"] = None  # what a pre-r12 registry loads as
        q = [float(x) for x in emb.limit(1).collect()[0]["embedding"]]
        assert len(_knn_rows(fs, q, "vxl")) == 5
        assert fs.get_vector_index_info("vxl")["n_fragments"] == 1


class TestDedupFragments:
    def test_fragmented_equals_scratch_and_compacts(self, spark, docs):
        fs = FeatureStore(spark)
        fs.register("corpus", docs.filter("entity_id % 2 = 0"))
        fs.create_dedup_index("dd", "corpus", content_col="text")
        fs.append("corpus", docs.filter("entity_id % 2 = 1"))
        fs.refresh_dedup_index("dd")
        assert fs.get_dedup_index_info("dd")["n_fragments"] == 2

        fs.register("corpus_all", docs)
        fs.create_dedup_index("dd_all", "corpus_all", content_col="text")

        def sigs(idx):
            return {
                (r["doc_id"], r["hh"], tuple(r["minhash"]))
                for r in fs.get_dedup_signatures(idx).collect()
            }

        fragmented = sigs("dd")
        assert fragmented == sigs("dd_all")
        assert fs.compact_dedup_index("dd") == 2
        assert fs.get_dedup_index_info("dd")["n_fragments"] == 1
        assert sigs("dd") == fragmented

    def test_batch_through_fragmented_chain(self, spark, docs):
        fs = FeatureStore(spark)
        fs.register("corpus", docs.filter("entity_id % 4 = 1"))
        fs.create_dedup_index("dd", "corpus", content_col="text")
        fs.append("corpus", docs.filter("entity_id % 4 = 2"))
        fs.refresh_dedup_index("dd")
        new = docs.filter("entity_id % 4 = 0").select(
            F.col("entity_id").alias("doc_id"), "text"
        )
        frag = {
            (r["doc_id"], r["is_exact_dup"], r["n_fuzzy"], r["best_j_e6"])
            for r in fs.dedup_batch(
                "dd", new, id_col="doc_id", content_col="text"
            ).collect()
        }
        fs.compact_dedup_index("dd")
        comp = {
            (r["doc_id"], r["is_exact_dup"], r["n_fuzzy"], r["best_j_e6"])
            for r in fs.dedup_batch(
                "dd", new, id_col="doc_id", content_col="text"
            ).collect()
        }
        assert frag == comp


class TestStreamAutoCompaction:
    """Round-12: the auto-refresh hot loop appends a fragment per fold;
    max_fragments makes the stream its own maintenance job."""

    def test_auto_fold_compacts_at_threshold(self, spark, docs, tmp_path):
        from ml_feature_store_spark.streaming.ingest import (
            stream_dedup_enrich,
        )

        fs = FeatureStore(spark)
        fs.register("corpus", docs.filter("entity_id % 4 != 0"))
        fs.create_dedup_index("dd", "corpus")
        extra = docs.filter("entity_id % 4 = 2").limit(5).select(
            (F.col("entity_id") + 500_000).alias("entity_id"),
            "timestamp", "text",
        )
        fs.append("corpus", extra)
        new = docs.filter("entity_id % 4 = 0").select(
            F.col("entity_id").alias("doc_id"), "text"
        )
        feed, sink, ck = (str(tmp_path / n) for n in ("f", "s", "c"))
        new.coalesce(1).write.parquet(feed)
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        # threshold 2: the auto fold takes the chain to 2 fragments and
        # must immediately compact back to 1 — the serving manifest is
        # unchanged either way (compaction is serving-invariant)
        q = stream_dedup_enrich(
            stream, fs, "dd", sink, ck, id_col="doc_id",
            content_col="text", refresh="auto", max_fragments=2,
        )
        try:
            q.awaitTermination(120)
        finally:
            q.stop()
        assert fs.get_dedup_index_info("dd")["n_fragments"] == 1
        got = {
            tuple(r)
            for r in spark.read.parquet(sink).drop("batch_id").collect()
        }
        want = {tuple(r) for r in fs.dedup_batch("dd", new).collect()}
        assert got == want


class TestFragmentLifecycleInterplay:
    """The chain must interact correctly with every other lifecycle
    surface: reencode collapses it, drift reads through it, and a
    two-instance writer cannot publish over a stale view of it."""

    def test_reencode_collapses_the_chain(self, spark, emb):
        fs = FeatureStore(spark)
        fs.register("vecs_r", emb.filter("entity_id % 3 = 0"))
        fs.create_vector_index(
            "vxr", "vecs_r", method="ivf",
            params={"n_cells": 4, "iterations": 1},
        )
        fs.append("vecs_r", emb.filter("entity_id % 3 = 1"))
        fs.refresh_vector_index("vxr")
        assert fs.get_vector_index_info("vxr")["n_fragments"] == 2
        # a rewrite flags the index; reencode recovers AND re-pins a
        # single fresh state version (the chain must not survive a
        # full re-encode — its fragments describe superseded rows)
        fs.upsert("vecs_r", emb.filter("entity_id % 3 = 0").limit(2))
        with pytest.raises(FeatureStoreError, match="rewritten"):
            fs.refresh_vector_index("vxr")
        fs.reencode_vector_index("vxr")
        assert fs.get_vector_index_info("vxr")["n_fragments"] == 1
        q = [float(x) for x in emb.limit(1).collect()[0]["embedding"]]
        assert len(fs.knn("vxr", q, k=3).collect()) == 3

    def test_drift_reads_through_fragments(self, spark, emb):
        fs = FeatureStore(spark)
        fs.register("vecs_d", emb.filter("entity_id % 3 = 0"))
        fs.create_vector_index(
            "vxd", "vecs_d", method="ivf",
            params={"n_cells": 4, "iterations": 1},
        )
        fs.append("vecs_d", emb.filter("entity_id % 3 = 1"))
        fs.refresh_vector_index("vxd")
        # i.i.d. fold across two fragments: occupancy follows the build
        # proportions, the signal must stay quiet
        stat = fs.vector_index_drift_stat("vxd")
        assert not stat["recommend_rebuild"]
        # and the histogram covers BOTH fragments' rows
        total = sum(
            r["cur_n"] for r in fs.vector_index_drift(
                "vxd", include_pending=False
            ).collect()
        )
        assert total == fs.get_vector_index_info("vxd")["src_rows"]

    def test_two_instance_probe_publish_cas(self, spark, tmp_path):
        import datetime as dt

        rows = [
            (f"u{i}", dt.datetime(2024, 1, 1), i % 7, i % 20)
            for i in range(60)
        ]
        df = spark.createDataFrame(
            rows, ["entity_id", "timestamp", "feature_a", "feature_b"]
        )
        a = FeatureStore(spark, storage_path=str(tmp_path))
        a.register("t", df)
        b = FeatureStore(spark, storage_path=str(tmp_path))
        a.create_probe(
            "p1", "t", {"x0": "1", "x1": "feature_b - 10"},
            "CASE WHEN feature_a >= 3 THEN 1 ELSE 0 END",
        )
        # b's view is now stale: its probe publish must refuse, and the
        # refusal must leave b's in-memory spec map unchanged
        with pytest.raises(FeatureStoreError, match="generation"):
            b.create_probe(
                "p2", "t", {"x0": "1", "x1": "feature_b - 10"},
                "CASE WHEN feature_a >= 3 THEN 1 ELSE 0 END",
            )
        assert b.list_probes() == []
        # reopen picks up p1 and can publish p2
        b2 = FeatureStore(spark, storage_path=str(tmp_path))
        assert b2.list_probes() == ["p1"]
        b2.create_probe(
            "p2", "t", {"x0": "1", "x1": "feature_b - 10"},
            "CASE WHEN feature_a >= 3 THEN 1 ELSE 0 END",
        )
        assert FeatureStore(
            spark, storage_path=str(tmp_path)
        ).list_probes() == ["p1", "p2"]
