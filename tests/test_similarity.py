"""Similarity-search tests: brute force, query sets, LSH, IVF — on the real
embeddings table (sf0.001) plus crafted vectors for recall assertions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ml_feature_store_spark.operators.similarity import (
    ivf_assign,
    knn_brute_force,
    knn_for_queries,
    knn_ivf,
    knn_lsh,
    rp_lsh_bucketize,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def qvec(emb):
    return list(emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"])


class TestBruteForce:
    def test_self_is_top1(self, emb, qvec):
        out = knn_brute_force(emb, qvec, k=3).collect()
        assert out[0]["vec_id"] == 0
        assert out[0]["sim"] == pytest.approx(1.0, abs=1e-9)
        assert out[0]["sim"] >= out[1]["sim"] >= out[2]["sim"]

    def test_k_bound(self, emb, qvec):
        assert knn_brute_force(emb, qvec, k=7).count() == 7


class TestQuerySet:
    def test_topk_per_query(self, emb):
        queries = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        )
        out = knn_for_queries(emb, queries, k=5)
        counts = out.groupBy("q_id").count().collect()
        assert {r["q_id"]: r["count"] for r in counts} == {0: 5, 1: 5, 2: 5}
        # each query's own vector ranks first
        firsts = (
            out.withColumn(
                "rn",
                F.row_number().over(
                    __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                        "q_id"
                    ).orderBy(F.col("sim").desc())
                ),
            )
            .filter("rn = 1")
            .collect()
        )
        assert all(r["q_id"] == r["vec_id"] for r in firsts)


class TestLSH:
    def test_bucket_determinism_and_range(self, emb):
        b1 = rp_lsh_bucketize(emb, dim=64, bits=6).select("vec_id", "bucket").collect()
        b2 = rp_lsh_bucketize(emb, dim=64, bits=6).select("vec_id", "bucket").collect()
        assert sorted((r.vec_id, r.bucket) for r in b1) == sorted(
            (r.vec_id, r.bucket) for r in b2
        )
        assert all(0 <= r.bucket < 64 for r in b1)

    def test_query_finds_itself(self, emb, qvec):
        bucketed = rp_lsh_bucketize(emb, dim=64, bits=6)
        out = knn_lsh(bucketed, qvec, dim=64, k=3, bits=6).collect()
        assert out and out[0]["vec_id"] == 0  # own bucket contains the vector itself

    def test_multiprobe_widens_candidates(self, emb, qvec):
        bucketed = rp_lsh_bucketize(emb, dim=64, bits=6).cache()
        n0 = knn_lsh(bucketed, qvec, dim=64, k=500, bits=6, multiprobe=0).count()
        n3 = knn_lsh(bucketed, qvec, dim=64, k=500, bits=6, multiprobe=3).count()
        assert n3 >= n0


class TestIVF:
    def test_assign_and_probe(self, spark, emb, qvec):
        # centroids: a few real vectors act as the coarse codebook
        cents = emb.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
        )
        assigned = ivf_assign(emb, cents).cache()
        assert assigned.count() == emb.count()          # every vector assigned
        assert assigned.select("cell").distinct().count() <= 8
        out = knn_ivf(assigned, cents, qvec, k=3, nprobe=2).collect()
        assert out[0]["vec_id"] == 0                     # query cell contains vec 0
        assert out[0]["sim"] == pytest.approx(1.0, abs=1e-9)
