"""k-means (operators/clustering.py): Lloyd-objective and determinism
properties over the embeddings fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ml_feature_store_spark.operators.clustering import (
    assign_clusters,
    inertia,
    kmeans,
    update_centroids,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    from ml_feature_store_spark.suite import table

    return table(spark, SF, "embeddings").cache()


class TestKMeans:
    def test_clusters_partition_the_input(self, spark, emb):
        assigned, cents = kmeans(emb, k=4, max_iter=2)
        assert assigned.count() == emb.count()
        assert assigned.filter((F.col("cluster") < 0) | (F.col("cluster") >= 4)).isEmpty()
        assert len(cents) == 4 and all(len(v) == 64 for v in cents.values())

    def test_deterministic_across_partitionings(self, spark, emb):
        a1, _ = kmeans(emb, k=4, max_iter=2)
        a2, _ = kmeans(emb.repartition(7), k=4, max_iter=2)
        j = a1.select("vec_id", "cluster").join(
            a2.select("vec_id", F.col("cluster").alias("c2")), "vec_id"
        )
        assert j.filter(F.col("cluster") != F.col("c2")).isEmpty()

    def test_lloyd_objective_decreases(self, spark, emb):
        """Each assign+update round must not increase inertia (up to the
        6dp centroid rounding)."""
        seed = emb.orderBy("vec_id").limit(4).select("embedding").collect()
        cents = {i: [round(float(x), 6) for x in r["embedding"]] for i, r in enumerate(seed)}
        a0 = assign_clusters(emb, cents)
        i0 = inertia(a0)
        c1 = update_centroids(a0, 64)
        i1 = inertia(assign_clusters(emb, c1))
        assert i1 <= i0 * (1 + 1e-9) + 1e-6

    def test_assignment_ties_break_low_cluster_id(self, spark, emb):
        """Duplicate centroids: every point prefers the lower cluster id."""
        row = emb.orderBy("vec_id").limit(1).collect()[0]
        c = [round(float(x), 6) for x in row["embedding"]]
        a = assign_clusters(emb, {0: c, 1: c})
        assert a.filter(F.col("cluster") == 1).isEmpty()

    def test_k_validation(self, spark, emb):
        with pytest.raises(ValueError):
            kmeans(emb, k=0)
