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


class TestQuantizedKMeans:
    def test_partition_invariant_and_matches_python_replay(self, spark):
        """Integer Lloyd must be bit-identical across partitionings AND
        equal to a driver-side pure-Python replay of the recurrence."""
        import math

        from ml_feature_store_spark.operators.clustering import kmeans_quantized

        rows = [
            (i, [float(((i * 37 + j * 11) % 100) - 50) / 25.0 for j in range(8)])
            for i in range(60)
        ]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        out1 = sorted(
            (r.vec_id, r.cluster, r.dist2)
            for r in kmeans_quantized(df, k=3, max_iter=2, grid=10**6)[0].collect()
        )
        out2 = sorted(
            (r.vec_id, r.cluster, r.dist2)
            for r in kmeans_quantized(
                df.repartition(13), k=3, max_iter=2, grid=10**6
            )[0].collect()
        )
        assert out1 == out2

        # pure-Python replay
        grid = 10**6
        q = {i: [int(math.floor(x * grid + 0.5)) for x in v] for i, v in rows}
        cent = {c: list(q[c]) for c in range(3)}

        def assign(cent):
            a = {}
            for i, v in q.items():
                best = min(
                    (sum((x - c) * (x - c) for x, c in zip(v, cv)), cid)
                    for cid, cv in cent.items()
                )
                a[i] = best
            return a

        a = assign(cent)
        for _ in range(2):
            sums = {}
            for i, (d, cid) in a.items():
                s = sums.setdefault(cid, [0] * 8 + [0])
                for j, x in enumerate(q[i]):
                    s[j] += x
                s[8] += 1
            cent = {
                cid: [int(math.floor(s[j] / s[8])) for j in range(8)]
                if cid in sums
                else cv
                for cid, cv in cent.items()
                for s in [sums.get(cid, [0] * 9)]
            }
            a = assign(cent)
        want = sorted((i, cid, d) for i, (d, cid) in a.items())
        assert out1 == want
