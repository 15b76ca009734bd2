"""r12 optimization pins: the one-pass multi-subspace codebook fit
(`_pq_fit_books_int`, shared by pq_fit_codebooks / ivfpq_fit) must be
BIT-IDENTICAL to the m sequential per-subspace kmeans fits it replaced —
the DuckDB oracles replay the sequential recurrence relationally, so any
drift here is a correctness regression, not a perf trade."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def src(spark):
    from ml_feature_store_spark.suite import table

    emb = table(spark, SF, "embeddings")
    return emb.select(
        F.col("vec_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    ).cache()


def _sequential_pq_books(df, m, sub_dim, k_codes, iterations, grid=10**6):
    """The pre-r12 formulation: m independent kmeans_quantized fits over
    vector slices (kept here as the equivalence reference)."""
    from ml_feature_store_spark.operators.clustering import kmeans_quantized

    books = {}
    for s in range(m):
        sub = df.select(
            "vec_id",
            F.expr(f"slice(embedding, {s * sub_dim + 1}, {sub_dim})").alias(
                "embedding"
            ),
        )
        _, books[s] = kmeans_quantized(
            sub, k=k_codes, max_iter=iterations, id_col="vec_id", grid=grid
        )
    return books


def _sequential_ivfpq_books(df, centroids, m, sub_dim, k_codes, iterations):
    """The pre-r12 residual-fit formulation: m independent kmeans_int
    fits over residual slices."""
    from ml_feature_store_spark.operators.clustering import kmeans_int
    from ml_feature_store_spark.operators.similarity import ivfpq_residuals

    res = ivfpq_residuals(df, centroids)
    books = {}
    for s in range(m):
        sub = res.select(
            "vec_id",
            F.expr(f"slice(__rv__, {s * sub_dim + 1}, {sub_dim})").alias(
                "__q__"
            ),
        )
        books[s] = kmeans_int(
            sub, k=k_codes, max_iter=iterations, id_col="vec_id"
        )
    return books


class TestOnePassFitEquivalence:
    @pytest.mark.parametrize("iterations", [1, 2])
    def test_pq_fit_codebooks_equals_sequential(self, src, iterations):
        from ml_feature_store_spark.operators.similarity import (
            pq_fit_codebooks,
        )

        got = pq_fit_codebooks(
            src, m=4, sub_dim=16, k_codes=8, iterations=iterations
        )
        want = _sequential_pq_books(
            src, m=4, sub_dim=16, k_codes=8, iterations=iterations
        )
        assert got == want

    @pytest.mark.parametrize("iterations", [1, 2])
    def test_ivfpq_fit_books_equal_sequential(self, src, iterations):
        from ml_feature_store_spark.operators.similarity import (
            ivf_fit_int,
            ivfpq_fit,
        )

        cents, got = ivfpq_fit(
            src, n_cells=8, m=4, sub_dim=16, k_codes=8,
            iterations=iterations,
        )
        # coarse fit unchanged by the r12 rewrite
        assert cents == ivf_fit_int(src, n_cells=8, iterations=iterations)
        want = _sequential_ivfpq_books(
            src, cents, m=4, sub_dim=16, k_codes=8, iterations=iterations
        )
        assert got == want

    def test_uneven_subspace_count(self, src):
        """m=8/sub_dim=8 exercises slice offsets beyond the first
        subspace boundary."""
        from ml_feature_store_spark.operators.similarity import (
            pq_fit_codebooks,
        )

        got = pq_fit_codebooks(src, m=8, sub_dim=8, k_codes=4, iterations=1)
        want = _sequential_pq_books(
            src, m=8, sub_dim=8, k_codes=4, iterations=1
        )
        assert got == want
