"""Vector math over ``array<float>`` / ``array<double>`` columns.

All expressions stay JVM-side using higher-order functions
(``zip_with`` / ``aggregate``) — no Python UDFs in the hot path, so
whole-stage codegen is preserved. Double-precision accumulation in list
order matches DuckDB's ``list_cosine_similarity`` bit-for-bit on the
synthetic data (verified by the oracle gate).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def normalize(a: Column) -> Column:
    """Unit-normalize; pre-normalizing embeddings at write time turns every
    query-time cosine into a plain dot product (the 100 TB trick: normalize
    once on ingest, never again)."""
    n = l2_norm(a)
    return F.transform(a, lambda x: x / n)


def quantize_int8(a: Column) -> Column:
    """Per-vector symmetric int8 quantization: q_i = floor(127 * x_i /
    max|x| + 0.5) as array<tinyint>. 4x smaller than float32 — at 100 TB
    the ANN index's storage and shuffle bytes, not FLOPs, are the
    bottleneck. floor(x + 0.5) rather than round(): both engines compute
    identical IEEE doubles, and floor of a double is implementation-
    identical, while round()'s half-way handling differs (Spark rounds
    the decimal repr HALF_UP, DuckDB the binary double). Scale factor
    recoverable via ``dequant_scale`` for re-scoring."""
    m = F.array_max(F.transform(a, lambda x: F.abs(x)))
    return F.when(m == 0.0, F.transform(a, lambda x: F.lit(0).cast("tinyint"))).otherwise(
        F.transform(
            a,
            lambda x: F.floor(x * F.lit(127.0) / m + F.lit(0.5)).cast("tinyint"),
        )
    )


def dequant_scale(a: Column) -> Column:
    """The per-vector scale s such that float ≈ int8 * s (max|x| / 127)."""
    return F.array_max(F.transform(a, lambda x: F.abs(x))) / F.lit(127.0)
