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
