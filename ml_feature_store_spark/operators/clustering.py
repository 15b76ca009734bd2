"""Distributed k-means over embedding columns (Lloyd's iterations).

The iterative-algorithm class the rest of the suite doesn't cover: a
driver-side loop over a small model (k x dim centroids) with all data
passes distributed. Each iteration is

    assign:  argmin_c ||x - c||^2  — map-only over a BROADCAST model
             (k*dim doubles as literals — a few KB; no shuffle)
    update:  groupBy(cluster) over dim sum(element_at) aggregates + count
             — partial aggregation collapses each partition to k rows
             map-side; the shuffle moves k*(dim+1) values per partition
             and k rows reach the driver.

At 100 TB per iteration: one scan + one tiny shuffle; the model stays
driver-resident (k*dim doubles), exactly how spark.ml's KMeans schedules
it. Determinism: init = first k vectors by id (no RNG), and centroids
are rounded to 6dp between iterations so assignment never depends on
summation-order ulps — reruns and repartitions give identical clusters.

Distance evaluation builds a per-centroid SQL expression
(aggregate(zip_with(...))) folded through array_min over
struct(dist, cid) — higher-order functions are interpreted (not
codegen), fine for k*dim ~ a few hundred ops/row; the codegen-heavy
alternative (posexplode + broadcast join + partial agg, see simhash's
SWAR note) trades a shuffle for expression speed and wins only when
k*dim is large."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dist_expr(vec_col: str, centroid: list[float]) -> str:
    arr = "array(" + ",".join(f"{c}D" for c in centroid) + ")"
    return (
        f"aggregate(zip_with({vec_col}, {arr}, (x, c) -> (double(x) - c) * (double(x) - c)), "
        "0D, (acc, v) -> acc + v)"
    )


def assign_clusters(
    df: DataFrame, centroids: dict[int, list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Map-only nearest-centroid assignment: adds ``cluster`` (int) and
    ``dist2`` (squared distance). Ties break to the lowest cluster id
    (array_min on struct(dist, cid) — lexicographic)."""
    pairs = ", ".join(
        f"struct({_dist_expr(vec_col, c)} AS d, {cid} AS cid)"
        for cid, c in sorted(centroids.items())
    )
    best = F.expr(f"array_min(array({pairs}))")
    return df.withColumn("__best__", best).select(
        "*",
        F.col("__best__.cid").alias("cluster"),
        F.col("__best__.d").alias("dist2"),
    ).drop("__best__")


def update_centroids(
    assigned: DataFrame, dim: int, vec_col: str = "embedding"
) -> dict[int, list[float]]:
    """Per-cluster component means as dim codegen sum(element_at)
    aggregates + a count: partial aggregation collapses every partition
    to k rows map-side, so the shuffle moves k*(dim+1) values per
    partition — strictly cheaper than a posexplode (k*dim*|rows| shuffle
    rows) at any scale. Rounded 6dp for run-to-run determinism."""
    aggs = [F.count("*").alias("n")] + [
        F.sum(F.element_at(vec_col, i + 1).cast("double")).alias(f"s{i}") for i in range(dim)
    ]
    rows = assigned.groupBy("cluster").agg(*aggs).collect()
    return {
        r["cluster"]: [round(r[f"s{i}"] / r["n"], 6) for i in range(dim)] for r in rows
    }


def kmeans(
    df: DataFrame,
    k: int,
    max_iter: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, dict[int, list[float]]]:
    """Lloyd's algorithm; returns (assigned_df, centroids). Deterministic:
    init from the k lowest ids, 6dp-rounded centroid updates."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    seed_rows = df.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = {i: [round(float(x), 6) for x in r[vec_col]] for i, r in enumerate(seed_rows)}
    dim = len(next(iter(centroids.values())))
    spark = df.sparkSession
    # The fit loop's plans embed the centroid literals, so whole-stage
    # codegen would recompile a k*dim-sized generated class EVERY
    # iteration — pure Janino overhead that interpreted eval avoids
    # (spark.ml's KMeans likewise runs its iterations outside codegen).
    # The conf is restored before the final assignment plan is executed,
    # so the returned DataFrame — the thing that scans 100 TB — runs
    # fully codegen'd.
    prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try:
        assigned = assign_clusters(df, centroids, vec_col)
        for _ in range(max_iter):
            new = update_centroids(assigned, dim, vec_col)
            # empty clusters keep their previous centroid
            centroids = {cid: new.get(cid, c) for cid, c in centroids.items()}
            assigned = assign_clusters(df, centroids, vec_col)
    finally:
        spark.conf.set("spark.sql.codegen.wholeStage", prev)
    return assigned, centroids


def inertia(assigned: DataFrame) -> float:
    """Sum of squared distances to assigned centroids (the Lloyd objective)."""
    return assigned.agg(F.sum("dist2").alias("s")).collect()[0]["s"]


def _int_dist_expr(vec_col: str, centroid: list[int]) -> str:
    arr = "array(" + ",".join(f"{c}L" for c in centroid) + ")"
    return (
        f"aggregate(zip_with({vec_col}, {arr}, (x, c) -> (x - c) * (x - c)), "
        "0L, (acc, v) -> acc + v)"
    )


def quantize_vec(vec_col: str, grid: int) -> F.Column:
    """floor(x*grid + 0.5) per component as BIGINT — one double multiply +
    floor, deterministic IEEE on every engine."""
    return F.expr(
        f"transform({vec_col}, x -> CAST(floor(double(x) * {grid} + 0.5) AS BIGINT))"
    )


def assign_clusters_int(
    df: DataFrame, centroids: dict[int, list[int]], qvec_col: str = "__q__"
) -> DataFrame:
    """Integer nearest-centroid assignment (adds ``cluster``, ``dist2``
    as BIGINT). Same argmin tie-break as assign_clusters."""
    pairs = ", ".join(
        f"struct({_int_dist_expr(qvec_col, c)} AS d, {cid} AS cid)"
        for cid, c in sorted(centroids.items())
    )
    best = F.expr(f"array_min(array({pairs}))")
    return (
        df.withColumn("__best__", best)
        .select(
            "*",
            F.col("__best__.cid").alias("cluster"),
            F.col("__best__.d").alias("dist2"),
        )
        .drop("__best__")
    )


def kmeans_int(
    df: DataFrame,
    k: int,
    max_iter: int = 1,
    qvec_col: str = "__q__",
    id_col: str = "vec_id",
) -> dict[int, list[int]]:
    """Integer-Lloyd over vectors ALREADY on the integer grid (no
    quantize step) — the fit :func:`kmeans_quantized` runs after its own
    quantization, exposed for inputs that are integer by construction
    (IVF-PQ residuals: quantized vector minus integer coarse centroid —
    re-quantizing a residual/grid double round-trip is NOT exact, so the
    residual fit must stay in the integer domain end-to-end for the
    DuckDB oracle to replay it bit-for-bit). Same contract as
    kmeans_quantized: init = first k rows by ``id_col``, argmin ties to
    the lowest cluster id, update = floor(sum/n). Returns the centroid
    dict only (callers re-assign against the frozen model)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    seed_rows = df.orderBy(id_col).limit(k).select(qvec_col).collect()
    centroids = {
        i: [int(x) for x in r[qvec_col]] for i, r in enumerate(seed_rows)
    }
    dim = len(next(iter(centroids.values())))
    assigned = assign_clusters_int(df, centroids, qvec_col=qvec_col)
    for _ in range(max_iter):
        aggs = [F.count("*").alias("n")] + [
            F.sum(F.element_at(qvec_col, i + 1)).alias(f"s{i}")
            for i in range(dim)
        ]
        rows = assigned.groupBy("cluster").agg(*aggs).collect()
        new = {
            r["cluster"]: [
                int(math.floor(r[f"s{i}"] / r["n"])) for i in range(dim)
            ]
            for r in rows
        }
        centroids = {cid: new.get(cid, c) for cid, c in centroids.items()}
        assigned = assign_clusters_int(df, centroids, qvec_col=qvec_col)
    return centroids


def kmeans_quantized(
    df: DataFrame,
    k: int,
    max_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    grid: int = 10**6,
) -> tuple[DataFrame, dict[int, list[int]]]:
    """Lloyd's algorithm on an integer grid — EXACTLY reproducible on any
    engine, unlike float k-means whose centroid sums depend on reduction
    order (the reason plain x14 was rows-only).

    Components are quantized once to ``floor(x*grid + 0.5)`` longs; every
    distance is an integer sum (order-independent), and each centroid
    update is ``floor(sum / n)`` where the BIGINT->DOUBLE division is
    exact below 2^53. Same plan shape and cost as :func:`kmeans`:
    broadcast k*dim model, map-only assign, partial-agg update, k rows to
    the driver per iteration. The quantization error (1/grid per
    component) is far below the synthetic embeddings' cluster separation;
    on real data pick grid to taste.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    q = df.select(id_col, quantize_vec(vec_col, grid).alias("__q__"))
    seed_rows = q.orderBy(id_col).limit(k).collect()
    centroids = {i: [int(x) for x in r["__q__"]] for i, r in enumerate(seed_rows)}
    dim = len(next(iter(centroids.values())))
    assigned = assign_clusters_int(q, centroids)
    for _ in range(max_iter):
        aggs = [F.count("*").alias("n")] + [
            F.sum(F.element_at("__q__", i + 1)).alias(f"s{i}") for i in range(dim)
        ]
        rows = assigned.groupBy("cluster").agg(*aggs).collect()
        new = {
            r["cluster"]: [
                int(math.floor(r[f"s{i}"] / r["n"])) for i in range(dim)
            ]
            for r in rows
        }
        centroids = {cid: new.get(cid, c) for cid, c in centroids.items()}
        assigned = assign_clusters_int(q, centroids)
    return assigned, centroids
