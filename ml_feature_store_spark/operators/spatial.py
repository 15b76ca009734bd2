"""Grid-bucketed spatial joins on integer coordinates.

A radius join ("all points within R of each center") is the spatial
sibling of the band join (operators/band.py): the naive form is an
all-pairs crossJoin with a distance filter — quadratic and unusable at
scale — and the scalable form BUCKETS space so candidate pairs only form
between nearby cells.

Design, mirroring the band-join recipe:

  * Coordinates are INTEGERS (micro-degrees, metres, or a synthetic
    grid): the distance predicate ``dx*dx + dy*dy <= R*R`` is BIGINT
    arithmetic — exact, portable, no haversine floats in the hot path.
    (Geographic callers project to metres first; at city scale the
    equirectangular projection error is far below any dedup radius.)
  * Cell size = R. A point can only be within R of a center whose cell
    is one of the NINE cells around the point's own (Chebyshev bound:
    |dx| <= R implies cell distance <= 1). The small side (centers)
    expands 9x and BROADCASTS; the big side (points) computes its cell
    key map-side and joins WITHOUT ever shuffling — at 100 TB the
    points table is touched by one scan and one partial-agg rollup,
    exactly the decon1 broadcast-banlist shape.
  * Overflow: |dx|, |dy| <= R after the cell match, so dx*dx + dy*dy
    <= 2*R^2 — safe for any radius under ~2.1e9.

When BOTH sides are huge (no broadcastable center set), partition both
by cell and shuffle-join on the cell key instead — same candidate
bound, two exchanges; flip the ``broadcast_centers`` switch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import hash_uniform


def synth_grid_points(
    df: DataFrame, key_col: str, extent: int = 10_000, prefix: str = ""
) -> DataFrame:
    """Deterministic synthetic integer coordinates in [0, extent)^2 from a
    key's md5 draws — the testdata tables carry no geography, so spatial
    queries derive one reproducibly (two independent draws per key; the
    DuckDB oracle replays the identical md5 arithmetic)."""

    def draw(tag: str) -> Column:
        return hash_uniform(
            F.concat(F.lit(f"{prefix}{tag}:"), F.col(key_col).cast("string"))
        ) % extent

    return df.select(
        F.col(key_col),
        draw("x").cast("long").alias("x"),
        draw("y").cast("long").alias("y"),
    )


def radius_count_join(
    points: DataFrame,
    centers: DataFrame,
    radius: int,
    point_key: str,
    center_key: str,
    broadcast_centers: bool = True,
) -> DataFrame:
    """Count (and checksum) the points within ``radius`` (L2, inclusive)
    of each center. Both inputs need integer ``x``/``y`` columns.

    Returns one row per center: (center_key, n_within, sum_point_keys) —
    centers with no points in range report 0/0 via the left join (a
    radius report must cover EVERY center, not silently drop the empty
    ones). See the module docstring for the 9-cell broadcast design.
    """
    cell = int(radius)
    if cell <= 0:
        raise ValueError(f"radius must be positive, got {radius}")
    c9 = (
        centers.select(
            F.col(center_key),
            F.col("x").alias("cx"),
            F.col("y").alias("cy"),
        )
        .withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            center_key,
            "cx",
            "cy",
            # floor division, NOT `div`: `div` truncates toward zero,
            # which makes cell 0 span (-cell, cell) — double-wide. That
            # merges cells (never splits), so it cannot MISS a pair, but
            # it doubles the candidate load around the origin; floor
            # keeps every cell uniform. floor on a double quotient is
            # exact while |coord| < 2^52 — far above any projected
            # coordinate (micro-degrees ~1e9, metres ~1e7).
            (F.floor(F.col("cx") / F.lit(cell)).cast("long") + F.col("dx")).alias("gx"),
            (F.floor(F.col("cy") / F.lit(cell)).cast("long") + F.col("dy")).alias("gy"),
        )
    )
    if broadcast_centers:
        c9 = F.broadcast(c9)
    pts = points.select(
        F.col(point_key),
        F.col("x").alias("px"),
        F.col("y").alias("py"),
        F.floor(F.col("x") / F.lit(cell)).cast("long").alias("gx"),
        F.floor(F.col("y") / F.lit(cell)).cast("long").alias("gy"),
    )
    r2 = cell * cell
    hits = (
        pts.join(c9, ["gx", "gy"])
        .filter(
            (F.col("px") - F.col("cx")) * (F.col("px") - F.col("cx"))
            + (F.col("py") - F.col("cy")) * (F.col("py") - F.col("cy"))
            <= F.lit(r2)
        )
        .groupBy(center_key)
        .agg(
            F.count("*").alias("n_within"),
            F.sum(point_key).cast("long").alias("sum_point_keys"),
        )
    )
    return (
        centers.select(center_key)
        .join(hits, center_key, "left")
        .select(
            center_key,
            F.coalesce("n_within", F.lit(0)).cast("long").alias("n_within"),
            F.coalesce("sum_point_keys", F.lit(0)).cast("long").alias(
                "sum_point_keys"
            ),
        )
    )
