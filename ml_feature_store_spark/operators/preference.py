"""Preference aggregation: Bradley-Terry strengths from pairwise outcomes.

The RLHF data-pipeline operator: given billions of pairwise preference
records ("A beat B"), estimate a per-item strength so items can be ranked,
filtered, or weighted for reward-model training. The reference engine has
no preference operator; this is a Spark-first addition in the same spirit
as the pagerank/k-core family (bounded-iteration fixed-point math over a
compact model table).

Scale shape: the expensive part — collapsing raw comparisons into the
(item, opponent) win/match matrix — is the caller's one partial-agg
shuffle (suite_sim.q_bt1_preference_strengths builds it from lineitem in
one grouped aggregate). The MM iterations then run over the TINY directed
matrix (|items|^2 upper bound, typically thousands of rows): each round is
two broadcast joins against the |items|-row strength vector plus one
partial agg. Nothing in the loop scales with the raw comparison count.

Determinism: all arithmetic is int64 fixed-point (strengths in
``scale``-units, per-term precision ``precision``), so DuckDB replays the
identical floor divisions — no float summation order anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bradley_terry(
    matches: DataFrame,
    iterations: int = 3,
    scale: int = 1_000_000,
    precision: int = 10**12,
) -> DataFrame:
    """Bradley-Terry strengths via Hunter's MM updates, fixed-point int64.

    ``matches``: one row per unordered item pair — columns ``a``, ``b``
    (``a`` < ``b``), ``n`` (total comparisons, > 0), ``w`` (wins of ``a``,
    with ``0 < w < n``; callers should Laplace-smooth — ``n + 2`` /
    ``w + 1`` — so neither direction is ever zero, which both regularizes
    the estimate and keeps every strength strictly positive).

    Each iteration applies ``s_i <- W_i / sum_j(n_ij / (s_i + s_j))`` in
    ``scale``-unit integers (per-term floor division at ``precision``),
    then normalizes strengths to mean ``scale`` (BT is scale-invariant;
    normalization pins the fixed point and bounds the integer range).

    Returns ``(item, strength, wins, n_matches)`` — ``strength`` in
    ``scale``-units after ``iterations`` rounds.

    Overflow contract (all int64): requires ``max(n_ij) * precision``,
    ``sum(n) * scale``, and ``8 * n_items^2 * scale^2`` below 2^62 (plus
    ``n_items <= precision/scale``) — one bounded 3-scalar aggregate
    checks this up front (same budget class as pagerank's
    ``n_nodes * scale`` guard) and raises instead of silently wrapping.
    The ``n_items^2`` term bounds the normalizer's intermediate product
    ``s_raw * n_items * scale``: normalized strengths never exceed
    ``n_items * scale`` (each ``s_raw <= tot_raw``), which caps the
    next round's ``s_raw`` at ``~4 * n_items * scale`` including floor
    slop, so factor 8 leaves a 2x margin.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    pu = precision // scale
    directed = (
        matches.select("a", "b", "n", "w")
        .selectExpr("a AS item", "b AS opp", "n", "w")
        .unionByName(
            matches.selectExpr("b AS item", "a AS opp", "n", "(n - w) AS w")
        )
        .localCheckpoint(eager=True)  # the matrix is joined every round
    )
    bounds = directed.agg(
        F.max("n").alias("mx"),
        F.sum("n").alias("tot"),
        F.countDistinct("item").alias("cnt"),
    ).collect()[0]
    if bounds.mx is None:
        return directed.select("item").withColumn(
            "strength", F.lit(None).cast("long")
        ).withColumn("wins", F.lit(None).cast("long")).withColumn(
            "n_matches", F.lit(None).cast("long")
        )
    if (
        bounds.mx * precision >= 2**62
        or bounds.tot * scale >= 2**62
        or 8 * bounds.cnt * bounds.cnt * scale * scale >= 2**62
        or bounds.cnt > pu
    ):
        raise ValueError(
            f"max(n)={bounds.mx} / sum(n)={bounds.tot} / "
            f"n_items={bounds.cnt} risk int64 overflow at "
            f"precision={precision}, scale={scale}; reduce precision/scale "
            "or downsample comparisons (the normalizer's intermediate "
            "s_raw * n_items * scale grows as ~n_items^2 * scale^2)"
        )
    s = directed.select("item").distinct().withColumn(
        "s", F.lit(scale).cast("long")
    )
    out = None
    for _ in range(iterations):
        si = F.broadcast(s.selectExpr("item", "s AS s_i"))
        sj = F.broadcast(s.selectExpr("item AS opp", "s AS s_j"))
        d = (
            directed.join(si, "item")
            .join(sj, "opp")
            .groupBy("item")
            .agg(
                F.sum(F.expr(f"n * {precision} div (s_i + s_j)")).alias("d"),
                F.sum("w").cast("long").alias("wins"),
                F.sum("n").cast("long").alias("n_matches"),
            )
        )
        raw = d.selectExpr(
            "item",
            "wins",
            "n_matches",
            f"(wins * {scale}) div greatest(d div {pu}, 1) AS s_raw",
        )
        tot = raw.agg(
            F.sum("s_raw").alias("tot_raw"),
            F.count("*").cast("long").alias("cnt"),
        )
        # eager-checkpoint the |items|-row model table each round: the next
        # round references it THREE times (s_i side, s_j side, and through
        # the normalizer), so without truncation the lazy plan nests ~3x
        # per iteration — exponential analysis/recompute cost for a table
        # of a few dozen rows (measured 90s -> ~2s at sf0.01).
        out = (
            raw.crossJoin(F.broadcast(tot))
            .selectExpr(
                "item",
                "wins",
                "n_matches",
                f"greatest((s_raw * cnt * {scale}) div tot_raw, 1) AS strength",
            )
            .localCheckpoint(eager=True)
        )
        s = out.selectExpr("item", "strength AS s")
    return out.select("item", "strength", "wins", "n_matches")
