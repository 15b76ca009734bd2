"""Iterative graph analytics on DataFrames: deterministic PageRank.

Companion to the connected-components fixpoint (operators/dedup.py:346):
where CC answers "which docs form one dedup cluster", PageRank answers
"which node matters most" — e.g. ranking sources/domains in a link graph
before corpus sampling, a standard curation signal.

Determinism contract: ranks are SCALED INTEGERS (``scale`` = 1e12) and
every per-edge contribution is an integer floor-division ``rank div
out_degree``.  Sums of longs are order-independent, so the result is
bit-identical across engines, partitionings and retries — unlike float
accumulation, whose low bits depend on reduction order.  The damping
step ``base + floor(damping * sum)`` multiplies an exact integer (< 2^53)
by a double literal; IEEE rounding makes that reproducible everywhere.

Scale design: the edge list is the big side; the rank vector is one row
per node.  With ``broadcast_ranks=True`` (default) the per-iteration
join ships the rank vector to the edges map-side, so the edge list is
NEVER shuffled — the only exchange per iteration is the aggregate on
dst.  Set it False when the node set itself outgrows broadcast range
(billions of nodes): the join then shuffles edges on src, the classic
two-exchange vertex-centric iteration.  ``iterations`` is a small
constant (PageRank converges geometrically; rank ordering stabilizes
after a handful of rounds).  localCheckpoint truncates the iterative
lineage each round, the same pattern as connected_components.
Dangling nodes (no out-edges) simply do not distribute — the simplified
formulation without dangling-mass redistribution, stated in the output
contract.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    scale: int = 10**12,
    broadcast_ranks: bool = True,
) -> DataFrame:
    """Integer-arithmetic PageRank over a directed edge list.

    Returns one row per node: ``(node, r)`` with ``r`` the scaled-integer
    rank after ``iterations`` rounds from a uniform ``scale`` start.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    base = int(math.floor((1 - damping) * scale))
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("r"))
    for it in range(iterations):
        r_side = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = (
            ed.join(r_side, ed.src == r_side["node"])
            .select("dst", F.expr("r div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        c_side = F.broadcast(contrib) if broadcast_ranks else contrib
        ranks = nodes.join(c_side, nodes.node == c_side["dst"], "left").select(
            "node",
            (
                F.lit(base)
                + F.floor(F.lit(damping) * F.coalesce(F.col("s"), F.lit(0)))
            )
            .cast("long")
            .alias("r"),
        )
        # Truncate iterative lineage BETWEEN iterations; the final result
        # stays a lazy one-iteration plan (inspectable, one less
        # materialization).
        if it < iterations - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
