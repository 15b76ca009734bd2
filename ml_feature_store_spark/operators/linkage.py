"""Blocked fuzzy record linkage (entity resolution).

Matches dirty records to a clean reference by edit distance WITHIN
BLOCKS — the standard two-stage shape: a cheap blocking key (exact-match
attribute, phonetic code, or LSH bucket) bounds the candidate set, then
the expensive string metric runs only inside blocks, and an argmin picks
the best candidate per dirty record. Same scale law as the blocked
near-dup join (dedup.py): work is sum(|dirty block| x |clean block|),
never |dirty| x |clean|.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fuzzy_match_blocked(
    dirty: DataFrame,
    clean: DataFrame,
    block_cols: Sequence[str],
    name_col: str,
    id_col: str,
    max_distance: int = 2,
    dirty_id_col: str | None = None,
) -> DataFrame:
    """Best clean match per dirty record: levenshtein <= ``max_distance``
    within equal ``block_cols``, ties broken by (distance, clean id).
    ``dirty_id_col`` names the dirty side's unique id when it differs
    from the clean side's ``id_col``.

    Output: every dirty column + ``matched_<id_col>``, ``match_<name_col>``,
    ``distance``. Dirty records with no candidate inside the distance
    bound are dropped (inner semantics — union a left-anti for the
    unmatched stream if needed).

    The join is an equi join on the block key with the distance bound as
    a residual — hash/sort partitioned, broadcastable when the clean side
    is a dimension. The per-dirty-record argmin is a window rank over the
    (small) candidate set, partitioned by the dirty id — no global sort.
    """
    d = dirty.select(
        *[F.col(c).alias(f"__d_{c}") for c in dirty.columns]
    )
    c = clean.select(
        *[F.col(col).alias(f"__c_{col}") for col in [*block_cols, name_col, id_col]]
    )
    cond = None
    for b in block_cols:
        eq = F.col(f"__d_{b}") == F.col(f"__c_{b}")
        cond = eq if cond is None else (cond & eq)
    dist = F.levenshtein(F.col(f"__d_{name_col}"), F.col(f"__c_{name_col}"))
    joined = (
        d.join(c, cond)
        .withColumn("distance", dist)
        .filter(F.col("distance") <= max_distance)
    )
    w = Window.partitionBy(f"__d_{dirty_id_col or id_col}").orderBy(
        "distance", F.col(f"__c_{id_col}")
    )
    best = joined.withColumn("__rk__", F.row_number().over(w)).filter(
        F.col("__rk__") == 1
    )
    return best.select(
        *[F.col(f"__d_{col}").alias(col) for col in dirty.columns],
        F.col(f"__c_{id_col}").alias(f"matched_{id_col}"),
        F.col(f"__c_{name_col}").alias(f"match_{name_col}"),
        "distance",
    )
