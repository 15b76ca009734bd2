"""Explicit skew mitigation for shuffle joins: deterministic salting.

AQE's skew-join split handles most hot keys at runtime, but it only
splits the FACT side of a sort-merge join — when one key's rows must
still meet one copy of the dim row, a single straggler task remains the
bound. Salting removes it structurally: replicate each dim row across
``n_salts`` synthetic sub-keys and scatter the fact rows among them with
a deterministic hash of a per-row column, so a key carrying 50% of the
fact spreads over ``n_salts`` tasks. The cost is dim × n_salts rows
through the dim-side shuffle — the standard trade (cheap when the dim is
per-key bounded, e.g. one row per entity).

Companions: ``union_bucketed`` (as-of joins), ``sessionize_bucketed``,
``count_distinct_salted`` — this module covers the plain equi-join case.
Determinism contract: the salt is md5-derived from a caller-named fact
column (never ``rand()``), so retries and different partitionings
produce identical assignments and the result is exactly the unsalted
join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import hash_uniform

SALT_COL = "__salt__"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    salt_by: str | Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi join ``fact ⋈ dim`` on ``on``, shuffled on ``(on, salt)``.

    ``salt_by`` must be a fact column (or Column) that varies WITHIN a
    join key — a row id, event id, timestamp — so a hot key's rows
    spread across all ``n_salts`` sub-partitions. The dim side is
    replicated ``n_salts``× with a literal salt array + explode
    (map-only; no shuffle added beyond the join's own exchange).

    Semantically identical to ``fact.join(dim, on, how)`` for inner and
    left joins: every fact row meets exactly the one dim replica that
    carries its salt. Right/full joins are refused — each dim row
    appears ``n_salts`` times, so unmatched dim rows would duplicate.
    A NULL ``salt_by`` value hashes to NULL, which as part of the join
    key would silently drop the row even when its join key matches — so
    the salt is coalesced to bucket 0 (a NULL-salt row still joins; it
    just doesn't spread).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if n_salts < 2:
        raise ValueError(f"n_salts must be >= 2, got {n_salts}")
    keys = [on] if isinstance(on, str) else list(on)
    salt = (F.coalesce(hash_uniform(salt_by), F.lit(0)) % n_salts).cast("int")
    dim_x = dim.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    fact_x = fact.withColumn(SALT_COL, salt)
    return fact_x.join(dim_x, keys + [SALT_COL], how).drop(SALT_COL)
