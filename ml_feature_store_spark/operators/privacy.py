"""Privacy / re-identification risk operators for training data.

The reference store has no privacy surface; a production training-data
platform needs one before shipping feature sets that contain
quasi-identifiers (the GDPR/HIPAA release gate). The classic measure is
k-ANONYMITY (Sweeney 2002): a row is re-identifiable when its
quasi-identifier (QI) combination is shared by fewer than ``k`` rows —
an attacker joining on the QI columns pins it to a group of < k people.

:func:`k_anonymity_report` computes the per-group sizes and risk flags
as ONE partial-aggregated groupBy over the QI columns — the same
O(groups)-after-map-side-combine shape as the drift reports; nothing
after the combine exceeds O(|QI combinations|) rows. The suppression
decision (drop/generalize the risky rows) is the caller's; this report
is the evidence. Composes with ``t7_pii_redact`` (direct identifiers)
— k-anonymity is about the columns redaction leaves behind.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame,
    qi_cols: Sequence[str],
    k: int = 5,
) -> DataFrame:
    """Per-quasi-identifier-group anonymity report: one row per distinct
    QI combination with ``n`` (group size) and ``at_risk`` (n < k).
    NULL QI values participate as their own bucket (a NULL combination
    is still a joinable combination). Deterministic, exact, one shuffle
    on the QI key."""
    if not qi_cols:
        raise ValueError("k_anonymity_report: qi_cols must name >= 1 column")
    if k < 2:
        raise ValueError(f"k_anonymity_report: k must be >= 2, got {k}")
    return df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).withColumn("at_risk", F.col("n") < k)


def k_anonymity_summary(
    df: DataFrame,
    qi_cols: Sequence[str],
    k: int = 5,
    by: str | None = None,
) -> DataFrame:
    """Release-gate summary, optionally per ``by`` partition column (which
    must be one of ``qi_cols``): total groups, risky groups, risky ROWS
    (what suppression would drop), and the suppression rate in ppm —
    integer-exact, so an external oracle can replay it bit-for-bit.
    Folds from the group report (O(groups) rows), no second data scan."""
    if by is not None and by not in qi_cols:
        # a non-QI partition column would either crash downstream or —
        # worse, if it happened to exist on df — silently group the
        # report by something the anonymity math never saw
        raise ValueError(
            f"k_anonymity_summary: by={by!r} must be one of qi_cols "
            f"{list(qi_cols)}."
        )
    groups = k_anonymity_report(df, qi_cols, k)
    keys = [by] if by else []
    risky_n = F.when(F.col("at_risk"), F.col("n")).otherwise(F.lit(0))
    out = groups.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.col("at_risk").cast("long")).cast("long").alias("n_risky_groups"),
        F.sum("n").cast("long").alias("n_rows"),
        F.sum(risky_n).cast("long").alias("n_risky_rows"),
    )
    # integer floor division keeps the rate BIGINT-exact (oracle parity —
    # a double divide then cast picks up ulps)
    return out.withColumn(
        "suppression_ppm",
        F.expr("CAST(n_risky_rows * 1000000 DIV n_rows AS BIGINT)"),
    )
