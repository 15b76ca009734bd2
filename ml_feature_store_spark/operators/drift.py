"""Feature-distribution drift monitoring.

The reference store has no monitoring surface at all (its whole API is the
seven methods in src/ml_feature_store/store.py) — but any production
feature platform needs one: the question "has the serving distribution
drifted from the training distribution?" is what decides when a model must
be retrained or a feature quarantined. These operators compute the two
standard drift reports as pure DataFrame aggregations:

* :func:`psi_numeric` — Population Stability Index over a numeric column,
  fixed-width bins anchored on the REFERENCE window's [min, max]. PSI is
  the industry-standard retraining trigger (>0.2 = major shift, >0.1 =
  investigate).
* :func:`categorical_drift` — per-category frequency comparison with L1
  terms; total-variation distance = sum(l1_term)/2.

Scale story (100 TB): both are two full-scan partial aggregations — one
over each window — reduced to O(n_bins) / O(n_categories) rows, then a
broadcast-joinable comparison of two tiny frames. No wide shuffle ever
carries more than (bins x partitions) rows after the map-side combine;
the reference-window stats (min/max/count) broadcast as a 1-row scalar
frame. Determinism: bucket assignment is integer/double arithmetic on the
anchored edges (no rand, no approx sketches), so the report is identical
across runs, partitionings and engines — the property the DuckDB oracle
checks bit-for-bit (after fixed rounding of the log terms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Laplace-style smoothing so empty bins never produce log(0)/division by
# zero; the SAME constant must appear in any oracle reimplementation.
EPS = 1e-6


def _bin_counts(
    df: DataFrame, col: str, n_bins: int, side: str
) -> DataFrame:
    """Per-bin row fractions of ``df[col]`` against REFERENCE-anchored
    edges supplied as ``__lo__`` / ``__hi__`` columns (already joined in).
    Values outside [lo, hi] clamp into the edge bins — the standard PSI
    convention (a drifted tail lands in bin 0 or n-1 and shows up as
    mass, instead of silently vanishing)."""
    width = (F.col("__hi__") - F.col("__lo__")) / F.lit(float(n_bins))
    raw = F.floor((F.col(col) - F.col("__lo__")) / width).cast("long")
    clamped = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))
    # constant reference column -> width 0 -> NULL raw; everything lands
    # in bin 0 (any current-window value off the constant still surfaces
    # as mass imbalance between the windows' totals-normalized fractions)
    bucket = F.when(width == 0, F.lit(0)).otherwise(clamped)
    counts = (
        df.filter(F.col(col).isNotNull())
        .withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(F.count("*").alias(f"__n_{side}__"))
    )
    return counts


def psi_numeric(
    reference: DataFrame,
    current: DataFrame,
    col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index report comparing ``current[col]``
    against ``reference[col]``.

    Returns one row per bin: ``bucket``, ``ref_frac``, ``cur_frac``,
    ``psi_term`` where ``psi_term = (ref_frac - cur_frac) *
    ln((ref_frac + EPS) / (cur_frac + EPS))``; ``sum(psi_term)`` is the
    PSI. Bins are ``n_bins`` equal-width intervals over the REFERENCE
    window's [min, max] (the training-time anchor — current-window
    outliers clamp into the edge bins). Bins with no mass in either
    window are omitted (their term is 0 by construction).

    Plan shape: one agg over reference for the anchor (broadcast 1-row),
    one partial-agg scan per window for bin counts, a full outer join of
    two <= n_bins-row frames. Totals fold from the bin frames themselves
    (an unpartitioned window over <= n_bins rows) — NO extra count job,
    no second scan of either window. Nothing after the map-side combine
    exceeds O(n_bins) rows.
    """
    edges = reference.agg(
        F.min(col).cast("double").alias("__lo__"),
        F.max(col).cast("double").alias("__hi__"),
    )
    ref = reference.crossJoin(F.broadcast(edges))
    cur = current.crossJoin(F.broadcast(edges))
    rc = _bin_counts(ref, col, n_bins, "ref")
    cc = _bin_counts(cur, col, n_bins, "cur")
    joined = _with_fractions(rc.join(cc, "bucket", "full_outer"), "bucket")
    term = (F.col("ref_frac") - F.col("cur_frac")) * F.log(
        (F.col("ref_frac") + F.lit(EPS)) / (F.col("cur_frac") + F.lit(EPS))
    )
    return joined.withColumn("psi_term", term)


def categorical_drift(
    reference: DataFrame,
    current: DataFrame,
    col: str,
) -> DataFrame:
    """Per-category frequency drift: one row per category value seen in
    EITHER window with ``ref_frac``, ``cur_frac`` and ``l1_term =
    |ref_frac - cur_frac|``. Total-variation distance between the two
    distributions is ``sum(l1_term) / 2``; the chi-square drift statistic
    is recoverable from the same frame. NULL categories participate as an
    explicit bucket (a feature going null-heavy IS drift).

    Two partial-agg scans reduced to O(categories) rows, one full outer
    join of the tiny frames — the same 100 TB shape as :func:`psi_numeric`.
    Totals fold from the category frame (window over O(categories) rows —
    fine up to ~millions of categories; beyond that pre-aggregate).
    """
    rc = reference.groupBy(F.col(col).alias("category")).agg(
        F.count("*").alias("__n_ref__")
    )
    cc = current.groupBy(F.col(col).alias("category")).agg(
        F.count("*").alias("__n_cur__")
    )
    joined = _with_fractions(rc.join(cc, "category", "full_outer"), "category")
    return joined.withColumn(
        "l1_term", F.abs(F.col("ref_frac") - F.col("cur_frac"))
    )


def woe_iv(
    df: DataFrame,
    category_col: str,
    label_col: str,
) -> DataFrame:
    """Weight-of-Evidence / Information-Value report for a categorical
    feature against a binary label — the standard credit-scoring /
    feature-selection encoding (WOE) and its drift-style importance
    score (IV: < 0.02 useless, > 0.3 strong). For each category ``c``:
    ``woe = ln((pos_frac_c + EPS) / (neg_frac_c + EPS))`` where
    ``pos_frac_c = n_pos_c / n_pos_total`` (ditto neg), and
    ``iv_term = (pos_frac_c - neg_frac_c) * woe`` — sum(iv_term) is the
    feature's IV. Same algebra family as :func:`psi_numeric` (PSI is IV
    between time windows; IV is PSI between label classes).

    ``label_col`` must be a boolean column. NULL categories participate
    as an explicit bucket (the reference treats missing as its own bin).

    Scale story (100 TB): ONE full scan reduced by partial aggregation
    to O(categories) rows (conditional sums per category), totals folded
    from the tiny frame by an unpartitioned window — strictly cheaper
    than the two-scan drift reports; nothing after the map-side combine
    exceeds O(categories) rows. No extra count jobs, no UDF.
    """
    pos = F.when(F.col(label_col), 1).otherwise(0)
    per = df.groupBy(F.col(category_col).alias("category")).agg(
        F.sum(pos).cast("long").alias("n_pos"),
        F.sum(1 - pos).cast("long").alias("n_neg"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy()
    tpos = F.sum("n_pos").over(w).cast("double")
    tneg = F.sum("n_neg").over(w).cast("double")
    # Degenerate label distribution (zero positives or zero negatives
    # overall) makes every fraction 0/0 — refuse instead of silently
    # propagating NaN (round-9 ADVICE). assert_true returns NULL when
    # the condition holds, so folding it into the denominators keeps
    # the guard LAZY (no extra driver-side count job); a degenerate
    # input fails the action with this message.
    guard = F.coalesce(
        F.assert_true(
            (tpos > 0) & (tneg > 0),
            F.lit(
                "woe_iv: degenerate label distribution — zero positive "
                "or zero negative rows overall, WOE/IV is undefined; "
                "check label_col."
            ),
        ).cast("double"),
        F.lit(0.0),
    )
    pf = F.col("n_pos") / (tpos + guard)
    nf = F.col("n_neg") / (tneg + guard)
    woe = F.log((pf + F.lit(EPS)) / (nf + F.lit(EPS)))
    return per.select(
        "category",
        "n_pos",
        "n_neg",
        pf.alias("pos_frac"),
        nf.alias("neg_frac"),
        woe.alias("woe"),
        ((pf - nf) * woe).alias("iv_term"),
    )


def cusum_changepoint(
    df: DataFrame,
    group_col: str,
    step_col: str,
    value_col: str,
) -> DataFrame:
    """CUSUM changepoint LOCALIZATION per group — the drift family's
    "WHEN did it shift" complement to psi/categorical "DID it shift":
    for each group's ordered series ``(step, value)``, the cumulative
    sum of deviations from the group mean, ``S_t = sum_{i<=t}
    (v_i - mean)``, peaks in magnitude AT the changepoint (Page 1954;
    the mean-shift form used by retrain-trigger monitors). Returns one
    row per group: the argmax step, the peak |S| and its sign
    (direction of the shift), and n_steps.

    EXACT cross-engine arithmetic: ``value_col`` must already be integer
    (quantize upstream — the suite lane uses cents); the mean is kept as
    the exact rational sum/n by working on ``n * S_t = n*cumsum - t*sum``
    (BIGINT throughout, no division until never) — so the argmax, peak
    and sign are bit-identical on any engine and safe below 2^63 for
    n*|sum| (n = steps per group, small by construction: the series is
    already aggregated to one value per step).

    Plan shape: one window shuffle on the group key (cumsum + argmax
    frames share the sort), O(groups) output. At 100 TB the input is a
    per-(group, step) rollup (h1's shape) — this op never scans raw
    events."""
    from pyspark.sql import Window

    vt = dict(df.dtypes).get(value_col)
    if vt not in ("tinyint", "smallint", "int", "bigint"):
        # float input would make the argmax depend on summation-order
        # ulps (the exactness contract breaks silently) — refuse and
        # point at the quantization the suite lane applies
        raise ValueError(
            f"cusum_changepoint: value_col '{value_col}' must be an "
            f"integer type (got {vt}) — quantize upstream (e.g. cents "
            f"via floor(value * 100 + 0.5))."
        )

    w = Window.partitionBy(group_col)
    wo = w.orderBy(step_col).rowsBetween(Window.unboundedPreceding, 0)
    t = F.row_number().over(w.orderBy(step_col))
    # n * S_t = n * cumsum_t - t * total  (all BIGINT, division-free)
    scaled = (
        F.count(F.lit(1)).over(w) * F.sum(value_col).over(wo)
        - t * F.sum(value_col).over(w)
    )
    scored = df.select(
        F.col(group_col),
        F.col(step_col),
        scaled.cast("long").alias("__ns__"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_steps"),
    )
    best = F.struct(
        F.abs(F.col("__ns__")).alias("mag"),
        (-F.col(step_col)).alias("negstep"),
        F.col(step_col).alias("step"),
        F.col("__ns__").alias("ns"),
    )
    # argmax on (|nS|, earliest step) — the struct max orders by
    # magnitude then LOWEST step (negstep inverts the tie-break)
    return scored.groupBy(group_col).agg(
        F.max(best).getField("step").alias("changepoint_step"),
        F.max(best).getField("mag").alias("peak_ns_abs"),
        F.signum(F.max(best).getField("ns")).cast("long").alias("shift_sign"),
        F.first("n_steps").alias("n_steps"),
    )


def _with_fractions(joined: DataFrame, key: str) -> DataFrame:
    """ref_frac/cur_frac from the joined per-key count frame: window
    totals over the (tiny, post-combine) frame instead of separate
    count() jobs — keeps the whole report ONE job with no re-scan."""
    from pyspark.sql import Window

    w = Window.partitionBy()
    n_ref = F.sum(F.coalesce(F.col("__n_ref__"), F.lit(0))).over(w)
    n_cur = F.sum(F.coalesce(F.col("__n_cur__"), F.lit(0))).over(w)
    return joined.select(
        key,
        (
            F.coalesce(F.col("__n_ref__"), F.lit(0)) / n_ref.cast("double")
        ).alias("ref_frac"),
        (
            F.coalesce(F.col("__n_cur__"), F.lit(0)) / n_cur.cast("double")
        ).alias("cur_frac"),
    )
