"""Feature-encoding operators for training pipelines.

The reference engine stores features but offers no encoders (store.py is
the whole engine); a feature platform at 100 TB needs the two workhorse
categorical encoders, built so that they are (a) leakage-safe and (b)
deterministic across engines, partitionings and runs:

* ``target_encode_loo`` — leave-one-out target (mean) encoding. Naive
  target encoding leaks the row's own label into its feature; the LOO
  form subtracts the row's own contribution: ``(sum - own) / (count-1)``.
  Exactness strategy: the target is quantized to integer units (cents)
  BEFORE aggregation so the group sums are order-independent BIGINTs,
  and the encoded value is emitted as an integer-scaled ratio
  (``floor((sum-own)*10^4 / (cnt-1))``) — bit-identical in any engine,
  no float summation anywhere. Plan shape: one partial-agg shuffle on
  the (tiny) category key to build the stats dim, then a BROADCAST join
  back — the fact table is never shuffled, the encode is map-side.

* ``feature_hash`` — the hashing trick (Weinberger et al., ICML'09):
  project arbitrary-cardinality categoricals into a fixed ``n_buckets``
  signed vector. Bucket and sign are pure functions of md5 of
  ``"<col>=<value>"`` (same portable family as sampling.hash_uniform),
  so the vector is reproducible in any engine and stable under backfill.
  Entirely map-only — no shuffle, no vocabulary build, no state — which
  is the whole point of the trick at 100 TB: new category values need
  no coordination.

Overflow bounds (documented, checked by tests): target_encode_loo needs
``sum(|target|*scale) * ratio_scale < 2^63`` per category — with cents
(scale=100) and ratio_scale=10^4 that allows ~9.2e12 total target units
per category, i.e. ~$92B per category group; raise to a two-level
aggregate if a category can exceed it.

Reference parity: none — extension operator (SURVEY.md §2.4 family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import hash_uniform

_RATIO_SCALE = 10_000  # 4 implied decimal places in the encoded ratio


def target_encode_loo(
    df: DataFrame,
    category_col: str,
    target_col: str,
    *,
    target_scale: int = 100,
    out_col: str = "te_loo_e4",
) -> DataFrame:
    """Leave-one-out target encoding, integer-exact.

    Adds ``out_col`` = floor((cat_sum - own) * 10^4 / (cat_count - 1))
    in integer target units (``target_scale`` units per 1.0 of the
    target; 100 = cents), plus ``cat_count``. Rows in singleton
    categories (count==1) get NULL — there is no leave-one-out mean to
    speak of, and emitting the global mean silently would hide the
    cold-start case the consumer must handle.

    Plan: groupBy(category) partial-aggregates map-side into a dim of
    |categories| rows, broadcast back onto the fact. The fact table is
    never shuffled.
    """
    units = F.round(F.col(target_col) * target_scale).cast("long")
    with_units = df.withColumn("__t_units__", units)
    stats = with_units.groupBy(category_col).agg(
        F.sum("__t_units__").alias("__cat_sum__"),
        F.count("*").alias("cat_count"),
    )
    joined = with_units.join(F.broadcast(stats), category_col)
    # Integer DIV, not float '/': the numerator can exceed 2^53 at scale
    # (where doubles drop low bits); BIGINT division is exact at any size.
    loo = F.when(
        F.col("cat_count") > 1,
        F.expr(
            f"(__cat_sum__ - __t_units__) * {_RATIO_SCALE}L DIV (cat_count - 1)"
        ),
    )
    return joined.withColumn(out_col, loo).drop("__t_units__", "__cat_sum__")


def feature_hash(
    df: DataFrame,
    cols: list[str],
    *,
    n_buckets: int = 16,
    out_col: str = "fhash",
) -> DataFrame:
    """Hashing-trick projection of categorical columns into a fixed
    signed integer vector of length ``n_buckets``.

    For each feature column f with value v, ``u = hash_uniform(f"=v")``;
    bucket ``u % n_buckets`` receives sign ``+1`` if bit 59 of u is 0
    else ``-1`` (a bit independent of the low modulus bits). The output
    vector element b is the sum of signs of features landing in b —
    exactly the sparse random projection the hashing trick defines,
    collision-tolerant by construction.

    Map-only: every element is a codegen-resident CASE chain; no
    vocabulary, no shuffle, no UDF. NULL feature values contribute
    nothing (skip, not a "NULL" category — hash_uniform of NULL is NULL
    and the CASE falls through to 0).
    """
    if not cols:
        raise ValueError("feature_hash: need at least one feature column")
    if n_buckets < 1:
        raise ValueError(f"feature_hash: n_buckets must be >= 1, got {n_buckets}")
    per_feat = [
        (hash_uniform(F.concat(F.lit(c + "="), F.col(c).cast("string"))),)
        for c in cols
    ]
    elems = []
    for b in range(n_buckets):
        contrib = [
            F.when(
                u % n_buckets == b,
                F.when(F.shiftright(u, 59) % 2 == 0, 1).otherwise(-1),
            ).otherwise(0)
            for (u,) in per_feat
        ]
        total = contrib[0]
        for c in contrib[1:]:
            total = total + c
        elems.append(total.cast("long"))
    return df.withColumn(out_col, F.array(*elems))


def importance_score(
    df: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """DSIR-style hashed importance score: per-doc mean of per-token
    integer likelihood ratios between the TARGET slice (rows where
    ``is_target``) and the full corpus, over ``n_buckets`` md5 hash
    buckets with add-1 smoothing. Staged BIGINT division keeps every
    intermediate < 1e15 (overflow-safe at any corpus size) and
    engine-portable; see suite q_x24 for the plan notes (weight dim
    broadcast, corpus never shuffled)."""
    toks = df.select(
        id_col, is_target.cast("long").alias("__t__"),
        F.explode(F.split(text_col, " ")).alias("__tok__"),
    ).filter(F.length("__tok__") > 0)
    b = toks.withColumn(
        "__b__",
        F.conv(F.substring(F.md5("__tok__"), 1, 15), 16, 10).cast("long")
        % n_buckets,
    )
    dim = b.groupBy("__b__").agg(
        F.count("*").alias("n_src"), F.sum("__t__").alias("n_tgt")
    )
    tot = dim.agg(F.sum("n_src").alias("s_tot"), F.sum("n_tgt").alias("t_tot"))
    weights = dim.crossJoin(F.broadcast(tot)).select(
        "__b__",
        F.expr(
            f"((n_tgt + 1) * 1000000000L div (t_tot + {n_buckets})) * 1000000L "
            f"div ((n_src + 1) * 1000000000L div (s_tot + {n_buckets}))"
        ).alias("w_e6"),
    )
    return (
        b.join(F.broadcast(weights), "__b__")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.expr("sum(w_e6) div count(*)").alias("dsir_e6"),
        )
    )


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    top_v: int = 256,
    pattern: str = "[A-Za-z0-9]+",
) -> DataFrame:
    """Frequency-ranked token vocabulary — the StringIndexer/tokenizer-
    vocab fit step. Returns ``(token, cnt, token_id)`` for the ``top_v``
    most frequent lowercased tokens, ids ``0..top_v-1`` assigned by
    ``(count DESC, token ASC)`` so the mapping is deterministic under any
    partitioning (ties cannot reorder ids).

    Scale shape: token counts are one explode + partial-agg groupBy (the
    shuffle carries one row per DISTINCT token, not per occurrence);
    top_v selection is a TakeOrderedAndProject; the id-assigning window
    runs over at most ``top_v`` rows on one partition — bounded by the
    vocab size knob, never by corpus size."""
    from pyspark.sql import Window

    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(pattern), F.lit(0))
    counts = (
        df.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(top_v)
    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    return top.withColumn("token_id", (F.row_number().over(w) - 1).cast("long"))


def encode_tokens(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    oov_id: int | None = None,
    pattern: str = "[A-Za-z0-9]+",
) -> DataFrame:
    """Apply a ``build_vocab`` mapping corpus-wide: one output row per
    token position ``(id, pos, token_id)`` with 1-based ``pos`` and
    out-of-vocabulary tokens mapped to ``oov_id`` (default: vocab size,
    i.e. one past the largest real id — the conventional UNK slot).

    Scale shape: explode is map-only; the id lookup is a broadcast left
    join against the (bounded, ``top_v``-row) vocab — the corpus is never
    shuffled. Rows with zero tokens produce no output (callers wanting
    0-token manifests left-join this back to the source, as
    fe3_vocab_encode does)."""
    if oov_id is None:
        # Materialize the (bounded, top_v-row) vocab ONCE before counting:
        # a bare vocab.count() would eagerly re-execute the whole
        # build_vocab plan (a corpus-wide token count) just to fetch the
        # UNK id, and the plan would run a second time for the broadcast
        # join below. After the checkpoint, both read the tiny result.
        vocab = vocab.localCheckpoint(eager=True)
        oov_id = vocab.count()
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(pattern), F.lit(0))
    pos = df.select(
        F.col(id_col), F.posexplode(toks).alias("pos0", "token")
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "token")
    return pos.join(
        F.broadcast(vocab.select("token", "token_id")), "token", "left"
    ).select(
        id_col,
        "pos",
        F.coalesce(F.col("token_id"), F.lit(oov_id).cast("long")).alias("token_id"),
    )


def quantile_binning(
    df: DataFrame,
    value_col: str,
    n_bins: int = 10,
    out_col: str = "bin",
) -> DataFrame:
    """Equal-frequency discretization (the QuantileDiscretizer /
    Bucketizer transform): assign each row the index of its quantile
    bin, 0..n_bins-1 — the standard continuous->categorical encoder
    before crossing, hashing, or monotonic-binning WOE pipelines.

    Determinism strategy (the fe-family contract): the value is
    quantized to integer CENTS before anything else, the n_bins-1
    interior boundaries come from one exact ``percentile`` aggregate
    over those integers, each boundary is rounded to an integer, and
    the bin id is ``#boundaries < value`` via a higher-order filter
    over the broadcast boundary array — all-integer comparisons, so
    any engine that interpolates percentiles the same way (DuckDB
    quantile_cont does; pinned by a7) bins every row identically.

    Plan shape at 100 TB: ONE aggregate produces a single n_bins-1
    element array (scalar dim), the assignment is a broadcast
    crossJoin + map-side codegen expression — the fact table is never
    shuffled, there is no per-row UDF, and no second pass. At extreme
    scale swap the exact percentile for ``percentile_approx`` (same
    one-agg shape, mergeable GK sketch — the a7 vs a14 tradeoff,
    documented rather than silently chosen)."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    fracs = ", ".join(str(k / n_bins) for k in range(1, n_bins))
    bounds = df.select(cents.alias("__c__")).agg(
        F.expr(f"percentile(__c__, array({fracs}))").alias("__bounds__")
    )
    withb = df.withColumn("__c__", cents).crossJoin(F.broadcast(bounds))
    rounded = F.transform(
        F.col("__bounds__"), lambda b: F.round(b, 0).cast("long")
    )
    return withb.withColumn(
        out_col,
        # NULL input stays NULL: without the guard the filter predicate
        # is NULL per boundary, size() returns 0, and missing data would
        # silently land in the lowest bin
        F.when(
            F.col("__c__").isNotNull(),
            F.size(F.filter(rounded, lambda b: b < F.col("__c__"))).cast("long"),
        ),
    ).drop("__c__", "__bounds__")


def impute_median(
    df: DataFrame,
    value_col: str,
    group_col: str,
    cents_col: str = "cents",
    out_col: str = "cents_imputed",
) -> DataFrame:
    """Missing-value imputation with the per-group median — the
    workhorse numeric imputer (median over mean: robust to the heavy
    tails real telemetry has). NULLs in ``value_col`` are filled with
    the median of the non-null values in the row's ``group_col`` group.

    fe-family determinism contract: values are quantized to integer
    cents first, the group median comes from one exact ``percentile``
    aggregate over those integers (interpolation parity with DuckDB
    quantile_cont pinned by a7), and the filled column is the integer
    ``coalesce(cents, median_cents)`` — no float arithmetic survives
    into the output. At extreme scale the exact percentile swaps for
    ``percentile_approx`` (a7-vs-a14 tradeoff, documented).

    Plan shape: one partial-agg shuffle on the (small) group key builds
    the median dim; the dim BROADCASTS back; the fill is a map-side
    coalesce — the fact table is never shuffled, mirroring
    ``target_encode_loo``."""
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    withc = df.withColumn(cents_col, cents)
    med = (
        withc.filter(F.col(cents_col).isNotNull())
        .groupBy(group_col)
        .agg(
            F.floor(F.expr(f"percentile({cents_col}, 0.5)") + F.lit(0.5))
            .cast("long")
            .alias("__med__")
        )
    )
    return (
        withc.join(F.broadcast(med), group_col, "left")
        .withColumn(out_col, F.coalesce(F.col(cents_col), F.col("__med__")))
        .withColumnRenamed("__med__", "median_cents")
    )
