"""Deterministic dataset splitting & sampling for training pipelines.

The reference engine has no sampling surface at all (store.py is the whole
engine); a training-data pipeline at 100 TB needs reproducible train/test
splits, k-fold assignment and stratified downsampling that (a) never move
data — a split is a map-side predicate, not a shuffle — and (b) are stable
across runs, engines and cluster sizes.

Design: key-hash bucketing, NOT random sampling. ``rand(seed)`` is
partition-order dependent (a repartition changes the sample) and engine
private; instead every row's fate is a pure function of its key:

    u(key) = int(md5(key)[:15 hex], 16)      -- uniform in [0, 2^60)

Split/sample membership is an integer compare against
``floor(frac * 2^60)`` and fold id is ``u mod k`` — bit-identical in any
engine with md5 (the DuckDB oracle uses ``('0x'||substr(md5,1,15))::BIGINT``).
Properties that make this production-grade:

  * map-only: no shuffle, no state, works identically on a stream;
  * stable under backfill: adding rows never reassigns old rows;
  * leakage-safe grouping: hash the GROUP key (e.g. user_id) to keep all
    of an entity's rows in one side of the split.

At 100 TB each operator is a scan with a codegen predicate — the filter
pipelines into whatever reads the split next, and column pruning still
reaches parquet because the hash needs only the key column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TWO60 = 1 << 60  # md5 15-hex-char prefix is uniform in [0, 2^60)


def hash_uniform(key: Column | str) -> Column:
    """Deterministic uniform long in [0, 2^60) from a row key (md5 prefix).

    Stays inside whole-stage codegen (md5/substring/conv are JVM
    expressions). 60 bits so the value is exact in a signed 64-bit long.
    """
    c = F.col(key) if isinstance(key, str) else key
    return F.conv(F.substring(F.md5(c.cast("string").cast("binary")), 1, 15), 16, 10).cast(
        "long"
    )


def threshold(frac: float) -> int:
    """Integer cut for a fraction: u < threshold(frac) keeps ~frac of keys."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {frac}")
    return int(frac * _TWO60)


def with_split(
    df: DataFrame,
    key: str,
    train_frac: float = 0.8,
    split_col: str = "split",
) -> DataFrame:
    """Tag every row 'train' / 'test' by key hash. Map-only, reproducible,
    entity-safe when ``key`` is the entity id (all rows of one entity land
    on the same side — no train/serve leakage across the split)."""
    u = hash_uniform(key)
    return df.withColumn(
        split_col,
        F.when(u < F.lit(threshold(train_frac)), F.lit("train")).otherwise(F.lit("test")),
    )


def with_kfold(df: DataFrame, key: str, k: int, fold_col: str = "fold") -> DataFrame:
    """Assign a deterministic fold id in [0, k) per key. ``u mod k`` over a
    60-bit uniform has bias < k/2^60 — immaterial for any practical k."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return df.withColumn(fold_col, (hash_uniform(key) % F.lit(k)).cast("int"))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key: str,
    fractions: dict[str, float],
    default_frac: float = 0.0,
) -> DataFrame:
    """Keep a per-stratum deterministic fraction of rows (e.g. downsample
    the dominant language, keep all of the rare ones). The per-stratum
    threshold is folded into ONE codegen CASE predicate — a single filtered
    scan, no per-stratum passes, no shuffle; at 100 TB this is the only
    shape that works (sampleBy's random variant re-draws per run and per
    partitioning)."""
    u = hash_uniform(key)
    cut = F.lit(threshold(default_frac))
    # CASE stratum WHEN ... chain in stable (sorted) order
    case = None
    for stratum, frac in sorted(fractions.items()):
        t = F.lit(threshold(frac))
        case = (
            F.when(F.col(stratum_col) == stratum, t)
            if case is None
            else case.when(F.col(stratum_col) == stratum, t)
        )
    cut = case.otherwise(cut) if case is not None else cut
    return df.filter(u < cut)


def uniform_mixture_rates(df: DataFrame, domain_col: str) -> DataFrame:
    """Per-domain keep rates that downsample every domain to the smallest
    domain's size (uniform target mixture): keep_rate_e6 =
    min_count * 1e6 DIV count. One tiny partial-agg dim + a broadcast
    scalar — no collect; the integer ratio makes the rate table
    engine-portable."""
    counts = df.groupBy(domain_col).agg(F.count("*").alias("n_before"))
    mn = counts.agg(F.min("n_before").alias("mn"))
    return counts.crossJoin(F.broadcast(mn)).select(
        domain_col,
        "n_before",
        F.expr("mn * 1000000L div n_before").alias("keep_rate_e6"),
    )


def temperature_mixture_rates(
    df: DataFrame,
    domain_col: str,
    budget_num: int = 1,
    budget_den: int = 2,
) -> DataFrame:
    """Temperature-scaled mixture rates (alpha = 0.5, the multilingual-
    pretraining exponential-smoothing recipe): each domain's sampling
    weight is ``isqrt(count)`` — sub-linear in size, so head domains are
    downweighted and tail domains upweighted relative to proportional
    sampling — and a total budget of ``count_total * budget_num /
    budget_den`` rows is allocated across domains by weight, capped at
    each domain's actual size.

    Integer-exact and engine-portable: ``floor(sqrt(double))`` is
    deterministic everywhere (IEEE sqrt is correctly rounded; counts
    < 2^52 are exact in a double), and every ratio is BIGINT ``DIV``.
    Same plan shape as :func:`uniform_mixture_rates`: one tiny
    partial-agg dim + a broadcast scalar, no collect; at 100 TB the
    corpus itself is only touched by the ONE count scan and the map-side
    :func:`apply_mixture` filter."""
    counts = df.groupBy(domain_col).agg(F.count("*").alias("n_before"))
    w = counts.withColumn(
        "weight", F.floor(F.sqrt(F.col("n_before").cast("double"))).cast("long")
    )
    tot = w.agg(
        F.sum("n_before").alias("n_total"), F.sum("weight").alias("w_total")
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .withColumn(
            "target",
            F.least(
                F.col("n_before"),
                F.expr(
                    f"(n_total * {int(budget_num)}L div {int(budget_den)}L)"
                    " * weight div w_total"
                ),
            ),
        )
        .withColumn("keep_rate_e6", F.expr("target * 1000000L div n_before"))
        .select(domain_col, "n_before", "weight", "target", "keep_rate_e6")
    )


def apply_mixture(
    df: DataFrame, rates: DataFrame, domain_col: str, id_col: str
) -> DataFrame:
    """Filter ``df`` to its mixture subsample: a row keeps iff its
    portable md5 draw (of ``id_col``, in [0, 1e6)) falls under its
    domain's ``keep_rate_e6``. Map-side after a broadcast of the tiny
    rate dim — deterministic across engines, retries and partitionings,
    unlike ``df.sample``."""
    draw = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 1000000
    )
    return df.join(
        F.broadcast(rates.select(domain_col, "keep_rate_e6")), domain_col
    ).filter(draw < F.col("keep_rate_e6"))


def bottomk_sample(
    df: DataFrame,
    key_col: str,
    id_col: str,
    k: int,
    salt_buckets: int = 0,
) -> DataFrame:
    """Deterministic uniform k-sample WITHOUT replacement per key: keep
    the ``k`` rows with the smallest md5 draw of ``id_col`` (ties by id).
    Equivalent to a per-key reservoir sample but reproducible across
    engines, retries and partitionings, and MERGEABLE: bottom-k of a
    union is the bottom-k of the per-shard bottom-ks, so shards/streams
    can pre-sample locally and merge.

    ``salt_buckets > 0`` runs that merge explicitly as a two-phase plan —
    rank within (key, md5-salt bucket) first, then merge the per-bucket
    bottom-ks — bounding any single task to ~rows/salt_buckets even when
    one key holds most of the table (the a11 hot-key treatment; identical
    output, property-tested). Adds ``__draw__`` so callers can re-rank.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window as W

    draw = hash_uniform(id_col).alias("__draw__")
    base = df.withColumn("__draw__", draw)
    order = [F.col("__draw__").asc(), F.col(id_col).asc()]
    if salt_buckets > 0:
        salt = (F.col("__draw__") % salt_buckets).alias("__salt__")
        w1 = W.partitionBy(key_col, "__salt__").orderBy(*order)
        base = (
            base.withColumn("__salt__", salt)
            .withColumn("__r1__", F.row_number().over(w1))
            .filter(F.col("__r1__") <= k)
            .drop("__r1__", "__salt__")
        )
    w = W.partitionBy(key_col).orderBy(*order)
    return (
        base.withColumn("__rk__", F.row_number().over(w))
        .filter(F.col("__rk__") <= k)
        .withColumnRenamed("__rk__", "sample_rank")
    )


def weighted_priority_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    u_col: str = "u",
    priority_col: str = "priority",
) -> DataFrame:
    """Importance-weighted sampling without replacement via PRIORITY
    SAMPLING (Duffield, Lund & Thorup, JACM'07): each row draws
    u ~ Uniform(0,1] and gets priority q = w/u; the top-k rows by q are
    a weighted-without-replacement sample with near-optimal variance
    for subset-sum estimation — the importance-sampling primitive for
    corpus curation (sample long/high-quality documents preferentially,
    with principled estimator weights).

    Determinism and cross-engine parity: u comes from the md5
    ``hash_uniform`` family (+1 so u > 0), and q is computed as ONE
    IEEE-754 double division of operands that round IDENTICALLY on any
    IEEE engine (w * 2^60 may exceed 2^53 and round, but both engines
    round the same way; long->double casts and division are correctly
    rounded) — NO libm call anywhere, so any IEEE engine produces
    bit-identical priorities and the SAME top-k (ties broken by key).
    That is the difference from the textbook exp/log
    Efraimidis-Spirakis keys, whose libm results differ by ulps across
    engines and could flip marginal sample membership.

    CONTRACT: ``key_col`` must be UNIQUE per row. The draw u is a pure
    function of the key, so duplicate keys share one draw (correlated
    priorities) and the desc/key tie-break becomes nondeterministic
    among duplicates — the sampling guarantee only holds for unique
    keys. Callers with duplicate keys should salt the draw with a
    second distinguishing column first.

    Plan shape: map-only priority computation (codegen md5 + one
    division), then top-k — Spark plans TakeOrderedAndProject:
    per-partition heap of k, merge of #partitions*k candidates, NO
    global sort and no full shuffle, the same 100 TB shape as s1."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u = (hash_uniform(F.col(key_col)) + F.lit(1)).cast("long")
    withu = df.withColumn(u_col, u)
    q = (
        F.col(weight_col).cast("double")
        * F.lit(float(_TWO60))
        / F.col(u_col).cast("double")
    )
    return (
        withu.withColumn(priority_col, q)
        .orderBy(F.col(priority_col).desc(), F.col(key_col))
        .limit(k)
    )


def walk_forward_folds(
    df: DataFrame,
    ts_col: str,
    cuts: list,
    gap_seconds: float,
    test_seconds: float,
    fold_col: str = "fold",
    split_col: str = "split",
) -> DataFrame:
    """PURGED walk-forward cross-validation folds for time-ordered
    training data (the leakage-aware CV of financial ML / forecasting —
    de Prado's purged K-fold made walk-forward): for each cut ``c_i``,
    fold ``i`` trains on ``ts <= c_i`` and tests on
    ``(c_i + gap, c_i + gap + test_seconds]``. The GAP purges the
    boundary: a label computed from a trailing window at test time
    cannot overlap training rows (the same leakage class f39's embargo
    guards at feature-retrieval time, here at split time).

    Returns one row per (input row x fold it participates in) with
    ``fold`` and ``split`` ('train'/'test') columns — a row in neither
    window of a fold is dropped for that fold. Map-only: the fold specs
    explode from an inline array (O(k) literals), so assignment is a
    single codegen projection with NO shuffle and no per-fold job; at
    100 TB the k-fold expansion multiplies scan output, not scan count.
    Deterministic by construction (pure timestamp arithmetic).
    """
    if not cuts:
        raise ValueError("walk_forward_folds: cuts must list >= 1 cut")
    # A negative gap silently reintroduces the train/test overlap the
    # purge exists to prevent; a non-positive test window selects nothing
    # (or, negative, inverts the interval). Refuse both (round-9 ADVICE).
    if gap_seconds < 0:
        raise ValueError(
            f"walk_forward_folds: gap_seconds must be >= 0, got {gap_seconds!r}"
        )
    if test_seconds <= 0:
        raise ValueError(
            f"walk_forward_folds: test_seconds must be > 0, got {test_seconds!r}"
        )
    specs = F.array(
        *[
            F.struct(
                F.lit(i).alias("f"),
                F.lit(c).cast("timestamp").alias("cut"),
            )
            for i, c in enumerate(cuts)
        ]
    )
    # Intervals built arithmetically, not via f-string INTERVAL literals:
    # Python formats tiny floats in scientific notation (1e-05), which the
    # SQL parser rejects (round-9 ADVICE).
    gap = F.make_dt_interval(secs=F.lit(float(gap_seconds)))
    test = F.make_dt_interval(secs=F.lit(float(test_seconds)))
    e = df.withColumn("__spec__", F.explode(specs))
    cut = F.col("__spec__.cut")
    ts = F.col(ts_col)
    split = (
        F.when(ts <= cut, F.lit("train"))
        .when((ts > cut + gap) & (ts <= cut + gap + test), F.lit("test"))
        .otherwise(F.lit(None))
    )
    return (
        e.withColumn(fold_col, F.col("__spec__.f"))
        .withColumn(split_col, split)
        .filter(F.col(split_col).isNotNull())
        .drop("__spec__")
    )
