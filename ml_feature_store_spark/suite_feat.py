"""Training-data assembly lane: sampling/splits, feature encoding, sequence packing, mixtures, labeling, UDTFs (split from suite_text.py in round 7; see suite.py for assembly and SURVEY.md §2 for the inventory)."""
from __future__ import annotations

import math  # noqa: F401
import tempfile  # noqa: F401

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from .operators.asof import asof_join  # noqa: F401
from .operators.pit import (  # noqa: F401
    entity_filter,
    latest_per_entity,
    temporal_filter,
    top_k_per_group,
)
from .suite_common import *  # noqa: F401,F403


def q_x18_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for recommender training: each
    (customer, part) purchase positive spawns k=3 candidate negatives
    drawn from the part id space by a portable md5 hash (rand()-free:
    retries, partitionings and engines all sample the SAME negatives),
    then collisions with ANY true positive of that customer are
    anti-joined away. Map-only candidate generation + one anti-join on
    (customer, part) — at 100 TB both sides shuffle once on the pair
    key. Output pins the sampled set per customer via order-independent
    integer sums."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pos = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
        .distinct()
    )
    maxp = table(spark, sf_dir, "part").agg(F.max("p_partkey").alias("maxp"))
    cand = (
        pos.crossJoin(F.broadcast(maxp))
        .select(
            "cust",
            "part",
            "maxp",
            F.explode(F.array(*[F.lit(i) for i in (1, 2, 3)])).alias("i"),
        )
        .select(
            "cust",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("-", "cust", "part", "i")), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("maxp")
                + 1
            ).alias("neg_part"),
        )
    )
    negs = cand.join(
        pos.select("cust", F.col("part").alias("neg_part")), ["cust", "neg_part"], "left_anti"
    )
    return negs.groupBy("cust").agg(
        F.count("*").alias("n_neg"),
        F.sum("neg_part").alias("sum_neg_parts"),
        F.countDistinct("neg_part").alias("n_distinct_neg"),
    )

def q_x12_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/20 train-test split + 5-fold assignment over
    documents, by doc_id md5-hash bucketing (operators/sampling.py). A
    map-only codegen predicate — reproducible across runs, engines and
    partitionings, unlike rand(seed). Output: per (split, fold) counts
    and length stats, which pin every row's assignment."""
    from .operators.sampling import with_kfold, with_split

    docs = table(spark, sf_dir, "documents")
    tagged = with_kfold(with_split(docs, "doc_id", 0.8), "doc_id", 5)
    return tagged.groupBy("split", "fold").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )

def q_x13_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling: keep 25% of dominant 'en',
    60% of 'es'/'de', all of the rest — the class-rebalancing pass of a
    training corpus, as ONE filtered scan (per-stratum thresholds folded
    into a single CASE predicate, no shuffle, no per-stratum jobs)."""
    from .operators.sampling import stratified_sample

    docs = table(spark, sf_dir, "documents")
    out = stratified_sample(
        docs, "lang", "doc_id", {"en": 0.25, "es": 0.6, "de": 0.6}, default_frac=1.0
    )
    return out.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
    )

def q_pack1_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-style sequence packing (concat-and-chunk): docs are packed in
    doc_id order into 2048-token bins via an EXCLUSIVE prefix sum —
    bin = floor(tokens_before / budget) — the standard 'concatenate the
    corpus, cut at the context length' shape. Packing is per shard
    (pmod(doc_id, 8)): each shard's running sum is an independent
    window partition, so the job parallelizes as shards x executors
    with no global sort — exactly how a 100 TB corpus is packed in
    practice (global greedy packing would serialize; per-shard is the
    accepted approximation)."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        F.pmod(F.col("doc_id"), F.lit(8)).cast("long").alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    binned = docs.withColumn(
        "bin",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(2048)),
    )
    return binned.groupBy("shard", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )

def q_shuf1_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + sharding for training: permute the
    corpus by md5(doc_id) — a reproducible pseudo-random order, invariant
    to engine, partitioning and retries, unlike rand() — deal docs into 8
    shards by a hash prefix (map-only), and emit per-shard manifests.
    The manifest pins the PERMUTATION itself with two order-independent
    checksums: sums of 31-bit md5 terms over (pos, doc_id) pairs —
    partial-agg sums, no collect_list, and bounded terms mean no long
    overflow until ~2^32 rows per shard (raw moments like
    sum(pos^2*doc_id) overflow at 8x replicated ids — caught by
    tools/scale_smoke.py). At 100 TB the in-shard ordering is a
    range-partitioned sort on the hash (the standard shuffle-before-
    training terasort); shard count just scales up."""
    docs = table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    tagged = docs.select(
        "doc_id",
        h.alias("h"),
        (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % 8).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    pos = tagged.withColumn("pos", F.row_number().over(w))
    ph = F.md5(F.concat_ws(",", F.col("pos"), F.col("doc_id")))
    term1 = F.conv(F.substring(ph, 1, 8), 16, 10).cast("long") % F.lit(1 << 31)
    term2 = F.conv(F.substring(ph, 9, 8), 16, 10).cast("long") % F.lit(1 << 31)
    return pos.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum(term1).alias("perm_s1"),
        F.sum(term2).alias("perm_s2"),
    )

def q_fe1_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of o_orderpriority by o_totalprice
    (operators/encoding.py target_encode_loo) — the leakage-safe mean
    encoder every tabular training pipeline needs. Integer-exact: target
    quantized to cents before aggregation (order-independent BIGINT
    sums), encode emitted as a 4-implied-decimal integer ratio via
    BIGINT DIV. Plan: tiny category dim built with one partial-agg
    shuffle, broadcast back; the fact table is never shuffled. The
    reference has no encoder surface at all (store.py is storage only) —
    §2.4 extension family."""
    from .operators.encoding import target_encode_loo

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    out = target_encode_loo(o, "o_orderpriority", "o_totalprice")
    return out.select("o_orderkey", "o_orderpriority", "cat_count", "te_loo_e4")

def q_fe2_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick projection (operators/encoding.py feature_hash) of
    (event_type, props) into a signed 16-bucket vector. Bucket and sign
    are md5-derived (sampling.py portable family), so the DuckDB oracle
    rebuilds every element with the same expressions. Map-only: no
    vocabulary build, no shuffle — the property that makes the trick the
    right categorical encoder at 100 TB. The 16-element vector is
    emitted CSV-serialized (driver's pandas canonicalizer cannot hash
    raw array<> cells)."""
    from .operators.encoding import feature_hash

    ev = table(spark, sf_dir, "events").select("event_id", "event_type", "props")
    out = feature_hash(ev, ["event_type", "props"], n_buckets=16)
    # cast-to-array<string> + array_join, NOT transform(cast)+concat_ws:
    # the transform lambda re-inlines the 16-expression array per element
    # (16x recompute — measured 3.2s vs 0.86s at sf0.1).
    return out.select(
        "event_id",
        F.array_join(F.col("fhash").cast("array<string>"), ",").alias("fhash"),
    )

def q_mix1_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture rebalancing — downsample every language domain to the
    smallest domain's size (uniform target mixture), the step a pretraining
    run does before interleaving corpora. Per-domain keep rates are
    integer micro-unit ratios (min_count*1e6 DIV count) computed from ONE
    tiny partial-agg dim and broadcast back (q15's scalar-broadcast
    recipe — no collect); each doc keeps iff its portable md5 draw
    (x12/x18's rand()-free family) falls under its domain's rate, so the
    subsample is deterministic across engines, retries and partitionings.
    Output is the mixture manifest: before/rate/after per domain. At
    100 TB the fact table is filtered map-side in one scan — the only
    shuffles are the two tiny count aggregations."""
    from .operators.sampling import apply_mixture, uniform_mixture_rates

    docs = table(spark, sf_dir, "documents")
    rates = uniform_mixture_rates(docs, "lang")
    kept = (
        apply_mixture(docs, rates, "lang", "doc_id")
        .groupBy("lang")
        .agg(F.count("*").alias("n_after"))
    )
    return rates.join(kept, "lang", "left").select(
        "lang",
        "n_before",
        "keep_rate_e6",
        F.coalesce("n_after", F.lit(0)).alias("n_after"),
    )

def q_x24_importance_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style hashed importance scoring for domain-targeted data
    selection: score every document by how much its hashed-unigram
    distribution looks like a TARGET domain (lang='en') vs the full
    corpus. Per-bucket probabilities (add-1 smoothed, 64 md5 buckets —
    fe2's hashing-trick family) become integer ratios via staged BIGINT
    division: p_e9 per distribution, then w_e6 = p_tgt*1e6 DIV p_src —
    each stage bounded (< 1e15), so no overflow at ANY corpus size, and
    both engines replay identical operations (cross-engine determinism is
    the contract; DSIR's log-space weights are a driver-side artifact at
    deployment, this is the linear-space in-engine variant). Plan: ONE
    token scan builds the 64-row source+target count dim (map-side
    partial agg), totals via tiny crossJoin broadcasts, weights broadcast
    back onto the token stream — the corpus is never shuffled; per-doc
    score is one partial-agg sum. Top-20 via TakeOrderedAndProject."""
    from .operators.encoding import importance_score

    docs = table(spark, sf_dir, "documents")
    perdoc = importance_score(docs, F.col("lang") == "en")
    return perdoc.orderBy(F.col("dsir_e6").desc(), "doc_id").limit(20)

def q_pack2_rank_pairing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-balanced sequence packing by RANK PAIRING — pack1's
    concat-and-chunk sibling for pipelines that must keep documents
    whole: within each md5 shard, rank docs by token count desc and pair
    rank i with rank n+1-i (longest with shortest), so every 2-doc bin's
    total is balanced around the shard mean — the classic sorted
    pairing bound on padding waste, and unlike first-fit-decreasing it
    is embarrassingly parallel. Sharding first (shuf1's md5 family) is
    the scale move: ranking runs per shard (bounded task), not as one
    global sort, and the expectation of the waste bound is unchanged.
    Output: one row per bin with both doc ids + total tokens. Odd
    shard sizes leave the middle rank as a singleton bin (id_short
    NULL)."""
    docs = table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("long")
            % 4
        ).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy(F.col("n_tokens").desc(), "doc_id")
    wc = Window.partitionBy("shard")
    ranked = t.select(
        "shard",
        "doc_id",
        "n_tokens",
        F.row_number().over(w).alias("r"),
        F.count("*").over(wc).alias("n"),
    ).withColumn(
        "bin",
        F.when(F.col("r") * 2 <= F.col("n") + 1, F.col("r")).otherwise(
            F.col("n") + 1 - F.col("r")
        ),
    )
    return ranked.groupBy("shard", "bin").agg(
        F.count("*").alias("n_docs"),
        F.min_by("doc_id", "r").alias("id_long"),
        F.when(F.count("*") == 2, F.max_by("doc_id", "r")).alias("id_short"),
        F.sum("n_tokens").alias("tokens_total"),
    )

def q_fe3_vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary indexing — the StringIndexer / tokenizer-vocab step of
    every classic text pipeline: fit the top-256 token vocabulary (ids by
    count DESC, token ASC — tie-proof), then encode the whole corpus to
    ids with OOV mapped to id 256 (operators/encoding.py build_vocab /
    encode_tokens). Output is the per-doc encoding manifest: token and
    OOV counts, integer OOV rate, and an order-DEPENDENT positional
    checksum sum(pos * (id+1)) that pins the exact id SEQUENCE (terms
    <= 257 * n_tokens keep the BIGINT sum exact to ~2^44 tokens/doc).
    Zero-token docs are retained with zeroed stats via a left join back
    to the corpus. Scale shape: the count shuffle carries one row per
    DISTINCT token; the id-assign window touches <= 256 rows; encode is
    map-only against the broadcast vocab — the corpus is never
    shuffled."""
    from .operators.encoding import build_vocab, encode_tokens

    docs = table(spark, sf_dir, "documents")
    vocab = build_vocab(docs, "text", top_v=256)
    enc = encode_tokens(docs, vocab, "doc_id", "text", oov_id=256)
    agg = enc.groupBy("doc_id").agg(
        F.count("*").alias("nt"),
        F.sum(F.when(F.col("token_id") == 256, 1).otherwise(0)).alias("no"),
        F.sum(F.col("pos") * (F.col("token_id") + 1)).alias("sc"),
    )
    return docs.join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("nt", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce("no", F.lit(0)).cast("long").alias("n_oov"),
        F.coalesce(F.expr("no * 10000L div nt"), F.lit(0)).cast("long").alias("oov_e4"),
        F.coalesce("sc", F.lit(0)).cast("long").alias("seq_check"),
    )

def q_fe4_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust-scaling profile per event type — the outlier-
    insensitive cousin of mean/std normalization (and of dq2's IQR
    fences): median via exact interpolated percentile (a7's
    Spark==DuckDB parity), MAD as the median of absolute deviations
    from it, and the count of |x - med| > 3 * 1.4826 * MAD (the normal-
    consistent 3-sigma equivalent). Two grouped-percentile passes with
    the per-type scalars BROADCAST back onto the fact — the fact is
    never shuffled for the deviation or outlier steps; rates are
    integer e4. At 100 TB both percentile passes swap to
    percentile_approx (a14's contract) without changing the plan
    shape."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(cents, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("cents") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(dev, 0.5)").alias("mad")
    )
    out = dev.join(F.broadcast(mad), "event_type")
    return out.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.round(F.first("med"), 4).alias("med_cents"),
        F.round(F.first("mad"), 4).alias("mad_cents"),
        F.sum(
            F.when(F.col("dev") > F.lit(4.4478) * F.col("mad"), 1).otherwise(0)
        ).cast("long").alias("n_outliers"),
        F.expr(
            "sum(CASE WHEN dev > 4.4478 * mad THEN 1 ELSE 0 END) * 10000L div count(*)"
        ).cast("long").alias("outlier_e4"),
    )

def q_mix2_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled data mixture (alpha = 0.5) — mix1's sibling for
    the OTHER standard pretraining recipe: instead of flattening every
    domain to the smallest (uniform target), domains are sampled
    proportionally to sqrt(count), the exponential-smoothing mixture
    multilingual runs use so head domains shrink and tail domains keep
    most of their data, under a half-corpus total budget. All-integer
    (operators/sampling.py temperature_mixture_rates: isqrt weights,
    BIGINT DIV allocation, md5-draw membership), so the manifest and the
    subsample replay bit-identically on any engine. Same 100 TB shape as
    mix1: two tiny count aggs + a broadcast rate dim; the corpus is
    filtered map-side in one scan, never shuffled. Mixes over `source`
    (mix1 mixes over `lang`) — the two queries together witness both
    mixture axes a curation pipeline balances."""
    from .operators.sampling import apply_mixture, temperature_mixture_rates

    docs = table(spark, sf_dir, "documents")
    rates = temperature_mixture_rates(docs, "source")
    kept = (
        apply_mixture(docs, rates, "source", "doc_id")
        .groupBy("source")
        .agg(F.count("*").alias("n_after"))
    )
    return rates.join(kept, "source", "left").select(
        "source",
        "n_before",
        "weight",
        "target",
        "keep_rate_e6",
        F.coalesce("n_after", F.lit(0)).alias("n_after"),
    )

def q_lm1_bigram_doc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style LM fluency filter (operators/text.py
    bigram_lm_doc_score): every document scored under an add-one-smoothed
    bigram model trained on the corpus itself — the KenLM-filter step a
    pretraining pipeline runs to drop disfluent text, made integer-exact
    (summed scaled conditional probabilities instead of float log-probs)
    so the DuckDB oracle replays it bit-for-bit. One tokenize feeds the
    unigram/bigram/vocab count tables and the per-doc bigram stream; the
    count joins are the only shuffles and carry collapsed (gram, count)
    keys. Top-20 most-fluent docs by mean transition probability."""
    from .operators.text import bigram_lm_doc_score

    docs = table(spark, sf_dir, "documents")
    out = bigram_lm_doc_score(docs)
    return out.orderBy(F.col("lm_avg_e6").desc(), "doc_id").limit(20)

def q_fe7_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency decile binning of order value
    (operators/encoding.py quantile_binning — the QuantileDiscretizer
    transform): one exact-percentile aggregate yields the 9 interior
    boundaries as a scalar array, the boundary dim broadcasts, and the
    bin id is an all-integer map-side codegen expression (#boundaries <
    cents) — the fact table is never shuffled. Witness output is the
    per-bin row count and cents accounting (min/max/sum), which pins
    every row's bin assignment; ~n/10 per bin up to boundary ties.
    DuckDB replays boundaries with quantile_cont (interpolation parity
    pinned by a7) and the same integer comparison."""
    from .operators.encoding import quantile_binning

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    out = quantile_binning(o, "o_totalprice", n_bins=10)
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return (
        out.withColumn("cents", cents)
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
            F.sum("cents").alias("sum_cents"),
        )
    )

def q_x29_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted corpus sampling (operators/sampling.py
    weighted_priority_sample — Duffield-Lund-Thorup priority sampling):
    top-100 documents by priority w/u with w = n_chars, i.e. longer
    documents proportionally likelier, sampled WITHOUT replacement with
    principled estimator weights. Membership is bit-deterministic
    cross-engine because the priority is one IEEE double division of
    exact integers (md5-derived u, no libm) — the reason this query can
    have a value-hash oracle at all. Plan: map-only priorities +
    TakeOrderedAndProject top-k (per-partition heaps, no global sort).
    Output pins the full sample: id, domain, weight and the draw."""
    from .operators.sampling import weighted_priority_sample

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    out = weighted_priority_sample(docs, "doc_id", "n_chars", k=100)
    return out.select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("w"), "u"
    )

def q_fe8_impute_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-value imputation (operators/encoding.py impute_median):
    a seventh of the event values are deliberately NULLed (event_id % 7
    — the synthetic tables carry no NULLs, same probe technique as
    x28's corrupt lane) and refilled with the per-event-type median,
    cents-exact. The witness accounting separates observed from imputed
    mass per group and carries the median itself, so a drifted
    percentile or a broadcast-join miss cannot hide. Median dim
    broadcasts; the event stream is never shuffled before the final
    rollup."""
    from .operators.encoding import impute_median

    ev = table(spark, sf_dir, "events").withColumn(
        "value",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(
            F.col("value")
        ),
    )
    out = impute_median(ev, "value", "event_type")
    return out.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.when(F.col("cents").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_imputed"),
        F.sum("cents_imputed").cast("long").alias("sum_cents"),
        F.min("median_cents").cast("long").alias("med_cents"),
    )

def q_udtf1_token_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF surface via mapInArrow (operators/text.py token_runs): each
    document expands into one row per run of consecutive equal tokens —
    a sequential, data-dependent-arity generator that posexplode (t6)
    cannot express, i.e. the true lateral-view table-function shape. The
    Arrow kernel is map-only; the rollup that follows runs JVM-side:
    per-doc run count, token total (must rebuild the doc length —
    lossless expansion), longest run and its token (tie-break: earliest
    start). The oracle rebuilds runs relationally: gaps-and-islands over
    generate_subscripts order (lag != token marks starts, running sum
    numbers the islands)."""
    from .operators.text import token_runs

    docs = table(spark, sf_dir, "documents")
    runs = token_runs(docs, id_col="doc_id", text_col="text")
    best = F.max(
        F.struct(
            F.col("run_len"), (-F.col("run_start")).alias("neg_start"), F.col("token")
        )
    )
    return (
        runs.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_runs"),
            F.sum("run_len").cast("long").alias("n_tokens"),
            best.getField("run_len").cast("long").alias("max_run"),
            best.getField("token").alias("max_run_token"),
        )
        .filter(F.col("max_run") >= 2)
    )

def q_fe6_global_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global row numbering at scale (operators/util.py
    global_row_number): the contiguous 1..N ids a training pipeline
    needs for shard addressing and example bookkeeping. The naive
    row_number() OVER (ORDER BY ...) plans a single-partition window —
    the canonical scale-killer — so the operator does the two-pass
    range-partition + per-partition-offset substitute (one range
    shuffle + a #partitions-row offset agg, JVM-only ids). Output is
    provably identical to the window form because o_orderkey is unique;
    the oracle IS that window form. Emitted as a per-1000-bucket
    checksum so the witness pins every id (sum + min + max per bucket)
    without shipping 15k raw rows through the hash gate."""
    from .operators.util import global_row_number

    o = table(spark, sf_dir, "orders").select("o_orderkey")
    out = global_row_number(o, "o_orderkey", out_col="row_no")
    return (
        out.groupBy((F.col("row_no") % 1000).alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("row_no") * F.col("o_orderkey")).cast("long").alias("dot"),
            F.min("o_orderkey").cast("long").alias("min_key"),
            F.max("o_orderkey").cast("long").alias("max_key"),
        )
    )

def q_udtf2_session_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-based Python UDTF with a TABLE argument (operators/
    sessionize.py register_session_gaps_udtf): SQL invokes
    ``session_gaps(TABLE(v) PARTITION BY user_id ORDER BY us)`` and
    Catalyst plans the shuffle + per-partition ordering, streaming each
    user's rows through a fresh stateful Python instance that emits on
    terminate() — the OTHER udtf surface after udtf1's mapInArrow
    generator (per-row lateral expansion there; per-GROUP stateful fold
    here, the applyInPandas alternative for row-at-a-time state
    machines). Gap stats are deliberately window-expressible so the
    oracle's lag() twin proves the exotic path computes exactly what the
    declarative path would — and its tie-insensitivity (equal-ts gaps
    are 0; count/max see values, not orders) makes the witness
    replay-stable."""
    from .operators.sessionize import register_session_gaps_udtf

    name = register_session_gaps_udtf(spark)
    table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us")
    ).createOrReplaceTempView("udtf2_ev")
    return spark.sql(
        f"SELECT * FROM {name}(TABLE(udtf2_ev) PARTITION BY user_id ORDER BY us)"
    )

def q_lab1_majority_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annotation aggregation — majority vote with agreement rate, the
    label-consolidation step of every human-feedback pipeline (multiple
    noisy labels per item -> one training label + a confidence signal;
    low-agreement items get routed back to annotators). Items are users,
    votes are their events' types. Two window passes over ONE
    user-keyed shuffle (count rank + vote total share the partition);
    ties break deterministically (higher count, then lexicographic
    label). agreement_e4 is integer basis points — floor-div replayed
    identically by the oracle, no float ratios."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type")
    votes = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), F.col("event_type").asc()
    )
    tot = Window.partitionBy("user_id")
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .withColumn("n_votes", F.sum("n").over(tot))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("majority_label"),
            F.col("n").cast("long").alias("n_majority"),
            F.col("n_votes").cast("long").alias("n_votes"),
            F.expr("(n * 10000) div n_votes").alias("agreement_e4"),
        )
    )


def q_fe9_woe_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-Evidence / Information-Value encoding (operators/
    drift.py ``woe_iv``) — the credit-scoring categorical encoder and
    the standard feature-selection score, over order priority vs the
    binary "order fulfilled" label (o_orderstatus = 'F'). ONE full scan
    partial-aggs to O(categories) conditional counts; totals fold from
    the tiny frame by an unpartitioned window (no extra count jobs);
    ln terms pinned at nano fixed-point exactly like drift1's PSI. At
    100 TB this is the cheapest shape a label-conditioned encoder can
    have: one map-side combine, one O(categories) exchange."""
    from .operators.drift import woe_iv

    o = table(spark, sf_dir, "orders").select(
        "o_orderpriority", (F.col("o_orderstatus") == "F").alias("filled")
    )
    rep = woe_iv(o, "o_orderpriority", "filled")
    return rep.select(
        "category",
        "n_pos",
        "n_neg",
        F.floor(F.col("woe") * 1e9 + F.lit(0.5)).cast("long").alias("woe_nano"),
        F.floor(F.col("iv_term") * 1e9 + F.lit(0.5))
        .cast("long")
        .alias("iv_nano"),
    )


def q_cv1_purged_walkforward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purged walk-forward CV folds (operators/sampling.py
    walk_forward_folds) — the leakage-aware split protocol for
    time-ordered training data: three cuts, each fold training on
    everything up to its cut and testing on a 3-day window that starts
    only after a 1-day PURGE gap (trailing-window labels at test time
    cannot overlap training rows — f39's embargo discipline applied at
    split time). Assignment is one map-only codegen projection (fold
    specs explode from an O(k) literal array, no shuffle, no per-fold
    jobs); the report pins every row's (fold, split) membership via
    counts, cents sums and user checksums per cell."""
    from .operators.sampling import walk_forward_folds

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    folds = walk_forward_folds(
        ev,
        "ts",
        ["2024-01-08", "2024-01-12", "2024-01-16"],
        gap_seconds=86400,
        test_seconds=3 * 86400,
    )
    return folds.groupBy("fold", "split").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("sum_cents"),
        F.sum("user_id").cast("long").alias("sum_users"),
    )


_CLS1_FEATS = ["x0", "x1", "x2", "x3"]


def _probe_features(df: DataFrame) -> DataFrame:
    """Append the integer, CENTERED probe features x0-x3 computed from
    ``text`` alone (see operators/classifier.py for why centering is
    load-bearing): bias, token count - 54, distinct-token count - 23,
    short-token count - 2. Pure projection — batch and streaming frames
    take the identical expressions (the sd21 stream == batch
    contract)."""
    toks = F.split(F.col("text"), " ")
    return (
        df.withColumn("x0", F.lit(1).cast("long"))
        .withColumn("x1", (F.size(toks) - 54).cast("long"))
        .withColumn(
            "x2", (F.size(F.array_distinct(toks)) - 23).cast("long")
        )
        .withColumn(
            "x3",
            (
                F.size(F.filter(toks, lambda t: F.length(t) <= 2)) - 2
            ).cast("long"),
        )
    )


def _cls1_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x0-x3 over documents plus the 'expensive labeler' stand-in
    label y = n_chars > 300."""
    docs = table(spark, sf_dir, "documents")
    return _probe_features(docs).select(
        "doc_id",
        (F.col("n_chars") > 300).cast("int").alias("y"),
        *_CLS1_FEATS,
    )


def q_cls1_linear_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-probe corpus filter (operators/classifier.py): train a
    hard-sigmoid logistic probe with 3 full-batch GD iterations on
    integer fixed-point arithmetic (driver-resident int64 weights, one
    partial-agg shuffle per iteration), then score the corpus map-only
    — the DCLM/fastText quality-filter shape, with the x14/kmeans
    determinism discipline so the weight FIXPOINT itself is
    oracle-exact (DuckDB replays the unrolled iterations). Output: the
    confusion matrix of probe vs labeler plus the learned weights
    (0.99 train accuracy at sf0.01). The training frame is cached:
    GD re-reads it once per iteration — the same persist decision every
    iterative fit makes."""
    from .operators.classifier import probe_score, probe_train

    feat = _cls1_features(spark, sf_dir).cache()
    w = probe_train(feat, _CLS1_FEATS, "y", iterations=3, lr_den=100)
    scored = probe_score(feat, w, _CLS1_FEATS)
    out = scored.groupBy("y", "pred").agg(F.count("*").cast("long").alias("n"))
    return out.select(
        "y",
        "pred",
        "n",
        *[F.lit(int(w[j])).cast("long").alias(f"w{j}") for j in range(4)],
    )


def q_cls2_stored_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-filter model as a REGISTRY artifact (round-12;
    store.create_probe / score_with_probe): the probe trains once on
    the labeled half (even doc_ids) and persists IN the registry —
    feature exprs stored verbatim, int64 weights, provenance
    (src version/rows, train accuracy) pinned; any process then scores
    any frame holding the raw columns with the frozen weights as plan
    literals (map-only). This lane scores the odd half THROUGH the
    stored spec — same fixpoint as sd21's ad-hoc train, so the
    parameterized cls1 oracle pins the registry path end to end. The
    artifact answer to "which model filtered this corpus?": a named,
    versioned spec, not a notebook variable."""
    from .store import FeatureStore

    docs = table(spark, sf_dir, "documents")
    feats = docs.select(
        F.col("doc_id").alias("entity_id"),
        F.lit("2024-01-01").cast("timestamp").alias("timestamp"),
        "text",
        "n_chars",
    )
    fs = FeatureStore(spark)
    fs.register("labeled", feats.filter(F.col("entity_id") % 2 == 0))
    fs.create_probe(
        "quality",
        "labeled",
        feature_exprs={
            "x0": "1",
            "x1": "size(split(text, ' ')) - 54",
            "x2": "size(array_distinct(split(text, ' '))) - 23",
            "x3": "size(filter(split(text, ' '), t -> length(t) <= 2)) - 2",
        },
        label_expr="CASE WHEN n_chars > 300 THEN 1 ELSE 0 END",
    )
    new = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    return fs.score_with_probe("quality", new).select("doc_id", "p", "pred")


def q_dq18_probe_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out calibration sweep for the stored probe (round-12;
    store.probe_report): train on the labeled evens, report per-
    threshold confusion + precision/recall over the HELD-OUT odds —
    the threshold sweep that picks the admit gate's ``min_p``
    honestly (reporting on the training half would flatter every
    number). One scan of the held-out table: map-only scoring, an
    11-row broadcast threshold dim, conditional partial aggs.
    Integer end to end, so the oracle replays the sweep exactly on
    top of the unrolled-GD fixpoint."""
    from .store import FeatureStore

    docs = table(spark, sf_dir, "documents")
    feats = docs.select(
        F.col("doc_id").alias("entity_id"),
        F.lit("2024-01-01").cast("timestamp").alias("timestamp"),
        "text",
        "n_chars",
    )
    fs = FeatureStore(spark)
    fs.register("labeled", feats.filter(F.col("entity_id") % 2 == 0))
    fs.register("heldout", feats.filter(F.col("entity_id") % 2 == 1))
    fs.create_probe(
        "quality",
        "labeled",
        feature_exprs={
            "x0": "1",
            "x1": "size(split(text, ' ')) - 54",
            "x2": "size(array_distinct(split(text, ' '))) - 23",
            "x3": "size(filter(split(text, ' '), t -> length(t) <= 2)) - 2",
        },
        label_expr="CASE WHEN n_chars > 300 THEN 1 ELSE 0 END",
    )
    return fs.probe_report("quality", table="heldout")


QUERIES = {
    'cls1_linear_probe': q_cls1_linear_probe,
    'cls2_stored_probe': q_cls2_stored_probe,
    'dq18_probe_calibration': q_dq18_probe_calibration,
    'cv1_purged_walkforward': q_cv1_purged_walkforward,
    'fe9_woe_encoding': q_fe9_woe_encoding,
    'x18_negative_sampling': q_x18_negative_sampling,
    'x12_hash_split': q_x12_hash_split,
    'x13_stratified_sample': q_x13_stratified_sample,
    'pack1_sequence_packing': q_pack1_sequence_packing,
    'shuf1_training_shards': q_shuf1_training_shards,
    'fe1_target_encoding': q_fe1_target_encoding,
    'fe2_feature_hash': q_fe2_feature_hash,
    'mix1_domain_mixture': q_mix1_domain_mixture,
    'x24_importance_score': q_x24_importance_score,
    'pack2_rank_pairing': q_pack2_rank_pairing,
    'fe3_vocab_encode': q_fe3_vocab_encode,
    'fe4_robust_scale': q_fe4_robust_scale,
    'mix2_temperature_mixture': q_mix2_temperature_mixture,
    'lm1_bigram_doc_score': q_lm1_bigram_doc_score,
    'fe7_quantile_binning': q_fe7_quantile_binning,
    'x29_weighted_sample': q_x29_weighted_sample,
    'fe8_impute_median': q_fe8_impute_median,
    'udtf1_token_runs': q_udtf1_token_runs,
    'fe6_global_row_number': q_fe6_global_row_number,
    'udtf2_session_gaps': q_udtf2_session_gaps,
    'lab1_majority_vote': q_lab1_majority_vote,
}

ORACLE_SQL: dict[str, str] = {}

ORACLE_SQL["pack1_sequence_packing"] = """
        WITH docs AS (
            SELECT doc_id,
                   CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(doc_id % 8 AS BIGINT) AS shard
            FROM documents
        ),
        binned AS (
            SELECT shard, doc_id, n_tokens,
                   CAST(floor((SUM(n_tokens) OVER (
                        PARTITION BY shard ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) - n_tokens) / 2048.0) AS BIGINT) AS bin
            FROM docs
        )
        SELECT shard, bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
               MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        FROM binned GROUP BY 1, 2
    """

ORACLE_SQL["x12_hash_split"] = """
        WITH t AS (
            SELECT *,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS u
            FROM documents
        )
        SELECT CASE WHEN u < 922337203685477632 THEN 'train' ELSE 'test' END AS split,
               CAST(u % 5 AS INTEGER) AS fold,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        FROM t GROUP BY 1, 2
    """

ORACLE_SQL["x13_stratified_sample"] = """
        WITH t AS (
            SELECT *,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS u
            FROM documents
        )
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               MIN(doc_id) AS min_doc
        FROM t
        WHERE u < CASE lang WHEN 'de' THEN 691752902764108160 WHEN 'en' THEN 288230376151711744
                            WHEN 'es' THEN 691752902764108160 ELSE 1152921504606846976 END
        GROUP BY lang
    """

ORACLE_SQL["x18_negative_sampling"] = """
        WITH pos AS (
            SELECT DISTINCT o_custkey AS cust, l_partkey AS part
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ),
        mp AS (SELECT MAX(p_partkey) AS maxp FROM part),
        cand AS (
            SELECT p.cust,
                   ('0x' || substr(md5(CAST(p.cust AS VARCHAR) || '-'
                        || CAST(p.part AS VARCHAR) || '-'
                        || CAST(g.i AS VARCHAR)), 1, 8))::BIGINT
                       % mp.maxp + 1 AS neg_part
            FROM pos p CROSS JOIN mp,
                 LATERAL unnest([1, 2, 3]) AS g(i)
        ),
        negs AS (
            SELECT c.cust, c.neg_part FROM cand c
            WHERE NOT EXISTS (SELECT 1 FROM pos p
                              WHERE p.cust = c.cust AND p.part = c.neg_part)
        )
        SELECT cust, CAST(COUNT(*) AS BIGINT) AS n_neg,
               CAST(SUM(neg_part) AS BIGINT) AS sum_neg_parts,
               CAST(COUNT(DISTINCT neg_part) AS BIGINT) AS n_distinct_neg
        FROM negs GROUP BY cust
    """

ORACLE_SQL["shuf1_training_shards"] = """
    WITH d AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
    s AS (SELECT doc_id, h,
                 ('0x' || substr(h, 1, 4))::BIGINT % 8 AS shard FROM d),
    p AS (SELECT shard, doc_id,
                 row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS pos
          FROM s),
    t AS (SELECT shard,
                 md5(CAST(pos AS VARCHAR) || ',' || CAST(doc_id AS VARCHAR)) AS ph
          FROM p)
    SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(('0x' || substr(ph, 1, 8))::BIGINT % 2147483648) AS BIGINT)
               AS perm_s1,
           CAST(SUM(('0x' || substr(ph, 9, 8))::BIGINT % 2147483648) AS BIGINT)
               AS perm_s2
    FROM t GROUP BY shard
"""

# pack2: same rank/pair arithmetic; min_by/max_by == argmin/argmax on r.
ORACLE_SQL["pack2_rank_pairing"] = """
    WITH t AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 4
                   AS shard
        FROM documents
    ),
    r AS (
        SELECT shard, doc_id, n_tokens,
               row_number() OVER (PARTITION BY shard
                                  ORDER BY n_tokens DESC, doc_id) AS r,
               COUNT(*) OVER (PARTITION BY shard) AS n
        FROM t
    ),
    b AS (
        SELECT shard, doc_id, n_tokens, r,
               CASE WHEN r * 2 <= n + 1 THEN r ELSE n + 1 - r END AS bin
        FROM r
    )
    SELECT shard, CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(arg_min(doc_id, r) AS BIGINT) AS id_long,
           CASE WHEN COUNT(*) = 2 THEN CAST(arg_max(doc_id, r) AS BIGINT)
           END AS id_short,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_total
    FROM b GROUP BY shard, bin
"""

# x24: staged integer divisions replayed operation-for-operation; '//' on
# positive BIGINTs == Spark DIV.
ORACLE_SQL["x24_importance_score"] = """
    WITH t AS (
        SELECT doc_id, lang, u.tok
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS tk
              FROM documents),
             LATERAL unnest(tk) AS u(tok)
        WHERE length(u.tok) > 0
    ),
    b AS (SELECT doc_id, lang,
                 ('0x' || substr(md5(tok), 1, 15))::BIGINT % 64 AS bucket
          FROM t),
    dim AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_src,
                   CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_tgt
            FROM b GROUP BY bucket),
    tot AS (SELECT SUM(n_src) AS s_tot, SUM(n_tgt) AS t_tot FROM dim),
    w AS (SELECT bucket,
                 ((n_tgt + 1) * 1000000000 // (t_tot + 64)) * 1000000
                     // ((n_src + 1) * 1000000000 // (s_tot + 64)) AS w_e6
          FROM dim CROSS JOIN tot),
    pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                  CAST(SUM(w_e6) // COUNT(*) AS BIGINT) AS dsir_e6
           FROM b JOIN w USING (bucket) GROUP BY doc_id)
    SELECT doc_id, n_tokens, dsir_e6 FROM pd
    ORDER BY dsir_e6 DESC, doc_id LIMIT 20
"""

# mix1: same md5 draw + integer rates; n_after recounted independently.
ORACLE_SQL["mix1_domain_mixture"] = """
    WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_before
               FROM documents GROUP BY lang),
    m AS (SELECT MIN(n_before) AS mn FROM c),
    r AS (SELECT lang, n_before,
                 CAST(mn * 1000000 // n_before AS BIGINT) AS keep_rate_e6
          FROM c CROSS JOIN m),
    k AS (SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_after
          FROM documents d JOIN r USING (lang)
          WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                    % 1000000 < r.keep_rate_e6
          GROUP BY d.lang)
    SELECT lang, n_before, keep_rate_e6,
           CAST(COALESCE(n_after, 0) AS BIGINT) AS n_after
    FROM r LEFT JOIN k USING (lang)
"""

# fe1: the cents quantization makes every sum an order-independent BIGINT;
# '//' is DuckDB's integer floor-div (positive operands -> same as Spark DIV).
ORACLE_SQL["fe1_target_encoding"] = """
    WITH u AS (
        SELECT o_orderkey, o_orderpriority,
               CAST(round(o_totalprice * 100) AS BIGINT) AS t
        FROM orders
    ), s AS (
        SELECT o_orderkey, o_orderpriority, t,
               SUM(t) OVER (PARTITION BY o_orderpriority) AS cs,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS cat_count
        FROM u
    )
    SELECT o_orderkey, o_orderpriority,
           CAST(cat_count AS BIGINT) AS cat_count,
           CASE WHEN cat_count > 1
                THEN CAST((cs - t) * 10000 // (cat_count - 1) AS BIGINT)
           END AS te_loo_e4
    FROM s
"""

ORACLE_SQL["fe2_feature_hash"] = (
    "SELECT event_id, array_to_string(list_transform(["
    + ", ".join(_fh_oracle_elem(b, ["event_type", "props"]) for b in range(16))
    + "], x -> CAST(x AS VARCHAR)), ',') AS fhash FROM events"
)

ORACLE_SQL["fe3_vocab_encode"] = """
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS token,
               generate_subscripts(regexp_extract_all(lower(text), '[A-Za-z0-9]+'), 1) AS pos
        FROM documents
    ),
    counts AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token),
    vocab AS (
        SELECT token,
               CAST(row_number() OVER (ORDER BY cnt DESC, token ASC) - 1
                    AS BIGINT) AS token_id
        FROM (SELECT * FROM counts ORDER BY cnt DESC, token ASC LIMIT 256)
    ),
    enc AS (
        SELECT t.doc_id, t.pos, COALESCE(v.token_id, 256) AS tid
        FROM toks t LEFT JOIN vocab v USING (token)
    ),
    agg AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nt,
               CAST(SUM(CASE WHEN tid = 256 THEN 1 ELSE 0 END) AS BIGINT) AS no,
               CAST(SUM(pos * (tid + 1)) AS BIGINT) AS sc
        FROM enc GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(a.nt, 0) AS n_tokens,
           COALESCE(a.no, 0) AS n_oov,
           CAST(COALESCE(a.no * 10000 // a.nt, 0) AS BIGINT) AS oov_e4,
           COALESCE(a.sc, 0) AS seq_check
    FROM documents d LEFT JOIN agg a USING (doc_id)
"""

ORACLE_SQL["fe4_robust_scale"] = f"""
    WITH ev AS (
        SELECT event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM ({_EV})
    ),
    med AS (SELECT event_type, quantile_cont(cents, 0.5) AS med
            FROM ev GROUP BY event_type),
    dev AS (SELECT ev.event_type, abs(cents - med) AS dev, med
            FROM ev JOIN med USING (event_type)),
    mad AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad
            FROM dev GROUP BY event_type)
    SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(ANY_VALUE(d.med), 4) AS med_cents,
           ROUND(ANY_VALUE(m.mad), 4) AS mad_cents,
           CAST(SUM(CASE WHEN d.dev > 4.4478 * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           CAST(SUM(CASE WHEN d.dev > 4.4478 * m.mad THEN 1 ELSE 0 END)
                * 10000 // COUNT(*) AS BIGINT) AS outlier_e4
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
"""

ORACLE_SQL["mix2_temperature_mixture"] = """
    WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_before
               FROM documents GROUP BY source),
    w AS (SELECT source, n_before,
                 CAST(floor(sqrt(CAST(n_before AS DOUBLE))) AS BIGINT) AS weight
          FROM c),
    t AS (SELECT CAST(SUM(n_before) AS BIGINT) AS n_total,
                 CAST(SUM(weight) AS BIGINT) AS w_total FROM w),
    r AS (SELECT source, n_before, weight,
                 CAST(LEAST(n_before,
                      ((n_total * 1 // 2) * weight) // w_total) AS BIGINT)
                     AS target
          FROM w CROSS JOIN t),
    r2 AS (SELECT *, CAST(target * 1000000 // n_before AS BIGINT)
                         AS keep_rate_e6 FROM r),
    k AS (SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_after
          FROM documents d JOIN r2 USING (source)
          WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                    % 1000000 < r2.keep_rate_e6
          GROUP BY d.source)
    SELECT source, n_before, weight, target, keep_rate_e6,
           CAST(COALESCE(n_after, 0) AS BIGINT) AS n_after
    FROM r2 LEFT JOIN k USING (source)
"""

ORACLE_SQL["lm1_bigram_doc_score"] = """
    WITH dt AS (
        SELECT doc_id, list_filter(string_split(lower(text), ' '),
                                   t -> length(t) > 0) AS tk
        FROM documents
    ),
    docbi AS (
        SELECT doc_id, unnest(CASE WHEN len(tk) >= 2
               THEN list_transform(generate_series(1, len(tk) - 1),
                    i -> array_to_string(tk[i:i+1], ' '))
               ELSE CAST([] AS VARCHAR[]) END) AS gram
        FROM dt
    ),
    bi AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS c_xy
           FROM docbi GROUP BY gram),
    uni AS (SELECT gram AS x, CAST(COUNT(*) AS BIGINT) AS c_x
            FROM (SELECT unnest(tk) AS gram FROM dt) GROUP BY gram),
    v AS (SELECT CAST(COUNT(*) AS BIGINT) AS v_size FROM uni),
    sc AS (
        SELECT d.doc_id,
               ((b.c_xy + 1) * 1000000 // (u.c_x + v.v_size)) AS p_e6
        FROM docbi d JOIN bi b USING (gram)
        JOIN uni u ON u.x = string_split(d.gram, ' ')[1]
        CROSS JOIN v
    ),
    per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                   CAST(SUM(p_e6) AS BIGINT) AS lm_sum_e6
            FROM sc GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(COALESCE(lm_sum_e6, 0) AS BIGINT) AS lm_sum_e6,
           CAST(CASE WHEN COALESCE(n_bigrams, 0) = 0 THEN 0
                ELSE lm_sum_e6 // n_bigrams END AS BIGINT) AS lm_avg_e6
    FROM (SELECT DISTINCT doc_id FROM documents) d
    LEFT JOIN per USING (doc_id)
    ORDER BY lm_avg_e6 DESC, doc_id LIMIT 20
"""

ORACLE_SQL["udtf1_token_runs"] = """
    WITH tok AS (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS token,
               generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
        FROM documents
    ),
    marks AS (
        SELECT doc_id, token, pos,
               CASE WHEN lag(token) OVER (PARTITION BY doc_id ORDER BY pos)
                         IS DISTINCT FROM token THEN 1 ELSE 0 END AS is_start
        FROM tok
    ),
    isl AS (
        SELECT doc_id, token, pos,
               SUM(is_start) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
        FROM marks
    ),
    runs AS (
        SELECT doc_id, run_id, token,
               CAST(MIN(pos) AS BIGINT) AS run_start,
               CAST(COUNT(*) AS BIGINT) AS run_len
        FROM isl GROUP BY doc_id, run_id, token
    ),
    best AS (
        SELECT doc_id, token AS max_run_token,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY run_len DESC, run_start ASC) AS rn
        FROM runs
    ),
    agg AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_runs,
               CAST(SUM(run_len) AS BIGINT) AS n_tokens,
               CAST(MAX(run_len) AS BIGINT) AS max_run
        FROM runs GROUP BY doc_id
    )
    SELECT a.doc_id, a.n_runs, a.n_tokens, a.max_run, b.max_run_token
    FROM agg a JOIN best b ON a.doc_id = b.doc_id AND b.rn = 1
    WHERE a.max_run >= 2
"""

# lab1: the vote count, rank, and share replay as identical window math;
# agreement is integer basis points (floor div), never a float ratio.
ORACLE_SQL["lab1_majority_vote"] = f"""
    WITH e AS ({_EV}),
    votes AS (
        SELECT user_id, event_type, COUNT(*) AS n
        FROM e GROUP BY user_id, event_type
    ),
    ranked AS (
        SELECT user_id, event_type, n,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY n DESC, event_type ASC) AS rn,
               SUM(n) OVER (PARTITION BY user_id) AS n_votes
        FROM votes
    )
    SELECT user_id,
           event_type AS majority_label,
           CAST(n AS BIGINT) AS n_majority,
           CAST(n_votes AS BIGINT) AS n_votes,
           CAST((n * 10000) // n_votes AS BIGINT) AS agreement_e4
    FROM ranked WHERE rn = 1
"""

ORACLE_SQL["udtf2_session_gaps"] = """
    WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
    g AS (
        SELECT user_id,
               us - lag(us) OVER (PARTITION BY user_id ORDER BY us) AS gap
        FROM e
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(1 + SUM(CASE WHEN gap > 1800000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sessions,
           CAST(MAX(COALESCE(gap, 0)) AS BIGINT) AS max_gap_us
    FROM g GROUP BY user_id
"""

ORACLE_SQL["fe6_global_row_number"] = """
    WITH r AS (
        SELECT o_orderkey,
               row_number() OVER (ORDER BY o_orderkey) AS row_no
        FROM orders
    )
    SELECT CAST(row_no % 1000 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(row_no * o_orderkey) AS BIGINT) AS dot,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM r GROUP BY bucket
"""

ORACLE_SQL["fe7_quantile_binning"] = """
    WITH c AS (
        SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
    ),
    b AS (
        SELECT list_transform(
                   quantile_cont(cents, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
                   x -> CAST(ROUND(x) AS BIGINT)
               ) AS bounds
        FROM c
    ),
    binned AS (
        SELECT c.cents,
               CAST(len(list_filter(b.bounds, x -> x < c.cents)) AS BIGINT)
                   AS bin
        FROM c, b
    )
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(cents) AS BIGINT) AS min_cents,
           CAST(MAX(cents) AS BIGINT) AS max_cents,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM binned GROUP BY bin
"""

ORACLE_SQL["x29_weighted_sample"] = """
    WITH t AS (
        SELECT doc_id, lang, n_chars,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                   + 1 AS u
        FROM documents
    )
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS w, u
    FROM t
    ORDER BY CAST(n_chars AS DOUBLE) * 1152921504606846976.0
                 / CAST(u AS DOUBLE) DESC,
             doc_id
    LIMIT 100
"""

ORACLE_SQL["fe8_impute_median"] = """
    WITH e AS (
        SELECT event_type,
               CASE WHEN event_id % 7 = 0 THEN NULL
                    ELSE CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END AS cents
        FROM events
    ),
    m AS (
        SELECT event_type,
               CAST(FLOOR(quantile_cont(cents, 0.5) + 0.5) AS BIGINT) AS med
        FROM e WHERE cents IS NOT NULL GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN e.cents IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_imputed,
           CAST(SUM(COALESCE(e.cents, m.med)) AS BIGINT) AS sum_cents,
           CAST(MIN(m.med) AS BIGINT) AS med_cents
    FROM e JOIN m USING (event_type)
    GROUP BY e.event_type
"""

# fe9: identical conditional-count + window-total + ln algebra; EPS and the
# nano fixed-point rounding match operators/drift.py (floor(x*1e9 + 0.5)).
ORACLE_SQL["fe9_woe_encoding"] = """
    WITH per AS (
        SELECT o_orderpriority AS category,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_pos,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END)
                    AS BIGINT) AS n_neg
        FROM orders GROUP BY 1
    ),
    fr AS (
        SELECT category, n_pos, n_neg,
               n_pos / CAST(SUM(n_pos) OVER () AS DOUBLE) AS pf,
               n_neg / CAST(SUM(n_neg) OVER () AS DOUBLE) AS nf
        FROM per
    )
    SELECT category, n_pos, n_neg,
           CAST(floor(ln((pf + 1e-6) / (nf + 1e-6)) * 1e9 + 0.5) AS BIGINT)
               AS woe_nano,
           CAST(floor((pf - nf) * ln((pf + 1e-6) / (nf + 1e-6)) * 1e9 + 0.5)
                AS BIGINT) AS iv_nano
    FROM fr
"""

# cv1: identical purged walk-forward interval algebra — train ts <= cut,
# test in (cut + 1d, cut + 1d + 3d].
ORACLE_SQL["cv1_purged_walkforward"] = """
    WITH ev AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    specs AS (SELECT * FROM (VALUES
        (0, TIMESTAMP '2024-01-08'),
        (1, TIMESTAMP '2024-01-12'),
        (2, TIMESTAMP '2024-01-16')) AS t(fold, cut)),
    tagged AS (
        SELECT s.fold,
               CASE WHEN e.ts <= s.cut THEN 'train'
                    WHEN e.ts > s.cut + INTERVAL 1 DAY
                     AND e.ts <= s.cut + INTERVAL 4 DAY THEN 'test'
               END AS split,
               e.cents, e.user_id
        FROM ev e CROSS JOIN specs s
    )
    SELECT fold, split,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(SUM(user_id) AS BIGINT) AS sum_users
    FROM tagged WHERE split IS NOT NULL
    GROUP BY fold, split
"""


def _cls1_sql(
    iters: int = 3,
    scale: int = 1_000_000,
    lr_den: int = 100,
    train_where: str = "",
    output: str = "confusion",
    return_parts: bool = False,
) -> str | tuple[str, str, str]:
    """Unrolled-iteration replay of cls1's integer GD fixpoint: weights
    CTE i cross-joins into gradient CTE i+1 (1-row frames), exactly the
    driver loop's data flow. All arithmetic is BIGINT + one IEEE double
    division inside floor() per update — identical in both engines.
    ``train_where`` restricts the gradient rows (sd21 trains on the
    labeled seed half and scores the streamed half); ``output`` picks
    the final select: 'confusion' (cls1) or 'scores' (per-doc p/pred
    over the COMPLEMENT of train_where — requires train_where)."""
    feats = ["x0", "x1", "x2", "x3"]

    def z(wref: str | None) -> str:
        if wref is None:  # all-zero init
            return "0"
        return " + ".join(f"{wref}.w{j}*f.{c}" for j, c in enumerate(feats))

    def p(zexpr: str) -> str:
        return (
            f"LEAST({scale}, GREATEST(0, CAST(floor(({zexpr})/4.0) AS BIGINT)"
            f" + {scale // 2}))"
        )

    ctes = [
        """feat AS (
        SELECT doc_id,
               CASE WHEN n_chars > 300 THEN 1 ELSE 0 END AS y,
               CAST(1 AS BIGINT) AS x0,
               CAST(len(string_split(text, ' ')) - 54 AS BIGINT) AS x1,
               CAST(len(list_distinct(string_split(text, ' '))) - 23
                    AS BIGINT) AS x2,
               CAST(len(list_filter(string_split(text, ' '),
                                    t -> len(t) <= 2)) - 2 AS BIGINT) AS x3
        FROM documents
    )"""
    ]
    if train_where:
        ctes.append(f"tfeat AS (SELECT * FROM feat WHERE {train_where})")
    trel = "tfeat" if train_where else "feat"
    prev_w = None
    for i in range(1, iters + 1):
        perr = f"({p(z(prev_w))} - f.y*{scale})"
        gsel = ", ".join(
            f"CAST(sum({perr}*f.{c}) AS BIGINT) AS g{j}"
            for j, c in enumerate(feats)
        )
        if prev_w is None:
            ctes.append(
                f"g{i} AS (SELECT count(*) AS n, {gsel} FROM {trel} f)"
            )
            wsel = ", ".join(
                f"0 - CAST(floor(g{j}/({lr_den}.0*n)) AS BIGINT) AS w{j}"
                for j in range(len(feats))
            )
            ctes.append(f"w{i} AS (SELECT {wsel} FROM g{i})")
        else:
            carry = ", ".join(
                f"any_value({prev_w}.w{j}) AS pw{j}" for j in range(len(feats))
            )
            ctes.append(
                f"g{i} AS (SELECT {carry}, count(*) AS n, {gsel} "
                f"FROM {trel} f CROSS JOIN {prev_w})"
            )
            wsel = ", ".join(
                f"pw{j} - CAST(floor(g{j}/({lr_den}.0*n)) AS BIGINT) AS w{j}"
                for j in range(len(feats))
            )
            ctes.append(f"w{i} AS (SELECT {wsel} FROM g{i})")
        prev_w = f"w{i}"
    pfin = p(z(prev_w))
    joined = ",\n    ".join(ctes)
    if return_parts:
        # (CTE chain, final-p expr over alias f, final weights CTE name)
        # — lets a composed oracle (pipe4) weld the GD replay into a
        # larger WITH block
        return joined, pfin, prev_w
    if output == "scores":
        if not train_where:
            raise ValueError("output='scores' requires train_where")
        return f"""
    WITH {joined}
    SELECT f.doc_id, CAST({pfin} AS BIGINT) AS p,
           CASE WHEN {pfin} >= {scale // 2} THEN 1 ELSE 0 END AS pred
    FROM feat f CROSS JOIN {prev_w}
    WHERE NOT ({train_where})
    """
    return f"""
    WITH {joined}
    SELECT f.y, CASE WHEN {pfin} >= {scale // 2} THEN 1 ELSE 0 END AS pred,
           CAST(count(*) AS BIGINT) AS n,
           {", ".join(f"any_value({prev_w}.w{j}) AS w{j}" for j in range(len(feats)))}
    FROM feat f CROSS JOIN {prev_w}
    GROUP BY 1, 2
    """


ORACLE_SQL["cls1_linear_probe"] = _cls1_sql()


# cls2: the registry path serves the SAME fixpoint as the ad-hoc train
# — the parameterized builder replays train-on-evens, score-odds.
ORACLE_SQL["cls2_stored_probe"] = _cls1_sql(
    train_where="doc_id % 2 = 0", output="scores"
)


# dq18: the threshold sweep on top of the unrolled GD fixpoint — scores
# of the held-out odds, cross-joined with the 11-row threshold dim.
def _dq18_sql() -> str:
    ctes, pfin, wname = _cls1_sql(
        train_where="doc_id % 2 = 0", return_parts=True
    )
    return f"""
    WITH {ctes},
    sc AS (
        SELECT f.y, CAST({pfin} AS BIGINT) AS p
        FROM feat f CROSS JOIN {wname}
        WHERE f.doc_id % 2 = 1
    ),
    th AS (SELECT CAST(i * 100000 AS BIGINT) AS threshold
           FROM LATERAL unnest(generate_series(0, 10)) AS g(i)),
    cm AS (
        SELECT t.threshold,
               CAST(SUM(CASE WHEN p >= t.threshold AND y = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(SUM(CASE WHEN p >= t.threshold AND y = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(SUM(CASE WHEN p < t.threshold AND y = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS fn,
               CAST(SUM(CASE WHEN p < t.threshold AND y = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS tn
        FROM sc CROSS JOIN th t GROUP BY t.threshold
    )
    SELECT threshold, tp, fp, fn, tn,
           CAST(CASE WHEN tp + fp = 0 THEN 1000000
                ELSE floor(tp * 1000000.0 / (tp + fp) + 0.5)
                END AS BIGINT) AS precision_ppm,
           CAST(CASE WHEN tp + fn = 0 THEN 1000000
                ELSE floor(tp * 1000000.0 / (tp + fn) + 0.5)
                END AS BIGINT) AS recall_ppm
    FROM cm
    """


ORACLE_SQL["dq18_probe_calibration"] = _dq18_sql()
