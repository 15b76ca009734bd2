"""Driver-facing query suite: Spark implementations + DuckDB oracle SQL.

Every operator from SURVEY §2 that is SQL-expressible gets a pair:
a ``(spark, sf_dir) -> DataFrame`` callable and an equivalent ANSI-SQL
string the driver runs on DuckDB over the same parquet tables. Column
names/aliases are kept identical on both sides; the driver's comparison is
row-count + schema + order-insensitive value hash.

Parity conventions (see FIXTURES.md "timestamp caveat"):
  * ``events.ts`` is parquet TIMESTAMP(NANOS): Spark reads it as an epoch-
    nanos long (``spark.sql.legacy.parquet.nanosAsLong``) and converts with
    ``timestamp_micros(ts div 1000)``; the oracle uses
    ``CAST(ts AS TIMESTAMP)`` (DuckDB ns->us truncation) — identical floors.
  * timestamps in OUTPUT are emitted as epoch-microsecond BIGINTs
    (``unix_micros`` / ``epoch_us``) so value hashing is type-stable.
  * double aggregates are rounded (2dp for price-scale sums, 4-6dp for
    ratios) to absorb summation-order float jitter.
  * sums of integers are CAST to BIGINT in DuckDB (it defaults to HUGEINT).
"""

from __future__ import annotations

import math
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.asof import asof_join
from .operators.pit import entity_filter, latest_per_entity, temporal_filter, top_k_per_group

# --------------------------------------------------------------------------- #
# session + table helpers
# --------------------------------------------------------------------------- #


def ensure_conf(spark: SparkSession) -> None:
    """Runtime-settable conf the suite depends on — the driver builds its own
    SparkSession, so we cannot rely on session.py's builder config."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Naive parquet timestamps -> session-tz TIMESTAMP (UTC), never NTZ.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")


def _scratch_path(name: str, sf_dir: str) -> str:
    """The deterministic per-(query, sf_dir) scratch location, WITHOUT
    wiping or creating it. Tests that inspect a query's written output
    use this instead of duplicating the md5-tag layout (round-3 advice:
    a private-scheme copy silently desynchronizes if the layout
    changes)."""
    import hashlib
    import os

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return os.path.join(tempfile.gettempdir(), "mlfs_scratch", f"{name}_{tag}")


def _scratch_dir(name: str, sf_dir: str) -> str:
    """Deterministic per-(query, sf_dir) scratch path for sink round-trips
    and throwaway stores. Repeated bench/correctness runs reuse (wipe and
    rewrite) the same directory instead of leaking a fresh mkdtemp per
    invocation (round-2 advice). Not safe for two concurrent sessions
    running the SAME query on the SAME sf_dir — the suite never does."""
    import os
    import shutil

    d = _scratch_path(name, sf_dir)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d


def _write_ordered_feed(d: str, *batches: DataFrame) -> None:
    """Write each batch as parquet part files into ``d`` with strictly
    increasing file mtimes (all in the past). FileStreamSource orders
    replay by modification time with undefined tie-breaking; two
    sub-millisecond appends — or a coarse-mtime filesystem — could
    otherwise feed the later time-slice first and break a state fold's
    per-key-ordered assumption (round-3 advice)."""
    import os
    import time as _time

    seen: set[str] = set()
    base = _time.time()
    n = len(batches)
    for i, b in enumerate(batches):
        b.coalesce(1).write.mode("append").parquet(d)
        mt = base - (n - i) * 10
        for f in os.listdir(d):
            if f.startswith("part-") and f not in seen:
                os.utime(os.path.join(d, f), (mt, mt))
                seen.add(f)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # Keep the raw nanos long under __ts_ns__: temporal_filter uses it
        # for a pushable scan predicate (see operators/pit.py docstring).
        df = df.withColumn("__ts_ns__", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return df


def events_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events mapped to the feature-table shape: entity_id=user_id,
    timestamp=ts, tie-break id = event_id (deterministic input order)."""
    return table(spark, sf_dir, "events").select(
        F.col("user_id").alias("entity_id"),
        F.col("ts").alias("timestamp"),
        F.col("event_id"),
        F.col("event_type"),
        F.col("value"),
        F.col("event_id").alias("__row_id__"),
    )


_US = F.unix_micros

# Shared by t2's Spark query and its oracle (the synthetic corpus's
# function words).
STOPWORDS = ("a", "the", "of", "and")

# Oracle-side view of events with us-truncated timestamp.
_EV = "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events"

# --------------------------------------------------------------------------- #
# F-ops: reference feature-store semantics on the events table
# --------------------------------------------------------------------------- #


def q_f1_register_pit_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end store path: register events as a feature table (memory
    backend), then PIT ``get`` for users 0-19 at a cutoff — exercises
    validation, registration, temporal+entity filters, argmax and
    projection through the public FeatureStore API (reference
    store.py:129-157 + 218-259)."""
    import datetime as dt

    from .store import FeatureStore

    feats = events_features(spark, sf_dir).drop("__row_id__", "event_type")
    fs = FeatureStore(spark)
    fs.register("ev", feats)
    out = fs.get("ev", list(range(20)), dt.datetime(2024, 1, 25), columns=["value"])
    return out.select(
        F.col("entity_id").alias("user_id"),
        _US("timestamp").alias("ts_us"),
        "value",
    )


def q_f2_temporal_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    out = temporal_filter(ev, "2024-01-10", ts_col="ts")
    return out.select("event_id", "user_id", _US("ts").alias("ts_us"), "event_type", "value")


def q_f3_entity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    out = entity_filter(ev, [1, 3, 5, 7, 11], entity_col="user_id")
    return out.select("event_id", "user_id", _US("ts").alias("ts_us"), "value")


def q_f4_latest_per_entity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    out = latest_per_entity(ev, entity_col="user_id", ts_col="ts", tiebreak_col="event_id")
    return out.select("user_id", "event_id", _US("ts").alias("ts_us"), "event_type", "value")


def q_f6_pit_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    out = temporal_filter(ev, "2024-01-20", ts_col="ts")
    out = entity_filter(out, list(range(0, 10)), entity_col="user_id")
    out = latest_per_entity(out, entity_col="user_id", ts_col="ts", tiebreak_col="event_id")
    return out.select("user_id", "event_id", _US("ts").alias("ts_us"), "event_type", "value")


def q_f7_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = events_features(spark, sf_dir)
    spine = feats.filter(F.col("event_type") == "purchase").select("entity_id", "timestamp")
    out = asof_join(spine, feats, strategy="union", keep_spine_ts=True)
    return out.select(
        F.col("entity_id").alias("user_id"),
        "event_id",
        _US("timestamp").alias("ts_us"),
        "event_type",
        "value",
        _US("as_of_timestamp").alias("as_of_us"),
    )


def q_f7_asof_join_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-set construction against a (entity x date-grid) spine —
    the canonical 'build me features as of these dates' query."""
    feats = events_features(spark, sf_dir)
    dates = spark.createDataFrame(
        [("2024-01-08",), ("2024-01-15",), ("2024-01-22",)], ["d"]
    ).select(F.col("d").cast("timestamp").alias("timestamp"))
    users = feats.select("entity_id").distinct()
    spine = users.crossJoin(dates)
    out = asof_join(spine, feats, strategy="union", keep_spine_ts=True)
    return out.select(
        F.col("entity_id").alias("user_id"),
        "event_id",
        _US("timestamp").alias("ts_us"),
        "value",
        _US("as_of_timestamp").alias("as_of_us"),
    )


def q_f7e_asof_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT as-of training set (Feast get_historical_features contract):
    every (user x early grid date) spine row survives; users whose first
    event is after the date carry NULL features instead of vanishing.
    Same union strategy and single shuffle as f7 — only the final filter
    differs (operators/asof.py how='left')."""
    feats = events_features(spark, sf_dir)
    dates = spark.createDataFrame(
        [("2024-01-02",), ("2024-01-15",)], ["d"]
    ).select(F.col("d").cast("timestamp").alias("timestamp"))
    users = feats.select("entity_id").distinct()
    spine = users.crossJoin(dates)
    out = asof_join(spine, feats, strategy="union", keep_spine_ts=True, how="left")
    return out.select(
        F.col("entity_id").alias("user_id"),
        "event_id",
        _US("timestamp").alias("ts_us"),
        "value",
        _US("as_of_timestamp").alias("as_of_us"),
    )


def q_dq4_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit across the star schema: orphan-row counts for
    every foreign key (orders->customer, lineitem->orders/part/supplier)
    as broadcast anti-join probes — the warehouse-wide integrity check a
    lake runs after every load. Each constraint is one scan of the fact
    with the (smaller) key side broadcast; counts are exact. Emitted as
    one row per constraint so new constraints append without schema
    change."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    checks = [
        ("orders.o_custkey->customer", o, "o_custkey",
         table(spark, sf_dir, "customer"), "c_custkey"),
        ("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey"),
        ("lineitem.l_partkey->part", li, "l_partkey",
         table(spark, sf_dir, "part"), "p_partkey"),
        ("lineitem.l_suppkey->supplier", li, "l_suppkey",
         table(spark, sf_dir, "supplier"), "s_suppkey"),
    ]
    out = None
    for name, fact, fk, dim, pk in checks:
        orphans = fact.select(F.col(fk).alias("__k__")).join(
            F.broadcast(dim.select(F.col(pk).alias("__k__"))), "__k__", "left_anti"
        )
        row = orphans.agg(
            F.lit(name).alias("constraint"),
            F.count("*").alias("n_orphans"),
        ).crossJoin(fact.agg(F.count("*").alias("n_fact_rows")))
        out = row if out is None else out.unionByName(row)
    return out.select("constraint", "n_orphans", "n_fact_rows")


def q_x20_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer training, step one: corpus-wide adjacent token-pair
    frequencies — the statistic every BPE merge iteration ranks on. The
    pair construction is a JVM-side zip of the token array with its own
    tail (no UDF, no shuffle until the count), then one partial-agg
    count and a top-20 TakeOrderedAndProject. At 100 TB this is exactly
    how you'd fit a tokenizer on the corpus: each merge round = one
    such counting pass over (re-segmented) tokens."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    ex = docs.select(F.explode(pairs).alias("pair"))
    return (
        ex.groupBy("pair")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "pair")
        .limit(20)
    )


def q_m6_modality_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-modality corpus routing by MAGIC BYTES — the dispatch step a
    multimodal lake needs before per-modality kernels (m1/m2/m5): inspect
    the payload's leading bytes JVM-side (substring+hex on binary, no
    UDF) and route to image/jpeg, image/png or audio/wav lanes. Payloads
    here are synthesized with real magics (JPEG FFD8FF, PNG 89504E47,
    RIFF) over utf-8 text bodies so the oracle can replay byte lengths
    exactly; on real data the payload column comes from binaryFile or a
    parquet binary column and nothing else changes."""
    docs = table(spark, sf_dir, "documents")
    magic = (
        F.when(F.col("doc_id") % 3 == 0, F.lit(bytes([0xFF, 0xD8, 0xFF])))
        .when(F.col("doc_id") % 3 == 1, F.lit(bytes([0x89, 0x50, 0x4E, 0x47])))
        .otherwise(F.lit(b"RIFF"))
    )
    payload = F.concat(magic, F.encode("text", "utf-8"))
    tagged = docs.select("doc_id", payload.alias("payload"))
    pfx = F.hex(F.substring("payload", 1, 4))
    modality = (
        F.when(pfx.startswith("FFD8FF"), "image/jpeg")
        .when(pfx == "89504E47", "image/png")
        .when(pfx.startswith("52494646"), "audio/wav")
        .otherwise("unknown")
    )
    return tagged.groupBy(modality.alias("modality")).agg(
        F.count("*").alias("n_payloads"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.min("doc_id").alias("min_doc"),
    )


def q_x19_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation — recall@10 of the PQ index (x17) against
    exact brute-force cosine ground truth (x1), self-match excluded.
    The eval harness every ANN deployment needs before trusting the
    approximate path; output is integer overlap counts so the check is
    exact. At 100 TB: ground truth on a sampled query set, PQ on the
    full corpus."""
    from .operators.similarity import knn_brute_force, pq_ann_topk

    emb = table(spark, sf_dir, "embeddings").cache()
    qvec = [
        float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    exact = (
        knn_brute_force(emb.filter(F.col("vec_id") != 0), qvec, k=10)
        .select("vec_id")
    )
    approx = (
        pq_ann_topk(emb, qvec, m=4, sub_dim=16, k_codes=16, k=11, iterations=1)
        .filter(F.col("vec_id") != 0)
        .orderBy("adist", "vec_id")
        .limit(10)
        .select("vec_id")
    )
    return exact.join(approx, "vec_id").agg(
        F.lit(10).alias("k"),
        F.count("*").alias("n_overlap"),
        (F.count("*") * 10).alias("recall_pct"),
    )


def q_pipe3_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL corpus-curation pipeline as ONE declarative plan — the
    C4/Dolma reproduction flagship, chaining five stages the suite also
    proves individually: (1) quality gate (>=30 tokens, distinct-token
    ratio >=0.4), (2) exact dedup keep-first (md5 groupBy), (3) near-dup
    clusters (MinHash-LSH candidates -> exact Jaccard >=0.5 -> connected
    components) keeping the best-quality member, (4) decontamination
    against the held-out slice (4-gram broadcast banlist), (5) md5 shard
    deal. Output: per-shard manifests with order-independent id sums.
    Every stage is shuffle-bounded exactly as its standalone query; the
    oracle replays the entire chain in one WITH RECURSIVE statement."""
    from .operators.dedup import (
        connected_components,
        dedup_minhash_lsh,
        detect_contamination,
        ngram_jaccard,
    )

    docs = table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    benchmark = docs.filter(F.col("doc_id") % 20 == 0)

    toks = F.split(F.col("text"), " ")
    uniq = F.size(F.array_distinct(toks)) / F.size(toks)
    q1 = corpus.filter((F.size(toks) >= 30) & (uniq >= 0.4))

    keep_first = q1.groupBy(F.md5("text").alias("__h__")).agg(
        F.min("doc_id").alias("doc_id")
    )
    q2 = q1.join(keep_first.select("doc_id"), "doc_id")

    cand = dedup_minhash_lsh(q2, num_hashes=16, bands=4, hash_family="md5_affine")
    edges = ngram_jaccard(q2, cand, threshold=0.5).select("id_a", "id_b")
    comp = connected_components(edges)
    members = comp.join(
        q2.select("doc_id", uniq.alias("__uq__")), comp.node == F.col("doc_id")
    )
    w_keep = F.max_by(
        "doc_id", F.struct(F.col("__uq__"), (-F.col("doc_id")).alias("n"))
    )
    kept = members.groupBy("component").agg(w_keep.alias("keep_id"))
    drops = members.join(
        kept, members.component == kept.component
    ).filter(F.col("doc_id") != F.col("keep_id")).select("doc_id")
    q3 = q2.join(drops, "doc_id", "left_anti")

    hits = detect_contamination(q3, benchmark, shingle_k=4).select("doc_id")
    q4 = q3.join(hits, "doc_id", "left_anti")

    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 4
    )
    return q4.groupBy(shard.alias("shard")).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum("doc_id").alias("sum_ids"),
    )


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


def q_a16_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-funnel analysis: per user, the first `view` and whether
    a `purchase` followed within 2 hours (plus the exact microsecond
    time-to-convert). The product-analytics sequence query — stage
    anchors via per-entity min-aggregates (map-side combined), then a
    band-bounded left join exactly like f13/f16; no window over raw
    events, no row explosion beyond purchases-per-2h."""
    ev = table(spark, sf_dir, "events")
    first_view = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fv"))
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts")
    )
    j = first_view.join(
        buys,
        (F.col("user_id") == F.col("b_user"))
        & (F.col("b_ts") > F.col("fv"))
        & (F.col("b_ts") <= F.col("fv") + F.expr("INTERVAL 2 HOURS")),
        "left",
    )
    agg = j.groupBy("user_id", "fv").agg(F.min("b_ts").alias("fb"))
    return agg.select(
        "user_id",
        _US("fv").alias("first_view_us"),
        F.col("fb").isNotNull().alias("converted"),
        (_US("fb") - _US("fv")).alias("convert_us"),
    )


def q_f16_label_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe LABEL construction — the forward-window twin of the
    as-of feature join: for each spine row, the label aggregates events
    STRICTLY AFTER the spine timestamp within (t, t+7d] (did the user
    purchase? how much?). Features look backward (f7/f13/f15), labels
    look forward; together they make a training row with no time
    leakage in either direction. Same band-join cost envelope as f13."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    spine = ev.filter(F.col("event_id") % 10 == 0).select(
        "user_id", "ts", F.col("event_id").alias("spine_id")
    )
    e = ev.alias("e")
    s = spine.alias("s")
    j = s.join(
        e,
        (F.col("s.user_id") == F.col("e.user_id"))
        & (F.col("e.ts") > F.col("s.ts"))
        & (F.col("e.ts") <= F.col("s.ts") + F.expr("INTERVAL 7 DAYS")),
        "left",
    )
    is_buy = F.col("e.event_type") == "purchase"
    return j.groupBy(
        F.col("s.user_id").alias("user_id"),
        _US(F.col("s.ts")).alias("ts_us"),
        F.col("s.spine_id").alias("spine_id"),
    ).agg(
        F.coalesce(F.sum(is_buy.cast("long")), F.lit(0)).alias("n_future_purchases"),
        (F.coalesce(F.sum(is_buy.cast("long")), F.lit(0)) > 0).alias("label_converted"),
        F.coalesce(F.sum(F.when(is_buy, F.col("e.cents"))), F.lit(0))
        .cast("long")
        .alias("future_purchase_cents"),
    )


# Hour-step exponential decay weights in integer micro-units, shared by
# f15's Spark query and oracle: weight[h] = round(0.97^h * 1e6) for ages of
# h whole hours, 7-day horizon. A Python-computed literal table makes the
# decay BIT-EXACT on every engine (libm pow/exp differ in ulps across
# engines; integer table lookups cannot).
_DECAY_HOURS = 7 * 24
_DECAY_MICRO = [int(round((0.97**h) * 1_000_000)) for h in range(_DECAY_HOURS + 1)]


def q_f15_decayed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed feature aggregation as-of each spine row (the
    Chronon-style decayed counter): every event in the trailing 7 days
    contributes value * 0.97^age_hours, with the decay curve as an
    integer micro-unit lookup table so the whole aggregate is integer
    arithmetic — order-independent and engine-exact (see _DECAY_MICRO).

    Formulated as the band-bounded pairwise join (explosion bounded by
    events-per-entity-per-7d, the same cost envelope as f13); at
    streaming scale the factorized incremental form (decay the running
    sum by the batch gap, add new terms) maintains the same quantity
    without re-scanning the band."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    spine = ev.filter(F.col("event_id") % 10 == 0).select(
        "user_id", "ts", F.col("event_id").alias("spine_id")
    )
    e = ev.alias("e")
    s = spine.alias("s")
    j = s.join(
        e,
        (F.col("s.user_id") == F.col("e.user_id"))
        & (F.col("e.ts") <= F.col("s.ts"))
        & (F.col("e.ts") > F.col("s.ts") - F.expr("INTERVAL 7 DAYS")),
        "left",
    )
    age_h = F.floor(
        (F.unix_micros(F.col("s.ts")) - F.unix_micros(F.col("e.ts")))
        / F.lit(3_600_000_000)
    ).cast("int")
    wtab = F.expr("array(" + ",".join(str(w) for w in _DECAY_MICRO) + ")")
    term = F.col("e.cents") * F.element_at(wtab, age_h + F.lit(1))
    return j.groupBy(
        F.col("s.user_id").alias("user_id"),
        _US(F.col("s.ts")).alias("ts_us"),
        F.col("s.spine_id").alias("spine_id"),
    ).agg(
        F.count(F.col("e.cents")).alias("n_events"),
        F.coalesce(F.sum(term), F.lit(0)).cast("long").alias("decayed_micro"),
    )


def q_f15b_decayed_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """f15's decayed features through the BUCKETED band join
    (operators/band.py): the shuffle key is (user_id, floor(ts/7d))
    instead of user_id alone, so per-task work is bounded by two
    band-widths of one user's history — the skew/working-set fix for
    band joins at 100 TB (round-2 verdict item 4). Same semantics, same
    oracle as f15; plan-gated to join on the bucket key."""
    from .operators.band import band_join_bucketed

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("ets"),
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    spine = ev.filter(F.col("event_id") % 10 == 0).select(
        "user_id", F.col("ets").alias("sts"), F.col("event_id").alias("spine_id")
    )
    j = band_join_bucketed(
        spine,
        ev.drop("event_id"),
        keys="user_id",
        spine_ts="sts",
        event_ts="ets",
        band_us=7 * 24 * 3_600_000_000,
        direction="backward",
    )
    age_h = F.floor(
        (F.unix_micros(F.col("sts")) - F.unix_micros(F.col("ets"))) / F.lit(3_600_000_000)
    ).cast("int")
    wtab = F.expr("array(" + ",".join(str(w) for w in _DECAY_MICRO) + ")")
    term = F.col("cents") * F.element_at(wtab, age_h + F.lit(1))
    return j.groupBy(
        "user_id",
        _US(F.col("sts")).alias("ts_us"),
        "spine_id",
    ).agg(
        F.count(F.col("cents")).alias("n_events"),
        F.coalesce(F.sum(term), F.lit(0)).cast("long").alias("decayed_micro"),
    )


def q_f16b_label_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """f16's forward label window with NO JOIN AT ALL: the spine rows are
    a subset of events, so a value-based range frame over ts_us —
    rangeBetween(+1us, +7d] per user — computes every event's forward
    purchase count/sum in ONE shuffle + sort, then the spine filter keeps
    the label rows. Window-frame evaluation is incremental (the frame
    slides; rows are added/removed from running aggregates), so the cost
    is O(n log n) for the sort, NOT the band join's density² pair
    generation — this is the true scale-out for label windows whose
    aggregate is sum/count (f13's union trick, pointed forward). The
    decay-table variant (f15) cannot ride one frame — its weight depends
    on the spine-event age — which is why it gets the bucketed band join
    instead. Same semantics, same oracle as f16."""
    sev = 7 * 24 * 3_600_000_000
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    ).withColumn("ts_us", _US("ts"))
    w = Window.partitionBy("user_id").orderBy("ts_us").rangeBetween(1, sev)
    is_buy = (F.col("event_type") == "purchase").cast("long")
    n_buys = F.coalesce(F.sum(is_buy).over(w), F.lit(0))
    buy_cents = F.coalesce(
        F.sum(F.when(F.col("event_type") == "purchase", F.col("cents"))).over(w), F.lit(0)
    )
    out = ev.select(
        "user_id",
        "ts_us",
        "event_id",
        n_buys.alias("n_future_purchases"),
        (n_buys > 0).alias("label_converted"),
        buy_cents.cast("long").alias("future_purchase_cents"),
    ).filter(F.col("event_id") % 10 == 0)
    return out.select(
        "user_id",
        "ts_us",
        F.col("event_id").alias("spine_id"),
        "n_future_purchases",
        "label_converted",
        "future_purchase_cents",
    )


def q_sd2_running_state_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible witness for the applyInPandasWithState running-
    features operator (streaming/stateful.py): the events are split into
    two parquet files (event_id parity) and streamed through the REAL
    stateful fold with maxFilesPerTrigger=1 — two micro-batches with
    state carry-over — into a memory sink; the final per-user snapshot
    (highest running count) is returned. Every accumulated quantity is
    deterministic: values are integer cents in doubles (sums exact below
    2^53, order-free) and the "last" row tie-breaks on (ts_us, event_id),
    so the DuckDB oracle replays the fold as one batch groupBy + a
    row_number window — the round-2 verdict's missing oracle-checked twin
    for the stateful streaming surface."""
    from .streaming.ingest import stream_events
    from .streaming.stateful import streaming_running_features

    d = _scratch_dir("sd2_feed", sf_dir)
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("double").alias("value"),
        "props",
    )
    _write_ordered_feed(
        d,
        ev.filter(F.col("event_id") % 2 == 0),
        ev.filter(F.col("event_id") % 2 == 1),
    )
    stream = stream_events(spark, d)
    q = (
        streaming_running_features(stream)
        .writeStream.format("memory")
        .queryName("sd2_running")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()
    snap = spark.table("sd2_running")
    return snap.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("sum_value", "n_events").alias("sum_cents"),
        F.max_by("last_ts_us", "n_events").alias("last_ts_us"),
        F.max_by("last_value", "n_events").alias("last_cents"),
        F.max_by("last_event_id", "n_events").alias("last_event_id"),
    )


def q_f8_version_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Register v1 (full) + v2 (purchases only), then time-travel to v1.
    Oracle: v1 == the plain events projection."""
    from .store import FeatureStore

    feats = events_features(spark, sf_dir).drop("__row_id__")
    fs = FeatureStore(spark, storage_path=_scratch_dir("ver_store", sf_dir))
    fs.register("ev", feats)
    fs.register("ev", feats.filter(F.col("event_type") == "purchase"))
    v1 = fs.get_version("ev", 1)
    return v1.select(
        F.col("entity_id").alias("user_id"),
        "event_id",
        _US("timestamp").alias("ts_us"),
        "event_type",
        "value",
    )


# --------------------------------------------------------------------------- #
# Joins over the star schema
# --------------------------------------------------------------------------- #


def q_f6b_pit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIT on a different domain: each customer's latest order strictly
    before 1998 (entity=o_custkey, ts=o_orderdate; ties broken by min
    orderkey via the __row_id__ convention)."""
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("entity_id"),
        # parquet ms-timestamps surface as TIMESTAMP_NTZ; cast to session-TZ
        # timestamp (UTC pinned, so values are unchanged)
        F.col("o_orderdate").cast("timestamp").alias("timestamp"),
        "o_orderkey",
        "o_totalprice",
        F.col("o_orderkey").alias("__row_id__"),
    )
    out = temporal_filter(orders, "1997-12-31 23:59:59")
    out = latest_per_entity(out)
    return out.select(
        F.col("entity_id").alias("o_custkey"),
        _US("timestamp").alias("order_ts_us"),
        "o_orderkey",
        "o_totalprice",
    )


def q_f7c_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a bounded lookback (tolerance=48h): spine rows whose
    nearest feature is older than the window get dropped."""
    feats = events_features(spark, sf_dir)
    dates = spark.createDataFrame(
        [("2024-01-05",), ("2024-01-20",)], ["d"]
    ).select(F.col("d").cast("timestamp").alias("timestamp"))
    spine = feats.select("entity_id").distinct().crossJoin(dates)
    out = asof_join(
        spine, feats, strategy="union", keep_spine_ts=True,
        tolerance_seconds=48 * 3600,
    )
    return out.select(
        F.col("entity_id").alias("user_id"),
        "event_id",
        _US("timestamp").alias("ts_us"),
        "value",
        _US("as_of_timestamp").alias("as_of_us"),
    )


def q_f10_sql_over_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog bridge: register a feature table, expose it as a temp view,
    and answer with spark.sql — the SQL surface over the store."""
    from .store import FeatureStore

    feats = events_features(spark, sf_dir).drop("__row_id__")
    fs = FeatureStore(spark)
    fs.register("ev_sql", feats)
    fs.create_view("ev_sql")
    return fs.sql(
        """
        SELECT event_type, COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS sum_value
        FROM ev_sql GROUP BY event_type
        """
    )


def q_j1_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim-to-fact star join; region/nation are tiny -> explicit broadcast."""
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    out = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
    )
    return out


def q_j2_join_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact equi join (orders x lineitem) + aggregation."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_revenue"
            ),
        )
    )


def q_j3_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti join surface: customers with >=1 open order vs none."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    with_open = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey"
    ).withColumn("has_open", F.lit(1))
    without = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey"
    ).withColumn("has_open", F.lit(0))
    return with_open.unionByName(without)


# --------------------------------------------------------------------------- #
# Aggregations / windows
# --------------------------------------------------------------------------- #


def q_a1_agg_entity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
    )


_7D_US = 7 * 24 * 3600 * 1_000_000


def q_a2_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing 7-day count/sum per user — the README's motivating
    'txn count 7d' feature (reference README.md:75-76) as a range window."""
    ev = table(spark, sf_dir, "events").withColumn("ts_us", _US("ts"))
    w = Window.partitionBy("user_id").orderBy("ts_us").rangeBetween(-_7D_US, 0)
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        F.count("*").over(w).alias("cnt_7d"),
        F.round(F.sum("value").over(w), 2).alias("sum_7d"),
    )


def q_a3_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


def q_a4_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct with an oracle-checkable contract: the HLL
    estimate itself is engine-specific (DuckDB's sketch differs), so the
    output carries the EXACT distinct count plus a ``within_tolerance``
    boolean (|approx-exact|/exact <= 5*rsd); the DuckDB twin computes the
    exact count and literal TRUE — a deterministic hash match that still
    fails if Spark's estimator drifts outside its accuracy bound."""
    ev = table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            / F.col("exact_users")
            <= F.lit(0.10)
        ).alias("within_tolerance"),
    )


def q_a5_cube_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


def q_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "sum_disc_price"
        ),
        F.round(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            ),
            2,
        ).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


# --------------------------------------------------------------------------- #
# Sorts / top-k / set ops
# --------------------------------------------------------------------------- #


def q_s1_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def q_s2_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    out = top_k_per_group(
        orders,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
    )
    return out.select("o_custkey", "o_orderkey", "o_totalprice")


def q_u1_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_mktsegment")
    b = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey", "c_mktsegment")
    return a.unionByName(b).distinct()


# --------------------------------------------------------------------------- #
# X-ops: JSON, text, dedup, similarity, sessionize, streaming-equivalent
# --------------------------------------------------------------------------- #


def q_x5_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("long")
    )
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("k").alias("sum_k"),
        F.round(F.avg("k"), 4).alias("avg_k"),
    )


def q_x3_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: keep the minimum doc_id per distinct
    normalized text (SURVEY §2.4 X3)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.withColumn("h", F.md5(F.lower(F.trim(F.col("text")))))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_copies"))
        .select("doc_id", "n_copies")
    )


def q_x4_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(F.split(F.col("text"), " "))
    )
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.sum(F.col("n_tokens").cast("long")).alias("total_tokens"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
    )


def q_t1_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-free stopword-ratio language heuristic (deterministic,
    SQL-expressible on both engines)."""
    stop = ["the", "a", "of", "and", "in", "to", "is"]
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    hits = F.size(F.filter(toks, lambda t: t.isin(stop)))
    ratio = hits / F.size(toks)
    return docs.select(
        "doc_id",
        F.round(ratio, 6).alias("stop_ratio"),
        F.when(ratio > 0.05, F.lit("en")).otherwise(F.lit("unk")).alias("pred_lang"),
    )


def q_t2_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality: token count, distinct-token ratio, chars/token,
    stopword ratio (functions/text.stopword_ratio — the C4/Gopher-style
    natural-language signal: too low means word salad, too high means
    boilerplate)."""
    from .functions.text import stopword_ratio

    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(n_uniq / n_tok, 6).alias("uniq_ratio"),
        F.round(F.col("n_chars") / n_tok, 6).alias("chars_per_token"),
        F.round(stopword_ratio(F.col("text"), STOPWORDS), 6).alias("stopword_ratio"),
    )


def q_t4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document fingerprint: md5 over the first 8 sorted
    distinct tokens (a cheap, order-insensitive content signature)."""
    docs = table(spark, sf_dir, "documents")
    sig = F.md5(
        F.concat_ws(
            " ", F.slice(F.array_sort(F.array_distinct(F.split(F.col("text"), " "))), 1, 8)
        )
    )
    return docs.select("doc_id", sig.alias("fingerprint"))


def _cosine(a, b):  # double-precision cosine over two array<double> columns
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, x: s + x * x))
    return dot / (na * nb)


def q_x1_knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k vs query vec_id=0 — the exact-ANN baseline.
    At scale: broadcast the query, one scan, partial top-k per partition."""
    emb = table(spark, sf_dir, "embeddings").withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    out = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .withColumn("sim", _cosine(F.col("v"), F.col("qv")))
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(10)
    )
    return out.select("vec_id", "label", F.round("sim", 6).alias("sim"))


def q_x2_similar_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-candidate same-label pairs with cosine >= 0.35. The self-join
    blocks on the compound key (label, sign-LSH bucket): the bucket comes
    from rp_lsh_bucketize (map-only, deterministic seeded hyperplanes), so
    block cardinality scales with 2^bits instead of the 10-value label
    alone — within-block work is bounded at n/(10*2^bits) rows per block
    rather than n/10 (round-2 verdict's scale-killer fix). The DuckDB
    oracle applies the identical compound predicate with the hyperplanes
    inlined as SQL literals (same fold order — the x8 recipe), keeping the
    check exact. Norms are computed once per vector BEFORE the self-join;
    dot/(na*nb) stays bit-identical to the oracle's."""
    from .functions.vector import dot as _dot
    from .functions.vector import l2_norm
    from .operators.similarity import rp_lsh_bucketize
    from .operators.util import ensure_parallelism

    emb = ensure_parallelism(table(spark, sf_dir, "embeddings")).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    emb = rp_lsh_bucketize(emb, dim=64, bits=4, seed=42, vec_col="v", bucket_col="bucket")
    emb = emb.withColumn("nv", l2_norm(F.col("v")))
    a = emb.alias("a")
    b = emb.alias("b")
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).withColumn("sim", _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nv") * F.col("b.nv")))
    return pairs.filter(F.col("sim") >= 0.35).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.col("a.label").alias("label"),
        F.round("sim", 6).alias("sim"),
    )


_30MIN_US = 30 * 60 * 1_000_000


def q_x7_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization per user (batch; the streaming variant
    uses session_window — see streaming/)."""
    ev = table(spark, sf_dir, "events").withColumn("ts_us", _US("ts"))
    w = Window.partitionBy("user_id").orderBy("ts_us")
    gapped = ev.withColumn(
        "new_sess",
        F.when(
            (F.col("ts_us") - F.lag("ts_us").over(w)) > _30MIN_US, 1
        ).otherwise(F.when(F.lag("ts_us").over(w).isNull(), 1).otherwise(0)),
    )
    sess = gapped.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


def q_w1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day window agg — the batch equivalent of the streaming
    ingest path (streaming/ runs the same plan via readStream)."""
    ev = table(spark, sf_dir, "events")
    out = ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    return out.select(
        _US(F.col("w.start")).alias("window_start_us"), "event_type", "n_events", "sum_value"
    )


def q_a6_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-over-event deltas (lag/lead window functions).
    event_id tie-breaks the ordering: two same-user events on the same
    microsecond would otherwise make delta_prev/delta_next depend on
    partitioning."""
    ev = table(spark, sf_dir, "events").withColumn("ts_us", _US("ts"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta_prev"),
        F.round(F.lead("value").over(w) - F.col("value"), 2).alias("delta_next"),
    )


_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def q_p1_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event counts per user into one column per event type."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _EVENT_TYPES)
    )


def q_w2_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 7-day window (1-day slide) counts per event_type — each event
    contributes to 7 windows; Spark aligns window starts to epoch days."""
    ev = table(spark, sf_dir, "events")
    out = ev.groupBy(F.window("ts", "7 days", "1 day").alias("w"), "event_type").agg(
        F.count("*").alias("n_events")
    )
    return out.select(
        _US(F.col("w.start")).alias("window_start_us"), "event_type", "n_events"
    )


def q_x7b_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session summary via the sessionize operator."""
    from .operators.sessionize import session_stats

    ev = table(spark, sf_dir, "events")
    return session_stats(ev, entity_col="user_id", ts_col="ts", gap_minutes=30)


def q_m1_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing end-to-end: encode text as a binary payload,
    run the (deterministic-fake) image decode kernel through mapInPandas.
    The fake header is sha256-derived, so DuckDB can replicate it —
    a cross-engine check of the whole Arrow batch path."""
    from .multimodal import attach_binary_payload, decode_image_stub
    from .operators.util import ensure_parallelism

    docs = ensure_parallelism(table(spark, sf_dir, "documents"))
    payload = attach_binary_payload(docs.select("doc_id", "text"), "text")
    decoded = decode_image_stub(payload, deterministic_fake=True)
    return decoded.select(
        "doc_id",
        F.col("media_meta.byte_len").alias("byte_len"),
        "width",
        "height",
        "n_channels",
    )


def q_m3_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image feature extraction through the Arrow/mapInPandas path: binary
    payload -> 16-dim unit feature vector (stub kernel; a real model call
    has the identical batch shape). The stub is sha256-derived, so the
    DuckDB oracle reproduces the EXACT float32 vector (hex-byte
    extraction, same fold order, REAL cast); the query emits the first
    four components quantized to 1e-4 — a value-level cross-engine check
    of the full Python/Arrow float path, not just row counts."""
    from .multimodal import attach_binary_payload, extract_image_features
    from .operators.util import ensure_parallelism

    docs = ensure_parallelism(table(spark, sf_dir, "documents"))
    payload = attach_binary_payload(docs.select("doc_id", "text"), "text")
    feats = extract_image_features(payload, dim=16)
    qcols = [
        F.floor(
            F.element_at("features", k + 1).cast("double") * 10000 + F.lit(0.5)
        )
        .cast("long")
        .alias(f"q{k}")
        for k in range(4)
    ]
    return feats.select(
        "doc_id",
        F.size("features").alias("dim"),
        *qcols,
    )


def q_x6_dedup_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidate pairs on documents, on the PORTABLE
    hash family (md5 base + affine reseeding, operators/dedup.py
    MINHASH_A/B/P): the DuckDB oracle regenerates signatures, band
    buckets and the candidate join bit-for-bit — a full value-level check
    of the LSH pipeline (round 1 was rows-only on xxhash64 seeds).
    Production keeps hash_family="xxhash64" (same plan, faster hash)."""
    from .operators.dedup import dedup_minhash_lsh

    docs = table(spark, sf_dir, "documents")
    return dedup_minhash_lsh(docs, num_hashes=16, bands=4, hash_family="md5_affine")


def q_x6b_jaccard_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidates verified with exact shingle Jaccard >= 0.5 (same
    portable hash family as x6, so the oracle replicates candidates AND
    the verify arithmetic)."""
    from .operators.dedup import dedup_minhash_lsh, ngram_jaccard

    docs = table(spark, sf_dir, "documents")
    pairs = dedup_minhash_lsh(docs, num_hashes=16, bands=4, hash_family="md5_affine")
    out = ngram_jaccard(docs, pairs, threshold=0.5)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_x8_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 neighbors of vec 0 via sign-LSH buckets. Round
    2: exact oracle — the seeded hyperplanes are inlined into the DuckDB
    SQL as literals with the identical fold order, so bucket membership,
    the multiprobe candidate set, and the final top-k all hash-match."""
    from .operators.similarity import knn_lsh, rp_lsh_bucketize

    emb = table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    bucketed = rp_lsh_bucketize(emb, dim=64, bits=6)
    out = knn_lsh(bucketed, qvec, dim=64, k=10, bits=6, multiprobe=2)
    return out.select("vec_id", F.round("sim", 6).alias("sim"))


def q_x9_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signatures + duplicate groups on the PORTABLE 60-bit hash
    (md5-derived; operators/dedup.py hash_family="md5_60"): the DuckDB
    oracle recomputes every signature bit with relational per-bit vote
    counts — a different algorithm (64 conditional sums) than the SWAR
    lane fold, so the check also guards the SWAR decode. Production
    keeps xxhash64 (round 1 was rows-only on it)."""
    from .operators.dedup import dedup_simhash

    docs = table(spark, sf_dir, "documents")
    return dedup_simhash(docs, hash_family="md5_60")


# --------------------------------------------------------------------------- #
# Analytics: TPC-H-style multi-join/agg benchmarks, range join, percentiles
# --------------------------------------------------------------------------- #


def q_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: revenue of not-yet-shipped orders for one market
    segment, top-10 by revenue. Plan: the filtered customer key set is
    broadcast; lineitem<->orders shuffle on orderkey; the limit runs as
    TakeOrderedAndProject (per-partition top-k + merge, no global sort)."""
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-06-01")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-06-01")
    j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    )
    out = j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )
    return (
        out.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            _US(F.col("o_orderdate").cast("timestamp")).alias("o_orderdate_us"),
            "o_orderpriority",
        )
    )


def q_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where the lineitem's supplier and
    the ordering customer share a nation inside one region. Five-way join:
    region/nation broadcast, the fact joins shuffle on their keys, AQE free
    to re-plan at runtime."""
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    j = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return j.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count("*").alias("n_lineitems"),
    )


def q_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate. Every predicate reaches
    the parquet reader (PushedFilters); partial agg per partition then a
    single-row merge — zero shuffle of data rows at any scale."""
    li = table(spark, sf_dir, "lineitem")
    out = li.filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return out.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        F.count("*").alias("n_items"),
    )


def q_r1_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi range join: orders against a tiny quarter-calendar dim
    (q_start <= o_orderdate < q_end). The dim is broadcast so Spark runs a
    BroadcastNestedLoopJoin — the right plan at any fact scale (the fact
    side streams; only the 8-row dim is replicated). Dim timestamps are cast
    to TIMESTAMP_NTZ so the big side needs no per-row cast."""
    rows = []
    for y in (1996, 1997):
        for qi, m in enumerate((1, 4, 7, 10), start=1):
            end_y, end_m = (y, m + 3) if m < 10 else (y + 1, 1)
            rows.append((f"{y}Q{qi}", f"{y}-{m:02d}-01", f"{end_y}-{end_m:02d}-01"))
    quarters = spark.createDataFrame(rows, ["quarter", "q_start", "q_end"]).select(
        "quarter",
        F.col("q_start").cast("timestamp_ntz").alias("q_start"),
        F.col("q_end").cast("timestamp_ntz").alias("q_end"),
    )
    orders = table(spark, sf_dir, "orders")
    j = orders.join(
        F.broadcast(quarters),
        (F.col("o_orderdate") >= F.col("q_start")) & (F.col("o_orderdate") < F.col("q_end")),
    )
    return j.groupBy("quarter").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


def q_d1_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar date-kernel coverage: trunc, year/quarter, day-of-week,
    datediff — all whole-stage-codegen expressions over one scan."""
    orders = table(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("timestamp")
    return orders.select(
        "o_orderkey",
        _US(F.date_trunc("month", od)).alias("month_us"),
        F.year(od).alias("yr"),
        F.quarter(od).alias("qtr"),
        F.dayofweek(od).alias("dow"),
        F.datediff(F.lit("1999-01-01").cast("date"), od.cast("date")).alias("days_to_1999"),
    )


def q_a7_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of account balance per market segment
    (Spark ``percentile`` == DuckDB ``quantile_cont``, both linear
    interpolation). The exact twin of a4's approx_count_distinct scale
    story: exact here, ``percentile_approx`` at 100 TB."""
    cust = table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.round(F.expr("percentile(c_acctbal, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(c_acctbal, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(c_acctbal, 0.75)"), 4).alias("p75"),
        F.round(F.avg("c_acctbal"), 4).alias("mean_bal"),
    )


def q_g1_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((rf), (ls), ()) with grouping() null-markers —
    complements a5's cube/rollup (one expand + one shuffle)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []], "l_returnflag", "l_linestatus"
    ).agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.grouping("l_returnflag").cast("int").alias("g_rf"),
        F.grouping("l_linestatus").cast("int").alias("g_ls"),
    )


def q_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers whose single order exceeds a quantity
    threshold (HAVING over a grouped sum, semi-joined back to the facts).
    The HAVING subquery output (few keys) broadcasts into the main join."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
        .select("l_orderkey")
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    j = (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
    )
    return j.groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice").agg(
        F.round(F.sum("l_quantity"), 2).alias("total_qty")
    )


def q_a2b_multi_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The README-motivating features ('avg txn 30d', 'count 7d') computed
    in ONE pass: two range frames share the same partitionBy/orderBy, so
    Spark sorts once and evaluates both frames over the same shuffle."""
    ev = (
        table(spark, sf_dir, "events")
        .withColumn("ts_us", _US("ts"))
        # sum exact integer cents: sliding-window sums of doubles differ in
        # the last ulp between engines (incremental vs recomputed), which
        # flips 4dp rounding; integer sums are order-independent
        .withColumn("cents", F.round(F.col("value") * 100).cast("long"))
    )
    day_us = 24 * 3600 * 1_000_000
    w7 = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-7 * day_us, 0)
    )
    w30 = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-30 * day_us, 0)
    )
    # fixed-point average: (cents*100) div count — pure integer arithmetic,
    # immune to the Spark-vs-DuckDB ROUND(double) half-value disagreement
    # (Spark HALF_UPs the decimal repr, DuckDB rounds the binary double)
    s30 = F.sum("cents").over(w30) * 100
    c30 = F.count("*").over(w30)
    avg_e4 = ((s30 - (s30 % c30)) / c30).cast("long")
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        F.count("*").over(w7).alias("cnt_7d"),
        F.round(F.sum("cents").over(w7) / 100.0, 2).alias("sum_7d"),
        c30.alias("cnt_30d"),
        avg_e4.alias("avg_30d_e4"),
    )


def q_t3_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex tokenizer (BPE-ish alnum runs) per document: total and distinct
    token counts — JVM-side regexp/array kernels, no UDF."""
    docs = table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z0-9]+"), F.lit(0))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    )


def q_x11_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (threshold 0.40 — the
    synthetic vectors have no true dups; this exercises the operator),
    BLOCKED on the compound key (label, sign-LSH bucket). Round-2 blocked
    on label alone — 10 distinct values, so each block was still n/10
    rows and the within-block quadratic merely deferred. The bucket from
    rp_lsh_bucketize is map-only and deterministic with cardinality
    2^bits independent of corpus size, so the block key now scales with
    the data. The DuckDB oracle applies the identical compound predicate
    (hyperplanes inlined as literals, x8 recipe), keeping the check
    exact."""
    from .operators.dedup import dedup_embedding_cosine
    from .operators.similarity import rp_lsh_bucketize

    emb = table(spark, sf_dir, "embeddings")
    emb = rp_lsh_bucketize(emb, dim=64, bits=4, seed=42, bucket_col="bucket")
    out = dedup_embedding_cosine(emb, threshold=0.40, block_col=["label", "bucket"])
    return out.select("id_a", "id_b", F.round("sim", 6).alias("sim"))


def q_m2_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: deterministic fake frame count from
    payload length, every-30th-frame sample indices as array<int> — the
    Spark-side schema/batch shape is real, the codec is stubbed."""
    from .multimodal import attach_binary_payload
    from .multimodal.columns import frame_sample_stub

    docs = table(spark, sf_dir, "documents")
    payload = attach_binary_payload(docs.select("doc_id", "text"), "text", media_type="video")
    out = frame_sample_stub(payload, every_n=30)
    return out.select(
        "doc_id",
        F.col("media_meta.byte_len").alias("byte_len"),
        F.size("sampled_frames").alias("n_sampled"),
        F.element_at("sampled_frames", -1).alias("last_frame_idx"),
    )


def q_u2_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-op surface: customers with orders in BOTH 1996 and 1997
    (INTERSECT) minus any customer with an urgent 1997 order (EXCEPT)."""
    orders = table(spark, sf_dir, "orders")
    y96 = orders.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_custkey")
    y97 = orders.filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_custkey")
    urgent97 = orders.filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
        & (F.col("o_orderpriority") == "1-URGENT")
    ).select("o_custkey")
    return y96.intersect(y97).exceptAll(urgent97.distinct())


def q_io1_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source/sink format coverage: project events, write CSV with a header,
    read it back with an explicit schema, aggregate. Proves the non-parquet
    I/O path end-to-end; the oracle sees only the logical result."""
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.col("value").cast("double").alias("value")
    )
    d = _scratch_dir("io1_csv", sf_dir)
    ev.write.mode("overwrite").option("header", "true").csv(d)
    back = (
        spark.read.option("header", "true")
        .schema("event_id long, user_id long, event_type string, value double")
        .csv(d)
    )
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
    )


def q_io7_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record ingest accounting: a CSV feed where every row
    whose event_id % 97 == 0 is corrupted (non-numeric id). PERMISSIVE
    mode parses what it can, routes the rest to _corrupt_record, and the
    aggregate reports good/corrupt counts plus sums over the clean rows —
    the quarantine pattern every 100 TB ingest needs (fail-fast mode
    would abort the whole feed for one bad producer)."""
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("value").cast("double").alias("value")
    )
    # corrupt deterministically: event_id -> 'bad<id>' (unparseable long)
    lines = ev.select(
        F.concat_ws(
            ",",
            F.when(F.col("event_id") % 97 == 0, F.concat(F.lit("bad"), "event_id"))
            .otherwise(F.col("event_id").cast("string")),
            F.col("user_id").cast("string"),
            F.round(F.col("value"), 2).cast("string"),
        ).alias("value")
    )
    d = _scratch_dir("io7_badcsv", sf_dir)
    lines.coalesce(4).write.mode("overwrite").text(d)
    back = (
        spark.read.schema(
            "event_id long, user_id long, value double, _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(d)
    )
    return back.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("_corrupt_record").isNotNull().cast("long")).alias("n_corrupt"),
        F.sum(F.col("event_id").isNotNull().cast("long")).alias("n_good"),
        F.round(F.sum(F.when(F.col("_corrupt_record").isNull(), F.col("value"))), 2).alias(
            "sum_good_value"
        ),
    )


def q_h1_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup: hour/day/month continuous
    aggregates in ONE scan via GROUPING SETS over pre-truncated buckets
    (one expand + one shuffle; the streaming twin maintains the same
    rollup incrementally via foreachBatch)."""
    ev = table(spark, sf_dir, "events")
    bucketed = ev.select(
        _US(F.date_trunc("hour", "ts")).alias("hour_us"),
        _US(F.date_trunc("day", "ts")).alias("day_us"),
        _US(F.date_trunc("month", "ts")).alias("month_us"),
        "value",
    )
    return bucketed.groupingSets(
        [["hour_us"], ["day_us"], ["month_us"]], "hour_us", "day_us", "month_us"
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def q_io2_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON source/sink coverage: write a projection as JSON lines, read it
    back with an explicit schema, aggregate. The props column round-trips
    as a raw JSON string and is re-parsed with get_json_object."""
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "props")
    d = _scratch_dir("io2_json", sf_dir)
    ev.write.mode("overwrite").json(d)
    back = (
        spark.read.schema("event_id long, user_id long, event_type string, props string")
        .json(d)
        .withColumn("k", F.get_json_object("props", "$.k").cast("long"))
    )
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("k").alias("sum_k"),
        F.min("event_id").alias("min_event_id"),
    )


def q_x10_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse-quantize every vector onto 16 deterministic
    centroids (the 16 lowest vec_ids), probe the 2 cells nearest the query
    (vec 100), exact top-10 inside the probed cells only. At 100 TB the
    assignment is a write-time map-only pass (broadcast centroids, max_by
    argmax — no shuffle) and the probe predicate prunes ~7/8 of the scan."""
    from .operators.similarity import ivf_assign, knn_ivf

    emb = table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 100).collect()[0]["embedding"]]
    assigned = ivf_assign(emb, cents).filter(F.col("vec_id") != 100)
    out = knn_ivf(assigned, cents, qvec, k=10, nprobe=2)
    return out.select("vec_id", F.round("sim", 6).alias("sim"))


def q_a8_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-function family coverage: rank / dense_rank / percent_rank /
    cume_dist / ntile over one window spec (per-customer order history,
    (date, orderkey) total order so every rank is deterministic). One
    shuffle + one sort serves all five functions."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.filter(F.col("o_custkey") < 500).select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
    )


def q_t5_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string-kernel coverage: case mapping, replace, concat_ws,
    substring, reverse, regexp_extract, levenshtein — all JVM codegen
    expressions over one scan of part (no shuffle at any scale)."""
    part = table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_up"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_us"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 4).alias("name4"),
        F.reverse("p_type").alias("type_rev"),
        F.regexp_extract("p_brand", "#([0-9]+)", 1).alias("brand_num"),
        F.levenshtein("p_brand", F.lit("Brand#10")).alias("lev_b10"),
        F.length("p_name").alias("name_len"),
    )


def q_io3_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink+source roundtrip (columnar alternative to parquet): project
    lineitem, write ORC, read back, aggregate. Predicate pushdown and
    column pruning work on the ORC reader the same as parquet."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"
    )
    d = _scratch_dir("io3_orc", sf_dir)
    li.write.mode("overwrite").orc(d)
    back = spark.read.orc(d).filter(F.col("l_quantity") >= 25)
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
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


def q_x14_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative distributed algorithm: 2 Lloyd iterations of k-means
    (k=8) over the embeddings table on an INTEGER grid
    (operators/clustering.py kmeans_quantized). Driver holds only the
    k x 64 model; every pass is one scan (broadcast centroids) plus one
    k*dim partial-agg shuffle. Round 3: EXACT oracle — integer distances
    and floor-division centroid updates are order-independent, so DuckDB
    replays the identical fixpoint with unrolled CTEs (float Lloyd was
    rows-only: cross-row float sums depend on reduction order)."""
    from .operators.clustering import kmeans_quantized

    # cache: Lloyd re-reads the input 2x per iteration (update + next
    # assign); at cluster scale this is the same "persist the training
    # set" decision every iterative fit makes.
    emb = table(spark, sf_dir, "embeddings").cache()
    assigned, _ = kmeans_quantized(emb, k=8, max_iter=2)
    return assigned.groupBy("cluster").agg(
        F.count("*").alias("n_vecs"),
        F.min("vec_id").alias("min_vec"),
        F.sum("dist2").alias("inertia_q"),
    )


def q_ts1_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill + forward-fill onto a regular daily grid — the classic
    'features at fixed cadence' transform (resample in pandas terms,
    done distributed). sequence+explode builds the 31-day spine, the
    per-day agg is partial-agg'd, and the fill is last(ignorenulls)
    over (user, day) — one window shuffle; the user x day grid is a
    broadcast-able cross join of |users| x 31."""
    ev = table(spark, sf_dir, "events")
    days = spark.sql(
        "SELECT explode(sequence(DATE'2024-01-01', DATE'2024-01-31')) AS day"
    )
    users = ev.select("user_id").distinct()
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.round(F.max("value"), 2).alias("v_day"),
        F.count("*").alias("n_ev"),
    )
    grid = users.crossJoin(F.broadcast(days))
    j = grid.join(daily, ["user_id", "day"], "left_outer")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        "user_id",
        _US(F.col("day").cast("timestamp")).alias("day_us"),
        F.coalesce("n_ev", F.lit(0)).alias("n_events"),
        F.last("v_day", ignorenulls=True).over(w).alias("v_ffill"),
    )


def q_ts2_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-grid resample with LINEAR INTERPOLATION between observations
    (ts1's sibling: ffill holds the last value; interpolation estimates
    between surrounding points — no extrapolation before the first).
    Same one-window-shuffle shape as ts1: carry (prev day, prev value)
    backward and (next day, next value) forward with ignorenulls window
    functions, then a closed-form blend. Values in integer cents and
    day indices as integers: the blend is the only float op and both
    engines evaluate the identical expression."""
    ev = table(spark, sf_dir, "events").withColumn(
        "cents", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    )
    days = spark.sql(
        "SELECT explode(sequence(0, 30)) AS day_idx"
    )
    users = ev.select("user_id").distinct()
    daily = (
        ev.withColumn(
            "day_idx", F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        )
        .filter((F.col("day_idx") >= 0) & (F.col("day_idx") <= 30))
        .groupBy("user_id", "day_idx")
        .agg(F.max("cents").cast("double").alias("obs"))
    )
    grid = users.crossJoin(F.broadcast(days))
    j = grid.join(daily, ["user_id", "day_idx"], "left_outer")
    wp = (
        Window.partitionBy("user_id")
        .orderBy("day_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # next-observation carry via the REVERSED running frame (same value
    # as first(ignorenulls) over [0, UNBOUNDED FOLLOWING), but O(n) —
    # Spark's following frame re-aggregates the suffix per row; see
    # operators/asof.py's forward carry). day_idx is unique per user on
    # the grid, so no tie-break is needed.
    wn = (
        Window.partitionBy("user_id")
        .orderBy(F.col("day_idx").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    gated_day = F.when(F.col("obs").isNotNull(), F.col("day_idx"))
    j = (
        j.withColumn("pd", F.last(gated_day, ignorenulls=True).over(wp))
        .withColumn("pv", F.last("obs", ignorenulls=True).over(wp))
        .withColumn("nd", F.last(gated_day, ignorenulls=True).over(wn))
        .withColumn("nv", F.last("obs", ignorenulls=True).over(wn))
    )
    blend = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.col("day_idx") - F.col("pd")) / (F.col("nd") - F.col("pd"))
    )
    interp = (
        F.when(F.col("obs").isNotNull(), F.col("obs"))
        .when(F.col("pv").isNull(), F.lit(None).cast("double"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(blend)
    )
    return j.select(
        "user_id",
        "day_idx",
        (~F.col("obs").isNull()).alias("observed"),
        F.round(interp, 4).alias("v_interp"),
    )


def q_f11_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 validity intervals from the append-only feature history:
    each row's value is valid [its ts, next ts) per entity — lead()
    over one window shuffle; open intervals closed with a sentinel.
    This is the batch view the PIT lookup implicitly queries."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sentinel = F.lit("9999-12-31").cast("timestamp")
    return ev.select(
        "user_id",
        "event_id",
        _US("ts").alias("valid_from_us"),
        _US(F.coalesce(F.lead("ts").over(w), sentinel)).alias("valid_to_us"),
        "value",
    )


def q_arr1_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar-kernel coverage over the embedding column: max/min,
    distinct-count, sort + element_at, position, slice, size — all JVM
    codegen expressions, one scan, no shuffle (the array never explodes)."""
    emb = table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    return emb.select(
        "vec_id",
        F.round(F.array_max(e).cast("double"), 6).alias("v_max"),
        F.round(F.array_min(e).cast("double"), 6).alias("v_min"),
        F.size(F.array_distinct(e)).alias("n_distinct"),
        F.round(F.element_at(F.sort_array(e), 2).cast("double"), 6).alias("second_min"),
        F.array_position(e, F.array_max(e)).cast("int").alias("argmax_pos"),
        F.size(e).alias("dim"),
    )


def q_h2_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of extended price: bucket = floor(x/5000) —
    a partial-agg'd groupBy over a codegen bucket expression; the
    building block of every profiling / data-quality sweep."""
    li = table(spark, sf_dir, "lineitem")
    bucket = F.floor(F.col("l_extendedprice") / 5000).cast("long")
    return li.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_discount"),
    )


def q_a9_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family per group: corr, covar_samp,
    stddev_samp, var_samp, skewness, kurtosis — all single-pass
    moment-based aggregates with map-side partial merge (Welford-style
    combiners), so one shuffle of k moment tuples regardless of scale.
    Higher moments rounded 4dp: both engines use one-pass moment
    formulas whose last ulp differs with summation order."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
        F.round(F.var_samp("l_discount"), 6).alias("var_discount"),
        F.round(F.skewness("l_extendedprice"), 4).alias("skew_price"),
        F.round(F.kurtosis("l_extendedprice"), 4).alias("kurt_price"),
    )


def q_x15_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS, not just pairs: connected components by
    iterative min-label propagation over the x2 similarity edges
    (operators/dedup.py connected_components). Transitive closure is
    what turns pairwise 'a~b, b~c' into one dedup group {a,b,c}. The
    DuckDB oracle computes the same fixpoint with a recursive CTE —
    both sides are deterministic (min node id per component). Round 3:
    the edge generation blocks on (label, lsh_bucket) like x2/x11, so
    the pair join's block key has data-scaled cardinality."""
    from .operators.dedup import connected_components, dedup_embedding_cosine
    from .operators.similarity import rp_lsh_bucketize

    emb = table(spark, sf_dir, "embeddings")
    emb = rp_lsh_bucketize(emb, dim=64, bits=4, seed=42, bucket_col="bucket")
    pairs = dedup_embedding_cosine(emb, threshold=0.35, block_col=["label", "bucket"])
    comp = connected_components(pairs)
    return comp.groupBy("component").agg(
        F.count("*").alias("n_members"),
        F.max("node").alias("max_node"),
    )


def q_m4_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-user interarrival statistics via an
    Arrow-batched pandas kernel (one group = one pandas frame). The only
    Python-UDF entry point the suite's other ops don't already cover
    (mapInPandas: multimodal; applyInPandasWithState: streaming).
    Deterministic — the kernel sorts by (ts, event_id) and gaps are
    exact integer-microsecond differences scaled to seconds; 4dp
    rounding absorbs the last-ulp summation-order slack vs the oracle's
    AVG. Scale: groups are single-entity histories (fits memory by
    construction); the shuffle is the same hash partition the window
    variant would pay. Timestamps cross the Arrow boundary as int64
    epoch-us, not timestamp — measured 1.7x faster end-to-end (datetime
    dtype conversion + timedelta ops dominated the pandas kernel)."""
    import numpy as np
    import pandas as pd

    ev = table(spark, sf_dir, "events")

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_us", "event_id"])
        diffs = np.diff(pdf["ts_us"].to_numpy()) / 1e6
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "mean_gap_s": [round(float(diffs.mean()), 4) if len(diffs) else None],
                "max_gap_s": [round(float(diffs.max()), 4) if len(diffs) else None],
            }
        )

    return ev.select(
        "user_id", _US("ts").alias("ts_us"), "event_id"
    ).groupBy("user_id").applyInPandas(
        kernel, "user_id long, n_events long, mean_gap_s double, max_gap_s double"
    )


def q_t6_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral-view / UDTF surface: posexplode the token array of each
    document into (doc_id, position, token) rows — the generator runs
    inside codegen (Generate node), no Python. Row growth is bounded by
    total token count, and the downstream filter on token length is
    applied before anything shuffles (there is no shuffle at all: scan →
    generate → filter → project, embarrassingly parallel at any SF)."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    tok = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token")
    )
    return tok.filter(F.length("token") >= 7).select(
        "doc_id",
        (F.col("pos") + 1).cast("long").alias("pos"),
        "token",
    )


def q_p2_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """melt / UNPIVOT: wide per-returnflag aggregates to long
    (flag, metric, value) triples — the inverse of p1_pivot. Spark's
    unpivot is a zero-shuffle Expand node over the 3-row agg output;
    rounding happens BEFORE the melt so both engines emit identical
    doubles per metric."""
    li = table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
        F.round(F.sum("l_discount"), 2).alias("sum_disc"),
    )
    return agg.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_base", "sum_disc"], "metric", "value"
    )


def q_map1_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType scalar kernel: build a map from event fields
    (map_from_arrays), then map_filter / transform_values (higher-order
    lambdas on the JVM), element_at and map_keys — one scan, zero
    shuffle, all codegen; the oracle reproduces each lane with plain
    CASE arithmetic. Insertion order of map_from_arrays is preserved,
    so the key-join string is deterministic."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    k = F.get_json_object("props", "$.k").cast("double")
    m = F.map_from_arrays(
        F.array(F.lit("v"), F.lit("v2"), F.lit("k")),
        F.array(F.col("value"), F.col("value") * 2, k),
    )
    big = F.map_filter(m, lambda _, v: v > F.lit(10.0))
    scaled = F.transform_values(m, lambda _, v: F.round(v / 10.0, 4))
    return ev.select(
        "event_id",
        F.size(big).alias("n_big"),
        F.element_at(scaled, F.lit("v")).alias("v_scaled"),
        F.element_at(scaled, F.lit("k")).alias("k_scaled"),
        F.array_join(F.map_keys(big), ",").alias("big_keys"),
    )


def q_r2_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (the batch twin of a watermarked stream-stream
    join): every purchase within 2 hours AFTER a view by the same user.
    Equi key (user_id) + time-range residual → one shuffle on user_id,
    SMJ/hash with the band predicate evaluated as a residual; this is
    exactly the state-bounding condition Structured Streaming derives
    its stream-stream join watermark retention from
    (streaming/ingest.py stream_stream_join)."""
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
        F.col("event_id").alias("buy_id"),
    )
    j = views.join(
        buys,
        (F.col("v_user") == F.col("b_user"))
        & (F.col("b_ts") > F.col("v_ts"))
        & (F.col("b_ts") <= F.col("v_ts") + F.expr("INTERVAL 2 HOURS")),
    )
    return j.select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "buy_id",
        _US("v_ts").alias("view_us"),
        _US("b_ts").alias("buy_us"),
    )


def q_arr2_vector_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid — elementwise mean over an
    array<float> column, computed the SCALE way: one avg aggregate per
    dimension over element_at (64 JVM-side aggregates, map-side partial
    merge, ONE shuffle of 64 doubles per label). The naive rewrite —
    posexplode to (row x dim) then groupBy — shuffles |rows| x 64
    exploded rows; this plan shuffles nothing but the partial-agg
    state. Output stays long-form (label, dim, coord) for a stable
    oracle shape."""
    emb = table(spark, sf_dir, "embeddings")
    dim = 64
    cents = emb.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        *[
            F.round(F.avg(F.element_at("embedding", i + 1)), 6).alias(f"c{i}")
            for i in range(dim)
        ],
    )
    stack = (
        f"stack({dim}, "
        + ", ".join(f"{i + 1}, c{i}" for i in range(dim))
        + ") as (dim, coord)"
    )
    return cents.selectExpr("label", "n_vecs", stack).select(
        "label", "n_vecs", F.col("dim").cast("int").alias("dim"), "coord"
    )


def q_f9_diff_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version CDC through the store API (store.diff_versions): v1 = the
    first two weeks of events, v2 = re-register through Jan 20 with
    purchase values doubled — so the diff has all three change types:
    later keys are added, and purchase keys inside the v1 window are
    changed. Output is the per-change-type rollup (keys + row counts);
    the oracle recomputes the same multiset classification with its own
    hashing, so the check is of the SEMANTICS (which keys changed),
    not of any engine-specific hash. On Delta this is Change Data Feed
    read from the commit log instead of recomputed."""
    from .store import FeatureStore

    feats = events_features(spark, sf_dir).drop("__row_id__").drop("event_id")
    v1 = feats.filter(F.col("timestamp") < "2024-01-15")
    v2 = feats.filter(F.col("timestamp") < "2024-01-20").withColumn(
        "value",
        F.when(F.col("event_type") == "purchase", F.col("value") * 2).otherwise(
            F.col("value")
        ),
    )
    fs = FeatureStore(spark, storage_path=_scratch_dir("cdc_store", sf_dir))
    fs.register("ev_cdc", v1)
    fs.register("ev_cdc", v2)
    d = fs.diff_versions("ev_cdc", 1, 2)
    return d.groupBy("change_type").agg(
        F.count("*").alias("n_keys"),
        F.sum("old_rows").alias("old_rows"),
        F.sum("new_rows").alias("new_rows"),
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


def q_pipe1_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-cleaning pipeline composition — the C4-style recipe as ONE
    declarative plan: length filter (10..2000 tokens), mean-token-length
    filter (2..14 chars), exact dedup keep-first over the normalized
    text hash, then per-lang survivor stats. Catalyst fuses the filters
    into the scan; the only shuffles are the dedup window hash
    partition and the final rollup. Every stage is a column expression
    — no Python in the loop at any corpus size."""
    docs = table(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(F.split(F.col("text"), " ")).cast("long")
    )
    filtered = docs.filter(
        (F.col("n_tokens") >= 10)
        & (F.col("n_tokens") <= 2000)
        & ((F.col("n_chars") / F.col("n_tokens")).between(2.0, 14.0))
    )
    wdup = Window.partitionBy(F.md5(F.lower(F.trim(F.col("text"))))).orderBy("doc_id")
    deduped = filtered.withColumn("rn", F.row_number().over(wdup)).filter(
        F.col("rn") == 1
    )
    return deduped.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


def q_x16_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction — top-3 weighted tokens per document.
    Term frequency = grouped count over the exploded tokens; document
    frequency = second agg over the (doc, token) pairs (already unique,
    so a plain count); N arrives as a one-row broadcast cross join.
    Ranking uses the ROUNDED weight (6dp) with a token tie-break so the
    cut is identical on both engines (java.lang.Math.log and libm can
    disagree in the last ulp). Scale: two shuffles (doc-token agg,
    token agg) + one broadcast — no per-document loop, and the rank
    window partitions by doc_id, which is near-uniform."""
    docs = table(spark, sf_dir, "documents")
    ndocs = docs.agg(F.count("*").alias("n_docs"))
    tokens = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.length("token") > 0)
    tf = tokens.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    weighted = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(ndocs))
        .withColumn(
            "weight",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("weight").desc(), F.col("token").asc()
    )
    return (
        weighted.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "token", "tf", "df", "weight", F.col("rk").cast("int").alias("rk"))
    )


def q_io4_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain-text source/sink: write document bodies as line-oriented text
    files, read them back with spark.read.text, re-derive stats. The
    documents corpus is newline-free so lines == documents; proves the
    fourth non-parquet format end-to-end (CSV/JSON/ORC are io1-io3)."""
    docs = table(spark, sf_dir, "documents")
    d = _scratch_dir("io4_text", sf_dir)
    docs.select("text").write.mode("overwrite").text(d)
    back = spark.read.text(d)
    return back.agg(
        F.count("*").alias("n_lines"),
        F.sum(F.length("value")).alias("total_chars"),
        F.sum(F.size(F.split("value", " ")).cast("long")).alias("total_tokens"),
        F.min(F.length("value")).cast("long").alias("min_len"),
        F.max(F.length("value")).cast("long").alias("max_len"),
    )


def q_dq1_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality column profiler — the first pass every training-data
    pipeline runs on a new source: per column, row/null/distinct counts
    and min/max/mean, computed in ONE scan. The 4 exact countDistincts
    fold into one Expand-based aggregate (one pass over the data); the
    wide one-row result is melted to one row per column with stack() —
    a Generate over a 1-row plan, free. (A union-of-selects melt would
    let column pruning split this into 4 independent scans of the fact
    — measured and rejected.) At 100 TB the scan is the cost;
    everything else is O(1)."""
    li = table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.round(F.min(c), 4).alias(f"{c}__min"),
            F.round(F.max(c), 4).alias(f"{c}__max"),
            F.round(F.avg(c), 4).alias(f"{c}__avg"),
        ]
    row = li.agg(*aggs)
    stack = (
        f"stack({len(cols)}, "
        + ", ".join(
            f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max, {c}__avg"
            for c in cols
        )
        + ") as (col_name, n_nulls, n_distinct, min_val, max_val, avg_val)"
    )
    return row.selectExpr("n_rows", stack).select(
        "col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val", "avg_val"
    )


def q_a10_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches — THE scale pattern for distinct counts:
    build a sketch per fine-grained group (returnflag x linestatus),
    then MERGE sketches up to coarse groups (returnflag) without
    touching the raw data again. At 100 TB the fine sketches are built
    once (map-side partial agg, bytes per group) and every rollup level
    reuses them; an exact countDistinct would re-shuffle the fact per
    level. Rows-only check: the estimate is engine-specific (DuckDB's
    HLL differs), but Spark's is deterministic for fixed input."""
    li = table(spark, sf_dir, "lineitem")
    fine = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.hll_sketch_agg("l_partkey").alias("sk"),
        F.count("*").alias("n"),
    )
    merged = fine.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_parts"),
        F.sum("n").alias("n_items"),
    )
    # Oracle contract (mirrors a4): the estimate is engine-specific, so emit
    # the exact distinct count + a within_tolerance boolean instead of the
    # raw estimate. Default lgConfigK=12 gives rsd ~1.6%; 10% is a safe,
    # deterministic bound. The exact count is a second agg over the fact —
    # at scale you'd skip it (the sketches ARE the product); here it is the
    # cross-engine proof.
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts")
    )
    return (
        merged.join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            "n_items",
            "exact_parts",
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                / F.col("exact_parts")
                <= F.lit(0.10)
            ).alias("within_tolerance"),
        )
    )


def q_m5_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio lane of the multimodal surface: binary payload ->
    (sample_rate, n_samples, duration, window count) through the
    mapInPandas decode stub. The fake header is sha256/byte-length
    derived, so the DuckDB oracle replicates it exactly — cross-engine
    proof of the Arrow batch path, like m1 for images."""
    from .multimodal import attach_binary_payload, decode_audio_stub
    from .operators.util import ensure_parallelism

    docs = ensure_parallelism(table(spark, sf_dir, "documents"))
    payload = attach_binary_payload(
        docs.select("doc_id", "text"), "text", media_type="audio", fmt="wav"
    )
    decoded = decode_audio_stub(payload, deterministic_fake=True)
    return decoded.select(
        "doc_id",
        F.col("media_meta.byte_len").alias("byte_len"),
        "sample_rate",
        "n_samples",
        "duration_s",
        "n_windows",
    )


# --------------------------------------------------------------------------- #
# round-2 additions: skew-safe aggs, chunking, PII, repetition, quantization
# --------------------------------------------------------------------------- #


def q_a11_distinct_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type through the explicit SALTED
    two-stage plan (operators/agg.py count_distinct_salted): stage 1
    groups by (key, hash(value) % 32), stage 2 sums the disjoint
    per-salt counts. Same result as countDistinct — and the same skew-
    safe shuffle shape Catalyst's own distinct rewrite produces, here
    pinned explicitly (see agg.py for when the explicit form matters)."""
    from .operators.agg import count_distinct_salted

    ev = table(spark, sf_dir, "events")
    return count_distinct_salted(ev, ["event_type"], "user_id", n_salts=32)


def q_a12_quantile_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentiles from a mergeable equi-width histogram
    (operators/agg.py histogram_quantile_rollup): n_bins rows per key
    survive the shuffle regardless of fact size, and bin counts merge by
    summation for coarser rollups. Estimate = lower edge of the bin
    reaching the target rank — deterministic across engines (the oracle
    computes the identical histogram), error <= one bin width. lo/hi
    chosen so width = 64/1024 = 0.0625 is a power of two: every double
    product below is exact."""
    from .operators.agg import histogram_quantile_rollup

    li = table(spark, sf_dir, "lineitem")
    return histogram_quantile_rollup(
        li, ["l_returnflag"], "l_quantity", lo=0.0, hi=64.0, n_bins=1024,
        percentiles=(0.5, 0.95),
    )


def q_c1_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style chunking (operators/chunking.py): overlapping 16-token
    windows with 4-token overlap, map-only explode — no shuffle. md5 of
    each chunk's text proves byte-exact window extraction cross-engine."""
    from .operators.chunking import chunk_documents

    docs = table(spark, sf_dir, "documents")
    out = chunk_documents(docs, chunk_tokens=16, overlap_tokens=4)
    return out.select(
        "doc_id",
        "chunk_idx",
        "chunk_n_tokens",
        F.md5("chunk_text").alias("chunk_md5"),
    )


def q_t7_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (operators/text.py redact_pii): per-kind match counts
    + the scrubbed text's md5. The corpus is synthetic-clean, so the query
    plants one email/phone/ssn/ip per document (deterministic from doc_id)
    and the oracle plants + scrubs the identical ones with the same RE2/
    Java-compatible patterns."""
    from .operators.text import redact_pii

    docs = table(spark, sf_dir, "documents")
    planted = docs.withColumn(
        "text2",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-867-5309 ssn 123-45-6789 ip 10.0.0."),
            (F.col("doc_id") % 256).cast("string"),
        ),
    )
    out = redact_pii(planted, text_col="text2")
    return out.select(
        "doc_id",
        "pii_email_count",
        "pii_phone_count",
        "pii_ssn_count",
        "pii_ipv4_count",
        F.md5("redacted").alias("redacted_md5"),
    )


def q_t8_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filter (operators/text.py
    repetition_stats, MassiveText/Gopher-style): duplicate-line and
    top-2-gram concentration per document, map-only. Integer signals +
    a cross-multiplied threshold boolean — no float rounding anywhere
    the oracle hashes."""
    from .operators.text import repetition_stats

    docs = table(spark, sf_dir, "documents")
    out = repetition_stats(docs, ngram=2)
    return out.select(
        "doc_id", "n_lines", "dup_lines", "n_grams", "top_gram_count", "repetitious"
    )


def q_er1_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy record linkage (operators/linkage.py): customer names
    deterministically corrupted (mutate/drop/append a character keyed on
    custkey), then matched back to the clean table by levenshtein <= 2,
    best candidate per dirty row by (distance, custkey). Blocking key =
    (nation, 17-char name prefix): the prefix is STABLE under the
    corruption model (all three modes only touch the name's tail), so
    recall is unharmed while candidates drop from |nation| (~600 at
    sf0.1: 9M levenshtein pairs, measured 22s) to ~10 per record — the
    classic blocking-key design rule: derive the key from what the noise
    cannot touch. The oracle replicates block, metric and tie-break
    exactly."""
    from .operators.linkage import fuzzy_match_blocked

    cust = table(spark, sf_dir, "customer")
    corrupted = (
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(F.substring("c_name", 1, 17), F.lit("X")),
        )
        .when(F.col("c_custkey") % 3 == 1, F.substring("c_name", 1, 17))
        .otherwise(F.concat(F.col("c_name"), F.lit("Z")))
    )
    dirty = cust.select(
        F.col("c_custkey").alias("d_key"),
        corrupted.alias("c_name"),
        "c_nationkey",
    ).withColumn("name_blk", F.substring("c_name", 1, 17))
    clean = cust.select(
        "c_custkey", "c_name", "c_nationkey"
    ).withColumn("name_blk", F.substring("c_name", 1, 17))
    out = fuzzy_match_blocked(
        dirty, clean, ["c_nationkey", "name_blk"], "c_name", "c_custkey",
        max_distance=2, dirty_id_col="d_key",
    )
    return out.select(
        "d_key",
        F.col("matched_c_custkey").alias("matched_key"),
        "distance",
    )


def q_dq2_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier profile per event type (operators/agg.py
    iqr_outlier_stats): exact Q1/Q3 fences broadcast back onto the fact,
    outlier count as a map-side filter — the fact is shuffled once (for
    the percentiles), never re-shuffled for the count."""
    from .operators.agg import iqr_outlier_stats

    ev = table(spark, sf_dir, "events")
    return iqr_outlier_stats(ev, ["event_type"], "value")


def q_f13_pit_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window features as-of spine timestamps (operators/
    features.py pit_window_agg): for every 10th event (the "label" rows),
    count/sum/min/max of that user's event values over the trailing 1
    day and 7 days — computed leakage-free with union + shared-sort
    range frames (ONE shuffle for both windows and all four aggregates;
    a join formulation would explode spine x window rows). Values in
    integer cents: sums are order-independent, so the LEFT-JOIN-based
    oracle matches exactly."""
    from .operators.features import pit_window_agg

    ev = table(spark, sf_dir, "events").withColumn(
        "cents", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    )
    feats = ev.select(
        F.col("user_id").alias("entity_id"), F.col("ts").alias("timestamp"), "cents"
    )
    spine = ev.filter(F.col("event_id") % 10 == 0).select(
        F.col("user_id").alias("entity_id"),
        F.col("ts").alias("timestamp"),
        F.col("event_id").alias("spine_id"),
    )
    out = pit_window_agg(
        spine, feats, "cents", window_seconds=(86400, 7 * 86400)
    )
    return out.select(
        F.col("entity_id").alias("user_id"),
        _US("timestamp").alias("ts_us"),
        "spine_id",
        "n_86400s",
        F.col("sum_86400s").cast("long").alias("sum_86400s"),
        F.col("min_86400s").cast("long").alias("min_86400s"),
        F.col("max_86400s").cast("long").alias("max_86400s"),
        "n_604800s",
        F.col("sum_604800s").cast("long").alias("sum_604800s"),
    )


def q_h3_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance through the store API: register the
    first 1500 events, create a per-event-type rollup, append the rest,
    then refresh — the refresh aggregates ONLY the appended delta and
    merges mergeable state (count/sum/min/max; sums on integer cents so
    partial-sum order can't perturb doubles). The oracle aggregates the
    full event set directly: incremental == from-scratch."""
    from .store import FeatureStore

    feats = (
        events_features(spark, sf_dir)
        .withColumn(
            "value_cents", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        )
        .drop("value")
    )
    base = feats.filter(F.col("event_id") < 1500)
    extra = feats.filter(F.col("event_id") >= 1500).drop("__row_id__")
    fs = FeatureStore(spark)
    fs.register("ev", base)
    fs.create_rollup("ev", "by_type", ["event_type"], ["value_cents"])
    fs.append("ev", extra)
    fs.refresh_rollup("by_type")
    return fs.get_rollup("by_type")


def q_emb1_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization (functions/vector.py
    quantize_int8): 4x smaller vectors for the ANN index; floor(x+0.5)
    rounding is bit-identical across engines. The quantized vector is
    emitted CSV-serialized (the driver's canonicalizer sorts output
    cells with pandas and cannot hash raw array<> values), alongside its
    element sum as an integer checksum."""
    from .functions.vector import quantize_int8

    emb = table(spark, sf_dir, "embeddings")
    qa = quantize_int8(F.col("embedding").cast("array<double>"))
    return emb.select("vec_id", qa.alias("qa")).select(
        "vec_id",
        F.concat_ws(",", F.transform("qa", lambda x: x.cast("string"))).alias("q"),
        F.aggregate("qa", F.lit(0).cast("long"), lambda s, x: s + x).alias("sum_q"),
    )


def q_pipe2_quality_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dup dedup — the full corpus-curation composite:
    MinHash-LSH candidates (portable md5+affine family) -> exact shingle-
    Jaccard verify >= 0.5 -> connected components -> per cluster KEEP the
    member with the best quality score (distinct-token ratio; smallest
    doc_id on ties) and drop the rest. The keep decision uses a partial-
    aggregating max_by over (quality, -doc_id) — no per-cluster window,
    map-side combinable. At 100 TB this is candidates-only pair work
    (banded LSH), one CC fixpoint over near-dup edges (tiny vs corpus),
    and one agg; quality is a map-only scan column."""
    from .operators.dedup import connected_components, dedup_minhash_lsh, ngram_jaccard

    docs = table(spark, sf_dir, "documents")
    cand = dedup_minhash_lsh(docs, num_hashes=16, bands=4, hash_family="md5_affine")
    edges = ngram_jaccard(docs, cand, threshold=0.5).select("id_a", "id_b")
    comp = connected_components(edges)
    toks = F.split(F.col("text"), " ")
    quality = docs.select(
        "doc_id",
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("uniq"),
    )
    members = comp.join(quality, comp.node == quality.doc_id)
    return members.groupBy("component").agg(
        F.count("*").alias("n_members"),
        F.max_by(
            "doc_id", F.struct(F.col("uniq"), (-F.col("doc_id")).alias("neg"))
        ).alias("kept_doc_id"),
        F.round(F.max("uniq"), 6).alias("kept_uniq_ratio"),
        (F.count("*") - 1).alias("n_dropped"),
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


_BM25_TERMS = ("table", "query", "scan")
_BM25_K1, _BM25_B = 1.2, 0.75


def q_s3_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval for a fixed query over the documents corpus
    (Okapi k1=1.2, b=0.75) — the lexical-search sibling of x16's TF-IDF
    keywords. Per-(doc, term) scores are quantized to integer micro-units
    before the per-doc sum (exact integer aggregation; the only float is
    the per-term scalar, rounded the same way x16 does). Plan: one scan
    explodes tokens; the 3-term postings and corpus stats are tiny
    broadcasts; top-20 via TakeOrderedAndProject."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.length("token") > 0)
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    tf = (
        toks.filter(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    stats = docs.agg(F.count("*").alias("n_docs")).crossJoin(
        dl.agg(F.avg("dl").alias("avgdl"))
    )
    j = (
        tf.join(F.broadcast(dfreq), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + _BM25_K1 * (
        1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    term_score = idf * F.col("tf") * (_BM25_K1 + 1) / denom
    micro = F.floor(term_score * 1_000_000 + F.lit(0.5)).cast("long")
    return (
        j.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms"),
            F.sum(micro).alias("score_micro"),
        )
        .orderBy(F.col("score_micro").desc(), "doc_id")
        .limit(20)
    )


def q_io6_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across parquet batches — the mid-stream producer
    upgrade case: batch 1 lacks the ``discount_pct`` column batch 2 adds.
    ``mergeSchema=true`` unions the footers (schema-on-read, no rewrite
    of old files), old rows surface NULL, and the aggregate coalesces a
    default. At 100 TB this is why you never rewrite history for an
    additive schema change; per-file pruning and pushdown still work on
    the shared columns."""
    li = table(spark, sf_dir, "lineitem")
    d = _scratch_dir("io6_evo", sf_dir)
    li.filter(F.col("l_orderkey") % 2 == 0).select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    ).write.mode("overwrite").parquet(f"{d}/b1")
    li.filter(F.col("l_orderkey") % 2 == 1).select(
        "l_orderkey",
        "l_quantity",
        "l_extendedprice",
        F.round(F.col("l_discount") * 100, 2).alias("discount_pct"),
    ).write.mode("overwrite").parquet(f"{d}/b2")
    back = spark.read.option("mergeSchema", "true").parquet(f"{d}/b1", f"{d}/b2")
    return back.groupBy((F.col("l_orderkey") % 10).alias("bucket")).agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("discount_pct").isNull(), 1).otherwise(0)).alias(
            "n_legacy_rows"
        ),
        F.round(F.sum(F.coalesce("discount_pct", F.lit(0.0))), 2).alias(
            "sum_discount_pct"
        ),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


def q_t4b_winnow_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing/rolling-hash fingerprint (operators/text.py
    rolling_hash_fingerprint): per doc, the 4 smallest portable 32-bit
    hashes over 4-token shingles — the content-region sketch used for
    containment detection (MOSS-style), complementary to t4's whole-doc
    fingerprint. Map-only; the sketch join to find overlapping docs is a
    4-row explode + equi join at any scale."""
    from .operators.text import rolling_hash_fingerprint

    docs = table(spark, sf_dir, "documents")
    out = rolling_hash_fingerprint(docs, window=4, keep=4, hash_family="md5_32")
    # CSV-serialize the sketch: the driver's pandas canonicalizer cannot
    # hash raw array<> cells.
    return out.select(
        "doc_id",
        F.concat_ws(
            ",", F.transform("sketch", lambda x: x.cast("string"))
        ).alias("sketch"),
    )


def q_dq3_feature_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature drift between two populations (PSI profile): compare the
    distribution of `value` in the first vs second half of the events
    stream per event_type, over 10 fixed-width bins. Output is per-bin —
    integer counts plus a 6dp-rounded PSI term — so no cross-row float
    aggregation exists anywhere (per-bin terms are deterministic scalar
    math on exact counts; the headline PSI is the sum of a 10-row
    column the consumer can take). Laplace +1 smoothing keeps empty bins
    finite. One scan, one shuffle on (event_type, bin)."""
    ev = table(spark, sf_dir, "events")
    mid = ev.select(F.expr("percentile(unix_micros(ts), 0.5)").alias("m")).collect()[
        0
    ]["m"]
    half = F.when(F.unix_micros("ts") <= F.lit(int(mid)), 0).otherwise(1)
    bin_ = F.least(F.floor(F.col("value") / 50.0).cast("int"), F.lit(9))
    counts = (
        ev.select(half.alias("half"), bin_.alias("bin"), "event_type")
        .groupBy("event_type", "bin")
        .agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("n_early"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("n_late"),
        )
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("n_early").alias("t_early"), F.sum("n_late").alias("t_late")
    )
    j = counts.join(F.broadcast(tot), "event_type")
    p = (F.col("n_early") + 1) / (F.col("t_early") + 10)
    q = (F.col("n_late") + 1) / (F.col("t_late") + 10)
    return j.select(
        "event_type",
        "bin",
        "n_early",
        "n_late",
        F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
    )


def q_x17_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/similarity.py pq_ann_topk):
    4 subspaces x 16 dims, 16 codewords each from integer-Lloyd fits,
    asymmetric-distance top-10 for query vec 0. Integer arithmetic end to
    end, so the DuckDB oracle replays the codebook fits, encoding, and
    ADC ranking exactly."""
    from .operators.similarity import pq_ann_topk

    emb = table(spark, sf_dir, "embeddings").cache()
    qvec = [
        float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    return pq_ann_topk(emb, qvec, m=4, sub_dim=16, k_codes=16, k=10, iterations=1)


def q_a14_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (GK sketch — mergeable, bounded memory, the 100 TB
    path a7's exact percentile can't walk) under the same cross-engine
    contract as a4/a10: the hash-checked columns are the EXACT percentiles
    plus a within_tolerance boolean asserting the sketch value lands
    inside the exact [q-eps, q+eps] rank window (eps=0.01 >> 1/accuracy);
    the oracle computes the exact values and literal TRUE."""
    ev = table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.expr("approx_percentile(value, array(0.5, 0.9), 10000)").alias("ap"),
        F.expr("percentile(value, array(0.4900, 0.5, 0.5100, 0.8900, 0.9, 0.9100))").alias(
            "ex"
        ),
    )
    within = (
        (F.col("ap")[0] >= F.col("ex")[0])
        & (F.col("ap")[0] <= F.col("ex")[2])
        & (F.col("ap")[1] >= F.col("ex")[3])
        & (F.col("ap")[1] <= F.col("ex")[5])
    )
    return agg.select(
        "event_type",
        F.round(F.col("ex")[1], 4).alias("exact_p50"),
        F.round(F.col("ex")[4], 4).alias("exact_p90"),
        within.alias("within_tolerance"),
    )


def q_decon1_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination sweep (Dolma/GPT-3-style decontamination):
    flag every training doc sharing at least one 4-token shingle with the
    held-out benchmark slice (doc_id % 20 == 0 stands in for the eval
    set). The benchmark n-gram banlist is deduped and BROADCAST, so the
    containment check is map-side — the corpus is never shuffled, only
    the tiny per-doc hit counts are."""
    from .operators.dedup import detect_contamination

    docs = table(spark, sf_dir, "documents")
    benchmark = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)
    return detect_contamination(train, benchmark, shingle_k=4)


def q_g2_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer->supplier purchase graph (who-buys-from-
    whom edges from orders x lineitem), 3 iterations, damping 0.85 —
    integer-arithmetic ranks (operators/graph.py) so the fixpoint is
    bit-identical across engines; top-20 nodes. The DuckDB oracle unrolls
    the same three iterations as CTEs over the identical integer
    recurrence."""
    from .operators.graph import pagerank

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
    )
    pr = pagerank(edges, iterations=3, damping=0.85)
    return (
        pr.orderBy(F.col("r").desc(), "node")
        .limit(20)
        .select("node", F.col("r").alias("rank"))
    )


def q_g2b_pagerank_dangling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank with textbook dangling-mass redistribution over the same
    customer->supplier graph as g2. Suppliers have no out-edges, so in g2
    their rank simply leaks; here each iteration pools it (one scalar
    aggregate, broadcast back) and every node receives floor(pool/n)
    before damping — still all-integer, so the DuckDB oracle unrolls the
    identical recurrence with the pool/n term added to each CTE
    (operators/graph.py pagerank(redistribute_dangling=True))."""
    from .operators.graph import pagerank

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
    )
    pr = pagerank(edges, iterations=3, damping=0.85, redistribute_dangling=True)
    return (
        pr.orderBy(F.col("r").desc(), "node")
        .limit(20)
        .select("node", F.col("r").alias("rank"))
    )


def q_f14_multi_view_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feast/Chronon-style training set over TWO feature views: for each
    spine (entity, ts) row pick up the latest event-view features AND the
    latest order-view features as-of that timestamp — two independent
    as-of joins (union strategy: one shuffle each, no row explosion)
    stitched on the spine key. The multi-feature-view generalization of
    the reference's single-table get_training_set (store.py:261-308);
    inner semantics per view, so only spine rows with BOTH views present
    survive (deterministic, oracle-expressible)."""
    feats = events_features(spark, sf_dir)
    spine = (
        feats.filter(F.col("event_type") == "purchase")
        .select("entity_id", "timestamp")
        .distinct()
    )
    ev_out = asof_join(spine, feats, strategy="union", keep_spine_ts=True)
    order_view = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("entity_id"),
        F.col("o_orderdate").cast("timestamp").alias("timestamp"),
        "o_totalprice",
        F.col("o_orderkey").alias("__row_id__"),
    )
    ord_out = asof_join(spine, order_view, strategy="union", keep_spine_ts=True)
    left = ev_out.select(
        F.col("entity_id").alias("user_id"),
        _US("as_of_timestamp").alias("as_of_us"),
        "event_id",
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
        _US("timestamp").alias("event_ts_us"),
    )
    right = ord_out.select(
        F.col("entity_id").alias("user_id"),
        _US("as_of_timestamp").alias("as_of_us"),
        F.col("o_totalprice").alias("last_order_price"),
        _US("timestamp").alias("order_ts_us"),
    )
    return left.join(right, ["user_id", "as_of_us"], "inner")


def build_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared by q_b1 and the plan gate: write orders+lineitem ONCE as
    bucketed/sorted managed tables on the join key, return the joined
    (pre-agg) frame. The `merge` hint pins SortMergeJoin so the plan
    shape is the bucket zipper regardless of broadcast thresholds."""
    import shutil
    from urllib.parse import urlparse

    n_buckets = 8
    cols = {
        "orders": ["o_orderkey", "o_orderpriority"],
        "lineitem": ["l_orderkey", "l_extendedprice", "l_discount"],
    }
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        tbl = f"b1_{name}_bkt"
        # The catalog is in-memory per-session but the warehouse dir is on
        # disk: drop both so a fresh session can recreate the table.
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        shutil.rmtree(f"{wh}/{tbl}", ignore_errors=True)
        (
            table(spark, sf_dir, name)
            .select(*cols[name])
            .write.mode("overwrite")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .format("parquet")
            .saveAsTable(tbl)
        )
    o = spark.table("b1_orders_bkt")
    li = spark.table("b1_lineitem_bkt")
    return o.hint("merge").join(li, o.o_orderkey == li.l_orderkey)


def q_b1_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located (bucketed) join — the 100 TB fact-to-fact join story.

    Both orders and lineitem are written once as bucketed+sorted managed
    tables on the join key (``bucketBy(8, orderkey).sortBy(orderkey)``),
    so the join itself needs NO exchange and NO sort on either side: each
    task zips bucket i of orders with bucket i of lineitem. At scale the
    shuffle is paid once at ingest; every subsequent join on the bucket
    key is map-side. Plan-gated in tests/test_plans.py: exactly one
    Exchange (the final groupBy), none below the SortMergeJoin.

    Reference parity: the reference joins feature tables to spines by
    sorted-merge over its pandas index (store.py:261-308 get_training_set);
    bucketing is the distributed equivalent of keeping tables pre-sorted
    on the entity key.
    """
    joined = build_bucketed_join(spark, sf_dir)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.countDistinct("o_orderkey").alias("n_orders"),
    )


def q_io5_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned layout + partition pruning — the data-layout
    primitive that makes 100 TB scans affordable. Events are written
    ``partitionBy(event_type)`` (directory-per-value); the read back with
    an event_type predicate lists ONLY that directory — pruning happens at
    file listing, before any parquet footer is opened. Plan-gated: the
    scan shows ``PartitionFilters: [... (event_type = purchase)]`` and the
    predicate never appears as a data filter. Mirrors the store's
    date-partition layout (sources/registry.py:174, store.py get())."""
    ev = table(spark, sf_dir, "events")
    d = _scratch_dir("io5_part", sf_dir)
    ev.select("event_id", "ts", "user_id", "event_type", "value").write.mode(
        "overwrite"
    ).partitionBy("event_type").parquet(d)
    back = spark.read.parquet(d).filter(F.col("event_type") == "purchase")
    return back.groupBy(_US(F.date_trunc("day", "ts")).alias("day_us")).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


def q_dq5_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic between the click
    and view populations of `value` — the distribution-level check dq3's
    per-bin PSI can't give (KS is binning-free up to the cent
    quantization and catches shape drift PSI smooths over). Exact
    integer math end to end: D's numerator is max |c1*n2 - c2*n1| over
    the pooled support (cross-multiplied empirical CDFs — no float
    division until the final scalar, emitted as BIGINT ks_e6).

    Plan: one scan -> groupBy(cent-quantized value) partial-agg -> one
    ordered cumulative window over the DISTINCT support (bounded by
    quantization: |support| <= value_range * 100, independent of row
    count — that bound is what makes the global cumulative window safe
    at 100 TB; the raw-row sort a naive rank-based KS needs is not).
    Overflow: c*n products < n1*n2 <= (rows/2)^2 -> exact below ~3e9
    rows per side."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    b = ev.select(
        F.floor(F.col("value") * 100).cast("long").alias("v"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is1"),
    )
    g = b.groupBy("v").agg(
        F.sum("is1").alias("c1"), F.sum(1 - F.col("is1")).alias("c2")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = g.select(
        F.sum("c1").over(w).alias("cc1"), F.sum("c2").over(w).alias("cc2")
    )
    totals = g.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    return (
        cum.crossJoin(F.broadcast(totals))
        .agg(
            F.first("n1").alias("n1"),
            F.first("n2").alias("n2"),
            F.max(F.abs(F.col("cc1") * F.col("n2") - F.col("cc2") * F.col("n1"))).alias(
                "d_num"
            ),
        )
        .withColumn("ks_e6", F.expr("(d_num * 1000000) DIV (n1 * n2)"))
    )


def q_x21_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL BPE tokenizer-training loop (operators/text.py
    bpe_train_merges): 3 rounds of corpus-wide pair counting (x20's
    pass), driver-side argmax of ONE row (the k-means/PQ scalar-collect
    pattern), and a codegen array-fold merge applied corpus-wide. The
    DuckDB oracle replays all three rounds as chained CTEs — per-round
    argmax as a 1-row CTE, the greedy merge as window-function
    mark/drop/renumber (exactly equivalent to the left-to-right fold
    because x != y rules can never overlap), with n_merges recomputed
    from token-count shrinkage as an independent cross-check of cnt."""
    from .operators.text import bpe_train_merges

    docs = table(spark, sf_dir, "documents")
    res = bpe_train_merges(docs, "text", rounds=3)
    return spark.createDataFrame(
        [(r["round"], r["x"], r["y"], r["cnt"], r["n_merges"]) for r in res],
        "round long, x string, y string, cnt long, n_merges long",
    ).orderBy("round")


def q_x22_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (cluster-then-dedup): every embedding
    is assigned to its nearest of 16 deterministic centroids (broadcast
    codebook + max_by argmax — the same write-time map-only pass as x10),
    candidate pairs form ONLY within a cell, and the higher vec_id of any
    pair with cosine >= 0.35 is marked dropped. Completes the dedup
    family: x3 exact, x6 MinHash, x9 SimHash, x11 LSH-blocked cosine, x22
    CLUSTER-blocked cosine — the variant whose block key is learned from
    the data rather than hashed. At corpus scale the cell count is the
    knob (SemDeDup uses k ~ n/1e3, keeping within-cell work bounded);
    here k=16 on the test corpus. Output is per-cell accounting —
    (n_vecs, n_dropped, n_kept) — the dedup-rate report a curation run
    ships."""
    from .operators.similarity import ivf_assign

    emb = table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    assigned = ivf_assign(emb, cents).withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    dropped = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(_cosine(F.col("a.v"), F.col("b.v")) >= 0.35)
        .select(F.col("b.cell").alias("cell"), F.col("b.vec_id").alias("drop_id"))
        .distinct()
    )
    per_cell_drops = dropped.groupBy("cell").agg(F.count("*").alias("n_dropped"))
    per_cell = assigned.groupBy("cell").agg(F.count("*").alias("n_vecs"))
    return (
        per_cell.join(per_cell_drops, "cell", "left")
        .select(
            "cell",
            "n_vecs",
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
            (F.col("n_vecs") - F.coalesce("n_dropped", F.lit(0))).alias("n_kept"),
        )
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
    return out.select(
        "event_id",
        F.concat_ws(
            ",", F.transform("fhash", lambda x: x.cast("string"))
        ).alias("fhash"),
    )


def q_t9_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram count table over the documents corpus (operators/text.py
    ngram_counts) — the KenLM-style LM statistic. One scan, higher-order
    shingle build (no UDF), explode, map-side partial agg so the shuffle
    carries (gram, partial_count); top-30 with a deterministic
    tie-break."""
    from .operators.text import ngram_counts

    docs = table(spark, sf_dir, "documents")
    out = ngram_counts(docs, "text", n=3)
    return out.orderBy(F.col("cnt").desc(), "gram").limit(30)


def q_t10_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocation mining: bigrams scored by the integer-scaled PMI
    ratio c_xy * N * 10^4 DIV (c_x * c_y) — monotone in textbook PMI
    (the log is monotone) but BIGINT-exact end to end, so no float
    aggregation anywhere. Plan: one corpus scan feeds both count tables;
    unigram counts broadcast onto the min-support-filtered bigrams (at
    100 TB the broadcast side is the head vocabulary after the same
    min-count cut; shuffle-join fallback if a tokenizer explodes it).
    Overflow bound: c_xy * N * 10^4 < 2^63 — holds to ~9e14 token
    corpora for head bigrams; shift the 10^4 into the divisor past
    that."""
    from .operators.text import ngram_counts

    docs = table(spark, sf_dir, "documents")
    uni = ngram_counts(docs, "text", n=1)
    bi = ngram_counts(docs, "text", n=2).filter(F.col("cnt") >= 5)
    n_total = uni.agg(F.sum("cnt").alias("n_tokens"))
    w = bi.select(
        "gram",
        F.col("cnt").alias("c_xy"),
        F.split("gram", " ").getItem(0).alias("x"),
        F.split("gram", " ").getItem(1).alias("y"),
    )
    ux = uni.select(F.col("gram").alias("x"), F.col("cnt").alias("c_x"))
    uy = uni.select(F.col("gram").alias("y"), F.col("cnt").alias("c_y"))
    out = (
        w.join(F.broadcast(ux), "x")
        .join(F.broadcast(uy), "y")
        .crossJoin(F.broadcast(n_total))
        .withColumn(
            "pmi_ratio_e4", F.expr("(c_xy * n_tokens * 10000) DIV (c_x * c_y)")
        )
    )
    return out.select("gram", "c_xy", "c_x", "c_y", "pmi_ratio_e4").orderBy(
        F.col("pmi_ratio_e4").desc(), "gram"
    ).limit(20)


def q_g3_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count (operators/graph.py triangle_count) over the 1995
    co-purchase graph: parts are adjacent when they share an order. Pair
    generation is bounded per order (a handful of lineitems each), dedup
    canonicalizes to lo<hi edges, and the ordered two-join enumerates
    each triangle once. The graph-curation sibling of g2's PageRank and
    x15's connected components."""
    from .operators.graph import triangle_count

    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
    )
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
    edges = a.join(b, "k").filter(F.col("src") < F.col("dst")).select("src", "dst")
    return triangle_count(edges)


def q_a17_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariance structure of the first 8 embedding dimensions — the
    single pass that feeds a driver-side PCA/whitening solve (the d x d
    Gram matrix is tiny; the data scan is the cost). Values quantized to
    integer milliunits FIRST, so every sum is an order-independent
    BIGINT and the emitted scaled covariance numerator
    n*sum(qi*qj) - sum(qi)*sum(qj) is exact. One scan, 45 codegen
    aggregates, no shuffle of rows (partial agg to one row), stack() to
    tidy (i, j) form. Overflow bound: n^2 * maxq^2 < 2^63 -> n ~< 3e6 at
    |q|<=1000; beyond that, shard the pass (sum pairs are mergeable) or
    drop quantization scale."""
    emb = table(spark, sf_dir, "embeddings").select(
        *[
            F.floor(F.col("embedding").getItem(i).cast("double") * 1000)
            .cast("long")
            .alias(f"q{i}")
            for i in range(8)
        ]
    )
    aggs = [F.count("*").alias("n")]
    aggs += [F.sum(f"q{i}").alias(f"s{i}") for i in range(8)]
    aggs += [
        F.sum(F.col(f"q{i}") * F.col(f"q{j}")).alias(f"p{i}_{j}")
        for i in range(8)
        for j in range(i, 8)
    ]
    row = emb.agg(*aggs)
    stack_args = ", ".join(
        f"CAST({i} AS BIGINT), CAST({j} AS BIGINT), p{i}_{j} * n - s{i} * s{j}"
        for i in range(8)
        for j in range(i, 8)
    )
    return row.select(
        F.expr(f"stack(36, {stack_args}) AS (i, j, cov_num)"), "n"
    )


def q_rag1_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion (RRF, k=60): fuse the
    BM25 lexical arm (s3's scorer) with the dense cosine arm (x1's
    scorer, doc_id==vec_id) and rank by the summed integer RRF score
    1e6 DIV (60+rank) — ranks are exact integers, so fusion is
    BIGINT-exact. The standard RAG retrieval pattern. Plan: both arms
    are top-20 TakeOrderedAndProject reductions; the fusion full-outer
    join touches <=40 rows regardless of corpus size."""
    bm = q_s3_bm25_search(spark, sf_dir).select("doc_id", "score_micro")
    bmr = bm.withColumn(
        "r_lex",
        F.row_number()
        .over(Window.orderBy(F.col("score_micro").desc(), "doc_id"))
        .cast("long"),
    ).select("doc_id", "r_lex")

    emb = table(spark, sf_dir, "embeddings").withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    sem = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .withColumn("sim", _cosine(F.col("v"), F.col("qv")))
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(20)
    )
    semr = sem.withColumn(
        "r_sem",
        F.row_number()
        .over(Window.orderBy(F.col("sim").desc(), "vec_id"))
        .cast("long"),
    ).select(F.col("vec_id").alias("doc_id"), "r_sem")

    fused = bmr.join(semr, "doc_id", "full_outer").withColumn(
        "rrf_e6",
        F.coalesce(F.expr("1000000 DIV (60 + r_lex)"), F.lit(0))
        + F.coalesce(F.expr("1000000 DIV (60 + r_sem)"), F.lit(0)),
    )
    return (
        fused.select("doc_id", "r_lex", "r_sem", "rrf_e6")
        .orderBy(F.col("rrf_e6").desc(), "doc_id")
        .limit(10)
    )


# --------------------------------------------------------------------------- #
# registry
# --------------------------------------------------------------------------- #

def q_x23_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLY — the other half of x21's fit: train 3 BPE merge
    rules, then encode EVERY document with them (operators/text.py
    bpe_encode — one greedy array fold per rule, map-only, no shuffle).
    Output is the per-doc encoding manifest: token count plus an
    order-DEPENDENT sequence checksum (sum of pos * 31-bit md5 term,
    shuf1's overflow-safe family — bounded terms keep the BIGINT sum
    exact to ~2^21 tokens/doc) so the oracle pins the exact token
    sequence, not just its length. The DuckDB twin replays the train
    rounds as x21's mark/drop/renumber CTEs and reads the final token
    table straight out of the last renumber. At 100 TB: the merge table
    is a small driver artifact shipped with the plan; encode is
    scan-bound — the corpus is never shuffled."""
    from .operators.text import bpe_encode, bpe_train_merges

    docs = table(spark, sf_dir, "documents")
    rules = [(r["x"], r["y"]) for r in bpe_train_merges(docs, "text", rounds=3)]
    enc = bpe_encode(docs, rules)
    tok = enc.select("doc_id", F.posexplode("tk").alias("pos0", "tok"))
    h31 = (
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
        % F.lit(1 << 31)
    )
    return tok.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum((F.col("pos0") + 1) * h31).alias("seq_check"),
    )


def q_a18_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch point queries, exact-verified — the mergeable
    heavy-hitter sketch for streams/shards too big to count exactly.
    Build: each event row hashes into d=3 sketch rows x w=64 buckets
    (portable md5 family, seeds inlined) and the sketch is ONE partial-agg
    groupBy over (r, b) — 192 cells total, so the shuffle carries a
    bounded sketch no matter how many input rows (count-min's guarantee:
    est >= exact, est <= exact + eps*N w.h.p.). Probe: a fixed 20-user
    candidate list reads min-over-rows of its cells; exact counts join in
    as ground truth (the x19-style trust-but-verify step — at 100 TB
    you'd spot-check a sample this way, not count every key). Asserts the
    one-sided error bound as a column so the oracle checks the INVARIANT,
    not just the numbers."""
    ev = table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("k")
    )
    probes = spark.range(20).select(F.col("id").cast("string").alias("k"))

    def bucket(d: int, col: F.Column) -> F.Column:
        h = F.md5(F.concat(F.lit(f"{d},"), col))
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 64

    cells = ev.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("r"), bucket(d, F.col("k")).alias("b")
                    )
                    for d in range(3)
                ]
            )
        ).alias("c")
    ).select("c.r", "c.b")
    sketch = cells.groupBy("r", "b").agg(F.count("*").alias("cnt"))
    probe_cells = probes.select(
        "k",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("r"), bucket(d, F.col("k")).alias("b")
                    )
                    for d in range(3)
                ]
            )
        ).alias("c"),
    ).select("k", "c.r", "c.b")
    est = (
        probe_cells.join(F.broadcast(sketch), ["r", "b"])
        .groupBy("k")
        .agg(F.min("cnt").alias("cms_est"))
    )
    exact = ev.join(F.broadcast(probes), "k").groupBy("k").agg(
        F.count("*").alias("exact_cnt")
    )
    return (
        est.join(exact, "k")
        .select(
            F.col("k").cast("long").alias("user_id"),
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") >= F.col("exact_cnt")).alias("bound_holds"),
        )
    )


def q_dq6_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data LEAKAGE audit — the data-quality check that makes
    PIT joins (f7) worth their cost. For every training-spine row
    (purchase events), compare what a PIT-correct pipeline reads (latest
    feature <= spine ts; f4's argmax) against what the sloppy-but-common
    pipeline reads (the CURRENT feature table — latest event overall):
    a spine row is CONTAMINATED when the user's latest event is newer
    than the spine timestamp, i.e. a plain join would silently train on
    the future. Output is the per-user audit report (rows, contaminated
    rows, integer leak rate). Plan: one partial-agg max(ts) per user
    joined back on the user key — no window over history, scales as the
    key count; the spine is scanned once. The reference's PIT cutoff
    (store.py:218-259 timestamp filter) is the behavior whose absence
    this op quantifies."""
    ev = table(spark, sf_dir, "events")
    spine = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("spine_ts")
    )
    latest = ev.groupBy("user_id").agg(F.max("ts").alias("latest_ts"))
    flagged = spine.join(latest, "user_id").select(
        "user_id", (F.col("latest_ts") > F.col("spine_ts")).cast("long").alias("leak")
    )
    return flagged.groupBy("user_id").agg(
        F.count("*").alias("n_rows"),
        F.sum("leak").alias("n_contaminated"),
        F.expr("sum(leak) * 1000000L div count(*)").alias("leak_rate_e6"),
    )


_NDCG_DISC_E6 = [round(1_000_000 / math.log2(r + 1)) for r in range(1, 11)]


def q_rag2_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality eval of the sign-LSH ANN arm (x8) against exact
    cosine ground truth: nDCG@10 + MRR — the metrics a retrieval stack
    reports, complementing x19's set-overlap recall with ORDER
    sensitivity. Relevance = membership in the exact brute-force top-10
    (self excluded); the log2 rank discounts are Python-precomputed
    integer micro-units inlined into both engines (f15's decay-table
    recipe), so DCG/IDCG/MRR are all BIGINT-exact. Plan: both arms are
    top-k reductions (TakeOrderedAndProject); the metric join touches
    <= 20 rows. At 100 TB this runs per query over a sampled query set —
    the eval loop that tunes bits/multiprobe before shipping the index."""
    from .operators.similarity import knn_lsh, rp_lsh_bucketize

    emb = table(spark, sf_dir, "embeddings").withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    qrow = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    qvec = [float(x) for x in qrow.collect()[0]["qv"]]
    exact10 = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qrow))
        .withColumn("sim", _cosine(F.col("v"), F.col("qv")))
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", F.lit(1).alias("rel"))
    )
    bucketed = rp_lsh_bucketize(emb, dim=64, bits=6)
    ann = knn_lsh(bucketed, qvec, dim=64, k=11, bits=6, multiprobe=2).filter(
        F.col("vec_id") != 0
    )
    w = Window.orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    ranked = (
        ann.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .join(exact10, "vec_id", "left")
        .select(
            F.coalesce("rel", F.lit(0)).alias("rel"),
            "rnk",
            F.element_at(
                F.array(*[F.lit(d) for d in _NDCG_DISC_E6]), F.col("rnk")
            ).alias("disc"),
        )
    )
    idcg = sum(_NDCG_DISC_E6)
    agg = ranked.agg(
        F.sum((F.col("rel") * F.col("disc")).cast("long")).alias("dcg_e6"),
        F.min(F.when(F.col("rel") == 1, F.col("rnk"))).alias("fr"),
    )
    return agg.select(
        F.lit(10).cast("long").alias("k"),
        "dcg_e6",
        F.lit(idcg).cast("long").alias("idcg_e6"),
        F.expr(f"dcg_e6 * 1000000L div {idcg}L").alias("ndcg_e6"),
        F.coalesce("fr", F.lit(0)).cast("long").alias("first_rel_rank"),
        F.expr("CASE WHEN fr IS NULL THEN 0L ELSE 1000000L div fr END").alias(
            "mrr_e6"
        ),
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


def q_g3b_triangle_degree_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g3's triangle count through the degree-ordered plan
    (operators/graph.py triangle_count_degree_ordered): edges oriented
    from the lower-(degree, id) endpoint so every wedge pivots on the
    LOWER-degree vertex — O(m^1.5) wedge work on any degree distribution,
    where g3's id-ordered join degrades to sum(deg^2) on Zipf hubs. The
    oracle deliberately replays the SIMPLE id-ordered algorithm (g3's
    SQL): two different enumeration orders, one answer — the x9-style
    independent cross-check."""
    from .operators.graph import triangle_count_degree_ordered

    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
    )
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
    edges = a.join(b, "k").filter(F.col("src") < F.col("dst")).select("src", "dst")
    return triangle_count_degree_ordered(edges)


def q_t11_dup_span_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-SPAN profiling (the Lee-et-al substring-dedup
    statistic, n-gram formulation): an 8-token shingle is 'duplicated'
    when it appears in more than one document; each doc reports how much
    of it is covered by cross-doc duplicated spans. The span-level
    complement of doc-level dedup (x3/x6): corpora pass doc-dedup yet
    still carry boilerplate — this measures it. Plan: one scan builds
    distinct (doc, shingle) pairs; shingle multiplicities are ONE
    partial-agg groupBy on the 16-byte md5 of the shingle (never the
    string — shuffle carries fixed-width keys); the per-doc rollup joins
    doc-shingles to the duplicated-key set. Docs shorter than 8 tokens
    profile as 0-span rows kept via left join (coverage must report on
    EVERY doc, not silently drop the short ones). Top-30 most-duplicated
    docs, integer coverage rate."""
    from .operators.text import dup_span_profile

    docs = table(spark, sf_dir, "documents")
    prof = dup_span_profile(docs, n=8)
    return prof.orderBy(
        F.col("dup_rate_e6").desc(), F.col("n_dup_spans").desc(), "doc_id"
    ).limit(30)


def q_r3_interval_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r2's interval join as a LEFT OUTER — views with NO purchase in
    their 2-hour band survive null-padded (the abandonment/no-conversion
    lane a funnel analysis needs; a16 counts conversions, this keeps the
    non-converters as rows). Batch twin of
    stream_stream_join(how='left_outer') — the streaming side emits the
    identical null rows, just delayed by band+watermark (state eviction);
    pytest pins the subset relationship. Same plan shape as r2: one
    shuffle on user_id, band residual on the SMJ — the null padding is
    free."""
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
        F.col("event_id").alias("buy_id"),
    )
    j = views.join(
        buys,
        (F.col("v_user") == F.col("b_user"))
        & (F.col("b_ts") > F.col("v_ts"))
        & (F.col("b_ts") <= F.col("v_ts") + F.expr("INTERVAL 2 HOURS")),
        "left",
    )
    return j.select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "buy_id",
        _US("v_ts").alias("view_us"),
        _US("b_ts").alias("buy_us"),
    )


def q_f18_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, NEAREST direction (operators/asof.py
    asof_join_nearest — pandas merge_asof direction='nearest' parity,
    property-tested against pandas itself): each purchase takes its
    user's closest event within ±6h, past preferred on distance ties.
    The sensor-alignment sibling of f7's backward join (F7 family). Plan:
    union both directions — ONE shuffle on the entity key, two
    in-partition sorts, no join, no row explosion (the 100 TB as-of
    recipe); the oracle replays it as a banded argmin with the same
    (distance, direction, row-id) tie chain."""
    from .operators.asof import asof_join_nearest

    ev = table(spark, sf_dir, "events")
    # features exclude the purchases themselves (a spine row matching its
    # own event at distance 0 would make the query a tautology)
    feats = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("entity_id"),
        F.col("ts").alias("timestamp"),
        "value",
        F.col("event_id").alias("__row_id__"),
    )
    spine = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("entity_id"), F.col("ts").alias("timestamp")
    )
    out = asof_join_nearest(
        spine, feats, tolerance_seconds=6 * 3600, keep_spine_ts=True
    )
    return out.select(
        F.col("entity_id").alias("user_id"),
        _US("timestamp").alias("feature_us"),
        "value",
        _US("as_of_timestamp").alias("spine_us"),
    )


def q_a19_bottomk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key bounded uniform sample (operators/sampling.py
    bottomk_sample): the 5 events with the smallest md5 draw per
    event_type — the deterministic distributed replacement for a per-key
    reservoir. Runs the SALTED two-phase plan (salt_buckets=8): rank
    within (key, salt) first so a key holding most of the table still
    bounds every task, then merge the per-bucket bottom-ks — correct
    because bottom-k is mergeable (bottom-k of a union == bottom-k of
    bottom-ks). The oracle replays the single-phase ranking, so the
    check also proves the two-phase == one-phase equivalence on real
    data (the x9 independent-algorithm recipe)."""
    from .operators.sampling import bottomk_sample

    ev = table(spark, sf_dir, "events").select("event_type", "event_id")
    out = bottomk_sample(ev, "event_type", "event_id", k=5, salt_buckets=8)
    return out.select("event_type", "sample_rank", "event_id")


def q_dq7_lateness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness profile — the statistic that DESIGNS a watermark.
    Treating event_id as arrival order, each event's lateness is how far
    its event time lags the per-user running maximum seen before it;
    the bucketed histogram (on-time / <1m / <10m / <1h / <6h / >=6h)
    tells you what `withWatermark` delay actually covers what fraction
    of the feed — choose it blind and you either drop data or hold state
    forever (streaming/ingest.py's watermark knobs cite this). The
    testdata ships no arrival column (events are perfectly time-ordered),
    so ARRIVAL IS SIMULATED: arrival = event time + a deterministic md5
    delay in [0, 48h) — the documented harness part; the measurement
    itself (running event-time max over arrival order) is exactly what
    you'd run on a real feed's ingest timestamp. Plan: one window per
    user over arrival order (single shuffle), integer microsecond
    lateness, <=5-row output."""
    ev = table(spark, sf_dir, "events")
    delay = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 172_800_000_000
    )
    arr = ev.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        (F.unix_micros("ts") + delay).alias("arrival_us"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("arrival_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    late = F.greatest(
        F.lit(0).cast("long"),
        F.coalesce(
            F.max("ts_us").over(w) - F.col("ts_us"), F.lit(0).cast("long")
        ),
    )
    bucketed = arr.select(
        F.when(late == 0, "on_time")
        .when(late < 3_600_000_000, "lt_1h")
        .when(late < 21_600_000_000, "lt_6h")
        .when(late < 86_400_000_000, "lt_24h")
        .otherwise("ge_24h")
        .alias("bucket"),
        late.alias("late_us"),
    )
    return bucketed.groupBy("bucket").agg(
        F.count("*").alias("n_events"), F.max("late_us").alias("max_late_us")
    )


def q_x25_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x6's LSH candidates verified with exact shingle CONTAINMENT
    (operators/dedup.py ngram_containment): |A∩B|/|A| — asymmetric, so a
    doc quoting another wholesale scores ~1.0 where the symmetric
    Jaccard stays low (Broder's resemblance-vs-containment distinction;
    the boilerplate-inclusion case x6b misses by design). Emits the
    contained (near-subset) side a keep-longest dedup policy would drop.
    Same portable md5-affine MinHash family as x6, so the oracle
    regenerates candidates AND the containment arithmetic exactly."""
    from .operators.dedup import dedup_minhash_lsh, ngram_containment

    docs = table(spark, sf_dir, "documents")
    pairs = dedup_minhash_lsh(docs, num_hashes=16, bands=4, hash_family="md5_affine")
    out = ngram_containment(docs, pairs, threshold=0.5)
    return out.select(
        "id_a", "id_b", F.round("containment", 6).alias("containment"),
        "contained_id",
    )


def q_f20_scd2_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time DIMENSION join — the warehouse dual of f7's as-of:
    build the SCD2 validity intervals from each user's click history
    (f11's lead() view: value valid [ts, next ts)), then join every
    purchase to the dimension row VALID AT its event time via equi
    (user) + half-open band residual. Classic 'dimension as of event
    time'. Because an SCD2-interval join and a backward as-of join are
    the same semantics expressed two ways, rows here must equal an
    asof_join of purchases onto clicks — and the oracle checks interval
    containment directly, a different formulation again. Plan: interval
    dim built with one window shuffle; the fact join is equi on user_id
    with the band as residual — never a cross product."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sentinel = F.lit("9999-12-31").cast("timestamp")
    dim = clicks.select(
        F.col("user_id").alias("d_user"),
        F.col("ts").alias("valid_from"),
        F.coalesce(F.lead("ts").over(w), sentinel).alias("valid_to"),
        F.col("value").alias("dim_value"),
        F.col("event_id").alias("dim_event"),
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    j = buys.join(
        dim,
        (F.col("user_id") == F.col("d_user"))
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("ts") < F.col("valid_to")),
    )
    return j.select(
        "user_id",
        F.col("event_id").alias("buy_id"),
        _US("ts").alias("buy_us"),
        "dim_event",
        "dim_value",
    )


def q_io8_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction, driver-visible (store.py compact_version;
    pytest pins the API, this query pins the DATA contract): register the
    events feed fragmented into 16 files (micro-batch ingest shape),
    compact to 1, and report the invariants that make compaction safe to
    automate — row count and an order-independent content checksum, both
    IDENTICAL before and after, plus the file counts. The oracle computes
    the same rows/checksum straight from the source table, so a
    compaction that dropped or duplicated ANY row hash-mismatches. At
    100 TB this is the maintenance job that keeps scan parallelism
    governed by maxPartitionBytes instead of file count."""
    from .store import FeatureStore

    feats = events_features(spark, sf_dir).drop("__row_id__")
    fs = FeatureStore(
        spark, storage_path=_scratch_dir("io8_compact", sf_dir)
    )
    fs.register("ev", feats.repartition(16))
    rep = fs.compact_version("ev", target_files=1)
    after = fs.get_version("ev", 1)
    chk = after.agg(
        F.count("*").alias("rows"),
        F.sum(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(",", "entity_id", F.unix_micros("timestamp"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % F.lit(1 << 31)
        ).alias("content_check"),
    )
    return chk.select(
        "rows",
        "content_check",
        F.lit(rep["files_after"]).cast("long").alias("files_after"),
        F.lit(rep["files_before"] > rep["files_after"]).alias("compacted"),
        (F.lit(rep["rows"]) == F.col("rows")).alias("rows_preserved"),
    )


def _cents_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events features with value quantized to integer cents — the
    float-free shape every store-mutation witness query uses so the
    DuckDB oracle can replay checksums and sums exactly."""
    return (
        events_features(spark, sf_dir)
        .drop("__row_id__")
        .withColumn(
            "value_cents", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        )
        .drop("value")
    )


def q_f22_upsert_patch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level correction through the public API (store.py upsert):
    register events as a feature table, then upsert a patch that
    replaces every (entity, ts) key of users < 20's purchases with a
    corrected row (event_type 'purchase_fixed', value + 1000 cents).
    Emits the ENTIRE corrected version, so the oracle — untouched rows
    as a NOT EXISTS key anti-filter UNION ALL the patch — catches a
    single dropped, duplicated or unreplaced row. Driver witness for the
    mutation trio the reference cannot express at all (its only write is
    whole-snapshot re-register, reference store.py:188-216). Plan: one
    key anti-join + union; the old version's files are re-referenced,
    never rewritten — the copy-on-write MERGE shape that holds at
    100 TB."""
    from .store import FeatureStore

    feats = _cents_features(spark, sf_dir)
    fs = FeatureStore(spark, storage_path=_scratch_dir("f22_upsert", sf_dir))
    fs.register("ev", feats)
    patch = (
        feats.filter((F.col("event_type") == "purchase") & (F.col("entity_id") < 20))
        .groupBy("entity_id", "timestamp")
        .agg(
            F.max("event_id").alias("event_id"),
            (F.max_by("value_cents", "event_id") + 1000).alias("value_cents"),
        )
        .select(
            "entity_id",
            "timestamp",
            "event_id",
            F.lit("purchase_fixed").alias("event_type"),
            "value_cents",
        )
    )
    fs.upsert("ev", patch)
    return fs.get_version("ev", 2).select(
        "entity_id",
        _US("timestamp").alias("ts_us"),
        "event_id",
        "event_type",
        "value_cents",
    )


def q_f23_expire_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level TTL through the public API (store.py expire_features):
    drop everything before Jan 20 as a NEW version, keeping the
    pre-expiry version time-travelable (copy-on-write — expiry is a
    recorded, auditable event, not a silent rewrite). Output: per-type
    row accounting of the post-TTL version plus the v1 row count, which
    pins BOTH sides — rows correctly dropped from v2 AND v1 left
    intact. The TTL predicate is get()'s pushdown-friendly temporal
    filter, so with date partitioning expired partitions prune at file
    listing."""
    import datetime as dt

    from .store import FeatureStore

    feats = _cents_features(spark, sf_dir)
    fs = FeatureStore(spark, storage_path=_scratch_dir("f23_expire", sf_dir))
    fs.register("ev", feats)
    fs.expire_features("ev", dt.datetime(2024, 1, 20))
    kept = fs.get_version("ev", 2)
    v1_rows = F.broadcast(
        fs.get_version("ev", 1).agg(F.count("*").alias("v1_rows"))
    )
    return (
        kept.groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("value_cents").alias("sum_value_cents"),
            F.min(_US("timestamp")).alias("min_ts_us"),
        )
        .crossJoin(v1_rows)
    )


def q_f24_erase_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR erasure through the public API (store.py erase_entities):
    build a 2-version table (even event_ids, then append the odd ones),
    erase users {3, 7, 11} from EVERY retained version in place (NOT
    copy-on-write — the point of erasure is that no time-travelable
    copy survives), and emit the audit: per version, rows_removed plus
    the post-erasure row count and an order-independent md5 content
    checksum. The oracle recomputes each version's surviving multiset
    straight from the source, so a row that survived erasure — or a
    non-matching row that got dropped — hash-mismatches. Scale shape:
    the IN-list anti-filter is a map-only predicate; only affected
    versions are rewritten."""
    from .store import FeatureStore

    feats = _cents_features(spark, sf_dir)
    fs = FeatureStore(spark, storage_path=_scratch_dir("f24_erase", sf_dir))
    fs.register("ev", feats.filter(F.col("event_id") % 2 == 0))
    fs.append("ev", feats.filter(F.col("event_id") % 2 == 1))
    removed = fs.erase_entities("ev", [3, 7, 11])
    chk = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ",", "entity_id", F.unix_micros("timestamp"), "event_id"
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(1 << 31)
    )
    parts = []
    for v in (1, 2):
        parts.append(
            fs.get_version("ev", v).agg(
                F.lit(v).cast("long").alias("version"),
                F.lit(removed.get(("ev", v), 0)).cast("long").alias("rows_removed"),
                F.count("*").alias("n_rows"),
                F.sum(chk).alias("content_check"),
            )
        )
    return parts[0].unionByName(parts[1])


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


def q_ts3_seasonal_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecasting backtest — the baseline every demand/
    load forecast must beat, and the third leg of the time-series family
    (ts1 ffill, ts2 interpolate, ts3 backtest). Daily event counts per
    event_type; forecast(day) = actual(day - 7); score the final 14 days
    with integer absolute errors (counts are exact — no float metric).
    Emits per-type MAE in e2 units plus the naive-1 (yesterday) MAE, so
    the row also shows WHY weekly seasonality matters. Plan: one daily
    partial-agg rollup, lag(7)/lag(1) over a per-type window ordered by
    day — a single shuffle on event_type, 5-row output."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "day",
        "n",
        F.lag("n", 7).over(w).alias("pred_seasonal"),
        F.lag("n", 1).over(w).alias("pred_naive"),
        F.max("day").over(Window.partitionBy("event_type")).alias("max_day"),
    )
    test = lagged.filter(
        (F.col("day") > F.col("max_day") - F.expr("INTERVAL 14 DAYS"))
        & F.col("pred_seasonal").isNotNull()
        & F.col("pred_naive").isNotNull()
    )
    return test.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.expr(
            "sum(abs(n - pred_seasonal)) * 100L div count(*)"
        ).alias("mae_seasonal_e2"),
        F.expr("sum(abs(n - pred_naive)) * 100L div count(*)").alias(
            "mae_naive_e2"
        ),
    )


def q_x26_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-pipeline quality eval — x19's trust-but-verify applied to
    MinHash-LSH instead of ANN: for 50 md5-sampled probe docs, compute
    the EXACT ground truth (every corpus doc with 3-shingle Jaccard >=
    0.5 against the probe — a probe x corpus scan, bounded at any SF by
    the fixed probe count) and report how many of those true pairs the
    banded LSH candidate generation (x6, same portable md5-affine
    family) actually surfaced. Recall misses here mean real near-dups
    silently survive dedup — the number you check before trusting
    bands/hashes settings on 100 TB. Integer counts; recall defined
    1e6 when no truth pairs exist."""
    from .operators.dedup import dedup_minhash_lsh, ngram_jaccard

    docs = table(spark, sf_dir, "documents")
    draw = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
    )
    probes = (
        docs.select("doc_id", draw.alias("d"))
        .orderBy("d", "doc_id")
        .limit(50)
        .select(F.col("doc_id").alias("id_a"))
    )
    all_ids = docs.select(F.col("doc_id").alias("id_b"))
    probe_pairs = (
        probes.crossJoin(all_ids).filter(F.col("id_a") != F.col("id_b"))
    )
    truth = (
        ngram_jaccard(docs, probe_pairs, threshold=0.5)
        .select(
            F.least("id_a", "id_b").alias("lo"),
            F.greatest("id_a", "id_b").alias("hi"),
        )
        .distinct()
    )
    cand = dedup_minhash_lsh(
        docs, num_hashes=16, bands=4, hash_family="md5_affine"
    ).select(F.col("id_a").alias("lo"), F.col("id_b").alias("hi"))
    found = truth.join(cand, ["lo", "hi"])
    return truth.agg(F.count("*").alias("n_truth")).crossJoin(
        found.agg(F.count("*").alias("n_found"))
    ).select(
        F.lit(50).cast("long").alias("n_probes"),
        "n_truth",
        "n_found",
        F.expr(
            "CASE WHEN n_truth = 0 THEN 1000000L "
            "ELSE n_found * 1000000L div n_truth END"
        ).alias("recall_e6"),
    )


def q_f21_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (operators/asof.py asof_join_forward — pandas
    merge_asof direction='forward' parity, property-tested against
    pandas): each view takes its user's NEXT purchase within 12 hours —
    one matched row per view with the exact time-to-convert, where a16's
    funnel only counts conversions. Completes merge_asof surface parity:
    f7 backward, f18 nearest, f21 forward. Same join-free single-shuffle
    union plan; the oracle replays it as a banded forward argmin."""
    from .operators.asof import asof_join_forward

    ev = table(spark, sf_dir, "events")
    feats = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("entity_id"),
        F.col("ts").alias("timestamp"),
        "value",
        F.col("event_id").alias("__row_id__"),
    )
    spine = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("entity_id"), F.col("ts").alias("timestamp")
    )
    out = asof_join_forward(
        spine, feats, tolerance_seconds=12 * 3600, keep_spine_ts=True
    )
    return out.select(
        F.col("entity_id").alias("user_id"),
        _US("as_of_timestamp").alias("view_us"),
        _US("timestamp").alias("buy_us"),
        "value",
        (F.unix_micros("timestamp") - F.unix_micros("as_of_timestamp")).alias(
            "time_to_convert_us"
        ),
    )


def q_f18b_asof_nearest_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """f18 through the BANDED plan (operators/asof.py
    asof_join_nearest_banded): shuffle re-keyed on (user, floor(ts/6h))
    with the spine exploded to 3 tolerance buckets, per-spine argmin as
    a partial-agg min_by — the hot-entity treatment (f15b's recipe)
    applied to the nearest direction, where the union plan would
    serialize a hot user into one window task. Same oracle as f18: two
    different physical plans, one answer (the x9 independent-check
    recipe); equivalence also property-tested."""
    from .operators.asof import asof_join_nearest_banded

    ev = table(spark, sf_dir, "events")
    feats = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("entity_id"),
        F.col("ts").alias("timestamp"),
        "value",
        F.col("event_id").alias("__row_id__"),
    )
    spine = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("entity_id"), F.col("ts").alias("timestamp")
    )
    out = asof_join_nearest_banded(
        spine, feats, tolerance_seconds=6 * 3600, keep_spine_ts=True
    )
    return out.select(
        F.col("entity_id").alias("user_id"),
        _US("timestamp").alias("feature_us"),
        "value",
        _US("as_of_timestamp").alias("spine_us"),
    )


def q_a20_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle — the product-analytics staple: users
    cohorted by first-seen ISO week; each later week reports how many of
    the cohort were active (and the integer retention rate). Sessions
    (x7) say how long visits last, funnels (a16) say how one visit
    converts; retention says whether users COME BACK. Plan: per-user
    first-week argmin (one partial-agg shuffle), distinct (user, week)
    activity pairs, one key join + count — no window over history, all
    exact integers. The triangle is |cohorts| x |weeks| rows no matter
    the input size."""
    ev = table(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    first = ev.groupBy("user_id").agg(F.min(wk).alias("cohort"))
    act = ev.select("user_id", wk.alias("week")).distinct()
    sizes = first.groupBy("cohort").agg(F.count("*").alias("cohort_size"))
    tri = (
        act.join(first, "user_id")
        .groupBy("cohort", "week")
        .agg(F.count("*").alias("n_active"))
        .join(F.broadcast(sizes), "cohort")
    )
    return tri.select(
        _US("cohort").alias("cohort_us"),
        F.floor(
            (F.unix_micros("week") - F.unix_micros("cohort"))
            / F.lit(7 * 86400 * 1_000_000)
        ).alias("weeks_since"),
        "n_active",
        "cohort_size",
        F.expr("n_active * 10000L div cohort_size").alias("retention_e4"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "t6_explode_tokens": q_t6_explode_tokens,
    "dq1_column_profile": q_dq1_column_profile,
    "arr2_vector_centroids": q_arr2_vector_centroids,
    "x16_tfidf_topk": q_x16_tfidf_topk,
    "f9_diff_versions": q_f9_diff_versions,
    "pack1_sequence_packing": q_pack1_sequence_packing,
    "pipe1_clean_corpus": q_pipe1_clean_corpus,
    "io4_text_roundtrip": q_io4_text_roundtrip,
    "a10_hll_sketch": q_a10_hll_sketch,
    "m5_audio_decode": q_m5_audio_decode,
    "p2_unpivot": q_p2_unpivot,
    "map1_map_functions": q_map1_map_functions,
    "r2_interval_join": q_r2_interval_join,
    "f1_register_pit_get": q_f1_register_pit_get,
    "f2_temporal_filter": q_f2_temporal_filter,
    "f3_entity_filter": q_f3_entity_filter,
    "f4_latest_per_entity": q_f4_latest_per_entity,
    "f6_pit_lookup": q_f6_pit_lookup,
    "f6b_pit_orders": q_f6b_pit_orders,
    "f7_asof_join": q_f7_asof_join,
    "f7_asof_join_grid": q_f7_asof_join_grid,
    "f7c_asof_tolerance": q_f7c_asof_tolerance,
    "f8_version_travel": q_f8_version_travel,
    "f10_sql_over_views": q_f10_sql_over_views,
    "j1_join_broadcast": q_j1_join_broadcast,
    "j2_join_shuffle": q_j2_join_shuffle,
    "j3_semi_anti": q_j3_semi_anti,
    "a1_agg_entity_stats": q_a1_agg_entity_stats,
    "a2_rolling_window": q_a2_rolling_window,
    "a3_agg_distinct": q_a3_agg_distinct,
    "a4_approx_distinct": q_a4_approx_distinct,
    "a5_cube_rollup": q_a5_cube_rollup,
    "q1_pricing_summary": q_q1_pricing_summary,
    "q3_shipping_priority": q_q3_shipping_priority,
    "q5_local_supplier": q_q5_local_supplier,
    "q6_forecast_revenue": q_q6_forecast_revenue,
    "r1_range_join": q_r1_range_join,
    "d1_date_functions": q_d1_date_functions,
    "a7_percentiles": q_a7_percentiles,
    "g1_grouping_sets": q_g1_grouping_sets,
    "t3_token_count": q_t3_token_count,
    "q18_large_orders": q_q18_large_orders,
    "a2b_multi_window": q_a2b_multi_window,
    "h1_time_rollup": q_h1_time_rollup,
    "io2_json_roundtrip": q_io2_json_roundtrip,
    "x10_ivf_ann": q_x10_ivf_ann,
    "x11_embedding_dedup": q_x11_embedding_dedup,
    "m2_frame_sample": q_m2_frame_sample,
    "u2_intersect_except": q_u2_intersect_except,
    "io1_csv_roundtrip": q_io1_csv_roundtrip,
    "s1_topk_orders": q_s1_topk_orders,
    "s2_topk_per_group": q_s2_topk_per_group,
    "u1_union_by_name": q_u1_union_by_name,
    "x5_json_extract": q_x5_json_extract,
    "x3_dedup_exact": q_x3_dedup_exact,
    "x4_text_stats": q_x4_text_stats,
    "t1_lang_id": q_t1_lang_id,
    "t2_quality_score": q_t2_quality_score,
    "t4_fingerprint": q_t4_fingerprint,
    "x1_knn_cosine_topk": q_x1_knn_cosine_topk,
    "x2_similar_pairs": q_x2_similar_pairs,
    "x7_sessionize": q_x7_sessionize,
    "w1_tumbling_window": q_w1_tumbling_window,
    "a6_lag_lead": q_a6_lag_lead,
    "p1_pivot": q_p1_pivot,
    "w2_sliding_window": q_w2_sliding_window,
    "x7b_session_stats": q_x7b_session_stats,
    "m1_multimodal_decode": q_m1_multimodal_decode,
    "m3_image_features": q_m3_image_features,
    "x6_dedup_fuzzy": q_x6_dedup_fuzzy,
    "x6b_jaccard_verify": q_x6b_jaccard_verify,
    "x8_ann_lsh": q_x8_ann_lsh,
    "x9_simhash": q_x9_simhash,
    "a8_rank_family": q_a8_rank_family,
    "t5_string_functions": q_t5_string_functions,
    "io3_orc_roundtrip": q_io3_orc_roundtrip,
    "x12_hash_split": q_x12_hash_split,
    "x13_stratified_sample": q_x13_stratified_sample,
    "x14_kmeans": q_x14_kmeans,
    "ts1_resample_ffill": q_ts1_resample_ffill,
    "f11_scd2_intervals": q_f11_scd2_intervals,
    "arr1_array_functions": q_arr1_array_functions,
    "h2_value_histogram": q_h2_value_histogram,
    "a9_stats_agg": q_a9_stats_agg,
    "x15_dedup_components": q_x15_dedup_components,
    "m4_grouped_pandas": q_m4_grouped_pandas,
    "a11_distinct_salted": q_a11_distinct_salted,
    "a12_quantile_hist": q_a12_quantile_hist,
    "c1_doc_chunk": q_c1_doc_chunk,
    "t7_pii_redact": q_t7_pii_redact,
    "t8_repetition": q_t8_repetition,
    "emb1_quantize": q_emb1_quantize,
    "h3_incremental_rollup": q_h3_incremental_rollup,
    "f13_pit_window_agg": q_f13_pit_window_agg,
    "dq2_outliers": q_dq2_outliers,
    "ts2_interpolate": q_ts2_interpolate,
    "er1_entity_resolution": q_er1_entity_resolution,
    "b1_bucketed_join": q_b1_bucketed_join,
    "io5_partitioned_pruning": q_io5_partitioned_pruning,
    "f14_multi_view_training_set": q_f14_multi_view_training_set,
    "pipe2_quality_dedup": q_pipe2_quality_dedup,
    "g2_pagerank": q_g2_pagerank,
    "g2b_pagerank_dangling": q_g2b_pagerank_dangling,
    "decon1_contamination": q_decon1_contamination,
    "a14_approx_percentile": q_a14_approx_percentile,
    "shuf1_training_shards": q_shuf1_training_shards,
    "x17_pq_ann": q_x17_pq_ann,
    "dq3_feature_drift": q_dq3_feature_drift,
    "t4b_winnow_sketch": q_t4b_winnow_sketch,
    "io6_schema_evolution": q_io6_schema_evolution,
    "f7e_asof_left": q_f7e_asof_left,
    "f15_decayed_features": q_f15_decayed_features,
    "f15b_decayed_bucketed": q_f15b_decayed_bucketed,
    "sd2_running_state_snapshot": q_sd2_running_state_snapshot,
    "fe1_target_encoding": q_fe1_target_encoding,
    "fe2_feature_hash": q_fe2_feature_hash,
    "dq5_ks_statistic": q_dq5_ks_statistic,
    "x21_bpe_train": q_x21_bpe_train,
    "x22_semdedup": q_x22_semdedup,
    "x23_bpe_encode": q_x23_bpe_encode,
    "a18_cms_heavy_hitters": q_a18_cms_heavy_hitters,
    "dq6_leakage_audit": q_dq6_leakage_audit,
    "rag2_ndcg_eval": q_rag2_ndcg_eval,
    "mix1_domain_mixture": q_mix1_domain_mixture,
    "x24_importance_score": q_x24_importance_score,
    "g3b_triangle_degree_ordered": q_g3b_triangle_degree_ordered,
    "t11_dup_span_profile": q_t11_dup_span_profile,
    "r3_interval_left_join": q_r3_interval_left_join,
    "f18_asof_nearest": q_f18_asof_nearest,
    "a19_bottomk_sample": q_a19_bottomk_sample,
    "dq7_lateness_profile": q_dq7_lateness_profile,
    "x25_containment_dedup": q_x25_containment_dedup,
    "f20_scd2_dim_join": q_f20_scd2_dim_join,
    "io8_compaction": q_io8_compaction,
    "f22_upsert_patch": q_f22_upsert_patch,
    "f23_expire_ttl": q_f23_expire_ttl,
    "f24_erase_audit": q_f24_erase_audit,
    "pack2_rank_pairing": q_pack2_rank_pairing,
    "ts3_seasonal_backtest": q_ts3_seasonal_backtest,
    "x26_lsh_recall_eval": q_x26_lsh_recall_eval,
    "f21_asof_forward": q_f21_asof_forward,
    "f18b_asof_nearest_banded": q_f18b_asof_nearest_banded,
    "a20_retention_cohorts": q_a20_retention_cohorts,
    "t9_ngram_counts": q_t9_ngram_counts,
    "t10_pmi_collocations": q_t10_pmi_collocations,
    "g3_triangle_count": q_g3_triangle_count,
    "a17_covariance_matrix": q_a17_covariance_matrix,
    "rag1_hybrid_search": q_rag1_hybrid_search,
    "s3_bm25_search": q_s3_bm25_search,
    "io7_corrupt_records": q_io7_corrupt_records,
    "f16_label_window": q_f16_label_window,
    "f16b_label_window_frames": q_f16b_label_window_frames,
    "a16_funnel": q_a16_funnel,
    "x18_negative_sampling": q_x18_negative_sampling,
    "pipe3_curation_pipeline": q_pipe3_curation_pipeline,
    "x19_pq_recall": q_x19_pq_recall,
    "m6_modality_router": q_m6_modality_router,
    "x20_bpe_pair_counts": q_x20_bpe_pair_counts,
    "dq4_referential_integrity": q_dq4_referential_integrity,
}


_F15_SQL = f"""
    WITH ev AS (
        SELECT user_id, ts, event_id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM ({_EV})
    ),
    s AS (SELECT user_id, ts, event_id AS spine_id FROM ev
          WHERE event_id % 10 = 0),
    w AS (SELECT * FROM (VALUES {", ".join(f"({h}, {wgt})" for h, wgt in enumerate(_DECAY_MICRO))})
               AS t(h, wt))
    SELECT s.user_id, epoch_us(s.ts) AS ts_us, s.spine_id,
           CAST(COUNT(e.cents) AS BIGINT) AS n_events,
           CAST(COALESCE(SUM(e.cents * w.wt), 0) AS BIGINT) AS decayed_micro
    FROM s LEFT JOIN ev e
      ON e.user_id = s.user_id
     AND e.ts <= s.ts
     AND e.ts > s.ts - INTERVAL 7 DAY
    LEFT JOIN w
      ON w.h = CAST(floor((epoch_us(s.ts) - epoch_us(e.ts)) / 3600000000.0)
                    AS INT)
    GROUP BY s.user_id, s.ts, s.spine_id
"""


# x2/x11/x15 block their pair self-joins on (label, sign-LSH bucket); the
# oracle recomputes the bucket from the SAME seeded hyperplanes inlined as
# SQL literals (Python float repr round-trips exactly) with the SAME
# left-fold dot order as functions/vector.dot — the x8 recipe — so bucket
# membership, and therefore the candidate-pair set, matches bit-for-bit.
from .operators.similarity import _random_hyperplanes  # noqa: E402


def _lsh_bucket_sql(vec: str = "v", dim: int = 64, bits: int = 4, seed: int = 42) -> str:
    planes = _random_hyperplanes(dim=dim, bits=bits, seed=seed)

    def dot_sql(plane: list[float]) -> str:
        expr = "0.0"
        for j, p in enumerate(plane):
            expr = f"({expr} + {vec}[{j + 1}] * {p!r})"
        return expr

    return "CAST(" + " + ".join(
        f"(CASE WHEN {dot_sql(plane)} >= 0 THEN {2 ** i} ELSE 0 END)"
        for i, plane in enumerate(planes)
    ) + " AS BIGINT)"


_LSH4_BUCKET = _lsh_bucket_sql()

ORACLE_SQL: dict[str, str] = {
    "pack1_sequence_packing": """
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
    """,
    "pipe1_clean_corpus": """
        WITH filtered AS (
            SELECT *, CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
            WHERE length(string_split(text, ' ')) BETWEEN 10 AND 2000
              AND n_chars * 1.0 / length(string_split(text, ' ')) BETWEEN 2.0 AND 14.0
        ),
        deduped AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS rn
                FROM filtered
            ) WHERE rn = 1
        )
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               ROUND(AVG(n_chars), 4) AS avg_chars
        FROM deduped GROUP BY 1
    """,
    "f9_diff_versions": f"""
        WITH base AS (
            SELECT user_id AS entity_id, ts, event_type, value FROM ({_EV})
        ),
        v1 AS (SELECT * FROM base WHERE ts < TIMESTAMP '2024-01-15'),
        v2 AS (
            SELECT entity_id, ts, event_type,
                   CASE WHEN event_type = 'purchase' THEN value * 2
                        ELSE value END AS value
            FROM base WHERE ts < TIMESTAMP '2024-01-20'
        ),
        o AS (
            SELECT entity_id, ts,
                   md5(array_to_string(list_sort(list(event_type || chr(1) || value::VARCHAR)), ',')) AS kh,
                   COUNT(*) AS kn
            FROM v1 GROUP BY 1, 2
        ),
        n AS (
            SELECT entity_id, ts,
                   md5(array_to_string(list_sort(list(event_type || chr(1) || value::VARCHAR)), ',')) AS kh,
                   COUNT(*) AS kn
            FROM v2 GROUP BY 1, 2
        ),
        d AS (
            SELECT CASE WHEN o.kh IS NULL THEN 'added'
                        WHEN n.kh IS NULL THEN 'removed'
                        ELSE 'changed' END AS change_type,
                   COALESCE(o.kn, 0) AS orw, COALESCE(n.kn, 0) AS nrw
            FROM o FULL OUTER JOIN n USING (entity_id, ts)
            WHERE o.kh IS NULL OR n.kh IS NULL OR o.kh <> n.kh
        )
        SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(orw) AS BIGINT) AS old_rows,
               CAST(SUM(nrw) AS BIGINT) AS new_rows
        FROM d GROUP BY 1
    """,
    "x16_tfidf_topk": """
        WITH tokens AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ),
        tf AS (
            SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
            FROM tokens WHERE length(token) > 0
            GROUP BY 1, 2
        ),
        dfreq AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
        ),
        weighted AS (
            SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
                   ROUND(tf.tf * ln((SELECT COUNT(*) FROM documents) * 1.0 / dfreq.df), 6) AS weight
            FROM tf JOIN dfreq USING (token)
        )
        SELECT doc_id, token, tf, df, weight, CAST(rk AS INTEGER) AS rk
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY weight DESC, token ASC) AS rk
            FROM weighted
        )
        WHERE rk <= 3
    """,
    "io4_text_roundtrip": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(length(text)) AS BIGINT) AS total_chars,
               CAST(SUM(length(string_split(text, ' '))) AS BIGINT) AS total_tokens,
               CAST(MIN(length(text)) AS BIGINT) AS min_len,
               CAST(MAX(length(text)) AS BIGINT) AS max_len
        FROM documents
    """,
    "arr2_vector_centroids": """
        WITH cnt AS (
            SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs
            FROM embeddings GROUP BY 1
        ),
        ex AS (
            SELECT label,
                   unnest(embedding) AS v,
                   generate_subscripts(embedding, 1) AS dim
            FROM embeddings
        )
        SELECT ex.label, cnt.n_vecs, CAST(ex.dim AS INTEGER) AS dim,
               ROUND(AVG(ex.v), 6) AS coord
        FROM ex JOIN cnt USING (label)
        GROUP BY ex.label, cnt.n_vecs, ex.dim
    """,
    "dq1_column_profile": """
        SELECT 'l_quantity' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
               ROUND(MIN(l_quantity), 4) AS min_val, ROUND(MAX(l_quantity), 4) AS max_val,
               ROUND(AVG(l_quantity), 4) AS avg_val
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT),
               ROUND(MIN(l_extendedprice), 4), ROUND(MAX(l_extendedprice), 4),
               ROUND(AVG(l_extendedprice), 4)
        FROM lineitem
        UNION ALL
        SELECT 'l_discount', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(DISTINCT l_discount) AS BIGINT),
               ROUND(MIN(l_discount), 4), ROUND(MAX(l_discount), 4),
               ROUND(AVG(l_discount), 4)
        FROM lineitem
        UNION ALL
        SELECT 'l_tax', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(DISTINCT l_tax) AS BIGINT),
               ROUND(MIN(l_tax), 4), ROUND(MAX(l_tax), 4),
               ROUND(AVG(l_tax), 4)
        FROM lineitem
    """,
    "m5_audio_decode": """
        SELECT doc_id,
               octet_length(encode(text)) AS byte_len,
               CAST(8000 * (1 + (('0x' || substr(sha256(text), 7, 2))::INTEGER % 5)) AS INTEGER) AS sample_rate,
               CAST(octet_length(encode(text)) * 32 AS BIGINT) AS n_samples,
               ROUND((octet_length(encode(text)) * 32)
                     / (8000.0 * (1 + (('0x' || substr(sha256(text), 7, 2))::INTEGER % 5))), 4) AS duration_s,
               CAST((octet_length(encode(text)) * 32
                     + 8000 * (1 + (('0x' || substr(sha256(text), 7, 2))::INTEGER % 5)) - 1)
                    // (8000 * (1 + (('0x' || substr(sha256(text), 7, 2))::INTEGER % 5))) AS INTEGER) AS n_windows
        FROM documents
    """,
    "t6_explode_tokens": """
        SELECT doc_id, CAST(pos AS BIGINT) AS pos, token
        FROM (
            SELECT doc_id,
                   unnest(string_split(text, ' ')) AS token,
                   generate_subscripts(string_split(text, ' '), 1) AS pos
            FROM documents
            WHERE doc_id < 100
        )
        WHERE length(token) >= 7
    """,
    "p2_unpivot": """
        WITH agg AS (
            SELECT l_returnflag,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base,
                   ROUND(SUM(l_discount), 2) AS sum_disc
            FROM lineitem GROUP BY 1
        )
        SELECT l_returnflag, metric, value
        FROM agg UNPIVOT (value FOR metric IN (sum_qty, sum_base, sum_disc))
    """,
    "map1_map_functions": f"""
        SELECT event_id,
               CAST(CASE WHEN value > 10 THEN 1 ELSE 0 END
                    + CASE WHEN value * 2 > 10 THEN 1 ELSE 0 END
                    + CASE WHEN k > 10 THEN 1 ELSE 0 END AS INTEGER) AS n_big,
               ROUND(value / 10.0, 4) AS v_scaled,
               ROUND(k / 10.0, 4) AS k_scaled,
               COALESCE(array_to_string(list_filter(
                   [CASE WHEN value > 10 THEN 'v' END,
                    CASE WHEN value * 2 > 10 THEN 'v2' END,
                    CASE WHEN k > 10 THEN 'k' END],
                   x -> x IS NOT NULL), ','), '') AS big_keys
        FROM (SELECT event_id, value,
                     CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
              FROM ({_EV}) WHERE event_id < 2000)
    """,
    "r2_interval_join": f"""
        SELECT v.user_id,
               v.event_id AS view_id,
               b.event_id AS buy_id,
               epoch_us(v.ts) AS view_us,
               epoch_us(b.ts) AS buy_us
        FROM ({_EV}) v
        JOIN ({_EV}) b
          ON v.user_id = b.user_id
         AND b.ts > v.ts
         AND b.ts <= v.ts + INTERVAL 2 HOUR
        WHERE v.event_type = 'view' AND b.event_type = 'purchase'
    """,
    "f1_register_pit_get": f"""
        SELECT user_id, epoch_us(ts) AS ts_us, value FROM (
            SELECT user_id, ts, value, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id ASC) AS rn
            FROM ({_EV})
            WHERE ts <= TIMESTAMP '2024-01-25 00:00:00' AND user_id < 20
        ) WHERE rn = 1
    """,
    "f2_temporal_filter": f"""
        SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
        FROM ({_EV}) WHERE ts <= TIMESTAMP '2024-01-10 00:00:00'
    """,
    "f3_entity_filter": f"""
        SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
        FROM ({_EV}) WHERE user_id IN (1,3,5,7,11)
    """,
    "f4_latest_per_entity": f"""
        SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id ASC) AS rn
            FROM ({_EV})
        ) WHERE rn = 1
    """,
    "f6_pit_lookup": f"""
        SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id ASC) AS rn
            FROM ({_EV})
            WHERE ts <= TIMESTAMP '2024-01-20 00:00:00' AND user_id BETWEEN 0 AND 9
        ) WHERE rn = 1
    """,
    "f7_asof_join": f"""
        WITH f AS ({_EV}),
        s AS (SELECT user_id, ts AS sts FROM f WHERE event_type = 'purchase')
        SELECT user_id, event_id, ts_us, event_type, value, as_of_us FROM (
            SELECT s.user_id, f.event_id, epoch_us(f.ts) AS ts_us, f.event_type,
                   f.value, epoch_us(s.sts) AS as_of_us,
                   row_number() OVER (PARTITION BY s.user_id, s.sts
                                      ORDER BY f.ts DESC, f.event_id ASC) AS rn
            FROM s JOIN f ON s.user_id = f.user_id AND f.ts <= s.sts
        ) WHERE rn = 1
    """,
    "f7e_asof_left": f"""
        WITH f AS ({_EV}),
        g AS (SELECT * FROM (VALUES (TIMESTAMP '2024-01-02'),
                                    (TIMESTAMP '2024-01-15')) AS t(sts)),
        s AS (SELECT DISTINCT user_id FROM f),
        spine AS (SELECT s.user_id, g.sts FROM s CROSS JOIN g)
        SELECT user_id, event_id, ts_us, value, as_of_us FROM (
            SELECT spine.user_id, f.event_id, epoch_us(f.ts) AS ts_us, f.value,
                   epoch_us(spine.sts) AS as_of_us,
                   row_number() OVER (PARTITION BY spine.user_id, spine.sts
                                      ORDER BY f.ts DESC, f.event_id ASC) AS rn
            FROM spine LEFT JOIN f
              ON spine.user_id = f.user_id AND f.ts <= spine.sts
        ) WHERE rn = 1
    """,
    "f7_asof_join_grid": f"""
        WITH f AS ({_EV}),
        g AS (SELECT * FROM (VALUES (TIMESTAMP '2024-01-08'),
                                    (TIMESTAMP '2024-01-15'),
                                    (TIMESTAMP '2024-01-22')) AS t(sts)),
        s AS (SELECT DISTINCT user_id FROM f),
        spine AS (SELECT s.user_id, g.sts FROM s CROSS JOIN g)
        SELECT user_id, event_id, ts_us, value, as_of_us FROM (
            SELECT spine.user_id, f.event_id, epoch_us(f.ts) AS ts_us, f.value,
                   epoch_us(spine.sts) AS as_of_us,
                   row_number() OVER (PARTITION BY spine.user_id, spine.sts
                                      ORDER BY f.ts DESC, f.event_id ASC) AS rn
            FROM spine JOIN f ON spine.user_id = f.user_id AND f.ts <= spine.sts
        ) WHERE rn = 1
    """,
    "f6b_pit_orders": """
        SELECT o_custkey, order_ts_us, o_orderkey, o_totalprice FROM (
            SELECT o_custkey, epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS order_ts_us,
                   o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate DESC, o_orderkey ASC) AS rn
            FROM orders
            WHERE CAST(o_orderdate AS TIMESTAMP) <= TIMESTAMP '1997-12-31 23:59:59'
        ) WHERE rn = 1
    """,
    "f7c_asof_tolerance": f"""
        WITH f AS ({_EV}),
        g AS (SELECT * FROM (VALUES (TIMESTAMP '2024-01-05'),
                                    (TIMESTAMP '2024-01-20')) AS t(sts)),
        spine AS (SELECT user_id, sts FROM (SELECT DISTINCT user_id FROM f) CROSS JOIN g)
        SELECT user_id, event_id, ts_us, value, as_of_us FROM (
            SELECT spine.user_id, f.event_id, epoch_us(f.ts) AS ts_us, f.value,
                   epoch_us(spine.sts) AS as_of_us, f.ts, spine.sts,
                   row_number() OVER (PARTITION BY spine.user_id, spine.sts
                                      ORDER BY f.ts DESC, f.event_id ASC) AS rn
            FROM spine JOIN f ON spine.user_id = f.user_id AND f.ts <= spine.sts
        ) WHERE rn = 1 AND ts >= sts - INTERVAL 48 HOURS
    """,
    "f10_sql_over_views": """
        SELECT event_type, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
        FROM events GROUP BY event_type
    """,
    "f8_version_travel": f"""
        SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value
        FROM ({_EV})
    """,
    "j1_join_broadcast": """
        SELECT r_name, n_name, COUNT(*) AS n_customers,
               ROUND(SUM(c_acctbal), 2) AS sum_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    "j2_join_shuffle": """
        SELECT o_orderpriority, COUNT(*) AS n_lineitems,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_revenue
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority
    """,
    "j3_semi_anti": """
        SELECT c_custkey, 1 AS has_open FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        UNION ALL
        SELECT c_custkey, 0 AS has_open FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    """,
    "a1_agg_entity_stats": """
        SELECT user_id, COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS sum_value,
               ROUND(AVG(value), 4) AS avg_value,
               ROUND(MIN(value), 2) AS min_value,
               ROUND(MAX(value), 2) AS max_value
        FROM events GROUP BY user_id
    """,
    "a2_rolling_window": f"""
        SELECT event_id, user_id, ts_us,
               COUNT(*) OVER w AS cnt_7d,
               ROUND(SUM(value) OVER w, 2) AS sum_7d
        FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM ({_EV}))
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                     RANGE BETWEEN {_7D_US} PRECEDING AND CURRENT ROW)
    """,
    "a3_agg_distinct": """
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
        FROM events GROUP BY event_type
    """,
    "a5_cube_rollup": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
               ROUND(CAST(SUM(l_quantity) AS DOUBLE), 2) AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(CAST(SUM(l_quantity) AS DOUBLE), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               ROUND(AVG(l_discount), 4) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE CAST(l_shipdate AS TIMESTAMP) <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "s1_topk_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    "s2_topk_per_group": """
        SELECT o_custkey, o_orderkey, o_totalprice FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
            FROM orders WHERE o_custkey < 50
        ) WHERE rn <= 3
    """,
    "u1_union_by_name": """
        SELECT DISTINCT c_custkey, c_mktsegment FROM customer
        WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    """,
    "x5_json_extract": """
        SELECT event_type, COUNT(*) AS n_events,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
        FROM events GROUP BY event_type
    """,
    "x3_dedup_exact": """
        SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        FROM documents GROUP BY md5(lower(trim(text)))
    """,
    "x4_text_stats": """
        SELECT lang, COUNT(*) AS n_docs,
               ROUND(AVG(n_chars), 4) AS avg_chars,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
               ROUND(AVG(len(string_split(text, ' '))), 4) AS avg_tokens
        FROM documents GROUP BY lang
    """,
    "t1_lang_id": """
        SELECT doc_id,
               ROUND(CAST(len(list_filter(string_split(text, ' '),
                     t -> list_contains(['the','a','of','and','in','to','is'], t))) AS DOUBLE)
                     / len(string_split(text, ' ')), 6) AS stop_ratio,
               CASE WHEN CAST(len(list_filter(string_split(text, ' '),
                     t -> list_contains(['the','a','of','and','in','to','is'], t))) AS DOUBLE)
                     / len(string_split(text, ' ')) > 0.05
                    THEN 'en' ELSE 'unk' END AS pred_lang
        FROM documents
    """,
    "t2_quality_score": f"""
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                     / len(string_split(text, ' ')), 6) AS uniq_ratio,
               ROUND(CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')), 6)
                     AS chars_per_token,
               ROUND(CAST(len(list_filter(string_split(text, ' '),
                         t -> t IN ({",".join(f"'{w}'" for w in ("a", "the", "of", "and"))})))
                         AS DOUBLE)
                     / len(string_split(text, ' ')), 6) AS stopword_ratio
        FROM documents
    """,
    "t4_fingerprint": """
        SELECT doc_id,
               md5(array_to_string(
                   (list_sort(list_distinct(string_split(text, ' '))))[1:8], ' '))
                   AS fingerprint
        FROM documents
    """,
    "x1_knn_cosine_topk": """
        WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
        SELECT vec_id, label, ROUND(list_cosine_similarity(v, qv), 6) AS sim
        FROM e CROSS JOIN q WHERE vec_id <> 0
        ORDER BY list_cosine_similarity(v, qv) DESC, vec_id ASC LIMIT 10
    """,
    "x2_similar_pairs": f"""
        WITH e0 AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        e AS (SELECT vec_id, label, v, {_LSH4_BUCKET} AS bucket FROM e0)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
               ROUND(list_cosine_similarity(a.v, b.v), 6) AS sim
        FROM e a JOIN e b
          ON a.label = b.label AND a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.v, b.v) >= 0.35
    """,
    "x7_sessionize": f"""
        WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM ({_EV})),
        l AS (SELECT user_id, ts_us,
                     CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
                          WHEN ts_us - lag(ts_us) OVER w > {_30MIN_US} THEN 1
                          ELSE 0 END AS new_sess
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
        s AS (SELECT user_id,
                     SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
                                         ROWS UNBOUNDED PRECEDING) AS session_id
              FROM l)
        SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions,
               COUNT(*) AS n_events
        FROM s GROUP BY user_id
    """,
    "w1_tumbling_window": f"""
        SELECT epoch_us(date_trunc('day', ts)) AS window_start_us, event_type,
               COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
        FROM ({_EV}) GROUP BY 1, 2
    """,
    "a6_lag_lead": f"""
        SELECT event_id, user_id, ts_us,
               ROUND(value - lag(value) OVER w, 2) AS delta_prev,
               ROUND(lead(value) OVER w - value, 2) AS delta_next
        FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM ({_EV}))
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    """,
    "p1_pivot": """
        SELECT user_id,
               COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
               COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
               COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
               COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
        FROM events GROUP BY user_id
    """,
    "w2_sliding_window": f"""
        SELECT epoch_us(date_trunc('day', ts) - (k || ' days')::INTERVAL)
                   AS window_start_us,
               event_type, COUNT(*) AS n_events
        FROM ({_EV}) CROSS JOIN (SELECT unnest(range(7)) AS k)
        GROUP BY 1, 2
    """,
    "x7b_session_stats": f"""
        WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, ts FROM ({_EV})),
        l AS (SELECT user_id, ts_us,
                     CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
                          WHEN ts_us - lag(ts_us) OVER w > {_30MIN_US} THEN 1
                          ELSE 0 END AS new_sess
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
        s AS (SELECT user_id, ts_us,
                     SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
                                         ROWS UNBOUNDED PRECEDING) AS session_id
              FROM l),
        per_sess AS (
            SELECT user_id, session_id, COUNT(*) AS n_events,
                   (MAX(ts_us) - MIN(ts_us)) / 1000000.0 AS duration_s
            FROM s GROUP BY user_id, session_id)
        SELECT user_id, COUNT(*) AS n_sessions,
               CAST(SUM(n_events) AS BIGINT) AS n_events,
               ROUND(AVG(n_events), 4) AS avg_events_per_session,
               ROUND(AVG(duration_s), 4) AS avg_duration_s
        FROM per_sess GROUP BY user_id
    """,
    "m1_multimodal_decode": """
        SELECT doc_id,
               octet_length(encode(text)) AS byte_len,
               64 + (('0x' || substr(sha256(text), 1, 2))::INTEGER % 192) AS width,
               64 + (('0x' || substr(sha256(text), 3, 2))::INTEGER % 192) AS height,
               1 + (('0x' || substr(sha256(text), 5, 2))::INTEGER % 3) AS n_channels
        FROM documents
    """,
    "q3_shipping_priority": """
        SELECT l_orderkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS o_orderdate_us,
               o_orderpriority
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-01'
          AND l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
    """,
    "q5_local_supplier": """
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*) AS n_lineitems
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name
    """,
    "q6_forecast_revenue": """
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount >= 0.03 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "r1_range_join": """
        WITH quarters(quarter, q_start, q_end) AS (VALUES
            ('1996Q1', TIMESTAMP '1996-01-01', TIMESTAMP '1996-04-01'),
            ('1996Q2', TIMESTAMP '1996-04-01', TIMESTAMP '1996-07-01'),
            ('1996Q3', TIMESTAMP '1996-07-01', TIMESTAMP '1996-10-01'),
            ('1996Q4', TIMESTAMP '1996-10-01', TIMESTAMP '1997-01-01'),
            ('1997Q1', TIMESTAMP '1997-01-01', TIMESTAMP '1997-04-01'),
            ('1997Q2', TIMESTAMP '1997-04-01', TIMESTAMP '1997-07-01'),
            ('1997Q3', TIMESTAMP '1997-07-01', TIMESTAMP '1997-10-01'),
            ('1997Q4', TIMESTAMP '1997-10-01', TIMESTAMP '1998-01-01'))
        SELECT quarter, COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_price
        FROM orders JOIN quarters
          ON o_orderdate >= q_start AND o_orderdate < q_end
        GROUP BY quarter
    """,
    "d1_date_functions": """
        SELECT o_orderkey,
               epoch_us(date_trunc('month', CAST(o_orderdate AS TIMESTAMP))) AS month_us,
               CAST(year(o_orderdate) AS INTEGER) AS yr,
               CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
               CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
               CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01')
                    AS INTEGER) AS days_to_1999
        FROM orders
    """,
    "a7_percentiles": """
        SELECT c_mktsegment,
               ROUND(quantile_cont(c_acctbal, 0.25), 4) AS p25,
               ROUND(quantile_cont(c_acctbal, 0.50), 4) AS p50,
               ROUND(quantile_cont(c_acctbal, 0.75), 4) AS p75,
               ROUND(AVG(c_acctbal), 4) AS mean_bal
        FROM customer GROUP BY c_mktsegment
    """,
    "g1_grouping_sets": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
               CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    "t3_token_count": """
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS INTEGER)
                   AS n_tokens,
               CAST(len(list_distinct(regexp_extract_all(text, '[A-Za-z0-9]+')))
                   AS INTEGER) AS n_distinct
        FROM documents
    """,
    "q18_large_orders": """
        SELECT c_custkey, c_name, o_orderkey, o_totalprice,
               ROUND(SUM(l_quantity), 2) AS total_qty
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)
        GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    """,
    "a2b_multi_window": f"""
        SELECT event_id, user_id, ts_us,
               COUNT(*) OVER w7 AS cnt_7d,
               ROUND(SUM(cents) OVER w7 / 100.0, 2) AS sum_7d,
               COUNT(*) OVER w30 AS cnt_30d,
               CAST((SUM(cents) OVER w30 * 100) // (COUNT(*) OVER w30)
                    AS BIGINT) AS avg_30d_e4
        FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                     CAST(ROUND(value * 100) AS BIGINT) AS cents FROM ({_EV}))
        WINDOW
          w7 AS (PARTITION BY user_id ORDER BY ts_us
                 RANGE BETWEEN {7 * 24 * 3600 * 1_000_000} PRECEDING AND CURRENT ROW),
          w30 AS (PARTITION BY user_id ORDER BY ts_us
                  RANGE BETWEEN {30 * 24 * 3600 * 1_000_000} PRECEDING AND CURRENT ROW)
    """,
    "h1_time_rollup": f"""
        SELECT hour_us, day_us, month_us,
               COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
        FROM (SELECT epoch_us(date_trunc('hour', ts)) AS hour_us,
                     epoch_us(date_trunc('day', ts)) AS day_us,
                     epoch_us(date_trunc('month', ts)) AS month_us,
                     value
              FROM ({_EV}))
        GROUP BY GROUPING SETS ((hour_us), (day_us), (month_us))
    """,
    "io2_json_roundtrip": """
        SELECT event_type, COUNT(*) AS n_events,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               MIN(event_id) AS min_event_id
        FROM events GROUP BY event_type
    """,
    "x11_embedding_dedup": f"""
        WITH e0 AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
        e AS (SELECT vec_id, label, v, {_LSH4_BUCKET} AS bucket FROM e0)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(list_cosine_similarity(a.v, b.v), 6) AS sim
        FROM e a JOIN e b
          ON a.vec_id < b.vec_id AND a.label = b.label AND a.bucket = b.bucket
        WHERE list_cosine_similarity(a.v, b.v) >= 0.40
    """,
    "m2_frame_sample": """
        WITH f AS (
            SELECT doc_id, octet_length(encode(text)) AS byte_len,
                   octet_length(encode(text)) % 270 + 30 AS n_frames
            FROM documents)
        SELECT doc_id, byte_len,
               CAST((n_frames - 1) // 30 + 1 AS INTEGER) AS n_sampled,
               CAST(((n_frames - 1) // 30) * 30 AS INTEGER) AS last_frame_idx
        FROM f
    """,
    "u2_intersect_except": """
        (SELECT o_custkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
         INTERSECT
         SELECT o_custkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01')
        EXCEPT ALL
        (SELECT DISTINCT o_custkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
           AND o_orderpriority = '1-URGENT')
    """,
    "io1_csv_roundtrip": """
        SELECT event_type, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value,
               MIN(event_id) AS min_event_id, MAX(event_id) AS max_event_id
        FROM events GROUP BY event_type
    """,
    "x10_ivf_ann": """
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 100),
        probes AS (SELECT cid FROM cents, q
                   ORDER BY list_cosine_similarity(cv, qv) DESC, cid ASC LIMIT 2),
        a AS (SELECT e.vec_id, e.v,
                     (SELECT cid FROM cents
                      ORDER BY list_cosine_similarity(e.v, cv) DESC, cid ASC
                      LIMIT 1) AS cell
              FROM e WHERE e.vec_id <> 100)
        SELECT vec_id, ROUND(list_cosine_similarity(a.v, q.qv), 6) AS sim
        FROM a, q WHERE cell IN (SELECT cid FROM probes)
        ORDER BY list_cosine_similarity(a.v, q.qv) DESC, vec_id ASC LIMIT 10
    """,
    "a8_rank_family": """
        SELECT o_custkey, o_orderkey,
               CAST(rank() OVER w AS BIGINT) AS rnk,
               CAST(dense_rank() OVER w AS BIGINT) AS drnk,
               ROUND(percent_rank() OVER w, 6) AS prnk,
               ROUND(cume_dist() OVER w, 6) AS cdist,
               CAST(ntile(4) OVER w AS BIGINT) AS quartile
        FROM orders WHERE o_custkey < 500
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "t5_string_functions": """
        SELECT p_partkey,
               upper(p_name) AS name_up,
               replace(p_name, ' ', '_') AS name_us,
               concat_ws('|', p_brand, p_type) AS brand_type,
               substring(p_name, 1, 4) AS name4,
               reverse(p_type) AS type_rev,
               regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num,
               CAST(levenshtein(p_brand, 'Brand#10') AS INTEGER) AS lev_b10,
               CAST(length(p_name) AS INTEGER) AS name_len
        FROM part
    """,
    "io3_orc_roundtrip": """
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               ROUND(SUM(l_extendedprice), 2) AS sum_price,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem WHERE l_quantity >= 25
        GROUP BY 1, 2
    """,
    "x12_hash_split": """
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
    """,
    "x13_stratified_sample": """
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
    """,
    "ts1_resample_ffill": """
        WITH days AS (
            SELECT CAST(unnest(generate_series(DATE '2024-01-01',
                                               DATE '2024-01-31',
                                               INTERVAL 1 DAY)) AS DATE) AS day
        ),
        users AS (SELECT DISTINCT user_id FROM events),
        daily AS (
            SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                   ROUND(MAX(value), 2) AS v_day,
                   CAST(COUNT(*) AS BIGINT) AS n_ev
            FROM events GROUP BY 1, 2
        )
        SELECT u.user_id, epoch_us(CAST(d.day AS TIMESTAMP)) AS day_us,
               COALESCE(dl.n_ev, 0) AS n_events,
               last_value(dl.v_day IGNORE NULLS) OVER (
                   PARTITION BY u.user_id ORDER BY d.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
        FROM users u CROSS JOIN days d
        LEFT OUTER JOIN daily dl ON dl.user_id = u.user_id AND dl.day = d.day
    """,
    "f11_scd2_intervals": f"""
        SELECT user_id, event_id, epoch_us(ts) AS valid_from_us,
               epoch_us(COALESCE(lead(ts) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id),
                        TIMESTAMP '9999-12-31')) AS valid_to_us,
               value
        FROM ({_EV}) WHERE user_id < 50
    """,
    "arr1_array_functions": """
        SELECT vec_id,
               ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS v_max,
               ROUND(CAST(list_min(embedding) AS DOUBLE), 6) AS v_min,
               CAST(len(list_distinct(embedding)) AS INTEGER) AS n_distinct,
               ROUND(CAST(list_sort(embedding)[2] AS DOUBLE), 6) AS second_min,
               CAST(list_position(embedding, list_max(embedding)) AS INTEGER)
                   AS argmax_pos,
               CAST(len(embedding) AS INTEGER) AS dim
        FROM embeddings
    """,
    "h2_value_histogram": """
        SELECT CAST(FLOOR(l_extendedprice / 5000) AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               ROUND(SUM(l_extendedprice), 2) AS sum_price,
               ROUND(AVG(l_discount), 6) AS avg_discount
        FROM lineitem GROUP BY 1
    """,
    "a9_stats_agg": """
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
               ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
               ROUND(stddev_samp(l_extendedprice), 4) AS std_price,
               ROUND(var_samp(l_discount), 6) AS var_discount,
               ROUND(skewness(l_extendedprice), 4) AS skew_price,
               ROUND(kurtosis(l_extendedprice), 4) AS kurt_price
        FROM lineitem GROUP BY l_returnflag
    """,
    "x15_dedup_components": f"""
        WITH RECURSIVE
        e0 AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        e AS (SELECT vec_id, label, v, {_LSH4_BUCKET} AS bucket FROM e0),
        pairs AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM e a JOIN e b
              ON a.label = b.label AND a.bucket = b.bucket AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.35
        ),
        sym AS (SELECT id_a AS s, id_b AS d FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
        reach(s, d) AS (
            SELECT s, d FROM sym
            UNION
            SELECT r.s, y.d FROM reach r JOIN sym y ON r.d = y.s
        )
        SELECT component, CAST(COUNT(*) AS BIGINT) AS n_members,
               MAX(node) AS max_node
        FROM (
            SELECT s AS node, LEAST(s, MIN(d)) AS component
            FROM reach GROUP BY s
        )
        GROUP BY component
    """,
    "m4_grouped_pandas": f"""
        WITH g AS (
            SELECT user_id,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
            FROM ({_EV})
        )
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(AVG(gap_us) / 1000000.0, 4) AS mean_gap_s,
               ROUND(MAX(gap_us) / 1000000.0, 4) AS max_gap_s
        FROM g GROUP BY user_id
    """,
    # a4/a10: the HLL estimate is engine-specific, so the contract checked
    # cross-engine is (exact distinct count, within_tolerance=TRUE); Spark
    # computes the boolean from its own estimate, the oracle asserts it.
    "a4_approx_distinct": f"""
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
               TRUE AS within_tolerance
        FROM ({_EV}) GROUP BY event_type
    """,
    "a10_hll_sketch": """
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
               TRUE AS within_tolerance
        FROM lineitem GROUP BY l_returnflag
    """,
    # salted two-stage distinct == plain COUNT(DISTINCT): the salt is a
    # pure function of the value, so per-salt counts are disjoint
    "a11_distinct_salted": f"""
        SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
        FROM ({_EV}) GROUP BY event_type
    """,
    # identical equi-width histogram (width 0.0625 = 2^-4: exact doubles)
    "a12_quantile_hist": """
        WITH h AS (
            SELECT l_returnflag,
                   CAST(LEAST(GREATEST(floor((l_quantity - 0.0) / 0.0625), 0), 1023)
                        AS BIGINT) AS bin,
                   COUNT(*) AS cnt
            FROM lineitem GROUP BY 1, 2
        ),
        c AS (
            SELECT l_returnflag, bin, cnt,
                   SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin) AS cum,
                   SUM(cnt) OVER (PARTITION BY l_returnflag) AS total
            FROM h
        )
        SELECT l_returnflag,
               0.0 + MIN(CASE WHEN cum >= ceil(total * 0.5) THEN bin END) * 0.0625 AS p50,
               0.0 + MIN(CASE WHEN cum >= ceil(total * 0.95) THEN bin END) * 0.0625 AS p95,
               CAST(MAX(total) AS BIGINT) AS n_values
        FROM c GROUP BY l_returnflag
    """,
    # chunk windows: starts 0, 12, 24, ... ; slice is 1-based inclusive and
    # clamps at the end exactly like Spark's slice()
    "c1_doc_chunk": """
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        x AS (
            SELECT doc_id, t,
                   GREATEST(CAST(ceil((len(t) - 4) / 12.0) AS BIGINT), 1) AS nc
            FROM d
        ),
        e AS (
            SELECT doc_id, t, CAST(u.i AS INT) AS chunk_idx
            FROM x, LATERAL unnest(generate_series(0, nc - 1)) AS u(i)
        )
        SELECT doc_id, chunk_idx,
               CAST(len(t[chunk_idx * 12 + 1 : chunk_idx * 12 + 16]) AS INT)
                   AS chunk_n_tokens,
               md5(array_to_string(t[chunk_idx * 12 + 1 : chunk_idx * 12 + 16], ' '))
                   AS chunk_md5
        FROM e
    """,
    # same planted PII, same RE2/Java-compatible patterns, global replace
    "t7_pii_redact": """
        WITH p AS (
            SELECT doc_id,
                   text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com or 555-867-5309 ssn 123-45-6789 ip 10.0.0.'
                        || CAST(doc_id % 256 AS VARCHAR) AS t2
            FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(t2,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT)
                   AS pii_email_count,
               CAST(len(regexp_extract_all(t2,
                   '(?:\\+?[0-9]{1,2}[-. ])?\\(?[0-9]{3}\\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}')) AS INT)
                   AS pii_phone_count,
               CAST(len(regexp_extract_all(t2, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS INT)
                   AS pii_ssn_count,
               CAST(len(regexp_extract_all(t2,
                   '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS INT)
                   AS pii_ipv4_count,
               md5(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(t2,
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                         '[EMAIL]', 'g'),
                       '(?:\\+?[0-9]{1,2}[-. ])?\\(?[0-9]{3}\\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}',
                       '[PHONE]', 'g'),
                     '[0-9]{3}-[0-9]{2}-[0-9]{4}', '[SSN]', 'g'),
                   '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b',
                   '[IPV4]', 'g')
               ) AS redacted_md5
        FROM p
    """,
    "t8_repetition": """
        WITH d AS (
            SELECT doc_id,
                   string_split(text, chr(10)) AS ln,
                   string_split(text, ' ') AS tk
            FROM documents
        ),
        g AS (
            SELECT doc_id,
                   CAST(len(ln) AS BIGINT) AS n_lines,
                   CAST(len(ln) - len(list_distinct(ln)) AS BIGINT) AS dup_lines,
                   CASE WHEN len(tk) >= 2
                        THEN list_transform(generate_series(1, len(tk) - 1),
                                            i -> tk[i] || ' ' || tk[i + 1])
                        ELSE [array_to_string(tk, ' ')] END AS grams
            FROM d
        ),
        -- relational top-gram count (unnest + group) == Spark's sorted
        -- run-length fold; same result, different algorithm
        tg AS (
            SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_gram_count
            FROM (
                SELECT doc_id, u.g, COUNT(*) AS c
                FROM g, LATERAL unnest(grams) AS u(g)
                GROUP BY doc_id, u.g
            ) GROUP BY doc_id
        ),
        s AS (
            SELECT g.doc_id, n_lines, dup_lines,
                   CAST(len(grams) AS BIGINT) AS n_grams,
                   tg.top_gram_count
            FROM g JOIN tg ON g.doc_id = tg.doc_id
        )
        SELECT doc_id, n_lines, dup_lines, n_grams, top_gram_count,
               (dup_lines * 100 > n_lines * 30)
                OR (top_gram_count * 100 > n_grams * 18) AS repetitious
        FROM s
    """,
    # same corruption, same block predicate, same (distance, custkey)
    # tie-break via row_number
    "er1_entity_resolution": """
        WITH dirty AS (
            SELECT c_custkey AS d_key,
                   CASE
                     WHEN c_custkey % 3 = 0 THEN substr(c_name, 1, 17) || 'X'
                     WHEN c_custkey % 3 = 1 THEN substr(c_name, 1, 17)
                     ELSE c_name || 'Z'
                   END AS d_name,
                   c_nationkey
            FROM customer
        ),
        cand AS (
            SELECT d.d_key, c.c_custkey,
                   CAST(levenshtein(d.d_name, c.c_name) AS INT) AS distance,
                   row_number() OVER (
                       PARTITION BY d.d_key
                       ORDER BY levenshtein(d.d_name, c.c_name), c.c_custkey
                   ) AS rk
            FROM dirty d JOIN customer c
              ON d.c_nationkey = c.c_nationkey
             AND substr(d.d_name, 1, 17) = substr(c.c_name, 1, 17)
            WHERE levenshtein(d.d_name, c.c_name) <= 2
        )
        SELECT d_key, c_custkey AS matched_key, distance
        FROM cand WHERE rk = 1
    """,
    # same ignorenulls carries + identical closed-form blend; integer
    # cents/day indices keep everything but the final division exact
    "ts2_interpolate": f"""
        WITH ev AS (
            SELECT user_id,
                   datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
            FROM ({_EV})
        ),
        daily AS (
            SELECT user_id, day_idx, CAST(MAX(cents) AS DOUBLE) AS obs
            FROM ev WHERE day_idx BETWEEN 0 AND 30
            GROUP BY user_id, day_idx
        ),
        grid AS (
            SELECT u.user_id, CAST(g.i AS INT) AS day_idx
            FROM (SELECT DISTINCT user_id FROM ev) u,
                 LATERAL unnest(generate_series(0, 30)) AS g(i)
        ),
        j AS (
            SELECT g.user_id, g.day_idx, d.obs,
                   last_value(CASE WHEN d.obs IS NOT NULL THEN g.day_idx END
                              IGNORE NULLS) OVER wprev AS pd,
                   last_value(d.obs IGNORE NULLS) OVER wprev AS pv,
                   first_value(CASE WHEN d.obs IS NOT NULL THEN g.day_idx END
                               IGNORE NULLS) OVER wnext AS nd,
                   first_value(d.obs IGNORE NULLS) OVER wnext AS nv
            FROM grid g LEFT JOIN daily d
              ON g.user_id = d.user_id AND g.day_idx = d.day_idx
            WINDOW wprev AS (PARTITION BY g.user_id ORDER BY g.day_idx
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   wnext AS (PARTITION BY g.user_id ORDER BY g.day_idx
                             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT user_id, day_idx,
               obs IS NOT NULL AS observed,
               ROUND(CASE
                   WHEN obs IS NOT NULL THEN obs
                   WHEN pv IS NULL THEN NULL
                   WHEN nv IS NULL THEN pv
                   ELSE pv + (nv - pv) * ((day_idx - pd) / CAST(nd - pd AS DOUBLE))
               END, 4) AS v_interp
        FROM j
    """,
    # identical fence arithmetic on identical exact quantiles (a7 proved
    # percentile == quantile_cont); counts are integer-exact
    "dq2_outliers": f"""
        WITH q AS (
            SELECT event_type,
                   quantile_cont(value, 0.25) AS q1,
                   quantile_cont(value, 0.75) AS q3
            FROM ({_EV}) GROUP BY event_type
        ),
        f AS (
            SELECT event_type,
                   q1 - 1.5 * (q3 - q1) AS lo,
                   q3 + 1.5 * (q3 - q1) AS hi
            FROM q
        )
        SELECT e.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN e.value < f.lo OR e.value > f.hi
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               ROUND(MIN(f.lo), 4) AS lo_fence,
               ROUND(MIN(f.hi), 4) AS hi_fence
        FROM ({_EV}) e JOIN f ON e.event_type = f.event_type
        GROUP BY e.event_type
    """,
    # trailing-window PIT features: LEFT JOIN over the 7d band, CASE for
    # the nested 1d window; integer-cent sums are order-independent
    "f13_pit_window_agg": f"""
        WITH ev AS (
            SELECT user_id, ts, event_id,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
            FROM ({_EV})
        ),
        s AS (SELECT user_id, ts, event_id AS spine_id FROM ev
              WHERE event_id % 10 = 0)
        SELECT s.user_id, epoch_us(s.ts) AS ts_us, s.spine_id,
               CAST(COUNT(CASE WHEN e.ts > s.ts - INTERVAL 1 DAY THEN e.cents END)
                    AS BIGINT) AS n_86400s,
               CAST(COALESCE(SUM(CASE WHEN e.ts > s.ts - INTERVAL 1 DAY
                                      THEN e.cents END), 0) AS BIGINT) AS sum_86400s,
               CAST(MIN(CASE WHEN e.ts > s.ts - INTERVAL 1 DAY THEN e.cents END)
                    AS BIGINT) AS min_86400s,
               CAST(MAX(CASE WHEN e.ts > s.ts - INTERVAL 1 DAY THEN e.cents END)
                    AS BIGINT) AS max_86400s,
               CAST(COUNT(e.cents) AS BIGINT) AS n_604800s,
               CAST(COALESCE(SUM(e.cents), 0) AS BIGINT) AS sum_604800s
        FROM s LEFT JOIN ev e
          ON e.user_id = s.user_id
         AND e.ts > s.ts - INTERVAL 7 DAY
         AND e.ts <= s.ts
        GROUP BY s.user_id, s.ts, s.spine_id
    """,
    "f15_decayed_features": _F15_SQL,
    "x18_negative_sampling": """
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
    """,
    "a16_funnel": f"""
        WITH ev AS ({_EV}),
        fv AS (SELECT user_id, MIN(ts) AS fv FROM ev
               WHERE event_type = 'view' GROUP BY user_id),
        j AS (
            SELECT fv.user_id, fv.fv, MIN(b.ts) AS fb
            FROM fv LEFT JOIN ev b
              ON b.user_id = fv.user_id
             AND b.event_type = 'purchase'
             AND b.ts > fv.fv
             AND b.ts <= fv.fv + INTERVAL 2 HOUR
            GROUP BY fv.user_id, fv.fv
        )
        SELECT user_id, epoch_us(fv) AS first_view_us,
               fb IS NOT NULL AS converted,
               epoch_us(fb) - epoch_us(fv) AS convert_us
        FROM j
    """,
    "f16_label_window": f"""
        WITH ev AS (
            SELECT user_id, ts, event_id, event_type,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
            FROM ({_EV})
        ),
        s AS (SELECT user_id, ts, event_id AS spine_id FROM ev
              WHERE event_id % 10 = 0)
        SELECT s.user_id, epoch_us(s.ts) AS ts_us, s.spine_id,
               CAST(COALESCE(SUM(CASE WHEN e.event_type = 'purchase'
                                      THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS n_future_purchases,
               COALESCE(SUM(CASE WHEN e.event_type = 'purchase'
                                 THEN 1 ELSE 0 END), 0) > 0 AS label_converted,
               CAST(COALESCE(SUM(CASE WHEN e.event_type = 'purchase'
                                      THEN e.cents END), 0) AS BIGINT)
                   AS future_purchase_cents
        FROM s LEFT JOIN ev e
          ON e.user_id = s.user_id
         AND e.ts > s.ts
         AND e.ts <= s.ts + INTERVAL 7 DAY
        GROUP BY s.user_id, s.ts, s.spine_id
    """,
    # incremental rollup == from-scratch aggregate over the full fact
    "h3_incremental_rollup": f"""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS sum_value_cents,
               CAST(MIN(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS min_value_cents,
               CAST(MAX(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS max_value_cents
        FROM ({_EV}) GROUP BY event_type
    """,
    "emb1_quantize": """
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        m AS (
            SELECT vec_id, v,
                   list_max(list_transform(v, x -> abs(x))) AS mx
            FROM e
        ),
        qd AS (
            SELECT vec_id,
                   CASE WHEN mx = 0
                        THEN list_transform(v, x -> CAST(0 AS TINYINT))
                        ELSE list_transform(v,
                             x -> CAST(floor(x * 127.0 / mx + 0.5) AS TINYINT))
                   END AS q
            FROM m
        )
        SELECT vec_id,
               array_to_string(list_transform(q, x -> CAST(x AS VARCHAR)), ',')
                   AS q,
               CAST(list_sum(list_transform(q, x -> CAST(x AS BIGINT))) AS BIGINT)
                   AS sum_q
        FROM qd
    """,
}


# m3's oracle reproduces the Python stub kernel bit-for-bit: hex bytes of
# sha256 -> raw_i = byte/255 - 0.5, norm = sqrt of the LEFT-FOLD sum of
# squares (same order as the kernel's sum()), float32 cast via REAL, then
# the same floor(x*1e4 + 0.5) quantization as the Spark side.
_M3_RAW = [
    f"(('0x' || substr(hx, {2 * k + 1}, 2))::BIGINT / 255.0 - 0.5)" for k in range(16)
]
_M3_NORM_SUM = _M3_RAW[0] + " * " + _M3_RAW[0]
for _k in range(1, 16):
    _M3_NORM_SUM = f"({_M3_NORM_SUM} + {_M3_RAW[_k]} * {_M3_RAW[_k]})"
ORACLE_SQL["m3_image_features"] = f"""
    WITH b AS (SELECT doc_id, sha256(text) AS hx FROM documents),
    n AS (SELECT doc_id, hx, sqrt({_M3_NORM_SUM}) AS nrm FROM b)
    SELECT doc_id, 16 AS dim,
        {", ".join(
            f"CAST(floor(CAST(CAST({_M3_RAW[k]} / nrm AS REAL) AS DOUBLE)"
            f" * 10000 + 0.5) AS BIGINT) AS q{k}"
            for k in range(4)
        )}
    FROM n
"""

# x6/x6b oracles regenerate the portable MinHash family exactly: h32 =
# first 8 md5 hex digits, h_i = (A_i*h32 + B_i) mod P, per-doc mins,
# md5 band buckets, bucket-equality candidate join (+ exact Jaccard
# verify for x6b). Same constants as the Spark side by construction.
from .operators.dedup import MINHASH_A, MINHASH_B, MINHASH_P  # noqa: E402

_MH_MINS = ", ".join(
    f"MIN((h32 * {MINHASH_A[i]} + {MINHASH_B[i]}) % {MINHASH_P}) AS mh{i}"
    for i in range(16)
)
_MH_BANDS = "\n            UNION ALL ".join(
    "SELECT doc_id, {b} AS band, md5({key}) AS bucket FROM m".format(
        b=b,
        key="||','||".join(f"CAST(mh{b * 4 + i} AS VARCHAR)" for i in range(4)),
    )
    for b in range(4)
)
def _mh_ctes(source: str = "documents") -> str:
    """The portable MinHash CTE chain against an arbitrary source
    relation (pipe3 runs it on the already-filtered corpus)."""
    return _MH_CTES.replace("FROM documents)", f"FROM {source})", 1)


_MH_CTES = f"""
        t AS (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents),
        sh AS (
            SELECT doc_id,
                   CASE WHEN len(tk) >= 3
                        THEN list_transform(generate_series(1, len(tk) - 2),
                             i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])
                        ELSE [array_to_string(tk, ' ')] END AS shs
            FROM t
        ),
        e AS (
            SELECT doc_id, ('0x' || substr(md5(u.s), 1, 8))::BIGINT AS h32
            FROM sh, LATERAL unnest(shs) AS u(s)
        ),
        m AS (SELECT doc_id, {_MH_MINS} FROM e GROUP BY doc_id),
        bd AS (
            {_MH_BANDS}
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM bd a JOIN bd b
              ON a.band = b.band AND a.bucket = b.bucket
             AND a.doc_id < b.doc_id
        )"""
ORACLE_SQL["x6_dedup_fuzzy"] = f"""
    WITH {_MH_CTES}
    SELECT id_a, id_b FROM cand
"""
ORACLE_SQL["pipe2_quality_dedup"] = f"""
    WITH RECURSIVE {_MH_CTES},
    ds AS (SELECT doc_id, list_distinct(shs) AS d FROM sh),
    pairs AS (
        SELECT c.id_a, c.id_b
        FROM cand c
        JOIN ds da ON da.doc_id = c.id_a
        JOIN ds db ON db.doc_id = c.id_b
        WHERE CAST(len(list_intersect(da.d, db.d)) AS DOUBLE)
              / len(list_distinct(list_concat(da.d, db.d))) >= 0.5
    ),
    sym AS (SELECT id_a AS s, id_b AS d FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
    reach(s, d) AS (
        SELECT s, d FROM sym
        UNION
        SELECT r.s, y.d FROM reach r JOIN sym y ON r.d = y.s
    ),
    comp AS (
        SELECT s AS node, LEAST(s, MIN(d)) AS component
        FROM reach GROUP BY s
    ),
    q AS (
        SELECT doc_id,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS uniq
        FROM documents
    ),
    sel AS (
        SELECT comp.component, comp.node AS doc_id, q.uniq,
               row_number() OVER (PARTITION BY comp.component
                                  ORDER BY q.uniq DESC, comp.node ASC) AS rk
        FROM comp JOIN q ON q.doc_id = comp.node
    )
    SELECT component,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           MAX(CASE WHEN rk = 1 THEN doc_id END) AS kept_doc_id,
           ROUND(MAX(uniq), 6) AS kept_uniq_ratio,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
    FROM sel GROUP BY component
"""

ORACLE_SQL["pipe3_curation_pipeline"] = f"""
    WITH RECURSIVE
    base AS (SELECT doc_id, text, n_chars FROM documents WHERE doc_id % 20 <> 0),
    qual AS (
        SELECT * FROM base
        WHERE len(string_split(text, ' ')) >= 30
          AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
              / len(string_split(text, ' ')) >= 0.4
    ),
    keep_first AS (SELECT MIN(doc_id) AS doc_id FROM qual GROUP BY md5(text)),
    corpus_clean AS (SELECT q.* FROM qual q JOIN keep_first USING (doc_id)),
    {_mh_ctes("corpus_clean")},
    ds AS (SELECT doc_id, list_distinct(shs) AS d FROM sh),
    pairs AS (
        SELECT c.id_a, c.id_b
        FROM cand c
        JOIN ds da ON da.doc_id = c.id_a
        JOIN ds db ON db.doc_id = c.id_b
        WHERE CAST(len(list_intersect(da.d, db.d)) AS DOUBLE)
              / len(list_distinct(list_concat(da.d, db.d))) >= 0.5
    ),
    sym AS (SELECT id_a AS s, id_b AS d FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
    reach(s, d) AS (
        SELECT s, d FROM sym
        UNION
        SELECT r.s, y.d FROM reach r JOIN sym y ON r.d = y.s
    ),
    comp AS (SELECT s AS node, LEAST(s, MIN(d)) AS component
             FROM reach GROUP BY s),
    uq AS (SELECT doc_id,
                  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                  / len(string_split(text, ' ')) AS u
           FROM corpus_clean),
    ranked AS (
        SELECT comp.component, comp.node,
               row_number() OVER (PARTITION BY comp.component
                                  ORDER BY uq.u DESC, comp.node ASC) AS rk
        FROM comp JOIN uq ON uq.doc_id = comp.node
    ),
    drops AS (SELECT node AS doc_id FROM ranked WHERE rk > 1),
    q3 AS (SELECT c.* FROM corpus_clean c
           WHERE c.doc_id NOT IN (SELECT doc_id FROM drops)),
    bsh AS (
        SELECT list_distinct(
                   CASE WHEN len(tk) >= 4
                        THEN list_transform(generate_series(1, len(tk) - 3),
                             i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                  || ' ' || tk[i+3])
                        ELSE [array_to_string(tk, ' ')] END) AS shs
        FROM (SELECT string_split(text, ' ') AS tk FROM documents
              WHERE doc_id % 20 = 0)
    ),
    bset AS (SELECT DISTINCT u.s FROM bsh, LATERAL unnest(shs) AS u(s)),
    q3sh AS (
        SELECT doc_id,
               list_distinct(
                   CASE WHEN len(tk) >= 4
                        THEN list_transform(generate_series(1, len(tk) - 3),
                             i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                  || ' ' || tk[i+3])
                        ELSE [array_to_string(tk, ' ')] END) AS shs
        FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM q3)
    ),
    hits AS (SELECT DISTINCT q.doc_id
             FROM q3sh q, LATERAL unnest(q.shs) AS u(s)
             JOIN bset b ON b.s = u.s),
    final AS (SELECT * FROM q3
              WHERE doc_id NOT IN (SELECT doc_id FROM hits))
    SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 4
               AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids
    FROM final GROUP BY 1
"""

ORACLE_SQL["x6b_jaccard_verify"] = f"""
    WITH {_MH_CTES},
    ds AS (SELECT doc_id, list_distinct(shs) AS d FROM sh),
    j AS (
        SELECT c.id_a, c.id_b,
               CAST(len(list_intersect(da.d, db.d)) AS DOUBLE)
                   / len(list_distinct(list_concat(da.d, db.d))) AS rawj
        FROM cand c
        JOIN ds da ON da.doc_id = c.id_a
        JOIN ds db ON db.doc_id = c.id_b
    )
    SELECT id_a, id_b, ROUND(rawj, 6) AS jaccard FROM j WHERE rawj >= 0.5
"""

ORACLE_SQL["x25_containment_dedup"] = f"""
    WITH {_MH_CTES},
    ds AS (SELECT doc_id, list_distinct(shs) AS d FROM sh),
    c AS (
        SELECT c.id_a, c.id_b,
               CAST(len(list_intersect(da.d, db.d)) AS DOUBLE)
                   / len(da.d) AS c_ab,
               CAST(len(list_intersect(da.d, db.d)) AS DOUBLE)
                   / len(db.d) AS c_ba
        FROM cand c
        JOIN ds da ON da.doc_id = c.id_a
        JOIN ds db ON db.doc_id = c.id_b
    )
    SELECT id_a, id_b,
           ROUND(GREATEST(c_ab, c_ba), 6) AS containment,
           CASE WHEN c_ab >= c_ba THEN id_a ELSE id_b END AS contained_id
    FROM c WHERE GREATEST(c_ab, c_ba) >= 0.5
"""

# x9's oracle recomputes SimHash bits relationally (per-bit vote sums +
# the 2*ones > n majority rule) over the same portable 60-bit md5 hash —
# independent of the Spark side's SWAR lane packing.
_SH_ONES = ", ".join(f"SUM((h >> {b}) & 1) AS o{b}" for b in range(60))
_SH_SIG = " + ".join(
    f"(CASE WHEN 2 * o{b} > n THEN (CAST(1 AS BIGINT) << {b}) ELSE 0 END)"
    for b in range(60)
)
ORACLE_SQL["x9_simhash"] = f"""
    WITH tk AS (
        SELECT doc_id, u.tok
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             LATERAL unnest(t) AS u(tok)
    ),
    h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM tk),
    m AS (SELECT doc_id, COUNT(*) AS n, {_SH_ONES} FROM h GROUP BY doc_id),
    s AS (SELECT doc_id, CAST({_SH_SIG} AS BIGINT) AS simhash FROM m)
    SELECT doc_id, simhash,
           CAST(COUNT(*) OVER (PARTITION BY simhash) AS BIGINT) AS group_size,
           MIN(doc_id) OVER (PARTITION BY simhash) AS keep_id
    FROM s
"""

# x8's oracle inlines the seeded hyperplanes as SQL literals (Python
# float repr round-trips exactly) and rebuilds the bucket with the SAME
# left-fold dot-product order as functions/vector.dot, so signs — and
# therefore bucket membership and the probed candidate set — match
# bit-for-bit. Cosine + top-k follow the x1 formulation.
from .operators.similarity import _random_hyperplanes  # noqa: E402


def _x8_sql() -> str:
    planes = _random_hyperplanes(dim=64, bits=6, seed=42)

    def dot_sql(plane: list[float]) -> str:
        expr = "0.0"
        for j, p in enumerate(plane):
            expr = f"({expr} + v[{j + 1}] * {p!r})"
        return expr

    bucket = " + ".join(
        f"(CASE WHEN {dot_sql(plane)} >= 0 THEN {2 ** i} ELSE 0 END)"
        for i, plane in enumerate(planes)
    )
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        b AS (SELECT vec_id, v, CAST({bucket} AS BIGINT) AS bucket FROM e),
        q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = 0)
        SELECT vec_id, ROUND(list_cosine_similarity(v, qv), 6) AS sim
        FROM b CROSS JOIN q
        WHERE bucket IN (qb, xor(qb, 1), xor(qb, 2))
        ORDER BY list_cosine_similarity(v, qv) DESC, vec_id ASC LIMIT 10
    """


ORACLE_SQL["x8_ann_lsh"] = _x8_sql()


def _rag2_sql() -> str:
    """rag2's oracle: x8's inlined-hyperplane candidate set, ranked and
    scored against the x1 exact top-10 with the same integer discount
    table the Spark side inlines."""
    planes = _random_hyperplanes(dim=64, bits=6, seed=42)

    def dot_sql(plane: list[float]) -> str:
        expr = "0.0"
        for j, p in enumerate(plane):
            expr = f"({expr} + v[{j + 1}] * {p!r})"
        return expr

    bucket = " + ".join(
        f"(CASE WHEN {dot_sql(plane)} >= 0 THEN {2 ** i} ELSE 0 END)"
        for i, plane in enumerate(planes)
    )
    disc = "[" + ", ".join(str(d) for d in _NDCG_DISC_E6) + "]"
    idcg = sum(_NDCG_DISC_E6)
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        b AS (SELECT vec_id, v, CAST({bucket} AS BIGINT) AS bucket FROM e),
        q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = 0),
        exact10 AS (
            SELECT vec_id, 1 AS rel FROM e CROSS JOIN q
            WHERE vec_id <> 0
            ORDER BY list_cosine_similarity(v, qv) DESC, vec_id ASC LIMIT 10
        ),
        cand AS (
            SELECT vec_id, list_cosine_similarity(v, qv) AS s
            FROM b CROSS JOIN q
            WHERE bucket IN (qb, xor(qb, 1), xor(qb, 2)) AND vec_id <> 0
        ),
        ranked AS (
            SELECT c.vec_id, COALESCE(x.rel, 0) AS rel,
                   rnk, ({disc})[rnk] AS disc
            FROM (SELECT vec_id, s,
                         row_number() OVER (ORDER BY s DESC, vec_id ASC)
                             AS rnk
                  FROM cand) c
            LEFT JOIN exact10 x USING (vec_id)
            WHERE rnk <= 10
        ),
        a AS (SELECT CAST(SUM(rel * disc) AS BIGINT) AS dcg_e6,
                     MIN(CASE WHEN rel = 1 THEN rnk END) AS fr
              FROM ranked)
        SELECT CAST(10 AS BIGINT) AS k, dcg_e6,
               CAST({idcg} AS BIGINT) AS idcg_e6,
               CAST(dcg_e6 * 1000000 // {idcg} AS BIGINT) AS ndcg_e6,
               CAST(COALESCE(fr, 0) AS BIGINT) AS first_rel_rank,
               CAST(CASE WHEN fr IS NULL THEN 0
                         ELSE 1000000 // fr END AS BIGINT) AS mrr_e6
        FROM a
    """


ORACLE_SQL["rag2_ndcg_eval"] = _rag2_sql()

# b1/io5: the bucketed/partitioned layouts are physical-plan properties;
# the oracle checks the join/scan SEMANTICS on the raw tables.
ORACLE_SQL["b1_bucketed_join"] = """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
"""
def _g2_sql(
    iterations: int = 3,
    damping: float = 0.85,
    scale: int = 10**12,
    dangling: bool = False,
) -> str:
    import math as _math

    base = int(_math.floor((1 - damping) * scale))
    iters = []
    prev = "r0"
    for i in range(1, iterations + 1):
        pool_cte = f"""
        p{i} AS (
            SELECT CAST(COALESCE(SUM(r), 0) AS BIGINT) AS pool
            FROM {prev} JOIN dang USING (node)
        ),""" if dangling else ""
        incoming = (
            f"(COALESCE(c{i}.s, 0) + p{i}.pool // nn.n)"
            if dangling
            else f"COALESCE(c{i}.s, 0)"
        )
        tail = " CROSS JOIN p" + str(i) + " CROSS JOIN nn" if dangling else ""
        iters.append(f"""
        {pool_cte}
        c{i} AS (
            SELECT e.dst AS node, CAST(SUM({prev}.r // d.deg) AS BIGINT) AS s
            FROM e JOIN d ON e.src = d.src
                   JOIN {prev} ON {prev}.node = e.src
            GROUP BY e.dst
        ),
        r{i} AS (
            SELECT n.node,
                   CAST({base} + CAST(floor({damping!r} * {incoming})
                                      AS BIGINT) AS BIGINT) AS r
            FROM nodes n LEFT JOIN c{i} ON c{i}.node = n.node{tail}
        )""")
        prev = f"r{i}"
    dang_ctes = """
        dang AS (SELECT node FROM nodes
                 WHERE node NOT IN (SELECT src FROM e)),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),""" if dangling else ""
    return f"""
        WITH e AS (
            SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                            's' || CAST(l_suppkey AS VARCHAR) AS dst
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ),
        d AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),{dang_ctes}
        r0 AS (SELECT node, CAST({scale} AS BIGINT) AS r FROM nodes),
        {",".join(iters)}
        SELECT node, r AS rank FROM {prev}
        ORDER BY r DESC, node ASC LIMIT 20
    """


ORACLE_SQL["g2_pagerank"] = _g2_sql()
ORACLE_SQL["g2b_pagerank_dangling"] = _g2_sql(dangling=True)

# Same semantics as their parent queries, different physical plans (the
# bucketed band join / the join-free range-frame window) — the oracle is
# identical; what differs is plan-gated in tests/test_plans.py.
ORACLE_SQL["f15b_decayed_bucketed"] = _F15_SQL
ORACLE_SQL["f16b_label_window_frames"] = ORACLE_SQL["f16_label_window"]

# Batch replay of the deterministic stateful streaming fold: cumulative
# count/sum (integer cents — exact in doubles) + last row by (ts_us,
# event_id). The Spark side runs the REAL applyInPandasWithState stream.
ORACLE_SQL["sd2_running_state_snapshot"] = f"""
    WITH ev AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CAST(floor(value * 100 + 0.5) AS DOUBLE) AS cents
        FROM ({_EV})
    ),
    agg AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
               SUM(cents) AS sum_cents
        FROM ev GROUP BY user_id
    ),
    r AS (
        SELECT user_id, ts_us, cents, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts_us DESC, event_id DESC) AS rn
        FROM ev
    )
    SELECT a.user_id, a.n_events, a.sum_cents,
           r.ts_us AS last_ts_us, r.cents AS last_cents,
           r.event_id AS last_event_id
    FROM agg a JOIN r ON a.user_id = r.user_id AND r.rn = 1
"""


def _x14_sql(k: int = 8, dim: int = 64, iters: int = 2, grid: int = 10**6) -> str:
    """Integer-Lloyd oracle: replays kmeans_quantized exactly. Assignment
    is an argmin over integer distances (cross join q x centroids, k rows
    per vec); the update repacks per-dim floor(sum/n) components with
    list(... ORDER BY i). Every arithmetic step is order-independent."""
    dist = (
        f"CAST(list_sum(list_transform(generate_series(1, {dim}), "
        "i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i]))) AS BIGINT)"
    )

    def assign(a: str, csrc: str) -> str:
        return f"""
    {a} AS (
        SELECT vec_id, cluster, d FROM (
            SELECT q.vec_id, c.cluster, {dist} AS d,
                   row_number() OVER (PARTITION BY q.vec_id
                                      ORDER BY {dist}, c.cluster) AS rk
            FROM q CROSS JOIN {csrc} c
        ) WHERE rk = 1
    )"""

    def update(cnew: str, asrc: str, cprev: str) -> str:
        return f"""
    {cnew}_raw AS (
        SELECT cluster, list(comp ORDER BY i) AS cv FROM (
            SELECT a.cluster, g.i,
                   CAST(floor(CAST(SUM(q.qv[g.i]) AS DOUBLE) / COUNT(*))
                        AS BIGINT) AS comp
            FROM {asrc} a JOIN q USING (vec_id),
                 LATERAL unnest(generate_series(1, {dim})) AS g(i)
            GROUP BY a.cluster, g.i
        ) GROUP BY cluster
    ),
    {cnew} AS (
        SELECT p.cluster, COALESCE(r.cv, p.cv) AS cv
        FROM {cprev} p LEFT JOIN {cnew}_raw r USING (cluster)
    )"""

    parts = [
        f"""
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id,
                 list_transform(v, x -> CAST(floor(x * {grid} + 0.5) AS BIGINT))
                     AS qv
          FROM e),
    c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, qv AS cv
           FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT {k}))""",
        assign("a0", "c0"),
    ]
    prev_c, prev_a = "c0", "a0"
    for it in range(1, iters + 1):
        parts.append(update(f"c{it}", prev_a, prev_c))
        parts.append(assign(f"a{it}", f"c{it}"))
        prev_c, prev_a = f"c{it}", f"a{it}"
    return f"""
    WITH {",".join(parts)}
    SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           MIN(vec_id) AS min_vec,
           CAST(SUM(d) AS BIGINT) AS inertia_q
    FROM {prev_a} GROUP BY cluster
    """


ORACLE_SQL["x14_kmeans"] = _x14_sql()


def _x17_sql(
    m: int = 4, sub_dim: int = 16, k_codes: int = 16, k: int = 10, grid: int = 10**6
) -> str:
    """PQ-ANN oracle: per subspace, replay the 1-iteration integer-Lloyd
    codebook fit, encode every vector against the updated codebook, build
    the query's distance table relationally, and rank by the joined sum.
    All-integer arithmetic — same fixpoint as pq_ann_topk."""

    def dist(xv: str, cv: str) -> str:
        return (
            f"CAST(list_sum(list_transform(generate_series(1, {sub_dim}), "
            f"i -> ({xv}[i] - {cv}[i]) * ({xv}[i] - {cv}[i]))) AS BIGINT)"
        )

    chains = []
    joins = []
    for s in range(m):
        a, b = s * sub_dim + 1, (s + 1) * sub_dim
        d_qc0 = dist("x.sv", "c.cv")
        chains.append(f"""
    s{s}q AS (SELECT vec_id, list_slice(qv, {a}, {b}) AS sv FROM q),
    s{s}c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
                      sv AS cv
               FROM (SELECT vec_id, sv FROM s{s}q ORDER BY vec_id
                     LIMIT {k_codes})),
    s{s}a0 AS (
        SELECT vec_id, cluster FROM (
            SELECT x.vec_id, c.cluster,
                   row_number() OVER (PARTITION BY x.vec_id
                                      ORDER BY {d_qc0}, c.cluster) AS rk
            FROM s{s}q x CROSS JOIN s{s}c0 c
        ) WHERE rk = 1
    ),
    s{s}c1raw AS (
        SELECT cluster, list(comp ORDER BY i) AS cv FROM (
            SELECT a1.cluster, g.i,
                   CAST(floor(CAST(SUM(x.sv[g.i]) AS DOUBLE) / COUNT(*))
                        AS BIGINT) AS comp
            FROM s{s}a0 a1 JOIN s{s}q x USING (vec_id),
                 LATERAL unnest(generate_series(1, {sub_dim})) AS g(i)
            GROUP BY a1.cluster, g.i
        ) GROUP BY cluster
    ),
    s{s}c1 AS (
        SELECT p.cluster, COALESCE(r.cv, p.cv) AS cv
        FROM s{s}c0 p LEFT JOIN s{s}c1raw r USING (cluster)
    ),
    s{s}code AS (
        SELECT vec_id, cluster FROM (
            SELECT x.vec_id, c.cluster,
                   row_number() OVER (PARTITION BY x.vec_id
                                      ORDER BY {d_qc0}, c.cluster) AS rk
            FROM s{s}q x CROSS JOIN s{s}c1 c
        ) WHERE rk = 1
    ),
    s{s}dt AS (
        SELECT c.cluster, {dist("x.sv", "c.cv")} AS dd
        FROM s{s}c1 c CROSS JOIN (SELECT vec_id, sv FROM s{s}q
                                  WHERE vec_id = 0) x
    ),
    s{s}d AS (
        SELECT e.vec_id, t.dd FROM s{s}code e JOIN s{s}dt t USING (cluster)
    )""")
        joins.append(f"JOIN s{s}d USING (vec_id)" if s else "s0d")
    total = " + ".join(f"s{s}d.dd" for s in range(m))
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id,
                 list_transform(v, x -> CAST(floor(x * {grid} + 0.5) AS BIGINT))
                     AS qv
          FROM e),
    {",".join(chains)}
    SELECT vec_id, CAST({total} AS BIGINT) AS adist
    FROM {" ".join(joins)}
    ORDER BY adist, vec_id LIMIT {k}
    """


ORACLE_SQL["x17_pq_ann"] = _x17_sql()

ORACLE_SQL["dq4_referential_integrity"] = """
    SELECT 'orders.o_custkey->customer' AS constraint,
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT) AS n_orphans,
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_fact_rows
    UNION ALL
    SELECT 'lineitem.l_orderkey->orders',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p
                                   WHERE p.p_partkey = l.l_partkey))
                AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                   WHERE s.s_suppkey = l.l_suppkey))
                AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
"""

ORACLE_SQL["x20_bpe_pair_counts"] = """
    WITH t AS (SELECT string_split(text, ' ') AS tk FROM documents),
    p AS (
        SELECT u.pair
        FROM (SELECT list_transform(generate_series(1, len(tk) - 1),
                     i -> tk[i] || ' ' || tk[i + 1]) AS ps
              FROM t WHERE len(tk) >= 2),
             LATERAL unnest(ps) AS u(pair)
    )
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM p GROUP BY pair
    ORDER BY n_occurrences DESC, pair ASC LIMIT 20
"""

ORACLE_SQL["m6_modality_router"] = """
    SELECT CASE doc_id % 3 WHEN 0 THEN 'image/jpeg'
                           WHEN 1 THEN 'image/png'
                           ELSE 'audio/wav' END AS modality,
           CAST(COUNT(*) AS BIGINT) AS n_payloads,
           CAST(SUM(octet_length(CAST(text AS BLOB))
                    + CASE doc_id % 3 WHEN 0 THEN 3 ELSE 4 END)
                AS BIGINT) AS total_bytes,
           MIN(doc_id) AS min_doc
    FROM documents
    GROUP BY 1
"""

ORACLE_SQL["x19_pq_recall"] = f"""
    SELECT 10 AS k,
           CAST(COUNT(*) AS BIGINT) AS n_overlap,
           CAST(COUNT(*) * 10 AS BIGINT) AS recall_pct
    FROM (
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
        SELECT vec_id FROM e CROSS JOIN q WHERE vec_id <> 0
        ORDER BY list_cosine_similarity(v, qv) DESC, vec_id ASC LIMIT 10
    ) ex
    JOIN (
        SELECT vec_id FROM ({_x17_sql(k=11)})
        WHERE vec_id <> 0 ORDER BY adist, vec_id LIMIT 10
    ) pq USING (vec_id)
"""

ORACLE_SQL["io7_corrupt_records"] = f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN event_id % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_corrupt,
           CAST(SUM(CASE WHEN event_id % 97 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_good,
           ROUND(SUM(CASE WHEN event_id % 97 <> 0
                          THEN round(value, 2) END), 2) AS sum_good_value
    FROM ({_EV})
"""

ORACLE_SQL["s3_bm25_search"] = """
    WITH toks AS (
        SELECT doc_id, u.token
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             LATERAL unnest(t) AS u(token)
        WHERE length(u.token) > 0
    ),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
    tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
           FROM toks WHERE token IN ('table', 'query', 'scan')
           GROUP BY 1, 2),
    dfreq AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
              FROM tf GROUP BY 1),
    stats AS (SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
                     (SELECT AVG(dl) FROM dl) AS avgdl),
    scored AS (
        SELECT tf.doc_id,
               CAST(floor(
                   ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
                   * tf.tf * (1.2 + 1)
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
                   * 1000000 + 0.5) AS BIGINT) AS micro
        FROM tf JOIN dfreq USING (token)
                JOIN dl USING (doc_id)
                CROSS JOIN stats
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
           CAST(SUM(micro) AS BIGINT) AS score_micro
    FROM scored GROUP BY doc_id
    ORDER BY score_micro DESC, doc_id ASC LIMIT 20
"""

ORACLE_SQL["io6_schema_evolution"] = """
    SELECT l_orderkey % 10 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_legacy_rows,
           ROUND(SUM(CASE WHEN l_orderkey % 2 = 1
                          THEN round(l_discount * 100, 2) ELSE 0 END), 2)
               AS sum_discount_pct,
           ROUND(SUM(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY l_orderkey % 10
"""

# t4b: same 4-token shingle domain and portable 32-bit hash as the Spark
# side; list sort + slice replicate the keep-smallest sketch.
ORACLE_SQL["t4b_winnow_sketch"] = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    sh AS (
        SELECT doc_id,
               CASE WHEN len(tk) >= 4
                    THEN list_transform(generate_series(1, len(tk) - 3),
                         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                              || ' ' || tk[i+3])
                    ELSE [array_to_string(tk, ' ')] END AS shs
        FROM t
    )
    SELECT doc_id,
           array_to_string(list_transform(
               list_sort(list_transform(shs,
                   s -> ('0x' || substr(md5(s), 1, 8))::BIGINT))[1:4],
               x -> CAST(x AS VARCHAR)), ',') AS sketch
    FROM sh
"""

# dq3: per-bin PSI terms from exact integer counts; the only float math is
# a deterministic scalar expression per output row (no cross-row float agg)
ORACLE_SQL["dq3_feature_drift"] = f"""
    WITH ev AS ({_EV}),
    m AS (SELECT CAST(floor(quantile_cont(epoch_us(ts), 0.5)) AS BIGINT)
              AS mid FROM ev),
    b AS (SELECT event_type,
                 CASE WHEN epoch_us(ts) <= m.mid THEN 0 ELSE 1 END AS half,
                 LEAST(CAST(floor(value / 50.0) AS INT), 9) AS bin
          FROM ev, m),
    c AS (SELECT event_type, bin,
                 CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_early,
                 CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_late
          FROM b GROUP BY event_type, bin),
    t AS (SELECT event_type,
                 CAST(SUM(n_early) AS BIGINT) AS t_early,
                 CAST(SUM(n_late) AS BIGINT) AS t_late
          FROM c GROUP BY event_type)
    SELECT c.event_type, c.bin, c.n_early, c.n_late,
           ROUND(((c.n_early + 1) / (t.t_early + 10.0)
                  - (c.n_late + 1) / (t.t_late + 10.0))
                 * ln(((c.n_early + 1) / (t.t_early + 10.0))
                      / ((c.n_late + 1) / (t.t_late + 10.0))), 6) AS psi_term
    FROM c JOIN t USING (event_type)
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

ORACLE_SQL["a14_approx_percentile"] = f"""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 4) AS exact_p50,
           ROUND(quantile_cont(value, 0.9), 4) AS exact_p90,
           TRUE AS within_tolerance
    FROM ({_EV}) GROUP BY event_type
"""

# decon1: same 4-token shingle domain as the Spark side (shingles() with
# the whole-text fallback for docs shorter than k tokens).
ORACLE_SQL["decon1_contamination"] = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    sh AS (
        SELECT doc_id,
               list_distinct(
                   CASE WHEN len(tk) >= 4
                        THEN list_transform(generate_series(1, len(tk) - 3),
                             i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                  || ' ' || tk[i+3])
                        ELSE [array_to_string(tk, ' ')] END) AS shs
        FROM t
    ),
    b AS (SELECT DISTINCT u.s
          FROM sh, LATERAL unnest(shs) AS u(s) WHERE doc_id % 20 = 0),
    tr AS (SELECT doc_id, u.s
           FROM sh, LATERAL unnest(shs) AS u(s) WHERE doc_id % 20 <> 0)
    SELECT tr.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM tr JOIN b ON tr.s = b.s
    GROUP BY tr.doc_id
"""

ORACLE_SQL["f14_multi_view_training_set"] = f"""
    WITH f AS ({_EV}),
    s AS (SELECT DISTINCT user_id, ts AS sts FROM f
          WHERE event_type = 'purchase'),
    ev AS (
        SELECT * FROM (
            SELECT s.user_id, s.sts, f.event_id,
                   f.event_type AS last_event_type, f.value AS last_value,
                   epoch_us(f.ts) AS event_ts_us,
                   row_number() OVER (PARTITION BY s.user_id, s.sts
                                      ORDER BY f.ts DESC, f.event_id ASC) AS rn
            FROM s JOIN f ON s.user_id = f.user_id AND f.ts <= s.sts
        ) WHERE rn = 1
    ),
    o AS (
        SELECT * FROM (
            SELECT s.user_id, s.sts,
                   ord.o_totalprice AS last_order_price,
                   epoch_us(CAST(ord.o_orderdate AS TIMESTAMP)) AS order_ts_us,
                   row_number() OVER (
                       PARTITION BY s.user_id, s.sts
                       ORDER BY CAST(ord.o_orderdate AS TIMESTAMP) DESC,
                                ord.o_orderkey ASC) AS rn
            FROM s JOIN orders ord
              ON s.user_id = ord.o_custkey
             AND CAST(ord.o_orderdate AS TIMESTAMP) <= s.sts
        ) WHERE rn = 1
    )
    SELECT ev.user_id, epoch_us(ev.sts) AS as_of_us, ev.event_id,
           ev.last_event_type, ev.last_value, ev.event_ts_us,
           o.last_order_price, o.order_ts_us
    FROM ev JOIN o ON ev.user_id = o.user_id AND ev.sts = o.sts
"""

ORACLE_SQL["io5_partitioned_pruning"] = f"""
    SELECT epoch_us(date_trunc('day', ts)) AS day_us,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM ({_EV})
    WHERE event_type = 'purchase'
    GROUP BY 1
"""

# TPC-H-shaped relational coverage (EXISTS/NOT EXISTS, outer joins,
# correlated subqueries, disjunctive predicates) lives in relational.py.
# dq5: cross-multiplied CDF comparison — the supremum runs over the pooled
# (quantized) support; both engines quantize identically so the supports match.
ORACLE_SQL["dq5_ks_statistic"] = """
    WITH b AS (SELECT CAST(floor(value * 100) AS BIGINT) AS v,
                 CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is1
          FROM events WHERE event_type IN ('click', 'view')),
    g AS (SELECT v, CAST(SUM(is1) AS BIGINT) AS c1,
                 CAST(SUM(1 - is1) AS BIGINT) AS c2
          FROM b GROUP BY v),
    cum AS (SELECT CAST(SUM(c1) OVER (ORDER BY v) AS BIGINT) AS cc1,
                   CAST(SUM(c2) OVER (ORDER BY v) AS BIGINT) AS cc2
            FROM g),
    t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                 CAST(SUM(c2) AS BIGINT) AS n2 FROM g)
    SELECT t.n1, t.n2,
           CAST(MAX(abs(cc1 * t.n2 - cc2 * t.n1)) AS BIGINT) AS d_num,
           CAST((MAX(abs(cc1 * t.n2 - cc2 * t.n1)) * 1000000)
                // (t.n1 * t.n2) AS BIGINT) AS ks_e6
    FROM cum CROSS JOIN t
    GROUP BY t.n1, t.n2
"""

# x21: per-round CTE chain — counts -> 1-row argmax -> window mark/drop/
# renumber merge. Parallel unnest (positions + tokens) zips in lockstep.
def _x21_round(r: int) -> str:
    return f"""
    c{r} AS (SELECT tok AS x,
                    lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS y
             FROM p{r}),
    r{r} AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS cnt FROM c{r}
             WHERE y IS NOT NULL AND x <> y GROUP BY x, y
             ORDER BY cnt DESC, x, y LIMIT 1),
    m{r} AS (SELECT p.doc_id, p.pos,
                    CASE WHEN p.tok = r.x AND lead(p.tok) OVER w = r.y
                         THEN r.x || '+' || r.y ELSE p.tok END AS tok,
                    CASE WHEN p.tok = r.y AND lag(p.tok) OVER w = r.x
                         THEN 1 ELSE 0 END AS dropped
             FROM p{r} p CROSS JOIN r{r} r
             WINDOW w AS (PARTITION BY p.doc_id ORDER BY p.pos)),
    p{r + 1} AS (SELECT doc_id,
                        row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                            AS pos,
                        tok
                 FROM m{r} WHERE dropped = 0)"""


ORACLE_SQL["x21_bpe_train"] = (
    """
    WITH d AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '),
                           t -> length(t) > 0) AS tk
        FROM documents
    ),
    p1 AS (
        SELECT doc_id,
               unnest(generate_series(1, len(tk))) AS pos,
               unnest(tk) AS tok
        FROM d
    ),"""
    + ",".join(_x21_round(r) for r in (1, 2, 3))
    + """
    SELECT CAST(1 AS BIGINT) AS round, x, y, cnt,
           (SELECT COUNT(*) FROM p1) - (SELECT COUNT(*) FROM p2) AS n_merges
    FROM r1
    UNION ALL
    SELECT CAST(2 AS BIGINT), x, y, cnt,
           (SELECT COUNT(*) FROM p2) - (SELECT COUNT(*) FROM p3)
    FROM r2
    UNION ALL
    SELECT CAST(3 AS BIGINT), x, y, cnt,
           (SELECT COUNT(*) FROM p3) - (SELECT COUNT(*) FROM p4)
    FROM r3
"""
)

# x23: same train CTEs as x21; the encoded corpus IS p4 (the renumber
# after round 3), so the per-doc manifest is one GROUP BY over it.
ORACLE_SQL["x23_bpe_encode"] = (
    """
    WITH d AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '),
                           t -> length(t) > 0) AS tk
        FROM documents
    ),
    p1 AS (
        SELECT doc_id,
               unnest(generate_series(1, len(tk))) AS pos,
               unnest(tk) AS tok
        FROM d
    ),"""
    + ",".join(_x21_round(r) for r in (1, 2, 3))
    + """
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(pos * (('0x' || substr(md5(tok), 1, 8))::BIGINT
                           % 2147483648)) AS BIGINT) AS seq_check
    FROM p4 GROUP BY doc_id
"""
)

# f21: banded forward argmin; ties (same purchase ts) take min event_id,
# matching asof_join_forward's min-__row_id__ contract.
ORACLE_SQL["f21_asof_forward"] = f"""
    WITH ev AS ({_EV}),
    spine AS (SELECT event_id AS spine_id, user_id, ts AS sts
              FROM ev WHERE event_type = 'view'),
    cand AS (
        SELECT s.spine_id, s.user_id, s.sts, f.ts AS fts, f.value, f.event_id
        FROM spine s
        JOIN (SELECT * FROM ev WHERE event_type = 'purchase') f
             USING (user_id)
        WHERE f.ts >= s.sts
          AND epoch_us(f.ts) - epoch_us(s.sts) <= 43200000000
    ),
    pick AS (
        SELECT user_id, sts, fts, value,
               row_number() OVER (PARTITION BY spine_id
                                  ORDER BY fts, event_id) AS rn
        FROM cand
    )
    SELECT user_id, epoch_us(sts) AS view_us, epoch_us(fts) AS buy_us,
           value, epoch_us(fts) - epoch_us(sts) AS time_to_convert_us
    FROM pick WHERE rn = 1
"""

# a20: identical ISO-week truncation both engines; join + count replay.
ORACLE_SQL["a20_retention_cohorts"] = f"""
    WITH ev AS ({_EV}),
    first AS (SELECT user_id, MIN(date_trunc('week', ts)) AS cohort
              FROM ev GROUP BY user_id),
    act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM ev),
    sizes AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_size
              FROM first GROUP BY cohort),
    tri AS (
        SELECT f.cohort, a.week, CAST(COUNT(*) AS BIGINT) AS n_active
        FROM act a JOIN first f USING (user_id)
        GROUP BY f.cohort, a.week
    )
    SELECT epoch_us(t.cohort) AS cohort_us,
           CAST((epoch_us(t.week) - epoch_us(t.cohort))
                // 604800000000 AS BIGINT) AS weeks_since,
           t.n_active, s.cohort_size,
           CAST(t.n_active * 10000 // s.cohort_size AS BIGINT) AS retention_e4
    FROM tri t JOIN sizes s USING (cohort)
"""

# x26: probe ground truth + LSH candidates both replayed from _MH_CTES.
ORACLE_SQL["x26_lsh_recall_eval"] = f"""
    WITH {_MH_CTES},
    ds AS (SELECT doc_id, list_distinct(shs) AS d FROM sh),
    probes AS (
        SELECT doc_id FROM (
            SELECT doc_id,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                       ::BIGINT AS dr
            FROM documents
        ) ORDER BY dr, doc_id LIMIT 50
    ),
    truth AS (
        SELECT DISTINCT LEAST(p.doc_id, o.doc_id) AS lo,
                        GREATEST(p.doc_id, o.doc_id) AS hi
        FROM probes p
        JOIN ds da ON da.doc_id = p.doc_id
        JOIN ds db ON db.doc_id <> p.doc_id
        JOIN documents o ON o.doc_id = db.doc_id
        WHERE CAST(len(list_intersect(da.d, db.d)) AS DOUBLE)
              / len(list_distinct(list_concat(da.d, db.d))) >= 0.5
    ),
    found AS (SELECT t.lo, t.hi FROM truth t
              JOIN cand c ON c.id_a = t.lo AND c.id_b = t.hi),
    a AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM found) AS n_found)
    SELECT CAST(50 AS BIGINT) AS n_probes, n_truth, n_found,
           CAST(CASE WHEN n_truth = 0 THEN 1000000
                     ELSE n_found * 1000000 // n_truth END AS BIGINT)
               AS recall_e6
    FROM a
"""

# ts3: identical daily rollup + lag frame; gaps in the daily grid shift
# lag() rows identically in both engines (row-based, not day-based).
ORACLE_SQL["ts3_seasonal_backtest"] = f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM ({_EV}) GROUP BY event_type, date_trunc('day', ts)
    ),
    lagged AS (
        SELECT event_type, day, n,
               lag(n, 7) OVER w AS pred_seasonal,
               lag(n, 1) OVER w AS pred_naive,
               MAX(day) OVER (PARTITION BY event_type) AS max_day
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    test AS (
        SELECT * FROM lagged
        WHERE day > max_day - INTERVAL 14 DAY
          AND pred_seasonal IS NOT NULL AND pred_naive IS NOT NULL
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(abs(n - pred_seasonal)) * 100 // COUNT(*) AS BIGINT)
               AS mae_seasonal_e2,
           CAST(SUM(abs(n - pred_naive)) * 100 // COUNT(*) AS BIGINT)
               AS mae_naive_e2
    FROM test GROUP BY event_type
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

# io8: rows + content checksum recomputed straight from the source —
# a lossy compaction hash-mismatches; layout facts are pinned as flags.
ORACLE_SQL["io8_compaction"] = f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS rows,
           CAST(SUM(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ','
                     || CAST(epoch_us(ts) AS VARCHAR)), 1, 8))::BIGINT
                    % 2147483648) AS BIGINT) AS content_check,
           CAST(1 AS BIGINT) AS files_after,
           TRUE AS compacted,
           TRUE AS rows_preserved
    FROM ({_EV})
"""

# Shared oracle view for the store-mutation witnesses (f22/f23/f24):
# events in the feature-table shape with integer-cents values.
_FEATS_CENTS = f"""
    SELECT user_id AS entity_id, ts, event_id, event_type,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents
    FROM ({_EV})
"""

ORACLE_SQL["f22_upsert_patch"] = f"""
    WITH feats AS ({_FEATS_CENTS}),
    patch AS (
        SELECT entity_id, ts,
               CAST(MAX(event_id) AS BIGINT) AS event_id,
               'purchase_fixed' AS event_type,
               CAST(max_by(value_cents, event_id) + 1000 AS BIGINT)
                   AS value_cents
        FROM feats WHERE event_type = 'purchase' AND entity_id < 20
        GROUP BY entity_id, ts
    ),
    untouched AS (
        SELECT f.* FROM feats f
        WHERE NOT EXISTS (SELECT 1 FROM patch p
                          WHERE p.entity_id = f.entity_id AND p.ts = f.ts)
    )
    SELECT entity_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_id,
           event_type, value_cents
    FROM (SELECT * FROM untouched UNION ALL SELECT * FROM patch)
"""

ORACLE_SQL["f23_expire_ttl"] = f"""
    WITH feats AS ({_FEATS_CENTS})
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(value_cents) AS BIGINT) AS sum_value_cents,
           CAST(MIN(epoch_us(ts)) AS BIGINT) AS min_ts_us,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM feats) AS v1_rows
    FROM feats
    WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
    GROUP BY event_type
"""

_F24_CHK = (
    "CAST(SUM(('0x' || substr(md5(CAST(entity_id AS VARCHAR) || ',' "
    "|| CAST(epoch_us(ts) AS VARCHAR) || ',' "
    "|| CAST(event_id AS VARCHAR)), 1, 8))::BIGINT "
    "% 2147483648) AS BIGINT)"
)

ORACLE_SQL["f24_erase_audit"] = f"""
    WITH feats AS ({_FEATS_CENTS}),
    v1 AS (SELECT * FROM feats WHERE event_id % 2 = 0),
    v2 AS (SELECT * FROM feats)
    SELECT CAST(1 AS BIGINT) AS version,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM v1
            WHERE entity_id IN (3, 7, 11)) AS rows_removed,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {_F24_CHK} AS content_check
    FROM v1 WHERE entity_id NOT IN (3, 7, 11)
    UNION ALL
    SELECT CAST(2 AS BIGINT),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM v2
            WHERE entity_id IN (3, 7, 11)),
           CAST(COUNT(*) AS BIGINT),
           {_F24_CHK}
    FROM v2 WHERE entity_id NOT IN (3, 7, 11)
"""

# f20: interval containment replayed over the same lead() dim.
ORACLE_SQL["f20_scd2_dim_join"] = f"""
    WITH ev AS ({_EV}),
    dim AS (
        SELECT user_id AS d_user, ts AS valid_from,
               COALESCE(lead(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id),
                        TIMESTAMP '9999-12-31') AS valid_to,
               value AS dim_value, event_id AS dim_event
        FROM ev WHERE event_type = 'click'
    ),
    buys AS (SELECT user_id, event_id, ts FROM ev
             WHERE event_type = 'purchase')
    SELECT b.user_id, b.event_id AS buy_id, epoch_us(b.ts) AS buy_us,
           d.dim_event, d.dim_value
    FROM buys b JOIN dim d
      ON b.user_id = d.d_user
     AND b.ts >= d.valid_from AND b.ts < d.valid_to
"""

# dq7: running-max lateness replayed with the same exclusive frame.
ORACLE_SQL["dq7_lateness_profile"] = f"""
    WITH a AS (
        SELECT user_id, epoch_us(ts) AS ts_us,
               epoch_us(ts) + ('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                               1, 15))::BIGINT % 172800000000 AS arrival_us,
               event_id
        FROM ({_EV})
    ),
    l AS (
        SELECT GREATEST(0, COALESCE(
                   MAX(ts_us) OVER (PARTITION BY user_id
                       ORDER BY arrival_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   - ts_us, 0)) AS late_us
        FROM a
    ),
    b AS (
        SELECT CASE WHEN late_us = 0 THEN 'on_time'
                    WHEN late_us < 3600000000 THEN 'lt_1h'
                    WHEN late_us < 21600000000 THEN 'lt_6h'
                    WHEN late_us < 86400000000 THEN 'lt_24h'
                    ELSE 'ge_24h' END AS bucket,
               late_us
        FROM l
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(late_us) AS BIGINT) AS max_late_us
    FROM b GROUP BY bucket
"""

# a19: single-phase ranking replay of the salted two-phase sample.
ORACLE_SQL["a19_bottomk_sample"] = f"""
    WITH d AS (
        SELECT event_type, event_id,
               ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
                   AS draw
        FROM ({_EV})
    ),
    r AS (SELECT event_type, event_id,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY draw, event_id) AS sample_rank
          FROM d)
    SELECT event_type, CAST(sample_rank AS INTEGER) AS sample_rank, event_id
    FROM r WHERE sample_rank <= 5
"""

# f18: banded argmin replay of the nearest as-of; tie chain
# (distance, backward-first, event_id) matches the operator's
# (|dt|, is_forward, __row_id__) exactly.
ORACLE_SQL["f18_asof_nearest"] = f"""
    WITH ev AS ({_EV}),
    spine AS (SELECT event_id AS spine_id, user_id, ts AS sts
              FROM ev WHERE event_type = 'purchase'),
    cand AS (
        SELECT s.spine_id, s.user_id, s.sts, f.ts AS fts, f.value,
               abs(epoch_us(f.ts) - epoch_us(s.sts)) AS dist,
               CASE WHEN f.ts <= s.sts THEN 0 ELSE 1 END AS fwd,
               f.event_id
        FROM spine s JOIN (SELECT * FROM ev WHERE event_type <> 'purchase') f
             USING (user_id)
        WHERE abs(epoch_us(f.ts) - epoch_us(s.sts)) <= 21600000000
    ),
    pick AS (
        SELECT user_id, sts, fts, value,
               row_number() OVER (PARTITION BY spine_id
                                  ORDER BY dist, fwd, event_id) AS rn
        FROM cand
    )
    SELECT user_id, epoch_us(fts) AS feature_us, value,
           epoch_us(sts) AS spine_us
    FROM pick WHERE rn = 1
"""

# f18b: two physical plans, one oracle (see q_f18b docstring).
ORACLE_SQL["f18b_asof_nearest_banded"] = ORACLE_SQL["f18_asof_nearest"]

ORACLE_SQL["r3_interval_left_join"] = f"""
    SELECT v.user_id,
           v.event_id AS view_id,
           b.event_id AS buy_id,
           epoch_us(v.ts) AS view_us,
           epoch_us(b.ts) AS buy_us
    FROM (SELECT * FROM ({_EV}) WHERE event_type = 'view') v
    LEFT JOIN (SELECT * FROM ({_EV}) WHERE event_type = 'purchase') b
      ON v.user_id = b.user_id
     AND b.ts > v.ts
     AND b.ts <= v.ts + INTERVAL 2 HOUR
"""

# t11: shingle set + multiplicity + coverage replayed relationally.
ORACLE_SQL["t11_dup_span_profile"] = """
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    sh0 AS (SELECT doc_id,
                   CASE WHEN len(tk) >= 8
                        THEN list_transform(generate_series(1, len(tk) - 7),
                             i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                  || ' ' || tk[i+3] || ' ' || tk[i+4] || ' '
                                  || tk[i+5] || ' ' || tk[i+6] || ' '
                                  || tk[i+7])
                        ELSE CAST([] AS VARCHAR[]) END AS shs
            FROM d),
    sh AS (SELECT DISTINCT doc_id, md5(u.s) AS h
           FROM sh0, LATERAL unnest(shs) AS u(s)),
    dup AS (SELECT h FROM sh GROUP BY h HAVING COUNT(*) > 1),
    tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans
            FROM sh GROUP BY doc_id),
    pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans
           FROM sh JOIN dup USING (h) GROUP BY doc_id),
    prof AS (
        SELECT doc_id,
               COALESCE(n_spans, 0) AS n_spans,
               COALESCE(n_dup_spans, 0) AS n_dup_spans,
               CASE WHEN COALESCE(n_spans, 0) = 0 THEN 0
                    ELSE COALESCE(n_dup_spans, 0) * 1000000
                         // n_spans END AS dup_rate_e6
        FROM documents LEFT JOIN tot USING (doc_id)
                       LEFT JOIN pd USING (doc_id)
    )
    SELECT doc_id, CAST(n_spans AS BIGINT) AS n_spans,
           CAST(n_dup_spans AS BIGINT) AS n_dup_spans,
           CAST(dup_rate_e6 AS BIGINT) AS dup_rate_e6
    FROM prof
    ORDER BY dup_rate_e6 DESC, n_dup_spans DESC, doc_id LIMIT 30
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

# dq6: contamination = latest-overall newer than the spine row's cutoff.
ORACLE_SQL["dq6_leakage_audit"] = f"""
    WITH ev AS ({_EV}),
    spine AS (SELECT user_id, ts AS spine_ts FROM ev
              WHERE event_type = 'purchase'),
    latest AS (SELECT user_id, MAX(ts) AS latest_ts FROM ev GROUP BY user_id),
    flagged AS (SELECT s.user_id,
                       CASE WHEN l.latest_ts > s.spine_ts THEN 1 ELSE 0 END
                           AS leak
                FROM spine s JOIN latest l USING (user_id))
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(leak) AS BIGINT) AS n_contaminated,
           CAST(SUM(leak) * 1000000 // COUNT(*) AS BIGINT) AS leak_rate_e6
    FROM flagged GROUP BY user_id
"""

# a18: sketch build + probe replayed cell-for-cell (same md5 bucket family).
ORACLE_SQL["a18_cms_heavy_hitters"] = """
    WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
    rows_ AS (SELECT unnest([0, 1, 2]) AS r),
    cells AS (
        SELECT r, ('0x' || substr(md5(CAST(r AS VARCHAR) || ',' || k), 1, 8))
                      ::BIGINT % 64 AS b
        FROM ev CROSS JOIN rows_
    ),
    sketch AS (SELECT r, b, CAST(COUNT(*) AS BIGINT) AS cnt
               FROM cells GROUP BY r, b),
    probes AS (SELECT CAST(range AS VARCHAR) AS k FROM range(20)),
    pc AS (
        SELECT k, r, ('0x' || substr(md5(CAST(r AS VARCHAR) || ',' || k), 1, 8))
                         ::BIGINT % 64 AS b
        FROM probes CROSS JOIN rows_
    ),
    est AS (SELECT k, CAST(MIN(cnt) AS BIGINT) AS cms_est
            FROM pc JOIN sketch USING (r, b) GROUP BY k),
    exact AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS exact_cnt
              FROM ev JOIN probes USING (k) GROUP BY k)
    SELECT CAST(k AS BIGINT) AS user_id, exact_cnt, cms_est,
           cms_est >= exact_cnt AS bound_holds
    FROM est JOIN exact USING (k)
"""

# x22: assignment replayed with the x10 scalar-subquery argmax; the
# within-cell pair join and per-cell accounting are direct.
ORACLE_SQL["x22_semdedup"] = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
    a AS (SELECT e.vec_id, e.v,
                 (SELECT cid FROM cents
                  ORDER BY list_cosine_similarity(e.v, cv) DESC, cid ASC
                  LIMIT 1) AS cell
          FROM e),
    d AS (SELECT DISTINCT y.cell AS cell, y.vec_id AS drop_id
          FROM a x JOIN a y ON x.cell = y.cell AND x.vec_id < y.vec_id
          WHERE list_cosine_similarity(x.v, y.v) >= 0.35),
    pc AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs FROM a GROUP BY cell),
    pd AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_dropped
           FROM d GROUP BY cell)
    SELECT pc.cell, pc.n_vecs,
           CAST(COALESCE(pd.n_dropped, 0) AS BIGINT) AS n_dropped,
           CAST(pc.n_vecs - COALESCE(pd.n_dropped, 0) AS BIGINT) AS n_kept
    FROM pc LEFT JOIN pd USING (cell)
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


def _fh_oracle_elem(bucket: int, cols: list[str]) -> str:
    """One element of the feature-hash vector: same md5-derived bucket and
    sign-bit expressions as operators/encoding.py feature_hash."""
    terms = []
    for c in cols:
        u = (
            f"CAST(('0x' || substr(md5('{c}=' || CAST({c} AS VARCHAR)), 1, 15)) "
            "AS BIGINT)"
        )
        terms.append(
            f"CASE WHEN {u} % 16 = {bucket} THEN "
            f"(CASE WHEN ({u} >> 59) % 2 = 0 THEN 1 ELSE -1 END) ELSE 0 END"
        )
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


ORACLE_SQL["fe2_feature_hash"] = (
    "SELECT event_id, array_to_string(list_transform(["
    + ", ".join(_fh_oracle_elem(b, ["event_type", "props"]) for b in range(16))
    + "], x -> CAST(x AS VARCHAR)), ',') AS fhash FROM events"
)

_TOKS_CTE = """
    toks AS (
        SELECT list_filter(string_split(lower(text), ' '),
                           t -> length(t) > 0) AS tk
        FROM documents
    )
"""

ORACLE_SQL["t9_ngram_counts"] = f"""
    WITH {_TOKS_CTE},
    grams AS (
        SELECT unnest(CASE WHEN len(tk) >= 3
                      THEN list_transform(generate_series(1, len(tk) - 2),
                           i -> array_to_string(tk[i:i+2], ' '))
                      ELSE CAST([] AS VARCHAR[]) END) AS gram
        FROM toks
    )
    SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM grams GROUP BY gram
    ORDER BY cnt DESC, gram LIMIT 30
"""

ORACLE_SQL["t10_pmi_collocations"] = f"""
    WITH {_TOKS_CTE},
    uc AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM (SELECT unnest(tk) AS gram FROM toks) GROUP BY gram),
    n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_tokens FROM uc),
    bc AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS c_xy
           FROM (SELECT unnest(CASE WHEN len(tk) >= 2
                        THEN list_transform(generate_series(1, len(tk) - 1),
                             i -> array_to_string(tk[i:i+1], ' '))
                        ELSE CAST([] AS VARCHAR[]) END) AS gram
                 FROM toks)
           GROUP BY gram HAVING COUNT(*) >= 5),
    w AS (SELECT gram, c_xy,
                 string_split(gram, ' ')[1] AS x,
                 string_split(gram, ' ')[2] AS y
          FROM bc)
    SELECT w.gram, w.c_xy, ux.cnt AS c_x, uy.cnt AS c_y,
           CAST((w.c_xy * n.n_tokens * 10000) // (ux.cnt * uy.cnt) AS BIGINT)
               AS pmi_ratio_e4
    FROM w JOIN uc ux ON ux.gram = w.x
           JOIN uc uy ON uy.gram = w.y
           CROSS JOIN n
    ORDER BY pmi_ratio_e4 DESC, w.gram LIMIT 20
"""

ORACLE_SQL["g3_triangle_count"] = """
    WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
                WHERE l_shipdate >= '1995-01-01'
                  AND l_shipdate < '1996-01-01'),
    e AS (SELECT DISTINCT a.l_partkey AS lo, b.l_partkey AS hi
          FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                             AND a.l_partkey < b.l_partkey),
    tri AS (SELECT ab.lo FROM e ab
            JOIN e bc ON ab.hi = bc.lo
            JOIN e ac ON ac.lo = ab.lo AND ac.hi = bc.hi)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM tri) AS n_triangles
"""

# g3b: intentionally the id-ordered replay — independent algorithm, same
# count (see q_g3b docstring).
ORACLE_SQL["g3b_triangle_degree_ordered"] = ORACLE_SQL["g3_triangle_count"]

# a17: all-integer covariance numerators; every SUM wrapped back to BIGINT
# (DuckDB sums BIGINT into HUGEINT).
_A17_QCOLS = ", ".join(
    f"CAST(floor(CAST(embedding[{i + 1}] AS DOUBLE) * 1000) AS BIGINT) AS q{i}"
    for i in range(8)
)
_A17_AGGS = (
    "CAST(COUNT(*) AS BIGINT) AS n, "
    + ", ".join(f"CAST(SUM(q{i}) AS BIGINT) AS s{i}" for i in range(8))
    + ", "
    + ", ".join(
        f"CAST(SUM(q{i} * q{j}) AS BIGINT) AS p{i}_{j}"
        for i in range(8)
        for j in range(i, 8)
    )
)
_A17_ARMS = " UNION ALL ".join(
    f"SELECT CAST({i} AS BIGINT) AS i, CAST({j} AS BIGINT) AS j, "
    f"CAST(p{i}_{j} * n - s{i} * s{j} AS BIGINT) AS cov_num, n FROM a"
    for i in range(8)
    for j in range(i, 8)
)
ORACLE_SQL["a17_covariance_matrix"] = (
    f"WITH t AS (SELECT {_A17_QCOLS} FROM embeddings), "
    f"a AS (SELECT {_A17_AGGS} FROM t) {_A17_ARMS}"
)

ORACLE_SQL["rag1_hybrid_search"] = f"""
    WITH bm AS ({ORACLE_SQL["s3_bm25_search"]}),
    bmr AS (SELECT doc_id,
                   CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id)
                        AS BIGINT) AS r_lex
            FROM bm),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    qv AS (SELECT v AS q FROM e WHERE vec_id = 0),
    sem AS (SELECT vec_id, list_cosine_similarity(v, q) AS sim
            FROM e CROSS JOIN qv WHERE vec_id <> 0
            ORDER BY sim DESC, vec_id LIMIT 20),
    semr AS (SELECT vec_id AS doc_id,
                    CAST(row_number() OVER (ORDER BY sim DESC, vec_id)
                         AS BIGINT) AS r_sem
             FROM sem)
    SELECT COALESCE(bmr.doc_id, semr.doc_id) AS doc_id, r_lex, r_sem,
           CAST(COALESCE(1000000 // (60 + r_lex), 0)
                + COALESCE(1000000 // (60 + r_sem), 0) AS BIGINT) AS rrf_e6
    FROM bmr FULL OUTER JOIN semr ON bmr.doc_id = semr.doc_id
    ORDER BY rrf_e6 DESC, doc_id LIMIT 10
"""

# --------------------------------------------------------------------------- #
# round-3 fourth wave: vocab encode, rolling anomaly, k-core, MMR rerank
# --------------------------------------------------------------------------- #

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


def q_ts4_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection over the daily revenue series per
    event type — the monitoring primitive behind every metric alert. The
    trailing window is the 7 PRIOR days (rows frame, current row
    excluded, so the tested point never contaminates its own baseline).
    All arithmetic is cross-multiplied integers on cent sums: with
    x = today, S/Q = sum/sum-of-squares of the n prior days,
    z^2 = (n*x - S)^2 / (n*Q - S^2) — so the 3-sigma flag is the exact
    integer predicate (n*x-S)^2 > 9*(n*Q-S^2), no sqrt, no float
    accumulation, bit-identical in any engine. z2_e2 (z^2 in
    hundredths) is exact while daily cents < ~3e8 (then (n*x-S)^2 * 100
    approaches 2^63; at larger scale drop the *100 or use DECIMAL).
    Plan: one partial-agg groupBy to the daily grain, ONE window shuffle
    on event_type — series length per key is days, not events."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    daily = ev.groupBy("event_type", "day").agg(F.sum("cents").alias("x"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    s = daily.select(
        "event_type",
        _US("day").alias("day_us"),
        "x",
        F.count("x").over(w).alias("n"),
        F.coalesce(F.sum("x").over(w), F.lit(0)).alias("S"),
        F.coalesce(F.sum(F.col("x") * F.col("x")).over(w), F.lit(0)).alias("Q"),
    )
    lhs = (F.col("n") * F.col("x") - F.col("S")) * (F.col("n") * F.col("x") - F.col("S"))
    rhs = F.col("n") * F.col("Q") - F.col("S") * F.col("S")
    return s.select(
        "event_type",
        "day_us",
        F.col("x").alias("cents"),
        F.col("n").cast("long").alias("n_prior"),
        F.when((F.col("n") == 7) & (lhs > 9 * rhs), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_anomaly"),
        F.when((F.col("n") == 7) & (rhs > 0), F.expr(
            "((n*x - S) * (n*x - S) * 100L) div (n*Q - S*S)"
        ))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("z2_e2"),
    )


def q_g4_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition of the customer->supplier purchase graph (g2's
    edges): peel nodes with degree < k for 3 rounds
    (operators/graph.py kcore — bounded-round contract). k is derived
    from the data, not hard-coded: k = ceil(E/N) (half the average
    degree), two scalar aggregates collected driver-side — the same
    bounded-collect budget as the pagerank/k-means model parameters —
    so the query self-adapts across scale factors. Output: the 30
    highest-degree core members plus the surviving core size on every
    row (one broadcast scalar). The DuckDB twin unrolls the identical
    three peels as CTEs with the same derived k."""
    from .operators.graph import kcore

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
    )
    und = (
        edges.select(
            F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi")
        )
        .filter(F.col("lo") < F.col("hi"))
        .distinct()
        .localCheckpoint(eager=True)  # reused for E, N and the peel itself
    )
    n_edges = und.count()
    n_nodes = (
        und.select(F.col("lo").alias("n"))
        .unionByName(und.select(F.col("hi").alias("n")))
        .distinct()
        .count()
    )
    if n_nodes == 0:  # no edges at all -> empty core, same schema
        return spark.createDataFrame([], "node string, degree long, n_core long")
    k = -(-n_edges // n_nodes)  # ceil(E/N)
    core = kcore(und.select(F.col("lo").alias("src"), F.col("hi").alias("dst")), k=k, rounds=3)
    size = core.agg(F.count("*").alias("n_core"))
    return (
        core.orderBy(F.col("degree").desc(), "node")
        .limit(30)
        .crossJoin(F.broadcast(size))
        .select("node", F.col("degree").cast("long"), F.col("n_core").cast("long"))
    )


def q_rag3_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance re-ranking — the diversification step
    between retrieval (rag1) and the context window: from the top-20
    cosine candidates for query vec_id=0, greedily select 5 maximizing
    7*rel - 3*max_sim_to_already_selected (lambda=0.7 scaled by 10).
    Every similarity is quantized to floor(round(sim,6)*1e6+0.5) BIGINT
    BEFORE any comparison, so candidate order and all 5 greedy argmax
    steps are exact integer decisions replayed verbatim by the oracle's
    unrolled CTEs (ties broken by vec_id ASC). Plan: relevance arm is
    one broadcast-query scan + TakeOrderedAndProject; the pair matrix is
    a 20x20 broadcast self-join; the greedy loop runs driver-side over
    those <=400 collected integers (the bounded-collect budget — at any
    corpus size the loop sees k^2 numbers, never data)."""
    emb = table(spark, sf_dir, "embeddings").withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    quant = lambda c: F.floor(F.round(c, 6) * 1_000_000 + F.lit(0.5)).cast("long")
    cand = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .withColumn("rel_e6", quant(_cosine(F.col("v"), F.col("qv"))))
        .orderBy(F.col("rel_e6").desc(), F.col("vec_id").asc())
        .limit(20)
        .select("vec_id", "rel_e6", "v")
        .localCheckpoint(eager=True)
    )
    a = cand.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"))
    b = cand.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"))
    pairs = a.join(F.broadcast(b), F.col("ia") != F.col("ib")).select(
        "ia", "ib", quant(_cosine(F.col("va"), F.col("vb"))).alias("sim_e6")
    )
    rels = {int(r["vec_id"]): int(r["rel_e6"]) for r in cand.select("vec_id", "rel_e6").collect()}
    sims = {(int(r["ia"]), int(r["ib"])): int(r["sim_e6"]) for r in pairs.collect()}
    selected: list[int] = []
    out = []
    for rank in range(1, 6):
        best = None
        for c in sorted(rels):
            if c in selected:
                continue
            pen = max((sims[(c, s)] for s in selected), default=0)
            score = 7 * rels[c] - 3 * pen
            if best is None or score > best[1]:
                best = (c, score)
        if best is None:
            break
        selected.append(best[0])
        out.append((rank, best[0], rels[best[0]], best[1]))
    return spark.createDataFrame(
        out, "rank long, vec_id long, rel_e6 long, mmr_e6 long"
    )


QUERIES["fe3_vocab_encode"] = q_fe3_vocab_encode
QUERIES["ts4_rolling_anomaly"] = q_ts4_rolling_anomaly
QUERIES["g4_kcore"] = q_g4_kcore
QUERIES["rag3_mmr_rerank"] = q_rag3_mmr_rerank

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

ORACLE_SQL["ts4_rolling_anomaly"] = f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
        FROM ({_EV}) GROUP BY 1, 2
    ),
    s AS (
        SELECT event_type, epoch_us(day) AS day_us, x,
               CAST(COUNT(x) OVER w AS BIGINT) AS n,
               CAST(COALESCE(SUM(x) OVER w, 0) AS BIGINT) AS S,
               CAST(COALESCE(SUM(x * x) OVER w, 0) AS BIGINT) AS Q
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, day_us, x AS cents, n AS n_prior,
           CAST(CASE WHEN n = 7
                      AND (n*x - S) * (n*x - S) > 9 * (n*Q - S*S)
                     THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly,
           CAST(CASE WHEN n = 7 AND (n*Q - S*S) > 0
                     THEN ((n*x - S) * (n*x - S) * 100) // (n*Q - S*S)
                     ELSE 0 END AS BIGINT) AS z2_e2
    FROM s
"""


def _g4_sql(rounds: int = 3) -> str:
    peels = []
    prev = "adj0"
    for i in range(1, rounds + 1):
        peels.append(f"""
        d{i} AS (SELECT node, COUNT(*) AS deg FROM {prev} GROUP BY node),
        k{i} AS (SELECT node FROM d{i}, kv WHERE deg >= kv.k),
        adj{i} AS (SELECT a.node, a.peer FROM {prev} a
                   JOIN k{i} x ON a.node = x.node
                   JOIN k{i} y ON a.peer = y.node)""")
        prev = f"adj{i}"
    return f"""
        WITH e0 AS (
            SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS lo,
                            's' || CAST(l_suppkey AS VARCHAR) AS hi
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ),
        adj0 AS (SELECT lo AS node, hi AS peer FROM e0
                 UNION ALL SELECT hi, lo FROM e0),
        kv AS (
            SELECT CAST(((SELECT COUNT(*) FROM e0)
                         + (SELECT COUNT(DISTINCT node) FROM adj0) - 1)
                        // (SELECT COUNT(DISTINCT node) FROM adj0)
                   AS BIGINT) AS k
        ),
        {",".join(peels)},
        core AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
                 FROM {prev} GROUP BY node),
        sz AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_core FROM core)
        SELECT node, degree, sz.n_core
        FROM core CROSS JOIN sz
        ORDER BY degree DESC, node ASC LIMIT 30
    """


ORACLE_SQL["g4_kcore"] = _g4_sql()


def _rag3_sql(n_select: int = 5) -> str:
    q6 = "CAST(floor(round(list_cosine_similarity({a}, {b}), 6) * 1000000 + 0.5) AS BIGINT)"
    rounds = []
    for i in range(1, n_select + 1):
        if i == 1:
            rounds.append("""
        s1 AS (SELECT vec_id, rel_e6, CAST(7 * rel_e6 AS BIGINT) AS mmr_e6
               FROM cand ORDER BY 7 * rel_e6 DESC, vec_id ASC LIMIT 1),
        sel1 AS (SELECT vec_id FROM s1)""")
        else:
            rounds.append(f"""
        s{i} AS (
            SELECT c.vec_id, c.rel_e6,
                   CAST(7 * c.rel_e6 - 3 * (
                       SELECT MAX(p.sim_e6) FROM pairs p
                       JOIN sel{i - 1} s ON p.ib = s.vec_id
                       WHERE p.ia = c.vec_id
                   ) AS BIGINT) AS mmr_e6
            FROM cand c
            WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
            ORDER BY mmr_e6 DESC, c.vec_id ASC LIMIT 1
        ),
        sel{i} AS (SELECT vec_id FROM sel{i - 1}
                   UNION ALL SELECT vec_id FROM s{i})""")
        prev_sel = f"sel{i}"
    finals = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS rank, vec_id, rel_e6, mmr_e6 FROM s{i}"
        for i in range(1, n_select + 1)
    )
    rel_q = q6.format(a="e.v", b="q.qv")
    pair_q = q6.format(a="x.v", b="y.v")
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        cand AS (
            SELECT e.vec_id, {rel_q} AS rel_e6, e.v
            FROM e CROSS JOIN q WHERE e.vec_id <> 0
            ORDER BY rel_e6 DESC, e.vec_id ASC LIMIT 20
        ),
        pairs AS (
            SELECT x.vec_id AS ia, y.vec_id AS ib, {pair_q} AS sim_e6
            FROM cand x JOIN cand y ON x.vec_id <> y.vec_id
        ),
        {",".join(rounds)}
        {finals}
    """


ORACLE_SQL["rag3_mmr_rerank"] = _rag3_sql()


def q_j4_bloom_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit Bloom-filter join pruning — the runtime-filter pattern for
    when the dim key set is too large to ship as an IN-list but a bit
    set is cheap: BUILDING-segment customers hash to 2 md5 positions in
    an m=8192 space; orders pass the probe iff BOTH positions are set.
    The no-false-negative guarantee and the measured false-positive rate
    are both emitted as checked integers (candidates >= true matches by
    construction; fp rate over true negatives in ppm). Plan: the
    position table (<= m rows, deduped) broadcasts; the probe is two
    broadcast semi joins — the fact is never shuffled, which is the
    whole point at 100 TB. The exact-verify arm is the ground-truth semi
    join the filter would precede in production. m scales with dim
    cardinality (bits-per-key tunes fp; 2 hashes here keep the oracle
    compact)."""
    M = 8192
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    dim = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )

    def h(key_col, i: int):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(key_col.cast("string"), F.lit(f":{i}"))), 1, 15
                ),
                16,
                10,
            ).cast("long")
            % M
        )

    bits = (
        dim.select(F.explode(F.array(h(F.col("k"), 1), h(F.col("k"), 2))).alias("pos"))
        .distinct()
    )
    probed = orders.select(
        "o_orderkey",
        "o_custkey",
        h(F.col("o_custkey"), 1).alias("p1"),
        h(F.col("o_custkey"), 2).alias("p2"),
    )
    cand = probed.join(
        F.broadcast(bits.withColumnRenamed("pos", "p1")), "p1", "left_semi"
    ).join(F.broadcast(bits.withColumnRenamed("pos", "p2")), "p2", "left_semi")
    true_m = orders.join(
        F.broadcast(dim.withColumnRenamed("k", "o_custkey")), "o_custkey", "left_semi"
    )
    return (
        orders.agg(F.count("*").alias("n_orders"))
        .crossJoin(cand.agg(F.count("*").alias("n_candidates")))
        .crossJoin(true_m.agg(F.count("*").alias("n_true")))
        .select(
            "n_orders",
            "n_candidates",
            "n_true",
            (F.col("n_candidates") - F.col("n_true")).alias("n_false_pos"),
            F.when(
                F.col("n_orders") > F.col("n_true"),
                F.expr("(n_candidates - n_true) * 1000000L div (n_orders - n_true)"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("fp_ppm"),
        )
    )


def q_x27_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup — the production shape where a NEW batch
    (doc_id % 5 == 0 here) is deduped AGAINST an existing reference
    corpus, never old-vs-old: exact matches via normalized-hash semi
    join, near-dups via the portable MinHash-LSH family (x6's machinery)
    with candidates restricted to cross pairs and Jaccard-verified at
    0.5. One manifest row per new doc: exact flag, verified fuzzy match
    count, best Jaccard (e6 int). Plan: the exact arm shuffles 16-byte
    hashes; LSH banding bounds pair generation exactly as in x6 — the
    old corpus is re-signed but NEVER self-joined (the cross filter
    drops old×old buckets before the verify); at 100 TB old signatures
    are precomputed once and stored, making each increment's cost
    proportional to the batch, not the corpus."""
    from .operators.dedup import dedup_minhash_lsh, ngram_jaccard

    docs = table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 5 == 0
    h = docs.select("doc_id", F.md5(F.lower(F.trim("text"))).alias("hh"), is_new.alias("nw"))
    exacts = (
        h.filter("nw")
        .join(
            h.filter(~F.col("nw")).select("hh").distinct(),
            "hh",
            "left_semi",
        )
        .select("doc_id")
        .withColumn("is_exact", F.lit(1))
    )
    pairs = dedup_minhash_lsh(docs, num_hashes=16, bands=4, hash_family="md5_affine")
    cross = pairs.filter(
        (F.col("id_a") % 5 == 0) != (F.col("id_b") % 5 == 0)
    ).select(
        F.when(F.col("id_a") % 5 == 0, F.col("id_a")).otherwise(F.col("id_b")).alias("id_a"),
        F.when(F.col("id_a") % 5 == 0, F.col("id_b")).otherwise(F.col("id_a")).alias("id_b"),
    )
    ver = ngram_jaccard(docs, cross, threshold=0.5).select(
        F.col("id_a").alias("doc_id"),
        F.floor(F.col("jaccard") * 1_000_000 + F.lit(0.5)).cast("long").alias("j_e6"),
    )
    fz = ver.groupBy("doc_id").agg(
        F.count("*").alias("n_fuzzy"), F.max("j_e6").alias("best_j_e6")
    )
    return (
        docs.filter(is_new)
        .select("doc_id")
        .join(exacts, "doc_id", "left")
        .join(fz, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("is_exact", F.lit(0)).cast("long").alias("is_exact_dup"),
            F.coalesce("n_fuzzy", F.lit(0)).cast("long").alias("n_fuzzy"),
            F.coalesce("best_j_e6", F.lit(0)).cast("long").alias("best_j_e6"),
        )
    )


def q_card1_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus data card — the one-page per-language summary every released
    training set ships with (docs, token volume, mean length, exact-dup
    and short-doc rates), computed in ONE pass over the corpus: per-doc
    facts are map-side projections; the rollup is a single partial-agg
    groupBy on language with countDistinct on the 16-byte normalized
    hash (dup count = docs - distinct texts). All rates are integer e4.
    The output is |languages| rows at any corpus size."""
    docs = table(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        F.col("n_chars").cast("long").alias("nc"),
        F.size(F.split("text", " ")).cast("long").alias("nt"),
        F.md5(F.lower(F.trim("text"))).alias("hh"),
        F.when(F.col("n_chars") < 100, 1).otherwise(0).cast("long").alias("short"),
    )
    return d.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("nt").alias("total_tokens"),
        F.expr("sum(nc) div count(*)").alias("mean_chars"),
        (F.count("*") - F.countDistinct("hh")).cast("long").alias("n_exact_dups"),
        F.expr("(count(*) - count(distinct hh)) * 10000L div count(*)").alias("dup_e4"),
        F.sum("short").alias("n_short"),
        F.expr("sum(short) * 10000L div count(*)").alias("short_e4"),
    )


QUERIES["j4_bloom_probe"] = q_j4_bloom_probe
QUERIES["x27_incremental_dedup"] = q_x27_incremental_dedup
QUERIES["card1_data_card"] = q_card1_data_card

ORACLE_SQL["j4_bloom_probe"] = """
    WITH dim AS (SELECT c_custkey AS k FROM customer
                 WHERE c_mktsegment = 'BUILDING'),
    bits AS (
        SELECT DISTINCT ('0x' || substr(md5(CAST(k AS VARCHAR) || ':' ||
                         CAST(i AS VARCHAR)), 1, 15))::BIGINT % 8192 AS pos
        FROM dim CROSS JOIN (SELECT 1 AS i UNION ALL SELECT 2) g
    ),
    probed AS (
        SELECT o_orderkey, o_custkey,
               ('0x' || substr(md5(CAST(o_custkey AS VARCHAR) || ':1'), 1, 15))::BIGINT
                   % 8192 AS p1,
               ('0x' || substr(md5(CAST(o_custkey AS VARCHAR) || ':2'), 1, 15))::BIGINT
                   % 8192 AS p2
        FROM orders
    ),
    cand AS (SELECT * FROM probed
             WHERE p1 IN (SELECT pos FROM bits)
               AND p2 IN (SELECT pos FROM bits)),
    tru AS (SELECT o_orderkey FROM orders
            WHERE o_custkey IN (SELECT k FROM dim)),
    a AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_orders,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM tru) AS n_true)
    SELECT n_orders, n_candidates, n_true,
           n_candidates - n_true AS n_false_pos,
           CAST(CASE WHEN n_orders > n_true
                     THEN (n_candidates - n_true) * 1000000 // (n_orders - n_true)
                     ELSE 0 END AS BIGINT) AS fp_ppm
    FROM a
"""

ORACLE_SQL["x27_incremental_dedup"] = f"""
    WITH {_MH_CTES},
    h AS (SELECT doc_id, md5(lower(trim(text))) AS hh,
                 doc_id % 5 = 0 AS nw
          FROM documents),
    exacts AS (
        SELECT DISTINCT n.doc_id FROM h n
        WHERE n.nw AND n.hh IN (SELECT hh FROM h WHERE NOT nw)
    ),
    crossc AS (
        SELECT CASE WHEN id_a % 5 = 0 THEN id_a ELSE id_b END AS new_id,
               CASE WHEN id_a % 5 = 0 THEN id_b ELSE id_a END AS old_id
        FROM cand WHERE (id_a % 5 = 0) <> (id_b % 5 = 0)
    ),
    ds AS (SELECT doc_id, list_distinct(shs) AS d FROM sh),
    ver AS (
        SELECT c.new_id,
               CAST(floor(CAST(len(list_intersect(da.d, db.d)) AS DOUBLE)
                          / len(list_distinct(list_concat(da.d, db.d)))
                          * 1000000 + 0.5) AS BIGINT) AS j_e6
        FROM crossc c
        JOIN ds da ON da.doc_id = c.new_id
        JOIN ds db ON db.doc_id = c.old_id
        WHERE CAST(len(list_intersect(da.d, db.d)) AS DOUBLE)
              / len(list_distinct(list_concat(da.d, db.d))) >= 0.5
    ),
    fz AS (SELECT new_id, CAST(COUNT(*) AS BIGINT) AS n_fuzzy,
                  CAST(MAX(j_e6) AS BIGINT) AS best_j_e6
           FROM ver GROUP BY new_id)
    SELECT d.doc_id,
           CAST(CASE WHEN e.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
               AS is_exact_dup,
           COALESCE(fz.n_fuzzy, 0) AS n_fuzzy,
           COALESCE(fz.best_j_e6, 0) AS best_j_e6
    FROM documents d
    LEFT JOIN exacts e ON e.doc_id = d.doc_id
    LEFT JOIN fz ON fz.new_id = d.doc_id
    WHERE d.doc_id % 5 = 0
"""

ORACLE_SQL["card1_data_card"] = """
    WITH d AS (
        SELECT lang, CAST(n_chars AS BIGINT) AS nc,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
               md5(lower(trim(text))) AS hh,
               CASE WHEN n_chars < 100 THEN 1 ELSE 0 END AS short
        FROM documents
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS total_tokens,
           CAST(SUM(nc) // COUNT(*) AS BIGINT) AS mean_chars,
           CAST(COUNT(*) - COUNT(DISTINCT hh) AS BIGINT) AS n_exact_dups,
           CAST((COUNT(*) - COUNT(DISTINCT hh)) * 10000 // COUNT(*) AS BIGINT)
               AS dup_e4,
           CAST(SUM(short) AS BIGINT) AS n_short,
           CAST(SUM(short) * 10000 // COUNT(*) AS BIGINT) AS short_e4
    FROM d GROUP BY lang
"""

def q_j5_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic salted shuffle join (operators/skew.py salted_join):
    events join their per-user first-seen dim on (user_id, salt) with
    the salt md5-derived from event_id — the structural answer when AQE's
    skew split isn't enough because one hot entity still funnels into a
    single reducer. The dim is replicated 16x (map-only explode); result
    is EXACTLY the unsalted join, which is what the plain-join oracle
    checks. The merge hint pins the shuffle-join shape the salt exists
    for (at test scale the optimizer would otherwise broadcast the dim
    and hide the salted exchange this query demonstrates); SKEW.md
    measures the hot-key behavior."""
    from .operators.skew import salted_join

    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    dim = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
        .hint("merge")
    )
    j = salted_join(ev, dim, "user_id", salt_by="event_id", n_salts=16)
    age_days = F.expr(
        "(unix_micros(ts) - unix_micros(first_ts)) div 86400000000L"
    )
    return j.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(age_days).cast("long").alias("sum_age_days"),
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


def q_io10_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) multi-dimensional clustering — the layout
    answer when ONE partition column isn't enough (io5 prunes on a
    single dim; real feature scans filter on entity AND time). The
    16-bit interleave of (user_id, day index) is pure JVM bit math;
    repartitionByRange + sortWithinPartitions on the z-value co-locates
    rows close in BOTH dims into the same files, so parquet row-group
    min/max stats on the ORIGINAL columns skip most files for a 2-D
    predicate — Delta/Iceberg OPTIMIZE ZORDER does exactly this. The
    z-value is a write-time ordering key only (never stored); the read
    back applies the 2-D predicate and aggregates, which the oracle
    recomputes from the source table. tests/test_plans.py gates that
    both predicates are PUSHED to the scan and that per-file day spans
    are actually narrow (the clustering, not just the roundtrip)."""
    ev = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    z = (
        ev.withColumn("ux", (F.col("user_id") % 65536).cast("long"))
        .withColumn(
            "dy",
            (F.expr("unix_micros(date_trunc('day', ts)) div 86400000000L") % 65536).cast(
                "long"
            ),
        )
        .withColumn(
            "z",
            F.expr(
                "aggregate(sequence(0, 15), 0L, (acc, i) -> acc"
                " + shiftleft(CAST(shiftright(ux, i) % 2 AS BIGINT), 2 * i)"
                " + shiftleft(CAST(shiftright(dy, i) % 2 AS BIGINT), 2 * i + 1))"
            ),
        )
    )
    d = _scratch_dir("io10_zorder", sf_dir)
    z.repartitionByRange(16, "z").sortWithinPartitions("z").drop(
        "ux", "dy", "z"
    ).write.mode("overwrite").parquet(d)
    back = spark.read.parquet(d).filter(
        (F.col("user_id").between(4, 11))
        & (F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-20").cast("timestamp"))
    )
    return back.agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
            "sum_cents"
        ),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


def q_dq9_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectation suite — the Great-Expectations shape: a
    config of row-level rules evaluated warehouse-wide in one pass per
    table, one output row per rule with pass/fail accounting (rates as
    integer e4). Rules cover the standard families: range, value-set,
    regex, cross-column ordering, and key uniqueness. Plan: each rule is
    a map-side CASE folded into its table's single aggregate — adding a
    rule adds one expression, never a scan; uniqueness rides the same
    aggregate as count - countDistinct. At 100 TB this is the nightly
    contract check before data ships to training."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    cust = table(spark, sf_dir, "customer")

    def rule(name: str, agg_df: DataFrame) -> DataFrame:
        return agg_df.select(
            F.lit(name).alias("rule"),
            F.col("n").cast("long").alias("n_rows"),
            F.col("p").cast("long").alias("n_pass"),
            (F.col("n") - F.col("p")).cast("long").alias("n_fail"),
            F.expr("p * 10000L div n").cast("long").alias("pass_e4"),
        )

    o_agg = orders.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("o_totalprice") > 0, 1).otherwise(0)).alias("p"),
        F.sum(F.when(F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)).alias(
            "p2"
        ),
        F.countDistinct("o_orderkey").alias("p3"),
    )
    r1 = rule("orders_totalprice_positive", o_agg.select("n", "p"))
    r2 = rule(
        "orders_status_in_set", o_agg.select("n", F.col("p2").alias("p"))
    )
    r3 = rule(
        "orders_orderkey_unique", o_agg.select("n", F.col("p3").alias("p"))
    )
    c_agg = cust.agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("c_name").rlike("^Customer#[0-9]{9}$"), 1).otherwise(0)
        ).alias("p"),
    )
    r4 = rule("customer_name_format", c_agg)
    l_agg = li.agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(
                (F.col("l_discount") >= 0)
                & (F.col("l_discount") <= 1)
                & (F.col("l_tax") >= 0),
                1,
            ).otherwise(0)
        ).alias("p"),
    )
    r5 = rule("lineitem_rates_in_unit_range", l_agg)
    return r1.unionByName(r2).unionByName(r3).unionByName(r4).unionByName(r5)


def q_sd3_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming SESSIONIZATION witness (streaming/stateful.py
    streaming_session_counts): the events are split at the month's midpoint
    into two parquet files and streamed through the REAL
    applyInPandasWithState gap-fold with maxFilesPerTrigger=1 — so
    sessions spanning the batch boundary exercise the state carry-over —
    into a memory sink; the final per-user snapshot is returned. The
    time-boundary split keeps the feed per-key ordered across batches
    (the watermark assumption), making the fold deterministic; the
    oracle is x7_sessionize's window SQL VERBATIM — the driver itself
    witnesses that the streaming state machine and the batch
    lag()/running-sum plan compute one answer."""
    from .streaming.ingest import stream_events
    from .streaming.stateful import streaming_session_counts

    d = _scratch_dir("sd3_feed", sf_dir)
    ev = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    mid = F.lit("2024-01-16").cast("timestamp")
    _write_ordered_feed(
        d, ev.filter(F.col("ts") < mid), ev.filter(F.col("ts") >= mid)
    )
    stream = stream_events(spark, d)
    q = (
        streaming_session_counts(stream)
        .writeStream.format("memory")
        .queryName("sd3_sessions")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()
    snap = spark.table("sd3_sessions")
    return (
        snap.groupBy("user_id")
        .agg(
            F.max_by("n_sessions", "n_events").alias("n_sessions"),
            F.max("n_events").alias("n_events"),
        )
        .select("user_id", "n_sessions", "n_events")
    )


QUERIES["sd3_streaming_sessionize"] = q_sd3_streaming_sessionize
# same answer, two machines: the batch lag()/running-sum plan (x7) and
# the streaming state fold must agree row-for-row
ORACLE_SQL["sd3_streaming_sessionize"] = ORACLE_SQL["x7_sessionize"]

QUERIES["j5_salted_join"] = q_j5_salted_join
QUERIES["fe4_robust_scale"] = q_fe4_robust_scale
QUERIES["io10_zorder_layout"] = q_io10_zorder_layout
QUERIES["dq9_expectations"] = q_dq9_expectations

ORACLE_SQL["dq9_expectations"] = """
    WITH o AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS p1,
               CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P')
                             THEN 1 ELSE 0 END) AS BIGINT) AS p2,
               CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS p3
        FROM orders
    ),
    c AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN regexp_matches(c_name, '^Customer#[0-9]{9}$')
                             THEN 1 ELSE 0 END) AS BIGINT) AS p
        FROM customer
    ),
    l AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN l_discount >= 0 AND l_discount <= 1
                              AND l_tax >= 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS p
        FROM lineitem
    )
    SELECT 'orders_totalprice_positive' AS rule, n AS n_rows, p1 AS n_pass,
           n - p1 AS n_fail, CAST(p1 * 10000 // n AS BIGINT) AS pass_e4 FROM o
    UNION ALL
    SELECT 'orders_status_in_set', n, p2, n - p2,
           CAST(p2 * 10000 // n AS BIGINT) FROM o
    UNION ALL
    SELECT 'orders_orderkey_unique', n, p3, n - p3,
           CAST(p3 * 10000 // n AS BIGINT) FROM o
    UNION ALL
    SELECT 'customer_name_format', n, p, n - p,
           CAST(p * 10000 // n AS BIGINT) FROM c
    UNION ALL
    SELECT 'lineitem_rates_in_unit_range', n, p, n - p,
           CAST(p * 10000 // n AS BIGINT) FROM l
"""

ORACLE_SQL["j5_salted_join"] = f"""
    WITH ev AS ({_EV}),
    dim AS (SELECT user_id, MIN(ts) AS first_ts FROM ev GROUP BY user_id)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM((epoch_us(ev.ts) - epoch_us(dim.first_ts))
                    // 86400000000) AS BIGINT) AS sum_age_days
    FROM ev JOIN dim USING (user_id)
    GROUP BY event_type
"""

ORACLE_SQL["io10_zorder_layout"] = f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_cents,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM ({_EV})
    WHERE user_id BETWEEN 4 AND 11
      AND ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
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

from .relational import RELATIONAL_ORACLE, RELATIONAL_QUERIES  # noqa: E402

QUERIES.update(RELATIONAL_QUERIES)
ORACLE_SQL.update(RELATIONAL_ORACLE)

# The correctness driver hashes the FIRST 50 entries of queries() in dict
# order per round. ROUND-4 ROTATION (47 names <= 50, one window covers
# all): the 41 queries with no driver row after r1-r3 (each judge-gate
# green locally via tools/check.py), PLUS the 3 round-3 driver-reds
# (emb1_quantize / t4b_winnow_sketch / fe2_feature_hash), whose array<>
# output columns crashed the driver's pandas canonicalizer and are now
# CSV-serialized on both the Spark and oracle sides, PLUS the 3 NEW
# store-mutation witnesses (f22_upsert_patch / f23_expire_ttl /
# f24_erase_audit — upsert/expire_features/erase_entities previously had
# pytest coverage only). With r1+r2+r3+r4 every one of the declared
# queries then has a driver row.
# (History: rounds 1+2 witnessed 97 distinct queries; round 3 witnessed
# the 44 re-listed in git history at commit 8fe013f.)
_ROUND_PRIORITY = [
    "a17_covariance_matrix", "a18_cms_heavy_hitters", "a19_bottomk_sample",
    "a20_retention_cohorts", "card1_data_card", "dq5_ks_statistic",
    "dq6_leakage_audit", "dq7_lateness_profile", "dq9_expectations",
    "f18_asof_nearest", "f18b_asof_nearest_banded", "f20_scd2_dim_join",
    "f21_asof_forward", "fe3_vocab_encode", "fe4_robust_scale",
    "g3_triangle_count", "g3b_triangle_degree_ordered", "g4_kcore",
    "io10_zorder_layout", "io8_compaction", "j4_bloom_probe",
    "j5_salted_join", "mix1_domain_mixture", "pack2_rank_pairing",
    "r3_interval_left_join", "rag1_hybrid_search", "rag2_ndcg_eval",
    "rag3_mmr_rerank", "sd3_streaming_sessionize", "t10_pmi_collocations",
    "t11_dup_span_profile", "t9_ngram_counts", "ts3_seasonal_backtest",
    "ts4_rolling_anomaly", "x21_bpe_train", "x22_semdedup",
    "x23_bpe_encode", "x24_importance_score", "x25_containment_dedup",
    "x26_lsh_recall_eval", "x27_incremental_dedup",
    "emb1_quantize", "t4b_winnow_sketch", "fe2_feature_hash",
    "f22_upsert_patch", "f23_expire_ttl", "f24_erase_audit",
]
assert all(name in QUERIES for name in _ROUND_PRIORITY), sorted(
    set(_ROUND_PRIORITY) - set(QUERIES)
)
QUERIES = {name: QUERIES[name] for name in _ROUND_PRIORITY} | {
    name: fn for name, fn in QUERIES.items() if name not in set(_ROUND_PRIORITY)
}
