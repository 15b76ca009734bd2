"""Text analysis, exact & near-dup dedup, tokenizer, sampling / mixing / packing and corpus-curation pipelines.

Split from suite.py (round 4); assembled by suite.py."""

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
    # CSV-serialize the sketch (the driver's pandas canonicalizer cannot
    # hash raw array<> cells) via cast + array_join — a transform(cast)
    # lambda would re-inline the sketch expression per element.
    return out.select(
        "doc_id",
        F.array_join(F.col("sketch").cast("array<string>"), ",").alias("sketch"),
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
    from .functions.vector import dot, l2_norm
    from .operators.similarity import ivf_assign

    emb = table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    # norm once per VECTOR before the self-join (r12 optimization — the
    # dedup_embedding_cosine pattern): a vector in p within-cell pairs
    # used to recompute its l2 norm p times inside the per-pair cosine;
    # dot/(na*nb) is the identical expression per pair, so every
    # comparison against 0.35 is bit-unchanged.
    assigned = ivf_assign(emb, cents).withColumn(
        "v", F.col("embedding").cast("array<double>")
    ).withColumn("nv", l2_norm(F.col("v")))
    a, b = assigned.alias("a"), assigned.alias("b")
    dropped = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(
            dot(F.col("a.v"), F.col("b.v"))
            / (F.col("a.nv") * F.col("b.nv"))
            >= 0.35
        )
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
    # r13 NOTE: fusing uni+bi into one (n, gram)-tagged scan was
    # MEASURED AND REJECTED (4.2 s -> 7.4 s unfused consumers / 5.0 s
    # with a checkpoint): ReuseExchange already dedups the uni aggregate
    # across its three consumers here, so the two-scan form does less
    # per-row work than the struct-tagged concat explode. The r12 note
    # ("uni's aggregate is exchange-reused") stands, now with numbers.
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




def q_x26_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-pipeline quality eval — x19's trust-but-verify applied to
    MinHash-LSH instead of ANN: for 50 md5-sampled probe docs, compute
    the EXACT ground truth (every corpus doc with 3-shingle Jaccard >=
    0.5 against the probe, via an inverted shingle index — see inline
    comment) and report how many of those true pairs the banded LSH
    candidate generation (x6, same portable md5-affine family) actually
    surfaced. Recall misses here mean real near-dups silently survive
    dedup — the number you check before trusting bands/hashes settings
    on 100 TB. Integer counts; recall defined 1e6 when no truth pairs
    exist."""
    from .operators.dedup import dedup_minhash_lsh
    from .operators.util import ensure_parallelism
    from .functions.text import shingles

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
    # EXACT ground truth via an inverted shingle index instead of the
    # probe x corpus brute-force scan: only documents SHARING >= 1
    # shingle with a probe can have Jaccard > 0, so the (probe-shingle
    # JOIN corpus-shingle) on the 16-byte shingle md5 materializes
    # exactly the overlapping pairs, and the 0.5 threshold becomes the
    # INTEGER test 3*common >= |A|+|B| (common/(|A|+|B|-common) >= 1/2).
    # Same answer as per-pair array intersection, but work scales with
    # shared-shingle volume, not |probes| x |corpus| — the shape that
    # survives a corpus 1000x this size.
    sh = ensure_parallelism(docs).select(
        "doc_id",
        F.explode(F.array_distinct(shingles(F.col("text"), 3))).alias("__s__"),
    ).select("doc_id", F.md5("__s__").alias("h"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    probe_sh = sh.join(
        F.broadcast(probes.withColumnRenamed("id_a", "doc_id")), "doc_id"
    ).select(F.col("doc_id").alias("id_a"), "h")
    common = (
        probe_sh.join(sh.select(F.col("doc_id").alias("id_b"), "h"), "h")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    truth = (
        common.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .filter(F.col("common") * 3 >= F.col("sz_a") + F.col("sz_b"))
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

# --------------------------------------------------------------------------- #
# round-3 fourth wave: vocab encode, rolling anomaly, k-core, MMR rerank
# --------------------------------------------------------------------------- #



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
    drops old×old buckets before the verify). This is the AD-HOC shape
    (one-shot, no stored state); at 100 TB use the persisted signature
    index instead — store.create_dedup_index signs the corpus once and
    dedup_batch resolves increments against the STORED buckets (x34/x35
    lanes), making each increment's cost proportional to the batch, not
    the corpus."""
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


def q_x34_dedup_index_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup THROUGH THE PERSISTED SIGNATURE INDEX —
    round-12's build-once-serve-many tier for the dedup family (r11
    verdict next-round #1; x27's "old signatures are precomputed once
    and stored" made executable): the corpus (doc_id % 4 != 0)
    registers as a feature table, create_dedup_index signs it ONCE
    under the frozen portable MinHash family (exact-hash + 16-component
    signature, versioned state table with a registry spec), and
    dedup_batch resolves the NEW batch (doc_id % 4 == 0) against the
    STORED artifact: exact semi join on the 16-byte hash, band buckets
    derived map-only from the stored signatures and equi-joined against
    the batch's buckets (new x old ONLY — the corpus never self-joins,
    and is never re-signed), candidate pairs Jaccard-verified at 0.5
    against the source text (candidate-bounded). Manifest per new doc:
    exact flag, bucket-candidate count, verified fuzzy count, best
    Jaccard (e6). At 100 TB each nightly increment costs O(batch) sign
    + one bucket join against ~200 B/doc of stored signatures — never
    O(corpus). Oracle: the x6/x27 portable-family machinery replayed
    over the same split (signatures are a pure per-doc function, so
    stored == recomputed bit-for-bit)."""
    from .store import FeatureStore

    docs = table(spark, sf_dir, "documents")
    feats = docs.select(
        F.col("doc_id").alias("entity_id"),
        F.lit("2024-01-01").cast("timestamp").alias("timestamp"),
        "text",
    )
    fs = FeatureStore(spark)
    fs.register("corpus", feats.filter(F.col("entity_id") % 4 != 0))
    fs.create_dedup_index("dd", "corpus", content_col="text")
    new = docs.filter(F.col("doc_id") % 4 == 0).select("doc_id", "text")
    return fs.dedup_batch(
        "dd", new, id_col="doc_id", content_col="text", threshold=0.5
    )


def q_x35_dedup_index_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O(delta) dedup-index maintenance — the artifact-level witness
    that incremental signing equals sign-everything: the index builds
    on the even half, the odd half arrives via append(), and
    refresh_dedup_index signs ONLY the delta against the FROZEN seeded
    family (the x27 cost model fixed: an increment costs the batch, not
    the corpus — the old signatures are read back, never recomputed).
    The lane emits the STORED signature table itself (exact hash + the
    4 band buckets re-derived map-only from the persisted minhash), so
    the oracle's from-scratch replay over ALL documents pins the
    incremental fold bit-for-bit — the strongest form of the
    h5/f35 associativity contract. A dedup_batch before the refresh
    REFUSES (stale index; pinned in pytest)."""
    from .store import FeatureStore

    docs = table(spark, sf_dir, "documents")
    feats = docs.select(
        F.col("doc_id").alias("entity_id"),
        F.lit("2024-01-01").cast("timestamp").alias("timestamp"),
        "text",
    )
    fs = FeatureStore(spark)
    fs.register("corpus", feats.filter(F.col("entity_id") % 2 == 0))
    fs.create_dedup_index("dd", "corpus", content_col="text")
    fs.append("corpus", feats.filter(F.col("entity_id") % 2 == 1))
    fs.refresh_dedup_index("dd")
    sig = fs.get_dedup_signatures("dd")

    def band(b: int):
        return F.md5(
            F.concat_ws(
                ",",
                *[F.element_at("minhash", b * 4 + i + 1) for i in range(4)],
            )
        )

    return sig.select(
        "doc_id", "hh", *[band(b).alias(f"b{b}") for b in range(4)]
    )


def q_pipe4_artifact_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation through PERSISTED artifacts (round-12) — pipe3's
    flagship composition re-run the way a production pipeline actually
    ships it: every model in the flow is a named, versioned registry
    artifact, not a notebook variable. One registered labeled corpus
    (even doc_ids) backs BOTH artifacts — `create_probe` trains the
    quality filter (integer-GD weights + provenance in the spec) and
    `create_dedup_index` signs the corpus once into the stored
    signature tier. The incoming batch (odd doc_ids) then flows
    through: (1) map-only probe scoring with the frozen weights as
    plan literals; (2) the stored-bucket dedup screen (exact-hash semi
    join + band-candidate verify — the corpus is never re-signed).
    Output: one admission manifest per incoming doc — quality score,
    probe verdict, exact/fuzzy dup flags, and the final keep decision
    (admit = predicted-quality AND no duplicate). Oracle: the
    parameterized GD replay welded to the portable MinHash machinery
    in one WITH block."""
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
    fs.create_dedup_index("dd", "labeled", content_col="text")
    new = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    scored = fs.score_with_probe("quality", new).select(
        "doc_id", "p", "pred"
    )
    manifest = fs.dedup_batch(
        "dd", new, id_col="doc_id", content_col="text", threshold=0.5
    ).select("doc_id", "is_exact_dup", "n_fuzzy")
    out = scored.join(manifest, "doc_id")
    keep = (
        (F.col("pred") == 1)
        & (F.col("is_exact_dup") == 0)
        & (F.col("n_fuzzy") == 0)
    )
    return out.select(
        "doc_id", "p", "pred", "is_exact_dup", "n_fuzzy",
        keep.cast("int").alias("keep"),
    )


def q_x41_dedup_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-index compaction (round-12): the odd half folds in as a
    delta-only state FRAGMENT (refresh I/O = O(delta) — the stored
    base is never re-read or re-written by the fold), then
    compact_dedup_index merges the chain into one signature-table
    version. The lane emits the stored signatures THROUGH the
    compacted state; x35's from-scratch oracle pins that the
    fragment-then-compact lifecycle is bit-identical to
    sign-everything — the maintenance job can never change what the
    index knows."""
    from .store import FeatureStore

    docs = table(spark, sf_dir, "documents")
    feats = docs.select(
        F.col("doc_id").alias("entity_id"),
        F.lit("2024-01-01").cast("timestamp").alias("timestamp"),
        "text",
    )
    fs = FeatureStore(spark)
    fs.register("corpus", feats.filter(F.col("entity_id") % 2 == 0))
    fs.create_dedup_index("dd", "corpus", content_col="text")
    fs.append("corpus", feats.filter(F.col("entity_id") % 2 == 1))
    fs.refresh_dedup_index("dd")
    assert fs.get_dedup_index_info("dd")["n_fragments"] == 2
    fs.compact_dedup_index("dd")
    assert fs.get_dedup_index_info("dd")["n_fragments"] == 1
    sig = fs.get_dedup_signatures("dd")

    def band(b: int):
        return F.md5(
            F.concat_ws(
                ",",
                *[F.element_at("minhash", b * 4 + i + 1) for i in range(4)],
            )
        )

    return sig.select(
        "doc_id", "hh", *[band(b).alias(f"b{b}") for b in range(4)]
    )


def q_x37_dedup_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAIR-LEVEL dedup through the stored signature index (round-12):
    dedup_matches emits one row per VERIFIED (new doc, stored doc) pair
    — the actionable form of x34's per-doc manifest (route each
    duplicate to its canonical survivor, write "near-dup of" provenance
    links, feed cluster assignment). Pairs come from the same stored-
    bucket candidate join (new x old only, corpus never re-signed),
    carry the exact shingle Jaccard (e6 int), and flag hash-equality
    exactness per pair. Same staleness/rewrite refusals as
    dedup_batch. Oracle: x34's portable-family pair machinery emitted
    at pair granularity with the hash-equality flag."""
    from .store import FeatureStore

    docs = table(spark, sf_dir, "documents")
    feats = docs.select(
        F.col("doc_id").alias("entity_id"),
        F.lit("2024-01-01").cast("timestamp").alias("timestamp"),
        "text",
    )
    fs = FeatureStore(spark)
    fs.register("corpus", feats.filter(F.col("entity_id") % 4 != 0))
    fs.create_dedup_index("dd", "corpus", content_col="text")
    new = docs.filter(F.col("doc_id") % 4 == 0).select("doc_id", "text")
    return fs.dedup_matches(
        "dd", new, id_col="doc_id", content_col="text", threshold=0.5
    )


def q_x39_dedup_simhash_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIMHASH flavor of the persisted dedup index (round-12 — the
    second signature method, making the dedup tier a method family
    like the vector tier): the stored artifact is ONE 60-bit portable
    SimHash + the exact hash per doc (~40 B/doc, 5x smaller than the
    minhash store — Google's crawl-dedup shape), candidates come from
    the ROTATED-BAND rule (four 15-bit sub-signatures; any two
    signatures within 3 flipped bits always share a band), and the
    verify stays exact shingle Jaccard so the manifest schema is
    method-independent. The trade vs minhash is candidacy calibration:
    hamming-correlated token votes collide more freely than
    Jaccard-tuned band curves (visible as larger n_candidates), which
    the verify absorbs. Same lifecycle rails: frozen family, O(delta)
    refresh bit-identical to sign-everything, staleness/rewrite
    refusals. Oracle: x9's portable per-bit vote machinery + the
    rotated-band join + the x34 manifest."""
    from .store import FeatureStore

    docs = table(spark, sf_dir, "documents")
    feats = docs.select(
        F.col("doc_id").alias("entity_id"),
        F.lit("2024-01-01").cast("timestamp").alias("timestamp"),
        "text",
    )
    fs = FeatureStore(spark)
    fs.register("corpus", feats.filter(F.col("entity_id") % 4 != 0))
    fs.create_dedup_index("dd", "corpus", content_col="text",
                          method="simhash")
    new = docs.filter(F.col("doc_id") % 4 == 0).select("doc_id", "text")
    return fs.dedup_batch(
        "dd", new, id_col="doc_id", content_col="text", threshold=0.5
    )


def _x40_cert(spark: SparkSession, sf_dir: str, method: str) -> DataFrame:
    """Recall certification of the persisted dedup index against EXACT
    ground truth — vidx6's role for the dedup tier (per-method lanes
    from day one, per the r11 verdict's vidx6 lesson). Ground truth is
    candidate-COMPLETE exact Jaccard: any cross pair with J > 0 shares
    at least one distinct shingle, so the truth arm enumerates pairs
    through a shared-shingle equi join (explode distinct shingles,
    new x old join on the shingle, |A∩B| = the join's group count,
    |A|,|B| from per-doc distinct counts) — never all-pairs, the x2
    blocked-exact shape, so the arm itself survives 100 TB. The found
    arm is dedup_matches through the STORED artifact (band-bucket
    candidates, exact verify), a strict subset of truth by
    construction (precision 1.0 — verify is the same exact Jaccard);
    recall_ppm quantifies what the banding scheme's candidacy curve
    gives up at threshold 0.5. One row: (method, n_true, n_found,
    recall_ppm)."""
    from .operators.dedup import shingles
    from .store import FeatureStore

    docs = table(spark, sf_dir, "documents")
    feats = docs.select(
        F.col("doc_id").alias("entity_id"),
        F.lit("2024-01-01").cast("timestamp").alias("timestamp"),
        "text",
    )
    fs = FeatureStore(spark)
    fs.register("corpus", feats.filter(F.col("entity_id") % 4 != 0))
    fs.create_dedup_index("dd", "corpus", content_col="text", method=method)
    new = docs.filter(F.col("doc_id") % 4 == 0).select("doc_id", "text")
    found = fs.dedup_matches(
        "dd", new, id_col="doc_id", content_col="text", threshold=0.5
    )
    n_found = found.agg(F.count(F.lit(1)).cast("long").alias("n_found"))

    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(F.col("text"), 3))).alias("s"),
    )
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        sh.filter(F.col("doc_id") % 4 == 0)
        .select(F.col("doc_id").alias("new_id"), "s")
        .join(
            sh.filter(F.col("doc_id") % 4 != 0).select(
                F.col("doc_id").alias("old_id"), "s"
            ),
            "s",
        )
        .groupBy("new_id", "old_id")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    truth = (
        inter.join(sz.withColumnRenamed("doc_id", "new_id").withColumnRenamed("sz", "sa"), "new_id")
        .join(sz.withColumnRenamed("doc_id", "old_id").withColumnRenamed("sz", "sb"), "old_id")
        .filter(
            F.col("i").cast("double")
            / (F.col("sa") + F.col("sb") - F.col("i"))
            >= 0.5
        )
    )
    n_true = truth.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    return n_true.crossJoin(n_found).select(
        F.lit(method).alias("method"),
        "n_true",
        "n_found",
        F.when(F.col("n_true") == 0, F.lit(1000000).cast("long"))
        .otherwise(
            F.floor(
                F.col("n_found") * F.lit(1000000.0) / F.col("n_true")
                + F.lit(0.5)
            ).cast("long")
        )
        .alias("recall_ppm"),
    )


def q_x40a_dedup_recall_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _x40_cert(spark, sf_dir, "minhash")


def q_x40b_dedup_recall_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _x40_cert(spark, sf_dir, "simhash")


q_x40a_dedup_recall_minhash.__doc__ = _x40_cert.__doc__
q_x40b_dedup_recall_simhash.__doc__ = _x40_cert.__doc__


_X36_BOILER = (
    "cookie notice please accept our cookies to continue "
    "reading this site uses cookies"
)


def q_x36_dedup_bucket_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOT-BUCKET CAP under boilerplate — the web-corpus failure mode
    (round-12): every 7th doc is an identical cookie banner, so ONE
    band bucket holds ~n/7 of the stored corpus and an uncapped probe
    join would generate |new boilerplate| x |old boilerplate|
    candidates (the quadratic arm SKEW.md measures). dedup_batch(
    max_bucket_size=8) drops stored buckets above the cap from
    candidate generation — one O(buckets) partial agg + a semi join —
    so boilerplate NEW docs come back with n_candidates=0/n_fuzzy=0
    while the EXACT arm (hash semi join, never capped) still flags
    them is_exact_dup=1: trivial duplicates stay caught, the candidate
    explosion does not happen, and genuine near-dups in normal-sized
    buckets verify exactly as in x34. The documented trade (capped
    recall on near-dups of boilerplate-dominated docs) is the standard
    MinHash-LSH production rule. Oracle: the portable family over the
    boilerplate-injected corpus with a HAVING-style bucket-size filter
    on the old side."""
    from .store import FeatureStore

    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.lit(_X36_BOILER))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    feats = docs.select(
        F.col("doc_id").alias("entity_id"),
        F.lit("2024-01-01").cast("timestamp").alias("timestamp"),
        "text",
    )
    fs = FeatureStore(spark)
    fs.register("corpus", feats.filter(F.col("entity_id") % 4 != 0))
    fs.create_dedup_index("dd", "corpus", content_col="text")
    new = docs.filter(F.col("doc_id") % 4 == 0)
    return fs.dedup_batch(
        "dd", new, id_col="doc_id", content_col="text",
        threshold=0.5, max_bucket_size=8,
    )
















def q_t12_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC canonicalization (operators/text.py normalize_nfc,
    Arrow-batched kernel) — the pre-dedup normalizer: decomposed
    sequences (e + U+0301) must compose to the same bytes as their
    precomposed twins or exact-hash dedup (x3) silently misses pairs.
    The corpus is ASCII, so each doc gets a decomposed probe suffix
    appended (' cafe'+U+0301+' A'+U+030A) — NFC must shrink exactly
    those 2 codepoints per doc and leave the ASCII body untouched,
    which the per-doc before/after codepoint lengths prove. DuckDB's
    built-in nfc_normalize is the cross-engine twin."""
    from .operators.text import normalize_nfc

    docs = table(spark, sf_dir, "documents").withColumn(
        "text", F.concat(F.col("text"), F.lit(" cafe\u0301 A\u030a"))
    )
    out = normalize_nfc(docs, text_col="text", out_col="text_nfc")
    return out.select(
        "doc_id",
        F.length("text").cast("long").alias("len_raw"),
        F.length("text_nfc").cast("long").alias("len_nfc"),
        (F.length("text") - F.length("text_nfc")).cast("long").alias("composed"),
    )




_T13_BOILER_HEAD = "join our mailing list today"
_T13_BOILER_TAIL = "unsubscribe link lives in this footer"


def q_t13_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-granular dedup (operators/dedup.py paragraph_dedup — the
    CCNet/RefinedWeb pre-step: web duplication is mostly boilerplate
    PARAGRAPHS repeated across otherwise-distinct documents, invisible to
    whole-doc hashing x3 and below the radar of doc-level MinHash x6).
    The corpus is synthetic token soup with no paragraph marks, so the
    witness (a) splits on the sentinel token ``' the '`` — a delimiter
    both engines split identically — and (b) wraps every doc in two fixed
    boilerplate paragraphs, so the operator must provably strip ~2
    paragraphs from every doc but the first-occurrence holder while also
    catching the corpus's natural segment collisions. Per-doc rollup:
    paragraphs seen, kept (globally-first), and kept-chars. Plan: map-only
    explode, min-struct first-occurrence agg on the sha-256 digest
    (partial agg absorbs the billion-doc hot boilerplate key), one
    AQE-skew-handled join back."""
    from .operators.dedup import paragraph_dedup

    docs = table(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.lit(_T13_BOILER_HEAD + " the "),
            F.col("text"),
            F.lit(" the " + _T13_BOILER_TAIL),
        ),
    )
    pars = paragraph_dedup(docs, id_col="doc_id", content_col="text", delim=" the ")
    return pars.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_pars"),
        F.sum(F.col("keep").cast("long")).cast("long").alias("n_kept"),
        F.sum(F.when(F.col("keep"), F.length("par")).otherwise(F.lit(0)))
        .cast("long")
        .alias("kept_chars"),
    )




def q_t14_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition via the built-in ``parse_url`` (HOST / PATH /
    QUERY-parameter extraction, JVM codegen) — web-corpus curation's
    workhorse: domain-level mixing weights, per-host dedup keys, and
    tracking-param stripping all start by splitting the URL. The corpus
    has no URL column, so each doc gets a deterministic one constructed
    from its own (source, lang, doc_id) — and the witness's point is
    that parse_url must INVERT that construction exactly (host back to
    the source-derived authority, path segments to lang/doc, the ?ref=
    param to doc_id mod 7, with the utm noise param ignored). Per-host
    rollup; the oracle re-derives the fields from the same raw columns,
    so any parse drift breaks the hash. Map-only + one partial-agg
    shuffle."""
    docs = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/"),
        F.col("lang"),
        F.lit("/doc-"),
        F.col("doc_id"),
        F.lit("?ref="),
        F.col("doc_id") % 7,
        F.lit("&utm=mail"),
    )
    u = docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("ref"))
        .cast("long")
        .alias("ref"),
    )
    return u.groupBy("host").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct(F.split(F.col("path"), "/").getItem(1))
        .cast("long")
        .alias("n_langs"),
        F.sum("ref").cast("long").alias("sum_ref"),
        F.min("path").alias("min_path"),
    )


def q_t15_aes_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic PII tokenization via ``aes_encrypt`` (CBC, FIXED
    IV) — the reversible complement of t7's destructive redaction: a
    synthetic email (user_id@domain) is encrypted into a stable token
    that (a) round-trips exactly through aes_decrypt, (b) is
    deterministic, so equal plaintexts yield equal tokens — the
    property that keeps GROUP BY/JOIN working on tokenized columns —
    and (c) never collides distinct plaintexts. Fixing the IV is the
    deliberate tradeoff: equal-plaintext leakage IS the joinability
    (format-preserving tokenization's contract); the
    confidentiality-grade mode (GCM, random IV, non-deterministic) is
    pinned by pytest as the contrast. All expressions are JVM codegen;
    the oracle computes the same counts from the plaintext — encrypted
    and plain lanes must agree on every group size."""
    ev = table(spark, sf_dir, "events")
    email = F.concat(
        F.lit("user"),
        F.col("user_id"),
        F.lit("@"),
        F.col("event_type"),
        F.lit(".example.org"),
    )
    tok = F.base64(F.expr(
        "aes_encrypt(concat('user', user_id, '@', event_type, "
        "'.example.org'), '0123456789abcdef', 'CBC', 'DEFAULT', "
        "unhex('00000000000000000000000000000000'))"
    ))
    back = F.expr(
        "CAST(aes_decrypt(unbase64(base64(aes_encrypt(concat('user', "
        "user_id, '@', event_type, '.example.org'), '0123456789abcdef', "
        "'CBC', 'DEFAULT', unhex('00000000000000000000000000000000')))), "
        "'0123456789abcdef', 'CBC') AS STRING)"
    )
    t = ev.select(
        "event_type",
        email.alias("email"),
        tok.alias("token"),
        back.alias("roundtrip"),
    )
    return t.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.countDistinct("token").cast("long").alias("n_tokens"),
        F.countDistinct("email").cast("long").alias("n_emails"),
        F.min(F.col("roundtrip") == F.col("email")).alias("roundtrip_ok"),
    )


def q_t16_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware string semantics (Spark 4 ``COLLATE UTF8_LCASE``)
    — case-insensitive equality as a COLUMN TYPE property instead of
    lower() scattered at every use site: grouping, DISTINCT and
    comparison all honor the collation natively (and keep codegen,
    unlike a UDF normalizer). The corpus is single-case, so each
    customer's segment is deterministically re-cased by key parity —
    under binary collation that doubles the group count; under
    UTF8_LCASE the witness must fold the variants back together.
    Output normalizes the representative via lower() because the
    collated GROUP BY legitimately surfaces WHICHEVER case variant it
    meets first (pinned in the docstring so nobody 'fixes' it); the
    oracle is the classic lower() spelling."""
    c = table(spark, sf_dir, "customer").withColumn(
        "seg_cased",
        F.when(
            F.col("c_custkey") % 2 == 0, F.lower(F.col("c_mktsegment"))
        ).otherwise(F.col("c_mktsegment")),
    )
    c.createOrReplaceTempView("t16_customer")
    return spark.sql(
        """
        SELECT lower(seg_collated) AS segment,
               CAST(COUNT(*) AS BIGINT) AS n_cust,
               CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations
        FROM (SELECT c_nationkey,
                     seg_cased COLLATE UTF8_LCASE AS seg_collated
              FROM t16_customer)
        GROUP BY seg_collated
        """
    )




def q_t18_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML main-content extraction (operators/text.py
    html_main_content — the trafilatura/readability step ahead of every
    quality/dedup pass in a web-corpus pipeline, round-7): each document
    is deterministically wrapped in full page chrome (head+style block,
    entity-bearing nav, h1 title, inline <b> markup around the word
    'table', an entity in the paragraph, unsubscribe footer), then the
    extractor must recover EXACTLY title + body text + unescaped
    entity — block drops, tag strip, entity unescape (after stripping,
    per HTML semantics), whitespace collapse. roundtrip_ok pins
    losslessness PER DOC against the independently-computed expected
    string; the oracle replays the identical wrap + regexp algebra in
    DuckDB. All four stages are JVM codegen regexp/replace — map-only,
    zero shuffles before the final projection, scan-speed at 100 TB."""
    from .operators.text import html_main_content

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    html = F.concat(
        F.lit("<html><head><title>d"),
        F.col("doc_id").cast("string"),
        F.lit("</title><style>p{margin:0}</style></head><body>"
              "<nav>home &amp; about | contact</nav><h1>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.replace(
            F.col("text"), F.lit(" table "), F.lit(" <b>table</b> ")
        ),
        F.lit(" &amp; more</p><footer>unsubscribe &copy; example</footer>"
              "</body></html>"),
    )
    expected = F.concat(
        F.lit("Doc "),
        F.col("doc_id").cast("string"),
        F.lit(" "),
        F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")),
        F.lit(" & more"),
    )
    extracted = html_main_content(html)
    return docs.select(
        "doc_id",
        F.length(extracted).cast("long").alias("n_chars"),
        F.size(F.split(extracted, " ")).cast("long").alias("n_tokens"),
        (extracted == expected).alias("roundtrip_ok"),
    )


def q_t17_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup — the step ahead of every web-corpus
    pipeline's per-URL dedup (CommonCrawl-style: the same logical page
    arrives as casing/port/tracking-param/fragment/param-order variants,
    and naive string dedup misses all of them). Each doc emits THREE raw
    variants of its t14-style URL (upper-cased scheme+host with an
    explicit :443, a utm_source-polluted form, an fbclid-polluted form
    with reversed param order); the canonicalizer must parse the RAW
    STRING back — strip the fragment, lowercase scheme+host only (paths
    stay case-sensitive), drop the default https port, remove utm_*/
    fbclid params, and byte-sort the survivors — collapsing 3N raw rows
    to N canonical URLs. Everything is built-in string/higher-order
    array functions (regexp_extract, filter, array_sort, concat_ws) —
    whole-stage codegen, no UDF; dedup is one partial-agg groupBy on the
    canonical string. The oracle replays the identical parse with
    DuckDB's list_filter/list_sort, so any drift in the canonical form
    breaks the hash."""
    docs = table(spark, sf_dir, "documents")
    path = F.concat(
        F.lit("/"), F.col("lang"), F.lit("/doc-"), F.col("doc_id")
    )
    host = F.concat(F.col("source"), F.lit(".example.org"))
    raw = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.array(
                F.concat(F.lit("HTTPS://"), F.upper(host), F.lit(":443"),
                         path, F.lit("?b=2&a=1#sec-3")),
                F.concat(F.lit("https://"), host, path,
                         F.lit("?a=1&utm_source=feed&b=2")),
                F.concat(F.lit("https://"), host, path,
                         F.lit("?b=2&a=1&fbclid=x"), F.col("doc_id")),
            )
        ).alias("url"),
    )
    no_frag = F.split(F.col("url"), "#").getItem(0)
    scheme_host = F.regexp_extract(no_frag, r"^([a-zA-Z]+://[^/?]*)", 1)
    path = F.regexp_extract(no_frag, r"^[a-zA-Z]+://[^/?]*([^?]*)", 1)
    query = F.regexp_extract(no_frag, r"\?(.*)$", 1)
    host_c = F.regexp_replace(F.lower(scheme_host), ":443$", "")
    # Single-evaluation form (the fe2 lesson: a second reference to the
    # filter/sort pipeline re-inlines it per row). concat_ws over the
    # empty array is ""; nullif turns that into NULL, concat propagates
    # the NULL past the "?" and coalesce restores "" — so the kept-params
    # pipeline appears exactly ONCE in the projection.
    joined_q = F.concat_ws(
        "&",
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: ~p.startswith("utm_") & ~p.startswith("fbclid="),
            )
        ),
    )
    canon = F.concat(
        host_c,
        path,
        F.coalesce(
            F.concat(F.lit("?"), F.nullif(joined_q, F.lit(""))), F.lit("")
        ),
    )
    per_url = (
        raw.select("source", canon.alias("canon_url"))
        .groupBy("source", "canon_url")
        .agg(F.count("*").cast("long").alias("n_raw"))
    )
    return per_url.groupBy("source").agg(
        F.sum("n_raw").cast("long").alias("n_raw"),
        F.count("*").cast("long").alias("n_canonical"),
        F.min("canon_url").alias("min_url"),
        F.max("canon_url").alias("max_url"),
    )


_X31_QUOTE = (
    "every model deserves clean data and clean data deserves careful "
    "review before any token reaches the loss"
)  # 17 tokens, outside the corpus vocabulary


def q_x31_crossdoc_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-span detection (operators/dedup.py
    cross_doc_spans — the k-gram re-expression of suffix-array exact-
    substring dedup, Lee et al.'s operation): spans repeated across
    documents are exactly maximal chains of k-grams each shared by >= 2
    docs. The token-soup corpus shares no natural 8-grams (30-word
    vocabulary, ~6e11 8-gram space), so every doc with doc_id % 5 == 0
    gets the same 17-token quote appended — the witness must report for
    exactly those docs exactly one span of exactly 17 tokens (10
    anchored grams) starting at the doc's own length, and nothing for
    anyone else; any off-by-one in gram slicing, island chaining or the
    span arithmetic shifts a column. Rolled up per doc; oracle replays
    gram/shared/island relationally on DuckDB list slices."""
    from .operators.dedup import cross_doc_spans

    docs = table(spark, sf_dir, "documents").withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.col("text"), F.lit(" " + _X31_QUOTE)),
        ).otherwise(F.col("text")),
    )
    spans = cross_doc_spans(docs, id_col="doc_id", content_col="text", k=8)
    return spans.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_spans"),
        F.max("span_len").cast("long").alias("max_span"),
        F.sum("span_len").cast("long").alias("covered_tokens"),
        F.min("span_start").cast("long").alias("first_start"),
        F.sum("n_grams").cast("long").alias("n_shared_grams"),
    )


QUERIES = {
    't18_html_extract': q_t18_html_extract,
    't6_explode_tokens': q_t6_explode_tokens,
    't13_paragraph_dedup': q_t13_paragraph_dedup,
    't14_url_parse': q_t14_url_parse,
    't15_aes_tokenize': q_t15_aes_tokenize,
    't16_collation': q_t16_collation,
    't17_url_canonicalize': q_t17_url_canonicalize,
    'x31_crossdoc_spans': q_x31_crossdoc_spans,
    't12_unicode_normalize': q_t12_unicode_normalize,
    'pipe1_clean_corpus': q_pipe1_clean_corpus,
    't3_token_count': q_t3_token_count,
    'x3_dedup_exact': q_x3_dedup_exact,
    'x4_text_stats': q_x4_text_stats,
    't1_lang_id': q_t1_lang_id,
    't2_quality_score': q_t2_quality_score,
    't4_fingerprint': q_t4_fingerprint,
    'x6_dedup_fuzzy': q_x6_dedup_fuzzy,
    'x6b_jaccard_verify': q_x6b_jaccard_verify,
    'x9_simhash': q_x9_simhash,
    't5_string_functions': q_t5_string_functions,
    'x15_dedup_components': q_x15_dedup_components,
    'c1_doc_chunk': q_c1_doc_chunk,
    't7_pii_redact': q_t7_pii_redact,
    't8_repetition': q_t8_repetition,
    'er1_entity_resolution': q_er1_entity_resolution,
    'pipe2_quality_dedup': q_pipe2_quality_dedup,
    'decon1_contamination': q_decon1_contamination,
    't4b_winnow_sketch': q_t4b_winnow_sketch,
    'x21_bpe_train': q_x21_bpe_train,
    'x22_semdedup': q_x22_semdedup,
    'x23_bpe_encode': q_x23_bpe_encode,
    't11_dup_span_profile': q_t11_dup_span_profile,
    'x25_containment_dedup': q_x25_containment_dedup,
    'x26_lsh_recall_eval': q_x26_lsh_recall_eval,
    't9_ngram_counts': q_t9_ngram_counts,
    't10_pmi_collocations': q_t10_pmi_collocations,
    'pipe3_curation_pipeline': q_pipe3_curation_pipeline,
    'x20_bpe_pair_counts': q_x20_bpe_pair_counts,
    'x27_incremental_dedup': q_x27_incremental_dedup,
    'x34_dedup_index_batch': q_x34_dedup_index_batch,
    'x35_dedup_index_refresh': q_x35_dedup_index_refresh,
    'x36_dedup_bucket_cap': q_x36_dedup_bucket_cap,
    'x37_dedup_match_pairs': q_x37_dedup_match_pairs,
    'x39_dedup_simhash_index': q_x39_dedup_simhash_index,
    'x40a_dedup_recall_minhash': q_x40a_dedup_recall_minhash,
    'x41_dedup_index_compact': q_x41_dedup_index_compact,
    'pipe4_artifact_curation': q_pipe4_artifact_curation,
    'x40b_dedup_recall_simhash': q_x40b_dedup_recall_simhash,
}

ORACLE_SQL: dict[str, str] = {
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
    "t3_token_count": """
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS INTEGER)
                   AS n_tokens,
               CAST(len(list_distinct(regexp_extract_all(text, '[A-Za-z0-9]+')))
                   AS INTEGER) AS n_distinct
        FROM documents
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

}

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

# x34: the stored signatures are a pure per-doc function of the frozen
# portable family, so the oracle replays x27's machinery over the %4
# split and adds the bucket-candidate count (distinct new x old pairs
# from the band-bucket join — exactly what dedup_batch's probe yields).
ORACLE_SQL["x34_dedup_index_batch"] = f"""
    WITH {_MH_CTES},
    h AS (SELECT doc_id, md5(lower(trim(text))) AS hh,
                 doc_id % 4 = 0 AS nw
          FROM documents),
    exacts AS (
        SELECT DISTINCT n.doc_id FROM h n
        WHERE n.nw AND n.hh IN (SELECT hh FROM h WHERE NOT nw)
    ),
    crossc AS (
        SELECT CASE WHEN id_a % 4 = 0 THEN id_a ELSE id_b END AS new_id,
               CASE WHEN id_a % 4 = 0 THEN id_b ELSE id_a END AS old_id
        FROM cand WHERE (id_a % 4 = 0) <> (id_b % 4 = 0)
    ),
    ncand AS (SELECT new_id, CAST(COUNT(*) AS BIGINT) AS n_candidates
              FROM crossc GROUP BY new_id),
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
           COALESCE(nc.n_candidates, 0) AS n_candidates,
           COALESCE(fz.n_fuzzy, 0) AS n_fuzzy,
           COALESCE(fz.best_j_e6, 0) AS best_j_e6
    FROM documents d
    LEFT JOIN exacts e ON e.doc_id = d.doc_id
    LEFT JOIN ncand nc ON nc.new_id = d.doc_id
    LEFT JOIN fz ON fz.new_id = d.doc_id
    WHERE d.doc_id % 4 = 0
"""

# x35: from-scratch replay of the whole signature store — per-doc exact
# hash + the 4 md5 band buckets over the portable family's mins; the
# Spark side folded the odd half incrementally, so value-hash equality
# IS the incremental == sign-everything proof.
_X35_BANDS = ", ".join(
    "md5("
    + "||','||".join(f"CAST(mh{b * 4 + i} AS VARCHAR)" for i in range(4))
    + f") AS b{b}"
    for b in range(4)
)
ORACLE_SQL["x35_dedup_index_refresh"] = f"""
    WITH {_MH_CTES}
    SELECT m.doc_id, md5(lower(trim(d.text))) AS hh, {_X35_BANDS}
    FROM m JOIN documents d ON d.doc_id = m.doc_id
"""

# x37: x34's pair machinery at pair granularity — verified cross pairs
# with the exact Jaccard and the per-pair hash-equality flag.
ORACLE_SQL["x37_dedup_match_pairs"] = f"""
    WITH {_MH_CTES},
    crossc AS (
        SELECT CASE WHEN id_a % 4 = 0 THEN id_a ELSE id_b END AS new_id,
               CASE WHEN id_a % 4 = 0 THEN id_b ELSE id_a END AS old_id
        FROM cand WHERE (id_a % 4 = 0) <> (id_b % 4 = 0)
    ),
    ds AS (SELECT doc_id, list_distinct(shs) AS d FROM sh),
    ver AS (
        SELECT c.new_id, c.old_id,
               CAST(floor(CAST(len(list_intersect(da.d, db.d)) AS DOUBLE)
                          / len(list_distinct(list_concat(da.d, db.d)))
                          * 1000000 + 0.5) AS BIGINT) AS j_e6
        FROM crossc c
        JOIN ds da ON da.doc_id = c.new_id
        JOIN ds db ON db.doc_id = c.old_id
        WHERE CAST(len(list_intersect(da.d, db.d)) AS DOUBLE)
              / len(list_distinct(list_concat(da.d, db.d))) >= 0.5
    ),
    h AS (SELECT doc_id, md5(lower(trim(text))) AS hh FROM documents)
    SELECT v.new_id AS doc_id, v.old_id, v.j_e6,
           CAST(CASE WHEN hn.hh = ho.hh THEN 1 ELSE 0 END AS BIGINT)
               AS is_exact
    FROM ver v
    JOIN h hn ON hn.doc_id = v.new_id
    JOIN h ho ON ho.doc_id = v.old_id
"""

# x39: simhash flavor — per-bit vote signatures (x9's _SH_* machinery),
# rotated 15-bit band buckets, cross-pair candidates, Jaccard verify.
ORACLE_SQL["x39_dedup_simhash_index"] = f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
               FROM documents),
    shx AS (
        SELECT doc_id,
               CASE WHEN len(tk) >= 3
                    THEN list_transform(generate_series(1, len(tk) - 2),
                         i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])
                    ELSE [array_to_string(tk, ' ')] END AS shs
        FROM t
    ),
    ds AS (SELECT doc_id, list_distinct(shs) AS d FROM shx),
    tok AS (SELECT doc_id, u.tok FROM t, LATERAL unnest(tk) AS u(tok)),
    hx AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
           FROM tok),
    mm AS (SELECT doc_id, COUNT(*) AS n, {_SH_ONES} FROM hx GROUP BY doc_id),
    ss AS (SELECT doc_id, CAST({_SH_SIG} AS BIGINT) AS simhash FROM mm),
    bd AS (
        SELECT doc_id, b.band,
               (simhash >> (b.band * 15)) & 32767 AS bucket
        FROM ss, LATERAL (SELECT unnest([0, 1, 2, 3]) AS band) b
    ),
    crossc AS (
        SELECT DISTINCT
               CASE WHEN a.doc_id % 4 = 0 THEN a.doc_id
                    ELSE b.doc_id END AS new_id,
               CASE WHEN a.doc_id % 4 = 0 THEN b.doc_id
                    ELSE a.doc_id END AS old_id
        FROM bd a
        JOIN bd b ON a.band = b.band AND a.bucket = b.bucket
                 AND a.doc_id < b.doc_id
        WHERE (a.doc_id % 4 = 0) <> (b.doc_id % 4 = 0)
    ),
    ncand AS (SELECT new_id, CAST(COUNT(*) AS BIGINT) AS n_candidates
              FROM crossc GROUP BY new_id),
    hh AS (SELECT doc_id, md5(lower(trim(text))) AS hh, doc_id % 4 = 0 AS nw
           FROM documents),
    exacts AS (
        SELECT DISTINCT n.doc_id FROM hh n
        WHERE n.nw AND n.hh IN (SELECT hh FROM hh WHERE NOT nw)
    ),
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
           COALESCE(nc.n_candidates, 0) AS n_candidates,
           COALESCE(fz.n_fuzzy, 0) AS n_fuzzy,
           COALESCE(fz.best_j_e6, 0) AS best_j_e6
    FROM documents d
    LEFT JOIN exacts e ON e.doc_id = d.doc_id
    LEFT JOIN ncand nc ON nc.new_id = d.doc_id
    LEFT JOIN fz ON fz.new_id = d.doc_id
    WHERE d.doc_id % 4 = 0
"""

# x36: the portable family over the boilerplate-injected corpus; the
# fuzzy arm honors the stored-side bucket cap (<= 8 old docs per band
# bucket), the exact arm never does. bd comes from _MH_CTES over docs2.
ORACLE_SQL["x36_dedup_bucket_cap"] = f"""
    WITH docs2 AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN '{_X36_BOILER}'
                    ELSE text END AS text
        FROM documents
    ),
    {_mh_ctes("docs2")},
    bsz AS (
        SELECT band, bucket, COUNT(*) AS bn
        FROM bd WHERE doc_id % 4 <> 0 GROUP BY band, bucket
    ),
    candc AS (
        SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
        FROM bd n
        JOIN bd o ON n.band = o.band AND n.bucket = o.bucket
        JOIN bsz s ON s.band = n.band AND s.bucket = n.bucket
        WHERE n.doc_id % 4 = 0 AND o.doc_id % 4 <> 0 AND s.bn <= 8
    ),
    ncand AS (SELECT new_id, CAST(COUNT(*) AS BIGINT) AS n_candidates
              FROM candc GROUP BY new_id),
    h AS (SELECT doc_id, md5(lower(trim(text))) AS hh,
                 doc_id % 4 = 0 AS nw
          FROM docs2),
    exacts AS (
        SELECT DISTINCT n.doc_id FROM h n
        WHERE n.nw AND n.hh IN (SELECT hh FROM h WHERE NOT nw)
    ),
    ds AS (SELECT doc_id, list_distinct(shs) AS d FROM sh),
    ver AS (
        SELECT c.new_id,
               CAST(floor(CAST(len(list_intersect(da.d, db.d)) AS DOUBLE)
                          / len(list_distinct(list_concat(da.d, db.d)))
                          * 1000000 + 0.5) AS BIGINT) AS j_e6
        FROM candc c
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
           COALESCE(nc.n_candidates, 0) AS n_candidates,
           COALESCE(fz.n_fuzzy, 0) AS n_fuzzy,
           COALESCE(fz.best_j_e6, 0) AS best_j_e6
    FROM documents d
    LEFT JOIN exacts e ON e.doc_id = d.doc_id
    LEFT JOIN ncand nc ON nc.new_id = d.doc_id
    LEFT JOIN fz ON fz.new_id = d.doc_id
    WHERE d.doc_id % 4 = 0
"""






ORACLE_SQL["t12_unicode_normalize"] = """
    WITH probed AS (
        SELECT doc_id,
               text || ' cafe' || chr(769) || ' A' || chr(778) AS text
        FROM documents
    )
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS len_raw,
           CAST(length(nfc_normalize(text)) AS BIGINT) AS len_nfc,
           CAST(length(text) - length(nfc_normalize(text)) AS BIGINT)
               AS composed
    FROM probed
"""

ORACLE_SQL["t13_paragraph_dedup"] = f"""
    WITH s AS (
        SELECT doc_id,
               string_split('{_T13_BOILER_HEAD}' || ' the ' || text ||
                            ' the ' || '{_T13_BOILER_TAIL}', ' the ') AS arr
        FROM documents
    ),
    pars AS (
        SELECT doc_id,
               generate_subscripts(arr, 1) AS pos,
               trim(unnest(arr)) AS par
        FROM s
    ),
    ranked AS (
        SELECT doc_id, par,
               row_number() OVER (PARTITION BY par ORDER BY doc_id, pos) AS rn
        FROM pars WHERE par <> ''
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_pars,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN rn = 1 THEN length(par) ELSE 0 END) AS BIGINT)
               AS kept_chars
    FROM ranked GROUP BY doc_id
"""

ORACLE_SQL["x31_crossdoc_spans"] = f"""
    WITH d AS (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0
                    THEN text || ' ' || '{_X31_QUOTE}'
                    ELSE text END AS text
        FROM documents
    ),
    t AS (SELECT doc_id, string_split(text, ' ') AS arr FROM d),
    grams AS (
        SELECT doc_id, gs - 1 AS pos,
               array_to_string(arr[gs:gs+7], ' ') AS gram
        FROM (SELECT doc_id, arr, generate_subscripts(arr, 1) AS gs FROM t)
        WHERE gs <= len(arr) - 7
    ),
    shared AS (
        SELECT gram FROM grams GROUP BY gram
        HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    hits AS (
        SELECT g.doc_id, g.pos,
               CASE WHEN lag(g.pos) OVER w IS NULL
                         OR g.pos - lag(g.pos) OVER w > 8
                    THEN 1 ELSE 0 END AS brk
        FROM grams g JOIN shared s ON g.gram = s.gram
        WINDOW w AS (PARTITION BY g.doc_id ORDER BY g.pos)
    ),
    isl AS (
        SELECT doc_id, pos,
               SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS UNBOUNDED PRECEDING) AS span
        FROM hits
    ),
    spans AS (
        SELECT doc_id, span, MIN(pos) AS span_start,
               MAX(pos) - MIN(pos) + 8 AS span_len,
               COUNT(*) AS n_grams
        FROM isl GROUP BY doc_id, span
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(MAX(span_len) AS BIGINT) AS max_span,
           CAST(SUM(span_len) AS BIGINT) AS covered_tokens,
           CAST(MIN(span_start) AS BIGINT) AS first_start,
           CAST(SUM(n_grams) AS BIGINT) AS n_shared_grams
    FROM spans GROUP BY doc_id
"""

ORACLE_SQL["t15_aes_tokenize"] = """
    WITH e AS (
        SELECT event_type,
               'user' || CAST(user_id AS VARCHAR) || '@' || event_type
                      || '.example.org' AS email
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT email) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT email) AS BIGINT) AS n_emails,
           TRUE AS roundtrip_ok
    FROM e GROUP BY event_type
"""

ORACLE_SQL["t16_collation"] = """
    WITH c AS (
        SELECT c_nationkey,
               CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                    ELSE c_mktsegment END AS seg_cased
        FROM customer
    )
    SELECT lower(seg_cased) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations
    FROM c GROUP BY lower(seg_cased)
"""


# t17: identical raw-URL construction and canonicalization replayed with
# DuckDB's list_filter / list_sort — any drift in the canonical form (case
# folding scope, port strip, tracking-param set, param order) flips the hash.
ORACLE_SQL["t17_url_canonicalize"] = """
    WITH raw AS (
        SELECT source, unnest([
            'HTTPS://' || upper(source || '.example.org') || ':443/' ||
                lang || '/doc-' || CAST(doc_id AS VARCHAR) || '?b=2&a=1#sec-3',
            'https://' || source || '.example.org/' || lang || '/doc-' ||
                CAST(doc_id AS VARCHAR) || '?a=1&utm_source=feed&b=2',
            'https://' || source || '.example.org/' || lang || '/doc-' ||
                CAST(doc_id AS VARCHAR) || '?b=2&a=1&fbclid=x' ||
                CAST(doc_id AS VARCHAR)
        ]) AS url
        FROM documents
    ),
    parsed AS (
        SELECT source, nf,
               list_sort(list_filter(
                   string_split(regexp_extract(nf, '\\?(.*)$', 1), '&'),
                   p -> NOT starts_with(p, 'utm_')
                        AND NOT starts_with(p, 'fbclid='))) AS kept
        FROM (SELECT source, string_split(url, '#')[1] AS nf FROM raw)
    ),
    canon AS (
        SELECT source,
               regexp_replace(lower(regexp_extract(nf,
                   '^([a-zA-Z]+://[^/?]*)', 1)), ':443$', '')
               || regexp_extract(nf, '^[a-zA-Z]+://[^/?]*([^?]*)', 1)
               || CASE WHEN len(kept) > 0
                       THEN '?' || array_to_string(kept, '&') ELSE '' END
                   AS canon_url
        FROM parsed
    ),
    per_url AS (
        SELECT source, canon_url, COUNT(*) AS n_raw
        FROM canon GROUP BY source, canon_url
    )
    SELECT source,
           CAST(SUM(n_raw) AS BIGINT) AS n_raw,
           CAST(COUNT(*) AS BIGINT) AS n_canonical,
           MIN(canon_url) AS min_url,
           MAX(canon_url) AS max_url
    FROM per_url
    GROUP BY source
"""

ORACLE_SQL["t14_url_parse"] = """
    SELECT source || '.example.org' AS host,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(SUM(doc_id % 7) AS BIGINT) AS sum_ref,
           MIN('/' || lang || '/doc-' || CAST(doc_id AS VARCHAR)) AS min_path
    FROM documents GROUP BY source
"""






# t18: identical wrap + extraction algebra replayed in DuckDB (RE2 also
# supports (?s) dotall and non-greedy); entities unescaped AFTER tag
# stripping on both engines. roundtrip_ok must be TRUE for every doc.
ORACLE_SQL["t18_html_extract"] = """
    WITH h AS (
        SELECT doc_id, text,
               '<html><head><title>d' || CAST(doc_id AS VARCHAR)
               || '</title><style>p{margin:0}</style></head><body>'
               || '<nav>home &amp; about | contact</nav><h1>Doc '
               || CAST(doc_id AS VARCHAR) || '</h1><p>'
               || replace(text, ' table ', ' <b>table</b> ')
               || ' &amp; more</p><footer>unsubscribe &copy; example'
               || '</footer></body></html>' AS html
        FROM documents
    ),
    x AS (
        SELECT doc_id, text,
               trim(regexp_replace(
                   replace(replace(replace(replace(replace(replace(
                       regexp_replace(
                           regexp_replace(regexp_replace(regexp_replace(
                           regexp_replace(regexp_replace(regexp_replace(
                               html,
                               '(?s)<head(\\s[^>]*)?>.*?</head\\s*>', ' ', 'g'),
                               '(?s)<nav(\\s[^>]*)?>.*?</nav\\s*>', ' ', 'g'),
                               '(?s)<aside(\\s[^>]*)?>.*?</aside\\s*>', ' ', 'g'),
                               '(?s)<footer(\\s[^>]*)?>.*?</footer\\s*>', ' ', 'g'),
                               '(?s)<script(\\s[^>]*)?>.*?</script\\s*>', ' ', 'g'),
                               '(?s)<style(\\s[^>]*)?>.*?</style\\s*>', ' ', 'g'),
                           '<[^>]+>', ' ', 'g'),
                       '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                       '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
                   '\\s+', ' ', 'g')) AS extracted
        FROM h
    )
    SELECT doc_id,
           CAST(length(extracted) AS BIGINT) AS n_chars,
           CAST(len(string_split(extracted, ' ')) AS BIGINT) AS n_tokens,
           extracted = ('Doc ' || CAST(doc_id AS VARCHAR) || ' '
                        || trim(regexp_replace(text, '\\s+', ' ', 'g'))
                        || ' & more') AS roundtrip_ok
    FROM x
"""


# x40: recall certification of the stored dedup index vs candidate-
# complete exact ground truth (shared-shingle equi join — any J>0 pair
# shares a distinct shingle, so the enumeration is exact without
# all-pairs). Found arm = the method's band-candidate chain + exact
# verify (x37/x39 machinery); truth arm shared across methods.
_X40_TRUTH = """
    e2 AS (SELECT doc_id, u.s FROM ds, LATERAL unnest(d) AS u(s)),
    it AS (SELECT n.doc_id AS new_id, o.doc_id AS old_id,
                  COUNT(*) AS i
           FROM e2 n JOIN e2 o ON n.s = o.s
           WHERE n.doc_id % 4 = 0 AND o.doc_id % 4 <> 0
           GROUP BY 1, 2),
    szs AS (SELECT doc_id, len(d) AS sz FROM ds),
    tv AS (SELECT COUNT(*) AS n_true FROM it
           JOIN szs a ON a.doc_id = it.new_id
           JOIN szs b ON b.doc_id = it.old_id
           WHERE CAST(i AS DOUBLE) / (a.sz + b.sz - i) >= 0.5)"""

_X40_FINAL = """
    SELECT '{method}' AS method,
           CAST(tv.n_true AS BIGINT) AS n_true,
           CAST(nf.n_found AS BIGINT) AS n_found,
           CAST(CASE WHEN tv.n_true = 0 THEN 1000000
                ELSE floor(nf.n_found * 1000000.0 / tv.n_true + 0.5)
                END AS BIGINT) AS recall_ppm
    FROM tv, nf"""

ORACLE_SQL["x40a_dedup_recall_minhash"] = f"""
    WITH {_MH_CTES},
    crossc AS (
        SELECT CASE WHEN id_a % 4 = 0 THEN id_a ELSE id_b END AS new_id,
               CASE WHEN id_a % 4 = 0 THEN id_b ELSE id_a END AS old_id
        FROM cand WHERE (id_a % 4 = 0) <> (id_b % 4 = 0)
    ),
    ds AS (SELECT doc_id, list_distinct(shs) AS d FROM sh),
    ver AS (
        SELECT c.new_id, c.old_id
        FROM crossc c
        JOIN ds da ON da.doc_id = c.new_id
        JOIN ds db ON db.doc_id = c.old_id
        WHERE CAST(len(list_intersect(da.d, db.d)) AS DOUBLE)
              / len(list_distinct(list_concat(da.d, db.d))) >= 0.5
    ),
    nf AS (SELECT COUNT(*) AS n_found FROM ver),
    {_X40_TRUTH}
    {_X40_FINAL.format(method="minhash")}
"""

ORACLE_SQL["x40b_dedup_recall_simhash"] = f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
               FROM documents),
    shx AS (
        SELECT doc_id,
               CASE WHEN len(tk) >= 3
                    THEN list_transform(generate_series(1, len(tk) - 2),
                         i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])
                    ELSE [array_to_string(tk, ' ')] END AS shs
        FROM t
    ),
    ds AS (SELECT doc_id, list_distinct(shs) AS d FROM shx),
    tok AS (SELECT doc_id, u.tok FROM t, LATERAL unnest(tk) AS u(tok)),
    hx AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
           FROM tok),
    mm AS (SELECT doc_id, COUNT(*) AS n, {_SH_ONES} FROM hx GROUP BY doc_id),
    ss AS (SELECT doc_id, CAST({_SH_SIG} AS BIGINT) AS simhash FROM mm),
    bd AS (
        SELECT doc_id, b.band,
               (simhash >> (b.band * 15)) & 32767 AS bucket
        FROM ss, LATERAL (SELECT unnest([0, 1, 2, 3]) AS band) b
    ),
    crossc AS (
        SELECT DISTINCT
               CASE WHEN a.doc_id % 4 = 0 THEN a.doc_id
                    ELSE b.doc_id END AS new_id,
               CASE WHEN a.doc_id % 4 = 0 THEN b.doc_id
                    ELSE a.doc_id END AS old_id
        FROM bd a
        JOIN bd b ON a.band = b.band AND a.bucket = b.bucket
                 AND a.doc_id < b.doc_id
        WHERE (a.doc_id % 4 = 0) <> (b.doc_id % 4 = 0)
    ),
    ver AS (
        SELECT c.new_id, c.old_id
        FROM crossc c
        JOIN ds da ON da.doc_id = c.new_id
        JOIN ds db ON db.doc_id = c.old_id
        WHERE CAST(len(list_intersect(da.d, db.d)) AS DOUBLE)
              / len(list_distinct(list_concat(da.d, db.d))) >= 0.5
    ),
    nf AS (SELECT COUNT(*) AS n_found FROM ver),
    {_X40_TRUTH}
    {_X40_FINAL.format(method="simhash")}
"""


# x41: dedup-index compaction is serving-invariant — the stored
# signature set after (fragmented refresh -> compact) equals the
# from-scratch replay, so x35's oracle pins it verbatim.
ORACLE_SQL["x41_dedup_index_compact"] = ORACLE_SQL["x35_dedup_index_refresh"]


# pipe4: the GD replay (train on evens) welded to the portable MinHash
# machinery — scores, exact/fuzzy dup screen and the keep decision in
# one WITH block over the odd half.
def _pipe4_sql() -> str:
    from .suite_feat import _cls1_sql

    cls_ctes, pfin, wname = _cls1_sql(
        train_where="doc_id % 2 = 0", return_parts=True
    )
    return f"""
    WITH {cls_ctes},
    {_MH_CTES},
    scores AS (
        SELECT f.doc_id, CAST({pfin} AS BIGINT) AS p,
               CASE WHEN {pfin} >= 500000 THEN 1 ELSE 0 END AS pred
        FROM feat f CROSS JOIN {wname}
        WHERE f.doc_id % 2 = 1
    ),
    crossc AS (
        SELECT CASE WHEN id_a % 2 = 1 THEN id_a ELSE id_b END AS new_id,
               CASE WHEN id_a % 2 = 1 THEN id_b ELSE id_a END AS old_id
        FROM cand WHERE (id_a % 2 = 1) <> (id_b % 2 = 1)
    ),
    ds AS (SELECT doc_id, list_distinct(shs) AS d FROM sh),
    ver AS (
        SELECT c.new_id
        FROM crossc c
        JOIN ds da ON da.doc_id = c.new_id
        JOIN ds db ON db.doc_id = c.old_id
        WHERE CAST(len(list_intersect(da.d, db.d)) AS DOUBLE)
              / len(list_distinct(list_concat(da.d, db.d))) >= 0.5
    ),
    fz AS (SELECT new_id, CAST(COUNT(*) AS BIGINT) AS n_fuzzy
           FROM ver GROUP BY new_id),
    hx2 AS (SELECT doc_id, md5(lower(trim(text))) AS hh, doc_id % 2 = 1 AS nw
            FROM documents),
    exacts AS (
        SELECT DISTINCT n.doc_id FROM hx2 n
        WHERE n.nw AND n.hh IN (SELECT hh FROM hx2 WHERE NOT nw)
    )
    SELECT s.doc_id, s.p, s.pred,
           CAST(CASE WHEN e.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
               AS is_exact_dup,
           COALESCE(fz.n_fuzzy, 0) AS n_fuzzy,
           CASE WHEN s.pred = 1 AND e.doc_id IS NULL
                 AND COALESCE(fz.n_fuzzy, 0) = 0
                THEN 1 ELSE 0 END AS keep
    FROM scores s
    LEFT JOIN exacts e ON e.doc_id = s.doc_id
    LEFT JOIN fz ON fz.new_id = s.doc_id
    """


ORACLE_SQL["pipe4_artifact_curation"] = _pipe4_sql()
