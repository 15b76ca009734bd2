"""Hot-bucket probe for the persisted dedup index: what happens to
dedup_batch when boilerplate dominates the corpus — every Nth document
is the SAME cookie banner, so one band bucket holds a corpus-scale row
count and the batch-probe join generates |new boilerplate| x |old
boilerplate| candidate pairs (each then paying a shingle-Jaccard
verify). The measured mitigation is the standard MinHash-LSH production
rule: cap the stored bucket size (`dedup_batch(max_bucket_size=...)`) —
boilerplate EXACT duplicates stay caught by the hash arm (never capped),
only the quadratic near-dup arm is dropped.

Usage: python tools/dedup_skew_probe.py [replication]
Prints markdown rows for SKEW.md: per (replication, cap): candidate
pairs generated and dedup_batch wall-clock (min-of-2).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from ml_feature_store_spark.session import get_spark  # noqa: E402
from ml_feature_store_spark.store import FeatureStore  # noqa: E402
from ml_feature_store_spark.suite import table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
BOILER = (
    "cookie notice please accept our cookies to continue reading this "
    "site uses cookies and similar technologies to improve experience"
)


def build_corpus(spark, replication: int):
    docs = table(spark, SF_DIR, "documents").select("doc_id", "text")
    parts = []
    for i in range(replication):
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                "text",
            )
        )
    rep = parts[0]
    for p in parts[1:]:
        rep = rep.unionByName(p)
    # every 7th doc is the SAME banner — the hot bucket
    return rep.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.lit(BOILER))
        .otherwise(F.col("text"))
        .alias("text"),
    )


def run_arm(spark, corpus, cap):
    feats = corpus.select(
        F.col("doc_id").alias("entity_id"),
        F.lit("2024-01-01").cast("timestamp").alias("timestamp"),
        "text",
    )
    fs = FeatureStore(spark)
    fs.register("corpus", feats.filter("entity_id % 4 != 0"))
    fs.create_dedup_index("dd", "corpus")
    new = corpus.filter("doc_id % 4 = 0")
    best, pairs = None, None
    for _ in range(2):
        t0 = time.time()
        out = fs.dedup_batch(
            "dd", new, id_col="doc_id", content_col="text",
            threshold=0.5, max_bucket_size=cap,
        )
        pairs = out.agg(F.sum("n_candidates")).collect()[0][0]
        el = time.time() - t0
        best = el if best is None else min(best, el)
    return pairs, best


def main() -> None:
    replication = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("dedup-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus(spark, replication).cache()
    n = corpus.count()
    print(f"corpus: {n} docs ({replication}x sf0.1), every 7th = banner")
    print("| corpus | cap | candidate pairs | dedup_batch s (min-of-2) |")
    print("|---|---|---|---|")
    for cap in (None, 8):
        pairs, sec = run_arm(spark, corpus, cap)
        print(
            f"| {replication}x | {cap if cap else 'uncapped'} | "
            f"{pairs} | {sec:.2f} |"
        )


if __name__ == "__main__":
    main()
