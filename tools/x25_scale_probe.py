"""Targeted exoneration probe for x25_containment_dedup's SCALE.md cell.

SCALE.md's default growth mode replicates documents VERBATIM (fresh
doc_ids, same text), which by construction turns every replica into a
genuine near-duplicate of its original — the LSH candidate-pair count
grows super-linearly because the DATA got more duplicative, not because
the plan degraded. This probe separates the two explanations by running
the same 8x growth in two modes:

* ``verbatim``  — SCALE.md's mode: replicas share text with originals.
  Candidate pairs (and thus containment-verify work) grow by
  construction: every original gains 7 new near-dup partners.
* ``perturbed`` — non-self-similar growth: every token of replica i is
  rewritten ``tok -> tok_ri`` so replicas share NO shingles with any
  other replica. The corpus is 8x bigger but no more duplicative; a
  healthy banded-LSH plan must grow ~linearly (candidates ~8x, time
  <= ~8x with fixed overheads amortizing to less).

Prints wall-clock (min-of-2) and the LSH candidate-pair count for base,
8x-verbatim and 8x-perturbed, so the growth attribution is measured, not
argued. Usage: python tools/x25_scale_probe.py [N]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from ml_feature_store_spark.operators.dedup import dedup_minhash_lsh  # noqa: E402
from ml_feature_store_spark.session import get_spark  # noqa: E402
from ml_feature_store_spark.suite import QUERIES, table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
KEY_OFFSET = 100_000_000


def build(spark, out_dir: str, n: int, mode: str) -> None:
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    parts = []
    for i in range(n):
        p = df.withColumn("doc_id", F.col("doc_id") + F.lit(i * KEY_OFFSET))
        if mode == "perturbed" and i > 0:
            toks = F.split(F.col("text"), " ")
            p = p.withColumn(
                "text",
                F.concat_ws(
                    " ", F.transform(toks, lambda t: F.concat(t, F.lit(f"_r{i}")))
                ),
            )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


def measure(spark, sf_dir: str) -> tuple[float, int]:
    el = float("inf")
    for _ in range(2):
        t0 = time.time()
        QUERIES["x25_containment_dedup"](spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        el = min(el, time.time() - t0)
    docs = table(spark, sf_dir, "documents")
    n_cand = dedup_minhash_lsh(
        docs, num_hashes=16, bands=4, hash_family="md5_affine"
    ).count()
    return round(el, 3), n_cand


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("x25-probe")
    spark.sparkContext.setLogLevel("ERROR")

    base_t, base_c = measure(spark, SF_DIR)
    print(f"base        : {base_t:.2f}s  candidates={base_c}")

    for mode in ("verbatim", "perturbed"):
        d = tempfile.mkdtemp(prefix=f"mlfs_x25_{mode}_")
        build(spark, d, n, mode)
        t, c = measure(spark, d)
        print(
            f"{n}x {mode:9s}: {t:.2f}s  candidates={c}  "
            f"time_ratio={t / base_t:.1f}x  cand_ratio={c / base_c:.1f}x"
        )
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
