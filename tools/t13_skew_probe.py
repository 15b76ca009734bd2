"""Hot-paragraph probe: measure paragraph_dedup's min-struct-aggregate
design against the naive window-partitioned-by-paragraph alternative
under the boilerplate-everywhere shape (ONE paragraph present in EVERY
document — the real distribution of web boilerplate, and the hot key
t13's docstring claims the aggregate absorbs).

Corpus: documents replicated N x with fresh doc_ids, every doc wrapped
in the SAME two boilerplate paragraphs (so each boilerplate string owns
~N*500 rows of the exploded paragraph table). The naive plan must sort
that entire population inside one window partition on one task; the
shipped plan partial-aggregates it map-side to one row per input
partition and AQE-splits the probe side of the join-back.

Usage: python tools/t13_skew_probe.py [REPLICAS]   (default 64)
Appends nothing; prints the numbers for SKEW.md.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from ml_feature_store_spark.operators.dedup import paragraph_dedup  # noqa: E402
from ml_feature_store_spark.session import get_spark  # noqa: E402
from ml_feature_store_spark.suite import table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
BOILER = "join our mailing list today the %s the unsubscribe link lives in this footer"


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    spark = get_spark("t13-skew")
    spark.sparkContext.setLogLevel("ERROR")
    docs = table(spark, SF_DIR, "documents").select("doc_id", "text")
    reps = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        for i in range(n)
    ]
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)
    big = big.withColumn(
        "text", F.format_string(BOILER, F.col("text"))
    ).localCheckpoint(eager=True)
    n_docs = big.count()
    print(f"{n_docs:,} docs; boilerplate head/tail on every one")

    timings: dict[str, float] = {}

    def run(name, df):
        for _ in range(2):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            el = round(time.time() - t0, 2)
            timings[name] = min(timings.get(name, el), el)

    run("agg_join (shipped)", paragraph_dedup(big, delim=" the "))

    pars = (
        big.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), " the ")).alias("pos", "par"),
        )
        .withColumn("par", F.trim("par"))
        .filter(F.col("par") != "")
    )
    w = Window.partitionBy("par").orderBy("doc_id", "pos")
    naive = pars.withColumn("keep", F.row_number().over(w) == 1)
    run("window_by_par (naive)", naive)

    for k, v in timings.items():
        print(f"{k}: {v:.2f}s")


if __name__ == "__main__":
    main()
