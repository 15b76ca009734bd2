"""Isolated per-query bench: time a comma-separated list of QUERIES
entries with the noop sink (bench.py's methodology) in ONE session and
print min/all-pass timings. The r13 measurement loop uses this for
before/after pairs so every claim is a same-session min-of-N pair
(r12 verdict item 8).

Usage: python tools/qbench.py name1,name2 [--n 3] [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ml_feature_store_spark.session import get_spark  # noqa: E402
from ml_feature_store_spark.suite import QUERIES  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark("qbench")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmups as bench.py
    QUERIES["f6_pit_lookup"](spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(1000).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    names = [n.strip() for n in args.names.split(",") if n.strip()]
    for name in names:
        fn = QUERIES[name]
        passes = []
        for _ in range(args.n):
            spark.sparkContext.setJobDescription(f"qbench:{name}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            passes.append(round(time.time() - t0, 3))
        print(f"{name}: min={min(passes):.3f} passes={passes}", flush=True)


if __name__ == "__main__":
    main()
