"""Isolation pin: min-of-N wall-clock for named suite queries in a fresh
session at SPARK_GRAFT_SF_DIR, after the standard bench warmup (JVM scan
path + Python worker pool). This is the x26/io14 protocol the round
verdicts demand for any bench-creep watch cell: the bench's in-suite
number is vulnerable to cross-query contention (Python worker churn, GC),
so the pin is the number a regression claim must beat.

Usage: python tools/pin.py q1 [q2 ...] [--n 3] [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ml_feature_store_spark.session import get_spark  # noqa: E402
from ml_feature_store_spark.suite import QUERIES  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    spark = get_spark("pin")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["f6_pit_lookup"](spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(1000).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    out = {}
    for name in args.names:
        runs = []
        for _ in range(args.n):
            t0 = time.time()
            QUERIES[name](spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 3))
        out[name] = {"runs": runs, "pin": min(runs)}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
