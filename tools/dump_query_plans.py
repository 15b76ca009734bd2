"""Dump .explain("formatted") for named QUERIES entries into
plans/<round>/<name>_<tag>.txt (the judge's plan-claim evidence).

Usage: python tools/dump_query_plans.py name1,name2 --tag before \
           [--round r13] [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from ml_feature_store_spark.session import get_spark  # noqa: E402
from ml_feature_store_spark.suite import QUERIES  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names")
    ap.add_argument("--tag", required=True)
    ap.add_argument("--round", dest="rnd", default="r13")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    out_dir = ROOT / "plans" / args.rnd
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in [n.strip() for n in args.names.split(",") if n.strip()]:
        df = QUERIES[name](spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"{name}_{args.tag}.txt"
        path.write_text(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)


if __name__ == "__main__":
    main()
