"""Head-to-head throughput: reference pandas engine vs this Spark engine.

Runs the reference FeatureStore (imported from /root/reference, unmodified)
and our engine on the SAME events data and the SAME training-set workload,
and prints one JSON line with both wall-clocks. The reference's
``get_training_set`` is a Python loop with a full-table mask per spine row
(O(|spine| x |table|)); ours is one distributed as-of join.

Usage: python tools/compare_reference.py [--sf /root/testdata/sf0.01]
                                         [--spine 1000]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, "/root/reference/src")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--spine", type=int, default=1000)
    args = ap.parse_args()

    con = duckdb.connect()
    pdf = con.execute(
        f"SELECT user_id AS entity_id, CAST(ts AS TIMESTAMP) AS timestamp, "
        f"event_type, value FROM '{args.sf}/events.parquet'"
    ).df()
    spine_pdf = (
        pdf[["entity_id", "timestamp"]]
        .sample(n=min(args.spine, len(pdf)), random_state=42)
        .reset_index(drop=True)
    )

    # ---- reference engine (pure pandas, unmodified import) ----------------
    from ml_feature_store import FeatureStore as RefStore

    ref = RefStore()
    t0 = time.time()
    ref.register("ev", pdf)
    ref_register_s = time.time() - t0
    t0 = time.time()
    ref_out = ref.get_training_set("ev", spine_pdf)
    ref_ts_s = time.time() - t0
    # PIT get: 50 sequential lookups (the online-ish read path)
    cutoff = pdf["timestamp"].quantile(0.9)
    ids = list(pdf["entity_id"].drop_duplicates().head(50))
    t0 = time.time()
    for _ in range(50):
        ref_get = ref.get("ev", ids, cutoff)
    ref_get_s = (time.time() - t0) / 50

    # ---- this engine ------------------------------------------------------
    from ml_feature_store_spark import FeatureStore
    from ml_feature_store_spark.session import get_spark

    spark = get_spark("compare", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    sdf = spark.createDataFrame(pdf)
    spine_sdf = spark.createDataFrame(spine_pdf)
    fs = FeatureStore(spark)
    t0 = time.time()
    fs.register("ev", sdf)
    spark_register_s = time.time() - t0
    t0 = time.time()
    spark_out = fs.get_training_set("ev", spine_sdf)
    n_spark = spark_out.count()
    spark_ts_s = time.time() - t0
    t0 = time.time()
    for _ in range(50):
        n_get = fs.get("ev", ids, cutoff.to_pydatetime()).count()
    spark_get_s = (time.time() - t0) / 50
    # serving path: one-row-per-entity online view (no history scan)
    fs.materialize_online("ev")
    for _ in range(3):  # warm
        fs.get_online("ev", ids).count()
    t0 = time.time()
    for _ in range(50):
        n_online = fs.get_online("ev", ids).count()
    spark_online_s = (time.time() - t0) / 50

    print(
        json.dumps(
            {
                "sf": args.sf,
                "table_rows": len(pdf),
                "spine_rows": len(spine_pdf),
                "reference": {
                    "register_s": round(ref_register_s, 3),
                    "training_set_s": round(ref_ts_s, 3),
                    "pit_get_s": round(ref_get_s, 4),
                    "rows": len(ref_out),
                    "get_rows": len(ref_get),
                },
                "spark": {
                    "register_s": round(spark_register_s, 3),
                    "training_set_s": round(spark_ts_s, 3),
                    "pit_get_s": round(spark_get_s, 4),
                    "online_get_s": round(spark_online_s, 4),
                    "rows": n_spark,
                    "get_rows": n_get,
                    "online_rows": n_online,
                },
                "speedup_training_set": round(ref_ts_s / max(spark_ts_s, 1e-9), 2),
                "speedup_pit_get": round(ref_get_s / max(spark_get_s, 1e-9), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
