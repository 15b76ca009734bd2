"""Benchmark harness: runs the suite's headline queries at SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full computation, no
driver-side collect bottleneck).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from ml_feature_store_spark.session import get_spark  # noqa: E402
from ml_feature_store_spark.suite import QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Correctness-only witnesses excluded from throughput timing: sd2 runs a
# REAL Structured Streaming query (two micro-batches through the state
# store) — its wall-clock measures stream machinery startup, not a query
# plan, and would add ~2 min of fixed cost per bench pass. Its oracle row
# still runs in every correctness round.
SKIP_TIMING = {"sd2_running_state_snapshot"}


def bench_online_point_read(spark) -> float:
    """The serving-path read, measured: get_online over a materialized
    latest-per-entity snapshot with a 5-entity IN-list. The claim this row
    backs (BASELINE.md): the read is FLAT in history length — it scans one
    row per entity, never history — so its cost is the Spark job floor
    plus |entities|, at any SF. Setup (register + materialize) is not
    timed; it is the once-per-publish cost, not the per-read cost."""
    import tempfile

    from ml_feature_store_spark.store import FeatureStore
    from ml_feature_store_spark.suite import events_features

    feats = events_features(spark, SF_DIR).drop("__row_id__")
    fs = FeatureStore(spark, storage_path=tempfile.mkdtemp(prefix="bench_online_"))
    fs.register("ev", feats)
    fs.materialize_online("ev")
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fs.get_online("ev", [0, 1, 2, 3, 4]).collect()
        best = min(best, time.time() - t0)
    return round(best, 3)


def sf_of(path: str) -> float:
    name = Path(path).name  # sf0.1
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/scan path once so per-query numbers measure the plan,
    # not first-touch class loading.
    QUERIES["f6_pit_lookup"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    # Warm the Python worker pool too: the first Arrow/pandas query would
    # otherwise pay the interpreter spawn for all cores.
    spark.range(1000).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    # Two passes per query, keep the min: a single pass is vulnerable to
    # JVM GC pauses late in the run (observed 2-3x outliers); the min
    # reflects the plan's actual cost. BOTH passes are recorded in the
    # detail file (r12 verdict item 8: drift vs noise must be decidable
    # from artifacts — the per-query noise floor is pass2 - pass1).
    timings: dict[str, float] = {}
    passes: dict[str, list[float]] = {}
    for _ in range(2):
        for name, fn in QUERIES.items():
            if name in SKIP_TIMING:
                continue
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            el = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, el), el)
            passes.setdefault(name, []).append(el)
    timings["online1_point_read"] = bench_online_point_read(spark)

    total = round(sum(timings.values()), 3)
    # Full per-query detail goes to a file; the driver's stdout capture keeps
    # only the last ~2000 chars, so the FINAL printed line must stay compact
    # (round-1 lesson: a ~4000-char JSON line was truncated mid-object and
    # recorded as parsed: null).
    # Prove the resolved parallelism to the driver (r12 verdict item 2:
    # the scaling contract reads $SPARK_GRAFT_CPUS via session.py, but
    # nothing in the output RECORDED the resolved master, so flat
    # low-core ratios were unfalsifiable from artifacts alone).
    master = spark.sparkContext.master
    parallelism = spark.sparkContext.defaultParallelism
    detail = {
        "metric": "suite_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "passes": passes,
        "master": master,
        "parallelism": parallelism,
        "sf": sf_of(SF_DIR),
    }
    with open(Path(__file__).resolve().parent / "BENCH_DETAIL.json", "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)

    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    summary = {
        "metric": "suite_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": slowest,
        "n_queries": len(timings),
        "sf": sf_of(SF_DIR),
        "master": master,
        "parallelism": parallelism,
        "detail": "BENCH_DETAIL.json",
    }
    line = json.dumps(summary)
    # Hard guarantee: stay far below the driver's 2000-char capture window.
    while len(line) > 1800 and summary["queries"]:
        summary["queries"].popitem()
        line = json.dumps(summary)
    print(line)


if __name__ == "__main__":
    main()
