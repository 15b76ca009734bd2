"""Shuffle-volume audit: run every suite query at the target SF and read
the EXECUTED plan's SQL metrics — exchanges, shuffle bytes/records,
broadcast bytes, spill — straight from Spark's metric registry.

Wall-clock says how long a query took; this says WHY: how many exchanges
the final (post-AQE) plan ran, how many bytes actually crossed them, how
big the broadcasts were, and whether anything spilled. A query can look
fast at sf0.1 while shuffling its whole input — that's the 100 TB
failure mode this table makes visible (and the companion to SCALE.md's
growth ratios: shuffle bytes scale with the data factor, fixed overhead
does not).

Method notes:
  * metrics come from walking the executed plan after one collect();
    AdaptiveSparkPlan / QueryStage wrappers are descended so post-AQE
    reality is measured, not the static plan;
  * ReusedExchange is skipped (its bytes are counted once, at the
    original exchange);
  * scalar-subquery plans hang off expressions, not the main tree, so a
    handful of queries (q15/q17-style) under-report slightly — noted
    rather than fixed, since the subquery sides are the tiny aggregates
    by construction.

Usage: python tools/shuffle_audit.py [sf_dir]   (default /root/testdata/sf0.1)
Writes SHUFFLE.md.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ml_feature_store_spark.session import get_spark  # noqa: E402
from ml_feature_store_spark.suite import QUERIES  # noqa: E402

# Real Structured Streaming machinery measured elsewhere (bench exclusion
# note); its micro-batch plans would dominate the walk without saying
# anything about the batch engine.
SKIP = {"sd2_running_state_snapshot"}


def node_metrics(node) -> dict[str, int]:
    vals: dict[str, int] = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        vals[kv._1()] = kv._2().value()
    return vals


def walk(node, acc: dict[str, int]) -> None:
    name = node.nodeName()
    if name == "ReusedExchange":
        return
    m = node_metrics(node)
    if name == "Exchange":
        acc["exchanges"] += 1
        acc["shuffle_bytes"] += m.get("shuffleBytesWritten", 0)
        acc["shuffle_records"] += m.get("shuffleRecordsWritten", 0)
        acc["max_exchange_bytes"] = max(
            acc["max_exchange_bytes"], m.get("shuffleBytesWritten", 0)
        )
    elif name == "BroadcastExchange":
        acc["broadcasts"] += 1
        acc["broadcast_bytes"] += m.get("dataSize", 0)
    acc["spill_bytes"] += m.get("spillSize", 0)
    if name == "AdaptiveSparkPlan":
        walk(node.executedPlan(), acc)
        return
    if "QueryStage" in name:
        walk(node.plan(), acc)
        return
    for i in range(node.children().size()):
        walk(node.children().apply(i), acc)


def main() -> None:
    # --only name1,name2: audit just that subset and PRINT the markdown
    # rows (no SHUFFLE.md rewrite) — for appending one new op's row
    # without a full-suite sweep.
    argv = list(sys.argv[1:])
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    spark = get_spark("shuffle-audit")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, fn in QUERIES.items():
        if name in SKIP:
            continue
        if only is not None and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            df.collect()
            acc = {
                "exchanges": 0,
                "shuffle_bytes": 0,
                "shuffle_records": 0,
                "max_exchange_bytes": 0,
                "broadcasts": 0,
                "broadcast_bytes": 0,
                "spill_bytes": 0,
            }
            walk(df._jdf.queryExecution().executedPlan(), acc)
            rows.append((name, acc))
            print(
                f"{name}: {acc['exchanges']} exch, "
                f"{acc['shuffle_bytes'] / 1e6:.1f} MB shuffled, "
                f"{acc['broadcasts']} bcast, spill {acc['spill_bytes']}"
            )
        except Exception as exc:  # pragma: no cover - audit robustness
            rows.append((name, None))
            print(f"{name}: ERROR {exc}")

    if only is not None:
        for name, acc in rows:
            if acc is None:
                print(f"| {name} | ERROR | | | | | | |")
                continue
            print(
                f"| {name} | {acc['exchanges']} "
                f"| {acc['shuffle_bytes'] / 1e6:.2f} "
                f"| {acc['shuffle_records']} "
                f"| {acc['max_exchange_bytes'] / 1e6:.2f} "
                f"| {acc['broadcasts']} "
                f"| {acc['broadcast_bytes'] / 1e6:.2f} "
                f"| {acc['spill_bytes'] / 1e6:.2f} |"
            )
        return

    out = Path(__file__).resolve().parent.parent / "SHUFFLE.md"
    with out.open("w") as f:
        f.write(
            "# Shuffle-volume audit (post-AQE executed-plan metrics, "
            f"{sf_dir})\n\n"
            "Evidence for the shuffle-minimization claims in PLANS.md: "
            "exchanges the executed plan actually ran, bytes/records that "
            "crossed them, broadcast sizes, and spill. Generated by "
            "`python tools/shuffle_audit.py`.\n\n"
            "Reading guide: map-only operators show 0 exchanges; "
            "broadcast-join plans show bytes in the broadcast column "
            "instead of the shuffle column; `spill` nonzero anywhere "
            "means an executor-memory bound was crossed at this SF. "
            "Eagerly-checkpointed iteratives (bt1, and sd9's store read) "
            "under-report: localCheckpoint truncates lineage, so the "
            "walked plan is only the post-checkpoint tail — their "
            "per-round exchange shapes are documented in PLANS.md and "
            "bounded by the model-table size, not the corpus.\n\n"
            "| query | exchanges | shuffle MB | shuffle rows | "
            "max-exchange MB | broadcasts | broadcast MB | spill MB |\n"
            "|---|---|---|---|---|---|---|---|\n"
        )
        for name, acc in rows:
            if acc is None:
                f.write(f"| {name} | ERROR | | | | | | |\n")
                continue
            f.write(
                f"| {name} | {acc['exchanges']} "
                f"| {acc['shuffle_bytes'] / 1e6:.2f} "
                f"| {acc['shuffle_records']} "
                f"| {acc['max_exchange_bytes'] / 1e6:.2f} "
                f"| {acc['broadcasts']} "
                f"| {acc['broadcast_bytes'] / 1e6:.2f} "
                f"| {acc['spill_bytes'] / 1e6:.2f} |\n"
            )
        total_shuffle = sum(a["shuffle_bytes"] for _, a in rows if a)
        total_spill = sum(a["spill_bytes"] for _, a in rows if a)
        f.write(
            f"\nSuite totals: {total_shuffle / 1e6:.1f} MB shuffled across "
            f"{sum(a['exchanges'] for _, a in rows if a)} exchanges; "
            f"spill {total_spill / 1e6:.1f} MB.\n"
        )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
