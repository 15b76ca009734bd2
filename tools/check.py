"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and order-insensitive values. Usage:

    python tools/check.py [--sf /root/testdata/sf0.01] [--only name1,name2]
                          [--json CHECKFULL_r7.json]

``--json`` writes the per-query results as a committable round artifact
(round-6 verdict item 2: every round proves ALL queries locally, not
just the driver window's 50).
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def unhashable_cols(df):
    """Columns whose cells the DRIVER's canonicalizer cannot hash.

    The driver canonicalizes with pandas ``sort_values`` over every output
    column, which factorizes each column — list / ndarray / dict / set
    cells raise ``TypeError: unhashable type``. Declared queries must
    serialize such columns (e.g. ``concat_ws(",", ...)``); this gate makes
    the local check fail the same way the driver would (round-3 lesson:
    emb1_quantize / t4b_winnow_sketch / fe2_feature_hash passed locally
    via stringification but crashed the driver)."""
    import numpy as np

    bad = []
    for c in df.columns:
        for v in df[c].head(5):
            if isinstance(v, (list, tuple, dict, set, np.ndarray)):
                bad.append(c)
                break
    return bad


def normalize(df):
    """pandas frame -> canonical sorted list-of-tuples for comparison."""
    df = df.reindex(sorted(df.columns), axis=1)

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NULL"
            return f"{v:.6f}"
        return str(v)

    rows = [tuple(canon(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--json", default=None, help="write results JSON here")
    args = ap.parse_args()
    results: dict[str, dict] = {}

    import __spark_entry__ as entrymod
    from ml_feature_store_spark.session import get_spark

    spark = get_spark("check", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            results[name] = {"status": "fail", "err": f"spark: {str(e)[:300]}"}
            n_fail += 1
            continue
        if name not in oracles:
            ok = len(sdf) >= 0
            print(f"rows-only  {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            results[name] = {
                "status": "rows-only",
                "rows": len(sdf),
                "sec": round(time.time() - t0, 1),
            }
            n_rows_only += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            results[name] = {"status": "fail", "err": f"duckdb: {str(e)[:300]}"}
            n_fail += 1
            continue
        # per-field verdicts mirror the driver's CORRECTNESS_r{N} shape
        # (rows_match / schema_match / hash_match) so the committed
        # CHECKFULL artifact carries the same evidence (round-9 verdict
        # item 7). hash_match = order-insensitive canonical values equal;
        # it is only evaluated when rows+schema already line up (and is
        # False on driver-unhashable cells, which the driver would crash
        # on).
        problems = []
        bad = unhashable_cols(sdf)
        if bad:
            problems.append(
                f"driver-incompatible cells (unhashable array/list) in "
                f"spark cols {bad} — serialize with concat_ws/to_json"
            )
        rows_match = len(sdf) == len(odf)
        schema_match = sorted(sdf.columns) == sorted(odf.columns)
        hash_match = False
        if not rows_match:
            problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
        if not schema_match:
            problems.append(f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        if not problems:
            a, b = normalize(sdf), normalize(odf)
            hash_match = a == b
            if not hash_match:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, first diffs: {diff}")
        fields = {
            "rows_match": rows_match,
            "schema_match": schema_match,
            "hash_match": hash_match,
            "spark_rows": len(sdf),
            "oracle_rows": len(odf),
        }
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            results[name] = {
                "status": "fail",
                **fields,
                "err": "; ".join(problems)[:300],
            }
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            results[name] = {
                "status": "pass",
                **fields,
                "err": None,
                "sec": round(time.time() - t0, 1),
            }
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if args.json:
        import json

        Path(args.json).write_text(
            json.dumps(
                {
                    "sf": args.sf,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "n_rows_only": n_rows_only,
                    "queries": results,
                },
                indent=1,
            )
        )
        print(f"wrote {args.json}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
