"""Scaling evidence: replicate the sf0.1 facts Nx and measure how the
headline plans' wall-clock grows vs the data factor.

The claim to verify is not "fast at 600k rows" but "the PLAN keeps
working as data grows": scan-bound queries should grow ~linearly (or
less, if fixed overhead dominates), shuffle plans must not blow up
super-linearly, and nothing should fall over. Replication perturbs the
join keys per replica (orderkey/event_id offsets) so key cardinalities
grow with the data — each replica is new orders/events, not duplicate
keys — while entity counts (users) stay fixed, i.e. per-entity history
deepens, the realistic growth mode for a feature store.

Usage: python tools/scale_smoke.py [N]   (default 8)
Writes SCALE.md with the per-query table.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from ml_feature_store_spark.session import get_spark  # noqa: E402
from ml_feature_store_spark.suite import QUERIES  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
# fact tables replicated with key offsets; everything else copied 1x
REPLICATED = {
    "lineitem": ("l_orderkey",),
    "orders": ("o_orderkey",),
    "events": ("event_id",),
    "documents": ("doc_id",),
}
COPIED = ["region", "nation", "customer", "supplier", "part", "embeddings"]
BENCH_QUERIES = [
    "q1_pricing_summary",   # scan + partial agg
    "q6_forecast_revenue",  # pushed-filter scan, zero row shuffle
    "q3_shipping_priority", # broadcast + shuffle join + top-k
    "j2_join_shuffle",      # orders x lineitem shuffle join
    "f4_latest_per_entity", # per-entity argmax (map-side combine)
    "f7_asof_join",         # union-strategy as-of join
    "h2_value_histogram",   # bucketed agg
    "dq1_column_profile",   # one-scan multi-distinct profiler
    "r2_interval_join",     # time-band self join on events
    "q12_late_priority",    # equi join + inequality residual + CASE agg
    "a12_quantile_hist",    # mergeable histogram quantiles (bounded shuffle)
    "t8_repetition",        # map-only per-doc gram fold
    "c1_doc_chunk",         # map-only chunk explode
    "f14_multi_view_training_set",  # two union as-of joins + spine stitch
    "pipe2_quality_dedup",  # LSH -> verify -> CC -> keep-best (replicas ARE near-dups)
    "decon1_contamination", # broadcast banlist grows with the benchmark slice
    "g2_pagerank",          # 2 shuffles/iter over an 8x edge list
    "shuf1_training_shards",  # hash-permutation window over 8x docs
    "b1_bucketed_join",     # bucketed write (8x data) + zero-exchange join
    "f15_decayed_features",  # band join + integer decay-table aggregation
    "f15b_decayed_bucketed",  # same, shuffled on (user, time-bucket)
    "f16_label_window",     # forward-window label band join
    "f16b_label_window_frames",  # same semantics, join-free range frame
    "g2b_pagerank_dangling",  # pagerank + per-iter dangling-mass scalar
    "s3_bm25_search",       # explode + broadcast postings + top-k
    "x18_negative_sampling",  # hash draws + anti-join on the pair key
    "x20_bpe_pair_counts",  # adjacent-pair zip + partial-agg count
    "pipe3_curation_pipeline",  # 5-stage curation composite
    "fe1_target_encoding",  # broadcast category stats, fact never shuffled
    "t9_ngram_counts",      # shingle explode + partial-agg count (8x docs)
    "t10_pmi_collocations",  # two count tables + broadcast joins
    "g3_triangle_count",    # wedge join over the 8x co-purchase graph
    "a17_covariance_matrix",  # 45-aggregate single pass, no row shuffle
    "dq5_ks_statistic",     # quantized-support cumulative window
    "x21_bpe_train",        # 3 count+argmax+merge rounds over 8x docs
    "x23_bpe_encode",       # train + corpus-wide merge folds over 8x docs
    "a18_cms_heavy_hitters",  # 192-cell sketch build over 8x events
    "dq6_leakage_audit",    # per-user max dim + key join over 8x events
    "mix1_domain_mixture",  # rate dim broadcast + map-side thinning
    "x24_importance_score",  # 64-bucket weight dim + token-stream rollup
    "t11_dup_span_profile",  # shingle md5 multiplicity (replicas share spans)
    "g3b_triangle_degree_ordered",  # degree-ordered wedge join, 8x graph
    "r3_interval_left_join",  # left-outer band join (null lane adds no work)
    "f18_asof_nearest",     # double-window nearest as-of, join-free
    "f20_scd2_dim_join",    # interval-dim band join over 8x events
    "x25_containment_dedup",  # LSH candidates + containment verify
    "a19_bottomk_sample",   # salted two-phase per-key bottom-k
    "f18b_asof_nearest_banded",  # 3-bucket banded nearest + min_by argmin
    "f21_asof_forward",     # forward as-of, join-free
    "x26_lsh_recall_eval",  # probe ground truth x corpus + LSH recall
    "pack2_rank_pairing",   # per-shard rank pairing windows
    "ts3_seasonal_backtest",  # daily rollup + lag frames
    "a20_retention_cohorts",  # first-week argmin + distinct activity join
    "fe3_vocab_encode",     # token counts + broadcast-vocab encode over 8x docs
    "ts4_rolling_anomaly",  # daily rollup + prior-7-row integer z-score
    "g4_kcore",             # 3 peel rounds over the 8x purchase graph
    "j4_bloom_probe",       # broadcast bit-set probe over 8x orders
    "x27_incremental_dedup",  # cross-corpus LSH + verify (8x docs)
    "card1_data_card",      # one-pass per-lang corpus rollup
    "j5_salted_join",       # salted shuffle join over 8x events
    "fe4_robust_scale",     # two grouped-percentile passes + broadcasts
    "io10_zorder_layout",   # z-order write + 2-D pruned read (8x events)
    "dq9_expectations",     # rule-suite single-pass aggregates per table
    "mix2_temperature_mixture",  # isqrt-weight rate dim + map-side thinning
    "lm1_bigram_doc_score",  # bigram-LM count tables + per-doc rollup (8x docs)
    "g5_copurchase_jaccard",  # basket-bounded pair join over 8x baskets
    "geo1_radius_join",     # 9-cell broadcast spatial join (points 1x: dims copied)
    "sd4_stream_dedup",     # streaming dedup over the 8x event feed
    "g6_random_walks",      # 3-hop walks over the 8x purchase graph
    "emb2_matryoshka_recall",  # sliced-cosine recall arms (embeddings 1x: dims copied)
    "io11_binary_ingest",   # binaryFile listing+read (bounded 20-file witness)
    "io12_gzip_roundtrip",  # unsplittable-gzip CSV roundtrip over 8x events
    "s4_tablesample",       # native Bernoulli sampler over 8x lineitem
    "udtf1_token_runs",     # mapInArrow run-length generator over 8x docs
    "t12_unicode_normalize",  # Arrow NFC kernel over 8x docs
    "fe6_global_row_number",  # two-pass global numbering over 8x orders
    "fe7_quantile_binning",  # percentile boundary dim + broadcast binning (8x orders)
    "fe8_impute_median",    # median dim broadcast + map-side fill over 8x events
    "x29_weighted_sample",  # map-only priorities + top-k over 8x docs
    "x28_from_json_typed",  # codegen from_json + corrupt lane over 8x events
    "x30_variant_extract",  # parse-once VARIANT extraction over 8x events
    "j6_nullsafe_join",     # null-safe broadcast dim lookup (customer 1x)
    "a21_regr_family",      # one-pass OLS moments over 8x lineitem
    "dq11_observed_metrics",  # observe() piggyback pass over 8x events
    "io15_xml_roundtrip",   # XML write+read roundtrip over 8x events
    "q23_lateral_topn",     # decorrelated lateral top-N (customer 1x)
    "sd6_state_store_reader",  # streaming agg into checkpoint + state read (8x events)
    "g7_bfs_distances",     # level-sync BFS over the 8x purchase graph
    "sd7_file_sink_exactly_once",  # exactly-once file sink over 8x events
    "f26_snapshot_manifest",  # pinned-version multi-view (2 registers + as-of joins)
    "f27_multi_view_left",  # LEFT multi-view as-of stitch over 8x events/orders
    "sd8_stream_static_enrich",  # per-micro-batch broadcast dim join, 8x feed
    "f28_online_offline_consistency",  # snapshot vs as-of lane audit, 8x events
    "t17_url_canonicalize",  # map-only parse + canonical-key agg over 8x docs
    "sd9_foreach_batch_upsert",  # two-micro-batch store fold over 8x events
    "bt1_preference_strengths",  # matchup agg + fixed MM rounds, 8x lineitem
    "q29_group_order_all",  # GROUP BY ALL scan aggregate over 8x lineitem
    "f29_training_freshness",  # as-of age profile over 8x events
    "lab1_majority_vote",  # one user-keyed window shuffle over 8x events
    "f30_entity_merge",  # broadcast alias rewrite + copy-on-write version, 8x events
    "sd10_incremental_backfill",  # two availableNow runs, checkpoint-priced increment
    "io19_bucket_pruning",  # bucketed write + 1-of-8 pruned point read, 8x events
    "f31_timestamp_travel",  # wall-clock version resolution, metadata-only
    "f32_composite_key_training_set",  # struct-key register + as-of, 8x events
    "odfv1_derived_view",  # two as-of argmaxes + derived projection, 8x events
    "odfv2_request_data",  # PIT argmax + request-column stitch, 8x events
    "odfv3_online_derived",  # online snapshot join + derived projection, 8x events
    "sd11_composite_stream_snapshot",  # composite streaming snapshot fold, 8x events
    "fsvc1_feature_service",  # service-projected multi-view as-of, 8x events
    "f33_ingest_contract",  # contract agg pass + register + PIT get, 8x events
    "f34_view_ttl",  # TTL-defaulted as-of tolerance (one post-argmax filter), 8x events
    "fsvc2_online_service",  # online service: snapshot argmaxes + equi join, 8x events
    "f35_incremental_online",  # snapshot+delta fold, O(entities + delta), 8x events
    "fsvc3_service_with_odfv",  # service + ODFV in one multi-view build, 8x events
    "f36_vector_features",  # array payloads through register/push/online fold
    "sd12_python_stream_source",  # fixed synthetic stream; axis = options, not sf
    "f37_export_online",  # online snapshot scan -> two-phase sink, 8x events
    "f38_saved_dataset",  # materialized training set + frozen read-back, 8x events
    "drift1_psi_value",  # two partial-agg scans -> <=10-bin PSI report, 8x events
    "drift2_event_mix",  # two partial-agg scans -> per-category TVD report, 8x events
    "f39_embargo_training_set",  # embargoed as-of build (f7's plan + interval shift), 8x events
    "f40_schema_widening",  # widening append: null-backfill projection + version write, 8x events
    "h4_tiered_retention",  # three disjoint-slice rollup tiers unioned, 8x events
    "q30_identifier_clause",  # parser-bound identifiers, plain pushed agg, 8x orders
    "sd5_stream_stream_join",  # watermarked two-stream band join over the 8x feed
    "sd14_stream_drift_monitor",  # windowed mix state + broadcast reference, 8x feed
    "fe9_woe_encoding",  # one conditional-count scan -> O(categories) WOE/IV, 8x orders
    "sd15_stream_pit_enrich",  # per-micro-batch as-of join vs static features, 8x feed
    "q31_sql_scripting",  # scalar REPEAT probes (pushed aggs) + final report, 8x orders
    "q32_sql_udf",  # analyzer-inlined SQL UDFs/TVF, plain pushed agg, 8x lineitem
    "f41_output_mapping",  # service build + final rename projection, 8x events
    "sd16_stream_quarantine",  # map-side check split + dual sinks per batch, 8x feed
    "f42_window_view",  # spine ∪ source RANGE frames, one entity shuffle, 8x events
    "cv1_purged_walkforward",  # O(k) fold explode + partial-agg rollup, 8x events
    "f44_serving_log",  # online serve + |entities|-row log appends, 8x events
    "x33_filtered_ann",  # broadcast queries + filtered candidate scan (emb 1x)
    "dq14_version_profile",  # one-pass tagged-union profile over 8x events
    "f45_join_key_map",  # renamed-spine as-of build over 8x events
    "dq15_fk_contract",  # one-job FK probe (distinct dims) + register, 8x events
    "q33_sql_pivot",  # conditional-agg pivot + unpivot roundtrip, 8x lineitem
    "dq16_unique_contract",  # one-agg PK gate + register + PIT, 8x events
    "g8_cc_largestar",  # star-contraction CC over the 8x co-purchase graph
    "f46_compare_services",  # two snapshot argmaxes + full-outer diff, 8x events
    "h5_rollup_distinct",  # sketch-state rollup build + O(delta) refresh, 8x events
    "f47_bitemporal",  # dual-time-predicate as-of build, 8x events
    "sd17_stream_distinct",  # windowed HLL++ distinct state over the 8x feed
    "vidx1_ivf_index_knn",  # persisted IVF build + probe-pruned knn (emb 1x)
    "vidx2_pq_index_knn",  # persisted PQ codebooks + stored-code ADC (emb 1x)
    "vidx3_index_refresh",  # frozen-model O(delta) index refresh (emb 1x)
    "vidx4_lsh_index_knn",  # stored-hyperplane buckets + probe knn (emb 1x)
    "vidx5_index_batch_knn",  # exploded-probe cell equi join, per-query top-k (emb 1x)
    "sd18_stream_index_enrich",  # per-micro-batch knn through the stored index (emb 1x)
    "vidx6a_recall_ivf",  # stored-IVF recall vs exact arm (emb 1x)
    "vidx6b_recall_pq",  # stored-PQ recall vs exact arm (emb 1x)
    "vidx6c_recall_lsh",  # stored-LSH recall vs exact arm (emb 1x)
    "vidx6d_recall_ivfpq",  # stored-IVFPQ recall vs exact arm (emb 1x)
    "vidx6e_recall_sq",  # stored-SQ recall vs exact arm (emb 1x)
    "vidx7_pq_batch_knn",  # broadcast ADC dtab dim x codes scan, per-query top-k (emb 1x)
    "vidx8_ivfpq_index_knn",  # residual-PQ build + probe + cell-specific ADC (emb 1x)
    "vidx9_ivfpq_batch_knn",  # per-query probes + residual dtabs, cell equi join (emb 1x)
    "sd19_stream_index_autorefresh",  # stale probe + O(delta) refresh per micro-batch (emb 1x)
    "vidx10_reencode_after_rewrite",  # frozen-model full re-encode after upsert (emb 1x)
    "vidx11_pq_refine_knn",  # ADC shortlist + exact re-rank semi join (emb 1x)
    "vidx12_sq_index_knn",  # per-dim min/max levels + exhaustive int-L2 (emb 1x)
    "vidx13_drift_signal",  # occupancy-key partial agg + O(n_cells) PSI (emb 1x)
    "ts5_changepoint",  # daily rollup + division-free CUSUM windows, 8x events
    "dq17_k_anonymity",  # QI partial-agg groupBy + O(groups) fold, 8x events
    "x34_dedup_index_batch",  # stored-signature bucket join, new x old only (docs 8x)
    "x35_dedup_index_refresh",  # O(delta) signature fold + map-only banding (docs 8x)
    "x36_dedup_bucket_cap",  # hot-bucket capped probe join under boilerplate (docs 8x)
    "x37_dedup_match_pairs",  # pair-level stored-bucket dedup output (docs 8x)
    "x38_semdedup_index",  # cosine-threshold screening through the stored index (emb 1x)
    "sd20_stream_dedup_index",  # per-micro-batch manifest through the stored signatures (docs 8x)
    "x39_dedup_simhash_index",  # 60-bit rotated-band simhash index serve (docs 8x)
]
KEY_OFFSET = 100_000_000


def replicate(spark, out_dir: str, n: int) -> None:
    for t in COPIED:
        shutil.copy(f"{SF_DIR}/{t}.parquet", f"{out_dir}/{t}.parquet")
    for t, keys in REPLICATED.items():
        df = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        parts = []
        for i in range(n):
            p = df
            for k in keys:
                p = p.withColumn(k, F.col(k) + F.lit(i * KEY_OFFSET))
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for _ in range(2):  # min of two passes (GC-outlier protection)
        for name in BENCH_QUERIES:
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            el = round(time.time() - t0, 3)
            out[name] = min(out.get(name, el), el)
    return out


def main() -> None:
    # --only name1,name2: time just that subset at both scales and PRINT
    # the markdown rows (for appending to SCALE.md) instead of rewriting
    # the whole file — new queries get rows without a 70-query rerun.
    only = None
    argv = list(sys.argv[1:])
    if "--only" in argv:
        i = argv.index("--only")
        only = argv[i + 1].split(",")
        del argv[i : i + 2]
    n = int(argv[0]) if argv else 8
    global BENCH_QUERIES
    if only:
        missing = sorted(set(only) - set(QUERIES))
        assert not missing, missing
        BENCH_QUERIES = only
    spark = get_spark("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    big_dir = tempfile.mkdtemp(prefix="mlfs_scale_")
    print(f"replicating facts {n}x into {big_dir} ...")
    replicate(spark, big_dir, n)

    base = time_queries(spark, SF_DIR)
    big = time_queries(spark, big_dir)
    if only:
        for name in BENCH_QUERIES:
            r = big[name] / base[name] if base[name] > 0 else float("nan")
            print(f"| {name} | {base[name]:.2f} | {big[name]:.2f} | {r:.1f}x |")
        shutil.rmtree(big_dir, ignore_errors=True)
        return

    lines = [
        "# SCALE — measured growth of the headline plans",
        "",
        f"Facts (lineitem/orders/events) replicated **{n}x** with per-replica",
        "key offsets (new orders/events, same users: per-entity history",
        f"deepens). Wall-clock min-of-2 on local[32]. A plan that survives {n}x",
        "with ratio <= ~Nx is growing at or below linear — the property that",
        "matters at 100 TB (fixed overheads amortize away; what must NOT",
        "appear is super-linear growth from a join explosion or skew).",
        "",
        f"| query | sf0.1 (s) | {n}x (s) | ratio |",
        "|---|---|---|---|",
    ]
    for name in BENCH_QUERIES:
        r = big[name] / base[name] if base[name] > 0 else float("nan")
        lines.append(f"| {name} | {base[name]:.2f} | {big[name]:.2f} | {r:.1f}x |")
    lines.append("")
    lines.append(f"Generated by `python tools/scale_smoke.py {n}`.")
    lines.append("")
    # Reading notes live in tools/scale_notes.md — the single source of
    # truth, so full regeneration and hand-appended --only rows stay in
    # sync (the notes used to be inline here and drifted from SCALE.md).
    lines.append(
        "Reading notes (persisted with the generator so regeneration keeps "
        "them):"
    )
    lines.append("")
    lines.append((Path(__file__).parent / "scale_notes.md").read_text().rstrip())
    Path("SCALE.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines))
    shutil.rmtree(big_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
