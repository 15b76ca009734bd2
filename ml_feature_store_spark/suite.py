"""Driver-facing query suite: Spark implementations + DuckDB oracle SQL.

Every operator from SURVEY §2 that is SQL-expressible gets a pair:
a ``(spark, sf_dir) -> DataFrame`` callable and an equivalent ANSI-SQL
string the driver runs on DuckDB over the same parquet tables. Column
names/aliases are kept identical on both sides; the driver's comparison is
row-count + schema + order-insensitive value hash.

Parity conventions (see FIXTURES.md "timestamp caveat"):
  * ``events.ts`` is parquet TIMESTAMP(NANOS): Spark reads it as an epoch-
    nanos long (``spark.sql.legacy.parquet.nanosAsLong``) and converts with
    ``timestamp_micros(ts div 1000)``; the oracle uses
    ``CAST(ts AS TIMESTAMP)`` (DuckDB ns->us truncation) — identical floors.
  * timestamps in OUTPUT are emitted as epoch-microsecond BIGINTs
    (``unix_micros`` / ``epoch_us``) so value hashing is type-stable.
  * double aggregates are rounded (2dp for price-scale sums, 4-6dp for
    ratios) to absorb summation-order float jitter.
  * sums of integers are CAST to BIGINT in DuckDB (it defaults to HUGEINT).
"""

from __future__ import annotations

from collections.abc import Callable  # noqa: F401

from pyspark.sql import DataFrame, SparkSession  # noqa: F401

from . import suite_io, suite_rel, suite_sim, suite_store, suite_text
from .suite_common import *  # noqa: F401,F403 — re-export table/events_features/...

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}
for _mod in (suite_store, suite_rel, suite_io, suite_text, suite_sim):
    QUERIES.update(_mod.QUERIES)
    ORACLE_SQL.update(_mod.ORACLE_SQL)

# Pre-split canonical registration order (rotation below puts the round's
# correctness window first; the remainder keeps this order).
_CANONICAL = [
    't6_explode_tokens',
    'dq1_column_profile',
    'arr2_vector_centroids',
    'x16_tfidf_topk',
    'f9_diff_versions',
    'pack1_sequence_packing',
    'pipe1_clean_corpus',
    'io4_text_roundtrip',
    'a10_hll_sketch',
    'm5_audio_decode',
    'p2_unpivot',
    'map1_map_functions',
    'r2_interval_join',
    'f1_register_pit_get',
    'f2_temporal_filter',
    'f3_entity_filter',
    'f4_latest_per_entity',
    'f6_pit_lookup',
    'f6b_pit_orders',
    'f7_asof_join',
    'f7_asof_join_grid',
    'f7c_asof_tolerance',
    'f8_version_travel',
    'f10_sql_over_views',
    'j1_join_broadcast',
    'j2_join_shuffle',
    'j3_semi_anti',
    'a1_agg_entity_stats',
    'a2_rolling_window',
    'a3_agg_distinct',
    'a4_approx_distinct',
    'a5_cube_rollup',
    'q1_pricing_summary',
    'q3_shipping_priority',
    'q5_local_supplier',
    'q6_forecast_revenue',
    'r1_range_join',
    'd1_date_functions',
    'a7_percentiles',
    'g1_grouping_sets',
    't3_token_count',
    'q18_large_orders',
    'a2b_multi_window',
    'h1_time_rollup',
    'io2_json_roundtrip',
    'x10_ivf_ann',
    'x11_embedding_dedup',
    'm2_frame_sample',
    'u2_intersect_except',
    'io1_csv_roundtrip',
    's1_topk_orders',
    's2_topk_per_group',
    'u1_union_by_name',
    'x5_json_extract',
    'x3_dedup_exact',
    'x4_text_stats',
    't1_lang_id',
    't2_quality_score',
    't4_fingerprint',
    'x1_knn_cosine_topk',
    'x2_similar_pairs',
    'x7_sessionize',
    'w1_tumbling_window',
    'a6_lag_lead',
    'p1_pivot',
    'w2_sliding_window',
    'x7b_session_stats',
    'm1_multimodal_decode',
    'm3_image_features',
    'x6_dedup_fuzzy',
    'x6b_jaccard_verify',
    'x8_ann_lsh',
    'x9_simhash',
    'a8_rank_family',
    't5_string_functions',
    'io3_orc_roundtrip',
    'x12_hash_split',
    'x13_stratified_sample',
    'x14_kmeans',
    'ts1_resample_ffill',
    'f11_scd2_intervals',
    'arr1_array_functions',
    'h2_value_histogram',
    'a9_stats_agg',
    'x15_dedup_components',
    'm4_grouped_pandas',
    'a11_distinct_salted',
    'a12_quantile_hist',
    'c1_doc_chunk',
    't7_pii_redact',
    't8_repetition',
    'emb1_quantize',
    'h3_incremental_rollup',
    'f13_pit_window_agg',
    'dq2_outliers',
    'ts2_interpolate',
    'er1_entity_resolution',
    'b1_bucketed_join',
    'io5_partitioned_pruning',
    'f14_multi_view_training_set',
    'pipe2_quality_dedup',
    'g2_pagerank',
    'g2b_pagerank_dangling',
    'decon1_contamination',
    'a14_approx_percentile',
    'shuf1_training_shards',
    'x17_pq_ann',
    'dq3_feature_drift',
    't4b_winnow_sketch',
    'io6_schema_evolution',
    'f7e_asof_left',
    'f15_decayed_features',
    'f15b_decayed_bucketed',
    'sd2_running_state_snapshot',
    'fe1_target_encoding',
    'fe2_feature_hash',
    'dq5_ks_statistic',
    'x21_bpe_train',
    'x22_semdedup',
    'x23_bpe_encode',
    'a18_cms_heavy_hitters',
    'dq6_leakage_audit',
    'rag2_ndcg_eval',
    'mix1_domain_mixture',
    'x24_importance_score',
    'g3b_triangle_degree_ordered',
    't11_dup_span_profile',
    'r3_interval_left_join',
    'f18_asof_nearest',
    'a19_bottomk_sample',
    'dq7_lateness_profile',
    'x25_containment_dedup',
    'f20_scd2_dim_join',
    'io8_compaction',
    'f22_upsert_patch',
    'f23_expire_ttl',
    'f24_erase_audit',
    'f25_online_snapshot',
    'pack2_rank_pairing',
    'ts3_seasonal_backtest',
    'x26_lsh_recall_eval',
    'f21_asof_forward',
    'f18b_asof_nearest_banded',
    'a20_retention_cohorts',
    't9_ngram_counts',
    't10_pmi_collocations',
    'g3_triangle_count',
    'a17_covariance_matrix',
    'rag1_hybrid_search',
    's3_bm25_search',
    'io7_corrupt_records',
    'f16_label_window',
    'f16b_label_window_frames',
    'a16_funnel',
    'x18_negative_sampling',
    'pipe3_curation_pipeline',
    'x19_pq_recall',
    'm6_modality_router',
    'x20_bpe_pair_counts',
    'dq4_referential_integrity',
    'fe3_vocab_encode',
    'ts4_rolling_anomaly',
    'g4_kcore',
    'rag3_mmr_rerank',
    'j4_bloom_probe',
    'x27_incremental_dedup',
    'card1_data_card',
    'sd3_streaming_sessionize',
    'j5_salted_join',
    'fe4_robust_scale',
    'io10_zorder_layout',
    'dq9_expectations',
    'mix2_temperature_mixture',
    'lm1_bigram_doc_score',
    'g5_copurchase_jaccard',
    'geo1_radius_join',
    'sd4_stream_dedup',
    'g6_random_walks',
    'emb2_matryoshka_recall',
    'io11_binary_ingest',
    'io12_gzip_roundtrip',
    'io13_values_inline',
    's4_tablesample',
    'online1_point_read',
    'udtf1_token_runs',
    't12_unicode_normalize',
    'fe6_global_row_number',
    'j6_nullsafe_join',
    'a21_regr_family',
    'x28_from_json_typed',
    'fe7_quantile_binning',
    'x29_weighted_sample',
    'fe8_impute_median',
    'dq11_observed_metrics',
    'io14_python_datasource',
    'x30_variant_extract',
    'io15_xml_roundtrip',
    'sd6_state_store_reader',
    'sd7_file_sink_exactly_once',
    't13_paragraph_dedup',
    'udtf2_session_gaps',
    'w3_session_window_batch',
    'a22_listagg',
    'q25_sql_variables',
    'num1_decimal_exact',
    'io16_dynamic_overwrite',
    't14_url_parse',
    'a24_bitmap_distinct',
    't15_aes_tokenize',
    't16_collation',
    'x31_crossdoc_spans',
    'x32_try_family',
    'a25_kmv_intersection',
    'io17_csv_multiline',
    'io18_python_datasource_writer',
    'dq13_benford_audit',
    'm7_phash_dedup',
    'g7_bfs_distances',
    'f26_snapshot_manifest',
    'f27_multi_view_left',
    'sd8_stream_static_enrich',
    'f28_online_offline_consistency',
    't17_url_canonicalize',
    'sd9_foreach_batch_upsert',
    'bt1_preference_strengths',
    'f29_training_freshness',
    'lab1_majority_vote',
    'f30_entity_merge',
]
assert set(_CANONICAL) == set(QUERIES), (
    sorted(set(_CANONICAL) ^ set(QUERIES))
)
QUERIES = {n: QUERIES[n] for n in _CANONICAL}

from .relational import RELATIONAL_ORACLE, RELATIONAL_QUERIES  # noqa: E402

QUERIES.update(RELATIONAL_QUERIES)
ORACLE_SQL.update(RELATIONAL_ORACLE)

# The correctness driver hashes the FIRST 50 entries of queries() in dict
# order per round. ROUND-6 ROTATION: after round 5, every registered query
# has a driver CORRECTNESS row (240/241 green; io14 red on the vanilla
# session's pushdown conf, fixed this round at the query site). The window's
# job is now (a) witnessing the round-6 FIXES (io14) and ADDITIONS (f26
# snapshot manifests, f27 left multi-view, sd8 stream-static enrich, f28
# online/offline audit, t17 URL canonicalization, sd9 foreachBatch
# upsert, bt1 Bradley-Terry, q29 GROUP/ORDER BY ALL, f29 freshness
# profile, lab1 majority vote), and (b) regression re-witness of the
# STALEST green rows: 39 of the 47 queries whose only driver row is from
# round 1 — 3-4 rounds and several refactors ago (suite split,
# microsecond-timestamp migration, materialization changes). io1/io2,
# x10_ivf_ann, m2_frame_sample, u2_intersect_except, q18, a2b, h1 plus
# the round-2-witnessed queries rotate in round 7.
_ROUND_PRIORITY = [
    "io14_python_datasource",
    "f26_snapshot_manifest",
    "f27_multi_view_left",
    "sd8_stream_static_enrich",
    "f28_online_offline_consistency",
    "t17_url_canonicalize",
    "sd9_foreach_batch_upsert",
    "bt1_preference_strengths",
    "q29_group_order_all",
    "f29_training_freshness",
    "lab1_majority_vote",
    "f30_entity_merge",
    "t6_explode_tokens",
    "dq1_column_profile",
    "arr2_vector_centroids",
    "x16_tfidf_topk",
    "f9_diff_versions",
    "pack1_sequence_packing",
    "pipe1_clean_corpus",
    "io4_text_roundtrip",
    "m5_audio_decode",
    "p2_unpivot",
    "map1_map_functions",
    "r2_interval_join",
    "f1_register_pit_get",
    "f2_temporal_filter",
    "f3_entity_filter",
    "f4_latest_per_entity",
    "f6_pit_lookup",
    "f6b_pit_orders",
    "f7_asof_join",
    "f7_asof_join_grid",
    "f7c_asof_tolerance",
    "f8_version_travel",
    "f10_sql_over_views",
    "j1_join_broadcast",
    "j2_join_shuffle",
    "j3_semi_anti",
    "a1_agg_entity_stats",
    "a2_rolling_window",
    "a3_agg_distinct",
    "a5_cube_rollup",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "r1_range_join",
    "d1_date_functions",
    "a7_percentiles",
    "g1_grouping_sets",
]
assert all(name in QUERIES for name in _ROUND_PRIORITY), sorted(
    set(_ROUND_PRIORITY) - set(QUERIES)
)
QUERIES = {name: QUERIES[name] for name in _ROUND_PRIORITY} | {
    name: fn for name, fn in QUERIES.items() if name not in set(_ROUND_PRIORITY)
}
