from .agg import count_distinct_salted, histogram_quantile_rollup, iqr_outlier_stats
from .skew import salted_join
from .asof import asof_join
from .chunking import chunk_documents
from .linkage import fuzzy_match_blocked
from .features import pit_window_agg
from .dedup import (
    connected_components,
    dedup_embedding_cosine,
    dedup_exact,
    dedup_minhash_lsh,
    dedup_simhash,
    detect_contamination,
    minhash_signatures,
    ngram_jaccard,
)
from .graph import kcore, pagerank, triangle_count, triangle_count_degree_ordered
from .clustering import (
    assign_clusters,
    assign_clusters_int,
    inertia,
    kmeans,
    kmeans_quantized,
    update_centroids,
)
from .pit import entity_filter, latest_per_entity, project, temporal_filter, top_k_per_group
from .sampling import hash_uniform, stratified_sample, with_kfold, with_split
from .sessionize import session_stats, sessionize, sessionize_bucketed
from .similarity import (
    ivf_assign,
    knn_brute_force,
    knn_for_queries,
    knn_ivf,
    knn_lsh,
    pq_ann_topk,
    rp_lsh_bucketize,
)
from .text import (
    add_token_count,
    fingerprint,
    lang_id,
    lang_id_ngram,
    quality_score,
    redact_pii,
    repetition_stats,
    rolling_hash_fingerprint,
)

__all__ = [
    "asof_join",
    "assign_clusters",
    "inertia",
    "kmeans",
    "kmeans_quantized",
    "assign_clusters_int",
    "update_centroids",
    "hash_uniform",
    "stratified_sample",
    "with_kfold",
    "with_split",
    "entity_filter",
    "latest_per_entity",
    "project",
    "temporal_filter",
    "top_k_per_group",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "minhash_signatures",
    "ngram_jaccard",
    "connected_components",
    "detect_contamination",
    "pagerank",
    "sessionize",
    "sessionize_bucketed",
    "session_stats",
    "knn_brute_force",
    "knn_for_queries",
    "knn_lsh",
    "rp_lsh_bucketize",
    "ivf_assign",
    "knn_ivf",
    "pq_ann_topk",
    "lang_id",
    "lang_id_ngram",
    "quality_score",
    "add_token_count",
    "fingerprint",
    "rolling_hash_fingerprint",
    "count_distinct_salted",
    "histogram_quantile_rollup",
    "iqr_outlier_stats",
    "fuzzy_match_blocked",
    "pit_window_agg",
    "chunk_documents",
    "redact_pii",
    "repetition_stats",
    "kcore",
    "triangle_count",
    "triangle_count_degree_ordered",
    "salted_join",
]
