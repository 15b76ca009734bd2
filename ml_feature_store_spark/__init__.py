"""ml_feature_store_spark — PySpark-native point-in-time-correct feature store.

A from-scratch Spark engine with the query semantics of the reference
pandas feature store (jrajath94/ml-feature-store) plus large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing, streaming ingest).
"""

from .errors import FeatureStoreError, FeatureTableNotFoundError, FeatureValidationError
from .store import (
    DEFAULT_MAX_VERSIONS,
    NO_TTL,
    FeatureStore,
    FeatureTableInfo,
    SnapshotManifest,
)

__all__ = [
    "FeatureStore",
    "FeatureTableInfo",
    "SnapshotManifest",
    "FeatureStoreError",
    "FeatureTableNotFoundError",
    "FeatureValidationError",
    "DEFAULT_MAX_VERSIONS",
    "NO_TTL",
]

__version__ = "0.1.0"
