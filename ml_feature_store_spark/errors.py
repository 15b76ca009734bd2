"""Exception hierarchy for the PySpark feature-store engine.

Mirrors the reference taxonomy (reference: src/ml_feature_store/store.py:72-81):
a base error with two subclasses for missing tables and invalid input.
"""

from __future__ import annotations


class FeatureStoreError(Exception):
    """Base class for all feature-store errors."""


class FeatureTableNotFoundError(FeatureStoreError):
    """Raised when a requested feature table (or version) does not exist."""


class FeatureValidationError(FeatureStoreError):
    """Raised when input data fails validation (schema / emptiness / columns)."""
