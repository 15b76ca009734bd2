"""Text expression helpers (JVM-side, codegen-friendly).

Used by operators/text.py and operators/dedup.py. Whitespace tokenization
matches the synthetic corpus (space-separated tokens); swap the pattern for
a BPE-ish regex on real corpora.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_PATTERN = " "


def tokens(text: Column) -> Column:
    return F.split(text, TOKEN_PATTERN)


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def shingles(text: Column, k: int = 3) -> Column:
    """k-token shingles as strings: sliding windows over the token array.

    Pure higher-order-function implementation: for token array t of size n,
    produce n-k+1 joined substrings. Used as the MinHash input domain.
    """
    t = tokens(text)
    n = F.size(t)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n >= k, F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i + 1, k)))).otherwise(
        F.array(F.concat_ws(" ", t))
    )


def stopword_ratio(text: Column, stopwords: Sequence[str]) -> Column:
    t = tokens(text)
    hits = F.size(F.filter(t, lambda x: x.isin(list(stopwords))))
    return hits / F.size(t)
