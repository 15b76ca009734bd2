from .vector import cosine_similarity, dot, l2_norm, normalize
from .text import tokens, token_count, shingles, stopword_ratio

__all__ = [
    "cosine_similarity",
    "dot",
    "l2_norm",
    "normalize",
    "tokens",
    "token_count",
    "shingles",
    "stopword_ratio",
]
