from .vectors import cosine_similarity, dot, l2_norm, sq_euclidean
from .text import (
    doc_fingerprint,
    lang_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
    word_count,
)

__all__ = [
    "cosine_similarity",
    "dot",
    "l2_norm",
    "sq_euclidean",
    "doc_fingerprint",
    "lang_id",
    "punct_ratio",
    "quality_score",
    "stopword_ratio",
    "token_count",
    "tokens",
    "word_count",
]
