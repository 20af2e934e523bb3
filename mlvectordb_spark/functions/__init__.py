from mlvectordb_spark.functions.vector import (
    cosine_sim,
    dot,
    l2_dist,
    l2_sq,
    norm2,
    normalize,
)
from mlvectordb_spark.functions.text import (
    char_ngrams,
    doc_fingerprint,
    lang_id_expr,
    quality_score,
    token_count,
    tokens,
    word_shingles,
)

__all__ = [
    "cosine_sim",
    "dot",
    "l2_dist",
    "l2_sq",
    "norm2",
    "normalize",
    "tokens",
    "token_count",
    "word_shingles",
    "char_ngrams",
    "lang_id_expr",
    "quality_score",
    "doc_fingerprint",
]
