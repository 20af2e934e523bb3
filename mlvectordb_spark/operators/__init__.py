from mlvectordb_spark.operators.knn import (
    contrastive_triplets,
    hard_negatives,
    hybrid_query,
    knn,
    knn_df,
    knn_join,
    range_query,
    threshold_query,
)

__all__ = [
    "knn",
    "knn_df",
    "knn_join",
    "range_query",
    "threshold_query",
    "hybrid_query",
    "hard_negatives",
    "contrastive_triplets",
]

# heavier modules (ann, store, dedup, scd, skew, rollup, sharding, asof) are
# imported explicitly by path — keeps `import mlvectordb_spark.operators`
# free of MLlib/numpy import cost for callers that only need the knn layer
