from mlvectordb_spark.operators.knn import (
    hybrid_query,
    knn,
    knn_join,
    range_query,
    threshold_query,
)

__all__ = ["knn", "knn_join", "range_query", "threshold_query", "hybrid_query"]
