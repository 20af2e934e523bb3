from mlvectordb_spark.plans.explain import explain_query
from mlvectordb_spark.plans.stats import QueryStatistics

__all__ = ["explain_query", "QueryStatistics"]
