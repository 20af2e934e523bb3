"""mlvectordb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of SudYar/MLVectorDB, rebuilt Spark-first.

Design stance (SURVEY.md §7): one partitioned DataFrame is the database;
indexes are derived DataFrames; every reference operator is a DataFrame
transformation; namespace = partition column; distance kernels are native
column expressions (JVM-side, whole-stage-codegen'd); Python UDFs appear
only where built-ins genuinely cannot express the semantics (Arrow-batched
pandas UDFs, never row-at-a-time).
"""

from mlvectordb_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
