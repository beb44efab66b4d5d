"""duckdb_nsql_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the tdoehmen/DuckDB-NSQL reference benchmark
(75 DuckDB-dialect gold queries + harness introspection surface), plus
large-scale training-data pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) built Spark-first.
"""

from .session import DuckSparkSession, build_spark, connect

__all__ = ["DuckSparkSession", "build_spark", "connect"]
__version__ = "0.1.0"
