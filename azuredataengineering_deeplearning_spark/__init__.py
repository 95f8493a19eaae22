"""PySpark-native analytics/ETL engine.

A clean-room, Spark-first re-expression of the query and data-processing
capabilities of the reference lakehouse ETL system
(``afogarty85/AzureDataEngineering-DeepLearning``): medallion ETL (SCD2
dimensions, changeset merges, schema drift), feature/window operators
(salted cumulative sums, sessionization, encoders, profilers), time-series
spines, recursive hierarchies, streaming ingest — plus first-class
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale.

Everything is declared through the DataFrame API so Catalyst/AQE own the
physical plan: predicate pushdown, column pruning, broadcast selection,
skew handling, and whole-stage codegen come from Spark, not hand-rolled
loops. Python touches data only through Arrow-vectorized pandas UDFs, and
only where built-in expressions genuinely cannot express the semantics.
"""

from azuredataengineering_deeplearning_spark.session import get_spark, LOCAL_PROFILE

__all__ = ["get_spark", "LOCAL_PROFILE"]

__version__ = "0.1.0"
