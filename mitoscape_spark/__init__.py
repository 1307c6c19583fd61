"""mitoscape_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
larryns/MitoScape (Scala/Spark batch ETL + MLlib pipeline; see SURVEY.md),
re-expressed as idiomatic PySpark: DataFrame/SQL plans optimized by
Catalyst, broadcast dimension joins, Arrow-vectorized pandas UDFs only
where built-in expressions cannot express the semantics, and
pyspark.ml for the classifier surface.

Layout:
    session     SparkSession factory (AQE on, UTC, Arrow enabled)
    catalog     parquet table loading for the synthetic test corpus
    queries     declared relational queries (SURVEY.md §2.9) + extensions
    functions   scalar/array helpers: MD-tag parser, SAM attrs, vector math
    operators   engine operators: dedup, similarity, intervals, text stats
    pipeline    MitoScape-parity domain pipeline (features → LD → ML → filter)
    streaming   Structured Streaming windows over event streams
    sources     ingest adapters (alignment parquet; BAM/multimodal stubs)
"""

from mitoscape_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]

__version__ = "0.1.0"
