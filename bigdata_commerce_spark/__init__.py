"""bigdata_commerce_spark — a PySpark-native analytics engine.

A ground-up re-expression of the query and data-processing
capabilities of the reference e-commerce analytics platform
(hmProgramer/bigdata_commerce — Spark 2.1.1 RDD/DStream era) in
idiomatic PySpark: DataFrame/SQL + Catalyst for batch, Structured
Streaming for the real-time ad-click pipeline, plus the
large-scale training-data operators (dedup, similarity search,
text analysis, multimodal plumbing) a modern 100 TB pipeline needs.

Layout:
  session.py    SparkSession factory tuned for local[32] tests and
                cluster-scale defaults (AQE, Arrow, shuffle sizing)
  sources/      typed ingest: testdata loaders, seeded commerce
                fixture generator, JDBC/stream helpers
  operators/    pure DataFrame -> DataFrame operators mirroring
                SURVEY.md §2 plus the training-data extensions
  functions/    scalar column helpers (sentinel handling, buckets)
  plans/        the ten reference "requirements" as compositions
  streaming/    Structured Streaming pipelines (reqs 7-10)
"""

from bigdata_commerce_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
