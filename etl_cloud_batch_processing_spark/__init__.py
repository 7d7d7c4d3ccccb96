"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ETL project (Jomen034/etl-cloud-batch-processing).

The reference is a Google Cloud Composer (Airflow) batch ETL project whose
query semantics live in embedded BigQuery SQL strings and one pandas
transform (see SURVEY.md).  This package re-expresses every one of those
semantics — plus the analytics and LLM-data-pipeline operators the north
star requires — as idiomatic PySpark DataFrame plans, designed so the same
code runs unchanged from local[32] test scale to a 1000-executor cluster
over 100 TB.

Layout:
    session     SparkSession factory with the engine config block
    sources     schema-explicit readers, disposition-aware writers
    functions   scalar/text/vector column-expression helpers
    operators   top-k, dedup, similarity-search, multimodal plumbing
    pipelines   Case A / Case B re-expressions + backfill runner
    plans       the named query library + DuckDB oracle twins
    streaming   Structured Streaming upgrade path for the events table
"""

from etl_cloud_batch_processing_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
