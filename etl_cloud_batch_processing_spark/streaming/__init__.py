"""Structured Streaming surface (SURVEY.md §2.11 stretch path)."""

from etl_cloud_batch_processing_spark.streaming import windows  # noqa: F401
