from etl_cloud_batch_processing_spark.functions import text, vectors

__all__ = ["text", "vectors"]
