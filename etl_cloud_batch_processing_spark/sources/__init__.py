from etl_cloud_batch_processing_spark.sources.readers import (
    Catalog,
    read_csv,
    read_json,
    read_parquet,
)
from etl_cloud_batch_processing_spark.sources.writers import (
    write_append_partition,
    write_overwrite,
)

__all__ = [
    "Catalog",
    "read_csv",
    "read_json",
    "read_parquet",
    "write_append_partition",
    "write_overwrite",
]
