"""Custom composite operators (SURVEY.md §7 step 5 scale paths).

Each module composes built-in DataFrame ops (plus stock MLlib where it
fits); importing the package registers their named queries.
"""

from etl_cloud_batch_processing_spark.operators import (  # noqa: F401
    dedup,
    linalg,
    multimodal,
    similarity,
)
