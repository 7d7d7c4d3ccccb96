"""Query library: importing this package populates the registry."""

from etl_cloud_batch_processing_spark.plans import (  # noqa: F401
    analytics,
    core,
    corpus,
    dq,
    drift,
    evolution,
    filtering,
    formats,
    layout,
    llm,
    profiling,
    sketches,
    streams,
    survival,
    temporal,
    tokenization,
)
from etl_cloud_batch_processing_spark import operators  # noqa: E402,F401
from etl_cloud_batch_processing_spark.plans.registry import (
    REGISTRY,
    all_oracles,
    all_queries,
)

__all__ = ["REGISTRY", "all_oracles", "all_queries"]
