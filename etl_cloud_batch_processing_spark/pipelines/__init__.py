"""Date-parameterized batch pipelines (SURVEY.md §2.9, §7 Step 3).

Each pipeline is a pure function of ``(spark, run_date, paths)`` — the
engine equivalent of one Airflow DAG run.  Scheduling (cron) stays a
driver/orchestrator concern; the engine guarantees every ``run`` is
independent and idempotent so backfills parallelize and retries are safe.
"""

from etl_cloud_batch_processing_spark.pipelines import (
    case_a,
    case_b,
    rollup_job,
)
from etl_cloud_batch_processing_spark.pipelines.runner import (
    backfill,
    date_range,
)

__all__ = ["case_a", "case_b", "rollup_job", "backfill", "date_range"]
