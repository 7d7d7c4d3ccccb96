"""Scheduled continuous-aggregate maintenance (SURVEY.md §2.12 rollup
pattern, round-3 verdict item 7).

The query side (``plans/temporal.rollup_plus_tail_counts``) reads a
``dt=``-partitioned daily rollup table and aggregates only the open-day
tail.  This module is the MAINTENANCE side expressed as a scheduled
pipeline: one :func:`run` per closed day — exactly the shape of the
reference's per-``ds`` DAG runs (reference: dags/daily_search_history.py:15-17
``depends_on_past`` daily schedule) — driven through the same
``pipelines.runner.backfill`` loop as Case A/B.

Each day's run overwrites only its own ``dt=run_date`` partition
(idempotent ``write_append_partition`` disposition), so retries replace
rather than duplicate and a backfill across N days parallelizes: at
100 TB the nightly cost is O(one day of events), never O(history).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from etl_cloud_batch_processing_spark.pipelines.runner import backfill
from etl_cloud_batch_processing_spark.plans.temporal import (
    maintain_daily_rollup,
)


def run(spark: SparkSession, sf_dir: str, ds: str) -> str:
    """One scheduled maintenance run: roll up the closed day ``ds``
    into its own ``dt=ds`` partition.  Returns the rollup table path."""
    return maintain_daily_rollup(spark, sf_dir, run_date=ds)


def backfill_rollup(spark: SparkSession, sf_dir: str,
                    start: str, end: str) -> list[str]:
    """Maintain every day in ``[start, end]`` through the standard
    backfill runner (§2.9 L3/L4 ordering semantics; runs are
    independent because each touches only its own partition)."""
    return backfill(lambda ds: run(spark, sf_dir, ds), start, end)
