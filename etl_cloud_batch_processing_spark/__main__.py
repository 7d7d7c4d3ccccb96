"""CLI: run a pipeline for one date or backfill a window.

    python -m etl_cloud_batch_processing_spark case_a \
        --ds 2021-03-10 --source /data/keyword_search --warehouse /wh
    python -m etl_cloud_batch_processing_spark case_b \
        --start 2021-03-21 --end 2021-03-27 --step-days 3 \
        --source /data/events.parquet --warehouse /wh

The scheduling itself (cron) stays outside the engine, as in the
reference (SURVEY.md §2.9 L2) — this entrypoint is what the scheduler
invokes.  Re-running any date is safe: every per-run write is a
dt=<ds> partition overwrite.
"""

from __future__ import annotations

import argparse

from etl_cloud_batch_processing_spark.pipelines import case_a, case_b, runner
from etl_cloud_batch_processing_spark.session import get_spark


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="etl_cloud_batch_processing_spark")
    p.add_argument("pipeline", choices=["case_a", "case_b"])
    p.add_argument("--ds", help="single run date (YYYY-MM-DD)")
    p.add_argument("--start", help="backfill start date")
    p.add_argument("--end", help="backfill end date")
    p.add_argument("--step-days", type=int, default=None,
                   help="schedule interval (default: 1 for case_a, "
                        "3 for case_b)")
    p.add_argument("--source", required=True,
                   help="case_a: CSV root; case_b: events parquet path")
    p.add_argument("--warehouse", required=True, help="output table root")
    args = p.parse_args(argv)
    if bool(args.ds) == bool(args.start and args.end):
        p.error("pass either --ds or both --start and --end")

    mod = case_a if args.pipeline == "case_a" else case_b
    step = args.step_days or (1 if args.pipeline == "case_a" else 3)
    from pyspark.sql import SparkSession

    preexisting = SparkSession.getActiveSession() is not None
    spark = get_spark(f"pipeline-{args.pipeline}")
    try:
        if args.ds:
            mod.run(spark, args.ds, args.source, args.warehouse)
            print(f"ran {args.pipeline} for {args.ds}")
        else:
            dates = runner.backfill(
                lambda ds: mod.run(spark, ds, args.source, args.warehouse),
                args.start, args.end, step)
            print(f"backfilled {args.pipeline} for {len(dates)} dates: "
                  f"{dates[0]}..{dates[-1]}")
    finally:
        # stop only a session this invocation created — embedding callers
        # (tests, notebooks) keep theirs
        if not preexisting:
            spark.stop()


if __name__ == "__main__":
    main()
