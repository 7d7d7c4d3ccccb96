"""Disposition-aware writers.

The reference uses two BigQuery write dispositions (SURVEY.md §2.9):

* ``WRITE_TRUNCATE`` — idempotent full-replace of a staging table
  (dags/daily_search_history.py:50; dags/transaction_data.py:49)
  → :func:`write_overwrite`.
* ``WRITE_APPEND`` — accumulate one run's rows into a history table
  (dags/daily_search_history.py:66,87; dags/transaction_data.py:97)
  → :func:`write_append_partition`.  The reference's append duplicates
  rows if a task is retried in isolation; we instead overwrite the
  single ``dt=<run_date>`` partition (dynamic partition overwrite), so
  any re-run of any stage is idempotent, and backfills across dates
  parallelize because each run touches only its own partition.

At 100 TB the ``dt=`` layout is also the partition-pruning handle: every
scheduled read touches O(one day) of files, never the whole table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_overwrite(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """WRITE_TRUNCATE equivalent: replace the whole table."""
    df.write.mode("overwrite").format(fmt).save(path)


def write_append_partition(df: DataFrame, path: str, run_date: str,
                           fmt: str = "parquet",
                           partition_col: str = "dt") -> None:
    """WRITE_APPEND equivalent, made idempotent.

    Stamps ``dt=run_date`` and overwrites only that partition (requires
    ``spark.sql.sources.partitionOverwriteMode=dynamic``, set by the
    session factory).  Re-running the same ``run_date`` replaces rather
    than duplicates — the defect fix called out in SURVEY.md §2.9.
    """
    (df.withColumn(partition_col, F.lit(run_date))
       .write.mode("overwrite")
       .partitionBy(partition_col)
       .format(fmt)
       .save(path))
