"""Backfill runner (SURVEY.md §2.9 L3/L4).

The reference runs every date in ``[start_date, end_date]`` sequentially
with ``depends_on_past=True`` (reference: dags/daily_search_history.py:15-17,
dags/transaction_data.py:69-71).  Because our per-run writes are
partition-overwrites (writers.write_append_partition), runs are
independent — the sequential loop here preserves the reference's ordering
semantics, but nothing breaks if dates run concurrently or re-run.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from datetime import date, timedelta


def date_range(start: str, end: str, step_days: int = 1) -> Iterator[str]:
    """Inclusive ISO-date range, mirroring Airflow's schedule over
    ``[start_date, end_date]`` (daily for Case A, every 3 days for
    Case B's ``timedelta(days=3)`` interval)."""
    d = date.fromisoformat(start)
    stop = date.fromisoformat(end)
    while d <= stop:
        yield d.isoformat()
        d += timedelta(days=step_days)


def backfill(run: Callable[[str], None], start: str, end: str,
             step_days: int = 1) -> list[str]:
    """Run ``run(ds)`` for every scheduled date; returns the dates run."""
    dates = list(date_range(start, end, step_days))
    for ds in dates:
        run(ds)
    return dates
