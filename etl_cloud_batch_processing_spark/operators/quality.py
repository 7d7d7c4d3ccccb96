"""Single-pass data-quality checks (Deequ-style) for pipeline gates.

A training-data pipeline at 100 TB cannot afford one Spark job per
assertion.  ``run_checks`` compiles every rule into one aggregate
expression list and evaluates them all in a SINGLE pass over the data
(one scan, one job, partial aggregation map-side); the result is a tiny
driver-side report, never the data itself.

Rules are plain declarative tuples, so a pipeline can gate a write on
``all(r.passed for r in report)`` — the moral equivalent of the
reference's manual screenshot verification (README.md:84-93), made
executable.

This is the GATE half of the data-quality layer: driver-side scalars a
writer checks before an atomic publish (sources/writers.py:84,
sources/manifest.py).  The queryable REPORT half — distributed
DataFrame reports with per-check violation counts, FK-edge orphan
audits, and regex/cross-column invariants, value-checked by the driver
oracle — lives in :mod:`.expectations` (queries in plans/dq.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CheckResult:
    rule: str
    column: str
    passed: bool
    observed: float


def not_null(col: str) -> tuple[str, str, Column, Column]:
    """Fraction of NULLs must be 0."""
    frac = (F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
            / F.count(F.lit(1)))
    return ("not_null", col, frac.cast("double"), F.lit(0.0))


def unique(col: str) -> tuple[str, str, Column, Column]:
    """Distinct count must equal row count (exact, not approx — a
    uniqueness gate with false negatives is not a gate)."""
    return ("unique", col,
            F.countDistinct(F.col(col)).cast("double"),
            F.count(F.col(col)).cast("double"))


def in_range(col: str, lo: float, hi: float) -> tuple[str, str, Column, Column]:
    """Fraction of non-null values outside [lo, hi] must be 0."""
    bad = F.sum(F.when(F.col(col).isNotNull()
                       & ~F.col(col).between(lo, hi), 1).otherwise(0))
    return (f"in_range[{lo},{hi}]", col,
            bad.cast("double"), F.lit(0.0))


def accepted_values(col: str, values: list) -> tuple[str, str, Column, Column]:
    """Count of non-null values outside the accepted set must be 0."""
    bad = F.sum(F.when(F.col(col).isNotNull()
                       & ~F.col(col).isin(values), 1).otherwise(0))
    return (f"accepted_values{values}", col,
            bad.cast("double"), F.lit(0.0))


def min_rows(n: int) -> tuple[str, str, Column, Column]:
    """Row count must be at least n (empty-input guard for a run)."""
    return (f"min_rows[{n}]", "*",
            F.count(F.lit(1)).cast("double"), F.lit(float(n)))


def run_checks(df: DataFrame,
               rules: list[tuple[str, str, Column, Column]]) -> list[CheckResult]:
    """Evaluate all rules in ONE aggregation pass over ``df``.

    Each rule contributes (observed, threshold) aggregate expressions;
    not_null/in_range/accepted_values pass when observed == threshold,
    unique when observed == threshold (distinct == count), min_rows when
    observed >= threshold.
    """
    aggs: list[Column] = []
    for i, (_name, _col, observed, threshold) in enumerate(rules):
        aggs.append(observed.alias(f"obs_{i}"))
        aggs.append(threshold.alias(f"thr_{i}"))
    row = df.agg(*aggs).collect()[0]

    results = []
    for i, (name, col, _o, _t) in enumerate(rules):
        obs, thr = float(row[f"obs_{i}"]), float(row[f"thr_{i}"])
        passed = obs >= thr if name.startswith("min_rows") else obs == thr
        if name.startswith(("not_null", "in_range", "accepted_values")):
            passed = obs == thr  # zero violations
        results.append(CheckResult(name, col, passed, obs))
    return results


def observed_write(df: DataFrame, path: str,
                   metric_cols: list[str] | None = None,
                   fmt: str = "parquet") -> dict:
    """Write ``df`` while collecting row/null metrics for free.

    ``df.observe`` attaches aggregate accumulators to the plan that the
    write action itself populates — rows written and per-column null
    counts cost ZERO extra scans and zero extra jobs, versus the naive
    "write, then read back and count" which doubles I/O.  This is how a
    100 TB pipeline stage reports its output contract (row counts for
    reconciliation, null rates for drift alarms) without paying for a
    verification pass.

    Returns the metrics dict: ``{"rows": n, "nulls_<col>": n, ...}``.
    """
    from pyspark.sql import Observation

    metric_cols = metric_cols if metric_cols is not None else df.columns
    obs = Observation()
    exprs = [F.count(F.lit(1)).alias("rows")]
    exprs += [F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
              for c in metric_cols]
    df.observe(obs, *exprs).write.mode("overwrite").format(fmt).save(path)
    return obs.get
