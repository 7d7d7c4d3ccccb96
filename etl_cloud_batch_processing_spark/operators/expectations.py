"""Declarative data-quality expectations: a Deequ-style constraint suite.

A large-scale ingest pipeline needs machine-checkable contracts on every
table it publishes — the reference repo's closest analog is the implicit
schema contract of its BigQuery load jobs (truncate/append with a fixed
schema, reference dags/transaction_data.py:19-66), which fails loads on
type mismatch but never validates VALUES.  This module adds the value
layer, modeled on the public AWS Deequ / Great Expectations designs:
a suite of named constraints is compiled into ONE aggregate pass per
table (conditional counts — Spark's map-side partial aggregation keeps
it a single scan at any scale), then unpivoted into one row per check.

Design rules:

* Row-level predicates (not_null / accepted_values / in_range / matches /
  expression) become ``SUM(CASE WHEN <violation> THEN 1 END)`` cells in a
  single ``agg`` — N checks cost one table scan, not N.
* ``unique`` is the one non-row-level constraint: violations =
  ``COUNT(col) - COUNT(DISTINCT col)`` (the number of surplus duplicate
  rows), computed in the same pass.
* Referential integrity runs per FK edge as a broadcast-friendly
  left-anti probe (:func:`fk_audit`); at 100 TB the parent key sets of
  real dimension tables broadcast, and fact-fact edges fall back to a
  shuffled anti join that AQE plans.
* The report is itself a DataFrame — pipelines gate publishes on
  ``report.filter(~passed).count() == 0`` and persist the report next to
  the data as an audit artifact.

Division of labor with :mod:`..operators.quality`: quality.py is the
GATE half — driver-side pass/fail scalars consumed inside
``write_audit_publish``/``publish_manifested`` (raise-before-publish)
plus zero-extra-scan ``observe`` write metrics.  This module is the
REPORT half — the distributed, persistable, oracle-value-checked audit
a platform schedules AGAINST the lake (per-check violation counts,
FK-edge orphan audits, regex/cross-column invariants), surfaced as the
registered queries in plans/dq.py.  The gate stays scalar because a
publish decision needs one boolean now; the report stays a DataFrame
because an audit trail needs rows you can store, diff, and re-verify.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One named constraint: ``violation`` is a boolean Column that is
    True for every row breaking the contract (NULL-safe: the builders
    below coalesce so NULL predicate results count as violations rather
    than vanishing — the delete_where NULL lesson, writers.py)."""

    name: str
    kind: str
    violation: Column | None  # row-level predicate, or None for `unique`
    unique_col: str | None = None


def not_null(col: str) -> Check:
    return Check(f"{col}_not_null", "not_null", F.col(col).isNull())


def unique(col: str) -> Check:
    return Check(f"{col}_unique", "unique", None, unique_col=col)


def accepted_values(col: str, values: list) -> Check:
    ok = F.col(col).isin(values)  # NULL.isin → NULL → violation below
    return Check(f"{col}_accepted_values", "accepted_values",
                 ~F.coalesce(ok, F.lit(False)))


def in_range(col: str, lo, hi, lo_inclusive: bool = False) -> Check:
    c = F.col(col)
    lo_ok = (c >= lo) if lo_inclusive else (c > lo)
    ok = lo_ok & (c <= hi)
    return Check(f"{col}_in_range", "in_range",
                 ~F.coalesce(ok, F.lit(False)))


def matches(col: str, regex: str) -> Check:
    ok = F.col(col).rlike(regex)
    return Check(f"{col}_matches", "matches",
                 ~F.coalesce(ok, F.lit(False)))


def expression(name: str, ok: Column) -> Check:
    """Arbitrary row-level invariant; ``ok`` True means the row passes."""
    return Check(name, "expression", ~F.coalesce(ok, F.lit(False)))


_REPORT_COLS = ["table_name", "check_name", "kind",
                "rows_scanned", "violations", "passed"]


def run_checks(df: DataFrame, table_name: str,
               checks: list[Check]) -> DataFrame:
    """Evaluate a suite against one table in a single aggregate pass.

    Returns the long-format report (one row per check).  The wide→long
    unpivot is a ``stack`` over the single aggregated row, so the whole
    suite is one scan + one 1-row exchange regardless of suite size.

    Check names are interpolated into the ``stack`` SQL as string
    literals, so they must not contain quotes; an empty suite would
    compile to malformed ``stack(0, )`` SQL — both rejected up front.
    """
    if not checks:
        raise ValueError("run_checks requires at least one Check")
    for c in checks:
        if "'" in c.name or "\\" in c.name:
            raise ValueError(
                f"check name {c.name!r} must not contain quotes or "
                "backslashes (interpolated into stack() SQL)")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, c in enumerate(checks):
        if c.kind == "unique":
            aggs.append((F.count(c.unique_col)
                         - F.countDistinct(c.unique_col))
                        .cast("bigint").alias(f"v{i}"))
        else:
            aggs.append(F.sum(F.when(c.violation, 1).otherwise(0))
                        .cast("bigint").alias(f"v{i}"))
    wide = df.agg(*aggs)
    cells = ", ".join(
        f"'{c.name}', '{c.kind}', v{i}" for i, c in enumerate(checks))
    long = wide.select(
        F.lit(table_name).alias("table_name"),
        F.col("n_rows").alias("rows_scanned"),
        F.expr(f"stack({len(checks)}, {cells})")
        .alias("check_name", "kind", "violations"))
    return long.select(
        "table_name", "check_name", "kind", "rows_scanned", "violations",
        (F.col("violations") == 0).alias("passed"))


def fk_audit(child: DataFrame, child_table: str, fk_col: str,
             parent: DataFrame, pk_col: str,
             broadcast_parent: bool = False) -> DataFrame:
    """Referential-integrity audit for one FK edge.

    Orphans are child rows whose (non-NULL) key has no parent, found by
    a left-anti join against the DISTINCT parent key set.  Pass
    ``broadcast_parent=True`` only for genuine dimension parents (the
    caller knows the schema); the default leaves the join strategy to
    Spark's size estimation + AQE, so a fact-sized parent (e.g. the
    lineitem→orders edge at 100 TB) plans a shuffled anti join instead
    of attempting to broadcast billions of keys into the 8 GB broadcast
    limit.  NULL FKs are reported separately (``null_fks``), not as
    orphans, so an optional relationship doesn't read as corruption.
    """
    keys = parent.select(F.col(pk_col).alias(fk_col)).distinct()
    if broadcast_parent:
        keys = F.broadcast(keys)
    nn = child.filter(F.col(fk_col).isNotNull())
    orphans = nn.join(keys, fk_col, "left_anti")
    stats = child.agg(
        F.count(F.lit(1)).alias("child_rows"),
        F.sum(F.when(F.col(fk_col).isNull(), 1).otherwise(0))
        .cast("bigint").alias("null_fks"),
        F.countDistinct(fk_col).alias("distinct_keys"))
    orph = orphans.agg(
        F.count(F.lit(1)).alias("orphan_rows"),
        F.countDistinct(fk_col).alias("orphan_keys"))
    return (stats.crossJoin(orph)  # two 1-row frames: scalar join
            .select(F.lit(child_table).alias("child_table"),
                    F.lit(fk_col).alias("fk_column"),
                    "child_rows", "distinct_keys", "null_fks",
                    "orphan_rows", "orphan_keys",
                    (F.col("orphan_rows") == 0).alias("intact")))
