"""Named-query registry backing the driver contract (__spark_entry__.py).

Every implemented operator from SURVEY.md §2 registers here as a named
query: a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame`` plus —
whenever the semantics are SQL-expressible — a DuckDB oracle SQL twin
the driver runs side-by-side at sf0.01.

Design rules enforced here rather than re-stated per query:

* every builder runs under the engine conf (ANSI off → SAFE_CAST parity,
  UTC session timezone → date extraction parity with DuckDB);
* column names/aliases must match the oracle exactly (the driver sorts
  columns by name before value-hashing);
* every ORDER BY that feeds a LIMIT or row_number carries a total,
  deterministic tiebreak (SURVEY.md §2.6).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_cloud_batch_processing_spark.session import apply_engine_conf

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    doc: str


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[Builder], Builder]:
    """Register a named query (decorator)."""

    def deco(fn: Builder) -> Builder:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_engine_conf(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, wrapped, oracle, fn.__doc__ or "")
        return fn

    return deco


# Fixture columns stored as parquet TIMESTAMP(NANOS): Spark reads them as
# int64 nanos (legacy.parquet.nanosAsLong) and we convert to microsecond
# timestamps here, exactly as DuckDB truncates ns→µs for its TIMESTAMP.
_NANOS_TS_COLS = {"events": ["ts"]}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table (TESTDATA.md layout)."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    return df


def ptable(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Fixture table repartitioned to the session's core count.

    The fixtures are single small parquet files, so a plain scan yields
    ONE input partition and any compute-heavy per-row work (md5
    shingling, 64-dim cosines, Python decode) runs on one core.  Use
    this instead of :func:`table` wherever per-row compute dominates
    scan cost; the round-robin exchange of a few MB is noise.  At real
    scale the source is many files and the scan splits naturally — this
    wrapper documents which operators are compute-bound, and would be a
    plain ``table`` there."""
    par = spark.sparkContext.defaultParallelism
    return table(spark, sf_dir, name).repartition(par)


# The external verify harness grades at most the FIRST 50 entries of
# queries(), in iteration order (DRIVER_NOTES.md #2).  Round 2 curated
# that prefix by hand; the round-2 advisor flagged hand-curation as
# gaming the signal.  The ordering is now MECHANICAL: queries that have
# never earned a green row in a committed ``CORRECTNESS_r*.json`` sort
# first (alphabetically), already-green queries sort last
# (alphabetically).  Each round the driver therefore grades the 50
# longest-unverified queries and the window rotates through the whole
# registry with zero human choice; the builder's own full DuckDB sweep
# (tools/drive_entry.py, every registered query — len(REGISTRY) — at
# sf0.01 and sf0.1) remains
# the regression net for whatever is outside the window.  Applied at
# call time, not import time: Python workers unpickling a UDF import
# ``operators`` first, which re-enters ``plans/__init__`` while
# operator queries are still unregistered — an import-time reorder
# breaks every Arrow-UDF task.


def _graded_green() -> set[str]:
    """Names with a green driver row in any committed CORRECTNESS file.

    Green = rows+schema+hash all true, or — for rows-only queries with
    no oracle (``err == "no_oracle"``) — a recorded spark row count.
    A crashed row (any other ``err``) does NOT count: the query stays
    in the front of the window until the driver grades it green.
    """
    import json
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[2]
    green: set[str] = set()
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, r in rows.items():
            if not isinstance(r, dict):
                continue
            if r.get("err") == "no_oracle" and r.get("spark_rows") is not None:
                green.add(name)
            elif (r.get("err") is None and r.get("rows_match")
                  and r.get("schema_match") and r.get("hash_match")):
                green.add(name)
    return green


def _ordered() -> list[str]:
    green = _graded_green()
    names = sorted(REGISTRY)
    return ([n for n in names if n not in green]
            + [n for n in names if n in green])


def all_queries() -> dict[str, Builder]:
    return {name: REGISTRY[name].builder for name in _ordered()}


def all_oracles() -> dict[str, str]:
    return {name: REGISTRY[name].oracle for name in _ordered()
            if REGISTRY[name].oracle is not None}
