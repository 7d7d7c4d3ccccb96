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


def all_queries() -> dict[str, Builder]:
    return {name: spec.builder for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items()
            if spec.oracle is not None}
