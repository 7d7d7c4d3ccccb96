"""Mini-driver: every registered query with an oracle must match DuckDB.

Mirrors the driver's t2 check (row-count + column names + order-
insensitive value comparison) so failures surface locally before the
round gate.  Runs at sf0.001 for speed; the driver runs sf0.01.
"""

from __future__ import annotations

import datetime
import math

import pandas as pd
import pytest

from etl_cloud_batch_processing_spark import plans

ORACLE_QUERIES = sorted(n for n, s in plans.REGISTRY.items()
                        if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in plans.REGISTRY.items()
                           if s.oracle is None)


def _canon(value):
    """Canonicalize a cell for order-insensitive comparison."""
    if value is None or value is pd.NaT:
        return None
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        # tolerate engine-level float formatting differences
        return round(value, 9)
    if isinstance(value, (list, tuple)) or type(value).__name__ == "ndarray":
        return tuple(_canon(v) for v in value)
    # duckdb fetchdf() renders DATE as midnight pandas Timestamps while
    # Spark toPandas() gives datetime.date — same logical value.
    if isinstance(value, (pd.Timestamp, datetime.datetime)):
        return pd.Timestamp(value).isoformat()
    if isinstance(value, datetime.date):
        return pd.Timestamp(value).isoformat()
    return value


def _rows(pdf):
    cols = sorted(pdf.columns)
    recs = [tuple(_canon(r[c]) for c in cols) for _, r in pdf.iterrows()]
    return cols, sorted(recs, key=lambda t: tuple(
        (x is None, str(type(x)), str(x)) for x in t))


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, sf_dir, name):
    spec = plans.REGISTRY[name]
    sdf = spec.builder(spark, sf_dir).toPandas()
    ddf = duck.execute(spec.oracle).fetchdf()

    assert sorted(sdf.columns) == sorted(ddf.columns), (
        f"{name}: column mismatch spark={sorted(sdf.columns)} "
        f"duckdb={sorted(ddf.columns)}")
    assert len(sdf) == len(ddf), (
        f"{name}: row count spark={len(sdf)} duckdb={len(ddf)}")

    scols, srows = _rows(sdf)
    dcols, drows = _rows(ddf)
    mismatches = [(i, a, b) for i, (a, b) in enumerate(zip(srows, drows))
                  if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(srows)} row mismatches; "
        f"first: spark={mismatches[0][1]} duckdb={mismatches[0][2]} "
        f"cols={scols}")


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, sf_dir, name):
    """Queries without an oracle must still run and return a stable schema."""
    spec = plans.REGISTRY[name]
    df = spec.builder(spark, sf_dir)
    assert df.columns, f"{name}: no columns"
    assert df.count() >= 0
