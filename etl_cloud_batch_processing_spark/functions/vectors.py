"""Vector column expressions over ``array<float>`` embeddings.

All JVM-side (``zip_with`` / ``aggregate`` higher-order functions) — no
Python crosses the wire, so similarity math runs inside whole-stage
codegen at full scan speed.  Elements are cast to double *before* any
arithmetic so results are bit-identical to an oracle computing in
doubles (float32 math would drift ~1e-7 — enough to flip a rounded 6th
decimal).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ in double precision, summed left-to-right (index order) —
    the same order DuckDB's list_sum uses, so sums are bit-identical."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    products = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity in double precision."""
    return dot(a, b) / (norm(a) * norm(b))


def cosine_on_unit(a: Column | str, b: Column | str) -> Column:
    """Cosine for pre-normalized vectors — just the dot product.  The
    scale path: normalize once at ingest (O(n)), then every pairwise
    similarity is a plain dot (saves 2 norms per pair in an O(n²) or
    LSH-bucketed join)."""
    return dot(a, b)


def l2_normalize(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    n = norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)


def duckdb_dot_sql(a: str, b: str, dim: int = 64) -> str:
    """DuckDB oracle twin of :func:`dot` — double-precision inner
    product summed in index order (bit-identical to the Spark
    ``aggregate`` fold; DuckDB's ``list_dot_product`` computes in
    float32 and would drift)."""
    return (f"list_sum(list_transform(range(1, {dim + 1}), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))")


def duckdb_cosine_sql(a: str, b: str, dim: int = 64) -> str:
    """DuckDB oracle twin of :func:`cosine` — manual double math.

    DuckDB's built-in ``list_cosine_similarity`` computes in float32
    (measured ~2.7e-8 off from double), so oracles must spell out the
    double-precision form to hash-match Spark.
    """
    def _dot(x: str, y: str) -> str:
        return (f"list_sum(list_transform(range(1, {dim + 1}), "
                f"i -> CAST({x}[i] AS DOUBLE) * CAST({y}[i] AS DOUBLE)))")

    return (f"({_dot(a, b)} / "
            f"(sqrt({_dot(a, a)}) * sqrt({_dot(b, b)})))")
