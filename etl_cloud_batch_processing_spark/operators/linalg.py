"""Distributed linear algebra over the embedding corpus: one-pass Gram /
covariance matrix and driver-side eigendecomposition for PCA.

This is the SCALE companion to ``plans/llm.py
embedding_top_pc_power_iter``: power iteration re-scans the corpus per
iteration (k iterations = k barriers), which is the right pattern when
d is huge and the d×d matrix cannot exist.  For embedding curation
d is small (64-4096), so the 100-TB-correct design is the one Spark
MLlib itself uses for ``RowMatrix.computePrincipalComponents``: compute
the d×d Gram matrix in ONE data pass (numpy ``Mᵀ·M`` per Arrow batch
inside ``mapInPandas``, then a tiny d² reduce), collect the d×d result
to the driver — O(d²) values, NOT O(rows), the same legitimately-
driver-side terminal fetch as a ``count()`` — and eigendecompose
locally with LAPACK.  Per-row work is a vectorized BLAS rank-k update;
the shuffle moves only ``partitions × d(d+1)/2`` partial sums no matter
how many rows the corpus has.

Reference parity: the reference repo has no linear algebra (its whole
query surface is 4 BigQuery SQL strings — see SURVEY.md §2); this
module belongs to the training-data-pipeline mandate (embedding
whitening / outlier-direction analysis before similarity search).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_cloud_batch_processing_spark.plans.registry import ptable, query

#: Driver-memory guard: the d×d covariance collect is O(d²) doubles
#: (4096 dims = 128 MiB), independent of corpus size.  Past this,
#: eigensolving must move off the driver — use the power-iteration
#: form (plans/llm.py embedding_top_pc_power_iter), which never
#: materializes the matrix.
MAX_GRAM_DIM = 4096

_GRAM_SCHEMA = "i long, j long, sxx double"


def _centered_gram_partials(mu: np.ndarray):
    """mapInPandas factory: per Arrow batch, stack into an (n×d)
    float64 matrix, subtract the broadcast column means, and emit the
    upper triangle of ``(M−μ)ᵀ·(M−μ)`` as (i, j, partial-sum) rows —
    d(d+1)/2 rows per batch regardless of batch row count; all flops
    are one BLAS gemm.

    Centering BEFORE the product matters for oracle parity, not just
    conditioning: the one-pass ``Σxᵢxⱼ/n − μᵢμⱼ`` form cancels two
    O(μ²) quantities to get an O(σ²) result, amplifying the
    merge-order float jitter of the distributed reduce past the
    6-decimal rounding grain (observed: a cell flipping between runs).
    Centered partials keep the absolute error at the grain of the
    result itself, the same robustness class as the green
    embedding_dim_stats variance."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        iu = np.triu_indices(len(mu))
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            m -= mu
            g = m.T @ m
            yield pd.DataFrame({"i": iu[0], "j": iu[1], "sxx": g[iu]})

    return gen


def covariance_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population covariance of the embedding corpus as an upper-
    triangle (i ≤ j) DataFrame of (i, j, cov), unrounded.

    Two passes, both corpus-size-safe: a cheap JVM-side posexplode
    aggregate for the d per-dimension means (collected — d doubles, a
    legitimate terminal scalar fetch) , then ONE mapInPandas pass for
    the centered Gram (partials → d(d+1)/2-key reduce with map-side
    combine) and cov(i,j) = Σx̃ᵢx̃ⱼ/n with n joined as a broadcast
    scalar."""
    emb = ptable(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    if dim > MAX_GRAM_DIM:
        raise ValueError(
            f"covariance_frame materializes a {dim}×{dim} matrix on the "
            f"driver; dim exceeds MAX_GRAM_DIM={MAX_GRAM_DIM}. Use "
            f"embedding_top_pc_power_iter for very-high-dimensional "
            f"corpora, or raise operators.linalg.MAX_GRAM_DIM.")
    flat = emb.select(F.posexplode("embedding").alias("dim", "f")) \
              .select("dim", F.col("f").cast("double").alias("v"))
    mu_rows = (flat.groupBy("dim").agg(F.avg("v").alias("mu"))
               .collect())  # O(dims) driver fetch, corpus-size-independent
    mu = np.zeros(dim)
    for r in mu_rows:
        mu[r["dim"]] = r["mu"]
    gram = (emb.select("embedding")
            .mapInPandas(_centered_gram_partials(mu), schema=_GRAM_SCHEMA)
            .groupBy("i", "j")
            .agg(F.sum("sxx").alias("sxx")))
    n = F.broadcast(emb.agg(F.count(F.lit(1)).alias("n")))
    return (gram.crossJoin(n)
            .select("i", "j", (F.col("sxx") / F.col("n")).alias("cov")))


@query(
    "embedding_covariance_matrix",
    oracle="""
    WITH flat AS (
        SELECT vec_id,
               unnest(range(0, len(embedding))) AS dim,
               unnest(list_transform(embedding, x -> CAST(x AS DOUBLE)))
                   AS v
        FROM embeddings),
    mu AS (SELECT dim, AVG(v) AS mu FROM flat GROUP BY dim),
    cnt AS (SELECT COUNT(*) AS n FROM embeddings),
    c AS (
        SELECT f.vec_id, f.dim, f.v - mu.mu AS v
        FROM flat f JOIN mu USING (dim)),
    xx AS (
        SELECT a.dim AS i, b.dim AS j, SUM(a.v * b.v) AS sxx
        FROM c a
        JOIN c b ON a.vec_id = b.vec_id AND a.dim <= b.dim
        GROUP BY a.dim, b.dim)
    SELECT xx.i, xx.j, ROUND(xx.sxx / cnt.n, 6) + 0.0 AS cov
    FROM xx CROSS JOIN cnt
    """,
)
def embedding_covariance_matrix(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Upper triangle of the corpus covariance matrix (see
    :func:`covariance_frame`).  The oracle recomputes it relationally
    (centered flat self-join on vec_id); both sides evaluate the same
    ``Σ(xᵢ−μᵢ)(xⱼ−μⱼ)/n`` tree in doubles, rounded to 6.  The
    ``+ 0.0`` on both sides canonicalizes IEEE −0.0 (DuckDB's ROUND
    keeps the sign of a tiny negative, Spark's drops it; −0.0 == 0.0
    numerically but repr-sorts differently in the driver's
    canonicalizer)."""
    return covariance_frame(spark, sf_dir).select(
        "i", "j", (F.round("cov", 6) + F.lit(0.0)).alias("cov"))


# rows-only: eigenvectors are not expressible in DuckDB SQL.  The value
# check lives in tests/test_linalg.py (numpy.linalg.eigh cross-check on
# the same fixture, plus alignment with the power-iteration top PC).
@query("pca_top_components_gram")
def pca_top_components_gram(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Top-2 principal components via the Gram-matrix path: one
    distributed pass builds the d×d covariance, the d×d collect
    (O(d²), corpus-size-independent — guarded by ``MAX_GRAM_DIM``) is
    eigendecomposed with LAPACK on the driver, exactly MLlib's
    ``computePrincipalComponents`` architecture.  Sign is fixed
    deterministically (largest-|component| entry positive).  Output:
    (pc, dim, component, explained_var_ratio) — 2·d rows, returned as
    a DataFrame so downstream projection joins it back distributed.

    Rows-only (eigenvectors aren't SQL-expressible), so the query
    carries its own EXECUTED audit: per pc, the eigen-equation
    residual ‖Cv − λv‖∞ against the DISTRIBUTED covariance (did eigh
    solve the matrix the cluster actually produced?) and an
    orthonormality check ‖v‖=1 ∧ v₀⊥v₁ — both emitted as columns and
    pytest-pinned, alongside the numpy.linalg.eigh fixture
    cross-check in tests/test_linalg.py."""
    cov_rows = (covariance_frame(spark, sf_dir)
                .collect())  # O(dims²) driver fetch, MAX_GRAM_DIM-guarded
    d = max(r["j"] for r in cov_rows) + 1
    c = np.zeros((d, d))
    for r in cov_rows:
        c[r["i"], r["j"]] = r["cov"]
        c[r["j"], r["i"]] = r["cov"]
    vals, vecs = np.linalg.eigh(c)     # ascending eigenvalues
    total = float(vals.sum())
    top = []
    for pc in range(2):
        idx = d - 1 - pc
        v = vecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        top.append((v, float(vals[idx])))
    ortho_ok = bool(
        abs(float(top[0][0] @ top[0][0]) - 1.0) < 1e-9
        and abs(float(top[1][0] @ top[1][0]) - 1.0) < 1e-9
        and abs(float(top[0][0] @ top[1][0])) < 1e-9)
    out = []
    for pc, (v, lam) in enumerate(top):
        resid = float(np.max(np.abs(c @ v - lam * v)))
        resid_ok = resid < 1e-6 * max(1.0, abs(lam))
        out.extend((pc, dim, round(float(v[dim]), 6),
                    round(lam / total, 6), round(resid, 9),
                    bool(resid_ok and ortho_ok))
                   for dim in range(d))
    return spark.createDataFrame(
        out, "pc int, dim int, component double, "
             "explained_var_ratio double, eigen_residual double, "
             "audit_ok boolean")


# rows-only: depends on the eigh components (not SQL-expressible).  The
# value check is tests/test_linalg.py::test_pca_projection_matches_numpy.
@query("embedding_pca_projection")
def embedding_pca_projection(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Project every embedding onto the Gram-path top-2 principal
    components: (vec_id, pc, projection) in long form — the 2-D map of
    the corpus used for visual QA, density-based outlier review, and as
    the whitened feature pair downstream clustering consumes.

    The components frame (2·d rows, from the driver-side eigh) joins
    back BROADCAST onto the exploded centered vectors, so the
    projection is one map-side multiply plus one partial-aggregated
    reduce on (vec_id, pc) — the corpus never re-collects; this is the
    "returned as a DataFrame so downstream projection joins it back
    distributed" path promised by pca_top_components_gram.

    Rows-only (depends on the eigh components), so the query carries
    its own EXECUTED audit as two constant columns: centered data must
    project to (numerically) zero mean per pc, and the projection
    variance must rank pc0 ≥ pc1 — exactly the eigenvalue order.  A
    wrong centering, a transposed component join, or swapped PCs flips
    one of them; pytest pins both true."""
    comps = F.broadcast(pca_top_components_gram(spark, sf_dir)
                        .select("pc", F.col("dim").cast("int").alias("pos"),
                                "component"))
    emb = ptable(spark, sf_dir, "embeddings")
    flat = emb.select("vec_id",
                      F.posexplode("embedding").alias("pos", "f")) \
              .select("vec_id", "pos",
                      F.col("f").cast("double").alias("v"))
    mu = F.broadcast(flat.groupBy("pos").agg(F.avg("v").alias("mu")))
    proj = (flat.join(mu, "pos").join(comps, "pos")
            .groupBy("vec_id", "pc")
            .agg(F.round(F.sum((F.col("v") - F.col("mu"))
                               * F.col("component")), 6)
                 .alias("projection")))
    stats = proj.groupBy("pc").agg(
        F.avg("projection").alias("m"),
        F.var_pop("projection").alias("s2"))
    audit = F.broadcast(stats.agg(
        F.max(F.abs(F.col("m"))).alias("max_abs_mean"),
        F.max(F.when(F.col("pc") == 0, F.col("s2"))).alias("v0"),
        F.max(F.when(F.col("pc") == 1, F.col("s2"))).alias("v1"))
        .select((F.col("max_abs_mean") <= 1e-3).alias("mean_centered_ok"),
                (F.col("v0") >= F.col("v1")).alias("var_rank_ok")))
    return proj.crossJoin(audit)
