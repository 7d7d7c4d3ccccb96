"""Value and guard tests for operators/linalg.py (Gram-path PCA)."""

from __future__ import annotations

import numpy as np
import pytest

from etl_cloud_batch_processing_spark.operators import linalg

SF = "/root/testdata/sf0.001"


def _dense(spark):
    return np.array(spark.read.parquet(f"{SF}/embeddings.parquet")
                    .toPandas()["embedding"].tolist(), dtype=np.float64)


def test_covariance_matches_numpy(spark):
    """One-pass distributed covariance == numpy population covariance."""
    x = _dense(spark)
    want = np.cov(x, rowvar=False, bias=True)
    got = linalg.covariance_frame(spark, SF).collect()
    assert len(got) == x.shape[1] * (x.shape[1] + 1) // 2
    for r in got:
        assert abs(r["cov"] - want[r["i"], r["j"]]) < 1e-9


def test_pca_gram_matches_numpy_eigh(spark):
    """Driver-side eigh on the distributed covariance == dense numpy
    PCA with the same sign convention (largest-|component| positive)."""
    x = _dense(spark)
    cov = np.cov(x, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    d = x.shape[1]
    rows = linalg.pca_top_components_gram(spark, SF).collect()
    assert len(rows) == 2 * d
    for pc in range(2):
        v = vecs[:, d - 1 - pc]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        ratio = float(vals[d - 1 - pc]) / float(vals.sum())
        got = {r["dim"]: r for r in rows if r["pc"] == pc}
        for dim in range(d):
            assert abs(got[dim]["component"] - v[dim]) < 2e-6
            assert abs(got[dim]["explained_var_ratio"] - ratio) < 2e-6


def test_gram_dim_guard_raises(spark, monkeypatch):
    monkeypatch.setattr(linalg, "MAX_GRAM_DIM", 8)
    with pytest.raises(ValueError, match="power_iter"):
        linalg.covariance_frame(spark, SF)


def test_covariance_plan_is_one_pandas_pass(spark):
    """The Gram stage must be a single mapInPandas over the scan — no
    cartesian product, no per-row Python UDF."""
    plan = (linalg.embedding_covariance_matrix(spark, SF)
            ._jdf.queryExecution().executedPlan().toString())
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan


def test_pca_projection_matches_numpy(spark):
    """Distributed projection onto the Gram-path PCs == dense numpy
    projection with the same sign convention (components are rounded
    to 6 decimals before the distributed multiply, so tolerance is
    d·1e-6·|x̃| plus float noise)."""
    x = _dense(spark)
    xc = x - x.mean(axis=0)
    cov = np.cov(x, rowvar=False, bias=True)
    _, vecs = np.linalg.eigh(cov)
    d = x.shape[1]
    rows = linalg.embedding_pca_projection(spark, SF).collect()
    assert len(rows) == 2 * x.shape[0]
    got = {(r["vec_id"], r["pc"]): r["projection"] for r in rows}
    for pc in range(2):
        v = vecs[:, d - 1 - pc]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        want = xc @ np.round(v, 6)
        for i in range(x.shape[0]):
            assert abs(got[(i, pc)] - want[i]) < 1e-4
