"""FWHT rotation + filtered-search invariants (functions/vectors.py
fwht_df, operators/similarity.py vector_fwht_rotation_fidelity,
plans/llm.py knn_filtered_topk)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from etl_cloud_batch_processing_spark.functions import vectors as V
from etl_cloud_batch_processing_spark.plans.llm import KNN_FILTER_LABELS
from etl_cloud_batch_processing_spark.plans.registry import REGISTRY

from tests.test_plans import SF, plan_of


def _run(spark, name):
    return REGISTRY[name].builder(spark, SF).toPandas()


def test_fwht_matches_numpy_hadamard_and_preserves_norms(spark):
    rng = np.random.RandomState(7)
    vecs = rng.uniform(-1, 1, size=(8, 16)).round(3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(vecs)],
        "id int, v array<double>")
    out = V.fwht_df(df, "v", "r", 16).orderBy("id").toPandas()
    # numpy reference: Hadamard via the same butterfly
    ref = vecs.copy()
    bit = 1
    while bit < 16:
        nxt = ref.copy()
        for i in range(16):
            j = i ^ bit
            nxt[:, i] = (ref[:, i] + ref[:, j] if (i & bit) == 0
                         else ref[:, j] - ref[:, i])
        ref = nxt
        bit *= 2
    ref /= 4.0
    got = np.array([row for row in out.r])
    assert np.allclose(got, ref, atol=1e-12)
    # orthonormal: norms preserved exactly up to float error
    assert np.allclose(np.linalg.norm(got, axis=1),
                       np.linalg.norm(vecs, axis=1), atol=1e-9)


def test_fwht_is_an_involution(spark):
    # H(Hx) = x for the normalized transform
    df = spark.createDataFrame(
        [(0, [float(i) for i in range(64)])], "id int, v array<double>")
    once = V.fwht_df(df, "v", "h", 64)
    twice = V.fwht_df(once, "h", "hh", 64).toPandas()
    assert np.allclose(twice.hh.iloc[0], np.arange(64.0), atol=1e-9)


def test_rotation_fidelity_errors_nonnegative_and_gain_consistent(spark):
    pdf = _run(spark, "vector_fwht_rotation_fidelity")
    assert (pdf.recon_err_raw >= 0).all()
    assert (pdf.recon_err_rot >= 0).all()
    assert np.allclose(pdf.rot_gain,
                       (pdf.recon_err_raw - pdf.recon_err_rot).round(6),
                       atol=1e-9)


def test_filtered_knn_respects_predicate_and_k(spark):
    pdf = _run(spark, "knn_filtered_topk")
    assert set(pdf.label).issubset(set(KNN_FILTER_LABELS))
    assert (pdf.rnk <= 5).all()
    for _, grp in pdf.groupby("query_id"):
        assert list(sorted(grp.rnk)) == list(range(1, len(grp) + 1))
    # pre-filter semantics: every query still gets a full top-5 (the
    # predicate is not so selective the candidate pool runs dry)
    assert (pdf.groupby("query_id").size() == 5).all()


def test_filtered_knn_pushes_label_filter_into_scan(spark):
    plan = plan_of(spark, "knn_filtered_topk")
    assert "PushedFilters" in plan
    assert "label" in plan.split("PushedFilters", 2)[-1][:600] or \
        "In(label" in plan


def test_rotation_plan_has_no_explode_matmul(spark):
    # the rotation must be transform projections, never a d×d join:
    # one scan, no cartesian, no window
    plan = plan_of(spark, "vector_fwht_rotation_fidelity")
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert plan.count("InMemoryFileIndex") == 1
