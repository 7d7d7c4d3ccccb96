"""Semantic invariants + plan-shape regressions for plans/profiling.py.

Cross-engine value parity is covered by test_parity.py (every
registered oracle) — these pin what the profile numbers must MEAN and
what the plans must look like at scale."""

from __future__ import annotations

import math

from etl_cloud_batch_processing_spark.plans.registry import REGISTRY

from tests.test_plans import SF, plan_of


def _run(spark, name):
    return REGISTRY[name].builder(spark, SF).toPandas()


# ------------------------------------------------------------------ values

def test_column_profile_covers_every_column_consistently(spark):
    pdf = _run(spark, "column_profile_events")
    assert sorted(pdf.col_name) == sorted(
        ["event_id", "ts", "user_id", "event_type", "value", "props"])
    # one n_rows for the whole table, bounds respected per column
    assert pdf.n_rows.nunique() == 1
    n = pdf.n_rows.iloc[0]
    assert ((pdf.n_nulls >= 0) & (pdf.n_nulls <= n)).all()
    assert ((pdf.n_distinct >= 1) & (pdf.n_distinct <= n)).all()
    # event_id is the table key: distinct == rows, no nulls
    key = pdf[pdf.col_name == "event_id"].iloc[0]
    assert key.n_distinct == n and key.n_nulls == 0
    # numeric columns carry min <= max; strings carry NULLs
    num = pdf[pdf.col_name.isin(["event_id", "user_id", "value"])]
    assert (num.min_num <= num.max_num).all()
    assert pdf[pdf.col_name == "event_type"].min_num.isna().all()


def test_top_values_ranks_and_shares(spark):
    pdf = _run(spark, "top_values_profile")
    assert set(pdf.col_name) == {"lang", "source"}
    for _, grp in pdf.groupby("col_name"):
        grp = grp.sort_values("rnk")
        assert list(grp.rnk) == list(range(1, len(grp) + 1))
        # ranked by count descending; shares are probabilities
        assert (grp.n.diff().dropna() <= 0).all()
        assert ((grp.share > 0) & (grp.share <= 1)).all()


def test_ols_slope_numpy_crosscheck(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from etl_cloud_batch_processing_spark.plans.registry import table

    pdf = _run(spark, "daily_trend_ols").set_index("event_type")
    daily = (table(spark, SF, "events")
             .groupBy("event_type", F.to_date("ts").alias("day"))
             .count().toPandas())
    for etype, grp in daily.groupby("event_type"):
        y = grp.sort_values("day")["count"].to_numpy(dtype=float)
        t = np.arange(1, len(y) + 1, dtype=float)
        slope, intercept = np.polyfit(t, y, 1)
        assert math.isclose(pdf.loc[etype].slope, slope, abs_tol=1e-4)
        assert math.isclose(pdf.loc[etype].intercept, intercept,
                            abs_tol=1e-3)


def test_correlations_are_bounded(spark):
    pdf = _run(spark, "value_hour_correlation")
    assert (pdf.corr_value_hour.abs() <= 1.000001).all()
    assert (pdf.corr_value_dom.abs() <= 1.000001).all()
    assert (pdf.n_events > 0).all()


def test_correlation_numpy_crosscheck(spark):
    import numpy as np

    from etl_cloud_batch_processing_spark.plans.registry import table

    pdf = _run(spark, "value_hour_correlation").set_index("event_type")
    ev = table(spark, SF, "events").toPandas()
    ev["x"] = np.floor(ev.value * 100)
    ev["h"] = ev.ts.dt.hour
    ev["d"] = ev.ts.dt.day
    for etype, grp in ev.groupby("event_type"):
        want_h = np.corrcoef(grp.x, grp.h)[0, 1]
        want_d = np.corrcoef(grp.x, grp.d)[0, 1]
        assert math.isclose(pdf.loc[etype].corr_value_hour, want_h,
                            abs_tol=1e-5)
        assert math.isclose(pdf.loc[etype].corr_value_dom, want_d,
                            abs_tol=1e-5)


def test_markov_iterates_toward_a_distribution(spark):
    pdf = _run(spark, "markov_stationary_event_mix")
    for col in ("pi_1", "pi_2", "pi_3"):
        assert ((pdf[col] >= 0) & (pdf[col] <= 1)).all()
        assert math.isclose(pdf[col].sum(), 1.0, abs_tol=1e-4)
    # successive iterates move less: ||pi_3 - pi_2|| <= ||pi_2 - pi_1||
    d21 = (pdf.pi_2 - pdf.pi_1).abs().sum()
    d32 = (pdf.pi_3 - pdf.pi_2).abs().sum()
    assert d32 <= d21 + 1e-9


# ------------------------------------------------------------------- plans

def test_column_profile_is_one_aggregation_no_window_no_join(spark):
    plan = plan_of(spark, "column_profile_events")
    assert "Expand" in plan  # multi-distinct in ONE pass
    assert "Window" not in plan
    assert "Join" not in plan
    # one scan of the table feeds everything (the formatted explain
    # prints each scan once in the tree and once in the detail section)
    assert plan.count("InMemoryFileIndex") == 1


def test_top_values_windows_run_on_distinct_grain(spark):
    import re

    plan = plan_of(spark, "top_values_profile")
    agg_ids = [int(m) for m in re.findall(r"HashAggregate \((\d+)\)", plan)]
    win_ids = [int(m) for m in re.findall(r"Window \((\d+)\)", plan)]
    assert agg_ids and win_ids
    assert min(agg_ids) < min(win_ids), \
        "ranking must consume the aggregated values frame"


def test_ols_and_correlation_are_partial_agg_pipelines(spark):
    for name in ("daily_trend_ols", "value_hour_correlation"):
        plan = plan_of(spark, name)
        assert "partial" in plan, name
        assert "CartesianProduct" not in plan, name
    # correlation needs no window at all — pure aggregate closed form
    assert "Window" not in plan_of(spark, "value_hour_correlation")


def test_markov_iterations_join_bounded_frames(spark):
    plan = plan_of(spark, "markov_stationary_event_mix")
    assert "CartesianProduct" not in plan
    # the per-user lead window is the only corpus-scale stage
    assert plan.count("Window") >= 1


def test_ols3_matches_numpy_lstsq(spark, sf_dir):
    """Cramer-from-Gram must agree with numpy's QR-based lstsq on the
    same design matrix — pins the algebra, not just engine parity."""
    import numpy as np
    import pytest
    from etl_cloud_batch_processing_spark import plans
    from etl_cloud_batch_processing_spark.plans.registry import table
    got = {r["event_type"]: r for r in
           (plans.REGISTRY["ols_value_on_time_features"]
            .builder(spark, sf_dir).collect())}
    rows = (table(spark, sf_dir, "events")
            .selectExpr("event_type", "CAST(hour(ts) AS DOUBLE) AS h",
                        "CAST(dayofweek(ts) - 1 AS DOUBLE) AS d",
                        "CAST(ROUND(value * 100) AS DOUBLE) AS y")
            .collect())
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert set(by_type) == set(got)
    for t, rs in by_type.items():
        X = np.array([[1.0, r["h"], r["d"]] for r in rs])
        y = np.array([r["y"] for r in rs])
        beta = np.linalg.lstsq(X, y, rcond=None)[0]
        assert got[t]["intercept_cents"] == pytest.approx(beta[0], abs=1e-3)
        assert got[t]["coef_hour"] == pytest.approx(beta[1], abs=1e-3)
        assert got[t]["coef_dow"] == pytest.approx(beta[2], abs=1e-3)
        pred = X @ beta
        ss_res = float(((y - pred) ** 2).sum())
        ss_tot = float(((y - y.mean()) ** 2).sum())
        assert got[t]["r2"] == pytest.approx(1 - ss_res / ss_tot, abs=1e-4)
        assert 0.0 <= got[t]["r2"] <= 1.0


def test_logreg_converged_matches_numpy_newton(spark, sf_dir):
    """Replay the exact Newton/IRLS recurrence in numpy from the same
    feature matrix: coefficients, round count, and audits must agree."""
    import numpy as np
    import pytest
    from etl_cloud_batch_processing_spark import plans
    from etl_cloud_batch_processing_spark.plans.profiling import (
        _LR_MAX_ROUNDS, _LR_TOL, _logreg_features)
    got = {r["feature"]: r for r in
           (plans.REGISTRY["logreg_converged_coeffs"]
            .builder(spark, sf_dir).collect())}
    rows = _logreg_features(spark, sf_dir).collect()
    X = np.array([[1.0, r["x1"], r["x2"], r["x3"]] for r in rows])
    y = np.array([r["y"] for r in rows])
    b = np.zeros(4)
    rounds = 0
    for _ in range(_LR_MAX_ROUNDS):
        z = X @ b
        p = 1 / (1 + np.exp(-z))
        g = ((p - y)[:, None] * X).mean(axis=0)
        W = p * (1 - p)
        H = (X.T * W) @ X / len(y) + 1e-9 * np.eye(4)
        nb = b - np.linalg.solve(H, g)
        step_sz = np.abs(nb - b).max()
        b, rounds = nb, rounds + 1
        if step_sz <= _LR_TOL:
            break
    names = ["intercept", "hour_scaled", "dow_scaled", "value_scaled"]
    for i, name in enumerate(names):
        assert got[name]["coef"] == pytest.approx(b[i], abs=1e-4), name
    r0 = got["intercept"]
    assert r0["rounds"] == rounds
    assert r0["converged"]
    assert r0["loss_improved"] and r0["beats_prior_only"]
    z = X @ b
    ll = float(np.mean(np.where(y == 1, np.log1p(np.exp(-z)),
                                np.log1p(np.exp(-z)) + z)))
    assert r0["final_loss"] == pytest.approx(ll, abs=1e-4)
