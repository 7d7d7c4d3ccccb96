"""Semantic invariants + plan-shape regressions for plans/drift.py.

Cross-engine value parity is covered by test_parity.py (every
registered oracle) — these tests pin the STATISTICAL contracts (what
the numbers must mean) and the scale contracts (what the plans must
look like) that a green hash alone would not."""

from __future__ import annotations

import math

from etl_cloud_batch_processing_spark.plans.registry import REGISTRY

from tests.test_plans import SF, plan_of


def _run(spark, name):
    return REGISTRY[name].builder(spark, SF).toPandas()


# ------------------------------------------------------------------ values

def test_ks_stat_is_a_probability_gap(spark):
    pdf = _run(spark, "ks_value_drift")
    assert len(pdf) > 0
    assert ((pdf.ks_stat >= 0) & (pdf.ks_stat <= 1)).all()
    # the argmax value lies inside the observed value domain
    assert (pdf.ks_at_value >= 0).all()
    assert (pdf.n_a > 0).all() and (pdf.n_b > 0).all()


def test_chi2_contributions_nonnegative_and_shares_sum_to_one(spark):
    pdf = _run(spark, "chi2_type_mix_drift")
    assert (pdf.chi2_contrib >= 0).all()
    assert math.isclose(pdf.share_a.sum(), 1.0, abs_tol=1e-4)
    assert math.isclose(pdf.share_b.sum(), 1.0, abs_tol=1e-4)


def test_psi_terms_nonnegative_and_total_is_their_sum(spark):
    # (p_b - p_a) and ln(p_b/p_a) always share a sign, so every PSI
    # term — and hence the total — is >= 0 even with the share floor.
    pdf = _run(spark, "psi_value_drift")
    assert (pdf.psi_term >= 0).all()
    assert (pdf.psi_total >= 0).all()
    for _, grp in pdf.groupby("event_type"):
        assert math.isclose(grp.psi_term.sum(),
                            grp.psi_total.iloc[0], abs_tol=1e-5)


def test_benford_shares_partition_unity_per_type(spark):
    pdf = _run(spark, "benford_first_digit")
    assert pdf.digit.between(1, 9).all()
    for _, grp in pdf.groupby("event_type"):
        assert math.isclose(grp.obs_share.sum(), 1.0, abs_tol=1e-4)
    # expected shares are the Benford constants wherever a digit appears
    for d in range(1, 10):
        rows = pdf[pdf.digit == d]
        if len(rows):
            want = round(math.log10(1 + 1 / d), 6)
            assert (rows.benford_share - want).abs().max() < 1e-9


def test_acf_bounded_and_lag_pairs_shrink(spark):
    pdf = _run(spark, "daily_count_acf")
    assert pdf.lag.between(1, 7).all()
    # |r_k| <= 1 up to the display rounding
    assert (pdf.acf.abs() <= 1.000001).all()
    # lag-k pairing over an n-day series yields n-k pairs
    for _, grp in pdf.groupby("event_type"):
        n_days = grp.n_days.iloc[0]
        for _, row in grp.iterrows():
            assert row.n_pairs == n_days - row.lag


# ------------------------------------------------------------------- plans

def test_drift_aggregate_families_have_no_row_window(spark):
    # chi2 and benford are pure partial-agg pipelines: corpus-scale
    # work must be HashAggregate, never a per-row Window sort.
    for name in ("chi2_type_mix_drift", "benford_first_digit"):
        plan = plan_of(spark, name)
        assert "partial" in plan, name
        assert "Window" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_ks_window_runs_on_grid_grain_after_partial_agg(spark):
    # the cumulative-ECDF window must sit ABOVE the (type, grid) groupBy
    # (bounded rows), not over raw events.
    plan = plan_of(spark, "ks_value_drift")
    # formatted-explain node ids grow toward the root: the deepest
    # (earliest-executed) node is (1), so every HashAggregate id must
    # sit below every Window id for the window to consume the grid.
    import re
    agg_ids = [int(m) for m in re.findall(r"HashAggregate \((\d+)\)", plan)]
    win_ids = [int(m) for m in re.findall(r"Window \((\d+)\)", plan)]
    assert agg_ids and win_ids, plan
    assert min(agg_ids) < min(win_ids), "window must consume the aggregated grid"
    assert "CartesianProduct" not in plan


def test_psi_bin_edges_come_from_broadcast_one_row_frame(spark):
    plan = plan_of(spark, "psi_value_drift")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_acf_lag_join_is_equi_not_range(spark):
    # the lag pairing joins on (event_type, position-offset) equality —
    # a hash-joinable key, never a theta/range join over the series.
    plan = plan_of(spark, "daily_count_acf")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan
