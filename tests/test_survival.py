"""Round-7 survival family (plans/survival.py): Kaplan-Meier curves,
stratified curves, RMST — invariants plus a pure-Python KM reference."""

from __future__ import annotations

import math

from etl_cloud_batch_processing_spark.plans.survival import (
    SURVIVAL_HORIZON_DAYS,
    _durations,
    conversion_rmst_by_cohort,
    conversion_survival_by_cohort,
    conversion_survival_km,
)


def km_reference(durs: list[tuple[int, bool]]) -> list[tuple[int, int, int, float]]:
    """(t, n_at_risk, d, survival) per death time, textbook KM."""
    death_ts = sorted({t for t, died in durs if died})
    out, s = [], 1.0
    for t in death_ts:
        n = sum(1 for td, _ in durs if td >= t)
        d = sum(1 for td, died in durs if died and td == t)
        s *= 1.0 - d / n
        out.append((t, n, d, s))
    return out


def test_km_matches_python_reference(spark, sf_dir):
    durs = [(r["t"], r["died"])
            for r in _durations(spark, sf_dir).collect()]
    ref = km_reference(durs)
    got = sorted((r["t_days"], r["n_at_risk"], r["n_events"], r["survival"])
                 for r in conversion_survival_km(spark, sf_dir).collect())
    assert len(got) == len(ref)
    for (t, n, d, s), (gt, gn, gd, gs) in zip(ref, got):
        assert (t, n, d) == (gt, gn, gd)
        assert math.isclose(round(s, 6), gs, abs_tol=1e-9)


def test_km_curve_invariants(spark, sf_dir):
    rows = sorted(conversion_survival_km(spark, sf_dir).collect(),
                  key=lambda r: r["t_days"])
    prev_s, prev_n = 1.0 + 1e-12, None
    for r in rows:
        assert 0 <= r["t_days"] <= SURVIVAL_HORIZON_DAYS
        assert 1 <= r["n_events"] <= r["n_at_risk"]
        assert 0.0 <= r["survival"] <= prev_s  # non-increasing
        assert 0.0 <= r["hazard"] <= 1.0
        if prev_n is not None:
            assert r["n_at_risk"] <= prev_n  # risk set shrinks
        prev_s, prev_n = r["survival"], r["n_at_risk"]


def test_stratified_curves_partition_the_population(spark, sf_dir):
    """Per-cohort at-risk at the first death day sums to <= total
    users (cohorts with no deaths contribute no curve), and each
    cohort's curve obeys the same invariants as the pooled one."""
    durs = _durations(spark, sf_dir).collect()
    by_cohort: dict[str, list[tuple[int, bool]]] = {}
    for r in durs:
        by_cohort.setdefault(r["cohort"], []).append((r["t"], r["died"]))
    rows = conversion_survival_by_cohort(spark, sf_dir).collect()
    for cohort, sub in by_cohort.items():
        ref = km_reference(sub)
        got = sorted(((r["t_days"], r["n_at_risk"], r["n_events"],
                       r["survival"])
                      for r in rows if r["cohort"] == cohort))
        assert len(got) == len(ref), cohort
        for (t, n, d, s), (gt, gn, gd, gs) in zip(ref, got):
            assert (t, n, d) == (gt, gn, gd), cohort
            assert math.isclose(round(s, 6), gs, abs_tol=1e-9), cohort


def test_rmst_bounds_and_accounting(spark, sf_dir):
    """RMST is the area under a [0,1] step function over the horizon:
    0 <= rmst <= H; converted + censored == total; a cohort where
    everyone converts on day 0 has rmst 0."""
    rows = conversion_rmst_by_cohort(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_converted"] + r["n_censored"] == r["n_total"]
        assert 0.0 <= r["rmst_days"] <= SURVIVAL_HORIZON_DAYS


def test_logrank_accounting(spark, sf_dir):
    """Sum of expected conversions equals sum of observed (both equal
    total pooled deaths — exactly before term rounding, within 1e-4
    after), and every chi2 term is non-negative."""
    from etl_cloud_batch_processing_spark.plans.survival import (
        survival_logrank_test,
    )
    rows = survival_logrank_test(spark, sf_dir).collect()
    total_o = sum(r["observed"] for r in rows)
    total_e = sum(r["expected"] for r in rows)
    durs = _durations(spark, sf_dir).collect()
    assert total_o == sum(1 for r in durs if r["died"])
    assert abs(total_e - total_o) < 1e-3
    for r in rows:
        assert r["chi2_term"] >= 0.0
        assert 0 <= r["observed"] <= r["n_total"]
