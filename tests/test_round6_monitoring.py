"""Semantic + plan checks for the round-6 monitoring/engagement batch:
Bollinger bands, max drawdown, DAU/MAU stickiness, funnel velocity,
systematic sampling, null-rate drift, cluster-size histogram."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from etl_cloud_batch_processing_spark.plans.registry import REGISTRY, table

from tests.test_plans import SF, plan_of


def _run(spark, name):
    return REGISTRY[name].builder(spark, SF).toPandas()


# ------------------------------------------------------------------ values

def test_bollinger_bands_numpy_crosscheck(spark):
    pdf = _run(spark, "value_bollinger_breakouts")
    ev = table(spark, SF, "events").toPandas()
    ev["day"] = ev.ts.dt.date
    ev["cents"] = np.floor(ev.value * 100)
    for (etype, _), _grp in [((e, None), None) for e in pdf.event_type.unique()][:2]:
        grp = ev[ev.event_type == etype].groupby("day").cents.agg(["sum", "count"])
        dm = (grp["sum"] / (grp["count"] * 100)).sort_index()
        got = pdf[pdf.event_type == etype].sort_values("day")
        # trailing-7 mean matches a pandas rolling mean
        want_mid = dm.rolling(7, min_periods=1).mean()
        assert np.allclose(got.band_mid.to_numpy(),
                           want_mid.round(6).to_numpy(), atol=1e-5)
    # sigma nonnegative; breakouts only on full windows
    assert (pdf.band_sigma >= 0).all()
    first_days = pdf.sort_values("day").groupby("event_type").head(6)
    assert not first_days.is_breakout.any()


def test_max_drawdown_is_peak_minus_trough(spark):
    pdf = _run(spark, "value_max_drawdown")
    assert (pdf.max_drawdown >= 0).all()
    assert np.allclose(pdf.max_drawdown,
                       (pdf.peak_total - pdf.trough_total).round(6),
                       atol=1e-6)


def test_stickiness_bounds_and_first_day_identity(spark):
    pdf = _run(spark, "stickiness_dau_mau").sort_values("day")
    assert ((pdf.stickiness > 0) & (pdf.stickiness <= 1.000001)).all()
    assert (pdf.mau >= pdf.dau).all()
    # on the first observed day the trailing window holds only that day
    first = pdf.iloc[0]
    assert first.dau == first.mau
    assert math.isclose(first.stickiness, 1.0, abs_tol=1e-6)


def test_funnel_velocity_orders_and_percentiles(spark):
    pdf = _run(spark, "funnel_time_to_convert")
    assert (pdf.n_converted > 0).all()
    assert (pdf.median_days >= 0).all()
    assert (pdf.p90_days >= pdf.median_days).all()


def test_systematic_sample_stride_and_coverage(spark):
    pdf = _run(spark, "systematic_event_sample")
    assert ((pdf.rn - 1) % 10 == 0).all()
    # every user with >=1 event contributes their rank-1 event
    n_users = (table(spark, SF, "events")
               .select("user_id").distinct().count())
    assert (pdf.rn == 1).sum() == n_users


def test_null_rate_drift_is_consistent(spark):
    pdf = _run(spark, "null_rate_drift")
    assert set(pdf.col_name) == {"value", "props", "event_type"}
    for _, r in pdf.iterrows():
        assert math.isclose(
            r.drift, round(round(r.n_nulls_b / r.n_b, 6)
                           - round(r.n_nulls_a / r.n_a, 6), 6),
            abs_tol=1e-6)


def test_cluster_sizes_conserve_the_corpus(spark):
    pdf = _run(spark, "near_dup_cluster_sizes")
    labeled = _run(spark, "near_dup_clusters")
    assert (pdf.cluster_size * pdf.n_clusters == pdf.n_docs_covered).all()
    assert pdf.n_docs_covered.sum() == len(labeled)
    assert math.isclose(pdf.corpus_share.sum(), 1.0, abs_tol=1e-3)
    # removable = covered minus one canonical per cluster
    removable = (pdf.n_docs_covered - pdf.n_clusters).sum()
    assert removable == (~labeled.is_canonical).sum()


# ------------------------------------------------------------------- plans

def test_band_and_drawdown_windows_run_on_day_grain(spark):
    import re

    for name in ("value_bollinger_breakouts", "value_max_drawdown"):
        plan = plan_of(spark, name)
        agg_ids = [int(m) for m in re.findall(r"HashAggregate \((\d+)\)",
                                              plan)]
        win_ids = [int(m) for m in re.findall(r"Window \((\d+)\)", plan)]
        assert agg_ids and win_ids, name
        assert min(agg_ids) < min(win_ids), \
            f"{name}: window must consume the day-grain aggregate"


def test_stickiness_is_contribution_explode_not_rescan(spark):
    plan = plan_of(spark, "stickiness_dau_mau")
    assert "Generate" in plan          # the 28-day contribution explode
    assert "CartesianProduct" not in plan
    assert plan.count("InMemoryFileIndex") == 1


def test_systematic_sample_single_window_no_join(spark):
    plan = plan_of(spark, "systematic_event_sample")
    assert "Join" not in plan
    assert plan.count("Window") >= 1


# ----------------------------------------------------------- audio part 2

def test_zcr_bounds_and_manual_crosscheck(spark):
    import numpy as np

    pdf = _run(spark, "audio_zero_crossing_rate")
    ok = pdf[pdf.n_samples > 1]
    assert ((ok.zcr >= 0) & (ok.zcr <= 1)).all()
    # manual recompute for one media item from the raw text payload
    doc = (table(spark, SF, "documents")
           .filter(F.col("doc_id") == int(pdf.media_id.iloc[0]))
           .toPandas().iloc[0])
    s = np.frombuffer(doc.text.encode(), np.uint8)
    fr = s[:64]
    pos = fr >= 128
    want = round(int(np.count_nonzero(pos[:-1] != pos[1:]))
                 / (fr.size - 1), 6)
    got = pdf[(pdf.media_id == doc.doc_id)
              & (pdf.frame_idx == 0)].zcr.iloc[0]
    assert abs(got - want) < 1e-9


def test_low_energy_runs_cover_exactly_the_low_frames(spark):
    from etl_cloud_batch_processing_spark.operators.multimodal import (
        AUDIO_LOW_RMS, AUDIO_STRIDE)

    runs = _run(spark, "audio_low_energy_runs")
    energy = _run(spark, "audio_frame_energy")
    # runs are well-formed and non-overlapping per media item
    assert (runs.start_frame <= runs.end_frame).all()
    assert (runs.n_frames ==
            (runs.end_frame - runs.start_frame) // AUDIO_STRIDE + 1).all()
    # total frames in runs == total sampled low-energy frames (the
    # rounded display rms equals the decision rms to well under the
    # threshold's distance from any observed value)
    n_low = (energy.rms < AUDIO_LOW_RMS).sum()
    assert runs.n_frames.sum() == n_low


# -------------------------------------------------------- Lorenz / Gini

def test_gini_matches_manual_lorenz(spark):
    import numpy as np

    pdf = _run(spark, "revenue_concentration_gini").sort_values("decile")
    o = table(spark, SF, "orders").toPandas()
    o["cents"] = np.floor(o.o_totalprice * 100)
    rev = o.groupby("o_custkey").cents.sum().sort_values().to_numpy()
    n = len(rev)
    i = np.arange(1, n + 1)
    want_gini = round(2 * float((i * rev).sum())
                      / (n * float(rev.sum())) - (n + 1) / n, 6)
    assert abs(pdf.gini.iloc[0] - want_gini) < 1e-6
    assert (pdf.gini == pdf.gini.iloc[0]).all()
    # Lorenz properties: shares sum to 1, cumulative is monotone and
    # convex (ascending deciles contribute increasing shares)
    assert math.isclose(pdf.revenue_share.sum(), 1.0, abs_tol=1e-4)
    assert (pdf.cum_share.diff().dropna() > 0).all()
    assert (pdf.revenue_share.diff().dropna() >= -1e-9).all()
    assert math.isclose(pdf.cum_share.iloc[-1], 1.0, abs_tol=1e-4)


# ------------------------------------------------- optimizer diagnostics

def test_cardinality_estimates_are_exact_for_fk_joins(spark):
    pdf = _run(spark, "join_cardinality_estimates").set_index("join_name")
    # FK→PK joins: every fact row matches exactly once, so the actual
    # equals the fact side and the containment estimate is exact
    oc = pdf.loc["orders_customer"]
    assert oc.actual_rows == oc.n_left
    assert oc.est_rows == oc.actual_rows
    assert abs(oc.est_over_actual - 1.0) < 1e-6
    lp = pdf.loc["lineitem_part"]
    assert lp.actual_rows == lp.n_left
    assert abs(lp.est_over_actual - 1.0) < 1e-6
    # side stats are sane
    assert (pdf.ndv_left <= pdf.n_left).all()
    assert (pdf.ndv_right <= pdf.n_right).all()
