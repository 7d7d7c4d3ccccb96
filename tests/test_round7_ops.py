"""Round-7 additions beyond the tokenization/survival modules:
postings stats, strict funnel, source entropy, LPA communities,
weekday-adjusted anomalies."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_cloud_batch_processing_spark.operators.dedup import (
    dup_graph_lpa_communities,
    near_dup_clusters,
)
from etl_cloud_batch_processing_spark.plans.corpus import (
    source_token_entropy,
)
from etl_cloud_batch_processing_spark.plans.drift import (
    weekday_adjusted_anomalies,
)
from etl_cloud_batch_processing_spark.plans.filtering import (
    postings_index_stats,
)
from etl_cloud_batch_processing_spark.plans.temporal import (
    strict_funnel_with_timeouts,
)


def test_strict_funnel_monotone(spark, sf_dir):
    """Stage populations can only shrink; conversions are in [0, 1]."""
    rows = sorted(strict_funnel_with_timeouts(spark, sf_dir).collect(),
                  key=lambda r: r["stage"])
    assert [r["stage"] for r in rows] == [1, 2, 3]
    assert rows[0]["conversion_from_prev"] is None
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_users"] <= prev["n_users"]
        if cur["conversion_from_prev"] is not None:
            assert 0.0 <= cur["conversion_from_prev"] <= 1.0


def test_strict_funnel_tighter_than_unordered(spark, sf_dir):
    """The ordered+timeout stage-3 population is a subset of users who
    merely have all three event types."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    loose = (ev.filter(F.col("event_type").isin("signup", "click",
                                                "purchase"))
             .groupBy("user_id")
             .agg(F.countDistinct("event_type").alias("k"))
             .filter("k = 3").count())
    rows = {r["stage"]: r["n_users"]
            for r in strict_funnel_with_timeouts(spark, sf_dir).collect()}
    assert rows[3] <= loose


def test_postings_stats_invariants(spark, sf_dir):
    for r in postings_index_stats(spark, sf_dir).collect():
        assert 1 <= r["doc_freq"] <= r["coll_freq"]
        assert r["min_doc"] <= r["max_doc"]
        if r["doc_freq"] > 1:
            # mean gap spans the docid range over df-1 steps
            assert math.isclose(
                r["avg_docid_gap"],
                round((r["max_doc"] - r["min_doc"])
                      / (r["doc_freq"] - 1), 6), abs_tol=1e-9)
        else:
            assert r["avg_docid_gap"] is None


def test_source_entropy_bounds(spark, sf_dir):
    """0 <= H <= ln(types); effective vocab = exp(H) in [1, types];
    evenness in (0, 1]."""
    for r in source_token_entropy(spark, sf_dir).collect():
        hmax = math.log(r["n_types"])
        assert -1e-9 <= r["entropy_nats"] <= hmax + 1e-6
        assert 1.0 - 1e-6 <= r["effective_vocab"] <= r["n_types"] + 1e-6
        if r["n_types"] > 1:
            assert 0.0 < r["evenness"] <= 1.0 + 1e-9


def test_lpa_communities_refine_connected_components(spark, sf_dir):
    """Every LPA community lies inside ONE connected component (mode
    propagation can split a component, never bridge two), and
    community sizes account for every document."""
    cc = {r["doc_id"]: r["cluster_id"]
          for r in near_dup_clusters(spark, sf_dir).collect()}
    rows = dup_graph_lpa_communities(spark, sf_dir).collect()
    assert len(rows) == len(cc)
    by_comm: dict[int, set[int]] = {}
    for r in rows:
        by_comm.setdefault(r["community_id"], set()).add(r["doc_id"])
    for comm, members in by_comm.items():
        assert len({cc[d] for d in members}) == 1, comm
    sizes = {r["community_id"]: r["community_size"] for r in rows}
    for comm, members in by_comm.items():
        # singleton docs outside the edge list report size 1
        assert sizes[comm] in (len(members), 1)


def test_weekday_anomalies_zscore_reference(spark, sf_dir):
    """Spot-check the within-dow z against a pandas recomputation."""
    rows = weekday_adjusted_anomalies(spark, sf_dir).collect()
    assert rows
    import collections
    groups = collections.defaultdict(list)
    for r in rows:
        groups[(r["event_type"], r["dow"])].append(r["n_events"])
    for r in rows[:50]:
        ys = groups[(r["event_type"], r["dow"])]
        n, sx = len(ys), sum(ys)
        sxx = sum(y * y for y in ys)
        den2 = n * sxx - sx * sx
        if den2 == 0:
            assert r["z_within_dow"] is None
        else:
            z = (r["n_events"] * n - sx) / math.sqrt(den2)
            assert math.isclose(r["z_within_dow"], round(z, 6),
                                abs_tol=1e-9)
            assert r["is_anomaly"] == (abs(z) > 2.0)
