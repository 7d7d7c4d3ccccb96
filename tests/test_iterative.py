"""Convergence runner (operators/iterative.py) + its consumers:
early stop, flat plan depth under checkpointing, the two CC
implementations' equivalence, and the converged-k-means/unrolled twin
identity."""
from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from etl_cloud_batch_processing_spark.operators.iterative import (
    FixpointResult,
    changed_count_metric,
    iterate_to_fixpoint,
)


def test_runner_stops_at_fixpoint_not_max_rounds(spark):
    """A step that stabilizes after 3 rounds must stop there, flagged
    converged, even with a much larger round budget."""
    state = spark.createDataFrame([(i,) for i in range(8)], "v bigint") \
        .localCheckpoint(eager=True)

    def step(df):
        # halve (integer) until everything reaches 0: 7 -> 3 -> 1 -> 0
        return df.select((F.col("v") / 2).cast("bigint").alias("v"))

    def metric(old, new):
        return float(new.agg(F.sum("v")).first()[0] or 0)

    res = iterate_to_fixpoint(state, step, metric, tol=0.0,
                              max_rounds=50, checkpoint_every=2)
    assert isinstance(res, FixpointResult)
    assert res.converged
    assert res.rounds == 3
    assert res.final_metric == 0.0
    assert res.state.agg(F.max("v")).first()[0] == 0


def test_runner_max_rounds_cut_reports_not_converged(spark):
    state = spark.createDataFrame([(1,)], "v bigint")
    res = iterate_to_fixpoint(
        state, lambda df: df.select((F.col("v") + 1).alias("v")),
        lambda old, new: 1.0, tol=0.0, max_rounds=3)
    assert not res.converged
    assert res.rounds == 3
    assert res.state.first()["v"] == 4


def test_runner_checkpoint_keeps_plan_depth_flat(spark):
    """Without lineage truncation the plan grows per round; with
    checkpointing every round, the analyzed-plan size at round r is
    independent of r."""
    state = spark.createDataFrame([(i,) for i in range(4)], "v bigint")
    sizes: list[int] = []

    def on_round(r, df, m):
        sizes.append(len(df._jdf.queryExecution().analyzed().toString()))

    iterate_to_fixpoint(
        state, lambda df: df.select((F.col("v") + 1).alias("v")),
        lambda old, new: 1.0, tol=-1.0, max_rounds=6,
        checkpoint_every=1, on_round=on_round)
    assert len(sizes) == 6
    # expression-id digit counts can drift the string by a few chars;
    # anything beyond that means lineage is accumulating
    assert max(sizes) - min(sizes) <= 8, \
        f"plan size grew across rounds: {sizes}"


def test_runner_uncheckpointed_plan_grows(spark):
    """Control for the flatness test: with checkpointing effectively
    disabled (one truncation at the very end), the analyzed plan DOES
    grow — proving the flat sizes above come from the truncation, not
    from a trivially-constant step."""
    state = spark.createDataFrame([(i,) for i in range(4)], "v bigint")
    sizes: list[int] = []

    def on_round(r, df, m):
        sizes.append(len(df._jdf.queryExecution().analyzed().toString()))

    iterate_to_fixpoint(
        state, lambda df: df.select((F.col("v") + 1).alias("v")),
        lambda old, new: 1.0, tol=-1.0, max_rounds=5,
        checkpoint_every=5, on_round=on_round)
    assert sizes[3] > sizes[0]  # rounds 1-4 are persist-only: growing
    assert sizes[4] < sizes[3]  # round 5 checkpoints: truncated back


def test_changed_count_metric(spark):
    old = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, lab string")
    new = spark.createDataFrame([(1, "a"), (2, "c")], "id bigint, lab string")
    assert changed_count_metric("id", "lab")(old, new) == 1.0


def _brute_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    nodes = {u for e in edges for u in e}
    comp = {u: u for u in nodes}

    def find(u):
        while comp[u] != u:
            comp[u] = comp[comp[u]]
            u = comp[u]
        return u

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            comp[max(ru, rv)] = min(ru, rv)
    return {u: find(u) for u in nodes}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_star_cc_matches_minlabel_cc_on_random_graphs(spark, seed):
    """large-star/small-star and min-label propagation must label every
    vertex with the same component minimum (both checked against a
    driver-side union-find)."""
    from etl_cloud_batch_processing_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(seed)
    n = 40
    edges = sorted({(rng.randrange(n), rng.randrange(n))
                    for _ in range(35)})
    edges = [(u, v) for u, v in edges if u != v]
    expect = _brute_components(edges)

    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    star = {r["id"]: r["comp"]
            for r in connected_components_star(e).collect()}
    assert star == expect

    sym = e.unionByName(e.select(F.col("dst").alias("src"),
                                 F.col("src").alias("dst")))
    minlabel = {r["id"]: r["comp"]
                for r in connected_components(sym).collect()}
    assert minlabel == expect


def test_star_cc_deep_chain_converges_fast(spark):
    """A path graph (worst diameter case) must still resolve — and in
    far fewer rounds than its diameter, the algorithm's whole point."""
    from etl_cloud_batch_processing_spark.operators import graph as G

    n = 33
    chain = [(i, i + 1) for i in range(n - 1)]
    e = spark.createDataFrame(chain, "src bigint, dst bigint")

    rounds = {"n": 0}
    orig = G.iterate_to_fixpoint

    def counting(*args, **kwargs):
        res = orig(*args, **kwargs)
        rounds["n"] = res.rounds
        return res

    G.iterate_to_fixpoint = counting
    try:
        labels = {r["id"]: r["comp"]
                  for r in G.connected_components_star(e).collect()}
    finally:
        G.iterate_to_fixpoint = orig
    assert labels == {i: 0 for i in range(n)}
    assert rounds["n"] <= 8, f"O(log d) contraction broken: {rounds}"


def test_near_dup_clusters_converged_equals_minlabel_query(spark, sf_dir):
    from etl_cloud_batch_processing_spark.operators.dedup import (
        near_dup_clusters,
        near_dup_clusters_converged,
    )

    a = {tuple(r) for r in near_dup_clusters(spark, sf_dir).collect()}
    b = {tuple(r)
         for r in near_dup_clusters_converged(spark, sf_dir).collect()}
    assert a == b


def test_kmeans_converged_equals_unrolled_twin(spark, sf_dir):
    """With the tolerance below any real fixture shift, the runner must
    execute the full 2 rounds and reproduce the unrolled plan's rows."""
    from etl_cloud_batch_processing_spark.operators.similarity import (
        kmeans_converged_centroids,
        kmeans_lloyd_centroids,
    )

    a = {tuple(r) for r in kmeans_lloyd_centroids(spark, sf_dir).collect()}
    b = {tuple(r)
         for r in kmeans_converged_centroids(spark, sf_dir).collect()}
    assert a == b


def test_kmeans_converged_early_stops_on_degenerate_corpus(spark):
    """A corpus that IS its seeds converges at round 1: the update
    returns the seeds unchanged, the shift is exactly 0, and the runner
    stops with one round to spare."""
    from etl_cloud_batch_processing_spark.operators.similarity import (
        kmeans_converged,
    )

    rows = [(i, [float(i), float(-i)]) for i in range(3)]
    emb = spark.createDataFrame(rows, "vec_id bigint, emb array<double>")
    res = kmeans_converged(emb, 3, tol=1e-12, max_rounds=5, dim=2)
    assert res.converged
    assert res.rounds == 1
    got = {r["cid"]: (r["n_members"], tuple(r["cvec"]))
           for r in res.state.collect()}
    assert got == {0: (1, (0.0, 0.0)), 1: (1, (1.0, -1.0)),
                   2: (1, (2.0, -2.0))}
