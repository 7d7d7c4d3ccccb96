"""Semantic + plan-shape checks for the round-6 operator additions:
dup-graph degree stats, RAKE keyphrases, interval coverage/overlap."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_cloud_batch_processing_spark.plans.registry import REGISTRY, table

from tests.test_plans import SF, plan_of


def _run(spark, name):
    return REGISTRY[name].builder(spark, SF).toPandas()


# ------------------------------------------------------------------ values

def test_degree_stats_agree_with_pair_list(spark):
    pairs = _run(spark, "simhash_hamming_pairs")
    import collections
    deg = collections.Counter()
    for _, r in pairs.iterrows():
        deg[r.doc_a] += 1
        deg[r.doc_b] += 1
    hist = collections.Counter(deg.values())
    pdf = _run(spark, "dup_graph_degree_stats")
    got = dict(zip(pdf.degree, pdf.n_nodes))
    assert got == dict(hist)
    # the assortativity curve is an average of real degrees
    assert (pdf.avg_neighbor_degree >= 1).all()
    assert (pdf.avg_neighbor_degree <= max(deg.values())).all()


def test_rake_phrases_are_stopword_free_and_ranked(spark):
    pdf = _run(spark, "keyword_rake_top_phrases")
    assert len(pdf) > 0
    for phrase in pdf.phrase:
        toks = phrase.split(" ")
        assert all(t not in ("a", "the") for t in toks)
    assert (pdf.n_words == pdf.phrase.str.split(" ").str.len()).all()
    assert (pdf.rake_score.diff().dropna() <= 1e-9).all()
    assert list(pdf.rnk) == list(range(1, len(pdf) + 1))
    # longer phrases accumulate more word scores: the top phrase is
    # at least as long as the median reported phrase
    assert pdf.n_words.iloc[0] >= pdf.n_words.median() - 1e-9


def test_daily_load_conserves_order_days(spark):
    pdf = _run(spark, "order_window_daily_load")
    o = (table(spark, SF, "orders")
         .filter((F.col("o_orderdate") >= "1997-01-01")
                 & (F.col("o_orderdate") < "1997-04-01"))
         .select((F.substring("o_orderpriority", 1, 1).cast("int") * 2)
                 .alias("dur")).toPandas())
    # every window contributes exactly dur covered days
    assert pdf.n_open_orders.sum() == o.dur.sum()
    assert (pdf.n_open_orders > 0).all()


def test_overlap_pairs_are_symmetric_consistent(spark):
    pdf = _run(spark, "overlapping_customer_orders")
    assert (pdf.order_a < pdf.order_b).all()
    # overlap of two windows is positive and bounded by the longer
    # possible duration (10 days)
    assert (pdf.overlap_days >= 1).all()
    assert (pdf.overlap_days <= 10).all()
    # no duplicate pair rows (the two UNION branches partition on
    # strict/non-strict start order)
    assert not pdf.duplicated(["custkey", "order_a", "order_b"]).any()


# ------------------------------------------------------------------- plans

def test_daily_load_is_explode_plus_agg(spark):
    plan = plan_of(spark, "order_window_daily_load")
    assert "Generate" in plan          # sequence explode
    assert "Join" not in plan          # never a day-spine BETWEEN join
    assert "Window" not in plan
    assert "PushedFilters" in plan     # date pruning reaches the scan


def test_overlap_join_is_hash_on_custkey(spark):
    plan = plan_of(spark, "overlapping_customer_orders")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan


def test_degree_stats_no_cartesian(spark):
    plan = plan_of(spark, "dup_graph_degree_stats")
    assert "CartesianProduct" not in plan


def test_rake_segmentation_window_is_per_doc(spark):
    plan = plan_of(spark, "keyword_rake_top_phrases")
    assert "CartesianProduct" not in plan
    # the cumulative-stop window must be partitioned (per doc); the
    # global top-k runs as sort+limit BEFORE the k-row rank window
    import re
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert any("doc_id" in s for s in specs), specs
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------- heavy hitters (MG)

def test_mg_summary_guarantee_on_synthetic_batches(spark):
    import pandas as pd

    from etl_cloud_batch_processing_spark.plans.llm import (
        MG_K, _mg_summaries)

    # adversarial stream: one true heavy hitter drowned in distinct noise
    hh = ["hot"] * 500
    noise = [f"t{i}" for i in range(4000)]
    stream = []
    for i in range(0, 4000, 8):
        stream.extend(hh[i // 8: i // 8 + 1])
        stream.extend(noise[i: i + 8])
    batches = [pd.DataFrame({"token": stream[i: i + 512]})
               for i in range(0, len(stream), 512)]
    out = list(_mg_summaries(iter(batches)))[0]
    n = len(stream)
    # "hot" has count 500 > n/MG_K, so it MUST survive the summary
    assert 500 > n / MG_K
    assert "hot" in set(out.token)
    # lower bounds never exceed true counts
    true = pd.Series(stream).value_counts()
    for _, r in out.iterrows():
        assert r.lower_bound <= true[r.token]
    assert len(out) <= MG_K


def test_heavy_hitters_exactly_match_threshold_set(spark):
    import collections

    from pyspark.sql import functions as F

    from etl_cloud_batch_processing_spark.plans.llm import MG_K

    pdf = _run(spark, "frequent_tokens_heavy_hitters")
    toks = (table(spark, SF, "documents")
            .select(F.explode(F.split("text", " ")).alias("t"))
            .toPandas().t)
    counts = collections.Counter(toks)
    n = len(toks)
    want = {t for t, c in counts.items() if c * MG_K > n}
    assert set(pdf.token) == want
    for _, r in pdf.iterrows():
        assert r.n_occurrences == counts[r.token]


def test_heavy_hitters_first_pass_is_shuffle_free(spark):
    # pass 1 (MG summaries) must sit directly on the scan: the plan's
    # ArrowEvalPython/mapInPandas node takes no Exchange below it other
    # than the ptable round-robin; the only aggregation shuffles are
    # the candidate distinct and the exact-count pass.
    plan = plan_of(spark, "frequent_tokens_heavy_hitters")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
