"""Physical-plan regression tests: the scale properties SURVEY.md §4
promises (pushdown, pruning, broadcast, no cartesian blowups) asserted
against the actual Catalyst output, so a refactor that silently
de-optimizes a plan fails CI — not just the 100 TB run.
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest

from etl_cloud_batch_processing_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name].builder(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushed_to_parquet_scan(spark):
    plan = plan_of(spark, "filter_eq_purchase")
    assert "PushedFilters" in plan
    assert "EqualTo(event_type,purchase)" in plan.replace(" ", "")


def test_projection_prunes_scan_columns(spark):
    plan = plan_of(spark, "pricing_summary")
    # 7 needed lineitem columns, and specifically not the join keys
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read, plan
    schema = read[0]
    for col in ("l_quantity", "l_extendedprice", "l_discount",
                "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"):
        assert col in schema
    for col in ("l_orderkey", "l_partkey", "l_suppkey"):
        assert col not in schema


def test_partial_aggregation_before_shuffle(spark):
    plan = plan_of(spark, "pricing_summary")
    assert plan.count("HashAggregate") >= 2       # partial + final
    assert "partial_sum" in plan


def test_dim_joins_broadcast(spark):
    for name in ("regional_revenue", "top_customers_by_revenue"):
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_no_cartesian_products_anywhere(spark):
    """CartesianProduct = both sides shuffled to every task — never
    acceptable.  (BroadcastNestedLoopJoin with a small broadcast side is
    the deliberate pattern for query×corpus scoring and is allowed.)"""
    for name, spec in REGISTRY.items():
        if name.startswith(("mllib", "streaming")):
            continue  # mllib plans are library-internal; streaming runs a query
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, name


def test_topk_fuses_sort_and_limit(spark):
    plan = plan_of(spark, "top_orders_limit")
    assert "TakeOrderedAndProject" in plan
    # no global Sort node materializing the whole table
    assert "\n   Sort " not in plan


def test_asof_join_is_single_shuffle_window(spark):
    plan = plan_of(spark, "asof_latest_order_per_event")
    # union + window form: no join node at all, one shuffle per side
    # feeding the window sort
    assert "Join" not in plan
    assert "Window" in plan


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Bucketing both facts on the join key pre-shuffles them at write
    time — the join then runs with ZERO Exchange nodes.  This is the
    100 TB answer for the orders ⋈ lineitem fact-fact join
    (shipping_priority): pay the shuffle once at ingest, never per
    query."""
    sf = "/root/testdata/sf0.001"
    wh = str(tmp_path / "warehouse")   # external-table locations
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    (orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").option("path", f"{wh}/orders_b")
     .saveAsTable("orders_b"))
    (li.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").option("path", f"{wh}/lineitem_b")
     .saveAsTable("lineitem_b"))
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # At fixture scale the planner would broadcast instead (and skip
        # the buckets); disable broadcast to exercise the plan the join
        # gets at real scale, where neither fact side fits a broadcast.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        import contextlib, io
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_exists_semi_join_no_nested_loop(spark):
    """TPC-H Q4 shape: the EXISTS must plan as a hash/sort-merge
    LeftSemi on the equi key with the date term as residual — a
    nested-loop here would be O(orders × lineitem) at scale."""
    plan = plan_of(spark, "order_priority_late_ship")
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_promo_share_broadcasts_dim(spark):
    plan = plan_of(spark, "promo_revenue_share")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_stratified_sample_is_shuffle_free(spark):
    """Hash-bucket sampling is a narrow projection + filter — any
    Exchange in this plan means something regressed badly."""
    plan = plan_of(spark, "stratified_sample_by_lang")
    assert "Exchange" not in plan


def test_pivot_has_no_distinct_values_pass(spark):
    """Explicit pivot values ⇒ (day, type) count + pivotfirst, exactly
    two exchanges — the second on pre-aggregated rows only.  The
    implicit form would add a whole distinct-values job before the
    plan even builds."""
    plan = plan_of(spark, "pivot_type_by_region_day")
    # formatted explain lists each node twice (tree + details section)
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 2, plan
    assert "pivotfirst" in plan


def test_returned_items_topk_fuses(spark):
    plan = plan_of(spark, "returned_item_customers")
    assert "TakeOrderedAndProject" in plan
    # quarter filter pushed into the orders scan, not applied post-join
    assert "PushedFilters: [IsNotNull(o_orderdate)" in plan or \
        "o_orderdate" in "".join(
            ln for ln in plan.splitlines() if "PushedFilters" in ln)


def test_contamination_probe_is_broadcast(spark):
    # the benchmark n-gram set must broadcast; a shuffled join here
    # would move the whole training corpus for a membership probe
    plan = plan_of(spark, "contamination_flags")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_quantize_has_no_shuffle_after_source(spark):
    # pure projection: the only Exchange allowed is the ptable
    # round-robin repartition of the single-file fixture source
    plan = plan_of(spark, "embedding_quantize_int8")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 1
    assert "Python" not in plan            # all JVM-side array exprs


def test_curation_pipeline_single_exchange_for_dedup(spark):
    # four gates + dedup must not stack shuffles: one round-robin
    # source repartition + one hash partition for the dedup window
    plan = plan_of(spark, "curation_pipeline")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2
    # the language allowlist reaches the parquet scan
    assert "In(lang" in plan


def test_partition_pruning_on_dt_layout(spark, tmp_path):
    """A dt=-partitioned table read with a dt filter must prune at the
    file-listing level: PartitionFilters carries the predicate and the
    scan touches one partition directory, not the table (SURVEY.md §4.2,
    L7 layout — the property that makes scheduled reads O(one day) at
    100 TB)."""
    from pyspark.sql import functions as F

    from etl_cloud_batch_processing_spark.sources.writers import (
        write_append_partition,
    )

    events = spark.read.parquet(f"{SF}/events.parquet").limit(300)
    path = str(tmp_path / "dt_table")
    for ds in ("2021-03-10", "2021-03-11", "2021-03-12"):
        write_append_partition(events, path, ds)

    df = spark.read.parquet(path).filter(F.col("dt") == "2021-03-11")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "dt" in pf[0], plan
    # dt must be partition-pruned, not a post-scan data filter
    assert not any("dt" in ln for ln in plan.splitlines()
                   if "PushedFilters" in ln), plan
    assert df.count() == 300  # one partition's rows, not 900


def test_bpe_pairs_topk_fuses_and_partial_aggregates(spark):
    plan = plan_of(spark, "bpe_merge_candidates")
    assert "TakeOrderedAndProject" in plan          # no global sort
    assert "partial_count" in plan                  # map-side combine


def test_windowed_dedup_is_single_aggregation(spark):
    """dedup_first_event_per_week must be one hash aggregation (argmin
    via min(struct)), never a WindowExec sort."""
    plan = plan_of(spark, "dedup_first_event_per_week")
    assert "Window" not in plan
    assert _n_nodes(plan, "Exchange") <= 1          # partial→final agg


def _n_nodes(plan: str, node: str) -> int:
    """Count physical-plan nodes in `formatted` output (each node is
    listed once in the footer as "(N) NodeName")."""
    return len(re.findall(rf"^\(\d+\) {node}\b", plan, re.MULTILINE))


def test_tfidf_df_reuses_token_exchange(spark):
    """DF-via-window form: one exchange keyed on token feeds both the
    TF aggregation's output and the DF count window — a separate DF
    aggregate + join would add more shuffle exchanges."""
    plan = plan_of(spark, "tfidf_top_terms")
    assert _n_nodes(plan, "Exchange") <= 6, plan


def test_semdedup_blocks_on_cluster_id(spark):
    """The pair join must be an equi hash join on cid (the blocking
    key) — never a nested-loop/cartesian pair scan."""
    plan = plan_of(spark, "semdedup_pairs")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan


def test_kmeans_assignment_has_no_window_sort(spark):
    """Per-vector argmin is a hash aggregation; the only Window nodes
    left are the two K-row seed-numbering windows (bounded by
    K_CLUSTERS rows by construction), never an n-row assignment sort."""
    plan = plan_of(spark, "kmeans_lloyd_centroids")
    assert _n_nodes(plan, "Window") <= 2, plan


def test_vocab_coverage_takes_topk_before_window(spark):
    plan = plan_of(spark, "tokenizer_vocab_coverage")
    assert "TakeOrderedAndProject" in plan          # top-V, no vocab sort


def test_rfm_scale_form_has_no_window(spark):
    """The registered RFM query is the threshold form: quartile
    assignment via a broadcast one-row quantile aggregate, never an
    unpartitioned ntile sort over the user grain (the round-2 verdict's
    scale cliff).  The equal-count ntile twin stays available as
    rfm_user_segments_ntile."""
    plan = plan_of(spark, "rfm_user_segments")
    assert _n_nodes(plan, "Window") == 0, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_rollup_query_reads_rollup_table_not_history(spark):
    """rollup_plus_tail_counts must serve closed days from the
    maintained rollup table: its plan scans the rollup parquet (a
    location outside the fixture dir) plus events for the tail — and
    invoking the query twice must not rewrite the rollup (O(tail), not
    O(history), per invocation)."""
    import os

    from etl_cloud_batch_processing_spark.plans import temporal as T

    path = T.maintain_daily_rollup(spark, SF)
    marker = os.path.join(path, "_ECBP_ROLLUP_COMPLETE")
    before = os.path.getmtime(marker)
    df = REGISTRY["rollup_plus_tail_counts"].builder(spark, SF)
    df.count()
    df2 = REGISTRY["rollup_plus_tail_counts"].builder(spark, SF)
    df2.count()
    assert os.path.getmtime(marker) == before
    assert "ecbp_rollup" in df._jdf.queryExecution().toString()


def test_rollup_maintenance_per_day_is_idempotent(spark):
    """Re-running one closed day's maintenance (the retry case)
    replaces its dt= partition rather than duplicating rows — the same
    WRITE_APPEND-made-idempotent disposition as case_a."""
    from pyspark.sql import functions as F

    from etl_cloud_batch_processing_spark.plans import temporal as T
    from etl_cloud_batch_processing_spark.plans.registry import table

    path = T.maintain_daily_rollup(spark, SF)
    events = table(spark, SF, "events")
    some_day = (events.select(F.to_date("ts").alias("d"))
                .agg(F.min("d")).collect()[0][0]).isoformat()
    n_before = (spark.read.parquet(path)
                .filter(F.col("day") == some_day).count())
    T.maintain_daily_rollup(spark, SF, run_date=some_day)
    T.maintain_daily_rollup(spark, SF, run_date=some_day)
    n_after = (spark.read.parquet(path)
               .filter(F.col("day") == some_day).count())
    assert n_before == n_after > 0


def test_write_overwrite_bucketed_joins_without_exchange(spark, tmp_path):
    """The bucket_by= writer option is the callable API for the
    zero-Exchange fact-fact join (round-2 verdict item 9): write both
    facts bucketed on the join key through write_overwrite, join, and
    assert no Exchange in the plan."""
    import contextlib
    import io

    from etl_cloud_batch_processing_spark.sources.writers import (
        write_overwrite,
    )

    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    write_overwrite(orders, str(tmp_path / "o_b"),
                    bucket_by=(4, ["o_orderkey"]), table_name="wo_orders_b")
    write_overwrite(li, str(tmp_path / "l_b"),
                    bucket_by=(4, ["l_orderkey"]), table_name="wo_li_b")
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ob, lb = spark.table("wo_orders_b"), spark.table("wo_li_b")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS wo_orders_b")
        spark.sql("DROP TABLE IF EXISTS wo_li_b")


def test_write_overwrite_bucketed_requires_table_name(spark, tmp_path):
    import pytest as _pytest

    from etl_cloud_batch_processing_spark.sources.writers import (
        write_overwrite,
    )

    df = spark.range(3)
    with _pytest.raises(ValueError, match="table_name"):
        write_overwrite(df, str(tmp_path / "x"), bucket_by=(2, ["id"]))


def test_nearest_centroid_broadcasts_model(spark):
    """The centroid model (labels × dims rows) must broadcast onto the
    exploded vectors — never a shuffle join keyed on pos, and never a
    cartesian product."""
    plan = plan_of(spark, "nearest_centroid_assignment")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_skew_report_uses_take_ordered(spark):
    """Top-20 keys must come from TakeOrderedAndProject, not a global
    sort of the whole key population."""
    plan = plan_of(spark, "join_key_skew_report")
    assert "TakeOrderedAndProject" in plan


def test_pmi_pairs_no_cartesian(spark):
    """Pair generation must be the doc_id equi-self-join (hash join),
    never a cartesian expansion."""
    plan = plan_of(spark, "token_pmi_top_pairs")
    assert "CartesianProduct" not in plan


def test_line_dedup_sheds_text_before_window_shuffle(spark):
    """The audit query must shuffle only (doc_id, line_no, hash) into
    the keep-first window: the span hash is computed inline in the
    pre-exchange Project, so no materialized span-text column ever
    exists in the plan (the rewrite twin is the one that legitimately
    carries a `line` column)."""
    plan = (REGISTRY["line_dedup_spans"].builder(spark, SF)
            ._jdf.queryExecution().executedPlan().toString())
    assert re.search(r"Exchange hashpartitioning\(h#\d+", plan), plan
    assert "line#" not in plan


def test_pq_codebook_joins_broadcast(spark):
    """PQ encode/search must join codebooks (and the ADC lookup table)
    BROADCAST — a shuffled join against a 128-row codebook would
    shuffle the full corpus for nothing."""
    for name in ("vector_pq_encode", "vector_pq_adc_topk"):
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan, name


def test_truncation_fidelity_pairs_on_bucket_key(spark):
    """The fidelity report's pair join must include the self-tuning
    md5 bucket in its join key (the linearity guarantee — SCALE.md
    pathology: a label-only block went quadratic at 32×)."""
    plan = plan_of(spark, "vector_truncation_fidelity")
    keys = [ln for ln in plan.splitlines()
            if "keys" in ln and "bkt" in ln]
    assert keys, plan     # join KEYS include the bucket, not just a filter


def test_window_pmi_pair_join_is_equi(spark):
    """Skip-gram pair events must come from an EQUI-join on
    (doc_id, pos+offset) — a nested-loop position-range join would be
    per-document quadratic.  The ONLY nested-loop node allowed is the
    one-row totals crossJoin (broadcast scalar pattern)."""
    plan = plan_of(spark, "window_cooccurrence_pmi")
    nodes = re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)
    assert len(nodes) <= 1, plan
    assert "CartesianProduct" not in plan


def test_dhash_near_dup_is_banded_equi_join_with_topk(spark):
    """The perceptual-hash pair join must stay a hash equi-join on the
    band key (never a sort-merge or nested loop over all pairs) and
    the final cut must fuse into TakeOrderedAndProject."""
    plan = plan_of(spark, "visual_dhash_near_dup")
    assert "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_shot_keyframes_shares_window_partitioning(spark):
    """Both keyframe windows (lag + running shot id) partition by
    media_id, so the plan needs no join and no second partitioning
    scheme — one shuffle serves the whole window stage."""
    plan = plan_of(spark, "video_shot_keyframes")
    assert "Join" not in plan
    keys = set(re.findall(r"hashpartitioning\((\w+)", plan))
    assert keys <= {"media_id"}, keys


def test_activity_entropy_is_aggregate_only(spark):
    """The entropy identity keeps the plan to two hash aggregates:
    no window, no join-back of totals, map-side partials present."""
    plan = plan_of(spark, "user_activity_entropy")
    assert "Window" not in plan
    assert "Join" not in plan
    assert "partial_" in plan


def test_ewma_pushes_topk_into_window_group_limit(spark):
    """rn <= 10 must reach the window as a WindowGroupLimit (per-group
    top-k before the full rank materializes)."""
    plan = plan_of(spark, "value_ewma_last10")
    assert "WindowGroupLimit" in plan
    assert "partial_" in plan


def test_novelty_has_no_window_and_no_pair_join(spark):
    """First-occurrence novelty is min-reduce + equi-join + count — a
    window or a shingle self-join in this plan would be a regression
    to the quadratic form."""
    plan = plan_of(spark, "unseen_ngram_novelty")
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan
    assert "partial_" in plan


def test_sq8_grid_joins_broadcast(spark):
    """The 64-row per-dim grid must broadcast back onto the flattened
    scan; a shuffle join on `d` would shuffle the corpus twice."""
    plan = plan_of(spark, "vector_sq8_fidelity")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# Round-7 plan regressions.
# ---------------------------------------------------------------------------

def test_round7_queries_have_no_cartesian_product(spark):
    """None of the round-7 additions may regress into a cartesian."""
    for name in ("bpe_train_merges", "bpe_encode_token_counts",
                 "bpe_compression_by_lang", "max_duplicate_span_lengths",
                 "conversion_survival_km", "conversion_survival_by_cohort",
                 "conversion_rmst_by_cohort", "survival_logrank_test",
                 "near_dup_quality_canonical", "weekday_adjusted_anomalies",
                 "strict_funnel_with_timeouts", "postings_index_stats",
                 "source_token_entropy", "dup_graph_lpa_communities"):
        assert "CartesianProduct" not in plan_of(spark, name), name


def test_postings_stats_is_take_ordered(spark):
    """The top-20 report must fuse sort+limit — never a global sort of
    the vocabulary."""
    plan = plan_of(spark, "postings_index_stats")
    assert "TakeOrderedAndProject" in plan


def test_survival_stats_join_is_broadcast(spark):
    """The weekday stats frame (types×7 rows) joins back broadcast —
    the day grain never shuffles for the z-score join."""
    plan = plan_of(spark, "weekday_adjusted_anomalies")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bpe_train_pair_count_aggregates_partially(spark):
    """Each training round's pair count must combine map-side so the
    shuffle carries distinct pairs, not tokens."""
    plan = plan_of(spark, "bpe_train_merges")
    assert "partial_count" in plan or "Partial" in plan


def test_span_ladder_hashes_before_shuffle(spark):
    """The dup-marking exchange must key on md5 output, never raw
    64-token span strings (the plan projects md5 below the window
    exchange)."""
    plan = plan_of(spark, "max_duplicate_span_lengths")
    assert "md5" in plan
    assert "Window" in plan
