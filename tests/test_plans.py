"""Physical-plan regression tests: the scale properties SURVEY.md §4
promises (pushdown, pruning, broadcast, no cartesian blowups) asserted
against the actual Catalyst output, so a refactor that silently
de-optimizes a plan fails CI — not just the 100 TB run.
"""

from __future__ import annotations

import contextlib
import io

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
