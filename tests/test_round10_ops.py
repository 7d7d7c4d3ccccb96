"""Round-10 operator pins: change-data-feed classification arithmetic,
IVM-equals-recompute, and the registered zorder-manifest transaction's
invariants (the oracle hash is the primary gate; these pin the
properties the hash alone doesn't name)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_cdf_classification_counts(spark):
    from etl_cloud_batch_processing_spark.plans.evolution import (
        manifest_change_data_feed,
    )

    feed = manifest_change_data_feed(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet").select("event_id")
    base_ids = {r.event_id for r in
                ev.filter("event_id % 5 <> 0").collect()}
    by_type: dict = {"insert": set(), "update": set(), "delete": set()}
    for r in feed:
        by_type[r.change_type].add(r.event_id)
        if r.change_type == "delete":
            assert r.new_cents is None and r.old_cents is not None
        elif r.change_type == "insert":
            assert r.old_cents is None and r.new_cents is not None
        else:
            assert r.new_cents == r.old_cents + 7
    assert by_type["delete"] == {i for i in base_ids if i % 11 == 0}
    assert by_type["update"] == {i for i in base_ids
                                 if i % 11 != 0 and i % 3 == 0}
    assert by_type["insert"] == {i + 1000000000 for i in base_ids
                                 if i % 13 == 0}


def test_ivm_equals_full_recompute(spark):
    from etl_cloud_batch_processing_spark.plans.evolution import (
        ivm_incremental_daily_revenue,
    )

    inc = {(r.day, r.event_type): (r.n_events, r.sum_cents)
           for r in ivm_incremental_daily_revenue(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    if dict(ev.dtypes)["ts"] == "bigint":
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    full = {(r.day, r.event_type): (r.n, r.c) for r in
            (ev.groupBy(F.col("ts").cast("date").alias("day"),
                        "event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.round(F.col("value") * 100).cast("bigint"))
                  .alias("c")).collect())}
    assert inc == full and inc
    # both batches genuinely contribute (the cutoff splits the month)
    days = sorted(d for d, _ in inc)
    assert days[0].day < 16 <= days[-1].day


def test_zorder_manifested_query_invariants(spark):
    from etl_cloud_batch_processing_spark.plans.layout import (
        zorder_manifested_optimize,
    )

    row = zorder_manifested_optimize(spark, SF).collect()
    assert len(row) == 1
    r = row[0]
    assert (r.v_before, r.v_after) == (1, 2)
    assert r.files_after_ok
    assert r.n_rows == r.v1_snapshot_rows
    assert r.rows_pred == r.rows_pred_after  # -1 sentinel never fires
    assert r.zone_maps_prune


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_recursive_cte_closed_form(spark):
    """The recursive walk has a closed form: chain_len(k) =
    floor(log2(k)), n_ancestors = chain_len + 1, and chain_bal is the
    python-computed sum along k, k//2, ..., 1."""
    import math

    from etl_cloud_batch_processing_spark.plans.analytics import (
        recursive_cte_ancestor_rollup,
    )

    rows = {r.c_custkey: r for r in
            recursive_cte_ancestor_rollup(spark, SF).collect()}
    bal = {r.c_custkey: round(float(r.c_acctbal) * 100) for r in
           spark.read.parquet(f"{SF}/customer.parquet")
           .select("c_custkey", "c_acctbal").collect()}
    assert set(rows) == set(bal)
    for k, r in rows.items():
        # custkey 0 exists in the fixtures: its chain is just itself
        assert r.chain_len == (int(math.log2(k)) if k >= 1 else 0)
        assert r.n_ancestors == r.chain_len + 1
        want, a = 0, k
        while True:
            want += bal[a]
            if a <= 1:
                break
            a //= 2
        assert r.chain_bal_cents == want


def test_lateral_topk_decorrelates_to_hash_join(spark):
    """The correlated LATERAL LIMIT must decorrelate: the executed plan
    carries a hash join + window, never a nested loop or cartesian, and
    the rows equal the window-function top-3 computed directly."""
    import io
    import re
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as Wnd

    from etl_cloud_batch_processing_spark.plans.analytics import (
        lateral_topk_orders_per_customer,
    )

    df = lateral_topk_orders_per_customer(spark, SF)
    rows = {(r.c_custkey, r.rnk): (r.o_orderkey, r.price_cents)
            for r in df.collect()}
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert re.search(r"\(\d+\) Window", p)

    cust = spark.read.parquet(f"{SF}/customer.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    w = Wnd.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    want = {(r.c_custkey, r.rnk): (r.o_orderkey, r.cents) for r in
            (cust.filter("c_acctbal > 9000")
             .join(orders, F.col("c_custkey") == F.col("o_custkey"))
             .withColumn("rnk", F.row_number().over(w))
             .filter("rnk <= 3")
             .select("c_custkey", "rnk", "o_orderkey",
                     F.round(F.col("o_totalprice") * 100).cast("bigint")
                     .alias("cents")).collect())}
    assert rows == want and rows


def test_sql_udf_inlines_into_plan(spark):
    """The SQL-language UDFs must INLINE (no python eval nodes), keep
    scan pushdown, and agree with the hand-inlined computation."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from etl_cloud_batch_processing_spark.plans.analytics import (
        sql_udf_typed_revenue,
    )

    df = sql_udf_typed_revenue(spark, SF)
    rows = {r.event_type: (r.n_events, r.sum_cents, r.n_users)
            for r in df.collect()}
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "EvalPython" not in p          # pure SQL, no python workers
    ev = spark.read.parquet(f"{SF}/events.parquet")
    want = {r.event_type: (r.n, r.c, r.u) for r in
            (ev.filter(F.col("event_type").isin("purchase", "signup"))
             .groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.round(F.col("value") * 100).cast("bigint"))
                  .alias("c"),
                  F.countDistinct("user_id").alias("u")).collect())}
    assert rows == want and rows


def test_sql_scripting_threshold_is_minimal_power_of_two(spark):
    """The script's terminating threshold must be the SMALLEST power
    of two with at most 1% of events above it — replayed in python."""
    from etl_cloud_batch_processing_spark.plans.analytics import (
        sql_scripting_threshold_search,
    )

    r = sql_scripting_threshold_search(spark, SF).collect()[0]
    vals = [row.value for row in
            spark.read.parquet(f"{SF}/events.parquet")
            .select("value").collect()]
    total = len(vals)
    thr = 1
    while sum(1 for v in vals if v > thr) * 100 > total:
        thr *= 2
    assert r.thr == thr
    assert r.n_above == sum(1 for v in vals if v > thr)
    assert r.total == total
    # minimality: half the threshold fails the bound (unless thr == 1)
    if thr > 1:
        assert sum(1 for v in vals if v > thr // 2) * 100 > total
