"""Sketch operators (plans/sketches.py): count-min sketch, Bloom
filter, KMV distinct-count, and AMS F2 structural guarantees.

Unlike the HLL/percentile sketch class (rows-only per SURVEY.md §5.2),
CMS and Bloom are deterministic functions of the input multiset, so the
registered queries are value-hash-checked against DuckDB; these tests
cover the guarantees the top-20 / single-row reports can't — one-sided
error over the FULL vocabulary, zero false negatives per-key, and
mergeability (sketch of a union == merge of sketches)."""
from __future__ import annotations

from pyspark.sql import functions as F

from etl_cloud_batch_processing_spark import plans
from etl_cloud_batch_processing_spark.plans.registry import table
from etl_cloud_batch_processing_spark.plans.sketches import (
    BLOOM_K,
    BLOOM_M,
    CMS_D,
    CMS_W,
    _bloom_bits,
    _bloom_probe,
    _cms_bucket_cols,
    _key_h32,
    bloom_filter_fpr_report,
    cms_token_frequency_report,
)


def _token_counts(spark, sf_dir):
    return (table(spark, sf_dir, "documents")
            .select(F.explode(F.split("text", " ")).alias("token"))
            .groupBy("token").agg(F.count(F.lit(1)).alias("exact_count")))


def _cms_estimates(tc):
    """(token, exact_count, cms_estimate) for EVERY vocabulary token."""
    bk = tc.select(
        "token", "exact_count",
        F.posexplode(_cms_bucket_cols(_key_h32(F.col("token"))))
        .alias("row_id", "bucket"))
    cells = (bk.groupBy("row_id", "bucket")
             .agg(F.sum("exact_count").alias("cell")))
    return (bk.join(cells, ["row_id", "bucket"])
            .groupBy("token", "exact_count")
            .agg(F.min("cell").alias("cms_estimate")))


def test_cms_error_is_one_sided_for_full_vocabulary(spark, sf_dir):
    """CMS never underestimates: every cell a token hashes to contains
    at least that token's own count, so min-over-rows >= exact.  This
    is the Cormode-Muthukrishnan guarantee, asserted for EVERY token
    (the registered query reports only the top 20)."""
    est = _cms_estimates(_token_counts(spark, sf_dir))
    n_under = est.filter(F.col("cms_estimate") < F.col("exact_count")).count()
    assert n_under == 0
    assert est.count() > CMS_W  # vocabulary genuinely exceeds the width


def test_cms_collisions_actually_occur(spark, sf_dir):
    """CMS_W=16 < |vocab| by design, so at least one token must be
    overestimated — otherwise the report's overestimate column is
    vacuously zero and the query exercises nothing."""
    est = _cms_estimates(_token_counts(spark, sf_dir))
    assert est.filter(F.col("cms_estimate") > F.col("exact_count")).count() > 0


def test_cms_sketch_is_mergeable(spark, sf_dir):
    """Sketch(A ∪ B) == Sketch(A) + Sketch(B) cell-by-cell: build the
    64-cell table from the full corpus and from two disjoint halves
    (doc_id parity), and assert cellwise-sum equality — the contract
    that lets per-day / per-partition sketches roll up by addition."""
    docs = table(spark, sf_dir, "documents")

    def cells_of(df):
        tc = (df.select(F.explode(F.split("text", " ")).alias("token"))
              .groupBy("token").agg(F.count(F.lit(1)).alias("c")))
        bk = tc.select(
            "c", F.posexplode(_cms_bucket_cols(_key_h32(F.col("token"))))
            .alias("row_id", "bucket"))
        return {(r["row_id"], r["bucket"]): r["cell"]
                for r in bk.groupBy("row_id", "bucket")
                .agg(F.sum("c").alias("cell")).collect()}

    whole = cells_of(docs)
    even = cells_of(docs.filter(F.col("doc_id") % 2 == 0))
    odd = cells_of(docs.filter(F.col("doc_id") % 2 == 1))
    merged = {k: even.get(k, 0) + odd.get(k, 0)
              for k in set(even) | set(odd)}
    assert merged == whole


def test_bloom_has_zero_false_negatives_per_key(spark, sf_dir):
    """Every member key must probe positive — not just the aggregate
    count in the report, but each individual build-side key."""
    orders = table(spark, sf_dir, "orders")
    build = (orders.filter(F.year("o_orderdate") == 1995)
             .select(F.col("o_custkey").alias("key")).distinct())
    bits = _bloom_bits(build, "key")
    verdict = _bloom_probe(build, "key", bits)
    assert verdict.filter(~F.col("bloom_positive")).count() == 0


def test_bloom_bitset_is_bounded_and_mergeable(spark, sf_dir):
    """The bit set never exceeds M positions (it IS the broadcastable
    summary), and the filter of a union equals the union of the two
    halves' filters (bitwise OR == union-distinct of positions)."""
    orders = table(spark, sf_dir, "orders")
    build = (orders.filter(F.year("o_orderdate") == 1995)
             .select(F.col("o_custkey").alias("key")).distinct())
    whole = {r["pos"] for r in _bloom_bits(build, "key").collect()}
    assert 0 < len(whole) <= BLOOM_M
    even = {r["pos"] for r in _bloom_bits(
        build.filter(F.col("key") % 2 == 0), "key").collect()}
    odd = {r["pos"] for r in _bloom_bits(
        build.filter(F.col("key") % 2 == 1), "key").collect()}
    assert even | odd == whole


def test_bloom_report_confusion_counts_reconcile(spark, sf_dir):
    """The single-row report's counts must be internally consistent:
    positives = members + false positives (since FN == 0), and
    every count bounded by n_probed."""
    row = bloom_filter_fpr_report(spark, sf_dir).collect()[0]
    assert row["n_false_negatives"] == 0
    assert row["n_positives"] == row["n_members"] + row["n_false_positives"]
    assert row["n_probed"] >= row["n_positives"]


def test_cms_report_overestimate_nonnegative(spark, sf_dir):
    rows = cms_token_frequency_report(spark, sf_dir).collect()
    assert len(rows) == 20
    assert all(r["overestimate"] >= 0 for r in rows)
    assert CMS_D == 4 and BLOOM_K == 4  # docstring constants stay literal


def test_kmv_sketch_is_mergeable_and_exact_when_small(spark, sf_dir):
    """Union-then-keep-smallest-k of two halves' sketches equals the
    whole corpus's sketch (the theta-sketch merge rule), and a stream
    with fewer than K distinct hashes is counted exactly."""
    from etl_cloud_batch_processing_spark.plans.sketches import (
        KMV_K, _key_h32, kmv_distinct_users_by_type)

    ev = table(spark, sf_dir, "events")

    def bottom_k(df):
        hs = sorted(r["h"] for r in df.select(
            _key_h32(F.col("user_id")).alias("h")).distinct().collect())
        return hs[:KMV_K]

    whole = bottom_k(ev)
    even = bottom_k(ev.filter(F.col("event_id") % 2 == 0))
    odd = bottom_k(ev.filter(F.col("event_id") % 2 == 1))
    assert sorted(set(even) | set(odd))[:KMV_K] == whole

    rows = kmv_distinct_users_by_type(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["rel_error"] >= 0.0
        if r["exact_distinct"] < KMV_K:
            # sketch degenerates to the exact value set
            assert r["kmv_estimate"] == float(r["exact_distinct"])


def test_ams_estimators_merge_by_addition(spark, sf_dir):
    """Each AMS signed sum over the whole corpus equals the sum of the
    two halves' signed sums computed from per-half counts — the
    property that lets per-partition sketches combine without a second
    scan."""
    from etl_cloud_batch_processing_spark.plans.sketches import (
        _ams_sign_cols, _key_h32)

    ev = table(spark, sf_dir, "events")

    def sums(df):
        c = df.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
        sk = (c.select("cnt",
                       F.posexplode(_ams_sign_cols(
                           _key_h32(F.col("user_id"))))
                       .alias("j", "sign"))
              .groupBy("j").agg(F.sum(F.col("cnt") * F.col("sign"))
                                .alias("s")))
        return {r["j"]: r["s"] for r in sk.collect()}

    whole = sums(ev)
    even = sums(ev.filter(F.col("event_id") % 2 == 0))
    odd = sums(ev.filter(F.col("event_id") % 2 == 1))
    assert {j: even.get(j, 0) + odd.get(j, 0) for j in whole} == whole


def test_ams_estimate_is_unbiased_scale(spark, sf_dir):
    """The median-of-squares must land within a factor of 3 of the true
    F2 on the fixtures (16 estimators give ~50% standard error; a
    factor-3 miss would mean a sign-hash bug, not noise)."""
    from etl_cloud_batch_processing_spark.plans.sketches import (
        ams_selfjoin_size_estimate)

    r = ams_selfjoin_size_estimate(spark, sf_dir).collect()[0]
    assert r["exact_f2"] > 0
    assert r["n_estimators"] == 16
    assert r["exact_f2"] / 3 <= r["ams_estimate"] <= r["exact_f2"] * 3


def test_streaming_cms_state_equals_batch_sketch(spark, sf_dir):
    """The foreachBatch cellwise merge must reproduce the batch-computed
    sketch exactly — the streaming face of test_cms_sketch_is_mergeable
    (4 micro-batches instead of 2 halves)."""
    from etl_cloud_batch_processing_spark.plans.streams import (
        streaming_cms_cell_merge)

    got = {(r["row_id"], r["bucket"]): r["cell"]
           for r in streaming_cms_cell_merge(spark, sf_dir).collect()}
    tc = _token_counts(spark, sf_dir)
    bk = tc.select(
        "exact_count",
        F.posexplode(_cms_bucket_cols(_key_h32(F.col("token"))))
        .alias("row_id", "bucket"))
    want = {(r["row_id"], r["bucket"]): r["cell"]
            for r in bk.groupBy("row_id", "bucket")
            .agg(F.sum("exact_count").alias("cell")).collect()}
    assert got == want


def test_theta_set_ops_exact_when_small(spark, sf_dir):
    """At sf0.001 both sets hold fewer than KMV_K distinct users, so
    θ = H, the sketch IS the set, and every estimate must be exact —
    the small-set branch of the theta model."""
    from etl_cloud_batch_processing_spark.plans.sketches import (
        theta_sketch_set_ops)

    r = theta_sketch_set_ops(spark, sf_dir).collect()[0]
    assert r["est_union"] == float(r["exact_union"])
    assert r["est_intersection"] == float(r["exact_intersection"])
    assert r["union_rel_error"] == r["intersection_rel_error"] == 0.0


def test_theta_set_ops_estimates_at_scale(spark):
    """At sf0.01 each set holds 150 > KMV_K = 64 distinct users: θ < H,
    the estimates come from the retained sample, and the theta error
    model (~1/√k ≈ 12.5%) must hold with slack."""
    from etl_cloud_batch_processing_spark.plans.sketches import (
        theta_sketch_set_ops)

    r = theta_sketch_set_ops(spark, "/root/testdata/sf0.01").collect()[0]
    assert r["exact_union"] > 64  # estimation actually engaged
    assert r["union_rel_error"] <= 0.5
    assert r["intersection_rel_error"] <= 0.5
    # algebra sanity: an intersection can never out-count its union
    assert r["est_intersection"] <= r["est_union"] + 1e-9


# ---------------------------------------------------------------------------
# Round-9 session 2: HDR-histogram quantiles + deterministic HLL.
# ---------------------------------------------------------------------------

def test_hdr_quantiles_envelope_executes(spark, sf_dir):
    rows = (plans.REGISTRY["hdr_histogram_value_quantiles"]
            .builder(spark, sf_dir).collect())
    assert len(rows) == 15  # 5 types x 3 percentiles
    for r in rows:
        assert r["within_bound"], dict(r.asDict())
        # one-sided error: bucket lower bound never overshoots
        assert r["est_cents"] <= r["exact_cents"]
        assert r["exact_cents"] * 4 <= r["est_cents"] * 5
    # the sketch genuinely approximates (not a disguised exact quantile)
    assert any(r["est_cents"] != r["exact_cents"] for r in rows)


def test_hdr_bucket_relative_width_bound(spark):
    """Every value maps to a bucket whose lower bound is within 25%
    below it — the invariant the quantile envelope rests on."""
    df = spark.range(1, 5000).selectExpr(
        "id AS scaled",
        "CASE WHEN length(bin(id)) - 1 < 2 THEN id"
        " ELSE shiftleft(shiftright(id, length(bin(id)) - 3),"
        " length(bin(id)) - 3) END AS bucket_lo")
    bad = df.filter("bucket_lo > scaled OR scaled * 4 > bucket_lo * 5")
    assert bad.count() == 0


def test_hll_register_cardinality_audits_itself(spark, sf_dir):
    rows = {r["event_type"]: r for r in
            (plans.REGISTRY["hll_register_cardinality"]
             .builder(spark, sf_dir).collect())}
    assert set(rows) == {"ALL", "click", "error", "purchase", "signup",
                         "view"}
    for r in rows.values():
        assert r["within_bound"], dict(r.asDict())
        # fixtures keep every group in the raw-estimate regime, so the
        # libm linear-counting branch never enters the hash path
        assert not r["used_linear_counting"]
        assert r["rel_err"] <= 0.8
    assert rows["ALL"]["exact_distinct"] == sum(
        r["exact_distinct"] for t, r in rows.items() if t != "ALL")


def test_hll_merge_is_registerwise_max(spark, sf_dir):
    """HLL's defining property on disjoint halves: sketch(union) ==
    registerwise max of sketch(half_a), sketch(half_b) — rebuilt here
    from the same md5 hash pipeline as the registered query."""
    from etl_cloud_batch_processing_spark.plans.sketches import H32, HLL_M
    ev = table(spark, sf_dir, "events")
    h32 = (F.conv(F.substring(
        F.md5(F.col("event_id").cast("string").cast("binary")), 1, 15),
        16, 10).cast("bigint") % F.lit(H32))
    rho = ev.select(
        (F.col("event_id") % 2).alias("half"), h32.alias("h32")).select(
        "half", (F.col("h32") % HLL_M).alias("reg"),
        F.expr(f"CASE WHEN h32 DIV {HLL_M} = 0 THEN 29"
               f" ELSE 29 - length(bin(h32 DIV {HLL_M})) END").alias("rho"))
    merged = (rho.groupBy("half", "reg").agg(F.max("rho").alias("m"))
              .groupBy("reg").agg(F.max("m").alias("m_j")))
    whole = rho.groupBy("reg").agg(F.max("rho").alias("m_j"))
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, whole.collect()))
