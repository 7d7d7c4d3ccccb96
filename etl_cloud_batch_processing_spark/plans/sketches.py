"""Probabilistic-sketch operators: count-min sketch and Bloom filter.

Both are the mergeable-summary siblings of the Misra-Gries pass in
plans/llm.py, and — unlike MG, whose per-partition summaries depend on
arrival order — both are DETERMINISTIC functions of the input multiset:
every cell is a sum (CMS) or an OR (Bloom) over hash-selected rows, so
the whole sketch, its estimates, and its false positives are exactly
reproducible in DuckDB and the queries here are value-hash-checked, not
rows-only.  That makes this module the oracle-strong member of the
sketch family (SURVEY.md §5.2 sanctions rows-only for HLL/quantile
sketches whose merge internals are engine-specific; CMS/Bloom need no
such sanction).

Hash family: the same md5-derived universal hashes as the MinHash path
(operators/dedup.py) — h32 = (60-bit md5 prefix) mod 2³², then
``((aᵢ·h32 + bᵢ) mod P) mod width`` with P prime > 2³² and aᵢ < 2³⁰ so
the product never overflows int64.  All constants are inlined literals
in both engines.

Reference parity: the reference repo (pkl-playing-fields) has no
sketching at all — its closest analog is exact COUNT(*) GROUP BY in
BigQuery (dags/daily_search_history.py:74-86); these operators are the
100-TB capability layer per SURVEY.md §2.12/NS4.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_cloud_batch_processing_spark.plans.registry import query, table

# Universal-hash modulus shared with the MinHash family.
P = 4294967311
H32 = 4294967296


def _const(tag: str, lo: int, hi: int) -> int:
    h = int(hashlib.md5(tag.encode()).hexdigest()[:15], 16)
    return lo + h % (hi - lo)


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005): CMS_D rows of CMS_W
# buckets.  CMS_W=16 is deliberately SMALLER than the fixture vocabulary
# (~31 tokens) so collisions — and therefore visible positive
# overestimates — occur at every SF and the report actually exercises
# the estimate-vs-truth comparison.  Production sizing is w = ceil(e/ε),
# d = ceil(ln 1/δ); the dataflow is identical.
# ---------------------------------------------------------------------------
CMS_D = 4
CMS_W = 16
CMS_A = [_const(f"cms_a{i}", 1, 1 << 30) for i in range(CMS_D)]
CMS_B = [_const(f"cms_b{i}", 0, 1 << 30) for i in range(CMS_D)]

_CMS_BUCKET_SQL = [
    f"(({CMS_A[i]} * h32 + {CMS_B[i]}) % {P}) % {CMS_W}"
    for i in range(CMS_D)]


def _cms_bucket_cols(h32):
    return F.array(*[((F.lit(CMS_A[i]) * h32 + F.lit(CMS_B[i])) % F.lit(P))
                     % F.lit(CMS_W) for i in range(CMS_D)])


@query(
    "cms_token_frequency_report",
    oracle=f"""
    WITH occ AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents),
    tc AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_count
        FROM occ GROUP BY token),
    hb AS (
        SELECT token, exact_count,
               CAST('0x' || substr(md5(token), 1, 15) AS BIGINT)
                   % {H32} AS h32
        FROM tc),
    bk AS (
        SELECT token, exact_count, r.row_id,
               ([{", ".join(_CMS_BUCKET_SQL)}])[r.row_id + 1] AS bucket
        FROM hb CROSS JOIN (SELECT unnest(range(0, {CMS_D})) AS row_id) r),
    cells AS (
        SELECT row_id, bucket, CAST(SUM(exact_count) AS BIGINT) AS cell
        FROM bk GROUP BY 1, 2),
    est AS (
        SELECT b.token, b.exact_count, MIN(c.cell) AS cms_estimate
        FROM bk b JOIN cells c USING (row_id, bucket)
        GROUP BY 1, 2)
    SELECT token, exact_count, cms_estimate,
           cms_estimate - exact_count AS overestimate
    FROM est
    ORDER BY exact_count DESC, token ASC
    LIMIT 20
    """,
)
def cms_token_frequency_report(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus token stream, audited against
    exact counts: top-20 tokens with their exact frequency, the CMS
    point estimate (min over 4 rows x 16 buckets), and the
    overestimate — never negative, because every cell only ever ADDS
    colliding counts (the one-sided-error guarantee the pytest suite
    asserts for the full vocabulary).

    Dataflow is the streaming-sketch shape written as DataFrame ops:
    each token occurrence increments one bucket per row, and summing
    increments is associative, so the per-token partial aggregation
    (the first ``groupBy`` — Spark's map-side combine) followed by the
    (row, bucket)-grain cell sum is bit-identical to per-occurrence
    streaming updates.  At 100 TB the ONLY corpus-scale stage is that
    first partial-aggregated token count; the sketch itself is 64
    cells, broadcast back onto the vocabulary for the estimate join.
    Cells merge across partitions, days, or corpora by plain addition —
    the same mergeable-summaries contract as the Misra-Gries pass
    (plans/llm.py), but with a deterministic, oracle-checkable
    estimate."""
    occ = (table(spark, sf_dir, "documents")
           .select(F.explode(F.split("text", " ")).alias("token")))
    tc = occ.groupBy("token").agg(
        F.count(F.lit(1)).alias("exact_count"))
    h32 = (F.conv(F.substring(F.md5(F.col("token").cast("binary")), 1, 15),
                  16, 10).cast("bigint") % F.lit(H32))
    bk = (tc.select("token", "exact_count",
                    F.posexplode(_cms_bucket_cols(h32))
                    .alias("row_id", "bucket")))
    cells = (bk.groupBy("row_id", "bucket")
             .agg(F.sum("exact_count").alias("cell")))
    est = (bk.join(F.broadcast(cells), ["row_id", "bucket"])
           .groupBy("token", "exact_count")
           .agg(F.min("cell").alias("cms_estimate")))
    return (est.orderBy(F.desc("exact_count"), F.asc("token")).limit(20)
            .select("token", "exact_count", "cms_estimate",
                    (F.col("cms_estimate") - F.col("exact_count"))
                    .alias("overestimate")))


# ---------------------------------------------------------------------------
# Bloom filter: BLOOM_M bits, BLOOM_K hashes.  Build side = customers
# who placed a 1995 order (the `customers_with_1995_orders` semi-join's
# build set — ~78% of customers at every SF, leaving a real non-member
# population to measure false positives on).  M=8192 gives ~7 bits per
# member at sf0.01 (the driver's value-check SF): a measurable but
# small FPR.  Production sizing is m = -n·ln(p)/ln(2)²; the dataflow
# is identical.
# ---------------------------------------------------------------------------
BLOOM_M = 8192
BLOOM_K = 4
BLOOM_A = [_const(f"bloom_a{k}", 1, 1 << 30) for k in range(BLOOM_K)]
BLOOM_B = [_const(f"bloom_b{k}", 0, 1 << 30) for k in range(BLOOM_K)]

_BLOOM_POS_SQL = [
    f"(({BLOOM_A[k]} * h32 + {BLOOM_B[k]}) % {P}) % {BLOOM_M}"
    for k in range(BLOOM_K)]

_D_KEY_H32 = ("CAST('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 15) "
              f"AS BIGINT) % {H32}")


def _bloom_pos_cols(h32):
    return F.array(*[((F.lit(BLOOM_A[k]) * h32 + F.lit(BLOOM_B[k]))
                      % F.lit(P)) % F.lit(BLOOM_M)
                     for k in range(BLOOM_K)])


def _key_h32(key):
    return (F.conv(F.substring(F.md5(key.cast("string").cast("binary")),
                               1, 15), 16, 10).cast("bigint")
            % F.lit(H32))


def _bloom_bits(build_keys: DataFrame, key: str) -> DataFrame:
    """The filter itself: the DISTINCT set of set bit positions, as a
    frame.  Building it is one explode + one distinct — O(n·K) rows in,
    ≤ M rows out; merging two filters is a plain union-distinct (bitwise
    OR), the mergeable-summaries contract."""
    return (build_keys
            .select(F.explode(_bloom_pos_cols(_key_h32(F.col(key))))
                    .alias("pos"))
            .distinct())


def _bloom_probe(probe_keys: DataFrame, key: str,
                 bits: DataFrame) -> DataFrame:
    """(key, bloom_positive): a key passes iff ALL K of its bit
    positions are set.  The K exploded positions left-join the bit set
    (broadcast — the filter is ≤ M rows by construction, the whole
    point of a Bloom filter) and ``bool_and`` of the per-position hits
    handles duplicate positions for one key naturally."""
    pos = (probe_keys
           .select(key,
                   F.explode(_bloom_pos_cols(_key_h32(F.col(key))))
                   .alias("pos")))
    hit = (pos.join(F.broadcast(bits.withColumn("set_", F.lit(True))),
                    "pos", "left")
           .select(key, F.coalesce("set_", F.lit(False)).alias("hit")))
    return (hit.groupBy(key)
            .agg(F.bool_and("hit").alias("bloom_positive")))


_D_BLOOM_CORE = f"""
    build AS (
        SELECT DISTINCT o_custkey AS key
        FROM orders WHERE year(o_orderdate) = 1995),
    bbits AS (
        SELECT DISTINCT p.pos
        FROM (SELECT {_D_KEY_H32.format(key='key')} AS h32 FROM build) h
        CROSS JOIN (SELECT unnest(range(0, {BLOOM_K})) AS k) ks,
        LATERAL (SELECT ([{", ".join(_BLOOM_POS_SQL)}])[ks.k + 1]
                     AS pos) p),
    probe AS (
        SELECT c_custkey AS key,
               {_D_KEY_H32.format(key='c_custkey')} AS h32
        FROM customer),
    ppos AS (
        SELECT pr.key, ([{", ".join(_BLOOM_POS_SQL)}])[ks.k + 1] AS pos
        FROM probe pr
        CROSS JOIN (SELECT unnest(range(0, {BLOOM_K})) AS k) ks),
    verdict AS (
        SELECT pp.key,
               bool_and(bb.pos IS NOT NULL) AS bloom_positive
        FROM ppos pp LEFT JOIN bbits bb ON bb.pos = pp.pos
        GROUP BY pp.key),
    truth AS (
        SELECT v.key, v.bloom_positive, b.key IS NOT NULL AS is_member
        FROM verdict v LEFT JOIN build b ON b.key = v.key)
"""


@query(
    "bloom_filter_fpr_report",
    oracle=f"""
    WITH {_D_BLOOM_CORE}
    SELECT CAST(COUNT(*) AS BIGINT) AS n_probed,
           CAST(COUNT(*) FILTER (is_member) AS BIGINT) AS n_members,
           CAST(COUNT(*) FILTER (bloom_positive) AS BIGINT)
               AS n_positives,
           CAST(COUNT(*) FILTER (bloom_positive AND NOT is_member)
                AS BIGINT) AS n_false_positives,
           CAST(COUNT(*) FILTER (is_member AND NOT bloom_positive)
                AS BIGINT) AS n_false_negatives,
           ROUND(COUNT(*) FILTER (bloom_positive AND NOT is_member)
                 * 1.0
                 / NULLIF(COUNT(*) FILTER (NOT is_member), 0), 6)
               + 0.0 AS fpr
    FROM truth
    """,
)
def bloom_filter_fpr_report(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Bloom-filter audit: build an 8192-bit / 4-hash filter over the
    custkeys holding a 1995 order, probe EVERY customer, and report the
    confusion counts — including ``n_false_negatives``, which the
    structure guarantees is zero (a member's bits are all set by
    construction; asserted per-key in the pytest suite) and the
    measured false-positive rate against the filter's non-member
    population.

    This is the runtime-pruning primitive Spark itself injects as AQE's
    bloom-filter join under the name `InjectRuntimeFilters`; expressed
    as an explicit operator it becomes usable where the optimizer can't
    see the opportunity — cross-pipeline pruning (build on yesterday's
    hot keys, probe today's scan) and semi-join pushdown into sources.
    Both sides shuffle nothing but the ≤ M-row bit set (broadcast); the
    probe is scan + hash arithmetic + ``bool_and``, partial-aggregated
    per key."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    build = (orders.filter(F.year("o_orderdate") == 1995)
             .select(F.col("o_custkey").alias("key")).distinct())
    bits = _bloom_bits(build, "key")
    probe = cust.select(F.col("c_custkey").alias("key"))
    verdict = _bloom_probe(probe, "key", bits)
    truth = (verdict.join(F.broadcast(build.withColumn("m_", F.lit(True))),
                          "key", "left")
             .select("key", "bloom_positive",
                     F.coalesce("m_", F.lit(False)).alias("is_member")))
    nonmember = F.sum(F.when(~F.col("is_member"), 1).otherwise(0))
    fp = F.sum(F.when(F.col("bloom_positive") & ~F.col("is_member"), 1)
               .otherwise(0))
    return truth.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum(F.when(F.col("is_member"), 1).otherwise(0))
        .cast("bigint").alias("n_members"),
        F.sum(F.when(F.col("bloom_positive"), 1).otherwise(0))
        .cast("bigint").alias("n_positives"),
        fp.cast("bigint").alias("n_false_positives"),
        F.sum(F.when(F.col("is_member") & ~F.col("bloom_positive"), 1)
              .otherwise(0)).cast("bigint").alias("n_false_negatives"),
        (F.round(fp * F.lit(1.0) / F.nullif(nonmember, F.lit(0)), 6)
         + F.lit(0.0)).alias("fpr"))


@query(
    "bloom_pruned_join_audit",
    oracle=f"""
    WITH {_D_BLOOM_CORE},
    surv AS (SELECT key FROM truth WHERE bloom_positive),
    o95 AS (SELECT o_custkey, o_totalprice FROM orders
            WHERE year(o_orderdate) = 1995),
    pruned AS (
        -- per-row round-then-DECIMAL-sum, mirroring the Spark form
        -- exactly: a float SUM(double) here would be accumulation-
        -- order sensitive at larger SFs (round-8 advice)
        SELECT CAST(SUM(CAST(ROUND(o.o_totalprice, 2) AS DECIMAL(18, 2)))
                    AS DECIMAL(18, 2)) AS rev
        FROM surv s JOIN o95 o ON o.o_custkey = s.key),
    exact AS (
        SELECT CAST(SUM(CAST(ROUND(o.o_totalprice, 2) AS DECIMAL(18, 2)))
                    AS DECIMAL(18, 2)) AS rev
        FROM (SELECT c_custkey FROM customer) c
        JOIN o95 o ON o.o_custkey = c.c_custkey)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_probed,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM surv)
               AS n_scanned_after_prune,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM truth)
               - (SELECT CAST(COUNT(*) AS BIGINT) FROM surv)
               AS n_pruned,
           CAST((SELECT rev FROM pruned) AS DOUBLE) AS pruned_revenue,
           CAST((SELECT rev FROM exact) AS DOUBLE) AS exact_revenue,
           (SELECT rev FROM pruned) = (SELECT rev FROM exact)
               AS results_equal
    """,
)
def bloom_pruned_join_audit(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """The Bloom filter USED: prune the customer side down to
    bloom-positive keys before joining 1995 orders, and prove the
    pruned join's revenue equals the unpruned join's — the
    no-false-negatives guarantee means pruning can only drop rows the
    join would discard anyway.  One row: probe/survivor/pruned counts,
    both revenue totals (rounded to cents and DECIMAL-summed so the
    comparison is exact, not float-luck), and the equality verdict.

    At 100 TB this is the pattern that turns a shuffle-everything
    fact-dim join into scan-side pruning: the ≤ M-row bit set
    broadcasts to the fact scan, and only surviving rows ever enter the
    exchange.  ~22% of probes are pruned on the fixtures; skew-free by
    construction since the filter is applied per-row pre-shuffle."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    build = (orders.filter(F.year("o_orderdate") == 1995)
             .select(F.col("o_custkey").alias("key")).distinct())
    bits = _bloom_bits(build, "key")
    probe = cust.select(F.col("c_custkey").alias("key"))
    verdict = _bloom_probe(probe, "key", bits).persist()
    surv = verdict.filter(F.col("bloom_positive")).select("key")
    o95 = (orders.filter(F.year("o_orderdate") == 1995)
           .select("o_custkey", "o_totalprice"))
    dec = "decimal(18,2)"
    pruned_rev = (surv.join(o95, surv["key"] == o95["o_custkey"])
                  .agg(F.sum(F.round("o_totalprice", 2).cast(dec))
                       .cast(dec).alias("rev")))
    exact_rev = (cust.select("c_custkey")
                 .join(o95, F.col("c_custkey") == F.col("o_custkey"))
                 .agg(F.sum(F.round("o_totalprice", 2).cast(dec))
                      .cast(dec).alias("rev")))
    counts = verdict.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum(F.when(F.col("bloom_positive"), 1).otherwise(0))
        .cast("bigint").alias("n_scanned_after_prune"))
    return (counts
            .crossJoin(F.broadcast(pruned_rev
                                   .withColumnRenamed("rev", "p_rev")))
            .crossJoin(F.broadcast(exact_rev
                                   .withColumnRenamed("rev", "e_rev")))
            .select("n_probed", "n_scanned_after_prune",
                    (F.col("n_probed") - F.col("n_scanned_after_prune"))
                    .alias("n_pruned"),
                    F.col("p_rev").cast("double").alias("pruned_revenue"),
                    F.col("e_rev").cast("double").alias("exact_revenue"),
                    (F.col("p_rev") == F.col("e_rev"))
                    .alias("results_equal")))


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch: keep the KMV_K smallest
# distinct hash values of a stream; if the k-th smallest is h_k, the
# distinct count is ≈ (k-1)·H/h_k (Bar-Yossef et al. 2002 — the
# bottom-k form behind the theta sketch).  Unlike HLL (rows-only per
# SURVEY.md §5.2: merge internals are engine-specific), KMV is a pure
# order statistic of a deterministic hash — exactly reproducible in
# DuckDB, so this family's estimates are value-hash-checked.
# ---------------------------------------------------------------------------
KMV_K = 64

_D_KMV = f"""
    SELECT event_type, user_id,
           {_D_KEY_H32.format(key='user_id')} AS h
    FROM events
"""


@query(
    "kmv_distinct_users_by_type",
    oracle=f"""
    WITH hs AS (SELECT DISTINCT event_type, h FROM ({_D_KMV})),
    ranked AS (
        SELECT event_type, h,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY h ASC) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n_hashes
        FROM hs),
    exact AS (
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
        FROM events GROUP BY event_type),
    est AS (
        SELECT event_type, n_hashes,
               CASE WHEN n_hashes < {KMV_K} THEN CAST(n_hashes AS DOUBLE)
                    ELSE ({KMV_K} - 1) * {H32}.0 / MAX(h)
               END AS kmv_estimate
        FROM ranked WHERE rn <= {KMV_K}
        GROUP BY event_type, n_hashes)
    SELECT e.event_type, x.exact_distinct,
           ROUND(e.kmv_estimate, 6) + 0.0 AS kmv_estimate,
           ROUND(ABS(e.kmv_estimate - x.exact_distinct)
                 / x.exact_distinct, 6) + 0.0 AS rel_error
    FROM est e JOIN exact x USING (event_type)
    """,
)
def kmv_distinct_users_by_type(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """KMV distinct-user estimate per event type, audited against the
    exact count: keep each type's 64 smallest distinct user-id hashes,
    estimate distinct users as (k−1)·H/h_k (exact count when the type
    holds fewer than k distinct hashes — the sketch IS the value set
    then), and report the relative error.  The deterministic,
    value-checked sibling of ``approx_distinct_users`` (HLL, rows-only):
    same job, auditable answer.

    Scale shape: one partial-aggregated distinct on (type, hash) — the
    only fact-scale stage — then a per-type top-k over ≤ distinct-count
    rows; the sketch that leaves each partition is ≤ k values per type,
    and two sketches merge by union-then-keep-smallest-k (the same
    mergeable contract as the CMS cells above).  Estimate/exact divide
    runs once per type."""
    ev = table(spark, sf_dir, "events")
    hs = (ev.select("event_type",
                    _key_h32(F.col("user_id")).alias("h"))
          .distinct())
    from pyspark.sql.window import Window
    # Two-phase bottom-k: a window partitioned by event_type alone has
    # only |types| partitions — one task per type at 100 TB (measured
    # 8.3× at the 32× soak).  Phase 1 keeps each (type, h%16 salt)
    # group's bottom-K (16·|types| parallel window partitions, ≤ K rows
    # survive per group); phase 2 ranks the ≤ 16K survivors per type —
    # identical result, because the global bottom-K is contained in the
    # union of per-salt bottom-Ks.  n_hashes (the exact-when-small
    # branch) is a plain partial-aggregated count, not a window.
    w1 = Window.partitionBy("event_type", F.col("h") % 16) \
               .orderBy(F.asc("h"))
    survivors = (hs.withColumn("rn1", F.row_number().over(w1))
                 .filter(F.col("rn1") <= KMV_K).drop("rn1"))
    w2 = Window.partitionBy("event_type").orderBy(F.asc("h"))
    n_hashes = hs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hashes"))
    ranked = (survivors
              .withColumn("rn", F.row_number().over(w2))
              .join(F.broadcast(n_hashes), "event_type"))
    est = (ranked.filter(F.col("rn") <= KMV_K)
           .groupBy("event_type", "n_hashes")
           .agg(F.max("h").alias("hk"))
           .select("event_type",
                   F.when(F.col("n_hashes") < KMV_K,
                          F.col("n_hashes").cast("double"))
                   .otherwise(F.lit(float(KMV_K - 1)) * F.lit(float(H32))
                              / F.col("hk"))
                   .alias("kmv_estimate")))
    exact = (ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").cast("bigint")
                  .alias("exact_distinct")))
    return (est.join(exact, "event_type")
            .select("event_type", "exact_distinct",
                    (F.round("kmv_estimate", 6) + F.lit(0.0))
                    .alias("kmv_estimate"),
                    (F.round(F.abs(F.col("kmv_estimate")
                                   - F.col("exact_distinct"))
                             / F.col("exact_distinct"), 6) + F.lit(0.0))
                    .alias("rel_error")))


# ---------------------------------------------------------------------------
# AMS F₂ sketch (Alon-Matias-Szegedy 1996): estimate the second
# frequency moment Σ c_u² — the SELF-JOIN SIZE on the key — from
# AMS_R independent ±1-signed sums.  Join-size estimation is what a
# 100-TB planner wants before committing to a shuffle strategy; the
# estimator here is the classic median-of-squares, fully deterministic
# given the md5-derived sign hashes, hence oracle-checked.
# ---------------------------------------------------------------------------
AMS_R = 16
AMS_A = [_const(f"ams_a{j}", 1, 1 << 30) for j in range(AMS_R)]
AMS_B = [_const(f"ams_b{j}", 0, 1 << 30) for j in range(AMS_R)]

_AMS_SIGN_SQL = [
    f"(2 * ((({AMS_A[j]} * h32 + {AMS_B[j]}) % {P}) % 2) - 1)"
    for j in range(AMS_R)]


def _ams_sign_cols(h32):
    return F.array(*[
        F.lit(2) * (((F.lit(AMS_A[j]) * h32 + F.lit(AMS_B[j])) % F.lit(P))
                    % F.lit(2)) - F.lit(1)
        for j in range(AMS_R)])


@query(
    "ams_selfjoin_size_estimate",
    oracle=f"""
    WITH c AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt,
               {_D_KEY_H32.format(key='user_id')} AS h32
        FROM events GROUP BY 1),
    sk AS (
        SELECT j.j,
               SUM(cnt * ([{", ".join(_AMS_SIGN_SQL)}])[j.j + 1]) AS s
        FROM c CROSS JOIN (SELECT unnest(range(0, {AMS_R})) AS j) j
        GROUP BY j.j),
    est AS (SELECT MEDIAN(s * s) AS ams_estimate FROM sk),
    exact AS (SELECT CAST(SUM(cnt * cnt) AS BIGINT) AS exact_f2 FROM c)
    SELECT x.exact_f2,
           ROUND(e.ams_estimate, 6) + 0.0 AS ams_estimate,
           ROUND(ABS(e.ams_estimate - x.exact_f2) / x.exact_f2, 6) + 0.0
               AS rel_error,
           CAST({AMS_R} AS BIGINT) AS n_estimators
    FROM est e, exact x
    """,
)
def ams_selfjoin_size_estimate(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """AMS F₂ estimate of the events⋈events self-join size on user_id,
    audited against the exact Σc²: 16 independent ±1-signed sums of the
    per-user counts, squared, median-combined — next to the exact
    second moment and the relative error.  This is the sketch a
    distributed planner consults before picking a join strategy (a
    large F₂ means heavy keys and a skew-prone shuffle — the same
    signal ``salted_join`` acts on), and the median-of-squares form is
    the textbook one.

    Scale shape: per-user counts are one partial-aggregated groupBy
    (the only fact-scale stage); the 16 signed sums are one more
    aggregation over user-grain rows (each ±1 is arithmetic on the
    already-computed hash — no second scan), and each estimator's
    signed sum merges across partitions by plain addition, the
    mergeable contract again.  The 16-row estimator frame reduces to
    its median on one executor."""
    ev = table(spark, sf_dir, "events")
    c = (ev.groupBy("user_id")
         .agg(F.count(F.lit(1)).cast("bigint").alias("cnt")))
    signed = c.select(
        "cnt", F.posexplode(_ams_sign_cols(_key_h32(F.col("user_id"))))
        .alias("j", "sign"))
    sk = (signed.groupBy("j")
          .agg(F.sum(F.col("cnt") * F.col("sign")).alias("s")))
    est = sk.agg(F.median(F.col("s") * F.col("s")).alias("ams_estimate"))
    exact = c.agg(F.sum(F.col("cnt") * F.col("cnt")).cast("bigint")
                  .alias("exact_f2"))
    return (est.crossJoin(F.broadcast(exact))
            .select("exact_f2",
                    (F.round("ams_estimate", 6) + F.lit(0.0))
                    .alias("ams_estimate"),
                    (F.round(F.abs(F.col("ams_estimate")
                                   - F.col("exact_f2"))
                             / F.col("exact_f2"), 6) + F.lit(0.0))
                    .alias("rel_error"),
                    F.lit(AMS_R).cast("bigint").alias("n_estimators")))


# ---------------------------------------------------------------------------
# Theta-sketch set algebra (Dasgupta et al., the DataSketches theta
# model) over KMV bottom-k sketches: estimate |A ∪ B| and |A ∩ B| of
# two user sets FROM THEIR SKETCHES ALONE.  θ = min(θ_A, θ_B); every
# retained hash below θ is a fixed-rate sample of its set, so
# |{h < θ}| · H/θ estimates any set-expression's cardinality by
# applying the expression to the retained hash sets.  This is what
# distinct-count sketches exist for at 100 TB — audience overlap /
# cross-corpus contamination answered from KB-scale summaries without
# re-touching either corpus — and, like KMV, it is a pure order
# statistic of the deterministic md5 hash: fully value-hash-checked.
# ---------------------------------------------------------------------------
THETA_SET_A, THETA_SET_B = "purchase", "click"


@query(
    "theta_sketch_set_ops",
    oracle=f"""
    WITH hs AS (
        SELECT DISTINCT event_type,
               {_D_KEY_H32.format(key='user_id')} AS h
        FROM events
        WHERE event_type IN ('{THETA_SET_A}', '{THETA_SET_B}')),
    ranked AS (
        SELECT event_type, h,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY h ASC) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM hs),
    theta AS (
        SELECT event_type,
               CAST(CASE WHEN MAX(n) >= {KMV_K}
                         THEN MAX(CASE WHEN rn = {KMV_K} THEN h END)
                         ELSE {H32} END AS BIGINT) AS th
        FROM ranked GROUP BY event_type),
    tu AS (SELECT MIN(th) AS theta_u FROM theta),
    ret AS (SELECT event_type, h FROM ranked, tu
            WHERE rn <= {KMV_K} AND h < tu.theta_u),
    su AS (SELECT CAST(COUNT(DISTINCT h) AS BIGINT) AS cu FROM ret),
    si AS (SELECT CAST(COUNT(*) AS BIGINT) AS ci FROM (
           SELECT h FROM ret WHERE event_type = '{THETA_SET_A}'
           INTERSECT
           SELECT h FROM ret WHERE event_type = '{THETA_SET_B}')),
    exu AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_union
            FROM events
            WHERE event_type IN ('{THETA_SET_A}', '{THETA_SET_B}')),
    exi AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_intersection FROM (
            SELECT DISTINCT user_id FROM events
            WHERE event_type = '{THETA_SET_A}'
            INTERSECT
            SELECT DISTINCT user_id FROM events
            WHERE event_type = '{THETA_SET_B}'))
    SELECT ROUND(su.cu * {H32}.0 / tu.theta_u, 6) + 0.0 AS est_union,
           exu.exact_union,
           ROUND(ABS(su.cu * {H32}.0 / tu.theta_u - exu.exact_union)
                 / exu.exact_union, 6) + 0.0 AS union_rel_error,
           ROUND(si.ci * {H32}.0 / tu.theta_u, 6) + 0.0
               AS est_intersection,
           exi.exact_intersection,
           ROUND(ABS(si.ci * {H32}.0 / tu.theta_u
                     - exi.exact_intersection)
                 / exi.exact_intersection, 6) + 0.0
               AS intersection_rel_error
    FROM su, si, tu, exu, exi
    """,
)
def theta_sketch_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union and intersection cardinality of the purchase-user and
    click-user sets estimated from their bottom-k sketches alone
    (θ = min of the two sketch thresholds; retained hashes below θ are
    a fixed-rate sample, so count·H/θ prices any set expression),
    audited against the exact distinct counts.  One row: both
    estimates, both exacts, both relative errors — all deterministic,
    all value-hash-checked.

    Scale shape: the only fact-scale stage is the partial-aggregated
    distinct on (set, hash); the sketches leave each partition as
    ≤ k values per set (the salted two-phase bottom-k from the KMV
    query), and every set operation thereafter runs on ≤ 2k retained
    hashes.  Two corpora that never co-reside can answer their overlap
    by shipping kilobytes — the mergeable-summaries contract extended
    from single-set counts to set ALGEBRA."""
    from pyspark.sql.window import Window

    ev = (table(spark, sf_dir, "events")
          .filter(F.col("event_type").isin(THETA_SET_A, THETA_SET_B)))
    hs = (ev.select("event_type", _key_h32(F.col("user_id")).alias("h"))
          .distinct())
    # salted two-phase bottom-k (KMV rationale: |sets| window
    # partitions is a one-task-per-set cliff at scale)
    w1 = Window.partitionBy("event_type", F.col("h") % 16) \
               .orderBy(F.asc("h"))
    survivors = (hs.withColumn("rn1", F.row_number().over(w1))
                 .filter(F.col("rn1") <= KMV_K).drop("rn1"))
    n_hashes = hs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"))
    w2 = Window.partitionBy("event_type").orderBy(F.asc("h"))
    ranked = (survivors.withColumn("rn", F.row_number().over(w2))
              .filter(F.col("rn") <= KMV_K)
              .join(F.broadcast(n_hashes), "event_type"))
    theta = (ranked.groupBy("event_type", "n")
             .agg(F.max("h").alias("hk"))
             .select(F.when(F.col("n") >= KMV_K, F.col("hk"))
                     .otherwise(F.lit(H32)).cast("bigint").alias("th")))
    theta_u = theta.agg(F.min("th").alias("theta_u"))
    ret = (ranked.select("event_type", "h")
           .crossJoin(F.broadcast(theta_u))
           .filter(F.col("h") < F.col("theta_u")))
    cu = ret.select("h").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("cu"))
    si = (ret.filter(F.col("event_type") == THETA_SET_A).select("h")
          .intersect(
              ret.filter(F.col("event_type") == THETA_SET_B).select("h"))
          .agg(F.count(F.lit(1)).cast("bigint").alias("ci")))
    exu = ev.agg(F.countDistinct("user_id").cast("bigint")
                 .alias("exact_union"))
    exi = (ev.filter(F.col("event_type") == THETA_SET_A)
           .select("user_id").distinct()
           .intersect(ev.filter(F.col("event_type") == THETA_SET_B)
                      .select("user_id").distinct())
           .agg(F.count(F.lit(1)).cast("bigint")
                .alias("exact_intersection")))
    h = F.lit(float(H32))
    out = (cu.crossJoin(F.broadcast(si))
           .crossJoin(F.broadcast(theta_u))
           .crossJoin(F.broadcast(exu))
           .crossJoin(F.broadcast(exi)))
    est_u = F.col("cu") * h / F.col("theta_u")
    est_i = F.col("ci") * h / F.col("theta_u")
    return out.select(
        (F.round(est_u, 6) + F.lit(0.0)).alias("est_union"),
        "exact_union",
        (F.round(F.abs(est_u - F.col("exact_union"))
                 / F.col("exact_union"), 6) + F.lit(0.0))
        .alias("union_rel_error"),
        (F.round(est_i, 6) + F.lit(0.0)).alias("est_intersection"),
        "exact_intersection",
        (F.round(F.abs(est_i - F.col("exact_intersection"))
                 / F.col("exact_intersection"), 6) + F.lit(0.0))
        .alias("intersection_rel_error"))


# ---------------------------------------------------------------------------
# HDR-style log2 histogram quantiles (Gil Tene's HdrHistogram bucketing):
# integer-exact bucket indices — the exponent comes from length(bin(x)),
# never from libm log — so the sketch, its quantile estimates, and the
# error envelope are bit-identical in DuckDB and the query hash-checks.
# This is the value-checked sibling of the rows-only approx_percentile
# queries (SURVEY.md §5.2), exactly as CMS/KMV are for HLL-class counts.
# Sub-bucket resolution: 2 extra mantissa bits -> relative error <= 1/4.
# ---------------------------------------------------------------------------
_HDR_PS = [0.5, 0.9, 0.99]


def _hdr_bucket_sql(scaled: str) -> str:
    e = f"(length(bin({scaled})) - 1)"
    return (f"CASE WHEN {e} < 2 THEN {scaled} "
            f"ELSE ({scaled} >> ({e} - 2)) << ({e} - 2) END")


@query(
    "hdr_histogram_value_quantiles",
    oracle=f"""
    WITH vc AS (
        SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS scaled,
               COUNT(*) AS cnt
        FROM events GROUP BY 1, 2),
    n AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n_values
          FROM vc GROUP BY 1),
    tgt AS (
        SELECT event_type, p, n_values,
               CAST(CEIL(p * n_values) AS BIGINT) AS rnk
        FROM n CROSS JOIN (SELECT unnest([{", ".join(
            f"CAST({p} AS DOUBLE)" for p in _HDR_PS)}]) AS p)),
    cum AS (
        SELECT event_type, scaled,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY scaled)
                   AS cum
        FROM vc),
    exact AS (
        SELECT t.event_type, t.p, MIN(c.scaled) AS exact_cents
        FROM tgt t JOIN cum c
          ON c.event_type = t.event_type AND c.cum >= t.rnk
        GROUP BY 1, 2),
    bc AS (
        SELECT event_type, {_hdr_bucket_sql("scaled")} AS bucket_lo,
               SUM(cnt) AS bcnt
        FROM vc GROUP BY 1, 2),
    bcum AS (
        SELECT event_type, bucket_lo,
               SUM(bcnt) OVER (PARTITION BY event_type ORDER BY bucket_lo)
                   AS cum
        FROM bc),
    est AS (
        SELECT t.event_type, t.p, MIN(b.bucket_lo) AS est_cents
        FROM tgt t JOIN bcum b
          ON b.event_type = t.event_type AND b.cum >= t.rnk
        GROUP BY 1, 2)
    SELECT t.event_type, t.p, t.n_values, e.est_cents, x.exact_cents,
           e.est_cents <= x.exact_cents
               AND x.exact_cents * 4 <= e.est_cents * 5 AS within_bound
    FROM tgt t
    JOIN est e ON e.event_type = t.event_type AND e.p = t.p
    JOIN exact x ON x.event_type = t.event_type AND x.p = t.p
    ORDER BY t.event_type, t.p
    """,
)
def hdr_histogram_value_quantiles(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """HDR-histogram quantile estimates (p50/p90/p99 of ``value`` per
    event type) next to their exact rank-equivalent, plus the executed
    error envelope: the bucket lower bound can undershoot the true
    discrete quantile by at most the sub-bucket width, 25% relative —
    ``within_bound`` asserts exactly that, in integer cents, inside the
    query.

    Bucketing is HdrHistogram's: values scale to integer cents, the
    octave is the binary exponent (``length(bin(x)) - 1`` — integer
    string length, NOT libm log, so both engines agree bit-for-bit),
    and 2 extra mantissa bits split each octave into 4 sub-buckets.
    The sketch is a (type, bucket)-grain count frame: mergeable by
    addition, O(octaves x 4) cells per type regardless of input size.
    At 100 TB the value-grain pre-aggregation is the only corpus-scale
    stage (map-side combine on (type, cents)); the histogram itself is
    a few hundred cells and the rank scan is window work over those
    cells.  Exact twin computed from the SAME value-grain frame via
    cumulative counts — one extra window over an already-tiny frame."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("scaled"))
    # three consumers (totals, exact cum-counts, bucket counts) — one
    # corpus-scale pass, cached at the bounded value grain
    vc = ev.groupBy("event_type", "scaled").agg(
        F.count(F.lit(1)).alias("cnt")).persist()
    n = vc.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("n_values"))
    ps = F.array(*[F.lit(float(p)) for p in _HDR_PS])
    tgt = (n.select("event_type", "n_values",
                    F.explode(ps).alias("p"))
           .withColumn("rnk", F.ceil(F.col("p") * F.col("n_values"))))
    cum_w = (Window.partitionBy("event_type").orderBy("scaled")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = vc.withColumn("cum", F.sum("cnt").over(cum_w))
    exact = (tgt.join(cum, "event_type")
             .filter(F.col("cum") >= F.col("rnk"))
             .groupBy("event_type", "p")
             .agg(F.min("scaled").alias("exact_cents")))
    bc = (vc.withColumn(
              "bucket_lo",
              F.expr("CASE WHEN length(bin(scaled)) - 1 < 2 THEN scaled"
                     " ELSE shiftleft(shiftright(scaled,"
                     " length(bin(scaled)) - 3),"
                     " length(bin(scaled)) - 3) END"))
          .groupBy("event_type", "bucket_lo")
          .agg(F.sum("cnt").alias("bcnt")))
    bcum_w = (Window.partitionBy("event_type").orderBy("bucket_lo")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    bcum = bc.withColumn("cum", F.sum("bcnt").over(bcum_w))
    est = (tgt.join(bcum, "event_type")
           .filter(F.col("cum") >= F.col("rnk"))
           .groupBy("event_type", "p")
           .agg(F.min("bucket_lo").alias("est_cents")))
    return (tgt.join(est, ["event_type", "p"])
            .join(exact, ["event_type", "p"])
            .select("event_type", "p", "n_values", "est_cents",
                    "exact_cents",
                    ((F.col("est_cents") <= F.col("exact_cents"))
                     & (F.col("exact_cents") * 4
                        <= F.col("est_cents") * 5))
                    .alias("within_bound"))
            .orderBy("event_type", "p"))


# ---------------------------------------------------------------------------
# Deterministic HyperLogLog (Flajolet et al. 2007): m=16 registers keyed
# by the low 4 hash bits, rho = leading-zero rank of the remaining 28
# bits, computed as 29 - length(bin(r)) — integer-exact in both engines.
# The harmonic sum is a sum of exact powers of two (every term and every
# partial sum is an exact multiple of 2^-29 within 34 significant bits),
# so even the double arithmetic is order-independent and the estimate
# hash-checks.  This upgrades the rows-only approx_distinct class to a
# value-checked query, the same move CMS/KMV made for counts.
# ---------------------------------------------------------------------------
HLL_M = 16
HLL_ALPHA16 = 0.673  # Flajolet's alpha_m for m=16


@query(
    "hll_register_cardinality",
    oracle=f"""
    WITH hashed AS (
        SELECT event_type,
               CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)
                    AS BIGINT) % {H32} AS h32
        FROM events),
    rho AS (
        SELECT event_type, h32 % {HLL_M} AS reg,
               CASE WHEN h32 // {HLL_M} = 0 THEN 29
                    ELSE 29 - length(bin(h32 // {HLL_M})) END AS rho
        FROM hashed),
    regs AS (
        SELECT event_type, reg, MAX(rho) AS m_j
        FROM rho GROUP BY 1, 2
        UNION ALL
        SELECT 'ALL' AS event_type, reg, MAX(rho) AS m_j
        FROM rho GROUP BY reg),
    sums AS (
        SELECT event_type,
               SUM(CAST(1.0 AS DOUBLE)
                   / CAST(1::BIGINT << m_j AS DOUBLE)) AS s_present,
               CAST(COUNT(*) AS BIGINT) AS v_present
        FROM regs GROUP BY 1),
    ex AS (
        SELECT event_type, CAST(COUNT(DISTINCT event_id) AS BIGINT)
                   AS exact_distinct
        FROM events GROUP BY 1
        UNION ALL
        SELECT 'ALL', CAST(COUNT(DISTINCT event_id) AS BIGINT)
        FROM events),
    est AS (
        SELECT s.event_type, x.exact_distinct,
               {HLL_M} - s.v_present AS zero_registers,
               {HLL_ALPHA16} * {HLL_M * HLL_M}
                   / (s.s_present + ({HLL_M} - s.v_present)) AS raw
        FROM sums s JOIN ex x ON x.event_type = s.event_type)
    SELECT event_type, exact_distinct,
           ROUND(raw, 4) AS hll_estimate,
           ROUND(ABS(raw / exact_distinct - 1.0), 4) AS rel_err,
           zero_registers,
           raw <= 2.5 * {HLL_M} AND zero_registers > 0
               AS used_linear_counting,
           ABS(raw / exact_distinct - 1.0) <= 0.8 AS within_bound
    FROM est
    ORDER BY event_type
    """,
)
def hll_register_cardinality(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count estimate of event_ids per event type
    PLUS the merged all-types sketch, next to exact counts and the
    executed error envelope — every register, the harmonic sum, and the
    raw estimate are deterministic functions of the input multiset, so
    the whole pipeline hash-checks against DuckDB (unlike Spark's
    approx_count_distinct, whose engine-internal HLL is sanctioned
    rows-only per SURVEY.md §5.2).

    m=16 registers: register = low 4 bits of the md5-derived h32, rho =
    leading-zero rank of the remaining 28 bits via length(bin(r)) —
    integer arithmetic only.  The 'ALL' row is max-merged from the same
    register frame, value-checking HLL's defining property (register-
    wise max = sketch of the union) inside the query.  The raw
    small-range branch is REPORTED (`used_linear_counting`) rather than
    taken: fixtures keep every group in the raw regime (pytest-pinned),
    and branching into libm's ln() would put cross-libm rounding in the
    hash path.  At 100 TB the only corpus-scale stage is the
    (type, register)-grain max — map-side combined, 16 cells per type;
    the exact twin is the one genuinely expensive stage (COUNT DISTINCT
    over the corpus) and exists only to audit the estimate."""
    ev = table(spark, sf_dir, "events")
    h32 = (F.conv(F.substring(
        F.md5(F.col("event_id").cast("string").cast("binary")), 1, 15),
        16, 10).cast("bigint") % F.lit(H32))
    r = F.expr(f"h32 DIV {HLL_M}")
    rho = (ev.select("event_type", h32.alias("h32"))
           .select("event_type",
                   (F.col("h32") % HLL_M).alias("reg"),
                   F.when(r == 0, F.lit(29))
                   .otherwise(F.lit(29) - F.length(F.bin(r)))
                   .alias("rho")))
    per_type = rho.groupBy("event_type", "reg").agg(
        F.max("rho").alias("m_j"))
    merged = (rho.groupBy("reg").agg(F.max("rho").alias("m_j"))
              .select(F.lit("ALL").alias("event_type"), "reg", "m_j"))
    regs = per_type.unionByName(merged)
    sums = regs.groupBy("event_type").agg(
        F.sum(F.expr("1.0D / cast(shiftleft(1L, m_j) as double)"))
        .alias("s_present"),
        F.count(F.lit(1)).cast("bigint").alias("v_present"))
    ex = (ev.groupBy("event_type")
          .agg(F.countDistinct("event_id").alias("exact_distinct"))
          .unionByName(ev.agg(F.countDistinct("event_id")
                              .alias("exact_distinct"))
                       .select(F.lit("ALL").alias("event_type"),
                               "exact_distinct")))
    raw = (F.lit(HLL_ALPHA16) * F.lit(HLL_M * HLL_M)
           / (F.col("s_present") + (F.lit(HLL_M) - F.col("v_present"))))
    return (sums.join(ex, "event_type")
            .select("event_type", "exact_distinct",
                    F.round(raw, 4).alias("hll_estimate"),
                    F.round(F.abs(raw / F.col("exact_distinct") - 1.0), 4)
                    .alias("rel_err"),
                    (F.lit(HLL_M) - F.col("v_present"))
                    .alias("zero_registers"),
                    ((raw <= F.lit(2.5 * HLL_M))
                     & (F.lit(HLL_M) - F.col("v_present") > 0))
                    .alias("used_linear_counting"),
                    (F.abs(raw / F.col("exact_distinct") - 1.0)
                     <= F.lit(0.8)).alias("within_bound"))
            .orderBy("event_type"))
