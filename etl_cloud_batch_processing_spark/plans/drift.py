"""Distribution-drift monitors: the statistical tests a production data
pipeline runs between two time periods (or between a reference and a
candidate corpus) before shipping a model or a dataset refresh.

The reference's pipelines recompute daily aggregates over a date window
(reference dags/daily_search_history.py:57-65 — the same day-grain
period split used here); an engine serving the same tables is expected
to answer "did the distribution move?" questions over them.  This
module adds the four canonical monitors — two-sample Kolmogorov-
Smirnov, chi-square homogeneity, Population Stability Index, and
Benford first-digit deviation — plus the autocorrelation function that
separates weekly seasonality from genuine drift (the companion of
``value_cusum_drift`` / ``weekday_seasonality_profile`` in temporal.py).

Engine discipline shared by every query here:

* the ONLY corpus-scale work is one partial-aggregated groupBy to a
  bounded grain (type × digit, type × bin, type × grid-value, type ×
  day); every window/join after that runs on that bounded frame;
* cross-engine determinism comes from integer arithmetic carried as far
  as possible (counts, cross-multiplied ECDF differences, string-form
  first digits) with one ROUND at the display boundary — transcendental
  functions (ln, log10) only ever touch already-rounded or constant
  inputs, the repo's round-before-rank rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_cloud_batch_processing_spark.plans.registry import query, table

# Period split for the two-sample monitors: first vs second half of the
# fixture month (events span 2024-01-01..2024-01-30, TESTDATA.md).  In
# production this is "reference window" vs "current window".
_SPLIT_DAY = 16  # day-of-month where period B starts


def _period_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events with a period tag: 'a' = days 1..15, 'b' = days 16..end."""
    ev = table(spark, sf_dir, "events")
    return ev.withColumn(
        "period",
        F.when(F.dayofmonth("ts") < _SPLIT_DAY, F.lit("a")).otherwise(
            F.lit("b")))


_PERIOD_SQL = (f"CASE WHEN EXTRACT(day FROM ts) < {_SPLIT_DAY} "
               "THEN 'a' ELSE 'b' END")


@query(
    "ks_value_drift",
    oracle=f"""
    WITH g AS (
        SELECT event_type, {_PERIOD_SQL} AS period,
               CAST(FLOOR(value * 10) AS BIGINT) AS v,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2, 3),
    p AS (
        SELECT event_type, v,
               SUM(CASE WHEN period = 'a' THEN n ELSE 0 END) AS na,
               SUM(CASE WHEN period = 'b' THEN n ELSE 0 END) AS nb
        FROM g GROUP BY 1, 2),
    c AS (
        SELECT event_type, v,
               SUM(na) OVER w AS ca, SUM(nb) OVER w AS cb,
               SUM(na) OVER t AS ta, SUM(nb) OVER t AS tb
        FROM p
        WINDOW w AS (PARTITION BY event_type ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               t AS (PARTITION BY event_type)),
    d AS (
        SELECT event_type, v, ta, tb,
               ABS(ca * tb - cb * ta) AS dnum,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY ABS(ca * tb - cb * ta) DESC,
                                           v ASC) AS rn
        FROM c)
    SELECT event_type, CAST(ta AS BIGINT) AS n_a, CAST(tb AS BIGINT) AS n_b,
           ROUND(dnum * 1.0 / (ta * tb), 6) + 0.0 AS ks_stat,
           v / 10.0 + 0.0 AS ks_at_value
    FROM d WHERE rn = 1
    """,
)
def ks_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic on the value distribution
    between the first and second half of the month, per event type: the
    max vertical gap between the two empirical CDFs, plus the value at
    which it occurs — the standard "did the metric distribution move?"
    gate of a data-quality pipeline.

    The ECDFs are evaluated on a fixed 0.1-wide grid (``FLOOR(value *
    10)``): the KS statistic of the discretized distributions.  The
    grid is what makes this scale — the per-type cumulative window runs
    over at most range/0.1 grid rows (bounded by the value domain, NOT
    by corpus size), after ONE partial-aggregated groupBy does all the
    corpus-scale counting.  Determinism: the grid key is FLOOR of an
    IEEE product (bit-identical across engines, unlike decimal ROUND
    on a double, whose Spark BigDecimal shortest-repr semantics can
    disagree with a C-library round at half boundaries); the gap is
    ranked on the exact integer cross-product |ca·tb − cb·ta| (no
    float in the argmax); the statistic divides once at the end; and
    the argmax tiebreak is the smallest grid value."""
    g = (_period_tagged(spark, sf_dir)
         .groupBy("event_type", "period",
                  F.floor(F.col("value") * 10).alias("v"))
         .agg(F.count(F.lit(1)).alias("n")))
    p = (g.groupBy("event_type", "v")
         .agg(F.sum(F.when(F.col("period") == "a", F.col("n"))
                    .otherwise(F.lit(0))).alias("na"),
              F.sum(F.when(F.col("period") == "b", F.col("n"))
                    .otherwise(F.lit(0))).alias("nb")))
    cum = (Window.partitionBy("event_type").orderBy("v")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tot = Window.partitionBy("event_type")
    c = p.select(
        "event_type", "v",
        F.sum("na").over(cum).alias("ca"),
        F.sum("nb").over(cum).alias("cb"),
        F.sum("na").over(tot).alias("ta"),
        F.sum("nb").over(tot).alias("tb"))
    d = c.withColumn("dnum", F.abs(F.col("ca") * F.col("tb")
                                   - F.col("cb") * F.col("ta")))
    rank = Window.partitionBy("event_type").orderBy(F.desc("dnum"),
                                                    F.asc("v"))
    return (d.withColumn("rn", F.row_number().over(rank))
            .filter(F.col("rn") == 1)
            .select("event_type",
                    F.col("ta").alias("n_a"), F.col("tb").alias("n_b"),
                    (F.round(F.col("dnum") * 1.0
                             / (F.col("ta") * F.col("tb")), 6)
                     + F.lit(0.0)).alias("ks_stat"),
                    (F.col("v") / 10.0 + F.lit(0.0))
                    .alias("ks_at_value")))


@query(
    "chi2_type_mix_drift",
    oracle=f"""
    WITH c AS (
        SELECT event_type,
               SUM(CASE WHEN {_PERIOD_SQL} = 'a' THEN 1 ELSE 0 END) AS na,
               SUM(CASE WHEN {_PERIOD_SQL} = 'b' THEN 1 ELSE 0 END) AS nb
        FROM events GROUP BY 1),
    t AS (SELECT SUM(na) AS ta, SUM(nb) AS tb FROM c)
    SELECT event_type,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           ROUND(na * 1.0 / ta, 6) + 0.0 AS share_a,
           ROUND(nb * 1.0 / tb, 6) + 0.0 AS share_b,
           ROUND((na - (na + nb) * ta * 1.0 / (ta + tb))
                 * (na - (na + nb) * ta * 1.0 / (ta + tb))
                     / ((na + nb) * ta * 1.0 / (ta + tb))
                 + (nb - (na + nb) * tb * 1.0 / (ta + tb))
                 * (nb - (na + nb) * tb * 1.0 / (ta + tb))
                     / ((na + nb) * tb * 1.0 / (ta + tb)), 6) + 0.0
               AS chi2_contrib
    FROM c CROSS JOIN t
    """,
)
def chi2_type_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square homogeneity test of the event-type mix between the
    two halves of the month: per type, the period counts, shares, and
    the type's contribution to the chi-square statistic (expected
    counts under the pooled-proportions null).  The monitor that
    catches "clicks collapsed, errors doubled" category drift.

    One partial-aggregated groupBy to types rows; the totals frame is a
    single row cross-joined back (the repo's one-row-aggregate pattern,
    e.g. near_dup_triangle_stats).  Everything up to the final ROUND is
    arithmetic on exact BIGINT counts, so both engines compute the
    identical doubles."""
    c = (_period_tagged(spark, sf_dir)
         .groupBy("event_type")
         .agg(F.sum(F.when(F.col("period") == "a", 1).otherwise(0))
              .alias("na"),
              F.sum(F.when(F.col("period") == "b", 1).otherwise(0))
              .alias("nb")))
    t = c.agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"))
    j = c.crossJoin(F.broadcast(t))
    ea = (F.col("na") + F.col("nb")) * F.col("ta") * 1.0 \
        / (F.col("ta") + F.col("tb"))
    eb = (F.col("na") + F.col("nb")) * F.col("tb") * 1.0 \
        / (F.col("ta") + F.col("tb"))
    return j.select(
        "event_type",
        F.col("na").alias("n_a"), F.col("nb").alias("n_b"),
        (F.round(F.col("na") * 1.0 / F.col("ta"), 6)
         + F.lit(0.0)).alias("share_a"),
        (F.round(F.col("nb") * 1.0 / F.col("tb"), 6)
         + F.lit(0.0)).alias("share_b"),
        (F.round((F.col("na") - ea) * (F.col("na") - ea) / ea
                 + (F.col("nb") - eb) * (F.col("nb") - eb) / eb, 6)
         + F.lit(0.0)).alias("chi2_contrib"))


# PSI bin shares are clamped away from zero so ln(p_b/p_a) is defined
# for empty bins — the standard practitioner fix, applied identically
# in both engines.
_PSI_FLOOR = 1e-6
_PSI_BINS = 10


@query(
    "psi_value_drift",
    oracle=f"""
    WITH lim AS (
        SELECT MIN(value) AS lo,
               GREATEST(MAX(value) - MIN(value), 1e-12) / {_PSI_BINS}
                   AS width
        FROM events),
    b AS (
        SELECT event_type, {_PERIOD_SQL} AS period,
               LEAST({_PSI_BINS - 1},
                     CAST(FLOOR((value - lo) / width) AS BIGINT)) AS bin
        FROM events CROSS JOIN lim),
    c AS (
        SELECT event_type, bin,
               SUM(CASE WHEN period = 'a' THEN 1 ELSE 0 END) AS na,
               SUM(CASE WHEN period = 'b' THEN 1 ELSE 0 END) AS nb
        FROM b GROUP BY 1, 2),
    s AS (
        SELECT event_type, bin, na, nb,
               GREATEST(na * 1.0 / SUM(na) OVER (PARTITION BY event_type),
                        {_PSI_FLOOR}) AS pa,
               GREATEST(nb * 1.0 / SUM(nb) OVER (PARTITION BY event_type),
                        {_PSI_FLOOR}) AS pb
        FROM c),
    term AS (
        SELECT event_type, bin, CAST(na AS BIGINT) AS n_a,
               CAST(nb AS BIGINT) AS n_b,
               ROUND(pa, 6) + 0.0 AS share_a,
               ROUND(pb, 6) + 0.0 AS share_b,
               ROUND((pb - pa) * ln(pb / pa), 6) + 0.0 AS psi_term
        FROM s)
    SELECT *,
           ROUND(SUM(psi_term) OVER (PARTITION BY event_type), 6) + 0.0
               AS psi_total
    FROM term
    """,
)
def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the value distribution between the
    two halves of the month, per event type over 10 equal-width bins:
    per-bin period shares and PSI terms, plus the per-type PSI total
    (the industry drift score: <0.1 stable, >0.25 shifted).

    Equal-width bins anchored on the EXACT global min/max (no
    percentile estimation, so the bin edges are bit-identical across
    engines), with the degenerate all-equal-values guard from
    ``value_bucket_histogram`` (width floored at 1e-12/bins).  One
    corpus-scale groupBy to type × bin; shares, ln, and the PSI sum all
    run on that 50-row frame.  The per-type total sums the
    ALREADY-ROUNDED 6-decimal terms, so the sum is order-independent at
    the rounding grain — the same argument as value_ewma_last10."""
    ev = _period_tagged(spark, sf_dir)
    lim = ev.agg(
        F.min("value").alias("lo"),
        (F.greatest(F.max("value") - F.min("value"), F.lit(1e-12))
         / _PSI_BINS).alias("width"))
    b = (ev.crossJoin(F.broadcast(lim))
         .select("event_type", "period",
                 F.least(F.lit(_PSI_BINS - 1),
                         F.floor((F.col("value") - F.col("lo"))
                                 / F.col("width"))).alias("bin")))
    c = (b.groupBy("event_type", "bin")
         .agg(F.sum(F.when(F.col("period") == "a", 1).otherwise(0))
              .alias("na"),
              F.sum(F.when(F.col("period") == "b", 1).otherwise(0))
              .alias("nb")))
    tot = Window.partitionBy("event_type")
    pa = F.greatest(F.col("na") * 1.0 / F.sum("na").over(tot),
                    F.lit(_PSI_FLOOR))
    pb = F.greatest(F.col("nb") * 1.0 / F.sum("nb").over(tot),
                    F.lit(_PSI_FLOOR))
    term = c.select(
        "event_type", "bin",
        F.col("na").alias("n_a"), F.col("nb").alias("n_b"),
        (F.round(pa, 6) + F.lit(0.0)).alias("share_a"),
        (F.round(pb, 6) + F.lit(0.0)).alias("share_b"),
        (F.round((pb - pa) * F.log(pb / pa), 6)
         + F.lit(0.0)).alias("psi_term"))
    return term.withColumn(
        "psi_total",
        F.round(F.sum("psi_term").over(tot), 6) + F.lit(0.0))


@query(
    "benford_first_digit",
    oracle="""
    WITH d AS (
        SELECT event_type,
               CAST(substring(CAST(CAST(FLOOR(value * 100) AS BIGINT)
                                   AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM events WHERE value > 0),
    c AS (
        SELECT event_type, digit, CAST(COUNT(*) AS BIGINT) AS n
        FROM d GROUP BY 1, 2),
    t AS (SELECT event_type, SUM(n) AS tot FROM c GROUP BY 1)
    SELECT c.event_type, c.digit, c.n,
           ROUND(c.n * 1.0 / t.tot, 6) + 0.0 AS obs_share,
           ROUND(log10(1.0 + 1.0 / c.digit), 6) + 0.0 AS benford_share,
           ROUND(c.n * 1.0 / t.tot - log10(1.0 + 1.0 / c.digit), 6)
               + 0.0 AS deviation
    FROM c JOIN t USING (event_type)
    """,
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of the value column per event type: observed
    first-significant-digit shares vs the Benford expectation
    log10(1 + 1/d) — the classic fabricated-or-truncated-data detector
    for financial/metric columns.

    The first digit is extracted through INTEGER string form: FLOOR of
    the IEEE product value×100 (bit-identical across engines), cast to
    BIGINT, first character of its string — never through float log10
    or double formatting, both of which have engine-dependent edge
    renderings; BIGINT→string is identical everywhere.  log10 only
    ever touches the constants 1+1/d.  One corpus-scale groupBy to
    type × 9 digits, then a broadcast-size totals join."""
    ev = table(spark, sf_dir, "events").filter(F.col("value") > 0)
    d = ev.select(
        "event_type",
        F.substring(F.floor(F.col("value") * 100)
                    .cast("string"), 1, 1).cast("bigint").alias("digit"))
    c = d.groupBy("event_type", "digit").agg(
        F.count(F.lit(1)).alias("n"))
    t = c.groupBy("event_type").agg(F.sum("n").alias("tot"))
    benford = F.log10(1.0 + 1.0 / F.col("digit"))
    return (c.join(F.broadcast(t), "event_type")
            .select("event_type", "digit", "n",
                    (F.round(F.col("n") * 1.0 / F.col("tot"), 6)
                     + F.lit(0.0)).alias("obs_share"),
                    (F.round(benford, 6) + F.lit(0.0))
                    .alias("benford_share"),
                    (F.round(F.col("n") * 1.0 / F.col("tot") - benford, 6)
                     + F.lit(0.0)).alias("deviation")))


_ACF_MAX_LAG = 7


@query(
    "daily_count_acf",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2),
    mu AS (
        SELECT event_type, ROUND(AVG(x), 6) AS xbar,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM daily GROUP BY 1),
    dev AS (
        SELECT d.event_type, d.day, m.n_days, d.x - m.xbar AS e,
               ROW_NUMBER() OVER (PARTITION BY d.event_type
                                  ORDER BY d.day) AS t
        FROM daily d JOIN mu m USING (event_type)),
    den AS (
        SELECT event_type, SUM(e * e) AS ss FROM dev GROUP BY 1)
    SELECT a.event_type, l.lag, a.n_days,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(SUM(a.e * b.e) / MIN(den.ss), 6) + 0.0 AS acf
    FROM dev a
    JOIN (SELECT unnest(range(1, {_ACF_MAX_LAG + 1})) AS lag) l ON true
    JOIN dev b ON b.event_type = a.event_type AND b.t = a.t - l.lag
    JOIN den ON den.event_type = a.event_type
    GROUP BY a.event_type, l.lag, a.n_days
    """,
)
def daily_count_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of each event type's daily-count series
    at lags 1..7: the diagnostic that separates weekly
    seasonality (an ACF spike at lag 7) from level drift (slow ACF
    decay) before trusting the CUSUM monitor's changepoint.

    Corpus-scale work is ONE groupBy to the (type, day) grain; the lag
    pairing is a position equi-join of the day-grain frame against
    itself per lag (calendar-bounded rows × 7 lags, same argument as
    window_cooccurrence_pmi's offset join).  The mean is rounded to 6
    decimals BEFORE deviations so both engines form identical doubles;
    the products/sums then round once at the end."""
    ev = table(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).alias("x")))
    mu = F.broadcast(daily.groupBy("event_type").agg(
        F.round(F.avg("x"), 6).alias("xbar"),
        F.count(F.lit(1)).alias("n_days")))
    w = Window.partitionBy("event_type").orderBy("day")
    dev = (daily.join(mu, "event_type")
           .select("event_type", "n_days",
                   (F.col("x") - F.col("xbar")).alias("e"),
                   F.row_number().over(w).alias("t")))
    den = F.broadcast(dev.groupBy("event_type")
                      .agg(F.sum(F.col("e") * F.col("e")).alias("ss")))
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(
        F.col("id").alias("lag"))
    a = dev.alias("a")
    b = dev.select(F.col("event_type").alias("bet"),
                   F.col("t").alias("bt"), F.col("e").alias("be"))
    pairs = (a.crossJoin(F.broadcast(lags))
             .join(b, (F.col("bet") == F.col("a.event_type"))
                   & (F.col("bt") == F.col("a.t") - F.col("lag"))))
    return (pairs.join(den, "event_type")
            .groupBy("event_type", "lag", "n_days")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 (F.round(F.sum(F.col("a.e") * F.col("be"))
                          / F.min("ss"), 6) + F.lit(0.0)).alias("acf")))


@query(
    "null_rate_drift",
    oracle=f"""
    WITH b AS (
        SELECT {_PERIOD_SQL} AS period,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS nu_value,
               SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS nu_props,
               SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
                   AS nu_event_type
        FROM events GROUP BY 1),
    long AS (
        SELECT period, n, 'value' AS col_name, nu_value AS nu FROM b
        UNION ALL
        SELECT period, n, 'props', nu_props FROM b
        UNION ALL
        SELECT period, n, 'event_type', nu_event_type FROM b),
    p AS (
        SELECT col_name,
               SUM(CASE WHEN period = 'a' THEN nu ELSE 0 END) AS nua,
               SUM(CASE WHEN period = 'a' THEN n ELSE 0 END) AS na,
               SUM(CASE WHEN period = 'b' THEN nu ELSE 0 END) AS nub,
               SUM(CASE WHEN period = 'b' THEN n ELSE 0 END) AS nb
        FROM long GROUP BY col_name)
    SELECT col_name,
           CAST(nua AS BIGINT) AS n_nulls_a, CAST(na AS BIGINT) AS n_a,
           CAST(nub AS BIGINT) AS n_nulls_b, CAST(nb AS BIGINT) AS n_b,
           ROUND(nua * 1.0 / na, 6) + 0.0 AS null_share_a,
           ROUND(nub * 1.0 / nb, 6) + 0.0 AS null_share_b,
           ROUND(nub * 1.0 / nb - nua * 1.0 / na, 6) + 0.0
               AS drift
    FROM p
    """,
)
def null_rate_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-rate drift between the two halves of the month for the
    nullable events columns — the completeness monitor that catches
    "an upstream deploy silently stopped populating props" before any
    value-distribution test fires (the profiling companion of
    ``column_profile_events``, run as a two-period diff).

    ONE aggregation computes every column's null count for both
    periods (period is just a grouping key); the unpivot and the
    per-column period diff run on a 6-row frame.  All counts exact
    BIGINTs, one divide + round at the end."""
    b = (_period_tagged(spark, sf_dir)
         .groupBy("period")
         .agg(F.count(F.lit(1)).alias("n"),
              *[F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .alias(f"nu_{c}")
                for c in ("value", "props", "event_type")]))
    long = None
    for c in ("value", "props", "event_type"):
        part = b.select("period", "n", F.lit(c).alias("col_name"),
                        F.col(f"nu_{c}").alias("nu"))
        long = part if long is None else long.unionByName(part)
    p = (long.groupBy("col_name")
         .agg(F.sum(F.when(F.col("period") == "a", F.col("nu"))
                    .otherwise(0)).alias("nua"),
              F.sum(F.when(F.col("period") == "a", F.col("n"))
                    .otherwise(0)).alias("na"),
              F.sum(F.when(F.col("period") == "b", F.col("nu"))
                    .otherwise(0)).alias("nub"),
              F.sum(F.when(F.col("period") == "b", F.col("n"))
                    .otherwise(0)).alias("nb")))
    ra = F.col("nua") * 1.0 / F.col("na")
    rb = F.col("nub") * 1.0 / F.col("nb")
    return p.select(
        "col_name",
        F.col("nua").alias("n_nulls_a"), F.col("na").alias("n_a"),
        F.col("nub").alias("n_nulls_b"), F.col("nb").alias("n_b"),
        (F.round(ra, 6) + F.lit(0.0)).alias("null_share_a"),
        (F.round(rb, 6) + F.lit(0.0)).alias("null_share_b"),
        (F.round(rb - ra, 6) + F.lit(0.0)).alias("drift"))


@query(
    "weekday_adjusted_anomalies",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2),
    g AS (
        SELECT event_type, CAST(EXTRACT(dow FROM day) AS BIGINT) AS dow,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(y) AS sx, SUM(y * y) AS sxx
        FROM daily GROUP BY 1, 2)
    SELECT d.event_type, d.day, d.y AS n_events, g.dow,
           ROUND(g.sx * 1.0 / g.n, 6) + 0.0 AS dow_mean,
           CASE WHEN g.n * g.sxx - g.sx * g.sx = 0 THEN NULL
                ELSE ROUND((d.y * g.n - g.sx) * 1.0
                           / sqrt(g.n * g.sxx - g.sx * g.sx), 6) + 0.0
           END AS z_within_dow,
           CASE WHEN g.n * g.sxx - g.sx * g.sx = 0 THEN NULL
                ELSE abs((d.y * g.n - g.sx) * 1.0
                         / sqrt(g.n * g.sxx - g.sx * g.sx)) > 2.0
           END AS is_anomaly
    FROM daily d
    JOIN g ON g.event_type = d.event_type
          AND g.dow = CAST(EXTRACT(dow FROM d.day) AS BIGINT)
    """,
)
def weekday_adjusted_anomalies(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Deseasonalized volume anomalies: each (type, day) count z-scored
    WITHIN ITS OWN WEEKDAY GROUP — "is this Monday unusual among
    Mondays?" — the monitor that doesn't page on every weekend dip the
    way a raw daily z-score does.  The companion action to
    ``weekday_seasonality_profile`` (which measures the seasonality
    this query removes) and ``daily_count_acf`` (which detects it).

    Integers-first determinism: counts and both moment sums per
    (type, weekday) are exact BIGINTs, and the z closed form is
    rearranged to one integer numerator over one sqrt of an integer —
    (y·n − Σx)/√(n·Σx² − (Σx)²) — so both engines divide identical
    numbers once.  Zero within-group variance yields NULL on both
    sides (the daily_trend_ols guard).  One corpus-scale partial agg
    to the day grain; the weekday stats join back on a
    types×7-row broadcast."""
    ev = table(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("y")))
    dow = (F.dayofweek("day") - 1).cast("bigint")
    g = (daily.groupBy("event_type", dow.alias("dow"))
         .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
              F.sum("y").alias("sx"),
              F.sum(F.col("y") * F.col("y")).alias("sxx")))
    d = daily.withColumn("dow", dow)
    j = d.join(F.broadcast(g), ["event_type", "dow"])
    num = F.col("y") * F.col("n") - F.col("sx")
    den2 = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    z = num * 1.0 / F.sqrt(den2)
    return j.select(
        "event_type", "day", F.col("y").alias("n_events"), "dow",
        (F.round(F.col("sx") * 1.0 / F.col("n"), 6)
         + F.lit(0.0)).alias("dow_mean"),
        F.when(den2 == 0, F.lit(None).cast("double"))
        .otherwise(F.round(z, 6) + F.lit(0.0)).alias("z_within_dow"),
        F.when(den2 == 0, F.lit(None).cast("boolean"))
        .otherwise(F.abs(z) > 2.0).alias("is_anomaly"))
