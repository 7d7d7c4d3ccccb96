"""Dataset profiling & diagnostic models: the queries a warehouse runs
BEFORE trusting a table — column profiles, categorical top-values,
trend fits, mixed-type correlation, and a behavioral steady-state
model.

The reference pipelines land tables and immediately aggregate over
them (reference dags/daily_search_history.py:57-65,
dags/transaction_data.py:55-66); an engine serving those tables is
expected to answer the profiling questions a data platform asks of any
new partition: null rates, cardinalities, value ranges, dominant
categories, direction of the daily trend, and whether two columns
co-move.  This module adds that layer plus the steady-state companion
of ``event_type_transitions`` (temporal.py): the stationary
distribution of the user-behavior Markov chain.

Engine discipline shared by every query here:

* corpus-scale work is ONE pass — a single multi-aggregate (profile),
  one partial-aggregated groupBy to a bounded grain (trend,
  correlation, transitions), or one window on a high-cardinality key
  (the per-user lead); everything after runs on bounded frames;
* cross-engine determinism via integer sums carried to the last step:
  counts, day indexes, cents-quantized values, transition counts — one
  divide + ROUND at the display boundary, the repo's round-before-rank
  rule.  Where a double combination of exact integer aggregates is
  unavoidable (OLS/Pearson closed forms whose BIGINT cross-products
  would overflow), the Spark expression tree and the oracle SQL are
  written term-for-term identical so IEEE arithmetic produces the
  same bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_cloud_batch_processing_spark.plans.registry import query, table

# Profiled columns of the events table: (name, is_numeric).  Numeric
# columns additionally report min/max cast to DOUBLE (BIGINT→DOUBLE is
# exact below 2^53; DOUBLE min/max is an exact input value — both
# hash-stable without rounding).
_PROFILE_COLS = (
    ("event_id", True),
    ("ts", False),
    ("user_id", True),
    ("event_type", False),
    ("value", True),
    ("props", False),
)


def _profile_oracle() -> str:
    aggs = ["COUNT(*) AS n_rows"]
    selects = []
    for name, numeric in _PROFILE_COLS:
        aggs.append(f"SUM(CASE WHEN {name} IS NULL THEN 1 ELSE 0 END)"
                    f" AS nu_{name}")
        aggs.append(f"COUNT(DISTINCT {name}) AS nd_{name}")
        mn = (f"CAST(MIN({name}) AS DOUBLE)" if numeric
              else "CAST(NULL AS DOUBLE)")
        mx = (f"CAST(MAX({name}) AS DOUBLE)" if numeric
              else "CAST(NULL AS DOUBLE)")
        aggs.append(f"{mn} AS mn_{name}")
        aggs.append(f"{mx} AS mx_{name}")
        selects.append(f"""
    SELECT '{name}' AS col_name, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(nu_{name} AS BIGINT) AS n_nulls,
           ROUND(nu_{name} * 1.0 / n_rows, 6) + 0.0 AS null_share,
           CAST(nd_{name} AS BIGINT) AS n_distinct,
           mn_{name} AS min_num, mx_{name} AS max_num
    FROM a""")
    return ("WITH a AS (SELECT " + ", ".join(aggs) + " FROM events)"
            + " UNION ALL ".join(selects))


@query("column_profile_events", oracle=_profile_oracle())
def column_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiler of the events table: per column, the
    row count, null count/share, EXACT distinct cardinality, and (for
    numeric columns) min/max — the landing-zone audit every warehouse
    runs on a fresh partition before exposing it.

    ALL metrics for ALL six columns come out of ONE aggregation over
    one scan (Spark plans the multi-distinct via Expand — a constant
    ×columns row multiplier inside one shuffle, not one job per column,
    which is how a naive profiler written as a driver loop would run);
    the wide one-row result is then unpivoted driver-side-free with
    ``stack``.  Exact COUNT(DISTINCT) is deliberate — the approximate
    twin is ``approx_distinct_users``'s HLL family; a profile feeding
    schema decisions (is this column a key?) needs the exact answer."""
    ev = table(spark, sf_dir, "events")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, numeric in _PROFILE_COLS:
        aggs.append(F.sum(F.when(F.col(name).isNull(), 1).otherwise(0))
                    .cast("bigint").alias(f"nu_{name}"))
        aggs.append(F.count_distinct(F.col(name)).alias(f"nd_{name}"))
        mn = (F.min(name).cast("double") if numeric
              else F.lit(None).cast("double"))
        mx = (F.max(name).cast("double") if numeric
              else F.lit(None).cast("double"))
        aggs.append(mn.alias(f"mn_{name}"))
        aggs.append(mx.alias(f"mx_{name}"))
    wide = ev.agg(*aggs)
    rows = ", ".join(
        f"'{name}', CAST(n_rows AS BIGINT), nu_{name}, "
        f"ROUND(nu_{name} * 1.0D / n_rows, 6) + 0.0D, nd_{name}, "
        f"mn_{name}, mx_{name}"
        for name, _ in _PROFILE_COLS)
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {rows}) AS "
        "(col_name, n_rows, n_nulls, null_share, n_distinct,"
        " min_num, max_num)")


@query("column_profile_events_approx")  # rows-only: HLL sketches differ per engine
def column_profile_events_approx(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """The 100-TB default profiler: ``column_profile_events`` with the
    exact multi-distinct swapped for ``approx_count_distinct`` (HLL++,
    default 5% rsd).  The exact profile's COUNT(DISTINCT) per column
    plans as an Expand — a ×columns row multiplier inside the shuffle
    (its 32× soak: 6.8×); HLL sketches instead merge map-side into
    constant-size state, so this variant is ONE plain aggregation with
    no row multiplication — the same scan cost as any single groupBy.
    Use the exact profiler for key decisions, this one for routine
    landing-zone audits; ``approx_distinct_error_report`` measures the
    gap column-by-column."""
    ev = table(spark, sf_dir, "events")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, numeric in _PROFILE_COLS:
        aggs.append(F.sum(F.when(F.col(name).isNull(), 1).otherwise(0))
                    .cast("bigint").alias(f"nu_{name}"))
        aggs.append(F.approx_count_distinct(name).alias(f"nd_{name}"))
        mn = (F.min(name).cast("double") if numeric
              else F.lit(None).cast("double"))
        mx = (F.max(name).cast("double") if numeric
              else F.lit(None).cast("double"))
        aggs.append(mn.alias(f"mn_{name}"))
        aggs.append(mx.alias(f"mx_{name}"))
    wide = ev.agg(*aggs)
    rows = ", ".join(
        f"'{name}', CAST(n_rows AS BIGINT), nu_{name}, "
        f"ROUND(nu_{name} * 1.0D / n_rows, 6) + 0.0D, nd_{name}, "
        f"mn_{name}, mx_{name}"
        for name, _ in _PROFILE_COLS)
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {rows}) AS "
        "(col_name, n_rows, n_nulls, null_share, n_distinct_approx,"
        " min_num, max_num)")


@query("approx_distinct_error_report")  # rows-only: HLL sketches differ per engine
def approx_distinct_error_report(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Calibration for ``column_profile_events_approx``: per column,
    the EXACT distinct count next to the HLL++ estimate with absolute
    and relative error — the same sketch-vs-truth audit
    ``approx_percentile_error_report`` runs for percentiles.  Run on a
    sample (or one partition) at scale to decide whether the default
    5% rsd is acceptable before switching routine profiling to the
    approximate twin; the exact Expand is the deliberate, bounded cost
    of calibration, not of the production path.

    The exact and approximate sides run as SEPARATE one-row
    aggregations joined at the end: putting HLL aggregates inside the
    multi-distinct aggregation would drag them through the Expand
    (sketch state updated once per expanded row per column — measured
    5.4× slower at 32× data than the split form)."""
    ev = table(spark, sf_dir, "events")
    ex = ev.agg(*[F.count_distinct(F.col(name)).alias(f"ex_{name}")
                  for name, _ in _PROFILE_COLS])
    ap = ev.agg(*[F.approx_count_distinct(name).alias(f"ap_{name}")
                  for name, _ in _PROFILE_COLS])
    wide = ex.crossJoin(F.broadcast(ap))
    rows = ", ".join(
        f"'{name}', ex_{name}, ap_{name}, "
        f"CAST(abs(ap_{name} - ex_{name}) AS BIGINT), "
        f"ROUND(abs(ap_{name} - ex_{name}) * 1.0D / ex_{name}, 6) + 0.0D"
        for name, _ in _PROFILE_COLS)
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {rows}) AS "
        "(col_name, n_distinct_exact, n_distinct_approx,"
        " abs_error, rel_error)")


_TOP_VALUES_K = 3


@query(
    "top_values_profile",
    oracle=f"""
    WITH long AS (
        SELECT 'lang' AS col_name, lang AS value FROM documents
        UNION ALL
        SELECT 'source' AS col_name, source AS value FROM documents),
    c AS (
        SELECT col_name, value, CAST(COUNT(*) AS BIGINT) AS n
        FROM long GROUP BY 1, 2),
    r AS (
        SELECT col_name, value, n,
               SUM(n) OVER (PARTITION BY col_name) AS tot,
               ROW_NUMBER() OVER (PARTITION BY col_name
                                  ORDER BY n DESC, value ASC) AS rnk
        FROM c)
    SELECT col_name, value, n,
           ROUND(n * 1.0 / tot, 6) + 0.0 AS share,
           CAST(rnk AS INTEGER) AS rnk
    FROM r WHERE rnk <= {_TOP_VALUES_K}
    """,
)
def top_values_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical-column profile of the documents table: the top
    {_TOP_VALUES_K} most frequent values of ``lang`` and ``source``
    with count, corpus share, and rank — the "what dominates this
    column?" half of profiling that min/max can't answer for strings.

    One corpus-scale groupBy to (column, value) grain per column —
    both columns stacked into one long frame first so the profile is
    again ONE aggregation over one scan — then ranking and totals run
    as windows over the tiny distinct-values frame.  Rank carries the
    house total tiebreak (count desc, value asc)."""
    docs = table(spark, sf_dir, "documents")
    long = (docs.select(F.lit("lang").alias("col_name"),
                        F.col("lang").alias("value"))
            .unionByName(docs.select(F.lit("source").alias("col_name"),
                                     F.col("source").alias("value"))))
    c = long.groupBy("col_name", "value").agg(
        F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy("col_name")
    rnk = Window.partitionBy("col_name").orderBy(F.desc("n"),
                                                 F.asc("value"))
    return (c.select("col_name", "value", "n",
                     (F.round(F.col("n") * 1.0 / F.sum("n").over(tot), 6)
                      + F.lit(0.0)).alias("share"),
                     F.row_number().over(rnk).alias("rnk"))
            .filter(F.col("rnk") <= _TOP_VALUES_K))


@query(
    "daily_trend_ols",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2),
    idx AS (
        SELECT event_type, y,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY day) AS t
        FROM daily),
    s AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(t) AS sx, SUM(y) AS sy, SUM(t * y) AS sxy,
               SUM(t * t) AS sxx, SUM(y * y) AS syy
        FROM idx GROUP BY 1)
    SELECT event_type, n AS n_days,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE ROUND((n * sxy - sx * sy) * 1.0
                           / (n * sxx - sx * sx), 6) + 0.0
           END AS slope,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE ROUND((sy * sxx - sx * sxy) * 1.0
                           / (n * sxx - sx * sx), 6) + 0.0
           END AS intercept,
           CASE WHEN n * syy - sy * sy = 0
                     OR n * sxx - sx * sx = 0 THEN NULL
                ELSE ROUND((n * sxy - sx * sy) * 1.0 * (n * sxy - sx * sy)
                           / ((n * sxx - sx * sx) * 1.0
                              * (n * syy - sy * sy)), 6) + 0.0
           END AS r2
    FROM s
    """,
)
def daily_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinary-least-squares trend fit of each event type's daily
    count series (y = slope·t + intercept over day index t, plus R²) —
    the "is this metric growing or decaying, and how linearly?" gate a
    monitoring pipeline runs before alerting on the CUSUM changepoint
    (``value_cusum_drift``).

    Corpus-scale work is ONE partial-aggregated groupBy to the
    (type, day) grain; the day index, the five OLS sums, and the
    closed-form solve all run on that calendar-bounded frame.  Every
    sum is an exact BIGINT (t and y are integers), so both engines
    solve from identical inputs; the closed forms divide once and
    round at the end — except R²'s squared numerator, which would
    overflow BIGINT and is therefore combined in DOUBLE with the
    oracle written term-for-term identical (IEEE determinism)."""
    ev = table(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).alias("y")))
    w = Window.partitionBy("event_type").orderBy("day")
    idx = daily.select("event_type", "y",
                       F.row_number().over(w).cast("bigint").alias("t"))
    s = idx.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("t") * F.col("y")).alias("sxy"),
        F.sum(F.col("t") * F.col("t")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    dn = n * sxx - sx * sx
    num = n * sxy - sx * sy
    deny = n * syy - sy * sy
    # dn == 0 (a single observed day) must be NULL on BOTH sides:
    # Spark's integer-typed x/0 is NULL but DuckDB's IEEE double
    # division yields inf/NaN, a cross-engine parity break.
    return s.select(
        "event_type", n.alias("n_days"),
        F.when(dn == 0, F.lit(None).cast("double"))
        .otherwise(F.round(num * 1.0 / dn, 6) + F.lit(0.0))
        .alias("slope"),
        F.when(dn == 0, F.lit(None).cast("double"))
        .otherwise(F.round((sy * sxx - sx * sxy) * 1.0 / dn, 6)
                   + F.lit(0.0)).alias("intercept"),
        F.when((deny == 0) | (dn == 0), F.lit(None).cast("double"))
        .otherwise(F.round(num * 1.0 * num / (dn * 1.0 * deny), 6)
                   + F.lit(0.0)).alias("r2"))


@query(
    "value_hour_correlation",
    oracle="""
    WITH q AS (
        SELECT event_type,
               CAST(FLOOR(value * 100) AS BIGINT) AS x,
               CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
               CAST(EXTRACT(day FROM ts) AS BIGINT) AS d
        FROM events WHERE value IS NOT NULL),
    s AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(x) AS sx, SUM(x * x) AS sxx,
               SUM(h) AS sh, SUM(h * h) AS shh, SUM(x * h) AS sxh,
               SUM(d) AS sd, SUM(d * d) AS sdd, SUM(x * d) AS sxd
        FROM q GROUP BY 1)
    SELECT event_type, n AS n_events,
           CASE WHEN n * sxx - sx * sx = 0 OR n * shh - sh * sh = 0
                THEN NULL
                ELSE ROUND((n * 1.0 * sxh - sx * 1.0 * sh)
                     / (sqrt(n * 1.0 * sxx - sx * 1.0 * sx)
                        * sqrt(n * 1.0 * shh - sh * 1.0 * sh)), 6) + 0.0
           END AS corr_value_hour,
           CASE WHEN n * sxx - sx * sx = 0 OR n * sdd - sd * sd = 0
                THEN NULL
                ELSE ROUND((n * 1.0 * sxd - sx * 1.0 * sd)
                     / (sqrt(n * 1.0 * sxx - sx * 1.0 * sx)
                        * sqrt(n * 1.0 * sdd - sd * 1.0 * sd)), 6) + 0.0
           END AS corr_value_dom
    FROM s
    """,
)
def value_hour_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of the value column against hour-of-day and
    day-of-month, per event type — the co-movement diagnostic that
    decides whether "values drifted" (``ks_value_drift``) actually
    means "the hourly mix shifted" (value⇄hour correlated) before
    anyone retrains a model on deseasonalized data.

    The double column is quantized to integer cents (FLOOR(value·100),
    an exact IEEE product) so ALL five correlation sums are exact
    BIGINTs out of ONE partial-aggregated scan — the same
    integers-first discipline as ``ks_value_drift``'s grid.  The
    closed-form combination (whose cross-products n·Σxx exceed BIGINT
    at corpus scale) runs in DOUBLE with the oracle written
    term-for-term identical, and rounds once."""
    # NULL values would otherwise poison the formula asymmetrically
    # (the x-sums skip them, n and the time-sums would not)
    ev = table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull())
    q = ev.select(
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("x"),
        F.hour("ts").cast("bigint").alias("h"),
        F.dayofmonth("ts").cast("bigint").alias("d"))
    s = q.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("h").alias("sh"),
        F.sum(F.col("h") * F.col("h")).alias("shh"),
        F.sum(F.col("x") * F.col("h")).alias("sxh"),
        F.sum("d").alias("sd"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
        F.sum(F.col("x") * F.col("d")).alias("sxd"))
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")

    def corr(sa, saa, sxa):
        # zero variance in either variable (e.g. one event, or every
        # event of a type in one hour) → NULL on both sides; unguarded,
        # Spark's double 0/0 is NaN while DuckDB may yield inf/NaN with
        # a different repr — same parity break as daily_trend_ols.
        num = n * 1.0 * sxa - sx * 1.0 * sa
        den = (F.sqrt(n * 1.0 * sxx - sx * 1.0 * sx)
               * F.sqrt(n * 1.0 * saa - sa * 1.0 * sa))
        degenerate = ((n * sxx - sx * sx == 0)
                      | (n * saa - sa * sa == 0))
        return (F.when(degenerate, F.lit(None).cast("double"))
                .otherwise(F.round(num / den, 6) + F.lit(0.0)))

    return s.select(
        "event_type", n.alias("n_events"),
        corr(F.col("sh"), F.col("shh"), F.col("sxh"))
        .alias("corr_value_hour"),
        corr(F.col("sd"), F.col("sdd"), F.col("sxd"))
        .alias("corr_value_dom"))


# Transition-probability CTE shared with the oracle of
# event_type_transitions (temporal.py) — same lead tiebreak.
_MARKOV_BASE_SQL = """
    WITH seq AS (
        SELECT user_id, event_type AS cur,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events),
    c AS (
        SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE nxt IS NOT NULL
        GROUP BY cur, nxt),
    tot AS (SELECT cur, SUM(n) AS t FROM c GROUP BY cur),
    p AS (
        SELECT c.cur, c.nxt, 1.0 * c.n / tot.t AS p
        FROM c JOIN tot USING (cur)),
    types AS (SELECT DISTINCT event_type FROM events),
    k AS (SELECT COUNT(*) AS k FROM types),
    pi0 AS (SELECT event_type, 1.0 / k.k AS pi FROM types, k)
"""


def _markov_iter_sql(prev: str, cur: str) -> str:
    return f"""
    {cur} AS (
        SELECT t.event_type,
               ROUND(COALESCE(SUM({prev}.pi * p.p), 0.0), 6) AS pi
        FROM types t
        LEFT JOIN p ON p.nxt = t.event_type
        LEFT JOIN {prev} ON {prev}.event_type = p.cur
        GROUP BY t.event_type)"""


@query(
    "markov_stationary_event_mix",
    oracle=_MARKOV_BASE_SQL + ","
    + _markov_iter_sql("pi0", "pi1") + ","
    + _markov_iter_sql("pi1", "pi2") + ","
    + _markov_iter_sql("pi2", "pi3") + """
    SELECT t.event_type, pi1.pi + 0.0 AS pi_1, pi2.pi + 0.0 AS pi_2,
           pi3.pi + 0.0 AS pi_3
    FROM types t
    JOIN pi1 USING (event_type) JOIN pi2 USING (event_type)
    JOIN pi3 USING (event_type)
    """,
)
def markov_stationary_event_mix(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Stationary distribution of the user-behavior Markov chain: three
    unrolled power-iteration steps π·P from the uniform start over the
    transition matrix of ``event_type_transitions`` — the steady-state
    event mix the current behavior model predicts, to compare against
    the observed mix (``chi2_type_mix_drift``) as a model-validity
    monitor.  Reporting π after each step shows the convergence.

    The ONLY corpus-scale work is the one per-user lead window + one
    groupBy that build the types² transition frame (same plan as
    event_type_transitions); each iteration is then a join × aggregate
    over that tiny frame — the kmeans/pagerank unrolling discipline,
    no driver loop.  π is re-rounded to 6 decimals after every step in
    BOTH engines, so each iteration starts from identical doubles (the
    psi_value_drift already-rounded-terms argument)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", F.col("event_type").alias("cur"),
                    F.lead("event_type").over(w).alias("nxt"))
    c = (seq.filter(F.col("nxt").isNotNull())
         .groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n")))
    tot = c.groupBy("cur").agg(F.sum("n").alias("t"))
    p = (c.join(F.broadcast(tot), "cur")
         .select("cur", "nxt",
                 (F.lit(1.0) * F.col("n") / F.col("t")).alias("p"))
         .persist())
    types = ev.select(F.col("event_type")).distinct()
    k = F.broadcast(types.agg(F.count(F.lit(1)).alias("k")))
    pi = (types.crossJoin(k)
          .select("event_type", (F.lit(1.0) / F.col("k")).alias("pi")))
    steps = []
    for _ in range(3):
        joined = (types.join(p, p["nxt"] == types["event_type"], "left")
                  .join(pi.select(F.col("event_type").alias("prev_type"),
                                  F.col("pi").alias("prev_pi")),
                        F.col("cur") == F.col("prev_type"), "left"))
        pi = (joined.groupBy(types["event_type"])
              .agg(F.round(F.coalesce(
                  F.sum(F.col("prev_pi") * F.col("p")), F.lit(0.0)), 6)
                  .alias("pi")))
        steps.append(pi)
    out = types
    for i, step in enumerate(steps, start=1):
        out = out.join(
            step.select(F.col("event_type"),
                        (F.col("pi") + F.lit(0.0)).alias(f"pi_{i}")),
            "event_type")
    return out


# ---------------------------------------------------------------------------
# Multi-feature OLS via the Gram-matrix aggregation — the scalable
# closed-form regression shape: ONE pass accumulates X'X and X'y (a
# handful of scalars per group), the 3x3 solve is O(1) driver-free
# arithmetic on the aggregated frame.  The solve formulas are defined
# ONCE as SQL text and used verbatim by both engines (F.expr on the
# Spark side, pasted into the DuckDB oracle), so the double arithmetic
# cannot drift between them.
# ---------------------------------------------------------------------------

# Cramer's rule for [[n,sh,sd],[sh,shh,shd],[sd,shd,sdd]] beta = [sy,shy,sdy],
# every product forced to DOUBLE before multiplying: the raw BIGINT
# product n*shh*sdd overflows int64 around sf0.1.
_OLS3_TERMS = """
    CAST(shh AS DOUBLE) * sdd - CAST(shd AS DOUBLE) * shd AS t1,
    CAST(sh AS DOUBLE) * sdd - CAST(shd AS DOUBLE) * sd AS t2,
    CAST(sh AS DOUBLE) * shd - CAST(shh AS DOUBLE) * sd AS t3,
    CAST(shy AS DOUBLE) * sdd - CAST(shd AS DOUBLE) * sdy AS u1,
    CAST(sh AS DOUBLE) * sdy - CAST(shy AS DOUBLE) * sd AS u2,
    CAST(shh AS DOUBLE) * sdy - CAST(shy AS DOUBLE) * shd AS u3
"""
_OLS3_DET = ("CAST(n AS DOUBLE) * t1 - CAST(sh AS DOUBLE) * t2"
             " + CAST(sd AS DOUBLE) * t3")
_OLS3_B0 = ("CAST(sy AS DOUBLE) * t1 - CAST(sh AS DOUBLE) * u1"
            " - CAST(sd AS DOUBLE) * u3")
_OLS3_B1 = ("CAST(n AS DOUBLE) * u1 - CAST(sy AS DOUBLE) * t2"
            " + CAST(sd AS DOUBLE) * u2")
_OLS3_B2 = ("CAST(n AS DOUBLE) * u3 - CAST(sh AS DOUBLE) * u2"
            " + CAST(sy AS DOUBLE) * t3")


@query(
    "ols_value_on_time_features",
    oracle=f"""
    WITH g AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(h) AS BIGINT) AS sh,
               CAST(SUM(d) AS BIGINT) AS sd,
               CAST(SUM(h * h) AS BIGINT) AS shh,
               CAST(SUM(h * d) AS BIGINT) AS shd,
               CAST(SUM(d * d) AS BIGINT) AS sdd,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(h * y) AS BIGINT) AS shy,
               CAST(SUM(d * y) AS BIGINT) AS sdy,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM (SELECT event_type,
                     CAST(hour(ts) AS BIGINT) AS h,
                     CAST(dayofweek(ts) AS BIGINT) AS d,
                     CAST(ROUND(value * 100) AS BIGINT) AS y
              FROM events)
        GROUP BY event_type),
    t AS (SELECT *, {_OLS3_TERMS} FROM g),
    s AS (SELECT *, {_OLS3_DET} AS det, {_OLS3_B0} AS n0,
                 {_OLS3_B1} AS n1, {_OLS3_B2} AS n2 FROM t)
    SELECT event_type, n AS n_rows,
           ROUND(n0 / det, 6) + 0.0 AS intercept_cents,
           ROUND(n1 / det, 6) + 0.0 AS coef_hour,
           ROUND(n2 / det, 6) + 0.0 AS coef_dow,
           ROUND(1.0 - (syy - ((n0 / det) * sy + (n1 / det) * shy
                               + (n2 / det) * sdy))
                 / (syy - CAST(sy AS DOUBLE) * sy / n), 6) + 0.0 AS r2
    FROM s
    ORDER BY event_type
    """,
)
def ols_value_on_time_features(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Per-event-type multi-feature OLS (value in cents regressed on
    hour-of-day and day-of-week plus intercept) solved in closed form
    from the Gram matrix: one corpus pass accumulates the ten exact
    BIGINT sums of X'X / X'y / y'y, then Cramer's rule solves the 3x3
    normal equations on the 5-row aggregated frame.

    This is the regression shape that scales: no iteration, no driver
    loop, no per-row Python — d features cost d(d+1)/2 sum cells in ONE
    map-side-combined aggregation, and only the O(d^3) solve (here 3x3)
    happens per group.  The determinant products overflow int64 near
    sf0.1, so every solve-stage product is forced to DOUBLE; the solve
    expressions are a single SQL text evaluated by BOTH engines
    (F.expr here, pasted into the oracle), making cross-engine drift
    structurally impossible.  Spark's dayofweek is 1-based (Sunday=1)
    vs DuckDB's 0-based, normalized here by -1."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("bigint").alias("h"),
        (F.dayofweek("ts") - 1).cast("bigint").alias("d"),
        F.round(F.col("value") * 100).cast("bigint").alias("y"))
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("h").alias("sh"), F.sum("d").alias("sd"),
        F.sum(F.col("h") * F.col("h")).alias("shh"),
        F.sum(F.col("h") * F.col("d")).alias("shd"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
        F.sum("y").alias("sy"),
        F.sum(F.col("h") * F.col("y")).alias("shy"),
        F.sum(F.col("d") * F.col("y")).alias("sdy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"))
    t = g.selectExpr("*", *[c.strip() for c in _OLS3_TERMS.split(",")])
    s = t.selectExpr("*", f"{_OLS3_DET} AS det", f"{_OLS3_B0} AS n0",
                     f"{_OLS3_B1} AS n1", f"{_OLS3_B2} AS n2")
    return (s.selectExpr(
        "event_type", "n AS n_rows",
        "ROUND(n0 / det, 6) + 0.0D AS intercept_cents",
        "ROUND(n1 / det, 6) + 0.0D AS coef_hour",
        "ROUND(n2 / det, 6) + 0.0D AS coef_dow",
        "ROUND(1.0D - (syy - ((n0 / det) * sy + (n1 / det) * shy"
        " + (n2 / det) * sdy))"
        " / (syy - CAST(sy AS DOUBLE) * sy / n), 6) + 0.0D AS r2")
        .orderBy("event_type"))


# ---------------------------------------------------------------------------
# Converged logistic regression (Newton/IRLS) on the fixpoint runner —
# the second-order training-loop shape at corpus scale: ONE aggregation
# pass per round produces the gradient, the Hessian's 10 distinct cells,
# and the log-loss together; the bounded O(d^2) statistics come to the
# driver where numpy solves the 4x4 Newton system (MLlib's own
# treeAggregate-then-driver-update architecture), and the new
# coefficient row re-enters the plan as a LEAF — zero lineage growth,
# no per-round broadcast tree.  Registered rows-only (sigmoid puts libm
# exp() in every value, so no cross-engine hash oracle exists per
# SURVEY.md §5.2) but SELF-AUDITING: the result rows carry executed
# loss assertions, and pytest replays the recurrence in numpy.
# ---------------------------------------------------------------------------
_LR_TOL = 1e-8
_LR_MAX_ROUNDS = 12
_LR_FEATURES = ["intercept", "hour_scaled", "dow_scaled", "value_scaled"]


def _logreg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label: is this a purchase event; features scaled into [0, 1] so
    the Newton steps are well-conditioned at every SF."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0)
        .alias("y"),
        (F.hour("ts") / F.lit(23.0)).alias("x1"),
        ((F.dayofweek("ts") - 1) / F.lit(6.0)).alias("x2"),
        (F.col("value") / F.lit(500.0)).alias("x3"))


@query("logreg_converged_coeffs")
def logreg_converged_coeffs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression (is-this-a-purchase on time-of-day /
    day-of-week / value features) trained by Newton/IRLS with the
    coefficient vector held ON THE DRIVER — MLlib's own trainer
    architecture (treeAggregate the statistics, update the driver-side
    vector, repeat): each round is ONE map-side-combined aggregation
    over the cached feature frame producing the 4 gradient means, the
    10 Hessian cells, and the log-loss together; the driver solves the
    4x4 system with numpy and the updated coefficients re-enter the
    next round's plan as literals.  Stops when the largest coefficient
    step falls under 1e-8 — quadratic convergence lands this in ~5
    rounds where first-order GD needs hundreds (the GD form was
    measured at 30+ rounds without converging, and its
    coefficient-frame-in-the-plan state doubled the plan tree per
    round — both recorded in SCALE.md's pathology list).

    Optimization round 12: this loop previously ran under the
    convergence runner with the coefficients as a 1-row leaf frame —
    correct, but each round cost ~5 driver-coordinated jobs (state
    fetch, the aggregation, the runner's materialization, two metric
    fetches) where the statistics aggregation is the only one touching
    data.  Driver-held coefficients cut it to exactly ONE job per
    round (the recurrence, stopping rule, and every emitted value are
    unchanged — same floats through the same expressions).

    Scale shape is MLlib LogisticRegression's own: per round, corpus
    work is one pass with a 15-cell result; the driver round-trip is
    O(d^2) bounded statistics (the sanctioned guarded-fetch pattern,
    operators/linalg.py); no state frame exists to deepen any plan.
    Self-audit columns (the rows-only contract per SURVEY.md §5.2):
    `loss_improved` asserts the final log-loss beats the
    zero-coefficient model's ln(2); `beats_prior_only` asserts it also
    reaches the best intercept-only model's entropy floor — both
    executed inside the query and pinned by pytest alongside a numpy
    replay of the exact recurrence."""
    import math

    import numpy as np

    feats = _logreg_features(spark, sf_dir).persist()
    feats.count()

    xs = [F.lit(1.0), F.col("x1"), F.col("x2"), F.col("x3")]

    def newton_stats(b: list[float]):
        """One pass: gradient means, Hessian cells, log-loss at ``b``."""
        z = (F.lit(b[0]) + F.lit(b[1]) * F.col("x1")
             + F.lit(b[2]) * F.col("x2") + F.lit(b[3]) * F.col("x3"))
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        w = p * (F.lit(1.0) - p)
        # log-loss via log1p(exp(-|z|)) form: stable for large |z|
        ll = (F.when(F.col("y") == 1.0, F.log1p(F.exp(-z)))
              .otherwise(F.log1p(F.exp(-z)) + z))
        cells = [F.avg((p - F.col("y")) * x).alias(f"g{i}")
                 for i, x in enumerate(xs)]
        cells += [F.avg(w * xs[i] * xs[j]).alias(f"h{i}{j}")
                  for i in range(4) for j in range(i, 4)]
        cells.append(F.avg(ll).alias("loss"))
        # avg(y) rides along for free: it feeds the intercept-only
        # entropy floor below, saving its own dedicated job
        cells.append(F.avg("y").alias("p1"))
        return feats.agg(*cells).first()

    b = [0.0, 0.0, 0.0, 0.0]
    losses: list[float] = []
    rounds, converged = 0, False
    for _ in range(_LR_MAX_ROUNDS):
        s = newton_stats(b)
        losses.append(float(s["loss"]))
        g = np.array([s[f"g{i}"] for i in range(4)])
        H = np.zeros((4, 4))
        for i in range(4):
            for j in range(i, 4):
                H[i, j] = H[j, i] = s[f"h{i}{j}"]
        H += 1e-9 * np.eye(4)  # ridge jitter: exact separation guard
        nb = np.array(b) - np.linalg.solve(H, g)
        nb = [float(v) for v in nb]
        step_size = max(abs(nb[i] - b[i]) for i in range(4))
        b, rounds = nb, rounds + 1
        if step_size <= _LR_TOL:
            converged = True
            break
    s = newton_stats(b)  # loss (and avg(y)) at the FINAL coefficients
    final_loss = float(s["loss"])
    # entropy floor of the best intercept-only model
    p1 = float(s["p1"])
    prior_loss = -(p1 * math.log(p1) + (1 - p1) * math.log(1 - p1))
    feats.unpersist()
    coefs = spark.createDataFrame(
        [tuple(b)], "b0 double, b1 double, b2 double, b3 double").select(
        F.expr("stack(4, " + ", ".join(
            f"'{name}', b{i}" for i, name in enumerate(_LR_FEATURES))
            + ")").alias("feature", "coef"))
    return (coefs.select(
        "feature", (F.round(F.col("coef"), 6) + F.lit(0.0)).alias("coef"),
        F.lit(rounds).alias("rounds"),
        F.lit(converged).alias("converged"),
        F.lit(round(losses[0], 6)).alias("zero_model_loss"),
        F.lit(round(final_loss, 6)).alias("final_loss"),
        F.lit(bool(final_loss < losses[0])).alias("loss_improved"),
        F.lit(bool(final_loss < prior_loss + 1e-9))
        .alias("beats_prior_only"))
        .orderBy("feature"))
