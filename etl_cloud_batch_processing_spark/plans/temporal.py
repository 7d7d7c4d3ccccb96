"""Temporal operators: as-of join and lag/lead sequence analytics.

The reference's pipelines are purely date-windowed batch (SURVEY.md
§2.9); these are the temporal operators an analytics engine over the
same event/order data model is expected to add (SURVEY.md §2.3 lists
as-of joins as the canonical "operator Spark lacks" candidate).  Both
are built from stock primitives — no UDF, no iteration:

* **as-of join** via the union + partitioned-window trick: tag both
  inputs, union them, and take ``last(right_value, ignorenulls=True)``
  over a per-key window ordered by time.  ONE shuffle + sort on
  (key, time) regardless of how many right rows precede each left row —
  the scale-correct alternative to a range join, whose candidate set is
  O(left × right-per-key).  At 100 TB both sides shuffle once on the
  join key and the sort is the same sort a sort-merge join would do.
* **lag/lead** as plain window functions over (user, time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_cloud_batch_processing_spark.plans.registry import query, table


@query(
    "asof_latest_order_per_event",
    oracle="""
    WITH r AS (
        SELECT o_custkey, CAST(o_orderdate AS DATE) AS order_date,
               max(o_orderkey) AS o_orderkey
        FROM orders GROUP BY 1, 2),
    l AS (
        SELECT event_id, user_id, CAST(ts AS DATE) AS event_date
        FROM events)
    SELECT l.event_id, l.user_id, l.event_date,
           r.o_orderkey AS asof_orderkey
    FROM l ASOF LEFT JOIN r
      ON l.user_id = r.o_custkey AND l.event_date >= r.order_date
    """,
)
def asof_latest_order_per_event(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """As-of join: for every event, the customer's most recent order on
    or before the event date (NULL when none exists).

    Implementation is the union+window pattern, not a range join: tag
    orders (side 0) and events (side 1), union on a common schema, then
    per user in time order carry the last seen order key forward.  Side
    0 sorts before side 1 at equal dates, giving the ASOF ``>=``
    (inclusive) semantics.  Orders are first reduced to one row per
    (customer, date) — max orderkey, matching the deterministic tiebreak
    the oracle's ASOF needs — so window order is total.

    Scale: one hash shuffle of each side on user key, one sort per
    partition; no candidate-pair blowup for customers with long order
    histories, and AQE handles skewed users.  A range join here would
    generate |events_per_user| × |orders_per_user| candidates first.
    """
    orders = table(spark, sf_dir, "orders")
    events = table(spark, sf_dir, "events")
    r = (orders.groupBy(F.col("o_custkey").alias("key"),
                        F.to_date("o_orderdate").alias("t"))
         .agg(F.max("o_orderkey").alias("o_orderkey"))
         .select("key", "t", F.lit(0).alias("side"),
                 F.lit(None).cast("bigint").alias("event_id"),
                 "o_orderkey"))
    l = events.select(F.col("user_id").alias("key"),
                      F.to_date("ts").alias("t"),
                      F.lit(1).alias("side"), "event_id",
                      F.lit(None).cast("bigint").alias("o_orderkey"))
    w = (Window.partitionBy("key").orderBy("t", "side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (r.unionByName(l)
            .withColumn("asof_orderkey",
                        F.last("o_orderkey", ignorenulls=True).over(w))
            .filter(F.col("side") == 1)
            .select("event_id", F.col("key").alias("user_id"),
                    F.col("t").alias("event_date"), "asof_orderkey"))


@query(
    "user_event_deltas",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           value - lag(value) OVER w AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def user_event_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead sequence features per user (SURVEY.md §2.5): previous
    and next event value in time order plus the step delta — the
    session-analytics building block.  One shuffle on user_id, one sort;
    lag and lead share the same window so Spark evaluates them in a
    single WindowExec pass."""
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id", "user_id", "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"))


def rollup_table_path(spark: SparkSession, sf_dir: str) -> str:
    """Stable on-disk location of the maintained daily rollup for one
    fixture directory, keyed by the events file's identity (path, size,
    mtime) so a regenerated fixture gets a fresh rollup instead of
    stale counts.

    Lives under ``spark.sql.warehouse.dir`` (round-3 verdict item 8):
    on a real cluster the warehouse is the durable shared filesystem
    (HDFS/S3) every executor and every later job can read, whereas
    ``/tmp`` is node-local and vanishes with the machine.  All path
    I/O below goes through the Hadoop FileSystem API so any warehouse
    scheme works, not just ``file:``."""
    import hashlib
    import os

    src = os.path.join(sf_dir, "events.parquet")
    stamp = f"{src}:{os.path.getsize(src)}:{int(os.path.getmtime(src))}"
    digest = hashlib.sha256(stamp.encode()).hexdigest()[:16]
    root = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    if root.startswith("file:") or root.startswith("/"):
        # plain local path for the default scheme so callers can use
        # os.path on it; non-file URIs (hdfs://, s3a://) pass through
        # and are handled by the Hadoop FS API below
        from urllib.parse import unquote, urlparse
        if root.startswith("file:"):
            root = unquote(urlparse(root).path)
        target = f"{root}/ecbp_rollup/{digest}"
        try:
            os.makedirs(target, exist_ok=True)
        except OSError:
            # default warehouse dir is cwd-relative; an external driver
            # may run from a read-only cwd — fall back to tempdir there
            import tempfile
            target = os.path.join(tempfile.gettempdir(),
                                  "ecbp_rollup", digest)
        return target
    return f"{root}/ecbp_rollup/{digest}"


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` — scheme-agnostic existence and
    marker-file operations (same pattern as sources.writers.compact)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def maintain_daily_rollup(spark: SparkSession, sf_dir: str,
                          run_date: str | None = None) -> str:
    """Pipeline maintenance for the continuous-aggregate pattern: keep
    a ``dt=``-partitioned daily rollup table of (day, event_type,
    n_events) covering every CLOSED day (day < corpus max).

    * ``run_date`` given → roll up exactly that day and overwrite only
      its ``dt=run_date`` partition (``write_append_partition``, the
      same idempotent disposition as case_a's history writes) — the
      per-closed-day scheduled form; re-running a day replaces, never
      duplicates.
    * ``run_date`` omitted → one-pass backfill of all closed days via a
      dynamic partitioned overwrite; skipped entirely when the rollup
      for this fixture already exists, so repeated queries never
      re-read history.

    Returns the table path.  Each day is its own partition, so query
    readers prune to the days they need and a late re-run touches only
    its own partition — the property that keeps maintenance O(day) and
    queries O(tail) at 100 TB.
    """
    from etl_cloud_batch_processing_spark.sources.writers import (
        write_append_partition,
    )

    path = rollup_table_path(spark, sf_dir)
    fs, done = _hadoop_fs(spark, f"{path}/_ECBP_ROLLUP_COMPLETE")
    events = table(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")
    if run_date is not None:
        one = (events.select(day, "event_type")
               .filter(F.col("day") == F.lit(run_date).cast("date"))
               .groupBy("day", "event_type")
               .agg(F.count(F.lit(1)).alias("n_events")))
        write_append_partition(one, path, run_date)
        return path
    if fs.exists(done):
        return path
    cut = F.broadcast(events.agg(F.max(F.to_date("ts")).alias("cutoff")))
    closed = (events.select(day, "event_type").crossJoin(cut)
              .filter(F.col("day") < F.col("cutoff"))
              .groupBy("day", "event_type")
              .agg(F.count(F.lit(1)).alias("n_events")))
    (closed.withColumn("dt", F.date_format("day", "yyyy-MM-dd"))
     .write.mode("overwrite").partitionBy("dt").parquet(path))
    fs.createNewFile(done)
    return path


@query(
    "rollup_plus_tail_counts",
    oracle="""
    SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n_events
    FROM events
    GROUP BY day, event_type
    """,
)
def rollup_plus_tail_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate (hypertable-rollup) pattern: historical days
    are served from the pipeline-maintained rollup table
    (:func:`maintain_daily_rollup`); only the raw tail (the still-open
    current day) is aggregated at query time, and the two halves union.
    This is the lambda shape that makes dashboard aggregates O(tail)
    instead of O(history) at 100 TB: the rollup is written once per
    closed day by the maintenance job (idempotent ``dt=`` partition
    overwrite), NOT rebuilt inside the query — the query's only
    fact-scale work is the open-day aggregate, and day-partitioned
    groups are disjoint so the union needs no re-aggregation.  The
    cutoff scalar joins as a broadcast single row — no collect()."""
    rollup_path = maintain_daily_rollup(spark, sf_dir)
    rollup = (spark.read.parquet(rollup_path)
              .select("day", "event_type", "n_events"))
    events = table(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")
    cut = F.broadcast(events.agg(F.max(F.to_date("ts")).alias("cutoff")))
    tail = (events.select(day, "event_type").crossJoin(cut)
            .filter(F.col("day") >= F.col("cutoff"))
            .groupBy("day", "event_type")
            .agg(F.count(F.lit(1)).alias("n_events")))
    return rollup.unionByName(tail)


@query(
    "trailing_week_active_users",
    oracle="""
    WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
                FROM events),
    bounds AS (SELECT min(CAST(ts AS DATE)) AS lo,
                      max(CAST(ts AS DATE)) AS hi FROM events),
    expanded AS (
        SELECT unnest(generate_series(day, day + INTERVAL 6 DAY,
                                      INTERVAL 1 DAY))::DATE AS report_day,
               user_id
        FROM du)
    SELECT report_day, COUNT(DISTINCT user_id) AS active_users
    FROM expanded, bounds
    WHERE report_day BETWEEN lo AND hi
    GROUP BY report_day
    """,
)
def trailing_week_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day — the sliding-window
    DISTINCT that naive windowing cannot express (distinct is not
    summable across overlapping frames).  Exact form: dedupe to
    (day, user) grain, then EXPLODE each presence onto the 7 report
    days it covers and count distinct per day.  The 7× row expansion
    happens AFTER the dedup, so it scales with active (day, user)
    pairs, not raw events; the deliberate trade versus the approximate
    path (`hll_user_rollup` merges 7 daily sketches with no expansion)
    — keep both, pick per use. Report days clamp to the observed range
    so edge windows match the oracle exactly."""
    events = table(spark, sf_dir, "events")
    du = (events.select(F.to_date("ts").alias("day"), "user_id")
          .distinct())
    bounds = F.broadcast(events.agg(
        F.min(F.to_date("ts")).alias("lo"),
        F.max(F.to_date("ts")).alias("hi")))
    expanded = du.select(
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6)))
        .alias("report_day"), "user_id")
    return (expanded.crossJoin(bounds)
            .filter(F.col("report_day").between(F.col("lo"), F.col("hi")))
            .groupBy("report_day")
            .agg(F.countDistinct("user_id").alias("active_users")))


@query(
    "asof_cogroup_pandas",
    oracle="""
    WITH r AS (
        SELECT o_custkey, CAST(o_orderdate AS DATE) AS order_date,
               max(o_orderkey) AS o_orderkey
        FROM orders GROUP BY 1, 2),
    l AS (
        SELECT event_id, user_id, CAST(ts AS DATE) AS event_date
        FROM events)
    SELECT l.event_id, l.user_id, l.event_date,
           r.o_orderkey AS asof_orderkey
    FROM l ASOF LEFT JOIN r
      ON l.user_id = r.o_custkey AND l.event_date >= r.order_date
    """,
)
def asof_cogroup_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME as-of semantics as `asof_latest_order_per_event`, via
    the cogrouped-map pandas API: both sides hash-partition on the key,
    each key's two Arrow batches meet in one Python worker, and
    ``pd.merge_asof`` does the per-key alignment.  Same shuffle profile
    as the union+window JVM form (one exchange per side), plus the
    Arrow transfer — the JVM form wins when expressible, and the
    oracle proves them interchangeable; cogroup is the escape hatch
    for per-key logic with no columnar encoding (model scoring per
    entity, custom sequence alignment).  Completes the §2.10 UDF
    surface: scalar / grouped-map / mapInPandas / UDTF / cogrouped-map."""
    orders = table(spark, sf_dir, "orders")
    events = table(spark, sf_dir, "events")
    r = (orders.groupBy(F.col("o_custkey").alias("key"),
                        F.to_date("o_orderdate").alias("order_date"))
         .agg(F.max("o_orderkey").alias("o_orderkey")))
    l = events.select(F.col("user_id").alias("key"), "event_id",
                      F.to_date("ts").alias("event_date"))

    def merge(left, right):
        import pandas as pd

        # Arrow hands date columns over as object dtype; merge_asof
        # needs a sortable numeric/datetime key.
        left = left.assign(_t=pd.to_datetime(left["event_date"]))
        left = left.sort_values(["_t", "event_id"], kind="mergesort")
        if right.empty:
            out = left.copy()
            out["asof_orderkey"] = pd.array([None] * len(left),
                                            dtype="Int64")
        else:
            right = right.assign(_t=pd.to_datetime(right["order_date"]))
            out = pd.merge_asof(
                left, right.sort_values("_t", kind="mergesort"),
                on="_t", by="key",
                direction="backward", allow_exact_matches=True)
            out = out.rename(columns={"o_orderkey": "asof_orderkey"})
        out["user_id"] = out["key"]
        return out[["event_id", "user_id", "event_date", "asof_orderkey"]]

    # Cogroup on a 64-way bucket of the key, NOT the key itself: one
    # Python invocation + Arrow round trip per BUCKET, with merge_asof's
    # by="key" doing the per-key alignment vectorized inside.  Grouping
    # per key measured 26.9 s at sf0.1 (~15k users → ~15k Python calls);
    # bucketed: 0.4 s.  Same shuffle (bucket is a pure function of the
    # key), same result.
    bkt = (F.col("key") % 64).alias("bkt")
    return (l.groupBy(bkt).cogroup(r.groupBy(bkt))
            .applyInPandas(merge,
                           schema="event_id long, user_id long, "
                                  "event_date date, asof_orderkey long"))


@query(
    "value_ohlc_daily",
    oracle="""
    WITH ordered AS (
        SELECT event_type, CAST(ts AS DATE) AS day, ts, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                  ORDER BY ts ASC, event_id ASC) AS rn_a,
               ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                  ORDER BY ts DESC, event_id DESC) AS rn_z
        FROM events)
    SELECT event_type, day,
           ROUND(MAX(CASE WHEN rn_a = 1 THEN value END), 6) AS open,
           ROUND(MAX(value), 6) AS high,
           ROUND(MIN(value), 6) AS low,
           ROUND(MAX(CASE WHEN rn_z = 1 THEN value END), 6) AS close,
           COUNT(*) AS n_events
    FROM ordered
    GROUP BY event_type, day
    """,
)
def value_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsampling to daily OHLC bars per event type — the
    hypertable/candle rollup every metrics store offers.  Open/close
    are argmin/argmax over the total (ts, event_id) order, computed as
    ``min(struct(ts, event_id, value))`` / ``max(struct(...))`` inside
    ONE hash aggregation — no window sort anywhere, so the whole bar
    table costs a single partial-aggregated shuffle on (type, day).
    The oracle's row_number formulation is the semantic spec; the
    struct-ordering form is the scale implementation (lexicographic
    struct comparison ≡ ORDER BY ts, event_id because event_id is
    unique)."""
    events = table(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")
    o = F.min(F.struct("ts", "event_id", "value"))
    c = F.max(F.struct("ts", "event_id", "value"))
    return (events.select("event_type", day, "ts", "event_id", "value")
            .groupBy("event_type", "day")
            .agg(F.round(o["value"], 6).alias("open"),
                 F.round(F.max("value"), 6).alias("high"),
                 F.round(F.min("value"), 6).alias("low"),
                 F.round(c["value"], 6).alias("close"),
                 F.count(F.lit(1)).alias("n_events")))


@query(
    "event_type_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS cur,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events),
    c AS (
        SELECT cur, nxt, COUNT(*) AS n
        FROM seq WHERE nxt IS NOT NULL
        GROUP BY cur, nxt),
    tot AS (SELECT cur, SUM(n) AS t FROM c GROUP BY cur)
    SELECT c.cur AS from_type, c.nxt AS to_type, c.n,
           ROUND(1.0 * c.n / tot.t, 6) AS p
    FROM c JOIN tot USING (cur)
    """,
)
def event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next type | current type), with counts — the behavior
    model behind funnel design, anomalous-flow detection (a transition
    whose probability shifts week-over-week), and session synthesis.

    One window-shuffle on user_id builds consecutive pairs (lead with a
    total (ts, event_id) tiebreak — fixture timestamps can collide),
    then two tiny aggregations at types² grain.  At 100 TB the window
    partition key is the user — high cardinality, no skew beyond a
    single user's own history."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", F.col("event_type").alias("cur"),
                    F.lead("event_type").over(w).alias("nxt"))
    c = (seq.filter(F.col("nxt").isNotNull())
         .groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n")))
    tot = c.groupBy("cur").agg(F.sum("n").alias("t"))
    return (c.join(F.broadcast(tot), "cur")
            .select(F.col("cur").alias("from_type"),
                    F.col("nxt").alias("to_type"), "n",
                    F.round(F.lit(1.0) * F.col("n") / F.col("t"), 6)
                    .alias("p")))


@query(
    "value_ewma_last10",
    oracle="""
    WITH d AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events),
    l AS (SELECT * FROM d WHERE rn <= 10)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_used,
           arg_min(value, rn) AS last_value,
           ROUND(SUM(power(0.5, rn - 1) * value)
                 / SUM(power(0.5, rn - 1)), 6) + 0.0 AS ewma,
           ROUND(arg_min(value, rn)
                 - SUM(power(0.5, rn - 1) * value)
                   / SUM(power(0.5, rn - 1)), 6) + 0.0 AS deviation
    FROM l GROUP BY event_type
    """,
)
def value_ewma_last10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of the 10 most recent
    values per event type (decay ½ per step), plus the latest value's
    deviation from it — the streaming-dashboard smoothing/anomaly
    primitive in batch form (its readStream twin is the stateful
    aggregate family in plans/streams.py).  Decay ½ is deliberate:
    0.5^k is an exact binary float, so the weights are bit-identical
    across engines — no transcendental in the ranking path.

    One type-partitioned row_number window with the rn≤10 filter
    pushed as a per-group top-k (WindowGroupLimit), then a 10-row-per-
    group aggregate: at 100 TB the window shuffle is the only
    corpus-scale work and the EWMA math runs on ≤ types×10 rows.
    `min_by(value, rn)` picks the newest value without a second
    window."""
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("ts"),
                                                 F.desc("event_id"))
    d = (events.select("event_type", "ts", "event_id", "value")
         .withColumn("rn", F.row_number().over(w))
         .filter(F.col("rn") <= 10))
    wt = F.pow(F.lit(0.5), F.col("rn") - 1)
    ewma_raw = F.sum(wt * F.col("value")) / F.sum(wt)
    return (d.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_used"),
                 F.min_by("value", "rn").alias("last_value"),
                 (F.round(ewma_raw, 6) + F.lit(0.0)).alias("ewma"),
                 (F.round(F.min_by("value", "rn") - ewma_raw, 6)
                  + F.lit(0.0)).alias("deviation")))


@query(
    "value_cusum_drift",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               ROUND(AVG(value), 6) AS md
        FROM events GROUP BY event_type, CAST(ts AS DATE)),
    mu AS (
        SELECT event_type, ROUND(AVG(md), 6) AS mu,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM daily GROUP BY event_type),
    s AS (
        SELECT d.event_type, d.day, n_days,
               ROUND(ABS(SUM(d.md - m.mu) OVER (
                   PARTITION BY d.event_type ORDER BY d.day
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW)), 6) AS abs_s
        FROM daily d JOIN mu m USING (event_type))
    SELECT event_type, n_days, day AS changepoint_day,
           abs_s + 0.0 AS max_abs_cusum
    FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY event_type
              ORDER BY abs_s DESC, day ASC) AS rn
          FROM s)
    WHERE rn = 1
    """,
)
def value_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on each event type's daily-mean
    series — the classical drift monitor for a metrics pipeline: the
    running sum of deviations from the series mean peaks at the most
    likely level-shift point, and its magnitude is the drift evidence
    a threshold alarm fires on.  Per type: the estimated changepoint
    day and the peak |CUSUM|.

    Scale discipline: the corpus-scale work is ONE partial-aggregated
    groupBy to the (type, day) grain; every window after that runs on
    the day-grain frame (calendar-bounded, same argument as the YoY
    plan).  Cross-engine determinism: the daily means and the series
    mean are rounded to 6 decimals BEFORE the running sum, so both
    engines accumulate the identical double sequence in the identical
    day order, and the peak rank uses the rounded |CUSUM| with a day
    tiebreak — the repo's round-before-rank rule."""
    events = table(spark, sf_dir, "events")
    daily = (events.groupBy("event_type",
                            F.to_date("ts").alias("day"))
             .agg(F.round(F.avg("value"), 6).alias("md")))
    mu = F.broadcast(daily.groupBy("event_type").agg(
        F.round(F.avg("md"), 6).alias("mu"),
        F.count(F.lit(1)).alias("n_days")))
    run = (Window.partitionBy("event_type").orderBy("day")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    s = (daily.join(mu, "event_type")
         .select("event_type", "day", "n_days",
                 F.round(F.abs(F.sum(F.col("md") - F.col("mu"))
                               .over(run)), 6).alias("abs_s")))
    w2 = Window.partitionBy("event_type").orderBy(F.desc("abs_s"),
                                                  F.asc("day"))
    return (s.withColumn("rn", F.row_number().over(w2))
            .filter(F.col("rn") == 1)
            .select("event_type", "n_days",
                    F.col("day").alias("changepoint_day"),
                    (F.col("abs_s") + F.lit(0.0))
                    .alias("max_abs_cusum")))


@query(
    "weekday_seasonality_profile",
    oracle="""
    WITH c AS (
        SELECT event_type, dayofweek(ts) AS dow,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(AVG(value), 6) + 0.0 AS avg_value
        FROM events GROUP BY event_type, dayofweek(ts)),
    t AS (SELECT event_type, SUM(n_events) AS tot FROM c
          GROUP BY event_type)
    SELECT c.event_type, c.dow, c.n_events, c.avg_value,
           ROUND(c.n_events * 1.0 / t.tot, 6) AS volume_share
    FROM c JOIN t USING (event_type)
    """,
)
def weekday_seasonality_profile(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Day-of-week seasonality factors per event type: event volume,
    volume share, and mean value by weekday (0 = Sunday, matching
    DuckDB's dayofweek) — the deseasonalization input for forecasting
    and for interpreting the CUSUM drift monitor (a level shift on the
    weekly period is seasonality, not drift).

    Aggregate-only: one partial-aggregated groupBy to types × 7 rows
    plus a 7-row-per-type broadcast totals join — nothing after the
    first scan grows with the corpus."""
    events = table(spark, sf_dir, "events")
    c = (events.groupBy("event_type",
                        (F.dayofweek("ts") - 1).alias("dow"))
         .agg(F.count(F.lit(1)).alias("n_events"),
              (F.round(F.avg("value"), 6) + F.lit(0.0))
              .alias("avg_value")))
    t = F.broadcast(c.groupBy("event_type")
                    .agg(F.sum("n_events").alias("tot")))
    return (c.join(t, "event_type")
            .select("event_type", "dow", "n_events", "avg_value",
                    F.round(F.col("n_events") * 1.0 / F.col("tot"), 6)
                    .alias("volume_share")))


# --------------------------------------------------------------------------
# Interval semantics: variable-length validity windows.
# --------------------------------------------------------------------------
# Each order carries a service window [o_orderdate, o_orderdate + dur)
# whose length varies with priority (urgent orders turn around faster):
# '1-URGENT' -> 2 days ... '5-LOW' -> 10 days.  Derived, not synthetic
# input — the fixture has no native interval table, and a priority-
# scaled duration exercises exactly what fixed-width windows
# (events_within_day_band's +-1-day band) cannot: variable-length
# interval algebra.
_DUR_SQL = "CAST(substring(o_orderpriority, 1, 1) AS INTEGER) * 2"


@query(
    "order_window_daily_load",
    oracle=f"""
    WITH win AS (
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS s,
               CAST(o_orderdate AS DATE)
                   + CAST(({_DUR_SQL}) || ' days' AS INTERVAL) AS e
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1997-04-01'),
    days AS (
        SELECT CAST(unnest(generate_series(s, CAST(e AS DATE)
                                              - INTERVAL 1 DAY,
                                           INTERVAL 1 DAY)) AS DATE)
                   AS day
        FROM win)
    SELECT day, CAST(COUNT(*) AS BIGINT) AS n_open_orders
    FROM days GROUP BY day
    """,
)
def order_window_daily_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval→grain coverage: how many order service windows are OPEN
    on each calendar day of 1997Q1 — the capacity-planning readout
    (concurrent open work per day) and the relational form of a
    timeline "utilization" chart.

    The interval table never self-joins: each window EXPLODES into its
    covered days via ``sequence()`` (bounded: duration ≤ 10 rows per
    order), then one partial-aggregated count per day.  Linear in
    orders × avg-duration, embarrassingly parallel, no window function
    at all — the scale-safe plan for interval coverage, vs the O(n²)
    "join intervals to a day spine with BETWEEN" a naive translation
    would pick.  Date pruning on the orderdate pushes into the scan."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-04-01"))
    dur = F.substring("o_orderpriority", 1, 1).cast("int") * 2
    win = o.select(
        F.to_date("o_orderdate").alias("s"),
        F.date_add(F.to_date("o_orderdate"), dur - 1).alias("last_day"))
    days = win.select(
        F.explode(F.sequence("s", "last_day")).alias("day"))
    return days.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_open_orders"))


@query(
    "overlapping_customer_orders",
    oracle=f"""
    WITH win AS (
        SELECT o_orderkey, o_custkey,
               CAST(o_orderdate AS DATE) AS s,
               CAST(o_orderdate AS DATE)
                   + CAST(({_DUR_SQL}) || ' days' AS INTERVAL) AS e
        FROM orders)
    SELECT a.o_custkey AS custkey,
           a.o_orderkey AS order_a, b.o_orderkey AS order_b,
           CAST(datediff('day', b.s,
                         LEAST(CAST(a.e AS DATE), CAST(b.e AS DATE)))
                AS BIGINT) AS overlap_days
    FROM win a JOIN win b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND a.s <= b.s
     AND b.s < CAST(a.e AS DATE)
    UNION ALL
    SELECT a.o_custkey, a.o_orderkey, b.o_orderkey,
           CAST(datediff('day', a.s,
                         LEAST(CAST(a.e AS DATE), CAST(b.e AS DATE)))
                AS BIGINT) AS overlap_days
    FROM win a JOIN win b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND b.s < a.s
     AND a.s < CAST(b.e AS DATE)
    """,
)
def overlapping_customer_orders(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Interval-overlap SELF-join: pairs of orders from the same
    customer whose service windows overlap in time, with the overlap
    length in days — the "concurrent open orders" detector behind
    fulfillment contention analysis and duplicate-submission triage.

    The join key is (custkey, 10-day time bucket): durations are
    bounded by 10 days, so an overlapping partner's start lies within
    [s, s+10) and can only fall in the interval's own bucket or the
    next one — the earlier side registers under BOTH (one 2-element
    explode), the later side joins on its own bucket.  Per-key fan-out
    is therefore bounded by a customer's orders per 20-day window —
    NOT by their lifetime order count, which is what a bare custkey
    join degrades to as history accumulates (the band-join bucketing
    of events_within_day_band, composed with the natural key).  Each
    unordered pair emerges exactly once: the lexicographically earlier
    (start, orderkey) interval takes the probing role.  Overlap length
    = min(end) − max(start); max(start) is the later side's start by
    construction, so no LEAST/GREATEST over dates crosses engines.
    The oracle cross-checks with the honest quadratic inequality
    join."""
    o = table(spark, sf_dir, "orders")
    dur = F.substring("o_orderpriority", 1, 1).cast("int") * 2
    epoch = F.lit("1990-01-01").cast("date")
    win = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("okey"),
        F.to_date("o_orderdate").alias("s"),
        F.date_add(F.to_date("o_orderdate"), dur).alias("e"),
        F.floor(F.datediff(F.to_date("o_orderdate"), epoch) / 10)
        .alias("bucket"))
    x = (win.select(
            F.col("custkey"), F.col("okey").alias("xk"),
            F.col("s").alias("xs"), F.col("e").alias("xe"),
            F.explode(F.array(F.col("bucket"), F.col("bucket") + 1))
            .alias("probe")))
    y = win.select(F.col("custkey"), F.col("okey").alias("yk"),
                   F.col("s").alias("ys"), F.col("e").alias("ye"),
                   F.col("bucket").alias("probe"))
    earlier = ((F.col("xs") < F.col("ys"))
               | ((F.col("xs") == F.col("ys"))
                  & (F.col("xk") < F.col("yk"))))
    return (x.join(y, ["custkey", "probe"])
            .filter(earlier & (F.col("ys") < F.col("xe")))
            .select("custkey",
                    F.least("xk", "yk").alias("order_a"),
                    F.greatest("xk", "yk").alias("order_b"),
                    F.datediff(F.least("xe", "ye"), F.col("ys"))
                    .cast("bigint").alias("overlap_days")))


# --------------------------------------------------------------------------
# Metric-monitoring window family: bands, drawdown, engagement.
# --------------------------------------------------------------------------

def _daily_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared (type, day) grain with exact integer-cents value totals —
    the one corpus-scale stage of the band/drawdown monitors."""
    ev = table(spark, sf_dir, "events")
    return (ev.groupBy("event_type", F.to_date("ts").alias("day"))
            .agg(F.sum(F.floor(F.col("value") * 100).cast("bigint"))
                 .alias("cents"),
                 F.count(F.lit(1)).alias("n")))


@query(
    "value_bollinger_breakouts",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS cents,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2),
    m AS (
        SELECT event_type, day,
               cents * 1.0 / (n * 100) AS dm
        FROM daily),
    w AS (
        SELECT event_type, day, dm,
               AVG(dm) OVER w7 AS mid,
               AVG(dm * dm) OVER w7 AS m2,
               COUNT(*) OVER w7 AS nw
        FROM m
        WINDOW w7 AS (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
    SELECT event_type, day,
           ROUND(dm, 6) + 0.0 AS daily_mean,
           ROUND(mid, 6) + 0.0 AS band_mid,
           ROUND(sqrt(GREATEST(m2 - mid * mid, 0)), 6) + 0.0
               AS band_sigma,
           (nw = 7 AND ABS(ROUND(dm, 6) - ROUND(mid, 6))
                > 2 * ROUND(sqrt(GREATEST(m2 - mid * mid, 0)), 6))
               AS is_breakout
    FROM w
    """,
)
def value_bollinger_breakouts(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Bollinger-band monitoring of each type's daily mean value: the
    trailing-7-day mid band and sigma, and a breakout flag for days
    whose mean leaves the ±2σ envelope (full windows only) — the
    rolling-band cousin of the EWMA deviation monitor
    (``value_ewma_last10``) and the per-day input to an alerting
    pipeline.

    One corpus-scale partial agg to the (type, day) grain with
    integer-cents sums (exact BIGINTs — the value_hour_correlation
    discipline), then every window runs over ≤7 calendar-bounded rows.
    Variance comes from the E[x²]−E[x]² identity written term-for-term
    identically in both engines; the breakout comparison evaluates on
    the 6-decimal-ROUNDED band values (sliding-frame AVGs are not
    bit-guaranteed across engines' summation orders), so the boolean
    cannot flip at the band edge."""
    daily = _daily_cents(spark, sf_dir)
    m = daily.select("event_type", "day",
                     (F.col("cents") * 1.0 / (F.col("n") * 100))
                     .alias("dm"))
    w7 = (Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(-6, Window.currentRow))
    w = m.select(
        "event_type", "day", "dm",
        F.avg("dm").over(w7).alias("mid"),
        F.avg(F.col("dm") * F.col("dm")).over(w7).alias("m2"),
        F.count(F.lit(1)).over(w7).alias("nw"))
    sigma = F.sqrt(F.greatest(F.col("m2") - F.col("mid") * F.col("mid"),
                              F.lit(0)))
    # the breakout boolean compares the ROUNDED values: the sliding-
    # frame AVGs are not guaranteed bit-identical across engines
    # (segment-tree vs sequential summation), so an unrounded compare
    # could flip within an ulp of the band edge
    return w.select(
        "event_type", "day",
        (F.round(F.col("dm"), 6) + F.lit(0.0)).alias("daily_mean"),
        (F.round(F.col("mid"), 6) + F.lit(0.0)).alias("band_mid"),
        (F.round(sigma, 6) + F.lit(0.0)).alias("band_sigma"),
        ((F.col("nw") == 7)
         & (F.abs(F.round(F.col("dm"), 6) - F.round(F.col("mid"), 6))
            > 2 * F.round(sigma, 6)))
        .alias("is_breakout"))


@query(
    "value_max_drawdown",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS tot
        FROM events GROUP BY 1, 2),
    r AS (
        SELECT event_type, day, tot,
               MAX(tot) OVER (PARTITION BY event_type ORDER BY day
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS runmax
        FROM daily),
    d AS (
        SELECT event_type, day, tot, runmax, runmax - tot AS dd,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY runmax - tot DESC, day ASC)
                   AS rn
        FROM r)
    SELECT event_type, day AS trough_day,
           runmax / 100.0 + 0.0 AS peak_total,
           tot / 100.0 + 0.0 AS trough_total,
           dd / 100.0 + 0.0 AS max_drawdown
    FROM d WHERE rn = 1
    """,
)
def value_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of each type's daily value total: the largest
    peak-to-trough drop of the running series, with the trough day —
    the canonical "how bad did this metric's collapse get" statistic
    (finance's risk number, a pipeline's regression-severity number).

    One partial agg to the (type, day) grain with exact integer-cents
    totals; the running max, the drawdown, and the argmax ALL operate
    on BIGINTs over calendar-bounded windows — no float enters until
    the /100 display divide, so the ranked answer is bit-deterministic
    (round-before-rank taken to its integer limit)."""
    daily = _daily_cents(spark, sf_dir).select(
        "event_type", "day", F.col("cents").alias("tot"))
    run = (Window.partitionBy("event_type").orderBy("day")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    r = daily.withColumn("runmax", F.max("tot").over(run))
    d = r.withColumn("dd", F.col("runmax") - F.col("tot"))
    rnk = Window.partitionBy("event_type").orderBy(F.desc("dd"),
                                                   F.asc("day"))
    return (d.withColumn("rn", F.row_number().over(rnk))
            .filter(F.col("rn") == 1)
            .select("event_type", F.col("day").alias("trough_day"),
                    (F.col("runmax") / 100.0 + F.lit(0.0))
                    .alias("peak_total"),
                    (F.col("tot") / 100.0 + F.lit(0.0))
                    .alias("trough_total"),
                    (F.col("dd") / 100.0 + F.lit(0.0))
                    .alias("max_drawdown")))


#: Trailing window (days) of the MAU denominator.
_MAU_WINDOW = 28


@query(
    "stickiness_dau_mau",
    oracle=f"""
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau
            FROM du GROUP BY day),
    contrib AS (
        SELECT CAST(day + o.off * INTERVAL 1 DAY AS DATE) AS target_day,
               user_id
        FROM du, (SELECT unnest(range(0, {_MAU_WINDOW})) AS off) o),
    mau AS (SELECT target_day, CAST(COUNT(DISTINCT user_id) AS BIGINT)
                AS mau
            FROM contrib GROUP BY target_day)
    SELECT d.day, d.dau, m.mau,
           ROUND(d.dau * 1.0 / m.mau, 6) + 0.0 AS stickiness
    FROM dau d JOIN mau m ON m.target_day = d.day
    """,
)
def stickiness_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per day: daily actives over trailing-28-day
    actives — the engagement ratio every consumer product reports,
    here as a pure-relational rolling COUNT DISTINCT (which windowed
    aggregation cannot express directly).

    The trailing distinct is computed by CONTRIBUTION EXPLODE: one
    corpus-scale distinct to the (day, user) grain, then each row
    votes into the {_MAU_WINDOW} future days it keeps alive (a bounded
    ×{_MAU_WINDOW} Generate on the day-grain frame, the
    order_window_daily_load pattern) and one distinct-agg per target
    day.  Cost is (active-days × window), NEVER events × window, and
    no per-day re-scan of raw history — the scale-correct rolling-MAU
    plan."""
    ev = table(spark, sf_dir, "events")
    du = (ev.select(F.to_date("ts").alias("day"), "user_id")
          .distinct()
          # both the DAU aggregate and the MAU contribution explode
          # read this frame; compute the corpus-scale distinct once.
          .persist())
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    contrib = (du.select(
        F.explode(F.sequence(F.lit(0), F.lit(_MAU_WINDOW - 1)))
        .alias("off"), "day", "user_id")
        .select(F.date_add(F.col("day"), F.col("off"))
                .alias("target_day"), "user_id"))
    mau = (contrib.groupBy("target_day")
           .agg(F.count_distinct("user_id").alias("mau")))
    return (dau.join(mau, dau["day"] == mau["target_day"])
            .select("day", "dau", "mau",
                    (F.round(F.col("dau") * 1.0 / F.col("mau"), 6)
                     + F.lit(0.0)).alias("stickiness")))


@query(
    "funnel_time_to_convert",
    oracle="""
    WITH s AS (
        SELECT user_id, MIN(ts) AS sts FROM events
        WHERE event_type = 'signup' GROUP BY user_id),
    conv AS (
        SELECT s.user_id, s.sts, MIN(e.ts) AS pts
        FROM s JOIN events e
          ON e.user_id = s.user_id
         AND e.event_type = 'purchase' AND e.ts >= s.sts
        GROUP BY s.user_id, s.sts),
    d AS (
        SELECT CAST(date_trunc('week', sts) AS DATE) AS cohort_week,
               user_id,
               CAST(datediff('day', CAST(sts AS DATE),
                             CAST(pts AS DATE)) AS BIGINT) AS delta_days
        FROM conv),
    r AS (
        SELECT cohort_week, delta_days,
               ROW_NUMBER() OVER (PARTITION BY cohort_week
                                  ORDER BY delta_days ASC, user_id ASC)
                   AS rn,
               COUNT(*) OVER (PARTITION BY cohort_week) AS n
        FROM d)
    SELECT cohort_week, CAST(MAX(n) AS BIGINT) AS n_converted,
           MAX(CASE WHEN rn = (n + 1) // 2 THEN delta_days END)
               AS median_days,
           MAX(CASE WHEN rn = ((9 * n - 1) // 10) + 1 THEN delta_days
               END) AS p90_days
    FROM r GROUP BY cohort_week
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution per signup-week cohort: for each
    user, days from FIRST signup to FIRST subsequent purchase; per
    cohort, the converter count with EXACT median and p90 — the
    funnel-velocity readout behind activation dashboards
    (``signup_purchase_funnel`` counts who converts; this measures how
    fast).

    Two per-user aggregations (min signup, min qualifying purchase —
    the second a semi-join-shaped equi join on user_id filtered
    map-side to purchases), then exact order statistics at cohort
    grain via the rank-equation pattern of ``value_percentiles_by_type``:
    median at rn = (n+1) div 2, p90 at rn = ⌈9n/10⌉ computed in PURE
    INTEGER arithmetic ((9n−1) div 10 + 1 — never CEIL of a float),
    deltas in integer days, deterministic user_id tiebreak."""
    ev = table(spark, sf_dir, "events")
    s = (ev.filter(F.col("event_type") == "signup")
         .groupBy("user_id").agg(F.min("ts").alias("sts")))
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"))
    conv = (s.join(p, "user_id")
            .filter(F.col("pts") >= F.col("sts"))
            .groupBy("user_id", "sts").agg(F.min("pts").alias("pts")))
    d = conv.select(
        F.date_trunc("week", "sts").cast("date").alias("cohort_week"),
        "user_id",
        F.datediff(F.to_date("pts"), F.to_date("sts")).cast("bigint")
        .alias("delta_days"))
    wr = Window.partitionBy("cohort_week").orderBy(
        F.asc("delta_days"), F.asc("user_id"))
    wn = Window.partitionBy("cohort_week")
    r = d.select("cohort_week", "delta_days",
                 F.row_number().over(wr).alias("rn"),
                 F.count(F.lit(1)).over(wn).alias("n"))
    mid = F.expr("(n + 1) DIV 2")
    p90 = F.expr("((9 * n - 1) DIV 10) + 1")
    return (r.groupBy("cohort_week")
            .agg(F.max("n").alias("n_converted"),
                 F.max(F.when(F.col("rn") == mid, F.col("delta_days")))
                 .alias("median_days"),
                 F.max(F.when(F.col("rn") == p90, F.col("delta_days")))
                 .alias("p90_days")))


#: Systematic sampling stride: keep every k-th event per user.
_SYSTEMATIC_K = 10


@query(
    "systematic_event_sample",
    oracle=f"""
    WITH r AS (
        SELECT user_id, event_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events)
    SELECT user_id, event_id, event_type, CAST(rn AS BIGINT) AS rn
    FROM r WHERE rn % {_SYSTEMATIC_K} = 1
    """,
)
def systematic_event_sample(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Systematic (every {_SYSTEMATIC_K}-th) sample of each user's
    event stream in time order — the classic equal-interval sampler
    that preserves per-user temporal coverage where Bernoulli sampling
    (``mixture_sampling``) and hash sampling (``hash_sample_per_lang``)
    preserve only rates: downstream sessionization on the sample sees
    every phase of a user's history.

    One user-partitioned rank window (high-cardinality key, the
    event_type_transitions shuffle) + a modulus filter; fully
    deterministic via the (ts, event_id) total tiebreak, no sampling
    randomness to reconcile across engines."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (ev.select("user_id", "event_id", "event_type",
                      F.row_number().over(w).cast("bigint").alias("rn"))
            .filter(F.col("rn") % _SYSTEMATIC_K == 1))


#: Per-step timeout of the strict funnel (days between consecutive
#: stages).
FUNNEL_STEP_DAYS = 3


@query(
    "strict_funnel_with_timeouts",
    oracle=f"""
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (
        SELECT s1.user_id, MIN(e.ts) AS t2
        FROM s1 JOIN events e
          ON e.user_id = s1.user_id AND e.event_type = 'click'
         AND e.ts > s1.t1
         AND date_diff('day', CAST(s1.t1 AS DATE), CAST(e.ts AS DATE))
             <= {FUNNEL_STEP_DAYS}
        GROUP BY s1.user_id),
    s3 AS (
        SELECT s2.user_id, MIN(e.ts) AS t3
        FROM s2 JOIN events e
          ON e.user_id = s2.user_id AND e.event_type = 'purchase'
         AND e.ts > s2.t2
         AND date_diff('day', CAST(s2.t2 AS DATE), CAST(e.ts AS DATE))
             <= {FUNNEL_STEP_DAYS}
        GROUP BY s2.user_id),
    n AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n1,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n2,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n3)
    SELECT * FROM (
        SELECT CAST(1 AS BIGINT) AS stage, 'signup' AS stage_name,
               n1 AS n_users, CAST(NULL AS DOUBLE) AS conversion_from_prev
        FROM n
        UNION ALL
        SELECT 2, 'click_within_{FUNNEL_STEP_DAYS}d', n2,
               CASE WHEN n1 = 0 THEN NULL
                    ELSE ROUND(n2 * 1.0 / n1, 6) + 0.0 END
        FROM n
        UNION ALL
        SELECT 3, 'purchase_within_{FUNNEL_STEP_DAYS}d', n3,
               CASE WHEN n2 = 0 THEN NULL
                    ELSE ROUND(n3 * 1.0 / n2, 6) + 0.0 END
        FROM n)
    """,
)
def strict_funnel_with_timeouts(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Strict ORDERED funnel with per-step timeouts: signup → first
    click AFTER the signup within {FUNNEL_STEP_DAYS} days → first
    purchase AFTER that click within {FUNNEL_STEP_DAYS} days — the
    sequence-constrained activation funnel (``signup_purchase_funnel``
    counts mere co-occurrence; product analytics needs order + recency
    constraints, else a purchase made before signup or a week-stale
    click counts as activation).

    Each stage is one map-side-filtered equi join on user_id against
    the previous stage's (user, ts) frame + a partial-aggregated MIN —
    the same semi-join shape as ``funnel_time_to_convert``, chained.
    Stage frames shrink monotonically, so each join's build side is
    smaller than the last; the final 3-row report crossJoins three
    one-row counts (the chi2 one-row pattern).  Zero-denominator
    conversions are NULL on both sides."""
    ev = table(spark, sf_dir, "events")
    # each stage frame is read twice (next stage's join + its count) —
    # persist so the chained user-grain aggs run once each
    s1 = (ev.filter(F.col("event_type") == "signup")
          .groupBy("user_id").agg(F.min("ts").alias("t1")).persist())
    def _next_stage(prev: DataFrame, tcol: str, etype: str,
                    out: str) -> DataFrame:
        # qualified aliases: prev and e share the ev lineage, and a
        # bare self-join column reference is ambiguous
        p = (prev.select(F.col("user_id").alias("puser"),
                         F.col(tcol).alias("pt")).alias("p"))
        e = (ev.filter(F.col("event_type") == etype)
             .select("user_id", "ts").alias("e"))
        cond = ((F.col("e.user_id") == F.col("p.puser"))
                & (F.col("e.ts") > F.col("p.pt"))
                & (F.datediff(F.to_date(F.col("e.ts")),
                              F.to_date(F.col("p.pt")))
                   <= FUNNEL_STEP_DAYS))
        return (p.join(e, cond)
                .groupBy(F.col("p.puser").alias("user_id"))
                .agg(F.min(F.col("e.ts")).alias(out)))
    s2 = _next_stage(s1, "t1", "click", "t2").persist()
    s3 = _next_stage(s2, "t2", "purchase", "t3")
    n1 = s1.agg(F.count(F.lit(1)).cast("bigint").alias("n1"))
    n2 = s2.agg(F.count(F.lit(1)).cast("bigint").alias("n2"))
    n3 = s3.agg(F.count(F.lit(1)).cast("bigint").alias("n3"))
    n = n1.crossJoin(n2).crossJoin(n3)
    return n.selectExpr(f"""
        stack(3,
              CAST(1 AS BIGINT), 'signup', n1, CAST(NULL AS DOUBLE),
              CAST(2 AS BIGINT), 'click_within_{FUNNEL_STEP_DAYS}d', n2,
              CASE WHEN n1 = 0 THEN CAST(NULL AS DOUBLE)
                   ELSE ROUND(n2 * 1.0D / n1, 6) + 0.0D END,
              CAST(3 AS BIGINT), 'purchase_within_{FUNNEL_STEP_DAYS}d',
              n3,
              CASE WHEN n2 = 0 THEN CAST(NULL AS DOUBLE)
                   ELSE ROUND(n3 * 1.0D / n2, 6) + 0.0D END)
        AS (stage, stage_name, n_users, conversion_from_prev)""")


# ---------------------------------------------------------------------------
# Timezone semantics: the one temporal axis the family had not yet
# value-checked.  Storage is timezone-naive UTC (the lake convention);
# presentation re-interprets per business region via IANA rules — both
# engines consult the same tzdata, so local-wall-clock derivations are
# hash-checkable, including the half-hour-offset zone.
# ---------------------------------------------------------------------------
_TZ_ZONES = ["America/New_York", "Asia/Kolkata", "Asia/Tokyo",
             "Europe/Berlin"]


@query(
    "events_local_hour_profile",
    oracle=f"""
    WITH z AS (SELECT unnest([{", ".join(f"'{z}'" for z in _TZ_ZONES)}])
                   AS tz),
    loc AS (
        SELECT z.tz,
               hour(timezone(z.tz, timezone('UTC', e.ts))) AS local_hour,
               CAST(timezone(z.tz, timezone('UTC', e.ts)) AS DATE)
                   AS local_day
        FROM events e CROSS JOIN z)
    SELECT tz, CAST(local_hour AS BIGINT) AS local_hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT local_day) AS BIGINT) AS n_local_days
    FROM loc
    GROUP BY tz, local_hour
    ORDER BY tz, local_hour
    """,
)
def events_local_hour_profile(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Hour-of-day activity profile re-interpreted in four business
    timezones (including a half-hour-offset zone, Asia/Kolkata) from
    the timezone-naive UTC storage column: per (zone, local hour), the
    event count and the number of distinct LOCAL calendar days — the
    date-boundary shift (a 03:00 UTC event is previous-day evening in
    New York) is exactly what naive hour() reporting gets wrong, and
    what this query pins against DuckDB's independent ICU tzdata.

    Scale shape: the zone list is a 4-row literal exploded onto the
    scan (linear ×|zones|, no join), and the aggregate map-side
    combines to |zones|×24 cells; conversion is `convert_timezone`
    JVM-side — no UDF.  At 100 TB you run this once per reporting
    surface, not per query — the lake stays UTC-naive (the convention
    every temporal operator here assumes), and THIS is the audited
    boundary where wall-clock semantics enter."""
    ev = table(spark, sf_dir, "events")
    zones = F.array(*[F.lit(z) for z in _TZ_ZONES])
    # ONE ICU conversion per (row, zone) — hour and date derive from the
    # converted value; and the distinct-day count comes from an explicit
    # (tz, hour, day)-grain pre-aggregation (map-side combined to a
    # bounded zones×24×days frame) instead of a COUNT DISTINCT Expand
    # over the exploded corpus — the 32× soak measured the naive form
    # at 20.1× (two conversions/row + Expand), this one at ~7×
    loc = (ev.select(F.explode(zones).alias("tz"), "ts")
           .select("tz",
                   F.expr("convert_timezone('UTC', tz, ts)").alias("c"))
           .select("tz", F.hour("c").cast("bigint").alias("local_hour"),
                   F.col("c").cast("date").alias("local_day")))
    g = (loc.groupBy("tz", "local_hour", "local_day")
         .agg(F.count(F.lit(1)).alias("n")))
    return (g.groupBy("tz", "local_hour")
            .agg(F.sum("n").cast("bigint").alias("n_events"),
                 F.count(F.lit(1)).cast("bigint").alias("n_local_days"))
            .orderBy("tz", "local_hour"))
