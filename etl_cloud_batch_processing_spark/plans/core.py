"""The reference's own query surface, re-expressed over the fixtures.

Covers SURVEY.md §2.1-§2.2, §2.4 A1, §2.6, §2.8 (operators S*/P*/F*/A1/
O*/X*).  The ``events`` fixture stands in for both reference inputs
(FIXTURES.md role mapping): Case A's search history (ts / user_id /
event_type≈keyword / value≈result_count) and Case B's event stream
(``props`` JSON ≈ the event_params extraction).

Every query here is pure ``pyspark.sql.functions`` — no UDFs — so plans
stay inside whole-stage codegen, filters push to the parquet scan, and
nothing materializes on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_cloud_batch_processing_spark.plans.registry import query, table

# Fixed logical run date used by date-parameterized queries (events data
# spans 2024-01-01..2024-01-30).  The pipelines in
# ``pipelines/case_*.py`` take ``ds`` as a real parameter; the registry
# versions pin it so the oracle SQL is a static string.
DS = "2024-01-03"


# --------------------------------------------------------------------------
# A1 + O1/O2 — the flagship: per-day top-1 by measure, set-based form.
# --------------------------------------------------------------------------

@query(
    "topk_per_day",
    oracle=f"""
    SELECT day, event_id, event_type, value
    FROM (
        SELECT CAST(ts AS DATE) AS day, event_id, event_type, value,
               ROW_NUMBER() OVER (
                   PARTITION BY CAST(ts AS DATE)
                   ORDER BY value DESC, event_id ASC) AS rn
        FROM events)
    WHERE rn = 1
    """,
)
def topk_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-valuable event per day (reference Case A's "most searched
    keyword for each day", README.md:74-78 / daily_search_history.py:72-91),
    as one set-based window query over all days instead of one
    ORDER-BY-LIMIT-1 run per day, with a deterministic ``event_id``
    tiebreak (the reference's LIMIT 1 ties are nondeterministic,
    SURVEY.md §2.6).

    Scale: shuffles once on ``day`` (~#days groups); at 100 TB a
    ``dt=``-partitioned layout makes this a partition-local window with
    no wide shuffle.
    """
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("day").orderBy(F.desc("value"), F.asc("event_id"))
    return (events
            .withColumn("day", F.to_date("ts"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("day", "event_id", "event_type", "value"))


# --------------------------------------------------------------------------
# A1 honest variant — per-day argmax of keyword *frequency*.
# --------------------------------------------------------------------------

@query(
    "most_frequent_type_per_day",
    oracle="""
    SELECT day, event_type, n_events
    FROM (
        SELECT CAST(ts AS DATE) AS day, event_type,
               COUNT(*) AS n_events,
               ROW_NUMBER() OVER (
                   PARTITION BY CAST(ts AS DATE)
                   ORDER BY COUNT(*) DESC, event_type ASC) AS rn
        FROM events
        GROUP BY 1, 2)
    WHERE rn = 1
    """,
)
def most_frequent_type_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The honest per-day most-frequent-keyword aggregation the reference
    *intended* (SURVEY.md §2.4 note): GROUP BY day+type, then top-1 per
    day by count.  Partial aggregation map-side, then one shuffle on
    (day, type) — the window then runs per day group."""
    events = table(spark, sf_dir, "events")
    counts = (events
              .withColumn("day", F.to_date("ts"))
              .groupBy("day", "event_type")
              .agg(F.count(F.lit(1)).alias("n_events")))
    w = Window.partitionBy("day").orderBy(F.desc("n_events"),
                                          F.asc("event_type"))
    return (counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("day", "event_type", "n_events"))


# --------------------------------------------------------------------------
# F1 — equality predicate (transaction_data.py:20).
# --------------------------------------------------------------------------

@query(
    "filter_eq_purchase",
    oracle="""
    SELECT event_id, ts, user_id, value
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def filter_eq_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: ``event_name = 'purchase_item'`` analog.  The predicate and the
    4-column projection both reach the parquet scan (PushedFilters +
    ReadSchema) — at 100 TB this reads ~1/5 of rows and 4/6 of columns."""
    return (table(spark, sf_dir, "events")
            .filter(F.col("event_type") == "purchase")
            .select("event_id", "ts", "user_id", "value"))


# --------------------------------------------------------------------------
# F2 + X4 + X5 — inclusive 3-day date window (transaction_data.py:20-21).
# --------------------------------------------------------------------------

@query(
    "date_window_filter",
    oracle=f"""
    SELECT event_id, ts, event_type, value
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '{DS}'
                               AND DATE '{DS}' + INTERVAL 2 DAY
    """,
)
def date_window_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: ``DATE(event_datetime) BETWEEN ds AND DATE_ADD(ds, INTERVAL 2
    DAY)`` — the reference's per-run extract window, BETWEEN-inclusive on
    both ends (SURVEY.md §2.9 L9).  ``date_add`` on a literal constant-
    folds; the comparison pushes down to row-group min/max skipping."""
    events = table(spark, sf_dir, "events")
    day = F.to_date("ts")
    return (events
            .filter(day.between(F.lit(DS).cast("date"),
                                F.date_add(F.lit(DS).cast("date"), 2)))
            .select("event_id", "ts", "event_type", "value"))


# --------------------------------------------------------------------------
# F3 + X2 + X3 — day filter via string-prefix cast
# (daily_search_history.py:79,83).
# --------------------------------------------------------------------------

@query(
    "string_prefix_day_filter",
    oracle=f"""
    SELECT event_id,
           TRY_CAST(substring(CAST(ts AS VARCHAR), 1, 10) AS DATE)
               AS created_date,
           event_type
    FROM events
    WHERE TRY_CAST(substring(CAST(ts AS VARCHAR), 1, 10) AS DATE)
          = DATE '{DS}'
    """,
)
def string_prefix_day_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3/X2/X3: ``SAFE_CAST(LEFT(created_at, 10) AS DATE) = ds`` — the
    reference filters a *string* timestamp by its 10-char date prefix.
    Reproduced faithfully: cast ts to string, substring, safe-cast back
    to date (ANSI off ⇒ NULL on malformed, never an error)."""
    events = table(spark, sf_dir, "events")
    created_date = F.substring(F.col("ts").cast("string"), 1, 10).cast("date")
    return (events
            .withColumn("created_date", created_date)
            .filter(F.col("created_date") == F.lit(DS).cast("date"))
            .select("event_id", "created_date", "event_type"))


# --------------------------------------------------------------------------
# X1 — SAFE_CAST null-on-failure (daily_search_history.py:59,61).
# --------------------------------------------------------------------------

@query(
    "safe_cast_correction",
    oracle="""
    SELECT event_id,
           TRY_CAST(event_type AS BIGINT) AS type_as_int,
           TRY_CAST(CAST(user_id AS VARCHAR) AS BIGINT) AS user_id_int,
           TRY_CAST(CAST(value AS VARCHAR) AS DOUBLE) AS value_dbl
    FROM events
    """,
)
def safe_cast_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: the Case A type-correction statement
    (daily_search_history.py:57-65) — strings cast to numeric types with
    NULL on failure.  ``type_as_int`` is always NULL (non-numeric text),
    proving SAFE_CAST semantics rather than erroring the job; the round-
    trip casts prove lossless string↔numeric correction."""
    events = table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.col("event_type").cast("bigint").alias("type_as_int"),
        F.col("user_id").cast("string").cast("bigint").alias("user_id_int"),
        F.col("value").cast("string").cast("double").alias("value_dbl"),
    )


# --------------------------------------------------------------------------
# P2-P5, X9-X11 — projection with aliases, literal run-date column, drop.
# --------------------------------------------------------------------------

@query(
    "projection_aliases",
    oracle=f"""
    SELECT event_id AS transaction_id,
           ts AS transaction_datetime,
           user_id,
           value AS purchase_amount,
           '{DS}' AS ext_created_at,
           strftime(DATE '{DS}', '%Y%m%d') AS ds_nodash
    FROM events
    """,
)
def projection_aliases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P4/P5 + X11: the Case B final projection shape
    (transaction_data.py:55-66) — alias renames, a literal run-date
    column stamped on every row, ``props`` dropped, plus the
    ``ds_nodash`` date rendering (daily_search_history.py:40)."""
    events = table(spark, sf_dir, "events")
    return (events
            .drop("props")
            .select(
                F.col("event_id").alias("transaction_id"),
                F.col("ts").alias("transaction_datetime"),
                "user_id",
                F.col("value").alias("purchase_amount"),
                F.lit(DS).alias("ext_created_at"),
                F.date_format(F.lit(DS).cast("date"),
                              "yyyyMMdd").alias("ds_nodash"),
            ))


# --------------------------------------------------------------------------
# P3 + X8 — nested value extraction from the props JSON string.
# --------------------------------------------------------------------------

@query(
    "json_props_extract",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           json_extract_string(props, '$.missing') AS missing_str
    FROM events
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/X8 fixture-faithful form: the reference picks typed values out
    of a variant struct (``transaction_id.value.int_value``,
    transaction_data.py:55-63); the fixtures carry the same information
    as a JSON string ``props``, extracted by path and safe-cast.
    Missing paths yield NULL, matching the sparse-params branch
    (transaction_data.py:40-45).

    ``json_tuple`` parses each document ONCE for all requested keys;
    two ``get_json_object`` calls parse twice (no common-subexpression
    elimination across JSON paths) — measured 0.46s → 0.27s at sf0.1.
    At 100 TB that 40%% is pure scan-stage CPU."""
    events = table(spark, sf_dir, "events")
    return (events
            .select("event_id",
                    F.json_tuple("props", "k", "missing").alias("k", "m"))
            .select("event_id",
                    F.col("k").cast("bigint").alias("k_int"),
                    F.col("m").alias("missing_str")))


# --------------------------------------------------------------------------
# F4 + X6 + X7 — per-row branch on array length, positional element access.
# --------------------------------------------------------------------------

@query(
    "array_branch_extract",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           CASE WHEN len(string_split(text, ' ')) >= 8
                THEN string_split(text, ' ')[1]
                ELSE NULL END AS first_token,
           CASE WHEN len(string_split(text, ' ')) >= 8
                THEN string_split(text, ' ')[8]
                ELSE NULL END AS eighth_token
    FROM documents
    """,
)
def array_branch_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/X6/X7: the reference's pandas loop branches per row on
    ``len(event_params)`` and picks positional elements 0..7
    (transaction_data.py:26-48).  Re-expressed totally (no silent
    swallowed errors) as when/size/element_at columnar expressions over
    a token array — runs in whole-stage codegen, never in Python."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    has8 = F.size(toks) >= 8
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.when(has8, F.element_at(toks, 1)).alias("first_token"),
        F.when(has8, F.element_at(toks, 8)).alias("eighth_token"),
    )


@query(
    "props_typed_struct",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           len(json_keys(props)) AS n_keys
    FROM events
    """,
)
def props_typed_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/X8 typed form: ``from_json`` parses the JSON payload ONCE into
    a typed struct column, then fields project as plain nested-struct
    paths — the exact shape of the reference's variant access
    (``transaction_id.value.int_value``, transaction_data.py:55-63), and
    the scale-preferred form when several keys are read (one parse per
    row instead of one ``get_json_object`` parse per key).  The map form
    (``MapType``) feeds key-arity analytics the same way."""
    events = table(spark, sf_dir, "events")
    parsed = events.withColumn(
        "p", F.from_json("props", "struct<k:bigint>")).withColumn(
        "m", F.from_json("props", "map<string,string>"))
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        F.size(F.map_keys("m")).alias("n_keys"))


@query(
    "variant_props_extract",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           TRY_CAST(json_extract_string(props, '$.k') AS STRING) AS k_str
    FROM events
    """,
)
def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/X8 in Spark 4's native VARIANT form — the engine-level
    equivalent of BigQuery's variant event_params structs the reference
    projects (transaction_data.py:55-63).  ``parse_json`` builds a
    binary variant once per row at scan time; ``variant_get`` then
    extracts typed values by path WITHOUT re-parsing the JSON text per
    field — at 100 TB with many extracted fields this halves scan CPU
    versus repeated ``get_json_object``, and the binary encoding
    shuffles smaller than the source text.  Output columns are plain
    typed values, so the oracle is the same JSON extraction."""
    events = table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return events.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_int"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
    )


@query(
    "props_map_functions",
    oracle="""
    SELECT event_id,
           'k' AS prop_keys_csv,
           COALESCE(CAST(TRY_CAST(json_extract_string(props, '$.k')
                                  AS BIGINT) AS VARCHAR), 'NULL')
               AS prop_vals_csv,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) + 1
               AS k_plus_one,
           2 AS n_entries
    FROM events
    """,
)
def props_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-function namespace over the props JSON: parse to
    MAP<STRING,BIGINT>, then map_keys / map_values / element access /
    map_concat + size — the X8 variant-extraction surface when the
    key set is open (a fixed struct schema can't hold arbitrary
    per-event parameters; BigQuery's event_params array serves the
    same role in the reference, transaction_data.py:26-45).  All
    JVM-side map expressions; maps shuffle as compact binary, and the
    open schema costs nothing at scan time because parquet stores
    props as one string column.  Keys/values ship CSV-joined to scalar
    strings because the external driver's canonicalizer cannot hash
    array cells; the map itself stays an engine-side type."""
    events = table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    merged = F.map_concat(m, F.create_map(F.lit("stamped"), F.lit(1)))
    return events.select(
        "event_id",
        F.array_join(F.map_keys(m), ",", "NULL").alias("prop_keys_csv"),
        F.array_join(F.transform(F.map_values(m),
                                 lambda v: v.cast("string")),
                     ",", "NULL").alias("prop_vals_csv"),
        (F.element_at(m, "k") + 1).alias("k_plus_one"),
        F.size(merged).alias("n_entries"))


@query(
    "collated_lcase_group_join",
    oracle="""
    WITH fact AS (
        SELECT CASE WHEN event_id % 3 = 0 THEN upper(event_type)
                    ELSE event_type END AS k,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events)
    SELECT lower(k) AS key,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           'type:' || lower(k) AS label
    FROM fact GROUP BY lower(k) ORDER BY key
    """,
)
def collated_lcase_group_join(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """String COLLATION surface (Spark 4 ``collate()`` /
    ``UTF8_LCASE``): group a deterministically mixed-cased event-type
    key (every ``%3`` event upper-cased) under a case-insensitive
    collation and JOIN the grouped rows to a dimension whose keys
    carry a THIRD casing (all-upper) on the collated key — the
    grouping AND join semantics a SQL-Server/Postgres-citext migration
    hits on day one.  The DuckDB oracle normalizes with ``lower()``
    (binary semantics), so the hash checks UTF8_LCASE ≡
    lower-normalization for these keys; if Spark's collated grouping
    ever failed to merge case variants the row count itself would red.

    Plan audit (PLANS.md): collated group keys FORCE the SortAggregate
    fallback — no HashAggregate, no whole-stage codegen for the
    aggregate — though partial aggregation (map-side combine) and
    hash-partitioning still work because both operate on the derived
    ``collationkey``; the join stays a BroadcastHashJoin keyed on
    ``collationkey(k)``.  Two consequences worth designing around at
    100 TB: (1) case variants of one key CO-PARTITION (the exchange
    hashes the collation key, not the raw bytes) — collation changes
    shuffle semantics, not just comparisons; (2) the codegen loss
    prices every collated hot path, so a pipeline that filters or
    groups the same collated column repeatedly should materialize a
    binary-normalized key column once instead.  The grouped
    representative key keeps an ARBITRARY input casing (first-seen per
    partition), which is why the output projects ``lower(k)`` — any
    consumer of a collated group key must treat its casing as
    undefined."""
    ev = table(spark, sf_dir, "events")
    mixed = (F.when(F.col("event_id") % 3 == 0, F.upper("event_type"))
             .otherwise(F.col("event_type")))
    fact = ev.select(
        F.collate(mixed, "UTF8_LCASE").alias("k"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"))
    grouped = (fact.groupBy("k")
               .agg(F.count(F.lit(1)).alias("n_events"),
                    F.sum("cents").cast("bigint").alias("sum_cents")))
    dim = (ev.select(F.collate(F.upper("event_type"), "UTF8_LCASE")
                     .alias("k")).distinct()
           .withColumn("label", F.concat(F.lit("type:"), F.lower("k"))))
    return (grouped.join(F.broadcast(dim), "k")
            .select(F.lower("k").alias("key"), "n_events", "sum_cents",
                    "label")
            .orderBy("key"))
