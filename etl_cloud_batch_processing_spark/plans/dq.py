"""Data-quality gate queries: constraint suite + referential integrity.

The reference pipeline trusts BigQuery's load-time schema check and
nothing else (reference dags/transaction_data.py:19-66 — a failed load
is the only quality signal).  A 100-TB ingest needs value-level
contracts evaluated as part of the pipeline; these queries put the
driver's value hash on the expectations engine
(operators/expectations.py): every cell of the report — scan counts,
violation counts, pass verdicts, orphan counts — must match a DuckDB
recomputation, so a broken conditional count, a NULL swallowed by a
predicate, or an anti-join that drops a key all red out.

Scale notes: the constraint suite is ONE aggregate scan per table
(map-side partial counts; no shuffle beyond the 1-row final merge); the
RI audit is one broadcast anti-join per edge against the DISTINCT
parent key set — dimension-sized parents broadcast, and a fact-fact
edge (lineitem→orders here) anti-joins under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_cloud_batch_processing_spark.operators import expectations as X
from etl_cloud_batch_processing_spark.plans.registry import query, table

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
_LANGS = ["de", "en", "es", "fr", "zh"]


def _suite_sql() -> str:
    """Oracle twin of the registered suite, generated from the same
    check list so the two can't drift silently."""

    def s(cond: str) -> str:
        return f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT)"

    types = ", ".join(f"'{t}'" for t in _EVENT_TYPES)
    langs = ", ".join(f"'{la}'" for la in _LANGS)
    ev_cells = [
        ("event_id_not_null", "not_null", "event_id IS NULL"),
        ("event_id_unique", "unique", None),
        ("event_type_accepted_values", "accepted_values",
         f"NOT COALESCE(event_type IN ({types}), FALSE)"),
        ("value_in_range", "in_range",
         "NOT COALESCE(value > 0 AND value <= 1000000.0, FALSE)"),
        ("user_id_not_null", "not_null", "user_id IS NULL"),
        ("props_matches", "matches",
         "NOT COALESCE(regexp_matches(props, '^[{].*[}]$'), FALSE)"),
    ]
    doc_cells = [
        ("doc_id_unique", "unique", None),
        ("n_chars_consistent", "expression",
         "NOT COALESCE(n_chars = length(text), FALSE)"),
        ("lang_accepted_values", "accepted_values",
         f"NOT COALESCE(lang IN ({langs}), FALSE)"),
    ]
    ord_cells = [
        ("o_orderkey_unique", "unique", None),
        ("o_totalprice_in_range", "in_range",
         "NOT COALESCE(o_totalprice > 0 AND o_totalprice <= 1000000.0,"
         " FALSE)"),
        ("o_orderdate_not_null", "not_null", "o_orderdate IS NULL"),
    ]
    uniq = {"event_id_unique": "event_id", "doc_id_unique": "doc_id",
            "o_orderkey_unique": "o_orderkey"}
    parts = []
    for tbl, cells in [("events", ev_cells), ("documents", doc_cells),
                       ("orders", ord_cells)]:
        aggs = ["CAST(COUNT(*) AS BIGINT) AS n"]
        for i, (name, _, cond) in enumerate(cells):
            if name in uniq:
                col = uniq[name]
                aggs.append(f"CAST(COUNT({col}) - COUNT(DISTINCT {col})"
                            f" AS BIGINT) AS v{i}")
            else:
                aggs.append(f"{s(cond)} AS v{i}")
        parts.append(f"agg_{tbl} AS (SELECT {', '.join(aggs)} FROM {tbl})")
    rows = []
    for tbl, cells in [("events", ev_cells), ("documents", doc_cells),
                       ("orders", ord_cells)]:
        for i, (name, kind, _) in enumerate(cells):
            rows.append(
                f"SELECT '{tbl}' AS table_name, '{name}' AS check_name,"
                f" '{kind}' AS kind, n AS rows_scanned, v{i} AS violations,"
                f" v{i} = 0 AS passed FROM agg_{tbl}")
    return (f"WITH {', '.join(parts)}\n"
            + "\nUNION ALL\n".join(rows)
            + "\nORDER BY table_name, check_name")


@query("dq_expectation_report", oracle=_suite_sql())
def dq_expectation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style declarative constraint suite over three tables —
    twelve named checks (not_null / unique / accepted_values /
    in_range / regex / cross-column expression), each reported as one
    row with its scan count, violation count, and verdict.

    Each table's checks compile into ONE conditional-aggregate scan
    (operators/expectations.py:run_checks), so the whole gate costs
    three scans and three 1-row exchanges at any SF; the unpivot is a
    ``stack`` over the single aggregated row.  Pipelines gate a publish
    on ``filter(NOT passed).count() == 0`` — the write-audit-publish
    writer (sources/writers.py:84) is the intended consumer."""
    ev = table(spark, sf_dir, "events")
    doc = table(spark, sf_dir, "documents")
    orders = table(spark, sf_dir, "orders")
    report = (
        X.run_checks(ev, "events", [
            X.not_null("event_id"),
            X.unique("event_id"),
            X.accepted_values("event_type", _EVENT_TYPES),
            X.in_range("value", 0, 1000000.0),
            X.not_null("user_id"),
            X.matches("props", "^[{].*[}]$"),
        ])
        .unionByName(X.run_checks(doc, "documents", [
            X.unique("doc_id"),
            X.expression("n_chars_consistent",
                         F.col("n_chars") == F.length("text")),
            X.accepted_values("lang", _LANGS),
        ]))
        .unionByName(X.run_checks(orders, "orders", [
            X.unique("o_orderkey"),
            X.in_range("o_totalprice", 0, 1000000.0),
            X.not_null("o_orderdate"),
        ])))
    return report.orderBy("table_name", "check_name")


_FK_EDGES = [
    # (child, fk, parent, pk)
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("events", "user_id", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
]


def _ri_sql() -> str:
    edges = []
    for child, fk, parent, pk in _FK_EDGES:
        orphan = (f"{fk} IS NOT NULL AND {fk} NOT IN"
                  f" (SELECT {pk} FROM {parent})")
        edges.append(f"""
    SELECT '{child}' AS child_table, '{fk}' AS fk_column,
           CAST(COUNT(*) AS BIGINT) AS child_rows,
           CAST(COUNT(DISTINCT {fk}) AS BIGINT) AS distinct_keys,
           CAST(SUM(CASE WHEN {fk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_fks,
           CAST(SUM(CASE WHEN {orphan} THEN 1 ELSE 0 END) AS BIGINT)
               AS orphan_rows,
           CAST(COUNT(DISTINCT CASE WHEN {orphan} THEN {fk} END) AS BIGINT)
               AS orphan_keys
    FROM {child}""")
    return ("SELECT child_table, fk_column, child_rows, distinct_keys,"
            " null_fks, orphan_rows, orphan_keys,"
            " orphan_rows = 0 AS intact FROM ("
            + "\nUNION ALL\n".join(edges)
            + ") ORDER BY child_table, fk_column")


@query("dq_referential_integrity", oracle=_ri_sql())
def dq_referential_integrity(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Referential-integrity audit over every FK edge of the star
    schema (seven TPC-H-ish edges plus events.user_id→customer): per
    edge, the child row count, distinct/NULL key counts, orphan rows
    and orphan keys, and the intact verdict — all value-checked.

    Each edge is one broadcast left-anti probe against the DISTINCT
    parent key set (operators/expectations.py:fk_audit): dimension
    parents (region/nation/customer/part/supplier) broadcast outright;
    the one fact-fact edge (lineitem→orders) broadcasts its key set at
    test SF and falls back to a shuffled anti join under AQE at 100 TB.
    NULL FKs report separately from orphans, so optional relationships
    don't read as corruption."""
    frames = []
    for child, fk, parent, pk in _FK_EDGES:
        frames.append(X.fk_audit(table(spark, sf_dir, child), child, fk,
                                 table(spark, sf_dir, parent), pk))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("child_table", "fk_column")


# ---------------------------------------------------------------------------
# Privacy measurement: k-anonymity / l-diversity audit (Sweeney 2002,
# Machanavajjhala et al. 2007).  A training-data release pipeline needs
# to quantify re-identification risk BEFORE publishing derived tables;
# this is the measurement half (the redaction half is pii_redaction in
# plans/llm.py).
# ---------------------------------------------------------------------------

_QI_LEVELS = [
    ("type", "event_type"),
    ("type+day", "event_type, day"),
    ("type+day+valbucket", "event_type, day, val_bucket"),
]


def _kanon_sql() -> str:
    levels = []
    for name, keys in _QI_LEVELS:
        levels.append(f"""
    SELECT '{name}' AS qi_level, n_rows, n_classes, k_min,
           rows_below_k5,
           ROUND(CAST(rows_below_k5 AS DOUBLE) / n_rows, 6) + 0.0
               AS pct_rows_below_k5,
           l_min
    FROM (
        SELECT CAST(SUM(class_rows) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(MIN(class_rows) AS BIGINT) AS k_min,
               CAST(SUM(CASE WHEN class_rows < 5 THEN class_rows
                             ELSE 0 END) AS BIGINT) AS rows_below_k5,
               CAST(MIN(class_users) AS BIGINT) AS l_min
        FROM (
            SELECT {keys},
                   SUM(cnt) AS class_rows,
                   COUNT(DISTINCT user_id) AS class_users
            FROM base GROUP BY {keys})
    )""")
    return ("""
    WITH base AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(FLOOR(value / 10) AS BIGINT) AS val_bucket,
               user_id, COUNT(*) AS cnt
        FROM events GROUP BY 1, 2, 3, 4)
    """ + "\nUNION ALL\n".join(levels)
            + "\nORDER BY qi_level")


@query("k_anonymity_audit", oracle=_kanon_sql())
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit of the events table under a
    three-rung quasi-identifier ladder (event_type; +day; +value
    decile-bucket): per rung, the equivalence-class count, the minimum
    class size k, the row mass in classes below k=5 (the standard
    suppression threshold), and the minimum per-class distinct-user
    count l (diversity of the sensitive attribute).  Coarse rungs are
    safe (large classes); the fine rung quantifies exactly how much
    re-identification surface a naive full-resolution release adds.

    One corpus-scale pass builds the (QI..., user)-grain base frame;
    every rung then REGROUPS that bounded frame (class sizes sum, user
    diversity re-counted — never re-scanning the corpus), so the audit
    costs one scan plus three aggregations over a frame bounded by
    |QI-combos| x |users| regardless of input size."""
    ev = table(spark, sf_dir, "events")
    base = (ev.select("event_type",
                      F.col("ts").cast("date").alias("day"),
                      F.floor(F.col("value") / 10).cast("bigint")
                      .alias("val_bucket"),
                      "user_id")
            .groupBy("event_type", "day", "val_bucket", "user_id")
            .agg(F.count(F.lit(1)).alias("cnt")))
    base = base.persist()
    frames = []
    for name, keys in _QI_LEVELS:
        cols = [k.strip() for k in keys.split(",")]
        classes = (base.groupBy(*cols)
                   .agg(F.sum("cnt").alias("class_rows"),
                        F.countDistinct("user_id").alias("class_users")))
        frames.append(classes.agg(
            F.sum("class_rows").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            F.min("class_rows").cast("bigint").alias("k_min"),
            F.sum(F.when(F.col("class_rows") < 5, F.col("class_rows"))
                  .otherwise(0)).cast("bigint").alias("rows_below_k5"),
            F.min("class_users").cast("bigint").alias("l_min"))
            .select(F.lit(name).alias("qi_level"), "n_rows", "n_classes",
                    "k_min", "rows_below_k5",
                    (F.round(F.col("rows_below_k5").cast("double")
                             / F.col("n_rows"), 6) + F.lit(0.0))
                    .alias("pct_rows_below_k5"),
                    "l_min"))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("qi_level")
