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
