"""Incremental SCD2 MERGE (operators/merge.py merge_scd2): the
close/insert/keep arithmetic, per-run idempotency, the out-of-order
guard, and the composition with manifest-committed publication that
makes the dimension rewrite reader-atomic."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_cloud_batch_processing_spark.operators.merge import (
    SCD2_COLS,
    merge_scd2,
    scd2_schema_from,
)

KEY = ["user_id"]


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


def _batch(spark, rows):
    return spark.createDataFrame(
        [(u, t, ts) for u, t, ts in rows],
        "user_id bigint, event_type string, obs_ts timestamp_ntz")


def _collect(dim):
    # (user_id, valid_from) is unique per version row; sorting on it
    # keeps None-able columns out of the comparison key
    return sorted(
        ((r["user_id"], r["event_type"], r["valid_from"], r["valid_to"],
          r["is_current"]) for r in dim.collect()),
        key=lambda t: (t[0], t[2]))


def test_scd2_close_insert_keep(spark):
    """One changed key → closed old version + open new one; one
    unchanged key → untouched (original valid_from survives); one new
    key → fresh insert; history rows pass through."""
    b1 = _batch(spark, [(1, "view", _ts(1)), (2, "click", _ts(1))])
    b2 = _batch(spark, [(1, "purchase", _ts(5)), (2, "click", _ts(5)),
                        (3, "signup", _ts(5))])
    dim = merge_scd2(scd2_schema_from(b1, KEY, "obs_ts"), b1, KEY, "obs_ts")
    dim = merge_scd2(dim, b2, KEY, "obs_ts")
    assert _collect(dim) == [
        (1, "view", _ts(1), _ts(5), False),
        (1, "purchase", _ts(5), None, True),
        (2, "click", _ts(1), None, True),
        (3, "signup", _ts(5), None, True),
    ]
    # the SCD2 invariant: valid_to IS NULL <=> is_current
    assert all((r[3] is None) == r[4] for r in _collect(dim))


def test_scd2_rerun_is_idempotent(spark):
    """Re-merging the SAME batch changes nothing: after run 1 the
    current version equals the observation, so the NULL-safe compare
    classifies every key as unchanged."""
    b1 = _batch(spark, [(1, "view", _ts(1)), (2, "click", _ts(1))])
    b2 = _batch(spark, [(1, "purchase", _ts(5))])
    dim = merge_scd2(scd2_schema_from(b1, KEY, "obs_ts"), b1, KEY, "obs_ts")
    dim = merge_scd2(dim, b2, KEY, "obs_ts")
    once = _collect(dim)
    assert _collect(merge_scd2(dim, b2, KEY, "obs_ts")) == once
    assert _collect(
        merge_scd2(merge_scd2(dim, b2, KEY, "obs_ts"),
                   b2, KEY, "obs_ts")) == once


def test_scd2_stale_update_never_rewrites_history(spark):
    """An observation at or before the current version's valid_from is
    dropped for matched keys — late data is a backfill concern, not a
    forward-merge one."""
    b1 = _batch(spark, [(1, "view", _ts(5))])
    stale = _batch(spark, [(1, "purchase", _ts(3))])   # before valid_from
    same_ts = _batch(spark, [(1, "purchase", _ts(5))])  # == valid_from
    dim = merge_scd2(scd2_schema_from(b1, KEY, "obs_ts"), b1, KEY, "obs_ts")
    base = _collect(dim)
    assert _collect(merge_scd2(dim, stale, KEY, "obs_ts")) == base
    assert _collect(merge_scd2(dim, same_ts, KEY, "obs_ts")) == base


def test_scd2_null_tracked_values_compare_null_safely(spark):
    """NULL→value and value→NULL are CHANGES; NULL→NULL is not."""
    b1 = _batch(spark, [(1, None, _ts(1)), (2, "click", _ts(1))])
    b2 = _batch(spark, [(1, None, _ts(5)), (2, None, _ts(5))])
    dim = merge_scd2(scd2_schema_from(b1, KEY, "obs_ts"), b1, KEY, "obs_ts")
    dim = merge_scd2(dim, b2, KEY, "obs_ts")
    assert _collect(dim) == [
        (1, None, _ts(1), None, True),          # NULL == NULL: unchanged
        (2, "click", _ts(1), _ts(5), False),    # value -> NULL: new version
        (2, None, _ts(5), None, True),
    ]


def test_scd2_composes_with_manifest_publication(spark, tmp_path):
    """The across-RUNS shape: each run merges its batch into the
    dimension read back from the manifested table and republishes under
    the same run_date — one atomic manifest flip per run, snapshot
    isolation for concurrent readers, and a rerun of run 2 leaves the
    table byte-identical."""
    from etl_cloud_batch_processing_spark.sources import manifest as M

    path = str(tmp_path / "dim_user")
    b1 = _batch(spark, [(1, "view", _ts(1)), (2, "click", _ts(1))])
    b2 = _batch(spark, [(1, "purchase", _ts(5)), (3, "signup", _ts(5))])

    dim1 = merge_scd2(scd2_schema_from(b1, KEY, "obs_ts"), b1, KEY,
                      "obs_ts")
    M.publish_manifested(dim1, path, "current")
    v1 = M.current_manifest(spark, path)[0]

    stored = M.read_manifest(spark, path).drop("dt")
    dim2 = merge_scd2(stored, b2, KEY, "obs_ts")
    M.publish_manifested(dim2, path, "current")

    got = _collect(M.read_manifest(spark, path).drop("dt"))
    assert got == [
        (1, "view", _ts(1), _ts(5), False),
        (1, "purchase", _ts(5), None, True),
        (2, "click", _ts(1), None, True),
        (3, "signup", _ts(5), None, True),
    ]
    # snapshot isolation: a reader pinned to the pre-run-2 version
    # still sees run 1's dimension
    assert _collect(M.read_manifest(spark, path, version=v1)
                    .drop("dt")) == _collect(dim1)
    # rerun of run 2 (same batch, same run_date): same logical table
    stored2 = M.read_manifest(spark, path).drop("dt")
    M.publish_manifested(merge_scd2(stored2, b2, KEY, "obs_ts"),
                         path, "current")
    assert _collect(M.read_manifest(spark, path).drop("dt")) == got


def test_scd2_registered_query_matches_one_shot_on_batch_grain(spark):
    """Cross-check the registered replay against scd2_user_type_history
    collapsed to the same two-observation grain: every (user, type)
    current row the merge produces must be that user's latest type in
    the fixture window."""
    from etl_cloud_batch_processing_spark.plans.analytics import (
        scd2_incremental_merge,
    )

    sf = "/root/testdata/sf0.001"
    dim = scd2_incremental_merge(spark, sf)
    cur = {r["user_id"]: r["event_type"]
           for r in dim.filter("is_current").collect()}
    ev = spark.read.parquet(f"{sf}/events.parquet")
    ts = dict(ev.dtypes)["ts"]
    if ts == "bigint":  # nanos fixtures (DRIVER_NOTES #3)
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    latest = {r["user_id"]: r["event_type"] for r in
              (ev.withColumn(
                  "rn", F.row_number().over(
                      __import__("pyspark.sql.window",
                                 fromlist=["Window"]).Window
                      .partitionBy("user_id")
                      .orderBy(F.desc("ts"), F.desc("event_id"))))
               .filter("rn = 1").collect())}
    assert cur == latest
    # per-key chain integrity: each closed row's valid_to equals the
    # successor's valid_from
    rows = sorted((r["user_id"], r["valid_from"], r["valid_to"])
                  for r in dim.collect())
    by_key: dict = {}
    for u, vf, vt in rows:
        by_key.setdefault(u, []).append((vf, vt))
    for chain in by_key.values():
        for (vf, vt), (nvf, _) in zip(chain, chain[1:]):
            assert vt == nvf
        assert chain[-1][1] is None
    assert set(dim.columns) == {"user_id", "event_type", *SCD2_COLS}


def test_scd2_null_observation_time_raises(spark):
    """A NULL ts_col would silently drop matched keys (NULL compare →
    changed=false) and insert valid_from-NULL rows that break the
    valid_to IS NULL ⇔ is_current chain — the merge must fail fast
    instead (round-10 advice)."""
    b1 = _batch(spark, [(1, "view", _ts(1))])
    dim = merge_scd2(scd2_schema_from(b1, KEY, "obs_ts"), b1, KEY, "obs_ts")
    bad = _batch(spark, [(1, "purchase", None)])
    with pytest.raises(Exception, match="merge_scd2"):
        merge_scd2(dim, bad, KEY, "obs_ts").collect()
    # a batch with every row carrying a real time still merges fine
    ok = _batch(spark, [(1, "purchase", _ts(5))])
    assert merge_scd2(dim, ok, KEY, "obs_ts").count() == 2


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
