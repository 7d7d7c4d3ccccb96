"""Round-12 pins.

Part 1 — round-11 advice fixes the oracle hashes cannot see:

* ``apply_feed_to_grouped_sum`` against an EMPTY state must APPLY the
  feed (the NULL max(__applied_v) watermark coalesces to −1) instead of
  silently discarding every insert, and a feed STRICTLY OLDER than the
  watermark must raise (unapplied out-of-order feed = data loss), while
  replaying the exact applied version stays a no-op;
* the protobuf shim must never trust a pre-existing dir this uid does
  not own (squatter fallback builds a private 0700 shim instead);
* the per-process band/IVF index token dirs must register their own
  atexit removal and sweep stale crashed-process siblings.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

_STATE_SCHEMA = ("grp BIGINT, n_rows BIGINT, sum_cents BIGINT, "
                 "__applied_v BIGINT")
_FEED_SCHEMA = ("event_id BIGINT, change_type STRING, "
                "old_cents BIGINT, new_cents BIGINT")


def _feed(spark, rows):
    return spark.createDataFrame(rows, _FEED_SCHEMA)


def test_feed_apply_to_empty_state_applies(spark):
    """Initial load: a zero-row state's watermark is NULL; the coalesced
    −1 watermark must let the first feed through instead of silently
    discarding it (round-11 advice — inserts to an empty aggregate
    state were lost with no error)."""
    from etl_cloud_batch_processing_spark.plans.evolution import (
        apply_feed_to_grouped_sum,
    )

    state = spark.createDataFrame([], _STATE_SCHEMA)
    feed = _feed(spark, [(7, "insert", None, 100),
                         (14, "insert", None, 250),
                         (8, "insert", None, 30)])
    got = sorted(tuple(r) for r in
                 apply_feed_to_grouped_sum(state, feed, 1).collect())
    assert got == [(0, 2, 350, 1), (1, 1, 30, 1)]


def test_feed_apply_older_feed_raises(spark):
    """A feed version STRICTLY BELOW the applied watermark is not a
    replay — skipping it silently would lose its changes, so the gate
    raises at execution time."""
    from etl_cloud_batch_processing_spark.plans.evolution import (
        apply_feed_to_grouped_sum,
    )

    state = spark.createDataFrame([(0, 2, 350, 5)], _STATE_SCHEMA)
    feed = _feed(spark, [(7, "insert", None, 100)])
    with pytest.raises(Exception, match="OLDER than the applied"):
        apply_feed_to_grouped_sum(state, feed, 3).collect()
    # the exact applied version replayed is still a silent no-op
    same = apply_feed_to_grouped_sum(state, feed, 5)
    assert [tuple(r) for r in same.collect()] == [(0, 2, 350, 5)]


def test_feed_apply_after_full_delete_then_insert(spark):
    """The empty-state edge the advice singled out: a feed that deletes
    every row empties the state (n_rows > 0 filter drops all groups);
    the NEXT feed's inserts must still apply against that empty state."""
    from etl_cloud_batch_processing_spark.plans.evolution import (
        apply_feed_to_grouped_sum,
    )

    state = spark.createDataFrame([(0, 1, 100, 1)], _STATE_SCHEMA)
    wipe = _feed(spark, [(7, "delete", 100, None)])
    emptied = apply_feed_to_grouped_sum(state, wipe, 2)
    assert emptied.count() == 0
    refill = _feed(spark, [(14, "insert", None, 40)])
    got = [tuple(r) for r in
           apply_feed_to_grouped_sum(emptied, refill, 3).collect()]
    assert got == [(0, 1, 40, 3)]


def test_protobuf_shim_rejects_squatted_dir(tmp_path):
    """A pre-existing shim dir NOT trustable by this uid (here:
    world-writable stands in for foreign-owned — the same _owned_by_me
    gate rejects both) must not be returned; the builder falls back to
    a fresh private dir it owns."""
    from etl_cloud_batch_processing_spark.streaming import stateful as S

    vendor = str(tmp_path / "vendor")
    os.makedirs(os.path.join(vendor, "google", "protobuf"))
    squat = str(tmp_path / "shim")
    os.makedirs(os.path.join(squat, "google", "protobuf"))
    os.chmod(squat, 0o777)
    assert not S._owned_by_me(squat)
    got = S.build_protobuf_shim(vendor=vendor, shim=squat)
    assert got is not None and got != squat
    assert S._owned_by_me(got)
    assert os.path.isdir(os.path.join(got, "google", "protobuf"))
    import shutil

    shutil.rmtree(got, ignore_errors=True)


def test_protobuf_shim_reuses_own_dir(tmp_path):
    """An absent shim is built at the requested path (0700, owned) and
    a second call reuses it."""
    from etl_cloud_batch_processing_spark.streaming import stateful as S

    vendor = str(tmp_path / "vendor")
    os.makedirs(os.path.join(vendor, "google", "protobuf"))
    shim = str(tmp_path / "fresh_shim")
    got = S.build_protobuf_shim(vendor=vendor, shim=shim)
    assert got == shim and S._owned_by_me(shim)
    assert S.build_protobuf_shim(vendor=vendor, shim=shim) == shim


# ---------------------------------------------------------------------------
# Atomic REPLACE (round-11 verdict ask #1): delete + insert land as ONE
# manifest version flip — no intermediate deletes-applied-inserts-missing
# version can ever be observed.
# ---------------------------------------------------------------------------

def _kv(spark, rows):
    return spark.createDataFrame(rows, "k BIGINT, v BIGINT")


def test_replace_manifested_is_one_commit(spark, tmp_path):
    """An UPDATE through replace_manifested (delete old rows + insert
    their replacements) advances the manifest by EXACTLY ONE version:
    a reader pinned at any existing version sees either the complete
    old or the complete new table — the doc-vanishes-from-search
    window of the two-commit apply cannot exist because the
    intermediate version is never created."""
    from etl_cloud_batch_processing_spark.sources import manifest as M

    path = str(tmp_path / "t")
    M.publish_manifested(_kv(spark, [(1, 10), (2, 20), (3, 30)]),
                         path, "base")
    _, hpath, fs = M._fs(spark, path)
    assert M._versions(hpath, fs, path) == [1]

    rep = M.replace_manifested(
        spark, path, F.col("k") == 2,
        _kv(spark, [(2, 99), (4, 40)]), "b1")
    # exactly one new version, no gap, no intermediate
    assert M._versions(hpath, fs, path) == [1, 2]
    assert rep["version"] == 2
    assert rep["rows_deleted"] == 1 and rep["rows_inserted"] == 2

    def snap(v):
        return sorted(tuple(r) for r in
                      (M.read_manifest(spark, path, version=v)
                       .select("k", "v").collect()))

    assert snap(1) == [(1, 10), (2, 20), (3, 30)]   # complete OLD
    assert snap(2) == [(1, 10), (2, 99), (3, 30), (4, 40)]  # complete NEW
    # key 2 is present in EVERY readable version — never vanished
    for v in (1, 2):
        assert any(k == 2 for k, _ in snap(v))


def test_replace_manifested_reapply_is_idempotent(spark, tmp_path):
    """Re-applying the same feed batch (same run_date, same delete
    predicate) replaces its own earlier insert run instead of
    doubling it — at-least-once feed delivery is safe."""
    from etl_cloud_batch_processing_spark.sources import manifest as M

    path = str(tmp_path / "t")
    M.publish_manifested(_kv(spark, [(1, 10), (2, 20)]), path, "base")
    for _ in range(2):
        M.replace_manifested(spark, path, F.col("k") == 2,
                             _kv(spark, [(2, 99)]), "b1")
    got = sorted(tuple(r) for r in
                 (M.read_manifest(spark, path)
                  .select("k", "v").collect()))
    assert got == [(1, 10), (2, 99)]


def test_replace_manifested_zero_hit_delete_still_inserts(spark, tmp_path):
    """A feed with no matching deletes degrades to a pure insert run in
    the same single commit (files_affected == 0, one version flip)."""
    from etl_cloud_batch_processing_spark.sources import manifest as M

    path = str(tmp_path / "t")
    M.publish_manifested(_kv(spark, [(1, 10)]), path, "base")
    rep = M.replace_manifested(spark, path, F.col("k") == 777,
                               _kv(spark, [(5, 50)]), "b1")
    assert rep["files_affected"] == 0 and rep["version"] == 2
    got = sorted(tuple(r) for r in
                 (M.read_manifest(spark, path)
                  .select("k", "v").collect()))
    assert got == [(1, 10), (5, 50)]


def test_token_dir_cleanup_sweeps_stale_siblings(tmp_path):
    """_register_token_dir_cleanup removes crashed processes' stale
    token dirs (mtime past the staleness window) but never fresh
    siblings or the process's own root."""
    import time

    from etl_cloud_batch_processing_spark.operators.dedup import (
        _TOKEN_DIR_STALE_SECS, _register_token_dir_cleanup,
    )

    own = tmp_path / "band_index_steady-own1"
    stale = tmp_path / "band_index_steady-dead"
    fresh = tmp_path / "band_index_steady-live"
    other = tmp_path / "unrelated-dir"
    for d in (stale, fresh, other):
        d.mkdir()
    old = time.time() - _TOKEN_DIR_STALE_SECS - 60
    os.utime(stale, (old, old))
    os.utime(other, (old, old))
    _register_token_dir_cleanup(str(own), "band_index_steady-")
    assert not stale.exists()          # swept
    assert fresh.exists()              # within window
    assert other.exists()              # wrong prefix never touched
