"""Round-12 part-2 pins: the DML/ time-travel/ concurrency/ streaming
closures on the manifest layer.

* ``update_where_manifested`` — UPDATE ... SET as ONE copy-on-write
  commit: SQL NULL-predicate semantics, simultaneous (column-swap)
  assignment, unknown-column refusal, untouched-file byte-identity,
  no-match no-op;
* ``restore_manifested`` + ``as_of_ms`` — RESTORE TO VERSION preserves
  history and copies nothing; refuses when vacuum broke the target;
  TIMESTAMP AS OF resolves the latest commit at-or-before and refuses
  pre-history instants;
* ``require_remove_present`` — optimistic-concurrency conflict
  detection: a commit removing a file a concurrent commit already
  retired REFUSES (the silent replay would resurrect deleted rows);
* ``manifest_changes`` streaming source — versions-as-offsets with the
  Delta contract: delete-only commits refuse without ``ignoreDeletes``,
  rewrite commits refuse without ``ignoreChanges``, offsets resume
  across drains, ``startingVersion`` skips history.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_cloud_batch_processing_spark.sources import manifest as M
from etl_cloud_batch_processing_spark.sources import manifest_stream


def _kv(spark, rows):
    return spark.createDataFrame(rows, "k BIGINT, v BIGINT")


def _snap(spark, path, version=None, as_of_ms=None):
    return sorted(tuple(r) for r in
                  (M.read_manifest(spark, path, version=version,
                                   as_of_ms=as_of_ms)
                   .select("k", "v").collect()))


# ---------------------------------------------------------------------------
# UPDATE ... SET (copy-on-write, one commit).
# ---------------------------------------------------------------------------

def test_update_one_commit_and_pinned_old_version(spark, tmp_path):
    path = str(tmp_path / "t")
    M.publish_manifested(_kv(spark, [(1, 10), (2, 20), (3, 30)])
                         .coalesce(1),   # one file → k=1 rides along
                         path, "base")
    rep = M.update_where_manifested(spark, path, F.col("k") >= 2,
                                    {"v": F.col("v") + 1})
    _, hpath, fs = M._fs(spark, path)
    assert M._versions(hpath, fs, path) == [1, 2]
    assert rep["rows_updated"] == 2 and rep["rows_rewritten"] == 1
    assert _snap(spark, path) == [(1, 10), (2, 21), (3, 31)]
    # pinned reader still sees the complete pre-update table
    assert _snap(spark, path, version=1) == [(1, 10), (2, 20), (3, 30)]


def test_update_null_predicate_rows_survive_unchanged(spark, tmp_path):
    """SQL UPDATE semantics: WHERE NULL is not-matched — the row rides
    along unchanged, it is neither updated nor lost."""
    path = str(tmp_path / "t")
    M.publish_manifested(_kv(spark, [(1, 10), (2, None), (3, 30)]),
                         path, "base")
    M.update_where_manifested(spark, path, F.col("v") > 10,
                              {"v": F.lit(0)})
    assert _snap(spark, path) == [(1, 10), (2, None), (3, 0)]


def test_update_simultaneous_assignment_swap(spark, tmp_path):
    """Assignments evaluate against the PRE-update row — the SQL
    simultaneous-assignment contract, so a two-column swap works."""
    path = str(tmp_path / "t")
    M.publish_manifested(_kv(spark, [(1, 10), (7, 70)]), path, "base")
    M.update_where_manifested(spark, path, F.col("k") == 7,
                              {"k": F.col("v"), "v": F.col("k")})
    assert _snap(spark, path) == [(1, 10), (70, 7)]


def test_update_unknown_column_refused(spark, tmp_path):
    path = str(tmp_path / "t")
    M.publish_manifested(_kv(spark, [(1, 10)]), path, "base")
    with pytest.raises(ValueError, match="does not have"):
        M.update_where_manifested(spark, path, F.col("k") == 1,
                                  {"nope": F.lit(0)})


def test_update_untouched_files_byte_identical(spark, tmp_path):
    """Only files holding matched rows are rewritten; a partition the
    predicate never touches keeps its exact bytes (the Delta UPDATE
    cost shape — rewrite bounded by files-holding-matches)."""
    path = str(tmp_path / "t")
    M.publish_manifested(_kv(spark, [(1, 10), (2, 20)]), path, "r1")
    M.publish_manifested(_kv(spark, [(100, 1000)]), path, "r2")
    _, before = M.current_manifest(spark, path)
    r2_files = sorted(e["file"] for e in before if e.get("dt") == "r2")
    raw = {f: open(f"{path}/{f}", "rb").read() for f in r2_files}
    M.update_where_manifested(spark, path, F.col("k") < 50,
                              {"v": F.lit(0)})
    _, after = M.current_manifest(spark, path)
    assert sorted(e["file"] for e in after
                  if e["file"] in set(r2_files)) == r2_files
    for f in r2_files:
        assert open(f"{path}/{f}", "rb").read() == raw[f]
    assert _snap(spark, path) == [(1, 0), (2, 0), (100, 1000)]


def test_update_no_match_is_noop(spark, tmp_path):
    path = str(tmp_path / "t")
    M.publish_manifested(_kv(spark, [(1, 10)]), path, "base")
    rep = M.update_where_manifested(spark, path, F.col("k") == 999,
                                    {"v": F.lit(0)})
    assert rep["files_affected"] == 0 and rep["version"] == 1
    _, hpath, fs = M._fs(spark, path)
    assert M._versions(hpath, fs, path) == [1]


def test_update_applies_through_deletion_vectors(spark, tmp_path):
    """An UPDATE on a MoR-deleted table must not resurrect the DV'd
    row: the rewrite folds the DV (scan is DV-aware), and the deleted
    row stays deleted."""
    path = str(tmp_path / "t")
    M.publish_manifested(_kv(spark, [(1, 10), (2, 20), (3, 30)]),
                         path, "base")
    M.delete_where_mor(spark, path, F.col("k") == 2)
    M.update_where_manifested(spark, path, F.col("k") >= 1,
                              {"v": F.col("v") * 2})
    assert _snap(spark, path) == [(1, 20), (3, 60)]


# ---------------------------------------------------------------------------
# RESTORE TO VERSION + TIMESTAMP AS OF.
# ---------------------------------------------------------------------------

def test_restore_rolls_back_and_preserves_history(spark, tmp_path):
    path = str(tmp_path / "t")
    M.publish_manifested(_kv(spark, [(1, 10), (2, 20)]), path, "base")
    M.delete_where_manifested(spark, path, F.col("k") == 2)      # v2
    rep = M.restore_manifested(spark, path, 1)                   # v3
    assert rep["version"] == 3 and rep["restored_from"] == 1
    assert _snap(spark, path) == [(1, 10), (2, 20)]              # back
    assert _snap(spark, path, version=2) == [(1, 10)]            # audit


def test_restore_refuses_after_vacuum(spark, tmp_path):
    """Restore re-references files, copies nothing — so once vacuum
    collected the target's files the restore must refuse up front, not
    commit a table that fails at scan time."""
    path = str(tmp_path / "t")
    M.publish_manifested(_kv(spark, [(1, 10)]), path, "r1")      # v1
    M.publish_manifested(_kv(spark, [(9, 90)]), path, "r1")      # v2
    M.vacuum(spark, path, retain_versions=1)
    # vacuum removed v1's manifest with its files: loud refusal at
    # version resolution
    with pytest.raises(FileNotFoundError, match="not found"):
        M.restore_manifested(spark, path, 1)


def test_restore_refuses_when_target_files_damaged(spark, tmp_path):
    """Defense-in-depth behind the manifest check: a target version
    whose manifest survives but whose data files are gone (manual
    damage, partial external cleanup) refuses BEFORE committing — a
    restore must never publish a table that fails at scan time."""
    path = str(tmp_path / "t")
    M.publish_manifested(_kv(spark, [(1, 10)]), path, "r1")      # v1
    M.publish_manifested(_kv(spark, [(9, 90)]), path, "r2")      # v2
    _, v1_entries = M.current_manifest(spark, path, version=1)
    os.remove(f"{path}/{v1_entries[0]['file']}")
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        M.restore_manifested(spark, path, 1)


def test_as_of_resolution_and_refusals(spark, tmp_path):
    import time

    path = str(tmp_path / "t")
    M.publish_manifested(_kv(spark, [(1, 10)]), path, "r1")      # v1
    _, hpath, fs = M._fs(spark, path)
    t1 = M._commit_time_ms(spark, hpath, fs, path, 1)
    while int(time.time() * 1000) <= t1:
        time.sleep(0.002)
    M.publish_manifested(_kv(spark, [(2, 20)]), path, "r2")      # v2
    t2 = M._commit_time_ms(spark, hpath, fs, path, 2)
    assert t2 > t1
    assert M.resolve_as_of(spark, path, t2 - 1) == 1
    assert M.resolve_as_of(spark, path, t2) == 2
    assert _snap(spark, path, as_of_ms=t2 - 1) == [(1, 10)]
    with pytest.raises(ValueError, match="predates"):
        M.resolve_as_of(spark, path, t1 - 1)
    with pytest.raises(ValueError, match="not both"):
        M.read_manifest(spark, path, version=1, as_of_ms=t2)


# ---------------------------------------------------------------------------
# Optimistic-concurrency conflict detection.
# ---------------------------------------------------------------------------

def test_strict_remove_refuses_retired_file(spark, tmp_path):
    """The resurrection anomaly, mechanically: writer A snapshots v1,
    a concurrent compaction (v2) retires A's files, then A's commit —
    remove computed against the dead snapshot — must raise instead of
    silently dropping the missing removes and committing A's stale
    rewrite."""
    path = str(tmp_path / "t")
    M.publish_manifested(_kv(spark, [(1, 10), (2, 20)]), path, "base")
    _, v1_entries = M.current_manifest(spark, path)
    M.compact_manifested(spark, path)                            # v2
    with pytest.raises(M.ConcurrentModificationError,
                       match="concurrent commit"):
        M.commit_manifest(spark, path,
                          remove=[v1_entries[0]["file"]],
                          require_remove_present=True)
    _, hpath, fs = M._fs(spark, path)
    assert M._versions(hpath, fs, path) == [1, 2]   # nothing committed


def test_nonstrict_commit_keeps_legacy_semantics(spark, tmp_path):
    """Raw commit_manifest without the flag keeps the old drop-missing
    behavior (append-only callers replaying adds are correct by
    construction); only snapshot-derived writers opt into strict."""
    path = str(tmp_path / "t")
    M.publish_manifested(_kv(spark, [(1, 10)]), path, "base")
    v = M.commit_manifest(spark, path, remove=["not-there.parquet"])
    assert v == 2


def test_disjoint_sequential_writers_compose(spark, tmp_path):
    """Strict-remove blocks conflicts, not composition: deletes whose
    snapshots are fresh land one after another."""
    path = str(tmp_path / "t")
    M.publish_manifested(_kv(spark, [(1, 10), (2, 20), (3, 30)]),
                         path, "base")
    M.delete_where_manifested(spark, path, F.col("k") == 1)
    M.delete_where_manifested(spark, path, F.col("k") == 3)
    assert _snap(spark, path) == [(2, 20)]


# ---------------------------------------------------------------------------
# manifest_changes streaming source.
# ---------------------------------------------------------------------------

def _drain(spark, path, tmp_path, tag, **opts):
    """One AvailableNow drain appending raw rows to a parquet log;
    reusing the same tag resumes from the tag's checkpoint."""
    out = str(tmp_path / f"{tag}_out")
    ckpt = str(tmp_path / f"{tag}_ckpt")
    manifest_stream.register(spark)
    reader = (spark.readStream.format("manifest_changes")
              .option("path", path))
    for kk, vv in opts.items():
        reader = reader.option(kk, vv)
    q = (reader.load().writeStream
         .foreachBatch(lambda b, _i:
                       b.write.mode("append").parquet(out))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    if not os.path.isdir(out):
        return []
    return sorted(tuple(r) for r in
                  (spark.read.parquet(out).select("k", "v").collect()))


def test_stream_appends_and_resumes_offsets(spark, tmp_path):
    path = str(tmp_path / "t")
    M.publish_manifested(_kv(spark, [(1, 10)]), path, "r1")      # v1
    M.publish_manifested(_kv(spark, [(2, 20)]), path, "r2")      # v2
    assert _drain(spark, path, tmp_path, "a") == [(1, 10), (2, 20)]
    # same checkpoint: a new commit streams WITHOUT re-reading v1/v2
    M.publish_manifested(_kv(spark, [(3, 30)]), path, "r3")      # v3
    assert _drain(spark, path, tmp_path, "a") == [
        (1, 10), (2, 20), (3, 30)]


def test_stream_starting_version_skips_history(spark, tmp_path):
    path = str(tmp_path / "t")
    M.publish_manifested(_kv(spark, [(1, 10)]), path, "r1")      # v1
    M.publish_manifested(_kv(spark, [(2, 20)]), path, "r2")      # v2
    got = _drain(spark, path, tmp_path, "b", startingVersion="2")
    assert got == [(2, 20)]


def test_stream_refuses_delete_only_commit_by_default(spark, tmp_path):
    path = str(tmp_path / "t")
    M.publish_manifested(_kv(spark, [(1, 10)]), path, "r1")
    M.publish_manifested(_kv(spark, [(2, 20)]), path, "r2")
    _, entries = M.current_manifest(spark, path)
    M.commit_manifest(spark, path, remove=[entries[0]["file"]])
    with pytest.raises(Exception, match="ignoreDeletes"):
        _drain(spark, path, tmp_path, "c")
    # opting in skips the delete-only commit and streams the adds
    got = _drain(spark, path, tmp_path, "d", ignoreDeletes="true")
    assert got == [(1, 10), (2, 20)]


def test_stream_rewrite_requires_ignore_changes(spark, tmp_path):
    path = str(tmp_path / "t")
    M.publish_manifested(_kv(spark, [(1, 10), (2, 20)]).coalesce(1),
                         path, "r1")   # one file → deterministic rewrite
    M.delete_where_manifested(spark, path, F.col("k") == 2)  # rewrite
    with pytest.raises(Exception, match="ignoreChanges"):
        _drain(spark, path, tmp_path, "e")
    # ignoreChanges re-emits the rewritten file (consumer owns dedup —
    # the Delta caveat): original batch + the survivor rewrite
    got = _drain(spark, path, tmp_path, "f", ignoreChanges="true")
    assert got == [(1, 10), (1, 10), (2, 20)]


def test_stream_mor_dv_attach_is_delete_only(spark, tmp_path):
    """A MoR delete re-adds the same file name with a DV reference —
    no new data files, so in streaming terms it is a delete-only
    commit and follows the ignoreDeletes contract."""
    path = str(tmp_path / "t")
    M.publish_manifested(_kv(spark, [(1, 10), (2, 20)]), path, "r1")
    M.delete_where_mor(spark, path, F.col("k") == 2)
    with pytest.raises(Exception, match="ignoreDeletes"):
        _drain(spark, path, tmp_path, "g")
    got = _drain(spark, path, tmp_path, "h", ignoreDeletes="true")
    assert got == [(1, 10), (2, 20)]   # v1's batch only, DV skipped


# ---------------------------------------------------------------------------
# manifest_table Python DataSource writer.
# ---------------------------------------------------------------------------

def _pyw(spark):
    from etl_cloud_batch_processing_spark.sources import pywriter

    pywriter.register(spark)


def test_pywriter_append_overwrite_and_snapshot_isolation(spark, tmp_path):
    _pyw(spark)
    path = str(tmp_path / "t")
    (_kv(spark, [(1, 10), (2, 20)]).repartition(2)
     .write.format("manifest_table").option("path", path)
     .mode("append").save())
    (_kv(spark, [(3, 30)])
     .write.format("manifest_table").option("path", path)
     .mode("append").save())
    assert _snap(spark, path) == [(1, 10), (2, 20), (3, 30)]
    (_kv(spark, [(9, 90)])
     .write.format("manifest_table").option("path", path)
     .mode("overwrite").save())
    _, hpath, fs = M._fs(spark, path)
    assert M._versions(hpath, fs, path) == [1, 2, 3]
    assert _snap(spark, path) == [(9, 90)]
    # snapshot isolation across the overwrite: v2 still complete
    assert _snap(spark, path, version=2) == [(1, 10), (2, 20), (3, 30)]


def test_pywriter_records_and_merges_schema(spark, tmp_path):
    """The Python writer records schema like the JVM layer: a later
    append adding a column merges by name, and the pre-evolution
    files surface typed NULLs under the recorded schema."""
    _pyw(spark)
    path = str(tmp_path / "t")
    (_kv(spark, [(1, 10)])
     .write.format("manifest_table").option("path", path)
     .mode("append").save())
    (spark.createDataFrame([(2, 20, "x")], "k BIGINT, v BIGINT, tag STRING")
     .write.format("manifest_table").option("path", path)
     .mode("append").save())
    rec = M.manifest_schema(spark, path)
    assert [f["name"] for f in rec["fields"]] == ["k", "v", "tag"]
    got = sorted(tuple(r) for r in
                 M.read_manifest(spark, path).collect())
    assert got == [(1, 10, None), (2, 20, "x")]


def test_pywriter_type_conflict_refused(spark, tmp_path):
    _pyw(spark)
    path = str(tmp_path / "t")
    (_kv(spark, [(1, 10)])
     .write.format("manifest_table").option("path", path)
     .mode("append").save())
    with pytest.raises(Exception, match="type conflict"):
        (spark.createDataFrame([("oops", 1)], "v STRING, k BIGINT")
         .write.format("manifest_table").option("path", path)
         .mode("append").save())
    _, hpath, fs = M._fs(spark, path)
    assert M._versions(hpath, fs, path) == [1]   # nothing committed


def test_pywriter_empty_partitions_add_no_entries(spark, tmp_path):
    _pyw(spark)
    path = str(tmp_path / "t")
    (_kv(spark, [(1, 10), (2, 20)]).repartition(8)
     .write.format("manifest_table").option("path", path)
     .mode("append").save())
    _, entries = M.current_manifest(spark, path)
    assert 1 <= len(entries) <= 2          # only non-empty tasks land
    assert all(e["file"] for e in entries)  # no empty-name entries
    assert _snap(spark, path) == [(1, 10), (2, 20)]


def test_pywriter_interops_with_jvm_maintenance(spark, tmp_path):
    """One commit log, two writers: Python-writer commits compose with
    JVM-side delete/compact/vacuum like any publish."""
    _pyw(spark)
    path = str(tmp_path / "t")
    (_kv(spark, [(1, 10), (2, 20), (3, 30)]).repartition(3)
     .write.format("manifest_table").option("path", path)
     .mode("append").save())
    M.delete_where_manifested(spark, path, F.col("k") == 2)
    M.compact_manifested(spark, path)
    M.vacuum(spark, path, retain_versions=1)
    assert _snap(spark, path) == [(1, 10), (3, 30)]


# ---------------------------------------------------------------------------
# manifest_table STREAMING writer (exactly-once sink).
# ---------------------------------------------------------------------------

def _stream_src_to_sink(spark, src, snk, ckpt, app="t"):
    from etl_cloud_batch_processing_spark.sources import pywriter

    pywriter.register(spark)
    manifest_stream.register(spark)
    for _ in range(6):
        q = (spark.readStream.format("manifest_changes")
             .option("path", src).load()
             .writeStream.format("manifest_table")
             .option("path", snk).option("txnAppId", app)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        if sum(int(p["numInputRows"])
               for p in (q.recentProgress or [])) == 0:
            return
    raise RuntimeError("never quiescent")


def test_stream_writer_table_to_table_exactly_once(spark, tmp_path):
    src, snk = str(tmp_path / "src"), str(tmp_path / "snk")
    ckpt = str(tmp_path / "ckpt")
    M.publish_manifested(_kv(spark, [(1, 10)]), src, "r1")
    M.publish_manifested(_kv(spark, [(2, 20)]), src, "r2")
    _stream_src_to_sink(spark, src, snk, ckpt)
    assert _snap(spark, snk) == [(1, 10), (2, 20)]
    M.publish_manifested(_kv(spark, [(3, 30)]), src, "r3")
    _stream_src_to_sink(spark, src, snk, ckpt)   # resume: v3 only
    _stream_src_to_sink(spark, src, snk, ckpt)   # drained: no commit
    assert _snap(spark, snk) == [(1, 10), (2, 20), (3, 30)]
    _, doc = M._manifest_doc(spark, snk)
    assert doc.get("stream_txn")   # the idempotence ledger is recorded


def test_stream_writer_batch_replay_skips(spark, tmp_path):
    """At-least-once delivery × the stream_txn ledger = exactly-once:
    a commit replayed with an already-recorded (app, batchId) key
    commits NOTHING — no new version, no duplicate rows."""
    from etl_cloud_batch_processing_spark.sources import pywriter

    src, snk = str(tmp_path / "src"), str(tmp_path / "snk")
    M.publish_manifested(_kv(spark, [(1, 10)]), src, "r1")
    _stream_src_to_sink(spark, src, snk, str(tmp_path / "ck"))
    _, hpath, fs = M._fs(spark, snk)
    v_before = M._versions(hpath, fs, snk)[-1]
    # replay batch 0 by hand through the writer's own commit path
    cls = pywriter.make_manifest_writer_source()
    w = cls({"path": snk, "txnappid": "t"}).streamWriter(
        M.read_manifest(spark, snk).schema, False)
    w.commit([], 0)   # same (app=t, batchId=0) as the real drain
    assert M._versions(hpath, fs, snk)[-1] == v_before
    assert _snap(spark, snk) == [(1, 10)]


def test_stream_txn_ledger_survives_jvm_maintenance(spark, tmp_path):
    """Compaction (a JVM-side commit_manifest) between micro-batches
    must carry the ledger forward — dropping it would reopen every
    committed batch for replay."""
    src, snk = str(tmp_path / "src"), str(tmp_path / "snk")
    M.publish_manifested(_kv(spark, [(1, 10), (2, 20)]), src, "r1")
    _stream_src_to_sink(spark, src, snk, str(tmp_path / "ck"))
    M.compact_manifested(spark, snk)
    _, doc = M._manifest_doc(spark, snk)
    assert doc.get("stream_txn"), "ledger lost across maintenance"


def test_stream_writer_fresh_app_is_not_a_duplicate(spark, tmp_path):
    """txnAppId scopes the ledger to one checkpoint lineage: a fresh
    checkpoint+app re-streaming the same source APPENDS (batch 0 of a
    different lineage is new data, not a replay)."""
    src, snk = str(tmp_path / "src"), str(tmp_path / "snk")
    M.publish_manifested(_kv(spark, [(1, 10)]), src, "r1")
    _stream_src_to_sink(spark, src, snk, str(tmp_path / "ck1"), app="a")
    _stream_src_to_sink(spark, src, snk, str(tmp_path / "ck2"), app="b")
    assert _snap(spark, snk) == [(1, 10), (1, 10)]
