"""Python DataSource WRITER (Spark 4 API): ``df.write.format(
"manifest_table")`` lands a manifest-committed table through the V2
write protocol itself.

The DataSourceWriter contract — every task writes its partition and
returns a ``WriterCommitMessage``; the driver calls ``commit(messages)``
exactly once with the SUCCESSFUL attempts only (failed and speculative
duplicates are excluded by Spark) — IS the manifest protocol this
engine's transactional layer runs on: stage invisible files, flip one
version.  Mapping them onto each other gives the classic lakehouse
write path with no side channel:

* each task streams its Arrow batches straight to ONE parquet file
  under ``.data/dsw-<uid>/`` (``DataSourceArrowWriter`` — zero
  row-at-a-time Python), a location no manifest references, so a
  crashed or speculatively-duplicated task leaves only vacuum-able
  garbage;
* ``commit`` publishes the next ``_manifest.v<N>.json`` through the
  same exclusive primitive the JVM-side layer uses — POSIX ``link(2)``
  (``os.link`` here), atomic and EEXIST-on-race — re-reading the
  current version per attempt, so racing committers resolve to
  exactly one winner per version (bounded retries);
* ``append`` adds the run's files; ``overwrite`` also retires every
  currently-live file (old versions stay readable until ``vacuum`` —
  the layer's snapshot-isolation discipline); the commit records the
  schema, merged add-by-name against the current version's with
  same-name type conflicts refused loudly;
* ``abort`` removes the staging dir — best-effort, because the layer
  never NEEDS abort for correctness: unreferenced files are invisible;
* the STREAMING face (``DataSourceStreamArrowWriter``) commits each
  micro-batch the same way, plus an idempotence ledger: the manifest's
  ``stream_txn`` map records ``(txnAppId, batchId) → version`` inside
  the SAME atomic flip that publishes the batch's files, so a
  replayed batch (at-least-once delivery after a pre-checkpoint
  crash) finds its key and skips — exactly-once table contents, the
  Delta idempotent-sink (txn action) design.  The JVM-side
  ``commit_manifest`` carries the ledger through every maintenance
  commit, so compaction between micro-batches cannot reopen a batch.

Everything lives inside the factory closure (serialize-by-value: the
write runners import no engine modules — the sources/pysource.py
lesson), and the commit path is pure Python over the local/NFS
filesystem the JVM layer shares; ``sources/manifest.py`` readers
resolve these commits like any other.  Cited for parity:
sources/manifest.py:commit_manifest (the JVM-side twin),
reference dags/transaction_data.py:49 (the BigQuery load job whose
service-side transactionality this self-managed path re-provides).
"""

from __future__ import annotations


def make_manifest_writer_source() -> type:
    """Build the self-contained (serialize-by-value) DataSource class."""

    import json
    import os
    import re
    import uuid

    from pyspark.sql.datasource import (DataSource, DataSourceArrowWriter,
                                        DataSourceStreamArrowWriter,
                                        WriterCommitMessage)
    from pyspark.sql.types import StructType

    mf_re = re.compile(r"^_manifest\.v(\d+)\.json$")

    def local_base(path: str) -> str:
        return re.sub(r"^file:(//)?", "", path).rstrip("/")

    def versions_of(base: str) -> list[int]:
        if not os.path.isdir(base):
            return []
        return sorted(int(m.group(1)) for f in os.listdir(base)
                      if (m := mf_re.match(f)))

    def mf_name(v: int) -> str:
        return f"_manifest.v{v:010d}.json"

    def merged_schema(cur: dict | None, add: dict) -> dict:
        # the JVM layer's evolution rule: current fields in order, new
        # appended by name, same-name type conflict refused
        if cur is None:
            return add
        have = {f["name"]: f for f in cur["fields"]}
        out = list(cur["fields"])
        for f in add["fields"]:
            g = have.get(f["name"])
            if g is None:
                out.append(f)
            elif g["type"] != f["type"]:
                raise ValueError(
                    f"schema evolution type conflict on column "
                    f"{f['name']!r}: table has {g['type']!r}, incoming "
                    f"write has {f['type']!r}")
        return {"type": "struct", "fields": out}

    class FileCommit(WriterCommitMessage):
        def __init__(self, rel_file: str, rows: int) -> None:
            self.rel_file = rel_file
            self.rows = rows

    def write_task(base: str, rel_dir: str, iterator) -> FileCommit:
        # executor side, shared by the batch and stream writers: one
        # parquet file per task, streamed batch-by-batch
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark import TaskContext

        tc = TaskContext.get()
        rel = (f"{rel_dir}/part-{tc.partitionId():05d}-"
               f"{uuid.uuid4().hex[:8]}.parquet")
        abs_path = f"{base}/{rel}"
        os.makedirs(os.path.dirname(abs_path), exist_ok=True)
        rows, writer = 0, None
        for batch in iterator:
            if writer is None:
                writer = pq.ParquetWriter(abs_path, batch.schema)
            writer.write_table(pa.Table.from_batches([batch]))
            rows += batch.num_rows
        if writer is None:   # empty partition: no file, no entry
            return FileCommit("", 0)
        writer.close()
        return FileCommit(rel, rows)

    def commit_files(base: str, adds: list[str], overwrite: bool,
                     schema_json: dict, txn_key: str | None) -> bool:
        # driver side, shared: ONE exclusive-link manifest flip.
        # txn_key is the streaming idempotence ledger entry
        # ((txnAppId, batchId)); a key already recorded means this
        # exact micro-batch committed before — skip, never double.
        for _attempt in range(4):
            versions = versions_of(base)
            cur = versions[-1] if versions else 0
            cur_doc = {}
            if versions:
                with open(f"{base}/{mf_name(cur)}") as fh:
                    cur_doc = json.load(fh)
            txn = dict(cur_doc.get("stream_txn", {}))
            if txn_key is not None and txn_key in txn:
                return False   # replayed batch: already committed
            entries = cur_doc.get("entries", [])
            keep = [] if overwrite else entries
            new_entries = keep + [{"file": f, "dt": None} for f in adds]
            names = [e["file"] for e in new_entries]
            if len(names) != len(set(names)):
                raise ValueError("manifest commit would list a file twice")
            import time as _time

            doc = {"version": cur + 1, "entries": new_entries,
                   "committed_at_ms": int(_time.time() * 1000),
                   "schema": merged_schema(
                       None if overwrite else cur_doc.get("schema"),
                       schema_json)}
            if txn_key is not None:
                txn[txn_key] = cur + 1
            if txn:
                doc["stream_txn"] = txn
            tmp = f"{base}/.{uuid.uuid4().hex}.tmp"
            with open(tmp, "w") as fh:
                json.dump(doc, fh, indent=1, sort_keys=True)
            try:
                # POSIX link(2): atomic, EEXIST on a lost race — the
                # same exclusive primitive as the JVM layer
                os.link(tmp, f"{base}/{mf_name(cur + 1)}")
                return True
            except FileExistsError:
                continue   # loser: re-read the winner's manifest
            finally:
                os.unlink(tmp)
        raise IOError(f"manifest commit at {base} lost the race 4 "
                      f"times; giving up")

    class ManifestTableWriter(DataSourceArrowWriter):
        def __init__(self, options, schema: StructType,
                     overwrite: bool) -> None:
            self.base = local_base(options.get("path"))
            self.overwrite = overwrite
            self.schema_json = schema.jsonValue()
            self.rel_dir = f".data/dsw-{uuid.uuid4().hex[:8]}"

        # -- executor side -------------------------------------------------
        def write(self, iterator):
            return write_task(self.base, self.rel_dir, iterator)

        # -- driver side ---------------------------------------------------
        def commit(self, messages):
            commit_files(self.base,
                         [m.rel_file for m in messages if m.rel_file],
                         self.overwrite, self.schema_json, None)

        def abort(self, messages):
            import shutil

            shutil.rmtree(f"{self.base}/{self.rel_dir}",
                          ignore_errors=True)

    class ManifestTableStreamWriter(DataSourceStreamArrowWriter):
        """The streaming face: every micro-batch is one manifest
        commit, made EXACTLY-ONCE by the ``stream_txn`` ledger the
        manifest carries — ``commit(messages, batchId)`` records
        ``(txnAppId, batchId) → version`` in the same atomic flip that
        publishes the batch's files, so Structured Streaming's
        at-least-once batch replay (failure before the checkpoint
        advances) finds its key already present and skips: delivery ×
        idempotence = exactly-once table contents, the Delta
        idempotent-sink (txn action) design.  ``txnAppId`` scopes the
        ledger to one checkpoint lineage — replaying batch 0 of a
        DIFFERENT checkpoint must not be mistaken for a duplicate."""

        def __init__(self, options, schema: StructType) -> None:
            self.base = local_base(options.get("path"))
            self.app = options.get("txnappid", "default")
            self.schema_json = schema.jsonValue()
            self.rel_dir = f".data/dsw-{uuid.uuid4().hex[:8]}"

        def write(self, iterator):
            return write_task(self.base, self.rel_dir, iterator)

        def commit(self, messages, batchId):
            commit_files(self.base,
                         [m.rel_file for m in messages if m.rel_file],
                         False, self.schema_json,
                         f"{self.app}:{batchId}")

        def abort(self, messages, batchId):
            import shutil

            shutil.rmtree(f"{self.base}/{self.rel_dir}",
                          ignore_errors=True)

    class ManifestTableSource(DataSource):
        """``df.write.format("manifest_table").option("path", root)
        .mode("append" | "overwrite").save()``."""

        @classmethod
        def name(cls) -> str:
            return "manifest_table"

        def writer(self, schema: StructType, overwrite: bool):
            return ManifestTableWriter(self.options, schema, overwrite)

        def streamWriter(self, schema: StructType, overwrite: bool):
            return ManifestTableStreamWriter(self.options, schema)

    return ManifestTableSource


def register(spark) -> None:
    spark.dataSource.register(make_manifest_writer_source())
