"""The manifest table as a STREAMING SOURCE — ``readStream`` FROM the
engine's own transactional layer.

Round 11 closed streaming INTO the manifest table (exactly-once
``foreachBatch`` ingest, plans/streams.py); this module closes the other
direction: a Spark 4 Python DataSource whose stream reader treats
manifest VERSIONS as offsets, so every committed version becomes exactly
one micro-batch of the files it ADDED.  That is Delta's table-as-source
design (each commit's add-actions are the batch; the version number is
the offset), and it is what makes the lakehouse loop composable: one
job's atomic publish is the next job's micro-batch, with replay and
exactly-once coming from the offset log — no queue in between.

Change semantics follow the public Delta streaming-source contract:

* pure-append commits (publish runs, streaming ingest) stream their
  added files;
* delete-only commits (CoW delete survivors excepted — see next — or a
  merge-on-read DV attach) REFUSE by default: a consumer that silently
  skips deletes would diverge from the table; ``ignoreDeletes=true``
  opts into skipping them;
* rewrite commits (CoW delete/update/merge: adds + removes in one
  version) refuse unless ``ignoreChanges=true``, which re-emits the
  rewritten files — the consumer owns dedup, exactly Delta's
  ``ignoreChanges`` caveat.

Scale shape: ``partitions()`` hands ONE InputPartition per added file,
so a batch scans in parallel on executors (pyarrow reads the parquet
directly; nothing flows through the driver), and a version that added
N files costs exactly N file reads — the manifest diff itself is
KB-sized JSON.  The classes live inside a factory closure on purpose:
Spark's dedicated Python runners pickle the registered DataSource by
VALUE (module-level classes die with ModuleNotFoundError there — the
sources/pysource.py lesson), so only pyspark + stdlib + pyarrow may be
assumed importable.

Reference scope: the reference's pipelines are daily batch loads
(dags/daily_search_history.py:37-91); this is the continuous upgrade a
team migrating them to Spark asks for first — "the daily table, but as
a stream I can subscribe to".
"""

from __future__ import annotations


def make_manifest_stream_source() -> type:
    """Build the self-contained (serialize-by-value) DataSource class."""

    import json
    import os
    import re

    from pyspark.sql.datasource import (DataSource, DataSourceStreamReader,
                                        InputPartition)
    from pyspark.sql.types import StructType

    mf_re = re.compile(r"^_manifest\.v(\d+)\.json$")

    def local_base(path: str) -> str:
        # the python runners see no JVM/Hadoop FS; resolve file: URIs
        # to plain paths (local/NFS — the deployment this repo tests;
        # an object-store table would swap these three helpers for its
        # own listing/reading client)
        return re.sub(r"^file:(//)?", "", path).rstrip("/")

    def versions_of(base: str) -> list[int]:
        if not os.path.isdir(base):
            return []
        return sorted(int(m.group(1)) for f in os.listdir(base)
                      if (m := mf_re.match(f)))

    def doc_of(base: str, v: int) -> dict:
        with open(f"{base}/_manifest.v{v:010d}.json") as fh:
            return json.load(fh)

    def entries_of(base: str, v: int) -> dict[str, tuple]:
        # file -> dv tuple (dv identity matters: a DV attach is a
        # same-file change, i.e. a delete in streaming terms)
        if v <= 0:
            return {}
        return {e["file"]: tuple(e.get("dv") or ())
                for e in doc_of(base, v)["entries"]}

    class FileSlice(InputPartition):
        def __init__(self, abs_path: str | None) -> None:
            self.abs_path = abs_path   # None = empty sentinel batch

    class ManifestStreamReader(DataSourceStreamReader):
        def __init__(self, schema: StructType, options) -> None:
            self._schema = schema
            self.base = local_base(options.get("path"))
            self.start_v = int(options.get("startingversion", 1))
            self.ignore_deletes = (
                str(options.get("ignoredeletes", "false")).lower()
                == "true")
            self.ignore_changes = (
                str(options.get("ignorechanges", "false")).lower()
                == "true")

        def initialOffset(self) -> dict:
            return {"version": self.start_v - 1}

        def latestOffset(self) -> dict:
            vs = versions_of(self.base)
            return {"version": vs[-1] if vs else self.start_v - 1}

        def partitions(self, start: dict, end: dict):
            out = []
            for v in range(int(start["version"]) + 1,
                           int(end["version"]) + 1):
                prev, cur = entries_of(self.base, v - 1), \
                    entries_of(self.base, v)
                added = [f for f in cur if f not in prev]
                removed = [f for f in prev if f not in cur]
                dv_changed = [f for f in cur
                              if f in prev and cur[f] != prev[f]]
                if removed or dv_changed:
                    if added and not self.ignore_changes:
                        raise ValueError(
                            f"manifest stream at {self.base}: version "
                            f"{v} REWRITES data (adds {len(added)} and "
                            f"retires {len(removed)} files) — set "
                            f"ignoreChanges=true to re-emit rewritten "
                            f"files (consumer owns dedup)")
                    if not added and not (self.ignore_deletes
                                          or self.ignore_changes):
                        raise ValueError(
                            f"manifest stream at {self.base}: version "
                            f"{v} deletes data ({len(removed)} files "
                            f"retired, {len(dv_changed)} DV'd) — set "
                            f"ignoreDeletes=true to skip delete-only "
                            f"commits")
                out.extend(FileSlice(f"{self.base}/{f}") for f in added)
            return out or [FileSlice(None)]

        def read(self, partition: FileSlice):
            if partition.abs_path is None:
                return iter(())
            import pyarrow.parquet as pq

            names = [f.name for f in self._schema.fields]
            tbl = pq.read_table(partition.abs_path, columns=names)
            try:
                from pyspark.sql.pandas.types import to_arrow_schema

                return iter(tbl.cast(to_arrow_schema(self._schema))
                            .to_batches())
            except Exception:
                # arrow-cast unavailable → row tuples (slow-safe path)
                return iter([tuple(r[n] for n in names)
                             for r in tbl.to_pylist()])

        def commit(self, end: dict) -> None:
            pass   # offsets live in the query's checkpoint, not here

    class ManifestStreamSource(DataSource):
        """``spark.readStream.format("manifest_changes")
        .option("path", table_root)``."""

        @classmethod
        def name(cls) -> str:
            return "manifest_changes"

        def schema(self) -> StructType:
            base = local_base(self.options.get("path"))
            vs = versions_of(base)
            if not vs:
                raise FileNotFoundError(f"no _manifest.v* under {base}")
            rec = doc_of(base, vs[-1]).get("schema")
            if rec is None:
                raise ValueError(
                    f"manifest at {base} records no schema (pre-"
                    f"schema-recording table); re-publish once to "
                    f"record it before streaming")
            return StructType.fromJson(rec)

        def streamReader(self, schema: StructType):
            return ManifestStreamReader(schema, self.options)

    return ManifestStreamSource


def register(spark) -> None:
    spark.dataSource.register(make_manifest_stream_source())
