"""Custom Python DataSource (Spark 4 API): a deterministic synthetic
events generator, batch + streaming.

Rounds out the §2.1 source surface with the newest extension point —
``pyspark.sql.datasource`` — the supported way to plug a non-file,
non-JDBC system (an internal API, a queue, a bespoke format) into the
DataFrame reader as a first-class, *partitioned* source.  Each batch
input partition generates its slice independently on an executor, so a
100 TB synthetic load (or a partitioned pull from an external service)
parallelizes like any file scan; nothing flows through the driver.
The streaming face (``SimpleDataSourceStreamReader``) exposes the same
rows as index-offset micro-batches.

Determinism: row content is a pure function of (row index), so any two
reads — and any retried partition or replayed offset range — produce
identical data.  That is the property that makes a source safe under
Spark's task-retry semantics and gives the streaming side exactly-once
replay for free.

Every class (and the row generator) is defined inside the
:func:`make_synthetic_source` factory ON PURPOSE: Spark pickles the
registered DataSource class and runs it in dedicated Python runners
(the streaming source planner among them) that do NOT see
``addPyFile``-shipped packages.  A module-level class serializes
by reference and dies there with ModuleNotFoundError; a ``<locals>``
class — with its helpers captured in the closure — serializes fully by
value, so only pyspark itself must be importable on the runner.
"""

from __future__ import annotations

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition,
                                    SimpleDataSourceStreamReader)
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType)


def make_synthetic_source() -> type:
    """Build the self-contained (serialize-by-value) DataSource class."""

    types = ("click", "view", "purchase", "signup", "error")

    def gen_rows(lo: int, hi: int):
        # pure function of i: stable under retries, re-reads, replays
        return [(i, i % 97, types[i % len(types)], float(i % 1000) / 10)
                for i in range(lo, hi)]

    class Slice(InputPartition):
        def __init__(self, start: int, end: int) -> None:
            self.start, self.end = start, end

    class SyntheticEventsReader(DataSourceReader):
        def __init__(self, options) -> None:
            self.rows = int(options.get("rows", 1000))
            self.parts = int(options.get("numPartitions", 8))

        def partitions(self):
            step = -(-self.rows // self.parts)
            return [Slice(i, min(i + step, self.rows))
                    for i in range(0, self.rows, step)]

        def read(self, partition: Slice):
            return iter(gen_rows(partition.start, partition.end))

    class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
        """Streaming face: offsets are plain row indices; each
        micro-batch emits the next ``batchRows`` rows.  The "simple"
        variant reads on the driver and is bounded by design — the
        documented bridge for low-volume control streams; a
        partitioned ``DataSourceStreamReader`` (executor-side, like
        the batch reader's slices) is the 100 TB form and shares this
        offset scheme."""

        def __init__(self, options) -> None:
            self.rows = int(options.get("rows", 1000))
            self.batch_rows = int(options.get("batchRows", 100))

        def initialOffset(self) -> dict:
            return {"index": 0}

        def read(self, start: dict):
            lo = int(start["index"])
            hi = min(lo + self.batch_rows, self.rows)
            # list-backed iterator: Spark's prefetch cache copy.copy()s
            # it, which a generator cannot survive
            return iter(gen_rows(lo, hi)), {"index": hi}

        def readBetweenOffsets(self, start: dict, end: dict):
            return iter(gen_rows(int(start["index"]), int(end["index"])))

    class SyntheticEventsSource(DataSource):
        """``spark.read.format("synthetic_events").option("rows", n)``."""

        @classmethod
        def name(cls) -> str:
            return "synthetic_events"

        def schema(self) -> StructType:
            return StructType([
                StructField("event_id", LongType()),
                StructField("user_id", LongType()),
                StructField("event_type", StringType()),
                StructField("value", DoubleType()),
            ])

        def reader(self, schema: StructType) -> DataSourceReader:
            return SyntheticEventsReader(self.options)

        def simpleStreamReader(self, schema: StructType):
            return SyntheticEventsStreamReader(self.options)

    return SyntheticEventsSource


def register(spark) -> None:
    spark.dataSource.register(make_synthetic_source())
