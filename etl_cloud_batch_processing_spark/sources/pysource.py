"""Custom Python DataSource (Spark 4 API): a deterministic synthetic
events generator.

Rounds out the §2.1 source surface with the newest extension point —
``pyspark.sql.datasource`` — the supported way to plug a non-file,
non-JDBC system (an internal API, a queue, a bespoke format) into the
DataFrame reader as a first-class, *partitioned* source.  Each input
partition generates its slice independently on an executor, so a
100 TB synthetic load (or a partitioned pull from an external service)
parallelizes like any file scan; nothing flows through the driver.

Determinism: row content is a pure function of (row index), so any two
reads — and any retried partition — produce identical data.  That is
the property that makes a source safe under Spark's task-retry
semantics.
"""

from __future__ import annotations

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition,
                                    SimpleDataSourceStreamReader)
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType)

_TYPES = ("click", "view", "purchase", "signup", "error")


class _Slice(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start, self.end = start, end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.rows = int(options.get("rows", 1000))
        self.parts = int(options.get("numPartitions", 8))

    def partitions(self):
        step = -(-self.rows // self.parts)
        return [_Slice(i, min(i + step, self.rows))
                for i in range(0, self.rows, step)]

    def read(self, partition: _Slice):
        # pure function of i: stable under retries and re-reads
        return _gen_rows(partition.start, partition.end)


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


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same source (Spark 4
    ``SimpleDataSourceStreamReader``): offsets are plain row indices,
    each micro-batch emits the next ``batchRows`` rows.  Because row
    content is the same pure function of the row index as the batch
    reader, replaying any offset range after a failure regenerates
    identical data — exactly-once for free, and batch/stream parity by
    construction (the property tests/test_operators.py checks).

    The "simple" variant reads on the driver and is bounded by design —
    the documented bridge for low-volume control streams; a partitioned
    ``DataSourceStreamReader`` (executor-side, like the batch reader's
    slices) is the 100 TB form and shares this offset scheme."""

    def __init__(self, options) -> None:
        self.rows = int(options.get("rows", 1000))
        self.batch_rows = int(options.get("batchRows", 100))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        lo = int(start["index"])
        hi = min(lo + self.batch_rows, self.rows)
        # list-backed iterator: Spark's prefetch cache copy.copy()s it,
        # which a generator cannot survive
        return iter(list(_gen_rows(lo, hi))), {"index": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(_gen_rows(int(start["index"]), int(end["index"]))))


def _gen_rows(lo: int, hi: int):
    for i in range(lo, hi):
        yield (i, i % 97, _TYPES[i % len(_TYPES)], float(i % 1000) / 10)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsSource)
