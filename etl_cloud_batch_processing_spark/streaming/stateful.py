"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.11 upgrade path; the "custom stateful operators" slot of
the Structured Streaming surface).

The operator keeps one (count, sum) accumulator per user across
micro-batches and emits the updated running totals whenever a batch
touches the key — the streaming form of ``groupBy(user).agg(count,
sum)``, but with explicit user-managed state, which is the template for
operators aggregation can't express (e.g. per-key model state, custom
eviction, cross-batch sessionization with side effects).

Correctness contract (tested + oracle-checked in plans/streams.py):
after a full AvailableNow drain, the LAST emission per key equals the
batch aggregate exactly.  State stays bounded: one 16-byte accumulator
per user, checkpointed by the state store; at 100 TB the state shuffles
once on user_id and each micro-batch touches only the keys it contains.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    from collections.abc import Iterator

    import pandas as pd

RUNNING_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])

STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("total", DoubleType()),
])


def running_totals_fn(key: tuple[Any, ...],
                      pdfs: "Iterator[pd.DataFrame]",
                      state: GroupState):
    """One call per (key, micro-batch): fold the batch into the
    accumulator, emit the updated running total."""
    import pandas as pd

    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "total_value": [total]})


def user_running_totals_stream(events: DataFrame) -> DataFrame:
    """events stream → per-user running (count, sum) via explicit
    state.  Output mode "update": emit only keys touched this batch."""
    return (events.select("user_id", "value")
            .groupBy("user_id")
            .applyInPandasWithState(
                running_totals_fn,
                outputStructType=RUNNING_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def drain_running_totals(result: DataFrame, out_dir: str,
                         checkpoint_dir: str) -> None:
    """AvailableNow drain of an update-mode stateful stream into
    parquet.  File sinks only speak append, so emissions go through
    foreachBatch: each micro-batch's updated rows are appended, giving
    an emission LOG (one row per key per touching batch); the reader
    reconstructs final state as the max-count row per key.  This is the
    standard CDC-style pattern — the log is also exactly what a
    downstream incremental consumer wants."""
    q = (result.writeStream
         .foreachBatch(lambda batch, _id:
                       batch.write.mode("append").parquet(out_dir))
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("update")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
