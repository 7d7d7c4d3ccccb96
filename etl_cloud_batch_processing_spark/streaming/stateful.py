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
from pyspark.sql.streaming.stateful_processor import StatefulProcessor
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


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 arbitrary-state API v2): the
# successor to applyInPandasWithState — typed state variables
# (value/list/map), timers, TTL, and an initial-state hook.  Kept
# alongside the v1 operator so both custom-stateful surfaces are
# exercised end-to-end.
# ---------------------------------------------------------------------------

STATS_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
    StructField("min_value", DoubleType()),
    StructField("max_value", DoubleType()),
])


def make_user_stats_processor() -> StatefulProcessor:
    """Per-user (count, sum, min, max) accumulator as a typed
    ValueState.

    Every fold is commutative/associative over batches, so the LAST
    emission per key after a full drain equals the batch GROUP BY
    exactly, independent of arrival order — that convergence is the
    oracle contract (plans/streams.py streaming_user_stats_tws).
    State is one fixed-width tuple per user: the state store holds
    O(live keys), the 100 TB bound.

    The class is defined inside this factory ON PURPOSE: the v2
    operator's schema-validation phase spawns a pre-init Python runner
    that does NOT see ``addPyFile``-shipped packages, so a module-level
    class (cloudpickle: serialize-by-reference) dies with
    ModuleNotFoundError there.  A ``<locals>`` class serializes fully
    by value — only the pyspark base needs importing on the worker."""

    class UserStatsProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._state = handle.getValueState(
                "stats", "n BIGINT, total DOUBLE, mn DOUBLE, mx DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, total, mn, mx = ((0, 0.0, None, None)
                                if not self._state.exists()
                                else tuple(self._state.get()))
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                bmn = float(pdf["value"].min())
                bmx = float(pdf["value"].max())
                mn = bmn if mn is None else min(mn, bmn)
                mx = bmx if mx is None else max(mx, bmx)
            self._state.update((n, total, mn, mx))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                                "total_value": [total], "min_value": [mn],
                                "max_value": [mx]})

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            return iter(())

        def close(self) -> None:
            pass

    return UserStatsProcessor()


def user_stats_tws_stream(events: DataFrame) -> DataFrame:
    """events stream → per-user running stats via the v2 stateful
    processor.  Update mode + timeMode None: emit touched keys per
    batch, no timers."""
    return (events.select("user_id", "value")
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=make_user_stats_processor(),
                outputStructType=STATS_SCHEMA,
                outputMode="Update",
                timeMode="None"))


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
