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

#: A publicly-distributed protobuf runtime this container happens to
#: carry (the google-cloud-sdk's appengine platform vendors protobuf
#: 6.32.0).  pip has no network here (DRIVER_NOTES #13), so when
#: ``google.protobuf`` isn't installed as a site package, this is the
#: only runtime available for transformWithStateInPandas's
#: driver↔worker state protocol.
VENDORED_PROTOBUF_DIR = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable in THIS process, falling
    back to the vendored runtime above.  pyspark's generated
    StateMessage gencode is protobuf 6.33; the vendored runtime is
    6.32 — one minor older — so the fallback also sets protobuf's OWN
    documented escape hatch for exactly this window
    (``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK``, runtime_version.py).
    Returns False when neither a site-package nor the vendored runtime
    exists (the operator then stays unregistered, CI-visibly)."""
    import importlib
    import os
    import sys

    # Probe a REAL runtime module, not the package: spark-core.jar sits
    # on worker sys.path (zipimport) and carries google/protobuf/*.proto
    # RESOURCES, which Python happily resolves as an EMPTY namespace
    # package — `import google.protobuf` succeeds while the runtime is
    # entirely absent ("unknown location" ImportErrors downstream).
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        pass
    if not os.path.isdir(os.path.join(VENDORED_PROTOBUF_DIR,
                                      "google", "protobuf")):
        return False
    os.environ["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = "true"
    if VENDORED_PROTOBUF_DIR not in sys.path:
        # append, not prepend: only the google.* namespace lives there
        # and nothing else may shadow site-packages
        sys.path.append(VENDORED_PROTOBUF_DIR)
    os.environ["PYTHONPATH"] = (
        VENDORED_PROTOBUF_DIR + os.pathsep
        + os.environ.get("PYTHONPATH", "")).rstrip(os.pathsep)
    # drop any cached empty-namespace google modules so the re-import
    # resolves the vendored regular package instead
    for mod in [m for m in sys.modules
                if m == "google" or m.startswith("google.")]:
        del sys.modules[mod]
    importlib.invalidate_caches()
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def push_protobuf_env_to_workers(spark) -> None:
    """Python workers import the protobuf runtime too (the state
    client runs worker-side): propagate the vendored path + version
    escape hatch through ``sc.environment``, which pyspark ships with
    every pickled command (core/rdd.py _prepare_for_python_RDD) — a
    distinct env set spawns a fresh worker daemon, so this works even
    after other UDFs already ran."""
    import os

    env = spark.sparkContext.environment
    env["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = "true"
    base = env.get("PYTHONPATH", os.environ.get("PYTHONPATH", ""))
    if VENDORED_PROTOBUF_DIR not in base.split(os.pathsep):
        env["PYTHONPATH"] = (VENDORED_PROTOBUF_DIR + os.pathsep
                             + base).rstrip(os.pathsep)


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
        # The state protocol (StateMessage_pb2) imports lazily INSIDE
        # every process this object lands in — driver, the pre-init
        # runner, executor workers.  The pre-init runner sees neither
        # addPyFile packages nor env vars set after the JVM launched,
        # so the vendored-protobuf bootstrap (streaming/stateful.py
        # ensure_protobuf, inlined here because a <locals> class may
        # reference nothing importable) rides the pickle itself:
        # unpickling runs it before pyspark can touch protobuf.
        @staticmethod
        def _bootstrap_protobuf() -> None:
            import importlib
            import os
            import sys

            try:
                # probe a REAL module: spark-core.jar on worker paths
                # makes bare `google.protobuf` resolve as an empty
                # namespace package (its .proto RESOURCES)
                from google.protobuf import descriptor  # noqa: F401

                return
            except ImportError:
                pass
            vendor = ("/usr/lib/google-cloud-sdk/platform/"
                      "google_appengine")
            if not os.path.isdir(os.path.join(vendor, "google",
                                              "protobuf")):
                return
            os.environ["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] \
                = "true"
            if vendor not in sys.path:
                sys.path.append(vendor)
            for mod in [m for m in sys.modules
                        if m == "google" or m.startswith("google.")]:
                del sys.modules[mod]
            importlib.invalidate_caches()

        def __getstate__(self):
            return dict(self.__dict__)

        def __setstate__(self, state):
            self._bootstrap_protobuf()
            self.__dict__.update(state)

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
