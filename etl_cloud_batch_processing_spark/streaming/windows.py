"""Structured Streaming over the events table (SURVEY.md §2.11).

The reference treats "streaming" as a daily batch of files (§2.9); this
module is the upgrade path SURVEY.md §7 sketches: the same event schema
consumed incrementally with ``readStream``, watermarked event-time
windows, and an idempotent file sink.  ``Trigger.AvailableNow`` processes
whatever has arrived and stops — the exact semantics of one scheduled
batch run, but incremental: a 100 TB backlog is consumed in rate-limited
micro-batches with checkpointed exactly-once progress instead of one
giant job.

Batch/streaming parity: the aggregation bodies are shared column
expressions, so the streaming result equals the batch query restricted
to closed windows (watermark semantics) — tested in
tests/test_streaming.py and oracle-checked via the registry twin
(plans/streams.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_cloud_batch_processing_spark.sources.readers import read_parquet


def events_schema(spark: SparkSession, sf_dir: str):
    """Streaming sources require an explicit schema (no inference pass);
    take it from the batch parquet footer once at plan time."""
    return read_parquet(spark, f"{sf_dir}/events.parquet").schema


def events_stream(spark: SparkSession, sf_dir: str,
                  max_files_per_trigger: int = 10) -> DataFrame:
    """Incremental scan of the events table.  ``maxFilesPerTrigger``
    bounds micro-batch size — the backpressure knob for backlog drains."""
    # FileStreamSource wants a directory to watch.  The fixture table
    # is a single FILE, so watch its parent with a glob filter; a
    # Spark-written table (the soak harness, any real deployment) is a
    # DIRECTORY of part files — watch it directly (the glob filter
    # matches leaf file NAMES, so "events.parquet" would match zero
    # part-*.parquet files and silently stream nothing).
    import os

    reader = (spark.readStream
              .schema(events_schema(spark, sf_dir))
              .option("maxFilesPerTrigger", str(max_files_per_trigger)))
    table_path = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(table_path):
        df = reader.parquet(table_path)
    else:
        df = (reader.option("pathGlobFilter", "events.parquet")
              .parquet(sf_dir))
    # Fixture ts variants seen across driver generations: TIMESTAMP(NANOS)
    # read as int64 nanos (legacy.parquet.nanosAsLong), or naive
    # timestamp[us] read as TIMESTAMP_NTZ.  Watermarks require TIMESTAMP
    # (with tz); with the session tz pinned to UTC the NTZ→TZ cast is
    # value-preserving, so batch twins (which keep NTZ) see identical
    # window boundaries.
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def tumbling_counts(events: DataFrame, window: str = "1 day",
                    watermark: str = "0 seconds") -> DataFrame:
    """Per-(day, event_type) counts/sums over event time.  Works on both
    batch and streaming frames — the shared body that guarantees parity.

    Streaming: the watermark closes a window once event time passes its
    end, emitting exactly one final row per window (append mode) — late
    rows beyond the watermark are dropped, the documented trade."""
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (events
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 6).alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n_events", "sum_value"))


def session_windows(events: DataFrame, gap: str = "30 minutes",
                    watermark: str = "0 seconds") -> DataFrame:
    """Per-user session windows: events within ``gap`` of each other
    merge into one session (built-in ``session_window`` — no custom
    stateful operator needed, SURVEY.md §4.2)."""
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (events
            .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id",
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events"))


def run_available_now(result: DataFrame, out_dir: str,
                      checkpoint_dir: str) -> None:
    """Drain everything currently available through the streaming plan
    into a parquet sink, then stop.  Append mode + checkpoint = each
    window written exactly once; re-running with the same checkpoint is
    a no-op (idempotent restart), with a fresh checkpoint a rebuild."""
    q = (result.writeStream
         .format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
