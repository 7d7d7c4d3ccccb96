"""Streaming/batch parity: the AvailableNow streaming pipeline must
produce exactly the batch aggregation restricted to closed windows, and
re-running against the same checkpoint must be a no-op (exactly-once)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_cloud_batch_processing_spark.plans.registry import table
from etl_cloud_batch_processing_spark.streaming import windows as W


def _batch_closed_windows(spark, sf_dir):
    events = table(spark, sf_dir, "events")
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    return (W.tumbling_counts(events)
            .filter(F.col("window_start") + F.expr("INTERVAL 1 DAY")
                    <= F.lit(max_ts)))


def test_streaming_equals_batch_closed_windows(spark, sf_dir, tmp_path):
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    stream_result = W.tumbling_counts(W.events_stream(spark, sf_dir))
    assert stream_result.isStreaming
    W.run_available_now(stream_result, out, ckpt)

    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple, _batch_closed_windows(spark, sf_dir).collect()))
    assert got == want
    assert len(got) > 0


def test_streaming_restart_is_noop(spark, sf_dir, tmp_path):
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def drain():
        W.run_available_now(
            W.tumbling_counts(W.events_stream(spark, sf_dir)), out, ckpt)

    drain()
    n1 = spark.read.parquet(out).count()
    drain()                      # same checkpoint: nothing new to process
    assert spark.read.parquet(out).count() == n1


def test_session_windows_merge_within_gap(spark):
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 1.0),
        (1, t0 + dt.timedelta(minutes=10), 1.0),   # same session
        (1, t0 + dt.timedelta(minutes=50), 1.0),   # 40min gap → new session
        (2, t0, 1.0),
    ]
    events = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    got = {(r.user_id, r.session_start, r.n_events)
           for r in W.session_windows(events).collect()}
    assert (1, t0, 2) in got
    assert (1, t0 + dt.timedelta(minutes=50), 1) in got
    assert (2, t0, 1) in got
    assert len(got) == 3
