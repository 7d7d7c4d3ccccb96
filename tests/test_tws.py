"""transformWithStateInPandas (Spark 4 arbitrary-state API v2).

The operator needs the optional ``protobuf`` dependency for its
driver↔worker state protocol.  This container ships pyspark without
the site package, but stateful.ensure_protobuf resolves the vendored
runtime inside the public google-cloud-sdk (round-10 unblock: path
shim + protobuf's own documented version-check escape hatch + a
pickle-borne bootstrap for the pre-init runner that sees neither
addPyFile nor post-JVM env) — so the end-to-end convergence test now
RUNS here.  The plan-construction test runs regardless.
"""

from __future__ import annotations

import pytest

from etl_cloud_batch_processing_spark.streaming.stateful import (
    ensure_protobuf,
)

# round-10: resolves via the vendored google-cloud-sdk protobuf runtime
# when the site package is absent (see stateful.ensure_protobuf)
HAS_PROTOBUF = ensure_protobuf()


def test_tws_stream_plan_constructs(spark):
    """Plan construction (no execution): the v2 operator accepts the
    processor and produces the declared output schema."""
    from etl_cloud_batch_processing_spark.streaming import stateful as S
    from etl_cloud_batch_processing_spark.streaming import windows as W

    result = S.user_stats_tws_stream(
        W.events_stream(spark, "/root/testdata/sf0.001"))
    assert result.isStreaming
    assert [f.name for f in result.schema.fields] == [
        "user_id", "n_events", "total_value", "min_value", "max_value"]


@pytest.mark.skipif(not HAS_PROTOBUF, reason="protobuf not installed")
def test_tws_converges_to_batch_aggregate(spark, tmp_path):
    from pyspark.sql import functions as F

    from etl_cloud_batch_processing_spark.plans.streams import (
        _streaming_user_stats_tws,
    )

    sf = "/root/testdata/sf0.001"
    got = {r.user_id: r for r in
           _streaming_user_stats_tws(spark, sf).collect()}
    exact = {r.user_id: r for r in
             (spark.read.parquet(f"{sf}/events.parquet")
              .groupBy("user_id")
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.round(F.sum("value"), 6).alias("total_value"),
                   F.round(F.min("value"), 6).alias("min_value"),
                   F.round(F.max("value"), 6).alias("max_value"))
              .collect())}
    assert set(got) == set(exact)
    for uid, e in exact.items():
        g = got[uid]
        assert (g.n_events, g.total_value, g.min_value, g.max_value) == \
            (e.n_events, e.total_value, e.min_value, e.max_value)


def test_tws_liststate_plan_constructs(spark):
    from etl_cloud_batch_processing_spark.streaming import stateful as S
    from etl_cloud_batch_processing_spark.streaming import windows as W

    result = S.recent_events_tws_stream(
        W.events_stream(spark, "/root/testdata/sf0.001"))
    assert result.isStreaming
    assert [f.name for f in result.schema.fields] == [
        "user_id", "rnk", "event_id", "ts_micros", "cents", "n_seen"]


def test_tws_mapstate_plan_constructs(spark):
    from etl_cloud_batch_processing_spark.streaming import stateful as S
    from etl_cloud_batch_processing_spark.streaming import windows as W

    result = S.type_counts_tws_stream(
        W.events_stream(spark, "/root/testdata/sf0.001"))
    assert result.isStreaming
    assert [f.name for f in result.schema.fields] == [
        "user_id", "event_type", "n_events", "sum_cents", "n_total"]


@pytest.mark.skipif(not HAS_PROTOBUF, reason="protobuf not installed")
def test_tws_liststate_converges_to_batch_topk(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as Wnd

    from etl_cloud_batch_processing_spark.plans.streams import (
        _streaming_tws_recent_events,
    )

    sf = "/root/testdata/sf0.001"
    got = {(r.user_id, r.rnk): (r.event_id, r.ts_micros, r.cents)
           for r in _streaming_tws_recent_events(spark, sf).collect()}
    ev = spark.read.parquet(f"{sf}/events.parquet")
    if dict(ev.dtypes)["ts"] == "bigint":
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    w = Wnd.partitionBy("user_id").orderBy(F.desc("ts"),
                                           F.desc("event_id"))
    exact = {(r.user_id, r.rnk): (r.event_id, r.ts_micros, r.cents)
             for r in
             (ev.withColumn("rnk", F.row_number().over(w))
              .filter("rnk <= 5")
              .select("user_id", "rnk", "event_id",
                      F.unix_micros(F.col("ts").cast("timestamp"))
                      .alias("ts_micros"),
                      F.round(F.col("value") * 100).cast("bigint")
                      .alias("cents")).collect())}
    assert got == exact and got


@pytest.mark.skipif(not HAS_PROTOBUF, reason="protobuf not installed")
def test_tws_mapstate_converges_to_batch_groupby(spark):
    from pyspark.sql import functions as F

    from etl_cloud_batch_processing_spark.plans.streams import (
        _streaming_tws_type_counts,
    )

    sf = "/root/testdata/sf0.001"
    got = {(r.user_id, r.event_type): (r.n_events, r.sum_cents)
           for r in _streaming_tws_type_counts(spark, sf).collect()}
    ev = spark.read.parquet(f"{sf}/events.parquet")
    exact = {(r.user_id, r.event_type): (r.n, r.c) for r in
             (ev.groupBy("user_id", "event_type")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum(F.round(F.col("value") * 100).cast("bigint"))
                   .alias("c")).collect())}
    assert got == exact and got


@pytest.mark.skipif(not HAS_PROTOBUF, reason="protobuf not installed")
def test_tws_timers_close_sessions_deterministically(spark):
    """Event-time timers: sessions with a successor event close as
    'event'; each user's last session closes as 'timer' iff the final
    watermark (corpus max ms) crossed its gap — and open sessions are
    absent.  Replays the oracle's arithmetic in python."""
    from etl_cloud_batch_processing_spark.plans.streams import (
        _streaming_tws_session_timers,
    )
    from etl_cloud_batch_processing_spark.streaming.stateful import (
        SESSION_GAP_MS,
    )

    sf = "/root/testdata/sf0.001"
    rows = _streaming_tws_session_timers(spark, sf).collect()
    assert rows
    ev = spark.read.parquet(f"{sf}/events.parquet")
    from pyspark.sql import functions as F
    if dict(ev.dtypes)["ts"] == "bigint":
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    per_user: dict = {}
    for r in (ev.select("user_id",
                        F.expr("unix_micros(cast(ts as timestamp))"
                               " div 1000").alias("ms")).collect()):
        per_user.setdefault(r.user_id, []).append(r.ms)
    mx = max(m for ms in per_user.values() for m in ms)
    expected = []
    for uid, ms in per_user.items():
        ms.sort()
        sess = [[ms[0], ms[0], 1]]
        for t in ms[1:]:
            if t - sess[-1][1] <= SESSION_GAP_MS:
                sess[-1][1] = t
                sess[-1][2] += 1
            else:
                sess.append([t, t, 1])
        for i, (s, e, n) in enumerate(sess):
            if i < len(sess) - 1:
                expected.append((uid, s, e, n, "event"))
            elif e + SESSION_GAP_MS <= mx:
                expected.append((uid, s, e, n, "timer"))
    got = sorted((r.user_id, r.start_ms, r.end_ms, r.n_events,
                  r.closed_by) for r in rows)
    assert got == sorted(expected)
    assert any(c == "timer" for *_, c in got)   # timers genuinely fired


@pytest.mark.skipif(not HAS_PROTOBUF, reason="protobuf not installed")
def test_tws_warm_start_seeds_state_from_batch(spark):
    """handleInitialState must genuinely seed: every touched user's
    final total equals the FULL history (batch GROUP BY over all
    events), strictly exceeding what the post-cutoff delta alone could
    produce for users with pre-cutoff activity."""
    from pyspark.sql import functions as F

    from etl_cloud_batch_processing_spark.plans.streams import (
        _TWS_WARM_CUTOFF,
        _streaming_tws_warm_start,
    )

    sf = "/root/testdata/sf0.001"
    got = {r.user_id: (r.n_events, r.sum_cents)
           for r in _streaming_tws_warm_start(spark, sf).collect()}
    ev = spark.read.parquet(f"{sf}/events.parquet")
    if dict(ev.dtypes)["ts"] == "bigint":
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    cut = F.lit(_TWS_WARM_CUTOFF).cast(dict(ev.dtypes)["ts"])
    full = {r.user_id: (r.n, r.c) for r in
            (ev.groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.round(F.col("value") * 100).cast("bigint"))
                  .alias("c")).collect())}
    touched = {r.user_id for r in
               ev.filter(F.col("ts") >= cut)
               .select("user_id").distinct().collect()}
    assert got == {u: full[u] for u in touched} and got
    # the seed contributed: some touched user has pre-cutoff history,
    # so their reported n exceeds their delta-only count
    delta_n = {r.user_id: r.n for r in
               (ev.filter(F.col("ts") >= cut).groupBy("user_id")
                .agg(F.count(F.lit(1)).alias("n")).collect())}
    assert any(got[u][0] > delta_n.get(u, 0) for u in got)


def test_protobuf_shim_ships_only_protobuf(tmp_path):
    """The worker-facing sys.path entry must contain ONLY the
    google/protobuf subtree: prepending the whole google_appengine
    platform dir would let its other packages (google.auth,
    google.oauth2, appengine, top-level api_server.py, …) shadow real
    site-packages in workers (round-10 advice)."""
    import os

    from etl_cloud_batch_processing_spark.streaming.stateful import (
        VENDORED_PROTOBUF_DIR,
        build_protobuf_shim,
    )

    if not os.path.isdir(os.path.join(VENDORED_PROTOBUF_DIR,
                                      "google", "protobuf")):
        pytest.skip("no vendored protobuf on this box")
    shim = build_protobuf_shim(shim=str(tmp_path / "shim"))
    assert shim is not None
    assert sorted(os.listdir(shim)) == ["google"]
    assert sorted(os.listdir(os.path.join(shim, "google"))) == [
        "__init__.py", "protobuf"]
    # the google package must EXTEND, not shadow, any site namespace
    init = open(os.path.join(shim, "google", "__init__.py")).read()
    assert "extend_path" in init
    # idempotent: a second build returns the same complete shim
    assert build_protobuf_shim(shim=shim) == shim


@pytest.mark.skipif(not HAS_PROTOBUF, reason="protobuf not installed")
def test_tws_value_state_ttl_expires_and_accumulates(spark, tmp_path):
    """State TTL (the last v2 state feature): two drains of the same
    checkpoint around a sleep — with a 1 ms TTL the second batch sees
    expired state and the counter RESTARTS; with a 1 h TTL it
    ACCUMULATES.  Same data, same code path, opposite outcomes — the
    TTL is the only difference."""
    import time

    from pyspark.sql import functions as F

    from etl_cloud_batch_processing_spark.streaming.stateful import (
        ttl_counter_tws_stream,
    )

    def run(ttl_ms, tag):
        src = tmp_path / f"src_{tag}"
        out = tmp_path / f"out_{tag}"
        ckpt = str(tmp_path / f"ckpt_{tag}")
        (spark.range(3).select((F.col("id") % 3).alias("user_id"))
         .coalesce(1).write.mode("append").parquet(str(src)))
        stream = (spark.readStream.schema("user_id bigint")
                  .parquet(str(src)))

        def out_rows():
            try:
                return spark.read.parquet(str(out)).count()
            except Exception:      # sink dir not created yet
                return 0

        def drain(rows_expected):
            res = ttl_counter_tws_stream(stream, ttl_ms)
            # same provider pin/restore as the registered queries
            provider_key = ("spark.sql.streaming.stateStore."
                            "providerClass")
            prev = spark.conf.get(provider_key, None)
            spark.conf.set(provider_key,
                           "org.apache.spark.sql.execution.streaming."
                           "state.RocksDBStateStoreProvider")
            try:
                q = (res.writeStream
                     .foreachBatch(lambda b, _:
                                   b.write.mode("append")
                                   .parquet(str(out)))
                     .option("checkpointLocation", ckpt)
                     .outputMode("update")
                     .trigger(availableNow=True).start())
                # ProcessingTime time-mode keeps an availableNow query
                # ACTIVE after the data drains (it schedules TTL
                # bookkeeping batches) — poll the SINK for the data
                # batch's committed emissions, then stop; a stop that
                # interrupts a later bookkeeping batch is recovered on
                # the next drain's restart, so swallow its error
                deadline = time.time() + 120
                while (q.isActive and time.time() < deadline
                       and out_rows() < rows_expected):
                    time.sleep(0.5)
                try:
                    q.stop()
                    q.awaitTermination()
                except Exception:
                    pass
            finally:
                if prev is None:
                    spark.conf.unset(provider_key)
                else:
                    spark.conf.set(provider_key, prev)
            assert out_rows() >= rows_expected

        drain(3)                                  # batch 1: 3 users x 1
        time.sleep(2.0)                           # >> 1 ms, << 1 h
        (spark.range(6).select((F.col("id") % 3).alias("user_id"))
         .coalesce(1).write.mode("append").parquet(str(src)))
        drain(6)                                  # batch 2: 3 users x 2
        log = spark.read.parquet(str(out))
        # final emission per user = its max n_events in the log
        return {r.user_id: r.mx for r in
                (log.groupBy("user_id")
                 .agg(F.max("n_events").alias("mx")).collect())}

    expired = run(1, "short")           # 1 ms TTL: batch-2 restarts
    assert expired == {0: 2, 1: 2, 2: 2}
    kept = run(3_600_000, "long")       # 1 h TTL: accumulates
    assert kept == {0: 3, 1: 3, 2: 3}
