"""Format round-trip pins: the text formats must preserve microsecond
timestamps (the timestampNTZFormat trap), and the registered query must
agree with its oracle and with parquet truth at fixture scale.
"""

from __future__ import annotations

from etl_cloud_batch_processing_spark import plans
from etl_cloud_batch_processing_spark.plans.formats import _roundtrip
from etl_cloud_batch_processing_spark.plans.registry import table


def test_roundtrip_query_matches_oracle(spark, duck, sf_dir):
    spec = plans.REGISTRY["format_roundtrip_fidelity"]
    got = [tuple(r) for r in spec.builder(spark, sf_dir).collect()]
    want = [tuple(r) for r in duck.execute(spec.oracle).fetchall()]
    assert got == want
    assert len(got) == 3
    # all three formats must be indistinguishable from parquet truth
    assert len({t[1:] for t in got}) == 1


def test_text_formats_keep_microseconds(spark, sf_dir, tmp_path):
    """The live trap this query caught: Spark's default text timestamp
    pattern renders milliseconds and silently drops the fixtures'
    microsecond components; with timestampNTZFormat the round-trip is
    exact per row, not just in aggregate."""
    base = (table(spark, sf_dir, "events")
            .select("event_id", "ts", "user_id", "event_type", "value")
            .limit(50))
    truth = {r["event_id"]: r["ts"] for r in base.collect()}
    assert any(t.microsecond % 1000 for t in truth.values()), \
        "fixture lost sub-millisecond precision; trap untestable"
    for fmt in ["csv", "json"]:
        back = _roundtrip(spark, base, fmt, str(tmp_path))
        got = {r["event_id"]: r["ts"] for r in back.collect()}
        assert got == truth, fmt
