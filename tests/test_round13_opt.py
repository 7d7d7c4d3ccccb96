"""Pins for the round-13 optimization changes.

Covers: the scheme-agnostic stream-input sizing (Hadoop FS fallback +
zero-byte warning), the hardened offset-targeted drain (single-source
refusal, zero-row-below-target failure), the map-side PQ assignment
(element-identical to the former groupBy argmin), and the fused
star-CC round (set-identical to the textbook two-star composition).
"""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from etl_cloud_batch_processing_spark.streaming.windows import (
    _tree_bytes,
    drain_available_now_until,
    stream_state_partitions,
)


# ---------------------------------------------------------------------------
# _tree_bytes: scheme handling
# ---------------------------------------------------------------------------

def test_tree_bytes_strips_file_scheme(spark, tmp_path):
    d = tmp_path / "d"
    d.mkdir()
    (d / "a.bin").write_bytes(b"x" * 2048)
    (d / "b.bin").write_bytes(b"x" * 1024)
    assert _tree_bytes(str(d)) == 3072
    assert _tree_bytes("file:" + str(d)) == 3072
    assert _tree_bytes("file:" + str(d), spark) == 3072


def test_tree_bytes_hadoop_fs_fallback(spark, tmp_path, monkeypatch):
    """A URI the local fast path cannot see is sized through the Hadoop
    FileSystem API (here: LocalFileSystem with the os.path probes
    disabled), so non-local schemes derive real partition counts."""
    d = tmp_path / "d2"
    d.mkdir()
    (d / "a.bin").write_bytes(b"y" * 4096)
    uri = "file://" + str(d)
    monkeypatch.setattr(os.path, "isfile", lambda p: False)
    monkeypatch.setattr(os.path, "isdir", lambda p: False)
    assert _tree_bytes(uri, spark) == 4096
    assert _tree_bytes(uri, None) == 0  # no session to ask: degrade


def test_stream_state_partitions_warns_on_zero_bytes(spark, tmp_path):
    with pytest.warns(UserWarning, match="derived 0 input bytes"):
        n = stream_state_partitions(spark, str(tmp_path / "missing"))
    assert n == 2  # floor, visibly


# ---------------------------------------------------------------------------
# drain_available_now_until: offset-target hardening (pure-Python fakes —
# the helper only touches awaitTermination/lastProgress/recentProgress)
# ---------------------------------------------------------------------------

class _FakeQuery:
    def __init__(self, sources, rows):
        self.lastProgress = (
            None if sources is None else {"sources": sources})
        self.recentProgress = [{"numInputRows": str(rows)}]

    def awaitTermination(self):
        pass


def _starts(*qs):
    it = iter(qs)
    return lambda: next(it)


def test_drain_stops_at_offset_target():
    q = _FakeQuery([{"endOffset": '{"index": 99}'}], rows=5)
    drain_available_now_until(
        _starts(q), source_done=lambda e: e["index"] >= 99,
        bound=3, what="t")  # returns after ONE start, no zero-row pass


def test_drain_raises_on_zero_row_run_below_target():
    """A zero-row run below a KNOWN offset target is a failed upstream
    publish, not a successful drain."""
    q = _FakeQuery([{"endOffset": '{"index": 10}'}], rows=0)
    with pytest.raises(RuntimeError, match="below the drain target"):
        drain_available_now_until(
            _starts(q), source_done=lambda e: e["index"] >= 99,
            bound=3, what="t")


def test_drain_refuses_multi_source_offset_target():
    q = _FakeQuery([{"endOffset": '{"index": 1}'},
                    {"endOffset": '{"index": 2}'}], rows=5)
    with pytest.raises(ValueError, match="exactly one source"):
        drain_available_now_until(
            _starts(q), source_done=lambda e: True, bound=3, what="t")


def test_drain_zero_row_fallback_without_target_still_returns():
    q = _FakeQuery(None, rows=0)
    drain_available_now_until(_starts(q), bound=3, what="t")


# ---------------------------------------------------------------------------
# Map-side PQ assignment: element-identical to the groupBy argmin form
# ---------------------------------------------------------------------------

def test_pq_assign_matches_groupby_argmin_reference(spark):
    from etl_cloud_batch_processing_spark.operators.similarity import (
        _pq_assign,
    )

    rng = random.Random(13)
    subs = spark.createDataFrame(
        [(v, s, [round(rng.uniform(-1, 1), 3) for _ in range(4)])
         for v in range(20) for s in range(2)],
        "vec_id bigint, sub int, sv array<double>")
    cents = spark.createDataFrame(
        [(s, c, [round(rng.uniform(-1, 1), 3) for _ in range(4)])
         for s in range(2) for c in range(5)],
        "sub int, cid bigint, cv array<double>")

    # reference: the pre-round-13 join + groupBy(vec_id, sub) argmin
    d = F.aggregate(
        F.zip_with(F.col("sv"), F.col("cv"),
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x)
    ref = (subs.join(F.broadcast(cents), "sub")
           .select("vec_id", "sub", d.alias("dist"), "cid", "sv")
           .groupBy("vec_id", "sub")
           .agg(F.min(F.struct("dist", "cid", "sv")).alias("m"))
           .select("vec_id", "sub", F.col("m.sv").alias("sv"),
                   F.col("m.cid").alias("cid"),
                   F.col("m.dist").alias("dist")))

    got = _pq_assign(subs, cents)
    assert sorted(got.columns) == sorted(ref.columns)
    key = lambda r: (r["vec_id"], r["sub"])  # noqa: E731
    g = {key(r): (r["cid"], r["dist"], r["sv"]) for r in got.collect()}
    e = {key(r): (r["cid"], r["dist"], r["sv"]) for r in ref.collect()}
    assert g == e
    # and the plan carries NO corpus-grain exchange: the only exchange
    # below the join feeds the 8-row per-sub codebook aggregation
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(vec_id" not in plan


# ---------------------------------------------------------------------------
# Fused star round: set-identical to small_star(large_star(e))
# ---------------------------------------------------------------------------

def _two_star_reference(spark, e):
    """The textbook per-star composition the fused round replaces."""
    def symmetrize(x):
        return (x.unionByName(x.select(F.col("v").alias("u"),
                                       F.col("u").alias("v")))
                .filter(F.col("u") != F.col("v"))
                .distinct())

    sym = symmetrize(e)
    nbrmin = (sym.groupBy("u").agg(F.min("v").alias("mnv"))
              .select("u", F.least("mnv", F.col("u")).alias("m")))
    large = (sym.join(nbrmin, "u")
             .filter(F.col("v") > F.col("u"))
             .select(F.col("v").alias("u"), F.col("m").alias("v"))
             .filter(F.col("u") != F.col("v"))
             .distinct())
    ori = symmetrize(large).filter(F.col("v") < F.col("u"))
    nbrmin2 = ori.groupBy("u").agg(F.min("v").alias("m"))
    rewired = (ori.join(nbrmin2, "u")
               .select(F.col("v").alias("u"), F.col("m").alias("v")))
    selfe = nbrmin2.select(F.col("u"), F.col("m").alias("v"))
    return (rewired.unionByName(selfe)
            .filter(F.col("u") != F.col("v"))
            .distinct())


def test_star_round_matches_two_star_reference(spark):
    from etl_cloud_batch_processing_spark.operators.graph import (
        _star_round,
    )

    rng = random.Random(7)
    for trial in range(3):
        pairs = {(rng.randint(0, 14), rng.randint(0, 14))
                 for _ in range(25)}
        rows = [(a, b) for a, b in pairs if a != b]
        rows += [(b, a) for a, b in rows]  # both directions, like e0
        e = spark.createDataFrame(
            sorted(set(rows)), "u bigint, v bigint")
        got = {(r["u"], r["v"]) for r in _star_round(e).collect()}
        ref = {(r["u"], r["v"])
               for r in _two_star_reference(spark, e).collect()}
        assert got == ref, f"trial {trial}"
