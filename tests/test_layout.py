"""Z-order layout operators (plans/layout.py): Morton-key correctness
and the pruning claims the registered reports make."""
from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_cloud_batch_processing_spark.plans.layout import (
    N_FILES,
    X_HI,
    X_LO,
    Y_HI,
    Y_LO,
    Z_BITS,
    _ev_xyz,
    _morton,
    zorder_vs_linear_pruning,
    zorder_zone_map_extents,
)


def _py_morton(x: int, y: int) -> int:
    z = 0
    for i in range(Z_BITS):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2 ** Z_BITS - 1),
                          st.integers(0, 2 ** Z_BITS - 1)),
                min_size=1, max_size=16))
def test_morton_matches_pure_python(spark, pts):
    """The Spark shift/mask interleave equals the bit-twiddling
    reference for arbitrary in-range points (and is therefore
    invertible — distinct (x, y) give distinct z)."""
    df = spark.createDataFrame(pts, "x: bigint, y: bigint")
    got = {(r["x"], r["y"]): r["z"]
           for r in df.withColumn(
               "z", _morton(F.col("x"), F.col("y"))).collect()}
    assert got == {(x, y): _py_morton(x, y) for x, y in pts}


def test_morton_preserves_box_order(spark):
    """Monotonicity the pruning rule relies on: if x1<=x2 and y1<=y2
    then z(x1,y1) <= z(x2,y2) — dominated points never sort later, so
    a contiguous z-run's (x, y) extents bound its contents."""
    for x1, y1, x2, y2 in [(0, 0, 255, 255), (10, 20, 10, 21),
                           (64, 8, 79, 15), (3, 3, 4, 3)]:
        assert _py_morton(x1, y1) <= _py_morton(x2, y2)


def test_zone_maps_partition_the_corpus(spark, sf_dir):
    """The simulated z-files cover every event exactly once, with
    near-equal sizes (ntile: max-min <= 1)."""
    ext = zorder_zone_map_extents(spark, sf_dir).collect()
    assert len(ext) == N_FILES
    n_events = _ev_xyz(spark, sf_dir).count()
    sizes = [r["n_rows"] for r in ext]
    assert sum(sizes) == n_events
    assert max(sizes) - min(sizes) <= 1


def test_zorder_tiles_are_small_in_both_dimensions(spark, sf_dir):
    """The space-filling-curve locality claim: z-files are TILES, not
    stripes — on average they cover a small fraction of the (x, y)
    plane and less than the full user extent (a time-sorted file
    always spans ALL users)."""
    ev = _ev_xyz(spark, sf_dir)
    ex = ev.agg((F.max("x") - F.min("x") + 1).alias("w"),
                (F.max("y") - F.min("y") + 1).alias("h")).collect()[0]
    plane = ex["w"] * ex["h"]
    ext = zorder_zone_map_extents(spark, sf_dir).collect()
    avg_bbox = sum(r["bbox_area"] for r in ext) / len(ext)
    avg_xw = sum(r["x_max"] - r["x_min"] + 1 for r in ext) / len(ext)
    assert avg_bbox < plane / 4
    assert avg_xw < ex["w"]


def test_pruning_report_zorder_beats_linear(spark, sf_dir):
    """The registered report's claims, asserted: identical matched
    rows, z-order scans fewer files AND fewer rows, both layouts scan
    at least the matching rows (no false skips)."""
    rows = {r["layout"]: r
            for r in zorder_vs_linear_pruning(spark, sf_dir).collect()}
    z, lin = rows["zorder"], rows["linear_by_day"]
    assert z["rows_matched"] == lin["rows_matched"] > 0
    assert z["n_files_scanned"] < lin["n_files_scanned"]
    assert z["rows_scanned"] < lin["rows_scanned"]
    for r in (z, lin):
        assert r["rows_scanned"] >= r["rows_matched"]
        assert r["read_amplification"] >= 1.0


def test_no_false_skips_rowlevel(spark, sf_dir):
    """Zone-map pruning must be SAFE: every matching row lives in a
    file the rule scans (checked row-by-row against the z layout)."""
    from etl_cloud_batch_processing_spark.plans.layout import _z_filed
    zf = _z_filed(spark, sf_dir)
    pred = (F.col("x").between(X_LO, X_HI)
            & F.col("y").between(Y_LO, Y_HI))
    zone = (zf.groupBy("file_id")
            .agg(F.min("x").alias("x_min"), F.max("x").alias("x_max"),
                 F.min("y").alias("y_min"), F.max("y").alias("y_max")))
    scanned = ((F.col("x_min") <= X_HI) & (F.col("x_max") >= X_LO)
               & (F.col("y_min") <= Y_HI) & (F.col("y_max") >= Y_LO))
    skipped_ids = zone.filter(~scanned).select("file_id")
    missed = (zf.filter(pred)
              .join(skipped_ids, "file_id", "left_semi").count())
    assert missed == 0
