#!/usr/bin/env python
"""Benchmark runner: executes the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <float>}

Each query is forced end-to-end with a noop-format write (full
execution, nothing collected to the driver, no count() shortcuts via
parquet metadata).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from etl_cloud_batch_processing_spark import plans
from etl_cloud_batch_processing_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: every registered query (full SURVEY.md §2 coverage).
# Ordered so scan-heavy queries warm the OS page cache for the rest.
SKIP: set[str] = set()


def sf_from_dir(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    spark = get_spark("engine-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: touch every fixture file once so first-query JVM/IO
    # warmup doesn't pollute per-query numbers.
    for name in ("lineitem", "orders", "events", "documents", "embeddings"):
        spark.read.parquet(f"{SF_DIR}/{name}.parquet").count()
    # Pre-fork the Python worker pool: the first Arrow-UDF stage in a
    # busy JVM otherwise pays the whole daemon fork+import cost (tens of
    # seconds measured) inside one query's timing.
    (spark.range(256).repartition(spark.sparkContext.defaultParallelism)
     .mapInPandas(lambda it: it, schema="id long")
     .write.format("noop").mode("overwrite").save())

    def calibration() -> float:
        """Fixed-workload box-speed probe (round-12 verdict item 4,
        additions-only): one in-memory 16M-row shuffle+aggregate whose
        cost is INDEPENDENT of the scale factor and the registry, timed
        best-of-3 like everything else.  Cross-round/cross-box compares
        divide by this to normalize machine speed mechanically instead
        of adjudicating load drift by forensics."""
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            (spark.range(1 << 24)
             .select((F.col("id") % 4096).alias("k"), "id")
             .groupBy("k")
             .agg(F.sum("id").alias("s"), F.count(F.lit(1)).alias("n"))
             .write.format("noop").mode("overwrite").save())
            runs.append(round(time.perf_counter() - t0, 3))
        return min(runs)

    calib_start = calibration()

    # Best-of-3 per query: this box is a shared microVM with high
    # run-to-run variance (same query measured 7s and 51s minutes
    # apart — DRIVER_NOTES #7); the min of three executions is the
    # honest steady-state number, and the per-query run spread is
    # recorded in BENCH_FULL.json so apparent cross-round "regressions"
    # can be attributed to noise vs plans (round-2 verdict item 6).
    # Caches are cleared between runs so every execution re-runs the
    # full plan, not a memoized one.
    N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    runs_detail: dict[str, list[float]] = {}
    failed: list[str] = []
    for name, spec in sorted(plans.REGISTRY.items()):
        if name in SKIP:
            continue
        runs: list[float] = []
        try:
            for _ in range(N_RUNS):
                # The clock starts BEFORE the builder call: driver-loop
                # queries (convergence runner, persisted-index builds)
                # execute real work inside the builder, and timing only
                # the final noop write would under-report them.
                t0 = time.perf_counter()
                df = spec.builder(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 3))
                # Queries may persist() intermediates used by several
                # plan branches; drop them so no run's timing inherits
                # another's cache (or its memory pressure).
                spark.catalog.clearCache()
        except Exception as exc:  # one bad query must not zero the round
            failed.append(name)
            print(f"FAILED {name}: {exc}", file=sys.stderr)
            continue
        timings[name] = min(runs)
        runs_detail[name] = runs

    total = round(sum(timings.values()), 3)
    sf = sf_from_dir(SF_DIR)
    spread = {n: round(max(r) - min(r), 3) for n, r in runs_detail.items()}
    # Second calibration at the END of the run: start/end disagreement
    # means the box's speed moved DURING the bench, which bounds how
    # much any per-query delta can be trusted.
    calib_end = calibration()

    # Full per-query detail goes to a sidecar file; the stdout line must
    # stay under the driver's 2000-char tail capture or it records
    # parsed=null (round 1 lost its benchmark number exactly this way).
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_FULL.json"), "w") as f:
        json.dump({"metric": "total_wall_sec_all_queries", "value": total,
                   "unit": "sec", "n_queries": len(timings),
                   "failed": failed, "n_runs": N_RUNS,
                   "queries": timings, "runs": runs_detail,
                   "spread": spread, "sf": sf,
                   "calib": calib_start,
                   "calib_end": calib_end}, f, indent=1, sort_keys=True)

    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1]))
    out = {"metric": "total_wall_sec_all_queries", "value": total,
           "unit": "sec", "n_queries": len(timings), "n_failed": len(failed),
           "calib": calib_start, "queries": {}, "sf": sf}
    for name, sec in slowest.items():
        out["queries"][name] = sec
        if len(json.dumps(out)) > 1700:
            del out["queries"][name]
            break
    line = json.dumps(out)
    assert len(line) < 1900, len(line)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
