"""Per-query profiler: wall-time split (builder vs noop write) + Spark
job count — the measurement harness for the optimization rounds.

Why job count: DRIVER_NOTES #24 root-caused the dominant cost of the
iterative/streaming families on this box to per-job scheduling latency
multiplied by the number of driver-coordinated jobs, so "how many jobs
does this query launch" is the before/after number that predicts wall
time better than any plan metric.

Usage:
    python tools/profile_query.py <substring> [<substring> ...]
    SPARK_GRAFT_PROFILE_RUNS=2 python tools/profile_query.py bpe_train

Prints one line per (query, run): builder seconds, noop-write seconds,
jobs launched, and the registry total at the end.  Same session config,
warm-up, and cache discipline as bench.py so numbers are comparable.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_cloud_batch_processing_spark import plans  # noqa: E402
from etl_cloud_batch_processing_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("engine-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    for name in ("lineitem", "orders", "events", "documents", "embeddings"):
        spark.read.parquet(f"{SF_DIR}/{name}.parquet").count()
    (spark.range(256).repartition(sc.defaultParallelism)
     .mapInPandas(lambda it: it, schema="id long")
     .write.format("noop").mode("overwrite").save())

    names = [n for n in sorted(plans.REGISTRY)
             if any(a in n for a in sys.argv[1:])]
    if not names:
        print(f"no queries match {sys.argv[1:]}", file=sys.stderr)
        sys.exit(2)
    n_runs = int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "2"))

    def total_jobs() -> int:
        # DAGScheduler.numTotalJobs counts EVERY job in the app,
        # including ones submitted from streaming-execution threads that
        # a thread-local job group would miss.
        return sc._jsc.sc().dagScheduler().numTotalJobs()

    for name in names:
        for r in range(n_runs):
            j0 = total_jobs()
            t0 = time.perf_counter()
            df = plans.REGISTRY[name].builder(spark, SF_DIR)
            t1 = time.perf_counter()
            j1 = total_jobs()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            j2 = total_jobs()
            spark.catalog.clearCache()
            print(f"{name:45s} run{r} total={t2 - t0:7.3f}s "
                  f"builder={t1 - t0:7.3f}s noop={t2 - t1:6.3f}s "
                  f"jobs={j2 - j0} (builder {j1 - j0})", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
