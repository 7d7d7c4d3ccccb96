"""Capture .explain("formatted") for named queries into plans/r12/.

Usage:
    python tools/explain_some.py before q1 q2 ...
    python tools/explain_some.py after  q1 q2 ...

Writes plans/r12/<query>_<suffix>.txt.  Queries whose builder runs a
lifecycle (streaming drains, manifest publishes, driver training loops)
execute it at sf0.001 first — the captured plan is the RESULT frame's,
and the file header records that the optimization lives in the builder
phase (job count / drain starts), which the companion numbers in
OPTIMIZATION_r12.md carry.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

SF = "/root/testdata/sf0.001"
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"))


def main() -> None:
    suffix, names = sys.argv[1], sys.argv[2:]
    assert suffix in ("before", "after"), suffix
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = (SparkSession.builder.master("local[4]")
             .appName("explain-r12")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from etl_cloud_batch_processing_spark import plans

    for name in names:
        df = plans.REGISTRY[name].builder(spark, SF)
        df.write.format("noop").mode("overwrite").save()  # final AQE plan
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — {suffix} (sf0.001, local[4]; result-frame "
                    f"plan after executing the builder lifecycle)\n")
            f.write(buf.getvalue())
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
