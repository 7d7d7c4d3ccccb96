"""Mini-driver: simulates the external verify harness against /root/repo."""
import os, sys, math, datetime
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import duckdb, pandas as pd

# plain session, as the driver would build it — none of our engine conf.
# SPARK_GRAFT_VERIFY_MASTER lets CI re-run the sweep under a different
# parallelism: any query whose value hash depends on partitioning
# (summation order, unstable ranking) reds out here before the real
# driver finds it.
spark = (SparkSession.builder
         .master(os.environ.get("SPARK_GRAFT_VERIFY_MASTER", "local[8]"))
         .appName("driver-sim")
         .config("spark.ui.enabled", "false").getOrCreate())

import __spark_entry__ as e

df = e.entry(spark)
rows = df.count()
print(f"ENTRY: rows={rows} schema={df.schema.simpleString()}")
assert rows > 0

SF = os.environ.get("SPARK_GRAFT_VERIFY_SF_DIR", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"create view {t} as select * from read_parquet('{SF}/{t}.parquet')")

def canon(v):
    if v is None or v is pd.NaT: return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(canon(x) for x in v)
    return v

def dclass(dtype):
    """int/float/bool/other dtype class — the driver's value hash
    distinguishes 123 from 123.0 (DRIVER_NOTES #12), so value equality
    alone is not enough: a DuckDB HUGEINT oracle column lands in pandas
    as float64 while Spark returns int64, and the external harness
    hash-fails even though every value is equal."""
    k = getattr(dtype, "kind", "O")
    return {"i": "int", "u": "int", "f": "float", "b": "bool"}.get(k, "other")

qs, os_ = e.queries(), e.oracle_sql()
# CI-visible env-gated skips (round-2 verdict item 8): name every query
# that exists in the codebase but could not register in this container.
from etl_cloud_batch_processing_spark.streaming.stateful import ensure_protobuf
if not ensure_protobuf():
    print("SKIPPED streaming_user_stats_tws: env-gated — "
          "transformWithStateInPandas needs protobuf: neither the site "
          "package nor the vendored google-cloud-sdk runtime resolves "
          "(operator + plan tests live in streaming/stateful.py, "
          "tests/test_tws.py)")
if len(sys.argv) > 1:  # optional name filters: substring match, OR'd
    qs = {n: f for n, f in qs.items() if any(a in n for a in sys.argv[1:])}
ok = bad = 0
for name, fn in sorted(qs.items()):
    sdf = fn(spark, SF).toPandas()
    if name not in os_:
        print(f"  {name}: rows-only rows={len(sdf)}"); ok += 1; continue
    ddf = con.execute(os_[name]).fetchdf()
    cols = sorted(sdf.columns)
    s = sorted((tuple(canon(r[c]) for c in cols) for _, r in sdf.iterrows()), key=repr)
    d = sorted((tuple(canon(r[c]) for c in cols) for _, r in ddf.iterrows()), key=repr)
    dtype_bad = [c for c in cols if c in ddf.columns
                 and dclass(sdf[c].dtype) != dclass(ddf[c].dtype)]
    status = "MATCH" if (cols == sorted(ddf.columns) and s == d) else "MISMATCH"
    if status == "MATCH" and dtype_bad:
        status = "DTYPE-MISMATCH " + ",".join(
            f"{c}(spark={sdf[c].dtype},oracle={ddf[c].dtype})"
            for c in dtype_bad)
    if status == "MATCH": ok += 1
    else: bad += 1  # DTYPE-MISMATCH counts as bad: the driver hash would fail
    print(f"  {name}: {status} rows={len(sdf)}/{len(ddf)}")
print(f"RESULT: {ok} ok, {bad} mismatched")
sys.exit(1 if bad else 0)
