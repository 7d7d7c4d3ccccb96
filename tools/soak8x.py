"""8x scale soak for the documents/embeddings operator family.

Replicates the sf0.1 `documents` and `embeddings` tables 8x with
re-strided ids (so key cardinality scales with the data, as it would in
a real corpus — 8 copies of the SAME doc_ids would instead inflate
per-key group sizes) and re-times the dedup/similarity/text operators
whose cost is driven by pair generation, not scan bytes.  Appends
nothing; prints a markdown table for SCALE.md.

Usage: python tools/soak8x.py [query ...]

SPARK_GRAFT_SOAK_SKEW=zipf additionally re-draws every event's user_id
from a Zipf(s≈1) distribution over the scaled user space (inverse-CDF
``floor(N^u)`` on a fixed-seed xxhash64 uniform — deterministic, no
RNG state).  The uniform replication above scales VOLUME but keeps
per-key group sizes flat; real 100-TB event tables are Zipf-skewed,
and the shuffle-heavy families (funnel, sessionization, dup-graph,
KMV) must survive a head user owning several percent of all events —
the regime AQE skew splitting and operators/skew.py's salted forms
exist for (round-8 verdict item 5).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_cloud_batch_processing_spark import plans  # noqa: E402
from etl_cloud_batch_processing_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("SPARK_GRAFT_SOAK_FACTOR", "8"))
SKEW = os.environ.get("SPARK_GRAFT_SOAK_SKEW", "")

DEFAULT_QUERIES = [
    "cross_doc_ngram_dup_share",
    "semdedup_pairs",
    "bpe_merge_candidates",
    "minhash_lsh_near_dup",
    "tfidf_top_terms",
    "embedding_norm_outliers",
]


def build_8x(spark, out_dir: str) -> None:
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    reps = spark.range(FACTOR).select(F.col("id").alias("rep"))
    (docs.crossJoin(reps)
     .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(n_docs))
     .drop("rep")
     .write.mode("overwrite").parquet(f"{out_dir}/documents.parquet"))
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_vec = emb.count()
    (emb.crossJoin(reps)
     .withColumn("vec_id", F.col("vec_id") + F.col("rep") * F.lit(n_vec))
     .drop("rep")
     .write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet"))
    # events replicate with re-strided event ids and user ids (same time
    # span, FACTORx daily traffic — the realistic growth axis for an
    # event stream; fresh user ids keep per-key group sizes constant)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_ev = ev.count()
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    scaled = (ev.crossJoin(reps)
              .withColumn("event_id",
                          F.col("event_id") + F.col("rep") * F.lit(n_ev))
              .withColumn("user_id",
                          F.col("user_id") + F.col("rep") * F.lit(n_users))
              .drop("rep"))
    if SKEW == "zipf":
        # inverse-CDF Zipf(s=1): u ~ U[0,1) from a seeded xxhash64 of
        # the (already re-strided) event id, user_id = floor(N^u) —
        # P(user ≤ k) = log_N(k+1), density ∝ 1/k, head user owns
        # ~1/ln(N) of ALL events.  Deterministic, so reruns compare.
        n_total = n_users * FACTOR
        u = ((F.abs(F.xxhash64("event_id", F.lit(42))) % F.lit(10 ** 9))
             / F.lit(10 ** 9))
        scaled = scaled.withColumn(
            "user_id",
            F.floor(F.pow(F.lit(float(n_total)), u)).cast("bigint") - 1)
    scaled.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")
    if SKEW == "zipf":
        top = (spark.read.parquet(f"{out_dir}/events.parquet")
               .groupBy("user_id").count().orderBy(F.desc("count"))
               .limit(1).collect()[0])
        print(f"zipf skew: top user {top['user_id']} owns "
              f"{top['count']}/{n_ev * FACTOR} events "
              f"({100.0 * top['count'] / (n_ev * FACTOR):.1f}%)")
    # orders replicate with re-strided order keys (same date span,
    # FACTORx orders/year — the growth axis for the reporting queries)
    od = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n_ord = od.agg(F.max("o_orderkey")).collect()[0][0] + 1
    (od.crossJoin(reps)
     .withColumn("o_orderkey",
                 F.col("o_orderkey") + F.col("rep") * F.lit(n_ord))
     .drop("rep")
     .write.mode("overwrite").parquet(f"{out_dir}/orders.parquet"))
    passthrough = ["region", "nation", "supplier", "part", "lineitem"]
    if os.environ.get("SPARK_GRAFT_SOAK_CUSTOMERS") == "replicate":
        # BLOCKING-KEY skew stress (round-9 verdict item 7): replicate
        # customers with re-strided keys but UNCHANGED names/balances —
        # every replica shares its original's name-suffix-4 and
        # floor(balance) blocking keys, so entity-resolution blocks
        # grow FACTORx and candidate pairs ~FACTOR²x: the Σ|block|²
        # regime multi-pass blocking must survive.  rep 0 keeps the
        # original keys, so FK edges from orders stay intact.
        cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
        n_cust = cust.agg(F.max("c_custkey")).collect()[0][0] + 1
        (cust.crossJoin(reps)
         .withColumn("c_custkey",
                     F.col("c_custkey") + F.col("rep") * F.lit(n_cust))
         .drop("rep")
         .write.mode("overwrite").parquet(f"{out_dir}/customer.parquet"))
    else:
        passthrough.append("customer")
    for t in passthrough:
        src = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(src):
            os.symlink(src, f"{out_dir}/{t}.parquet")


def time_query(spark, name: str, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(2):
        # clock starts before the builder: driver-loop queries run real
        # work inside it (same rule as bench.py)
        t0 = time.perf_counter()
        df = plans.REGISTRY[name].builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
    return best


def main() -> None:
    names = sys.argv[1:] or DEFAULT_QUERIES
    spark = get_spark("soak8x")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = tempfile.mkdtemp(prefix="soak8x_")
    build_8x(spark, out_dir)
    tag = f"{FACTOR}x data" + (f" ({SKEW} skew)" if SKEW else "")
    print(f"| query | sf0.1 | {tag} | time ratio |")
    print("|---|---|---|---|")
    for name in names:
        t1 = time_query(spark, name, SF_DIR)
        t8 = time_query(spark, name, out_dir)
        print(f"| `{name}` | {t1:.2f} s | {t8:.2f} s | "
              f"{t8 / t1:.1f}x |")
    spark.stop()


if __name__ == "__main__":
    main()
