"""NS2 — MinHash + LSH near-duplicate detection at scale.

The exact n-gram Jaccard join (plans/llm.py ngram_jaccard_top_pairs) is
O(corpus²) in the worst case; the 100 TB form is MinHash signatures +
LSH banding: documents collide only when a band of their signatures
matches, so the join touches candidate pairs, not all pairs
(sub-quadratic — SURVEY.md §4.3).

Two implementations:

* **md5-deterministic** (this module's column helpers): the k minhash
  functions are ``min over shingles of md5(seed ':' shingle)`` — md5 is
  identical in Spark and DuckDB, so signatures, band keys, *and* the
  candidate-pair join are fully oracle-checkable.  16 hashes, 8 bands ×
  2 rows: P(collide) = 1-(1-j²)⁸, steep around j≈0.35.
* **stock MLlib** (``mllib_near_dup_pairs``): ``MinHashLSH`` over a
  HashingTF shingle vector with a fixed seed — the library path a real
  cluster deployment would tune; registered rows-only (MLlib's hash
  family is engine-specific, not reproducible in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_cloud_batch_processing_spark.functions import text as T
from etl_cloud_batch_processing_spark.plans.registry import query, table

N_HASHES = 16
ROWS_PER_BAND = 2
N_BANDS = N_HASHES // ROWS_PER_BAND


def shingles(text: Column | str) -> Column:
    """Distinct word-trigram shingles (same construction as the exact
    Jaccard query, so LSH recall is measured against it)."""
    toks = T.tokens(text)
    n = F.size(toks)
    return F.array_distinct(F.transform(
        F.sequence(F.lit(1), n - 2),
        lambda i: F.concat_ws(" ", F.element_at(toks, i),
                              F.element_at(toks, i + 1),
                              F.element_at(toks, i + 2))))


def _hash60(seed: Column, s: Column) -> Column:
    """60-bit seeded shingle hash both engines compute identically."""
    payload = F.concat(seed.cast("string"), F.lit(":"), s)
    return F.conv(F.substring(F.md5(payload.cast("binary")), 1, 15),
                  16, 10).cast("bigint")


def minhash_signature(shingle_arr: Column) -> Column:
    """array<bigint>[N_HASHES]: per-seed minimum shingle hash."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(N_HASHES - 1)),
        lambda seed: F.array_min(
            F.transform(shingle_arr, lambda s: _hash60(seed, s))))


def band_keys(signature: Column) -> Column:
    """array<string>[N_BANDS]: md5 of each band's signature slice."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
        lambda b: F.md5(F.concat_ws(
            ",", F.slice(signature, b * ROWS_PER_BAND + 1, ROWS_PER_BAND))))


# DuckDB twins of the helpers above (documents table, ``text`` column).
_D_TOKS = "string_split(text, ' ')"
_D_SHINGLES = (f"list_distinct(list_transform("
               f"range(1, len({_D_TOKS}) - 1), "
               f"i -> {_D_TOKS}[i] || ' ' || {_D_TOKS}[i+1] || ' ' || "
               f"{_D_TOKS}[i+2]))")
_D_HASH60 = ("CAST('0x' || substr(md5(CAST({seed} AS VARCHAR) || ':' || "
             "{s}), 1, 15) AS BIGINT)")
_D_MINHASH = (f"list_transform(range(0, {N_HASHES}), "
              f"seed -> list_min(list_transform(sh, "
              f"s -> {_D_HASH60.format(seed='seed', s='s')})))")
_D_BANDS = (f"list_transform(range(0, {N_BANDS}), "
            f"b -> md5(array_to_string("
            f"m[b * {ROWS_PER_BAND} + 1 : b * {ROWS_PER_BAND} "
            f"+ {ROWS_PER_BAND}], ',')))")


@query(
    "minhash_band_signatures",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, {_D_SHINGLES} AS sh
        FROM documents WHERE len({_D_TOKS}) >= 3),
    mh AS (SELECT doc_id, {_D_MINHASH} AS m FROM sh)
    SELECT doc_id,
           array_to_string(m, ',') AS minhash_sig,
           array_to_string({_D_BANDS}, '|') AS band_sig
    FROM mh
    """,
)
def minhash_band_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document MinHash signature + LSH band keys, serialized to
    strings so the driver's value-hash compares scalars.  One scan, no
    shuffle, no UDF — at 100 TB this is the embarrassingly-parallel
    signature pass that runs once at ingest and is stored alongside the
    corpus."""
    docs = table(spark, sf_dir, "documents")
    sh = (docs.filter(F.size(T.tokens("text")) >= 3)
          .select("doc_id", shingles("text").alias("sh")))
    mh = sh.select("doc_id", minhash_signature(F.col("sh")).alias("m"))
    return mh.select(
        "doc_id",
        F.concat_ws(",", F.col("m")).alias("minhash_sig"),
        F.concat_ws("|", band_keys(F.col("m"))).alias("band_sig"))


@query(
    "minhash_lsh_near_dup",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, {_D_SHINGLES} AS sh
        FROM documents WHERE len({_D_TOKS}) >= 3),
    mh AS (SELECT doc_id, sh, {_D_MINHASH} AS m FROM sh),
    bands AS (
        SELECT doc_id, b.band,
               md5(array_to_string(
                   m[b.band * {ROWS_PER_BAND} + 1 :
                     b.band * {ROWS_PER_BAND} + {ROWS_PER_BAND}], ','))
                   AS band_key
        FROM mh CROSS JOIN (SELECT unnest(range(0, {N_BANDS})) AS band) b),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id)
    SELECT p.doc_a, p.doc_b,
           CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
               / (len(sa.sh) + len(sb.sh)
                  - len(list_intersect(sa.sh, sb.sh))) AS jaccard
    FROM pairs p
    JOIN sh sa ON p.doc_a = sa.doc_id
    JOIN sh sb ON p.doc_b = sb.doc_id
    ORDER BY jaccard DESC, doc_a ASC, doc_b ASC
    LIMIT 20
    """,
)
def minhash_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate generation + exact verify: explode band keys,
    self-join on (band, key) — only colliding documents ever meet — then
    score the survivors with exact shingle Jaccard and keep the top 20.

    Scale shape: the band join shuffles O(docs × N_BANDS) small rows on
    the band key, never document text; the exact-verify join touches only
    candidates.  This replaces the quadratic shingle self-join of
    ``ngram_jaccard_top_pairs`` past ~10⁶ documents (SURVEY.md §7 risk 3).
    """
    docs = table(spark, sf_dir, "documents")
    sh = (docs.filter(F.size(T.tokens("text")) >= 3)
          .select("doc_id", shingles("text").alias("sh")))
    mh = sh.select("doc_id", minhash_signature(F.col("sh")).alias("m"))
    bands = mh.select(
        "doc_id", F.posexplode(band_keys(F.col("m")))
        .alias("band", "band_key"))
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (a.join(b, (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.band_key") == F.col("b.band_key"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
             .distinct())
    sa, sb = sh.alias("sa"), sh.alias("sb")
    inter = F.size(F.array_intersect(F.col("sa.sh"), F.col("sb.sh")))
    union = (F.size(F.col("sa.sh")) + F.size(F.col("sb.sh")) - inter)
    return (pairs
            .join(sa, F.col("doc_a") == F.col("sa.doc_id"))
            .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
            .select("doc_a", "doc_b",
                    (inter.cast("double") / union).alias("jaccard"))
            .orderBy(F.desc("jaccard"), F.asc("doc_a"), F.asc("doc_b"))
            .limit(20))


@query("mllib_near_dup_pairs")  # rows-only: MLlib hash family ≠ DuckDB
def mllib_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stock-MLlib near-dedup: HashingTF over shingles → MinHashLSH
    ``approxSimilarityJoin`` at Jaccard distance ≤ 0.8, fixed seed.  The
    deployment path when operating at cluster scale with MLlib's tuned
    AND/OR amplification; kept alongside the md5-deterministic variant
    which serves as its correctness reference."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = table(spark, sf_dir, "documents")
    sh = (docs.filter(F.size(T.tokens("text")) >= 3)
          .select("doc_id", shingles("text").alias("sh")))
    tf = HashingTF(inputCol="sh", outputCol="features",
                   numFeatures=1 << 18)
    feats = tf.transform(sh)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes",
                     numHashTables=8, seed=42)
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, 0.8,
                                        distCol="jaccard_dist")
    return (joined
            .filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
            .select(F.col("datasetA.doc_id").alias("doc_a"),
                    F.col("datasetB.doc_id").alias("doc_b"),
                    F.round("jaccard_dist", 6).alias("jaccard_dist"))
            .orderBy(F.asc("jaccard_dist"), F.asc("doc_a"), F.asc("doc_b"))
            .limit(50))
