"""Corpus-curation operators, round 2 (north-star NS1–NS4 extensions).

Five operators a 100 TB training-data pipeline runs between raw crawl
and tokenization, each with a DuckDB oracle twin:

* ``semdedup_pairs`` — SemDeDup (Abbas et al., arXiv:2303.09540):
  k-means-cluster the embedding space, prune near-identical pairs
  *within* clusters only — the embedding analog of LSH blocking.
* ``cross_doc_ngram_dup_share`` — per-document share of trigram
  shingles that occur in ≥2 documents (RefinedWeb/C4-style cross-doc
  duplication pressure, the corpus-level complement of the within-doc
  ``doc_repetition_scores`` gate).
* ``bpe_merge_candidates`` — corpus-wide adjacent-token-pair counts,
  the statistic one BPE training merge step maximizes.
* ``dedup_first_event_per_week`` — keep the first event per
  (user, type, 7-day window): windowed dedup, the retention-bounded
  form of NS1 for unbounded event streams.
* ``embedding_norm_outliers`` — L2-norm p05/p95 outlier flagging, the
  standard embedding-sanity gate before ANN indexing.

Scale notes are per-query; the common theme is one partial-aggregated
shuffle per logical step and all similarity math JVM-side in doubles
(functions/vectors.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_cloud_batch_processing_spark.functions import text as T
from etl_cloud_batch_processing_spark.functions import vectors as V
from etl_cloud_batch_processing_spark.functions.exprs import pushdown_barrier
from etl_cloud_batch_processing_spark.operators import dedup as DD
from etl_cloud_batch_processing_spark.operators import similarity as SIM
from etl_cloud_batch_processing_spark.plans.registry import (
    ptable,
    query,
    table,
)

# ---------------------------------------------------------------------------
# SemDeDup: cluster-then-prune over the embedding space.
# ---------------------------------------------------------------------------

SEM_K = 16           # cluster count; K ∝ √n keeps Σ|cluster|² ≈ n^1.5
SEM_THRESHOLD = 0.35  # cosine above which a pair is a semantic dup

_D_SQDIST = ("list_sum(list_transform(range(1, 65), "
             "d -> (e.emb[d] - c.cvec[d]) * (e.emb[d] - c.cvec[d])))")


@query(
    "semdedup_pairs",
    oracle=f"""
    WITH e AS (SELECT vec_id,
                      list_transform(embedding, v -> CAST(v AS DOUBLE))
                          AS emb
               FROM embeddings),
    c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
                  emb AS cvec
           FROM e ORDER BY vec_id LIMIT {SEM_K}),
    a1 AS (SELECT vec_id, emb, cid FROM (
               SELECT e.vec_id, e.emb, c.cid,
                      ROW_NUMBER() OVER (PARTITION BY e.vec_id
                          ORDER BY {_D_SQDIST} ASC, c.cid ASC) AS rn
               FROM e CROSS JOIN c0 c) WHERE rn = 1)
    SELECT x.cid AS cluster_id, x.vec_id AS vec_a, y.vec_id AS vec_b,
           round({V.duckdb_cosine_sql('x.emb', 'y.emb')}, 6) AS cos_sim
    FROM a1 x JOIN a1 y ON x.cid = y.cid AND x.vec_id < y.vec_id
    WHERE {V.duckdb_cosine_sql('x.emb', 'y.emb')} >= {SEM_THRESHOLD}
    """,
)
def semdedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: assign every embedding to its nearest of K centroids
    (deterministic seeds: the K lowest vec_ids — the same quantizer
    front as kmeans_lloyd_centroids), then compute exact cosine ONLY
    within each cluster and emit pairs above the threshold.

    The cluster id is the blocking key: candidate generation is an
    equi-join on cid, Σ|cluster|² instead of n² — with K ∝ √n each
    cluster stays bounded and the join is a plain shuffled hash join.
    At 100 TB: K grows to ~65k, the centroid table is still a few MB
    broadcast, and the per-cluster pair scan parallelizes per cid.
    Centroid assignment reuses operators/similarity._assign (one
    cross-join against the broadcast centroid table, argmin via
    deterministic row_number)."""
    emb = (ptable(spark, sf_dir, "embeddings")
           .select("vec_id",
                   F.transform("embedding",
                               lambda v: v.cast("double")).alias("emb")))
    w0 = Window.orderBy("vec_id")
    c0 = (emb.orderBy("vec_id").limit(SEM_K)
          .select((F.row_number().over(w0) - 1).cast("bigint").alias("cid"),
                  F.col("emb").alias("cvec")))
    # Precompute each vector's norm ONCE before the pair join: cosine
    # inside the join would re-run sqrt(dot(v,v)) per PAIR — 3 full
    # 64-element aggregate lambdas per candidate instead of 1 (measured
    # 12.3s → ~4s at sf0.1 on ~6M in-cluster pairs).  dot/(nx*ny) is
    # the exact same floating-point expression cosine() expands to, so
    # oracle parity is bit-identical.
    assigned = (SIM._assign(emb, c0)
                .withColumn("nrm", F.sqrt(V.dot("emb", "emb"))))
    x, y = assigned.alias("x"), assigned.alias("y")
    cos = (V.dot(F.col("x.emb"), F.col("y.emb"))
           / (F.col("x.nrm") * F.col("y.nrm")))
    # Barrier: the threshold filter on the derived cosine would
    # otherwise get the whole 64-element dot re-inlined by
    # PushDownPredicates and compute it twice per pair (SCALE.md
    # "optimizer re-inlining" pathology).
    return (x.join(y, (F.col("x.cid") == F.col("y.cid"))
                   & (F.col("x.vec_id") < F.col("y.vec_id")))
            .withColumn("raw_cos", pushdown_barrier(cos))
            .filter(F.col("raw_cos") >= SEM_THRESHOLD)
            .select(F.col("x.cid").alias("cluster_id"),
                    F.col("x.vec_id").alias("vec_a"),
                    F.col("y.vec_id").alias("vec_b"),
                    F.round("raw_cos", 6).alias("cos_sim")))


# ---------------------------------------------------------------------------
# Cross-document n-gram duplication share.
# ---------------------------------------------------------------------------

@query(
    "cross_doc_ngram_dup_share",
    oracle=f"""
    WITH sh AS (SELECT doc_id, unnest({T.D_SHINGLES_SQL}) AS s
                FROM documents WHERE len({T.D_TOKS_SQL}) >= 3),
    cnt AS (SELECT s, COUNT(*) AS nd FROM sh GROUP BY s)
    SELECT sh.doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN cnt.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_shingles,
           ROUND(AVG(CASE WHEN cnt.nd >= 2 THEN 1.0 ELSE 0.0 END), 6)
               AS dup_share
    FROM sh JOIN cnt ON sh.s = cnt.s
    GROUP BY sh.doc_id
    """,
)
def cross_doc_ngram_dup_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-corpus duplication pressure: the fraction of a
    document's distinct trigram shingles that appear in at least one
    OTHER document (shingle construction shared with the MinHash path,
    so the two gates agree on what a "shingle" is).

    Two partial-aggregated shuffles: (doc, shingle) → per-shingle doc
    counts, then the join back keyed on shingle — Zipf-skewed at scale,
    which AQE skew-join splits.  The document-frequency table is the
    same artifact a contamination or TF-IDF pass builds; in a real
    pipeline it is computed once and shared.  Because each (doc,
    shingle) row is distinct, the doc-count is a plain COUNT, never a
    countDistinct."""
    sh = (DD.tokenized(ptable(spark, sf_dir, "documents"))
          .select("doc_id",
                  F.explode(T.shingles_from_tokens(F.col("toks")))
                  .alias("s")))
    cnt = sh.groupBy("s").agg(F.count(F.lit(1)).alias("nd"))
    dup = F.when(F.col("nd") >= 2, 1).otherwise(0)
    return (sh.join(cnt, "s")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_shingles"),
                 F.sum(dup).alias("n_dup_shingles"),
                 F.round(F.avg(dup.cast("double")), 6).alias("dup_share")))


# ---------------------------------------------------------------------------
# BPE merge-step statistic: adjacent-pair frequencies.
# ---------------------------------------------------------------------------

@query(
    "bpe_merge_candidates",
    oracle="""
    SELECT s AS pair, COUNT(*) AS n_occurrences
    FROM (SELECT unnest(list_transform(range(1, len(toks)),
                     i -> toks[i] || ' ' || toks[i+1])) AS s
          FROM (SELECT string_split(text, ' ') AS toks FROM documents)
          WHERE len(toks) >= 2)
    GROUP BY s
    ORDER BY n_occurrences DESC, pair ASC
    LIMIT 20
    """,
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The statistic one BPE training step maximizes: corpus-wide
    adjacent-token-pair occurrence counts, top-20 with a deterministic
    (count desc, pair asc) tiebreak.  Real BPE iterates this — count,
    merge the argmax, re-count; each iteration is exactly this query
    over the re-tokenized corpus, so the per-step cost bounds training.

    Pairs are built columnar (sequence + transform over the token
    array — no Python, no self-join on position) and explode feeds ONE
    partial-aggregated groupBy: each map partition collapses to its
    local pair counts before the shuffle, so shuffle volume is
    O(distinct pairs), not O(tokens).  The top-20 is
    TakeOrderedAndProject — no global sort materializes."""
    docs = ptable(spark, sf_dir, "documents")
    toks = T.tokens("text")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(F.col("toks")) - 1),
        lambda i: F.concat_ws(" ", F.element_at(F.col("toks"), i),
                              F.element_at(F.col("toks"), i + 1)))
    return (docs.select(toks.alias("toks"))
            .filter(F.size("toks") >= 2)
            .select(F.explode(pairs).alias("pair"))
            .groupBy("pair")
            .agg(F.count(F.lit(1)).alias("n_occurrences"))
            .orderBy(F.desc("n_occurrences"), F.asc("pair"))
            .limit(20))


# ---------------------------------------------------------------------------
# Tokenizer vocabulary coverage.
# ---------------------------------------------------------------------------

VOCAB_TOP = 30


@query(
    "tokenizer_vocab_coverage",
    oracle=f"""
    WITH tf AS (SELECT t AS token, COUNT(*) AS n
                FROM (SELECT unnest(string_split(text, ' ')) AS t
                      FROM documents)
                GROUP BY t),
    tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS total FROM tf),
    top AS (SELECT token, n FROM tf
            ORDER BY n DESC, token ASC LIMIT {VOCAB_TOP})
    SELECT ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS vocab_rank,
           token,
           n AS token_count,
           ROUND(CAST(SUM(n) OVER (ORDER BY n DESC, token ASC
                                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / total, 6) AS cum_share
    FROM top, tot
    """,
)
def tokenizer_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative corpus coverage of the top-V vocabulary — the curve
    that sizes a tokenizer vocab (how many types cover 95/99% of
    tokens) and flags OOV pressure per corpus snapshot.

    Scale shape: token counts are one partial-aggregated shuffle; the
    top-V selection is TakeOrderedAndProject (never a global sort of
    the vocabulary), and the cumulative window then runs over only V
    rows — a single tiny partition BY CONSTRUCTION, so the
    single-partition WindowExec that would be a cliff over the full
    vocab (~10⁸ types at 100 TB) touches 30 rows here.  The corpus
    total joins in as a broadcast scalar."""
    docs = ptable(spark, sf_dir, "documents")
    tf = (docs.select(F.explode(T.tokens("text")).alias("token"))
          .groupBy("token").agg(F.count(F.lit(1)).alias("n")))
    total = tf.agg(F.sum("n").cast("double").alias("total"))
    top = tf.orderBy(F.desc("n"), F.asc("token")).limit(VOCAB_TOP)
    w = (Window.orderBy(F.desc("n"), F.asc("token"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (top.crossJoin(F.broadcast(total))
            .select(F.row_number().over(
                        Window.orderBy(F.desc("n"), F.asc("token")))
                    .alias("vocab_rank"),
                    "token",
                    F.col("n").alias("token_count"),
                    F.round(F.sum("n").over(w).cast("double")
                            / F.col("total"), 6).alias("cum_share")))


# ---------------------------------------------------------------------------
# Windowed dedup: first event per (user, type, 7-day window).
# ---------------------------------------------------------------------------

_D_WEEK = ("make_timestamp(CAST(floor(epoch(ts) / 604800) * 604800 "
           "AS BIGINT) * 1000000)")


@query(
    "dedup_first_event_per_week",
    oracle=f"""
    SELECT user_id, event_type, week_start,
           ts AS first_ts, event_id AS first_event_id
    FROM (SELECT user_id, event_type, {_D_WEEK} AS week_start, ts,
                 event_id,
                 ROW_NUMBER() OVER (PARTITION BY user_id, event_type,
                                        {_D_WEEK}
                                    ORDER BY ts, event_id) AS rn
          FROM events) WHERE rn = 1
    """,
)
def dedup_first_event_per_week(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Windowed dedup — NS1 with bounded retention: keep the first
    event per (user, type, tumbling 7-day window), the form streaming
    ``dropDuplicatesWithinWatermark`` takes at scale (state holds one
    row per live key per window, evicted as the watermark passes).

    Batch form is ONE hash aggregation: ``min(struct(ts, event_id))``
    is an argmin with a deterministic event_id tiebreak (struct
    ordering is lexicographic), so no window sort and no shuffle
    beyond the group keys.  ``F.window('7 days')`` buckets align to
    the epoch, matching the oracle's floor(epoch/604800) arithmetic."""
    ev = table(spark, sf_dir, "events")
    return (ev.groupBy("user_id", "event_type",
                       F.window("ts", "7 days").alias("w"))
            .agg(F.min(F.struct("ts", "event_id")).alias("first"))
            .select("user_id", "event_type",
                    F.col("w.start").alias("week_start"),
                    F.col("first.ts").alias("first_ts"),
                    F.col("first.event_id").alias("first_event_id")))


# ---------------------------------------------------------------------------
# Embedding L2-norm outliers.
# ---------------------------------------------------------------------------

@query(
    "embedding_norm_outliers",
    oracle="""
    WITH n AS (SELECT vec_id, label,
                      sqrt(list_sum(list_transform(embedding,
                           v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
                          AS nrm
               FROM embeddings),
    q AS (SELECT quantile_cont(nrm, 0.05) AS p05,
                 quantile_cont(nrm, 0.95) AS p95
          FROM n)
    SELECT vec_id, label, round(nrm, 6) AS l2_norm,
           nrm < p05 AS low_outlier
    FROM n, q
    WHERE nrm < p05 OR nrm > p95
    """,
)
def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding sanity gate: vectors whose L2 norm falls outside the
    corpus [p05, p95] band — degenerate (near-zero) or blown-up vectors
    that poison cosine ANN indexes.  Exact percentiles over the norm
    column (same linear-interpolation definition in Spark
    ``percentile`` and DuckDB ``quantile_cont``), joined back as a
    broadcast 1-row scalar frame so the whole thing is one scan + one
    tiny aggregate — at 100 TB the scale path swaps in
    ``approx_percentile`` exactly as value_percentiles_by_type →
    approx_value_percentiles documents."""
    emb = (table(spark, sf_dir, "embeddings")
           .select("vec_id", "label", V.norm("embedding").alias("nrm")))
    stats = (emb.agg(F.expr("percentile(nrm, 0.05)").alias("p05"),
                     F.expr("percentile(nrm, 0.95)").alias("p95")))
    return (emb.crossJoin(F.broadcast(stats))
            .filter((F.col("nrm") < F.col("p05"))
                    | (F.col("nrm") > F.col("p95")))
            .select("vec_id", "label",
                    F.round("nrm", 6).alias("l2_norm"),
                    (F.col("nrm") < F.col("p05")).alias("low_outlier")))


@query(
    "source_token_entropy",
    oracle="""
    WITH t AS (
        SELECT source, unnest(string_split(text, ' ')) AS token
        FROM documents),
    c AS (
        SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
        FROM t GROUP BY source, token),
    n AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n,
                 CAST(COUNT(*) AS BIGINT) AS n_types
          FROM c GROUP BY source),
    terms AS (
        SELECT c.source,
               CAST(ROUND((c.c * 1.0 / n.n) * ln(c.c * 1.0 / n.n), 9)
                    AS DECIMAL(20, 9)) AS t9
        FROM c JOIN n USING (source)),
    h AS (SELECT source, -CAST(SUM(t9) AS DOUBLE) AS ent
          FROM terms GROUP BY source)
    SELECT n.source, n.n AS n_tokens, n.n_types,
           ROUND(h.ent, 6) + 0.0 AS entropy_nats,
           ROUND(exp(h.ent), 6) + 0.0 AS effective_vocab,
           CASE WHEN n.n_types <= 1 THEN NULL
                ELSE ROUND(h.ent / ln(n.n_types * 1.0), 6) + 0.0
           END AS evenness
    FROM n JOIN h USING (source)
    """,
)
def source_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token diversity: Shannon entropy of each source's
    unigram distribution, the effective vocabulary exp(H), and Pielou
    evenness H/ln(types) — the corpus-mixture diversity monitor that
    catches a source collapsing into boilerplate (entropy drops while
    doc counts look healthy) before ``mixture_sampling`` re-weights on
    stale assumptions.

    One token-grain partial-aggregated groupBy is the only
    corpus-scale work; entropy terms (p·ln p on identical doubles in
    both engines) are rounded to 1e-9 and summed as exact DECIMAL so
    the reduction is order-independent (the log-rank discipline) —
    never a raw float sum across an unbounded vocabulary.  Single-type
    degenerate sources get NULL evenness on both sides."""
    t = (ptable(spark, sf_dir, "documents")
         .select("source", F.explode(T.tokens("text")).alias("token")))
    c = t.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"))
    n = c.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"))
    p = F.col("c") * 1.0 / F.col("n")
    terms = (c.join(F.broadcast(n), "source")
             .select("source",
                     F.round(p * F.log(p), 9)
                     .cast("decimal(20,9)").alias("t9")))
    h = terms.groupBy("source").agg(
        (-F.sum("t9").cast("double")).alias("ent"))
    return (n.join(h, "source")
            .select("source", F.col("n").alias("n_tokens"), "n_types",
                    (F.round(F.col("ent"), 6) + F.lit(0.0))
                    .alias("entropy_nats"),
                    (F.round(F.exp(F.col("ent")), 6) + F.lit(0.0))
                    .alias("effective_vocab"),
                    F.when(F.col("n_types") <= 1,
                           F.lit(None).cast("double"))
                    .otherwise(F.round(F.col("ent")
                                       / F.log(F.col("n_types") * 1.0),
                                       6) + F.lit(0.0))
                    .alias("evenness")))
