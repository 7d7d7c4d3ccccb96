"""Corpus-filtering operators, round 3 (training-data-pipeline mandate):
span-level dedup, DSIR-style importance weighting, and a staged quality
filter funnel.

These extend the NS1/NS4 families with the filter shapes a production
pretraining pipeline runs between ingest and tokenization: RefinedWeb-
style line dedup (remove spans repeated across the corpus), importance
resampling weights (up/down-weight documents toward a target domain
distribution), and a survivors-per-stage audit of a conjunctive filter
chain (the report every curation run ships with its output).

All pure ``pyspark.sql.functions`` — every query here has an exact
DuckDB value-hash oracle.  The reference repo has no corpus operators
at all (its query surface is 4 BigQuery SQL strings; SURVEY.md §2.12
scopes this family from the mandate, not the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_cloud_batch_processing_spark.functions import text as T
from etl_cloud_batch_processing_spark.plans.registry import (
    ptable,
    query,
    table,
)

#: Tokens per dedup span ("line"): the fixture corpus is single-line
#: word soup, so spans play the role newline-delimited lines play on
#: web text.  8 tokens ≈ the shortest span worth deduplicating.
LINE_TOKENS = 8

#: DSIR target domain: documents whose lang matches are the
#: distribution we resample toward.
DSIR_TARGET_LANG = "de"

#: Size guard for PMI pair generation: documents with more distinct
#: tokens than this are excluded (their pair fan-out is quadratic in
#: distinct tokens — one pathological doc at corpus scale dominates the
#: self-join).  Far above any fixture doc; the oracle applies the SAME
#: cut, so the guard is active during every parity check.
MAX_PMI_DOC_TOKENS = 10_000


@query(
    "line_dedup_spans",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    l AS (
        SELECT doc_id,
               unnest(range(0, (len(toks) + {LINE_TOKENS - 1})
                               // {LINE_TOKENS})) AS line_no,
               unnest(list_transform(
                   range(0, (len(toks) + {LINE_TOKENS - 1})
                            // {LINE_TOKENS}),
                   i -> CAST('0x' || substr(md5(array_to_string(
                            list_slice(toks, i * {LINE_TOKENS} + 1,
                                       i * {LINE_TOKENS} + {LINE_TOKENS}),
                            ' ')), 1, 15) AS BIGINT))) AS h
        FROM t),
    k AS (
        SELECT doc_id, line_no,
               ROW_NUMBER() OVER (PARTITION BY h
                                  ORDER BY doc_id, line_no) AS rn
        FROM l)
    SELECT doc_id,
           COUNT(*) AS n_lines,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           ROUND(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS kept_ratio
    FROM k GROUP BY doc_id
    """,
)
def line_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style span dedup audit: chop every document into
    consecutive ``LINE_TOKENS``-token spans, keep only the FIRST
    occurrence of each span corpus-wide (deterministic (doc_id,
    line_no) priority), and report per-document survival.

    Plan shape: one explode to (doc, line_no, span-hash) rows — the
    span text itself never shuffles, only its 60-bit md5 — one
    window-shuffle partitioned BY THE HASH (fine-grained key, no skew
    beyond true duplicate mass), one groupBy(doc_id) reduce.  At 100 TB
    this is the standard line-dedup shape: both shuffles are
    hash-partitioned on high-cardinality keys and the heavy column
    (text) is dropped before the first exchange."""
    docs = table(spark, sf_dir, "documents")
    nl = F.expr(f"(size(toks) + {LINE_TOKENS - 1}) div {LINE_TOKENS}")
    span = F.concat_ws(
        " ", F.slice("toks", F.col("i") * LINE_TOKENS + 1, LINE_TOKENS))
    h = F.conv(F.substring(F.md5(span.cast("binary")), 1, 15), 16, 10) \
         .cast("bigint")
    lines = (docs.select("doc_id", F.split("text", " ").alias("toks"))
             .select("doc_id", "toks",
                     F.explode(F.sequence(F.lit(0), nl - 1)).alias("i"))
             .select("doc_id", F.col("i").alias("line_no"), h.alias("h")))
    w = Window.partitionBy("h").orderBy("doc_id", "line_no")
    kept = F.when(F.row_number().over(w) == 1, 1).otherwise(0)
    return (lines.withColumn("is_kept", kept)
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_lines"),
                 F.sum("is_kept").alias("n_kept"),
                 F.round(F.sum("is_kept")
                         / F.count(F.lit(1)).cast("double"), 6)
                 .alias("kept_ratio")))


@query(
    "dsir_importance_weights",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        FROM documents),
    tot AS (
        SELECT COUNT(*) AS n_all,
               SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}'
                        THEN 1 ELSE 0 END) AS n_t,
               COUNT(DISTINCT tok) AS v
        FROM tok),
    s AS (
        SELECT tok, COUNT(*) AS c_all,
               SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}'
                        THEN 1 ELSE 0 END) AS c_t
        FROM tok GROUP BY tok)
    SELECT t.doc_id, COUNT(*) AS n_tokens,
           ROUND(AVG(ln((s.c_t + 1.0) / (tot.n_t + tot.v))
                     - ln((s.c_all + 1.0) / (tot.n_all + tot.v))), 6)
               + 0.0 AS dsir_logweight
    FROM tok t JOIN s USING (tok) CROSS JOIN tot
    GROUP BY t.doc_id
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights: per-document mean log-ratio of an
    add-one-smoothed unigram LM of the TARGET domain (lang =
    ``DSIR_TARGET_LANG``) against the whole-corpus LM — positive means
    "looks like the target", the resampling score of Xie et al.'s
    Data Selection with Importance Resampling, reduced to unigrams.

    Both LMs come from ONE token-grain aggregation (conditional sums),
    the corpus totals are a broadcast one-row frame, and the per-token
    score joins back to token instances on the token key — shuffle-join
    shaped for a vocabulary too large to broadcast, with AQE free to
    broadcast it when it is small.  One further groupBy(doc_id)
    averages instance scores."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", "lang",
                      F.explode(F.split("text", " ")).alias("tok"))
    is_t = F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)
    tot = F.broadcast(tok.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum(is_t).alias("n_t"),
        F.countDistinct("tok").alias("v")))
    s = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c_all"),
                               F.sum(is_t).alias("c_t"))
    lr = (F.log((F.col("c_t") + F.lit(1.0)) / (F.col("n_t") + F.col("v")))
          - F.log((F.col("c_all") + F.lit(1.0))
                  / (F.col("n_all") + F.col("v"))))
    return (tok.join(s, "tok").crossJoin(tot)
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 (F.round(F.avg(lr), 6) + F.lit(0.0))
                 .alias("dsir_logweight")))


@query(
    "quality_filter_funnel",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    mx AS (
        SELECT doc_id, MAX(c) AS mc
        FROM (SELECT doc_id, tok, COUNT(*) AS c
              FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
              GROUP BY doc_id, tok)
        GROUP BY doc_id),
    f AS (
        SELECT t.doc_id,
               len(toks) AS n,
               list_aggregate(list_transform(toks, x -> len(x)), 'sum')
                   / CAST(len(toks) AS DOUBLE) AS mwl,
               len(list_filter(toks, x -> x IN ('a', 'the')))
                   / CAST(len(toks) AS DOUBLE) AS swr,
               mx.mc / CAST(len(toks) AS DOUBLE) AS mts
        FROM t JOIN mx ON t.doc_id = mx.doc_id),
    c AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS s0,
               CAST(SUM(CASE WHEN n BETWEEN 25 AND 90
                        THEN 1 ELSE 0 END) AS BIGINT) AS s1,
               CAST(SUM(CASE WHEN n BETWEEN 25 AND 90
                             AND mwl BETWEEN 4.0 AND 5.0
                        THEN 1 ELSE 0 END) AS BIGINT) AS s2,
               CAST(SUM(CASE WHEN n BETWEEN 25 AND 90
                             AND mwl BETWEEN 4.0 AND 5.0
                             AND swr <= 0.12
                        THEN 1 ELSE 0 END) AS BIGINT) AS s3,
               CAST(SUM(CASE WHEN n BETWEEN 25 AND 90
                             AND mwl BETWEEN 4.0 AND 5.0
                             AND swr <= 0.12 AND mts <= 0.12
                        THEN 1 ELSE 0 END) AS BIGINT) AS s4
        FROM f)
    SELECT CAST(0 AS BIGINT) AS stage, 'all' AS stage_name,
           s0 AS survivors FROM c
    UNION ALL SELECT 1, 'length', s1 FROM c
    UNION ALL SELECT 2, 'mean_word_len', s2 FROM c
    UNION ALL SELECT 3, 'stopword_ratio', s3 FROM c
    UNION ALL SELECT 4, 'max_token_share', s4 FROM c
    """,
)
def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivors-per-stage audit of a conjunctive Gopher-style quality
    filter chain (token count → mean word length → stopword ratio →
    max-single-token share): the report a curation run publishes so a
    threshold regression is visible as a funnel-step collapse.

    ONE pass computes all per-doc features (array expressions for
    length stats; the max-token-share needs a (doc, token) aggregate,
    one fine-grained shuffle), then a single global aggregation emits
    every cumulative stage count via conditional sums — the funnel is
    NOT n sequential filter jobs, it is one scan + one reduce no matter
    how many stages, the shape that matters when each extra pass costs
    a 100 TB scan.  Stage rows come from ``stack`` (unpivot) on the
    one-row aggregate."""
    docs = table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.split("text", " ").alias("toks"))
    mx = (t.select("doc_id", F.explode("toks").alias("tok"))
          .groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
          .groupBy("doc_id").agg(F.max("c").alias("mc")))
    n = F.size("toks")
    feats = (t.join(mx, "doc_id")
             .select(
                 n.alias("n"),
                 (F.aggregate(F.transform("toks", F.length),
                              F.lit(0), lambda a, x: a + x)
                  / n.cast("double")).alias("mwl"),
                 (F.size(F.filter("toks",
                                  lambda x: x.isin("a", "the")))
                  / n.cast("double")).alias("swr"),
                 (F.col("mc") / n.cast("double")).alias("mts")))
    c1 = F.col("n").between(25, 90)
    c2 = c1 & F.col("mwl").between(4.0, 5.0)
    c3 = c2 & (F.col("swr") <= 0.12)
    c4 = c3 & (F.col("mts") <= 0.12)
    agg = feats.agg(
        F.count(F.lit(1)).alias("s0"),
        F.sum(F.when(c1, 1).otherwise(0)).alias("s1"),
        F.sum(F.when(c2, 1).otherwise(0)).alias("s2"),
        F.sum(F.when(c3, 1).otherwise(0)).alias("s3"),
        F.sum(F.when(c4, 1).otherwise(0)).alias("s4"))
    return agg.selectExpr(
        "stack(5, "
        " CAST(0 AS BIGINT), 'all',             s0,"
        " CAST(1 AS BIGINT), 'length',          s1,"
        " CAST(2 AS BIGINT), 'mean_word_len',   s2,"
        " CAST(3 AS BIGINT), 'stopword_ratio',  s3,"
        " CAST(4 AS BIGINT), 'max_token_share', s4"
        ") AS (stage, stage_name, survivors)")


@query(
    "hash_sample_per_lang",
    oracle="""
    SELECT doc_id, lang, rnk
    FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
        FROM documents)
    WHERE rnk <= 10
    """,
)
def hash_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible exact-k per-group sample: rank documents inside
    each lang by the md5 of their id (a uniform, seedless, engine-
    portable shuffle) and keep the first k — the deterministic twin of
    per-group reservoir sampling.  Complements the keep-RATE sampler
    (stratified_sample_by_lang): rate sampling sizes output with the
    group, exact-k caps it per group regardless of group skew.

    One window-shuffle on the group key; the md5 ranking needs no
    global state, so at 100 TB this is a single exchange + per-group
    top-k (Spark evaluates rank-filter windows with a partial top-k
    sort, never materializing full group sorts when k is pushed)."""
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id"))
    return (docs.select("doc_id", "lang",
                        F.row_number().over(w).alias("rnk"))
            .filter(F.col("rnk") <= 10))


@query(
    "doc_cross_entropy_bigram",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i])) AS w1,
               unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i + 1])) AS w2
        FROM t),
    vocab AS (
        SELECT COUNT(DISTINCT tok) AS v
        FROM (SELECT unnest(toks) AS tok FROM t)),
    bc AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY w1, w2),
    pc AS (SELECT w1, COUNT(*) AS c FROM bg GROUP BY w1)
    SELECT bg.doc_id, COUNT(*) AS n_bigrams,
           ROUND(-AVG(ln((bc.c + 1.0) / (pc.c + vocab.v))), 6)
               AS cross_entropy
    FROM bg
    JOIN bc USING (w1, w2)
    JOIN pc USING (w1)
    CROSS JOIN vocab
    GROUP BY bg.doc_id
    """,
)
def doc_cross_entropy_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality score: per-document cross-entropy under an
    add-one-smoothed corpus bigram model, p(w₂|w₁) = (c(w₁w₂)+1) /
    (c(w₁·)+V) — the order-2 companion of doc_cross_entropy_unigram
    (CCNet scores documents with exactly this shape, just with a
    larger model).  Low CE = stereotyped/templated text, high CE =
    noise; both tails get reviewed before training.

    Plan: bigram instances come from one zip of two array slices (no
    self-join to build pairs), the model is ONE aggregation each at
    bigram and prefix grain, and scoring joins instances to the model
    on the bigram key — the same AQE-skew-handled join shape as the
    unigram query, one grain deeper.  The Zipf head (hyper-common
    bigrams) is exactly where AQE's skew split earns its keep at
    100 TB."""
    docs = table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.split("text", " ").alias("toks"))
    n = F.size("toks")
    bg = (t.select(
        "doc_id",
        F.explode(F.arrays_zip(
            F.slice("toks", 1, n - 1).alias("w1"),
            F.slice("toks", 2, n - 1).alias("w2"))).alias("z"))
        .select("doc_id", F.col("z.w1").alias("w1"),
                F.col("z.w2").alias("w2")))
    vocab = F.broadcast(
        t.select(F.explode("toks").alias("tok"))
        .agg(F.countDistinct("tok").alias("v")))
    bc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("bc"))
    pc = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("pc"))
    p = (F.col("bc") + F.lit(1.0)) / (F.col("pc") + F.col("v"))
    return (bg.join(bc, ["w1", "w2"]).join(pc, "w1").crossJoin(vocab)
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.round(-F.avg(F.log(p)), 6).alias("cross_entropy")))


@query(
    "line_dedup_rewrite",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    l AS (
        SELECT doc_id,
               unnest(range(0, (len(toks) + {LINE_TOKENS - 1})
                               // {LINE_TOKENS})) AS line_no,
               unnest(list_transform(
                   range(0, (len(toks) + {LINE_TOKENS - 1})
                            // {LINE_TOKENS}),
                   i -> array_to_string(
                            list_slice(toks, i * {LINE_TOKENS} + 1,
                                       i * {LINE_TOKENS} + {LINE_TOKENS}),
                            ' '))) AS line
        FROM t),
    k AS (
        SELECT doc_id, line_no, line,
               ROW_NUMBER() OVER (PARTITION BY md5(line)
                                  ORDER BY doc_id, line_no) AS rn
        FROM l)
    SELECT doc_id, COUNT(*) AS n_kept,
           string_agg(line, ' ' ORDER BY line_no) AS text_dedup
    FROM k WHERE rn = 1
    GROUP BY doc_id
    """,
)
def line_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REWRITE companion of line_dedup_spans: actually emit the
    deduplicated corpus — each document reassembled from only its
    surviving spans, in original span order.  (The audit query reports
    what WOULD survive; this one is the transform a curation pipeline
    writes back out.)  Documents whose every span is a duplicate drop
    out entirely, exactly like fully-boilerplate pages in web-scale
    line dedup.

    Same two-shuffle shape as the audit — window on the span hash,
    reduce on doc_id — plus the reassembly, which is columnar:
    ``array_sort(collect_list(struct(line_no, span)))`` restores span
    order per document WITHOUT an ORDER BY (no sort exchange; the sort
    is per-row over each doc's own spans), then ``array_join``
    concatenates.  Span text must ride this query's shuffles (it is
    the payload being rebuilt), so at 100 TB this costs corpus bytes —
    inherent to any rewrite — while the audit twin stays hash-only."""
    docs = table(spark, sf_dir, "documents")
    nl = F.expr(f"(size(toks) + {LINE_TOKENS - 1}) div {LINE_TOKENS}")
    span = F.concat_ws(
        " ", F.slice("toks", F.col("i") * LINE_TOKENS + 1, LINE_TOKENS))
    lines = (docs.select("doc_id", F.split("text", " ").alias("toks"))
             .select("doc_id", "toks",
                     F.explode(F.sequence(F.lit(0), nl - 1)).alias("i"))
             .select("doc_id", F.col("i").alias("line_no"),
                     span.alias("line")))
    w = Window.partitionBy(F.md5("line")).orderBy("doc_id", "line_no")
    kept = (lines.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1))
    ordered = F.array_sort(F.collect_list(F.struct("line_no", "line")))
    return (kept.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_kept"),
                 F.array_join(
                     F.transform(ordered, lambda x: x["line"]), " ")
                 .alias("text_dedup")))


@query(
    "token_pmi_top_pairs",
    oracle=f"""
    WITH dt0 AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents),
    ok AS (SELECT doc_id FROM dt0 GROUP BY doc_id
           HAVING COUNT(*) <= {MAX_PMI_DOC_TOKENS}),
    dt AS (SELECT dt0.* FROM dt0 JOIN ok USING (doc_id)),
    n AS (SELECT COUNT(*) AS n_docs FROM ok),
    df AS (SELECT tok, COUNT(*) AS c FROM dt GROUP BY tok),
    pairs AS (
        SELECT a.tok AS tok_a, b.tok AS tok_b, COUNT(*) AS c_ab
        FROM dt a JOIN dt b
          ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY a.tok, b.tok
        HAVING COUNT(*) >= 5)
    SELECT p.tok_a, p.tok_b, p.c_ab,
           ROUND(ln(1.0 * p.c_ab * n.n_docs / (da.c * db.c)), 6)
               + 0.0 AS pmi
    FROM pairs p
    JOIN df da ON p.tok_a = da.tok
    JOIN df db ON p.tok_b = db.tok
    CROSS JOIN n
    ORDER BY pmi DESC, tok_a ASC, tok_b ASC
    LIMIT 20
    """,
)
def token_pmi_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-20 token pairs by document-level PMI,
    PMI(a,b) = ln(c_ab·N / (c_a·c_b)) over document co-occurrence with
    a min-support cut — the statistic behind phrase detection
    (word2vec-style phrase merging) and topical-affinity audits.
    Complements bpe_merge_candidates, which only sees ADJACENT pairs;
    PMI sees co-occurrence anywhere in the document.

    Scale shape: the pair space is the dangerous part — it is generated
    by a self-join of the DISTINCT (doc, token) frame on doc_id, which
    is O(Σ tokens_per_doc²), not O(vocab²); the min-support HAVING cut
    runs inside the same aggregation (partial-agg before shuffle), and
    document frequencies join back onto the tiny surviving pair set.
    At 100 TB the standard mitigation — cap per-doc distinct tokens or
    pre-filter to a candidate vocabulary — slots in as one filter on
    ``dt`` without changing the plan."""
    docs = table(spark, sf_dir, "documents")
    dt0 = (docs.select("doc_id",
                       F.explode(F.split("text", " ")).alias("tok"))
           .distinct())
    ok = (dt0.groupBy("doc_id").agg(F.count(F.lit(1)).alias("ntok"))
          .filter(F.col("ntok") <= MAX_PMI_DOC_TOKENS)
          .select("doc_id"))
    dt = dt0.join(ok, "doc_id")
    n = F.broadcast(ok.agg(F.count(F.lit(1)).alias("n_docs")))
    df_ = dt.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    a, b = dt.alias("a"), dt.alias("b")
    pairs = (a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
                    & (F.col("a.tok") < F.col("b.tok")))
             .groupBy(F.col("a.tok").alias("tok_a"),
                      F.col("b.tok").alias("tok_b"))
             .agg(F.count(F.lit(1)).alias("c_ab"))
             .filter(F.col("c_ab") >= 5))
    da = df_.select(F.col("tok").alias("tok_a"), F.col("c").alias("ca"))
    db = df_.select(F.col("tok").alias("tok_b"), F.col("c").alias("cb"))
    pmi = F.log(F.lit(1.0) * F.col("c_ab") * F.col("n_docs")
                / (F.col("ca") * F.col("cb")))
    return (pairs.join(da, "tok_a").join(db, "tok_b").crossJoin(n)
            .select("tok_a", "tok_b", "c_ab",
                    (F.round(pmi, 6) + F.lit(0.0)).alias("pmi"))
            .orderBy(F.desc("pmi"), F.asc("tok_a"), F.asc("tok_b"))
            .limit(20))


#: BM25 parameters (Robertson/Sparck-Jones defaults) and the fixed
#: query — literals inlined identically into the Spark plan and the
#: DuckDB oracle so the scoring tree is bit-comparable.
BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("spark", "table", "scan")


@query(
    "bm25_retrieval_topk",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    stats AS (
        SELECT COUNT(*) AS n_docs, AVG(len(toks)) AS avg_len FROM t),
    tf AS (
        SELECT doc_id, tok, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
        WHERE tok IN {BM25_QUERY!r}
        GROUP BY doc_id, tok),
    df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    dl AS (SELECT doc_id, len(toks) AS dl FROM t),
    scored AS (
        SELECT tf.doc_id,
               SUM(ln(1.0 + (stats.n_docs - df.df + 0.5)
                            / (df.df + 0.5))
                   * (tf.tf * ({BM25_K1} + 1.0))
                   / (tf.tf + {BM25_K1}
                      * (1.0 - {BM25_B}
                         + {BM25_B} * dl.dl / stats.avg_len)))
                   AS score
        FROM tf
        JOIN df USING (tok)
        JOIN dl USING (doc_id)
        CROSS JOIN stats
        GROUP BY tf.doc_id)
    SELECT doc_id, ROUND(score, 6) AS bm25
    FROM scored
    ORDER BY score DESC, doc_id ASC
    LIMIT 20
    """,
)
def bm25_retrieval_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-text retrieval scoring: top-20 documents for a fixed query
    under BM25 (k1=1.2, b=0.75, the Robertson idf with +1 smoothing) —
    the lexical-search primitive that complements the embedding ANN
    family (hybrid retrieval = BM25 ∪ ANN, rank-fused downstream).

    Plan shape: the postings list is built by filtering the token
    explode TO THE QUERY TERMS before any aggregation — the filter
    lands map-side, so only matching (doc, term) rows ever shuffle; df
    and the corpus stats are tiny aggregates joined back broadcast.
    At 100 TB this is one scan + one postings-grain reduce per query
    batch; real deployments amortize further by scoring many queries
    in one pass (the query literal becomes a small broadcast table)."""
    return (_bm25_top20(spark, sf_dir)
            .select("doc_id", F.round("score", 6).alias("bm25")))


def _bm25_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared BM25 scoring core: top-20 with the UNROUNDED ``score``
    column, so downstream rank fusion orders on the same key the oracle
    does (round-3 ADVICE: ranking on the 6-decimal display value could
    flip two docs whose scores differ only past 1e-6)."""
    docs = table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.split("text", " ").alias("toks"))
    stats = F.broadcast(t.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size("toks")).alias("avg_len")))
    dl = t.select("doc_id", F.size("toks").alias("dl"))
    tf = (t.select("doc_id", F.explode("toks").alias("tok"))
          .filter(F.col("tok").isin(*BM25_QUERY))
          .groupBy("doc_id", "tok")
          .agg(F.count(F.lit(1)).alias("tf")))
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    denom = (F.col("tf") + BM25_K1
             * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avg_len")))
    term_score = idf * (F.col("tf") * (BM25_K1 + 1.0)) / denom
    return (tf.join(F.broadcast(df_), "tok").join(dl, "doc_id")
            .crossJoin(stats)
            .groupBy("doc_id")
            .agg(F.sum(term_score).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(20))


#: Reciprocal-rank-fusion constant (Cormack et al.'s k=60).
RRF_K = 60


@query(
    "rrf_fused_ranking",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    stats AS (
        SELECT COUNT(*) AS n_docs, AVG(len(toks)) AS avg_len FROM t),
    tf AS (
        SELECT doc_id, tok, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
        WHERE tok IN {BM25_QUERY!r}
        GROUP BY doc_id, tok),
    df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    dl AS (SELECT doc_id, len(toks) AS dl FROM t),
    bm_scored AS (
        SELECT tf.doc_id,
               SUM(ln(1.0 + (stats.n_docs - df.df + 0.5)
                            / (df.df + 0.5))
                   * (tf.tf * ({BM25_K1} + 1.0))
                   / (tf.tf + {BM25_K1}
                      * (1.0 - {BM25_B}
                         + {BM25_B} * dl.dl / stats.avg_len)))
                   AS score
        FROM tf JOIN df USING (tok) JOIN dl USING (doc_id)
        CROSS JOIN stats GROUP BY tf.doc_id),
    bm_top AS (
        SELECT doc_id, rnk AS bm25_rank FROM (
            SELECT doc_id, ROW_NUMBER() OVER (
                ORDER BY score DESC, doc_id ASC) AS rnk
            FROM bm_scored) WHERE rnk <= 20),
    q_scored AS (
        SELECT doc_id,
               least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.5
               + (CAST(len(list_distinct(toks)) AS DOUBLE)
                  / CAST(len(toks) AS DOUBLE)) * 0.3
               + (1.0 - CAST(len(list_filter(toks,
                             x -> x IN ('a', 'the'))) AS DOUBLE)
                      / CAST(len(toks) AS DOUBLE)) * 0.2 AS q
        FROM t),
    q_top AS (
        SELECT doc_id, rnk AS quality_rank FROM (
            SELECT doc_id, ROW_NUMBER() OVER (
                ORDER BY q DESC, doc_id ASC) AS rnk
            FROM q_scored) WHERE rnk <= 20),
    fused AS (
        SELECT COALESCE(b.doc_id, q.doc_id) AS doc_id,
               b.bm25_rank, q.quality_rank,
               COALESCE(1.0 / ({RRF_K} + b.bm25_rank), 0.0)
               + COALESCE(1.0 / ({RRF_K} + q.quality_rank), 0.0)
                   AS score
        FROM bm_top b FULL OUTER JOIN q_top q USING (doc_id))
    SELECT doc_id, bm25_rank, quality_rank,
           ROUND(score, 6) AS rrf_score
    FROM fused
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """,
)
def rrf_fused_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (k=60) of two retrieval signals — the
    BM25 lexical top-20 and the quality-score top-20 — into one
    reranked top-10: the standard hybrid-search combiner (lexical ∪
    semantic ∪ priors), chosen because rank fusion needs no score
    calibration between heterogeneous scorers.

    Scale discipline: BOTH input rankings are cut to top-k via
    sort+limit (TakeOrderedAndProject) BEFORE any window touches them,
    so the row_number that assigns ranks only ever sees k rows — the
    full corpus is never globally sorted.  The fusion itself is a
    full-outer join of two k-row frames: driver-trivial at any corpus
    size."""
    from etl_cloud_batch_processing_spark.functions.text import (
        quality_score,
    )

    docs = table(spark, sf_dir, "documents")
    bm20 = _bm25_top20(spark, sf_dir)   # top-20 with UNROUNDED score
    wb = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    bm_top = bm20.select("doc_id",
                         F.row_number().over(wb).alias("bm25_rank"))
    q20 = (docs.select("doc_id", quality_score("text").alias("q"))
           .orderBy(F.desc("q"), F.asc("doc_id")).limit(20))
    wq = Window.orderBy(F.desc("q"), F.asc("doc_id"))
    q_top = q20.select("doc_id",
                       F.row_number().over(wq).alias("quality_rank"))
    fused = (bm_top.join(q_top, "doc_id", "full_outer")
             .select("doc_id", "bm25_rank", "quality_rank",
                     (F.coalesce(F.lit(1.0)
                                 / (RRF_K + F.col("bm25_rank")),
                                 F.lit(0.0))
                      + F.coalesce(F.lit(1.0)
                                   / (RRF_K + F.col("quality_rank")),
                                   F.lit(0.0))).alias("score")))
    return (fused
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(10)
            .select("doc_id", "bm25_rank", "quality_rank",
                    F.round("score", 6).alias("rrf_score")))


@query(
    "vocab_growth_heaps_law",
    oracle="""
    WITH d AS (
        SELECT lang,
               CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
               CAST(len(list_distinct(string_split(text, ' ')))
                    AS DOUBLE) AS n_vocab
        FROM documents)
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(regr_slope(ln(n_vocab), ln(n_tok)), 6) + 0.0
               AS heaps_beta,
           ROUND(exp(regr_intercept(ln(n_vocab), ln(n_tok))), 6) + 0.0
               AS heaps_k,
           ROUND(regr_r2(ln(n_vocab), ln(n_tok)), 6) + 0.0 AS fit_r2
    FROM d GROUP BY lang
    """,
)
def vocab_growth_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit per language: V(N) ≈ K·N^β estimated by
    log-log regression of per-document distinct-token count on
    per-document token count.  β tells a tokenizer-training run how
    fast vocabulary grows with corpus size (natural text ≈ 0.4–0.6;
    near-1 flags id-like/garbage streams, near-0 flags template spam)
    — the corpus-level twin of `token_zipf_fit`'s frequency-rank law.

    One scan, one partial-aggregated groupBy: the regression moments
    (Σx, Σy, Σxy, Σx², n) combine map-side, so the shuffle carries 5
    langs × a handful of doubles no matter the corpus size.  The
    doc-scatter estimator deliberately avoids the cumulative-prefix
    form of Heaps' law, which would need a global running-distinct
    window (unpartitionable at 100 TB)."""
    docs = table(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        F.size(F.split("text", " ")).cast("double").alias("n_tok"),
        F.size(F.array_distinct(F.split("text", " ")))
         .cast("double").alias("n_vocab"))
    y, x = F.log("n_vocab"), F.log("n_tok")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.round(F.regr_slope(y, x), 6) + F.lit(0.0)).alias("heaps_beta"),
        (F.round(F.exp(F.regr_intercept(y, x)), 6) + F.lit(0.0))
        .alias("heaps_k"),
        (F.round(F.regr_r2(y, x), 6) + F.lit(0.0)).alias("fit_r2"))


@query(
    "weighted_sample_exponential",
    oracle="""
    WITH w AS (
        SELECT doc_id, lang, n_chars,
               ROUND(-ln((CAST(CAST('0x' || substr(md5(CAST(doc_id
                                                            AS VARCHAR)),
                                             1, 15) AS BIGINT) AS DOUBLE)
                          + 1.0) / 1152921504606846977.0)
                     / CAST(n_chars AS DOUBLE), 12) AS race_key
        FROM documents)
    SELECT doc_id, lang, n_chars, rnk FROM (
        SELECT doc_id, lang, n_chars,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY race_key, doc_id) AS rnk
        FROM w)
    WHERE rnk <= 5
    """,
)
def weighted_sample_exponential(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED sample per language: the
    Efraimidis–Spirakis exponential-race reservoir (keep the k items
    with the smallest ``-ln(u)/w``), with ``u`` derived from the md5 of
    the document id so both engines — and any two cluster runs — draw
    the identical sample.  Weight = ``n_chars``: longer documents are
    proportionally more likely to be kept, the standard size-biased
    draw for token-budgeted data mixes (a uniform doc sample
    under-represents long documents' tokens).

    Complements the uniform exact-k sampler (`hash_sample_per_lang`,
    same md5-race shape with w≡1) and the keep-rate sampler
    (`stratified_sample_by_lang`).  One window-shuffle on lang with the
    rank filter pushed as a per-group top-k; the race key is pure
    whole-stage-codegen arithmetic on a 60-bit hash — no RNG state, so
    the sample is reproducible under retries, re-partitioning, and
    speculative execution at any scale.  The race key is rounded to 12
    decimals before ranking (matching the repo's cross-engine ranking
    discipline): ln() is transcendental and Java's Math.log vs
    DuckDB's libm may differ in the last ulp, which an unrounded
    near-tie could turn into a different sample."""
    docs = table(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
               16, 10).cast("bigint")
    u = (h.cast("double") + F.lit(1.0)) / F.lit(1152921504606846977.0)
    race = F.round(-F.log(u) / F.col("n_chars").cast("double"), 12)
    w = Window.partitionBy("lang").orderBy(F.asc("race_key"),
                                           F.asc("doc_id"))
    return (docs.select("doc_id", "lang", "n_chars",
                        race.alias("race_key"))
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 5)
            .select("doc_id", "lang", "n_chars", "rnk"))


#: Skip-gram window radius for windowed PMI: tokens co-occur if their
#: positions differ by 1 or 2 (word2vec-style local context).
COOC_MAX_DIST = 2

#: Minimum co-occurrence events for a pair to be scored.
COOC_MIN_SUPPORT = 5


@query(
    "window_cooccurrence_pmi",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    p AS (
        SELECT doc_id, unnest(range(1, len(toks) + 1)) AS pos,
               unnest(toks) AS tok
        FROM t),
    ev AS (
        SELECT LEAST(l.tok, r.tok) AS tok_a,
               GREATEST(l.tok, r.tok) AS tok_b
        FROM p l
        JOIN (SELECT unnest(range(1, {COOC_MAX_DIST + 1})) AS off) o
          ON true
        JOIN p r ON r.doc_id = l.doc_id AND r.pos = l.pos + o.off),
    tot AS (SELECT SUM(len(toks)) AS tt,
                   SUM(GREATEST(len(toks) - 1, 0)
                       + GREATEST(len(toks) - 2, 0)) AS pp
            FROM t),
    uni AS (SELECT tok, COUNT(*) AS c FROM p GROUP BY tok),
    pairs AS (SELECT tok_a, tok_b, COUNT(*) AS c_ab FROM ev
              GROUP BY tok_a, tok_b
              HAVING COUNT(*) >= {COOC_MIN_SUPPORT})
    SELECT pr.tok_a, pr.tok_b, pr.c_ab,
           ROUND(ln(1.0 * pr.c_ab * tot.tt * tot.tt
                    / (1.0 * tot.pp * ua.c * ub.c)), 6) + 0.0 AS pmi
    FROM pairs pr
    JOIN uni ua ON pr.tok_a = ua.tok
    JOIN uni ub ON pr.tok_b = ub.tok
    CROSS JOIN tot
    ORDER BY pmi DESC, tok_a ASC, tok_b ASC
    LIMIT 20
    """,
)
def window_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed (skip-gram) PMI collocations: top-20 token pairs by
    pointwise mutual information over co-occurrence WITHIN ±2 positions
    — the word2vec-context association statistic.  Complements the two
    existing collocation views: ``bpe_merge_candidates`` sees only
    ADJACENT pairs, ``token_pmi_top_pairs`` sees whole-document
    co-occurrence (topical affinity); the position window in between is
    what phrase detectors actually train on.

    Scale shape — and the reason this is NOT the doc-level PMI join:
    pair events come from an EQUI-join of the position frame against
    itself on (doc_id, pos + offset) with offset exploded to {{1, 2}},
    so output is exactly ≤2 rows per token — LINEAR in corpus tokens,
    with no per-document quadratic blowup and therefore no need for the
    doc-size cap the document-level form carries.  Totals ride as a
    broadcast one-row frame; unigram counts join back onto the
    min-support survivors only."""
    docs = table(spark, sf_dir, "documents")
    p = (docs.select("doc_id",
                     F.posexplode(F.split("text", " "))
                     .alias("pos", "tok")))
    left = (p.select("doc_id", "pos", F.col("tok").alias("ltok"),
                     F.explode(F.sequence(F.lit(1),
                                          F.lit(COOC_MAX_DIST)))
                     .alias("off"))
            .select("doc_id", F.col("ltok"),
                    (F.col("pos") + F.col("off")).alias("rpos")))
    ev = (left.join(p.select("doc_id", F.col("pos").alias("rpos"),
                             F.col("tok").alias("rtok")),
                    ["doc_id", "rpos"])
          .select(F.least("ltok", "rtok").alias("tok_a"),
                  F.greatest("ltok", "rtok").alias("tok_b")))
    # Totals computed ANALYTICALLY from per-doc token counts (pair
    # events per doc = (n-1) + (n-2), clamped) — a tiny aggregate over
    # the doc frame instead of a second full pass over the exploded
    # pair-event frame (measured: the COUNT(ev) form re-ran the
    # explode+join pipeline twice).
    nl = F.size(F.split("text", " "))
    tot = F.broadcast(docs.agg(
        F.sum(nl).alias("tt"),
        F.sum(F.greatest(nl - 1, F.lit(0))
              + F.greatest(nl - 2, F.lit(0))).alias("pp")))
    uni = p.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    pairs = (ev.groupBy("tok_a", "tok_b")
             .agg(F.count(F.lit(1)).alias("c_ab"))
             .filter(F.col("c_ab") >= COOC_MIN_SUPPORT))
    ua = uni.select(F.col("tok").alias("tok_a"), F.col("c").alias("ca"))
    ub = uni.select(F.col("tok").alias("tok_b"), F.col("c").alias("cb"))
    pmi = F.log(F.lit(1.0) * F.col("c_ab") * F.col("tt") * F.col("tt")
                / (F.lit(1.0) * F.col("pp") * F.col("ca") * F.col("cb")))
    return (pairs.join(ua, "tok_a").join(ub, "tok_b").crossJoin(tot)
            .select("tok_a", "tok_b", "c_ab",
                    (F.round(pmi, 6) + F.lit(0.0)).alias("pmi"))
            .orderBy(F.desc("pmi"), F.asc("tok_a"), F.asc("tok_b"))
            .limit(20))


#: Token budget as a fraction of total corpus tokens for the mixture
#: allocation plan.
BUDGET_FRACTION = 0.2

_DUCK_QUALITY = """
        least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.5
        + (CAST(len(list_distinct(toks)) AS DOUBLE)
           / CAST(len(toks) AS DOUBLE)) * 0.3
        + (1.0 - CAST(len(list_filter(toks,
                      x -> x IN ('a', 'the'))) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE)) * 0.2
"""


@query(
    "weighted_token_budget_allocation",
    oracle=f"""
    WITH d AS (
        SELECT source, string_split(text, ' ') AS toks FROM documents),
    s AS (
        SELECT source,
               CAST(SUM(len(toks)) AS DOUBLE) AS avail,
               AVG({_DUCK_QUALITY}) AS w
        FROM d GROUP BY source),
    t AS (SELECT SUM(avail) AS tot_avail, SUM(w) AS wsum FROM s),
    r AS (
        SELECT s.*, t.wsum, {BUDGET_FRACTION} * t.tot_avail AS budget,
               s.avail / s.w AS ratio
        FROM s, t),
    f AS (
        SELECT *,
               COALESCE(SUM(avail) OVER win, 0.0) AS exc_avail,
               COALESCE(SUM(w) OVER win, 0.0) AS exc_w
        FROM r
        WINDOW win AS (ORDER BY ratio ASC, source ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING)),
    g AS (
        SELECT *,
               avail <= (budget - exc_avail) / (wsum - exc_w) * w
                   AS saturated
        FROM f),
    fin AS (
        SELECT SUM(CASE WHEN saturated THEN avail ELSE 0.0 END)
                   AS sat_avail,
               SUM(CASE WHEN saturated THEN 0.0 ELSE w END) AS unsat_w
        FROM g)
    SELECT g.source,
           CAST(g.avail AS BIGINT) AS avail_tokens,
           ROUND(g.w, 6) + 0.0 AS weight,
           g.saturated,
           ROUND(CASE WHEN g.saturated THEN g.avail
                      ELSE (g.budget - fin.sat_avail) / fin.unsat_w * g.w
                 END, 6) + 0.0 AS allocated_tokens,
           ROUND(CASE WHEN g.saturated THEN g.avail
                      ELSE (g.budget - fin.sat_avail) / fin.unsat_w * g.w
                 END / g.avail, 6) + 0.0 AS keep_rate
    FROM g, fin
    """,
)
def weighted_token_budget_allocation(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Mixture planning by WATERFILLING: split a global token budget
    (``BUDGET_FRACTION`` of the corpus) across sources proportionally
    to a per-source quality weight, capped at each source's
    availability, with the excess redistributed to the remaining
    sources — allocated_s = min(avail_s, λ·w_s) with λ solving
    Σ allocated = budget.  This is the planning step that produces the
    per-source keep-rates ``mixture_sampling`` then applies; capping at
    availability is what a plain proportional split gets wrong (it
    silently over-asks small high-quality sources and under-uses the
    budget).

    The saturation point is found closed-form, not iteratively:
    sources sorted by avail/w saturate in order, so a running
    (exclusive) prefix sum decides each source's side of the boundary
    and one conditional aggregate yields the final λ.  Scale shape:
    the ONLY corpus-scale work is the per-source token/quality
    aggregate (one scan, partial-agg); everything after runs on the
    source-grain frame — a config-scale dimension (tens to thousands
    of rows), which is why its unpartitioned window is acceptable
    where a user- or doc-grain one would not be (SCALE.md window
    rule)."""
    from etl_cloud_batch_processing_spark.functions.text import (
        quality_score,
    )

    docs = table(spark, sf_dir, "documents")
    per_src = (docs.select(
        "source",
        F.size(F.split("text", " ")).alias("n_tok"),
        quality_score("text").alias("q"))
        .groupBy("source")
        .agg(F.sum("n_tok").cast("double").alias("avail"),
             F.avg("q").alias("w")))
    tot = F.broadcast(per_src.agg(F.sum("avail").alias("tot_avail"),
                                  F.sum("w").alias("wsum")))
    r = (per_src.crossJoin(tot)
         .select("source", "avail", "w", "wsum",
                 (F.lit(BUDGET_FRACTION) * F.col("tot_avail"))
                 .alias("budget"),
                 (F.col("avail") / F.col("w")).alias("ratio")))
    win = (Window.orderBy(F.asc("ratio"), F.asc("source"))
           .rowsBetween(Window.unboundedPreceding, -1))
    g = r.select(
        "*",
        F.coalesce(F.sum("avail").over(win), F.lit(0.0)).alias("exc_avail"),
        F.coalesce(F.sum("w").over(win), F.lit(0.0)).alias("exc_w"))
    g = g.withColumn(
        "saturated",
        F.col("avail") <= (F.col("budget") - F.col("exc_avail"))
        / (F.col("wsum") - F.col("exc_w")) * F.col("w"))
    fin = F.broadcast(g.agg(
        F.sum(F.when(F.col("saturated"), F.col("avail"))
              .otherwise(F.lit(0.0))).alias("sat_avail"),
        F.sum(F.when(F.col("saturated"), F.lit(0.0))
              .otherwise(F.col("w"))).alias("unsat_w")))
    alloc = F.when(F.col("saturated"), F.col("avail")).otherwise(
        (F.col("budget") - F.col("sat_avail")) / F.col("unsat_w")
        * F.col("w"))
    return (g.crossJoin(fin)
            .select("source",
                    F.col("avail").cast("bigint").alias("avail_tokens"),
                    (F.round("w", 6) + F.lit(0.0)).alias("weight"),
                    "saturated",
                    (F.round(alloc, 6) + F.lit(0.0))
                    .alias("allocated_tokens"),
                    (F.round(alloc / F.col("avail"), 6) + F.lit(0.0))
                    .alias("keep_rate")))


# --------------------------------------------------------------------------
# NS4 — RAKE keyword extraction.
# --------------------------------------------------------------------------

#: Keyword phrases reported by the RAKE extractor.
RAKE_TOP_K = 20

#: Stopword list interpolated into the RAKE oracle — the SAME constant
#: the Spark side reads (functions/text.py STOPWORDS), so the two
#: segmentations cannot drift.
_RAKE_STOPS = ", ".join(repr(w) for w in T.STOPWORDS)


@query(
    "keyword_rake_top_phrases",
    oracle=f"""
    WITH split AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    raw AS (
        SELECT doc_id,
               unnest(range(1, len(toks) + 1)) AS pos,
               unnest(toks) AS token
        FROM split),
    tok AS (
        SELECT doc_id, pos, token,
               CASE WHEN token IN ({_RAKE_STOPS}) THEN 1 ELSE 0 END
                   AS is_stop
        FROM raw),
    seg AS (
        SELECT doc_id, pos, token, is_stop,
               SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS phrase_id
        FROM tok),
    members AS (SELECT doc_id, phrase_id, pos, token
                FROM seg WHERE is_stop = 0),
    phrases AS (
        SELECT doc_id, phrase_id,
               string_agg(token, ' ' ORDER BY pos) AS phrase,
               CAST(COUNT(*) AS BIGINT) AS plen
        FROM members GROUP BY doc_id, phrase_id),
    wstat AS (
        SELECT m.token, CAST(COUNT(*) AS BIGINT) AS freq,
               SUM(p.plen) AS deg
        FROM members m
        JOIN phrases p USING (doc_id, phrase_id)
        GROUP BY m.token),
    pscore AS (
        SELECT m.doc_id, m.phrase_id,
               ROUND(SUM(ROUND(w.deg * 1.0 / w.freq, 6)), 6) AS score
        FROM members m JOIN wstat w USING (token)
        GROUP BY m.doc_id, m.phrase_id),
    agg AS (
        SELECT p.phrase, MAX(p.plen) AS n_words,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               MAX(s.score) AS rake_score
        FROM phrases p JOIN pscore s USING (doc_id, phrase_id)
        GROUP BY p.phrase)
    SELECT phrase, n_words, n_occurrences, rake_score + 0.0 AS rake_score,
           CAST(ROW_NUMBER() OVER (ORDER BY rake_score DESC, phrase ASC)
                AS INTEGER) AS rnk
    FROM agg
    ORDER BY rake_score DESC, phrase ASC
    LIMIT {RAKE_TOP_K}
    """,
)
def keyword_rake_top_phrases(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """RAKE keyword extraction over the corpus (Rose et al. 2010):
    candidate phrases are maximal stopword-free token runs; each word
    scores deg/freq (deg = Σ length of phrases containing it, freq =
    occurrence count); a phrase scores the sum of its words' scores.
    Top-{RAKE_TOP_K} phrases corpus-wide with occurrence counts — the
    unsupervised keyphrase surface for corpus topic audits and search
    facet seeding, built on the same stopword list as the quality
    score (functions/text.py STOPWORDS).

    Scale shape: ONE posexplode scan; phrase segmentation is a
    cumulative-sum window PARTITIONED BY doc (the line_dedup_spans
    discipline — per-doc sort, never global); word stats and phrase
    scores are partial-aggregated equi-joins on token / (doc, phrase)
    keys; the final rank is TopK over the distinct-phrase frame.  deg
    and freq are exact BIGINTs; word scores round before the phrase
    sum, the sum rounds before the rank (round-before-rank rule), and
    identical phrases collapse via MAX of their per-instance rounded
    scores (equal at the rounding grain)."""
    docs = ptable(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.posexplode(T.tokens("text")).alias("pos0", "token"))
    seg = tok.select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), "token",
        F.when(F.col("token").isin(*T.STOPWORDS), 1).otherwise(0)
        .alias("is_stop"))
    w = (Window.partitionBy("doc_id").orderBy("pos")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    seg = seg.withColumn("phrase_id", F.sum("is_stop").over(w))
    members = (seg.filter(F.col("is_stop") == 0)
               .select("doc_id", "phrase_id", "pos", "token")
               # three readers (phrase texts, word stats, phrase
               # scores): run the explode + segmentation window once.
               .persist())
    phrases = (members.groupBy("doc_id", "phrase_id")
               .agg(F.concat_ws(
                        " ",
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("pos", "token"))),
                            lambda s: s["token"])).alias("phrase"),
                    F.count(F.lit(1)).alias("plen")))
    wstat = (members.join(phrases, ["doc_id", "phrase_id"])
             .groupBy("token")
             .agg(F.count(F.lit(1)).alias("freq"),
                  F.sum("plen").alias("deg")))
    pscore = (members.join(wstat, "token")
              .groupBy("doc_id", "phrase_id")
              .agg(F.round(F.sum(F.round(
                  F.col("deg") * 1.0 / F.col("freq"), 6)), 6)
                  .alias("score")))
    agg = (phrases.join(pscore, ["doc_id", "phrase_id"])
           .groupBy("phrase")
           .agg(F.max("plen").alias("n_words"),
                F.count(F.lit(1)).alias("n_occurrences"),
                F.max("score").alias("rake_score")))
    # Top-k FIRST via sort+limit (TakeOrderedAndProject — never a
    # global window over the full phrase frame), then the rank label
    # is a window over only the k survivors.
    top = (agg.select("phrase", "n_words", "n_occurrences",
                      (F.col("rake_score") + F.lit(0.0))
                      .alias("rake_score"))
           .orderBy(F.desc("rake_score"), F.asc("phrase"))
           .limit(RAKE_TOP_K))
    rnk = Window.orderBy(F.desc("rake_score"), F.asc("phrase"))
    return top.withColumn("rnk", F.row_number().over(rnk))


#: Postings report size.
POSTINGS_TOP_K = 20


@query(
    "postings_index_stats",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents),
    post AS (
        SELECT token,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq,
               CAST(COUNT(*) AS BIGINT) AS coll_freq,
               CAST(MIN(doc_id) AS BIGINT) AS min_doc,
               CAST(MAX(doc_id) AS BIGINT) AS max_doc
        FROM t GROUP BY token)
    SELECT token, doc_freq, coll_freq, min_doc, max_doc,
           CASE WHEN doc_freq <= 1 THEN NULL
                ELSE ROUND((max_doc - min_doc) * 1.0 / (doc_freq - 1),
                           6) + 0.0 END AS avg_docid_gap
    FROM post
    ORDER BY doc_freq DESC, token ASC
    LIMIT {POSTINGS_TOP_K}
    """,
)
def postings_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build statistics: per token (top-20 by document
    frequency — POSTINGS_TOP_K — token-tiebroken), the posting-list length
    (doc_freq), total occurrences (coll_freq), the docid span, and the
    mean docid gap — the numbers that size a postings layout before
    building it (gap magnitude drives delta-encoding cost; df vs cf
    separates stopword-like from bursty terms and is the same split
    BM25's idf/tf terms consume).

    One explode feeds ONE aggregation at token grain — doc_freq is a
    COUNT(DISTINCT doc_id) inside that group (per-group distinct, not
    a corpus Expand) — and the report is TakeOrderedAndProject.  At
    100 TB this is the mandatory dry-run before ``bm25_retrieval_topk``
    materializes an index; single-posting tokens get a NULL gap on
    both engines."""
    t = (ptable(spark, sf_dir, "documents")
         .select("doc_id", F.explode(T.tokens("text")).alias("token")))
    post = (t.groupBy("token")
            .agg(F.count_distinct("doc_id").cast("bigint")
                 .alias("doc_freq"),
                 F.count(F.lit(1)).cast("bigint").alias("coll_freq"),
                 F.min("doc_id").cast("bigint").alias("min_doc"),
                 F.max("doc_id").cast("bigint").alias("max_doc")))
    gap = F.when(F.col("doc_freq") <= 1, F.lit(None).cast("double")) \
           .otherwise(F.round((F.col("max_doc") - F.col("min_doc")) * 1.0
                              / (F.col("doc_freq") - 1), 6) + F.lit(0.0))
    return (post.select("token", "doc_freq", "coll_freq", "min_doc",
                        "max_doc", gap.alias("avg_docid_gap"))
            .orderBy(F.desc("doc_freq"), F.asc("token"))
            .limit(POSTINGS_TOP_K))


# ---------------------------------------------------------------------------
# Design-based estimation from a deterministic sample: stratified
# Bernoulli sampling + the Horvitz-Thompson estimator with its exact
# variance audit.  The 100-TB pattern this encodes: run the expensive
# audit on a p% hash-sample, extrapolate with a statistical guarantee
# instead of a shrug.  Sampling rates divide 100 so every HT weight is
# an integer and the estimate itself is an exact BIGINT — the only
# doubles are the variance/bound arithmetic, and sqrt is IEEE
# correctly-rounded (identical across engines), so the whole report
# hash-checks.
# ---------------------------------------------------------------------------
_HT_RATES = {"click": 10, "error": 20, "purchase": 50, "signup": 10,
             "view": 10}  # percent, each dividing 100


@query(
    "ht_sampled_total_estimate",
    oracle=f"""
    WITH rates AS (
        SELECT unnest(['click','error','purchase','signup','view'])
                   AS event_type,
               unnest([10, 20, 50, 10, 10]) AS rate_pct),
    base AS (
        SELECT e.event_type,
               CAST(ROUND(e.value * 100) AS BIGINT) AS y,
               r.rate_pct,
               CAST('0x' || substr(md5(CAST(e.event_id AS VARCHAR)), 1, 15)
                    AS BIGINT) % 100 < r.rate_pct AS sampled
        FROM events e JOIN rates r ON r.event_type = e.event_type),
    agg AS (
        SELECT event_type, rate_pct,
               CAST(COUNT(*) AS BIGINT) AS n_pop,
               CAST(SUM(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_sampled,
               CAST(SUM(y) AS BIGINT) AS exact_cents,
               CAST(SUM(CASE WHEN sampled
                             THEN y * (100 // rate_pct) ELSE 0 END)
                    AS BIGINT) AS ht_estimate_cents,
               CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS sum_y2
        FROM base GROUP BY 1, 2)
    SELECT event_type, n_pop, n_sampled, rate_pct, exact_cents,
           ht_estimate_cents,
           ht_estimate_cents - exact_cents AS err_cents,
           ROUND(sqrt(sum_y2 * (100.0 - rate_pct) / rate_pct), 2) + 0.0
               AS se_cents,
           ABS(CAST(ht_estimate_cents - exact_cents AS DOUBLE))
               <= 3.0 * sqrt(sum_y2 * (100.0 - rate_pct) / rate_pct)
               AS within_bound
    FROM agg
    ORDER BY event_type
    """,
)
def ht_sampled_total_estimate(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Horvitz-Thompson estimation of total revenue-cents per event
    type from a stratified deterministic Bernoulli hash-sample
    (per-type rates 10-50%, md5-bucketed on event_id so the sample is
    seedless and reproducible): the HT estimate Σ y/π next to the
    exact total, the estimator's EXACT standard error
    sqrt(Σ y²(1−π)/π), and the executed ±3σ envelope — the
    design-based guarantee that turns "we audited a 10% sample" into a
    defensible population statement.

    Every HT weight is an integer (rates divide 100), so the estimate
    is an exact BIGINT sum; the variance needs one extra exact moment
    (Σy², accumulated as DECIMAL(38,0)/HUGEINT — order-independent —
    and cast to DOUBLE once after the sum) and sqrt
    is IEEE-exact, so the whole report value-hash-checks.  At 100 TB
    the sample-side audit touches rate% of the data; THIS query's
    exact twin exists to certify the estimator once per pipeline
    change — production then trusts the bound and never scans the
    full corpus.  One partial-aggregated pass computes population,
    sample, and moments together (the sampled flag is a column, not a
    filter, so no second scan)."""
    ev = table(spark, sf_dir, "events")
    rate = F.create_map(*[F.lit(x) for kv in _HT_RATES.items()
                          for x in kv])[F.col("event_type")]
    h = (F.conv(F.substring(
        F.md5(F.col("event_id").cast("string").cast("binary")), 1, 15),
        16, 10).cast("bigint") % 100)
    base = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("y"),
        rate.alias("rate_pct"),
        (h < rate).alias("sampled"))
    agg = base.groupBy("event_type", "rate_pct").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pop"),
        F.sum(F.when(F.col("sampled"), 1).otherwise(0)).cast("bigint")
        .alias("n_sampled"),
        F.sum("y").cast("bigint").alias("exact_cents"),
        F.sum(F.when(F.col("sampled"),
                     F.col("y") * F.expr("100 DIV rate_pct"))
              .otherwise(0)).cast("bigint").alias("ht_estimate_cents"),
        # second moment accumulated EXACTLY (DECIMAL(38,0) ≡ DuckDB's
        # HUGEINT), cast to DOUBLE once after the sum: a DOUBLE
        # accumulator is addition-order-dependent past 2^53, and Spark
        # and DuckDB aggregate in different orders, so the hash check
        # would flake at larger scale factors
        F.sum(F.col("y").cast("decimal(19,0)") * F.col("y"))
        .cast("double").alias("sum_y2"))
    se = F.sqrt(F.col("sum_y2") * (F.lit(100.0) - F.col("rate_pct"))
                / F.col("rate_pct"))
    return (agg.select(
        "event_type", "n_pop", "n_sampled", "rate_pct", "exact_cents",
        "ht_estimate_cents",
        (F.col("ht_estimate_cents") - F.col("exact_cents"))
        .alias("err_cents"),
        (F.round(se, 2) + F.lit(0.0)).alias("se_cents"),
        (F.abs((F.col("ht_estimate_cents") - F.col("exact_cents"))
               .cast("double")) <= 3.0 * se).alias("within_bound"))
        .orderBy("event_type"))


# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Poisson bootstrap (Hanley & MacGibbon 2006; the online-bootstrap form
# used at web scale): every row draws an independent Poisson(1) weight
# per replica, so resampling never needs to know n up front and runs as
# ONE pass with replica as an exploded column.  Per-replica uniforms
# come from ONE md5 per row pushed through the same universal-hash
# family as the MinHash/CMS operators ((a_r*h + b_r) mod P mod 1e6 with
# md5-derived literal constants) — the first draft md5-hashed every
# (row, replica) pair and the 32x soak priced that at 102 s (string
# hashing 32x per row); the universal-hash form does integer arithmetic
# per replica instead.  The Poisson(1) inverse CDF is inlined as
# INTEGER thresholds (scaled 1e6) — no libm in the weight path, so the
# replica totals are exact BIGINTs and the whole report hash-checks.
# ---------------------------------------------------------------------------
_BOOT_M = 32
_BOOT_CUM = [367879, 735758, 919698, 981011, 996340, 999405, 999916,
             999989]  # floor(1e6 * P(Poisson(1) <= k)), k = 0..7
_BOOT_P = 4294967311          # prime > 2^32, shared with the MinHash family
_BOOT_H32 = 4294967296
_BOOT_A = []
_BOOT_B = []
for _r in range(_BOOT_M):
    import hashlib as _hl
    _BOOT_A.append(1 + int(_hl.md5(f"boot_a{_r}".encode())
                           .hexdigest()[:15], 16) % ((1 << 30) - 1))
    _BOOT_B.append(int(_hl.md5(f"boot_b{_r}".encode())
                       .hexdigest()[:15], 16) % (1 << 30))


def _boot_w_sql(h6: str) -> str:
    branches = " ".join(
        f"WHEN {h6} >= {c} THEN {len(_BOOT_CUM) - i}"
        for i, c in enumerate(reversed(_BOOT_CUM)))
    return f"(CASE {branches} ELSE 0 END)"


def _boot_u_sql(h32: str, r: int) -> str:
    return f"((({_BOOT_A[r]} * {h32} + {_BOOT_B[r]}) % {_BOOT_P}) % 1000000)"


@query(
    "bootstrap_se_poisson_replicas",
    oracle=f"""
    WITH h AS (
        SELECT event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS y,
               CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)
                    AS BIGINT) % {_BOOT_H32} AS h32
        FROM events),
    w AS (
        SELECT event_type, y, r.rep,
               {_boot_w_sql(f"(([{', '.join(_boot_u_sql('h32', r) for r in range(_BOOT_M))}])[r.rep + 1])")}
                   AS wt
        FROM h CROSS JOIN (SELECT unnest(range(0, {_BOOT_M})) AS rep) r),
    totals AS (
        SELECT event_type, rep, CAST(SUM(wt * y) AS BIGINT) AS t
        FROM w GROUP BY 1, 2),
    mom AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(t) AS BIGINT) AS st,
               CAST(SUM(CAST(t AS HUGEINT) * t) AS DOUBLE) AS st2
        FROM totals GROUP BY 1),
    an AS (
        SELECT event_type,
               CAST(SUM(CAST(ROUND(value * 100) AS HUGEINT)
                        * CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
                   AS sum_y2
        FROM events GROUP BY 1)
    SELECT m.event_type, m.m AS n_replicas,
           ROUND(sqrt((m.st2 - CAST(m.st AS DOUBLE) * m.st / m.m)
                      / (m.m - 1)), 2) + 0.0 AS boot_se_cents,
           ROUND(sqrt(a.sum_y2), 2) + 0.0 AS analytic_se_cents,
           ROUND(sqrt((m.st2 - CAST(m.st AS DOUBLE) * m.st / m.m)
                      / (m.m - 1)) / sqrt(a.sum_y2), 4) + 0.0
               AS se_ratio,
           sqrt((m.st2 - CAST(m.st AS DOUBLE) * m.st / m.m) / (m.m - 1))
               >= 0.55 * sqrt(a.sum_y2)
           AND sqrt((m.st2 - CAST(m.st AS DOUBLE) * m.st / m.m)
                    / (m.m - 1)) <= 1.65 * sqrt(a.sum_y2)
               AS within_bound
    FROM mom m JOIN an a ON a.event_type = m.event_type
    ORDER BY m.event_type
    """,
)
def bootstrap_se_poisson_replicas(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Poisson-bootstrap standard error of each event type's total
    revenue-cents from 32 deterministic replicas, audited against the
    analytic truth: under Poisson(1) weights Var(total) = Σy² exactly,
    so the replica-spread SE must land near sqrt(Σy²) — the executed
    `within_bound` column asserts the ratio inside [0.55, 1.65], the
    ±3σ band for an SE estimated from 32 replicas (SD of an SE ≈
    1/sqrt(2(m−1)) ≈ 12.7%).

    This is the uncertainty-quantification pattern that scales: NO
    resampling pass per replica — each row hashes ONCE (md5 → h32) and
    every replica's uniform is a universal-hash transform of that h32
    with inlined literal constants (integer multiply-mod, the same
    family the MinHash/CMS operators use; the naive one-md5-per-
    (row, replica) form measured 102 s at the 32× soak, this one 9.9 s),
    the weight is an integer-threshold inverse-CDF lookup, and one
    partial-aggregated groupBy yields all 32 replica totals together —
    exact BIGINTs.  The replica-moment combination runs in DOUBLE with
    the oracle written term-for-term identical ((Σt)² overflows int64
    at the 32× soak).  At 100 TB the ×32 row expansion is the honest
    price of 32 bootstrap replicas — amortized to one shuffle of
    (type, rep)-grain partials, not 32 corpus passes."""
    ev = table(spark, sf_dir, "events")
    h32 = (F.conv(F.substring(
        F.md5(F.col("event_id").cast("string").cast("binary")), 1, 15),
        16, 10).cast("bigint") % F.lit(_BOOT_H32))
    us = F.array(*[
        ((F.lit(_BOOT_A[r]) * F.col("h32") + F.lit(_BOOT_B[r]))
         % F.lit(_BOOT_P)) % F.lit(1000000) for r in range(_BOOT_M)])
    w = (ev.select("event_type",
                   F.round(F.col("value") * 100).cast("bigint").alias("y"),
                   h32.alias("h32"))
         .select("event_type", "y", F.posexplode(us).alias("rep", "u"))
         .withColumn("wt", F.expr(_boot_w_sql("u"))))
    totals = (w.groupBy("event_type", "rep")
              .agg(F.sum(F.col("wt") * F.col("y")).cast("bigint")
                   .alias("t")))
    # both second moments accumulate EXACTLY as DECIMAL(38,0) (DuckDB:
    # HUGEINT) and cast to DOUBLE once after the sum — a DOUBLE
    # accumulator past 2^53 is addition-order-dependent, and the two
    # engines aggregate in different orders
    mom = totals.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("t").cast("bigint").alias("st"),
        F.sum(F.col("t").cast("decimal(19,0)") * F.col("t"))
        .cast("double").alias("st2"))
    an = ev.groupBy("event_type").agg(
        F.sum(F.round(F.col("value") * 100).cast("decimal(19,0)")
              * F.round(F.col("value") * 100).cast("bigint"))
        .cast("double").alias("sum_y2"))
    boot_var = ((F.col("st2") - F.col("st").cast("double") * F.col("st")
                 / F.col("m")) / (F.col("m") - 1))
    boot_se = F.sqrt(boot_var)
    an_se = F.sqrt(F.col("sum_y2"))
    return (mom.join(an, "event_type")
            .select("event_type", F.col("m").alias("n_replicas"),
                    (F.round(boot_se, 2) + F.lit(0.0))
                    .alias("boot_se_cents"),
                    (F.round(an_se, 2) + F.lit(0.0))
                    .alias("analytic_se_cents"),
                    (F.round(boot_se / an_se, 4) + F.lit(0.0))
                    .alias("se_ratio"),
                    ((boot_se >= 0.55 * an_se)
                     & (boot_se <= 1.65 * an_se)).alias("within_bound"))
            .orderBy("event_type"))
