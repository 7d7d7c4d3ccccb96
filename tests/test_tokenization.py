"""Round-7 tokenization family: BPE train/encode and the
longest-duplicated-span ladder (plans/tokenization.py)."""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_cloud_batch_processing_spark.plans.tokenization import (
    BPE_ROUNDS,
    SPAN_LENGTHS,
    apply_bpe_merge,
    bpe_encode_token_counts,
    bpe_rounds,
    bpe_train_merges,
    max_duplicate_span_lengths,
)


def greedy_merge_ref(toks: list[str], a: str, b: str) -> list[str]:
    """Reference greedy left-to-right non-overlapping pair merge."""
    out: list[str] = []
    i = 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
            out.append(a + " " + b)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


_tok = st.sampled_from(["a", "b", "c", "ab"])


@given(st.lists(st.tuples(st.lists(_tok, min_size=0, max_size=12),
                          _tok, _tok),
                min_size=1, max_size=8))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_apply_bpe_merge_matches_greedy_reference(spark, cases):
    """The F.aggregate fold IS the greedy non-overlapping scan, for
    arbitrary token arrays and rules (incl. a == b runs and rules whose
    merged symbol collides with an existing token)."""
    df = spark.createDataFrame(
        [(i, toks, a, b) for i, (toks, a, b) in enumerate(cases)],
        "id int, toks array<string>, a string, b string")
    got = {r["id"]: r["m"] for r in df.select(
        "id", apply_bpe_merge(F.col("toks"), F.col("a"), F.col("b"))
        .alias("m")).collect()}
    for i, (toks, a, b) in enumerate(cases):
        assert got[i] == greedy_merge_ref(toks, a, b), (toks, a, b)


def test_spark_fold_matches_duckdb_replace_twin(spark):
    """The oracle's |a||b| string-replace round is byte-equivalent to
    the Spark fold on adversarial runs (back-to-back merges must not
    consume the shared delimiter)."""
    cases = [["a", "a", "a"], ["a", "a", "a", "a"],
             ["a", "b", "a", "b"], ["x", "a", "b", "b"], ["b"],
             ["a", "a", "b", "a", "a"]]
    con = duckdb.connect()
    for toks in cases:
        for a, b in (("a", "a"), ("a", "b"), ("b", "a")):
            s = "|" + "||".join(toks) + "|"
            dd = con.execute(
                "SELECT string_split(substr(r, 2, length(r) - 2), '||') "
                "FROM (SELECT replace(?, ?, ?) AS r)",
                [s, f"|{a}||{b}|", f"|{a} {b}|"]).fetchone()[0]
            assert dd == greedy_merge_ref(toks, a, b), (toks, a, b)


def test_bpe_encode_conservation_and_merge_table(spark, sf_dir):
    """Encode bookkeeping: after-counts equal before minus merges
    fired; every merge round strictly helps on the round it trained
    (n_occurrences >= 1); merge table is exactly BPE_ROUNDS rows with
    non-increasing... no — counts are per-round corpora, so only
    positivity and shape are invariant."""
    enc = bpe_encode_token_counts(spark, sf_dir).collect()
    assert len(enc) > 0
    for r in enc:
        assert r["n_tokens_after"] + r["n_merges_applied"] \
            == r["n_tokens_before"]
        assert 0 < r["n_tokens_after"] <= r["n_tokens_before"]
    merges = bpe_train_merges(spark, sf_dir).collect()
    assert [m["round"] for m in merges] == list(range(1, BPE_ROUNDS + 1))
    assert all(m["n_occurrences"] >= 1 for m in merges)
    # corpus-wide: total merges fired >= 0 and someone merged (the
    # round-1 argmax pair occurs in at least one doc)
    assert sum(r["n_merges_applied"] for r in enc) >= merges[0][
        "n_occurrences"] // 2  # each firing consumes >= 1 occurrence


def test_bpe_round2_can_use_merged_symbols(spark, sf_dir):
    """Training rounds see the re-tokenized corpus: round-2+ pair
    counts must be computed AFTER round 1's merge (if they were
    computed on the raw corpus, the top pair would repeat).  Distinct
    (left, right) pairs across rounds prove the corpus advanced."""
    merges = bpe_train_merges(spark, sf_dir).collect()
    pairs = [(m["left_sym"], m["right_sym"]) for m in merges]
    assert len(set(pairs)) == len(pairs)


def test_max_dup_span_monotonicity_and_oracle_ladder(spark, sf_dir):
    """If a doc has a duplicated span at L, its leading (L/2)-window
    is duplicated too — so max_dup_span_len is exactly the top rung of
    a monotone ladder, and every reported value is a probed length or
    0."""
    rows = max_duplicate_span_lengths(spark, sf_dir).collect()
    assert len(rows) > 0
    allowed = set(SPAN_LENGTHS) | {0}
    for r in rows:
        assert r["max_dup_span_len"] in allowed
        assert (r["n_dup_spans_at_max"] > 0) == (r["max_dup_span_len"] > 0)


def test_corpus_is_delimiter_clean(spark, sf_dir):
    """The BPE oracle encodes token arrays as |tok||tok| strings and
    keys pairs by chr(9); both are only sound while corpus text is
    free of '|' and tabs.  Assert the precondition the module
    docstring states."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bad = docs.filter(F.col("text").contains("|")
                      | F.col("text").contains("\t")).count()
    assert bad == 0


def test_bpe_rounds_returns_persisted_frames(spark, sf_dir):
    """Each round's token frame is persisted (the 2^k lineage
    memoization the docstring promises)."""
    toks0, toksk, _ = bpe_rounds(spark, sf_dir)
    assert toks0.storageLevel.useMemory
    assert toksk.storageLevel.useMemory


def test_apply_bpe_merge_with_multiword_symbol_sides(spark):
    """From round 2 on, merge-rule sides are themselves space-joined
    merged symbols; the fold must treat them as atomic tokens."""
    cases = [
        (["a b", "c", "a b", "c"], "a b", "c"),      # merged left side
        (["x", "a b", "a b"], "a b", "a b"),          # both sides merged
        (["a", "b c", "a", "b c"], "a", "b c"),       # merged right side
        (["a b", "a b", "a b"], "a b", "a b"),        # run of merged syms
    ]
    df = spark.createDataFrame(
        [(i, t, a, b) for i, (t, a, b) in enumerate(cases)],
        "id int, toks array<string>, a string, b string")
    got = {r["id"]: r["m"] for r in df.select(
        "id", apply_bpe_merge(F.col("toks"), F.col("a"), F.col("b"))
        .alias("m")).collect()}
    for i, (toks, a, b) in enumerate(cases):
        assert got[i] == greedy_merge_ref(toks, a, b), (toks, a, b)


def test_bpe_k16_prefix_matches_unrolled_k4(spark, sf_dir):
    """Greedy BPE is history-deterministic: the first 4 merges of the
    16-round runner-trained table must equal the unrolled 4-round
    table exactly (rule sides AND counts)."""
    from etl_cloud_batch_processing_spark.plans.tokenization import (
        BPE_ROUNDS,
        bpe_rounds,
        bpe_train_converged,
    )

    _, _, unrolled = bpe_rounds(spark, sf_dir)
    merges, _, res = bpe_train_converged(spark, sf_dir, 16)
    k16 = sorted(tuple(r) for r in merges.collect())
    assert len(k16) == 16
    assert res.rounds == 16 and not res.converged  # budget cut, no dry-up
    k4 = sorted(tuple(r) for r in unrolled.collect())
    assert k16[:BPE_ROUNDS] == k4


def test_bpe_converged_stops_when_corpus_dries_up(spark):
    """A corpus whose only repeated pair fuses in round 1 must stop the
    trainer early: one rule emitted, runner flagged converged.  The
    round-13 lookahead metric sees the dried-up pair table the moment
    round 1's frame exists, so the trainer stops WITHOUT paying the
    former no-op confirmation round (rounds == 1, was == 2)."""
    from etl_cloud_batch_processing_spark.plans.tokenization import (
        _bpe_converged,
    )

    rows = [(1, ["a", "b"]), (2, ["a", "b"]), (3, ["c", "d"])]
    toks0 = spark.createDataFrame(
        rows, "doc_id bigint, toks array<string>").persist()
    toks0.count()
    merges, final, res = _bpe_converged(spark, toks0, 16, 4)
    got = [tuple(r) for r in merges.collect()]
    assert got == [(1, "a", "b", 2)]
    assert res.converged and res.rounds == 1  # lookahead: n=1 seen in r1
    toks = {r["doc_id"]: r["toks"] for r in final.collect()}
    assert toks[1] == ["a b"] and toks[2] == ["a b"]
    assert toks[3] == ["c", "d"]
    toks0.unpersist()


def test_bpe_k16_encode_applies_all_rules_in_order(spark, sf_dir):
    """The runner's final token frame must equal re-applying the 16
    learned rules in round order to the raw corpus (fold-chain
    equivalence — the encode contract bpe_encode_token_counts relies
    on at k=4)."""
    from etl_cloud_batch_processing_spark.functions import text as T
    from etl_cloud_batch_processing_spark.plans.registry import ptable
    from etl_cloud_batch_processing_spark.plans.tokenization import (
        apply_bpe_merge,
        bpe_train_converged,
    )

    merges, final, _ = bpe_train_converged(spark, sf_dir, 16)
    rules = [(r["left_sym"], r["right_sym"])
             for r in merges.orderBy("round").collect()]
    cur = (ptable(spark, sf_dir, "documents")
           .select("doc_id", T.tokens("text").alias("toks")))
    for a, b in rules:
        cur = cur.select("doc_id", apply_bpe_merge(
            F.col("toks"), F.lit(a), F.lit(b)).alias("toks"))
    want = {r["doc_id"]: r["toks"] for r in cur.collect()}
    got = {r["doc_id"]: r["toks"] for r in final.collect()}
    assert got == want
