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
