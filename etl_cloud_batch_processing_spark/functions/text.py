"""Text-analysis column expressions for the documents pipeline.

Everything is built-in ``pyspark.sql.functions`` — tokenization, token
stats, quality scoring, fingerprinting all run JVM-side.  Each helper
has an exact DuckDB-SQL twin used by the oracle queries in
``plans/llm.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword list for quality scoring: the fixture vocabulary's function
# words.  Deliberately tiny and explicit so the oracle SQL can inline it.
STOPWORDS = ("a", "the")


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization of already-normalized text."""
    return F.split(F.col(text) if isinstance(text, str) else text, " ")


# Word-trigram shingles — shared by the MinHash/Jaccard dedup family
# (operators/dedup.py) and the cross-doc duplication gate
# (plans/corpus.py), so every gate agrees on what a "shingle" is.
# Lives here (not in operators/) because the operators package imports
# the plans registry: module-level oracle SQL in plans/ referencing
# these from operators/ would hit a partially-initialized module when a
# Python worker unpickles a UDF (worker import order is operators →
# registry → plans → corpus).
D_TOKS_SQL = "string_split(text, ' ')"
D_SHINGLES_SQL = (f"list_distinct(list_transform("
                  f"range(1, len({D_TOKS_SQL}) - 1), "
                  f"i -> {D_TOKS_SQL}[i] || ' ' || {D_TOKS_SQL}[i+1] || "
                  f"' ' || {D_TOKS_SQL}[i+2]))")


def shingles_from_tokens(toks: Column) -> Column:
    """Distinct word-trigram shingles from a materialized token array.

    Taking the *array* (not the text) matters for the plan: Catalyst does
    not common-subexpression-eliminate ``split(text)`` inside transform
    lambdas, so building shingles straight from text re-splits the whole
    document for every ``element_at`` — O(tokens²) per row.  Callers
    project ``tokens(text)`` into a column once, then shingle that
    (measured ~30% faster on the shingle pass at sf0.1)."""
    return F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.size(toks) - 2),
        lambda i: F.concat_ws(" ", F.element_at(toks, i),
                              F.element_at(toks, i + 1),
                              F.element_at(toks, i + 2))))


def normalize(text: Column | str) -> Column:
    """Canonical text form for fingerprinting: lowercase, trimmed,
    runs of whitespace collapsed."""
    t = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.trim(F.lower(t)), r"\s+", " ")


def md5_fingerprint(text: Column | str) -> Column:
    """Exact-dup fingerprint: md5 hex of the normalized text.  md5 is
    identical across Spark and DuckDB (unlike xxhash64 vs duckdb hash),
    which keeps fingerprints oracle-checkable."""
    return F.md5(normalize(text).cast("binary"))


def fingerprint60(text: Column | str) -> Column:
    """60-bit integer fingerprint: first 15 hex chars of the md5, parsed
    base-16.  60 bits keeps the value positive in a signed BIGINT in
    both engines (DuckDB twin: ``CAST('0x' || substr(md5(t),1,15) AS
    BIGINT)``)."""
    return F.conv(F.substring(md5_fingerprint(text), 1, 15), 16, 10).cast("bigint")


def token_hash60(token: Column | str) -> Column:
    """Per-token 60-bit hash (same md5/15-hex-char construction) — the
    bit source for SimHash signatures."""
    t = F.col(token) if isinstance(token, str) else token
    return F.conv(F.substring(F.md5(t.cast("binary")), 1, 15), 16, 10).cast("bigint")


def quality_score(text_col: Column | str) -> Column:
    """Deterministic heuristic quality score in [0, 1]:

        0.5 · min(n_tokens/100, 1)        (length credit)
      + 0.3 · distinct_tokens/n_tokens    (lexical diversity)
      + 0.2 · (1 − stopword_ratio)        (content density)

    The shape follows public quality-filter heuristics (Gopher/C4-style
    length + repetition + stopword signals) with exact arithmetic both
    engines reproduce bit-identically.
    """
    toks = tokens(text_col)
    n = F.size(toks).cast("double")
    n_distinct = F.size(F.array_distinct(toks)).cast("double")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double")
    return (F.least(n / F.lit(100.0), F.lit(1.0)) * 0.5
            + (n_distinct / n) * 0.3
            + (F.lit(1.0) - n_stop / n) * 0.2)


# PII scrubbing patterns — RE2/Java-compatible subset so the Spark plan
# and the DuckDB oracle run the identical regex.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9-]{6,}[0-9]"


def redact_pii(text: Column | str) -> Column:
    """Mask emails then phone numbers with typed placeholders — the
    mandatory safety scrub before a corpus ships to training.  Order
    matters: emails first, so digit runs inside a local-part are
    consumed by [EMAIL] and not half-masked by the phone pass.  Both
    passes are JVM ``regexp_replace`` (global, codegen'd) — at 100 TB
    this is a narrow map stage running at scan speed."""
    t = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]")
