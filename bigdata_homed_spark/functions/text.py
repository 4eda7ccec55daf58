"""Text-analysis expressions for the training-data pipeline.

All pure built-in column expressions (JVM-side, codegen'd) — no Python UDFs
anywhere in the hot path.  Each has an exact ANSI-SQL twin in the oracle
registry so results are hash-verified against DuckDB.

Design for 100 TB: every function here is a narrow per-row projection —
no shuffle, no state — so it scales with the scan.  The heavy parts of the
text pipeline (dedup joins, similarity search) live in ``plans``/operator
modules and shuffle only on compact keys (hashes, band buckets), never on
raw text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny embedded English stopword list (public-domain common words); used for
# the stopword-ratio quality feature and the language heuristic.
EN_STOPWORDS = (
    "the a an and or of to in is are was were be been it this that for on "
    "with as at by from not".split()
)


def tokens(col: Column | str) -> Column:
    """Lowercased alnum tokens; empty strings removed (split artifacts)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_remove(F.split(F.lower(c), "[^a-z0-9]+"), "")


def token_count(col: Column | str) -> Column:
    """Whitespace/punct token count (the 'tokenizer' a data pipeline uses
    for budget accounting before a real BPE pass)."""
    return F.size(tokens(col)).cast("bigint")


def bpe_token_estimate(col: Column | str) -> Column:
    """BPE-ish token estimate: chars/4 heuristic plus one per word boundary
    — the standard cheap proxy when the real tokenizer can't run in the
    scan.  ceil(len/4) implemented portably as (len+3) div 4."""
    c = F.col(col) if isinstance(col, str) else col
    return ((F.length(c) + F.lit(3)) / F.lit(4)).cast("bigint")


def stopword_ratio(col: Column | str) -> Column:
    toks = tokens(col)
    stop = F.filter(toks, lambda t: t.isin(EN_STOPWORDS))
    return (F.size(stop).cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double"))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of non-alnum, non-space characters."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(c, "[a-zA-Z0-9 ]", "")
    return F.length(cleaned).cast("double") / F.greatest(F.length(c), F.lit(1)).cast("double")


def quality_score(col: Column | str) -> Column:
    """Composite quality score in [0,1]: rewards stopword presence and
    reasonable length, penalizes punctuation soup.  Deterministic closed
    form (weights are arbitrary but fixed):

        0.5*min(1, tokens/100) + 0.4*min(1, 4*stopword_ratio) + 0.1*(1-punct_ratio)
    """
    c = F.col(col) if isinstance(col, str) else col
    len_term = F.least(F.lit(1.0), token_count(c).cast("double") / F.lit(100.0))
    stop_term = F.least(F.lit(1.0), stopword_ratio(c) * F.lit(4.0))
    punct_term = F.lit(1.0) - punct_ratio(c)
    return F.round(
        F.lit(0.5) * len_term + F.lit(0.4) * stop_term + F.lit(0.1) * punct_term, 6
    )


def lang_guess(col: Column | str) -> Column:
    """N-gram/stopword language heuristic: 'en' when enough tokens hit the
    English stopword list, else 'other'.  (A real fastText-style model is a
    Pandas-UDF drop-in; the Spark plumbing — projection over the scan — is
    identical.)"""
    return F.when(stopword_ratio(col) >= 0.08, F.lit("en")).otherwise(F.lit("other"))


def fingerprint(col: Column | str) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set.  Two documents with the same bag of words (ignoring order,
    case, punctuation and repetition) collide — the classic 'fingerprint
    dedup' normalization."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(col)))))


def word_shingles(col: Column | str, n: int) -> Column:
    """All n-word shingles (distinct), e.g. n=3 → 'a b c', 'b c d', ...
    Built from sequence+transform+slice — no UDF.  Documents shorter than
    n tokens yield their full token join as a single shingle.

    The token array is LET-BOUND through a singleton-array transform so the
    regex tokenization runs once per row: referencing ``tokens(col)``
    directly inside the per-start lambda re-evaluates the full split for
    EVERY shingle position (higher-order functions defeat Catalyst's
    common-subexpression elimination) — measured 10x slower on the
    documents corpus (O(tokens) full-text splits per row)."""

    def build(t: Column) -> Column:
        starts = F.sequence(F.lit(1), F.greatest(F.size(t) - F.lit(n - 1), F.lit(1)))
        return F.array_distinct(
            F.transform(starts, lambda i: F.concat_ws(" ", F.slice(t, i, n)))
        )

    return F.transform(F.array(tokens(col)), build).getItem(0)
