"""Fuzzy record linkage: sorted-neighborhood blocking + edit-distance
verification.

The dedup families already registered cover hash identity (exact), set
similarity (MinHash/Jaccard), bit similarity (SimHash/hamming) and
embedding cosine (SemDeDup/PQ).  The missing classical verifier is
CHARACTER EDIT DISTANCE — the right tool for short denormalized strings
(titles, names, addresses) where near-misses are typos and reorderings,
not token-set drift.  Pairwise Levenshtein is O(n²) unblocked, so
production record linkage blocks first; the Sorted Neighborhood Method
(Hernández & Stolfo, SIGMOD '95) is the bounded-cost classic: sort
records by a key, then compare each record only against its W successors
in sort order — exactly n·W candidate pairs, no skew, no quadratic
bucket blowup (token-inverted-list blocking degenerates on a skewed
vocabulary; SNM's cost is input-size-linear BY CONSTRUCTION).

Scale shape:
- the global sort rank comes from ``operators/rank.py::global_row_number``
  (range-repartition + per-partition window + P-row offset prefix-sum) —
  no single-partition window funnel;
- the W-successor pairing is ``explode(sequence(1, W))`` + an EQUI-join
  on the shifted rank (rn_b = rn_a + off) — shuffle-hash/SMJ on a dense
  bigint, never a range or cross join;
- verification (`levenshtein`, a native JVM expression on both engines)
  runs only on the n·W survivors.

Window pairing crosses range-partition boundaries for free: the join is
on the GLOBAL rank, so neighbor pairs that straddle two partitions are
formed by the shuffle like any other pair (the classic MapReduce SNM
boundary-replication hack is unnecessary under a join formulation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.rank import global_row_number
from .registry import query

_SNM_WINDOW = 5  # compare each title to its 5 successors in sort order
_SNM_MAX_LEV = 18  # verification threshold on the 6-token title prefix
_TITLE_TOKENS = 6

_TITLE_SQL = (
    f"array_to_string(list_slice(string_split(text, ' '), 1, {_TITLE_TOKENS}), ' ')"
)


@query(
    "sorted_neighborhood_linkage",
    oracle=f"""
    WITH snm_t AS (
      SELECT doc_id, {_TITLE_SQL} AS title FROM documents
    ),
    snm_r AS (
      SELECT doc_id, title,
             cast(row_number() OVER (ORDER BY title, doc_id) as bigint) AS rn
      FROM snm_t
    ),
    snm_cand AS (
      SELECT a.doc_id AS da, b.doc_id AS db,
             levenshtein(a.title, b.title) AS lev
      FROM snm_r a JOIN snm_r b
        ON b.rn BETWEEN a.rn + 1 AND a.rn + {_SNM_WINDOW}
    )
    SELECT least(da, db) AS d1, greatest(da, db) AS d2,
           cast(lev as bigint) AS lev_dist
    FROM snm_cand
    WHERE lev <= {_SNM_MAX_LEV}
    """,
)
def sorted_neighborhood_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-matches among document title prefixes under
    sorted-neighborhood blocking (window {W}, Levenshtein ≤ {L})."""
    from ..sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 1, _TITLE_TOKENS), " "
        ).alias("title"),
    )
    ranked = global_row_number(docs, ["title", "doc_id"])
    expanded = ranked.select(
        F.col("doc_id").alias("da"),
        F.col("title").alias("ta"),
        F.col("rn"),
        F.explode(F.sequence(F.lit(1), F.lit(_SNM_WINDOW))).alias("off"),
    ).select(
        "da", "ta", (F.col("rn") + F.col("off").cast("bigint")).alias("rn_b")
    )
    right = ranked.select(
        F.col("doc_id").alias("db"), F.col("title").alias("tb"), F.col("rn")
    )
    cand = expanded.join(right, expanded["rn_b"] == right["rn"]).select(
        "da", "db", F.levenshtein("ta", "tb").alias("lev")
    )
    return cand.where(F.col("lev") <= _SNM_MAX_LEV).select(
        F.least("da", "db").alias("d1"),
        F.greatest("da", "db").alias("d2"),
        F.col("lev").cast("bigint").alias("lev_dist"),
    )


sorted_neighborhood_linkage.__doc__ = sorted_neighborhood_linkage.__doc__.format(
    W=_SNM_WINDOW, L=_SNM_MAX_LEV
)
