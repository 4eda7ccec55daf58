"""Graph analytics: deterministic weighted PageRank over a co-occurrence
graph.

Absent in the reference (it has no iterative jobs at all — every
`cn.ipanel.homed` main is a single-pass SQL chain), but a first-class
need in a training-data pipeline: CommonCrawl-scale curation ranks
domains/hosts by link authority to weight and filter sources
(Gopher/CCNet both filter on host-level signals), and co-occurrence
ranking drives source mixing.  The iterative kernel lives in
``operators/graph.py``; this module builds the graph and registers the
oracle-checked query.

Graph: parts co-ordered in the same order (lineitem self-joined on
l_orderkey, smaller partkey first) with edge weight = number of orders
containing both.  Per-order fanout is bounded by order size (≤ 7 items
in TPC-H shapes), so |pairs| ≈ C(7,2)·|orders| — linear in the fact, and
the pair aggregation is map-side combinable.  The rank loop is one
equi-join + one keyed shuffle per round (O(E) each), fixed at 8 rounds.

Determinism (why DuckDB can hash-match an ITERATIVE float algorithm):
rank mass is fixed-point bigint (PR_SCALE = 10^12) and all divisions are
integral — see operators/graph.py.  The oracle runs the identical
recurrence as an unrolled CTE chain; both engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import pagerank_oracle_ctes, pagerank_ranks
from .registry import query

_PR_ITERS = 8
_PR_TOP_K = 20


@query(
    "pagerank_copurchase_parts",
    oracle=f"""
    WITH pr_items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pr_pairs AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2
      FROM pr_items a JOIN pr_items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    pr_e0 AS (
      SELECT p1, p2, cast(count(*) as bigint) AS w FROM pr_pairs GROUP BY p1, p2
    ),
    pr_edges AS MATERIALIZED (
      SELECT p1 AS src, p2 AS dst, w FROM pr_e0
      UNION ALL
      SELECT p2 AS src, p1 AS dst, w FROM pr_e0
    ),
    {pagerank_oracle_ctes("pr_edges", _PR_ITERS)}
    SELECT node AS part_key, pr AS pr_rank
    FROM pr_r{_PR_ITERS}
    ORDER BY pr_rank DESC, part_key
    LIMIT {_PR_TOP_K}
    """,
)
def pagerank_copurchase_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by weighted PageRank over the co-order graph.

    8 fixed-point power-iteration rounds (operators/graph.py); the top-k
    is a distributed TakeOrderedAndProject over the V-row rank frame,
    fully tie-broken by (rank desc, part_key asc) — ranks are exact
    integers, so the boundary set is deterministic on every engine.
    """
    from ..sources.tables import load_table

    # pair generation WITHOUT a fact self-join: one keyed shuffle packs
    # each order's distinct part set (bounded by order size, so the array
    # is tiny and collect_set partial-aggregates map-side), then the i<j
    # pair expansion is pure whole-stage-codegen array algebra.  The
    # oracle states the same pairs as a relational self-join — two
    # formulations, one answer.
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), "
                    "y -> struct(x AS p1, y AS p2))))"
                )
            ).alias("pp")
        )
        .select("pp.p1", "pp.p2")
    )
    e0 = pairs.groupBy("p1", "p2").agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    edges = e0.select(
        F.col("p1").alias("src"), F.col("p2").alias("dst"), "w"
    ).union(e0.select(F.col("p2").alias("src"), F.col("p1").alias("dst"), "w"))
    # V here is the PART dimension (dim-sized at every SF: ~2 MB per
    # million parts at 16 B/row), so the broadcast-ranks mode applies —
    # each round is a map-side join over the checkpointed edge list.
    # A data-sized vertex set (per-doc graphs) would pass False.
    ranks = pagerank_ranks(edges, _PR_ITERS, broadcast_ranks=True)
    return (
        ranks.orderBy(F.desc("pr_rank"), F.asc("node"))
        .limit(_PR_TOP_K)
        .select(F.col("node").alias("part_key"), "pr_rank")
    )
