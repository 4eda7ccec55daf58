"""Iterative graph operators: deterministic weighted PageRank.

The reference has no graph jobs, but a training-data curation stack does:
CommonCrawl-style corpora rank domains/hosts by link authority to weight
or filter sources, and co-occurrence graphs (items co-ordered, docs
co-cited) feed recommendation and mixing decisions.  This module supplies
the iterative kernel; ``plans/graph_queries.py`` builds the co-occurrence
graph and registers the oracle-checked query.

Why fixed-point integers: PageRank over doubles is order-dependent (float
addition is not associative), so two engines — or two runs with different
partitioning — disagree in the low bits and a value-hash oracle can never
pass.  All rank mass here is ``bigint`` scaled by ``PR_SCALE`` (1.0 ==
10^12) and every division is integral (Spark ``div`` == DuckDB ``//`` on
positive operands), so each iteration is EXACTLY reproducible bit-for-bit
on any engine, any partitioning, any cluster size.  The floor loss per
division (< 1 unit of 10^-12) leaks mass out of the system, which is fine:
ranking order, not stochastic-matrix purity, is the product.

Scale shape (the Pregel-on-DataFrame loop):
- edges carry their source's total strength, attached ONCE before the loop
  and localCheckpointed — the loop never recomputes it;
- each iteration is one equi-join (ranks ⋈ edges on src) + one shuffle on
  dst for the contribution sum — O(E) work per round, no broadcast of
  anything sized O(V);
- iteration count is FIXED (caller-chosen), not convergence-tested: a
  deterministic output needs a deterministic round count, and fixed-k
  power iteration is how production systems bound the cost anyway.  A
  fixed count also means the loop needs NO per-round action: unlike the
  convergence-checked connected-components loop (plans/text_pipeline.py,
  one eager localCheckpoint per round to evaluate the changed-count), the
  whole k-round recurrence is ONE lazy plan executed by the final action
  — shuffles chain stage-to-stage, nothing is re-materialized per round.
  Ranks are localCheckpointed only every ``checkpoint_every`` rounds to
  bound plan depth for large k.
At 100 TB the same loop runs unchanged: both joins shuffle on the node id,
so co-partitioning carries between rounds under AQE; per-round cost is
linear in edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fixed-point: 1.0 of rank mass == 10^12.  Headroom check: pr <= ~PR_SCALE,
# edge weight fits in 32 bits, so pr * w <= ~2^72?  No: weights here are
# co-occurrence counts (< 2^20 in any sane graph); pr * w < 2^61 stays in
# bigint.  Callers with larger weights must rescale weights first.
PR_SCALE = 1_000_000_000_000
PR_DAMPING_PCT = 85  # 0.85 damping, as an integer percentage
PR_TELEPORT = (100 - PR_DAMPING_PCT) * PR_SCALE // 100


def pagerank_ranks(
    edges: DataFrame,
    iterations: int = 8,
    checkpoint_every: int = 4,
    broadcast_ranks: bool = False,
) -> DataFrame:
    """Weighted PageRank over a DIRECTED edge list ``(src, dst, w)``.

    Symmetrize before calling for undirected graphs.  Every node must
    appear as BOTH a ``src`` and a ``dst`` (true for symmetrized graphs);
    dangling or source-only nodes are the caller's problem — drop them or
    add self-loops.  This contract is what lets each round be exactly one
    join + one aggregation: no per-round left-join repair of nodes that
    received nothing.

    Returns ``(node, pr_rank)`` with ``pr_rank`` the fixed-point bigint
    rank after ``iterations`` rounds from a uniform ``PR_SCALE`` start:

        out_share(u→v)  = (pr_u * w_uv) div strength_u      (exact bigint)
        pr'_v           = PR_TELEPORT + (85 * Σ in_shares) div 100

    ``broadcast_ranks=True`` is the dimension-sized-V mode: when the
    vertex set is a dim (parts, hosts, channels — millions of rows, tens
    of MB), broadcasting the rank vector turns every round into a
    map-side hash join over the (big, checkpointed, never re-shuffled)
    edge list plus one V-sized aggregation — no per-round sort or
    edge-shuffle at all.  The default (False) is the huge-V mode: a keyed
    shuffle join, O(E) per round, for graphs whose vertex set itself is
    data-sized (e.g. per-document graphs).  Same math, same result.
    """
    strength = edges.groupBy("src").agg(F.sum("w").cast("bigint").alias("s"))
    # attach strength once; the loop re-reads this checkpoint every round
    edges_s = (
        edges.join(strength, "src").select("src", "dst", "w", "s").localCheckpoint()
    )
    ranks = strength.select(
        F.col("src").alias("node"), F.lit(PR_SCALE).cast("bigint").alias("pr")
    )
    for i in range(iterations):
        rank_side = F.broadcast(ranks) if broadcast_ranks else ranks
        ranks = (
            edges_s.join(rank_side, edges_s["src"] == rank_side["node"])
            .select(F.col("dst"), F.expr("(pr * w) div s").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").cast("bigint").alias("incoming"))
            .select(
                F.col("dst").alias("node"),
                (
                    F.lit(PR_TELEPORT)
                    + F.expr(f"({PR_DAMPING_PCT} * incoming) div 100")
                )
                .cast("bigint")
                .alias("pr"),
            )
        )
        # bound plan depth for large iteration counts; intermediate rounds
        # stay lazy so the recurrence executes as one chained-shuffle job
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint()
    return ranks.select("node", F.col("pr").alias("pr_rank"))


def pagerank_oracle_ctes(
    edges_cte: str, iterations: int = 8, prefix: str = "pr_r"
) -> str:
    """DuckDB CTE chain computing the SAME fixed-point iteration.

    ``edges_cte`` must be the name of an already-defined CTE with columns
    (src, dst, w).  Emits ``strength_cte, {prefix}0, ..., {prefix}N``;
    the caller selects from ``{prefix}{iterations}``.  Unrolled rather
    than recursive: DuckDB's recursive CTEs forbid aggregation over the
    recursive term, and an unrolled chain is trivially inspectable.
    """
    parts = [
        # MATERIALIZED: the edge list and strengths are referenced by every
        # unrolled round — without the hint DuckDB may inline (re-evaluate)
        # the whole upstream pair build once per round, which at sf1 spills
        f"pr_strength AS MATERIALIZED (SELECT src, cast(sum(w) as bigint) AS s "
        f"FROM {edges_cte} GROUP BY src)",
        f"{prefix}0 AS (SELECT src AS node, cast({PR_SCALE} as bigint) AS pr "
        f"FROM pr_strength)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"{prefix}{i} AS (\n"
            f"  SELECT e.dst AS node,\n"
            f"         cast({PR_TELEPORT} + ({PR_DAMPING_PCT} *\n"
            f"              cast(sum((r.pr * e.w) // st.s) as bigint)) // 100\n"
            f"              as bigint) AS pr\n"
            f"  FROM {edges_cte} e\n"
            f"  JOIN {prefix}{i - 1} r ON r.node = e.src\n"
            f"  JOIN pr_strength st ON st.src = e.src\n"
            f"  GROUP BY e.dst)"
        )
    return ",\n".join(parts)
