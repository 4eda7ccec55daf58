"""Distributed global row numbering (the scale-safe total-order rank).

A partition-less ``row_number()`` window funnels EVERY row through one
task (Spark's ``WindowExec: No Partition Defined`` warning) — unusable at
100 TB.  The classic two-pass construction used here instead:

1. ``repartitionByRange`` on the order key — Spark samples range
   boundaries so each output partition holds one contiguous key range;
   ``localCheckpoint`` pins the materialized partitions so passes 2 and 3
   see the SAME placement (range sampling is not re-run);
2. count rows per partition (one tiny P-row aggregate, driver-collected
   under ``bounded_collect`` — P is the shuffle-partition constant, not a
   data-sized frame) and prefix-sum the counts into per-partition offsets;
3. per-partition ``row_number()`` (a window PARTITIONED by the pinned
   partition id — parallel, no single-task funnel) plus the broadcast
   offset-map literal.

Equal keys land in one range partition by construction, so the numbering
is exact, dense and deterministic as long as ``order_cols`` is fully
tie-broken (registry rule 3: every ordering carries a unique tiebreaker).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .aggregate import bounded_collect


def global_row_number(
    df: DataFrame,
    order_cols: Sequence[str],
    rn_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a 1-based global ``rn_col`` ordered by ``order_cols``.

    ``order_cols`` must fully tie-break (include a unique id last).  The
    input is materialized once (localCheckpoint) to pin the range
    placement; output keeps all input columns plus ``rn_col``.
    """
    p = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    p = int(p)
    staged = (
        df.repartitionByRange(p, *[F.col(c) for c in order_cols])
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = bounded_collect(
        staged.groupBy("__pid").count(),
        p,
        "per-range-partition row counts (P rows by construction)",
    )
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        acc += row["count"]
    flat: list = []
    for pid, off in offsets.items():
        flat.extend([F.lit(pid), F.lit(off)])
    if flat:
        off_expr = F.create_map(*flat)[F.col("__pid")]
    else:
        # empty input: an argless create_map() is map<void,void>, whose
        # lookup fails analysis — the offset is vacuously zero
        off_expr = F.lit(0).cast("bigint")
    w = Window.partitionBy("__pid").orderBy(*[F.col(c) for c in order_cols])
    return (
        staged.withColumn(
            rn_col, (F.row_number().over(w).cast("bigint") + off_expr).cast("bigint")
        )
        .drop("__pid")
    )
