"""Data-layout operators: Z-order clustering for multi-dimensional pruning.

The scan-avoidance layer a 100 TB table needs: files written in Z-order
carry small per-file bounding boxes on EVERY clustered dimension, so the
parquet reader's min/max pruning skips most of the table for 2-D range
predicates — single-column sort only gives that on one dimension (this is
Delta Lake's ``OPTIMIZE ZORDER BY``; functions/layout.py has the key).

``zorder_locality`` is the oracle-checkable core: it computes the Morton
key over (l_partkey, l_suppkey), buckets rows by the key's top 8 bits
(256 buckets = the file boundaries a writer would use), and reports each
bucket's bounding box and the fraction of the 2-D key domain it covers.
Z-order's whole value proposition IS this number staying small on both
dims at once; ``tests/test_layout.py`` additionally writes the two
layouts to parquet and counts files a range predicate must touch.

Plan shape: one 1-row min/max broadcast, one narrow projection (the
interleave is a shift/and/or chain inside whole-stage codegen — no UDF),
one 256-key aggregation.  Linear in the fact, no wide shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.layout import (
    ZORDER_BITS,
    normalize_dim,
    normalize_dim_sql,
    zorder_key2,
    zorder_key2_sql,
)
from .registry import query

_BUCKET_SHIFT = 2 * ZORDER_BITS - 8  # keep the top 8 interleaved bits

_NX = normalize_dim_sql("l_partkey", "part_lo_all", "part_hi_all")
_NY = normalize_dim_sql("l_suppkey", "supp_lo_all", "supp_hi_all")


@query(
    "zorder_locality",
    oracle=f"""
    WITH ext AS (
      SELECT min(l_partkey) AS part_lo_all, max(l_partkey) AS part_hi_all,
             min(l_suppkey) AS supp_lo_all, max(l_suppkey) AS supp_hi_all
      FROM lineitem
    ),
    keyed AS (
      SELECT l_partkey, l_suppkey,
             part_hi_all, part_lo_all, supp_hi_all, supp_lo_all,
             {zorder_key2_sql(_NX, _NY)} >> {_BUCKET_SHIFT} AS z_bucket
      FROM lineitem, ext
    )
    SELECT z_bucket,
           cast(count(*) as bigint) AS n_rows,
           cast(min(l_partkey) as bigint) AS part_lo,
           cast(max(l_partkey) as bigint) AS part_hi,
           cast(min(l_suppkey) as bigint) AS supp_lo,
           cast(max(l_suppkey) as bigint) AS supp_hi,
           round(((max(l_partkey) - min(l_partkey) + 1) * 1.0
                  / (max(part_hi_all) - min(part_lo_all) + 1))
                 * ((max(l_suppkey) - min(l_suppkey) + 1) * 1.0
                    / (max(supp_hi_all) - min(supp_lo_all) + 1)), 6) AS box_fraction
    FROM keyed GROUP BY z_bucket
    """,
)
def zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-Z-bucket bounding boxes over (l_partkey, l_suppkey): the file
    statistics a Z-ordered writer would produce, with the 2-D domain
    fraction each box covers (small everywhere = prunable everywhere)."""
    from ..sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    ext = F.broadcast(
        li.agg(
            F.min("l_partkey").alias("part_lo_all"),
            F.max("l_partkey").alias("part_hi_all"),
            F.min("l_suppkey").alias("supp_lo_all"),
            F.max("l_suppkey").alias("supp_hi_all"),
        )
    )
    nx = normalize_dim(
        F.col("l_partkey"), F.col("part_lo_all"), F.col("part_hi_all")
    )
    ny = normalize_dim(
        F.col("l_suppkey"), F.col("supp_lo_all"), F.col("supp_hi_all")
    )
    keyed = li.crossJoin(ext).select(
        "l_partkey",
        "l_suppkey",
        "part_lo_all",
        "part_hi_all",
        "supp_lo_all",
        "supp_hi_all",
        F.shiftrightunsigned(zorder_key2(nx, ny), _BUCKET_SHIFT).alias("z_bucket"),
    )
    part_span = F.max("part_hi_all") - F.min("part_lo_all") + 1
    supp_span = F.max("supp_hi_all") - F.min("supp_lo_all") + 1
    return keyed.groupBy("z_bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("l_partkey").cast("bigint").alias("part_lo"),
        F.max("l_partkey").cast("bigint").alias("part_hi"),
        F.min("l_suppkey").cast("bigint").alias("supp_lo"),
        F.max("l_suppkey").cast("bigint").alias("supp_hi"),
        F.round(
            ((F.max("l_partkey") - F.min("l_partkey") + 1) * F.lit(1.0) / part_span)
            * (
                (F.max("l_suppkey") - F.min("l_suppkey") + 1)
                * F.lit(1.0)
                / supp_span
            ),
            6,
        ).alias("box_fraction"),
    )


def zorder_write(
    df: DataFrame, dims: tuple[str, str], path: str, n_files: int
) -> None:
    """Write ``df`` clustered by the Z-order of two bigint dims: range-
    partition on the Morton key so each output file owns one contiguous
    z-range (small bounding boxes on both dims), sort within files so row
    groups prune too.  The layout utility the locality query models."""
    ext = F.broadcast(
        df.agg(
            F.min(dims[0]).alias("__lo0"),
            F.max(dims[0]).alias("__hi0"),
            F.min(dims[1]).alias("__lo1"),
            F.max(dims[1]).alias("__hi1"),
        )
    )
    nx = normalize_dim(F.col(dims[0]), F.col("__lo0"), F.col("__hi0"))
    ny = normalize_dim(F.col(dims[1]), F.col("__lo1"), F.col("__hi1"))
    keyed = df.crossJoin(ext).withColumn("__z", zorder_key2(nx, ny))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", "__lo0", "__hi0", "__lo1", "__hi1")
        .write.mode("overwrite")
        .parquet(path)
    )
