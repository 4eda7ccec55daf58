"""Tests for Z-order layout: Morton key correctness and real file pruning.

The oracle gate pins the locality query's cross-engine equality; these
tests pin (a) the bit-interleave against a pure-Python reference and (b)
the actual payoff — a Z-order-clustered parquet write yields per-file
bounding boxes that let a 2-D range predicate skip more files than an
arrival-order layout of the same data.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from bigdata_homed_spark.functions.layout import zorder_key2
from bigdata_homed_spark.plans.layout_queries import zorder_write
from bigdata_homed_spark.sources.tables import load_table


def _morton_py(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_python_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (40000, 7)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zorder_key2(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _morton_py(x, y), (x, y)


def _files_touched(spark, path: str, box) -> int:
    """Files whose (partkey, suppkey) min/max bounding box intersects the
    query box — exactly the set a stats-pruning reader must open."""
    (p_lo, p_hi, s_lo, s_hi) = box
    stats = (
        spark.read.parquet(path)
        .select(
            F.input_file_name().alias("f"), "l_partkey", "l_suppkey"
        )
        .groupBy("f")
        .agg(
            F.min("l_partkey").alias("plo"),
            F.max("l_partkey").alias("phi"),
            F.min("l_suppkey").alias("slo"),
            F.max("l_suppkey").alias("shi"),
        )
    )
    return stats.where(
        (F.col("phi") >= p_lo)
        & (F.col("plo") <= p_hi)
        & (F.col("shi") >= s_lo)
        & (F.col("slo") <= s_hi)
    ).count()


def test_zorder_layout_prunes_more_files_than_arrival_order(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    zpath = str(tmp_path / "z")
    npath = str(tmp_path / "n")
    zorder_write(li, ("l_partkey", "l_suppkey"), zpath, n_files=8)
    # arrival-order layout: the same 8 files, clustered by orderkey (what a
    # plain insert produces) — partkey/suppkey land randomly in every file
    li.repartitionByRange(8, "l_orderkey").sortWithinPartitions(
        "l_orderkey"
    ).write.mode("overwrite").parquet(npath)

    ext = li.agg(
        F.min("l_partkey"), F.max("l_partkey"), F.min("l_suppkey"), F.max("l_suppkey")
    ).collect()[0]
    p_lo, p_hi, s_lo, s_hi = ext
    # a quarter-range predicate on both dims
    box = (
        p_lo,
        p_lo + (p_hi - p_lo) // 4,
        s_lo,
        s_lo + (s_hi - s_lo) // 4,
    )
    z_touched = _files_touched(spark, zpath, box)
    n_touched = _files_touched(spark, npath, box)
    # arrival order scatters both dims across every file; z-order must
    # confine the box to a strict subset
    assert n_touched == 8
    assert z_touched < n_touched


def _morton_n_py(vals, bits: int = 16) -> int:
    n = len(vals)
    z = 0
    for i in range(bits):
        for d, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * n + d)
    return z


def test_zorder_key_ndim_matches_python_reference(spark):
    from bigdata_homed_spark.functions.layout import zorder_key

    rows = [(1, 2, 3), (65535, 0, 40000), (12345, 54321, 999)]
    df = spark.createDataFrame(rows, "x bigint, y bigint, w bigint")
    got = {
        (r["x"], r["y"], r["w"]): r["z"]
        for r in df.select(
            "x",
            "y",
            "w",
            zorder_key([F.col("x"), F.col("y"), F.col("w")]).alias("z"),
        ).collect()
    }
    for t in rows:
        assert got[t] == _morton_n_py(list(t)), t
    # and the 2-dim wrapper stays bit-compatible with its own reference
    assert _morton_n_py([5, 9]) == (_morton_py(5, 9))
