"""Parquet table catalog for the synthetic star schema.

The reference scanned day-partitioned Hive ORC fact tables with partition
filters (SURVEY §2.1 S2; reference `homed/repots/ChannelReport.scala:41-46`)
and MySQL dims via JDBC pushdown subqueries (S3, `utils/DBUtils.scala:56-63`).
Here the catalog is columnar parquet; Catalyst gives partition pruning,
predicate pushdown and column pruning on these scans for free — queries must
simply express filters/projections declaratively (checked in tests via
``explain`` containing PushedFilters/ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one catalog table (SURVEY S2/S8 analog).

    ``events.ts`` is parquet timestamp[us] with no timezone, which Spark
    4.x reads as TIMESTAMP_NTZ.  The session timezone is pinned to UTC
    (session.py), so NTZ→TIMESTAMP is a wall-clock-preserving identity and
    TIMESTAMP→LONG yields epoch seconds — exactly DuckDB's
    ``epoch_us(ts)//1000000`` floor, which every oracle uses.  All engine
    logic runs on the derived integral ``ts_sec``: sub-second precision is
    generator noise, and second-level truncation keeps results comparable
    across engines regardless of their native timestamp width.
    """
    if name == "events":
        # the NTZ→TIMESTAMP cast is session-timezone dependent; pin UTC on
        # whatever session the caller hands us (the external driver's
        # session is not built by our factory)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        from pyspark.sql import functions as F

        return df.withColumn(
            "ts_sec", F.col("ts").cast("timestamp").cast("long")
        )
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every catalog table as a temp view (mirrors the reference's
    365 `registerTempTable` sites — but once, centrally)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
