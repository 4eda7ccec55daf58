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
        # session tz is still pinned UTC for the date/timestamp functions
        # downstream queries use (oracles assume UTC) …
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        from pyspark.sql import functions as F

        # … but ts_sec itself is pure NTZ wall-clock arithmetic — NO
        # session-timezone dependence, so a caller resetting the tz after
        # load_table but before an action cannot shift it (the lazy
        # NTZ→TIMESTAMP→LONG cast chain it replaces was tz-sensitive at
        # ACTION time, not load time)
        return df.withColumn(
            "ts_sec",
            F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"),
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
