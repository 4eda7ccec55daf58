"""JDBC dimension source (SURVEY §2.1 S3/S4).

The reference loaded every MySQL dim through a pushdown subquery —
``loadMysql(sqlContext, "(select …) as t", url, user, pw)``
(`utils/DBUtils.scala:56-63`, 295 call sites) — and occasionally a bounded
partitioned read (S4, `UserStatistics.scala:434`).  Both are thin option
sets on Spark's JDBC source; they are kept behind functions so tests can
exercise the option-building without a live database (none exists in this
container) and so production code has one choke point for credentials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_subquery_options(
    url: str, subquery: str, user: str, password: str, driver: str | None = None
) -> dict[str, str]:
    """S3: pushdown subquery — the database computes the subquery, Spark
    scans its result.  ``dbtable`` = "(select …) as t" is the exact
    mechanism the reference used; complex dim filtering stays DB-side."""
    opts = {
        "url": url,
        "dbtable": f"({subquery}) as t",
        "user": user,
        "password": password,
    }
    if driver:
        opts["driver"] = driver
    return opts


def jdbc_partitioned_options(
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int,
    user: str,
    password: str,
) -> dict[str, str]:
    """S4: range-partitioned parallel read (one DB cursor per stride)."""
    return {
        "url": url,
        "dbtable": table,
        "partitionColumn": partition_column,
        "lowerBound": str(lower_bound),
        "upperBound": str(upper_bound),
        "numPartitions": str(num_partitions),
        "user": user,
        "password": password,
    }


def load_jdbc(spark: SparkSession, options: dict[str, str]) -> DataFrame:
    return spark.read.format("jdbc").options(**options).load()
