"""Storage inventory — file-volume accounting per table directory.

Reference parity: `homed/general/HDFSFileVolumeCollect.scala` walks HDFS
paths and records per-directory file counts and byte volumes into a report
table (operational capacity monitoring).  Here the walk uses the same
Hadoop FileSystem API through the live session's JVM — no shelling out —
and returns a DataFrame so the result composes with the report sinks.

Driver-side by design: listing N tables is metadata I/O (one NameNode/
object-store call per table), not data I/O; at 100 TB the listing is
exactly as cheap as at 1 GB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def table_inventory(spark: SparkSession, base_dir: str, tables: list[str]) -> DataFrame:
    """Per-table file count and total bytes under ``base_dir``.

    Accepts both single-file tables (``<name>.parquet``) and directory
    tables (``<name>.parquet/part-*``) — recursion covers partitioned
    layouts.
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    rows = []
    for name in tables:
        path = jvm.org.apache.hadoop.fs.Path(f"{base_dir}/{name}.parquet")
        fs = path.getFileSystem(conf)
        if not fs.exists(path):
            rows.append((name, 0, 0))
            continue
        summary = fs.getContentSummary(path)
        rows.append((name, int(summary.getFileCount()), int(summary.getLength())))
    return spark.createDataFrame(
        rows, "table_name string, n_files bigint, total_bytes bigint"
    )
