"""SparkSession factory.

Replaces the reference's session factory (`cn.ipanel.common.SparkSession`,
reference `src/main/scala/cn/ipanel/common/SparkSession.scala:19-34`), which
hand-enabled codegen/columnar-compression/Kryo and a 200 MB broadcast
threshold on Spark 1.6.  On Spark 4.x, whole-stage codegen and columnar
caching are defaults; we add AQE (runtime coalesce + skew-join handling),
Arrow for the Python boundary, and a UTC session timezone so results are
comparable with UTC-naive oracles (DuckDB).

Scale note: `shuffle_partitions` defaults to an env-derived value sized for
the local[32] test harness.  On a real 1000-executor cluster you'd leave AQE
to coalesce from a high initial number (e.g. 2000+) instead; the value is a
parameter, not a constant, for exactly that reason.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "bigdata_homed_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    The reference forced `spark.sql.autoBroadcastJoinThreshold=209715200`
    (200 MB, SparkSession.scala:21) to make every dim join a broadcast.  We
    keep a smaller 64 MB threshold — big enough for every dimension table in
    the model, small enough not to OOM executors at scale — and rely on
    explicit ``F.broadcast`` hints where the optimizer lacks statistics.
    """
    cpus = DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # raw logs repeat k-v keys (e.g. DeviceID/DeviceId spelling drift,
        # reference RunLogParser.scala:514); keep the lenient last-wins
        # semantics instead of failing the batch
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        # streaming keyed state on RocksDB, not the default HDFS-backed
        # in-heap map: state size is bounded by local disk instead of
        # executor heap (the 100 TB requirement for T3/T4 jobs — the
        # reference externalized state to Phoenix for the same reason),
        # with changelog checkpointing so per-batch checkpoint cost is
        # O(delta), not O(total state)
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        .config(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER_URL"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def session_scoped_path(cache: dict[str, str], spark: SparkSession, sf_dir: str):
    """Session-lifetime cache lookup for derived temp datasets.

    Keys on ``applicationId`` (unique per JVM app lifetime) rather than
    ``id(spark)``, which CPython can reuse after an old session object is
    collected; a hit whose directory was removed externally is treated as a
    miss instead of crashing the reader.  Returns the cached path or None;
    the caller writes the dataset and records it with ``cache[key] = path``
    using the key from :func:`session_cache_key`.
    """
    key = session_cache_key(spark, sf_dir)
    path = cache.get(key)
    if path is not None and os.path.isdir(path):
        return path
    cache.pop(key, None)
    return None


def session_cache_key(spark: SparkSession, sf_dir: str) -> str:
    return f"{spark.sparkContext.applicationId}:{sf_dir}"
