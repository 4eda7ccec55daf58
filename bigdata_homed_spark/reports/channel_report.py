"""ChannelReport — the reference's largest report job (SURVEY §3.2),
re-expressed Spark-first.

Reference chain (`homed/repots/ChannelReport.scala`):
scan day's live sessions → split to half-hours (RDD loop :1466-1520) →
interval-join EPG (:68-73) → per-program uv/playtime aggregation →
dense_rank topN per channel (:220-251) → pack with collect_set (:227) →
region→city→province re-aggregation (:266-273) → Phoenix.

Here: the EPG is a deterministic synthetic program guide (2-hour programs
per channel tiling the events time range), the interval join is the
equi+range hash join from operators/enrich.py, ratings/topN/packing are
single-pass window + collect_set, and the multi-grain pass is a rollup.

Scale: the EPG join broadcasts the guide (a real EPG is ~1e5 rows);
the only fact shuffles are the per-program aggregation and the final
channel grain — both keyed on (channel, program), high-cardinality even
keys.  No driver-side loops anywhere (the reference's half-hour splitter
and EPG map lookups were driver/closure-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregate import top_n_per_group
from ..operators.enrich import interval_join
from ..sources.tables import load_table

N_CHANNELS = 10
PROGRAM_SEC = 7200  # 2-hour programs
GUIDE_START = 1704067200  # 2024-01-01 00:00:00 UTC
GUIDE_END = 1706745600  # 2024-02-01 00:00:00 UTC


def build_epg(spark: SparkSession) -> DataFrame:
    """Synthetic EPG: per channel, 2-hour programs tiling January 2024
    (the homed_eit_schedule_history analog; ChannelReport.scala:1321-1332
    derived program end = start + duration the same way)."""
    channels = spark.range(N_CHANNELS).select(F.col("id").alias("channel_id"))
    starts = F.sequence(
        F.lit(GUIDE_START), F.lit(GUIDE_END - PROGRAM_SEC), F.lit(PROGRAM_SEC)
    )
    return channels.select(
        "channel_id", F.explode(starts).alias("prog_start")
    ).select(
        "channel_id",
        "prog_start",
        (F.col("prog_start") + PROGRAM_SEC).alias("prog_end"),
        F.concat(
            F.lit("prog_"),
            F.col("channel_id").cast("string"),
            F.lit("_"),
            ((F.col("prog_start") - GUIDE_START) / PROGRAM_SEC).cast("long").cast("string"),
        ).alias("event_name"),
    )


def build_plays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watch points from events: channel from the props key, watch seconds
    from value (the live-play slice of the behavior fact)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.coalesce(F.get_json_object("props", "$.k").cast("bigint"), F.lit(0))
    return ev.select(
        "user_id",
        "event_id",
        (k % N_CHANNELS).alias("channel_id"),
        F.col("ts_sec").alias("watch_start"),
        F.least(F.floor(F.col("value") * 10).cast("bigint"), F.lit(PROGRAM_SEC)).alias(
            "watch_sec"
        ),
    )


def channel_report(spark: SparkSession, sf_dir: str, top_n: int = 3) -> DataFrame:
    """Per-channel report: program count, channel UV, total watch time, and
    the packed topN program list (by program UV, ties by name)."""
    plays = build_plays(spark, sf_dir)
    epg = build_epg(spark)
    watched = interval_join(
        plays,
        epg,
        equi_keys=[("channel_id", "channel_id")],
        point_col="watch_start",
        range_start_col="prog_start",
        range_end_col="prog_end",
        how="inner",
        broadcast_right=True,
    ).drop(epg["channel_id"])
    # program end is exclusive: a watch at exactly prog_end belongs to the
    # next program; drop the boundary row the inclusive join kept
    watched = watched.where(F.col("watch_start") < F.col("prog_end"))
    per_prog = watched.groupBy("channel_id", "event_name").agg(
        F.countDistinct("user_id").alias("prog_uv"),
        F.count(F.lit(1)).alias("prog_views"),
        F.sum("watch_sec").cast("bigint").alias("prog_watch_sec"),
    )
    top = top_n_per_group(
        per_prog,
        ["channel_id"],
        [F.col("prog_uv").desc(), F.col("event_name").asc()],
        top_n,
        rank_col="rnk",
        dense=True,
    )
    packed = top.groupBy("channel_id").agg(
        F.concat_ws(
            ",",
            F.sort_array(
                F.collect_set(F.concat_ws("&", F.col("event_name"), F.col("prog_uv")))
            ),
        ).alias("top_programs")
    )
    per_channel = watched.groupBy("channel_id").agg(
        F.countDistinct("event_name").alias("n_programs"),
        F.countDistinct("user_id").alias("channel_uv"),
        F.sum("watch_sec").cast("bigint").alias("total_watch_sec"),
    )
    return per_channel.join(packed, "channel_id", "left")
