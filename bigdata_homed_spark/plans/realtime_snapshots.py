"""Realtime snapshot reports (`homed/realtime` package).

``program_lookback_snapshot`` — `ProgramLookback.scala:52-135`: every
batch-interval tick the reference reads the CURRENT online-user keyed
state (Phoenix `T_RUNLOG_USER_STATUS_REALTIME`, rows with
``f_service_type = LOOK_BACK`` and ``f_online_status = 1``), groups to
(terminal, region, program) user counts (:66-69), LEFT-outer joins the
lookback media dim (EPG × series, ``f_series_id > 0``, :166-206) with an
'unknown' fallback for unmatched programs (:75-78), prices play time as
``user_count × batch-interval minutes`` (:80), and writes BOTH the
program-grain table and a content-type rollup (:99-104).

Spark-first: the keyed state is the batch keep-latest over the event
log (one user-keyed window, the same state the streaming job
checkpoints); the snapshot instant is the corpus max timestamp as a
1-row broadcast (the reference's driver-computed nodeTime); 'online'
means the user's latest event is a lookback heartbeat within the
trailing 6 h — the reference's state rows stay online until an explicit
End flips them, so the generous window models the same long-lived
sessions; media and geo dims broadcast; the reference's driver-side region HashMap +
per-row ``map()`` becomes a broadcast join.  Both output grains are one
narrow re-aggregation apart and union into a single frame
(f_grain = 'program' | 'type').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import query
from .report_families import _geo_dim

# batch interval minutes (ProgramLookback.scala:16 `var duration = 2`)
_BATCH_MIN = 2

_LOOKBACK_SNAPSHOT_ORACLE = """
WITH geo AS (
  SELECT c.c_custkey AS user_id,
         1 + c.c_custkey % 3                                AS f_terminal,
         cast(n.n_nationkey as bigint)*10 + c.c_custkey % 4 AS f_region_id,
         'rg_' || cast(cast(n.n_nationkey as bigint)*10 + c.c_custkey % 4 as varchar)
                                                            AS f_region_name,
         cast(n.n_nationkey as bigint)                      AS f_city_id,
         n.n_name                                           AS f_city_name,
         cast(n.n_regionkey as bigint)                      AS f_province_id,
         r.r_name                                           AS f_province_name
  FROM customer c
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
),
media AS (
  SELECT cast(p_partkey as bigint) AS f_program_id,
         'ev_' || cast(p_partkey as varchar) AS f_program_name,
         cast(p_partkey // 8 as bigint)      AS f_channel_id,
         'ch_' || cast(p_partkey // 8 as varchar) AS f_channel_name,
         cast(1 + p_partkey % 6 as int)      AS f_content_type
  FROM part
  WHERE p_partkey < 80 AND p_partkey % 10 != 0
),
ev AS (
  SELECT user_id, event_id, event_type,
         epoch_us(ts)//1000000 AS sec,
         coalesce(cast(json_extract_string(props, '$.k') as bigint), 0) % 80
           AS f_program_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
),
w AS (SELECT max(epoch_us(ts)//1000000) AS wmax FROM events),
state AS (
  SELECT e.user_id, e.f_program_id, w.wmax
  FROM ev e CROSS JOIN w
  WHERE e.rn = 1 AND e.event_type = 'view'
        AND e.sec >= w.wmax - 21599
),
counts AS (
  SELECT s.wmax AS f_node_sec,
         g.f_terminal, g.f_province_id, g.f_province_name,
         g.f_city_id, g.f_city_name, g.f_region_id, g.f_region_name,
         s.f_program_id,
         cast(count(*) as bigint) AS f_user_count
  FROM state s JOIN geo g ON g.user_id = s.user_id
  GROUP BY ALL
),
program_rows AS (
  SELECT 'program' AS f_grain, c.f_node_sec,
         c.f_terminal, c.f_province_id, c.f_province_name,
         c.f_city_id, c.f_city_name, c.f_region_id, c.f_region_name,
         coalesce(m.f_channel_id, -1) AS f_channel_id,
         coalesce(m.f_channel_name, 'unknown') AS f_channel_name,
         c.f_program_id,
         coalesce(m.f_program_name, 'unknown') AS f_program_name,
         coalesce(m.f_content_type, 0) AS f_type_id,
         c.f_user_count,
         cast(c.f_user_count * {batch} as bigint) AS f_play_time
  FROM counts c LEFT JOIN media m USING (f_program_id)
)
SELECT * FROM program_rows
UNION ALL
SELECT 'type' AS f_grain, f_node_sec,
       f_terminal, f_province_id, f_province_name,
       f_city_id, f_city_name, f_region_id, f_region_name,
       cast(-1 as bigint) AS f_channel_id, '' AS f_channel_name,
       cast(-1 as bigint) AS f_program_id, '' AS f_program_name,
       f_type_id,
       cast(sum(f_user_count) as bigint) AS f_user_count,
       cast(sum(f_play_time) as bigint) AS f_play_time
FROM program_rows
GROUP BY ALL
""".format(batch=_BATCH_MIN)


@query("program_lookback_snapshot", oracle=_LOOKBACK_SNAPSHOT_ORACLE)
def program_lookback_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    geo = _geo_dim(spark, sf_dir)
    part = load_table(spark, sf_dir, "part")
    media = part.where(
        (F.col("p_partkey") < 80) & (F.col("p_partkey") % 10 != 0)
    ).select(
        F.col("p_partkey").cast("bigint").alias("f_program_id"),
        F.concat(F.lit("ev_"), F.col("p_partkey").cast("string")).alias(
            "f_program_name"
        ),
        F.expr("cast(p_partkey div 8 as bigint)").alias("f_channel_id"),
        F.concat(F.lit("ch_"), F.expr("cast(p_partkey div 8 as string)")).alias(
            "f_channel_name"
        ),
        (F.lit(1) + F.col("p_partkey") % 6).cast("int").alias("f_content_type"),
    )
    k = F.coalesce(F.get_json_object("props", "$.k").cast("bigint"), F.lit(0))
    # keyed-state stand-in: latest event per user == the checkpointed
    # user-status row the realtime job reads back (deterministic ties)
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
    )
    latest = (
        ev.select(
            "user_id", "event_id", "event_type", "ts",
            F.col("ts_sec").alias("sec"),
            (k % 80).alias("f_program_id"),
        )
        .withColumn("rn", rn)
        .where(F.col("rn") == 1)
    )
    wmax = ev.agg(F.max("ts_sec").alias("wmax"))
    state = (
        latest.crossJoin(F.broadcast(wmax))
        .where(
            (F.col("event_type") == "view") & (F.col("sec") >= F.col("wmax") - 21599)
        )
        .select("user_id", "f_program_id", F.col("wmax").alias("f_node_sec"))
    )
    geo_keys = [
        "f_terminal", "f_province_id", "f_province_name",
        "f_city_id", "f_city_name", "f_region_id", "f_region_name",
    ]
    counts = (
        state.join(F.broadcast(geo), "user_id")
        .groupBy("f_node_sec", *geo_keys, "f_program_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f_user_count"))
    )
    program_rows = (
        counts.join(F.broadcast(media), "f_program_id", "left")
        .select(
            F.lit("program").alias("f_grain"),
            "f_node_sec",
            *geo_keys,
            F.coalesce("f_channel_id", F.lit(-1)).cast("bigint").alias("f_channel_id"),
            F.coalesce("f_channel_name", F.lit("unknown")).alias("f_channel_name"),
            "f_program_id",
            F.coalesce("f_program_name", F.lit("unknown")).alias("f_program_name"),
            F.coalesce("f_content_type", F.lit(0)).cast("int").alias("f_type_id"),
            "f_user_count",
            (F.col("f_user_count") * _BATCH_MIN).cast("bigint").alias("f_play_time"),
        )
    )
    type_rows = (
        program_rows.groupBy("f_node_sec", *geo_keys, "f_type_id")
        .agg(
            F.sum("f_user_count").cast("bigint").alias("f_user_count"),
            F.sum("f_play_time").cast("bigint").alias("f_play_time"),
        )
        .select(
            F.lit("type").alias("f_grain"),
            "f_node_sec",
            *geo_keys,
            F.lit(-1).cast("bigint").alias("f_channel_id"),
            F.lit("").alias("f_channel_name"),
            F.lit(-1).cast("bigint").alias("f_program_id"),
            F.lit("").alias("f_program_name"),
            "f_type_id",
            "f_user_count",
            "f_play_time",
        )
    )
    return program_rows.unionByName(type_rows)
