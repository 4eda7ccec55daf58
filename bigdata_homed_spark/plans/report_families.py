"""Remaining reference report families (SURVEY §0 package map):
search reports (SearchDetailNew/ocn), online-rate per half-hour
(OnlineRate), multi-screen terminal overlap (MultiScreen).

Each is the reference job's semantic core over the synthetic tables —
the grain/agg/rank structure is what is being pinned, the input mapping
is the documented synthetic derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregate import top_n_per_group
from ..operators.timegrid import explode_time_grid
from ..sources.tables import load_table
from .core_relational import dsum
from .homed_behavior import EV_SEC, GAP_SECONDS, events_sec
from .registry import query


# --------------------------------------------------------------------------
# Search report (homed/repots/SearchDetailNew.scala:78-86 reads exts['K'];
# ocn/report/SearchReport ranks keys per day): daily top-5 search keys by
# search count, uv attached, dense_rank ties allowed.
@query(
    "search_report_daily_topn",
    oracle="""
    WITH searches AS (
      SELECT user_id,
             (epoch_us(ts)//1000000)//86400 AS day_num,
             'kw_' || cast(cast(json_extract_string(props, '$.k') as bigint) % 50 as varchar) AS search_key
      FROM events WHERE event_type = 'click'
    ),
    per_key AS (
      SELECT day_num, search_key,
             count(*) AS n_searches,
             count(DISTINCT user_id) AS uv
      FROM searches GROUP BY 1, 2
    )
    SELECT day_num, search_key, n_searches, uv, cast(rnk as bigint) AS rnk FROM (
      SELECT *, dense_rank() OVER (PARTITION BY day_num ORDER BY n_searches DESC, search_key) AS rnk
      FROM per_key
    ) WHERE rnk <= 5
    """,
)
def search_report_daily_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("event_type") == "click")
    searches = ev.select(
        "user_id",
        F.expr("ts_sec div 86400").alias("day_num"),
        F.concat(
            F.lit("kw_"),
            (F.get_json_object("props", "$.k").cast("bigint") % 50).cast("string"),
        ).alias("search_key"),
    )
    per_key = searches.groupBy("day_num", "search_key").agg(
        F.count(F.lit(1)).alias("n_searches"), F.countDistinct("user_id").alias("uv")
    )
    top = top_n_per_group(
        per_key,
        ["day_num"],
        [F.col("n_searches").desc(), F.col("search_key").asc()],
        5,
        rank_col="rnk",
        dense=True,
    )
    return top.withColumn("rnk", F.col("rnk").cast("bigint"))


# --------------------------------------------------------------------------
# OnlineRate (homed/repots/OnlineRate.scala:77-120): per half-hour slot,
# online-user ratio = slot's active users / all users that day.  The
# reference looped sessions into slots driver-side; here: time-grid explode
# + one grouped division (double division of bigints — deterministic).
@query(
    "online_rate_halfhour",
    oracle=f"""
    WITH ev AS ({EV_SEC}),
    flagged AS (
      SELECT *, CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > {GAP_SECONDS}
                     THEN 1 ELSE 0 END AS is_new
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
    ),
    sess AS (
      SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY sec, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged
    ),
    spans AS (
      SELECT user_id, session_seq, min(sec) AS s, max(sec) AS e
      FROM sess GROUP BY user_id, session_seq
    ),
    slots AS (
      SELECT user_id, s, e,
             unnest(generate_series((s//1800)*1800, (greatest(e-1, s)//1800)*1800, 1800)) AS slot_start
      FROM spans
    ),
    slot_users AS (
      SELECT slot_start, slot_start//86400 AS day_num, count(DISTINCT user_id) AS online_users
      FROM slots GROUP BY 1, 2
    ),
    day_users AS (
      SELECT sec//86400 AS day_num, count(DISTINCT user_id) AS day_total
      FROM ev GROUP BY 1
    )
    SELECT s.slot_start, s.online_users, d.day_total,
           round(cast(s.online_users as double) / d.day_total, 6) AS online_rate
    FROM slot_users s JOIN day_users d ON s.day_num = d.day_num
    """,
)
def online_rate_halfhour(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sessionize import sessionize_by_gap

    ev = events_sec(spark, sf_dir)
    sess = sessionize_by_gap(ev, ["user_id"], "sec", GAP_SECONDS, "event_id")
    spans = sess.groupBy("user_id", "session_seq").agg(
        F.min("sec").alias("s"), F.max("sec").alias("e")
    )
    slots = explode_time_grid(spans, "s", "e", 1800, "slot_start", "overlap_sec")
    slot_users = slots.groupBy(
        "slot_start", F.expr("slot_start div 86400").alias("day_num")
    ).agg(F.countDistinct("user_id").alias("online_users"))
    day_users = ev.groupBy(F.expr("sec div 86400").alias("day_num")).agg(
        F.countDistinct("user_id").alias("day_total")
    )
    joined = slot_users.join(day_users, "day_num", "inner")
    return joined.select(
        "slot_start",
        "online_users",
        "day_total",
        F.round(F.col("online_users").cast("double") / F.col("day_total"), 6).alias(
            "online_rate"
        ),
    )


# --------------------------------------------------------------------------
# MultiScreen (homed/repots/MultiScreen.scala): users active on multiple
# terminal classes in a day, and the day's terminal-combination profile.
@query(
    "multiscreen_users",
    oracle="""
    WITH ev AS (
      SELECT user_id,
             (epoch_us(ts)//1000000)//86400 AS day_num,
             CASE WHEN (event_id * 37) % 100000 < 20000 THEN 'stb'
                  WHEN (event_id * 37) % 100000 < 40000 THEN 'ca'
                  WHEN (event_id * 37) % 100000 < 60000 THEN 'mobile'
                  WHEN (event_id * 37) % 100000 < 80000 THEN 'pad'
                  ELSE 'pc' END AS terminal
      FROM events
    ),
    per_user AS (
      SELECT day_num, user_id,
             count(DISTINCT terminal) AS n_terminals,
             array_to_string(list_sort(list(DISTINCT terminal)), '+') AS combo
      FROM ev GROUP BY 1, 2
    )
    SELECT day_num,
           count(*) AS n_users,
           cast(sum(CASE WHEN n_terminals >= 2 THEN 1 ELSE 0 END) as bigint) AS multiscreen_users,
           count(DISTINCT combo) AS n_combos
    FROM per_user GROUP BY day_num
    """,
)
def multiscreen_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..reports.video_play_etl import terminal_of_device

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("ts_sec div 86400").alias("day_num"),
        terminal_of_device((F.col("event_id") * 37) % 100000).alias("terminal"),
    )
    per_user = ev.groupBy("day_num", "user_id").agg(
        F.countDistinct("terminal").alias("n_terminals"),
        F.concat_ws("+", F.sort_array(F.collect_set("terminal"))).alias("combo"),
    )
    return per_user.groupBy("day_num").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("n_terminals") >= 2, 1).otherwise(0))
        .cast("bigint")
        .alias("multiscreen_users"),
        F.countDistinct("combo").alias("n_combos"),
    )


# --------------------------------------------------------------------------
# CpSpAnalysis (homed/repots/CpSpAnalysis.scala:126-178): per-hour,
# per-content-provider play time / play count / UV, with a user-type tier
# computed FROM the aggregate (≤600 s → 1, ≤3600 s → 2, else 3 —
# CpSpAnalysis.scala:128-129) and an 'ALL'-provider rollup row per hour
# (the reference's second GROUP BY + union at :162-178).  One pass via
# GROUPING SETS ((hour, cp), (hour)) instead of the reference's two scans.
@query(
    "cpsp_hourly_tiers",
    oracle="""
    WITH ev AS (
      SELECT ((epoch_us(ts)//1000000) % 86400) // 3600 AS hour,
             coalesce(cast(cast(json_extract_string(props, '$.k') as bigint) % 7 as varchar),
                      'other') AS cp_sp,
             user_id, value
      FROM events
    )
    SELECT hour,
           coalesce(cp_sp, 'ALL') AS cp_sp,
           cast(sum(cast(value as decimal(27,6))) as double) AS play_time,
           cast(count(*) as bigint) AS play_count,
           cast(count(DISTINCT user_id) as bigint) AS user_count,
           CASE WHEN sum(cast(value as decimal(27,6))) <= 600 THEN 1
                WHEN sum(cast(value as decimal(27,6))) <= 3600 THEN 2
                ELSE 3 END AS user_type
    FROM ev GROUP BY GROUPING SETS ((hour, cp_sp), (hour))
    """,
)
def cpsp_hourly_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        ((F.col("ts_sec") % 86400) / 3600).cast("bigint").alias("hour"),
        F.coalesce(
            (F.get_json_object("props", "$.k").cast("bigint") % 7).cast("string"),
            F.lit("other"),
        ).alias("cp_sp"),
        "user_id",
        "value",
    )
    dec = F.sum(F.col("value").cast("decimal(27,6)"))
    grouped = ev.groupingSets([["hour", "cp_sp"], ["hour"]], "hour", "cp_sp").agg(
        dec.cast("double").alias("play_time"),
        F.count(F.lit(1)).cast("bigint").alias("play_count"),
        F.countDistinct("user_id").cast("bigint").alias("user_count"),
        F.when(dec <= 600, 1).when(dec <= 3600, 2).otherwise(3).alias("user_type"),
    )
    return grouped.select(
        "hour",
        F.coalesce("cp_sp", F.lit("ALL")).alias("cp_sp"),
        "play_time",
        "play_count",
        "user_count",
        "user_type",
    )


# --------------------------------------------------------------------------
# OpenReport (homed/repots/OpenReport.scala:28,46-67): boot/open report by
# (terminal, phone model, manufacturer, app version) at USER grain (a user
# counts once per distinct combination), where a missing manufacturer falls
# back to a default looked up from a broadcast map (`defaultVersion` UDF).
# Here the default dim is self-derived — each model's modal manufacturer —
# and applied as a broadcast join + coalesce (J7 → broadcast join, no UDF).
@query(
    "open_version_report",
    oracle="""
    WITH opens AS (
      SELECT DISTINCT user_id,
             CASE WHEN user_id % 4 IN (1, 2) THEN 'stb'
                  WHEN user_id % 4 = 3 THEN 'mob' ELSE 'pc' END AS terminal,
             'm' || cast(cast(json_extract_string(props, '$.k') as bigint) % 20 as varchar) AS phone_model,
             CASE WHEN cast(json_extract_string(props, '$.k') as bigint) % 5 = 0 THEN NULL
                  ELSE 'mf' || cast(cast(json_extract_string(props, '$.k') as bigint) % 7 as varchar)
             END AS manufacturer
      FROM events WHERE event_type = 'signup'
    ),
    modal AS (
      SELECT phone_model, manufacturer AS default_mfr
      FROM (
        SELECT phone_model, manufacturer,
               row_number() OVER (PARTITION BY phone_model
                                  ORDER BY count(*) DESC, manufacturer) AS rn
        FROM opens WHERE manufacturer IS NOT NULL
        GROUP BY phone_model, manufacturer
      ) WHERE rn = 1
    )
    SELECT o.terminal, o.phone_model,
           coalesce(o.manufacturer, m.default_mfr, 'UNKNOWN') AS manufacturer,
           cast(count(*) as bigint) AS user_count
    FROM opens o LEFT JOIN modal m ON o.phone_model = m.phone_model
    GROUP BY 1, 2, 3
    """,
)
def open_version_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    k = F.get_json_object("props", "$.k").cast("bigint")
    opens = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.when((F.col("user_id") % 4).isin(1, 2), "stb")
            .when(F.col("user_id") % 4 == 3, "mob")
            .otherwise("pc")
            .alias("terminal"),
            F.concat(F.lit("m"), (k % 20).cast("string")).alias("phone_model"),
            F.when(k % 5 == 0, F.lit(None).cast("string"))
            .otherwise(F.concat(F.lit("mf"), (k % 7).cast("string")))
            .alias("manufacturer"),
        )
        .distinct()
    )
    w = Window.partitionBy("phone_model").orderBy(F.desc("n"), F.asc("manufacturer"))
    modal = (
        opens.where(F.col("manufacturer").isNotNull())
        .groupBy("phone_model", "manufacturer")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("phone_model", F.col("manufacturer").alias("default_mfr"))
    )
    joined = opens.join(F.broadcast(modal), "phone_model", "left")
    return joined.groupBy(
        "terminal",
        "phone_model",
        F.coalesce("manufacturer", "default_mfr", F.lit("UNKNOWN")).alias("manufacturer"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("user_count"))
