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
           cast(cast(sum(cast(value as decimal(27,6))) as varchar) as double) AS play_time,
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


# --------------------------------------------------------------------------
# LiveChannelStatistics half-hour chain, FULL column set (the reference's
# #3 job, `homed/repots/LiveChannelStatistics.scala`): live play sessions
# split into half-hour slices with per-slice play seconds and play_count=1
# on the slice containing the session start (the driver-side `process()`
# loop at :297-352 — here the native sequence+explode time grid), then per
# (date, hour, timerange, 3-level geo, terminal, channel) aggregation of
# distinct viewers / playtime / play counts with the channel-type
# collect_set pack (:373-394), LEFT-joined with per-bucket ShareSuccess
# counts on the 5-key (region, hour, timerange, terminal, channel) with
# nvl(0) (:396-400 — the share side is the second behavior table, channel
# from exts['ID']).
#
# Deterministic refinements of reference bugs/unspecified behavior, on
# BOTH engines: minute==30 buckets to timerange 60 on both sides of the
# share join (the reference used `<30` for plays but `>30` for shares —
# the two sides could never meet for minute 30); slice overlap is exact
# across midnight (the reference clamped at 86400 and dropped the rest);
# the type pack is array_sort'ed.
#
# Scale: the slice fan-out is a narrow op (no shuffle); the one fact
# shuffle is the composite-key aggregation; dims broadcast; the share agg
# is a second small shuffle joined on 5 keys (both sides already reduced).
_LIVE_HH_ORACLE = """
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
plays AS (
  SELECT e.user_id, epoch_us(e.ts)//1000000 AS s,
         cast(floor(e.value*10) as bigint) AS play,
         coalesce(cast(json_extract_string(e.props, '$.k') as bigint), 0) % 10 AS f_channel_id
  FROM events e WHERE e.event_type = 'view'
),
base AS (
  SELECT p.*, p.s + p.play AS e, g.* EXCLUDE (user_id)
  FROM plays p JOIN geo g ON g.user_id = p.user_id
  WHERE p.play > 0
),
sliced AS (
  SELECT b.*, cast(sl.slot as bigint) AS slot
  FROM base b,
       LATERAL (SELECT unnest(generate_series((b.s//1800)*1800,
                                              ((b.e-1)//1800)*1800, 1800)) AS slot) sl
),
ch AS (
  SELECT slot//86400 AS f_date,
         (slot % 86400)//3600 AS f_hour,
         CASE WHEN slot % 3600 = 0 THEN 30 ELSE 60 END AS f_timerange,
         f_province_id, f_province_name, f_city_id, f_city_name,
         f_region_id, f_region_name, f_terminal, f_channel_id,
         'ch_' || cast(f_channel_id as varchar) AS f_channel_name,
         array_to_string(list_sort(list(DISTINCT
           cast(1 + f_channel_id % 5 as varchar))), ',') AS f_channel_type,
         cast(count(DISTINCT user_id) as bigint) AS f_play_user_amt,
         cast(cast(sum(least(e, slot+1800) - greatest(s, slot)) as bigint) as double)
           AS f_play_time,
         cast(sum(CASE WHEN s >= slot AND s < slot+1800 THEN 1 ELSE 0 END) as bigint)
           AS f_play_count
  FROM sliced
  GROUP BY ALL
),
share AS (
  SELECT g.f_region_id,
         (epoch_us(e.ts)//1000000 % 86400)//3600 AS f_hour,
         CASE WHEN (epoch_us(e.ts)//1000000 % 3600) < 1800 THEN 30 ELSE 60 END
           AS f_timerange,
         g.f_terminal,
         coalesce(cast(json_extract_string(e.props, '$.k') as bigint), 0) % 10
           AS f_channel_id,
         cast(count(*) as bigint) AS f_share_count
  FROM events e JOIN geo g ON g.user_id = e.user_id
  WHERE e.event_type = 'click'
  GROUP BY ALL
)
SELECT ch.f_date, ch.f_hour, ch.f_timerange,
       ch.f_province_id, ch.f_province_name, ch.f_city_id, ch.f_city_name,
       ch.f_region_id, ch.f_region_name, ch.f_terminal,
       ch.f_channel_type, ch.f_channel_id, ch.f_channel_name,
       ch.f_play_time, ch.f_play_count,
       coalesce(s.f_share_count, 0) AS f_share_count,
       ch.f_play_user_amt
FROM ch
LEFT JOIN share s USING (f_region_id, f_hour, f_timerange, f_terminal, f_channel_id)
"""


@query("live_channel_halfhour_full", oracle=_LIVE_HH_ORACLE)
def live_channel_halfhour_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timegrid import explode_time_grid
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    reg = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    region_id = F.col("n_nationkey").cast("bigint") * 10 + F.col("user_id") % 4
    geo = (
        cust.join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "user_id",
            (F.lit(1) + F.col("user_id") % 3).alias("f_terminal"),
            region_id.alias("f_region_id"),
            F.concat(F.lit("rg_"), region_id.cast("string")).alias("f_region_name"),
            F.col("n_nationkey").cast("bigint").alias("f_city_id"),
            F.col("n_name").alias("f_city_name"),
            F.col("n_regionkey").cast("bigint").alias("f_province_id"),
            F.col("r_name").alias("f_province_name"),
        )
    )
    k = F.coalesce(F.get_json_object("props", "$.k").cast("bigint"), F.lit(0))

    plays = (
        ev.where(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("ts_sec").alias("s"),
            F.floor(F.col("value") * 10).cast("bigint").alias("play"),
            (k % 10).alias("f_channel_id"),
        )
        .where(F.col("play") > 0)
        .withColumn("e", F.col("s") + F.col("play"))
        .join(F.broadcast(geo), "user_id")
    )
    grid = explode_time_grid(plays, "s", "e", 1800, slot_col="slot")
    geo_keys = [
        "f_province_id", "f_province_name", "f_city_id", "f_city_name",
        "f_region_id", "f_region_name", "f_terminal",
    ]
    ch = (
        grid.withColumn("f_date", F.expr("slot div 86400"))
        .withColumn("f_hour", F.expr("(slot % 86400) div 3600"))
        .withColumn(
            "f_timerange", F.when(F.col("slot") % 3600 == 0, 30).otherwise(60)
        )
        .groupBy("f_date", "f_hour", "f_timerange", *geo_keys, "f_channel_id")
        .agg(
            F.concat_ws(
                ",",
                F.array_sort(
                    F.collect_set((F.lit(1) + F.col("f_channel_id") % 5).cast("string"))
                ),
            ).alias("f_channel_type"),
            F.countDistinct("user_id").cast("bigint").alias("f_play_user_amt"),
            F.sum("overlap_sec").cast("bigint").cast("double").alias("f_play_time"),
            F.sum(
                F.when(
                    (F.col("s") >= F.col("slot"))
                    & (F.col("s") < F.col("slot") + 1800),
                    1,
                ).otherwise(0)
            ).cast("bigint").alias("f_play_count"),
        )
        .withColumn(
            "f_channel_name",
            F.concat(F.lit("ch_"), F.col("f_channel_id").cast("string")),
        )
    )
    share = (
        ev.where(F.col("event_type") == "click")
        .select("user_id", F.col("ts_sec").alias("sec"), (k % 10).alias("f_channel_id"))
        .join(F.broadcast(geo.select("user_id", "f_terminal", "f_region_id")), "user_id")
        .withColumn("f_hour", F.expr("(sec % 86400) div 3600"))
        .withColumn(
            "f_timerange", F.when(F.col("sec") % 3600 < 1800, 30).otherwise(60)
        )
        .groupBy("f_region_id", "f_hour", "f_timerange", "f_terminal", "f_channel_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f_share_count"))
    )
    out = ch.join(
        share,
        ["f_region_id", "f_hour", "f_timerange", "f_terminal", "f_channel_id"],
        "left",
    )
    return out.select(
        "f_date", "f_hour", "f_timerange",
        "f_province_id", "f_province_name", "f_city_id", "f_city_name",
        "f_region_id", "f_region_name", "f_terminal",
        "f_channel_type", "f_channel_id", "f_channel_name",
        "f_play_time", "f_play_count",
        F.coalesce(F.col("f_share_count"), F.lit(0)).cast("bigint").alias(
            "f_share_count"
        ),
        "f_play_user_amt",
    )


# --------------------------------------------------------------------------
# SearchDetailNew full classification chain (`homed/repots/SearchDetailNew.
# scala`): per-bucket search counts from the behavior stream's exts['R']
# result id (:70-88), the 26-range content-category classifier
# `getNumByResultId` (:117-175) — reproduced range-for-range below — and
# the category/user dim joins (:103-110).  The reference COLLECTED the
# distinct categories to the driver and conditionally loaded one MySQL dim
# per category; Spark-first that whole dance is one broadcast category dim
# joined declaratively (no driver branching, no per-category round trips).
# The classifier itself compiles from ONE range table into both engines: a
# when-chain (whole-stage-codegen'd, no join, no UDF) and the identical
# SQL CASE — so parity is structural.
_RESULT_RANGES = [
    (100000000, 199999999, 1), (300000000, 399999999, 2),
    (200000000, 299999999, 3), (400000000, 499999999, 4),
    (1000000000, 1099999999, 5), (500000000, 549999999, 6),
    (575000000, 599999999, 7), (550000000, 574999999, 8),
    (1400000000, 1499999999, 9), (1300000000, 1399999999, 10),
    (4210000000, 4211999999, 11), (4200000000, 4201999999, 12),
    (4202000000, 4203999999, 13), (600000000, 699999999, 14),
    (0, 9999999, 15), (10000000, 19999999, 16),
    (20000000, 29999999, 17), (30000000, 39999999, 18),
    (60000000, 69999999, 19), (700000000, 799999999, 20),
    (800000000, 899999999, 21), (1100000000, 1199999999, 22),
    (1200000000, 1299999999, 23), (4208000000, 4209999999, 24),
    (4212000000, 4214999999, 25), (4215000000, 4217999999, 26),
]

_CASE_SQL = (
    "CASE "
    + " ".join(
        f"WHEN result_id > {lo} AND result_id < {hi} THEN {num}"
        for lo, hi, num in _RESULT_RANGES
    )
    + " ELSE 0 END"
)


def _category_num(col):
    expr = F.lit(0)
    # build the chain in reverse so the FIRST matching range wins, like the
    # reference's if/else-if ladder (ranges 1/3 overlap nowhere, but order
    # fidelity is free this way)
    for lo, hi, num in reversed(_RESULT_RANGES):
        expr = F.when((col > lo) & (col < hi), num).otherwise(expr)
    return expr


@query(
    "search_result_category_report",
    oracle=f"""
    WITH base AS (
      SELECT (epoch_us(ts)//1000000)//86400 AS f_date,
             ((epoch_us(ts)//1000000) % 86400)//3600 AS f_hour,
             CASE WHEN ((epoch_us(ts)//1000000) % 3600) < 1800 THEN 30 ELSE 60 END
               AS f_timerange,
             1 + user_id % 3 AS f_terminal,
             user_id,
             CASE (coalesce(cast(json_extract_string(props, '$.k') as bigint), 0) % 6)
               WHEN 0 THEN 100000000 + event_id % 1000000
               WHEN 1 THEN 300000000 + event_id % 1000000
               WHEN 2 THEN 1000000000 + event_id % 1000000
               WHEN 3 THEN 4210000000 + event_id % 1000000
               WHEN 4 THEN 550000000 + event_id % 1000000
               ELSE 50000000 + event_id % 1000000
             END AS result_id
      FROM events WHERE event_type = 'click'
    ),
    classified AS (SELECT *, {_CASE_SQL} AS category_num FROM base)
    SELECT f_date, f_hour, f_timerange, f_terminal,
           category_num,
           CASE WHEN category_num = 0 THEN 'other'
                ELSE 'cat_' || cast(category_num as varchar) END AS category_name,
           cast(count(*) as bigint) AS n_searches,
           cast(count(DISTINCT user_id) as bigint) AS n_users
    FROM classified
    GROUP BY ALL
    """,
)
def search_result_category_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    k = F.coalesce(F.get_json_object("props", "$.k").cast("bigint"), F.lit(0))
    # synthetic exts['R']: spread ids across six representative ranges (five
    # classified + one landing in no range → category 0/'other')
    bases = [100000000, 300000000, 1000000000, 4210000000, 550000000, 50000000]
    rid = F.lit(bases[-1])
    for i, b in enumerate(bases[:-1]):
        rid = F.when(k % 6 == i, F.lit(b)).otherwise(rid)
    rid = rid + F.col("event_id") % 1000000
    base = ev.where(F.col("event_type") == "click").select(
        F.expr("ts_sec div 86400").alias("f_date"),
        F.expr("(ts_sec % 86400) div 3600").alias("f_hour"),
        F.when(F.col("ts_sec") % 3600 < 1800, 30).otherwise(60).alias("f_timerange"),
        (F.lit(1) + F.col("user_id") % 3).alias("f_terminal"),
        "user_id",
        rid.alias("result_id"),
    )
    classified = base.withColumn("category_num", _category_num(F.col("result_id")))
    named = classified.withColumn(
        "category_name",
        F.when(F.col("category_num") == 0, F.lit("other")).otherwise(
            F.concat(F.lit("cat_"), F.col("category_num").cast("string"))
        ),
    )
    return named.groupBy(
        "f_date", "f_hour", "f_timerange", "f_terminal", "category_num", "category_name"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_searches"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


# --------------------------------------------------------------------------
# ColumnDetailNew hierarchy rollup (`homed/repots/ColumnDetailNew.scala`):
# the reference resolved each clicked column id up its parent chain with a
# driver-side HashMap walk per ROW (`toParent`/`getColumnRoot` :547-587)
# and then rolled PV up the tree with an iterative per-level
# union-and-reaggregate loop (`getAllData` while(i>1) :206-252).
# Spark-first both collapse: the fixed-depth (≤3) hierarchy is two
# BROADCAST self-joins of the column dim, and the rollup is ONE
# explode-ancestors + aggregate — every fact row contributes its pv to
# itself, its parent, and its grandparent in a single shuffle, replacing
# the reference's N-level union chain.  At 100 TB: the dim is tiny
# (broadcast), the one fact shuffle is keyed on (ancestor, date,
# terminal) — high-cardinality — and uv stays a two-level exact distinct.
_COLDIM_SQL = """
  SELECT cast(id as bigint) AS column_id, 1 AS level,
         'col_' || cast(id as varchar) AS column_name,
         cast(0 as bigint) AS parent_id
  FROM (SELECT unnest(generate_series(1, 5)) AS id)
  UNION ALL
  SELECT cast(100 + id as bigint), 2, 'col_' || cast(100 + id as varchar),
         cast(1 + (id - 1) % 5 as bigint)
  FROM (SELECT unnest(generate_series(1, 20)) AS id)
  UNION ALL
  SELECT cast(10000 + id as bigint), 3, 'col_' || cast(10000 + id as varchar),
         cast(101 + id % 20 as bigint)
  FROM (SELECT unnest(generate_series(0, 39)) AS id)
"""


@query(
    "column_hierarchy_rollup",
    oracle=f"""
    WITH coldim AS ({_COLDIM_SQL}),
    clicks AS (
      SELECT (epoch_us(ts)//1000000)//86400 AS f_date,
             1 + user_id % 3 AS f_terminal,
             user_id,
             cast(10000 + coalesce(cast(json_extract_string(props, '$.k') as bigint), 0) % 40 as bigint)
               AS leaf_id
      FROM events WHERE event_type = 'view'
    ),
    resolved AS (
      SELECT c.*, l.parent_id AS p_id, p.parent_id AS gp_id
      FROM clicks c
      JOIN coldim l ON l.column_id = c.leaf_id
      JOIN coldim p ON p.column_id = l.parent_id
    ),
    exploded AS (
      SELECT f_date, f_terminal, user_id, a.column_id
      FROM resolved,
           LATERAL (SELECT unnest([leaf_id, p_id, gp_id]) AS column_id) a
    )
    SELECT e.f_date, e.f_terminal,
           e.column_id, d.level AS column_level, d.column_name, d.parent_id,
           cast(count(*) as bigint) AS f_pv,
           cast(count(DISTINCT e.user_id) as bigint) AS f_uv
    FROM exploded e JOIN coldim d ON d.column_id = e.column_id
    GROUP BY ALL
    """,
)
def column_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    # synthetic 3-level column tree (5 roots → 20 mid → 40 leaves), the
    # t_column_info analog
    l1 = spark.range(1, 6).select(
        F.col("id").alias("column_id"),
        F.lit(1).alias("level"),
        F.concat(F.lit("col_"), F.col("id").cast("string")).alias("column_name"),
        F.lit(0).cast("bigint").alias("parent_id"),
    )
    l2 = spark.range(1, 21).select(
        (F.col("id") + 100).alias("column_id"),
        F.lit(2).alias("level"),
        F.concat(F.lit("col_"), (F.col("id") + 100).cast("string")).alias(
            "column_name"
        ),
        (F.lit(1) + (F.col("id") - 1) % 5).alias("parent_id"),
    )
    l3 = spark.range(0, 40).select(
        (F.col("id") + 10000).alias("column_id"),
        F.lit(3).alias("level"),
        F.concat(F.lit("col_"), (F.col("id") + 10000).cast("string")).alias(
            "column_name"
        ),
        (F.lit(101) + F.col("id") % 20).alias("parent_id"),
    )
    coldim = l1.unionByName(l2).unionByName(l3)

    ev = load_table(spark, sf_dir, "events")
    k = F.coalesce(F.get_json_object("props", "$.k").cast("bigint"), F.lit(0))
    clicks = ev.where(F.col("event_type") == "view").select(
        F.expr("ts_sec div 86400").alias("f_date"),
        (F.lit(1) + F.col("user_id") % 3).alias("f_terminal"),
        "user_id",
        (F.lit(10000) + k % 40).alias("leaf_id"),
    )
    leaf = F.broadcast(
        coldim.select(F.col("column_id").alias("leaf_id"), F.col("parent_id").alias("p_id"))
    )
    parent = F.broadcast(
        coldim.select(F.col("column_id").alias("p_id"), F.col("parent_id").alias("gp_id"))
    )
    resolved = clicks.join(leaf, "leaf_id").join(parent, "p_id")
    exploded = resolved.select(
        "f_date",
        "f_terminal",
        "user_id",
        F.explode(F.array("leaf_id", "p_id", "gp_id")).alias("column_id"),
    )
    return (
        exploded.join(F.broadcast(coldim), "column_id")
        .groupBy(
            "f_date", "f_terminal", "column_id", F.col("level").alias("column_level"),
            "column_name", "parent_id",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("f_pv"),
            F.countDistinct("user_id").cast("bigint").alias("f_uv"),
        )
    )


# --------------------------------------------------------------------------
# OcnRecommendStatistics (`ocn/report/OcnRecommendStatistics.scala`): the
# recommend funnel per SLOT — exposures (action=1) vs clicks (action=2)
# pv/uv per (date, terminal, portal/scene, recommend index), where the
# multi-valued recommendIdx is pipe-split per event (the reference's
# mapPartitions row loop :47-67 → native split+explode), exposure left-
# joins clicks with null→0 (:99-112), and the scene-name dim comes from a
# JSON config blob (`getSceneData` :119-143 — fastjson double-parse in a
# row map → one typed from_json over a literal config table).  Scale: two
# pre-aggregated grains joined on their full key (both sides already
# reduced), dims broadcast, one explode fan-out on the fact scan.
_SCENES = [
    '{"tmp_base":{"tmp_id":"0","tmp_name":"home"}}',
    '{"tmp_base":{"tmp_id":"1","tmp_name":"vod"}}',
    '{"tmp_base":{"tmp_id":"2","tmp_name":"live"}}',
    '{"tmp_base":{"tmp_id":"3","tmp_name":"search"}}',
]


@query(
    "recommend_slot_funnel",
    oracle=f"""
    WITH scene_raw AS (
      SELECT unnest([{", ".join("'" + s + "'" for s in _SCENES)}]) AS record_value
    ),
    scene AS (
      SELECT cast(json_extract_string(record_value, '$.tmp_base.tmp_id') as bigint)
               AS f_scene_id,
             json_extract_string(record_value, '$.tmp_base.tmp_name') AS f_scene_name
      FROM scene_raw
    ),
    base AS (
      SELECT (epoch_us(ts)//1000000)//86400 AS f_date,
             1 + user_id % 3 AS f_terminal,
             user_id, event_type,
             coalesce(cast(json_extract_string(props, '$.k') as bigint), 0) % 4
               AS f_scene_id,
             's' || cast(coalesce(cast(json_extract_string(props, '$.k') as bigint), 0) % 5 as varchar)
               || '|' ||
             's' || cast((coalesce(cast(json_extract_string(props, '$.k') as bigint), 0) + 3) % 7 as varchar)
               AS slots
      FROM events WHERE event_type IN ('view', 'click')
    ),
    sliced AS (
      SELECT b.*, s.slot
      FROM base b, LATERAL (SELECT unnest(string_split(b.slots, '|')) AS slot) s
    ),
    expo AS (
      SELECT f_date, f_terminal, f_scene_id, slot AS f_slot,
             cast(count(*) as bigint) AS f_recommend_pv,
             cast(count(DISTINCT user_id) as bigint) AS f_recommend_uv
      FROM sliced WHERE event_type = 'view' GROUP BY ALL
    ),
    clk AS (
      SELECT f_date, f_terminal, f_scene_id, slot AS f_slot,
             cast(count(*) as bigint) AS f_click_pv,
             cast(count(DISTINCT user_id) as bigint) AS f_click_uv
      FROM sliced WHERE event_type = 'click' GROUP BY ALL
    )
    SELECT e.f_date, e.f_terminal, e.f_scene_id, sc.f_scene_name, e.f_slot,
           e.f_recommend_pv, e.f_recommend_uv,
           coalesce(c.f_click_pv, 0) AS f_click_pv,
           coalesce(c.f_click_uv, 0) AS f_click_uv
    FROM expo e
    LEFT JOIN clk c USING (f_date, f_terminal, f_scene_id, f_slot)
    LEFT JOIN scene sc USING (f_scene_id)
    """,
)
def recommend_slot_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from ..sources.tables import load_table

    scene_schema = T.StructType(
        [
            T.StructField(
                "tmp_base",
                T.StructType(
                    [
                        T.StructField("tmp_id", T.StringType()),
                        T.StructField("tmp_name", T.StringType()),
                    ]
                ),
            )
        ]
    )
    scene = (
        spark.createDataFrame([(s,) for s in _SCENES], "record_value string")
        .select(F.from_json("record_value", scene_schema).alias("j"))
        .select(
            F.col("j.tmp_base.tmp_id").cast("bigint").alias("f_scene_id"),
            F.col("j.tmp_base.tmp_name").alias("f_scene_name"),
        )
    )

    ev = load_table(spark, sf_dir, "events")
    k = F.coalesce(F.get_json_object("props", "$.k").cast("bigint"), F.lit(0))
    slots = F.concat(
        F.lit("s"), (k % 5).cast("string"), F.lit("|s"), ((k + 3) % 7).cast("string")
    )
    base = ev.where(F.col("event_type").isin("view", "click")).select(
        F.expr("ts_sec div 86400").alias("f_date"),
        (F.lit(1) + F.col("user_id") % 3).alias("f_terminal"),
        "user_id",
        "event_type",
        (k % 4).alias("f_scene_id"),
        slots.alias("slots"),
    )
    sliced = base.withColumn("f_slot", F.explode(F.split("slots", "\\|")))

    def grain(df: DataFrame, pv: str, uv: str) -> DataFrame:
        return df.groupBy("f_date", "f_terminal", "f_scene_id", "f_slot").agg(
            F.count(F.lit(1)).cast("bigint").alias(pv),
            F.countDistinct("user_id").cast("bigint").alias(uv),
        )

    expo = grain(
        sliced.where(F.col("event_type") == "view"), "f_recommend_pv", "f_recommend_uv"
    )
    clk = grain(
        sliced.where(F.col("event_type") == "click"), "f_click_pv", "f_click_uv"
    )
    out = (
        expo.join(clk, ["f_date", "f_terminal", "f_scene_id", "f_slot"], "left")
        .join(F.broadcast(scene), "f_scene_id", "left")
    )
    return out.select(
        "f_date", "f_terminal", "f_scene_id", "f_scene_name", "f_slot",
        "f_recommend_pv", "f_recommend_uv",
        F.coalesce("f_click_pv", F.lit(0)).cast("bigint").alias("f_click_pv"),
        F.coalesce("f_click_uv", F.lit(0)).cast("bigint").alias("f_click_uv"),
    )


# --------------------------------------------------------------------------
# LiveChannelStatisticByTimerange grain family (`homed/repots/
# LiveChannelStatisticByTimerange.scala:48-145`): the 5-minute base grain
# (f_timerange ∈ {5,10,...,60} within each hour) and its quarter-hour
# re-aggregation via the `gettimerange` mapping (5/10/15→15, 20/25/30→30,
# 35/40/45→45, else 60 — reproduced exactly by ((tr+14) div 15)*15, no
# UDF), both computed from the user-grain base so distinct-user counts
# stay exact at every grain (the reference registered a UDF + re-scanned
# the base the same way).  Output: one row family per grain, labeled.
@query(
    "channel_timerange_grains",
    oracle="""
    WITH base AS (
      SELECT ((epoch_us(ts)//1000000) % 86400)//3600 AS f_hour,
             (((epoch_us(ts)//1000000) % 3600)//300 + 1) * 5 AS tr5,
             1 + user_id % 3 AS f_terminal,
             coalesce(cast(json_extract_string(props, '$.k') as bigint), 0) % 10
               AS f_channel_id,
             user_id,
             cast(floor(value*10) as bigint) AS play
      FROM events WHERE event_type = 'view'
    ),
    g5 AS (
      SELECT '5min' AS f_grain, f_hour, tr5 AS f_timerange, f_terminal, f_channel_id,
             cast(sum(play) as bigint) AS f_play_time,
             cast(count(*) as bigint) AS f_play_count,
             cast(count(DISTINCT user_id) as bigint) AS f_user_count
      FROM base GROUP BY ALL
    ),
    g15 AS (
      SELECT '15min' AS f_grain, f_hour,
             ((tr5 + 14)//15)*15 AS f_timerange, f_terminal, f_channel_id,
             cast(sum(play) as bigint) AS f_play_time,
             cast(count(*) as bigint) AS f_play_count,
             cast(count(DISTINCT user_id) as bigint) AS f_user_count
      FROM base GROUP BY ALL
    )
    SELECT * FROM g5 UNION ALL SELECT * FROM g15
    """,
)
def channel_timerange_grains(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    k = F.coalesce(F.get_json_object("props", "$.k").cast("bigint"), F.lit(0))
    base = ev.where(F.col("event_type") == "view").select(
        F.expr("(ts_sec % 86400) div 3600").alias("f_hour"),
        ((F.expr("(ts_sec % 3600) div 300") + 1) * 5).alias("tr5"),
        (F.lit(1) + F.col("user_id") % 3).alias("f_terminal"),
        (k % 10).alias("f_channel_id"),
        "user_id",
        F.floor(F.col("value") * 10).cast("bigint").alias("play"),
    )

    def grain(df: DataFrame, label: str, tr_col) -> DataFrame:
        return (
            df.withColumn("f_timerange", tr_col)
            .groupBy("f_hour", "f_timerange", "f_terminal", "f_channel_id")
            .agg(
                F.sum("play").cast("bigint").alias("f_play_time"),
                F.count(F.lit(1)).cast("bigint").alias("f_play_count"),
                F.countDistinct("user_id").cast("bigint").alias("f_user_count"),
            )
            .select(
                F.lit(label).alias("f_grain"), "f_hour", "f_timerange",
                "f_terminal", "f_channel_id",
                "f_play_time", "f_play_count", "f_user_count",
            )
        )

    g5 = grain(base, "5min", F.col("tr5"))
    g15 = grain(base, "15min", F.expr("((tr5 + 14) div 15) * 15"))
    return g5.unionByName(g15)


# --------------------------------------------------------------------------
# DemandReport FULL column set (the demand/VOD sibling of
# `live_channel_halfhour_full`): the reference's `homed/repots/
# DemandReport.scala` chain — demand play sessions half-hour-sliced by the
# driver-side loop at :328-370 (here the native sequence+explode time
# grid), per-user basic grain with max(column_id) (:263-275), the VOD
# "meizi" dim join video→series/content_type/cp/copyright/duration
# (:82-97), the column-hierarchy walk via the driver HashMap (:113-127,
# 276-291 — here closed-form arithmetic: parent = id div 4, grandparent =
# id div 16, level = walk depth), and the final watch-statistics
# aggregation `getDemandWatchBasic` (:192-221) with its full 30-column
# set: distinct users, play-time sum, max duration, click (session-start)
# counts, screen/share sums, series triple.
#
# Deterministic parity notes: f_screen and f_share are literal 0 — in the
# reference basicDemand hard-codes both to 0 (:146-147) and the behaviour
# share feed is dead code (DemandReport.scala:244 filters
# `reportType='ShareSuccess' AND reportType='demand'`, which no row
# satisfies); the half-hour slicing is exact across midnight (the
# reference's loop broke at hour>23 and dropped the remainder).
#
# Scale: slice fan-out is narrow (no shuffle); shuffle 1 is the per-user
# basic grain, shuffle 2 the final report grain (both map-side
# combinable); the VOD dim broadcasts; the column hierarchy is pure
# expression arithmetic (no join at all — the reference collected the
# whole column table into a driver HashMap and walked it per row).
_DEMAND_FULL_ORACLE = """
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
vod AS (
  SELECT cast(p_partkey as bigint) AS f_video_id,
         'vd_' || cast(p_partkey as varchar)       AS f_video_name,
         1 + p_partkey % 8                         AS f_content_type,
         'cp_' || cast(p_partkey % 7 as varchar)   AS f_cp_id,
         p_partkey % 2                             AS f_copyright,
         600 + (p_partkey % 48) * 100              AS duration,
         cast(p_partkey // 10 as bigint)           AS f_series_id,
         'sr_' || cast(p_partkey // 10 as varchar) AS f_series_name,
         p_partkey % 24                            AS f_series_num
  FROM part
),
plays AS (
  SELECT e.event_id, e.user_id, epoch_us(e.ts)//1000000 AS s,
         cast(floor(e.value*10) as bigint) AS play,
         coalesce(cast(json_extract_string(e.props, '$.k') as bigint), 0) AS k
  FROM events e WHERE e.event_type = 'click'
),
base AS (
  SELECT p.event_id, p.user_id, p.s, p.s + p.play AS e,
         p.k % 200 AS f_video_id,
         p.k % 60  AS f_column_id_raw,
         p.user_id * 10 + p.k % 3 AS f_device_id,
         g.* EXCLUDE (user_id)
  FROM plays p JOIN geo g ON g.user_id = p.user_id
  WHERE p.play > 0
),
sliced AS (
  SELECT b.*, cast(sl.slot as bigint) AS slot
  FROM base b,
       LATERAL (SELECT unnest(generate_series((b.s//1800)*1800,
                                              ((b.e-1)//1800)*1800, 1800)) AS slot) sl
),
basic AS (
  SELECT slot//86400 AS f_date,
         (slot % 86400)//3600 AS f_hour,
         CASE WHEN slot % 3600 = 0 THEN 30 ELSE 60 END AS f_timerange,
         user_id, f_device_id, f_video_id,
         f_province_id, f_province_name, f_city_id, f_city_name,
         f_region_id, f_region_name, f_terminal,
         max(f_column_id_raw) AS f_column_id,
         cast(sum(least(e, slot+1800) - greatest(s, slot)) as bigint) AS f_play_time,
         cast(sum(CASE WHEN s >= slot AND s < slot+1800 THEN 1 ELSE 0 END) as bigint)
           AS video_play
  FROM sliced
  GROUP BY ALL
),
enriched AS (
  SELECT b.*, v.* EXCLUDE (f_video_id),
         CASE WHEN b.f_column_id >= 16 THEN 3
              WHEN b.f_column_id >= 4 THEN 2 ELSE 1 END AS f_column_level,
         'col_' || cast(b.f_column_id as varchar) AS f_column_name,
         cast(b.f_column_id // 4 as bigint) AS f_parent_column_id,
         'col_' || cast(b.f_column_id // 4 as varchar) AS f_parent_column_name,
         cast(b.f_column_id // 16 as bigint) AS f_parent_parent_column_id,
         'col_' || cast(b.f_column_id // 16 as varchar) AS f_parent_parent_column_name
  FROM basic b JOIN vod v USING (f_video_id)
)
SELECT f_date, f_hour, f_timerange,
       cast(count(DISTINCT user_id) as bigint) AS f_user_count,
       f_video_id, f_video_name,
       f_province_id, f_province_name, f_city_id, f_city_name,
       f_region_id, f_region_name, f_terminal,
       f_content_type, f_cp_id, f_copyright,
       f_column_level, f_column_id, f_column_name,
       f_parent_column_id, f_parent_column_name,
       f_parent_parent_column_id, f_parent_parent_column_name,
       cast(sum(f_play_time) as bigint) AS f_video_time_sum,
       cast(max(duration) as bigint) AS f_duration,
       cast(sum(video_play) as bigint) AS f_click_num,
       cast(0 as bigint) AS f_screen,
       cast(0 as bigint) AS f_share,
       f_series_num, f_series_id, f_series_name
FROM enriched
GROUP BY ALL
"""


def _geo_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer→nation→region 3-level geo dim (broadcast everywhere)."""
    from ..sources.tables import load_table

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    reg = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    region_id = F.col("n_nationkey").cast("bigint") * 10 + F.col("user_id") % 4
    return (
        cust.join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "user_id",
            (F.lit(1) + F.col("user_id") % 3).alias("f_terminal"),
            region_id.alias("f_region_id"),
            F.concat(F.lit("rg_"), region_id.cast("string")).alias("f_region_name"),
            F.col("n_nationkey").cast("bigint").alias("f_city_id"),
            F.col("n_name").alias("f_city_name"),
            F.col("n_regionkey").cast("bigint").alias("f_province_id"),
            F.col("r_name").alias("f_province_name"),
        )
    )


@query("demand_report_full", oracle=_DEMAND_FULL_ORACLE)
def demand_report_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timegrid import explode_time_grid
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    geo = _geo_dim(spark, sf_dir)
    part = load_table(spark, sf_dir, "part")
    vod = part.select(
        F.col("p_partkey").cast("bigint").alias("f_video_id"),
        F.concat(F.lit("vd_"), F.col("p_partkey").cast("string")).alias("f_video_name"),
        (F.lit(1) + F.col("p_partkey") % 8).alias("f_content_type"),
        F.concat(F.lit("cp_"), (F.col("p_partkey") % 7).cast("string")).alias("f_cp_id"),
        (F.col("p_partkey") % 2).alias("f_copyright"),
        (F.lit(600) + (F.col("p_partkey") % 48) * 100).alias("duration"),
        F.expr("cast(p_partkey div 10 as bigint)").alias("f_series_id"),
        F.concat(F.lit("sr_"), F.expr("cast(p_partkey div 10 as string)")).alias(
            "f_series_name"
        ),
        (F.col("p_partkey") % 24).alias("f_series_num"),
    )
    k = F.coalesce(F.get_json_object("props", "$.k").cast("bigint"), F.lit(0))
    plays = (
        ev.where(F.col("event_type") == "click")
        .select(
            "event_id",
            "user_id",
            F.col("ts_sec").alias("s"),
            F.floor(F.col("value") * 10).cast("bigint").alias("play"),
            k.alias("k"),
        )
        .where(F.col("play") > 0)
        .select(
            "event_id",
            "user_id",
            "s",
            (F.col("s") + F.col("play")).alias("e"),
            (F.col("k") % 200).alias("f_video_id"),
            (F.col("k") % 60).alias("f_column_id_raw"),
            (F.col("user_id") * 10 + F.col("k") % 3).alias("f_device_id"),
        )
        .join(F.broadcast(geo), "user_id")
    )
    grid = explode_time_grid(plays, "s", "e", 1800, slot_col="slot")
    geo_keys = [
        "f_province_id", "f_province_name", "f_city_id", "f_city_name",
        "f_region_id", "f_region_name", "f_terminal",
    ]
    basic = (
        grid.withColumn("f_date", F.expr("slot div 86400"))
        .withColumn("f_hour", F.expr("(slot % 86400) div 3600"))
        .withColumn("f_timerange", F.when(F.col("slot") % 3600 == 0, 30).otherwise(60))
        .groupBy(
            "f_date", "f_hour", "f_timerange", "user_id", "f_device_id",
            "f_video_id", *geo_keys,
        )
        .agg(
            F.max("f_column_id_raw").alias("f_column_id"),
            F.sum("overlap_sec").cast("bigint").alias("f_play_time"),
            F.sum(
                F.when(
                    (F.col("s") >= F.col("slot")) & (F.col("s") < F.col("slot") + 1800),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("video_play"),
        )
    )
    c = F.col("f_column_id")
    enriched = basic.join(F.broadcast(vod), "f_video_id").select(
        "*",
        F.when(c >= 16, 3).when(c >= 4, 2).otherwise(1).alias("f_column_level"),
        F.concat(F.lit("col_"), c.cast("string")).alias("f_column_name"),
        F.expr("cast(f_column_id div 4 as bigint)").alias("f_parent_column_id"),
        F.concat(F.lit("col_"), F.expr("cast(f_column_id div 4 as string)")).alias(
            "f_parent_column_name"
        ),
        F.expr("cast(f_column_id div 16 as bigint)").alias("f_parent_parent_column_id"),
        F.concat(F.lit("col_"), F.expr("cast(f_column_id div 16 as string)")).alias(
            "f_parent_parent_column_name"
        ),
    )
    return enriched.groupBy(
        "f_date", "f_hour", "f_timerange", "f_video_id", "f_video_name",
        *geo_keys,
        "f_content_type", "f_cp_id", "f_copyright",
        "f_column_level", "f_column_id", "f_column_name",
        "f_parent_column_id", "f_parent_column_name",
        "f_parent_parent_column_id", "f_parent_parent_column_name",
        "f_series_num", "f_series_id", "f_series_name",
    ).agg(
        F.countDistinct("user_id").cast("bigint").alias("f_user_count"),
        F.sum("f_play_time").cast("bigint").alias("f_video_time_sum"),
        F.max("duration").cast("bigint").alias("f_duration"),
        F.sum("video_play").cast("bigint").alias("f_click_num"),
        F.lit(0).cast("bigint").alias("f_screen"),
        F.lit(0).cast("bigint").alias("f_share"),
    )


# --------------------------------------------------------------------------
# DemandPackage bridge + package user tiers (`homed/repots/
# DemandPackage.scala`): the package dim stores its program membership as a
# JSON ARRAY STRING `[{"ids":"1,2","type":"a"},...]`; the reference
# normalizes it with the replace dance at :254-267 (strip brackets,
# `},{` → `}||{`), then TWO lateral-view explodes (:268-284): split on
# `||` → per-group JSON fragment → get_json_object ids/type → split ids
# on `,` → one row per (package, series).  The bridge joins the per-user
# demand watch fact and feeds `getUserCountPackage` (:98-127): per-user
# play-time within a package tiered 1/2/3 (≤600 / ≤3600 / rest,
# :113-115), then user counts per (geo, terminal, cp_sp, package, tier).
#
# Spark-first: the two lateral views are two explode(split(...)) — all
# JVM expressions (get_json_object on each fragment), no driver map();
# the bridge (≤ packages × series rows) broadcasts into the fact join.
# Scale: the watch fact shuffles once to the per-user package grain, the
# tier re-agg is map-side combinable; the JSON normalization runs on the
# 20-row dim, not the fact.
_PKG_ORACLE = r"""
WITH pkg AS (
  SELECT p AS package_id,
         'pk_' || cast(p as varchar) AS package_name,
         'csp_' || cast(p % 5 as varchar) AS f_cp_sp,
         '[{"ids":"' || cast(p as varchar) || ',' || cast((p+3) % 20 as varchar)
           || '","type":"tA"},{"ids":"' || cast((p+7) % 20 as varchar) || ','
           || cast((p+11) % 20 as varchar) || ',' || cast((p+13) % 20 as varchar)
           || '","type":"tB"}]' AS program_ids
  FROM (SELECT unnest(generate_series(0, 19)) AS p)
),
frag AS (
  SELECT package_id, package_name, f_cp_sp,
         unnest(str_split(replace(regexp_extract(program_ids, '^\[(.+)\]$', 1),
                                  '},{', '}||{'), '||')) AS grp
  FROM pkg
),
bridge AS (
  SELECT package_id, package_name, f_cp_sp,
         json_extract_string(grp, '$.type') AS f_type,
         cast(unnest(str_split(json_extract_string(grp, '$.ids'), ',')) as bigint)
           AS f_series_id
  FROM frag
),
geo AS (
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
watch AS (
  SELECT e.user_id,
         (coalesce(cast(json_extract_string(e.props, '$.k') as bigint), 0) % 200) // 10
           AS f_series_id,
         cast(floor(e.value*10) as bigint) AS play,
         g.f_terminal, g.f_region_id, g.f_region_name, g.f_city_id, g.f_city_name,
         g.f_province_id, g.f_province_name
  FROM events e JOIN geo g ON g.user_id = e.user_id
  WHERE e.event_type = 'click' AND cast(floor(e.value*10) as bigint) > 0
),
per_user AS (
  SELECT w.f_terminal, w.f_region_id, w.f_region_name,
         w.f_province_id, w.f_province_name, w.f_city_id, w.f_city_name,
         b.f_cp_sp, b.package_id AS f_package_id, b.package_name AS f_package_name,
         w.user_id,
         sum(w.play) AS f_play_time
  FROM watch w JOIN bridge b USING (f_series_id)
  GROUP BY ALL
)
SELECT f_terminal, f_region_id, f_region_name, f_province_id, f_province_name,
       f_city_id, f_city_name, f_cp_sp, f_package_id, f_package_name,
       CASE WHEN f_play_time <= 600 THEN 1
            WHEN f_play_time <= 3600 THEN 2 ELSE 3 END AS f_user_type,
       cast(count(*) as bigint) AS f_user_count
FROM per_user
GROUP BY ALL
"""


def _package_bridge(spark: SparkSession) -> DataFrame:
    """Package→series membership bridge (`DemandPackage.scala:254-284`).

    The package dim stores members as a JSON array string; the reference
    normalizes it (strip brackets, ``},{`` → ``}||{``) then runs two
    lateral-view explodes.  Here both are ``explode(split(...))`` over the
    20-row dim — all JVM expressions, broadcast into any fact join.
    """
    p = F.col("id")
    pkg = spark.range(0, 20).select(
        p.alias("package_id"),
        F.concat(F.lit("pk_"), p.cast("string")).alias("package_name"),
        F.concat(F.lit("csp_"), (p % 5).cast("string")).alias("f_cp_sp"),
        F.concat(
            F.lit('[{"ids":"'), p.cast("string"), F.lit(","),
            ((p + 3) % 20).cast("string"),
            F.lit('","type":"tA"},{"ids":"'), ((p + 7) % 20).cast("string"),
            F.lit(","), ((p + 11) % 20).cast("string"),
            F.lit(","), ((p + 13) % 20).cast("string"),
            F.lit('","type":"tB"}]'),
        ).alias("program_ids"),
    )
    # the reference's normalize-then-double-lateral-view (:254-284)
    frag = pkg.select(
        "package_id",
        "package_name",
        "f_cp_sp",
        F.explode(
            F.split(
                F.regexp_replace(
                    F.regexp_extract("program_ids", r"^\[(.+)\]$", 1), r"\},\{", r"}||{"
                ),
                r"\|\|",
            )
        ).alias("grp"),
    )
    return frag.select(
        "package_id",
        "package_name",
        "f_cp_sp",
        F.get_json_object("grp", "$.type").alias("f_type"),
        F.explode(F.split(F.get_json_object("grp", "$.ids"), ",")).alias("sid"),
    ).select(
        "package_id", "package_name", "f_cp_sp", "f_type",
        F.col("sid").cast("bigint").alias("f_series_id"),
    )


@query("demand_package_tiers", oracle=_PKG_ORACLE)
def demand_package_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    bridge = _package_bridge(spark)
    geo = _geo_dim(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    k = F.coalesce(F.get_json_object("props", "$.k").cast("bigint"), F.lit(0))
    watch = (
        ev.where(F.col("event_type") == "click")
        .select(
            "user_id",
            F.expr(
                "cast((coalesce(cast(get_json_object(props, '$.k') as bigint), 0) % 200)"
                " div 10 as bigint)"
            ).alias("f_series_id"),
            F.floor(F.col("value") * 10).cast("bigint").alias("play"),
        )
        .where(F.col("play") > 0)
        .join(F.broadcast(geo), "user_id")
    )
    per_user = (
        watch.join(F.broadcast(bridge), "f_series_id")
        .groupBy(
            "f_terminal", "f_region_id", "f_region_name",
            "f_province_id", "f_province_name", "f_city_id", "f_city_name",
            "f_cp_sp",
            F.col("package_id").alias("f_package_id"),
            F.col("package_name").alias("f_package_name"),
            "user_id",
        )
        .agg(F.sum("play").alias("f_play_time"))
    )
    tier = (
        F.when(F.col("f_play_time") <= 600, 1)
        .when(F.col("f_play_time") <= 3600, 2)
        .otherwise(3)
    )
    return (
        per_user.withColumn("f_user_type", tier)
        .groupBy(
            "f_terminal", "f_region_id", "f_region_name",
            "f_province_id", "f_province_name", "f_city_id", "f_city_name",
            "f_cp_sp", "f_package_id", "f_package_name", "f_user_type",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("f_user_count"))
    )


# --------------------------------------------------------------------------
# DemandReportPeriod (`homed/repots/DemandReportPeriod.scala:66-91`):
# the daily user-grain demand video fact re-aggregated at THREE period
# grains — day, ISO week (Monday start, the reference's
# getFirstDateOfWeek), calendar month — each a count(distinct user) +
# play-time/click re-agg per video with the column hierarchy zeroed out
# exactly as the reference writes it (`0 as f_column_level, '' as
# f_column_id …`, :76-78).  Sessions crossing midnight split across days
# via the day-grid explode (the reference inherited basicDemand's
# half-hour slices; a day grid is the same cut at day granularity).
# Period labels are DATE-arithmetic strings (epoch-day → DATE '1970-01-01'
# + n), so no timestamp/timezone dependence on either engine.
#
# Scale: one day-grid fan-out (narrow), one shuffle to the daily
# user×video grain, then three map-side-combinable re-aggs unioned —
# the distinct-user recount is per-grain exact (counts can't be summed
# across periods; the reference re-scanned the daily fact for the same
# reason).
_DEMAND_PERIOD_ORACLE = """
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
vod AS (
  SELECT cast(p_partkey as bigint) AS f_video_id,
         'vd_' || cast(p_partkey as varchar)       AS f_video_name,
         1 + p_partkey % 8                         AS f_content_type,
         'cp_' || cast(p_partkey % 7 as varchar)   AS f_cp_id,
         p_partkey % 2                             AS f_copyright,
         600 + (p_partkey % 48) * 100              AS duration,
         cast(p_partkey // 10 as bigint)           AS f_series_id,
         'sr_' || cast(p_partkey // 10 as varchar) AS f_series_name,
         p_partkey % 24                            AS f_series_num
  FROM part
),
plays AS (
  SELECT e.user_id, epoch_us(e.ts)//1000000 AS s,
         cast(floor(e.value*10) as bigint) AS play,
         coalesce(cast(json_extract_string(e.props, '$.k') as bigint), 0) % 200
           AS f_video_id
  FROM events e WHERE e.event_type = 'click'
),
base AS (
  SELECT p.user_id, p.s, p.s + p.play AS e, p.f_video_id, g.* EXCLUDE (user_id)
  FROM plays p JOIN geo g ON g.user_id = p.user_id
  WHERE p.play > 0
),
sliced AS (
  SELECT b.*, cast(sl.slot as bigint) AS slot
  FROM base b,
       LATERAL (SELECT unnest(generate_series((b.s//86400)*86400,
                                              ((b.e-1)//86400)*86400, 86400)) AS slot) sl
),
daily AS (
  SELECT slot//86400 AS day, user_id, f_video_id,
         f_province_id, f_province_name, f_city_id, f_city_name,
         f_region_id, f_region_name, f_terminal,
         cast(sum(least(e, slot+86400) - greatest(s, slot)) as bigint) AS f_play_time,
         cast(sum(CASE WHEN s >= slot AND s < slot+86400 THEN 1 ELSE 0 END) as bigint)
           AS video_play
  FROM sliced
  GROUP BY ALL
),
enriched AS (
  SELECT d.*, v.* EXCLUDE (f_video_id)
  FROM daily d JOIN vod v USING (f_video_id)
),
grains AS (
  SELECT 'day' AS f_grain,
         strftime(DATE '1970-01-01' + cast(day as int), '%Y-%m-%d') AS f_date, *
  FROM enriched
  UNION ALL
  SELECT 'week' AS f_grain,
         strftime(DATE '1970-01-01' + cast(((day - 4)//7)*7 + 4 as int), '%Y-%m-%d')
           AS f_date, *
  FROM enriched
  UNION ALL
  SELECT 'month' AS f_grain,
         strftime(DATE '1970-01-01' + cast(day as int), '%Y-%m') AS f_date, *
  FROM enriched
)
SELECT f_grain, f_date,
       cast(count(DISTINCT user_id) as bigint) AS f_count,
       f_video_id, f_video_name,
       f_province_id, f_province_name, f_city_id, f_city_name,
       f_region_id, f_region_name, f_terminal,
       f_content_type, f_cp_id, f_copyright,
       cast(0 as int) AS f_column_level, '' AS f_column_id, '' AS f_column_name,
       cast(0 as bigint) AS f_parent_column_id, '' AS f_parent_column_name,
       cast(0 as bigint) AS f_parent_parent_column_id,
       '' AS f_parent_parent_column_name,
       cast(sum(f_play_time) as bigint) AS f_video_time_sum,
       cast(max(duration) as bigint) AS f_duration,
       cast(sum(video_play) as bigint) AS f_click_num,
       cast(0 as bigint) AS f_screen, cast(0 as bigint) AS f_share,
       cast(max(f_series_num) as bigint) AS f_series_num,
       f_series_id, f_series_name
FROM grains
GROUP BY ALL
"""


@query("demand_period_grains", oracle=_DEMAND_PERIOD_ORACLE)
def demand_period_grains(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timegrid import explode_time_grid
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    geo = _geo_dim(spark, sf_dir)
    part = load_table(spark, sf_dir, "part")
    vod = part.select(
        F.col("p_partkey").cast("bigint").alias("f_video_id"),
        F.concat(F.lit("vd_"), F.col("p_partkey").cast("string")).alias("f_video_name"),
        (F.lit(1) + F.col("p_partkey") % 8).alias("f_content_type"),
        F.concat(F.lit("cp_"), (F.col("p_partkey") % 7).cast("string")).alias("f_cp_id"),
        (F.col("p_partkey") % 2).alias("f_copyright"),
        (F.lit(600) + (F.col("p_partkey") % 48) * 100).alias("duration"),
        F.expr("cast(p_partkey div 10 as bigint)").alias("f_series_id"),
        F.concat(F.lit("sr_"), F.expr("cast(p_partkey div 10 as string)")).alias(
            "f_series_name"
        ),
        (F.col("p_partkey") % 24).alias("f_series_num"),
    )
    k = F.coalesce(F.get_json_object("props", "$.k").cast("bigint"), F.lit(0))
    plays = (
        ev.where(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("ts_sec").alias("s"),
            F.floor(F.col("value") * 10).cast("bigint").alias("play"),
            (k % 200).alias("f_video_id"),
        )
        .where(F.col("play") > 0)
        .withColumn("e", F.col("s") + F.col("play"))
        .join(F.broadcast(geo), "user_id")
    )
    grid = explode_time_grid(plays, "s", "e", 86400, slot_col="slot")
    geo_keys = [
        "f_province_id", "f_province_name", "f_city_id", "f_city_name",
        "f_region_id", "f_region_name", "f_terminal",
    ]
    daily = (
        grid.withColumn("day", F.expr("slot div 86400"))
        .groupBy("day", "user_id", "f_video_id", *geo_keys)
        .agg(
            F.sum("overlap_sec").cast("bigint").alias("f_play_time"),
            F.sum(
                F.when(
                    (F.col("s") >= F.col("slot")) & (F.col("s") < F.col("slot") + 86400),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("video_play"),
        )
    )
    # enriched fans into the 3 grain branches — persist so the time-grid
    # explode + daily agg beneath it runs once (one row per (day, user,
    # video, geo), far smaller than the sliced fact)
    from pyspark.storagelevel import StorageLevel

    enriched = daily.join(F.broadcast(vod), "f_video_id").persist(
        StorageLevel.MEMORY_AND_DISK
    )

    day_label = F.expr("date_format(date_add(DATE'1970-01-01', cast(day as int)), 'yyyy-MM-dd')")
    week_label = F.expr(
        "date_format(date_add(DATE'1970-01-01',"
        " cast(floor((day - 4)/7)*7 + 4 as int)), 'yyyy-MM-dd')"
    )
    month_label = F.expr("date_format(date_add(DATE'1970-01-01', cast(day as int)), 'yyyy-MM')")
    grains = (
        enriched.select(F.lit("day").alias("f_grain"), day_label.alias("f_date"), "*")
        .unionByName(
            enriched.select(F.lit("week").alias("f_grain"), week_label.alias("f_date"), "*")
        )
        .unionByName(
            enriched.select(
                F.lit("month").alias("f_grain"), month_label.alias("f_date"), "*"
            )
        )
    )
    return grains.groupBy(
        "f_grain", "f_date", "f_video_id", "f_video_name", *geo_keys,
        "f_content_type", "f_cp_id", "f_copyright", "f_series_id", "f_series_name",
    ).agg(
        F.countDistinct("user_id").cast("bigint").alias("f_count"),
        F.lit(0).cast("int").alias("f_column_level"),
        F.lit("").alias("f_column_id"),
        F.lit("").alias("f_column_name"),
        F.lit(0).cast("bigint").alias("f_parent_column_id"),
        F.lit("").alias("f_parent_column_name"),
        F.lit(0).cast("bigint").alias("f_parent_parent_column_id"),
        F.lit("").alias("f_parent_parent_column_name"),
        F.sum("f_play_time").cast("bigint").alias("f_video_time_sum"),
        F.max("duration").cast("bigint").alias("f_duration"),
        F.sum("video_play").cast("bigint").alias("f_click_num"),
        F.lit(0).cast("bigint").alias("f_screen"),
        F.lit(0).cast("bigint").alias("f_share"),
        F.max("f_series_num").cast("bigint").alias("f_series_num"),
    )


# --------------------------------------------------------------------------
# DemandPackage.scala:14-120 — the demand PACKAGE report proper (distinct
# from DemandProgramPackage → package_program_periods): a watch record
# reaches a package through TWO bridge chains that the reference unions
# (:36-60):
#   group path  — series → t_group_program (:212-219) → package members;
#   column path — (series, terminal) → t_column_program × t_column_device
#                 (:76-99) → package members (packages can hold column ids
#                 as well as group ids).
# The union feeds orc_user_package at the per-user×series×video×device
# grain (getBasicUserDemand, :146-176) and the package watch rollup
# (getUserWatchPackage, :178-196) — returned here, pinning the whole
# chain.  (The user-tier rollup getUserCountPackage is pinned separately
# by demand_package_tiers.)
#
# Scale shape: every bridge is a tiny generated dim; the group path is
# pre-expanded across the 3 terminals so BOTH paths key on
# (series, terminal) and the fact passes ONCE through one broadcast join
# (the reference scans the watch log twice and unions — same rows, one
# scan here).  Aggregation is integral (play ticks), two-level re-agg.
_DEMAND_PKG_ORACLE = r"""
WITH pkg AS (
  SELECT p AS package_id,
         'pk_' || cast(p as varchar) AS package_name,
         'csp_' || cast(p % 5 as varchar) AS f_cp_sp,
         '[{"ids":"' || cast(p as varchar) || ',' || cast((p+3) % 20 as varchar)
           || '","type":"tA"},{"ids":"' || cast((p+7) % 20 as varchar) || ','
           || cast((p+11) % 20 as varchar) || ',' || cast((p+13) % 20 as varchar)
           || '","type":"tB"}]' AS program_ids
  FROM (SELECT unnest(generate_series(0, 19)) AS p)
),
frag AS (
  SELECT package_id, package_name, f_cp_sp,
         unnest(str_split(replace(regexp_extract(program_ids, '^\[(.+)\]$', 1),
                                  '},{', '}||{'), '||')) AS grp
  FROM pkg
),
members AS (
  SELECT package_id, package_name, f_cp_sp,
         cast(unnest(str_split(json_extract_string(grp, '$.ids'), ',')) as bigint)
           AS member_id
  FROM frag
),
gp AS (
  SELECT s AS f_series_id, (s*7 + 1) % 20 AS f_group_id
  FROM (SELECT unnest(generate_series(0, 19)) AS s)
),
sc AS (
  SELECT s AS f_series_id, (s*5 + 2) % 20 AS f_column_id, s % 6 AS f_tree_id
  FROM (SELECT unnest(generate_series(0, 19)) AS s) WHERE s % 3 != 1
),
tc AS (
  SELECT t AS f_tree_id, 1 + t % 3 AS f_terminal
  FROM (SELECT unnest(generate_series(0, 5)) AS t)
),
patha AS (
  SELECT m.package_id, m.package_name, m.f_cp_sp, g.f_series_id, tm.f_terminal
  FROM members m JOIN gp g ON g.f_group_id = m.member_id
  CROSS JOIN (SELECT unnest(generate_series(1, 3)) AS f_terminal) tm
),
pathb AS (
  SELECT m.package_id, m.package_name, m.f_cp_sp, s.f_series_id, t.f_terminal
  FROM members m JOIN sc s ON s.f_column_id = m.member_id
  JOIN tc t ON t.f_tree_id = s.f_tree_id
),
paths AS (SELECT * FROM patha UNION ALL SELECT * FROM pathb),
geo AS (
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
watch AS (
  SELECT e.user_id,
         (coalesce(cast(json_extract_string(e.props, '$.k') as bigint), 0) % 200) // 10
           AS f_series_id,
         coalesce(cast(json_extract_string(e.props, '$.k') as bigint), 0) % 50
           AS f_video_id,
         cast(floor(e.value*10) as bigint) AS play,
         g.f_terminal, g.f_region_id, g.f_region_name, g.f_city_id, g.f_city_name,
         g.f_province_id, g.f_province_name
  FROM events e JOIN geo g ON g.user_id = e.user_id
  WHERE e.event_type = 'click' AND cast(floor(e.value*10) as bigint) > 0
),
base AS (
  SELECT w.f_terminal, w.f_region_id, w.f_region_name,
         w.f_province_id, w.f_province_name, w.f_city_id, w.f_city_name,
         p.f_cp_sp, p.package_id AS f_package_id, p.package_name AS f_package_name,
         w.user_id,
         w.f_series_id, 'sr_' || cast(w.f_series_id as varchar) AS f_series_name,
         w.f_video_id, 'vd_' || cast(w.f_video_id as varchar) AS f_video_name,
         'dev_' || cast(w.user_id as varchar) AS f_device_id,
         cast(sum(w.play) as bigint) AS f_play_time,
         cast(count(*) as bigint) AS f_play_count
  FROM watch w JOIN paths p USING (f_series_id, f_terminal)
  GROUP BY ALL
)
SELECT f_terminal, f_region_id, f_region_name, f_province_id, f_province_name,
       f_city_id, f_city_name, f_cp_sp, f_package_id, f_package_name,
       cast(sum(f_play_count) as bigint) AS f_count,
       cast(sum(f_play_time) as bigint) AS f_play_time
FROM base
GROUP BY ALL
"""


@query("demand_package_report", oracle=_DEMAND_PKG_ORACLE)
def demand_package_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = F.col("id")
    members = (
        _package_bridge(spark)
        .drop("f_type")
        .withColumnRenamed("f_series_id", "member_id")
    )
    gp = spark.range(0, 20).select(
        s.alias("f_series_id"), ((s * 7 + 1) % 20).alias("f_group_id")
    )
    sc = (
        spark.range(0, 20)
        .where(s % 3 != 1)
        .select(
            s.alias("f_series_id"),
            ((s * 5 + 2) % 20).alias("f_column_id"),
            (s % 6).alias("f_tree_id"),
        )
    )
    tc = spark.range(0, 6).select(
        s.alias("f_tree_id"), (1 + s % 3).alias("f_terminal")
    )
    # group path pre-expanded across the 3 terminals (explode, not a cross
    # join → no BNL) so both paths share the (series, terminal) join key
    patha = (
        members.join(gp, members["member_id"] == gp["f_group_id"])
        .select(
            "package_id", "package_name", "f_cp_sp", "f_series_id",
            F.explode(
                F.array(*[F.lit(i).cast("long") for i in (1, 2, 3)])
            ).alias("f_terminal"),
        )
    )
    pathb = (
        members.join(sc, members["member_id"] == sc["f_column_id"])
        .join(tc, "f_tree_id")
        .select("package_id", "package_name", "f_cp_sp", "f_series_id", "f_terminal")
    )
    paths = patha.unionByName(pathb)

    geo = _geo_dim(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    kk = F.coalesce(F.get_json_object("props", "$.k").cast("bigint"), F.lit(0))
    watch = (
        ev.where(F.col("event_type") == "click")
        .select(
            "user_id",
            F.expr(
                "cast((coalesce(cast(get_json_object(props, '$.k') as bigint), 0)"
                " % 200) div 10 as bigint)"
            ).alias("f_series_id"),
            (kk % 50).alias("f_video_id"),
            F.floor(F.col("value") * 10).cast("bigint").alias("play"),
        )
        .where(F.col("play") > 0)
        .join(F.broadcast(geo), "user_id")
    )
    geo_keys = [
        "f_terminal", "f_region_id", "f_region_name",
        "f_province_id", "f_province_name", "f_city_id", "f_city_name",
    ]
    base = (
        watch.join(F.broadcast(paths), ["f_series_id", "f_terminal"])
        .groupBy(
            *geo_keys,
            "f_cp_sp",
            F.col("package_id").alias("f_package_id"),
            F.col("package_name").alias("f_package_name"),
            "user_id",
            "f_series_id",
            "f_video_id",
        )
        .agg(
            F.sum("play").cast("bigint").alias("f_play_time"),
            F.count(F.lit(1)).cast("bigint").alias("f_play_count"),
        )
        .select(
            "*",
            F.concat(F.lit("sr_"), F.col("f_series_id").cast("string")).alias(
                "f_series_name"
            ),
            F.concat(F.lit("vd_"), F.col("f_video_id").cast("string")).alias(
                "f_video_name"
            ),
            F.concat(F.lit("dev_"), F.col("user_id").cast("string")).alias(
                "f_device_id"
            ),
        )
    )
    return base.groupBy(*geo_keys, "f_cp_sp", "f_package_id", "f_package_name").agg(
        F.sum("f_play_count").cast("bigint").alias("f_count"),
        F.sum("f_play_time").cast("bigint").alias("f_play_time"),
    )
