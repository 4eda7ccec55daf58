"""User-analysis report families (cn.ipanel.homed.repots analysis jobs)
re-expressed over the synthetic tables.

Reference jobs covered here:

- ``NewAnalysis.scala`` — new vs returning users per day (first-login
  derivation at NewAnalysis.scala:131: ``min(f_create_time)`` per account).
- ``ActiveAnalysis.scala`` — per-user activity profile: per-playtype time
  sums and counts (ActiveAnalysis.scala:102-114 conditional sums) plus an
  activity tier (the browse/hobby/steady tiering of ChannelReport.scala:169).
- ``BindAnalysis.scala`` — account↔device binding degrees
  (BindAnalysis.scala:57-58); here the customer↔supplier bipartite degree
  distribution, the same two-stage distinct-count + histogram shape.
- ``PlayCount.scala`` — day × playtype × content-provider play counts with
  null-CP coalesced to 'other' (PlayCount.scala:117,127-129).
- ``RecommendSuccessRate.scala`` / ``HitAnalysis.scala`` — conversion rate:
  views followed by a purchase by the same user within a tolerance window.

Scale notes (100 TB): every query below is one or two hash aggregations on
a single shuffle key plus (for the conversion query) one equi-join on
``user_id`` with a time-range residual — no cross joins, no driver
collection, no UDFs.  ``new_vs_returning`` reuses the ``user_id``
partitioning across distinct → min → join, so AQE plans a single exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hash64_sql
from .core_relational import dsum
from .homed_behavior import EV_SEC, events_sec
from .registry import query

DAY = 86400


def _with_day(df: DataFrame) -> DataFrame:
    return df.withColumn("day", (F.col("sec") / DAY).cast("bigint") * DAY)


# --------------------------------------------------------------------------
# NewAnalysis — per day: users first seen that day vs returning users.
@query(
    "new_vs_returning",
    oracle=f"""
    WITH ev AS ({EV_SEC}),
    daily AS (
      SELECT DISTINCT user_id, (sec//{DAY})*{DAY} AS day FROM ev
    ),
    first_seen AS (
      SELECT user_id, min(day) AS first_day FROM daily GROUP BY user_id
    )
    SELECT d.day,
           cast(sum(CASE WHEN d.day = f.first_day THEN 1 ELSE 0 END) as bigint) AS n_new,
           cast(sum(CASE WHEN d.day > f.first_day THEN 1 ELSE 0 END) as bigint) AS n_returning
    FROM daily d JOIN first_seen f USING (user_id)
    GROUP BY d.day
    """,
)
def new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning daily split (NewAnalysis.scala:131 ``min(create
    time)`` per account).  distinct → groupBy → join all share the
    ``user_id`` hash partitioning, so Catalyst plans one exchange and the
    self-join is co-partitioned (no second shuffle of the big side)."""
    daily = _with_day(events_sec(spark, sf_dir)).select("user_id", "day").distinct()
    first_seen = daily.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        daily.join(first_seen, "user_id")
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_new"),
            F.sum(F.when(F.col("day") > F.col("first_day"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_returning"),
        )
    )


# --------------------------------------------------------------------------
# ActiveAnalysis — per-user activity profile with conditional per-type sums.
@query(
    "user_activity_profile",
    oracle=f"""
    WITH ev AS ({EV_SEC})
    SELECT user_id,
           cast(count(*) as bigint) AS n_events,
           cast(count(DISTINCT (sec//{DAY})*{DAY}) as bigint) AS active_days,
           min(sec) AS first_sec,
           max(sec) AS last_sec,
           cast(sum(CASE WHEN event_type = 'view'
                         THEN cast(value as decimal(27,6)) ELSE 0 END) as double) AS view_time,
           cast(sum(CASE WHEN event_type = 'click'
                         THEN cast(value as decimal(27,6)) ELSE 0 END) as double) AS click_time,
           cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) as bigint) AS n_purchases,
           CASE WHEN count(DISTINCT (sec//{DAY})*{DAY}) >= 15 THEN 'steady'
                WHEN count(DISTINCT (sec//{DAY})*{DAY}) >= 5 THEN 'hobby'
                ELSE 'browse' END AS tier
    FROM ev GROUP BY user_id
    """,
)
def user_activity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user profile (ActiveAnalysis.scala:102-114): conditional
    per-playtype sums in ONE pass — the reference chained two groupBys
    (user,device,playType then user,device); Catalyst's partial aggregation
    makes the single-pass spelling strictly cheaper at scale."""
    ev = _with_day(events_sec(spark, sf_dir))
    active_days = F.countDistinct("day")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        active_days.cast("bigint").alias("active_days"),
        F.min("sec").alias("first_sec"),
        F.max("sec").alias("last_sec"),
        dsum(F.when(F.col("event_type") == "view", F.col("value")).otherwise(0), "view_time"),
        dsum(F.when(F.col("event_type") == "click", F.col("value")).otherwise(0), "click_time"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("n_purchases"),
        F.when(active_days >= 15, "steady")
        .when(active_days >= 5, "hobby")
        .otherwise("browse")
        .alias("tier"),
    )


# --------------------------------------------------------------------------
# BindAnalysis — bipartite degree histogram (account↔device ↦ cust↔supplier).
@query(
    "bind_degree_histogram",
    oracle="""
    WITH deg AS (
      SELECT o.o_custkey AS custkey,
             cast(count(DISTINCT l.l_suppkey) as bigint) AS degree
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_custkey
    )
    SELECT degree, cast(count(*) as bigint) AS n_customers
    FROM deg GROUP BY degree
    """,
)
def bind_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many distinct suppliers each customer bought from, then the
    degree histogram (BindAnalysis.scala:57-58 account↔device degrees).
    Fact-fact join on ``l_orderkey`` — at 100 TB this is the bucketed-join
    candidate (see sinks.write_bucketed); the distinct-count re-keys once
    on custkey, and the tiny histogram agg is map-side combinable."""
    from ..sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    deg = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_custkey")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))


# --------------------------------------------------------------------------
# PlayCount — day × playtype × content-provider rollup, null CP → 'other'.
@query(
    "play_count_cp",
    oracle=f"""
    WITH ev AS (
      SELECT event_type,
             value,
             ((epoch_us(ts)//1000000)//{DAY})*{DAY} AS day,
             coalesce(cast(cast(json_extract_string(props, '$.k') as bigint) % 7 as varchar),
                      'other') AS cp_id
      FROM events
    )
    SELECT day, event_type, cp_id,
           cast(count(*) as bigint) AS n_plays,
           cast(cast(sum(cast(value as decimal(27,6))) as varchar) as double) AS total_time
    FROM ev GROUP BY day, event_type, cp_id
    """,
)
def play_count_cp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PlayCount.scala:127-129 ``groupBy(playtypes, day, f_cp_id)`` with the
    null-CP → 'other' coalesce of PlayCount.scala:117.  One hash
    aggregation; the CP id comes out of the ``props`` JSON the same way the
    reference pulled ``exts['...']``."""
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        ((F.col("ts_sec") / DAY).cast("bigint") * DAY).alias("day"),
        F.coalesce(
            (F.get_json_object("props", "$.k").cast("bigint") % 7).cast("string"),
            F.lit("other"),
        ).alias("cp_id"),
    )
    return ev.groupBy("day", "event_type", "cp_id").agg(
        F.count(F.lit(1)).alias("n_plays"),
        dsum(F.col("value"), "total_time"),
    )


# --------------------------------------------------------------------------
# RecommendSuccessRate / HitAnalysis — view→purchase conversion within 600 s.
CONV_TOLERANCE = 600


@query(
    "view_to_purchase_conversion",
    oracle=f"""
    WITH ev AS ({EV_SEC}),
    views AS (
      SELECT user_id, event_id, sec FROM ev WHERE event_type = 'view'
    ),
    purchases AS (
      SELECT user_id, sec FROM ev WHERE event_type = 'purchase'
    ),
    conv AS (
      SELECT v.user_id, v.event_id, v.sec,
             max(CASE WHEN p.sec IS NOT NULL THEN 1 ELSE 0 END) AS converted
      FROM views v LEFT JOIN purchases p
        ON v.user_id = p.user_id
       AND p.sec >= v.sec AND p.sec <= v.sec + {CONV_TOLERANCE}
      GROUP BY v.user_id, v.event_id, v.sec
    )
    SELECT (sec//{DAY})*{DAY} AS day,
           cast(count(*) as bigint) AS n_views,
           cast(sum(converted) as bigint) AS n_converted,
           cast(sum(converted) as double) / count(*) AS conv_rate
    FROM conv GROUP BY 1
    """,
)
def view_to_purchase_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did a view convert to a purchase within 10 minutes?
    (RecommendSuccessRate.scala's search→play success ratio.)  Equi-join on
    ``user_id`` with a time-range residual — a hash join, NOT a nested
    loop, because the equi key carries it; per-user event counts bound the
    worst-case pair fan-out, and the aggregate collapses it immediately."""
    ev = events_sec(spark, sf_dir)
    views = ev.where(F.col("event_type") == "view").select("user_id", "event_id", "sec")
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("sec").alias("p_sec"))
    )
    conv = (
        views.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_sec") >= F.col("sec"))
            & (F.col("p_sec") <= F.col("sec") + CONV_TOLERANCE),
            "left",
        )
        .groupBy("user_id", "event_id", "sec")
        .agg(F.max(F.when(F.col("p_sec").isNotNull(), 1).otherwise(0)).alias("converted"))
    )
    return conv.groupBy(((F.col("sec") / DAY).cast("bigint") * DAY).alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_views"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        (F.sum("converted").cast("double") / F.count(F.lit(1))).alias("conv_rate"),
    )


# --------------------------------------------------------------------------
# DemandWatch — completion-ratio buckets (watched / duration histograms).
@query(
    "demand_completion_buckets",
    oracle="""
    WITH j AS (
      SELECT p.p_brand,
             cast(floor(l.l_extendedprice / (p.p_retailprice * l.l_quantity) * 10) as bigint)
               AS ratio_bucket
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    )
    SELECT p_brand, ratio_bucket, cast(count(*) as bigint) AS n_items
    FROM j GROUP BY p_brand, ratio_bucket
    """,
)
def demand_completion_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DemandWatch completion-rate histogram shape: per-item ratio of
    realized to nominal value, floored into tenth buckets, counted per
    brand.  The part dim broadcasts; the only shuffle is the final tiny
    (brand × bucket) hash agg with map-side partials."""
    from ..sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_quantity"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_retailprice")
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"]).select(
        "p_brand",
        F.floor(
            F.col("l_extendedprice") / (F.col("p_retailprice") * F.col("l_quantity")) * 10
        )
        .cast("bigint")
        .alias("ratio_bucket"),
    )
    return j.groupBy("p_brand", "ratio_bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items")
    )


# --------------------------------------------------------------------------
# LiveChannelStatisticByTimerange — per-slot channel share of viewing.
@query(
    "timerange_channel_share",
    oracle="""
    WITH ev AS (
      SELECT DISTINCT user_id,
             coalesce(cast(json_extract_string(props, '$.k') as bigint), 0) % 10 AS channel_id,
             ((epoch_us(ts)//1000000)//1800)*1800 AS slot_start
      FROM events
    ),
    agg AS (
      SELECT slot_start, channel_id, cast(count(*) as bigint) AS uv
      FROM ev GROUP BY 1, 2
    )
    SELECT slot_start, channel_id, uv,
           cast(uv as double) / sum(uv) OVER (PARTITION BY slot_start) AS share
    FROM agg
    """,
)
def timerange_channel_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LiveChannelStatisticByTimerange.scala audience-share: per half-hour
    slot, each channel's distinct viewers and its share of the slot's
    viewing.  The share is a window sum OVER the already-aggregated
    (slot × channel) frame — thousands of rows, not the raw fact — so the
    second pass is negligible at any scale."""
    from pyspark.sql import Window

    from ..sources.tables import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            (F.coalesce(F.get_json_object("props", "$.k").cast("bigint"), F.lit(0)) % 10)
            .alias("channel_id"),
            ((F.col("ts_sec") / 1800).cast("bigint") * 1800).alias("slot_start"),
        )
        .distinct()
    )
    agg = ev.groupBy("slot_start", "channel_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("uv")
    )
    w = Window.partitionBy("slot_start")
    return agg.withColumn("share", F.col("uv").cast("double") / F.sum("uv").over(w))


# --------------------------------------------------------------------------
# TotalUserStatistics — cumulative registered-user snapshot by day.
@query(
    "cumulative_user_snapshot",
    oracle=f"""
    WITH ev AS ({EV_SEC}),
    first_seen AS (
      SELECT user_id, min((sec//{DAY})*{DAY}) AS first_day FROM ev GROUP BY user_id
    ),
    daily_new AS (
      SELECT first_day AS day, cast(count(*) as bigint) AS n_new
      FROM first_seen GROUP BY first_day
    )
    SELECT day, n_new,
           cast(sum(n_new) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) as bigint) AS cum_users
    FROM daily_new
    """,
)
def cumulative_user_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TotalUserStatistics cumulative-accounts snapshot: daily first-seen
    counts plus a running total.  The global ordered window runs over the
    ~one-row-per-day aggregate, not the fact table — a deliberate
    single-partition window on a tiny frame (the reference kept this
    snapshot in MySQL and added to it daily)."""

    ev = _with_day(events_sec(spark, sf_dir))
    first_seen = ev.groupBy("user_id").agg(F.min("day").alias("first_day"))
    daily_new = first_seen.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new")
    )
    # the running total runs over ONE ROW PER CALENDAR DAY (~365/year —
    # bounded by time, not by data volume), so the day series is collected
    # and prefix-summed driver-side, exactly like the reference's
    # read-yesterday's-MySQL-row-and-add; a global window here would drag
    # the tiny frame through a partition-less WindowExec.
    from pyspark.sql.types import LongType, StructField, StructType

    # bound guard: one row per calendar day; 100k days ≈ 270 years — past
    # that the "bounded by time" premise is broken, so fail loudly
    from ..operators.aggregate import bounded_collect

    rows = bounded_collect(
        daily_new.orderBy("day"), 100_000, "daily-new calendar series"
    )
    cum = 0
    out = []
    for r in rows:
        cum += r["n_new"]
        out.append((r["day"], r["n_new"], cum))
    schema = StructType(
        [
            StructField("day", daily_new.schema["day"].dataType, True),
            StructField("n_new", LongType(), True),
            StructField("cum_users", LongType(), True),
        ]
    )
    return spark.createDataFrame(out, schema)


# --------------------------------------------------------------------------
# AdInfo / ClickUpload — per-ad views, clicks, click-through rate.
@query(
    "ad_click_ctr",
    oracle="""
    WITH ev AS (
      SELECT coalesce(cast(json_extract_string(props, '$.k') as bigint), 0) % 20 AS ad_id,
             event_type
      FROM events WHERE event_type IN ('view', 'click')
    )
    SELECT ad_id,
           cast(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) as bigint) AS n_views,
           cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) as bigint) AS n_clicks,
           CASE WHEN sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) = 0 THEN NULL
                ELSE cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) as double)
                     / sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) END AS ctr
    FROM ev GROUP BY ad_id
    """,
)
def ad_click_ctr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AdInfo/ClickUpload ad report: impressions, clicks, CTR per ad slot.
    The type filter reaches the parquet scan (PushedFilters), the agg is a
    single map-side-combinable pass, and the CTR division happens on the
    20-row result."""
    from ..sources.tables import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("view", "click"))
        .select(
            (F.coalesce(F.get_json_object("props", "$.k").cast("bigint"), F.lit(0)) % 20)
            .alias("ad_id"),
            "event_type",
        )
    )
    views = F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
    clicks = F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
    return ev.groupBy("ad_id").agg(
        views.cast("bigint").alias("n_views"),
        clicks.cast("bigint").alias("n_clicks"),
        F.when(views == 0, F.lit(None).cast("double"))
        .otherwise(clicks.cast("double") / views)
        .alias("ctr"),
    )


# --------------------------------------------------------------------------
# cn.ipanel.customization — pluggable site hooks (hunan/wuhu).
DA_LO, DA_HI = 30, 120  # "normal DA range" analog (HNLogParser.scala:25)


@query(
    "site_filtered_visits",
    oracle=f"""
    WITH real_users AS (
      SELECT user_id, cast(user_id as bigint) AS region_key
      FROM events WHERE user_id BETWEEN {DA_LO} AND {DA_HI}
    ),
    guests AS (
      SELECT e.user_id, coalesce(c.c_nationkey, -1) AS region_key
      FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
      WHERE e.user_id NOT BETWEEN {DA_LO} AND {DA_HI}
    ),
    unioned AS (
      SELECT 'real' AS cohort, region_key FROM real_users
      UNION ALL
      SELECT 'guest' AS cohort, region_key FROM guests
    )
    SELECT cohort, region_key, cast(count(*) as bigint) AS n_visits
    FROM unioned GROUP BY cohort, region_key
    """,
)
def site_filtered_visits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Site-customization hook parity (cn.ipanel.customization): the hunan
    guest rule keeps ids OUTSIDE the normal DA range and remaps them
    through a left join with a default fallback (HNLogParser.scala:21-41
    ``nvl(c.region_id, default)``); wuhu inner-joins to effective users
    (wuhu/etl/LogProcess.scala:12-14).  Expressed as a split → per-cohort
    enrichment → unionByName — the hook is a predicate + join, not a UDF."""
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id")
    in_range = F.col("user_id").between(DA_LO, DA_HI)
    real = ev.where(in_range).select(
        F.lit("real").alias("cohort"), F.col("user_id").cast("bigint").alias("region_key")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    guests = (
        ev.where(~in_range)
        .join(F.broadcast(cust), ev["user_id"] == cust["c_custkey"], "left")
        .select(
            F.lit("guest").alias("cohort"),
            F.coalesce(F.col("c_nationkey").cast("bigint"), F.lit(-1)).alias("region_key"),
        )
    )
    return (
        real.unionByName(guests)
        .groupBy("cohort", "region_key")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_visits"))
    )


# --------------------------------------------------------------------------
# ColumnAndVideoReport.get_end_times — schedule end arithmetic + overlap scan.
@query(
    "program_schedule_relations",
    oracle="""
    WITH sched AS (
      SELECT coalesce(cast(json_extract_string(props, '$.k') as bigint), 0) % 10 AS channel_id,
             event_id,
             epoch_us(ts)//1000000 AS start_sec,
             epoch_us(ts)//1000000 + cast(floor(value) as bigint) * 60 AS end_sec
      FROM events WHERE event_type = 'purchase'
    ),
    nexted AS (
      SELECT *, lead(start_sec) OVER (PARTITION BY channel_id
                                      ORDER BY start_sec, event_id) AS next_start
      FROM sched
    )
    SELECT channel_id,
           CASE WHEN next_start IS NULL THEN 'last'
                WHEN next_start < end_sec THEN 'overlap'
                WHEN next_start = end_sec THEN 'adjacent'
                ELSE 'gap' END AS relation,
           cast(count(*) as bigint) AS n_programs
    FROM nexted GROUP BY 1, 2
    """,
)
def program_schedule_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPG end-time arithmetic (ColumnAndVideoReport.scala:337
    ``get_end_times`` = start + duration) plus the lead()-based
    next-program comparison the reference used to cap sessions — here
    classifying each program's relation to its successor (overlap / gap /
    adjacent).  One window shuffle on the channel key, then a tiny agg."""
    from pyspark.sql import Window

    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    sched = ev.select(
        (F.coalesce(F.get_json_object("props", "$.k").cast("bigint"), F.lit(0)) % 10)
        .alias("channel_id"),
        "event_id",
        F.col("ts_sec").alias("start_sec"),
        (F.col("ts_sec") + F.floor("value").cast("bigint") * 60).alias("end_sec"),
    )
    w = Window.partitionBy("channel_id").orderBy("start_sec", "event_id")
    nexted = sched.withColumn("next_start", F.lead("start_sec").over(w))
    relation = (
        F.when(F.col("next_start").isNull(), "last")
        .when(F.col("next_start") < F.col("end_sec"), "overlap")
        .when(F.col("next_start") == F.col("end_sec"), "adjacent")
        .otherwise("gap")
    )
    return (
        nexted.select("channel_id", relation.alias("relation"))
        .groupBy("channel_id", "relation")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_programs"))
    )


# --------------------------------------------------------------------------
# Lookback family — daily channel report + the *Period re-aggregation.
@query(
    "lookback_channel_grains",
    oracle=f"""
    WITH lb AS (
      SELECT user_id,
             coalesce(cast(json_extract_string(props, '$.k') as bigint), 0) % 10 AS channel_id,
             ((epoch_us(ts)//1000000)//{DAY})*{DAY} AS day,
             value
      FROM events WHERE event_type = 'error'
    ),
    daily AS (
      SELECT day, channel_id,
             cast(count(*) as bigint) AS vv,
             cast(count(DISTINCT user_id) as bigint) AS uv,
             cast(cast(sum(cast(value as decimal(27,6))) as varchar) as double) AS total_time
      FROM lb GROUP BY day, channel_id
    ),
    weekly AS (
      SELECT (day // {7 * DAY}) * {7 * DAY} AS day, channel_id,
             cast(sum(vv) as bigint) AS vv,
             cast(count(*) as bigint) AS uv_days,
             cast(cast(sum(cast(total_time as decimal(27,6))) as varchar) as double) AS total_time
      FROM daily GROUP BY 1, channel_id
    )
    SELECT 'day' AS grain, day, channel_id, vv,
           uv AS uv_or_updays, total_time FROM daily
    UNION ALL
    SELECT 'week' AS grain, day, channel_id, vv,
           uv_days AS uv_or_updays, total_time FROM weekly
    """,
)
def lookback_channel_grains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lookback report family (LookBackReport.scala + LookbackReportPeriod
    .scala): the daily channel report, then the WEEK grain re-aggregated
    FROM THE DAILY REPORT, not from the fact table — the reference's
    period-report pattern (re-read yesterday's report table, roll it up,
    SURVEY §2.4 A7).  The weekly pass touches |days × channels| rows, so at
    100 TB it is free compared to a second fact scan.  (Weekly user-days,
    not distinct users — same as the reference's period tables, which could
    not re-distinct either; exact multi-period distinct lives in
    multi_period_distinct_users.)"""
    from ..sources.tables import load_table

    lb = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "error")
        .select(
            "user_id",
            (F.coalesce(F.get_json_object("props", "$.k").cast("bigint"), F.lit(0)) % 10)
            .alias("channel_id"),
            ((F.col("ts_sec") / DAY).cast("bigint") * DAY).alias("day"),
            "value",
        )
    )
    daily = lb.groupBy("day", "channel_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("vv"),
        F.countDistinct("user_id").cast("bigint").alias("uv"),
        dsum(F.col("value"), "total_time"),
    )
    weekly = (
        daily.groupBy(
            ((F.col("day") / (7 * DAY)).cast("bigint") * (7 * DAY)).alias("day"),
            F.col("channel_id"),
        )
        .agg(
            F.sum("vv").cast("bigint").alias("vv"),
            F.count(F.lit(1)).cast("bigint").alias("uv_days"),
            dsum(F.col("total_time"), "total_time"),
        )
    )
    d = daily.select(
        F.lit("day").alias("grain"), "day", "channel_id", "vv",
        F.col("uv").alias("uv_or_updays"), "total_time",
    )
    w = weekly.select(
        F.lit("week").alias("grain"), "day", "channel_id", "vv",
        F.col("uv_days").alias("uv_or_updays"), "total_time",
    )
    return d.unionByName(w)


# --------------------------------------------------------------------------
# LookbackUser — per-user lookback grain: distinct lookback USERS per
# (geo, terminal, content_type) at day + history grains.
@query(
    "lookback_user_grains",
    oracle=f"""
    WITH lb AS (
      SELECT e.user_id,
             CASE WHEN (e.event_id * 37) % 100000 < 50000
                  THEN 'tv' ELSE 'mobile' END AS terminal,
             1 + coalesce(cast(json_extract_string(e.props, '$.k') as bigint), 0) % 3
               AS content_type,
             coalesce(c.c_nationkey, -1) AS region_id,
             ((epoch_us(e.ts)//1000000)//{DAY})*{DAY} AS day
      FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
      WHERE e.event_type = 'error'
    ),
    by_day AS (
      SELECT 1 AS f_type, day AS f_start_date, day AS f_end_date,
             region_id, terminal, content_type,
             cast(count(DISTINCT user_id) as bigint) AS f_count
      FROM lb GROUP BY day, region_id, terminal, content_type
    ),
    history AS (
      SELECT 3 AS f_type,
             cast(min(day) as bigint) AS f_start_date,
             cast(max(day) as bigint) AS f_end_date,
             region_id, terminal, content_type,
             cast(count(DISTINCT user_id) as bigint) AS f_count
      FROM lb GROUP BY region_id, terminal, content_type
    )
    SELECT * FROM by_day UNION ALL SELECT * FROM history
    """,
)
def lookback_user_grains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LookbackUser.scala:35-73 — the per-USER lookback grain (distinct
    lookback users per geo x terminal x content_type), day grain plus the
    multi-day ``getLookUserHistory`` range marked with ``f_type`` (the
    reference tags week-history rows ``f_type=3``).  The reference filters
    ``f_content_type != 0``; the synthetic content_type is ``1 + k%3`` so
    the filter is structurally satisfied and every row carries a non-zero
    type.  Scale: the fact shuffles once per grain on the group keys
    (count-distinct re-shuffles on +user_id internally), the customer geo
    dim is broadcast; the history grain aggregates the SAME pre-filtered
    fact, so adding grains adds map-side work, not extra scans."""
    from ..sources.tables import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "error")
        .select("user_id", "event_id", "props", "ts_sec")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    lb = (
        ev.join(F.broadcast(cust), ev["user_id"] == cust["c_custkey"], "left")
        .select(
            "user_id",
            F.when((F.col("event_id") * 37) % 100000 < 50000, "tv")
            .otherwise("mobile")
            .alias("terminal"),
            (
                1
                + F.coalesce(
                    F.get_json_object("props", "$.k").cast("bigint"), F.lit(0)
                )
                % 3
            ).alias("content_type"),
            F.coalesce(F.col("c_nationkey").cast("bigint"), F.lit(-1)).alias("region_id"),
            ((F.col("ts_sec") / DAY).cast("bigint") * DAY).alias("day"),
        )
    )
    by_day = (
        lb.groupBy("day", "region_id", "terminal", "content_type")
        .agg(F.countDistinct("user_id").cast("bigint").alias("f_count"))
        .select(
            F.lit(1).alias("f_type"),
            F.col("day").alias("f_start_date"),
            F.col("day").alias("f_end_date"),
            "region_id", "terminal", "content_type", "f_count",
        )
    )
    history = (
        lb.groupBy("region_id", "terminal", "content_type")
        .agg(
            F.min("day").cast("bigint").alias("f_start_date"),
            F.max("day").cast("bigint").alias("f_end_date"),
            F.countDistinct("user_id").cast("bigint").alias("f_count"),
        )
        .select(
            F.lit(3).alias("f_type"), "f_start_date", "f_end_date",
            "region_id", "terminal", "content_type", "f_count",
        )
    )
    return by_day.unionByName(history)


# --------------------------------------------------------------------------
# OnlineUsersAndDevices — per-slot per-terminal concurrency with ALL rollup.
@query(
    "online_users_devices",
    oracle="""
    WITH ev AS (
      SELECT DISTINCT user_id,
             CASE WHEN (event_id * 37) % 100000 < 50000 THEN 'tv' ELSE 'mobile' END AS terminal,
             ((epoch_us(ts)//1000000)//1800)*1800 AS slot_start
      FROM events
    )
    SELECT slot_start, coalesce(terminal, 'ALL') AS terminal,
           cast(count(*) as bigint) AS n_user_terminals
    FROM ev GROUP BY GROUPING SETS ((slot_start, terminal), (slot_start))
    """,
)
def online_users_devices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OnlineUsersAndDevices.scala: per half-hour online user counts split
    by terminal class plus the ALL row — one-pass GROUPING SETS where the
    reference aggregated each grain separately and unioned (A6).  NB the
    ALL row counts (user × terminal) pairs, as the reference's summed rows
    did."""
    from ..sources.tables import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.when((F.col("event_id") * 37) % 100000 < 50000, "tv")
            .otherwise("mobile")
            .alias("terminal"),
            ((F.col("ts_sec") / 1800).cast("bigint") * 1800).alias("slot_start"),
        )
        .distinct()
    )
    grouped = ev.groupingSets(
        [["slot_start", "terminal"], ["slot_start"]], "slot_start", "terminal"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_user_terminals"))
    return grouped.select(
        "slot_start",
        F.coalesce("terminal", F.lit("ALL")).alias("terminal"),
        "n_user_terminals",
    )


# --------------------------------------------------------------------------
# NginxLogParseForLabel — URL parsing with the parse_url built-in.
@query(
    "nginx_url_parse",
    oracle="""
    WITH req AS (
      SELECT 'cdn' || cast(coalesce(cast(json_extract_string(props, '$.k') as bigint), 0) % 3 as varchar)
               || '.example.com' AS host,
             '/video/' || cast(event_id % 50 as varchar) AS path,
             cast(user_id as varchar) AS quser
      FROM events
    )
    SELECT host, path,
           cast(count(*) as bigint) AS n_requests,
           cast(count(DISTINCT quser) as bigint) AS n_users
    FROM req GROUP BY host, path
    """,
)
def nginx_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nginx access-log URL analysis (etl/NginxLogParseForLabel.scala:25-35
    pulls k-v params out of request URLs).  The engine side BUILDS the URL
    string and then actually parses it with Spark's `parse_url`
    (HOST/PATH/QUERY:user) — the oracle reconstructs the components
    directly, so the parse itself is what's being verified.  Pure
    projection + one compact-key agg."""
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    url = F.concat(
        F.lit("http://cdn"),
        (F.coalesce(F.get_json_object("props", "$.k").cast("bigint"), F.lit(0)) % 3).cast("string"),
        F.lit(".example.com/video/"),
        (F.col("event_id") % 50).cast("string"),
        F.lit("?user="),
        F.col("user_id").cast("string"),
    )
    req = ev.select(
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("user")).alias("quser"),
    )
    return req.groupBy("host", "path").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_requests"),
        F.countDistinct("quser").cast("bigint").alias("n_users"),
    )


# --------------------------------------------------------------------------
# DemandUser — 7-day cohort retention from the daily-active grain.
@query(
    "weekly_cohort_retention",
    oracle=f"""
    WITH ev AS ({EV_SEC}),
    daily AS (SELECT DISTINCT user_id, (sec//{DAY})*{DAY} AS day FROM ev)
    SELECT a.day AS cohort_day,
           cast(count(*) as bigint) AS n_active,
           cast(sum(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS n_retained,
           cast(sum(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END) as double)
             / count(*) AS retention_rate
    FROM daily a LEFT JOIN daily b
      ON a.user_id = b.user_id AND b.day = a.day + {7 * DAY}
    GROUP BY a.day
    """,
)
def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D+7 retention per activity cohort (DemandUser.scala's
    repeat-demand-user analysis): the daily-active grain self-joins onto
    itself shifted a week — both sides hash-partition on ``user_id``, so
    the self-join reuses one exchange; the retention division runs on the
    per-day aggregate."""
    daily = _with_day(events_sec(spark, sf_dir)).select("user_id", "day").distinct()
    future = daily.select(
        F.col("user_id").alias("b_user"), F.col("day").alias("b_day")
    )
    joined = daily.join(
        future,
        (F.col("user_id") == F.col("b_user"))
        & (F.col("b_day") == F.col("day") + 7 * DAY),
        "left",
    )
    retained = F.sum(F.when(F.col("b_user").isNotNull(), 1).otherwise(0))
    return joined.groupBy(F.col("day").alias("cohort_day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active"),
        retained.cast("bigint").alias("n_retained"),
        (retained.cast("double") / F.count(F.lit(1))).alias("retention_rate"),
    )


# --------------------------------------------------------------------------
# BusinessRevenue — monthly revenue with month-over-month movement.
@query(
    "monthly_revenue_mom",
    oracle="""
    WITH m AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
             cast(count(*) as bigint) AS n_orders,
             cast(cast(sum(cast(o_totalprice as decimal(27,6))) as varchar) as double) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT month, n_orders, revenue,
           lag(revenue) OVER (ORDER BY month) AS prev_revenue,
           revenue - lag(revenue) OVER (ORDER BY month) AS mom_delta
    FROM m
    """,
)
def monthly_revenue_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BusinessRevenue.scala's month-over-month revenue movement: monthly
    agg (one shuffle), then lag() on the ~80-row month series — the
    reference read last month's report row back from MySQL to compute the
    delta; here it's a window over the aggregate."""

    from ..sources.tables import load_table

    m = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            dsum(F.col("o_totalprice"), "revenue"),
        )
    )
    # the lag() frame is ONE ROW PER CALENDAR MONTH (~80 here — bounded by
    # time, not data volume): collect the month series and pair each row
    # with its predecessor driver-side, as the reference did by reading last
    # month's report row back from MySQL.  A global window would force a
    # partition-less WindowExec for an 80-row frame.
    from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

    # bound guard: one row per calendar month; 100k months ≈ 8k years
    from ..operators.aggregate import bounded_collect

    rows = bounded_collect(
        m.orderBy("month"), 100_000, "monthly calendar series"
    )
    out = []
    prev = None
    for r in rows:
        out.append(
            (
                r["month"],
                r["n_orders"],
                r["revenue"],
                prev,
                (r["revenue"] - prev) if prev is not None else None,
            )
        )
        prev = r["revenue"]
    schema = StructType(
        [
            StructField("month", StringType(), True),
            StructField("n_orders", LongType(), True),
            StructField("revenue", DoubleType(), True),
            StructField("prev_revenue", DoubleType(), True),
            StructField("mom_delta", DoubleType(), True),
        ]
    )
    return spark.createDataFrame(out, schema)


# --------------------------------------------------------------------------
# OpenTime — signup → first-view activation latency per cohort day.
@query(
    "activation_latency",
    oracle=f"""
    WITH ev AS ({EV_SEC}),
    su AS (
      SELECT user_id, min(sec) AS signup_sec FROM ev
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    fv AS (
      SELECT e.user_id, min(e.sec) AS first_view_sec
      FROM ev e JOIN su ON e.user_id = su.user_id AND e.sec >= su.signup_sec
      WHERE e.event_type = 'view'
      GROUP BY e.user_id
    ),
    j AS (
      SELECT su.user_id, su.signup_sec, fv.first_view_sec,
             (su.signup_sec//{DAY})*{DAY} AS cohort_day
      FROM su LEFT JOIN fv ON su.user_id = fv.user_id
    )
    SELECT cohort_day,
           cast(count(*) as bigint) AS n_signups,
           cast(count(first_view_sec) as bigint) AS n_activated,
           cast(cast(sum(cast(first_view_sec - signup_sec as decimal(27,6))) as varchar) as double)
             / nullif(count(first_view_sec), 0) AS avg_latency_sec
    FROM j GROUP BY cohort_day
    """,
)
def activation_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OpenTime.scala's open-to-first-use latency: earliest signup per
    user, earliest view AT-OR-AFTER it (equi join on user_id + time
    residual), then per-cohort-day activation counts and mean latency.
    Both mins and the join key on ``user_id`` — one partitioning reused
    across all three steps."""
    ev = events_sec(spark, sf_dir)
    su = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("sec").alias("signup_sec"))
    )
    fv = (
        ev.where(F.col("event_type") == "view")
        .join(su.select(F.col("user_id").alias("s_user"), "signup_sec"),
              (F.col("user_id") == F.col("s_user")) & (F.col("sec") >= F.col("signup_sec")))
        .groupBy("user_id")
        .agg(F.min("sec").alias("first_view_sec"))
    )
    j = su.join(fv, "user_id", "left").select(
        "user_id",
        "signup_sec",
        "first_view_sec",
        ((F.col("signup_sec") / DAY).cast("bigint") * DAY).alias("cohort_day"),
    )
    return j.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_signups"),
        F.count("first_view_sec").cast("bigint").alias("n_activated"),
        (
            F.sum((F.col("first_view_sec") - F.col("signup_sec")).cast("decimal(27,6)"))
            .cast("double")
            / F.nullif(F.count("first_view_sec"), F.lit(0))
        ).alias("avg_latency_sec"),
    )


# --------------------------------------------------------------------------
# Time-series gap-fill with LINEAR INTERPOLATION (the TimescaleDB
# `interpolate` / Flink windowed-fill operator) — the missing half of the
# repo's time-grid story: the as-of join forward-FILLS, this one fits the
# straight line between the bracketing observations.  Series = per
# (event_type, day) decimal-exact daily value sums, deterministically
# DECIMATED (portable-hash parity of the (type, day) key — SF-independent,
# unlike count parity, which a replication-derived SF turns all-even) so
# real interior gaps exist at every SF;
# grid = each type's full [min_day, max_day] span via sequence+explode.
# prev/next anchors come from IGNORE-NULLS window fills (one sort per
# type partition, no self-join); exterior points (before first / after
# last observation) stay null and are dropped.  All arithmetic is IEEE
# add/sub/mul/div on decimal-derived doubles — bit-identical in DuckDB,
# no libm.  At 100 TB: one (type) shuffle, two window passes, grid fan-out
# is O(types × days), never O(rows).
@query(
    "timeseries_gap_interpolation",
    oracle=f"""
    WITH ev AS ({EV_SEC}),
    obs0 AS (
      SELECT event_type, sec // 86400 AS day,
             cast(cast(sum(cast(value as decimal(27,6))) as varchar) as double) AS v
      FROM ev GROUP BY 1, 2
    ),
    obs AS (
      SELECT event_type, day, v FROM obs0
      WHERE {hash64_sql("event_type || '_' || cast(day as varchar)", "tsgap")} % 2 = 1
    ),
    span AS (
      SELECT event_type, min(day) AS d0, max(day) AS d1 FROM obs GROUP BY 1
    ),
    grid AS (
      SELECT s.event_type, g.day
      FROM span s, LATERAL (SELECT unnest(generate_series(s.d0, s.d1)) AS day) g
    ),
    joined AS (
      SELECT g.event_type, g.day, o.v FROM grid g
      LEFT JOIN obs o ON o.event_type = g.event_type AND o.day = g.day
    ),
    anch AS (
      SELECT event_type, day, v,
        last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
          OVER (PARTITION BY event_type ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        first_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY day
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
          OVER (PARTITION BY event_type ORDER BY day
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM joined
    )
    SELECT event_type, cast(day as bigint) AS day,
           round(CASE WHEN v IS NOT NULL THEN v
                 ELSE pv + (nv - pv) * (cast(day - pt as double)
                                        / cast(nt - pt as double)) END, 6)
             AS v_filled,
           CASE WHEN v IS NOT NULL THEN 'obs' ELSE 'interp' END AS kind
    FROM anch
    WHERE v IS NOT NULL OR (pv IS NOT NULL AND nv IS NOT NULL)
    """,
)
def timeseries_gap_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.hashing import hash64

    obs = (
        events_sec(spark, sf_dir)
        .groupBy("event_type", (F.col("sec") / F.lit(86400)).cast("bigint").alias("day"))
        .agg(dsum(F.col("value"), "v"))
        .where(  # deterministic SF-independent decimation -> real gaps
            hash64(
                F.concat(F.col("event_type"), F.lit("_"), F.col("day").cast("string")),
                "tsgap",
            )
            % 2
            == 1
        )
        .select("event_type", "day", "v")
    )
    grid = (
        obs.groupBy("event_type")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day"),
        )
    )
    joined = grid.join(obs, ["event_type", "day"], "left")
    wp = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    anch = joined.select(
        "event_type",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(wp).alias("pt"),
        F.first("v", ignorenulls=True).over(wn).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(wn).alias("nt"),
    )
    lerp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.col("day") - F.col("pt")).cast("double")
        / (F.col("nt") - F.col("pt")).cast("double")
    )
    return anch.where(
        F.col("v").isNotNull()
        | (F.col("pv").isNotNull() & F.col("nv").isNotNull())
    ).select(
        "event_type",
        F.col("day").cast("bigint").alias("day"),
        F.round(
            F.when(F.col("v").isNotNull(), F.col("v")).otherwise(lerp), 6
        ).alias("v_filled"),
        F.when(F.col("v").isNotNull(), F.lit("obs"))
        .otherwise(F.lit("interp"))
        .alias("kind"),
    )


# --------------------------------------------------------------------------
# ORDERED event funnel — the sequential-conversion operator every product
# analytics store ships (Amplitude/Mixpanel funnels; distinct from
# recommend_slot_funnel's unordered pv/uv join): step k counts only users
# whose step-k event happens AT/AFTER their earliest step-(k-1) completion
# (view -> click -> purchase).  Relational formulation: three narrow
# per-user min-aggregations chained by (user, >=) joins — each step's
# input is one event-type slice, each join is on the already-reduced
# per-user frame (at 100 TB: 3 type-pruned scans + 2 joins on user-grain
# rows, no window over the raw fact).  Integer epoch-seconds and bigint
# counts end-to-end; the two conversion ratios and the mean delay are
# single IEEE divisions (libm-free oracle).
@query(
    "ordered_event_funnel",
    oracle=f"""
    WITH ev AS ({EV_SEC}),
    s1 AS (SELECT user_id, min(sec) AS t1 FROM ev
           WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(e.sec) AS t2
           FROM ev e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'click' AND e.sec >= s1.t1
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(e.sec) AS t3
           FROM ev e JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'purchase' AND e.sec >= s2.t2
           GROUP BY e.user_id),
    d AS (SELECT s3.user_id, s3.t3 - s1.t1 AS delay
          FROM s3 JOIN s1 ON s3.user_id = s1.user_id)
    SELECT cast((SELECT count(*) FROM s1) as bigint) AS n_view,
           cast((SELECT count(*) FROM s2) as bigint) AS n_click_after,
           cast((SELECT count(*) FROM s3) as bigint) AS n_purchase_after,
           round(cast((SELECT count(*) FROM s2) as double)
                 / cast((SELECT count(*) FROM s1) as double), 6) AS conv_click,
           round(cast((SELECT count(*) FROM s3) as double)
                 / cast((SELECT count(*) FROM s2) as double), 6) AS conv_purchase,
           round(cast((SELECT sum(delay) FROM d) as double)
                 / cast((SELECT count(*) FROM d) as double), 6)
             AS avg_sec_to_convert
    """,
)
def ordered_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_sec(spark, sf_dir)
    s1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("sec").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("sec") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("sec").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("sec") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("sec").alias("t3"))
    )
    d = s3.join(s1, "user_id").select((F.col("t3") - F.col("t1")).alias("delay"))
    # three 1-row aggregates crossjoined plan-side (the whitelisted scalar
    # BNL pattern, cf. part_share_of_total) — no driver collects
    c1 = s1.agg(F.count(F.lit(1)).cast("bigint").alias("n_view"))
    c2 = s2.agg(F.count(F.lit(1)).cast("bigint").alias("n_click_after"))
    c3 = s3.agg(F.count(F.lit(1)).cast("bigint").alias("n_purchase_after"))
    cd = d.agg(
        F.sum("delay").alias("sum_delay"), F.count(F.lit(1)).alias("n_delay")
    )
    return (
        c1.crossJoin(c2)
        .crossJoin(c3)
        .crossJoin(cd)
        .select(
            "n_view",
            "n_click_after",
            "n_purchase_after",
            F.round(
                F.col("n_click_after").cast("double")
                / F.col("n_view").cast("double"),
                6,
            ).alias("conv_click"),
            F.round(
                F.col("n_purchase_after").cast("double")
                / F.col("n_click_after").cast("double"),
                6,
            ).alias("conv_purchase"),
            F.round(
                F.col("sum_delay").cast("double") / F.col("n_delay").cast("double"),
                6,
            ).alias("avg_sec_to_convert"),
        )
    )


# --------------------------------------------------------------------------
# Retention cohort matrix — the other half of product analytics next to the
# ordered funnel: users cohorted by FIRST-ACTIVE day, then each later
# active day counted as day-k retention for that cohort (the classic
# triangle).  Two aggregations over the same (user, day) distinct frame —
# first_day derivation reuses the user_id partitioning (one exchange, the
# new_vs_returning trick), and the cohort matrix agg is map-combinable.
# retained_pct is one IEEE division against the cohort's k=0 size.
@query(
    "retention_cohorts",
    oracle=f"""
    WITH ev AS ({EV_SEC}),
    daily AS (SELECT DISTINCT user_id, sec // {DAY} AS day FROM ev),
    first_seen AS (
      SELECT user_id, min(day) AS cohort_day FROM daily GROUP BY user_id
    ),
    cells AS (
      SELECT f.cohort_day, d.day - f.cohort_day AS k,
             count(*) AS n_active
      FROM daily d JOIN first_seen f USING (user_id)
      GROUP BY 1, 2
    ),
    base AS (SELECT cohort_day, n_active AS n0 FROM cells WHERE k = 0)
    SELECT c.cohort_day AS cohort_day,
           cast(c.k as bigint) AS k,
           cast(c.n_active as bigint) AS n_active,
           round(cast(c.n_active as double) / cast(b.n0 as double), 6)
             AS retained_pct
    FROM cells c JOIN base b USING (cohort_day)
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        events_sec(spark, sf_dir)
        .select("user_id", (F.col("sec") / F.lit(DAY)).cast("bigint").alias("day"))
        .distinct()
    )
    first_seen = daily.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    cells = (
        daily.join(first_seen, "user_id")
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("k"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    base = cells.where(F.col("k") == 0).select(
        "cohort_day", F.col("n_active").alias("n0")
    )
    return cells.join(base, "cohort_day").select(
        "cohort_day",
        F.col("k").cast("bigint").alias("k"),
        F.col("n_active").cast("bigint").alias("n_active"),
        F.round(
            F.col("n_active").cast("double") / F.col("n0").cast("double"), 6
        ).alias("retained_pct"),
    )


# --------------------------------------------------------------------------
# Event transition matrix — first-order Markov path analysis (the Sankey /
# "users flow" primitive): per user, events ordered by (sec, event_id);
# each adjacent pair is one (from_type, to_type) transition; the matrix
# normalizes counts into row-stochastic probabilities.  One lead() window
# per user partition + one map-combinable pair agg; the per-from total
# arrives by window sum over the TINY matrix (|types|² rows), not a second
# pass over the fact.
@query(
    "event_transition_matrix",
    oracle=f"""
    WITH ev AS ({EV_SEC}),
    seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY sec, event_id
             ) AS next_type
      FROM ev
    ),
    pairs AS (
      SELECT event_type AS from_type, next_type AS to_type,
             count(*) AS n
      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, cast(n as bigint) AS n_transitions,
           round(cast(n as double)
                 / cast(sum(n) OVER (PARTITION BY from_type) as double), 6)
             AS p_transition
    FROM pairs
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    seq_w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    pairs = (
        events_sec(spark, sf_dir)
        .select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(seq_w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot_w = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint").alias("n_transitions"),
        F.round(
            F.col("n").cast("double") / F.sum("n").over(tot_w).cast("double"), 6
        ).alias("p_transition"),
    )


# --------------------------------------------------------------------------
# RFM segmentation — recency/frequency/monetary quintiles per purchasing
# user, the classic CRM/targeting segmentation.  Quintiles come from the
# DISTRIBUTED global rank (operators/rank.py: range-partitioned two-pass
# row numbering), never a partition-less ntile window that would funnel
# every user through one task at 100 TB; quintile = 1 + (rn-1)*5 div n is
# integer-exact.  Three ranked passes (one per metric, each fully
# tie-broken by user_id) over the user-grain frame — at scale that is
# three range shuffles of the SMALL aggregated frame, not the fact.
@query(
    "rfm_segmentation",
    oracle=f"""
    WITH ev AS ({EV_SEC}),
    rfm AS (
      SELECT user_id,
             max(sec) AS r_sec,
             cast(count(*) as bigint) AS f_cnt,
             cast(cast(sum(cast(value as decimal(27,6))) as varchar) as double)
               AS m_val
      FROM ev WHERE event_type = 'purchase' GROUP BY user_id
    ),
    n AS (SELECT count(*) AS n_users FROM rfm),
    ranked AS (
      SELECT user_id, r_sec, f_cnt, m_val,
             row_number() OVER (ORDER BY r_sec, user_id) AS r_rn,
             row_number() OVER (ORDER BY f_cnt, user_id) AS f_rn,
             row_number() OVER (ORDER BY m_val, user_id) AS m_rn
      FROM rfm
    )
    SELECT user_id,
           cast(1 + (r_rn - 1) * 5 // n_users as bigint) AS r_q,
           cast(1 + (f_rn - 1) * 5 // n_users as bigint) AS f_q,
           cast(1 + (m_rn - 1) * 5 // n_users as bigint) AS m_q,
           cast((1 + (r_rn - 1) * 5 // n_users) * 100
                + (1 + (f_rn - 1) * 5 // n_users) * 10
                + (1 + (m_rn - 1) * 5 // n_users) as bigint) AS segment
    FROM ranked, n
    """,
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import global_row_number

    rfm = (
        events_sec(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("sec").alias("r_sec"),
            F.count(F.lit(1)).cast("bigint").alias("f_cnt"),
            dsum(F.col("value"), "m_val"),
        )
    )
    ranked = global_row_number(rfm, ["r_sec", "user_id"], "r_rn")
    ranked = global_row_number(ranked, ["f_cnt", "user_id"], "f_rn")
    ranked = global_row_number(ranked, ["m_val", "user_id"], "m_rn")
    n_users = F.broadcast(
        rfm.agg(F.count(F.lit(1)).alias("n_users"))
    )
    out = ranked.crossJoin(n_users)
    # integer floor division: (rn-1)*5 div n
    qcol = lambda rn: (
        F.lit(1) + F.floor((F.col(rn) - F.lit(1)) * F.lit(5) / F.col("n_users"))
    ).cast("bigint")
    return out.select(
        "user_id",
        qcol("r_rn").alias("r_q"),
        qcol("f_rn").alias("f_q"),
        qcol("m_rn").alias("m_q"),
        (
            qcol("r_rn") * 100 + qcol("f_rn") * 10 + qcol("m_rn")
        ).cast("bigint").alias("segment"),
    )


# --------------------------------------------------------------------------
# Rolling active users — DAU / WAU(7d) / MAU(28d) + stickiness per observed
# day, the growth-dashboard primitive the reference's daily UV reports
# (repots/.../NewAnalysis.scala, VisitAnalysis daily UV) stop short of.
# The rolling DISTINCT is computed by fan-out, not a window: each distinct
# (user, day) row explodes into the <=28 window-end days it contributes to
# (sequence + explode, whole-stage codegen), then ONE hash aggregate takes
# three conditional count-distincts keyed by window-end day.  That is a
# fixed 28x linear expansion — no quadratic day-grid join, no per-day
# subquery — and the expand/partial-agg pipeline dedups (day, user) map-side
# before the shuffle.  The observed-days dim is tiny at every SF (3650 rows
# for a decade), hence the broadcast semi-filter.
@query(
    "rolling_active_users",
    oracle=f"""
    WITH ev AS ({EV_SEC}),
    ra_daily AS (SELECT DISTINCT user_id, sec // {DAY} AS day FROM ev),
    ra_days AS (SELECT DISTINCT day FROM ra_daily),
    ra_span AS (
      SELECT d.day AS wd, a.user_id, d.day - a.day AS k
      FROM ra_days d JOIN ra_daily a ON a.day BETWEEN d.day - 27 AND d.day
    )
    SELECT wd AS day,
      cast(count(DISTINCT CASE WHEN k = 0 THEN user_id END) as bigint) AS dau,
      cast(count(DISTINCT CASE WHEN k < 7 THEN user_id END) as bigint) AS wau,
      cast(count(DISTINCT user_id) as bigint) AS mau,
      round(cast(count(DISTINCT CASE WHEN k = 0 THEN user_id END) as double)
            / cast(count(DISTINCT user_id) as double), 6) AS stickiness
    FROM ra_span GROUP BY wd
    """,
)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        events_sec(spark, sf_dir)
        .select("user_id", (F.col("sec") / F.lit(DAY)).cast("bigint").alias("day"))
        .distinct()
    )
    days = daily.select("day").distinct().withColumnRenamed("day", "wd")
    span = (
        daily.select(
            "user_id",
            "day",
            F.explode(
                F.sequence(F.col("day"), F.col("day") + F.lit(27))
            ).alias("wd"),
        )
        # only window-ends that are themselves observed days (matches the
        # oracle's day-grid); days is tiny -> broadcast hash semi-join
        .join(F.broadcast(days), "wd", "left_semi")
        .withColumn("k", F.col("wd") - F.col("day"))
    )
    agg = span.groupBy(F.col("wd").alias("day")).agg(
        F.count_distinct(
            F.when(F.col("k") == 0, F.col("user_id"))
        ).cast("bigint").alias("dau"),
        F.count_distinct(
            F.when(F.col("k") < 7, F.col("user_id"))
        ).cast("bigint").alias("wau"),
        F.count_distinct("user_id").cast("bigint").alias("mau"),
    )
    return agg.select(
        "day",
        "dau",
        "wau",
        "mau",
        F.round(
            F.col("dau").cast("double") / F.col("mau").cast("double"), 6
        ).alias("stickiness"),
    )


# --------------------------------------------------------------------------
# Trailing-window z-score anomaly detection on the daily event-count series
# (per event type): each day is scored against the PRECEDING week's
# baseline (RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING on the integer day
# key, so calendar gaps shrink the baseline instead of silently stretching
# it).  Bit-exact across engines because the mean/std never exist as
# accumulated floats: the window carries integer sums (n, s=sum x,
# q=sum x^2) and the z-score is one fixed shape of IEEE divisions over
# exact integers — z = ((n*x - s)/n) / sqrt((n*q - s^2)/(n*(n-1))).
# Scale shape: the daily series is groupBy-compacted FIRST (the fact never
# reaches the window), and the window partitions by event_type over a
# series-sized frame.  At petabyte counts the integer q term would move to
# decimal(38,0); bigint holds to ~3e9 events/cell.
@query(
    "timeseries_zscore_outliers",
    oracle=f"""
    WITH ev AS ({EV_SEC}),
    zs_daily AS (
      SELECT event_type, sec // {DAY} AS day, count(*) AS x
      FROM ev GROUP BY 1, 2
    ),
    zs_win AS (
      SELECT event_type, day, x,
        count(*) OVER w AS n,
        sum(x) OVER w AS s,
        sum(x * x) OVER w AS q
      FROM zs_daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
    ),
    zs_z AS (
      SELECT event_type, day, x, n,
        round((cast(n * x - s as double) / cast(n as double))
              / sqrt(cast(n * q - s * s as double)
                     / cast(n * (n - 1) as double)), 6) AS zscore
      FROM zs_win WHERE n >= 3 AND n * q - s * s > 0
    )
    SELECT event_type, cast(day as bigint) AS day,
           cast(x as bigint) AS n_events,
           cast(n as bigint) AS n_baseline,
           zscore,
           cast(CASE WHEN abs(zscore) > 2 THEN 1 ELSE 0 END as bigint)
             AS is_outlier
    FROM zs_z
    """,
)
def timeseries_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    daily = (
        events_sec(spark, sf_dir)
        .groupBy(
            "event_type",
            (F.col("sec") / F.lit(DAY)).cast("bigint").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rangeBetween(-7, -1)
    )
    win = daily.select(
        "event_type",
        "day",
        "x",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum("x").over(w).alias("s"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("q"),
    ).where(
        (F.col("n") >= 3) & (F.col("n") * F.col("q") - F.col("s") * F.col("s") > 0)
    )
    z = F.round(
        (
            (F.col("n") * F.col("x") - F.col("s")).cast("double")
            / F.col("n").cast("double")
        )
        / F.sqrt(
            (F.col("n") * F.col("q") - F.col("s") * F.col("s")).cast("double")
            / (F.col("n") * (F.col("n") - F.lit(1))).cast("double")
        ),
        6,
    )
    scored = win.select(
        "event_type",
        F.col("day").cast("bigint").alias("day"),
        F.col("x").cast("bigint").alias("n_events"),
        F.col("n").cast("bigint").alias("n_baseline"),
        z.alias("zscore"),
    )
    return scored.withColumn(
        "is_outlier",
        F.when(F.abs(F.col("zscore")) > 2, 1).otherwise(0).cast("bigint"),
    )


# --------------------------------------------------------------------------
# Growth accounting — the four-way daily user-movement split (new /
# retained / resurrected / churned) plus the quick ratio
# ((new+resurrected)/churned), the standard growth-dashboard companion to
# rolling_active_users (the Social Capital "growth accounting" framing).
# Everything derives from ONE (user, day) distinct frame and ONE user-keyed
# window pass (lag/lead/min share the same sort): new = first active day,
# retained = active yesterday too, resurrected = gap > 1 day, churned =
# attributed to the day AFTER the last day of an activity run.  Both
# per-day frames are day-grain (tiny); the churn attachment is a
# broadcast-able FULL-outer equi-join on day (full, not left: churn lands
# on gap days with zero activity, which a left join would drop).  No
# day-grid cross join, no second pass over the fact.
@query(
    "growth_accounting",
    oracle=f"""
    WITH ev AS ({EV_SEC}),
    ga_daily AS (SELECT DISTINCT user_id, sec // {DAY} AS day FROM ev),
    ga_seq AS (
      SELECT user_id, day,
             min(day) OVER (PARTITION BY user_id) AS first_day,
             lag(day)  OVER (PARTITION BY user_id ORDER BY day) AS prev_day,
             lead(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day
      FROM ga_daily
    ),
    ga_act AS (
      SELECT day,
        sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS n_new,
        sum(CASE WHEN prev_day = day - 1 THEN 1 ELSE 0 END) AS n_retained,
        sum(CASE WHEN prev_day IS NOT NULL AND prev_day < day - 1
                 THEN 1 ELSE 0 END) AS n_resurrected
      FROM ga_seq GROUP BY day
    ),
    ga_churn AS (
      SELECT day + 1 AS day, count(*) AS n_churned
      FROM ga_seq
      WHERE next_day IS NULL OR next_day > day + 1
      GROUP BY day + 1
    )
    SELECT coalesce(a.day, c.day) AS day,
           cast(coalesce(a.n_new, 0) as bigint) AS n_new,
           cast(coalesce(a.n_retained, 0) as bigint) AS n_retained,
           cast(coalesce(a.n_resurrected, 0) as bigint) AS n_resurrected,
           cast(coalesce(c.n_churned, 0) as bigint) AS n_churned,
           CASE WHEN coalesce(c.n_churned, 0) > 0 THEN
             floor(cast(coalesce(a.n_new, 0) + coalesce(a.n_resurrected, 0)
                        as double)
                   / cast(c.n_churned as double) * 1000000 + 0.5) / 1000000
           END AS quick_ratio
    FROM ga_act a FULL JOIN ga_churn c ON a.day = c.day
    """,
)
def growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    daily = (
        events_sec(spark, sf_dir)
        .select("user_id", (F.col("sec") / F.lit(DAY)).cast("bigint").alias("day"))
        .distinct()
    )
    part = Window.partitionBy("user_id")
    seq_w = part.orderBy("day")
    seq = daily.select(
        "user_id",
        "day",
        F.min("day").over(part).alias("first_day"),
        F.lag("day").over(seq_w).alias("prev_day"),
        F.lead("day").over(seq_w).alias("next_day"),
    )
    act = seq.groupBy("day").agg(
        F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_new"),
        F.sum(F.when(F.col("prev_day") == F.col("day") - 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_retained"),
        F.sum(
            F.when(
                F.col("prev_day").isNotNull()
                & (F.col("prev_day") < F.col("day") - 1),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_resurrected"),
    )
    churn = (
        seq.where(F.col("next_day").isNull() | (F.col("next_day") > F.col("day") + 1))
        .groupBy((F.col("day") + 1).alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_churned"))
    )
    # FULL outer: users can churn INTO a day with zero activity (a gap
    # day, or the day after the dataset's last active day) — a left join
    # from the activity frame would silently drop that churn mass
    out = act.join(churn, "day", "full").withColumns(
        {
            c: F.coalesce(F.col(c), F.lit(0)).cast("bigint")
            for c in ("n_new", "n_retained", "n_resurrected", "n_churned")
        }
    )
    # tie-stable rounding: engine-native round(double, 6) diverges one ULP
    # between Spark and DuckDB on representational ties (the visit_overview
    # failure class) — floor(x*1e6 + 0.5)/1e6 is the same IEEE expression
    # shape on both engines, so the tie breaks identically
    return out.withColumn(
        "quick_ratio",
        F.when(
            F.col("n_churned") > 0,
            F.floor(
                (F.col("n_new") + F.col("n_resurrected")).cast("double")
                / F.col("n_churned").cast("double")
                * 1000000
                + F.lit(0.5)
            )
            / 1000000,
        ),
    )


# --------------------------------------------------------------------------
# Time-weighted average value per event type (the TWAP / TimescaleDB
# `time_weight` primitive): each observation holds until the next one
# (last-observation-carried-forward), so its weight is the seconds until
# the partition's next event; the final observation carries zero weight
# (nothing to hold over — the standard left-closed convention).  One
# lead() window per type (a single keyed exchange), then exact decimal
# weighted sums — value×Δt rides decimal(27,6)×bigint so the division at
# the end is the only float op, bit-identical on both engines.  The
# unweighted mean rides along to show the skew TWAP corrects (bursts of
# short-lived readings drag a plain mean; TWAP weights by holding time).
@query(
    "time_weighted_average",
    oracle=f"""
    WITH ev AS ({EV_SEC}),
    tw_seq AS (
      SELECT event_type, value, sec,
             lead(sec) OVER (
               PARTITION BY event_type ORDER BY sec, event_id
             ) - sec AS dt
      FROM ev
    ),
    tw AS (
      SELECT event_type,
             sum(cast(value as decimal(27,6)) * dt) AS wsum,
             sum(dt) AS wtot,
             count(*) AS n_obs,
             sum(cast(value as decimal(27,6))) AS vsum
      FROM tw_seq WHERE dt IS NOT NULL GROUP BY event_type
    )
    SELECT event_type,
           cast(n_obs as bigint) AS n_obs,
           cast(wtot as bigint) AS total_sec,
           round(cast(cast(wsum as varchar) as double)
                 / cast(wtot as double), 6) AS twap,
           round(cast(cast(vsum as varchar) as double)
                 / cast(n_obs as double), 6) AS plain_mean
    FROM tw
    """,
)
def time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("sec", "event_id")
    seq = events_sec(spark, sf_dir).select(
        "event_type",
        "value",
        (F.lead("sec").over(w) - F.col("sec")).alias("dt"),
    ).where(F.col("dt").isNotNull())
    agg = seq.groupBy("event_type").agg(
        F.sum(F.col("value").cast("decimal(27,6)") * F.col("dt")).alias("wsum"),
        F.sum("dt").cast("bigint").alias("wtot"),
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.sum(F.col("value").cast("decimal(27,6)")).alias("vsum"),
    )
    return agg.select(
        "event_type",
        "n_obs",
        F.col("wtot").alias("total_sec"),
        F.round(
            F.col("wsum").cast("double") / F.col("wtot").cast("double"), 6
        ).alias("twap"),
        F.round(
            F.col("vsum").cast("double") / F.col("n_obs").cast("double"), 6
        ).alias("plain_mean"),
    )


# --------------------------------------------------------------------------
# Day-over-day trending movers — the "what's rising" report every
# dashboard ships: per (day, event_type), the day's event count is ranked
# within the day, compared to the SAME type's rank yesterday, and the
# movers are the types whose rank improved/worsened; delta_pct is the
# count change.  Two windows on different keys (rank within day, lag
# within type) over the TINY day×type series — the fact is compacted
# FIRST, so at 100 TB the window input is |days|·|types| rows.  First
# observed day has no yesterday and is dropped (both engines alike).
@query(
    "trending_daily_movers",
    oracle=f"""
    WITH ev AS ({EV_SEC}),
    td_daily AS (
      SELECT event_type, sec // {DAY} AS day, count(*) AS n
      FROM ev GROUP BY 1, 2
    ),
    td_ranked AS (
      SELECT event_type, day, n,
             rank() OVER (PARTITION BY day ORDER BY n DESC, event_type) AS rnk
      FROM td_daily
    ),
    td_seq AS (
      SELECT event_type, day, n, rnk,
             lag(n)   OVER (PARTITION BY event_type ORDER BY day) AS n_prev,
             lag(rnk) OVER (PARTITION BY event_type ORDER BY day) AS rnk_prev,
             lag(day) OVER (PARTITION BY event_type ORDER BY day) AS day_prev
      FROM td_ranked
    )
    SELECT event_type, cast(day as bigint) AS day,
           cast(n as bigint) AS n_events,
           cast(rnk as bigint) AS rnk,
           cast(rnk_prev - rnk as bigint) AS rank_gain,
           round((cast(n as double) - cast(n_prev as double))
                 / cast(n_prev as double), 6) AS delta_pct
    FROM td_seq WHERE day_prev = day - 1
    """,
)
def trending_daily_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    daily = (
        events_sec(spark, sf_dir)
        .groupBy(
            "event_type", (F.col("sec") / F.lit(DAY)).cast("bigint").alias("day")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    day_w = Window.partitionBy("day").orderBy(F.desc("n"), "event_type")
    ranked = daily.withColumn("rnk", F.rank().over(day_w).cast("bigint"))
    type_w = Window.partitionBy("event_type").orderBy("day")
    seq = ranked.select(
        "event_type",
        "day",
        "n",
        "rnk",
        F.lag("n").over(type_w).alias("n_prev"),
        F.lag("rnk").over(type_w).alias("rnk_prev"),
        F.lag("day").over(type_w).alias("day_prev"),
    ).where(F.col("day_prev") == F.col("day") - 1)
    return seq.select(
        "event_type",
        "day",
        F.col("n").alias("n_events"),
        "rnk",
        (F.col("rnk_prev") - F.col("rnk")).cast("bigint").alias("rank_gain"),
        F.round(
            (F.col("n").cast("double") - F.col("n_prev").cast("double"))
            / F.col("n_prev").cast("double"),
            6,
        ).alias("delta_pct"),
    )


# --------------------------------------------------------------------------
# KMV / theta-sketch audience overlap (Beyer et al. SIGMOD'07; the Apache
# DataSketches theta-intersection shape): estimate |A|, |B| and |A ∩ B| for
# two user segments from K-minimum-value sketches instead of exact distinct
# sets.  Each sketch is the K smallest values of a portable 40-bit hash of
# the distinct user ids; estimate = (K-1) * 2^40 DIV kth_min, and the
# intersection keeps sketch values below theta = min(theta_A, theta_B) that
# appear in BOTH sketches (est = n_both * 2^40 DIV theta).  A segment with
# fewer than K distinct hashes is EXACT (theta = 2^40) — so the small-SF
# gate exercises the exact path and sf>=0.01 the estimation path.
#
# Scale shape (the reason this op exists): exact overlap of two 100 TB
# segments is two full-cardinality distinct shuffles + a join; the sketch
# is K rows per segment — Spark's orderBy(h).limit(K) compiles to
# TakeOrderedAndProject (per-partition top-K, merge of K-row heaps, no
# global sort, no single-partition window), and the intersection joins two
# K-row frames.  The exact_* columns audit the estimates at test SFs; a
# production run would drop them.  40-bit hashes keep every intermediate
# ((K-1) * 2^40 = 2^45) inside bigint on both engines with exact DIV.
# Reference provenance: the reference counts audience overlap exactly
# (repots/UserAnalysis.scala two-segment distinct counts); the sketch is
# the 100 TB widening of that report.
KMV_K = 32
KMV_MAXH = 1 << 40  # hash domain size (40-bit portable hash)
SEG_A_SQL = "event_type = 'click' AND value > 150"
SEG_B_SQL = "event_type = 'purchase' AND value > 120"


def _h40(col: F.Column) -> F.Column:
    """Portable 40-bit hash (first 10 hex chars of seeded md5) — small
    enough that KMV estimate arithmetic stays in exact bigint range."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit("kmv"), col.cast("string"))), 1, 10),
        16,
        10,
    ).cast("bigint")


def _h40_sql(expr: str) -> str:
    return f"cast(('0x' || substr(md5('kmv' || {expr}), 1, 10)) as bigint)"


@query(
    "kmv_audience_overlap",
    oracle=f"""
    WITH sega AS (SELECT DISTINCT user_id FROM events WHERE {SEG_A_SQL}),
    segb AS (SELECT DISTINCT user_id FROM events WHERE {SEG_B_SQL}),
    ha AS (SELECT DISTINCT {_h40_sql("cast(user_id as varchar)")} AS h FROM sega),
    hb AS (SELECT DISTINCT {_h40_sql("cast(user_id as varchar)")} AS h FROM segb),
    ska AS (SELECT h FROM ha ORDER BY h LIMIT {KMV_K}),
    skb AS (SELECT h FROM hb ORDER BY h LIMIT {KMV_K}),
    sa AS (SELECT count(*) AS n_sketch_a, max(h) AS kth_a FROM ska),
    sb AS (SELECT count(*) AS n_sketch_b, max(h) AS kth_b FROM skb),
    st AS (
      SELECT n_sketch_a, n_sketch_b,
             CASE WHEN n_sketch_a < {KMV_K} THEN {KMV_MAXH} ELSE kth_a END AS theta_a,
             CASE WHEN n_sketch_b < {KMV_K} THEN {KMV_MAXH} ELSE kth_b END AS theta_b
      FROM sa, sb
    ),
    st2 AS (SELECT *, least(theta_a, theta_b) AS theta FROM st),
    ni AS (
      SELECT count(*) AS n_inter_sketch
      FROM ska JOIN skb USING (h), st2 WHERE ska.h < st2.theta
    )
    SELECT cast({KMV_K} as bigint) AS k,
           cast((SELECT count(*) FROM sega) as bigint) AS exact_a,
           cast((SELECT count(*) FROM segb) as bigint) AS exact_b,
           cast((SELECT count(*) FROM sega JOIN segb USING (user_id)) as bigint)
             AS exact_inter,
           cast(n_sketch_a as bigint) AS n_sketch_a,
           cast(n_sketch_b as bigint) AS n_sketch_b,
           cast(theta as bigint) AS theta,
           cast(n_inter_sketch as bigint) AS n_inter_sketch,
           cast(CASE WHEN n_sketch_a < {KMV_K} THEN n_sketch_a
                     ELSE ({KMV_K - 1} * {KMV_MAXH}) // theta_a END as bigint) AS est_a,
           cast(CASE WHEN n_sketch_b < {KMV_K} THEN n_sketch_b
                     ELSE ({KMV_K - 1} * {KMV_MAXH}) // theta_b END as bigint) AS est_b,
           cast(CASE WHEN theta = {KMV_MAXH} THEN n_inter_sketch
                     ELSE (n_inter_sketch * {KMV_MAXH}) // theta END as bigint)
             AS est_inter
    FROM st2, ni
    """,
)
def kmv_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    seg_a = ev.where(F.expr(SEG_A_SQL)).select("user_id").distinct()
    seg_b = ev.where(F.expr(SEG_B_SQL)).select("user_id").distinct()
    # K smallest distinct hashes per segment: TakeOrderedAndProject, K rows out
    sk_a = seg_a.select(_h40(F.col("user_id")).alias("h")).distinct().orderBy("h").limit(KMV_K)
    sk_b = seg_b.select(_h40(F.col("user_id")).alias("h")).distinct().orderBy("h").limit(KMV_K)
    sa = sk_a.agg(
        F.count("h").alias("n_sketch_a"), F.max("h").alias("kth_a")
    )
    sb = sk_b.agg(
        F.count("h").alias("n_sketch_b"), F.max("h").alias("kth_b")
    )
    st = (
        sa.crossJoin(sb)
        .withColumn(
            "theta_a",
            F.when(F.col("n_sketch_a") < KMV_K, F.lit(KMV_MAXH).cast("bigint")).otherwise(
                F.col("kth_a")
            ),
        )
        .withColumn(
            "theta_b",
            F.when(F.col("n_sketch_b") < KMV_K, F.lit(KMV_MAXH).cast("bigint")).otherwise(
                F.col("kth_b")
            ),
        )
        .withColumn("theta", F.least("theta_a", "theta_b"))
    )
    ni = (
        sk_a.join(sk_b, "h")
        .crossJoin(F.broadcast(st.select("theta")))
        .where(F.col("h") < F.col("theta"))
        .agg(F.count(F.lit(1)).alias("n_inter_sketch"))
    )
    ea = seg_a.agg(F.count(F.lit(1)).alias("exact_a"))
    eb = seg_b.agg(F.count(F.lit(1)).alias("exact_b"))
    ei = seg_a.join(seg_b, "user_id").agg(F.count(F.lit(1)).alias("exact_inter"))
    out = st.crossJoin(ni).crossJoin(ea).crossJoin(eb).crossJoin(ei)
    return out.select(
        F.lit(KMV_K).cast("bigint").alias("k"),
        F.col("exact_a").cast("bigint").alias("exact_a"),
        F.col("exact_b").cast("bigint").alias("exact_b"),
        F.col("exact_inter").cast("bigint").alias("exact_inter"),
        F.col("n_sketch_a").cast("bigint").alias("n_sketch_a"),
        F.col("n_sketch_b").cast("bigint").alias("n_sketch_b"),
        F.col("theta").cast("bigint").alias("theta"),
        F.col("n_inter_sketch").cast("bigint").alias("n_inter_sketch"),
        F.expr(
            f"cast(CASE WHEN n_sketch_a < {KMV_K} THEN n_sketch_a"
            f" ELSE ({KMV_K - 1}L * {KMV_MAXH}L) DIV theta_a END as bigint)"
        ).alias("est_a"),
        F.expr(
            f"cast(CASE WHEN n_sketch_b < {KMV_K} THEN n_sketch_b"
            f" ELSE ({KMV_K - 1}L * {KMV_MAXH}L) DIV theta_b END as bigint)"
        ).alias("est_b"),
        F.expr(
            f"cast(CASE WHEN theta = {KMV_MAXH}L THEN n_inter_sketch"
            f" ELSE (n_inter_sketch * {KMV_MAXH}L) DIV theta END as bigint)"
        ).alias("est_inter"),
    )


# --------------------------------------------------------------------------
# HDR-HISTOGRAM QUANTILE SKETCH — log-linear bucketed quantiles (the
# HdrHistogram / DDSketch family: relative-error-bounded percentiles from
# a sketch that is a pure map-combinable groupBy).  The fixed-point value
# floor(value*100) is bucketed by (exponent via length(bin(v)), top
# HDR_P_BITS of mantissa) — ALL integer arithmetic, so the sketch is
# bit-identical on any engine (no transcendental log whose last-ulp
# differs between libm and the JVM).  Quantile read-out walks the
# cumulative counts of the ≤ few-hundred-row bucket frame; the per-rank
# relative error is ≤ 2^-HDR_P_BITS by construction, pinned per row with
# exact integer arithmetic ((exact-est)*32 <= est).  At 100 TB: the
# sketch is one combinable aggregate with O(64·2^p) groups — no global
# sort; sketches merge by adding bucket counts (the streaming job below
# proves it).  The exact_value audit column (a global rank lookup) exists
# only for test-SF verification, like kmv_audience_overlap's exact_*.
# Reference provenance: the reference has no percentile machinery at all
# (SURVEY §2.4 "no median/percentile"); this is the 100 TB widening of
# its latency/price distribution reports.
HDR_P_BITS = 5          # sub-bucket precision: rel. error <= 1/32
HDR_QS = (0.5, 0.9, 0.99)


def _hdr_bucket_sql(v: str) -> dict[str, str]:
    """Engine-portable bucket exprs (both Spark SQL and DuckDB accept
    these spellings): e = floor(log2(v))+1 via length(bin(v)); values
    below 2^(p+1) are exact; larger ones keep the top p mantissa bits."""
    e = f"length(bin({v}))"
    small = f"{e} <= {HDR_P_BITS + 1}"
    sub = f"({v} >> ({e} - {HDR_P_BITS + 1}))"
    return {
        "bucket": f"(CASE WHEN {small} THEN {v} "
                  f"ELSE {e} * {2 ** (HDR_P_BITS + 1)} + {sub} END)",
        "lower": f"(CASE WHEN {small} THEN {v} "
                 f"ELSE {sub} << ({e} - {HDR_P_BITS + 1}) END)",
    }


_HDR_B = _hdr_bucket_sql("v")

_HDR_ORACLE = f"""
    WITH fp AS (
      SELECT cast(floor(value * 100) as bigint) AS v FROM events
      WHERE floor(value * 100) >= 1
    ),
    sketch AS (
      SELECT {_HDR_B['bucket']} AS bucket, {_HDR_B['lower']} AS lower_fp,
             count(*) AS cnt
      FROM fp GROUP BY 1, 2
    ),
    cum AS (
      SELECT bucket, lower_fp, cnt,
             sum(cnt) OVER (ORDER BY lower_fp) AS cum_cnt
      FROM sketch
    ),
    tot AS (SELECT cast(count(*) as bigint) AS n FROM fp),
    qs AS (SELECT cast(unnest([{', '.join(str(q) for q in HDR_QS)}]) as double) AS q),
    ranks AS (
      SELECT q, cast(ceil(q * n) as bigint) AS r, n FROM qs, tot
    ),
    est AS (
      SELECT r.q, r.r, r.n, min(c.lower_fp) AS est_fp
      FROM ranks r JOIN cum c ON c.cum_cnt >= r.r
      GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT v, row_number() OVER (ORDER BY v) AS rn FROM fp
    )
    SELECT e.q AS q,
           cast(e.n as bigint) AS n_total,
           cast(e.r as bigint) AS rank_r,
           cast(e.est_fp as double) / 100.0 AS est_value,
           cast(rk.v as double) / 100.0 AS exact_value,
           (rk.v - e.est_fp) * {2 ** HDR_P_BITS} <= e.est_fp AS bound_ok
    FROM est e JOIN ranked rk ON rk.rn = e.r
"""


@query("hdr_histogram_quantiles", oracle=_HDR_ORACLE)
def hdr_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.expr("cast(floor(value * 100) as bigint)").alias("v")
    ).where(F.col("v") >= 1)
    sketch = (
        ev.select(
            F.expr(_HDR_B["bucket"]).alias("bucket"),
            F.expr(_HDR_B["lower"]).alias("lower_fp"),
        )
        .groupBy("bucket", "lower_fp")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # the cumulative walk runs on the SKETCH (≤ ~few hundred rows at any
    # scale — single-partition window is deliberate and bounded).  The
    # total n rides the SAME window pass (full-frame sum of the bucket
    # counts ≡ count over fp): the fact is scanned once for the sketch,
    # not a second time for a separate count aggregate (guide §2.3)
    from pyspark.sql import Window

    w_cum = Window.orderBy("lower_fp").rowsBetween(Window.unboundedPreceding, 0)
    w_tot = Window.orderBy("lower_fp").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = sketch.withColumn("cum_cnt", F.sum("cnt").over(w_cum)).withColumn(
        "n", F.sum("cnt").over(w_tot)
    )
    qs = spark.createDataFrame([(q,) for q in HDR_QS], "q double")
    est = (
        cum.crossJoin(F.broadcast(qs))
        .withColumn("r", F.expr("cast(ceil(q * n) as bigint)"))
        .where(F.col("cum_cnt") >= F.col("r"))
        .groupBy("q", "r", "n")
        .agg(F.min("lower_fp").alias("est_fp"))
    )
    # exact audit (test SFs only — a production sketch read-out stops at
    # est).  Distributed global rank, never a partition-less window (ties
    # share v, so the value at rank r is tiebreak-independent)
    from ..operators.rank import global_row_number

    ranked = global_row_number(ev, ["v", "event_id"], "rn").select("v", "rn")
    return (
        est.join(ranked, F.col("rn") == F.col("r"))
        .select(
            "q",
            F.col("n").cast("bigint").alias("n_total"),
            F.col("r").cast("bigint").alias("rank_r"),
            (F.col("est_fp").cast("double") / 100.0).alias("est_value"),
            (F.col("v").cast("double") / 100.0).alias("exact_value"),
            (
                (F.col("v") - F.col("est_fp")) * (2 ** HDR_P_BITS)
                <= F.col("est_fp")
            ).alias("bound_ok"),
        )
    )


# --------------------------------------------------------------------------
# THETA-SKETCH A-NOT-B — set-difference cardinality from the same KMV
# sketches as kmv_audience_overlap (the DataSketches aNotB operation:
# audience suppression "clickers who did NOT purchase" without touching
# the raw sets).  Entries of A's sketch below theta = min(theta_a,
# theta_b) that miss in B's sketch estimate |A\B| as n·MAXH/theta; when
# both sketches are exact (n < K) the answer is exact.  All frames are
# ≤ K = 32 rows after the TakeOrderedAndProject scans; estimator
# arithmetic is exact bigint.  Reference provenance: the reference
# computes such suppressions exactly via `except` splits
# (`etl/LogParser.scala:119`); this is the sketch-sized 100 TB path.
@query(
    "kmv_anotb_audience",
    oracle=f"""
    WITH sega AS (SELECT DISTINCT user_id FROM events WHERE {SEG_A_SQL}),
    segb AS (SELECT DISTINCT user_id FROM events WHERE {SEG_B_SQL}),
    ha AS (SELECT DISTINCT {_h40_sql("cast(user_id as varchar)")} AS h FROM sega),
    hb AS (SELECT DISTINCT {_h40_sql("cast(user_id as varchar)")} AS h FROM segb),
    ska AS (SELECT h FROM ha ORDER BY h LIMIT {KMV_K}),
    skb AS (SELECT h FROM hb ORDER BY h LIMIT {KMV_K}),
    sa AS (SELECT count(*) AS n_a, max(h) AS kth_a FROM ska),
    sb AS (SELECT count(*) AS n_b, max(h) AS kth_b FROM skb),
    st AS (
      SELECT least(
               CASE WHEN n_a < {KMV_K} THEN {KMV_MAXH} ELSE kth_a END,
               CASE WHEN n_b < {KMV_K} THEN {KMV_MAXH} ELSE kth_b END
             ) AS theta
      FROM sa, sb
    ),
    nd AS (
      SELECT count(*) AS n_diff
      FROM ska, st
      WHERE ska.h < st.theta AND ska.h NOT IN (SELECT h FROM skb)
    )
    SELECT cast({KMV_K} as bigint) AS k,
           cast((SELECT count(*) FROM sega
                 WHERE user_id NOT IN (SELECT user_id FROM segb)) as bigint)
             AS exact_anotb,
           cast(theta as bigint) AS theta,
           cast(n_diff as bigint) AS n_diff_sketch,
           cast(CASE WHEN theta = {KMV_MAXH} THEN n_diff
                     ELSE (n_diff * {KMV_MAXH}) // theta END as bigint)
             AS est_anotb
    FROM st, nd
    """,
)
def kmv_anotb_audience(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    seg_a = ev.where(F.expr(SEG_A_SQL)).select("user_id").distinct()
    seg_b = ev.where(F.expr(SEG_B_SQL)).select("user_id").distinct()
    sk_a = (
        seg_a.select(_h40(F.col("user_id")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(KMV_K)
    )
    sk_b = (
        seg_b.select(_h40(F.col("user_id")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(KMV_K)
    )
    theta = (
        sk_a.agg(F.count("h").alias("n_a"), F.max("h").alias("kth_a"))
        .crossJoin(sk_b.agg(F.count("h").alias("n_b"), F.max("h").alias("kth_b")))
        .select(
            F.least(
                F.when(F.col("n_a") < KMV_K, F.lit(KMV_MAXH).cast("bigint")).otherwise(
                    F.col("kth_a")
                ),
                F.when(F.col("n_b") < KMV_K, F.lit(KMV_MAXH).cast("bigint")).otherwise(
                    F.col("kth_b")
                ),
            ).alias("theta")
        )
    )
    nd = (
        sk_a.join(sk_b, "h", "left_anti")
        .crossJoin(F.broadcast(theta))
        .where(F.col("h") < F.col("theta"))
        .agg(F.count(F.lit(1)).alias("n_diff"))
    )
    exact = seg_a.join(seg_b, "user_id", "left_anti").agg(
        F.count(F.lit(1)).alias("exact_anotb")
    )
    return (
        theta.crossJoin(nd)
        .crossJoin(exact)
        .select(
            F.lit(KMV_K).cast("bigint").alias("k"),
            F.col("exact_anotb").cast("bigint").alias("exact_anotb"),
            F.col("theta").cast("bigint").alias("theta"),
            F.col("n_diff").cast("bigint").alias("n_diff_sketch"),
            F.expr(
                f"cast(CASE WHEN theta = {KMV_MAXH}L THEN n_diff"
                f" ELSE (n_diff * {KMV_MAXH}L) DIV theta END as bigint)"
            ).alias("est_anotb"),
        )
    )


# --------------------------------------------------------------------------
# GROUPED HDR PERCENTILES — the production shape of the quantile sketch:
# one sketch PER DIMENSION VALUE (p50/p95 latency-style dashboards per
# event_type), still a single combinable groupBy over the fact; the
# cumulative walks and rank lookups run on per-group bucket frames
# (O(groups × 64·2^p) rows total).  At 100 TB this replaces a per-group
# global sort with a per-group few-hundred-row window — group count
# scales the OUTPUT, not the shuffle width.  Same integer-exact bucket
# arithmetic as hdr_histogram_quantiles (shared _hdr_bucket_sql).
HDR_GQS = (0.5, 0.95)


@query(
    "hdr_grouped_percentiles",
    oracle=f"""
    WITH fp AS (
      SELECT event_type, cast(floor(value * 100) as bigint) AS v FROM events
      WHERE floor(value * 100) >= 1
    ),
    sketch AS (
      SELECT event_type, {_HDR_B['bucket']} AS bucket,
             {_HDR_B['lower']} AS lower_fp, count(*) AS cnt
      FROM fp GROUP BY 1, 2, 3
    ),
    cum AS (
      SELECT event_type, lower_fp, cnt,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY lower_fp)
               AS cum_cnt
      FROM sketch
    ),
    tot AS (
      SELECT event_type, cast(count(*) as bigint) AS n FROM fp GROUP BY 1
    ),
    qs AS (SELECT cast(unnest([{', '.join(str(q) for q in HDR_GQS)}]) as double) AS q),
    ranks AS (
      SELECT t.event_type, q.q, cast(ceil(q.q * t.n) as bigint) AS r, t.n
      FROM tot t CROSS JOIN qs q
    )
    SELECT r.event_type, r.q AS q,
           cast(r.n as bigint) AS n_total,
           cast(min(c.lower_fp) as double) / 100.0 AS est_value
    FROM ranks r
    JOIN cum c ON c.event_type = r.event_type AND c.cum_cnt >= r.r
    GROUP BY r.event_type, r.q, r.n
    """,
)
def hdr_grouped_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..sources.tables import load_table

    fp = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("cast(floor(value * 100) as bigint)").alias("v"),
        )
        .where(F.col("v") >= 1)
    )
    sketch = (
        fp.select(
            "event_type",
            F.expr(_HDR_B["bucket"]).alias("bucket"),
            F.expr(_HDR_B["lower"]).alias("lower_fp"),
        )
        .groupBy("event_type", "bucket", "lower_fp")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # per-group total n rides the SAME window pass as the cumulative walk
    # (full-frame sum of bucket counts ≡ count over fp per group): one fact
    # scan for the sketch instead of a second count aggregate + join
    # (guide §2.3); the quantile probe is then a broadcast cross join +
    # filter over the tiny sketch frame
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("lower_fp")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = (
        Window.partitionBy("event_type")
        .orderBy("lower_fp")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    cum = sketch.withColumn("cum_cnt", F.sum("cnt").over(w_cum)).withColumn(
        "n", F.sum("cnt").over(w_tot)
    )
    qs = spark.createDataFrame([(q,) for q in HDR_GQS], "q double")
    return (
        cum.crossJoin(F.broadcast(qs))
        .withColumn("r", F.expr("cast(ceil(q * n) as bigint)"))
        .where(F.col("cum_cnt") >= F.col("r"))
        .groupBy("event_type", "q", "n")
        .agg(F.min("lower_fp").alias("est_fp"))
        .select(
            "event_type",
            "q",
            F.col("n").cast("bigint").alias("n_total"),
            (F.col("est_fp").cast("double") / 100.0).alias("est_value"),
        )
    )
