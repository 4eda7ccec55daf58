"""Rank-list, revenue/open-account, online-time and monitor report families.

Reference jobs covered (SURVEY §0 packages `cn.ipanel.rank`,
`cn.ipanel.homed.repots`, `cn.ipanel.homed.general`, `cn.ipanel.monitor`):

- StarRank.scala:40-50,113-124 — dense_rank top-100 rank list, serialized
  rank entries (Redis hset payload shape).
- SetFavoriteRank.scala:94-95 — sourceType/rankType id-range classification
  feeding per-type rank lists.
- RevenueReport.scala:98 — row_number()=1 latest revenue record per account,
  then per-segment revenue roll-up.
- PersonalOpenAccount.scala / NewAnalysis.scala — "account open" = first
  order per customer; daily new-account counts per segment.
- OnlineUsersAndTime.scala:181 / OnlineUsersAndTimeNew.scala:391
  (`get_online_times` UDF) — per-day online seconds for sessions that span
  day boundaries, re-expressed as sequence()+explode over day numbers
  (no UDF; stays in whole-stage codegen).
- VisitOverview.scala:73 — regexp_replace key cleanup + daily visit/uv/avg
  duration overview.
- MediaRepertory.scala — media-inventory counts per brand/type family.
- monitor/MonitorApp.scala:16-48 — per-day report-completeness flags over an
  expected-report calendar (calendar × expected list, left join actuals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.enrich import dim_join
from ..sources.tables import load_table
from .core_relational import dsum
from .homed_behavior import EV_SEC, events_sec
from .registry import query

# --------------------------------------------------------------------------
# StarRank: global dense_rank top-100 with a serialized per-row rank entry.
# Rank subject = supplier, score = lineitem revenue (the reference ranked
# stars by play count; the operator chain — agg, dense_rank, <=100 filter,
# '&'-packed entry — is identical).
@query(
    "star_rank_top100",
    oracle="""
    WITH rev AS (
      SELECT s.s_suppkey, s.s_name,
             cast(cast(sum(cast(l.l_extendedprice*(1-l.l_discount) as decimal(27,6))) as varchar) as double) AS revenue
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY s.s_suppkey, s.s_name
    ),
    ranked AS (
      SELECT *, dense_rank() OVER (ORDER BY revenue DESC, s_suppkey) AS f_rank
      FROM rev
    )
    SELECT f_rank, s_suppkey, s_name, revenue,
           concat(f_rank, '&', s_suppkey, '&',
                  cast(cast(round(revenue * 100) as bigint) as varchar)) AS rank_entry
    FROM ranked WHERE f_rank <= 100
    """,
)
def star_rank_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = (
        dim_join(li, supp, li["l_suppkey"] == supp["s_suppkey"], "inner")
        .groupBy("s_suppkey", "s_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )
    # s_suppkey tie-breaks the ordering, so dense_rank == row_number and the
    # scale-safe take-ordered top-k (operators/aggregate.global_top_k) is
    # exact: distributed local top-100 heaps, rank over the 100 survivors —
    # no single-partition WindowExec over all suppliers.
    from ..operators.aggregate import global_top_k

    ranked = global_top_k(
        rev, [F.col("revenue").desc(), F.col("s_suppkey")], 100, rank_col="f_rank"
    )
    return ranked.select(
        "f_rank",
        "s_suppkey",
        "s_name",
        "revenue",
        F.concat_ws(
            "&", "f_rank", "s_suppkey", F.round(F.col("revenue") * 100).cast("bigint")
        ).alias("rank_entry"),
    )


# --------------------------------------------------------------------------
# SetFavoriteRank: integer-range classification of an id into a source type
# (sourceType/rankType UDFs, SetFavoriteRank.scala:94-95), then a per-type
# row_number top-10 rank list.  Classification is a when-chain on
# (p_partkey % 1000) ranges — native expressions, no UDF (SURVEY P6/P7).
@query(
    "favorite_rank_by_source",
    oracle="""
    WITH classified AS (
      SELECT p_partkey, p_name, p_retailprice,
             CASE WHEN p_partkey % 1000 < 300 THEN 'video'
                  WHEN p_partkey % 1000 < 700 THEN 'audio'
                  ELSE 'channel' END AS source_type
      FROM part
    )
    SELECT source_type, f_rank, p_partkey, p_name, p_retailprice
    FROM (
      SELECT *, row_number() OVER (PARTITION BY source_type
                 ORDER BY p_retailprice DESC, p_partkey) AS f_rank
      FROM classified
    ) WHERE f_rank <= 10
    """,
)
def favorite_rank_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    bucket = F.col("p_partkey") % 1000
    classified = part.select(
        "p_partkey",
        "p_name",
        "p_retailprice",
        F.when(bucket < 300, "video")
        .when(bucket < 700, "audio")
        .otherwise("channel")
        .alias("source_type"),
    )
    w = Window.partitionBy("source_type").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        classified.withColumn("f_rank", F.row_number().over(w))
        .where(F.col("f_rank") <= 10)
        .select("source_type", "f_rank", "p_partkey", "p_name", "p_retailprice")
    )


# --------------------------------------------------------------------------
# RevenueReport: keep only the LATEST order per customer (row_number()=1
# over date desc — RevenueReport.scala:98), then roll latest-order revenue
# up to market segment.
@query(
    "revenue_latest_order",
    oracle="""
    WITH latest AS (
      SELECT c.c_mktsegment, o.o_totalprice
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      QUALIFY row_number() OVER (PARTITION BY o.o_custkey
              ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) = 1
    )
    SELECT c_mktsegment,
           count(*) AS n_customers,
           cast(cast(sum(cast(o_totalprice as decimal(27,6))) as varchar) as double) AS latest_revenue
    FROM latest GROUP BY c_mktsegment
    """,
)
def revenue_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    latest = orders.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    latest = dim_join(latest, cust, latest["o_custkey"] == cust["c_custkey"], "inner")
    return latest.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum(F.col("o_totalprice"), "latest_revenue"),
    )


# --------------------------------------------------------------------------
# PersonalOpenAccount / NewAnalysis: "account open" = a customer's FIRST
# order; daily open counts per segment.  min/argmin per key, then count —
# the first-seen lifecycle primitive.
@query(
    "open_account_daily",
    oracle="""
    WITH first_order AS (
      SELECT o_custkey, min(o_orderdate) AS open_date
      FROM orders GROUP BY o_custkey
    )
    SELECT strftime(f.open_date, '%Y-%m-%d') AS open_day,
           c.c_mktsegment,
           count(*) AS n_new_accounts
    FROM first_order f JOIN customer c ON f.o_custkey = c.c_custkey
    GROUP BY 1, 2
    """,
)
def open_account_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    first = orders.groupBy("o_custkey").agg(F.min("o_orderdate").alias("open_date"))
    first = dim_join(first, cust, first["o_custkey"] == cust["c_custkey"], "inner")
    return first.groupBy(
        F.date_format("open_date", "yyyy-MM-dd").alias("open_day"), "c_mktsegment"
    ).agg(F.count(F.lit(1)).alias("n_new_accounts"))


# --------------------------------------------------------------------------
# OnlineUsersAndTime `get_online_times`: a session [start, start+dur) may
# cross midnight; credit each day with its overlap seconds.  The reference
# did this row-at-a-time in a Scala UDF; here the day range is generated
# with sequence()+explode and the overlap is a least/greatest expression —
# distributed, codegen'd, and linear in (rows × days spanned).
@query(
    "daily_online_seconds",
    oracle=f"""
    WITH ev AS ({EV_SEC}),
    sess AS (
      SELECT user_id, sec AS start_sec,
             sec + cast(floor(value * 500) as bigint) AS end_sec
      FROM ev WHERE floor(value * 500) > 0
    ),
    split AS (
      SELECT user_id, start_sec, end_sec,
             unnest(generate_series(start_sec//86400, (end_sec-1)//86400)) AS day_num
      FROM sess
    )
    SELECT day_num,
           cast(sum(least(end_sec, (day_num+1)*86400) - greatest(start_sec, day_num*86400)) as bigint)
             AS online_sec,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_slices
    FROM split GROUP BY day_num
    """,
)
def daily_online_seconds(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_sec(spark, sf_dir)
    dur = F.floor(F.col("value") * 500).cast("bigint")
    sess = ev.select(
        "user_id",
        F.col("sec").alias("start_sec"),
        (F.col("sec") + dur).alias("end_sec"),
    ).where(dur > 0)
    split = sess.select(
        "user_id",
        "start_sec",
        "end_sec",
        F.explode(
            F.sequence(
                F.expr("start_sec div 86400"), F.expr("(end_sec - 1) div 86400")
            )
        ).alias("day_num"),
    )
    overlap = F.least(F.col("end_sec"), (F.col("day_num") + 1) * 86400) - F.greatest(
        F.col("start_sec"), F.col("day_num") * 86400
    )
    return split.groupBy("day_num").agg(
        F.sum(overlap).cast("bigint").alias("online_sec"),
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_slices"),
    )


# --------------------------------------------------------------------------
# VisitOverview: regexp_replace key cleanup (VisitOverview.scala:73) +
# daily visits / uv / average-duration overview.  The average is computed
# as exact-decimal sum ÷ count, then rounded via floor(x*1e4 + 0.5)/1e4 —
# the SAME IEEE expression on both engines — because engine-native
# round() diverges when the quotient lands on a representational tie at
# the target digit (Spark rounds the double's exact binary expansion,
# DuckDB rounds a re-scaled product; observed one ULP apart at sf0.001).
@query(
    "visit_overview",
    oracle=f"""
    WITH ev AS ({EV_SEC})
    SELECT sec//86400 AS day_num,
           regexp_replace(event_type, '[^a-z]', '', 'g') AS visit_kind,
           count(*) AS n_visits,
           count(DISTINCT user_id) AS n_users,
           floor(cast(cast(sum(cast(value as decimal(27,6))) as varchar) as double) / count(*) * 10000 + 0.5) / 10000 AS avg_duration
    FROM ev GROUP BY 1, 2
    """,
)
def visit_overview(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_sec(spark, sf_dir)
    return (
        ev.groupBy(
            F.expr("sec div 86400").alias("day_num"),
            F.regexp_replace("event_type", "[^a-z]", "").alias("visit_kind"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_visits"),
            F.countDistinct("user_id").alias("n_users"),
            (
                F.floor(
                    F.sum(F.col("value").cast("decimal(27,6)")).cast("double")
                    / F.count(F.lit(1))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("avg_duration"),
        )
    )


# --------------------------------------------------------------------------
# MediaRepertory: media-inventory roll-up — item counts, size spread, and
# catalogue value per (brand, type family), type family = first token of
# the type string (split()).
@query(
    "media_inventory",
    oracle="""
    SELECT p_brand,
           split_part(p_type, ' ', 1) AS type_family,
           count(*) AS n_items,
           count(DISTINCT p_size) AS n_sizes,
           cast(cast(sum(cast(p_retailprice as decimal(27,6))) as varchar) as double) AS catalogue_value
    FROM part GROUP BY 1, 2
    """,
)
def media_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy(
            "p_brand", F.split(F.col("p_type"), " ").getItem(0).alias("type_family")
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.countDistinct("p_size").alias("n_sizes"),
            dsum(F.col("p_retailprice"), "catalogue_value"),
        )
    )


# --------------------------------------------------------------------------
# MonitorApp: report-completeness check — build the full expected calendar
# (every day in the data's range × every expected report kind, one extra
# kind that never occurs), left-join actual daily counts, flag gaps.
# The calendar is generated distributedly from the data's own min/max day
# (sequence+explode on a 1-row aggregate — no driver collect).
@query(
    "report_completeness_monitor",
    oracle=f"""
    WITH ev AS ({EV_SEC}),
    actual AS (
      SELECT sec//86400 AS day_num, event_type, count(*) AS n
      FROM ev GROUP BY 1, 2
    ),
    bounds AS (SELECT min(sec//86400) AS mn, max(sec//86400) AS mx FROM ev),
    days AS (SELECT unnest(generate_series(mn, mx)) AS day_num FROM bounds),
    kinds AS (SELECT unnest(['click','view','purchase','signup','error','heartbeat']) AS event_type)
    SELECT d.day_num, k.event_type,
           cast(coalesce(a.n, 0) as bigint) AS n_rows,
           CASE WHEN a.n IS NULL THEN 0 ELSE 1 END AS f_complete
    FROM days d CROSS JOIN kinds k
    LEFT JOIN actual a ON a.day_num = d.day_num AND a.event_type = k.event_type
    """,
)
def report_completeness_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_sec(spark, sf_dir).withColumn("day_num", F.expr("sec div 86400"))
    actual = ev.groupBy("day_num", "event_type").agg(F.count(F.lit(1)).alias("n"))
    days = (
        ev.agg(F.min("day_num").alias("mn"), F.max("day_num").alias("mx"))
        .select(F.explode(F.sequence("mn", "mx")).alias("day_num"))
    )
    kinds = F.array(
        *[F.lit(k) for k in ("click", "view", "purchase", "signup", "error", "heartbeat")]
    )
    expected = days.select("day_num", F.explode(kinds).alias("event_type"))
    joined = expected.join(actual, ["day_num", "event_type"], "left")
    return joined.select(
        "day_num",
        "event_type",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n_rows"),
        F.when(F.col("n").isNull(), 0).otherwise(1).alias("f_complete"),
    )


# --------------------------------------------------------------------------
# UserChannelRank (rank/reports/UserChannelRank.scala:60-105): per
# (user, terminal-bucket) ordered top-10 channel list by watch time.
# The reference hand-rolled this as reduceByKey + bubble sort + slice on
# the driver's partition iterators; here it is one hash agg + one
# per-user agg whose ordering is a sorted struct array (stays in
# whole-stage codegen, no window shuffle beyond the two keyed aggs).
# Terminal buckets mirror UserChannelRank.scala:85-90 (1/2→stb, 3→mob,
# else pc); "channel" ↦ event_type, watch time ↦ sum(value).
@query(
    "user_channel_rank",
    oracle="""
    WITH ev AS (
      SELECT user_id,
             CASE WHEN user_id % 4 IN (1, 2) THEN 'stb'
                  WHEN user_id % 4 = 3 THEN 'mob'
                  ELSE 'pc' END AS terminal,
             event_type AS channel, value
      FROM events
    ),
    per_channel AS (
      SELECT user_id, terminal, channel,
             cast(cast(sum(cast(value as decimal(27,6))) as varchar) as double) AS sum_time
      FROM ev GROUP BY 1, 2, 3
    )
    SELECT user_id, terminal,
           cast(count(*) as bigint) AS n_channels,
           array_to_string(
             (list(channel ORDER BY sum_time DESC, channel))[1:10], '|'
           ) AS top_channels
    FROM per_channel GROUP BY user_id, terminal
    """,
)
def user_channel_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_sec(spark, sf_dir).select(
        "user_id",
        F.when((F.col("user_id") % 4).isin(1, 2), "stb")
        .when(F.col("user_id") % 4 == 3, "mob")
        .otherwise("pc")
        .alias("terminal"),
        F.col("event_type").alias("channel"),
        "value",
    )
    per_channel = ev.groupBy("user_id", "terminal", "channel").agg(
        dsum(F.col("value"), "sum_time")
    )
    # descending watch time, channel asc on ties: sort structs of
    # (-sum_time, channel) ascending, then project the channel back out.
    ranked = F.transform(
        F.slice(
            F.array_sort(F.collect_list(F.struct((-F.col("sum_time")).alias("neg"), F.col("channel")))),
            1,
            10,
        ),
        lambda s: s["channel"],
    )
    return per_channel.groupBy("user_id", "terminal").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_channels"),
        F.concat_ws("|", ranked).alias("top_channels"),
    )


# --------------------------------------------------------------------------
# StarRankWeek/StarRankMonth (`rank/reports/StarRankWeek.scala:64-181`,
# StarRankMonth is the same pipeline at month grain): three heat feeds —
# search/attention/click (loadSearchAttentionClick), net attention
# (loadNetAttention), media heat (computeMediaHeat) — are unioned with
# each feed filling only its own columns (:67), summed per (star, period)
# (sql2 :84-91), totalled per period (sql3 :92-98), share-joined
# (sql4 :102-109), and the composite heat is
#   attention_share×0.35 + media_heat_share×0.25 + search_share×0.20
#   + click_share×0.15 + net_share×0.5
# rounded to 4 dp (`computeActorHeat:167-177`; the 0.5 net weight is the
# reference's literal `ACTOR_RANK_NET_SEARCH_PROPORTION` — the weights
# deliberately sum to 1.45 exactly as deployed).  periodType: week=2,
# month=3 (`rank/common/Constant.scala:83-85`).
#
# Spark-first: the reference computed heat row-by-row in a mapPartitions
# over collected Longs (:112-133); here it is one column expression.  The
# per-period totals are window sums over the aggregated frame sharing the
# SAME (period, date) partitioning as the final top-100 rank window — one
# exchange serves both, and the rank is date-PARTITIONED (never a
# partition-less global window).  All double math is decimal-summed
# before the single share division so both engines see identical bits.
# Star = supplier, clicks = lineitems, searches = distinct orders,
# attention = quantity, net attention = first-line lineitems (the dim the sf schema keeps), media
# heat = non-returned revenue.
_STAR_PERIOD_ORACLE = """
WITH base AS (
  SELECT s.s_suppkey AS f_star_id, s.s_name AS f_star_name,
         l.l_orderkey, l.l_quantity, l.l_returnflag, l.l_linenumber,
         cast(l.l_extendedprice*(1-l.l_discount) as decimal(27,6)) AS rev,
         datediff('day', DATE '1970-01-01', o.o_orderdate) AS day
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
),
labelled AS (
  SELECT 2 AS f_period_type,
         strftime(DATE '1970-01-01' + cast(((day - 4)//7)*7 + 4 as int), '%Y-%m-%d')
           AS f_date, *
  FROM base
  UNION ALL
  SELECT 3 AS f_period_type,
         strftime(DATE '1970-01-01' + cast(day as int), '%Y-%m') AS f_date, *
  FROM base
),
sna AS (
  SELECT f_period_type, f_date, f_star_id, f_star_name,
         cast(count(*) as bigint) AS f_click_count,
         cast(count(DISTINCT l_orderkey) as bigint) AS f_search_count,
         cast(sum(l_quantity) as bigint) AS f_attention_count,
         cast(0 as bigint) AS f_net_attention_count,
         cast(0 as decimal(27,6)) AS heat_dec
  FROM labelled GROUP BY 1, 2, 3, 4
  UNION ALL
  SELECT f_period_type, f_date, f_star_id, f_star_name,
         0, 0, 0, cast(count(*) as bigint), cast(0 as decimal(27,6))
  FROM labelled WHERE l_linenumber = 1 GROUP BY 1, 2, 3, 4
  UNION ALL
  SELECT f_period_type, f_date, f_star_id, f_star_name,
         0, 0, 0, 0, cast(sum(rev) as decimal(27,6))
  FROM labelled WHERE l_returnflag != 'R' GROUP BY 1, 2, 3, 4
),
per_star AS (
  SELECT f_period_type, f_date, f_star_id, f_star_name,
         cast(sum(f_click_count) as bigint) AS f_click_count,
         cast(sum(f_search_count) as bigint) AS f_search_count,
         cast(sum(f_attention_count) as bigint) AS f_attention_count,
         cast(sum(f_net_attention_count) as bigint) AS f_net_attention_count,
         cast(sum(heat_dec) as decimal(27,6)) AS heat_dec
  FROM sna GROUP BY 1, 2, 3, 4
),
totals AS (
  SELECT f_period_type, f_date,
         cast(sum(f_click_count) as bigint) AS t_click,
         cast(sum(f_search_count) as bigint) AS t_search,
         cast(sum(f_attention_count) as bigint) AS t_attention,
         cast(sum(f_net_attention_count) as bigint) AS t_net,
         cast(sum(heat_dec) as decimal(27,6)) AS t_heat
  FROM per_star GROUP BY 1, 2
),
scored AS (
  SELECT p.*,
         round(
           (CASE WHEN t.t_attention = 0 THEN 0.0
                 ELSE cast(p.f_attention_count as double)/cast(t.t_attention as double)
            END) * 0.35
           + (CASE WHEN t.t_heat = 0 THEN 0.0
                   ELSE cast(p.heat_dec as double)/cast(t.t_heat as double) END) * 0.25
           + (CASE WHEN t.t_search = 0 THEN 0.0
                   ELSE cast(p.f_search_count as double)/cast(t.t_search as double)
              END) * 0.20
           + (CASE WHEN t.t_click = 0 THEN 0.0
                   ELSE cast(p.f_click_count as double)/cast(t.t_click as double)
              END) * 0.15
           + (CASE WHEN t.t_net = 0 THEN 0.0
                   ELSE cast(p.f_net_attention_count as double)/cast(t.t_net as double)
              END) * 0.5, 4) AS f_heat
  FROM per_star p JOIN totals t USING (f_period_type, f_date)
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY f_period_type, f_date
                               ORDER BY f_heat DESC, f_star_id) AS f_rank
  FROM scored
)
SELECT f_period_type, f_date, f_rank, f_star_id, f_star_name,
       f_click_count, f_search_count, f_attention_count, f_net_attention_count,
       cast(heat_dec as double) AS f_actor_heat, f_heat
FROM ranked WHERE f_rank <= 100
"""


@query("star_rank_period_heat", oracle=_STAR_PERIOD_ORACLE)
def star_rank_period_heat(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregate import top_n_per_group

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity", "l_returnflag", "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(27,6)")
        .alias("rev"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.expr("datediff(o_orderdate, DATE'1970-01-01')").alias("day")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("f_star_id"), F.col("s_name").alias("f_star_name")
    )
    base = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == F.col("f_star_id"))
        .drop("o_orderkey", "l_suppkey")
    )
    week = F.expr(
        "date_format(date_add(DATE'1970-01-01',"
        " cast(floor((day - 4)/7)*7 + 4 as int)), 'yyyy-MM-dd')"
    )
    month = F.expr("date_format(date_add(DATE'1970-01-01', cast(day as int)), 'yyyy-MM')")

    # The reference unions three feeds because they come from three
    # different log tables; with one synthetic fact the idiomatic plan is
    # ONE conditional aggregation — identical per-star rows (each feed's
    # zero-fill + re-sum collapses to a filtered aggregate), one fact
    # shuffle instead of three (the cpsp_hourly_tiers precedent).
    #
    # Period labelling happens AFTER a (day, star) pre-aggregation, not by
    # unioning two selects over the joined fact: Catalyst does not
    # de-duplicate common subtrees, so the old union shape scanned
    # lineitem/orders and ran the orderkey join TWICE (6 scans / 8 join
    # nodes in plans/r10/star_rank_period_heat_before.txt).  `day` is
    # functional on l_orderkey (one o_orderdate per order), so per-day
    # DISTINCT order counts partition the per-period distinct sets and
    # their sums are exact — every other measure is a plain sum.  The
    # fact is scanned, joined and shuffled ONCE; the week/month explode
    # runs over the (day, star)-grain frame (guide §2.3/§2.4).  Verified
    # row-identical to the union shape at sf0.1 (363,204 rows).
    day_star = base.groupBy("day", "f_star_id", "f_star_name").agg(
        F.count(F.lit(1)).alias("d_click"),
        F.countDistinct("l_orderkey").alias("d_search"),
        F.sum("l_quantity").alias("d_attention"),
        F.sum(F.when(F.col("l_linenumber") == 1, 1).otherwise(0)).alias("d_net"),
        F.sum(F.when(F.col("l_returnflag") != "R", F.col("rev"))).alias("d_heat"),
    )
    labelled = day_star.select(
        F.explode(
            F.array(
                F.struct(F.lit(2).alias("f_period_type"), week.alias("f_date")),
                F.struct(F.lit(3).alias("f_period_type"), month.alias("f_date")),
            )
        ).alias("__p"),
        "*",
    ).select("__p.*", *day_star.columns)
    keys = ["f_period_type", "f_date", "f_star_id", "f_star_name"]
    per_star = labelled.groupBy(*keys).agg(
        F.sum("d_click").cast("bigint").alias("f_click_count"),
        F.sum("d_search").cast("bigint").alias("f_search_count"),
        F.sum("d_attention").cast("bigint").alias("f_attention_count"),
        F.sum("d_net").cast("bigint").alias("f_net_attention_count"),
        F.sum("d_heat").cast("decimal(27,6)").alias("heat_dec_raw"),
    ).withColumn(
        # feeds that contributed nothing summed to 0 in the union shape
        "heat_dec", F.coalesce(F.col("heat_dec_raw"), F.lit(0).cast("decimal(27,6)"))
    ).drop("heat_dec_raw")

    # per-period totals as a window over the aggregated frame — the rank
    # window below shares the same (f_period_type, f_date) partitioning,
    # so Catalyst plans ONE exchange+sort for both (no totals join, no
    # second aggregation, no persist needed)
    from pyspark.sql.window import Window as W

    tot = W.partitionBy("f_period_type", "f_date")
    scored = (
        per_star.withColumn("t_click", F.sum("f_click_count").over(tot))
        .withColumn("t_search", F.sum("f_search_count").over(tot))
        .withColumn("t_attention", F.sum("f_attention_count").over(tot))
        .withColumn("t_net", F.sum("f_net_attention_count").over(tot))
        .withColumn(
            "t_heat", F.sum("heat_dec").over(tot).cast("decimal(27,6)")
        )
    )

    def share(num, den):
        return F.when(F.col(den) == 0, F.lit(0.0)).otherwise(
            F.col(num).cast("double") / F.col(den).cast("double")
        )

    scored = scored.withColumn(
        "f_heat",
        F.round(
            share("f_attention_count", "t_attention") * 0.35
            + share("heat_dec", "t_heat") * 0.25
            + share("f_search_count", "t_search") * 0.20
            + share("f_click_count", "t_click") * 0.15
            + share("f_net_attention_count", "t_net") * 0.5,
            4,
        ),
    )
    ranked = top_n_per_group(
        scored,
        ["f_period_type", "f_date"],
        [F.col("f_heat").desc(), F.col("f_star_id")],
        100,
        rank_col="f_rank",
        dense=False,
    )
    return ranked.select(
        "f_period_type", "f_date", "f_rank", "f_star_id", "f_star_name",
        "f_click_count", "f_search_count", "f_attention_count",
        "f_net_attention_count",
        F.col("heat_dec").cast("double").alias("f_actor_heat"),
        "f_heat",
    )
