"""Core relational operators over the star schema (SURVEY §2.1-§2.4, §2.6-2.7).

Each query exercises one operator family the reference implements across its
~110 report jobs, re-expressed as a single declarative DataFrame plan so
Catalyst supplies pushdown, partial aggregation, broadcast planning and AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.aggregate import keep_latest, multi_grain_rollup, tier_counts, top_n_per_group
from ..operators.enrich import dim_join, interval_join
from ..sources.tables import load_table
from .registry import query


def dsum(c: Column, alias: str) -> Column:
    """Order-independent double sum: exact decimal accumulate, double out."""
    return F.sum(c.cast("decimal(27,6)")).cast("double").alias(alias)


DSUM = "cast(cast(sum(cast({expr} as decimal(27,6))) as varchar) as double) as {alias}"


# --------------------------------------------------------------------------
# A1/A5 — hash aggregate with expression aggregates (TPC-H Q1 shape).
# Reference pattern: groupBy().agg(sum/count/avg) over the session fact,
# e.g. homed/realtime/ChannelLive.scala:83-87, ProgramDemand.scala:60-64.
@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           cast(cast(sum(cast(l_quantity as decimal(27,6))) as varchar) as double)            AS sum_qty,
           cast(cast(sum(cast(l_extendedprice as decimal(27,6))) as varchar) as double)       AS sum_base_price,
           cast(cast(sum(cast(l_extendedprice*(1-l_discount) as decimal(27,6))) as varchar) as double) AS sum_disc_price,
           cast(cast(sum(cast(l_extendedprice*(1-l_discount)*(1+l_tax) as decimal(27,6))) as varchar) as double) AS sum_charge,
           cast(cast(sum(cast(l_quantity as decimal(27,6))) as varchar) as double) / count(*) AS avg_qty,
           count(*)                                                          AS count_order
    FROM lineitem
    WHERE l_shipdate <= timestamp '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty"),
            dsum(F.col("l_extendedprice"), "sum_base_price"),
            dsum(disc, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            (
                F.sum(F.col("l_quantity").cast("decimal(27,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# J1/J2 — broadcast dimension-join chain (fact ⋈ dims), the reference's
# universal enrichment shape (etl/LogParser.scala:263-270 region join;
# forced 200MB broadcast, common/SparkSession.scala:21).
@query(
    "region_revenue",
    oracle="""
    SELECT r.r_name,
           cast(cast(sum(cast(l.l_extendedprice*(1-l.l_discount) as decimal(27,6))) as varchar) as double) AS revenue,
           count(DISTINCT o.o_orderkey)  AS n_orders,
           count(DISTINCT c.c_custkey)   AS n_customers
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    enriched = li.select("l_orderkey", "l_extendedprice", "l_discount").join(
        orders, li["l_orderkey"] == orders["o_orderkey"], "inner"
    )
    enriched = dim_join(enriched, cust, enriched["o_custkey"] == cust["c_custkey"], "inner")
    enriched = dim_join(enriched, nation, enriched["c_nationkey"] == nation["n_nationkey"], "inner")
    enriched = dim_join(enriched, region, enriched["n_regionkey"] == region["r_regionkey"], "inner")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return enriched.groupBy("r_name").agg(
        dsum(rev, "revenue"),
        F.countDistinct("o_orderkey").alias("n_orders"),
        F.countDistinct("c_custkey").alias("n_customers"),
    )


# --------------------------------------------------------------------------
# W5/O2 — dense_rank topN per group + deterministic ordering
# (homed/repots/ChannelReport.scala:220-251; rank/reports/StarRank.scala:40-50).
@query(
    "top_parts_per_brand",
    oracle="""
    WITH part_rev AS (
      SELECT p.p_brand, p.p_partkey,
             cast(cast(sum(cast(l.l_extendedprice*(1-l.l_discount) as decimal(27,6))) as varchar) as double) AS revenue
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand, p.p_partkey
    )
    SELECT p_brand, p_partkey, revenue, rnk FROM (
      SELECT p_brand, p_partkey, revenue,
             dense_rank() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS rnk
      FROM part_rev
    ) WHERE rnk <= 3
    """,
)
def top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice", "l_discount")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    part_rev = (
        dim_join(li, part, li["l_partkey"] == part["p_partkey"], "inner")
        .groupBy("p_brand", "p_partkey")
        .agg(dsum(rev, "revenue"))
    )
    top = top_n_per_group(
        part_rev,
        ["p_brand"],
        [F.col("revenue").desc(), F.col("p_partkey").asc()],
        3,
        rank_col="rnk",
        dense=True,
    )
    return top.withColumn("rnk", F.col("rnk").cast("bigint"))


# --------------------------------------------------------------------------
# A8/W4 — keep-latest-per-key. Reference: reduceByKey keep max-ts
# (homed/realtime/ChannelLive.scala:238-244; UserStatusByRunLog.scala:125-132).
@query(
    "latest_event_per_user",
    oracle="""
    SELECT user_id, event_type, value, epoch_us(ts)//1000000 AS ts_sec
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    # order by the native TIMESTAMP_NTZ ts (microsecond precision, same
    # ordering as the oracle's epoch_us); ts_sec alone would drop sub-second
    # ordering within a second
    ev = load_table(spark, sf_dir, "events")
    latest = keep_latest(ev, ["user_id"], "ts", "event_id", desc=True)
    return latest.select(
        "user_id", "event_type", "value", F.col("ts_sec").alias("ts_sec")
    )


# --------------------------------------------------------------------------
# J6 — interval (theta) join with equi key: lineitem shipped within 30 days
# of its order date.  Reference shape: play-start BETWEEN program start/end
# with channel equi key (homed/repots/ChannelReport.scala:68-73).
@query(
    "interval_join_ship_window",
    oracle="""
    SELECT o.o_orderpriority,
           count(*) AS n_lines,
           cast(cast(sum(cast(l.l_extendedprice as decimal(27,6))) as varchar) as double) AS base_price
    FROM lineitem l
    JOIN orders o
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
    GROUP BY o.o_orderpriority
    """,
)
def interval_join_ship_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    ).withColumn("o_window_end", F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
    joined = interval_join(
        li,
        orders,
        equi_keys=[("l_orderkey", "o_orderkey")],
        point_col="l_shipdate",
        range_start_col="o_orderdate",
        range_end_col="o_window_end",
        how="inner",
        broadcast_right=False,  # orders ~ fact-sized; equi key keeps it a hash join
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        dsum(F.col("l_extendedprice"), "base_price"),
    )


# --------------------------------------------------------------------------
# A6 — multi-grain rollup in one pass.  Reference re-aggregates region →
# city → province and unions with '-1' placeholders
# (ChannelReport.scala:266-273,360-367,448-451).
@query(
    "rollup_region_nation",
    oracle="""
    SELECT coalesce(cast(r_name as varchar), '-1') AS r_name,
           coalesce(cast(n_name as varchar), '-1') AS n_name,
           cast(cast(sum(cast(o_totalprice as decimal(27,6))) as varchar) as double) AS total_price,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    enriched = dim_join(orders, cust, orders["o_custkey"] == cust["c_custkey"], "inner")
    enriched = dim_join(enriched, nation, enriched["c_nationkey"] == nation["n_nationkey"], "inner")
    enriched = dim_join(enriched, region, enriched["n_regionkey"] == region["r_regionkey"], "inner")
    return multi_grain_rollup(
        enriched,
        ["r_name", "n_name"],
        [dsum(F.col("o_totalprice"), "total_price"), F.count(F.lit(1)).alias("n_orders")],
        placeholder="-1",
    )


# --------------------------------------------------------------------------
# A5 — conditional-aggregation pivot (tier buckets).
# Reference: sum(if(cond,1,0)) browse/hobby/steady tiers
# (ChannelReport.scala:169-171) and per-terminal pivots (:1349-1417).
@query(
    "customer_tier_pivot",
    oracle="""
    SELECT n.n_name,
           cast(sum(CASE WHEN c.c_acctbal < 0 THEN 1 ELSE 0 END) as bigint)                        AS tier_negative,
           cast(sum(CASE WHEN c.c_acctbal >= 0    AND c.c_acctbal < 5000 THEN 1 ELSE 0 END) as bigint) AS tier_low,
           cast(sum(CASE WHEN c.c_acctbal >= 5000 THEN 1 ELSE 0 END) as bigint)                    AS tier_high,
           count(*) AS n_customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def customer_tier_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    enriched = dim_join(cust, nation, cust["c_nationkey"] == nation["n_nationkey"], "inner")
    tiers = tier_counts(
        enriched,
        ["n_name"],
        F.col("c_acctbal"),
        [
            ("tier_negative", F.col("c_acctbal") < 0),
            ("tier_low", (F.col("c_acctbal") >= 0) & (F.col("c_acctbal") < 5000)),
            ("tier_high", F.col("c_acctbal") >= 5000),
        ],
    )
    counts = enriched.groupBy("n_name").agg(F.count(F.lit(1)).alias("n_customers"))
    return tiers.join(counts, "n_name", "inner")


# --------------------------------------------------------------------------
# U2/J10 — complement split as anti-join. Reference used
# cacheDF.except(videoPlayDF) (etl/LogParser.scala:119-120).
@query(
    "clickers_without_purchase",
    oracle="""
    SELECT e.user_id, (epoch_us(e.ts)//1000000)//86400 AS day_num, count(*) AS n_clicks
    FROM events e
    WHERE e.event_type = 'click'
      AND NOT EXISTS (
        SELECT 1 FROM events p
        WHERE p.event_type = 'purchase' AND p.user_id = e.user_id
          AND (epoch_us(p.ts)//1000000)//86400 = (epoch_us(e.ts)//1000000)//86400
      )
    GROUP BY 1, 2
    """,
)
def clickers_without_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user, day) grains with clicks but no purchase that day."""
    from ..operators.setops import anti_join

    ev = load_table(spark, sf_dir, "events").withColumn("day_num", F.expr("ts_sec div 86400"))
    clicks = ev.where(F.col("event_type") == "click")
    purchasers = (
        ev.where(F.col("event_type") == "purchase").select("user_id", "day_num").distinct()
    )
    return anti_join(clicks, purchasers, ["user_id", "day_num"]).groupBy(
        "user_id", "day_num"
    ).agg(F.count(F.lit(1)).alias("n_clicks"))


# --------------------------------------------------------------------------
# U1 — grain union with placeholder keys (the reference's 88 unionAll
# sites, e.g. ChannelReport.scala:448-451): day-grain ∪ month-grain rows
# in one report table.
_PERIODS = ("day", "week", "month", "quarter", "year")


def _grain_sql(grain: str) -> str:
    trunc = (
        "o_orderdate" if grain == "day" else f"date_trunc('{grain}', o_orderdate)"
    )
    return f"""
    SELECT '{grain}' AS grain, strftime({trunc}, '%Y-%m-%d') AS period,
           count(*) AS n_orders,
           cast(cast(sum(cast(o_totalprice as decimal(27,6))) as varchar) as double) AS total_price
    FROM orders GROUP BY 2
    """


@query(
    "union_period_grains",
    oracle=" UNION ALL ".join(_grain_sql(g) for g in _PERIODS),
)
def union_period_grains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's report-table period families (`*_by_day/_week/_month/
    _quarter/_year`, common/Tables.scala:119-128 etc.; period starts from
    DateUtils.getFirstDateOfWeek/Month/Quarter/Year:295-325) — one scan per
    grain, grain-unioned.  Both engines truncate weeks to ISO Monday."""
    from ..operators.setops import union_grains

    orders = load_table(spark, sf_dir, "orders")
    frames = []
    for grain in _PERIODS:
        period = (
            F.col("o_orderdate")
            if grain == "day"
            else F.date_trunc(grain, F.col("o_orderdate"))
        )
        frames.append(
            orders.groupBy(F.date_format(period, "yyyy-MM-dd").alias("period"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                dsum(F.col("o_totalprice"), "total_price"),
            )
            .withColumn("grain", F.lit(grain))
        )
    return union_grains(frames).select("grain", "period", "n_orders", "total_price")
