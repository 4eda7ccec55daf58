"""Window frames, as-of attribution, and lateral-view explode — the last
uncovered expression families.

- The reference used *no* rowsBetween/rangeBetween frames (SURVEY §2.5
  note); running totals are table stakes for an analytics engine, so the
  engine supports and pins them.
- As-of ("most recent prior event") is the reference's J5+W4 'latest
  state' pattern generalized; expressed as a frame-bounded conditional max,
  one window pass, no join.
- Multi-valued-attribute explode mirrors `lateral view explode(split(...))`
  (reference DemandPackage.scala:275-283, channel f_subtype 'a|b' columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .core_relational import dsum
from .homed_behavior import EV_SEC, events_sec
from .registry import query


# --------------------------------------------------------------------------
# Running totals: per-customer cumulative order value over time
# (ROWS UNBOUNDED PRECEDING frame).
@query(
    "running_customer_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey,
           cast(cast(sum(cast(o_totalprice as decimal(27,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as varchar) as double) AS running_total,
           cast(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) as bigint) AS order_seq
    FROM orders
    WHERE o_custkey % 100 = 0
    """,
)
def running_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") % 100 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(27,6)"))
        .over(frame)
        .cast("double")
        .alias("running_total"),
        F.row_number().over(w).cast("bigint").alias("order_seq"),
    )


# --------------------------------------------------------------------------
# As-of attribution: for each purchase, the user's most recent prior click
# (frame-bounded conditional max — the as-of join spelled as one window).
@query(
    "purchase_attribution",
    oracle=f"""
    WITH ev AS ({EV_SEC}),
    attributed AS (
      SELECT *,
             max(CASE WHEN event_type = 'click' THEN sec END)
               OVER (PARTITION BY user_id ORDER BY sec, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_sec
      FROM ev
    )
    SELECT user_id,
           count(*) AS n_purchases,
           cast(sum(CASE WHEN last_click_sec IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS n_attributed,
           cast(sum(CASE WHEN last_click_sec IS NOT NULL THEN sec - last_click_sec ELSE 0 END) as bigint) AS total_latency_sec
    FROM attributed
    WHERE event_type = 'purchase'
    GROUP BY user_id
    """,
)
def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_sec(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    attributed = ev.withColumn(
        "last_click_sec",
        F.max(F.when(F.col("event_type") == "click", F.col("sec"))).over(w),
    )
    return (
        attributed.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.when(F.col("last_click_sec").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_attributed"),
            F.sum(
                F.when(
                    F.col("last_click_sec").isNotNull(),
                    F.col("sec") - F.col("last_click_sec"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("total_latency_sec"),
        )
    )


# --------------------------------------------------------------------------
# RANGE frame: trailing-30-day revenue per customer at each order (value-
# based frame over epoch days, not row counts — the other frame family).
@query(
    "trailing_30d_revenue",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             epoch_us(o_orderdate)//1000000//86400 AS day_num
      FROM orders WHERE o_custkey % 100 = 0
    )
    SELECT o_custkey, o_orderkey,
           cast(cast(sum(cast(o_totalprice as decimal(27,6)))
                OVER (PARTITION BY o_custkey ORDER BY day_num
                      RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) as varchar) as double) AS rev_30d
    FROM o
    """,
)
def trailing_30d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") % 100 == 0)
    o = orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        # o_orderdate is TIMESTAMP_NTZ (parquet, not UTC-adjusted): epoch
        # functions reject it; day arithmetic goes through datediff
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("day_num"),
    )
    w = Window.partitionBy("o_custkey").orderBy("day_num").rangeBetween(-29, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(27,6)"))
        .over(w)
        .cast("double")
        .alias("rev_30d"),
    )


# --------------------------------------------------------------------------
# Lateral-view explode of a multi-valued attribute: part types are
# space-separated words ('a|b'-style columns in the reference); revenue is
# attributed to every word.
@query(
    "demand_by_type_word",
    oracle="""
    WITH exploded AS (
      SELECT l.l_extendedprice, l.l_discount,
             unnest(string_split(p.p_type, ' ')) AS type_word
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    )
    SELECT type_word,
           count(*) AS n_lines,
           cast(cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(27,6))) as varchar) as double) AS revenue
    FROM exploded GROUP BY type_word
    """,
)
def demand_by_type_word(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    joined = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"], "inner")
    exploded = joined.select(
        "l_extendedprice",
        "l_discount",
        F.explode(F.split("p_type", " ")).alias("type_word"),
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return exploded.groupBy("type_word").agg(
        F.count(F.lit(1)).alias("n_lines"), dsum(rev, "revenue")
    )


# --------------------------------------------------------------------------
# U-shaped (position-based) multi-touch attribution: where
# `purchase_attribution` above credits ONLY the last click, marketing-grade
# attribution splits each purchase's credit across ALL prior clicks —
# 40% to the first touch, 40% to the last, 20% spread over the middle
# (the standard "position-based" model; 1 touch → 100%, 2 touches →
# 50/50).  Credit is integer permille so both engines do exact integer
# arithmetic: the middle pot is floor(200/(n-2)) per middle touch and the
# flooring REMAINDER goes to the last touch, so every attributed purchase
# allocates exactly 1000 permille (audited by the oracle's arithmetic
# being the same expression).
#
# Scale shape: identical to purchase_attribution — one window pass per
# user ordered by time (count/min/max over the prior-click frame), one
# hash aggregation; no join, no explode (bucket credits derive from the
# COUNT alone, so the per-click credit rows never materialize).
@query(
    "position_attribution_credit",
    oracle=f"""
    WITH ev AS ({EV_SEC}),
    marked AS (
      SELECT *,
             count(CASE WHEN event_type = 'click' THEN 1 END)
               OVER (PARTITION BY user_id ORDER BY sec, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS n_clicks,
             sum(CASE WHEN event_type = 'click' THEN sec END)
               OVER (PARTITION BY user_id ORDER BY sec, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_sec_sum
      FROM ev
    ),
    per_purchase AS (
      SELECT user_id, n_clicks,
             CASE WHEN n_clicks = 0 THEN 0
                  WHEN n_clicks = 1 THEN 1000
                  WHEN n_clicks = 2 THEN 500
                  ELSE 400 END AS first_pm,
             CASE WHEN n_clicks <= 1 THEN 0
                  WHEN n_clicks = 2 THEN 500
                  ELSE 400 + 200 - (200 // (n_clicks - 2)) * (n_clicks - 2) END AS last_pm,
             CASE WHEN n_clicks <= 2 THEN 0
                  ELSE (200 // (n_clicks - 2)) * (n_clicks - 2) END AS middle_pm,
             n_clicks * sec - coalesce(click_sec_sum, 0) AS gap_sum
      FROM marked WHERE event_type = 'purchase'
    )
    SELECT user_id,
           count(*) AS n_purchases,
           cast(sum(CASE WHEN n_clicks = 0 THEN 1 ELSE 0 END) as bigint) AS n_unattributed,
           cast(sum(first_pm) as bigint) AS first_permille,
           cast(sum(last_pm) as bigint) AS last_permille,
           cast(sum(middle_pm) as bigint) AS middle_permille,
           cast(sum(gap_sum) as bigint) AS total_gap_sec
    FROM per_purchase GROUP BY user_id
    """,
)
def position_attribution_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_sec(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_click = F.col("event_type") == "click"
    marked = ev.select(
        "user_id",
        "event_type",
        "sec",
        F.count(F.when(is_click, 1)).over(w).alias("n_clicks"),
        F.sum(F.when(is_click, F.col("sec"))).over(w).alias("click_sec_sum"),
    )
    n = F.col("n_clicks")
    middle_each = F.floor(F.lit(200) / (n - 2)).cast("bigint")
    per_purchase = marked.where(F.col("event_type") == "purchase").select(
        "user_id",
        n.alias("n_clicks"),
        F.when(n == 0, 0)
        .when(n == 1, 1000)
        .when(n == 2, 500)
        .otherwise(400)
        .cast("bigint")
        .alias("first_pm"),
        F.when(n <= 1, 0)
        .when(n == 2, 500)
        .otherwise(F.lit(400) + 200 - middle_each * (n - 2))
        .cast("bigint")
        .alias("last_pm"),
        F.when(n <= 2, 0)
        .otherwise(middle_each * (n - 2))
        .cast("bigint")
        .alias("middle_pm"),
        (n * F.col("sec") - F.coalesce("click_sec_sum", F.lit(0)))
        .cast("bigint")
        .alias("gap_sum"),
    )
    return per_purchase.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum((F.col("n_clicks") == 0).cast("int")).cast("bigint").alias("n_unattributed"),
        F.sum("first_pm").cast("bigint").alias("first_permille"),
        F.sum("last_pm").cast("bigint").alias("last_permille"),
        F.sum("middle_pm").cast("bigint").alias("middle_permille"),
        F.sum("gap_sum").cast("bigint").alias("total_gap_sec"),
    )
