"""As-of join and subquery-shaped queries (semi-join, scalar subquery,
share-of-total).

The reference has no as-of join (SURVEY §2.3: "latest state" is done with
full-outer merges, nearest-key with interval containment) and no subquery
machinery (its "frontend" is hard-coded jobs).  A complete engine needs
both; each is expressed Spark-first:

- **as-of join** — ``operators/enrich.py::asof_join`` union+forward-fill
  (one key shuffle, no range explosion); oracle uses DuckDB's native
  ``ASOF LEFT JOIN`` — an independent implementation, so the test is a
  genuine cross-engine check of the semantics.
- **EXISTS / semi-join** — ``left_semi`` join (Catalyst turns correlated
  EXISTS into exactly this); no row duplication, no distinct needed.
- **scalar aggregate subquery** — per-group aggregate joined back
  (Q17 shape); the per-part limit table is small → broadcast.
- **share-of-total** — a 1-row global aggregate cross-joined (broadcast)
  against the per-group aggregate (Q11 shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.enrich import asof_join, dim_join
from ..sources.tables import load_table
from .core_relational import dsum
from .homed_behavior import EV_SEC, events_sec
from .registry import query


# --------------------------------------------------------------------------
# As-of join: each purchase event picks up the latest heartbeat value of
# the same user at-or-before its timestamp ('<=' backward semantics).
@query(
    "purchase_asof_heartbeat",
    oracle=f"""
    WITH ev AS ({EV_SEC}),
    hb AS (
      SELECT user_id, sec AS hb_sec, arg_max(value, event_id) AS hb_value
      FROM ev WHERE event_type = 'heartbeat' GROUP BY 1, 2
    ),
    p AS (
      SELECT user_id, event_id, sec, value
      FROM ev WHERE event_type = 'purchase'
    )
    SELECT p.user_id, p.event_id, p.sec, p.value, hb.hb_sec, hb.hb_value
    FROM p ASOF LEFT JOIN hb
      ON p.user_id = hb.user_id AND p.sec >= hb.hb_sec
    """,
)
def purchase_asof_heartbeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_sec(spark, sf_dir)
    quotes = (
        ev.where(F.col("event_type") == "heartbeat")
        .groupBy("user_id", F.col("sec").alias("hb_sec"))
        .agg(F.max_by("value", "event_id").alias("hb_value"))
    )
    points = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "sec", "value"
    )
    return asof_join(
        points, quotes, ["user_id"], "sec", "hb_sec", ["hb_sec", "hb_value"]
    ).select("user_id", "event_id", "sec", "value", "hb_sec", "hb_value")


# --------------------------------------------------------------------------
# EXISTS semi-join (TPC-H Q4 shape, adapted to this schema): count orders
# per priority that had at least one late line (shipped >90 days after the
# order date).  left_semi: no duplication from multi-line orders.
@query(
    "late_orders_by_priority",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    GROUP BY 1
    """,
)
def late_orders_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# --------------------------------------------------------------------------
# Scalar aggregate subquery (Q17 shape): revenue from lines whose quantity
# is below 20% of that part's average quantity.  The per-part limit table
# is a small aggregate → broadcast back onto the fact.
@query(
    "small_quantity_revenue",
    oracle="""
    WITH lim AS (
      SELECT l_partkey,
             0.2 * (cast(cast(sum(cast(l_quantity as decimal(27,6))) as varchar) as double) / count(*))
               AS qty_limit
      FROM lineitem GROUP BY 1
    )
    SELECT cast(count(*) as bigint) AS n_lines,
           round(cast(cast(sum(cast(l.l_extendedprice as decimal(27,6))) as varchar) as double) / 7.0, 4)
             AS avg_yearly
    FROM lineitem l JOIN lim ON l.l_partkey = lim.l_partkey
    WHERE l.l_quantity < lim.qty_limit
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    lim = li.groupBy("l_partkey").agg(
        (
            0.2
            * (
                F.sum(F.col("l_quantity").cast("decimal(27,6)")).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("qty_limit")
    )
    joined = li.join(F.broadcast(lim), "l_partkey").where(
        F.col("l_quantity") < F.col("qty_limit")
    )
    return joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(27,6)")).cast("double") / 7.0, 4
        ).alias("avg_yearly"),
    )


# --------------------------------------------------------------------------
# Share-of-total (Q11 shape): the top-20 parts by revenue with their share
# of the global total.  The global total is a 1-row aggregate, broadcast-
# cross-joined — the scalar-subquery plan Catalyst produces for
# `> (SELECT sum(...) ...)`; topN instead of a fixed threshold so the
# result is non-empty and stable at every scale factor.
@query(
    "part_share_of_total",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey,
             cast(cast(sum(cast(l_extendedprice*(1-l_discount) as decimal(27,6))) as varchar) as double)
               AS revenue
      FROM lineitem GROUP BY 1
    ),
    total AS (
      SELECT cast(cast(sum(cast(l_extendedprice*(1-l_discount) as decimal(27,6))) as varchar) as double)
               AS total_revenue
      FROM lineitem
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY revenue DESC, l_partkey) AS f_rank
      FROM per_part
    )
    SELECT r.f_rank, r.l_partkey, r.revenue,
           round(r.revenue / t.total_revenue, 9) AS share
    FROM ranked r, total t WHERE r.f_rank <= 20
    """,
)
def part_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregate import global_top_k

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = li.groupBy("l_partkey").agg(dsum(rev, "revenue"))
    total = li.agg(dsum(rev, "total_revenue"))
    # distributed take-ordered over all partkeys (billions at 100 TB), rank
    # assigned over the 20 survivors — no single-partition WindowExec
    ranked = global_top_k(
        per_part, [F.col("revenue").desc(), F.col("l_partkey")], 20, rank_col="f_rank"
    )
    return ranked.crossJoin(F.broadcast(total)).select(
        "f_rank",
        "l_partkey",
        "revenue",
        F.round(F.col("revenue") / F.col("total_revenue"), 9).alias("share"),
    )


# --------------------------------------------------------------------------
# Explicit GROUPING SETS (A6 exact parity): the reference computed
# region/city/province grains by re-aggregating and unioning with '-1'
# placeholders (ChannelReport.scala:266-273,448-451).  One-pass grouping
# sets with grouping() flags is the Spark-native spelling; irregular sets
# (both-keys, each-key, grand-total) are exactly what rollup/cube can't
# express.
@query(
    "grouping_sets_revenue",
    oracle="""
    SELECT coalesce(r.r_name, '-1') AS region_name,
           coalesce(o.o_orderpriority, '-1') AS priority,
           grouping(r.r_name)*2 + grouping(o.o_orderpriority) AS gid,
           count(*) AS n_orders,
           cast(cast(sum(cast(o.o_totalprice as decimal(27,6))) as varchar) as double) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY GROUPING SETS ((r.r_name, o.o_orderpriority), (r.r_name),
                            (o.o_orderpriority), ())
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    joined = (
        dim_join(orders, cust, orders["o_custkey"] == cust["c_custkey"], "inner")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    grouped = joined.groupingSets(
        [["r_name", "o_orderpriority"], ["r_name"], ["o_orderpriority"], []],
        "r_name",
        "o_orderpriority",
    ).agg(
        (F.grouping("r_name") * 2 + F.grouping("o_orderpriority")).alias("gid"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice"), "revenue"),
    )
    return grouped.select(
        F.coalesce("r_name", F.lit("-1")).alias("region_name"),
        F.coalesce("o_orderpriority", F.lit("-1")).alias("priority"),
        "gid",
        "n_orders",
        "revenue",
    )


# --------------------------------------------------------------------------
# Point-in-time-correct multi-source feature assembly (the feature-store
# "training set generation" join — Feast/Tecton point-in-time join,
# Uber Michelangelo's palette join): every label row (purchase) picks up,
# AS OF its timestamp, features from THREE event streams of two tables —
# cumulative click count, cumulative order count + spend (a DIFFERENT
# fact table, orders, keyed by the same user), the seconds since the last
# order, and the last-observed view value (LOCF).  No feature may leak
# from the label's future.
#
# Spark-first shape — and the reason it scales: N feature sources are
# assembled with ONE user-keyed shuffle and ONE sort, by tagging each
# source, unioning, and running every running-aggregate/LOCF fill in a
# single window pass (the asof_join union+forward-fill generalized to
# many features).  The naive formulation is N separate as-of joins = N
# sorts of the label table; at 100 TB the union costs one.  Within a
# timestamp, feature rows sort BEFORE label rows (krank asc, labels
# last): as-of-inclusive at equal timestamps, deterministic via the
# per-source uid tiebreak.
# Reference provenance: the reference's "latest state at event time"
# full-outer merges (homed/UserStatusAnalysis.scala J5 family) are the
# single-feature special case; the multi-source training-set assembly is
# part of the LLM-pipeline widening.
@query(
    "point_in_time_features",
    oracle=f"""
    WITH ev AS ({EV_SEC}),
    o AS (
      SELECT o_custkey AS user_id,
             (epoch_us(o_orderdate)//1000000//86400) * 86400 AS sec,
             o_orderkey AS uid,
             cast(o_totalprice as decimal(27,6)) AS amt
      FROM orders
    ),
    u AS (
      SELECT user_id, sec, 0 AS krank, uid, 0 AS click_i, 1 AS order_i,
             amt, cast(NULL as double) AS vval, 0 AS is_label
      FROM o
      UNION ALL
      SELECT user_id, sec, 1, event_id, 0, 0,
             cast(NULL as decimal(27,6)), value, 0
      FROM ev WHERE event_type = 'view'
      UNION ALL
      SELECT user_id, sec, 2, event_id, 1, 0,
             cast(NULL as decimal(27,6)), cast(NULL as double), 0
      FROM ev WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, sec, 3, event_id, 0, 0,
             cast(NULL as decimal(27,6)), cast(NULL as double), 1
      FROM ev WHERE event_type = 'purchase'
    ),
    w AS (
      SELECT *,
             sum(click_i) OVER win AS n_clicks,
             sum(order_i) OVER win AS n_orders,
             sum(amt) OVER win AS spend,
             last_value(vval IGNORE NULLS) OVER win AS last_view,
             last_value(CASE WHEN krank = 0 THEN sec END IGNORE NULLS)
               OVER win AS last_order_sec
      FROM u
      WINDOW win AS (PARTITION BY user_id ORDER BY sec, krank, uid
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id,
           uid AS label_id,
           sec AS label_sec,
           cast(n_clicks as bigint) AS n_prior_clicks,
           cast(n_orders as bigint) AS n_prior_orders,
           cast(cast(coalesce(spend, cast(0 as decimal(27,6))) as varchar) as double)
             AS prior_spend,
           last_view AS last_view_value,
           cast(sec - last_order_sec as bigint) AS secs_since_last_order
    FROM w WHERE is_label = 1
    """,
)
def point_in_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_sec(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        (
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
            ).cast("bigint")
            * 86400
        ).alias("sec"),
        F.col("o_orderkey").alias("uid"),
        F.col("o_totalprice").cast("decimal(27,6)").alias("amt"),
    )

    def tagged(df, krank, click_i, order_i, amt_col, vval_col, is_label):
        return df.select(
            "user_id",
            "sec",
            F.lit(krank).alias("krank"),
            "uid",
            F.lit(click_i).alias("click_i"),
            F.lit(order_i).alias("order_i"),
            amt_col.alias("amt"),
            vval_col.alias("vval"),
            F.lit(is_label).alias("is_label"),
        )

    null_amt = F.lit(None).cast("decimal(27,6)")
    null_v = F.lit(None).cast("double")
    evu = ev.select("user_id", "sec", F.col("event_id").alias("uid"), "event_type", "value")
    u = (
        tagged(orders, 0, 0, 1, F.col("amt"), null_v, 0)
        .unionByName(
            tagged(evu.where(F.col("event_type") == "view"), 1, 0, 0, null_amt, F.col("value"), 0)
        )
        .unionByName(
            tagged(evu.where(F.col("event_type") == "click"), 2, 1, 0, null_amt, null_v, 0)
        )
        .unionByName(
            tagged(evu.where(F.col("event_type") == "purchase"), 3, 0, 0, null_amt, null_v, 1)
        )
    )
    from pyspark.sql import Window

    win = (
        Window.partitionBy("user_id")
        .orderBy("sec", "krank", "uid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w = u.select(
        "user_id",
        "sec",
        "uid",
        "is_label",
        F.sum("click_i").over(win).alias("n_clicks"),
        F.sum("order_i").over(win).alias("n_orders"),
        F.sum("amt").over(win).alias("spend"),
        F.last("vval", ignorenulls=True).over(win).alias("last_view"),
        F.last(F.when(F.col("krank") == 0, F.col("sec")), ignorenulls=True)
        .over(win)
        .alias("last_order_sec"),
    )
    return w.where(F.col("is_label") == 1).select(
        "user_id",
        F.col("uid").alias("label_id"),
        F.col("sec").alias("label_sec"),
        F.col("n_clicks").cast("bigint").alias("n_prior_clicks"),
        F.col("n_orders").cast("bigint").alias("n_prior_orders"),
        F.coalesce(F.col("spend"), F.lit(0).cast("decimal(27,6)"))
        .cast("double")
        .alias("prior_spend"),
        F.col("last_view").alias("last_view_value"),
        (F.col("sec") - F.col("last_order_sec")).cast("bigint").alias("secs_since_last_order"),
    )
