"""Business/revenue report families (reference `homed/repots`):

- UserBusiness.scala — package revenue with order-lifecycle classification
- BusinessProgram.scala — per-program billing revenue, multi-catalog names
- RecommendSearchReport.scala — recommendation-result enrichment dispatch
- OpenAppReport.scala — app-version open report with default-version fill
- HomeOpen.scala — account-opening detail export

Each is the reference job's semantic core over the synthetic star schema;
the reference's driver-side collect loops and per-row HashMap lookups are
re-expressed as broadcast joins / union-of-joins (the Spark-first shapes
that survive 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core_relational import dsum
from .registry import query
from .report_families import _geo_dim

# Integral epoch-day of a TIMESTAMP_NTZ column — same floor on both
# engines (UTC session; registry rule 2).
_ODAY_SPARK = "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', o_orderdate) div 86400"
_ODAY_SQL = "epoch_us(o_orderdate)//1000000//86400"

# Reporting window: one month of 1998-06 (epoch days).  The reference
# jobs take the window as CLI args; a fixed literal keeps the oracle
# static.
_W0, _W1 = 10378, 10408
# Account-opening window: the first quarter of the order history (openings
# = first orders, which cluster at the fact's start: 1995-01..1995-03).
_OPEN_W0, _OPEN_W1 = 9131, 9221

_GEO_SQL = """
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
)"""

_GEO_COLS = [
    "f_province_id", "f_province_name", "f_city_id", "f_city_name",
    "f_region_id", "f_region_name",
]


# --------------------------------------------------------------------------
# UserBusiness.scala:119-214 — package revenue (套餐营收).  The core is the
# order-lifecycle CASE over a window [W0, W1): reorders are type 4
# (renewal), expiries-not-reordered type 3, fresh buys type 1; price is
# counted ONLY on the buy day (`if(buy_time in window, price, 0)`), and
# the subscription cycle is datediff(exp, effect)+1 with the 0→1 fixup
# (UserBusiness.scala:127-131).  The fact then picks up the package id /
# cp_sp from the order record (t_business_record projection, :141-154),
# the geo dim, and the package-type dim, and aggregates to package x geo
# x lifecycle grain with count / distinct users / revenue.
# Scale: one fact scan with the window predicate pushed down, all three
# dims broadcast, one shuffle on the report grain (map-side combinable).
@query(
    "package_revenue_report",
    oracle=f"""
    WITH {_GEO_SQL},
    pkg AS (
      SELECT p AS f_package_id,
             'pk_' || cast(p as varchar)  AS f_package_name,
             1 + p % 3                    AS f_package_type
      FROM (SELECT unnest(generate_series(0, 19)) AS p)
    ),
    pay AS (
      SELECT o_orderkey, o_custkey AS user_id, o_totalprice AS price,
             {_ODAY_SQL} AS buy_day,
             {_ODAY_SQL} + 1 + o_orderkey % 400 AS exp_day,
             (o_orderkey % 5 = 0) AS reorder,
             o_orderkey % 20 AS f_package_id,
             'csp_' || cast(o_orderkey % 5 as varchar) AS f_cp_sp
      FROM orders
    ),
    basic AS (
      SELECT user_id, f_package_id, f_cp_sp,
             CASE WHEN reorder THEN 4
                  WHEN exp_day >= {_W0} AND exp_day < {_W1} THEN 3
                  WHEN buy_day >= {_W0} AND buy_day < {_W1} THEN 1
                  ELSE 4 END AS f_user_type,
             CASE WHEN buy_day >= {_W0} AND buy_day < {_W1} THEN price
                  ELSE 0.0 END AS price,
             CASE WHEN exp_day - buy_day = 0 THEN 1
                  ELSE exp_day - buy_day + 1 END AS f_cycle
      FROM pay
      WHERE (buy_day >= {_W0} AND buy_day < {_W1})
         OR (exp_day >= {_W0} AND exp_day < {_W1})
    )
    SELECT g.f_province_id, g.f_province_name, g.f_city_id, g.f_city_name,
           g.f_region_id, g.f_region_name,
           b.f_package_id, p.f_package_name, b.f_cp_sp, p.f_package_type,
           cast(b.f_user_type as bigint) AS f_user_type,
           cast(count(*) as bigint) AS f_count,
           cast(count(DISTINCT b.user_id) as bigint) AS f_user_count,
           cast(cast(sum(cast(b.price as decimal(27,6))) as varchar) as double) AS f_price,
           cast(sum(b.f_cycle) as bigint) AS f_cycle_days
    FROM basic b
    JOIN geo g ON g.user_id = b.user_id
    JOIN pkg p ON p.f_package_id = b.f_package_id
    GROUP BY g.f_province_id, g.f_province_name, g.f_city_id, g.f_city_name,
             g.f_region_id, g.f_region_name,
             b.f_package_id, p.f_package_name, b.f_cp_sp, p.f_package_type,
             b.f_user_type
    """,
)
def package_revenue_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    geo = _geo_dim(spark, sf_dir)
    pkg = spark.range(20).select(
        F.col("id").cast("bigint").alias("f_package_id"),
        F.concat(F.lit("pk_"), F.col("id").cast("string")).alias("f_package_name"),
        (F.lit(1) + F.col("id") % 3).alias("f_package_type"),
    )
    o = load_table(spark, sf_dir, "orders")
    buy_day = F.expr(_ODAY_SPARK)
    pay = o.select(
        "o_orderkey",
        F.col("o_custkey").alias("user_id"),
        F.col("o_totalprice").alias("price"),
        buy_day.alias("buy_day"),
        (buy_day + 1 + F.col("o_orderkey") % 400).alias("exp_day"),
        (F.col("o_orderkey") % 5 == 0).alias("reorder"),
        (F.col("o_orderkey") % 20).alias("f_package_id"),
        F.concat(F.lit("csp_"), (F.col("o_orderkey") % 5).cast("string")).alias("f_cp_sp"),
    )
    in_buy = F.col("buy_day").between(_W0, _W1 - 1)
    in_exp = F.col("exp_day").between(_W0, _W1 - 1)
    basic = pay.where(in_buy | in_exp).select(
        "user_id", "f_package_id", "f_cp_sp",
        F.when(F.col("reorder"), 4)
        .when(in_exp, 3)
        .when(in_buy, 1)
        .otherwise(4)
        .cast("bigint")
        .alias("f_user_type"),
        F.when(in_buy, F.col("price")).otherwise(F.lit(0.0)).alias("price"),
        F.when(F.col("exp_day") - F.col("buy_day") == 0, 1)
        .otherwise(F.col("exp_day") - F.col("buy_day") + 1)
        .alias("f_cycle"),
    )
    enriched = basic.join(F.broadcast(geo.drop("f_terminal")), "user_id").join(
        F.broadcast(pkg), "f_package_id"
    )
    return enriched.groupBy(
        *_GEO_COLS, "f_package_id", "f_package_name", "f_cp_sp",
        "f_package_type", "f_user_type",
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("f_count"),
        F.countDistinct("user_id").cast("bigint").alias("f_user_count"),
        dsum(F.col("price"), "f_price"),
        F.sum("f_cycle").cast("bigint").alias("f_cycle_days"),
    )


# --------------------------------------------------------------------------
# BusinessProgram.scala:150-260 — per-program billing revenue.  The
# reference greps raw billing lines for "BillingSuccess" and extracts
# keywords with per-key regexes (getKeywords, :406-419); program names
# resolve through SIX driver-side HashMaps tried in precedence order
# (getName, :264-293) and unresolved regions fall back to the root region
# code.  Here: the keyword extraction is the same regex shape applied to
# the raw props string (NOT a JSON path — parse parity), and the name
# precedence chain is a coalesce over two broadcast catalog dims with an
# 'unknown' tail; region fallback is a left broadcast join + coalesce.
# Scale: fact scans once, every dim broadcasts, one report-grain shuffle.
@query(
    "billing_program_revenue",
    oracle=f"""
    WITH {_GEO_SQL},
    bill AS (
      SELECT user_id, event_id,
             cast(regexp_extract(props, '"k":\\s*(\\d+)', 1) as bigint) AS k,
             cast(floor(value * 100) as bigint) AS money
      FROM events
      WHERE event_type = 'purchase' AND value > 0
            AND regexp_extract(props, '"k":\\s*(\\d+)', 1) <> ''
    ),
    fact AS (
      SELECT user_id, event_id, money,
             k % 250 AS f_program_id,
             k % 20  AS f_package_id,
             event_id % 4 AS f_paymode
      FROM bill
    ),
    vod AS (
      SELECT cast(p_partkey as bigint) AS f_program_id,
             'vd_' || cast(p_partkey as varchar) AS nm
      FROM part WHERE p_partkey < 250 AND p_partkey % 2 = 0
    ),
    chan AS (
      SELECT cast(s_suppkey as bigint) AS f_program_id,
             'ch_' || cast(s_suppkey as varchar) AS nm
      FROM supplier
    )
    SELECT coalesce(g.f_region_id, 9999) AS f_region_id,
           f.f_package_id, f.f_paymode, f.f_program_id,
           coalesce(v.nm, c.nm, 'unknown') AS f_program_name,
           cast(sum(f.money) as bigint) AS f_money,
           cast(count(*) as bigint) AS f_count
    FROM fact f
    LEFT JOIN geo g ON g.user_id = f.user_id
    LEFT JOIN vod v ON v.f_program_id = f.f_program_id
    LEFT JOIN chan c ON c.f_program_id = f.f_program_id
    GROUP BY 1, 2, 3, 4, 5
    """,
)
def billing_program_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    k_raw = F.regexp_extract("props", r'"k":\s*(\d+)', 1)
    bill = (
        ev.where((F.col("event_type") == "purchase") & (F.col("value") > 0))
        .where(k_raw != "")
        .select(
            "user_id",
            "event_id",
            k_raw.cast("bigint").alias("k"),
            F.floor(F.col("value") * 100).cast("bigint").alias("money"),
        )
    )
    fact = bill.select(
        "user_id", "event_id", "money",
        (F.col("k") % 250).alias("f_program_id"),
        (F.col("k") % 20).alias("f_package_id"),
        (F.col("event_id") % 4).alias("f_paymode"),
    )
    part = load_table(spark, sf_dir, "part")
    vod = part.where((F.col("p_partkey") < 250) & (F.col("p_partkey") % 2 == 0)).select(
        F.col("p_partkey").cast("bigint").alias("f_program_id"),
        F.concat(F.lit("vd_"), F.col("p_partkey").cast("string")).alias("vod_nm"),
    )
    chan = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("bigint").alias("f_program_id"),
        F.concat(F.lit("ch_"), F.col("s_suppkey").cast("string")).alias("ch_nm"),
    )
    geo = _geo_dim(spark, sf_dir).select("user_id", "f_region_id")
    enriched = (
        fact.join(F.broadcast(geo), "user_id", "left")
        .join(F.broadcast(vod), "f_program_id", "left")
        .join(F.broadcast(chan), "f_program_id", "left")
        .select(
            F.coalesce(F.col("f_region_id"), F.lit(9999)).alias("f_region_id"),
            "f_package_id", "f_paymode", "f_program_id",
            F.coalesce(F.col("vod_nm"), F.col("ch_nm"), F.lit("unknown")).alias(
                "f_program_name"
            ),
            "money",
        )
    )
    return enriched.groupBy(
        "f_region_id", "f_package_id", "f_paymode", "f_program_id", "f_program_name"
    ).agg(
        F.sum("money").cast("bigint").alias("f_money"),
        F.count(F.lit(1)).cast("bigint").alias("f_count"),
    )


# --------------------------------------------------------------------------
# RecommendSearchReport.scala:244-283 — recommendation-result enrichment.
# The reference COLLECTS the distinct result ids to the driver and
# dispatches each through a 12-way content-type switch, joining a
# different catalog table per type (getDemand/getLookBaack/getChannel…),
# then unions.  Re-expressed without the collect: the fact splits by
# content type ONCE, each branch inner-joins its own broadcast catalog
# dim, and the branches union back — same rows, no driver round-trip,
# and each branch's join is independently broadcastable at 100 TB.
@query(
    "recommend_result_enrich",
    oracle="""
    WITH fact AS (
      SELECT user_id,
             cast(json_extract_string(props, '$.k') as bigint) % 120 AS result_id,
             1 + event_id % 4 AS content_type
      FROM events
      WHERE event_type = 'view' AND json_extract_string(props, '$.k') IS NOT NULL
    ),
    vod AS (
      SELECT cast(p_partkey as bigint) AS result_id,
             'vd_' || cast(p_partkey as varchar) AS program_name,
             'sr_' || cast(p_partkey // 10 as varchar) AS series_name
      FROM part WHERE p_partkey < 120
    ),
    series AS (
      SELECT DISTINCT cast(p_partkey // 10 as bigint) AS result_id,
             '' AS program_name,
             'sr_' || cast(p_partkey // 10 as varchar) AS series_name
      FROM part WHERE p_partkey // 10 < 120
    ),
    chan AS (
      SELECT cast(s_suppkey as bigint) AS result_id,
             'ch_' || cast(s_suppkey as varchar) AS program_name,
             '' AS series_name
      FROM supplier WHERE s_suppkey < 120
    ),
    app AS (
      SELECT cast(n_nationkey as bigint) AS result_id,
             'app_' || n_name AS program_name,
             '' AS series_name
      FROM nation
    ),
    enriched AS (
      SELECT f.user_id, f.content_type, d.program_name, d.series_name
      FROM fact f JOIN vod d USING (result_id) WHERE f.content_type = 1
      UNION ALL
      SELECT f.user_id, f.content_type, d.program_name, d.series_name
      FROM fact f JOIN series d USING (result_id) WHERE f.content_type = 2
      UNION ALL
      SELECT f.user_id, f.content_type, d.program_name, d.series_name
      FROM fact f JOIN chan d USING (result_id) WHERE f.content_type = 3
      UNION ALL
      SELECT f.user_id, f.content_type, d.program_name, d.series_name
      FROM fact f JOIN app d USING (result_id) WHERE f.content_type = 4
    )
    SELECT content_type, program_name, series_name,
           cast(count(*) as bigint) AS f_count,
           cast(count(DISTINCT user_id) as bigint) AS f_uv
    FROM enriched
    GROUP BY content_type, program_name, series_name
    """,
)
def recommend_result_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    fact = (
        ev.where((F.col("event_type") == "view") & k.isNotNull())
        .select(
            "user_id",
            (k % 120).alias("result_id"),
            (F.lit(1) + F.col("event_id") % 4).alias("content_type"),
        )
    )
    part = load_table(spark, sf_dir, "part")
    vod = part.where(F.col("p_partkey") < 120).select(
        F.col("p_partkey").cast("bigint").alias("result_id"),
        F.concat(F.lit("vd_"), F.col("p_partkey").cast("string")).alias("program_name"),
        F.concat(F.lit("sr_"), F.expr("cast(p_partkey div 10 as string)")).alias(
            "series_name"
        ),
    )
    series = (
        part.where(F.expr("p_partkey div 10") < 120)
        .select(
            F.expr("cast(p_partkey div 10 as bigint)").alias("result_id"),
            F.lit("").alias("program_name"),
            F.concat(F.lit("sr_"), F.expr("cast(p_partkey div 10 as string)")).alias(
                "series_name"
            ),
        )
        .distinct()
    )
    chan = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_suppkey") < 120)
        .select(
            F.col("s_suppkey").cast("bigint").alias("result_id"),
            F.concat(F.lit("ch_"), F.col("s_suppkey").cast("string")).alias(
                "program_name"
            ),
            F.lit("").alias("series_name"),
        )
    )
    app = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("bigint").alias("result_id"),
        F.concat(F.lit("app_"), F.col("n_name")).alias("program_name"),
        F.lit("").alias("series_name"),
    )
    branches = [
        fact.where(F.col("content_type") == i).join(F.broadcast(dim), "result_id")
        for i, dim in ((1, vod), (2, series), (3, chan), (4, app))
    ]
    enriched = branches[0]
    for b in branches[1:]:
        enriched = enriched.unionByName(b)
    return enriched.groupBy("content_type", "program_name", "series_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("f_count"),
        F.countDistinct("user_id").cast("bigint").alias("f_uv"),
    )


# --------------------------------------------------------------------------
# OpenAppReport.scala:46-120 — app-open report by model x app version.
# The reference registers a `defaultVersion` UDF over a driver-broadcast
# HashMap to fill missing versions per model; here the default-version
# table is a broadcast dim and the fill is a left join + coalesce — the
# same lookup, JVM-side, no Python/driver boundary.  Day grain plus the
# reference's multi-day "history" grain (f_type=3) re-aggregated from the
# SAME pre-filtered fact.
@query(
    "app_version_report",
    oracle="""
    WITH opens AS (
      SELECT user_id,
             (epoch_us(ts)//1000000)//86400 AS day,
             'm_' || cast(user_id % 12 as varchar) AS model,
             CASE WHEN cast(json_extract_string(props, '$.k') as bigint) % 7 = 0
                  THEN NULL
                  ELSE 'v' || cast(cast(json_extract_string(props, '$.k') as bigint) % 30 as varchar)
             END AS raw_version
      FROM events WHERE event_type = 'signup'
    ),
    defaults AS (
      SELECT 'm_' || cast(m as varchar) AS model,
             'v' || cast(m as varchar) || '.0' AS default_version
      FROM (SELECT unnest(generate_series(0, 11)) AS m)
    ),
    filled AS (
      SELECT o.user_id, o.day, o.model,
             coalesce(o.raw_version, d.default_version) AS version
      FROM opens o LEFT JOIN defaults d ON d.model = o.model
    ),
    by_day AS (
      SELECT 1 AS f_type, day AS f_start_day, day AS f_end_day, model, version,
             cast(count(*) as bigint) AS f_opens,
             cast(count(DISTINCT user_id) as bigint) AS f_uv
      FROM filled GROUP BY day, model, version
    ),
    history AS (
      SELECT 3 AS f_type,
             cast(min(day) as bigint) AS f_start_day,
             cast(max(day) as bigint) AS f_end_day, model, version,
             cast(count(*) as bigint) AS f_opens,
             cast(count(DISTINCT user_id) as bigint) AS f_uv
      FROM filled GROUP BY model, version
    )
    SELECT * FROM by_day UNION ALL SELECT * FROM history
    """,
)
def app_version_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").where(F.col("event_type") == "signup")
    k = F.get_json_object("props", "$.k").cast("bigint")
    opens = ev.select(
        "user_id",
        F.expr("ts_sec div 86400").alias("day"),
        F.concat(F.lit("m_"), (F.col("user_id") % 12).cast("string")).alias("model"),
        F.when(k % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("v"), (k % 30).cast("string")))
        .alias("raw_version"),
    )
    defaults = spark.range(12).select(
        F.concat(F.lit("m_"), F.col("id").cast("string")).alias("model"),
        F.concat(F.lit("v"), F.col("id").cast("string"), F.lit(".0")).alias(
            "default_version"
        ),
    )
    filled = opens.join(F.broadcast(defaults), "model", "left").select(
        "user_id", "day", "model",
        F.coalesce(F.col("raw_version"), F.col("default_version")).alias("version"),
    )
    by_day = (
        filled.groupBy("day", "model", "version")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("f_opens"),
            F.countDistinct("user_id").cast("bigint").alias("f_uv"),
        )
        .select(
            F.lit(1).alias("f_type"),
            F.col("day").alias("f_start_day"),
            F.col("day").alias("f_end_day"),
            "model", "version", "f_opens", "f_uv",
        )
    )
    history = (
        filled.groupBy("model", "version")
        .agg(
            F.min("day").cast("bigint").alias("f_start_day"),
            F.max("day").cast("bigint").alias("f_end_day"),
            F.count(F.lit(1)).cast("bigint").alias("f_opens"),
            F.countDistinct("user_id").cast("bigint").alias("f_uv"),
        )
        .select(
            F.lit(3).alias("f_type"), "f_start_day", "f_end_day",
            "model", "version", "f_opens", "f_uv",
        )
    )
    return by_day.unionByName(history)


# --------------------------------------------------------------------------
# HomeOpen.scala:29-54 — account-opening DETAIL export: homes whose
# account was created inside the window, joined to the user/address dims,
# written row-level (no aggregation) after an idempotent delete of the
# day's rows (the delete+insert is the upsert contract covered by
# sources/sinks.py S10/S13; this query pins the detail-join shape).  The
# opening event is the customer's FIRST order (min epoch-day, A8 keep-
# first); home attributes derive deterministically from the customer key.
# Window: openings cluster at the fact's start (first orders), so this
# report uses the opening quarter [_OPEN_W0, _OPEN_W1) rather than the
# revenue month.
@query(
    "home_open_accounts",
    oracle=f"""
    WITH {_GEO_SQL},
    openings AS (
      SELECT o_custkey AS user_id,
             min({_ODAY_SQL}) AS open_day,
             cast(count(*) as bigint) AS n_orders
      FROM orders GROUP BY o_custkey
    )
    SELECT 'ac_' || cast(op.user_id as varchar) AS f_account_name,
           op.open_day AS f_open_account_time,
           op.user_id % 3 AS f_status,
           op.user_id // 4 AS f_home_id,
           'hm_' || cast(op.user_id // 4 as varchar) AS f_home_name,
           cast(op.user_id % 100 as varchar) || ',' ||
             cast((op.user_id + 7) % 100 as varchar) AS f_group_ids,
           1 + op.user_id % 6 AS f_member_count,
           op.n_orders,
           g.f_region_id, g.f_region_name, g.f_city_id, g.f_city_name,
           g.f_province_id, g.f_province_name
    FROM openings op
    JOIN geo g ON g.user_id = op.user_id
    WHERE op.open_day >= {_OPEN_W0} AND op.open_day < {_OPEN_W1}
    """,
)
def home_open_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    openings = (
        o.select(F.col("o_custkey").alias("user_id"), F.expr(_ODAY_SPARK).alias("d"))
        .groupBy("user_id")
        .agg(
            F.min("d").alias("f_open_account_time"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        )
        .where(F.col("f_open_account_time").between(_OPEN_W0, _OPEN_W1 - 1))
    )
    geo = _geo_dim(spark, sf_dir).drop("f_terminal")
    uid = F.col("user_id")
    return openings.join(F.broadcast(geo), "user_id").select(
        F.concat(F.lit("ac_"), uid.cast("string")).alias("f_account_name"),
        "f_open_account_time",
        (uid % 3).alias("f_status"),
        F.expr("cast(user_id div 4 as bigint)").alias("f_home_id"),
        F.concat(F.lit("hm_"), F.expr("cast(user_id div 4 as string)")).alias(
            "f_home_name"
        ),
        F.concat(
            (uid % 100).cast("string"), F.lit(","), ((uid + 7) % 100).cast("string")
        ).alias("f_group_ids"),
        (F.lit(1) + uid % 6).alias("f_member_count"),
        "n_orders",
        "f_region_id", "f_region_name", "f_city_id", "f_city_name",
        "f_province_id", "f_province_name",
    )


# --------------------------------------------------------------------------
# rank/reports/LabelToMqsql.scala:48-160 — the user-profile LABEL table:
# one wide row per user assembling independent behavioral facets (total
# watch duration, distinct active days, favorite series, favorite
# behavior type, media ratio).  The reference computed each facet into a
# driver-side mutable HashMap and issued per-user UPDATE statements; here
# each facet is a per-user aggregate (argmax facets via a row_number=1
# window PARTITIONED BY USER — thousands of tiny windows, never a global
# one) and the wide row is a left-join assembly on the user grain.
# Scale: every shuffle is keyed by user_id; the facet joins co-partition
# on the same key so AQE folds them into one exchange per side.
@query(
    "user_profile_labels",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type, value,
             (epoch_us(ts)//1000000)//86400 AS day,
             coalesce(cast(json_extract_string(props, '$.k') as bigint), 0) % 40 AS series
      FROM events
    ),
    base AS (
      SELECT user_id,
             cast(count(DISTINCT day) as bigint) AS f_active_days,
             cast(count(*) as bigint) AS n_total,
             cast(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) as bigint) AS n_view,
             cast(cast(sum(cast(CASE WHEN event_type = 'view' THEN value ELSE 0.0 END
                           as decimal(27,6))) as varchar) as double) AS f_duration
      FROM ev GROUP BY user_id
    ),
    fav_series AS (
      SELECT user_id, series AS f_fav_series FROM (
        SELECT user_id, series,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY count(*) DESC, series) AS rn
        FROM ev WHERE event_type = 'view' GROUP BY user_id, series
      ) WHERE rn = 1
    ),
    fav_type AS (
      SELECT user_id, event_type AS f_fav_type FROM (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY count(*) DESC, event_type) AS rn
        FROM ev GROUP BY user_id, event_type
      ) WHERE rn = 1
    )
    SELECT b.user_id, b.f_active_days, b.f_duration,
           round(b.n_view * 1.0 / b.n_total, 6) AS f_media_ratio,
           fs.f_fav_series, ft.f_fav_type
    FROM base b
    LEFT JOIN fav_series fs ON fs.user_id = b.user_id
    LEFT JOIN fav_type ft ON ft.user_id = b.user_id
    """,
)
def user_profile_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "value",
        F.expr("ts_sec div 86400").alias("day"),
        (
            F.coalesce(F.get_json_object("props", "$.k").cast("bigint"), F.lit(0)) % 40
        ).alias("series"),
    )
    is_view = F.col("event_type") == "view"
    base = ev.groupBy("user_id").agg(
        F.countDistinct("day").cast("bigint").alias("f_active_days"),
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum(F.when(is_view, 1).otherwise(0)).cast("bigint").alias("n_view"),
        F.sum(
            F.when(is_view, F.col("value")).otherwise(F.lit(0.0)).cast("decimal(27,6)")
        )
        .cast("double")
        .alias("f_duration"),
    )
    ws = Window.partitionBy("user_id").orderBy(F.col("cnt").desc(), F.col("series"))
    fav_series = (
        ev.where(is_view)
        .groupBy("user_id", "series")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(ws))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("series").alias("f_fav_series"))
    )
    wt = Window.partitionBy("user_id").orderBy(F.col("cnt").desc(), F.col("event_type"))
    fav_type = (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(wt))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("f_fav_type"))
    )
    return (
        base.join(fav_series, "user_id", "left")
        .join(fav_type, "user_id", "left")
        .select(
            "user_id", "f_active_days", "f_duration",
            F.round(F.col("n_view") * F.lit(1.0) / F.col("n_total"), 6).alias(
                "f_media_ratio"
            ),
            "f_fav_series", "f_fav_type",
        )
    )


# --------------------------------------------------------------------------
# PersonalOpenAccount.scala:12-138 — personal open-account DETAIL report:
# accounts created inside the window (:26-28), LEFT-joined to the boss/
# billing dim with an area-id fallback (`if(length(f_user_area_id)=6,
# area, defaultRegion)`, :37-44), enriched with the home's device-series
# GROUP_CONCAT packing (:52-63 — one home → many devices, each device a
# CONCAT_WS series list that SKIPS absent ids), the per-account token
# aggregate (first login time + JSON `$.appversion`, :66-86), the
# register-type / user-type CASE mapping (:107-118) and an inner region-
# dim join (:121).  The reference's nondeterministic `first()/last()`
# token picks are respelled deterministically: the version comes from the
# LATEST signup event (ts_sec DESC, event_id DESC tiebreaker).  Scale
# shape: boss/devices/areas are customer/nation-derived dims (broadcast);
# the token aggregate is user-keyed like the openings base, so that join
# co-partitions; nothing shuffles the wide device strings except the
# ≤|homes| packed rows.
_PERSONAL_OPEN_ORACLE = f"""
WITH {_GEO_SQL},
base AS (
  SELECT o_custkey AS user_id, min({_ODAY_SQL}) AS f_open_account_time
  FROM orders GROUP BY o_custkey
  HAVING min({_ODAY_SQL}) >= {_OPEN_W0} AND min({_ODAY_SQL}) < {_OPEN_W1}
),
boss AS (
  SELECT g.user_id, g.f_region_id AS f_user_area_id,
         'cc_' || cast(g.user_id as varchar) AS f_customer_code
  FROM geo g WHERE g.user_id % 7 != 3
),
devices AS (
  SELECT c_custkey // 4 AS f_home_id,
         'dv_' || cast(c_custkey as varchar) || '(' ||
           concat_ws(',',
             CASE WHEN c_custkey % 2 = 0 THEN 'cai_' || cast(c_custkey as varchar) END,
             CASE WHEN c_custkey % 3 = 0 THEN 'mb_' || cast(c_custkey as varchar) END,
             CASE WHEN c_custkey % 5 = 0 THEN 'pd_' || cast(c_custkey as varchar) END,
             'stb_' || cast(c_custkey as varchar)) || ')' AS entry
  FROM customer
),
home_devices AS (
  SELECT f_home_id, string_agg(entry, ',' ORDER BY entry) AS f_device_series_ids
  FROM devices GROUP BY f_home_id
),
tok_ranked AS (
  SELECT user_id, epoch_us(ts)//1000000 AS sec,
         coalesce(cast(json_extract_string(props, '$.k') as bigint), 0) % 30 AS vnum,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts)//1000000 DESC, event_id DESC) AS rn
  FROM events WHERE event_type = 'signup'
),
token AS (
  SELECT user_id, min(sec) AS f_first_login_time,
         max(CASE WHEN rn = 1 THEN 'v' || cast(vnum as varchar) END) AS f_app_version
  FROM tok_ranked GROUP BY user_id
),
areas AS (
  SELECT cast(n.n_nationkey as bigint)*10 + j.j AS f_area_id,
         'rg_' || cast(cast(n.n_nationkey as bigint)*10 + j.j as varchar)
           AS f_region_name,
         cast(n.n_nationkey as bigint) AS f_city_id, n.n_name AS f_city_name,
         cast(n.n_regionkey as bigint) AS f_province_id, r.r_name AS f_province_name
  FROM nation n JOIN region r ON r.r_regionkey = n.n_regionkey
  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) j
)
SELECT b.user_id AS f_da,
       'ac_' || cast(b.user_id as varchar) AS f_account_name,
       b.user_id % 2 AS f_sex,
       'nk_' || cast(b.user_id as varchar) AS f_nickname,
       b.f_open_account_time,
       cast(b.user_id % 100 as varchar) || ',' ||
         cast((b.user_id + 7) % 100 as varchar) AS f_group_ids,
       b.user_id % 12 AS f_user_source,
       cast(CASE WHEN b.user_id % 12 IN (1,2,3,10,11) THEN 1
                 WHEN b.user_id % 12 IN (4,5,6,7,8) THEN 2 ELSE 3 END as bigint)
         AS f_register_type,
       cast(CASE WHEN b.user_id % 12 = 9 THEN 2 ELSE 1 END as bigint) AS f_user_type,
       coalesce(bo.f_user_area_id, 10) AS f_region_id,
       bo.f_customer_code,
       hd.f_device_series_ids,
       t.f_first_login_time,
       t.f_app_version,
       a.f_region_name, a.f_city_id, a.f_city_name,
       a.f_province_id, a.f_province_name
FROM base b
LEFT JOIN boss bo ON bo.user_id = b.user_id
LEFT JOIN home_devices hd ON hd.f_home_id = b.user_id // 4
LEFT JOIN token t ON t.user_id = b.user_id
JOIN areas a ON a.f_area_id = coalesce(bo.f_user_area_id, 10)
"""


@query("personal_open_accounts", oracle=_PERSONAL_OPEN_ORACLE)
def personal_open_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..sources.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    base = (
        o.select(F.col("o_custkey").alias("user_id"), F.expr(_ODAY_SPARK).alias("d"))
        .groupBy("user_id")
        .agg(F.min("d").alias("f_open_account_time"))
        .where(F.col("f_open_account_time").between(_OPEN_W0, _OPEN_W1 - 1))
    )
    uid = F.col("user_id")

    # boss/billing dim: rows exist for ~6/7 accounts; the LEFT join below
    # plus coalesce() is the reference's invalid-area fallback (:37-44)
    boss = _geo_dim(spark, sf_dir).where(uid % 7 != 3).select(
        "user_id",
        F.col("f_region_id").alias("f_user_area_id"),
        F.concat(F.lit("cc_"), uid.cast("string")).alias("f_customer_code"),
    )

    # one home → many devices → per-device CONCAT_WS series list that
    # skips absent ids (:52-63); packed per home, sorted for determinism
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("duid")
    )
    du = F.col("duid")
    entry = F.concat(
        F.lit("dv_"), du.cast("string"), F.lit("("),
        F.concat_ws(
            ",",
            F.when(du % 2 == 0, F.concat(F.lit("cai_"), du.cast("string"))),
            F.when(du % 3 == 0, F.concat(F.lit("mb_"), du.cast("string"))),
            F.when(du % 5 == 0, F.concat(F.lit("pd_"), du.cast("string"))),
            F.concat(F.lit("stb_"), du.cast("string")),
        ),
        F.lit(")"),
    )
    home_devices = (
        cust.select(
            F.expr("cast(duid div 4 as bigint)").alias("f_home_id"),
            entry.alias("entry"),
        )
        .groupBy("f_home_id")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("entry"))).alias(
                "f_device_series_ids"
            )
        )
    )

    # token aggregate (:66-86): first login second + the LATEST event's
    # app version (deterministic argmax respelling of first()/last())
    ev = load_table(spark, sf_dir, "events").where(F.col("event_type") == "signup")
    vnum = (
        F.coalesce(F.get_json_object("props", "$.k").cast("bigint"), F.lit(0)) % 30
    )
    wt = Window.partitionBy("user_id").orderBy(
        F.col("sec").desc(), F.col("event_id").desc()
    )
    token = (
        ev.select("user_id", F.col("ts_sec").alias("sec"), "event_id", vnum.alias("vnum"))
        .withColumn("rn", F.row_number().over(wt))
        .groupBy("user_id")
        .agg(
            F.min("sec").alias("f_first_login_time"),
            F.max(
                F.when(
                    F.col("rn") == 1,
                    F.concat(F.lit("v"), F.col("vnum").cast("string")),
                )
            ).alias("f_app_version"),
        )
    )

    # area dim keyed by AREA ID (not user) — the reference's final
    # regionDF join (:121); built nation×4 so the default area always
    # resolves.  explode() instead of a cross join: no BNL in the plan.
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    area_id = F.col("n_nationkey").cast("bigint") * 10 + F.col("j")
    areas = (
        nat.join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "n_nationkey", "n_name", "n_regionkey", "r_name",
            F.explode(F.array(*[F.lit(i).cast("long") for i in range(4)])).alias("j"),
        )
        .select(
            area_id.alias("f_area_id"),
            F.concat(F.lit("rg_"), area_id.cast("string")).alias("f_region_name"),
            F.col("n_nationkey").cast("bigint").alias("f_city_id"),
            F.col("n_name").alias("f_city_name"),
            F.col("n_regionkey").cast("bigint").alias("f_province_id"),
            F.col("r_name").alias("f_province_name"),
        )
    )

    src = uid % 12
    return (
        base.join(F.broadcast(boss), "user_id", "left")
        .withColumn("f_region_id", F.coalesce(F.col("f_user_area_id"), F.lit(10)))
        .withColumn("f_home_id", F.expr("cast(user_id div 4 as bigint)"))
        .join(F.broadcast(home_devices), "f_home_id", "left")
        .join(token, "user_id", "left")
        .join(F.broadcast(areas), F.col("f_region_id") == F.col("f_area_id"))
        .select(
            uid.alias("f_da"),
            F.concat(F.lit("ac_"), uid.cast("string")).alias("f_account_name"),
            (uid % 2).alias("f_sex"),
            F.concat(F.lit("nk_"), uid.cast("string")).alias("f_nickname"),
            "f_open_account_time",
            F.concat(
                (uid % 100).cast("string"), F.lit(","), ((uid + 7) % 100).cast("string")
            ).alias("f_group_ids"),
            src.alias("f_user_source"),
            F.when(src.isin(1, 2, 3, 10, 11), 1)
            .when(src.isin(4, 5, 6, 7, 8), 2)
            .otherwise(3)
            .cast("bigint")
            .alias("f_register_type"),
            F.when(src == 9, 2).otherwise(1).cast("bigint").alias("f_user_type"),
            "f_region_id",
            "f_customer_code",
            "f_device_series_ids",
            "f_first_login_time",
            "f_app_version",
            "f_region_name", "f_city_id", "f_city_name",
            "f_province_id", "f_province_name",
        )
    )
