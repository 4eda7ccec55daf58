"""Demand column-family completion (SURVEY §0 `homed/repots` package):

- ``demand_column_user_types``  — `DemandColumn.scala:26-86`: per-column
  totals (getVideoColumn) + the per-user play-time tiering that feeds the
  user-type distribution (getUserColumn).
- ``column_demand_program_details`` — `ColumnDemandProgramDetails.scala:
  25-81`: (column hierarchy × series) play count/time at day/week/month
  grains plus the trailing-7-day history rows (`getColumnBasicHistory`,
  f_type=1).
- ``package_program_periods`` — `DemandProgramPackage.scala:28-97`:
  (package × program) grain with cp_sp, at the same period grains +
  history rows.

All three aggregate the same synthetic demand-watch fact the rest of the
demand family uses (events 'click' rows, play seconds = floor(value*10),
`$.k` drives video/column identity) so cross-query results stay mutually
consistent.  Scale shape shared by all three: the fact shuffles ONCE to a
daily base grain (map-side combinable), every period grain is a narrow
re-aggregation of that base, dims (geo, package bridge) broadcast, and
the trailing-history window bound is a 1-row broadcast scalar — never a
driver-side collect of data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query
from .report_families import _geo_dim, _package_bridge

_GEO_KEYS = [
    "f_province_id", "f_province_name", "f_city_id", "f_city_name",
    "f_region_id", "f_region_name", "f_terminal",
]

# geo CTE shared by the oracles (same derivation as the rest of the family)
_GEO_CTE = """
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


def _column_hierarchy(df: DataFrame) -> DataFrame:
    """Attach the 3-level column hierarchy as pure expressions.

    The reference walked a driver-side HashMap of the column table per row
    (`DemandReport.scala` addColumn); here parent ids are arithmetic on the
    synthetic column id — no join, no driver state.
    """
    cid = F.col("f_column_id")
    return (
        df.withColumn("f_column_name", F.concat(F.lit("col_"), cid.cast("string")))
        .withColumn("f_parent_column_id", F.expr("cast(f_column_id div 4 as bigint)"))
        .withColumn(
            "f_parent_column_name",
            F.concat(F.lit("col_"), F.expr("cast(f_column_id div 4 as string)")),
        )
        .withColumn(
            "f_parent_parent_column_id", F.expr("cast(f_column_id div 16 as bigint)")
        )
        .withColumn(
            "f_parent_parent_column_name",
            F.concat(F.lit("col_"), F.expr("cast(f_column_id div 16 as string)")),
        )
    )


_COL_HIER_SQL = """
         cast(f_column_id as bigint) AS f_column_id,
         'col_' || cast(f_column_id as varchar) AS f_column_name,
         cast(f_column_id // 4 as bigint) AS f_parent_column_id,
         'col_' || cast(f_column_id // 4 as varchar) AS f_parent_column_name,
         cast(f_column_id // 16 as bigint) AS f_parent_parent_column_id,
         'col_' || cast(f_column_id // 16 as varchar) AS f_parent_parent_column_name
"""

_COL_HIER_KEYS = [
    "f_column_id", "f_column_name",
    "f_parent_column_id", "f_parent_column_name",
    "f_parent_parent_column_id", "f_parent_parent_column_name",
]


# --------------------------------------------------------------------------
# DemandColumn: per-column totals + user-type distribution.  The reference
# runs two passes over t_demand_video_basic for day=D with
# `f_column_id != 0 AND f_column_id IS NOT NULL` (:40-41, :66-67):
# getVideoColumn sums count/time per column; getUserColumn first sums per
# (column, user), tiers the per-user play time (≤600 → 1, ≤3600 → 2,
# else 3, :71-73), then counts users per tier.  One query carries both:
# grouping the tiered per-user grain by (dims, tier) yields the user-type
# distribution AND the column totals (sum over tiers == getVideoColumn).
_DEMAND_COLUMN_ORACLE = f"""
WITH {_GEO_CTE.strip()},
plays AS (
  SELECT e.user_id,
         (epoch_us(e.ts)//1000000)//86400 AS f_date,
         cast(floor(e.value*10) as bigint) AS play,
         coalesce(cast(json_extract_string(e.props, '$.k') as bigint), 0) % 60
           AS f_column_id
  FROM events e WHERE e.event_type = 'click'
),
base AS (
  SELECT p.f_date, p.play, g.*,
{_COL_HIER_SQL.strip()}
  FROM plays p JOIN geo g ON g.user_id = p.user_id
  WHERE p.play > 0 AND p.f_column_id != 0
),
per_user AS (
  SELECT f_date, user_id,
         f_province_id, f_province_name, f_city_id, f_city_name,
         f_region_id, f_region_name, f_terminal,
         f_column_id, f_column_name, f_parent_column_id, f_parent_column_name,
         f_parent_parent_column_id, f_parent_parent_column_name,
         cast(count(*) as bigint) AS f_count,
         cast(sum(play) as bigint) AS f_play_time
  FROM base
  GROUP BY ALL
)
SELECT f_date,
       f_province_id, f_province_name, f_city_id, f_city_name,
       f_region_id, f_region_name, f_terminal,
       f_column_id, f_column_name, f_parent_column_id, f_parent_column_name,
       f_parent_parent_column_id, f_parent_parent_column_name,
       CASE WHEN f_play_time <= 600 THEN 1
            WHEN f_play_time <= 3600 THEN 2 ELSE 3 END AS f_user_type,
       cast(count(*) as bigint) AS f_user_count,
       cast(sum(f_count) as bigint) AS f_count,
       cast(sum(f_play_time) as bigint) AS f_play_time
FROM per_user
GROUP BY ALL
"""


@query("demand_column_user_types", oracle=_DEMAND_COLUMN_ORACLE)
def demand_column_user_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    geo = _geo_dim(spark, sf_dir)
    k = F.coalesce(F.get_json_object("props", "$.k").cast("bigint"), F.lit(0))
    plays = (
        ev.where(F.col("event_type") == "click")
        .select(
            "user_id",
            F.expr("cast(ts_sec div 86400 as bigint)").alias("f_date"),
            F.floor(F.col("value") * 10).cast("bigint").alias("play"),
            (k % 60).alias("f_column_id"),
        )
        # the reference's `f_column_id != 0 AND IS NOT NULL` guard (:40-41)
        .where((F.col("play") > 0) & (F.col("f_column_id") != 0))
        .join(F.broadcast(geo), "user_id")
    )
    per_user = (
        _column_hierarchy(plays)
        .groupBy("f_date", "user_id", *_GEO_KEYS, *_COL_HIER_KEYS)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("f_count"),
            F.sum("play").cast("bigint").alias("f_play_time"),
        )
    )
    tier = (
        F.when(F.col("f_play_time") <= 600, 1)
        .when(F.col("f_play_time") <= 3600, 2)
        .otherwise(3)
    )
    return (
        per_user.withColumn("f_user_type", tier)
        .groupBy("f_date", *_GEO_KEYS, *_COL_HIER_KEYS, "f_user_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("f_user_count"),
            F.sum("f_count").cast("bigint").alias("f_count"),
            F.sum("f_play_time").cast("bigint").alias("f_play_time"),
        )
    )


# --------------------------------------------------------------------------
# Period-grain scaffolding shared by the two period queries.  Grain labels
# match demand_period_grains (week epoch-aligned to 1970-01-05, a Monday:
# ((day-4)//7)*7+4).  History rows re-aggregate the SAME daily base over
# the trailing-7-day window ending at the corpus max day — the window
# bound is a 1-row aggregate broadcast-cross-joined, the analog of the
# reference's driver-computed date args (`getDateByDays(date, 6)`).
_DAY_LABEL = "date_format(date_add(DATE'1970-01-01', cast(day as int)), 'yyyy-MM-dd')"
_WEEK_LABEL = (
    "date_format(date_add(DATE'1970-01-01',"
    " cast(floor((day - 4)/7)*7 + 4 as int)), 'yyyy-MM-dd')"
)
_MONTH_LABEL = "date_format(date_add(DATE'1970-01-01', cast(day as int)), 'yyyy-MM')"


def _with_period_grains(daily: DataFrame) -> DataFrame:
    """day/week/month grain rows + trailing-7d history rows (f_type=1).

    ``daily`` fans out FIVE ways (max-day scalar + 4 grain branches); it
    is persisted here so the fact scan/join/agg beneath it runs once —
    the daily base is one row per (day, dims), orders of magnitude
    smaller than the fact it summarizes.
    """
    from pyspark.storagelevel import StorageLevel

    daily = daily.persist(StorageLevel.MEMORY_AND_DISK)
    mx = daily.agg(F.max("day").alias("max_day"))
    hist = (
        daily.crossJoin(F.broadcast(mx))
        .where(F.col("day") >= F.col("max_day") - F.lit(6))
        .withColumn("f_grain", F.lit("hist7"))
        .withColumn(
            "f_date",
            F.expr(
                "date_format(date_add(DATE'1970-01-01',"
                " cast(max_day - 6 as int)), 'yyyy-MM-dd')"
            ),
        )
        .withColumn("f_type", F.lit(1))
        .drop("max_day")
    )
    grains = (
        daily.select(
            F.lit("day").alias("f_grain"), F.expr(_DAY_LABEL).alias("f_date"), "*"
        )
        .unionByName(
            daily.select(
                F.lit("week").alias("f_grain"), F.expr(_WEEK_LABEL).alias("f_date"), "*"
            )
        )
        .unionByName(
            daily.select(
                F.lit("month").alias("f_grain"),
                F.expr(_MONTH_LABEL).alias("f_date"),
                "*",
            )
        )
        .withColumn("f_type", F.lit(0))
    )
    return grains.unionByName(hist.select(*grains.columns))


_GRAINS_SQL = f"""
grains AS (
  SELECT 'day' AS f_grain, strftime(DATE '1970-01-01' + cast(day as int), '%Y-%m-%d')
           AS f_date, 0 AS f_type, *
  FROM daily
  UNION ALL
  SELECT 'week' AS f_grain,
         strftime(DATE '1970-01-01' + cast(((day - 4)//7)*7 + 4 as int), '%Y-%m-%d')
           AS f_date, 0 AS f_type, *
  FROM daily
  UNION ALL
  SELECT 'month' AS f_grain, strftime(DATE '1970-01-01' + cast(day as int), '%Y-%m')
           AS f_date, 0 AS f_type, *
  FROM daily
  UNION ALL
  SELECT 'hist7' AS f_grain,
         strftime(DATE '1970-01-01' + cast(mx.max_day - 6 as int), '%Y-%m-%d')
           AS f_date, 1 AS f_type, d.*
  FROM daily d CROSS JOIN (SELECT max(day) AS max_day FROM daily) mx
  WHERE d.day >= mx.max_day - 6
)"""


# --------------------------------------------------------------------------
# ColumnDemandProgramDetails: (column hierarchy × series) detail.  The
# reference selects f_series_id AS f_video_id / f_series_name AS
# f_video_name (:36-37) — the "program" at this grain is the series — and
# emits day/week/month tables plus the 7-day history table with f_type=1.
_COLUMN_PROGRAM_ORACLE = f"""
WITH {_GEO_CTE.strip()},
plays AS (
  SELECT e.user_id,
         (epoch_us(e.ts)//1000000)//86400 AS day,
         cast(floor(e.value*10) as bigint) AS play,
         coalesce(cast(json_extract_string(e.props, '$.k') as bigint), 0) % 60
           AS f_column_id,
         (coalesce(cast(json_extract_string(e.props, '$.k') as bigint), 0) % 200) // 10
           AS f_series_id
  FROM events e WHERE e.event_type = 'click'
),
base AS (
  SELECT p.day, p.play,
         cast(p.f_series_id as bigint) AS f_video_id,
         'sr_' || cast(p.f_series_id as varchar) AS f_video_name,
         g.* EXCLUDE (user_id),
{_COL_HIER_SQL.strip()}
  FROM plays p JOIN geo g ON g.user_id = p.user_id
  WHERE p.play > 0 AND p.f_column_id != 0
),
daily AS (
  SELECT day,
         f_province_id, f_province_name, f_city_id, f_city_name,
         f_region_id, f_region_name, f_terminal,
         f_column_id, f_column_name, f_parent_column_id, f_parent_column_name,
         f_parent_parent_column_id, f_parent_parent_column_name,
         f_video_id, f_video_name,
         cast(count(*) as bigint) AS f_play_count,
         cast(sum(play) as bigint) AS f_play_time
  FROM base
  GROUP BY ALL
),
{_GRAINS_SQL.strip()}
SELECT f_grain, f_date, f_type,
       f_province_id, f_province_name, f_city_id, f_city_name,
       f_region_id, f_region_name, f_terminal,
       f_column_id, f_column_name, f_parent_column_id, f_parent_column_name,
       f_parent_parent_column_id, f_parent_parent_column_name,
       f_video_id, f_video_name,
       cast(sum(f_play_count) as bigint) AS f_play_count,
       cast(sum(f_play_time) as bigint) AS f_play_time
FROM grains
GROUP BY ALL
"""


@query("column_demand_program_details", oracle=_COLUMN_PROGRAM_ORACLE)
def column_demand_program_details(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    geo = _geo_dim(spark, sf_dir)
    k = F.coalesce(F.get_json_object("props", "$.k").cast("bigint"), F.lit(0))
    plays = (
        ev.where(F.col("event_type") == "click")
        .select(
            "user_id",
            F.expr("cast(ts_sec div 86400 as bigint)").alias("day"),
            F.floor(F.col("value") * 10).cast("bigint").alias("play"),
            (k % 60).alias("f_column_id"),
            F.expr(
                "cast((coalesce(cast(get_json_object(props, '$.k') as bigint), 0)"
                " % 200) div 10 as bigint)"
            ).alias("f_series_id"),
        )
        .where((F.col("play") > 0) & (F.col("f_column_id") != 0))
        .join(F.broadcast(geo), "user_id")
    )
    base = (
        _column_hierarchy(plays)
        # the reference's series-as-program aliasing (:36-37)
        .withColumn("f_video_id", F.col("f_series_id"))
        .withColumn(
            "f_video_name", F.concat(F.lit("sr_"), F.col("f_series_id").cast("string"))
        )
    )
    daily = base.groupBy(
        "day", *_GEO_KEYS, *_COL_HIER_KEYS, "f_video_id", "f_video_name"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("f_play_count"),
        F.sum("play").cast("bigint").alias("f_play_time"),
    )
    return (
        _with_period_grains(daily)
        .groupBy(
            "f_grain", "f_date", "f_type",
            *_GEO_KEYS, *_COL_HIER_KEYS, "f_video_id", "f_video_name",
        )
        .agg(
            F.sum("f_play_count").cast("bigint").alias("f_play_count"),
            F.sum("f_play_time").cast("bigint").alias("f_play_time"),
        )
    )


# --------------------------------------------------------------------------
# DemandProgramPackage: (package × program) grain with cp_sp over
# orc_user_package, at day/week/month grains + 7-day history (f_type=1).
# The package membership comes through the same JSON-explode bridge as
# demand_package_tiers; each watch row lands in every package containing
# its series (the reference's orc_user_package fact is pre-joined the same
# way).
_PACKAGE_PROGRAM_ORACLE = f"""
WITH {_GEO_CTE.strip()},
pkg AS (
  SELECT p AS package_id,
         'pk_' || cast(p as varchar) AS package_name,
         'csp_' || cast(p % 5 as varchar) AS f_cp_sp,
         '[{{"ids":"' || cast(p as varchar) || ',' || cast((p+3) % 20 as varchar)
           || '","type":"tA"}},{{"ids":"' || cast((p+7) % 20 as varchar) || ','
           || cast((p+11) % 20 as varchar) || ',' || cast((p+13) % 20 as varchar)
           || '","type":"tB"}}]' AS program_ids
  FROM (SELECT unnest(generate_series(0, 19)) AS p)
),
frag AS (
  SELECT package_id, package_name, f_cp_sp,
         unnest(str_split(replace(regexp_extract(program_ids, '^\\[(.+)\\]$', 1),
                                  '}},{{', '}}||{{'), '||')) AS grp
  FROM pkg
),
bridge AS (
  SELECT package_id, package_name, f_cp_sp,
         cast(unnest(str_split(json_extract_string(grp, '$.ids'), ',')) as bigint)
           AS f_series_id
  FROM frag
),
watch AS (
  SELECT e.user_id,
         (epoch_us(e.ts)//1000000)//86400 AS day,
         cast(floor(e.value*10) as bigint) AS play,
         coalesce(cast(json_extract_string(e.props, '$.k') as bigint), 0) % 200
           AS f_video_id
  FROM events e WHERE e.event_type = 'click'
),
base AS (
  SELECT w.day, w.play,
         cast(w.f_video_id as bigint) AS f_video_id,
         'vd_' || cast(w.f_video_id as varchar) AS f_video_name,
         cast(w.f_video_id // 10 as bigint) AS f_series_id,
         'sr_' || cast(w.f_video_id // 10 as varchar) AS f_series_name,
         g.* EXCLUDE (user_id)
  FROM watch w JOIN geo g ON g.user_id = w.user_id
  WHERE w.play > 0
),
daily AS (
  SELECT day,
         f_province_id, f_province_name, f_city_id, f_city_name,
         f_region_id, f_region_name, f_terminal,
         b2.f_cp_sp, b2.package_id AS f_package_id,
         b2.package_name AS f_package_name,
         f_video_id, f_video_name, f_series_id, f_series_name,
         cast(count(*) as bigint) AS f_play_count,
         cast(sum(play) as bigint) AS f_play_time
  FROM base b JOIN bridge b2 USING (f_series_id)
  GROUP BY ALL
),
{_GRAINS_SQL.strip()}
SELECT f_grain, f_date, f_type,
       f_province_id, f_province_name, f_city_id, f_city_name,
       f_region_id, f_region_name, f_terminal,
       f_cp_sp, f_package_id, f_package_name,
       f_video_id, f_video_name, f_series_id, f_series_name,
       cast(sum(f_play_count) as bigint) AS f_play_count,
       cast(sum(f_play_time) as bigint) AS f_play_time
FROM grains
GROUP BY ALL
"""


@query("package_program_periods", oracle=_PACKAGE_PROGRAM_ORACLE)
def package_program_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    geo = _geo_dim(spark, sf_dir)
    bridge = _package_bridge(spark).drop("f_type")
    k = F.coalesce(F.get_json_object("props", "$.k").cast("bigint"), F.lit(0))
    watch = (
        ev.where(F.col("event_type") == "click")
        .select(
            "user_id",
            F.expr("cast(ts_sec div 86400 as bigint)").alias("day"),
            F.floor(F.col("value") * 10).cast("bigint").alias("play"),
            (k % 200).alias("f_video_id"),
        )
        .where(F.col("play") > 0)
        .join(F.broadcast(geo), "user_id")
        .withColumn(
            "f_video_name", F.concat(F.lit("vd_"), F.col("f_video_id").cast("string"))
        )
        .withColumn("f_series_id", F.expr("cast(f_video_id div 10 as bigint)"))
        .withColumn(
            "f_series_name", F.concat(F.lit("sr_"), F.col("f_series_id").cast("string"))
        )
    )
    daily = (
        watch.join(F.broadcast(bridge), "f_series_id")
        .groupBy(
            "day", *_GEO_KEYS,
            "f_cp_sp",
            F.col("package_id").alias("f_package_id"),
            F.col("package_name").alias("f_package_name"),
            "f_video_id", "f_video_name", "f_series_id", "f_series_name",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("f_play_count"),
            F.sum("play").cast("bigint").alias("f_play_time"),
        )
    )
    return (
        _with_period_grains(daily)
        .groupBy(
            "f_grain", "f_date", "f_type", *_GEO_KEYS,
            "f_cp_sp", "f_package_id", "f_package_name",
            "f_video_id", "f_video_name", "f_series_id", "f_series_name",
        )
        .agg(
            F.sum("f_play_count").cast("bigint").alias("f_play_count"),
            F.sum("f_play_time").cast("bigint").alias("f_play_time"),
        )
    )
