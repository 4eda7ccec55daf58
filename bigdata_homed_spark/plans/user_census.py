"""User-dimension census (`homed/general/CountUsers.scala:13-397`).

The reference reads 7 iusm MySQL tables (account_info, home_info,
address_info, city/province/area, user_pay_info) once and re-aggregates
them along four dimensions — source, region, pay, status — into three
MySQL tables: t_da (personal accounts), t_home (families), t_home_by_pay
(paid families).  The core (`static():225-330`):

- status semantics: 0 unactivated / 1 normal / 2 arrears / 3 suspended /
  4 cancelled (the ``status!=9`` guard excludes an internal marker the
  synthetic dim doesn't produce);
- ``newAndCurrent`` — per-area new registrations in the report window +
  current totals, split by status bucket (0, 1, 2|3, 4) with the CASE
  block at :268-272;
- ``countDel`` — cancelled accounts whose status update falls in the
  window;
- ``byPay`` — families whose any member paid in the window (f_type 2)
  vs free families = status-1 families minus paid (:253-263).

Spark-first re-expression: ONE pass over the account dim; the family
grain is a single keyed ``groupBy(home_id)`` whose master-account
attributes come from ``min_by(attr, DA)`` (the reference joined
home_info back to account_info on the master account); the pay flag is
a left join against the distinct paying keys of orders (the reference's
user_pay_info window scan); the report-window bound is a 1-row
aggregate broadcast.  Both scopes ('da', 'home') share one conditional
aggregation — all map-side combinable, no driver loops (the reference
`.count()`-ed five DataFrames on the driver just to pick branches).

Synthetic mapping (documented so the oracle derives identically):
DA = c_custkey; home_id = DA // 3; status = DA % 5;
reg_source = 1 + DA % 4; region = c_nationkey;
create_day = DA % 2400; status_update_day = create_day + DA % 700;
paid = DA has any order; window = trailing 30 days of max create_day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

_CENSUS_ORACLE = """
WITH acct AS (
  SELECT c_custkey AS da,
         cast(c_custkey // 3 as bigint)  AS home_id,
         cast(c_custkey % 5 as int)      AS status,
         cast(1 + c_custkey % 4 as int)  AS f_reg_source,
         cast(c_nationkey as bigint)     AS f_region_id,
         cast(c_custkey % 2400 as bigint) AS create_day,
         cast(c_custkey % 2400 + c_custkey % 700 as bigint) AS upd_day
  FROM customer
),
pay AS (SELECT DISTINCT o_custkey AS da FROM orders),
acct_pay AS (
  SELECT a.*, CASE WHEN p.da IS NULL THEN 0 ELSE 1 END AS paid
  FROM acct a LEFT JOIN pay p USING (da)
),
w AS (SELECT max(create_day) AS wmax FROM acct),
home AS (
  SELECT home_id,
         min_by(status, da)       AS status,
         min_by(f_region_id, da)  AS f_region_id,
         min_by(f_reg_source, da) AS f_reg_source,
         min_by(create_day, da)   AS create_day,
         min_by(upd_day, da)      AS upd_day,
         max(paid)                AS paid
  FROM acct_pay GROUP BY home_id
),
both_scopes AS (
  SELECT 'da' AS f_scope, * FROM acct_pay
  UNION ALL
  SELECT 'home' AS f_scope, home_id AS da, home_id, status, f_reg_source,
         f_region_id, create_day, upd_day, paid
  FROM home
),
agg AS (
  SELECT f_scope, f_region_id, f_reg_source,
         cast(sum(CASE WHEN status = 0 THEN 1 ELSE 0 END) as bigint) AS f_s0,
         cast(sum(CASE WHEN status = 1 THEN 1 ELSE 0 END) as bigint) AS f_s1,
         cast(sum(CASE WHEN status IN (2,3) THEN 1 ELSE 0 END) as bigint) AS f_s23,
         cast(sum(CASE WHEN status = 4 THEN 1 ELSE 0 END) as bigint) AS f_s4,
         cast(sum(CASE WHEN create_day BETWEEN w.wmax - 29 AND w.wmax
                       THEN 1 ELSE 0 END) as bigint) AS f_new,
         cast(sum(CASE WHEN status = 4 AND upd_day BETWEEN w.wmax - 29 AND w.wmax
                       THEN 1 ELSE 0 END) as bigint) AS f_deleted,
         cast(sum(CASE WHEN status = 1 AND paid = 1 THEN 1 ELSE 0 END) as bigint)
           AS f_paid
  FROM both_scopes CROSS JOIN w
  GROUP BY f_scope, f_region_id, f_reg_source
)
SELECT f_scope, f_region_id, f_reg_source, f_s0, f_s1, f_s23, f_s4,
       f_new, f_deleted, f_paid, f_s1 - f_paid AS f_free
FROM agg
"""


@query("user_census_by_area", oracle=_CENSUS_ORACLE)
def user_census_by_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    da = F.col("c_custkey")
    acct = cust.select(
        da.alias("da"),
        F.expr("cast(c_custkey div 3 as bigint)").alias("home_id"),
        (da % 5).cast("int").alias("status"),
        (F.lit(1) + da % 4).cast("int").alias("f_reg_source"),
        F.col("c_nationkey").cast("bigint").alias("f_region_id"),
        (da % 2400).cast("bigint").alias("create_day"),
        (da % 2400 + da % 700).cast("bigint").alias("upd_day"),
    )
    # user_pay_info stand-in: keys that paid at least once.  Keyed
    # semi-join shape — at 100 TB both sides shuffle on the key, no
    # broadcast assumption needed (AQE will still broadcast when small).
    pay = orders.select(F.col("o_custkey").alias("da")).distinct().withColumn(
        "p", F.lit(1)
    )
    acct_pay = acct.join(pay, "da", "left").withColumn(
        "paid", F.coalesce(F.col("p"), F.lit(0))
    ).drop("p")

    # family grain: master account = min DA (home_info join analog)
    home = acct_pay.groupBy("home_id").agg(
        F.min_by("status", "da").alias("status"),
        F.min_by("f_region_id", "da").alias("f_region_id"),
        F.min_by("f_reg_source", "da").alias("f_reg_source"),
        F.min_by("create_day", "da").alias("create_day"),
        F.min_by("upd_day", "da").alias("upd_day"),
        F.max("paid").alias("paid"),
    )
    scopes = acct_pay.select(
        F.lit("da").alias("f_scope"),
        "f_region_id", "f_reg_source", "status", "create_day", "upd_day", "paid",
    ).unionByName(
        home.select(
            F.lit("home").alias("f_scope"),
            "f_region_id", "f_reg_source", "status", "create_day", "upd_day", "paid",
        )
    )
    wmax = acct.agg(F.max("create_day").alias("wmax"))
    in_window = lambda c: F.col(c).between(F.col("wmax") - 29, F.col("wmax"))  # noqa: E731
    agg = (
        scopes.crossJoin(F.broadcast(wmax))
        .groupBy("f_scope", "f_region_id", "f_reg_source")
        .agg(
            F.sum(F.when(F.col("status") == 0, 1).otherwise(0)).cast("bigint").alias("f_s0"),
            F.sum(F.when(F.col("status") == 1, 1).otherwise(0)).cast("bigint").alias("f_s1"),
            F.sum(F.when(F.col("status").isin(2, 3), 1).otherwise(0))
            .cast("bigint")
            .alias("f_s23"),
            F.sum(F.when(F.col("status") == 4, 1).otherwise(0)).cast("bigint").alias("f_s4"),
            F.sum(F.when(in_window("create_day"), 1).otherwise(0))
            .cast("bigint")
            .alias("f_new"),
            F.sum(
                F.when((F.col("status") == 4) & in_window("upd_day"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("f_deleted"),
            F.sum(
                F.when((F.col("status") == 1) & (F.col("paid") == 1), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("f_paid"),
        )
    )
    return agg.withColumn("f_free", F.col("f_s1") - F.col("f_paid"))
