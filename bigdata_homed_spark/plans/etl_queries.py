"""Oracle registration for the end-to-end video_play ETL chain.

The DuckDB oracle replays the ENTIRE chain — line building, blacklist,
regex parse, k-v extraction, Success→Finished pairing, playtype/terminal
normalization, region join, report agg — in SQL, so the pipeline is
verified as a whole, not per-stage.  (Per-stage unit tests live in
tests/test_video_play_etl.py.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..reports.video_play_etl import video_play_report
from .registry import query

_HEADER_RE = r"^\[(\d+)\](\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}) - \[INFO\] - ([A-Za-z]+), (.*)$"

_ORACLE = rf"""
WITH ev AS (
  SELECT event_id, user_id, event_type, value, props,
         epoch_us(ts)//1000000 AS sec
  FROM events
),
lines AS (
  SELECT event_id,
    '[' || cast(event_id % 32768 as varchar) || ']'
        || strftime(make_timestamp(sec*1000000), '%Y-%m-%d %H:%M:%S')
        || ' - [INFO] - '
        || CASE event_type WHEN 'signup' THEN 'Success'
                           WHEN 'purchase' THEN 'Finished'
                           WHEN 'click' THEN 'ProgramEnter'
                           WHEN 'view' THEN 'HeartBeat'
                           ELSE 'BINARYC' END
        || ', DA ' || cast(user_id as varchar)
        || ', DeviceId ' || cast(((user_id * 3 + event_id % 3) * 33311) % 100000 as varchar)
        || ', ProgramMethod '
        || (['live','vod','tr','ts','kts'])[cast(coalesce(cast(json_extract_string(props,'$.k') as bigint), 0) % 5 as int) + 1]
        || ', ProgramID ' || coalesce(json_extract_string(props,'$.k'), '0')
        || ', PlayS ' || cast(cast(floor(value) as bigint) as varchar) AS line
  FROM ev
),
filtered AS (
  SELECT * FROM lines
  WHERE line NOT LIKE '%BINARYC%' AND line NOT LIKE '%PlayCount%'
),
parsed AS (
  SELECT event_id,
         epoch_us(strptime(regexp_extract(line, '{_HEADER_RE}', 2), '%Y-%m-%d %H:%M:%S'))//1000000 AS sec,
         regexp_extract(line, '{_HEADER_RE}', 3) AS keyword,
         regexp_extract(line, '{_HEADER_RE}', 4) AS body
  FROM filtered
  WHERE regexp_extract(line, '{_HEADER_RE}', 3) != ''
),
fields AS (
  SELECT event_id, sec, keyword,
         cast(str_split(str_split(body, ', ')[1], ' ')[2] as bigint) AS user_id,
         cast(str_split(str_split(body, ', ')[2], ' ')[2] as bigint) AS device_id,
         str_split(str_split(body, ', ')[3], ' ')[2] AS method
  FROM parsed
),
play AS (SELECT * FROM fields WHERE keyword IN ('Success', 'Finished')),
paired AS (
  SELECT *,
         lead(sec) OVER w AS next_sec,
         lead(keyword) OVER w AS next_kw
  FROM play
  WINDOW w AS (PARTITION BY user_id, device_id ORDER BY sec, event_id)
),
sessions AS (
  SELECT user_id, device_id, method,
         sec AS start_ts, next_sec AS end_ts, next_sec - sec AS playtime
  FROM paired
  WHERE keyword = 'Success' AND next_kw = 'Finished'
),
fact AS (
  SELECT s.*,
         CASE WHEN s.method IN ('tr','ts','kts') THEN 'timeshift'
              WHEN s.method = 'vod' THEN 'demand'
              ELSE s.method END AS playtype,
         n.n_name
  FROM sessions s
  LEFT JOIN customer c ON s.user_id + 1 = c.c_custkey
  LEFT JOIN nation n   ON c.c_nationkey = n.n_nationkey
)
SELECT playtype, coalesce(n_name, '-') AS region,
       count(*) AS n_sessions,
       count(DISTINCT user_id) AS n_users,
       cast(sum(playtime) as bigint) AS total_playtime_sec
FROM fact GROUP BY 1, 2
"""


@query("video_play_report", oracle=_ORACLE)
def video_play_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return video_play_report(spark, sf_dir)


# --------------------------------------------------------------------------
# CA→DA id translation (`etl/ReportLog.scala:85-105` version=true path +
# `etl/CaGetDa`): some log versions report the smart-card number (CA)
# instead of the account id (DA); the ETL broadcasts the CA→DA dim and
# rewrites ids, KEEPING the original when no mapping exists (the
# reference's left join + nvl).  Here the dim is synthetic (CA maps to
# CA+10000 except every third card, which is unmapped), the join is a
# broadcast left join + coalesce — no UDF, no driver map — and the report
# accounts per event type how many ids were translated vs passed through.
@query(
    "ca_da_translation",
    oracle="""
    WITH dim AS (
      SELECT id AS ca, id + 10000 AS da
      FROM (SELECT unnest(generate_series(0, 1499)) AS id)
      WHERE id % 3 != 0
    ),
    ev AS (
      SELECT e.event_type,
             coalesce(d.da, e.user_id) AS resolved_id,
             CASE WHEN d.da IS NOT NULL THEN 1 ELSE 0 END AS translated
      FROM events e LEFT JOIN dim d ON d.ca = e.user_id
    )
    SELECT event_type,
           cast(count(*) as bigint) AS n_events,
           cast(sum(translated) as bigint) AS n_translated,
           cast(count(DISTINCT resolved_id) as bigint) AS n_distinct_resolved
    FROM ev GROUP BY event_type
    """,
)
def ca_da_translation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    dim = (
        spark.range(0, 1500)
        .where(F.col("id") % 3 != 0)
        .select(F.col("id").alias("ca"), (F.col("id") + 10000).alias("da"))
    )
    joined = ev.join(F.broadcast(dim), ev["user_id"] == dim["ca"], "left")
    resolved = joined.select(
        "event_type",
        F.coalesce("da", "user_id").alias("resolved_id"),
        F.when(F.col("da").isNotNull(), 1).otherwise(0).alias("translated"),
    )
    return resolved.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("translated").cast("bigint").alias("n_translated"),
        F.countDistinct("resolved_id").cast("bigint").alias("n_distinct_resolved"),
    )
