"""Oracle registration for the ChannelReport composite (reports/channel_report)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..reports.channel_report import (
    GUIDE_END,
    GUIDE_START,
    N_CHANNELS,
    PROGRAM_SEC,
    channel_report,
    channel_report_full,
)
from .registry import query

_ORACLE = f"""
WITH epg AS (
  SELECT c.channel_id, p.prog_start, p.prog_start + {PROGRAM_SEC} AS prog_end,
         'prog_' || cast(c.channel_id as varchar) || '_'
                 || cast((p.prog_start - {GUIDE_START})//{PROGRAM_SEC} as varchar) AS event_name
  FROM (SELECT unnest(generate_series(0, {N_CHANNELS - 1})) AS channel_id) c,
       (SELECT unnest(generate_series({GUIDE_START}, {GUIDE_END - PROGRAM_SEC}, {PROGRAM_SEC})) AS prog_start) p
),
plays AS (
  SELECT user_id, event_id,
         coalesce(cast(json_extract_string(props, '$.k') as bigint), 0) % {N_CHANNELS} AS channel_id,
         epoch_us(ts)//1000000 AS watch_start,
         least(cast(floor(value * 10) as bigint), {PROGRAM_SEC}) AS watch_sec
  FROM events
),
watched AS (
  SELECT p.*, e.event_name
  FROM plays p JOIN epg e
    ON p.channel_id = e.channel_id
   AND p.watch_start >= e.prog_start AND p.watch_start < e.prog_end
),
per_prog AS (
  SELECT channel_id, event_name,
         count(DISTINCT user_id) AS prog_uv
  FROM watched GROUP BY 1, 2
),
top AS (
  SELECT * FROM (
    SELECT *, dense_rank() OVER (PARTITION BY channel_id ORDER BY prog_uv DESC, event_name) AS rnk
    FROM per_prog
  ) WHERE rnk <= 3
),
packed AS (
  SELECT channel_id,
         array_to_string(list_sort(list(DISTINCT event_name || '&' || cast(prog_uv as varchar))), ',') AS top_programs
  FROM top GROUP BY 1
),
per_channel AS (
  SELECT channel_id,
         count(DISTINCT event_name) AS n_programs,
         count(DISTINCT user_id) AS channel_uv,
         cast(sum(watch_sec) as bigint) AS total_watch_sec
  FROM watched GROUP BY 1
)
SELECT pc.channel_id, pc.n_programs, pc.channel_uv, pc.total_watch_sec, pk.top_programs
FROM per_channel pc LEFT JOIN packed pk USING (channel_id)
"""


@query("channel_report", oracle=_ORACLE)
def channel_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return channel_report(spark, sf_dir, top_n=3)


# ---------------------------------------------------------------------------
# Full-fidelity groupByCategory_NEW oracle (ChannelReport.scala:122-454):
# the same base build, tier thresholds, rating/dense_rank/pack chain and
# region→city→province re-aggregation union, in DuckDB SQL.
_FULL_ORACLE = f"""
WITH base AS (
  SELECT cast((epoch_us(e.ts)//1000000)//86400 as bigint)          AS f_date,
         1 + e.user_id % 3                                          AS f_terminal,
         cast(n.n_nationkey as bigint)*10 + e.user_id % 4           AS f_region_id,
         cast(n.n_nationkey as bigint)                              AS f_city_id,
         cast(n.n_regionkey as bigint)                              AS f_province_id,
         'rg_' || cast(cast(n.n_nationkey as bigint)*10 + e.user_id % 4 as varchar)
                                                                    AS f_region_name,
         n.n_name                                                   AS f_city_name,
         r.r_name                                                   AS f_province_name,
         coalesce(cast(json_extract_string(e.props, '$.k') as bigint), 0) % {N_CHANNELS}
                                                                    AS f_channel_id,
         cast((coalesce(cast(json_extract_string(e.props, '$.k') as bigint), 0) % {N_CHANNELS})*10000
              + (epoch_us(e.ts)//1000000 - {GUIDE_START})//{PROGRAM_SEC} as bigint)
                                                                    AS f_program_id,
         cast((epoch_us(e.ts)//1000000 - {GUIDE_START})//{PROGRAM_SEC} as bigint)
                                                                    AS slot,
         e.user_id                                                  AS f_user_id,
         least(cast(floor(e.value * 10) as bigint), {PROGRAM_SEC})  AS f_play_sec
  FROM events e
  JOIN customer c ON c.c_custkey = e.user_id
  JOIN nation   n ON n.n_nationkey = c.c_nationkey
  JOIN region   r ON r.r_regionkey = n.n_regionkey
  WHERE epoch_us(e.ts)//1000000 >= {GUIDE_START}
    AND epoch_us(e.ts)//1000000 <  {GUIDE_END}
),
baseprog AS (
  SELECT *,
         'ch_' || cast(f_channel_id as varchar)                       AS f_channel_name,
         'prog_' || cast(f_channel_id as varchar) || '_' || cast(slot as varchar)
                                                                      AS f_program_name,
         5000000 + f_program_id                                       AS f_relevance_id,
         {GUIDE_START} + slot*{PROGRAM_SEC}                            AS f_program_start_time
  FROM base
),
scal AS (
  SELECT cast(count(DISTINCT f_date) as bigint) AS tg,
         cast(max(f_date) as varchar)           AS f_date_label
  FROM baseprog
),
df0_r AS (
  SELECT f_terminal, f_region_id, f_city_id, f_province_id,
         count(DISTINCT f_user_id) AS f_uv
  FROM baseprog GROUP BY 1, 2, 3, 4
),
per_user_r AS (
  SELECT f_terminal, f_region_id, f_city_id, f_province_id,
         f_region_name, f_city_name, f_province_name,
         f_channel_id, f_channel_name, f_user_id,
         sum(f_play_sec) AS upt
  FROM baseprog GROUP BY ALL
),
df1_r AS (
  SELECT f_terminal, f_region_id, f_city_id, f_province_id,
         f_region_name, f_city_name, f_province_name,
         f_channel_id, f_channel_name,
         cast(sum(CASE WHEN upt/tg < 600 THEN 1 ELSE 0 END) as bigint)  AS f_browse_user_count,
         cast(sum(CASE WHEN upt/tg >= 600 AND upt/tg < 3600 THEN 1 ELSE 0 END) as bigint)
                                                                         AS f_hobby_user_count,
         cast(sum(CASE WHEN upt/tg >= 3600 THEN 1 ELSE 0 END) as bigint) AS f_steady_user_count
  FROM per_user_r, scal GROUP BY ALL
),
df2_r AS (
  SELECT f_terminal, f_region_id, f_city_id, f_province_id,
         f_region_name, f_city_name, f_province_name,
         f_channel_id, f_channel_name,
         f_program_id, f_program_name, f_relevance_id, f_program_start_time,
         cast(sum(f_play_sec) as bigint) AS f_program_play_time
  FROM baseprog GROUP BY ALL
),
rated_r AS (
  SELECT d2.*, ((d2.f_program_play_time // (d0.f_uv*s.tg*86400)) * 100000000 + ((d2.f_program_play_time % (d0.f_uv*s.tg*86400)) * 10000 // (d0.f_uv*s.tg*86400)) * 10000 + ((d2.f_program_play_time % (d0.f_uv*s.tg*86400)) * 10000 % (d0.f_uv*s.tg*86400)) * 10000 // (d0.f_uv*s.tg*86400)) AS rating_e8
  FROM df2_r d2
  JOIN df0_r d0 USING (f_terminal, f_region_id, f_city_id, f_province_id), scal s
),
top_r AS (
  SELECT * FROM (
    SELECT *, dense_rank() OVER (
      PARTITION BY f_terminal, f_region_id, f_city_id, f_province_id,
                   f_region_name, f_city_name, f_province_name,
                   f_channel_id, f_channel_name
      ORDER BY rating_e8 DESC) AS f_rank
    FROM rated_r WHERE rating_e8 > 0
  ) WHERE f_rank <= 3
),
df3_r AS (
  SELECT f_terminal, f_region_id, f_city_id, f_province_id,
         f_region_name, f_city_name, f_province_name,
         f_channel_id, f_channel_name,
         array_to_string(list_sort(list(DISTINCT
           cast(f_relevance_id as varchar) || '&' || cast(f_program_id as varchar)
           || '&' || f_program_name
           || '&' || cast(rating_e8//100000000 as varchar) || '.' || lpad(cast(rating_e8%100000000 as varchar), 8, '0')
           || '&' || cast(f_program_start_time as varchar))), ',') AS f_rating_arr
  FROM top_r GROUP BY ALL
),
df4_r AS (
  SELECT s.f_date_label AS f_date, d1.f_terminal,
         cast(d1.f_region_id as varchar) AS f_region_id,
         cast(d1.f_city_id as varchar)   AS f_city_id,
         cast(d1.f_province_id as varchar) AS f_province_id,
         d1.f_region_name, d1.f_city_name, d1.f_province_name,
         cast(d1.f_channel_id as varchar) AS f_channel_id, d1.f_channel_name,
         d3.f_rating_arr,
         '1:' || d1.f_browse_user_count || ',2:' || d1.f_hobby_user_count
              || ',3:' || d1.f_steady_user_count AS f_user_type
  FROM df1_r d1
  JOIN df3_r d3 USING (f_terminal, f_region_id, f_city_id, f_province_id,
                       f_region_name, f_city_name, f_province_name,
                       f_channel_id, f_channel_name), scal s
),
df0_c AS (
  SELECT f_terminal, f_city_id, f_province_id, cast(sum(f_uv) as bigint) AS f_uv
  FROM df0_r GROUP BY ALL
),
df1_c AS (
  SELECT f_terminal, f_city_id, f_province_id, f_city_name, f_province_name,
         f_channel_id, f_channel_name,
         cast(sum(f_browse_user_count) as bigint) AS f_browse_user_count,
         cast(sum(f_hobby_user_count) as bigint)  AS f_hobby_user_count,
         cast(sum(f_steady_user_count) as bigint) AS f_steady_user_count
  FROM df1_r GROUP BY ALL
),
df2_c AS (
  SELECT f_terminal, f_city_id, f_province_id, f_city_name, f_province_name,
         f_channel_id, f_channel_name,
         f_program_id, f_program_name, f_relevance_id, f_program_start_time,
         cast(sum(f_program_play_time) as bigint) AS f_program_play_time
  FROM df2_r GROUP BY ALL
),
rated_c AS (
  SELECT d2.*, ((d2.f_program_play_time // (d0.f_uv*s.tg*86400)) * 100000000 + ((d2.f_program_play_time % (d0.f_uv*s.tg*86400)) * 10000 // (d0.f_uv*s.tg*86400)) * 10000 + ((d2.f_program_play_time % (d0.f_uv*s.tg*86400)) * 10000 % (d0.f_uv*s.tg*86400)) * 10000 // (d0.f_uv*s.tg*86400)) AS rating_e8
  FROM df2_c d2 JOIN df0_c d0 USING (f_terminal, f_city_id, f_province_id), scal s
),
top_c AS (
  SELECT * FROM (
    SELECT *, dense_rank() OVER (
      PARTITION BY f_terminal, f_city_id, f_province_id, f_city_name,
                   f_province_name, f_channel_id, f_channel_name
      ORDER BY rating_e8 DESC) AS f_rank
    FROM rated_c WHERE rating_e8 > 0
  ) WHERE f_rank <= 3
),
df3_c AS (
  SELECT f_terminal, f_city_id, f_province_id, f_city_name, f_province_name,
         f_channel_id, f_channel_name,
         array_to_string(list_sort(list(DISTINCT
           cast(f_relevance_id as varchar) || '&' || cast(f_program_id as varchar)
           || '&' || f_program_name
           || '&' || cast(rating_e8//100000000 as varchar) || '.' || lpad(cast(rating_e8%100000000 as varchar), 8, '0')
           || '&' || cast(f_program_start_time as varchar))), ',') AS f_rating_arr
  FROM top_c GROUP BY ALL
),
df4_c AS (
  SELECT s.f_date_label AS f_date, d1.f_terminal,
         '-1' AS f_region_id,
         cast(d1.f_city_id as varchar) AS f_city_id,
         cast(d1.f_province_id as varchar) AS f_province_id,
         '-1' AS f_region_name, d1.f_city_name, d1.f_province_name,
         cast(d1.f_channel_id as varchar) AS f_channel_id, d1.f_channel_name,
         d3.f_rating_arr,
         '1:' || d1.f_browse_user_count || ',2:' || d1.f_hobby_user_count
              || ',3:' || d1.f_steady_user_count AS f_user_type
  FROM df1_c d1
  JOIN df3_c d3 USING (f_terminal, f_city_id, f_province_id, f_city_name,
                       f_province_name, f_channel_id, f_channel_name), scal s
),
df0_p AS (
  SELECT f_terminal, f_province_id, cast(sum(f_uv) as bigint) AS f_uv
  FROM df0_r GROUP BY ALL
),
df1_p AS (
  SELECT f_terminal, f_province_id, f_province_name, f_channel_id, f_channel_name,
         cast(sum(f_browse_user_count) as bigint) AS f_browse_user_count,
         cast(sum(f_hobby_user_count) as bigint)  AS f_hobby_user_count,
         cast(sum(f_steady_user_count) as bigint) AS f_steady_user_count
  FROM df1_r GROUP BY ALL
),
df2_p AS (
  SELECT f_terminal, f_province_id, f_province_name, f_channel_id, f_channel_name,
         f_program_id, f_program_name, f_relevance_id, f_program_start_time,
         cast(sum(f_program_play_time) as bigint) AS f_program_play_time
  FROM df2_r GROUP BY ALL
),
rated_p AS (
  SELECT d2.*, ((d2.f_program_play_time // (d0.f_uv*s.tg*86400)) * 100000000 + ((d2.f_program_play_time % (d0.f_uv*s.tg*86400)) * 10000 // (d0.f_uv*s.tg*86400)) * 10000 + ((d2.f_program_play_time % (d0.f_uv*s.tg*86400)) * 10000 % (d0.f_uv*s.tg*86400)) * 10000 // (d0.f_uv*s.tg*86400)) AS rating_e8
  FROM df2_p d2 JOIN df0_p d0 USING (f_terminal, f_province_id), scal s
),
top_p AS (
  SELECT * FROM (
    SELECT *, dense_rank() OVER (
      PARTITION BY f_terminal, f_province_id, f_province_name,
                   f_channel_id, f_channel_name
      ORDER BY rating_e8 DESC) AS f_rank
    FROM rated_p WHERE rating_e8 > 0
  ) WHERE f_rank <= 3
),
df3_p AS (
  SELECT f_terminal, f_province_id, f_province_name, f_channel_id, f_channel_name,
         array_to_string(list_sort(list(DISTINCT
           cast(f_relevance_id as varchar) || '&' || cast(f_program_id as varchar)
           || '&' || f_program_name
           || '&' || cast(rating_e8//100000000 as varchar) || '.' || lpad(cast(rating_e8%100000000 as varchar), 8, '0')
           || '&' || cast(f_program_start_time as varchar))), ',') AS f_rating_arr
  FROM top_p GROUP BY ALL
),
df4_p AS (
  SELECT s.f_date_label AS f_date, d1.f_terminal,
         '-1' AS f_region_id, '-1' AS f_city_id,
         cast(d1.f_province_id as varchar) AS f_province_id,
         '-1' AS f_region_name, '-1' AS f_city_name, d1.f_province_name,
         cast(d1.f_channel_id as varchar) AS f_channel_id, d1.f_channel_name,
         d3.f_rating_arr,
         '1:' || d1.f_browse_user_count || ',2:' || d1.f_hobby_user_count
              || ',3:' || d1.f_steady_user_count AS f_user_type
  FROM df1_p d1
  JOIN df3_p d3 USING (f_terminal, f_province_id, f_province_name,
                       f_channel_id, f_channel_name), scal s
)
SELECT * FROM df4_r
UNION ALL SELECT * FROM df4_c
UNION ALL SELECT * FROM df4_p
"""


@query("channel_report_full", oracle=_FULL_ORACLE)
def channel_report_full_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return channel_report_full(spark, sf_dir, top_n=3)
