"""Oracle registration for the ChannelReport composite (reports/channel_report)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..reports.channel_report import (
    GUIDE_END,
    GUIDE_START,
    N_CHANNELS,
    PROGRAM_SEC,
    channel_report,
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
