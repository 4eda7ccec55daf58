"""Streaming queries registered in the correctness contract.

``stream_hourly_event_counts`` drives a real Structured Streaming query
(file-replay source → watermark → tumbling window → memory sink) to
completion and returns the materialized result; the oracle is the batch
equivalent in plain SQL.  This pins the streaming machinery itself — window
assignment, watermark bookkeeping, complete-mode semantics — to the batch
truth, which is exactly the parity contract the reference maintained between
its realtime jobs and nightly repair jobs (SURVEY §2.9 T6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming.jobs import hourly_event_counts, read_events_stream, run_stream_to_memory
from .registry import query


@query(
    "stream_hourly_event_counts",
    oracle="""
    SELECT ((epoch_us(ts)//1000000)//3600)*3600 AS hour_start,
           event_type,
           count(*) AS n_events,
           cast(sum(cast(value as decimal(27,6))) as double) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def stream_hourly_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_events_stream(spark, sf_dir)
    agg = hourly_event_counts(events)
    return run_stream_to_memory(agg, output_mode="complete")
