"""Streaming tests: batch-parity for the windowed agg, keyed state totals."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_homed_spark.sources.tables import load_table
from bigdata_homed_spark.streaming.jobs import (
    hourly_event_counts,
    online_user_state,
    read_events_stream,
    run_stream_to_memory,
)


def test_hourly_counts_match_batch(spark, sf_dir):
    stream_out = run_stream_to_memory(
        hourly_event_counts(read_events_stream(spark, sf_dir)), "complete"
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            (F.expr("ts_sec div 3600") * 3600).alias("hour_start"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    s = {(r.hour_start, r.event_type): r.n_events for r in stream_out.collect()}
    b = {(r.hour_start, r.event_type): r.n_events for r in batch.collect()}
    assert s == b


def test_online_user_state_totals(spark, sf_dir):
    out = run_stream_to_memory(
        online_user_state(read_events_stream(spark, sf_dir)), "update"
    )
    # state emits one row per (user, batch); the final row per user carries
    # the running totals — with availableNow over one file there is one batch
    latest = out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"), F.max("last_seen_sec").alias("last_seen")
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("ts_sec").alias("last_seen"))
    )
    s = {r.user_id: (r.n_events, r.last_seen) for r in latest.collect()}
    b = {r.user_id: (r.n_events, r.last_seen) for r in batch.collect()}
    assert s == b
