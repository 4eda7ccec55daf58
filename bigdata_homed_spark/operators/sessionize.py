"""Sessionization windows (SURVEY §2.5 W1-W3).

The reference pairs Start/Finish play events with ``lead()`` windows
(`etl/LogParser.scala:281-344`, `etl/RunLogParser.scala:376-439`), stitches
heartbeat chains (`etl/ReportLog.scala:199-280`), and caps each session's end
at the next session start of the same user+device in a nightly repair job
(`etl/LogDelay.scala:68-80`, `etl/LogDelayPatch.scala:27-54`).

Everything here is a pure ``DataFrame -> DataFrame`` built on window
functions; a single shuffle on the partition keys, sorted once, no Python in
the hot path.  At 100 TB the partition keys (user, device) are high-
cardinality and well distributed, so the window shuffle scales linearly;
there is no driver-side state.

Determinism: all ordering includes a unique tiebreaker column so plans are
stable under equal timestamps (the reference implicitly relied on Spark 1.6's
unstable sort order — we do not).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize_by_gap(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_sec_col: str,
    gap_seconds: int,
    tiebreak_col: str,
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the time since
    the previous event of the same key exceeds ``gap_seconds``.

    Modern spelling of the reference's Start/Finish pairing intent
    (`etl/LogParser.scala:281-317`): lag + conditional cumsum, one shuffle.
    ``ts_sec_col`` must be integral epoch seconds (see plans/registry for why
    sub-second precision is truncated before this point).

    Adds ``session_seq`` (1-based per key) and ``is_new_session``.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_sec_col), F.col(tiebreak_col))
    prev_ts = F.lag(ts_sec_col).over(w)
    new_sess = F.when(
        prev_ts.isNull() | ((F.col(ts_sec_col) - prev_ts) > F.lit(gap_seconds)),
        F.lit(1),
    ).otherwise(F.lit(0))
    out = df.withColumn("is_new_session", new_sess)
    cum = Window.partitionBy(*key_cols).orderBy(F.col(ts_sec_col), F.col(tiebreak_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return out.withColumn("session_seq", F.sum("is_new_session").over(cum))


def pair_start_end(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_sec_col: str,
    kind_col: str,
    start_kinds: Sequence[str],
    end_kinds: Sequence[str],
    tiebreak_col: str,
) -> DataFrame:
    """W1: pair a start event with the *next* event of the same key and keep
    only valid (start, end) keyword pairs, yielding one session row per pair.

    Parity with `etl/RunLogParser.calcVideoPlayTimeNew` (reference
    `etl/RunLogParser.scala:419-439`): ``lead(reportTime/keyword)`` over
    (userId, deviceId, URI) ordered by time, then the pair filter
    (Success → Finished).  Unmatched starts keep a null end (the nightly
    repair, `cap_session_end`, closes them).
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_sec_col), F.col(tiebreak_col))
    out = (
        df.withColumn("next_ts", F.lead(ts_sec_col).over(w))
        .withColumn("next_kind", F.lead(kind_col).over(w))
        .where(F.col(kind_col).isin(list(start_kinds)))
        .withColumn(
            "end_ts",
            F.when(F.col("next_kind").isin(list(end_kinds)), F.col("next_ts")),
        )
        .drop("next_ts", "next_kind")
    )
    return out.withColumnRenamed(ts_sec_col, "start_ts")


def cap_session_end(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    tiebreak_col: str | None = None,
    default_duration: int | None = None,
) -> DataFrame:
    """W3: cap each session's end at the next session's start of the same key.

    Parity with the repair job `etl/LogDelayPatch.scala:27-54` (and
    `etl/LogDelay.scala:68-80`): ``lead(starttime)`` over (user, device)
    ordered by starttime; ``endtime = least(endtime, next_start)``;
    ``duration = end - start`` clamped at 0.  Open sessions (null end) are
    closed at the next start, or ``start + default_duration`` when given.
    """
    order: list[Column] = [F.col(start_col)]
    if tiebreak_col:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(*key_cols).orderBy(*order)
    next_start = F.lead(start_col).over(w)
    capped = F.least(F.col(end_col), next_start)
    if default_duration is not None:
        fallback = F.coalesce(next_start, F.col(start_col) + F.lit(default_duration))
        capped = F.coalesce(capped, fallback)
    return df.withColumn(end_col, capped).withColumn(
        "duration_sec", F.greatest(F.col(end_col) - F.col(start_col), F.lit(0))
    )


def stitch_heartbeats(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_sec_col: str,
    heartbeat_interval: int,
    tiebreak_col: str,
) -> DataFrame:
    """W2/T5: collapse a chain of heartbeats into sessions; online time is
    estimated as ``n_heartbeats * heartbeat_interval`` exactly as the
    reference does (`homed/realtime/ChannelLive.scala:278`,
    `Constant.SYSTEM_HEARTBEAT_DURATION = 60`, `common/Constant.scala:34`).

    A chain breaks when the gap exceeds 2× the heartbeat interval
    (`etl/ReportLog.scala:199-232` breaks on missing heartbeat).
    Returns one row per (key, session_seq) with start/end/estimated time.
    """
    sess = sessionize_by_gap(df, key_cols, ts_sec_col, 2 * heartbeat_interval, tiebreak_col)
    return sess.groupBy(*key_cols, "session_seq").agg(
        F.min(ts_sec_col).alias("start_ts"),
        F.max(ts_sec_col).alias("end_ts"),
        F.count(F.lit(1)).alias("n_heartbeats"),
        (F.count(F.lit(1)) * heartbeat_interval).alias("online_sec"),
    )
