"""Time-grid bucketing (half-hour session splitting).

The reference splits each watch session into the half-hour slices it
overlaps with driver-side imperative loops (`homed/repots/ChannelReport.
process` reference `ChannelReport.scala:1466-1520`; `utils/LogUtils.
divideTime` `utils/LogUtils.scala:24-56`; `homed/repots/OnlineRate.scala:
100-120`).  Here the split is a native ``sequence() + explode`` — fully
JVM-side, whole-stage-codegen'd, no Python, no driver loops — and the
overlap seconds per slice are a closed-form expression.

At scale this is a narrow transformation (no shuffle): each session row
fans out to the handful of slices it covers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_time_grid(
    df: DataFrame,
    start_col: str,
    end_col: str,
    slot_seconds: int = 1800,
    slot_col: str = "slot_start",
    overlap_col: str = "overlap_sec",
) -> DataFrame:
    """Fan a [start, end) interval (epoch seconds) out to every
    ``slot_seconds`` bucket it overlaps, with the overlap length per bucket.

    overlap = min(end, slot_end) - max(start, slot_start), clamped ≥ 0;
    zero-length sessions still land in their start slot with overlap 0
    (parity with the reference keeping zero-playtime rows until a later
    filter, `etl/LogParser.scala` playtime>0 filters are applied by callers).
    """
    s, e = F.col(start_col), F.col(end_col)
    first_slot = (s / slot_seconds).cast("long") * slot_seconds
    # end is exclusive: a session ending exactly on a boundary does not
    # occupy the next slot (matches divideTime's [start, end) slices).
    last_slot = ((F.greatest(e - 1, s)) / slot_seconds).cast("long") * slot_seconds
    out = df.withColumn(
        slot_col,
        F.explode(F.sequence(first_slot, last_slot, F.lit(slot_seconds))),
    )
    slot_end = F.col(slot_col) + slot_seconds
    overlap = F.least(e, slot_end) - F.greatest(s, F.col(slot_col))
    return out.withColumn(overlap_col, F.greatest(overlap, F.lit(0)))
