"""Map / JSON extension-column helpers (SURVEY §2.8).

The reference carries a dynamic ``exts map<string,string>`` column on every
fact row, built with a hand-rolled ``str_to_map`` (`utils/LogUtils.scala:
95-136`) or HiveQL ``str_to_map(concat_ws(...))`` (`etl/LogParser.scala:96`)
and read back as ``exts['K']`` (`homed/repots/SearchDetailNew.scala:78-86`).

Spark has ``str_to_map`` built in; the driver's synthetic ``events.props``
column is JSON, so both spellings are provided.  JSON extraction uses
``get_json_object`` — JVM-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def kv_string_to_map(col: Column | str, pair_sep: str = ",", kv_sep: str = " ") -> Column:
    """`"K V,K V,..."` → map<string,string> (run-log ext grammar,
    `etl/RunLogParser.scala:507-525`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.str_to_map(F.trim(c), F.lit(pair_sep), F.lit(kv_sep))


def json_get(col: Column | str, key: str) -> Column:
    """props JSON `{"k": 87}` → string value at $.key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, f"$.{key}")


def ext(col: Column | str, key: str) -> Column:
    """``exts['K']`` accessor."""
    c = F.col(col) if isinstance(col, str) else col
    return c.getItem(key)
