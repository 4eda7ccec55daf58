"""Set operations (SURVEY §2.7 U1-U3, J10).

The reference splits event classes with ``cacheDF.except(videoPlayDF)``
(`etl/LogParser.scala:119-120`, 12 sites) — an O(full-shuffle-distinct)
operation.  ``split_by_predicate`` replaces it with two complementary
filters over one cached scan (no shuffle at all), and ``anti_join`` is the
keyed spelling when the complement is defined by another table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_by_predicate(df: DataFrame, pred: Column) -> tuple[DataFrame, DataFrame]:
    """J10/U2 done right: complementary filters instead of ``except``.
    Null predicate rows go to the second (non-matching) branch, matching
    ``except`` semantics on the reference's non-null keys."""
    return df.where(pred), df.where(~F.coalesce(pred, F.lit(False)))


def anti_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """U2 keyed complement as a left_anti join (broadcastable, no distinct
    shuffle like ``except``)."""
    return left.join(right, list(on), "left_anti")


def union_grains(frames: Sequence[DataFrame]) -> DataFrame:
    """U1: position-safe union of report grains (the reference's 88
    ``unionAll`` sites rely on column position; ``unionByName`` is used so a
    reordered projection can't silently corrupt a report)."""
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
