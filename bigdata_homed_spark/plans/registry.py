"""Query registry: every implemented operator as a (Spark fn, oracle SQL) pair.

Each entry is one operator family from SURVEY §2 (or a training-data-pipeline
operator), expressed twice:

- a PySpark callable ``(spark, sf_dir) -> DataFrame`` — the engine;
- an ANSI-SQL string DuckDB runs over the same parquet — the oracle.

The driver hash-compares both at sf=0.01, sorting columns by name, so both
sides alias every computed column identically.

Cross-engine determinism rules (learned empirically, enforced throughout):

1. **Sums of doubles are order-dependent** → every double aggregate goes
   through ``cast(decimal(27,6))`` per row, exact decimal sum, then one cast
   back to double.  Identical bits on both engines, any row order.
2. **events.ts is nanosecond-precision**; Spark truncates to µs, DuckDB
   keeps ns → all time logic uses integral epoch *seconds*
   (``ts div 1e9`` / ``epoch_us(ts)//1000000``).
3. **Ties**: every window/order has a unique tiebreaker column.
4. **Counts** are bigint on both sides; DuckDB ``sum(bigint)`` returns
   hugeint → always cast back to bigint in the oracle.
5. **Hashes** are md5-derived (functions/hashing.py) — identical in every
   engine, unlike murmur3 (`hash()`), which differs between Spark and DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# importing the query modules populates the registry
from . import core_relational  # noqa: E402,F401
from . import homed_behavior  # noqa: E402,F401
from . import text_pipeline  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import streaming_queries  # noqa: E402,F401
from . import multimodal_queries  # noqa: E402,F401
from . import lifecycle  # noqa: E402,F401
from . import etl_queries  # noqa: E402,F401
from . import report_queries  # noqa: E402,F401
from . import report_families  # noqa: E402,F401
from . import window_frames  # noqa: E402,F401
from . import rank_lifecycle  # noqa: E402,F401
from . import curation  # noqa: E402,F401
from . import asof_subqueries  # noqa: E402,F401
from . import analysis_queries  # noqa: E402,F401
from . import parity_extras  # noqa: E402,F401
