"""Z-order (Morton) keys for multi-dimensional data layout.

At 100 TB the cheapest scan is the one that never happens: parquet readers
prune row groups and files whose column min/max stats exclude the
predicate.  Single-column sort gives that pruning on ONE column; writing
files clustered by a Z-ORDER key gives it on SEVERAL columns at once
(Delta Lake's ``OPTIMIZE ZORDER BY``, Databricks runtime; the classic
Morton-curve layout).  This module provides the key itself as a pure
native expression — bit-interleave of range-normalized dimensions — in
both Spark and DuckDB SQL forms so layouts are oracle-checkable.

The key for dims (x, y) with b bits each: normalize each dim to
[0, 2^b) by integer range scaling, then interleave bits so that z's
high bits alternate between the dims — rows close in z are close in
EVERY dim, which is exactly what makes per-file bounding boxes small.

Everything is int64 arithmetic (b=16 → 32-bit z values): deterministic,
overflow-free, identical in every engine, and JVM-side on Spark (a chain
of shift/and/or expressions inside whole-stage codegen — no UDF).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

ZORDER_BITS = 16


def normalize_dim(
    col: Column, min_col: Column, max_col: Column, bits: int = ZORDER_BITS
) -> Column:
    """Range-scale a bigint column to [0, 2^bits) with exact integer math:
    ((col - min) * 2^bits) DIV (max - min + 1).  The numerator stays under
    2^63 for any real key domain (dom_span * 65536 < 2^63 ⇔ span < 2^47)."""
    span = max_col - min_col + F.lit(1)
    num = (col - min_col).cast("bigint") * F.lit(1 << bits)
    # floor over DOUBLE division on both engines (DuckDB `/` on ints is
    # double division too): identical IEEE ops give identical results at
    # any magnitude, which a mixed int-div-vs-float-div pairing would not
    return F.floor(num / span).cast("bigint")


def normalize_dim_sql(
    col: str, min_expr: str, max_expr: str, bits: int = ZORDER_BITS
) -> str:
    """The identical normalization as portable SQL text (same double-division
    + floor shape as the Spark side)."""
    return (
        f"cast(floor(cast((({col}) - ({min_expr})) * {1 << bits} as double)"
        f" / (({max_expr}) - ({min_expr}) + 1)) as bigint)"
    )


def zorder_key(dims: list[Column], bits: int = ZORDER_BITS) -> Column:
    """Morton interleave of N already-normalized [0, 2^bits) bigints:
    bit i of dims[d] lands at position i·N + d, so the key's high bits
    round-robin across dimensions and z-adjacent rows are close in EVERY
    dim.  N·bits must fit int64 (N=2/3/4 at 16 bits → 32/48/64-bit keys;
    64 is the signed-positive limit since bit 63 stays clear only for
    bits·N ≤ 63 — use bits=15 for N=4)."""
    n = len(dims)
    assert n * bits <= 63, "interleaved key must fit a signed int64"
    terms = []
    for i in range(bits):
        for d, col in enumerate(dims):
            terms.append(
                F.shiftleft(F.shiftright(col, i).bitwiseAND(F.lit(1)), i * n + d)
            )
    return reduce(lambda a, b: a.bitwiseOR(b), terms).cast("bigint")


def zorder_key_sql(dims: list[str], bits: int = ZORDER_BITS) -> str:
    """The identical N-dim interleave as engine-portable SQL text."""
    n = len(dims)
    terms = []
    for i in range(bits):
        for d, expr in enumerate(dims):
            terms.append(f"((({expr} >> {i}) & 1) << {i * n + d})")
    return "(" + " | ".join(terms) + ")"


def zorder_key2(x: Column, y: Column, bits: int = ZORDER_BITS) -> Column:
    """2-D Morton interleave (bit i of x at 2i, of y at 2i+1)."""
    return zorder_key([x, y], bits)


def zorder_key2_sql(x: str, y: str, bits: int = ZORDER_BITS) -> str:
    """The identical 2-D interleave as engine-portable SQL text."""
    return zorder_key_sql([x, y], bits)
