"""Portable deterministic hashing.

Every hash used by the dedup/similarity operators is derived from MD5 so the
exact same value is computable in any engine (Spark, DuckDB, Python) — this
is what lets the MinHash/SimHash pipelines be verified bit-for-bit against a
SQL oracle, and it replaces the reference's *nondeterministic* helpers (the
``random_column`` UDF, `etl/RunLogParser.scala:348-355`) with seedable ones
(SURVEY §4 "custom work" item 1).

``hash64(col, seed)`` = first 15 hex chars of md5(seed || col) as a bigint
(60 bits, always positive, fits bigint exactly in every engine).

Cost note: md5 is ~3× slower than murmur3, but these hashes sit in
column-pruned, shuffle-free projection stages; at 100 TB the scan and the
LSH shuffle dominate, not the digest.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_BITS = 60


def hash64(col: Column | str, seed: int | str = "") -> Column:
    """60-bit portable hash of a string column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    salted = F.concat(F.lit(str(seed)), c.cast("string"))
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("bigint")


def hash64_sql(expr: str, seed: int | str = "") -> str:
    """The same 60-bit hash in ANSI/DuckDB SQL (oracle side)."""
    return f"cast(('0x' || substr(md5('{seed}' || {expr}), 1, 15)) as bigint)"


def hyperplane_weights(n_planes: int, dims: int, seed_offset: int = 0) -> list[list[float]]:
    """Deterministic ±1 random-hyperplane weights for sign-LSH, derived from
    the same md5 scheme as :func:`hash64` so any engine (or plain Python, as
    here) reproduces them exactly.  weight[h][d] = +1 if the low bit of
    hash64(f"{seed_offset+h}_{d+1}") is set else -1.  ``seed_offset`` yields
    independent hash tables for multi-probe LSH."""
    import hashlib

    out: list[list[float]] = []
    for h in range(n_planes):
        row = []
        for d in range(1, dims + 1):
            v = int(hashlib.md5(f"{seed_offset + h}_{d}".encode()).hexdigest()[:15], 16)
            row.append(1.0 if v & 1 else -1.0)
        out.append(row)
    return out


def xor_keys(num_hashes: int) -> list[int]:
    """60-bit XOR-permutation keys, derived via the same md5 scheme so any
    engine/Python reproduces them: K_i = hash64(f"minhash_key_{i}")."""
    import hashlib

    return [
        int(hashlib.md5(f"minhash_key_{i}".encode()).hexdigest()[:15], 16)
        for i in range(num_hashes)
    ]


def shingle_hashes(shingles: Column) -> Column:
    """Base 60-bit hash per shingle — materialize this ONCE as a column
    before fanning out to per-key minima (Catalyst does not reliably CSE
    repeated higher-order subexpressions, and md5 is the dominant cost)."""
    return F.transform(
        shingles,
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint"),
    )


def minhash_signature(hashes: Column, num_hashes: int) -> Column:
    """MinHash signature from pre-hashed shingles (see
    :func:`shingle_hashes`): array of ``num_hashes`` minima under XOR-key
    permutations (x ↦ x ⊕ K_i is a bijection on [0, 2^60), so each key
    yields a valid independent-enough min-wise hash).  Entirely built-in
    higher-order functions — JVM-side, no UDF; digest cost is 1/num_hashes
    of a seeded-md5-per-hash scheme."""
    def perm(key: int):
        # NB: the lambda must be unary — PySpark passes (element, index) to
        # binary lambdas, so a `k=k` default arg would be silently overwritten
        return lambda h: h.bitwiseXOR(F.lit(key))

    sigs = [F.array_min(F.transform(hashes, perm(k))) for k in xor_keys(num_hashes)]
    return F.array(*sigs)
