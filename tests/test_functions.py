"""Unit tests for scalar/hash/text functions and multimodal plumbing."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from bigdata_homed_spark.functions.hashing import (
    hash64,
    hash64_sql,
    hyperplane_weights,
    minhash_signature,
    shingle_hashes,
    xor_keys,
)
from bigdata_homed_spark.functions.maps import ext, json_get, kv_string_to_map
from bigdata_homed_spark.functions.multimodal import attach_binary_payload, decode_features
from bigdata_homed_spark.functions.text import (
    fingerprint,
    lang_guess,
    quality_score,
    token_count,
    tokens,
    word_shingles,
)


def test_hash64_matches_python_md5(spark):
    df = spark.createDataFrame([("hello",), ("",), ("Ω unicode",)], ["s"])
    got = {r.s: r.h for r in df.select("s", hash64("s", 7).alias("h")).collect()}
    for s in got:
        expect = int(hashlib.md5(("7" + s).encode()).hexdigest()[:15], 16)
        assert got[s] == expect


def test_hash64_sql_matches_spark(spark):
    import duckdb

    df = spark.createDataFrame([("abc",)], ["s"])
    spark_v = df.select(hash64("s", "x").alias("h")).collect()[0].h
    duck_v = duckdb.sql(f"select {hash64_sql(chr(39) + 'abc' + chr(39), 'x')}").fetchone()[0]
    assert spark_v == duck_v


def test_minhash_signature_properties(spark):
    df = spark.createDataFrame([(["a b c", "b c d"],), (["a b c", "b c d"],)], ["sh"])
    out = df.withColumn("hs", shingle_hashes(F.col("sh"))).select(
        minhash_signature(F.col("hs"), 4).alias("sig")
    ).collect()
    assert out[0].sig == out[1].sig  # deterministic
    assert len(out[0].sig) == 4
    assert len(set(out[0].sig)) > 1  # XOR keys actually vary the permutation
    keys = xor_keys(4)
    assert len(set(keys)) == 4


def test_hyperplane_weights_deterministic():
    a = hyperplane_weights(2, 8)
    b = hyperplane_weights(2, 8)
    assert a == b
    assert all(w in (1.0, -1.0) for row in a for w in row)
    assert hyperplane_weights(2, 8, seed_offset=100) != a


def test_ann_planes_rule():
    """planes = max(6, ceil(log2(n/32))): floor pins oracle SFs, growth is
    logarithmic so occupancy (n/2^p) stays ~32 at any corpus size."""
    from bigdata_homed_spark.plans.similarity import ann_planes_for

    # every oracle-checked SF (500-2 000 vectors) must get the floor — the
    # static SQL oracles hash with exactly 6 planes
    assert ann_planes_for(500) == 6
    assert ann_planes_for(2000) == 6
    assert ann_planes_for(20000) == 10
    # occupancy bound: n / 2^p <= 32 once past the floor
    for n in (10**5, 10**7, 10**10):
        p = ann_planes_for(n)
        assert n / (1 << p) <= 32
        assert n / (1 << (p - 1)) > 32  # and p is minimal


def test_semdedup_k_rule():
    """K = max(8, ceil(n/256)): floor pins oracle SFs (static SQL oracle
    clusters with exactly 8 seeds), growth holds per-cluster occupancy —
    and hence the within-cluster pair join's Σ|c|² work — linear in n."""
    from bigdata_homed_spark.plans.similarity import semdedup_k_for

    assert semdedup_k_for(500) == 8
    assert semdedup_k_for(2000) == 8  # sf0.1 stays on the oracle floor
    assert semdedup_k_for(20000) == 79  # sf1 scales past it
    for n in (10**5, 10**7, 10**10):
        k = semdedup_k_for(n)
        assert n / k <= 256  # occupancy bound → pair work n·256, not n²/8
        assert (n + 255) // 256 == k  # and K is minimal past the floor


def test_pq_train_mod_rule():
    """mod = max(1, n//512): full-corpus training at oracle-pinned small
    SFs, ~512-row deterministic hash-sample at any larger corpus (the
    oracle applies the identical rule in SQL, so sampling stays exact)."""
    from bigdata_homed_spark.plans.similarity import pq_train_mod_for

    assert pq_train_mod_for(500) == 1  # sf0.001/sf0.01: bit-identical path
    assert pq_train_mod_for(2000) == 3  # sf0.1 trains on the mod-3 sample
    for n in (10**5, 10**7, 10**10):
        m = pq_train_mod_for(n)
        assert 512 <= n / m < 1024  # expected sample size stays ~target


def test_tokens_and_shingles(spark):
    df = spark.createDataFrame([("The quick, QUICK fox!",)], ["text"])
    r = df.select(
        tokens("text").alias("t"),
        token_count("text").alias("n"),
        word_shingles("text", 2).alias("sh"),
        fingerprint("text").alias("fp"),
    ).collect()[0]
    assert r.t == ["the", "quick", "quick", "fox"]
    assert r.n == 4
    assert set(r.sh) == {"the quick", "quick quick", "quick fox"}
    # fingerprint is order/dup-insensitive
    df2 = spark.createDataFrame([("fox quick the",)], ["text"])
    fp2 = df2.select(fingerprint("text").alias("fp")).collect()[0].fp
    assert r.fp == fp2


def test_quality_and_lang(spark):
    good = "the cat sat on the mat and it was a good day for all of the cats"
    bad = "x9 !!! ??? @@@@ zz"
    df = spark.createDataFrame([(good,), (bad,)], ["text"])
    rows = df.select(
        "text", quality_score("text").alias("q"), lang_guess("text").alias("lg")
    ).collect()
    by = {r.text: r for r in rows}
    assert by[good].q > by[bad].q
    assert by[good].lg == "en"
    assert by[bad].lg == "other"


def test_maps(spark):
    df = spark.createDataFrame([("DA 5,DeviceId 9", '{"k": 3}')], ["kv", "js"])
    r = df.select(
        kv_string_to_map("kv", ",", " ").alias("m"), json_get("js", "k").alias("k")
    ).select(ext("m", "DA").alias("da"), "k").collect()[0]
    assert r.da == "5" and r.k == "3"


def test_multimodal_plumbing(spark):
    df = spark.createDataFrame([(1, "hello world")], ["doc_id", "text"])
    out = decode_features(attach_binary_payload(df)).collect()[0]
    assert out.payload_bytes == 11
    assert out.header_hex == "68656c6c"  # 'hell'
    assert out.n_frames == 11 % 7


def test_rag_chunking_covers_every_token(spark, sf_dir):
    """No token may fall outside every chunk (the original start-bound
    dropped up to stride-1 trailing tokens per doc)."""
    from pyspark.sql import functions as F

    from bigdata_homed_spark.functions.text import tokens
    from bigdata_homed_spark.plans.registry import QUERIES
    from bigdata_homed_spark.sources.tables import load_table

    chunks = QUERIES["rag_chunking"](spark, sf_dir)
    covered = chunks.groupBy("doc_id").agg(
        F.max(F.col("chunk_idx") * 48 + F.col("n_chunk_tokens")).alias("covered")
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens("text")).alias("n")
    )
    bad = docs.join(covered, "doc_id").where(F.col("covered") < F.col("n"))
    assert bad.count() == 0, bad.limit(5).collect()


def test_hdr_bucket_invariants_and_engine_parity(spark):
    """HDR log-linear bucket properties, fuzzed: for every fixed-point
    value v >= 1 the bucket lower bound satisfies lower <= v (estimates
    never overshoot), the relative-error contract (v - lower) * 2^p <=
    lower (error <= 2^-p of the true value), and bucket/lower are
    monotone in v (the cumulative quantile walk depends on it).  A Spark
    evaluation of the shared SQL expressions must match the Python
    mirror bit-for-bit (the expressions are the cross-engine contract —
    DuckDB runs the identical strings in the oracle)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bigdata_homed_spark.plans.analysis_queries import HDR_P_BITS, _HDR_B

    p = HDR_P_BITS

    def mirror(v: int) -> tuple[int, int]:
        e = v.bit_length()
        if e <= p + 1:
            return v, v
        sub = v >> (e - p - 1)
        return e * (2 ** (p + 1)) + sub, sub << (e - p - 1)

    @settings(max_examples=300, deadline=None)
    @given(v=st.integers(1, 1 << 52))
    def props(v):
        b, lo = mirror(v)
        assert lo <= v
        assert (v - lo) * (2 ** p) <= lo
        b2, lo2 = mirror(v + 1)
        assert b2 >= b and lo2 >= lo

    props()

    import random

    rnd = random.Random(42)
    sample = sorted({rnd.randint(1, 1 << 52) for _ in range(500)} | {1, 2, 63, 64, 65, (1 << 52) - 1})
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(v,) for v in sample], "v long").select(
        "v",
        F.expr(_HDR_B["bucket"]).alias("b"),
        F.expr(_HDR_B["lower"]).alias("lo"),
    )
    for r in df.collect():
        b, lo = mirror(r["v"])
        assert (r["b"], r["lo"]) == (b, lo), r["v"]
