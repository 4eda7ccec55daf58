"""Unit tests for the operator library on small inline frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_homed_spark.operators.aggregate import (
    keep_latest,
    multi_grain_rollup,
    tier_counts,
    top_n_per_group,
)
from bigdata_homed_spark.operators.enrich import (
    bucketed_interval_join,
    interval_join,
    normalize_join_key,
)
from bigdata_homed_spark.operators.sessionize import (
    cap_session_end,
    pair_start_end,
    sessionize_by_gap,
    stitch_heartbeats,
)
from bigdata_homed_spark.operators.setops import anti_join, split_by_predicate, union_grains
from bigdata_homed_spark.operators.timegrid import explode_time_grid


def test_sessionize_by_gap(spark):
    df = spark.createDataFrame(
        [("u1", 0, 1), ("u1", 100, 2), ("u1", 2000, 3), ("u2", 50, 4)],
        ["user", "sec", "id"],
    )
    out = sessionize_by_gap(df, ["user"], "sec", 1000, "id").collect()
    sess = {(r.user, r.sec): r.session_seq for r in out}
    assert sess[("u1", 0)] == 1
    assert sess[("u1", 100)] == 1
    assert sess[("u1", 2000)] == 2  # gap 1900 > 1000
    assert sess[("u2", 50)] == 1


def test_pair_start_end(spark):
    df = spark.createDataFrame(
        [
            ("u1", 0, "Success", 1),
            ("u1", 60, "Finished", 2),
            ("u1", 120, "Success", 3),
            ("u1", 130, "Success", 4),  # unmatched start (next is a start)
            ("u1", 200, "Finished", 5),
        ],
        ["user", "sec", "kind", "id"],
    )
    out = pair_start_end(df, ["user"], "sec", "kind", ["Success"], ["Finished"], "id")
    rows = {r.start_ts: r.end_ts for r in out.collect()}
    assert rows[0] == 60
    assert rows[120] is None  # next event was another Success
    assert rows[130] == 200


def test_cap_session_end(spark):
    df = spark.createDataFrame(
        [("u1", 0, 500, 1), ("u1", 100, 900, 2), ("u1", 1000, None, 3)],
        "user string, start_ts long, end_ts long, id long",
    )
    out = cap_session_end(df, ["user"], "start_ts", "end_ts", "id", default_duration=60)
    rows = {r.start_ts: (r.end_ts, r.duration_sec) for r in out.collect()}
    assert rows[0] == (100, 100)  # capped at next start (LogDelayPatch semantics)
    assert rows[100] == (900, 800)  # untouched
    assert rows[1000] == (1060, 60)  # open session closed by default duration


def test_stitch_heartbeats(spark):
    # 3 heartbeats 60s apart, then a 500s gap, then 1 more (interval=60 → break at >120)
    df = spark.createDataFrame(
        [("u1", 0, 1), ("u1", 60, 2), ("u1", 120, 3), ("u1", 620, 4)],
        ["user", "sec", "id"],
    )
    out = stitch_heartbeats(df, ["user"], "sec", 60, "id").orderBy("session_seq").collect()
    assert len(out) == 2
    assert out[0].n_heartbeats == 3 and out[0].online_sec == 180
    assert out[1].n_heartbeats == 1 and out[1].online_sec == 60


def test_explode_time_grid(spark):
    df = spark.createDataFrame([(1700, 3700, 1)], "s long, e long, id long")
    out = explode_time_grid(df, "s", "e", 1800).orderBy("slot_start").collect()
    assert [(r.slot_start, r.overlap_sec) for r in out] == [(0, 100), (1800, 1800), (3600, 100)]
    # boundary-exclusive end: session ending exactly at 3600 stays out of slot 3600
    df2 = spark.createDataFrame([(1700, 3600, 1)], "s long, e long, id long")
    out2 = explode_time_grid(df2, "s", "e", 1800).orderBy("slot_start").collect()
    assert [(r.slot_start, r.overlap_sec) for r in out2] == [(0, 100), (1800, 1800)]
    # zero-length session lands in its slot with overlap 0
    df3 = spark.createDataFrame([(100, 100, 1)], "s long, e long, id long")
    out3 = explode_time_grid(df3, "s", "e", 1800).collect()
    assert [(r.slot_start, r.overlap_sec) for r in out3] == [(0, 0)]


def test_interval_join(spark):
    left = spark.createDataFrame([(1, 5), (1, 100), (2, 5)], "k long, t long")
    right = spark.createDataFrame([(1, 0, 10, "a"), (1, 90, 110, "b")], "k long, lo long, hi long, tag string")
    out = interval_join(left, right, [("k", "k")], "t", "lo", "hi").select("t", "tag").collect()
    assert sorted((r.t, r.tag) for r in out) == [(5, "a"), (100, "b")]


def test_bucketed_interval_join(spark):
    left = spark.createDataFrame([(5,), (100,), (2500,)], "t long")
    right = spark.createDataFrame([(0, 10, "a"), (90, 2600, "b")], "lo long, hi long, tag string")
    out = bucketed_interval_join(left, right, "t", "lo", "hi", bucket_width=1000)
    got = sorted((r.t, r.tag) for r in out.select("t", "tag").collect())
    assert got == [(5, "a"), (100, "b"), (2500, "b")]


def test_salted_join_matches_plain_join(spark):
    from bigdata_homed_spark.operators.enrich import salted_join

    # one pathologically hot key
    left = spark.createDataFrame(
        [(1, i) for i in range(50)] + [(2, 100), (3, 101)], ["k", "row_id"]
    )
    right = spark.createDataFrame([(1, "a"), (2, "b"), (4, "d")], ["rk", "tag"])
    plain = left.join(right, left["k"] == right["rk"], "inner").select("k", "row_id", "tag")
    salted = salted_join(left, right, "k", "rk", "row_id", salt_buckets=4).select(
        "k", "row_id", "tag"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # the hot key really is spread across salt buckets
    from pyspark.sql import functions as F

    spread = (
        left.withColumn("__salt", (F.crc32(F.col("row_id").cast("string")) % 4).cast("int"))
        .where(F.col("k") == 1)
        .select("__salt")
        .distinct()
        .count()
    )
    assert spread > 1


def test_normalize_join_key(spark):
    df = spark.createDataFrame([("340000",), ("340100",), ("340104",), ("12",)], ["code"])
    out = {r.code: r.fixed for r in normalize_join_key(df, "code", "fixed").collect()}
    assert out["340000"] == "340101"  # province → +101
    assert out["340100"] == "340101"  # city → +1
    assert out["340104"] == "340104"  # concrete area unchanged
    assert out["12"] is None  # malformed


def test_keep_latest_and_topn(spark):
    df = spark.createDataFrame(
        [("u1", 10, 1, 5.0), ("u1", 20, 2, 7.0), ("u1", 20, 3, 9.0), ("u2", 5, 4, 1.0)],
        ["k", "ts", "id", "v"],
    )
    latest = {r.k: r.id for r in keep_latest(df, ["k"], "ts", "id").collect()}
    assert latest == {"u1": 3, "u2": 4}  # tie on ts=20 broken by id desc
    top = top_n_per_group(df, ["k"], [F.col("v").desc()], 2, dense=False)
    assert sorted(r.id for r in top.where(F.col("k") == "u1").collect()) == [2, 3]


def test_multi_grain_rollup(spark):
    df = spark.createDataFrame(
        [("east", "a", 1), ("east", "b", 2), ("west", "c", 4)], ["prov", "city", "v"]
    )
    out = multi_grain_rollup(df, ["prov", "city"], [F.sum("v").alias("v")])
    rows = {(r.prov, r.city): r.v for r in out.collect()}
    assert rows[("east", "a")] == 1
    assert rows[("east", "-1")] == 3  # city rolled up
    assert rows[("-1", "-1")] == 7  # grand total


def test_tier_counts(spark):
    df = spark.createDataFrame([("g", 1), ("g", 5), ("g", 50)], ["k", "v"])
    out = tier_counts(
        df, ["k"], F.col("v"), [("low", F.col("v") < 10), ("high", F.col("v") >= 10)]
    ).collect()[0]
    assert out.low == 2 and out.high == 1


def test_setops(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, None)], ["id", "t"])
    yes, no = split_by_predicate(df, F.col("t") == "a")
    assert [r.id for r in yes.collect()] == [1]
    assert sorted(r.id for r in no.collect()) == [2, 3]  # null predicate → complement
    right = spark.createDataFrame([(2,)], ["id"])
    assert sorted(r.id for r in anti_join(df, right, ["id"]).collect()) == [1, 3]
    u = union_grains([df.select("id"), right])
    assert u.count() == 4


def test_bitmap_distinct_exact_and_mergeable(spark):
    """The bitmap trio must (a) match COUNT(DISTINCT) exactly per group and
    (b) stay exact after OR-merging to a coarser grain — the property that
    makes the day-grain index reusable for week/month without rescanning
    (HLL gives (b) but only approximately)."""
    from bigdata_homed_spark.operators.aggregate import (
        bitmap_build,
        bitmap_distinct_count,
        bitmap_merge,
    )

    # ids straddle several 32k bitmap buckets; users repeat across days
    df = spark.range(0, 5000).selectExpr(
        "id % 14 as day_num", "(id * 37) % 90000 as user_id"
    )
    bm = bitmap_build(df, ["day_num"], "user_id")
    got = {
        r.day_num: r.n_distinct
        for r in bitmap_distinct_count(bm, ["day_num"]).collect()
    }
    want = {
        r.day_num: r.n
        for r in df.groupBy("day_num")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want

    weekly = bitmap_merge(bm.withColumn("week", F.expr("day_num div 7")), ["week"])
    got_w = {
        r.week: r.n_distinct
        for r in bitmap_distinct_count(weekly, ["week"]).collect()
    }
    want_w = {
        r.week: r.n
        for r in df.withColumn("week", F.expr("day_num div 7"))
        .groupBy("week")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got_w == want_w


def test_kmeans_iteration_reduces_inertia(spark, sf_dir):
    """Lloyd's algorithm invariant: total within-cluster squared distance
    must not increase from the seed assignment to the post-update
    assignment (the property that makes the iteration converge)."""
    from pyspark.sql import functions as F

    from bigdata_homed_spark.plans.similarity import (
        K_CLUSTERS,
        _kmeans_assign,
        _kmeans_update,
    )
    from bigdata_homed_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent0 = emb.where(F.col("vec_id") < K_CLUSTERS).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    a1 = _kmeans_assign(emb, cent0)
    inertia1 = a1.agg(F.sum("dist")).collect()[0][0]
    a2 = _kmeans_assign(emb, _kmeans_update(a1))
    inertia2 = a2.agg(F.sum("dist")).collect()[0][0]
    assert inertia2 <= inertia1 + 1e-9, (inertia1, inertia2)
    # and every vector is assigned exactly once
    assert a2.count() == emb.count()


def test_kmeans_coarse_assignment_covers_all_vectors(spark, sf_dir):
    """The IVF coarse-quantized assignment path (k > K_CLUSTERS): every
    vector must still be assigned to exactly one centroid (every probed
    cell is non-empty — seed j's own centroid lands in cell j at distance
    0), assignments must point at real centroids, and each vector's dist
    must never beat the true exact-argmin distance (it probes a centroid
    subset, so dist >= exact dist, with equality for most vectors)."""
    from pyspark.sql import functions as F

    from bigdata_homed_spark.plans.similarity import (
        K_CLUSTERS,
        _kmeans_assign,
        kmeans_coarse_cells_for,
    )
    from bigdata_homed_spark.sources.tables import load_table

    assert kmeans_coarse_cells_for(K_CLUSTERS) == 1
    assert kmeans_coarse_cells_for(79) == 9  # ceil(sqrt(79)) — the sf1 k
    assert kmeans_coarse_cells_for(4 * 10**7) == 6325  # flat at corpus scale

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    k = 20  # > K_CLUSTERS so the coarse path activates on this fixture
    cent0 = emb.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    coarse = _kmeans_assign(emb, cent0, k).withColumnRenamed("dist", "cdist")
    exact = _kmeans_assign(emb, cent0).select("vec_id", "dist")
    n = emb.count()
    assert coarse.count() == n
    assert coarse.select("vec_id").distinct().count() == n
    assert coarse.select("cid").distinct().join(
        cent0.select("cid"), "cid", "left_anti"
    ).count() == 0
    worse = coarse.join(exact, "vec_id").where(
        F.col("cdist") < F.col("dist") - 1e-9
    )
    assert worse.count() == 0


def test_approx_percentile_tolerance(spark, sf_dir):
    """value_percentiles_approx now RETURNS its rank-error assertion (the
    oracle gate hash-verifies it); this pins the same contract in pytest:
    every per-type p50/p90/p99 sketch lands inside the exact q∓0.02 band,
    and the row set matches the exact query's."""
    from bigdata_homed_spark.plans.lifecycle import (
        value_percentiles,
        value_percentiles_approx,
    )

    approx = {r["event_type"]: r for r in value_percentiles_approx(spark, sf_dir).collect()}
    exact = {r["event_type"]: r for r in value_percentiles(spark, sf_dir).collect()}
    assert exact.keys() == approx.keys()
    for et, a in approx.items():
        for c in ("p50_ok", "p90_ok", "p99_ok"):
            assert a[c] is True, (et, c)


def test_label_top_direction(spark, sf_dir):
    """The applyInPandas power iteration must (a) return unit vectors,
    (b) be deterministic, and (c) align with numpy's exact top eigenvector
    of X^T X per label."""
    import numpy as np

    from bigdata_homed_spark.plans.similarity import (
        label_top_direction,
        label_top_direction_frame,
    )
    from bigdata_homed_spark.sources.tables import load_table

    # the registry query returns certified invariants — all must hold
    cert = label_top_direction(spark, sf_dir).collect()
    assert all(r["unit_norm_ok"] and r["eigvec_residual_ok"] for r in cert)

    # the weight-emitting frame keeps the full numeric contract
    def run():
        return label_top_direction_frame(
            load_table(spark, sf_dir, "embeddings")
        ).collect()

    out = run()
    by_label: dict[int, dict[int, float]] = {}
    for r in out:
        by_label.setdefault(r["label"], {})[r["dim"]] = r["weight"]

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    vecs: dict[int, list] = {}
    for r in emb:
        vecs.setdefault(r["label"], []).append(r["embedding"])

    assert set(by_label) == set(vecs)
    for label, wd in by_label.items():
        v = np.array([wd[i] for i in sorted(wd)])
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9
        x = np.array(vecs[label], dtype=np.float64)
        evals, evecs = np.linalg.eigh(x.T @ x)
        top = evecs[:, -1]
        assert abs(abs(top @ v) - 1.0) < 1e-3, (label, abs(top @ v))

    again = run()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_global_top_k_matches_window_ranking(spark):
    """Property: global_top_k (distributed TakeOrdered + k-row rank) must
    equal the naive partition-less row_number window it replaced, for any
    data and k — including ties in the value column (broken by id)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bigdata_homed_spark.operators.aggregate import global_top_k

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        vals=st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=30),
        k=st.integers(min_value=1, max_value=10),
    )
    def run(vals, k):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], ["id", "v"]
        )
        order = [F.col("v").desc(), F.col("id").asc()]
        got = {
            (r.id, r.v, r.rnk)
            for r in global_top_k(df, order, k).collect()
        }
        w = Window.orderBy(*order)
        want = {
            (r.id, r.v, r.rnk)
            for r in df.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .collect()
        }
        assert got == want

    run()


def test_pq_search_recall_vs_brute_force(spark, sf_dir):
    """PQ is an approximation — pin its quality: at 128:1 compression
    (64 float32 dims -> 4×5-bit codes) with 100 ADC candidates, at least
    60% of the exhaustive top-5 must appear in the PQ top-10 (measured
    72-78% at sf0.001/sf0.01)."""
    from bigdata_homed_spark.plans import QUERIES

    exact = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["embedding_knn"](spark, sf_dir).collect()
    }
    pq = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["embedding_pq_search"](spark, sf_dir).collect()
    }
    recall = len(exact & pq) / len(exact)
    assert recall >= 0.6, f"PQ recall {recall:.2f} < 0.6"


def test_ivf_pq_search_recall_and_subset(spark, sf_dir):
    """IVFADC prunes the flat PQ scan to the probed inverted lists, so (a)
    every IVF-PQ hit must also rank in the flat PQ scan's candidate order
    domain — same codebook, same ADC math — and (b) pruning 12/16 lists
    may cost recall but must keep at least half the exhaustive top-5
    (measured ≥0.6 at sf0.001/sf0.01; the floor leaves headroom for other
    corpora)."""
    from bigdata_homed_spark.plans import QUERIES

    exact = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["embedding_knn"](spark, sf_dir).collect()
    }
    ivfpq_rows = QUERIES["embedding_ivf_pq_search"](spark, sf_dir).collect()
    ivfpq = {(r.query_id, r.neighbor_id) for r in ivfpq_rows}
    recall = len(exact & ivfpq) / len(exact)
    assert recall >= 0.5, f"IVF-PQ recall {recall:.2f} < 0.5"
    # the probed scan is a strict subset of the corpus: per query it can
    # return at most top-k rows and every approx_rank is within the cut
    assert all(1 <= r.approx_rank <= 100 for r in ivfpq_rows)
    by_q = {}
    for r in ivfpq_rows:
        by_q.setdefault(r.query_id, []).append(r.rnk)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())


def test_bounded_collect_guard(spark):
    """Driver-side collects are allowed only under an explicit bound: past
    it the helper must fail loudly (with the bound in the message) instead
    of pulling an unbounded frame onto the driver."""
    import pytest as _pytest

    from bigdata_homed_spark.operators.aggregate import bounded_collect

    df = spark.range(10).selectExpr("id AS v")
    rows = bounded_collect(df.orderBy("v"), 10, "ten rows")
    assert [r["v"] for r in rows] == list(range(10))

    with _pytest.raises(AssertionError, match="bound of 5 rows"):
        bounded_collect(df, 5, "ten rows")


def test_pq_code_banding_pigeonhole_complete(spark, sf_dir):
    """Leave-one-out code banding must find EXACTLY the pairs agreeing on
    >=3 of 4 PQ subcodes (pigeonhole: at most one differing code implies a
    shared 3-subcode band) — verified against a brute-force O(n^2) scan of
    the same codes in Python."""
    from itertools import combinations

    from bigdata_homed_spark.plans import QUERIES
    from bigdata_homed_spark.plans.similarity import _pq_model

    _, _, _, codes_w = _pq_model(spark, sf_dir)
    codes = {r["vec_id"]: (r["c0"], r["c1"], r["c2"], r["c3"]) for r in codes_w.collect()}
    expected = {
        (a, b)
        for a, b in combinations(sorted(codes), 2)
        if sum(x == y for x, y in zip(codes[a], codes[b])) >= 3
    }
    rows = QUERIES["pq_code_block_dedup"](spark, sf_dir).collect()
    got = {(r["a_id"], r["b_id"]) for r in rows}
    assert got == expected
    assert all(r["n_code_agree"] >= 3 for r in rows)


def test_mmr_matches_python_reference(spark, tmp_path):
    """mmr_diverse_topk vs a from-scratch greedy MMR in plain Python: same
    left-to-right double folds, same argmax rule (mmr desc, vec_id asc),
    same empty-set convention (maxsim=0 on round 1).  The fixture plants a
    redundant cluster aligned with the query so relevance-only ranking and
    MMR visibly diverge, plus an exact duplicate pair to pin the
    tie-break."""
    import math

    import numpy as np

    from bigdata_homed_spark.plans.similarity import (
        MMR_CANDIDATES,
        MMR_K,
        MMR_LAM,
        MMR_MU,
        mmr_diverse_topk,
    )

    raw = [
        (0, [1.0, 0.0, 0.0]),   # the query
        (1, [0.99, 0.1, 0.0]),  # redundant cluster aligned with q
        (2, [0.98, 0.12, 0.01]),
        (3, [0.97, 0.14, 0.02]),
        (4, [0.6, 0.8, 0.0]),   # diverse, mid relevance
        (5, [0.6, 0.0, 0.8]),   # diverse, mid relevance
        (6, [0.1, 0.9, 0.4]),   # low relevance
        (7, [0.5, 0.5, 0.7]),
        (8, [0.97, 0.14, 0.02]),  # exact duplicate of 3: tie -> lower id
    ]
    vecs = {i: [float(np.float32(x)) for x in v] for i, v in raw}
    spark.createDataFrame(
        [(i, v, 0) for i, v in vecs.items()],
        "vec_id bigint, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def cos(a, b):
        return dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

    q = vecs[0]
    cand = sorted(
        ((i, cos(v, q), v) for i, v in vecs.items() if i != 0),
        key=lambda t: (-t[1], t[0]),
    )[:MMR_CANDIDATES]
    sel, expected = [], []
    for r in range(1, MMR_K + 1):
        best = None
        for i, rel, v in cand:
            if any(i == s[0] for s in sel):
                continue
            ms = max((cos(v, sv) for _, sv in sel), default=0.0)
            mmr = MMR_LAM * rel - MMR_MU * ms
            key = (-mmr, i)
            if best is None or key < best[0]:
                best = (key, (i, rel, ms, mmr, v))
        i, rel, ms, mmr, v = best[1]
        sel.append((i, v))
        expected.append((r, i, round(rel, 6), round(ms, 6), round(mmr, 6)))

    got = [
        (r.rnk, r.vec_id, r.rel_r, r.maxsim_r, r.mmr_r)
        for r in mmr_diverse_topk(spark, str(tmp_path)).collect()
    ]
    assert got == expected
    # MMR must diverge from pure relevance: the redundant cluster (1,2,3,8)
    # cannot fill all top slots even though it dominates raw cosine
    picked = {v for _, v, *_ in got}
    assert not picked <= {1, 2, 3, 8}
    # duplicate tie resolved toward the smaller vec_id
    assert 8 not in picked or 3 in picked


def test_rolling_active_users_invariants(spark, sf_dir):
    """DAU <= WAU <= MAU per day; MAU equals a brute-force distinct over
    the trailing 28 days; stickiness is the dau/mau ratio."""
    from bigdata_homed_spark.plans.analysis_queries import rolling_active_users
    from bigdata_homed_spark.plans.homed_behavior import events_sec

    daily = {
        (r["user_id"], r["day"])
        for r in events_sec(spark, sf_dir)
        .select("user_id", (F.col("sec") / 86400).cast("bigint").alias("day"))
        .distinct()
        .collect()
    }
    got = rolling_active_users(spark, sf_dir).collect()
    days = {d for _, d in daily}
    assert {r["day"] for r in got} == days
    for r in got:
        assert 1 <= r["dau"] <= r["wau"] <= r["mau"]
        mau_bf = len({u for (u, d) in daily if r["day"] - 27 <= d <= r["day"]})
        dau_bf = len({u for (u, d) in daily if d == r["day"]})
        wau_bf = len({u for (u, d) in daily if r["day"] - 6 <= d <= r["day"]})
        assert (r["dau"], r["wau"], r["mau"]) == (dau_bf, wau_bf, mau_bf)
        assert abs(r["stickiness"] - round(r["dau"] / r["mau"], 6)) < 1e-9


def test_zscore_outliers_match_numpy(spark, sf_dir):
    """The windowed z-score equals the numpy mean/std of the trailing
    7-day baseline (sample std, ddof=1) and the flag matches |z| > 2."""
    import numpy as np

    from bigdata_homed_spark.plans.analysis_queries import (
        timeseries_zscore_outliers,
    )
    from bigdata_homed_spark.plans.homed_behavior import events_sec

    counts: dict[tuple[str, int], int] = {}
    for r in (
        events_sec(spark, sf_dir)
        .groupBy("event_type", (F.col("sec") / 86400).cast("bigint").alias("day"))
        .count()
        .collect()
    ):
        counts[(r["event_type"], r["day"])] = r["count"]
    got = timeseries_zscore_outliers(spark, sf_dir).collect()
    assert len(got) > 0
    for r in got:
        base = [
            counts[(r["event_type"], d)]
            for d in range(r["day"] - 7, r["day"])
            if (r["event_type"], d) in counts
        ]
        assert len(base) == r["n_baseline"] >= 3
        mu = float(np.mean(base))
        sd = float(np.std(base, ddof=1))
        assert sd > 0
        z = (r["n_events"] - mu) / sd
        assert abs(r["zscore"] - z) < 1e-5, (r, z)
        assert r["is_outlier"] == (1 if abs(r["zscore"]) > 2 else 0)


def test_growth_accounting_conservation(spark, sf_dir):
    """Movement identities: new+retained+resurrected == DAU for every
    day; churned(d) == users active on d-1 minus those retained on d;
    classifications match a brute-force user-day walk."""
    from bigdata_homed_spark.plans.analysis_queries import growth_accounting
    from bigdata_homed_spark.plans.homed_behavior import events_sec

    daily: dict[int, set[int]] = {}
    for r in (
        events_sec(spark, sf_dir)
        .select("user_id", (F.col("sec") / 86400).cast("bigint").alias("day"))
        .distinct()
        .collect()
    ):
        daily.setdefault(r["day"], set()).add(r["user_id"])
    first = {}
    for d in sorted(daily):
        for u in daily[d]:
            first.setdefault(u, d)
    got = {r["day"]: r for r in growth_accounting(spark, sf_dir).collect()}
    # every activity day appears, PLUS churn-only days: users churn INTO
    # gap days (and the day after the last active day) with zero activity
    assert set(daily) <= set(got)
    for d in set(got) - set(daily):
        r = got[d]
        assert r["n_new"] == r["n_retained"] == r["n_resurrected"] == 0
        assert r["n_churned"] == len(daily.get(d - 1, set()) - daily.get(d, set()))
        assert r["n_churned"] > 0 and r["quick_ratio"] == 0.0
    for d, r in ((d, got[d]) for d in daily):
        act = daily[d]
        prev = daily.get(d - 1, set())
        assert r["n_new"] == sum(1 for u in act if first[u] == d)
        assert r["n_retained"] == len(act & prev)
        assert r["n_new"] + r["n_retained"] + r["n_resurrected"] == len(act)
        assert r["n_churned"] == len(prev - act)
        if r["n_churned"] > 0:
            assert abs(
                r["quick_ratio"]
                - round((r["n_new"] + r["n_resurrected"]) / r["n_churned"], 6)
            ) < 1e-9
        else:
            assert r["quick_ratio"] is None


def test_time_weighted_average_matches_bruteforce(spark, sf_dir):
    """TWAP equals the numpy weighted mean with LOCF weights; the plain
    mean rides on the same observation set (last obs per type excluded
    from both, the zero-weight convention)."""
    import numpy as np

    from bigdata_homed_spark.plans.analysis_queries import time_weighted_average
    from bigdata_homed_spark.plans.homed_behavior import events_sec

    series: dict[str, list] = {}
    for r in events_sec(spark, sf_dir).collect():
        series.setdefault(r["event_type"], []).append(
            (r["sec"], r["event_id"], r["value"])
        )
    got = {r["event_type"]: r for r in time_weighted_average(spark, sf_dir).collect()}
    assert set(got) == set(series)
    for t, obs in series.items():
        obs.sort()
        vals = np.array([v for _, _, v in obs[:-1]])
        dts = np.diff([s for s, _, _ in obs]).astype(float)
        r = got[t]
        assert r["n_obs"] == len(obs) - 1
        assert r["total_sec"] == int(dts.sum())
        assert abs(r["twap"] - float((vals * dts).sum() / dts.sum())) < 1e-4
        assert abs(r["plain_mean"] - float(vals.mean())) < 1e-4


def test_trending_daily_movers_invariants(spark, sf_dir):
    """Ranks are a permutation with ties sharing rank; rank_gain is the
    yesterday-vs-today rank difference; delta_pct matches counts."""
    from bigdata_homed_spark.plans.analysis_queries import trending_daily_movers
    from bigdata_homed_spark.plans.homed_behavior import events_sec

    counts: dict[tuple, int] = {}
    for r in (
        events_sec(spark, sf_dir)
        .groupBy("event_type", (F.col("sec") / 86400).cast("bigint").alias("day"))
        .count()
        .collect()
    ):
        counts[(r["event_type"], r["day"])] = r["count"]

    def brute_rank(t, d):
        mine = (-counts[(t, d)], t)
        return 1 + sum(
            1
            for (t2, d2), n2 in counts.items()
            if d2 == d and (-n2, t2) < mine
        )

    got = trending_daily_movers(spark, sf_dir).collect()
    assert got
    for r in got:
        t, d = r["event_type"], r["day"]
        assert r["n_events"] == counts[(t, d)]
        assert r["rnk"] == brute_rank(t, d)
        assert r["rank_gain"] == brute_rank(t, d - 1) - r["rnk"]
        prev = counts[(t, d - 1)]
        assert abs(r["delta_pct"] - round((counts[(t, d)] - prev) / prev, 6)) < 1e-9


def test_kmv_exact_path_and_estimator_sanity(spark, sf_dir):
    """KMV sketch: segments under K distinct hashes are EXACT (est == exact,
    theta == 2^40); the intersection estimator can never exceed the smaller
    sketch's estimate and is exact when both segments are exact."""
    from bigdata_homed_spark.plans.analysis_queries import (
        KMV_K,
        KMV_MAXH,
        kmv_audience_overlap,
    )

    r = kmv_audience_overlap(spark, sf_dir).collect()[0]
    assert r["k"] == KMV_K
    # sf0.001 has 15 users total -> both segments far under K: exact path
    assert r["n_sketch_a"] == r["exact_a"] < KMV_K
    assert r["n_sketch_b"] == r["exact_b"] < KMV_K
    assert r["theta"] == KMV_MAXH
    assert r["est_a"] == r["exact_a"]
    assert r["est_b"] == r["exact_b"]
    assert r["est_inter"] == r["n_inter_sketch"] == r["exact_inter"]


def test_position_attribution_conservation(spark, sf_dir):
    """U-shaped credit allocates exactly 1000 permille per ATTRIBUTED
    purchase — first + last + middle == 1000 * (n_purchases -
    n_unattributed) for every user, and nothing is credited for
    unattributed ones."""
    from bigdata_homed_spark.plans.window_frames import (
        position_attribution_credit,
    )

    rows = position_attribution_credit(spark, sf_dir).collect()
    assert rows
    for r in rows:
        attributed = r["n_purchases"] - r["n_unattributed"]
        total = r["first_permille"] + r["last_permille"] + r["middle_permille"]
        assert total == 1000 * attributed, r


def test_point_in_time_features_no_leakage(spark, sf_dir):
    """Feature-store point-in-time correctness: for a sampled set of label
    rows, every feature equals the brute-force recomputation over raw
    events/orders strictly as-of the label (features at the same second
    sort before the label; nothing leaks from the future)."""
    from pyspark.sql import functions as F

    from bigdata_homed_spark.plans.asof_subqueries import point_in_time_features
    from bigdata_homed_spark.plans.homed_behavior import events_sec
    from bigdata_homed_spark.sources.tables import load_table

    got = {r["label_id"]: r for r in point_in_time_features(spark, sf_dir).collect()}
    ev = events_sec(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).cast("bigint").alias("day"),
        "o_orderkey",
        "o_totalprice",
    ).collect()
    purchases = [e for e in ev if e["event_type"] == "purchase"]
    assert len(got) == len(purchases)
    for p in purchases[:40]:
        uid, sec = p["user_id"], p["sec"]
        # label position: (sec, krank=3, event_id); features visible iff
        # their (sec, krank, uid) sorts strictly before it
        clicks = [
            e for e in ev
            if e["user_id"] == uid and e["event_type"] == "click"
            and (e["sec"], 2, e["event_id"]) < (sec, 3, p["event_id"])
        ]
        views = [
            e for e in ev
            if e["user_id"] == uid and e["event_type"] == "view"
            and (e["sec"], 1, e["event_id"]) < (sec, 3, p["event_id"])
        ]
        ords = [
            o for o in orders
            if o["o_custkey"] == uid
            and (o["day"] * 86400, 0, o["o_orderkey"]) < (sec, 3, p["event_id"])
        ]
        r = got[p["event_id"]]
        assert r["n_prior_clicks"] == len(clicks)
        assert r["n_prior_orders"] == len(ords)
        assert abs(r["prior_spend"] - sum(float(o["o_totalprice"]) for o in ords)) < 1e-6
        if views:
            last = max(views, key=lambda e: (e["sec"], e["event_id"]))
            assert r["last_view_value"] == last["value"]
        else:
            assert r["last_view_value"] is None
        if ords:
            assert r["secs_since_last_order"] == sec - max(o["day"] for o in ords) * 86400
        else:
            assert r["secs_since_last_order"] is None


def test_kmv_property_random_segments(spark, tmp_path):
    """Hypothesis: for random synthetic event sets (segment sizes straddling
    K, overlap from none to total), the KMV sketch row equals an
    independent pure-Python mirror — sketches, thetas, estimators, exact
    counts."""
    import hashlib

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from bigdata_homed_spark.plans.analysis_queries import (
        KMV_K,
        KMV_MAXH,
        kmv_audience_overlap,
    )

    def h40(uid: int) -> int:
        return int(hashlib.md5(f"kmv{uid}".encode()).hexdigest()[:10], 16)

    def mirror(users_a, users_b):
        out = {"exact_a": len(users_a), "exact_b": len(users_b),
               "exact_inter": len(users_a & users_b), "k": KMV_K}
        ska = sorted({h40(u) for u in users_a})[:KMV_K]
        skb = sorted({h40(u) for u in users_b})[:KMV_K]
        out["n_sketch_a"], out["n_sketch_b"] = len(ska), len(skb)
        th_a = KMV_MAXH if len(ska) < KMV_K else ska[-1]
        th_b = KMV_MAXH if len(skb) < KMV_K else skb[-1]
        theta = min(th_a, th_b)
        out["theta"] = theta
        inter = [h for h in set(ska) & set(skb) if h < theta]
        out["n_inter_sketch"] = len(inter)
        out["est_a"] = len(ska) if len(ska) < KMV_K else ((KMV_K - 1) * KMV_MAXH) // th_a
        out["est_b"] = len(skb) if len(skb) < KMV_K else ((KMV_K - 1) * KMV_MAXH) // th_b
        out["est_inter"] = len(inter) if theta == KMV_MAXH else (len(inter) * KMV_MAXH) // theta
        return out

    case_n = [0]

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        a=st.sets(st.integers(0, 120), min_size=0, max_size=60),
        b=st.sets(st.integers(0, 120), min_size=0, max_size=60),
    )
    def run(a, b):
        import datetime

        case_n[0] += 1
        sub = tmp_path / f"kmv_{case_n[0]}"
        sub.mkdir()
        # segment membership via the query's own predicates:
        # A = click & value>150, B = purchase & value>120
        rows, eid = [], 0
        ts = datetime.datetime(2024, 1, 1)
        for u in a:
            eid += 1
            rows.append((eid, ts, u, "click", 200.0, "{}"))
        for u in b:
            eid += 1
            rows.append((eid, ts, u, "purchase", 200.0, "{}"))
        eid += 1
        rows.append((eid, ts, 999, "view", 1.0, "{}"))  # never segment-eligible
        spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp_ntz, user_id bigint, "
            "event_type string, value double, props string",
        ).write.mode("overwrite").parquet(str(sub / "events.parquet"))
        got = kmv_audience_overlap(spark, str(sub)).collect()[0].asDict()
        assert got == mirror(a, b), (sorted(a)[:5], sorted(b)[:5], got)

    run()
