"""Tests for plans/data_selection.py: ExactSubstr spans and DSIR scores.

The oracle gate already pins cross-engine equality; these tests pin the
SEMANTICS on hand-built corpora where the right answer is computable by
inspection — span merging, cross- vs within-doc duplication, and the
direction of DSIR scores for target-like vs off-target documents.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from bigdata_homed_spark.plans.data_selection import (
    SUBSTR_W,
    dsir_selection,
    exact_substring_spans,
)


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def _run_substring(spark, df, tmp_path):
    p = str(tmp_path / "documents.parquet")
    df.withColumn("source", F.lit("s")).withColumn(
        "n_chars", F.length("text")
    ).write.mode("overwrite").parquet(p)
    return {
        r["doc_id"]: r.asDict()
        for r in exact_substring_spans(spark, str(tmp_path)).collect()
    }


def test_exact_substring_cross_doc_span(spark, tmp_path):
    # doc 0 and doc 1 share a 20-token run (> W=16) with distinct tails;
    # every other token is unique, so exactly that run is flagged in both
    shared = " ".join(f"s{i}" for i in range(20))
    a = shared + " " + " ".join(f"a{i}" for i in range(30))
    b = " ".join(f"b{i}" for i in range(30)) + " " + shared
    out = _run_substring(
        spark, _docs_df(spark, [(0, a, "en"), (1, b, "en")]), tmp_path
    )
    # 20 shared tokens -> 5 duplicated 16-windows each, merged to ONE span
    # covering exactly the 20 shared tokens
    assert out[0]["n_dup_spans"] == 1 and out[1]["n_dup_spans"] == 1
    assert out[0]["dup_tokens"] == 20 and out[1]["dup_tokens"] == 20


def test_exact_substring_two_disjoint_spans_not_merged(spark, tmp_path):
    # two shared W-token runs separated by >W unique tokens stay two spans
    run1 = " ".join(f"x{i}" for i in range(SUBSTR_W))
    run2 = " ".join(f"y{i}" for i in range(SUBSTR_W))
    gap_a = " ".join(f"ga{i}" for i in range(SUBSTR_W + 4))
    gap_b = " ".join(f"gb{i}" for i in range(SUBSTR_W + 4))
    a = f"{run1} {gap_a} {run2}"
    b = f"{run2} {gap_b} {run1}"
    out = _run_substring(
        spark, _docs_df(spark, [(0, a, "en"), (1, b, "en")]), tmp_path
    )
    assert out[0]["n_dup_spans"] == 2
    assert out[0]["dup_tokens"] == 2 * SUBSTR_W


def test_exact_substring_touching_runs_merge_to_one_span(spark, tmp_path):
    # r5-advice regression: doc 0 is duplicated run X immediately followed
    # by duplicated run Y (X from doc 1, Y from doc 2); every X/Y-boundary-
    # crossing window is unique.  Flagged positions are 1 and W+1 — they
    # TOUCH (coverage [1, 2W] is contiguous), so the merge must yield ONE
    # maximal span of 2W tokens, not two spans of W.
    run_x = " ".join(f"x{i}" for i in range(SUBSTR_W))
    run_y = " ".join(f"y{i}" for i in range(SUBSTR_W))
    tail_b = " ".join(f"tb{i}" for i in range(SUBSTR_W))
    tail_c = " ".join(f"tc{i}" for i in range(SUBSTR_W))
    out = _run_substring(
        spark,
        _docs_df(
            spark,
            [
                (0, f"{run_x} {run_y}", "en"),
                (1, f"{run_x} {tail_b}", "en"),
                (2, f"{tail_c} {run_y}", "en"),
            ],
        ),
        tmp_path,
    )
    assert out[0]["n_dup_spans"] == 1, out[0]
    assert out[0]["dup_tokens"] == 2 * SUBSTR_W


def test_exact_substring_within_doc_repeat_counts(spark, tmp_path):
    # a doc that repeats its own W-token run twice is self-duplicated even
    # with no other document in the corpus
    run = " ".join(f"r{i}" for i in range(SUBSTR_W))
    gap = " ".join(f"g{i}" for i in range(SUBSTR_W + 2))
    out = _run_substring(
        spark, _docs_df(spark, [(7, f"{run} {gap} {run}", "en")]), tmp_path
    )
    assert out[7]["n_dup_spans"] == 2
    assert out[7]["dup_tokens"] == 2 * SUBSTR_W


def test_exact_substring_clean_doc_zero(spark, tmp_path):
    uniq = " ".join(f"u{i}" for i in range(40))
    out = _run_substring(spark, _docs_df(spark, [(3, uniq, "en")]), tmp_path)
    assert out[3]["n_dup_spans"] == 0
    assert out[3]["dup_tokens"] == 0
    assert out[3]["n_windows"] == 40 - SUBSTR_W + 1


def test_dsir_scores_separate_target_from_off_target(spark, tmp_path):
    # target (en) docs use one vocabulary, off-target another; a fresh doc
    # written in the target vocabulary must outscore one in the off-target
    # vocabulary, and the en-vocab docs should be the selected ones
    tvoc = "alpha beta gamma delta " * 10
    ovoc = "uno dos tres cuatro " * 10
    rows = [(i, tvoc, "en") for i in range(5)]
    rows += [(10 + i, ovoc, "zh") for i in range(5)]
    rows += [(100, tvoc, "zh"), (101, ovoc, "en")]  # the probes
    df = _docs_df(spark, rows)
    p = str(tmp_path / "documents.parquet")
    df.withColumn("source", F.lit("s")).withColumn(
        "n_chars", F.length("text")
    ).write.mode("overwrite").parquet(p)
    out = {
        r["doc_id"]: r.asDict() for r in dsir_selection(spark, str(tmp_path)).collect()
    }
    # probe 100 is written in target vocabulary -> high score, selected
    # probe 101 is written in off-target vocabulary -> low score, dropped
    assert out[100]["dsir_score"] > out[101]["dsir_score"]
    assert out[100]["selected"] is True
    assert out[101]["selected"] is False


def test_scd2_compacts_runs_and_orders_versions(spark, tmp_path):
    # user 1: A,A,B,A -> three SCD2 rows (the repeat A at t=2 folds into
    # version 1; the return to A at t=4 opens a NEW version — type 2
    # history, not distinct-status)
    from bigdata_homed_spark.plans.lifecycle import scd2_status_history

    rows = [
        (10, "2024-01-01 00:00:01", 1, "A", 0.0, "{}"),
        (11, "2024-01-01 00:00:02", 1, "A", 0.0, "{}"),
        (12, "2024-01-01 00:00:03", 1, "B", 0.0, "{}"),
        (13, "2024-01-01 00:00:04", 1, "A", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = sorted(
        (r["version"], r["status"], r["valid_to_sec"] is None)
        for r in scd2_status_history(spark, str(tmp_path)).collect()
    )
    assert [(v, s) for v, s, _ in out] == [(1, "A"), (2, "B"), (3, "A")]
    # only the last interval is open
    assert [c for _, _, c in out] == [False, False, True]


# ---------------------------------------------------------------------------
# property check vs an INDEPENDENT reference: instead of re-running the
# window+merge algorithm, the oracle marks every token position covered by
# any duplicated window in a coverage bitmap — dup_tokens must equal the
# popcount and n_dup_spans the number of maximal covered runs.
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _naive_coverage(corpus: dict[int, list[str]], W: int):
    wins: Counter = Counter()
    for toks in corpus.values():
        for i in range(len(toks) - W + 1):
            wins[tuple(toks[i : i + W])] += 1
    out = {}
    for d, toks in corpus.items():
        covered = [False] * len(toks)
        for i in range(len(toks) - W + 1):
            if wins[tuple(toks[i : i + W])] >= 2:
                for t in range(i, i + W):
                    covered[t] = True
        spans = sum(
            1 for t, c in enumerate(covered) if c and (t == 0 or not covered[t - 1])
        )
        out[d] = (spans, sum(covered))
    return out


@settings(
    max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc"]), min_size=SUBSTR_W,
                 # >= 2W+1 tokens so TOUCHING flagged windows (positions p and
                 # p+W, contiguous coverage) are generated — the case the r5
                 # advice found unexercised by the old W+12 cap
                 max_size=SUBSTR_W * 2 + 4),
        min_size=1,
        max_size=3,
    )
)
def test_exact_substring_matches_coverage_bitmap(spark, tmp_path_factory, doclists):
    corpus = {i: toks for i, toks in enumerate(doclists)}
    expected = _naive_coverage(corpus, SUBSTR_W)
    tmp = tmp_path_factory.mktemp("substr")
    df = _docs_df(
        spark, [(i, " ".join(toks), "en") for i, toks in corpus.items()]
    )
    got = _run_substring(spark, df, tmp)
    for d, (spans, tokens_covered) in expected.items():
        assert got[d]["n_dup_spans"] == spans, (d, corpus[d])
        assert got[d]["dup_tokens"] == tokens_covered, (d, corpus[d])


def test_ccnet_buckets_are_exact_terciles(spark, sf_dir):
    """Bucket sizes differ by at most 1 doc, the three logprob extents are
    ordered tail < middle < head with no overlap, and every scored doc is
    bucketed exactly once."""
    from bigdata_homed_spark.plans.data_selection import (
        bigram_lm_quality,
        ccnet_perplexity_buckets,
    )

    n_scored = bigram_lm_quality(spark, sf_dir).count()
    rows = ccnet_perplexity_buckets(spark, sf_dir).collect()
    by_bucket: dict[str, dict] = {}
    for r in rows:
        b = by_bucket.setdefault(r["bucket"], {"n": 0, "lo": [], "hi": []})
        b["n"] += r["n_docs"]
        b["lo"].append(r["min_logprob"])
        b["hi"].append(r["max_logprob"])
    assert set(by_bucket) == {"head", "middle", "tail"}
    sizes = [b["n"] for b in by_bucket.values()]
    assert sum(sizes) == n_scored
    assert max(sizes) - min(sizes) <= 1
    assert max(by_bucket["tail"]["hi"]) <= min(by_bucket["middle"]["lo"])
    assert max(by_bucket["middle"]["hi"]) <= min(by_bucket["head"]["lo"])
