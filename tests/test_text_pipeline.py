"""Tests for plans/text_pipeline.py query semantics on hand-built corpora.

The oracle gate pins cross-engine equality; these tests pin the MATH on
inputs where the right answer is computable independently (a from-scratch
Python reimplementation of the formula, not a second run of the query).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from bigdata_homed_spark.plans.text_pipeline import (
    _BM25_PROBES,
    bm25_doc_scores,
)


def _write_docs(spark, tmp_path, texts):
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def _bm25_reference(texts, k1=1.2, b=0.75, probes=_BM25_PROBES):
    """Independent BM25: plain dicts and math.log, mirroring the documented
    formula (idf = ln((2N+2)/(2·df+1)), per-term scores rounded to 6dp
    before the per-doc sum)."""
    toks = [t.split() for t in texts]
    n, t_total = len(toks), sum(len(d) for d in toks)
    tf = [{} for _ in toks]
    for d, words in enumerate(toks):
        for w in words:
            tf[d][w] = tf[d].get(w, 0) + 1
    df, total_tf = {}, {}
    for d in tf:
        for w, c in d.items():
            df[w] = df.get(w, 0) + 1
            total_tf[w] = total_tf.get(w, 0) + c
    probe = sorted(total_tf, key=lambda w: (-total_tf[w], w))[:probes]
    out = {}
    for d, words in enumerate(tf):
        hits = [w for w in probe if w in words]
        if not hits:
            continue
        s = 0.0
        for w in hits:
            idf = math.log((2 * n + 2) / (2 * df[w] + 1))
            dl = len(toks[d])
            tfn = (
                words[w] * (1 + k1)
                / (words[w] + k1 * (1 - b + b * dl * n / t_total))
            )
            s += round(idf * tfn, 6)
        out[d] = (len(hits), round(s, 6))
    return out


def test_bm25_matches_independent_reference(spark, tmp_path):
    texts = [
        "apple apple banana",
        "apple cherry cherry cherry",
        "banana date egg fig",
        "fig fig fig",  # only non-probe terms if fig misses the top-5 cut
    ]
    _write_docs(spark, tmp_path, texts)
    got = {
        r["doc_id"]: (r["n_hit_terms"], round(r["bm25"], 6))
        for r in bm25_doc_scores(spark, str(tmp_path)).collect()
    }
    expected = _bm25_reference(texts)
    # probe terms: apple(3) cherry(3) fig(4 — top by count) banana(2) date/egg(1)
    # whatever the cut, the reference computes the same rule; compare exactly
    assert got == expected


def test_bm25_rank_orders_by_score_then_doc(spark, tmp_path):
    # two docs with identical text score identically -> tie broken by doc_id
    texts = ["same same token", "same same token", "other words here"]
    _write_docs(spark, tmp_path, texts)
    rows = bm25_doc_scores(spark, str(tmp_path)).orderBy("rnk").collect()
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    tied = [r for r in rows if r["bm25"] == rows[0]["bm25"]]
    assert [r["doc_id"] for r in tied] == sorted(r["doc_id"] for r in tied)


def _write_source_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", src, len(t)) for i, (src, t) in enumerate(rows)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_gopher_rules_fire_individually(spark, tmp_path):
    from bigdata_homed_spark.plans.curation import gopher_quality_flags

    good = " ".join(["the", "and"] + [f"word{i}" for i in range(58)])
    rows = [
        ("ok", good),
        ("short", "the and tiny doc"),                      # <50 words
        ("meanlen", " ".join(["the", "and"] + ["a"] * 58)), # mean len < 3
        ("symbols", good + " " + "#" * 30),                 # >0.1 symbols/word
        ("bullets", "\n".join(["- " + good] * 10)),         # 100% bullet lines
        ("ellipsis", "\n".join([good + "..."] * 10)),       # 100% ellipsis lines
        ("numeric", " ".join(["the", "and"] + ["123"] * 58)),  # <80% alphabetic
        ("nostop", " ".join([f"word{i}" for i in range(60)])),  # <2 stopwords
    ]
    _write_source_docs(spark, tmp_path, rows)
    got = {r["source"]: r.asDict() for r in gopher_quality_flags(spark, str(tmp_path)).collect()}
    assert got["ok"]["n_keep"] == 1 and got["ok"]["n_docs"] == 1
    assert got["short"]["n_fail_wordcount"] == 1 and got["short"]["n_keep"] == 0
    assert got["meanlen"]["n_fail_meanwordlen"] == 1 and got["meanlen"]["n_keep"] == 0
    assert got["symbols"]["n_fail_symbolratio"] == 1 and got["symbols"]["n_keep"] == 0
    assert got["bullets"]["n_fail_bullets"] == 1 and got["bullets"]["n_keep"] == 0
    assert got["ellipsis"]["n_fail_ellipsis"] == 1 and got["ellipsis"]["n_keep"] == 0
    assert got["numeric"]["n_fail_alphawords"] == 1 and got["numeric"]["n_keep"] == 0
    assert got["nostop"]["n_fail_stopwords"] == 1 and got["nostop"]["n_keep"] == 0
    # rules are independent: the good doc fails nothing
    assert all(got["ok"][k] == 0 for k in got["ok"] if k.startswith("n_fail_"))


def test_cms_matches_python_mirror_and_dominates_exact(spark, tmp_path):
    """Count-min sketch: the query's estimates equal an independent Python
    CMS built with the same md5 cell scheme, and every estimate is >= the
    exact count (the sketch's one-sided error bound)."""
    import hashlib
    import re
    from collections import Counter

    from bigdata_homed_spark.plans.text_pipeline import (
        CMS_D,
        CMS_TOP_K,
        CMS_W,
        cms_heavy_hitters,
    )

    # skewed corpus: a few heavy terms + a long tail of unique ones
    texts = []
    for i in range(40):
        texts.append(
            "alpha beta beta gamma " + " ".join(f"tail{i}x{j}" for j in range(30))
        )
    _write_docs(spark, tmp_path, texts)

    toks = [w for t in texts for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
    exact = Counter(toks)

    def cell(r, term):
        return int(hashlib.md5(f"cms{r}_{term}".encode()).hexdigest()[:15], 16) % CMS_W

    sketch = Counter()
    for term, n in exact.items():
        for r in range(CMS_D):
            sketch[(r, cell(r, term))] += n

    def estimate(term):
        return min(sketch[(r, cell(r, term))] for r in range(CMS_D))

    topk = sorted(exact, key=lambda w: (-exact[w], w))[:CMS_TOP_K]
    expected = {
        t: (exact[t], estimate(t), estimate(t) - exact[t]) for t in topk
    }

    rows = cms_heavy_hitters(spark, str(tmp_path)).collect()
    got = {r.term: (r.exact_n, r.cms_n, r.overestimate) for r in rows}
    assert got == expected
    assert all(r.cms_n >= r.exact_n for r in rows)


def test_prefix_filter_matches_bruteforce(spark, tmp_path):
    """PPJoin cascade vs a from-scratch Python all-pairs Jaccard: the
    filter chain (prefix + length + positional) must admit every
    qualifying pair — including boundary cases (exact duplicates, docs
    shorter than one shingle, pairs exactly AT the threshold)."""
    import re
    from itertools import combinations

    from bigdata_homed_spark.plans.text_pipeline import (
        PFX_T_DEN,
        PFX_T_NUM,
        prefix_filter_jaccard_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    texts = [
        base,
        base,  # exact duplicate -> J = 1
        base + " extra",  # near-dup
        base.replace("quick", "slow").replace("dog", "cat"),  # mid similarity
        "completely different words in this one here now",  # unrelated
        "xy",  # shorter than one shingle
        "xy",  # its exact duplicate
    ]
    _write_docs(spark, tmp_path, texts)

    def shingles(t):
        toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        return {" ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 1))}

    sets = [shingles(t) for t in texts]
    expected = {}
    for i, j in combinations(range(len(texts)), 2):
        inter = len(sets[i] & sets[j])
        union = len(sets[i] | sets[j])
        if inter * PFX_T_DEN >= union * PFX_T_NUM:
            expected[(i, j)] = (inter, round(inter / union, 6))

    rows = prefix_filter_jaccard_pairs(spark, str(tmp_path)).collect()
    got = {(r.d1, r.d2): (r.inter, r.jaccard) for r in rows}
    assert got == expected
    assert (0, 1) in got and got[(0, 1)][1] == 1.0
    assert (5, 6) in got, "sub-shingle-length duplicate pair missed"


def test_bpe_vocab_merges_matches_python_trainer(spark, tmp_path):
    """3-round merge loop vs a from-scratch Python greedy BPE trainer:
    same argmax rule (count desc, length-prefixed key asc) and the same
    left-to-right non-overlapping rewrite — including the overlap case
    ('a a a' merges once, not twice) and a tie broken by key order."""
    import re

    from bigdata_homed_spark.plans.text_pipeline import (
        BPE_MERGE_ROUNDS,
        BPE_SEP,
        bpe_vocab_merges,
    )

    texts = [
        "a a a b c",          # overlapping run of the 'a a' pair
        "a a b c a a",        # two disjoint 'a a' occurrences
        "b c b c b c",        # 'b c' appears often -> likely round-1 best
        "x y x y",            # competing pair, fewer occurrences
        "z",                  # single-token doc: no pairs
        "",                   # empty doc: no tokens at all
    ]
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    def trainer(docs, rounds):
        """Plain-list greedy BPE: per round pick (count desc, key asc),
        rewrite each doc left-to-right skipping overlaps."""
        corpora = [
            [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w] for t in docs
        ]
        merges = []
        for _ in range(rounds):
            counts = {}
            for toks in corpora:
                for i in range(len(toks) - 1):
                    k = f"{len(toks[i])}:{toks[i]}{BPE_SEP}{toks[i + 1]}"
                    counts[k] = counts.get(k, 0) + 1
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            key, n_occ = best
            left_len = int(key.split(":", 1)[0])
            body = key.split(":", 1)[1]
            left, right = body[:left_len], body[left_len + len(BPE_SEP):]
            new_corpora = []
            for toks in corpora:
                out, i = [], 0
                while i < len(toks):
                    if (
                        i + 1 < len(toks)
                        and toks[i] == left
                        and toks[i + 1] == right
                    ):
                        out.append(toks[i] + BPE_SEP + toks[i + 1])
                        i += 2
                    else:
                        out.append(toks[i])
                        i += 1
                new_corpora.append(out)
            corpora = new_corpora
            merges.append(
                (
                    body.replace(BPE_SEP, " "),
                    n_occ,
                    sum(len(t) for t in corpora),
                )
            )
        return merges

    expected = trainer(texts, BPE_MERGE_ROUNDS)
    got = [
        (r.pair, r.n_occ, r.tokens_after)
        for r in bpe_vocab_merges(spark, str(tmp_path)).collect()
    ]
    assert got == expected
    # the overlap doc proves greedy: 'a a a' contributes 2 raw pair counts
    # but only 1 merge happens there, so tokens_after drops by LESS than a
    # naive count-based prediction whenever the best pair self-overlaps
    assert all(t > 0 for _, _, t in expected)


def test_bpe_merge_rewrite_property(spark, tmp_path):
    """Hypothesis: over random tiny-alphabet corpora (where long runs of
    the best pair are common — the hard case for the island-parity
    greedy), the declarative 3-round merge loop must equal the sequential
    Python trainer exactly."""
    import re

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from bigdata_homed_spark.plans.text_pipeline import (
        BPE_MERGE_ROUNDS,
        BPE_SEP,
        bpe_vocab_merges,
    )

    def trainer(docs, rounds):
        corpora = [
            [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w] for t in docs
        ]
        merges = []
        for _ in range(rounds):
            counts = {}
            for toks in corpora:
                for i in range(len(toks) - 1):
                    k = f"{len(toks[i])}:{toks[i]}{BPE_SEP}{toks[i + 1]}"
                    counts[k] = counts.get(k, 0) + 1
            if not counts:
                break
            key, n_occ = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            left_len = int(key.split(":", 1)[0])
            body = key.split(":", 1)[1]
            left, right = body[:left_len], body[left_len + len(BPE_SEP):]
            nxt_corpora = []
            for toks in corpora:
                out, i = [], 0
                while i < len(toks):
                    if i + 1 < len(toks) and toks[i] == left and toks[i + 1] == right:
                        out.append(toks[i] + BPE_SEP + toks[i + 1])
                        i += 2
                    else:
                        out.append(toks[i])
                        i += 1
                nxt_corpora.append(out)
            corpora = nxt_corpora
            merges.append(
                (body.replace(BPE_SEP, " "), n_occ, sum(len(t) for t in corpora))
            )
        return merges

    # counter-keyed like every other fuzz fixture dir: a fresh path per
    # example, so the session-scoped scan catalog (sources/tables.py)
    # can never serve a stale file listing on a hash collision
    case_n = [0]

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        docs=st.lists(
            st.lists(
                st.sampled_from(["a", "b", "ab", "c"]), min_size=2, max_size=24
            ).map(" ".join),
            min_size=1,
            max_size=6,
        )
    )
    def run(docs):
        case_n[0] += 1
        d = tmp_path / f"case_{case_n[0]}"
        rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(docs)]
        spark.createDataFrame(
            rows,
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
        expected = trainer(docs, BPE_MERGE_ROUNDS)
        got = [
            (r.pair, r.n_occ, r.tokens_after)
            for r in bpe_vocab_merges(spark, str(d)).collect()
        ]
        assert got == expected, (docs, got, expected)

    run()


def _winnow_reference(text, k=3, w=4, seed="winnow"):
    """Independent Python winnowing mirror: lowercase-alnum tokens, k-gram
    md5-60bit hashes, window-of-w minima, distinct set + XOR digest."""
    import hashlib
    import re

    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    th = [
        int(hashlib.md5((seed + g).encode()).hexdigest()[:15], 16) for g in grams
    ]
    m = len(th)
    if m == 0:
        sel = []
    else:
        n_win = max(1, m - w + 1)
        sel = [min(th[j : j + w]) for j in range(n_win)]
    fps = set(sel)
    digest = 0
    for v in fps:
        digest ^= v
    return len(th), fps, digest


def test_winnowing_matches_python_mirror(spark, tmp_path):
    from bigdata_homed_spark.plans.text_pipeline import winnowing_fingerprints

    texts = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "completely different words here about astronomy and star maps",
        "zz",             # 1 token < k  -> zero k-grams, digest 0
        "aa bb cc",       # exactly k tokens -> one k-gram, one window
        "",               # empty -> zero everything
    ]
    _write_docs(spark, tmp_path, texts)
    got = {
        r["doc_id"]: (r["n_kgrams"], r["n_fingerprints"], r["fp_digest"])
        for r in winnowing_fingerprints(spark, str(tmp_path)).collect()
    }
    for i, t in enumerate(texts):
        n_kg, fps, digest = _winnow_reference(t)
        assert got[i] == (n_kg, len(fps), digest), (i, t, got[i])


def test_winnowing_guarantee_shared_span_shares_fingerprint(spark, tmp_path):
    """The winnowing guarantee (SIGMOD'03 thm 1): any copied span of at
    least w+k-1 tokens shares >= 1 selected fingerprint between the two
    documents, regardless of the unrelated surrounding text."""
    span = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w+k-1
    doc_a = "one two three " + span + " four five six"
    doc_b = "seven eight nine ten " + span + " eleven"
    _write_docs(spark, tmp_path, [doc_a, doc_b])
    _, fps_a, _ = _winnow_reference(doc_a)
    _, fps_b, _ = _winnow_reference(doc_b)
    assert fps_a & fps_b, "winnowing guarantee violated in the mirror"
    # and the Spark side selects exactly the mirror's sets (digest+count
    # pin the set through the XOR fold)
    from bigdata_homed_spark.plans.text_pipeline import winnowing_fingerprints

    got = {
        r["doc_id"]: (r["n_fingerprints"], r["fp_digest"])
        for r in winnowing_fingerprints(spark, str(tmp_path)).collect()
    }
    for i, fps in ((0, fps_a), (1, fps_b)):
        digest = 0
        for v in fps:
            digest ^= v
        assert got[i] == (len(fps), digest)


def test_winnowing_property_random_docs(spark, tmp_path):
    """Hypothesis: for arbitrary token soups (including repeats, 1-char
    tokens, doc lengths straddling the k and w boundaries), the Spark
    winnowing output equals the independent Python mirror on every doc."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from bigdata_homed_spark.plans.text_pipeline import winnowing_fingerprints

    token = st.text(alphabet="abc12", min_size=1, max_size=3)
    doc = st.lists(token, min_size=0, max_size=12).map(" ".join)
    case_n = [0]

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(texts=st.lists(doc, min_size=1, max_size=6))
    def run(texts):
        case_n[0] += 1
        sub = tmp_path / f"wp_{case_n[0]}"
        sub.mkdir()
        _write_docs(spark, sub, texts)
        got = {
            r["doc_id"]: (r["n_kgrams"], r["n_fingerprints"], r["fp_digest"])
            for r in winnowing_fingerprints(spark, str(sub)).collect()
        }
        for i, t in enumerate(texts):
            n_kg, fps, digest = _winnow_reference(t)
            assert got[i] == (n_kg, len(fps), digest), (t, got[i])

    run()
