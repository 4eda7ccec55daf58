"""Dataset-curation operators: set-merge arrays, request profiles,
repetition quality signals, rolling-hash fingerprints, stratified sampling.

Reference parity covered here:

- `merge` UDF (etl/UserAgregate.scala:146-150) — set-union of `|`-joined
  string sets across rows.  Re-expressed as
  ``flatten(collect_list(split(...)))`` + ``array_distinct`` — native
  expressions, no UDF, stays in whole-stage codegen.
- NginxLogParseForLabel.scala:66 (SURVEY O4) — per-user time-ordered
  request arrays, driver-side `Sorting.quickSort` replaced by
  ``array_sort(collect_list(struct(ts, ...)))`` — distributed, and
  deterministic because the struct carries a unique tiebreaker.

Training-data-pipeline operators (100 TB north star):

- **repetition signals** (Gopher-style quality): duplicate-token ratio and
  top-bigram fraction per document.  The bigram mode is computed by
  explode → two-level groupBy — per-doc work is bounded and the shuffle
  key is (doc_id, bigram-hash-sized string), never the document text.
- **rolling-hash fingerprint** — order-sensitive Rabin–Karp polynomial
  hash over the token stream (mod 1e9+7, base 131).  Unlike the sorted
  token-set fingerprint (text_pipeline.fingerprint_dedup) this
  distinguishes permutations; it is a pure per-row ``aggregate()`` over
  the token array — a narrow projection that scales with the scan.
- **stratified sampling** — deterministic hash-based per-stratum
  sampling: keep iff hash(doc_id) mod 1000 < rate(stratum).  No
  ``rand()``: re-runs and retried tasks pick identical rows, which is
  what makes sampled 100 TB pipelines reproducible and auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import HASH_BITS, hash64, hash64_sql
from ..functions.text import tokens
from .homed_behavior import EV_SEC, events_sec
from .registry import query
from .text_pipeline import TOKS

RK_MOD = 1_000_000_007
RK_BASE = 131


# --------------------------------------------------------------------------
# merge-UDF parity: per-(user, day) '|'-packed distinct event-type sets,
# then a per-user set-union across days (UserAgregate.scala:146-150).
@query(
    "user_event_set_merge",
    oracle=f"""
    WITH ev AS ({EV_SEC}),
    daily AS (
      SELECT user_id, sec//86400 AS day_num,
             array_to_string(list_sort(list_distinct(list(event_type))), '|') AS day_set
      FROM ev GROUP BY 1, 2
    ),
    merged AS (
      SELECT user_id, count(*) AS n_days,
             list_sort(list_distinct(flatten(list(string_split(day_set, '|'))))) AS s
      FROM daily GROUP BY 1
    )
    SELECT user_id, n_days,
           cast(len(s) as int) AS n_types,
           array_to_string(s, '|') AS merged_set
    FROM merged
    """,
)
def user_event_set_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_sec(spark, sf_dir)
    daily = ev.groupBy("user_id", F.expr("sec div 86400").alias("day_num")).agg(
        F.concat_ws("|", F.array_sort(F.collect_set("event_type"))).alias("day_set")
    )
    merged = daily.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list(F.split("day_set", "\\|"))))
        ).alias("s"),
    )
    return merged.select(
        "user_id",
        "n_days",
        F.size("s").alias("n_types"),
        F.concat_ws("|", "s").alias("merged_set"),
    )


# --------------------------------------------------------------------------
# Per-user request profile: first-10 time-ordered event sequence + dominant
# event label (NginxLogParseForLabel).  The sequence is deterministic: the
# collected structs carry (sec, event_id) and are array_sort'ed before
# truncation, so executor arrival order is irrelevant.
@query(
    "user_request_profile",
    oracle=f"""
    WITH ev AS ({EV_SEC}),
    seq AS (
      SELECT user_id, count(*) AS n_events,
             array_to_string(list_slice(list(event_type ORDER BY sec, event_id), 1, 10), '>')
               AS first_events
      FROM ev GROUP BY 1
    ),
    dom AS (
      SELECT user_id, event_type AS dominant_event, count(*) AS dominant_n
      FROM ev GROUP BY 1, 2
      QUALIFY row_number() OVER (PARTITION BY user_id
              ORDER BY count(*) DESC, event_type) = 1
    )
    SELECT s.user_id, s.n_events, s.first_events, d.dominant_event, d.dominant_n
    FROM seq s JOIN dom d USING (user_id)
    """,
)
def user_request_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_sec(spark, sf_dir)
    seq = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.concat_ws(
            ">",
            F.transform(
                F.slice(
                    F.array_sort(F.collect_list(F.struct("sec", "event_id", "event_type"))),
                    1,
                    10,
                ),
                lambda x: x["event_type"],
            ),
        ).alias("first_events"),
    )
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("dominant_n"))
    w = Window.partitionBy("user_id").orderBy(F.col("dominant_n").desc(), "event_type")
    dom = (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("dominant_event"), "dominant_n")
    )
    return seq.join(dom, "user_id")


# --------------------------------------------------------------------------
# Gopher-style repetition quality signals per document: duplicate-token
# ratio and top-bigram fraction.  Bigram mode via explode + groupBy so the
# per-row cost is linear (no O(n²) array scans); docs with <2 tokens get
# fraction 0 through the left join.
@query(
    "repetition_signals",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {TOKS} AS toks FROM documents
    ),
    base AS (
      SELECT doc_id,
             cast(len(toks) as bigint) AS n_tokens,
             CASE WHEN len(toks) > 0
                  THEN cast(len(list_distinct(toks)) as double) / cast(len(toks) as double)
                  ELSE 0.0 END AS distinct_token_ratio
      FROM toks
    ),
    bg AS (
      SELECT doc_id, unnest(list_transform(generate_series(1, len(toks)-1),
                            i -> toks[i] || ' ' || toks[i+1])) AS bigram
      FROM toks
    ),
    bgc AS (
      SELECT doc_id, bigram, count(*) AS n FROM bg GROUP BY 1, 2
    ),
    bgs AS (
      SELECT doc_id, cast(sum(n) as bigint) AS n_bigrams, max(n) AS top_n
      FROM bgc GROUP BY 1
    )
    SELECT b.doc_id, b.n_tokens, b.distinct_token_ratio,
           cast(coalesce(s.n_bigrams, 0) as bigint) AS n_bigrams,
           CASE WHEN s.n_bigrams IS NULL THEN 0.0
                ELSE cast(s.top_n as double) / cast(s.n_bigrams as double) END
             AS top_bigram_fraction
    FROM base b LEFT JOIN bgs s USING (doc_id)
    """,
)
def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").withColumn("toks", tokens("text"))
    base = docs.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.when(
            F.size("toks") > 0,
            F.size(F.array_distinct("toks")).cast("double")
            / F.size("toks").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("distinct_token_ratio"),
    )
    bigrams = docs.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.zip_with(
                    F.expr("slice(toks, 1, size(toks)-1)"),
                    F.expr("slice(toks, 2, size(toks)-1)"),
                    lambda a, b: F.concat_ws(" ", a, b),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bigram"),
    )
    bgc = bigrams.groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("n"))
    bgs = bgc.groupBy("doc_id").agg(
        F.sum("n").cast("bigint").alias("n_bigrams"), F.max("n").alias("top_n")
    )
    out = base.join(bgs, "doc_id", "left")
    return out.select(
        "doc_id",
        "n_tokens",
        "distinct_token_ratio",
        F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
        F.when(F.col("n_bigrams").isNull(), F.lit(0.0))
        .otherwise(F.col("top_n").cast("double") / F.col("n_bigrams").cast("double"))
        .alias("top_bigram_fraction"),
    )


# --------------------------------------------------------------------------
# Order-sensitive rolling-hash (Rabin–Karp) document fingerprint: a pure
# per-row fold over the token array — no shuffle, no UDF, identical 64-bit
# integer arithmetic on both engines.
@query(
    "rolling_hash_fingerprint",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {TOKS} AS toks FROM documents
    ),
    hashed AS (
      SELECT doc_id, cast(len(toks) as bigint) AS n_tokens,
             list_transform(toks, t -> {hash64_sql("t", "rk")} % {RK_MOD}) AS th
      FROM toks
    )
    SELECT doc_id, n_tokens,
           list_reduce(list_prepend(cast(0 as bigint), th),
                       (acc, x) -> (acc * {RK_BASE} + x) % {RK_MOD}) AS fingerprint
    FROM hashed
    """,
)
def rolling_hash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").withColumn("toks", tokens("text"))
    th = F.transform(F.col("toks"), lambda t: hash64(t, "rk") % RK_MOD)
    return docs.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.aggregate(
            th,
            F.lit(0).cast("bigint"),
            lambda acc, x: (acc * RK_BASE + x) % RK_MOD,
        ).alias("fingerprint"),
    )


# --------------------------------------------------------------------------
# Deterministic stratified sampling: per-language target rates in permille,
# keep iff hash(doc_id) mod 1000 < rate.  Reported per (source, lang) so the
# achieved rate is audit-checkable against the target.
SAMPLE_RATES = {"en": 300, "zh": 800}  # permille; other langs 500
DEFAULT_RATE = 500


@query(
    "stratified_sample",
    oracle=f"""
    WITH d AS (
      SELECT source, lang, n_chars,
             {hash64_sql("cast(doc_id as varchar)", "samp")} % 1000 AS bucket,
             CASE lang WHEN 'en' THEN {SAMPLE_RATES["en"]}
                       WHEN 'zh' THEN {SAMPLE_RATES["zh"]}
                       ELSE {DEFAULT_RATE} END AS rate_permille
      FROM documents
    )
    SELECT source, lang, any_value(rate_permille) AS target_permille,
           count(*) AS n_total,
           cast(sum(CASE WHEN bucket < rate_permille THEN 1 ELSE 0 END) as bigint) AS n_kept,
           cast(sum(CASE WHEN bucket < rate_permille THEN n_chars ELSE 0 END) as bigint)
             AS kept_chars
    FROM d GROUP BY 1, 2
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("lang") == "en", SAMPLE_RATES["en"])
        .when(F.col("lang") == "zh", SAMPLE_RATES["zh"])
        .otherwise(DEFAULT_RATE)
    )
    d = docs.select(
        "source",
        "lang",
        "n_chars",
        (hash64("doc_id", "samp") % 1000).alias("bucket"),
        rate.alias("rate_permille"),
    )
    kept = F.col("bucket") < F.col("rate_permille")
    return d.groupBy("source", "lang").agg(
        F.any_value("rate_permille").alias("target_permille"),
        F.count(F.lit(1)).alias("n_total"),
        F.sum(kept.cast("int")).cast("bigint").alias("n_kept"),
        F.sum(F.when(kept, F.col("n_chars")).otherwise(0)).cast("bigint").alias("kept_chars"),
    )


# --------------------------------------------------------------------------
# Training-data export: deterministic global shuffle → N shards.  The
# pretraining writer's partitioning step: shard = hash(doc_id) mod N,
# within-shard order = an independent hash (so shard membership and order
# are uncorrelated).  Deterministic (no rand()): retried tasks and re-runs
# produce identical shards.  At 100 TB this is `repartition(N, shard)` +
# per-partition ordered write; the audit below pins membership AND order
# (first/last doc per shard) without materializing the shuffle in the test.
N_SHARDS = 16


@query(
    "training_shard_assignment",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, n_chars, source,
             {hash64_sql("cast(doc_id as varchar)", "shard")} % {N_SHARDS} AS shard,
             {hash64_sql("cast(doc_id as varchar)", "pos")} AS pos
      FROM documents
    )
    SELECT shard,
           cast(count(*) as bigint) AS n_docs,
           cast(sum(n_chars) as bigint) AS total_chars,
           cast(count(DISTINCT source) as bigint) AS n_sources,
           arg_min(doc_id, pos) AS first_doc,
           arg_max(doc_id, pos) AS last_doc
    FROM d GROUP BY shard
    """,
)
def training_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "n_chars",
        "source",
        (hash64("doc_id", "shard") % N_SHARDS).alias("shard"),
        hash64("doc_id", "pos").alias("pos"),
    )
    return d.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.min_by("doc_id", "pos").alias("first_doc"),
        F.max_by("doc_id", "pos").alias("last_doc"),
    )


# --------------------------------------------------------------------------
# Sequence packing: concatenate shard-ordered documents into fixed
# token-budget training sequences (contiguous greedy packing — a document
# starts in the sequence its exclusive running total falls into).  One
# window per shard (the shard is the partition key, so parallelism = shard
# count at any scale) + one hash agg.  Budget 2048 "tokens" (whitespace
# tokenizer — the budget accounting a pipeline runs before real BPE).
SEQ_BUDGET = 2048
_TOKS_SQL = "len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != ''))"


@query(
    "sequence_packing",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {_TOKS_SQL} AS n_toks,
             {hash64_sql("cast(doc_id as varchar)", "shard")} % {N_SHARDS} AS shard,
             {hash64_sql("cast(doc_id as varchar)", "pos")} AS pos
      FROM documents
    ),
    packed AS (
      SELECT shard, n_toks,
             cast((sum(n_toks) OVER (PARTITION BY shard ORDER BY pos, doc_id
                       ROWS UNBOUNDED PRECEDING) - n_toks) // {SEQ_BUDGET} as bigint) AS seq_idx
      FROM d
    )
    SELECT shard, seq_idx,
           cast(count(*) as bigint) AS n_docs,
           cast(sum(n_toks) as bigint) AS sum_tokens
    FROM packed GROUP BY shard, seq_idx
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.size(tokens("text")).alias("n_toks"),
        (hash64("doc_id", "shard") % N_SHARDS).alias("shard"),
        hash64("doc_id", "pos").alias("pos"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("pos", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = d.withColumn(
        "seq_idx",
        # exclusive running total, integer-divided; both engines floor
        # (operands are non-negative bigints)
        F.floor((F.sum("n_toks").over(w) - F.col("n_toks")) / SEQ_BUDGET).cast("bigint"),
    )
    return packed.groupBy("shard", "seq_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("sum_tokens"),
    )


# --------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, arXiv:2112.11446, Table A1): the
# published composite document filter a pretraining pipeline runs before
# dedup.  Seven rules, each a native per-row expression over whitespace
# words/lines (NOT the alnum tokenizer — Gopher counts raw words), then ONE
# map-side-combinable agg per source with per-rule failure counts, so the
# corpus crosses the shuffle as (source, 9 longs) partial aggregates.
# Mean-word-length and ratio comparisons are integer-ratio doubles —
# identical in both engines.
_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


@query(
    "gopher_quality_flags",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(text, ' +'), x -> x != '') AS words,
             string_split(text, chr(10)) AS lines,
             text
      FROM documents
    ),
    m AS (
      SELECT doc_id, source,
             cast(len(words) as bigint) AS n_words,
             cast(list_sum(list_transform(words, x -> len(x))) as bigint) AS sum_wlen,
             cast(len(list_filter(words, x -> regexp_matches(x, '[a-z]'))) as bigint)
               AS n_alpha_words,
             cast(len(list_distinct(list_filter(words,
               x -> list_contains({list(_GOPHER_STOPS)!r}, x)))) as bigint)
               AS n_stop_kinds,
             cast(length(text) - length(replace(text, '#', ''))
                  + (length(text) - length(replace(text, '...', ''))) // 3
                  as bigint) AS n_symbols,
             cast(len(lines) as bigint) AS n_lines,
             cast(len(list_filter(lines, x -> x LIKE '-%' OR x LIKE '*%'))
                  as bigint) AS n_bullet_lines,
             cast(len(list_filter(lines, x -> x LIKE '%...')) as bigint)
               AS n_ellipsis_lines
      FROM w
    ),
    r AS (
      SELECT source,
             (n_words < 50 OR n_words > 100000) AS f_wordcount,
             (n_words = 0
              OR cast(sum_wlen as double) / n_words < 3
              OR cast(sum_wlen as double) / n_words > 10) AS f_meanwordlen,
             (n_words = 0
              OR cast(n_symbols as double) / n_words > 0.1) AS f_symbolratio,
             (cast(n_bullet_lines as double) / n_lines >= 0.9) AS f_bullets,
             (cast(n_ellipsis_lines as double) / n_lines >= 0.3) AS f_ellipsis,
             (n_words = 0
              OR cast(n_alpha_words as double) / n_words < 0.8) AS f_alphawords,
             (n_stop_kinds < 2) AS f_stopwords
      FROM m
    )
    SELECT source,
           cast(count(*) as bigint) AS n_docs,
           cast(sum(CASE WHEN f_wordcount THEN 1 ELSE 0 END) as bigint) AS n_fail_wordcount,
           cast(sum(CASE WHEN f_meanwordlen THEN 1 ELSE 0 END) as bigint) AS n_fail_meanwordlen,
           cast(sum(CASE WHEN f_symbolratio THEN 1 ELSE 0 END) as bigint) AS n_fail_symbolratio,
           cast(sum(CASE WHEN f_bullets THEN 1 ELSE 0 END) as bigint) AS n_fail_bullets,
           cast(sum(CASE WHEN f_ellipsis THEN 1 ELSE 0 END) as bigint) AS n_fail_ellipsis,
           cast(sum(CASE WHEN f_alphawords THEN 1 ELSE 0 END) as bigint) AS n_fail_alphawords,
           cast(sum(CASE WHEN f_stopwords THEN 1 ELSE 0 END) as bigint) AS n_fail_stopwords,
           cast(sum(CASE WHEN NOT (f_wordcount OR f_meanwordlen OR f_symbolratio
                                   OR f_bullets OR f_ellipsis OR f_alphawords
                                   OR f_stopwords)
                         THEN 1 ELSE 0 END) as bigint) AS n_keep
    FROM r GROUP BY source
    """,
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Gopher-rule failure counts + keep count (the Table A1
    composite filter).  One narrow projection computes all seven rules
    in-row (whole-stage codegen, zero joins), one hash agg per source."""
    from ..sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    stops = F.array(*[F.lit(s) for s in _GOPHER_STOPS])
    w = docs.select(
        "source",
        F.array_remove(F.split("text", " +"), "").alias("words"),
        F.split("text", "\n").alias("lines"),
        "text",
    )
    n_words = F.size("words").cast("bigint")
    sum_wlen = F.aggregate(
        F.transform("words", lambda x: F.length(x).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    n_alpha = F.size(F.filter("words", lambda x: x.rlike("[a-z]"))).cast("bigint")
    n_stop_kinds = F.size(
        F.array_distinct(F.filter("words", lambda x: F.array_contains(stops, x)))
    ).cast("bigint")
    n_symbols = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit("#"), F.lit("")))
        + (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit("..."), F.lit("")))
        )
        / F.lit(3)
    ).cast("bigint")
    n_lines = F.size("lines").cast("bigint")
    n_bullets = F.size(
        F.filter("lines", lambda x: x.startswith("-") | x.startswith("*"))
    ).cast("bigint")
    n_ellipsis = F.size(F.filter("lines", lambda x: x.endswith("..."))).cast(
        "bigint"
    )
    m = w.select(
        "source",
        n_words.alias("n_words"),
        sum_wlen.alias("sum_wlen"),
        n_alpha.alias("n_alpha_words"),
        n_stop_kinds.alias("n_stop_kinds"),
        n_symbols.alias("n_symbols"),
        n_lines.alias("n_lines"),
        n_bullets.alias("n_bullet_lines"),
        n_ellipsis.alias("n_ellipsis_lines"),
    )
    mwl = F.col("sum_wlen").cast("double") / F.col("n_words")
    r = m.select(
        "source",
        ((F.col("n_words") < 50) | (F.col("n_words") > 100000)).alias("f_wordcount"),
        ((F.col("n_words") == 0) | (mwl < 3) | (mwl > 10)).alias("f_meanwordlen"),
        (
            (F.col("n_words") == 0)
            | (F.col("n_symbols").cast("double") / F.col("n_words") > 0.1)
        ).alias("f_symbolratio"),
        (
            F.col("n_bullet_lines").cast("double") / F.col("n_lines") >= 0.9
        ).alias("f_bullets"),
        (
            F.col("n_ellipsis_lines").cast("double") / F.col("n_lines") >= 0.3
        ).alias("f_ellipsis"),
        (
            (F.col("n_words") == 0)
            | (F.col("n_alpha_words").cast("double") / F.col("n_words") < 0.8)
        ).alias("f_alphawords"),
        (F.col("n_stop_kinds") < 2).alias("f_stopwords"),
    )
    fails = [
        "f_wordcount",
        "f_meanwordlen",
        "f_symbolratio",
        "f_bullets",
        "f_ellipsis",
        "f_alphawords",
        "f_stopwords",
    ]
    keep_col = F.lit(True)
    for f in fails:
        keep_col = keep_col & ~F.col(f)
    return r.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        *[
            F.sum(F.when(F.col(f), 1).otherwise(0))
            .cast("bigint")
            .alias(f.replace("f_", "n_fail_"))
            for f in fails
        ],
        F.sum(F.when(keep_col, 1).otherwise(0)).cast("bigint").alias("n_keep"),
    )


# --------------------------------------------------------------------------
# DISTRIBUTION DRIFT (Population Stability Index) — the pipeline-health
# monitor a continuously-ingesting 100 TB corpus runs nightly: bucket a
# numeric signal into fixed bins, compare the bin distribution of the new
# period against the old, alarm when PSI crosses ~0.2.  Absent in the
# reference (its health checks are row counts); standard in production
# feature/data pipelines.
#
# Determinism of a log-based metric across engines (the DSIR/bigram-LM
# precedent, plans/data_selection.py): Laplace-smoothed proportions are
# exact integer ratios, ln() gets ONE integer-ratio argument
# ((ca+1)(nb+10)) / ((cb+1)(na+10)) so both engines see bit-identical
# doubles, each term is rounded to 6dp per row, and the final sum is an
# exact decimal(27,6) re-sum — order-independent.
#
# Scale shape: one fact scan → one (event_type, bin) count shuffle
# (map-side combinable, ≤ |event_types|·10 groups), a 1-row min/max
# broadcast, and a 10-row-per-type grid join.  Linear in the fact.
_PSI_BINS = 10


@query(
    "distribution_drift_psi",
    oracle=f"""
    WITH ev AS ({EV_SEC}),
    ext AS (
      SELECT min(sec) AS mn, max(sec) AS mx,
             min(value) AS lo, max(value) AS hi
      FROM ev
    ),
    binned AS (
      SELECT event_type,
             CASE WHEN sec <= (mn + mx) // 2 THEN 'a' ELSE 'b' END AS period,
             CASE WHEN hi > lo
                  THEN least({_PSI_BINS - 1},
                             cast(floor(((value - lo) * {_PSI_BINS}.0) / (hi - lo)) as int))
                  ELSE 0 END AS bin
      FROM ev, ext
    ),
    counts AS (
      SELECT event_type, bin,
             cast(sum(CASE WHEN period = 'a' THEN 1 ELSE 0 END) as bigint) AS ca,
             cast(sum(CASE WHEN period = 'b' THEN 1 ELSE 0 END) as bigint) AS cb
      FROM binned GROUP BY event_type, bin
    ),
    grid AS (
      SELECT et.event_type, g.bin
      FROM (SELECT DISTINCT event_type FROM ev) et,
           (SELECT unnest(generate_series(0, {_PSI_BINS - 1})) AS bin) g
    ),
    filled AS (
      SELECT g.event_type, g.bin,
             coalesce(c.ca, 0) AS ca, coalesce(c.cb, 0) AS cb
      FROM grid g LEFT JOIN counts c
        ON c.event_type = g.event_type AND c.bin = g.bin
    ),
    tot AS (
      SELECT event_type, cast(sum(ca) as bigint) AS na,
             cast(sum(cb) as bigint) AS nb
      FROM filled GROUP BY event_type
    ),
    terms AS (
      SELECT f.event_type, t.na, t.nb,
             round((cast(f.ca + 1 as double) / cast(t.na + {_PSI_BINS} as double)
                   - cast(f.cb + 1 as double) / cast(t.nb + {_PSI_BINS} as double))
                   * ln(cast((f.ca + 1) * (t.nb + {_PSI_BINS}) as double)
                        / cast((f.cb + 1) * (t.na + {_PSI_BINS}) as double)),
                   6) AS term
      FROM filled f JOIN tot t ON t.event_type = f.event_type
    )
    SELECT event_type,
           cast(cast(sum(cast(term as decimal(27,6))) as varchar) as double) AS psi,
           cast(max(na) as bigint) AS n_a,
           cast(max(nb) as bigint) AS n_b
    FROM terms GROUP BY event_type
    """,
)
def distribution_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type PSI between the first and second halves of the time
    range, over 10 equal-width value bins with +1 Laplace smoothing."""
    ev = events_sec(spark, sf_dir).select("event_type", "value", "sec")
    ext = F.broadcast(
        ev.agg(
            F.min("sec").alias("mn"),
            F.max("sec").alias("mx"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )
    b = _PSI_BINS
    binned = ev.crossJoin(ext).select(
        "event_type",
        F.when(F.col("sec") <= F.expr("(mn + mx) div 2"), F.lit("a"))
        .otherwise(F.lit("b"))
        .alias("period"),
        F.when(
            F.col("hi") > F.col("lo"),
            F.least(
                F.lit(b - 1).cast("int"),
                F.floor(
                    ((F.col("value") - F.col("lo")) * F.lit(float(b)))
                    / (F.col("hi") - F.col("lo"))
                ).cast("int"),
            ),
        )
        .otherwise(F.lit(0))
        .alias("bin"),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("period") == "a", 1).otherwise(0))
        .cast("bigint")
        .alias("ca"),
        F.sum(F.when(F.col("period") == "b", 1).otherwise(0))
        .cast("bigint")
        .alias("cb"),
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            spark.range(b).select(F.col("id").cast("int").alias("bin"))
        )
    )
    filled = (
        grid.join(counts, ["event_type", "bin"], "left")
        .select(
            "event_type",
            "bin",
            F.coalesce("ca", F.lit(0)).cast("bigint").alias("ca"),
            F.coalesce("cb", F.lit(0)).cast("bigint").alias("cb"),
        )
    )
    tot = filled.groupBy("event_type").agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
    )
    terms = filled.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "na",
        "nb",
        F.round(
            (
                (F.col("ca") + 1).cast("double") / (F.col("na") + b).cast("double")
                - (F.col("cb") + 1).cast("double") / (F.col("nb") + b).cast("double")
            )
            * F.log(
                ((F.col("ca") + 1) * (F.col("nb") + b)).cast("double")
                / ((F.col("cb") + 1) * (F.col("na") + b)).cast("double")
            ),
            6,
        ).alias("term"),
    )
    return terms.groupBy("event_type").agg(
        F.sum(F.col("term").cast("decimal(27,6)")).cast("double").alias("psi"),
        F.max("na").cast("bigint").alias("n_a"),
        F.max("nb").cast("bigint").alias("n_b"),
    )


# --------------------------------------------------------------------------
# K-ANONYMITY AUDIT — the privacy-side curation check: how identifiable is
# a row by its quasi-identifiers?  A class (unique quasi-identifier
# combination) smaller than k means its members are re-identifiable; the
# audit reports, per nation, how many classes violate k and how many rows
# sit in them.  One groupBy on the quasi-id tuple + one re-agg — both
# map-side combinable, linear in the dim.
_KANON_K = 5


@query(
    "k_anonymity_audit",
    oracle=f"""
    WITH ext AS (
      SELECT min(c_acctbal) AS lo, max(c_acctbal) AS hi FROM customer
    ),
    q AS (
      SELECT c_nationkey,
             c_mktsegment,
             CASE WHEN hi > lo
                  THEN least(9, cast(floor(((c_acctbal - lo) * 10.0) / (hi - lo)) as int))
                  ELSE 0 END AS bal_decile
      FROM customer, ext
    ),
    classes AS (
      SELECT c_nationkey, c_mktsegment, bal_decile,
             cast(count(*) as bigint) AS class_size
      FROM q GROUP BY c_nationkey, c_mktsegment, bal_decile
    )
    SELECT c_nationkey AS nation_key,
           cast(count(*) as bigint) AS n_classes,
           cast(sum(CASE WHEN class_size < {_KANON_K} THEN 1 ELSE 0 END) as bigint) AS n_violating,
           cast(min(class_size) as bigint) AS min_class_size,
           cast(sum(CASE WHEN class_size < {_KANON_K} THEN class_size ELSE 0 END) as bigint) AS rows_at_risk
    FROM classes GROUP BY c_nationkey
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation k-anonymity report over the quasi-identifier tuple
    (nation, market segment, account-balance decile), k={k}."""
    from ..sources.tables import load_table

    cust = load_table(spark, sf_dir, "customer")
    ext = F.broadcast(
        cust.agg(F.min("c_acctbal").alias("lo"), F.max("c_acctbal").alias("hi"))
    )
    q = cust.crossJoin(ext).select(
        "c_nationkey",
        "c_mktsegment",
        F.when(
            F.col("hi") > F.col("lo"),
            F.least(
                F.lit(9).cast("int"),
                F.floor(
                    ((F.col("c_acctbal") - F.col("lo")) * F.lit(10.0))
                    / (F.col("hi") - F.col("lo"))
                ).cast("int"),
            ),
        )
        .otherwise(F.lit(0))
        .alias("bal_decile"),
    )
    classes = q.groupBy("c_nationkey", "c_mktsegment", "bal_decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("class_size")
    )
    k = _KANON_K
    return classes.groupBy(F.col("c_nationkey").alias("nation_key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum(F.when(F.col("class_size") < k, 1).otherwise(0))
        .cast("bigint")
        .alias("n_violating"),
        F.min("class_size").cast("bigint").alias("min_class_size"),
        F.sum(F.when(F.col("class_size") < k, F.col("class_size")).otherwise(0))
        .cast("bigint")
        .alias("rows_at_risk"),
    )


k_anonymity_audit.__doc__ = k_anonymity_audit.__doc__.format(k=_KANON_K)


# --------------------------------------------------------------------------
# Weighted priority sampling (Duffield-Lund-Thorup, JACM'07) — the
# corpus-mixing primitive: draw a fixed-size per-source sample where
# selection probability is monotone in a quality weight, REPRODUCIBLY.
# Priority q_i = w_i / u_i with u_i a deterministic uniform from the
# portable 60-bit md5 hash (functions/hashing.py); take the top-k
# priorities per source.  Chosen over Efraimidis-Spirakis u^(1/w) keys
# deliberately: u^(1/w) needs pow/ln, whose last-ulp differs across libm
# implementations and would break bit-exact oracle parity — w/u is ONE
# IEEE-correctly-rounded division, identical in every engine.  At 100 TB
# this is a map-only projection + per-source top-k (TakeOrdered within
# window partitions): no shuffle beyond the (source) key, no RNG state,
# re-runs and backfills pick the identical sample.
_PS_K = 5
_PS_SEED = "ps"


@query(
    "priority_sample_per_source",
    oracle=f"""
    WITH pri AS (
      SELECT source, doc_id, n_chars,
             cast(n_chars as double)
               / cast({hash64_sql("cast(doc_id as varchar)", _PS_SEED)} + 1 as double)
               AS priority,
             row_number() OVER (
               PARTITION BY source
               ORDER BY cast(n_chars as double)
                 / cast({hash64_sql("cast(doc_id as varchar)", _PS_SEED)} + 1 as double)
                 DESC, doc_id ASC
             ) AS rk
      FROM documents
    )
    SELECT source, cast(rk as bigint) AS rk, doc_id,
           cast(n_chars as bigint) AS n_chars
    FROM pri WHERE rk <= {_PS_K}
    """,
)
def priority_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source weighted sample: top-{k} priorities (w/u) per source,
    weight = n_chars.  Deterministic: same corpus -> same sample, any
    cluster size, any run."""
    from ..sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    u = (hash64(F.col("doc_id").cast("string"), _PS_SEED) + F.lit(1)).cast(
        "double"
    )
    pri = docs.select(
        "source",
        "doc_id",
        "n_chars",
        (F.col("n_chars").cast("double") / u).alias("priority"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("priority").desc(), F.col("doc_id").asc()
    )
    return (
        pri.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _PS_K)
        .select(
            "source",
            F.col("rk").cast("bigint").alias("rk"),
            "doc_id",
            F.col("n_chars").cast("bigint").alias("n_chars"),
        )
    )


priority_sample_per_source.__doc__ = priority_sample_per_source.__doc__.format(
    k=_PS_K
)


# --------------------------------------------------------------------------
# SOURCE EPOCH MIXING — materialize a training mix where higher-quality
# sources repeat for more epochs (the FineWeb/Dolma "epochs per source"
# upsampling recipe; `source_mixing_weights` computes proportions, THIS
# op turns integer epoch counts into actual sample instances).  Sources
# rank into 4 quality tiers (avg doc length proxy, ntile over the
# source-count-sized frame) = epochs 1..4; each doc explodes into `epochs`
# sample instances carrying a portable 60-bit shuffle key
# hash(doc_id||epoch), so a downstream shard writer range-partitions on
# the key and every epoch of every source interleaves uniformly — no
# global sort, no RNG.  The per-source readout pins n_samples =
# n_docs × epochs and the interleave itself: the count of samples in the
# lower half of the key domain (~n_samples/2 for a uniform hash, exact
# integer both engines).  100 TB shape: explode factor ≤ 4, one
# map-combinable agg; the expansion is a zero-shuffle projection.
@query(
    "source_epoch_mixing",
    oracle=f"""
    WITH stats AS (
      SELECT source, count(*) AS n_docs,
             sum(n_chars) AS sum_chars
      FROM documents GROUP BY source
    ),
    tiers AS (
      SELECT source, n_docs,
             ntile(4) OVER (ORDER BY sum_chars * 1000 // n_docs, source)
               AS epochs
      FROM stats
    ),
    samples AS (
      SELECT d.source, t.epochs,
             {hash64_sql("cast(d.doc_id as varchar) || '#' || cast(e.epoch as varchar)", "mix")} AS skey
      FROM documents d
      JOIN tiers t USING (source)
      CROSS JOIN (SELECT unnest(range(1, 5)) AS epoch) e
      WHERE e.epoch <= t.epochs
    )
    SELECT source,
           cast(any_value(epochs) as bigint) AS epochs,
           cast(count(*) as bigint) AS n_samples,
           cast(sum(CASE WHEN skey < {1 << (HASH_BITS - 1)} THEN 1 ELSE 0 END)
                as bigint) AS n_lower_half
    FROM samples
    GROUP BY source
    """,
)
def source_epoch_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    stats = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )
    # quality proxy in exact integer arithmetic (sum*1000 DIV n) so the
    # tier boundaries are engine-independent; the ntile window runs on the
    # source-count-sized frame (20 rows here, thousands at worst)
    tiers = stats.withColumn(
        "epochs",
        F.ntile(4).over(
            Window.orderBy(
                F.expr("sum_chars * 1000 DIV n_docs"), F.col("source")
            )
        ),
    ).select("source", "epochs")
    samples = (
        docs.join(F.broadcast(tiers), "source")
        .select(
            "source",
            "epochs",
            F.explode(F.expr("sequence(1, epochs)")).alias("epoch"),
            "doc_id",
        )
        .select(
            "source",
            "epochs",
            hash64(
                F.concat_ws("#", F.col("doc_id"), F.col("epoch")), "mix"
            ).alias("skey"),
        )
    )
    return samples.groupBy("source").agg(
        F.first("epochs").cast("bigint").alias("epochs"),
        F.count(F.lit(1)).cast("bigint").alias("n_samples"),
        F.sum(
            F.when(F.col("skey") < (1 << (HASH_BITS - 1)), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_lower_half"),
    )


# --------------------------------------------------------------------------
# DATA-QUALITY EXPECTATION SUITE — the Great-Expectations/dbt-test shape a
# production pipeline runs before publishing a fact: declarative
# expectations (not-null, value range, primary-key uniqueness,
# referential integrity to a dim, freshness window, row-count floor)
# evaluated in as few passes as the expectation mix allows — here ONE
# conditional-aggregate scan over orders + one duplicate-count aggregate
# + one broadcast anti-join against the customer dim.  Output is the
# violations report: one row per expectation with its violation count and
# pass verdict, which is what a publish gate consumes.  At 100 TB: the
# scan-expectations fold into a single map-combinable pass; the RI check
# broadcasts the dim key set; the uniqueness check is the only key-wide
# shuffle (and rides the PK the table is typically already bucketed by).
# Reference provenance: the reference's MonitorApp checks only per-day
# row EXISTENCE (`monitor/MonitorApp.scala:16-48`); this is the
# column-level widening of that completeness gate.
@query(
    "data_quality_expectations",
    oracle="""
    WITH scan AS (
      SELECT
        sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_cust,
        sum(CASE WHEN o_totalprice <= 0 OR o_totalprice > 1000000 THEN 1
                 ELSE 0 END) AS range_price,
        sum(CASE WHEN year(o_orderdate) < 1992 OR year(o_orderdate) > 1998
                 THEN 1 ELSE 0 END) AS fresh_date,
        count(*) AS n_rows
      FROM orders
    ),
    dup AS (
      SELECT coalesce(sum(c - 1), 0) AS dup_keys FROM (
        SELECT count(*) AS c FROM orders GROUP BY o_orderkey
      ) g WHERE c > 1
    ),
    ri AS (
      -- NULL keys are the not_null expectation's finding, not an RI
      -- orphan (and NOT IN would silently drop them anyway): both
      -- engines check non-null keys only
      SELECT count(*) AS orphans FROM orders o
      WHERE o.o_custkey IS NOT NULL
        AND o.o_custkey NOT IN (SELECT c_custkey FROM customer
                                WHERE c_custkey IS NOT NULL)
    )
    SELECT e.expectation, e.violations, e.violations = 0 AS passed
    FROM (
      SELECT 'not_null:o_custkey' AS expectation,
             cast(null_cust as bigint) AS violations FROM scan
      UNION ALL
      SELECT 'range:o_totalprice(0,1e6]', cast(range_price as bigint) FROM scan
      UNION ALL
      SELECT 'freshness:o_orderdate[1992,1998]', cast(fresh_date as bigint)
      FROM scan
      UNION ALL
      SELECT 'row_count>=1000', cast(CASE WHEN n_rows >= 1000 THEN 0
                                          ELSE 1 END as bigint) FROM scan
      UNION ALL
      SELECT 'unique:o_orderkey', cast(dup_keys as bigint) FROM dup
      UNION ALL
      SELECT 'ref_integrity:o_custkey->customer', cast(orphans as bigint)
      FROM ri
    ) e
    """,
)
def data_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    # pass 1: every scan-expressible expectation in ONE conditional agg
    scan = orders.agg(
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("null_cust"),
        F.sum(
            F.when(
                (F.col("o_totalprice") <= 0) | (F.col("o_totalprice") > 1000000),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("range_price"),
        F.sum(
            F.when(
                (F.year("o_orderdate") < 1992) | (F.year("o_orderdate") > 1998), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("fresh_date"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    # pass 2: PK uniqueness (the one key-wide shuffle)
    dup = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).cast("bigint").alias("dup_keys"))
    )
    # pass 3: referential integrity via broadcast anti-join on the dim.
    # NULL keys are excluded on BOTH sides (they are the not_null
    # expectation's finding; a left_anti would count them, SQL NOT IN
    # would drop them — either way an engine mismatch on dirty data)
    ri = (
        orders.where(F.col("o_custkey").isNotNull())
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("orphans"))
    )

    def row(name: str, col: F.Column, src: DataFrame) -> DataFrame:
        return src.select(
            F.lit(name).alias("expectation"),
            col.cast("bigint").alias("violations"),
        )

    report = (
        row("not_null:o_custkey", F.col("null_cust"), scan)
        .unionByName(row("range:o_totalprice(0,1e6]", F.col("range_price"), scan))
        .unionByName(
            row("freshness:o_orderdate[1992,1998]", F.col("fresh_date"), scan)
        )
        .unionByName(
            row(
                "row_count>=1000",
                F.when(F.col("n_rows") >= 1000, 0).otherwise(1),
                scan,
            )
        )
        .unionByName(row("unique:o_orderkey", F.col("dup_keys"), dup))
        .unionByName(row("ref_integrity:o_custkey->customer", F.col("orphans"), ri))
    )
    return report.withColumn("passed", F.col("violations") == 0)
