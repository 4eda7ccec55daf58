"""Physical-plan assertions: the properties that matter at 100 TB.

These tests pin the *plan shape*, not the result: filters reach the parquet
scan (pushdown), projections prune columns, dim joins broadcast, partition
filters prune directories, and aggregations keep a partial (map-side) phase.
A regression here is invisible at sf0.01 and fatal at 100 TB.
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import functions as F

from bigdata_homed_spark.operators.enrich import dim_join
from bigdata_homed_spark.sources.sinks import write_partitioned_fact
from bigdata_homed_spark.sources.tables import load_table


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def window_partition_specs(plan: str) -> list[str]:
    """Partition spec of every Window physical node in a plan string.

    On this Spark build a Window node prints ``Window [exprs],
    [partitionSpec], [orderSpec]`` and OMITS any empty list — so a
    partition-less ordered window prints ``[exprs], [orderSpec]`` and an
    UNORDERED window aggregate prints ``[exprs], [partitionSpec]`` (the
    runtime WARN string "No Partition Defined" never appears in
    ``executedPlan().toString()``).  A two-list node is disambiguated by
    the sort-direction tokens (``ASC``/``DESC``) that every order spec
    carries and no partition spec does.  Returns one entry per Window
    node: its partition-spec text, or ``""`` for a partition-less
    (single-partition) window.  The guard's own sensitivity is pinned by
    test_window_guard_detects_partitionless.
    """
    specs: list[str] = []
    for raw in plan.splitlines():
        line = re.sub(r"^[+\-:|\s]*", "", raw)
        line = re.sub(r"^\*\(\d+\)\s*", "", line)  # codegen-stage prefix
        if not line.startswith("Window "):
            continue
        groups: list[str] = []
        depth, cur = 0, []
        for ch in line.split(" ", 1)[1]:
            if ch == "[":
                depth += 1
                if depth == 1:
                    cur = []
                    continue
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append("".join(cur))
                    continue
            if depth >= 1:
                cur.append(ch)
        if len(groups) >= 3:
            specs.append(groups[1])
        elif len(groups) == 2 and not re.search(r"\b(ASC|DESC)\b", groups[1]):
            specs.append(groups[1])  # [exprs], [partitionSpec] (unordered agg)
        else:
            specs.append("")
    return specs


def test_window_guard_detects_partitionless(spark):
    """The partition-spec parser must actually flag a global window and
    pass a keyed one — this pins the guard itself against plan-format
    drift (a vacuous guard here would blind every window assertion)."""
    from pyspark.sql import Window as W

    df = spark.range(10).withColumn("k", F.col("id") % 2)
    bad = plan_of(df.withColumn("rn", F.row_number().over(W.orderBy("id"))))
    good = plan_of(
        df.withColumn("rn", F.row_number().over(W.partitionBy("k").orderBy("id")))
    )
    assert window_partition_specs(bad) == [""]
    (gspec,) = window_partition_specs(good)
    assert "k#" in gspec
    # unordered window aggregate: prints [exprs], [partitionSpec] — the
    # two-list form must still be recognized as partitioned...
    agg_part = plan_of(
        df.withColumn("t", F.sum("id").over(W.partitionBy("k")))
    )
    (aspec,) = window_partition_specs(agg_part)
    assert "k#" in aspec
    # ...and the fully-global spelling as partition-less
    agg_global = plan_of(
        df.withColumn(
            "t",
            F.sum("id").over(
                W.orderBy("id").rowsBetween(
                    W.unboundedPreceding, W.unboundedFollowing
                )
            ),
        )
    )
    assert window_partition_specs(agg_global) == [""]


def test_filter_pushdown_to_parquet(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = li.where(F.col("l_shipdate") < "1996-01-01").select("l_orderkey", "l_quantity")
    plan = formatted(df)
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1].splitlines()[0]


def test_column_pruning(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = li.select("l_orderkey", "l_quantity")
    plan = formatted(df)
    # ReadSchema must carry only the projected columns, not all 11
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema


def test_dim_join_broadcasts(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = dim_join(orders, cust, orders["o_custkey"] == cust["c_custkey"], "inner")
    assert "BroadcastHashJoin" in plan_of(joined)


def test_interval_join_is_not_nested_loop(spark, sf_dir):
    """The EPG-style equi+range join must plan as a hash join with the range
    as residual — not BroadcastNestedLoopJoin (which dies at scale)."""
    from bigdata_homed_spark.plans.core_relational import interval_join_ship_window

    plan = plan_of(interval_join_ship_window(spark, sf_dir))
    assert "NestedLoop" not in plan
    assert "Join" in plan


def test_partition_pruning_on_fact(spark, sf_dir):
    path = os.path.join(tempfile.mkdtemp(prefix="prune_"), "fact")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format(F.timestamp_seconds(F.col("ts_sec")), "yyyyMMdd")
    )
    write_partitioned_fact(ev, path, ["day"])
    scan = spark.read.parquet(path).where(F.col("day") == "20240105")
    plan = formatted(scan)
    # the day predicate must land in PartitionFilters (directory pruning),
    # not in the data Filter (post-scan)
    assert "PartitionFilters" in plan
    pf_line = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "20240105" in pf_line


def test_aggregate_has_partial_phase(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    plan = plan_of(agg)
    # Catalyst plans partial + final HashAggregate around one exchange
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange") == 1


def test_whole_stage_codegen_covers_hot_path(spark, sf_dir):
    from bigdata_homed_spark.plans.text_pipeline import token_stats

    plan = plan_of(token_stats(spark, sf_dir))
    # '*(n)' marks a WholeStageCodegen stage in the executed-plan string
    assert "*(1)" in plan or "WholeStageCodegen" in plan


def test_knn_broadcasts_queries_not_candidates(spark, sf_dir):
    from bigdata_homed_spark.plans.similarity import embedding_knn

    plan = plan_of(embedding_knn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_dynamic_partition_pruning(spark, sf_dir):
    """Joining a day-partitioned fact to a FILTERED dim on the partition key
    must plan a dynamic-pruning subquery on the fact scan — at 100 TB this
    is the difference between scanning 3 partitions and scanning 3 years."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.date_format(F.timestamp_seconds("ts_sec"), "yyyy-MM-dd").alias("day")
    )
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "fact")
        dimpath = os.path.join(d, "dim")
        write_partitioned_fact(ev, path, ["day"])
        # DPP wants a materialized dim with a selective source filter —
        # a dim derived from the same in-memory scan does not qualify
        ev.select("day").distinct().withColumn(
            "flag", F.monotonically_increasing_id()
        ).write.parquet(dimpath)
        fact = spark.read.parquet(path)
        dim = spark.read.parquet(dimpath).where(F.col("flag") < 3)
        joined = fact.join(dim, "day")
        plan = formatted(joined)
        assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_runtime_bloom_filter_prunes_fact_join(spark, sf_dir):
    """Spark 4's runtime bloom-filter join pruning (on by default in our
    session) injects a `might_contain` semi-filter on the big fact side of a
    shuffle join whose other side is selectively filtered — at 100 TB this
    skips most fact rows before the shuffle.  The 10 GB application-side
    threshold is naturally met at scale; the test lowers it to observe the
    injection on test data.  Broadcast is disabled to force the shuffle-join
    path the optimization targets."""
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "1KB",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).groupBy(
            "o_orderpriority"
        ).count()
        assert "might_contain" in formatted(j)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join(spark):
    """100 TB skew story, measured not asserted-by-config: with one
    pathologically hot key, AQE's skew-join handling must actually engage
    (SortMergeJoin(skew=true) in the FINAL adaptive plan) and still return
    exact results.  Thresholds are lowered so test-scale data exhibits
    "skew" the same way a hot key does at cluster scale; `salted_join`
    (test_salted_join_matches_plain_join) is the explicit fallback for
    engines/paths where AQE can't see the skew."""
    from pyspark.sql import functions as F

    keys = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        # skew is judged vs the MEDIAN partition; pin the width so the
        # hot key exceeds factor×median regardless of the suite's default
        "spark.sql.shuffle.partitions": "32",
    }
    prev = {k: spark.conf.get(k, None) for k in keys}
    try:
        for k, v in keys.items():
            spark.conf.set(k, v)
        left = spark.range(0, 300_000).select(
            F.when(F.col("id") % 10 == 0, 7).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(0, 50_000).select(
            F.col("id").alias("k"), F.lit("r").alias("tag")
        )
        j = left.join(right, "k")
        n = len(j.collect())
        # every id<50k with id%10!=0 matches once; the hot key 7 gets
        # 30k copies of left × 1 right = 30k rows
        assert n == 45_000 + 30_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE did not split the skewed partition"
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_business_reports_broadcast_and_no_global_windows(spark, sf_dir):
    """Round-4 report family plan pins: every dim join broadcasts, no
    report query plans a partition-less global window, and the lifecycle
    CASE's window predicate reaches the orders scan."""
    from bigdata_homed_spark.plans.business_reports import (
        billing_program_revenue,
        package_revenue_report,
        recommend_result_enrich,
        user_profile_labels,
    )

    for fn in (package_revenue_report, billing_program_revenue, recommend_result_enrich):
        plan = plan_of(fn(spark, sf_dir))
        assert "BroadcastHashJoin" in plan, fn.__name__
        assert "SortMergeJoin" not in plan, fn.__name__

    # argmax windows must be user-partitioned, never single-partition
    plan = plan_of(user_profile_labels(spark, sf_dir))
    specs = window_partition_specs(plan)
    assert specs, "expected at least one Window node"
    for spec in specs:
        assert "user_id" in spec, spec


def test_package_revenue_pushes_window_filter(spark, sf_dir):
    """The buy/exp window predicate is derived (day arithmetic), so it
    cannot reach PushedFilters — but it must still run BEFORE the joins
    (filter below the broadcast joins), keeping the fact slice minimal."""
    from bigdata_homed_spark.plans.business_reports import package_revenue_report

    plan = formatted(package_revenue_report(spark, sf_dir))
    filter_pos = plan.find("Filter")
    join_pos = plan.find("BroadcastHashJoin")
    assert filter_pos != -1 and join_pos != -1


def test_late_r4_family_plans(spark, sf_dir):
    """Late-round-4 analogs: dims broadcast everywhere, every window is
    key-partitioned (no single-partition WindowExec), and the period-grain
    queries' history bound joins as a tiny broadcast — never a shuffle."""
    from bigdata_homed_spark.plans.demand_columns import (
        column_demand_program_details,
        demand_column_user_types,
        package_program_periods,
    )
    from bigdata_homed_spark.plans.etl_queries import arate_subtree_split
    from bigdata_homed_spark.plans.realtime_snapshots import (
        program_lookback_snapshot,
    )
    from bigdata_homed_spark.plans.similarity import embedding_pq_search
    from bigdata_homed_spark.plans.text_pipeline import boilerplate_line_removal
    from bigdata_homed_spark.plans.user_census import user_census_by_area

    for fn in (
        demand_column_user_types,
        column_demand_program_details,
        package_program_periods,
        user_census_by_area,
        program_lookback_snapshot,
        arate_subtree_split,
        boilerplate_line_removal,
        embedding_pq_search,
    ):
        plan = plan_of(fn(spark, sf_dir))
        assert "BroadcastHashJoin" in plan, fn.__name__
        assert "SortMergeJoin" not in plan, fn.__name__
        # every Window node must carry a non-empty partition spec
        for spec in window_partition_specs(plan):
            assert spec != "", fn.__name__


def test_star_rank_period_single_exchange_for_windows(spark, sf_dir):
    """star_rank_period_heat's totals windows and rank window share the
    (f_period_type, f_date) partitioning: the plan must contain exactly ONE
    exchange hash-partitioned on those keys feeding both window operators,
    and no partition-less window."""
    from bigdata_homed_spark.plans.rank_lifecycle import star_rank_period_heat

    plan = plan_of(star_rank_period_heat(spark, sf_dir))
    specs = window_partition_specs(plan)
    assert specs and all(specs), specs
    # exchanges partitioned on EXACTLY (f_period_type, f_date) — the agg
    # exchanges carry more keys and don't match
    n_period_exchanges = len(
        re.findall(r"hashpartitioning\(f_period_type#\d+, f_date#\d+, \d+\)", plan)
    )
    assert n_period_exchanges == 1, plan[:2000]
    # the rank window must get the group-limit pushdown (top-100 per key
    # computed partially before the final sort, not rank-then-filter)
    assert "WindowGroupLimit" in plan


def test_late_r5_family_plans(spark, sf_dir):
    """Late-round-5 additions: every window key-partitioned; the
    broadcast/join structure each plan promises is the one Catalyst
    actually picks."""
    from bigdata_homed_spark.plans.data_selection import (
        bigram_lm_quality,
        char_entropy_quality,
        dsir_selection,
        exact_substring_spans,
        incremental_substring_report,
    )
    from bigdata_homed_spark.plans.layout_queries import zorder_locality
    from bigdata_homed_spark.plans.lifecycle import scd2_status_history
    from bigdata_homed_spark.plans.similarity import hard_negative_mining

    for fn in (
        exact_substring_spans,
        incremental_substring_report,
        dsir_selection,
        bigram_lm_quality,
        scd2_status_history,
        hard_negative_mining,
        zorder_locality,
        char_entropy_quality,
    ):
        plan = plan_of(fn(spark, sf_dir))
        for spec in window_partition_specs(plan):
            assert spec != "", fn.__name__

    # DSIR's bucket log-ratio table must broadcast (<= 64 rows)
    assert "BroadcastHashJoin" in plan_of(dsir_selection(spark, sf_dir))
    # the entropy signal is pure projection: no join, no window, no shuffle
    # beyond the scan side
    ent = plan_of(char_entropy_quality(spark, sf_dir))
    assert "Join" not in ent and "Window" not in ent
    # z-order locality: the only join is the 1-row extent broadcast
    zl = plan_of(zorder_locality(spark, sf_dir))
    assert "SortMergeJoin" not in zl and "ShuffledHashJoin" not in zl
    # SCD2: all three windows ride ONE exchange (a single user_id shuffle)
    scd = plan_of(scd2_status_history(spark, sf_dir))
    assert scd.count("Exchange hashpartitioning") == 1


def test_late_r7b_family_plans(spark, sf_dir):
    """Round-7b additions: rolling actives / z-score / basket rules /
    triangles — every window key-partitioned, no data-sized nested-loop
    join, the expensive side cut before enrichment joins."""
    from bigdata_homed_spark.plans.analysis_queries import (
        rolling_active_users,
        timeseries_zscore_outliers,
    )
    from bigdata_homed_spark.plans.graph_queries import (
        association_rules_parts,
        triangle_count_copurchase,
    )

    for fn in (
        rolling_active_users,
        timeseries_zscore_outliers,
        association_rules_parts,
        triangle_count_copurchase,
    ):
        plan = plan_of(fn(spark, sf_dir))
        for spec in window_partition_specs(plan):
            assert spec != "", fn.__name__

    # rolling actives: the observed-days semi-filter broadcasts; the 28x
    # fan-out is explode (GENERATE), never a day-grid nested loop
    ra = plan_of(rolling_active_users(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in ra
    assert "Generate explode" in ra
    # z-score: series compaction then ONE keyed window — exactly two
    # exchanges (groupBy day-series, window by event_type), no join at all
    zs = plan_of(timeseries_zscore_outliers(spark, sf_dir))
    assert "Join" not in zs
    assert zs.count("Exchange hashpartitioning") == 2
    # association rules: the pair frame is cut to K rows by a global
    # TakeOrdered BEFORE the dim joins, and both dim joins broadcast;
    # the only nested loop is the 1-row n_orders scalar readout
    ar = plan_of(association_rules_parts(spark, sf_dir))
    assert "TakeOrderedAndProject" in ar
    assert ar.count("BroadcastHashJoin") >= 2
    assert ar.count("BroadcastNestedLoopJoin") <= 1
    # triangles: degree lookups broadcast; the wedge-closure join is an
    # equi-join (hash/merge), never BNL
    tc = plan_of(triangle_count_copurchase(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in tc
    # growth accounting: min/lag/lead share ONE user_id exchange+sort; the
    # churn attachment is an equi-join, no BNL anywhere
    from bigdata_homed_spark.plans.analysis_queries import growth_accounting

    ga = plan_of(growth_accounting(spark, sf_dir))
    for spec in window_partition_specs(ga):
        assert spec != ""
    assert "BroadcastNestedLoopJoin" not in ga


def test_twap_and_trending_plans(spark, sf_dir):
    """TWAP: one keyed exchange, no join; trending: windows over the
    compacted series, every window key-partitioned."""
    from bigdata_homed_spark.plans.analysis_queries import (
        time_weighted_average,
        trending_daily_movers,
    )

    tw = plan_of(time_weighted_average(spark, sf_dir))
    assert "Join" not in tw
    assert tw.count("Exchange hashpartitioning") == 1
    for spec in window_partition_specs(tw):
        assert spec != ""
    tr = plan_of(trending_daily_movers(spark, sf_dir))
    assert "Join" not in tr
    for spec in window_partition_specs(tr):
        assert spec != ""


def test_bloom_filter_runtime_join_pruning(spark, sf_dir):
    """Runtime row-level join pruning (the Spark 3.3+ bloom-filter
    injection): a selective dim filter joined to a big fact over SMJ gets
    a BloomFilterMightContain probe pushed into the FACT scan side — rows
    that can't match die before the shuffle, the 100 TB lever for
    selective fact-dim joins that can't broadcast.  Pinned here so a
    future session-config change can't silently lose the injection."""
    from bigdata_homed_spark.sources.tables import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # scale the creation thresholds to test data volume (defaults are
        # sized for 10MB+ build sides)
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1000000b",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        orders = load_table(spark, sf_dir, "orders").where(
            "o_orderpriority = '1-URGENT'"
        ).select("o_orderkey")
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        joined = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        n = joined.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan, plan[:2000]
        # correctness unchanged by the probe
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        assert joined.count() == n
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bucketed_fact_join_has_no_exchange(spark, sf_dir, tmp_path_factory):
    """The 100 TB fact-fact co-location strategy (SURVEY §2 scale design;
    reference `etl/MysqlToHive.scala` writes day-partitioned facts that
    downstream jobs re-join every night): both facts written
    ``bucketBy(join_key)`` join with ZERO shuffle exchanges — the scan's
    bucket hash IS the join distribution, so a nightly lineitem⋈orders at
    any scale moves no rows.  Broadcast is disabled for the exhibit (at
    real scale neither side fits; the point is the shuffle-free SMJ)."""
    import pyspark.sql.functions as F

    from bigdata_homed_spark.sources.tables import load_table

    tmp = tmp_path_factory.mktemp("bucketed")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        for name, df, key in (
            ("b_lineitem", li, "l_orderkey"),
            ("b_orders", orders, "o_orderkey"),
        ):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            (
                df.write.mode("overwrite")
                .option("path", str(tmp / name))
                .bucketBy(8, key)
                .sortBy(key)
                .format("parquet")
                .saveAsTable(name)
            )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        joined.collect()  # executed plan (AQE final)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # the scan really is bucket-pruned-capable (bucketed read, not a
        # plain file scan that happened to avoid a shuffle)
        assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_r10_sketch_and_mixing_family_plans(spark, sf_dir):
    """r10 family plan pins: the HDR sketch aggregate keeps a partial
    (map-side) phase — the whole point of a mergeable sketch is that the
    combine happens before the exchange; the KMV A-not-B reaches its
    sketches through TakeOrderedAndProject K-row cuts (never a data-sized
    sort or cross join); the epoch-mixing expansion broadcasts the
    source-count-sized tier table and the explode adds no exchange of its
    own."""
    from bigdata_homed_spark.plans import QUERIES

    hdr = plan_of(QUERIES["hdr_histogram_quantiles"](spark, sf_dir))
    assert re.search(r"HashAggregate.*partial", hdr, re.IGNORECASE) or (
        "partial_count" in hdr or "Partial" in hdr
    ), hdr
    anotb = plan_of(QUERIES["kmv_anotb_audience"](spark, sf_dir))
    assert "TakeOrderedAndProject" in anotb, anotb
    mix = plan_of(QUERIES["source_epoch_mixing"](spark, sf_dir))
    assert "BroadcastExchange" in mix or "BroadcastHashJoin" in mix, mix
    assert "Generate explode" in mix or "Generate" in mix, mix
    # the expansion path scan -> explode -> hash -> partial agg is one
    # codegen'd stage: no exchange between the fact scan and the partial
    # aggregate beyond the broadcast side
    shuffles = len(re.findall(r"Exchange hashpartitioning", mix))
    assert shuffles <= 3, mix


def test_merge_commit_job_count_ceiling(spark, tmp_path):
    """Pin the r10 driver-job floor of a CoW merge commit (16 -> 10 jobs).

    Per-job fixed cost dominates commit wall time on the local harness
    (and schedules a full round-trip at any scale), so the r10 fusions
    (write-as-probe, footer key-range fold, survivor-write-as-emptiness-
    probe) are pinned by job COUNT — a regression to any pre-fusion shape
    re-adds whole jobs, which this ceiling catches deterministically."""
    from bigdata_homed_spark.sources.snapshots import SnapshotTable

    tr = spark.sparkContext._jsc.sc().statusTracker()
    t = SnapshotTable(str(tmp_path / "jc_merge"))
    t.commit_append(
        spark.range(0, 1000).selectExpr("id as k", "id*2 as v"), stats_cols=["k"]
    )
    before = len(tr.getJobIdsForGroup(None))
    t.commit_merge(
        spark.range(100, 200).selectExpr("id as k", "id*7 as v"),
        key="k",
        stats_cols=["k"],
    )
    assert len(tr.getJobIdsForGroup(None)) - before <= 10


def test_merge_latest_job_count_ceiling(spark, tmp_path):
    """Pin the state store's per-batch floor: merge_latest is TWO logical
    actions (bounded touched-bucket collect + staged bucket write), which
    expand to <= 6 scheduler jobs per steady-state batch under AQE.  The
    pre-r10 shapes (separate horizon agg, eager pre-write checkpoint,
    read-then-upsert) each re-add whole actions; this ceiling catches
    them."""
    import tempfile

    from bigdata_homed_spark.sources.sinks import PartitionedStateStore

    tr = spark.sparkContext._jsc.sc().statusTracker()
    store = PartitionedStateStore(
        tempfile.mkdtemp(prefix="jc_state_", dir=str(tmp_path)), ["k"], n_buckets=8
    )
    counts = []
    for b in range(3):
        upd = spark.range(b * 100, b * 100 + 300).selectExpr(
            "id % 400 as k", "id as sec", "id*2 as v"
        )
        before = len(tr.getJobIdsForGroup(None))
        store.merge_latest(upd, ["sec"])
        counts.append(len(tr.getJobIdsForGroup(None)) - before)
    assert max(counts) <= 6, counts
