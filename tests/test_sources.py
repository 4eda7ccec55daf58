"""Source/sink interface tests (JDBC gated — no database in container)."""

from __future__ import annotations

from bigdata_homed_spark.sources.jdbc import (
    jdbc_partitioned_options,
    jdbc_subquery_options,
)
from bigdata_homed_spark.sources.tables import TABLES, load_tables, register_views


def test_jdbc_interface():
    opts = jdbc_subquery_options(
        "jdbc:mysql://host/db", "select DA, region_id from account_info", "u", "p"
    )
    assert opts["dbtable"].startswith("(") and opts["dbtable"].endswith(") as t")
    popts = jdbc_partitioned_options(
        "jdbc:mysql://host/db", "t_user", "DA", 1, 99999999, 5, "u", "p"
    )
    assert popts["numPartitions"] == "5" and popts["partitionColumn"] == "DA"


def test_catalog_loads_all_tables(spark, sf_dir):
    dfs = load_tables(spark, sf_dir)
    assert set(dfs) == set(TABLES)
    for name, df in dfs.items():
        assert df.columns, name
    views = register_views(spark, sf_dir)
    assert spark.table("lineitem").columns == views["lineitem"].columns
    # events gains the derived epoch-seconds column
    assert "ts_sec" in dfs["events"].columns


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path_factory):
    """Co-located bucketed join: both sides bucketed+sorted on the join key
    → SortMergeJoin with no Exchange and no per-task Sort in the plan."""
    from bigdata_homed_spark.sources.sinks import write_bucketed
    from bigdata_homed_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
        joined = bo.join(bl, bo["o_orderkey"] == bl["l_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        expect = (
            orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).count()
        )
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_table_inventory(spark, sf_dir):
    """HDFSFileVolumeCollect parity: per-table file counts and byte volume
    via the Hadoop FS API (works for single files and partitioned dirs)."""
    from bigdata_homed_spark.sources.inventory import table_inventory

    inv = {
        r["table_name"]: r
        for r in table_inventory(
            spark, sf_dir, ["lineitem", "events", "nope"]
        ).collect()
    }
    assert inv["lineitem"]["n_files"] == 1 and inv["lineitem"]["total_bytes"] > 0
    assert inv["events"]["total_bytes"] > 0
    assert inv["nope"]["n_files"] == 0 and inv["nope"]["total_bytes"] == 0
