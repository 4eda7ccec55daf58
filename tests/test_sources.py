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
