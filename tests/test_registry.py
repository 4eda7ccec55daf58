"""Registry-level tests: every query runs at sf0.001 and returns a stable,
non-degenerate frame; oracle coverage is near-total; entry() works."""

from __future__ import annotations

import pytest

from bigdata_homed_spark.plans import ORACLES, QUERIES

# queries whose legitimate sf0.001 result can be empty (small-sample effects)
MAY_BE_EMPTY = {"embedding_ann_pairs", "ngram_jaccard_pairs", "minhash_lsh_pairs"}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    rows = df.collect()
    assert df.columns, name
    if name not in MAY_BE_EMPTY:
        assert len(rows) > 0, f"{name} returned no rows"


def test_oracle_coverage():
    missing = set(QUERIES) - set(ORACLES)
    # every query ships an oracle today; keep the invariant explicit
    assert not missing, f"queries without oracle: {missing}"


def test_entry(spark):
    import __spark_entry__ as m

    df = m.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"slot_start", "n_name", "n_sessions", "n_users", "online_sec"}
    assert set(m.queries()) == set(QUERIES)
    assert set(m.oracle_sql()) == set(ORACLES)
