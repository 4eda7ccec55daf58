"""Malformed-input robustness: the parse path must drop garbage, not throw
(the reference's log files carried binary junk, duplicate-spelling keys and
truncated lines — RunLogParser blacklists + regex guards)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_homed_spark.functions.maps import kv_string_to_map
from bigdata_homed_spark.reports.video_play_etl import filter_blacklist, parse_lines
from bigdata_homed_spark.streaming.jobs import kafka_stream_options


def test_parse_drops_malformed_lines(spark):
    lines = spark.createDataFrame(
        [
            ("[123]2024-01-05 10:00:00 - [INFO] - Success, DA 7, DeviceId 5, ProgramMethod live, ProgramID 3, PlayS 60",),
            ("no header at all",),
            ("[9]bad-date - [INFO] - Success, DA 7",),
            ("",),
            ("[1]2024-01-05 10:00:00 - [INFO] - BINARYC, DA 1, DeviceId 2",),  # blacklist
            ("[5]2024-01-05 11:00:00 - [INFO] - Finished, DA 7, DeviceId 5, ProgramMethod live, ProgramID 3, PlayS 61",),
        ],
        ["line"],
    )
    parsed = parse_lines(filter_blacklist(lines))
    rows = parsed.collect()
    # event_id is recovered from the [pid] slot of the surviving lines
    assert sorted(r.event_id for r in rows) == [5, 123]
    good = [r for r in rows if r.event_id == 123][0]
    assert good.user_id == 7 and good.device_id == 5 and good.plays == 60
    assert good.sec == 1704448800  # 2024-01-05 10:00:00 UTC


def test_str_to_map_handles_missing_and_dup_keys(spark):
    # session factory sets mapKeyDedupPolicy=LAST_WIN (Spark default throws
    # on duplicate keys — real logs repeat keys, so lenient wins)
    df = spark.createDataFrame(
        [("DA 1, DA 2, DeviceId x",), ("",), ("novalue",)], ["body"]
    )
    kv = kv_string_to_map(F.col("body"), ", *", " ")
    rows = df.select(
        kv.getItem("DA").alias("da"),
        # try_cast: ANSI mode (Spark 4 default) makes plain cast THROW on
        # non-numeric input — untrusted fields must go through try_cast
        kv.getItem("DeviceId").try_cast("bigint").alias("dev"),
    ).collect()
    assert rows[0].da == "2"  # last occurrence wins
    assert all(r.dev is None for r in rows)  # non-numeric → null, no throw


def test_kafka_options_shape():
    opts = kafka_stream_options("b1:9092,b2:9092", "runlog,userlog")
    assert opts["kafka.bootstrap.servers"].count(":") == 2
    assert opts["subscribe"] == "runlog,userlog"


def test_subtree_descendants_matches_naive_closure():
    """Property: the BFS closure equals the naive ancestor-chain check on
    random taxonomies (including self-parented roots and forests)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bigdata_homed_spark.plans.etl_queries import subtree_descendants

    @st.composite
    def taxonomy(draw):
        n = draw(st.integers(min_value=1, max_value=40))
        # parent of node i is any node < i (forest, acyclic) or itself (root)
        parent_of = {}
        for i in range(n):
            parent_of[i] = draw(st.integers(min_value=0, max_value=max(0, i - 1))) if i else 0
        roots = draw(st.lists(st.integers(min_value=0, max_value=n - 1),
                              min_size=1, max_size=4, unique=True))
        return parent_of, roots

    def ancestors(node, parent_of):
        seen = [node]
        while True:
            p = parent_of.get(node)
            if p is None or p == node:
                return seen
            node = p
            seen.append(node)

    @settings(max_examples=200, deadline=None)
    @given(taxonomy())
    def check(tr):
        parent_of, roots = tr
        got = subtree_descendants(parent_of, roots)
        expected = {
            n for n in parent_of if any(a in set(roots) for a in ancestors(n, parent_of))
        }
        assert got == expected, (parent_of, roots)

    check()
