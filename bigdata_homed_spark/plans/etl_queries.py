"""Oracle registration for the end-to-end video_play ETL chain.

The DuckDB oracle replays the ENTIRE chain — line building, blacklist,
regex parse, k-v extraction, Success→Finished pairing, playtype/terminal
normalization, region join, report agg — in SQL, so the pipeline is
verified as a whole, not per-stage.  (Per-stage unit tests live in
tests/test_video_play_etl.py.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..reports.video_play_etl import video_play_report
from .registry import query

_HEADER_RE = r"^\[(\d+)\](\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}) - \[INFO\] - ([A-Za-z]+), (.*)$"

_ORACLE = rf"""
WITH ev AS (
  SELECT event_id, user_id, event_type, value, props,
         epoch_us(ts)//1000000 AS sec
  FROM events
),
lines AS (
  SELECT event_id,
    '[' || cast(event_id as varchar) || ']'
        || strftime(make_timestamp(sec*1000000), '%Y-%m-%d %H:%M:%S')
        || ' - [INFO] - '
        || CASE event_type WHEN 'signup' THEN 'Success'
                           WHEN 'purchase' THEN 'Finished'
                           WHEN 'click' THEN 'ProgramEnter'
                           WHEN 'view' THEN 'HeartBeat'
                           ELSE 'BINARYC' END
        || ', DA ' || cast(user_id as varchar)
        || ', DeviceId ' || cast(((user_id * 3 + event_id % 3) * 33311) % 100000 as varchar)
        || ', ProgramMethod '
        || (['live','vod','tr','ts','kts'])[cast(coalesce(cast(json_extract_string(props,'$.k') as bigint), 0) % 5 as int) + 1]
        || ', ProgramID ' || coalesce(json_extract_string(props,'$.k'), '0')
        || ', PlayS ' || cast(cast(floor(value) as bigint) as varchar) AS line
  FROM ev
),
filtered AS (
  SELECT * FROM lines
  WHERE line NOT LIKE '%BINARYC%' AND line NOT LIKE '%PlayCount%'
),
parsed AS (
  SELECT event_id,
         epoch_us(strptime(regexp_extract(line, '{_HEADER_RE}', 2), '%Y-%m-%d %H:%M:%S'))//1000000 AS sec,
         regexp_extract(line, '{_HEADER_RE}', 3) AS keyword,
         regexp_extract(line, '{_HEADER_RE}', 4) AS body
  FROM filtered
  WHERE regexp_extract(line, '{_HEADER_RE}', 3) != ''
),
fields AS (
  SELECT event_id, sec, keyword,
         cast(str_split(str_split(body, ', ')[1], ' ')[2] as bigint) AS user_id,
         cast(str_split(str_split(body, ', ')[2], ' ')[2] as bigint) AS device_id,
         str_split(str_split(body, ', ')[3], ' ')[2] AS method
  FROM parsed
),
play AS (SELECT * FROM fields WHERE keyword IN ('Success', 'Finished')),
paired AS (
  SELECT *,
         lead(sec) OVER w AS next_sec,
         lead(keyword) OVER w AS next_kw
  FROM play
  WINDOW w AS (PARTITION BY user_id, device_id ORDER BY sec, event_id)
),
sessions AS (
  SELECT user_id, device_id, method,
         sec AS start_ts, next_sec AS end_ts, next_sec - sec AS playtime
  FROM paired
  WHERE keyword = 'Success' AND next_kw = 'Finished'
),
fact AS (
  SELECT s.*,
         CASE WHEN s.method IN ('tr','ts','kts') THEN 'timeshift'
              WHEN s.method = 'vod' THEN 'demand'
              ELSE s.method END AS playtype,
         n.n_name
  FROM sessions s
  LEFT JOIN customer c ON s.user_id + 1 = c.c_custkey
  LEFT JOIN nation n   ON c.c_nationkey = n.n_nationkey
)
SELECT playtype, coalesce(n_name, '-') AS region,
       count(*) AS n_sessions,
       count(DISTINCT user_id) AS n_users,
       cast(sum(playtime) as bigint) AS total_playtime_sec
FROM fact GROUP BY 1, 2
"""


@query("video_play_report", oracle=_ORACLE)
def video_play_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return video_play_report(spark, sf_dir)


# --------------------------------------------------------------------------
# CA→DA id translation (`etl/ReportLog.scala:85-105` version=true path +
# `etl/CaGetDa`): some log versions report the smart-card number (CA)
# instead of the account id (DA); the ETL broadcasts the CA→DA dim and
# rewrites ids, KEEPING the original when no mapping exists (the
# reference's left join + nvl).  Here the dim is synthetic (CA maps to
# CA+10000 except every third card, which is unmapped), the join is a
# broadcast left join + coalesce — no UDF, no driver map — and the report
# accounts per event type how many ids were translated vs passed through.
@query(
    "ca_da_translation",
    oracle="""
    WITH dim AS (
      SELECT id AS ca, id + 10000 AS da
      FROM (SELECT unnest(generate_series(0, 1499)) AS id)
      WHERE id % 3 != 0
    ),
    ev AS (
      SELECT e.event_type,
             coalesce(d.da, e.user_id) AS resolved_id,
             CASE WHEN d.da IS NOT NULL THEN 1 ELSE 0 END AS translated
      FROM events e LEFT JOIN dim d ON d.ca = e.user_id
    )
    SELECT event_type,
           cast(count(*) as bigint) AS n_events,
           cast(sum(translated) as bigint) AS n_translated,
           cast(count(DISTINCT resolved_id) as bigint) AS n_distinct_resolved
    FROM ev GROUP BY event_type
    """,
)
def ca_da_translation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    dim = (
        spark.range(0, 1500)
        .where(F.col("id") % 3 != 0)
        .select(F.col("id").alias("ca"), (F.col("id") + 10000).alias("da"))
    )
    joined = ev.join(F.broadcast(dim), ev["user_id"] == dim["ca"], "left")
    resolved = joined.select(
        "event_type",
        F.coalesce("da", "user_id").alias("resolved_id"),
        F.when(F.col("da").isNotNull(), 1).otherwise(0).alias("translated"),
    )
    return resolved.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("translated").cast("bigint").alias("n_translated"),
        F.countDistinct("resolved_id").cast("bigint").alias("n_distinct_resolved"),
    )


# --------------------------------------------------------------------------
# iacs login-log ETL — the 4th raw-log family (`etl/IacsLogParser.scala:47-74`
# parse → orc_iacs; `homed/general/OnlineUsersAndTime.scala:200-271`
# UserOnline/UserOffline pairing → daily online-time fact).  The reference
# chain was: textFile → filter(UserOnline|UserOffline) → split on [INFO] →
# LogUtils.str_to_map → orc_iacs, then a mapPartitions+reduceByKey pass that
# packed "report_time-->key_word-->login-->logout" strings per
# (user, device, device_type), quick-sorted them, and walked the sorted
# array summing (logout − max(login, day_start)) for every UserOffline
# record plus the trailing still-online UserOnline record (whose null
# LogoutTime had been coalesced to day-end 23:59:59).
#
# Spark-first re-expression: the line build/parse stays declarative
# (regexp_extract + str_to_map — S1/P3 shapes, zero Python), the
# pack-sort-walk collapses to ONE row_number window per
# (user, device, device_type, day) ordered by (sec, event_id): a record
# contributes iff it is UserOffline OR the last record of its key and
# UserOnline — exactly the reference's loop, with the day-start clamp as a
# greatest() and the null-logout coalesce as day-end.  Scale: the only
# shuffle is the per-key window (narrow keyspace: users × devices × days),
# and timestamps travel the line as epoch-second integers so the parse
# round-trip is timezone-independent on any driver session.
_IACS_HEADER = r"^\[(\d+)\](\d+)$"

_IACS_ORACLE = r"""
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts)//1000000 AS sec FROM events
),
lines AS (
  SELECT '[' || cast(event_id as varchar) || ']' || cast(sec as varchar)
      || ' [INFO] '
      || CASE WHEN event_type IN ('view','click') THEN 'UserOnline' ELSE 'UserOffline' END
      || ':UserID ' || cast(user_id as varchar)
      || ',DeviceID ' || cast(user_id*10 + event_id%2 as varchar)
      || ',DeviceType ' || cast(1 + user_id%3 as varchar)
      || ',LoginTime ' || cast(sec - (event_id % 5400) - 30 as varchar)
      || ',LogoutTime ' || CASE WHEN event_id % 7 = 0 THEN 'null' ELSE cast(sec as varchar) END
      || ',RegionID ' || cast(10000000 + (user_id % 20) * 100 as varchar) AS line
  FROM ev
),
fields AS (
  SELECT cast(regexp_extract(line, '^\[(\d+)\]', 1) as bigint) AS event_id,
         cast(regexp_extract(line, '^\[\d+\](\d+) ', 1) as bigint) AS sec,
         regexp_extract(line, '\[INFO\] ([A-Za-z]+):', 1) AS key_word,
         cast(regexp_extract(line, 'UserID (\d+)', 1) as bigint) AS user_id,
         cast(regexp_extract(line, 'DeviceID (\d+)', 1) as bigint) AS device_id,
         cast(regexp_extract(line, 'DeviceType (\d+)', 1) as bigint) AS device_type,
         cast(regexp_extract(line, 'LoginTime (\d+)', 1) as bigint) AS login_sec,
         CASE WHEN regexp_extract(line, 'LogoutTime ([a-z0-9]+)', 1) = 'null' THEN NULL
              ELSE cast(regexp_extract(line, 'LogoutTime ([a-z0-9]+)', 1) as bigint) END AS logout_sec,
         substr(regexp_extract(line, 'RegionID (\d+)', 1), 1, 6) AS f_region_id
  FROM lines
  WHERE line LIKE '%UserOnline%' OR line LIKE '%UserOffline%'
),
marked AS (
  SELECT *, sec // 86400 AS day,
         row_number() OVER (PARTITION BY user_id, device_id, device_type, sec // 86400
                            ORDER BY sec DESC, event_id DESC) AS rn
  FROM fields
),
contrib AS (
  SELECT day, device_type, f_region_id, user_id,
         coalesce(logout_sec, day*86400 + 86399) - greatest(login_sec, day*86400) AS online_sec
  FROM marked
  WHERE key_word = 'UserOffline' OR (key_word = 'UserOnline' AND rn = 1)
)
SELECT day, device_type, f_region_id,
       cast(count(*) as bigint) AS n_sessions,
       cast(count(DISTINCT user_id) as bigint) AS n_users,
       cast(sum(online_sec) as bigint) AS total_online_sec
FROM contrib GROUP BY 1, 2, 3
"""


@query("iacs_login_sessions", oracle=_IACS_ORACLE)
def iacs_login_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts_sec"
    )
    kw = F.when(
        F.col("event_type").isin("view", "click"), F.lit("UserOnline")
    ).otherwise(F.lit("UserOffline"))
    # synthesize the raw iacs line (IacsLogParser.scala line format, with
    # epoch-second integers so the round-trip is tz-independent)
    line = F.concat(
        F.lit("["), F.col("event_id").cast("string"), F.lit("]"),
        F.col("ts_sec").cast("string"),
        F.lit(" [INFO] "), kw,
        F.lit(":UserID "), F.col("user_id").cast("string"),
        F.lit(",DeviceID "),
        (F.col("user_id") * 10 + F.col("event_id") % 2).cast("string"),
        F.lit(",DeviceType "), (F.lit(1) + F.col("user_id") % 3).cast("string"),
        F.lit(",LoginTime "),
        (F.col("ts_sec") - (F.col("event_id") % 5400) - 30).cast("string"),
        F.lit(",LogoutTime "),
        F.when(F.col("event_id") % 7 == 0, F.lit("null")).otherwise(
            F.col("ts_sec").cast("string")
        ),
        F.lit(",RegionID "),
        (F.lit(10000000) + (F.col("user_id") % 20) * 100).cast("string"),
    )
    # the reference filtered raw lines on UserOnline|UserOffline; in this
    # synthesized feed the only alphabetic token in the line IS the keyword,
    # so the identical selection evaluates on the keyword expression.
    # Referencing `line` in the predicate made Catalyst's filter pushdown
    # substitute — and therefore compute — the whole line concat TWICE more
    # below the scan (guide §4.4's duplicated-expression shape with
    # built-ins; see plans/r11/iacs_login_sessions_{before,after}.txt:
    # before, operator (2) carries the full concat in both Contains arms).
    raw = ev.where(kw.isin("UserOnline", "UserOffline")).select(line.alias("line"))
    # parse: [event_id]sec [INFO] KeyWord:k v,k v,...  (str_to_map — the
    # LogUtils.str_to_map analog — handles the k-v body)
    parsed = raw.select(
        F.regexp_extract("line", r"^\[(\d+)\]", 1).cast("bigint").alias("event_id"),
        F.regexp_extract("line", r"^\[\d+\](\d+) ", 1).cast("bigint").alias("sec"),
        F.regexp_extract("line", r"\[INFO\] ([A-Za-z]+):", 1).alias("key_word"),
        F.expr("str_to_map(substring(line, instr(line, ':') + 1), ',', ' ')").alias(
            "exts"
        ),
    )
    fields = parsed.select(
        "event_id",
        "sec",
        "key_word",
        F.col("exts")["UserID"].cast("bigint").alias("user_id"),
        F.col("exts")["DeviceID"].cast("bigint").alias("device_id"),
        F.col("exts")["DeviceType"].cast("bigint").alias("device_type"),
        F.col("exts")["LoginTime"].cast("bigint").alias("login_sec"),
        F.when(F.col("exts")["LogoutTime"] == "null", F.lit(None).cast("bigint"))
        .otherwise(F.col("exts")["LogoutTime"].cast("bigint"))
        .alias("logout_sec"),
        F.substring(F.col("exts")["RegionID"], 1, 6).alias("f_region_id"),
        (F.col("sec") / 86400).cast("bigint").alias("day"),
    )
    w = Window.partitionBy("user_id", "device_id", "device_type", "day").orderBy(
        F.col("sec").desc(), F.col("event_id").desc()
    )
    marked = fields.withColumn("rn", F.row_number().over(w))
    contrib = marked.where(
        (F.col("key_word") == "UserOffline")
        | ((F.col("key_word") == "UserOnline") & (F.col("rn") == 1))
    ).select(
        "day",
        "device_type",
        "f_region_id",
        "user_id",
        (
            F.coalesce(F.col("logout_sec"), F.col("day") * 86400 + 86399)
            - F.greatest(F.col("login_sec"), F.col("day") * 86400)
        ).alias("online_sec"),
    )
    return contrib.groupBy("day", "device_type", "f_region_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.sum("online_sec").cast("bigint").alias("total_online_sec"),
    )


# --------------------------------------------------------------------------
# OnlineTimePatch.scala:92-124 (same SQL in ReportLogParser.scala:115-160)
# — the boot-duration REPAIR pass: per device-day, select the heartbeat
# rows that mark run boundaries (the first row, the last row, or a
# heartbeat immediately followed by a SYSTEM_OPEN), link them with a
# second lead() over the SELECTED set, and emit one repaired run from the
# first heartbeat to the next boundary; a run whose next event is an OPEN
# means the box rebooted, so its playtime is zeroed (and then dropped by
# the playtime > 0 filter), exactly as the reference's CASE does.  Two
# stacked window passes with DIFFERENT frames over the same
# (device, day)-partitioned sort — one sort, two logical windows, no
# re-shuffle (both windows share the partition key).
_RUN_REPAIR_ORACLE = """
WITH log AS (
  SELECT event_id, user_id,
         user_id * 10 + coalesce(cast(json_extract_string(props, '$.k') as bigint), 0) % 3
           AS device,
         CASE event_type WHEN 'view' THEN 701 WHEN 'signup' THEN 601 ELSE 100 END
           AS service,
         epoch_us(ts)//1000000 AS sec,
         (epoch_us(ts)//1000000)//86400 AS day
  FROM events
),
t1 AS (
  SELECT *,
         lead(service, 1, 0) OVER w AS service2,
         first_value(sec) OVER w AS first_sec
  FROM log
  WINDOW w AS (PARTITION BY device, day ORDER BY sec, event_id)
),
boundaries AS (
  SELECT * FROM t1
  WHERE service = 701
    AND (sec = first_sec OR service2 = 0 OR service2 = 601)
),
t2 AS (
  SELECT *,
         lead(sec, 1, sec) OVER (PARTITION BY device, day ORDER BY sec, event_id)
           AS sec2
  FROM boundaries
)
SELECT DISTINCT user_id, device, day,
       sec AS start_sec,
       CASE WHEN service2 = 601 THEN sec ELSE sec2 END AS end_sec,
       CASE WHEN service2 = 601 THEN 0 ELSE sec2 - sec END AS playtime
FROM t2
WHERE sec = first_sec AND (CASE WHEN service2 = 601 THEN 0 ELSE sec2 - sec END) > 0
"""


@query("heartbeat_run_repair", oracle=_RUN_REPAIR_ORACLE)
def heartbeat_run_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    k = F.coalesce(F.get_json_object("props", "$.k").cast("bigint"), F.lit(0))
    log = ev.select(
        "event_id",
        "user_id",
        (F.col("user_id") * 10 + k % 3).alias("device"),
        F.when(F.col("event_type") == "view", 701)
        .when(F.col("event_type") == "signup", 601)
        .otherwise(100)
        .alias("service"),
        F.col("ts_sec").alias("sec"),
        F.expr("ts_sec div 86400").alias("day"),
    )
    w = Window.partitionBy("device", "day").orderBy("sec", "event_id")
    t1 = log.select(
        "*",
        F.lead("service", 1, 0).over(w).alias("service2"),
        F.first("sec").over(w).alias("first_sec"),
    )
    boundaries = t1.where(
        (F.col("service") == 701)
        & (
            (F.col("sec") == F.col("first_sec"))
            | (F.col("service2") == 0)
            | (F.col("service2") == 601)
        )
    )
    t2 = boundaries.select("*", F.lead("sec", 1).over(w).alias("sec2_raw")).withColumn(
        "sec2", F.coalesce(F.col("sec2_raw"), F.col("sec"))
    )
    end_sec = F.when(F.col("service2") == 601, F.col("sec")).otherwise(F.col("sec2"))
    playtime = F.when(F.col("service2") == 601, F.lit(0)).otherwise(
        F.col("sec2") - F.col("sec")
    )
    return (
        t2.where((F.col("sec") == F.col("first_sec")) & (playtime > 0))
        .select(
            "user_id", "device", "day",
            F.col("sec").alias("start_sec"),
            end_sec.alias("end_sec"),
            playtime.alias("playtime"),
        )
        .distinct()
    )


def subtree_descendants(parent_of: dict[int, int], roots) -> set[int]:
    """Descendants closure (roots included) over a child→parent map.

    The reference's `ArateFilter.getSpecialColumn` recursion, minus its
    quadratic entrySet rescan per level; self-parented nodes (taxonomy
    roots) don't self-loop.  Pure driver-side — callers broadcast the
    result into fact filters.
    """
    children_of: dict[int, list[int]] = {}
    for c, par in parent_of.items():
        if c != par:
            children_of.setdefault(par, []).append(c)
    members: set[int] = set()
    frontier = list(roots)
    while frontier:
        nxt = []
        for node in frontier:
            if node in members:
                continue
            members.add(node)
            nxt.extend(children_of.get(node, []))
        frontier = nxt
    return members


# --------------------------------------------------------------------------
# ArateFilter (`etl/ArateFilter.scala:17-135`, hunan customization): keep
# only report-log lines whose column falls inside the subtree of given
# root columns, then split behavior vs order (action=8) outputs.  Three
# reference shapes re-expressed Spark-first:
#
# 1. `getColumnInfo`/`getSpecialColumn` (:92-135) — a RECURSIVE
#    descendants closure walked over a JDBC parent-map on the driver.
#    The taxonomy is a bounded dim, so the closure is a driver BFS over
#    the collected parent map (the reference's own shape, minus the
#    quadratic entrySet rescan per level); membership then BROADCASTS
#    into the fact filter — the fact never leaves the executors.
#    Oracle: DuckDB `WITH RECURSIVE`.
# 2. The driver-side `columnMap` (:44-74) that 0104 rows populate
#    (program→column) and 0701/S,4 rows read back — an ORDER-DEPENDENT
#    mutable HashMap in the reference.  Here: keep-latest per program
#    over the mapping rows (deterministic tiebreak), broadcast-joined to
#    the rows that lack a column id.
# 3. The behavior/order split on action (:80-83) — one predicate split,
#    no second scan (operators/setops.split_by_predicate shape); output
#    is the per-(split, column) line/program counts (the reference's
#    text-file write is the S7/S8 sink family, pinned elsewhere).
#
# Synthetic mapping: 'click' rows are 0104 program-browse lines carrying
# (program=k%200, column=k%60); 'view' rows are 0701 play lines carrying
# only the program; 'purchase' rows are action=8 orders carrying the
# column directly (0131 shape); subtree roots = columns 2 and 9 in the
# parent = id//4 hierarchy.
_ARATE_ORACLE = """
WITH coldim AS (
  SELECT cast(c as bigint) AS f_column_id, cast(c // 4 as bigint) AS f_parent_id
  FROM (SELECT unnest(generate_series(1, 59)) AS c)
),
subtree AS (
  WITH RECURSIVE des AS (
    SELECT f_column_id FROM coldim WHERE f_column_id IN (2, 9)
    UNION ALL
    SELECT c.f_column_id
    FROM coldim c JOIN des d ON c.f_parent_id = d.f_column_id
    WHERE c.f_column_id != d.f_column_id
  )
  SELECT DISTINCT f_column_id FROM des
),
ev AS (
  SELECT event_id, user_id, event_type,
         epoch_us(ts)//1000000 AS sec,
         coalesce(cast(json_extract_string(props, '$.k') as bigint), 0) % 200
           AS program_id,
         coalesce(cast(json_extract_string(props, '$.k') as bigint), 0) % 60
           AS col_raw
  FROM events
),
mapping AS (
  SELECT program_id, col_raw AS f_column_id
  FROM (
    SELECT program_id, col_raw,
           row_number() OVER (PARTITION BY program_id
                              ORDER BY sec DESC, event_id DESC) AS rn
    FROM ev WHERE event_type = 'click' AND col_raw != 0
  ) WHERE rn = 1
),
resolved AS (
  SELECT e.event_id, e.program_id,
         CASE WHEN e.event_type = 'view' THEN coalesce(m.f_column_id, 0)
              ELSE e.col_raw END AS f_column_id,
         CASE WHEN e.event_type = 'purchase' THEN 'order' ELSE 'behavior' END
           AS f_split
  FROM ev e LEFT JOIN mapping m ON m.program_id = e.program_id
  WHERE e.event_type IN ('click', 'view', 'purchase')
)
SELECT r.f_split, r.f_column_id,
       cast(count(*) as bigint) AS n_lines,
       cast(count(DISTINCT r.program_id) as bigint) AS n_programs
FROM resolved r JOIN subtree s USING (f_column_id)
GROUP BY 1, 2
"""


@query("arate_subtree_split", oracle=_ARATE_ORACLE)
def arate_subtree_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    # column dim (1..59, parent = id//4) — the t_column_info stand-in
    dim = spark.range(1, 60).select(
        F.col("id").alias("f_column_id"),
        F.expr("cast(id div 4 as bigint)").alias("f_parent_id"),
    )
    # recursive descendants closure: the column taxonomy is a BOUNDED dim
    # (thousands of rows at production scale — the reference pulled the
    # whole t_column_info parent map to the driver over JDBC and recursed
    # on it, :92-135).  Same shape here: collect the parent map once, BFS
    # on the driver, broadcast the membership set back into the FACT
    # filter — the per-level Spark-join alternative costs one job per
    # tree level for a dim that fits in one task.
    # bound guard: a column taxonomy is thousands of rows; 1M rows (~16 MB)
    # is far past any real taxonomy and still driver-safe — past that, fail
    # loudly instead of OOMing (bounded_collect fetches via a distributed
    # limit, so the driver never holds more than the bound either way)
    from ..operators.aggregate import bounded_collect

    parent_of = {
        r.f_column_id: r.f_parent_id
        for r in bounded_collect(dim, 1_000_000, "column-taxonomy dim")
    }
    members = subtree_descendants(parent_of, [2, 9])
    member = spark.createDataFrame(
        [(int(m),) for m in sorted(members)], "f_column_id bigint"
    )

    ev = load_table(spark, sf_dir, "events")
    k = F.coalesce(F.get_json_object("props", "$.k").cast("bigint"), F.lit(0))
    base = ev.where(F.col("event_type").isin("click", "view", "purchase")).select(
        "event_id",
        "event_type",
        F.col("ts_sec").alias("sec"),
        (k % 200).alias("program_id"),
        (k % 60).alias("col_raw"),
    )
    from pyspark.sql.window import Window

    rn = F.row_number().over(
        Window.partitionBy("program_id").orderBy(
            F.col("sec").desc(), F.col("event_id").desc()
        )
    )
    mapping = (
        base.where((F.col("event_type") == "click") & (F.col("col_raw") != 0))
        .withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .select("program_id", F.col("col_raw").alias("map_col"))
    )
    resolved = (
        base.join(mapping, "program_id", "left")
        .select(
            "event_id",
            "program_id",
            F.when(
                F.col("event_type") == "view", F.coalesce("map_col", F.lit(0))
            )
            .otherwise(F.col("col_raw"))
            .alias("f_column_id"),
            F.when(F.col("event_type") == "purchase", "order")
            .otherwise("behavior")
            .alias("f_split"),
        )
    )
    return (
        resolved.join(F.broadcast(member), "f_column_id")
        .groupBy("f_split", "f_column_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.countDistinct("program_id").cast("bigint").alias("n_programs"),
        )
    )
