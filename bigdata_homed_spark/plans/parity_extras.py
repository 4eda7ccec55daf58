"""Remaining reference-job parity: the account-token hex parser
(common/TokenParser.scala) and the multi-column video detail report
(homed/repots/ColumnDetailNew.scala).

Both are register-and-parse jobs in the reference; here the encode AND the
decode run inside the engine so the oracle pins the whole roundtrip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query


# --------------------------------------------------------------------------
# TokenParser (common/TokenParser.scala:27-85): an access token packs
# hex-encoded fields between single-letter markers — device type U..K,
# device id K..I, user id M..V, region Z..W — and the parser extracts each
# by marker pair, parses base-16, and widens the 6-digit region code into
# province (XX0000) and city (XXXX00).  Malformed tokens (check() fails)
# yield the default User with sentinel fields.
#
# Here the token is BUILT from the event columns (lower-hex, same marker
# layout) and then genuinely PARSED back with regexp_extract + conv(16,10),
# so a parse bug changes the distinct-user/device counts and fails the
# hash.  Every 10th user carries a malformed token and must land in the
# default row, like the reference's User2() fallback.
@query(
    "token_parse_report",
    oracle="""
    WITH logins AS (
      SELECT DISTINCT user_id,
             (user_id * 131 + 7) % 100000 AS device_id,
             user_id % 5 AS device_type,
             110000 + (user_id % 90) * 100 + user_id % 7 AS region_num
      FROM events WHERE event_type = 'signup'
    ),
    parsed AS (
      SELECT CASE WHEN user_id % 10 = 0 THEN -1 ELSE user_id END AS p_user,
             CASE WHEN user_id % 10 = 0 THEN -1 ELSE device_id END AS p_device,
             CASE WHEN user_id % 10 = 0 THEN '-' ELSE cast(device_type as varchar) END AS p_dtype,
             CASE WHEN user_id % 10 = 0 THEN 'UNKNOWN'
                  ELSE substr(cast(region_num as varchar), 1, 2) || '0000' END AS province_id,
             CASE WHEN user_id % 10 = 0 THEN 'UNKNOWN'
                  ELSE substr(cast(region_num as varchar), 1, 4) || '00' END AS city_id
      FROM logins
    )
    SELECT p_dtype AS device_type, province_id, city_id,
           cast(count(DISTINCT p_user) as bigint) AS n_users,
           cast(count(DISTINCT p_device) as bigint) AS n_devices
    FROM parsed GROUP BY 1, 2, 3
    """,
)
def token_parse_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    logins = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "signup")
        .select(
            "user_id",
            ((F.col("user_id") * 131 + 7) % 100000).alias("device_id"),
            (F.col("user_id") % 5).alias("device_type"),
            (F.lit(110000) + (F.col("user_id") % 90) * 100 + F.col("user_id") % 7).alias(
                "region_num"
            ),
        )
        .distinct()
    )
    # encode: U<dtype>K<devhex>IM<uidhex>VZ<regionhex>W  (lower-case hex,
    # marker layout of TokenParser.findStrByKey); every 10th user malformed
    token = F.when(F.col("user_id") % 10 == 0, F.lit("BADTOKEN")).otherwise(
        F.concat(
            F.lit("U"),
            F.col("device_type").cast("string"),
            F.lit("K"),
            F.lower(F.hex("device_id")),
            F.lit("I"),
            F.lit("M"),
            F.lower(F.hex("user_id")),
            F.lit("V"),
            F.lit("Z"),
            F.lower(F.hex("region_num")),
            F.lit("W"),
        )
    )
    toks = logins.select(token.alias("token"))
    # decode: marker-pair regex + base-16 conv, exactly the reference's
    # findStrByKey + JavaLong.valueOf(_, 16); empty extract -> NULL -> default
    dev_hex = F.regexp_extract("token", "K([0-9a-f]+)I", 1)
    uid_hex = F.regexp_extract("token", "M([0-9a-f]+)V", 1)
    reg_hex = F.regexp_extract("token", "Z([0-9a-f]+)W", 1)
    dty_str = F.regexp_extract("token", "^U([0-9])K", 1)
    parsed = toks.select(
        F.coalesce(
            F.when(uid_hex != "", F.conv(uid_hex, 16, 10).cast("bigint")), F.lit(-1)
        ).alias("p_user"),
        F.coalesce(
            F.when(dev_hex != "", F.conv(dev_hex, 16, 10).cast("bigint")), F.lit(-1)
        ).alias("p_device"),
        F.when(dty_str != "", dty_str).otherwise("-").alias("p_dtype"),
        F.when(reg_hex != "", F.conv(reg_hex, 16, 10)).alias("p_region"),
    ).select(
        "p_user",
        "p_device",
        F.col("p_dtype").alias("device_type"),
        F.coalesce(
            F.concat(F.substring("p_region", 1, 2), F.lit("0000")), F.lit("UNKNOWN")
        ).alias("province_id"),
        F.coalesce(
            F.concat(F.substring("p_region", 1, 4), F.lit("00")), F.lit("UNKNOWN")
        ).alias("city_id"),
    )
    return parsed.groupBy("device_type", "province_id", "city_id").agg(
        F.countDistinct("p_user").cast("bigint").alias("n_users"),
        F.countDistinct("p_device").cast("bigint").alias("n_devices"),
    )


# --------------------------------------------------------------------------
# ColumnDetailNew (homed/repots/ColumnDetailNew.scala:72): every video
# belongs to a comma-separated list of columns (categories); the job
# `lateral view explode(split(column_ids, ','))`s the mapping, then per
# column computes pv / uv and the top videos, packed as an ordered string.
# One exploded scan feeds both grains; topN is a window over the
# (column, video) pre-aggregate, so the rank input is already small.
@query(
    "column_detail_topn",
    oracle="""
    WITH plays AS (
      SELECT user_id,
             cast(json_extract_string(props, '$.k') as bigint) % 100 AS video_id
      FROM events WHERE event_type = 'view'
    ),
    exploded AS (
      SELECT user_id, video_id,
             unnest(['c' || cast(video_id % 6 as varchar),
                     'c' || cast(6 + video_id % 15 as varchar)]) AS column_id
      FROM plays
    ),
    per_video AS (
      SELECT column_id, video_id, count(*) AS vn
      FROM exploded GROUP BY 1, 2
    ),
    ranked AS (
      SELECT column_id, video_id, vn,
             row_number() OVER (PARTITION BY column_id ORDER BY vn DESC, video_id) AS rn
      FROM per_video
    ),
    tops AS (
      SELECT column_id,
             string_agg('v' || cast(video_id as varchar) || ':' || cast(vn as varchar),
                        ',' ORDER BY rn) AS top_videos
      FROM ranked WHERE rn <= 3 GROUP BY column_id
    ),
    totals AS (
      SELECT column_id, cast(count(*) as bigint) AS pv,
             cast(count(DISTINCT user_id) as bigint) AS uv
      FROM exploded GROUP BY column_id
    )
    SELECT t.column_id, t.pv, t.uv, p.top_videos
    FROM totals t JOIN tops p ON t.column_id = p.column_id
    """,
)
def column_detail_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    vid = (F.get_json_object("props", "$.k").cast("bigint") % 100).alias("video_id")
    plays = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "view")
        .select("user_id", vid)
    )
    exploded = plays.select(
        "user_id",
        "video_id",
        F.explode(
            F.array(
                F.concat(F.lit("c"), (F.col("video_id") % 6).cast("string")),
                F.concat(F.lit("c"), (F.lit(6) + F.col("video_id") % 15).cast("string")),
            )
        ).alias("column_id"),
    )
    per_video = exploded.groupBy("column_id", "video_id").agg(
        F.count(F.lit(1)).alias("vn")
    )
    w = Window.partitionBy("column_id").orderBy(F.desc("vn"), F.asc("video_id"))
    tops = (
        per_video.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .groupBy("column_id")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "video_id", "vn"))
                    ),
                    lambda s: F.concat(
                        F.lit("v"),
                        s["video_id"].cast("string"),
                        F.lit(":"),
                        s["vn"].cast("string"),
                    ),
                ),
            ).alias("top_videos")
        )
    )
    totals = exploded.groupBy("column_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("pv"),
        F.countDistinct("user_id").cast("bigint").alias("uv"),
    )
    return totals.join(tops, "column_id").select(
        "column_id", "pv", "uv", "top_videos"
    )
