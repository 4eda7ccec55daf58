"""Multimodal pipeline query: binary payload → mapInPandas feature extract.

The oracle can verify this one because the stand-in "decoder" derives its
features from the payload bytes, which for UTF-8 text payloads are also
reachable from SQL (octet_length / hex of the first bytes).  A real image
decoder would drop the oracle entry and rely on the rows-only check — the
Spark plumbing under test (binary column, Arrow batches, schema) is
identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.multimodal import attach_binary_payload, decode_features
from .registry import query


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           cast(octet_length(encode(text)) as bigint) AS payload_bytes,
           lower(hex(encode(substr(text, 1, 4)))) AS header_hex,
           cast(octet_length(encode(text)) % 7 as bigint) AS n_frames
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return decode_features(attach_binary_payload(docs))


@query(
    "multimodal_frame_sample",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, text,
             unnest(generate_series(0, cast(length(text)//64 - 1 as bigint), 4))
               AS frame_idx
      FROM documents
    )
    SELECT doc_id, frame_idx,
           md5(substr(text, cast(frame_idx*64 + 1 as bigint), 64)) AS frame_md5
    FROM f
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (video keyframe batch shape): mapInPandas fans each
    payload out to every 4th 64-char frame with a content hash.  The oracle
    recomputes the frames with codepoint arithmetic — DuckDB substr and
    Python slicing agree on code points, and md5 runs over the UTF-8 bytes
    in both engines."""
    from ..functions.multimodal import sample_frames
    from ..sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(docs)


@query(
    "multimodal_thumbnail",
    oracle="""
    SELECT doc_id,
           cast((length(text) + 2) // 3 as bigint) AS thumb_len,
           md5(array_to_string(list_transform(
                 generate_series(1, cast(length(text) as bigint), 3),
                 i -> substr(text, cast(i as bigint), 1)), '')) AS thumb_md5
    FROM documents
    """,
)
def multimodal_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/downsample stub (image thumbnail / audio downmix shape):
    strided subsampling in mapInPandas, content-hash-verified — DuckDB
    recomputes the same stride with codepoint arithmetic."""
    from ..functions.multimodal import downsample_payload
    from ..sources.tables import load_table

    return downsample_payload(load_table(spark, sf_dir, "documents"))


@query(
    "media_dedup_by_content",
    oracle="""
    WITH hashed AS (
      SELECT doc_id, md5(text) AS content_md5,
             cast(octet_length(encode(text)) as bigint) AS n_bytes
      FROM documents
    )
    SELECT content_md5,
           cast(min(doc_id) as bigint) AS keep_doc,
           cast(count(*) as bigint) AS n_copies,
           cast(sum(n_bytes) as bigint) AS total_bytes
    FROM hashed GROUP BY content_md5
    """,
)
def media_dedup_by_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup: content-hash the binary payload (md5 over the
    raw bytes — the only correct identity for opaque media), group on the
    hash, keep the lowest id as representative.  The standard first pass
    of any image/audio corpus dedup; one hash-partitioned shuffle, linear
    at any corpus size."""
    from pyspark.sql import functions as F

    from ..functions.multimodal import attach_binary_payload
    from ..sources.tables import load_table

    docs = attach_binary_payload(load_table(spark, sf_dir, "documents"))
    hashed = docs.select(
        "doc_id",
        F.md5("payload").alias("content_md5"),
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
    )
    return hashed.groupBy("content_md5").agg(
        F.min("doc_id").cast("bigint").alias("keep_doc"),
        F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
    )


@query(
    "modality_dispatch_features",
    oracle="""
    WITH typed AS (
      SELECT doc_id, text,
             CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                  WHEN doc_id % 3 = 1 THEN 'audio/wav'
                  ELSE 'video/mp4' END AS mime
      FROM documents
    )
    SELECT doc_id, mime,
           md5(array_to_string(list_transform(
                 generate_series(1, cast(length(text) as bigint), 3),
                 i -> substr(text, cast(i as bigint), 1)), '')) AS feature_hash,
           cast((length(text) + 2) // 3 as bigint) AS feature_val
    FROM typed WHERE mime = 'image/png'
    UNION ALL
    SELECT doc_id, mime,
           md5(cast((length(text) + 63) // 64 as varchar)) AS feature_hash,
           cast(list_reduce(list_transform(generate_series(1, cast(length(text) as bigint)),
                  i -> ord(substr(text, cast(i as bigint), 1))), (a, b) -> a + b)
                as bigint) AS feature_val
    FROM typed WHERE mime = 'audio/wav'
    UNION ALL
    SELECT doc_id, mime,
           md5(substr(text, 1, 64)) AS feature_hash,
           cast((length(text)//64 + 3) // 4 as bigint) AS feature_val
    FROM typed WHERE mime = 'video/mp4'
    """,
)
def modality_dispatch_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modality routing (image/audio/video each through its own decoder):
    per-mime filter branches, one Arrow mapInPandas per modality, union on
    a shared feature schema — the ingest shape of a real multimodal
    pipeline.  The oracle recomputes every stand-in decoder with codepoint
    arithmetic (DuckDB and Python agree exactly on code points and md5 of
    UTF-8 bytes)."""
    from ..functions.multimodal import modality_dispatch
    from ..sources.tables import load_table

    return modality_dispatch(load_table(spark, sf_dir, "documents"))
