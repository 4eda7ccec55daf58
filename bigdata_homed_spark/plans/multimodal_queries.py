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
