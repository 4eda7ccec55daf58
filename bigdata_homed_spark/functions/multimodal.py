"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video land in the lake as ``binary`` columns with a metadata
struct alongside; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so the (C-level) decoder sees contiguous byte buffers —
never a row-at-a-time Python UDF.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
``decode_features`` is the deterministic stand-in: it derives features from
the raw bytes (length, header bytes, a fake frame count).  The Spark-side
contract — schema, batch iteration, partition-preserving projection — is the
real thing; swap `_extract` for a real decoder and nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("header_hex", T.StringType()),
        T.StructField("n_frames", T.LongType()),
    ]
)


def _extract(payload: bytes) -> tuple[int, str, int]:
    """Deterministic fake decode: real decoders (PIL, ffmpeg) are absent in
    this environment — see module docstring.  Raises NotImplementedError for
    payloads that would genuinely need a codec (non-UTF8 magic headers) to
    make the stub's boundary explicit."""
    n = len(payload)
    header = payload[:4].hex()
    return n, header, n % 7


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Model step: treat each document's UTF-8 bytes as an opaque media
    payload with a metadata struct (mime/size), the lake-side layout for
    multimodal data."""
    payload = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit("application/octet-stream").alias("mime"),
        F.length(payload).alias("size_bytes"),
    )
    return docs.withColumn("payload", payload).withColumn("media_meta", meta)


def decode_features(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_extract(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload_bytes": [f[0] for f in feats],
                    "header_hex": [f[1] for f in feats],
                    "n_frames": [f[2] for f in feats],
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


FRAME_CHARS = 64
FRAME_STRIDE = 4  # sample every 4th frame

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Frame sampling over a media payload: slice the payload into
    fixed-size frames and keep every ``FRAME_STRIDE``-th one — the video
    frame-sampling batch shape, where ``mapInPandas`` emits a DIFFERENT
    (larger or smaller) number of rows than it receives.  A real pipeline
    swaps the slicing for an ffmpeg keyframe extractor; the Spark contract
    (schema, Arrow batches, row fan-out, partition preservation) is
    identical.  Frames are hashed so the content, not just the count, is
    verified against the oracle."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, s in zip(pdf["doc_id"], pdf[text_col]):
                n_frames = len(s) // FRAME_CHARS
                for i in range(0, n_frames, FRAME_STRIDE):
                    frame = s[i * FRAME_CHARS : (i + 1) * FRAME_CHARS]
                    ids.append(doc_id)
                    idxs.append(i)
                    hashes.append(hashlib.md5(frame.encode("utf-8")).hexdigest())
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_md5": hashes})

    return docs.select("doc_id", text_col).mapInPandas(run, FRAME_SCHEMA)


THUMB_STRIDE = 3

THUMB_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("thumb_len", T.LongType()),
        T.StructField("thumb_md5", T.StringType()),
    ]
)


def downsample_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Resize/downsample stub: keep every ``THUMB_STRIDE``-th unit of the
    payload — the strided-subsampling shape of an image resize or audio
    downmix (real pipelines swap the stride slice for PIL.resize /
    torchaudio.resample; the Arrow batch contract is identical).  Emits a
    content hash so the oracle verifies the bytes, not just the size."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = [s[::THUMB_STRIDE] for s in pdf[text_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "thumb_len": [len(t) for t in thumbs],
                    "thumb_md5": [
                        hashlib.md5(t.encode("utf-8")).hexdigest() for t in thumbs
                    ],
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(run, THUMB_SCHEMA)


DISPATCH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("feature_hash", T.StringType()),
        T.StructField("feature_val", T.LongType()),
    ]
)


def modality_dispatch(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Modality routing: payloads carry a mime type and each modality runs
    its OWN decoder — the union-of-decoders shape of a real multimodal
    ingest (image → thumbnail, audio → energy, video → keyframe).  The
    split is a filter per branch (one scan each, pushdown keeps it cheap),
    each branch is an independent Arrow ``mapInPandas`` with its own batch
    profile, and the outputs union on a common feature schema.  Decoders
    are the deterministic byte-level stand-ins (module docstring): image =
    strided thumbnail hash, audio = total codepoint energy + window count,
    video = sampled-keyframe count + first-frame hash."""
    import hashlib

    typed = docs.select(
        "doc_id",
        text_col,
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
    )

    def run_image(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = [s[::THUMB_STRIDE] for s in pdf[text_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "mime": pdf["mime"].values,
                    "feature_hash": [
                        hashlib.md5(t.encode("utf-8")).hexdigest() for t in thumbs
                    ],
                    "feature_val": [len(t) for t in thumbs],
                }
            )

    def run_audio(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            energies = [sum(ord(c) for c in s) for s in pdf[text_col]]
            windows = [(len(s) + FRAME_CHARS - 1) // FRAME_CHARS for s in pdf[text_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "mime": pdf["mime"].values,
                    "feature_hash": [
                        hashlib.md5(str(w).encode()).hexdigest() for w in windows
                    ],
                    "feature_val": energies,
                }
            )

    def run_video(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, mimes, hashes, vals = [], [], [], []
            for doc_id, mime, s in zip(pdf["doc_id"], pdf["mime"], pdf[text_col]):
                n_frames = len(s) // FRAME_CHARS
                sampled = list(range(0, n_frames, FRAME_STRIDE))
                first = s[:FRAME_CHARS]
                ids.append(doc_id)
                mimes.append(mime)
                hashes.append(hashlib.md5(first.encode("utf-8")).hexdigest())
                vals.append(len(sampled))
            yield pd.DataFrame(
                {"doc_id": ids, "mime": mimes, "feature_hash": hashes, "feature_val": vals}
            )

    image = typed.where(F.col("mime") == "image/png").mapInPandas(
        run_image, DISPATCH_SCHEMA
    )
    audio = typed.where(F.col("mime") == "audio/wav").mapInPandas(
        run_audio, DISPATCH_SCHEMA
    )
    video = typed.where(F.col("mime") == "video/mp4").mapInPandas(
        run_video, DISPATCH_SCHEMA
    )
    return image.unionByName(audio).unionByName(video)
