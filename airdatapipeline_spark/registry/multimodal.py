"""Multimodal columns: binary feature extraction, decode, frame sampling,
audio features, resize roundtrip (Arrow-batched mapInPandas plumbing)."""

from __future__ import annotations

from pyspark.sql import functions as F
from ..operators import multimodal
from .core import register



@register(
    "mm_binary_features",
    """
    SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS payload_md5
    FROM documents
    """,
)
def mm_features(spark, sf_dir):
    return multimodal.binary_features(spark, sf_dir)


@register(
    "mm_decode_features",
    """
    SELECT doc_id, octet_length(encode(text)) AS n_bytes,
           CAST(16 * (1 + CAST(concat('0x', substr(md5(text), 1, 2)) AS INT) % 64) AS INTEGER) AS width,
           CAST(16 * (1 + CAST(concat('0x', substr(md5(text), 3, 2)) AS INT) % 64) AS INTEGER) AS height,
           CAST(1 + CAST(concat('0x', substr(md5(text), 5, 2)) AS INT) % 8 AS INTEGER) AS n_frames,
           CAST(16 * (1 + CAST(concat('0x', substr(md5(text), 1, 2)) AS INT) % 64) AS BIGINT)
             * CAST(16 * (1 + CAST(concat('0x', substr(md5(text), 3, 2)) AS INT) % 64) AS BIGINT)
             AS n_pixels
    FROM documents
    """,
)
def mm_decode(spark, sf_dir):
    return multimodal.decode_features(spark, sf_dir)


@register(
    "mm_resize_roundtrip",
    """
    SELECT doc_id, 224 AS width, 224 AS height, CAST((224 * 224) // 64 AS BIGINT) AS n_bytes,
           CAST(octet_length(encode(text)) AS BIGINT) AS src_bytes
    FROM documents
    """,
)
def mm_resize(spark, sf_dir):
    """Binary-in/binary-out resize plumbing; oracle checks the metadata
    contract (fixed target dims + deterministic output size)."""
    from ..operators import multimodal

    out = multimodal.resize_images(spark, sf_dir)
    src = multimodal.binary_documents(spark, sf_dir).select(
        "doc_id", F.col("n_bytes").alias("src_bytes")
    )
    return (
        out.join(src, on="doc_id")
        .select(
            "doc_id",
            F.col("width").cast("int").alias("width"),
            F.col("height").cast("int").alias("height"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
            "src_bytes",
        )
    )


@register(
    "mm_frame_sample",
    """
    WITH f AS (
      SELECT doc_id,
             CAST(1 + CAST(concat('0x', substr(md5(text), 5, 2)) AS INT) % 8 AS INTEGER)
               AS n_frames
      FROM documents
    )
    SELECT doc_id, n_frames, CAST(unnest(range(0, n_frames, 2)) AS INTEGER) AS frame_idx
    FROM f
    """,
)
def mm_frames(spark, sf_dir):
    """Every-2nd-frame sampling: decode once per doc, explode AFTER the
    metadata decode so the binary never replicates per frame."""
    return multimodal.frame_sample_plan(spark, sf_dir)


@register(
    "mm_audio_features",
    """
    SELECT doc_id, n_bytes, sample_rate, n_channels,
           CAST(sample_rate * secs AS BIGINT) AS n_samples,
           (sample_rate * secs) / sample_rate AS duration_sec
    FROM (
      SELECT doc_id, octet_length(encode(text)) AS n_bytes,
             ([8000, 16000, 22050, 44100])[1 + CAST(concat('0x', substr(md5(text), 7, 2)) AS INT) % 4]
               AS sample_rate,
             CAST(1 + CAST(concat('0x', substr(md5(text), 9, 2)) AS INT) % 2 AS INTEGER)
               AS n_channels,
             1 + CAST(concat('0x', substr(md5(text), 11, 2)) AS INT) % 30 AS secs
      FROM documents
    )
    """,
)
def mm_audio(spark, sf_dir):
    """Audio-metadata decode via mapInPandas (FakeAudioDecoder), md5-mirrored."""
    return multimodal.audio_features(spark, sf_dir)
