"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: store the raw bytes as a
`binary` column (or a reference into object storage) next to typed metadata,
and run decode / feature-extraction / resize / frame-sampling as Arrow-
batched pandas functions over `mapInPandas` — one Python crossing per batch,
decode parallelism = partitions, no driver involvement.

The container has no image/audio libraries, so the real decoders are STUBS
behind a clearly marked NotImplementedError; the `FakeDecoder` is a
deterministic stand-in (md5-derived dimensions) that keeps the Spark-side
plumbing — schema, partitioning, UDF signature, Arrow batch shape — real,
tested, and even oracle-checkable (md5 is reproducible in SQL).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from dataclasses import dataclass
from typing import Protocol

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, n_frames int, n_pixels long"
)


class Decoder(Protocol):
    def decode(self, payload: bytes) -> tuple[int, int, int]:
        """→ (width, height, n_frames)."""
        ...


@dataclass
class FakeDecoder:
    """Deterministic fake: dimensions derived from the payload's md5 — the
    same integers `CAST(concat('0x', substr(md5(text), ...)) AS INT)`
    produces in SQL, so the whole mapInPandas path is oracle-verified."""

    def decode(self, payload: bytes) -> tuple[int, int, int]:
        h = hashlib.md5(payload).hexdigest()
        width = 16 * (1 + int(h[0:2], 16) % 64)
        height = 16 * (1 + int(h[2:4], 16) % 64)
        n_frames = 1 + int(h[4:6], 16) % 8
        return width, height, n_frames


@dataclass
class ImageLibDecoder:
    """Real image decoder, gated on the environment: when Pillow is
    importable the decode actually runs (width/height from the codec,
    n_frames for animated formats); when it is absent — as in this
    container, verified ModuleNotFoundError — the stub message fires. The
    Spark-side contract is identical to FakeDecoder, so swapping decoders
    never changes the plan, schema, or batch shape."""

    def decode(self, payload: bytes) -> tuple[int, int, int]:
        import importlib.util
        import io

        if importlib.util.find_spec("PIL") is None:
            raise NotImplementedError(
                "STUB: real image/video decode needs PIL/ffmpeg; plug in via "
                "Decoder protocol (see FakeDecoder for the tested plumbing)"
            )
        from PIL import Image

        with Image.open(io.BytesIO(payload)) as img:
            return img.width, img.height, int(getattr(img, "n_frames", 1))


AUDIO_SCHEMA = (
    "doc_id long, n_bytes long, sample_rate int, n_channels int, "
    "n_samples long, duration_sec double"
)

AUDIO_RATES = [8000, 16000, 22050, 44100]


@dataclass
class FakeAudioDecoder:
    """Deterministic audio-decode stand-in (md5-derived sample rate /
    channels / length) — same oracle-reproducible trick as FakeDecoder, so
    the audio mapInPandas path is value-verified end-to-end."""

    def decode(self, payload: bytes) -> tuple[int, int, int]:
        """→ (sample_rate, n_channels, n_samples)."""
        h = hashlib.md5(payload).hexdigest()
        sample_rate = AUDIO_RATES[int(h[6:8], 16) % 4]
        n_channels = 1 + int(h[8:10], 16) % 2
        n_samples = sample_rate * (1 + int(h[10:12], 16) % 30)  # 1..30 s
        return sample_rate, n_channels, n_samples


@dataclass
class AudioLibDecoder:
    """Real audio decoder, gated on the environment: decodes through
    soundfile when importable (absent in this container — verified), else
    raises the stub message. Contract identical to FakeAudioDecoder."""

    def decode(self, payload: bytes) -> tuple[int, int, int]:
        import importlib.util
        import io

        if importlib.util.find_spec("soundfile") is None:
            raise NotImplementedError(
                "STUB: real audio decode needs soundfile/ffmpeg; plug in via "
                "the same Decoder-protocol slot FakeAudioDecoder fills"
            )
        import soundfile as sf_lib

        with sf_lib.SoundFile(io.BytesIO(payload)) as snd:
            return int(snd.samplerate), int(snd.channels), int(len(snd))


def audio_features(
    spark: SparkSession, sf_dir: str, decoder: FakeAudioDecoder | None = None
) -> DataFrame:
    """Audio metadata extraction over the binary column (mapInPandas, same
    plumbing as image decode): sample rate, channels, sample count, and
    duration (exact integer ratio, one IEEE division)."""
    decoder = decoder or FakeAudioDecoder()
    src = binary_documents(spark, sf_dir).select("doc_id", "payload", "n_bytes")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [decoder.decode(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": pdf["n_bytes"].values,
                    "sample_rate": [m[0] for m in meta],
                    "n_channels": [m[1] for m in meta],
                    "n_samples": pd.Series([m[2] for m in meta], dtype="int64"),
                }
            )
            out["duration_sec"] = out["n_samples"] / out["sample_rate"]
            yield out

    return src.mapInPandas(run, schema=AUDIO_SCHEMA)


def binary_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with an opaque binary payload column (utf-8 bytes of text
    stand in for image bytes) + byte-level metadata."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.md5(F.encode("text", "UTF-8")).alias("payload_md5"),
    )


def binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-side byte-level features of the binary column (no Python)."""
    return binary_documents(spark, sf_dir).select("doc_id", "n_bytes", "payload_md5")


def decode_features(
    spark: SparkSession, sf_dir: str, decoder: Decoder | None = None
) -> DataFrame:
    """The decode/feature-extract operator: mapInPandas over the binary
    column. Output is flat typed metadata; the heavy bytes never leave the
    executor. Partition count = decode parallelism."""
    decoder = decoder or FakeDecoder()
    src = binary_documents(spark, sf_dir).select("doc_id", "payload", "n_bytes")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [decoder.decode(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": pdf["n_bytes"].values,
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                }
            )
            out["n_pixels"] = out["width"].astype("int64") * out["height"].astype("int64")
            yield out

    return src.mapInPandas(run, schema=DECODE_SCHEMA)


def frame_sample_plan(
    spark: SparkSession, sf_dir: str, every_nth: int = 2, decoder: Decoder | None = None
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index —
    the row-expansion shape a video pipeline needs (explode AFTER decode
    metadata, so the binary is decoded once per doc, not per frame)."""
    feats = decode_features(spark, sf_dir, decoder)
    return feats.select(
        "doc_id",
        "n_frames",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))).alias(
            "frame_idx"
        ),
    )


RESIZE_SCHEMA = "doc_id long, width int, height int, payload binary"


def resize_images(
    spark: SparkSession, sf_dir: str, target: tuple[int, int] = (224, 224), decoder: Decoder | None = None
) -> DataFrame:
    """Resize plumbing: binary in → binary out, metadata updated. The fake
    'resize' is a deterministic truncation/pad of the payload to
    target-area bytes (a real one calls PIL inside the same batch loop);
    what is real and tested here is the binary-in/binary-out mapInPandas
    shape — the bytes never hit the driver, and output partitioning
    follows input partitioning (no shuffle)."""
    decoder = decoder or FakeDecoder()
    w, h = target
    src = binary_documents(spark, sf_dir).select("doc_id", "payload")

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out_payloads = []
            for p in pdf["payload"]:
                b = bytes(p)
                n = (w * h) // 64  # stand-in for the resized byte budget
                out_payloads.append((b * (n // max(len(b), 1) + 1))[:n])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": [w] * len(pdf),
                    "height": [h] * len(pdf),
                    "payload": out_payloads,
                }
            )

    return src.mapInPandas(run, schema=RESIZE_SCHEMA)
