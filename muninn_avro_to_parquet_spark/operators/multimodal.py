"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns plus a typed metadata struct; the
Spark-side plumbing — schemas, batch shapes, partition-friendly UDF
signatures — is real and tested. The actual codec work (JPEG decode, audio
resample, video frame extraction) is STUBBED: the runtime image has no
media libraries, so ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless ``deterministic_fake=True``, which produces
a seeded fake derived from the content hash (stable across runs/engines —
good enough to test every downstream operator).

At 100 TB: binary payloads stay columnar (Parquet binary + Snappy), decode
runs in ``mapInPandas`` with Arrow batches so each task holds only one
batch of media in memory, and ``repartition`` on the metadata struct's
size field balances skew from mixed media sizes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
    ]
)

def image_features_type(id_col: str = "doc_id", id_type: T.DataType | None = None) -> T.StructType:
    return T.StructType(
        [
            T.StructField(id_col, id_type or T.LongType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("mean_luma", T.DoubleType(), True),
        ]
    )


IMAGE_FEATURES_TYPE = image_features_type()


def attach_binary(df: DataFrame, text_col: str = "text", media_type: str = "blob") -> DataFrame:
    """Materialize an opaque binary column + metadata struct from a source
    column (tests use utf-8 text as the stand-in payload)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.withColumn("media", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ),
    )


def _fake_image_features(doc_id: int, payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic fake 'decode': dimensions/luma derived from sha256."""
    h = hashlib.sha256(payload or b"").digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    mean_luma = h[2] / 255.0
    return doc_id, width, height, mean_luma


def decode_images(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    deterministic_fake: bool = False,
) -> DataFrame:
    """Image decode + feature extraction over Arrow batches.

    Real decode is unavailable in this image (no PIL/opencv); the plumbing
    (mapInPandas signature, output schema, batch iteration) is the part the
    engine owns and tests."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "image decode requires a media library not present in this "
                    "runtime; pass deterministic_fake=True for the seeded stub"
                )
            rows = [
                _fake_image_features(i, m)
                for i, m in zip(pdf[id_col], pdf[media_col])
            ]
            yield pd.DataFrame(rows, columns=[id_col, "width", "height", "mean_luma"])

    schema = image_features_type(id_col, df.schema[id_col].dataType)
    return df.select(id_col, media_col).mapInPandas(run, schema=schema)


def audio_features_type(id_col: str = "doc_id", id_type: T.DataType | None = None) -> T.StructType:
    return T.StructType(
        [
            T.StructField(id_col, id_type or T.LongType(), True),
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("duration_s", T.DoubleType(), True),
            T.StructField("rms", T.DoubleType(), True),
        ]
    )


AUDIO_FEATURES_TYPE = audio_features_type()

_SAMPLE_RATES = (8000, 16000, 22050, 44100)


def _fake_audio_features(doc_id: int, payload: bytes) -> tuple[int, int, float, float]:
    """Deterministic fake audio 'decode': rate/duration/level from sha256."""
    h = hashlib.sha256(payload or b"").digest()
    sample_rate = _SAMPLE_RATES[h[0] % len(_SAMPLE_RATES)]
    # exact power-of-two division — no rounding, so every engine agrees
    duration_s = len(payload or b"") / 1024.0
    rms = h[3] / 255.0
    return doc_id, sample_rate, duration_s, rms


def decode_audio(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    deterministic_fake: bool = False,
) -> DataFrame:
    """Audio decode + feature extraction over Arrow batches (same plumbing
    contract as ``decode_images``; codec stubbed — no audio libs here)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "audio decode requires a media library not present in this "
                    "runtime; pass deterministic_fake=True for the seeded stub"
                )
            rows = [
                _fake_audio_features(i, m)
                for i, m in zip(pdf[id_col], pdf[media_col])
            ]
            yield pd.DataFrame(
                rows, columns=[id_col, "sample_rate", "duration_s", "rms"]
            )

    schema = audio_features_type(id_col, df.schema[id_col].dataType)
    return df.select(id_col, media_col).mapInPandas(run, schema=schema)


def frame_sample_plan(df: DataFrame, every_n: int = 30, id_col: str = "doc_id") -> DataFrame:
    """Video frame-sampling *plan*: rows (doc_id, frame_index) for frames a
    decoder would extract — the Spark-side fan-out is real, the decode is
    not. Frame count is faked from payload size (1 frame / 1 KiB)."""
    n_frames = F.greatest((F.col("media_meta.n_bytes") / 1024).cast("int"), F.lit(1))
    return df.select(
        id_col,
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_index"),
    )
