"""Multimodal column plumbing — image/audio/video as opaque binary columns
with typed metadata. The decode/feature libs aren't in this container, so
the decode kernels are STUBBED behind deterministic fakes / clearly-marked
NotImplementedError; the Spark-side plumbing (schema, partitioning, Arrow
batch shape, UDF signatures) is real and tested.

At scale: media bytes live in the `content` binary column of a separate
media table keyed by media_ref (never inline in the documents table —
keeps the text-plane scans narrow); decode stages are mapInPandas over
that table, partitioned by media_ref hash so one oversized asset can't
skew a partition.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video|table
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("decode_status", T.StringType()),
    ]
)


def _real_decode(kind: str, content: bytes):  # pragma: no cover - stub
    """Placeholder for a real decoder (PIL/librosa/ffmpeg). Not available
    in this container."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "environment; use fake_decode=True for the deterministic stub"
    )


def extract_media_features(
    media: DataFrame, dim: int = 8, fake_decode: bool = True
) -> DataFrame:
    """mapInPandas feature extraction. With fake_decode, features are a
    deterministic digest of the bytes (sha256 → dim floats in [0,1)) so
    the distributed plumbing is fully testable without codec libs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, statuses = [], []
            for kind, content in zip(pdf["kind"], pdf["content"]):
                if content is None:
                    feats.append(None)
                    statuses.append("missing")
                    continue
                if not fake_decode:
                    _real_decode(kind, content)  # raises NotImplementedError
                digest = hashlib.sha256(bytes(content)).digest()
                feats.append(
                    [digest[i] / 255.0 for i in range(dim)]
                )
                statuses.append("ok_fake")
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "decode_status": statuses,
                }
            )

    return media.select("media_ref", "kind", "content").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN (timestamps only — decode stubbed):
    one row per sampled frame, JVM-side sequence expansion."""
    return media.where(F.col("kind") == "video").select(
        "media_ref",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def media_from_documents(exploded_spans: DataFrame) -> DataFrame:
    """Derive a media-table skeleton from non-text spans (content empty —
    at scale this joins to the blob store's Iceberg table by media_ref)."""
    return (
        exploded_spans.where(F.col("kind") != "text")
        .select(
            "media_ref",
            "kind",
            F.lit(None).cast("binary").alias("content"),
            F.lit(None).cast("string").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        )
        .distinct()
    )
