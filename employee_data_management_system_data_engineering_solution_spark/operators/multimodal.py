"""Multimodal column plumbing (north-star; BASELINE.json).

Images/audio/video are opaque ``binary`` columns plus typed metadata.
The Spark-side contract — schema, Arrow batch shape, partitioning — is
real and tested; the actual media decode is STUBBED (the image/audio
libraries are not in this container): ``decode_features`` computes a
deterministic fake feature vector from the bytes, and
``decode_image_stub`` raises ``NotImplementedError`` where a real
decoder (PIL/librosa/ffmpeg) would plug in.

Scale notes: ``mapInPandas`` streams Arrow batches — binary payloads
never materialize as Python lists; per-batch memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``. Decode is a narrow
map (no shuffle), so media pipelines scale with input splits.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 4

_DECODE_SCHEMA = (
    "doc_id long, n_bytes int, media_type string, feature array<float>"
)


def with_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Synthesize a binary media column from text (test stand-in for a
    real media blob) plus typed metadata columns."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.octet_length(F.encode(F.col(text_col), "UTF-8")).alias("n_bytes"),
    )


def decode_image_stub(payload: bytes) -> "object":
    """Placeholder for a real image decode (PIL.Image.open etc.).

    The container has no media libraries; a production deployment
    replaces this function only — the Spark plumbing stays identical.
    """
    raise NotImplementedError(
        "media decode requires an image/audio library not present in this environment"
    )


def _fake_feature(payload: bytes) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector:
    4 byte-statistics of the payload. Replaces model inference."""
    if not payload:
        return [0.0] * FEATURE_DIM
    n = len(payload)
    s = sum(payload)
    return [
        float(n),
        round(s / n, 4),
        float(payload[0]),
        float(payload[-1]),
    ]


def decode_features(df: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over a binary column.

    Input: (doc_id, payload binary, media_type, n_bytes) from
    :func:`with_binary_payload`. Output adds ``feature array<float>``.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"].astype("int32"),
                    "media_type": pdf["media_type"],
                    "feature": [_fake_feature(p) for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(_decode, _DECODE_SCHEMA)
