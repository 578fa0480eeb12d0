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
    4 byte-statistics of the payload. Replaces model inference.

    Every component is an integer-valued float (length, byte sum,
    first byte, last byte) so the vector survives the float32 array
    round-trip bit-exactly and a SQL oracle can reproduce it with no
    floating-point rounding anywhere (sum <= 2^24 for payloads up to
    ~65 KiB of 0xFF — far above any test payload)."""
    if not payload:
        return [0.0] * FEATURE_DIM
    return [
        float(len(payload)),
        float(sum(payload)),
        float(payload[0]),
        float(payload[-1]),
    ]


_FRAME_SCHEMA = "doc_id long, frame_no int, frame binary, frame_bytes int"


def frame_sample(df: DataFrame, frame_bytes: int = 32, every_n: int = 1) -> DataFrame:
    """Frame sampling over a binary media column: split each payload
    into fixed-size frames and keep every ``every_n``-th (the
    video-frame-extraction shape; a real decoder replaces the
    byte-slicing with ffmpeg/PIL frame reads — the Spark plumbing,
    Arrow batch shape, and output schema stay identical).

    Input: (doc_id, payload, ...) from :func:`with_binary_payload`.
    Output: one row per sampled frame (doc_id, frame_no, frame,
    frame_bytes) — a narrow fan-out, no shuffle.
    """
    import pandas as pd

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames, sizes = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                n = (len(data) + frame_bytes - 1) // frame_bytes
                for i in range(0, n, every_n):
                    chunk = data[i * frame_bytes:(i + 1) * frame_bytes]
                    ids.append(doc_id)
                    nos.append(i)
                    frames.append(chunk)
                    sizes.append(len(chunk))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_no": nos, "frame": frames, "frame_bytes": sizes}
            )

    return df.mapInPandas(_frames, _FRAME_SCHEMA)


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
