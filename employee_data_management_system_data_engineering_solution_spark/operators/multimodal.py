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

from ..sources.io import arrow_batch_defaults

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

    arrow_batch_defaults(df.sparkSession)
    return df.mapInPandas(_frames, _FRAME_SCHEMA)


def image_dims_stub(df: DataFrame) -> DataFrame:
    """Deterministic stand-in for decoded image dimensions.

    Input: a payload frame from :func:`with_binary_payload`. Output
    adds typed ``width``/``height`` metadata columns derived from the
    payload size (256..1216 px in 64-px steps — the step grid real
    aspect-ratio bucketing snaps to anyway). A production deployment
    replaces ONLY this derivation with the real decoded header
    metadata (PIL ``Image.size`` etc., extracted once at ingest); the
    Spark-side plumbing — typed metadata columns feeding the
    zero-shuffle bucket argmin — is identical. Rows with a NULL/empty
    payload carry NULL dims (nothing to bucket)."""
    usable = F.col("n_bytes").isNotNull() & (F.col("n_bytes") > 0)
    return df.select(
        "*",
        F.when(usable, (F.lit(256) + (F.col("n_bytes") % 16) * 64))
        .cast("int")
        .alias("width"),
        F.when(
            usable,
            (F.lit(256) + (F.expr("n_bytes div 16") % 16) * 64),
        )
        .cast("int")
        .alias("height"),
    )


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
                    # nullable Int32: a NULL payload row (malformed
                    # media) keeps NULL metadata instead of crashing
                    # the worker on a NaN→int cast
                    "n_bytes": pdf["n_bytes"].astype("Int32"),
                    "media_type": pdf["media_type"],
                    "feature": [
                        None if p is None else _fake_feature(p)
                        for p in pdf["payload"]
                    ],
                }
            )

    arrow_batch_defaults(df.sparkSession)
    return df.mapInPandas(_decode, _DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual-hash near-duplicate detection (X141)
# ---------------------------------------------------------------------------

PHASH_BITS = 64


def phash_signature_py(payload: bytes, nblocks: int = 65) -> list[int]:
    """Pure-Python difference-hash (dHash) of a media payload,
    returned as band integers.

    Real deployment: decode the image, resize to a (nblocks)×1
    grayscale strip, compare adjacent pixel means — near-identical
    images (recompression, small edits) land within a few Hamming
    bits. Container stand-in (no media libs): the "pixel stream" is
    the UTF-8 code-point sequence of the payload, split into
    ``nblocks`` contiguous blocks; bit b = 1 iff block b's mean code
    exceeds block b+1's. The mean comparison is the exact integer
    cross-multiplication ``sum_b · len_{b+1} > sum_{b+1} · len_b`` —
    no float anywhere, so the signature is bit-identical across
    engines and a SQL oracle can replay it. A one-character edit
    perturbs one block sum and flips at most its two adjacent bits:
    the perceptual property (locality) is real even though the decode
    is stubbed.

    The 64 bits are packed into ``PHASH_NBANDS`` equal band integers
    (MSB-first within a band) — the banding IS the LSH: by pigeonhole,
    two signatures within Hamming distance d share at least one of
    d+1 bands, so ``nbands`` bands give exact recall for d < nbands.
    """
    text = (bytes(payload) if payload is not None else b"").decode(
        "utf-8", errors="replace"
    )
    codes = [ord(c) for c in text]
    n = len(codes)
    sums, lens = [], []
    for b in range(nblocks):
        lo = (b * n) // nblocks
        hi = ((b + 1) * n) // nblocks
        sums.append(sum(codes[lo:hi]))
        lens.append(hi - lo)
    return [
        1 if sums[b] * lens[b + 1] > sums[b + 1] * lens[b] else 0
        for b in range(nblocks - 1)
    ]


def _pack_bands(bits: list[int], nbands: int) -> list[int]:
    width = len(bits) // nbands
    return [
        sum(bit << (width - 1 - i) for i, bit in enumerate(bits[j * width:(j + 1) * width]))
        for j in range(nbands)
    ]


#: Payload-size bound for the numpy pHash fast path: the bit comparison
#: multiplies an int64 block sum (≤ n·0x10FFFF/nblocks) by an int64
#: block length (≤ n/nblocks + 1), which stays under 2^63 only while
#: n²·0x10FFFF/nblocks² < 2^63 — n below ~1.5e9 chars at nblocks=65.
#: Past this conservative guard _phash_bands_np falls back to the
#: pure-Python reference (arbitrary-precision ints) instead of silently
#: diverging from the bit-identity its docstring claims (ADVICE r16).
_NP_SAFE_MAX_CHARS = 10**9


def _phash_bands_np(payload: bytes, nbands: int, nblocks: int = 65) -> list[int]:
    """Vectorized (numpy) twin of ``_pack_bands(phash_signature_py(p))``
    — the Python-worker hot path of :func:`phash_signatures`. All
    arithmetic is int64 (codepoints ≤ 0x10FFFF, block sums far under
    2^63), so the bands are BIT-IDENTICAL to the pure-Python
    reference; tests/test_multimodal.py pins the equality. The
    per-character ``ord()`` list and per-block Python sums of the
    reference were the UDF's dominant cost (guide §4.2: hand whole
    rows to vectorized native code); here the codepoint stream comes
    from one utf-32 re-encode and the block sums from one cumsum."""
    import numpy as np

    if (nblocks - 1) % nbands:
        # the numpy reshape would raise a shape error; the pure-Python
        # _pack_bands silently truncated trailing bits — fail loudly
        # instead of silently changing non-default-nbands behavior
        # (ADVICE r16)
        raise ValueError(
            f"nbands={nbands} must divide nblocks-1={nblocks - 1} bits evenly"
        )

    text = (bytes(payload) if payload is not None else b"").decode(
        "utf-8", errors="replace"
    )
    if len(text) > _NP_SAFE_MAX_CHARS:
        return _pack_bands(phash_signature_py(payload, nblocks), nbands)
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    n = len(codes)
    bounds = (np.arange(nblocks + 1, dtype=np.int64) * n) // nblocks
    csum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(codes, out=csum[1:])
    sums = csum[bounds[1:]] - csum[bounds[:-1]]
    lens = bounds[1:] - bounds[:-1]
    bits = (sums[:-1] * lens[1:] > sums[1:] * lens[:-1]).astype(np.int64)
    width = (nblocks - 1) // nbands
    weights = np.int64(1) << np.arange(width - 1, -1, -1, dtype=np.int64)
    return [int(x) for x in bits.reshape(nbands, width) @ weights]


def phash_signatures(df: DataFrame, *, nbands: int = 8) -> DataFrame:
    """Arrow-batched perceptual-hash signatures over a binary column:
    (doc_id, payload) → (doc_id, bands array<int>), ``nbands`` band
    integers of 64/nbands bits each. A narrow map — no shuffle; a real
    image decoder replaces :func:`phash_signature_py`'s byte→pixel
    step only, the Spark plumbing stays identical. The worker-side
    hash is the vectorized :func:`_phash_bands_np` (bit-identical to
    the pure-Python reference, pinned in tests).

    Band-width trade (the scale knob): more bands ⇒ exact recall up to
    a larger Hamming radius (d < nbands) but coarser band values ⇒
    bigger candidate buckets. 8 bands of 8 bits suit ~10⁶-row corpora;
    at larger scale drop to 4×16 (d ≤ 3) or band PAIRS to keep bucket
    sizes bounded, same machinery."""
    if PHASH_BITS % nbands:
        raise ValueError(f"nbands must divide {PHASH_BITS}")

    def _sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "bands": [
                        _phash_bands_np(p, nbands) for p in pdf["payload"]
                    ],
                }
            )

    arrow_batch_defaults(df.sparkSession)
    return df.select("doc_id", "payload").mapInPandas(
        _sig, "doc_id long, bands array<int>"
    )


def phash_neardup_pairs(sig: DataFrame, *, max_dist: int = 6) -> DataFrame:
    """Near-duplicate pairs from banded perceptual-hash signatures:
    candidates are generated by an EQUI-JOIN on (band_idx, band_val)
    — never an all-pairs comparison — then verified with the exact
    Hamming distance (popcount over per-band XOR) and filtered to
    ``max_dist``. Output: (id_a, id_b, hamming), id_a < id_b.

    Scale: candidate volume is bounded by Σ bucket² over band-value
    buckets, the same skew profile as the MinHash/SimHash banders in
    ``operators/dedup`` (hub fallback applies there when a bucket
    degenerates); the verify join ships only the 8-int signatures.
    Exact recall for d < nbands by pigeonhole; beyond that the banding
    is approximate like any LSH."""
    e = sig.select(
        "doc_id", F.posexplode("bands").alias("band_idx", "band_val")
    )
    cand = (
        e.alias("a")
        .join(
            e.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("id_a"), F.col("bands").alias("__ba"))
    sb = sig.select(F.col("doc_id").alias("id_b"), F.col("bands").alias("__bb"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "hamming",
            F.expr(
                "aggregate(zip_with(__ba, __bb, (x, y) -> bit_count(x ^ y)), "
                "0, (acc, v) -> acc + CAST(v AS INT))"
            ),
        )
        .filter(F.col("hamming") <= max_dist)
        .select("id_a", "id_b", "hamming")
    )
