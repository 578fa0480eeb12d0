"""Multimodal column plumbing: binary payloads + Arrow-batched decode."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from employee_data_management_system_data_engineering_solution_spark.operators.multimodal import (
    decode_features,
    decode_image_stub,
    with_binary_payload,
)


def test_with_binary_payload_metadata(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="abc"), Row(doc_id=2, text="")])
    out = {r.doc_id: r for r in with_binary_payload(df, "doc_id", "text").collect()}
    assert bytes(out[1].payload) == b"abc" and out[1].n_bytes == 3
    assert out[2].n_bytes == 0
    assert out[1].media_type == "application/octet-stream"


def test_decode_features_deterministic_fake(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="abc"), Row(doc_id=2, text="")])
    out = {
        r.doc_id: r for r in decode_features(with_binary_payload(df, "doc_id", "text")).collect()
    }
    # fake feature: [len, byte sum, first byte, last byte] — all
    # integer-valued so the float32 round-trip is bit-exact
    assert out[1].feature == [3.0, float(97 + 98 + 99), 97.0, 99.0]
    assert out[2].feature == [0.0, 0.0, 0.0, 0.0]


def test_frame_sample_exact_chunks(spark):
    from employee_data_management_system_data_engineering_solution_spark.operators.multimodal import (
        frame_sample,
    )

    df = spark.createDataFrame([Row(doc_id=1, text="a" * 70), Row(doc_id=2, text="")])
    frames = frame_sample(with_binary_payload(df, "doc_id", "text"), frame_bytes=32)
    got = {(r.doc_id, r.frame_no): (bytes(r.frame), r.frame_bytes) for r in frames.collect()}
    # 70 bytes → frames of 32, 32, 6; empty payload → no frames
    assert got == {
        (1, 0): (b"a" * 32, 32),
        (1, 1): (b"a" * 32, 32),
        (1, 2): (b"a" * 6, 6),
    }


def test_frame_sample_every_n(spark):
    from employee_data_management_system_data_engineering_solution_spark.operators.multimodal import (
        frame_sample,
    )

    df = spark.createDataFrame([Row(doc_id=1, text="x" * 100)])
    frames = frame_sample(
        with_binary_payload(df, "doc_id", "text"), frame_bytes=32, every_n=2
    )
    assert sorted(r.frame_no for r in frames.collect()) == [0, 2]


def test_decode_image_stub_is_an_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"\x89PNG")


def test_phash_detects_perturbed_duplicates(spark):
    """A one-character edit stays within Hamming 2 of the original;
    unrelated random-word payloads sit far apart — the banded pair
    search recovers exactly the planted pairs."""
    import random

    from pyspark.sql import functions as F

    from employee_data_management_system_data_engineering_solution_spark.operators.multimodal import (
        phash_neardup_pairs,
        phash_signatures,
    )

    random.seed(7)
    words = ["alpha", "beta", "gamma", "delta", "omega", "sigma", "kappa", "zeta"]
    docs = [(i, " ".join(random.choice(words) for _ in range(30))) for i in range(20)]
    pert = [(i + 1000, t[:7] + "Q" + t[8:]) for i, t in docs]
    df = spark.createDataFrame(docs + pert, "doc_id LONG, text STRING")
    payloads = df.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    sig = phash_signatures(payloads, nbands=8)
    pairs = {(r.id_a, r.id_b): r.hamming for r in phash_neardup_pairs(sig, max_dist=6).collect()}
    # every planted pair recovered, within the measured edit radius
    for i, _ in docs:
        assert (i, i + 1000) in pairs and pairs[(i, i + 1000)] <= 2
    # nothing else admitted: unrelated docs are ≥ 8 bits apart here
    assert set(pairs) == {(i, i + 1000) for i, _ in docs}


def test_phash_signature_python_reference_and_pigeonhole(spark):
    """The Spark signature equals the pure-Python dHash reference, and
    the banding honors the pigeonhole guarantee: any pair the exact
    Hamming distance puts within d < nbands shares ≥ 1 band."""
    from pyspark.sql import functions as F

    from employee_data_management_system_data_engineering_solution_spark.operators.multimodal import (
        _pack_bands,
        phash_signature_py,
        phash_signatures,
    )

    texts = ["the quick brown fox jumps over the lazy dog", "pack my box with five dozen jugs"]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id LONG, text STRING")
    payloads = df.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    got = {r.doc_id: list(r.bands) for r in phash_signatures(payloads, nbands=8).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _pack_bands(phash_signature_py(t.encode()), 8)
    a, b = (phash_signature_py(t.encode()) for t in texts)
    d = sum(x != y for x, y in zip(a, b))
    if d < 8:
        shared = sum(
            _pack_bands(a, 8)[j] == _pack_bands(b, 8)[j] for j in range(8)
        )
        assert shared >= 1
