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
