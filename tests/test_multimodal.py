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
    # fake feature: [len, mean byte, first byte, last byte]
    assert out[1].feature == [3.0, pytest.approx((97 + 98 + 99) / 3, abs=1e-3), 97.0, 99.0]
    assert out[2].feature == [0.0, 0.0, 0.0, 0.0]


def test_decode_image_stub_is_an_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"\x89PNG")
