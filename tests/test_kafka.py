"""Kafka source factory: option plumbing + wire-format parsing.

No broker exists in this environment, so ``.load()`` is untestable by
design (see the module docstring); everything up to and after that
line is covered here — the option dict the reader is built from, and
the value-JSON parse on a static frame shaped like Kafka's wire
schema."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import Row

from employee_data_management_system_data_engineering_solution_spark.streaming.kafka import (
    kafka_reader,
    kafka_source_options,
    parse_kafka_events,
)
from employee_data_management_system_data_engineering_solution_spark.streaming.strikes import (
    flag_messages,
)


def test_option_plumbing_defaults():
    opts = kafka_source_options("b1:9092,b2:9092", "emp-comms")
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "emp-comms",
        "startingOffsets": "earliest",
        "failOnDataLoss": "true",
    }


def test_option_plumbing_scale_knobs_and_extras():
    opts = kafka_source_options(
        "b:9092",
        "t",
        starting_offsets="latest",
        max_offsets_per_trigger=100_000,
        min_partitions=64,
        fail_on_data_loss=False,
        extra={"kafka.security.protocol": "SASL_SSL"},
    )
    assert opts["maxOffsetsPerTrigger"] == "100000"
    assert opts["minPartitions"] == "64"
    assert opts["failOnDataLoss"] == "false"
    assert opts["kafka.security.protocol"] == "SASL_SSL"


def test_option_plumbing_rejects_bad_config():
    with pytest.raises(ValueError):
        kafka_source_options("", "t")
    with pytest.raises(ValueError):
        kafka_source_options("b:9092", "")
    with pytest.raises(ValueError):
        kafka_source_options("b:9092", "t", starting_offsets="sometime")
    with pytest.raises(ValueError):
        kafka_source_options("b:9092", "t", max_offsets_per_trigger=0)


def test_kafka_reader_builds_without_broker(spark):
    # constructing the configured reader must not touch the network
    reader = kafka_reader(spark, "broker:9092", "emp-comms", min_partitions=8)
    assert reader is not None


def _wire_frame(spark, payloads):
    """Static frame with Kafka's wire schema (the parse only reads
    ``value``, but carry the full surface to prove nothing else is
    assumed)."""
    rows = [
        Row(
            key=str(i).encode(),
            value=json.dumps(p).encode(),
            topic="emp-comms",
            partition=i % 2,
            offset=i,
            timestamp=dt.datetime(2024, 1, 1, 0, 0, i),
            timestampType=0,
        )
        for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(rows)


def test_parse_kafka_events_roundtrip(spark):
    payloads = [
        {
            "event_id": 1,
            "ts": "2024-03-01T10:15:30",
            "user_id": 42,
            "event_type": "error",
            "value": 1.5,
            "props": '{"msg": "contains secret data"}',
        },
        {
            "event_id": 2,
            "ts": "2024-03-01T10:16:00",
            "user_id": 43,
            "event_type": "view",
            "value": 0.0,
            "props": "{}",
        },
    ]
    out = parse_kafka_events(_wire_frame(spark, payloads)).orderBy("event_id").collect()
    assert [r.event_id for r in out] == [1, 2]
    assert out[0].ts == dt.datetime(2024, 3, 1, 10, 15, 30)
    assert out[0].user_id == 42 and out[0].event_type == "error"
    assert out[1].value == 0.0
    # schema matches the events-table shape the carriers consume
    assert [f.name for f in parse_kafka_events(_wire_frame(spark, payloads)).schema.fields] == [
        "event_id", "ts", "user_id", "event_type", "value", "props",
    ]


def test_parse_bad_payload_yields_null_row_not_failure(spark):
    frame = _wire_frame(spark, [{"event_id": 9, "ts": "2024-01-01T00:00:00",
                                 "user_id": 1, "event_type": "click",
                                 "value": 1.0, "props": "{}"}])
    broken = frame.union(
        frame.limit(1).selectExpr(
            "key", "cast('not json' as binary) as value", "topic",
            "partition", "offset", "timestamp", "timestampType"
        )
    )
    out = parse_kafka_events(broken).collect()
    assert len(out) == 2
    assert sum(1 for r in out if r.event_id is None) == 1  # dead-letter row


def test_parsed_frame_feeds_strike_pipeline(spark):
    """Source-agnosticism: the reserved-word flagging (production path)
    runs unchanged on a parsed Kafka frame."""
    payloads = [
        {"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 1,
         "event_type": "message", "value": 0.0, "props": "confidential launch plan"},
        {"event_id": 2, "ts": "2024-01-01T00:00:01", "user_id": 2,
         "event_type": "message", "value": 0.0, "props": "lunch plan"},
    ]
    parsed = parse_kafka_events(_wire_frame(spark, payloads))
    got = {r.event_id: r.flagged for r in flag_messages(parsed, "props").collect()}
    assert got == {1: True, 2: False}


def test_extra_options_cannot_override_validated_core():
    import pytest

    from employee_data_management_system_data_engineering_solution_spark.streaming.kafka import (
        kafka_source_options,
    )

    with pytest.raises(ValueError, match="override validated core"):
        kafka_source_options(
            "broker:9092", "events", extra={"subscribe": "other_topic"}
        )
    # non-colliding extras still pass through
    opts = kafka_source_options(
        "broker:9092", "events", extra={"kafka.security.protocol": "SSL"}
    )
    assert opts["kafka.security.protocol"] == "SSL"
    assert opts["subscribe"] == "events"


def test_extras_cannot_smuggle_unset_core_options():
    """The clash guard checks the FULL core option-name set: leaving
    max_offsets_per_trigger/min_partitions unset must not let extras
    inject those keys and bypass the positivity validation."""
    import pytest

    from employee_data_management_system_data_engineering_solution_spark.streaming.kafka import (
        kafka_source_options,
    )

    with pytest.raises(ValueError, match="override validated core"):
        kafka_source_options("broker:9092", "events", extra={"maxOffsetsPerTrigger": "0"})
    with pytest.raises(ValueError, match="override validated core"):
        kafka_source_options("broker:9092", "events", extra={"minPartitions": "-5"})
