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
    KAFKA_WIRE_SCHEMA,
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


def _write_wire_file(spark, payloads, dest, base_offset=0):
    """One parquet file of KAFKA_WIRE_SCHEMA rows — a Kafka topic
    segment on disk."""
    import glob
    import os
    import shutil
    import tempfile

    rows = [
        Row(
            key=str(p["user_id"]).encode(),
            value=json.dumps(p).encode(),
            topic="emp-comms",
            partition=p["user_id"] % 2,
            offset=base_offset + i,
            timestamp=dt.datetime(2024, 1, 1, 0, 0, 0),
            timestampType=0,
        )
        for i, p in enumerate(payloads)
    ]
    work = tempfile.mkdtemp(prefix="eds_wire_writer_")
    spark.createDataFrame(rows, schema=KAFKA_WIRE_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(work)
    part = glob.glob(os.path.join(work, "part-*.parquet"))[0]
    shutil.move(part, dest)
    shutil.rmtree(work, ignore_errors=True)


def test_wire_replay_through_full_strike_pipeline(spark, tmp_path):
    """The composed production topology end-to-end: file-backed Kafka
    wire frames -> parse_kafka_events -> reserved-word flag_messages on
    the payload -> applyInPandasWithState strike machine, across TWO
    micro-batches (one wire file per batch, January then February), so
    the monthly-cooldown reset and the INACTIVE latch both fire through
    the REAL parse path — previously parse and pipeline were only
    tested separately."""
    from employee_data_management_system_data_engineering_solution_spark.streaming.kafka import (
        run_strike_stream_from_wire,
    )

    def msg(i, uid, ts, flagged):
        return {
            "event_id": i,
            "ts": ts,
            "user_id": uid,
            "event_type": "message",
            "value": 0.0,
            "props": "contains confidential data" if flagged else "lunch plans",
        }

    # emp 1: 3 flagged in Jan + 2 in Feb => cooldown reset => 2 ACTIVE
    # emp 2: 12 flagged in Jan (INACTIVE latch) + 3 in Feb => 15 INACTIVE
    # emp 3: first seen in Feb, 1 flagged => 1 ACTIVE
    # emp 4: never flagged => 0 ACTIVE (parse must not drop clean rows)
    jan = [msg(i, 1, f"2021-01-05T00:00:{i:02d}", True) for i in range(3)]
    jan += [msg(100 + i, 2, f"2021-01-06T00:00:{i:02d}", True) for i in range(12)]
    jan += [msg(200, 4, "2021-01-07T00:00:00", False)]
    feb = [msg(300 + i, 1, f"2021-02-05T00:00:{i:02d}", True) for i in range(2)]
    feb += [msg(400 + i, 2, f"2021-02-06T00:00:{i:02d}", True) for i in range(3)]
    feb += [msg(500, 3, "2021-02-07T00:00:00", True)]

    wire_dir = tmp_path / "wire"
    wire_dir.mkdir()
    _write_wire_file(spark, jan, str(wire_dir / "a_jan.parquet"))
    _write_wire_file(spark, feb, str(wire_dir / "b_feb.parquet"), base_offset=1000)

    got = {
        r.emp_id: (r.strike_count, r.status)
        for r in run_strike_stream_from_wire(spark, str(wire_dir)).collect()
    }
    assert got == {
        1: (2, "ACTIVE"),
        2: (15, "INACTIVE"),
        3: (1, "ACTIVE"),
        4: (0, "ACTIVE"),
    }
