"""Kafka builder contract tests — no broker, no connector jar needed.

The builders must (a) wire the exact options the connector expects,
(b) enforce the reference's string contract — key and value decoded as
UTF-8 strings (reference samsa/kafka/storage.py:179-180) — and (c) fail
with an actionable error when the connector jar is absent (this container
has none, which is exactly the environment the error is for)."""

from __future__ import annotations

import pytest

from samsa_spark.streaming.sources import (
    kafka_sink_options,
    kafka_sink_writer,
    kafka_source_options,
    kafka_stream,
)


def test_source_option_wiring():
    opts = kafka_source_options("b1:9092,b2:9092", ["events", "clicks"], "earliest")
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "events,clicks",
        "startingOffsets": "earliest",
    }
    assert kafka_source_options("b:9092", ["t"])["startingOffsets"] == "latest"


def test_sink_option_wiring():
    assert kafka_sink_options("b:9092", "out-topic", "/chk/dir") == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "out-topic",
        "checkpointLocation": "/chk/dir",
    }


def test_sink_enforces_string_contract(spark):
    """Whatever the input column types, the sink frame is exactly
    (key string, value string) — the CAST the reference performs when it
    decodes message bytes."""
    import pyspark.sql.functions as F

    rate = spark.readStream.format("rate").load()  # built-in streaming source
    df = rate.select(F.col("value").alias("key"), (F.col("value") * 2.5).alias("value"))
    w = kafka_sink_writer(df, "b:9092", "t", "/tmp/chk")
    schema = {f.name: f.dataType.simpleString() for f in w._df.schema.fields}
    assert schema == {"key": "string", "value": "string"}
    # builder returns an UNSTARTED writer: constructing needs no broker
    from pyspark.sql.streaming import DataStreamWriter

    assert isinstance(w, DataStreamWriter)


def test_missing_connector_raises_actionable_error(spark):
    """Without spark-sql-kafka on the classpath the source builder must say
    what to install and what to use instead — not leak a raw
    ClassNotFound/AnalysisException."""
    with pytest.raises(RuntimeError, match="spark-sql-kafka") as ei:
        kafka_stream(spark, "localhost:9092", ["events"])
    assert "file_stream" in str(ei.value)
