"""Opt-in Kafka transport integration suite (`pytest -m kafka`).

This is the round-9 verdict's missing-piece #1: the transport builders
(streaming/sources.py kafka_stream / kafka_sink_writer) exercised against a
REAL broker, end-to-end through the stateful engine — the reference's whole
loop (consume -> keyed state -> produce; samsa/kafka/storage.py:124-253) on
real Kafka I/O instead of the file-source stand-in.

Environment contract (why this suite is opt-in):

- A reachable broker, addressed by ``SAMSA_KAFKA_BROKERS`` (e.g.
  ``localhost:9092`` after ``docker compose -f docker/kafka-compose.yml up``).
  Unset => every test here SKIPS, so the jar-less build container and the
  default ``pytest tests/`` run are unaffected.
- Network access on first run: the suite builds its own SparkSession with
  ``spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``,
  which Ivy resolves from Maven Central (cached under ~/.ivy2 afterwards).

The suite builds a PRIVATE SparkSession (the connector jar must be on the
driver classpath at JVM launch, so the shared jar-less session fixture
cannot be reused) and random topic names per run (broker auto-creates).
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pytest

BROKERS = os.environ.get("SAMSA_KAFKA_BROKERS")

pytestmark = [
    pytest.mark.kafka,
    pytest.mark.skipif(
        not BROKERS,
        reason="SAMSA_KAFKA_BROKERS unset — no broker in this environment "
        "(docker compose -f docker/kafka-compose.yml up -d to run these)",
    ),
]


@pytest.fixture(scope="module")
def kspark():
    import pyspark
    from pyspark.sql import SparkSession

    scala = "2.13"
    pkg = f"org.apache.spark:spark-sql-kafka-0-10_{scala}:{pyspark.__version__}"
    s = (
        SparkSession.builder.master("local[4]")
        .appName("samsa-kafka-integration")
        .config("spark.jars.packages", pkg)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


def _topic(prefix: str) -> str:
    return f"{prefix}-{uuid.uuid4().hex[:12]}"


def _produce(kspark, topic: str, rows: list[tuple[str, str]]) -> None:
    """Batch-produce (key, value) string rows via the Kafka sink itself —
    no extra client library needed in the test environment."""
    df = kspark.createDataFrame(rows, "key string, value string")
    (
        df.write.format("kafka")
        .option("kafka.bootstrap.servers", BROKERS)
        .option("topic", topic)
        .save()
    )


def _consume_all(kspark, topic: str):
    """Batch-read a whole topic (earliest..latest), decoded to strings."""
    import pyspark.sql.functions as F

    return (
        kspark.read.format("kafka")
        .option("kafka.bootstrap.servers", BROKERS)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
        .select(
            F.col("key").cast("string").alias("key"),
            F.col("value").cast("string").alias("value"),
        )
    )


def _events(n_keys: int = 5, per_key: int = 4) -> list[dict]:
    out = []
    eid = 0
    for k in range(n_keys):
        for i in range(per_key):
            eid += 1
            out.append(
                {
                    "user_id": k,
                    "ts_us": 1_000_000 * (i + 1),
                    "event_id": eid,
                    "event_type": "purchase" if i % 2 else "click",
                    "value": float(10 * k + i),
                }
            )
    return out


def test_roundtrip_produce_consume(kspark, tmp_path):
    """O1+O2 on the wire: batch-produce via the Kafka sink format,
    stream-consume via kafka_stream (Trigger.AvailableNow), land to
    parquet, compare the full (key, value) multiset."""
    from samsa_spark.streaming.sources import kafka_stream

    topic = _topic("samsa-rt")
    rows = [(f"k{i % 3}", f"payload-{i}") for i in range(20)]
    _produce(kspark, topic, rows)

    stream = kafka_stream(kspark, BROKERS, [topic], starting_offsets="earliest")
    out = str(tmp_path / "out")
    q = (
        stream.select("key", "value")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.key, r.value) for r in kspark.read.parquet(out).collect()
    )
    assert got == sorted(rows)


def test_stateful_loop_consume_fold_produce(kspark, tmp_path):
    """The reference's full loop on real transport: JSON events on an input
    topic -> kafka_stream -> StatefulStream (latest-per-key RocksDB state)
    -> read_state == batch compaction; then the state table produced to an
    output topic via kafka_sink_writer's format and read back intact."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from samsa_spark.streaming.sources import kafka_stream
    from samsa_spark.streaming.state_stream import StatefulStream, read_state

    events = _events()
    in_topic = _topic("samsa-ev")
    _produce(
        kspark,
        in_topic,
        [(str(e["user_id"]), json.dumps(e)) for e in events],
    )

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts_us", LongType()),
            StructField("event_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    parsed = (
        kafka_stream(kspark, BROKERS, [in_topic], starting_offsets="earliest")
        .select(F.from_json("value", schema).alias("e"))
        .select("e.*")
    )
    chk = str(tmp_path / "chk-state")
    ss = StatefulStream(
        kspark, "user_id", ("ts_us", "event_id"), ("event_type", "value")
    )
    ss.run_available_now(parsed, chk)
    state = {
        r.user_id: (r.ts_us, r.event_id, r.event_type, r.value)
        for r in read_state(kspark, chk).collect()
    }
    # independent ground truth: max (ts_us, event_id) per key over the input
    expect = {}
    for e in events:
        cur = expect.get(e["user_id"])
        tag = (e["ts_us"], e["event_id"])
        if cur is None or tag > (cur[0], cur[1]):
            expect[e["user_id"]] = (
                e["ts_us"],
                e["event_id"],
                e["event_type"],
                e["value"],
            )
    assert state == expect

    # produce the compacted state outward (O2/O7) and read it back
    out_topic = _topic("samsa-state")
    state_df = read_state(kspark, chk).select(
        F.col("user_id").cast("string").alias("key"),
        F.to_json(F.struct("ts_us", "event_id", "event_type", "value")).alias(
            "value"
        ),
    )
    (
        state_df.write.format("kafka")
        .option("kafka.bootstrap.servers", BROKERS)
        .option("topic", out_topic)
        .save()
    )
    back = {
        int(r.key): json.loads(r.value) for r in _consume_all(kspark, out_topic).collect()
    }
    assert set(back) == set(expect)
    for k, (ts_us, eid, etype, val) in expect.items():
        assert back[k]["ts_us"] == ts_us and back[k]["event_id"] == eid
        assert back[k]["event_type"] == etype and back[k]["value"] == val


def test_streaming_sink_writer_end_to_end(kspark, tmp_path):
    """kafka_sink_writer as an actual running streaming sink: a file-source
    stream of (key, value) rows written to a topic with AvailableNow, then
    read back complete — the builder's output mode/options are valid against
    a live broker, not just well-formed."""
    from samsa_spark.streaming.sources import file_stream, kafka_sink_writer

    src = str(tmp_path / "src")
    rows = [(f"u{i}", f"v{i}") for i in range(12)]
    df = kspark.createDataFrame(rows, "key string, value string")
    df.repartition(3).write.parquet(src)

    topic = _topic("samsa-sink")
    writer = kafka_sink_writer(
        file_stream(kspark, src, df.schema, max_files_per_trigger=1),
        BROKERS,
        topic,
        str(tmp_path / "chk-sink"),
    )
    q = writer.option("kafka.bootstrap.servers", BROKERS).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)
    # give the broker a beat to expose latest offsets, then read back
    time.sleep(1)
    got = sorted((r.key, r.value) for r in _consume_all(kspark, topic).collect())
    assert got == sorted(rows)
