"""Source/sink builders: Kafka for production, file streams for brokerless
tests (the CI story — reference samsa requires a live broker for everything;
SURVEY.md §7 phase 2 calls for file-source stand-ins).

The Kafka builders produce the reference's string contract — ``key`` and
``value`` as UTF-8 strings (reference decodes message bytes the same way,
storage.py:179-180) — from Kafka's binary columns. They are configuration
builders: constructing them needs no broker, starting them does (and needs
the spark-sql-kafka package on the classpath).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def kafka_source_options(
    brokers: str, topics: list[str], starting_offsets: str = "latest"
) -> dict[str, str]:
    """Option wiring for the Kafka source, as a pure dict so tests can
    assert the contract without a broker or the connector jar."""
    return {
        "kafka.bootstrap.servers": brokers,
        "subscribe": ",".join(topics),
        "startingOffsets": starting_offsets,
    }


def kafka_sink_options(brokers: str, topic: str, checkpoint_dir: str) -> dict[str, str]:
    """Option wiring for the Kafka sink (see :func:`kafka_source_options`)."""
    return {
        "kafka.bootstrap.servers": brokers,
        "topic": topic,
        "checkpointLocation": checkpoint_dir,
    }


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topics: list[str],
    starting_offsets: str = "latest",
) -> DataFrame:
    """Streaming read of one or more topics, decoded to the samsa contract:
    (key string, value string, topic, partition, offset, ts). Equivalent of
    ``StatefulConsumer.__init__(topics=...)`` + the poll loop (reference
    storage.py:17-26, 228-253) — EOF/timeout handling is the engine's job.
    """
    try:
        raw = (
            spark.readStream.format("kafka")
            .options(**kafka_source_options(brokers, topics, starting_offsets))
            .load()
        )
    except Exception as e:  # connector jar absent in broker-less environments
        raise RuntimeError(
            "Kafka source requires the spark-sql-kafka package on the classpath "
            "(--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>). "
            "For broker-less tests use file_stream()."
        ) from e
    return raw.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        "topic",
        "partition",
        "offset",
        F.col("timestamp").alias("ts"),
    )


def kafka_sink_writer(df: DataFrame, brokers: str, topic: str, checkpoint_dir: str):
    """Streaming write of (key, value) rows to a topic — the O2/O7 produce
    path (reference producers.py:48-55, storage.py:129-149), minus the
    new-Producer-flush-per-record pathology: the sink batches per task per
    micro-batch. Returns an unstarted DataStreamWriter.
    """
    out = df.select(
        F.col("key").cast("string").alias("key"), F.col("value").cast("string").alias("value")
    )
    return (
        out.writeStream.format("kafka")
        .options(**kafka_sink_options(brokers, topic, checkpoint_dir))
        .outputMode("update")
    )


def file_stream(spark: SparkSession, path: str, schema: StructType, max_files_per_trigger: int | None = None) -> DataFrame:
    """Brokerless stand-in source: parquet directory as a stream. With
    ``max_files_per_trigger`` + Trigger.AvailableNow a multi-file directory
    replays as multiple micro-batches — the shape of a topic backlog.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """Batch JSONL ingestion with corrupt-record QUARANTINE — the ingestion
    contract a crawl pipeline needs: a malformed line must never abort the
    job (FAILFAST) or silently vanish (DROPMALFORMED); it lands in a
    quarantine frame carrying the raw line for triage while clean rows
    flow on. Returns ``(good, quarantine)``.

    Mechanics: PERMISSIVE mode parses what it can and fills
    ``_corrupt_record`` with the raw text of unparseable lines; the split
    is two filters over one cached parse (Spark requires the parsed frame
    to be cached before filtering on the corrupt column — the parser
    short-circuits otherwise and the filter sees only nulls). Scale shape:
    one narrow scan, no shuffle; the quarantine side is tiny by
    assumption, and both frames prune the corrupt column where unused.

    One Spark JSON semantic to know: a line whose top level is an ARRAY is
    exploded into one row per element (so ``[]`` contributes zero rows to
    either frame) — line-count conservation holds only for object/scalar
    lines. Feed object-per-line JSONL; array lines are a format smell.
    """
    from pyspark.sql.types import StringType, StructField

    with_corrupt = StructType(
        [*schema.fields, StructField("_corrupt_record", StringType())]
    )
    parsed = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        # Spark refuses (or short-circuits) direct filters on the corrupt
        # column over raw JSON input; an RDD boundary materializes the
        # parse so both filters see real values.
        .localCheckpoint(eager=False)
    )
    good = parsed.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    quarantine = parsed.where(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return good, quarantine


def read_csv(
    spark: SparkSession, path: str, schema: StructType, header: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Batch CSV ingestion under :func:`read_jsonl`'s exact quarantine
    contract — ``(good, quarantine)``, malformed lines never abort the job
    and never vanish. Same mechanics: PERMISSIVE parse into a schema
    extended with ``_corrupt_record``, one localCheckpoint so the split
    filters see materialized values (the CSV parser short-circuits corrupt
    -column-only filters the same way the JSON one does), two narrow
    filters, no shuffle. CSV nuance: corrupt means any row that does not
    parse EXACTLY against the schema — wrong types, too many columns, or
    too few (Spark's PERMISSIVE CSV flags short rows as malformed rather
    than padding; the conservative reading for ingestion hygiene).
    """
    from pyspark.sql.types import StringType, StructField

    with_corrupt = StructType(
        [*schema.fields, StructField("_corrupt_record", StringType())]
    )
    parsed = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("header", "true" if header else "false")
        .csv(path)
        .localCheckpoint(eager=False)
    )
    good = parsed.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    quarantine = parsed.where(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return good, quarantine
