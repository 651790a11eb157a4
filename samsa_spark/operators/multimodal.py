"""Multimodal column plumbing (X-extension, SURVEY.md §2.4): treat media as
opaque ``binary`` columns with typed metadata, processed in Arrow-batched
``mapInPandas`` pipelines.

The container has no image/audio codecs, so the *decode* step is a
deterministic fake (documented stub): real Spark-side plumbing — schema,
binary payloads, batch iteration, output schema — with a placeholder where
PIL/ffmpeg would plug in. ``decode_stub=False`` raises NotImplementedError
exactly where the codec belongs.

Scale notes: binary payloads ride the scan (parquet BYTE_ARRAY); the
mapInPandas stage is narrow (no shuffle) and Arrow-batched; metadata-only
queries never touch the bytes column (column pruning drops it at the scan).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from samsa_spark import tables

# Output schema of the fake decoder: what a real image decode would emit
# (dimensions, channel stats) with deterministic stand-in values.
DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("content", BinaryType()),
    ]
)


def as_media(documents: DataFrame) -> DataFrame:
    """Materialize an opaque-binary media table from documents: UTF-8 bytes
    of the text stand in for an encoded payload; media_type cycles by id.
    (In production this column comes straight from the source parquet.)
    """
    return documents.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )


def decode_media(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Arrow-batched decode pipeline over binary payloads via mapInPandas.

    The stub computes deterministic pseudo-features (adler-style checksum,
    fake dimensions derived from it); a real deployment replaces the body of
    ``_decode_one`` with PIL/ffmpeg and keeps every other line.
    """

    def _decode_one(content: bytes, media_type: str) -> tuple[int, int, int]:
        if not decode_stub:
            raise NotImplementedError(
                "real media decode requires PIL/ffmpeg, not present in this container"
            )
        a, b = 1, 0
        for byte in content:
            a = (a + byte) % 65521
            b = (b + a) % 65521
        checksum = (b << 16) | a
        return checksum, 64 + checksum % 1024, 64 + (checksum >> 10) % 1024

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_decode_one(c, m) for c, m in zip(pdf["content"], pdf["media_type"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "checksum": pd.Series([f[0] for f in feats], dtype="int64"),
                    "width": pd.Series([f[1] for f in feats], dtype="int32"),
                    "height": pd.Series([f[2] for f in feats], dtype="int32"),
                }
            )

    return media.mapInPandas(_batches, DECODED_SCHEMA)


def media_metadata_stats(documents: DataFrame) -> DataFrame:
    """mm1 — metadata-only query: byte/char accounting per synthetic media
    type WITHOUT touching payload bytes (column pruning keeps the scan
    narrow). Oracle-checkable: byte length of UTF-8 text is engine-portable.
    """
    mt = F.element_at(
        F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return (
        documents.select(
            mt.alias("media_type"),
            F.octet_length("text").alias("n_bytes"),
            F.length("text").alias("n_chars"),
        )
        .groupBy("media_type")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_bytes").cast("bigint")).alias("total_bytes"),
            F.sum(F.col("n_chars").cast("bigint")).alias("total_chars"),
            F.min("n_bytes").alias("min_bytes"),
            F.max("n_bytes").alias("max_bytes"),
        )
    )


def decoded_features(documents: DataFrame) -> DataFrame:
    """mm2 — full binary pipeline: encode -> mapInPandas decode (stub) ->
    per-type feature stats. Driver check is rows-only (checksum loop is not
    SQL-expressible); tests/test_multimodal.py re-computes the checksum in
    plain Python as ground truth.
    """
    dec = decode_media(as_media(documents))
    return dec.groupBy("media_type").agg(
        F.count("*").alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("width").alias("min_width"),
        F.max("height").alias("max_height"),
        F.sum("checksum").alias("checksum_total"),
    )


# --- registry wiring -------------------------------------------------------


def build_queries():
    def q(fn):
        def run(spark: SparkSession, sf: str) -> DataFrame:
            return fn(tables.load(spark, sf, "documents"))

        return run

    return {
        "mm1_media_metadata": (q(media_metadata_stats), _MM1_SQL),
        "mm2_decoded_features": (q(decoded_features), None),
    }


_MM1_SQL = """
WITH m AS (
  SELECT (['image/png', 'audio/wav', 'video/mp4'])[CAST(doc_id % 3 AS INTEGER) + 1] AS media_type,
         strlen(text) AS n_bytes,
         length(text) AS n_chars
  FROM documents
)
SELECT media_type, count(*) AS n_docs,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min(n_bytes) AS min_bytes, max(n_bytes) AS max_bytes
FROM m GROUP BY media_type
"""
