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


# Defaults shared between the registered query paths and the oracle SQL
# (interpolated below) so changing one side cannot silently break the other.
RESIZE_W = 64
RESIZE_H = 64
SAMPLE_EVERY_K = 3


def resize_media(
    media: DataFrame, target_w: int = RESIZE_W, target_h: int = RESIZE_H, decode_stub: bool = True
) -> DataFrame:
    """Resize pipeline over binary payloads (mapInPandas, narrow, Arrow-
    batched). The stub "resize" truncates the payload to the target byte
    budget (w*h*3, an RGB frame) — a real deployment replaces the body of
    ``_resize_one`` with PIL ``Image.open(...).resize(...)`` and keeps
    every other line: schema, batch iteration, and the no-shuffle plan are
    the production plumbing. Output keeps both sizes so downstream can
    audit the byte reduction.
    """
    budget = target_w * target_h * 3

    def _resize_one(content: bytes) -> bytes:
        if not decode_stub:
            raise NotImplementedError(
                "real media resize requires PIL/ffmpeg, not present in this container"
            )
        return bytes(content[:budget])

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = [_resize_one(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": pd.Series([target_w] * len(pdf), dtype="int32"),
                    "height": pd.Series([target_h] * len(pdf), dtype="int32"),
                    "n_bytes_in": pdf["content"].map(len).astype("int64"),
                    "n_bytes_out": pd.Series([len(r) for r in resized], dtype="int64"),
                    "content": resized,
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media_type", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("n_bytes_in", LongType()),
            StructField("n_bytes_out", LongType()),
            StructField("content", BinaryType()),
        ]
    )
    return media.mapInPandas(_batches, schema)


FRAME_BYTES = 256


def sample_frames(
    media: DataFrame, every_k: int = SAMPLE_EVERY_K, decode_stub: bool = True
) -> DataFrame:
    """Frame sampling over binary payloads: one input row fans out to one
    row PER SAMPLED FRAME (the 1->N mapInPandas shape a video pipeline
    needs). The stub treats the payload as fixed-256-byte frames and keeps
    every k-th; a real deployment demuxes with ffmpeg/pyav in
    ``_frames_of`` and keeps the fan-out plumbing unchanged.

    Deterministic by construction: frame count and sampled byte sizes are
    pure arithmetic on payload length, which is what makes the aggregate
    query (mm4) exactly oracle-checkable while the executor genuinely
    slices bytes.
    """

    def _frames_of(content: bytes) -> list[bytes]:
        if not decode_stub:
            raise NotImplementedError(
                "real frame extraction requires ffmpeg/pyav, not present in this container"
            )
        return [content[o : o + FRAME_BYTES] for o in range(0, len(content), FRAME_BYTES)]

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, mts, idxs, totals, frames = [], [], [], [], []
            for doc_id, mt, content in zip(pdf["doc_id"], pdf["media_type"], pdf["content"]):
                fs = _frames_of(content)
                for i in range(0, len(fs), every_k):
                    ids.append(doc_id)
                    mts.append(mt)
                    idxs.append(i)
                    totals.append(len(fs))
                    frames.append(fs[i])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "media_type": pd.Series(mts, dtype="object"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "n_frames_total": pd.Series(totals, dtype="int32"),
                    "frame": pd.Series(frames, dtype="object"),
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media_type", StringType()),
            StructField("frame_idx", IntegerType()),
            StructField("n_frames_total", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )
    return media.mapInPandas(_batches, schema)


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


def resized_stats(documents: DataFrame) -> DataFrame:
    """mm3 — resize pipeline stats: encode -> mapInPandas resize (stub) ->
    per-type byte accounting. Oracle-exact: the stub's output size is
    ``least(n_bytes, w*h*3)``, so DuckDB reproduces the aggregate from
    ``strlen(text)`` while Spark genuinely slices payload bytes on the
    executors."""
    r = resize_media(as_media(documents))
    return r.groupBy("media_type").agg(
        F.count("*").alias("n_media"),
        F.sum("n_bytes_in").alias("total_bytes_in"),
        F.sum("n_bytes_out").alias("total_bytes_out"),
        F.max("n_bytes_out").alias("max_bytes_out"),
        F.min("width").cast("int").alias("out_width"),
        F.min("height").cast("int").alias("out_height"),
    )


def frame_sample_stats(documents: DataFrame, every_k: int = SAMPLE_EVERY_K) -> DataFrame:
    """mm4 — frame-sampling stats: encode -> 1->N frame fan-out (stub
    demux) -> per-type frame accounting. Oracle-exact via frame arithmetic
    on ``strlen(text)`` (frames of 256 bytes, every 3rd kept, short last
    frame included)."""
    fr = sample_frames(as_media(documents), every_k=every_k)
    return fr.groupBy("media_type").agg(
        F.count("*").alias("n_frames_sampled"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum(F.octet_length("frame").cast("bigint")).alias("sampled_bytes"),
        F.max("n_frames_total").cast("int").alias("max_frames"),
    )


def interleaved_pack(
    documents: DataFrame,
    budget_tokens: int = 512,
    budget_media_bytes: int = 4096,
    chunk_docs: int | None = None,
) -> DataFrame:
    """mm5 — INTERLEAVED multimodal sequence packing: assign docs (text
    tokens + an opaque media payload each) to training-sequence bins under
    a JOINT budget — a bin closes when EITHER the token slots or the media
    bytes run out, which is how interleaved text+image batches are packed
    (both context slots and vision-encoder capacity are finite). Same
    greedy-by-doc-id, bin = cum-before div budget convention as pk1, with
    the div taken as the max over both resources; media size is the
    payload byte length from the :func:`as_media` model (column-pruned —
    only ``octet_length`` reaches the scan, never the bytes).

    One running-sum window per source + one follow-up aggregate, the pk1
    shape exactly; ``chunk_docs`` opts into pk2's doc-chunk hierarchy —
    bins assigned within fixed doc-id chunks per source, bin ids
    ``(chunk << 20) | bin-in-chunk``, parallelism = sources x chunks, the
    same bounded-underfill-at-chunk-edges trade pk2 documents. That is
    the 100 TB form; the global default stays the exact single-window
    twin (pk1 : pk2 :: default : chunked).
    """
    from pyspark.sql import Window

    toks = F.size(F.split("text", " "))
    parts = ["source"] if chunk_docs is None else ["source", "chunk"]
    w = Window.partitionBy(*parts).orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cols = [
        "source",
        "doc_id",
        toks.alias("n_tokens"),
        F.octet_length("text").alias("media_bytes"),
    ]
    if chunk_docs is not None:
        cols.append(F.expr(f"doc_id div {chunk_docs}").alias("chunk"))
    cum = documents.select(*cols).withColumn(
        "ct", F.sum("n_tokens").over(w)
    ).withColumn("cb", F.sum("media_bytes").over(w))
    local_bin = F.greatest(
        F.expr(f"(ct - n_tokens) div {budget_tokens}"),
        F.expr(f"(cb - media_bytes) div {budget_media_bytes}"),
    )
    binned = cum.withColumn(
        "bin",
        local_bin
        if chunk_docs is None
        else F.shiftleft(F.col("chunk"), 20) + local_bin,
    )
    return binned.groupBy("source", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.sum("media_bytes").alias("bin_media_bytes"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def build_queries():
    def q(fn):
        def run(spark: SparkSession, sf: str) -> DataFrame:
            return fn(tables.load(spark, sf, "documents"))

        return run

    return {
        "mm1_media_metadata": (q(media_metadata_stats), _MM1_SQL),
        "mm2_decoded_features": (q(decoded_features), None),
        "mm3_resized_stats": (q(resized_stats), _MM3_SQL),
        "mm4_frame_sample_stats": (q(frame_sample_stats), _MM4_SQL),
        "mm5_interleaved_pack": (q(interleaved_pack), _MM5_SQL),
    }


_MM5_SQL = """
WITH m AS (
  SELECT source, doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         strlen(text) AS media_bytes
  FROM documents
), c AS (
  SELECT *,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS ct,
         sum(media_bytes) OVER (PARTITION BY source ORDER BY doc_id) AS cb
  FROM m
)
SELECT source,
       CAST(greatest((ct - n_tokens) // 512, (cb - media_bytes) // 4096)
            AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
       CAST(sum(media_bytes) AS BIGINT) AS bin_media_bytes,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM c GROUP BY source, bin
"""


# Constants interpolated (not hardcoded) so the registered query defaults and
# the oracle arithmetic cannot drift apart (round-3 advice).
_MM3_SQL = f"""
WITH m AS (
  SELECT (['image/png', 'audio/wav', 'video/mp4'])[CAST(doc_id % 3 AS INTEGER) + 1] AS media_type,
         strlen(text) AS n_in,
         least(strlen(text), {RESIZE_W} * {RESIZE_H} * 3) AS n_out
  FROM documents
)
SELECT media_type, count(*) AS n_media,
       CAST(sum(n_in) AS BIGINT) AS total_bytes_in,
       CAST(sum(n_out) AS BIGINT) AS total_bytes_out,
       max(n_out) AS max_bytes_out,
       CAST({RESIZE_W} AS INTEGER) AS out_width, CAST({RESIZE_H} AS INTEGER) AS out_height
FROM m GROUP BY media_type
"""

_MM4_SQL = f"""
WITH m AS (
  SELECT doc_id,
         (['image/png', 'audio/wav', 'video/mp4'])[CAST(doc_id % 3 AS INTEGER) + 1] AS media_type,
         strlen(text) AS n,
         CAST(ceil(strlen(text) / {FRAME_BYTES}.0) AS BIGINT) AS frames
  FROM documents WHERE strlen(text) > 0
), s AS (
  SELECT doc_id, media_type, n, frames,
         (frames - 1) // {SAMPLE_EVERY_K} + 1 AS n_sampled,
         CASE WHEN (frames - 1) % {SAMPLE_EVERY_K} = 0
              THEN {FRAME_BYTES} * frames - n ELSE 0 END AS short_adj
  FROM m
)
SELECT media_type,
       CAST(sum(n_sampled) AS BIGINT) AS n_frames_sampled,
       count(DISTINCT doc_id) AS n_docs,
       CAST(sum({FRAME_BYTES} * n_sampled - short_adj) AS BIGINT) AS sampled_bytes,
       CAST(max(frames) AS INTEGER) AS max_frames
FROM s GROUP BY media_type
"""

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
