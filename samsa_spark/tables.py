"""Parquet table loaders for the driver-generated testdata.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file each under
``/root/testdata/sf{0.001,0.01,0.1}``.

The ``events`` table models samsa's message log (reference
samsa/kafka/storage.py:228-253 consumes keyed messages; FIXTURES.md §1 maps
key -> ``user_id``, arrival order -> ``(ts, event_id)``). Its ``ts`` column is
parquet TIMESTAMP(NANOS), which Spark cannot read natively — we read it as a
nanosecond long (``spark.sql.legacy.parquet.nanosAsLong``) and derive:

- ``ts_us``: microsecond epoch BIGINT — the canonical ordering column. The
  DuckDB oracle reads the same file truncated to microseconds, so all
  ordering/comparison is done at microsecond precision with ``event_id`` as
  the deterministic tie-break on both sides.
- ``ts``: TIMESTAMP_NTZ at microsecond precision (timezone-free arithmetic,
  so results don't depend on the session timezone).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Columns stored as parquet TIMESTAMP(NANOS) that arrive as `long` under
# nanosAsLong and need the ns -> us conversion.
_NS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing nanosecond timestamps."""
    # The driver hands us its own SparkSession; this conf is runtime-settable
    # and required before the first read of a NANOS parquet file.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _NS_TS_COLS.get(name, ()):
        if isinstance(df.schema[c].dataType, LongType):
            df = (
                df.withColumnRenamed(c, f"_{c}_ns")
                # integer div: going through double would lose precision at
                # 1.7e18 ns (double is exact only to 2^53).
                .withColumn(f"{c}_us", F.expr(f"_{c}_ns div 1000"))
                .withColumn(
                    c,
                    F.expr(f"timestampadd(MICROSECOND, _{c}_ns div 1000, {_EPOCH_NTZ})"),
                )
                .drop(f"_{c}_ns")
            )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}
