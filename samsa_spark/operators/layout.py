"""Z-order (Morton-curve) data layout — multi-dimensional clustering for
scan pruning (zo1).

The reference engine has no layout control at all (a RocksDB K/V store,
reference samsa/db/rocksdb.py:1-60 — one key order, no secondary
dimension); every lakehouse engine grew one because single-column sort
helps exactly one predicate. Interleaving the bits of two (quantized)
dimensions makes rows that are close in EITHER dimension land close on
disk, so per-file parquet min/max stats become tight boxes in BOTH
columns and a two-dimensional range query prunes most files — the
OPTIMIZE ZORDER BY lever of Delta/Iceberg, re-expressed as plain
DataFrame algebra.

Scale shape: computing z is a pure per-row integer projection (six
shift/mask rounds per dimension — whole-stage codegen, no UDF); the
layout write is ONE repartitionByRange(z) + sortWithinPartitions(z) —
a single range shuffle, the same cost class as any clustered write.
Nothing is driver-sized; the curve arithmetic is exact BIGINT (ANSI-safe:
inputs are masked to ``bits`` before spreading, so no shift can
overflow), and the identical expressions run in DuckDB, which is what
puts the curve itself inside the exact-oracle gate (zo1). The pruning
claim is locked by a pytest that reads per-file parquet min/max stats:
a small two-dimensional box query must stats-overlap a far smaller file
fraction under the z layout than under a one-column sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from samsa_spark import tables

# Bit-spread masks for interleaving 16-bit dims into a 32-bit-per-dim
# Morton code (the classic magic-number spread; each step doubles the gap
# between occupied bit positions). All masks are positive in signed 64-bit.
_SPREAD = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)

ZORDER_BITS = 16


def _spread_bits(col: Column, bits: int) -> Column:
    """Spread the low ``bits`` bits of a BIGINT so bit i lands at 2*i —
    pure shift/mask arithmetic, exact and overflow-free for bits <= 16."""
    x = col.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zvalue(col_a: Column, col_b: Column, bits: int = ZORDER_BITS) -> Column:
    """Morton z-value of two dimensions quantized to [0, 2^bits): a's bit i
    at position 2i, b's at 2i+1. bits <= 16 (two 16-bit dims fill 32 bits —
    the masked spread guarantees no signed-64 overflow)."""
    if not 1 <= bits <= 16:
        raise ValueError(f"zvalue supports 1..16 bits per dimension, got {bits}")
    return _spread_bits(col_a, bits).bitwiseOR(
        F.shiftleft(_spread_bits(col_b, bits), 1)
    ).alias("z")


def _zvalue_sql(a: str, b: str, bits: int = ZORDER_BITS) -> str:
    """The identical curve arithmetic as DuckDB SQL (shared by the zo1
    oracle) — one spread expression per dimension, textually unrolled."""

    def spread(expr: str) -> str:
        x = f"({expr} & {(1 << bits) - 1})"
        for shift, mask in _SPREAD:
            x = f"(({x} | ({x} << {shift})) & {mask})"
        return x

    return f"({spread(a)} | ({spread(b)} << 1))"


def _quantized(col: str, lo, hi, bits: int) -> Column:
    """Min-max scale a numeric column into [0, 2^bits): raw key values
    rarely fill the bit budget (a 100-supplier dim masked raw would leave
    the top 9 bits constant and the curve would degenerate to a
    partkey-only sort), so the LAYOUT quantizes each dimension over its
    observed range first. The zo1 ORACLE query deliberately uses raw
    masked values instead: exact integers, no scaling float in the
    cross-engine path."""
    if hi == lo:
        return F.lit(0).cast("long")
    scale = ((1 << bits) - 1) / float(hi - lo)
    return F.floor((F.col(col) - F.lit(lo)).cast("double") * F.lit(scale)).cast("long")


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 32,
    bits: int = ZORDER_BITS,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered along the
    z-curve of (col_a, col_b), each dimension min-max-quantized into the
    full bit budget first: ONE stats pass (both dims' min/max in a single
    aggregate — the same driver scalars any range-clustered write
    computes) + one range shuffle on z + an in-partition sort, so every
    file owns a contiguous z-range — a tight min/max box in BOTH columns.
    The z column itself is dropped (it is derivable; layouts should not
    leak helper columns)."""
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    (
        df.withColumn(
            "_z",
            zvalue(
                _quantized(col_a, lo_a, hi_a, bits),
                _quantized(col_b, lo_b, hi_b, bits),
                bits,
            ),
        )
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


ZO1_GATE_BITS = 5  # 5 bits/dim -> z in [0, 1024): bounded output, and the
# LOW key bits vary at every testdata scale (bucketing raw z by its HIGH
# bits instead degenerates to one bucket while keys are small — probed)


def zorder_curve_stats(lineitem: DataFrame, bits: int = ZO1_GATE_BITS) -> DataFrame:
    """zo1 — the curve arithmetic under the exact-oracle gate: z-values of
    (l_partkey, l_suppkey) masked to ``bits`` per dimension, one output
    row per occupied curve point: ``(z_bucket, n_rows, min_part, max_part,
    min_supp, max_supp)``. This runs the full spread/interleave chain
    (the same :func:`zvalue` the layout writer uses) over exact BIGINTs,
    replicated verbatim in the DuckDB twin — the gate locks the
    arithmetic; the LAYOUT locality claim (tight per-file boxes under
    min-max quantization) is the pytest file-stats test's job."""
    z = zvalue(F.col("l_partkey"), F.col("l_suppkey"), bits)
    return (
        lineitem.select(z.alias("z_bucket"), "l_partkey", "l_suppkey")
        .groupBy("z_bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_partkey").alias("min_part"),
            F.max("l_partkey").alias("max_part"),
            F.min("l_suppkey").alias("min_supp"),
            F.max("l_suppkey").alias("max_supp"),
        )
        .orderBy("z_bucket")
    )


_ZO1_SQL = f"""
WITH z AS (
  SELECT {_zvalue_sql("l_partkey", "l_suppkey", ZO1_GATE_BITS)} AS z_bucket,
         l_partkey, l_suppkey
  FROM lineitem
)
SELECT z_bucket, count(*) AS n_rows,
       min(l_partkey) AS min_part, max(l_partkey) AS max_part,
       min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
FROM z GROUP BY z_bucket ORDER BY z_bucket
"""


def build_queries():
    def _zo1(spark: SparkSession, sf: str) -> DataFrame:
        return zorder_curve_stats(tables.load(spark, sf, "lineitem"))

    return {
        "zo1_zorder_curve": (_zo1, _ZO1_SQL),
    }
