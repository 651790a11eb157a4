"""Z-order layout (layout.py): curve arithmetic against a pure-Python
Morton model and the DuckDB oracle, plus the claim that actually matters —
a z-clustered parquet layout gives tight per-file min/max boxes in BOTH
dimensions, so a small 2-D box query stats-prunes most files where a
one-column sort cannot."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL
from tests.oracle import check_query


def _morton(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zo1_oracle_match(spark):
    ok, msg = check_query(spark, "zo1_zorder_curve", SF_SMALL)
    assert ok, msg


def test_zvalue_matches_python_morton(spark):
    """The six shift/mask rounds must equal the textbook bit loop on edge
    and interior values (0, max, asymmetric, both-dims-set)."""
    from samsa_spark.operators.layout import zvalue

    cases = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (65535, 0), (7, 65535)]
    df = spark.createDataFrame(cases, "a long, b long").select(
        "a", "b", zvalue(F.col("a"), F.col("b")).alias("z")
    )
    for r in df.collect():
        assert r.z == _morton(r.a, r.b), (r.a, r.b, r.z)


def test_zvalue_property_random_pairs(spark):
    """Randomized parity with the textbook bit loop + the tile property
    that makes the layout work: two points sharing their top j bits in
    BOTH dims share the top 2j bits of z (same curve tile)."""
    import random

    rnd = random.Random(13)
    from samsa_spark.operators.layout import zvalue

    cases = [(rnd.randrange(1 << 16), rnd.randrange(1 << 16)) for _ in range(200)]
    df = spark.createDataFrame(cases, "a long, b long").select(
        "a", "b", zvalue(F.col("a"), F.col("b")).alias("z")
    )
    for r in df.collect():
        assert r.z == _morton(r.a, r.b)
    for a, b in cases[:50]:
        for j in (2, 5, 9):
            a2 = (a & ~((1 << (16 - j)) - 1)) | rnd.randrange(1 << (16 - j))
            b2 = (b & ~((1 << (16 - j)) - 1)) | rnd.randrange(1 << (16 - j))
            assert _morton(a, b) >> (32 - 2 * j) == _morton(a2, b2) >> (32 - 2 * j)


def test_zvalue_masks_high_bits(spark):
    """Inputs past 2^bits must be masked, not overflow (ANSI) or collide
    structurally: zvalue(x + 2^16, y) == zvalue(x, y)."""
    from samsa_spark.operators.layout import zvalue

    df = spark.createDataFrame([(70000, 3)], "a long, b long").select(
        zvalue(F.col("a"), F.col("b")).alias("z")
    )
    assert df.collect()[0].z == _morton(70000 & 0xFFFF, 3)


def _stats_overlap_fraction(path: str, box_a, box_b, col_a: str, col_b: str) -> float:
    """Fraction of part files whose per-file (min, max) box intersects the
    query box — exactly what row-group/file stats pruning can skip."""
    import os

    import pyarrow.parquet as pq

    parts = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]
    assert parts
    hit = 0
    for p in parts:
        md = pq.ParquetFile(p).metadata
        mins = {col_a: None, col_b: None}
        maxs = {col_a: None, col_b: None}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in mins and col.statistics is not None:
                    lo, hi = col.statistics.min, col.statistics.max
                    mins[name] = lo if mins[name] is None else min(mins[name], lo)
                    maxs[name] = hi if maxs[name] is None else max(maxs[name], hi)
        if (
            mins[col_a] <= box_a[1]
            and maxs[col_a] >= box_a[0]
            and mins[col_b] <= box_b[1]
            and maxs[col_b] >= box_b[0]
        ):
            hit += 1
    return hit / len(parts)


def test_zordered_layout_prunes_2d_box_queries(spark, tmp_path):
    """Write the same lineitem projection (a) sorted by l_partkey alone and
    (b) z-ordered on (l_partkey, l_suppkey), 16 files each. The one-column
    sort prunes partkey boxes perfectly but is USELESS for the second
    dimension (every file spans the whole suppkey range); the z layout
    must prune BOTH: a narrow-suppkey box overlaps a strictly smaller file
    fraction than linear's all-files, and a narrow-partkey box still
    prunes most files (the curve's trade: neither dimension is perfect,
    both are good)."""
    from samsa_spark import tables
    from samsa_spark.operators.layout import write_zordered

    li = tables.load(spark, "/root/testdata/sf0.01", "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    pk_lo, pk_hi = li.agg(F.min("l_partkey"), F.max("l_partkey")).first()
    sk_lo, sk_hi = li.agg(F.min("l_suppkey"), F.max("l_suppkey")).first()
    narrow_pk = (pk_lo, pk_lo + max(1, (pk_hi - pk_lo) // 20))  # ~5% of partkeys
    narrow_sk = (sk_lo, sk_lo + max(1, (sk_hi - sk_lo) // 20))  # ~5% of suppkeys
    full_pk, full_sk = (pk_lo, pk_hi), (sk_lo, sk_hi)
    linear = str(tmp_path / "linear")
    zpath = str(tmp_path / "zorder")
    (
        li.repartitionByRange(16, F.col("l_partkey"))
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(linear)
    )
    write_zordered(li, zpath, "l_partkey", "l_suppkey", n_files=16)

    # second-dimension box: linear cannot prune at all, z must
    lin_sk = _stats_overlap_fraction(linear, full_pk, narrow_sk, "l_partkey", "l_suppkey")
    z_sk = _stats_overlap_fraction(zpath, full_pk, narrow_sk, "l_partkey", "l_suppkey")
    assert lin_sk > 0.9, f"one-column sort unexpectedly pruned dim 2: {lin_sk}"
    assert z_sk < lin_sk and z_sk <= 0.5, (z_sk, lin_sk)

    # first-dimension box: z keeps pruning most files (linear is perfect here)
    z_pk = _stats_overlap_fraction(zpath, narrow_pk, full_sk, "l_partkey", "l_suppkey")
    assert z_pk <= 0.5, z_pk

    # and the layout is lossless: same rows back
    a = spark.read.parquet(zpath).groupBy().agg(
        F.count("*"), F.sum("l_partkey"), F.sum("l_suppkey")
    ).collect()
    b = li.groupBy().agg(F.count("*"), F.sum("l_partkey"), F.sum("l_suppkey")).collect()
    assert a == b
