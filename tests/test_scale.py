"""Scale/skew operators vs DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from tests.oracle import check_query

SCALE_QUERIES = [
    "d2s_salted_compaction",
    "js1_salted_join",
    "pc1_percentiles",
    "hist1_doc_lengths",
    "arr1_vector_stats",
]


@pytest.mark.parametrize("name", SCALE_QUERIES)
def test_oracle_match(spark, name):
    ok, msg = check_query(spark, name, SF_SMALL)
    assert ok, msg


def test_salted_join_equals_plain_join(spark):
    """Salting is result-invariant: same rows as the unsalted equi-join."""
    from samsa_spark import tables
    from samsa_spark.operators.scale import salted_join

    ev = tables.load(spark, SF_SMALL, "events").select("user_id", "event_id", "value")
    cu = tables.load(spark, SF_SMALL, "customer").selectExpr(
        "c_custkey AS user_id", "c_nationkey"
    )
    got = {tuple(r) for r in salted_join(ev, cu, "user_id").collect()}
    want = {tuple(r) for r in ev.join(cu, "user_id").collect()}
    assert got == want and len(got) > 0


def test_salted_join_shuffles_on_salt(spark):
    """With broadcast disabled (the big-dim case salting exists for), the
    shuffle join keys must include _salt — that's the whole mechanism."""
    import pyspark.sql.functions as F

    from samsa_spark.operators.scale import salted_join

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        f = spark.range(1000).select(
            (F.col("id") % 10).alias("k"), F.col("id").alias("event_id")
        )
        d = spark.range(10).select(F.col("id").alias("k"), (F.col("id") * 2).alias("attr"))
        plan = salted_join(f, d, "k")._jdf.queryExecution().executedPlan().toString()
        assert "_salt" in plan
        join_lines = [ln for ln in plan.split("\n") if "Join" in ln and "_salt" in ln]
        assert join_lines, f"no join keyed on _salt in plan:\n{plan}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_bounds_hot_key_partitions(spark):
    """A 10k-row hot key must spread across all 16 salt buckets, so no
    reducer sees more than ~1/16 of it (the post-salt partition bound)."""
    import pyspark.sql.functions as F

    from samsa_spark.operators.scale import salted_join

    hot = spark.range(10_000).select(F.lit(1).alias("k"), F.col("id").alias("event_id"))
    salted = hot.withColumn("_salt", F.pmod(F.col("event_id"), F.lit(16)).cast("int"))
    sizes = [r.n for r in salted.groupBy("k", "_salt").agg(F.count("*").alias("n")).collect()]
    assert len(sizes) == 16
    assert max(sizes) <= (10_000 // 16) + 1
    # and end-to-end through the join, every fact row still appears exactly once
    d = spark.createDataFrame([(1, "x")], "k int, attr string")
    assert salted_join(hot, d, "k").count() == 10_000


def test_salted_join_skew_guard(spark):
    """check_skew warns on a uniform key distribution (salting is overhead
    there — PLANS.md crossover), stays silent on a genuinely hot key, and
    never changes the result either way. The reducer count is MEASURED
    post-AQE (note 21: the ~10x crossover is partition-count-relative and
    AQE coalescing shrinks the configured count arbitrarily) — so the
    200-partition scenarios pin coalescing off to get a production-like
    effective count, and a third scenario shows the low-count advice."""
    import warnings

    import pyspark.sql.functions as F

    from samsa_spark.operators.scale import salted_join

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_co = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", "200")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        dim = spark.createDataFrame(
            [(k, f"d{k}") for k in range(100)], "user_id long, attr string"
        )
        uniform = spark.range(800).select(
            (F.col("id") % 100).alias("user_id"), F.col("id").alias("event_id")
        )
        # hottest key: 8 rows = 2x the 4-row fair share -> below crossover
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            out = salted_join(uniform, dim, "user_id", check_skew=True)
            n = out.count()
        assert any("below the ~10x crossover" in str(x.message) for x in w), (
            "uniform keys must warn"
        )
        assert n == 800

        # one key holds 95% of rows: 760 = 190x the fair share -> silent
        hot = spark.range(800).select(
            F.when(F.col("id") < 760, F.lit(3)).otherwise(F.col("id") % 100).alias("user_id"),
            F.col("id").alias("event_id"),
        )
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            out = salted_join(hot, dim, "user_id", check_skew=True)
            n = out.count()
        assert not any("crossover" in str(x.message) for x in w), "hot key must not warn"
        assert n == 800

        # few effective reducers (note 21): even the genuinely hot key can't
        # reach 10x when max ratio = partition count — the guard must say the
        # session can't assess the crossover, not pretend to measure it.
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            out = salted_join(hot, dim, "user_id", check_skew=True)
            n = out.count()
        assert any("cannot assess" in str(x.message) for x in w), (
            "low partition count must flag unreachable crossover"
        )
        assert n == 800
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prev_co)


def test_semantic_cells_guard_and_autosize(spark):
    """semantic_dup_pairs warns on an explicit cells > N/10 (degenerate:
    one vector per cell finds nothing) and auto-sizes to max(32, N//150)
    when cells=None."""
    import warnings

    import numpy as np
    from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

    from samsa_spark.operators.similarity import semantic_dup_pairs

    rng = np.random.RandomState(3)
    X = rng.randn(64, 8).astype("float32")
    schema = StructType(
        [StructField("vec_id", LongType()), StructField("embedding", ArrayType(FloatType()))]
    )
    df = spark.createDataFrame([(i, [float(x) for x in X[i]]) for i in range(64)], schema)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        semantic_dup_pairs(df, cells=32, kmeans_iters=1).count()  # 32 > 64/10
    assert any("N/10" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        semantic_dup_pairs(df, cells=None, kmeans_iters=1).count()  # auto: 32 cells, no warn
    assert not any("N/10" in str(x.message) for x in w)


def test_sk1_oracle_match(spark):
    from tests.oracle import check_query

    ok, msg = check_query(spark, "sk1_key_skew_report", SF_SMALL)
    assert ok, msg


def test_key_skew_report_flags_planted_hot_key(spark):
    """A 60%-hot key at 200 partitions is ~120x fair share -> advised;
    uniform keys are ~2x -> not advised (and at 8 partitions NO key can be
    advised — the note-21 partition-count-relativity)."""
    import pandas as pd

    from samsa_spark.operators.scale import key_skew_report

    rows = [(9, i) for i in range(600)] + [(i % 40, 10_000 + i) for i in range(400)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["user_id", "event_id"]))
    rep = {r.key: r for r in key_skew_report(df, shuffle_partitions=200).collect()}
    assert rep[9].salting_advised and rep[9].n_rows == 610  # 600 + 400/40
    assert all(not r.salting_advised for k, r in rep.items() if k != 9)
    # partition-count-relative: at 8 partitions the max possible ratio is 8
    rep8 = {r.key: r for r in key_skew_report(df, shuffle_partitions=8).collect()}
    assert not any(r.salting_advised for r in rep8.values())


def test_js2_oracle_match(spark):
    ok, msg = check_query(spark, "js2_bloom_semi_join", SF_SMALL)
    assert ok, msg


def test_bloom_semi_and_anti_join_equal_plain_joins(spark):
    """The Bloom digest is a pure prefilter: semi and anti forms must
    equal the plain left_semi / left_anti joins row-for-row (no false
    negatives; positives verified exactly), and the two outputs must
    partition the left side."""
    import pyspark.sql.functions as F

    from samsa_spark import tables
    from samsa_spark.operators.scale import bloom_semi_join

    ev = tables.load(spark, SF_SMALL, "events").select("event_id", "user_id")
    cust = tables.load(spark, SF_SMALL, "customer")
    dim = cust.where("c_acctbal > 7000").select(
        F.col("c_custkey").alias("user_id")
    )
    semi = {tuple(r) for r in bloom_semi_join(ev, dim, "user_id").collect()}
    anti = {tuple(r) for r in bloom_semi_join(ev, dim, "user_id", anti=True).collect()}
    want_semi = {
        tuple(r)
        for r in ev.join(dim, "user_id", "left_semi")
        .select("event_id", "user_id")
        .collect()
    }
    want_anti = {
        tuple(r)
        for r in ev.join(dim, "user_id", "left_anti")
        .select("event_id", "user_id")
        .collect()
    }
    assert semi == want_semi and anti == want_anti
    assert semi and anti
    assert not (semi & anti)
    assert len(semi) + len(anti) == ev.count()
