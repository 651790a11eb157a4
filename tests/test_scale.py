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
