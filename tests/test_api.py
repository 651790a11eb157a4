"""StateTable facade: the samsa migration surface over batch operators."""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL


def _events(spark):
    from samsa_spark import tables

    return tables.load(spark, SF_SMALL, "events")


def test_from_log_get_put_delete_roundtrip(spark):
    from samsa_spark.api import StateTable
    from samsa_spark.operators.state import compact_latest

    ev = _events(spark)
    thr = ev.agg({"event_id": "max"}).collect()[0][0] // 2
    half1 = ev.where(f"event_id <= {thr}")
    half2 = ev.where(f"event_id > {thr}")

    table = StateTable.from_log(half1)
    applied = table.apply(half2)

    want = {tuple(r) for r in compact_latest(ev).collect()}
    got = {tuple(r) for r in applied.to_df().collect()}
    assert got == want

    # point lookup: hit and miss
    some_user = ev.select("user_id").first().user_id
    hit = applied.get(some_user)
    assert hit is not None and hit["user_id"] == some_user
    assert applied.get(10**9) is None

    # delete
    pruned = applied.delete_where(F.col("last_event_type") == "error")
    assert pruned.to_df().where("last_event_type = 'error'").count() == 0


def test_save_and_load_bucketed(spark):
    from samsa_spark.api import StateTable

    ev = _events(spark)
    table = StateTable.from_log(ev)
    base = tempfile.mkdtemp(prefix="samsa-api-")
    path = os.path.join(base, "state")
    table.save_as(path, bucket_col="user_id")
    back = StateTable.load(spark, path)
    assert {tuple(r) for r in back.to_df().collect()} == {
        tuple(r) for r in table.to_df().collect()
    }
