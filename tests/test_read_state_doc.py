"""The README's O4 external-query contract (reference ``query``,
storage.py:208-219): ``read_state(spark, chk)`` exposes live state as a
DataFrame whose schema is exactly key columns + the fold's declared state
columns — no engine bookkeeping — for BOTH the built-in LWW fold and an
arbitrary ``stateful_transform`` fold, and a single-key ``where`` on it is
the point lookup."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest


@pytest.fixture()
def base():
    d = tempfile.mkdtemp(prefix="samsa-o4doc-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


ROWS = [
    (1, 100, 1, "view", 1.0),
    (7, 200, 2, "purchase", 9.5),
    (7, 300, 3, "view", 2.0),
    (9, 150, 4, "click", 0.5),
]
SCHEMA = "user_id long, ts_us long, event_id long, event_type string, value double"


def _stage(spark, base):
    src = os.path.join(base, "src")
    spark.createDataFrame(ROWS, SCHEMA).coalesce(2).write.parquet(src)
    return src


def test_readme_point_lookup_builtin_fold(spark, base):
    from samsa_spark.streaming.sources import file_stream
    from samsa_spark.streaming.state_stream import StatefulStream, read_state

    src = _stage(spark, base)
    chk = os.path.join(base, "chk")
    ss = StatefulStream(spark, "user_id", ("ts_us", "event_id"), ("event_type", "value"))
    schema = spark.read.parquet(src).schema
    ss.run_available_now(file_stream(spark, src, schema, max_files_per_trigger=1), chk)

    # the README snippet, verbatim shape
    state = read_state(spark, chk)
    row = state.where(state.user_id == 7).first()
    assert (row.ts_us, row.event_id, row.event_type, row.value) == (300, 3, "view", 2.0)
    # schema = key + declared state columns only (no groupState/timeout wrapper)
    assert state.columns == ["user_id", "ts_us", "event_id", "event_type", "value"]
    assert state.where(state.user_id == 42).first() is None  # reference: None on miss


def test_readme_point_lookup_custom_fold(spark, base):
    import pandas as pd

    from samsa_spark.streaming.sources import file_stream
    from samsa_spark.streaming.state_stream import read_state, stateful_transform

    src = _stage(spark, base)
    chk = os.path.join(base, "chk")

    def fold(key, prior, pdf):
        n0 = prior[0] if prior is not None else 0
        n = n0 + len(pdf)
        return (n,), pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    schema = spark.read.parquet(src).schema
    out = stateful_transform(
        file_stream(spark, src, schema, max_files_per_trigger=1),
        "user_id",
        fold,
        state_ddl="n_events bigint",
        output_ddl="user_id bigint, n_events bigint",
    )
    q = (
        out.writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    state = read_state(spark, chk)
    assert state.columns == ["user_id", "n_events"]  # whatever state_ddl declared
    assert state.where(state.user_id == 7).first().n_events == 2
