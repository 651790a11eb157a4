"""O10 backend selection: the two state-store providers must be true
implementation choices — identical state either way (samsa's rocksdb/sqlite
duality, reference storage.py:62-78), an unknown backend must raise
(reference UnknownDatabaseSpecified, storage.py:221-224), and
store="default" must actually select the HDFS-backed provider even after a
RocksDB stream set the session conf."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

ROWS = [
    (1, 100, 1, "view", 1.0),
    (7, 200, 2, "purchase", 9.5),
    (7, 300, 3, "view", 2.0),
    (9, 150, 4, "click", 0.5),
]
SCHEMA = "user_id long, ts_us long, event_id long, event_type string, value double"


@pytest.fixture()
def base():
    d = tempfile.mkdtemp(prefix="samsa-backend-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run(spark, base, store, tag):
    from samsa_spark.streaming.sources import file_stream
    from samsa_spark.streaming.state_stream import StatefulStream, read_state

    src = os.path.join(base, f"src-{tag}")
    spark.createDataFrame(ROWS, SCHEMA).coalesce(2).write.parquet(src)
    chk = os.path.join(base, f"chk-{tag}")
    ss = StatefulStream(spark, "user_id", ("ts_us", "event_id"), ("event_type", "value"), store=store)
    ss.run_available_now(file_stream(spark, src, spark.read.parquet(src).schema), chk)
    return {tuple(r) for r in read_state(spark, chk).collect()}


def test_backends_produce_identical_state(spark, base):
    rocks = _run(spark, base, "rocksdb", "rocks")  # sets the session provider conf
    default = _run(spark, base, "default", "hdfs")  # must override it back
    assert rocks == default
    assert spark.conf.get("spark.sql.streaming.stateStore.providerClass").endswith(
        "HDFSBackedStateStoreProvider"
    )


def test_unknown_store_raises(spark):
    from samsa_spark.streaming.state_stream import StatefulStream

    with pytest.raises(ValueError, match="unknown store"):
        StatefulStream(spark, "user_id", ("ts_us",), ("value",), store="sqlite3")
