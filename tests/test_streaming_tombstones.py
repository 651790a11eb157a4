"""Streaming delete semantics (reference O6, ``RocksDBClient.delete``
samsa/db/rocksdb.py:75-85): a winning event whose tombstone column matches
the configured value removes the key from queryable state.

Covered here:
- marker mode ≡ batch d7 over the real events log (multi-trigger backlog)
- eager mode ≡ batch d7 when the feed is per-key ordered across triggers
- a LATE pre-delete event must not resurrect a marker-deleted key (the
  reason marker mode is the default); eager mode documents the opposite
- a live event newer than the delete legitimately resurrects the key
- changelog rows carry an explicit ``_deleted`` marker and replay applies
  deletes off that marker, never off payload nullness
- schema compatibility: tombstone-free streams keep the pre-tombstone
  state/output schemas (no ``_tombstoned`` / ``_deleted`` columns)
- constructor validation of the tombstone column
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from tests.conftest import SF_SMALL

KEY = "user_id"
ORDER = ("ts_us", "event_id")
VALUES = ("event_type", "value")
SCHEMA = "user_id long, ts_us long, event_id long, event_type string, value double"


@pytest.fixture()
def base():
    d = tempfile.mkdtemp(prefix="samsa-tomb-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _stream(spark, tombstone=("event_type", "error"), eager=False):
    from samsa_spark.streaming.state_stream import StatefulStream

    return StatefulStream(spark, KEY, ORDER, VALUES, tombstone=tombstone, eager_delete=eager)


def _run(spark, ss, src_dir, chk, clog=None, files_per_trigger=2):
    from samsa_spark.streaming.sources import file_stream

    schema = spark.read.parquet(src_dir).schema
    src = file_stream(spark, src_dir, schema, max_files_per_trigger=files_per_trigger)
    ss.run_available_now(src, chk, changelog_dir=clog)


def _live_keys(spark, chk):
    from samsa_spark.streaming.state_stream import read_state

    return {r.user_id: (r.ts_us, r.event_id, r.event_type, r.value)
            for r in read_state(spark, chk).collect()}


def _write(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(path)


def _batch_d7(spark, ev):
    from samsa_spark.operators.state import apply_tombstones

    return {
        r.user_id: (r.last_ts_us, r.last_event_id, r.last_event_type, r.last_value)
        for r in apply_tombstones(ev.select(KEY, *ORDER, *VALUES)).collect()
    }


def test_marker_mode_equals_batch_d7(spark, base):
    """Streaming with marker tombstones over a multi-trigger backlog of the
    real events log == batch d7_tombstones."""
    from samsa_spark import tables

    ev = tables.load(spark, SF_SMALL, "events").select(KEY, *ORDER, *VALUES)
    src = os.path.join(base, "src")
    ev.repartition(6).write.parquet(src)
    chk = os.path.join(base, "chk")
    _run(spark, _stream(spark), src, chk)
    assert _live_keys(spark, chk) == _batch_d7(spark, ev)


def test_eager_mode_equals_batch_d7_on_ordered_feed(spark, base):
    """Eager delete (samsa's literal state.remove) matches batch d7 when the
    feed is per-key ordered across triggers: first half of the log, then the
    second, as two sequential runs against one checkpoint."""
    from samsa_spark import tables

    ev = tables.load(spark, SF_SMALL, "events").select(KEY, *ORDER, *VALUES)
    thr = ev.agg({"ts_us": "max"}).collect()[0][0] // 2
    src = os.path.join(base, "src")
    chk = os.path.join(base, "chk")
    os.makedirs(src)
    ev.where(f"ts_us <= {thr}").coalesce(2).write.mode("overwrite").parquet(os.path.join(base, "h1"))
    for f in os.listdir(os.path.join(base, "h1")):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(base, "h1", f), os.path.join(src, f"a-{f}"))
    _run(spark, _stream(spark, eager=True), src, chk)
    ev.where(f"ts_us > {thr}").coalesce(2).write.mode("overwrite").parquet(os.path.join(base, "h2"))
    for f in os.listdir(os.path.join(base, "h2")):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(base, "h2", f), os.path.join(src, f"b-{f}"))
    _run(spark, _stream(spark, eager=True), src, chk)
    assert _live_keys(spark, chk) == _batch_d7(spark, ev)


def test_marker_survives_late_pre_delete_event(spark, base):
    """Trigger 1 deletes key 1 at ts=100; trigger 2 delivers a LATE event at
    ts=50. Marker mode keeps the high-water mark, so the key stays deleted —
    this is exactly the out-of-order case eager mode gets wrong."""
    src = os.path.join(base, "src")
    chk = os.path.join(base, "chk")
    os.makedirs(src)
    _write(spark, [(1, 100, 10, "error", None), (2, 90, 9, "purchase", 5.0)],
           os.path.join(base, "f1"))
    for f in os.listdir(os.path.join(base, "f1")):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(base, "f1", f), os.path.join(src, f"a-{f}"))
    ss = _stream(spark)
    _run(spark, ss, src, chk)
    assert set(_live_keys(spark, chk)) == {2}

    _write(spark, [(1, 50, 5, "view", 1.0)], os.path.join(base, "f2"))
    for f in os.listdir(os.path.join(base, "f2")):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(base, "f2", f), os.path.join(src, f"b-{f}"))
    _run(spark, _stream(spark), src, chk)
    assert set(_live_keys(spark, chk)) == {2}, "late pre-delete event resurrected the key"


def test_eager_mode_resurrects_on_late_event(spark, base):
    """The documented limitation that motivates marker-default: eager
    delete forgets the high-water mark, so the same late event DOES
    resurrect the key."""
    src = os.path.join(base, "src")
    chk = os.path.join(base, "chk")
    os.makedirs(src)
    _write(spark, [(1, 100, 10, "error", None)], os.path.join(base, "f1"))
    for f in os.listdir(os.path.join(base, "f1")):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(base, "f1", f), os.path.join(src, f"a-{f}"))
    _run(spark, _stream(spark, eager=True), src, chk)
    assert _live_keys(spark, chk) == {}

    _write(spark, [(1, 50, 5, "view", 1.0)], os.path.join(base, "f2"))
    for f in os.listdir(os.path.join(base, "f2")):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(base, "f2", f), os.path.join(src, f"b-{f}"))
    _run(spark, _stream(spark, eager=True), src, chk)
    assert set(_live_keys(spark, chk)) == {1}


def test_newer_live_event_resurrects_key(spark, base):
    """LWW semantics: an event strictly newer than the delete wins — the key
    comes back with the new payload (matches batch d7 on the same log)."""
    src = os.path.join(base, "src")
    chk = os.path.join(base, "chk")
    os.makedirs(src)
    _write(spark, [(1, 100, 10, "error", None)], os.path.join(base, "f1"))
    for f in os.listdir(os.path.join(base, "f1")):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(base, "f1", f), os.path.join(src, f"a-{f}"))
    _run(spark, _stream(spark), src, chk)
    _write(spark, [(1, 200, 20, "purchase", 7.0)], os.path.join(base, "f2"))
    for f in os.listdir(os.path.join(base, "f2")):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(base, "f2", f), os.path.join(src, f"b-{f}"))
    _run(spark, _stream(spark), src, chk)
    assert _live_keys(spark, chk) == {1: (200, 20, "purchase", 7.0)}


def test_changelog_marker_and_replay(spark, base):
    """Changelog rows carry explicit ``_deleted``; replay applies deletes off
    the marker. A live winning row with a genuinely NULL value column
    survives — nullness is not deletion."""
    import pyspark.sql.functions as F

    from samsa_spark.streaming.state_stream import replay_changelog

    src = os.path.join(base, "src")
    chk = os.path.join(base, "chk")
    clog = os.path.join(base, "clog")
    os.makedirs(src)
    rows = [
        (1, 100, 10, "error", None),      # deleted key
        (2, 90, 9, "purchase", None),     # live key with NULL value
        (3, 80, 8, "view", 3.0),          # plain live key
    ]
    _write(spark, rows, os.path.join(base, "f1"))
    for f in os.listdir(os.path.join(base, "f1")):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(base, "f1", f), os.path.join(src, f"a-{f}"))
    _run(spark, _stream(spark), src, chk, clog=clog)

    log = spark.read.parquet(clog)
    assert "_deleted" in log.columns
    marks = {r.user_id: r._deleted for r in log.collect()}
    assert marks == {1: True, 2: False, 3: False}

    rebuilt = {r.user_id: (r.event_type, r.value)
               for r in replay_changelog(spark, clog, KEY).collect()}
    assert rebuilt == {2: ("purchase", None), 3: ("view", 3.0)}
    # delete rows null the payload (Kafka tombstone shape) on top of the marker
    del_row = log.where(F.col("_deleted")).collect()[0]
    assert del_row.event_type is None and del_row.value is None


def test_tombstone_free_schemas_unchanged(spark):
    """No tombstone -> no ``_tombstoned`` state column and no ``_deleted``
    output column: checkpoints written before the tombstone feature remain
    schema-compatible (ADVICE r2 medium)."""
    from samsa_spark import tables
    from samsa_spark.streaming.state_stream import StatefulStream

    ev = tables.load(spark, SF_SMALL, "events").select(KEY, *ORDER, *VALUES)
    plain_state, plain_out = StatefulStream(spark, KEY, ORDER, VALUES)._schemas(ev)
    assert "_tombstoned" not in plain_state.fieldNames()
    assert "_deleted" not in plain_out.fieldNames()
    tomb_state, tomb_out = _stream(spark)._schemas(ev)
    assert tomb_state.fieldNames()[-1] == "_tombstoned"
    assert tomb_out.fieldNames()[-1] == "_deleted"


def test_tombstone_column_validated(spark):
    from samsa_spark.streaming.state_stream import StatefulStream

    with pytest.raises(ValueError, match="tombstone column"):
        StatefulStream(spark, KEY, ORDER, VALUES, tombstone=("ts_us", 0))
    with pytest.raises(ValueError, match="tombstone column"):
        StatefulStream(spark, KEY, ORDER, VALUES, tombstone=("no_such_col", "x"))
