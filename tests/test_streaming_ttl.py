"""Opt-in state TTL/eviction for StatefulStream (round-3 verdict #3).

samsa keeps every key forever (reference storage.py:190-206 — faithful
default, unchanged); ``ttl=(order_col, horizon)`` adds the watermark-bounded
pattern ``dedup_stream`` uses to the keyed store: a key whose high-water
mark falls more than ``horizon`` behind the stream's max event time is
removed from state at trigger time.

Covered:
- eviction: a stale key disappears from ``read_state`` once the watermark
  passes it, while batch D2-with-freshness-filter agrees on the survivors
- no-op triggers re-arm the timeout (GroupState clears timeouts on every
  invocation — a quiet trigger must not immortalize a key)
- late arrivals (older than the watermark) cannot resurrect an evicted key
- fresh data legitimately re-creates an evicted key
- a horizon longer than the log's span changes nothing: TTL stream == batch
  D2 exactly
- constructor validation of the ttl column
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

SEC = 1_000_000  # µs per second
HORIZON_S = 3600


@pytest.fixture()
def base():
    d = tempfile.mkdtemp(prefix="samsa-ttl-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _stream(spark, horizon=f"{HORIZON_S} seconds"):
    from samsa_spark.streaming.state_stream import StatefulStream

    return StatefulStream(spark, KEY, ORDER, VALUES, ttl=("ts_us", horizon))


def _run(spark, ss, src_dir, chk, files_per_trigger=2):
    from samsa_spark.streaming.sources import file_stream

    schema = spark.read.parquet(src_dir).schema
    src = file_stream(spark, src_dir, schema, max_files_per_trigger=files_per_trigger)
    ss.run_available_now(src, chk)


def _live_keys(spark, chk):
    from samsa_spark.streaming.state_stream import read_state

    return {r.user_id: (r.ts_us, r.event_id, r.event_type, r.value)
            for r in read_state(spark, chk).collect()}


def _add_files(spark, rows, base, src, stage):
    tmp = os.path.join(base, f"stage-{stage}")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(src, exist_ok=True)
    for f in os.listdir(tmp):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(tmp, f), os.path.join(src, f"{stage}-{f}"))


def test_stale_key_evicted_and_batch_filter_agrees(spark, base):
    """Keys 1/2 go stale; keys 3/4 stay fresh; key 5 arrives last. After the
    watermark passes the stale keys they are gone from read_state, and batch
    compaction filtered to the freshness horizon names the same survivors."""
    import pyspark.sql.functions as F

    from samsa_spark.operators.state import compact_latest

    src = os.path.join(base, "src")
    chk = os.path.join(base, "chk")
    stages = [
        # stage A: four keys, all old
        [(1, 1000 * SEC, 1, "view", 1.0), (2, 1500 * SEC, 2, "view", 2.0),
         (3, 1800 * SEC, 3, "view", 3.0), (4, 2000 * SEC, 4, "view", 4.0)],
        # stage B: keys 3/4 refresh -> watermark jumps to 10000s - horizon
        [(3, 10_000 * SEC, 5, "purchase", 30.0), (4, 10_000 * SEC, 6, "purchase", 40.0)],
        # stage C: key 5 arrives; this trigger fires the evictions of 1/2
        [(5, 10_050 * SEC, 7, "click", 50.0)],
    ]
    ss = _stream(spark)
    all_rows = [r for st in stages for r in st]
    for i, rows in enumerate(stages):
        _add_files(spark, rows, base, src, f"s{i}")
        _run(spark, _stream(spark) if i else ss, src, chk)

    live = _live_keys(spark, chk)
    assert set(live) == {3, 4, 5}, f"stale keys not evicted: {live}"
    assert live[3] == (10_000 * SEC, 5, "purchase", 30.0)

    # batch D2 + freshness filter (high-water >= max event time - horizon)
    ev = spark.createDataFrame(all_rows, SCHEMA)
    compacted = compact_latest(ev)
    cutoff = ev.agg(F.max("ts_us")).collect()[0][0] - HORIZON_S * SEC
    batch = {r.user_id: (r.last_ts_us, r.last_event_id, r.last_event_type, r.last_value)
             for r in compacted.where(F.col("last_ts_us") >= cutoff).collect()}
    assert live == batch


def test_noop_trigger_rearms_timeout(spark, base):
    """An out-of-order (but in-horizon) row for key 2 takes the fold's no-op
    'prior newer' path; the same trigger must still evict stale key 1 —
    and key 2's timeout must survive the no-op (re-armed, not cleared)."""
    src = os.path.join(base, "src")
    chk = os.path.join(base, "chk")
    _add_files(spark, [(1, 1000 * SEC, 1, "view", 1.0), (2, 1000 * SEC, 2, "view", 2.0)],
               base, src, "s0")
    _run(spark, _stream(spark), src, chk)
    _add_files(spark, [(2, 10_000 * SEC, 3, "purchase", 20.0)], base, src, "s1")
    _run(spark, _stream(spark), src, chk)
    # 9000s < key 2's high-water 10000s -> no-op path; watermark is 6400s so
    # key 1 (hw 1000s) evicts in this same trigger
    _add_files(spark, [(2, 9000 * SEC, 4, "view", 9.0)], base, src, "s2")
    _run(spark, _stream(spark), src, chk)
    live = _live_keys(spark, chk)
    assert set(live) == {2}
    assert live[2] == (10_000 * SEC, 3, "purchase", 20.0)
    # key 2's timeout survived the no-op: advance the stream far enough and
    # it evicts too (a cleared timeout would leave it immortal)
    _add_files(spark, [(6, 20_000 * SEC, 5, "view", 6.0)], base, src, "s3")
    _run(spark, _stream(spark), src, chk)
    _add_files(spark, [(6, 20_001 * SEC, 6, "view", 6.1)], base, src, "s4")
    _run(spark, _stream(spark), src, chk)
    assert set(_live_keys(spark, chk)) == {6}


def test_late_event_does_not_resurrect_evicted_key(spark, base):
    """After key 1 is evicted, a late event BELOW the watermark is dropped —
    the evicted key stays gone. A fresh event above the watermark
    legitimately re-creates it (it is inside the horizon again)."""
    src = os.path.join(base, "src")
    chk = os.path.join(base, "chk")
    _add_files(spark, [(1, 1000 * SEC, 1, "view", 1.0)], base, src, "s0")
    _run(spark, _stream(spark), src, chk)
    _add_files(spark, [(2, 10_000 * SEC, 2, "view", 2.0)], base, src, "s1")
    _run(spark, _stream(spark), src, chk)
    _add_files(spark, [(2, 10_001 * SEC, 3, "view", 2.1)], base, src, "s2")
    _run(spark, _stream(spark), src, chk)
    assert set(_live_keys(spark, chk)) == {2}, "key 1 should be evicted"

    # late: 2000s is far below the ~6400s watermark
    _add_files(spark, [(1, 2000 * SEC, 4, "view", 1.5)], base, src, "s3")
    _run(spark, _stream(spark), src, chk)
    assert set(_live_keys(spark, chk)) == {2}, "late event resurrected an evicted key"

    # fresh: above the watermark -> legitimate re-creation
    _add_files(spark, [(1, 10_100 * SEC, 5, "view", 1.9)], base, src, "s4")
    _run(spark, _stream(spark), src, chk)
    live = _live_keys(spark, chk)
    assert live.get(1) == (10_100 * SEC, 5, "view", 1.9)


def test_long_horizon_equals_batch_d2(spark, base):
    """A horizon longer than the log's time span evicts nothing: the TTL
    stream over the real events log equals batch D2 compaction exactly —
    TTL is pure opt-in eviction, not a semantics change."""
    from samsa_spark import tables
    from samsa_spark.operators.state import compact_latest

    ev = tables.load(spark, SF_SMALL, "events").select(KEY, *ORDER, *VALUES)
    src = os.path.join(base, "src")
    ev.repartition(6).write.parquet(src)
    chk = os.path.join(base, "chk")
    _run(spark, _stream(spark, horizon="3650 days"), src, chk)
    live = _live_keys(spark, chk)
    batch = {r.user_id: (r.last_ts_us, r.last_event_id, r.last_event_type, r.last_value)
             for r in compact_latest(ev).collect()}
    assert live == batch


def test_ttl_column_validated(spark):
    from samsa_spark.streaming.state_stream import StatefulStream

    with pytest.raises(ValueError, match="ttl column"):
        StatefulStream(spark, KEY, ORDER, VALUES, ttl=("event_id", "1 hour"))
    with pytest.raises(ValueError, match="ttl column"):
        StatefulStream(spark, KEY, ORDER, VALUES, ttl=("no_such_col", "1 hour"))


def test_ttl_eviction_reaches_changelog(spark, base):
    """Changelog parity for evictions (round-5 verdict #8): a TTL eviction
    emits a ``_deleted`` tombstone row, so replaying an external changelog
    yields exactly ``read_state``'s survivors — evicted keys must not be
    resurrected by replay."""
    from samsa_spark.streaming.sources import file_stream
    from samsa_spark.streaming.state_stream import replay_changelog

    src = os.path.join(base, "src")
    chk = os.path.join(base, "chk")
    log = os.path.join(base, "log")
    stages = [
        [(1, 1000 * SEC, 1, "view", 1.0), (2, 1500 * SEC, 2, "view", 2.0),
         (3, 1800 * SEC, 3, "view", 3.0)],
        [(3, 10_000 * SEC, 4, "purchase", 30.0)],  # watermark jump
        [(5, 10_050 * SEC, 5, "click", 50.0)],     # trigger fires evictions of 1/2
    ]
    for i, rows in enumerate(stages):
        _add_files(spark, rows, base, src, f"s{i}")
        schema = spark.read.parquet(src).schema
        _stream(spark).run_available_now(
            file_stream(spark, src, schema, max_files_per_trigger=2), chk,
            changelog_dir=log,
        )

    live = _live_keys(spark, chk)
    assert set(live) == {3, 5}, f"expected evictions of 1/2: {live}"

    raw = spark.read.parquet(log)
    assert "_deleted" in raw.columns
    assert {r.user_id for r in raw.where("_deleted").collect()} == {1, 2}

    replayed = {r.user_id: (r.ts_us, r.event_id, r.event_type, r.value)
                for r in replay_changelog(spark, log, KEY).collect()}
    assert replayed == live, "changelog replay diverged from read_state"


def test_ttl_with_tombstone_combined(spark, base):
    """TTL + tombstone configured TOGETHER: an explicit delete (tombstone
    event) and a watermark eviction coexist — read_state hides both, the
    changelog records both as _deleted rows, and replay agrees."""
    from samsa_spark.streaming.sources import file_stream
    from samsa_spark.streaming.state_stream import (
        StatefulStream,
        read_state,
        replay_changelog,
    )

    src = os.path.join(base, "src")
    chk = os.path.join(base, "chk")
    log = os.path.join(base, "log")
    stages = [
        [(1, 1000 * SEC, 1, "view", 1.0),        # will be TTL-evicted
         (2, 1500 * SEC, 2, "view", 2.0),        # will be tombstoned
         (3, 1800 * SEC, 3, "view", 3.0)],       # refreshes, survives
        [(2, 1600 * SEC, 4, "error", 0.0),       # explicit delete of key 2
         (3, 10_000 * SEC, 5, "purchase", 30.0)],
        [(5, 10_050 * SEC, 6, "click", 50.0)],   # eviction trigger for key 1
    ]

    def stream():
        return StatefulStream(
            spark, KEY, ORDER, VALUES,
            tombstone=("event_type", "error"),
            ttl=("ts_us", f"{HORIZON_S} seconds"),
        )

    for i, rows in enumerate(stages):
        _add_files(spark, rows, base, src, f"s{i}")
        schema = spark.read.parquet(src).schema
        stream().run_available_now(
            file_stream(spark, src, schema, max_files_per_trigger=2), chk,
            changelog_dir=log,
        )

    live = {r.user_id: (r.ts_us, r.event_id, r.event_type, r.value)
            for r in read_state(spark, chk).collect()}
    assert set(live) == {3, 5}, f"want tombstoned 2 and evicted 1 gone: {live}"

    raw = spark.read.parquet(log)
    deleted = {r.user_id for r in raw.where("_deleted").collect()}
    assert {1, 2} <= deleted, f"both delete kinds must reach the changelog: {deleted}"

    replayed = {r.user_id: (r.ts_us, r.event_id, r.event_type, r.value)
                for r in replay_changelog(spark, log, KEY).collect()}
    assert replayed == live


def test_legacy_markerless_changelog_refused(spark, base):
    """A marker-bearing (ttl/tombstone) stream must refuse to append to a
    changelog written without the ``_deleted`` column (pre-marker layout):
    mixed file schemas would make replay silently drop every eviction.
    A marker-free stream writes such a changelog; pointing a TTL stream at
    it raises an actionable error BEFORE any batch is appended."""
    from samsa_spark.streaming.sources import file_stream
    from samsa_spark.streaming.state_stream import StatefulStream

    src = os.path.join(base, "src")
    chk1 = os.path.join(base, "chk1")
    log = os.path.join(base, "log")
    _add_files(spark, [(1, 1000 * SEC, 1, "view", 1.0)], base, src, "s0")
    schema = spark.read.parquet(src).schema
    plain = StatefulStream(spark, KEY, ORDER, VALUES)  # no ttl/tombstone
    plain.run_available_now(
        file_stream(spark, src, schema, max_files_per_trigger=2), chk1,
        changelog_dir=log,
    )
    legacy = spark.read.parquet(log)
    assert "_deleted" not in legacy.columns
    n_before = legacy.count()

    ttl_stream = _stream(spark)
    with pytest.raises(ValueError, match="_deleted"):
        ttl_stream.run_available_now(
            file_stream(spark, src, schema, max_files_per_trigger=2),
            os.path.join(base, "chk2"),
            changelog_dir=log,
        )
    assert spark.read.parquet(log).count() == n_before, "nothing appended"
