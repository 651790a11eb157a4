"""Streaming core tests (SURVEY.md §5.2):

1. replay-equivalence — streaming LWW state over the events log equals batch
   compaction (the streaming/batch duality samsa's changelog design relies on)
2. recovery — stop after half the log, restart from checkpoint, feed the
   rest; final state equals compaction over the full log (reference O8)
3. changelog replay — the external changelog rebuilds the state table
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


@pytest.fixture(scope="module")
def staged(spark):
    """Events staged as a 10-file parquet directory (a topic backlog), split
    into two halves for the recovery test."""
    from samsa_spark import tables

    base = tempfile.mkdtemp(prefix="samsa-stream-")
    ev = tables.load(spark, SF_SMALL, "events").select(KEY, *ORDER, *VALUES)
    half1 = os.path.join(base, "half1")
    half2 = os.path.join(base, "half2")
    thr = ev.agg({"event_id": "max"}).collect()[0][0] // 2
    ev.where(f"event_id <= {thr}").repartition(5).write.parquet(half1)
    ev.where(f"event_id > {thr}").repartition(5).write.parquet(half2)
    yield base, half1, half2, ev
    shutil.rmtree(base, ignore_errors=True)


def _expected_state(ev):
    from samsa_spark.operators.state import compact_latest

    return {
        r.user_id: (r.last_ts_us, r.last_event_id, r.last_event_type, r.last_value)
        for r in compact_latest(ev).collect()
    }


def _state_rows(spark, chk):
    from samsa_spark.streaming.state_stream import read_state

    return {
        r.user_id: (r.ts_us, r.event_id, r.event_type, r.value)
        for r in read_state(spark, chk).collect()
    }


def test_replay_equivalence(spark, staged):
    base, half1, half2, ev = staged
    from samsa_spark.streaming.sources import file_stream
    from samsa_spark.streaming.state_stream import StatefulStream

    # stream over the FULL log: both halves via a glob-less parent read
    full_dir = os.path.join(base, "full")
    ev.repartition(8).write.parquet(full_dir)
    chk = os.path.join(base, "chk-full")
    ss = StatefulStream(spark, KEY, ORDER, VALUES)
    src = file_stream(spark, full_dir, ev.schema, max_files_per_trigger=3)
    ss.run_available_now(src, chk)

    assert _state_rows(spark, chk) == _expected_state(ev)


def test_recovery_from_checkpoint(spark, staged):
    base, half1, half2, ev = staged
    from samsa_spark.streaming.sources import file_stream
    from samsa_spark.streaming.state_stream import StatefulStream

    stream_dir = os.path.join(base, "incoming")
    os.makedirs(stream_dir, exist_ok=True)
    for f in os.listdir(half1):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(half1, f), os.path.join(stream_dir, f"h1-{f}"))

    chk = os.path.join(base, "chk-recovery")
    ss = StatefulStream(spark, KEY, ORDER, VALUES)
    ss.run_available_now(file_stream(spark, stream_dir, ev.schema, 3), chk)

    # "crash", new data arrives, restart from the same checkpoint
    for f in os.listdir(half2):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(half2, f), os.path.join(stream_dir, f"h2-{f}"))
    ss2 = StatefulStream(spark, KEY, ORDER, VALUES)
    ss2.run_available_now(file_stream(spark, stream_dir, ev.schema, 3), chk)

    assert _state_rows(spark, chk) == _expected_state(ev)


def test_changelog_replay(spark, staged):
    base, half1, half2, ev = staged
    from samsa_spark.streaming.sources import file_stream
    from samsa_spark.streaming.state_stream import StatefulStream, replay_changelog

    full_dir = os.path.join(base, "full2")
    ev.repartition(6).write.parquet(full_dir)
    chk = os.path.join(base, "chk-changelog")
    clog = os.path.join(base, "changelog")
    ss = StatefulStream(spark, KEY, ORDER, VALUES)
    ss.run_available_now(file_stream(spark, full_dir, ev.schema, 2), chk, changelog_dir=clog)

    rebuilt = {
        r.user_id: (r.ts_us, r.event_id, r.event_type, r.value)
        for r in replay_changelog(spark, clog, KEY).collect()
    }
    assert rebuilt == _expected_state(ev)


def test_st1_streaming_state_oracle(spark):
    from tests.oracle import check_query

    ok, msg = check_query(spark, "st1_streaming_state", SF_SMALL)
    assert ok, msg


def test_st2_streaming_tombstones_oracle(spark):
    """The registered streaming-delete query against the batch d7 DuckDB
    oracle — the driver-facing form of the marker-mode equivalence."""
    from tests.oracle import check_query

    ok, msg = check_query(spark, "st2_streaming_tombstones", SF_SMALL)
    assert ok, msg


def test_st3_streaming_custom_fold_oracle(spark):
    """The registered user-callback (O5) query: an arbitrary Python fold
    through stateful_transform, final state vs the plain SQL aggregate."""
    from tests.oracle import check_query

    ok, msg = check_query(spark, "st3_streaming_custom_fold", SF_SMALL)
    assert ok, msg


def test_stateful_stream_string_contract(spark, staged):
    """The reference's exact message shape — string key, string value,
    log-offset order (storage.py:179-183) — through StatefulStream: final
    state equals batch compaction over the same string-typed log (SURVEY §7
    hard-part 4: the core surface keeps samsa's string contract)."""
    import pyspark.sql.functions as F

    from samsa_spark.operators.state import compact_latest
    from samsa_spark.streaming.sources import file_stream
    from samsa_spark.streaming.state_stream import StatefulStream, read_state

    base, half1, half2, ev = staged
    log = ev.select(
        F.col("user_id").cast("string").alias("key"),
        F.col("event_id").alias("offset"),
        F.concat_ws("|", "event_type", F.col("value").cast("string")).alias("value"),
    )
    src = os.path.join(base, "str-src")
    log.repartition(4).write.parquet(src)
    chk = os.path.join(base, "str-chk")
    ss = StatefulStream(spark, "key", ("offset",), ("value",))
    ss.run_available_now(file_stream(spark, src, log.schema, 2), chk)

    got = {r.key: (r.offset, r.value) for r in read_state(spark, chk).collect()}
    want = {
        r.key: (r.last_offset, r.last_value)
        for r in compact_latest(
            log, keys=("key",), order_cols=("offset",), payload_cols=("value",)
        ).collect()
    }
    assert got == want and len(got) > 0


def test_stateful_transform_custom_fold(spark, staged):
    """User-defined per-key logic: running count + running sum kept in
    state across triggers (the arbitrary-callback parity feature)."""
    import os

    import pandas as pd

    from samsa_spark.streaming.sources import file_stream
    from samsa_spark.streaming.state_stream import stateful_transform

    base, half1, half2, ev = staged
    src = os.path.join(base, "ct-src")
    ev.repartition(4).write.parquet(src)

    def fold(key, prior, pdf):
        n0, s0 = prior if prior is not None else (0, 0.0)
        n = n0 + len(pdf)
        s = s0 + float(pdf["value"].sum())
        out = pd.DataFrame({"user_id": [key[0]], "n_seen": [n], "sum_value": [s]})
        return (n, s), out

    stream = file_stream(spark, src, ev.schema, max_files_per_trigger=2)
    out = stateful_transform(
        stream, "user_id", fold,
        state_ddl="n_seen long, sum_value double",
        output_ddl="user_id long, n_seen long, sum_value double",
    )
    out_dir = os.path.join(base, "ct-out")
    q = (
        out.writeStream.foreachBatch(lambda b, i: b.write.mode("append").parquet(out_dir))
        .outputMode("update")
        .option("checkpointLocation", os.path.join(base, "ct-chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # final emitted row per key (max n_seen) must equal the batch aggregate
    import pyspark.sql.functions as F

    final = (
        spark.read.parquet(out_dir)
        .groupBy("user_id")
        .agg(F.max("n_seen").alias("n_seen"), F.max("sum_value").alias("sum_value"))
    )
    batch = ev.groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("value").alias("s")
    )
    got = {r.user_id: r.n_seen for r in final.collect()}
    want = {r.user_id: r.n for r in batch.collect()}
    assert got == want
    gots = {r.user_id: round(r.sum_value, 4) for r in final.collect()}
    wants = {r.user_id: round(r.s, 4) for r in batch.collect()}
    assert gots == wants


def test_st8_stream_static_enrich_oracle(spark):
    """Stream-static join (stateless enrichment): multi-trigger replay
    through the broadcast-dim join must equal the batch d9 join exactly —
    trigger boundaries cannot duplicate or drop an enrichment."""
    from tests.conftest import SF_SMALL
    from tests.oracle import check_query

    ok, msg = check_query(spark, "st8_streaming_static_enrich", SF_SMALL)
    assert ok, msg
