"""Example apps: change detector vs batch D5; watermarked windows vs batch
counts."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from tests.conftest import SF_SMALL

KEY = "user_id"
ORDER = ("ts_us", "event_id")


@pytest.fixture(scope="module")
def staged(spark):
    from samsa_spark import tables

    base = tempfile.mkdtemp(prefix="samsa-stream-ex-")
    ev = tables.load(spark, SF_SMALL, "events").select(KEY, *ORDER, "event_type", "ts")
    src = os.path.join(base, "src")
    ev.repartition(6).write.parquet(src)
    yield base, src, ev
    shutil.rmtree(base, ignore_errors=True)


def _run_detector(spark, src, schema, out_dir, chk):
    from samsa_spark.streaming.examples import change_detector
    from samsa_spark.streaming.sources import file_stream

    det = change_detector(file_stream(spark, src, schema), KEY, ORDER, "event_type")

    def _append(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        det.writeStream.foreachBatch(_append)
        .outputMode("update")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _d5_set(ev):
    from samsa_spark.operators.state import detect_changes

    return {
        (r.user_id, r.event_id, r.prev_event_type, r.event_type)
        for r in detect_changes(ev).collect()
    }


def test_change_detector_matches_batch_d5(spark, staged):
    """Single trigger: the in-batch (ts_us, event_id) fold must reproduce
    batch D5 transitions exactly."""
    base, src, ev = staged
    out_dir = os.path.join(base, "out")
    chk = os.path.join(base, "chk")
    _run_detector(spark, src, ev.schema, out_dir, chk)
    got = {
        (r.user_id, r.event_id, r.prev_status, r.new_status)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == _d5_set(ev)


def test_change_detector_across_triggers(spark, staged):
    """Two sequential runs over a growing log (arrival order = log order,
    as in a real topic): state carries across the restart, transitions still
    equal batch D5 over the union. event_id is monotone in ts in this data,
    so splitting by event_id splits the log by time."""
    base, _, ev = staged
    thr = ev.agg({"event_id": "max"}).collect()[0][0] // 2
    inc = os.path.join(base, "inc")
    os.makedirs(inc, exist_ok=True)
    h1 = os.path.join(base, "det-h1")
    h2 = os.path.join(base, "det-h2")
    ev.where(f"event_id <= {thr}").coalesce(1).write.parquet(h1)
    ev.where(f"event_id > {thr}").coalesce(1).write.parquet(h2)
    out_dir = os.path.join(base, "out2")
    chk = os.path.join(base, "chk2")

    for i, half in enumerate((h1, h2)):
        for f in os.listdir(half):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(half, f), os.path.join(inc, f"h{i}-{f}"))
        _run_detector(spark, inc, ev.schema, out_dir, chk)

    got = {
        (r.user_id, r.event_id, r.prev_status, r.new_status)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == _d5_set(ev)


def test_windowed_change_counts_emit_closed_windows(spark, staged):
    base, src, ev = staged
    import pyspark.sql.functions as F

    from samsa_spark.streaming.examples import windowed_change_counts
    from samsa_spark.streaming.sources import file_stream

    out_dir = os.path.join(base, "wout")
    chk = os.path.join(base, "wchk")
    stream = file_stream(spark, src, ev.schema, max_files_per_trigger=3)
    win = windowed_change_counts(stream)

    def _append(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        win.writeStream.foreachBatch(_append)
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = {
        (r.window_start_us, r.user_id): r.n_events for r in spark.read.parquet(out_dir).collect()
    }
    assert emitted, "no windows emitted"
    batch = {
        (r.window_start_us, r.user_id): r.n_events
        for r in ev.groupBy(
            (F.expr("ts_us div 3600000000") * 3600000000).alias("window_start_us"),
            F.col("user_id"),
        )
        .agg(F.count("*").alias("n_events"))
        .collect()
    }
    # append mode withholds windows the final watermark hasn't passed;
    # everything emitted must match the batch aggregate exactly.
    for k, v in emitted.items():
        assert batch.get(k) == v, f"window {k}: stream={v} batch={batch.get(k)}"
    # and the bulk of windows must have been emitted (watermark holds back
    # only the trailing hour)
    assert len(emitted) >= len(batch) - len({u for _, u in batch}) - 5


def test_session_windows_match_batch_sessionize(spark, staged):
    base, src, ev = staged
    from samsa_spark.operators.advanced import sessionize
    from samsa_spark.streaming.examples import session_windows
    from samsa_spark.streaming.sources import file_stream

    out_dir = os.path.join(base, "sess-out")
    chk = os.path.join(base, "sess-chk")
    sw = session_windows(file_stream(spark, src, ev.schema))

    def _append(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        sw.writeStream.foreachBatch(_append)
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = {
        (r.user_id, r.session_start_us): r.n_events
        for r in spark.read.parquet(out_dir).collect()
    }
    assert emitted, "no sessions emitted"
    batch = {
        (r.user_id, r.session_start_us): r.n_events
        for r in sessionize(ev, gap_minutes=30).collect()
    }
    # every emitted (closed) session must match the batch sessionizer exactly
    for k, v in emitted.items():
        assert batch.get(k) == v, f"session {k}: stream={v} batch={batch.get(k)}"
    # and the stream must emit the bulk of sessions (watermark holds back
    # only each key's trailing session)
    assert len(emitted) >= len(batch) * 0.8


def test_enrich_stream_matches_batch_d9(spark):
    """Stream-static broadcast enrichment == batch D9 over the same log,
    and the streaming plan broadcasts the dim (fact side never shuffles)."""
    import tempfile

    import pyspark.sql.functions as F

    from samsa_spark import tables
    from samsa_spark.streaming.examples import enrich_stream
    from samsa_spark.streaming.sources import file_stream

    base = tempfile.mkdtemp(prefix="samsa-enrich-")
    ev = tables.load(spark, SF_SMALL, "events").select(
        "user_id", "event_id", "ts_us", "event_type", "value"
    )
    cust = tables.load(spark, SF_SMALL, "customer")
    src = os.path.join(base, "src")
    ev.repartition(4).write.parquet(src)
    out_dir = os.path.join(base, "out")

    q = (
        enrich_stream(file_stream(spark, src, ev.schema, 2), cust)
        .writeStream.foreachBatch(lambda b, i: b.write.mode("append").parquet(out_dir))
        .option("checkpointLocation", os.path.join(base, "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {tuple(r) for r in spark.read.parquet(out_dir).collect()}
    dim = cust.select(F.col("c_custkey").alias("user_id"), "c_name", "c_nationkey")
    want = {
        tuple(r)
        for r in ev.join(F.broadcast(dim), "user_id", "left")
        .select("user_id", "event_id", "ts_us", "event_type", "value", "c_name", "c_nationkey")
        .collect()
    }
    assert got == want and len(got) > 0
    shutil.rmtree(base, ignore_errors=True)


def test_st7_streaming_sessions_oracle(spark):
    """The native session_window append path: sentinel-flushed emission
    over the multi-trigger backlog equals the batch gap sessionization
    (checked against the DuckDB twin at sf0.001)."""
    from tests.conftest import SF_SMALL
    from tests.oracle import check_query

    ok, msg = check_query(spark, "st7_streaming_sessions", SF_SMALL)
    assert ok, msg
