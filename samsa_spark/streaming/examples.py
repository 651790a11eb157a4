"""Canonical example apps on the streaming core.

1. Change detector — the reference README's walk-through (README.md:32-52):
   consume keyed status messages, compare each against the stored previous
   value, act only on change. (The reference version cannot actually run:
   it instantiates ``PersistentConsumer``, a class that doesn't exist —
   README.md:33 vs samsa/__init__.py:4. This one runs.)

2. Windowed change counts — the D10 semantics in streaming form: event-time
   tumbling windows with a watermark for late data.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import StructType


def change_detector(
    stream_df: DataFrame,
    key_col: str = "user_id",
    order_cols: Sequence[str] = ("ts_us", "event_id"),
    status_col: str = "event_type",
) -> DataFrame:
    """Emit one row per observed status *transition* per key: (key, order...,
    prev_status, new_status). State is the latest (order, status) per key —
    exactly the query/save loop of reference README.md:47-52, but batched:
    rows fold in log order inside each trigger, so intra-batch transitions
    are all observed (matching the reference's per-message loop).
    """
    import pandas as pd

    ocols = list(order_cols)
    fields = {f.name: f.dataType.simpleString() for f in stream_df.schema.fields}
    state_schema = StructType.fromDDL(
        ", ".join(f"{c} {fields[c]}" for c in (*ocols, status_col))
    )
    out_schema = StructType.fromDDL(
        ", ".join(
            [f"{key_col} {fields[key_col]}"]
            + [f"{c} {fields[c]}" for c in ocols]
            + [f"prev_status {fields[status_col]}", f"new_status {fields[status_col]}"]
        )
    )
    n_order = len(ocols)

    def fold(key, pdfs, state):
        prior = tuple(state.get) if state.exists else None
        out_rows = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(ocols, kind="mergesort")
            for row in pdf.itertuples(index=False):
                r = row._asdict()
                cand = tuple(r[c] for c in ocols) + (r[status_col],)
                if prior is not None and cand[:n_order] <= prior[:n_order]:
                    continue  # late/duplicate message: log order already past it
                if prior is not None and prior[n_order] != r[status_col]:
                    out_rows.append(
                        {key_col: key[0], **{c: r[c] for c in ocols},
                         "prev_status": prior[n_order], "new_status": r[status_col]}
                    )
                prior = cand
        if prior is not None:
            state.update(prior)
        if not out_rows:
            return iter(())
        return iter([pd.DataFrame(out_rows)])

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_change_counts(stream_df: DataFrame, ts_us_col: str = "ts_us", late: str = "1 hour") -> DataFrame:
    """D10 streaming form: tumbling 1-hour event-time windows of event counts
    per key, with a watermark bounding state for late data. Append mode emits
    a window only once the watermark passes it — exactly-once aggregates
    downstream.

    Event time is built from the epoch-microsecond column (watermarks
    require TIMESTAMP, not TIMESTAMP_NTZ), and windows are reported as epoch
    micros so results don't depend on the session timezone.
    """
    withtime = stream_df.withColumn("_event_time", F.timestamp_micros(F.col(ts_us_col)))
    return (
        withtime.withWatermark("_event_time", late)
        .groupBy(F.window(F.col("_event_time"), "1 hour").alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "user_id",
            "n_events",
        )
    )


def enrich_stream(stream_df: DataFrame, dim_df: DataFrame) -> DataFrame:
    """Stream-static enrichment (the streaming twin of batch D9): each
    event joined to a broadcast dimension. The static side is re-read per
    micro-batch by the engine (picking up dim updates between triggers) and
    broadcast, so the unbounded fact stream never shuffles — the same plan
    discipline as the batch enrich.
    """
    dim = F.broadcast(
        dim_df.select(
            F.col("c_custkey").alias("user_id"), "c_name", "c_nationkey"
        )
    )
    return stream_df.join(dim, "user_id", "left").select(
        "user_id", "event_id", "ts_us", "event_type", "value", "c_name", "c_nationkey"
    )


def session_windows(stream_df: DataFrame, ts_us_col: str = "ts_us", gap: str = "30 minutes") -> DataFrame:
    """Session-window streaming aggregation: events within a 30-minute gap
    merge into one session per key (the streaming twin of the batch
    gaps-and-islands sessionizer, operators/advanced.py::sessionize).
    Spark maintains and merges session state per key; the watermark closes
    sessions and bounds state.
    """
    withtime = stream_df.withColumn("_event_time", F.timestamp_micros(F.col(ts_us_col)))
    return (
        withtime.withWatermark("_event_time", gap)
        .groupBy(F.session_window(F.col("_event_time"), gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), F.min(ts_us_col).alias("session_start_us"))
        .select(
            "user_id",
            "session_start_us",
            F.unix_micros(F.col("w.end")).alias("window_end_us"),
            "n_events",
        )
    )
