"""D1-D10: the batch/relational decomposition of samsa's state-store semantics.

samsa maintains a latest-value-per-key table by applying keyed messages in log
order (reference samsa/kafka/storage.py:190-206 ``save``; recovery replays the
changelog last-writer-wins, storage.py:151-184). Each function here is the
exact batch equivalent of one of those semantics over the ``events`` log
(key = ``user_id``, payload = ``(event_type, value, props)``, arrival order =
``(ts_us, event_id)`` — FIXTURES.md §1).

Scale posture (100 TB): compaction uses a single hash aggregate with
``max_by(payload, order_struct)`` — partial (map-side) + final aggregation,
no global sort, no window-materialized full rows. ``row_number`` over a
window would sort every partition; ``max_by`` ships one candidate row per
key per map task. Lookups filter on the grouping key *before* the aggregate
(Catalyst pushes the predicate through the groupBy), so a point lookup scans
only matching parquet row groups instead of aggregating the world.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

# Payload + ordering columns of the events log (FIXTURES.md §1).
ORDER_COLS = ("ts_us", "event_id")
PAYLOAD_COLS = ("event_type", "value", "props")


def compact_latest(
    events: DataFrame,
    keys: Sequence[str] = ("user_id",),
    order_cols: Sequence[str] = ORDER_COLS,
    payload_cols: Sequence[str] | None = None,
) -> DataFrame:
    """D2 — last-write-wins compaction: the "current state table".

    Replays every ``save(key, value)`` (reference storage.py:190-206): the
    result holds, per key, the payload of the maximal ``(ts_us, event_id)``
    row — exactly what samsa's SQLite/RocksDB table contains after consuming
    the whole log. Output columns are ``last_<col>`` for order + payload.
    """
    if payload_cols is None:
        payload_cols = [c for c in PAYLOAD_COLS if c in events.columns]
    picked = (*order_cols, *payload_cols)
    return (
        events.groupBy(*keys)
        .agg(F.max_by(F.struct(*picked), F.struct(*order_cols)).alias("_l"))
        .select(
            *keys,
            *[F.col(f"_l.{c}").alias(f"last_{c}") for c in picked],
        )
    )


def replay_prefix(events: DataFrame) -> DataFrame:
    """D3 — changelog replay to an offset: state after the first half of the log.

    Mirrors recovery (reference storage.py:151-184), which rebuilds state by
    replaying the changelog from ``earliest`` up to whatever was produced;
    replaying a *prefix* (offset <= max/2) is the checkable batch form. The
    threshold is a broadcast 1-row scalar, not a driver-side collect.
    """
    thr = events.agg(F.expr("max(event_id) div 2").alias("_thr"))
    prefix = events.crossJoin(F.broadcast(thr)).where(F.col("event_id") <= F.col("_thr")).drop("_thr")
    return compact_latest(prefix)


def point_lookup(events: DataFrame, key: int) -> DataFrame:
    """D4 — ``query(key)`` (reference storage.py:208-219): value for one key.

    Filter-before-aggregate: Catalyst pushes ``user_id = key`` below the
    groupBy and into the parquet scan, so this touches one key's rows only.
    """
    return compact_latest(events.where(F.col("user_id") == F.lit(key)))


def detect_changes(events: DataFrame) -> DataFrame:
    """D5 — change detection: rows whose event_type differs from the key's previous row.

    The README's motivating loop (reference README.md:47-52) compares each
    message's status against the stored previous value and acts only on
    change; ``lag`` over the per-key log order is the relational form.
    """
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        events.withColumn("prev_event_type", F.lag("event_type").over(w))
        .where(F.col("prev_event_type").isNotNull() & (F.col("prev_event_type") != F.col("event_type")))
        .select("user_id", "event_id", "ts_us", "prev_event_type", "event_type")
    )


def upsert_merge(state: DataFrame, updates: DataFrame, keys: Sequence[str] = ("user_id",)) -> DataFrame:
    """D6 — apply a batch of new messages onto an existing state table.

    ``save`` over an existing store (reference storage.py:190-206): per key,
    the winner is whichever side carries the larger ``(last_ts_us,
    last_event_id)`` — the same last-writer-wins rule the changelog replay
    applies (storage.py:175-183). ``state`` and the compacted ``updates``
    have identical schemas (output of :func:`compact_latest`).
    """
    upd = compact_latest(updates, keys)
    value_cols = [c for c in upd.columns if c not in keys]
    s, u = state.alias("s"), upd.alias("u")
    cond = [F.col(f"s.{k}").eqNullSafe(F.col(f"u.{k}")) for k in keys]
    merged = s.join(u, cond, "full_outer")
    take_new = F.col("u.last_event_id").isNotNull() & (
        F.col("s.last_event_id").isNull()
        | (
            F.struct(F.col("u.last_ts_us"), F.col("u.last_event_id"))
            >= F.struct(F.col("s.last_ts_us"), F.col("s.last_event_id"))
        )
    )
    return merged.select(
        *[F.coalesce(F.col(f"u.{k}"), F.col(f"s.{k}")).alias(k) for k in keys],
        *[F.when(take_new, F.col(f"u.{c}")).otherwise(F.col(f"s.{c}")).alias(c) for c in value_cols],
    )


def split_merge(events: DataFrame) -> DataFrame:
    """D6 driver form: compact the first half of the log into a state table,
    then merge the second half onto it — must equal :func:`compact_latest`
    over the whole log (the recovery-then-catch-up path, storage.py:100-122).
    """
    thr = events.agg(F.expr("max(event_id) div 2").alias("_thr"))
    tagged = events.crossJoin(F.broadcast(thr))
    base = compact_latest(tagged.where(F.col("event_id") <= F.col("_thr")).drop("_thr"))
    updates = tagged.where(F.col("event_id") > F.col("_thr")).drop("_thr")
    return upsert_merge(base, updates)


def apply_tombstones(events: DataFrame, tombstone_type: str = "error") -> DataFrame:
    """D7 — tombstone application: a key whose *latest* event is a tombstone
    is absent from the state table (reference ``RocksDBClient.delete``,
    samsa/db/rocksdb.py:75-85; deletes-by-marker is the log-structured form).
    """
    return compact_latest(events).where(F.col("last_event_type") != F.lit(tombstone_type))


def key_stats(events: DataFrame) -> DataFrame:
    """D8 — per-key store statistics (operational introspection of the state
    store samsa offers no API for; counts/extents per key).

    Doubles are summed as DECIMAL so partial/final aggregation order cannot
    change the result (exact, engine-portable), then surfaced as double.
    """
    out = events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("event_type").alias("n_event_types"),
        F.min("ts_us").alias("first_ts_us"),
        F.max("ts_us").alias("last_ts_us"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )
    return out.withColumn("avg_value", F.col("sum_value") / F.col("n_events"))


def enrich(events: DataFrame, customer: DataFrame) -> DataFrame:
    """D9 — stream-table join: enrich each message with the current state of a
    dimension (the README pattern generalized — message + prior state,
    reference README.md:47). The dimension is broadcast: at 100 TB of events
    a shuffle of the fact side on user_id is never needed for a small dim.
    """
    dim = F.broadcast(customer.select("c_custkey", "c_name", "c_mktsegment", "c_acctbal"))
    return events.join(dim, events.user_id == dim.c_custkey).select(
        "event_id", "user_id", "event_type", "value", "c_name", "c_mktsegment", "c_acctbal"
    )


def windowed_changes(events: DataFrame) -> DataFrame:
    """D10 — change counts per key per hour bucket (change detection D5
    aggregated into time windows). Bucket = epoch-hour as BIGINT: timezone-
    free and identical arithmetic on both engines.
    """
    return (
        detect_changes(events)
        .groupBy(
            F.expr("ts_us div 3600000000").alias("hour_bucket"),
            F.col("user_id"),
        )
        .agg(F.count("*").alias("n_changes"))
    )


def scd2_history(events: DataFrame) -> DataFrame:
    """scd1 — the SCD Type-2 temporal view of the state table: per key, one
    row per distinct consecutive ``event_type`` version with its validity
    interval ``(user_id, state_value, valid_from_us, valid_to_us,
    is_current)`` — ``valid_to_us`` NULL on the open (current) version.
    The warehouse "history table" answering `what was key X's state AT
    time T` — the time-travel complement of D2's `state NOW` compaction
    and D3's `replay to T` (which answers one T per scan; the history
    table answers all T with one interval lookup). Reference parity note:
    samsa's store keeps only the latest value per key (storage.py:175-183
    last-writer-wins); this derives the full version history the log
    already implies.

    Plan: D5's change-detection lag (keep rows starting a new version,
    including each key's first) then a lead over the surviving version
    rows for the interval close. Both windows share the ``user_id``
    partitioning — one exchange, the second window only re-sorts the
    pruned version rows. Embarrassingly parallel per key at 100 TB; no
    driver-side anything.
    """
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    versions = (
        events.withColumn("prev_event_type", F.lag("event_type").over(w))
        .where(
            F.col("prev_event_type").isNull()
            | (F.col("prev_event_type") != F.col("event_type"))
        )
        .select("user_id", "event_type", "ts_us", "event_id")
    )
    return (
        versions.withColumn("valid_to_us", F.lead("ts_us").over(w))
        .select(
            "user_id",
            F.col("event_type").alias("state_value"),
            F.col("ts_us").alias("valid_from_us"),
            "valid_to_us",
            F.col("valid_to_us").isNull().alias("is_current"),
        )
    )


# --- DuckDB oracle SQL (driver correctness gate) ---------------------------
# The oracle reads the same parquet (ts truncated to microseconds by DuckDB),
# so epoch_us(ts) == our ts_us and all ordering matches at us + event_id.

_D2_SQL = """
WITH r AS (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, epoch_us(ts) AS last_ts_us, event_id AS last_event_id,
       event_type AS last_event_type, value AS last_value, props AS last_props
FROM r WHERE rn = 1
"""

ORACLE_SQL: dict[str, str] = {
    "d1_scan": """
        SELECT event_id, user_id, event_type, value
        FROM events WHERE event_type = 'purchase' AND value > 100.0
    """,
    "d2_state_table": _D2_SQL,
    "d3_replay_prefix": """
WITH pre AS (
  SELECT * FROM events WHERE event_id <= (SELECT max(event_id) // 2 FROM events)
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM pre
)
SELECT user_id, epoch_us(ts) AS last_ts_us, event_id AS last_event_id,
       event_type AS last_event_type, value AS last_value, props AS last_props
FROM r WHERE rn = 1
    """,
    "d4_point_lookup": f"SELECT * FROM ({_D2_SQL}) WHERE user_id = 7",
    "d5_changes": """
WITH l AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_event_type
  FROM events
)
SELECT user_id, event_id, ts_us, prev_event_type, event_type
FROM l WHERE prev_event_type IS NOT NULL AND prev_event_type <> event_type
    """,
    # Merging half the log onto the compacted other half must equal full compaction.
    "d6_upsert_merge": _D2_SQL,
    "d7_tombstones": f"SELECT * FROM ({_D2_SQL}) WHERE last_event_type <> 'error'",
    "d8_key_stats": """
SELECT user_id, count(*) AS n_events, count(DISTINCT event_type) AS n_event_types,
       min(epoch_us(ts)) AS first_ts_us, max(epoch_us(ts)) AS last_ts_us,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
FROM events GROUP BY user_id
    """,
    "d9_enrich": """
SELECT event_id, user_id, event_type, value, c_name, c_mktsegment, c_acctbal
FROM events JOIN customer ON user_id = c_custkey
    """,
    "d10_windowed_changes": """
WITH l AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_event_type
  FROM events
), c AS (
  SELECT * FROM l WHERE prev_event_type IS NOT NULL AND prev_event_type <> event_type
)
SELECT ts_us // 3600000000 AS hour_bucket, user_id, count(*) AS n_changes
FROM c GROUP BY 1, 2
    """,
    "scd1_state_history": """
WITH l AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
  FROM events
), v AS (
  SELECT user_id, event_type, ts_us, event_id
  FROM l WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type AS state_value, ts_us AS valid_from_us,
       lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to_us,
       lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL AS is_current
FROM v
    """,
}
