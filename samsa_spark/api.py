"""StateTable: the imperative face of the engine — samsa's API surface
(``save`` / ``query`` / ``delete`` / context manager, reference
samsa/kafka/storage.py:17-253) backed by declarative batch operators.

A samsa user migrates mechanically:

    with StatefulConsumer(topics, group, table) as store:   # reference
        store.save(key, value); store.query(key)

    table = StateTable.from_log(events_df)                  # here
    table = table.apply(new_events_df)                      # save, batched
    table.get(7)                                            # query
    table.delete_where(...)                                 # delete
    table.to_df()                                           # the whole store

Unlike the reference — which does a synchronous SQLite commit and a
per-partition Kafka flush on every single save (storage.py:190-206,
139-149) — every mutation here is a lazy DataFrame transformation; nothing
executes until the result is consumed, and at 100 TB each ``apply`` is one
hash-aggregate + one merge join, not N round trips.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from samsa_spark.operators.state import compact_latest, upsert_merge


class StateTable:
    """Immutable handle on a latest-value-per-key state table. Mutating
    operations return new StateTables (persist/checkpoint between
    generations is the caller's scale lever)."""

    def __init__(self, df: DataFrame, keys: Sequence[str] = ("user_id",)) -> None:
        self._df = df
        self.keys = tuple(keys)

    # -- construction --------------------------------------------------------

    @classmethod
    def from_log(
        cls,
        events: DataFrame,
        keys: Sequence[str] = ("user_id",),
        order_cols: Sequence[str] = ("ts_us", "event_id"),
        payload_cols: Sequence[str] | None = None,
    ) -> StateTable:
        """Replay a message log into a state table (reference recovery,
        storage.py:151-184: replay in log order, last writer wins)."""
        return cls(compact_latest(events, keys, order_cols, payload_cols), keys)

    # -- reads ---------------------------------------------------------------

    def to_df(self) -> DataFrame:
        return self._df

    def get(self, *key_values) -> dict | None:
        """Point lookup (reference ``query``, storage.py:208-219): None on
        miss, the state row as a dict on hit. This is the one deliberately
        eager method — it is a driver-side read of one key."""
        cond = None
        for k, v in zip(self.keys, key_values):
            c = F.col(k) == F.lit(v)
            cond = c if cond is None else (cond & c)
        rows = self._df.where(cond).limit(1).collect()
        return rows[0].asDict() if rows else None

    def count(self) -> int:
        return self._df.count()

    # -- writes --------------------------------------------------------------

    def apply(self, new_events: DataFrame) -> StateTable:
        """Apply a batch of new messages (reference ``save`` over an existing
        store, storage.py:190-206): per key the larger (order) wins."""
        return StateTable(upsert_merge(self._df, new_events, self.keys), self.keys)

    def delete_where(self, condition) -> StateTable:
        """Delete matching keys (reference ``RocksDBClient.delete``,
        rocksdb.py:75-85 — which SQLite never got; here it's one filter)."""
        return StateTable(self._df.where(~condition), self.keys)

    # -- persistence ---------------------------------------------------------

    def save_as(self, path: str, bucket_col: str | None = None) -> None:
        """Materialize the state table as parquet. For repeated key-joins at
        scale pass ``bucket_col`` to lay the table out pre-hashed (64
        buckets) so downstream readers can co-locate joins without a
        shuffle."""
        w = self._df.write.mode("overwrite")
        if bucket_col is not None:
            self._df.withColumn("_bucket", F.pmod(F.hash(F.col(bucket_col)), F.lit(64))).write.mode(
                "overwrite"
            ).partitionBy("_bucket").parquet(path)
        else:
            w.parquet(path)

    @classmethod
    def load(cls, spark, path: str, keys: Sequence[str] = ("user_id",)) -> StateTable:
        return cls(spark.read.parquet(path).drop("_bucket"), keys)
