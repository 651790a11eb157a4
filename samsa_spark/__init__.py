"""samsa-spark: a PySpark-native engine with the capabilities of tombasche/samsa.

The reference (/root/reference, `tombasche/samsa`) is a Kafka-Streams-style
*state store*: a stateful consumer that maintains a latest-value-per-key table,
mirrors writes to changelog topics, and restores the table by replaying them
(reference samsa/kafka/storage.py:17-253). This package re-expresses those
semantics Spark-first:

- ``samsa_spark.operators.state``  — batch/relational decomposition (D1-D10):
  compaction, replay, lookup, change detection, merge, tombstones, stats,
  enrichment joins, windowed change counts.
- ``samsa_spark.operators.*``      — relational, dedup, similarity, text,
  multimodal extension operators designed for 100 TB scale.
- ``samsa_spark.streaming``        — the streaming surface proper: a
  ``StatefulStream`` built on Structured Streaming stateful processing, with
  Kafka source/sink builders and checkpoint-based recovery (replacing the
  reference's hand-rolled changelog replay, storage.py:151-184).
"""

from samsa_spark.session import get_spark
from samsa_spark.tables import load, load_all

__all__ = ["get_spark", "load", "load_all"]
__version__ = "0.1.0"
