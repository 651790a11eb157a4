"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (D2 last-write-wins state compaction — the
semantic samsa exists to provide, reference samsa/kafka/storage.py:190-219)
at sf0.001. ``queries``/``oracle_sql`` expose every implemented operator from
SURVEY.md §2 via samsa_spark.registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from samsa_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: latest-value-per-key state table over the events log."""
    return registry.queries()["d2_state_table"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
