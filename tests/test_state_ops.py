"""D1-D10 vs the DuckDB oracle at sf0.001 (fast) — the driver re-runs the
same comparison at sf0.01."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from tests.oracle import check_query

D_QUERIES = [
    "d1_scan",
    "d2_state_table",
    "d3_replay_prefix",
    "d4_point_lookup",
    "d5_changes",
    "d6_upsert_merge",
    "d7_tombstones",
    "d8_key_stats",
    "d9_enrich",
    "d10_windowed_changes",
]


@pytest.mark.parametrize("name", D_QUERIES)
def test_oracle_match(spark, name):
    ok, msg = check_query(spark, name, SF_SMALL)
    assert ok, msg


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) == 15  # 15 distinct users at sf0.001
    assert "last_event_type" in df.columns
