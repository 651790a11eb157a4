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


def test_scd1_oracle_match(spark):
    ok, msg = check_query(spark, "scd1_state_history", SF_SMALL)
    assert ok, msg


def test_scd1_intervals_partition_each_keys_timeline(spark):
    """SCD2 invariants on the real log: per key exactly one open (current)
    version; intervals chain (valid_to == next valid_from) with no gaps or
    overlaps; consecutive versions differ; and the interval lookup at the
    log's max ts reproduces D2's state-NOW value for every key."""
    from samsa_spark import tables
    from samsa_spark.operators.state import compact_latest, scd2_history

    events = tables.load(spark, SF_SMALL, "events")
    hist = scd2_history(events).collect()
    by_key: dict[int, list] = {}
    for r in hist:
        by_key.setdefault(r.user_id, []).append(r)
    now = {r.user_id: r.last_event_type for r in compact_latest(events).collect()}
    assert set(by_key) == set(now)
    for uid, rows in by_key.items():
        rows.sort(key=lambda r: r.valid_from_us)
        assert [r.is_current for r in rows] == [False] * (len(rows) - 1) + [True]
        assert rows[-1].valid_to_us is None
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to_us == b.valid_from_us
            assert a.state_value != b.state_value
        # state AT the end of time == the open interval == D2's compaction
        assert rows[-1].state_value == now[uid]
