"""Advanced relational operators vs DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from tests.oracle import check_query

ADV_QUERIES = [
    "as1_asof_join",
    "ses1_sessionize",
    "ro1_rollup_revenue",
    "pv1_pivot_event_counts",
    "da1_distinct_aggregates",
    "gf1_gap_fill",
]


@pytest.mark.parametrize("name", ADV_QUERIES)
def test_oracle_match(spark, name):
    ok, msg = check_query(spark, name, SF_SMALL)
    assert ok, msg


def test_as2_cogrouped_oracle(spark):
    ok, msg = check_query(spark, "as2_asof_cogrouped", SF_SMALL)
    assert ok, msg


def test_as2_equals_as1(spark):
    """Two as-of implementations (join+reduce vs cogrouped merge_asof) must
    agree row for row."""
    from samsa_spark import registry

    qs = registry.all_queries()
    a1 = {tuple(r) for r in qs["as1_asof_join"](spark, SF_SMALL).collect()}
    a2 = {tuple(r) for r in qs["as2_asof_cogrouped"](spark, SF_SMALL).collect()}
    assert a1 == a2


def test_gap_fill_planted_gaps(spark):
    """gf1 on a constructed series: missing buckets appear with gap=True
    and carry the last observed value forward; leading buckets before the
    first observation never exist (grid starts at the key's first bucket);
    within-bucket latest-event-wins matches D2's tie-break."""
    from samsa_spark.operators.advanced import gap_fill

    B = 1_000_000  # 1-second buckets for the test
    rows = [
        # user 1: buckets 0, 3 observed -> 1, 2 are gaps carrying value 10.0
        (1, 0, 1, "a", 10.0),
        (1, 3 * B, 2, "a", 40.0),
        # user 1, bucket 3 has a second, LATER event -> 40.0 loses to 41.0
        (1, 3 * B + 5, 3, "a", 41.0),
        # user 2: single bucket, no gaps
        (2, 7 * B, 4, "a", 70.0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts_us long, event_id long, event_type string, value double"
    )
    got = {
        (r.user_id, r.bucket): (r.n_events, r.filled_value, r.gap)
        for r in gap_fill(ev, bucket_us=B).collect()
    }
    assert got == {
        (1, 0): (1, 10.0, False),
        (1, 1): (0, 10.0, True),
        (1, 2): (0, 10.0, True),
        (1, 3): (2, 41.0, False),
        (2, 7): (1, 70.0, False),
    }
