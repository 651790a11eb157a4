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
]


@pytest.mark.parametrize("name", ADV_QUERIES)
def test_oracle_match(spark, name):
    ok, msg = check_query(spark, name, SF_SMALL)
    assert ok, msg
