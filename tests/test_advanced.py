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
