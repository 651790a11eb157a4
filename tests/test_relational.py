"""Relational surface vs DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from tests.oracle import check_query

REL_QUERIES = [
    "h1_pricing_summary",
    "h3_top_orders",
    "h5_nation_revenue",
    "w1_segment_top_orders",
    "w2_customer_order_flow",
    "set1_customers_without_orders",
    "set2_active_nations",
    "j2_order_priority_stats",
    "x5_json_props_stats",
    "fn1_scalar_functions",
]


@pytest.mark.parametrize("name", REL_QUERIES)
def test_oracle_match(spark, name):
    ok, msg = check_query(spark, name, SF_SMALL)
    assert ok, msg


@pytest.mark.parametrize(
    "name",
    ["j3_anti_join", "cu1_cube_order_stats", "fn2_null_semantics", "tm1_time_extraction"],
)
def test_oracle_match_extra(spark, name):
    ok, msg = check_query(spark, name, SF_SMALL)
    assert ok, msg


def test_ag1_oracle(spark):
    ok, msg = check_query(spark, "ag1_event_sequences", SF_SMALL)
    assert ok, msg
