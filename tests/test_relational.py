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


# --- w3: ntile / percent_rank / cume_dist ------------------------------------


def test_w3_oracle_match(spark):
    ok, msg = check_query(spark, "w3_rank_bands", SF_SMALL)
    assert ok, msg


def test_w3_hand_computed_distribution_ranks(spark):
    """Customer 1 has 5 urgent orders with distinct totals: ntile(4) gives
    buckets of sizes 2/1/1/1 (first n mod k buckets take the extra row),
    percent_rank = (rank-1)/4, cume = rank/5. Customer 2 has ONE urgent
    order: pct_rank must be 0 (single-row partition), cume 1, quartile 1.
    Non-urgent rows must not appear."""
    from samsa_spark.operators.relational import rank_bands

    rows = [
        (10, 1, "1-URGENT", 500.0),
        (11, 1, "1-URGENT", 400.0),
        (12, 1, "1-URGENT", 300.0),
        (13, 1, "1-URGENT", 200.0),
        (14, 1, "1-URGENT", 100.0),
        (15, 2, "1-URGENT", 50.0),
        (16, 2, "3-MEDIUM", 999.0),
    ]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderpriority string, o_totalprice double"
    )
    got = {r.o_orderkey: r for r in rank_bands(orders).collect()}
    assert 16 not in got
    assert [got[k].spend_quartile for k in (10, 11, 12, 13, 14)] == [1, 1, 2, 3, 4]
    assert [got[k].pct_rank for k in (10, 11, 12, 13, 14)] == [0.0, 0.25, 0.5, 0.75, 1.0]
    assert [got[k].cume for k in (10, 11, 12, 13, 14)] == [0.2, 0.4, 0.6, 0.8, 1.0]
    assert (got[15].spend_quartile, got[15].pct_rank, got[15].cume) == (1, 0.0, 1.0)
