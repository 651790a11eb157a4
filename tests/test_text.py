"""Text-analysis suite vs DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from tests.oracle import check_query

TX_QUERIES = [
    "tx1_token_counts",
    "tx2_quality_scores",
    "tx3_lang_id",
    "tx4_fingerprints",
    "tx5_corpus_stats",
    "tx6_gopher_rules",
]


@pytest.mark.parametrize("name", TX_QUERIES)
def test_oracle_match(spark, name):
    ok, msg = check_query(spark, name, SF_SMALL)
    assert ok, msg
