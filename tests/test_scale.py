"""Scale/skew operators vs DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from tests.oracle import check_query

SCALE_QUERIES = [
    "d2s_salted_compaction",
    "pc1_percentiles",
    "hist1_doc_lengths",
    "arr1_vector_stats",
]


@pytest.mark.parametrize("name", SCALE_QUERIES)
def test_oracle_match(spark, name):
    ok, msg = check_query(spark, name, SF_SMALL)
    assert ok, msg
