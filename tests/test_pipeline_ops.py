"""Training-pipeline operators vs DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from tests.oracle import check_query

PIPE_QUERIES = [
    "vec1_label_centroids",
    "tf1_tfidf_top_terms",
    "sp1_deterministic_split",
    "pk1_pack_sequences",
]


@pytest.mark.parametrize("name", PIPE_QUERIES)
def test_oracle_match(spark, name):
    ok, msg = check_query(spark, name, SF_SMALL)
    assert ok, msg
