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


def test_custom_group_agg_matches_builtin(spark):
    """applyInPandas least-squares slope ~= built-in regr_slope."""
    from samsa_spark import tables
    from samsa_spark.operators.advanced import user_value_trends
    from samsa_spark.operators.pipeline_ops import user_trend_custom

    ev = tables.load(spark, SF_SMALL, "events")
    custom = {r.user_id: r.slope for r in user_trend_custom(ev).collect()}
    builtin = {r.user_id: r.slope for r in user_value_trends(ev).collect()}
    assert set(custom) == set(builtin)
    for u, s in builtin.items():
        assert abs(custom[u] - s) < 1e-4, f"user {u}: custom={custom[u]} builtin={s}"


@pytest.mark.parametrize("name", ["sm1_stratified_sample", "nt1_equidepth_histogram"])
def test_oracle_match_sampling(spark, name):
    ok, msg = check_query(spark, name, SF_SMALL)
    assert ok, msg
