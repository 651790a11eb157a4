"""SQL catalog surface + UDTF."""

from __future__ import annotations

from tests.conftest import SF_SMALL
from tests.oracle import check_query


def test_sql1_oracle(spark):
    ok, msg = check_query(spark, "sql1_revenue_by_segment", SF_SMALL)
    assert ok, msg


def test_udtf_ngrams_counts(spark):
    """UDTF 3-gram counts must equal size(toks)-2 per document."""
    import pyspark.sql.functions as F

    from samsa_spark import registry, tables

    got = {
        r.doc_id: r.n_ngrams
        for r in registry.queries()["udtf1_ngram_counts"](spark, SF_SMALL).collect()
    }
    docs = tables.load(spark, SF_SMALL, "documents")
    want = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", (F.size(F.split("text", " ")) - 2).alias("n")
        ).collect()
        if r.n > 0
    }
    assert got == want
