"""SQL surface: register the testdata tables as temp views and run plain
Spark SQL. The reference has no SQL at all (SURVEY.md §3 — every query is an
imperative call chain); here the whole relational surface is equally
reachable through ``spark.sql``, and Catalyst treats view-based SQL and the
DataFrame API identically (same plans, same pushdown).

Also hosts the Python UDTF example — the table-function shape of the UDF
surface (one row in, many rows out, usable in FROM/LATERAL position).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from samsa_spark import tables


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (ns-timestamp
    normalization included, so SQL sees the same ts/ts_us columns the
    DataFrame API does)."""
    for name in tables.TABLES:
        tables.load(spark, sf_dir, name).createOrReplaceTempView(name)


def sql_revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sql1 — a join+aggregate written as plain SQL against the registered
    catalog: proves the SQL entry point produces oracle-identical results
    (same decimal-sum discipline as the DataFrame queries)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderstatus <> 'F'
        GROUP BY c_mktsegment
        """
    )


def make_ngram_udtf():
    """Python UDTF emitting (pos, ngram) rows for a text + n argument —
    the lateral table-function form of shingling. Built by a factory so the
    class pickles by value (same executor-import constraint as pandas
    UDFs)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, ngram string")
    class NgramUDTF:
        def eval(self, text: str, n: int):
            if text is None:
                return
            toks = text.split(" ")
            for i in range(max(0, len(toks) - n + 1)):
                yield i, " ".join(toks[i : i + n])

    return NgramUDTF


def sql_udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """udtf1 — UDTF in lateral position: explode each document into
    3-gram rows, then aggregate. Oracle: the same shingling written as
    DuckDB list slicing over ``string_split`` (the UDTF itself has no
    DuckDB twin, but its output relation does)."""
    register_views(spark, sf_dir)
    spark.udtf.register("ngrams", make_ngram_udtf())
    return spark.sql(
        """
        SELECT d.doc_id, count(*) AS n_ngrams, min(t.ngram) AS first_ngram
        FROM documents d, LATERAL ngrams(d.text, 3) t
        GROUP BY d.doc_id
        """
    )


def build_queries():
    return {
        "sql1_revenue_by_segment": (sql_revenue_by_segment, _SQL1_SQL),
        "udtf1_ngram_counts": (sql_udtf_ngrams, _UDTF1_SQL),
    }


_UDTF1_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE text IS NOT NULL
),
g AS (
  SELECT doc_id, array_to_string(t[i:i+2], ' ') AS ngram
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i) gs
  WHERE len(t) >= 3
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ngrams, min(ngram) AS first_ngram
FROM g GROUP BY doc_id
"""

_SQL1_SQL = """
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderstatus <> 'F'
GROUP BY c_mktsegment
"""
