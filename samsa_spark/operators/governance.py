"""Data-governance operators: declarative quality-constraint checking
(dq1, the Deequ/Great-Expectations stage every production ingest runs
before data reaches training) and snapshot diffing (df1, the
crawl-over-crawl change audit). The reference engine has no governance
surface at all (SURVEY.md §2.3 absence list); both operators are pure
DataFrame algebra with exact DuckDB oracles.

Scale shapes: every dq1 constraint is either one algebraic aggregate over
a narrow projection (completeness/range/uniqueness collapse map-side) or
one equi-join at key cardinality (referential integrity) — never a full
materialization of violating rows; the report is constraints-cardinality.
df1 prunes both snapshots to (key, content-sha) in the scan projection and
makes one full-outer equi-join on the key — text never shuffles, and the
status classification is row-local on the joined frame.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from samsa_spark import tables


def constraint_report(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    documents: DataFrame,
) -> DataFrame:
    """dq1 — declarative data-quality constraint battery over the warehouse
    tables, one row per constraint: ``(constraint, n_checked,
    n_violations, passed)``.

    Constraints (the standard Deequ families, one representative each):

    - ``customer.c_custkey is unique``          (uniqueness)
    - ``orders.o_custkey references customer``  (referential integrity)
    - ``orders.o_totalprice > 0``               (range)
    - ``lineitem.l_quantity in [1, 50]``        (range, TPC-H's own bound)
    - ``lineitem.l_discount in [0, 1]``         (range)
    - ``documents.text is non-empty``           (completeness)

    Each check is one aggregate over a narrow projection; the referential
    check joins key-distinct sides only (broadcast-or-degrade like every
    dim join here). The fixture data satisfies all six — the oracle still
    locks the full counting algebra, and the planted-violation pytest
    drives every failure path.
    """
    uniq = customer.groupBy("c_custkey").agg(F.count("*").alias("c")).agg(
        F.count("*").alias("n_checked"),
        F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).cast("bigint").alias("n_violations"),
    )
    refi = (
        orders.select("o_custkey")
        .join(
            customer.select(F.col("c_custkey").alias("o_custkey")).distinct(),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count("*").cast("bigint").alias("n_violations"))
        .crossJoin(orders.agg(F.count("*").alias("n_checked")))
        .select("n_checked", "n_violations")
    )

    def _range(df: DataFrame, cond: F.Column) -> DataFrame:
        return df.agg(
            F.count("*").alias("n_checked"),
            F.sum(F.when(~cond, 1).otherwise(0)).cast("bigint").alias("n_violations"),
        )

    price = _range(orders.select("o_totalprice"), F.col("o_totalprice") > 0)
    qty = _range(
        lineitem.select("l_quantity"),
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 50),
    )
    disc = _range(
        lineitem.select("l_discount"),
        (F.col("l_discount") >= 0) & (F.col("l_discount") <= 1),
    )
    compl = _range(
        documents.select("text"),
        F.col("text").isNotNull() & (F.length("text") > 0),
    )

    parts = [
        ("customer.c_custkey is unique", uniq),
        ("orders.o_custkey references customer", refi),
        ("orders.o_totalprice > 0", price),
        ("lineitem.l_quantity in [1, 50]", qty),
        ("lineitem.l_discount in [0, 1]", disc),
        ("documents.text is non-empty", compl),
    ]
    out = None
    for name, df in parts:
        row = df.select(
            F.lit(name).alias("constraint"),
            F.col("n_checked").cast("bigint").alias("n_checked"),
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )
        out = row if out is None else out.unionByName(row)
    return out


_DQ1_SQL = """
SELECT 'customer.c_custkey is unique' AS constraint,
       CAST(count(*) AS BIGINT) AS n_checked,
       CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
       sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) = 0 AS passed
FROM (SELECT c_custkey, count(*) AS c FROM customer GROUP BY c_custkey)
UNION ALL
SELECT 'orders.o_custkey references customer',
       (SELECT CAST(count(*) AS BIGINT) FROM orders),
       CAST(count(*) AS BIGINT),
       count(*) = 0
FROM orders o WHERE NOT EXISTS
  (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'orders.o_totalprice > 0',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END) AS BIGINT),
       sum(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END) = 0
FROM orders
UNION ALL
SELECT 'lineitem.l_quantity in [1, 50]',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN NOT (l_quantity >= 1 AND l_quantity <= 50) THEN 1 ELSE 0 END) AS BIGINT),
       sum(CASE WHEN NOT (l_quantity >= 1 AND l_quantity <= 50) THEN 1 ELSE 0 END) = 0
FROM lineitem
UNION ALL
SELECT 'lineitem.l_discount in [0, 1]',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN NOT (l_discount >= 0 AND l_discount <= 1) THEN 1 ELSE 0 END) AS BIGINT),
       sum(CASE WHEN NOT (l_discount >= 0 AND l_discount <= 1) THEN 1 ELSE 0 END) = 0
FROM lineitem
UNION ALL
SELECT 'documents.text is non-empty',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN NOT (text IS NOT NULL AND length(text) > 0) THEN 1 ELSE 0 END) AS BIGINT),
       sum(CASE WHEN NOT (text IS NOT NULL AND length(text) > 0) THEN 1 ELSE 0 END) = 0
FROM documents
"""


def k_anonymity_violations(
    df: DataFrame, quasi: list[str], k: int = 5
) -> DataFrame:
    """ka1 — k-anonymity audit (Sweeney 2002, the ARX/privacy-tooling
    check): group the table by its quasi-identifier columns and return
    every equivalence class smaller than ``k`` with its size —
    ``(*quasi, class_size)``. Rows in these classes are re-identifiable
    within fewer than ``k`` candidates; the output is exactly the worklist
    a suppression/generalization pass consumes. The privacy gate a
    training-data pipeline runs beside dq1's quality battery before data
    leaves governance.

    One hash aggregate over the quasi projection (map-side partials
    collapse classes), one filter; output is bounded by the class count —
    never a row-level materialization. The k threshold is a DOMAIN
    constant (an absolute anonymity-set floor is the semantics, unlike
    note-29 support thresholds), but the report is parity-checked at three
    scales like every oracle so a scale-dependent emptiness would surface
    in the sweep.
    """
    return (
        df.groupBy(*quasi)
        .agg(F.count("*").alias("class_size"))
        .where(F.col("class_size") < k)
        .orderBy(F.asc("class_size"), *[F.asc(c) for c in quasi])
    )


# Registered form: customers quasi-identified by (nation, market segment,
# 500-unit account-balance band) — the classic "region x attribute x
# binned numeric" QI shape. floor() on a DOUBLE band agrees across engines
# (negative balances floor toward -inf on both).
def _ka1_query(spark: SparkSession, sf: str) -> DataFrame:
    cust = tables.load(spark, sf, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.lit(500.0)).alias("bal_band"),
    )
    return k_anonymity_violations(
        cust, ["c_nationkey", "c_mktsegment", "bal_band"], k=5
    )


_KA1_SQL = """
WITH c AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 500.0) AS BIGINT) AS bal_band
  FROM customer
), g AS (
  SELECT c_nationkey, c_mktsegment, bal_band,
         CAST(count(*) AS BIGINT) AS class_size
  FROM c GROUP BY c_nationkey, c_mktsegment, bal_band
)
SELECT * FROM g WHERE class_size < 5
ORDER BY class_size ASC, c_nationkey ASC, c_mktsegment ASC, bal_band ASC
"""


DP1_EPSILON = 1.0
_DP_MOD = 1_000_003  # pipeline_ops._SPLIT_MOD — the repo's portable-hash modulus


def dp_noisy_counts(
    customer: DataFrame, eps: float = DP1_EPSILON
) -> DataFrame:
    """dp1 — Laplace-mechanism noisy group counts (the differential-privacy
    release stage beside ka1's re-identification audit): per-nation
    customer counts plus Laplace(1/eps) noise, sensitivity 1 for a count.
    Noise comes from the inverse CDF ``-b·sign(u−½)·ln(1−2|u−½|)`` over a
    SEEDED hash-uniform ``u`` per group key — deterministic so both
    engines, any partitioning, and a retry release the identical value
    (the same practice DP libraries use for reproducible runs; production
    swaps the seed source for real entropy, which changes no code shape).
    The true count never appears in the output. Returns
    ``(c_nationkey, noisy_count)`` rounded to 6 dp.

    One map-side-collapsing hash aggregate + a row-local noise
    expression; the clamp (``greatest(…, 1e-12)``) guards the measure-zero
    ``u = ½`` point where the inverse CDF pole would produce ±inf.
    """
    mixed = F.expr("((c_nationkey >> 31) ^ c_nationkey) & 2147483647")
    h = (mixed * F.lit(2654435761)) % F.lit(_DP_MOD)
    u = (h + 1) / F.lit(float(_DP_MOD + 1))
    b = 1.0 / float(eps)
    noise = (
        -F.lit(b)
        * F.signum(u - 0.5)
        * F.log(F.greatest(F.lit(1.0) - 2.0 * F.abs(u - 0.5), F.lit(1e-12)))
    )
    return (
        customer.groupBy("c_nationkey")
        .agg(F.count("*").alias("cnt"))
        .select(
            "c_nationkey",
            F.round(F.col("cnt") + noise, 6).alias("noisy_count"),
        )
    )


_DP1_SQL = f"""
WITH g AS (
  SELECT c_nationkey, count(*) AS cnt FROM customer GROUP BY c_nationkey
),
n AS (
  SELECT c_nationkey, cnt,
         ((xor(c_nationkey >> 31, c_nationkey) & 2147483647) * 2654435761) % {_DP_MOD} AS h
  FROM g
),
u AS (SELECT c_nationkey, cnt, (h + 1) / {float(_DP_MOD + 1)!r} AS u FROM n)
SELECT c_nationkey,
       round(cnt + (-1.0 * sign(u - 0.5) * ln(greatest(1.0 - 2.0 * abs(u - 0.5), 1e-12))), 6)
         AS noisy_count
FROM u
"""


def snapshot_diff(new: DataFrame, old: DataFrame) -> DataFrame:
    """df1 — snapshot diff by key + content hash: per doc_id one of
    ``added`` (new only), ``removed`` (old only), ``changed`` (both, text
    differs), ``unchanged`` — the crawl-over-crawl change audit that
    decides what an incremental ingest actually reprocesses (dd10 answers
    "is this exact content already ingested ANYWHERE"; df1 answers "what
    happened to each KEY between snapshots").

    Both snapshots reduce to ``(doc_id, sha)`` in the scan projection —
    the text column never shuffles — then one full-outer equi-join on the
    key classifies row-locally. Returns ``(doc_id, status)``.
    """
    sha = F.sha2(F.col("text"), 256)
    o = old.select("doc_id", sha.alias("old_sha"))
    n = new.select("doc_id", sha.alias("new_sha"))
    return o.join(n, "doc_id", "full_outer").select(
        "doc_id",
        F.when(F.col("old_sha").isNull(), F.lit("added"))
        .when(F.col("new_sha").isNull(), F.lit("removed"))
        .when(F.col("old_sha") == F.col("new_sha"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


# The registered self-contained form derives two deterministic snapshots
# from the fixture: OLD = docs with doc_id % 5 != 0 (so % 5 == 0 keys are
# "added" in new), NEW = every doc, with docs at doc_id % 7 == 0 rewritten
# (suffix appended -> "changed") and % 11 == 3 dropped ("removed").
# Identical derivation on both engines.
def _df1_query(spark: SparkSession, sf: str) -> DataFrame:
    docs = tables.load(spark, sf, "documents").select("doc_id", "text")
    old = docs.where(F.col("doc_id") % 5 != 0)
    new = docs.where(F.col("doc_id") % 11 != 3).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return snapshot_diff(new, old)


_DF1_SQL = """
WITH old AS (
  SELECT doc_id, sha256(text) AS old_sha FROM documents WHERE doc_id % 5 != 0
), new AS (
  SELECT doc_id,
         sha256(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END) AS new_sha
  FROM documents WHERE doc_id % 11 != 3
)
SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
       CASE WHEN old_sha IS NULL THEN 'added'
            WHEN new_sha IS NULL THEN 'removed'
            WHEN old_sha = new_sha THEN 'unchanged'
            ELSE 'changed' END AS status
FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
"""


def build_queries():
    def _dq1(spark: SparkSession, sf: str) -> DataFrame:
        return constraint_report(
            tables.load(spark, sf, "customer"),
            tables.load(spark, sf, "orders"),
            tables.load(spark, sf, "lineitem"),
            tables.load(spark, sf, "documents"),
        )

    return {
        "dq1_constraint_report": (_dq1, _DQ1_SQL),
        "df1_snapshot_diff": (_df1_query, _DF1_SQL),
        "ka1_k_anonymity": (_ka1_query, _KA1_SQL),
        "dp1_noisy_counts": (
            lambda spark, sf: dp_noisy_counts(tables.load(spark, sf, "customer")),
            _DP1_SQL,
        ),
    }
