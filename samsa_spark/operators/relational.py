"""Relational operator coverage: joins, aggregations, windows, sorts/limits,
set operations, and scalar/JSON functions.

The reference has none of these (SURVEY.md §2.3 — its only predicate is a
point lookup, samsa/db/sqldb.py:75-77); this module demonstrates the
"rebuild stance: Spark built-ins" rows of that table as real, oracle-checked
queries over the TPC-H-ish tables.

Determinism across engines: every floating aggregate is summed as DECIMAL
(exact, order-independent) and surfaced as DOUBLE; averages are computed as
exact-sum / count (one IEEE division, identical on both engines); top-k
orderings always carry a unique key tie-break.

Scale posture: dimension sides of joins are broadcast; aggregates are
hash-based with map-side partials; top-k is a limit over a sorted aggregate
(Spark executes TakeOrderedAndProject — no global sort materialization).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from samsa_spark import tables


def _dec_sum(col: F.Column, alias: str, scale: str = "decimal(22,6)") -> F.Column:
    return F.sum(col.cast(scale)).cast("double").alias(alias)


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """h1 — TPC-H Q1-style pricing summary: multi-aggregate hash aggregation
    with computed measures, partial+final over the fact table."""
    cutoff = F.expr("TIMESTAMP_NTZ '2001-09-01 00:00:00'")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    out = (
        lineitem.where(F.col("l_shipdate") <= cutoff)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum(F.col("l_quantity"), "sum_qty", "decimal(18,2)"),
            _dec_sum(F.col("l_extendedprice"), "sum_base_price", "decimal(18,2)"),
            _dec_sum(disc_price, "sum_disc_price"),
            _dec_sum(charge, "sum_charge"),
            F.count("*").alias("count_order"),
        )
    )
    return out.select(
        "*",
        (F.col("sum_qty") / F.col("count_order")).alias("avg_qty"),
        (F.col("sum_base_price") / F.col("count_order")).alias("avg_price"),
    )


def top_orders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """h3 — TPC-H Q3-style: broadcast dim filter -> fact join -> hash agg ->
    deterministic top-10 (revenue desc, orderkey asc tie-break)."""
    cut = F.expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'")
    cust = F.broadcast(customer.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey"))
    ords = orders.where(F.col("o_orderdate") < cut).join(cust, orders.o_custkey == cust.c_custkey)
    li = lineitem.where(F.col("l_shipdate") > cut)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(_dec_sum(rev, "revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def nation_revenue(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """h5 — TPC-H Q5-style multi-way join: two broadcast dims + fact chain,
    revenue per nation in one region."""
    dim = F.broadcast(
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region.where(F.col("r_name") == "ASIA"), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(dim, orders.o_custkey == dim.c_custkey)
        .groupBy("n_name")
        .agg(_dec_sum(rev, "revenue"))
    )


def segment_top_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """w1 — ranking window: top-2 orders by totalprice per market segment
    (row_number with unique tie-break, so results are engine-portable)."""
    j = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        j.withColumn("rank_in_segment", F.row_number().over(w))
        .where(F.col("rank_in_segment") <= 2)
        .select("c_mktsegment", "rank_in_segment", "o_orderkey", "o_totalprice")
    )


def customer_order_flow(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """w2 — analytic window with frame: per customer, running order count and
    cumulative spend over order date (rows between unbounded preceding)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    big = orders.where(F.col("o_custkey") < 200)
    return big.select(
        "o_custkey",
        "o_orderkey",
        F.count("*").over(w).alias("order_seq"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("cum_spend"),
    )


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """set1 — EXCEPT (anti-semantics by set op): customers that never ordered."""
    return customer.select("c_custkey").exceptAll(orders.select(F.col("o_custkey").alias("c_custkey"))).distinct()


def active_nations(customer: DataFrame, supplier: DataFrame) -> DataFrame:
    """set2 — INTERSECT + UNION: nations having both customers and suppliers,
    and total distinct nations on either side."""
    c = customer.select(F.col("c_nationkey").alias("nationkey"))
    s = supplier.select(F.col("s_nationkey").alias("nationkey"))
    both = c.intersect(s).withColumn("side", F.lit("both"))
    either = c.union(s).distinct().withColumn("side", F.lit("either"))
    return both.unionAll(either)


def order_priority_stats(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """j2 — semi-join (EXISTS): order counts per priority for orders with at
    least one lineitem shipped after commit-like cutoff; left-semi avoids
    materializing the join product at fact scale."""
    cut = F.expr("TIMESTAMP_NTZ '2000-01-01 00:00:00'")
    li = lineitem.where(F.col("l_shipdate") > cut).select("l_orderkey")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def json_props_stats(events: DataFrame) -> DataFrame:
    """x5/json — scalar JSON extraction over the message payload (the
    reference parses JSON app-side, README.md:45): extract props.k, bucket it,
    aggregate. Spark side uses the native JSON path function."""
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.select((k % 10).alias("k_bucket"), k.alias("k"))
        .groupBy("k_bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def scalar_functions_demo(part: DataFrame) -> DataFrame:
    """fn1 — scalar string/math/date function coverage on a dimension:
    engine-portable string surgery + arithmetic."""
    return part.select(
        "p_partkey",
        F.upper(F.col("p_brand")).alias("brand_u"),
        F.length(F.col("p_name")).alias("name_len"),
        F.substring(F.col("p_type"), 1, 3).alias("type3"),
        F.concat_ws("/", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        (F.col("p_size") % 7).alias("size_mod7"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("uplift_price"),
    )


def rank_bands(orders: DataFrame) -> DataFrame:
    """w3 — the distribution-rank window trio (ntile / percent_rank /
    cume_dist) under the exact gate: per customer, each URGENT order's
    spend quartile and exact rank ratios —
    ``(o_custkey, o_orderkey, spend_quartile, pct_rank, cume)``.

    All three are SQL-standard with identical semantics in both engines:
    ntile's first (n mod k) buckets get the extra row; percent_rank =
    (rank-1)/(n-1) with 0 for single-row partitions; cume_dist =
    rows-at-or-before/rows. The ratios are exact small-integer divisions
    (identical IEEE ops), rounded to 6 dp per the note-6 discipline. The
    ORDER BY carries o_orderkey as tie-break so every window position is
    deterministic. One partitioned window over a filtered scan — a
    WindowExec whose per-partition buffering is the customer's order
    count (bounded), no global sort."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.where(F.col("o_orderpriority") == "1-URGENT")
        .select(
            "o_custkey",
            "o_orderkey",
            F.ntile(4).over(w).alias("spend_quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
    )


_W3_SQL = """
SELECT o_custkey, o_orderkey,
       ntile(4) OVER w AS spend_quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM orders
WHERE o_orderpriority = '1-URGENT'
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
"""


# --- registry wiring -------------------------------------------------------


def build_queries():
    """Return {name: (fn(spark, sf_dir) -> DataFrame, oracle_sql|None)}."""

    def q(fn, *names):
        def run(spark: SparkSession, sf: str) -> DataFrame:
            # lineitem is the only table whose decimal-heavy aggregation is
            # worth spreading beyond the testdata's single row group.
            return fn(*[tables.load(spark, sf, n, spread=(n == "lineitem")) for n in names])

        return run

    return {
        "h1_pricing_summary": (q(pricing_summary, "lineitem"), _H1_SQL),
        "h3_top_orders": (q(top_orders, "customer", "orders", "lineitem"), _H3_SQL),
        "h5_nation_revenue": (
            q(nation_revenue, "customer", "orders", "lineitem", "nation", "region"),
            _H5_SQL,
        ),
        "w1_segment_top_orders": (q(segment_top_orders, "customer", "orders"), _W1_SQL),
        "w2_customer_order_flow": (q(customer_order_flow, "customer", "orders"), _W2_SQL),
        "w3_rank_bands": (q(rank_bands, "orders"), _W3_SQL),
        "set1_customers_without_orders": (q(customers_without_orders, "customer", "orders"), _SET1_SQL),
        "set2_active_nations": (q(active_nations, "customer", "supplier"), _SET2_SQL),
        "j2_order_priority_stats": (q(order_priority_stats, "orders", "lineitem"), _J2_SQL),
        "x5_json_props_stats": (q(json_props_stats, "events"), _X5_SQL),
        "fn1_scalar_functions": (q(scalar_functions_demo, "part"), _FN1_SQL),
        "j3_anti_join": (q(customers_without_orders_anti, "customer", "orders"), _J3_SQL),
        "cu1_cube_order_stats": (q(cube_order_stats, "orders", "customer"), _CU1_SQL),
        "fn2_null_semantics": (q(null_semantics, "events"), _FN2_SQL),
        "tm1_time_extraction": (q(time_extraction, "orders"), _TM1_SQL),
        "ag1_event_sequences": (q(event_sequences, "events"), _AG1_SQL),
    }


_H1_SQL = """
WITH a AS (
  SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS sum_disc_price,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(22,6))) AS DOUBLE) AS sum_charge,
         count(*) AS count_order
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
  GROUP BY l_returnflag, l_linestatus
)
SELECT *, sum_qty / count_order AS avg_qty, sum_base_price / count_order AS avg_price FROM a
"""

_H3_SQL = """
SELECT o_orderkey, o_orderpriority,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY o_orderkey, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""

_H5_SQL = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND c_nationkey = n_nationkey
  AND n_regionkey = r_regionkey AND r_name = 'ASIA'
GROUP BY n_name
"""

_W1_SQL = """
WITH j AS (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank_in_segment
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT c_mktsegment, rank_in_segment, o_orderkey, o_totalprice
FROM j WHERE rank_in_segment <= 2
"""

_W2_SQL = """
SELECT o_custkey, o_orderkey,
       count(*) OVER w AS order_seq,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS cum_spend
FROM orders WHERE o_custkey < 200
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""

_SET1_SQL = """
SELECT DISTINCT c_custkey FROM (
  SELECT c_custkey FROM customer EXCEPT ALL SELECT o_custkey AS c_custkey FROM orders
)
"""

_SET2_SQL = """
SELECT nationkey, 'both' AS side FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT
  SELECT s_nationkey AS nationkey FROM supplier
)
UNION ALL
SELECT nationkey, 'either' AS side FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION
  SELECT s_nationkey AS nationkey FROM supplier
)
"""

_J2_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '2000-01-01'
)
GROUP BY o_orderpriority
"""

_X5_SQL = r"""
WITH e AS (
  SELECT CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER) AS k FROM events
)
SELECT k % 10 AS k_bucket, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k, max(k) AS max_k
FROM e GROUP BY 1
"""

_FN1_SQL = """
SELECT p_partkey,
       upper(p_brand) AS brand_u,
       length(p_name) AS name_len,
       substring(p_type, 1, 3) AS type3,
       concat_ws('/', p_brand, p_type) AS brand_type,
       p_size % 7 AS size_mod7,
       round(p_retailprice * 1.1, 2) AS uplift_price
FROM part
"""


def customers_without_orders_anti(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """j3 — left-anti join: same question as set1 (customers that never
    ordered) answered with the join operator instead of the set operator —
    at scale the anti join is preferable (one broadcast/shuffled hash join;
    EXCEPT ALL forces a full aggregate of both sides).
    """
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey")


def cube_order_stats(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """cu1 — CUBE aggregation: order counts across every combination of
    (orderstatus, mktsegment), including both one-dimensional margins and
    the grand total; one expand + hash aggregate like rollup.
    """
    j = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    )
    return (
        j.cube("o_orderstatus", "c_mktsegment")
        .agg(F.count("*").alias("n_orders"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("c_mktsegment"), F.lit("ALL")).alias("segment"),
            "n_orders",
        )
    )


def null_semantics(events: DataFrame) -> DataFrame:
    """fn2 — null-handling semantics: NULLIF-produced nulls flowing through
    count/avg (null-skipping), COALESCE defaults, and null-safe equality —
    the semantics every engine must get identically right.
    """
    v = F.nullif(F.col("value"), F.lit(0.0))
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        F.count(v).alias("n_nonnull"),
        F.sum(F.when(v.isNull(), 1).otherwise(0)).alias("n_null"),
        F.round(
            F.sum(F.coalesce(v, F.lit(0.0)).cast("decimal(18,2)")).cast("double"), 2
        ).alias("sum_coalesced"),
        F.sum(F.when(F.col("value").eqNullSafe(F.lit(0.0)), 1).otherwise(0)).alias("n_zero_nullsafe"),
    )


def time_extraction(orders: DataFrame) -> DataFrame:
    """tm1 — date/time scalar functions: year/quarter/month extraction and
    truncation over the order-date column, aggregated per bucket.
    """
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.quarter("o_orderdate").alias("qtr"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.min(F.month("o_orderdate")).alias("first_month"),
            F.max(F.dayofmonth("o_orderdate")).alias("max_dom"),
        )
    )


_J3_SQL = """
SELECT c_custkey FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""

_CU1_SQL = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(c_mktsegment, 'ALL') AS segment,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE (o_orderstatus, c_mktsegment)
"""

_FN2_SQL = """
SELECT event_type,
       count(*) AS n_rows,
       count(nullif(value, 0.0)) AS n_nonnull,
       CAST(sum(CASE WHEN nullif(value, 0.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       round(CAST(sum(CAST(coalesce(nullif(value, 0.0), 0.0) AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_coalesced,
       CAST(sum(CASE WHEN value IS NOT DISTINCT FROM 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_nullsafe
FROM events GROUP BY event_type
"""

_TM1_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(quarter(o_orderdate) AS INT) AS qtr,
       count(*) AS n_orders,
       CAST(min(month(o_orderdate)) AS INT) AS first_month,
       CAST(max(day(o_orderdate)) AS INT) AS max_dom
FROM orders GROUP BY 1, 2
"""


def event_sequences(events: DataFrame) -> DataFrame:
    """ag1 — ordered collection aggregates: per user, the sorted multiset of
    event types as a CSV string (deterministic, engine-portable — raw
    array_agg order is partition-dependent, so always sort or join before
    comparing) plus first/last event types by log order via min_by/max_by.
    """
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.concat_ws(",", F.sort_array(F.collect_list("event_type"))).alias("types_csv"),
        # event_id is monotone in ts (log offset), so it IS the arrival
        # order — and a single-column key both engines' arg_min/max accept.
        F.min_by("event_type", F.col("event_id")).alias("first_type"),
        F.max_by("event_type", F.col("event_id")).alias("last_type"),
    )


_AG1_SQL = """
SELECT user_id, count(*) AS n_events,
       string_agg(event_type, ',' ORDER BY event_type) AS types_csv,
       arg_min(event_type, event_id) AS first_type,
       arg_max(event_type, event_id) AS last_type
FROM events GROUP BY user_id
"""
