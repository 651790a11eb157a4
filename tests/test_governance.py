"""dq1 constraint battery + df1 snapshot diff: oracle checks plus planted
violation / change-status tests driving every code path the clean fixture
cannot."""

from __future__ import annotations

from tests.conftest import SF_SMALL
from tests.oracle import check_query


def test_dq1_oracle_match(spark):
    ok, msg = check_query(spark, "dq1_constraint_report", SF_SMALL)
    assert ok, msg


def test_df1_oracle_match(spark):
    ok, msg = check_query(spark, "df1_snapshot_diff", SF_SMALL)
    assert ok, msg


def test_dq1_planted_violations_fire_every_constraint(spark):
    """Each constraint family must actually count its violations: duplicate
    keys, dangling foreign keys, out-of-range values, empty text."""
    from samsa_spark.operators.governance import constraint_report

    customer = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "dup")], "c_custkey long, c_name string"
    )
    orders = spark.createDataFrame(
        [(10, 1, 5.0), (11, 99, -1.0), (12, 2, 3.0)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    lineitem = spark.createDataFrame(
        [(10, 1.0, 0.1), (10, 99.0, 0.2), (11, 5.0, 1.5)],
        "l_orderkey long, l_quantity double, l_discount double",
    )
    documents = spark.createDataFrame(
        [(0, "text"), (1, ""), (2, None)], "doc_id long, text string"
    )
    got = {
        r.constraint: (r.n_checked, r.n_violations, r.passed)
        for r in constraint_report(customer, orders, lineitem, documents).collect()
    }
    assert got["customer.c_custkey is unique"] == (2, 1, False)
    assert got["orders.o_custkey references customer"] == (3, 1, False)
    assert got["orders.o_totalprice > 0"] == (3, 1, False)
    assert got["lineitem.l_quantity in [1, 50]"] == (3, 1, False)
    assert got["lineitem.l_discount in [0, 1]"] == (3, 1, False)
    assert got["documents.text is non-empty"] == (3, 2, False)


def test_df1_statuses_on_planted_snapshots(spark):
    """Hand-built old/new snapshots hit all four statuses exactly."""
    from samsa_spark.operators.governance import snapshot_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed"), (4, "brand new")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.status for r in snapshot_diff(new, old).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_ka1_oracle_match(spark):
    ok, msg = check_query(spark, "ka1_k_anonymity", SF_SMALL)
    assert ok, msg


def test_ka1_planted_classes(spark):
    """Classes below k surface with exact sizes; classes at/above k do not;
    ordering is (class_size, quasi)."""
    from samsa_spark.operators.governance import k_anonymity_violations

    rows = (
        [("us", "a")] * 5      # safe at k=5
        + [("us", "b")] * 2    # violating, size 2
        + [("de", "a")] * 1    # violating, size 1
        + [("de", "b")] * 6    # safe
    )
    df = spark.createDataFrame(rows, "country string, seg string")
    got = [
        tuple(r)
        for r in k_anonymity_violations(df, ["country", "seg"], k=5).collect()
    ]
    assert got == [("de", "a", 1), ("us", "b", 2)]


def test_dp1_oracle_match(spark):
    ok, msg = check_query(spark, "dp1_noisy_counts", SF_SMALL)
    assert ok, msg


def test_dp1_noise_is_calibrated_laplace(spark):
    """The released counts differ from the true counts by Laplace(1/eps)
    draws: no value is exact (measure-zero), deviations stay within the
    inverse-CDF bound ln(MOD) for the seeded u grid, and the mechanism is
    deterministic across calls."""
    import math

    from samsa_spark import tables
    from samsa_spark.operators.governance import dp_noisy_counts

    cust = tables.load(spark, SF_SMALL, "customer")
    true = {r.c_nationkey: r.cnt for r in cust.groupBy("c_nationkey").count().withColumnRenamed("count", "cnt").collect()}
    rel1 = {r.c_nationkey: r.noisy_count for r in dp_noisy_counts(cust).collect()}
    rel2 = {r.c_nationkey: r.noisy_count for r in dp_noisy_counts(cust).collect()}
    assert rel1 == rel2  # deterministic release
    bound = math.log(1_000_004.0)  # |noise| <= b * ln(MOD+1) at eps=1
    devs = [abs(rel1[k] - true[k]) for k in true]
    assert all(0 < d <= bound for d in devs)
    # noise varies across groups (not a constant offset)
    assert len({round(d, 6) for d in devs}) > 1
