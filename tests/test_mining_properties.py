"""Property tests for the mining/graph tier: random small inputs vs
independent Python models (brute-force triangles, dict-based PageRank/LPA,
brute-force pair counting, first-occurrence scans). The oracle sweep locks
cross-engine parity on the fixture tables; these lock the SEMANTICS on
shapes the fixtures never produce."""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# (order, part) memberships: small enough for brute force, wide enough for
# shared parts across baskets
basket_rows = st.lists(
    st.tuples(st.integers(1, 8), st.integers(1, 10)),
    min_size=1,
    max_size=40,
)

# (user, type, ts) event logs with deliberate ts collisions
event_rows = st.lists(
    st.tuples(st.integers(1, 5), st.sampled_from("abc"), st.integers(0, 6)),
    min_size=1,
    max_size=30,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=basket_rows)
def test_tc1_matches_brute_force(spark, rows):
    from samsa_spark.operators.mining import triangle_stats

    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = triangle_stats(li).collect()[0]

    baskets: dict[int, set[int]] = {}
    for o, p in rows:
        baskets.setdefault(o, set()).add(p)
    edges = set()
    for items in baskets.values():
        for a, b in combinations(sorted(items), 2):
            edges.add((a, b))
    nodes = {n for e in edges for n in e}
    deg: dict[int, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    tris = sum(
        1
        for a, b, c in combinations(sorted(nodes), 3)
        if (a, b) in edges and (b, c) in edges and (a, c) in edges
    )
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    assert (got.n_nodes, got.n_edges, got.n_wedges, got.n_triangles) == (
        len(nodes),
        len(edges),
        wedges,
        tris,
    )


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=basket_rows)
def test_fp1_pair_counts_match_brute_force(spark, rows):
    """Whatever survives fp1's mean-relative floor must carry brute-force
    pair support and item counts (the floor itself is re-derived here)."""
    from samsa_spark.operators.mining import copurchase_rules

    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = {(r.item_a, r.item_b): (r.pair_count, r.count_a, r.count_b) for r in copurchase_rules(li, top_n=10_000).collect()}

    baskets: dict[int, set[int]] = {}
    for o, p in rows:
        baskets.setdefault(o, set()).add(p)
    cnt: dict[int, int] = {}
    for items in baskets.values():
        for p in items:
            cnt[p] = cnt.get(p, 0) + 1
    occ = sum(cnt.values())
    keep = {p for p, c in cnt.items() if 5 * c * len(cnt) >= 6 * occ}
    pairs: dict[tuple[int, int], int] = {}
    for items in baskets.values():
        for a, b in combinations(sorted(items & keep), 2):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    want = {k: (v, cnt[k[0]], cnt[k[1]]) for k, v in pairs.items()}
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=basket_rows)
def test_pr1_matches_python_model_on_random_graphs(spark, rows):
    from samsa_spark.operators.mining import pagerank
    from tests.test_mining import _model_pagerank

    orders = spark.createDataFrame(
        [(o, o % 4 + 1) for o in sorted({o for o, _ in rows})],
        "o_orderkey long, o_custkey long",
    )
    li = spark.createDataFrame(rows, "l_orderkey long, l_suppkey long")
    cust = {o: o % 4 + 1 for o, _ in rows}
    w: dict[tuple[str, str], int] = {}
    for o, s in rows:
        k = (f"c:{cust[o]}", f"s:{s}")
        w[k] = w.get(k, 0) + 1
    got = {r.node: r["rank"] for r in pagerank(orders, li).collect()}
    assert got == _model_pagerank(w)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=basket_rows)
def test_lp1_matches_python_model_on_random_graphs(spark, rows):
    from samsa_spark.operators.mining import label_propagation
    from tests.test_mining import _model_lpa

    orders = spark.createDataFrame(
        [(o, o % 4 + 1) for o in sorted({o for o, _ in rows})],
        "o_orderkey long, o_custkey long",
    )
    li = spark.createDataFrame(rows, "l_orderkey long, l_suppkey long")
    cust = {o: o % 4 + 1 for o, _ in rows}
    w: dict[tuple[int, int], int] = {}
    for o, s in rows:
        c, sn = cust[o] * 2, s * 2 + 1
        w[(c, sn)] = w.get((c, sn), 0) + 1
        w[(sn, c)] = w.get((sn, c), 0) + 1
    lab = _model_lpa(w)

    def pretty(v):
        return f"c:{v // 2}" if v % 2 == 0 else f"s:{(v - 1) // 2}"

    got = {r.node: r.community for r in label_propagation(orders, li).collect()}
    assert got == {pretty(v): pretty(l) for v, l in lab.items()}


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=event_rows)
def test_sq1_matches_first_occurrence_scan(spark, rows):
    from samsa_spark.operators.mining import adoption_order_support

    ev = spark.createDataFrame(
        [(u, t, ts, i) for i, (u, t, ts) in enumerate(rows)],
        "user_id long, event_type string, ts_us long, event_id long",
    )
    firsts: dict[tuple[int, str], tuple[int, int]] = {}
    users = set()
    for i, (u, t, ts) in enumerate(rows):
        users.add(u)
        k = (u, t)
        if k not in firsts or (ts, i) < firsts[k]:
            firsts[k] = (ts, i)
    support: dict[tuple[str, str], int] = {}
    for (u1, a), fa in firsts.items():
        for (u2, b), fb in firsts.items():
            if u1 == u2 and a != b and fa < fb:
                support[(a, b)] = support.get((a, b), 0) + 1
    got = {(r.type_a, r.type_b): (r.support, r.support_frac) for r in adoption_order_support(ev).collect()}
    want = {k: (v, round(v / float(len(users)), 6)) for k, v in support.items()}
    assert got == want
