"""Dedup suite: oracle checks for dd1/dd2; brute-force ground-truth recall
checks for the hash-based candidates (dd3 MinHash-LSH, dd4 SimHash)."""

from __future__ import annotations

import itertools

import pytest

from tests.conftest import SF_SMALL
from tests.oracle import check_query


@pytest.mark.parametrize("name", ["dd1_exact_dedup", "dd2_ngram_jaccard", "dc1_decontaminate"])
def test_oracle_match(spark, name):
    ok, msg = check_query(spark, name, SF_SMALL)
    assert ok, msg


def test_decontaminate_flags_planted_leak(spark):
    """A corpus doc that quotes a benchmark doc's text must be flagged with
    the exact distinct-shingle overlap count; disjoint docs must not be."""
    from samsa_spark.operators.dedup import decontaminate

    bench_text = "alpha beta gamma delta epsilon zeta"      # doc 0: 4 shingles
    rows = [
        (0, "en", bench_text),
        (1, "en", "one two three four five six seven"),     # benchmark too (id < 20)
        (20, "en", "prefix alpha beta gamma delta suffix"), # quotes 2 of doc 0's shingles
        (21, "en", "totally unrelated words here indeed"),
        (22, "en", bench_text),                              # verbatim leak: all 4
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r.doc_id: (r.n_hits, r.contaminated) for r in decontaminate(df).collect()}
    assert got == {20: (2, True), 21: (0, False), 22: (4, True)}


def _shingles(text: str, k: int = 3) -> set[str]:
    toks = text.split(" ")
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def test_minhash_lsh_recall(spark):
    """Every truly-similar pair (Jaccard >= 0.5) must appear among LSH
    candidates; candidate estimates must roughly track true Jaccard."""
    from samsa_spark import tables
    from samsa_spark.operators.dedup import minhash_lsh_pairs

    docs = tables.load(spark, SF_SMALL, "documents")
    rows = docs.select("doc_id", "text").collect()
    sh = {r.doc_id: _shingles(r.text) for r in rows}
    truth = {}
    for a, b in itertools.combinations(sorted(sh), 2):
        inter = len(sh[a] & sh[b])
        if inter:
            truth[(a, b)] = inter / len(sh[a] | sh[b])
    high = {p for p, j in truth.items() if j >= 0.5}

    cand = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in minhash_lsh_pairs(docs, min_est_jaccard=0.25).collect()
    }
    missed = high - set(cand)
    assert not missed, f"LSH missed high-jaccard pairs: {missed}"
    for p, est in cand.items():
        true_j = truth.get(p, 0.0)
        assert abs(est - true_j) < 0.35, f"estimate far off for {p}: est={est} true={true_j}"


def test_simhash_determinism_and_selfdup(spark):
    """SimHash: identical texts get identical fingerprints; fingerprints are
    stable across runs (pure column arithmetic, no RNG)."""
    from samsa_spark import tables
    from samsa_spark.operators.dedup import simhash_fingerprints

    docs = tables.load(spark, SF_SMALL, "documents")
    fp1 = {r.doc_id: r.simhash for r in simhash_fingerprints(docs).collect()}
    fp2 = {r.doc_id: r.simhash for r in simhash_fingerprints(docs).collect()}
    assert fp1 == fp2
    # duplicate text -> identical simhash: synthesize a dup
    two = docs.limit(1).select("text").collect()[0].text
    dup = spark.createDataFrame([(900001, two), (900002, two)], "doc_id long, text string")
    fps = {r.doc_id: r.simhash for r in simhash_fingerprints(dup).collect()}
    assert fps[900001] == fps[900002]


def test_dedup_clusters_oracle(spark):
    ok, msg = check_query(spark, "dd6_dedup_clusters", SF_SMALL)
    assert ok, msg


def test_dedup_clusters_union_find_ground_truth(spark):
    """Label propagation must produce exactly the union-find components of
    the Jaccard pair graph."""
    from samsa_spark import tables
    from samsa_spark.operators.dedup import dedup_clusters, ngram_jaccard_pairs

    docs = tables.load(spark, SF_SMALL, "documents")
    pairs = [(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(docs, 0.1).collect()]
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    all_ids = [r.doc_id for r in docs.select("doc_id").collect()]
    for i in all_ids:
        find(i)
    for a, b in pairs:
        union(a, b)
    want = {i: find(i) for i in all_ids}
    got = {r.doc_id: r.canonical_id for r in dedup_clusters(docs, 0.1).collect()}
    assert got == want


def test_decontaminate_shuffle_fallback_matches_broadcast(spark):
    """broadcast_benchmark=False (the beyond-broadcast path, round-5
    verdict #4): with auto-broadcast disabled the equi-join on the shingle
    must become a partitioned shuffle join — never a cartesian/nested-loop
    — and the output must be identical to the broadcast form."""
    from samsa_spark import tables
    from samsa_spark.operators.dedup import decontaminate

    docs = tables.load(spark, SF_SMALL, "documents")
    want = sorted(tuple(r) for r in decontaminate(docs).collect())

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fb = decontaminate(docs, broadcast_benchmark=False)
        got = sorted(tuple(r) for r in fb.collect())
        plan = fb._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert got == want
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    # the shingle equi-join must run as a shuffle join (either strategy)
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan), plan


def test_propagate_min_labels_matches_union_find_on_random_graphs(spark):
    """The label-propagation core shared by dd6 and sd1, checked against a
    python union-find on randomized graphs — including shapes that stress
    the loop: chains (diameter > 1 iteration), stars, cycles, and
    singletons."""
    import random

    import pyspark.sql.functions as F

    from samsa_spark.operators.dedup import propagate_min_labels

    rng = random.Random(13)
    for trial in range(4):
        n = 60
        nodes = list(range(n))
        edges = []
        # one long chain to force multiple propagation iterations
        chain = rng.sample(nodes, 12)
        edges += list(zip(chain, chain[1:]))
        # a star and random extra edges (cycles welcome)
        hub = rng.choice(nodes)
        edges += [(hub, rng.choice(nodes)) for _ in range(5)]
        edges += [(rng.choice(nodes), rng.choice(nodes)) for _ in range(10)]
        edges = [(a, b) for a, b in edges if a != b]

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {i: find(i) for i in nodes}

        nodes_df = spark.createDataFrame([(i,) for i in nodes], "id long")
        edges_df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r.id: r.label
            for r in propagate_min_labels(nodes_df, edges_df, max_iter=20).collect()
        }
        assert got == want, f"trial {trial}: component labels diverged"
