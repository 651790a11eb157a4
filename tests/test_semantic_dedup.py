"""sd1 semantic dedup (SemDeDup-shaped) — planted-corpus ground truth.

Like dd3/dd4, sd1 is rows-only at the driver (k-means + UDF cosines have no
DuckDB twin), so its correctness oracle lives here: a corpus with PLANTED
near-duplicate embedding groups, checked against the brute-force cosine
threshold graph computed in-process with numpy + union-find.

Two structural properties pin the approximation semantics:
- recall: planted near-identical vectors share a cell (their centroid
  cosines are ~equal), so their pairs survive the per-cell pruning;
- refinement: the within-cell pair graph is a subgraph of the full
  threshold graph, so every emitted group must sit INSIDE one true
  component (the approximation may split groups, never over-merge).
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

DIM = 32
MIN_COS = 0.9


def _planted_corpus():
    """120 vectors: 10 planted groups of 3 near-identical members + 90
    singletons, all unit-norm. Returns (ids, X, true_pairs)."""
    rng = np.random.RandomState(7)
    rows = []
    group_of = {}
    vid = 0
    for g in range(10):
        basev = rng.randn(DIM)
        basev /= np.linalg.norm(basev)
        for _ in range(3):
            v = basev + rng.randn(DIM) * 0.02  # cos ~ 0.999
            rows.append(v / np.linalg.norm(v))
            group_of[vid] = g
            vid += 1
    for _ in range(90):
        v = rng.randn(DIM)
        rows.append(v / np.linalg.norm(v))
        vid += 1
    X = np.stack(rows)
    return list(range(len(rows))), X, group_of


def _true_components(X: np.ndarray, min_cos: float) -> dict[int, int]:
    """Brute-force threshold graph -> connected components via union-find,
    labels = min reachable id (same convention as propagate_min_labels)."""
    S = np.round(X @ X.T, 6)
    n = len(X)
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(n):
        for j in range(i + 1, n):
            if S[i, j] >= min_cos:
                ra, rb = find(i), find(j)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n)}


@pytest.fixture(scope="module")
def planted(spark):
    ids, X, group_of = _planted_corpus()
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in ids], schema
    ).repartition(8)
    return df, X, group_of


def _run(df, **kw):
    from samsa_spark.operators.similarity import semantic_dedup

    out = semantic_dedup(df, cells=12, min_cos=MIN_COS, **kw)
    return {r["vec_id"]: (r["rep_id"], r["group_size"], r["is_dup"]) for r in out.collect()}


def test_planted_groups_recovered_and_no_overmerge(planted):
    df, X, group_of = planted
    got = _run(df)
    assert len(got) == len(X)  # one row per vector, none lost

    true_label = _true_components(X, MIN_COS)

    # Refinement: an emitted group never spans two true components.
    for vid, (rep, _, _) in got.items():
        assert true_label[vid] == true_label[rep], (
            f"vec {vid} grouped with rep {rep} across true components"
        )

    # Recall: every planted trio collapses to one representative (the
    # members are near-identical so they share a cell).
    planted_ids = sorted(group_of)
    found_pairs = 0
    want_pairs = 0
    for a in planted_ids:
        for b in planted_ids:
            if a < b and group_of[a] == group_of[b]:
                want_pairs += 1
                if got[a][0] == got[b][0]:
                    found_pairs += 1
    assert want_pairs == 30
    assert found_pairs / want_pairs >= 0.9

    # Contract: rep is the group min; group_size counts members; is_dup
    # marks exactly the non-representatives.
    from collections import Counter

    sizes = Counter(rep for rep, _, _ in got.values())
    for vid, (rep, size, is_dup) in got.items():
        assert rep <= vid
        assert size == sizes[rep]
        assert is_dup == (vid != rep)


def test_semantic_dedup_deterministic(planted):
    df, _, _ = planted
    assert _run(df) == _run(df)


def test_prep_pipeline_semantic_stage(spark):
    """pp1's opt-in SemDeDup stage drops exactly the non-representative
    docs: 3 docs share one embedding direction (distinct texts — invisible
    to exact/fuzzy text dedup), the rest are random."""
    import pyspark.sql.functions as F

    from samsa_spark.operators.pipeline_ops import prep_pipeline

    rng = np.random.RandomState(11)
    n = 40
    base = rng.randn(DIM)
    base /= np.linalg.norm(base)
    vecs = []
    for i in range(n):
        if i in (5, 17, 29):  # planted semantic trio, distinct texts
            v = base + rng.randn(DIM) * 0.01
        else:
            v = rng.randn(DIM)
        vecs.append(v / np.linalg.norm(v))
    emb_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)], emb_schema
    )
    docs = spark.createDataFrame(
        [
            (i, f"unique alpha document number {i} with enough characters", "en")
            for i in range(n)
        ],
        "doc_id long, text string, lang string",
    )
    with_sem = prep_pipeline(
        docs,
        min_chars=10,
        min_alpha_ratio=0.1,
        semantic_dedup_embeddings=emb,
        semantic_min_cos=MIN_COS,
        semantic_cells=8,
    )
    without = prep_pipeline(docs, min_chars=10, min_alpha_ratio=0.1)
    n_with = with_sem.agg(F.sum("n_docs")).collect()[0][0]
    n_without = without.agg(F.sum("n_docs")).collect()[0][0]
    assert n_without == n
    # the trio keeps its smallest doc_id (5), drops 17 and 29
    assert n_with == n - 2
