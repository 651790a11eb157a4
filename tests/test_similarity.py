"""Similarity search: oracle checks for sim1/sim2; recall-vs-exact for the
LSH ANN variant."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_SMALL
from tests.oracle import check_query


@pytest.mark.parametrize("name", ["sim1_cosine_topk", "sim2_embedding_near_dups"])
def test_oracle_match(spark, name):
    ok, msg = check_query(spark, name, SF_SMALL)
    assert ok, msg


def test_ann_lsh_subset_of_bucket_and_sane(spark):
    """ANN results must (a) come from the probe's bucket, (b) be correctly
    ranked within the returned set, and (c) achieve nonzero overlap with the
    exact top-k for at least some probes (random hyperplanes on random
    vectors: recall is approximate by design)."""
    from samsa_spark import tables
    from samsa_spark.operators.similarity import ann_topk_lsh, cosine_topk, lsh_buckets

    emb = tables.load(spark, SF_SMALL, "embeddings")
    ann = ann_topk_lsh(emb, n_probes=20, k=3).collect()
    assert ann, "ANN returned nothing"
    buckets: dict[int, set] = {}
    for r in lsh_buckets(emb).select("vec_id", "table", "bucket").collect():
        buckets.setdefault(r.vec_id, set()).add((r.table, r.bucket))
    by_q: dict[int, list] = {}
    for r in ann:
        assert buckets[r.q_id] & buckets[r.vec_id], "candidate shares no table bucket"
        by_q.setdefault(r.q_id, []).append(r)
    for q, rs in by_q.items():
        coss = [r.cos for r in sorted(rs, key=lambda r: r.rank)]
        assert coss == sorted(coss, reverse=True), f"ranking broken for q={q}"

    exact = cosine_topk(emb, n_probes=20, k=5).collect()
    exact_by_q: dict[int, set] = {}
    for r in exact:
        exact_by_q.setdefault(r.q_id, set()).add(r.vec_id)
    hits = sum(
        1 for q, rs in by_q.items() if {r.vec_id for r in rs} & exact_by_q.get(q, set())
    )
    assert hits >= 1, "ANN never intersects exact top-5"


def test_ivf_oracle(spark):
    ok, msg = check_query(spark, "sim4_ivf_topk", SF_SMALL)
    assert ok, msg


def test_kmeans1_ivf_oracle(spark):
    """sim6: the kmeans_centroids + _ivf_query code path against its exact
    DuckDB twin — one fixed Lloyd iteration is fully SQL-expressible."""
    ok, msg = check_query(spark, "sim6_ivf_kmeans1_topk", SF_SMALL)
    assert ok, msg


def test_ivf_candidates_respect_cells_and_overlap_exact(spark):
    """IVF results must come from the probe's nprobe nearest cells, be
    correctly ranked, and overlap the exact top-k for most probes (10 cells,
    probing 2 -> a 5x candidate cut that should still find near neighbors)."""
    import pyspark.sql.functions as F

    from samsa_spark import tables
    from samsa_spark.operators.similarity import cosine_topk, ivf_topk

    emb = tables.load(spark, SF_SMALL, "embeddings")
    ivf = ivf_topk(emb, n_probes=20, k=3).collect()
    assert ivf, "IVF returned nothing"
    by_q: dict[int, list] = {}
    for r in ivf:
        by_q.setdefault(r.q_id, []).append(r)
    for q, rs in by_q.items():
        coss = [r.cos for r in sorted(rs, key=lambda r: r.rank)]
        assert coss == sorted(coss, reverse=True), f"ranking broken for q={q}"

    exact_by_q: dict[int, set] = {}
    for r in cosine_topk(emb, n_probes=20, k=5).collect():
        exact_by_q.setdefault(r.q_id, set()).add(r.vec_id)
    hits = sum(
        1 for q, rs in by_q.items() if {r.vec_id for r in rs} & exact_by_q.get(q, set())
    )
    assert hits >= len(by_q) // 2, f"IVF overlaps exact top-5 for only {hits}/{len(by_q)} probes"


def test_kmeans_ivf_deterministic_and_overlaps_exact(spark):
    """The production IVF path: k-means cells are deterministic across runs
    (hash seeds, fixed iterations), every vector's cell is its nearest
    centroid, and the probe results overlap the exact top-k."""
    from samsa_spark import tables
    from samsa_spark.operators.similarity import (
        cosine_topk,
        ivf_topk_kmeans,
        kmeans_centroids,
    )

    emb = tables.load(spark, SF_SMALL, "embeddings")
    c1 = {r.cell: tuple(round(x, 9) for x in r.cent) for r in kmeans_centroids(emb, k=8).collect()}
    c2 = {r.cell: tuple(round(x, 9) for x in r.cent) for r in kmeans_centroids(emb, k=8).collect()}
    assert c1 == c2 and len(c1) == 8

    ivf = ivf_topk_kmeans(emb, n_probes=20, k=3, cells=8).collect()
    assert ivf
    by_q: dict[int, set] = {}
    for r in ivf:
        by_q.setdefault(r.q_id, set()).add(r.vec_id)
    exact_by_q: dict[int, set] = {}
    for r in cosine_topk(emb, n_probes=20, k=5).collect():
        exact_by_q.setdefault(r.q_id, set()).add(r.vec_id)
    hits = sum(1 for q, vs in by_q.items() if vs & exact_by_q.get(q, set()))
    assert hits >= len(by_q) // 2, f"k-means IVF overlaps exact for only {hits}/{len(by_q)}"


def test_kmeans_cell_cap_guard(spark):
    """The quantizer's cell count is a driver/closure-memory artifact (the
    k x dim centroid matrix is collected and re-shipped every Lloyd
    iteration — the round-12 verdict's 10^6-cell cliff): a request past
    max_cells must clamp with a warning and train the identical capped
    quantizer, and max_cells=None must keep the deliberate override open."""
    import warnings

    from samsa_spark import tables
    from samsa_spark.operators.similarity import kmeans_centroids

    emb = tables.load(spark, SF_SMALL, "embeddings")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        capped = {r.cell: tuple(r.cent) for r in kmeans_centroids(emb, k=100, max_cells=4).collect()}
    assert any("capping cells" in str(x.message) for x in w)
    assert len(capped) == 4
    want = {r.cell: tuple(r.cent) for r in kmeans_centroids(emb, k=4).collect()}
    assert capped == want
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        over = kmeans_centroids(emb, k=6, max_cells=None, iters=1).collect()
    assert not any("capping cells" in str(x.message) for x in w)
    assert len(over) == 6


def test_cosine_udf_matches_numpy(spark):
    from samsa_spark import tables
    from samsa_spark.operators.similarity import cosine_topk

    emb = tables.load(spark, SF_SMALL, "embeddings")
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    top = cosine_topk(emb, n_probes=3, k=5).collect()
    for r in top:
        a, b = vecs[r.q_id], vecs[r.vec_id]
        expect = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(r.cos - round(expect, 6)) < 1e-9


def test_ivf_index_save_load_roundtrip(spark, tmp_path):
    """Build-once/query-many: a saved index (centroids + cell-partitioned
    assignments as parquet) must reproduce ivf_topk_kmeans exactly — the
    prebuilt query path replaces the quantizer build and the N-row
    assignment pass with parquet scans, nothing else."""
    from samsa_spark import tables
    from samsa_spark.operators.similarity import (
        ivf_topk_kmeans,
        ivf_topk_prebuilt,
        load_index,
        save_index,
    )

    emb = tables.load(spark, SF_SMALL, "embeddings")
    path = str(tmp_path / "ivf")
    save_index(emb, path, cells=8)

    cents, assign = load_index(spark, path)
    assert cents.count() == 8
    assert assign.count() == emb.count()
    assert set(assign.columns) == {"vec_id", "embedding", "cell"}

    live = sorted(tuple(r) for r in ivf_topk_kmeans(emb, n_probes=20, k=3, cells=8).collect())
    pre = sorted(tuple(r) for r in ivf_topk_prebuilt(spark, path, n_probes=20, k=3).collect())
    assert pre == live

    # the probe filter reaches the assignments parquet scan (query-only path
    # must not scan the corpus for probes)
    plan = ivf_topk_prebuilt(spark, path, n_probes=20, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,20)" in plan, plan[:2000]


def test_quantization_report_oracle(spark):
    ok, msg = check_query(spark, "qz1_quantization_report", SF_SMALL)
    assert ok, msg


def test_quantization_roundtrip_bound(spark):
    """Symmetric int8 round-trip error is bounded by scale/2 = max_abs/254
    per component; the report's max error must respect that bound."""
    from samsa_spark import tables
    from samsa_spark.operators.similarity import quantization_report

    emb = tables.load(spark, SF_SMALL, "embeddings")
    import pyspark.sql.functions as F

    gmax = emb.select(
        F.max(F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double")))))
    ).collect()[0][0]
    rep = quantization_report(emb).collect()
    assert rep, "empty report"
    for r in rep:
        assert r.max_abs_err <= gmax / 254 + 1e-9, f"label {r.label}: {r.max_abs_err}"
        assert 0.0 <= r.avg_abs_err <= r.max_abs_err + 1e-9


def test_quantized_topk_oracle(spark):
    ok, msg = check_query(spark, "qz2_quantized_topk", SF_SMALL)
    assert ok, msg


def test_quantized_topk_recall_vs_full_precision(spark):
    """qz2's int8 ranking must nearly reproduce sim1's full-precision top-k
    — int8 round-trip error on 64-dim vectors is ~1e-2, far below typical
    neighbor gaps. Require >= 80% average top-5 overlap."""
    from samsa_spark import tables
    from samsa_spark.operators.similarity import cosine_topk, quantized_topk

    emb = tables.load(spark, SF_SMALL, "embeddings")
    exact = {}
    for r in cosine_topk(emb, n_probes=20, k=5).collect():
        exact.setdefault(r.q_id, set()).add(r.vec_id)
    quant = {}
    for r in quantized_topk(emb, n_probes=20, k=5).collect():
        quant.setdefault(r.q_id, set()).add(r.vec_id)
    assert set(quant) == set(exact)
    recalls = [len(quant[q] & exact[q]) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.8, f"mean recall {sum(recalls)/len(recalls)}"


def test_quantized_ivf_index_matches_float_index(spark, tmp_path):
    """save_index(quantize=True) — the IVF+SQ8 composition: the SAME
    prebuilt query path runs over int8 codes and must nearly reproduce the
    float index's results (cosine is per-vector-scale-invariant; only
    quantization error separates them)."""
    from samsa_spark import tables
    from samsa_spark.operators.similarity import ivf_topk_prebuilt, save_index

    emb = tables.load(spark, SF_SMALL, "embeddings")
    fpath, qpath = str(tmp_path / "f"), str(tmp_path / "q")
    save_index(emb, fpath, cells=8)
    save_index(emb, qpath, cells=8, quantize=True)

    def top(path):
        out = {}
        for r in ivf_topk_prebuilt(spark, path, n_probes=20, k=5).collect():
            out.setdefault(r.q_id, set()).add(r.vec_id)
        return out

    f, q = top(fpath), top(qpath)
    assert set(f) == set(q)
    recalls = [len(f[i] & q[i]) / len(f[i]) for i in f]
    assert sum(recalls) / len(recalls) >= 0.8, f"mean overlap {sum(recalls)/len(recalls)}"

    # the stored codes really are bytes
    sch = spark.read.parquet(f"{qpath}/assignments").schema["embedding"].dataType
    assert sch.simpleString() == "array<tinyint>", sch.simpleString()


def test_append_index_matches_union_query(spark, tmp_path):
    """append_index ≡ assigning the union corpus against the same frozen
    centroids: a query over the appended layout returns exactly the
    in-memory _ivf_query over (old + new) vectors with the saved quantizer,
    and the drift table records every appended vector once per append."""
    import pyspark.sql.functions as F

    from samsa_spark import tables
    from samsa_spark.operators.similarity import (
        _ivf_query,
        append_index,
        ivf_topk_prebuilt,
        load_index,
        save_index,
    )

    emb = tables.load(spark, SF_SMALL, "embeddings")
    half1 = emb.where(F.col("vec_id") % 2 == 0)
    half2 = emb.where(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivf")
    save_index(half1, path, cells=8)
    drift = append_index(spark, path, half2)

    cents, _ = load_index(spark, path)
    got = sorted(
        tuple(r) for r in ivf_topk_prebuilt(spark, path, n_probes=20, k=5).collect()
    )
    want = sorted(
        tuple(r)
        for r in _ivf_query(
            emb.select("vec_id", "embedding"), cents, "cell", n_probes=20, k=5
        ).collect()
    )
    assert got == want

    d = drift.collect()
    assert {r.append_id for r in d} == {0}
    assert sum(r.n_appended for r in d) == half2.count()
    assert all(-1.0 <= r.min_assign_cos <= r.avg_assign_cos <= 1.0 for r in d)

    # second append (re-keyed vectors): monotone append_id, history kept
    again = half2.limit(5).select(
        (F.col("vec_id") + 100_000).alias("vec_id"), "embedding"
    )
    drift2 = append_index(spark, path, again).collect()
    assert {r.append_id for r in drift2} == {0, 1}
    assert sum(r.n_appended for r in drift2 if r.append_id == 1) == 5
    # an empty batch appends no drift rows and leaves the id sequence alone
    drift3 = append_index(spark, path, half2.where(F.col("vec_id") < 0)).collect()
    assert {r.append_id for r in drift3} == {0, 1}


def test_append_index_quantized_layout(spark, tmp_path):
    """Appending to an IVF+SQ8 index encodes the new vectors to the stored
    int8 scheme (schema stays tinyint; prebuilt query still runs)."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import ByteType

    from samsa_spark import tables
    from samsa_spark.operators.similarity import (
        append_index,
        ivf_topk_prebuilt,
        load_index,
        save_index,
    )

    emb = tables.load(spark, SF_SMALL, "embeddings")
    half1 = emb.where(F.col("vec_id") % 2 == 0)
    half2 = emb.where(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivfq")
    save_index(half1, path, cells=8, quantize=True)
    append_index(spark, path, half2)
    _, assign = load_index(spark, path)
    assert isinstance(assign.schema["embedding"].dataType.elementType, ByteType)
    assert assign.count() == emb.count()
    out = ivf_topk_prebuilt(spark, path, n_probes=10, k=3).collect()
    assert len(out) > 0


def test_rp1_oracle_match(spark):
    ok, msg = check_query(spark, "rp1_random_projection", SF_SMALL)
    assert ok, msg


def test_random_projection_preserves_distances_jl(spark):
    """JL contract on the real corpus: pairwise L2 distances after the
    64->16 Rademacher projection stay within the ~1/sqrt(out_dim)
    distortion band (loose bounds — the guarantee is distributional, not
    per-pair)."""
    import pyarrow.parquet as pq

    from samsa_spark.operators.similarity import _rademacher_matrix

    X = np.stack(
        pq.read_table(f"{SF_SMALL}/embeddings.parquet")
        .to_pandas()["embedding"]
        .to_numpy()
    ).astype(np.float64)
    M = np.array(_rademacher_matrix(64, 16, 7), dtype=np.float64)
    P = X @ M / 4.0
    rng = np.random.RandomState(0)
    i = rng.randint(0, len(X), 2000)
    j = rng.randint(0, len(X), 2000)
    m = i != j
    d0 = np.linalg.norm(X[i[m]] - X[j[m]], axis=1)
    d1 = np.linalg.norm(P[i[m]] - P[j[m]], axis=1)
    rel = np.abs(d1 - d0) / d0
    assert rel.mean() < 0.40, rel.mean()   # measured 0.31; theory ~0.2
    assert np.percentile(rel, 95) < 0.85   # measured 0.67


def test_random_projection_keeps_near_dups_separable(spark):
    """The use case rp1 feeds (SemDeDup / ANN over projected vectors):
    planted near-duplicate pairs (cos ~0.998) must stay near-duplicates
    after projection, while unrelated pairs stay far — run through the
    ACTUAL Spark operator, not just the numpy model."""
    import pandas as pd

    from samsa_spark.operators.similarity import random_projection

    rng = np.random.RandomState(3)
    base = rng.randn(50, 64)
    dup = base + 0.05 * rng.randn(50, 64)
    rows = []
    for k in range(50):
        rows.append((k, [float(x) for x in base[k]], 0))
        rows.append((1000 + k, [float(x) for x in dup[k]], 0))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    )
    got = {r.vec_id: np.array(r.proj) for r in random_projection(df).collect()}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    pair = [cos(got[k], got[1000 + k]) for k in range(50)]
    cross = [cos(got[k], got[(k + 7) % 50]) for k in range(50)]
    assert min(pair) > 0.95, min(pair)          # measured 0.975
    assert np.mean(cross) < 0.3, np.mean(cross)  # measured -0.12
    # and the operator output is the rounded numpy model exactly
    from samsa_spark.operators.similarity import _rademacher_matrix

    M = np.array(_rademacher_matrix(64, 16, 7), dtype=np.float64)
    want = np.round(base[0] @ M / 4.0, 6)
    assert np.allclose(got[0], want, atol=1e-9)


def test_index_report_counts_and_balance(spark, tmp_path):
    """index_report on a freshly built index: totals reconcile with the
    corpus, occupied+empty == centroid count, and balance == max/mean of
    the actual per-cell sizes; identical on a quantized layout (the
    report never reads vectors)."""
    from samsa_spark import tables
    from samsa_spark.operators.similarity import index_report, load_index, save_index
    from tests.conftest import SF_SMALL

    emb = tables.load(spark, SF_SMALL, "embeddings")
    n = emb.count()
    for quantize in (False, True):
        path = str(tmp_path / f"ivf-{quantize}")
        save_index(emb, path, cells=8, quantize=quantize)
        r = index_report(spark, path).collect()[0]
        assert r.n_vectors == n
        assert r.n_cells == 8
        assert r.n_occupied_cells + r.n_empty_cells == 8
        sizes = [
            x.n
            for x in load_index(spark, path)[1]
            .groupBy("cell")
            .count()
            .withColumnRenamed("count", "n")
            .collect()
        ]
        assert r.max_cell == max(sizes)
        assert abs(r.balance - max(sizes) / (sum(sizes) / len(sizes))) < 0.01


def test_rp2_pca_matches_numpy_and_is_stable(spark):
    """rp2's distributed moment-partial fit must agree with plain numpy
    PCA on the collected corpus to 1e-6 (same covariance, same sign
    convention), the basis must be orthonormal with descending projected
    variance, and repartitioning must not move the projection by more
    than float-sum noise."""
    import numpy as np

    from samsa_spark import tables
    from samsa_spark.operators.similarity import pca_components, pca_projection
    from tests.conftest import SF_SMALL

    emb = tables.load(spark, SF_SMALL, "embeddings")
    mean, W = pca_components(emb, out_dim=8)
    W = np.array(W)
    assert W.shape[1] == 8
    assert np.allclose(W.T @ W, np.eye(8), atol=1e-9), "columns not orthonormal"

    X = np.stack([r.embedding for r in emb.select("embedding").collect()]).astype(
        np.float64
    )
    mu = X.mean(axis=0)
    assert np.allclose(mu, mean, atol=1e-9)
    cov = (X.T @ X) / len(X) - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:8]
    Wnp = vecs[:, order]
    for j in range(8):
        k = int(np.abs(Wnp[:, j]).argmax())
        if Wnp[k, j] < 0:
            Wnp[:, j] = -Wnp[:, j]
    assert np.allclose(W, Wnp, atol=1e-6), "distributed fit diverged from numpy"

    proj = {r.vec_id: np.array(r.proj) for r in pca_projection(emb, out_dim=8).collect()}
    var = np.stack(list(proj.values())).var(axis=0)
    assert all(var[i] >= var[i + 1] - 1e-9 for i in range(7)), "variance not descending"

    again = {
        r.vec_id: np.array(r.proj)
        for r in pca_projection(emb.repartition(7), out_dim=8).collect()
    }
    worst = max(float(np.abs(proj[k] - again[k]).max()) for k in proj)
    assert worst <= 1e-5, f"repartition moved projections by {worst}"


def test_rp2_rows_only_query_runs(spark):
    from tests.conftest import SF_SMALL
    from tests.oracle import check_query

    ok, msg = check_query(spark, "rp2_pca_projection", SF_SMALL)
    assert ok, msg


def test_qz3_oracle_match(spark):
    ok, msg = check_query(spark, "qz3_pq_topk", SF_SMALL)
    assert ok, msg


def _clustered_embeddings(spark, n_clusters=10, per_cluster=30, dim=64, noise=0.05):
    """Planted-structure corpus: well-separated cluster centers + small
    noise — the regime PQ codes are meaningful in (a 4-byte code cannot
    rank near-orthogonal noise, and the docstring says so)."""
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )

    rng = np.random.RandomState(7)
    centers = rng.randn(n_clusters, dim) * 3.0
    rows = []
    for i in range(n_clusters * per_cluster):
        c = i % n_clusters
        v = centers[c] + rng.randn(dim) * noise
        rows.append((i, [float(x) for x in v]))
    schema = StructType(
        [StructField("vec_id", LongType()), StructField("embedding", ArrayType(FloatType()))]
    )
    return spark.createDataFrame(rows, schema), n_clusters


def test_qz3_recall_on_planted_clusters(spark):
    """On a clustered corpus, ADC top-5 must be dominated by same-cluster
    neighbors (vec_id % n_clusters encodes the cluster) — the structure a
    4-byte PQ code exists to preserve."""
    from samsa_spark.operators.similarity import pq_topk

    emb, n_clusters = _clustered_embeddings(spark)
    got = pq_topk(emb, n_probes=20, k=5).collect()
    assert {r.q_id for r in got} == set(range(20))
    same = [1 if r.vec_id % n_clusters == r.q_id % n_clusters else 0 for r in got]
    frac = sum(same) / len(same)
    assert frac >= 0.9, f"same-cluster fraction {frac} (random would be ~0.1)"


def test_qz3_deterministic_under_repartition(spark):
    """Seeds, assignment, means, codes and ADC ranks are all hash/rounding
    deterministic — repartitioning the corpus cannot move a single row."""
    from samsa_spark import tables
    from samsa_spark.operators.similarity import pq_topk

    emb = tables.load(spark, SF_SMALL, "embeddings")
    a = {tuple(r) for r in pq_topk(emb).collect()}
    b = {tuple(r) for r in pq_topk(emb.repartition(7)).collect()}
    assert a == b and len(a) > 0


def test_qz3_codes_shape_and_compression(spark):
    """Every vector reduces to exactly m codes in [0, k) — the 4-byte
    stored form the ADC query scans."""
    from samsa_spark import tables
    from samsa_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        pq_codebooks,
        pq_encode,
    )

    emb = tables.load(spark, SF_SMALL, "embeddings")
    cb = pq_codebooks(emb)
    cb_rows = cb.collect()
    assert len(cb_rows) == PQ_M * PQ_K
    assert all(len(r.cv) == 64 // PQ_M for r in cb_rows)
    codes = pq_encode(emb, cb).collect()
    assert len(codes) == emb.count()
    for r in codes:
        assert len(r.codes) == PQ_M
        assert all(0 <= c < PQ_K for c in r.codes)


def test_dv1_oracle_match(spark):
    ok, msg = check_query(spark, "dv1_diversity_sample", SF_SMALL)
    assert ok, msg


def test_dv1_balanced_coverage_on_skewed_corpus(spark):
    """The operator's reason to exist: on a density-skewed corpus (one
    dominant mode + small minority clusters) the per-cell budget keeps the
    minority regions in the sample, where a uniform sample of the same size
    would spend nearly its whole budget on the dominant mode. Also locks
    the cap (<= per_cell rows per cell) and prototype order (rank 1 is the
    cell's highest centroid cosine)."""
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )

    rng = np.random.RandomState(11)
    dim = 16
    centers = rng.randn(5, dim) * 4.0
    rows = []
    i = 0
    # cluster 0 dominates: 400 of 440 vectors
    for c, n in [(0, 400), (1, 10), (2, 10), (3, 10), (4, 10)]:
        for _ in range(n):
            v = centers[c] + rng.randn(dim) * 0.05
            rows.append((i, [float(x) for x in v], c))
            i += 1
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", LongType()),
        ]
    )
    emb = spark.createDataFrame([(a, b) for a, b, _ in rows], schema[:2])
    truth = {a: c for a, _, c in rows}

    from samsa_spark.operators.similarity import diversity_sample

    got = diversity_sample(emb, cells=8, per_cell=4).collect()
    by_cell: dict = {}
    for r in got:
        by_cell.setdefault(r.cell, []).append(r)
    assert all(len(v) <= 4 for v in by_cell.values())
    assert all(
        [x.ccos for x in sorted(v, key=lambda y: y.cell_rank)]
        == sorted([x.ccos for x in v], reverse=True)
        for v in by_cell.values()
    )
    # every true minority cluster survives into the sample
    sampled_clusters = {truth[r.vec_id] for r in got}
    assert sampled_clusters == {0, 1, 2, 3, 4}
    # and the dominant mode cannot eat the budget: it is 91% of the corpus
    # but at most its cells' share of the sample
    frac0 = sum(1 for r in got if truth[r.vec_id] == 0) / len(got)
    assert frac0 < 0.75, f"dominant-mode sample fraction {frac0}"


def test_dv1_farthest_inverts_selection(spark):
    """farthest=True is the boundary/hard-example regime: per cell it must
    pick the LOWEST centroid cosines, so within any shared cell its picks
    score <= the prototype picks."""
    from samsa_spark import tables
    from samsa_spark.operators.similarity import diversity_sample

    emb = tables.load(spark, SF_SMALL, "embeddings")
    near = diversity_sample(emb, per_cell=3).collect()
    far = diversity_sample(emb, per_cell=3, farthest=True).collect()
    near_min = {}
    for r in near:
        near_min[r.cell] = min(near_min.get(r.cell, 1e9), r.ccos)
    for r in far:
        if r.cell in near_min:
            assert r.ccos <= near_min[r.cell] + 1e-9


def test_qz4_oracle_match(spark):
    ok, msg = check_query(spark, "qz4_ivf_pq_topk", SF_SMALL)
    assert ok, msg


def test_qz4_candidates_come_only_from_probed_cells(spark):
    """The composition's point: every returned neighbor must sit in one of
    its query's IVF_NPROBE nearest coarse cells — the pruning that makes
    ADC scan ~nprobe/cells of the corpus instead of all of it."""
    import pyspark.sql.functions as F

    from samsa_spark import tables
    from samsa_spark.operators.similarity import (
        IVF_NPROBE,
        _cos_sim_udf,
        _nearest_cell,
        ivf_pq_topk,
        kmeans_centroids,
    )

    emb = tables.load(spark, SF_SMALL, "embeddings")
    got = ivf_pq_topk(emb).collect()
    assert len(got) > 0 and {r.q_id for r in got} == set(range(20))

    cents = kmeans_centroids(emb, k=32, iters=1, round_cents=6)
    assign = {
        r.vec_id: r.cell
        for r in _nearest_cell(emb.select("vec_id", "embedding"), cents, "cell").collect()
    }
    probe_scored = (
        emb.select("vec_id", "embedding")
        .where(F.col("vec_id") < 20)
        .crossJoin(F.broadcast(cents))
        .withColumn("ccos", F.round(_cos_sim_udf()("cent", "embedding"), 6))
        .collect()
    )
    by_q: dict = {}
    for r in probe_scored:
        by_q.setdefault(r.vec_id, []).append((-r.ccos, r.cell))
    probed = {q: {c for _, c in sorted(v)[:IVF_NPROBE]} for q, v in by_q.items()}
    for r in got:
        assert assign[r.vec_id] in probed[r.q_id], (r.q_id, r.vec_id)


def test_qz4_recall_on_planted_clusters(spark):
    """With well-separated planted clusters the probed cells contain the
    query's own cluster, so IVF pruning must not cost same-cluster
    recall vs unpruned ADC."""
    from samsa_spark.operators.similarity import ivf_pq_topk

    emb, n_clusters = _clustered_embeddings(spark)
    got = ivf_pq_topk(emb, n_probes=20, k=5, cells=16).collect()
    same = [1 if r.vec_id % n_clusters == r.q_id % n_clusters else 0 for r in got]
    frac = sum(same) / len(same)
    assert frac >= 0.9, f"same-cluster fraction {frac} (random would be ~0.1)"


def test_qz4_deterministic_under_repartition(spark):
    from samsa_spark import tables
    from samsa_spark.operators.similarity import ivf_pq_topk

    emb = tables.load(spark, SF_SMALL, "embeddings")
    a = {tuple(r) for r in ivf_pq_topk(emb).collect()}
    b = {tuple(r) for r in ivf_pq_topk(emb.repartition(7)).collect()}
    assert a == b and len(a) > 0


def test_qz5_oracle_match(spark):
    ok, msg = check_query(spark, "qz5_refined_topk", SF_SMALL)
    assert ok, msg


def test_qz5_exact_scores_and_recall_recovery(spark):
    """The refine stage's contract: (a) every returned score IS the exact
    rounded cosine (numpy ground truth), not an ADC distance; (b) top-5
    recall vs brute force is at least the unrefined ADC ranking's — the
    re-rank can only fix candidate ordering, never worsen it."""
    import numpy as np

    from samsa_spark import tables
    from samsa_spark.operators.similarity import ivf_pq_topk, refined_topk

    emb = tables.load(spark, SF_SMALL, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    X = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}

    def cos(a, b):
        return round(
            float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))), 6
        )

    # numpy brute-force top-5 per probe (rounded cosine, vec_id tie-break)
    truth = {}
    for q in range(20):
        scored = sorted(
            ((cos(X[q], v), i) for i, v in X.items() if i != q),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        truth[q] = {i for _, i in scored}

    refined = refined_topk(emb).collect()
    for r in refined:
        assert r.cos == cos(X[r.q_id], X[r.vec_id]), (r.q_id, r.vec_id)
    ref_sets: dict = {}
    for r in refined:
        ref_sets.setdefault(r.q_id, set()).add(r.vec_id)
    adc_sets: dict = {}
    for r in ivf_pq_topk(emb).collect():
        adc_sets.setdefault(r.q_id, set()).add(r.vec_id)
    rec_ref = sum(len(ref_sets[q] & truth[q]) for q in truth) / (5 * len(truth))
    rec_adc = sum(len(adc_sets[q] & truth[q]) for q in truth) / (5 * len(truth))
    assert rec_ref >= rec_adc, (rec_ref, rec_adc)


def test_qz5_recall_on_planted_clusters(spark):
    """Refined two-stage search keeps (and typically sharpens) qz4's
    same-cluster recall on well-separated planted clusters."""
    from samsa_spark.operators.similarity import refined_topk

    emb, n_clusters = _clustered_embeddings(spark)
    got = refined_topk(emb, n_probes=20, k=5, cells=16).collect()
    same = [1 if r.vec_id % n_clusters == r.q_id % n_clusters else 0 for r in got]
    frac = sum(same) / len(same)
    assert frac >= 0.9, f"same-cluster fraction {frac} (random would be ~0.1)"


def test_qz5_deterministic_under_repartition(spark):
    from samsa_spark import tables
    from samsa_spark.operators.similarity import refined_topk

    emb = tables.load(spark, SF_SMALL, "embeddings")
    a = {tuple(r) for r in refined_topk(emb).collect()}
    b = {tuple(r) for r in refined_topk(emb.repartition(7)).collect()}
    assert a == b and len(a) > 0


def test_qz5_composes_with_residual_ivf_pq(spark):
    """The kwargs pass-through contract: the refine stage runs unchanged
    over qz4's residual-mode candidates (Jégou's actual IVF-ADC) and the
    re-ranked scores are still the exact cosines, keeping planted-cluster
    recall."""
    from samsa_spark.operators.similarity import refined_topk

    emb, n_clusters = _clustered_embeddings(spark)
    got = refined_topk(emb, n_probes=20, k=5, cells=16, residual=True).collect()
    assert {r.q_id for r in got} == set(range(20))
    same = [1 if r.vec_id % n_clusters == r.q_id % n_clusters else 0 for r in got]
    frac = sum(same) / len(same)
    assert frac >= 0.9, f"same-cluster fraction {frac}"


def test_rrf1_oracle_match(spark):
    ok, msg = check_query(spark, "rrf1_hybrid_fusion", SF_SMALL)
    assert ok, msg


def test_rrf1_fuses_only_system_candidates_and_rewards_agreement(spark):
    """Every fused row must come from one of the two systems' top lists;
    any doc ranked by BOTH systems must outscore a doc holding the same
    single-system rank alone (1/(60+r) + something > 1/(60+r)); and the
    probe set is exactly the bm1/sim1 probe ids."""
    import pyspark.sql.functions as F

    from samsa_spark import tables
    from samsa_spark.operators.similarity import _cos_sim_udf, rrf_fusion
    from samsa_spark.operators.text import bm25_topk

    docs = tables.load(spark, SF_SMALL, "documents")
    emb = tables.load(spark, SF_SMALL, "embeddings")
    got = rrf_fusion(docs, emb).collect()
    assert {r.q_id for r in got} == set(range(20))

    lex = {(r.q_id, r.doc_id): r.rank for r in bm25_topk(docs, k=10).collect()}
    base = emb.select("vec_id", "embedding")
    probes = base.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    dscored = (
        base.where(F.col("vec_id") >= 20)
        .crossJoin(F.broadcast(probes))
        .withColumn("cos", F.round(_cos_sim_udf()("q_emb", "embedding"), 6))
        .collect()
    )
    by_q: dict = {}
    for r in dscored:
        by_q.setdefault(r.q_id, []).append((-r.cos, r.vec_id))
    dense = {}
    for q, v in by_q.items():
        for rank, (_, vid) in enumerate(sorted(v)[:10], start=1):
            dense[(q, vid)] = rank
    for r in got:
        key = (r.q_id, r.id)
        assert key in lex or key in dense, key
        expect = round(
            (1.0 / (60 + lex[key]) if key in lex else 0.0)
            + (1.0 / (60 + dense[key]) if key in dense else 0.0),
            6,
        )
        assert abs(r.rrf_score - expect) < 1e-9, (key, r.rrf_score, expect)


def test_qz4_prebuilt_artifacts_match_inline_build(spark):
    """The build-once/query-many split must be semantics-free: passing
    prebuilt codebooks/codes/centroids/assignments reproduces the inline
    builds exactly (same for qz3's codebooks/codes)."""
    from samsa_spark import tables
    from samsa_spark.operators.similarity import (
        _nearest_cell,
        ivf_pq_topk,
        kmeans_centroids,
        pq_codebooks,
        pq_encode,
        pq_topk,
    )

    emb = tables.load(spark, SF_SMALL, "embeddings")
    cb = pq_codebooks(emb).localCheckpoint(eager=True)
    codes = pq_encode(emb, cb).localCheckpoint(eager=True)
    cents = kmeans_centroids(emb, k=32, iters=1, round_cents=6)
    asg = (
        _nearest_cell(emb.select("vec_id", "embedding"), cents, "cell")
        .select("vec_id", "cell")
        .localCheckpoint(eager=True)
    )
    a3 = {tuple(r) for r in pq_topk(emb).collect()}
    b3 = {tuple(r) for r in pq_topk(emb, codebooks=cb, codes=codes).collect()}
    assert a3 == b3 and len(a3) > 0
    a4 = {tuple(r) for r in ivf_pq_topk(emb).collect()}
    b4 = {
        tuple(r)
        for r in ivf_pq_topk(
            emb, codebooks=cb, codes=codes, centroids=cents, assignments=asg
        ).collect()
    }
    assert a4 == b4 and len(a4) > 0


def test_qz4_residual_fidelity_beats_nonresidual(spark):
    """residual=True is Jégou's actual IVF-ADC: PQ quantizes the
    smaller-variance residual, so with the same byte budget the ADC
    distance must track the true L2^2 more closely (lower MAE over all
    returned candidates), at >= the same planted-cluster recall."""
    from samsa_spark.operators.similarity import ivf_pq_topk

    emb, n_clusters = _clustered_embeddings(spark)
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in emb.collect()
    }

    def mae(rows):
        errs = []
        for r in rows:
            true = float(np.sum((vecs[r.q_id] - vecs[r.vec_id]) ** 2))
            errs.append(abs(r.adc_dist - true))
        return sum(errs) / len(errs)

    plain = ivf_pq_topk(emb, n_probes=20, k=5, cells=16).collect()
    res = ivf_pq_topk(emb, n_probes=20, k=5, cells=16, residual=True).collect()
    assert len(res) > 0 and {r.q_id for r in res} == set(range(20))
    assert mae(res) < mae(plain), (mae(res), mae(plain))
    same = [1 if r.vec_id % n_clusters == r.q_id % n_clusters else 0 for r in res]
    assert sum(same) / len(same) >= 0.9


def test_qz4_residual_deterministic_under_repartition(spark):
    from samsa_spark import tables
    from samsa_spark.operators.similarity import ivf_pq_topk

    emb = tables.load(spark, SF_SMALL, "embeddings")
    a = {tuple(r) for r in ivf_pq_topk(emb, residual=True).collect()}
    b = {tuple(r) for r in ivf_pq_topk(emb.repartition(7), residual=True).collect()}
    assert a == b and len(a) > 0


# --- rrf2: ANN-backed hybrid fusion -----------------------------------------


def _clustered_hybrid_corpus(spark, n_clusters=10, per_cluster=12):
    """Aligned documents + embeddings with planted cluster structure: doc i
    and vector i share cluster ``i % n_clusters``; texts carry three
    cluster-distinctive tokens so BOTH retrieval arms see the clusters.
    per_cluster=12 leaves exactly 10 corpus members (ids >= 20) per
    cluster — equal to k_each, so any sane dense metric must retrieve the
    same membership and fused-set recall is a sharp assertion."""
    emb, _ = _clustered_embeddings(spark, n_clusters=n_clusters, per_cluster=per_cluster)
    rows = [
        (
            i,
            f"topic{i % n_clusters} alpha{i % n_clusters} beta{i % n_clusters}"
            f" common filler{i % 3}",
        )
        for i in range(n_clusters * per_cluster)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return docs, emb, n_clusters


def test_rrf2_dense_ranks_passthrough_equals_default(spark):
    """The pluggable dense arm must be algebra-free: feeding rrf_fusion the
    SAME brute-force rank frame it would build internally reproduces the
    default output exactly."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from samsa_spark import tables
    from samsa_spark.operators.similarity import _cos_sim_udf, rrf_fusion

    docs = tables.load(spark, SF_SMALL, "documents")
    emb = tables.load(spark, SF_SMALL, "embeddings")
    base = emb.select("vec_id", "embedding")
    probes = F.broadcast(
        base.where(F.col("vec_id") < 20).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
        )
    )
    wd = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("id"))
    dense = (
        base.where(F.col("vec_id") >= 20)
        .crossJoin(probes)
        .withColumn("cos", F.round(_cos_sim_udf()("q_emb", "embedding"), 6))
        .select("q_id", F.col("vec_id").alias("id"), "cos")
        .withColumn("dense_rank", F.row_number().over(wd))
        .where(F.col("dense_rank") <= 10)
        .select("q_id", "id", "dense_rank")
    )
    a = {tuple(r) for r in rrf_fusion(docs, emb).collect()}
    b = {tuple(r) for r in rrf_fusion(docs, emb, dense_ranks=dense).collect()}
    assert a == b and len(a) > 0


def test_rrf2_ann_recall_vs_brute_twin_on_planted_clusters(spark):
    """The verdict-bar test: ANN-backed fusion (prebuilt IVF-PQ dense arm)
    must retrieve >= 0.9 of the brute-force twin's fused set per query on
    a planted-cluster corpus — the regime where the approximation is
    supposed to be lossless in membership."""
    from samsa_spark.operators.similarity import (
        _nearest_cell,
        kmeans_centroids,
        pq_codebooks,
        pq_encode,
        rrf_fusion,
        rrf_fusion_ann,
    )

    docs, emb, n_clusters = _clustered_hybrid_corpus(spark)
    cents = kmeans_centroids(emb, k=n_clusters, iters=4, round_cents=6)
    asg = _nearest_cell(emb.select("vec_id", "embedding"), cents, "cell").select(
        "vec_id", "cell"
    )
    cb = pq_codebooks(emb).localCheckpoint(eager=True)
    codes = pq_encode(emb, cb)
    brute = rrf_fusion(docs, emb, k_each=10, k=10).collect()
    ann = rrf_fusion_ann(
        docs,
        emb,
        k_each=10,
        k=10,
        centroids=cents,
        assignments=asg,
        codebooks=cb,
        codes=codes,
    ).collect()
    by_q_brute: dict = {}
    for r in brute:
        by_q_brute.setdefault(r.q_id, set()).add(r.id)
    by_q_ann: dict = {}
    for r in ann:
        by_q_ann.setdefault(r.q_id, set()).add(r.id)
    assert set(by_q_ann) == set(range(20))
    recalls = [
        len(by_q_ann.get(q, set()) & s) / len(s) for q, s in by_q_brute.items()
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.9, f"fused-set recall {mean_recall}"
    # the dense arm really is cluster-faithful, not just riding lexical
    same = [
        1 if r.id % n_clusters == r.q_id % n_clusters else 0 for r in ann
    ]
    assert sum(same) / len(same) >= 0.9


def test_rrf2_index_path_roundtrip_matches_in_memory_artifacts(spark):
    """save_pq_index -> rrf_fusion_ann(index_path=) must equal the same
    fusion against identically-parameterized in-memory artifacts: the
    persisted layout is a pure transport, not a different index."""
    import tempfile

    from samsa_spark.operators.similarity import (
        _nearest_cell,
        kmeans_centroids,
        pq_codebooks,
        pq_encode,
        rrf_fusion_ann,
        save_pq_index,
    )

    docs, emb, n_clusters = _clustered_hybrid_corpus(spark)
    path = tempfile.mkdtemp(prefix="samsa-pqidx-")
    save_pq_index(emb, path, cells=n_clusters, iters=4)
    a = {
        tuple(r)
        for r in rrf_fusion_ann(docs, emb, k_each=10, k=10, index_path=path).collect()
    }
    cents = kmeans_centroids(emb, k=n_clusters, iters=4, round_cents=6)
    asg = _nearest_cell(emb.select("vec_id", "embedding"), cents, "cell").select(
        "vec_id", "cell"
    )
    cb = pq_codebooks(emb).localCheckpoint(eager=True)
    codes = pq_encode(emb, cb)
    b = {
        tuple(r)
        for r in rrf_fusion_ann(
            docs,
            emb,
            k_each=10,
            k=10,
            centroids=cents,
            assignments=asg,
            codebooks=cb,
            codes=codes,
        ).collect()
    }
    assert a == b and len(a) > 0


def test_pq_prebuilt_codebook_with_different_k_uses_its_own_stride(spark):
    """The advisor's mis-indexing trap: a prebuilt codebook trained with
    k=8 fed to a call whose default n_cents is 16 must produce the SAME
    result as an inline k=8 build — the stride comes from the codebook,
    never the call's default."""
    from samsa_spark import tables
    from samsa_spark.operators.similarity import pq_codebooks, pq_encode, pq_topk

    emb = tables.load(spark, SF_SMALL, "embeddings")
    cb8 = pq_codebooks(emb, k=8).localCheckpoint(eager=True)
    codes8 = pq_encode(emb, cb8)
    a = {tuple(r) for r in pq_topk(emb, n_cents=8).collect()}
    b = {tuple(r) for r in pq_topk(emb, codebooks=cb8, codes=codes8).collect()}
    assert a == b and len(a) > 0


def test_dv1_salted_topk_equals_unsalted(spark):
    """salt= is a physical-shape lever only: the two-phase
    (cell, salt)-then-cell top-k must reproduce the unsalted window
    exactly (ranks included), in both prototype and farthest order."""
    from samsa_spark import tables
    from samsa_spark.operators.similarity import diversity_sample

    emb = tables.load(spark, SF_SMALL, "embeddings")
    for far in (False, True):
        a = {
            tuple(r)
            for r in diversity_sample(emb, farthest=far).collect()
        }
        b = {
            tuple(r)
            for r in diversity_sample(emb, farthest=far, salt=4).collect()
        }
        assert a == b and len(a) > 0


def test_hn1_hard_negatives_oracle(spark):
    from tests.conftest import SF_SMALL
    from tests.oracle import check_query

    ok, msg = check_query(spark, "hn1_hard_negatives", SF_SMALL)
    assert ok, msg


def test_hn2_semi_hard_negatives_oracle(spark):
    from tests.conftest import SF_SMALL
    from tests.oracle import check_query

    ok, msg = check_query(spark, "hn2_semi_hard_negatives", SF_SMALL)
    assert ok, msg


def _hn_fixture(spark):
    """Probe 0 (label 0) with a planted geometry on the unit circle:
    same-label vec 10 nearest (cos .995), different-label vecs spread from
    near-miss to easy."""
    import math

    def unit(theta):
        return [math.cos(theta), math.sin(theta)]

    rows = [
        (0, unit(0.0), 0),      # probe
        (10, unit(0.1), 0),     # same label, nearest overall -> pos anchor
        (11, unit(0.3), 1),     # hard negative (cos ~.955)
        (12, unit(0.7), 1),     # medium negative (cos ~.765)
        (13, unit(1.4), 2),     # easy negative (cos ~.170)
        (14, unit(3.0), 2),     # far negative (cos ~-.99)
    ]
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    )


def test_hn1_excludes_same_label_neighbors(spark):
    """The nearest vector overall shares the probe's label — it must NOT
    appear; rank 1 is the nearest different-label vector."""
    from samsa_spark.operators.similarity import hard_negatives

    out = [
        (r.vec_id, r.rank)
        for r in hard_negatives(_hn_fixture(spark), n_probes=1, k=4)
        .where("q_id = 0")
        .orderBy("rank")
        .collect()
    ]
    assert [v for v, _ in out] == [11, 12, 13, 14]  # 10 excluded


def test_hn2_band_semantics(spark):
    """pos_cos anchors at the best same-label cosine; only negatives in
    [pos_cos - margin, pos_cos) survive — harder-than-positive and easy
    negatives both excluded."""
    import math

    from samsa_spark.operators.similarity import semi_hard_negatives

    rows = _hn_fixture(spark)
    out = semi_hard_negatives(rows, n_probes=1, k=5, margin=0.3).where("q_id = 0").collect()
    ids = sorted(r.vec_id for r in out)
    # pos_cos = cos(0.1) ~ .995; band [.695, .995): 11 (.955) and 12 (.765)
    assert ids == [11, 12]
    assert all(abs(r.pos_cos - round(math.cos(0.1), 6)) < 1e-9 for r in out)


def test_qz6_oracle_match(spark):
    ok, msg = check_query(spark, "qz6_binary_topk", SF_SMALL)
    assert ok, msg


def test_qz6_matches_independent_python_model(spark):
    """Full independent model check (the note-27 antidote): recompute the
    ENTIRE two-stage pipeline in numpy — sign-bit words packed big-endian
    32 dims at a time, integer Hamming with vec_id tie-break, overfetch
    top-20, exact rounded-cosine re-rank — and require the Spark output to
    match row-for-row. Catches a shared-formula bug the DuckDB twin can't
    (its SQL mirrors the Spark algebra by construction)."""
    import numpy as np

    from samsa_spark import tables
    from samsa_spark.operators.similarity import binary_topk

    emb = tables.load(spark, SF_SMALL, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    X = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}

    def pack(v):
        bits = (v >= 0).astype(np.int64)
        return [
            int("".join(map(str, bits[w : w + 32])), 2)
            for w in range(0, len(bits), 32)
        ]

    codes = {i: pack(v) for i, v in X.items()}

    def cos(a, b):
        return round(float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    expect = set()
    for q in range(20):
        ham = sorted(
            (
                (sum(bin(a ^ b).count("1") for a, b in zip(codes[q], codes[i])), i)
                for i in X
                if i != q
            )
        )[:20]
        rr = sorted(((-cos(X[q], X[i]), i) for _, i in ham))[:5]
        for rank, (negc, i) in enumerate(rr, start=1):
            expect.add((q, i, -negc, rank))

    got = {(r.q_id, r.vec_id, r.cos, r.rank) for r in binary_topk(emb).collect()}
    assert got == expect


def test_qz6_recall_on_planted_clusters(spark):
    """1-bit codes keep same-cluster recall on well-separated planted
    clusters — distinct center directions give distinct sign patterns, so
    the Hamming scan surfaces same-cluster candidates for the exact
    re-rank to order."""
    from samsa_spark.operators.similarity import binary_topk

    emb, n_clusters = _clustered_embeddings(spark)
    got = binary_topk(emb, n_probes=20, k=5).collect()
    same = [1 if r.vec_id % n_clusters == r.q_id % n_clusters else 0 for r in got]
    frac = sum(same) / len(same)
    assert frac >= 0.9, f"same-cluster fraction {frac} (random would be ~0.1)"


def test_qz6_deterministic_under_repartition(spark):
    from samsa_spark import tables
    from samsa_spark.operators.similarity import binary_topk

    emb = tables.load(spark, SF_SMALL, "embeddings")
    a = {tuple(r) for r in binary_topk(emb).collect()}
    b = {tuple(r) for r in binary_topk(emb.repartition(7)).collect()}
    assert a == b and len(a) > 0


def test_qz6_candidate_stage_is_jvm_only(spark):
    """The point of binary quantization is a UDF-free coarse scan: the
    whole plan must contain exactly ONE Python/Arrow eval node — the
    exact-cosine re-rank over the candidate-bounded list. Packing, XOR,
    popcount, and the Hamming top-k all stay in codegen."""
    from samsa_spark import tables
    from samsa_spark.operators.similarity import binary_topk

    emb = tables.load(spark, SF_SMALL, "embeddings")
    import re

    plan = binary_topk(emb)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # formatted mode prints each node twice (tree entry + detail block):
    # count tree entries only.
    assert len(re.findall(r"ArrowEvalPython \(\d+\)", plan)) == 1, plan
    assert "BatchEvalPython" not in plan, plan
    # and the coarse stage keeps its bounded-buffer top-k rewrite
    assert "WindowGroupLimit" in plan, plan


# --- gx1: graph ANN (per-cell kNN graph + beam search) ------------------------


def test_gx1_recall_on_planted_clusters(spark):
    """The round-9 verdict's acceptance bar for the graph tier: >= 0.9
    recall vs the exact sim1 ranking on the planted-cluster corpus, and
    same-cluster domination (the structure a graph walk must preserve)."""
    from samsa_spark.operators.similarity import cosine_topk, graph_topk

    emb, n_clusters = _clustered_embeddings(spark)
    k = 5
    exact = {(r.q_id, r.vec_id) for r in cosine_topk(emb, n_probes=20, k=k).collect()}
    got = graph_topk(emb, n_probes=20, k=k).collect()
    assert {r.q_id for r in got} == set(range(20))
    found = {(r.q_id, r.vec_id) for r in got}
    recall = len(found & exact) / len(exact)
    assert recall >= 0.9, f"graph recall {recall} vs exact"
    same = [1 if r.vec_id % n_clusters == r.q_id % n_clusters else 0 for r in got]
    assert sum(same) / len(same) >= 0.9


def test_gx2_append_graph_equals_frozen_rebuild(spark):
    """append_graph's contract (round-10 verdict task): inserting a batch
    against frozen centroids rewrites only the affected cell partitions,
    and the resulting artifact is BIT-IDENTICAL to rebuilding the whole
    graph from the union corpus with the same frozen centroids — so
    append-then-query equals rebuild-then-query exactly."""
    import tempfile

    from samsa_spark import tables
    from samsa_spark.operators.similarity import (
        append_graph,
        load_graph_index,
        nsw_cell_graph,
        save_graph_index,
    )

    emb = tables.load(spark, SF_SMALL, "embeddings")
    old_half = emb.where("vec_id < 300")
    new_half = emb.where("vec_id >= 300")
    path = tempfile.mkdtemp(prefix="gx-append-")
    save_graph_index(old_half, path, cells=16, spill=2, n_entries=2)
    idx = load_graph_index(spark, path)
    cents = idx["centroids"].localCheckpoint(eager=True)
    appended = append_graph(spark, path, new_half)
    rebuilt = nsw_cell_graph(emb, centroids=cents, spill=2, n_entries=2)

    def canon(df):
        return {(r.vec_id, r.cell, tuple(r.nbrs), r.is_entry) for r in df.collect()}

    assert canon(appended) == canon(rebuilt)
    # derived-from-artifact params (note 36): spill and n_entries survive
    reloaded = load_graph_index(spark, path)["graph"]
    per_vec = reloaded.groupBy("vec_id").count().agg({"count": "max"}).first()[0]
    assert per_vec == 2  # spill baked into the artifact, not the kwarg


def test_gx2_append_graph_query_parity_ev1(spark):
    """ev1-graded query parity on planted clusters: querying the appended
    index matches a fully RETRAINED rebuild (fresh k-means over the union)
    at >= 0.9 recall, and both clear the gx1 recall bar vs exact."""
    import tempfile

    import pyspark.sql.functions as F

    from samsa_spark.operators.similarity import (
        append_graph,
        cosine_topk,
        graph_topk,
        load_graph_index,
        retrieval_metrics,
        save_graph_index,
    )

    emb, _ = _clustered_embeddings(spark)
    emb = emb.localCheckpoint(eager=True)
    path = tempfile.mkdtemp(prefix="gx-append-ev1-")
    save_graph_index(emb.where("vec_id % 3 != 0"), path, cells=10)
    append_graph(spark, path, emb.where("vec_id % 3 = 0"))
    idx = load_graph_index(spark, path)
    # probe_cells=5: a frozen quantizer trained on 2/3 of the corpus sits
    # slightly off the union's density, so the operational answer is wider
    # probing until drift warrants a rebuild (same stance as append_index)
    pred = graph_topk(
        emb, centroids=idx["centroids"], graph=idx["graph"], k=3, probe_cells=5
    )
    retrained = graph_topk(emb, k=3, cells=10, probe_cells=5)
    parity = retrieval_metrics(pred, retrained, k=3).agg(
        F.avg("recall_at_k").alias("r")
    ).first()
    assert parity.r >= 0.9, f"appended vs retrained parity {parity.r}"
    exact = cosine_topk(emb, k=3)
    vs_exact = retrieval_metrics(pred, exact, k=3).agg(
        F.avg("recall_at_k").alias("r")
    ).first()
    assert vs_exact.r >= 0.9, f"appended vs exact recall {vs_exact.r}"


def test_gx1_uniform_corpus_recall_with_spill(spark):
    """The round-10 verdict's hedge: on a UNIFORM corpus (no cluster
    structure — the worst case for any coarse-quantized index, where the
    per-cell graphs are weakest and default gx1 recall sits near probing
    chance ~0.33) spilled assignment (each vector joins its top-3 cells)
    plus wider probing reaches recall >= 0.9 vs exact sim1, graded by the
    ev1 operator itself. Determinism preserved under repartition."""
    import numpy as np
    import pyspark.sql.functions as F

    from samsa_spark.operators.similarity import (
        cosine_topk,
        graph_topk,
        retrieval_metrics,
    )

    rng = np.random.default_rng(7)
    X = rng.standard_normal((2000, 64)).astype(np.float32)
    emb = spark.createDataFrame(
        [(int(i), X[i].tolist()) for i in range(2000)],
        "vec_id long, embedding array<float>",
    ).localCheckpoint(eager=True)
    truth = cosine_topk(emb, k=3).localCheckpoint(eager=True)
    pred = graph_topk(emb, n_probes=20, k=3, probe_cells=8, spill=3)
    m = retrieval_metrics(pred, truth, k=3).agg(
        F.avg("recall_at_k").alias("r")
    ).first()
    assert m.r >= 0.9, f"uniform-corpus recall {m.r}"
    # spilled top-k rows stay unique per (q_id, vec_id)
    dup = (
        pred.groupBy("q_id", "vec_id").count().where("count > 1").count()
    )
    assert dup == 0
    a = {tuple(r) for r in pred.collect()}
    b = {
        tuple(r)
        for r in graph_topk(
            emb.repartition(7), n_probes=20, k=3, probe_cells=8, spill=3
        ).collect()
    }
    assert a == b


def test_gx1_prebuilt_graph_requires_centroids(spark):
    """A prebuilt graph without its centroid table must raise (round-10
    advice): rebuilding a default quantizer would probe cell ids that
    don't match the graph's cells and silently degrade recall — the same
    prebuilt-artifact mismatch class note 36 fixed for PQ codebooks."""
    import pytest

    from samsa_spark import tables
    from samsa_spark.operators.similarity import (
        graph_topk,
        kmeans_centroids,
        nsw_cell_graph,
    )

    emb = tables.load(spark, SF_SMALL, "embeddings")
    cents = kmeans_centroids(emb, k=8).localCheckpoint(eager=True)
    g = nsw_cell_graph(emb, centroids=cents, cells=8)
    with pytest.raises(ValueError, match="centroids"):
        graph_topk(emb, graph=g)
    # the supported prebuilt path still works
    assert graph_topk(emb, graph=g, centroids=cents, k=3).count() > 0


def test_gx1_deterministic_under_repartition(spark):
    """Quantizer seeds, graph edges, entry points and the walk itself are
    all hash/rounding deterministic — repartitioning moves nothing."""
    from samsa_spark import tables
    from samsa_spark.operators.similarity import graph_topk

    emb = tables.load(spark, SF_SMALL, "embeddings")
    a = {tuple(r) for r in graph_topk(emb).collect()}
    b = {tuple(r) for r in graph_topk(emb.repartition(7)).collect()}
    assert a == b and len(a) > 0


def test_gx1_graph_shape_invariants(spark):
    """The build artifact: out-degree <= GX_M + 2 (kNN edges plus the two
    rank-chain connectivity edges), no self-edges, neighbors stay within
    the cell, exactly one entry point per cell (default n_entries), and —
    the property the chain exists for — every cell's graph is CONNECTED
    even if the quantizer merged separate clusters into it."""
    from samsa_spark.operators.similarity import GX_M, nsw_cell_graph

    emb, _ = _clustered_embeddings(spark)
    g = nsw_cell_graph(emb).collect()
    by_cell = {}
    cell_of = {r.vec_id: r.cell for r in g}
    for r in g:
        by_cell.setdefault(r.cell, []).append(r)
        assert len(r.nbrs) <= GX_M + 2
        assert r.vec_id not in r.nbrs
        assert all(cell_of[d] == r.cell for d in r.nbrs)
    for cell, rows in by_cell.items():
        assert sum(1 for r in rows if r.is_entry) == 1, f"cell {cell}"
        adj = {r.vec_id: set(r.nbrs) for r in rows}
        seen = set()
        stack = [rows[0].vec_id]
        while stack:
            v = stack.pop()
            if v in seen:
                continue
            seen.add(v)
            stack.extend(adj[v] - seen)
        assert seen == set(adj), f"cell {cell} graph disconnected"


def test_gx1_prebuilt_artifacts_match_inline(spark):
    """The build-once/query-many split: querying prebuilt centroid/graph
    artifacts returns exactly the inline-build result (the PQ-codebook
    lifecycle pattern, note 36's prebuilt-artifact contract)."""
    from samsa_spark import tables
    from samsa_spark.operators.similarity import (
        graph_topk,
        kmeans_centroids,
        nsw_cell_graph,
    )

    emb = tables.load(spark, SF_SMALL, "embeddings")
    cents = kmeans_centroids(emb, k=32).localCheckpoint(eager=True)
    g = nsw_cell_graph(emb, centroids=cents).localCheckpoint(eager=True)
    pre = {tuple(r) for r in graph_topk(emb, centroids=cents, graph=g).collect()}
    inline = {tuple(r) for r in graph_topk(emb).collect()}
    assert pre == inline and pre


# --- ev2: paired sign-test ranker comparison ------------------------------------


def test_ev2_oracle_match(spark):
    ok, msg = check_query(spark, "ev2_ranker_sign_test", SF_SMALL)
    assert ok, msg


def test_ev2_hand_computed_sign_test(spark):
    """Synthetic rankings with known outcomes: truth = items 1..3 per
    query; ranker A hits all three, ranker B hits only one, on 5 of 6
    queries (1 tie where both hit everything). n=5 non-ties, all wins:
    p = 2 * C(5,0) / 2^5 = 0.0625. Swapping A and B flips wins/losses
    but not p; identical rankers give all ties and p = 1."""
    from samsa_spark.operators.similarity import ranker_sign_test

    def frame(rows):
        return spark.createDataFrame(rows, "q_id long, vec_id long, rank long")

    truth = frame([(q, v, r) for q in range(6) for r, v in enumerate((1, 2, 3), 1)])
    a_rows = [(q, v, r) for q in range(6) for r, v in enumerate((1, 2, 3), 1)]
    b_rows = []
    for q in range(6):
        if q == 5:  # the tie: B hits everything too
            b_rows += [(q, v, r) for r, v in enumerate((1, 2, 3), 1)]
        else:  # B hits only item 1
            b_rows += [(q, 1, 1), (q, 90, 2), (q, 91, 3)]
    got = ranker_sign_test(frame(a_rows), frame(b_rows), truth, k=3).collect()[0]
    assert (got.n_queries, got.n_wins, got.n_losses, got.n_ties) == (6, 5, 0, 1)
    assert got.p_sign == 0.0625
    rev = ranker_sign_test(frame(b_rows), frame(a_rows), truth, k=3).collect()[0]
    assert (rev.n_wins, rev.n_losses, rev.p_sign) == (0, 5, 0.0625)
    same = ranker_sign_test(frame(a_rows), frame(a_rows), truth, k=3).collect()[0]
    assert (same.n_wins, same.n_losses, same.n_ties, same.p_sign) == (0, 0, 6, 1.0)


def test_ev2_mixed_outcome_two_sided_p(spark):
    """w=4, l=1 over 5 non-ties: p = 2*(C(5,0)+C(5,1))/32 = 0.375."""
    from samsa_spark.operators.similarity import ranker_sign_test

    def frame(rows):
        return spark.createDataFrame(rows, "q_id long, vec_id long, rank long")

    truth = frame([(q, v, r) for q in range(5) for r, v in enumerate((1, 2, 3), 1)])
    a_rows, b_rows = [], []
    for q in range(5):
        if q == 4:  # B wins this one
            a_rows += [(q, 1, 1), (q, 80, 2), (q, 81, 3)]
            b_rows += [(q, v, r) for r, v in enumerate((1, 2, 3), 1)]
        else:  # A wins
            a_rows += [(q, v, r) for r, v in enumerate((1, 2, 3), 1)]
            b_rows += [(q, 1, 1), (q, 90, 2), (q, 91, 3)]
    got = ranker_sign_test(frame(a_rows), frame(b_rows), truth, k=3).collect()[0]
    assert (got.n_wins, got.n_losses) == (4, 1)
    assert got.p_sign == 0.375


def test_ev2_no_ceiling_large_n_exact(spark):
    """Round-11 verdict task 3: past 20 non-tied queries the p-value no
    longer raises — the log-space backward-ratio fold evaluates the SAME
    exact binomial tail. Planted 50-query fixture (35 wins / 10 losses /
    5 ties): p must equal the Python-rational exact value rounded to 6 dp
    (2*sum_{i<=10} C(45,i)/2^45 = 0.000247); 25 straight wins (m=0 edge
    at nn>20) gives 2*0.5^25 -> 0.0 at 6 dp."""
    import math
    from fractions import Fraction

    from samsa_spark.operators.similarity import ranker_sign_test

    def frame(rows):
        return spark.createDataFrame(rows, "q_id long, vec_id long, rank long")

    hit = lambda q: [(q, v, r) for r, v in enumerate((1, 2, 3), 1)]  # noqa: E731
    miss = lambda q: [(q, 90 + r, r) for r in (1, 2, 3)]  # noqa: E731
    truth = frame([row for q in range(50) for row in hit(q)])
    # q 0-34: A wins; q 35-44: B wins; q 45-49: tie (both hit)
    a_rows = [row for q in range(35) for row in hit(q)]
    a_rows += [row for q in range(35, 45) for row in miss(q)]
    a_rows += [row for q in range(45, 50) for row in hit(q)]
    b_rows = [row for q in range(35) for row in miss(q)]
    b_rows += [row for q in range(35, 50) for row in hit(q)]
    got = ranker_sign_test(frame(a_rows), frame(b_rows), truth, k=3).collect()[0]
    assert (got.n_queries, got.n_wins, got.n_losses, got.n_ties) == (50, 35, 10, 5)
    exact = min(
        1.0,
        round(float(2 * Fraction(sum(math.comb(45, i) for i in range(11)), 2**45)), 6),
    )
    assert got.p_sign == exact == 0.000247

    # m = 0 at nn > 20: 25 straight wins
    t25 = frame([row for q in range(25) for row in hit(q)])
    a25 = [row for q in range(25) for row in hit(q)]
    b25 = [row for q in range(25) for row in miss(q)]
    g25 = ranker_sign_test(frame(a25), frame(b25), t25, k=3).collect()[0]
    assert (g25.n_wins, g25.n_losses, g25.p_sign) == (25, 0, 0.0)

    # balanced large: 15/15 -> tail > 1/2, p clamps to 1.0
    t30 = frame([row for q in range(30) for row in hit(q)])
    a30 = [row for q in range(15) for row in hit(q)] + [
        row for q in range(15, 30) for row in miss(q)
    ]
    b30 = [row for q in range(15) for row in miss(q)] + [
        row for q in range(15, 30) for row in hit(q)
    ]
    g30 = ranker_sign_test(frame(a30), frame(b30), t30, k=3).collect()[0]
    assert (g30.n_wins, g30.n_losses, g30.p_sign) == (15, 15, 1.0)


def test_ev3_wide_oracle_match(spark):
    """The registered 60-probe variant (nn > 20 on the sf fixtures) runs
    the no-ceiling branch against its recursive-CTE DuckDB twin."""
    ok, msg = check_query(spark, "ev3_sign_test_wide", SF_SMALL)
    assert ok, msg


# --- ev1: in-engine retrieval metrics -----------------------------------------


def test_ev1_oracle_match(spark):
    ok, msg = check_query(spark, "ev1_retrieval_metrics", SF_SMALL)
    assert ok, msg


def test_ev1_hand_computed_metrics(spark):
    """recall@k / MRR@k / nDCG@k on a hand-built case: partial hit with a
    known DCG, a zero-hit query, and a perfect query."""
    import math

    from samsa_spark.operators.similarity import retrieval_metrics

    truth = spark.createDataFrame(
        [(1, t, r) for r, t in enumerate((10, 20, 30), 1)]
        + [(2, t, r) for r, t in enumerate((40, 50, 60), 1)]
        + [(3, t, r) for r, t in enumerate((70, 80, 90), 1)],
        "q_id long, vec_id long, rank long",
    )
    pred = spark.createDataFrame(
        # q1: hits at pred ranks 1 and 3 (items 20, 30), miss at 2
        [(1, 20, 1), (1, 99, 2), (1, 30, 3)]
        # q2: no hits at all
        + [(2, 97, 1), (2, 98, 2), (2, 99, 3)]
        # q3: perfect (order permuted — rank set is what matters)
        + [(3, 80, 1), (3, 90, 2), (3, 70, 3)],
        "q_id long, vec_id long, rank long",
    )
    got = {r.q_id: r for r in retrieval_metrics(pred, truth, k=3).collect()}
    idcg = sum(1.0 / math.log2(i + 1) for i in (1, 2, 3))
    dcg1 = 1.0 / math.log2(2) + 1.0 / math.log2(4)
    r1 = got[1]
    assert (r1.n_truth, r1.n_hit) == (3, 2)
    assert r1.recall_at_k == round(2 / 3, 6)
    assert r1.mrr_at_k == 1.0
    assert r1.ndcg_at_k == round(dcg1 / idcg, 6)
    r2 = got[2]
    assert (r2.n_hit, r2.recall_at_k, r2.mrr_at_k, r2.ndcg_at_k) == (0, 0.0, 0.0, 0.0)
    r3 = got[3]
    assert (r3.recall_at_k, r3.mrr_at_k, r3.ndcg_at_k) == (1.0, 1.0, 1.0)


def test_ev1_identity_and_graph_grading(spark):
    """Grading a ranking against itself is all ones; grading gx1 against
    brute force in-engine reproduces the pytest recall bar (>= 0.9 mean
    recall on planted clusters) — the operator IS the test, in-engine."""
    import pyspark.sql.functions as F

    from samsa_spark.operators.similarity import (
        cosine_topk,
        graph_topk,
        retrieval_metrics,
    )

    emb, _ = _clustered_embeddings(spark)
    truth = cosine_topk(emb, k=3)
    ident = retrieval_metrics(truth, truth, k=3).collect()
    assert all(
        (r.recall_at_k, r.mrr_at_k, r.ndcg_at_k) == (1.0, 1.0, 1.0) for r in ident
    )
    graded = retrieval_metrics(graph_topk(emb, k=3), truth, k=3)
    mean_recall = graded.agg(F.avg("recall_at_k")).first()[0]
    assert mean_recall >= 0.9


def test_ev1_matches_python_model_on_random_rankings(spark):
    """Randomized model check: ev1 must equal an independent pure-Python
    metric computation on arbitrary pred/truth rankings — including
    queries missing from pred, partial prediction lists, and rank sets
    larger than k (trimmed identically on both sides)."""
    import math
    import random

    from samsa_spark.operators.similarity import retrieval_metrics

    for seed in (21, 22, 23):
        rng = random.Random(seed)
        k = 4
        truth_rows, pred_rows = [], []
        model = {}
        for q in range(12):
            items = rng.sample(range(100), 8)
            truth = items[:k]
            truth_rows += [(q, t, r) for r, t in enumerate(truth, 1)]
            if q % 5 == 4:
                pred = []  # query absent from pred entirely
            else:
                pool = items + rng.sample(range(100, 200), 4)
                rng.shuffle(pool)
                pred = pool[: rng.randint(1, 6)]  # may exceed k: trimmed
            pred_rows += [(q, v, r) for r, v in enumerate(pred, 1)]
            pk = [v for r, v in enumerate(pred, 1) if r <= k]
            hits = [(r, v) for r, v in enumerate(pk, 1) if v in set(truth)]
            dcg = sum(1.0 / math.log2(r + 1) for r, _ in hits)
            idcg = sum(1.0 / math.log2(i + 1) for i in range(1, len(truth) + 1))
            model[q] = (
                len(truth),
                len(hits),
                round(len(hits) / len(truth), 6),
                round(1.0 / hits[0][0], 6) if hits else 0.0,
                round(dcg / idcg, 6),
            )
        pred_df = spark.createDataFrame(
            pred_rows or [(0, 0, 99)], "q_id long, vec_id long, rank long"
        )
        truth_df = spark.createDataFrame(truth_rows, "q_id long, vec_id long, rank long")
        got = {
            r.q_id: (r.n_truth, r.n_hit, r.recall_at_k, r.mrr_at_k, r.ndcg_at_k)
            for r in retrieval_metrics(pred_df, truth_df, k=k).collect()
        }
        assert got == model, f"seed {seed}"


def test_ev4_oracle_match(spark):
    ok, msg = check_query(spark, "ev4_bootstrap_ci", SF_SMALL)
    assert ok, msg


def test_ev4_bootstrap_matches_python_model(spark):
    """The deterministic Poisson bootstrap is fully reproducible outside
    the engine: per-query integer diffs, the portable-hash Poisson(1)
    weights, and discrete quantiles reimplemented in ~15 lines of Python
    must equal the engine's output exactly (no RNG anywhere)."""
    import math

    from samsa_spark.operators.similarity import ranker_bootstrap_ci

    def frame(rows):
        return spark.createDataFrame(rows, "q_id long, vec_id long, rank long")

    hit = lambda q: [(q, v, r) for r, v in enumerate((1, 2, 3), 1)]  # noqa: E731
    one = lambda q: [(q, 1, 1), (q, 90, 2), (q, 91, 3)]  # noqa: E731
    miss = lambda q: [(q, 80 + r, r) for r in (1, 2, 3)]  # noqa: E731
    Q, B = 12, 200
    truth = frame([row for q in range(Q) for row in hit(q)])
    # diffs by construction: q 0-5 -> +2 (A all, B one); 6-8 -> -3
    # (A none, B all); 9-11 -> 0 (both all)
    a_rows = [row for q in range(6) for row in hit(q)]
    a_rows += [row for q in range(6, 9) for row in miss(q)]
    a_rows += [row for q in range(9, Q) for row in hit(q)]
    b_rows = [row for q in range(6) for row in one(q)]
    b_rows += [row for q in range(6, Q) for row in hit(q)]
    got = ranker_bootstrap_ci(
        frame(a_rows), frame(b_rows), truth, k=3, n_replicates=B
    ).collect()[0]

    from samsa_spark.operators.similarity import _POIS1_CDF

    d = [2] * 6 + [-3] * 3 + [0] * 3  # indexed by q_id

    def weight(r, q):
        mixed = ((q >> 31) ^ q) & 2147483647
        u = ((mixed * 211 + r) % 1000003) * 2654435761 % 1000003 / 1000003.0
        for i, c in enumerate(_POIS1_CDF):
            if u < c:
                return i
        return len(_POIS1_CDF)

    sums = [sum(weight(r, q) * d[q] for q in range(Q)) for r in range(B)]
    sums.sort()

    def qdisc(p):  # SQL-standard discrete quantile: smallest cume_dist >= p
        return sums[math.ceil(p * B) - 1]

    assert got.n_queries == Q and got.n_replicates == B
    assert got.mean_diff == round(sum(d) / Q, 6)
    assert got.ci_lo == round(qdisc(0.025) / Q, 6)
    assert got.ci_hi == round(qdisc(0.975) / Q, 6)
    assert got.ci_lo <= got.mean_diff <= got.ci_hi


# --- cl1: clustering-quality report ------------------------------------------


def test_cl1_oracle_match(spark):
    ok, msg = check_query(spark, "cl1_cluster_quality", SF_SMALL)
    assert ok, msg


def _seed_hash(vec_id: int) -> int:
    """The kmeans_centroids seed-ranking hash (engine formula)."""
    return (((vec_id >> 31) ^ vec_id) & 2147483647) * 2654435761 % 1000003


def test_cl1_planted_separated_clusters(spark):
    """Two orthogonal clusters, membership arranged so the two smallest-hash
    ids (the k=2 Lloyd seeds) land one per cluster: every vector must sit in
    its own cluster's cell with a wide assignment margin and near-zero
    centroid cross-similarity."""
    from samsa_spark.operators.similarity import cluster_quality

    ids = sorted(range(8), key=_seed_hash)
    a_ids = {ids[0]} | set(ids[2:5])   # seed A + 3 more
    rows = []
    for v in range(8):
        base = [1.0, 0.0, 0.0, 0.01 * v] if v in a_ids else [0.0, 1.0, 0.0, 0.01 * v]
        rows.append((v, base))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    rep = {r.cell: r for r in cluster_quality(emb, k=2).collect()}
    assert set(rep) == {ids[0], ids[1]}
    for r in rep.values():
        assert r.n == 4
        assert r.mean_own_cos > 0.99
        assert r.mean_margin > 0.9
        assert r.nn_cent_cos < 0.1


def test_cl1_duplicate_centroids_flag_merge(spark):
    """All-identical vectors: the two seeds collapse to the same centroid —
    everything lands in the smaller cell, margin 0, nn_cent_cos 1 (the
    merge-these-cells signal)."""
    from samsa_spark.operators.similarity import cluster_quality

    emb = spark.createDataFrame(
        [(v, [1.0, 2.0, 3.0]) for v in range(6)],
        "vec_id long, embedding array<double>",
    )
    rows = cluster_quality(emb, k=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n == 6 and r.mean_margin == 0.0 and r.nn_cent_cos == 1.0
