"""mf1 ALS: bit-level equality against an independent single-node numpy
model (the distributed bucketing must be invisible to the numerics),
rank-1 structure recovery, and convergence monotonicity."""

from __future__ import annotations

import math

import numpy as np
import pytest


def _model_als(triples, k=4, iterations=3, reg=0.1):
    """Single-node reference: same init hash, same per-entity (g, o)-sorted
    accumulation, same batched solve — everything the engine distributes,
    re-derived without Spark."""
    from samsa_spark.operators.factorization import _init_factors

    arr = sorted(triples)
    users = np.array(sorted({u for u, _, _ in arr}), np.int64)
    items = np.array(sorted({i for _, i, _ in arr}), np.int64)
    ifac = _init_factors(items, k)
    ufac = None

    def solve(gkey, okey, fixed_ids, fixed_fac):
        rows = sorted(triples, key=lambda t: (t[gkey], t[okey]))
        g = np.array([t[gkey] for t in rows], np.int64)
        o = np.array([t[okey] for t in rows], np.int64)
        rt = np.array([t[2] for t in rows], np.float64)
        q = fixed_fac[np.searchsorted(fixed_ids, o)]
        uids, uidx = np.unique(g, return_inverse=True)
        A = np.zeros((len(uids), k, k))
        B = np.zeros((len(uids), k))
        np.add.at(A, uidx, q[:, :, None] * q[:, None, :])
        np.add.at(B, uidx, q * rt[:, None])
        A += reg * np.eye(k)[None]
        return uids, np.linalg.solve(A, B)

    history = []
    for _ in range(iterations):
        users, ufac = solve(0, 1, items, ifac)
        items, ifac = solve(1, 0, users, ufac)
        se = 0.0
        n = 0
        for u, i, r in arr:
            p = float(
                ufac[np.searchsorted(users, u)] @ ifac[np.searchsorted(items, i)]
            )
            se += (r - p) ** 2
            n += 1
        history.append(math.sqrt(se / n))
    return users, ufac, items, ifac, history


def _synthetic_triples():
    """Deterministic pseudo-random ratings: 40 users x 12 items, ~1/3 of
    cells observed, integer-hash ratings in [1, 5]."""
    out = []
    for u in range(1, 41):
        for i in range(1, 13):
            h = (u * 2654435761 + i * 40503) % 97
            if h % 3 == 0:
                out.append((u, i, 1.0 + (h % 40) / 10.0))
    return out


def test_mf1_engine_matches_model_bit_level(spark):
    from samsa_spark.operators.factorization import als_factorize

    triples = _synthetic_triples()
    df = spark.createDataFrame(triples, "user long, item long, rating double")
    u_ids, u_fac, i_ids, i_fac, hist = als_factorize(df)
    mu_ids, mu_fac, mi_ids, mi_fac, mhist = _model_als(triples)
    assert np.array_equal(u_ids, mu_ids) and np.array_equal(i_ids, mi_ids)
    # the factor solves must be bit-identical: same accumulation order,
    # same LAPACK inputs
    assert np.array_equal(u_fac, mu_fac), np.abs(u_fac - mu_fac).max()
    assert np.array_equal(i_fac, mi_fac), np.abs(i_fac - mi_fac).max()
    # only the RMSE reduction crosses partitions -> tolerance, not equality
    assert all(abs(a - b) < 1e-9 for a, b in zip(hist, mhist))


def test_mf1_bucketing_invariance(spark):
    """1 bucket vs 16 buckets must give identical factors — the bucket
    fan-out is transport, not algebra."""
    from samsa_spark.operators.factorization import als_factorize

    df = spark.createDataFrame(
        _synthetic_triples(), "user long, item long, rating double"
    )
    _, u1, _, i1, _ = als_factorize(df, buckets=1)
    _, u16, _, i16, _ = als_factorize(df, buckets=16)
    assert np.array_equal(u1, u16) and np.array_equal(i1, i16)


def test_mf1_recovers_rank1_structure(spark):
    """Exact rank-1 ratings (r_ui = a_u * b_i) must factorize to near-zero
    RMSE with small regularization."""
    from samsa_spark.operators.factorization import als_factorize

    triples = [
        (u, i, (1.0 + u / 7.0) * (0.5 + i / 5.0))
        for u in range(1, 21)
        for i in range(1, 9)
    ]
    df = spark.createDataFrame(triples, "user long, item long, rating double")
    *_, hist = als_factorize(df, k=2, iterations=4, reg=1e-3)
    assert hist[-1] < 0.01, hist


def test_mf1_convergence_history_non_increasing(spark):
    from samsa_spark.operators.factorization import als_convergence

    orders = spark.createDataFrame(
        [(o, o % 7 + 1) for o in range(1, 60)], "o_orderkey long, o_custkey long"
    )
    lineitem = spark.createDataFrame(
        [(o, (o * 3) % 5 + 1) for o in range(1, 60)]
        + [(o, (o * 5) % 5 + 1) for o in range(1, 40)],
        "l_orderkey long, l_suppkey long",
    )
    rows = als_convergence(orders, lineitem).collect()
    vals = [r.rmse for r in sorted(rows, key=lambda r: r.iteration)]
    assert len(vals) == 3
    assert all(a >= b - 1e-12 for a, b in zip(vals, vals[1:])), vals


def test_mf1_frame_form_equals_array_form(spark):
    """return_frames=True (the 100x form — factors never collected inside
    the loop) must carry bit-identical factors to the array-returning API:
    the block join is transport, not algebra."""
    from samsa_spark import tables
    from samsa_spark.operators.factorization import als_factorize

    df = spark.createDataFrame(
        _synthetic_triples(), "user long, item long, rating double"
    )
    u_ids, u_fac, i_ids, i_fac, hist = als_factorize(df)
    user_df, item_df, fhist = als_factorize(df, return_frames=True)
    urows = sorted(user_df.collect(), key=lambda r: r.id)
    irows = sorted(item_df.collect(), key=lambda r: r.id)
    tables.free_checkpoint(user_df)
    tables.free_checkpoint(item_df)
    assert np.array_equal(u_ids, np.array([r.id for r in urows]))
    assert np.array_equal(u_fac, np.array([r.factors for r in urows]))
    assert np.array_equal(i_fac, np.array([r.factors for r in irows]))
    # only the RMSE reduction crosses partitions (module docstring) — the
    # partial-sum order may differ by an ulp between invocations
    assert all(abs(a - b) < 1e-9 for a, b in zip(hist, fhist))


def test_mf1_zero_iterations_fails_fast(spark):
    """iterations < 1 has no meaningful result (no user factors exist yet)
    — fail fast instead of leaking a placeholder."""
    from samsa_spark.operators.factorization import als_factorize

    df = spark.createDataFrame(
        [(1, 1, 3.0)], "user long, item long, rating double"
    )
    with pytest.raises(ValueError, match="iterations"):
        als_factorize(df, iterations=0)


def test_mf1_array_api_collect_guard(spark):
    """The array-returning API collects one row per entity — a frame that
    grows with the data. Past COLLECT_FACTOR_MAX_ROWS it must fail loudly
    with the return_frames pointer, not OOM the driver (round-13 verdict)."""
    from samsa_spark.operators.factorization import _collect_factor_frame

    df = spark.createDataFrame(
        [(i, [0.1, 0.2]) for i in range(10)], "id long, factors array<double>"
    )
    ids, fac = _collect_factor_frame(df, max_rows=10)  # at the limit: fine
    assert len(ids) == 10 and fac.shape == (10, 2)
    with pytest.raises(ValueError, match="return_frames=True"):
        _collect_factor_frame(df, max_rows=9)
