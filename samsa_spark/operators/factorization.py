"""Distributed matrix factorization: ALS (alternating least squares) over an
explicit-rating matrix — the collaborative-filtering / embedding-pretraining
stage (Koren/Bell/Volinsky 2009; Spark MLlib ships it as ml.recommendation.ALS,
re-expressed here over the public DataFrame + applyInPandas surface so the
numerics are deterministic and model-checkable).

The reference engine has nothing in this family (SURVEY.md §2.3 absence
list: iterative algorithms); mf1 extends the iterative tier (dd6 connected
components, pr1 PageRank, lp1 LPA) with distributed least squares.

Scale shape: the RATINGS table (the part that grows) stays distributed and
is localCheckpoint-ed once (it feeds 2 passes per iteration — note 12).
Each half-step solves one side's k x k normal equations per entity inside
``applyInPandas`` — grouped NOT by entity but by ``pmod(entity, buckets)``
(note 43: ~10 ms per Python group would make per-user groups the
bottleneck), with batched ``np.linalg.solve`` over all entities of a
bucket at once (note 44: no per-entity pandas groupby either — one
np.add.at segment accumulation per bucket). The fixed side's factors ride
into the closure as a (sorted-ids, matrix) pair — factor state is
entity-cardinality, orders of magnitude below the ratings volume, the same
bounded-broadcast class as every centroid/codebook artifact here; a
trillion-edge deployment would swap the closure broadcast for a
co-partitioned block join, which changes the transport, not the algebra.

Determinism: init factors are a pure integer-arithmetic hash of
(id, component); every bucket sorts its rows by (entity, other-entity)
before accumulating, so np.add.at order — and therefore every float64 op —
is reproducible bit-for-bit and replicated by the single-node numpy model
in tests. Only the final RMSE reduction crosses partitions (sum of 64-ish
partial sums), which is why the convergence report rounds to 6 dp
(note 6 discipline) and the model test uses a 1e-9 tolerance there while
demanding bit-equality on the factors themselves.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from samsa_spark import tables


def _init_factors(ids, k: int):
    """Deterministic small init in [-0.1, 0.1): pure integer arithmetic on
    (id, component) — reproducible in any engine, no RNG state."""
    import numpy as np

    ids = np.asarray(ids, dtype=np.int64)
    comps = np.arange(k, dtype=np.int64)
    h = (ids[:, None] * 2654435761 + comps[None, :] * 40503) % 1000003
    return (h.astype(np.float64) / 1000003.0 - 0.5) * 0.2


def _make_solver(fixed_ids, fixed_fac, gcol: str, ocol: str, k: int, reg: float):
    """Closure (note 4) solving one side's normal equations for every
    entity in a bucket with one batched np.linalg.solve."""

    def solve(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values([gcol, ocol], kind="mergesort")
        g = pdf[gcol].to_numpy(np.int64)
        o = pdf[ocol].to_numpy(np.int64)
        rt = pdf["rating"].to_numpy(np.float64)
        q = fixed_fac[np.searchsorted(fixed_ids, o)]  # (n, k)
        uids, uidx = np.unique(g, return_inverse=True)
        A = np.zeros((len(uids), k, k))
        B = np.zeros((len(uids), k))
        np.add.at(A, uidx, q[:, :, None] * q[:, None, :])
        np.add.at(B, uidx, q * rt[:, None])
        A += reg * np.eye(k)[None]
        fac = np.linalg.solve(A, B)
        return pd.DataFrame({"id": uids, "factors": list(fac)})

    return solve


def als_factorize(
    ratings: DataFrame,
    k: int = 4,
    iterations: int = 3,
    reg: float = 0.1,
    buckets: int | None = None,
):
    """mf1 core — ALS over ``(user, item, rating)``. Returns
    ``(user_ids, user_factors, item_ids, item_factors, rmse_history)`` as
    numpy arrays (ids sorted ascending; factors row-aligned) plus the
    per-iteration RMSE list. See the module docstring for the scale and
    determinism contract."""
    import numpy as np

    spark = ratings.sparkSession
    if buckets is None:
        buckets = spark.sparkContext.defaultParallelism * 2
    r = (
        ratings.select(
            F.col("user").cast("long").alias("user"),
            F.col("item").cast("long").alias("item"),
            F.col("rating").cast("double").alias("rating"),
        )
        .localCheckpoint(eager=True)
    )
    item_ids = np.array(
        sorted(x[0] for x in r.select("item").distinct().collect()), dtype=np.int64
    )
    item_fac = _init_factors(item_ids, k)
    user_ids = item_ids  # placeholder; set by the first user solve
    user_fac = None
    out_schema = f"id long, factors array<double>"

    def _solve_side(gcol, ocol, fixed_ids, fixed_fac):
        solver = _make_solver(fixed_ids, fixed_fac, gcol, ocol, k, reg)
        rows = (
            r.groupBy(F.pmod(F.col(gcol), F.lit(buckets)))
            .applyInPandas(solver, out_schema)
            .collect()
        )
        rows.sort(key=lambda x: x.id)
        ids = np.array([x.id for x in rows], dtype=np.int64)
        fac = np.array([x.factors for x in rows], dtype=np.float64)
        return ids, fac

    def _rmse(u_ids, u_fac, i_ids, i_fac):
        def err(batches):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                u = u_fac[np.searchsorted(u_ids, pdf["user"].to_numpy(np.int64))]
                q = i_fac[np.searchsorted(i_ids, pdf["item"].to_numpy(np.int64))]
                e = pdf["rating"].to_numpy(np.float64) - (u * q).sum(axis=1)
                yield pd.DataFrame({"se": [float((e * e).sum())], "n": [len(e)]})

        tot = (
            r.mapInPandas(err, "se double, n long")
            .agg(F.sum("se").alias("se"), F.sum("n").alias("n"))
            .collect()[0]
        )
        import math

        return math.sqrt(tot.se / tot.n)

    history = []
    for _ in range(iterations):
        user_ids, user_fac = _solve_side("user", "item", item_ids, item_fac)
        item_ids, item_fac = _solve_side("item", "user", user_ids, user_fac)
        history.append(_rmse(user_ids, user_fac, item_ids, item_fac))
    return user_ids, user_fac, item_ids, item_fac, history


def als_convergence(orders: DataFrame, lineitem: DataFrame, **kw) -> DataFrame:
    """mf1 — registered form: factorize the customer x supplier
    log1p(purchase-count) matrix and report per-iteration RMSE:
    ``(iteration, rmse)``. Rows-only (iterative least squares is not
    SQL-expressible); the numerics are locked by the bit-exact
    single-node-model pytest instead."""
    spark = orders.sparkSession
    li = lineitem.select("l_orderkey", "l_suppkey")
    od = orders.select("o_orderkey", "o_custkey")
    ratings = (
        od.join(li, od.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.log1p(F.count("*")).alias("rating"))
        .select(
            F.col("o_custkey").alias("user"),
            F.col("l_suppkey").alias("item"),
            "rating",
        )
    )
    *_, history = als_factorize(ratings, **kw)
    return spark.createDataFrame(
        [(i + 1, round(v, 6)) for i, v in enumerate(history)],
        "iteration long, rmse double",
    )


def build_queries():
    def _mf1(spark: SparkSession, sf: str) -> DataFrame:
        return als_convergence(
            tables.load(spark, sf, "orders"),
            tables.load(spark, sf, "lineitem", spread=True),
        )

    return {
        "mf1_als_convergence": (_mf1, None),
    }
