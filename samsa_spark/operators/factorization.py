"""Distributed matrix factorization: ALS (alternating least squares) over an
explicit-rating matrix — the collaborative-filtering / embedding-pretraining
stage (Koren/Bell/Volinsky 2009; Spark MLlib ships it as ml.recommendation.ALS,
re-expressed here over the public DataFrame + applyInPandas surface so the
numerics are deterministic and model-checkable).

The reference engine has nothing in this family (SURVEY.md §2.3 absence
list: iterative algorithms); mf1 extends the iterative tier (dd6 connected
components, pr1 PageRank, lp1 LPA) with distributed least squares.

Scale shape — the co-partitioned BLOCK-JOIN form (MLlib ALS's layout): the
RATINGS table (the part that grows) stays distributed and is
localCheckpoint-ed once (it feeds 2 joins + 1 RMSE pass per iteration —
note 12). Factor state is likewise a DISTRIBUTED ``(id, factors)`` frame —
never collected to the driver inside the loop (the round-12 verdict's
cliff: entity cardinality grows with the data, so a per-half-step
``collect()`` + closure re-broadcast is GBs of serial driver traffic at
100x). Each half-step JOINS the fixed side's factors onto the ratings by
the other-entity id (a plain shuffle join both of whose sides already hash
by that key; AQE broadcasts it at runtime only while it is actually small —
the size-conditional behavior pr1/lp1 hand-roll), then solves one side's
k x k normal equations per entity inside ``applyInPandas`` — grouped NOT
by entity but by ``pmod(entity, buckets)`` (note 43: ~10 ms per Python
group would make per-user groups the bottleneck), with batched
``np.linalg.solve`` over all entities of a bucket at once (note 44: no
per-entity pandas groupby either — one np.add.at segment accumulation per
bucket). Every half-step output is eagerly checkpointed (iterative lineage
would otherwise grow exponentially) and the superseded generation's blocks
are freed immediately (notes 34/39).

Determinism: init factors are a pure integer-arithmetic hash of
(id, component), computed distributively inside a mapInPandas closure
(note 4 — the identical formula lives in :func:`_init_factors` for the
single-node model). Every bucket sorts its rows by (entity, other-entity)
before accumulating, so np.add.at order — and therefore every float64 op —
is reproducible bit-for-bit and replicated by the single-node numpy model
in tests: the join transports the exact same doubles the closure broadcast
did (array<double> round-trips exactly through Arrow), and each entity's
k x k solve depends only on its own rows, so the bucket fan-out and the
join are transport, not algebra. Only the final RMSE reduction crosses
partitions (sum of 64-ish partial sums), which is why the convergence
report rounds to 6 dp (note 6 discipline) and the model test uses a 1e-9
tolerance there while demanding bit-equality on the factors themselves.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from samsa_spark import tables

_FACTOR_SCHEMA = "id long, factors array<double>"
# item half-step schema when the RMSE partials ride along (one NULL-id
# summary row per bucket; see _make_solver stats_buckets)
_STATS_SCHEMA = _FACTOR_SCHEMA + ", bucket long, se double, n long"


def _init_factors(ids, k: int):
    """Deterministic small init in [-0.1, 0.1): pure integer arithmetic on
    (id, component) — reproducible in any engine, no RNG state. This is the
    single-node MODEL's form; the engine computes the identical formula
    inside :func:`_init_factor_frame`'s closure (note 4: executors cannot
    import samsa_spark, so the engine must not reference this symbol)."""
    import numpy as np

    ids = np.asarray(ids, dtype=np.int64)
    comps = np.arange(k, dtype=np.int64)
    h = (ids[:, None] * 2654435761 + comps[None, :] * 40503) % 1000003
    return (h.astype(np.float64) / 1000003.0 - 0.5) * 0.2


def _init_factor_frame(ids_df: DataFrame, k: int) -> DataFrame:
    """Distributed ``(id, factors)`` init frame: the `_init_factors` hash
    evaluated per batch inside a closure — entity cardinality never touches
    the driver."""

    def init(batches):
        import numpy as np
        import pandas as pd

        comps = np.arange(k, dtype=np.int64)
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            h = (ids[:, None] * 2654435761 + comps[None, :] * 40503) % 1000003
            fac = (h.astype(np.float64) / 1000003.0 - 0.5) * 0.2
            yield pd.DataFrame({"id": ids, "factors": list(fac)})

    return ids_df.mapInPandas(init, _FACTOR_SCHEMA)


def _make_solver(
    gcol: str, ocol: str, k: int, reg: float, stats_buckets: int | None = None
):
    """Closure (note 4) solving one side's normal equations for every
    entity in a bucket with one batched np.linalg.solve. The fixed side's
    factors arrive as the joined ``_f`` column, not a driver closure.

    ``stats_buckets`` (the item half-step) fuses the RMSE pass into the solve
    (guide §2 — one fewer full pass over the ratings per iteration): the
    bucket's rows already carry this iteration's NEW user factors (``_f``)
    and, after the solve, its NEW item factors, so the per-rating squared
    error is computable in place. The bucket emits ONE extra summary row
    (``id`` NULL — entity ids come from non-null rating columns, so NULL
    cannot collide) carrying ``(bucket, se, n)``; the driver fsum's the
    partials in bucket order, which keeps the reduction deterministic."""

    def solve(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values([gcol, ocol], kind="mergesort")
        g = pdf[gcol].to_numpy(np.int64)
        rt = pdf["rating"].to_numpy(np.float64)
        q = np.stack(pdf["_f"].to_numpy())  # (n, k)
        uids, uidx = np.unique(g, return_inverse=True)
        A = np.zeros((len(uids), k, k))
        B = np.zeros((len(uids), k))
        np.add.at(A, uidx, q[:, :, None] * q[:, None, :])
        np.add.at(B, uidx, q * rt[:, None])
        A += reg * np.eye(k)[None]
        fac = np.linalg.solve(A, B)
        out = pd.DataFrame({"id": uids, "factors": list(fac)})
        if stats_buckets is not None:
            e = rt - (q * fac[uidx]).sum(axis=1)
            out["bucket"] = pd.array([None] * len(uids), dtype="Int64")
            out["se"] = None
            out["n"] = pd.array([None] * len(uids), dtype="Int64")
            summary = pd.DataFrame(
                {
                    "id": pd.array([None], dtype="Int64"),
                    "factors": [None],
                    # python % == pmod for a positive modulus: the group's
                    # shared bucket, the deterministic fsum order key
                    "bucket": [int(g[0]) % stats_buckets],
                    "se": [float((e * e).sum())],
                    "n": [len(e)],
                }
            )
            out = pd.concat([out, summary], ignore_index=True)
        return out

    return solve


# The array-returning API collects one factor row per ENTITY — a frame
# that grows with the data (the note-55 cardinality class). 2M rows of
# (id, k=4 doubles) is a few hundred MB of driver Row objects — the
# comfortable ceiling for a deliberate model hand-off; past it the caller
# is almost certainly misusing the array API at scale and must switch to
# return_frames=True (factors stay distributed).
COLLECT_FACTOR_MAX_ROWS = 2_000_000


def _collect_factor_frame(df: DataFrame, max_rows: int = COLLECT_FACTOR_MAX_ROWS):
    """(sorted ids, row-aligned matrix) numpy view of a factor frame — the
    array-returning API's final materialization, outside the loop. Guarded
    by ``max_rows`` (the kmeans max_cells pattern, similarity.py): a
    100x-scale factor frame must fail loudly here, not OOM the driver."""
    import numpy as np

    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"als_factorize array API would collect {n} factor rows to the "
            f"driver (> {max_rows}). Entity cardinality grows with the "
            "data — use return_frames=True to keep the factors distributed."
        )
    rows = df.collect()
    rows.sort(key=lambda x: x.id)
    ids = np.array([x.id for x in rows], dtype=np.int64)
    fac = np.array([x.factors for x in rows], dtype=np.float64)
    return ids, fac


def als_factorize(
    ratings: DataFrame,
    k: int = 4,
    iterations: int = 3,
    reg: float = 0.1,
    buckets: int | None = None,
    return_frames: bool = False,
):
    """mf1 core — ALS over ``(user, item, rating)``.

    Default return: ``(user_ids, user_factors, item_ids, item_factors,
    rmse_history)`` as numpy arrays (ids sorted ascending; factors
    row-aligned) — one collect at the very END, for callers that want the
    model in hand. ``return_frames=True`` instead returns
    ``(user_df, item_df, rmse_history)`` with the factors still distributed
    (both frames localCheckpoint-ed; the caller owns their blocks —
    ``tables.free_checkpoint`` when done) — the form a 100x deployment and
    the registered query use, since entity cardinality grows with the data.
    See the module docstring for the scale and determinism contract."""
    if iterations < 1:
        raise ValueError(f"als_factorize needs iterations >= 1, got {iterations}")
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
    item_df = _init_factor_frame(
        r.select(F.col("item").alias("id")).distinct(), k
    ).localCheckpoint(eager=True)
    user_df: DataFrame | None = None

    def _solve_side(
        gcol: str, ocol: str, fixed_df: DataFrame, stats: bool = False
    ) -> DataFrame:
        joined = r.join(
            fixed_df.select(F.col("id").alias(ocol), F.col("factors").alias("_f")),
            ocol,
        )
        return (
            joined.groupBy(F.pmod(F.col(gcol), F.lit(buckets)))
            .applyInPandas(
                _make_solver(gcol, ocol, k, reg, buckets if stats else None),
                _STATS_SCHEMA if stats else _FACTOR_SCHEMA,
            )
            .localCheckpoint(eager=True)
        )

    # RMSE is FUSED into the item half-step (guide §2 — the old dedicated
    # pass re-joined both factor frames onto every rating, a full extra
    # shuffle + Python pass per iteration): the item-solve bucket already
    # holds (rating, new user factors, new item factors), so each bucket
    # emits one (se, n) summary row and the driver fsum's the partials in
    # bucket order — deterministic, and exact over the partials.
    history = []
    item_chk = item_df  # checkpoint HANDLE for the item side (freeable leaf)
    for _ in range(iterations):
        prev_user = user_df
        user_df = _solve_side("user", "item", item_df)
        if prev_user is not None:
            tables.free_checkpoint(prev_user)
        prev_item_chk = item_chk
        item_chk = _solve_side("item", "user", user_df, stats=True)
        tables.free_checkpoint(prev_item_chk)
        item_df = item_chk.where(F.col("id").isNotNull()).select("id", "factors")
        parts = (
            item_chk.where(F.col("id").isNull()).select("bucket", "se", "n").collect()
        )
        parts.sort(key=lambda p: p.bucket)
        history.append(
            math.sqrt(math.fsum(p.se for p in parts) / sum(p.n for p in parts))
        )
    tables.free_checkpoint(r)
    # Callers free the returned frames with free_checkpoint, which only
    # reaches a bare LogicalRDD leaf — re-materialize the 2-column item
    # projection once (entity-count rows, one tiny job) and drop the
    # stats-bearing handle so no blocks leak.
    item_df = item_df.localCheckpoint(eager=True)
    tables.free_checkpoint(item_chk)
    if return_frames:
        return user_df, item_df, history
    user_ids, user_fac = _collect_factor_frame(user_df)
    item_ids, item_fac = _collect_factor_frame(item_df)
    tables.free_checkpoint(user_df)
    tables.free_checkpoint(item_df)
    return user_ids, user_fac, item_ids, item_fac, history


def als_convergence(orders: DataFrame, lineitem: DataFrame, **kw) -> DataFrame:
    """mf1 — registered form: factorize the customer x supplier
    log1p(purchase-count) matrix and report per-iteration RMSE:
    ``(iteration, rmse)``. Rows-only (iterative least squares is not
    SQL-expressible); the numerics are locked by the bit-exact
    single-node-model pytest instead. Uses the distributed-frame form —
    entity factors never land on the driver."""
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
    user_df, item_df, history = als_factorize(ratings, return_frames=True, **kw)
    tables.free_checkpoint(user_df)
    tables.free_checkpoint(item_df)
    return tables.local_rows(
        spark,
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
