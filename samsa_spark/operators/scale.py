"""Skew-handling and distribution-shape operators.

samsa shards state by Kafka partition (reference storage.py:58, 100-122) and
would hot-spot exactly like a naive shuffle when one key dominates. AQE's
skew-join handles the join case; for aggregation the classic fix is salting
— these operators make it a first-class, oracle-checked primitive rather
than folklore.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from samsa_spark import tables
from samsa_spark.operators import state as state_ops


def compact_latest_salted(
    events: DataFrame,
    keys: Sequence[str] = ("user_id",),
    salt_buckets: int = 16,
) -> DataFrame:
    """d2s — last-write-wins compaction with a two-phase salted aggregate.

    Phase 1 groups by (key, salt) — a hot key's rows spread over
    ``salt_buckets`` reducers; phase 2 reduces the per-salt winners by key.
    ``max_by`` is associative+commutative, so the result is EXACTLY
    ``compact_latest`` (same DuckDB oracle), only the shuffle shape changes:
    no single reducer ever sees more than 1/salt of a hot key.

    The salt is derived from event_id (deterministic, uniform), not rand():
    plans stay replayable and speculative task retries can't double-count.
    """
    picked = (*state_ops.ORDER_COLS, *[c for c in state_ops.PAYLOAD_COLS if c in events.columns])
    salted = events.withColumn("_salt", F.pmod(F.col("event_id"), F.lit(salt_buckets)))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        F.max_by(F.struct(*picked), F.struct(*state_ops.ORDER_COLS)).alias("_l")
    )
    phase2 = phase1.groupBy(*keys).agg(
        F.max_by(F.col("_l"), F.struct(F.col("_l.ts_us"), F.col("_l.event_id"))).alias("_l")
    )
    return phase2.select(
        *keys, *[F.col(f"_l.{c}").alias(f"last_{c}") for c in picked]
    )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    salt_from: str = "event_id",
    check_skew: bool = False,
) -> DataFrame:
    """Join-side salting for pathological hot keys when the other side is
    too big to broadcast (the case AQE skew-join may miss: skew detected
    only at runtime per shuffle block, or a deliberately pinned plan).

    Fact rows get a deterministic salt in [0, n) derived from ``salt_from``
    (never rand(): retries/replays must route a row identically); each dim
    row is replicated n times via explode, and the equi-join runs on
    (key, _salt). The result is EXACTLY ``facts.join(dim, key)`` — only the
    shuffle key gains entropy, so a hot key's rows land on n reducers
    instead of one. Cost: dim side shuffles n copies — use for big-fact x
    modest-dim joins with known hot keys.

    ``check_skew=True`` turns the PLANS.md skew-sweep crossover into a
    runtime guard: one extra key-count aggregate over the fact side, and a
    warning when the hottest key holds LESS than ~10x a reducer's fair
    share — the measured regime where salting is a wash-or-loss (AQE alone
    suffices) and the replicated dim shuffle is pure overhead. The reducer
    count is MEASURED, not read from conf: the guard's aggregate shuffles
    on the same key as the join itself, so its post-AQE coalesced
    partition count IS the effective reducer count a plain join would get
    — AQE coalescing can shrink ``spark.sql.shuffle.partitions``
    arbitrarily, and the ~10x crossover is partition-count-relative
    (CLAUDE.md note 21; the max attainable ratio equals the partition
    count, so below 11 effective reducers the crossover is structurally
    unreachable and the guard says so instead of pretending to assess
    it). Opt-in because the measuring aggregate is itself a pass over the
    facts: use it while tuning, drop it from the pinned production plan.
    """
    if check_skew:
        import warnings

        # localCheckpoint materializes the aggregate under AQE, so
        # getNumPartitions returns the FINAL (post-coalescing) reducer
        # count and the stats pass below is a cheap re-read, not a rerun.
        counts = facts.groupBy(key).count().localCheckpoint()
        try:
            parts = counts.rdd.getNumPartitions()
            stats = counts.agg(
                F.max("count").alias("hot"), F.sum("count").alias("n")
            ).collect()[0]
        finally:
            # The checkpointed blocks otherwise stay in executor storage for
            # the rest of the session on every guard call. df.rdd.unpersist()
            # does NOT touch them (it unpersists a derived conversion RDD);
            # the blocks belong to the LogicalRDD inside the checkpointed
            # frame's plan. Best-effort: a py4j surface change must not turn
            # the diagnostic guard into a crash.
            try:
                counts._jdf.queryExecution().logical().rdd().unpersist(False)
            except Exception:
                pass  # swallowed: only the block-release is best-effort —
                # a leaked diagnostic block costs memory, not correctness
        fair = stats["n"] / max(parts, 1)
        ratio = stats["hot"] / fair
        if parts <= 10:
            warnings.warn(
                f"salted_join: only {parts} effective (post-AQE) reducers — "
                "the ~10x fair-share crossover is unreachable below 11 "
                f"partitions (max ratio = partition count; hottest {key!r} "
                f"is at {ratio:.1f}x). This session cannot assess whether "
                "salting wins at production partition counts — re-check with "
                "a production-like spark.sql.shuffle.partitions "
                "(PLANS.md skew sweep; CLAUDE.md note 21).",
                stacklevel=2,
            )
        elif ratio < 10:
            warnings.warn(
                f"salted_join: hottest {key!r} holds {stats['hot']} of "
                f"{stats['n']} rows (~{ratio:.1f}x a reducer's fair share "
                f"across {parts} effective post-AQE partitions) — below the "
                "~10x crossover where salting wins (PLANS.md skew sweep). A "
                "plain join with AQE skew handling is the better plan here.",
                stacklevel=2,
            )
    salted_f = facts.withColumn(
        "_salt", F.pmod(F.col(salt_from), F.lit(salt_buckets)).cast("int")
    )
    salted_d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_f.join(salted_d, [key, "_salt"]).drop("_salt")


def salted_enrich_stats(events: DataFrame, customer: DataFrame) -> DataFrame:
    """js1 — per-nation event stats through a SALTED fact-dim join (the
    join-side twin of d2s): same oracle as the plain join because salting
    is result-invariant. Decimal-sum discipline per CLAUDE.md rule 6."""
    dim = customer.select(F.col("c_custkey").alias("user_id"), "c_nationkey")
    j = salted_join(events.select("user_id", "event_id", "value"), dim, "user_id")
    return j.groupBy("c_nationkey").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


def value_percentiles(lineitem: DataFrame) -> DataFrame:
    """pc1 — exact percentiles (median/p90) per group. Spark ``percentile``
    and DuckDB ``quantile_cont`` share the linear-interpolation definition.
    Exact percentile is a sort-based aggregate; the 100 TB path is
    ``approx_percentile`` (mergeable sketch) — kept out of the oracle set
    because sketches are engine-specific by design.
    """
    return lineitem.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90_price"),
        F.round(F.expr("percentile(l_discount, 0.25)"), 6).alias("p25_discount"),
        F.count("*").alias("n_rows"),
    )


def doc_length_histogram(documents: DataFrame, bucket_chars: int = 100) -> DataFrame:
    """hist1 — corpus length-distribution histogram: fixed-width buckets of
    n_chars. One hash aggregate over an integer division — the histogram
    every data-quality dashboard starts with.
    """
    return (
        documents.groupBy(F.expr(f"n_chars div {bucket_chars}").alias("bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .withColumn("bucket_lo", F.col("bucket") * bucket_chars)
    )


def vector_stats(embeddings: DataFrame) -> DataFrame:
    """arr1 — array-column statistics per label: element extracts and array
    extents (exact float ops on both engines; no cross-engine float
    summation). Array surface: element_at / array_min / array_max / size.
    """
    return embeddings.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.round(F.avg(F.element_at("embedding", 1).cast("double")), 6).alias("avg_e0"),
        F.round(F.min(F.array_min("embedding")).cast("double"), 6).alias("min_elem"),
        F.round(F.max(F.array_max("embedding")).cast("double"), 6).alias("max_elem"),
        F.min(F.size("embedding")).alias("dim"),
    )


# --- registry wiring -------------------------------------------------------


def key_skew_report(
    df: DataFrame,
    key: str = "user_id",
    shuffle_partitions: int = 200,
    top: int = 5,
) -> DataFrame:
    """sk1 — the skew DIAGNOSIS that precedes every salting decision: the
    hottest ``top`` keys with each one's multiple of a reducer's fair
    share (``rows * partitions / total``) and whether that multiple
    clears the ~10x crossover where salting a shuffle join wins (PLANS.md
    skew sweep; notes 18/21 — the ratio is partition-count-RELATIVE, so
    ``shuffle_partitions`` is an explicit parameter, defaulting to the
    vanilla 200, never silently read from the session).

    One algebraic count per key + a top-k (TakeOrderedAndProject — no
    global sort) + one broadcast of the single-row total. This is the
    measuring pass `salted_join(check_skew=True)` runs inline, exposed as
    a first-class report a user runs BEFORE pinning a production plan.
    The ratio rounds to 6dp before the threshold so the advice column is
    engine-exact.
    """
    counts = df.groupBy(F.col(key).alias("key")).agg(F.count("*").alias("n_rows"))
    total = counts.agg(F.sum("n_rows").cast("double").alias("_t"))
    ratio = F.round(F.col("n_rows") * F.lit(shuffle_partitions) / F.col("_t"), 6)
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "key",
            "n_rows",
            ratio.alias("fair_share_ratio"),
            (ratio >= 10.0).alias("salting_advised"),
        )
        .orderBy(F.col("n_rows").desc(), F.col("key"))
        .limit(top)
    )


_SK1_SQL = """
WITH c AS (SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n_rows
           FROM events GROUP BY user_id),
t AS (SELECT CAST(sum(n_rows) AS DOUBLE) AS _t FROM c)
SELECT key, n_rows,
       round(n_rows * 200 / _t, 6) AS fair_share_ratio,
       round(n_rows * 200 / _t, 6) >= 10.0 AS salting_advised
FROM c CROSS JOIN t
ORDER BY n_rows DESC, key LIMIT 5
"""


def bloom_semi_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    anti: bool = False,
    n_bits: int | None = None,
    n_hashes: int | None = None,
) -> DataFrame:
    """js2 — Bloom-accelerated semi/anti join, generalized from dc2's
    machinery into a first-class scale primitive: the regime where the
    right side's raw rows are too big to broadcast but its MEMBERSHIP
    fits a digest (~1 bit per key at the default sizing). The digest is
    built once from the right side's distinct keys and probed IN-SCAN on
    the left, so the shuffle exchange ships only Bloom-positive left
    rows (true matches + the digest's fpp) instead of the whole left
    table — on a 100 TB fact table probed against a selective dimension
    this is the difference between shuffling terabytes and shuffling the
    answer.

    Exactness (the dc2 argument): a Bloom has NO false negatives. For
    the SEMI form, positives verify through the ordinary exact semi-join
    against the right keys; false positives die there. For the ANTI
    form, Bloom-negative rows are DEFINITELY absent from the right and
    pass immediately with no join at all; only the positives run the
    exact anti-join. Either way the output equals the plain semi/anti
    join row-for-row — which is the registered oracle.

    Keys hash as their canonical string form (CAST(key AS STRING)), so
    any key type both engines render identically works.
    """
    from samsa_spark.operators.dedup import (
        BLOOM_BITS,
        BLOOM_HASHES,
        bloom_contains,
        bloom_digest,
    )

    nb = BLOOM_BITS if n_bits is None else int(n_bits)
    nh = BLOOM_HASHES if n_hashes is None else int(n_hashes)
    rk = right.select(F.col(key).cast("string").alias("_k")).distinct()
    dig = bloom_digest(rk, col="_k", n_bits=nb, n_hashes=nh)
    probed = left.withColumn("_k", F.col(key).cast("string"))
    member = bloom_contains("_k", dig, n_bits=nb, n_hashes=nh)
    rkeys = right.select(key).distinct()
    cols = list(left.columns)  # a USING join moves the key first; restore
    if not anti:
        return (
            probed.where(member).drop("_k").join(rkeys, key, "left_semi").select(*cols)
        )
    neg = probed.where(~member).drop("_k").select(*cols)
    verified = (
        probed.where(member).drop("_k").join(rkeys, key, "left_anti").select(*cols)
    )
    return neg.unionByName(verified)


def _js2_query(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Registered js2 form: events of high-balance customers via the
    Bloom semi-join (the selective-dimension probe)."""
    dim = customer.where(F.col("c_acctbal") > 7000).select(
        F.col("c_custkey").alias("user_id")
    )
    return bloom_semi_join(
        events.select("event_id", "user_id", "event_type", "value"), dim, "user_id"
    )


_JS2_SQL = """
SELECT event_id, user_id, event_type, value
FROM events
WHERE user_id IN (SELECT c_custkey FROM customer WHERE c_acctbal > 7000)
"""


def build_queries():
    def q(fn, name, spread=False):
        def run(spark: SparkSession, sf: str) -> DataFrame:
            return fn(tables.load(spark, sf, name, spread=spread))

        return run

    def q2(fn, n1, n2):
        def run(spark: SparkSession, sf: str) -> DataFrame:
            return fn(tables.load(spark, sf, n1), tables.load(spark, sf, n2))

        return run

    return {
        "d2s_salted_compaction": (q(compact_latest_salted, "events"), state_ops.ORACLE_SQL["d2_state_table"]),
        "js1_salted_join": (q2(salted_enrich_stats, "events", "customer"), _JS1_SQL),
        "js2_bloom_semi_join": (q2(_js2_query, "events", "customer"), _JS2_SQL),
        "sk1_key_skew_report": (q(key_skew_report, "events"), _SK1_SQL),
        "pc1_percentiles": (q(value_percentiles, "lineitem", spread=True), _PC1_SQL),
        "hist1_doc_lengths": (q(doc_length_histogram, "documents"), _HIST1_SQL),
        "arr1_vector_stats": (q(vector_stats, "embeddings"), _ARR1_SQL),
    }


_JS1_SQL = """
SELECT c_nationkey, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_nationkey
"""


_PC1_SQL = """
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
       round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
       round(quantile_cont(l_discount, 0.25), 6) AS p25_discount,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""

_HIST1_SQL = """
SELECT n_chars // 100 AS bucket, count(*) AS n_docs,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars,
       (n_chars // 100) * 100 AS bucket_lo
FROM documents
GROUP BY 1
"""

_ARR1_SQL = """
SELECT label, count(*) AS n_vecs,
       round(avg(CAST(embedding[1] AS DOUBLE)), 6) AS avg_e0,
       round(CAST(min(list_min(embedding)) AS DOUBLE), 6) AS min_elem,
       round(CAST(max(list_max(embedding)) AS DOUBLE), 6) AS max_elem,
       min(len(embedding)) AS dim
FROM embeddings GROUP BY label
"""
