"""Advanced relational operators: as-of join, sessionization, rollup,
pivot, distinct aggregation.

None of these exist in the reference (SURVEY.md §2.3 — it has no joins or
aggregations at all); they are the operators a user of a state-store +
analytics engine reaches for next, each expressed Spark-first with an exact
DuckDB oracle.

Scale notes per operator are in the docstrings; the common thread: every
one is a hash-aggregate or equi-join plan — no cross joins, no global
sorts except the explicitly-bounded top-k.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from samsa_spark import tables


def asof_join_events_orders(events: DataFrame, orders: DataFrame) -> DataFrame:
    """as1 — as-of join, join-then-reduce form: each event matched to the
    customer's most recent order at or before the event time via equi-join
    on the key + range filter + max_by per event.

    NOT the canonical form: the join materializes every (event, prior
    order) pair before the reduce — a per-key quadratic intermediate that
    explodes on keys with long histories. ``as2_asof_cogrouped`` (the
    merge-as-of, O(n log n) per key) is the canonical/bench operator; as1
    is kept as the SQL-shaped cross-check against the same oracle.
    Sampled to users < 50 to bound the oracle's quadratic check.
    """
    ev = events.where(F.col("user_id") < 50).select(
        "event_id", "user_id", "ts_us", F.col("ts").alias("ev_ts")
    )
    od = orders.select(
        F.col("o_custkey").alias("user_id"),
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
    )
    j = ev.join(od, "user_id").where(F.col("o_orderdate") <= F.col("ev_ts"))
    return (
        j.groupBy("event_id", "user_id", "ts_us")
        .agg(
            F.max_by(
                F.struct("o_orderkey", "o_totalprice"),
                F.struct("o_orderdate", "o_orderkey"),
            ).alias("_o")
        )
        .select(
            "event_id",
            "user_id",
            "ts_us",
            F.col("_o.o_orderkey").alias("last_orderkey"),
            F.col("_o.o_totalprice").alias("last_totalprice"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """ses1 — sessionization (gaps-and-islands): a new session starts when a
    key's inter-event gap exceeds the threshold. Two window passes over the
    same (user_id, ts order) partitioning — one shuffle total, since both
    windows share the partitioning.
    """
    gap_us = gap_minutes * 60_000_000
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = events.select(
        "user_id",
        "ts_us",
        "event_id",
        F.when(
            (F.col("ts_us") - F.lag("ts_us").over(w)) > gap_us, 1
        ).otherwise(0).alias("is_new"),
    ).withColumn("session_id", F.sum("is_new").over(w))
    return flagged.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        ((F.max("ts_us") - F.min("ts_us")) / F.lit(1_000_000.0)).alias("duration_sec"),
    )


_GF_BUCKET_US = 86_400_000_000  # 1 day


def gap_fill(events: DataFrame, bucket_us: int = _GF_BUCKET_US) -> DataFrame:
    """gf1 — time-series gap-fill / resample: bucket each key's events onto
    a fixed time grid, generate the FULL grid between the key's first and
    last bucket, and forward-fill empty buckets with the last observed
    value — the downsample-then-densify every monitoring/feature pipeline
    runs before joining series with different event rates (samsa's
    state-per-key stream viewed as a regular time series).

    Per (user, bucket) the observation is the latest event's value (same
    (ts_us, event_id) tie-break as D2 compaction); ``gap`` marks buckets
    that had no events. Plan shape: one hash aggregate onto the grid, a
    per-key sequence()/explode to densify (rows = buckets-per-key, never a
    cross join against a global calendar), one left join on (key, bucket),
    and the forward fill is last_value(ignorenulls) over the SAME
    (user, bucket-order) partitioning — no second shuffle. At 100 TB the
    grid explode is bounded by span/bucket per key, and the join keys are
    co-partitioned by construction.
    """
    # Integer division, never float: double is exact only to 2^53, so the
    # float form silently mis-buckets very large ts_us (same rule as the
    # nanos branch in tables.py). `div` truncates while DuckDB `//` floors —
    # identical for ts_us >= 0, which the testdata contract guarantees.
    bucket = F.expr(f"ts_us div {bucket_us}")
    obs = (
        events.select("user_id", bucket.alias("bucket"), "ts_us", "event_id", "value")
        .groupBy("user_id", "bucket")
        .agg(
            F.max_by("value", F.struct("ts_us", "event_id")).alias("bucket_value"),
            F.count("*").alias("n_events"),
        )
    )
    grid = (
        obs.groupBy("user_id")
        .agg(F.min("bucket").alias("b0"), F.max("bucket").alias("b1"))
        .select("user_id", F.explode(F.sequence("b0", "b1")).alias("bucket"))
    )
    joined = grid.join(obs, ["user_id", "bucket"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "bucket",
        (F.col("bucket") * bucket_us).alias("bucket_start_us"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last("bucket_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("bucket_value").isNull().alias("gap"),
    )


_GF1_SQL = """
WITH rk AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS bucket, value,
         row_number() OVER (PARTITION BY user_id, epoch_us(ts) // 86400000000
                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id, epoch_us(ts) // 86400000000)
           AS n_events
  FROM events
),
obs AS (
  SELECT user_id, bucket, value AS bucket_value, n_events FROM rk WHERE rn = 1
),
rng AS (SELECT user_id, min(bucket) AS b0, max(bucket) AS b1 FROM obs GROUP BY user_id),
grid AS (SELECT user_id, unnest(generate_series(b0, b1)) AS bucket FROM rng),
j AS (
  SELECT g.user_id, g.bucket, o.bucket_value, o.n_events
  FROM grid g LEFT JOIN obs o USING (user_id, bucket)
)
SELECT user_id, bucket,
       bucket * 86400000000 AS bucket_start_us,
       CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
       last_value(bucket_value IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
       bucket_value IS NULL AS gap
FROM j
"""


def rollup_revenue(orders: DataFrame, customer: DataFrame, nation: DataFrame) -> DataFrame:
    """ro1 — ROLLUP aggregation: order totals by (nation, mktsegment) with
    subtotals and grand total. Spark executes grouping sets as one expand +
    hash aggregate — no extra scans per grouping level.
    """
    j = orders.join(
        F.broadcast(customer.select("c_custkey", "c_nationkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    ).join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
    return (
        j.rollup("n_name", "c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
        )
        .select(
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
            F.coalesce(F.col("c_mktsegment"), F.lit("ALL")).alias("segment"),
            "n_orders",
            "total_price",
        )
    )


EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


def pivot_event_counts(events: DataFrame) -> DataFrame:
    """pv1 — pivot: per-user event counts spread to one column per event
    type. Implemented with an explicit value list (``pivot(col, values)``)
    so the plan is a single hash aggregate — omitting the list would cost an
    extra distinct-scan to discover values, a full pass at 100 TB.
    """
    return (
        events.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
        .select(
            "user_id",
            *[F.col(t).alias(f"n_{t}") for t in EVENT_TYPES],
        )
    )


def distinct_aggregates(lineitem: DataFrame) -> DataFrame:
    """da1 — multi-distinct aggregation: distinct counts at several
    granularities per return flag, plus an approx_count_distinct twin of one
    of them (the 100 TB path: HLL sketch, one pass, mergeable partials —
    exact multi-distinct forces per-distinct expansion).
    """
    return lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("nd_parts"),
        F.countDistinct("l_suppkey").alias("nd_supps"),
        F.countDistinct("l_orderkey").alias("nd_orders"),
        F.count("*").alias("n_rows"),
    )


# --- registry wiring -------------------------------------------------------


def range_join_counts(events: DataFrame, window_us: int = 600_000_000) -> DataFrame:
    """rj1 — KEYLESS interval join via time-binning: for each purchase
    event, the number of click events by ANY user in the preceding
    ``window_us``. With no equi key, Catalyst's only native plan for the
    range predicate is BroadcastNestedLoopJoin — O(|purchases|·|clicks|),
    the shape that dies first at volume. The binned rewrite assigns each
    click to bucket ``ts div W`` and probes each purchase into buckets
    {b-1, b} (a length-W window spans at most two W-buckets), turning the
    plan into a partitioned equi-join on the bucket plus an exact residual
    range filter — no row pairs outside adjacent buckets are ever formed.

    As-of joins (as2) need a per-KEY order; this is the keyless analog
    where binning, not cogrouping, is what bounds the pair space. Bucket
    skew follows traffic spikes; AQE's skew-join split handles the hot
    buckets (PLANS.md skew rules — never pre-salt an aggregate).
    """
    ev = events.select("event_id", "event_type", "ts_us")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("ts_us").alias("c_ts"),
        F.expr(f"ts_us div {window_us}").alias("bucket"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts_us").alias("p_ts")
    )
    probes = purchases.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.expr(f"p_ts div {window_us}"),
                F.expr(f"p_ts div {window_us} - 1"),
            )
        ),
    )
    counts = (
        probes.join(clicks, "bucket")
        .where((F.col("c_ts") <= F.col("p_ts")) & (F.col("c_ts") >= F.col("p_ts") - window_us))
        .groupBy("purchase_id")
        .agg(F.count("*").alias("n_recent_clicks"))
    )
    return purchases.select("purchase_id", "p_ts").join(
        counts, "purchase_id", "left"
    ).select(
        "purchase_id",
        "p_ts",
        F.coalesce("n_recent_clicks", F.lit(0)).alias("n_recent_clicks"),
    )


_RJ1_SQL = """
WITH c AS (SELECT epoch_us(ts) AS ts_us FROM events WHERE event_type = 'click'),
p AS (SELECT event_id AS purchase_id, epoch_us(ts) AS p_ts FROM events
      WHERE event_type = 'purchase')
SELECT p.purchase_id, p.p_ts,
       CAST(count(c.ts_us) AS BIGINT) AS n_recent_clicks
FROM p LEFT JOIN c ON c.ts_us <= p.p_ts AND c.ts_us >= p.p_ts - 600000000
GROUP BY p.purchase_id, p.p_ts
"""


def funnel_stages(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    within_us: int | None = None,
) -> DataFrame:
    """fu1 — ordered funnel analysis (the match_recognize stand-in every
    product-analytics engine grows): per user, the FIRST stage-1 event,
    then for each later stage the first event STRICTLY AFTER the previous
    stage's timestamp, plus the stage depth reached — for any number of
    stages (columns ``t1_us..tn_us``). An out-of-order event (a click
    before any view) does not count — only the earliest valid chain does.

    Plan shape: a chain of conditional min-aggregates, each joined to the
    previous stage's per-user timestamp — every groupBy and every join
    keys on ``user_id``, so the whole funnel is ONE hash-partitioning
    family (AQE reuses the exchange; on a user_id-bucketed layout no
    shuffle at all). No windows, no per-user event sorting, no broadcast
    of user-cardinality sides; per-stage frames carry one row per user.
    At 100 TB this is 3 co-partitioned aggregates over a filtered scan —
    the event payload never moves unfiltered.
    """
    ev = events.select("user_id", "event_type", "ts_us")
    stage_frames = []
    prev = None
    for i, s in enumerate(stages, start=1):
        f = ev.where(F.col("event_type") == s)
        if prev is not None:
            cond = F.col("ts_us") > F.col(f"t{i - 1}_us")
            if within_us is not None:
                # conversion window: the next stage must land within
                # within_us of the previous one (greedy earliest-chain —
                # the standard funnel-window semantics)
                cond = cond & (F.col("ts_us") <= F.col(f"t{i - 1}_us") + within_us)
            f = f.join(prev, "user_id").where(cond)
        prev = f.groupBy("user_id").agg(F.min("ts_us").alias(f"t{i}_us"))
        stage_frames.append(prev)
    out = ev.select("user_id").distinct()
    for t in stage_frames:
        out = out.join(t, "user_id", "left")
    # built ascending so the DEEPEST stage's when() ends up outermost
    reached = F.lit(0)
    for i in range(1, len(stages) + 1):
        reached = F.when(F.col(f"t{i}_us").isNotNull(), i).otherwise(reached)
    return out.select(
        "user_id",
        *[f"t{i}_us" for i in range(1, len(stages) + 1)],
        reached.cast("int").alias("reached"),
    )


_FU1_SQL = """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
t1 AS (SELECT user_id, min(ts_us) AS t1_us FROM e
       WHERE event_type = 'view' GROUP BY 1),
t2 AS (SELECT e.user_id, min(ts_us) AS t2_us FROM e JOIN t1 USING (user_id)
       WHERE event_type = 'click' AND ts_us > t1_us GROUP BY 1),
t3 AS (SELECT e.user_id, min(ts_us) AS t3_us FROM e JOIN t2 USING (user_id)
       WHERE event_type = 'purchase' AND ts_us > t2_us GROUP BY 1)
SELECT u.user_id, t1_us, t2_us, t3_us,
       CAST(CASE WHEN t3_us IS NOT NULL THEN 3
                 WHEN t2_us IS NOT NULL THEN 2
                 WHEN t1_us IS NOT NULL THEN 1
                 ELSE 0 END AS INT) AS reached
FROM (SELECT DISTINCT user_id FROM e) u
LEFT JOIN t1 USING (user_id)
LEFT JOIN t2 USING (user_id)
LEFT JOIN t3 USING (user_id)
"""

def funnel_report(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    within_us: int | None = None,
) -> DataFrame:
    """fu2 — the report form of :func:`funnel_stages`: one row per stage
    with the users reaching it, conversion from the previous stage, and
    conversion from the top (6-dp rounded, note 6). The per-user stage
    table collapses through one tiny aggregate (n_stages counters via
    conditional counts), MATERIALIZED before fanning out into per-stage
    rows: Spark gives no ReusedExchange across aggregate branches (note
    12), so without the localCheckpoint the whole fu1 join/aggregate
    cascade would re-execute once per stage. A stage with zero users
    yields NULL conversions (try_divide), matching DuckDB's
    divide-by-zero → NULL — |stages| rows out."""
    fun = funnel_stages(events, stages=stages, within_us=within_us)
    counts = fun.agg(
        F.count("*").alias("n_users"),
        *[
            F.count(F.when(F.col("reached") >= i, 1)).alias(f"r{i}")
            for i in range(1, len(stages) + 1)
        ],
    ).localCheckpoint()
    rows = None
    for i, s in enumerate(stages, start=1):
        prev = F.col("n_users") if i == 1 else F.col(f"r{i - 1}")
        one = counts.select(
            F.lit(i).alias("stage_idx"),
            F.lit(s).alias("stage"),
            F.col(f"r{i}").alias("n_users_reached"),
            F.round(F.try_divide(F.col(f"r{i}"), prev), 6).alias("conv_from_prev"),
            F.round(F.try_divide(F.col(f"r{i}"), F.col("n_users")), 6).alias(
                "conv_from_start"
            ),
        )
        rows = one if rows is None else rows.unionByName(one)
    return rows


_FU2_SQL = """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
t1 AS (SELECT user_id, min(ts_us) AS t1_us FROM e
       WHERE event_type = 'view' GROUP BY 1),
t2 AS (SELECT e.user_id, min(ts_us) AS t2_us FROM e JOIN t1 USING (user_id)
       WHERE event_type = 'click' AND ts_us > t1_us GROUP BY 1),
t3 AS (SELECT e.user_id, min(ts_us) AS t3_us FROM e JOIN t2 USING (user_id)
       WHERE event_type = 'purchase' AND ts_us > t2_us GROUP BY 1),
c AS (SELECT (SELECT count(DISTINCT user_id) FROM e) AS n_users,
             (SELECT count(*) FROM t1) AS r1,
             (SELECT count(*) FROM t2) AS r2,
             (SELECT count(*) FROM t3) AS r3)
SELECT 1 AS stage_idx, 'view' AS stage, CAST(r1 AS BIGINT) AS n_users_reached,
       round(r1 / CAST(n_users AS DOUBLE), 6) AS conv_from_prev,
       round(r1 / CAST(n_users AS DOUBLE), 6) AS conv_from_start FROM c
UNION ALL
SELECT 2, 'click', CAST(r2 AS BIGINT),
       round(r2 / CAST(r1 AS DOUBLE), 6), round(r2 / CAST(n_users AS DOUBLE), 6) FROM c
UNION ALL
SELECT 3, 'purchase', CAST(r3 AS BIGINT),
       round(r3 / CAST(r2 AS DOUBLE), 6), round(r3 / CAST(n_users AS DOUBLE), 6) FROM c
"""


_WEEK_US = 7 * 86_400_000_000


def cohort_retention(events: DataFrame) -> DataFrame:
    """co1 — cohort retention matrix: users grouped by first-activity week
    (the cohort), counted by how many distinct weeks after signup they
    were active — ``(cohort_week, week_offset, n_users)``. The standard
    engagement report next to fu1's conversion funnel.

    Plan shape: first-week per user is one hash aggregate; the join back
    and the (user, offset) dedup both key on ``user_id`` (same
    partitioning family as fu1 — at scale one exchange, reused); the
    final matrix aggregate runs over |users| x |active weeks| rows
    (bounded: a year is 53 offsets per user, NOT event-cardinality). Week
    ids are integer-divided epoch-µs — no timezone/calendar dependence on
    either engine (the repo's ts_us rule, CLAUDE.md note 1)."""
    ev = events.select("user_id", (F.col("ts_us") - F.col("ts_us") % _WEEK_US).alias("week_us"))
    first = ev.groupBy("user_id").agg(F.min("week_us").alias("cohort_week_us"))
    active = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week_us",
            ((F.col("week_us") - F.col("cohort_week_us")) / _WEEK_US)
            .cast("int")
            .alias("week_offset"),
        )
        .distinct()
    )
    return (
        active.groupBy("cohort_week_us", "week_offset")
        .agg(F.count("*").alias("n_users"))
    )


_CO1_SQL = f"""
WITH e AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(ts) % {_WEEK_US} AS week_us
  FROM events
), f AS (
  SELECT user_id, min(week_us) AS cohort_week_us FROM e GROUP BY 1
), a AS (
  SELECT DISTINCT e.user_id, f.cohort_week_us,
         CAST((e.week_us - f.cohort_week_us) // {_WEEK_US} AS INT) AS week_offset
  FROM e JOIN f USING (user_id)
)
SELECT cohort_week_us, week_offset, count(*) AS n_users
FROM a GROUP BY 1, 2
"""


FE1_TAU_US = 7 * 24 * 3600 * 1_000_000  # 7-day decay constant, microseconds


def decayed_value(events: DataFrame, tau_us: int = FE1_TAU_US) -> DataFrame:
    """fe1 — exponentially time-decayed per-user value:
    ``Σ value_i * exp(-(T - t_i)/tau)`` with ``T`` the corpus's latest
    event time — the standard recency-weighted engagement/LTV feature (a
    ranking or churn model's freshness signal), where yesterday's
    purchase counts ~e^-0.14 of today's at the 7-day constant and a
    month-old one ~e^-4. Returns ``(user_id, n_events, decayed_value)``.

    Determinism/parity: each term is one fixed double expression
    (2-dp-quantized value x exp of an integer-microsecond age over a
    literal tau), rounded to 6 dp and summed as DECIMAL (order-free, repo
    rule 6 — the exp ulp convention matches the ln one). Scale shape: the
    1-row T aggregate broadcasts, then ONE algebraic hash aggregate to
    key-level cardinality with map-side partials — d8's family; no
    window, no per-key sort.
    """
    ref = events.agg(F.max("ts_us").alias("tmax"))
    term = F.round(
        F.round("value", 2)
        * F.exp(-(F.col("tmax") - F.col("ts_us")) / F.lit(float(tau_us))),
        6,
    ).cast("decimal(22,6)")
    return (
        events.select("user_id", "ts_us", "value")
        .crossJoin(F.broadcast(ref))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(term).cast("double").alias("decayed_value"),
        )
    )


_FE1_SQL = f"""
WITH r AS (SELECT max(epoch_us(ts)) AS tmax FROM events),
t AS (
  SELECT user_id,
         CAST(round(round(value, 2)
              * exp(-(tmax - epoch_us(ts)) / {float(FE1_TAU_US)!r}), 6)
           AS DECIMAL(22,6)) AS w
  FROM events CROSS JOIN r
)
SELECT user_id, count(*) AS n_events, CAST(sum(w) AS DOUBLE) AS decayed_value
FROM t GROUP BY user_id
"""


TE1_SMOOTHING = 10


def target_encode(events: DataFrame, m: int = TE1_SMOOTHING) -> DataFrame:
    """te1 — LEAVE-ONE-OUT smoothed target encoding of ``event_type``
    against ``value``: per event, the mean value of every OTHER event of
    its type, shrunk toward the global mean by a pseudo-count prior —
    ``te = ((sum_t − value) + m·gmean) / (cnt_t − 1 + m)``. The standard
    high-cardinality categorical feature with the leakage already removed
    (plain per-category mean leaks each row's own target into its
    feature; LOO subtracts it — the reason naive target encoding
    overfits). Returns ``(event_id, event_type, te)``.

    Determinism/parity: sums are exact DECIMAL(18,2) of the 2-dp values
    (d8's convention), the subtraction stays in DECIMAL, and the final
    expression is one fixed double sequence rounded to 6 dp. Scale shape:
    one type-cardinality aggregate + the 1-row global both broadcast back
    into the event scan — no wide exchange at all; at 100 TB this is a
    map-only feature join (the cls1 broadcast-weights shape).
    """
    v = F.col("value").cast("decimal(18,2)")
    per_type = events.groupBy("event_type").agg(
        F.count("*").alias("cnt_t"), F.sum(v).alias("sum_t")
    )
    glob = events.agg(
        (F.sum(v).cast("double") / F.count("*")).alias("gmean")
    )
    te = F.round(
        ((F.col("sum_t") - v).cast("double") + F.lit(float(m)) * F.col("gmean"))
        / (F.col("cnt_t") - 1 + F.lit(m)),
        6,
    )
    return (
        events.select("event_id", "event_type", "value")
        .join(F.broadcast(per_type), "event_type")
        .crossJoin(F.broadcast(glob))
        .select("event_id", "event_type", te.alias("te"))
    )


_TE1_SQL = f"""
WITH t AS (
  SELECT event_type, count(*) AS cnt_t,
         sum(CAST(value AS DECIMAL(18,2))) AS sum_t
  FROM events GROUP BY event_type
),
g AS (
  SELECT CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS gmean
  FROM events
)
SELECT e.event_id, e.event_type,
       round((CAST(sum_t - CAST(value AS DECIMAL(18,2)) AS DOUBLE)
              + {float(TE1_SMOOTHING)!r} * gmean)
             / (cnt_t - 1 + {TE1_SMOOTHING}), 6) AS te
FROM events e JOIN t USING (event_type) CROSS JOIN g
"""


def markov_transitions(events: DataFrame) -> DataFrame:
    """mk1 — first-order Markov transition matrix of ``event_type`` per
    user journey: counts and probabilities of each (from → to) step under
    the per-user log order — the behavioral-model fit (next-action
    prediction, anomalous-flow detection) and the generative twin of
    fu1's fixed-funnel matching. Returns
    ``(from_type, to_type, n_transitions, p)`` with ``p`` row-normalized
    over ``from_type`` and rounded to 6 dp.

    Plan: one lead over the per-user order (d5's window family — the only
    wide exchange, user-partitioned), then a type²-cardinality aggregate
    whose row normalization is a window over that tiny frame.
    """
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    pairs = (
        events.withColumn("to_type", F.lead("event_type").over(w))
        .where(F.col("to_type").isNotNull())
        .select(F.col("event_type").alias("from_type"), "to_type")
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n_transitions")
    )
    wt = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(wt), 6
        ).alias("p"),
    )


_MK1_SQL = """
WITH l AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS to_type
  FROM events
),
c AS (
  SELECT event_type AS from_type, to_type, CAST(count(*) AS BIGINT) AS n_transitions
  FROM l WHERE to_type IS NOT NULL GROUP BY event_type, to_type
)
SELECT from_type, to_type, n_transitions,
       round(n_transitions / CAST(sum(n_transitions) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS p
FROM c
"""


AN1_Z_THRESHOLD = 3.0


def value_outliers(events: DataFrame, z_threshold: float = AN1_Z_THRESHOLD) -> DataFrame:
    """an1 — per-key outlier detection: events whose value sits
    ``z_threshold`` sample standard deviations from THEIR OWN user's mean
    — the data-quality tripwire a pipeline runs over any numeric stream
    (corrupt ingests, unit mix-ups, abuse spikes) before the stream feeds
    training statistics. Returns the flagged rows
    ``(event_id, user_id, value, z)``.

    Determinism/parity: per-user moments are DECIMAL sums of the
    2-dp-quantized value (exact, order-free — repo rule 6's sum form), the
    variance is one fixed textual formula over those exact sums
    ``(s2/n - (s1/n)^2) * n/(n-1)`` evaluated identically on both
    engines, and z rounds to 6 dp before thresholding. Users need n >= 2
    and positive variance (both guards ANSI-safe: no x/0, no sqrt(<0)).

    Scale shape: one algebraic hash aggregate to key-level cardinality
    (map-side partials; never a window over the raw stream), the skinny
    per-user (mean, var) table equi-joined back — the d8/d9 partitioning
    family, auto-broadcast while key-level is small. Output is
    tail-bounded by construction (|z| >= 3 is ~0.3% of a normal stream).
    """
    qv = F.round("value", 2).cast("decimal(18,2)")
    e = events.select("event_id", "user_id", "value", qv.alias("qv"))
    st = e.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("qv").cast("double").alias("s1"),
        F.sum(F.col("qv") * F.col("qv")).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    var = (F.col("s2") / F.col("n") - mean * mean) * F.col("n") / (F.col("n") - 1)
    stats = st.where(F.col("n") >= 2).select(
        "user_id", mean.alias("mean"), var.alias("var")
    )
    z = F.round(
        (F.col("qv").cast("double") - F.col("mean")) / F.sqrt(F.col("var")), 6
    )
    return (
        e.join(stats, "user_id")
        .where(F.col("var") > 0)
        .select("event_id", "user_id", "value", z.alias("z"))
        .where(F.abs(F.col("z")) >= z_threshold)
    )


_AN1_SQL = """
WITH e AS (
  SELECT event_id, user_id, value,
         CAST(round(value, 2) AS DECIMAL(18,2)) AS qv
  FROM events
),
st AS (
  SELECT user_id, count(*) AS n,
         CAST(sum(qv) AS DOUBLE) AS s1,
         CAST(sum(qv * qv) AS DOUBLE) AS s2
  FROM e GROUP BY user_id
),
stats AS (
  SELECT user_id,
         s1 / n AS mean,
         (s2 / n - (s1 / n) * (s1 / n)) * n / (n - 1) AS var
  FROM st WHERE n >= 2
)
SELECT event_id, e.user_id, value,
       round((CAST(qv AS DOUBLE) - mean) / sqrt(var), 6) AS z
FROM e JOIN stats ON e.user_id = stats.user_id
WHERE var > 0
  AND abs(round((CAST(qv AS DOUBLE) - mean) / sqrt(var), 6)) >= 3.0
"""


RW1_HORIZON_US = 3_600_000_000  # 1 hour in microseconds


def rolling_value(events: DataFrame, horizon_us: int = RW1_HORIZON_US) -> DataFrame:
    """rw1 — trailing TIME-RANGE rolling aggregate: for every event, the
    count/sum/mean of its user's values over the preceding hour — the
    moving-window feature family (rate limits, trailing spend, burst
    detection) that row-frame windows cannot express when events are
    unevenly spaced. This is the engine's one RANGE-frame window form
    (``RANGE BETWEEN h PRECEDING AND CURRENT ROW`` over ``ts_us``): the
    frame is defined by the ORDER value, so peers (equal timestamps) are
    all included — identical SQL-standard semantics on both engines.

    Determinism/parity: the summed value is the 2-dp DECIMAL quantization
    (an1's exact order-free sum form); the mean divides the exact sum as
    DOUBLE and rounds to 6 dp (repo rule 6). Scale shape: one exchange on
    user_id, per-user time-sorted range scan — embarrassingly parallel
    per key; the frame never buffers more than the horizon's events.
    """
    qv = F.round("value", 2).cast("decimal(18,2)")
    e = events.select("event_id", "user_id", "ts_us", qv.alias("qv"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-int(horizon_us), 0)
    )
    n = F.count("*").over(w)
    s = F.sum("qv").over(w).cast("double")
    return e.select(
        "event_id",
        "user_id",
        "ts_us",
        n.alias("n_1h"),
        s.alias("sum_1h"),
        F.round(s / n, 6).alias("avg_1h"),
    )


_RW1_SQL = f"""
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         CAST(round(value, 2) AS DECIMAL(18,2)) AS qv
  FROM events
)
SELECT event_id, user_id, ts_us,
       count(*) OVER w AS n_1h,
       CAST(sum(qv) OVER w AS DOUBLE) AS sum_1h,
       round(CAST(sum(qv) OVER w AS DOUBLE) / (count(*) OVER w), 6) AS avg_1h
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
             RANGE BETWEEN {RW1_HORIZON_US} PRECEDING AND CURRENT ROW)
"""


def build_queries():
    def q(fn, *names, spread=()):
        def run(spark: SparkSession, sf: str) -> DataFrame:
            return fn(*[tables.load(spark, sf, n, spread=(n in spread)) for n in names])

        return run

    return {
        "as1_asof_join": (q(asof_join_events_orders, "events", "orders"), _AS1_SQL),
        "ses1_sessionize": (q(sessionize, "events"), _SES1_SQL),
        "ro1_rollup_revenue": (q(rollup_revenue, "orders", "customer", "nation"), _RO1_SQL),
        "pv1_pivot_event_counts": (q(pivot_event_counts, "events"), _PV1_SQL),
        "da1_distinct_aggregates": (
            q(distinct_aggregates, "lineitem", spread=("lineitem",)),
            _DA1_SQL,
        ),
        "rg1_user_value_trends": (q(user_value_trends, "events"), _RG1_SQL),
        "as2_asof_cogrouped": (q(asof_join_cogrouped, "events", "orders"), _AS1_SQL),
        "gf1_gap_fill": (q(gap_fill, "events"), _GF1_SQL),
        "rj1_range_join": (q(range_join_counts, "events"), _RJ1_SQL),
        "fu1_funnel_stages": (q(funnel_stages, "events"), _FU1_SQL),
        "fu2_funnel_report": (q(funnel_report, "events"), _FU2_SQL),
        "co1_cohort_retention": (q(cohort_retention, "events"), _CO1_SQL),
        "an1_value_outliers": (q(value_outliers, "events"), _AN1_SQL),
        "as3_asof_forward": (q(asof_next_event, "events"), _AS3_SQL),
        "fe1_decayed_value": (q(decayed_value, "events"), _FE1_SQL),
        "rw1_rolling_value": (q(rolling_value, "events"), _RW1_SQL),
        "te1_target_encode": (q(target_encode, "events"), _TE1_SQL),
        "mk1_markov_transitions": (q(markov_transitions, "events"), _MK1_SQL),
    }


_AS1_SQL = """
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, ts AS ev_ts
  FROM events WHERE user_id < 50
), j AS (
  SELECT ev.event_id, ev.user_id, ev.ts_us, o.o_orderkey, o.o_orderdate, o.o_totalprice,
         row_number() OVER (PARTITION BY ev.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM ev JOIN orders o ON o.o_custkey = ev.user_id AND o.o_orderdate <= ev.ev_ts
)
SELECT event_id, user_id, ts_us,
       o_orderkey AS last_orderkey, o_totalprice AS last_totalprice
FROM j WHERE rn = 1
"""

_SES1_SQL = """
WITH o AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), s AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM o
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
       min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
       (max(ts_us) - min(ts_us)) / 1000000.0 AS duration_sec
FROM s GROUP BY user_id, session_id
"""

_RO1_SQL = """
SELECT coalesce(n_name, 'ALL') AS nation,
       coalesce(c_mktsegment, 'ALL') AS segment,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, c_mktsegment)
"""

_PV1_SQL = """
SELECT user_id,
       count(*) FILTER (event_type = 'click') AS n_click,
       count(*) FILTER (event_type = 'view') AS n_view,
       count(*) FILTER (event_type = 'purchase') AS n_purchase,
       count(*) FILTER (event_type = 'signup') AS n_signup,
       count(*) FILTER (event_type = 'error') AS n_error
FROM events GROUP BY user_id
"""

_DA1_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS nd_parts,
       count(DISTINCT l_suppkey) AS nd_supps,
       count(DISTINCT l_orderkey) AS nd_orders,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


def user_value_trends(events: DataFrame) -> DataFrame:
    """rg1 — linear-regression aggregates: per-user slope/intercept of value
    over time (hours since epoch) plus correlation. One hash aggregate —
    regression aggregates are algebraic (sums of products), so they get
    map-side partials like any sum.
    """
    x = F.col("ts_us") / F.lit(3.6e9)  # hours: keeps the sums well-conditioned
    y = F.col("value")
    return events.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 6).alias("intercept"),
        F.round(F.corr(x, y), 6).alias("xy_corr"),
    )


_RG1_SQL = """
SELECT user_id, count(*) AS n,
       round(regr_slope(value, epoch_us(ts) / 3.6e9), 6) AS slope,
       round(regr_intercept(value, epoch_us(ts) / 3.6e9), 6) AS intercept,
       round(corr(epoch_us(ts) / 3.6e9, value), 6) AS xy_corr
FROM events GROUP BY user_id
"""


def asof_join_cogrouped(
    events: DataFrame, orders: DataFrame, direction: str = "backward"
) -> DataFrame:
    """as2 — the CANONICAL as-of join (bench + recommended API): cogrouped
    applyInPandas merge-as-of. Both sides are co-partitioned by the key, and
    each key's pair of Arrow batches is merged with pandas ``merge_asof``
    (a linear two-pointer merge over time-sorted rows) — per-key work is
    O(n log n) sort + O(n) merge instead of as1's join of every event to
    ALL prior orders before reducing. Same semantics and oracle as as1
    (backward match, ties to the largest order key), which survives as the
    SQL-shaped cross-check.

    ``direction="forward"`` is as3 — pandas merge_asof's other half: each
    event matched to the NEXT order at or after its time, ties to the
    smallest order key, output columns ``next_orderkey/next_totalprice``
    (the time-to-next-purchase / label-lookahead form; a lookahead join
    is also the standard way to build supervised next-action labels
    without leaking the past). Identical cogroup plan — only the in-batch
    merge direction and sort order change.
    """
    import pandas as pd

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward or forward, got {direction!r}")
    fwd = direction == "forward"
    prefix = "next" if fwd else "last"
    out_cols = ["event_id", "user_id", "ts_us", f"{prefix}_orderkey", f"{prefix}_totalprice"]
    schema = (
        "event_id long, user_id long, ts_us long,"
        f" {prefix}_orderkey long, {prefix}_totalprice double"
    )

    ev = events.where(F.col("user_id") < 50).select(
        "event_id", "user_id", "ts_us", F.col("ts").alias("ev_ts")
    )
    od = orders.select(
        F.col("o_custkey").alias("user_id"), "o_orderkey", "o_orderdate", "o_totalprice"
    )
    # Prune the right side to keys that exist on the left BEFORE cogrouping:
    # every right-only key still costs a Python invocation inside the
    # cogroup (measured: ~15k empty groups = ~22s at sf0.1), and a
    # broadcast semi-join removes them for free.
    od = od.join(F.broadcast(ev.select("user_id").distinct()), "user_id", "left_semi")

    def merge(ev_pdf: pd.DataFrame, od_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(ev_pdf) == 0 or len(od_pdf) == 0:
            return pd.DataFrame(columns=out_cols)
        left = ev_pdf.sort_values("ev_ts", kind="mergesort")
        # backward: right asc by (date, orderkey) — merge_asof takes the
        # LAST row at or before the key = max_by(date, orderkey).
        # forward: same asc sort — merge_asof takes the FIRST row at or
        # after the key = min_by(date, orderkey).
        right = od_pdf.sort_values(["o_orderdate", "o_orderkey"], kind="mergesort")
        m = pd.merge_asof(
            left, right, left_on="ev_ts", right_on="o_orderdate", direction=direction
        )
        m = m.dropna(subset=["o_orderkey"])
        if len(m) == 0:
            return pd.DataFrame(columns=out_cols)
        return pd.DataFrame(
            {
                "event_id": m["event_id"].astype("int64"),
                "user_id": m["user_id_x"].astype("int64"),
                "ts_us": m["ts_us"].astype("int64"),
                f"{prefix}_orderkey": m["o_orderkey"].astype("int64"),
                f"{prefix}_totalprice": m["o_totalprice"].astype("float64"),
            }
        )

    return (
        ev.groupBy("user_id")
        .cogroup(od.groupBy("user_id"))
        .applyInPandas(merge, schema)
    )


def asof_next_event(
    events: DataFrame, to_type: str = "purchase", max_user: int = 50
) -> DataFrame:
    """as3 — FORWARD as-of on the event stream: each non-``to_type`` event
    matched to the user's next ``to_type`` event at or after it (strictly
    by (ts_us, event_id) order), with the gap in microseconds — the
    time-to-conversion / label-lookahead join. A lookahead join is also
    how supervised next-action labels are built without leaking the past:
    the label row is strictly later than everything in the feature row.
    Returns ``(event_id, user_id, ts_us, next_event_id, next_ts_us,
    gap_us)``; events with no later ``to_type`` drop out (inner as-of).

    Same cogrouped merge_asof machinery as as2 (co-partitioned by user,
    linear two-pointer merge per Arrow batch, right side semi-join pruned)
    with ``direction="forward"`` — ties at equal timestamps resolve to the
    smallest event_id (note 1's canonical event order), mirrored by the
    oracle's ``ORDER BY ts_us ASC, event_id ASC`` row_number. Users are
    bounded to < ``max_user`` so the oracle's quadratic join stays small
    (the as1/as2 convention).
    """
    import pandas as pd

    base = events.where(F.col("user_id") < max_user)
    left = base.where(F.col("event_type") != to_type).select(
        "event_id", "user_id", "ts_us"
    )
    right = base.where(F.col("event_type") == to_type).select(
        F.col("user_id"),
        F.col("event_id").alias("p_event_id"),
        F.col("ts_us").alias("p_ts_us"),
    )
    # No as2-style semi-join prune here: on a SELF-join the two sides
    # already share the key universe (a right-only key is a user whose
    # events are ALL of to_type — rare, and each costs one empty-group
    # Python call, not a foreign table's worth of them), and Spark's
    # ambiguous-self-join analyzer rejects the prune's shared-lineage
    # join in every aliasing formulation.
    out_cols = ["event_id", "user_id", "ts_us", "next_event_id", "next_ts_us", "gap_us"]

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(l_pdf) == 0 or len(r_pdf) == 0:
            return pd.DataFrame(columns=out_cols)
        lf = l_pdf.sort_values(["ts_us", "event_id"], kind="mergesort")
        rt = r_pdf.sort_values(["p_ts_us", "p_event_id"], kind="mergesort")
        m = pd.merge_asof(
            lf, rt, left_on="ts_us", right_on="p_ts_us", direction="forward"
        )
        m = m.dropna(subset=["p_event_id"])
        if len(m) == 0:
            return pd.DataFrame(columns=out_cols)
        return pd.DataFrame(
            {
                "event_id": m["event_id"].astype("int64"),
                "user_id": m["user_id_x"].astype("int64"),
                "ts_us": m["ts_us"].astype("int64"),
                "next_event_id": m["p_event_id"].astype("int64"),
                "next_ts_us": m["p_ts_us"].astype("int64"),
                "gap_us": (m["p_ts_us"] - m["ts_us"]).astype("int64"),
            }
        )

    return (
        left.groupBy("user_id")
        .cogroup(right.groupBy("user_id"))
        .applyInPandas(
            merge,
            "event_id long, user_id long, ts_us long, next_event_id long,"
            " next_ts_us long, gap_us long",
        )
    )


_AS3_SQL = """
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
  FROM events WHERE user_id < 50
), l AS (
  SELECT event_id, user_id, ts_us FROM e WHERE event_type <> 'purchase'
), p AS (
  SELECT user_id, event_id AS p_event_id, ts_us AS p_ts_us
  FROM e WHERE event_type = 'purchase'
), j AS (
  SELECT l.event_id, l.user_id, l.ts_us, p.p_event_id, p.p_ts_us,
         row_number() OVER (PARTITION BY l.event_id
                            ORDER BY p.p_ts_us ASC, p.p_event_id ASC) AS rn
  FROM l JOIN p ON p.user_id = l.user_id AND p.p_ts_us >= l.ts_us
)
SELECT event_id, user_id, ts_us, p_event_id AS next_event_id,
       p_ts_us AS next_ts_us, p_ts_us - ts_us AS gap_us
FROM j WHERE rn = 1
"""
