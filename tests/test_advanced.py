"""Advanced relational operators vs DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from tests.oracle import check_query

ADV_QUERIES = [
    "as1_asof_join",
    "ses1_sessionize",
    "ro1_rollup_revenue",
    "pv1_pivot_event_counts",
    "da1_distinct_aggregates",
    "gf1_gap_fill",
    "fu1_funnel_stages",
    "co1_cohort_retention",
]


@pytest.mark.parametrize("name", ADV_QUERIES)
def test_oracle_match(spark, name):
    ok, msg = check_query(spark, name, SF_SMALL)
    assert ok, msg


def test_as2_cogrouped_oracle(spark):
    ok, msg = check_query(spark, "as2_asof_cogrouped", SF_SMALL)
    assert ok, msg


def test_as2_equals_as1(spark):
    """Two as-of implementations (join+reduce vs cogrouped merge_asof) must
    agree row for row."""
    from samsa_spark import registry

    qs = registry.all_queries()
    a1 = {tuple(r) for r in qs["as1_asof_join"](spark, SF_SMALL).collect()}
    a2 = {tuple(r) for r in qs["as2_asof_cogrouped"](spark, SF_SMALL).collect()}
    assert a1 == a2


def test_gap_fill_planted_gaps(spark):
    """gf1 on a constructed series: missing buckets appear with gap=True
    and carry the last observed value forward; leading buckets before the
    first observation never exist (grid starts at the key's first bucket);
    within-bucket latest-event-wins matches D2's tie-break."""
    from samsa_spark.operators.advanced import gap_fill

    B = 1_000_000  # 1-second buckets for the test
    rows = [
        # user 1: buckets 0, 3 observed -> 1, 2 are gaps carrying value 10.0
        (1, 0, 1, "a", 10.0),
        (1, 3 * B, 2, "a", 40.0),
        # user 1, bucket 3 has a second, LATER event -> 40.0 loses to 41.0
        (1, 3 * B + 5, 3, "a", 41.0),
        # user 2: single bucket, no gaps
        (2, 7 * B, 4, "a", 70.0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts_us long, event_id long, event_type string, value double"
    )
    got = {
        (r.user_id, r.bucket): (r.n_events, r.filled_value, r.gap)
        for r in gap_fill(ev, bucket_us=B).collect()
    }
    assert got == {
        (1, 0): (1, 10.0, False),
        (1, 1): (0, 10.0, True),
        (1, 2): (0, 10.0, True),
        (1, 3): (2, 41.0, False),
        (2, 7): (1, 70.0, False),
    }


def test_gap_fill_matches_python_model_on_random_series(spark):
    """gf1 against an in-process python model on randomized event sets —
    duplicate buckets, ties inside a bucket, sparse and dense keys."""
    import random

    from samsa_spark.operators.advanced import gap_fill

    rng = random.Random(29)
    B = 1_000_000
    for trial in range(3):
        rows = []
        eid = 0
        for user in range(1, 6):
            for _ in range(rng.randint(1, 25)):
                eid += 1
                bucket = rng.randint(0, 12)
                off = rng.randint(0, B - 1)
                rows.append((user, bucket * B + off, eid, "a", round(rng.uniform(0, 100), 2)))
        ev = spark.createDataFrame(
            rows,
            "user_id long, ts_us long, event_id long, event_type string, value double",
        )

        # python model
        by_bucket = {}
        for u, ts, e, _, v in rows:
            key = (u, ts // B)
            cur = by_bucket.get(key)
            if cur is None or (ts, e) > (cur[0], cur[1]):
                by_bucket[key] = (ts, e, v, (cur[3] + 1) if cur else 1)
            else:
                by_bucket[key] = (cur[0], cur[1], cur[2], cur[3] + 1)
        want = {}
        for u in {r[0] for r in rows}:
            buckets = [b for (uu, b) in by_bucket if uu == u]
            last = None
            for b in range(min(buckets), max(buckets) + 1):
                obs = by_bucket.get((u, b))
                if obs is not None:
                    last = obs[2]
                    want[(u, b)] = (obs[3], last, False)
                else:
                    want[(u, b)] = (0, last, True)

        got = {
            (r.user_id, r.bucket): (r.n_events, r.filled_value, r.gap)
            for r in gap_fill(ev, bucket_us=B).collect()
        }
        assert got == want, f"trial {trial} diverged"


def test_rj1_oracle_match(spark):
    from tests.oracle import check_query

    ok, msg = check_query(spark, "rj1_range_join", SF_SMALL)
    assert ok, msg


def test_range_join_counts_matches_naive_join(spark):
    """The binned rewrite must agree with the naive inequality join on
    constructed boundary cases: clicks exactly at p_ts, exactly at
    p_ts - W, one past either edge, and clicks spanning bucket borders."""
    import pandas as pd

    from samsa_spark.operators.advanced import range_join_counts

    W = 100
    rows = []
    # purchase at t=1000; clicks at 899 (out), 900 (in, = p-W), 950 (in,
    # crosses bucket border 900..999 vs 1000), 1000 (in), 1001 (out)
    rows.append((1, "purchase", 1000))
    for i, t in enumerate((899, 900, 950, 1000, 1001)):
        rows.append((10 + i, "click", t))
    # purchase with no clicks in range
    rows.append((2, "purchase", 5000))
    pdf = pd.DataFrame(rows, columns=["event_id", "event_type", "ts_us"])
    df = spark.createDataFrame(pdf)
    got = {
        r.purchase_id: r.n_recent_clicks
        for r in range_join_counts(df, window_us=W).collect()
    }
    assert got == {1: 3, 2: 0}


def test_range_join_plan_is_equi_join_not_nested_loop(spark):
    """The whole point of the binned rewrite: the physical plan must be a
    partitioned/broadcast HASH equi-join on the bucket, never the
    BroadcastNestedLoopJoin the raw range predicate forces."""
    from samsa_spark import registry

    df = registry.all_queries()["rj1_range_join"](spark, SF_SMALL)
    p = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert ("BroadcastHashJoin" in p) or ("SortMergeJoin" in p) or (
        "ShuffledHashJoin" in p
    ), p


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_rj_events = st.lists(
    st.tuples(st.sampled_from(["click", "purchase"]), st.integers(0, 400)),
    min_size=1,
    max_size=30,
)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(evs=_rj_events, w=st.integers(min_value=1, max_value=120))
def test_range_join_matches_model_on_random_events(spark, evs, w):
    """rj1's binned rewrite vs the O(n^2) Python model on random event
    streams and window widths — bucket-boundary alignment cases occur
    constantly at these scales; hypothesis shrinks any counterexample."""
    from samsa_spark.operators.advanced import range_join_counts

    rows = [(i, t, ts) for i, (t, ts) in enumerate(evs)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, ts_us long")
    got = {
        r.purchase_id: r.n_recent_clicks
        for r in range_join_counts(df, window_us=w).collect()
    }
    clicks = [ts for i, (t, ts) in enumerate(evs) if t == "click"]
    want = {
        i: sum(1 for c in clicks if ts - w <= c <= ts)
        for i, (t, ts) in enumerate(evs)
        if t == "purchase"
    }
    assert got == want


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.tuples(st.integers(1, 40), st.integers(1, 900)), min_size=1, max_size=25
    ),
    bt=st.integers(min_value=8, max_value=200),
    bb=st.integers(min_value=64, max_value=2048),
)
def test_interleaved_pack_matches_model_on_random_docs(spark, docs, bt, bb):
    """mm5's dual-budget bin rule vs the Python model on random token/byte
    profiles and budgets: bin = max(cum-before div budget) over both
    resources, per source in doc_id order."""
    import pandas as pd

    from samsa_spark.operators.multimodal import interleaved_pack

    rows = [
        (i, "s", " ".join("x" * b for _ in range(nt))[: nt * (b + 1) - 1])
        for i, (nt, b) in enumerate(docs)
    ]
    # text built so n_tokens = nt and octet_length = nt*(b+1)-1 (ascii)
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    got = {
        (r.source, r.bin): (r.n_docs, r.bin_tokens, r.bin_media_bytes)
        for r in interleaved_pack(
            spark.createDataFrame(pdf), budget_tokens=bt, budget_media_bytes=bb
        ).collect()
    }
    from collections import defaultdict

    model = defaultdict(lambda: [0, 0, 0])
    ct = cb = 0
    for i, (nt, b) in enumerate(docs):
        nb = nt * (b + 1) - 1
        bin_ = max(ct // bt, cb // bb)
        ct += nt
        cb += nb
        m = model[("s", bin_)]
        m[0] += 1
        m[1] += nt
        m[2] += nb
    assert got == {k: tuple(v) for k, v in model.items()}


def test_fu1_funnel_ordering_hand_computed(spark):
    """The strictly-after chain on a corpus built by hand: clicks BEFORE
    the first view must not count; the first valid click gates which
    purchases count; users stall at the deepest stage they legitimately
    reached."""
    import pandas as pd

    from samsa_spark.operators.advanced import funnel_stages

    #            user  type        ts_us
    rows = [
        (1, "click", 10),      # before any view -> ignored
        (1, "view", 20),
        (1, "click", 30),      # first valid click
        (1, "purchase", 25),   # before the valid click -> ignored
        (1, "purchase", 40),   # counts
        (2, "view", 100),      # never clicks
        (2, "purchase", 150),  # purchase without click -> stalls at 1
        (3, "error", 5),       # never views -> reached 0
    ]
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "event_type", "ts_us"])
    )
    got = {r.user_id: (r.t1_us, r.t2_us, r.t3_us, r.reached) for r in funnel_stages(ev).collect()}
    assert got == {
        1: (20, 30, 40, 3),
        2: (100, None, None, 1),
        3: (None, None, None, 0),
    }


def test_co1_cohort_offsets_hand_computed(spark):
    """Cohort weeks and offsets on synthetic µs timestamps: users cohort at
    their first week bucket; repeat activity in one week counts once."""
    import pandas as pd

    from samsa_spark.operators.advanced import _WEEK_US, cohort_retention

    w = _WEEK_US
    rows = [
        (1, 0), (1, 10), (1, w + 5), (1, 3 * w),        # offsets 0,1,3
        (2, w), (2, w + 1), (2, 2 * w),                 # cohort w; offsets 0,1
        (3, 3 * w + 2),                                 # cohort 3w; offset 0
    ]
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts_us"])
    )
    got = {
        (r.cohort_week_us, r.week_offset): r.n_users
        for r in cohort_retention(ev).collect()
    }
    assert got == {
        (0, 0): 1, (0, 1): 1, (0, 3): 1,
        (w, 0): 1, (w, 1): 1,
        (3 * w, 0): 1,
    }


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_fu_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),                      # user
        st.sampled_from(["view", "click", "purchase", "error"]),
        st.integers(min_value=0, max_value=50),                     # ts_us
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(evs=_fu_events)
def test_fu1_matches_python_model_on_random_events(spark, evs):
    """fu1 vs the brute-force chain model on random event sets — ties on
    ts between stages, repeated events, and absent stages occur constantly
    (strictly-after uses >, so equal timestamps never chain)."""
    import pandas as pd

    from samsa_spark.operators.advanced import funnel_stages

    df = spark.createDataFrame(
        pd.DataFrame(evs, columns=["user_id", "event_type", "ts_us"])
    )
    got = {
        r.user_id: (r.t1_us, r.t2_us, r.t3_us, r.reached)
        for r in funnel_stages(df).collect()
    }

    want = {}
    for u in {e[0] for e in evs}:
        mine = [(t, ts) for uu, t, ts in evs if uu == u]
        t1 = min((ts for t, ts in mine if t == "view"), default=None)
        t2 = (
            min((ts for t, ts in mine if t == "click" and ts > t1), default=None)
            if t1 is not None
            else None
        )
        t3 = (
            min((ts for t, ts in mine if t == "purchase" and ts > t2), default=None)
            if t2 is not None
            else None
        )
        reached = 3 if t3 is not None else 2 if t2 is not None else 1 if t1 is not None else 0
        want[u] = (t1, t2, t3, reached)
    assert got == want


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(evs=st.lists(st.tuples(st.integers(1, 4), st.integers(0, 10)), min_size=1, max_size=40))
def test_co1_matches_python_model_on_random_events(spark, evs):
    """co1 vs the brute-force cohort model: ts values are scaled into week
    buckets so multi-week activity and single-week repeats both occur."""
    import pandas as pd

    from samsa_spark.operators.advanced import _WEEK_US, cohort_retention

    rows = [(u, w * _WEEK_US + (u * 37 % _WEEK_US)) for u, w in evs]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["user_id", "ts_us"]))
    got = {
        (r.cohort_week_us, r.week_offset): r.n_users
        for r in cohort_retention(df).collect()
    }

    first = {}
    for u, w in evs:
        first[u] = min(first.get(u, w), w)
    pairs = {(u, first[u] * _WEEK_US, w - first[u]) for u, w in evs}
    want = {}
    for _, cw, off in pairs:
        want[(cw, off)] = want.get((cw, off), 0) + 1
    assert got == want


def test_fu1_four_stage_funnel(spark):
    """The generalized n-stage chain: a 4-stage funnel chains strictly
    after through all stages and stalls wherever the chain breaks."""
    import pandas as pd

    from samsa_spark.operators.advanced import funnel_stages

    rows = [
        (1, "view", 1), (1, "click", 2), (1, "signup", 3), (1, "purchase", 4),
        (2, "view", 1), (2, "click", 2), (2, "purchase", 1),  # purchase too early
    ]
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "event_type", "ts_us"])
    )
    got = {
        r.user_id: (r.t1_us, r.t2_us, r.t3_us, r.t4_us, r.reached)
        for r in funnel_stages(
            ev, stages=("view", "click", "signup", "purchase")
        ).collect()
    }
    assert got == {1: (1, 2, 3, 4, 4), 2: (1, 2, None, None, 2)}


def test_fu1_conversion_window(spark):
    """within_us bounds each hop: a click 100us after the view converts
    under a 100us window, 101us does not; the chain stalls rather than
    reaching for a later in-window event that doesn't exist."""
    import pandas as pd

    from samsa_spark.operators.advanced import funnel_stages

    rows = [
        (1, "view", 0), (1, "click", 100), (1, "purchase", 150),
        (2, "view", 0), (2, "click", 101),
    ]
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "event_type", "ts_us"])
    )
    got = {
        r.user_id: (r.t1_us, r.t2_us, r.t3_us, r.reached)
        for r in funnel_stages(ev, within_us=100).collect()
    }
    assert got == {1: (0, 100, 150, 3), 2: (0, None, None, 1)}


def test_fu2_oracle_match(spark):
    ok, msg = check_query(spark, "fu2_funnel_report", SF_SMALL)
    assert ok, msg


def test_fu2_report_consistent_with_fu1(spark):
    """The report must be exactly fu1's per-user table collapsed: reached
    counts and rate ratios recomputed from fu1 row-by-row."""
    from samsa_spark import tables
    from samsa_spark.operators.advanced import funnel_report, funnel_stages

    ev = tables.load(spark, SF_SMALL, "events")
    fun = funnel_stages(ev).collect()
    n = len(fun)
    r = [sum(1 for x in fun if x.reached >= i) for i in (1, 2, 3)]
    got = {x.stage_idx: x for x in funnel_report(ev).collect()}
    prev = [n, r[0], r[1]]
    for i in (1, 2, 3):
        assert got[i].n_users_reached == r[i - 1]
        assert got[i].conv_from_prev == round(r[i - 1] / prev[i - 1], 6)
        assert got[i].conv_from_start == round(r[i - 1] / n, 6)


def test_fu2_zero_user_stage_reports_null_not_error(spark):
    """A stage name absent from the corpus (zero users) must yield NULL
    conversions downstream of it — under ANSI mode a plain division would
    throw DIVIDE_BY_ZERO; DuckDB's x/0 is NULL, so NULL is also the
    oracle-parity answer."""
    from samsa_spark import tables
    from samsa_spark.operators.advanced import funnel_report

    ev = tables.load(spark, SF_SMALL, "events")
    got = {
        x.stage_idx: x
        for x in funnel_report(ev, stages=("view", "no_such_event", "purchase")).collect()
    }
    assert got[1].n_users_reached > 0 and got[1].conv_from_prev is not None
    assert got[2].n_users_reached == 0 and got[2].conv_from_prev == 0.0
    # stage 3 divides by stage 2's zero -> NULL, not an ANSI error
    assert got[3].n_users_reached == 0
    assert got[3].conv_from_prev is None
    assert got[3].conv_from_start == 0.0


def test_an1_oracle_match(spark):
    from tests.oracle import check_query
    from tests.conftest import SF_SMALL

    ok, msg = check_query(spark, "an1_value_outliers", SF_SMALL)
    assert ok, msg


def test_an1_planted_outlier_and_guards(spark):
    """A planted spike must be flagged with the right z; tight-variance
    users flag nothing; single-event and constant-value users must be
    silently skipped (the ANSI x/0 and sqrt(<0) guards), not crash."""
    from samsa_spark.operators.advanced import value_outliers

    rows = []
    # user 1: 20 values at 100 +- 1, one spike at 200
    for i in range(20):
        rows.append((i, 1, 100.0 + (1.0 if i % 2 else -1.0)))
    rows.append((20, 1, 200.0))
    # user 2: constant values -> var 0 -> no rows, no crash
    for i in range(21, 26):
        rows.append((i, 2, 50.0))
    # user 3: single event -> n < 2 -> skipped
    rows.append((26, 3, 1e9))
    ev = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    got = value_outliers(ev).collect()
    assert [r.event_id for r in got] == [20]
    import statistics

    vals = [100.0 + (1.0 if i % 2 else -1.0) for i in range(20)] + [200.0]
    want = round((200.0 - statistics.mean(vals)) / statistics.stdev(vals), 6)
    assert abs(got[0].z - want) < 1e-6


def test_as3_oracle_match(spark):
    from tests.conftest import SF_SMALL
    from tests.oracle import check_query

    ok, msg = check_query(spark, "as3_asof_forward", SF_SMALL)
    assert ok, msg


def test_as3_forward_semantics_planted(spark):
    """Forward as-of: each event takes the NEXT purchase at-or-after its
    time (at-or-equal included, ties to the smallest event_id), events
    after the last purchase drop out, gap arithmetic exact."""
    from samsa_spark.operators.advanced import asof_next_event

    rows = [
        # (event_id, ts_us, user_id, event_type)
        (1, 100, 7, "view"),
        (2, 150, 7, "purchase"),
        (3, 150, 7, "view"),      # equal-time: matches purchase at 150
        (4, 200, 7, "purchase"),
        (5, 300, 7, "view"),      # after last purchase -> dropped
        (6, 100, 8, "view"),      # other user: own purchase only
        (7, 500, 8, "purchase"),
    ]
    ev = spark.createDataFrame(
        [(e, u, t, ty) for (e, t, u, ty) in rows],
        "event_id long, user_id long, ts_us long, event_type string",
    )
    got = {r.event_id: r for r in asof_next_event(ev).collect()}
    assert set(got) == {1, 3, 6}
    assert got[1].next_event_id == 2 and got[1].gap_us == 50
    assert got[3].next_event_id == 2 and got[3].gap_us == 0
    assert got[6].next_event_id == 7 and got[6].gap_us == 400


def test_as2_forward_direction_api(spark):
    """asof_join_cogrouped(direction='forward') — pandas-parity lookahead
    on a synthetic orders frame where forward matches exist (the fixture
    orders all PRECEDE the fixture events, so the registered as3 uses the
    event-stream self form instead)."""
    import datetime

    import pytest

    from samsa_spark.operators.advanced import asof_join_cogrouped

    def ts(day):
        return datetime.datetime(2024, 1, day)

    ev = spark.createDataFrame(
        [(1, 3, 3_000_000, ts(3)), (2, 3, 10_000_000, ts(10))],
        "event_id long, user_id long, ts_us long, ts timestamp",
    )
    od = spark.createDataFrame(
        [
            (3, 101, ts(5), 50.0),   # after event 1 -> its match
            (3, 102, ts(5), 60.0),   # same date, larger key -> not chosen
            (3, 103, ts(1), 70.0),   # before both events
        ],
        "o_custkey long, o_orderkey long, o_orderdate timestamp, o_totalprice double",
    )
    got = {r.event_id: r for r in asof_join_cogrouped(ev, od, direction="forward").collect()}
    assert got[1].next_orderkey == 101 and got[1].next_totalprice == 50.0
    assert 2 not in got  # no order at/after Jan 10
    back = {r.event_id: r for r in asof_join_cogrouped(ev, od).collect()}
    assert back[1].last_orderkey == 103  # backward still the old semantics
    assert back[2].last_orderkey == 102  # ties to the LARGEST key backward
    with pytest.raises(ValueError):
        asof_join_cogrouped(ev, od, direction="nearest")


def test_fe1_oracle_match(spark):
    from tests.conftest import SF_SMALL
    from tests.oracle import check_query

    ok, msg = check_query(spark, "fe1_decayed_value", SF_SMALL)
    assert ok, msg


def test_fe1_hand_computed_decay(spark):
    """Recency weighting against hand math: an event tau ago counts e^-1
    of a now-event, 2*tau ago e^-2; per-user totals match the closed
    form to the 6-dp term grid."""
    import datetime
    import math

    from samsa_spark.operators.advanced import decayed_value

    tau = 1_000_000  # 1 second, for easy hand math
    ts0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, 1, 0, 10.0),          # 2*tau before the max
        (2, 1, 1_000_000, 10.0),  # tau before
        (3, 1, 2_000_000, 10.0),  # the max event
        (4, 2, 2_000_000, 5.0),   # other user at the max instant
    ]
    ev = spark.createDataFrame(
        [(e, u, t, v, ts0) for (e, u, t, v) in rows],
        "event_id long, user_id long, ts_us long, value double, ts timestamp",
    )
    got = {r.user_id: r for r in decayed_value(ev, tau_us=tau).collect()}
    want1 = round(10.0 * math.exp(-2.0), 6) + round(10.0 * math.exp(-1.0), 6) + 10.0
    assert abs(got[1].decayed_value - want1) < 1e-9
    assert got[1].n_events == 3
    assert got[2].decayed_value == 5.0


def test_rw1_oracle_match(spark):
    ok, msg = check_query(spark, "rw1_rolling_value", SF_SMALL)
    assert ok, msg


def test_rw1_range_frame_semantics_hand_computed(spark):
    """The RANGE frame's defining behaviors, on a hand-built stream: the
    trailing window is TIME-bounded (an event 61 minutes earlier drops
    out), peers at an equal timestamp are all included (SQL-standard RANGE
    peer rule), and counts/sums follow exactly."""
    import pyspark.sql.functions as F

    from samsa_spark.operators.advanced import rolling_value

    H = 3_600_000_000
    rows = [
        # user 1: t=0, t=30min, t=61min (first drops out of the last frame)
        (1, 1, 0, 10.0),
        (2, 1, 30 * 60_000_000, 20.0),
        (3, 1, 61 * 60_000_000, 30.0),
        # user 2: two PEER events at the same ts + one current row later
        (4, 2, 1000, 1.0),
        (5, 2, 1000, 2.0),
        (6, 2, 2000, 3.0),
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts_us long, value double")
    got = {r.event_id: (r.n_1h, r.sum_1h, r.avg_1h) for r in rolling_value(ev).collect()}
    assert got[1] == (1, 10.0, 10.0)
    assert got[2] == (2, 30.0, 15.0)
    # event 3's frame: [61min - 60min, 61min] -> includes t=30min only + itself
    assert got[3] == (2, 50.0, 25.0)
    # peers at ts=1000 see EACH OTHER (range frame peer rule)
    assert got[4] == (2, 3.0, 1.5) and got[5] == (2, 3.0, 1.5)
    assert got[6] == (3, 6.0, 2.0)


def test_te1_oracle_match(spark):
    from tests.conftest import SF_SMALL
    from tests.oracle import check_query

    ok, msg = check_query(spark, "te1_target_encode", SF_SMALL)
    assert ok, msg


def test_mk1_oracle_match(spark):
    from tests.conftest import SF_SMALL
    from tests.oracle import check_query

    ok, msg = check_query(spark, "mk1_markov_transitions", SF_SMALL)
    assert ok, msg


def test_te1_leave_one_out_removes_own_target(spark):
    """With m=0 the encoding is exactly the mean of the OTHER same-type
    rows — each row's own value must not leak into its feature."""
    from samsa_spark.operators.advanced import target_encode

    rows = [
        (1, "a", 10.0),
        (2, "a", 20.0),
        (3, "a", 30.0),
        (4, "b", 5.0),
        (5, "b", 15.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    got = {r.event_id: r.te for r in target_encode(df, m=0).collect()}
    assert got[1] == 25.0  # mean(20, 30)
    assert got[2] == 20.0  # mean(10, 30)
    assert got[4] == 15.0  # the other b row
    # smoothing pulls toward the global mean (16.0) without leaking self
    sm = {r.event_id: r.te for r in target_encode(df, m=1000).collect()}
    assert abs(sm[1] - 16.0) < 0.1 and sm[1] != got[1]


def test_mk1_transition_probabilities_row_normalize(spark):
    """Hand journeys count correctly and every from_type's probabilities
    sum to 1 (within rounding) on the real log."""
    from samsa_spark import tables
    from samsa_spark.operators.advanced import markov_transitions
    from tests.conftest import SF_SMALL

    rows = [
        (1, 1, 100, "a"),
        (2, 1, 200, "b"),
        (3, 1, 300, "a"),
        (4, 2, 100, "a"),
        (5, 2, 200, "b"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, event_type string"
    )
    got = {
        (r.from_type, r.to_type): (r.n_transitions, r.p)
        for r in markov_transitions(df).collect()
    }
    assert got == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}

    real = markov_transitions(tables.load(spark, SF_SMALL, "events")).collect()
    from collections import defaultdict

    sums = defaultdict(float)
    for r in real:
        sums[r.from_type] += r.p
    assert all(abs(s - 1.0) < 1e-4 for s in sums.values())
