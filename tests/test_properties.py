"""Property-based tests (SURVEY.md §5.2-4) for the state-store algebra:

- compaction idempotence: compact(compact(log)) == compact(log)
- split-merge equivalence: any split of the log, compacted separately and
  merged, equals compacting the whole log (the invariant samsa's recovery
  relies on — replaying a changelog in any batching gives the same table)
- lookup-after-put: the compacted value for a key is the payload of its
  maximal (ts_us, event_id) row
- tombstone removal: keys whose latest event is a tombstone disappear

Random logs are generated driver-side and run through the REAL Spark
operators on small data (hypothesis shrinks counterexamples).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

EVENT_TYPES = ["click", "view", "error"]

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # user_id
        st.integers(min_value=0, max_value=50),  # ts_us
        st.sampled_from(EVENT_TYPES),  # event_type
        st.floats(min_value=0, max_value=100, allow_nan=False, width=32),  # value
    ),
    min_size=1,
    max_size=40,
)

SCHEMA = "user_id long, ts_us long, event_id long, event_type string, value double"


def _df(spark, rows):
    data = [(u, t, i, e, float(v)) for i, (u, t, e, v) in enumerate(rows)]
    return spark.createDataFrame(data, SCHEMA)


def _compact(df):
    from samsa_spark.operators.state import compact_latest

    return compact_latest(df, payload_cols=("event_type", "value"))


def _as_events(compacted):
    """Rename a compacted state table back to event-log column names."""
    return compacted.select(
        "user_id",
        F.col("last_ts_us").alias("ts_us"),
        F.col("last_event_id").alias("event_id"),
        F.col("last_event_type").alias("event_type"),
        F.col("last_value").alias("value"),
    )


def _rowset(df):
    return {tuple(r) for r in df.collect()}


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy)
def test_compaction_idempotent(spark, rows):
    df = _df(spark, rows)
    once = _compact(df)
    twice = _compact(_as_events(once))
    assert _rowset(once) == _rowset(twice)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy, pivot=st.integers(min_value=0, max_value=39))
def test_split_merge_equals_full_compaction(spark, rows, pivot):
    from samsa_spark.operators.state import upsert_merge

    df = _df(spark, rows)
    full = _compact(df)
    left = _compact(df.where(F.col("event_id") <= pivot))
    right = df.where(F.col("event_id") > pivot)
    if right.count() == 0:
        merged = left
    else:
        merged = upsert_merge(left, right)
    assert _rowset(full) == _rowset(merged)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy)
def test_lookup_after_put(spark, rows):
    df = _df(spark, rows)
    got = {r.user_id: (r.last_ts_us, r.last_event_id, r.last_event_type) for r in _compact(df).collect()}
    # python reference fold (the samsa save loop, storage.py:190-206)
    expect = {}
    for i, (u, t, e, v) in enumerate(rows):
        cur = expect.get(u)
        if cur is None or (t, i) > (cur[0], cur[1]):
            expect[u] = (t, i, e)
    assert got == expect


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy)
def test_tombstones_remove_keys(spark, rows):
    from samsa_spark.operators.state import apply_tombstones

    df = _df(spark, rows)
    alive = {r.user_id for r in apply_tombstones(df, tombstone_type="error").collect()}
    expect = {}
    for i, (u, t, e, v) in enumerate(rows):
        cur = expect.get(u)
        if cur is None or (t, i) > (cur[0], cur[1]):
            expect[u] = (t, i, e)
    expect_alive = {u for u, (_, _, e) in expect.items() if e != "error"}
    assert alive == expect_alive


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=8).map(" ".join),
        min_size=1,
        max_size=12,
    )
)
def test_ngram_jaccard_matches_python_reference(spark, texts):
    """dd2 inverted-index Jaccard == brute-force python over random tiny
    corpora (covers short docs, empty docs, identical docs)."""
    from samsa_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): (r.n_inter, r.jaccard) for r in ngram_jaccard_pairs(docs).collect()}

    def shingles(t):
        toks = t.split(" ")
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    want = {}
    sh = {i: shingles(t) for i, t in enumerate(texts)}
    for a in sh:
        for b in sh:
            if a < b and sh[a] & sh[b]:
                inter = len(sh[a] & sh[b])
                want[(a, b)] = (inter, round(inter / len(sh[a] | sh[b]), 6))
    assert got == want
