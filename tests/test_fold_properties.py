"""Property tests for the per-key fold at the heart of StatefulStream
(state_stream._build_fold) — run WITHOUT Spark: the fold is a pure closure
over pandas batches and a GroupState-shaped object, so hypothesis can sweep
hundreds of random event sequences and batch splits in milliseconds each.

The model: last-writer-wins by (ts, event_id); a winning tombstone value
deletes the key (marker mode keeps a high-water mark, eager mode forgets).
Any partition of the log into ordered trigger batches must converge to the
same final state as batch compaction over the whole log.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from samsa_spark.streaming.state_stream import _build_fold

KEY = "k"
ORDER = ("ts", "eid")
VALUES = ("etype", "val")


class FakeState:
    """The subset of pyspark GroupState the fold touches."""

    def __init__(self) -> None:
        self._v = None

    @property
    def exists(self) -> bool:
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v) -> None:
        self._v = tuple(v)

    def remove(self) -> None:
        self._v = None


def _run_fold(events, splits, tombstone=None, eager=False):
    """Feed `events` (list of (ts, eid, etype, val) for ONE key) through the
    fold in trigger batches cut at `splits`; return (final_state, outputs)."""
    fold = _build_fold(KEY, ORDER, VALUES, tombstone, eager)
    state = FakeState()
    outs = []
    bounds = [0, *sorted(set(splits)), len(events)]
    for lo, hi in zip(bounds, bounds[1:]):
        batch = events[lo:hi]
        if not batch:
            continue
        pdf = pd.DataFrame(batch, columns=["ts", "eid", "etype", "val"])
        outs.extend(df for df in fold((7,), iter([pdf]), state))
    return state._v, outs


def _batch_model(events, tombstone=None):
    """Reference semantics: winner = max (ts, eid); tombstone winner -> None."""
    if not events:
        return None
    win = max(events, key=lambda e: (e[0], e[1]))
    if tombstone is not None and win[2] == tombstone[1]:
        return None
    return win


EVENT = st.tuples(
    st.integers(0, 50),  # ts (small range -> plenty of cross-batch disorder)
    st.integers(0, 10_000),  # eid (unique-ish tie-break)
    st.sampled_from(["click", "view", "error"]),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
)


@settings(max_examples=200, deadline=None)
@given(
    events=st.lists(EVENT, max_size=30, unique_by=lambda e: (e[0], e[1])),
    splits=st.lists(st.integers(0, 30), max_size=5),
)
def test_fold_lww_equals_batch_for_any_trigger_split(events, splits):
    final, _ = _run_fold(events, splits)
    want = _batch_model(events)
    if want is None:
        assert final is None
    else:
        assert final == want


@settings(max_examples=200, deadline=None)
@given(
    events=st.lists(EVENT, max_size=30, unique_by=lambda e: (e[0], e[1])),
    splits=st.lists(st.integers(0, 30), max_size=5),
)
def test_fold_marker_tombstones_equal_batch_for_any_split(events, splits):
    """Marker mode must match the batch tombstone model under ANY batch
    split — including late pre-delete events arriving after the delete."""
    tomb = ("etype", "error")
    final, _ = _run_fold(events, splits, tombstone=tomb)
    want = _batch_model(events, tombstone=tomb)
    if want is None:
        # deleted or empty: marker row may exist but must be flagged
        assert final is None or final[-1] is True
    else:
        assert final is not None and final[:4] == want and final[-1] is False


@settings(max_examples=200, deadline=None)
@given(events=st.lists(EVENT, max_size=30, unique_by=lambda e: (e[0], e[1])))
def test_fold_eager_equals_batch_when_feed_is_ordered(events):
    """Eager mode (samsa's literal delete) is only promised correct for
    per-key ordered feeds: deliver events sorted, one batch per event."""
    ordered = sorted(events, key=lambda e: (e[0], e[1]))
    final, _ = _run_fold(ordered, list(range(len(ordered))), tombstone=("etype", "error"), eager=True)
    want = _batch_model(events, tombstone=("etype", "error"))
    if want is None:
        assert final is None or final[-1] is True
    else:
        assert final is not None and final[:4] == want


@settings(max_examples=100, deadline=None)
@given(
    events=st.lists(EVENT, min_size=1, max_size=30, unique_by=lambda e: (e[0], e[1])),
    splits=st.lists(st.integers(0, 30), max_size=5),
)
def test_fold_outputs_are_monotone_updates(events, splits):
    """The update stream only ever advances the key's (ts, eid) — a batch
    whose best row is older than the state emits nothing."""
    _, outs = _run_fold(events, splits)
    seen = None
    for df in outs:
        cur = (df["ts"].iloc[0], df["eid"].iloc[0])
        if seen is not None:
            assert cur > seen
        seen = cur


# --- TTL (event-time eviction) properties -----------------------------------
# Engine model mirrored from the real behavior the Spark-backed TTL tests
# (tests/test_streaming_ttl.py) validate: the watermark for trigger i is
# max event-time seen in triggers < i minus the horizon; a key WITH data in
# a trigger is invoked normally (its previous timeout is cleared, the fold
# re-arms); a key WITHOUT data whose armed timeout fell below the watermark
# is invoked once with hasTimedOut=True; rows at or below the watermark are
# dropped. ts is in µs (repo ts_us convention), watermark/timeouts in ms.

HORIZON_MS = 10_000


class FakeTTLState(FakeState):
    def __init__(self) -> None:
        super().__init__()
        self._timeout = None
        self._wm = 0
        self._has_timed_out = False

    @property
    def hasTimedOut(self) -> bool:
        return self._has_timed_out

    def getCurrentWatermarkMs(self) -> int:
        return self._wm

    def setTimeoutTimestamp(self, ts) -> None:
        # the real engine JSON-serializes (rejects numpy ints) and throws
        # on timestamps at or below the watermark
        assert type(ts) is int, f"timeout must be a Python int, got {type(ts)}"
        assert ts > self._wm, f"timeout {ts} not above watermark {self._wm}"
        self._timeout = ts


def _run_ttl(events, splits):
    """Feed µs-timestamped events for ONE key through the ttl fold in
    trigger batches; returns (final_state, final_watermark_ms, state_obj)."""
    fold = _build_fold(KEY, ORDER, VALUES, None, False, ttl=True)
    state = FakeTTLState()
    bounds = [0, *sorted(set(splits)), len(events)]
    batches = [events[lo:hi] for lo, hi in zip(bounds, bounds[1:])]
    wm = 0
    seen_max_ms = None
    for batch in batches:
        state._wm = wm
        if batch:
            state._has_timed_out = False
            state._timeout = None  # engine clears on invocation
            pdf = pd.DataFrame(batch, columns=["ts", "eid", "etype", "val"])
            list(fold((7,), iter([pdf]), state))
            bm = max(e[0] for e in batch) // 1000
            seen_max_ms = bm if seen_max_ms is None else max(seen_max_ms, bm)
        elif state.exists and state._timeout is not None and state._timeout < wm:
            state._has_timed_out = True
            list(fold((7,), iter([]), state))
            state._has_timed_out = False
        if seen_max_ms is not None:
            wm = max(wm, seen_max_ms - HORIZON_MS)
    # final no-data batch at the final watermark fires any due timeout
    state._wm = wm
    if state.exists and state._timeout is not None and state._timeout < wm:
        state._has_timed_out = True
        list(fold((7,), iter([]), state))
        state._has_timed_out = False
    return state._v, wm, state


TTL_EVENT = st.tuples(
    st.integers(0, 50_000_000),  # ts_us over a 50 s span (horizon = 10 s)
    st.integers(0, 10_000),
    st.sampled_from(["click", "view"]),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
)


@settings(max_examples=200, deadline=None)
@given(
    events=st.lists(TTL_EVENT, max_size=30, unique_by=lambda e: (e[0], e[1])),
    splits=st.lists(st.integers(0, 30), max_size=5),
)
def test_ttl_fold_never_corrupts_values_and_keeps_fresh_keys(events, splits):
    """(a) If the key survives, its state is EXACTLY the batch LWW winner —
    eviction may remove, never corrupt. (b) A fresh winner (above the final
    watermark) is never evicted."""
    final, wm, _ = _run_ttl(events, splits)
    want = _batch_model(events)
    if final is not None:
        assert final == want
    if want is not None and want[0] // 1000 > wm:
        assert final == want, f"fresh key evicted (winner_ms={want[0]//1000}, wm={wm})"


@settings(max_examples=200, deadline=None)
@given(
    events=st.lists(TTL_EVENT, min_size=1, max_size=30, unique_by=lambda e: (e[0], e[1])),
    splits=st.lists(st.integers(0, 30), max_size=5),
)
def test_ttl_fold_late_rows_cannot_resurrect(events, splits):
    """After the run, a trailing batch of ONLY late rows (at or below the
    final watermark) must not create or change state — an evicted key stays
    gone, a survivor keeps its winner."""
    fold = _build_fold(KEY, ORDER, VALUES, None, False, ttl=True)
    final, wm, state = _run_ttl(events, splits)
    if wm <= 0:
        return
    late = pd.DataFrame(
        [((wm - 1) * 1000, 99_999, "view", 1.0)], columns=["ts", "eid", "etype", "val"]
    )
    state._wm = wm
    state._has_timed_out = False
    state._timeout = None
    list(fold((7,), iter([late]), state))
    assert state._v == final, f"late-only batch changed state: {final} -> {state._v}"
