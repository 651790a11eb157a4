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
