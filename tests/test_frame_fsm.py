"""Property tests of the frame-assembly FSM (the applyInPandasWithState
update function) against the batch operator's semantics, driven with a fake
GroupState — no streaming query needed, so hypothesis can explore hundreds
of arrival orders, duplicate patterns and straggler timings in seconds.

Mirrors the reference's cache tests (digitiser-aggregator/src/frame/
cache.rs:156-387): completeness dispatch, duplicate rejection, TTL flush,
and late-message rejection after dispatch."""

from datetime import datetime

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from supermusr_data_pipeline_spark.streaming.frame_assembly_stream import (
    make_update_fn,
)

KEY = (datetime(2024, 1, 1, 12, 0, 0), 1, 8, True, 7)


class FakeState:
    """Minimal GroupState stand-in for driving the FSM directly."""

    def __init__(self):
        self._value = None
        self.hasTimedOut = False
        self.now_ms = 0
        self.timeout_at = None
        self.removed_count = 0

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        if self._value is None:
            raise ValueError("state does not exist")
        return self._value

    def update(self, v):
        self._value = tuple(v)

    def remove(self):
        self._value = None
        self.removed_count += 1

    def getCurrentProcessingTimeMs(self):
        return self.now_ms

    def setTimeoutDuration(self, ms):
        self.timeout_at = self.now_ms + ms


def _msg_df(did, channels, times, volts, veto=0):
    return pd.DataFrame(
        {
            "digitizer_id": [did],
            "ts": [KEY[0]],
            "period_number": [KEY[1]],
            "protons_per_pulse": [KEY[2]],
            "running": [KEY[3]],
            "frame_number": [KEY[4]],
            "veto_flags": [veto],
            "channel": [channels],
            "event_time": [times],
            "event_voltage": [volts],
        }
    )


def _drive(fn, state, dfs):
    return list(fn(KEY, iter(dfs), state))


def _fire_timeout(fn, state):
    state.hasTimedOut = True
    out = list(fn(KEY, iter([]), state))
    state.hasTimedOut = False
    return out


@settings(max_examples=200, deadline=None)
@given(
    n_dids=st.integers(min_value=1, max_value=5),
    order=st.permutations(list(range(5))),
    dups=st.lists(st.integers(min_value=0, max_value=4), max_size=4),
    veto_bits=st.lists(st.integers(min_value=0, max_value=15), min_size=5, max_size=5),
)
def test_completeness_dedup_and_veto_or(n_dids, order, dups, veto_bits):
    """Any arrival order of the expected set dispatches exactly one complete
    frame; duplicates never add events; veto flags OR across contributors."""
    expected = list(range(n_dids))
    fn = make_update_fn(expected, frame_ttl_ms=500)
    state = FakeState()
    arrivals = [d for d in order if d < n_dids]
    # interleave duplicate sends of already/not-yet-seen digitisers
    seq = []
    for i, d in enumerate(arrivals):
        seq.append(d)
        for dup in dups:
            if dup <= d:
                seq.append(dup)
    out = []
    seen = set()
    expected_veto = 0
    for d in seq:
        frames = _drive(
            fn, state, [_msg_df(d, [d], [10 * d], [float(d)], veto=veto_bits[d])]
        )
        if d < n_dids and d not in seen:
            seen.add(d)
            expected_veto |= veto_bits[d]
        out.extend(frames)
    assert len(out) == 1, "exactly one dispatch for the complete set"
    f = out[0].iloc[0]
    assert f["complete"]
    assert f["digitizers_present"] == expected
    assert f["veto_flags"] == expected_veto
    # one event per distinct digitiser, sorted by (did, channel, time)
    assert list(f["channel"]) == sorted(range(n_dids))
    # dispatched key is tombstoned: any further message is rejected
    late = _drive(fn, state, [_msg_df(0, [99], [999], [9.9])])
    assert late == []
    assert state.exists and state.get[-1] is True  # tombstone marker


@settings(max_examples=100, deadline=None)
@given(
    present=st.sets(st.integers(min_value=0, max_value=3), min_size=1, max_size=3),
    straggler=st.integers(min_value=0, max_value=3),
)
def test_ttl_flush_then_late_rejection(present, straggler):
    """cache.rs:156-387: TTL dispatches the partial frame; a late message
    (even from a missing digitiser) must not re-open it; the tombstone
    expires quietly."""
    expected = [0, 1, 2, 3]
    fn = make_update_fn(expected, frame_ttl_ms=500, tombstone_ttl_ms=2000)
    state = FakeState()
    for d in sorted(present):
        assert _drive(fn, state, [_msg_df(d, [d], [d], [float(d)])]) == []
    state.now_ms = 600  # past the frame TTL
    out = _fire_timeout(fn, state)
    assert len(out) == 1
    f = out[0].iloc[0]
    assert not f["complete"]
    assert f["digitizers_present"] == sorted(present)
    # straggler after dispatch: rejected, no second frame
    assert _drive(fn, state, [_msg_df(straggler, [9], [9], [9.0])]) == []
    assert state.timeout_at == state.now_ms + 2000  # tombstone re-armed
    # tombstone expiry: removes state, emits nothing
    state.now_ms = 99_999
    assert _fire_timeout(fn, state) == []
    assert not state.exists


def test_ttl_deadline_anchored_at_first_message():
    """The TTL anchors at the FIRST message (frame/partial.rs:30-40), not
    the latest update."""
    fn = make_update_fn([0, 1, 2], frame_ttl_ms=500)
    state = FakeState()
    state.now_ms = 1000
    _drive(fn, state, [_msg_df(0, [0], [0], [0.0])])
    assert state.timeout_at == 1500
    state.now_ms = 1400  # second message arrives late in the window
    _drive(fn, state, [_msg_df(1, [1], [1], [1.0])])
    assert state.timeout_at == 1500, "deadline must not slide on updates"
