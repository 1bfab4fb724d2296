"""T4 property tests: the batch window-fold (runs_from_control) and the
streaming FSM (run_lifecycle_stream's update function, driven with a fake
GroupState) must both agree with a direct Python interpretation of the
reference's engine rules (nexus-writer/src/run_engine/engine.rs:194-326):
start aborts an unstopped predecessor; stop closes only the matching open
run and must be strictly after its start; double stops and stray stops are
rejected; an unstopped run stays open."""

from datetime import datetime, timedelta

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from supermusr_data_pipeline_spark.streaming.run_lifecycle import (

    CONTROL_SCHEMA,
    runs_from_control,
)

import pytest

# slow set (pytest.ini deselects by default; opt in with -m slow):
# multi-minute soak / streaming end-to-end / large-SF coverage whose
# operators' value-correctness stays pinned by the default sf0.001
# parity + plan audits
pytestmark = pytest.mark.slow

T0 = datetime(2024, 1, 1, 12, 0, 0)

# strategy: sequences of (kind, run_idx) — timestamps are distinct minutes
_control_seq = st.lists(
    st.tuples(st.sampled_from(["start", "stop"]), st.integers(min_value=0, max_value=3)),
    min_size=0,
    max_size=12,
)


def _reference_fold(msgs):
    """Direct transcription of the engine rules."""
    runs = []
    open_run = None  # (name, ts)
    for ts, kind, name in msgs:
        if kind == "start":
            if open_run is not None:
                runs.append((open_run[0], open_run[1], ts, True))
            open_run = (name, ts)
        else:
            if open_run is not None and open_run[0] == name and ts > open_run[1]:
                runs.append((name, open_run[1], ts, False))
                open_run = None
    if open_run is not None:
        runs.append((open_run[0], open_run[1], None, False))
    return sorted(runs, key=lambda r: (r[1], r[0]))


@settings(max_examples=40, deadline=None)
@given(seq=_control_seq)
def test_batch_fold_matches_reference_rules(spark, seq):
    msgs = [
        (T0 + timedelta(minutes=i), kind, f"run_{idx}")
        for i, (kind, idx) in enumerate(seq)
    ]
    want = _reference_fold(msgs)
    if not msgs:
        return
    ctl = spark.createDataFrame(
        [(kind, name, ts, "MUSR") for ts, kind, name in msgs], CONTROL_SCHEMA
    )
    got = sorted(
        (
            (r.run_name, r.collect_from, r.collect_until, r.aborted)
            for r in runs_from_control(ctl).collect()
        ),
        key=lambda r: (r[1], r[0]),
    )
    # batch fold reports open runs too (collect_until NULL) — same shape
    assert got == want


@settings(max_examples=150, deadline=None)
@given(seq=_control_seq)
def test_streaming_fsm_matches_reference_rules(seq):
    """Drive the FSM update function directly (no Spark) over the whole
    sequence, then flush via timeout — output must equal the reference fold."""
    from tests.test_frame_fsm import FakeState

    from supermusr_data_pipeline_spark.streaming import run_lifecycle as rl

    msgs = [
        (T0 + timedelta(minutes=i), kind, f"run_{idx}")
        for i, (kind, idx) in enumerate(seq)
    ]
    want = _reference_fold(msgs)

    # capture the update closure exactly as the stream builds it, using a
    # stub control object that records the applyInPandasWithState callable
    captured = {}

    class _Ctl:
        def withColumn(self, *_a, **_k):
            return self

        def groupBy(self, *_a, **_k):
            return self

        def applyInPandasWithState(self, fn, **_k):
            captured["fn"] = fn
            return None

    rl.run_lifecycle_stream(_Ctl(), run_ttl_ms=1000)
    fn = captured["fn"]

    state = FakeState()
    pdf = pd.DataFrame(
        {
            "kind": [k for _, k, _ in msgs],
            "run_name": [n for _, _, n in msgs],
            "ts": [t for t, _, _ in msgs],
            "instrument_name": ["MUSR"] * len(msgs),
            "_g": [0] * len(msgs),
        }
    )
    out = list(fn((0,), iter([pdf] if msgs else []), state))
    if state.exists:  # flush the open run via the TTL timeout
        state.hasTimedOut = True
        out.extend(fn((0,), iter([]), state))
    got = []
    for frame in out:
        for r in frame.itertuples(index=False):
            until = None if pd.isna(r.collect_until) else r.collect_until.to_pydatetime()
            got.append((r.run_name, r.collect_from.to_pydatetime(), until, r.aborted))
    assert sorted(got, key=lambda r: (r[1], r[0])) == want
