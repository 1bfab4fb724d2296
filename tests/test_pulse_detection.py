"""Golden-vector tests for the pulse-detection core, transcribed from the
reference's unit tests (FIXTURES.md §B; citations per case)."""

import numpy as np
import pytest

from supermusr_data_pipeline_spark.operators.pulse_detection import (
    advanced_muon_pulses,
    baseline_ewma,
    differential_threshold_detector,
    find_advanced_events,
    find_differential_threshold_events,
    find_fixed_threshold_events,
    finite_differences,
    smoothing_window,
    threshold_detector,
)


def idx(v):
    return np.arange(len(v), dtype=float)


# --- W4 ThresholdDetector (threshold_detector.rs:126-252) -----------------


def test_threshold_zero_data():
    t, h = threshold_detector(np.empty(0), np.empty(0), 2.0, 2, 0)
    assert len(t) == 0 and len(h) == 0


def test_threshold_positive():
    v = np.array([4, 3, 2, 5, 6, 1, 5, 7, 2, 4], dtype=float)
    t, h = threshold_detector(idx(v), v, 2.0, 2, 0)
    assert t.tolist() == [0.0, 3.0, 6.0]
    assert h.tolist() == [4.0, 6.0, 7.0]


def test_threshold_negative():
    v = -np.array([4, 3, 2, 5, 2, 1, 5, 7, 2, 2, 2, 4], dtype=float)
    t, h = threshold_detector(idx(v), v, -2.5, 2, 0)
    assert t.tolist() == [4.0, 8.0]
    assert h.tolist() == [-1.0, -2.0]


def test_threshold_zero_duration_never_emits():
    v = -np.array([4, 3, 2, 5, 2, 1, 5, 7, 2, 2], dtype=float)
    t, h = threshold_detector(idx(v), v, -2.5, 0, 0)
    assert len(t) == 0


@pytest.mark.parametrize(
    "cool_off,expected",
    [
        (0, [(2.0, -2.0), (4.0, -1.0), (8.0, -2.0)]),
        (1, [(2.0, -2.0), (4.0, -1.0), (8.0, -2.0)]),
        (2, [(2.0, -2.0), (5.0, -1.0), (8.0, -2.0)]),
    ],
)
def test_threshold_cool_off(cool_off, expected):
    v = -np.array([4, 3, 2, 5, 2, 1, 5, 7, 2, 2], dtype=float)
    t, h = threshold_detector(idx(v), v, -2.5, 1, cool_off)
    assert list(zip(t.tolist(), h.tolist())) == expected


# --- W2 FiniteDifferences (finite_differences.rs:69-85) -------------------


def test_finite_differences_n3():
    v = np.array([0, 6, 2, 1, 3, 1, 0], dtype=float)
    out = finite_differences(v, 3)
    expected = [
        [2.0, -4.0, -10.0],
        [1.0, -1.0, 3.0],
        [3.0, 2.0, 3.0],
        [1.0, -2.0, -4.0],
        [0.0, -1.0, 1.0],
    ]
    assert out.tolist() == expected


# --- W1 SmoothingWindow (smoothing_window.rs:85-299) ----------------------


def test_smoothing_minimal():
    t, m, var = smoothing_window(np.array([4.0, 3.0]), 2)
    assert t[0] == 0.5
    assert m[0] == pytest.approx(3.5)
    assert var[0] == pytest.approx(((4 - 3.5) ** 2 + (3 - 3.5) ** 2) / 1.0)


def test_smoothing_five_data_three_window():
    v = np.array([4.0, 3.0, 1.0, 5.0, 3.0])
    t, m, var = smoothing_window(v, 3)
    assert t.tolist() == [1.0, 2.0, 3.0]
    np.testing.assert_allclose(m, [8 / 3, 9 / 3, 9 / 3])
    expected_var = [
        ((4 - 8 / 3) ** 2 + (3 - 8 / 3) ** 2 + (1 - 8 / 3) ** 2) / 2,
        ((3 - 3) ** 2 + (1 - 3) ** 2 + (5 - 3) ** 2) / 2,
        ((1 - 3) ** 2 + (5 - 3) ** 2 + (3 - 3) ** 2) / 2,
    ]
    np.testing.assert_allclose(var, expected_var, atol=1e-8)


def test_smoothing_size_one():
    v = np.array([4.0, 3.0, 2.0, 5.0])
    t, m, var = smoothing_window(v, 1)
    assert m.tolist() == v.tolist()
    assert var.tolist() == [0.0] * 4


def test_smoothing_insufficient():
    t, m, var = smoothing_window(np.array([4.0, 3.0]), 3)
    assert len(m) == 0


# --- W3 Baseline (baseline.rs:51-124) -------------------------------------


def test_baseline_zero_warmup_passthrough():
    v = np.array([1.0, 3.0, 6.0, -1.0, 5.0])
    out = baseline_ewma(v, 0, 0.1)
    assert out.tolist() == v.tolist()


def test_baseline_constant():
    out = baseline_ewma(np.ones(7), 3, 0.1)
    np.testing.assert_allclose(out, np.zeros(4))


def test_baseline_varying():
    v = np.array([1.0, 2.0, 0.0, 0.0, 1.0, 2.0, 3.0])
    out = baseline_ewma(v, 3, 0.2)
    np.testing.assert_allclose(out, [-0.96, 0.04, 1.04, 2.04], atol=1e-8)


# --- W5 DifferentialThresholdDetector (differential_threshold_detector.rs) -


def _diff_detect(data, thr, dur, cool, mult):
    v = np.asarray(data, dtype=float)
    fd = finite_differences(v, 2)
    return differential_threshold_detector(
        idx(v)[1:], fd[:, 0], fd[:, 1], thr, dur, cool, mult
    )


def test_differential_positive_multiple():
    t, h = _diff_detect([4, 3, 2, 5, 6, 1, 5, 7, 2, 4], 2.0, 2, 0, 2.0)
    assert list(zip(t.tolist(), h.tolist())) == [(3.0, 10.0), (6.0, 10.0)]


def test_differential_no_multiple():
    t, h = _diff_detect([4, 3, 2, 5, 6, 1, 5, 7, 2, 4], 2.0, 2, 0, None)
    assert list(zip(t.tolist(), h.tolist())) == [(3.0, 6.0), (6.0, 7.0)]


def test_differential_zero_duration():
    t, h = _diff_detect([-v for v in [4, 3, 2, 5, 2, 1, 5, 7, 2, 2]], -2.5, 0, 0, 2.0)
    assert len(t) == 0


@pytest.mark.parametrize(
    "cool,expected",
    [
        (1, [(3.0, 10.0), (6.0, 10.0), (9.0, 12.0), (11.0, 16.0), (13.0, 22.0)]),
        (2, [(3.0, 10.0), (6.0, 10.0), (11.0, 16.0)]),
        (3, [(3.0, 10.0), (9.0, 12.0), (13.0, 22.0)]),
    ],
)
def test_differential_cool_off(cool, expected):
    data = [4, 3, 2, 5, 2, 1, 5, 7, 2, 6, 5, 8, 8, 11, 0]
    t, h = _diff_detect(data, 2.5, 1, cool, 2.0)
    assert list(zip(t.tolist(), h.tolist())) == expected


# --- W6/W7 AdvancedMuonDetector (advanced_muon_detector.rs:319-408) -------


def test_advanced_detector_events():
    v = np.array([4, 3, 2, 5, 6, 1, 5, 7, 2, 4], dtype=float)
    fd = finite_differences(v, 2)
    pulses = advanced_muon_pulses(idx(v)[1:], fd[:, 0], fd[:, 1], 1.0, 1.0, 1.0, 0.0)
    # two complete Onset→Peak→End cycles (events asserted in the reference;
    # we assert the assembled pulses they imply)
    assert len(pulses) == 2
    p0 = pulses[0]
    assert (p0.start_time, p0.start_value) == (3.0, 5.0)
    assert p0.end_time == 5.0
    # peak at t=4 value 6, corrected by linear baseline start(3,5)→end(5,1):
    # gradient=(4-3)/(5-3)=0.5 → 6 - (6-5)*0.5 = 5.5
    assert p0.peak_time == 4.0
    assert p0.peak_value == pytest.approx(5.5)
    assert p0.steepest_rise_time == 3.0
    p1 = pulses[1]
    assert (p1.start_time, p1.end_time) == (7.0, 8.0)


# --- end-to-end channel pipelines (processing.rs:168-512) -----------------

GOLDEN_TRACE = [0, 1, 2, 1, 0, 1, 2, 1, 8, 0, 2, 8, 3, 1, 2]


def test_fixed_threshold_positive_zero_baseline():
    t, h = find_fixed_threshold_events(GOLDEN_TRACE, 1.0, 5.0, 1, 0, polarity=1, baseline=0)
    assert t.tolist() == [8, 11]
    assert h.tolist() == [8, 8]


def test_fixed_threshold_positive_nonzero_baseline():
    v = [3, 4, 5, 4, 3, 4, 5, 4, 11, 3, 5, 11, 6, 4, 5]
    t, h = find_fixed_threshold_events(v, 1.0, 5.0, 1, 0, polarity=1, baseline=3)
    assert t.tolist() == [8, 11]
    assert h.tolist() == [8, 8]


def test_fixed_threshold_negative_baseline10():
    v = [10, 9, 8, 9, 10, 9, 8, 9, 2, 10, 8, 2, 7, 9, 8]
    t, h = find_fixed_threshold_events(v, 1.0, 5.0, 1, 0, polarity=-1, baseline=10)
    assert t.tolist() == [8, 11]
    assert h.tolist() == [8, 8]


def test_advanced_positive_zero_baseline():
    t, h = find_advanced_events(
        GOLDEN_TRACE,
        1.0,
        muon_onset=0.5,
        muon_fall=-0.01,
        muon_termination=0.001,
        duration=0.0,
        smoothing_window_size=2,
        polarity=1,
        baseline=0,
    )
    assert t.tolist() == [1, 7]
    assert h.tolist() == [1, 4]


def test_differential_channel_pipeline():
    t, h = find_differential_threshold_events(
        [4, 3, 2, 5, 6, 1, 5, 7, 2, 4], 1.0, 2.0, 2, 0, constant_multiple=2.0
    )
    assert t.tolist() == [3, 6]
    assert h.tolist() == [10, 10]
