"""Pulse-detection core: windows + detector FSMs as pure numpy functions.

This is the engine's re-expression of the reference's lazy iterator pipeline
(`trace-to-events/src/pulse_detection/`, SURVEY.md §2.3 W1-W7).  Each function
consumes one trace (a 1-D float64 array) and is stateless across traces, so the
Spark lift is embarrassingly parallel: `mapInPandas` over long-format trace
rows — the Spark analog of the reference's rayon fan-out
(`trace-to-events/src/processing.rs:33-56`).

Semantics are transcribed from behaviour (file:line cited per function), not
from code structure; validated against the reference's golden unit-test
vectors in tests/test_pulse_detection.py.

All detectors treat sample values as `Real = f64`
(trace-to-events/src/pulse_detection/mod.rs:33).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# ---------------------------------------------------------------------------
# W3 — Baseline(warm_up, smoothing_factor)
# Ref: pulse_detection/window/baseline.rs:22-49
# ---------------------------------------------------------------------------


def baseline_ewma(values: np.ndarray, warm_up: int, smoothing_factor: float = 0.1) -> np.ndarray:
    """EWMA baseline correction.

    The first ``warm_up`` samples only feed the EWMA (b0 = v0,
    b = α·v + (1-α)·b) and produce no output; every later sample emits
    ``v - b`` with the baseline frozen.  Output times are shifted by
    ``-warm_up`` (we simply re-index from 0).  With ``warm_up == 0`` the
    input passes through unchanged.
    """
    v = np.asarray(values, dtype=np.float64)
    if warm_up == 0:
        return v.copy()
    if len(v) <= warm_up:
        return np.empty(0, dtype=np.float64)
    b = v[0]
    for x in v[1:warm_up]:
        b = x * smoothing_factor + b * (1.0 - smoothing_factor)
    return v[warm_up:] - b


# ---------------------------------------------------------------------------
# W1 — SmoothingWindow(size): sliding mean + sample variance
# Ref: pulse_detection/window/smoothing_window.rs:41-83
# ---------------------------------------------------------------------------


def smoothing_window(values: np.ndarray, size: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sliding mean/variance over ``size`` samples.

    Returns (times, means, variances) where times are the reference's
    centred times ``i - (size-1)/2`` for input index i ≥ size-1.  Variance is
    the running-sums form ``(Σx² - (Σx)²/n) / (n-1)`` (smoothing_window.rs:73);
    size == 1 emits (value, 0.0) for every sample.
    """
    v = np.asarray(values, dtype=np.float64)
    n = len(v)
    if size < 1:
        raise ValueError("size must be >= 1")
    if size == 1:
        return np.arange(n, dtype=np.float64), v.copy(), np.zeros(n)
    if n < size:
        e = np.empty(0, dtype=np.float64)
        return e, e, e
    # windowed sums via cumulative sums (single pass, like the running sums)
    c = np.concatenate(([0.0], np.cumsum(v)))
    c2 = np.concatenate(([0.0], np.cumsum(v * v)))
    s = c[size:] - c[:-size]
    s2 = c2[size:] - c2[:-size]
    mean = s / size
    var = (s2 - s * s / size) / (size - 1.0)
    times = np.arange(size - 1, n, dtype=np.float64) - (size - 1) / 2.0
    return times, mean, var


# ---------------------------------------------------------------------------
# W2 — FiniteDifferences(N): backward finite differences, orders 0..N-1
# Ref: pulse_detection/window/finite_differences.rs:12-61
# ---------------------------------------------------------------------------


def finite_differences(values: np.ndarray, order: int) -> np.ndarray:
    """Backward finite differences with binomial coefficients.

    Output[i, n] = Σ_k (-1)^k C(n,k) · v[i-k] for n in 0..order-1, emitted
    for input index i ≥ order-1 (shape: (len(v)-order+1, order)).  Output
    times equal input times (no shift, finite_differences.rs:58-60).
    """
    v = np.asarray(values, dtype=np.float64)
    n_in = len(v)
    if n_in < order:
        return np.empty((0, order), dtype=np.float64)
    from math import comb

    out = np.empty((n_in - order + 1, order), dtype=np.float64)
    for n in range(order):
        acc = np.zeros(n_in - order + 1, dtype=np.float64)
        for k in range(n + 1):
            coeff = (-1.0 if k & 1 else 1.0) * comb(n, k)
            # v[i-k] for i in [order-1, n_in)
            acc += coeff * v[order - 1 - k : n_in - k]
        out[:, n] = acc
    return out


# ---------------------------------------------------------------------------
# W4 — ThresholdDetector (fixed-threshold discriminator)
# Ref: pulse_detection/detectors/threshold_detector.rs:44-118
# ---------------------------------------------------------------------------


def threshold_detector(
    times: np.ndarray,
    values: np.ndarray,
    threshold: float,
    duration: int,
    cool_off: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Fixed-threshold discriminator.

    Behavioural contract (threshold_detector.rs:48-118):
    - an *excursion* starts at the first sample with v > threshold (arming is
      delayed while a cool-off from the previous qualifying excursion's
      return is pending) and ends at the first later sample with
      v <= threshold (or at end of trace);
    - an event (time_crossed, max value during the excursion) is emitted only
      if the excursion lasted >= duration samples; duration == 0 never emits;
    - cool-off counts from the *return* sample of the last emitted-length
      excursion; arming inside a later excursion is delayed until it expires;
    - a trace ending mid-excursion still emits if duration was reached.

    Returns (event_times, pulse_heights) as float64 arrays.  Assumes samples
    are equally spaced with unit step in ``times`` index space (times may be
    scaled by sample_time by the caller *after* detection, matching the
    reference which feeds ``i * sample_time`` — we instead detect on indices
    and scale outside for vectorization; pass ``times`` as the actual time
    axis used for duration comparisons).
    """
    t = np.asarray(times, dtype=np.float64)
    v = np.asarray(values, dtype=np.float64)
    n = len(v)
    if n == 0 or duration <= 0:
        return np.empty(0), np.empty(0)

    above = v > threshold
    if not above.any():
        return np.empty(0), np.empty(0)
    # island boundaries over the `above` mask
    d = np.diff(above.astype(np.int8))
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1  # index of first below-threshold sample
    if above[0]:
        starts = np.concatenate(([0], starts))
    if above[-1]:
        ends = np.concatenate((ends, [n]))  # open island at trace end

    out_t: list[float] = []
    out_h: list[float] = []
    time_of_last_return: float | None = None
    for s, e in zip(starts, ends):
        # cool-off may delay arming within the island (threshold_detector.rs:89-100)
        tc_idx = s
        if time_of_last_return is not None and cool_off > 0:
            # first index i in [s, e) with t[i] - tolr >= cool_off
            if t[s] - time_of_last_return < cool_off:
                # equal spacing assumed: solve for earliest qualifying index
                need = time_of_last_return + cool_off
                cand = np.searchsorted(t[s:e], need, side="left") + s
                if cand >= e:
                    continue  # never armed during this island
                tc_idx = int(cand)
        tc = t[tc_idx]
        end_time = t[e] if e < n else None
        armed_len = (end_time if end_time is not None else t[n - 1]) - tc
        if end_time is not None:
            qualifies = end_time - tc >= duration
        else:
            qualifies = armed_len >= duration  # finish(): temp set iff reached
        if qualifies:
            out_t.append(tc)
            out_h.append(float(v[tc_idx:e].max()))
            if end_time is not None:
                time_of_last_return = end_time
    return np.asarray(out_t), np.asarray(out_h)


# ---------------------------------------------------------------------------
# W5 — DifferentialThresholdDetector
# Ref: pulse_detection/detectors/differential_threshold_detector.rs:46-128
# ---------------------------------------------------------------------------


def differential_threshold_detector(
    times: np.ndarray,
    values: np.ndarray,
    derivs: np.ndarray,
    threshold: float,
    duration: int,
    cool_off: int = 0,
    constant_multiple: float | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Discriminator on the first derivative.

    Arms when d > threshold (cool-off as in W4); the excursion ends at the
    first sample with d <= 0.  Pulse height:
    - without constant_multiple: max of the *value* track over the armed
      span (differential_threshold_detector.rs:62-63);
    - with constant_multiple m: (value at the max-derivative sample) · m,
      and if the max-derivative sample arrives after the duration was
      reached, the event time moves to that sample
      (differential_threshold_detector.rs:54-61).
    Event time otherwise = arming time; emitted only if the excursion lasted
    >= duration; trace end flushes a pending event (finish()).
    """
    t = np.asarray(times, dtype=np.float64)
    v = np.asarray(values, dtype=np.float64)
    dv = np.asarray(derivs, dtype=np.float64)
    n = len(v)
    if n == 0 or duration <= 0:
        return np.empty(0), np.empty(0)

    out_t: list[float] = []
    out_h: list[float] = []
    tolr: float | None = None  # time_of_last_return
    tc: float | None = None  # time crossed (armed)
    temp_time: float | None = None
    md_v = 0.0  # value at max-derivative sample
    md_d = 0.0
    max_v = 0.0

    def height() -> float:
        if constant_multiple is not None:
            return md_v * constant_multiple
        return max_v

    for i in range(n):
        if tc is not None:
            if constant_multiple is not None:
                if md_d < dv[i]:
                    md_v, md_d = v[i], dv[i]
                    if temp_time is not None:
                        temp_time = t[i]
            else:
                max_v = max(max_v, v[i])
            if t[i] - tc == float(duration):
                temp_time = tc
            if dv[i] <= 0.0:
                dur_reached = t[i] - tc >= duration
                tc = None
                if dur_reached:
                    tolr = t[i]
                    if temp_time is not None:
                        out_t.append(temp_time)
                        out_h.append(height())
                        temp_time = None
        else:
            if dv[i] > threshold and (tolr is None or t[i] - tolr >= cool_off):
                md_v, md_d = v[i], dv[i]
                max_v = v[i]
                tc = t[i]
    if temp_time is not None:  # finish()
        out_t.append(temp_time)
        out_h.append(height())
    return np.asarray(out_t), np.asarray(out_h)


# ---------------------------------------------------------------------------
# W6/W7 — AdvancedMuonDetector + AdvancedMuonAssembler
# Ref: pulse_detection/detectors/advanced_muon_detector.rs:127-310
# ---------------------------------------------------------------------------


@dataclass
class Pulse:
    """Assembled muon pulse (pulse_detection/pulse.rs)."""

    start_time: float
    start_value: float
    peak_time: float
    peak_value: float
    end_time: float
    end_value: float
    steepest_rise_time: float
    steepest_rise_value: float
    steepest_rise_deriv: float
    sharpest_fall_time: float
    sharpest_fall_value: float
    sharpest_fall_deriv: float


def advanced_muon_pulses(
    times: np.ndarray,
    values: np.ndarray,
    derivs: np.ndarray,
    onset_threshold: float,
    fall_threshold: float,
    termination_threshold: float,
    duration: float,
) -> list[Pulse]:
    """Three-threshold FSM over the first derivative producing assembled
    pulses with linear-baseline-corrected peak/rise/fall values.

    Detector (advanced_muon_detector.rs:176-220): in no-state the arming
    condition is d >= onset; in Rise it is d <= fall; in Fall it is
    d >= termination.  A condition must hold continuously for ``duration``
    (in time units) before the transition fires, emitting Onset/Peak/End.
    Peak events carry the running maximum of value (with steepest-rise
    superlative); End events the minimum (sharpest fall).

    Assembler (advanced_muon_detector.rs:246-309): Onset→Peak→End folds into
    a Pulse; peak/rise/fall values are corrected by the start→end linear
    baseline: value -= (value - start_value) · (t_peak - t_start)/(t_end - t_start).
    """
    t = np.asarray(times, dtype=np.float64)
    v = np.asarray(values, dtype=np.float64)
    dv = np.asarray(derivs, dtype=np.float64)
    n = len(v)

    # -- detector ---------------------------------------------------------
    # state: None | ("rise", peak_t, peak_v, sr_t, sr_v, sr_d)
    #             | ("fall", nadir_t, nadir_v, sf_t, sf_v, sf_d)
    events: list[tuple[float, str, float, tuple[float, float, float] | None]] = []
    state: list | None = None
    time_crossed: float | None = None

    for i in range(n):
        ti, vi, di = t[i], v[i], dv[i]
        # test_and_update_threshold
        if state is None:
            cond = di >= onset_threshold
        elif state[0] == "rise":
            cond = di <= fall_threshold
        else:
            cond = di >= termination_threshold
        if time_crossed is not None:
            if not cond:
                time_crossed = None
        elif cond:
            time_crossed = ti
        # update superlatives
        if state is not None:
            # state = [mode, extreme_t, extreme_v, sup_t, sup_v, sup_d]
            if state[0] == "rise":
                if di >= state[5]:
                    state[3], state[4], state[5] = ti, vi, di
                if vi >= state[2]:
                    state[1], state[2] = ti, vi
            else:
                if di <= state[5]:
                    state[3], state[4], state[5] = ti, vi, di
                if vi <= state[2]:
                    state[1], state[2] = ti, vi
        dur_ok = time_crossed is not None and ti - time_crossed >= duration
        if state is not None:
            if dur_ok:
                mode = state[0]
                cls = "peak" if mode == "rise" else "end"
                events.append((state[1], cls, state[2], (state[3], state[4], state[5])))
                if mode == "rise":
                    state = ["fall", ti, vi, ti, vi, di]
                else:
                    state = None
        else:
            if dur_ok:
                events.append((ti, "onset", vi, None))
                state = ["rise", ti, vi, ti, vi, di]

    # -- assembler --------------------------------------------------------
    pulses: list[Pulse] = []
    mode = "waiting"
    start_t = start_v = 0.0
    peak_t = peak_v = 0.0
    sr: tuple[float, float, float] = (0.0, 0.0, 0.0)
    for ev_time, cls, ev_value, superlative in events:
        if mode == "waiting":
            if cls == "onset":
                start_t, start_v = ev_time, ev_value
                mode = "rising"
        elif mode == "rising":
            if cls == "peak":
                peak_t, peak_v = ev_time, ev_value
                sr = superlative or (0.0, 0.0, 0.0)
                mode = "falling"
        elif mode == "falling":
            if cls == "end":
                mode = "waiting"
                end_t, end_v = ev_time, ev_value
                sf = superlative or (0.0, 0.0, 0.0)
                denom = end_t - start_t
                gradient = (peak_t - start_t) / denom if denom != 0.0 else np.nan
                corr_peak = peak_v - (peak_v - start_v) * gradient
                corr_sr_v = sr[1] - (sr[1] - start_v) * gradient
                corr_sf_v = sf[1] - (sf[1] - start_v) * gradient
                pulses.append(
                    Pulse(
                        start_time=start_t,
                        start_value=start_v,
                        peak_time=peak_t,
                        peak_value=corr_peak,
                        end_time=end_t,
                        end_value=end_v,
                        steepest_rise_time=sr[0],
                        steepest_rise_value=corr_sr_v,
                        steepest_rise_deriv=sr[2],
                        sharpest_fall_time=sf[0],
                        sharpest_fall_value=corr_sf_v,
                        sharpest_fall_deriv=sf[2],
                    )
                )
    return pulses


# ---------------------------------------------------------------------------
# Channel pipelines — composition per detection mode
# Ref: trace-to-events/src/channels.rs:52-184
# ---------------------------------------------------------------------------

U16_MAX = 65535
U32_MAX = 4294967295


def _saturate_u16(x: np.ndarray) -> np.ndarray:
    """Rust `as u16` on f64: truncate toward zero, saturate, NaN→0."""
    x = np.trunc(np.asarray(x, dtype=np.float64))
    x = np.where(np.isnan(x), 0.0, x)
    return np.clip(x, 0, U16_MAX).astype(np.int64)


def _saturate_u32(x: np.ndarray) -> np.ndarray:
    x = np.trunc(np.asarray(x, dtype=np.float64))
    x = np.where(np.isnan(x), 0.0, x)
    return np.clip(x, 0, U32_MAX).astype(np.int64)


def find_fixed_threshold_events(
    voltage: np.ndarray,
    sample_time: float,
    threshold: float,
    duration: int,
    cool_off: int = 0,
    polarity: int = 1,
    baseline: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """channels.rs:52-85: normalize (P1) then fixed-threshold detect.

    Returns (time u32, intensity u16) like the dev2 message.  Time axis is
    i · sample_time; duration/cool_off are compared in *time* units.
    """
    v = polarity * (np.asarray(voltage, dtype=np.float64) - baseline)
    # detect in index space (duration/cool_off are sample counts at the
    # reference's default 1 ns sample time); scale event times afterwards
    t = np.arange(len(v), dtype=np.float64)
    et, eh = threshold_detector(t, v, threshold, duration, cool_off)
    return _saturate_u32(et * sample_time), _saturate_u16(eh)


def find_differential_threshold_events(
    voltage: np.ndarray,
    sample_time: float,
    threshold: float,
    duration: int,
    cool_off: int = 0,
    constant_multiple: float | None = None,
    polarity: int = 1,
    baseline: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """channels.rs:87-124: normalize → FiniteDifferences<2> → differential detect."""
    v = polarity * (np.asarray(voltage, dtype=np.float64) - baseline)
    t = np.arange(len(v), dtype=np.float64)
    fd = finite_differences(v, 2)
    if len(fd) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    et, eh = differential_threshold_detector(
        t[1:], fd[:, 0], fd[:, 1], threshold, duration, cool_off, constant_multiple
    )
    return _saturate_u32(et * sample_time), _saturate_u16(eh)


def find_advanced_events(
    voltage: np.ndarray,
    sample_time: float,
    muon_onset: float,
    muon_fall: float,
    muon_termination: float,
    duration: float,
    baseline_length: int = 0,
    smoothing_window_size: int = 1,
    min_amplitude: float | None = None,
    max_amplitude: float | None = None,
    polarity: int = 1,
    baseline: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """channels.rs:126-184: normalize → Baseline → SmoothingWindow(mean) →
    FiniteDifferences<2> → AdvancedMuonDetector → Assembler → amplitude filter.

    Output per pulse: (steepest_rise.time as u32, peak.value as u16).
    """
    v = polarity * (np.asarray(voltage, dtype=np.float64) - baseline)
    corrected = baseline_ewma(v, baseline_length, 0.1)
    # Baseline shifts time by -warm_up (re-index from 0); SmoothingWindow
    # centres times by -(size-1)/2.  Detection runs in index space (exact
    # for the reference's 1 ns default); event times scale on output.
    st, sm, _ = smoothing_window(corrected, smoothing_window_size)
    if len(sm) < 2:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    fd = finite_differences(sm, 2)
    pulses = advanced_muon_pulses(
        st[1:], fd[:, 0], fd[:, 1], muon_onset, muon_fall, muon_termination, duration
    )
    out_t, out_h = [], []
    for p in pulses:
        if min_amplitude is not None and not (min_amplitude <= p.peak_value):
            continue
        if max_amplitude is not None and not (max_amplitude >= p.peak_value):
            continue
        out_t.append(p.steepest_rise_time)
        out_h.append(p.peak_value)
    return _saturate_u32(np.asarray(out_t) * sample_time), _saturate_u16(np.asarray(out_h))
